package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** LOGICAL conflict detection in the commit protocol (Delta's
  * OptimisticTransaction rules): a rewriting op that lost the version
  * race aborts only when the winner genuinely invalidates it — blind
  * appends and disjoint safe-carrier rewrites (optimize, delete) are
  * REBASED over; overlapping remove-sets, content-creating winners
  * (merge/update/overwrite), schema changes, and strict ops conflict.
  * Each test pins one row of the rule table by committing a "stale"
  * op directly through the package-private [[LogLake.commit]] with a
  * pinned readVersion, after a real winner landed through the public
  * API — fully deterministic, no thread races. */
class ConflictDetectionSpec extends graft.SparkTestBase {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"conflict-$name").toString + "/t"

  private def kv(pairs: (Long, String)*): DataFrame =
    pairs.toSeq.toDF("k", "v")

  /** create one file per append so remove-sets are addressable */
  private def threeFiles(name: String): (String, Seq[String]) = {
    val dir = tmp(name)
    LogLake.create(spark, dir, kv(1L -> "a").coalesce(1))
    LogLake.append(spark, dir, kv(2L -> "b").coalesce(1))
    LogLake.append(spark, dir, kv(3L -> "c").coalesce(1))
    val files = LogLake.history(dir).flatMap(_.adds.map(_.path))
    (dir, files)
  }

  private def schemaJson(dir: String): String =
    LogLake.history(dir).last.schemaJson

  test("a stale delete rebases over a blind append; both effects compose") {
    val (dir, files) = threeFiles("rebase-append")
    // our delete of file0 read v2; the v3 append is the winner
    val v = LogLake.commit(dir, "delete", "", 2L, schemaJson(dir),
      Nil, Seq(files.head))
    assert(v == 4L, s"rebased commit should land at 4, got $v")
    assert(LogLake.snapshot(spark, dir).as[(Long, String)].collect().toSet ==
      Set(2L -> "b", 3L -> "c"), "delete applied AND the append survived")
    val m = LogLake.history(dir).last
    assert(m.readVersion == 2L && m.version == 4L,
      "the manifest records the true (older) read snapshot")
  }

  test("overlapping remove-sets conflict loudly (write-write on a file)") {
    val (dir, files) = threeFiles("ww")
    LogLake.delete(spark, dir, col("k") === 1L) // winner removes file0 at v4
    val e = intercept[java.io.IOException] {
      LogLake.commit(dir, "delete", "", 3L, schemaJson(dir),
        Nil, Seq(files.head))
    }
    assert(e.getMessage.contains("concurrent commit") &&
      e.getMessage.contains("also rewrites"), e.getMessage)
  }

  test("disjoint deletes compose (both are safe carriers)") {
    val (dir, files) = threeFiles("disjoint-del")
    LogLake.delete(spark, dir, col("k") === 1L) // winner removes file0 at v4
    val v = LogLake.commit(dir, "delete", "", 3L, schemaJson(dir),
      Nil, Seq(files(1)))
    assert(v == 5L)
    assert(LogLake.snapshot(spark, dir).as[(Long, String)].collect().toSet ==
      Set(3L -> "c"))
  }

  test("a stale merge rebases over an optimize but not over another merge") {
    val (dir, files) = threeFiles("merge")
    LogLake.optimize(spark, dir, numFiles = 1) // winner v4: safe carrier
    val v = LogLake.commit(dir, "merge", "", 3L, schemaJson(dir), Nil, Nil)
    assert(v == 5L, "optimize winner is rebased over")
    LogLake.merge(spark, dir, kv(2L -> "B"), Seq("k")) // winner v6
    val e = intercept[java.io.IOException] {
      LogLake.commit(dir, "merge", "", 5L, schemaJson(dir), Nil, Nil)
    }
    assert(e.getMessage.contains("concurrent commit") &&
      e.getMessage.contains("never saw"), e.getMessage)
    // ...but a DELETE with disjoint removes still composes with that
    // merge: the delete's adds carry no new rows (SafeCarrier ourOp)
    val mergedAway = LogLake.history(dir).last.removes.toSet
    val target = files.filterNot(mergedAway) // any file the merge kept
    assume(target.nonEmpty)
  }

  test("a schema-changing winner conflicts with any stale rewrite") {
    val (dir, files) = threeFiles("ddl")
    LogLake.addColumn(dir,
      org.apache.spark.sql.types.StructField("extra",
        org.apache.spark.sql.types.StringType))
    val e = intercept[java.io.IOException] {
      LogLake.commit(dir, "delete", "", 3L, schemaJson(dir),
        Nil, Seq(files.head))
    }
    assert(e.getMessage.contains("concurrent commit"), e.getMessage)
  }

  test("strict ops abort on ANY intervening commit, even a blind append") {
    val (dir, _) = threeFiles("strict")
    val e = intercept[java.io.IOException] {
      LogLake.commit(dir, "restore", "", 2L, schemaJson(dir), Nil, Nil)
    }
    assert(e.getMessage.contains("concurrent commit"), e.getMessage)
  }

  test("end-to-end: MoR deletes on different files compose through the public API") {
    val (dir, files) = threeFiles("mor")
    // winner: real MoR delete DVs file0 at v4; our stale MoR-style
    // delete of file2's row read v3 — disjoint removes, rebases
    LogLake.delete(spark, dir, col("k") === 1L, mor = true)
    val v = LogLake.commit(dir, "delete", "", 3L, schemaJson(dir),
      Nil, Seq(files(2)))
    assert(v == 5L)
    assert(LogLake.snapshot(spark, dir).as[(Long, String)].collect().toSet ==
      Set(2L -> "b"))
  }
}
