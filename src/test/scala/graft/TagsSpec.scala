package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.LogLake

/** NAMED TAGS (Iceberg refs): human-named version pointers that pin
  * their snapshot against BOTH reclamation surfaces — vacuum keeps
  * every tagged version's files, metadata retention clamps its floor
  * to the oldest tag — so `VERSION AS OF 'name'` keeps working for the
  * tag's whole lifetime, and dropping the tag releases the storage on
  * the next maintenance pass. */
class TagsSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"lltag-$name").toString + "/t"

  private def sample(from: Int, to: Int): DataFrame =
    (from to to).map(i => (i.toLong, s"v$i")).toDF("k", "v")

  test("set/read/delete: tag round-trips through API, reader option, and SQL") {
    val dir = tmp("basic")
    LogLake.create(spark, dir, sample(1, 50))
    LogLake.setTag(dir, "baseline")
    LogLake.append(spark, dir, sample(51, 100))
    LogLake.setTag(dir, "after-append", Some(2L))
    assert(LogLake.tags(dir) == Map("baseline" -> 1L, "after-append" -> 2L))
    // path-reader option: a non-numeric versionAsOf is a tag
    assert(spark.read.format("loglake").option("versionAsOf", "baseline")
      .load(dir).count() == 50)
    // SQL: VERSION AS OF 'tag' plus the tag DDL trio on a path target
    spark.sql(s"ALTER TABLE '$dir' CREATE TAG sql-tag AS OF VERSION 1")
    val shown = spark.sql(s"SHOW TAGS '$dir'").collect()
    assert(shown.map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("after-append", 2L), ("baseline", 1L), ("sql-tag", 1L)))
    spark.sql(s"ALTER TABLE '$dir' DROP TAG sql-tag")
    assert(!LogLake.tags(dir).contains("sql-tag"))
    // RESTORE TO VERSION AS OF 'tag' resolves through the ref too
    spark.sql(s"RESTORE TABLE '$dir' TO VERSION AS OF 'baseline'")
    assert(spark.read.format("loglake").load(dir).count() == 50)
    LogLake.deleteTag(dir, "baseline")
    intercept[IllegalArgumentException] {
      spark.read.format("loglake").option("versionAsOf", "baseline")
        .load(dir).count()
    }
    // a tag must point at a resolvable version
    intercept[Exception] { LogLake.setTag(dir, "ghost", Some(99L)) }
    // digit-only names are refused: VERSION AS OF would read them as a
    // version number, never as the tag
    assert(intercept[IllegalArgumentException] {
      LogLake.setTag(dir, "2024")
    }.getMessage.contains("all digits"))
    // non-ASCII names are refused: the SQL DDL grammar couldn't address
    // them and the tag would be API-only
    intercept[IllegalArgumentException] { LogLake.setTag(dir, "café") }
  }

  test("vacuum keeps every tagged snapshot's files; dropping the tag releases them") {
    val dir = tmp("vac")
    LogLake.create(spark, dir, sample(1, 50))
    LogLake.setTag(dir, "keep-me")
    // overwrite retires ALL v1 files — without the tag, vacuum(now)
    // reclaims them and the tagged read dies
    LogLake.overwrite(spark, dir, sample(100, 120))
    val sweptPinned = LogLake.vacuum(dir, olderThanMs = -60000L)
    assert(sweptPinned.isEmpty,
      s"tagged snapshot's files must survive vacuum, swept: $sweptPinned")
    assert(spark.read.format("loglake").option("versionAsOf", "keep-me")
      .load(dir).count() == 50)
    LogLake.deleteTag(dir, "keep-me")
    val swept = LogLake.vacuum(dir, olderThanMs = -60000L)
    assert(swept.nonEmpty, "untagged retired generation must now reclaim")
    // current state unaffected; the old version is gone (loudly)
    assert(spark.read.format("loglake").load(dir).count() == 21)
    intercept[Exception] {
      LogLake.snapshot(spark, dir, asOf = Some(1L)).count()
    }
  }

  test("vacuum keeps BOTH DV generations when a tag and head share a data path") {
    // merge-on-read DELETE re-adds the same data path under a NEW dv
    // sidecar, so a tagged version and the current version can hold the
    // same path with DIFFERENT DVs. A keep-set deduped by path alone
    // would keep only one DV name and sweep the other — the tagged read
    // (or the head read) then dies on a missing sidecar.
    val dir = tmp("dvgen")
    LogLake.create(spark, dir, sample(1, 50))
    LogLake.delete(spark, dir, $"k" <= 5, mor = true)   // v2: path + dv1
    LogLake.setTag(dir, "pin")                          // pins v2
    LogLake.delete(spark, dir, $"k" <= 10, mor = true)  // v3: same path + dv2
    val swept = LogLake.vacuum(dir, olderThanMs = -60000L)
    // dv1 (tagged) and dv2 (head) must BOTH survive
    assert(spark.read.format("loglake").option("versionAsOf", "pin")
      .load(dir).count() == 45, "tagged DV generation must survive vacuum")
    assert(spark.read.format("loglake").load(dir).count() == 40,
      "head DV generation must survive vacuum")
    assert(!swept.exists(_.startsWith(LogLake.DvDir + "/")),
      s"no live DV may be swept, got: $swept")
  }

  test("metadata retention clamps its floor to the oldest tag") {
    val dir = tmp("retain")
    LogLake.create(spark, dir, sample(1, 5))
    (2 to 25).foreach(i => LogLake.append(spark, dir, sample(i * 10, i * 10 + 1)))
    LogLake.setTag(dir, "anchor", Some(15L))
    val swept = LogLake.cleanupMetadata(dir, olderThanMs = -60000L)
    // floor must be the newest checkpoint AT OR BELOW the tag (10),
    // not the newest expired checkpoint (20): log below a tag is pinned
    assert(swept.nonEmpty, "cleanup below the clamped floor must sweep")
    val vs = LogLake.history(dir).map(_.version)
    assert(vs == (10L to 25L),
      s"retained log must be the 10..25 suffix, got ${vs.mkString(",")}")
    assert(LogLake.snapshot(spark, dir,
      asOf = Some(LogLake.versionForTag(dir, "anchor"))).count() ==
      5 + 14 * 2) // v15 = create(5 rows) + appends for i=2..15 (2 each)
    // drop the tag: the next cleanup sweeps up to the true floor
    LogLake.deleteTag(dir, "anchor")
    LogLake.cleanupMetadata(dir, olderThanMs = -60000L)
    val vs2 = LogLake.history(dir).map(_.version)
    assert(vs2 == (20L to 25L),
      s"post-drop cleanup must sweep to the newest expired checkpoint, " +
        s"got ${vs2.mkString(",")}")
  }
}
