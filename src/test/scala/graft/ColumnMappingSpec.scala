package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.LogLake

/** Column mapping (rename/drop, the Delta columnMapping "name" mode):
  * renames and drops are metadata-only commits; old files keep serving
  * their bytes under stable PHYSICAL names while readers see the
  * current LOGICAL schema. The matrix here covers every read path
  * (snapshot, time travel, scanRange + stats skipping, change feed,
  * provider batch + streaming), DML through a mapped schema, and the
  * two resurrection hazards mapping exists to prevent.
  */
class ColumnMappingSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"colmap-$name").toString + "/t"

  private def kv(pairs: (Long, String)*): DataFrame =
    pairs.toSeq.toDF("k", "v")

  test("rename is metadata-only: old and new files both serve the renamed column") {
    val dir = tmp("rename")
    LogLake.create(spark, dir, kv(1L -> "a", 2L -> "b"))
    val dataFilesBefore = LogLake.activeState(dir)._1.map(_.path).toSet
    LogLake.renameColumn(spark, dir, "v", "label")
    assert(LogLake.activeState(dir)._1.map(_.path).toSet == dataFilesBefore,
      "rename must not touch a single data file")
    LogLake.append(spark, dir, Seq(3L -> "c").toDF("k", "label"))
    val snap = LogLake.snapshot(spark, dir)
    assert(snap.columns.toSeq == Seq("k", "label"))
    assert(snap.select("k", "label").as[(Long, String)].collect().toSeq.sorted ==
      Seq(1L -> "a", 2L -> "b", 3L -> "c"))
    // time travel to v1 shows the ORIGINAL logical name
    assert(LogLake.snapshot(spark, dir, Some(1L)).columns.toSeq == Seq("k", "v"))
    // appending under the OLD name is now a schema violation
    val e = intercept[IllegalArgumentException] {
      LogLake.append(spark, dir, kv(4L -> "d"))
    }
    assert(e.getMessage.contains("missing table columns"))
  }

  test("rename to an existing name / of a missing column fails loudly") {
    val dir = tmp("rename-bad")
    LogLake.create(spark, dir, kv(1L -> "a"))
    assert(intercept[IllegalArgumentException] {
      LogLake.renameColumn(spark, dir, "v", "K")
    }.getMessage.contains("column exists"))
    assert(intercept[IllegalArgumentException] {
      LogLake.renameColumn(spark, dir, "nope", "x")
    }.getMessage.contains("cannot rename"))
  }

  test("drop + re-add of the same logical name never resurrects the dropped data") {
    val dir = tmp("resurrect")
    LogLake.create(spark, dir, kv(1L -> "secret", 2L -> "hidden"))
    LogLake.dropColumn(spark, dir, "v")
    assert(LogLake.snapshot(spark, dir).columns.toSeq == Seq("k"))
    // re-add a column with the DROPPED logical name, append new rows
    LogLake.append(spark, dir, Seq((3L, "fresh")).toDF("k", "v"))
    val rows = LogLake.snapshot(spark, dir)
      .select("k", "v").as[(Long, Option[String])].collect().toSeq.sortBy(_._1)
    assert(rows == Seq((1L, None), (2L, None), (3L, Some("fresh"))),
      s"old files must read the re-added column as NULL, got $rows")
  }

  test("stats skipping survives a rename (stats keyed by physical name)") {
    val dir = tmp("stats")
    val df = spark.range(1, 1001).select(col("id").as("k"),
      (col("id") * 2).as("m"))
    // repartitionByRange → disjoint per-file m-ranges worth pruning
    LogLake.create(spark, dir,
      df.repartitionByRange(4, col("m")).sortWithinPartitions("m"),
      statsCols = Seq("m"))
    LogLake.renameColumn(spark, dir, "m", "metric")
    val (kept, total) = LogLake.pruneFiles(dir, "metric", 1900L, null)
    assert(total == 4 && kept.size < total,
      s"rename must not disable skipping: kept ${kept.size} of $total")
    assert(LogLake.scanRange(spark, dir, "metric", 1900L, null).count() == 51L)
    // and appends AFTER the rename keep collecting stats under the
    // stable physical key (inheritance maps physical -> logical)
    LogLake.append(spark, dir, spark.range(2000, 3000)
      .select(col("id").as("k"), (col("id") * 2).as("metric")))
    val (kept2, total2) = LogLake.pruneFiles(dir, "metric", 5800L, null)
    assert(kept2.size < total2, "post-rename appends must keep skipping alive")
  }

  test("DML through a mapped schema: merge, delete, MoR update, optimize") {
    val dir = tmp("dml")
    LogLake.create(spark, dir, kv(1L -> "a", 2L -> "b", 3L -> "c"))
    LogLake.renameColumn(spark, dir, "v", "label")
    LogLake.merge(spark, dir,
      Seq(2L -> "B", 9L -> "i").toDF("k", "label"), keyCols = Seq("k"))
    LogLake.update(spark, dir, col("k") === 1L,
      Map("label" -> upper(col("label"))), mor = true)
    LogLake.delete(spark, dir, col("label") === "c", mor = true)
    def rows() = LogLake.snapshot(spark, dir)
      .select("k", "label").as[(Long, String)].collect().toSeq.sorted
    assert(rows() == Seq(1L -> "A", 2L -> "B", 9L -> "i"))
    // OPTIMIZE materializes the DVs and rewrites under physical names
    LogLake.optimize(spark, dir, numFiles = 1)
    assert(rows() == Seq(1L -> "A", 2L -> "B", 9L -> "i"))
    assert(LogLake.activeState(dir)._1.forall(_.dv.isEmpty))
  }

  test("provider batch read with divergent mapping: correct rows, filters and pruning still apply") {
    val dir = tmp("provider")
    LogLake.create(spark, dir, kv(1L -> "a", 2L -> "b"))
    LogLake.renameColumn(spark, dir, "v", "label")
    val df = spark.read.format("loglake").load(dir)
    assert(df.columns.toSeq == Seq("k", "label"))
    assert(df.filter(col("label") === "b").select("k").as[Long].collect()
      .toSeq == Seq(2L))
    // NOT(translated AND untranslated) must not mis-filter: the frame
    // fallback re-applies every filter above the scan regardless
    assert(df.filter(!(col("label") === "a" && col("k") % 2 === 0)).count() == 2L)
  }

  test("streaming replay across a rename: pre-rename commits resolve by physical name") {
    val dir = tmp("stream"); val dst = tmp("stream-dst")
    val chk = Files.createTempDirectory("colmap-chk").toString
    LogLake.create(spark, dir, kv(1L -> "a"))
    LogLake.append(spark, dir, kv(2L -> "b"))
    LogLake.renameColumn(spark, dir, "v", "label")
    LogLake.append(spark, dir, Seq(3L -> "c").toDF("k", "label"))
    val q = spark.readStream.format("loglake").load(dir)
      .writeStream.format("loglake").option("path", dst)
      .option("checkpointLocation", chk)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val rows = LogLake.snapshot(spark, dst)
      .select("k", "label").as[(Long, String)].collect().toSeq.sorted
    assert(rows == Seq(1L -> "a", 2L -> "b", 3L -> "c"))
  }

  test("change feed across the rename boundary surfaces the final logical names") {
    val dir = tmp("cdf")
    LogLake.create(spark, dir, kv(1L -> "a"))
    LogLake.renameColumn(spark, dir, "v", "label")
    LogLake.append(spark, dir, Seq(2L -> "b").toDF("k", "label"))
    val cf = LogLake.changeFeed(spark, dir, 0L, 3L)
    assert(cf.columns.contains("label") && !cf.columns.contains("v"))
    assert(cf.filter(col("_change_type") === "insert").count() == 2L)
  }

  test("SQL DDL: ALTER TABLE RENAME/DROP/ADD COLUMN through the catalog") {
    val db = "cm" + java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    spark.sql(s"CREATE NAMESPACE loglake.$db")
    spark.sql(s"CREATE TABLE loglake.$db.t (k BIGINT, v STRING)")
    spark.sql(s"INSERT INTO loglake.$db.t VALUES (1, 'a'), (2, 'b')")
    spark.sql(s"ALTER TABLE loglake.$db.t RENAME COLUMN v TO label")
    spark.sql(s"INSERT INTO loglake.$db.t VALUES (3, 'c')")
    assert(spark.sql(s"SELECT label FROM loglake.$db.t ORDER BY k")
      .as[String].collect().toSeq == Seq("a", "b", "c"))
    spark.sql(s"ALTER TABLE loglake.$db.t ADD COLUMN score DOUBLE")
    spark.sql(s"ALTER TABLE loglake.$db.t DROP COLUMN label")
    assert(spark.sql(s"SELECT * FROM loglake.$db.t").columns.toSeq ==
      Seq("k", "score"))
    // time travel still shows the original shape
    assert(spark.sql(s"SELECT * FROM loglake.$db.t VERSION AS OF 2")
      .columns.toSeq == Seq("k", "v"))
  }

  test("rename/drop of a column referenced by a CHECK constraint is rejected") {
    val dir = tmp("constraint")
    LogLake.create(spark, dir, kv(1L -> "a"))
    LogLake.addCheckConstraint(spark, dir, "v_nonempty", "length(v) > 0")
    assert(intercept[IllegalArgumentException] {
      LogLake.renameColumn(spark, dir, "v", "label")
    }.getMessage.contains("v_nonempty"))
    assert(intercept[IllegalArgumentException] {
      LogLake.dropColumn(spark, dir, "v")
    }.getMessage.contains("v_nonempty"))
    LogLake.dropCheckConstraint(dir, "v_nonempty")
    LogLake.renameColumn(spark, dir, "v", "label") // now fine
  }
}
