package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.LogLake

/** Write-time CDC for MERGE (Delta's AddCDCFile under
  * `enableChangeDataFeed`) + the table-property store that gates it.
  * The property is the Delta contract: without it a merge's feed stays
  * the exact-but-unlabeled diff (delete+insert); with it the writer
  * records labeled change rows in `_loglake/cdc/` and the feed serves
  * them directly — the only encoding that can tell a MERGE's updates
  * from its inserts.
  */
class CdfMergeSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"cdf-$name").toString + "/t"

  private def kv(pairs: (Long, String)*): DataFrame =
    pairs.toSeq.toDF("k", "v")

  private def enableCdf(dir: String): Unit =
    LogLake.setTableProperties(dir, Map("loglake.enableChangeDataFeed" -> "true"))

  private def feed(dir: String, from: Long, to: Long): Seq[(String, Long, String)] =
    LogLake.changeFeed(spark, dir, from, to)
      .select("_change_type", "k", "v").as[(String, Long, String)]
      .collect().toSeq.sorted

  test("table properties: set / read / unset round-trip") {
    val dir = tmp("props")
    LogLake.create(spark, dir, kv(1L -> "a"))
    assert(LogLake.tableProperties(dir).isEmpty)
    LogLake.setTableProperties(dir, Map("a" -> "1", "b" -> "2"))
    LogLake.setTableProperties(dir, Map("b" -> "3"))
    assert(LogLake.tableProperties(dir) == Map("a" -> "1", "b" -> "3"))
    LogLake.unsetTableProperties(dir, Seq("a", "missing"))
    assert(LogLake.tableProperties(dir) == Map("b" -> "3"))
  }

  test("merge with CDF records exact update images and inserts") {
    val dir = tmp("merge")
    LogLake.create(spark, dir, kv(1L -> "a", 2L -> "b", 3L -> "c"))
    enableCdf(dir)
    // update k=2 (b→B), insert k=9
    LogLake.merge(spark, dir, kv(2L -> "B", 9L -> "z"), Seq("k"))
    assert(feed(dir, 1L, 2L) == Seq(
      ("insert", 9L, "z"),
      ("update_postimage", 2L, "B"),
      ("update_preimage", 2L, "b")))
    // snapshot unaffected by the CDC sidecar
    assert(LogLake.snapshot(spark, dir).select("k", "v").as[(Long, String)]
      .collect().toSeq.sorted == Seq(1L -> "a", 2L -> "B", 3L -> "c", 9L -> "z"))
    // the commit references change files under _loglake/cdc/
    val m = LogLake.history(dir).last
    assert(m.op == "merge" && m.cdc.nonEmpty)
    assert(m.cdc.forall(_.startsWith("_loglake/cdc/")))
  }

  test("duplicate-key target rows: CDC and non-CDC paths commit the same snapshot") {
    // the replace-by-key contract: ALL duplicate target rows of a
    // matched key collapse into the single source row — identical
    // under both paths (enabling CDF must never change the snapshot);
    // the feed shows one preimage per collapsed duplicate, one
    // postimage per key
    def build(withCdf: Boolean): String = {
      val dir = tmp(s"dup-$withCdf")
      LogLake.create(spark, dir, kv(1L -> "a", 2L -> "b1", 2L -> "b2"))
      if (withCdf) enableCdf(dir)
      LogLake.merge(spark, dir, kv(2L -> "B", 9L -> "z"), Seq("k"))
      dir
    }
    val cdf = build(withCdf = true)
    val plain = build(withCdf = false)
    def snap(dir: String): Seq[(Long, String)] =
      LogLake.snapshot(spark, dir).select("k", "v").as[(Long, String)]
        .collect().toSeq.sorted
    assert(snap(cdf) == Seq(1L -> "a", 2L -> "B", 9L -> "z"))
    assert(snap(cdf) == snap(plain))
    assert(feed(cdf, 1L, 2L) == Seq(
      ("insert", 9L, "z"),
      ("update_postimage", 2L, "B"),
      ("update_preimage", 2L, "b1"),
      ("update_preimage", 2L, "b2")))
  }

  test("writeCdc sweeps its staging directory") {
    val dir = tmp("staging")
    LogLake.create(spark, dir, kv(1L -> "a", 2L -> "b"))
    enableCdf(dir)
    LogLake.merge(spark, dir, kv(2L -> "B"), Seq("k"))
    LogLake.update(spark, dir, col("k") === 1L, Map("v" -> lit("A")))
    val f = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI("file:///"), spark.sessionState.newHadoopConf())
    val tmpDir = new Path(dir, "_loglake/_tmp")
    val leftovers =
      if (!f.exists(tmpDir)) Seq.empty
      else f.listStatus(tmpDir).toSeq.map(_.getPath.getName)
        .filter(_.startsWith("cdc-"))
    assert(leftovers.isEmpty, s"orphan cdc staging dirs: $leftovers")
  }

  test("merge without the property keeps the diff encoding (delete+insert)") {
    val dir = tmp("nocdf")
    LogLake.create(spark, dir, kv(1L -> "a", 2L -> "b"))
    LogLake.merge(spark, dir, kv(2L -> "B", 9L -> "z"), Seq("k"))
    assert(LogLake.history(dir).last.cdc.isEmpty)
    assert(feed(dir, 1L, 2L) == Seq(
      ("delete", 2L, "b"),
      ("insert", 2L, "B"),
      ("insert", 9L, "z")))
  }

  test("insert-only merge writes no change files; feed still labels inserts") {
    val dir = tmp("insonly")
    LogLake.create(spark, dir, kv(1L -> "a"))
    enableCdf(dir)
    LogLake.merge(spark, dir, kv(8L -> "x", 9L -> "y"), Seq("k"))
    assert(LogLake.history(dir).last.cdc.isEmpty) // pure-append fast path covers it
    assert(feed(dir, 1L, 2L) == Seq(("insert", 8L, "x"), ("insert", 9L, "y")))
  }

  test("unmatched rows in touched files are carried, not surfaced as changes") {
    val dir = tmp("carry")
    // one file holds both keys; only k=2 is matched
    LogLake.create(spark, dir, kv(1L -> "a", 2L -> "b"))
    enableCdf(dir)
    LogLake.merge(spark, dir, kv(2L -> "B"), Seq("k"))
    assert(feed(dir, 1L, 2L) == Seq(
      ("update_postimage", 2L, "B"),
      ("update_preimage", 2L, "b")))
  }

  test("change files survive column rename: physical-keyed, served logical") {
    val dir = tmp("rename")
    LogLake.create(spark, dir, kv(1L -> "a", 2L -> "b"))
    enableCdf(dir)
    LogLake.merge(spark, dir, kv(2L -> "B"), Seq("k"))
    LogLake.renameColumn(spark, dir, "v", "val")
    // toV covers the DDL commit — the feed serves toV's schema, so the
    // v2 change rows (physical-keyed) surface under the NEW logical name
    val rows = LogLake.changeFeed(spark, dir, 1L, LogLake.currentVersion(dir))
      .select("_change_type", "k", "val").as[(String, Long, String)]
      .collect().toSeq.sorted
    assert(rows == Seq(("update_postimage", 2L, "B"), ("update_preimage", 2L, "b")))
  }

  test("change files null-fill a column added after the commit") {
    val dir = tmp("evolve")
    LogLake.create(spark, dir, kv(1L -> "a", 2L -> "b"))
    enableCdf(dir)
    LogLake.merge(spark, dir, kv(2L -> "B"), Seq("k"))
    LogLake.addColumn(dir,
      org.apache.spark.sql.types.StructField("note",
        org.apache.spark.sql.types.StringType, nullable = true))
    val rows = LogLake.changeFeed(spark, dir, 1L, LogLake.currentVersion(dir))
      .select("_change_type", "k", "note").collect()
      .map(r => (r.getString(0), r.getLong(1), r.isNullAt(2))).toSeq.sorted
    assert(rows == Seq(("update_postimage", 2L, true), ("update_preimage", 2L, true)))
  }

  test("streaming CDF delivers the merge's labeled rows") {
    val dir = tmp("stream-src"); val chk = tmp("stream-chk")
    LogLake.create(spark, dir, kv(1L -> "a", 2L -> "b"))
    enableCdf(dir)
    LogLake.merge(spark, dir, kv(2L -> "B", 9L -> "z"), Seq("k"))
    val out = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, String)]()
    val q = spark.readStream.format("loglake")
      .option("readChangeFeed", "true")
      .option("maxVersionsPerTrigger", "1").load(dir)
      .writeStream.foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.select("_change_type", "k", "v").collect()
          .foreach(r => out.add((r.getString(0), r.getLong(1), r.getString(2))))
        ()
      }
      .option("checkpointLocation", chk)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(out.iterator().hasNext)
    val got = out.toArray(Array.empty[(String, Long, String)]).toSeq.sorted
    assert(got.contains(("update_preimage", 2L, "b")))
    assert(got.contains(("update_postimage", 2L, "B")))
    assert(got.contains(("insert", 9L, "z")))
  }

  test("change files age out with vacuum retention; the feed past it fails loudly") {
    val dir = tmp("vacuum")
    LogLake.create(spark, dir, kv(1L -> "a", 2L -> "b"))
    enableCdf(dir)
    LogLake.merge(spark, dir, kv(2L -> "B"), Seq("k"))
    val cdc = LogLake.history(dir).last.cdc
    assert(cdc.nonEmpty)
    val f = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI("file:///"), spark.sessionState.newHadoopConf())
    // inside the retention window: untouched, feed serves
    LogLake.vacuum(dir) // default 7-day horizon
    cdc.foreach(p => assert(f.exists(new Path(dir, p)), s"vacuumed $p early"))
    assert(feed(dir, 1L, 2L).nonEmpty)
    // past the horizon: reclaimed (dry run names it first), feed loud
    val dry = LogLake.vacuum(dir, olderThanMs = -1000L, dryRun = true)
    assert(cdc.forall(dry.contains))
    LogLake.vacuum(dir, olderThanMs = -1000L)
    cdc.foreach(p => assert(!f.exists(new Path(dir, p))))
    val e = intercept[java.io.IOException] { feed(dir, 1L, 2L) }
    assert(e.getMessage.contains("vacuumed"))
  }

  test("DELETE and UPDATE also record change files under the property") {
    val dir = tmp("dml")
    LogLake.create(spark, dir, kv(1L -> "a", 2L -> "b", 3L -> "c"))
    enableCdf(dir)
    LogLake.delete(spark, dir, col("k") === 2L, mor = true)          // v2
    LogLake.update(spark, dir, col("k") === 3L,
      Map("v" -> lit("C")))                                          // v3
    val h = LogLake.history(dir)
    assert(h.filter(m => m.op == "delete" || m.op == "update")
      .forall(_.cdc.nonEmpty))
    assert(feed(dir, 1L, 2L) == Seq(("delete", 2L, "b")))
    assert(feed(dir, 2L, 3L) == Seq(
      ("update_postimage", 3L, "C"),
      ("update_preimage", 3L, "c")))
    // a partition metadata-only delete stays change-file-free (it
    // would read the dropped volume); its feed keeps the remove diff
    val pdir = tmp("pdml")
    LogLake.create(spark, pdir,
      Seq((1L, "x"), (2L, "y")).toDF("k", "part"),
      partitionBy = Seq("part"))
    enableCdf(pdir)
    LogLake.delete(spark, pdir, col("part") === "x")
    assert(LogLake.history(pdir).last.cdc.isEmpty)
    assert(LogLake.changeFeed(spark, pdir, 1L, 2L)
      .select("_change_type", "k").as[(String, Long)].collect().toSeq ==
      Seq(("delete", 1L)))
  }

  test("replaceWhere records change files on the rewrite path; partition regions stay zero-IO") {
    // rewrite path (non-partition predicate): region rows out as
    // 'delete', replacement rows as 'insert' — recorded at write
    val dir = tmp("rw-cdf")
    LogLake.create(spark, dir, kv(1L -> "a", 2L -> "b", 3L -> "c"))
    enableCdf(dir)
    LogLake.overwriteWhere(spark, dir, kv(10L -> "x", 11L -> "x"),
      col("k") >= 2L)
    assert(LogLake.history(dir).last.cdc.nonEmpty,
      "rewrite-path replaceWhere must record change files under the property")
    assert(feed(dir, 1L, 2L) == Seq(
      ("delete", 2L, "b"), ("delete", 3L, "c"),
      ("insert", 10L, "x"), ("insert", 11L, "x")))
    // partition metadata-only path: no change files (zero data IO —
    // the partition DELETE rule); the feed keeps the exact remove diff
    val pdir = tmp("rw-part")
    import spark.implicits._
    LogLake.create(spark, pdir, Seq((1L, "x"), (2L, "y")).toDF("k", "part"),
      partitionBy = Seq("part"))
    enableCdf(pdir)
    LogLake.overwriteWhere(spark, pdir, Seq((10L, "x")).toDF("k", "part"),
      col("part") === "x")
    assert(LogLake.history(pdir).last.cdc.isEmpty)
    val pf = LogLake.changeFeed(spark, pdir, 1L, 2L)
      .select("_change_type", "k").as[(String, Long)].collect().toSeq.sorted
    assert(pf == Seq(("delete", 1L), ("insert", 10L)))
  }

  test("row tracking and write-time CDC coexist: change files win, labels agree") {
    // both properties on: the merge still records CDC files (the feed's
    // first-priority source) and the rewrite still preserves row ids —
    // and the labels agree with what row tracking alone would derive
    val dir = tmp("both")
    LogLake.createEmpty(dir, kv(1L -> "a").schema)
    LogLake.setTableProperties(dir, Map(
      "loglake.enableRowTracking" -> "true",
      "loglake.enableChangeDataFeed" -> "true"))
    LogLake.append(spark, dir, kv(1L -> "a", 2L -> "b"))
    LogLake.merge(spark, dir, kv(2L -> "B", 9L -> "z"), Seq("k"))
    assert(LogLake.history(dir).last.cdc.nonEmpty, "CDC files still recorded")
    assert(feed(dir, 2L, 3L) == Seq(
      ("insert", 9L, "z"),
      ("update_postimage", 2L, "B"),
      ("update_preimage", 2L, "b")))
    // ids preserved through the CDC-path rewrite too
    val ids = LogLake.snapshotWithRowIds(spark, dir)
      .select("k", LogLake.RowIdField).collect()
    assert(ids.forall(!_.isNullAt(1)), s"lost row ids: ${ids.mkString(",")}")
  }

  test("shallow clone carries table properties") {
    val src = tmp("clone-src"); val dst = tmp("clone-dst")
    LogLake.create(spark, src, kv(1L -> "a"))
    enableCdf(src)
    LogLake.cloneShallow(spark, src, dst)
    assert(LogLake.tableProperties(dst)
      .get("loglake.enableChangeDataFeed").contains("true"))
    // a merge on the CLONE records its own change files
    LogLake.merge(spark, dst, kv(1L -> "A"), Seq("k"))
    assert(LogLake.history(dst).last.cdc.nonEmpty)
  }
}
