package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.LogLake

/** WRITE-TIME ROW TRACKING (Delta's row IDs): stable per-row identity
  * assigned at first write (manifest base + row_index for fresh files,
  * materialized hidden column through rewrites), CAS-reserved ranges,
  * and the payoff — [[LogLake.changeFeed]] labels a MERGE's updates vs
  * inserts EXACTLY without the CDC table property. */
class RowTrackingSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"rowtrack-$name").toString + "/t"

  private def kv(pairs: (Long, String)*): DataFrame =
    pairs.toSeq.toDF("k", "v")

  private def tracked(name: String, df: DataFrame): String = {
    val dir = tmp(name)
    // property BEFORE the first data commit: every file is tracked
    LogLake.createEmpty(dir, df.schema)
    LogLake.setTableProperties(dir, Map("loglake.enableRowTracking" -> "true"))
    LogLake.append(spark, dir, df)
    dir
  }

  private def idsByKey(dir: String): Map[Long, Long] =
    LogLake.snapshotWithRowIds(spark, dir)
      .select("k", LogLake.RowIdField).as[(Long, Long)].collect().toMap

  test("fresh appends: every row gets a distinct non-null id from disjoint ranges") {
    val dir = tracked("fresh", kv(1L -> "a", 2L -> "b", 3L -> "c"))
    LogLake.append(spark, dir, kv(4L -> "d", 5L -> "e"))
    val rows = LogLake.snapshotWithRowIds(spark, dir)
      .select("k", LogLake.RowIdField).as[(Long, java.lang.Long)]
      .collect().toSeq
    assert(rows.size == 5)
    assert(rows.forall(_._2 != null), s"null row ids: $rows")
    assert(rows.map(_._2).distinct.size == 5, s"duplicate row ids: $rows")
    // the manifest records bases, no data was rewritten for ids
    val adds = LogLake.history(dir).flatMap(_.adds)
    assert(adds.forall(_.baseRowId >= 0L),
      s"fresh appends must use base+offset ids, got ${adds.map(_.baseRowId)}")
    // the feature gate records the capability
    assert(LogLake.history(dir).last.features.contains("rowTracking"))
  }

  test("MERGE preserves updated rows' ids; inserts draw fresh ones") {
    val dir = tracked("merge", kv(1L -> "a", 2L -> "b", 3L -> "c"))
    val before = idsByKey(dir)
    LogLake.merge(spark, dir, kv(2L -> "B", 9L -> "z"), Seq("k"))
    val after = idsByKey(dir)
    assert(after(1L) == before(1L), "carried row must keep its id")
    assert(after(3L) == before(3L), "carried row must keep its id")
    assert(after(2L) == before(2L), "UPDATED row must keep its id — that is row tracking's contract")
    assert(!before.values.toSet.contains(after(9L)), "insert must get a fresh id")
    assert(after.values.toSeq.distinct.size == 4)
  }

  test("the change feed labels a merge exactly WITHOUT the CDC property") {
    val dir = tracked("feed", kv(1L -> "a", 2L -> "b", 3L -> "c"))
    assert(!graft.sources.LogLake.tableProperties(dir)
      .contains("loglake.enableChangeDataFeed"))
    val v0 = LogLake.currentVersion(dir)
    LogLake.merge(spark, dir, kv(2L -> "B", 9L -> "z"), Seq("k"))
    assert(LogLake.history(dir).last.cdc.isEmpty, "no write-time CDC files")
    val feed = LogLake.changeFeed(spark, dir, v0, v0 + 1)
      .select("_change_type", "k", "v").as[(String, Long, String)]
      .collect().toSeq.sorted
    assert(feed == Seq(
      ("insert", 9L, "z"),
      ("update_postimage", 2L, "B"),
      ("update_preimage", 2L, "b")), s"got $feed")
  }

  test("UPDATE and copy-on-write DELETE keep survivor ids; OPTIMIZE preserves ids through re-layout") {
    val dir = tracked("dml", kv(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d"))
    val before = idsByKey(dir)
    LogLake.update(spark, dir, col("k") === 3L, Map("v" -> lit("C")))
    LogLake.delete(spark, dir, col("k") === 4L)
    val mid = idsByKey(dir)
    assert(mid(1L) == before(1L) && mid(2L) == before(2L))
    assert(mid(3L) == before(3L), "updated row keeps its id")
    assert(!mid.contains(4L))
    LogLake.optimize(spark, dir, 1)
    assert(idsByKey(dir) == mid, "OPTIMIZE must not move any row id")
    // the update's feed labels the pair exactly, no CDC property
    val feed = LogLake.changeFeed(spark, dir, 2L, 3L)
      .select("_change_type", "k").as[(String, Long)].collect().toSeq.sorted
    assert(feed == Seq(("update_postimage", 3L), ("update_preimage", 3L)))
    // and the delete labels only the dead row
    val dfeed = LogLake.changeFeed(spark, dir, 3L, 4L)
      .select("_change_type", "k").as[(String, Long)].collect().toSeq
    assert(dfeed == Seq(("delete", 4L)))
  }

  test("merge-on-read DELETE leaves ids untouched (a DV moves no row)") {
    val dir = tracked("mor", kv(1L -> "a", 2L -> "b", 3L -> "c"))
    val before = idsByKey(dir)
    LogLake.delete(spark, dir, col("k") === 2L, mor = true)
    val after = idsByKey(dir)
    assert(after == before - 2L)
  }

  test("REPLACE WHERE region rows are new rows: fresh ids inside, survivors keep theirs") {
    val dir = tmp("rw")
    LogLake.createEmpty(dir,
      Seq((1L, "x")).toDF("k", "part").schema, partitionBy = Seq("part"))
    LogLake.setTableProperties(dir, Map("loglake.enableRowTracking" -> "true"))
    LogLake.append(spark, dir, Seq((1L, "x"), (2L, "y")).toDF("k", "part"))
    val before = idsByKey(dir)
    LogLake.overwriteWhere(spark, dir,
      Seq((10L, "x"), (11L, "x")).toDF("k", "part"), col("part") === "x")
    val after = idsByKey(dir)
    assert(after(2L) == before(2L), "row outside the region keeps its id")
    assert(Set(10L, 11L).subsetOf(after.keySet))
    assert(!before.values.toSet.exists(Set(after(10L), after(11L))),
      "replacement rows must draw fresh ids")
  }

  test("files written before tracking surface NULL ids; the feed falls back to the diff for them") {
    val dir = tmp("late")
    // one untracked FILE (coalesce) so the later merge must CARRY a
    // pre-tracking row through its rewrite — the partial-sentinel case
    LogLake.create(spark, dir, kv(1L -> "a", 2L -> "b").coalesce(1)) // untracked v1
    LogLake.setTableProperties(dir, Map("loglake.enableRowTracking" -> "true"))
    LogLake.append(spark, dir, kv(3L -> "c")) // tracked v2
    val rows = LogLake.snapshotWithRowIds(spark, dir)
      .select("k", LogLake.RowIdField).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(rows(1L).isEmpty && rows(2L).isEmpty, "pre-tracking rows have no id")
    assert(rows(3L).nonEmpty)
    // a merge touching the untracked file keeps the diff encoding
    // (feasibility is per-commit: an untracked involved file → fallback)
    LogLake.merge(spark, dir, kv(2L -> "B"), Seq("k"))
    val feed = LogLake.changeFeed(spark, dir, 2L, 3L)
      .select("_change_type", "k").as[(String, Long)].collect().toSeq.sorted
    assert(feed == Seq(("delete", 2L), ("insert", 2L)),
      s"expected the unlabeled diff for the untracked generation, got $feed")
    // the rewrite carried pre-tracking rows whose ids are NULL — the
    // manifest marks the file PARTIAL (-3), so later feeds know the
    // null-id fallback legs are needed; a fully-tracked table's files
    // are -2/base and those legs are skipped statically
    val rewrittenBrid = LogLake.history(dir).last.adds.map(_.baseRowId)
    assert(rewrittenBrid.contains(LogLake.MaterializedRowIdsPartial),
      s"expected a partial-materialized sentinel, got $rewrittenBrid")
    // a LATER merge touching the partial file takes the row-id branch
    // (no -1 file involved) with the null-fallback legs LIVE: the
    // tracked carried row cancels on its id, the null-id row's change
    // surfaces through the multiset legs as delete+insert
    LogLake.merge(spark, dir, kv(1L -> "A"), Seq("k"))
    val v4 = LogLake.currentVersion(dir)
    val feed2 = LogLake.changeFeed(spark, dir, v4 - 1, v4)
      .select("_change_type", "k", "v").as[(String, Long, String)]
      .collect().toSeq.sorted
    assert(feed2 == Seq(("delete", 1L, "a"), ("insert", 1L, "A")),
      s"expected the null-leg diff for the pre-tracking row, got $feed2")
  }

  test("the reader API surfaces _row_id via option(withRowIds); time travel composes") {
    val dir = tracked("reader", kv(1L -> "a", 2L -> "b"))
    LogLake.merge(spark, dir, kv(2L -> "B", 9L -> "z"), Seq("k"))
    val rows = spark.read.format("loglake")
      .option("withRowIds", "true").load(dir)
      .select("k", LogLake.RowIdField).as[(Long, Long)].collect().toMap
    assert(rows.keySet == Set(1L, 2L, 9L))
    assert(rows.values.toSeq.distinct.size == 3)
    // version pinned: v2 (the pre-merge append) through the reader
    val v2 = spark.read.format("loglake")
      .option("withRowIds", "true").option("versionAsOf", "2").load(dir)
      .select("k", LogLake.RowIdField).as[(Long, Long)].collect().toMap
    assert(v2.keySet == Set(1L, 2L))
    assert(v2(2L) == rows(2L), "the merge-updated row keeps its id across versions")
    // predicate + projection still prune through the frame-backed scan
    assert(spark.read.format("loglake").option("withRowIds", "true").load(dir)
      .filter(col("k") === 9L).select(LogLake.RowIdField).count() == 1L)
  }

  test("tracked tables round-trip through checkpoints and time travel") {
    val dir = tracked("chk", kv(1L -> "a"))
    (0 until 12).foreach(i => LogLake.append(spark, dir, kv((10L + i) -> s"r$i")))
    val ids = idsByKey(dir)
    assert(ids.size == 13 && ids.values.toSeq.distinct.size == 13)
    // time travel reads the bases of the old manifest
    val v3 = LogLake.snapshotWithRowIds(spark, dir, Some(3L))
      .select("k", LogLake.RowIdField).as[(Long, Long)].collect().toMap
    assert(v3.keySet == Set(1L, 10L))
    assert(v3.forall { case (k, id) => ids(k) == id },
      "ids must be stable across versions")
  }
}
