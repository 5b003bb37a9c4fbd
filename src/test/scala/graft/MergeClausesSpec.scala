package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.LogLake
import graft.sources.LogLake.MergeClause._

/** The general MERGE clause matrix ([[LogLake.mergeClauses]]):
  * conditional UPDATE/DELETE on match, ordered first-match-wins clause
  * walks, arbitrary insert expressions, WHEN NOT MATCHED BY SOURCE,
  * CDC labeling and row-id preservation from the same single join. */
class MergeClausesSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"mclause-$name").toString + "/t"

  private def kvn(rows: (Long, String, Long)*): DataFrame =
    rows.toSeq.toDF("k", "v", "n")

  private def snap(dir: String): Set[(Long, String, Long)] =
    LogLake.snapshot(spark, dir).as[(Long, String, Long)].collect().toSet

  test("conditional matched update + matched delete, first clause wins") {
    val dir = tmp("cond")
    LogLake.create(spark, dir, kvn((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)))
    // source matches 1,2,3; n>=30 deletes, n>=20 bumps, else untouched-by-first-two
    LogLake.mergeClauses(spark, dir,
      kvn((1L, "A", 11L), (2L, "B", 22L), (3L, "C", 33L)),
      Seq("k"),
      Seq(
        MatchedDelete(Some(col("target.n") >= 30L)),
        MatchedUpdate(Some(col("target.n") >= 20L),
          Map("v" -> col("source.v"), "n" -> (col("target.n") + lit(1L))))))
    // k=3 deleted; k=2 updated from BOTH sides (source v, target n+1);
    // k=1 matched but claimed by no clause -> carried unchanged
    assert(snap(dir) == Set((1L, "a", 10L), (2L, "B", 21L)))
  }

  test("conditional insert with expressions; unclaimed source rows drop") {
    val dir = tmp("ins")
    LogLake.create(spark, dir, kvn((1L, "a", 10L)))
    LogLake.mergeClauses(spark, dir,
      kvn((1L, "A", 11L), (5L, "e", 50L), (6L, "f", 5L)),
      Seq("k"),
      Seq(NotMatchedInsert(Some(col("source.n") >= 10L),
        Map("k" -> col("source.k"), "v" -> upper(col("source.v")),
          "n" -> (col("source.n") * 2L)))))
    // k=1 matched, no matched clause -> carried; k=5 inserted through
    // the expressions; k=6 fails the insert condition -> dropped
    assert(snap(dir) == Set((1L, "a", 10L), (5L, "E", 100L)))
  }

  test("insert with unassigned columns fills NULL") {
    val dir = tmp("nulls")
    // nullable schema — a non-nullable table correctly REJECTS the
    // null-fill through the NOT NULL invariant (tested elsewhere)
    import org.apache.spark.sql.types._
    val nullableSchema = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType),
      StructField("n", LongType)))
    LogLake.create(spark, dir, spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(1L, "a", 10L)),
      nullableSchema))
    LogLake.mergeClauses(spark, dir,
      Seq((9L, "z", 90L)).toDF("k", "v", "n"), Seq("k"),
      Seq(NotMatchedInsert(None, Map("k" -> col("source.k")))))
    val rows = LogLake.snapshot(spark, dir).collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet
    assert(rows == Set((1L, Some("a"), Some(10L)), (9L, None, None)))
  }

  test("NOT MATCHED BY SOURCE update and delete reach unmatched target rows") {
    val dir = tmp("nmbs")
    LogLake.create(spark, dir,
      kvn((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L)))
    LogLake.mergeClauses(spark, dir,
      kvn((1L, "A", 11L)), Seq("k"),
      Seq(
        MatchedUpdate(None, Map("v" -> col("source.v"))),
        NotMatchedBySourceDelete(Some(col("target.n") >= 40L)),
        NotMatchedBySourceUpdate(Some(col("target.n") >= 30L),
          Map("v" -> lit("stale")))))
    // 1 updated; 4 deleted (first NMBS clause); 3 marked stale
    // (second); 2 untouched (claimed by neither)
    assert(snap(dir) ==
      Set((1L, "A", 10L), (2L, "b", 20L), (3L, "stale", 30L)))
  }

  test("unconditional NMBS delete with a disjoint-file layout touches every file") {
    val dir = tmp("full")
    LogLake.create(spark, dir, kvn((1L, "a", 10L)).coalesce(1))
    LogLake.append(spark, dir, kvn((2L, "b", 20L)).coalesce(1))
    LogLake.mergeClauses(spark, dir, kvn((1L, "A", 1L)), Seq("k"),
      Seq(NotMatchedBySourceDelete(None)))
    assert(snap(dir) == Set((1L, "a", 10L)), "only the matched row survives")
  }

  test("CDC labels updates, deletes and inserts exactly from the clause walk") {
    val dir = tmp("cdc")
    LogLake.create(spark, dir, kvn((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)))
    LogLake.setTableProperties(dir,
      Map("loglake.enableChangeDataFeed" -> "true"))
    LogLake.mergeClauses(spark, dir,
      kvn((1L, "A", 11L), (2L, "B", 22L), (9L, "z", 90L)), Seq("k"),
      Seq(
        MatchedDelete(Some(col("target.k") === 2L)),
        MatchedUpdate(None, Map("v" -> col("source.v"))),
        NotMatchedInsert(None,
          Map("k" -> col("source.k"), "v" -> col("source.v"),
            "n" -> col("source.n")))))
    val v = LogLake.currentVersion(dir)
    assert(LogLake.history(dir).last.cdc.nonEmpty, "change files recorded")
    val feed = LogLake.changeFeed(spark, dir, v - 1, v)
      .select("_change_type", "k", "v").as[(String, Long, String)]
      .collect().toSet
    assert(feed == Set(
      ("update_preimage", 1L, "a"), ("update_postimage", 1L, "A"),
      ("delete", 2L, "b"),
      ("insert", 9L, "z")), s"got $feed")
  }

  test("row tracking: updates keep ids, inserts draw fresh, carried keep") {
    val dir = tmp("rid")
    LogLake.createEmpty(dir, kvn((1L, "a", 1L)).schema)
    LogLake.setTableProperties(dir, Map("loglake.enableRowTracking" -> "true"))
    LogLake.append(spark, dir, kvn((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)))
    def ids(): Map[Long, Long] = LogLake.snapshotWithRowIds(spark, dir)
      .select("k", LogLake.RowIdField).as[(Long, Long)].collect().toMap
    val before = ids()
    LogLake.mergeClauses(spark, dir,
      kvn((2L, "B", 22L), (9L, "z", 90L)), Seq("k"),
      Seq(
        MatchedUpdate(None, Map("v" -> col("source.v"))),
        NotMatchedInsert(None,
          Map("k" -> col("source.k"), "v" -> col("source.v"),
            "n" -> col("source.n")))))
    val after = ids()
    assert(after(2L) == before(2L), "updated row keeps its id")
    assert(after(1L) == before(1L) && after(3L) == before(3L),
      "carried rows keep ids")
    assert(!before.values.toSet.contains(after(9L)), "insert draws fresh id")
  }

  test("insert-only clause set on no matches is a labeled pure append") {
    val dir = tmp("insonly")
    LogLake.create(spark, dir, kvn((1L, "a", 10L)))
    val v = LogLake.mergeClauses(spark, dir, kvn((7L, "g", 70L)), Seq("k"),
      Seq(NotMatchedInsert(None, Map("k" -> col("source.k"),
        "v" -> col("source.v"), "n" -> col("source.n")))))
    assert(LogLake.history(dir).last.removes.isEmpty, "no files rewritten")
    val feed = LogLake.changeFeed(spark, dir, v - 1, v)
      .select("_change_type", "k").as[(String, Long)].collect().toSet
    assert(feed == Set(("insert", 7L)))
  }

  test("a merge that claims nothing commits nothing") {
    val dir = tmp("noop")
    LogLake.create(spark, dir, kvn((1L, "a", 10L)))
    val v0 = LogLake.currentVersion(dir)
    val v = LogLake.mergeClauses(spark, dir, kvn((9L, "z", 90L)), Seq("k"),
      Seq(MatchedUpdate(None, Map("v" -> col("source.v")))))
    assert(v == v0, "no matched rows, no insert clause -> no commit")
    assert(snap(dir) == Set((1L, "a", 10L)))
  }
}
