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

  // ---- MERGE schema evolution (round 16 — Delta's autoMerge) ----

  private val evoOn = Map("loglake.merge.schemaEvolution" -> "true")

  test("merge evolution: a source-only column evolves the table in the same commit") {
    val dir = tmp("evo")
    LogLake.create(spark, dir, kvn((1L, "a", 10L), (2L, "b", 20L)))
    LogLake.setTableProperties(dir, evoOn)
    val src = Seq((2L, "B", 22L, "new2"), (5L, "e", 50L, "new5"))
      .toDF("k", "v", "n", "extra")
    LogLake.mergeClauses(spark, dir, src, Seq("k"), Seq(
      MatchedUpdate(None, Map("v" -> col("source.v"),
        "extra" -> col("source.extra"))),
      NotMatchedInsert(None, Map("k" -> col("source.k"),
        "v" -> col("source.v"), "n" -> col("source.n"),
        "extra" -> col("source.extra")))))
    val out = LogLake.snapshot(spark, dir)
    assert(out.schema.fieldNames.toSeq == Seq("k", "v", "n", "extra"))
    assert(out.schema("extra").nullable, "evolved columns must be nullable")
    assert(out.as[(Long, String, Long, Option[String])].collect().toSet == Set(
      (1L, "a", 10L, None),            // carried: old file serves NULL
      (2L, "B", 20L, Some("new2")),    // updated, evolved column assigned
      (5L, "e", 50L, Some("new5"))))   // inserted with the new column
  }

  test("merge evolution: off by default — the simple merge keeps exact-match") {
    val dir = tmp("evo-off")
    LogLake.create(spark, dir, kvn((1L, "a", 10L)))
    val widened = Seq((1L, "A", 11L, true)).toDF("k", "v", "n", "flag")
    val e = intercept[IllegalArgumentException] {
      LogLake.merge(spark, dir, widened, keyCols = Seq("k"))
    }
    assert(e.getMessage.contains("must match table columns"))
  }

  test("merge evolution: the simple whole-row merge widens too") {
    val dir = tmp("evo-simple")
    LogLake.create(spark, dir, kvn((1L, "a", 10L), (2L, "b", 20L)))
    LogLake.setTableProperties(dir, evoOn)
    LogLake.merge(spark, dir,
      Seq((2L, "B", 22L, 7L), (9L, "i", 90L, 9L)).toDF("k", "v", "n", "m"),
      keyCols = Seq("k"))
    assert(LogLake.snapshot(spark, dir)
      .as[(Long, String, Long, Option[Long])].collect().toSet ==
      Set((1L, "a", 10L, None), (2L, "B", 22L, Some(7L)), (9L, "i", 90L, Some(9L))))
  }

  test("merge evolution: retype still refuses") {
    val dir = tmp("evo-retype")
    LogLake.create(spark, dir, kvn((1L, "a", 10L)))
    LogLake.setTableProperties(dir, evoOn)
    val retyped = Seq((1L, "A", "not-a-long")).toDF("k", "v", "n")
    val e = intercept[IllegalArgumentException] {
      LogLake.mergeClauses(spark, dir, retyped, Seq("k"),
        Seq(MatchedUpdate(None, Map("v" -> col("source.v")))))
    }
    assert(e.getMessage.contains("cannot retype"))
  }

  test("merge evolution composes with CDC: change rows carry the evolved column") {
    val dir = tmp("evo-cdf")
    LogLake.create(spark, dir, kvn((1L, "a", 10L), (2L, "b", 20L)))
    LogLake.setTableProperties(dir,
      evoOn + ("loglake.enableChangeDataFeed" -> "true"))
    LogLake.mergeClauses(spark, dir,
      Seq((2L, "B", 22L, "x2"), (7L, "g", 70L, "x7"))
        .toDF("k", "v", "n", "extra"), Seq("k"), Seq(
        MatchedUpdate(None, Map("v" -> col("source.v"),
          "extra" -> col("source.extra"))),
        NotMatchedInsert(None, Map("k" -> col("source.k"),
          "v" -> col("source.v"), "n" -> col("source.n"),
          "extra" -> col("source.extra")))))
    val feed = LogLake.changeFeed(spark, dir, 1L, LogLake.currentVersion(dir))
      .select(col("_change_type"), col("k"), col("v"), col("extra"))
      .as[(String, Long, String, Option[String])].collect().toSeq.sorted
    assert(feed == Seq(
      ("insert", 7L, "g", Some("x7")),
      ("update_postimage", 2L, "B", Some("x2")),
      ("update_preimage", 2L, "b", None)), // pre-image predates the column
      s"got $feed")
  }

  test("merge evolution keeps row identity through the widening rewrite") {
    val dir = tmp("evo-rid")
    LogLake.createEmpty(dir, kvn((1L, "a", 10L)).schema)
    LogLake.setTableProperties(dir, evoOn +
      ("loglake.enableRowTracking" -> "true"))
    LogLake.append(spark, dir, kvn((1L, "a", 10L), (2L, "b", 20L)))
    def ids(): Map[Long, Long] =
      LogLake.snapshotWithRowIds(spark, dir)
        .select(col("k"), col(LogLake.RowIdField)).as[(Long, Long)]
        .collect().toMap
    val before = ids()
    LogLake.mergeClauses(spark, dir,
      Seq((2L, "B", 22L, 5L)).toDF("k", "v", "n", "extra"), Seq("k"), Seq(
        MatchedUpdate(None, Map("v" -> col("source.v"),
          "extra" -> col("source.extra")))))
    val after = ids()
    assert(after(1L) == before(1L) && after(2L) == before(2L),
      "a widening update must keep both the updated and carried rows' ids")
    assert(LogLake.snapshot(spark, dir)
      .as[(Long, String, Long, Option[Long])].collect().toSet ==
      Set((1L, "a", 10L, None), (2L, "B", 20L, Some(5L))))
  }

  test("merge evolution under column mapping: the new column draws a physical name") {
    val dir = tmp("evo-map")
    LogLake.create(spark, dir, kvn((1L, "a", 10L)))
    LogLake.renameColumn(spark, dir, "v", "label") // activates mapping
    LogLake.setTableProperties(dir, evoOn)
    LogLake.mergeClauses(spark, dir,
      Seq((1L, "A", 11L, 99L)).toDF("k", "label", "n", "score"), Seq("k"),
      Seq(MatchedUpdate(None, Map("label" -> col("source.label"),
        "score" -> col("source.score")))))
    val out = LogLake.snapshot(spark, dir)
    assert(out.as[(Long, String, Long, Option[Long])].collect().toSet ==
      Set((1L, "A", 10L, Some(99L))))
    // a later rename of the evolved column keeps serving its data —
    // only possible if it got its own physical name
    LogLake.renameColumn(spark, dir, "score", "points")
    assert(LogLake.snapshot(spark, dir)
      .select("points").as[Option[Long]].collect().toSeq == Seq(Some(99L)))
  }

  test("merge evolution matches case-insensitively: a case-twin never evolves in") {
    // ADVICE r16: under Spark's default case-insensitive resolver a
    // source column 'N' IS the table's 'n' — silently adding it would
    // leave the table with two names no query can disambiguate.
    // Delta's autoMerge normalizes; we refuse loudly (binding would
    // stage data files under the wrong-case physical name).
    val dir = tmp("evo-case")
    LogLake.create(spark, dir, kvn((1L, "a", 10L)))
    LogLake.setTableProperties(dir, evoOn)
    val caseTwin = Seq((1L, "A", 11L)).toDF("k", "v", "N")
    val e = intercept[IllegalArgumentException] {
      LogLake.mergeClauses(spark, dir, caseTwin, Seq("k"),
        Seq(MatchedUpdate(None, Map("v" -> col("source.v")))))
    }
    assert(e.getMessage.contains("only by case"))
    assert(LogLake.snapshot(spark, dir).schema.fieldNames.toSeq ==
      Seq("k", "v", "n"), "the refused merge must not have evolved anything")
    // and two NEW source columns colliding only by case refuse too —
    // either alone would be additive, together they are unresolvable
    val dupNew = Seq((1L, "A", 11L, 1L, 2L)).toDF("k", "v", "n", "extra", "Extra")
    val e2 = intercept[IllegalArgumentException] {
      LogLake.mergeClauses(spark, dir, dupNew, Seq("k"),
        Seq(MatchedUpdate(None, Map("v" -> col("source.v")))))
    }
    assert(e2.getMessage.contains("case-colliding"))
  }

  test("append evolution matches case-insensitively too") {
    val dir = tmp("evo-case-append")
    LogLake.create(spark, dir, kvn((1L, "a", 10L)))
    val e = intercept[IllegalArgumentException] {
      LogLake.append(spark, dir, Seq((2L, "b", 20L)).toDF("k", "V", "n"))
    }
    assert(e.getMessage.contains("only by case"),
      "a case-differing append column must refuse as a case bind, " +
        "not read as drop-plus-add")
  }
}
