package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.LogLake.{AtLeastC, AtMostC, NeedsNullC, NeedsValueC}

/** The mutation-condition → stats-constraint extraction
  * ([[LogLake.conditionConstraints]]) that candidate discovery for
  * UPDATE/DELETE/replaceWhere/OPTIMIZE-WHERE rides. A Column's tree is
  * UNRESOLVED in Spark 4 — comparisons arrive as
  * UnresolvedFunction("=", …) — so the translation layer is
  * load-bearing: round 14 shipped it returning Nil for every shape
  * (conservative ⇒ correct but unpruned: at 10⁸ files the candidates
  * job would ship the whole table to the driver). These pins make that
  * regression impossible to miss. */
class ConditionConstraintsSpec extends graft.SparkTestBase {

  private val schema = StructType(Seq(StructField("k", LongType),
    StructField("v", StringType), StructField("p", StringType)))
  private def cs(c: org.apache.spark.sql.Column) =
    LogLake.conditionConstraints(schema, c)

  test("equality, range, between, conjunction, in, null tests all extract") {
    assert(cs(col("p") === "3") == Seq(AtLeastC("p", "3"), AtMostC("p", "3")))
    assert(cs(col("k") > 5L) == Seq(AtLeastC("k", "5")))
    assert(cs(col("k").between(500L, 560L)) ==
      Seq(AtLeastC("k", "500"), AtMostC("k", "560")))
    assert(cs(col("k") >= 1L && col("p") === "x") ==
      Seq(AtLeastC("k", "1"), AtLeastC("p", "x"), AtMostC("p", "x")))
    assert(cs(col("p").isin("a", "c")) ==
      Seq(AtLeastC("p", "a"), AtMostC("p", "c")))
    assert(cs(col("p").isNull) == Seq(NeedsNullC("p")))
    assert(cs(col("p").isNotNull) == Seq(NeedsValueC("p")))
  }

  test("opaque shapes prove nothing (kept, never pruned)") {
    assert(cs(col("k") % 97 === 0).isEmpty)
    assert(cs(col("k") === 1L || col("k") === 2L).isEmpty)
    assert(cs(upper(col("p")) === "X").isEmpty)
    assert(cs(col("unknown_col") === 1L).isEmpty)
  }

  test("cross-class literals are opaque; same-class widenings extract") {
    // un-coerced literals: a cross-class prune orders values
    // differently from the execution-time coerced filter — e.g.
    // isin("9", "100") on a long column would make the lexicographic
    // envelope ["100", "9"], numerically the contradictory [100, 9],
    // pruning the file that holds k=100
    assert(cs(col("k").isin("9", "100")).isEmpty)
    assert(cs(col("k") === "5").isEmpty)   // string literal, long col
    assert(cs(col("p") === 3).isEmpty)     // int literal, string col
    assert(cs(col("k") === 5.5).isEmpty)   // double literal, long col
    // integral widening is the SAME comparison class — still extracts
    assert(cs(col("k") === 5) == Seq(AtLeastC("k", "5"), AtMostC("k", "5")))
    assert(cs(col("k").isin(9, 100)) ==
      Seq(AtLeastC("k", "9"), AtMostC("k", "100")))
  }

  test("the prune is actually selective through a distributed delete") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("condsel").toString + "/t"
    LogLake.createEmpty(dir, Seq((1L, "x")).toDF("k", "v").schema)
    LogLake.setTableProperties(dir, Map(
      "loglake.checkpoint.format" -> "parquet",
      "loglake.checkpoint.partSizeFiles" -> "4",
      "loglake.planning.distributed" -> "true"))
    (0 until 12).foreach(i =>
      LogLake.append(spark, dir,
        Seq((i * 100L, s"a$i")).toDF("k", "v").repartition(1)))
    LogLake.clearSnapshotCache()
    // the candidate set the job ships back must be CONSTRAINT-sized,
    // not table-sized: survivors of k ∈ [500, 560] are 1 of 12 files
    val p = LogLake.lazyPlanInfo(dir, LogLake.currentVersion(dir),
      allowDvs = true).get
    val band = cs(col("k").between(500L, 560L))
    val (kept, total) = LogLake.planSurvivors(spark, p,
      a => LogLake.constraintsKeep(band, a))
    assert(total == 12L && kept.size == 1,
      s"expected 1 candidate of 12, got ${kept.size}")
  }
}
