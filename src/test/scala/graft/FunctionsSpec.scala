package graft

import org.apache.spark.sql.functions._
import graft.functions.{Det, TextFeatures, Vec}

class FunctionsSpec extends SparkTestBase {
  import spark.implicits._

  test("h60 matches the DuckDB/md5 reference value") {
    // python: int(hashlib.md5(b"7:abc def").hexdigest()[:15], 16)
    val v = Seq("abc def").toDF("s")
      .select(Det.h60(col("s"), 7).as("h")).head().getLong(0)
    assert(v === 52211974417049249L)
  }

  test("h60Local is bit-compatible with the Column form") {
    assert(Det.h60Local("7:abc def") === 52211974417049249L)
    val fromCol = Seq("3:17").toDF("s").select(Det.h60(col("s")).as("h")).head().getLong(0)
    assert(Det.h60Local("3:17") === fromCol)
  }

  test("dsum is exact where double summation is not") {
    val df = Seq.fill(10000)(0.1).toDF("x")
    val exact = df.select(Det.dsum(col("x"))).head().getDouble(0)
    assert(exact === 1000.0) // naive double fold gives 1000.0000000001588
  }

  test("davg divides the exact sum") {
    val v = Seq(1.0, 2.0, 4.0).toDF("x")
      .select(Det.davg(col("x"))).head().getDouble(0)
    assert(v === 7.0 / 3)
  }

  test("ddot is an exact decimal fold over float arrays") {
    val v = Seq((Array(0.5f, 0.25f), Array(2.0f, 4.0f)))
      .toDF("a", "b").select(Vec.ddot(col("a"), col("b"))).head().getDouble(0)
    assert(v === 2.0)
  }

  test("norm collapses whitespace and case") {
    val v = Seq("  Hello   WORLD  ").toDF("t")
      .select(TextFeatures.norm(col("t"))).head().getString(0)
    assert(v === "hello world")
  }

  test("shingles are word 3-grams") {
    val v = Seq("a b c d").toDF("t")
      .select(TextFeatures.shingles(TextFeatures.words(col("t"))))
      .head().getSeq[String](0)
    assert(v === Seq("a b c", "b c d"))
  }

  test("q09's HLL estimate is within 3*rsd of q08-style exact distinct") {
    // q09 is rows-only at the driver gate (HLL estimates are
    // engine-specific); this pins its accuracy contract instead: at
    // rsd=0.01 the estimate must sit within 3 standard deviations (3%)
    // of the exact per-group distinct count. Deterministic: Spark's
    // HLL++ has no randomness for fixed input.
    val orders = graft.model.Tables.orders(spark, sfDir)
    val both = orders.groupBy("o_orderpriority").agg(
      approx_count_distinct(col("o_custkey"), 0.01).as("est"),
      countDistinct(col("o_custkey")).as("exact"))
    both.collect().foreach { r =>
      val est = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(est - exact) / exact <= 0.03,
        s"${r.getString(0)}: HLL $est vs exact $exact beyond 3*rsd")
    }
  }
}
