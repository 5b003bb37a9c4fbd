package graft

import org.apache.spark.sql.functions._
import graft.functions.Vec

class ScaledDotProductSpec extends SparkTestBase {
  import spark.implicits._

  private val ref: (Seq[Float], Seq[Float]) => Long = (a, b) =>
    a.zip(b).map { case (x, y) => math.floor(x.toDouble * y.toDouble * 1.0e12).toLong }.sum

  test("sdot matches the reference fold (codegen path)") {
    val a = Seq(0.5f, -0.25f, 0.125f)
    val b = Seq(2.0f, 4.0f, -8.0f)
    val v = Seq((a, b)).toDF("a", "b").select(Vec.sdot(col("a"), col("b"))).head().getLong(0)
    assert(v === ref(a, b))
  }

  test("sdot matches on the real embeddings table at both lengths") {
    val rows = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("embedding"), Vec.sdot(col("embedding"), col("embedding")).as("s"))
      .limit(50).collect()
    rows.foreach { r =>
      val e = r.getSeq[Float](0)
      assert(r.getLong(1) === ref(e, e))
    }
  }

  test("sdot is null-safe and length-min-bounded") {
    val df = Seq((Some(Seq(1.0f, 1.0f)), Option.empty[Seq[Float]])).toDF("a", "b")
    assert(df.select(Vec.sdot(col("a"), col("b"))).head().isNullAt(0))
    val short = Seq((Seq(1.0f, 1.0f, 1.0f), Seq(2.0f))).toDF("a", "b")
      .select(Vec.sdot(col("a"), col("b"))).head().getLong(0)
    assert(short === 2000000000000L) // only the overlapping prefix
  }

  test("scaled_dot is registered as a SQL function via GraftExtensions") {
    val v = spark.sql("SELECT scaled_dot(array(CAST(0.5 AS FLOAT)), array(CAST(2.0 AS FLOAT)))")
      .head().getLong(0)
    assert(v === 1000000000000L)
  }
}
