package graft

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.functions._
import graft.expressions.{LongDotProduct, LongZipAdd, LongZipSub, NormScale}

/** The codegen `array<long>` kernels (r17 optimization) must be
  * bit-identical — result AND null semantics — to the HOF forms they
  * replaced in the ANN path, because the DuckDB oracle replays that
  * exact math. Each case evaluates both forms over the same frame and
  * requires equality, in the default (codegen) path; the eval twin is
  * exercised through the interpreted-projection factory.
  */
class LongVecSpec extends SparkTestBase {
  import spark.implicits._

  private def ldotNew(a: Column, b: Column): Column =
    GraftBridge.column(LongDotProduct(
      GraftBridge.expression(a), GraftBridge.expression(b)))
  private def ldotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)
  private def subNew(a: Column, b: Column): Column =
    GraftBridge.column(LongZipSub(
      GraftBridge.expression(a), GraftBridge.expression(b)))
  private def addNew(a: Column, b: Column): Column =
    GraftBridge.column(LongZipAdd(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  private val frame: DataFrame = Seq(
    (Some(Seq[Option[Long]](Some(3L), Some(-7L), Some(11L))),
      Some(Seq[Option[Long]](Some(2L), Some(5L), Some(-1L)))),
    // equal values, negatives, zeros
    (Some(Seq[Option[Long]](Some(0L), Some(Long.MaxValue / 4), Some(-2L))),
      Some(Seq[Option[Long]](Some(9L), Some(2L), Some(0L)))),
    // null ELEMENT → whole dot NULL, zip element NULL
    (Some(Seq[Option[Long]](Some(1L), None, Some(2L))),
      Some(Seq[Option[Long]](Some(1L), Some(1L), Some(1L)))),
    // length mismatch → dot NULL (zip pads with nulls)
    (Some(Seq[Option[Long]](Some(1L), Some(2L))),
      Some(Seq[Option[Long]](Some(3L)))),
    // null column → NULL
    (None, Some(Seq[Option[Long]](Some(1L)))),
    (Some(Seq[Option[Long]](Some(4L))), None),
    // empty arrays → dot 0, zip empty
    (Some(Seq.empty[Option[Long]]), Some(Seq.empty[Option[Long]]))
  ).toDF("a", "b")

  test("LongDotProduct ≡ aggregate(zip_with(_*_)) incl. null/length edges") {
    val rows = frame.select(
      ldotNew(col("a"), col("b")).as("n"),
      ldotHof(col("a"), col("b")).as("h")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1), s"null mismatch: $r")
      if (!r.isNullAt(0)) assert(r.getLong(0) === r.getLong(1), s"value: $r")
    }
  }

  test("LongZipSub/LongZipAdd ≡ zip_with(_-_ / _+_) incl. null/length edges") {
    val rows = frame.select(
      subNew(col("a"), col("b")).as("sn"),
      zip_with(col("a"), col("b"), (x, y) => x - y).as("sh"),
      addNew(col("a"), col("b")).as("an"),
      zip_with(col("a"), col("b"), (x, y) => x + y).as("ah")).collect()
    rows.foreach { r =>
      assert(r.get(0) === r.get(1), s"sub: $r")
      assert(r.get(2) === r.get(3), s"add: $r")
    }
  }

  test("NormScale ≡ transform(floor(v/nrm*1e6)) on the embeddings table") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .withColumn("nrm", graft.functions.Vec.dnorm(col("embedding")))
      .filter(col("nrm") =!= 0).limit(64)
    val rows = emb.select(
      GraftBridge.column(NormScale(
        GraftBridge.expression(col("embedding")),
        GraftBridge.expression(col("nrm")))).as("n"),
      transform(col("embedding"),
        v => floor(v.cast("double") / col("nrm") * lit(1e6)).cast("long")).as("h"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
  }

  test("interpreted eval path matches codegen (factoryMode NO_CODEGEN)") {
    val s2 = Sessions.derived(spark,
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN",
      "spark.sql.codegen.wholeStage" -> "false")
    val df = s2.createDataFrame(frame.collect().toIndexedSeq.asJava, frame.schema)
    val rows = df.select(
      ldotNew(col("a"), col("b")).as("n"),
      ldotHof(col("a"), col("b")).as("h"),
      subNew(col("a"), col("b")).as("sn"),
      zip_with(col("a"), col("b"), (x, y) => x - y).as("sh")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getLong(0) === r.getLong(1))
      assert(r.get(2) === r.get(3))
    }
  }

  private implicit class SeqAsJava[T](s: Seq[T]) {
    def asJava: java.util.List[T] = {
      val l = new java.util.ArrayList[T](s.size)
      s.foreach(l.add)
      l
    }
  }
}
