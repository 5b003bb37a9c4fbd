package graft.tools

import org.apache.spark.sql.{GraftBridge, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Sessions

/** A/B of the epoch row-indexing kernel behind identity assignment and
  * row-id reservation (VERDICT r10 #4): the ROUND-10 path deserialized
  * every InternalRow to an external Row and back
  * (`rdd.zipWithIndex + Row.fromSeq + createDataFrame`), paying the
  * full out-of-codegen codec twice per epoch; the round-11 path stays
  * on the internal codec (`queryExecution.toRdd` + zipWithIndex +
  * JoinedRow + `internalCreateDataFrame`, one bytes-copy per row).
  * Both kernels index the SAME persisted frame and are forced with an
  * identical count-after-projection. Prints one JSON line; numbers land
  * in BASELINE.md. */
object IdentityBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(5000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark: SparkSession = Sessions.builder(s"local[$cpus]", cpus.toInt)
      .appName("identity-bench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val df = spark.range(n).select(
        col("id").as("k"),
        concat(lit("row-"), col("id")).as("v"),
        (col("id") % 97).cast("double").as("x"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    df.count() // warm the cache so both kernels read identical input

    val idxField = StructField("__idx", LongType, nullable = false)
    def finish(indexed: org.apache.spark.sql.DataFrame): Long =
      indexed.withColumn("rid", lit(100L) + col("__idx")).drop("__idx")
        .select(sum(col("rid"))).head().getLong(0)

    def externalRowKernel(): Long = {
      // the r10 shape: full external-Row decode + re-encode per row
      val schema = df.schema
      val indexed = df.rdd.zipWithIndex()
        .map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
      finish(spark.createDataFrame(indexed, StructType(schema.fields :+ idxField)))
    }

    def internalRowKernel(): Long = {
      val indexed = GraftBridge.toInternalRdd(df).zipWithIndex()
        .mapPartitions { it =>
          it.map { case (r, i) =>
            new org.apache.spark.sql.catalyst.expressions.JoinedRow(
              r.copy(), org.apache.spark.sql.catalyst.InternalRow(i))
              : org.apache.spark.sql.catalyst.InternalRow
          }
        }
      finish(GraftBridge.internalDf(spark, indexed,
        StructType(df.schema.fields :+ idxField)))
    }

    def time(f: () => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val r = f()
      ((System.nanoTime() - t0) / 1e9, r)
    }
    // interleaved min-of-3, old first each round (cache is warm for both)
    val runs = (0 until 3).map { _ =>
      val (tOld, sumOld) = time(externalRowKernel _)
      val (tNew, sumNew) = time(internalRowKernel _)
      require(sumOld == sumNew, s"kernels disagree: $sumOld vs $sumNew")
      (tOld, tNew)
    }
    val (oldMin, newMin) = (runs.map(_._1).min, runs.map(_._2).min)
    println(f"""{"metric":"identity_index_kernel","rows":$n,""" +
      f""""external_row_sec":$oldMin%.3f,"internal_row_sec":$newMin%.3f,""" +
      f""""speedup":${oldMin / newMin}%.2f}""")
    spark.stop()
  }
}
