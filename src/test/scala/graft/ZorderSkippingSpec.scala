package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Write-layout proof for q104's Z-order key: the Morton key is only
  * worth computing if SORTING THE WRITE by it makes min/max statistics
  * prune multi-dimensional range scans. This spec writes the same rows
  * twice — clustered by the z-key vs. ordered by an unrelated column —
  * and asserts the 2-D range predicate reads strictly less data from
  * the clustered layout (parquet row-group skipping via pushed
  * min/max filters; with one row group per file here, that is
  * file-level skipping, the thing a 100 TB scan lives or dies by).
  */
class ZorderSkippingSpec extends SparkTestBase {

  private def interleave(c: org.apache.spark.sql.Column, off: Int) = (0 until 8)
    .map(i => shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), 2 * i + off))
    .reduce((a, b) => a + b)

  /** Rows read from parquet AFTER row-group min/max pruning (record-level
    * filtering is off by default, so the scan's output row count is
    * exactly the surviving row groups' row count). */
  private def scannedRows(df: DataFrame): Long = {
    df.collect() // executes THIS df's queryExecution so its metrics populate
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty, "expected a parquet scan in the plan")
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("z-ordered layout prunes a 2-D range predicate; row-ordered does not") {
    val base = Files.createTempDirectory("zorder").toString
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"),
        pmod(col("l_partkey"), lit(256L)).as("px"),
        pmod(col("l_suppkey"), lit(256L)).as("sx"),
        col("l_quantity"))
      .withColumn("zv", interleave(col("px"), 1) + interleave(col("sx"), 0))

    // Same rows, same file count; only the CLUSTERING differs.
    // Range-partition + in-partition sort by zv = the q104 write recipe;
    // the control orders by l_orderkey, uncorrelated with (px, sx).
    li.repartitionByRange(16, col("zv")).sortWithinPartitions("zv")
      .write.mode("overwrite").parquet(s"$base/zsorted")
    li.repartitionByRange(16, col("l_orderkey")).sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(s"$base/rowsorted")

    // sf0.001 has ~200 parts and ~10 suppliers, so px spans [1,200] and
    // sx only [1,10] — the box must intersect the real value ranges
    def q(path: String): DataFrame =
      spark.read.parquet(path)
        .filter(col("px").between(16, 31) && col("sx").between(2, 5))

    val zRead = scannedRows(q(s"$base/zsorted"))
    val rRead = scannedRows(q(s"$base/rowsorted"))
    val total = li.count()

    // identical answers from both layouts
    val zRes = q(s"$base/zsorted").agg(count(lit(1)), sum("l_quantity")).collect()(0)
    val rRes = q(s"$base/rowsorted").agg(count(lit(1)), sum("l_quantity")).collect()(0)
    assert(zRes == rRes, "layout must not change query results")

    // the control layout's row groups all straddle the predicate box →
    // nothing prunes; the z-clustered layout must skip most of the table
    assert(rRead >= (total * 9) / 10,
      s"control: expected ~no pruning on the uncorrelated sort ($rRead of $total)")
    assert(zRead <= rRead / 2,
      s"z-order: expected >=2x row-group pruning, read $zRead vs control $rRead")
  }
}
