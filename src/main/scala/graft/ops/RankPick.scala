package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** The shared distributed exact-rank-pick kernel behind the percentile
  * family (q49 percentile_disc, q96 percentile_cont, q105 median/MAD).
  *
  * `valuesAtRanks` replaced the earlier per-group window-sort shape
  * (broadcast count join + `Window.partitionBy(grp)` row_number +
  * rank-pick aggregate), which was spill-proof but whose parallelism
  * was the NUMBER OF GROUPS — three return-flag groups over 100 TB
  * meant three tasks sorting ~33 TB each. Instead of sorting each
  * group in one task:
  *
  *   1. range-partition by (group, value): one group spans MANY
  *      partitions, each holding a contiguous value slice — parallelism
  *      is the partition count, independent of group cardinality;
  *   2. per-(partition, group) row counts — a metadata-sized summary
  *      (P×G rows) — prefix-summed per group to get each partition's
  *      global rank offset; group totals (and so the target ranks)
  *      derive from the same summary, no second full scan;
  *   3. each target rank is located in exactly one partition
  *      (offset < t ≤ offset + count); only the few candidate
  *      (partition, group) slices — O(targets · n/P) rows, not the
  *      corpus — get a local `row_number`, and the value at the local
  *      rank (t − offset) is joined out via broadcast.
  *
  * The result (value at a global per-group rank) is well-defined on the
  * sorted multiset regardless of how ties are ordered or where range
  * boundaries land, so the output is independent of the partition count
  * (PartitionInvarianceSpec pins this for q49/q96) and of the range
  * sampler's choices.
  *
  * Target-rank arithmetic stays integer (`(p·n + d − 1) DIV d` forms)
  * so no float rounding can shift a rank.
  */
object RankPick {

  /** percentile_disc target: smallest value with cume_dist ≥ p, as an
    * integer rank expression — ceil(p·n) = (num·n + den − 1) DIV den. */
  def discRank(num: Int, den: Int): String = s"($num * n + ${den - 1}) DIV $den"

  /** Median shorthand: ceil(n/2). */
  val MedianRank: String = "(n + 1) DIV 2"

  /** Values at per-group target ranks with group-transcending
    * parallelism (formulation 2 above).
    *
    * @param df      input; only `g` and `v` are read
    * @param g       group column (low-cardinality is the motivating case)
    * @param v       value column; rows order NULLS FIRST, matching
    *                `Window.orderBy(v)` in the window formulation
    * @param targets (label, 1-based rank SQL expression over `n`); a
    *                target outside [1, n] yields no row for that label
    * @return one row per (group, in-range target): `g`, `n` (group row
    *         count), `label`, `value` — pivot with
    *         `max(when(label = …, value))`
    */
  def valuesAtRanks(df: DataFrame, g: String, v: String,
      targets: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    val shufflePartitions = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // persisted: feeds the count summary AND the candidate fetch — one
    // range shuffle of (g, v), not two. Freed by the registry-level
    // clearCache after the query's action (Bench/Verify hygiene).
    val part = df.select(col(g), col(v))
      .repartitionByRange(shufflePartitions, col(g), col(v))
      .withColumn("pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)

    // P×G rows — metadata, not data
    val cnt = part.groupBy("pid", g).agg(count(lit(1)).as("c"))
    val off = cnt.withColumn("off",
      coalesce(
        sum("c").over(Window.partitionBy(g).orderBy("pid")
          .rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    val totals = cnt.groupBy(g).agg(sum("c").as("n"))

    val tgt = totals.select(col(g), col("n"),
        explode(array(targets.map { case (label, at) =>
          struct(lit(label).as("label"), expr(at).cast("long").as("t"))
        }: _*)).as("x"))
      .select(col(g), col("n"), col("x.label").as("label"), col("x.t").as("t"))
      .filter(col("t").between(lit(1L), col("n")))

    // exactly one partition satisfies off < t ≤ off + c per target
    val loc = tgt.join(off, g)
      .filter(col("t") > col("off") && col("t") <= col("off") + col("c"))
      .select(col("pid"), col(g), col("n"), col("label"),
        (col("t") - col("off")).as("lr"))

    // local rank only over the candidate slices: ≤ targets·⌈n/P⌉ rows.
    // ONE broadcast join does both the slice restriction and the target
    // attachment (a slice usually hosts one target; a slice hosting k
    // targets replicates its rows k times, all still ≤ targets·⌈n/P⌉);
    // the window then ranks per (slice, target) and the pick is a filter.
    val cand = part.join(broadcast(loc), Seq("pid", g))
      .withColumn("rnk", row_number()
        .over(Window.partitionBy("pid", g, "label").orderBy(v)).cast("long"))
    cand.filter(col("rnk") === col("lr"))
      .select(col(g), col("n"), col("label"), col(v).as("value"))
  }

  /** Pivot `valuesAtRanks` output to one row per group with one column
    * per label (NULL where the target was out of range). */
  def pivotLabels(ranked: DataFrame, g: String, labels: Seq[String]): DataFrame =
    ranked.groupBy(g).agg(
      max(col("n")).as("n"),
      labels.map(l => max(when(col("label") === l, col("value"))).as(l)): _*)
}
