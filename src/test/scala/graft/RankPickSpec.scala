package graft

import org.apache.spark.sql.functions._
import graft.ops.RankPick

/** The distributed rank-pick kernel (q49/q96/q105).
  *
  * The load-bearing points: (1) values at per-group target ranks match
  * a brute-force sort, including ties, NULLs (ordered first, as the
  * window formulation did), and out-of-range targets; (2) the plan is
  * RANGE-partitioned on (group, value) — parallelism scales with the
  * partition count, not the group count, which is what lets three
  * return-flag groups use a whole cluster instead of three tasks;
  * (3) the result is independent of the shuffle partition count.
  */
class RankPickSpec extends SparkTestBase {
  import spark.implicits._

  private val targets = Seq(
    "median" -> RankPick.MedianRank,
    "p90" -> RankPick.discRank(9, 10),
    "first" -> "1",
    "last" -> "n")

  /** Brute-force reference: sort each group's values (NULLs first, as
    * Spark's ascending order does) and index the 1-based rank. */
  private def brute(rows: Seq[(String, Option[Double])]): Map[(String, String), Option[Double]] =
    rows.groupBy(_._1).flatMap { case (g, vs) =>
      val sorted = vs.map(_._2).sortBy(v => (v.isDefined, v.getOrElse(0.0)))
      val n = sorted.size.toLong
      def at(r: Long) = sorted((r - 1).toInt)
      Map(
        (g, "median") -> at((n + 1) / 2),
        (g, "p90") -> at((9 * n + 9) / 10),
        (g, "first") -> at(1L),
        (g, "last") -> at(n))
    }

  private def run(rows: Seq[(String, Option[Double])]): Map[(String, String), Option[Double]] =
    RankPick.valuesAtRanks(rows.toDF("g", "v"), "g", "v", targets)
      .collect()
      .map(r => (r.getString(0), r.getString(2)) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap

  test("matches brute force on multi-group data with heavy ties") {
    val rnd = new scala.util.Random(7)
    val rows: Seq[(String, Option[Double])] =
      (1 to 5000).map { _ =>
        // values drawn from a small set → long runs of ties
        (s"g${rnd.nextInt(4)}", Some(rnd.nextInt(20).toDouble))
      }
    assert(run(rows) == brute(rows))
  }

  test("matches brute force across randomized shapes (skew, negatives, singletons, NULLs)") {
    for (seed <- Seq(11, 23, 47, 91)) {
      val rnd = new scala.util.Random(seed)
      val nGroups = 1 + rnd.nextInt(6)
      val rows: Seq[(String, Option[Double])] = (1 to 800).flatMap { _ =>
        // skewed group sizes: group 0 absorbs half the rows
        val g = if (rnd.nextBoolean()) 0 else rnd.nextInt(nGroups)
        val v = rnd.nextInt(10) match {
          case 0 => None                                   // NULLs mixed in
          case 1 => Some(-rnd.nextInt(5).toDouble)         // negatives + ties
          case _ => Some((rnd.nextGaussian() * 100).floor) // ties via floor
        }
        Seq((s"g$g", v))
      } ++ Seq(("singleton", Some(42.0)))                  // 1-row group
      assert(run(rows) == brute(rows), s"mismatch at seed $seed")
    }
  }

  test("NULL values order first, matching the window formulation") {
    val rows: Seq[(String, Option[Double])] =
      Seq(("a", None), ("a", None), ("a", Some(1.0)),
        ("a", Some(2.0)), ("a", Some(3.0)))
    // n = 5 counts NULLs; median rank 3 lands on 1.0 (two NULLs first)
    val got = run(rows)
    assert(got(("a", "median")) == Some(1.0))
    assert(got(("a", "first")) == None) // rank 1 is a NULL value
    assert(got(("a", "last")) == Some(3.0))
  }

  test("out-of-range targets yield no rows") {
    val out = RankPick.valuesAtRanks(
      Seq(("a", 1.0), ("a", 2.0)).toDF("g", "v"), "g", "v",
      Seq("beyond" -> "n + 1", "zero" -> "0", "ok" -> "1"))
    assert(out.select("label").as[String].collect().toSeq == Seq("ok"))
  }

  test("plan range-partitions on (group, value): group-transcending parallelism") {
    val df = (1 to 10000).map(i => ("only_group", i.toDouble)).toDF("g", "v")
    val out = RankPick.valuesAtRanks(df, "g", "v", Seq("median" -> RankPick.MedianRank))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning("),
      s"expected a range exchange on (g, v), got:\n$plan")
    // one group, 10k rows: the median must still be exact
    assert(out.select("value").as[Double].head() == 5000.0)
  }

  test("result is independent of the shuffle partition count") {
    val rows = (1 to 3000).map(i => (s"g${i % 3}", (i * 37 % 101).toDouble))
    val byPartitions = Seq("2", "7").map { p =>
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.shuffle.partitions", p)
      val df = s2.createDataFrame(rows).toDF("g", "v")
      RankPick.valuesAtRanks(df, "g", "v", targets)
        .orderBy("g", "label")
        .collect().map(_.toString).toSeq
    }
    assert(byPartitions(0) == byPartitions(1))
  }
}
