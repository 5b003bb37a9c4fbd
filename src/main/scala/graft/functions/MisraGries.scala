package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitter sketch as a typed, MERGEABLE [[Aggregator]].
  *
  * Keeps at most `k` counters. The classic guarantee survives arbitrary
  * merge trees (Agarwal et al., "Mergeable Summaries", PODS '12): after
  * summarizing N items, every term with true frequency > N/(k+1) is
  * still present, and each surviving counter undercounts by at most
  * N/(k+1). So at any cluster size the sketch pass ships at most k
  * counters per partition (map-side combine, no data-sized shuffle),
  * and a second pass that exact-counts ONLY the returned candidates
  * recovers the true heavy hitters — two scans and a candidate-sized
  * shuffle where a naive global `groupBy(term)` would shuffle every
  * distinct token in a 100 TB corpus.
  *
  * The output is the candidate term set (a superset of the heavy
  * hitters); consumers must exact-count and threshold it (q106 does).
  * Encoders are injected so the class stays free of session implicits:
  * the buffer rides kryo (it never appears in a result schema), the
  * output is a plain `array<string>` column.
  */
class MisraGries(k: Int, out: Encoder[Seq[String]])
    extends Aggregator[String, Map[String, Long], Seq[String]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], term: String): Map[String, Long] =
    trim(b.updated(term, b.getOrElse(term, 0L) + 1L))

  override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] =
    trim(y.foldLeft(x) { case (acc, (t, c)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + c)
    })

  /** If over capacity, subtract the (k+1)-th largest count from every
    * counter and drop the non-positive ones — the multi-decrement step
    * that preserves `err <= N/(k+1)` under any merge order.
    */
  private def trim(m: Map[String, Long]): Map[String, Long] =
    if (m.size <= k) m
    else {
      val cut = m.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
      m.collect { case (t, c) if c > cut => t -> (c - cut) }
    }

  override def finish(b: Map[String, Long]): Seq[String] = b.keys.toSeq.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
  override def outputEncoder: Encoder[Seq[String]] = out
}
