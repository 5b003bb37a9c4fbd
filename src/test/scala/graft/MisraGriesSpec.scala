package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.functions.MisraGries
import org.apache.spark.sql.Encoders

/** Pure-function properties of the Misra-Gries sketch (q106's pass 1).
  * The whole point of the sketch is what survives ADVERSARIAL merge
  * orders, so both properties quantify over random merge trees:
  *
  *  - superset guarantee: every term with true frequency > N/(k+1) is
  *    present in the final candidate set (this is what makes q106's
  *    exact second pass correct);
  *  - size bound: the buffer never exceeds k counters (this is what
  *    bounds the shuffle at one sketch row per partition).
  */
object MisraGriesProps extends Properties("graft.misra_gries") {

  private val k = 7
  // kryo stands in for the session's array encoder: these properties
  // exercise the pure sketch functions, never the encoder
  private val mg = new MisraGries(k, Encoders.kryo[Seq[String]])

  // skewed token stream: few hot terms + a long uniform tail
  private val genStream: Gen[List[String]] = for {
    n <- Gen.choose(50, 400)
    s <- Gen.listOfN(n, Gen.frequency(
      5 -> Gen.oneOf("hot1", "hot2", "hot3"),
      3 -> Gen.oneOf((1 to 30).map("mid" + _)),
      2 -> Gen.choose(1, 10000).map("tail" + _)))
  } yield s

  // random binary partitioning of the stream into sketch merges
  private def sketch(xs: List[String], splits: List[Int]): Map[String, Long] =
    splits match {
      case p :: rest if xs.length > 3 =>
        val at = 1 + math.abs(p) % (xs.length - 1)
        val (l, r) = xs.splitAt(at)
        mg.merge(sketch(l, rest.take(rest.length / 2)),
          sketch(r, rest.drop(rest.length / 2)))
      case _ => xs.foldLeft(mg.zero)(mg.reduce)
    }

  property("heavy terms survive any merge tree; buffer stays <= k") =
    Prop.forAll(genStream, Gen.listOf(Gen.choose(0, 1 << 20))) { (xs, splits) =>
      val buf = sketch(xs, splits)
      val n = xs.length
      val exact = xs.groupBy(identity).map { case (t, g) => t -> g.length.toLong }
      val heavy = exact.collect { case (t, c) if c > n.toDouble / (k + 1) => t }
      val cands = mg.finish(buf).toSet
      Prop(heavy.forall(cands.contains)) :| s"missing heavy hitter; heavy=$heavy cands=$cands" &&
        Prop(buf.size <= k) :| s"buffer overflow: ${buf.size} > $k"
    }

  property("surviving counters undercount by at most N/(k+1)") =
    Prop.forAll(genStream) { xs =>
      val buf = xs.foldLeft(mg.zero)(mg.reduce)
      val exact = xs.groupBy(identity).map { case (t, g) => t -> g.length.toLong }
      buf.forall { case (t, c) =>
        c <= exact(t) && exact(t) - c <= xs.length.toDouble / (k + 1)
      }
    }
}
