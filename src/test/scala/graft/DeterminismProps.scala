package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.ops.Multimodal

/** ScalaCheck properties for the pure (non-Spark) deterministic kernels. */
object DeterminismProps extends Properties("graft.determinism") {

  property("stubDecode is a pure function of its input bytes") =
    Prop.forAll(Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))) { bs =>
      val a = bs.toArray
      Multimodal.stubDecode(a).toSeq == Multimodal.stubDecode(a.clone()).toSeq
    }

  property("stubDecode feature 0 is the byte length") =
    Prop.forAll(Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))) { bs =>
      Multimodal.stubDecode(bs.toArray)(0) == bs.length.toFloat
    }

  property("scaled-dot reference fold is associative under partitioning") =
    Prop.forAll(
      Gen.listOfN(16, Gen.choose(-1.0f, 1.0f)),
      Gen.listOfN(16, Gen.choose(-1.0f, 1.0f)),
      Gen.choose(1, 15)) { (a, b, split) =>
      def terms(x: Seq[Float], y: Seq[Float]) =
        x.zip(y).map { case (p, q) => math.floor(p.toDouble * q.toDouble * 1.0e12).toLong }
      val whole = terms(a, b).sum
      val (a1, a2) = a.splitAt(split); val (b1, b2) = b.splitAt(split)
      whole == terms(a1, b1).sum + terms(a2, b2).sum
    }
}
