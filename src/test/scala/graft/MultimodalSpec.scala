package graft

import graft.ops.Multimodal

class MultimodalSpec extends SparkTestBase {

  test("stubDecode is deterministic and shape-stable") {
    val b = "hello world".getBytes("UTF-8")
    val f1 = Multimodal.stubDecode(b)
    val f2 = Multimodal.stubDecode(b)
    assert(f1.toSeq === f2.toSeq)
    assert(f1.length === 4)
    assert(f1(0) === 11.0f) // first feature = byte length
  }

  test("extractFeatures runs partition-local over binary media") {
    val feats = Multimodal.extractFeatures(Multimodal.media(spark, sfDir)).collect()
    assert(feats.length === 500)
    assert(feats.forall(_.feature.length == 4))
    assert(feats.map(_.media_type).toSet === Set("image", "audio", "video"))
    // feature(0) is the byte length of the payload — never zero here
    assert(feats.forall(_.feature(0) > 0))
  }
}
