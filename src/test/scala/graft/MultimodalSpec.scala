package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpecBase {

  test("binary meta partitions every document into a kind") {
    val out = Multimodal.binaryMeta(spark, sfDir).collect()
    assert(out.map(_.getString(0)).toSet === Set("image", "audio", "video"))
    assert(out.map(_.getLong(1)).sum === 500L)
  }

  test("feature extraction is deterministic and byte-exact") {
    val a = Multimodal.featureExtract(spark, sfDir).collect()
    val b = Multimodal.featureExtract(spark, sfDir).collect()
    assert(a.length === 500)
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
    // histogram buckets sum to payload length
    a.foreach { r =>
      assert(r.getSeq[Long](4).sum === r.getLong(2), s"doc ${r.getLong(0)}")
    }
  }

  test("frame sampling fans out 1..5 frames per video with bounded slices") {
    val out = Multimodal.frameSample(spark, sfDir).collect()
    val perDoc = out.groupBy(_.getLong(0))
    perDoc.foreach { case (_, frames) =>
      assert(frames.length >= 1 && frames.length <= 5)
      frames.foreach(f => assert(f.getLong(4) <= 16))
    }
  }
}
