package graft

import graft.operators.MultimodalOps

class MultimodalSpec extends SparkSpec {

  test("asset plumbing: schema, payload bytes, partition-parallel feature extraction") {
    val docs = docsOf(
      (1L, "hello world", "en", "s0"),
      (2L, "ni hao", "zh", "s1"),
      (3L, "bonjour tout le monde", "fr", "s0"))
    val assets = MultimodalOps.documentsAsAssets(docs).repartition(2)
    val feats = MultimodalOps.extractFeatures(assets).collect().sortBy(_.asset_id)
    assert(feats.length == 3)
    assert(feats.head.n_bytes == "hello world".getBytes("UTF-8").length)
    feats.foreach { f =>
      assert(f.feature.length == 16)
      assert(math.abs(f.feature.sum - 1f) < 1e-5, "histogram must be L1-normalized")
    }
    val meta = assets.collect().map(a => a.asset_id -> a.meta).toMap
    assert(meta(2L)("lang") == "zh" && meta(2L)("source") == "s1")
  }

  test("decoder stub is deterministic on identical payloads") {
    val a = MultimodalOps.decode("same bytes".getBytes("UTF-8"))
    val b = MultimodalOps.decode("same bytes".getBytes("UTF-8"))
    assert(a.toSeq == b.toSeq)
    assert(MultimodalOps.decode(Array.emptyByteArray).toSeq == Seq.fill(16)(0f))
  }

  test("frame sampling: stride selection, tail drop, sub-frame payloads") {
    val docs = docsOf(
      (1L, "x" * 300, "en", "s0"), //  4 frames of 64 + tail 44 → sample f0
      (2L, "y" * 640, "en", "s0"), // 10 frames → samples f0,f4,f8
      (3L, "z" * 10, "en", "s0"))  //  0 frames (sub-frame payload)
    val out = MultimodalOps.frameSample(MultimodalOps.documentsAsAssets(docs), 64, 4)
      .collect().map(s => s.asset_id -> s).toMap
    assert(out(1L).n_frames == 4 && out(1L).n_sampled == 1 && out(1L).sample.length == 64)
    assert(out(2L).n_frames == 10 && out(2L).n_sampled == 3 && out(2L).sample.length == 192)
    assert(out(3L).n_frames == 0 && out(3L).n_sampled == 0 && out(3L).sample.isEmpty)
    // sampled bytes really are the strided frames of the original
    val orig = "y" * 640
    val expect = (orig.substring(0, 64) + orig.substring(256, 320) + orig.substring(512, 576))
      .getBytes("UTF-8").toSeq
    assert(out(2L).sample.toSeq == expect)
  }

  test("feature resize: block means, width preserved") {
    val docs = docsOf((1L, "abcdefgh" * 8, "en", "s0"))
    val feats = MultimodalOps.extractFeatures(MultimodalOps.documentsAsAssets(docs))
    val resized = MultimodalOps.resizeFeatures(feats, 4).collect().head
    assert(resized.feature.length == 4)
    val full = feats.collect().head.feature
    val expect = full.grouped(4).map(g => g.sum / 4).toSeq
    assert(resized.feature.toSeq == expect)
    intercept[Exception] {
      MultimodalOps.resizeFeatures(feats, 5).collect()
    }
  }
}
