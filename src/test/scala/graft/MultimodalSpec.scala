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
}
