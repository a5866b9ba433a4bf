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

  test("byte-histogram featurizer is deterministic on identical payloads") {
    val a = MultimodalOps.decode("same bytes".getBytes("UTF-8"))
    val b = MultimodalOps.decode("same bytes".getBytes("UTF-8"))
    assert(a.toSeq == b.toSeq)
    assert(MultimodalOps.decode(Array.emptyByteArray).toSeq == Seq.fill(16)(0f))
  }

  test("PPM decode: round-trip, comment/whitespace grammar, hand-built header") {
    import MultimodalOps.{Raster, decodePpm, encodePpm}
    // round-trip through the encoder
    val px = Array.tabulate(3 * 4 * 2)(i => ((i * 37 + 5) % 256).toByte)
    val r = decodePpm(encodePpm(Raster(4, 2, px)))
    assert(r.width == 4 && r.height == 2 && r.pixels.toSeq == px.toSeq)
    // hand-built header with comments between every token and mixed ws —
    // the full Netpbm grammar, not just the encoder's canonical layout
    val hand = ("P6 # format comment\n" +
      "# a full-line comment\n 2\t# width done\n3 # height\n  255\n").getBytes("US-ASCII") ++
      Array.tabulate(18)(i => i.toByte)
    val r2 = decodePpm(hand)
    assert(r2.width == 2 && r2.height == 3 && r2.pixels.toSeq == (0 until 18).map(_.toByte))
    // malformed payloads fail loudly instead of fabricating pixels
    intercept[IllegalArgumentException](decodePpm("P6\n2 2\n255\nxx".getBytes)) // truncated
    intercept[IllegalArgumentException](decodePpm("P6\n2 2\n65535\n".getBytes)) // bad maxval
    intercept[IllegalArgumentException](decodePpm("not an image".getBytes))
    // kind dispatch: a TEXT payload that happens to start with "P6" is
    // featurized as bytes, never parsed as an image
    val tricky = docsOf((9L, "P6 is a chess move", "en", "s0"))
    val f = MultimodalOps.extractFeatures(MultimodalOps.documentsAsAssets(tricky))
      .collect().head
    assert(f.feature.length == 16 && math.abs(f.feature.sum - 1f) < 1e-5)
  }

  test("image decode census: decoded sums equal the fixture formula") {
    val docs = docsOf(
      (1L, "abcdef", "en", "s0"),    // w=4+6%5=5, h=3+1%4=4
      (2L, "xy", "en", "s0"),        // w=6, h=5
      (3L, "hola mundo!", "es", "s0")) // w=5, h=6
    val rows = MultimodalOps.imageDecodeCensus(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    def expect(docId: Long, nChars: Long): (Long, Long) = {
      val w = 4 + nChars % 5; val h = 3 + docId % 4
      val n = 3 * w * h
      (n, (0L until n).map(k => (docId * 31 + k * 7) % 256).sum)
    }
    val (n1, s1) = expect(1, 6); val (n2, s2) = expect(2, 2)
    val (n3, s3) = expect(3, 11)
    assert(rows("en") == ((2L, n1 + n2, s1 + s2)))
    assert(rows("es") == ((1L, n3, s3)))
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
