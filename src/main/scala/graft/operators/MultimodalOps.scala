package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing (SURVEY.md §2.4): media assets are opaque
 * `binary` payloads with typed metadata travelling alongside. The container
 * has no image/audio codecs, so the decode step is a clearly-marked
 * deterministic STUB — but everything Spark-side (schema, batching,
 * partition-parallel execution, feature shape) is real and tested.
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
   * STUB decoder — stands in for image/audio decode (libs not present in this
   * container). Deterministic: 16-bin byte histogram, L1-normalized. A real
   * deployment swaps `decode` for e.g. a JPEG → tensor call; the Spark
   * plumbing around it is unchanged.
   */
  def decode(payload: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    var i = 0
    while (i < payload.length) { hist((payload(i) & 0xff) / 16) += 1f; i += 1 }
    val n = math.max(payload.length, 1).toFloat
    var j = 0
    while (j < 16) { hist(j) /= n; j += 1 }
    hist
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
        AssetFeatures(a.asset_id, a.kind, a.payload.length, decode(a.payload))
      }
    }
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
