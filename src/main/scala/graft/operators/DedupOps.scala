package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Near-duplicate detection over the `documents` table (SURVEY.md §2.4).
 *
 * Three independent detectors, each with a different scale profile:
 *  - [[minhashLsh]]   — MinHash signatures + LSH banding: candidate generation
 *    is an equi-join on band keys (shuffle-partitionable, no quadratic blowup);
 *    the exact Jaccard check runs only on candidates. This is the 100 TB path.
 *  - [[ngramJaccard]] — exact all-pairs Jaccard via a shingle equi-join
 *    (inverted-index style); cost governed by shingle-posting-list skew, used
 *    as ground truth for the LSH recall check.
 *  - [[simhash]]      — 32-bit SimHash fingerprints; Hamming-≤3 pairs found by
 *    pigeonhole banding on the 4 fingerprint bytes (any pair within distance 3
 *    must agree on ≥1 of 4 blocks) — again an equi-join, never all-pairs.
 *
 * All hashing is md5-based, so results are deterministic and reproducible in
 * the DuckDB oracle. MinHash minima compare md5 hex strings lexicographically
 * — equivalent to numeric order because the hex encoding is fixed-width.
 */
object DedupOps {

  val NumHashes = 16
  val Bands = 4 // 4 rows per band

  /** Distinct word-3-gram shingles of the lowercased text (docs with <3 words
    * contribute their whole text as the single shingle). */
  def shingles(text: Column): Column = {
    val ws = TextOps.words(text)
    array_distinct(
      when(size(ws) >= 3,
        transform(sequence(lit(1), size(ws) - 2), i => concat_ws(" ", slice(ws, i, lit(3)))))
      .otherwise(array(concat_ws(" ", ws))))
  }

  /** MinHash signature: element h = min over shingles of md5(h || '#' || s). */
  private def signature(sh: Column): Column =
    transform(sequence(lit(0), lit(NumHashes - 1)),
      h => array_min(transform(sh, s => md5(concat(h.cast("string"), lit("#"), s).cast("binary")))))

  /** LSH band keys: band b hashes signature rows [4b, 4b+4). */
  private def bandKeys(sig: Column): Column =
    transform(sequence(lit(0), lit(Bands - 1)),
      b => concat(b.cast("string"), lit(":"),
        md5(concat_ws(",", slice(sig, b * lit(NumHashes / Bands) + lit(1), lit(NumHashes / Bands))).cast("binary"))))

  private def jaccard(sa: Column, sb: Column): (Column, Column) = {
    val inter = size(array_intersect(sa, sb))
    val j = inter.cast("double") / (size(sa) + size(sb) - inter).cast("double")
    (inter, j)
  }

  /**
   * MinHash + LSH near-dup pairs with exact-Jaccard confirmation ≥ threshold.
   * Output: (doc_a, doc_b, jaccard rounded to 4), doc_a < doc_b.
   */
  def minhashLsh(documents: DataFrame, threshold: Double = 0.8): DataFrame = {
    // Signatures are pure per-row expressions — computed in one codegen'd
    // projection during the scan; zero shuffles until the band-key join.
    val sig = documents.select(
      col("doc_id"), shingles(col("text")).as("sh"))
      .withColumn("bands", bandKeys(signature(col("sh"))))
    val banded = sig.select(col("doc_id"), col("sh"), explode(col("bands")).as("band_key"))
    val a = banded.select(col("band_key"), col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = banded.select(col("band_key"), col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    val candidates = a.join(b, Seq("band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sh_a"), col("sh_b"))
      .dropDuplicates("doc_a", "doc_b")
    val (_, j) = jaccard(col("sh_a"), col("sh_b"))
    candidates
      .withColumn("jaccard", j)
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /**
   * Exact n-gram Jaccard ≥ threshold for all pairs, via a shingle inverted
   * index: explode distinct shingles, equi-join on the shingle, count common
   * shingles per pair, derive Jaccard from exact integer counts.
   */
  def ngramJaccard(documents: DataFrame, threshold: Double = 0.8): DataFrame = {
    val sh = documents.select(col("doc_id"), explode(shingles(col("text"))).as("sh"))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val inter = sh.select(col("doc_id").as("doc_a"), col("sh"))
      .join(sh.select(col("doc_id").as("doc_b"), col("sh")), Seq("sh"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("na")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("nb")), Seq("doc_b"))
      .withColumn("jaccard",
        col("n_common").cast("double") / (col("na") + col("nb") - col("n_common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** First 8 md5 hex chars of a word as a 32-bit unsigned value. */
  private def word32(w: Column): Column =
    conv(substring(md5(w.cast("binary")), 1, 8), 16, 10).cast("long")

  /**
   * 32-bit SimHash fingerprints per doc + Hamming-≤`maxDist` pairs.
   * Fingerprint: bit j set iff strictly more than half of the doc's word
   * hashes (with multiplicity) have bit j set. Pair generation uses the
   * pigeonhole principle on the 4 fingerprint bytes (maxDist must be < 4).
   */
  def simhash(documents: DataFrame, maxDist: Int = 3): DataFrame = {
    require(maxDist < 4, "byte-banding guarantees recall only for distance < #blocks (4)")
    val wordBits = documents
      .select(col("doc_id"), explode(TextOps.words(col("text"))).as("w"))
      .select(col("doc_id"), word32(col("w")).as("bits"))
    val bitSums = (0 until 32).map(j =>
      sum(shiftright(col("bits"), j).bitwiseAND(lit(1L))).as(s"s$j"))
    val aggCols = count(lit(1)).as("n") +: bitSums
    val agg = wordBits.groupBy(col("doc_id"))
      .agg(aggCols.head, aggCols.tail: _*)
    val fp = (0 until 32).map { j =>
      when(col(s"s$j") * 2 > col("n"), lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    val fps = agg.select(col("doc_id"), fp.as("fp"))
    val blockCols = (0 until 4).map(k =>
      concat(lit(s"$k:"), shiftright(col("fp"), 8 * k).bitwiseAND(lit(255L)).cast("string")))
    val banded = fps.select(col("doc_id"), col("fp"),
      explode(array(blockCols: _*)).as("block"))
    val a = banded.select(col("block"), col("doc_id").as("doc_a"), col("fp").as("fp_a"))
    val b = banded.select(col("block"), col("doc_id").as("doc_b"), col("fp").as("fp_b"))
    a.join(b, Seq("block"))
      .filter(col("doc_a") < col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
      .filter(col("hamming") <= maxDist)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
  }
}
