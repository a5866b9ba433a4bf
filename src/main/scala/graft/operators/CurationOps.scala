package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * End-to-end corpus curation — the composite pipeline a training-data run
 * executes over the document store, built from the individual operators:
 *
 *   1. quality gate   — drop docs under `minWords` whitespace tokens;
 *   2. exact dedup    — keep the smallest doc_id per normalized-text md5;
 *   3. near dedup     — drop the larger id of every confirmed
 *                       Jaccard ≥ `threshold` pair ([[DedupOps.ngramJaccard]],
 *                       LSH-accelerated candidates at scale);
 *   4. sampling       — deterministic hash sample: keep doc when
 *                       the first md5 hex nibble of its id < `keepNibbles`
 *                       (content-independent, reproducible, no RNG state).
 *
 * Every stage is a distributed DataFrame transform; the returned census is
 * a single row of exact integers so the whole pipeline is oracle-checkable.
 */
object CurationOps {

  /** Per-stage survivor counts: the curation funnel. */
  def curationFunnel(
      documents: DataFrame,
      minWords: Int = 30,
      threshold: Double = 0.8,
      keepNibbles: Int = 13): DataFrame = {
    val quality = documents
      .filter(size(TextOps.words(col("text"))) >= minWords)
    val exact = quality
      .withColumn("norm", md5(lower(trim(col("text"))).cast("binary")))
      .withColumn("keeper", min(col("doc_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("norm"))))
      .filter(col("doc_id") === col("keeper"))
      .drop("norm", "keeper")
    val nearDupLosers = DedupOps.ngramJaccard(exact, threshold)
      .select(col("doc_b").as("doc_id")).distinct()
    val nearDeduped = exact.join(nearDupLosers, Seq("doc_id"), "left_anti")
    val sampled = nearDeduped.filter(
      conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1), 16, 10)
        .cast("int") < keepNibbles)
    // one aggregation per stage over cached-lineage counts, assembled into a
    // single census row (crossJoin of 1-row aggregates — no data movement)
    quality.agg(count(lit(1)).as("n_quality"))
      .crossJoin(documents.agg(count(lit(1)).as("n_input")))
      .crossJoin(exact.agg(count(lit(1)).as("n_exact")))
      .crossJoin(nearDeduped.agg(count(lit(1)).as("n_neardedup")))
      .crossJoin(sampled.agg(count(lit(1)).as("n_sampled")))
      .select(col("n_input"), col("n_quality"), col("n_exact"),
        col("n_neardedup"), col("n_sampled"))
  }
}
