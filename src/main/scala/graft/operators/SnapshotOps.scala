package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Corpus snapshot comparison — the data-versioning audit a pipeline runs
 * when a 100 TB corpus is republished: WHAT changed between snapshot A and
 * snapshot B, and WHICH documents need re-processing. Complements the
 * mutable-table machinery in [[graft.sources.LedgerTables]] (which manages
 * one table's versions in place) by comparing any two document relations.
 *
 * Both operators join the snapshots once on `doc_id` comparing md5 content
 * fingerprints — never the full text (at 100 TB the fingerprint projection
 * is what shuffles, ~48 bytes/row instead of the document). The join key
 * hash-distributes; there is no skew concern because doc_id is unique per
 * side.
 */
object SnapshotOps {

  private def fp(side: DataFrame, suffix: String): DataFrame =
    side.select(
      col("doc_id"),
      md5(col("text").cast("binary")).as(s"h_$suffix"),
      length(col("text")).cast("long").as(s"len_$suffix"))

  /**
   * Per-status census of the diff between two corpus snapshots: how many
   * documents were `added` (only in `newer`), `removed` (only in `older`),
   * `changed` (both, different content hash), `unchanged` — with the exact
   * char mass on each side. One full-outer fingerprint join, one small agg.
   */
  def corpusDiff(older: DataFrame, newer: DataFrame): DataFrame =
    fp(older, "old").join(fp(newer, "new"), Seq("doc_id"), "full_outer")
      .select(
        when(col("h_old").isNull, "added")
          .when(col("h_new").isNull, "removed")
          .when(col("h_old") =!= col("h_new"), "changed")
          .otherwise("unchanged").as("status"),
        coalesce(col("len_old"), lit(0L)).as("len_old"),
        coalesce(col("len_new"), lit(0L)).as("len_new"))
      .groupBy(col("status"))
      .agg(
        count(lit(1)).as("docs"),
        sum(col("len_old")).as("chars_old"),
        sum(col("len_new")).as("chars_new"))
      .orderBy(col("status"))

  /**
   * The incremental re-process set: every `newer` document that is new or
   * content-changed relative to `older` — exactly the rows downstream
   * operators (dedup stores, IVF indexes, quality filters) must ingest
   * after a snapshot update, so the pipeline pays for the delta instead of
   * the corpus. Left-anti join on the (doc_id, content-hash) pair: a row
   * survives iff no older row carries the same id AND hash.
   */
  def snapshotDelta(older: DataFrame, newer: DataFrame): DataFrame = {
    val o = older.select(
      col("doc_id").as("_old_id"),
      md5(col("text").cast("binary")).as("_old_h"))
    newer.join(o,
      newer("doc_id") === o("_old_id") &&
        md5(newer("text").cast("binary")) === o("_old_h"),
      "left_anti")
  }

  /**
   * Order-invariant per-lang corpus checksum — the migration-equality
   * audit: after moving/rewriting a 100 TB corpus (new layout, new
   * partitioning, new cluster), run this on both sides and compare the tiny
   * result; equal checksums certify row-set equality without sorting or
   * shuffling the corpus even once.
   *
   * `row_xor` is the XOR-fold of a 60-bit md5 over `doc_id || ':' || text`
   * — XOR is commutative/associative, so the fold is independent of row
   * order, partitioning, and aggregation tree shape (unlike a float SUM),
   * and binding the id INTO the hash catches id-remap bugs that content-
   * only hashing would miss. The whole audit is one scan with map-side
   * partial XORs: bytes shuffled = O(#langs), the ideal shape at any scale.
   * (A swapped PAIR of rows between langs XORs out per-lang counts/masses
   * but not `row_xor`; a same-lang duplicate+omission flips `row_xor`
   * unless the duplicate is the omitted row itself — md5 makes engineered
   * collisions impractical for an integrity audit, though this is not a
   * cryptographic MAC.)
   */
  def corpusChecksum(documents: DataFrame): DataFrame = {
    import graft.functions.GraftFunctions
    GraftFunctions.register(documents.sparkSession)
    documents
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("chars_total"),
        call_function("bit_xor", GraftFunctions.md5PrefixLong(
          concat(col("doc_id").cast("string"), lit(":"), col("text")), 15))
          .as("row_xor"))
      .orderBy(col("lang"))
  }
}
