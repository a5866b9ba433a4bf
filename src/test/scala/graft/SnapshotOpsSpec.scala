package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{SimilarityOps, SnapshotOps}

class SnapshotOpsSpec extends SparkSpec {
  import spark.implicits._

  private def snap(rows: (Long, String, String)*): DataFrame =
    rows.toDF("doc_id", "lang", "text")

  private val older = snap(
    (1L, "en", "unchanged text"),
    (2L, "en", "will change"),
    (3L, "de", "will be removed"),
    (4L, "fr", "also unchanged"))
  private val newer = snap(
    (1L, "en", "unchanged text"),
    (2L, "en", "has changed"),
    (4L, "fr", "also unchanged"),
    (5L, "es", "brand new doc"))

  test("corpusDiff census: added/removed/changed/unchanged with char masses") {
    val m = SnapshotOps.corpusDiff(older, newer).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(m("added") === ((1L, 0L, 13L)))
    assert(m("removed") === ((1L, 15L, 0L)))
    assert(m("changed") === ((1L, 11L, 11L)))
    assert(m("unchanged") === ((2L, 28L, 28L)))
  }

  test("snapshotDelta returns exactly the new and content-changed rows") {
    val ids = SnapshotOps.snapshotDelta(older, newer)
      .select(col("doc_id")).as[Long].collect().sorted.toSeq
    assert(ids === Seq(2L, 5L))
    // delta keeps the NEW side's content and all its columns
    val row = SnapshotOps.snapshotDelta(older, newer)
      .filter(col("doc_id") === 2L).collect().head
    assert(row.getAs[String]("text") === "has changed")
  }

  test("snapshotDelta of identical snapshots is empty; of a fresh corpus is everything") {
    assert(SnapshotOps.snapshotDelta(older, older).count() === 0L)
    assert(SnapshotOps.snapshotDelta(older.limit(0), newer).count() === newer.count())
  }

  test("semanticDedupCorpus survivors contain no remaining near-dup pair") {
    // any surviving pair >= threshold would be an edge between two distinct
    // component representatives — impossible, so the survivor set is clean
    val emb = graft.sources.Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
    val survivors = SimilarityOps.semanticDedupCorpus(emb, 0.4, 7)
    assert(SimilarityOps.embeddingNearDupBrute(survivors, 0.4).count() === 0L)
    // survivors + losers partition the corpus
    assert(survivors.count() > 0L)
    assert(survivors.count() <= emb.count())
    // idempotent: deduping the survivors changes nothing
    assert(SimilarityOps.semanticDedupCorpus(survivors, 0.4, 7).count()
      === survivors.count())
  }
}
