package graft

import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Hand-computed fixtures for the repetition-quality and duplicate-span
  * operators (x31/x32). */
class TextRepetitionSpec extends SparkSpec {

  test("repetitionStats: duplicate masses and the dup-fraction flag, hand-checked") {
    // doc1 "a a a a": nw=4 ndw=1 → dup_words 3; trigrams ["a a a","a a a"]
    //   → nt=2 ndt=1 → dup_trigrams 1; dup-word frac 0.75 > 0.5 → repetitive
    // doc2 "a b c d": all distinct → nothing; frac 0
    // doc3 "x y": under the trigram width → nt=ndt=0; frac 0
    val docs = docsOf(
      (1L, "a a a a", "en", "s"),
      (2L, "a b c d", "en", "s"),
      (3L, "x y", "en", "s"))
    val r = TextOps.repetitionStats(docs, 0.5).collect()
    assert(r.length == 1)
    val row = r.head
    assert((row.getString(0), row.getLong(1), row.getLong(2), row.getLong(3),
      row.getLong(4)) == (("en", 3L, 3L, 1L, 1L)), row.toString)
  }

  test("spanDedupCensus: first occurrence survives, later ones counted removed") {
    // width 2: doc1 ["p q","r s"], doc2 ["p q","x y"], doc4 ["p q","p q"]
    // winner of "p q" = (doc1, pos0); removed: doc2's copy + BOTH doc4
    // copies = 3 removed spans, 6 tokens, 2 docs affected
    val docs = docsOf(
      (1L, "p q r s", "en", "s"),
      (2L, "p q x y", "de", "s"),
      (4L, "p q p q", "en", "s"))
    val rows = TextOps.spanDedupCensus(docs, 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.toSeq == Seq(
      ("de", 2L, 1L, 2L, 1L),   // doc2: "p q" removed, "x y" kept
      ("en", 4L, 2L, 4L, 1L)),  // doc4: both copies removed; doc1 keeps all
      rows.mkString(","))
  }

  test("spanDedupApply: cleaned corpus — losers cut, tails and short docs kept") {
    // width 2: doc1 ["p q","r s"] keeps both (first everywhere);
    // doc2 ["p q","x y"] + tail "t" loses "p q", keeps "x y t";
    // doc3 "z" is shorter than the width -> passes through whole;
    // doc4 "p q p q" loses both copies -> comes out empty.
    val docs = docsOf(
      (1L, "p q r s", "en", "s"),
      (2L, "p q x y t", "de", "s"),
      (3L, "z", "en", "s"),
      (4L, "p q p q", "en", "s"))
    val out = TextOps.spanDedupApply(docs, 2).collect()
      .map(r => (r.getLong(0), r.getString(2))).toMap
    assert(out == Map(
      1L -> "p q r s", 2L -> "x y t", 3L -> "z", 4L -> ""), out.toString)
  }

  test("intraDocSpanDedup: within-doc repeats cut, cross-doc repeats kept, order preserved") {
    // Unlike spanDedupApply, the duplicate scope is ONE document: doc2's
    // "p q" is untouched (first in ITS doc) even though doc1 used it; doc3
    // loses only its second "p q", keeps order + tail; doc4 keeps its
    // single surviving copy (intra-doc dedup can never empty a doc with
    // >= 1 full window).
    val docs = docsOf(
      (1L, "p q r s", "en", "s"),
      (2L, "p q x y t", "de", "s"),
      (3L, "p q a b p q c", "en", "s"),
      (4L, "p q p q", "en", "s"))
    val out = TextOps.intraDocSpanDedup(docs, 2).collect()
      .map(r => (r.getLong(0), r.getString(2))).toMap
    assert(out == Map(
      1L -> "p q r s", 2L -> "p q x y t", 3L -> "p q a b c", 4L -> "p q"),
      out.toString)
  }

  test("intraDocSpanDedup: equals the keep-first window form on the real corpus") {
    import org.apache.spark.sql.expressions.Window
    val docs = graft.sources.Tables.read(spark, "/root/testdata/sf0.01", "documents")
    val fast = TextOps.intraDocSpanDedup(docs, 2)
      .select(col("doc_id"), col("text"))
    // reference: posexplode + keep-first-per-(doc,span) window + reassembly
    val ws = split(lower(col("text")), " ")
    val nSpans = (size(ws) / lit(2)).cast("int")
    val base = docs.select(col("doc_id"),
      when(size(ws) >= 2, transform(sequence(lit(1), nSpans), i =>
        concat_ws(" ", slice(ws, (i - lit(1)) * lit(2) + 1, lit(2)))))
        .otherwise(array().cast("array<string>")).as("spans"),
      concat_ws(" ", slice(ws, nSpans * lit(2) + 1, size(ws))).as("tail"))
    val kept = base
      .select(col("doc_id"), col("tail"), posexplode(col("spans")).as(Seq("pos", "span")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id"), col("span")).orderBy(col("pos"))))
      .filter(col("rn") === 1)
      .groupBy(col("doc_id"), col("tail"))
      .agg(concat_ws(" ", transform(
        array_sort(collect_list(struct(col("pos"), col("span")))),
        s => s("span"))).as("kept"))
    val slow = base.select(col("doc_id"), col("tail"))
      .join(kept.select(col("doc_id"), col("kept")), Seq("doc_id"), "left_outer")
      .select(col("doc_id"), concat_ws(" ", array_remove(
        array(coalesce(col("kept"), lit("")), col("tail")), "")).as("text"))
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty,
      "array_distinct form must equal the window form row-for-row")
    // and the rule really bites on this corpus at width 2
    val before = docs.select(sum(size(split(lower(col("text")), " ")))).collect().head.getLong(0)
    val after = fast.select(sum(size(split(col("text"), " ")))).collect().head.getLong(0)
    assert(after < before, "expected real within-doc removals at width 2")
  }

  test("spanDedupApply: uppercase text lands in the lowercased span domain") {
    val docs = docsOf((1L, "A B c d", "en", "s"), (2L, "a b E", "en", "s"))
    val out = TextOps.spanDedupApply(docs, 2).collect()
      .map(r => (r.getLong(0), r.getString(2))).toMap
    // doc1's "a b" wins; doc2 keeps only its tail token "e"
    assert(out == Map(1L -> "a b c d", 2L -> "e"), out.toString)
  }

  test("hashEmbed: counts land in md5 buckets; the vectors drive the similarity stack") {
    import org.apache.spark.sql.functions._
    import graft.operators.SimilarityOps
    val docs = docsOf(
      (1L, "alpha beta alpha", "en", "s"),
      (2L, "alpha beta alpha", "en", "s"), // identical -> identical vector
      (3L, "gamma delta epsilon zeta", "en", "s"))
    val emb = graft.operators.TextOps.hashEmbed(docs, 64)
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(vecs.values.forall(_.length == 64))
    // vector mass = word count; dims are exact integer counts
    assert(vecs(1L).map(_.toDouble).sum == 3.0 && vecs(3L).map(_.toDouble).sum == 4.0)
    assert(vecs(1L) == vecs(2L), "identical text must embed identically")
    assert(vecs(1L) != vecs(3L))
    // the bridge really feeds the vector operators: identical docs are a
    // cosine-1.0 near-dup pair through the exact bucketed join
    val pairs = SimilarityOps.embeddingNearDupBrute(
      emb.withColumnRenamed("doc_id", "vec_id"), 0.99).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 1.0)), pairs.mkString(","))
  }

  test("duplicateSpans: non-overlapping windows, cross-doc sharing, hand-checked") {
    // width 2: doc1 -> ["p q","r s"], doc2 -> ["p q","x y"],
    // doc3 (1 word) -> none, doc4 "p q p q" -> ["p q","p q"]
    // span "p q": 4 occurrences across 3 docs; "r s"/"x y": singletons
    val docs = docsOf(
      (1L, "p q r s", "en", "s"),
      (2L, "p q x y", "en", "s"),
      (3L, "z", "en", "s"),
      (4L, "p q p q", "en", "s"))
    val row = TextOps.duplicateSpans(docs, 2).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)) ==
      ((6L, 3L, 1L, 3L)), row.toString)
    // a trailing partial window is dropped, not padded: 5 words -> 2 spans
    val odd = docsOf((1L, "a b c d e", "en", "s"))
    val r2 = TextOps.duplicateSpans(odd, 2).collect().head
    assert(r2.getLong(0) == 2L, r2.toString)
  }

  test("cdc chunks: tokens conserved, short docs whole, boundaries shift-robust") {
    graft.functions.GraftFunctions.register(spark)
    val body = (0 until 60).map(i => s"tok$i").mkString(" ")
    val shifted = s"inserted $body" // one token prepended
    val d = docsOf(
      (1L, body, "en", "s"),
      (2L, shifted, "en", "s"),
      (3L, "a b", "en", "s")) // < 3 tokens: one whole-doc chunk
    val rel = d.select(col("doc_id"), TextOps.cdcChunks(8).as("chunks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // token conservation: chunks re-join to the original (lowercased) text
    assert(rel(1L).mkString(" ") == body)
    assert(rel(2L).mkString(" ") == shifted)
    assert(rel(3L) == Seq("a b"))
    // shift robustness: every chunk of doc1 except possibly the FIRST
    // (whose leading grams absorb the insertion) reappears in doc2
    val common = rel(1L).toSet.intersect(rel(2L).toSet)
    assert(rel(1L).length >= 3, s"fixture should cut into several chunks: ${rel(1L)}")
    assert(common.size >= rel(1L).length - 1,
      s"CDC must re-synchronize after an insertion: only $common")
    // the fixed span grid, by contrast, loses alignment entirely
    val spans1 = d.filter(col("doc_id") === 1L)
    val spans2 = d.filter(col("doc_id") === 2L)
    val g1 = TextOps.duplicateSpans(spans1.union(spans2), 8).collect().head
    assert(g1.getLong(2) == 0L, s"span grid should share nothing after a 1-token shift: $g1")

    // APPLY: doc1 (lower id) keeps everything; doc2 keeps only its unique
    // first chunk — the shared tail chunks dedup despite the shift
    val cleaned = TextOps.cdcDedupApply(d.filter(col("doc_id") <= 2L), 8)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(cleaned(1L) == body)
    assert(cleaned(2L) == rel(2L).filterNot(rel(1L).toSet).mkString(" "),
      s"doc2 must keep exactly its unshared chunks, got: ${cleaned(2L)}")
    assert(cleaned(2L).length < shifted.length / 2, "most of doc2 is boilerplate cut")
  }

  test("boilerplateCensus: df >= minDf flags EVERY occurrence, first included") {
    // width 2, minDf 3: "p q" appears in docs 1,2,3 (df 3 → flagged);
    // "r s" in docs 1,2 (df 2 → not); doc3 repeats "p q" twice but its df
    // contribution is 1 (distinct docs, not occurrences)
    val docs = docsOf(
      (1L, "p q r s", "en", "s"),
      (2L, "p q r s", "de", "s"),
      (3L, "p q p q", "en", "s"))
    val rows = TextOps.boilerplateCensus(docs, 2, 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.toSeq == Seq(
      ("de", 2L, 1L, 2L, 1L),   // doc2: its "p q" flagged (dedup would keep it!)
      ("en", 4L, 3L, 6L, 2L)),  // doc1's copy + BOTH doc3 copies
      rows.mkString(","))
  }

  test("boilerplateApply: flagged spans vanish everywhere; tails survive") {
    val docs = docsOf(
      (1L, "p q r s", "en", "s"),
      (2L, "p q r s t", "de", "s"),   // "t" is tail beyond the span grid
      (3L, "p q p q", "en", "s"),
      (4L, "z", "en", "s"))           // shorter than width → pure tail
    val rows = TextOps.boilerplateApply(docs, 2, 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // de: doc2 → "r s t" (3 tokens, 5 chars)
    // en: doc1 → "r s" (2 tok); doc3 → "" (split('',' ') counts 1 token,
    //     the x37-oracle-parity convention); doc4 → "z" (1 tok)
    assert(rows == Seq(("de", 1L, 3L, 5L), ("en", 3L, 4L, 4L)), rows.mkString(","))
  }
}
