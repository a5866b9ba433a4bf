package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.operators.TextOps

/**
 * Equivalence gate for the round-7 CDC chunker rewrite: the codegen'd
 * single-pass `cdc_chunks` expression must reproduce the round-6
 * higher-order-function column pipeline bit-for-bit — same boundary rule,
 * same edge handling — because the x54/x55 DuckDB oracles pin THAT
 * semantics. The legacy pipeline lives here (and only here) as the
 * executable spec it was.
 */
class CdcChunksSpec extends SparkSpec {

  /** The round-6 column-pipeline chunker, verbatim (TextOps.cdcChunks as of
    * commit 96d2288) — the reference the fast expression is held to. */
  private def legacyCdcChunks(m: Int): Column = {
    val ws = split(lower(col("text")), " ")
    val n = size(ws)
    val bpos = when(n >= 3,
      filter(sequence(lit(3), n), p =>
        graft.functions.GraftFunctions
          .md5PrefixLong(concat_ws(" ", slice(ws, p - 2, lit(3))), 8) % m === 0))
      .otherwise(array().cast("array<int>"))
    val edges = concat(array(lit(0)), bpos,
      when(coalesce(try_element_at(bpos, lit(-1)), lit(-1)) === n,
        array().cast("array<int>"))
        .otherwise(array(n)))
    transform(sequence(lit(1), size(edges) - 1), i =>
      concat_ws(" ", slice(ws,
        element_at(edges, i) + 1,
        element_at(edges, i + 1) - element_at(edges, i))))
  }

  private def chunksBoth(texts: Seq[String], m: Int): Seq[(Seq[String], Seq[String])] = {
    graft.functions.GraftFunctions.register(spark)
    val docs = docsOf(texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "en", "s") }: _*)
    docs
      .select(col("doc_id"), TextOps.cdcChunks(m).as("fast"), legacyCdcChunks(m).as("legacy"))
      .orderBy(col("doc_id"))
      .collect()
      .toSeq
      .map(r => (r.getSeq[String](1), r.getSeq[String](2)))
  }

  test("edge cases: empty, single, two tokens, exact gram, boundary-at-n") {
    val texts = Seq(
      "",            // split gives [""] -> one empty chunk
      "one",
      "two tokens",
      "a b c",       // exactly one gram: cut or whole-doc
      "A B C D E",   // mixed case goes through lower()
      "x x x x x x x x x x x x x x x x")
    for (((fast, legacy), i) <- chunksBoth(texts, 8).zipWithIndex) {
      assert(fast == legacy, s"text #$i: fast=$fast legacy=$legacy")
    }
  }

  test("random docs across moduli: fast == legacy, tokens conserved") {
    // Deterministic pseudo-corpus: small vocab forces frequent shared grams,
    // lengths 0..40 cover short-doc and multi-boundary regimes.
    val rnd = new scala.util.Random(42)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "kk", "q")
    val texts = (1 to 120).map { _ =>
      val len = rnd.nextInt(41)
      (1 to len).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    for (m <- Seq(2, 8, 13)) {
      for (((fast, legacy), i) <- chunksBoth(texts, m).zipWithIndex) {
        assert(fast == legacy, s"m=$m text #$i: fast=$fast legacy=$legacy")
        assert(fast.mkString(" ") == texts(i).toLowerCase,
          s"m=$m text #$i: chunks must re-join to the normalized text")
      }
    }
  }

  test("boundary lands exactly at n: no trailing empty chunk") {
    // Search for a doc whose LAST 3-gram hashes to 0 mod 2 so the final
    // edge case (skip the n edge) is provably exercised, on both paths.
    val rnd = new scala.util.Random(7)
    val vocab = Vector("u", "v", "w", "z1", "z2")
    val texts = (1 to 200).map { _ =>
      (1 to (3 + rnd.nextInt(8))).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val both = chunksBoth(texts, 2)
    // With m=2 about half the docs end on a cut; assert we saw some and that
    // no output ever contains a trailing empty chunk.
    val endsOnCut = both.count { case (fast, _) => fast.nonEmpty && fast.last.nonEmpty }
    assert(both.forall { case (fast, legacy) => fast == legacy })
    assert(both.forall { case (fast, _) => fast.forall(_ != null) })
    assert(endsOnCut > 0)
  }
}
