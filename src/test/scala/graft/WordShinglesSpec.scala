package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Equivalence gate for [[graft.functions.WordShingles]]: the one-pass
 * expression is held to the HOF column pipelines it replaced, verbatim
 * (DedupOps.shingles / TextOps.fingerprintCensus / TextOps.repetitionStats
 * as of commit 565d719), across generated corpora that exercise every edge
 * the legacy forms had: null text, empty text, multi-space runs (split
 * keeps empty tokens), docs shorter than the gram, exact-gram-length docs,
 * heavy within-doc repetition (distinct order), and unicode.
 */
class WordShinglesSpec extends SparkSpec {

  /** DedupOps.shingles before the expression rewrite, verbatim. */
  private def legacyShingles(text: Column): Column = {
    val ws = split(lower(text), " ")
    array_distinct(
      when(size(ws) >= 3,
        transform(sequence(lit(1), size(ws) - 2), i => concat_ws(" ", slice(ws, i, lit(3)))))
      .otherwise(array(concat_ws(" ", ws))))
  }

  /** The 5-gram md5 fingerprint array before the rewrite, verbatim. */
  private def legacyFingerprint(text: Column): Column = {
    val ws = split(lower(text), " ")
    array_min(when(size(ws) >= 5,
        transform(sequence(lit(1), size(ws) - 4),
          i => md5(concat_ws(" ", slice(ws, i, lit(5))).cast("binary"))))
      .otherwise(array(md5(concat_ws(" ", ws).cast("binary")))))
  }

  /** The repetition-census trigram counts before the rewrite, verbatim. */
  private def legacyTriCounts(text: Column): (Column, Column) = {
    val ws = split(lower(text), " ")
    val tri = when(size(ws) >= 3,
      transform(sequence(lit(1), size(ws) - 2), i => concat_ws(" ", slice(ws, i, lit(3)))))
      .otherwise(array().cast("array<string>"))
    (size(tri), size(array_distinct(tri)))
  }

  private val words = Vector("the", "cat", "sat", "on", "a", "mat", "Über",
    "naïve", "", "x")

  private def corpus(seed: Long, n: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val rows = (0 until n).map { i =>
      val text: Option[String] =
        if (i % 37 == 5) None
        else if (i % 29 == 3) Some("")
        else if (i % 23 == 2) Some("  leading  and   multi space ")
        else {
          val len = rnd.nextInt(12) // 0..11 words: covers <3, ==3, >3
          Some((0 until len).map(_ => words(rnd.nextInt(words.length)))
            .mkString(" "))
        }
      (i.toLong, text)
    }
    rows.toDF("doc_id", "text")
  }

  test("shingles: expression equals the legacy HOF form on every doc (nulls, empties, multi-space, unicode)") {
    graft.functions.GraftFunctions.register(spark)
    (1L to 3L).foreach { seed =>
      val docs = corpus(seed, 500)
      val bad = docs.select(col("doc_id"),
          legacyShingles(col("text")).as("legacy"),
          graft.operators.DedupOps.shingles(col("text")).as("fast"))
        .filter(not(col("legacy") <=> col("fast")))
      assert(bad.count() === 0, s"seed $seed: ${bad.collect().take(3).mkString("; ")}")
    }
  }

  test("fingerprint array_min: expression path equals the legacy 5-gram form") {
    graft.functions.GraftFunctions.register(spark)
    val fast = when(col("text").isNull, array(lit("")))
      .otherwise(graft.functions.GraftFunctions.wordShingles(
        split(lower(col("text")), " "), 5, wholeDocIfShort = true))
    val docs = corpus(7L, 500)
    val bad = docs.select(
        legacyFingerprint(col("text")).as("legacy"),
        array_min(transform(fast, s => md5(s.cast("binary")))).as("new"))
      .filter(not(col("legacy") <=> col("new")))
    assert(bad.count() === 0)
  }

  test("repetition trigram counts: closed-form nt and expression ndt equal the legacy sizes") {
    graft.functions.GraftFunctions.register(spark)
    val ws = split(lower(col("text")), " ")
    val tri = graft.functions.GraftFunctions.wordShingles(
      ws, 3, wholeDocIfShort = false)
    val (lnt, lndt) = legacyTriCounts(col("text"))
    val docs = corpus(11L, 500)
    val bad = docs.select(
        lnt.as("lnt"), lndt.as("lndt"),
        coalesce(when(size(ws) >= 3, size(ws) - 2), lit(0)).as("nt"),
        coalesce(size(tri), lit(0)).as("ndt"))
      .filter(not(col("lnt") <=> col("nt")) || not(col("lndt") <=> col("ndt")))
    assert(bad.count() === 0)
  }

  test("edge values are what the legacy form produced: null → [\"\"], empty → [\"\"], 2 words → whole text, 3 words → one gram") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val docs = Seq[(Long, Option[String])](
      (1L, None), (2L, Some("")), (3L, Some("Two WORDS")),
      (4L, Some("a b c")), (5L, Some("a b c d")), (6L, Some("a a a a")))
      .toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
        graft.operators.DedupOps.shingles(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L) === Seq(""))
    assert(got(2L) === Seq(""))
    assert(got(3L) === Seq("two words"))
    assert(got(4L) === Seq("a b c"))
    assert(got(5L) === Seq("a b c", "b c d"))
    assert(got(6L) === Seq("a a a")) // distinct, first occurrence
  }
}
