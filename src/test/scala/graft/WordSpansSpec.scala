package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Equivalence gate for [[graft.functions.WordSpans]]: the one-pass
 * expression is held to the HOF column form it replaced, verbatim
 * (TextOps.spanArray as of commit 7b372d9), across generated corpora
 * exercising every edge the legacy form had: null text, empty text,
 * multi-space runs (split keeps empty tokens), docs shorter than the
 * width, exact-width docs, exact-multiple docs, trailing partials,
 * heavy repetition, and unicode.
 */
class WordSpansSpec extends SparkSpec {

  /** TextOps.spanArray before the expression rewrite, verbatim. */
  private def legacySpans(width: Int): Column = {
    val ws = split(lower(col("text")), " ")
    val nSpans = (size(ws) / lit(width)).cast("int")
    when(size(ws) >= width,
      transform(sequence(lit(1), nSpans), i =>
        concat_ws(" ", slice(ws, (i - lit(1)) * lit(width) + lit(1), lit(width)))))
      .otherwise(array().cast("array<string>"))
  }

  /** The rewritten form — spanArray is private, so restate its one-liner
    * (coalesce restores the legacy null-text empty array). */
  private def fastSpans(width: Int): Column =
    coalesce(
      graft.functions.GraftFunctions.wordSpans(split(lower(col("text")), " "), width),
      array().cast("array<string>"))

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
          // 0..25 words: covers < width, == width, multiples, partial tails
          val len = rnd.nextInt(26)
          Some((0 until len).map(_ => words(rnd.nextInt(words.length)))
            .mkString(" "))
        }
      (i.toLong, text)
    }
    rows.toDF("doc_id", "text")
  }

  test("spans: expression equals the legacy HOF form on every doc and width") {
    graft.functions.GraftFunctions.register(spark)
    for (seed <- 1L to 3L; width <- Seq(1, 3, 8)) {
      val docs = corpus(seed, 500)
      val bad = docs.select(col("doc_id"),
          legacySpans(width).as("legacy"), fastSpans(width).as("fast"))
        .filter(not(col("legacy") <=> col("fast")))
      assert(bad.count() === 0,
        s"seed $seed width $width: ${bad.collect().take(3).mkString("; ")}")
    }
  }

  test("edge values: null/empty/short → [], exact width → one span, partial tail dropped, occurrences kept") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val docs = Seq[(Long, Option[String])](
      (1L, None), (2L, Some("")), (3L, Some("one two")),
      (4L, Some("a b c")), (5L, Some("a b c d e")),
      (6L, Some("a b c a b c")), (7L, Some("A B c D e F g")))
      .toDF("doc_id", "text")
    val got = docs.select(col("doc_id"), fastSpans(3).as("sp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L) === Seq())
    assert(got(2L) === Seq())          // "" splits to [""] — shorter than 3
    assert(got(3L) === Seq())
    assert(got(4L) === Seq("a b c"))
    assert(got(5L) === Seq("a b c"))   // d e tail dropped
    assert(got(6L) === Seq("a b c", "a b c")) // NOT distinct — grid keeps occurrences
    assert(got(7L) === Seq("a b c", "d e f")) // lowercased, g dropped
  }
}
