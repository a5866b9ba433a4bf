package graft

import org.apache.spark.sql.functions._

import graft.functions.BpeSegment
import graft.operators.{BpeOps, PrepOps, TextOps}

/** Hand-checked fixtures for the deterministic BPE trainer and the
  * codegen'd segmentation expression (x68/x71). */
class BpeSpec extends SparkSpec {

  test("trainMerges: frequency order, lexicographic ties, weighted counts, early stop") {
    // corpus: "low" x3, "lower" x1 -> pair counts (l,o)=4 (o,w)=4 (w,e)=1 (e,r)=1
    // tie (l,o) vs (o,w) at 4 -> lex smaller ('l','o') first; then (lo,w)=4...
    val docs = docsOf(
      (1L, "low low low lower", "en", "s"))
    val merges = BpeOps.trainMerges(docs, 10)
    assert(merges.take(2) == Seq(("l", "o"), ("lo", "w")))
    // after low->1 symbol: remaining pairs (low,e)=1 (e,r)=1 -> all < 2 -> stop
    assert(merges == Seq(("l", "o"), ("lo", "w")))
    // determinism: retrain gives the identical list
    assert(BpeOps.trainMerges(docs, 10) == merges)
  }

  test("segmentation: leftmost-min-rank loop, hand-checked") {
    graft.functions.GraftFunctions.register(spark)
    val merges = Seq(("l", "o"), ("lo", "w"), ("e", "r"))
    val d = docsOf(
      (1L, "low lower slow wool", "en", "s"),
      (2L, "", "en", "s")) // empty text -> [''] -> one empty symbol
    val segs = d.select(col("doc_id"),
        BpeOps.segment(TextOps.words(col("text")), merges).as("seg"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // low -> [low]; lower -> [low, e, r] -> er merges -> [low, er];
    // slow -> [s, low]; wool -> w,o,o,l: (l,o) absent ((o,o)/(w,o)/(o,l)
    // unranked) -> stays 4 symbols
    assert(segs(1L) == Seq("low", "low", "er", "s", "low", "w", "o", "o", "l"))
    assert(segs(2L) == Seq(""))
    // token count = segmentation size
    val n = d.filter(col("doc_id") === 1L)
      .select(BpeOps.tokenCount(merges)).collect().head.getLong(0)
    assert(n == 9L)
  }

  test("expression reproduces the trainer's own segmentation of training words") {
    graft.functions.GraftFunctions.register(spark)
    val docs = docsOf(
      (1L, "join join hash hash scan merge merge merge order", "en", "s"),
      (2L, "window window stream sort sort batch filter", "en", "s"))
    val merges = BpeOps.trainMerges(docs, 30)
    // applying the ranked table must fully collapse every word that the
    // trainer collapsed: count tokens via the expression and check against
    // a driver-side replay through the public encode/decode round-trip
    val table = BpeSegment.buildTable(BpeSegment.encode(merges))
    assert(BpeSegment.decode(BpeSegment.encode(merges)) == merges)
    val rows = docs.select(col("doc_id"),
        BpeOps.segment(TextOps.words(col("text")), merges).as("seg"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // every frequent word (count >= 2) collapses to ONE token: merges were
    // learned until pair weight < 2, so e.g. "merge" (x3) is one symbol
    val freq = Seq("join", "hash", "merge", "window", "sort")
    freq.foreach { w =>
      assert(rows.values.flatten.count(_ == w) > 0, s"'$w' should be a single token")
    }
    assert(table.size() == merges.length)
  }

  test("property: expression equals the classical merge-all-occurrences algorithm") {
    // Independent reference implementation, deliberately formulated the
    // OTHER way the public algorithm is usually written: find the
    // lowest-rank pair present, merge ALL its occurrences left-to-right,
    // repeat. The expression merges one leftmost occurrence per step; the
    // two are equivalent because a merge can only create higher-rank pairs
    // (see BpeSegment scaladoc). If they ever diverge, that argument — and
    // the oracle CTE built on it — is wrong.
    def codepoints(w: String): Vector[String] = {
      val b = Vector.newBuilder[String]
      var i = 0
      while (i < w.length) {
        val cc = Character.charCount(w.codePointAt(i))
        b += w.substring(i, i + cc); i += cc
      }
      val r = b.result(); if (r.isEmpty) Vector("") else r
    }
    def mergeAllLR(syms: Vector[String], a: String, b: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) { out += a + b; i += 2 }
        else { out += syms(i); i += 1 }
      }
      out.result()
    }
    def classical(word: String, merges: Seq[(String, String)]): Vector[String] = {
      var syms = codepoints(word)
      var go = true
      while (go) {
        val applicable = merges.zipWithIndex.filter { case ((a, b), _) =>
          (0 until syms.length - 1).exists(i => syms(i) == a && syms(i + 1) == b)
        }
        if (applicable.isEmpty) go = false
        else {
          val (a, b) = applicable.minBy(_._2)._1
          syms = mergeAllLR(syms, a, b)
        }
      }
      syms
    }

    graft.functions.GraftFunctions.register(spark)
    val rnd = new scala.util.Random(1234)
    val alphabet = "abcde"
    def randWord(): String =
      (0 until rnd.nextInt(12)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    for (round <- 1 to 8) {
      // random merge table over random short symbol pairs — including
      // chained merges ("ab"+"c") and pairs that can never fire
      val pool = scala.collection.mutable.ArrayBuffer[String]() ++= alphabet.map(_.toString)
      val merges = (1 to 12).map { _ =>
        val a = pool(rnd.nextInt(pool.length)); val b = pool(rnd.nextInt(pool.length))
        pool += (a + b)
        (a, b)
      }.distinct
      val words = (1 to 60).map(_ => randWord())
      val d = docsOf(words.zipWithIndex.map { case (w, i) => (i.toLong, w, "en", "s") }: _*)
      val got = d.select(col("doc_id"),
          graft.operators.BpeOps.segment(split(lower(col("text")), " "), merges).as("seg"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      words.zipWithIndex.foreach { case (w, i) =>
        val expect = classical(w.toLowerCase, merges)
        assert(got(i.toLong) == expect,
          s"round $round word '$w' merges $merges: got ${got(i.toLong)}, classical $expect")
        assert(got(i.toLong).mkString("") == (if (w.isEmpty) "" else w.toLowerCase),
          "segmentation must concatenate back to the word")
      }
    }
  }

  test("property: incremental trainer equals the naive recount loop") {
    // the naive reference: recount EVERY pair each round (the pre-round-8
    // trainer) — the incremental trainer must reproduce it exactly,
    // including tie-breaks and early stop
    def naive(hist: Seq[(String, Long)], nMerges: Int): Seq[(String, String)] = {
      def split(w: String): Vector[String] = w.map(_.toString).toVector
      var vocab = hist.map { case (w, c) => (split(w), c) }
      val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      var continue = true
      while (continue && merges.length < nMerges) {
        val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
        for ((syms, c) <- vocab; j <- 0 until syms.length - 1)
          counts.updateWith((syms(j), syms(j + 1)))(p => Some(p.getOrElse(0L) + c))
        if (counts.isEmpty) continue = false
        else {
          val (pair, cnt) = counts.minBy { case ((a, b), c) => (-c, a, b) }
          if (cnt < 2) continue = false
          else {
            merges += pair
            vocab = vocab.map { case (syms, c) =>
              val out = Vector.newBuilder[String]
              var i = 0
              while (i < syms.length) {
                if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
                  out += pair._1 + pair._2; i += 2
                } else { out += syms(i); i += 1 }
              }
              (out.result(), c)
            }
          }
        }
      }
      merges.toSeq
    }
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val alphabet = "abcd"
      val hist = (1 to 60).map { _ =>
        val w = (1 to (2 + rnd.nextInt(8)))
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
        (w, (1 + rnd.nextInt(20)).toLong)
      }.groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }.toSeq.sorted
      assert(BpeOps.trainMergesFromHistogram(hist, 50) == naive(hist, 50),
        s"seed=$seed: incremental trainer diverged from the naive recount")
    }
  }

  test("trainer-scale table: 8k merges load, file transport equals literal transport") {
    graft.functions.GraftFunctions.register(spark)
    assert(BpeOps.bigMerges.length == 8192)
    val docs = graft.sources.Tables.read(spark, "/root/testdata/sf0.001", "documents")
    val viaFile = docs.select(col("doc_id"),
        BpeOps.segmentFile(TextOps.words(col("text")), BpeOps.bigMergesPath).as("toks"))
      .orderBy(col("doc_id")).collect().map(r => (r.getLong(0), r.getSeq[String](1)))
    val viaLit = docs.select(col("doc_id"),
        BpeOps.segment(TextOps.words(col("text")), BpeOps.bigMerges).as("toks"))
      .orderBy(col("doc_id")).collect().map(r => (r.getLong(0), r.getSeq[String](1)))
    assert(viaFile.toSeq == viaLit.toSeq,
      "artifact-file transport must segment identically to the plan literal")
    // subword counts are at least the word counts (every word >= 1 unit)
    val totWords = docs.select(sum(size(TextOps.words(col("text"))))).collect().head.getLong(0)
    val totSub = viaFile.map(_._2.length.toLong).sum
    assert(totSub >= totWords)
  }

  test("unkCoverageCensus: mass conservation, cap monotonicity, full-vocab cap => zero UNKs") {
    graft.functions.GraftFunctions.register(spark)
    val docs = graft.sources.Tables.read(spark, "/root/testdata/sf0.001", "documents")
    def census(cap: Int) =
      BpeOps.unkCoverageCensus(docs, BpeOps.defaultMerges, cap).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val capped = census(24)
    assert(capped.nonEmpty)
    capped.foreach { case (lang, d, toks, unk, dunk) =>
      assert(unk <= toks, s"$lang: UNK mass above token mass")
      assert(dunk <= d, s"$lang: more UNK docs than docs")
    }
    assert(capped.map(_._4).sum > 0, "cap 24 under a 40-token vocab must flag UNKs")
    // a larger cap can only shrink the UNK mass, per language
    val wider = census(32).map(r => r._1 -> r._4).toMap
    capped.foreach { case (lang, _, _, unk, _) => assert(wider(lang) <= unk, lang) }
    // a cap at/above the whole vocabulary flags nothing
    val full = census(100000)
    assert(full.forall(r => r._4 == 0L && r._5 == 0L),
      "cap >= vocab size must leave every doc round-trippable")
  }

  test("checked-in merge table loads and x68 packing census is consistent") {
    graft.functions.GraftFunctions.register(spark)
    val merges = BpeOps.defaultMerges
    assert(merges.length == 40)
    assert(merges.head == ("e", "r")) // pinned: regenerating must not drift
    val docs = docsOf(
      (1L, "the query plan", "en", "s"),
      (2L, "the the the", "en", "s"))
    val bpeToks = docs.select(sum(BpeOps.tokenCount()).cast("long")).collect().head.getLong(0)
    val wsToks = docs.select(sum(size(split(lower(col("text")), " ")))
      .cast("long")).collect().head.getLong(0)
    // subword counts are >= 1 per word and > whitespace counts whenever any
    // word stays multi-symbol
    assert(wsToks == 6L && bpeToks >= wsToks)
    // packing under the subword counter still conserves tokens
    val packed = PrepOps.seqPackCensus(docs, 2048L, tokens = BpeOps.tokenCount())
      .agg(sum(col("tokens"))).collect().head.getLong(0)
    assert(packed == bpeToks)
  }

  test("fertilityCensus: sums tie to tokenCount, ratio is exact floor division") {
    graft.functions.GraftFunctions.register(spark)
    val docs = graft.sources.Tables.read(spark, "/root/testdata/sf0.001", "documents")
    val rows = BpeOps.fertilityCensus(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val byLang = docs.groupBy(col("lang")).agg(
        count(lit(1)).as("docs"),
        sum(size(split(lower(col("text")), " ")).cast("long")).as("w"),
        sum(BpeOps.tokenCount()).as("t"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    rows.foreach { case (lang, d, w, t, fm) =>
      val (ed, ew, et) = byLang(lang)
      assert(d == ed && w == ew && t == et, s"$lang: sums diverge from tokenCount")
      assert(fm == t * 1000000L / w, s"$lang: fertility is not the exact floor ratio")
      // every word is at least one subword, so fertility >= 1.0 on real text
      assert(fm >= 1000000L, s"$lang: fertility below 1.0")
    }
  }
}
