package graft

import org.apache.spark.sql.functions._

import graft.operators.CurationOps

/** Semantics of the composite curation operators beyond the oracle gate
  * (which pins fixed parameters only). */
class CurationOpsSpec extends SparkSpec {

  private lazy val docs =
    graft.sources.Tables.read(spark, "/root/testdata/sf0.001", "documents")

  test("tokenGiniCensus: equal docs score zero; a dominant doc raises the index") {
    def words(n: Int) = (1 to n).map(i => s"t$i").mkString(" ")
    // source a: 10,10,10 → G = 0. source b: 5,5,20 → with ranks 1,2,3:
    // G_micro = 1e6·(2·(5+10+60) − 4·30)/(3·30) = 1e6·30/90 = 333333
    val d = docsOf(
      (1L, words(10), "en", "a"), (2L, words(10), "en", "a"),
      (3L, words(10), "en", "a"),
      (4L, words(5), "en", "b"), (5L, words(5), "en", "b"),
      (6L, words(20), "en", "b"))
    val r = CurationOps.tokenGiniCensus(d).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3))).toSeq
    assert(r == Seq(("a", 3L, 30L, 0L), ("b", 3L, 30L, 333333L)), r.mkString(","))
  }

  test("epochWaterfill by hand: small source caps, surplus splits evenly among the rest") {
    // tokens 10/100/1000 → caps 20/200/2000 at 2 epochs. Budget 300:
    // a caps (300 ≥ 20·3); b does not (280 < 200·2) → λ = 280÷2 = 140.
    def words(n: Int) = (1 to n).map(i => s"t$i").mkString(" ")
    val d = docsOf(
      (1L, words(10), "en", "a"),
      (2L, words(100), "en", "b"),
      (3L, words(500), "en", "c"), (4L, words(500), "en", "c"))
    val r = CurationOps.epochWaterfill(d, 300L, 2000L).collect()
      .map(x => (x.getString(0), x.getLong(2), x.getLong(3), x.getLong(4),
        x.getLong(5), x.getLong(6))).toSeq
    assert(r == Seq(
      ("a", 10L, 20L, 1L, 20L, 2000L),
      ("b", 100L, 200L, 0L, 140L, 1400L),
      ("c", 1000L, 2000L, 0L, 140L, 140L)), r.mkString(","))
    // a budget past total capacity caps everyone at max epochs
    val all = CurationOps.epochWaterfill(d, 10000L, 2000L).collect()
    assert(all.forall(_.getLong(4) == 1L))
    assert(all.forall(x => x.getLong(6) == 2000L))
  }

  test("token-budget mix: rates bounded, kept counts consistent, budget respected") {
    val rows = CurationOps.tokenBudgetMix(docs, 2000L).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nDocs, total, nKept, kept, rate) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(rate > 0.0 && rate <= 1.0, s"rate out of range: $r")
      assert(nKept <= nDocs && kept <= total, s"kept exceeds totals: $r")
      // a full-rate source keeps everything
      if (rate == 1.0) assert(nKept == nDocs && kept == total, s"rate=1 must keep all: $r")
    }
    // the hash gate is content-independent and deterministic: same input,
    // same census
    val again = CurationOps.tokenBudgetMix(docs, 2000L).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
    // a budget at least the corpus size keeps every doc
    val totalToks = docs.select(sum(size(split(col("text"), " ")).cast("long")))
      .head.getLong(0)
    CurationOps.tokenBudgetMix(docs, totalToks * 3).collect().foreach { r =>
      assert(r.getDouble(5) == 1.0 && r.getLong(1) == r.getLong(3), s"uncapped: $r")
    }
  }

  test("temperature mix: sqrt weights flatten the mixture toward uniform") {
    // two sources, 16:1 token imbalance → sqrt weights 4:1
    val skewed = docsOf(
      (Seq.tabulate(16)(i => (i.toLong, ("w " * 64).trim, "en", "big")) :+
        (100L, ("w " * 64).trim, "en", "small")): _*)
    val rows = CurationOps.tokenBudgetMixTemperature(skewed, 512L, 0.5)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getDouble(5))).toMap
    val (bigTotal, bigRate) = rows("big")
    val (smallTotal, smallRate) = rows("small")
    assert(bigTotal == 16 * smallTotal)
    // natural shares would be 16/17 vs 1/17; sqrt weights give 4/5 vs 1/5:
    // the small source's keep RATE must exceed the big one's
    assert(smallRate > bigRate, s"small=$smallRate big=$bigRate")
    // expected rates from the closed form (integer-rounded sqrt weights)
    val wBig = math.round(math.sqrt(bigTotal.toDouble)).toDouble
    val wSmall = math.round(math.sqrt(smallTotal.toDouble)).toDouble
    val sumw = wBig + wSmall
    def exp(w: Double, tot: Long) = math.min(1.0, 512.0 * w / sumw / tot)
    assert(math.abs(bigRate - exp(wBig, bigTotal)) < 1e-6)
    assert(math.abs(smallRate - exp(wSmall, smallTotal)) < 1e-6)
  }

  test("decontaminateApply returns exactly the docs the census calls clean") {
    val bench = docs.filter(col("doc_id") % 97 === 0)
    val corpus = docs.filter(col("doc_id") % 97 =!= 0)
    val census = CurationOps.decontaminateAgainst(corpus, bench, 5)
      .agg(sum(col("n_docs")), sum(col("n_contaminated"))).head
    val survivors = CurationOps.decontaminateApply(corpus, bench, 5)
    assert(survivors.columns.toSeq == corpus.columns.toSeq, "schema passes through")
    assert(survivors.count() == census.getLong(0) - census.getLong(1))
    // survivors are a subset of the corpus (no row invented or mutated)
    assert(survivors.join(corpus, Seq("doc_id"), "left_anti").isEmpty)
  }

  test("token-budget mix: non-numeric source names and a zero budget degrade gracefully") {
    // ANSI mode makes substring(...).cast(int) throw on a name without a
    // numeric tail; the demo weights must fall back to weight 1 instead
    val odd = docsOf(
      (1L, "a b c d e f g h", "en", "s"),
      (2L, "a b c d e f g h", "en", "corpus-main"),
      (3L, "a b c d e f g h", "en", "abc-14")) // negative tail: pmod keeps w positive
    val rows = CurationOps.tokenBudgetMix(odd, 1000L).collect()
    assert(rows.length == 3)
    rows.foreach(r => assert(r.getDouble(5) == 1.0, s"budget >> corpus keeps all: $r"))
    // zero budget: every rate 0, nothing kept, census rows still present
    CurationOps.tokenBudgetMix(odd, 0L).collect().foreach { r =>
      assert(r.getDouble(5) == 0.0 && r.getLong(3) == 0L, s"zero budget: $r")
    }
  }

  test("token-budget mix: supplied (source, weight) table drives the rates") {
    import spark.implicits._
    // two sources, strongly asymmetric weights; src_c present in the corpus
    // but absent from the table — reported with rate 0, not dropped
    val docs3 = docsOf(
      ((1L to 40L).map(i => (i, s"${"tok " * 9}x", "en", "src_a")) ++
        (41L to 80L).map(i => (i, s"${"tok " * 9}x", "en", "src_b")) ++
        (81L to 90L).map(i => (i, s"${"tok " * 9}x", "en", "src_c"))): _*)
    val weights = Seq(("src_a", 3.0), ("src_b", 1.0), ("src_zzz_absent", 5.0))
      .toDF("source", "weight")
    // 40 docs x 10 tokens per source; budget 400: rate_a = min(1, 400*3/4/400)
    // = 0.75, rate_b = min(1, 400*1/4/400) = 0.25; the absent-source weight
    // must NOT enter the split
    val rows = CurationOps.tokenBudgetMix(docs3, 400L, weights).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("src_a", "src_b", "src_c"))
    assert(rows("src_a").getDouble(5) == 0.75, rows("src_a").toString)
    assert(rows("src_b").getDouble(5) == 0.25, rows("src_b").toString)
    assert(rows("src_c").getDouble(5) == 0.0 && rows("src_c").getLong(3) == 0L,
      s"unweighted source must surface with rate 0: ${rows("src_c")}")
    // a malformed mixture config fails the job loudly
    val dup = Seq(("src_a", 1.0), ("src_a", 2.0)).toDF("source", "weight")
    val e1 = intercept[Exception] {
      CurationOps.tokenBudgetMix(docs3, 400L, dup).collect()
    }
    assert(e1.getMessage.contains("duplicate weight"), e1.getMessage)
    val neg = Seq(("src_a", -1.0)).toDF("source", "weight")
    val e2 = intercept[Exception] {
      CurationOps.tokenBudgetMix(docs3, 400L, neg).collect()
    }
    assert(e2.getMessage.contains("negative weight"), e2.getMessage)
  }

  test("collapsed keeper semantics: null text, no-quality groups, non-min keepers") {
    // Edge cases the driver fixture never exercises, aimed at the round-10
    // min_by(struct, when(q, doc_id)) keeper selection:
    //  - a normalized-dup group whose MINIMUM doc_id fails quality but a
    //    later member passes (trailing space adds a 5th split token at
    //    minWords = 5; trim-normalization maps both to one norm) — the
    //    keeper must be the min QUALITY survivor, not the group min;
    //  - a null-text doc (counts into n_input only; must never group with
    //    anything or produce a keeper);
    //  - an empty-text group and a two-member group with NO quality
    //    survivor (grp_q = 0 → null keeper → absent from n_exact);
    //  - one real near-dup pair among the keepers (J = 3/4 ≥ 0.5) so the
    //    loser stage is live.
    import spark.implicits._
    val rows = Seq[(Long, Option[String], String, String)](
      (3L, Some("a b c d"), "en", "s"),      // 4 tokens: fails q; group min
      (7L, Some("a b c d "), "en", "s"),     // 5 split tokens: passes; KEEPER
      (20L, None, "en", "s"),                // null text
      (21L, Some(""), "en", "s"),            // empty: fails q
      (30L, Some("x y"), "en", "s"), (31L, Some("x y"), "en", "s"), // no survivor
      (40L, Some("alpha bravo charlie delta echo"), "en", "s"),
      (41L, Some("alpha bravo charlie delta echo foxtrot"), "en", "s"))
    val d = rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val census = CurationOps
      .curationFunnel(d, minWords = 5, threshold = 0.5, keepNibbles = 16)
      .collect().head.toSeq
    // n_input 8; quality pass {7, 40, 41}; keepers {7, 40, 41};
    // near-dup pair (40, 41) drops 41; nibble gate 16 keeps everything
    assert(census == Seq(8L, 3L, 3L, 2L, 2L), census.mkString(","))
    // the exact-join detector agrees on the same edges
    val exact = CurationOps
      .curationFunnel(d, minWords = 5, threshold = 0.5, keepNibbles = 16,
        useLsh = false)
      .collect().head.toSeq
    assert(exact == census, s"exact $exact != lsh $census")
    // and the cleaned corpus is exactly the census's survivor set
    val corpus = CurationOps
      .curationCorpus(d, minWords = 5, threshold = 0.5, keepNibbles = 16)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(corpus == Seq(7L, 40L), corpus.mkString(","))
  }

  test("zero-keeper corpus: every census count is 0, never NULL") {
    // A non-empty corpus where NO row passes the quality bar leaves the
    // keeper relation empty; sum() over an empty relation is NULL unless
    // coalesced — the pre-collapse implementation returned 0 and census
    // consumers do Row.getLong, so the collapsed form must too.
    import spark.implicits._
    val d = Seq((1L, "too short", "en", "s"), (2L, "also brief", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val row = CurationOps
      .curationFunnel(d, minWords = 5, threshold = 0.5, keepNibbles = 16)
      .collect().head
    (0 until 5).foreach { i =>
      assert(!row.isNullAt(i), s"census column $i is NULL: $row")
    }
    assert(row.toSeq == Seq(2L, 0L, 0L, 0L, 0L), row.toSeq.mkString(","))
    CurationOps.unpersistCuration(d)
  }

  test("unpersistCuration drops entries across DIFFERENT minWords configs") {
    // The registry (not plan-rebuild) owns release: vary minWords so the
    // rebuild idiom would no-op on at least one configuration, then one
    // unpersistCuration(docs) call must drop everything the funnel built.
    import spark.implicits._
    val d = Seq(
      (1L, "alpha bravo charlie delta echo", "en", "s"),
      (2L, "alpha bravo charlie delta echo foxtrot", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    CurationOps.unpersistCuration(d) // clean slate if a prior suite ran this corpus
    val before = spark.sparkContext.getPersistentRDDs.keySet
    CurationOps.curationFunnel(d, minWords = 3, threshold = 0.5).collect()
    CurationOps.curationFunnel(d, minWords = 5, threshold = 0.5).collect()
    val mid = spark.sparkContext.getPersistentRDDs.keySet
    assert((mid -- before).nonEmpty, "the funnels must have cached state")
    CurationOps.unpersistCuration(d)
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert((after -- before).isEmpty,
      s"one call must drop every configuration's entries: ${after -- before}")
  }

  test("curationCorpus: the survivors ARE what the funnel census counts") {
    import org.apache.spark.sql.functions.col
    val docs = graft.sources.Tables.read(spark, "/root/testdata/sf0.001", "documents")
    val census = CurationOps.curationFunnel(docs, 30, 0.8, 13).collect().head
    val corpus = CurationOps.curationCorpus(docs, 30, 0.8, 13)
    assert(corpus.count() == census.getLong(4),
      s"corpus count must equal the census n_sampled: $census")
    // survivors carry the original schema, and every survivor passes the
    // stages it claims: over the word bar and inside the sample gate
    assert(corpus.columns.toSeq == docs.columns.toSeq)
    val bad = corpus.filter(
      org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.lower(col("text")), " ")) < 30).count()
    assert(bad == 0L, "a surviving doc under the quality bar")
    // deterministic: two runs, same ids
    val ids1 = corpus.select(col("doc_id")).collect().map(_.getLong(0)).sorted.toSeq
    val ids2 = CurationOps.curationCorpus(docs, 30, 0.8, 13)
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted.toSeq
    assert(ids1 == ids2)
  }

  test("decontamination: flagged docs really share >= minShared shingles with the benchmark") {
    import graft.operators.DedupOps
    val census = CurationOps.decontaminate(docs, benchMod = 7, minShared = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(census.nonEmpty)
    // recompute one language's contamination by brute force
    val (lang, nDocs, nContaminated, maxOverlap) = census.maxBy(_._3)
    val bench = docs.filter(col("doc_id") % 7 === 0)
      .select(explode(DedupOps.shingles(col("text"))).as("s")).distinct()
      .collect().map(_.getString(0)).toSet
    val corpus = docs.filter(col("doc_id") % 7 =!= 0).filter(col("lang") === lang)
      .select(col("doc_id"), DedupOps.shingles(col("text")).as("sh"))
      .collect()
      .map(r => r.getSeq[String](1).count(bench.contains))
    assert(corpus.length.toLong == nDocs, s"$lang doc count")
    assert(corpus.count(_ >= 3).toLong == nContaminated, s"$lang contaminated count")
    assert(corpus.max.toLong == maxOverlap, s"$lang max overlap")
  }

  test("sourceOverlapMatrix by hand; a 3-source shingle expands to all three pairs") {
    // s1: {a b c, b c d, c d e, d e g}  n=4
    // s2: {a b c, b c d, c d e}         n=3
    // s3: {x y z, c d e, d e f}         n=3
    // "c d e" lives in ALL THREE sources — the set-expansion must emit all
    // three ordered pairs from the one per-shingle row.
    val d = docsOf(
      (1L, "a b c d", "en", "s1"), (5L, "c d e g", "en", "s1"),
      (2L, "a b c d e", "en", "s2"),
      (3L, "x y z", "en", "s3"), (4L, "c d e f", "en", "s3"))
    val r = CurationOps.sourceOverlapMatrix(d).collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2), x.getLong(3), x.getLong(4))).toSeq
    assert(r == Seq(
      ("s1", "s2", 3L, 4L, 3L),
      ("s1", "s3", 1L, 4L, 3L),
      ("s2", "s3", 1L, 3L, 3L)), r.mkString(","))
  }

  test("decontaminateFrac: the SAME absolute quote flags a tweet but not a book") {
    // benchmark doc 0 contributes the quote's shingles; doc 1 is a short
    // doc that is mostly quote (high fraction), doc 2 buries the identical
    // quote in a long document (low fraction). An absolute-count rule
    // (x21's) cannot separate them — the fractional rule exists for this.
    val quote = "alpha beta gamma delta epsilon zeta eta theta"
    val filler = (0 until 200).map(i => s"fill$i").mkString(" ")
    val d = docsOf(
      (0L, quote, "en", "bench"), // benchMod 3: only doc 0 is benchmark
      (4L, s"$quote tiny tail", "en", "s"),
      (5L, s"$filler $quote", "en", "s"))
    val got = CurationOps.decontaminateFrac(d, benchMod = 3, fracPermille = 300L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val (lang, nDocs, nCont, maxPm) = got.head
    assert(lang == "en" && nDocs == 2L, got.mkString(","))
    assert(nCont == 1L, s"only the mostly-quote doc crosses 30%: ${got.mkString(",")}")
    assert(maxPm >= 300L && maxPm <= 1000L, s"severity in permille: $maxPm")
    // the absolute rule at the same shingle count flags BOTH (the quote
    // contributes the same ~6 shared shingles to each)
    val abs = CurationOps.decontaminateAgainst(
        d.filter(col("doc_id") % 3 =!= 0), d.filter(col("doc_id") % 3 === 0), 3)
      .collect().map(r => (r.getString(0), r.getLong(2))).head
    assert(abs._2 == 2L, s"absolute rule flags both: $abs")
  }
}
