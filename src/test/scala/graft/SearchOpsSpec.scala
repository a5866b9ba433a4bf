package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.MisraGriesAggregator
import graft.operators.SearchOps

class SearchOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs3(rows: (Long, String, String)*): DataFrame =
    rows.toDF("doc_id", "lang", "text")
      .withColumn("n_chars", length(col("text")))

  test("bm25 ranks the rare-term doc first and breaks ties by doc_id") {
    val d = docs3(
      (1L, "en", "alpha beta gamma delta"),
      (2L, "en", "alpha alpha alpha beta"),
      (3L, "en", "rare beta gamma delta"),
      (4L, "en", "beta gamma delta zeta"),
      (5L, "en", "alpha beta gamma delta")) // same text as doc 1
    val r = SearchOps.bm25TopK(d, Seq("alpha", "rare"), 10).collect()
    // 'rare' has df=1 -> idf (5-1+0.5)/1.5 = 3 vs 'alpha' df=3 -> 1.5/3.5
    assert(r.head.getLong(0) === 3L)
    // docs 1 and 5 have identical text -> identical score, id tie-break
    val ids = r.map(_.getLong(0)).toSeq
    assert(ids.indexOf(1L) < ids.indexOf(5L))
    // doc 4 matches no term -> excluded
    assert(!ids.contains(4L))
  }

  test("textRank: path graph by hand — hub outranks leaves, symmetric leaves tie") {
    // "a b c": edges a↔b, b↔c. W(a)=W(c)=1, W(b)=2. Round 1:
    // r(a)=r(c)=150000+⌊85e6/200⌋=575000; r(b)=150000+2·850000=1850000.
    val d = docs3((1L, "en", "a b c"))
    val r = SearchOps.textRankKeywords(d, iters = 1, k = 3).collect()
      .map(x => (x.getString(0), x.getLong(1))).toSeq
    assert(r == Seq(("b", 1850000L), ("a", 575000L), ("c", 575000L)), r.mkString(","))
    // more rounds keep the hub on top and the symmetric leaves exactly tied
    val r10 = SearchOps.textRankKeywords(d, iters = 10, k = 3).collect()
      .map(x => (x.getString(0), x.getLong(1))).toSeq
    assert(r10.head._1 == "b" && r10(1)._2 == r10(2)._2, r10.mkString(","))
    // a 2-word doc is the exact fixpoint: r stays 1e6 forever
    val fix = SearchOps.textRankKeywords(docs3((1L, "en", "x y")), iters = 7, k = 2)
      .collect().map(_.getLong(1)).toSeq
    assert(fix == Seq(1000000L, 1000000L), fix.mkString(","))
  }

  test("retrieveRerank: results come from the BM25 shortlist, ordered by cosine") {
    graft.functions.GraftFunctions.register(spark)
    val docs = graft.sources.Tables.read(spark, "/root/testdata/sf0.001", "documents")
    val emb = graft.sources.Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
    val terms = Seq("spark", "dup", "vector", "the")
    val shortlist = SearchOps.bm25TopK(docs, terms, 20).collect()
      .map(_.getLong(0)).toSet
    val got = SearchOps.retrieveRerank(docs, emb, terms, 20, 5, 0L).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got.size == 5)
    assert(got.forall { case (id, _) => shortlist.contains(id) },
      "re-ranked ids must come from the shortlist")
    assert(got.map(_._2).sliding(2).forall(p => p.head >= p.last),
      "cosine order must be descending")
  }

  test("triangleCensus: one cycle = one triangle per corner; paths contribute none") {
    // "a b c a": edges a-b, b-c, a-c → exactly one triangle, each corner
    // counted once. "x y z" is a path: zero triangles, absent from output.
    val d = docs3((1L, "en", "a b c a"), (2L, "en", "x y z"))
    val r = SearchOps.triangleCensus(d, 10).collect()
      .map(x => (x.getString(0), x.getLong(1))).toSeq
    assert(r == Seq(("a", 1L), ("b", 1L), ("c", 1L)), r.mkString(","))
  }

  test("sparseTopK: hand-checked inverted-index scoring; no-overlap docs excluded") {
    // df: a→2, b→1, c→1 over 3 docs → idf_milli a=1500, b=3000, c=3000.
    // query (doc 0) w: a=1500, b=3000. doc 1 ("a a"): w_a=3000 →
    // score 3000·1500 = 4.5e6. doc 2 shares nothing → absent.
    val d = docs3((0L, "en", "a b"), (1L, "en", "a a"), (2L, "en", "c"))
    val r = SearchOps.sparseTopK(d, 0L, 10, 1000).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(r == Seq((1L, 4500000L)), r.mkString(","))
    // a permille cap below a's df (2/3 ≈ 667‰) prunes the shared term:
    // nothing scores
    assert(SearchOps.sparseTopK(d, 0L, 10, 600).collect().isEmpty)
  }

  test("bm25 tf saturation: repeating a term gains sublinearly") {
    val d = docs3(
      (1L, "en", "alpha beta gamma delta"),
      (2L, "en", "alpha alpha alpha alpha"),
      (3L, "en", "beta gamma delta zeta"))
    val r = SearchOps.bm25TopK(d, Seq("alpha"), 10).collect()
    val byId = r.map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(byId(2L) > byId(1L))
    assert(byId(2L) < byId(1L) * 4) // saturation, not linear tf
  }

  test("Misra-Gries guarantees hold on skewed and uniform streams") {
    // skewed: 'hot' is >n/(k+1) of the stream; uniform: nothing is heavy
    val streams = Seq(
      (1 to 400).map(_ => "hot") ++ (1 to 30).flatMap(i => Seq(s"t$i", s"u$i")),
      (1 to 50).flatMap(i => (1 to 4).map(_ => s"w$i")))
    for (toks <- streams; k <- Seq(4, 8)) {
      val agg = new MisraGriesAggregator(k)
      // exercise BOTH reduce and merge: fold in 4 chunks, merge pairwise
      val parts = toks.grouped(math.max(1, toks.size / 4)).toSeq
        .map(_.foldLeft(agg.zero)(agg.reduce))
      val sketch = parts.reduce(agg.merge)
      val exact = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = toks.size.toLong
      assert(sketch.size <= k)
      for ((t, c) <- exact if c * (k + 1) > n)
        assert(sketch.contains(t), s"heavy '$t' (cnt=$c, n=$n, k=$k) evicted")
      for ((t, est) <- sketch) {
        val c = exact(t)
        assert(est <= c, s"'$t' overestimated: est=$est > cnt=$c")
        assert((c - est) * (k + 1) <= n,
          s"'$t' underestimate too large: cnt=$c est=$est n=$n k=$k")
      }
    }
  }

  test("heavyHittersVerdict emits all-true verdict with exact totals") {
    val d = docs3(
      (1L, "en", "a a a a a a a a b c"),
      (2L, "en", "a a a a d e f g h i"),
      (3L, "en", "j k l m n o p q r s"))
    val r = SearchOps.heavyHittersVerdict(d, 4).collect().head
    assert(r.getAs[Long]("n_tokens") === 30L)
    assert(r.getAs[Long]("distinct_tokens") === 19L)
    assert(r.getAs[Boolean]("size_ok"))
    assert(r.getAs[Boolean]("heavy_present"))
    assert(r.getAs[Boolean]("estimates_bounded"))
  }

  test("rareTokenCensus: exact mean df and integer-exact rare flag") {
    // 'x' df=3, 'y' df=3, 'z' df=1
    val d = docs3(
      (1L, "en", "x y"),
      (2L, "en", "x y"),
      (3L, "en", "x y z"))
    val r = SearchOps.rareTokenCensus(d, 3L).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[Long]("docs") === 3L)
    assert(row.getAs[Long]("tokens") === 7L)
    // sum_df = 3+3 + 3+3 + 3+3+1 = 19; mean = round(19/7, 6)
    assert(math.abs(row.getAs[Double]("mean_df") - 2.714286) < 1e-6)
    // doc 3: sum_df=7 < 3*3=9 -> rare; docs 1,2: 6 >= 2*3
    assert(row.getAs[Long]("rare_docs") === 1L)
  }

  test("bm25 plan: no join shuffle — broadcast stats + TakeOrderedAndProject") {
    val q = SparkEntry.queries("x56_bm25_topk")(spark, "/root/testdata/sf0.001")
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("tfidfKeywords: quantized idf scores and term tie-break, hand-checked") {
    // N=2. df: apple 1, banana 2, cherry 1.
    //   idfq(apple)=idfq(cherry)=floor(ln(3/2)*1e6+.5)=405465; idfq(banana)=0
    // doc1 "apple banana apple": apple 2*405465=810930 > banana 0
    // doc2 "banana cherry":      cherry 405465 > banana 0
    val d = docsOf(
      (1L, "apple banana apple", "en", "s"),
      (2L, "banana cherry", "en", "s"))
    val rows = SearchOps.tfidfKeywords(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.toSeq == Seq(
      (1L, 1L, "apple", 2L, 1L, 810930L),
      (1L, 2L, "banana", 1L, 2L, 0L),
      (2L, 1L, "cherry", 1L, 1L, 405465L),
      (2L, 2L, "banana", 1L, 2L, 0L)), rows.mkString(","))
  }

  test("tfidfKeywords: k bounds the per-doc list; all-equal scores break by term") {
    val d = docsOf((1L, "b a c e d", "en", "s"))
    val rows = SearchOps.tfidfKeywords(d, k = 3).collect()
      .map(r => (r.getLong(1), r.getString(2)))
    assert(rows.toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c")), rows.mkString(","))
  }

  test("zipfSlope: exact decimal moments of quantized logs, OLS hand-checked") {
    // counts a=4,b=2,c=1 -> ranks 1,2,3; x_micro=[0,693147,1098612],
    // y_micro=[1386294,693147,0] -> slope -1.233661944443767,
    // intercept 1.429955297304873 (python replica, same op order)
    val docs = docsOf((1L, "a a a a b b c", "en", "s"))
    val r = SearchOps.zipfSlope(docs).collect().head
    assert((r.getLong(0), r.getDouble(1), r.getDouble(2))
      == ((3L, -1.233661944443767, 1.429955297304873)), r.toString)
  }

  test("burstiness: VMR with zeros included, hand-checked; ties break by token") {
    // d1 "a a a a", d2 "b", d3 "b" (N=3):
    //   a: s1=4 s2=16 -> (3*16-16)/(3*4) = 8/3 -> 2666667 micro (bursty)
    //   b: s1=2 s2=2  -> (6-4)/6 = 1/3   ->  333333 micro (spread out)
    val docs = docsOf(
      (1L, "a a a a", "en", "s"), (2L, "b", "en", "s"), (3L, "b", "en", "s"))
    val rows = SearchOps.burstiness(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.toSeq == Seq(
      ("a", 1L, 4L, 16L, 2666667L),
      ("b", 2L, 2L, 2L, 333333L)), rows.mkString(","))
  }

  test("zipfSlope: k caps the fit set deterministically across count ties") {
    // six tokens tied at count 1: k=4 keeps the lexicographically first four
    val docs = docsOf((1L, "f e d c b a", "en", "s"))
    val r = SearchOps.zipfSlope(docs, k = 4).collect().head
    assert(r.getLong(0) == 4L, r.toString)
    // all y equal (ln 1 = 0) -> slope exactly 0, intercept exactly 0
    assert(r.getDouble(1) == 0.0 && r.getDouble(2) == 0.0, r.toString)
  }
}
