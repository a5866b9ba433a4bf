package graft

import graft.operators.TextOps

/** Hand-computed fixtures for the corpus-intrinsic scoring operators:
  * the bigram-LM perplexity proxy (x79) and shingle novelty (x80). */
class TextScoringSpec extends SparkSpec {

  test("langMixCensus: bilingual doc flags; monolingual evidence never does") {
    // doc 1: 4 en hits + 3 de hits → second·1000 = 3000 ≥ 500·4 → mixed.
    // doc 2: en only → second 0. doc 3: de hits below minHits (2 < 3).
    val d = docsOf(
      (1L, "the a of and der die das x y z", "en", "s"),
      (2L, "the a of and just english words", "en", "s"),
      (3L, "the a of and der die x y z w", "en", "s"))
    val r = graft.operators.TextOps.langMixCensus(d, 3L, 500L).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toSeq
    assert(r == Seq(("en", 3L, 1L)), r.mkString(","))
  }

  test("bigramLmScore: add-one bigram NLL, fixed-point weights, hand-checked") {
    // doc1 "a b a b": bigrams (a,b) x2, (b,a).  doc2 "a c": (a,c).
    // V = |{a,b,c}| = 3; context counts c1: a=3, b=1.
    //   w(a,b) = floor(ln((2+1)/(3+3))*1e6+0.5) = floor(ln(.5)*1e6+0.5)  = -693147
    //   w(b,a) = floor(ln((1+1)/(1+3))*1e6+0.5) = floor(ln(.5)*1e6+0.5)  = -693147
    //   w(a,c) = floor(ln((1+1)/(3+3))*1e6+0.5) = floor(ln(1/3)*1e6+0.5) = -1098612
    // doc1: n=3, nll_micro = 3*693147 = 2079441, avg = 0.693147
    // doc2: n=1, nll_micro = 1098612,            avg = 1.098612
    val docs = docsOf(
      (1L, "a b a b", "en", "s"),
      (2L, "a c", "en", "s"))
    val rows = TextOps.bigramLmScore(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSeq == Seq(
      (1L, 3L, 2079441L, 2079441d / 3e6),
      (2L, 1L, 1098612L, 1098612d / 1e6)), rows.mkString(","))
  }

  test("bigramLmScore: single-token and empty docs are excluded (no bigrams)") {
    val docs = docsOf((1L, "only", "en", "s"), (2L, "x y", "en", "s"))
    val rows = TextOps.bigramLmScore(docs).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(2L), rows.mkString(","))
  }

  test("noveltyCensus: first-occurrence fractions, short-doc fallback shingle") {
    // doc1 "a b c d" -> {"a b c","b c d"}: both first          -> 2/2 = 1.0
    // doc2 "a b c"   -> {"a b c"}: seen in doc1                -> 0/1 = 0.0
    // doc3 "b c d e" -> {"b c d","c d e"}: one old, one new    -> 1/2 = 0.5
    // doc4 "x y"     -> whole-text shingle {"x y"}: new        -> 1/1 = 1.0
    val docs = docsOf(
      (1L, "a b c d", "en", "s"),
      (2L, "a b c", "en", "s"),
      (3L, "b c d e", "en", "s"),
      (4L, "x y", "en", "s"))
    val rows = TextOps.noveltyCensus(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSeq == Seq(
      (1L, 2L, 2L, 1.0), (2L, 1L, 0L, 0.0),
      (3L, 2L, 1L, 0.5), (4L, 1L, 1L, 1.0)), rows.mkString(","))
  }

  test("pmiCollocations: quantized PMI, (w1,w2) tie-break, hand-checked") {
    // tokens: new=3 york=3 a=1 b=1 (Nu=8); bigrams Nb=6:
    //   (new,york)x2 (york,new) (a,new) (new,b) (b,york)
    //   pmi(a,new)=pmi(new,b)=pmi(b,york) = ln(64/18) -> 1268511
    //   pmi(new,york) = ln(2*64/54)       -> 863046
    //   pmi(york,new) = ln(64/54)         -> 169899
    val docs = docsOf(
      (1L, "new york new york", "en", "s"),
      (2L, "a new b york", "en", "s"))
    val rows = TextOps.pmiCollocations(docs, minCount = 1L).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.toSeq == Seq(
      ("a", "new", 1L, 1L, 3L, 1268511L),
      ("b", "york", 1L, 1L, 3L, 1268511L),
      ("new", "b", 1L, 3L, 1L, 1268511L),
      ("new", "york", 2L, 3L, 3L, 863046L),
      ("york", "new", 1L, 3L, 3L, 169899L)), rows.mkString(","))
  }

  test("pmiCollocations: minCount prunes rare pairs, k caps the list") {
    val docs = docsOf(
      (1L, "new york new york", "en", "s"),
      (2L, "a new b york", "en", "s"))
    val rows = TextOps.pmiCollocations(docs, minCount = 2L, k = 1).collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("new", "york")), rows.mkString(","))
  }

  test("noveltyCensus: repeated shingle within one doc counts once (distinct)") {
    // "p q r p q r p q r" -> distinct shingles {"p q r","q r p","r p q"};
    // all three first here -> 3/3, NOT 7 occurrence rows.
    val docs = docsOf((1L, "p q r p q r p q r", "en", "s"))
    val r = TextOps.noveltyCensus(docs).collect().head
    assert((r.getLong(1), r.getLong(2), r.getDouble(3)) == ((3L, 3L, 1.0)), r.toString)
  }

  test("tokenEntropy: exact integer numerator over quantized logs, hand-checked") {
    // "a a a a b b c d": n=8, sce = 4*ln4µ + 2*ln2µ = 6931470,
    // ent_num = 8*2079442 - 6931470 = 9704066 -> entropy 1.21300825
    // uniform "p q r s": every count 1 -> sce 0, H = ln(4) quantized
    val docs = docsOf(
      (1L, "a a a a b b c d", "en", "s"),
      (2L, "p q r s", "en", "s"),
      (3L, "z z z z", "en", "s")) // degenerate: H exactly 0
    val rows = TextOps.tokenEntropy(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.toSeq == Seq(
      (1L, 8L, 6931470L, 9704066L, 1.21300825),
      (2L, 4L, 0L, 4L * 1386294L, 1.386294),
      (3L, 4L, 4L * 1386294L, 0L, 0.0)), rows.mkString(","))
  }

  test("vocabGrowth: first-occurrence prefix counts at power-of-two checkpoints") {
    // doc0 {a,b}, doc10 {b,c}, doc20 {c,d,e}:
    //   t=16  -> docs {0,10}: tokens 4, vocab {a,b,c} = 3
    //   t>=32 -> all three:   tokens 7, vocab 5
    val docs = docsOf(
      (0L, "a b", "en", "s"), (10L, "b c", "en", "s"), (20L, "c d e", "en", "s"))
    val rows = TextOps.vocabGrowth(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 17 && rows.head == ((16L, 2L, 4L, 3L)), rows.take(3).mkString(","))
    assert(rows.tail.forall { case (_, d, tk, v) => d == 3L && tk == 7L && v == 5L },
      rows.mkString(","))
    assert(rows.map(_._1).toSeq == (4 to 20).map(k => 1L << k), "checkpoint grid")
  }
}
