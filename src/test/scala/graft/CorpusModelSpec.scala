package graft

import graft.operators.{CurationOps, PrepOps}

/** Hand-computed fixtures for the corpus-model operators: the Naive Bayes
  * quality classifier (x81) and the per-source KL drift monitor (x82). */
class CorpusModelSpec extends SparkSpec {

  test("nbQualityScore: weights, prior, and scores hand-checked; generalizes past the rules") {
    // minWords=2: labels from the x45 rule conjunction.
    //   doc1 "alpha bravo candy delta echos"  n=5,u=5,dm=1 -> weak GOOD
    //   doc2 "alpha alpha alpha alpha alpha"  dm=5, 5*5>5  -> weak BAD (dom)
    //   doc3 "bravo candy delta"              n=3, 5*1>3   -> weak BAD (dom)
    // Token counts: cg(alpha)=1 cb(alpha)=5; bravo/candy/delta cg=1 cb=1;
    // echos cg=1 cb=0.  ng=5 nb=8 V=5.
    //   wt(alpha) = floor((ln(2/10)-ln(6/13))*1e6+0.5) = -836248
    //   wt(bravo/candy/delta) = floor(ln(1.3)*1e6+0.5) =  262364
    //   wt(echos) = floor(ln(2.6)*1e6+0.5)             =  955511
    // prior = floor((ln(2/5)-ln(3/5))*1e6+0.5)         = -405465
    //   doc1: -836248+3*262364+955511-405465 =  500890 -> pred GOOD
    //   doc2: 5*(-836248)-405465             = -4586705 -> pred BAD
    //   doc3: 3*262364-405465                =  381627 -> pred GOOD:
    // the classifier passes a doc the dom rule failed only for being short —
    // its tokens live in good company. That grading is the point of x81.
    val docs = docsOf(
      (1L, "alpha bravo candy delta echos", "en", "s"),
      (2L, "alpha alpha alpha alpha alpha", "en", "s"),
      (3L, "bravo candy delta", "en", "s"))
    val rows = PrepOps.nbQualityScore(docs, minWords = 2).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(rows.toSeq == Seq(
      (1L, true, 5L, 500890L, true),
      (2L, false, 5L, -4586705L, false),
      (3L, false, 3L, 381627L, true)), rows.mkString(","))
  }

  test("sourceDriftKl: per-source KL from the corpus mix, hand-checked") {
    // s1: tokens a,a,b (N_s=3); s2: b,c (N_s=2).  c_w: a=2 b=2 c=1, N=5.
    //   s1: a: 2*floor(ln(10/6)*1e6+.5)=2*510826; b: floor(ln(5/6)*1e6+.5)=-182322
    //       kl_micro = 1021652-182322 = 839330
    //   s2: b: floor(ln(5/4)*1e6+.5)=223144; c: floor(ln(5/2)*1e6+.5)=916291
    //       kl_micro = 1139435
    val docs = docsOf(
      (1L, "a a b", "en", "s1"),
      (2L, "b c", "en", "s2"))
    val rows = CurationOps.sourceDriftKl(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.toSeq == Seq(
      ("s1", 3L, 2L, 839330L, 839330d / 3e6),
      ("s2", 2L, 2L, 1139435L, 1139435d / 2e6)), rows.mkString(","))
  }

  test("sourceDriftKl: a source matching the corpus distribution has zero drift") {
    // Identical texts -> every per-token ratio is 1, ln=0, wq=floor(0.5)=0.
    val docs = docsOf(
      (1L, "x y z", "en", "s1"),
      (2L, "x y z", "en", "s2"))
    val rows = CurationOps.sourceDriftKl(docs).collect()
    assert(rows.forall(r => r.getLong(3) == 0L && r.getDouble(4) == 0.0),
      rows.mkString(","))
  }
}
