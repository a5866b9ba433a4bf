package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{DedupOps, SimilarityOps}

/**
 * The capped semantic-dedup generator ([[SimilarityOps.semanticDedupPairs]]):
 * exact-duplicate collapse + clique≤cap ∪ star>cap per paired cell. Locks the
 * two guarantees its Scaladoc claims — provably identical components under
 * exact replication, and bounded star behaviour when the cap engages — plus
 * the census that quantifies both.
 */
class SemanticDedupSpec extends SparkSpec {

  private def toDf(rows: Seq[(Long, Seq[Float])]): DataFrame = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
  }

  /** `nClusters` tight clusters of `per` near-identical members around
    * orthogonal-ish centers (cross-cluster cosine ≈ 0), plus `loners`
    * isolated random vectors. */
  private def clustered(seed: Int, nClusters: Int, per: Int, loners: Int,
      noise: Float): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val dim = 16
    val centers = (0 until nClusters).map { c =>
      Array.tabulate(dim)(i => if (i == c) 1f else 0f)
    }
    var id = -1L
    val members = for {
      c <- 0 until nClusters
      _ <- 0 until per
    } yield {
      id += 1
      (id, centers(c).map(x => x + noise * rnd.nextGaussian().toFloat).toSeq)
    }
    val lone = (0 until loners).map { _ =>
      id += 1
      (id, Array.fill(dim)(rnd.nextGaussian().toFloat).toSeq)
    }
    toDf(members ++ lone)
  }

  /** Brute-force ground truth survivors: all-pairs edges → components →
    * keep each component's min vec_id. */
  private def bruteSurvivors(emb: DataFrame, threshold: Double): Set[Long] = {
    val pairs = SimilarityOps.embeddingNearDupBrute(emb, threshold)
      .select(col("vec_a"), col("vec_b"))
    val comp = DedupOps.connectedComponentsAdaptive(pairs, "vec_a", "vec_b")
    val losers = comp.filter(col("component") =!= col("doc_id"))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    emb.select(col("vec_id")).collect().map(_.getLong(0)).toSet -- losers
  }

  private def cappedSurvivors(emb: DataFrame, threshold: Double, mod: Int,
      cap: Int): Set[Long] =
    SimilarityOps.semanticDedupCorpus(emb, threshold, mod, cap)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet

  test("exact replication: capped survivors equal brute survivors (the collapse proof)") {
    graft.functions.GraftFunctions.register(spark)
    for (seed <- 1 to 2) {
      val base = clustered(seed, 3, 4, 6, noise = 0.05f)
      // replicate 5x with an id stride, exactly like the sf1 scale probe
      val rep = (0 until 5).map(r =>
        base.select((col("vec_id") + lit(r * 1000L)).as("vec_id"), col("embedding")))
        .reduce(_ unionByName _)
      val want = bruteSurvivors(rep, 0.8)
      // default cap: never engages at this size — equality is the theorem
      assert(cappedSurvivors(rep, 0.8, 7, SimilarityOps.DefaultMaxCellPairSize) == want,
        s"seed=$seed: collapse must preserve components exactly")
    }
  }

  test("random distinct corpus: capped pairs close into the brute components") {
    graft.functions.GraftFunctions.register(spark)
    for (seed <- 3 to 4; threshold <- Seq(0.4, 0.8)) {
      val emb = clustered(seed, 4, 5, 10, noise = 0.1f)
      assert(cappedSurvivors(emb, threshold, 7, SimilarityOps.DefaultMaxCellPairSize)
          == bruteSurvivors(emb, threshold),
        s"seed=$seed t=$threshold: capped components diverge from brute")
    }
  }

  test("tiny cap engages the star path and still recovers tight duplicate clusters") {
    graft.functions.GraftFunctions.register(spark)
    // noise small enough that every member verifies against any other member
    // of its cluster (pairwise sim >> 0.8): the star edge set has the same
    // transitive closure as the clique, so survivors match brute even when
    // every bucket caps.
    val emb = clustered(11, 3, 8, 4, noise = 0.01f)
    val want = bruteSurvivors(emb, 0.8)
    val got = cappedSurvivors(emb, 0.8, 7, cap = 2)
    assert(got == want, "star path must preserve tight-cluster components")
  }

  test("semanticCapCensus: collapse ratio, cap engagement, zero disagreement at default cap") {
    graft.functions.GraftFunctions.register(spark)
    val base = clustered(21, 3, 4, 6, noise = 0.05f)
    val rep = (0 until 3).map(r =>
      base.select((col("vec_id") + lit(r * 1000L)).as("vec_id"), col("embedding")))
      .reduce(_ unionByName _)
    val row = SimilarityOps.semanticCapCensus(rep, 0.8, 7).collect().head
    assert(row.getAs[Long]("n_vecs") === 54L)
    assert(row.getAs[Long]("n_groups") === 18L, "3x exact replicas collapse 3:1")
    assert(row.getAs[Long]("n_capped") === 0L, "default cap must not engage here")
    assert(row.getAs[Long]("n_disagree") === 0L,
      "uncapped buckets => survivor sets provably identical")
    assert(row.getAs[Long]("survivors_exact") === row.getAs[Long]("survivors_capped"))
    // force the star path: census must report the engagement
    val forced = SimilarityOps.semanticCapCensus(rep, 0.8, 7, maxCellPairSize = 2)
      .collect().head
    assert(forced.getAs[Long]("n_capped") > 0L, "cap=2 must cap some bucket")
  }

  test("semanticDecontaminate census equals a driver-side brute force over the fixture") {
    val emb = graft.sources.Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
    val evalSet = emb.filter(col("vec_id") % 97 === 0)
    val corpus = emb.filter(col("vec_id") % 97 =!= 0)
    val got = SimilarityOps.semanticDecontaminate(corpus, evalSet, 0.4).collect().head
    def round6(f: Float): Double =
      (math.round(f.toDouble * 1e6) / 1e6).toFloat.toDouble
    val evs = evalSet.select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray)
    assert(evs.nonEmpty, "fixture must yield a non-empty eval slice")
    val flags = corpus.select(col("vec_id"), col("embedding")).collect().map { r =>
      val v = r.getSeq[Float](1).toArray
      (r.getLong(0), evs.exists(e =>
        round6(graft.functions.CosineSimilarityF32.compute(e, v)) >= 0.4))
    }
    assert(got.getAs[Long]("contaminated") === flags.count(_._2).toLong)
    assert(got.getAs[Long]("clean") === flags.count(!_._2).toLong)
    assert(got.getAs[Long]("id_checksum") ===
      flags.filter(_._2).map(_._1).sum)
    // the operator must flag SOMETHING on this fixture, or the gate row
    // would silently degrade to a row-count check of an empty set
    assert(got.getAs[Long]("contaminated") > 0L, "fixture has near-dup clusters")
  }
}
