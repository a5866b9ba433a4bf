package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.CosineSimilarityF32

/**
 * Similarity search over the `embeddings` table (`array<float>`, 64-dim) and
 * the multimodal join (SURVEY.md §2.3 E2/E4, §2.4).
 *
 * All cosine math goes through the codegen'd [[CosineSimilarityF32]]
 * expression (bit-compatible with the DuckDB oracle, see its scaladoc).
 *
 * Scale design:
 *  - [[topkCosine]] — brute-force scan of the corpus against a broadcast
 *    query vector; `orderBy(...).limit(k)` plans as TakeOrderedAndProject
 *    (per-partition top-k, no global sort) — the exact-baseline path.
 *  - [[annIvf]] — IVF-style two-stage search: assign every vector to its
 *    nearest centroid (small broadcast centroid table), probe only the
 *    `nProbe` centroids nearest the query. At 100 TB the assignment is a
 *    one-off (stored, partitioned by centroid id → probing is partition
 *    pruning); here it is computed inline for determinism.
 */
object SimilarityOps {

  private def cos(a: Column, b: Column): Column =
    call_function("cosine_f32", a, b)

  /** DuckDB-parity rounding: round in float32 space, promote to double. */
  private def round6f(sim: Column): Column =
    (round(sim.cast("double") * lit(1e6)) / lit(1e6)).cast("float").cast("double")

  /** E2: exact top-k cosine neighbours of `queryVecId` (excluded from results). */
  def topkCosine(embeddings: DataFrame, queryVecId: Long = 0L, k: Int = 10): DataFrame = {
    val q = embeddings.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("qvec"))
    embeddings.filter(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), round6f(cos(col("qvec"), col("embedding"))).as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc)
      .limit(k)
  }

  /**
   * Embedding-cosine near-duplicate pairs: all pairs with rounded similarity
   * ≥ threshold. Brute-force all-pairs is the correctness baseline; the scale
   * path bucket-joins via [[annIvf]]-style centroid assignment first.
   */
  def embeddingNearDup(embeddings: DataFrame, threshold: Double = 0.4): DataFrame = {
    val a = embeddings.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"))
    val b = embeddings.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"))
    a.join(b, col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"), round6f(cos(col("emb_a"), col("emb_b"))).as("sim"))
      .filter(col("sim") >= threshold)
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /**
   * IVF approximate nearest-neighbour: centroids are the deterministic subset
   * `vec_id % centroidMod == 0`; every vector is assigned to its cosine-nearest
   * centroid; the query probes the `nProbe` nearest centroids and ranks only
   * vectors assigned there. Deterministic ties: (sim DESC, id ASC) everywhere.
   */
  /** Deterministic IVF centroid table: the vectors with `vec_id % mod == 0`. */
  private def centroids(embeddings: DataFrame, centroidMod: Int): DataFrame =
    embeddings.filter(col("vec_id") % centroidMod === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))

  /** IVF coarse quantizer: nearest centroid per vector (broadcast NL join
    * over a handful of centroids; deterministic (csim DESC, cid ASC) ties).
    * Shared by the inline search and the persisted index so the two can
    * never diverge. */
  private def assignToCentroids(embeddings: DataFrame, cents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val assignW = Window.partitionBy(col("vec_id"))
      .orderBy(col("csim").desc, col("cid").asc)
    embeddings.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("cid"),
        cos(col("embedding"), col("cvec")).as("csim"))
      .withColumn("rn", row_number().over(assignW))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cid"))
  }

  def annIvf(
      embeddings: DataFrame,
      queryVecId: Long = 0L,
      k: Int = 10,
      centroidMod: Int = 40,
      nProbe: Int = 3): DataFrame = {
    val cents = centroids(embeddings, centroidMod)
    val assigned = assignToCentroids(embeddings, cents)
    // probe list: nProbe centroids nearest to the query vector
    val qvec = embeddings.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("qvec"))
    val probes = cents.crossJoin(broadcast(qvec))
      .select(col("cid"), cos(col("qvec"), col("cvec")).as("psim"))
      .orderBy(col("psim").desc, col("cid").asc)
      .limit(nProbe)
      .select(col("cid"))
    assigned
      .join(broadcast(probes), Seq("cid"), "left_semi")
      .filter(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(qvec))
      .select(col("vec_id"), round6f(cos(col("qvec"), col("embedding"))).as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc)
      .limit(k)
  }

  /**
   * The persisted form of the IVF index: the centroid assignment written as
   * parquet `partitionBy(cid)`. Probing then IS partition pruning — a query
   * that touches `nProbe` centroids lists only those directories, so search
   * cost scales with probed cells, not corpus size (verified in
   * SimilarityIndexSpec via the scan's selected-partition count).
   */
  def buildIvfIndex(
      embeddings: DataFrame,
      path: String,
      centroidMod: Int = 40): Unit = {
    val cents = centroids(embeddings, centroidMod)
    // Centroid table persisted BESIDE the index: probe selection reads only
    // this tiny table (O(#centroids)), never the corpus — and recovering
    // centroids from the index itself would lose any centroid whose vector
    // ties into a different cell (e.g. exact-duplicate embeddings).
    cents.write.mode("overwrite").parquet(s"${path}_centroids")
    assignToCentroids(embeddings, cents)
      .write.mode("overwrite").partitionBy("cid").parquet(path)
  }

  /** Query the persisted IVF index: prune to the `nProbe` closest cells.
    * `centroidsPath` defaults to the table [[buildIvfIndex]] wrote. */
  def queryIvfIndex(
      index: DataFrame,
      centroids: DataFrame, // the `${path}_centroids` table (cid, cvec)
      queryVec: DataFrame,  // 1 row: (qvec array<float>)
      queryVecId: Long,
      k: Int = 10,
      nProbe: Int = 3): DataFrame = {
    val probes = centroids.crossJoin(broadcast(queryVec))
      .select(col("cid"), cos(col("qvec"), col("cvec")).as("psim"))
      .orderBy(col("psim").desc, col("cid").asc)
      .limit(nProbe)
      // partition-column inference may narrow cid to int on read-back
      .collect().map(_.get(0).toString.toLong)
    index
      .filter(col("cid").isin(probes: _*)) // partition pruning on the index
      .filter(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(queryVec))
      .select(col("vec_id"), round6f(cos(col("qvec"), col("embedding"))).as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc)
      .limit(k)
  }

  /** E4: multimodal join — text corpus ⋈ embedding store on id, grouped counts. */
  def multimodalJoin(documents: DataFrame, embeddings: DataFrame): DataFrame =
    documents.join(embeddings, col("doc_id") === col("vec_id"))
      .groupBy(col("lang"), col("label"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("label"))
}
