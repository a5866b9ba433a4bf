package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew mitigation utilities (SURVEY.md §"Optimize for scale": skewed keys →
 * salting or AQE skew-join).
 *
 * AQE's skew-join handles skewed SHUFFLE joins by splitting oversized
 * partitions, but only after the fact and only for sort-merge joins.
 * [[saltedJoin]] is the explicit form for the pathological case — a handful
 * of hot keys owning a large share of the fact side: the fact rows are
 * spread across `saltBuckets` sub-keys with a deterministic salt derived
 * from row content, and the (small) dimension side is replicated once per
 * bucket, so a hot key's rows land on `saltBuckets` reducers instead of one.
 */
object SkewOps {

  /**
   * Inner equi-join `fact.factKey == dim.dimKey` with salted key spreading.
   * Result is row-identical to the plain join (property-tested); use when a
   * shuffle join is unavoidable (dimension too big to broadcast) and key
   * skew concentrates reducers.
   *
   * The salt is `pmod(xxhash64(all fact columns), saltBuckets)` —
   * deterministic, so retries/speculative tasks agree on placement.
   */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      saltBuckets: Int = 8): DataFrame = {
    require(saltBuckets > 0)
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(fact.columns.map(col).toIndexedSeq: _*), lit(saltBuckets)))
    val expandedDim = dim
      .withColumn("__salt", explode(array((0 until saltBuckets).map(lit): _*)))
    salted
      .join(expandedDim,
        salted(factKey) === expandedDim(dimKey) &&
          salted("__salt") === expandedDim("__salt"))
      .drop("__salt")
  }

  /** Top-n heaviest key frequencies — the diagnostic run before deciding to salt. */
  def keySkewProfile(df: DataFrame, key: Column, topN: Int = 10): DataFrame =
    df.groupBy(key.as("key"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("key").asc)
      .limit(topN)
}
