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

  /**
   * x126: runtime-filter join — inner equi-join where the fact side is
   * prefiltered ROW-LOCALLY by a Bloom sketch of the dimension side's key
   * set before anything shuffles. The classic 100 TB shape: the dimension
   * is too big to broadcast as a relation (so the join must shuffle) but
   * its KEY SET fits a sketch, and the join is selective — most fact rows
   * match nothing. Without the sketch every fact row pays the shuffle and
   * dies in the join; with it the non-matching majority dies at the scan,
   * and only `matches + fpp · fact` rows reach the exchange. (Spark's own
   * `runtimeFilter.bloomFilter` plans the same rewrite when statistics
   * justify it; this is the explicit operator form with caller-controlled
   * sizing, usable where stats are absent or the filter side is an
   * intermediate the optimizer can't cost.)
   *
   * Exactness: a Bloom sketch has no false negatives, so the prefilter only
   * drops rows the join would drop anyway; false positives die in the exact
   * join. Row-identical to the plain join at ANY fpp (property-tested like
   * the decontamination twin, CurationOps.withBenchOverlapBloom).
   *
   * The sketch is built executor-side (`DataFrameStatFunctions.bloomFilter`
   * merges via treeAggregate; the driver holds one merged sketch), sized by
   * `expectedItems` or a counting pass, capped at
   * [[CurationOps.MaxSketchItems]] so it stays plan-shippable — past the
   * cap the effective fpp rises, selectivity degrades gracefully,
   * correctness never moves.
   */
  def bloomFilteredJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      fpp: Double = 0.03,
      expectedItems: Option[Long] = None): DataFrame = {
    import graft.functions.{BloomContainsLong, GraftFunctions}
    GraftFunctions.register(fact.sparkSession)
    // count() not countDistinct for sizing: duplicates only oversize the
    // sketch (fpp drops below nominal) and skip a distinct shuffle
    val expected = math.min(CurationOps.MaxSketchItems,
      math.max(expectedItems.getOrElse(dim.count()), 1L))
    val bloomBytes = BloomContainsLong.serialize(
      dim.stat.bloomFilter(dimKey, expected, fpp))
    fact
      .filter(GraftFunctions.bloomContainsLong(col(factKey), bloomBytes))
      .join(dim, col(factKey) === col(dimKey))
  }

  /** Top-n heaviest key frequencies — the diagnostic run before deciding to salt. */
  def keySkewProfile(df: DataFrame, key: Column, topN: Int = 10): DataFrame =
    df.groupBy(key.as("key"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("key").asc)
      .limit(topN)
}
