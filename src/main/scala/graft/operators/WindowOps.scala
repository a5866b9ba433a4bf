package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/**
 * Distributed window shapes (SURVEY.md §2.3 a5's 100 TB form).
 *
 * A global cumulative sum (`SUM(...) OVER (ORDER BY ...)`) plans as a
 * single-partition WindowExec: the whole fact table funnels through one task.
 * [[runningTotal]] is the classic two-pass prefix sum instead:
 *
 *  1. bucket every row by a coarse, order-aligned key (e.g. the month of the
 *     order date) — any non-decreasing function of the leading order column;
 *  2. aggregate per-bucket partial sums (map-side combine, one row per
 *     bucket) and turn them into exclusive prefix offsets on the driver —
 *     an O(#buckets) list, like a scalar subquery, never data;
 *  3. broadcast the offsets back and run the cumulative window PARTITIONED
 *     by bucket: each partition's running sum plus its bucket offset is
 *     exactly the global running sum.
 *
 * The result is bit-identical to the single-window form (same oracle), but
 * every stage is distributed; the widest window any task sees is one bucket.
 */
object WindowOps {

  /**
   * Exact global running total of `valueCol` (integral) in `orderCols` order.
   *
   * `bucket` MUST be non-decreasing along `orderCols` (bucket boundaries
   * align with the global order), e.g. `date_trunc('month', orderCol)` when
   * the leading order column is the date. Appends `resultName` holding the
   * cumulative sum; all input columns pass through.
   */
  def runningTotal(
      df: DataFrame,
      bucket: Column,
      orderCols: Seq[Column],
      valueCol: Column,
      resultName: String): DataFrame = {
    val spark = df.sparkSession
    val withB = df.withColumn("__bucket", bucket)
    // Pass 1: per-bucket partial sums — a tiny relation (one row per bucket).
    val partials = withB.groupBy(col("__bucket"))
      .agg(sum(valueCol).as("__bsum"))
      .orderBy(col("__bucket"))
      .collect()
    // Exclusive prefix offsets, accumulated in bucket order on the driver.
    var acc = 0L
    val offsetRows = partials.map { r =>
      val o = acc
      acc += (if (r.isNullAt(1)) 0L else r.getLong(1))
      Row(r.get(0), o)
    }
    val bType = withB.schema("__bucket").dataType
    val offsets = spark.createDataFrame(
      spark.sparkContext.parallelize(offsetRows.toIndexedSeq, 1),
      StructType(Seq(StructField("__bucket", bType), StructField("__offset", LongType))))
    // Pass 2: intra-bucket running sum + broadcast bucket offset. The join
    // is NULL-SAFE (<=>): a NULL bucket (NULL leading order column) forms
    // its own group, exactly as the global window would keep those rows —
    // a plain equi-join would silently drop them.
    val w = Window.partitionBy(col("__bucket"))
      .orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    withB.join(broadcast(offsets.withColumnRenamed("__bucket", "__obucket")),
        col("__bucket") <=> col("__obucket"))
      .withColumn(resultName, sum(valueCol).over(w) + col("__offset"))
      .drop("__bucket", "__obucket", "__offset")
  }

  /**
   * Exact `NTILE(k) OVER (ORDER BY orderCols)` semantics WITHOUT the
   * single-partition window that expression plans as: the global 1-based
   * position comes from [[runningTotal]]'s two-pass prefix count (so
   * `bucket` must be a non-decreasing function of the leading order
   * column, e.g. a coarse `value DIV 2^20` bin — integral truncation is
   * monotone for negatives too), and the tile is NTILE's closed form over
   * (position, n): the first `n mod k` tiles take `ceil(n/k)` rows.
   * All-integer (`DIV`), so no float rounding can move a tile edge;
   * matching the real NTILE bit-for-bit in the oracle is the proof the
   * distributed form IS the window.
   *
   * `orderCols` must be a TOTAL order (add a unique id tie-break) — equal
   * keys would otherwise land in runningTotal-order-dependent tiles. The
   * input is read three times (per-bucket partials, the ranked join, and
   * the caller's downstream) — pass a materialized (checkpointed) frame.
   */
  def withGlobalNtile(
      df: DataFrame,
      bucket: Column,
      orderCols: Seq[Column],
      k: Int,
      resultName: String): DataFrame = {
    val ranked = runningTotal(df, bucket, orderCols, lit(1L), "__rank")
    val n = df.agg(count(lit(1)).as("__n"))
    ranked.crossJoin(broadcast(n))
      .withColumn(resultName, expr(
        s"""CASE WHEN __rank <= (__n DIV $k + 1) * (__n % $k)
           |     THEN (__rank + __n DIV $k) DIV (__n DIV $k + 1)
           |     ELSE __n % $k + (__rank - (__n DIV $k + 1) * (__n % $k) + __n DIV $k - 1)
           |          DIV (__n DIV $k)
           |END""".stripMargin))
      .drop("__rank", "__n")
  }
}
