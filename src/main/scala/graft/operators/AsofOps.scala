package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of (point-in-time) join — an operator Spark lacks natively. For each
 * left row, attach the right row with the greatest `rightTs <= leftTs`
 * within the same key group (the DuckDB/kdb `ASOF JOIN` semantics, inclusive).
 *
 * Implementation is a composition of built-ins (the preferred extension
 * route, SURVEY.md §4.3 ladder): tag both inputs, union them, and run one
 * `last(_, ignoreNulls)` window per attached column, partitioned by the join
 * keys and ordered by (ts, side) with right rows sorting before left rows at
 * equal timestamps — so an exactly-simultaneous right row is visible to the
 * left row, matching the inclusive `>=`. Cost: one shuffle on the keys and a
 * per-key sort; no range explosion, no nested loop; distributes across any
 * number of key groups, which is what survives 100 TB (a broadcast-range
 * approach would not).
 *
 * Requirement: right rows are unique per (keys, rightTs) — pre-aggregate the
 * right side otherwise (ties would be resolved arbitrarily).
 */
object AsofOps {

  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // The attached columns travel as ONE struct: `last(_, ignoreNulls)` then
    // skips left rows (struct null) but never a matched right ROW — carrying
    // each column independently would back-fill a legitimately-NULL right
    // field from an older right row, fabricating a row that never existed.
    val rStructType = org.apache.spark.sql.types.StructType(
      rightCols.map(c => right.schema(c)))
    val taggedLeft = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .select((keys.map(col) :+ col("__ts") :+ col("__side")) ++
        leftCols.filterNot(keys.contains).map(col) :+
        lit(null).cast(rStructType).as("__r"): _*)
    val taggedRight = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .select((keys.map(col) :+ col("__ts") :+ col("__side")) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightCols.map(col): _*).as("__r"): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedLeft.unionByName(taggedRight)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightCols.map(c => col(s"__r.$c").as(c)): _*)
  }
}
