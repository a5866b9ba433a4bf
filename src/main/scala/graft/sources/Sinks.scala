package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * Result-sink surface. The reference's only sinks are Snowflake tables (via
 * INSERT) and driver-side result objects; the engine's durable sinks are the
 * columnar/table formats Spark serves natively. Parquet is the primary
 * format (columnar, predicate/pushdown-friendly, the only sane choice at
 * 100 TB); csv/json exist for interchange at the result edge, not for
 * at-scale storage.
 */
object Sinks {

  /** Write with optional partition columns; format ∈ parquet|csv|json|orc. */
  def write(
      df: DataFrame,
      path: String,
      format: String = "parquet",
      partitionBy: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode).format(format)
    val wp = if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w
    val wh = if (format == "csv") wp.option("header", "true") else wp
    wh.save(path)
  }

  def read(spark: SparkSession, path: String, format: String = "parquet"): DataFrame = {
    val r = spark.read.format(format)
    val rh = if (format == "csv")
      r.option("header", "true").option("inferSchema", "true") else r
    rh.load(path)
  }

  /** Register a DataFrame as a saved table in the session catalog (V5/O20 twin). */
  def saveAsTable(df: DataFrame, table: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).saveAsTable(table)
  }

  /**
   * Bucketed + sorted table for co-located joins: two tables bucketed the
   * same way on their join key sort-merge-join with NO exchange — the
   * pre-shuffle is paid once at write time, then every subsequent join of
   * the 100 TB fact tables skips the shuffle entirely (verified by the
   * absence of Exchange nodes in PlanQualitySpec).
   */
  def saveAsBucketedTable(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int = 32): Unit =
    df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)
}
