package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.model.Schemas

/**
 * Physical ledger management (SURVEY.md §1.3, §2.2 O20/O21; reference
 * `snowflake_tasks.py:9-62` passes caller DDL through — we own the schema).
 *
 * The ledger is parquet partitioned by `query_window_start_day`: the
 * reference's hand-maintained coarse day-band filter
 * (`overlap_checks.py:52-53`) becomes partition pruning — a day-band query
 * over a 100 TB ledger reads only the in-band partitions, verified by
 * `PartitionFilters` in the scan node (see LedgerTablesSpec).
 */
object LedgerTables {

  /** O20: CREATE TABLE IF NOT EXISTS — day-partitioned parquet in the session catalog. */
  def createDdl(table: String, locationClause: String = ""): String = {
    val cols = Schemas.pipelineRunSchema.fields
      .map(f => s"${f.name} ${f.dataType.sql}").mkString(",\n  ")
    s"""CREATE TABLE IF NOT EXISTS $table (
       |  $cols
       |) USING PARQUET
       |PARTITIONED BY (query_window_start_day)
       |$locationClause""".stripMargin
  }

  def ensure(spark: SparkSession, table: String): Unit =
    spark.sql(createDdl(table))

  /** Write/append a ledger DataFrame as day-partitioned parquet at `path`. */
  def write(ledger: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    ledger.write
      .mode(mode)
      .partitionBy("query_window_start_day")
      .parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
