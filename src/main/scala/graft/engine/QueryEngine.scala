package graft.engine

import java.util.UUID

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/**
 * Execution-client facade — the Spark re-expression of the reference's five
 * public verbs (SURVEY.md §2.1, reference `snowflake_utils/
 * snowflake_query_client.py:118-336`):
 *
 *  - V1 `executeScalarQuery`      — scalar result (COUNT/MAX/SUM)
 *  - V2 `fetchAllRowsAsDataFrame` — full result as a DataFrame
 *  - V3 `fetchAllRowsAsTuples`    — driver-side Array[Row]
 *  - V4 `executeDmlQuery`         — INSERT/…, returns rows affected
 *  - V5 `executeControlCommand`   — DDL / control, no rows
 *
 * Each call returns the result together with a `queryId` (the analogue of the
 * Snowflake `sfqid`, reference `snowflake_query_client.py:154,200,245,287,331`).
 * The id is also installed as the Spark job group so Spark-UI jobs correlate
 * with engine calls.
 *
 * Named parameter binding (`%(name)s` in the reference, e.g.
 * `overlap_checks.py:52-55`) maps to Spark named parameterized SQL
 * (`spark.sql(text, args)`), which also closes the reference's SQL-injection
 * defect (`snowflake_tasks.py:525-537` interpolates a raw string).
 */
final class QueryEngine(val spark: SparkSession) {

  /** Result wrapper mirroring the reference's `{"query_id": ..., "data": ...}`. */
  final case class EngineResult[T](queryId: String, data: T)

  private def withQueryId[T](desc: String)(body: => T): EngineResult[T] = {
    val queryId = UUID.randomUUID().toString
    spark.sparkContext.setJobGroup(queryId, desc, interruptOnCancel = true)
    try EngineResult(queryId, body)
    finally spark.sparkContext.clearJobGroup()
  }

  private def run(sql: String, params: Map[String, Any], database: Option[String]): DataFrame = {
    // Per-call `USE DATABASE/SCHEMA` scoping (reference verb V7). Name
    // resolution happens eagerly inside spark.sql (analysis), so the
    // previous database can be restored immediately after — the scope really
    // is per-call, it does not leak into subsequent calls.
    val prev = database.map(_ => spark.catalog.currentDatabase)
    database.foreach(db => spark.catalog.setCurrentDatabase(db))
    try if (params.isEmpty) spark.sql(sql) else spark.sql(sql, params)
    finally prev.foreach(spark.catalog.setCurrentDatabase)
  }

  /** V1: run SQL, return the single scalar of the first row (or None if empty). */
  def executeScalarQuery(
      sql: String,
      params: Map[String, Any] = Map.empty,
      database: Option[String] = None): EngineResult[Option[Any]] =
    withQueryId(s"scalar: ${sql.take(120)}") {
      run(sql, params, database).limit(1).collect().headOption.map(_.get(0))
    }

  /** V2: run SQL, return the (lazy) DataFrame — caller decides when to collect. */
  def fetchAllRowsAsDataFrame(
      sql: String,
      params: Map[String, Any] = Map.empty,
      database: Option[String] = None): EngineResult[DataFrame] =
    withQueryId(s"fetch_df: ${sql.take(120)}") { run(sql, params, database) }

  /** V3: run SQL, materialize on the driver as rows (reference `fetchall`). */
  def fetchAllRowsAsTuples(
      sql: String,
      params: Map[String, Any] = Map.empty,
      database: Option[String] = None): EngineResult[Array[Row]] =
    withQueryId(s"fetch_rows: ${sql.take(120)}") { run(sql, params, database).collect() }

  /**
   * V4: DML, returning rows affected. Spark surfaces the count through the
   * write command's `numOutputRows` SQL metric; commands execute eagerly
   * inside `spark.sql`, so the metric is read synchronously off the executed
   * command plan (SURVEY.md §4.3 — the one place Spark doesn't hand us the
   * number directly).
   */
  def executeDmlQuery(
      sql: String,
      params: Map[String, Any] = Map.empty,
      database: Option[String] = None): EngineResult[Long] =
    withQueryId(s"dml: ${sql.take(120)}") {
      val df = run(sql, params, database)
      df.collect()
      val root = df.queryExecution.executedPlan match {
        case c: org.apache.spark.sql.execution.CommandResultExec => c.commandPhysicalPlan
        case p => p
      }
      root.metrics.get("numOutputRows").map(_.value)
        .orElse(root.collect {
          case p if p.metrics.contains("numOutputRows") => p.metrics("numOutputRows").value
        }.headOption)
        .getOrElse(-1L)
    }

  /** V5: DDL / control command; no rows, query id only. */
  def executeControlCommand(
      sql: String,
      database: Option[String] = None): EngineResult[Unit] =
    withQueryId(s"control: ${sql.take(120)}") {
      run(sql, Map.empty, database)
      ()
    }

  /**
   * V6: liveness — the reference lazily reconnects a closed connection
   * (`snowflake_query_client.py:107-116`); the Spark analogue is checking the
   * context is alive (a stopped session cannot be revived in-place).
   */
  def isActive: Boolean = !spark.sparkContext.isStopped
}
