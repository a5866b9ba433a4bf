package graft.engine

import java.util.UUID

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

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
    // Per-call `USE DATABASE/SCHEMA` scoping (reference verb V7).
    database.foreach(db => spark.catalog.setCurrentDatabase(db))
    if (params.isEmpty) spark.sql(sql) else spark.sql(sql, params)
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
   * executed plan's `numOutputRows` metric, captured via a
   * [[QueryExecutionListener]] for the duration of the command (SURVEY.md §4.3).
   */
  def executeDmlQuery(
      sql: String,
      params: Map[String, Any] = Map.empty,
      database: Option[String] = None): EngineResult[Long] =
    withQueryId(s"dml: ${sql.take(120)}") {
      @volatile var affected = -1L
      val listener = new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
          val n = qe.executedPlan.metrics.get("numOutputRows").map(_.value)
            .orElse(qe.executedPlan.collectLeaves().flatMap(_.metrics.get("numOutputRows")).headOption.map(_.value))
          n.foreach(v => affected = v)
        }
        override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
      }
      spark.listenerManager.register(listener)
      try {
        run(sql, params, database).collect()
        // Listener events post asynchronously; bounded wait for the metric.
        val deadline = System.nanoTime() + 5_000_000_000L
        while (affected < 0 && System.nanoTime() < deadline) Thread.sleep(20)
        affected
      } finally spark.listenerManager.unregister(listener)
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
