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

  /**
   * O21 UPDATE: status transition on a plain-parquet ledger, rewriting ONLY
   * the day partitions that contain matching rows (the reference issues a
   * Snowflake UPDATE; parquet is immutable, so the engine stages the affected
   * partitions and swaps them in — at 100 TB an update touching one day
   * rewrites that day, not the table). Returns rows affected (V4 contract).
   */
  def updateStatus(
      spark: SparkSession,
      path: String,
      predicate: org.apache.spark.sql.Column,
      newStatus: String): Long =
    rewriteAffectedPartitions(spark, path, predicate) { (ledger, pred) =>
      ledger.withColumn("pipeline_status",
        org.apache.spark.sql.functions.when(pred, newStatus)
          .otherwise(org.apache.spark.sql.functions.col("pipeline_status")))
    }

  /**
   * General UPDATE: apply `SET col = expr` assignments to matching rows,
   * rewriting only the affected day partitions (or the whole table when it
   * has no day partition column). Backs the SQL-text UPDATE path of
   * `QueryEngine.executeDmlQuery`. Assigning the partition column itself is
   * rejected — a row changing partitions needs a delete+insert, not a
   * partition swap.
   */
  def updateWhere(
      spark: SparkSession,
      path: String,
      predicate: org.apache.spark.sql.Column,
      assignments: Seq[(String, org.apache.spark.sql.Column)]): Long = {
    require(assignments.nonEmpty, "UPDATE needs at least one SET assignment")
    require(!assignments.exists(_._1 == "query_window_start_day"),
      "cannot UPDATE the partition column; DELETE + INSERT instead")
    rewriteAffectedPartitions(spark, path, predicate) { (ledger, pred) =>
      // SQL UPDATE semantics: every SET expression and the predicate evaluate
      // against the PRE-update row, so all assignments go into one projection
      // (sequential withColumn would feed each assignment the previous one's
      // output — and a predicate on an updated column would stop matching).
      val assigned = assignments.toMap
      assigned.keys.foreach(c => require(ledger.columns.contains(c),
        s"UPDATE of unknown column $c"))
      ledger.select(ledger.columns.toIndexedSeq.map { c =>
        assigned.get(c)
          .map(v => org.apache.spark.sql.functions.when(pred, v)
            .otherwise(org.apache.spark.sql.functions.col(c)).as(c))
          .getOrElse(org.apache.spark.sql.functions.col(c))
      }: _*)
    }
  }

  /** O21 DELETE: drop matching rows, rewriting only their day partitions. */
  def deleteWhere(
      spark: SparkSession,
      path: String,
      predicate: org.apache.spark.sql.Column): Long =
    rewriteAffectedPartitions(spark, path, predicate) { (ledger, pred) =>
      // Keep any row the predicate does not POSITIVELY match: a NULL
      // predicate result must retain the row (plain `!pred` is NULL for
      // NULL input and filter would silently delete non-matching rows).
      ledger.filter(!org.apache.spark.sql.functions.coalesce(
        pred, org.apache.spark.sql.functions.lit(false)))
    }

  private def rewriteAffectedPartitions(
      spark: SparkSession,
      path: String,
      predicate: org.apache.spark.sql.Column)(
      transform: (DataFrame, org.apache.spark.sql.Column) => DataFrame): Long = {
    import org.apache.spark.sql.functions.col
    val ledger = read(spark, path)
    val matched = ledger.filter(predicate)
    if (!ledger.columns.contains("query_window_start_day"))
      return rewriteWholeTable(spark, path, ledger, matched, predicate)(transform)
    // Affected partition values: a day-count-sized driver list, never data.
    val days = matched.select(col("query_window_start_day")).distinct()
      .collect().map(_.get(0).toString)
    if (days.isEmpty) return 0L
    val affected = matched.count()
    val slice = ledger.filter(col("query_window_start_day").isin(days: _*))
    // Swap through the Hadoop FileSystem of the table's scheme — the same
    // rewrite runs on file://, HDFS, or an object-store connector.
    val base = new org.apache.hadoop.fs.Path(path)
    val fs = base.getFileSystem(spark.sessionState.newHadoopConf())
    val staging = new org.apache.hadoop.fs.Path(base.getParent,
      s"${base.getName}_staging_${java.util.UUID.randomUUID().toString.take(8)}")
    transform(slice, predicate).write
      .mode(SaveMode.Overwrite).partitionBy("query_window_start_day")
      .parquet(staging.toString)
    // Swap the rewritten partitions in; untouched days keep their files.
    days.foreach { d =>
      val name = s"query_window_start_day=$d"
      val fresh = new org.apache.hadoop.fs.Path(staging, name)
      val dest = new org.apache.hadoop.fs.Path(base, name)
      if (fs.exists(dest)) fs.delete(dest, true)
      // DELETE may remove a whole partition: only move what staging produced.
      if (fs.exists(fresh)) fs.rename(fresh, dest)
    }
    fs.delete(staging, true)
    affected
  }

  /** Fallback for tables without the day partition column: stage the
    * transformed table, then swap the whole directory. */
  private def rewriteWholeTable(
      spark: SparkSession,
      path: String,
      ledger: DataFrame,
      matched: DataFrame,
      predicate: org.apache.spark.sql.Column)(
      transform: (DataFrame, org.apache.spark.sql.Column) => DataFrame): Long = {
    val affected = matched.count()
    if (affected == 0L) return 0L
    val base = new org.apache.hadoop.fs.Path(path)
    val fs = base.getFileSystem(spark.sessionState.newHadoopConf())
    val staging = new org.apache.hadoop.fs.Path(base.getParent,
      s"${base.getName}_staging_${java.util.UUID.randomUUID().toString.take(8)}")
    transform(ledger, predicate).write.mode(SaveMode.Overwrite).parquet(staging.toString)
    fs.delete(base, true)
    fs.rename(staging, base)
    affected
  }
}
