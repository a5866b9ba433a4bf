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
    rewriteAffectedPartitions(spark, path, predicate, Nil) { _ => (ledger, pred) =>
      ledger.withColumn("pipeline_status",
        org.apache.spark.sql.functions.when(pred, newStatus)
          .otherwise(org.apache.spark.sql.functions.col("pipeline_status")))
    }

  /**
   * General UPDATE: apply `SET col = expr` assignments to matching rows,
   * rewriting only the affected day partitions (or the whole table —
   * preserving its partition layout — when it is not day-partitioned).
   * Backs the SQL-text UPDATE path of `QueryEngine.executeDmlQuery`.
   * `partitionCols` is the table's declared partitioning when the caller
   * knows it (catalog tables); empty means "detect the ledger layout".
   * Assigning a partition column is rejected — a row changing partitions
   * needs a delete+insert, not a partition swap. SET column names resolve
   * case-insensitively, like Spark's default analyzer.
   */
  def updateWhere(
      spark: SparkSession,
      path: String,
      predicate: org.apache.spark.sql.Column,
      assignments: Seq[(String, org.apache.spark.sql.Column)],
      partitionCols: Seq[String] = Nil): Long = {
    require(assignments.nonEmpty, "UPDATE needs at least one SET assignment")
    rewriteAffectedPartitions(spark, path, predicate, partitionCols) { table =>
      // Validation runs against the IN-LEASE table snapshot, before the
      // rewrite's zero-match short-circuit: a malformed statement fails
      // loudly even when zero rows match, and the schema it validates
      // against can never be another writer's mid-swap view. Names resolve
      // case-insensitively, like Spark's default analyzer.
      val assigned = assignments.map { case (name, v) =>
        val resolved = table.columns.filter(_.equalsIgnoreCase(name))
        require(resolved.length == 1,
          s"UPDATE of ${if (resolved.isEmpty) "unknown" else "ambiguous"} column $name")
        resolved.head -> v
      }.toMap
      val parts = effectivePartitionCols(table, partitionCols)
      assigned.keys.foreach(c => require(!parts.exists(_.equalsIgnoreCase(c)),
        s"cannot UPDATE partition column $c; DELETE + INSERT instead"))
      // SQL UPDATE semantics: every SET expression and the predicate evaluate
      // against the PRE-update row, so all assignments go into one projection
      // (sequential withColumn would feed each assignment the previous one's
      // output — and a predicate on an updated column would stop matching).
      (ledger, pred) =>
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
      predicate: org.apache.spark.sql.Column,
      partitionCols: Seq[String] = Nil): Long =
    rewriteAffectedPartitions(spark, path, predicate, partitionCols) { _ => (ledger, pred) =>
      // Keep any row the predicate does not POSITIVELY match: a NULL
      // predicate result must retain the row (plain `!pred` is NULL for
      // NULL input and filter would silently delete non-matching rows).
      ledger.filter(!org.apache.spark.sql.functions.coalesce(
        pred, org.apache.spark.sql.functions.lit(false)))
    }

  /** The table's partition columns: the caller-declared ones, else the
    * ledger's day column if present, else none. */
  private def effectivePartitionCols(
      ledger: DataFrame, declared: Seq[String]): Seq[String] =
    if (declared.nonEmpty) declared
    else if (ledger.columns.contains("query_window_start_day")) Seq("query_window_start_day")
    else Nil

  /** `transformFor` receives the IN-LEASE table snapshot (for validation +
    * schema resolution) and returns the row transform — so no caller ever
    * reads or validates against a pre-lease view of the table. */
  private def rewriteAffectedPartitions(
      spark: SparkSession,
      path: String,
      predicate: org.apache.spark.sql.Column,
      partitionCols: Seq[String])(
      transformFor: DataFrame => (DataFrame, org.apache.spark.sql.Column) => DataFrame): Long = {
    import org.apache.spark.sql.functions.col
    // Writer exclusion for the whole read-stage-swap sequence: the staged
    // swap is only correct single-writer (see WriterLease), and even the
    // predicate evaluation below must not observe another writer's mid-swap
    // state. A second concurrent DML/compaction fails loudly here.
    val base = new org.apache.hadoop.fs.Path(path)
    val fs = base.getFileSystem(spark.sessionState.newHadoopConf())
    Maintenance.requirePlainParquetTable(fs, base)
    WriterLease.withLease(fs, base) {
      val ledger = read(spark, path)
      // resolve the transform FIRST: its validation must fire even when
      // zero rows match and the rewrite below short-circuits
      val transform = transformFor(ledger)
      val matched = ledger.filter(predicate)
      val parts = effectivePartitionCols(ledger, partitionCols)
      // The day-partition swap fast path applies only to the ledger layout
      // (DateType values render exactly as the partition directory names);
      // any other layout takes the whole-table rewrite, which preserves it.
      if (parts != Seq("query_window_start_day"))
        rewriteWholeTable(spark, path, ledger, matched, predicate, parts)(transform)
      else {
        // Affected partition values: a day-count-sized driver list, never data.
        val days = matched.select(col("query_window_start_day")).distinct()
          .collect().map(_.get(0).toString)
        if (days.isEmpty) 0L
        else {
          val affected = matched.count()
          val slice = ledger.filter(
            col("query_window_start_day").isin(days.toIndexedSeq: _*))
          // Swap through the Hadoop FileSystem of the table's scheme — the
          // same rewrite runs on file://, HDFS, or an object-store connector.
          val staging = new org.apache.hadoop.fs.Path(base.getParent,
            s"${base.getName}_staging_${java.util.UUID.randomUUID().toString.take(8)}")
          transform(slice, predicate).write
            .mode(SaveMode.Overwrite).partitionBy("query_window_start_day")
            .parquet(staging.toString)
          // Swap the rewritten partitions in; untouched days keep their
          // files. Displaced old trees go INTO the staging dir (outside the
          // table root, removed at the end) so a crash can never leave a
          // directory that partition discovery would misread as a live
          // partition.
          days.foreach { d =>
            val name = s"query_window_start_day=$d"
            // DELETE may remove a whole partition: only move what staging
            // produced.
            swapIn(fs, new org.apache.hadoop.fs.Path(staging, name),
              new org.apache.hadoop.fs.Path(base, name), staging)
          }
          fs.delete(staging, true)
          affected
        }
      }
    }
  }

  /** Fallback for tables not using the ledger's day layout: stage the
    * transformed table (with the SAME partitionBy columns, so the directory
    * layout survives), then swap the table's CONTENTS. The root directory
    * itself never moves — the writer lease inside it stays valid for the
    * whole operation, and no concurrent acquire can observe a missing root
    * and wedge the restore path by recreating it. */
  private def rewriteWholeTable(
      spark: SparkSession,
      path: String,
      ledger: DataFrame,
      matched: DataFrame,
      predicate: org.apache.spark.sql.Column,
      partitionCols: Seq[String])(
      transform: (DataFrame, org.apache.spark.sql.Column) => DataFrame): Long = {
    val affected = matched.count()
    if (affected == 0L) return 0L
    val base = new org.apache.hadoop.fs.Path(path)
    val fs = base.getFileSystem(spark.sessionState.newHadoopConf())
    val staging = new org.apache.hadoop.fs.Path(base.getParent,
      s"${base.getName}_staging_${java.util.UUID.randomUUID().toString.take(8)}")
    val writer = transform(ledger, predicate).write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(staging.toString)
    swapContents(fs, staging, base)
    fs.delete(staging, true)
    affected
  }

  /**
   * Replace `dest`'s contents with `fresh`'s by moving CHILDREN, leaving
   * `dest` itself (and the [[WriterLease]] file inside it) in place. The
   * displaced old children go into a trash directory INSIDE the staging
   * tree (outside `dest`, removed with it), and every rename is checked: a
   * failure on either phase moves what was already transferred back before
   * rethrowing, so the table is never silently half-swapped. The crash
   * (not failure) window between the two phases leaves `dest` visibly
   * empty with all data intact under staging — loud and recoverable,
   * matching the compaction manifest's philosophy of never duplicating or
   * silently dropping rows.
   */
  private[graft] def swapContents(
      fs: org.apache.hadoop.fs.FileSystem,
      fresh: org.apache.hadoop.fs.Path,
      dest: org.apache.hadoop.fs.Path): Unit = {
    val trash = new org.apache.hadoop.fs.Path(fresh,
      s"_old_${java.util.UUID.randomUUID().toString.take(8)}")
    fs.mkdirs(trash)
    def moveAll(items: Seq[org.apache.hadoop.fs.Path],
        into: org.apache.hadoop.fs.Path): Unit =
      items.foreach { c =>
        if (!fs.rename(c, new org.apache.hadoop.fs.Path(into, c.getName)))
          throw new java.io.IOException(s"cannot move $c into $into")
      }
    // Rollback renames are checked too: a failure during rollback leaves
    // the table visibly half-restored with the rest stranded in staging —
    // that state must be REPORTED (suppressed on the original error), not
    // silently discarded as a boolean.
    def restoreFromTrash(): Unit = {
      val stranded = fs.listStatus(trash).flatMap { s =>
        val dst = new org.apache.hadoop.fs.Path(dest, s.getPath.getName)
        if (!fs.rename(s.getPath, dst)) Some(s.getPath) else None
      }
      if (stranded.nonEmpty)
        throw new java.io.IOException(
          s"ROLLBACK INCOMPLETE: ${stranded.mkString(", ")} stranded in " +
            s"$trash — restore to $dest manually")
    }
    def suppressRollbackFailure(e: java.io.IOException)(rollback: => Unit): Unit =
      try rollback catch { case r: java.io.IOException => e.addSuppressed(r) }
    val old = fs.listStatus(dest).map(_.getPath).toIndexedSeq
      .filterNot(_.getName == WriterLease.LeaseName)
    try moveAll(old, trash)
    catch { case e: java.io.IOException =>
      suppressRollbackFailure(e)(restoreFromTrash()); throw e
    }
    val incoming = fs.listStatus(fresh).map(_.getPath).toIndexedSeq
      .filterNot(_.getName == trash.getName)
    try moveAll(incoming, dest)
    catch {
      case e: java.io.IOException =>
        // pull back any fresh children that made it in, then restore the
        // old — both best-effort so one stuck file cannot abort the rest
        // of the rollback, with everything stranded reported together
        suppressRollbackFailure(e) {
          val stuck = incoming.flatMap { c =>
            val d = new org.apache.hadoop.fs.Path(dest, c.getName)
            if (fs.exists(d) && !fs.rename(d, c)) Some(d) else None
          }
          restoreFromTrash()
          if (stuck.nonEmpty)
            throw new java.io.IOException(
              s"ROLLBACK INCOMPLETE: fresh children ${stuck.mkString(", ")} " +
                s"could not be pulled back out of $dest — recover manually")
        }
        throw e
    }
  }

  /**
   * Replace `dest` with `fresh`, never deleting data before its replacement
   * is in place: the old `dest` is renamed aside first (so a filesystem whose
   * rename fails — e.g. an object store without one — aborts loudly with the
   * data intact), the fresh tree renamed in, and only then the old copy
   * dropped. A failed rename-in restores the old tree before throwing.
   * `trashDir` receives the displaced tree and MUST lie outside the table
   * root (the staging dir, or the table's parent) — a crash between the
   * rename-in and the final delete must not leave a directory that partition
   * discovery would parse as a live partition.
   */
  private def swapIn(
      fs: org.apache.hadoop.fs.FileSystem,
      fresh: org.apache.hadoop.fs.Path,
      dest: org.apache.hadoop.fs.Path,
      trashDir: org.apache.hadoop.fs.Path): Unit = {
    val old = new org.apache.hadoop.fs.Path(trashDir,
      s"${dest.getName}_old_${java.util.UUID.randomUUID().toString.take(8)}")
    val hadOld = fs.exists(dest)
    if (hadOld && !fs.rename(dest, old))
      throw new java.io.IOException(s"cannot move $dest aside; table unchanged")
    if (fs.exists(fresh) && !fs.rename(fresh, dest)) {
      if (hadOld) fs.rename(old, dest)
      throw new java.io.IOException(s"cannot move $fresh into place; table restored")
    }
    if (hadOld) fs.delete(old, true)
  }
}
