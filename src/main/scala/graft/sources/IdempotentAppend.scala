package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/**
 * EXACTLY-ONCE parquet append for marker-guarded foreachBatch sinks
 * ([[graft.streaming.CorpusStream]]).
 *
 * `write.mode("append")` alone leaves the marker protocol a crash WINDOW:
 * the marker is written AFTER the append commits, so a restart that lands
 * between the two replays the batch and appends its rows a second time.
 * For an append-log whose consumers `distinct` that is an honest
 * at-least-once contract; for a corpus or an ANN index it is silent
 * corruption — a doc double-weighted in training, a vector surfacing
 * twice in a top-k.
 *
 * The fix is the engine's usual rename discipline, applied per batch:
 *
 *  1. the batch STAGES to a sibling directory with `mode("overwrite")` —
 *     a retry restages the identical rows (foreachBatch replays the same
 *     data by checkpoint contract), so the stage is self-healing;
 *  2. any residue a crashed prior attempt of THIS batch left in the
 *     destination is wiped — output files carry a `b<batchId>_` name
 *     prefix, and the same data always stages the same partition set, so
 *     scanning just the touched partition directories finds every
 *     stranded file;
 *  3. the staged files RENAME into place under deterministic
 *     `b<batchId>_p<i>.parquet` names — per-file metadata moves, no data
 *     rewrite.
 *
 * Every crash point therefore replays to the same final file set: the
 * destination holds each batch's rows exactly once under at-least-once
 * delivery. Cost ∝ batch — one staged write plus one rename per file;
 * the residue scan lists only the partitions this batch touches, never
 * the store. The sink's marker stays the fast-path guard (a FULLY
 * committed batch is skipped without restaging); this protocol closes
 * the window the marker cannot cover.
 *
 * THE STAGE DIRECTORY IS THE IN-FLIGHT SENTINEL: [[append]] leaves it in
 * place (holding only the committer's `_SUCCESS` once every data file has
 * renamed out), and [[finish]] — commit marker, then stage cleanup — is
 * the caller's LAST step. "Stage dir present with no commit marker"
 * therefore identifies an unresolved append across EVERY crash point,
 * which is what makes [[assertNoUnresolved]] sound: the residue wipe
 * finds a crashed attempt's files BY NAME (`b<batchId>_`), so a
 * partition rewrite (DML, compaction) that runs between the crash and
 * the stream's replay would merge those rows into unprefixed files the
 * retry can no longer claim — re-installing the batch on top and
 * breaking exactly-once. The table-rewrite entry points call
 * [[assertNoUnresolved]] and refuse to rewrite over a stage that has
 * been quiet past the liveness grace (TTL-discriminated from a live
 * concurrent append, which rewrites explicitly support): recover the
 * stream (its replay converges and commits), or delete the orphan
 * `_stage_b*` dir if the stream is retired, then rewrite.
 *
 * ONE STREAM PER DESTINATION — the same assumption the marker protocol
 * has always made (two streams share a batchId sequence, so stream B's
 * batch 0 would hit stream A's marker 0): batchId must be unique per
 * destination, or one stream's residue wipe could claim another's files.
 */
object IdempotentAppend {

  /** Stage-dir path for (path, batchId) — in-flight sentinel, see above. */
  def stagePath(path: String, batchId: Long): Path =
    new Path(s"${path}_stage_b$batchId")

  /** Marker-present fast path for a replayed batch: the batch is fully
    * committed — clear any stage residue a crash between the marker write
    * and the stage cleanup left behind, then tell the sink to skip. */
  def committed(
      fs: org.apache.hadoop.fs.FileSystem,
      markerDir: Path,
      batchId: Long,
      stagedPaths: Seq[String]): Boolean = {
    val done = fs.exists(new Path(markerDir, batchId.toString))
    if (done) stagedPaths.foreach(p => fs.delete(stagePath(p, batchId), true))
    done
  }

  /** The sink's LAST step: write the commit marker, then clear the stage
    * sentinels. Order matters — clearing a stage before the marker exists
    * would leave a crash there invisible to [[assertNoUnresolved]]. */
  def finish(
      fs: org.apache.hadoop.fs.FileSystem,
      markerDir: Path,
      batchId: Long,
      stagedPaths: Seq[String]): Unit = {
    fs.mkdirs(markerDir)
    fs.create(new Path(markerDir, batchId.toString), true).close()
    stagedPaths.foreach(p => fs.delete(stagePath(p, batchId), true))
  }

  /** Fail fast if any append into `tablePaths` is ABANDONED (stage dir
    * present, commit marker in `markerDir` absent, and the stage has been
    * quiet longer than `graceMs`). Called by the partition-rewrite entry
    * points (ledger DML, compaction, LSH-store compaction) BEFORE they
    * read: rewriting a table that still owes a crashed batch its replay
    * would merge the crashed attempt's `b<id>_`-prefixed rows into
    * unprefixed files, and the replay would then install the batch a
    * second time.
    *
    * The grace window is how a crashed appender is told apart from a LIVE
    * one — the same TTL-liveness discrimination [[WriterLease]] uses for
    * crashed writers, and the same default. A live concurrent append is
    * explicitly supported during rewrites (its in-flight files are
    * rescued out of displaced trees, its marker survives the swap —
    * CI-locked by ConcurrentAppendDmlSpec), so a FRESH stage must not
    * block the rewrite. The residual window this leaves — an append that
    * crashes, and whose table is rewritten within the grace period, and
    * whose stream only replays after that rewrite — is the narrow triple
    * interleaving the name-based residue wipe cannot cover; once the
    * stage is older than the grace, the rewrite refuses and the window is
    * closed. */
  def assertNoUnresolved(
      fs: org.apache.hadoop.fs.FileSystem,
      markerDir: Path,
      tablePaths: Seq[String],
      graceMs: Long = WriterLease.DefaultTtlMs): Unit = {
    val now = System.currentTimeMillis()
    tablePaths.foreach { tp =>
      val table = fs.makeQualified(new Path(tp))
      val parent = table.getParent
      val stagePrefix = s"${table.getName}_stage_b"
      if (parent != null && fs.exists(parent))
        fs.listStatus(parent).foreach { s =>
          val n = s.getPath.getName
          if (s.isDirectory && n.startsWith(stagePrefix)) {
            val id = n.stripPrefix(stagePrefix)
            if (id.nonEmpty && id.forall(_.isDigit) &&
                !fs.exists(new Path(markerDir, id)) &&
                now - s.getModificationTime > graceMs)
              throw new java.io.IOException(
                s"unresolved streaming append on $tp (batch $id: stage dir " +
                  s"${s.getPath} exists, no commit marker in $markerDir, " +
                  s"quiet for ${now - s.getModificationTime} ms). " +
                  "Recover the stream so the replay converges and commits, " +
                  "or delete the stage dir if the stream is retired, then " +
                  "re-run this rewrite.")
          }
        }
    }
  }

  def append(
      df: DataFrame,
      path: String,
      batchId: Long,
      partitionCols: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val stage = stagePath(path, batchId)
    val prefix = s"b${batchId}_"

    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(stage.toString)

    // staged data files, grouped by partition subdirectory ("" for flat)
    val qstage = fs.makeQualified(stage)
    val staged = {
      val b = scala.collection.mutable.ArrayBuffer[Path]()
      val it = fs.listFiles(qstage, true)
      while (it.hasNext) {
        val f = it.next().getPath
        if (f.getName.startsWith("part-")) b += f
      }
      b.sortBy(_.toString)
    }
    staged.zipWithIndex
      .groupBy { case (f, _) =>
        qstage.toUri.relativize(fs.makeQualified(f.getParent).toUri)
          .getPath.stripSuffix("/")
      }
      .toSeq.sortBy(_._1)
      .foreach { case (rel, files) =>
        val destDir = if (rel.isEmpty) root else new Path(root, rel)
        if (fs.exists(destDir)) {
          // residue of a crashed prior attempt of this same batch
          fs.listStatus(destDir)
            .filter(s => s.isFile && s.getPath.getName.startsWith(prefix))
            .foreach(s => fs.delete(s.getPath, false))
        } else fs.mkdirs(destDir)
        files.foreach { case (f, i) =>
          val dest = new Path(destDir, s"${prefix}p$i.parquet")
          // Hadoop rename signals failure by RETURNING false, not
          // throwing — swallowing it would silently drop staged rows
          if (!fs.rename(f, dest))
            throw new java.io.IOException(
              s"IdempotentAppend: rename $f -> $dest failed " +
                "(batch left partially installed; a retry converges)")
        }
      }
    // the stage dir is NOT deleted here: it is the in-flight sentinel
    // assertNoUnresolved keys on, and only the caller's finish() — after
    // the commit marker is durable — may clear it
  }
}
