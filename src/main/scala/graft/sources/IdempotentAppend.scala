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
 * ONE STREAM PER DESTINATION — the same assumption the marker protocol
 * has always made (two streams share a batchId sequence, so stream B's
 * batch 0 would hit stream A's marker 0): batchId must be unique per
 * destination, or one stream's residue wipe could claim another's files.
 */
object IdempotentAppend {

  /** Stage-dir path for (path, batchId) — exposed so a sink's
    * marker-present early-return can clear the residue of a crash that
    * landed between its marker write and the stage cleanup. */
  def stagePath(path: String, batchId: Long): Path =
    new Path(s"${path}_stage_b$batchId")

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
    fs.delete(stage, true)
  }
}
