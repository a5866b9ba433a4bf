package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/**
 * Table maintenance for the day-partitioned ledger. Streaming ingest and
 * frequent small appends fragment partitions into many tiny parquet files;
 * at 100 TB that multiplies scan tasks and footer reads. [[compact]] rewrites
 * each fragmented partition into ceil(bytes/target) files — one distributed
 * job per partition, per-partition staged swap, untouched partitions keep
 * their files.
 *
 * All filesystem access goes through the Hadoop [[FileSystem]] resolved from
 * the path's scheme and the session's Hadoop configuration, so the same code
 * runs against `file://`, HDFS, or an object store connector (rename is not
 * atomic on object stores — see the concurrency contract below, which already
 * assumes no concurrent writer).
 *
 * Concurrency contract: run compaction when no writer is active on the
 * table (the swap is not atomic: a reader listing a partition mid-swap can
 * see it partially populated). The swap never duplicates rows in any crash
 * window:
 *
 *  1. compacted files enter the partition HIDDEN (dot-prefixed — invisible
 *     to Spark's listing); a failure here aborts with the originals intact;
 *  2. a manifest naming the snapshot files is committed (tmp write + rename),
 *     marking the point of no return;
 *  3. snapshot files are deleted, compacted files unhidden, manifest removed.
 *
 * The next [[compact]] of a crashed partition REPLAYS from the manifest
 * (delete the named snapshot files, unhide) when one exists, or sweeps the
 * uncommitted hidden files when none does — both idempotent. Only the
 * SNAPSHOT of files taken at the start is compacted: a file appended after
 * the snapshot is neither read, deleted, nor named in the manifest, so late
 * appends survive every path untouched rather than being duplicated.
 */
object Maintenance {

  final case class CompactionResult(partition: String, filesBefore: Int, filesAfter: Int)

  private val HiddenPrefix = ".compact_"
  private val ManifestName = ".compact_manifest"

  def compact(
      spark: SparkSession,
      path: String,
      targetBytes: Long = 128L * 1024 * 1024,
      minFilesToCompact: Int = 2): Seq[CompactionResult] = {
    val base = new Path(path)
    val fs = base.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.getFileStatus(base).isDirectory, s"not a table directory: $path")
    requirePlainParquetTable(fs, base)
    // compaction merges rows into new unprefixed files — run against a
    // crashed-but-unreplayed streaming append it would strand that batch's
    // b<id>_ residue detection and the replay would double-install; fail
    // fast until the stream recovers (see IdempotentAppend)
    IdempotentAppend.assertNoUnresolved(fs,
      new Path(s"$path/_graft_batches"), Seq(path))
    // the no-concurrent-writer contract above, enforced: a second writer
    // fails on acquisition instead of corrupting the swap
    WriterLease.withLease(fs, base) {
      compactLocked(spark, base, fs, targetBytes, minFilesToCompact)
    }
  }

  private def compactLocked(
      spark: SparkSession,
      base: Path,
      fs: FileSystem,
      targetBytes: Long,
      minFilesToCompact: Int): Seq[CompactionResult] = {
    // sweep staging leftovers of crashed runs (they live OUTSIDE the table
    // root, so readers never see them — but don't let them accumulate).
    // Match the exact generated shape (8-hex-char suffix) so a sibling
    // directory that merely shares the prefix is never touched; concurrent
    // compactors are already outside the no-concurrent-writer contract.
    val stagingPattern = (java.util.regex.Pattern.quote(base.getName) +
      "_compact_[0-9a-f]{8}").r
    fs.listStatus(base.getParent)
      .map(_.getPath)
      .filter(p => stagingPattern.matches(p.getName))
      .foreach(p => fs.delete(p, true))
    val parts = fs.listStatus(base)
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
    parts.toIndexedSeq.flatMap { part =>
      val dir = part.getPath
      recoverOrSweep(fs, dir)
      val files = fs.listStatus(dir).filter(_.getPath.getName.endsWith(".parquet"))
      if (files.length < minFilesToCompact) None
      else {
        val bytes = files.map(_.getLen).sum
        val nOut = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
        if (nOut >= files.length) None
        else {
          // Staging lives OUTSIDE the table root: a directory with '=' in
          // its name inside the root would be parsed by partition discovery
          // as a live partition if a crash left it behind.
          val staging = new Path(base.getParent,
            s"${base.getName}_compact_${java.util.UUID.randomUUID().toString.take(8)}")
          // read exactly the snapshot files, not the directory — anything
          // appended after the listing must not be double-counted
          spark.read.parquet(files.map(_.getPath.toString).toIndexedSeq: _*)
            .repartition(nOut)
            .write.parquet(staging.toString)
          val fresh = fs.listStatus(staging)
            .filter(_.getPath.getName.endsWith(".parquet"))
          // step 1: stage hidden — abortable, originals untouched
          val hidden = fresh.map { f =>
            val h = new Path(dir, s"$HiddenPrefix${f.getPath.getName}")
            if (!fs.rename(f.getPath, h))
              throw new java.io.IOException(
                s"cannot stage ${f.getPath} into $dir; partition unchanged")
            h
          }
          // step 2: commit the manifest (atomic-ish: tmp write + rename)
          writeManifest(fs, dir, files.map(_.getPath.getName).toIndexedSeq)
          // step 3: delete snapshot + metadata files, unhide, clear manifest
          files.foreach(f => fs.delete(f.getPath, false))
          fs.listStatus(dir)
            .filter { s =>
              val n = s.getPath.getName
              n.startsWith("_") || n.endsWith(".crc")
            }
            .foreach(s => fs.delete(s.getPath, false))
          hidden.foreach(h => unhide(fs, dir, h))
          fs.delete(new Path(dir, ManifestName), false)
          fs.delete(staging, true)
          Some(CompactionResult(dir.getName, files.length, fresh.length))
        }
      }
    }
  }

  /**
   * Refuse to operate on a directory that carries another table format's
   * transaction/metadata markers. Compaction (and the partition-rewrite DML)
   * moves and deletes raw files — pointed at a Delta/Iceberg/Hudi table it
   * would silently corrupt the format's log, whose snapshots pin exact file
   * names. The marker directory names are each format's fixed, documented
   * layout; a plain Spark parquet write never creates them.
   */
  private[sources] def requirePlainParquetTable(fs: FileSystem, base: Path): Unit = {
    val markers = Seq(
      "_delta_log" -> "Delta Lake",
      ".hoodie" -> "Apache Hudi",
      "metadata" -> "Apache Iceberg")
    markers.foreach { case (name, format) =>
      if (fs.exists(new Path(base, name)))
        throw new IllegalArgumentException(
          s"$base contains '$name' — it looks like a $format table, not plain " +
            "parquet; file-level maintenance would corrupt its transaction log. " +
            "Use the format's own maintenance commands instead.")
    }
  }

  /**
   * Finish (or sweep) any crashed compaction swap in every partition of
   * `base`, for a REWRITER about to read the table: a mid-crashed
   * partition (manifest committed, snapshot files partially deleted,
   * compacted files still hidden) visibly MISSES rows that only the
   * manifest replay restores — a DML that read that view and staged a
   * rewrite from it would make the loss permanent and then discard the
   * very recovery state the replay needs. Must run under the writer
   * lease, before the rewrite's `read` lists its file-index snapshot.
   */
  private[sources] def recoverCrashedCompactions(fs: FileSystem, base: Path): Unit = {
    recoverOrSweep(fs, base) // defensive: a root-level swap state (unused today)
    fs.listStatus(base)
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
      .foreach(s => recoverOrSweep(fs, s.getPath))
  }

  /** Finish a crashed swap (manifest committed: delete named snapshot files,
    * unhide) or discard an uncommitted one (no manifest: drop hidden files). */
  private def recoverOrSweep(fs: FileSystem, dir: Path): Unit = {
    val manifest = new Path(dir, ManifestName)
    val hidden = fs.listStatus(dir)
      .map(_.getPath)
      .filter(p => p.getName.startsWith(HiddenPrefix) && !p.getName.startsWith(ManifestName))
    if (fs.exists(manifest)) {
      val in = fs.open(manifest)
      val names = try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
        finally in.close()
      names.foreach(n => fs.delete(new Path(dir, n), false))
      hidden.foreach(h => unhide(fs, dir, h))
      fs.delete(manifest, false)
    } else {
      hidden.foreach(h => fs.delete(h, false))
    }
    // tmp manifest from a crash mid-commit is never authoritative
    fs.delete(new Path(dir, ManifestName + ".tmp"), false)
  }

  private def unhide(fs: FileSystem, dir: Path, h: Path): Unit = {
    val dest = new Path(dir, h.getName.stripPrefix(HiddenPrefix))
    if (!fs.rename(h, dest))
      throw new java.io.IOException(s"cannot unhide $h in $dir")
  }

  private def writeManifest(fs: FileSystem, dir: Path, names: Seq[String]): Unit = {
    val tmp = new Path(dir, ManifestName + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(names.mkString("\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (!fs.rename(tmp, new Path(dir, ManifestName)))
      throw new java.io.IOException(s"cannot commit compaction manifest in $dir")
  }
}
