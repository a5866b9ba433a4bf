package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/**
 * Table maintenance for the day-partitioned ledger. Streaming ingest and
 * frequent small appends fragment partitions into many tiny parquet files;
 * at 100 TB that multiplies scan tasks and footer reads. [[compact]] rewrites
 * each fragmented partition into ceil(bytes/target) files — one distributed
 * job per partition, per-partition delete+move swap, untouched partitions
 * keep their files.
 *
 * All filesystem access goes through the Hadoop [[FileSystem]] resolved from
 * the path's scheme and the session's Hadoop configuration, so the same code
 * runs against `file://`, HDFS, or an object store connector (rename is not
 * atomic on object stores — see the concurrency contract below, which already
 * assumes no concurrent writer).
 *
 * Concurrency contract: run compaction when no writer is active on the
 * table (the swap is delete-then-move, not atomic, and readers listing a
 * partition mid-swap see it partially populated). Only the SNAPSHOT of
 * files taken at the start is compacted — a file appended after the
 * snapshot is neither read nor deleted, so late appends survive untouched
 * rather than being duplicated.
 */
object Maintenance {

  final case class CompactionResult(partition: String, filesBefore: Int, filesAfter: Int)

  def compact(
      spark: SparkSession,
      path: String,
      targetBytes: Long = 128L * 1024 * 1024,
      minFilesToCompact: Int = 2): Seq[CompactionResult] = {
    val base = new Path(path)
    val fs = base.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.getFileStatus(base).isDirectory, s"not a table directory: $path")
    val parts = fs.listStatus(base)
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
    parts.toIndexedSeq.flatMap { part =>
      val dir = part.getPath
      val files = fs.listStatus(dir).filter(_.getPath.getName.endsWith(".parquet"))
      if (files.length < minFilesToCompact) None
      else {
        val bytes = files.map(_.getLen).sum
        val nOut = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
        if (nOut >= files.length) None
        else {
          val staging = new Path(dir.getParent,
            s"${dir.getName}_compact_${java.util.UUID.randomUUID().toString.take(8)}")
          // read exactly the snapshot files, not the directory — anything
          // appended after the listing must not be double-counted
          spark.read.parquet(files.map(_.getPath.toString).toIndexedSeq: _*)
            .repartition(nOut)
            .write.parquet(staging.toString)
          val fresh = fs.listStatus(staging)
            .filter(_.getPath.getName.endsWith(".parquet"))
          // Move the compacted files in BEFORE deleting the snapshot: their
          // UUID names cannot collide, and a filesystem that cannot rename
          // aborts here with the original files untouched.
          fresh.foreach { f =>
            val dest = new Path(dir, f.getPath.getName)
            if (!fs.rename(f.getPath, dest))
              throw new java.io.IOException(
                s"cannot move ${f.getPath} into $dir; partition unchanged")
          }
          files.foreach(f => fs.delete(f.getPath, false))
          fs.listStatus(dir)
            .filter { s =>
              val n = s.getPath.getName
              n.startsWith("_") || n.endsWith(".crc")
            }
            .foreach(s => fs.delete(s.getPath, false))
          fs.delete(staging, true)
          Some(CompactionResult(dir.getName, files.length, fresh.length))
        }
      }
    }
  }
}
