package graft.sources

import org.apache.spark.sql.SparkSession

/**
 * Table maintenance for the day-partitioned ledger. Streaming ingest and
 * frequent small appends fragment partitions into many tiny parquet files;
 * at 100 TB that multiplies scan tasks and footer reads. [[compact]] rewrites
 * each fragmented partition into ceil(bytes/target) files — one distributed
 * job per partition, per-partition delete+move swap, untouched partitions
 * keep their files.
 *
 * Concurrency contract: run compaction when no writer is active on the
 * table (the swap is delete-then-move, not atomic, and readers listing a
 * partition mid-swap see it partially populated). Only the SNAPSHOT of
 * files taken at the start is compacted — a file appended after the
 * snapshot is neither read nor deleted, so late appends survive untouched
 * rather than being duplicated. Local-filesystem paths only (fails loudly
 * otherwise); a cluster deployment ports the moves to the Hadoop
 * FileSystem API.
 */
object Maintenance {

  final case class CompactionResult(partition: String, filesBefore: Int, filesAfter: Int)

  def compact(
      spark: SparkSession,
      path: String,
      targetBytes: Long = 128L * 1024 * 1024,
      minFilesToCompact: Int = 2): Seq[CompactionResult] = {
    require(!path.contains("://"),
      s"compact operates on local paths only (got $path); port to Hadoop FS for cluster stores")
    val base = new java.io.File(path)
    require(base.isDirectory, s"not a table directory: $path")
    val parts = Option(base.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.contains("="))
    parts.toIndexedSeq.flatMap { dir =>
      val files = dir.listFiles().filter(_.getName.endsWith(".parquet"))
      if (files.length < minFilesToCompact) None
      else {
        val bytes = files.map(_.length()).sum
        val nOut = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
        if (nOut >= files.length) None
        else {
          val staging = s"${dir.getPath}_compact_${java.util.UUID.randomUUID().toString.take(8)}"
          // read exactly the snapshot files, not the directory — anything
          // appended after the listing must not be double-counted
          spark.read.parquet(files.map(_.getPath).toIndexedSeq: _*).repartition(nOut)
            .write.parquet(staging)
          val fresh = new java.io.File(staging).listFiles()
            .filter(_.getName.endsWith(".parquet"))
          files.foreach(_.delete())
          dir.listFiles().filter(f => f.getName.startsWith("_") || f.getName.endsWith(".crc"))
            .foreach(_.delete())
          fresh.foreach { f =>
            java.nio.file.Files.move(f.toPath, new java.io.File(dir, f.getName).toPath)
          }
          val stagingDir = new java.io.File(staging)
          Option(stagingDir.listFiles()).foreach(_.foreach(_.delete()))
          stagingDir.delete()
          Some(CompactionResult(dir.getName, files.length, fresh.length))
        }
      }
    }
  }
}
