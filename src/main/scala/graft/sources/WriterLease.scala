package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}

/**
 * Cooperative writer-exclusion lease for a table directory.
 *
 * [[Maintenance.compact]] and the partition-rewrite DML path
 * ([[LedgerTables.updateWhere]]/[[LedgerTables.deleteWhere]]) document a
 * "no concurrent writer" contract — their staged swaps are correct only
 * when a single writer mutates the table at a time. The lease turns a
 * violation of that contract from silent corruption into a loud error:
 * every writer acquires `_writer_lease` at the table root before touching
 * files and releases it when done. The underscore prefix keeps the file
 * invisible to Spark's data-file listing.
 *
 * Mechanics: acquisition is a create-no-overwrite of the lease file
 * (atomic on local filesystems and HDFS), carrying owner id, acquisition
 * time, and a TTL. A second writer's create fails and throws
 * [[WriterLease.HeldByOtherWriterException]] naming the current holder. A
 * writer that crashes without releasing leaves its lease behind; once the
 * TTL passes (or the operator calls [[breakLease]] after confirming the
 * holder is dead) the next acquirer reclaims it — crash recovery without
 * an operator in the loop, bounded by the TTL.
 *
 * Caveats, documented not hidden: reclaiming an expired lease is
 * read-then-delete-then-create, so two writers racing to reclaim the same
 * expired lease within the same few milliseconds can both believe they
 * won; the create-no-overwrite arbitrates all non-reclaim races. And on
 * object stores without atomic create/rename the lease is advisory — the
 * same caveat the swap itself carries ([[Maintenance]] scaladoc).
 */
object WriterLease {

  val LeaseName = "_writer_lease"

  /** Default lease TTL: generous for a partition rewrite or compaction
    * sweep; a crashed writer blocks the table for at most this long. */
  val DefaultTtlMs: Long = 15 * 60 * 1000L

  final case class LeaseInfo(owner: String, acquiredAtMs: Long, ttlMs: Long) {
    def expiresAtMs: Long = acquiredAtMs + ttlMs
  }

  final class HeldByOtherWriterException(message: String)
    extends IllegalStateException(message)

  private def leasePath(root: Path) = new Path(root, LeaseName)

  /** Process-unique default owner id: host + pid + nonce. */
  def defaultOwner(): String = {
    val host = try java.net.InetAddress.getLocalHost.getHostName
      catch { case _: Exception => "unknown-host" }
    s"$host/pid-${ProcessHandle.current.pid}/${java.util.UUID.randomUUID().toString.take(8)}"
  }

  /** The current lease, if one exists. Expiry is judged on the FILE's
    * modification time, not the content timestamp: [[renew]] extends a held
    * lease by touching the file (atomic metadata update — no partial-content
    * window for concurrent readers), so `acquiredAtMs` here is the moment of
    * the last heartbeat. An unparseable file (a writer crashed mid-create)
    * reads as ttl 0 — reclaimable as soon as its modification time passes. */
  def read(fs: FileSystem, root: Path): Option[LeaseInfo] = {
    val p = leasePath(root)
    if (!fs.exists(p)) None
    else {
      val modTime = fs.getFileStatus(p).getModificationTime
      val in = fs.open(p)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      text.split('\n') match {
        case Array(owner, ts, ttl, _*) if ts.forall(_.isDigit) && ttl.forall(_.isDigit) =>
          Some(LeaseInfo(owner, math.max(ts.toLong, modTime), ttl.toLong))
        case _ => Some(LeaseInfo("corrupt-lease", modTime, 0L))
      }
    }
  }

  /** Heartbeat: push the held lease's expiry forward by touching the file's
    * modification time (atomic, content untouched). No-op if this owner no
    * longer holds the lease or the filesystem refuses. */
  def renew(fs: FileSystem, root: Path, owner: String,
      nowMs: () => Long = () => System.currentTimeMillis()): Unit =
    read(fs, root) match {
      case Some(l) if l.owner == owner =>
        try fs.setTimes(leasePath(root), nowMs(), -1)
        catch { case _: java.io.IOException => () }
      case _ => ()
    }

  /**
   * Acquire the table's writer lease or throw [[HeldByOtherWriterException]].
   * An expired (or corrupt) lease is reclaimed in place; the loser of any
   * straight acquisition race fails on the atomic create-no-overwrite.
   */
  def acquire(
      fs: FileSystem,
      root: Path,
      owner: String = defaultOwner(),
      ttlMs: Long = DefaultTtlMs,
      nowMs: () => Long = () => System.currentTimeMillis()): LeaseInfo = {
    val p = leasePath(root)
    val info = LeaseInfo(owner, nowMs(), ttlMs)
    def tryCreate(): Boolean =
      try {
        // overwrite=false: atomic arbiter — exactly one concurrent creator wins
        val out = fs.create(p, false)
        try out.write(s"${info.owner}\n${info.acquiredAtMs}\n${info.ttlMs}\n"
          .getBytes(StandardCharsets.UTF_8))
        finally out.close()
        true
      } catch { case _: java.io.IOException => false }
    if (tryCreate()) return info
    val existing = read(fs, root)
    val expired = existing.forall(l => nowMs() > l.expiresAtMs)
    if (!expired)
      throw new HeldByOtherWriterException(
        s"table $root is being written by ${existing.get.owner} " +
          s"(lease expires ${java.time.Instant.ofEpochMilli(existing.get.expiresAtMs)}); " +
          "concurrent writers would corrupt the staged swap — retry after the " +
          s"lease clears, or breakLease() if the holder is known dead")
    fs.delete(p, false) // reclaim the stale lease
    if (!tryCreate())
      throw new HeldByOtherWriterException(
        s"lost the race reclaiming an expired lease on $root; retry")
    info
  }

  /** Release the lease if this owner still holds it. A lease someone else
    * reclaimed after our TTL lapsed is left alone — deleting it would evict
    * the live writer that legitimately took over. */
  def release(fs: FileSystem, root: Path, owner: String): Unit =
    read(fs, root) match {
      case Some(l) if l.owner == owner => fs.delete(leasePath(root), false)
      case _ => ()
    }

  /** Operator override: drop whatever lease exists (use only after
    * confirming the holding writer is dead). */
  def breakLease(fs: FileSystem, root: Path): Unit =
    fs.delete(leasePath(root), false)

  /** Run `body` holding the table's writer lease; always released on exit.
    * A daemon heartbeat renews the lease every ttl/3, so an operation that
    * outlives the TTL (a large compaction) keeps its exclusion as long as
    * the process is alive — the TTL then only bounds how long a genuinely
    * crashed writer blocks the table. */
  def withLease[A](
      fs: FileSystem,
      root: Path,
      ttlMs: Long = DefaultTtlMs)(body: => A): A = {
    val info = acquire(fs, root, ttlMs = ttlMs)
    val hb = new Thread(() => {
      try {
        while (!Thread.currentThread().isInterrupted) {
          Thread.sleep(math.max(50L, ttlMs / 3))
          renew(fs, root, info.owner)
        }
      } catch { case _: InterruptedException => () }
    }, "graft-writer-lease-heartbeat")
    hb.setDaemon(true)
    hb.start()
    try body finally {
      hb.interrupt()
      hb.join(1000)
      release(fs, root, info.owner)
    }
  }
}
