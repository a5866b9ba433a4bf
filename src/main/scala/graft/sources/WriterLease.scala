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
 * every writer acquires the lease before touching files and releases it
 * when done.
 *
 * The lease file lives BESIDE the table root (`<table>_writer_lease` in
 * the parent directory), not inside it: the whole-table rewrite path swaps
 * the table root directory itself, and a lease inside the root would be
 * destroyed mid-operation by its own holder — while also leaving a window
 * where the root briefly does not exist and a concurrent acquire could
 * wedge the swap's restore path by recreating it.
 *
 * Mechanics: acquisition is a create-no-overwrite of the lease file
 * (atomic on local filesystems and HDFS), carrying owner id, acquisition
 * time, and a TTL. A second writer's create fails and throws
 * [[WriterLease.HeldByOtherWriterException]] naming the current holder. A
 * writer that crashes without releasing leaves its lease behind; once the
 * TTL passes (or the operator calls [[breakLease]] after confirming the
 * holder is dead) the next acquirer reclaims it. Reclaim is an atomic
 * rename-aside followed by a content check: exactly one reclaimer wins
 * the rename, and a reclaimer that stalled between reading the stale
 * lease and renaming it discovers the lease changed hands (owner
 * mismatch) and restores it instead of evicting a live writer.
 *
 * Remaining caveat, documented not hidden: on object stores without
 * atomic create/rename the lease is advisory — the same caveat the swap
 * itself carries ([[Maintenance]] scaladoc).
 */
object WriterLease {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Default lease TTL: generous for a partition rewrite or compaction
    * sweep; a crashed writer blocks the table for at most this long. A
    * LIVE writer is not bounded by it — [[withLease]] heartbeats. */
  val DefaultTtlMs: Long = 15 * 60 * 1000L

  final case class LeaseInfo(owner: String, acquiredAtMs: Long, ttlMs: Long) {
    def expiresAtMs: Long = acquiredAtMs + ttlMs
  }

  final class HeldByOtherWriterException(message: String)
    extends IllegalStateException(message)

  /** `<parent>/<name>_writer_lease`, beside the table root (see scaladoc).
    * A root with no parent (filesystem root) keeps the lease inside. */
  private def leasePath(root: Path): Path =
    Option(root.getParent) match {
      case Some(parent) => new Path(parent, s"${root.getName}_writer_lease")
      case None => new Path(root, "_writer_lease")
    }

  /** Process-unique default owner id: host + pid + nonce. */
  def defaultOwner(): String = {
    val host = try java.net.InetAddress.getLocalHost.getHostName
      catch { case _: Exception => "unknown-host" }
    s"$host/pid-${ProcessHandle.current.pid}/${java.util.UUID.randomUUID().toString.take(8)}"
  }

  /** Longs that fit a Long without overflow (19 digits max, bounded). */
  private def parseableLong(s: String): Boolean =
    s.nonEmpty && s.length <= 18 && s.forall(_.isDigit)

  private def readAt(fs: FileSystem, p: Path): Option[LeaseInfo] = {
    if (!fs.exists(p)) None
    else {
      val modTime = fs.getFileStatus(p).getModificationTime
      val in = fs.open(p)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      text.split('\n') match {
        case Array(owner, ts, ttl, _*) if parseableLong(ts) && parseableLong(ttl) =>
          Some(LeaseInfo(owner, math.max(ts.toLong, modTime), ttl.toLong))
        case _ =>
          // a writer crashed mid-create (or garbage): reclaimable as soon
          // as the file's modification time passes
          Some(LeaseInfo("corrupt-lease", modTime, 0L))
      }
    }
  }

  /** The current lease, if one exists. Expiry is judged on the FILE's
    * modification time, not the content timestamp: [[renew]] extends a
    * held lease by touching the file (atomic metadata update — no
    * partial-content window for concurrent readers), so `acquiredAtMs`
    * here is the moment of the last heartbeat. */
  def read(fs: FileSystem, root: Path): Option[LeaseInfo] =
    readAt(fs, leasePath(root))

  /**
   * Heartbeat: push the held lease's expiry forward. Primary path is an
   * atomic modification-time touch; a filesystem that refuses `setTimes`
   * falls back to rewriting the content in place (truncate-and-write — a
   * concurrent reader catching the gap sees a corrupt lease with a FRESH
   * modification time, which is not reclaimable until the fresh mtime
   * itself expires, so the fallback never opens an exclusion hole).
   * Returns false — and logs — when the lease could not be renewed or
   * this owner no longer holds it.
   */
  def renew(fs: FileSystem, root: Path, owner: String,
      nowMs: () => Long = () => System.currentTimeMillis()): Boolean =
    read(fs, root) match {
      case Some(l) if l.owner == owner =>
        val p = leasePath(root)
        try { fs.setTimes(p, nowMs(), -1); true }
        catch {
          case _: java.io.IOException =>
            try {
              writeLeaseFile(fs, p, LeaseInfo(owner, nowMs(), l.ttlMs), overwrite = true)
              true
            } catch {
              case e: java.io.IOException =>
                log.warn(s"writer-lease renewal failed for $root (owner $owner): $e")
                false
            }
        }
      case other =>
        log.warn(s"writer-lease renewal skipped for $root: owner $owner no longer " +
          s"holds it (current: ${other.map(_.owner).getOrElse("<none>")})")
        false
    }

  private def writeLeaseFile(fs: FileSystem, p: Path, info: LeaseInfo,
      overwrite: Boolean): Unit = {
    val out = fs.create(p, overwrite)
    try out.write(s"${info.owner}\n${info.acquiredAtMs}\n${info.ttlMs}\n"
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /**
   * Acquire the table's writer lease or throw [[HeldByOtherWriterException]].
   * An expired (or corrupt) lease is reclaimed via atomic rename-aside with
   * a post-rename owner check, so a reclaimer that stalled arbitrarily long
   * after its expiry check can never evict a live writer that reclaimed
   * first; the loser of any straight acquisition race fails on the atomic
   * create-no-overwrite.
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
      try { writeLeaseFile(fs, p, info, overwrite = false); true }
      catch { case _: java.io.IOException => false }
    if (tryCreate()) return info
    val existing = readAt(fs, p)
    val expired = existing.forall(l => nowMs() > l.expiresAtMs)
    if (!expired)
      throw new HeldByOtherWriterException(
        s"table $root is being written by ${existing.get.owner} " +
          s"(lease expires ${java.time.Instant.ofEpochMilli(existing.get.expiresAtMs)}); " +
          "concurrent writers would corrupt the staged swap — retry after the " +
          s"lease clears, or breakLease() if the holder is known dead")
    // Reclaim the stale lease: rename it aside (exactly one reclaimer's
    // rename succeeds), then confirm the file we moved is still the stale
    // lease we judged expired — if it changed hands in between, restore it.
    val aside = new Path(p.getParent,
      s"${p.getName}.reclaim_${java.util.UUID.randomUUID().toString.take(8)}")
    if (!fs.rename(p, aside))
      throw new HeldByOtherWriterException(
        s"lost the race reclaiming an expired lease on $root; retry")
    val moved = readAt(fs, aside)
    if (moved.exists(m => m.owner != existing.get.owner || nowMs() <= m.expiresAtMs)) {
      if (!fs.rename(aside, p))
        // the live holder will fail its own renew/release loudly; surface ours
        log.warn(s"could not restore a live writer lease at $p after a stale " +
          "reclaim race — the holder's heartbeat will flag the loss")
      throw new HeldByOtherWriterException(
        s"table $root lease changed hands during reclaim " +
          s"(now ${moved.map(_.owner).getOrElse("<gone>")}); retry")
    }
    fs.delete(aside, false)
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
    * the process is alive and the filesystem honours the renewal — a
    * failed renewal is logged by [[renew]] (the operation itself is not
    * killed: it may be mid-swap, and stopping it there is worse than
    * racing; the log line is the operator's signal). */
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
