package graft

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

import graft.sources.{LedgerTables, WriterLease}

/** Failure-path coverage for the whole-table contents swap: every rename is
  * checked, and a failure in either phase must restore the table exactly —
  * the crash-safety claim the DML path makes in its scaladoc. */
class SwapContentsSpec extends SparkSpec {

  /** Local filesystem whose rename can be made to fail for chosen names,
    * or preceded by an injected action (to simulate a concurrent appender
    * racing the rename). */
  private class FaultyFs extends RawLocalFileSystem {
    @volatile var failWhen: (Path, Path) => Boolean = (_, _) => false
    @volatile var beforeRename: (Path, Path) => Unit = (_, _) => ()
    override def rename(src: Path, dst: Path): Boolean = {
      beforeRename(src, dst)
      if (failWhen(src, dst)) false else super.rename(src, dst)
    }
  }

  private def newFs(): FaultyFs = {
    val fs = new FaultyFs
    fs.initialize(java.net.URI.create("file:///"), spark.sessionState.newHadoopConf())
    fs
  }

  private def mkFile(fs: FaultyFs, p: Path, content: String): Unit = {
    val out = fs.create(p, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  private def names(fs: FaultyFs, dir: Path): Set[String] =
    fs.listStatus(dir).map(_.getPath.getName).toSet

  private def fixture(fs: FaultyFs): (Path, Path) = {
    val root = new Path(
      java.nio.file.Files.createTempDirectory("graft_swap").toString)
    val dest = new Path(root, "table")
    val fresh = new Path(root, "staging")
    fs.mkdirs(dest); fs.mkdirs(fresh)
    mkFile(fs, new Path(dest, "a.parquet"), "old-a")
    mkFile(fs, new Path(dest, "b.parquet"), "old-b")
    mkFile(fs, new Path(dest, WriterLease.LeaseName), "owner\n1\n1\n")
    mkFile(fs, new Path(fresh, "c.parquet"), "new-c")
    mkFile(fs, new Path(fresh, "d.parquet"), "new-d")
    (fresh, dest)
  }

  test("success: children replaced, lease untouched, staging holds the old tree") {
    val fs = newFs()
    val (fresh, dest) = fixture(fs)
    LedgerTables.swapContents(fs, fresh, dest)
    assert(names(fs, dest) == Set("c.parquet", "d.parquet", WriterLease.LeaseName))
  }

  test("failure moving the old tree out restores it before rethrowing") {
    val fs = newFs()
    val (fresh, dest) = fixture(fs)
    fs.failWhen = (src, _) => src.getName == "b.parquet"
    intercept[java.io.IOException] { LedgerTables.swapContents(fs, fresh, dest) }
    assert(names(fs, dest) == Set("a.parquet", "b.parquet", WriterLease.LeaseName),
      "table must be fully restored after a phase-1 rename failure")
    assert(names(fs, fresh).contains("c.parquet") && names(fs, fresh).contains("d.parquet"))
  }

  test("a rollback failure is reported as suppressed, never silently discarded") {
    val fs = newFs()
    val (fresh, dest) = fixture(fs)
    // forward: the SECOND old child fails moving out (so exactly one sits
    // in the trash, independent of listing order); rollback: every restore
    // into the table fails — the original error must carry the
    // stranded-file report as a suppressed exception
    val forwardMoves = new java.util.concurrent.atomic.AtomicInteger(0)
    fs.failWhen = (_, dst) =>
      if (dst.toString.contains("_old_")) forwardMoves.incrementAndGet() == 2
      else dst.toString.contains("/table/")
    val e = intercept[java.io.IOException] {
      LedgerTables.swapContents(fs, fresh, dest)
    }
    assert(e.getMessage.contains("cannot move"), e.getMessage)
    assert(e.getSuppressed.exists(_.getMessage.contains("ROLLBACK INCOMPLETE")),
      s"stranded rollback must be reported: ${e.getSuppressed.toSeq}")
  }

  test("failure moving the fresh tree in restores the old children and pulls fresh back") {
    val fs = newFs()
    val (fresh, dest) = fixture(fs)
    // phase 1 (old -> trash) succeeds; fail only when a fresh child lands in dest
    fs.failWhen = (src, dst) =>
      src.getName == "d.parquet" && dst.toString.contains("/table/")
    intercept[java.io.IOException] { LedgerTables.swapContents(fs, fresh, dest) }
    assert(names(fs, dest) == Set("a.parquet", "b.parquet", WriterLease.LeaseName),
      "table must be fully restored after a phase-2 rename failure")
    assert(names(fs, fresh).contains("c.parquet") && names(fs, fresh).contains("d.parquet"),
      "fresh children must be pulled back out of the table")
  }

  test("phase-2 rollback rescues files appended into an already-installed fresh child") {
    // An appender commits into a fresh partition AFTER the swap installed
    // it; then the NEXT install fails. The pull-back carries the appended
    // file into staging — the handler must merge it back into the
    // restored table (it is committed data the rewrite never saw), while
    // the staged write's own files stay in staging.
    val fs = newFs()
    val root = new Path(
      java.nio.file.Files.createTempDirectory("graft_lateinstall").toString)
    val dest = new Path(root, "table")
    val fresh = new Path(root, "staging")
    for (d <- Seq("day=1", "day=2")) {
      fs.mkdirs(new Path(dest, d)); fs.mkdirs(new Path(fresh, d))
      mkFile(fs, new Path(dest, s"$d/old.parquet"), "old")
      mkFile(fs, new Path(fresh, s"$d/new.parquet"), "new")
    }
    def isInstall(src: Path, dst: Path): Boolean =
      src.getParent != null && src.getParent.getName == "staging" &&
        dst.getParent != null && dst.getParent.getName == "table"
    // whichever child installs first receives the appended file just
    // before the second install, which then fails — order-independent
    val first = new java.util.concurrent.atomic.AtomicReference[String](null)
    fs.beforeRename = (src, dst) => if (isInstall(src, dst)) {
      if (first.get() == null) first.set(src.getName)
      else mkFile(fs, new Path(dest, s"${first.get()}/appended.parquet"), "late")
    }
    fs.failWhen = (src, dst) =>
      isInstall(src, dst) && first.get() != null && src.getName != first.get()
    intercept[java.io.IOException] { LedgerTables.swapContents(fs, fresh, dest) }
    val a = first.get()
    val b = if (a == "day=1") "day=2" else "day=1"
    assert(names(fs, new Path(dest, a)) == Set("old.parquet", "appended.parquet"),
      s"the appended file must be rescued back into the restored $a")
    assert(names(fs, new Path(dest, b)) == Set("old.parquet"))
    assert(names(fs, new Path(fresh, a)) == Set("new.parquet"),
      "the staged write's own file stays in staging after the rescue")
  }

  test("a partition dir recreated non-empty mid-install is displaced, never nested") {
    // Deterministic reproduction of the measured Hadoop local-FS hazard:
    // rename onto a non-empty dir returns TRUE and NESTS src inside it. An
    // injected "appender" recreates the partition (with a committed late
    // file) in the exact window between the swap's displace and its
    // rename-in; the install must detect the nest, unwind it, displace the
    // recreated dir (returning it so the caller can rescue the late file),
    // and retry — ending with the fresh tree installed flat.
    val fs = newFs()
    val root = new Path(
      java.nio.file.Files.createTempDirectory("graft_nest").toString)
    val dest = new Path(root, "table")
    val fresh = new Path(root, "staging")
    val day = "query_window_start_day=2024-01-01"
    fs.mkdirs(new Path(dest, day))
    mkFile(fs, new Path(dest, s"$day/old.parquet"), "old")
    mkFile(fs, new Path(dest, WriterLease.LeaseName), "owner\n1\n1\n")
    fs.mkdirs(new Path(fresh, day))
    mkFile(fs, new Path(fresh, s"$day/new.parquet"), "new")
    val injected = new java.util.concurrent.atomic.AtomicInteger(0)
    fs.beforeRename = (src, dst) =>
      // exactly once: when the fresh day dir is about to be installed,
      // the appender's commit beats it to the recreated destination
      if (dst.getName == day && src.toString.contains("staging") &&
          injected.getAndIncrement() == 0) {
        fs.mkdirs(dst)
        mkFile(fs, new Path(dst, "late.parquet"), "late-rows")
      }
    val (_, lateTrees) = LedgerTables.swapContents(fs, fresh, dest)
    // installed flat: the fresh file, no nested partition-named dir
    assert(names(fs, new Path(dest, day)) == Set("new.parquet"),
      s"nest must be unwound: ${names(fs, new Path(dest, day))}")
    // the appender's file was displaced under its original partition name
    // for the caller's rescue pass, not deleted
    val late = lateTrees.filter(_._1 == day)
    assert(late.nonEmpty, s"displaced appender tree must be returned: $lateTrees")
    assert(late.exists { case (_, p) =>
      fs.exists(new Path(p, "late.parquet")) },
      s"late file must survive in the displaced tree: $lateTrees")
  }
}
