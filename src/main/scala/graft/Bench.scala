package graft

import org.apache.spark.sql.SparkSession

/**
 * Benchmark main (driver contract): times every SparkEntry query on
 * SPARK_GRAFT_SF_DIR, prints ONE JSON line with per-query seconds.
 *
 * Compile-aware measurement: each query runs `SPARK_GRAFT_BENCH_REPS`
 * times (default 3) back-to-back — the first run is recorded as `cold`
 * (it pays that query's one-time whole-stage-codegen compile plus any
 * not-yet-JITed machinery), the minimum of the remaining runs as `steady`
 * (the engine's repeatable per-query time, the number regressions are
 * judged on). Round 3 demonstrated why: with zero source changes the
 * single-shot bench moved ±40% on individual dedup queries purely from
 * which family member absorbed the shared codegen compile, masking any
 * real regression of that size. The headline `value` is the steady total;
 * the cold series is kept alongside it so launch-dominated costs stay
 * visible rather than silently discarded.
 *
 * A warm-up pass (session bring-up, parquet footers, codegen/JIT of the
 * scan+agg machinery) still runs before timing so even the cold series
 * isn't charged the fixed JVM startup cost — the bench target is per-query
 * engine time, not sbt/JVM launch.
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = math.max(2, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm-up: touch every table's footer + exercise scan/shuffle/agg codegen.
    graft.sources.Tables.names.foreach { t =>
      try graft.sources.Tables.read(spark, sfDir, t).limit(1).collect()
      catch { case _: Throwable => }
    }
    try {
      graft.sources.Tables.pipelineRuns(spark, sfDir)
        .groupBy("pipeline_status").count().collect()
    } catch { case _: Throwable => }

    // (name, reps): rep 1 is cold, min of reps 2..n is steady. Reps run
    // back-to-back per query so the steady runs reuse the compiled plan but
    // NOT cached data — nothing is persisted between reps except what the
    // query itself caches (the dedup shingle cache is plan-keyed and shared,
    // exactly as in the composite-funnel production shape).
    // Optional comma-separated name filter for isolation runs (measuring
    // one query without the rest of the suite's GC/JIT neighborhood).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => only.forall(_.contains(q._1)))
      .map { case (name, fn) =>
      val times = (1 to reps).map { i =>
        val t0 = System.nanoTime()
        // A failed query must be VISIBLE: a swallowed exception records its
        // time-to-throw as if it were a measurement (a 0.1 s "steady" that
        // masked a missing function registration in a name-filtered run).
        // A failed rep records the -1 sentinel — its time-to-throw must not
        // leak into the cold/steady aggregates either — and the error goes
        // to stderr.
        try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"bench: $name rep $i FAILED: $e")
          -1.0
        }
      }
      (name, times)
    }
    // -1 sentinel reps are excluded everywhere: a query whose every warm rep
    // failed reports steady = -1 (visibly broken), and failed queries never
    // deflate the totals.
    def cold(t: Seq[Double]) = t.head
    def steady(t: Seq[Double]) = { val ok = t.tail.filter(_ >= 0); if (ok.nonEmpty) ok.min else -1.0 }
    val steadyTotal = results.map(t => steady(t._2)).filter(_ >= 0).sum
    val coldTotal = results.map(t => cold(t._2)).filter(_ >= 0).sum
    val nFailed = results.count(_._2.exists(_ < 0))
    val notes = "steady=min of warm reps (regression gauge), cold=first run " +
      "(includes per-query codegen compile); full per-rep series in the " +
      "detail file; slow-JIT queries (x2) need 4+ warm reps to reach their " +
      "floor - isolation floors + analysis in docs/BENCH_notes_r6.md"
    // Full audit record as a repo file: the stdout line was truncated in
    // the round-3/4 driver records, so the complete cold+steady+per-rep
    // series must be readable without re-running the bench.
    val full = new StringBuilder()
      .append("{\n")
      .append(s"""  "metric": "total_steady", "value": $steadyTotal, "unit": "sec",\n""")
      .append(s"""  "total_cold": $coldTotal, "reps": $reps, "sf": "$sfDir",\n""")
      .append(s"""  "notes": "$notes",\n""")
      .append("  \"queries\": {\n")
      .append(results.map { case (n, t) =>
        s"""    "$n": {"cold": ${cold(t)}, "steady": ${steady(t)}, "reps": [${t.mkString(", ")}]}"""
      }.mkString(",\n"))
      .append("\n  }\n}\n").toString
    // Default detail path resolves against the REPO ROOT (walk up from
    // this class's code source to the nearest build.sbt), not the CWD — a
    // bench launched from elsewhere would otherwise silently grow a docs/
    // tree there. Explicit SPARK_GRAFT_BENCH_OUT stays CWD-relative (the
    // caller asked for that path); the stdout line advertises the
    // ABSOLUTE path either way.
    val docsDir = sys.env.get("SPARK_GRAFT_BENCH_OUT") match {
      case Some(p) => java.nio.file.Paths.get(p).toAbsolutePath.getParent
      case None =>
        // CodeSource (or its location) can legitimately be null under
        // launcher/boot classloaders — fall back to the CWD rather than
        // dying before any output is written
        val codeSrc = for {
          cs <- Option(Bench.getClass.getProtectionDomain.getCodeSource)
          loc <- Option(cs.getLocation)
        } yield java.nio.file.Paths.get(loc.toURI)
        codeSrc
          .flatMap(start => Iterator.iterate(start)(_.getParent)
            .takeWhile(_ != null)
            .find(p => java.nio.file.Files.exists(p.resolve("build.sbt"))))
          .getOrElse(java.nio.file.Paths.get("").toAbsolutePath)
          .resolve("docs")
    }
    // A name-filtered run measures a PARTIAL suite: never let it clobber
    // the canonical full-suite records — divert the default detail file
    // and skip the BENCH_line.json copy (explicit SPARK_GRAFT_BENCH_OUT
    // still goes exactly where the caller pointed it).
    val outFile = sys.env.get("SPARK_GRAFT_BENCH_OUT")
      .map(p => java.nio.file.Paths.get(p).toAbsolutePath)
      .getOrElse(docsDir.resolve(
        if (only.isDefined) "BENCH_filtered_latest.json" else "BENCH_full_latest.json"))
    try {
      Option(outFile.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.write(outFile, full.getBytes("UTF-8"))
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"bench: could not write $outFile: $e")
    }
    // ONE compact JSON line for the driver: the steady per-query map only
    // (the cold/per-rep series live in the detail file — the two-series
    // line was what overflowed the driver's captured tail). `value` stays
    // the steady total, as introduced in round 4; the metric name says so
    // explicitly so cross-round trending tools compare like with like.
    def series(sel: Seq[Double] => Double): String =
      results.map(t => "\"" + t._1 + "\":" + sel(t._2)).mkString("{", ",", "}")
    val line = s"""{"metric":"total_steady","value":$steadyTotal,"unit":"sec",""" +
      s""""queries":${series(steady)},"total_cold":$coldTotal,"reps":$reps,""" +
      s""""sf":"$sfDir","detail":"$outFile"}"""
    // The line ALSO lands in a known repo file: three rounds of driver
    // records failed to parse the sbt-logged stdout copy ("[info] "
    // prefix), so a machine-readable copy must exist independent of how
    // the launcher captures stdout. Partial (name-filtered) runs don't
    // write it — their totals would masquerade as the full suite's.
    if (only.isEmpty) {
      try java.nio.file.Files.write(docsDir.resolve("BENCH_line.json"),
        (line + "\n").getBytes("UTF-8"))
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"bench: could not write BENCH_line.json: $e")
      }
    }
    println(line)
    // The stdout copy has failed to parse in four consecutive driver
    // records (sbt's "[info] " prefix, then tail truncation once the
    // suite grew past the captured-tail size). stderr is NOT wrapped by
    // sbt's log formatter, so a raw copy there gives the driver a second,
    // prefix-free capture channel; the line stays compact (steady map
    // only) so it fits any reasonable tail window.
    System.err.println(line)
    // FIFTH-strike fix: even the steady-map-only line outgrew the driver's
    // captured tail at 121 queries (BENCH_r07 again started mid-JSON). The
    // LAST thing on both streams is therefore a totals-only line (~100
    // bytes) that survives any tail window; the per-query map lives one
    // line up and in the detail file.
    val totals = s"""{"metric":"total_steady","value":$steadyTotal,""" +
      s""""unit":"sec","total_cold":$coldTotal,"n":${results.size},""" +
      s""""n_failed":$nFailed,"sf":"$sfDir"}"""
    println(totals)
    System.err.println(totals)
    spark.stop()
  }
}
