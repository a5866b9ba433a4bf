package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * Plan-audit dump: `runMain graft.tools.Plans <sfDir> <outFile>` writes the
 * formatted physical plan of every SparkEntry query to one text file, plus
 * a summary line per query flagging CartesianProduct (banned outright) and
 * single-partition exchanges (legitimate only at single-row final merges
 * and the faithful reference shapes). Finer invariants — filter pushdown,
 * TakeOrderedAndProject, broadcast joins — are pinned per-query by
 * PlanQualitySpec in CI; this dump is the human-audit companion for
 * reading whole plans after adding an operator.
 */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val outFile = if (args.length > 1) args(1) else "docs/PLANS.txt"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val mode = org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    val entries = graft.SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val explained = try {
        val df = fn(spark, sfDir)
        df.collect() // finalize adaptive plans so the dump shows what ran
        df.queryExecution.explainString(mode)
      } catch { case e: Throwable => s"FAILED: $e" }
      // CartesianProduct is the banned shape; SinglePartition is
      // informational — legitimate for final single-row aggregates and the
      // faithful reference semantics (a5/r5), a bug anywhere data-sized.
      val flags = Seq(
        "CARTESIAN" -> explained.contains("CartesianProduct"),
        "single-partition exchange" -> explained.contains("SinglePartition")).collect {
        case (f, true) => f
      }
      (name, explained, flags)
    }
    val summary = entries.map { case (name, _, flags) =>
      f"$name%-28s ${if (flags.isEmpty) "clean" else flags.mkString(", ")}"
    }.mkString("== SUMMARY ==\n", "\n", "\n\n")
    val body = entries.map { case (name, explained, _) =>
      s"== $name ==\n$explained"
    }.mkString("\n")
    val p = java.nio.file.Paths.get(outFile)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p,
      (summary + body).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"PLANS written $outFile (${entries.size} queries)")
    spark.stop()
  }
}
