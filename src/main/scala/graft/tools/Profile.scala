package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * Ad-hoc timing harness: `runMain graft.tools.Profile <sfDir> <name> [reps]`
 * times one SparkEntry query repeatedly on a warmed session (the bench
 * equivalent minus the per-JVM launch floor), so plan changes can be
 * A/B-tested without a full bench sweep.
 *
 * Measures `.count()` to mirror Bench exactly — note both therefore let the
 * optimizer drop a query's FINAL global sort (EliminateSorts under the count
 * aggregate); deltas that move work into or out of that sort need a write-
 * based measurement instead.
 */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toIndexedSeq
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Tables.names.foreach { t =>
      try graft.sources.Tables.read(spark, sfDir, t).limit(1).collect()
      catch { case _: Throwable => }
    }
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"PROFILE $name rep$i rows=$n ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
