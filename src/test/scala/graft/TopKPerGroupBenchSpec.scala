package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Perf characterization of the top-k rewrite in its two cardinality
  * regimes (prints timings; asserts only row-equality, never wall-clock —
  * the decision this measured is recorded in docs/BENCH_notes_r8.md). */
class TopKPerGroupBenchSpec extends SparkSpec {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
  }

  test("characterize: few groups x many rows, and many groups x few rows") {
    graft.functions.GraftFunctions.register(spark)
    // regime A: 8 groups x 2M rows, k=3 (classic per-category top-k)
    val a = spark.range(2000000).select(
      (col("id") % 8).as("grp"),
      pmod(col("id") * 2654435761L, lit(1000003)).as("score"),
      col("id"))
    // regime B: 400k groups x ~5 rows, k=1 (the dedup-winner shape)
    val b = spark.range(2000000).select(
      (col("id") % 400000).as("grp"),
      pmod(col("id") * 2654435761L, lit(1000003)).as("score"),
      col("id"))
    def topk(df: org.apache.spark.sql.DataFrame, k: Int) = df
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("grp")).orderBy(col("score"), col("id"))))
      .filter(col("rn") <= k)
    // regime C: 4 groups x 20M rows, k=3 (the wide-group extreme where the
    // per-group sort is most expensive)
    val c = spark.range(20000000).select(
      (col("id") % 4).as("grp"),
      pmod(col("id") * 2654435761L, lit(1000003)).as("score"),
      col("id"))
    for ((name, df, k) <- Seq(("A few-groups", a, 3), ("B many-groups", b, 1),
        ("C wide-groups", c, 3))) {
      spark.conf.set("spark.graft.topk.rewrite", "true")
      val (n1, t1a) = time(topk(df, k).count()); val (_, t1b) = time(topk(df, k).count())
      spark.conf.set("spark.graft.topk.rewrite", "false")
      val (n2, t2a) = time(topk(df, k).count()); val (_, t2b) = time(topk(df, k).count())
      spark.conf.set("spark.graft.topk.rewrite", "true")
      assert(n1 == n2, s"$name: row counts diverge $n1 vs $n2")
      info(f"$name k=$k rows=$n1: rewrite ${t1a}%.2f/${t1b}%.2f s, window ${t2a}%.2f/${t2b}%.2f s")
    }
  }
}
