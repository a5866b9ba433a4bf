package graft.operators

import org.apache.spark.sql.SparkSession

/** Temporary diagnostic: what the pair-shuffle sizing proxy reads at a
  * given fixture, unloaded vs loaded. */
object SizingProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/.bench/sfx100d")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables.read(spark, dir, "documents")
    val shArr = DedupOps.shingleRelation(docs)
    val pre = DedupOps.measuredLeafBytes(shArr.queryExecution.optimizedPlan)
    val preMass = DedupOps.measuredJoinMass(shArr.queryExecution.optimizedPlan)
    println(s"PROBE unloaded leaf bytes: $pre  calibrated massPerSess: ${preMass / 32 / (1L << 20)} MB")
    shArr.count()
    val fresh = DedupOps.shingleRelation(
      graft.sources.Tables.read(spark, dir, "documents"))
    val post = DedupOps.measuredLeafBytes(fresh.queryExecution.optimizedPlan)
    val postMass = DedupOps.measuredJoinMass(fresh.queryExecution.optimizedPlan)
    println(s"PROBE loaded leaf bytes: $post  calibrated massPerSess: ${postMass / 32 / (1L << 20)} MB")
    println(s"PROBE decision: ${DedupOps.pairShufflePartitions(fresh)}")
    spark.stop()
  }
}
