package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.CosineSimilarityF32

/**
 * SparkSessionExtensions entry point — the deployment route for the engine's
 * custom Catalyst expressions: any session created with
 * `spark.sql.extensions=graft.GraftExtensions` (or
 * `.withExtensions(new GraftExtensions)`) gets `cosine_f32` in its function
 * registry with no imperative registration call. Cluster-wide installs put
 * the class name in spark-defaults.conf and every session — including ones
 * the engine never sees, e.g. a JDBC gateway — can use the functions in SQL.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_f32"),
      new ExpressionInfo(classOf[CosineSimilarityF32].getName, "cosine_f32"),
      (children: Seq[Expression]) => CosineSimilarityF32(children(0), children(1))))
  }
}

/**
 * Session factory with the engine's recommended configuration: UTC (oracle
 * parity), AQE on (runtime re-planning, skew splitting), shuffle parallelism
 * sized to the executor cores rather than the 200 default, and the graft
 * extensions installed.
 */
object GraftSession {
  def builder(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession.Builder =
    SparkSession.builder()
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.shuffle.partitions", cores.toString)

  def local(cores: Int = 4): SparkSession = {
    val s = builder(cores).master(s"local[$cores]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
