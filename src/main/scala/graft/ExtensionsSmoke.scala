package graft

/**
 * Smoke main for the SparkSessionExtensions deployment route. The extension
 * only takes effect at session construction, so this check needs a fresh
 * JVM (`sbt "runMain graft.ExtensionsSmoke"`) — inside the shared-session
 * test suite, getOrCreate would silently reuse the existing session and
 * ignore `spark.sql.extensions`.
 */
object ExtensionsSmoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    val r = spark.sql(
      "SELECT cosine_f32(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS a, " +
        "cosine_f32(array(1.0F, 0.0F), array(0.0F, 1.0F)) AS b").collect().head
    assert(r.getFloat(0) == 1f && r.getFloat(1) == 0f,
      s"unexpected cosine results: $r")
    val err = try { spark.sql("SELECT cosine_f32(array(1.0F))").collect(); "" }
    catch { case e: Throwable => e.getMessage }
    assert(err.contains("2 arguments"), s"arity error not surfaced: $err")
    println(s"EXTENSIONS_OK ext=${spark.conf.get("spark.sql.extensions")} " +
      s"tz=${spark.conf.get("spark.sql.session.timeZone")}")
    spark.stop()
  }
}
