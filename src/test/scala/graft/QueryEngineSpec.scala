package graft

import graft.engine.QueryEngine

/** V1-V8 facade behavior (SURVEY.md §2.1). */
class QueryEngineSpec extends SparkSpec {

  private lazy val engine = new QueryEngine(spark)

  test("scalar / dataframe / tuples verbs with named parameter binding") {
    ledgerOf(
      (1L, "p", "i", "2024-01-15 10:00:00", "2024-01-15 11:00:00", "pending"),
      (2L, "p", "i", "2024-01-15 11:00:00", "2024-01-15 12:00:00", "completed"),
      (3L, "q", "i", "2024-01-15 12:00:00", "2024-01-15 13:00:00", "completed"))
      .createOrReplaceTempView("runs")
    val n = engine.executeScalarQuery(
      "SELECT COUNT(*) FROM runs WHERE pipeline_status = :s", Map("s" -> "completed"))
    assert(n.data.contains(2L))
    assert(n.queryId.nonEmpty)
    val df = engine.fetchAllRowsAsDataFrame(
      "SELECT record_id FROM runs WHERE pipeline_name = :p ORDER BY record_id",
      Map("p" -> "p"))
    assert(df.data.collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
    val rows = engine.fetchAllRowsAsTuples("SELECT record_id FROM runs ORDER BY record_id")
    assert(rows.data.length == 3)
  }

  test("scalar on empty result returns None (reference empty-branch O19)") {
    assert(engine.executeScalarQuery(
      "SELECT record_id FROM runs WHERE pipeline_status = 'nope'").data.isEmpty)
  }

  test("control command runs DDL; DML reports rows affected") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_dml").toString
    engine.executeControlCommand(
      s"CREATE TABLE graft_dml_t (id BIGINT, s STRING) USING PARQUET LOCATION '$tmp/t'")
    try {
      val ins = engine.executeDmlQuery(
        "INSERT INTO graft_dml_t SELECT record_id, pipeline_status FROM runs")
      assert(ins.data == 3L, s"rows_affected=${ins.data}")
      assert(engine.executeScalarQuery("SELECT COUNT(*) FROM graft_dml_t").data.contains(3L))
    } finally engine.executeControlCommand("DROP TABLE IF EXISTS graft_dml_t")
  }

  test("per-call database scoping resolves in the target db and restores the session db") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_scoped_db")
    val before = spark.catalog.currentDatabase
    try {
      engine.executeControlCommand(
        "CREATE TABLE IF NOT EXISTS t_scoped (id BIGINT) USING PARQUET",
        database = Some("graft_scoped_db"))
      assert(spark.catalog.tableExists("graft_scoped_db.t_scoped"))
      assert(spark.catalog.currentDatabase == before, "scope must not leak")
      val n = engine.executeScalarQuery("SELECT COUNT(*) FROM t_scoped",
        database = Some("graft_scoped_db"))
      assert(n.data.contains(0L))
      assert(spark.catalog.currentDatabase == before)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_scoped_db.t_scoped")
      spark.sql("DROP DATABASE IF EXISTS graft_scoped_db")
    }
  }

  test("liveness mirrors the reference's lazy-reconnect check") {
    assert(engine.isActive)
  }
}
