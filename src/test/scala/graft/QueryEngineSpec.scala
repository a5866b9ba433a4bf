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

  test("SQL-text UPDATE/DELETE on a catalog table dispatch to the rewrite path (V4)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_dml_sql").toString
    engine.executeControlCommand(
      s"CREATE TABLE graft_dml_u (id BIGINT, s STRING) USING PARQUET LOCATION '$tmp/u'")
    try {
      engine.executeDmlQuery(
        "INSERT INTO graft_dml_u VALUES (1, 'pending'), (2, 'pending'), (3, 'done')")
      val up = engine.executeDmlQuery(
        "UPDATE graft_dml_u SET s = :to WHERE s = :from",
        Map("to" -> "done", "from" -> "pending"))
      assert(up.data == 2L, s"rows_affected=${up.data}")
      assert(engine.executeScalarQuery(
        "SELECT COUNT(*) FROM graft_dml_u WHERE s = 'done'").data.contains(3L))
      val del = engine.executeDmlQuery(
        "DELETE FROM graft_dml_u WHERE id <= :k", Map("k" -> 2))
      assert(del.data == 2L, s"rows_affected=${del.data}")
      assert(engine.executeScalarQuery(
        "SELECT COUNT(*) FROM graft_dml_u").data.contains(1L))
      // no matching rows → 0 affected, data untouched
      assert(engine.executeDmlQuery(
        "DELETE FROM graft_dml_u WHERE id = 999").data == 0L)
      // a :name inside a string literal is data, not a parameter
      val lit = engine.executeDmlQuery(
        "UPDATE graft_dml_u SET s = 'ratio a:k b' WHERE id = :k", Map("k" -> 3))
      assert(lit.data == 1L)
      assert(engine.fetchAllRowsAsTuples(
        "SELECT s FROM graft_dml_u WHERE id = 3").data.head.getString(0) == "ratio a:k b")
      // WHERE inside a SET subquery must not split the statement
      val sub = engine.executeDmlQuery(
        "UPDATE graft_dml_u SET s = (SELECT 'x' WHERE 1 = 1) WHERE id = 3")
      assert(sub.data == 1L)
      assert(engine.fetchAllRowsAsTuples(
        "SELECT s FROM graft_dml_u WHERE id = 3").data.head.getString(0) == "x")
      // SET column names resolve case-insensitively like Spark's analyzer
      assert(engine.executeDmlQuery(
        "UPDATE graft_dml_u SET S = 'ci' WHERE id = 3").data == 1L)
      // WHERE immediately followed by a paren (no space) still parses
      assert(engine.executeDmlQuery(
        "UPDATE graft_dml_u SET s = 'p' WHERE(id = 3)").data == 1L)
      // a backslash-escaped quote inside a literal must not derail the scan
      val esc = engine.executeDmlQuery(
        "UPDATE graft_dml_u SET s = 'don\\'t' WHERE id = 3")
      assert(esc.data == 1L)
      assert(engine.fetchAllRowsAsTuples(
        "SELECT s FROM graft_dml_u WHERE id = 3").data.head.getString(0) == "don't")
      // malformed statements fail loudly even when zero rows would match
      intercept[Exception] {
        engine.executeDmlQuery("UPDATE graft_dml_u SET nosuchcol = 1 WHERE id = 999")
      }
    } finally engine.executeControlCommand("DROP TABLE IF EXISTS graft_dml_u")
  }

  test("SQL-text DML on a catalog table partitioned by a non-ledger column keeps its layout") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_dml_part").toString
    engine.executeControlCommand(
      s"""CREATE TABLE graft_dml_p (id BIGINT, s STRING, day STRING) USING PARQUET
         |PARTITIONED BY (day) LOCATION '$tmp/p'""".stripMargin)
    try {
      engine.executeDmlQuery(
        "INSERT INTO graft_dml_p VALUES (1, 'a', 'd1'), (2, 'b', 'd1'), (3, 'c', 'd2')")
      val up = engine.executeDmlQuery("UPDATE graft_dml_p SET s = 'z' WHERE id <= 2")
      assert(up.data == 2L)
      // the partition directories must survive the whole-table rewrite
      val fs = new org.apache.hadoop.fs.Path(s"$tmp/p")
        .getFileSystem(spark.sessionState.newHadoopConf())
      val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(s"$tmp/p"))
        .filter(_.isDirectory).map(_.getPath.getName).sorted
      assert(dirs.toSeq == Seq("day=d1", "day=d2"), dirs.mkString(","))
      assert(engine.executeScalarQuery(
        "SELECT COUNT(*) FROM graft_dml_p WHERE s = 'z'").data.contains(2L))
      assert(engine.executeScalarQuery(
        "SELECT COUNT(*) FROM graft_dml_p WHERE day = 'd2'").data.contains(1L))
      // updating the partition column is a partition move — rejected loudly
      intercept[Exception] {
        engine.executeDmlQuery("UPDATE graft_dml_p SET day = 'd9' WHERE id = 1")
      }
      val del = engine.executeDmlQuery("DELETE FROM graft_dml_p WHERE day = 'd2'")
      assert(del.data == 1L)
      assert(engine.executeScalarQuery(
        "SELECT COUNT(*) FROM graft_dml_p").data.contains(2L))
    } finally engine.executeControlCommand("DROP TABLE IF EXISTS graft_dml_p")
  }

  test("SQL-text UPDATE on the day-partitioned ledger path, multi-assignment SET") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_dml_ledger").toString + "/ledger"
    graft.sources.LedgerTables.write(ledgerOf(
      (1L, "p", "i", "2024-01-15 10:00:00", "2024-01-15 11:00:00", "pending"),
      (2L, "p", "i", "2024-01-15 11:00:00", "2024-01-15 12:00:00", "pending"),
      (3L, "p", "i", "2024-01-16 10:00:00", "2024-01-16 11:00:00", "completed")), tmp)
    val up = engine.executeDmlQuery(
      s"UPDATE parquet.`$tmp` SET pipeline_status = 'completed', records_count = records_count + 1 " +
        "WHERE pipeline_status = 'pending'")
    assert(up.data == 2L)
    val after = graft.sources.LedgerTables.read(spark, tmp)
      .filter(org.apache.spark.sql.functions.col("record_id") <= 2)
      .select("pipeline_status", "records_count").collect()
    assert(after.forall(r => r.getString(0) == "completed" && r.getDouble(1) == 2.0))
    val del = engine.executeDmlQuery(s"DELETE FROM parquet.`$tmp` WHERE record_id = 3")
    assert(del.data == 1L)
    assert(graft.sources.LedgerTables.read(spark, tmp).count() == 2L)
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
