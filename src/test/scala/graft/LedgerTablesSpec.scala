package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.sources.LedgerTables

/**
 * Physical-design checks for the 100 TB story: the day-partitioned ledger
 * turns the reference's coarse day-band filter into partition pruning.
 */
class LedgerTablesSpec extends SparkSpec {

  test("day-band filter prunes partitions at planning time") {
    val rows = (0 until 200).map { i =>
      ((i + 1).toLong, "p", "i",
        f"2024-01-${1 + i % 20}%02d 10:00:00", f"2024-01-${1 + i % 20}%02d 11:00:00",
        "completed")
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_ledger").toString
    LedgerTables.write(ledgerOf(rows: _*), tmp)
    val back = LedgerTables.read(spark, tmp)
    val q = back.filter(
      col("query_window_start_day") <= lit(java.sql.Date.valueOf("2024-01-03")) &&
      col("query_window_end_day") >= lit(java.sql.Date.valueOf("2024-01-02")))
    val scan = q.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: FileSourceScanExec => s
    }.get
    // 20 day-partitions on disk; the band [.., 03] must plan to read at most 3
    assert(scan.metadata("PartitionFilters").contains("query_window_start_day"),
      s"no partition filter in: ${scan.metadata("PartitionFilters")}")
    val selected = scan.relation.location.listFiles(scan.partitionFilters, scan.dataFilters)
    assert(selected.length <= 3, s"expected <=3 pruned partitions, got ${selected.length}")
    assert(q.count() == rows.count { case (_, _, _, s, _, _) =>
      val d = s.substring(0, 10)
      d <= "2024-01-03" && d >= "2024-01-02" // end_day == start_day in this fixture
    })
  }

  test("DDL creates a partitioned catalog table idempotently") {
    LedgerTables.ensure(spark, "graft_ledger_ddl")
    LedgerTables.ensure(spark, "graft_ledger_ddl") // IF NOT EXISTS: no throw
    try {
      val cat = spark.catalog.listColumns("graft_ledger_ddl").collect()
      assert(cat.exists(c => c.name == "query_window_start_day" && c.isPartition))
    } finally spark.sql("DROP TABLE IF EXISTS graft_ledger_ddl")
  }
}
