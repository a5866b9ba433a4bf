package graft

import graft.operators.{ContinuityOps, OverlapOps, StatusOps}

/**
 * Semantic quirks preserved bit-for-bit from the reference (SURVEY.md §7.3;
 * FIXTURES.md §Unit/property fixtures):
 *  - half-open overlap: touching windows do NOT overlap (`overlap_checks.py:59-60`)
 *  - gap detector's `!=` also flags overlaps (`snowflake_tasks.py:403`)
 *  - self-join hides identical-start pairs (`snowflake_tasks.py:548`)
 *  - deterministic top-1 tie-break on record_id (declared deviation, defect #5)
 */
class OverlapSemanticsSpec extends SparkSpec {

  private def day(h: Int, m: Int = 0) = f"2024-01-15 $h%02d:$m%02d:00"

  test("touching windows do not overlap (strict half-open interval)") {
    val l = ledgerOf(
      (1L, "p", "i", day(10), day(11), "completed"),
      (2L, "p", "i", day(11), day(12), "completed"))
    val r6 = OverlapOps.findOverlappingQueryWindows(l, "p", "i", "2024-01-15")
    assert(r6.isEmpty)
    // input window touching at the boundary is also not an overlap
    val r1 = OverlapOps.findOverlappingRecordsForInput(
      l, "p", "i", "2024-01-15 12:00:00", "2024-01-15 13:00:00")
    assert(r1.isEmpty)
  }

  test("overlapping windows are reported in both directions") {
    val l = ledgerOf(
      (1L, "p", "i", day(10), day(11, 30), "completed"),
      (2L, "p", "i", day(11), day(12), "completed"))
    val rows = OverlapOps.findOverlappingQueryWindows(l, "p", "i", "2024-01-15").collect()
    assert(rows.length == 2) // (1,2) and (2,1)
  }

  test("identical start_ts pairs are hidden by the != quirk") {
    val l = ledgerOf(
      (1L, "p", "i", day(10), day(11), "completed"),
      (2L, "p", "i", day(10), day(12), "completed"))
    assert(OverlapOps.findOverlappingQueryWindows(l, "p", "i", "2024-01-15").isEmpty)
  }

  test("gap detector flags gaps AND overlaps (the != semantics), not touching windows") {
    val l = ledgerOf(
      (1L, "p", "i", day(8), day(9), "completed"),   // touches next: no gap
      (2L, "p", "i", day(9), day(10), "completed"),  // gap to next
      (3L, "p", "i", day(11), day(12), "completed"), // overlaps next start < this end
      (4L, "p", "i", day(11, 30), day(13), "completed"))
    val gaps = ContinuityOps.discontinuities(l, "p", "i", "2024-01-15").collect()
    assert(gaps.length == 2)
    assert(gaps(0).getTimestamp(0).toString.startsWith("2024-01-15 10:00")) // gap [10:00, 11:00)
    assert(gaps(1).getTimestamp(0).toString.startsWith("2024-01-15 12:00")) // "gap" from overlap
  }

  test("empty slice: R5 reports continuous, R3/R4 report no record") {
    val l = ledgerOf((1L, "p", "i", day(10), day(11), "completed"))
    val (cont, gaps) = ContinuityOps.continuityReport(l, "nope", "i", "2024-01-15")
    assert(cont && gaps.isEmpty)
    assert(StatusOps.headAsIsoMap(StatusOps.oldestByStatus(l, "pending")).isEmpty)
  }

  test("top-1 picks lowest record_id under equal timestamps, ISO-formats row") {
    val l = ledgerOf(
      (7L, "p", "i", day(10), day(11), "pending"),
      (3L, "p", "i", day(10), day(11), "pending"),
      (9L, "p", "i", day(9), day(10), "failed"))
    val picked = StatusOps.headAsIsoMap(StatusOps.oldestByStatus(l, "pending")).get
    assert(picked("record_id") == "3")
    assert(picked("query_window_start_ts") == "2024-01-15T10:00:00Z")
  }

  test("banded band-join rewrite produces exactly the naive theta-join result") {
    // windows of varied lengths incl. cross-bucket spans and exact-boundary ends
    val rows = (0 until 60).map { i =>
      val startMin = (i * 37) % (24 * 60 - 180)
      val lenMin = 1 + (i * 13) % 180
      ((i + 1).toLong, "p", "i",
        f"2024-01-15 ${startMin / 60}%02d:${startMin % 60}%02d:00",
        f"2024-01-15 ${(startMin + lenMin) / 60}%02d:${(startMin + lenMin) % 60}%02d:00",
        "completed")
    }
    val l = ledgerOf(rows: _*)
    val naive = OverlapOps.findOverlappingQueryWindows(l, "p", "i", "2024-01-15")
      .collect().map(_.toString).sorted
    val banded = OverlapOps.overlappingWindowsBanded(l, "p", "i", "2024-01-15")
      .collect().map(_.toString).sorted
    assert(naive.nonEmpty) // sanity: the fixture actually produces overlaps
    assert(naive.toSeq == banded.toSeq)
  }

  test("intervalLookupCensus: banded containment equals the brute range join") {
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.001"
    val ledger = graft.sources.Tables.pipelineRuns(spark, d)
    val events = graft.sources.Tables.read(spark, d, "events")
    val banded = OverlapOps.intervalLookupCensus(ledger, events)
      .collect().map(_.toString).toSeq
    val brute = ledger.filter(col("pipeline_status") === "completed")
      .select(col("record_id"), col("pipeline_name"),
        col("query_window_start_ts").cast("timestamp").as("sts"),
        col("query_window_end_ts").cast("timestamp").as("ets"))
      .join(events.select(col("event_id"), col("ts").cast("timestamp").as("pts")),
        col("pts") >= col("sts") && col("pts") < col("ets"))
      .groupBy(col("pipeline_name"))
      .agg(count(lit(1)).as("matched_pairs"),
        countDistinct(col("event_id")).as("events_hit"),
        countDistinct(col("record_id")).as("runs_hit"))
      .orderBy(col("pipeline_name"))
      .collect().map(_.toString).toSeq
    assert(banded.nonEmpty && banded == brute,
      s"banded=$banded\nbrute=$brute")
  }
}
