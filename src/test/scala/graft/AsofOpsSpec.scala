package graft

import org.apache.spark.sql.functions._

import graft.operators.AsofOps

class AsofOpsSpec extends SparkSpec {

  test("as-of join picks the greatest right ts <= left ts per key, inclusive") {
    import spark.implicits._
    val left = Seq(
      (1L, "2024-01-15 10:00:00", 100L),
      (1L, "2024-01-15 12:00:00", 101L),
      (2L, "2024-01-15 09:00:00", 200L)
    ).toDF("k", "lts", "lid").withColumn("lts", to_timestamp(col("lts")))
    val right = Seq(
      (1L, "2024-01-15 09:30:00", 1.0),
      (1L, "2024-01-15 10:00:00", 2.0), // simultaneous with left 100 → inclusive match
      (1L, "2024-01-15 11:00:00", 3.0),
      (2L, "2024-01-15 09:30:00", 9.0)  // after left 200 → no match
    ).toDF("k", "rts", "v").withColumn("rts", to_timestamp(col("rts")))
    val out = AsofOps.asofJoin(left, right, Seq("k"), "lts", "rts", Seq("rts", "v"))
      .orderBy("lid").collect()
    assert(out.length == 3)
    assert(out(0).getAs[Double]("v") == 2.0)          // inclusive: same-instant right row wins
    assert(out(1).getAs[Double]("v") == 3.0)          // greatest rts <= 12:00
    assert(out(2).isNullAt(out(2).fieldIndex("v")))   // nothing at or before 09:00
  }

  test("a NULL field in the matched right row stays NULL (no back-fill from older rows)") {
    import spark.implicits._
    val left = Seq((1L, "2024-01-15 12:00:00", 1L))
      .toDF("k", "lts", "lid").withColumn("lts", to_timestamp(col("lts")))
    val right = Seq(
      (1L, "2024-01-15 10:00:00", Some(5.0)),
      (1L, "2024-01-15 11:00:00", None: Option[Double]) // the matched row, value NULL
    ).toDF("k", "rts", "v").withColumn("rts", to_timestamp(col("rts")))
    val out = AsofOps.asofJoin(left, right, Seq("k"), "lts", "rts", Seq("rts", "v")).collect()
    assert(out.length == 1)
    assert(out.head.getTimestamp(out.head.fieldIndex("rts")).toString.startsWith("2024-01-15 11:00"))
    assert(out.head.isNullAt(out.head.fieldIndex("v")),
      "matched row's NULL must not be back-filled from the 10:00 row")
  }

  test("as-of join distributes: window is partitioned by the join keys") {
    import spark.implicits._
    val leftDf = (1 to 100).map(i =>
      (i.toLong % 10, java.sql.Timestamp.valueOf(f"2024-01-15 10:${i % 60}%02d:00"), i.toLong))
      .toDF("k", "lts", "lid")
    val rightDf = (0 until 10).map(k =>
      (k.toLong, java.sql.Timestamp.valueOf("2024-01-15 10:00:00"), k * 1.0)).toDF("k", "rts", "v")
    val out = AsofOps.asofJoin(leftDf, rightDf, Seq("k"), "lts", "rts", Seq("v"))
    assert(out.count() == 100)
    // every left row has a right match (all rts at partition start)
    assert(out.filter(col("v").isNull).count() == 0)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), "expected a window-based plan")
  }
}
