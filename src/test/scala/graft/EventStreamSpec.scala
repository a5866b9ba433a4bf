package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{EventStream, SessionEvent}

/** Stateful streaming sessionization == the x11 batch operator. */
class EventStreamSpec extends SparkSpec {

  private def ev(uid: Long, ts: String, id: Long) =
    SessionEvent(uid, java.sql.Timestamp.valueOf(ts), id)

  test("stream sessions match batch sessionize across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[SessionEvent]
    // nonzero delay: after batch 1 the watermark sits at max(ts) - 10 min,
    // so user 2's batch-2 event (equal to batch 1's max ts) is NOT late
    val q = EventStream.sessionize(mem.toDS(), gapMinutes = 30, watermark = "10 minutes")
      .writeStream.format("memory").queryName("sess_out").outputMode("append").start()
    try {
      // user 1: two sessions (gap 45 min); user 2: one session, split
      // across micro-batches (gap 10 min spans the batch boundary)
      mem.addData(
        ev(1, "2024-01-15 10:00:00", 1), ev(1, "2024-01-15 10:10:00", 2),
        ev(2, "2024-01-15 10:00:00", 3))
      q.processAllAvailable()
      mem.addData(
        ev(1, "2024-01-15 10:55:00", 4), // 45 min gap -> closes session 1
        ev(2, "2024-01-15 10:10:00", 5))
      q.processAllAvailable()
      // sentinel far in the future: watermark passes every open session's
      // last + gap, so the event-time timeouts flush them
      mem.addData(ev(99, "2024-01-16 00:00:00", 6))
      q.processAllAvailable()

      val streamed = spark.table("sess_out")
        .select(col("user_id"), col("session_start").cast("string"), col("n_events"))
        .as[(Long, String, Long)].collect().toSet
      assert(streamed === Set(
        (1L, "2024-01-15 10:00:00", 2L),
        (1L, "2024-01-15 10:55:00", 1L),
        (2L, "2024-01-15 10:00:00", 2L)))

      // the batch operator over the union of all batches agrees on the
      // per-user census (minus the sentinel, which is still open — its
      // timeout needs a later watermark)
      val all = Seq(
        (1L, "2024-01-15 10:00:00", 1L), (1L, "2024-01-15 10:10:00", 2L),
        (2L, "2024-01-15 10:00:00", 3L), (1L, "2024-01-15 10:55:00", 4L),
        (2L, "2024-01-15 10:10:00", 5L))
        .toDF("user_id", "s", "event_id")
        .select(col("user_id"), to_timestamp(col("s")).as("ts"), col("event_id"))
      val batch = graft.operators.EventOps.sessionize(all, 30).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val streamCensus = streamed.groupBy(_._1).map { case (u, ss) =>
        u -> (ss.size.toLong, ss.map(_._3).max) }
      assert(streamCensus === batch)
    } finally q.stop()
  }

  test("sessionCensusReplay equals the batch census on a boundary-splitting fixture") {
    import spark.implicits._
    // 7 events, 3 slices of ⌈7/3⌉=3 → a session straddles each boundary
    val ev = Seq(
      (1L, "2024-01-15 10:00:00", 1L), (1L, "2024-01-15 10:10:00", 2L),
      (2L, "2024-01-15 10:15:00", 3L), (1L, "2024-01-15 10:20:00", 4L),
      (2L, "2024-01-15 12:00:00", 5L), (1L, "2024-01-15 12:00:00", 6L),
      (1L, "2024-01-15 12:10:00", 7L))
      .toDF("user_id", "s", "event_id")
      .select(col("user_id"), to_timestamp(col("s")).as("ts"), col("event_id"))
    val streamed = EventStream.sessionCensusReplay(ev, 30, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val batch = graft.operators.EventOps.sessionize(ev, 30).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(streamed == batch, s"stream=$streamed batch=$batch")
    assert(streamed == Seq((1L, 2L, 3L), (2L, 2L, 1L)))
  }

  test("dailyWindowCensusReplay: finalized windows equal the batch daily census") {
    import spark.implicits._
    // 3 days × 2 types, 7 events; slice size ⌈7/3⌉=3 → day 2's window
    // accumulates across two micro-batches before the sentinel finalizes it
    val ev = Seq(
      (1L, "A", "2024-01-15 10:00:00"), (2L, "B", "2024-01-15 11:00:00"),
      (3L, "A", "2024-01-16 09:00:00"), (4L, "A", "2024-01-16 10:00:00"),
      (5L, "B", "2024-01-16 11:00:00"), (6L, "A", "2024-01-17 08:00:00"),
      (7L, "B", "2024-01-17 09:00:00"))
      .toDF("event_id", "event_type", "s")
      .select(col("event_id"), col("event_type"), to_timestamp(col("s")).as("ts"))
    val r = EventStream.dailyWindowCensusReplay(ev, 3).collect()
      .map(x => (x.getDate(0).toString, x.getString(1), x.getLong(2))).toSeq
    assert(r == Seq(
      ("2024-01-15", "A", 1L), ("2024-01-15", "B", 1L),
      ("2024-01-16", "A", 2L), ("2024-01-16", "B", 1L),
      ("2024-01-17", "A", 1L), ("2024-01-17", "B", 1L)), r.mkString(","))
  }

  test("replay harnesses drop their memory-sink temp views (no catalog leak)") {
    import spark.implicits._
    val ev = Seq(
      (1L, "2024-01-15 10:00:00", 1L), (1L, "2024-01-15 10:10:00", 2L),
      (2L, "2024-01-15 11:00:00", 3L))
      .toDF("user_id", "s", "event_id")
      .select(col("user_id"), to_timestamp(col("s")).as("ts"), col("event_id"))
    val r1 = EventStream.sessionCensusReplay(ev, 30, 2)
    val evT = ev.select(col("event_id"), lit("A").as("event_type"), col("ts"))
    val r2 = EventStream.dailyWindowCensusReplay(evT, 2)
    // results stay usable after the view is gone…
    assert(r1.count() == 2 && r2.count() == 1)
    // …and nothing named like a replay sink survives in the catalog
    val leaked = spark.catalog.listTables().collect().map(_.name)
      .filter(n => n.startsWith("graft_sess_replay_") || n.startsWith("graft_win_replay_"))
    assert(leaked.isEmpty, s"leaked sink views: ${leaked.mkString(",")}")
  }

  test("the stream-gate partition pin never touches the PARENT session's conf") {
    // Round 13: the stateful gates run in a CHILD session pinned to 4
    // shuffle partitions BECAUSE the verify harness plans batch queries
    // concurrently in the parent — a set/restore on the parent would
    // race. This locks the isolation: the parent's conf is unchanged
    // after a replay, and the returned frame lives on the parent.
    import spark.implicits._
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val ev = Seq(
      (1L, "2024-01-15 10:00:00", 1L), (2L, "2024-01-15 11:00:00", 2L))
      .toDF("user_id", "s", "event_id")
      .select(col("user_id"), to_timestamp(col("s")).as("ts"), col("event_id"))
    val r = EventStream.sessionCensusReplay(ev, 30, 2)
    assert(r.count() == 2)
    assert(spark.conf.get("spark.sql.shuffle.partitions") == before,
      "the stream gate mutated the parent session's shuffle partitions")
    assert(r.sparkSession eq spark,
      "the replay census must return on the PARENT session")
  }

  test("fileStreamRecoveryCensus: restart from checkpoint lands on the batch census") {
    import spark.implicits._
    // 3 days × 2 types over 8 events; 4 slices of 2, restart every 2 →
    // THREE incarnations: earlier slices' counts live ONLY in the
    // recovered state store, day 1's window (watermark delay 1 day)
    // finalizes before a stop so the resumed sink must not duplicate it,
    // and the sentinel's flush batch runs in a freshly-recovered query
    val ev = Seq(
      (1L, "A", "2024-01-15 10:00:00"), (2L, "B", "2024-01-15 11:00:00"),
      (3L, "A", "2024-01-16 09:00:00"), (4L, "A", "2024-01-16 10:00:00"),
      (5L, "B", "2024-01-16 11:00:00"), (6L, "A", "2024-01-17 08:00:00"),
      (7L, "B", "2024-01-17 09:00:00"), (8L, "A", "2024-01-17 10:00:00"))
      .toDF("event_id", "event_type", "s")
      .select(col("event_id"), col("event_type"), to_timestamp(col("s")).as("ts"))
    val r = EventStream.fileStreamRecoveryCensus(ev, 4, 2).collect()
      .map(x => (x.getDate(0).toString, x.getString(1), x.getLong(2))).toSeq
    assert(r == Seq(
      ("2024-01-15", "A", 1L), ("2024-01-15", "B", 1L),
      ("2024-01-16", "A", 2L), ("2024-01-16", "B", 1L),
      ("2024-01-17", "A", 2L), ("2024-01-17", "B", 1L)), r.mkString(","))
  }

  test("out-of-order events WITHIN a micro-batch sessionize correctly") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[SessionEvent]
    val q = EventStream.sessionize(mem.toDS(), gapMinutes = 30, watermark = "0 seconds")
      .writeStream.format("memory").queryName("sess_ooo").outputMode("append").start()
    try {
      // delivered out of order; sorted fold must see 10:00, 10:20, 11:30
      mem.addData(
        ev(7, "2024-01-15 11:30:00", 3),
        ev(7, "2024-01-15 10:00:00", 1),
        ev(7, "2024-01-15 10:20:00", 2))
      q.processAllAvailable()
      mem.addData(ev(99, "2024-01-16 00:00:00", 9))
      q.processAllAvailable()
      val out = spark.table("sess_ooo")
        .filter(col("user_id") === 7)
        .select(col("session_start").cast("string"), col("n_events"))
        .as[(String, Long)].collect().toSet
      assert(out === Set(("2024-01-15 10:00:00", 2L), ("2024-01-15 11:30:00", 1L)))
    } finally q.stop()
  }
}
