package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{DedupOps, EventOps, PrepOps}

/** Fixtures for the round-6 funnel / query-by-doc / cube operators. */
class FunnelSearchSpec extends SparkSpec {
  import spark.implicits._

  private def eventsOf(rows: (Long, Long, String, String)*): DataFrame =
    rows.toDF("event_id", "user_id", "event_type", "s")
      .select(col("event_id"), col("user_id"), col("event_type"),
        to_timestamp(col("s")).as("ts"))

  test("funnelCensus: strict ordering and first-touch anchors") {
    val ev = eventsOf(
      // user 1 converts fully in order
      (1L, 1L, "view", "2024-01-15 10:00:00"),
      (2L, 1L, "click", "2024-01-15 10:05:00"),
      (3L, 1L, "purchase", "2024-01-15 10:10:00"),
      // user 2: click BEFORE the first view — stage 2 must not count it
      (4L, 2L, "click", "2024-01-15 09:00:00"),
      (5L, 2L, "view", "2024-01-15 10:00:00"),
      // user 3: view then click, no purchase
      (6L, 3L, "view", "2024-01-15 08:00:00"),
      (7L, 3L, "click", "2024-01-15 08:30:00"),
      // user 4: purchase only — never enters the funnel
      (8L, 4L, "purchase", "2024-01-15 12:00:00"))
    val r = EventOps.funnelCensus(ev, Seq("view", "click", "purchase"))
      .collect().map(x => (x.getInt(0), x.getString(1), x.getLong(2)))
    assert(r.toSeq === Seq((1, "view", 3L), (2, "click", 2L), (3, "purchase", 1L)))
  }

  test("funnelCensus first-touch: a click between two views only counts after the FIRST") {
    val ev = eventsOf(
      (1L, 1L, "view", "2024-01-15 10:00:00"),
      (2L, 1L, "view", "2024-01-15 11:00:00"),
      (3L, 1L, "click", "2024-01-15 10:30:00"))
    val r = EventOps.funnelCensus(ev, Seq("view", "click"))
      .collect().map(x => (x.getInt(0), x.getLong(2))).toSeq
    assert(r === Seq((1, 1L), (2, 1L)))
  }

  test("similarDocs ranks the near-identical doc first and excludes the query doc") {
    val d = docsOf(
      (1L, "the quick brown fox jumps over the lazy dog", "en", "s"),
      (2L, "the quick brown fox jumps over the lazy cat", "en", "s"),
      (3L, "a completely different document entirely here", "en", "s"),
      (4L, "the quick brown fox jumps over the lazy dog", "en", "s"))
    val r = DedupOps.similarDocs(d, 1L, 10).collect()
    assert(r.head.getLong(0) === 4L) // identical text -> jaccard 1.0 first
    assert(r.head.getDouble(1) === 1.0)
    assert(!r.map(_.getLong(0)).contains(1L))
    val byId = r.map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(byId(2L) > byId.getOrElse(3L, 0.0))
  }

  test("cubeCensus covers all grouping sets with consistent masses") {
    val d = docsOf(
      (1L, "one two three", "en", "s"),
      (2L, "four five", "de", "s"),
      (3L, "six", "en", "s"))
    val rows = PrepOps.cubeCensus(d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(rows(("(all)", "(all)")) === ((3L, 6L)))
    assert(rows(("(all)", "en")) === ((2L, 4L)))
    assert(rows(("(all)", "de")) === ((1L, 2L)))
    // per-(split,lang) rows sum to the grand total
    val leaves = rows.filter { case ((s, l), _) => s != "(all)" && l != "(all)" }
    assert(leaves.values.map(_._1).sum === 3L)
    assert(leaves.values.map(_._2).sum === 6L)
    // the split marginals agree with the leaves
    for ((s, g) <- leaves.groupBy(_._1._1)) {
      assert(rows((s, "(all)")) === ((g.values.map(_._1).sum, g.values.map(_._2).sum)))
    }
  }

  test("propsExtractCensus: malformed, missing-key, wrong-type, and null " +
      "props all surface as NULL — never a job failure") {
    val ev = Seq(
      (1L, "click", """{"k": 5}"""),
      (2L, "click", """{"k": 7}"""),
      (3L, "click", """not json at all"""),    // malformed
      (4L, "click", """{"other": 1}"""),       // missing key
      (5L, "view", """{"k": "oops"}"""),       // wrong type
      (6L, "view", null.asInstanceOf[String])) // null props
      .toDF("event_id", "event_type", "props")
    val r = EventOps.propsExtractCensus(ev).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toSeq
    assert(r == Seq(("click", 4L, 2L), ("view", 2L, 0L)), r.mkString(","))
    val click = EventOps.propsExtractCensus(ev)
      .filter(col("event_type") === "click").collect().head
    assert((click.getLong(3), click.getLong(4), click.getLong(5)) == ((12L, 5L, 7L)))
  }

  test("winsorCensus: nearest-rank thresholds clip exactly one tail value") {
    // click: values 1..100 → p1 rank ceil(100/100)=1 → lo=1_000_000;
    // p99 rank 99 → hi=99_000_000; only v=100 clips high, nothing clips low
    // (v=1 == lo). view: constant value → lo=hi, nothing clips.
    val ev = ((1 to 100).map(i => (i.toLong, "click", i.toDouble)) ++
      (1 to 10).map(i => (200L + i, "view", 2.5)))
      .toDF("event_id", "event_type", "value")
    val r = EventOps.winsorCensus(ev, 1, 99).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4), x.getLong(5), x.getLong(6), x.getLong(7))).toSeq
    val rawClick = (1 to 100).map(_.toLong * 1000000L).sum
    assert(r == Seq(
      ("click", 100L, 1000000L, 99000000L, rawClick, rawClick - 1000000L, 0L, 1L),
      ("view", 10L, 2500000L, 2500000L, 25000000L, 25000000L, 0L, 0L)),
      r.mkString(","))
  }

  test("madOutlierCensus: median/MAD by hand — one fat-finger outlier flagged") {
    // click: 1..9 plus 1000. n=10 → median rank 5 → med=5. |v−5| multiset
    // {0,1,1,2,2,3,3,4,4,995} → MAD rank 5 → 2. Outlier iff d > 3·2=6:
    // only the 995. view: constant → MAD 0, nothing flagged.
    val ev = ((1 to 9).map(i => (i.toLong, "click", i.toDouble)) :+
      (10L, "click", 1000.0)) ++ (1 to 4).map(i => (100L + i, "view", 2.5))
    val r = EventOps.madOutlierCensus(ev.toDF("event_id", "event_type", "value"), 3)
      .collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4), x.getLong(5))).toSeq
    assert(r == Seq(
      ("click", 10L, 5000000L, 2000000L, 1L, 995000000L),
      ("view", 4L, 2500000L, 0L, 0L, 0L)), r.mkString(","))
  }

  test("cusumCensus: scaled-integer recurrence by hand — drift alarms, clamp resets") {
    import spark.implicits._
    // one type, daily counts 1,9,9,1 → n=4, S=20, slack=1, h=2 (n·h=8):
    // T = 0, 12(alarm, first=01-02), 24(alarm), 4 → alarms 2, max 24
    val rows = Seq(("2024-01-01", 1), ("2024-01-02", 9), ("2024-01-03", 9),
      ("2024-01-04", 1)).flatMap { case (d, k) =>
      (1 to k).map(i => (s"$d 00:0$i:00", "click"))
    }
    val ev = rows.toDF("s", "event_type")
      .select(to_timestamp(col("s")).as("ts"), col("event_type"))
    val r = EventOps.cusumCensus(ev, slack = 1, h = 2).collect().head
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getDate(4).toString) == (("click", 4L, 2L, 24L, "2024-01-02")), r.toString)
  }

  test("eventLiftCensus: hand-checked lift; pair generation bounded per user") {
    import spark.implicits._
    // users: 1:{A,B} 2:{A} 3:{B} 4:{A,B} → U=4, supp 3/3, AB=2,
    // lift = ⌊1e6·4·2/9⌋ = 888888
    val ev = Seq((1L, "A"), (1L, "B"), (1L, "A"), (2L, "A"), (3L, "B"),
      (4L, "A"), (4L, "B")).toDF("user_id", "event_type")
    val r = EventOps.eventLiftCensus(ev).collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2), x.getLong(3))).toSeq
    assert(r == Seq(("A", "B", 2L, 888888L)), r.mkString(","))
  }

  test("funnelLatencyCensus: anchor-to-anchor latencies by hand") {
    import spark.implicits._
    // user 1: view@0s, click@10s, purchase@70s → 10s then 60s
    // user 2: view@0s, click@30s, no purchase → only stage-1 latency
    val ev = Seq(
      (1L, 1L, "view", "2024-01-15 10:00:00"),
      (2L, 1L, "click", "2024-01-15 10:00:10"),
      (3L, 1L, "purchase", "2024-01-15 10:01:10"),
      (4L, 2L, "view", "2024-01-15 11:00:00"),
      (5L, 2L, "click", "2024-01-15 11:00:30"))
      .toDF("event_id", "user_id", "event_type", "s")
      .withColumn("ts", to_timestamp(col("s")))
    val r = EventOps.funnelLatencyCensus(ev, Seq("view", "click", "purchase"))
      .collect()
      .map(x => (x.getInt(0), x.getString(1), x.getLong(2), x.getLong(3),
        x.getLong(4), x.getLong(5))).toSeq
    assert(r == Seq(
      (1, "view->click", 2L, 10000000L, 30000000L, 30000000L),
      (2, "click->purchase", 1L, 60000000L, 60000000L, 60000000L)),
      r.mkString(","))
  }

  test("dailyTrendCensus: rising, falling, and flat slopes — exact micro, sign-aware") {
    import spark.implicits._
    // up: 1,2,3 events on 3 days → slope exactly +1e6; down: 3,2,1 → −1e6
    // (exercises the truncation-parity branch); flat: 2,2,2 → 0
    def burst(t: String, day: Int, k: Int) =
      (1 to k).map(i => (t, s"2024-01-1$day 0$i:00:00"))
    val ev = (burst("up", 1, 1) ++ burst("up", 2, 2) ++ burst("up", 3, 3) ++
      burst("down", 1, 3) ++ burst("down", 2, 2) ++ burst("down", 3, 1) ++
      burst("flat", 1, 2) ++ burst("flat", 2, 2) ++ burst("flat", 3, 2))
      .toDF("event_type", "s").select(col("event_type"), to_timestamp(col("s")).as("ts"))
    val r = EventOps.dailyTrendCensus(ev).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3))).toSeq
    assert(r == Seq(("down", 3L, 6L, -1000000L), ("flat", 3L, 6L, 0L),
      ("up", 3L, 6L, 1000000L)), r.mkString(","))
  }

  test("interArrivalCensus: gaps attribute to the later event; nearest-rank exact") {
    import spark.implicits._
    // user 1: A@0s, B@10s, A@40s → B gets the 10s gap, A the 30s gap
    val ev = Seq(
      (1L, 1L, "A", "2024-01-15 10:00:00"),
      (2L, 1L, "B", "2024-01-15 10:00:10"),
      (3L, 1L, "A", "2024-01-15 10:00:40"))
      .toDF("event_id", "user_id", "event_type", "s")
      .withColumn("ts", to_timestamp(col("s")))
    val r = EventOps.interArrivalCensus(ev).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4))).toSeq
    assert(r == Seq(
      ("A", 1L, 30000000L, 30000000L, 30000000L),
      ("B", 1L, 10000000L, 10000000L, 10000000L)), r.mkString(","))
  }

  test("chi2IndependenceCensus: a perfectly independent table scores exactly zero") {
    import spark.implicits._
    // A: 10×Mon 20×Tue; B: 5×Mon 10×Tue — margins multiply exactly, so
    // every cross-multiplied cell is 0
    val ev = (
      (1 to 10).map(i => ("A", "2024-01-15")) ++ (1 to 20).map(i => ("A", "2024-01-16")) ++
      (1 to 5).map(i => ("B", "2024-01-15")) ++ (1 to 10).map(i => ("B", "2024-01-16")))
      .toDF("event_type", "s").select(col("event_type"), to_timestamp(col("s")).as("ts"))
    val r = EventOps.chi2IndependenceCensus(ev).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3))).toSeq
    assert(r == Seq(("A", 30L, 2L, 0L), ("B", 15L, 2L, 0L)), r.mkString(","))
  }

  test("benfordCensus: uniform 1..9 digits — observed share and deviation by hand") {
    import spark.implicits._
    val df = (1 to 9).map(_.toDouble).toDF("v")
    val r = graft.operators.CurationOps.benfordCensus(df, "v").collect()
      .map(x => (x.getInt(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4))).toSeq
    assert(r.size == 9 && r.head == ((1, 1L, 111111L, 301030L, 189919L)), r.head.toString)
    assert(r.forall { case (_, n, obs, _, _) => n == 1L && obs == 111111L })
  }

  test("sessionFunnelCensus: conversion counted only within a session — " +
      "the cross-session contrast with x63") {
    import spark.implicits._
    // user 1: view 10:00, click 10:05 | (45-min gap) purchase 11:00.
    // Within-session: view 1, click 1, purchase 0 (it landed in session 2).
    // The user-level funnel (x63) WOULD count the purchase — the contrast.
    val ev = Seq(
      (1L, 1L, "view", "2024-01-15 10:00:00"),
      (2L, 1L, "click", "2024-01-15 10:05:00"),
      (3L, 1L, "purchase", "2024-01-15 11:00:00"))
      .toDF("event_id", "user_id", "event_type", "s")
      .withColumn("ts", to_timestamp(col("s")))
    val stages = Seq("view", "click", "purchase")
    val inSession = EventOps.sessionFunnelCensus(ev, stages, 30).collect()
      .map(r => (r.getInt(0), r.getLong(2))).toSeq
    assert(inSession == Seq((1, 1L), (2, 1L), (3, 0L)), inSession.mkString(","))
    val userLevel = EventOps.funnelCensus(ev, stages).collect()
      .map(r => (r.getInt(0), r.getLong(2))).toSeq
    assert(userLevel == Seq((1, 1L), (2, 1L), (3, 1L)), userLevel.mkString(","))
  }

  test("sessionTransitionCensus: in-session pairs only; probabilities row-normalize") {
    import spark.implicits._
    // user 1 session 1: A→B, B→A; session 2 (gap): B alone (no pair).
    // user 2: A→B. Totals: A→B 2, B→A 1 → P(B|A)=1e6, P(A|B)=1e6.
    val ev = Seq(
      (1L, 1L, "A", "2024-01-15 10:00:00"),
      (2L, 1L, "B", "2024-01-15 10:05:00"),
      (3L, 1L, "A", "2024-01-15 10:10:00"),
      (4L, 1L, "B", "2024-01-15 12:00:00"),
      (5L, 2L, "A", "2024-01-15 10:00:00"),
      (6L, 2L, "B", "2024-01-15 10:01:00"))
      .toDF("event_id", "user_id", "event_type", "s")
      .withColumn("ts", to_timestamp(col("s")))
    val r = EventOps.sessionTransitionCensus(ev, 30).collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2), x.getLong(3))).toSeq
    assert(r == Seq(("A", "B", 2L, 1000000L), ("B", "A", 1L, 1000000L)),
      r.mkString(","))
  }

  test("kmvDistinctCensus: unsaturated scope reports exact; merge row equals " +
      "the direct sketch; saturated estimate lands near truth") {
    import spark.implicits._
    val ev = ((1 to 200).map(u => (u.toLong, "A")) ++
      (1 to 50).map(u => (u.toLong, "B"))).toDF("user_id", "event_type")
    val r = EventOps.kmvDistinctCensus(ev, 64).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    // B never fills its sketch: estimate IS the exact count
    assert(r("B") == ((50L, 50L, 50L)), r("B").toString)
    // A saturates: deterministic estimate within 30% of 200
    val (exA, szA, estA) = r("A")
    assert(exA == 200L && szA == 64L && math.abs(estA - 200.0) / 200.0 < 0.3,
      r("A").toString)
    // users(B) ⊂ users(A): the merged __all must equal A's own sketch row
    assert(r("__all") == ((200L, 64L, estA)), r("__all").toString)
  }

  test("trailingWindowCensus: 7-day range frame — boundary inclusive, ties symmetric") {
    import spark.implicits._
    // user 1: 01-01, 01-04, 01-05(view), 01-09 ×2 (tie). Trailing 7d
    // counts ALL the user's events: 1, 2, 3, then 4 for EACH tied 01-09
    // row (value-based frame counts ties symmetrically; 01-01 is 8 days
    // out). user 2: 01-01 → 1; 01-08 → 2 (exactly 7 days = inclusive).
    val ev = Seq(
      (1L, 1L, "click", "2024-01-01 00:00:00"),
      (2L, 1L, "click", "2024-01-04 00:00:00"),
      (3L, 1L, "view", "2024-01-05 00:00:00"),
      (4L, 1L, "click", "2024-01-09 00:00:00"),
      (5L, 1L, "click", "2024-01-09 00:00:00"),
      (6L, 2L, "click", "2024-01-01 00:00:00"),
      (7L, 2L, "click", "2024-01-08 00:00:00"))
      .toDF("event_id", "user_id", "event_type", "s")
      .withColumn("ts", to_timestamp(col("s")))
    val r = EventOps.trailingWindowCensus(ev, 7).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3))).toSeq
    assert(r == Seq(
      ("click", 6L, 1L + 2L + 4L + 4L + 1L + 2L, 4L),
      ("view", 1L, 3L, 3L)), r.mkString(","))
  }
}
