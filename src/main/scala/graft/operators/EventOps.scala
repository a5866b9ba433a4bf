package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Event-stream batch operators over the `events` table — the classic
 * training-data/telemetry pipeline shapes.
 */
object EventOps {

  /**
   * Gap-based sessionization: a session breaks when a user's inter-event gap
   * exceeds `gapMinutes`. Two stacked windows, both partitioned by user, so
   * the whole computation distributes by user with no single-partition sort;
   * comparison is in exact microseconds (matching the oracle's
   * `ts - lag(ts) > INTERVAL n MINUTE`).
   * Output: per user — session count and largest session size.
   */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapUs = gapMinutes * 60_000_000L
    val flagged = events.select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("new_s",
        // cast: no-op on TIMESTAMP, and accepts TIMESTAMP_NTZ sources
        // (pyarrow-written parquet) deterministically under the UTC
        // session tz — unix_micros alone rejects NTZ
        when(lag(col("ts"), 1).over(w).isNull ||
             unix_micros(col("ts").cast("timestamp"))
               - unix_micros(lag(col("ts"), 1).over(w).cast("timestamp")) > gapUs, 1)
          .otherwise(0))
    val sessions = flagged
      .withColumn("sid", sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("sid"))
      .agg(count(lit(1)).as("n"))
    sessions.groupBy(col("user_id"))
      .agg(count(lit(1)).as("sessions"), max(col("n")).as("max_events"))
      .orderBy(col("user_id"))
  }

  /**
   * Per-event session assignment — [[sessionize]]'s internals exposed as a
   * PRIMITIVE: every event labeled with its (user, session) id, all input
   * columns preserved. The composition point for within-session analyses
   * (x137 within-session funnel, x138 transition census): downstream
   * operators group on (user_id, sid) instead of re-deriving gap logic.
   * Same two stacked user-partitioned windows as the census form; the
   * session id is the running count of gap breaks in (ts, event_id) order.
   */
  def sessionAssign(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapUs = gapMinutes * 60_000_000L
    events
      .withColumn("__new_s",
        when(lag(col("ts"), 1).over(w).isNull ||
          unix_micros(col("ts").cast("timestamp"))
            - unix_micros(lag(col("ts"), 1).over(w).cast("timestamp")) > gapUs, 1L)
          .otherwise(0L))
      .withColumn("sid",
        sum(col("__new_s")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__new_s")
  }

  /**
   * x137: WITHIN-SESSION funnel — how many sessions contain `stages(0)`,
   * then `stages(1)` strictly after it in the SAME session, … — the
   * conversion question [[funnelCensus]] (x63) answers across a user's
   * whole history, re-asked at session granularity (the standard product
   * metric: a view that converts a week later is retention, not funnel).
   * First-touch anchors per session, strictly-after ordering — x63's
   * semantics verbatim, with the join/aggregation key widened from
   * `user_id` to `(user_id, sid)`.
   *
   * Scale shape: [[sessionAssign]]'s user-keyed windows, then per stage
   * one filter + one (user, sid)-keyed join against the previous stage's
   * one-row-per-session anchors + one min aggregation — the x63 shape on
   * a finer key, everything hash-distributed, no per-session collection.
   */
  def sessionFunnelCensus(events: DataFrame, stages: Seq[String],
      gapMinutes: Int = 30): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val assigned = sessionAssign(events, gapMinutes)
      .select(col("user_id"), col("sid"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("tus"))
    val reached = stages.tail.scanLeft(
      assigned.filter(col("event_type") === stages.head)
        .groupBy(col("user_id"), col("sid")).agg(min(col("tus")).as("t"))) {
      (prev, stage) =>
        assigned.filter(col("event_type") === stage)
          .join(prev.select(col("user_id"), col("sid"), col("t").as("pt")),
            Seq("user_id", "sid"))
          .groupBy(col("user_id"), col("sid"))
          .agg(min(when(col("tus") > col("pt"), col("tus"))).as("t"))
          .filter(col("t").isNotNull)
    }
    reached.zip(stages).zipWithIndex.map { case ((df, st), i) =>
      df.agg(count(lit(1)).as("sessions"))
        .select(lit(i + 1).as("stage"), lit(st).as("event_type"), col("sessions"))
    }.reduce(_ unionByName _).orderBy(col("stage"))
  }

  /**
   * x138: session transition census — the first-order Markov chain of user
   * journeys: for every ordered pair of consecutive events WITHIN a
   * session, the transition count and the row-normalized probability
   * `P(next | cur)` in micro fixed point (one integral division against
   * the per-source-state total). The "where do users go from here" table
   * that drives journey analysis and next-event models.
   *
   * Scale shape: one lead() window per (user, session) — the same
   * user-keyed shuffle sessionization already paid — then a (cur, next)
   * hash aggregation and an O(#types) broadcast of per-state totals.
   */
  def sessionTransitionCensus(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("sid"))
      .orderBy(col("tus"), col("event_id"))
    val pairs = sessionAssign(events, gapMinutes)
      .select(col("user_id"), col("sid"), col("event_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("tus"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("cur"), col("next_type").as("nxt"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy(col("cur")).agg(sum(col("n")).as("tot"))
    pairs.join(broadcast(totals), "cur")
      .select(col("cur"), col("nxt"), col("n"),
        expr("(1000000L * n) DIV tot").as("p_micro"))
      .orderBy(col("cur"), col("nxt"))
  }

  /**
   * Ordered conversion funnel: how many users performed `stages(0)`, then
   * `stages(1)` STRICTLY AFTER their first `stages(0)`, then `stages(2)`
   * strictly after that, … — the classic product-analytics funnel, each
   * stage anchored at the user's EARLIEST qualifying event (first-touch
   * semantics, so one pass per stage suffices and results are
   * deterministic).
   *
   * Scale shape: stage i is one filter + one user-keyed join against the
   * (user, anchor-ts) relation of stage i-1 (one row per surviving user —
   * always the small side) + one user-keyed min aggregation. Everything
   * hashes on user_id; the census rows are single-row aggregates unioned.
   * No windows, no per-user event collection — a hot user costs their
   * event count, never a sort.
   */
  def funnelCensus(events: DataFrame, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val reached = stages.tail.scanLeft(
      events.filter(col("event_type") === stages.head)
        .groupBy(col("user_id")).agg(min(col("ts")).as("t"))) { (prev, stage) =>
      events.filter(col("event_type") === stage)
        .join(prev.select(col("user_id"), col("t").as("pt")), Seq("user_id"))
        .groupBy(col("user_id"))
        .agg(min(when(col("ts") > col("pt"), col("ts"))).as("t"))
        .filter(col("t").isNotNull)
    }
    reached.zip(stages).zipWithIndex.map { case ((df, st), i) =>
      df.agg(count(lit(1)).as("users"))
        .select(lit(i + 1).as("stage"), lit(st).as("event_type"), col("users"))
    }.reduce(_ unionByName _).orderBy(col("stage"))
  }

  /**
   * Retention cohorts — the other classic product-analytics table: users
   * grouped by their FIRST-ACTIVE day (the cohort), counted on each later
   * day they return (`offset` = days since the cohort day; offset 0 is the
   * cohort's size). Weekly/monthly granularities are the same query with
   * a coarser `trunc`.
   *
   * Scale shape: one user-keyed min-aggregation for the cohort relation
   * (one row per user — map-side partials), one user-keyed equi-join back
   * to the (user, active-day) relation, one (cohort, offset) count-distinct
   * aggregation. Everything hashes; nothing is windowed or collected. At
   * 100 TB the events table streams through exactly twice.
   */
  /**
   * Daily spike census per event type — anomaly detection whose DECISION
   * uses exact integer arithmetic only: over a type's daily counts
   * (n = #days, S = Σc, Q = Σc²), day `c` is a spike iff
   * `n·c − S > 0` and `(n·c − S)² ≥ k²·(n·Q − S²)` — the population
   * z-score test `z ≥ k`, cross-multiplied so no double is ever compared
   * (partitioning or summation order can therefore never flip a flag, the
   * engine's standard determinism rule). Long arithmetic is exact while
   * `n·c` stays under ~3·10⁹ (squares under 2⁶³); a corpus beyond that
   * needs the decimal form — at that volume per event-type per day, spike
   * detection is the least of one's problems.
   *
   * Scale shape: two hash aggregations (daily counts, per-type moments —
   * both map-side partial) and one broadcast-sized join back (one row per
   * event type). The events table streams once.
   */
  def spikeCensus(events: DataFrame, k: Int = 2): DataFrame = {
    require(k > 0, "spike threshold must be positive")
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
    val decQ = org.apache.spark.sql.types.DecimalType(38, 0)
    val stats = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s"),
        sum(col("c").cast(decQ) * col("c").cast(decQ)).as("qq"))
    // The cross-multiplied variance test runs in DECIMAL(38,0): its products
    // wrap silently in long arithmetic past ~3e9 per-type daily volume
    // (non-ANSI overflow flips spike flags with no error). The decimal form
    // is exact to ~1e12 daily events per type — far past any real corpus —
    // and costs nothing: the relation is one joined row per (type, day).
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val nD = col("n").cast(dec)
    val sD = col("s").cast(dec)
    val qqD = col("qq").cast(dec)
    val dev = nD * col("c").cast(dec) - sD // cast BEFORE multiplying
    daily.join(broadcast(stats), Seq("event_type"))
      .withColumn("spike",
        dev > 0 && dev * dev >= lit(k.toLong * k).cast(dec) * (nD * qqD - sD * sD))
      .groupBy(col("event_type"))
      .agg(
        max(col("n")).as("days"),
        sum(when(col("spike"), 1L).otherwise(0L)).as("spikes"),
        max(col("c")).as("max_daily"))
      .orderBy(col("event_type"))
  }

  /**
   * x116: typed extraction census over the semi-structured `props` JSON
   * column — the schema-on-read step an event pipeline runs before it
   * trusts a feed: declare the expected shape (`k BIGINT`), extract with
   * `from_json` (malformed documents, missing keys, and type mismatches
   * all surface as NULL — PERMISSIVE mode, never a job failure), and
   * census per event type: rows, extractable rows, and the value envelope.
   * `n - k_present` is the malformed/missing count — the feed-quality
   * number.
   *
   * Scale shape: one scan, per-row JSON parse (codegen'd JsonToStructs
   * with the tiny fixed schema), one map-side-partial aggregation. No
   * driver-side schema inference pass — the schema is DECLARED, which at
   * 100 TB is the difference between one scan and two.
   */
  def propsExtractCensus(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        from_json(col("props"), lit("k BIGINT")).getField("k").as("k"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        count(col("k")).as("k_present"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  /**
   * x117: winsorized robust statistics of the `value` metric per event
   * type — the outlier-clipped sum/envelope a metrics pipeline reports so
   * one fat-finger event can't move a dashboard. Values are micro-quantized
   * ONCE (`floor(v·1e6 + 0.5)` — exact long sums thereafter, summation
   * order can't perturb a digit); the p-low/p-high thresholds are
   * nearest-rank percentiles computed on the (type, value)-GROUPED
   * relation: per-type cumulative counts via a window over distinct
   * values, threshold = first value whose cumulative count reaches
   * `ceil(p·n/100)`, then the winsorized sum is `Σ cnt·clamp(v, lo, hi)`
   * over the same grouped relation — the corpus streams ONCE and is never
   * per-row ranked (the x90 score-grouping argument: the window runs over
   * value cardinality, which for real metrics — prices, latencies —
   * saturates far below row count; a truly continuous unbounded metric
   * would coarsen the quantization, same shape).
   */
  def winsorCensus(events: DataFrame, pLow: Int = 1, pHigh: Int = 99): DataFrame = {
    require(0 < pLow && pLow < pHigh && pHigh < 100, "need 0 < pLow < pHigh < 100")
    val v = floor(col("value") * lit(1e6) + lit(0.5)).cast("long")
    val grouped = events.select(col("event_type"), v.as("v"))
      .groupBy(col("event_type"), col("v")).agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy(col("event_type")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = grouped.withColumn("cum", sum(col("cnt")).over(wCum))
    val totals = grouped.groupBy(col("event_type")).agg(sum(col("cnt")).as("n"))
    // nearest-rank: ceil(p*n/100) in integers = (p*n + 99) div 100 — keep
    // the division INTEGRAL (Spark's `/` on longs is double division, which
    // would shift the rank by up to one whole position)
    val ranked = cum.join(broadcast(totals), "event_type")
    def thresholdAt(p: Int) = min(when(
      col("cum") >= floor((lit(p.toLong) * col("n") + lit(99L)) / lit(100.0)).cast("long"),
      col("v")))
    val th = ranked.groupBy(col("event_type"))
      .agg(thresholdAt(pLow).as("lo"), thresholdAt(pHigh).as("hi"))
    grouped.join(broadcast(th), "event_type")
      .groupBy(col("event_type"))
      .agg(
        sum(col("cnt")).as("n"),
        first(col("lo")).as("lo_micro"),
        first(col("hi")).as("hi_micro"),
        sum(col("cnt") * col("v")).as("raw_sum_micro"),
        sum(col("cnt") * greatest(least(col("v"), col("hi")), col("lo")))
          .as("winsor_sum_micro"),
        sum(when(col("v") < col("lo"), col("cnt")).otherwise(0L)).as("clipped_low"),
        sum(when(col("v") > col("hi"), col("cnt")).otherwise(0L)).as("clipped_high"))
      .orderBy(col("event_type"))
  }

  /**
   * x123: median-absolute-deviation outlier census per event type — the
   * robust sibling of [[spikeCensus]]'s z-score (a mean/stddev test is
   * itself dragged by the outliers it hunts; median/MAD is breakdown-point
   * 0.5, the standard robust detector for metric feeds). Values are
   * micro-quantized once; both the median and the MAD are nearest-rank
   * order statistics over GROUPED relations (the x117 shape — the corpus
   * is never per-row ranked): median over the (type, value) groups, MAD
   * over the (type, |value − median|) regroup of those same group counts.
   * A point is an outlier iff `|v − med| > k·MAD` — pure long arithmetic,
   * so partitioning can never flip a flag.
   *
   * Scale shape: one scan + one (type, value) hash aggregation, then all
   * further work runs over value-cardinality rows (two windows over
   * distinct values, one regroup, broadcast-sized threshold joins). Same
   * saturation argument as [[winsorCensus]].
   */
  def madOutlierCensus(events: DataFrame, k: Int = 3): DataFrame = {
    require(k > 0, "outlier threshold multiple must be positive")
    val v = floor(col("value") * lit(1e6) + lit(0.5)).cast("long")
    val grouped = events.select(col("event_type"), v.as("v"))
      .groupBy(col("event_type"), col("v")).agg(count(lit(1)).as("cnt"))
    val totals = grouped.groupBy(col("event_type")).agg(sum(col("cnt")).as("n"))
    // nearest-rank median = value at rank floor((n+1)/2); integral division
    // (Spark's `/` on longs is double division — see winsorCensus)
    def medianOf(g: DataFrame, valueCol: String): DataFrame = {
      val wCum = Window.partitionBy(col("event_type")).orderBy(col(valueCol))
        .rowsBetween(Window.unboundedPreceding, 0)
      g.withColumn("cum", sum(col("cnt")).over(wCum))
        .join(broadcast(totals), "event_type")
        .groupBy(col("event_type"))
        .agg(min(when(col("cum") >= floor((col("n") + lit(1L)) / lit(2.0)).cast("long"),
          col(valueCol))).as("med"))
    }
    val med = medianOf(grouped, "v")
    val devs = grouped.join(broadcast(med), "event_type")
      .select(col("event_type"), abs(col("v") - col("med")).as("d"), col("cnt"))
      .groupBy(col("event_type"), col("d")).agg(sum(col("cnt")).as("cnt"))
    val mad = medianOf(devs, "d").withColumnRenamed("med", "mad")
    devs.join(broadcast(med), "event_type").join(broadcast(mad), "event_type")
      .groupBy(col("event_type"))
      .agg(
        sum(col("cnt")).as("n"),
        first(col("med")).as("med_micro"),
        first(col("mad")).as("mad_micro"),
        sum(when(col("d") > lit(k.toLong) * col("mad"), col("cnt")).otherwise(0L))
          .as("outliers"),
        max(col("d")).as("max_dev_micro"))
      .orderBy(col("event_type"))
  }

  /**
   * x133: CUSUM change detection over each event type's daily counts — the
   * SEQUENTIAL anomaly test the point-wise detectors (x77 z-spike, x123
   * MAD) can't express: a sustained small drift that never trips a
   * single-day threshold accumulates in the CUSUM statistic
   * `T_t = max(0, T_{t−1} + (c_t − μ − slack))` and alarms when it crosses
   * `h`. Everything is scaled by `n` (#days) so the recurrence runs in
   * EXACT LONGS: `T_t = max(0, T_{t−1} + n·c_t − S − n·slack)`, alarm iff
   * `T_t ≥ n·h` — no double ever enters, so both engines replay the same
   * integer sequence.
   *
   * A running recurrence with a clamp is not a window/prefix-sum shape, so
   * each type's (day, count) series — bounded by the CALENDAR, not the
   * corpus (a decade is ~3.7k rows) — is folded with the `aggregate`
   * higher-order function over its sorted array: per-row codegen'd, no
   * driver loop, types fold in parallel. The oracle replays the identical
   * recurrence as a recursive CTE stepping on the day index.
   */
  def cusumCensus(events: DataFrame, slack: Int = 2, h: Int = 8): DataFrame = {
    require(slack >= 0 && h > 0, "need slack >= 0 and h > 0")
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
    val step = s"greatest(0L, acc.t + n * x.c - s - n * ${slack}L)"
    daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s"),
        sort_array(collect_list(struct(col("day"), col("c")))).as("xs"))
      .select(col("event_type"), col("n"),
        expr(s"""aggregate(xs,
          named_struct('t', 0L, 'alarms', 0L, 'maxt', 0L,
                       'first', CAST(NULL AS DATE)),
          (acc, x) -> named_struct(
            't', $step,
            'alarms', acc.alarms + CASE WHEN $step >= n * ${h}L THEN 1L ELSE 0L END,
            'maxt', greatest(acc.maxt, $step),
            'first', CASE WHEN acc.first IS NULL AND $step >= n * ${h}L
                          THEN x.day ELSE acc.first END))""").as("st"))
      .select(col("event_type"), col("n").as("days"),
        col("st.alarms").as("alarms"), col("st.maxt").as("max_stat"),
        col("st.first").as("first_alarm_day"))
      .orderBy(col("event_type"))
  }

  /**
   * x134: event-type association census (market-basket lift over user
   * baskets): for every unordered type pair, how many users did BOTH, and
   * the lift `P(a∧b)/(P(a)·P(b))` in micro fixed point —
   * `⌊1e6·U·supp_ab/(supp_a·supp_b)⌋`, one integral division with the
   * products carried in DECIMAL(38,0) (1e6·U·supp_ab wraps a long past
   * ~9.2e18 — ~10M users with a popular pair — and Spark with ANSI off
   * would wrap SILENTLY while the oracle errors; same overflow route as
   * [[chi2IndependenceCensus]]). Lift > 1 means the behaviors attract,
   * < 1 they repel — the co-engagement signal a recommendation/funnel
   * analysis starts from.
   *
   * Scale shape: the corpus reduces to distinct (user, type) — at most
   * `#types` rows per user — and the pair relation is a self-join WITHIN
   * the user key (≤ C(#types,2) pairs per user, a constant), so pair
   * generation is linear in users, never quadratic in events. Supports
   * broadcast back over the pair census (O(#types) and O(#types²) rows).
   */
  def eventLiftCensus(events: DataFrame): DataFrame = {
    val ut = events.select(col("user_id"), col("event_type")).distinct()
    // single-row broadcast, not an eager count(): the whole census stays lazy
    val users = ut.agg(countDistinct(col("user_id")).as("users"))
    val supp = ut.groupBy(col("event_type")).agg(count(lit(1)).as("supp"))
    val pairs = ut.as("a")
      .join(ut.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("supp_ab"))
    pairs
      .join(broadcast(supp.select(col("event_type").as("type_a"), col("supp").as("supp_a"))), "type_a")
      .join(broadcast(supp.select(col("event_type").as("type_b"), col("supp").as("supp_b"))), "type_b")
      .crossJoin(broadcast(users))
      .select(col("type_a"), col("type_b"), col("supp_ab"),
        expr("""(CAST(1000000 AS DECIMAL(38,0)) * users * supp_ab)
               |  DIV (CAST(supp_a AS DECIMAL(38,0)) * supp_b)""".stripMargin)
          .as("lift_micro"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /**
   * x143: chi-square independence census — is event type independent of
   * day-of-week? The classic contingency-table test, computed entirely in
   * exact integers: cell contribution
   * `χ²_cell = (N·O − R·C)² / (N·R·C)` (the textbook statistic cross-
   * multiplied so no expected-count float is ever formed), micro-scaled
   * with one integral division per cell, products in DECIMAL(38,0).
   * Reported per event type (its 7 cells summed) so the census shows
   * WHERE the dependence concentrates; the caller compares the total
   * against the χ² critical value for (r−1)(c−1) dof.
   *
   * Scale shape: one scan → one (type, dow) aggregation (map-side
   * partials); all remaining work is on the O(types × 7) cell relation
   * with broadcast margins.
   */
  def chi2IndependenceCensus(events: DataFrame): DataFrame = {
    val cells = events
      .select(col("event_type"), dayofweek(col("ts").cast("timestamp")).as("dow"))
      .groupBy(col("event_type"), col("dow")).agg(count(lit(1)).as("o"))
    val rowT = cells.groupBy(col("event_type")).agg(sum(col("o")).as("r"))
    val colT = cells.groupBy(col("dow")).agg(sum(col("o")).as("c"))
    val total = cells.agg(sum(col("o")).as("big_n"))
    cells
      .join(broadcast(rowT), "event_type")
      .join(broadcast(colT), "dow")
      .crossJoin(broadcast(total))
      .select(col("event_type"), col("r"), expr(
        """CAST(((CAST(big_n AS DECIMAL(38,0)) * o - CAST(r AS DECIMAL(38,0)) * c)
          |  * (CAST(big_n AS DECIMAL(38,0)) * o - CAST(r AS DECIMAL(38,0)) * c)
          |  * 1000000) DIV (CAST(big_n AS DECIMAL(38,0)) * r * c)
          |  AS BIGINT)""".stripMargin).as("cell"))
      .groupBy(col("event_type"))
      .agg(max(col("r")).as("n"), count(lit(1)).as("cells"),
        sum(col("cell")).as("chi2_micro"))
      .orderBy(col("event_type"))
  }

  /**
   * x151: funnel time-to-convert census — for each adjacent stage pair of
   * the first-touch funnel ([[funnelCensus]]'s anchor semantics verbatim),
   * the nearest-rank p50/p90 of the anchor-to-anchor latency across
   * converting users: the "how long does conversion take" number that
   * turns a funnel count into an SLA. Latencies are exact microsecond
   * longs; percentiles ride the x117 value-grouped machinery (latency
   * cardinality-grouped — no per-user ranking).
   *
   * Scale shape: the stage chain is x63's (filter + user-keyed join + min
   * aggregation per stage); the latency relation is one row per
   * converting user per stage pair, then grouped by (stage, latency).
   */
  def funnelLatencyCensus(events: DataFrame, stages: Seq[String]): DataFrame = {
    require(stages.size >= 2, "latency needs at least two stages")
    val evs = events.select(col("user_id"), col("event_type"),
      unix_micros(col("ts").cast("timestamp")).as("tus"))
    val anchors = stages.tail.scanLeft(
      evs.filter(col("event_type") === stages.head)
        .groupBy(col("user_id")).agg(min(col("tus")).as("t"))) { (prev, stage) =>
      evs.filter(col("event_type") === stage)
        .join(prev.select(col("user_id"), col("t").as("pt")), Seq("user_id"))
        .groupBy(col("user_id"))
        .agg(min(when(col("tus") > col("pt"), col("tus"))).as("t"))
        .filter(col("t").isNotNull)
    }
    val latencies = anchors.sliding(2).toSeq.zipWithIndex.map {
      case (Seq(a, b), i) =>
        a.select(col("user_id"), col("t").as("ta"))
          .join(b.select(col("user_id"), col("t").as("tb")), Seq("user_id"))
          .select(lit(i + 1).as("stage"),
            lit(s"${stages(i)}->${stages(i + 1)}").as("transition"),
            (col("tb") - col("ta")).as("lat"))
    }.reduce(_ unionByName _)
    val g = latencies.groupBy(col("stage"), col("transition"), col("lat"))
      .agg(count(lit(1)).as("cnt"))
    val totals = g.groupBy(col("stage"), col("transition")).agg(sum(col("cnt")).as("n"))
    val wCum = Window.partitionBy(col("stage")).orderBy(col("lat"))
      .rowsBetween(Window.unboundedPreceding, 0)
    def rankAt(p: Int) = min(when(
      col("cum") >= floor((lit(p.toLong) * col("n") + lit(99L)) / lit(100.0)).cast("long"),
      col("lat")))
    g.withColumn("cum", sum(col("cnt")).over(wCum))
      .join(broadcast(totals), Seq("stage", "transition"))
      .groupBy(col("stage"), col("transition"))
      .agg(max(col("n")).as("users"), rankAt(50).as("p50_us"),
        rankAt(90).as("p90_us"), max(col("lat")).as("max_us"))
      .orderBy(col("stage"))
  }

  /**
   * x149: daily-volume trend census — the OLS slope of each event type's
   * daily counts over the day index: CUSUM (x133) says *that* the level
   * shifted, the slope says *which way and how fast* the volume is
   * trending (events/day per day, micro fixed point). Exact integers
   * end-to-end: with x the 0-based day index and y the day's count,
   *   slope = (n·Σxy − Σx·Σy) / (n·Σxx − Σx·Σx)
   * — all five moments are exact long sums over the per-type daily
   * relation, the products go through DECIMAL(38,0) (the x77 rule), and
   * the micro-scaled division is integral with sign-aware truncation
   * (Spark DIV truncates toward zero; the oracle mirrors it explicitly
   * because DuckDB's `//` floors — a falling trend would otherwise differ
   * by one micro).
   *
   * Scale shape: one scan → one (type, day) aggregation → one per-type
   * moment aggregation. The day index ranks WITHIN the calendar-bounded
   * per-type relation (a window over #days rows, not the corpus).
   */
  def dailyTrendCensus(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val dec = "DECIMAL(38,0)"
    daily
      .withColumn("x", (row_number().over(w) - 1).cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .select(col("event_type"), col("n"), col("sy").as("total"), expr(
        s"""CAST(CASE WHEN n * sxx - sx * sx = 0 THEN 0 ELSE
           |  CASE WHEN (CAST(n AS $dec) * sxy - CAST(sx AS $dec) * sy) >= 0
           |  THEN (1000000 * (CAST(n AS $dec) * sxy - CAST(sx AS $dec) * sy))
           |    DIV (CAST(n AS $dec) * sxx - CAST(sx AS $dec) * sx)
           |  ELSE -((1000000 * -(CAST(n AS $dec) * sxy - CAST(sx AS $dec) * sy))
           |    DIV (CAST(n AS $dec) * sxx - CAST(sx AS $dec) * sx))
           |  END END AS BIGINT)""".stripMargin).as("slope_micro"))
      .orderBy(col("event_type"))
  }

  /**
   * x150: inter-arrival gap census — per event type, the nearest-rank
   * median and p90 of the within-user gap between consecutive events
   * (microseconds), the stream-burstiness profile that sets rate-limit
   * and session-gap parameters from data rather than folklore. One lag()
   * window per user (the sessionization shuffle), then the x117
   * value-grouped percentile machinery over the (type, gap) relation.
   */
  def interArrivalCensus(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
    val gaps = events
      .select(col("event_type"), col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("tus"))
      .withColumn("gap", col("tus") - lag(col("tus"), 1).over(w))
      .filter(col("gap").isNotNull)
      .groupBy(col("event_type"), col("gap")).agg(count(lit(1)).as("cnt"))
    val totals = gaps.groupBy(col("event_type")).agg(sum(col("cnt")).as("n"))
    val wCum = Window.partitionBy(col("event_type")).orderBy(col("gap"))
      .rowsBetween(Window.unboundedPreceding, 0)
    def rankAt(p: Int) = min(when(
      col("cum") >= floor((lit(p.toLong) * col("n") + lit(99L)) / lit(100.0)).cast("long"),
      col("gap")))
    gaps.withColumn("cum", sum(col("cnt")).over(wCum))
      .join(broadcast(totals), "event_type")
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n"), rankAt(50).as("p50_us"),
        rankAt(90).as("p90_us"), max(col("gap")).as("max_us"))
      .orderBy(col("event_type"))
  }

  /**
   * x148: exact Kolmogorov–Smirnov drift census — for each event type,
   * the KS distance between its `value` distribution and the pooled
   * distribution, `D = max_v |F_type(v) − F_all(v)|`, computed entirely
   * in integers: both CDFs evaluated on the POOLED value grid (the
   * supremum over step functions is attained there), the difference
   * cross-multiplied (`|cum_t·N − cum_g·n_t|`, DECIMAL(38,0)) so no
   * fraction is ever formed, and the reported distance one integral
   * division at the end. The distributional companion to the moment
   * detectors (x77/x123): KS sees shape changes that leave mean and MAD
   * untouched.
   *
   * Scale shape: values micro-quantize and group (the x117 saturation
   * argument), the grid is types × distinct-values via a broadcast of the
   * O(#types) totals, and both cumulative sums ride ONE window per type
   * over the grouped grid. The corpus streams once.
   */
  def ksDriftCensus(events: DataFrame): DataFrame = {
    val v = floor(col("value") * lit(1e6) + lit(0.5)).cast("long")
    val typed = events.select(col("event_type"), v.as("v"))
      .groupBy(col("event_type"), col("v")).agg(count(lit(1)).as("cnt"))
    val global = typed.groupBy(col("v")).agg(sum(col("cnt")).as("gcnt"))
    val types = typed.groupBy(col("event_type")).agg(sum(col("cnt")).as("n"))
    val total = typed.agg(sum(col("cnt")).as("big_n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    global.crossJoin(broadcast(types))
      .join(typed, Seq("event_type", "v"), "left_outer")
      .na.fill(0L, Seq("cnt"))
      .withColumn("cum_t", sum(col("cnt")).over(w))
      .withColumn("cum_g", sum(col("gcnt")).over(w))
      .crossJoin(broadcast(total))
      .select(col("event_type"), col("n"), expr(
        """abs(CAST(cum_t AS DECIMAL(38,0)) * big_n
          |  - CAST(cum_g AS DECIMAL(38,0)) * n)""".stripMargin).as("diff"),
        col("big_n"))
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n"), expr(
        """CAST((1000000 * MAX(diff)) DIV
          |  (CAST(MAX(n) AS DECIMAL(38,0)) * MAX(big_n)) AS BIGINT)"""
          .stripMargin).as("ks_micro"))
      .orderBy(col("event_type"))
  }

  /**
   * x135: KMV (k-minimum-values) distinct sketch census — the
   * DETERMINISTIC approximate-distinct: where HLL++ (x13) carries an
   * engine-specific register layout (its raw estimate can only be
   * tolerance-gated), KMV is pure order statistics over md5 hashes, so
   * the estimate `⌊(k−1)·2⁶⁰ / h₍ₖ₎⌋` (Bar-Yossef et al.'s KMV estimator;
   * hashes uniform in [0, 2⁶⁰) from the 15-hex-char md5 prefix) is the
   * SAME integer in any engine — the gate checks it exactly, no tolerance
   * band. A scope whose sketch never fills (distinct < k) reports its
   * exact count.
   *
   * The `__all` row is computed by SKETCH MERGE — the k smallest distinct
   * hashes of the per-type k-min sets, not a second corpus pass — which
   * is the whole point of KMV at 100 TB: per-partition/per-source sketches
   * (k longs each) union into a global cardinality without touching the
   * data again. Merge-then-estimate equals estimate-of-union by the
   * order-statistics identity (the k smallest of a union are among each
   * part's k smallest), which the gate enforces structurally.
   *
   * Scale shape: one distinct on (type, user), per-type k-min via the
   * bounded-heap aggregate (O(k) state per group, no per-group sort), and
   * O(#types·k) rows of merge work. The exact countDistinct rides the
   * same shuffle for the gate's comparison column.
   */
  def kmvDistinctCensus(events: DataFrame, k: Int = 64): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    import graft.functions.GraftFunctions
    GraftFunctions.register(events.sparkSession)
    // integral DIV, not decimal `/`: decimal division rounds at the result
    // scale, which can round UP past the floor the estimator defines
    val estimate = expr(
      s"""CASE WHEN sketch_size < $k THEN sketch_size
         |ELSE CAST((CAST(${k - 1} AS DECIMAL(38,0)) *
         |  CAST(${1L << 60} AS DECIMAL(38,0)))
         |  DIV CAST(kth AS DECIMAL(38,0)) AS BIGINT) END""".stripMargin)
    val ut = events.select(col("event_type").as("scope"), col("user_id")).distinct()
    val hashed = ut.select(col("scope"), col("user_id"),
      GraftFunctions.md5PrefixLong(col("user_id").cast("string"), 15).as("h"))
    val kmin = graft.plans.TopKPerGroup.topKPerGroup(
      hashed, Seq("scope"), Seq(("h", true), ("user_id", true)), k)
    val perType = kmin.groupBy(col("scope"))
      .agg(count(lit(1)).as("sketch_size"), max(col("h")).as("kth"))
      .join(ut.groupBy(col("scope"))
        .agg(countDistinct(col("user_id")).as("exact_users")), "scope")
    // global row by MERGE: k smallest distinct hashes across the sketches
    val merged = kmin.select(col("h")).distinct()
      .orderBy(col("h").asc).limit(k)
      .agg(count(lit(1)).as("sketch_size"), max(col("h")).as("kth"))
      .crossJoin(broadcast(
        events.agg(countDistinct(col("user_id")).as("exact_users"))))
      .select(lit("__all").as("scope"), col("sketch_size"), col("kth"),
        col("exact_users"))
    perType.unionByName(merged)
      .select(col("scope"), col("exact_users"), col("sketch_size"),
        estimate.as("est_users"))
      .orderBy(col("scope"))
  }

  def retentionCohorts(events: DataFrame, maxOffsetDays: Int = 30): DataFrame = {
    val active = events
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val cohorts = active.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    active.join(cohorts, Seq("user_id"))
      .withColumn("offset", datediff(col("day"), col("cohort_day")))
      .filter(col("offset") <= maxOffsetDays)
      .groupBy(col("cohort_day"), col("offset"))
      .agg(countDistinct(col("user_id")).as("users"))
      .orderBy(col("cohort_day"), col("offset"))
  }

  /**
   * Trailing-window activity census — per event, how many events the SAME
   * user produced in the trailing `windowDays` (a time-RANGE frame, the
   * rate-limiting / engagement-velocity primitive; every other window in
   * this engine is a ROWS frame, so this also exercises Spark's range-
   * frame path). The frame is value-based, so ties on ts are counted
   * symmetrically — deterministic regardless of shuffle order. The census
   * aggregates exact integers per event type: events, the summed trailing
   * counts, and the busiest trailing window seen.
   *
   * Scale shape: one shuffle on user_id (the window partition key — high
   * cardinality, naturally balanced), then one hash aggregation with
   * map-side partials. The range frame advances two pointers over each
   * user's sorted events — O(events per user), never quadratic.
   * `unix_micros` after an explicit `cast("timestamp")` (no-op on TZ
   * timestamps; NTZ parquet would otherwise be rejected).
   */
  def trailingWindowCensus(events: DataFrame, windowDays: Int = 7): DataFrame = {
    val us = windowDays.toLong * 86400L * 1000000L
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("tus")).rangeBetween(-us, 0L)
    events
      .select(col("event_type"), col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("tus"))
      .withColumn("trail", count(lit(1)).over(w))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("trail")).as("trail_sum"),
        max(col("trail")).as("trail_max"))
      .orderBy(col("event_type"))
  }
}
