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
        when(lag(col("ts"), 1).over(w).isNull ||
             unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)) > gapUs, 1)
          .otherwise(0))
    val sessions = flagged
      .withColumn("sid", sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("sid"))
      .agg(count(lit(1)).as("n"))
    sessions.groupBy(col("user_id"))
      .agg(count(lit(1)).as("sessions"), max(col("n")).as("max_events"))
      .orderBy(col("user_id"))
  }
}
