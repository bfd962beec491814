package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Event-stream operators for the analytics side of a training-data
 * pipeline (user activity logs, ingestion telemetry).
 */
object EventOps {

  /**
   * Event-time sessionization: a session is a maximal run of one user's
   * events where each gap between consecutive events is <= `gapMinutes`.
   *
   * Determinism/portability: the gap test is INTERVAL arithmetic on the
   * (naive) event timestamp — no epoch conversion, so results are
   * session-timezone-independent (pass a timestamp_ntz column; see
   * td_event_windows for why) and identical in DuckDB. Cumulative
   * session indices are exact integer sums; timestamps here are unique
   * per user, and even under ties the (user, session) partition is
   * order-insensitive (a tie row's gap to its twin is zero).
   *
   * Scale shape: ONE shuffle keyed on user_id (uniform at web scale —
   * humans generate bounded event counts), per-user sort inside the
   * window, then a groupBy on (user_id, session_idx) that reuses the
   * same partitioning. Window state is bounded by events-per-user;
   * pathological robot users are the one skew risk — cap or salt them
   * upstream (Materialize.saltedRepartition is the tool).
   *
   * Output: (user_id, session_idx, start_s, end_s, n_events).
   */
  def sessionize(events: DataFrame, user: Column, ts: Column,
                 gapMinutes: Int): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events.select(user.as("user_id"), ts.as("ts"))
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("ns",
        when(col("prev").isNull ||
          col("ts") - col("prev") > expr(s"INTERVAL '$gapMinutes' MINUTE"), 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("ns")).over(cum))
      .groupBy("user_id", "session_idx")
      .agg(
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("start_s"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("end_s"),
        count(lit(1)).as("n_events"))
  }
}
