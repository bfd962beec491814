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
   * AS-OF JOIN (an operator Spark lacks natively): for every left event,
   * attach the LATEST right event with right.ts <= left.ts within the
   * same key. Composed from existing ops per the preference order — NOT
   * a range join: the two sides are unioned with a side tag and swept by
   * one `last(..., ignoreNulls)` running window, so the cost is ONE
   * shuffle on the key plus a per-key sort. A range-join formulation
   * explodes to O(|L|·|R|) per key under skew; this shape is O(|L|+|R|)
   * and is how production as-of joins (point-in-time feature lookups)
   * scale. Right rows sort BEFORE left rows at equal timestamps, giving
   * inclusive (<=) semantics; determinism needs unique (key, ts) on the
   * right (true of the events table; otherwise pre-aggregate the right).
   *
   * The right id/value columns keep the CALLER'S data types (the null
   * placeholders on the left side are typed from the right frame's
   * schema) — a silent cast would turn a non-numeric payload into
   * all-NULL "no match" results.
   *
   * Output: left rows + (asof_id, asof_value) of the matched right row
   * (NULL when no right event precedes).
   */
  def asofJoin(left: DataFrame, leftKey: Column, leftTs: Column, leftId: Column,
               right: DataFrame, rightKey: Column, rightTs: Column,
               rightId: Column, rightVal: Column): DataFrame = {
    val Array(ridType, rvType) =
      right.select(rightId, rightVal).schema.fields.map(_.dataType)
    val l = left.select(leftKey.as("k"), leftTs.as("ts"), leftId.as("lid"),
      lit(1).as("is_left"),
      lit(null).cast(ridType).as("rid"), lit(null).cast(rvType).as("rv"))
    val r = right.select(rightKey.as("k"), rightTs.as("ts"),
      lit(null).cast(left.select(leftId).schema.head.dataType).as("lid"),
      lit(0).as("is_left"),
      rightId.as("rid"), rightVal.as("rv"))
    val w = Window.partitionBy("k").orderBy(col("ts"), col("is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("asof_id", last(col("rid"), ignoreNulls = true).over(w))
      .withColumn("asof_value", last(col("rv"), ignoreNulls = true).over(w))
      .filter(col("is_left") === 1)
      .select(col("k"), col("ts"), col("lid"), col("asof_id"), col("asof_value"))
  }

  /**
   * FUNNEL analysis: how many users performed the given event-type steps
   * IN ORDER (with any events in between). Each user's event-type
   * sequence (one char per event, ordered by ts) is reduced to a string
   * and each funnel prefix becomes an ordered-subsequence regex — exact,
   * engine-portable, and one aggregation pass for every step at once.
   *
   * Scale shape: one shuffle keyed on user_id; the per-user sequence is
   * bounded by events-per-user (array_sort of a collected struct list —
   * collect_list order is nondeterministic, the sort by unique ts makes
   * the sequence exact). Output: (step, step_name, n_users), step i
   * counting users who completed the first i funnel stages.
   */
  def funnel(events: DataFrame, user: Column, ts: Column, eventType: Column,
             steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty && steps.map(_.head).distinct.size == steps.size,
      "steps must have distinct initials (the sequence alphabet)")
    val perUser = events
      .select(user.as("user_id"), struct(ts.as("ts"),
        substring(eventType, 1, 1).as("init")).as("e"))
      .groupBy("user_id")
      .agg(concat_ws("", transform(array_sort(collect_list(col("e"))),
        s => s.getField("init"))).as("seq"))
    val counts = steps.indices.map { i =>
      val pat = steps.take(i + 1).map(_.head).mkString(".*")
      sum(when(col("seq").rlike(pat), 1L).otherwise(0L)).as(s"n$i")
    }
    val agg = perUser.agg(counts.head, counts.tail: _*)
    val rows = steps.indices.map(i =>
      (lit(i + 1).as("step"), lit(steps.take(i + 1).mkString(">")).as("step_name"), col(s"n$i")))
    agg.select(explode(array(rows.map { case (s, n, c) =>
      struct(s, n, c.as("n_users")) }: _*)).as("r"))
      .select(col("r.step"), col("r.step_name"), col("r.n_users"))
  }

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
