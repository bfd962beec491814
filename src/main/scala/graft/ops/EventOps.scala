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
   * IN ORDER (with any events in between). Each step's EXACT event type
   * is encoded as one assigned letter ('a', 'b', ...; every other event
   * becomes '-'), each user's encoded sequence (ordered by ts) is
   * reduced to a string, and each funnel prefix becomes an
   * ordered-subsequence regex — exact, engine-portable, and one
   * aggregation pass for every step at once. Matching on the full type
   * (not an initial) means an unrelated "view_ad" event can never
   * satisfy a "view" step.
   *
   * Scale shape: one shuffle keyed on user_id; the per-user sequence is
   * bounded by events-per-user (array_sort of a collected struct list —
   * collect_list order is nondeterministic; the sort is by (ts, letter),
   * so same-timestamp ties deterministically order earlier funnel steps
   * first — the generous reading: a view and a click in the same instant
   * count as view-then-click). Output: (step, step_name, n_users), step
   * i counting users who completed the first i funnel stages.
   */
  def funnel(events: DataFrame, user: Column, ts: Column, eventType: Column,
             steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty && steps.distinct.size == steps.size && steps.size <= 26,
      "steps must be distinct event types (at most 26)")
    def letter(i: Int): String = ('a' + i).toChar.toString
    val enc = steps.zipWithIndex.tail
      .foldLeft(when(eventType === steps.head, lit(letter(0)))) {
        case (acc, (st, i)) => acc.when(eventType === st, lit(letter(i)))
      }.otherwise(lit("-"))
    val perUser = events
      .select(user.as("user_id"), struct(ts.as("ts"), enc.as("init")).as("e"))
      .groupBy("user_id")
      .agg(concat_ws("", transform(array_sort(collect_list(col("e"))),
        s => s.getField("init"))).as("seq"))
    val counts = steps.indices.map { i =>
      val pat = (0 to i).map(letter).mkString(".*")
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

  /**
   * Schema-on-read extraction of one field from a JSON string column
   * (the `props` bag every event log carries). `get_json_object` is a
   * codegen'd path expression — no UDF, no full-document parse into a
   * variant type — and `try_cast` keeps malformed values as NULL instead
   * of failing the job under ANSI mode (a 100 TB log ALWAYS contains
   * garbage rows; one bad record must not kill the pipeline).
   */
  def jsonField(json: Column, field: String, asType: String): Column =
    get_json_object(json, "$." + field).try_cast(asType)

  /**
   * Per-group stats over a numeric JSON field: n_events, n_valid (rows
   * where the field parsed), sum/min/max. The projection happens BEFORE
   * the aggregation, so only (group, long) rows reach the shuffle and
   * partial aggregation collapses them map-side — the JSON strings never
   * leave the scan stage.
   */
  def jsonFieldStats(events: DataFrame, group: Column, json: Column,
                     field: String): DataFrame = {
    val k = jsonField(json, field, "long")
    events.select(group.as("g"), k.as("k"))
      .groupBy("g")
      .agg(count(lit(1)).as("n_events"), count(col("k")).as("n_valid"),
        sum(col("k")).as("sum_k"), min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
  }

  /**
   * Log compaction / CDC current-state: the single LATEST row per key,
   * ordered by (ts, tieBreak) — the "collapse an append-only changelog
   * to its current snapshot" maintenance op. The tie-break column makes
   * the winner deterministic when timestamps collide (same-second
   * writes are routine at scale).
   *
   * Scale shape: one shuffle keyed on the entity key, per-key sort,
   * row_number + filter(=1) — Spark plans this as a WindowGroupLimit
   * (top-1 per key pushed below the full sort), so state per key is
   * O(1), not O(history). Output keeps the caller's original columns.
   */
  def latestState(events: DataFrame, key: Column, ts: Column,
                  tieBreak: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts.desc, tieBreak.desc)
    // one temp column is unavoidable (window functions can't sit in a
    // filter); pick a name the caller's frame provably doesn't use
    val rn = Iterator.from(0).map(i => s"__graft_rn$i")
      .find(n => !events.columns.contains(n)).get
    events.withColumn(rn, row_number().over(w))
      .filter(col(rn) === 1)
      .drop(rn)
  }
}
