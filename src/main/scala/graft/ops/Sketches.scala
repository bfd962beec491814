package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic, engine-portable SKETCHES for 100 TB profiling — the
 * cardinality / frequency estimates every large corpus pipeline needs
 * (vocabulary sizes, distinct-URL counts, heavy hitters) where the exact
 * answer is either unnecessary or a full extra shuffle.
 *
 * Spark's own `approx_count_distinct` (HyperLogLog++) is the right
 * production default but its register layout is not reproducible in
 * another engine, so it can never be hash-checked against the DuckDB
 * oracle. These two sketches are chosen for EXACT cross-engine
 * determinism: every intermediate is an integer (or one IEEE-exact
 * double op), built on the shared 60-bit sha256 hash recipe
 * ([[Dedup.hash64]]), so the gate pins every estimate bit-for-bit.
 *
 * Scale shapes:
 *  - KMV: `distinct` on (group, hash) — the same shuffle an exact count
 *    needs — but the per-group state is then BOUNDED at k by a
 *    rank-filter window that Spark plans as WindowGroupLimit (partial
 *    top-k BEFORE the shuffle, spec-gated), so the sketch rows shipped
 *    to any reducer are O(k), not O(cardinality). KMV sketches are also
 *    mergeable (union the hash sets, re-take the k smallest).
 *  - Count-min: the entire state is depth x width integer cells with
 *    map-side combine — a constant-size aggregate no matter the input,
 *    mergeable by cell-wise addition, never skewed (cells are the only
 *    keys).
 */
object Sketches {

  /** Hash domain of [[Dedup.hash64]]: 60 bits (15 hex chars). */
  val HashSpan: Double = math.pow(2, 60)

  /**
   * K-minimum-values distinct-count sketch per group:
   * (g, n_true-less) -> (g, n_kept, kth_hash, est_distinct).
   *
   * est = floor((k-1) * 2^60 / h_k) for the k-th smallest distinct hash
   * h_k, or the exact count while the group holds fewer than k distinct
   * values. The one double division is a single IEEE op on exactly
   * representable operands ((k-1)*2^60 has <= 53 significant bits for
   * k <= 2^45), so DuckDB reproduces the estimate exactly.
   */
  def kmvDistinct(df: DataFrame, group: Column, value: Column, k: Int): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    val hashes = df.select(group.as("g"), Dedup.hash64(value).as("h")).distinct()
    val ranked = hashes
      .withColumn("rn", row_number().over(Window.partitionBy("g").orderBy("h")))
      .filter(col("rn") <= k) // plans as WindowGroupLimit: partial top-k map-side
    ranked.groupBy("g").agg(
        count(lit(1)).as("n_kept"),
        max(when(col("rn") === k, col("h"))).as("kth_hash"))
      .select(col("g"), col("n_kept"), col("kth_hash"),
        when(col("kth_hash").isNull, col("n_kept"))
          .otherwise(floor(lit((k - 1).toDouble * HashSpan) / col("kth_hash").cast("double")))
          .cast("long").as("est_distinct"))
  }

  /** Depth-row hash cell of `value`: [[Dedup.hash64]]("cm<d>:" || value) % width.
    * Positive operands, so Spark `%` == DuckDB `%`. */
  def cmCell(value: Column, d: Int, width: Int): Column =
    Dedup.hash64(concat(lit(s"cm$d:"), value)) % width

  /**
   * Count-min counter table over a (multiset) value column:
   * (d, j, n) for d in [0, depth), j in [0, width). Constant-size state
   * (depth x width cells), map-side combined, mergeable by addition.
   */
  def countMinCounters(df: DataFrame, value: Column, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, "need depth >= 1, width >= 2")
    val cells = (0 until depth).map(d =>
      struct(lit(d).as("d"), cmCell(value, d, width).as("j")))
    df.select(explode(array(cells: _*)).as("c"))
      .groupBy(col("c.d").as("d"), col("c.j").as("j"))
      .agg(count(lit(1)).as("n"))
  }

  /**
   * Point estimates from a counter table for a (small) frame of query
   * values: (value, cm_est) with cm_est = min over depth rows of the
   * value's cell counter. Classic guarantee: cm_est >= true count, and
   * overshoot is bounded by the other values colliding into the same
   * cells. `queries` is expected to be metadata-sized (it broadcasts).
   */
  def cmEstimate(counters: DataFrame, queries: DataFrame, value: Column,
                 depth: Int, width: Int): DataFrame = {
    val cells = (0 until depth).map(d =>
      struct(lit(d).as("d"), cmCell(value, d, width).as("j")))
    val q = queries.select(value.as("q"), explode(array(cells: _*)).as("c"))
      .select(col("q"), col("c.d").as("d"), col("c.j").as("j"))
    broadcast(q).join(counters, Seq("d", "j"))
      .groupBy(col("q").as("value")).agg(min(col("n")).as("cm_est"))
  }
}
