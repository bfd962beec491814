package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Approximate-nearest-neighbor search over an embedding column
 * (`array<float>`), pure DataFrame ops (zip_with/aggregate are codegen'd
 * higher-order functions — no UDF serde).
 *
 * Two paths:
 *  - `bruteForceTopK`: exact cosine top-k via a broadcast join of the
 *    (small) query set against the corpus — the correctness baseline; one
 *    narrow pass over the corpus plus a per-query top-k window;
 *  - `lshTopK`: the scale path — random-hyperplane LSH buckets from
 *    deterministic seeded planes; only colliding buckets are scored
 *    across `tables` independent hash tables. At 100 TB the corpus side
 *    is bucketed once at write time and queries probe buckets only.
 *
 * All arithmetic is double and sequential-fold shaped (dot = left fold),
 * so scores are reproducible bit-for-bit across engines.
 */
object Similarity {

  /** array<float> -> array<double> (promote BEFORE any arithmetic). */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine of two double arrays: dot/(|a|*|b|). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /**
   * Exact top-k neighbors for each query vector. `queries` must be small
   * enough to broadcast (the typical online / eval case).
   */
  def bruteForceTopK(corpus: DataFrame, corpusId: Column, corpusVec: Column,
                     queries: DataFrame, queryId: Column, queryVec: Column,
                     k: Int): DataFrame = {
    val c = corpus.select(corpusId.as("neighbor_id"), asDouble(corpusVec).as("cv"))
    val q = queries.select(queryId.as("query_id"), asDouble(queryVec).as("qv"))
    val scored = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("cv"), col("qv")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id")
  }

  /**
   * Deterministic random hyperplanes (splitmix64 of (table, plane, dim) ->
   * coefficient in [-1,1)); sign of the projection is scale-invariant so
   * no normalization is needed. Returns one bucket id per hash table.
   */
  def hyperplaneSignature(v: Column, dims: Int, tables: Int, planesPerTable: Int): Column = {
    def coef(table: Int, plane: Int, d: Int): Double = {
      var x = table.toLong * 0x9E3779B97F4A7C15L + plane.toLong * 0xBF58476D1CE4E5B9L +
        d.toLong * 0x94D049BB133111EBL + 0x2545F4914F6CDD1DL
      x ^= (x >>> 31); x *= 0xD6E8FEB86659FD93L; x ^= (x >>> 27)
      x.toDouble / Long.MaxValue.toDouble
    }
    val sigs = (0 until tables).map { t =>
      (0 until planesPerTable).map { p =>
        val proj = (0 until dims).map(d => element_at(v, d + 1) * lit(coef(t, p, d))).reduce(_ + _)
        when(proj >= 0, lit(1 << p)).otherwise(lit(0))
      }.reduce(_ + _)
    }
    array(sigs: _*)
  }

  /**
   * ANN top-k through LSH collision buckets: candidates = vectors sharing
   * a bucket with the query in ANY table; exact cosine + top-k over
   * candidates only. Recall < 1 by construction; tune tables/planes.
   */
  def lshTopK(corpus: DataFrame, corpusId: Column, corpusVec: Column,
              queries: DataFrame, queryId: Column, queryVec: Column,
              k: Int, dims: Int, tables: Int = 12, planesPerTable: Int = 4): DataFrame = {
    def bucketed(df: DataFrame, id: Column, vec: Column, idName: String) = {
      val dv = asDouble(vec)
      df.select(id.as(idName), dv.as(s"v_$idName"),
        posexplode(hyperplaneSignature(dv, dims, tables, planesPerTable)).as(Seq("table", "bucket")))
    }
    val c = bucketed(corpus, corpusId, corpusVec, "neighbor_id")
    val q = bucketed(queries, queryId, queryVec, "query_id")
    val cand = c.join(broadcast(q), Seq("table", "bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("v_neighbor_id"), col("v_query_id")).as("cos"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    cand.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id")
  }
}
