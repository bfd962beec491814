package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Approximate-nearest-neighbor search over an embedding column
 * (`array<float>`). Scoring runs on native fused Catalyst expressions
 * (VecExpressions — Spark's zip_with/aggregate HOFs are CodegenFallback,
 * i.e. interpreted, contrary to what this header once claimed); bucket
 * and signature construction stay pure DataFrame ops — no UDF serde
 * anywhere.
 *
 * Two paths:
 *  - `bruteForceTopK`: exact cosine top-k via a broadcast join of the
 *    (small) query set against the corpus — the correctness baseline; one
 *    narrow pass over the corpus plus a per-query top-k window;
 *  - `lshBuckets`/`lshTopK`: the scale path — random-hyperplane LSH
 *    buckets; only colliding buckets are scored. At 100 TB the corpus
 *    side is bucketed once at write time and queries probe buckets only.
 *
 * Hyperplane coefficients are ENGINE-PORTABLE: coef(t,p,d) is derived
 * from sha256("hp:t:p:d") (first 15 hex chars as a 60-bit int, scaled to
 * [-1,1)), so an independent engine (the DuckDB oracle) reconstructs the
 * exact same planes, projections, and buckets. Projections are evaluated
 * as bounded-size `zip_with`+`aggregate` folds over one constant-folded
 * coefficient array literal per plane — expression size stays O(planes),
 * not O(planes*dims), so 768+-dim embeddings stay inside whole-stage
 * codegen (the r1 per-dim unrolling blew past the 64KB method limit).
 *
 * All arithmetic is double and sequential-fold shaped (dot = left fold),
 * so scores are reproducible across engines; projection sign margins on
 * the test corpus are >= 7e-6, far above any summation-order noise.
 */
object Similarity {

  /** array<float> -> array<double> (promote BEFORE any arithmetic). */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  import org.apache.spark.sql.graftshim.ColumnShim.{column => toCol, expression => toExpr}

  // the cast is a no-op when the input is already array<double> (the
  // optimizer removes it), and promotes array<float> callers safely
  private def d(c: Column): Column = c.cast("array<double>")

  /** a·b — native fused kernel (see VecExpressions for why not a HOF). */
  def dot(a: Column, b: Column): Column = toCol(VecDot(toExpr(d(a)), toExpr(d(b))))

  def norm(a: Column): Column = sqrt(dot(a, a))

  /**
   * Cosine of two double arrays: dot/(|a|*|b|), fused into ONE
   * codegen'd pass (the HOF form evaluated three interpreted folds with
   * an intermediate array each). Bit-identical to `cosineHof` — same
   * sequential fold order, same IEEE ops — so every oracle holds.
   */
  def cosine(a: Column, b: Column): Column = toCol(VecCosine(toExpr(d(a)), toExpr(d(b))))

  /** The HOF formulations the kernels replaced; retained as the
    * differential baseline (OpsSpec asserts bit-equality on real data). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)
  def cosineHof(a: Column, b: Column): Column =
    dotHof(a, b) / (sqrt(dotHof(a, a)) * sqrt(dotHof(b, b)))
  def sqDistHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0d), (acc, v) => acc + v)

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
   * Deterministic, engine-portable hyperplane coefficient:
   * sha256("hp:t:p:d") first 15 hex chars -> 60-bit int -> [-1, 1).
   * DuckDB equivalent:
   * `('0x'||substr(sha256('hp:'||t||':'||p||':'||d),1,15))::BIGINT::DOUBLE
   *  / 576460752303423488.0 - 1.0` (verified identical for all t,p,d).
   */
  def planeCoef(table: Int, plane: Int, dim: Int): Double = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val hex = md.digest(s"hp:$table:$plane:$dim".getBytes("UTF-8"))
      .take(8).map("%02x".format(_)).mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16).toDouble / (1L << 59).toDouble - 1.0
  }

  /**
   * One bucket id per hash table: bucket bit p is set when the projection
   * of `v` on plane (t, p) is >= 0 (sign is scale-invariant, so no input
   * normalization needed). Each plane is ONE constant array literal +
   * one zip_with/aggregate fold — bounded expression size at any dims.
   */
  def hyperplaneSignature(v: Column, dims: Int, tables: Int, planesPerTable: Int): Column = {
    val sigs = (0 until tables).map { t =>
      (0 until planesPerTable).map { p =>
        val coefs = typedLit((0 until dims).map(d => planeCoef(t, p, d)))
        when(dot(v, coefs) >= 0, lit(1 << p)).otherwise(lit(0))
      }.reduce(_ + _)
    }
    array(sigs: _*)
  }

  /**
   * Exploded LSH bucket assignment: (id, table, bucket) — `tables` rows
   * per input vector. The candidate-generation primitive for bucketed
   * near-dup joins and ANN probing: candidates are pairs sharing a
   * (table, bucket) key, an equi-join that shuffles on the bucket key
   * and NEVER goes cartesian.
   */
  def lshBuckets(df: DataFrame, id: Column, vec: Column, dims: Int,
                 tables: Int, planesPerTable: Int): DataFrame =
    df.select(id.as("id"),
      posexplode(hyperplaneSignature(asDouble(vec), dims, tables, planesPerTable))
        .as(Seq("table", "bucket")))

  /**
   * Scalar int8 quantization of an embedding column: per-vector symmetric
   * scale (127 / max|x|), values mapped by the engine-portable rounding
   * floor(x * scale + 0.5). The 4x memory cut is what makes a 100 TB ANN
   * corpus servable (dequantization error is bounded by amax/254 per
   * coordinate); zero vectors quantize to zeros. A pure NARROW transform
   * (no shuffle), and fully deterministic cross-engine — the oracle
   * reproduces every quantized byte.
   *
   * Output: (id, amax, q) with q: array<int> in [-127, 127].
   */
  def quantizeInt8(embs: DataFrame, id: Column, vec: Column): DataFrame = {
    val v = asDouble(vec)
    val amax = array_max(transform(v, x => abs(x)))
    val scale = lit(127.0) / amax
    val q = transform(v, x =>
      when(amax > 0, floor(x * scale + 0.5)).otherwise(lit(0.0)).cast("int"))
    embs.select(id.as("id"), amax.as("amax"), q.as("q"))
  }

  /** Squared L2 distance of two double arrays (left fold, engine-stable;
    * native fused kernel, bit-identical to `sqDistHof`). */
  def sqDist(a: Column, b: Column): Column = toCol(VecL2Sq(toExpr(d(a)), toExpr(d(b))))

  /**
   * IVF coarse-quantizer cell id: argmin over `centroids` of squared L2,
   * ties broken by centroid index. Centroids are inlined as constant
   * array literals, so assignment is a pure NARROW expression — no join,
   * no shuffle, no window; at 100 TB the corpus is assigned and
   * cell-partitioned in the same single pass that wrote it. The argmin
   * is `array_min` over (dist, cid) structs (lexicographic struct
   * ordering), reproducible in any engine with the same fold.
   */
  def ivfCell(v: Column, centroids: Seq[Array[Double]]): Column = {
    val cells = centroids.zipWithIndex.map { case (c, i) =>
      struct(sqDist(v, typedLit(c.toSeq)).as("dist"), lit(i).as("cid"))
    }
    array_min(array(cells: _*)).getField("cid")
  }

  /** The `nprobe` nearest centroid ids for a (query) vector, as an array. */
  def ivfProbes(v: Column, centroids: Seq[Array[Double]], nprobe: Int): Column = {
    val cells = centroids.zipWithIndex.map { case (c, i) =>
      struct(sqDist(v, typedLit(c.toSeq)).as("dist"), lit(i).as("cid"))
    }
    transform(slice(array_sort(array(cells: _*)), 1, nprobe), s => s.getField("cid"))
  }

  /**
   * Deterministic fixed-iteration Lloyd's k-means — the production recipe
   * for IVF coarse-quantizer centroids (replacing the r2 "first 16
   * vectors" placeholder). Each iteration is one narrow constant-centroid
   * cell assignment (ivfCell — no join, no shuffle beyond the aggregate)
   * plus per-cell/per-dim means.
   *
   * Cross-engine determinism: the means are computed over SCALED-INTEGER
   * sums — sum(floor(x * 1e9)) as longs — which are exact and
   * order-independent, where a plain double sum would depend on Spark's
   * partial-aggregation order and could flip assignments near cell
   * boundaries. The DuckDB oracle evaluates the identical expression
   * (CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * 1e9)), so centroids are
   * bit-identical in both engines. Empty cells keep their previous
   * centroid. Driver traffic per iteration is k*dims aggregate rows —
   * quantizer metadata, not data — so the loop is cluster-safe at any
   * corpus size.
   */
  def kmeansCentroids(embs: DataFrame, vec: Column,
                      init: Seq[Array[Double]], iters: Int): Seq[Array[Double]] = {
    val e = embs.select(asDouble(vec).as("v"))
    var cents = init
    var it = 0
    while (it < iters) {
      // cell is computed in its own projection: co-resolving the struct
      // argmin with a generator in one select drops struct field names
      val rows = e.withColumn("cell", ivfCell(col("v"), cents))
        .select(col("cell"), posexplode(col("v")).as(Seq("d", "x")))
        .groupBy("cell", "d")
        .agg(sum(floor(col("x") * 1e9)).as("s"), count(lit(1)).as("n"))
        .collect()
      val next = cents.map(_.clone()).toArray
      rows.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) =
          r.getLong(2).toDouble / (r.getLong(3).toDouble * 1e9)
      }
      cents = next.toSeq
      it += 1
    }
    cents
  }

  /**
   * IVF-style ANN top-k (the second scale path next to hyperplane LSH):
   * the corpus is assigned to its nearest centroid cell in one narrow
   * pass; each query probes its `nprobe` nearest cells; candidates are
   * an equi-join on the cell id (never cartesian); exact cosine + top-k
   * over candidates. With deterministic centroids the whole pipeline is
   * exactly reproducible cross-engine (distance margins on the test
   * corpus are >= 2e-5, far above fold-order noise). At production
   * scale, centroids come from a k-means pass and the corpus side is
   * written partitioned by cell so probes prune partitions.
   */
  def ivfTopK(corpus: DataFrame, corpusId: Column, corpusVec: Column,
              queries: DataFrame, queryId: Column, queryVec: Column,
              k: Int, centroids: Seq[Array[Double]], nprobe: Int): DataFrame = {
    val c = corpus.select(corpusId.as("neighbor_id"), asDouble(corpusVec).as("cv"))
      .withColumn("cell", ivfCell(col("cv"), centroids))
    val q = queries.select(queryId.as("query_id"), asDouble(queryVec).as("qv"),
        explode(ivfProbes(asDouble(queryVec), centroids, nprobe)).as("cell"))
    val cand = c.join(broadcast(q), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("cv"), col("qv")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    cand.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id")
  }

  /**
   * ANN top-k through LSH collision buckets: candidates = vectors sharing
   * a bucket with the query in ANY table; exact cosine + top-k over
   * candidates only. Recall < 1 by construction; tune tables/planes.
   *
   * Shuffle shape (the 100 TB point): the bucket explode carries ONLY
   * (id, table, bucket) — r2 kept the full vector on all `tables`
   * exploded rows, shipping 16 copies of every 768-dim embedding through
   * the bucket-join shuffle, the dominant network cost at scale.
   * Vectors are joined back BY ID only after candidate dedup (the same
   * shape as Dedup.embeddingNearDups), so each embedding crosses the
   * wire once per candidate pair it actually participates in.
   *
   * Like IVF, the whole pipeline is exactly reproducible cross-engine
   * (planeCoef buckets + sequential-fold cosine), so the DuckDB oracle
   * hash-checks it despite being "approximate" — approximate vs
   * brute-force, deterministic as a function.
   */
  def lshTopK(corpus: DataFrame, corpusId: Column, corpusVec: Column,
              queries: DataFrame, queryId: Column, queryVec: Column,
              k: Int, dims: Int, tables: Int = 16, planesPerTable: Int = 4): DataFrame = {
    val c = corpus.select(corpusId.as("neighbor_id"), asDouble(corpusVec).as("cv"))
    val q = queries.select(queryId.as("query_id"), asDouble(queryVec).as("qv"))
    val cb = lshBuckets(c, col("neighbor_id"), col("cv"), dims, tables, planesPerTable)
      .withColumnRenamed("id", "neighbor_id")
    val qb = lshBuckets(q, col("query_id"), col("qv"), dims, tables, planesPerTable)
      .withColumnRenamed("id", "query_id")
    val cand = cb.join(broadcast(qb), Seq("table", "bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"))
      .distinct()
    val scored = cand
      .join(c, Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("cv"), col("qv")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id")
  }
}
