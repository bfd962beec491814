package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.kg.TestSpark

/**
 * Properties of the deterministic sketches ([[Sketches]]): exactness
 * below k, bounded error above it, the count-min overestimate guarantee,
 * cell-wise mergeability, and the WindowGroupLimit plan shape that keeps
 * the KMV shuffle O(k) per group at any cardinality.
 */
class SketchesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("KMV is exact below k and within the expected band above it") {
    val small = (1 to 100).map(i => ("g", s"v$i")).toDF("g", "v")
    val sm = Sketches.kmvDistinct(small, col("g"), col("v"), k = 256).collect()(0)
    assert(sm.getAs[Long]("n_kept") === 100L)
    assert(sm.isNullAt(sm.fieldIndex("kth_hash")))
    assert(sm.getAs[Long]("est_distinct") === 100L)

    // 5000 true distinct, k=256: stderr ~ 1/sqrt(k-2) ~ 6.3%; the data
    // is fixed so the estimate is one deterministic draw — assert 4 sigma
    val big = (1 to 5000).map(i => ("g", s"value-$i")).toDF("g", "v")
    val est = Sketches.kmvDistinct(big, col("g"), col("v"), k = 256)
      .collect()(0).getAs[Long]("est_distinct")
    assert(math.abs(est - 5000L) < 1250, s"KMV estimate $est too far from 5000")
  }

  test("KMV estimate at adversarial k: IEEE division pinned, one off exact at most") {
    // the estimate's ONE floating op is floor((k-1)*2^60 / h_k) in IEEE
    // doubles. (k-1)*2^60 is exactly representable for any k <= 2^53
    // (significand = k-1), but h_k has up to 60 significant bits, so the
    // division itself can round — the cross-engine exactness claim is
    // that Spark and DuckDB compute the SAME IEEE ops, not that the
    // result equals the exact rational floor. Pin both halves over
    // non-power-of-two k: (1) the pipeline's estimate equals the JVM
    // IEEE mirror bit-for-bit (DuckDB evaluates the identical double
    // expression), (2) it never strays more than 1 from the BigInt-exact
    // floor (the only possible divergence is the quotient rounding
    // across an integer boundary).
    val df = (1 to 2000).map(i => ("g", s"adv-$i")).toDF("g", "v")
    val hashes = df.select(Dedup.hash64(col("v")).as("h")).distinct()
      .collect().map(_.getLong(0)).sorted
    for (k <- Seq(3, 6, 7, 11, 997)) {
      val est = Sketches.kmvDistinct(df, col("g"), col("v"), k)
        .collect()(0).getAs[Long]("est_distinct")
      val hk = hashes(k - 1)
      val ieee = math.floor((k - 1).toDouble * Sketches.HashSpan / hk.toDouble).toLong
      val exact = ((BigInt(k - 1) << 60) / BigInt(hk)).toLong
      assert(est === ieee, s"k=$k: pipeline $est != JVM IEEE mirror $ieee")
      assert(math.abs(est - exact) <= 1,
        s"k=$k: IEEE estimate $est strays ${est - exact} from exact floor $exact")
    }
  }

  test("KMV top-k plans as WindowGroupLimit (bounded per-group shuffle state)") {
    val df = (1 to 100).map(i => ("g", s"v$i")).toDF("g", "v")
    val plan = Sketches.kmvDistinct(df, col("g"), col("v"), k = 16)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(800))
  }

  test("count-min never underestimates, and is exact without collisions") {
    // 60 distinct values with multiplicities 1..60 over a width-64,
    // depth-4 table: some cells collide, none can undercount
    val rows = (1 to 60).flatMap(i => Seq.fill(i)(s"tok-$i")).toDF("v")
    val counters = Sketches.countMinCounters(rows, col("v"), depth = 4, width = 64)
      .localCheckpoint(true)
    val queries = (1 to 60).map(i => s"tok-$i").toDF("v")
    val est = Sketches.cmEstimate(counters, queries, col("v"), depth = 4, width = 64)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("cm_est")).toMap
    val truth = (1 to 60).map(i => s"tok-$i" -> i.toLong).toMap
    truth.foreach { case (v, n) =>
      assert(est(v) >= n, s"$v: cm_est ${est(v)} < true $n")
    }
    // depth 4 makes an all-rows collision for a given value unlikely;
    // on this fixed dataset at least half the values resolve exactly
    val exact = truth.count { case (v, n) => est(v) == n }
    assert(exact >= 30, s"only $exact/60 exact — hash layout regressed?")
  }

  test("count-min counters merge by cell-wise addition") {
    // deterministic split by key predicate — limit() without an ordering
    // has no determinism guarantee, so two evaluations of all.limit(200)
    // could pick different multisets and fail a correct merge
    val all = (1 to 500).map(i => (i, s"t${i % 37}")).toDF("i", "v")
    val (a, b) = (all.filter(col("i") <= 200), all.filter(col("i") > 200))
    def cells(df: org.apache.spark.sql.DataFrame) =
      Sketches.countMinCounters(df, col("v"), depth = 4, width = 64)
    val merged = cells(a).unionByName(cells(b))
      .groupBy("d", "j").agg(sum("n").as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getAs[Long]("n")).toMap
    val whole = cells(all)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getAs[Long]("n")).toMap
    assert(merged === whole)
  }
}
