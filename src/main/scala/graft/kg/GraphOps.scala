package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Distributed graph algorithms over the materialized edges table,
 * expressed as iterative DataFrame joins (no GraphX/RDDs).
 */
object GraphOps {

  /** Node degree distribution: (node_id, out_deg, in_deg). */
  def degrees(edges: DataFrame, src: String = "subj_id", dst: String = "obj_id"): DataFrame = {
    val out = edges.groupBy(col(src).as("node_id")).agg(count(lit(1)).as("out_deg"))
    val in = edges.groupBy(col(dst).as("node_id")).agg(count(lit(1)).as("in_deg"))
    out.join(in, Seq("node_id"), "full")
      .na.fill(0L, Seq("out_deg", "in_deg"))
  }

  /**
   * Multi-source BFS shortest-path distances over the undirected graph,
   * capped at `maxDepth` hops: the KG traversal primitive ("everything
   * within k hops of these entities"). Classic frontier iteration — each
   * round is one equi-join of the current frontier against the edge list
   * plus an anti-join against the visited set, so round cost is
   * O(frontier-adjacent edges), the same shape at 10^12 edges; rounds
   * are bounded by maxDepth and stop early when the frontier empties.
   * First visit IS the shortest distance, so results are deterministic.
   * Output: (node_id, dist) for every node within maxDepth (sources at 0).
   */
  def bfsDistances(edges: DataFrame, src: String, dst: String,
                   sources: Seq[Long], maxDepth: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val und = edges
      .select(col(src).cast("long").as("u"), col(dst).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
    val bidir = und.union(und.select(col("v").as("u"), col("u").as("v")))
      .distinct().localCheckpoint(false) // lazy: round 1's count materializes it
    var dists = sources.toDF("node_id").withColumn("dist", lit(0L))
      .localCheckpoint(true)
    var frontier = dists.select("node_id")
    var d = 1L
    var done = false
    while (!done && d <= maxDepth) {
      // LAZY checkpoints (still cut lineage immediately — localCheckpoint
      // truncates the logical plan at call time): the count action both
      // materializes the frontier and answers the emptiness probe, and
      // the lazily-checkpointed dists is persisted by the NEXT round's
      // count through the dependency chain — one job per round instead of
      // three (r7)
      val next = frontier.join(bidir, frontier("node_id") === bidir("u"))
        .select(col("v").as("node_id")).distinct()
        .join(dists, Seq("node_id"), "left_anti")
        .localCheckpoint(false)
      if (next.count() == 0L) done = true
      else {
        dists = dists.union(next.withColumn("dist", lit(d))).localCheckpoint(false)
        frontier = next
        d += 1
      }
    }
    dists
  }

  /**
   * Per-node triangle counts via DEGREE-ORDERED wedge enumeration (the
   * standard O(m^1.5) algorithm): undirected edges are oriented from the
   * (degree, id)-smaller endpoint to the larger, which bounds every
   * node's out-degree by O(sqrt(m)) on ANY graph — hub nodes (rdf:type
   * targets!) get in-edges only, so the wedge join on the common source
   * never explodes on skew. Each triangle is counted exactly once: its
   * (deg, id)-minimal vertex is the unique node with oriented edges to
   * both others. Shuffles: degree agg, two orientation joins, the wedge
   * self-join keyed on the source, and a closure semi-join keyed on the
   * id-ordered pair — all equi-joins.
   *
   * Output: (node_id, n_triangles), one row per node (0 for none).
   */
  def trianglesPerNode(edges: DataFrame, src: String, dst: String): DataFrame = {
    // node universe from the RAW edges: a self-loop-only node must still
    // get its (node_id, 0) row — the self-loop filter below is only for
    // the triangle arithmetic (matching connectedComponents' "self-loops
    // dropped but their nodes kept")
    val allNodes = edges.select(col(src).as("node_id"))
      .union(edges.select(col(dst).as("node_id"))).distinct()
    val und = edges
      .select(least(col(src), col(dst)).as("a"), greatest(col(src), col(dst)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(false) // lazy: shared by deg/orientation/closure consumers
    val deg = und.select(col("a").as("n")).union(und.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("dg"))
      .localCheckpoint(false)
    val withDeg = und
      .join(deg.select(col("n").as("a"), col("dg").as("da")), Seq("a"))
      .join(deg.select(col("n").as("b"), col("dg").as("db")), Seq("b"))
    val aFirst = struct(col("da"), col("a")) < struct(col("db"), col("b"))
    val o = withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("u"),
      when(aFirst, col("b")).otherwise(col("a")).as("v"))
    val wed = o.as("o1").join(o.as("o2"),
        col("o1.u") === col("o2.u") && col("o1.v") < col("o2.v"))
      .select(col("o1.u").as("tu"), col("o1.v").as("tx"), col("o2.v").as("ty"))
    val tri = wed.join(und, col("tx") === col("a") && col("ty") === col("b"), "left_semi")
    val counts = tri.select(explode(array(col("tu"), col("tx"), col("ty"))).as("node_id"))
      .groupBy("node_id").agg(count(lit(1)).as("c"))
    allNodes
      .join(counts, Seq("node_id"), "left")
      .select(col("node_id"), coalesce(col("c"), lit(0L)).as("n_triangles"))
  }

  /**
   * Deterministic fixed-iteration PageRank in SCALED-INTEGER arithmetic:
   * pr0 = `scale` per node; each iteration
   *
   *   contrib(n) = pr(n) DIV out_deg(n)            (BIGINT floor division)
   *   pr'(v)     = teleport + (85 * sum contrib(in-neighbors)) DIV 100
   *
   * with teleport = 15 * scale / 100 (damping 0.85). All arithmetic is
   * BIGINT, so ranks are EXACT, independent of aggregation order, and
   * bit-identical in any engine (a float PageRank depends on partial-sum
   * order and can't be hash-compared cross-engine). Dangling-node mass is
   * dropped — the standard simplification; ranks remain a deterministic
   * relative ordering. Per iteration: one join shuffle keyed on src and
   * one aggregate keyed on dst, lineage cut per round — the same shape at
   * 10^12 edges. Overflow bound: sum(contrib) <= n_nodes * scale, so pick
   * scale <= 9.2e18 / (100 * n_nodes); the default 1e12 is safe to ~90M
   * nodes (auto-shrink if you have more).
   *
   * Output: (node_id, pr_scaled).
   */
  def pagerankScaled(edges: DataFrame, src: String, dst: String,
                     iters: Int = 3, scale: Long = 1000000000000L): DataFrame = {
    val teleport = scale * 15L / 100L
    // lazy (r7): e/nodes/outDeg are each ONE cached RDD shared by every
    // iteration; with no per-round action left (see below) the caller's
    // single action materializes the whole fixed-iteration chain
    val e = edges.select(col(src).cast("long").as("src"), col(dst).cast("long").as("dst"))
      .localCheckpoint(false)
    val nodes = e.select(col("src").as("node_id"))
      .union(e.select(col("dst").as("node_id"))).distinct().localCheckpoint(false)
    val outDeg = e.groupBy(col("src").as("node_id")).agg(count(lit(1)).as("out_deg"))
      .localCheckpoint(false)
    var pr = nodes.withColumn("pr", lit(scale))
    var i = 0
    while (i < iters) {
      val contrib = e
        .join(pr.withColumnRenamed("node_id", "src"), Seq("src"))
        .join(outDeg.withColumnRenamed("node_id", "src").withColumnRenamed("out_deg", "odg"), Seq("src"))
        .select(col("dst").as("node_id"), expr("pr DIV odg").as("c"))
      val sums = contrib.groupBy("node_id").agg(sum(col("c")).as("s"))
      // lazy: the plan is truncated at call time (what the per-round cut
      // is for); materialization happens once, in the caller's action —
      // the fixed iteration count needs no per-round convergence probe,
      // so the old eager checkpoint was one full job barrier per
      // iteration for nothing (r7)
      pr = nodes.join(sums, Seq("node_id"), "left")
        .select(col("node_id"),
          (lit(teleport) + expr("(coalesce(s, 0L) * 85) DIV 100")).as("pr"))
        .localCheckpoint(false)
      i += 1
    }
    pr.select(col("node_id"), col("pr").as("pr_scaled"))
  }

  /**
   * Transitive closure of a directed relation by ITERATIVE DOUBLING:
   * paths' = paths UNION (paths JOIN paths), so path length covered
   * doubles each round and a diameter-D hierarchy closes in O(log D)
   * joins — the property that matters for deep ontology chains, where
   * naive one-hop expansion (frontier semi-naive) costs D shuffle
   * rounds. Each round is one equi-join + distinct; lineage cut and
   * convergence detected by a count+xor checksum action (same recipe as
   * connectedComponents). Output: distinct pairs reachable in >= 1 step
   * (src <> dst), under the CALLER'S `src`/`dst` column names.
   *
   * Closure SIZE is inherently O(n*reach) — at web scale you close
   * curated hierarchy predicates (subClassOf over a vocabulary), never
   * the instance graph; `maxIter` bounds runaway inputs.
   *
   * CONVENTION (documented deviation, ADVICE r6): the closure is
   * IRREFLEXIVE — `a =!= b` is filtered every round, so `x p+ x` pairs
   * arising from cycles are NOT emitted, where SPARQL 1.1
   * arbitrary-length-path semantics would include them. Every consumer
   * (PlusPath/PClosure lowering in Bgp, the DuckDB oracle mirrors, and
   * GraphQueryDifferentialSpec's brute force) shares this convention;
   * the driver corpora are acyclic, so the engines agree. Changing it
   * means changing ALL of those together — a build-round item, not an
   * optimization.
   */
  def transitiveClosure(edges: DataFrame, src: String, dst: String,
                        maxIter: Int = 20): DataFrame = {
    // lazy checkpoint: the checksum action below materializes it in the
    // same job, and its count doubles as the emptiness probe (r7 — was
    // three actions: eager checkpoint, checksum, isEmpty)
    var paths = edges.select(col(src).as("a"), col(dst).as("b"))
      .filter(col("a") =!= col("b")).distinct().localCheckpoint(false)

    def checksum(d: DataFrame): (Long, Long) = {
      val r = d.agg(count(lit(1)), expr("bit_xor(xxhash64(a, b))")).collect()(0)
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    var cs = checksum(paths)
    var converged = cs._1 == 0L
    var i = 0
    while (!converged && i < maxIter) {
      val hop = paths.as("l").join(paths.as("r"), col("l.b") === col("r.a"))
        .select(col("l.a").as("a"), col("r.b").as("b"))
        .filter(col("a") =!= col("b"))
      // LAZY checkpoint + the checksum action materializes it: one job
      // per round instead of two (r7 — the eager checkpoint ran its own
      // materialization job and the checksum immediately re-scanned the
      // freshly cached blocks; Spark completes a lazy local checkpoint
      // as part of the first action's run, so fusing them halves the
      // per-round job count at any scale)
      paths = paths.union(hop).distinct().localCheckpoint(false)
      val next = checksum(paths)
      converged = next == cs
      cs = next
      i += 1
    }
    require(converged, s"transitiveClosure: not closed after $maxIter doubling rounds " +
      "(covers paths up to 2^iter hops — the input is deeper than expected or cyclic " +
      "beyond the bound)")
    paths.select(col("a").as(src), col("b").as(dst))
  }

  /**
   * k-core: the maximal subgraph where every node has degree >= k, by
   * the standard ITERATIVE PEELING fixpoint — drop nodes of degree < k,
   * recompute, repeat. Peeling a layer is one degree aggregate + two
   * anti-joins on the (uniformly hashed) node id; rounds are bounded by
   * the graph's degeneracy layering, and each round's cost shrinks with
   * the surviving edge set. The k-core is where KG curation looks for
   * the "dense nucleus" (well-connected entities) vs peelable fringe.
   *
   * Input treated as undirected, self-loops dropped. Output: (node_id)
   * rows — the members of the k-core (empty frame if none).
   */
  def kCore(edges: DataFrame, src: String, dst: String, k: Int,
            maxIter: Int = 100): DataFrame = {
    // lazy checkpoints + edge-count convergence (r7): a weak node always
    // carries >= 1 surviving edge, so the edge count strictly decreases
    // exactly when the weak set is non-empty — the peeled frame's count
    // is both the materializing action and the fixpoint probe, one job
    // per round instead of two (weak job + isEmpty + e job before)
    var e = edges
      .select(least(col(src), col(dst)).as("a"), greatest(col(src), col(dst)).as("b"))
      .filter(col("a") =!= col("b")).distinct().localCheckpoint(false)
    var n = e.count()
    var done = n == 0L
    var i = 0
    while (!done && i < maxIter) {
      val deg = e.select(col("a").as("n")).union(e.select(col("b").as("n")))
        .groupBy("n").agg(count(lit(1)).as("dg"))
      val weak = deg.filter(col("dg") < k).select("n").localCheckpoint(false)
      val e2 = e.join(weak.withColumnRenamed("n", "a"), Seq("a"), "left_anti")
        .join(weak.withColumnRenamed("n", "b"), Seq("b"), "left_anti")
        .localCheckpoint(false)
      val n2 = e2.count()
      if (n2 == n) done = true
      else {
        e = e2
        n = n2
        done = n == 0L
        i += 1
      }
    }
    require(done, s"kCore: peeling did not reach a fixpoint in $maxIter rounds")
    e.select(col("a").as("node_id")).union(e.select(col("b").as("node_id"))).distinct()
  }

  /**
   * Connected components by alternating large-star / small-star
   * (Kiveris et al., "Connected Components in MapReduce and Beyond",
   * SoCC'14 — the published O(log n)-round algorithm): edges are kept
   * normalized pointing large->small; large-star hangs every node's
   * larger neighbors off its minimum neighbor, small-star flattens the
   * smaller neighbors onto the minimum, and the alternation contracts
   * any component onto its minimum id in O(log n) rounds REGARDLESS of
   * diameter — the property that matters at 10^12-edge scale, where a
   * long path would cost min-label propagation O(diameter) shuffles.
   * Each round is two aggregate+join shuffles plus one cheap checksum
   * action for convergence detection; lineage is cut per round.
   *
   * Input edges (src, dst) are treated as undirected; self-loops are
   * dropped but their nodes kept. Output: (node_id, component) where
   * component == min node id in the component.
   */
  def connectedComponents(edges: DataFrame, src: String, dst: String,
                          maxIter: Int = 50): DataFrame = {
    val (labels, converged) = connectedComponentsWithStatus(edges, src, dst, maxIter)
    if (!converged)
      // the min-aggregate below keeps output well-formed (one row per
      // node) but labels may be PARTIALLY CONTRACTED — never return that
      // silently (ADVICE r2): callers needing the flag use ...WithStatus
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"connectedComponents: maxIter=$maxIter expired before convergence; " +
          "labels may be partially contracted (two nodes of one component " +
          "can carry different ids). Raise maxIter or use " +
          "connectedComponentsWithStatus to branch on the flag.")
    labels
  }

  /** As `connectedComponents`, returning (labels, converged). */
  def connectedComponentsWithStatus(edges: DataFrame, src: String, dst: String,
                                    maxIter: Int = 50): (DataFrame, Boolean) = {
    val nodes = edges.select(col(src).as("node_id"))
      .union(edges.select(col(dst).as("node_id"))).distinct()
    // lazy checkpoint + checksum fusion, count doubles as emptiness probe
    // (same three-actions-to-one collapse as transitiveClosure — r7)
    var e = edges
      .select(greatest(col(src), col(dst)).as("u"), least(col(src), col(dst)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(false)

    def checksum(d: DataFrame): (Long, Long) = {
      // xor-fold of row hashes: overflow-free (ANSI-safe) set fingerprint;
      // rows are distinct so xor cancellation cannot hide a change
      val r = d.agg(count(lit(1)), expr("bit_xor(xxhash64(u, v))")).collect()(0)
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    var cs = checksum(e)
    var converged = cs._1 == 0L
    var i = 0
    // per-star min attached via a WINDOW over the star root instead of a
    // groupBy + self-join (r7, guide §2.4): the aggregate+join spelling
    // paid an exchange for the aggregate AND an exchange for the join
    // probe side; min-over-partition computes the same value in the one
    // exchange that clusters the star, and the following distinct reuses
    // that clustering (HashPartitioning(u) satisfies the (u, v) dedup's
    // distribution), so a round costs 2 exchanges instead of 6. Same
    // math, same rows — GraphOpsSpec + the CC differential specs pin it.
    val wU = org.apache.spark.sql.expressions.Window.partitionBy("u")
    while (!converged && i < maxIter) {
      // large-star: for each u, m = min(N(u) + {u}); emit (v, m) for v > u
      val nbrs = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val ls = nbrs
        .withColumn("m", least(min(col("v")).over(wU), col("u")))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v")) // v > u >= m: stays large->small
        .distinct()
      // small-star: edges already point large->small, so for each u,
      // m = min of its smaller neighbors; re-hang them (and u) onto m
      val ss = ls
        .withColumn("m", min(col("v")).over(wU))
        .select(explode(array(
          struct(col("v").as("a"), col("m").as("b")),
          struct(col("u").as("a"), col("m").as("b")))).as("p"))
        .select(col("p.a").as("u"), col("p.b").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
      // lazy checkpoint, materialized BY the checksum action: one job per
      // round instead of two (same fusion as transitiveClosure — r7)
      e = ss.localCheckpoint(eager = false)
      val next = checksum(e)
      converged = next == cs
      cs = next
      i += 1
    }
    // fixpoint is a star forest (child -> component root); roots and
    // isolated / self-loop-only nodes label themselves. The min-aggregate
    // keeps the output well-formed (exactly one row per node) even if
    // maxIter expired before convergence — mid-algorithm a node can hold
    // edges to two different smaller ids, which a bare join would emit as
    // two conflicting rows.
    val labels = nodes.join(
        e.groupBy(col("u").as("node_id")).agg(min(col("v")).as("root")),
        Seq("node_id"), "left")
      .select(col("node_id"), coalesce(col("root"), col("node_id")).as("component"))
    (labels, converged)
  }
}
