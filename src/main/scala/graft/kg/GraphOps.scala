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
   * Connected components by min-label propagation: every node starts
   * labeled with itself; each round it adopts the minimum label in its
   * closed neighborhood; converges in <= diameter rounds (`maxIter`
   * bounds it deterministically). Each round is one shuffle on node id —
   * the standard large-graph pattern (cf. large-star/small-star); the
   * label frame is tiny relative to edges and re-joined per round.
   *
   * Input edges (src, dst) are treated as undirected. Output:
   * (node_id, component) where component == min node id in the component.
   */
  def connectedComponents(edges: DataFrame, src: String, dst: String,
                          maxIter: Int = 10): DataFrame = {
    val und = edges.select(col(src).as("a"), col(dst).as("b"))
      .union(edges.select(col(dst).as("a"), col(src).as("b")))
      .distinct()
    var labels = und.select(col("a").as("node_id")).distinct()
      .withColumn("component", col("node_id"))
    var i = 0
    while (i < maxIter) {
      val fromNbrs = und
        .join(labels.withColumnRenamed("node_id", "b"), Seq("b"))
        .groupBy(col("a").as("node_id"))
        .agg(min(col("component")).as("nbr_min"))
      labels = labels.join(fromNbrs, Seq("node_id"), "left")
        .select(col("node_id"),
          least(col("component"), coalesce(col("nbr_min"), col("component"))).as("component"))
        .localCheckpoint(eager = true) // cut the growing lineage each round
      i += 1
    }
    labels
  }
}
