package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Shared scaffold for the dedup-at-skew EVIDENCE surfaces (DedupSkewSpec
 * and Bench's `dedup_skew` datum): the sf documents corpus plus `k` exact
 * clones of its first document — a planted mega duplicate cluster that
 * must take the keeper-star path in LSH candidate generation. One
 * definition so the spec's assertions and the bench's timing always
 * measure the SAME corpus.
 *
 * The frame is repartitioned to full parallelism before the checkpoint:
 * the few-MB test parquet is a single row group (one scan partition), and
 * without the fan-out the whole shingle/minhash map side would run on one
 * core — at real scale inputs carry natural splits and this is a no-op.
 */
object SkewCorpus {

  /** Returns (docs-with-clones, maxId of the base corpus). Clone ids are
    * maxId+1 .. maxId+k, all with the text of the smallest-id doc. */
  def apply(s: SparkSession, sfDir: String, k: Long): (DataFrame, Long) = {
    val base = s.read.parquet(s"$sfDir/documents.parquet").select(col("doc_id"), col("text"))
    val maxId = base.agg(max(col("doc_id"))).collect()(0).getLong(0)
    val dupText = base.orderBy(col("doc_id")).select(col("text"))
      .limit(1).collect()(0).getString(0)
    val clones = s.range(1, k + 1)
      .select((col("id") + maxId).as("doc_id"), lit(dupText).as("text"))
    val docs = base.unionByName(clones)
      .repartition(s.sparkContext.defaultParallelism)
      .localCheckpoint(true)
    (docs, maxId)
  }
}
