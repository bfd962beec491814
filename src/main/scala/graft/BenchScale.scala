package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops._

/**
 * Scale-linearity probe for the optimization round (guide §1 + the
 * "measured evidence beyond sf0.1" gap): times the corpus-proportional
 * operators at 1x / 4x / 16x / 64x the sf0.1 documents table and
 * reports seconds + normalized throughput, so a super-linear cliff
 * (quadratic candidate blowup, window serialization, per-group state
 * explosion) shows up as a falling rows/sec instead of being argued
 * from plan shapes alone. NOT part of the driver contract — the frozen
 * `graft.Bench` stays the official harness.
 *
 * Replica construction: copy k of the corpus gets every token tagged
 * with its replica index (`w` -> `w rKx`), which makes the replicas'
 * shingle/token sets pairwise DISJOINT — scaling the corpus without
 * manufacturing a k-clone duplicate cluster, so the dedup operators see
 * k-times the data, not k-times-denser duplicates (the skewed-clone
 * regime is measured separately by the frozen bench's dedup_skew).
 * Every replica (including the 1x base) gets the same treatment, so
 * cross-scale ratios compare identical per-row work.
 */
object BenchScale {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-scale-$cpus")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def timed(reps: Int)(f: => Unit): Double =
    (1 to reps).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }.min

  /** k tagged replicas of the documents table, ids disjoint per replica. */
  private def scaled(docs: DataFrame, k: Int): DataFrame = {
    require(k >= 1)
    val reps = (0 until k).map { i =>
      docs.select(
        (col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
        concat(lit(s"r${i}x "),
          replace(col("text"), lit(" "), lit(s" r${i}x "))).as("text"))
    }
    reps.reduce(_ union _)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val jstats = args.contains("--jstats")
    val scaleArgs = args.filterNot(_ == "--jstats")
    val scales = if (scaleArgs.isEmpty) Seq(1, 4, 16, 64) else scaleArgs.map(_.toInt).toSeq
    val reps = 2
    val spark = session(cpus)
    spark.read.parquet(s"$sfDir/documents.parquet").count() // warm

    if (jstats) {
      // per-stage split of the jaccard two-stage pipeline: shingle count,
      // candidate count, verified-pair count and stage seconds — the
      // numbers that say WHERE a non-linear segment comes from
      val b = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
      scales.foreach { k =>
        val d = scaled(b, k).repartition(cpus).localCheckpoint(true)
        val arr = Dedup.docShingleArrays(d, col("doc_id"), col("text"), 3).localCheckpoint(false)
        val sh = arr.select(col("id"), explode(col("shingles")).as("shingle"))
        val nsh = sh.count()
        var t0 = System.nanoTime()
        val cands = Dedup.lshCandidatesFromShingles(sh).localCheckpoint(false)
        val nc = cands.count()
        val tc = (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime()
        val nv = Dedup.jaccardPairsFromShingleArrays(arr, cands).count()
        val tv = (System.nanoTime() - t0) / 1e9
        println(f"[jstat] k=$k%-3d shingles=$nsh%9d cands=$nc%9d verified=$nv%9d cand_sec=$tc%7.2f verify_sec=$tv%7.2f")
        d.unpersist()
      }
      spark.stop()
      return
    }

    val ops: Seq[(String, DataFrame => DataFrame)] = Seq(
      "exact_dedup" -> (d => Dedup.exactGroups(d, col("doc_id"), col("text"))),
      "minhash_lsh" -> (d => Dedup.lshCandidates(d, col("doc_id"), col("text"))),
      "jaccard_two_stage" -> { d =>
        // mirrors the td_dedup_jaccard production shape (array verify, r7)
        val arr = Dedup.docShingleArrays(d, col("doc_id"), col("text"), 3).localCheckpoint(false)
        val sh = arr.select(col("id"), explode(col("shingles")).as("shingle"))
        val cands = Dedup.lshCandidatesFromShingles(sh).localCheckpoint(false)
        Dedup.jaccardPairsFromShingleArrays(arr, cands)
          .filter(col("inter") * 5 >= col("union_") * 4)
      },
      "simhash" -> (d => Dedup.simhash16(d, col("doc_id"), col("text"))),
      "repetition" -> (d => Curation.repetitionMetrics(d, col("doc_id"), col("text"))),
      "interdoc_dedup" -> (d =>
        Curation.interdocSegmentDedup(d, col("doc_id"), col("text"))),
      "seq_pack" -> (d => Packing.packSequences(d, col("doc_id"),
        size(split(col("text"), " ")), seqLen = 512L)),
      "bm25" -> (d => TextOps.bm25Scaled(d, col("doc_id"), col("text"),
        Seq("data", "model", "the"), k = 50)),
      "salient_terms" -> (d => TextOps.salientTerms(d, col("doc_id"), col("text"), 3)),
      "quality" -> (d => TextOps.quality(d, col("doc_id"), col("text")))
    )

    val base = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val results = scala.collection.mutable.ArrayBuffer.empty[String]
    scales.foreach { k =>
      // materialize the scaled corpus once per scale so every op times
      // its own work, not the replica construction
      val d = scaled(base, k).repartition(cpus).localCheckpoint(true)
      val nDocs = d.count()
      ops.foreach { case (name, f) =>
        spark.sparkContext.setJobDescription(s"scale-probe $name x$k")
        val sec = timed(reps) { noop(f(d)) }
        spark.sparkContext.setJobDescription(null)
        val docsPerSec = (nDocs / sec).toLong
        results += f"""{"op":"$name","k":$k,"docs":$nDocs,"sec":$sec%.3f,"docs_per_sec":$docsPerSec}"""
        println(f"[scale] $name%-18s x$k%-3d docs=$nDocs%7d  sec=$sec%8.3f  docs/s=$docsPerSec%9d")
      }
      d.unpersist()
    }
    println(s"""{"bench_scale":[${results.mkString(",")}],"sf":"$sfDir","reps":$reps}""")
    spark.stop()
  }
}
