package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for large-scale training-data pipelines.
 * All operators are pure DataFrame transforms built from codegen'd
 * built-ins (no UDFs), so they distribute and scale with shuffles only
 * where semantically required (the candidate-pair joins).
 *
 * Scale notes (100 TB):
 *  - exact dedup shuffles once on a 64-hex digest (uniform, skew-free);
 *  - MinHash-LSH shuffles shingles (explode ~ O(tokens)), then joins on
 *    band keys — band buckets are the only potential hot keys, and the
 *    band hash is uniform unless true duplicate clusters are huge, in
 *    which case AQE skew-join splits them;
 *  - SimHash is a narrow per-doc aggregation over exploded tokens;
 *  - pairwise verification joins are bounded to LSH candidates, never all
 *    pairs.
 */
object Dedup {

  /** Portable 60-bit hash (same value computable in DuckDB:
    * `('0x' || substr(sha256(x),1,15))::BIGINT`). */
  def hash64(c: Column): Column =
    conv(substring(sha2(c, 256), 1, 15), 16, 10).cast("long")

  /** Exact duplicate groups by content digest: (digest, n_dups, keeper_id). */
  def exactGroups(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.groupBy(sha2(text, 256).as("digest"))
      .agg(count(lit(1)).as("n_docs"), min(id).as("keeper_id"))

  /** Exact-dedup projection: keep one doc per digest. */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keep = exactGroups(docs, col(idCol), col(textCol)).select(col("keeper_id").as(idCol))
    docs.join(keep, Seq(idCol), "left_semi")
  }

  /** (id, shingle) pairs: distinct n-word shingles per document. */
  def wordShingles(docs: DataFrame, id: Column, text: Column, n: Int): DataFrame = {
    val words = split(text, " ")
    val cnt = size(words) - (n - 1)
    // guard: sequence(1, 0) would generate a DESCENDING range in Spark
    val shingles = when(cnt >= 1,
      transform(sequence(lit(1), cnt), i => concat_ws(" ", slice(words, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
    docs.select(id.as("id"), explode(shingles).as("shingle")).distinct()
  }

  /**
   * MinHash signatures: for seed i, h_i(doc) = min over shingles of
   * sha256(i || '|' || shingle) — the lexicographic min of a keyed hash is
   * a valid min-wise permutation family and is exactly reproducible in
   * any engine with sha256. Output: (id, seed, minhash).
   */
  def minhash(shingles: DataFrame, numHashes: Int): DataFrame = {
    val seeds = (0 until numHashes).map(lit(_))
    shingles
      .select(col("id"), explode(array(seeds: _*)).as("seed"), col("shingle"))
      .groupBy("id", "seed")
      .agg(min(sha2(concat(col("seed").cast("string"), lit("|"), col("shingle")), 256)).as("mh"))
  }

  /**
   * LSH banding: group `rowsPerBand` consecutive minhashes into a band
   * key; docs sharing any band key become candidate pairs. Returns
   * distinct (a, b) with a < b.
   */
  def lshCandidates(docs: DataFrame, id: Column, text: Column,
                    shingleWords: Int = 3, numHashes: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    val mh = minhash(wordShingles(docs, id, text, shingleWords), numHashes)
    val banded = mh
      .withColumn("band", (col("seed") / rowsPerBand).cast("int"))
      .groupBy("id", "band")
      .agg(sha2(concat_ws(",", sort_array(collect_list(concat(col("seed"), lit(":"), col("mh"))))), 256).as("band_key"))
    // bucket-grouped pair generation instead of a self-join: the minhash
    // sub-plan (the expensive part) is computed ONCE, buckets collect
    // their (few) member ids, and in-bucket pairs come from a
    // higher-order-function expression — one extra shuffle, no recompute
    val ids = sort_array(collect_list(col("id")))
    val pairs = flatten(transform(sequence(lit(1), size(col("ids")) - 1), i =>
      transform(sequence(i + 1, size(col("ids"))), j =>
        struct(element_at(col("ids"), i).as("a"), element_at(col("ids"), j).as("b")))))
    banded
      .groupBy("band", "band_key").agg(ids.as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(pairs).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .distinct()
  }

  /**
   * Exact n-gram Jaccard verification for a candidate (or full) pair set:
   * (a, b, inter, union_) with integer set sizes, so thresholding is
   * float-free: `100*inter >= pct*union_`.
   */
  def jaccardPairs(docs: DataFrame, id: Column, text: Column,
                   shingleWords: Int = 3, candidates: Option[DataFrame] = None): DataFrame = {
    val sh = wordShingles(docs, id, text, shingleWords)
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n"))
    val paired = candidates match {
      case None =>
        // all-pairs: only for small verification scales — hot shingles
        // make this quadratic
        sh.as("sa").join(sh.as("sb"),
          col("sa.shingle") === col("sb.shingle") && col("sa.id") < col("sb.id"))
          .select(col("sa.id").as("a"), col("sb.id").as("b"))
      case Some(c) =>
        // candidate-bounded (the 100 TB path): join shingles to the
        // candidate pair list FIRST so compute is O(|candidates| * doc
        // size), never all-pairs
        c.join(sh.as("sa"), c("a") === col("sa.id"))
          .join(sh.as("sb"), c("b") === col("sb.id") && col("sa.shingle") === col("sb.shingle"))
          .select(col("a"), col("b"))
    }
    paired.groupBy("a", "b").agg(count(lit(1)).as("inter"))
      .join(sizes.withColumnRenamed("id", "a").withColumnRenamed("n", "na"), "a")
      .join(sizes.withColumnRenamed("id", "b").withColumnRenamed("n", "nb"), "b")
      .select(col("a"), col("b"), col("inter"),
        (col("na") + col("nb") - col("inter")).as("union_"))
  }

  /**
   * 16-bit SimHash over the distinct-token set: bit j is set when the
   * sum over tokens of sign((hash64(token) >> j) & 1) is positive.
   * Small enough to replicate bit-for-bit in SQL, same structure as the
   * classic 64-bit version.
   */
  def simhash16(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val toks = docs.select(id.as("id"), explode(split(text, " ")).as("tok"))
      .distinct()
      .withColumn("h", hash64(col("tok")))
    val bitSums = (0 until 16).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s$j")
    }
    val sig = (0 until 16).map { j =>
      when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    toks.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("id"), sig.as("simhash"))
  }

  /**
   * Embedding near-duplicate pairs: cosine >= minCosine. The verification
   * join here is all-pairs (fine at verification scale); the 100 TB path
   * bounds candidates with Similarity.lshBuckets first.
   */
  def embeddingNearDups(embs: DataFrame, id: Column, vec: Column, minCosine: Double): DataFrame = {
    val e = embs.select(id.as("id"), Similarity.asDouble(vec).as("v"))
    e.as("l").join(e.as("r"), col("l.id") < col("r.id"))
      .select(col("l.id").as("a"), col("r.id").as("b"),
        Similarity.cosine(col("l.v"), col("r.v")).as("cos"))
      .filter(col("cos") >= minCosine)
      .select("a", "b")
  }
}
