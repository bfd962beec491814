package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.kg.TestSpark

/**
 * Integer BM25 ([[TextOps.bm25Scaled]]): the exact scaled formula
 * recomputed independently with BigInt, plus the ranking properties the
 * integer substitutions must preserve (tf monotone up, doc-length
 * penalty, rare-term preference).
 */
class Bm25Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Independent BigInt mirror of one term's contribution. */
  private def contrib(nDocs: Long, totTokens: Long, df: Long, tf: Long, dl: Long): BigInt = {
    val idf = BigInt((nDocs - df) * 1000000L / (df + 1))
    val (l, n) = (BigInt(totTokens), BigInt(nDocs))
    (idf * 44 * l * tf) / (BigInt(20) * l * tf + 6 * l + 18 * dl * n)
  }

  test("scores equal the BigInt mirror of the scaled formula") {
    val docs = Seq(
      (1L, "spark spark join"),        // tf(spark)=2, dl=3
      (2L, "spark row"),               // tf=1, dl=2
      (3L, "merge sort group window")  // no hit for 'spark'
    ).toDF("doc_id", "text")
    val got = TextOps.bm25Scaled(docs, col("doc_id"), col("text"), Seq("spark"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // N=3 docs, L=3+2+4=9 tokens, df(spark)=2
    val e1 = contrib(3, 9, 2, 2, 3)
    val e2 = contrib(3, 9, 2, 1, 2)
    assert(got === Map(1L -> e1.toLong, 2L -> e2.toLong))
    assert(!got.contains(3L), "docs without any query term must not appear")
  }

  test("ranking properties: tf up, length penalized, rare terms weighted") {
    // same length, higher tf wins
    assert(contrib(100, 1000, 10, 3, 10) > contrib(100, 1000, 10, 1, 10))
    // same tf, longer doc penalized
    assert(contrib(100, 1000, 10, 2, 50) < contrib(100, 1000, 10, 2, 10))
    // same tf/dl, rarer term contributes more
    assert(contrib(100, 1000, 2, 1, 10) > contrib(100, 1000, 50, 1, 10))
    // contribution saturates in tf (k1 damping), never exceeds (k1+1)*idf
    val idfTimes22 = BigInt((100L - 10) * 1000000L / 11) * 22 / 10
    assert(contrib(100, 1000, 10, 1000000, 10) <= idfTimes22)
  }

  test("top-k ties at the boundary break deterministically by id") {
    val docs = (1 to 8).map(i => (i.toLong, "spark alone")).toDF("doc_id", "text")
    val got = TextOps.bm25Scaled(docs, col("doc_id"), col("text"), Seq("spark"), 3)
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(1L, 2L, 3L))
  }
}
