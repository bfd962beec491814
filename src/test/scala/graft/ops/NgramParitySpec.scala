package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.kg.TestSpark

/**
 * Parity gate for the native [[WordNgrams]] expression against the HOF
 * formulation it replaced (r7): same values on every adversarial shape
 * the split(" ")-with-kept-empties semantics produces. A drift here
 * would silently change every shingle-derived oracle (minhash bands,
 * jaccard counts, inverted index, winnowing windows).
 */
class NgramParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val cases = Seq(
    "a b c d e",
    "a b c",
    "a b",          // shorter than n=3
    "one",
    "",             // one empty token
    " ",            // two empty tokens
    "   ",          // four empty tokens: grams carry interior spaces
    "a  b",         // empty token in the middle
    " a b ",        // leading + trailing empties
    "café μ-ü ascii mix",  // multi-byte UTF-8 across gram boundaries
    "x " * 50 + "end",     // longer run
    "tab\tis not a delimiter only space is",
    "a b c a b c a b c")   // repeats

  test("WordNgrams == HOF formulation for n in 1..5 (plus NULL text)") {
    for (n <- 1 to 5) {
      val df = (cases.map(Option(_)) :+ Option.empty[String]).toDF("text")
        .select(col("text"),
          TextOps.ngramArray(col("text"), n).as("native"),
          TextOps.ngramArrayHof(col("text"), n).as("hof"))
      val bad = df.filter(not(col("native") <=> col("hof"))).collect()
      assert(bad.isEmpty, s"n=$n mismatches: ${bad.mkString("; ")}")
    }
  }

  test("plain-String twin matches the column path") {
    val got = Ngrams.ngramsString("a  b c", 2)
    assert(got == Seq("a ", " b", "b c"))
  }
}
