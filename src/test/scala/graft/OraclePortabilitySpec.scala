package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kg.TestSpark
import java.nio.file.Files
import scala.sys.process._

/**
 * Driver-canonicalization portability gate for every `SparkEntry.oracleSql`.
 *
 * Round 3 lost six hash checks (kg_pagerank, td_collocations, td_funnel,
 * td_json_props, td_rollup_stats, td_sessionize) to a pure TYPE-RENDERING
 * artifact: DuckDB `sum()` / `//` yields HUGEINT (int128), which the
 * driver's arrow/pandas fetch stringifies differently from the int64 the
 * Spark parquet dump carries — identical values, mismatched hashes. The
 * local str()-based checker could not see it.
 *
 * This spec runs each oracle through local DuckDB (bind + plan only) via
 * tools/check_oracle_types.py and asserts
 *   - no result column has a type in {HUGEINT, DECIMAL, INTERVAL,
 *     TIMESTAMP WITH TIME ZONE, unsigned ints},
 *   - no duplicate column names,
 *   - the oracle's column-name set equals the Spark query's columns
 *     (the driver sorts columns BY NAME before hashing),
 *   - every `queries` entry has an oracle (no silent rows-only fallback).
 * It would have caught all six round-3 failures before the driver ran.
 */
class OraclePortabilitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def pythonWithDuckdb: Boolean =
    try Process(Seq("python3", "-c", "import duckdb")).!(ProcessLogger(_ => ())) == 0
    catch { case _: Exception => false }

  test("every oracle binds in DuckDB with driver-portable result types") {
    assume(pythonWithDuckdb, "python3+duckdb unavailable in this environment")

    // deleted in the finally below — File.deleteOnExit cannot remove a
    // non-empty directory, which would leak one dir per test run
    val tmp = Files.createTempDirectory("oracle-portability")
    try {

    val oraclePath = tmp.resolve("oracle_sql.json")
    Files.writeString(oraclePath,
      Verify.jsonObject(SparkEntry.oracleSql.view.mapValues(Verify.jsonString).toMap))

    // Spark-side column names are schema-only: building the DataFrame does
    // not execute it (the streaming queries replay a tiny sf0.001 stream
    // during construction, same as PlanAuditSpec accepts).
    val sparkCols = SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, dir).columns.toSeq
    }
    val colsPath = tmp.resolve("spark_cols.json")
    Files.writeString(colsPath, Verify.jsonObject(
      sparkCols.view.mapValues(cs => cs.map(Verify.jsonString).mkString("[", ",", "]")).toMap))

    val out = new StringBuilder
    val rc = Process(Seq("python3", "tools/check_oracle_types.py",
      "/root/testdata/sf0.001", oraclePath.toString, colsPath.toString))
      .!(ProcessLogger(l => out.append(l).append('\n')))
    val report = out.toString
    assert(rc == 0, s"oracle portability check failed:\n$report")
    assert(!report.contains("NO-ORACLE"), s"query without oracle:\n$report")
    } finally {
      val fs = tmp.toFile.listFiles()
      if (fs != null) fs.foreach(_.delete())
      tmp.toFile.delete()
      ()
    }
  }
}
