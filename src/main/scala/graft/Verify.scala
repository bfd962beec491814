package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query names — faster local
    // iteration on a subset (the driver always passes exactly two args)
    val (sfDir, outDir) = (args(0), args(1))
    val subset: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => subset.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    // subset runs write only the subset's oracles, so the paired
    // check_oracles.py pass goes green instead of flagging the other
    // queries MISSING
    val oracleOut = SparkEntry.oracleSql
      .filter { case (name, _) => subset.forall(_.contains(name)) }
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      Verify.jsonObject(oracleOut.view.mapValues(jsonString).toMap))
    // a subset run into a dir holding an older FULL run would leave the
    // other queries' parquet in place with their oracles gone — a later
    // check over that dir would silently grade only the subset. Marker
    // file makes the mix detectable: check_oracles.py refuses a marked
    // dir unless explicitly told the subset is intended; full runs
    // remove any stale marker.
    val marker = Paths.get(s"$outDir/_subset_run.json")
    subset match {
      case Some(names) => Files.writeString(marker,
        names.toSeq.sorted.map(jsonString).mkString("[", ",", "]"))
      case None => Files.deleteIfExists(marker): Unit
    }
    spark.stop()
  }

  // JSON string escape: backslash, quote, and ALL control chars (<0x20)
  // — a tab or CR in builder-authored SQL would otherwise make the
  // driver's json.load fail and silently zero the round's correctness.
  def jsonString(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** values must already be valid JSON (use jsonString for strings). */
  def jsonObject(fields: Map[String, String]): String =
    fields.map { case (k, v) => s"${jsonString(k)}: $v" }.mkString("{", ",", "}")
}
