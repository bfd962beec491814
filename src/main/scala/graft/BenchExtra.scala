package graft

import org.apache.spark.sql.SparkSession

/**
 * Optimization-round helper bench (guide §1.4): times individual declared
 * queries in ISOLATION with the noop sink and dumps `.explain("formatted")`
 * for each. NOT part of the driver contract — `graft.Bench` stays the
 * frozen measurement harness; this main exists so per-query plan/timing
 * evidence can be produced without re-running the full bench.
 *
 * Usage:
 *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
 *     sbt "runMain graft.BenchExtra [--plans <dir>] [--reps N] q1 q2 ..."
 *
 * Timing semantics match Bench part 1: the timed region is the full query
 * lambda (corpus build + checkpoints + noop-sink materialization), best of
 * `reps` interleaved rounds.
 */
object BenchExtra {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-extra-$cpus")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", (16L << 20).toString)
      .config("spark.sql.files.openCostInBytes", (1L << 20).toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def timed[A](f: => A): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

    var plansDir: Option[String] = None
    var reps = 2
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--plans" => plansDir = Some(args(i + 1)); i += 2
        case "--reps"  => reps = args(i + 1).toInt; i += 2
        case q         => names += q; i += 1
      }
    }
    require(names.nonEmpty, "BenchExtra: no query names given")
    names.foreach(n => require(SparkEntry.queries.contains(n), s"unknown query: $n"))

    val spark = session(cpus)
    // session warmup, same as Bench part 1
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    SparkEntry.queries("kg_parse_nation")(spark, sfDir).count()

    // plan dumps first (building the frame runs the eager checkpoints, so
    // this also pre-warms parquet footers for the timed rounds)
    plansDir.foreach { d =>
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
      names.foreach { n =>
        val df = SparkEntry.queries(n)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(java.nio.file.Paths.get(d, s"$n.txt"),
          txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    }

    val samples = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    (1 to reps).foreach { _ =>
      names.foreach { n =>
        spark.sparkContext.setJobDescription(s"bench-extra: $n")
        val sec = timed {
          SparkEntry.queries(n)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
        }
        spark.sparkContext.setJobDescription(null)
        samples(n) = samples(n) :+ sec
      }
    }
    val fields = names.map { n =>
      val best = samples(n).min
      s""""$n":{"best":${"%.3f".format(best)},"samples":[${samples(n).map("%.3f".format(_)).mkString(",")}]}"""
    }
    println(s"""{"bench_extra":{${fields.mkString(",")}},"sf":"$sfDir","reps":$reps}""")
    spark.stop()
  }
}
