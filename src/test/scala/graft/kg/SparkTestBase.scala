package graft.kg

import org.apache.spark.sql.SparkSession

/** One shared local session for all Spark-backed suites. */
object TestSpark {
  lazy val spark: SparkSession =
    Pipeline.session("graft-test", master = Some("local[4]"), shufflePartitions = 4)
}
