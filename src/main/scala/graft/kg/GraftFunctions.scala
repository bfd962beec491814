package graft.kg

import org.apache.spark.sql.SparkSession

/**
 * SQL-surface registration: exposes the native parse generator to
 * `spark.sql` users as a table-generating function, e.g.
 *
 *   SELECT repo, path, p.* FROM corpus
 *   LATERAL VIEW parse_nt(content, lang) p
 */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "parse_nt", exprs => ParseNtLines(exprs(0), exprs(1)), "scala_udf")
  }
}
