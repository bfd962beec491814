package graft.kg

import org.apache.spark.sql.SparkSession

/**
 * SQL-surface registration: exposes the native expressions to
 * `spark.sql` users, e.g.
 *
 *   SELECT repo, path, p.* FROM corpus
 *   LATERAL VIEW parse_nt(content, lang) p
 *
 *   SELECT canon_iri(p.subj) ... -- single-pass IRI canonicalization
 */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "parse_nt", exprs => ParseNtLines(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "canon_iri", exprs => CanonicalizeIri(exprs(0)), "scala_udf")
    def toDouble(e: org.apache.spark.sql.catalyst.expressions.Expression) =
      org.apache.spark.sql.catalyst.expressions.Cast(e,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => graft.ops.VecDot(toDouble(exprs(0)), toDouble(exprs(1))), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_cosine", exprs => graft.ops.VecCosine(toDouble(exprs(0)), toDouble(exprs(1))), "scala_udf")
  }
}
