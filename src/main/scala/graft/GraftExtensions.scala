package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/**
 * Cluster-wide SQL registration of the engine's native expressions via
 * the supported extension point:
 *
 *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
 *
 * makes `parse_nt`, `canon_iri`, `vec_dot`, `vec_cosine` available to
 * every session (including pure-SQL users and thrift/connect clients)
 * without any driver-side `GraftFunctions.register(spark)` call — the
 * session-scoped registration that helper performs remains for
 * programmatic use and tests.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def toDouble(e: Expression): Expression =
    Cast(e, ArrayType(DoubleType))

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("parse_nt"),
      info("parse_nt", "parse_nt(content, lang) - explodes N-Triples text into parsed statement rows"),
      (exprs: Seq[Expression]) => kg.ParseNtLines(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("canon_iri"),
      info("canon_iri", "canon_iri(iri) - single-pass IRI canonicalization"),
      (exprs: Seq[Expression]) => kg.CanonicalizeIri(exprs(0))))
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - fused dot product of two double arrays"),
      (exprs: Seq[Expression]) => ops.VecDot(toDouble(exprs(0)), toDouble(exprs(1)))))
    ext.injectFunction((FunctionIdentifier("vec_cosine"),
      info("vec_cosine", "vec_cosine(a, b) - fused cosine similarity of two double arrays"),
      (exprs: Seq[Expression]) => ops.VecCosine(toDouble(exprs(0)), toDouble(exprs(1)))))
  }
}
