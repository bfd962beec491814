package graft.ops

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/**
 * Native fused vector kernels for the similarity hot path.
 *
 * Spark's higher-order functions (`aggregate`, `zip_with`) are
 * CodegenFallback: every candidate-pair score runs interpreted, with a
 * per-element lambda dispatch AND a materialized intermediate array per
 * fold — and `cosine` needs THREE folds (a·b, a·a, b·b), i.e. three
 * intermediate arrays per scored pair. At 100 TB the verify stage of
 * every ANN / near-dup pipeline is exactly this expression, so it is
 * the preference-order case for a custom Catalyst expression: one
 * codegen'd loop, no intermediate arrays, one pass over both vectors.
 *
 * Bit-exactness contract: each kernel accumulates with the SAME
 * sequential left-fold order and the same IEEE operations as the HOF
 * formulation it replaces, so scores — and therefore every DuckDB
 * oracle built on sequential-fold doubles — are bit-identical
 * (differentially asserted in OpsSpec against the retained HOF twins).
 *
 * Null semantics (mirrors the HOF folds): NULL input array -> NULL
 * (BinaryExpression's null-intolerant default); a NULL element or
 * length mismatch -> NULL result (in the HOF form, null elements
 * poison the fold and zip_with pads the shorter side with nulls).
 */
object VecKernel {

  /** a·b, or null on length mismatch / null element. */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  /** cos(a,b) = a·b / (sqrt(a·a) * sqrt(b·b)) in ONE pass. */
  def cosine(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var ab = 0.0d
    var aa = 0.0d
    var bb = 0.0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      ab += x * y
      aa += x * x
      bb += y * y
      i += 1
    }
    ab / (math.sqrt(aa) * math.sqrt(bb))
  }

  /** Σ (a_i - b_i)², left fold. */
  def l2sq(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }
}

/** Shared shape of the three binary vector kernels. Inputs must already
  * be array<double> (Spark 4 hides AbstractDataType, so the implicit-cast
  * trait is unavailable outside org.apache.spark.sql — the Column
  * wrappers in Similarity and the SQL registrations in GraftFunctions
  * insert the cast instead). */
abstract class VecBinaryExpression extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  /** Fully-qualified static kernel method, e.g. "graft.ops.VecKernel.dot". */
  protected def kernel: String

  override protected def nullSafeEval(a: Any, b: Any): Any

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |java.lang.Double ${ev.value}_r = $kernel($a, $b);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r.doubleValue();
         |}
       """.stripMargin)
}

case class VecDot(left: Expression, right: Expression) extends VecBinaryExpression {
  override protected def kernel: String = "graft.ops.VecKernel.dot"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecKernel.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class VecCosine(left: Expression, right: Expression) extends VecBinaryExpression {
  override protected def kernel: String = "graft.ops.VecKernel.cosine"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecKernel.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class VecL2Sq(left: Expression, right: Expression) extends VecBinaryExpression {
  override protected def kernel: String = "graft.ops.VecKernel.l2sq"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecKernel.l2sq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
