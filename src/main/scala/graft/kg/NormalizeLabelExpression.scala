package graft.kg

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Single-pass blocking-key label normalization (F2): lowercase, keep
 * only [a-z0-9] — byte-for-byte the semantics of
 * `regexp_replace(lower(label), "[^a-z0-9]+", "")`, which it replaces
 * as EntityResolution's blocking hot loop (the r2 IRI-canonicalization
 * lesson: at 1e9 labels a per-row regex dominates the blocking stage;
 * the fused byte scan's measured advantage is recorded per round in
 * Bench's `norm_label_ab` block).
 *
 * ASCII fast path: one linear byte scan, ZERO-COPY when the label is
 * already normalized (lowercase alphanumeric — the common case for
 * machine-generated labels). Any byte >= 0x80 falls back to
 * `UTF8String.toLowerCase` (the same kernel Spark's `lower()` uses
 * under the default UTF8_BINARY collation) followed by the same byte
 * filter. The byte filter is exact against the character-level regex
 * because UTF-8 multi-byte sequences never contain ASCII bytes: every
 * dropped byte belongs to a character the regex would drop, and any
 * ASCII char a Unicode lowercasing EXPANDS to survives on both paths
 * (e.g. U+0130 lowercases to "i" + U+0307; both keep the "i").
 * NormalizeLabelSpec pins parity against the regex formulation over
 * adversarial Unicode.
 *
 * Codegen: a static call inside whole-stage codegen — no
 * CodegenFallback, no UDF (same pattern as [[CanonicalizeIri]]).
 */
case class NormalizeLabel(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    LabelNorm.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.kg.LabelNorm.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LabelNorm {

  @inline private def isKept(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')
  @inline private def isUpper(b: Byte): Boolean = b >= 'A' && b <= 'Z'

  /** Keep [a-z0-9], lowercase [A-Z], drop everything else (incl. every
    * byte >= 0x80 — callers pass pre-lowercased bytes on that path). */
  private def filterBytes(bytes: Array[Byte]): UTF8String = {
    val out = new Array[Byte](bytes.length)
    var k = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (isKept(b)) { out(k) = b; k += 1 }
      else if (isUpper(b)) { out(k) = (b + 32).toByte; k += 1 }
      i += 1
    }
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, k))
  }

  /** Normalized form; returns the INPUT REFERENCE when already normal. */
  def normalize(v: UTF8String): UTF8String = {
    if (v == null) return null
    val bytes = v.getBytes
    var ascii = true
    var changed = false
    var i = 0
    while (i < bytes.length && ascii) {
      val b = bytes(i)
      if ((b & 0x80) != 0) ascii = false
      else if (!isKept(b)) changed = true
      i += 1
    }
    if (!ascii) filterBytes(v.toLowerCase.getBytes)
    else if (changed) filterBytes(bytes)
    else v // fast path: no allocation
  }

  /** Plain-String twin (unit tests share one semantics). */
  def normalizeString(v: String): String =
    normalize(UTF8String.fromString(v)).toString
}

object NormalizeLabel {
  import org.apache.spark.sql.graftshim.ColumnShim

  def apply(c: Column): Column =
    ColumnShim.column(NormalizeLabel(ColumnShim.expression(c)))
}
