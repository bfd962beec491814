package graft.kg

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * SPARQL ENCODE_FOR_URI (XPath fn:encode-for-uri): percent-encode every
 * byte of the UTF-8 form EXCEPT the RFC 3986 unreserved set
 * `A-Z a-z 0-9 - _ . ~`, uppercase hex digits. Byte-level encoding is
 * exactly the spec's definition (each character is encoded as its UTF-8
 * octet sequence), so one linear byte scan suffices — no character
 * decoding, no regex, ZERO-COPY when nothing needs escaping (the common
 * case for machine-generated slugs).
 *
 * Codegen: a static call inside whole-stage codegen — no
 * CodegenFallback, no UDF (same pattern as [[NormalizeLabel]]).
 */
case class EncodeForUri(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    UriEncode.encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.kg.UriEncode.encode($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UriEncode {

  private val Hex = "0123456789ABCDEF".getBytes("US-ASCII")

  @inline private def unreserved(b: Byte): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z') ||
      (b >= '0' && b <= '9') || b == '-' || b == '_' || b == '.' || b == '~'

  /** Percent-encoded form; returns the INPUT REFERENCE when already
    * fully unreserved (no allocation). */
  def encode(v: UTF8String): UTF8String = {
    if (v == null) return null
    val bytes = v.getBytes
    var extra = 0
    var i = 0
    while (i < bytes.length) {
      if (!unreserved(bytes(i))) extra += 2
      i += 1
    }
    if (extra == 0) return v // fast path: nothing to escape
    val out = new Array[Byte](bytes.length + extra)
    var k = 0
    i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (unreserved(b)) { out(k) = b; k += 1 }
      else {
        out(k) = '%'
        out(k + 1) = Hex((b >> 4) & 0xf)
        out(k + 2) = Hex(b & 0xf)
        k += 3
      }
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Plain-String twin (unit tests share one semantics). */
  def encodeString(v: String): String =
    encode(UTF8String.fromString(v)).toString
}

object EncodeForUri {
  import org.apache.spark.sql.graftshim.ColumnShim

  def apply(c: Column): Column =
    ColumnShim.column(EncodeForUri(ColumnShim.expression(c)))
}
