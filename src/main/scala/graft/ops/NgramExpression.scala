package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native word-n-gram expression (r7, guide §4: no interpreted HOFs in
 * the hot path): byte-for-byte the semantics of the HOF formulation
 *
 *   transform(sequence(1, size(words) - (n-1)),
 *             i => concat_ws(" ", slice(words, i, n)))
 *   with words = split(text, " ")
 *
 * which it replaces as the shingling inner loop of the dedup family
 * (minhash/jaccard/split/dup-cluster/inverted-index), top-k n-grams,
 * repetition metrics and the count-min gate. The HOF chain runs as four
 * nested CodegenFallback evaluations allocating a words array, a
 * sequence array, n-long slices and a concat per gram; this is ONE
 * linear byte scan emitting zero-copy-adjacent slices of the ORIGINAL
 * bytes — valid because the split delimiter and the join delimiter are
 * the same single space, so the n-gram spanning tokens i..i+n-1 IS the
 * input byte range from the start of token i to the end of token
 * i+n-1 (empty tokens from repeated spaces reproduce exactly: the
 * slice carries the interior spaces verbatim, which is what concat_ws
 * over empty strings renders). NgramParitySpec pins equality against
 * the HOF formulation over the adversarial shapes.
 *
 * Codegen: a static call inside whole-stage codegen — no
 * CodegenFallback, no UDF (same pattern as [[graft.kg.NormalizeLabel]]).
 * NULL handling stays in the wrapper (TextOps.ngramArray coalesces NULL
 * text to the empty array, as the `when` in the HOF form did).
 */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def nullSafeEval(input: Any): Any =
    Ngrams.ngrams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.Ngrams.ngrams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Ngrams {

  /** Array of space-joined word n-grams; empty when the text has fewer
    * than n tokens. Tokens are maximal runs between single-space
    * delimiters, exactly like split(text, " ") with its kept empty
    * tokens (leading/trailing/consecutive spaces). */
  def ngrams(v: UTF8String, n: Int): ArrayData = {
    val bytes = v.getBytes
    val numBytes = bytes.length
    var spaces = 0
    var i = 0
    while (i < numBytes) { if (bytes(i) == ' ') spaces += 1; i += 1 }
    val tokens = spaces + 1
    val cnt = tokens - (n - 1)
    if (cnt < 1) return new GenericArrayData(Array.empty[Any])
    // starts(t) = byte offset of token t; starts(tokens) = one past a
    // virtual trailing delimiter, so "end of token t" = starts(t+1) - 1
    val starts = new Array[Int](tokens + 1)
    var t = 1
    i = 0
    while (i < numBytes) {
      if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(tokens) = numBytes + 1
    val out = new Array[Any](cnt)
    var g = 0
    while (g < cnt) {
      out(g) = UTF8String.fromBytes(bytes, starts(g), starts(g + n) - 1 - starts(g))
      g += 1
    }
    new GenericArrayData(out)
  }

  /** Plain-String twin (unit tests share one semantics). */
  def ngramsString(v: String, n: Int): Seq[String] = {
    val a = ngrams(UTF8String.fromString(v), n)
    (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
  }
}

object WordNgrams {
  import org.apache.spark.sql.graftshim.ColumnShim

  def apply(c: Column, n: Int): Column =
    ColumnShim.column(WordNgrams(ColumnShim.expression(c), n))
}
