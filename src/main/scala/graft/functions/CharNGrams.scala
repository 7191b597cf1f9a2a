package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass gram core, in a plain object so the companion-class-free
  * static forwarder is directly callable from generated Java code.
  */
object NGramOps {
  /** All overlapping character n-grams of `s`, in order (with repeats);
    * empty array when the string is shorter than n. One walk over the
    * UTF-8 bytes records char-start offsets, then each gram is a bounded
    * byte copy — O(len · n) total, no per-position re-scan.
    */
  def extract(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val nc = s.numChars()
    if (nc < n) return new GenericArrayData(Array.empty[Any])
    val offsets = new Array[Int](nc + 1)
    var i = 0
    var c = 0
    while (i < bytes.length) {
      offsets(c) = i
      c += 1
      i += UTF8String.numBytesForFirstByte(bytes(i))
    }
    offsets(nc) = bytes.length
    val out = new Array[Any](nc - n + 1)
    var g = 0
    while (g <= nc - n) {
      out(g) = UTF8String.fromBytes(bytes, offsets(g), offsets(g + n) - offsets(g))
      g += 1
    }
    new GenericArrayData(out)
  }
}

/** Native Catalyst character-n-gram extraction over a string column.
  *
  * The composable form (`transform(sequence(...), i -> substring(t, i, n))`)
  * re-scans the UTF-8 bytes from the start for every position (O(len²/2)
  * per row) — and its char-array alternative is worse under projection
  * collapse (see PLANS.md). This expression walks the bytes ONCE,
  * recording char offsets, then emits each gram as a bounded copy —
  * O(len·n), safe to inline anywhere, identical output to the substring
  * form (char-exact on multibyte text). SURVEY.md §2.9 escalation path
  * (b): custom scalar Expression, codegen'd via a static helper call.
  */
case class CharNGrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n-gram size must be positive, got $n")

  // declared input check: a directly-constructed instance over a
  // non-string child fails at ANALYSIS time instead of a
  // ClassCastException in interpreted eval / a codegen compile error —
  // the builder entry points below insert the string cast anyway
  // (ExpectsInputTypes would be the idiomatic spelling, but its
  // signature needs AbstractDataType, which is private[sql])
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // accept ANY collation (isInstanceOf, not ==): eval/codegen only
    // touch UTF8String bytes, and a `STRING COLLATE ...` child worked
    // before this check existed — the check must not narrow that
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_ngrams requires a STRING child, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngrams"

  override protected def nullSafeEval(input: Any): Any =
    NGramOps.extract(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NGramOps.extract($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): CharNGrams =
    copy(child = newChild)
}

object CharNGrams {
  /** Column-API wrapper (classic session only, like the rest of graft). */
  def charNGrams(c: Column, n: Int): Column =
    GraftSqlBridge.column(CharNGrams(GraftSqlBridge.expression(c.cast("string")), n))
}
