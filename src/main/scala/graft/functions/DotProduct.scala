package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst dot product over two `array<double>` columns.
  *
  * The composable form (`aggregate(zip_with(a, b, _*_), 0d, _+_)`) is
  * semantically identical but materializes an intermediate array and
  * evaluates a lambda per element; this expression is a single fused
  * primitive loop in both interpreted and whole-stage-codegen paths —
  * the hot inner loop of every cosine-similarity scan (SURVEY.md §2.9
  * escalation path (b): custom scalar Expression with `doGenCode`).
  *
  * Summation is left-to-right, exactly matching the `aggregate` fold and
  * the DuckDB oracle's `list_cosine_similarity` — swapping this in does
  * not change any oracle-compared result. Null ARRAY inputs → null
  * (BinaryExpression contract); null ELEMENTS are not expected
  * (embedding vectors are dense) and read as 0.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs are always cast to array<double> by the Column wrapper
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column-API wrapper (classic session only, like the rest of graft);
    * casts both sides to array<double> so the expression always sees its
    * expected input type.
    */
  def dotNative(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProduct(
      GraftSqlBridge.expression(a.cast("array<double>")),
      GraftSqlBridge.expression(b.cast("array<double>"))))
}
