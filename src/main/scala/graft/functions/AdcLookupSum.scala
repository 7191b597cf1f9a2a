package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native ADC (asymmetric distance computation) lookup-sum for product
  * quantization: given a vector's PQ `codes` (`array<int>`, one centroid
  * id per subspace) and a query's distance tables `dtabs`
  * (`array<array<double>>`, one inner-product table per subspace),
  * returns Σᵢ dtabs[i][codes[i]] — the PQ estimate of the query·vector
  * inner product (Jégou et al., TPAMI 2011, §IV-A).
  *
  * This is THE hot loop of a PQ scan: it runs once per (query,
  * candidate) pair. The composable form
  * `aggregate(zip_with(codes, dtabs, (c, t) -> element_at(t, c + 1)))`
  * is a higher-order function — CodegenFallback, an interpreted lambda
  * per subspace per pair — measured as the dominant cost of the
  * x47/x49 recall gates. This expression is a single fused primitive
  * loop in both the interpreted and whole-stage-codegen paths (SURVEY.md
  * §2.9 escalation path (b), same shape as [[DotProduct]]).
  *
  * Contract: codes are POSITIONAL indices into the per-subspace tables —
  * the codebook must be cid-dense (0..k-1 per subspace, which
  * `Similarity.pqCodebook` re-densifies after its Lloyd passes). An
  * out-of-range code throws (like ANSI `element_at`) rather than
  * silently misreading. Null ARRAY inputs → null (BinaryExpression
  * contract); null elements are not expected (codes and tables are
  * dense by construction).
  */
case class AdcLookupSum(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs are cast to array<int> / array<array<double>> by the wrapper
  override def dataType: DataType = DoubleType
  override def prettyName: String = "adc_lookup_sum"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val dtabs = b.asInstanceOf[ArrayData]
    val n = math.min(codes.numElements(), dtabs.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val c = codes.getInt(i)
      val tab = dtabs.getArray(i)
      if (c < 0 || c >= tab.numElements()) {
        throw new ArrayIndexOutOfBoundsException(
          s"adc_lookup_sum: code $c out of range for subspace $i table of " +
            s"${tab.numElements()} centroids (codebook not cid-dense?)")
      }
      s += tab.getDouble(c)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, dtabs) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val tab = ctx.freshName("tab")
      s"""
         |int $n = java.lang.Math.min($codes.numElements(), $dtabs.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  int $c = $codes.getInt($i);
         |  org.apache.spark.sql.catalyst.util.ArrayData $tab = $dtabs.getArray($i);
         |  if ($c < 0 || $c >= $tab.numElements()) {
         |    throw new ArrayIndexOutOfBoundsException(
         |      "adc_lookup_sum: code " + $c + " out of range for subspace " + $i);
         |  }
         |  $s += $tab.getDouble($c);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcLookupSum =
    copy(left = newLeft, right = newRight)
}

object AdcLookupSum {
  /** Column-API wrapper; casts both sides so the expression always sees
    * its expected input types.
    */
  def adcNative(codes: Column, dtabs: Column): Column =
    GraftSqlBridge.column(AdcLookupSum(
      GraftSqlBridge.expression(codes.cast(ArrayType(IntegerType))),
      GraftSqlBridge.expression(dtabs.cast(ArrayType(ArrayType(DoubleType))))))
}
