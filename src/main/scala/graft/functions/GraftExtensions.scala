package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session extension registering graft's native functions into the SQL
  * dialect, so `spark.sql("... dot_product(a, b) ...")` works next to
  * the Column API. Install at session build time with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`; for an
  * already-running session use [[GraftFunctions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.dotProductDescriptor)
    ext.injectFunction(GraftFunctions.charNGramsDescriptor)
    ext.injectFunction(GraftFunctions.adcLookupSumDescriptor)
  }
}

object GraftFunctions {
  private[functions] val dotProductDescriptor = (
    FunctionIdentifier("dot_product"),
    new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
    (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(exprs.length == 2, "dot_product takes exactly 2 arguments")
      // SQL args arrive un-cast (array<float> columns, int literals, …);
      // the expression reads 8-byte slots, so coerce exactly like the
      // Column wrapper does
      import org.apache.spark.sql.catalyst.expressions.Cast
      import org.apache.spark.sql.types.{ArrayType, DoubleType}
      DotProduct(
        Cast(exprs(0), ArrayType(DoubleType)),
        Cast(exprs(1), ArrayType(DoubleType)))
    })

  private[functions] val charNGramsDescriptor = (
    FunctionIdentifier("char_ngrams"),
    new ExpressionInfo(classOf[CharNGrams].getName, "char_ngrams"),
    (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(exprs.length == 2, "char_ngrams takes (string, n) arguments")
      import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
      import org.apache.spark.sql.types.StringType
      val n = exprs(1) match {
        case Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"char_ngrams n must be an integer literal, got $other")
      }
      CharNGrams(Cast(exprs(0), StringType), n)
    })

  private[functions] val adcLookupSumDescriptor = (
    FunctionIdentifier("adc_lookup_sum"),
    new ExpressionInfo(classOf[AdcLookupSum].getName, "adc_lookup_sum"),
    (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(exprs.length == 2, "adc_lookup_sum takes (codes, dtabs) arguments")
      import org.apache.spark.sql.catalyst.expressions.Cast
      import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType}
      AdcLookupSum(
        Cast(exprs(0), ArrayType(IntegerType)),
        Cast(exprs(1), ArrayType(ArrayType(DoubleType))))
    })

  /** Runtime registration for an existing session (idempotent). */
  def register(spark: SparkSession): Unit =
    Seq(dotProductDescriptor, charNGramsDescriptor, adcLookupSumDescriptor).foreach {
      case (id, info, builder) =>
        spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
