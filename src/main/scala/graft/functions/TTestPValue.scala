package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the two-sided Student-t p-value at
  * fractional degrees of freedom — the Welch-test companion to
  * [[PearsonPValue]] (same codegen pattern: the generated code calls
  * the static [[StudentT.tPValue]] kernel on primitive doubles, so
  * the expression stays inside whole-stage codegen). Null-safe: NULL
  * in → NULL out; NaN from the kernel (df ≤ 0) surfaces as NULL.
  *
  * Inputs: t DOUBLE, df DOUBLE (Welch–Satterthwaite df is fractional).
  */
case class TTestPValue(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "ttest_pvalue"

  override def nullSafeEval(t: Any, df: Any): Any = {
    val p = StudentT.tPValue(t.asInstanceOf[Double], df.asInstanceOf[Double])
    if (p.isNaN) null else p
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    // static forwarder, not MODULE$ — see PearsonPValue.doGenCode
    val kernel = StudentT.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (t, df) => {
      val p = ctx.freshName("p")
      s"""
         |double $p = $kernel.tPValue($t, $df);
         |if (Double.isNaN($p)) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $p;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TTestPValue =
    copy(left = newLeft, right = newRight)
}

object TTestPValue {
  /** Column-API entry point: p-value of a t statistic at df degrees. */
  def pValue(t: Column, df: Column): Column =
    ColumnBridge.column(TTestPValue(
      ColumnBridge.expression(t), ColumnBridge.expression(df)))
}
