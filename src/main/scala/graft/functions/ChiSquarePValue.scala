package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the chi-square upper-tail p-value —
  * the goodness-of-fit companion to [[PearsonPValue]]/[[TTestPValue]]
  * (same codegen pattern: the generated code calls the static
  * [[StudentT.chiSqPValue]] gamma-Q kernel on primitive doubles).
  * Null-safe: NULL in → NULL out; NaN from the kernel (df ≤ 0 or
  * x < 0) surfaces as NULL.
  *
  * Inputs: x DOUBLE (the chi-square statistic), k DOUBLE (dof).
  */
case class ChiSquarePValue(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "chisq_pvalue"

  override def nullSafeEval(x: Any, k: Any): Any = {
    val p = StudentT.chiSqPValue(x.asInstanceOf[Double],
      k.asInstanceOf[Double])
    if (p.isNaN) null else p
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    // static forwarder, not MODULE$ — see PearsonPValue.doGenCode
    val kernel = StudentT.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (x, k) => {
      val p = ctx.freshName("p")
      s"""
         |double $p = $kernel.chiSqPValue($x, $k);
         |if (Double.isNaN($p)) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $p;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ChiSquarePValue =
    copy(left = newLeft, right = newRight)
}

object ChiSquarePValue {
  /** Column-API entry point: upper-tail p of a chi-square statistic. */
  def pValue(x: Column, k: Column): Column =
    ColumnBridge.column(ChiSquarePValue(
      ColumnBridge.expression(x), ColumnBridge.expression(k)))
}
