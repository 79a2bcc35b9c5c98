package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the F-distribution upper-tail
  * p-value — the ANOVA companion to [[ChiSquarePValue]] (same codegen
  * pattern: the generated code calls the static [[StudentT.fPValue]]
  * incomplete-beta kernel on primitive doubles). Null-safe: NULL in →
  * NULL out; NaN from the kernel (non-positive dof or f < 0)
  * surfaces as NULL.
  *
  * Inputs: f DOUBLE (the F statistic), d1 DOUBLE, d2 DOUBLE (dof).
  */
case class FPValue(first: Expression, second: Expression,
                   third: Expression) extends TernaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "f_pvalue"

  override def nullSafeEval(f: Any, d1: Any, d2: Any): Any = {
    val p = StudentT.fPValue(f.asInstanceOf[Double],
      d1.asInstanceOf[Double], d2.asInstanceOf[Double])
    if (p.isNaN) null else p
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    // static forwarder, not MODULE$ — see PearsonPValue.doGenCode
    val kernel = StudentT.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (f, d1, d2) => {
      val p = ctx.freshName("p")
      s"""
         |double $p = $kernel.fPValue($f, $d1, $d2);
         |if (Double.isNaN($p)) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $p;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): FPValue =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object FPValue {
  /** Column-API entry point: upper-tail p of an F statistic. */
  def pValue(f: Column, d1: Column, d2: Column): Column =
    ColumnBridge.column(FPValue(ColumnBridge.expression(f),
      ColumnBridge.expression(d1), ColumnBridge.expression(d2)))
}
