package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{ChiSquarePValue, DotProduct, FPValue, PearsonPValue, RollingFingerprint, TTestPValue, VaderCompound}

/** SparkSessionExtensions entry point for the engine's native
  * functions — the registration path for custom Catalyst expressions:
  *
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  *     ...
  * }}}
  *
  * makes them SQL-callable (`SELECT pearson_pvalue(r, n) …`) in every
  * session of the cluster. For an already-built session (notebooks,
  * the shared test session) use
  * [[org.apache.spark.sql.graftbridge.ColumnBridge.registerFunctions]]
  * which applies the same injections to the live registry.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.PushDateTruncFilters)
  }
}

object GraftExtensions {
  /** (identifier, info, builder) triples — one per native function. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("pearson_pvalue"),
      new ExpressionInfo(classOf[PearsonPValue].getName, "pearson_pvalue"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"pearson_pvalue expects (r DOUBLE, n BIGINT), got ${children.size} args")
        PearsonPValue(children.head, children(1))
      }),
    (FunctionIdentifier("vader_compound"),
      new ExpressionInfo(classOf[VaderCompound].getName, "vader_compound"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          s"vader_compound expects (text STRING), got ${children.size} args")
        VaderCompound(children.head)
      }),
    (FunctionIdentifier("rolling_fp"),
      new ExpressionInfo(classOf[RollingFingerprint].getName, "rolling_fp"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          s"rolling_fp expects (text STRING), got ${children.size} args")
        RollingFingerprint(children.head)
      }),
    (FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"vec_dot expects (a ARRAY, b ARRAY), got ${children.size} args")
        DotProduct(children.head, children(1))
      }),
    (FunctionIdentifier("chisq_pvalue"),
      new ExpressionInfo(classOf[ChiSquarePValue].getName, "chisq_pvalue"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"chisq_pvalue expects (x DOUBLE, k DOUBLE), got ${children.size} args")
        ChiSquarePValue(children.head, children(1))
      }),
    (FunctionIdentifier("t_pvalue"),
      new ExpressionInfo(classOf[TTestPValue].getName, "t_pvalue"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"t_pvalue expects (t DOUBLE, df DOUBLE), got ${children.size} args")
        TTestPValue(children.head, children(1))
      }),
    (FunctionIdentifier("f_pvalue"),
      new ExpressionInfo(classOf[FPValue].getName, "f_pvalue"),
      (children: Seq[Expression]) => {
        require(children.size == 3,
          s"f_pvalue expects (f DOUBLE, d1 DOUBLE, d2 DOUBLE), got ${children.size} args")
        FPValue(children.head, children(1), children(2))
      }))
}
