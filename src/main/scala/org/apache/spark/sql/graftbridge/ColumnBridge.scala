package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge for custom Catalyst expressions.
  *
  * Spark 4 routes the public Column API through ColumnNodes and keeps
  * the classic converters `private[sql]`; this one-file shim lives in
  * an `org.apache.spark.sql` subpackage purely to re-export the two
  * conversions the engine's native expressions need. No Spark
  * internals are modified or shadowed.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Apply the engine's function injections to an ALREADY-BUILT
    * session (the `spark.sql.extensions` config only takes effect at
    * session construction). Same builders as graft.GraftExtensions. */
  def registerFunctions(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    graft.GraftExtensions.functions.foreach { case (ident, info, builder) =>
      registry.registerFunction(ident, info, builder)
    }
  }
}
