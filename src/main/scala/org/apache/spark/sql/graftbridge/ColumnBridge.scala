package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column↔Expression conversion — the sanctioned
  * pattern for libraries registering custom Catalyst expressions (the public
  * `Column` API wraps ColumnNodes in Spark 4, so raw `Expression`s need this
  * hop). Lives under org.apache.spark.sql to satisfy the access qualifier.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** EAGER Column→Expression conversion. `expression` wraps non-trivial
    * ColumnNode trees in a lazy `ColumnNodeExpression` that only the
    * Dataset API path unwraps — inside a FunctionRegistry builder that
    * wrapper survives to execution and is Unevaluable. This converter
    * produces a real (unresolved) Expression tree the analyzer handles.
    */
  def eagerExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter.apply(c.node)

  /** Clear the CLASSIC companion's active/default session registry — the
    * public `org.apache.spark.sql.SparkSession.clearDefaultSession()` clears
    * the api-level holder, but `Builder.getOrCreate` consults the classic
    * one, so tests that need a genuinely fresh session (e.g. to exercise
    * `spark.sql.extensions`) must clear here.
    */
  def clearSessions(): Unit = {
    org.apache.spark.sql.classic.SparkSession.clearActiveSession()
    org.apache.spark.sql.classic.SparkSession.clearDefaultSession()
  }

  /** Re-install a session as active + default (classic registry). */
  def restoreSessions(s: org.apache.spark.sql.SparkSession): Unit = {
    val cs = s.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    org.apache.spark.sql.classic.SparkSession.setActiveSession(cs)
    org.apache.spark.sql.classic.SparkSession.setDefaultSession(cs)
  }

  /** Standard analysis-time error for a wrong-arity SQL function call —
    * surfaces as a proper `AnalysisException` (error class WRONG_NUM_ARGS)
    * instead of a raw `IllegalArgumentException` from `require`.
    */
  def wrongNumArgs(name: String, expected: Int, actual: Int): Nothing =
    throw org.apache.spark.sql.errors.QueryCompilationErrors
      .wrongNumArgsError(name, Seq(expected), actual)

  /** Register a function builder on a LIVE session (sessionState is
    * private[sql]; extension-based registration only applies at session
    * build time).
    */
  def registerFunction(spark: org.apache.spark.sql.SparkSession,
      fn: (org.apache.spark.sql.catalyst.FunctionIdentifier,
        org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
        Seq[Expression] => Expression)): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .registerFunction(fn._1, fn._2, fn._3)
}
