package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.{Column, SparkSession}

/** Session-scoped VARIADIC function registration.
  *
  * Why this package: `SparkSessionExtensions.injectFunction` only applies
  * while a SparkSession is being BUILT, and `session.udf.register` keys on
  * the bare name — a second arity replaces the first. The engine needs
  * SQLite's variadic scalars (`date(t)`, `date(t, mod)`, `date(t, m1,
  * m2)`, …) on its PRIVATE child session (GraftDb catalog isolation),
  * which already exists by the time the engine sees it. The function
  * registry's `createOrReplaceTempFunction` accepts exactly the
  * arity-dispatching builder this needs but is `private[sql]` — hence
  * this one deliberate shim. Everything the builders produce is ordinary
  * public-API material (column operations and `functions.udf` values). */
object SessionFunctions {

  /** Register `name` with an arity-dispatching builder over Columns. */
  def register(session: SparkSession, name: String,
               build: Seq[Column] => Column): Unit = {
    val cs = session.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    cs.sessionState.functionRegistry.createOrReplaceTempFunction(
      name,
      (children: Seq[Expression]) =>
        // the session's converter turns the ColumnNode tree the public
        // Column ops build back into a real catalyst Expression
        cs.expression(build(children.map(ExpressionUtils.column))),
      "scala_udf")
  }

  /** Register `name` with a raw catalyst-Expression builder — needed when
    * the output must be a CONCRETE node (e.g. shadowing a builtin like
    * `min`: a by-name Column op would resolve straight back to this very
    * registration and never terminate). */
  def registerExpr(session: SparkSession, name: String,
                   build: Seq[Expression] => Expression): Unit =
    session.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.createOrReplaceTempFunction(
        name, build, "built-in")

  /** Register a variadic string-typed function: every argument casts to
    * STRING (SQLite's date/time functions read numeric time values
    * identically through their text rendering); NULL handling lives in
    * the per-arity UDFs. */
  def registerStrVarargs(session: SparkSession, name: String,
                         fns: Map[Int, UserDefinedFunction]): Unit =
    register(session, name, { cols =>
      val f = fns.getOrElse(cols.size,
        throw new IllegalArgumentException(
          s"wrong number of arguments to function $name()"))
      f(cols.map(_.cast("string")): _*)
    })
}
