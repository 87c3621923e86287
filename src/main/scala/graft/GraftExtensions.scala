package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import graft.functions.RollingWinnow

/** Session extensions registering the engine's custom Catalyst
  * expressions for SQL use. Attach with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`; after that
  * `SELECT rolling_winnow(text, 8, 4) FROM docs` plans natively.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("rolling_winnow"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[RollingWinnow].getName, "rolling_winnow"),
      (args: Seq[Expression]) => {
        def intArg(e: Expression, default: Int): Int = e match {
          case Literal(v: Int, _) => v
          case _ => default
        }
        val k = if (args.length > 1) intArg(args(1), 8) else 8
        val w = if (args.length > 2) intArg(args(2), 4) else 4
        RollingWinnow(args.head, k, w)
      }))
  }
}

object GraftExtensions {
  /** Imperative registration for an already-built session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_winnow",
      (args: Seq[Expression]) => {
        val k = args.lift(1).collect { case Literal(v: Int, _) => v }.getOrElse(8)
        val w = args.lift(2).collect { case Literal(v: Int, _) => v }.getOrElse(4)
        RollingWinnow(args.head, k, w)
      },
      "built-in")
}
