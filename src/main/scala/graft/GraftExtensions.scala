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
      GraftExtensions.buildRollingWinnow))
  }
}

object GraftExtensions {
  /** Shared builder for both registration paths. Non-literal k/w raise
    * at analysis time — silently falling back to defaults would compute
    * wrong fingerprints without any signal.
    */
  private[graft] val buildRollingWinnow: Seq[Expression] => Expression =
    (args: Seq[Expression]) => {
      def intArg(pos: Int, default: Int): Int =
        args.lift(pos).map {
          case Literal(v: Int, _) => v
          case other => throw new org.apache.spark.sql.AnalysisException(
            errorClass = "_LEGACY_ERROR_TEMP_2448",
            messageParameters = Map("errors" ->
              s"rolling_winnow argument ${pos + 1} must be an integer literal, got $other"))
        }.getOrElse(default)
      RollingWinnow(args.head, intArg(1, 8), intArg(2, 4))
    }

  /** Imperative registration for an already-built session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_winnow", buildRollingWinnow, "built-in")
}
