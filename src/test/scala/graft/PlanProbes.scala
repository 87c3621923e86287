package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Shared executed-plan probes for the plan-shape specs.
  *
  * CRITICAL detail learned in round 15: `AdaptiveSparkPlanExec` is a
  * LEAF node — `df.queryExecution.executedPlan.collect {...}` on an
  * AQE plan matches NOTHING below the root, so a "no WindowExec"
  * assert written that way passes vacuously (Round13/14 shipped
  * exactly that bug; the round-15 rewrite routes every probe through
  * [[finalPlan]]/[[collectAll]], which unwrap the adaptive root and
  * any nested adaptive subtrees).
  */
object PlanProbes {

  /** Executes `df` (noop sink, so final sorts/projections stay in the
    * measured plan) and returns the POST-EXECUTION adaptive final
    * plan.
    */
  def finalPlan(df: DataFrame): SparkPlan = {
    df.write.format("noop").mode("overwrite").save()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  /** `collect` that also recurses through nested AdaptiveSparkPlanExec
    * roots (cached relations / reused subqueries carry their own).
    */
  def collectAll[T](plan: SparkPlan)(
      pf: PartialFunction[SparkPlan, T]): Seq[T] = {
    val here = plan.collect {
      case p if pf.isDefinedAt(p) => Seq(pf(p))
      case a: AdaptiveSparkPlanExec => collectAll(a.executedPlan)(pf)
    }.flatten
    // the root itself can be nested-adaptive AND match pf; plan.collect
    // above visits every node exactly once, so no double count
    here
  }
}
