package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import graft.etl.FixtureLoader.spark

/** Proof that q73 exercises what it claims: under
  * [[graft.QueriesCore.withSkewSplitConfs]] the planted-skew join is
  * planned as a sort-merge join whose hot partition AQE actually
  * SPLITS (`OptimizeSkewedJoin`), and the split changes no results.
  * Without this assertion the query could silently degrade into the
  * q71 broadcast regime (as it does under default confs at small sf)
  * and the "skew splitting measured" claim would be hollow.
  */
class AqeSkewSpec extends AnyFunSuite {

  // sf0.01: the hot key's post-shuffle partition (~15k rows, a few
  // hundred KB) clears the lowered 64 KB threshold; at sf0.001 it
  // would sit UNDER it (~30 KB) and nothing would split
  private val sf = "/root/testdata/sf0.01"

  /** Every node of an EXECUTED adaptive plan. Plain `collect` stops at
    * query-stage boundaries (QueryStageExec keeps its executed subtree
    * in `plan`, not `children`; AdaptiveSparkPlanExec likewise), so
    * the join inside a ResultQueryStage is invisible to it.
    */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case _ => p.children
    }
    p +: kids.flatMap(flatten)
  }

  test("q73 final plan contains a skew-split sort-merge join") {
    // the executed plan must be read INSIDE the conf scope and AFTER
    // an action on the SAME Dataset: queryExecution is lazy (planned
    // outside the scope it would see restored confs and broadcast),
    // and the initial adaptive plan shows no skew handling —
    // OptimizeSkewedJoin is a runtime re-plan
    val plan = graft.QueriesCore.withSkewSplitConfs(spark) {
      // the exact join q73 runs, BEFORE the aggregate tail: the skewed
      // stage itself, executed under the lowered thresholds
      val joined = graft.QueriesCore.skewSplitJoined(spark, sf)
      joined.collect() // Dataset.collect drives joined.queryExecution itself
      joined.queryExecution.executedPlan
    }
    val smjs = flatten(plan).collect { case j: SortMergeJoinExec => j }
    assert(smjs.nonEmpty,
      s"expected a sort-merge join (broadcast disabled), got:\n$plan")
    assert(smjs.exists(_.isSkewJoin),
      s"no skew-split SMJ in the final adaptive plan — thresholds did " +
        s"not trip; plan:\n$plan")
  }

  test("q73 equals the plain-join result (skew split changes no rows)") {
    val expected = graft.QueriesCore.q71PlainJoinAqe(spark, sf)
    val actual = graft.QueriesCore.q73SkewSplitJoin(spark, sf)
    assert(actual.exceptAll(expected).isEmpty &&
      expected.exceptAll(actual).isEmpty,
      "skew-split result differs from plain join")
    Checkpoints.drop(actual) // q73 returns a localCheckpoint; release it
  }
}
