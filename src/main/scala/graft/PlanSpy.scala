package graft

import org.apache.spark.sql.DataFrame

/** Pre-checkpoint plan capture (round 20, VERDICT r19 item 7): many
  * queries return a checkpoint/materialization TAIL, so their
  * `.explain("formatted")` shows only `Scan ExistingRDD` and the plan
  * evidence for the operative exchanges/codegen lives in frames that
  * are truncated before the query returns. Operators pass such
  * internal frames through [[spy]] with a stable tag; when a capture
  * sink is installed (PlanDump only — never in the bench or the
  * driver contract), the frame's plan is recorded. With no sink the
  * call is a single volatile read — zero planning or execution
  * impact.
  */
object PlanSpy {
  @volatile private var sink: Option[(String, DataFrame) => Unit] = None

  def enable(f: (String, DataFrame) => Unit): Unit = sink = Some(f)
  def disable(): Unit = sink = None

  /** Report an internal frame under `tag`; identity on the frame. */
  def spy(tag: String, df: DataFrame): DataFrame = {
    sink.foreach(f => f(tag, df))
    df
  }
}
