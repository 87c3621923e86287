package graft.operators

import org.apache.spark.sql.DataFrame

/** Explicit lifecycle for eager-localCheckpoint INTERMEDIATES inside
  * iterative operators (pointer-doubling CC, Lloyd iterations, tree
  * closure): each round checkpoints a new frame and the previous
  * round's blocks become dead — in a long-lived session they would
  * otherwise accumulate until the session GCs, which is exactly the
  * cross-query interference the bench harness had to scrub
  * (Bench.scala). Operators drop their own dead intermediates instead
  * of relying on the harness.
  *
  * Checkpoints that ARE (or feed) an operator's return value must NOT
  * be dropped here — the session-lifetime contract applies to those:
  * the consumer (or the harness) owns their release.
  */
private[graft] object Checkpoints {

  /** Unpersist the block-manager storage behind a localCheckpoint
    * result. ONLY for frames no consumer will ever touch again: a
    * local checkpoint's lineage is truncated, so once its blocks are
    * dropped the frame is unrecoverable (re-reading it throws, it
    * does not recompute).
    */
  def drop(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case r: org.apache.spark.sql.execution.LogicalRDD =>
        r.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
