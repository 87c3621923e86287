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
    *
    * By default the frame must contain EXACTLY ONE LogicalRDD: every
    * current caller passes the checkpoint result itself, and a future
    * caller passing a COMPOSITE frame (say, a join of two checkpointed
    * frames, one dead and one live) would otherwise silently release
    * the live frame's blocks too — unrecoverable, per above. A
    * plan-wide release must be requested explicitly via
    * `allowMultiple = true`.
    */
  def drop(df: DataFrame, allowMultiple: Boolean = false): Unit = {
    val rdds = df.queryExecution.analyzed.collect {
      case r: org.apache.spark.sql.execution.LogicalRDD => r
    }
    require(allowMultiple || rdds.size <= 1,
      s"Checkpoints.drop: plan contains ${rdds.size} LogicalRDD leaves — " +
        "dropping all of them would release blocks shared with frames " +
        "that may still be live; pass the checkpointed frame itself, or " +
        "allowMultiple = true to release plan-wide deliberately")
    rdds.foreach(_.rdd.unpersist(blocking = false))
  }
}
