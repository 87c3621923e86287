package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import scala.collection.mutable.ArrayBuffer

/** Streaming TWAP intervals (§2.10 "custom state" applied to the
  * metering/finance aggregate): each user's value stream becomes
  * completed (value, duration) intervals as events arrive — state is
  * ONE tuple per user (last ts/id/value), and every new event closes
  * exactly the interval the batch q216 lag-sweep would produce, so N
  * micro-batches compose to the identical answer (the q86 ≡ q67
  * batch-drives-stream discipline).
  *
  * The exactness-critical aggregation (Σ v·Δt needs >64 bits) is NOT
  * done in state — the stateful operator emits raw intervals and the
  * reader folds them with decimal(38) sums, so state stays three
  * longs per key forever.
  *
  * Ordering contract: per user, events must not arrive ts-descending
  * ACROSS micro-batches (within a batch they are sorted here); a
  * regressing timestamp would close a negative interval. The one
  * arrival-order-sensitive streaming query, like q105 — arrival order
  * is pinned by the harness for exactly this reason.
  */
object TwapStream {
  import EventsStream.Event

  case class TwapState(lastTs: Long, lastId: Long, lastV: Long)
  case class Interval(user_id: Long, v_micros: Long, dt_micros: Long)

  /** Full-precision epoch micros (Timestamp.getTime truncates to ms;
    * the testdata carries real microseconds).
    */
  private def micros(t: java.sql.Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000

  def intervals(events: Dataset[Event]): Dataset[Interval] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[TwapState, Interval](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        case (uid, it, state: GroupState[TwapState]) =>
          val sorted = it.toSeq.sortBy(e => (micros(e.ts), e.event_id))
          val out = ArrayBuffer.empty[Interval]
          var st = state.getOption.orNull
          for (e <- sorted) {
            val t = micros(e.ts)
            // same quantization as the batch q216: floor(v·10⁶) on the
            // identical double, once, at ingestion
            val v = math.floor(e.value * 1000000.0).toLong
            if (st != null) out += Interval(uid, st.lastV, t - st.lastTs)
            st = TwapState(t, e.event_id, v)
          }
          if (st != null) state.update(st)
          out.iterator
      }
  }
}
