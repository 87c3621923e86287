package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming analog of [[graft.operators.Errors.accumulate]]: the
  * reference's error table is maintained by a 4-hour daemon
  * (umn_data_error.py find_or_create per occurrence); as a stream the
  * accumulated row is keyed state per content-addressed error_id,
  * updated incrementally by mapGroupsWithState. In a stream there are
  * no "runs", so first_seen/last_seen track occurrence event time
  * (min/max seen) rather than the batch cycle timestamp — the same
  * monotone contract: first_seen never moves once set, last_seen only
  * forward, count only up.
  *
  * State size is O(distinct error ids) × a few longs — error spaces
  * are content-addressed and bounded by the distinct-anomaly count,
  * not the occurrence volume, so this state comfortably fits the
  * store. For UNBOUNDED id spaces use [[accumulateWithTtl]]: an
  * event-time TTL evicts idle keys so state is bounded by the ids
  * active within the TTL horizon, not ever seen.
  */
object ErrorsStream {

  case class ErrOccurrence(error_id: String, ts: java.sql.Timestamp)

  case class ErrState(count: Long, firstSeen: Long, lastSeen: Long)

  case class ErrRow(error_id: String, count: Long,
    first_seen: java.sql.Timestamp, last_seen: java.sql.Timestamp)

  // state carries MICROseconds: Timestamp.getTime alone is millis and
  // would silently truncate parquet's microsecond event times
  private def toMicros(ts: java.sql.Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L
  private def fromMicros(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(us / 1000000L * 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }

  /** One output row per updated error id per micro-batch (Update mode);
    * the latest row per id IS the accumulated table.
    */
  def accumulate(occ: Dataset[ErrOccurrence]): Dataset[ErrRow] = {
    import occ.sparkSession.implicits._
    occ.groupByKey(_.error_id)
      .mapGroupsWithState[ErrState, ErrRow](GroupStateTimeout.NoTimeout) {
        case (id, it, state: GroupState[ErrState]) =>
          var st = state.getOption.getOrElse(
            ErrState(0L, Long.MaxValue, Long.MinValue))
          for (e <- it) {
            val t = toMicros(e.ts)
            st = ErrState(st.count + 1, math.min(st.firstSeen, t),
              math.max(st.lastSeen, t))
          }
          state.update(st)
          ErrRow(id, st.count, fromMicros(st.firstSeen),
            fromMicros(st.lastSeen))
      }
  }

  /** [[accumulate]] with an event-time state TTL: a key with no
    * occurrence for `ttl` of watermark time is EVICTED — its final
    * accumulated row flushes on expiry (the timeout branch), and a
    * later re-occurrence of the same id starts a FRESH accumulation.
    * That is the deliberate TTL contract: counts cover the TTL
    * horizon, and keyed state is bounded by the ids active within it
    * instead of growing forever with an unbounded error-id space.
    * Requires a watermark to drive expiry (`watermarkDelay` on the
    * occurrence event time).
    */
  def accumulateWithTtl(
      occ: Dataset[ErrOccurrence],
      ttl: java.time.Duration,
      watermarkDelay: String = "0 seconds"): Dataset[ErrRow] = {
    import occ.sparkSession.implicits._
    occ.withWatermark("ts", watermarkDelay)
      .groupByKey(_.error_id)
      .mapGroupsWithState[ErrState, ErrRow](GroupStateTimeout.EventTimeTimeout) {
        case (id, it, state: GroupState[ErrState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            ErrRow(id, st.count, fromMicros(st.firstSeen),
              fromMicros(st.lastSeen))
          } else {
            var st = state.getOption.getOrElse(
              ErrState(0L, Long.MaxValue, Long.MinValue))
            for (e <- it) {
              val t = toMicros(e.ts)
              st = ErrState(st.count + 1, math.min(st.firstSeen, t),
                math.max(st.lastSeen, t))
            }
            state.update(st)
            // timeout at lastSeen + ttl, clamped above the current
            // watermark: a just-under-the-wire late occurrence must not
            // try to set an already-expired timestamp (runtime error)
            state.setTimeoutTimestamp(
              math.max(st.lastSeen / 1000L + ttl.toMillis,
                state.getCurrentWatermarkMs() + 1))
            ErrRow(id, st.count, fromMicros(st.firstSeen),
              fromMicros(st.lastSeen))
          }
      }
  }
}
