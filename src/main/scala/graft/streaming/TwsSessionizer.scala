package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** [[StatefulSessionizer]] re-expressed on Spark 4's arbitrary-state API v2
  * (`transformWithState` + `StatefulProcessor`, SPARK-45939 line): the same
  * gap/duration-cap/event-time-timeout session lifecycle, with the GroupState
  * idioms mapped onto their v2 counterparts —
  *
  *   - `GroupState.update/remove`      → a named [[ValueState]] handle
  *   - `setTimeoutTimestamp(ms)`       → `registerTimer(ms)` (after clearing
  *                                       the previous horizon: v2 timers are
  *                                       multi-shot registrations, not a
  *                                       single mutable slot, so re-timing
  *                                       must delete the stale one)
  *   - `hasTimedOut` branch            → `handleExpiredTimer`
  *
  * The session semantics are IDENTICAL by construction — the per-key fold is
  * the same code shape — and StreamingSpec drives both implementations
  * through the same scenario and asserts equal closed-session sets. State
  * per user stays O(1) plus one timer, evicted by the event-time watermark,
  * so the 100 TB posture matches the v1 operator (the v2 API additionally
  * unlocks RocksDB-only features — per-state TTL, state repartitioning — the
  * v1 API cannot express; this engine keeps TTL off because the watermark
  * timer already bounds state lifetime).
  *
  * Runtime requirement: transformWithState only runs on the RocksDB state
  * store provider; [[sessionize]] callers set it per query via
  * `spark.sql.streaming.stateStore.providerClass` (the suite does this in
  * its scenario run — the engine's other streaming queries stay on the
  * default HDFS-backed provider, where they measure faster at oracle scale).
  */
object TwsSessionizer {
  import StatefulSessionizer.{ClosedSession, Event, SessionState}

  class SessionProcessor(gapSeconds: Long, maxDurationSeconds: Long)
      extends StatefulProcessor[String, Event, ClosedSession] {
    @transient private var state: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SessionState]("session",
        Encoders.product[SessionState], TTLConfig.NONE)

    private def close(u: String, s: SessionState, reason: String): ClosedSession =
      ClosedSession(u, s.start_sec, s.last_sec, s.last_sec - s.start_sec,
        s.events, s.purchases, s.revenue, reason)

    override def handleInputRows(user: String, rows: Iterator[Event],
                                 timers: TimerValues): Iterator[ClosedSession] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts_sec, e.event_type))
      var cur    = if (state.exists()) Some(state.get()) else None
      val closed = List.newBuilder[ClosedSession]
      def purchases(e: Event) = if (e.event_type == "purchase") 1L else 0L
      def revenue(e: Event)   = if (e.event_type == "purchase") e.purchase_amount else 0.0
      sorted.foreach { e =>
        cur match {
          case Some(s) if e.ts_sec < s.start_sec - gapSeconds =>
            // far-backward late: its own single-event session (see the v1
            // scaladoc for why bridging would violate the gap rule)
            closed += ClosedSession(user, e.ts_sec, e.ts_sec, 0, 1,
              purchases(e), revenue(e), "late")
          case other =>
            other match {
              case Some(s) if e.ts_sec - s.last_sec > gapSeconds =>
                closed += close(user, s, "gap"); cur = None
              case Some(s) if e.ts_sec - s.start_sec > maxDurationSeconds =>
                closed += close(user, s, "max_duration"); cur = None
              case _ => ()
            }
            cur = Some(cur match {
              case Some(s) => SessionState(
                math.min(s.start_sec, e.ts_sec), math.max(s.last_sec, e.ts_sec),
                s.events + 1, s.purchases + purchases(e), s.revenue + revenue(e))
              case None => SessionState(e.ts_sec, e.ts_sec, 1, purchases(e), revenue(e))
            })
            cur = cur.flatMap { s =>
              if (s.last_sec - s.start_sec > maxDurationSeconds) {
                closed += close(user, s, "max_duration"); None
              } else Some(s)
            }
        }
      }
      // re-time the eviction horizon: delete any stale registration first
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      cur match {
        case Some(s) =>
          state.update(s)
          getHandle.registerTimer((s.last_sec + gapSeconds) * 1000)
        case None => state.clear()
      }
      closed.result().iterator
    }

    override def handleExpiredTimer(user: String, timers: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[ClosedSession] = {
      val out = if (state.exists()) List(close(user, state.get(), "timeout")) else Nil
      state.clear()
      out.iterator
    }
  }

  def sessionize(events: Dataset[Event], gapSeconds: Long = 1800,
                 maxDurationSeconds: Long = 7200): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("event_time", "1 hour")
      .as[Event]
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapSeconds, maxDurationSeconds),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
