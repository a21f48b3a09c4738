package graft.streaming

import org.apache.spark.sql.streaming.GroupState

/** Custom streaming state: gap-based sessionization as a
  * `flatMapGroupsWithState` function (the engine's "arbitrary stateful
  * operator" surface — what you reach for when windowed aggregation can't
  * express the semantics).
  *
  * Per user the state is ONE open session (start, end, n). Events in a
  * batch are sorted by (ms, event_id) and folded in: a gap > `gapMs`
  * closes the current session (emitted immediately, append mode) and
  * opens a new one; otherwise the session extends. The open session's
  * event-time timeout is re-armed to `end + gapMs` each batch — when the
  * watermark passes it, the session can no longer grow (any event that
  * could extend it would be late beyond the watermark) and it is emitted
  * and the state removed. State is therefore O(1) per active user and
  * self-purging — the 100 TB shape.
  *
  * Late events inside the watermark that land after a newer session
  * already started fold into that newer session (the open-session merge
  * is gap-vs-state-end, not a full re-sort of history) — the standard
  * single-state approximation; exact retro-sessionization would need the
  * full event list in state.
  */
object StatefulSessions {
  // event_ts duplicates ms as a TimestampType column: the watermark rides
  // on it, and it must survive into the grouped Dataset untyped (a typed
  // .map would erase the event-time metadata and break the timeout)
  case class SessEvent(user_id: Long, event_id: Long, ms: Long,
      event_ts: java.sql.Timestamp)
  case class SessState(start: Long, end: Long, n: Long)
  case class SessOut(user_id: Long, session_start: Long, session_end: Long,
      n_events: Long)

  def sessionize(gapMs: Long)(
      user: Long, events: Iterator[SessEvent],
      state: GroupState[SessState]): Iterator[SessOut] = {
    if (state.hasTimedOut) {
      val st = state.get
      state.remove()
      Iterator.single(SessOut(user, st.start, st.end, st.n))
    } else {
      val sorted = events.toIndexedSeq.sortBy(e => (e.ms, e.event_id))
      var closed = List.empty[SessOut]
      var cur = state.getOption
      sorted.foreach { e =>
        cur = cur match {
          case None => Some(SessState(e.ms, e.ms, 1))
          case Some(st) if e.ms - st.end > gapMs =>
            closed ::= SessOut(user, st.start, st.end, st.n)
            Some(SessState(e.ms, e.ms, 1))
          case Some(st) =>
            Some(SessState(st.start, math.max(st.end, e.ms), st.n + 1))
        }
      }
      cur.foreach { st =>
        state.update(st)
        // re-arm: fire once no in-watermark event can extend the session.
        // Clamped: event-time timeouts must be positive and at/after the
        // current watermark, so a pre-epoch session (negative end+gap)
        // would otherwise crash the query — clamping makes it fire on the
        // next watermark advance, exactly when it becomes closable anyway
        val fireAt = math.max(st.end + gapMs, state.getCurrentWatermarkMs() + 1L)
        state.setTimeoutTimestamp(math.max(fireAt, 1L))
      }
      closed.reverse.iterator
    }
  }
}
