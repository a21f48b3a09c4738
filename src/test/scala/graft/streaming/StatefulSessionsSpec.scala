package graft.streaming

import org.apache.spark.sql.streaming.GroupState
import org.scalatest.funsuite.AnyFunSuite

import StatefulSessions.{SessEvent, SessOut, SessState, sessionize}

/** Unit pins for the sessionize state function itself — the parts a
  * full streaming drain (StreamingSpec st04) can't exercise
  * deterministically: the event-time timeout re-arm value, which must be
  * positive AND at/after the current watermark or GroupStateImpl rejects
  * it and fails the whole query (the pre-epoch hazard the batch window
  * gates were hardened against in the e02/e12 flooring fix).
  */
class StatefulSessionsSpec extends AnyFunSuite {

  /** Minimal controllable GroupState: records updates and the armed
    * timeout; validates like GroupStateImpl (positive, >= watermark).
    */
  private final class FakeState(watermarkMs: Long,
      var stateOpt: Option[SessState] = None,
      timedOut: Boolean = false) extends GroupState[SessState] {
    var armedTimeout: Option[Long] = None
    var removed = false
    override def exists: Boolean = stateOpt.isDefined
    override def get: SessState = stateOpt.get
    override def getOption: Option[SessState] = stateOpt
    override def update(s: SessState): Unit = stateOpt = Some(s)
    override def remove(): Unit = { stateOpt = None; removed = true }
    override def hasTimedOut: Boolean = timedOut
    override def setTimeoutDuration(durationMs: Long): Unit =
      throw new UnsupportedOperationException("processing-time timeout")
    override def setTimeoutDuration(duration: String): Unit =
      throw new UnsupportedOperationException("processing-time timeout")
    override def setTimeoutTimestamp(timestampMs: Long): Unit = {
      // mirror GroupStateImpl's checks: the bug under test crashed here
      require(timestampMs > 0, s"Timeout timestamp ($timestampMs) must be positive")
      require(timestampMs >= watermarkMs,
        s"Timeout timestamp ($timestampMs) cannot be earlier than the " +
          s"current watermark ($watermarkMs)")
      armedTimeout = Some(timestampMs)
    }
    override def setTimeoutTimestamp(timestampMs: Long, additionalDuration: String): Unit =
      setTimeoutTimestamp(timestampMs)
    override def setTimeoutTimestamp(timestamp: java.sql.Date): Unit =
      setTimeoutTimestamp(timestamp.getTime)
    override def setTimeoutTimestamp(timestamp: java.sql.Date, additionalDuration: String): Unit =
      setTimeoutTimestamp(timestamp.getTime)
    override def getCurrentWatermarkMs(): Long = watermarkMs
    override def getCurrentProcessingTimeMs(): Long = 0L
  }

  private def ev(user: Long, id: Long, ms: Long) =
    SessEvent(user, id, ms, new java.sql.Timestamp(ms))

  test("post-epoch session arms the timeout at end + gap") {
    val st = new FakeState(watermarkMs = 0L)
    val out = sessionize(1000L)(1L, Iterator(ev(1, 1, 5000), ev(1, 2, 5400)), st)
    assert(out.isEmpty) // session still open
    assert(st.stateOpt.contains(SessState(5000, 5400, 2)))
    assert(st.armedTimeout.contains(6400L))
  }

  test("pre-epoch session clamps the timeout instead of arming a negative one") {
    // end + gap is negative here; before the clamp this threw
    // 'Timeout timestamp must be positive' and killed the query
    val st = new FakeState(watermarkMs = 0L)
    val preEpoch = -2700000000L // ~1969-12-01
    val out = sessionize(1000L)(1L, Iterator(ev(1, 1, preEpoch)), st)
    assert(out.isEmpty)
    assert(st.stateOpt.contains(SessState(preEpoch, preEpoch, 1)))
    // the clamp contract is watermark + 1 (= 1 here), not merely "some
    // positive value" — an arbitrary positive arm would defer the
    // session's emission indefinitely
    assert(st.armedTimeout.contains(1L), st.armedTimeout)
  }

  test("timeout clamps to just past an advanced watermark") {
    // a pre-epoch session while OTHER users' events pushed the watermark
    // positive: end + gap < watermark must clamp to watermark + 1, not
    // trip GroupStateImpl's earlier-than-watermark check
    val st = new FakeState(watermarkMs = 50000L)
    val out = sessionize(1000L)(1L, Iterator(ev(1, 1, -5000)), st)
    assert(out.isEmpty)
    assert(st.armedTimeout.contains(50001L))
  }

  test("timed-out state emits the session and removes itself") {
    val st = new FakeState(watermarkMs = 10000L,
      stateOpt = Some(SessState(100, 200, 3)), timedOut = true)
    val out = sessionize(1000L)(7L, Iterator.empty, st).toSeq
    assert(out == Seq(SessOut(7, 100, 200, 3)))
    assert(st.removed && st.armedTimeout.isEmpty)
  }

  test("gap split closes the first session and re-arms on the second") {
    val st = new FakeState(watermarkMs = 0L)
    val out = sessionize(1000L)(2L,
      Iterator(ev(2, 1, 1000), ev(2, 2, 1500), ev(2, 3, 9000)), st).toSeq
    assert(out == Seq(SessOut(2, 1000, 1500, 2)))
    assert(st.stateOpt.contains(SessState(9000, 9000, 1)))
    assert(st.armedTimeout.contains(10000L))
  }
}
