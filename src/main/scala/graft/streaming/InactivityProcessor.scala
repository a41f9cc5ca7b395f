package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
import graft.streaming.Ingest.{EventT, InactivityAlert}

/** Timer-driven inactivity detection on the arbitrary-state v2 API: emit
  * an alert for a user who goes silent for longer than `gapMs` — output
  * WITHOUT input for that key, the one streaming shape neither
  * filter/window operators nor input-driven stateful processors can
  * express (they only speak when a row arrives).
  *
  * Two emission paths, both deterministic for a given event history:
  *  - a gap CLOSED by a later event (possibly in the same micro-batch —
  *    replays and backfills compress batches, so this must not depend on
  *    a timer having fired in between) is detected in `handleInputRows`
  *    by walking the key's event times in order; `silent_ms` is the
  *    observed gap;
  *  - a gap still OPEN when the watermark passes lastSeen + gapMs fires
  *    the single re-armed event-time timer; the true silence is
  *    unbounded (no event since), so `silent_ms` reports the gap
  *    threshold itself rather than a watermark-position-dependent value
  *    that would differ between live and replay runs. State clears on
  *    the timer alert, so a returning user starts a fresh baseline.
  *
  * Event-time timers keep the operator replay/backfill-safe and
  * test-drivable (NOTES invariant: processing-time timers schedule
  * continuous batches).
  */
class InactivityProcessor(gapMs: Long)
    extends StatefulProcessor[Long, EventT, InactivityAlert] {

  @transient private var lastSeen: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    lastSeen = getHandle.getValueState[Long]("lastSeen",
      Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(user: Long, inputRows: Iterator[EventT],
                               timerValues: TimerValues): Iterator[InactivityAlert] = {
    val times = inputRows.map(_.ts / 1000000L).toArray.sorted
    var prev = if (lastSeen.exists()) Some(lastSeen.get()) else None
    val closed = Seq.newBuilder[InactivityAlert]
    times.foreach { t =>
      prev match {
        // STRICTLY longer than gapMs: exactly-gap spacing is
        // still-active, matching the class doc and Sessionize's
        // strict split (diff > gap ⇒ same session at equality) — the
        // two operators must agree on whether a user was ever inactive
        case Some(p) if t - p > gapMs =>
          closed += InactivityAlert(user, p, t - p)
        case _ => ()
      }
      prev = Some(prev.fold(t)(math.max(_, t)))
    }
    prev.foreach(lastSeen.update)
    // exactly one pending deadline per key: drop stale timers, re-arm
    // (+1: the timer may fire only once silence EXCEEDS the gap)
    getHandle.listTimers().foreach(getHandle.deleteTimer)
    getHandle.registerTimer(prev.get + gapMs + 1)
    closed.result().iterator
  }

  override def handleExpiredTimer(user: Long, timerValues: TimerValues,
                                  expiredTimerInfo: ExpiredTimerInfo): Iterator[InactivityAlert] = {
    if (lastSeen.exists()) {
      val last = lastSeen.get()
      // a stale timer that raced a re-arm (deadline before lastSeen+gap)
      // must not alert a user who is in fact active; strict >: silence
      // must EXCEED the gap, mirroring the closed-gap path
      if (expiredTimerInfo.getExpiryTimeInMs() > last + gapMs) {
        lastSeen.clear()
        Iterator.single(InactivityAlert(user, last, gapMs))
      } else Iterator.empty
    } else Iterator.empty
  }
}
