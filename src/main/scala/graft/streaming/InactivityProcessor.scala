package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
import graft.streaming.Ingest.{EventT, InactivityAlert}

/** Timer-driven inactivity detection on the arbitrary-state v2 API: emit
  * an alert for a user who goes silent for longer than `gap` — output
  * WITHOUT input for that key, the one streaming shape neither
  * filter/window operators nor input-driven stateful processors can
  * express (they only speak when a row arrives).
  *
  * Per key: a `ValueState[Long]` holds the last-seen event time (ms); on
  * input the single pending timer is re-armed to lastSeen + gap; when the
  * WATERMARK crosses an un-re-armed deadline, `handleExpiredTimer` fires
  * once, emits the alert, and clears the state — so the alert doubles as
  * state eviction and a returning user starts a fresh baseline. Event-time
  * timers keep the operator replay/backfill-safe and test-drivable
  * (NOTES invariant: processing-time timers schedule continuous batches).
  */
class InactivityProcessor(gapMs: Long)
    extends StatefulProcessor[Long, EventT, InactivityAlert] {

  @transient private var lastSeen: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    lastSeen = getHandle.getValueState[Long]("lastSeen",
      Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(user: Long, inputRows: Iterator[EventT],
                               timerValues: TimerValues): Iterator[InactivityAlert] = {
    val maxTsMs = inputRows.map(_.ts / 1000000L).max
    val newLast = if (lastSeen.exists()) math.max(lastSeen.get(), maxTsMs) else maxTsMs
    lastSeen.update(newLast)
    // exactly one pending deadline per key: drop stale timers, re-arm
    getHandle.listTimers().foreach(getHandle.deleteTimer)
    getHandle.registerTimer(newLast + gapMs)
    Iterator.empty
  }

  override def handleExpiredTimer(user: Long, timerValues: TimerValues,
                                  expiredTimerInfo: ExpiredTimerInfo): Iterator[InactivityAlert] = {
    if (lastSeen.exists()) {
      val last = lastSeen.get()
      // a stale timer that raced a re-arm (deadline before lastSeen+gap)
      // must not alert a user who is in fact active
      if (expiredTimerInfo.getExpiryTimeInMs >= last + gapMs) {
        lastSeen.clear()
        Iterator.single(InactivityAlert(user, last,
          timerValues.getCurrentWatermarkInMs() - last))
      } else Iterator.empty
    } else Iterator.empty
  }
}
