package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
import graft.streaming.Ingest.{Event, PctAlert}

/** Typed per-user percent-change alerting on the arbitrary-state v2 API
  * (the reference's ST3 semantics, spark_stream.py:38-46): one
  * `ValueState[Double]` holds the last seen value; rows are processed in
  * (ts, event_id) order within each batch and an alert fires when the
  * change versus the previous value exceeds the threshold.
  *
  * TTL is declared, not implemented: when a `TTLConfig` is supplied the
  * state store itself expires idle keys — compare the hand-rolled
  * watermark+timeout arithmetic the v1 `flatMapGroupsWithState` form
  * needs for the same guarantee.
  */
class PctAlertProcessor(pctThreshold: Double, ttl: Option[java.time.Duration])
    extends StatefulProcessor[Long, Event, PctAlert] {

  @transient private var lastValue: ValueState[Double] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    lastValue = getHandle.getValueState[Double]("lastValue",
      Encoders.scalaDouble, ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))

  override def handleInputRows(user: Long, inputRows: Iterator[Event],
                               timerValues: TimerValues): Iterator[PctAlert] = {
    var prev = if (lastValue.exists()) Some(lastValue.get()) else None
    val alerts = inputRows.toSeq.sortBy(e => (e.ts, e.event_id)).flatMap { e =>
      val out = prev match {
        case Some(p) if p != 0.0 =>
          val pct = (e.value - p) / p * 100.0
          if (pct > pctThreshold) Some(PctAlert(user, e.event_id, e.value, p, pct)) else None
        case _ => None
      }
      prev = Some(e.value)
      out
    }
    prev.foreach(lastValue.update)
    alerts.iterator
  }
}
