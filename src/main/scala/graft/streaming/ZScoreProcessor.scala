package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
import graft.functions.WelfordAggregator
import graft.functions.WelfordAggregator.Moments
import graft.streaming.Ingest.{Event, ZAnomaly}

/** Incremental per-user z-score anomalies on the arbitrary-state v2 API
  * (the transformWithState twin of `Ingest.streamingZscoreAnomalies`):
  * one `ValueState[Moments]` carries the exact Welford running moments —
  * a PRODUCT-type state, exercising the typed-encoder path of the v2
  * store, not just a primitive. Events score against the state BEFORE
  * updating it (an outlier flags itself instead of masking itself);
  * alerts start once `minN` observations exist. TTL is declarative via
  * `TTLConfig` when supplied. */
class ZScoreProcessor(threshold: Double, minN: Long, ttl: Option[java.time.Duration])
    extends StatefulProcessor[Long, Event, ZAnomaly] {

  @transient private var moments: ValueState[Moments] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    moments = getHandle.getValueState[Moments]("moments",
      Encoders.product[Moments], ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))

  override def handleInputRows(user: Long, inputRows: Iterator[Event],
                               timerValues: TimerValues): Iterator[ZAnomaly] = {
    var m = if (moments.exists()) moments.get() else WelfordAggregator.zero
    val out = inputRows.toSeq.sortBy(e => (e.ts, e.event_id)).flatMap { e =>
      val alert =
        if (m.n >= minN && m.stddevPop > 0) {
          val z = m.zscore(e.value)
          if (math.abs(z) > threshold) Some(ZAnomaly(user, e.event_id, e.value, z))
          else None
        } else None
      m = WelfordAggregator.update(m, e.value)
      alert
    }
    moments.update(m)
    out.iterator
  }
}
