package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessorWithInitialState, TimeMode, TimerValues, TTLConfig, ValueState}
import graft.streaming.Ingest.{CountUpdate, Event}

/** State-migration pattern on the arbitrary-state v2 API: per-user
  * running event counts whose state is BOOTSTRAPPED from a batch frame
  * (the historical landing partitions) before the stream starts — the
  * production cutover where a batch-computed table hands off to a live
  * query without losing continuity. `handleInitialState` seeds each
  * user's ValueState once at query start; subsequent micro-batches
  * increment it. Emits one cumulative-count row per event, ordered by
  * (ts, event_id) WITHIN each micro-batch — per-event assignments for
  * out-of-order arrivals that span batches depend on the carving, as
  * with any streaming running count; the per-user total is carving-
  * independent. */
class BootstrapCountProcessor
    extends StatefulProcessorWithInitialState[Long, Event, CountUpdate, Long] {

  @transient private var count: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    count = getHandle.getValueState[Long]("count", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInitialState(user: Long, initial: Long,
                                  timerValues: TimerValues): Unit =
    count.update(initial)

  override def handleInputRows(user: Long, inputRows: Iterator[Event],
                               timerValues: TimerValues): Iterator[CountUpdate] = {
    var n = if (count.exists()) count.get() else 0L
    val out = inputRows.toSeq.sortBy(e => (e.ts, e.event_id)).map { e =>
      n += 1
      CountUpdate(user, e.event_id, n)
    }
    count.update(n)
    out.iterator
  }
}
