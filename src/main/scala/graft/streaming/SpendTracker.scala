package graft.streaming

import java.time.Duration

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Per-user running spend totals via `transformWithState` — the Spark 4
  * arbitrary-state API (StatefulProcessor + typed state variables +
  * native TTL), the successor to flatMapGroupsWithState used by
  * [[StreamIngest.sessionize]]. The state store keeps one
  * [[SpendState]] per user; every micro-batch folds its events into
  * the state and emits the updated running totals — the continuously-
  * maintained feature-store shape (each emission is the user's current
  * feature row).
  *
  * TTL: state untouched for `ttl` expires automatically — idle users
  * cost nothing, which is what bounds state at 100 TB-scale ingest
  * (the alternative, explicit timers per key, is the sessionize
  * pattern; TTL is the fire-and-forget variant). State is per-key in
  * the state store (RocksDB provider required by the API), so the
  * operator scales exactly like any keyed aggregation: one shuffle on
  * user_id, then per-partition state access.
  */
class SpendTracker(ttl: Duration)
    extends StatefulProcessor[Long, SessionEvent, SpendTotal] {

  @transient private var totals: ValueState[SpendState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    totals = getHandle.getValueState[SpendState](
      "totals", Encoders.product[SpendState], TTLConfig(ttl))

  override def handleInputRows(user: Long, rows: Iterator[SessionEvent],
      timerValues: TimerValues): Iterator[SpendTotal] = {
    var s = if (totals.exists()) totals.get() else SpendState(0L, 0L)
    rows.foreach { e =>
      s = SpendState(s.n_events + 1,
        s.purchases + (if (e.event_type == "purchase") 1L else 0L))
    }
    totals.update(s)
    Iterator(SpendTotal(user, s.n_events, s.purchases))
  }
}

object SpendTracker {

  /** Wire the processor over a stream of [[SessionEvent]]s. */
  def track(events: Dataset[SessionEvent],
      ttl: Duration = Duration.ofHours(24)): Dataset[SpendTotal] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new SpendTracker(ttl),
        TimeMode.ProcessingTime(), OutputMode.Update(),
        Encoders.product[SpendTotal])
  }
}

/** Running per-user totals held in the state store. */
case class SpendState(n_events: Long, purchases: Long)

/** One emitted feature row: the user's totals as of this micro-batch. */
case class SpendTotal(user_id: Long, n_events: Long, purchases: Long)
