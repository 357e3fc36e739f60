package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** A typed event row for the stateful streaming API (matches the events
  * table; ts as java.sql.Timestamp for the case-class Encoder). */
final case class Event(
    event_id: Long,
    ts: Timestamp,
    user_id: Long,
    event_type: String,
    value: Double)

/** Per-user running totals carried across micro-batches. */
final case class UserTotals(user_id: Long, n_events: Long, total_value: Double)

/** Custom streaming state (SURVEY §2b E7 / the Structured-Streaming
  * checklist): `flatMapGroupsWithState` over a `KeyValueGroupedDataset` —
  * the escape hatch for aggregations the built-in windowed operators can't
  * express (here: unbounded per-user running totals emitted on every
  * update).
  *
  * Scale: state lives in the state store, partitioned by group key —
  * executors hold only their keys' state; a production job bounds state
  * with a timeout (`GroupStateTimeout.ProcessingTimeTimeout` +
  * `state.setTimeoutDuration`) instead of NoTimeout.
  */
object Stateful {

  def runningUserTotals(events: Dataset[Event]): Dataset[UserTotals] = {
    implicit val stateEnc = Encoders.product[UserTotals]
    implicit val longEnc = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (uid: Long, evs: Iterator[Event], state: GroupState[UserTotals]) => {
          val prev = state.getOption.getOrElse(UserTotals(uid, 0L, 0.0))
          var n = prev.n_events
          var total = prev.total_value
          evs.foreach { e => n += 1; total += e.value }
          val next = UserTotals(uid, n, total)
          state.update(next)
          Iterator(next)
        })
  }
}
