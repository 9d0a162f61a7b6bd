package graft.streaming

import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{Dataset, SparkSession}

/** Custom keyed state over the event stream (SURVEY.md §2.5 stateful row):
  * `flatMapGroupsWithState` tracking, per user, a running count and the
  * last-seen event — the state shape a faithful per-key poll/session
  * tracker needs. State is per key and bounded by the timeout; updates are
  * incremental per micro-batch, so state size is O(active keys), never
  * O(events).
  */
object UserState {

  final case class UserEvent(user_id: Long, event_id: Long, event_type: String, tsMicros: Long)

  final case class UserRunningState(n: Long, lastEventId: Long, lastTsMicros: Long)

  final case class UserUpdate(
      user_id: Long,
      n_events: Long,
      last_event_id: Long,
      batch_events: Long
  )

  /** One update row per (user, micro-batch): total count so far, last event
    * id, and this batch's contribution.
    */
  def runningCounts(
      spark: SparkSession,
      events: Dataset[UserEvent]
  ): Dataset[UserUpdate] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserRunningState, UserUpdate](
        OutputMode.Append(),
        GroupStateTimeout.NoTimeout()
      ) { (userId: Long, batch: Iterator[UserEvent], state: GroupState[UserRunningState]) =>
        val prev = state.getOption.getOrElse(UserRunningState(0L, -1L, Long.MinValue))
        var n = prev.n
        var lastId = prev.lastEventId
        var lastTs = prev.lastTsMicros
        var inBatch = 0L
        batch.foreach { e =>
          n += 1
          inBatch += 1
          if (e.tsMicros > lastTs || (e.tsMicros == lastTs && e.event_id > lastId)) {
            lastId = e.event_id
            lastTs = e.tsMicros
          }
        }
        state.update(UserRunningState(n, lastId, lastTs))
        if (inBatch > 0) Iterator(UserUpdate(userId, n, lastId, inBatch)) else Iterator.empty
      }
  }
}
