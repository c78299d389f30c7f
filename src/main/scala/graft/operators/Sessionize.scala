package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event sessionization: gap-based session assignment per user via
  * window functions (lag + running sum), then per-session aggregation.
  * One shuffle on user_id; the window sort rides the same partitioning.
  * [[byGapStreaming]] is the streaming twin: `flatMapGroupsWithState`
  * keyed on user, state = the open session.
  */
object Sessionize {

  case class SessEvent(user_id: Long, event_id: Long, ts: Long)
  /** Open-session state carried across micro-batches. */
  case class SessState(sessIdx: Long, nEvents: Long, startNs: Long, lastTs: Long)
  case class Session(user_id: Long, sess_idx: Long, n_events: Long,
                     start_ns: Long, end_ns: Long)

  /** Streaming gap sessionization via `flatMapGroupsWithState`: the
    * per-user state is the open session; each batch's events extend or
    * close it. Closed sessions are emitted as they close. The trailing
    * open session is ALSO emitted at the end of each batch (and the
    * state cleared) — correct flush semantics for an AvailableNow /
    * bounded run like the driver's; a 24×7 deployment would instead
    * keep it in state with `EventTimeTimeout(gap)` so it emits only
    * when the gap actually elapses. */
  def byGapStreaming(events: DataFrame, gapNanos: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.select(col("user_id"), col("event_id"), col("ts")).as[SessEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[SessEvent], state: GroupState[SessState]) =>
          val sorted = it.toArray.sortBy(e => (e.ts, e.event_id))
          val out = Vector.newBuilder[Session]
          var cur = state.getOption.orNull
          for (e <- sorted) {
            if (cur == null) cur = SessState(1L, 0L, e.ts, e.ts)
            else if (e.ts - cur.lastTs > gapNanos) {
              out += Session(uid, cur.sessIdx, cur.nEvents, cur.startNs, cur.lastTs)
              cur = SessState(cur.sessIdx + 1, 0L, e.ts, e.ts)
            }
            cur = cur.copy(nEvents = cur.nEvents + 1, lastTs = e.ts)
          }
          if (cur != null) out += Session(uid, cur.sessIdx, cur.nEvents, cur.startNs, cur.lastTs)
          state.remove() // bounded-run flush (see scaladoc)
          out.result().iterator
      }
  }

  /** events(user_id, ts: Long nanos, ...) → one row per session. */
  def byGap(events: DataFrame, gapNanos: Long): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("prev_ts", lag("ts", 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ts").isNull || col("ts") - col("prev_ts") > gapNanos, 1L).otherwise(0L))
      .withColumn("sess_idx", sum("new_sess").over(run))
      .groupBy("user_id", "sess_idx")
      .agg(count(lit(1)).as("n_events"),
           min("ts").as("start_ns"),
           max("ts").as("end_ns"))
  }
}
