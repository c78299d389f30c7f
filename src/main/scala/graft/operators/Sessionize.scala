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
  /** Per-user state across micro-batches: the open session, or — after
    * a close with no new open session — a counter-only marker
    * (nEvents = 0) preserving the session numbering. */
  case class SessState(sessIdx: Long, nEvents: Long, startNs: Long, lastTs: Long)
  case class Session(user_id: Long, sess_idx: Long, n_events: Long,
                     start_ns: Long, end_ns: Long)

  /** `event_id` marking end-of-stream for its user: flushes the open
    * session. A bounded run appends one sentinel per user as the last
    * input file; a 24×7 deployment never sends one. */
  val EndOfStream: Long = -1L

  /** Streaming gap sessionization via `flatMapGroupsWithState`, correct
    * across ANY micro-batch split of the input:
    *  - closed sessions emit as a later event exceeds the gap;
    *  - the open session STAYS in state with an event-time timeout at
    *    lastTs + gap — when the watermark passes it, the timeout fires
    *    and emits it (no per-batch flush, so a session spanning a
    *    batch boundary emits exactly once);
    *  - an [[EndOfStream]] sentinel event flushes its user's open
    *    session (how a bounded run drains trailing sessions);
    *  - after any close, a counter-only state keeps per-user session
    *    numbering monotone.
    * Input needs a `ts_w` watermark: callers go through [[withEventTime]]. */
  def byGapStreaming(events: DataFrame, gapNanos: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    withEventTime(events)
      .as[SessEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[SessEvent], state: GroupState[SessState]) =>
          val out = Vector.newBuilder[Session]
          def close(cur: SessState): SessState = {
            out += Session(uid, cur.sessIdx, cur.nEvents, cur.startNs, cur.lastTs)
            SessState(cur.sessIdx + 1, 0L, 0L, 0L) // counter-only
          }
          if (state.hasTimedOut) {
            // the gap elapsed in event time: the open session closes
            state.update(close(state.get))
          } else {
            val sorted = it.toArray.sortBy(e => (e.ts, e.event_id))
            var cur = state.getOption.orNull
            for (e <- sorted) {
              if (e.event_id == EndOfStream) {
                if (cur != null && cur.nEvents > 0) cur = close(cur)
              } else {
                if (cur == null) cur = SessState(1L, 1L, e.ts, e.ts)
                else if (cur.nEvents == 0) // resume after counter-only
                  cur = SessState(cur.sessIdx, 1L, e.ts, e.ts)
                else if (e.ts - cur.lastTs > gapNanos)
                  cur = close(cur).copy(nEvents = 1L, startNs = e.ts, lastTs = e.ts)
                else
                  cur = cur.copy(nEvents = cur.nEvents + 1, lastTs = e.ts)
              }
            }
            if (cur != null) {
              state.update(cur)
              if (cur.nEvents > 0) {
                // event-time alarm at lastTs+gap, CEILED to the next
                // whole millisecond — floor-truncating each term could
                // fire the timeout up to ~2ms early and close a session
                // a boundary event would still extend (clamped above
                // the watermark: if the gap already elapsed globally,
                // fire in the next batch)
                val due = (cur.lastTs + gapNanos) / 1000000L + 1
                state.setTimeoutTimestamp(math.max(due, state.getCurrentWatermarkMs() + 1))
              }
            }
          }
          out.result().iterator
      }
  }

  /** Project (user_id, event_id, ts) plus the `ts_w` event-time
    * column (ts is ns → µs precision) and a zero-delay watermark —
    * the event-time clock the session timeouts run on. */
  def withEventTime(events: DataFrame): DataFrame =
    events
      .select(col("user_id"), col("event_id"), col("ts"),
        // integral `div`: `/` on longs is double division, and a
        // double's 53-bit mantissa cannot hold epoch-scale nanos
        timestamp_micros(expr("ts div 1000")).as("ts_w"))
      .withWatermark("ts_w", "0 seconds")

  /** Stage a bounded MULTI-BATCH input for [[byGapStreaming]]: the
    * events time-split into `splits` files plus one [[EndOfStream]]
    * sentinel row per user as a strictly-later file. Modification
    * times are ordered so a file-source with maxFilesPerTrigger=1
    * replays them as separate micro-batches in time order — sessions
    * spanning a split boundary must survive in state, which is exactly
    * the behavior a single-batch flush would get wrong. */
  def stageBoundedInput(events: DataFrame, dir: String, splits: Int = 2): Unit = {
    val schema = events.schema
    val cuts: Seq[Long] =
      if (splits <= 1) Nil
      else events.select(col("ts").cast("double").as("d"))
        .stat.approxQuantile("d", (1 until splits).map(_.toDouble / splits).toArray, 0.001)
        .map(_.toLong).toSeq
    val bounds = (Long.MinValue +: cuts) :+ Long.MaxValue
    bounds.sliding(2).zipWithIndex.foreach { case (Seq(lo, hi), i) =>
      events.filter(col("ts") > lo && col("ts") <= hi)
        .coalesce(1).write.mode("overwrite").parquet(f"$dir/b$i%03d.parquet")
    }
    val sentinel = schema.fields.foldLeft(events.select("user_id").distinct()) {
      (df, f) => f.name match {
        case "user_id"  => df
        case "event_id" => df.withColumn("event_id", lit(EndOfStream).cast(f.dataType))
        case "ts"       => df.withColumn("ts", lit(Long.MaxValue / 4).cast(f.dataType))
        case other      => df.withColumn(other, lit(null).cast(f.dataType))
      }
    }.select(schema.fieldNames.map(col): _*)
    sentinel.coalesce(1).write.mode("overwrite").parquet(f"$dir/b$splits%03d.parquet")
    val now = System.currentTimeMillis()
    def touch(p: String, t: Long): Unit = {
      val d = new java.io.File(p)
      (Option(d.listFiles()).toList.flatten :+ d).foreach(_.setLastModified(t))
    }
    (0 to splits).foreach(i =>
      touch(f"$dir/b$i%03d.parquet", now - (splits - i).toLong * 600000L))
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
