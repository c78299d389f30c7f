package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event sessionization: gap-based session assignment per user via
  * window functions (lag + running sum), then per-session aggregation.
  * One shuffle on user_id; the window sort rides the same partitioning.
  * The streaming twin is `flatMapGroupsWithState` keyed on user with a
  * session-gap timeout — same keying, same state shape.
  */
object Sessionize {

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
