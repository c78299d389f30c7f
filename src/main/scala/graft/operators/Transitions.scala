package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming event-type transition counting — the stateful online
  * counterpart of the batch lag-window transition matrix: each user's
  * LAST event (ts, event_id, type) is the only state carried across
  * micro-batches, so a transition spanning a batch boundary is
  * counted exactly once (the case a per-batch lag would drop).
  *
  * State is one row per user (the [[Sessionize]] discipline); the
  * per-batch group iterator sorts on (ts, event_id) so intra-batch
  * arrival order never matters, and ts-ordered staging makes the
  * verdicts batching-invariant — asserted by a 1-vs-3-split test and
  * the batch SQL oracle, which knows nothing about micro-batches.
  */
object Transitions {

  /** Per-batch transition emission with per-user last-event state. */
  def byUserStreaming(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, it: Iterator[(Long, Long, Long, String)],
         state: GroupState[(Long, Long, String)]) =>
          val batch = it.toArray.sortBy(r => (r._2, r._3))
          var last = state.getOption
          val out = batch.flatMap { case (_, ts, eid, tpe) =>
            val o = last.map { case (_, _, fromTpe) => (fromTpe, tpe) }
            last = Some((ts, eid, tpe))
            o
          }
          last.foreach(state.update)
          out.iterator
      }
      .toDF("from_type", "to_type")
  }

  /** End-to-end streaming run over ts-ordered staged micro-batches →
    * (from_type, to_type, n). Staging cuts at ts quantiles, so equal
    * timestamps never split across batches and later batches hold
    * strictly later events — the order contract the state relies on. */
  def run(spark: SparkSession, events: DataFrame, splits: Int = 3): DataFrame = {
    val in = java.nio.file.Files.createTempDirectory("graft_trans").toString
    val cuts: Seq[Long] =
      if (splits <= 1) Nil
      else events.select(col("ts").cast("double").as("d"))
        .stat.approxQuantile("d", (1 until splits).map(_.toDouble / splits).toArray, 0.001)
        .map(_.toLong).toSeq
    val bounds = (Long.MinValue +: cuts) :+ Long.MaxValue
    bounds.sliding(2).zipWithIndex.foreach { case (Seq(lo, hi), i) =>
      events.filter(col("ts") > lo && col("ts") <= hi)
        .coalesce(1).write.mode("overwrite").parquet(f"$in/b$i%03d.parquet")
    }
    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$in/*.parquet")
    val pairs = byUserStreaming(stream)
    val name = "stream_transitions_sink_" +
      java.util.UUID.randomUUID.toString.replace("-", "")
    val q = pairs.writeStream.format("memory").queryName(name)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    StreamStage.reap(spark, name, in)(
      spark.table(name).groupBy("from_type", "to_type").agg(count(lit(1)).as("n")))
  }
}
