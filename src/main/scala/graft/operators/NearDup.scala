package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-duplicate detection over a document stream — the
  * online counterpart of [[graft.pipeline.Dedup.simhashPairs]]: as
  * docs arrive, each is flagged against everything seen EARLIER
  * (smaller doc_id), so a crawl pipeline can drop near-dups without
  * re-running batch dedup per snapshot.
  *
  * State sharding is the scale design: the 64-bit simhash splits into
  * 4×16-bit bands, each doc registers in 4 band buckets, and
  * flatMapGroupsWithState keys state on the BUCKET — so state lookups
  * and updates shard across the cluster by bucket, never a global
  * seen-set. Pigeonhole gives exact recall at Hamming ≤ 3 (some band
  * must collide); verification inside the bucket is the exact bit
  * count. The dup criterion is by doc_id order, not arrival order, so
  * results are batching-invariant (asserted by the oracle replay,
  * which knows nothing about micro-batches).
  *
  * State bounding: with `horizonSec` set, docs dedup against a sliding
  * event-time window (dup ⇔ an earlier doc within the horizon shares a
  * band at Hamming ≤ maxDist) and band entries are EVICTED once the
  * watermark proves no future doc can still match them (future event
  * times are ≥ watermark, and a match needs entry_ts ≥ doc_ts −
  * horizon, so an entry is dead once entry_ts + horizon < watermark) —
  * state holds one horizon's worth of docs ×4 bands, not the corpus.
  * Idle buckets clear fully via EventTimeTimeout. Eviction is
  * conservative (only provably-dead entries go), so the windowed
  * verdicts stay batching-invariant. Without `horizonSec` the seen-set
  * is unbounded (full-history semantics); on an unbounded crawl use
  * the horizon plus a periodic batch sweep of the expired archive
  * through [[graft.pipeline.Dedup.incrementalDedup]]'s bloom-gated
  * path, which [[runWithArchive]] composes end-to-end.
  */
object NearDup {

  /** Per-band verdicts for a streaming (doc_id, simhash[, ets]) frame:
    * emits (doc_id, band_dup) per band; a doc is a near-dup iff ANY
    * band verdict is true (aggregate after the sink — chaining a
    * second stateful op onto append-mode fMGWS is not needed).
    * With `horizonSec` set the input must carry an `ets` timestamp
    * column with a watermark already applied; the dup test is then
    * window-scoped and state is watermark-evicted (see class doc). */
  def byBandStreaming(docsWithSimhash: DataFrame, maxDist: Int = 3,
                      horizonSec: Option[Long] = None): DataFrame = {
    require(maxDist <= 3,
      s"4×16-bit bands guarantee recall only for maxDist <= 3, got $maxDist")
    val spark = docsWithSimhash.sparkSession
    import spark.implicits._
    val withTs =
      if (horizonSec.isDefined) docsWithSimhash.select(col("doc_id"), col("simhash"), col("ets"))
      else docsWithSimhash.select(col("doc_id"), col("simhash"),
        lit(null).cast("timestamp").as("ets"))
    val banded = withTs.select(col("doc_id"), col("simhash"), col("ets"),
        explode(array((0 until 4).map(b =>
          concat(lit(b + ":"),
            shiftright(col("simhash"), b * 16).bitwiseAND(lit(0xffffL)).cast("string"))): _*))
          .as("bkey"))
      .as[(Long, Long, java.sql.Timestamp, String)]
    val horizonMs = horizonSec.map(_ * 1000L)
    val timeout =
      if (horizonSec.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    banded.groupByKey(_._4)
      .flatMapGroupsWithState(OutputMode.Append, timeout) {
        (_: String, it: Iterator[(Long, Long, java.sql.Timestamp, String)],
         state: GroupState[List[(Long, Long, Long)]]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val seen = state.getOption.getOrElse(Nil)
            // within-batch order must not matter: compare by doc_id
            val batch = it.map(r =>
              (r._1, r._2, Option(r._3).map(_.getTime).getOrElse(0L))).toList.sortBy(_._1)
            var hist = seen
            val out = batch.map { case (id, sh, ts) =>
              val dup = hist.exists { case (eid, esh, ets) =>
                eid < id && horizonMs.forall(h => ets >= ts - h) &&
                  java.lang.Long.bitCount(esh ^ sh) <= maxDist
              }
              hist = (id, sh, ts) :: hist
              (id, dup)
            }
            horizonMs.foreach { h =>
              // future docs arrive with event time ≥ watermark; a match
              // needs ets ≥ doc_ts − h, so ets + h < wm proves dead
              val wm = state.getCurrentWatermarkMs()
              hist = hist.filter { case (_, _, ets) => ets + h >= wm }
              if (hist.nonEmpty)
                state.setTimeoutTimestamp(hist.map(_._3).max + h + 1000L)
            }
            if (hist.isEmpty) state.remove() else state.update(hist)
            out.iterator
          }
      }
      .toDF("doc_id", "band_dup")
  }

  /** Stage `docs` as `splits` doc_id-ordered parquet files so a
    * maxFilesPerTrigger=1 stream replays them as ordered micro-batches
    * (the [[Sessionize.stageBoundedInput]] pattern for documents). */
  def stageDocs(docs: DataFrame, dir: String, splits: Int = 3): Unit = {
    val cuts: Seq[Long] =
      if (splits <= 1) Nil
      else docs.select(col("doc_id").cast("double").as("d"))
        .stat.approxQuantile("d", (1 until splits).map(_.toDouble / splits).toArray, 0.001)
        .map(_.toLong).toSeq
    val bounds = (Long.MinValue +: cuts) :+ Long.MaxValue
    bounds.sliding(2).zipWithIndex.foreach { case (Seq(lo, hi), i) =>
      docs.filter(col("doc_id") > lo && col("doc_id") <= hi)
        .coalesce(1).write.mode("overwrite").parquet(f"$dir/b$i%03d.parquet")
    }
  }

  /** End-to-end streaming run over a staged documents directory:
    * simhash computed stream-side (stateless), banded stateful
    * verdicts, post-sink OR-aggregation → (doc_id, is_dup). With
    * `horizonSec`, event time is the crawl sequence (doc_id seconds)
    * and verdicts are window-scoped with bounded state. Returns the
    * result frame plus the peak stateful-operator row count observed
    * (for state-bound assertions). */
  def runWithProgress(spark: SparkSession, docs: DataFrame, maxDist: Int = 3,
                      splits: Int = 3, horizonSec: Option[Long] = None)
      : (DataFrame, Long) = {
    val in = java.nio.file.Files.createTempDirectory("graft_neardup").toString
    stageDocs(docs, in, splits)
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$in/*.parquet")
    val sh0 = graft.pipeline.Dedup.simhash(stream)
    val sh = horizonSec match {
      // +86400: doc_id 0 at epoch 0 would sit ON the initial watermark
      // and be dropped as late; the window test is shift-invariant
      case Some(_) => sh0.withColumn("ets", timestamp_seconds(col("doc_id") + 86400L))
        .withWatermark("ets", "0 seconds")
      case None => sh0
    }
    val verdicts = byBandStreaming(sh, maxDist, horizonSec)
    val name = "stream_neardup_sink_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val q = verdicts.writeStream.format("memory").queryName(name)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val peakState = q.recentProgress.flatMap(p =>
      Option(p.stateOperators).toSeq.flatMap(_.toSeq).map(_.numRowsTotal))
      .foldLeft(0L)(math.max)
    val out = StreamStage.reap(spark, name, in)(
      spark.table(name).groupBy("doc_id").agg(max(col("band_dup")).as("is_dup")))
    (out, peakState)
  }

  def run(spark: SparkSession, docs: DataFrame, maxDist: Int = 3,
          splits: Int = 3, horizonSec: Option[Long] = None): DataFrame =
    runWithProgress(spark, docs, maxDist, splits, horizonSec)._1

  /** Bounded-state streaming + expired-archive fold: full-history dup
    * semantics with horizon-bounded streaming state. The stream flags
    * dups within the horizon window; docs whose earlier matches fell
    * OUTSIDE the window are caught by a batch sweep of the expired
    * archive (every doc is archive to everything ≥ horizon later)
    * through the band join of [[graft.pipeline.Dedup.simhashPairs]] —
    * the periodic compaction a real crawl deployment schedules. The
    * sweep shuffles band-bucket candidates only, never pair-enumerates
    * the corpus. Result ≡ the unbounded-state run (asserted in spec).
    */
  def runWithArchive(spark: SparkSession, docs: DataFrame, maxDist: Int = 3,
                     splits: Int = 3, horizonSec: Long = 500L): DataFrame = {
    val windowed = run(spark, docs, maxDist, splits, Some(horizonSec))
    // archive sweep: pairs whose id gap exceeds the horizon — exactly
    // the matches the evicted state can no longer see
    val stale = graft.pipeline.Dedup.simhashPairs(docs, maxDist)
      .filter(col("b") - col("a") > horizonSec)
      .select(col("b").as("doc_id")).distinct()
      .withColumn("arch_dup", lit(true))
    windowed.join(stale, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (col("is_dup") || coalesce(col("arch_dup"), lit(false))).as("is_dup"))
  }
}
