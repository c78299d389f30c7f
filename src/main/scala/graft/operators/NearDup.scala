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
  * State growth is |corpus|·4 band rows (16 bytes each) — a real
  * deployment bounds it with watermark/TTL eviction (dedup against a
  * sliding crawl window) or periodic compaction into
  * [[graft.pipeline.Dedup.incrementalDedup]]'s bloom-gated batch path.
  */
object NearDup {

  /** Per-band verdicts for a streaming (doc_id, simhash) frame:
    * emits (doc_id, band_dup) per band; a doc is a near-dup iff ANY
    * band verdict is true (aggregate after the sink — chaining a
    * second stateful op onto append-mode fMGWS is not needed). */
  def byBandStreaming(docsWithSimhash: DataFrame, maxDist: Int = 3): DataFrame = {
    require(maxDist <= 3,
      s"4×16-bit bands guarantee recall only for maxDist <= 3, got $maxDist")
    val spark = docsWithSimhash.sparkSession
    import spark.implicits._
    val banded = docsWithSimhash.select(col("doc_id"), col("simhash"),
        explode(array((0 until 4).map(b =>
          concat(lit(b + ":"),
            shiftright(col("simhash"), b * 16).bitwiseAND(lit(0xffffL)).cast("string"))): _*))
          .as("bkey"))
      .as[(Long, Long, String)]
    banded.groupByKey(_._3)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, it: Iterator[(Long, Long, String)],
         state: GroupState[List[(Long, Long)]]) =>
          val seen = state.getOption.getOrElse(Nil)
          // within-batch order must not matter: compare by doc_id
          val batch = it.map(r => (r._1, r._2)).toList.sortBy(_._1)
          var hist = seen
          val out = batch.map { case (id, sh) =>
            val dup = hist.exists { case (eid, esh) =>
              eid < id && java.lang.Long.bitCount(esh ^ sh) <= maxDist
            }
            hist = (id, sh) :: hist
            (id, dup)
          }
          state.update(hist)
          out.iterator
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
    * verdicts, post-sink OR-aggregation → (doc_id, is_dup). */
  def run(spark: SparkSession, docs: DataFrame, maxDist: Int = 3,
          splits: Int = 3): DataFrame = {
    val in = java.nio.file.Files.createTempDirectory("graft_neardup").toString
    stageDocs(docs, in, splits)
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$in/*.parquet")
    val verdicts = byBandStreaming(graft.pipeline.Dedup.simhash(stream), maxDist)
    val name = "stream_neardup_sink_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val q = verdicts.writeStream.format("memory").queryName(name)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name)
      .groupBy("doc_id").agg(max(col("band_dup")).as("is_dup"))
  }
}
