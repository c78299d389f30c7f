package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media travel as opaque `binary` columns with typed metadata; decode /
  * feature-extraction runs per-partition so a real codec would be
  * initialized once per task, not once per row (the Spark-native shape
  * of a Pandas-UDF batch pipeline). The codec itself is a clearly
  * marked deterministic STUB — the container has no image/audio libs —
  * but the schema, batching, and partition layout are real and tested.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media: Array[Byte])
  case class DecodedRow(doc_id: Long, width: Int, height: Int,
                        n_bytes: Long, format: String)

  /** STUB decoder: deterministic pseudo-metadata from the byte stream.
    * A real build would replace the body with an actual codec call
    * (e.g. javax.imageio / ffmpeg) — signature and batching stay. */
  def stubDecode(bytes: Array[Byte]): (Int, Int, String) = {
    val w = 64 + (bytes.length % 640)
    val h = 48 + ((if (bytes.nonEmpty) bytes(0) & 0xff else 0) % 480)
    (w, h, "fake/raw")
  }

  /** Decode a binary media column per-partition (codec init amortized
    * across the partition's rows, like mapInPandas batches). */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition "codec handle" — the expensive init a real
      // decoder library would need exactly once per task
      val codec = stubDecode _
      rows.map { r =>
        val (w, h, fmt) = codec(r.media)
        DecodedRow(r.doc_id, w, h, r.media.length.toLong, fmt)
      }
    }
  }

  /** documents → synthetic binary media column (utf-8 bytes; stands in
    * for real image payloads), laid out for a codec stage. Parallelism
    * is a KNOB (defaults to the cluster's `defaultParallelism`), never
    * a constant — a hardcoded count would collapse a 100-TB decode
    * onto a handful of tasks. */
  def mediaOf(spark: SparkSession, docsDir: String,
              parallelism: Int = 0): Dataset[MediaRow] =
    mediaFrom(spark.read.parquet(docsDir), parallelism)

  /** (doc_id, text) rows → binary media, same layout contract. */
  def mediaFrom(docs: DataFrame, parallelism: Int = 0): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val n = if (parallelism > 0) parallelism
            else spark.sparkContext.defaultParallelism
    docs
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
      .as[MediaRow]
      .repartition(n, col("doc_id"))
  }

  /** End-to-end demo pipeline: documents → media bytes →
    * per-partition decode → typed metadata table. */
  def decodeDocuments(spark: SparkSession, docsDir: String): DataFrame =
    decode(mediaOf(spark, docsDir)).toDF()

  /** Fit decoded dimensions into a maxW×maxH box preserving aspect
    * (never upscaling) — the metadata half of a resize stage; the
    * pixel resample itself would live in the stubbed codec. */
  def resizeDims(decoded: DataFrame, maxW: Int = 224, maxH: Int = 224): DataFrame =
    decoded
      .withColumn("_scale", least(lit(maxW.toDouble) / col("width"),
        lit(maxH.toDouble) / col("height"), lit(1.0)))
      .withColumn("r_width", floor(col("width") * col("_scale")).cast("int"))
      .withColumn("r_height", floor(col("height") * col("_scale")).cast("int"))
      .drop("_scale")

  case class FrameRow(doc_id: Long, frame_idx: Long, frame_hash: Long)

  /** Frame sampling for video-shaped media: the byte stream is treated
    * as fixed-size frames and every `every`-th frame is emitted with a
    * content hash (stand-in for a decoded keyframe). Per-partition
    * iteration — one pass over the bytes, no shuffle. */
  def sampleFrames(media: Dataset[MediaRow],
                   frameBytes: Int = 1000, every: Int = 5): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val n = r.media.length
        // ceil-div: `1 + n/frameBytes` emitted a phantom zero-byte
        // frame whenever frameBytes divides n (and one for empty media)
        val nFrames = (n + frameBytes - 1) / frameBytes
        (0 until nFrames by every).iterator.map { i =>
          val from = i * frameBytes
          val until = math.min(n, from + frameBytes)
          var h = 0L
          var k = from
          while (k < until) { h = (h * 31L + (r.media(k) & 0xff)) % 1000000007L; k += 1 }
          FrameRow(r.doc_id, i.toLong, h)
        }
      }
    }
  }

  /** documents → media bytes → sampled frame table. */
  def frameDocuments(spark: SparkSession, docsDir: String): DataFrame =
    sampleFrames(mediaOf(spark, docsDir)).toDF()

  case class FeatureRow(doc_id: Long, sum_bytes: Long, n_bytes: Int,
                        n_distinct: Int, checksum: Long)

  /** Feature extraction over the raw media bytes, per-partition (the
    * "embed/extract" stage after decode in a real media pipeline —
    * model/codec handle init once per task). Features are deterministic
    * byte statistics so the oracle can replay them. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[FeatureRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val b = r.media
        var sum = 0L; var ck = 0L; var nd = 0
        val seen = new Array[Boolean](256)
        var i = 0
        while (i < b.length) {
          val v = b(i) & 0xff
          sum += v
          if (!seen(v)) { seen(v) = true; nd += 1 }
          ck = (ck * 37L + v) % 1000000007L
          i += 1
        }
        FeatureRow(r.doc_id, sum, b.length, nd, ck)
      }
    }
  }

  /** documents → media bytes → per-partition feature extraction. */
  def featureDocuments(spark: SparkSession, docsDir: String): DataFrame =
    extractFeatures(mediaOf(spark, docsDir)).toDF()
      .select(col("doc_id"),
        round(col("sum_bytes").cast("double") / col("n_bytes"), 4).as("mean_byte"),
        col("n_distinct"), col("checksum"))

  /** Exact media dedup by content hash — the first stage of every
    * image/video curation pipeline (byte-identical re-crawls, mirror
    * copies). md5 over the RAW BINARY column (codegen), one hash-keyed
    * aggregate: the media bytes themselves never shuffle — only
    * (hash, doc_id) pairs do, so 100 TB of media costs a scan plus a
    * 48-byte-per-row exchange. Keeper = min doc_id per hash. */
  def dedupMedia(media: Dataset[MediaRow]): DataFrame = {
    // one hash-partitioned window instead of aggregate+join-back: a
    // single exchange on h, and no corpus-sized build side for AQE to
    // mistakenly broadcast at scale
    val w = org.apache.spark.sql.expressions.Window.partitionBy("h")
    media.toDF().select(col("doc_id"), md5(col("media")).as("h"))
      .select(col("doc_id"),
        min("doc_id").over(w).as("keeper"),
        count(lit(1)).over(w).as("n_copies"))
      .select(col("doc_id"), col("keeper"),
        (col("doc_id") =!= col("keeper")).as("is_dup"), col("n_copies"))
  }

  /** Near-dup detection for video-shaped media via SHARED SAMPLED
    * FRAMES: two docs whose [[sampleFrames]] streams share ≥ minShared
    * frame hashes are near-dups (re-encodes, trims, and container
    * changes keep most keyframes; the standard shared-fingerprint
    * test). Scale shape = the shingle-index discipline of
    * ngramJaccard: an inverted (frame_hash → docs) index, VIRAL
    * frames (df > maxDf — intro logos, black frames) dropped before
    * pair enumeration so a hot hash can't quadratic the join; pairs
    * are counted, never re-joined to the media. */
  def frameNearDup(frames: DataFrame, minShared: Int = 2,
                   maxDf: Int = 64): DataFrame = {
    val idx = frames.select(col("frame_hash"), col("doc_id")).distinct()
    val df = idx.groupBy("frame_hash").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
    val small = idx.join(df.select("frame_hash"), "frame_hash")
    small.as("x").join(small.as("y"), "frame_hash")
      .filter(col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
