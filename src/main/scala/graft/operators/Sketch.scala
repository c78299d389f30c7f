package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed cardinality sketches. The HyperLogLog here is fully
  * DETERMINISTIC — the hash is md5-derived and every register/estimate
  * step is exact integer or binary-fraction arithmetic — so the DuckDB
  * oracle replays the whole sketch bit-for-bit (registers pinned by an
  * integer checksum), unlike Spark's own `approx_count_distinct`
  * whose HLL++ internals are not SQL-expressible.
  */
object Sketch {

  /** HyperLogLog distinct-count estimate per group (Flajolet et al.
    * 2007): 32-bit md5-derived hash, top `p` bits pick one of m=2^p
    * registers, the register keeps the max leading-zero rank of the
    * remaining 32−p bits; estimate = α_m·m²/Σ 2^−M[j] with the
    * standard small-range linear-counting correction (V empty
    * registers → m·ln(m/V)).
    *
    * Scale story — the reason sketches exist: the per-(group, bucket)
    * `max(rank)` aggregate combines map-side, so each map task ships
    * ≤ m register rows per group no matter how many values it saw;
    * the value stream itself never shuffles. An exact
    * `countDistinct` shuffles every distinct value; this shuffles
    * 2^p · |groups| rows. Registers are exact integers and Σ 2^−M is
    * a sum of exact binary fractions, so cross-engine drift is
    * confined to the final α/ln arithmetic (4-dp policy). Returns
    * (group, hll_est, n_empty, reg_checksum) where reg_checksum =
    * Σ M[j]·(j+1) pins every register exactly. */
  def hllDistinct(df: DataFrame, groupCols: Seq[String], value: Column,
                  p: Int = 6): DataFrame =
    hllFromRegisters(hllRegisters(df, groupCols, value, p), groupCols, p)

  /** The register stage alone: per (group, bucket) max rank. A
    * STREAMING frame works too — `max` is a semilattice merge, so the
    * registers (and therefore the estimate) are independent of
    * micro-batch boundaries: the mergeability that makes sketches the
    * right distinct-count answer for both 100-TB batch AND unbounded
    * streams. */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], value: Column,
                   p: Int = 6): DataFrame = {
    require(p >= 4 && p <= 16, s"hll: p must be in [4,16], got $p")
    val wBits = 32 - p
    val h = conv(substring(md5(value.cast("string")), 1, 8), 16, 10).cast("long")
    val w = h.bitwiseAND(lit((1L << wBits) - 1))
    val gcols = groupCols.map(col)
    df.select((gcols :+ shiftright(h, wBits).as("bucket") :+
        when(w === 0, lit(wBits + 1))
          .otherwise(lit(wBits + 1) - length(bin(w))).as("rank")): _*)
      .groupBy((gcols :+ col("bucket")): _*)
      .agg(max(col("rank")).as("M"))
  }

  /** Estimate from a register table (the output of [[hllRegisters]],
    * batch or streaming-complete). */
  def hllFromRegisters(reg: DataFrame, groupCols: Seq[String], p: Int = 6): DataFrame = {
    val m = 1 << p
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1 + 1.079 / m)
    }
    val gcols = groupCols.map(col)
    val agg = reg.groupBy(gcols: _*)
      .agg(sum(pow(lit(2.0), -col("M"))).as("s"),
        count(lit(1)).as("nb"),
        sum(col("M") * (col("bucket") + 1)).cast("long").as("reg_checksum"))
      .withColumn("v", lit(m.toLong) - col("nb"))
      .withColumn("e_raw", lit(alpha * m * m) / (col("s") + (lit(m.toLong) - col("nb"))))
    agg.select((gcols :+
      round(when(col("e_raw") <= 2.5 * m && col("v") > 0,
        lit(m.toDouble) * log(lit(m.toDouble) / col("v")))
        .otherwise(col("e_raw")), 4).as("hll_est") :+
      col("v").as("n_empty") :+ col("reg_checksum")): _*)
  }

  /** Streaming HLL: replay `df` as `splits` micro-batches (staged by
    * a hash of the row so batch composition is arbitrary), maintain
    * the registers as a streaming max aggregate (complete mode — the
    * state IS the 2^p·|groups| register table, never the values),
    * and estimate from the final registers. Because register merge is
    * a max-semilattice, the result is bit-identical to the batch
    * sketch over the same rows — asserted by the driver oracle, which
    * replays the BATCH formula. */
  def hllStreaming(df: DataFrame, groupCols: Seq[String], value: Column,
                   p: Int = 6, splits: Int = 3): DataFrame = {
    val spark = df.sparkSession
    val in = java.nio.file.Files.createTempDirectory("graft_hll").toString
    val staged = df.select((groupCols.map(col) :+ value.as("_v")): _*)
    // ONE pass: repartition on a value hash and let each part file
    // become a micro-batch (maxFilesPerTrigger=1). The earlier
    // filter-per-split staging re-scanned the input `splits` times —
    // 3 full corpus scans at 100× for what is one shuffle write.
    staged.repartition(splits, pmod(conv(substring(
        md5(col("_v").cast("string")), 9, 8), 16, 10).cast("long"), lit(splits.toLong)))
      .write.mode("overwrite").parquet(in)
    val stream = spark.readStream.schema(staged.schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val reg = hllRegisters(stream, groupCols, col("_v"), p)
    val name = "stream_hll_sink_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val q = reg.writeStream.format("memory").queryName(name)
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    StreamStage.reap(spark, name, in)(
      hllFromRegisters(spark.table(name), groupCols, p))
  }

  /** Count-Min sketch (Cormode & Muthukrishnan 2005) build: `d`
    * independent hash rows × `w` counters over a stream of (item,
    * weight=1) — the heavy-hitter / frequency-estimate primitive.
    * Row r hashes item x to polyhash(r ++ ":" ++ x) mod w. Returns
    * the (row, bucket, cnt) counter table: d·w rows TOTAL regardless
    * of input size, map-side combined — the entire sketch fits in a
    * broadcast (the point of a sketch at 100 TB: counters shuffle,
    * items don't). */
  /** Unbounded-source harness: the HLL register aggregate over a RATE
    * stream — the deployment shape where data arrives forever and the
    * sketch is read while the stream runs. The rate source emits
    * sequential values; rows ≥ n are filtered so the processed value
    * domain is exactly [0, n), and an event-time watermark rides the
    * plan — proving the register state needs no late-data protection:
    * max is a merge-invariant semilattice, so trigger cadence and
    * watermark placement cannot change the final registers
    * (spec-asserted bit-equal to the batch sketch of range(n)). */
  def hllRateSource(spark: org.apache.spark.sql.SparkSession, n: Long,
                    p: Int = 6, rowsPerSecond: Int = 5000): DataFrame = {
    val stream = spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString).load()
      .withWatermark("timestamp", "0 seconds")
      .filter(col("value") < n)
      .select(lit("all").as("grp"), col("value"))
    drainRate(spark, hllRegisters(stream, Seq("grp"), col("value"), p),
      n, "rate_hll_sink_")
  }

  /** The same register aggregate over Spark's "socket" TCP line
    * source — the transport shape a deployment points at a feed shim
    * when no replayable log (Kafka) is available. What this surface
    * adds over [[hllRateSource]], and what a user must know:
    * the socket source keeps NO offsets (at-most-once on failure — a
    * production feed needs a replayable log), applies no backpressure
    * beyond the kernel socket buffer, and never reconnects (the
    * emitter must outlive the query). None of that changes the
    * result: registers are a max-semilattice merge, so the drained
    * table is bit-equal to the batch sketch over the same lines
    * (spec-asserted against a loopback line server). Non-numeric
    * lines null out under try_cast and are dropped (a plain ANSI cast
    * would kill the query on the first malformed line), so a noisy
    * feed degrades to its parseable subset instead of failing. */
  def hllSocketSource(spark: org.apache.spark.sql.SparkSession,
                      host: String, port: Int, n: Long, p: Int = 6): DataFrame = {
    val stream = spark.readStream.format("socket")
      .option("host", host).option("port", port.toString).load()
      .select(lit("all").as("grp"), expr("try_cast(value AS BIGINT)").as("v"))
      .filter(col("v").isNotNull && col("v") < n)
    drainRate(spark, hllRegisters(stream, Seq("grp"), col("v"), p),
      n, "socket_hll_sink_")
  }

  /** CMS counter table over a rate stream — same contract as
    * [[hllRateSource]]: counter increments form a commutative monoid,
    * so the drained table equals [[cmsBuild]] over range(n). */
  def cmsRateSource(spark: org.apache.spark.sql.SparkSession, n: Long,
                    d: Int = 4, w: Int = 256,
                    rowsPerSecond: Int = 5000): DataFrame = {
    val rows = spark.range(d).select(col("id").cast("int").as("row"))
    val stream = spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString).load()
      .withWatermark("timestamp", "0 seconds")
      .filter(col("value") < n)
      .select(col("value").cast("string").as("x"))
      .crossJoin(broadcast(rows))
      .select(col("row"), pmod(graft.functions.PolyHash.polyhash(
        concat(col("row").cast("string"), lit(":"), col("x"))), lit(w.toLong)).as("bucket"))
      .groupBy("row", "bucket").agg(count(lit(1)).as("cnt"))
    drainRate(spark, stream, n, "rate_cms_sink_")
  }

  /** Run a complete-mode register aggregate off an unbounded rate
    * stream until the source has emitted `n` rows (sequential values ⇒
    * the whole [0, n) domain processed), then stop and return the
    * final register table. Progress batchIds dedup the poll so the
    * input count never double-counts a retained progress entry. */
  private def drainRate(spark: org.apache.spark.sql.SparkSession,
                        agg: DataFrame, n: Long, sinkPrefix: String): DataFrame = {
    val name = sinkPrefix + java.util.UUID.randomUUID.toString.replace("-", "")
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("200 milliseconds"))
      .start()
    try {
      val seen = scala.collection.mutable.Set.empty[Long]
      var total = 0L
      val deadline = System.currentTimeMillis() + 120000L
      while (total < n && System.currentTimeMillis() < deadline) {
        Thread.sleep(100)
        for (pr <- q.recentProgress if !seen.contains(pr.batchId)) {
          seen += pr.batchId; total += pr.numInputRows
        }
      }
      require(total >= n,
        s"rate source emitted only $total of $n rows before timeout")
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table(name).localCheckpoint()
    spark.catalog.dropTempView(name)
    out
  }

  def cmsBuild(items: DataFrame, item: Column, d: Int = 4, w: Int = 256): DataFrame = {
    val rows = items.sparkSession.range(d).select(col("id").cast("int").as("row"))
    items.select(item.cast("string").as("x"))
      .crossJoin(broadcast(rows))
      .select(col("row"), pmod(graft.functions.PolyHash.polyhash(
        concat(col("row").cast("string"), lit(":"), col("x"))), lit(w.toLong)).as("bucket"))
      .groupBy("row", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Streaming Count-Min: the counter table maintained as a
    * complete-mode streaming SUM aggregate over hash-staged
    * micro-batches. Counters are a commutative-monoid merge, so —
    * like [[hllStreaming]] — the streamed sketch is bit-identical to
    * the batch sketch over the same rows; state is d·w counter rows,
    * never items. */
  def cmsStreaming(items: DataFrame, item: Column, d: Int = 4, w: Int = 256,
                   splits: Int = 3): DataFrame = {
    val spark = items.sparkSession
    val in = java.nio.file.Files.createTempDirectory("graft_cms").toString
    val staged = items.select(item.cast("string").as("x"))
    // one-pass staging, same rationale as [[hllStreaming]]
    staged.repartition(splits, pmod(conv(substring(
        md5(col("x")), 9, 8), 16, 10).cast("long"), lit(splits.toLong)))
      .write.mode("overwrite").parquet(in)
    val stream = spark.readStream.schema(staged.schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val rows = (0 until d).map(r =>
      pmod(graft.functions.PolyHash.polyhash(
        concat(lit(r + ":"), col("x"))), lit(w.toLong)).as(s"b$r"))
    val banded = stream.select((col("x") +: rows): _*)
      .select(explode(array((0 until d).map(r =>
        struct(lit(r).as("row"), col(s"b$r").as("bucket"))): _*)).as("rb"))
      .select(col("rb.row"), col("rb.bucket"))
    val reg = banded.groupBy("row", "bucket").agg(count(lit(1)).as("cnt"))
    val name = "stream_cms_sink_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val q = reg.writeStream.format("memory").queryName(name)
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    StreamStage.reap(spark, name, in)(spark.table(name))
  }

  /** Point-query the sketch: estimated frequency of each item in
    * `queries` = min over the d rows of its counter — never less than
    * the true count (one-sided error ≤ ε·N with prob 1−δ, ε=e/w,
    * δ=e^−d). The d·w counter table broadcasts; lookups are a
    * broadcast join + min aggregate. */
  def cmsEstimate(sketch: DataFrame, queries: DataFrame, item: Column,
                  d: Int = 4, w: Int = 256): DataFrame = {
    val spark = queries.sparkSession
    val rows = spark.range(d).select(col("id").cast("int").as("row"))
    queries.select(item.cast("string").as("x"))
      .crossJoin(broadcast(rows))
      .select(col("x"), col("row"), pmod(graft.functions.PolyHash.polyhash(
        concat(col("row").cast("string"), lit(":"), col("x"))), lit(w.toLong)).as("bucket"))
      .join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy("x")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
  }
}
