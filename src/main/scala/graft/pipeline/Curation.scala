package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus-curation operators — the composition layer a
  * training-data pipeline runs over the building blocks in [[Dedup]],
  * [[TextAnalysis]] and [[Ann]].
  *
  * Everything is deterministic and integer/decimal-derived so the
  * DuckDB oracle replays each stage exactly.
  */
object Curation {

  /** Keep one doc per exact-duplicate group, then apply quality,
    * language and token-count gates. One pass per signal, all joined
    * on doc_id — each signal is a map-side projection, the joins
    * shuffle only (doc_id, small stats). */
  def curate(docs: DataFrame, minQuality: Double, langs: Seq[String],
             minTokens: Int, maxTokens: Int): DataFrame = {
    val keepers = Dedup.exact(docs).select(col("keeper").as("doc_id"))
    val quality = TextAnalysis.quality(docs)
    val lang = TextAnalysis.langId(docs)
    val tokens = TextAnalysis.tokenCounts(docs).select("doc_id", "n_ws_tokens")
    keepers
      .join(quality, "doc_id")
      .join(lang, "doc_id")
      .join(tokens, "doc_id")
      .filter(col("quality") >= minQuality &&
        col("pred_lang").isin(langs: _*) &&
        col("n_ws_tokens").between(minTokens, maxTokens))
      .select("doc_id", "pred_lang", "quality", "n_ws_tokens")
  }

  /** Deterministic per-stratum downsampling: a doc survives iff
    * (doc_id · 2654435761) mod 1000 < rate‰ for its stratum. Hash-mod
    * sampling keeps the choice reproducible across runs/engines with
    * no RNG state, and the per-stratum rates arrive as a broadcast
    * map — the standard shape for rebalancing language/domain mix. */
  def stratifiedSample(docs: DataFrame, stratumCol: String,
                       ratesPerMille: Map[String, Int],
                       defaultPerMille: Int = 0): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rates = ratesPerMille.toSeq.toDF(stratumCol, "_rate")
    // bucket = md5(doc_id)'s top 32 bits mod 1000: non-negative, no
    // long-multiply overflow (Knuth-mult wrapped NEGATIVE for ids
    // beyond ~3.5e9, surviving every rate incl. 0), and genuinely
    // mixed — a residue "hash" depends only on doc_id mod 1000 and
    // correlates with strided ids. Replayable in the oracle via
    // CAST('0x'||substr(md5(..),1,8) AS BIGINT).
    val bucket = pmod(
      conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10).cast("long"),
      lit(1000L))
    docs
      .join(broadcast(rates), Seq(stratumCol), "left")
      .withColumn("_rate", coalesce(col("_rate"), lit(defaultPerMille)))
      .filter(bucket < col("_rate"))
      .drop("_rate")
  }

  /** Deterministic MIXTURE sampling: hit a target domain mix in one
    * pass — training-data curation's "rebalance the corpus to these
    * domain weights" op. Each listed stratum's per-mille rate derives
    * from its own corpus count (`floor(1000·budget·w / n)`, capped at
    * keep-all 1000; unlisted strata drop), then the same md5-bucket
    * rule as [[stratifiedSample]] applies it. The rate table is
    * per-stratum (broadcast-sized by definition); the docs side is one
    * broadcast join + map-side filter — zero doc shuffles, and the
    * count aggregation is the only pass over the corpus. Replayable
    * bit-for-bit in SQL (counts CTE + the md5 bucket). */
  def mixtureSample(docs: DataFrame, stratumCol: String,
                    targetWeights: Map[String, Double], budget: Long): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val w = targetWeights.toSeq.toDF(stratumCol, "_w")
    val rates = docs.groupBy(stratumCol).agg(count(lit(1)).as("_n"))
      .join(w, stratumCol)
      .withColumn("_rate", least(lit(1000L),
        floor(lit(1000.0) * lit(budget.toDouble) * col("_w") / col("_n")).cast("long")))
      .select(col(stratumCol), col("_rate"))
    val bucket = pmod(
      conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10).cast("long"),
      lit(1000L))
    docs.join(broadcast(rates), Seq(stratumCol))
      .filter(bucket < col("_rate"))
      .drop("_rate")
  }

  /** TEMPERATURE-weighted mixture sampling (the mT5/multilingual-LM
    * protocol, Xue et al. 2021 §3.1): stratum weights derive from the
    * corpus' OWN counts as n^alpha — alpha=1 keeps natural
    * proportions, alpha→0 flattens toward uniform, the standard knob
    * for upsampling low-resource languages/domains without hand-tuned
    * weights. Rates and bucketing then follow [[mixtureSample]]'s
    * integer per-mille discipline (floor(1000·budget·w/(Z·n)), md5
    * bucket), so the sample is deterministic and SQL-replayable.
    *
    * Float policy (the logprob precedent): n^alpha is 6-dp rounded
    * BEFORE the normalizing sum and Z is 6-dp rounded after it, so
    * both engines feed identical addends into the one floor() — the
    * only float boundary in the op.
    *
    * Scale shape: one count aggregate over the corpus (stratum-sized
    * result), a broadcast rate join, a map-side filter — doc rows
    * never shuffle. */
  def temperatureMix(docs: DataFrame, stratumCol: String,
                     alpha: Double, budget: Long): DataFrame = {
    val counts = docs.groupBy(stratumCol).agg(count(lit(1)).as("_n"))
    val w = counts.withColumn("_w",
      round(pow(col("_n").cast("double"), lit(alpha)), 6))
    val z = w.agg(round(sum("_w"), 6).as("_z")) // stratum-sized, 1 row
    val rates = w.crossJoin(z)
      .withColumn("_rate", least(lit(1000L),
        floor(lit(1000.0) * lit(budget.toDouble) * col("_w")
          / (col("_z") * col("_n"))).cast("long")))
      .select(col(stratumCol), col("_rate"))
    val bucket = pmod(
      conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10).cast("long"),
      lit(1000L))
    docs.join(broadcast(rates), Seq(stratumCol))
      .filter(bucket < col("_rate"))
      .drop("_rate")
  }

  /** Benchmark decontamination: word n-gram overlap against a
    * benchmark document set. Returns (doc_id, n_shared) for corpus
    * docs sharing ≥1 distinct n-gram with any benchmark doc. The
    * benchmark side's distinct n-grams are the join's small side;
    * the corpus side never self-joins. */
  def contamination(docs: DataFrame, benchmark: DataFrame, n: Int = 5): DataFrame = {
    val corpusGrams = Dedup.shingleSets(docs, n)
      .select(col("doc_id"), explode(col("shingles")).as("g"))
    val benchGrams = Dedup.shingleSets(benchmark, n)
      .select(explode(col("shingles")).as("g")).distinct()
    corpusGrams
      .join(benchGrams, "g")
      .groupBy("doc_id")
      .agg(countDistinct(col("g")).as("n_shared"))
  }

  /** DSIR importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every corpus
    * doc by how target-domain-like its hashed-unigram profile is —
    * weight(doc) = Σ_tokens ln p̂_target(bucket) − ln p̂_raw(bucket),
    * with add-1 smoothing over `buckets` feature-hash buckets. Docs
    * with high weight are what importance resampling keeps when
    * curating toward a target domain (the step between raw crawl and
    * the mixture sampler above).
    *
    * Scale shape: the bucket profiles are ONE aggregation over the
    * token stream (buckets-sized result — 256 rows here), collected
    * and broadcast as a plain log-ratio array; scoring is then a
    * map-only typed pass (tokenize once, sum lr[hash(tok) % B] in
    * token order) — the token stream is never joined or re-shuffled,
    * so at 100 TB the profile build is the only shuffle and it carries
    * ≤ `buckets` rows per map task. The [[graft.pipeline.Ann]]
    * assignToBook lesson applied to scoring: vocabulary-sized
    * reference tables ride a broadcast variable into a typed map, not
    * a join. Zero-token docs drop (they have no profile to score). */
  def dsirWeights(docs: DataFrame, isTarget: org.apache.spark.sql.Column,
                  buckets: Int = 256): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(col("doc_id"), isTarget.as("tgt"),
        explode(Dedup.words(col("text"))).as("t"))
      .select(col("tgt"),
        pmod(graft.functions.PolyHash.polyhash(col("t")), lit(buckets.toLong)).as("bk"))
    val prof = toks.groupBy("bk")
      .agg(count(when(col("tgt"), 1)).as("tc"), count(lit(1)).as("rc"))
      .collect().map(r => (r.getLong(0).toInt, r.getLong(1), r.getLong(2)))
    val tTot = prof.map(_._2).sum.toDouble
    val rTot = prof.map(_._3).sum.toDouble
    val lr = Array.tabulate(buckets) { b =>
      val (tc, rc) = prof.find(_._1 == b).map(p => (p._2, p._3)).getOrElse((0L, 0L))
      math.log((tc + 1.0) / (tTot + buckets)) - math.log((rc + 1.0) / (rTot + buckets))
    }
    val lrB = spark.sparkContext.broadcast(lr)
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val t = if (text == null) "" else text.toLowerCase(java.util.Locale.ROOT)
        val ws = t.split("[^a-z0-9]+").filter(_.nonEmpty)
        if (ws.isEmpty) None
        else {
          val table = lrB.value
          var w = 0.0
          ws.foreach { tok =>
            val b = (graft.functions.PolyHash.hash(
              tok.getBytes(java.nio.charset.StandardCharsets.UTF_8)) % buckets).toInt
            w += table(b)
          }
          Some((id, ws.length.toLong, w))
        }
      }
      .toDF("doc_id", "n_tokens", "raw_w")
      // + 0.0 collapses IEEE −0.0 (a weight rounding to zero from
      // below) onto +0.0 — engines disagree on ROUND's signed zero
      .select(col("doc_id"), col("n_tokens"),
        (round(col("raw_w"), 4) + lit(0.0)).as("dsir_weight"))
  }

  /** Deterministic training-order shuffle + sharding: each doc gets a
    * reproducible pseudo-random sort key (seeded polynomial hash of
    * its id), a shard (key mod `shards`), and its position within the
    * shard's key order. The global permutation is fixed by `seed`
    * alone — rerunning the pipeline reproduces byte-identical epochs.
    *
    * Scale shape: NO global sort. Each shard sorts independently
    * (partition-window row_number keyed on the shard), so with
    * production shard counts (≥ #executors) the sort is embarrassingly
    * parallel and each shard writes one training file. */
  def shardOrder(docs: DataFrame, shards: Int = 8, seed: Int = 42): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val key = graft.functions.PolyHash.polyhash(
      concat(col("doc_id").cast("string"), lit(":" + seed)))
    val w = Window.partitionBy("shard").orderBy(col("skey"), col("doc_id"))
    docs.select(col("doc_id"), key.as("skey"))
      .withColumn("shard", col("skey") % shards)
      .withColumn("pos", row_number().over(w).cast("long"))
      .select("doc_id", "shard", "pos")
  }

  /** Token-budget selection: keep the highest-quality docs whose
    * cumulative token count fits `budget` — "fill a 10B-token budget
    * with the best of the crawl", the last gate before training.
    *
    * Semantics = the greedy prefix of docs ordered by
    * (quality desc, doc_id): a doc is kept iff the running token sum
    * up to and including it stays ≤ budget (no skip-and-continue — a
    * too-big doc at the boundary ends the prefix, identically in both
    * engines).
    *
    * Scale shape: order statistics WITHOUT a global sort. Quality
    * quantizes into 1001 integer buckets (quality is already
    * 6dp-rounded to [0,1]); a 1001-row histogram of per-bucket token
    * sums collects to the driver, which picks the threshold bucket.
    * Buckets strictly above it are kept wholesale (a filter); only
    * the ONE boundary bucket — ~1/1000 of the corpus — pays an
    * ordered running-sum window. The shardOrder discipline applied to
    * prefix selection. */
  def budgetSelect(docs: DataFrame, budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = graft.pipeline.TextAnalysis.quality(docs)
      .join(graft.pipeline.TextAnalysis.tokenCounts(docs)
        .select("doc_id", "n_ws_tokens"), "doc_id")
      .withColumn("bkt", floor(col("quality") * 1000).cast("long"))
      .localCheckpoint()
    val hist = d.groupBy("bkt").agg(sum("n_ws_tokens").as("tok"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .sortBy(-_._1) // 1001-row driver table, never corpus-sized
    var cum = 0L
    var threshold = Long.MinValue // bucket that overflows the budget
    var above = 0L                // tokens in buckets strictly above it
    var i = 0
    while (i < hist.length && threshold == Long.MinValue) {
      if (cum + hist(i)._2 > budget) { threshold = hist(i)._1; above = cum }
      else cum += hist(i)._2
      i += 1
    }
    if (threshold == Long.MinValue)
      d.select("doc_id", "quality", "n_ws_tokens") // everything fits
    else {
      val whole = d.filter(col("bkt") > threshold)
      val w = Window.orderBy(col("quality").desc, col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val boundary = d.filter(col("bkt") === threshold)
        .withColumn("cum", sum("n_ws_tokens").over(w))
        .filter(col("cum") + above <= budget)
      whole.select("doc_id", "quality", "n_ws_tokens")
        .unionAll(boundary.select("doc_id", "quality", "n_ws_tokens"))
    }
  }
}
