package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.PolyHash.polyhash

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, fingerprinting. All are map-only
  * codegen'd projections (no shuffle, no UDF) — at 100 TB they run at
  * parquet scan speed.
  */
object TextAnalysis {

  import Dedup.words

  private val markers: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "a", "is", "and", "of"),
    "es" -> Seq("el", "la", "los", "y", "es"),
    "fr" -> Seq("le", "les", "des", "et", "est"),
    "zh" -> Seq("de", "shi", "he", "zai", "le"))

  /** Marker-token language ID: argmax of per-language stopword hits,
    * alphabetical tie-break, 'und' when nothing matches. One typed-map
    * pass (tokenize once, count all languages) — the HOF formulation
    * (`filter` per language) is CodegenFallback and evaluated
    * interpreted five times per row, the exact cost Dedup.shingleSets
    * documents avoiding. Tokenization matches [[Dedup.words]]. */
  def langId(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val langSets = markers.toSeq.sortBy(_._1).map { case (l, ms) => l -> ms.toSet }
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        // null text → no tokens → 'und' (the column-based path this
        // replaced was null-safe; the typed map must be too)
        val t = if (text == null) "" else text.toLowerCase(java.util.Locale.ROOT)
        val toks = t.split("[^a-z0-9]+").filter(_.nonEmpty)
        val counts = langSets.map { case (_, s) => toks.count(s.contains) }
        val best = if (counts.isEmpty) 0 else counts.max
        // alphabetical-first tie-break: first sorted language at max
        val pred = if (best == 0) "und" else langSets(counts.indexOf(best))._1
        (id, pred)
      }
      .toDF("doc_id", "pred_lang")
  }

  /** Deterministic quality score in [0,1]:
    * 0.4·min(1, n_tokens/50) + 0.3·type_token_ratio + 0.3·alpha_ratio. */
  def quality(docs: DataFrame): DataFrame = {
    val toks = words(col("text"))
    docs.select(col("doc_id"), toks.as("ws"), col("text"))
      .withColumn("n_tokens", size(col("ws")).cast("double"))
      .withColumn("ttr", size(array_distinct(col("ws"))) / col("n_tokens"))
      .withColumn("alpha_ratio",
        length(regexp_replace(lower(col("text")), "[^a-z]", "")).cast("double") /
          length(col("text")))
      .select(col("doc_id"),
        round(lit(0.4) * least(lit(1.0), col("n_tokens") / 50.0)
          + lit(0.3) * col("ttr") + lit(0.3) * col("alpha_ratio"), 6).as("quality"))
  }

  /** Token counts: whitespace tokens + BPE-ish regex tokens (word
    * pieces and standalone punctuation). */
  /** Whitespace-token count; 0 for empty/blank text (split of an
    * empty string yields [""] — 1 phantom token — in both engines). */
  private def wsTokens(c: Column): Column =
    when(length(trim(c)) === 0, lit(0))
      .otherwise(size(split(trim(c), "\\s+")))

  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      wsTokens(col("text")).as("n_ws_tokens"),
      size(expr("regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\\\\s]', 0)")).as("n_bpe_tokens"))

  /** Unigram log-probability quality signal — the LM-scored gate of a
    * training-data pipeline (higher = more typical of the corpus):
    * mean ln p(token) per doc under the corpus' OWN unigram
    * distribution. The vocabulary-sized (term → count) aggregate stays
    * in the shuffle and joins back on the term — never broadcast or
    * collected; the token pass is materialized once for its two
    * consumers (frequency build + scoring join). Docs with no tokens
    * drop. 4-dp rounding keeps engine ulp drift (ln + summation
    * order) away from the compare boundary — the float policy every
    * scoring oracle here uses. */
  def logprobScore(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), explode(split(lower(col("text")), "[^a-z0-9]+")).as("t"))
      .filter(col("t") =!= "")
      .localCheckpoint()
    val freq = toks.groupBy("t").agg(count(lit(1)).as("cnt"))
    val total = freq.agg(sum("cnt").cast("double").as("tot"))
    toks.join(freq, "t").crossJoin(total)
      .groupBy("doc_id")
      .agg(round(avg(log(col("cnt") / col("tot"))), 4).as("logprob"))
  }

  /** Rolling-hash fingerprint of the normalized text (native Catalyst
    * expression, whole-stage codegen). */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      polyhash(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")).as("fingerprint"))

  /** Sequence packing: assign docs to fixed-token-budget training
    * packs. Deterministic greedy-by-id within a shard: the running
    * token cumsum (window per shard, ordered by doc_id) divides by the
    * budget — a doc lands in the pack its PRECEDING cumsum falls in,
    * so packs fill in id order and every shard packs independently
    * (the shard key is the parallelism unit at 100 TB: one sequential
    * window per shard, never a global sort). A doc longer than the
    * budget OVERFLOWS the pack it lands in (greedy semantics — packs
    * are budget-sized except where a single oversized doc runs over;
    * consumers needing hard caps split such docs upstream). */
  def packSequences(docs: DataFrame, shardCol: Column, tokensPerPack: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col("doc_id"), shardCol.as("shard"),
      wsTokens(col("text")).cast("long").as("n_tokens"))
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    toks
      .withColumn("cum", sum("n_tokens").over(w))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        floor((col("cum") - col("n_tokens")) / tokensPerPack).as("pack_id"))
  }
}
