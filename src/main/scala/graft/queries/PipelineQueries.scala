package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.rdf.TpchRdf
import graft.pipeline.{Ann, Dedup, Multimodal, TextAnalysis}

/** LLM-training-data pipeline coverage (SURVEY.md §2, pipeline block). */
object PipelineQueries {

  private def docs(s: SparkSession, dir: String) = TpchRdf.table(s, dir, "documents")
  private def embs(s: SparkSession, dir: String) = TpchRdf.table(s, dir, "embeddings")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> ((s, dir) =>
      Dedup.exact(docs(s, dir)).orderBy("keeper")),
    "dedup_ngram_jaccard" -> ((s, dir) =>
      // df cap 64: viral shingles never enter the candidate self-join
      Dedup.ngramJaccard(docs(s, dir), 0.5, maxDf = 64).orderBy("a", "b")),
    "dedup_minhash_lsh" -> ((s, dir) =>
      Dedup.minhashLsh(docs(s, dir), 0.8).orderBy("a", "b")),
    "dedup_simhash" -> ((s, dir) =>
      Dedup.simhashPairs(docs(s, dir), 3).orderBy("a", "b")),
    // embedding near-dup pairs at θ=0.45 — the SemDeDup cell-confined
    // pair space (Ann.cosinePairsCell): at 63° hyperplane-LSH has no
    // contrast, so the exact-recall cosinePairs operator is bucket-
    // quadratic there (its guard refuses unguarded launches); the
    // scale-honest low-θ plan is cluster-confined and linear, and the
    // oracle replays the cell assignment so confinement is part of the
    // checked contract. cosinePairs stays the exact operator for the
    // θ ≳ 0.7 regime (spec-pinned against cosinePairsExact).
    "dedup_embed_cosine" -> ((s, dir) =>
      Ann.cosinePairsCell(embs(s, dir), 0.45).orderBy("a", "b")),
    // dedup CLUSTERING: near-dup pairs → connected components → one
    // keeper per cluster (the step after pair generation in a real
    // dedup pipeline; transitive closure, not pairwise pruning, so
    // A~B~C collapses to one doc even when A≁C). Pairs come from the
    // banded MinHash path; clustering reuses the frontier CC.
    "dedup_cluster" -> ((s, dir) => {
      val pairs = Dedup.minhashLsh(docs(s, dir), 0.8).select("a", "b")
      val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
      graft.gas.Analytics.connectedComponents(edges)
        .groupBy(col("label").as("keeper"))
        .agg(count(lit(1)).as("cluster_size"))
        .orderBy("keeper")
    }),
    "ann_bruteforce" -> ((s, dir) => {
      val e = embs(s, dir)
      Ann.bruteForce(e.filter(col("vec_id") < 10), e, 5).orderBy("q_id", "rank")
    }),
    "ann_lsh" -> ((s, dir) => {
      val e = embs(s, dir)
      // 6-bit sketch = 64 buckets: dense enough for recall at small SF
      Ann.lshTopK(e.filter(col("vec_id") < 10), e, 3, numBits = 6).orderBy("q_id", "rank")
    }),
    "ann_ivf" -> ((s, dir) => {
      val e = embs(s, dir)
      // IVF coarse quantizer: ~N/64 centroids, 4-cell probe
      Ann.ivfTopK(e.filter(col("vec_id") < 10), e, 5).orderBy("q_id", "rank")
    }),
    "text_langid" -> ((s, dir) =>
      TextAnalysis.langId(docs(s, dir)).orderBy("doc_id")),
    // sequence packing: docs → fixed-token-budget training packs,
    // greedy by id within hash shards (each shard packs independently
    // — the parallelism unit at scale)
    "pipeline_pack" -> ((s, dir) =>
      TextAnalysis.packSequences(docs(s, dir), pmod(col("doc_id"), lit(4)), 2048)
        .orderBy("doc_id")),
    "text_quality" -> ((s, dir) =>
      TextAnalysis.quality(docs(s, dir)).orderBy("doc_id")),
    "text_tokens" -> ((s, dir) =>
      TextAnalysis.tokenCounts(docs(s, dir)).orderBy("doc_id")),
    "text_fingerprint" -> ((s, dir) =>
      TextAnalysis.fingerprint(docs(s, dir)).orderBy("doc_id")),
    "text_logprob" -> ((s, dir) =>
      TextAnalysis.logprobScore(docs(s, dir)).orderBy("doc_id")),
    "mm_decode" -> ((s, dir) =>
      Multimodal.decodeDocuments(s, s"$dir/documents.parquet").orderBy("doc_id")),
    "mm_features" -> ((s, dir) =>
      Multimodal.featureDocuments(s, s"$dir/documents.parquet").orderBy("doc_id")),
    // end-to-end curation: exact-dedup keepers + quality/lang/token gates
    "pipeline_curate" -> ((s, dir) =>
      graft.pipeline.Curation.curate(docs(s, dir), 0.45, Seq("en"), 20, 1000)
        .orderBy("doc_id")),

    // deterministic per-language downsampling (hash-mod, reproducible)
    "pipeline_sample" -> ((s, dir) => {
      val d = docs(s, dir)
      val withLang = d.join(TextAnalysis.langId(d), "doc_id")
      graft.pipeline.Curation.stratifiedSample(withLang, "pred_lang",
          Map("en" -> 500, "de" -> 100), defaultPerMille = 100)
        .select("doc_id", "pred_lang").orderBy("doc_id")
    }),

    // mixture sampling: rebalance the corpus to target domain weights
    // (en:de:fr = 2:1:1 at a 200-doc budget; unlisted langs drop)
    "pipeline_mix" -> ((s, dir) => {
      graft.pipeline.Curation.mixtureSample(docs(s, dir), "lang",
          Map("en" -> 0.5, "de" -> 0.25, "fr" -> 0.25), budget = 200)
        .select("doc_id", "lang").orderBy("doc_id")
    }),

    // benchmark decontamination: 5-gram overlap vs a benchmark subset
    "pipeline_contam" -> ((s, dir) => {
      val d = docs(s, dir)
      graft.pipeline.Curation.contamination(
          d.filter(col("doc_id") >= 10), d.filter(col("doc_id") < 10), 5)
        .orderBy("doc_id")
    }),

    // PII scan + redaction (counts per class + redacted-text
    // fingerprint; detection on PII-bearing text is PipelineSpec's job
    // — this corpus is PII-free, so counts are zero and the
    // fingerprint pins the redaction plumbing)
    "text_pii" -> ((s, dir) =>
      TextAnalysis.pii(docs(s, dir)).orderBy("doc_id")),

    // Gopher-style repetition signals: top-token fraction + duplicate
    // 2-gram fraction
    "text_repetition" -> ((s, dir) =>
      TextAnalysis.repetition(docs(s, dir)).orderBy("doc_id")),

    // byte-distribution Shannon entropy (nats) — codegen kernel
    "text_entropy" -> ((s, dir) =>
      TextAnalysis.charEntropy(docs(s, dir)).orderBy("doc_id")),

    // context-window chunking: 64-token windows, stride 48
    "pipeline_chunk" -> ((s, dir) =>
      TextAnalysis.chunk(docs(s, dir)).orderBy("doc_id", "chunk_idx")),

    // topic clustering: one Lloyd iteration from deterministic seeds
    "pipeline_kmeans" -> ((s, dir) =>
      Ann.kmeansAssign(embs(s, dir)).orderBy("vec_id")),

    "mm_resize" -> ((s, dir) =>
      Multimodal.resizeDims(
        Multimodal.decodeDocuments(s, s"$dir/documents.parquet"))
        .select("doc_id", "width", "height", "r_width", "r_height")
        .orderBy("doc_id")),
    "mm_framesample" -> ((s, dir) =>
      Multimodal.frameDocuments(s, s"$dir/documents.parquet")
        .orderBy("doc_id", "frame_idx")),

    // duplicate-span profile: fraction of a doc's verbatim 8-word
    // windows that occur in any other doc (substring-dedup gate)
    "dedup_substring" -> ((s, dir) =>
      Dedup.substringDup(docs(s, dir)).orderBy("doc_id")),

    // cross-snapshot incremental dedup: new batch (id ≥ 250) vs prior
    // corpus (id < 250), bloom-prefiltered, exact-verified
    "dedup_incremental" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.incrementalDedup(d.filter(col("doc_id") >= 250),
        d.filter(col("doc_id") < 250)).orderBy("doc_id")
    }),

    // SemDeDup: coarse-cell clustering + intra-cell cosine pruning
    "dedup_semantic" -> ((s, dir) =>
      Ann.semanticDedup(embs(s, dir), 0.45).orderBy("vec_id")),

    // hashed linear classifier margin (fastText-style keep/drop gate)
    "text_classify" -> ((s, dir) =>
      TextAnalysis.classify(docs(s, dir)).orderBy("doc_id")),

    // deterministic training-order shuffle: seeded key → shard → pos
    "pipeline_shard" -> ((s, dir) =>
      graft.pipeline.Curation.shardOrder(docs(s, dir)).orderBy("doc_id")),

    // int8 symmetric quantization digests per embedding
    "emb_quantize" -> ((s, dir) =>
      Ann.quantizeInt8(embs(s, dir)).orderBy("vec_id")),

    // product-quantization ANN: 8 subspaces × 16 codes, ADC ranking
    "ann_pq" -> ((s, dir) => {
      val e = embs(s, dir)
      Ann.pqTopK(e.filter(col("vec_id") < 10), e, 5).orderBy("q_id", "rank")
    }),

    // streaming near-dup gate: simhash banded state across 3
    // micro-batches; doc flagged iff an earlier (smaller-id) doc is
    // within Hamming 3 — batching-invariant, replayed by a batch oracle
    "stream_neardup" -> ((s, dir) =>
      graft.operators.NearDup.run(s, docs(s, dir)).orderBy("doc_id")),

    // windowed streaming near-dup with watermark-evicted state: event
    // time = crawl sequence (doc_id seconds); dup ⇔ an earlier doc
    // within the 500-doc horizon matches at Hamming ≤ 3 — band state
    // holds one horizon of docs, not the corpus (bound spec-asserted)
    "stream_neardup_ttl" -> ((s, dir) =>
      graft.operators.NearDup.run(s, docs(s, dir), horizonSec = Some(500L))
        .orderBy("doc_id")),

    // bounded-state stream + periodic expired-archive band sweep:
    // verdicts ≡ the unbounded full-history run, state stays bounded
    "stream_neardup_archive" -> ((s, dir) =>
      graft.operators.NearDup.runWithArchive(s, docs(s, dir), horizonSec = 500L)
        .orderBy("doc_id")),

    // DSIR importance weights toward a target domain (sources 0-3):
    // hashed-unigram log-ratio profile, broadcast table + map-only score
    "pipeline_dsir" -> ((s, dir) =>
      graft.pipeline.Curation.dsirWeights(docs(s, dir),
        col("source").isin("src0", "src1", "src2", "src3")).orderBy("doc_id")),

    // BPE tokenizer training, round 1: ranked adjacent-char-pair counts
    // over the frequency-weighted distinct-word table
    "tokenize_bpe" -> ((s, dir) =>
      TextAnalysis.bpePairCounts(docs(s, dir)).orderBy("rank")),

    // Johnson-Lindenstrauss ±1 random projection digests (64 → 16 dims)
    "emb_project" -> ((s, dir) =>
      Ann.randomProject(embs(s, dir)).orderBy("vec_id")),

    // robust winnowing fingerprints (MOSS): rightmost-min of each
    // 4-window over char 5-gram hashes — all-integer, exact oracle
    "text_winnow" -> ((s, dir) =>
      TextAnalysis.winnow(docs(s, dir)).orderBy("doc_id", "pos")),

    // Count-Min sketch over the token stream: 4×256 counter table
    // (input-size-independent), top-20 exact tokens point-queried —
    // cms_est >= n_exact always (one-sided error)
    "sketch_cms" -> ((s, dir) => {
      val t = docs(s, dir)
        .select(explode(split(lower(col("text")), "[^a-z0-9]+")).as("tok"))
        .filter(col("tok") =!= "")
      val sketch = graft.operators.Sketch.cmsBuild(t, col("tok"))
      val exact = t.groupBy("tok").agg(count(lit(1)).as("n_exact"))
      val top = exact.orderBy(col("n_exact").desc, col("tok")).limit(20)
      graft.operators.Sketch.cmsEstimate(sketch, top, col("tok"))
        .join(top.withColumnRenamed("tok", "x"), "x")
        .select(col("x").as("token"), col("n_exact"), col("cms_est"))
        .orderBy("token")
    }),

    // the WHOLE curation pipeline as one composed query: exact-dedup
    // keepers → quality/lang/token gates → DSIR target-domain gate
    // (profile built on the RAW corpus, the standard DSIR protocol) →
    // deterministic shard+order. What a migrating training-data team
    // actually runs end to end.
    "pipeline_end2end" -> ((s, dir) => {
      val d = docs(s, dir)
      val curated = graft.pipeline.Curation.curate(d, 0.45, Seq("en"), 20, 1000)
      val dsir = graft.pipeline.Curation.dsirWeights(d,
        col("source").isin("src0", "src1", "src2", "src3"))
      val kept = curated.join(dsir.select("doc_id", "dsir_weight"), "doc_id")
        .filter(col("dsir_weight") > -1.7) // importance floor: the target-leaning half of this corpus
      val sharded = graft.pipeline.Curation.shardOrder(kept, shards = 8)
      kept.join(sharded, "doc_id")
        .select("doc_id", "pred_lang", "quality", "n_ws_tokens",
          "dsir_weight", "shard", "pos")
        .orderBy("doc_id")
    }),

    // PMI collocations: top word pairs vs the corpus' own unigram
    // distribution (rank over the minCount-filtered table only)
    "text_collocations" -> ((s, dir) =>
      TextAnalysis.collocations(docs(s, dir)).orderBy("rank")),

    // bigram LM fluency score (context-aware sibling of text_logprob)
    "text_ngram_lm" -> ((s, dir) =>
      TextAnalysis.bigramLmScore(docs(s, dir)).orderBy("doc_id")),

    // T5-style span corruption: stride-10 3-token spans → input/label
    // fingerprints (map-only; text never shuffles)
    "pipeline_spans" -> ((s, dir) =>
      TextAnalysis.spanCorruption(docs(s, dir)).orderBy("doc_id")),

    // BPE round 2: apply the top merge (left-to-right non-overlap,
    // merged unit = '#'), re-rank adjacent symbol pairs
    "tokenize_bpe2" -> ((s, dir) =>
      TextAnalysis.bpeSecondRound(docs(s, dir)).orderBy("rank")),

    // k-round BPE trainer (k=8): per round, top adjacent-symbol pair
    // applied as a greedy left-to-right non-overlap merge — k
    // vocabulary passes, corpus read once, plan checkpoint-truncated
    "tokenize_bpe_k" -> ((s, dir) =>
      TextAnalysis.bpeTrain(docs(s, dir), 8).orderBy("round")),

    // BPE ENCODE (the trainer's inference side): tokenize the corpus
    // with the trained vocabulary — one corpus token pass joined
    // against the vocabulary-sized (word -> length) table
    "tokenize_apply" -> ((s, dir) =>
      TextAnalysis.bpeEncode(docs(s, dir), 8).orderBy("doc_id")),

    // per-language tokenizer fertility from the k-round BPE vocabulary:
    // tokens/word + chars/token — the "does the vocabulary serve this
    // language" gate; all-integer sums, one rounded division each
    "tokenize_fertility" -> ((s, dir) =>
      TextAnalysis.bpeFertility(docs(s, dir), 8).orderBy("lang")),

    // temperature-weighted language mixing (n^0.3): upsample
    // low-resource languages without hand-tuned weights
    "pipeline_mix_temp" -> ((s, dir) =>
      graft.pipeline.Curation.temperatureMix(docs(s, dir), "lang", 0.3, 200L)
        .select("doc_id", "lang").orderBy("doc_id")),

    // exact MIPS top-k: raw inner product, no norm division — the
    // retrieval scoring of dot-trained embedding models
    "ann_mips" -> ((s, dir) => {
      val e = embs(s, dir)
      Ann.mipsTopK(e.filter(col("vec_id") < 10), e, 5).orderBy("q_id", "rank")
    }),

    // STREAMING Count-Min: counters as a complete-mode streaming sum —
    // commutative-monoid merge ⇒ identical to the batch sketch (same
    // oracle shape as sketch_cms)
    "stream_cms" -> ((s, dir) => {
      // NOT materialized on purpose (optimization r17 measured it):
      // the tokenize is cheap codegen map work, and checkpointing the
      // token stream costs more than the second pass it saves
      val t = docs(s, dir)
        .select(explode(split(lower(col("text")), "[^a-z0-9]+")).as("tok"))
        .filter(col("tok") =!= "")
      val sketch = graft.operators.Sketch.cmsStreaming(t, col("tok"))
      val exact = t.groupBy("tok").agg(count(lit(1)).as("n_exact"))
      val top = exact.orderBy(col("n_exact").desc, col("tok")).limit(20)
      graft.operators.Sketch.cmsEstimate(sketch, top, col("tok"))
        .join(top.withColumnRenamed("tok", "x"), "x")
        .select(col("x").as("token"), col("n_exact"), col("cms_est"))
        .orderBy("token")
    }),

    // Gopher rule battery (Rae et al. 2021 A1.1): 7 keep flags from
    // one typed-map scan, all decisions integer cross-multiplied
    "text_gopher" -> ((s, dir) =>
      TextAnalysis.gopherRules(docs(s, dir)).orderBy("doc_id")),

    // CCNet-style per-language perplexity terciles (head/middle/tail)
    "text_ccnet_buckets" -> ((s, dir) =>
      TextAnalysis.ccnetBuckets(docs(s, dir)).orderBy("doc_id")),

    // exact media dedup by binary content hash; mirror copies planted
    // (doc_id+10000, same bytes) since the base corpus has none
    "mm_dedup" -> ((s, dir) => {
      val d = docs(s, dir).select("doc_id", "text")
      val mirrors = d.filter(col("doc_id") < 20)
        .select((col("doc_id") + 10000L).as("doc_id"), col("text"))
      Multimodal.dedupMedia(Multimodal.mediaFrom(d.unionAll(mirrors)))
        .orderBy("doc_id")
    }),

    // token-budget selection: the greedy best-quality prefix under a
    // 10k-token budget — histogram + driver threshold, NO global sort
    "pipeline_budget" -> ((s, dir) =>
      graft.pipeline.Curation.budgetSelect(docs(s, dir), 10000L)
        .orderBy("doc_id")),

    // video-shaped near-dup via shared sampled frames; re-encode
    // variants planted (same content + a trailer — aligned prefix
    // frames survive, the case frame fingerprints exist to catch)
    "mm_near_frames" -> ((s, dir) => {
      val d = docs(s, dir).select("doc_id", "text")
      val variants = d.filter(col("doc_id") < 20)
        .select((col("doc_id") + 10000L).as("doc_id"),
          concat(col("text"), lit(" reencoded trailer segment")).as("text"))
      val frames = Multimodal.sampleFrames(
        Multimodal.mediaFrom(d.unionAll(variants)),
        frameBytes = 64, every = 2).toDF()
      Multimodal.frameNearDup(frames).orderBy("a", "b")
    }),
  )

  private val shingleCte =
    """w AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ws FROM documents),
      |sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(ws) - 1), i -> ws[i]||' '||ws[i+1]||' '||ws[i+2])) AS shs
      |       FROM w WHERE len(ws) >= 3),
      |e AS (SELECT doc_id, unnest(shs) AS sh FROM sh),
      |sizes AS (SELECT doc_id, len(shs) AS sz FROM sh),
      |pairs AS (SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS inter
      |          FROM e a JOIN e b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2),
      |jac AS (SELECT a, b, ROUND(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6) AS jaccard
      |        FROM pairs JOIN sizes sa ON pairs.a = sa.doc_id JOIN sizes sb ON pairs.b = sb.doc_id)""".stripMargin

  /** Distinct verbatim 8-word windows per doc (empty list when the doc
    * has < 8 words) — the substring-dedup unit, mirroring
    * [[graft.pipeline.Dedup.shingleSets]] with n = 8. */
  private val winCte =
    """w AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ws FROM documents),
      |win AS (SELECT doc_id, CASE WHEN len(ws) >= 8 THEN list_distinct(list_transform(range(1, len(ws) - 6),
      |        i -> ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3]||' '||ws[i+4]||' '||ws[i+5]||' '||ws[i+6]||' '||ws[i+7])) ELSE [] END AS wins FROM w)""".stripMargin

  /** Polynomial rolling hash of a string expression — the PolyHash
    * kernel ((acc·31 + byte) mod 1e9+7) replayed over codepoints
    * (inputs are ASCII, so codepoint = byte). */
  private def polyhashSql(s: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  list_transform(string_split($s, ''), c -> CAST(ord(c) AS BIGINT))),
       |  (a, b) -> (a * 31 + b) % 1000000007)""".stripMargin

  /** Cell-assignment CTE chain shared by `dedup_embed_cosine` and
    * `dedup_semantic` — replays Ann.cosinePairsCell: seed book (vec_id
    * multiples of 64, hash-thinned to ≤4096) → nearest-seed argmax
    * (ties → larger c_id) → intra-cell pairs with RAW cosine ≥ 0.45
    * in `q`. Cell confinement is part of the checked contract. */
  private lazy val cellPairCte =
    s"""cand AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 64 = 0),
       |th AS (SELECT CAST((COUNT(*) + 4095) // 4096 AS BIGINT) AS t FROM cand),
       |seeds AS (SELECT vec_id AS c_id, embedding AS ce FROM cand, th
       |          WHERE (vec_id % 2147483648 * 2654435761 % 1000003) % t = 0),
       |fan AS (SELECT e.vec_id, e.embedding, c.c_id,
       |          ${cosExpr("e.embedding", "c.ce")} AS csim
       |        FROM embeddings e CROSS JOIN seeds c),
       |assign0 AS (SELECT vec_id, embedding, c_id AS cluster FROM (
       |  SELECT vec_id, embedding, c_id,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, c_id DESC) AS rn
       |  FROM fan) WHERE rn = 1),
       |p AS (SELECT x.vec_id AS a, y.vec_id AS b, ${cosExpr("x.embedding", "y.embedding")} AS sim
       |      FROM assign0 x JOIN assign0 y ON x.cluster = y.cluster AND x.vec_id < y.vec_id),
       |q AS (SELECT a, b, sim FROM p WHERE sim >= 0.45)""".stripMargin

  private def cosExpr(a: String, b: String): String =
    s"""(list_sum(list_transform(range(1, 65), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))
       | / (sqrt(list_sum(list_transform(range(1, 65), i -> CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE))))
       |   * sqrt(list_sum(list_transform(range(1, 65), i -> CAST($b[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))))))""".stripMargin

  /** k-round BPE oracle: each round is LEAD-pair counts → top-1 merge
    * (cnt desc, x, y) → greedy left-to-right non-overlap application.
    * Non-overlap needs care only when x = y (e.g. 'l l'): matches then
    * form islands of consecutive positions, and greedy takes the odd
    * offsets — computed with a run-parity window (pos − ROW_NUMBER
    * islands). For x ≠ y adjacent matches are impossible, so every
    * match is taken. Positions re-densify per round so the island
    * arithmetic stays valid. */
  private def bpeTrainOracleSql(k: Int): String = {
    val head =
      """WITH w0 AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ws FROM documents),
        |wu AS (SELECT unnest(ws) AS wd FROM w0),
        |vb AS (SELECT wd, CAST(COUNT(*) AS BIGINT) AS f FROM wu GROUP BY wd),
        |e0 AS (SELECT wd, f, CAST(unnest(range(1, len(wd) + 1)) AS BIGINT) AS pos FROM vb),
        |v1 AS (SELECT wd AS wid, f, pos, substring(wd, CAST(pos AS INTEGER), 1) AS sym FROM e0)""".stripMargin
    val rounds = (1 to k).map { i =>
      s"""p$i AS (SELECT wid, f, pos, sym, LEAD(sym) OVER (PARTITION BY wid ORDER BY pos) AS nxt FROM v$i),
         |m$i AS (SELECT sym AS x, nxt AS y, CAST(SUM(f) AS BIGINT) AS cnt FROM p$i
         |        WHERE nxt IS NOT NULL GROUP BY 1, 2 ORDER BY cnt DESC, x, y LIMIT 1),
         |q$i AS (SELECT p.wid, p.f, p.pos, p.sym, m.x, m.y,
         |          CASE WHEN p.sym = m.x AND p.nxt = m.y THEN 1 ELSE 0 END AS isp
         |        FROM p$i p CROSS JOIN m$i m),
         |g$i AS (SELECT *, pos - ROW_NUMBER() OVER (PARTITION BY wid, isp ORDER BY pos) AS grp FROM q$i),
         |s$i AS (SELECT *, CASE WHEN isp = 1
         |          AND ROW_NUMBER() OVER (PARTITION BY wid, isp, grp ORDER BY pos) % 2 = 1
         |          THEN 1 ELSE 0 END AS sel FROM g$i),
         |r$i AS (SELECT wid, f, pos, sel, LAG(sel) OVER (PARTITION BY wid ORDER BY pos) AS psel,
         |          CASE WHEN sel = 1 THEN x || y ELSE sym END AS sym2 FROM s$i),
         |v${i + 1} AS (SELECT wid, f, CAST(ROW_NUMBER() OVER (PARTITION BY wid ORDER BY pos) AS BIGINT) AS pos,
         |          sym2 AS sym FROM r$i WHERE COALESCE(psel, 0) = 0)""".stripMargin
    }.mkString(",\n")
    val tail = (1 to k)
      .map(i => s"SELECT CAST($i AS BIGINT) AS round, x, y, cnt FROM m$i")
      .mkString("\nUNION ALL\n")
    s"$head,\n$rounds\nSELECT round, x, y, cnt FROM (\n$tail\n) ORDER BY round"
  }

  /** Encode oracle: run the same k-round chain, then tokenize the
    * corpus with the trained vocabulary — per-doc word count and
    * post-merge symbol count (the sequence length a data loader
    * budgets on). */
  private def bpeEncodeOracleSql(k: Int): String = {
    val train = bpeTrainOracleSql(k)
    val chain = train.substring(0, train.lastIndexOf("\nSELECT round"))
    s"""$chain,
       |wt AS (SELECT wid, CAST(COUNT(*) AS BIGINT) AS n_sym FROM v${k + 1} GROUP BY wid),
       |dw AS (SELECT doc_id, unnest(ws) AS wd FROM w0)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words, CAST(SUM(n_sym) AS BIGINT) AS n_tokens
       |FROM dw JOIN wt ON dw.wd = wt.wid GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  private def bpeFertilityOracleSql(k: Int): String = {
    val train = bpeTrainOracleSql(k)
    val chain = train.substring(0, train.lastIndexOf("\nSELECT round"))
    s"""$chain,
       |wt AS (SELECT wid, CAST(COUNT(*) AS BIGINT) AS n_sym FROM v${k + 1} GROUP BY wid),
       |dw AS (SELECT d.lang, unnest(w0.ws) AS wd FROM w0 JOIN documents d ON w0.doc_id = d.doc_id)
       |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_words,
       |  CAST(SUM(n_sym) AS BIGINT) AS n_tokens,
       |  ROUND(CAST(SUM(n_sym) AS DOUBLE) / COUNT(*), 4) AS tokens_per_word,
       |  ROUND(CAST(SUM(LENGTH(wd)) AS DOUBLE) / SUM(n_sym), 4) AS chars_per_token
       |FROM dw JOIN wt ON dw.wd = wt.wid GROUP BY lang ORDER BY lang""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "tokenize_bpe_k" -> bpeTrainOracleSql(8),
    "tokenize_apply" -> bpeEncodeOracleSql(8),
    "tokenize_fertility" -> bpeFertilityOracleSql(8),

    "pipeline_mix_temp" ->
      """WITH c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY lang),
        |w AS (SELECT lang, n, ROUND(POW(CAST(n AS DOUBLE), 0.3), 6) AS wt FROM c),
        |z AS (SELECT ROUND(SUM(wt), 6) AS z FROM w),
        |rates AS (SELECT lang,
        |  LEAST(1000, CAST(FLOOR(1000.0 * 200 * wt / (z * n)) AS BIGINT)) AS rate
        |  FROM w, z)
        |SELECT d.doc_id, d.lang FROM documents d JOIN rates r ON d.lang = r.lang
        |WHERE CAST(('0x'||substr(md5(CAST(d.doc_id AS VARCHAR)),1,8)) AS BIGINT) % 1000 < rate
        |ORDER BY doc_id""".stripMargin,
    "dedup_exact" ->
      "SELECT MIN(doc_id) AS keeper, COUNT(*) AS n_copies FROM documents GROUP BY text ORDER BY keeper",

    "dedup_ngram_jaccard" ->
      s"WITH $shingleCte\nSELECT a, b, jaccard FROM jac WHERE jaccard >= 0.5 ORDER BY a, b",

    "dedup_minhash_lsh" ->
      s"WITH $shingleCte\nSELECT a, b, jaccard FROM jac WHERE jaccard >= 0.8 ORDER BY a, b",

    "dedup_cluster" ->
      s"""WITH RECURSIVE $shingleCte,
         |p AS (SELECT a, b FROM jac WHERE jaccard >= 0.8),
         |edges AS (SELECT a, b FROM p UNION ALL SELECT b AS a, a AS b FROM p),
         |reach(n, m) AS (
         |  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
         |  UNION
         |  SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a
         |),
         |lbl AS (SELECT n, MIN(m) AS keeper FROM reach GROUP BY n)
         |SELECT keeper, COUNT(*) AS cluster_size FROM lbl
         |GROUP BY keeper ORDER BY keeper""".stripMargin,

    // replays cosinePairsCell: same cell CTEs as dedup_semantic, the
    // pair list instead of the min-by-a keeper aggregate
    "dedup_embed_cosine" ->
      s"""WITH $cellPairCte
         |SELECT a, b, ROUND(sim, 6) AS cos_sim FROM q ORDER BY a, b""".stripMargin,

    "ann_bruteforce" ->
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < 10),
         |c AS (SELECT vec_id AS n_id, embedding AS ne FROM embeddings),
         |scored AS (SELECT q_id, n_id, ${cosExpr("qe", "ne")} AS sim FROM q JOIN c ON q_id <> n_id),
         |r AS (SELECT q_id, n_id, sim, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank FROM scored)
         |SELECT q_id, n_id, ROUND(sim, 6) AS sim, rank FROM r WHERE rank <= 5
         |ORDER BY q_id, rank""".stripMargin,

    "text_langid" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ws FROM documents),
        |sc AS (SELECT doc_id,
        |  len(list_filter(ws, x -> x IN ('der','die','das','und','ist'))) AS sc_de,
        |  len(list_filter(ws, x -> x IN ('the','a','is','and','of'))) AS sc_en,
        |  len(list_filter(ws, x -> x IN ('el','la','los','y','es'))) AS sc_es,
        |  len(list_filter(ws, x -> x IN ('le','les','des','et','est'))) AS sc_fr,
        |  len(list_filter(ws, x -> x IN ('de','shi','he','zai','le'))) AS sc_zh
        |  FROM t),
        |b AS (SELECT doc_id, sc_de, sc_en, sc_es, sc_fr, sc_zh,
        |  greatest(sc_de, sc_en, sc_es, sc_fr, sc_zh) AS best FROM sc)
        |SELECT doc_id,
        |  CASE WHEN best = 0 THEN 'und'
        |       WHEN sc_de = best THEN 'de'
        |       WHEN sc_en = best THEN 'en'
        |       WHEN sc_es = best THEN 'es'
        |       WHEN sc_fr = best THEN 'fr'
        |       ELSE 'zh' END AS pred_lang
        |FROM b ORDER BY doc_id""".stripMargin,

    "text_quality" ->
      """WITH t AS (SELECT doc_id, text,
        |  list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ws FROM documents)
        |SELECT doc_id,
        |  ROUND(0.4 * least(1.0, CAST(len(ws) AS DOUBLE) / 50.0)
        |      + 0.3 * (CAST(len(list_distinct(ws)) AS DOUBLE) / CAST(len(ws) AS DOUBLE))
        |      + 0.3 * (CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE) / length(text)), 6) AS quality
        |FROM t ORDER BY doc_id""".stripMargin,

    "text_tokens" ->
      """SELECT doc_id,
        |  CASE WHEN length(trim(text)) = 0 THEN 0
        |       ELSE len(string_split_regex(trim(text), '\s+')) END AS n_ws_tokens,
        |  len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\s]')) AS n_bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "pipeline_pack" ->
      """WITH t AS (SELECT doc_id, doc_id % 4 AS shard,
        |  CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |            ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (SELECT doc_id, shard, n_tokens,
        |  SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM t)
        |SELECT doc_id, shard, n_tokens,
        |  CAST(FLOOR((cum - n_tokens) / 2048.0) AS BIGINT) AS pack_id
        |FROM c ORDER BY doc_id""".stripMargin,

    "text_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ''),
        |                     c -> CAST(ord(c) AS BIGINT))),
        |    (a, b) -> (a * 31 + b) % 1000000007) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,

    // replays the SimHash pipeline exactly: poly-hash per token, 64
    // sign sums, banded candidate pairs, Hamming verify — the engine's
    // arithmetic was designed to be 64-bit-SQL-expressible for this
    "dedup_simhash" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ws FROM documents),
        |shs AS (SELECT doc_id, list_distinct(list_transform(range(1, len(ws) - 1), i -> ws[i]||' '||ws[i+1]||' '||ws[i+2])) AS fs
        |        FROM w WHERE len(ws) >= 3),
        |t AS (SELECT doc_id, unnest(fs) AS tok FROM shs),
        |th AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT),
        |         list_transform(string_split(tok, ''), c -> CAST(ord(c) AS BIGINT))),
        |         (a, b) -> (a * 31 + b) % 1000000007) AS h FROM t),
        |bits AS (SELECT doc_id, b,
        |           SUM(CASE WHEN (h * (2*b + 3) + b) % 1000000007 > 500000003 THEN 1 ELSE -1 END) AS sgn
        |         FROM th CROSS JOIN (SELECT unnest(range(0, 64)) AS b) bb GROUP BY doc_id, b),
        |sh AS (SELECT doc_id, CAST(SUM(CASE WHEN sgn > 0 THEN
        |           CASE WHEN b = 63 THEN -9223372036854775807 - 1
        |                ELSE (CAST(1 AS BIGINT) << CAST(b AS INTEGER)) END
        |         ELSE 0 END) AS BIGINT) AS simhash
        |       FROM bits GROUP BY doc_id),
        |bands AS (SELECT doc_id, CAST(b // 16 AS INTEGER) AS band,
        |            CAST(SUM(CASE WHEN sgn > 0 THEN (CAST(1 AS BIGINT) << CAST(b % 16 AS INTEGER)) ELSE 0 END) AS BIGINT) AS bk
        |          FROM bits GROUP BY doc_id, b // 16),
        |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
        |         FROM bands x JOIN bands y ON x.band = y.band AND x.bk = y.bk AND x.doc_id < y.doc_id)
        |SELECT a, b, CAST(bit_count(xor(sa.simhash, sb.simhash)) AS INTEGER) AS hamming
        |FROM cand JOIN sh sa ON cand.a = sa.doc_id JOIN sh sb ON cand.b = sb.doc_id
        |WHERE bit_count(xor(sa.simhash, sb.simhash)) <= 3
        |ORDER BY a, b""".stripMargin,

    // replays the LSH bucketer: integer-derived hyperplanes, sequential
    // double fold per plane (list_sum order == the codegen kernel's)
    "ann_lsh" ->
      s"""WITH pb AS (
         |  SELECT vec_id, p,
         |    list_sum(list_transform(range(1, 65),
         |      i -> CAST(embedding[i] AS DOUBLE) *
         |           (CAST((p*1299721 + (i-1)*104729 + p*(i-1)*7919) % 1000003 AS DOUBLE) / 1000003.0 - 0.5))) AS proj
         |  FROM embeddings CROSS JOIN (SELECT unnest(range(0, 6)) AS p) pp),
         |bk AS (SELECT vec_id, CAST(SUM(CASE WHEN proj > 0 THEN (CAST(1 AS BIGINT) << CAST(p AS INTEGER)) ELSE 0 END) AS BIGINT) AS bucket
         |       FROM pb GROUP BY vec_id),
         |q AS (SELECT e.vec_id AS q_id, e.embedding AS qe, bk.bucket AS qb
         |      FROM embeddings e JOIN bk ON e.vec_id = bk.vec_id WHERE e.vec_id < 10),
         |c AS (SELECT e.vec_id AS n_id, e.embedding AS ne, bk.bucket AS nb
         |      FROM embeddings e JOIN bk ON e.vec_id = bk.vec_id),
         |scored AS (SELECT q_id, n_id, ${cosExpr("qe", "ne")} AS sim
         |           FROM q JOIN c ON qb = nb AND q_id <> n_id),
         |r AS (SELECT q_id, n_id, sim, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank FROM scored)
         |SELECT q_id, n_id, ROUND(sim, 6) AS sim, rank FROM r WHERE rank <= 3
         |ORDER BY q_id, rank""".stripMargin,

    "ann_ivf" ->
      s"""WITH cand AS (
         |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 64 = 0),
         |th AS (SELECT CAST((COUNT(*) + 4095) // 4096 AS BIGINT) AS t FROM cand),
         |cents AS (
         |  SELECT vec_id AS c_id, embedding AS ce FROM cand, th
         |  WHERE (vec_id % 2147483648 * 2654435761 % 1000003) % t = 0),
         |fan AS (
         |  SELECT e.vec_id AS n_id, e.embedding AS ne, c.c_id,
         |    ${cosExpr("e.embedding", "c.ce")} AS csim
         |  FROM embeddings e CROSS JOIN cents c),
         |cells AS (
         |  SELECT n_id, ne, c_id AS cell FROM (
         |    SELECT n_id, ne, c_id,
         |      ROW_NUMBER() OVER (PARTITION BY n_id ORDER BY csim DESC, c_id DESC) AS rn
         |    FROM fan) WHERE rn = 1),
         |probes AS (
         |  SELECT n_id AS q_id, ne AS qe, c_id AS cell FROM (
         |    SELECT n_id, ne, c_id,
         |      ROW_NUMBER() OVER (PARTITION BY n_id ORDER BY csim DESC, c_id DESC) AS rn
         |    FROM fan WHERE n_id < 10) WHERE rn <= 4),
         |scored AS (
         |  SELECT q_id, n_id, ${cosExpr("qe", "ne")} AS sim
         |  FROM probes JOIN cells USING (cell) WHERE q_id <> n_id),
         |r AS (SELECT q_id, n_id, sim,
         |        ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank
         |      FROM scored)
         |SELECT q_id, n_id, ROUND(sim, 6) AS sim, rank FROM r WHERE rank <= 5
         |ORDER BY q_id, rank""".stripMargin,

    "mm_features" ->
      """WITH c AS (SELECT doc_id,
        |  list_transform(string_split(text, ''), ch -> CAST(ord(ch) AS BIGINT)) AS bs
        |  FROM documents)
        |SELECT doc_id,
        |  ROUND(CAST(list_sum(bs) AS DOUBLE) / len(bs), 4) AS mean_byte,
        |  CAST(len(list_distinct(bs)) AS INTEGER) AS n_distinct,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT), bs), (a, b) -> (a * 37 + b) % 1000000007) AS checksum
        |FROM c ORDER BY doc_id""".stripMargin,

    "pipeline_curate" ->
      """WITH w AS (SELECT doc_id, text, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ws FROM documents),
        |q AS (SELECT doc_id,
        |  ROUND(0.4 * least(1.0, CAST(len(ws) AS DOUBLE) / 50.0)
        |      + 0.3 * (CAST(len(list_distinct(ws)) AS DOUBLE) / CAST(len(ws) AS DOUBLE))
        |      + 0.3 * (CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE) / length(text)), 6) AS quality
        |  FROM w),
        |sc AS (SELECT doc_id,
        |  len(list_filter(ws, x -> x IN ('der','die','das','und','ist'))) AS sc_de,
        |  len(list_filter(ws, x -> x IN ('the','a','is','and','of'))) AS sc_en,
        |  len(list_filter(ws, x -> x IN ('el','la','los','y','es'))) AS sc_es,
        |  len(list_filter(ws, x -> x IN ('le','les','des','et','est'))) AS sc_fr,
        |  len(list_filter(ws, x -> x IN ('de','shi','he','zai','le'))) AS sc_zh
        |  FROM w),
        |b AS (SELECT doc_id, sc_de, sc_en, sc_es, sc_fr, sc_zh,
        |  greatest(sc_de, sc_en, sc_es, sc_fr, sc_zh) AS best FROM sc),
        |l AS (SELECT doc_id,
        |  CASE WHEN best = 0 THEN 'und'
        |       WHEN sc_de = best THEN 'de'
        |       WHEN sc_en = best THEN 'en'
        |       WHEN sc_es = best THEN 'es'
        |       WHEN sc_fr = best THEN 'fr'
        |       ELSE 'zh' END AS pred_lang
        |  FROM b),
        |t AS (SELECT doc_id, len(string_split_regex(trim(text), '\s+')) AS n_ws_tokens FROM documents),
        |k AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text)
        |SELECT k.doc_id, pred_lang, quality, n_ws_tokens
        |FROM k JOIN q USING (doc_id) JOIN l USING (doc_id) JOIN t USING (doc_id)
        |WHERE quality >= 0.45 AND pred_lang IN ('en') AND n_ws_tokens BETWEEN 20 AND 1000
        |ORDER BY doc_id""".stripMargin,

    "pipeline_sample" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ws FROM documents),
        |sc AS (SELECT doc_id,
        |  len(list_filter(ws, x -> x IN ('der','die','das','und','ist'))) AS sc_de,
        |  len(list_filter(ws, x -> x IN ('the','a','is','and','of'))) AS sc_en,
        |  len(list_filter(ws, x -> x IN ('el','la','los','y','es'))) AS sc_es,
        |  len(list_filter(ws, x -> x IN ('le','les','des','et','est'))) AS sc_fr,
        |  len(list_filter(ws, x -> x IN ('de','shi','he','zai','le'))) AS sc_zh
        |  FROM w),
        |b AS (SELECT doc_id, sc_de, sc_en, sc_es, sc_fr, sc_zh,
        |  greatest(sc_de, sc_en, sc_es, sc_fr, sc_zh) AS best FROM sc),
        |l AS (SELECT doc_id,
        |  CASE WHEN best = 0 THEN 'und'
        |       WHEN sc_de = best THEN 'de'
        |       WHEN sc_en = best THEN 'en'
        |       WHEN sc_es = best THEN 'es'
        |       WHEN sc_fr = best THEN 'fr'
        |       ELSE 'zh' END AS pred_lang
        |  FROM b),
        |r AS (SELECT doc_id, pred_lang,
        |  CASE WHEN pred_lang = 'en' THEN 500 WHEN pred_lang = 'de' THEN 100 ELSE 100 END AS rate
        |  FROM l)
        |SELECT doc_id, pred_lang FROM r
        |WHERE CAST(('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,8)) AS BIGINT) % 1000 < rate
        |ORDER BY doc_id""".stripMargin,

    "text_logprob" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ws FROM documents),
        |t AS (SELECT doc_id, unnest(ws) AS t FROM w),
        |f AS (SELECT t, COUNT(*) AS cnt FROM t GROUP BY t),
        |tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS tot FROM f)
        |SELECT doc_id, ROUND(AVG(LN(cnt / tot)), 4) AS logprob
        |FROM t JOIN f USING (t), tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "pipeline_mix" ->
      """WITH counts AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
        |w(lang, wt) AS (VALUES ('en', 0.5), ('de', 0.25), ('fr', 0.25)),
        |rates AS (SELECT counts.lang,
        |  LEAST(1000, CAST(FLOOR(1000.0 * 200 * wt / n) AS BIGINT)) AS rate
        |  FROM counts JOIN w ON counts.lang = w.lang)
        |SELECT d.doc_id, d.lang FROM documents d JOIN rates r ON d.lang = r.lang
        |WHERE CAST(('0x'||substr(md5(CAST(d.doc_id AS VARCHAR)),1,8)) AS BIGINT) % 1000 < rate
        |ORDER BY doc_id""".stripMargin,

    "pipeline_contam" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ws FROM documents),
        |g AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(ws) - 3),
        |        i -> ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3]||' '||ws[i+4]))) AS g
        |      FROM w WHERE len(ws) >= 5),
        |bg AS (SELECT DISTINCT g FROM g WHERE doc_id < 10),
        |cg AS (SELECT doc_id, g FROM g WHERE doc_id >= 10)
        |SELECT doc_id, COUNT(DISTINCT cg.g) AS n_shared
        |FROM cg JOIN bg ON cg.g = bg.g
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "mm_resize" ->
      """WITH d AS (SELECT doc_id,
        |  64 + (length(text) % 640) AS width,
        |  48 + (ord(substr(text, 1, 1)) % 480) AS height
        |  FROM documents),
        |s AS (SELECT doc_id, width, height,
        |  least(224.0 / width, 224.0 / height, 1.0) AS sc FROM d)
        |SELECT doc_id, width, height,
        |  CAST(floor(width * sc) AS INTEGER) AS r_width,
        |  CAST(floor(height * sc) AS INTEGER) AS r_height
        |FROM s ORDER BY doc_id""".stripMargin,

    "mm_framesample" ->
      """WITH f AS (SELECT doc_id, text, (length(text) + 999) // 1000 AS n_frames FROM documents),
        |idx AS (SELECT doc_id, text, CAST(i AS BIGINT) AS frame_idx
        |        FROM f CROSS JOIN (SELECT unnest(range(0, 1000)) AS i)
        |        WHERE i < n_frames AND i % 5 = 0)
        |SELECT doc_id, frame_idx,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(string_split(substr(text, 1 + CAST(frame_idx AS INTEGER) * 1000, 1000), ''),
        |                   c -> CAST(ord(c) AS BIGINT))),
        |    (a, b) -> (a * 31 + b) % 1000000007) AS frame_hash
        |FROM idx ORDER BY doc_id, frame_idx""".stripMargin,

    // PII: identical RE2-compatible patterns, identical replacement
    // order (email → phone → ip); fp replays PolyHash over codepoints
    "text_pii" ->
      """WITH r AS (SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\+[0-9]{7,15}|\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b', '<PHONE>', 'g'),
        |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g') AS red
        |  FROM documents)
        |SELECT d.doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(text, '\+[0-9]{7,15}|\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b')) AS BIGINT) AS n_phones,
        |  CAST(len(regexp_extract_all(text, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS BIGINT) AS n_ips,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(string_split(red, ''), c -> CAST(ord(c) AS BIGINT))),
        |    (a, b) -> (a * 31 + b) % 1000000007) AS redacted_fp
        |FROM documents d JOIN r USING (doc_id) ORDER BY doc_id""".stripMargin,

    "text_repetition" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ws
        |           FROM documents),
        |f AS (SELECT doc_id, unnest(ws) AS t FROM w),
        |tc AS (SELECT doc_id, t, COUNT(*) AS c FROM f GROUP BY 1, 2),
        |top AS (SELECT doc_id, MAX(c) AS mx, SUM(c) AS n FROM tc GROUP BY 1),
        |g AS (SELECT doc_id,
        |        CASE WHEN len(ws) < 2 THEN 0.0
        |             ELSE 1.0 - CAST(len(list_distinct(list_transform(range(1, len(ws)),
        |                    i -> ws[i]||' '||ws[i+1]))) AS DOUBLE) / (len(ws) - 1) END AS dupg
        |      FROM w WHERE len(ws) > 0)
        |SELECT doc_id, ROUND(CAST(mx AS DOUBLE) / n, 6) AS top_word_frac,
        |       ROUND(dupg, 6) AS dup_2gram_frac
        |FROM top JOIN g USING (doc_id) ORDER BY doc_id""".stripMargin,

    // + 0.0 normalizes IEEE -0.0 (an all-one-char doc) to +0.0, the
    // engine's sign
    "text_entropy" ->
      """WITH c AS (SELECT doc_id, string_split(lower(text), '') AS cs FROM documents),
        |u AS (SELECT doc_id, unnest(cs) AS ch FROM c),
        |cc AS (SELECT doc_id, ch, COUNT(*) AS n FROM u GROUP BY 1, 2),
        |t AS (SELECT doc_id, SUM(n) AS tot FROM cc GROUP BY 1),
        |e AS (SELECT cc.doc_id,
        |        -SUM((CAST(n AS DOUBLE) / tot) * LN(CAST(n AS DOUBLE) / tot)) AS h
        |      FROM cc JOIN t USING (doc_id) GROUP BY cc.doc_id)
        |SELECT d.doc_id, ROUND(COALESCE(e.h, 0.0) + 0.0, 4) AS char_entropy
        |FROM documents d LEFT JOIN e USING (doc_id) ORDER BY doc_id""".stripMargin,

    "pipeline_chunk" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ws
        |           FROM documents),
        |idx AS (SELECT doc_id, ws, unnest(range(0, ((len(ws) - 1) // 48) + 1)) AS k
        |        FROM w WHERE len(ws) > 0),
        |ch AS (SELECT doc_id, k AS chunk_idx,
        |         list_slice(ws, k * 48 + 1, k * 48 + 64) AS cw FROM idx)
        |SELECT doc_id, chunk_idx, CAST(len(cw) AS BIGINT) AS n_tokens,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(string_split(array_to_string(cw, ' '), ''), c -> CAST(ord(c) AS BIGINT))),
        |    (a, b) -> (a * 31 + b) % 1000000007) AS chunk_fp
        |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin,

    // replays kmeansAssign: seed argmax (ties → larger c_id), per-dim
    // double means, reassignment against the updated book
    "pipeline_kmeans" ->
      s"""WITH cand AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 64 = 0),
         |th AS (SELECT CAST((COUNT(*) + 4095) // 4096 AS BIGINT) AS t FROM cand),
         |seeds AS (SELECT vec_id AS c_id, embedding AS ce FROM cand, th
         |          WHERE (vec_id % 2147483648 * 2654435761 % 1000003) % t = 0),
         |fan AS (SELECT e.vec_id, e.embedding, c.c_id,
         |          ${cosExpr("e.embedding", "c.ce")} AS csim
         |        FROM embeddings e CROSS JOIN seeds c),
         |assign0 AS (SELECT vec_id, embedding, c_id AS cluster FROM (
         |  SELECT vec_id, embedding, c_id,
         |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, c_id DESC) AS rn
         |  FROM fan) WHERE rn = 1),
         |m AS (SELECT cluster, i, AVG(CAST(embedding[i] AS DOUBLE)) AS mv
         |      FROM assign0 CROSS JOIN (SELECT unnest(range(1, 65)) AS i) GROUP BY cluster, i),
         |mc AS (SELECT cluster AS c_id, list(mv ORDER BY i) AS ce FROM m GROUP BY cluster),
         |fan2 AS (SELECT e.vec_id, c.c_id,
         |  (list_sum(list_transform(range(1, 65), i -> CAST(e.embedding[i] AS DOUBLE) * c.ce[i]))
         |   / (sqrt(list_sum(list_transform(range(1, 65), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))
         |     * sqrt(list_sum(list_transform(range(1, 65), i -> c.ce[i] * c.ce[i]))))) AS sim
         |  FROM embeddings e CROSS JOIN mc c)
         |SELECT vec_id, c_id AS cluster, ROUND(sim, 6) AS sim FROM (
         |  SELECT vec_id, c_id, sim,
         |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, c_id DESC) AS rn
         |  FROM fan2) WHERE rn = 1
         |ORDER BY vec_id""".stripMargin,

    "mm_decode" ->
      """SELECT doc_id,
        |  64 + (length(text) % 640) AS width,
        |  48 + (ord(substr(text, 1, 1)) % 480) AS height,
        |  CAST(length(text) AS BIGINT) AS n_bytes,
        |  'fake/raw' AS format
        |FROM documents ORDER BY doc_id""".stripMargin,

    "dedup_substring" ->
      s"""WITH $winCte,
         |e AS (SELECT doc_id, unnest(wins) AS win FROM win),
         |df AS (SELECT win, COUNT(*) AS wdf FROM e GROUP BY win),
         |dup AS (SELECT doc_id, COUNT(*) AS n_dup FROM e JOIN df USING (win) WHERE wdf > 1 GROUP BY doc_id)
         |SELECT w2.doc_id, CAST(len(w2.wins) AS BIGINT) AS n_windows,
         |  CAST(coalesce(n_dup, 0) AS BIGINT) AS n_dup_windows,
         |  CASE WHEN len(w2.wins) = 0 THEN 0.0
         |       ELSE ROUND(CAST(coalesce(n_dup, 0) AS DOUBLE) / len(w2.wins), 6) END AS dup_frac
         |FROM win w2 LEFT JOIN dup ON w2.doc_id = dup.doc_id
         |ORDER BY w2.doc_id""".stripMargin,

    "dedup_incremental" ->
      s"""WITH $winCte,
         |ne AS (SELECT doc_id, unnest(wins) AS win FROM win WHERE doc_id >= 250),
         |pw AS (SELECT DISTINCT win FROM (SELECT unnest(wins) AS win FROM win WHERE doc_id < 250)),
         |sh AS (SELECT doc_id, COUNT(*) AS n_shared FROM ne JOIN pw USING (win) GROUP BY doc_id)
         |SELECT w2.doc_id, CAST(coalesce(n_shared, 0) AS BIGINT) AS n_shared,
         |  coalesce(n_shared, 0) > 0 AS is_dup
         |FROM win w2 LEFT JOIN sh ON w2.doc_id = sh.doc_id
         |WHERE w2.doc_id >= 250 ORDER BY w2.doc_id""".stripMargin,

    // replays semanticDedup: the shared cell CTEs, keep the smallest
    // qualifying cluster-mate per pruned vector
    "dedup_semantic" ->
      s"""WITH $cellPairCte
         |SELECT b AS vec_id, a AS dup_of, ROUND(sim, 6) AS cos_sim FROM (
         |  SELECT a, b, sim, ROW_NUMBER() OVER (PARTITION BY b ORDER BY a) AS rn FROM q) WHERE rn = 1
         |ORDER BY vec_id""".stripMargin,

    "text_classify" ->
      s"""WITH t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ws FROM documents),
         |m AS (SELECT doc_id, coalesce(list_sum(list_transform(ws,
         |  tok -> CAST(${polyhashSql("tok")} % 1024 * 2654435761 % 1000003 AS DOUBLE) / 1000003.0 - 0.5)), 0.0) AS margin
         |  FROM t)
         |SELECT doc_id, ROUND(margin, 6) AS margin, margin > 0 AS label
         |FROM m ORDER BY doc_id""".stripMargin,

    "pipeline_shard" ->
      s"""WITH k AS (SELECT doc_id, ${polyhashSql("CAST(doc_id AS VARCHAR)||':42'")} AS skey FROM documents)
         |SELECT doc_id, skey % 8 AS shard,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY skey % 8 ORDER BY skey, doc_id) AS BIGINT) AS pos
         |FROM k ORDER BY doc_id""".stripMargin,

    // replays the streaming near-dup gate in batch: same simhash CTEs
    // as dedup_simhash; is_dup ⇔ ∃ smaller-id doc within Hamming 3
    // (order by doc_id, not arrival — the batching-invariance contract)
    "stream_neardup" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ws FROM documents),
        |shs AS (SELECT doc_id, list_distinct(list_transform(range(1, len(ws) - 1), i -> ws[i]||' '||ws[i+1]||' '||ws[i+2])) AS fs
        |        FROM w WHERE len(ws) >= 3),
        |t AS (SELECT doc_id, unnest(fs) AS tok FROM shs),
        |th AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT),
        |         list_transform(string_split(tok, ''), c -> CAST(ord(c) AS BIGINT))),
        |         (a, b) -> (a * 31 + b) % 1000000007) AS h FROM t),
        |bits AS (SELECT doc_id, b,
        |           SUM(CASE WHEN (h * (2*b + 3) + b) % 1000000007 > 500000003 THEN 1 ELSE -1 END) AS sgn
        |         FROM th CROSS JOIN (SELECT unnest(range(0, 64)) AS b) bb GROUP BY doc_id, b),
        |sh AS (SELECT doc_id, CAST(SUM(CASE WHEN sgn > 0 THEN
        |           CASE WHEN b = 63 THEN -9223372036854775807 - 1
        |                ELSE (CAST(1 AS BIGINT) << CAST(b AS INTEGER)) END
        |         ELSE 0 END) AS BIGINT) AS simhash
        |       FROM bits GROUP BY doc_id),
        |dups AS (SELECT DISTINCT y.doc_id
        |         FROM sh x JOIN sh y ON x.doc_id < y.doc_id
        |           AND bit_count(xor(x.simhash, y.simhash)) <= 3)
        |SELECT sh.doc_id, sh.doc_id IN (SELECT doc_id FROM dups) AS is_dup
        |FROM sh ORDER BY doc_id""".stripMargin,

    // replays the TTL-windowed streaming gate: same simhash CTEs, dup
    // scoped to earlier docs within the 500-id event-time horizon
    "stream_neardup_ttl" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ws FROM documents),
        |shs AS (SELECT doc_id, list_distinct(list_transform(range(1, len(ws) - 1), i -> ws[i]||' '||ws[i+1]||' '||ws[i+2])) AS fs
        |        FROM w WHERE len(ws) >= 3),
        |t AS (SELECT doc_id, unnest(fs) AS tok FROM shs),
        |th AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT),
        |         list_transform(string_split(tok, ''), c -> CAST(ord(c) AS BIGINT))),
        |         (a, b) -> (a * 31 + b) % 1000000007) AS h FROM t),
        |bits AS (SELECT doc_id, b,
        |           SUM(CASE WHEN (h * (2*b + 3) + b) % 1000000007 > 500000003 THEN 1 ELSE -1 END) AS sgn
        |         FROM th CROSS JOIN (SELECT unnest(range(0, 64)) AS b) bb GROUP BY doc_id, b),
        |sh AS (SELECT doc_id, CAST(SUM(CASE WHEN sgn > 0 THEN
        |           CASE WHEN b = 63 THEN -9223372036854775807 - 1
        |                ELSE (CAST(1 AS BIGINT) << CAST(b AS INTEGER)) END
        |         ELSE 0 END) AS BIGINT) AS simhash
        |       FROM bits GROUP BY doc_id),
        |dups AS (SELECT DISTINCT y.doc_id
        |         FROM sh x JOIN sh y ON x.doc_id < y.doc_id
        |           AND y.doc_id - x.doc_id <= 500
        |           AND bit_count(xor(x.simhash, y.simhash)) <= 3)
        |SELECT sh.doc_id, sh.doc_id IN (SELECT doc_id FROM dups) AS is_dup
        |FROM sh ORDER BY doc_id""".stripMargin,

    // the archive-fold run must reproduce the full-history verdicts:
    // identical oracle to stream_neardup (horizon-window ∪ stale sweep)
    "stream_neardup_archive" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ws FROM documents),
        |shs AS (SELECT doc_id, list_distinct(list_transform(range(1, len(ws) - 1), i -> ws[i]||' '||ws[i+1]||' '||ws[i+2])) AS fs
        |        FROM w WHERE len(ws) >= 3),
        |t AS (SELECT doc_id, unnest(fs) AS tok FROM shs),
        |th AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT),
        |         list_transform(string_split(tok, ''), c -> CAST(ord(c) AS BIGINT))),
        |         (a, b) -> (a * 31 + b) % 1000000007) AS h FROM t),
        |bits AS (SELECT doc_id, b,
        |           SUM(CASE WHEN (h * (2*b + 3) + b) % 1000000007 > 500000003 THEN 1 ELSE -1 END) AS sgn
        |         FROM th CROSS JOIN (SELECT unnest(range(0, 64)) AS b) bb GROUP BY doc_id, b),
        |sh AS (SELECT doc_id, CAST(SUM(CASE WHEN sgn > 0 THEN
        |           CASE WHEN b = 63 THEN -9223372036854775807 - 1
        |                ELSE (CAST(1 AS BIGINT) << CAST(b AS INTEGER)) END
        |         ELSE 0 END) AS BIGINT) AS simhash
        |       FROM bits GROUP BY doc_id),
        |dups AS (SELECT DISTINCT y.doc_id
        |         FROM sh x JOIN sh y ON x.doc_id < y.doc_id
        |           AND bit_count(xor(x.simhash, y.simhash)) <= 3)
        |SELECT sh.doc_id, sh.doc_id IN (SELECT doc_id FROM dups) AS is_dup
        |FROM sh ORDER BY doc_id""".stripMargin,

    // replays dsirWeights: 256-bucket hashed-unigram profiles with
    // add-1 smoothing; target = sources 0-3; weight = Σ ln(pt/pr)
    "pipeline_dsir" ->
      s"""WITH w AS (SELECT doc_id, source IN ('src0','src1','src2','src3') AS tgt,
         |            list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ws FROM documents),
         |tok AS (SELECT doc_id, tgt, unnest(ws) AS t FROM w),
         |bk AS (SELECT doc_id, tgt, ${polyhashSql("t")} % 256 AS b FROM tok),
         |prof AS (SELECT b, CAST(SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS DOUBLE) AS tc,
         |           CAST(COUNT(*) AS DOUBLE) AS rc FROM bk GROUP BY b),
         |tot AS (SELECT SUM(tc) AS tt, SUM(rc) AS rt FROM prof),
         |lr AS (SELECT b, ln((tc + 1.0) / (tt + 256.0)) - ln((rc + 1.0) / (rt + 256.0)) AS lr
         |       FROM prof CROSS JOIN tot),
         |sc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens, SUM(lr.lr) AS raw_w
         |       FROM bk JOIN lr ON bk.b = lr.b GROUP BY doc_id)
         |SELECT doc_id, n_tokens, ROUND(raw_w, 4) + 0.0 AS dsir_weight FROM sc ORDER BY doc_id""".stripMargin,

    // replays bpePairCounts: frequency-weighted distinct-word table →
    // adjacent char-pair occurrence counts → (cnt desc, pair) rank
    "tokenize_bpe" ->
      """WITH w AS (SELECT list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ws FROM documents),
        |v AS (SELECT unnest(ws) AS wd FROM w),
        |vc AS (SELECT wd, COUNT(*) AS f FROM v GROUP BY wd),
        |p AS (SELECT unnest(list_transform(range(1, len(wd)), i -> substr(wd, CAST(i AS INTEGER), 2))) AS pair, f
        |      FROM vc WHERE len(wd) >= 2),
        |a AS (SELECT pair, CAST(SUM(f) AS BIGINT) AS cnt FROM p GROUP BY pair),
        |r AS (SELECT pair, cnt, CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, pair) AS BIGINT) AS rank FROM a)
        |SELECT pair, cnt, rank FROM r WHERE rank <= 50 ORDER BY rank""".stripMargin,

    // replays randomProject: implicit Knuth-hash ±1 sign matrix,
    // d-ascending float→double dot, 1/√16 scale; argmax first-max
    "emb_project" ->
      """WITH dims AS (SELECT unnest(range(0, 16)) AS j),
        |y AS (SELECT vec_id, j,
        |        list_sum(list_transform(range(1, 65), d ->
        |          CAST(embedding[d] AS DOUBLE) *
        |          (CASE WHEN (((j*64 + (d-1)) * 2654435761) % 1000003) % 2 = 0 THEN 1.0 ELSE -1.0 END)))
        |        / sqrt(16.0) AS yj
        |      FROM embeddings CROSS JOIN dims WHERE len(embedding) > 0),
        |agg AS (SELECT vec_id, ROUND(sqrt(SUM(yj*yj)), 4) AS p_norm,
        |          ROUND(SUM((j+1)*yj), 4) + 0.0 AS p_checksum FROM y GROUP BY vec_id),
        |am AS (SELECT vec_id, CAST(j AS BIGINT) AS p_argmax FROM y
        |       QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY yj DESC, j) = 1)
        |SELECT vec_id, p_norm, p_argmax, p_checksum FROM agg JOIN am USING (vec_id) ORDER BY vec_id""".stripMargin,

    // replays winnow: 5-gram polyhashes over normalized text, each
    // 4-window keeps its rightmost minimum (list_reverse+position),
    // DISTINCT collapses re-selections — integer-exact
    "text_winnow" ->
      s"""WITH g AS (SELECT doc_id, regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g') AS s FROM documents),
         |h AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
         |        ${polyhashSql("substr(s, CAST(i AS INTEGER), 5)")} AS hv
         |      FROM g, unnest(range(1, len(s) - 3)) AS t(i) WHERE len(s) >= 5),
         |hl AS (SELECT doc_id, list(hv ORDER BY pos) AS l FROM h GROUP BY doc_id),
         |wins AS (SELECT doc_id, l, unnest(range(1, greatest(1, len(l) - 3) + 1)) AS j FROM hl),
         |sel AS (SELECT doc_id,
         |          CAST(j + len(l[j:j+3]) - list_position(list_reverse(l[j:j+3]), list_min(l[j:j+3])) AS BIGINT) AS pos,
         |          list_min(l[j:j+3]) AS fp
         |        FROM wins)
         |SELECT DISTINCT doc_id, pos, fp FROM sel ORDER BY doc_id, pos""".stripMargin,

    // replays cmsBuild + cmsEstimate: 4 hash rows × 256 buckets,
    // row-salted polyhash, min-over-rows point query
    "sketch_cms" ->
      s"""WITH t AS (SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS tok FROM documents),
         |ex AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_exact FROM t GROUP BY tok),
         |top AS (SELECT tok, n_exact FROM ex ORDER BY n_exact DESC, tok LIMIT 20),
         |rows_ AS (SELECT unnest(range(0, 4)) AS r),
         |sk AS (SELECT r, ${polyhashSql("CAST(r AS VARCHAR)||':'||tok")} % 256 AS bucket,
         |         CAST(COUNT(*) AS BIGINT) AS cnt
         |       FROM t CROSS JOIN rows_ GROUP BY 1, 2),
         |q AS (SELECT top.tok, top.n_exact, r,
         |        ${polyhashSql("CAST(r AS VARCHAR)||':'||tok")} % 256 AS bucket
         |      FROM top CROSS JOIN rows_),
         |est AS (SELECT q.tok, q.n_exact, MIN(coalesce(sk.cnt, 0)) AS cms_est
         |        FROM q LEFT JOIN sk ON q.r = sk.r AND q.bucket = sk.bucket GROUP BY 1, 2)
         |SELECT tok AS token, n_exact, cms_est FROM est ORDER BY token""".stripMargin,

    // replays the composed pipeline: curate gates ∘ dsir gate ∘ shard
    "pipeline_end2end" ->
      s"""WITH w AS (SELECT doc_id, text, source, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ws FROM documents),
         |q AS (SELECT doc_id,
         |  ROUND(0.4 * least(1.0, CAST(len(ws) AS DOUBLE) / 50.0)
         |      + 0.3 * (CAST(len(list_distinct(ws)) AS DOUBLE) / CAST(len(ws) AS DOUBLE))
         |      + 0.3 * (CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE) / length(text)), 6) AS quality
         |  FROM w),
         |sc AS (SELECT doc_id,
         |  len(list_filter(ws, x -> x IN ('der','die','das','und','ist'))) AS sc_de,
         |  len(list_filter(ws, x -> x IN ('the','a','is','and','of'))) AS sc_en,
         |  len(list_filter(ws, x -> x IN ('el','la','los','y','es'))) AS sc_es,
         |  len(list_filter(ws, x -> x IN ('le','les','des','et','est'))) AS sc_fr,
         |  len(list_filter(ws, x -> x IN ('de','shi','he','zai','le'))) AS sc_zh
         |  FROM w),
         |b AS (SELECT doc_id, sc_de, sc_en, sc_es, sc_fr, sc_zh,
         |  greatest(sc_de, sc_en, sc_es, sc_fr, sc_zh) AS best FROM sc),
         |l AS (SELECT doc_id,
         |  CASE WHEN best = 0 THEN 'und'
         |       WHEN sc_de = best THEN 'de'
         |       WHEN sc_en = best THEN 'en'
         |       WHEN sc_es = best THEN 'es'
         |       WHEN sc_fr = best THEN 'fr'
         |       ELSE 'zh' END AS pred_lang
         |  FROM b),
         |t AS (SELECT doc_id, len(string_split_regex(trim(text), '\\s+')) AS n_ws_tokens FROM documents),
         |keep AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text),
         |tok AS (SELECT doc_id, source IN ('src0','src1','src2','src3') AS tgt, unnest(ws) AS t FROM w),
         |bk AS (SELECT doc_id, tgt, ${polyhashSql("t")} % 256 AS b FROM tok),
         |prof AS (SELECT b, CAST(SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS DOUBLE) AS tc,
         |           CAST(COUNT(*) AS DOUBLE) AS rc FROM bk GROUP BY b),
         |tot AS (SELECT SUM(tc) AS tt, SUM(rc) AS rt FROM prof),
         |lr AS (SELECT b, ln((tc + 1.0) / (tt + 256.0)) - ln((rc + 1.0) / (rt + 256.0)) AS lr
         |       FROM prof CROSS JOIN tot),
         |ds AS (SELECT doc_id, ROUND(SUM(lr.lr), 4) + 0.0 AS dsir_weight
         |       FROM bk JOIN lr ON bk.b = lr.b GROUP BY doc_id),
         |kept AS (SELECT keep.doc_id, pred_lang, quality, n_ws_tokens, dsir_weight
         |         FROM keep JOIN q USING (doc_id) JOIN l USING (doc_id) JOIN t USING (doc_id) JOIN ds USING (doc_id)
         |         WHERE quality >= 0.45 AND pred_lang IN ('en')
         |           AND n_ws_tokens BETWEEN 20 AND 1000 AND dsir_weight > -1.7),
         |sh AS (SELECT doc_id, ${polyhashSql("CAST(doc_id AS VARCHAR)||':42'")} AS skey FROM kept)
         |SELECT kept.doc_id, pred_lang, quality, n_ws_tokens, dsir_weight,
         |  skey % 8 AS shard,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY skey % 8 ORDER BY skey, kept.doc_id) AS BIGINT) AS pos
         |FROM kept JOIN sh ON kept.doc_id = sh.doc_id ORDER BY kept.doc_id""".stripMargin,

    // replays bpeSecondRound: round-1 top merge via QUALIFY, replace()
    // application (identical left-to-right non-overlap semantics),
    // round-2 pair rank
    "tokenize_bpe2" ->
      """WITH w AS (SELECT list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ws FROM documents),
        |v AS (SELECT unnest(ws) AS wd FROM w),
        |vc AS (SELECT wd, COUNT(*) AS f FROM v GROUP BY wd),
        |p1 AS (SELECT pair, SUM(f) AS cnt FROM (
        |         SELECT unnest(list_transform(range(1, len(wd)), i -> substr(wd, CAST(i AS INTEGER), 2))) AS pair, f
        |         FROM vc WHERE len(wd) >= 2) GROUP BY pair),
        |m1 AS (SELECT pair AS merge1 FROM p1 QUALIFY ROW_NUMBER() OVER (ORDER BY cnt DESC, pair) = 1),
        |v2 AS (SELECT merge1, f, replace(wd, merge1, '#') AS w2 FROM vc CROSS JOIN m1),
        |p2 AS (SELECT merge1, pair, CAST(SUM(f) AS BIGINT) AS cnt FROM (
        |         SELECT merge1, unnest(list_transform(range(1, len(w2)), i -> substr(w2, CAST(i AS INTEGER), 2))) AS pair, f
        |         FROM v2 WHERE len(w2) >= 2) GROUP BY merge1, pair),
        |r AS (SELECT merge1, pair, cnt,
        |        CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, pair) AS BIGINT) AS rank FROM p2)
        |SELECT merge1, pair, cnt, rank FROM r WHERE rank <= 50 ORDER BY rank""".stripMargin,

    // replays mipsTopK: raw dot products, (ip desc, n_id) rank
    "ann_mips" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS n_id, embedding AS ne FROM embeddings),
        |scored AS (SELECT q_id, n_id,
        |    list_sum(list_transform(range(1, 65), i -> CAST(qe[i] AS DOUBLE) * CAST(ne[i] AS DOUBLE))) AS ip
        |  FROM q JOIN c ON q_id <> n_id),
        |r AS (SELECT q_id, n_id, ip, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY ip DESC, n_id) AS rank FROM scored)
        |SELECT q_id, n_id, ROUND(ip, 6) AS ip, rank FROM r WHERE rank <= 5
        |ORDER BY q_id, rank""".stripMargin,

    // replays spanCorruption: stride-10/len-3 full spans, mask_k
    // sentinels, corrupted+targets polyhash fingerprints
    "pipeline_spans" ->
      s"""WITH w AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ws FROM documents),
         |d AS (SELECT doc_id, ws, len(ws) AS n FROM w WHERE len(ws) >= 1),
         |c AS (SELECT doc_id, n,
         |  array_to_string(list_filter(list_transform(range(1, n + 1), q ->
         |    CASE WHEN (q-1) % 10 = 0 AND q + 2 <= n THEN 'mask_'||CAST((q-1)//10 AS VARCHAR)
         |         WHEN (q-1) % 10 < 3 AND (q-1) - ((q-1) % 10) + 3 <= n THEN ''
         |         ELSE ws[q] END), x -> x <> ''), ' ') AS corrupted,
         |  array_to_string(list_transform(list_filter(range(1, n + 1), q -> (q-1) % 10 = 0 AND q + 2 <= n),
         |    q -> 'mask_'||CAST((q-1)//10 AS VARCHAR)||' '||ws[q]||' '||ws[q+1]||' '||ws[q+2]), ' ') AS targets,
         |  len(list_filter(range(1, n + 1), q -> (q-1) % 10 = 0 AND q + 2 <= n)) AS n_spans
         | FROM d)
         |SELECT doc_id, CAST(n_spans AS BIGINT) AS n_spans,
         |  CAST(n_spans * 3 AS BIGINT) AS n_masked,
         |  CASE WHEN corrupted = '' THEN 0 ELSE ${polyhashSql("corrupted")} END AS corrupted_fp,
         |  CASE WHEN targets = '' THEN 0 ELSE ${polyhashSql("targets")} END AS targets_fp
         |FROM c ORDER BY doc_id""".stripMargin,

    // replays bigramLmScore: add-1 smoothed p(w2|w1), mean ln per doc
    "text_ngram_lm" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ws FROM documents),
        |uni AS (SELECT unnest(ws) AS t FROM w),
        |vc AS (SELECT CAST(COUNT(DISTINCT t) AS BIGINT) AS v FROM uni),
        |uc AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS cu FROM uni GROUP BY t),
        |bg AS (SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2 FROM w, unnest(range(1, len(ws))) AS tt(i) WHERE len(ws) >= 2),
        |bc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cb FROM bg GROUP BY 1, 2)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |  ROUND(AVG(ln((bc.cb + 1.0) / (uc.cu + vc.v))), 4) AS lm_score
        |FROM bg JOIN bc USING (w1, w2) JOIN uc ON uc.t = bg.w1 CROSS JOIN vc
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // replays collocations: PMI over adjacent bigrams, ln(cab·N/(ca·cb)),
    // rank by (rounded pmi desc, bigram)
    "text_collocations" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ws FROM documents),
        |uni AS (SELECT unnest(ws) AS t FROM w),
        |n AS (SELECT COUNT(*) AS nn FROM uni),
        |uc AS (SELECT t, COUNT(*) AS c FROM uni GROUP BY t),
        |bg AS (SELECT ws[i] AS w1, ws[i+1] AS w2 FROM w, unnest(range(1, len(ws))) AS tt(i) WHERE len(ws) >= 2),
        |bc AS (SELECT w1, w2, COUNT(*) AS cab FROM bg GROUP BY 1, 2 HAVING COUNT(*) >= 5),
        |p AS (SELECT w1||' '||w2 AS bigram, CAST(cab AS BIGINT) AS n_pair,
        |        ROUND(ln(CAST(cab AS DOUBLE) * nn / (ca.c * cb.c)), 4) AS pmi
        |      FROM bc CROSS JOIN n JOIN uc ca ON ca.t = bc.w1 JOIN uc cb ON cb.t = bc.w2),
        |r AS (SELECT bigram, n_pair, pmi,
        |        CAST(ROW_NUMBER() OVER (ORDER BY pmi DESC, bigram) AS BIGINT) AS rank FROM p)
        |SELECT bigram, n_pair, pmi, rank FROM r WHERE rank <= 30 ORDER BY rank""".stripMargin,

    // the streaming CMS replays as its batch equivalent (counter merge
    // is a commutative monoid — same oracle as sketch_cms)
    "stream_cms" ->
      s"""WITH t AS (SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS tok FROM documents),
         |ex AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_exact FROM t GROUP BY tok),
         |top AS (SELECT tok, n_exact FROM ex ORDER BY n_exact DESC, tok LIMIT 20),
         |rows_ AS (SELECT unnest(range(0, 4)) AS r),
         |sk AS (SELECT r, ${polyhashSql("CAST(r AS VARCHAR)||':'||tok")} % 256 AS bucket,
         |         CAST(COUNT(*) AS BIGINT) AS cnt
         |       FROM t CROSS JOIN rows_ GROUP BY 1, 2),
         |q AS (SELECT top.tok, top.n_exact, r,
         |        ${polyhashSql("CAST(r AS VARCHAR)||':'||tok")} % 256 AS bucket
         |      FROM top CROSS JOIN rows_),
         |est AS (SELECT q.tok, q.n_exact, MIN(coalesce(sk.cnt, 0)) AS cms_est
         |        FROM q LEFT JOIN sk ON q.r = sk.r AND q.bucket = sk.bucket GROUP BY 1, 2)
         |SELECT tok AS token, n_exact, cms_est FROM est ORDER BY token""".stripMargin,

    // replays pqTopK: 16-seed codebook (ascending vec_id → code index),
    // per-subspace L2 argmin encode (ties → lower index), ADC scoring
    // summed in subspace order (list(… ORDER BY s) keeps the fold
    // sequential like the JVM kernel — bare SUM() has no order)
    "ann_pq" ->
      """WITH seeds AS (
        |  SELECT vec_id, embedding, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cix
        |  FROM embeddings WHERE vec_id % 16 = 0 ORDER BY vec_id LIMIT 16),
        |sub AS (SELECT unnest(range(0, 8)) AS s),
        |enc AS (
        |  SELECT vec_id, s, cix FROM (
        |    SELECT e.vec_id, sub.s, sd.cix,
        |      list_sum(list_transform(range(1, 9), d ->
        |        (CAST(e.embedding[sub.s * 8 + d] AS DOUBLE) - CAST(sd.embedding[sub.s * 8 + d] AS DOUBLE))
        |        * (CAST(e.embedding[sub.s * 8 + d] AS DOUBLE) - CAST(sd.embedding[sub.s * 8 + d] AS DOUBLE)))) AS d2
        |    FROM embeddings e CROSS JOIN sub CROSS JOIN seeds sd)
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d2, cix) = 1),
        |qt AS (
        |  SELECT q.vec_id AS q_id, sub.s, sd.cix,
        |    list_sum(list_transform(range(1, 9), d ->
        |      (CAST(q.embedding[sub.s * 8 + d] AS DOUBLE) - CAST(sd.embedding[sub.s * 8 + d] AS DOUBLE))
        |      * (CAST(q.embedding[sub.s * 8 + d] AS DOUBLE) - CAST(sd.embedding[sub.s * 8 + d] AS DOUBLE)))) AS d2
        |  FROM embeddings q CROSS JOIN sub CROSS JOIN seeds sd WHERE q.vec_id < 10),
        |ad AS (
        |  SELECT qt.q_id, enc.vec_id AS n_id, list_sum(list(qt.d2 ORDER BY qt.s)) AS adist
        |  FROM qt JOIN enc ON qt.s = enc.s AND qt.cix = enc.cix
        |  WHERE qt.q_id <> enc.vec_id GROUP BY 1, 2)
        |SELECT q_id, n_id, ROUND(adist, 6) AS adist, rank FROM (
        |  SELECT q_id, n_id, adist,
        |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adist, n_id) AS rank
        |  FROM ad) WHERE rank <= 5
        |ORDER BY q_id, rank""".stripMargin,

    "emb_quantize" ->
      """WITH m AS (SELECT vec_id, embedding,
        |  list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127 AS scale FROM embeddings)
        |SELECT vec_id, ROUND(scale, 6) AS qscale,
        |  CAST(CASE WHEN scale = 0 THEN 0 ELSE list_sum(list_transform(range(1, 65),
        |    i -> greatest(-127, least(127, floor(CAST(embedding[i] AS DOUBLE) / scale + 0.5))) * i)) END AS BIGINT) AS q_checksum,
        |  CASE WHEN scale = 0 THEN CAST(0 AS BIGINT) ELSE len(list_filter(range(1, 65),
        |    i -> abs(greatest(-127, least(127, floor(CAST(embedding[i] AS DOUBLE) / scale + 0.5)))) = 127)) END AS n_sat
        |FROM m ORDER BY vec_id""".stripMargin,

    // Gopher rules: same counters, same integer cross-multiplied
    // decisions; whitespace class spelled out (Java \s ≠ RE2 \s on
    // \x0B), line trimming strips exactly space/tab in both engines
    "text_gopher" ->
      """WITH base AS (SELECT doc_id, COALESCE(text, '') AS text,
        |  list_filter(string_split_regex(COALESCE(text, ''), '[ \t\n\r\x0B\f]+'), w -> w <> '') AS ws,
        |  string_split(COALESCE(text, ''), chr(10)) AS lines,
        |  list_filter(string_split_regex(lower(COALESCE(text, '')), '[^a-z0-9]+'), x -> x <> '') AS toks
        |  FROM documents),
        |c AS (SELECT doc_id,
        |  CAST(len(ws) AS BIGINT) AS n_words,
        |  CAST(COALESCE(list_sum(list_transform(ws, w -> length(w))), 0) AS BIGINT) AS sum_wchars,
        |  CAST(len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]'))) AS BIGINT) AS n_alpha_words,
        |  CAST(len(regexp_extract_all(text, '#|…|\.\.\.')) AS BIGINT) AS n_symbols,
        |  CAST(len(lines) AS BIGINT) AS n_lines,
        |  CAST(len(list_filter(lines, x -> ltrim(x, ' ' || chr(9)) LIKE '-%'
        |    OR ltrim(x, ' ' || chr(9)) LIKE '*%' OR ltrim(x, ' ' || chr(9)) LIKE '•%')) AS BIGINT) AS n_bullet_lines,
        |  CAST(len(list_filter(lines, x -> rtrim(ltrim(x, ' ' || chr(9)), ' ' || chr(9)) LIKE '%...'
        |    OR rtrim(ltrim(x, ' ' || chr(9)), ' ' || chr(9)) LIKE '%…')) AS BIGINT) AS n_ellipsis_lines,
        |  CAST(len(list_filter(['the','be','to','of','and','that','have','with'],
        |    s -> list_contains(toks, s))) AS BIGINT) AS n_stopwords
        |  FROM base)
        |SELECT doc_id, n_words,
        |  (n_words >= 50 AND n_words <= 100000) AS keep_word_count,
        |  (3 * n_words <= sum_wchars AND sum_wchars <= 10 * n_words) AS keep_mean_wlen,
        |  (10 * n_symbols <= n_words) AS keep_symbol,
        |  (10 * n_bullet_lines <= 9 * n_lines) AS keep_bullet,
        |  (10 * n_ellipsis_lines <= 3 * n_lines) AS keep_ellipsis,
        |  (5 * n_alpha_words >= 4 * n_words) AS keep_alpha,
        |  (n_stopwords >= 2) AS keep_stopwords,
        |  (n_words >= 50 AND n_words <= 100000
        |   AND 3 * n_words <= sum_wchars AND sum_wchars <= 10 * n_words
        |   AND 10 * n_symbols <= n_words
        |   AND 10 * n_bullet_lines <= 9 * n_lines
        |   AND 10 * n_ellipsis_lines <= 3 * n_lines
        |   AND 5 * n_alpha_words >= 4 * n_words
        |   AND n_stopwords >= 2) AS keep
        |FROM c ORDER BY doc_id""".stripMargin,

    // CCNet buckets: the text_logprob CTE + a per-language NTILE over
    // the ROUNDED score (ties broken by doc_id — deterministic in both)
    "text_ccnet_buckets" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ws FROM documents),
        |t AS (SELECT doc_id, unnest(ws) AS t FROM w),
        |f AS (SELECT t, COUNT(*) AS cnt FROM t GROUP BY t),
        |tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS tot FROM f),
        |lp AS (SELECT doc_id, ROUND(AVG(LN(cnt / tot)), 4) AS logprob
        |       FROM t JOIN f USING (t), tot GROUP BY doc_id)
        |SELECT d.doc_id, d.lang, lp.logprob,
        |  CASE NTILE(3) OVER (PARTITION BY d.lang ORDER BY lp.logprob DESC, d.doc_id)
        |    WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
        |FROM documents d JOIN lp USING (doc_id) ORDER BY doc_id""".stripMargin,

    // budget selection replayed as the plain global running-sum prefix
    // (the histogram/threshold decomposition is plan shape, not
    // semantics): cum over (quality desc, doc_id) is monotone, so
    // WHERE cum <= budget IS the greedy prefix
    "pipeline_budget" ->
      """WITH t AS (SELECT doc_id, text,
        |  list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ws FROM documents),
        |q AS (SELECT doc_id,
        |  ROUND(0.4 * least(1.0, CAST(len(ws) AS DOUBLE) / 50.0)
        |      + 0.3 * (CAST(len(list_distinct(ws)) AS DOUBLE) / CAST(len(ws) AS DOUBLE))
        |      + 0.3 * (CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE) / length(text)), 6) AS quality
        |  FROM t),
        |tk AS (SELECT doc_id, CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |       ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_ws_tokens FROM documents),
        |d AS (SELECT q.doc_id, q.quality, tk.n_ws_tokens FROM q JOIN tk USING (doc_id)),
        |s AS (SELECT doc_id, quality, n_ws_tokens,
        |  SUM(n_ws_tokens) OVER (ORDER BY quality DESC, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM d)
        |SELECT doc_id, quality, n_ws_tokens FROM s WHERE cum <= 10000
        |ORDER BY doc_id""".stripMargin,

    // md5(text) = md5 of the UTF-8 bytes = Spark's md5 over the
    // encoded binary media column
    "mm_dedup" ->
      """WITH all_docs AS (SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 10000, text FROM documents WHERE doc_id < 20),
        |h AS (SELECT doc_id, md5(text) AS h FROM all_docs),
        |g AS (SELECT h, MIN(doc_id) AS keeper, COUNT(*) AS n_copies FROM h GROUP BY h)
        |SELECT doc_id, keeper, (doc_id <> keeper) AS is_dup, n_copies
        |FROM h JOIN g USING (h) ORDER BY doc_id""".stripMargin,

    // the mm_framesample rolling-hash CTE at frameBytes=64/every=2
    // over the variant-augmented corpus, then the df-capped pair count
    "mm_near_frames" ->
      """WITH all_docs AS (SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 10000, text || ' reencoded trailer segment' FROM documents WHERE doc_id < 20),
        |f AS (SELECT doc_id, text, (length(text) + 63) // 64 AS n_frames FROM all_docs),
        |idx AS (SELECT doc_id, text, CAST(i AS BIGINT) AS frame_idx
        |        FROM f CROSS JOIN (SELECT unnest(range(0, 1000)) AS i)
        |        WHERE i < n_frames AND i % 2 = 0),
        |fr AS (SELECT doc_id, frame_idx,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(string_split(substr(text, 1 + CAST(frame_idx AS INTEGER) * 64, 64), ''),
        |                   c -> CAST(ord(c) AS BIGINT))),
        |    (a, b) -> (a * 31 + b) % 1000000007) AS frame_hash FROM idx),
        |u AS (SELECT DISTINCT frame_hash, doc_id FROM fr),
        |keepable AS (SELECT frame_hash FROM u GROUP BY frame_hash HAVING COUNT(*) <= 64),
        |s AS (SELECT u.frame_hash, u.doc_id FROM u JOIN keepable USING (frame_hash))
        |SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS n_shared
        |FROM s x JOIN s y ON x.frame_hash = y.frame_hash AND x.doc_id < y.doc_id
        |GROUP BY 1, 2 HAVING COUNT(*) >= 2 ORDER BY a, b""".stripMargin,
  )
}
