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

  /** Sign-sketch bucket id from `numBits` hyperplanes — native codegen
    * kernel, one pass over the vector for all bits; `table` selects an
    * independent set of hyperplanes for multi-table LSH. The hyperplane
    * components are integer-arithmetic-derived so the DuckDB oracle can
    * replay the identical projection (see functions.LshBucket). */
  def lshBucket(emb: Column, numBits: Int = 12, table: Int = 0): Column =
    graft.functions.VectorExprs.lsh_bucket(emb, numBits, table * numBits)

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
    * PipelineSpec). */
  def cosinePairs(vectors: DataFrame, minSim: Double,
                  numBits: Int = 4, tables: Int = 32): DataFrame = {
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
    val keyed = vectors.select(col("vec_id"), col("embedding"),
        norm(col("embedding")).as("nrm"),
        explode(array((0 until tables).map(t =>
          struct(lit(t).as("tbl"), lshBucket(col("embedding"), numBits, t).as("bkt"))): _*))
          .as("k"))
      .select(col("vec_id"), col("embedding"), col("nrm"),
        col("k.tbl").as("tbl"), col("k.bkt").as("bkt"))
    // SHUFFLE_MERGE pinned, like minhashLsh: broadcast would collapse
    // the enumeration onto the scan's few partitions; the high-fanout
    // repartition on the join key spreads the bucket-local pair
    // enumeration (the skew unit) across 8× the default partitions
    val parts = vectors.sparkSession.sparkContext.defaultParallelism * 8
    def side(n: String) = keyed.repartition(parts, col("tbl"), col("bkt")).alias(n)
    side("x").hint("SHUFFLE_MERGE").join(side("y"),
        col("x.tbl") === col("y.tbl") && col("x.bkt") === col("y.bkt") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
        (dot(col("x.embedding"), col("y.embedding")) /
          (col("x.nrm") * col("y.nrm"))).as("raw"))
      // filter RAW first (exactly the oracle's WHERE), round only
      // survivors: Spark's round(_, 6) allocates a BigDecimal via
      // Double.toString per call — measured as ~10µs/pair, the whole
      // join cost at 10⁸ enumerated pairs
      .filter(col("raw") >= minSim)
      .select(col("a"), col("b"), round(col("raw"), 6).as("cos_sim"))
      // distinct LAST: k-table collisions of a verified pair emit k
      // identical rows — |result|-sized, not |candidates|-sized
      .distinct()
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
    * Centroids are a deterministic corpus sample (vec_id % centroidMod
    * == 0) standing in for the k-means book a production pipeline
    * trains offline — assignment, probing and in-cell ranking (the
    * Spark-shaped parts) are identical either way. Ties in the argmax
    * break toward the larger centroid id in both engines. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              centroidMod: Int = 64, nProbe: Int = 4): DataFrame = {
    val cents = broadcast(corpus.filter(col("vec_id") % centroidMod === 0)
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
    val cells = fanout(corpus, "n_id")
      .select(col("n_id"), col("emb"), col("nrm"),
        struct(col("csim"), col("c_id")).as("sc"))
      .groupBy("n_id")
      .agg(first("emb").as("n_emb"), first("nrm").as("n_nrm"), max("sc").as("m"))
      .select(col("n_id"), col("n_emb"), col("n_nrm"), col("m.c_id").as("cell"))
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
    * k-means from a deterministic seed book (vec_id % centroidMod == 0,
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
  def kmeansAssign(vectors: DataFrame, centroidMod: Int = 64): DataFrame = {
    val seeds = broadcast(vectors.filter(col("vec_id") % centroidMod === 0)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
        norm(col("embedding")).as("c_nrm")))
    require(!seeds.isEmpty,
      s"kmeansAssign: no vec_id is a multiple of $centroidMod — no seeds")
    val v = vectors.select(col("vec_id"), col("embedding"),
      norm(col("embedding")).as("nrm"))
    // 1. seed assignment (map-side argmax over the broadcast book)
    val assigned = v.crossJoin(seeds)
      .select(col("vec_id"), col("embedding"),
        struct((dot(col("embedding"), col("c_emb")) /
          (col("nrm") * col("c_nrm"))).as("csim"), col("c_id")).as("sc"))
      .groupBy("vec_id")
      .agg(first("embedding").as("embedding"), max("sc").as("m"))
      .select(col("vec_id"), col("embedding"), col("m.c_id").as("cluster"))
    // 2. centroid update: per-dimension mean, re-assembled in dim order
    val means = assigned
      .select(col("cluster"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy("cluster", "dim").agg(avg(col("x").cast("double")).as("mv"))
      .groupBy("cluster")
      .agg(array_sort(collect_list(struct(col("dim"), col("mv")))).as("dm"))
      .select(col("cluster").as("c_id"),
        transform(col("dm"), e => e("mv")).as("c_emb"))
      .select(col("c_id"), col("c_emb"), norm(col("c_emb")).as("c_nrm"))
    // 3. reassignment against the updated book (the dot kernel takes
    // float×double directly — codegen, no HOF fallback in the fanout)
    v.crossJoin(broadcast(means))
      .select(col("vec_id"),
        struct((dot(col("embedding"), col("c_emb")) /
          (col("nrm") * col("c_nrm"))).as("csim"), col("c_id")).as("sc"))
      .groupBy("vec_id").agg(max("sc").as("m"))
      .select(col("vec_id"), col("m.c_id").as("cluster"),
        round(col("m.csim"), 6).as("sim"))
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

  /** SemDeDup-style semantic dedup (Abbas et al. 2023): cluster the
    * embedding space coarsely, then prune pairwise WITHIN clusters —
    * cosine ≥ tau against a lower-id cluster-mate marks a vector as a
    * duplicate. Returns pruned vectors only: (vec_id, dup_of, cos_sim)
    * where dup_of is the smallest qualifying cluster-mate.
    *
    * The cluster book is the deterministic seed book (`vec_id %
    * centroidMod == 0`, map-side argmax over a broadcast — the
    * [[kmeansAssign]] step-1 cells, i.e. the IVF coarse quantizer).
    * Scale shape: the pair space is confined to cells — the self-join
    * shuffles on the cluster id only, and cell population is bounded
    * by K (scale K with N, ~√N cells keeps cells constant-sized).
    * Skewed cells are AQE skew-join territory; the pair space never
    * goes global. */
  def semanticDedup(vectors: DataFrame, tau: Double,
                    centroidMod: Int = 64): DataFrame = {
    val seeds = broadcast(vectors.filter(col("vec_id") % centroidMod === 0)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
        norm(col("embedding")).as("c_nrm")))
    require(!seeds.isEmpty,
      s"semanticDedup: no vec_id is a multiple of $centroidMod — no seeds")
    val v = vectors.select(col("vec_id"), col("embedding"),
      norm(col("embedding")).as("nrm"))
    // map-side argmax over the broadcast book (ties → larger c_id,
    // the kmeansAssign convention)
    val assigned = v.crossJoin(seeds)
      .select(col("vec_id"), col("embedding"), col("nrm"),
        struct((dot(col("embedding"), col("c_emb")) /
          (col("nrm") * col("c_nrm"))).as("csim"), col("c_id")).as("sc"))
      .groupBy("vec_id")
      .agg(first("embedding").as("embedding"), first("nrm").as("nrm"),
        max("sc").as("m"))
      .select(col("vec_id"), col("embedding"), col("nrm"),
        col("m.c_id").as("cluster"))
    val a = assigned.select(col("vec_id").as("a"), col("embedding").as("a_emb"),
      col("nrm").as("a_nrm"), col("cluster"))
    val b = assigned.select(col("vec_id").as("b"), col("embedding").as("b_emb"),
      col("nrm").as("b_nrm"), col("cluster"))
    // intra-cell pairs; filter on RAW similarity (round only survivors)
    val pairs = a.join(b, Seq("cluster"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        (dot(col("a_emb"), col("b_emb")) / (col("a_nrm") * col("b_nrm"))).as("sim"))
      .filter(col("sim") >= tau)
    pairs.groupBy(col("b").as("vec_id"))
      .agg(min(struct(col("a"), col("sim"))).as("m"))
      .select(col("vec_id"), col("m.a").as("dup_of"),
        round(col("m.sim"), 6).as("cos_sim"))
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
}
