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

  /** Pseudo-random hyperplane component for (plane, dim): deterministic
    * in [-0.5, 0.5) from xxhash64. */
  private def planeW(plane: Int, d: Column): Column =
    (pmod(xxhash64(lit(plane), d), lit(1000L)).cast("double") / 1000.0) - 0.5

  /** Sign-sketch bucket id from `numBits` hyperplanes. */
  def lshBucket(emb: Column, numBits: Int = 12): Column =
    (0 until numBits).map { p =>
      val proj = aggregate(
        zip_with(emb, sequence(lit(0), size(emb) - 1),
          (x, d) => x.cast("double") * planeW(p, d)),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

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

  /** Near-duplicate pairs by embedding cosine ≥ minSim (all-pairs over
    * a broadcast side; at scale swap in lshBucket blocking first). */
  def cosinePairs(vectors: DataFrame, minSim: Double): DataFrame = {
    val a = vectors.select(col("vec_id").as("a"), col("embedding").as("ea"),
      norm(col("embedding")).as("na"))
    val b = vectors.select(col("vec_id").as("b"), col("embedding").as("eb"),
      norm(col("embedding")).as("nb"))
    a.join(b, col("a") < col("b"))
      .select(col("a"), col("b"),
        round(dot(col("ea"), col("eb")) / (col("na") * col("nb")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= minSim)
  }
}
