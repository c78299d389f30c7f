package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cardinality diagnostics for the dedup/ANN family (first used for
  * the round-8 sf1 evidence runs, corpus dir parameterized): prints
  * result and intermediate cardinalities so superlinear wall-times
  * can be attributed to candidate blowup vs output blowup. A bench
  * aid like DedupAB, not part of the library surface. */
object Diag {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.rdf.TpchRdf.table(spark, dir, "documents")
    val embs = graft.rdf.TpchRdf.table(spark, dir, "embeddings")
    println(s"[diag] docs=${docs.count()} embs=${embs.count()}")

    // exact-dup group size distribution
    val g = docs.groupBy("text").count().groupBy("count").count()
      .orderBy(desc("count")).collect()
    println(s"[diag] exact-dup group sizes (size -> groups): " +
      g.take(8).map(r => s"${r.get(0)}->${r.get(1)}").mkString(", "))

    // minhash banding candidate volume
    val sets = graft.pipeline.Dedup.shingleSets(docs).localCheckpoint()
    val sigs = sets.select(col("doc_id"),
      graft.pipeline.Dedup.minhashSignature(col("shingles"), 64).as("sig"))
    val banded = sigs.select(col("doc_id"),
      explode(transform(sequence(lit(0), lit(31)),
        b => xxhash64(b, slice(col("sig"), b * 2 + 1, lit(2)).cast("string"))))
        .as("band_key")).localCheckpoint()
    val bucketTop = banded.groupBy("band_key").count()
      .orderBy(desc("count")).limit(5).collect()
    println(s"[diag] top minhash buckets: " +
      bucketTop.map(_.getLong(1)).mkString(", "))
    val candRaw = banded.alias("x").join(banded.alias("y"),
      col("x.band_key") === col("y.band_key") && col("x.doc_id") < col("y.doc_id")).count()
    println(s"[diag] minhash candidate rows (pre-distinct): $candRaw")
    val pairs = graft.pipeline.Dedup.minhashLsh(docs, 0.8).count()
    println(s"[diag] minhash verified pairs (J>=0.8): $pairs")

    // embedding LSH bucket occupancy + candidates
    val keyed = embs.select(col("vec_id"),
      graft.pipeline.Ann.lshBucket(col("embedding"), 4, 0).as("b0"))
    val occ = keyed.groupBy("b0").count().orderBy(desc("count")).limit(5).collect()
    println(s"[diag] top 4-bit embedding buckets (of 16): " +
      occ.map(_.getLong(1)).mkString(", "))
    val cos = graft.pipeline.Ann.cosinePairs(embs, 0.45).count()
    println(s"[diag] cosine pairs (>=0.45): $cos")
    spark.stop()
  }
}
