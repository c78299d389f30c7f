package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch: prefix-filter candidate counts for ngramJaccard. */
object ProbeNJ {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/scale/x100")
    val minJ = 0.5; val maxDf = 64L
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = graft.rdf.TpchRdf.table(spark, dir, "documents")
    val sets = t("shingleSets+ckpt")(
      graft.pipeline.Dedup.shingleSets(docs, 3).localCheckpoint())
    val sizes = sets.select(col("doc_id"), size(col("shingles")).as("sz"))
    val posts = sets.select(col("doc_id"), explode(col("shingles")).as("sh"))
    val dfreq = t("dfreq+ckpt")(
      posts.groupBy("sh").agg(count(lit(1)).as("c")).localCheckpoint())
    val postsC = posts.join(dfreq, "sh")
    val genPosts = postsC.filter(col("c") > lit(1L) && col("c") <= lit(maxDf))
    val vc = postsC.filter(col("c") > lit(maxDf))
      .groupBy("doc_id").agg(count(lit(1)).as("vc"))
    val gx = genPosts.groupBy("doc_id").agg(count(lit(1)).as("gx"))
    val meta = sizes
      .join(gx, Seq("doc_id"), "left").na.fill(0L, Seq("gx"))
      .join(vc, Seq("doc_id"), "left").na.fill(0L, Seq("vc"))
      .withColumn("alpha", ceil((lit(minJ) - lit(5e-7)) * col("sz")) - col("vc"))
      .withColumn("px", when(col("alpha") <= 1, col("gx"))
        .otherwise(col("gx") - col("alpha") + 1))
    val ranked = genPosts.withColumn("rk",
      row_number().over(Window.partitionBy("doc_id").orderBy(col("c"), col("sh"))))
    val prefix = t("prefix posts+ckpt")(ranked.join(meta, "doc_id")
      .filter(col("rk") <= col("px")).select("doc_id", "sh").localCheckpoint())
    println("[probe] prefix rows = " + prefix.count() + " of posts = " + posts.count())
    val cand = prefix.alias("x").join(prefix.alias("y"),
        col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b")).distinct()
    t("candidates.count")(println("candidates=" + cand.count()))
    spark.stop()
  }
}
