package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B scale harness for the ngram-Jaccard pair generator: times the
  * round-12 prefix-filtered operator against the retained posting-join
  * reference on a given corpus dir and prints one JSON line per
  * variant — the scale-evidence entry behind the prefix-filter change
  * (ProbeNJ's scratch role, promoted to a repeatable bench).
  *
  * Usage: {{{ runMain graft.tools.DedupAB <dir> [prefix|postings|both|stages] [minJ] [maxDf] }}}
  */
object DedupAB {
  private val Modes = Set("prefix", "postings", "both", "stages")
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mode = if (args.length > 1) args(1) else "both"
    // a typo'd mode must not exit 0 having timed nothing — empty bench
    // evidence with no error is worse than a crash
    require(Modes(mode), s"mode must be one of ${Modes.toSeq.sorted.mkString("|")}, got '$mode'")
    val minJ = if (args.length > 2) args(2).toDouble else 0.5
    val maxDf = if (args.length > 3) args(3).toLong else 64L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.rdf.TpchRdf.table(spark, dir, "documents")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"variant":"$tag","dir":"$dir","minJ":$minJ,"maxDf":$maxDf,"pairs":$n,"sec":$sec%.2f}""")
    }
    if (mode == "prefix" || mode == "both")
      time("prefix")(graft.pipeline.Dedup.ngramJaccard(docs, minJ, maxDf = maxDf).count())
    if (mode == "postings" || mode == "both")
      time("postings")(graft.pipeline.Dedup.ngramJaccardPostings(docs, minJ, maxDf = maxDf).count())
    if (mode == "stages") stages(docs, minJ, maxDf)
    spark.stop()
  }

  /** Per-stage timing of the prefix operator's plan (diagnosis aid;
    * mirrors the shipped ngramJaccard stage for stage). */
  private def stages(docs: org.apache.spark.sql.DataFrame, minJ: Double, maxDf: Long): Unit = {
    import org.apache.spark.sql.functions._
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stage] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val tEff = minJ - 5e-7
    val sets = t("shingleSets ckpt")(graft.pipeline.Dedup.shingleSets(docs, 3)
      .select(col("doc_id"), col("shingles"), size(col("shingles")).as("sz"))
      .localCheckpoint())
    val posts = sets.select(col("doc_id"), col("sz"),
      explode(col("shingles")).as("sh0"))
      .select(col("doc_id"), col("sz"), xxhash64(col("sh0")).as("h"))
    val dfreq = t("dfreq ckpt")(
      posts.groupBy("h").agg(count(lit(1)).as("c")).localCheckpoint())
    val perDoc = t("perDoc ckpt")(posts.join(dfreq.filter(col("c") > 1), "h")
      .groupBy("doc_id", "sz")
      .agg(
        sort_array(collect_list(
          when(col("c") <= maxDf, struct(col("c"), col("h"))))).as("gen"),
        collect_list(when(col("c") > maxDf, col("h"))).as("vh"))
      .withColumn("vc", size(col("vh")).cast("long"))
      .localCheckpoint())
    val M = 4L
    val prefix = perDoc
      .withColumn("gx", size(col("gen")))
      .withColumn("alpha", ceil(lit(tEff) * col("sz")) - col("vc"))
      // mirrors the SHIPPED operator's px stage for stage, including
      // the α > gx zero-clamp (Dedup.scala) — without it this aid
      // emits dead prefix rows and overstates candidate counts
      // relative to the plan it benchmarks
      .withColumn("px", when(col("alpha") > col("gx"), lit(0L))
        .when(col("alpha") <= 1, col("gx"))
        .otherwise(col("gx") - col("alpha") +
          least(col("alpha"),
            floor((col("alpha") + lit(M + 1)) / lit(2)).cast("long"))))
      .select(col("doc_id"), col("sz"), col("gx"), col("alpha"),
        posexplode(slice(col("gen"), lit(1), greatest(col("px"), lit(0L)))))
      .select(col("doc_id"), col("sz"), col("gx"), col("alpha"),
        (col("pos") + 1).as("rk"), col("col.h").as("h"))
    println("[stage] prefix rows = " + prefix.count())
    val pairMaxA = greatest(col("x.alpha"), col("y.alpha"))
    val cand = t("cand matchfloor ckpt")(prefix.alias("x").join(prefix.alias("y"),
        col("x.h") === col("y.h") && col("x.doc_id") < col("y.doc_id") &&
        least(col("x.sz"), col("y.sz")).cast("double") >=
          lit(tEff) * greatest(col("x.sz"), col("y.sz")) &&
        (least(col("x.gx") - col("x.rk"), col("y.gx") - col("y.rk")) +
          least(lit(M), pairMaxA)) >= pairMaxA)
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("npfx"), max(pairMaxA).as("maxa"))
      .filter(col("npfx") >= least(lit(M), col("maxa")))
      .select("a", "b").localCheckpoint())
    println("[stage] cand rows = " + cand.count())
    val inCand = cand.select(col("a").as("doc_id"))
      .unionByName(cand.select(col("b").as("doc_id"))).distinct()
    val arrs = t("cand-doc hash arrays ckpt")(perDoc.join(inCand, "doc_id")
      .select(col("doc_id"), col("sz"),
        sort_array(concat(
          transform(col("gen"), g => g.getField("h")),
          col("vh"))).as("hs"))
      .localCheckpoint())
    val n = t("verify count")(cand
      .join(arrs.select(col("doc_id").as("a"), col("hs").as("ha"), col("sz").as("sa")), "a")
      .join(arrs.select(col("doc_id").as("b"), col("hs").as("hb"), col("sz").as("sb")), "b")
      .withColumn("inter", graft.functions.VectorExprs
        .sorted_long_intersect_count(col("ha"), col("hb")).cast("double"))
      .withColumn("raw", col("inter") / (col("sa") + col("sb") - col("inter")))
      .filter(col("raw") >= minJ - 1e-6).count())
    println("[stage] verified pairs = " + n)
  }
}
