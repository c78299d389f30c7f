package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement harness: HOF (CodegenFallback) vs native
  * codegen tokenizer on a 10x CJK-heavy index build. Run with
  * `Test/runMain graft.TokenizeBench`; numbers recorded in
  * Analyzers.scala scaladoc. Not a ScalaTest — excluded from CI. */
object TokenizeBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .appName("tokbench").master("local[8]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    // make the corpus CJK-heavy: append a synthetic CJK tail per doc
    val cjkTail = "分布式数据库全文検索エンジン実装最適化システム性能評価実験結果"
    val corpus = (0 until 10).map(i =>
        docs.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
          concat(col("text"), lit(" " + cjkTail)).as("text")))
      .reduce(_ unionAll _)
      .localCheckpoint()
    println(s"corpus rows: ${corpus.count()}")

    // OLD formulation (pre-r10): HOF transform/flatten/sequence = CodegenFallback
    val CjkRun = "[\\p{IsHan}\\p{IsHiragana}\\p{IsKatakana}\\p{IsHangul}]+"
    def hofTokenize(c: org.apache.spark.sql.Column) = {
      val runs = regexp_extract_all(c, lit(CjkRun), lit(0))
      val bigrams = flatten(transform(runs, r =>
        when(length(r) < 2, array(r))
          .otherwise(transform(sequence(lit(1), length(r) - 1),
            i => substring(r, i, lit(2))))))
      val latin = filter(split(lower(c), "[^a-z0-9]+"), t => length(t) > 0)
      concat(bigrams, latin)
    }
    def nativeTokenize(c: org.apache.spark.sql.Column) =
      graft.search.Analyzer.Cjk().tokenize(c)

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n terms)")
    }
    // parity first
    val a = corpus.select(col("doc_id"), hofTokenize(col("text")).as("t"))
      .select(col("doc_id"), explode(col("t")).as("term"))
    val b = corpus.select(col("doc_id"), nativeTokenize(col("text")).as("t"))
      .select(col("doc_id"), explode(col("t")).as("term"))
    val mism = a.groupBy("doc_id", "term").count()
      .join(b.groupBy("doc_id", "term").count()
        .withColumnRenamed("count", "c2"), Seq("doc_id", "term"), "full")
      .filter(col("count").isNull || col("c2").isNull ||
        col("count") =!= col("c2")).count()
    println(s"parity mismatches: $mism")
    for (round <- 1 to 3) {
      time(s"hof    r$round")(a.groupBy("term", "doc_id").count().count())
      time(s"native r$round")(b.groupBy("term", "doc_id").count().count())
    }
    spark.stop()
  }
}
