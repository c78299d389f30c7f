package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Evidence dump for the round-17 invertedIndex change: the
  * index-build stage runs as a SIDE EFFECT of staging (not in any
  * driver query's final-read plan), so the window-vs-join plan diff
  * is captured here directly — the `before` shape is the documented
  * pre-change formulation (groupBy doc norms + join back), generated
  * in the same session for an apples-to-apples formatted plan.
  *
  * Usage: {{{ runMain graft.tools.IxPlanDump <sfDir> <outDir> }}}
  */
object IxPlanDump {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val az = graft.search.Analyzer.Latin()
    // BEFORE (pre-change shape): per-doc norm aggregate joined back
    val tfs = docs
      .select(col("doc_id"), explode(az.tokenize(col("text"))).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
    val norms = tfs.groupBy("doc_id")
      .agg(sqrt(sum(col("tf") * col("tf"))).as("_dn"))
    val before = tfs.join(norms, "doc_id")
      .select(col("term"), col("doc_id"), col("tf"),
        (col("tf") / col("_dn")).as("dw"))
    // AFTER: the shipped window formulation
    val after = graft.search.FullText.invertedIndex(docs, az)
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"inverted_index_$name.txt"),
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode).getBytes("UTF-8"))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    dump("before", before)
    dump("after", after)
    println("dumped inverted_index before/after")
    spark.stop()
  }
}
