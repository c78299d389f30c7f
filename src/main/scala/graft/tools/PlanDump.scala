package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named driver queries to files —
  * the optimization-round evidence format (`plans/r<k>/<q>_before.txt`
  * / `_after.txt`). For queries whose body mutates per-run state
  * (journal commits), the dump covers the final read the query
  * returns; the commits run as a side effect of building it.
  *
  * Usage: {{{ runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> <q1,q2,...> }}}
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, qlist) = args.take(4)
    val names = qlist.split(",").toSet
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names(n) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          // explain("formatted") prints to stdout — capture via the
          // QueryExecution API instead
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
            txt.getBytes("UTF-8"))
          println(s"dumped $name")
        } catch { case e: Throwable => println(s"FAILED $name: ${e.getMessage}") }
      }
    spark.stop()
  }
}
