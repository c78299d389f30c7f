package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-audit utility: prints the parquet-scan pushdown surface
  * (PushedFilters / ReadSchema) and the join/exchange inventory for
  * named driver queries — the quick check that a filter reached the
  * scan and a join didn't degenerate to nested-loop.
  *
  * Usage: {{{ runMain graft.tools.PlanAudit [sfDir] [q1,q2,...] }}}
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val only: Set[String] =
      if (args.length > 1) args(1).split(",").toSet else Set.empty
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
      .foreach { case (name, fn) =>
        try {
          val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
          val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findAllIn(plan).toSeq.distinct
          val joins = "(\\w*Join\\w*)".r.findAllIn(plan).toSeq
            .groupBy(identity).map { case (k, v) => s"$k x${v.size}" }.toSeq.sorted
          val exchanges = "Exchange".r.findAllIn(plan).size
          println(s"== $name | exchanges=$exchanges | joins=${joins.mkString(",")}")
          pushed.foreach(p => println(s"   $p"))
        } catch { case e: Throwable => println(s"== $name | ERROR ${e.getMessage}") }
      }
    spark.stop()
  }
}
