package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-timing diagnostic for the tm_dynamic / owl_maintained driver
  * queries (optimization round 17): times each commit of the query
  * body separately and counts Spark jobs per phase, so the cost
  * center (job-count floor vs shuffle volume) is visible.
  *
  * Usage: runMain graft.tools.TmDynDiag <sfDir>
  */
object TmDynDiag {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val jobs = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        { jobs.incrementAndGet(); () }
    })
    def time[A](tag: String)(f: => A): A = {
      val j0 = jobs.get(); val t0 = System.nanoTime()
      val r = f
      println(f"[diag] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s, jobs=${jobs.get() - j0}")
      r
    }

    val cust = spark.read.parquet(s"$dir/customer.parquet")
    val nat = spark.read.parquet(s"$dir/nation.parquet")
    def id(pfx: String, c: org.apache.spark.sql.Column) =
      concat(lit(pfx), c.cast("string"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_tmdiag").toString
    val tm = time("createDynamic") {
      graft.inference.MaintainedClosure.createDynamic(spark, tmp)
    }
    time("v1 nations (instance seed)") {
      tm.assertTriples(nat.select(id("n:", col("n_nationkey")).as("s"),
        lit("within").as("p"), id("r:", col("n_regionkey")).as("o")))
    }
    time("v2 vocab (rederive)") {
      tm.assertTriples(Seq(("within", "type", "TransitiveProperty"),
        ("within", "inverseOf", "contains")).toDF("s", "p", "o"))
    }
    time("v3 customers (mid)") {
      tm.assertTriples(cust.select(id("c:", col("c_custkey")).as("s"),
        lit("within").as("p"), id("n:", col("c_nationkey")).as("o")))
    }
    time("v4 retract (rederive)") {
      tm.retractTriples(cust.filter(col("c_custkey") % 3 === 0)
        .select(id("c:", col("c_custkey")).as("s"), lit("within").as("p"),
          id("n:", col("c_nationkey")).as("o")))
    }
    time("closure read + count") { tm.closure().orderBy("s", "p", "o").count() }
    spark.stop()
  }
}
