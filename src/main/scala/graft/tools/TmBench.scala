package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Bench aid for the OWL-maintained-closure tiers (round 14): the
  * MID tier's claim is that a SMALL structural delta against a LARGE
  * closed base costs O(delta-keyed joins), not a program
  * re-derivation — which `owl_maintained`'s own bench shape cannot
  * show (its big commit IS the bulk of its base). Builds a maintained
  * store over the customer-within graph, then times a 1000-edge
  * assert through the MID tier next to the REDERIVE-shape cost the
  * same delta paid before round 14 (program recompute + two
  * diff anti-joins, actions only — no journal writes, so the
  * comparison FAVOURS the old shape).
  *
  * Usage: runMain graft.tools.TmBench <sfDir>
  */
object TmBench {

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
    import graft.inference.{MaintainedClosure, Owl, Rdfs}

    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[tmbench] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n)")
    }

    val emptyOnt = Rdfs.Ontology(
      subClassOf = Seq.empty[(String, String)].toDF("sub", "sup"),
      subPropertyOf = Seq.empty[(String, String)].toDF("sub", "sup"),
      domain = Seq.empty[(String, String)].toDF("p", "cls"),
      range = Seq.empty[(String, String)].toDF("p", "cls"))
    val owl = Owl.Ontology(transitive = Seq("within"),
      inverses = Seq("within" -> "contains"))

    val cust = spark.read.parquet(s"$dir/customer.parquet")
    val nat = spark.read.parquet(s"$dir/nation.parquet")
    def id(pfx: String, c: org.apache.spark.sql.Column) =
      concat(lit(pfx), c.cast("string"))
    val base = cust.select(id("c:", col("c_custkey")).as("s"),
        lit("within").as("p"), id("n:", col("c_nationkey")).as("o"))
      .unionAll(nat.select(id("n:", col("n_nationkey")), lit("within"),
        id("r:", col("n_regionkey"))))

    val tm = MaintainedClosure.create(spark,
      java.nio.file.Files.createTempDirectory("graft_tmb").toString,
      emptyOnt, Some(owl))
    time("seed base (one big MID commit)") {
      tm.assertTriples(base)
    }
    // the realistic TM op: a SMALL structural delta on the big base —
    // 1000 new entities each within one existing customer
    val delta = spark.range(1000).select(
      concat(lit("x:h"), col("id")).as("s"), lit("within").as("p"),
      concat(lit("c:"), (col("id") % 500 + 1).cast("string")).as("o"))
    time("MID assert: 1000 edges on the closed base (incl. journal writes)") {
      tm.assertTriples(delta.localCheckpoint())
    }
    // the pre-round-14 cost of the SAME delta: re-derive the program
    // on base ∪ delta and diff against the closure — actions only
    // (no journal writes), so this reading UNDERSTATES the old shape
    val delta2 = spark.range(1000).select(
      concat(lit("y:h"), col("id")).as("s"), lit("within").as("p"),
      concat(lit("c:"), (col("id") % 500 + 1).cast("string")).as("o"))
      .localCheckpoint()
    time("REDERIVE shape for the same delta (recompute + 2 diff anti-joins)") {
      val target = Rdfs.closure(
        Owl.closure(tm.base().unionAll(delta2), owl), emptyOnt)
        .distinct().localCheckpoint()
      val cur = tm.closure().localCheckpoint()
      target.join(cur, Seq("s", "p", "o"), "left_anti").count() +
        cur.join(target, Seq("s", "p", "o"), "left_anti").count()
    }

    // ---- DYNAMIC mode (round 16: the server's truthMaintenance
    // namespaces) — the ontology is data; the claims to show are
    // (a) a vocab commit pays one re-derivation, (b) steady-state
    // instance commits stay delta-bounded, and (c) the program cache
    // removes the per-commit declaration-slice extraction (the first
    // instance commit after a vocab commit pays it once)
    val dyn = MaintainedClosure.createDynamic(spark,
      java.nio.file.Files.createTempDirectory("graft_tmbd").toString)
    time("DYNAMIC seed: base + TransitiveProperty declaration (rederive tier)") {
      dyn.assertTriples(base.unionAll(Seq(
        ("within", "type", "TransitiveProperty"),
        ("within", "inverseOf", "contains")).toDF("s", "p", "o")))
    }
    val ddelta1 = spark.range(1000).select(
      concat(lit("dx:h"), col("id")).as("s"), lit("within").as("p"),
      concat(lit("c:"), (col("id") % 500 + 1).cast("string")).as("o"))
      .localCheckpoint()
    time("DYNAMIC MID assert #1: 1000 edges (pays one program extraction)") {
      dyn.assertTriples(ddelta1)
    }
    val ddelta2 = spark.range(1000).select(
      concat(lit("dy:h"), col("id")).as("s"), lit("within").as("p"),
      concat(lit("c:"), (col("id") % 500 + 1).cast("string")).as("o"))
      .localCheckpoint()
    time("DYNAMIC MID assert #2: 1000 edges (cached program)") {
      dyn.assertTriples(ddelta2)
    }
    spark.stop()
  }
}
