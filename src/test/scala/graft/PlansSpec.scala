package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.rdf.TpchRdf

/** [[graft.plans.PruneConstStructExplode]] — bound-predicate
  * access-path pruning over the explode-shaped triple/quad views
  * (the POS-index-selection analog, SPOKeyOrder.getKeyOrder). The
  * TestSpark session registers it via spark.sql.extensions, like a
  * production deployment. */
class PlansSpec extends AnyFunSuite {
  import TestSpark.{spark, SF}

  private def parquetLeaves(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collectLeaves().collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.mkString(",")
          case r => r.toString
        }
    }

  test("bound-predicate scan prunes to the tables carrying the predicate") {
    val tri = TpchRdf.triples(spark, SF)
    // 'name' lives on region/nation/customer/supplier/part — the
    // lineitem/orders fact scans must VANISH from the plan, not run
    // and filter to zero (at 100 TB the facts are the corpus)
    val bound = tri.filter(col("p") === "name")
    val leaves = parquetLeaves(bound)
    assert(leaves.size == 5, s"expected 5 table scans, got:\n${leaves.mkString("\n")}")
    assert(!leaves.exists(l => l.contains("lineitem") || l.contains("orders")),
      s"fact-table scan survived the prune:\n${leaves.mkString("\n")}")
    // results are exactly the unpruned semantics (the filter keeps
    // running on the survivors — the rule only drops statically-dead
    // branches)
    val expect = tri.collect().count(_.getString(1) == "name")
    assert(bound.count() == expect)
  }

  test("object-bound constant prunes across branches (type='Region' = one scan)") {
    val tri = TpchRdf.triples(spark, SF)
    // every table carries a 'type' fact, but its object is a literal
    // per table — binding the OBJECT must prune to the region scan
    // alone (the OSP/POS access path falling out of constant folding)
    val bound = tri.filter(col("p") === "type" && col("o") === "Region")
    val leaves = parquetLeaves(bound)
    assert(leaves.size == 1 && leaves.head.contains("region"),
      s"expected only the region scan, got:\n${leaves.mkString("\n")}")
    assert(bound.count() == 5) // 5 regions at every SF (true dimension)
  }

  test("a predicate no table carries collapses to an empty relation, zero scans") {
    val tri = TpchRdf.triples(spark, SF)
    val none = tri.filter(col("p") === "nosuchpred")
    assert(parquetLeaves(none).isEmpty,
      "a statically-unsatisfiable pattern must not scan anything")
    assert(none.count() == 0)
  }

  test("outer explode and data-dependent conjuncts are left alone") {
    val spark2 = spark; import spark2.implicits._
    // outer explode: dropping elements could change null-row emission,
    // so the rule must not touch it
    val df = Seq((1, "a"), (2, "b")).toDF("id", "v")
      .select(col("id"), explode_outer(array(
        struct(lit("k1").as("p"), col("v").as("o")),
        struct(lit("k2").as("p"), lit("c").as("o")))).as("po"))
      .filter(col("po.p") === "k1")
    assert(df.count() == 2)
    // data-dependent conjunct (po.o references a column): every
    // element survives, results are plain filter semantics
    val dd = Seq((1, "x"), (2, "y")).toDF("id", "v")
      .select(col("id"), explode(array(
        struct(lit("k1").as("p"), col("v").as("o")),
        struct(lit("k2").as("p"), col("v").as("o")))).as("po"))
      .filter(col("po.o") === "x")
    assert(dd.count() == 2) // both elements of id=1 match
  }
}
