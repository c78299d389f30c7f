package graft.rdf

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Virtual RDF triple view over the TPC-H-ish parquet tables.
  *
  * Blazegraph stores triples in B+Tree statement indices (SPO/POS/OSP)
  * over a dictionary-encoded lexicon
  * (reference: bigdata-core/bigdata-rdf/src/java/com/bigdata/rdf/store/AbstractTripleStore.java,
  * lexicon in .../lexicon/LexiconRelation.java). A Spark-native engine
  * wants neither a global dictionary build (a 100-TB global sort) nor a
  * materialized triple table: here the "store" is a lazy UNION ALL of
  * per-predicate projections, each branch carrying a literal `p`. A
  * triple pattern with a bound predicate constant-folds: Catalyst
  * evaluates `lit(pred) === "x"` per branch, prunes every non-matching
  * branch to an empty relation, and the surviving branch is a single
  * narrow parquet scan with pushed-down filters. Term "IDs" are
  * deterministic strings derived from source keys (`c:42`), so the same
  * view is expressible as a DuckDB CTE for the correctness oracle.
  */
object TpchRdf {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Canonical 2-decimal rendering, exact in both engines. */
  private def dec2(c: Column): Column = c.cast("decimal(18,2)").cast("string")
  private def day(c: Column): Column = date_format(c, "yyyy-MM-dd")
  private def id(prefix: String, c: Column): Column =
    concat(lit(prefix + ":"), c.cast("string"))

  val allTables: Seq[String] =
    Seq("customer", "nation", "region", "supplier", "orders", "part", "lineitem")

  /** The full (s, p, o) string triple view. */
  def triples(spark: SparkSession, dir: String): DataFrame =
    triplesFor(spark, dir, allTables)

  /** Triple view restricted to the branches sourced from `tables` —
    * lets callers that only touch one entity's subgraph skip the other
    * parquet scans entirely (the UPDATE path uses this). */
  def triplesFor(spark: SparkSession, dir: String, tables: Seq[String]): DataFrame =
    tables.flatMap(branches(spark, dir, _)).reduce(_ unionAll _)

  private def branches(spark: SparkSession, dir: String, tbl: String): Seq[DataFrame] = {
    def t(df: DataFrame, s: Column, p: String, o: Column): DataFrame =
      df.select(s.as("s"), lit(p).as("p"), o.cast("string").as("o"))

    lazy val c = table(spark, dir, "customer");  lazy val cs = id("c", col("c_custkey"))
    lazy val n = table(spark, dir, "nation");    lazy val ns = id("n", col("n_nationkey"))
    lazy val r = table(spark, dir, "region");    lazy val rs = id("r", col("r_regionkey"))
    lazy val s = table(spark, dir, "supplier");  lazy val ss = id("s", col("s_suppkey"))
    lazy val o = table(spark, dir, "orders");    lazy val os = id("o", col("o_orderkey"))
    lazy val p = table(spark, dir, "part");      lazy val ps = id("p", col("p_partkey"))
    lazy val l = table(spark, dir, "lineitem")
    lazy val ls = concat(lit("l:"), col("l_orderkey").cast("string"),
                         lit(":"), col("l_linenumber").cast("string"))

    tbl match {
      case "customer" => Seq(
        t(c, cs, "type", lit("Customer")),
        t(c, cs, "name", col("c_name")),
        t(c, cs, "nation", id("n", col("c_nationkey"))),
        t(c, cs, "acctbal", dec2(col("c_acctbal"))),
        t(c, cs, "mktsegment", col("c_mktsegment")))
      case "nation" => Seq(
        t(n, ns, "type", lit("Nation")),
        t(n, ns, "name", col("n_name")),
        t(n, ns, "region", id("r", col("n_regionkey"))))
      case "region" => Seq(
        t(r, rs, "type", lit("Region")),
        t(r, rs, "name", col("r_name")))
      case "supplier" => Seq(
        t(s, ss, "type", lit("Supplier")),
        t(s, ss, "name", col("s_name")),
        t(s, ss, "nation", id("n", col("s_nationkey"))),
        t(s, ss, "acctbal", dec2(col("s_acctbal"))))
      case "orders" => Seq(
        t(o, os, "type", lit("Order")),
        t(o, os, "customer", id("c", col("o_custkey"))),
        t(o, os, "status", col("o_orderstatus")),
        t(o, os, "totalprice", dec2(col("o_totalprice"))),
        t(o, os, "orderdate", day(col("o_orderdate"))),
        t(o, os, "priority", col("o_orderpriority")))
      case "part" => Seq(
        t(p, ps, "type", lit("Part")),
        t(p, ps, "name", col("p_name")),
        t(p, ps, "brand", col("p_brand")),
        t(p, ps, "ptype", col("p_type")),
        t(p, ps, "size", col("p_size").cast("string")),
        t(p, ps, "retailprice", dec2(col("p_retailprice"))))
      case "lineitem" => Seq(
        t(l, ls, "type", lit("Lineitem")),
        t(l, ls, "order", id("o", col("l_orderkey"))),
        t(l, ls, "part", id("p", col("l_partkey"))),
        t(l, ls, "supplier", id("s", col("l_suppkey"))),
        t(l, ls, "quantity", dec2(col("l_quantity"))),
        t(l, ls, "extendedprice", dec2(col("l_extendedprice"))),
        t(l, ls, "discount", dec2(col("l_discount"))),
        t(l, ls, "returnflag", col("l_returnflag")),
        t(l, ls, "linestatus", col("l_linestatus")),
        t(l, ls, "shipdate", day(col("l_shipdate"))))
    }
  }

  /** DuckDB CTE producing the byte-identical triple view, for oracles. */
  val oracleCte: String = {
    def d2(c: String) = s"CAST(CAST($c AS DECIMAL(18,2)) AS VARCHAR)"
    def dy(c: String) = s"strftime($c, '%Y-%m-%d')"
    def v(c: String) = s"CAST($c AS VARCHAR)"
    val branches = Seq(
      s"SELECT 'c:'||${v("c_custkey")} AS s, 'type' AS p, 'Customer' AS o FROM customer",
      s"SELECT 'c:'||${v("c_custkey")}, 'name', c_name FROM customer",
      s"SELECT 'c:'||${v("c_custkey")}, 'nation', 'n:'||${v("c_nationkey")} FROM customer",
      s"SELECT 'c:'||${v("c_custkey")}, 'acctbal', ${d2("c_acctbal")} FROM customer",
      s"SELECT 'c:'||${v("c_custkey")}, 'mktsegment', c_mktsegment FROM customer",
      s"SELECT 'n:'||${v("n_nationkey")}, 'type', 'Nation' FROM nation",
      s"SELECT 'n:'||${v("n_nationkey")}, 'name', n_name FROM nation",
      s"SELECT 'n:'||${v("n_nationkey")}, 'region', 'r:'||${v("n_regionkey")} FROM nation",
      s"SELECT 'r:'||${v("r_regionkey")}, 'type', 'Region' FROM region",
      s"SELECT 'r:'||${v("r_regionkey")}, 'name', r_name FROM region",
      s"SELECT 's:'||${v("s_suppkey")}, 'type', 'Supplier' FROM supplier",
      s"SELECT 's:'||${v("s_suppkey")}, 'name', s_name FROM supplier",
      s"SELECT 's:'||${v("s_suppkey")}, 'nation', 'n:'||${v("s_nationkey")} FROM supplier",
      s"SELECT 's:'||${v("s_suppkey")}, 'acctbal', ${d2("s_acctbal")} FROM supplier",
      s"SELECT 'o:'||${v("o_orderkey")}, 'type', 'Order' FROM orders",
      s"SELECT 'o:'||${v("o_orderkey")}, 'customer', 'c:'||${v("o_custkey")} FROM orders",
      s"SELECT 'o:'||${v("o_orderkey")}, 'status', o_orderstatus FROM orders",
      s"SELECT 'o:'||${v("o_orderkey")}, 'totalprice', ${d2("o_totalprice")} FROM orders",
      s"SELECT 'o:'||${v("o_orderkey")}, 'orderdate', ${dy("o_orderdate")} FROM orders",
      s"SELECT 'o:'||${v("o_orderkey")}, 'priority', o_orderpriority FROM orders",
      s"SELECT 'p:'||${v("p_partkey")}, 'type', 'Part' FROM part",
      s"SELECT 'p:'||${v("p_partkey")}, 'name', p_name FROM part",
      s"SELECT 'p:'||${v("p_partkey")}, 'brand', p_brand FROM part",
      s"SELECT 'p:'||${v("p_partkey")}, 'ptype', p_type FROM part",
      s"SELECT 'p:'||${v("p_partkey")}, 'size', ${v("p_size")} FROM part",
      s"SELECT 'p:'||${v("p_partkey")}, 'retailprice', ${d2("p_retailprice")} FROM part",
      s"SELECT 'l:'||${v("l_orderkey")}||':'||${v("l_linenumber")}, 'type', 'Lineitem' FROM lineitem",
      s"SELECT 'l:'||${v("l_orderkey")}||':'||${v("l_linenumber")}, 'order', 'o:'||${v("l_orderkey")} FROM lineitem",
      s"SELECT 'l:'||${v("l_orderkey")}||':'||${v("l_linenumber")}, 'part', 'p:'||${v("l_partkey")} FROM lineitem",
      s"SELECT 'l:'||${v("l_orderkey")}||':'||${v("l_linenumber")}, 'supplier', 's:'||${v("l_suppkey")} FROM lineitem",
      s"SELECT 'l:'||${v("l_orderkey")}||':'||${v("l_linenumber")}, 'quantity', ${d2("l_quantity")} FROM lineitem",
      s"SELECT 'l:'||${v("l_orderkey")}||':'||${v("l_linenumber")}, 'extendedprice', ${d2("l_extendedprice")} FROM lineitem",
      s"SELECT 'l:'||${v("l_orderkey")}||':'||${v("l_linenumber")}, 'discount', ${d2("l_discount")} FROM lineitem",
      s"SELECT 'l:'||${v("l_orderkey")}||':'||${v("l_linenumber")}, 'returnflag', l_returnflag FROM lineitem",
      s"SELECT 'l:'||${v("l_orderkey")}||':'||${v("l_linenumber")}, 'linestatus', l_linestatus FROM lineitem",
      s"SELECT 'l:'||${v("l_orderkey")}||':'||${v("l_linenumber")}, 'shipdate', ${dy("l_shipdate")} FROM lineitem",
    )
    "triples AS (\n  " + branches.mkString("\n  UNION ALL ") + "\n)"
  }
}
