package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.rdf.TpchRdf
import graft.sparql._

/** SPARQL-algebra coverage queries (SURVEY.md §2, "SPARQL query
  * algebra" block). Each query is an algebra AST compiled by
  * [[graft.sparql.Compiler]] against the virtual triple view; the
  * oracle is equivalent ANSI SQL over the same parquet tables.
  */
object SparqlQueries {

  private def tri(s: SparkSession, dir: String): DataFrame = TpchRdf.triples(s, dir)
  private def run(s: SparkSession, dir: String, a: Algebra): DataFrame =
    Compiler.compile(a, tri(s, dir))

  /** Exact-decimal sum rendered as double — see SURVEY.md §4. */
  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(18,2)")).cast("double")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> ((s, dir) => {
      TpchRdf.table(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(col("l_extendedprice").cast("decimal(18,2)") *
              (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("double").as("sum_disc_price"),
          round(dsum(col("l_quantity")) / count(lit(1)), 4).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "bgp_star_join" -> ((s, dir) => run(s, dir,
      OrderBy(Project(Bgp(
          TriplePattern("?c", "mktsegment", "BUILDING"),
          TriplePattern("?c", "name", "?cname"),
          TriplePattern("?c", "nation", "?n"),
          TriplePattern("?n", "name", "?nname"),
          TriplePattern("?c", "acctbal", "?bal")),
        "cname", "nname", "bal"),
        Seq(col("cname"))))),

    "bgp_chain_join" -> ((s, dir) => run(s, dir,
      OrderBy(Project(Bgp(
          TriplePattern("?o", "customer", "?c"),
          TriplePattern("?c", "nation", "?n"),
          TriplePattern("?n", "region", "?r"),
          TriplePattern("?r", "name", "ASIA"),
          TriplePattern("?o", "totalprice", "?price"),
          TriplePattern("?o", "status", "F")),
        "o", "c", "price"),
        Seq(col("o"), col("c"))))),

    "optional_leftjoin" -> ((s, dir) => run(s, dir,
      // every nation, with customers-in-BUILDING optional
      OrderBy(Project(
        LeftJoin(
          Bgp(TriplePattern("?n", "type", "Nation"),
              TriplePattern("?n", "name", "?nname")),
          Bgp(TriplePattern("?c", "nation", "?n"),
              TriplePattern("?c", "mktsegment", "BUILDING"),
              TriplePattern("?c", "name", "?cname"))),
        "nname", "cname"),
        Seq(col("nname"), col("cname"))))),
  )

  private val T = "WITH " + TpchRdf.oracleCte + "\n"

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "bgp_star_join" ->
      """SELECT c_name AS cname, n_name AS nname,
        |  CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS VARCHAR) AS bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE c_mktsegment = 'BUILDING' ORDER BY cname""".stripMargin,

    "bgp_chain_join" ->
      """SELECT 'o:'||CAST(o_orderkey AS VARCHAR) AS o, 'c:'||CAST(o_custkey AS VARCHAR) AS c,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND o_orderstatus = 'F' ORDER BY o, c""".stripMargin,

    "optional_leftjoin" ->
      """SELECT n_name AS nname, c_name AS cname
        |FROM nation LEFT JOIN customer
        |  ON c_nationkey = n_nationkey AND c_mktsegment = 'BUILDING'
        |ORDER BY nname, cname""".stripMargin,
  )
}
