package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.gas.Analytics
import graft.rdf.TpchRdf

/** GAS analytics coverage (SURVEY.md §2 "GAS graph analytics").
  *
  * The benchmark graph is derived from the TPC-H hierarchy:
  *  - `hier` (down-tree)  r→n, n→c, n→s (w=1), c→o (w=totalprice/1e5)
  *    — a forest, which keeps the BFS/SSSP/CC oracles exact
  *    recursive CTEs.
  *  - `up` (for PageRank)  c→n, s→n, n→r — real fan-in so PR has
  *    non-trivial mass flow.
  */
object GasQueries {

  def hierEdges(s: SparkSession, dir: String): DataFrame = {
    val n = TpchRdf.table(s, dir, "nation")
    val c = TpchRdf.table(s, dir, "customer")
    val su = TpchRdf.table(s, dir, "supplier")
    val o = TpchRdf.table(s, dir, "orders")
    def id(p: String, cc: org.apache.spark.sql.Column) = concat(lit(p + ":"), cc.cast("string"))
    n.select(id("r", col("n_regionkey")).as("src"), id("n", col("n_nationkey")).as("dst"), lit(1.0).as("weight"))
      .unionAll(c.select(id("n", col("c_nationkey")).as("src"), id("c", col("c_custkey")).as("dst"), lit(1.0).as("weight")))
      .unionAll(su.select(id("n", col("s_nationkey")).as("src"), id("s", col("s_suppkey")).as("dst"), lit(1.0).as("weight")))
      .unionAll(o.select(id("c", col("o_custkey")).as("src"), id("o", col("o_orderkey")).as("dst"),
                         (col("o_totalprice") / lit(100000.0)).as("weight")))
  }

  def upEdges(s: SparkSession, dir: String): DataFrame = {
    val n = TpchRdf.table(s, dir, "nation")
    val c = TpchRdf.table(s, dir, "customer")
    val su = TpchRdf.table(s, dir, "supplier")
    def id(p: String, cc: org.apache.spark.sql.Column) = concat(lit(p + ":"), cc.cast("string"))
    c.select(id("c", col("c_custkey")).as("src"), id("n", col("c_nationkey")).as("dst"))
      .unionAll(su.select(id("s", col("s_suppkey")).as("src"), id("n", col("s_nationkey")).as("dst")))
      .unionAll(n.select(id("n", col("n_nationkey")).as("src"), id("r", col("n_regionkey")).as("dst")))
      .withColumn("weight", lit(1.0))
  }

  private val hierCte =
    """edges AS (
      |  SELECT 'r:'||CAST(n_regionkey AS VARCHAR) AS src, 'n:'||CAST(n_nationkey AS VARCHAR) AS dst, CAST(1.0 AS DOUBLE) AS weight FROM nation
      |  UNION ALL SELECT 'n:'||CAST(c_nationkey AS VARCHAR), 'c:'||CAST(c_custkey AS VARCHAR), CAST(1.0 AS DOUBLE) FROM customer
      |  UNION ALL SELECT 'n:'||CAST(s_nationkey AS VARCHAR), 's:'||CAST(s_suppkey AS VARCHAR), CAST(1.0 AS DOUBLE) FROM supplier
      |  UNION ALL SELECT 'c:'||CAST(o_custkey AS VARCHAR), 'o:'||CAST(o_orderkey AS VARCHAR), o_totalprice/100000.0 FROM orders
      |)""".stripMargin

  private val upCte =
    """edges AS (
      |  SELECT 'c:'||CAST(c_custkey AS VARCHAR) AS src, 'n:'||CAST(c_nationkey AS VARCHAR) AS dst FROM customer
      |  UNION ALL SELECT 's:'||CAST(s_suppkey AS VARCHAR), 'n:'||CAST(s_nationkey AS VARCHAR) FROM supplier
      |  UNION ALL SELECT 'n:'||CAST(n_nationkey AS VARCHAR), 'r:'||CAST(n_regionkey AS VARCHAR) FROM nation
      |)""".stripMargin

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "gas_bfs" -> ((s, dir) =>
      Analytics.bfs(hierEdges(s, dir), "r:0").orderBy("node")),
    "gas_sssp" -> ((s, dir) =>
      Analytics.sssp(hierEdges(s, dir), "r:0").orderBy("node")),
    "gas_cc" -> ((s, dir) =>
      Analytics.connectedComponents(hierEdges(s, dir)).orderBy("node")),
    "gas_pr" -> ((s, dir) =>
      Analytics.pageRank(upEdges(s, dir), iters = 10).orderBy("node")),
    "gas_degree" -> ((s, dir) =>
      Analytics.degrees(hierEdges(s, dir)).orderBy("node")),
    "gas_fuzzy_sssp" -> ((s, dir) =>
      Analytics.fuzzySssp(hierEdges(s, dir), Seq("r:0"), Seq("c:5", "c:7"), 100)
        .orderBy("depth", "node")),
    // triangle counts over the supplier co-supply graph (suppliers
    // joined by co-supplying an order — ≤ C(7,2) pairs per order, so
    // edge building is linear in lineitem)
    "gas_triangles" -> ((s, dir) => {
      val li = TpchRdf.table(s, dir, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_suppkey").as("sp"))
      val co = li.as("x").join(li.as("y"),
          col("x.o") === col("y.o") && col("x.sp") < col("y.sp"))
        .select(concat(lit("s:"), col("x.sp").cast("string")).as("src"),
          concat(lit("s:"), col("y.sp").cast("string")).as("dst"))
      Analytics.triangleCounts(co).orderBy("node")
    }),
  )

  /** PR oracle: 10 unrolled iterations (recursive CTEs can't aggregate
    * over the recursive reference), ROUND(...,9) per iteration exactly
    * as the Spark side does. */
  private val prOracle: String = {
    val iters = (1 to 10).map { k =>
      s"""pr$k AS (
         |  SELECT n.node, ROUND(CAST(0.15 AS DOUBLE) + (1 - CAST(0.15 AS DOUBLE)) * COALESCE(c.contrib, 0), 9) AS rank
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS node, SUM(p.rank / o.d) AS contrib
         |    FROM pr${k - 1} p JOIN edges e ON p.node = e.src JOIN outd o ON o.src = e.src
         |    GROUP BY e.dst
         |  ) c ON n.node = c.node
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH $upCte,
       |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
       |outd AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS d FROM edges GROUP BY src),
       |pr0 AS (SELECT node, CAST(0.15 AS DOUBLE) AS rank FROM nodes),
       |$iters
       |SELECT node, rank FROM pr10 ORDER BY node""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    // replays triangleCounts: canonical a<b co-supply edges, each
    // triangle x<y<z enumerated once, per-node unnest
    "gas_triangles" ->
      """WITH co AS (SELECT DISTINCT x.l_suppkey AS a, y.l_suppkey AS b
        |            FROM lineitem x JOIN lineitem y
        |              ON x.l_orderkey = y.l_orderkey AND x.l_suppkey < y.l_suppkey),
        |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |        FROM co e1 JOIN co e2 ON e2.a = e1.a AND e2.b > e1.b
        |        JOIN co e3 ON e3.a = e1.b AND e3.b = e2.b),
        |n AS (SELECT unnest([x, y, z]) AS sk FROM tri)
        |SELECT 's:'||CAST(sk AS VARCHAR) AS node, CAST(COUNT(*) AS BIGINT) AS n_triangles
        |FROM n GROUP BY sk ORDER BY node""".stripMargin,

    "gas_bfs" ->
      s"""WITH RECURSIVE $hierCte, b AS (
         |  SELECT 'r:0' AS node, 0 AS depth
         |  UNION ALL SELECT e.dst, b.depth + 1 FROM b JOIN edges e ON e.src = b.node
         |)
         |SELECT node, depth FROM b ORDER BY node""".stripMargin,

    "gas_sssp" ->
      s"""WITH RECURSIVE $hierCte, d AS (
         |  SELECT 'r:0' AS node, CAST(0.0 AS DOUBLE) AS dist
         |  UNION ALL SELECT e.dst, d.dist + e.weight FROM d JOIN edges e ON e.src = d.node
         |)
         |SELECT node, dist FROM d ORDER BY node""".stripMargin,

    "gas_cc" ->
      s"""WITH RECURSIVE $hierCte, reach AS (
         |  SELECT 'r:'||CAST(r_regionkey AS VARCHAR) AS root, 'r:'||CAST(r_regionkey AS VARCHAR) AS node FROM region
         |  UNION ALL SELECT reach.root, e.dst FROM reach JOIN edges e ON e.src = reach.node
         |), comp AS (SELECT root, MIN(node) AS label FROM reach GROUP BY root)
         |SELECT r.node, c.label FROM reach r JOIN comp c USING(root) ORDER BY node""".stripMargin,

    "gas_pr" -> prOracle,

    // fuzzy SSSP on the forest: the shortest path r:0→target is the
    // unique down-tree chain, so the path-vertex set is exact in SQL
    "gas_fuzzy_sssp" ->
      s"""WITH RECURSIVE $hierCte, tpath AS (
         |  SELECT 'r:0' AS node
         |  UNION SELECT 'c:'||CAST(c_custkey AS VARCHAR) FROM customer JOIN nation ON c_nationkey = n_nationkey
         |        WHERE c_custkey IN (5, 7) AND n_regionkey = 0
         |  UNION SELECT 'n:'||CAST(c_nationkey AS VARCHAR) FROM customer JOIN nation ON c_nationkey = n_nationkey
         |        WHERE c_custkey IN (5, 7) AND n_regionkey = 0
         |), b AS (
         |  SELECT node, 0 AS depth FROM tpath
         |  UNION ALL SELECT e.dst, b.depth + 1 FROM b JOIN edges e ON e.src = b.node WHERE b.depth < 3
         |), md AS (SELECT node, MIN(depth) AS depth FROM b GROUP BY node)
         |SELECT node, depth FROM md ORDER BY depth, node LIMIT 100""".stripMargin,

    "gas_degree" ->
      s"""WITH $hierCte,
         |o AS (SELECT src AS node, COUNT(*) AS out_deg FROM edges GROUP BY src),
         |i AS (SELECT dst AS node, COUNT(*) AS in_deg FROM edges GROUP BY dst)
         |SELECT COALESCE(o.node, i.node) AS node, COALESCE(out_deg, 0) AS out_deg, COALESCE(in_deg, 0) AS in_deg
         |FROM o FULL OUTER JOIN i ON o.node = i.node ORDER BY node""".stripMargin,
  )
}
