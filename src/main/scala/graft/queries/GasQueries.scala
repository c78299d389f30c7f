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

  /** The near-dup pair graph (Jaccard ≥ 0.5, df-capped) that
    * gas_triangles/assortativity/kcore/clustering all diagnose —
    * materialized ONCE per (corpus, params) per driver run as a staged
    * parquet (the fulltext_persisted production shape: a dedup
    * pipeline materializes its pair graph before running graph
    * diagnostics over it). Without this each of the four queries
    * re-ran the ngramJaccard pair generation — the single most
    * expensive stage in the graph-metric family (148–318 s at 100×
    * per r10 evidence, ×4 queries). The cache key carries the corpus
    * dir and the (threshold, maxDf) params; a second driver run in a
    * fresh JVM rebuilds — the stage is per-run, not durable state. */
  // pair-graph parameters: ONE definition feeds both the cache key and
  // the ngramJaccard call, so they cannot drift apart silently
  private val PairJ = 0.5
  private val PairMaxDf = 64L
  private val stagedPairs = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private[graft] def nearDupPairs(s: SparkSession, dir: String): DataFrame = {
    val key = s"$dir|j=$PairJ|maxDf=$PairMaxDf"
    val path = stagedPairs.computeIfAbsent(key, _ => {
      // staging root: spark.graft.scratchDir if set (a cluster deploy
      // points it at shared storage — a driver-local temp dir would be
      // invisible to executors on other hosts), else a driver temp dir
      // registered for JVM-exit cleanup (local mode). Staleness note:
      // the cache is keyed by dir+params only — rewriting the
      // documents table at `dir` within one JVM serves the old graph;
      // the stage is per-run state, not durable (a fresh driver
      // rebuilds), matching how the four graph-metric consumers run.
      val p = s.conf.getOption("spark.graft.scratchDir") match {
        case Some(root) =>
          // md5 of the FULL key, not its 32-bit hashCode: two distinct
          // (corpus, params) keys colliding on one path would silently
          // serve the wrong pair graph to the other's consumers
          val md = java.security.MessageDigest.getInstance("MD5")
            .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
          new org.apache.hadoop.fs.Path(root, s"graft_ndpairs_$md").toString
        case None =>
          val d = java.nio.file.Files.createTempDirectory("graft_ndpairs")
          sys.addShutdownHook {
            try {
              java.nio.file.Files.walk(d).sorted(java.util.Comparator.reverseOrder())
                .forEach(f => java.nio.file.Files.deleteIfExists(f))
            } catch { case scala.util.control.NonFatal(_) => () }
          }
          d.toString
      }
      graft.pipeline.Dedup
        .ngramJaccard(TpchRdf.table(s, dir, "documents"), PairJ, maxDf = PairMaxDf)
        .select(col("a").cast("string").as("src"), col("b").cast("string").as("dst"))
        .write.mode("overwrite").parquet(p)
      p
    })
    s.read.parquet(path)
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "gas_bfs" -> ((s, dir) =>
      Analytics.bfs(hierEdges(s, dir), "r:0").orderBy("node")),
    "gas_sssp" -> ((s, dir) =>
      Analytics.sssp(hierEdges(s, dir), "r:0").orderBy("node")),
    "gas_cc" -> ((s, dir) =>
      Analytics.connectedComponents(hierEdges(s, dir)).orderBy("node")),
    "gas_pr" -> ((s, dir) =>
      Analytics.pageRank(upEdges(s, dir), iters = 10).orderBy("node")),
    // personalized PR: teleport mass pinned to r:0, proximity flows
    // down that region's subtree; other components stay exactly 0
    "gas_ppr" -> ((s, dir) =>
      Analytics.personalizedPageRank(hierEdges(s, dir), Seq("r:0")).orderBy("node")),
    "gas_degree" -> ((s, dir) =>
      Analytics.degrees(hierEdges(s, dir)).orderBy("node")),
    "gas_fuzzy_sssp" -> ((s, dir) =>
      Analytics.fuzzySssp(hierEdges(s, dir), Seq("r:0"), Seq("c:5", "c:7"), 100)
        .orderBy("depth", "node")),
    // triangle census of the near-dup graph (Jaccard ≥ 0.5 pairs — the df-cap-exact regime; 0.3 measured losing viral-only pairs at 10×):
    // triangle density is how a dedup pipeline validates that
    // transitive cluster-collapsing is safe (cliques, not chains).
    // The pair graph is SPARSE BY CONSTRUCTION at every SF — planted
    // dup clusters are small cliques — unlike a co-occurrence
    // projection of uniform TPC-H, which densifies toward a complete
    // graph as orders grow (measured: 76 s at sf0.1 and superlinear
    // beyond; the operator was fine, the driver graph was wrong).
    "gas_triangles" -> ((s, dir) => {
      val pairs = nearDupPairs(s, dir)
      Analytics.triangleCounts(pairs)
        .select(col("node").cast("long").as("doc_id"), col("n_triangles"))
        .orderBy("doc_id")
    }),
    // degree assortativity of the near-dup graph (one-row summary;
    // co-supply was tried first and is degenerate-COMPLETE at small
    // SF — constant degree, zero variance, undefined coefficient)
    "gas_assortativity" -> ((s, dir) => {
      val pairs = nearDupPairs(s, dir)
      Analytics.assortativity(pairs)
    }),

    // 2-core of the near-dup graph: peel degree-1 hangers-on until
    // only mutually-corroborated dup clusters remain — the "is this
    // cluster real or one chained borderline pair?" read
    "gas_kcore" -> ((s, dir) => {
      val pairs = nearDupPairs(s, dir)
      Analytics.kCore(pairs, 2)
        .select(col("node").cast("long").as("doc_id"), col("core_deg"))
        .orderBy("doc_id")
    }),

    // local clustering coefficients of the same near-dup graph —
    // cliques ≈ 1 vs chains ≈ 0: the cluster-cohesion read a dedup
    // pipeline uses to validate transitive collapsing
    "gas_clustering" -> ((s, dir) => {
      val pairs = nearDupPairs(s, dir)
      Analytics.clusteringCoeff(pairs)
        .select(col("node").cast("long").as("doc_id"), col("degree"),
          col("n_triangles"), col("coeff"))
        .orderBy("doc_id")
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

  // prOracle's unrolled-iteration shape with the teleport indicator
  // pinned to r:0 over the hierarchy edges
  private val pprOracle: String = {
    val ind = "CASE WHEN n.node = 'r:0' THEN CAST(0.15 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END"
    val iters = (1 to 10).map { k =>
      s"""pr$k AS (
         |  SELECT n.node, ROUND($ind + (1 - CAST(0.15 AS DOUBLE)) * COALESCE(c.contrib, 0), 9) AS rank
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS node, SUM(p.rank / o.d) AS contrib
         |    FROM pr${k - 1} p JOIN edges e ON p.node = e.src JOIN outd o ON o.src = e.src
         |    GROUP BY e.dst
         |  ) c ON n.node = c.node
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH $hierCte,
       |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
       |outd AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS d FROM edges GROUP BY src),
       |pr0 AS (SELECT node, CASE WHEN node = 'r:0' THEN CAST(0.15 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END AS rank FROM nodes),
       |$iters
       |SELECT node, rank FROM pr10 ORDER BY node""".stripMargin
  }

  // k-core oracle: the near-dup pair CTE + 24 unrolled peel rounds
  // (a fixpoint is invariant under extra rounds, so 24 ≡ the Spark
  // loop's fixpoint whenever convergence needs ≤ 24 — the spec pins
  // the actual round count well under that)
  private val kcoreOracle: String = {
    // MATERIALIZED: each round references the previous one TWICE, and
    // DuckDB inlines CTEs by default — 24 unmaterialized rounds would
    // expand 2^24 subplans (measured as an fd explosion, not a hang)
    val rounds = (1 to 24).map { r =>
      s"""rem$r AS MATERIALIZED (SELECT node FROM (
         |  SELECT u.s AS node, COUNT(*) AS c FROM und u
         |  JOIN rem${r - 1} x ON u.s = x.node JOIN rem${r - 1} y ON u.d = y.node
         |  GROUP BY u.s) WHERE c >= 2)""".stripMargin
    }.mkString(",\n")
    s"""WITH w AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ws FROM documents),
       |sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(ws) - 1), i -> ws[i]||' '||ws[i+1]||' '||ws[i+2])) AS shs
       |       FROM w WHERE len(ws) >= 3),
       |e AS (SELECT doc_id, unnest(shs) AS sh FROM sh),
       |sizes AS (SELECT doc_id, len(shs) AS sz FROM sh),
       |pairs AS (SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS inter
       |          FROM e a JOIN e b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2),
       |p AS (SELECT a, b FROM pairs JOIN sizes sa ON pairs.a = sa.doc_id JOIN sizes sb ON pairs.b = sb.doc_id
       |      WHERE ROUND(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6) >= 0.5),
       |und AS MATERIALIZED (SELECT a AS s, b AS d FROM p UNION SELECT b, a FROM p),
       |rem0 AS MATERIALIZED (SELECT s AS node FROM und GROUP BY s),
       |$rounds
       |SELECT u.s AS doc_id, CAST(COUNT(*) AS BIGINT) AS core_deg
       |FROM und u JOIN rem24 x ON u.s = x.node JOIN rem24 y ON u.d = y.node
       |GROUP BY u.s ORDER BY doc_id""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "gas_ppr" -> pprOracle,
    "gas_kcore" -> kcoreOracle,
    // replays triangleCounts over the exact Jaccard ≥ 0.5 pair graph
    // (the dedup_ngram_jaccard CTE), each triangle x<y<z once
    "gas_triangles" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ws FROM documents),
        |sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(ws) - 1), i -> ws[i]||' '||ws[i+1]||' '||ws[i+2])) AS shs
        |       FROM w WHERE len(ws) >= 3),
        |e AS (SELECT doc_id, unnest(shs) AS sh FROM sh),
        |sizes AS (SELECT doc_id, len(shs) AS sz FROM sh),
        |pairs AS (SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS inter
        |          FROM e a JOIN e b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |p AS (SELECT a, b FROM pairs JOIN sizes sa ON pairs.a = sa.doc_id JOIN sizes sb ON pairs.b = sb.doc_id
        |      WHERE ROUND(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6) >= 0.5),
        |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |        FROM p e1 JOIN p e2 ON e2.a = e1.a AND e2.b > e1.b
        |        JOIN p e3 ON e3.a = e1.b AND e3.b = e2.b),
        |n AS (SELECT unnest([x, y, z]) AS d FROM tri)
        |SELECT d AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_triangles
        |FROM n GROUP BY d ORDER BY doc_id""".stripMargin,

    // replays assortativity in the identical mean-form double formula
    "gas_assortativity" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ws FROM documents),
        |sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(ws) - 1), i -> ws[i]||' '||ws[i+1]||' '||ws[i+2])) AS shs
        |       FROM w WHERE len(ws) >= 3),
        |e AS (SELECT doc_id, unnest(shs) AS sh FROM sh),
        |sizes AS (SELECT doc_id, len(shs) AS sz FROM sh),
        |pairs AS (SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS inter
        |          FROM e a JOIN e b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |co AS (SELECT a, b FROM pairs JOIN sizes sa ON pairs.a = sa.doc_id JOIN sizes sb ON pairs.b = sb.doc_id
        |      WHERE ROUND(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6) >= 0.5),
        |deg AS (SELECT n, CAST(COUNT(*) AS BIGINT) AS d FROM
        |          (SELECT a AS n FROM co UNION ALL SELECT b FROM co) GROUP BY 1),
        |bo AS (SELECT a, b FROM co UNION ALL SELECT b, a FROM co),
        |j AS (SELECT dx.d AS dx, dy.d AS dy FROM bo
        |      JOIN deg dx ON dx.n = bo.a JOIN deg dy ON dy.n = bo.b),
        |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS m2,
        |          CAST(SUM(dx) AS BIGINT) AS sx, CAST(SUM(dy) AS BIGINT) AS sy,
        |          CAST(SUM(dx*dy) AS BIGINT) AS sxy, CAST(SUM(dx*dx) AS BIGINT) AS sxx,
        |          CAST(SUM(dy*dy) AS BIGINT) AS syy FROM j)
        |SELECT CAST(m2 // 2 AS BIGINT) AS n_edges,
        |  CASE WHEN (CAST(sxx AS DOUBLE) / m2 - (CAST(sx AS DOUBLE) / m2) * (CAST(sx AS DOUBLE) / m2)) <= 0
        |         OR (CAST(syy AS DOUBLE) / m2 - (CAST(sy AS DOUBLE) / m2) * (CAST(sy AS DOUBLE) / m2)) <= 0
        |       THEN NULL
        |  ELSE ROUND((CAST(sxy AS DOUBLE) / m2 - (CAST(sx AS DOUBLE) / m2) * (CAST(sy AS DOUBLE) / m2)) /
        |    sqrt((CAST(sxx AS DOUBLE) / m2 - (CAST(sx AS DOUBLE) / m2) * (CAST(sx AS DOUBLE) / m2)) *
        |         (CAST(syy AS DOUBLE) / m2 - (CAST(sy AS DOUBLE) / m2) * (CAST(sy AS DOUBLE) / m2))), 4)
        |  END AS assortativity
        |FROM agg""".stripMargin,

    // same pair graph; coeff = 2T/(d(d−1)), degree-joined triangles
    "gas_clustering" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ws FROM documents),
        |sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(ws) - 1), i -> ws[i]||' '||ws[i+1]||' '||ws[i+2])) AS shs
        |       FROM w WHERE len(ws) >= 3),
        |e AS (SELECT doc_id, unnest(shs) AS sh FROM sh),
        |sizes AS (SELECT doc_id, len(shs) AS sz FROM sh),
        |pairs AS (SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS inter
        |          FROM e a JOIN e b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |p AS (SELECT a, b FROM pairs JOIN sizes sa ON pairs.a = sa.doc_id JOIN sizes sb ON pairs.b = sb.doc_id
        |      WHERE ROUND(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6) >= 0.5),
        |deg AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS degree FROM
        |          (SELECT a AS d FROM p UNION ALL SELECT b FROM p) GROUP BY 1),
        |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |        FROM p e1 JOIN p e2 ON e2.a = e1.a AND e2.b > e1.b
        |        JOIN p e3 ON e3.a = e1.b AND e3.b = e2.b),
        |tc AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS t FROM
        |         (SELECT unnest([x, y, z]) AS d FROM tri) GROUP BY 1)
        |SELECT deg.d AS doc_id, degree, coalesce(t, 0) AS n_triangles,
        |  CASE WHEN degree >= 2 THEN ROUND(2.0 * coalesce(t, 0) / (degree * (degree - 1)), 4)
        |       ELSE 0.0 END AS coeff
        |FROM deg LEFT JOIN tc ON deg.d = tc.d ORDER BY doc_id""".stripMargin,

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
