package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.gas.Analytics
import graft.queries.GasQueries

class GasSpec extends AnyFunSuite {

  test("generic Pregel BFS equals the tuned Analytics.bfs") {
    import TestSpark.{spark, SF}
    import org.apache.spark.sql.functions._
    val edges = graft.queries.GasQueries.hierEdges(spark, SF)
    val nodes = edges.select(col("src").as("node"))
      .unionAll(edges.select(col("dst").as("node"))).distinct()
    val init = nodes.withColumn("depth",
      when(col("node") === "r:0", 0).otherwise(Int.MaxValue))
    val out = graft.gas.Pregel.run(edges, init) { (state, e, _) =>
      val msgs = state.filter(col("depth") =!= Int.MaxValue)
        .join(e, state("node") === e("src"))
        .groupBy(col("dst").as("node"))
        .agg(min(col("depth") + 1).as("nd"))
      state.join(msgs.withColumnRenamed("node", "n2"),
          state("node") === col("n2"), "left")
        .select(col("node"), least(col("depth"), coalesce(col("nd"), col("depth"))).as("depth"))
    }
    val got = out.filter(col("depth") =!= Int.MaxValue)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val expect = graft.gas.Analytics.bfs(edges, "r:0")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got == expect)
  }
  import TestSpark.{spark, SF}
  private lazy val hier = GasQueries.hierEdges(spark, SF)

  test("bfs: depths layered by entity kind") {
    val d = Analytics.bfs(hier, "r:0").collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(d("r:0") == 0)
    assert(d.filter(_._1.startsWith("n:")).values.forall(_ == 1))
    assert(d.filter(_._1.startsWith("c:")).values.forall(_ == 2))
    assert(d.filter(_._1.startsWith("o:")).values.forall(_ == 3))
  }

  test("sssp distances bounded below by hop count") {
    val d = Analytics.sssp(hier, "r:0")
    assert(d.filter(col("node").startsWith("o:")).count() > 0)
    // o-dist = 2 (r→n→c) + order weight > 2
    assert(d.filter(col("node").startsWith("o:") && col("dist") <= 2.0).count() == 0)
  }

  test("cc finds exactly 5 components (one per region)") {
    val cc = Analytics.connectedComponents(hier)
    assert(cc.select("label").distinct().count() == 5)
  }

  test("pagerank mass: sinks accumulate, sources stay at reset") {
    val pr = Analytics.pageRank(GasQueries.upEdges(spark, SF), iters = 10)
    val byKind = pr.withColumn("kind", substring(col("node"), 1, 1))
      .groupBy("kind").agg(avg("rank").as("r")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(byKind("c") - 0.15) < 1e-9) // no in-edges
    assert(byKind("n") > 0.15)
    assert(byKind("r") > byKind("n")) // regions gather nation mass
  }

  test("delta Pregel: frontier-reporting BFS equals tuned Analytics.bfs") {
    val edges = GasQueries.hierEdges(spark, SF)
    val seed = spark.range(1).select(lit("r:0").as("node"), lit(0).as("depth"))
    // custom program reports its frontier: convergence = empty delta,
    // no full-state exceptAll compare anywhere in the loop
    val out = graft.gas.Pregel.runDelta(edges, seed) { (state, frontier, e, i) =>
      val next = frontier.join(e, frontier("node") === e("src"))
        .select(col("dst").as("node"), lit(i).as("depth")).distinct()
        .join(state.select("node"), Seq("node"), "left_anti")
      (state.unionAll(next), next)
    }
    val got = out.collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val expect = Analytics.bfs(edges, "r:0")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got == expect)
  }

  test("triangle counts: K4, attached star, dup/reversed edges collapse") {
    import TestSpark.spark
    import spark.implicits._
    // K4 on a,b,c,d (each vertex in C(3,2)=3 triangles), a star at s
    // (no triangles), duplicate + reversed edges that must collapse
    val edges = Seq(
      ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d"),
      ("b", "a"), ("c", "a"),             // reversed dups
      ("a", "b"),                          // exact dup
      ("s", "x"), ("s", "y"), ("s", "z"), // star: wedges but no closure
      ("a", "a")                           // self-loop: dropped
    ).toDF("src", "dst")
    val got = Analytics.triangleCounts(edges).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L))
    // brute-force cross-check on a random graph (n=12, p~0.4)
    val rnd = new scala.util.Random(3)
    val vs = ('a' to 'l').map(_.toString)
    val ue = (for { i <- vs.indices; j <- (i + 1) until vs.length
                    if rnd.nextDouble() < 0.4 } yield (vs(i), vs(j)))
    val want = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val es = ue.toSet
    for { i <- vs.indices; j <- (i + 1) until vs.length; k <- (j + 1) until vs.length
          if es((vs(i), vs(j))) && es((vs(j), vs(k))) && es((vs(i), vs(k))) } {
      want(vs(i)) += 1; want(vs(j)) += 1; want(vs(k)) += 1
    }
    val got2 = Analytics.triangleCounts(ue.toDF("src", "dst")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got2 == want.toMap, s"got $got2 want $want")
  }

  test("clustering coefficients: K4 vertices are 1.0, chain interiors 0, leaves 0") {
    import TestSpark.spark
    import spark.implicits._
    val edges = Seq(
      ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d"), // K4
      ("p", "q"), ("q", "r")                                                  // chain
    ).toDF("src", "dst")
    val got = Analytics.clusteringCoeff(edges).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    Seq("a", "b", "c", "d").foreach { v =>
      assert(got(v) == ((3L, 3L, 1.0)), s"$v: ${got(v)}")
    }
    assert(got("q") == ((2L, 0L, 0.0)))  // chain interior: degree 2, no closure
    assert(got("p") == ((1L, 0L, 0.0)))  // leaf: degree < 2
  }

  test("kCore: pendant chains peel away round by round, K4 survives") {
    import TestSpark.spark
    import spark.implicits._
    // K4 with a 2-hop pendant chain d—e—f
    val edges = Seq(("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"),
      ("b", "d"), ("c", "d"), ("d", "e"), ("e", "f")).toDF("src", "dst")
    val (core, rounds) = Analytics.kCoreWithRounds(edges, 2)
    val got = core.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L), s"got $got")
    // e survives round 1 (sees d and f), falls in round 2 once f is
    // gone; round 3 confirms the fixpoint — chains peel ONE hop/round
    assert(rounds == 3, s"rounds=$rounds")
    // 3-core of the same graph: the chain AND nothing else... K4 is 3-regular
    val three = Analytics.kCore(edges, 3).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(three == Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L))
    // 4-core: empty (loud empty, not an error)
    assert(Analytics.kCore(edges, 4).isEmpty)
    // synchronous peeling = one chain hop per round: a path exceeds a
    // small maxRounds and must fail LOUD (a non-fixpoint remainder is
    // not the k-core), naming the bound
    val path = (0 until 20).map(i => (s"p$i", s"p${i + 1}")).toDF("src", "dst")
    val ex = intercept[IllegalArgumentException] {
      Analytics.kCore(path, 2, maxRounds = 3)
    }
    assert(ex.getMessage.contains("3 rounds"), ex.getMessage)
    // with the bound sized to the chain it converges: a path has no
    // 2-core, and the round count ~n/2 is the monitoring hook
    val (empty2, r2) = Analytics.kCoreWithRounds(path, 2, maxRounds = 16)
    assert(empty2.isEmpty && r2 >= 10, s"rounds=$r2")
  }

  test("graph ops evaluate an expensive edge plan exactly ONCE") {
    // gas_kcore feeds kCore the ngramJaccard plan; before r10 the
    // two-direction union re-evaluated that upstream per branch
    // (measured as a full redundant jaccard pass at 100x). An
    // accumulator in the edge plan proves single evaluation.
    import TestSpark.spark
    import spark.implicits._
    val base = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"))
    def countedEdges(acc: org.apache.spark.util.LongAccumulator) =
      base.toDF("src", "dst").as[(String, String)]
        .map { e => acc.add(1L); e }.toDF("src", "dst")
    def evals(run: org.apache.spark.sql.DataFrame => Unit): Long = {
      val acc = spark.sparkContext.longAccumulator
      run(countedEdges(acc))
      acc.value / base.size
    }
    assert(evals(e => Analytics.kCore(e, 2).collect()) == 1L, "kCore")
    assert(evals(e => Analytics.connectedComponents(e).collect()) == 1L, "cc")
    assert(evals(e => Analytics.pageRank(e, iters = 2).collect()) == 1L, "pr")
    assert(evals(e =>
      Analytics.personalizedPageRank(e, Seq("a"), iters = 2).collect()) == 1L, "ppr")
    assert(evals(e => Analytics.degrees(e).collect()) == 1L, "degrees")
  }

  test("personalized pagerank: mass confined to the source's component, decays with depth") {
    import TestSpark.spark
    import spark.implicits._
    // two disjoint chains; teleport pinned to a1
    val edges = Seq(("a1", "a2"), ("a2", "a3"),
      ("b1", "b2"), ("b2", "b3")).toDF("src", "dst")
    val r = Analytics.personalizedPageRank(edges, Seq("a1"), iters = 10)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r("b1") == 0.0 && r("b2") == 0.0 && r("b3") == 0.0,
      "no teleport, no in-flow: the other component must be exactly zero")
    assert(r("a1") == 0.15, "source holds exactly the teleport mass")
    assert(r("a1") > r("a2") && r("a2") > r("a3"),
      s"proximity must decay along the chain: $r")
    assert(r("a2") == 0.1275, "one hop: 0.85 * 0.15")
    // a typo'd / isolated source fails loud instead of returning a
    // plausible all-zero frame with its teleport mass vanished
    val ex = intercept[IllegalArgumentException] {
      Analytics.personalizedPageRank(edges, Seq("a1", "zz"), iters = 2)
    }
    assert(ex.getMessage.contains("zz"), ex.getMessage)
  }

  test("assortativity: star is -1, disjoint unequal cliques are +1, regular graph is NULL") {
    import TestSpark.spark
    import spark.implicits._
    def r(edges: Seq[(String, String)]): Option[Double] = {
      val row = Analytics.assortativity(edges.toDF("src", "dst")).collect()(0)
      if (row.isNullAt(1)) None else Some(row.getDouble(1))
    }
    val star = Seq(("h", "a"), ("h", "b"), ("h", "c"), ("h", "d"))
    assert(r(star).contains(-1.0), s"star should be -1, got ${r(star)}")
    // K3 ∪ K4: endpoints always equal-degree -> +1
    val cliques = Seq(("a", "b"), ("a", "c"), ("b", "c"),
      ("p", "q"), ("p", "s"), ("p", "t"), ("q", "s"), ("q", "t"), ("s", "t"))
    assert(r(cliques).contains(1.0), s"cliques should be +1, got ${r(cliques)}")
    // K3 alone: every degree equal -> zero variance -> undefined
    assert(r(Seq(("a", "b"), ("a", "c"), ("b", "c"))).isEmpty)
  }

  test("near-dup pair graph is staged once and shared by the graph-metric queries") {
    import TestSpark.{spark, SF}
    // first call builds + writes the staged parquet; the second must
    // come back as a BARE parquet scan — no shingle/jaccard stages
    val first = GasQueries.nearDupPairs(spark, SF)
    val again = GasQueries.nearDupPairs(spark, SF)
    val plan = again.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Generate") && !plan.contains("Aggregate"),
      s"staged pair read must be a plain scan, got:\n$plan")
    // and the staged pairs are exactly the direct computation
    val direct = graft.pipeline.Dedup
      .ngramJaccard(graft.rdf.TpchRdf.table(spark, SF, "documents"), 0.5, maxDf = 64)
      .select(col("a").cast("string").as("src"), col("b").cast("string").as("dst"))
    assert(first.exceptAll(direct).isEmpty && direct.exceptAll(first).isEmpty,
      "staged pair graph drifted from the direct ngramJaccard pairs")
  }

  test("gas:service weighted sssp reads link weights from RDR annotations (linkAttrType)") {
    import TestSpark.spark
    import spark.implicits._
    import graft.sparql.{Compiler, Parser, TripleSource}
    import graft.rdf.Rdr
    // a→b costs 5 direct but 2 via c; b→d carries NO weight annotation
    // and must be untraversable in weighted mode (the reference's
    // weighted SSSP visits link-attribute statements, not bare links)
    val links = Seq(("a", "link", "b"), ("a", "link", "c"),
      ("c", "link", "b"), ("b", "link", "d"))
    val ann = Seq(
      (Rdr.sidOf("a", "link", "b"), "w", "5.0"),
      (Rdr.sidOf("a", "link", "c"), "w", "1.0"),
      (Rdr.sidOf("c", "link", "b"), "w", "1.0"))
    val src = TripleSource.plain((links ++ ann).toDF("s", "p", "o"))
    val out = Compiler.compile(Parser.parse(
      """SELECT ?n ?d WHERE {
        |  SERVICE gas:service {
        |    _:g gas:gasClass "sssp" .
        |    _:g gas:in "a" .
        |    _:g gas:linkType "link" .
        |    _:g gas:linkAttrType "w" .
        |    _:g gas:out ?n .
        |    _:g gas:outVal ?d .
        |  }
        |} ORDER BY ?n""".stripMargin), src)
      .collect().map(r => r.getString(0) -> r.getDouble(1))
    assert(out.toSeq == Seq("a" -> 0.0, "b" -> 2.0, "c" -> 1.0))
    // same graph WITHOUT linkAttrType: unit weights, d reachable
    val unw = Compiler.compile(Parser.parse(
      """SELECT ?n ?d WHERE {
        |  SERVICE gas:service {
        |    _:g gas:gasClass "sssp" .
        |    _:g gas:in "a" .
        |    _:g gas:linkType "link" .
        |    _:g gas:out ?n .
        |    _:g gas:outVal ?d .
        |  }
        |} ORDER BY ?n""".stripMargin), src)
      .collect().map(r => r.getString(0) -> r.getDouble(1))
    assert(unw.toSeq == Seq("a" -> 0.0, "b" -> 1.0, "c" -> 1.0, "d" -> 2.0))
  }

  test("gas:service runs a REGISTERED custom program (IGASProgram seam); unregistered is loud") {
    import TestSpark.spark
    import spark.implicits._
    import graft.sparql.{Compiler, Parser, TripleSource}
    val src = TripleSource.plain(Seq(
      ("a", "link", "b"), ("a", "link", "c"), ("b", "link", "c"))
      .toDF("s", "p", "o"))
    def q(cls: String) =
      s"""SELECT ?n ?v WHERE {
         |  SERVICE gas:service {
         |    _:g gas:gasClass "$cls" .
         |    _:g gas:linkType "link" .
         |    _:g gas:out ?n .
         |    _:g gas:outVal ?v .
         |  }
         |} ORDER BY ?n""".stripMargin
    // a custom program: out-degree, run through the generic Pregel
    // runner's contract shape ((node, value) back to the compiler)
    graft.gas.GasPrograms.register("outdeg", (edges, _) =>
      edges.groupBy(col("src").as("node"))
        .agg(count(lit(1)).cast("double").as("value")))
    try {
      val got = Compiler.compile(Parser.parse(q("outdeg")), src)
        .collect().map(r => r.getString(0) -> r.getDouble(1))
      assert(got.toSeq == Seq("a" -> 2.0, "b" -> 1.0))
    } finally graft.gas.GasPrograms.unregister("outdeg")
    val e = intercept[RuntimeException] {
      Compiler.compile(Parser.parse(q("outdeg")), src).collect()
    }
    assert(e.getMessage.contains("GasPrograms.register"))
  }

  test("staged pair graph honors spark.graft.scratchDir (cluster staging root)") {
    import TestSpark.spark
    // a DIFFERENT corpus dir than the sibling test so the stage cache
    // misses and the write actually happens under the conf'd root
    val dir = "/root/testdata/sf0.01"
    val root = java.nio.file.Files.createTempDirectory("graft_scratch_conf").toString
    spark.conf.set("spark.graft.scratchDir", root)
    try {
      val pairs = GasQueries.nearDupPairs(spark, dir)
      assert(pairs.count() > 0)
      val staged = new java.io.File(root).listFiles()
      assert(staged != null && staged.exists(_.getName.startsWith("graft_ndpairs_")),
        s"expected a graft_ndpairs_* stage under $root, found ${Option(staged).map(_.mkString(","))}")
    } finally spark.conf.unset("spark.graft.scratchDir")
  }
}
