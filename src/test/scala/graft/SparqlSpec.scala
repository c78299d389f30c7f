package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.rdf.{TpchRdf, TripleStore}
import graft.sparql._

class SparqlSpec extends AnyFunSuite {
  import TestSpark.{spark, SF}
  private lazy val tri = TpchRdf.triples(spark, SF)

  test("bound-predicate pattern prunes the union to one scan") {
    val df = Compiler.compile(Bgp(TriplePattern("?c", "mktsegment", "?seg")),
      TpchRdf.source(spark, SF))
    val scans = df.queryExecution.sparkPlan.collectLeaves()
    assert(scans.size == 1, s"expected 1 parquet scan, got ${scans.size}")
    assert(df.count() == 150)
  }

  test("bound-subject pattern resolves to a single-table scan (OSP analog)") {
    val df = TpchRdf.triplesForSubject(spark, SF, "c:42")
    val scans = df.queryExecution.sparkPlan.collectLeaves()
    assert(scans.size == 1, s"expected 1 parquet scan, got ${scans.size}")
    assert(df.count() == 5) // customer has 5 properties
  }

  test("full triple view is one scan per backing table") {
    val scans = TpchRdf.triples(spark, SF).queryExecution.sparkPlan.collectLeaves()
    assert(scans.size == 7, s"expected 7 scans (one per table), got ${scans.size}")
    val qscans = TpchRdf.quads(spark, SF).queryExecution.sparkPlan.collectLeaves()
    assert(qscans.size == 7, s"expected 7 quad scans, got ${qscans.size}")
  }

  test("bound graph+predicate quad pattern is one narrow scan") {
    val df = TpchRdf.quadPattern(spark, SF, Some("g:supplier"), Some("acctbal"))
    val scans = df.queryExecution.sparkPlan.collectLeaves()
    assert(scans.size == 1, s"expected 1 scan, got ${scans.size}")
  }

  test("bound-object id pattern scans only referencing branches (OPS analog)") {
    val src = TpchRdf.source(spark, SF)
    // n:3 is referenced only by customer.nation and supplier.nation
    val df = Compiler.compile(Bgp(TriplePattern("?s", "?p", "n:3")), src)
    val scans = df.queryExecution.sparkPlan.collectLeaves()
    assert(scans.size == 2, s"expected 2 scans (customer+supplier), got ${scans.size}")
    val want = tri.filter(col("o") === "n:3").select("s", "p")
    assert(df.exceptAll(want).isEmpty && want.exceptAll(df).isEmpty)
    // r:1 is referenced only from nation.region
    val dfr = Compiler.compile(Bgp(TriplePattern("?s", "?p", "r:1")), src)
    assert(dfr.queryExecution.sparkPlan.collectLeaves().size == 1)
    // nothing references lineitem ids: statically empty, zero scans
    val dfl = Compiler.compile(Bgp(TriplePattern("?s", "?p", "l:1:1")), src)
    assert(dfl.count() == 0)
  }

  test("bound-object literal pattern prunes ref branches and matches the view") {
    val df = Compiler.compile(Bgp(TriplePattern("?s", "?p", "BUILDING")),
      TpchRdf.source(spark, SF))
    val want = tri.filter(col("o") === "BUILDING").select("s", "p")
    assert(df.exceptAll(want).isEmpty && want.exceptAll(df).isEmpty)
    assert(df.count() > 0)
  }

  test("bound-object quad pattern prunes to referencing branches with graph col") {
    val src = TpchRdf.source(spark, SF)
    val df = src.quadScan(TriplePattern("?s", "?p", "n:3"), Var("g"))
    val scans = df.queryExecution.sparkPlan.collectLeaves()
    assert(scans.size == 2, s"expected 2 scans, got ${scans.size}")
    assert(df.select("g").distinct().collect().map(_.getString(0)).toSet ==
      Set("g:customer", "g:supplier"))
  }

  test("star fusion + range typing compile a 5-pattern BGP to 2 scans") {
    val df = Compiler.compile(
      Bgp(TriplePattern("?c", "mktsegment", "BUILDING"),
          TriplePattern("?c", "name", "?cname"),
          TriplePattern("?c", "nation", "?n"),
          TriplePattern("?n", "name", "?nname"),
          TriplePattern("?c", "acctbal", "?bal")),
      graft.rdf.TpchRdf.source(spark, SF))
    val scans = df.queryExecution.sparkPlan.collectLeaves()
    assert(scans.size == 2, s"expected 2 scans (fused star + nation), got ${scans.size}")
    assert(df.count() == Compiler.compile(
      Bgp(TriplePattern("?c", "mktsegment", "BUILDING"),
          TriplePattern("?c", "name", "?cname"),
          TriplePattern("?c", "nation", "?n"),
          TriplePattern("?n", "name", "?nname"),
          TriplePattern("?c", "acctbal", "?bal")), tri).count())
  }

  test("optional produces nulls for unmatched left rows") {
    val df = Compiler.compile(
      LeftJoin(
        Bgp(TriplePattern("?n", "type", "Nation")),
        Bgp(TriplePattern("?c", "nation", "?n"),
            TriplePattern("?c", "mktsegment", "MACHINERY"))), tri)
    assert(df.count() >= 25)
    assert(df.filter(col("c").isNull).count() >= 0)
  }

  test("minus removes solutions with compatible right solutions") {
    val all = Compiler.compile(Bgp(TriplePattern("?c", "type", "Customer")), tri).count()
    val withF = Compiler.compile(
      Bgp(TriplePattern("?o", "customer", "?c"), TriplePattern("?o", "status", "F")), tri)
      .select("c").distinct().count()
    val minus = Compiler.compile(
      Minus(Bgp(TriplePattern("?c", "type", "Customer")),
            Bgp(TriplePattern("?o", "customer", "?c"), TriplePattern("?o", "status", "F"))), tri)
      .count()
    assert(minus == all - withF)
  }

  test("transitive closure reaches orders from regions") {
    val df = Compiler.compile(
      PathPlus(Const("r:0"), Seq("customer", "nation", "region"), Var("y"), "x", "y"), tri)
    assert(df.count() == 0) // down-edges point o→c→n→r, so r:0 reaches nothing
    val up = Compiler.compile(
      PathPlus(Var("x"), Seq("customer", "nation", "region"), Const("r:0"), "x", "y"), tri)
    assert(up.count() > 0)
  }

  test("VALUES compiles to a LocalRelation (no RDD round-trip)") {
    val df = Compiler.compile(
      Join(Bgp(TriplePattern("?n", "name", "?nname")),
        Values(Seq("nname"), Seq(Seq(Some("NATION_1"))))),
      TpchRdf.source(spark, SF))
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("LocalRelation"), s"expected LocalRelation in:\n$plan")
    assert(!plan.contains("ExistingRDD"), "VALUES must not round-trip through an RDD")
  }

  test("GRAPH var pattern scans only the predicate's branch tables") {
    val df = Compiler.compile(
      GraphPattern(Var("g"), Bgp(TriplePattern("?x", "region", "?r"))),
      TpchRdf.source(spark, SF))
    val scans = df.queryExecution.sparkPlan.collectLeaves()
    assert(scans.size == 1, s"region pred lives in one table; got ${scans.size} scans")
  }

  test("OPTIONAL over an empty disjoint group preserves left rows") {
    val src = TpchRdf.source(spark, SF)
    val df = Compiler.compile(
      LeftJoin(
        Bgp(TriplePattern("?r", "type", "Region")),
        Bgp(TriplePattern("?x", "type", "Starship"))), src)
    assert(df.count() == 5, "empty OPTIONAL must keep all left solutions")
    assert(df.filter(col("x").isNull).count() == 5)
  }

  test("EXISTS/NOT EXISTS with disjoint vars hinge on right-side emptiness") {
    val src = TpchRdf.source(spark, SF)
    val some = Bgp(TriplePattern("?x", "type", "Nation"))
    val none = Bgp(TriplePattern("?x2", "type", "Starship"))
    val left = Bgp(TriplePattern("?r", "type", "Region"))
    assert(Compiler.compile(Exists(left, some), src).count() == 5)
    assert(Compiler.compile(Exists(left, none), src).count() == 0)
    assert(Compiler.compile(NotExists(left, none), src).count() == 5)
    assert(Compiler.compile(NotExists(left, some), src).count() == 0)
  }

  test("VALUES UNDEF is compatible with any binding") {
    val src = TpchRdf.source(spark, SF)
    val df = Compiler.compile(
      Join(
        Bgp(TriplePattern("?n", "name", "?nname"),
            TriplePattern("?n", "type", "Nation")),
        Values(Seq("nname", "tag"),
          Seq(Seq(Some("NATION_1"), Some("one")),
              Seq(None, Some("wild"))))), src)
    // the UNDEF row matches all 25 nations; the bound row matches 1
    assert(df.count() == 26)
    assert(df.filter(col("tag") === "wild").count() == 25)
  }

  test("DESCRIBE-set prefix pruning scans only the nodes' tables") {
    val df = Compiler.compile(
      DescribeWhere("s", Bgp(TriplePattern("?s", "type", "Supplier"))),
      TpchRdf.source(spark, SF))
    val scans = df.queryExecution.sparkPlan.collectLeaves()
    assert(scans.size <= 2, s"expected <=2 scans (supplier star + supplier describe), got ${scans.size}")
    assert(df.select("p").distinct().count() == 4) // supplier property count
  }

  test("seeded (bound-endpoint) path closure equals filtered full closure") {
    val src = TpchRdf.source(spark, SF)
    val bound = Compiler.compile(
      PathPlus(Var("x"), Seq("nation", "region"), Const("r:1"), "x", "y"), src)
    val full = Compiler.compile(
      PathPlus(Var("x"), Seq("nation", "region"), Var("y"), "x", "y"), src)
      .filter(col("y") === "r:1")
    assert(bound.select("x").except(full.select("x")).isEmpty)
    assert(full.select("x").except(bound.select("x")).isEmpty)
  }

  test("bds:searchInSearch filters subjects by a full-text hit on their literals") {
    // reference SearchInSearchServiceFactory.java: incoming ?s survive
    // only when they link (any predicate) to a Literal the FT index
    // matches for the query string
    val g = Graft.empty(spark).update(
      """INSERT DATA {
        |  x:a note "the spark engine" . x:b note "plain words" .
        |  x:c note "spark again" . x:b link x:a }""".stripMargin)
    def subs(q: String): Seq[String] =
      g.query(q).collect().map(_.getString(0)).toSeq
    assert(subs(
      """SELECT ?s WHERE {
        |  ?s note ?t .
        |  SERVICE bds:searchInSearch { ?s bds:searchInSearch "spark" . }
        |} ORDER BY ?s""".stripMargin) == Seq("x:a", "x:c"))
    // matchAllTerms: the linked literal must match EVERY query term
    assert(subs(
      """SELECT ?s WHERE {
        |  ?s note ?t .
        |  SERVICE bds:searchInSearch {
        |    ?s bds:searchInSearch "spark engine" .
        |    ?s bds:matchAllTerms "true" .
        |  }
        |} ORDER BY ?s""".stripMargin) == Seq("x:a"))
    // '*' anywhere switches all terms to prefix match (reference strips it)
    assert(subs(
      """SELECT ?s WHERE {
        |  ?s note ?t .
        |  SERVICE bds:searchInSearch { ?s bds:searchInSearch "spar*" . }
        |} ORDER BY ?s""".stripMargin) == Seq("x:a", "x:c"))
    // IRIs are not literals: x:b links to x:a but no literal says "x"
    assert(subs(
      """SELECT ?s WHERE {
        |  ?s note ?t .
        |  SERVICE bds:searchInSearch { ?s bds:searchInSearch "x" . }
        |}""".stripMargin).isEmpty)
  }

  test("named magic SERVICE under SILENT degrades to the unit solution") {
    val g = Graft.empty(spark).update("""INSERT DATA { x:a note "w" . }""")
    val rows = g.query(
      """SELECT ?s WHERE {
        |  ?s note ?t .
        |  SERVICE SILENT unregistered:svc { ?s unregistered:magic "q" . }
        |}""".stripMargin).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("x:a"))
  }

  test("bd:slice pages an access path deterministically in (s,p,o) key order") {
    val src = TpchRdf.source(spark, SF)
    def page(offset: Int, limit: Int) = Compiler.compile(Parser.parse(
      s"""SELECT ?s ?bal WHERE {
         |  SERVICE bd:slice {
         |    ?s acctbal ?bal .
         |    bd:serviceParam bd:slice.offset $offset .
         |    bd:serviceParam bd:slice.limit $limit .
         |  }
         |}""".stripMargin), src)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted
    val all = tri.filter(col("p") === "acctbal")
      .orderBy("s", "p", "o")
      .collect().map(r => (r.getString(0), r.getString(2))).toSeq
    assert(page(0, 4) == all.take(4).sorted)
    assert(page(7, 5) == all.slice(7, 12).sorted)
    // pages tile: no overlap, no gap
    assert((page(0, 4) ++ page(4, 4)).sorted == all.take(8).sorted)
    // range mode: one row binding the exact range count
    val cnt = Compiler.compile(Parser.parse(
      """SELECT ?rng WHERE {
        |  SERVICE bd:slice { ?s acctbal ?bal . bd:serviceParam bd:slice.range ?rng . }
        |}""".stripMargin), src).collect()
    assert(cnt.length == 1 && cnt(0).getLong(0) == all.size.toLong)
    // range FILTERs restrict the path BEFORE paging/counting
    // (SliceServiceFactory "ok to have filters with ranges"): both the
    // page window and the range count are of the FILTERED range
    val fAll = all.filter(_._2.startsWith("1"))
    val fPage = Compiler.compile(Parser.parse(
      """SELECT ?s ?bal WHERE {
        |  SERVICE bd:slice {
        |    ?s acctbal ?bal . FILTER(STRSTARTS(?bal, "1"))
        |    bd:serviceParam bd:slice.offset 1 .
        |    bd:serviceParam bd:slice.limit 3 .
        |  }
        |}""".stripMargin), src)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted
    assert(fPage == fAll.slice(1, 4).sorted, s"got $fPage want ${fAll.slice(1, 4)}")
    val fCnt = Compiler.compile(Parser.parse(
      """SELECT ?rng WHERE {
        |  SERVICE bd:slice {
        |    ?s acctbal ?bal . FILTER(STRSTARTS(?bal, "1"))
        |    bd:serviceParam bd:slice.range ?rng .
        |  }
        |}""".stripMargin), src).collect()
    assert(fCnt.length == 1 && fCnt(0).getLong(0) == fAll.size.toLong)
  }

  test("bd:sample: RANDOM is the seeded md5 draw; DENSE/EVEN follow key order") {
    val src = TpchRdf.source(spark, SF)
    def sample(extra: String, limit: Int) = Compiler.compile(Parser.parse(
      s"""SELECT ?s ?bal WHERE {
         |  SERVICE bd:sample {
         |    ?s acctbal ?bal .
         |    bd:serviceParam bd:sample.limit $limit .
         |    $extra
         |  }
         |}""".stripMargin), src)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted
    val scan = tri.filter(col("p") === "acctbal")
    // RANDOM: exactly the first `limit` rows of the seeded md5 order —
    // deterministic, engine-replayable (the DuckDB oracle recomputes it)
    val bySeed = scan
      .withColumn("k", md5(concat_ws("|", col("s"), col("p"), col("o"), lit("42"))))
      .orderBy("k").limit(6)
      .collect().map(r => (r.getString(0), r.getString(2))).toSeq.sorted
    val random = sample("bd:serviceParam bd:sample.seed 42 .", 6)
    assert(random == bySeed)
    // same seed twice = same sample; different seed = (here) different rows
    assert(sample("bd:serviceParam bd:sample.seed 42 .", 6) == random)
    assert(sample("bd:serviceParam bd:sample.seed 7 .", 6) != random)
    // DENSE: leading rows of the key-ordered path
    val all = scan.orderBy("s", "p", "o")
      .collect().map(r => (r.getString(0), r.getString(2))).toSeq
    assert(sample("bd:serviceParam bd:sample.sampleType \"DENSE\" .", 5)
      == all.take(5).sorted)
    // EVEN: every ceil(n/limit)-th row of the key order
    val stride = math.max(1L, all.size.toLong / 5)
    val even = all.zipWithIndex.collect { case (r, i) if i % stride == 0 => r }
      .take(5).sorted
    assert(sample("bd:serviceParam bd:sample.sampleType \"EVEN\" .", 5) == even)
  }

  test("FullTextQuery option tail: minRank/maxRelevance/matchExact/searchTimeout") {
    val spark2 = spark; import spark2.implicits._
    import graft.search.{Analyzer, FullText}
    val docs = Seq(
      (1L, "spark join spark join spark"), // highest tf for both terms
      (2L, "spark join table"),            // contains the exact phrase
      (3L, "join spark order"),            // tokens match, phrase does not
      (4L, "spark only here"),
      (5L, "nothing relevant")).toDF("doc_id", "text")
    def ids(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.getLong(0)).toSeq
    val full = ids(FullText.search(docs, Seq("spark", "join")))
    // rank window [2,3] = the full ranking sliced (order preserved)
    assert(ids(FullText.search(docs, Seq("spark", "join"),
      minRank = Some(2), maxRank = Some(3))) == full.slice(1, 3))
    // matchExact keeps only docs whose TEXT contains the verbatim phrase
    assert(ids(FullText.search(docs, Seq("spark", "join"),
      matchExact = Seq("spark join"))).toSet == Set(1L, 2L))
    // EVERY matchExact phrase must appear — a second query literal is
    // phrase-checked too, never silently dropped
    assert(ids(FullText.search(docs, Seq("spark", "join"),
      matchExact = Seq("spark join", "table"))).toSet == Set(2L))
    // maxScore drops the top-scoring doc but keeps lower hits
    val scores = FullText.search(docs, Seq("spark", "join"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val cut = scores(full.head) - 1e-6
    assert(!ids(FullText.search(docs, Seq("spark", "join"),
      maxScore = Some(cut))).contains(full.head))
    // the parsed bds:search surface accepts the same options (+ the
    // consumed-and-ignored bds:searchTimeout), reference option names
    val g = Graft.empty(spark).update(
      """INSERT DATA { x:a note "spark join spark" . x:b note "join spark" .
        |  x:c note "spark join" . }""".stripMargin)
    val win = g.query(
      """SELECT ?lit ?sc WHERE {
        |  SERVICE bds:search {
        |    _:s bds:query "spark join" . _:s bds:matchExact "true" .
        |    _:s bds:minRank "1" . _:s bds:maxRank "5" .
        |    _:s bds:searchTimeout "1000" .
        |    _:s bds:out ?lit . _:s bds:outVal ?sc .
        |  }
        |} ORDER BY ?lit""".stripMargin).collect().map(_.getString(0)).toSeq
    assert(win == Seq("spark join", "spark join spark"), s"got $win")
    // searchInSearch accepts the reference's full option list,
    // including the bind-nothing relevance/rank variables
    val sis = g.query(
      """SELECT ?s WHERE {
        |  ?s note ?t .
        |  SERVICE bds:searchInSearch {
        |    ?s bds:searchInSearch "spark join" .
        |    ?s bds:matchExact "true" .
        |    ?s bds:relevance ?rel . ?s bds:rank ?rk .
        |    ?s bds:searchTimeout "1000" .
        |  }
        |} ORDER BY ?s""".stripMargin).collect().map(_.getString(0)).toSeq
    assert(sis == Seq("x:a", "x:c"), s"got $sis")
  }

  test("classic magic-predicate search (no SERVICE) lifts into a search join") {
    // the reference's PRIMARY search syntax (ASTSearchOptimizer):
    // bds:* patterns inline in the WHERE group, the search variable
    // binding the matched literal
    val g = Graft.empty(spark).update(
      """INSERT DATA {
        |  x:a note "the spark engine" . x:b note "plain words" .
        |  x:c note "spark join spark" . x:b link x:a . }""".stripMargin)
    val rows = g.query(
      """SELECT ?s ?lit ?sc WHERE {
        |  ?lit bds:search "spark" .
        |  ?lit bds:relevance ?sc .
        |  ?s note ?lit .
        |} ORDER BY ?s""".stripMargin).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("x:a", "x:c"))
    assert(rows.forall(r => r.getString(1).contains("spark") && !r.isNullAt(2)))
    // rank variable binds the (score desc, doc) hit order; minRelevance composes
    val ranked = g.query(
      """SELECT ?lit ?rk WHERE {
        |  ?lit bds:search "spark" . ?lit bds:rank ?rk .
        |} ORDER BY ?rk""".stripMargin).collect()
    assert(ranked.map(_.getInt(1)).toSeq == Seq(1, 2))
    assert(ranked.head.getString(0) == "spark join spark") // tf 2 ranks first
    // rangeCount binds ONE row with the hit count instead of hits
    val cnt = g.query(
      """SELECT ?n WHERE { ?lit bds:search "spark" . ?lit bds:rangeCount ?n . }""")
      .collect()
    assert(cnt.length == 1 && cnt(0).getLong(0) == 2L)
    // SELECT * excludes the synthesized score column when no
    // bds:relevance variable was asked for
    val star = g.query("""SELECT * WHERE { ?lit bds:search "plain" . }""")
    assert(star.columns.toSeq == Seq("lit"))
    // unknown predicates error like the reference's optimizer
    val err = intercept[RuntimeException](g.query(
      """SELECT ?lit WHERE { ?lit bds:serch "x" . }"""))
    assert(err.getMessage.contains("Unknown search predicate"))
    // and the lift does NOT fire inside SERVICE groups (the
    // searchInSearch options keep their handler semantics)
    val sis = g.query(
      """SELECT ?s WHERE {
        |  ?s note ?t .
        |  SERVICE bds:searchInSearch {
        |    ?s bds:searchInSearch "spark" . ?s bds:matchAllTerms "true" .
        |  }
        |} ORDER BY ?s""".stripMargin).collect().map(_.getString(0)).toSeq
    assert(sis == Seq("x:a", "x:c"))
  }

  test("magic-service params fail loud on typos, variables and unknown modes") {
    val src = TpchRdf.source(spark, SF)
    def bad(q: String): String =
      intercept[RuntimeException](Compiler.compile(Parser.parse(q), src)).getMessage
    // typo'd param predicate: silently returning page 1 would be wrong
    assert(bad(
      """SELECT ?s WHERE { SERVICE bd:slice {
        |  ?s acctbal ?bal . bd:serviceParam bd:slice.offst 10 . } }""".stripMargin)
      .contains("unrecognized param"))
    // variable where a constant is required
    assert(bad(
      """SELECT ?s WHERE { SERVICE bd:sample {
        |  ?s acctbal ?bal . bd:serviceParam bd:sample.limit ?n . } }""".stripMargin)
      .contains("constant"))
    // unknown sample type
    assert(bad(
      """SELECT ?s WHERE { SERVICE bd:sample {
        |  ?s acctbal ?bal . bd:serviceParam bd:sample.sampleType "SHUFFLE" . } }""".stripMargin)
      .contains("RANDOM | EVEN | DENSE"))
    // typo'd searchInSearch option on the search variable
    assert(bad(
      """SELECT ?s WHERE { ?s name ?n . SERVICE bds:searchInSearch {
        |  ?s bds:searchInSearch "asia" . ?s bds:minRelevence "0.1" . } }""".stripMargin)
      .contains("unrecognized pattern"))
    // typo'd bd:values param
    assert(bad(
      """SELECT ?seg WHERE { SERVICE bd:values {
        |  bd:serviceParam bd:values.var ?seg .
        |  bd:serviceParam bd:values.vall "BUILDING" . } }""".stripMargin)
      .contains("unrecognized pattern"))
    // and SILENT swallows the handler error into the unit solution
    val ok = Compiler.compile(Parser.parse(
      """SELECT ?r ?rn WHERE { ?r name ?rn . ?r type "Region" .
        |  SERVICE SILENT bd:slice {
        |    ?x acctbal ?b . bd:serviceParam bd:slice.offst 1 . } }""".stripMargin), src)
    assert(ok.count() == 5) // regions unchanged: unit solution joined
  }

  test("magic search: object kinds validate loud; nested SERVICE groups stay unlifted") {
    val g = Graft.empty(spark).update(
      """INSERT DATA { x:a note "the spark engine" . }""")
    // value option with a variable object — the reference
    // SearchServiceFactory throws "Object is not literal"
    val e1 = intercept[RuntimeException](g.query(
      """SELECT ?lit WHERE { ?lit bds:search "spark" . ?lit bds:minRelevance ?x . }"""))
    assert(e1.getMessage.contains("not a literal"), e1.getMessage)
    // output predicate with a constant object — "Object must be variable"
    val e2 = intercept[RuntimeException](g.query(
      """SELECT ?lit WHERE { ?lit bds:search "spark" . ?lit bds:relevance "0.5" . }"""))
    assert(e2.getMessage.contains("must be a variable"), e2.getMessage)
    // a nested { } inside a SERVICE group must NOT hijack bds:*
    // patterns into a SearchService — the named handler (or a remote
    // endpoint) owns them verbatim
    var seen: Option[Algebra] = None
    ServiceRegistry.register("urn:test:probe", (inner, src) => {
      seen = Some(inner); src.triples.sparkSession.range(1).select()
    })
    try {
      Compiler.compile(Parser.parse(
        """SELECT * WHERE { SERVICE urn:test:probe {
          |  { ?lit bds:search "spark" . } } }""".stripMargin),
        TripleSource.plain(tri)).collect()
      def hasSearchService(a: Algebra): Boolean = a match {
        case _: SearchService => true
        case Join(l, r)       => hasSearchService(l) || hasSearchService(r)
        case Bgp(_ @ _*)      => false
        case _                => false
      }
      assert(seen.isDefined && !hasSearchService(seen.get),
        s"nested group was lifted: ${seen.get}")
    } finally ServiceRegistry.unregister("urn:test:probe")
  }

  test("SERVICE bds:search rank window is not truncated by the default limit") {
    val src = TpchRdf.source(spark, SF)
    // "the" hits far more than 20 of the 500 documents; a [1,30]
    // window must return 30 rows, not min(30, default-limit 20)
    val windowed = Compiler.compile(Parser.parse(
      """SELECT ?d ?sc WHERE {
        |  SERVICE bds:search {
        |    _:s bds:query "the" .
        |    _:s bds:minRank 1 . _:s bds:maxRank 30 .
        |    _:s bds:out ?d . _:s bds:outVal ?sc .
        |  }
        |}""".stripMargin), src)
    assert(windowed.count() == 30L)
    // an EXPLICIT bds:limit still wins over the window width
    val limited = Compiler.compile(Parser.parse(
      """SELECT ?d ?sc WHERE {
        |  SERVICE bds:search {
        |    _:s bds:query "the" . _:s bds:limit 10 .
        |    _:s bds:minRank 1 . _:s bds:maxRank 30 .
        |    _:s bds:out ?d . _:s bds:outVal ?sc .
        |  }
        |}""".stripMargin), src)
    assert(limited.count() == 10L)
  }

  test("built-in services inside GRAPH blocks scope to the graph; GRAPH ?var + SERVICE is loud") {
    val g = Graft.empty(spark).update(
      """INSERT DATA {
        |  GRAPH g:one { x:a val "1" . x:b val "2" . x:c val "3" .
        |                x:s note "needle here" . }
        |  GRAPH g:two { x:d val "4" . x:t note "needle there" . }
        |}""".stripMargin)
    // bd:slice pages ONLY the enclosing graph's access path (the
    // reference slices a quads-mode SPOC access path the same way)
    val page = g.query(
      """SELECT ?s ?v WHERE { GRAPH g:one { SERVICE bd:slice {
        |  ?s val ?v .
        |  bd:serviceParam bd:slice.offset 1 .
        |  bd:serviceParam bd:slice.limit 2 .
        |} } } ORDER BY ?s""".stripMargin).collect().map(_.getString(0)).toSeq
    assert(page == Seq("x:b", "x:c"), page)
    // range count of the OTHER graph counts only its rows
    val cnt = g.query(
      """SELECT ?n WHERE { GRAPH g:two { SERVICE bd:slice {
        |  ?s val ?v . bd:serviceParam bd:slice.range ?n . } } }""".stripMargin)
      .collect()
    assert(cnt.length == 1 && cnt(0).getLong(0) == 1L)
    // bd:sample DENSE draws from the graph-scoped path
    val dense = g.query(
      """SELECT ?s ?v WHERE { GRAPH g:one { SERVICE bd:sample {
        |  ?s val ?v .
        |  bd:serviceParam bd:sample.limit 2 .
        |  bd:serviceParam bd:sample.sampleType "DENSE" .
        |} } } ORDER BY ?s""".stripMargin).collect().map(_.getString(0)).toSeq
    assert(dense == Seq("x:a", "x:b"), dense)
    // searchInSearch's literal space is the GRAPH's literal space:
    // only g:one subjects survive the needle filter
    val sis = g.query(
      """SELECT ?s WHERE { GRAPH g:one {
        |  ?s note ?t .
        |  SERVICE bds:searchInSearch { ?s bds:searchInSearch "needle" . }
        |} } ORDER BY ?s""".stripMargin).collect().map(_.getString(0)).toSeq
    assert(sis == Seq("x:s"), sis)
    // a SERVICE inside a VARIABLE-graph block has no per-graph
    // evaluation — rejected loud, never silently unscoped
    val e = intercept[RuntimeException](g.query(
      """SELECT ?s WHERE { GRAPH ?gv { SERVICE bd:slice {
        |  ?s val ?v . bd:serviceParam bd:slice.limit 2 . } } }""".stripMargin))
    assert(e.getMessage.contains("GRAPH ?gv supports"), e.getMessage)
    // bds:search inside a GRAPH block stays STORE-WIDE (the
    // reference's text index is store-level): the g:two literal is a
    // hit even inside GRAPH g:one — and the enclosing graph-scoped
    // join then decides what it matches
    val ft = g.query(
      """SELECT ?lit WHERE { GRAPH g:one {
        |  SERVICE bds:search { _:s bds:query "needle" . _:s bds:out ?lit . }
        |} } ORDER BY ?lit""".stripMargin).collect().map(_.getString(0)).toSeq
    assert(ft == Seq("needle here", "needle there"), ft)
  }

  test("TripleStore delete/insert/clear semantics") {
    val store = TripleStore(tri.filter(col("p") === "mktsegment"))
    val n = store.triples.count()
    val toDelete = store.triples.filter(col("o") === "BUILDING")
    val deleted = store.deleteData(toDelete)
    assert(deleted.triples.count() == n - toDelete.count())
    val reinserted = deleted.insertData(toDelete)
    assert(reinserted.triples.count() == n)
    // inserting duplicates is a no-op (set semantics)
    assert(reinserted.insertData(toDelete).triples.count() == n)
    assert(store.clear().triples.count() == 0)
  }
}
