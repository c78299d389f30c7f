package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.rdf.{TpchRdf, TripleStore}
import graft.search.FullText
import graft.inference.Rdfs

/** Full-text, inference, streaming and UPDATE coverage (SURVEY.md §2). */
object EngineQueries {

  /** Loader bnode labels are document-scoped by an 16-hex content hash
    * ([[graft.rdf.Turtle]] Scope — RDF 1.1 §3.4 document-scoped bnode
    * identity); single-document fixtures normalize the scope away for
    * a stable oracle rendering. */
  private def unscope(c: org.apache.spark.sql.Column) =
    regexp_replace(c, "^_:[0-9a-f]{16}-", "_:")

  /** Static demo ontology over the TPC-H vocabulary (SURVEY.md §3). */
  private def ontology(s: SparkSession): Rdfs.Ontology = {
    import s.implicits._
    Rdfs.Ontology(
      subClassOf = Seq(
        ("Customer", "Agent"), ("Supplier", "Agent"), ("Agent", "Resource"),
        ("Order", "Transaction"), ("Lineitem", "Transaction"), ("Transaction", "Resource"),
        ("Nation", "Place"), ("Region", "Place"), ("Place", "Resource"),
        ("Part", "Item"), ("Item", "Resource")).toDF("sub", "sup"),
      subPropertyOf = Seq(
        ("nation", "locatedIn"), ("region", "locatedIn")).toDF("sub", "sup"),
      domain = Seq(("nation", "LocatedThing")).toDF("p", "cls"),
      range = Seq(("nation", "Place"), ("region", "Place")).toDF("p", "cls"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fulltext_search" -> ((s, dir) =>
      FullText.search(TpchRdf.table(s, dir, "documents"), Seq("spark", "join", "vector"), 20)),

    // the PERSISTED-index production shape: the inverted index is
    // written once as a parquet table and the query plan contains only
    // the postings scan + broadcast semi-join — no tokenize/build stage
    // (FullTextIndex is likewise a persisted statement index)
    "fulltext_persisted" -> ((s, dir) => {
      val docs = TpchRdf.table(s, dir, "documents")
      val idxDir = java.nio.file.Files.createTempDirectory("graft_ftidx").toString
      FullText.invertedIndex(docs).write.mode("overwrite").parquet(idxDir)
      FullText.searchIndex(s.read.parquet(idxDir), docs.count(),
        Seq("spark", "join", "vector"), 20)
    }),

    // prefix match: each query entry matches every term it prefixes
    // (reference: FullTextIndex.java prefixMatch=true)
    "fulltext_prefix" -> ((s, dir) =>
      FullText.search(TpchRdf.table(s, dir, "documents"), Seq("spar", "vec"), 20,
        prefixMatch = true)),

    // conjunctive search: only docs containing EVERY query term
    // (reference: FullTextQuery matchAllTerms)
    "fulltext_matchall" -> ((s, dir) =>
      FullText.search(TpchRdf.table(s, dir, "documents"), Seq("the", "data"), 20,
        matchAll = true)),

    "rdfs_closure" -> ((s, dir) => {
      // instance slice: entity types + the location edges — sourced only
      // from the four tables involved, so the fact tables never scan
      val tri = TpchRdf.triplesFor(s, dir, Seq("customer", "nation", "region", "supplier"))
        .filter(col("p").isin("type", "nation", "region"))
      Rdfs.closure(tri, ontology(s))
        .filter(col("p").isin("type", "locatedIn", "nation", "region"))
        .orderBy("s", "p", "o")
    }),

    // GeoSpatial service analog: z-order bucketing over synthetic
    // supplier coordinates (integer-derived, so the oracle replays it)
    "geo_zorder" -> ((s, dir) => {
      val pts = geoPoints(s, dir)
      pts.groupBy(graft.operators.Geo.zCell(col("lat"), col("lon"), 10).as("zcell"))
        .agg(count(lit(1)).as("n")).orderBy("zcell")
    }),

    // bounding-box query (z-cell pruning's verify step)
    "geo_bbox" -> ((s, dir) =>
      geoPoints(s, dir)
        .filter(graft.operators.Geo.inBBox(col("lat"), col("lon"), -45, 45, -90, 90))
        .orderBy("k")),

    // geospatial search from inside SPARQL — the reference's
    // geo:search service (ast/eval/GeoSpatialServiceFactory.java:133,
    // inRectangle): covering z-cells prune before the exact verify
    "geo_service" -> ((s, dir) =>
      graft.sparql.Compiler.compile(graft.sparql.Parser.parse(
        """SELECT ?k ?lat ?lon WHERE {
          |  SERVICE geo:search {
          |    _:g geo:latMin "0" .
          |    _:g geo:latMax "60" .
          |    _:g geo:lonMin "-120" .
          |    _:g geo:lonMax "30" .
          |    _:g geo:out ?k .
          |    _:g geo:outLat ?lat .
          |    _:g geo:outLon ?lon .
          |  }
          |} ORDER BY ?k""".stripMargin),
        TpchRdf.source(s, dir))),

    // geo:search inCircle mode (GeoSpatial.java pointDistance): the
    // circle's bbox drives the z-cell prune, the exact (rounded)
    // haversine distance verifies and is bound as a solution var
    "geo_circle" -> ((s, dir) =>
      graft.sparql.Compiler.compile(graft.sparql.Parser.parse(
        """SELECT ?k ?lat ?lon ?d WHERE {
          |  SERVICE geo:search {
          |    _:g geo:lat "10" .
          |    _:g geo:lon "-40" .
          |    _:g geo:radiusKm "3000" .
          |    _:g geo:out ?k .
          |    _:g geo:outLat ?lat .
          |    _:g geo:outLon ?lon .
          |    _:g geo:outDist ?d .
          |  }
          |} ORDER BY ?k""".stripMargin),
        TpchRdf.source(s, dir))),

    // the reference's DEFAULT geospatial datatype is lat-lon-TIME
    // (GeoSpatial.java built-in literal): geo:timeStart/geo:timeEnd add
    // a time-interval constraint and the search prunes on 3D
    // (lat,lon,t) z-cells before the exact bbox ∧ interval verify
    "geo_time" -> ((s, dir) =>
      graft.sparql.Compiler.compile(graft.sparql.Parser.parse(
        """SELECT ?k ?lat ?lon ?t WHERE {
          |  SERVICE geo:search {
          |    _:g geo:latMin "-60" .
          |    _:g geo:latMax "60" .
          |    _:g geo:lonMin "-150" .
          |    _:g geo:lonMax "90" .
          |    _:g geo:timeStart "100" .
          |    _:g geo:timeEnd "400" .
          |    _:g geo:out ?k .
          |    _:g geo:outLat ?lat .
          |    _:g geo:outLon ?lon .
          |    _:g geo:outTime ?t .
          |  }
          |} ORDER BY ?k""".stripMargin),
        TpchRdf.source(s, dir))),

    // CUSTOM geospatial datatype (GeoSpatialDatatypeConfiguration.java
    // :56 analog): a declared (lat, lon, day) component schema drives
    // the generalized k-D z-order covering-cell prune + exact verify
    "geo_custom" -> ((s, dir) => {
      val dt = graft.operators.GeoDatatype(Seq(
        graft.operators.GeoField("lat", -90, 90),
        graft.operators.GeoField("lon", -180, 180),
        graft.operators.GeoField("t", 0, 999)), bitsPerField = 10)
      dt.rangeSearch(TpchRdf.supplierPointsT(s, dir),
          Seq((-30.0, 75.0), (-120.0, 60.0), (200.0, 700.0)), bits = 12)
        .orderBy("k")
    }),

    // SymmetricOneStep DESCRIBE: triples where the node is subject OR
    // object (DescribeModeEnum.SymmetricOneStep). The object side uses
    // the OPS-analog access path: only branches that can reference the
    // node's table are scanned, not the full view.
    "describe_sym" -> ((s, dir) =>
      TpchRdf.triplesForSubject(s, dir, "n:3")
        .unionAll(TpchRdf.triplesForObject(s, dir, "n:3"))
        .distinct().orderBy("s", "p", "o")),

    // Concise Bounded Description (DescribeModeEnum.CBD, CBD.java:71):
    // subject triples + metadata statements about them, transitively
    // through sid statement identifiers (two annotation levels here)
    "describe_cbd" -> ((s, dir) => {
      val cust = TpchRdf.table(s, dir, "customer")
      val natT = cust.select(
        concat(lit("c:"), col("c_custkey").cast("string")).as("s"),
        lit("nation").as("p"),
        concat(lit("n:"), col("c_nationkey").cast("string")).as("o"))
      val ann1 = graft.rdf.Rdr.annotate(natT, "source", lit("census"))
      val ann2 = graft.rdf.Rdr.annotate(ann1, "checked_by", lit("auditor"))
      // overlay source: base subjects resolve through the prefix-pruned
      // access path; the annotation overlay is materialized once —
      // every CBD round reads it, and rebuilding it per round would
      // re-scan customer and re-hash both annotation levels each time
      val src = graft.sparql.TripleSource
        .overlay(TpchRdf.source(s, dir), ann1.unionAll(ann2).localCheckpoint())
      graft.rdf.Rdr.cbd(src, "c:5").orderBy("s", "p", "o")
    }),

    // full-text relevance/rank cutoffs (FullTextIndex.java:1004 region:
    // minCosine/maxRank analogs) driven from SERVICE text
    "fulltext_rank" -> ((s, dir) =>
      graft.sparql.Compiler.compile(graft.sparql.Parser.parse(
        """SELECT ?doc_id ?score WHERE {
          |  SERVICE bds:search {
          |    _:s bds:query "spark join vector" .
          |    _:s bds:limit "50" .
          |    _:s bds:minRelevance "0.05" .
          |    _:s bds:maxRank "12" .
          |    _:s bds:out ?doc_id .
          |    _:s bds:outVal ?score .
          |  }
          |} ORDER BY DESC(?score) ?doc_id""".stripMargin),
        TpchRdf.source(s, dir))),

    // full-text regex term match (the reference's REGEX match option):
    // the regex runs on the term dictionary, never per-posting
    "fulltext_regex" -> ((s, dir) =>
      graft.sparql.Compiler.compile(graft.sparql.Parser.parse(
        """SELECT ?doc_id ?score WHERE {
          |  SERVICE bds:search {
          |    _:s bds:regex "^(sc|sp|st).*" .
          |    _:s bds:limit "15" .
          |    _:s bds:out ?doc_id .
          |    _:s bds:outVal ?score .
          |  }
          |} ORDER BY DESC(?score) ?doc_id""".stripMargin),
        TpchRdf.source(s, dir))),

    // RDF*/RDR statement identifiers (Blazegraph sids mode,
    // AbstractTripleStore.Options.STATEMENT_IDENTIFIERS): provenance
    // statements asserted ABOUT base statements via content-hash sids,
    // queried back through the RDF* `<<s p o>>` pattern form — the
    // metadata join runs on a map-side sid computation in both engines
    "rdr_annotation" -> ((s, dir) => {
      val cust = TpchRdf.table(s, dir, "customer")
      val base = cust.filter(col("c_acctbal") > 9000)
        .select(concat(lit("c:"), col("c_custkey").cast("string")).as("s"),
                lit("nation").as("p"),
                concat(lit("n:"), col("c_nationkey").cast("string")).as("o"))
      // overlay source (focus-store shape): the nation/mktsegment
      // patterns keep TpchRdf's branch-pruned access paths; the
      // assurance pattern finds only the small metadata overlay
      val store = graft.sparql.TripleSource.overlay(TpchRdf.source(s, dir),
        graft.rdf.Rdr.annotate(base, "assurance", lit("gold")))
      graft.sparql.Compiler.compile(graft.sparql.Parser.parse(
        """SELECT ?c ?seg ?n ?v WHERE {
          |  <<?c nation ?n>> assurance ?v .
          |  ?c mktsegment ?seg .
          |} ORDER BY ?c""".stripMargin),
        store)
        .withColumn("sid", graft.rdf.Rdr.sid(col("c"), lit("nation"), col("n")))
    }),

    // OWL rules: sameAs normalization + TransitiveProperty closure +
    // inverseOf mirroring over a location subgraph with alias entities
    "owl_closure" -> ((s, dir) => {
      val cust = TpchRdf.table(s, dir, "customer")
      val nat = TpchRdf.table(s, dir, "nation")
      def id(pfx: String, c: org.apache.spark.sql.Column) =
        concat(lit(pfx), c.cast("string"))
      val inst = cust.select(id("c:", col("c_custkey")).as("s"),
          lit("within").as("p"), id("n:", col("c_nationkey")).as("o"))
        .unionAll(nat.select(id("n:", col("n_nationkey")), lit("within"),
          id("r:", col("n_regionkey"))))
        // alias entities: nn:<k> owl:sameAs n:<k>, carrying a label that
        // must surface on the canonical id after normalization
        .unionAll(nat.select(id("nn:", col("n_nationkey")), lit("sameAs"),
          id("n:", col("n_nationkey"))))
        .unionAll(nat.select(id("nn:", col("n_nationkey")), lit("alias_name"),
          col("n_name")))
      graft.inference.Owl.closure(inst,
        graft.inference.Owl.Ontology(
          transitive = Seq("within"),
          inverses = Seq("within" -> "contains")))
        .orderBy("s", "p", "o")
    }),

    // commit-MAINTAINED OWL closure (TruthMaintenance over the full
    // rule program, inf/TruthMaintenance.java + rules/FullClosure.java
    // analog): the closed journal tracks Rdfs∘Owl per commit — assert
    // nations+aliases, assert customers, retract a customer slice —
    // and the final commit point must equal the batch closure of the
    // surviving base (the oracle replays exactly that)
    "owl_maintained" -> ((s, dir) => {
      import s.implicits._
      val cust = TpchRdf.table(s, dir, "customer")
      val nat = TpchRdf.table(s, dir, "nation")
      def id(pfx: String, c: org.apache.spark.sql.Column) =
        concat(lit(pfx), c.cast("string"))
      val natTriples = nat.select(id("n:", col("n_nationkey")).as("s"),
          lit("within").as("p"), id("r:", col("n_regionkey")).as("o"))
        .unionAll(nat.select(id("nn:", col("n_nationkey")), lit("sameAs"),
          id("n:", col("n_nationkey"))))
        .unionAll(nat.select(id("nn:", col("n_nationkey")), lit("alias_name"),
          col("n_name")))
      val custTriples = cust.select(id("c:", col("c_custkey")).as("s"),
        lit("within").as("p"), id("n:", col("c_nationkey")).as("o"))
      val emptyOnt = Rdfs.Ontology(
        subClassOf = Seq.empty[(String, String)].toDF("sub", "sup"),
        subPropertyOf = Seq.empty[(String, String)].toDF("sub", "sup"),
        domain = Seq.empty[(String, String)].toDF("p", "cls"),
        range = Seq.empty[(String, String)].toDF("p", "cls"))
      val tm = graft.inference.MaintainedClosure.create(s,
        java.nio.file.Files.createTempDirectory("graft_owlm").toString,
        emptyOnt,
        Some(graft.inference.Owl.Ontology(
          transitive = Seq("within"), inverses = Seq("within" -> "contains"))))
      tm.assertTriples(natTriples)   // OWL tier (sameAs + transitive)
      tm.assertTriples(custTriples)  // OWL tier (transitive splice)
      tm.retractTriples(cust.filter(col("c_custkey") % 3 === 0)
        .select(id("c:", col("c_custkey")).as("s"), lit("within").as("p"),
          id("n:", col("c_nationkey")).as("o")))
      tm.closure().orderBy("s", "p", "o")
    }),

    // DYNAMIC-ontology truth maintenance (round 16 — the engine half
    // of the server's truthMaintenance namespaces): the TBox arrives
    // AS STATEMENTS and the maintained program tracks it per commit.
    // Four commits walk every tier: an instance-only seed (no program
    // yet — closure = base), the vocabulary arriving (within becomes
    // transitive + inverse-paired; the vocab delta RE-DERIVES, so
    // already-stored nation edges grow their entailments), a big
    // structural assert under the now-cached extracted program (MID
    // tier: delta-keyed incremental TC, never a re-closure), and an
    // OWL-active retraction (re-derive-and-diff). The oracle derives
    // the final entailed state independently in SQL.
    "tm_dynamic" -> ((s, dir) => {
      import s.implicits._
      val cust = TpchRdf.table(s, dir, "customer")
      val nat = TpchRdf.table(s, dir, "nation")
      def id(pfx: String, c: org.apache.spark.sql.Column) =
        concat(lit(pfx), c.cast("string"))
      val tmpDir = java.nio.file.Files.createTempDirectory("graft_tmdyn")
      sys.addShutdownHook {
        try {
          java.nio.file.Files.walk(tmpDir)
            .sorted(java.util.Comparator.reverseOrder())
            .forEach(f => java.nio.file.Files.deleteIfExists(f))
        } catch { case scala.util.control.NonFatal(_) => () }
      }
      val tm = graft.inference.MaintainedClosure.createDynamic(s, tmpDir.toString)
      tm.assertTriples(nat.select(id("n:", col("n_nationkey")).as("s"),
        lit("within").as("p"), id("r:", col("n_regionkey")).as("o")))   // v1
      tm.assertTriples(Seq(("within", "type", "TransitiveProperty"),
        ("within", "inverseOf", "contains")).toDF("s", "p", "o"))       // v2
      tm.assertTriples(cust.select(id("c:", col("c_custkey")).as("s"),
        lit("within").as("p"), id("n:", col("c_nationkey")).as("o")))   // v3
      tm.retractTriples(cust.filter(col("c_custkey") % 3 === 0)
        .select(id("c:", col("c_custkey")).as("s"), lit("within").as("p"),
          id("n:", col("c_nationkey")).as("o")))                        // v4
      tm.closure().orderBy("s", "p", "o")
    }),

    // owl:equivalentClass / owl:equivalentProperty / owl:hasValue
    // (RuleOwlEquivalentClass/RuleOwlEquivalentProperty/RuleOwlHasValue):
    // equivalences fold into the RDFS strata as mutual sub-edges; the
    // hasValue restriction types BUILDING customers, and that type
    // lifts through subClassOf (stratification proof)
    "owl_equiv" -> ((s, dir) => {
      import s.implicits._
      val cust = TpchRdf.table(s, dir, "customer")
      val cid = concat(lit("c:"), col("c_custkey").cast("string"))
      val inst = cust.select(cid.as("s"), lit("type").as("p"), lit("Customer").as("o"))
        .unionAll(cust.select(cid, lit("mktsegment"), col("c_mktsegment")))
      val ont = graft.inference.Owl.withEquivalences(
        Rdfs.Ontology(
          subClassOf = Seq(("Customer", "Agent"), ("BuildingCustomer", "Priority"))
            .toDF("sub", "sup"),
          subPropertyOf = Seq.empty[(String, String)].toDF("sub", "sup"),
          domain = Seq.empty[(String, String)].toDF("p", "cls"),
          range = Seq.empty[(String, String)].toDF("p", "cls")),
        equivalentClasses = Seq(("Customer", "Patron")),
        equivalentProperties = Seq(("mktsegment", "segment")))
      val restr = Seq(("BuildingCustomer", "mktsegment", "BUILDING")).toDF("cls", "p", "v")
      Rdfs.closure(inst.unionAll(graft.inference.Owl.hasValueTypes(inst, restr)), ont)
        .orderBy("s", "p", "o")
    }),

    // truth maintenance: assert a delta against an already-closed store
    // (TruthMaintenance/SPOAssertionBuffer analog) — must equal the
    // from-scratch closure, and the driver's oracle checks exactly that
    "rdfs_incremental" -> ((s, dir) => {
      val tri = TpchRdf.triplesFor(s, dir, Seq("customer", "nation", "region", "supplier"))
        .filter(col("p").isin("type", "nation", "region"))
      val base = tri.filter(!col("s").startsWith("s:"))
      val delta = tri.filter(col("s").startsWith("s:"))
      Rdfs.incrementalClosure(Rdfs.closure(base, ontology(s)), delta, ontology(s))
        .filter(col("p").isin("type", "locatedIn", "nation", "region"))
        .orderBy("s", "p", "o")
    }),

    // truth maintenance, retraction side: delete-rederive (DRed) —
    // retracting the supplier statements must equal the from-scratch
    // closure WITHOUT them (nation Place types supported only by
    // suppliers disappear; ones also supported by customers survive
    // the rederive step)
    "rdfs_retract" -> ((s, dir) => {
      // the instance slice feeds closure, the base anti-joins (×2) and
      // the retraction filter — materialized once, like closure does
      // internally (re-scanning 4 tables per consumer otherwise)
      val tri = TpchRdf.triplesFor(s, dir, Seq("customer", "nation", "region", "supplier"))
        .filter(col("p").isin("type", "nation", "region"))
        .localCheckpoint()
      val retracted = tri.filter(col("s").startsWith("s:"))
      Rdfs.retractClosure(Rdfs.closure(tri, ontology(s)), tri, retracted, ontology(s))
        .filter(col("p").isin("type", "locatedIn", "nation", "region"))
        .orderBy("s", "p", "o")
    }),

    // lexicon round-trip: hash-id encode (map-only, no dictionary
    // build) → id→term dictionary → decode joins
    "lexicon_roundtrip" -> ((s, dir) => {
      val tri = TpchRdf.triplesFor(s, dir, Seq("nation"))
      graft.rdf.Lexicon.decode(graft.rdf.Lexicon.encode(tri),
        graft.rdf.Lexicon.dictionary(tri)).orderBy("s", "p", "o")
    }),

    // Blueprints WRITE surface driver-keyed (MutableGraph, the
    // BigdataGraph mutation half): add/replace/remove ops over the
    // TPC-H property graph, the result read back through the
    // traversal façade — setProperty REPLACES (single-valued),
    // removeVertex drops incident edges, removeEdge is exact
    "blueprints_write" -> ((s, dir) => {
      val base = TpchRdf.triplesFor(s, dir, Seq("nation", "region"))
        .filter(col("p").isin("type", "name", "region"))
      var g = graft.graph.MutableGraph(TripleStore(base))
      g = g.addVertex("n:99", "Nation")
      g = g.setProperty("n:99", "name", "ATLANTIS")
      g = g.addEdge("n:99", "region", "r:1")
      g = g.setProperty("n:1", "name", "RENAMED")
      g = g.removeProperty("n:2", "region")
      g = g.removeVertex("r:0")
      g.traversal.V().has("type", "Nation").has("region").values("name")
        .orderBy("value")
    }),

    // skew-safe join driver-keyed (SkewJoin.saltedInner): the salted
    // join must EQUAL the plain join — salting replicates the small
    // side across salt buckets and only reshapes the shuffle, so the
    // plain-join SQL IS the oracle
    "skew_salted_join" -> ((s, dir) => {
      val orders = s.read.parquet(s"$dir/orders.parquet")
        .select(col("o_custkey").as("custkey"), col("o_totalprice"))
      val cust = s.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey").as("custkey"), col("c_mktsegment"))
      graft.operators.SkewJoin.saltedInner(orders, cust, "custkey", 8)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
             sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
        .orderBy("c_mktsegment")
    }),

    // GOM (bigdata-gom): object-graph navigation with BATCHED
    // materialization (initGPOs = one fetch job for all regions),
    // reverse-link aggregation (ILinkSet), and a write-back flushed as
    // ONE delta commit under a native transaction; the result reads
    // back through SPARQL over the updated store
    "gom_traversal" -> ((s, dir) => {
      val om = graft.gom.ObjectManager.ofTriples(s,
        TpchRdf.triplesFor(s, dir, Seq("nation", "region")))
      val regionIds = om.evaluate("""SELECT ?r WHERE { ?r type "Region" }""")
        .collect().map(_.getString(0)).toSeq.sorted
      val t = om.beginNativeTransaction()
      val regions = om.initGPOs(regionIds)
      regionIds.foreach { rid =>
        val r = regions(rid)
        r.setValue("nations", r.getLinksIn("region").sizeLong.toString)
      }
      om.commitNativeTransaction(t)
      om.evaluate("""SELECT ?r_name ?nations WHERE {
          ?r type "Region" . ?r name ?r_name . ?r nations ?nations }""")
        .orderBy("r_name")
    }),

    "stream_window" -> ((s, dir) => {
      // Structured Streaming over the bounded events table: tumbling
      // 1-day windows per event_type, complete-mode memory sink.
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      // glob form: the streaming file source requires a directory/glob
      val stream = TpchRdf.tsNanos(s.readStream.schema(schema).parquet(s"$dir/events.*"))
        // ns-epoch LONG (normalized); `div` keeps the µs conversion exact
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      val agg = stream
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
             sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      val name = "stream_window_sink"
      val q = agg.writeStream.format("memory").queryName(name)
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.table(name)
        .select(date_format(col("w.start"), "yyyy-MM-dd").as("day"),
                col("event_type"), col("n_events"), col("total_value"))
        .orderBy("day", "event_type")
    }),

    // stream-static enrichment join: the streaming side joins a static
    // dimension without any stream-side state (the dim is broadcast /
    // re-read per micro-batch — the standard enrich shape)
    "stream_enrich" -> ((s, dir) => {
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      val stream = s.readStream.schema(schema).parquet(s"$dir/events.*")
      val cust = s.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey"),
          concat(lit("n:"), col("c_nationkey").cast("string")).as("nation"))
      val agg = stream.join(cust, stream("user_id") === cust("c_custkey"))
        .groupBy("nation")
        .agg(count(lit(1)).as("n_events"),
             sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      val name = "stream_enrich_sink"
      val q = agg.writeStream.format("memory").queryName(name)
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.table(name).orderBy("nation")
    }),

    // stream-stream INTERVAL JOIN — the streaming class the other
    // stream_* queries don't cover: both sides watermarked, join state
    // pruned by the watermark + time-range condition (views joined to
    // the same user's purchases within 30 minutes). Inner interval
    // joins are batching-invariant here: the 1h watermark always lags
    // the 30min join window, so no matching pair is ever pruned early.
    "stream_stream_join" -> ((s, dir) => {
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      def src = TpchRdf.tsNanos(s.readStream.schema(schema).parquet(s"$dir/events.*"))
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      val views = src.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_id"),
          col("ts").as("view_ts"))
        .withWatermark("view_ts", "1 hour")
      val buys = src.filter(col("event_type") === "purchase")
        .select(col("user_id").as("b_user"), col("event_id").as("purchase_id"),
          col("ts").as("purchase_ts"))
        .withWatermark("purchase_ts", "1 hour")
      val joined = views.join(buys,
          col("user_id") === col("b_user") &&
            col("purchase_ts") > col("view_ts") &&
            col("purchase_ts") <= col("view_ts") + expr("INTERVAL 30 MINUTES"))
        .select("user_id", "view_id", "purchase_id")
      val name = "stream_join_sink"
      val q = joined.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.table(name).orderBy("user_id", "view_id", "purchase_id")
    }),

    // watermarked streaming dedup (exactly-once on late/replayed ids)
    // feeding a downstream aggregate
    "stream_dedup" -> ((s, dir) => {
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      val stream = TpchRdf.tsNanos(s.readStream.schema(schema).parquet(s"$dir/events.*"))
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      val agg = stream
        .withWatermark("ts", "1 hour")
        .dropDuplicates("event_id")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"))
      val name = "stream_dedup_sink"
      val q = agg.writeStream.format("memory").queryName(name)
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.table(name).orderBy("event_type")
    }),

    // stateful Structured Streaming: flatMapGroupsWithState keyed on
    // user, state = the open session (EventTimeTimeout, no per-batch
    // flush). The input is staged as 3 time-ordered files with
    // maxFilesPerTrigger=1, so sessions MUST survive micro-batch
    // boundaries; trailing sessions drain via EndOfStream sentinels.
    "stream_sessionize" -> ((s, dir) => {
      val ev = TpchRdf.tsNanos(s.read.parquet(s"$dir/events.parquet"))
      val in = java.nio.file.Files.createTempDirectory("graft_sess").toString
      graft.operators.Sessionize.stageBoundedInput(ev, in, splits = 2)
      val stream = s.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$in/*.parquet")
      val sessions = graft.operators.Sessionize
        .byGapStreaming(stream, 30L * 60 * 1000000000L)
      val name = "stream_sessionize_sink"
      val q = sessions.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.table(name)
        .select(col("user_id"), col("sess_idx"), col("n_events"),
          date_format(timestamp_micros(expr("start_ns div 1000")), "yyyy-MM-dd HH:mm:ss").as("start_s"),
          date_format(timestamp_micros(expr("end_ns div 1000")), "yyyy-MM-dd HH:mm:ss").as("end_s"))
        .orderBy("user_id", "sess_idx")
    }),

    // as-of join: each click picks up the latest at-or-before view of
    // the same user — one key shuffle + sorted carry-forward, never a
    // ts-range pair explosion (see AsofJoin scaladoc)
    "events_asof" -> ((s, dir) => {
      val ev = TpchRdf.tsNanos(TpchRdf.table(s, dir, "events"))
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "ts", "user_id", "value")
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id").as("view_event_id"),
          col("value").as("view_value"))
      graft.operators.AsofJoin.leftAsof(clicks, views, "user_id", "ts",
          "view_event_id", Seq("view_event_id", "view_value"))
        .select("event_id", "user_id", "value", "view_event_id", "view_value")
        .orderBy("event_id")
    }),

    // ANALYZE-style profile: one unpivoted scan → per-column row/null
    // counts + HLL distinct estimates (|cols|·(2^p+1) shuffled rows)
    "table_profile" -> ((s, dir) => {
      val li = TpchRdf.table(s, dir, "lineitem")
      graft.operators.TableProfile.profile(li,
          Seq("l_orderkey", "l_partkey", "l_suppkey", "l_returnflag", "l_linestatus"))
        .orderBy("cname")
    }),

    // HyperLogLog distinct parts per returnflag — register-sized
    // shuffle (2^p rows/group, map-side combined), exact countDistinct
    // joined alongside to show the estimate lands
    "sketch_hll" -> ((s, dir) => {
      val li = TpchRdf.table(s, dir, "lineitem")
      val sk = graft.operators.Sketch.hllDistinct(li, Seq("l_returnflag"), col("l_partkey"))
      val ex = li.groupBy("l_returnflag").agg(countDistinct("l_partkey").as("n_exact"))
      sk.join(ex, "l_returnflag").orderBy("l_returnflag")
    }),

    // hour-of-day × event-type activity heatmap (UTC) — one aggregate,
    // 24·|types| output rows
    "events_heatmap" -> ((s, dir) => {
      val ev = TpchRdf.tsNanos(TpchRdf.table(s, dir, "events"))
      ev.groupBy(hour(timestamp_micros(expr("ts div 1000"))).cast("long").as("hour_utc"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
        .orderBy("hour_utc", "event_type")
    }),

    // STREAMING transition counting: per-user last-event state carries
    // boundary-spanning transitions across micro-batches — same batch
    // oracle as events_transitions (batching-invariant)
    "stream_transitions" -> ((s, dir) => {
      val ev = TpchRdf.tsNanos(TpchRdf.table(s, dir, "events"))
        .select("user_id", "ts", "event_id", "event_type")
      graft.operators.Transitions.run(s, ev).orderBy("from_type", "to_type")
    }),

    // per-user event-type transition matrix (the Markov-chain view of
    // user journeys): lag over (user, ts-order) — one user-keyed
    // window shuffle, output |types|² rows
    "events_transitions" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = TpchRdf.tsNanos(TpchRdf.table(s, dir, "events"))
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      ev.select(col("user_id"), col("event_type").as("to_type"),
          lag("event_type", 1).over(w).as("from_type"))
        .filter(col("from_type").isNotNull)
        .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
        .orderBy("from_type", "to_type")
    }),

    // per-user 3σ outliers, ALL-INTEGER decision arithmetic: with
    // exact cent counts c and per-user (n, S1=Σc, S2=Σc²), the test
    // v−mean > 3σ becomes (c·n−S1)² > 9·(n·S2−S1²) ∧ c·n>S1 — no
    // float mean/stddev whose summation order could flip a boundary
    // event between engines. One user-keyed aggregate + broadcast-back
    // join; stats rows are user-sized, never event-sized.
    "events_outliers" -> ((s, dir) => {
      val ev = TpchRdf.table(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("value"),
          round(col("value") * 100).cast("long").as("c"))
      val st = ev.groupBy("user_id").agg(count(lit(1)).as("n"),
        sum("c").as("s1"), sum(col("c") * col("c")).as("s2"))
      // cross products (d², n·S2, S1²) ride decimal(38,0), not long:
      // 1M events/user at ~$10⁷ cents keeps every term under 10³⁸, while
      // the long form would wrap silently at S1 ≈ 3·10⁹ (S1² > 2⁶³) —
      // the exact cross-engine divergence DuckDB surfaces as HUGEINT
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val d = col("c").cast(dec) * col("n").cast(dec) - col("s1").cast(dec)
      ev.join(st, "user_id")
        .filter(d > 0 && d * d >
          lit(9L).cast(dec) * (col("n").cast(dec) * col("s2").cast(dec) -
            col("s1").cast(dec) * col("s1").cast(dec)))
        .select("event_id", "user_id", "value")
        .orderBy("event_id")
    }),

    // cohort retention: users grouped by first-seen day, distinct
    // active users at each day offset ≤ 7 — two user-keyed aggregates
    // + a count, never a per-user event collect
    "events_retention" -> ((s, dir) => {
      val ev = TpchRdf.tsNanos(TpchRdf.table(s, dir, "events"))
        .select(col("user_id"),
          to_date(timestamp_micros(expr("ts div 1000"))).as("d"))
      val cohort = ev.groupBy("user_id").agg(min("d").as("c0"))
      ev.join(cohort, "user_id")
        .select(col("user_id"), col("c0"), datediff(col("d"), col("c0")).as("k"))
        .filter(col("k") <= 7).distinct()
        .groupBy(date_format(col("c0"), "yyyy-MM-dd").as("cohort_day"),
          col("k").cast("long").as("day_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_day", "day_offset")
    }),

    // funnel analytics: per user, earliest view → first click at/after
    // it → first error at/after that; three conditional-min aggregates
    // each shuffling one row per user — never a sequence collect
    "events_funnel" -> ((s, dir) => {
      val ev = TpchRdf.tsNanos(TpchRdf.table(s, dir, "events"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("v_ts"))
      val c = ev.filter(col("event_type") === "click").join(v, "user_id")
        .filter(col("ts") >= col("v_ts"))
        .groupBy("user_id").agg(min("ts").as("c_ts"), min("v_ts").as("v_ts"))
      val e = ev.filter(col("event_type") === "error").join(c, "user_id")
        .filter(col("ts") >= col("c_ts"))
        .groupBy("user_id").agg(min("ts").as("e_ts"),
          min("c_ts").as("c_ts"), min("v_ts").as("v_ts"))
      e.select(col("user_id"),
          (col("c_ts") - col("v_ts")).as("click_delay_ns"),
          (col("e_ts") - col("c_ts")).as("error_delay_ns"))
        .orderBy("user_id")
    }),

    // STREAMING HyperLogLog: registers maintained as a streaming max
    // aggregate over 3 hash-staged micro-batches — max-semilattice
    // merge makes the result bit-identical to the batch sketch (the
    // oracle replays the batch formula)
    "stream_hll" -> ((s, dir) => {
      val ev = TpchRdf.table(s, dir, "events")
      val sk = graft.operators.Sketch.hllStreaming(
        ev.select("event_type", "user_id"), Seq("event_type"), col("user_id"))
      val ex = ev.groupBy("event_type").agg(countDistinct("user_id").as("n_exact"))
      sk.join(ex, "event_type").orderBy("event_type")
    }),

    // interval join: per error event, the same user's clicks in the
    // preceding 2 hours — bucketized equi-join, never a per-key
    // cartesian (see RangeJoin scaladoc)
    "events_range" -> ((s, dir) => {
      val ev = TpchRdf.tsNanos(TpchRdf.table(s, dir, "events"))
      val errors = ev.filter(col("event_type") === "error")
        .select("event_id", "ts", "user_id")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("value").as("click_value"))
      graft.operators.RangeJoin.intervalJoin(errors, clicks, "user_id", "ts",
          before = 7200L * 1000000000L, after = 0L)
        .groupBy("event_id")
        .agg(count(lit(1)).as("n_clicks"),
          sum(col("click_value").cast("decimal(18,2)")).cast("double").as("click_sum"))
        .orderBy("event_id")
    }),

    "events_sessionize" -> ((s, dir) => {
      val ev = TpchRdf.tsNanos(TpchRdf.table(s, dir, "events")) // ts as ns-epoch long
      graft.operators.Sessionize.byGap(ev, 30L * 60 * 1000000000L)
        .select(col("user_id"), col("sess_idx"), col("n_events"),
          date_format(timestamp_micros(expr("start_ns div 1000")), "yyyy-MM-dd HH:mm:ss").as("start_s"),
          date_format(timestamp_micros(expr("end_ns div 1000")), "yyyy-MM-dd HH:mm:ss").as("end_s"))
        .orderBy("user_id", "sess_idx")
    }),

    // the same update, but arriving as SPARQL UPDATE *text*
    "sparql_parsed_update" -> ((s, dir) => {
      val store = TripleStore(TpchRdf.triplesFor(s, dir, Seq("customer")))
      val op = graft.sparql.Parser.parseUpdate(
        """DELETE { ?c mktsegment ?seg }
          |INSERT { ?c segment_class ?cls }
          |WHERE {
          |  ?c mktsegment ?seg .
          |  BIND(IF(?seg = "BUILDING" || ?seg = "AUTOMOBILE", "RETAIL", "OTHER") AS ?cls)
          |}""".stripMargin)
      graft.sparql.Update(store, op).triples
        .filter(col("p").isin("mktsegment", "segment_class", "acctbal") && col("s").startsWith("c:"))
        .orderBy("s", "p", "o")
    }),

    // Blueprints/Gremlin-style traversal over the property-graph façade
    "blueprints_traversal" -> ((s, dir) =>
      graft.graph.PropertyGraph(TpchRdf.source(s, dir))
        .V().has("mktsegment", "BUILDING").out("nation").out("region")
        .values("name").distinct().orderBy("value")),

    // DESCRIBE ?v WHERE { … } — describe every solution node
    "describe_where" -> ((s, dir) =>
      graft.sparql.Compiler.compile(graft.sparql.Parser.parse(
        """DESCRIBE ?s WHERE { ?s nation "n:1" . ?s type "Supplier" }"""),
        TpchRdf.source(s, dir)).orderBy("s", "p", "o")),

    "update_delete_insert" -> ((s, dir) => {
      // DELETE { ?c mktsegment ?seg } INSERT { ?c segment_class ?cls }
      // WHERE  { ?c mktsegment ?seg . BIND(retail-or-other AS ?cls) }
      // — scoped to the customer subgraph (the lineitem/orders branches
      // are untouched by this update, so they're never scanned)
      val store = TripleStore(TpchRdf.triplesFor(s, dir, Seq("customer")))
      val matched = store.filterP("mktsegment")
      val inserts = matched.select(col("s"),
        lit("segment_class").as("p"),
        when(col("o").isin("BUILDING", "AUTOMOBILE"), "RETAIL").otherwise("OTHER").as("o"))
      val updated = store.deleteInsert(matched, inserts)
      updated.triples
        .filter(col("p").isin("mktsegment", "segment_class", "acctbal") && col("s").startsWith("c:"))
        .orderBy("s", "p", "o")
    }),

    // NAMED SOLUTION SET updates (the reference's SOLUTIONS grammar
    // extension, sparql.jj:335 / AST2BOpUpdate.java:728-1007): one
    // ';'-separated request CREATEs a set, APPENDs two SELECTs into it
    // (putSolutions), DELETEs matching solutions back out, and the
    // final query reads it via INCLUDE — connection-scoped sets on the
    // Graft handle, exactly the surface a reference SPARQL-cache user
    // migrates. Scale: the set materializes once (localCheckpoint) and
    // joins like any solution relation.
    "update_solutions" -> ((s, dir) => {
      val g = graft.Graft.ofTriples(s,
        TpchRdf.triplesFor(s, dir, Seq("nation", "region"))).update(
        """CREATE SOLUTIONS %picked ;
          |INSERT INTO %picked SELECT ?n ?nname
          |  WHERE { ?n region ?r . ?n name ?nname . ?r name "ASIA" } ;
          |INSERT INTO %picked SELECT ?n ?nname
          |  WHERE { ?n region ?r . ?n name ?nname . ?r name "AFRICA" } ;
          |DELETE FROM %picked SELECT ?n ?nname
          |  WHERE { ?n name ?nname . ?n name "INDIA" }""".stripMargin)
      g.query("SELECT ?n ?nname WHERE { INCLUDE %picked } ORDER BY ?n ?nname")
    }),
  )

  val quadDefs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // quads mode: triples carry a named-graph column; GRAPH ?g {} shape
    "graph_quads" -> ((s, dir) =>
      TpchRdf.quads(s, dir).groupBy("g").agg(count(lit(1)).as("n_triples")).orderBy("g")),
    // GRAPH g:supplier { ?s acctbal ?bal } — graph-scoped pattern; both
    // literals bound → quadPattern resolves to ONE narrow scan of one
    // table (the SPOC-index analog)
    "graph_named_pattern" -> ((s, dir) =>
      TpchRdf.quadPattern(s, dir, Some("g:supplier"), Some("acctbal"))
        .select(col("s"), col("o").as("bal")).orderBy("s")),

    // SPARQL UPDATE text with GRAPH blocks against the quad store
    "graph_update" -> ((s, dir) => {
      val qs = graft.rdf.QuadStore(TpchRdf.quads(s, dir))
      val ins = graft.sparql.Parser.parseUpdate(
        """INSERT DATA {
          |  GRAPH g:annotations { r:0 reviewed "yes" . r:1 reviewed "yes" . r:2 reviewed "no" }
          |  GRAPH g:region { r:99 type "Region" }
          |}""".stripMargin)
      val del = graft.sparql.Parser.parseUpdate(
        """DELETE DATA { GRAPH g:annotations { r:2 reviewed "no" } }""")
      graft.sparql.Update.applyQuads(graft.sparql.Update.applyQuads(qs, ins), del)
        .quads.groupBy("g").agg(count(lit(1)).as("n_triples")).orderBy("g")
    }),

    // WITH <g> DELETE/INSERT WHERE — graph-scoped update via text
    "graph_with_update" -> ((s, dir) => {
      val qs = graft.rdf.QuadStore(TpchRdf.quads(s, dir))
      val op = graft.sparql.Parser.parseUpdate(
        """WITH g:region
          |DELETE { ?r name ?n }
          |INSERT { ?r label ?n }
          |WHERE { ?r name ?n }""".stripMargin)
      graft.sparql.Update.applyQuads(qs, op)
        .graph("g:region").orderBy("s", "p", "o")
    }),

    // DELETE/INSERT with USING / USING NAMED: the WHERE evaluates
    // against the update-side dataset (default graph = merge of USING
    // graphs, GRAPH patterns range over USING NAMED), templates act on
    // the default graph (SPARQL 1.1 Update §3.1.3; reference:
    // DeleteInsertGraph carrying a DatasetNode)
    "update_using" -> ((s, dir) => {
      val qs = graft.rdf.QuadStore(TpchRdf.quads(s, dir))
      val op = graft.sparql.Parser.parseUpdate(
        """INSERT { ?n partof ?rname }
          |USING g:nation
          |USING NAMED g:region
          |WHERE { ?n region ?r . GRAPH ?g { ?r name ?rname } }""".stripMargin)
      graft.sparql.Update.applyQuads(qs, op)
        .graph("g:default").orderBy("s", "p", "o")
    }),

    // QUAD templates (SPARQL 1.1 Update grammar [49] QuadPattern;
    // reference: ast.QuadsData via AST2BOpUpdate): GRAPH blocks inside
    // the DELETE/INSERT templates themselves — one parsed op archives
    // region names into g:archive, drops them from g:region, and
    // stamps a default-graph marker; each template triple routes to
    // its OWN graph
    "update_quad_template" -> ((s, dir) => {
      val qs = graft.rdf.QuadStore(TpchRdf.quads(s, dir))
      val op = graft.sparql.Parser.parseUpdate(
        """DELETE { GRAPH g:region { ?r name ?n } }
          |INSERT { GRAPH g:archive { ?r name ?n } . ?r archived "y" }
          |WHERE { ?r name ?n . ?r type "Region" }""".stripMargin)
      graft.sparql.Update.applyQuads(qs, op)
        .quads.filter(col("g").isin("g:region", "g:archive", "g:default"))
        .orderBy("g", "s", "p", "o")
    }),

    // SPARQL 1.1 graph management: COPY / MOVE / DROP on the quad store
    // (reference: ast/CreateGraph.java family via AST2BOpUpdate)
    "graph_management" -> ((s, dir) => {
      val qs = graft.rdf.QuadStore(TpchRdf.quads(s, dir))
        .copyGraph("g:nation", "g:staging")
        .moveGraph("g:region", "g:archive")
        .dropGraph("g:part")
      qs.quads.groupBy("g").agg(count(lit(1)).as("n_triples")).orderBy("g")
    }),

    // TEXT-form graph management: a full ';'-separated UPDATE request
    // (CLEAR/COPY/MOVE/DROP/CREATE/ADD + INSERT DATA + LOAD from an
    // N-Triples file) parsed and applied in request order (reference:
    // ast/CreateGraph.java family + ast/LoadGraph via AST2BOpUpdate)
    "graph_mgmt_text" -> ((s, dir) => {
      val nt = java.nio.file.Files.createTempFile("graft_load", ".nt")
      java.nio.file.Files.writeString(nt,
        "<urn:graft:x:1> <urn:graft:note> \"alpha\" .\n" +
        "<urn:graft:x:2> <urn:graft:note> \"beta\" .\n")
      val ops = graft.sparql.Parser.parseUpdates(
        s"""CLEAR GRAPH g:part ;
           |COPY g:nation TO g:staging ;
           |MOVE g:region TO g:archive ;
           |DROP SILENT GRAPH g:lineitem ;
           |CREATE GRAPH g:fresh ;
           |ADD g:archive TO g:staging ;
           |INSERT DATA { GRAPH g:staging { y:1 note "gamma" } } ;
           |LOAD <file://$nt> INTO GRAPH g:loaded""".stripMargin)
      graft.sparql.Update
        .applyQuadsSeq(graft.rdf.QuadStore(TpchRdf.quads(s, dir)), ops)
        .quads.groupBy("g").agg(count(lit(1)).as("n_triples")).orderBy("g")
    }),

    // Persistent versioned store (reference: com.bigdata.journal
    // .AbstractJournal — append-only commits sealed into commit
    // points, historical reads from any commit point): commit /
    // tombstone / compact / post-compaction delta, resolved snapshot.
    // Within-commit semantics: deletes before inserts (§3.1.3), so
    // nation 1's delete+re-add of its name leaves it present.
    "store_journal" -> ((s, dir) => {
      import s.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("graft_journal").toString
      val j = graft.rdf.Journal.create(s, tmp)
      val nation = TpchRdf.table(s, dir, "nation")
      def idc(prefix: String, c: org.apache.spark.sql.Column) =
        concat(lit(prefix + ":"), c.cast("string"))
      val names = nation.select(idc("n", col("n_nationkey")).as("s"),
        lit("name").as("p"), col("n_name").as("o"), lit("g:n").as("g"))
      val regions = nation.select(idc("n", col("n_nationkey")).as("s"),
        lit("region").as("p"), idc("r", col("n_regionkey")).as("o"), lit("g:n").as("g"))
      j.append(names.unionAll(regions))
      val audited = nation.filter(col("n_regionkey") === 1)
        .select(idc("n", col("n_nationkey")).as("s"), lit("audited").as("p"),
          lit("yes").as("o"), lit("g:n").as("g"))
      val n1name = names.filter(col("s") === "n:1")
      j.commit(
        adds = audited.unionAll(n1name),
        dels = regions.filter(col("o") === "r:0").unionAll(n1name))
      j.compact()
      j.append(Seq(("meta:journal", "compacted", "true", "g:meta"))
        .toDF("s", "p", "o", "g"))
      j.snapshot().orderBy("s", "p", "o", "g")
    }),

    // QUERYABLE history service over the journal commit log (SERVICE
    // bd:history — graft.sparql.HistoryService): the reference
    // default-REGISTERS bd:history/bd:rdrhistory but both factories
    // throw on create (HistoryServiceFactory.java:104) — they are
    // change-capture listeners with no read side; this supplies it.
    // Two commits (nation names; region names + one name retraction),
    // replayed as the version-attributed change log from an EXCLUSIVE
    // fromVersion bound — delta segments only, never a head scan.
    "history_service" -> ((s, dir) => {
      val tmpDir = java.nio.file.Files.createTempDirectory("graft_hist")
      sys.addShutdownHook {
        try {
          java.nio.file.Files.walk(tmpDir)
            .sorted(java.util.Comparator.reverseOrder())
            .forEach(f => java.nio.file.Files.deleteIfExists(f))
        } catch { case scala.util.control.NonFatal(_) => () }
      }
      val j = graft.rdf.Journal.create(s, tmpDir.toString)
      def idc(prefix: String, c: org.apache.spark.sql.Column) =
        concat(lit(prefix + ":"), c.cast("string"))
      val names = TpchRdf.table(s, dir, "nation")
        .select(idc("n", col("n_nationkey")).as("s"), lit("name").as("p"),
          col("n_name").as("o"), lit("g:n").as("g"))
      j.append(names) // v1
      j.commit(       // v2: region names in, n:1's name retracted
        adds = TpchRdf.table(s, dir, "region")
          .select(idc("r", col("r_regionkey")).as("s"), lit("name").as("p"),
            col("r_name").as("o"), lit("g:r").as("g")),
        dels = names.filter(col("s") === "n:1"))
      // per-evaluation DYNAMIC scope (withJournal), not the process-
      // global register/unregister pair — reentrant under concurrent
      // query evaluation and leaves no global registration behind
      graft.sparql.HistoryService.withJournal(j) {
        graft.sparql.Compiler.compile(graft.sparql.Parser.parse(
          """SELECT ?s ?o ?v ?act WHERE {
            |  SERVICE bd:history {
            |    _:h bd:fromVersion "1" .
            |    _:h bd:outSubject ?s .
            |    _:h bd:outObject ?o .
            |    _:h bd:outVersion ?v .
            |    _:h bd:outAction ?act .
            |  }
            |} ORDER BY ?v ?act ?s""".stripMargin),
          graft.sparql.TripleSource.plain(j.snapshot().select("s", "p", "o")))
      }
    }),

    // Durable repository with DELTA-shaped SPARQL UPDATE commits
    // (reference: BigdataSailRepository/SailConnection.commit staging
    // its assert/retract buffers into the journal's commit point).
    // The update request's ground INSERT DATA + WITH-scoped
    // DELETE/INSERT WHERE commit their OWN mutation sets — the plan
    // never anti-joins the full store (the 100-TB write contract,
    // plan-asserted in RepositorySpec). Exercises seed append, the
    // multi-op delta fold, compaction, and a cold reopen.
    "store_repository" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_repoq").toString
      val repo = graft.rdf.Repository.create(s, tmp)
      val nation = TpchRdf.table(s, dir, "nation")
      repo.journal.append(nation.select(
        concat(lit("n:"), col("n_nationkey").cast("string")).as("s"),
        lit("name").as("p"), col("n_name").as("o"), lit("g:n").as("g")))
      repo.update(
        """INSERT DATA { GRAPH g:meta { meta:repo versioned "true" } } ;
          |WITH g:n DELETE { ?n name ?x } INSERT { ?n renamed ?x }
          |WHERE { ?n name ?x . FILTER(STRSTARTS(?x, "A")) }""".stripMargin)
      repo.compact()
      graft.rdf.Repository.open(s, tmp).connection().store.quads
        .orderBy("s", "p", "o", "g")
    }),

    // Serializer round-trip as a DRIVER-checked path (reference: the
    // Rio writer/parser pairing — exports must reload losslessly):
    // quads render to N-Quads lines (map-only, distributed write),
    // the line loader parses them back, and the oracle replays the
    // original relational content — any escaping or term-form drift
    // breaks the hash.
    "export_roundtrip" -> ((s, dir) => {
      val nation = TpchRdf.table(s, dir, "nation")
      def idc(p: String, c: org.apache.spark.sql.Column) =
        concat(lit(p + ":"), c.cast("string"))
      val quads = nation.select(idc("n", col("n_nationkey")).as("s"),
          lit("name").as("p"), col("n_name").as("o"), lit("g:n").as("g"))
        .unionAll(nation.select(idc("n", col("n_nationkey")).as("s"),
          lit("region").as("p"), idc("r", col("n_regionkey")).as("o"),
          lit("g:n").as("g")))
      val out = java.nio.file.Files.createTempDirectory("graft_export")
        .toString + "/nq"
      graft.rdf.Serializer.toNQuads(quads).write.mode("overwrite").text(out)
      graft.sparql.Update.loadQuads(s, out).orderBy("s", "p", "o", "g")
    }),

    // SPARQL results serialization as a DRIVER-checked path (the
    // NanoSparqlServer CSV response body): solution terms render per
    // RFC-4180 — IRIs re-expand under the base, literals plain — and
    // the oracle reproduces the exact byte content of each row.
    "results_csv" -> ((s, dir) => {
      val nation = TpchRdf.table(s, dir, "nation")
      val sol = nation.select(
        concat(lit("n:"), col("n_nationkey").cast("string")).as("s"),
        col("n_name").as("name"))
      graft.rdf.Serializer.sparqlCsvRows(sol).orderBy("value")
    }),

    // LOAD of a Turtle document (reference: the Rio loaders in
    // bigdata-rdf/rio/ — the migrating user's first action): prefixes,
    // `a`, ';'/',' lists, a nested [ … ] bnode, lang-tagged and typed
    // literals landing as RdfLiteral term forms
    "load_turtle" -> ((s, dir) => {
      val ttl = java.nio.file.Files.createTempFile("graft_load", ".ttl")
      java.nio.file.Files.writeString(ttl,
        ("""@prefix v: <urn:graft:> .
          |@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
          |# fixture: everyday Turtle forms
          |v:t:1 a v:Thing ;
          |  v:label "alpha"@en , "alpha"@fr ;
          |  v:size "5"^^xsd:int .
          |v:t:2 v:label "beta" ;
          |  v:near [ v:label "inner" ] .
          |v:t:3 v:items ( v:t:1 "x" 2 ) ;
          |  v:note TQmulti
          |line "quoted" textTQ .
          |v:t:4 v:items () .
          |""").stripMargin.replace("TQ", "\"\"\""))
      val ops = graft.sparql.Parser.parseUpdates(s"LOAD <file://$ttl> INTO GRAPH g:ttl")
      graft.sparql.Update
        .applyQuadsSeq(graft.rdf.QuadStore(TpchRdf.quads(s, dir)), ops)
        .graph("g:ttl")
        .select(unscope(col("s")).as("s"), col("p"), unscope(col("o")).as("o"))
        .orderBy("s", "p", "o")
    }),

    // LOAD of an RDF/XML document (reference: rio/ wires Rio's
    // RDFXMLParser — the format legacy ontologies and OWL files ship
    // in): typed node elements, property attributes, xml:lang and
    // rdf:datatype literals, nested/nodeID bnodes, parseType=Resource
    "load_rdfxml" -> ((s, dir) => {
      val rdf = java.nio.file.Files.createTempFile("graft_load", ".rdf")
      java.nio.file.Files.writeString(rdf,
        """<?xml version="1.0"?>
          |<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
          |         xmlns:v="urn:graft:">
          |  <v:Thing rdf:about="urn:graft:t:1" v:code="A1">
          |    <v:label xml:lang="en">alpha</v:label>
          |    <v:size rdf:datatype="http://www.w3.org/2001/XMLSchema#int">5</v:size>
          |    <v:near rdf:resource="urn:graft:t:2"/>
          |  </v:Thing>
          |  <rdf:Description rdf:about="urn:graft:t:2">
          |    <v:inner><rdf:Description rdf:nodeID="b7">
          |      <v:label>inner</v:label>
          |    </rdf:Description></v:inner>
          |    <v:meta rdf:parseType="Resource"><v:score>9</v:score></v:meta>
          |    <v:items rdf:parseType="Collection">
          |      <rdf:Description rdf:about="urn:graft:t:1"/>
          |      <rdf:Description rdf:nodeID="b9"/>
          |    </v:items>
          |    <v:doc rdf:parseType="Literal">x <b>y</b></v:doc>
          |  </rdf:Description>
          |</rdf:RDF>""".stripMargin)
      val ops = graft.sparql.Parser.parseUpdates(s"LOAD <file://$rdf> INTO GRAPH g:xml")
      graft.sparql.Update
        .applyQuadsSeq(graft.rdf.QuadStore(TpchRdf.quads(s, dir)), ops)
        .graph("g:xml")
        .select(unscope(col("s")).as("s"), col("p"), unscope(col("o")).as("o"))
        .orderBy("s", "p", "o")
    }),

    // LOAD of a JSON-LD document (reference: rio/ registers Rio's
    // JSONLDParser — the format web data ships in): @context term
    // maps + @type:@id coercion + compact IRIs, @id/@type, @value
    // literal objects with @language/@type, arrays, nested bnodes
    "load_jsonld" -> ((s, dir) => {
      val jl = java.nio.file.Files.createTempFile("graft_load", ".jsonld")
      java.nio.file.Files.writeString(jl,
        """{
          |  "@context": {
          |    "v": "urn:graft:",
          |    "label": "urn:graft:label",
          |    "size": "urn:graft:size",
          |    "near": {"@id": "urn:graft:near", "@type": "@id"},
          |    "Thing": "urn:graft:Thing"
          |  },
          |  "@graph": [
          |    {
          |      "@id": "urn:graft:t:1",
          |      "@type": "Thing",
          |      "label": [{"@value": "alpha", "@language": "en"}, "plain"],
          |      "size": {"@value": "5", "@type": "http://www.w3.org/2001/XMLSchema#int"},
          |      "near": "urn:graft:t:2"
          |    },
          |    {
          |      "@id": "urn:graft:t:2",
          |      "v:inner": {"label": "inner"},
          |      "v:weight": 3.5,
          |      "v:tags": {"@list": ["a", {"@value": "b", "@language": "en"}]},
          |      "v:empty": {"@list": []}
          |    },
          |    {
          |      "@id": "urn:graft:g:sub",
          |      "v:source": "crawl",
          |      "@graph": [{"@id": "urn:graft:t:9", "label": "ng"}]
          |    }
          |  ]
          |}""".stripMargin)
      val ops = graft.sparql.Parser.parseUpdates(s"LOAD <file://$jl> INTO GRAPH g:json")
      graft.sparql.Update
        .applyQuadsSeq(graft.rdf.QuadStore(TpchRdf.quads(s, dir)), ops)
        .graph("g:json")
        .select(unscope(col("s")).as("s"), col("p"), unscope(col("o")).as("o"))
        .orderBy("s", "p", "o")
    }),
  )

  val quadOracles: Map[String, String] = Map(
    "load_jsonld" ->
      """SELECT * FROM (VALUES
        |  ('_:gen1', 'label', 'inner'),
        |  ('t:1', 'type', 'Thing'),
        |  ('t:1', 'label', '"alpha"@en'),
        |  ('t:1', 'label', 'plain'),
        |  ('t:1', 'size', '"5"^^http://www.w3.org/2001/XMLSchema#int'),
        |  ('t:1', 'near', 't:2'),
        |  ('t:2', 'inner', '_:gen1'),
        |  ('t:2', 'weight', '3.5'),
        |  ('t:2', 'tags', '_:gen2'),
        |  ('_:gen2', 'http://www.w3.org/1999/02/22-rdf-syntax-ns#first', 'a'),
        |  ('_:gen2', 'http://www.w3.org/1999/02/22-rdf-syntax-ns#rest', '_:gen3'),
        |  ('_:gen3', 'http://www.w3.org/1999/02/22-rdf-syntax-ns#first', '"b"@en'),
        |  ('_:gen3', 'http://www.w3.org/1999/02/22-rdf-syntax-ns#rest', 'http://www.w3.org/1999/02/22-rdf-syntax-ns#nil'),
        |  ('t:2', 'empty', 'http://www.w3.org/1999/02/22-rdf-syntax-ns#nil'),
        |  ('g:sub', 'source', 'crawl'),
        |  ('t:9', 'label', 'ng')
        |) AS t(s, p, o) ORDER BY s, p, o""".stripMargin,

    "load_rdfxml" ->
      """SELECT * FROM (VALUES
        |  ('_:b7', 'label', 'inner'),
        |  ('_:gen1', 'score', '9'),
        |  ('t:1', 'type', 'Thing'),
        |  ('t:1', 'code', 'A1'),
        |  ('t:1', 'label', '"alpha"@en'),
        |  ('t:1', 'size', '"5"^^http://www.w3.org/2001/XMLSchema#int'),
        |  ('t:1', 'near', 't:2'),
        |  ('t:2', 'inner', '_:b7'),
        |  ('t:2', 'meta', '_:gen1'),
        |  ('t:2', 'doc', '"x <b>y</b>"^^http://www.w3.org/1999/02/22-rdf-syntax-ns#XMLLiteral'),
        |  ('t:2', 'items', '_:gen2'),
        |  ('_:gen2', 'http://www.w3.org/1999/02/22-rdf-syntax-ns#first', 't:1'),
        |  ('_:gen2', 'http://www.w3.org/1999/02/22-rdf-syntax-ns#rest', '_:gen3'),
        |  ('_:gen3', 'http://www.w3.org/1999/02/22-rdf-syntax-ns#first', '_:b9'),
        |  ('_:gen3', 'http://www.w3.org/1999/02/22-rdf-syntax-ns#rest', 'http://www.w3.org/1999/02/22-rdf-syntax-ns#nil')
        |) AS t(s, p, o) ORDER BY s, p, o""".stripMargin,

    "load_turtle" ->
      """SELECT * FROM (VALUES
        |  ('_:gen1', 'label', 'inner'),
        |  ('t:1', 'type', 'Thing'),
        |  ('t:1', 'label', '"alpha"@en'),
        |  ('t:1', 'label', '"alpha"@fr'),
        |  ('t:1', 'size', '"5"^^http://www.w3.org/2001/XMLSchema#int'),
        |  ('t:2', 'label', 'beta'),
        |  ('t:2', 'near', '_:gen1'),
        |  ('t:3', 'items', '_:gen2'),
        |  ('_:gen2', 'http://www.w3.org/1999/02/22-rdf-syntax-ns#first', 't:1'),
        |  ('_:gen2', 'http://www.w3.org/1999/02/22-rdf-syntax-ns#rest', '_:gen3'),
        |  ('_:gen3', 'http://www.w3.org/1999/02/22-rdf-syntax-ns#first', 'x'),
        |  ('_:gen3', 'http://www.w3.org/1999/02/22-rdf-syntax-ns#rest', '_:gen4'),
        |  ('_:gen4', 'http://www.w3.org/1999/02/22-rdf-syntax-ns#first', '2'),
        |  ('_:gen4', 'http://www.w3.org/1999/02/22-rdf-syntax-ns#rest', 'http://www.w3.org/1999/02/22-rdf-syntax-ns#nil'),
        |  ('t:3', 'note', 'multi' || chr(10) || 'line "quoted" text'),
        |  ('t:4', 'items', 'http://www.w3.org/1999/02/22-rdf-syntax-ns#nil')
        |) AS t(s, p, o) ORDER BY s, p, o""".stripMargin,

    "update_using" ->
      """SELECT 'n:'||CAST(n_nationkey AS VARCHAR) AS s, 'partof' AS p, r_name AS o
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |ORDER BY s, p, o""".stripMargin,

    "update_solutions" ->
      """SELECT 'n:'||CAST(n_nationkey AS VARCHAR) AS n, n_name AS nname
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name IN ('ASIA','AFRICA') AND n_name <> 'INDIA'
        |ORDER BY n, nname""".stripMargin,

    "graph_quads" ->
      """SELECT g, n_triples FROM (
        |  SELECT 'g:customer' AS g, 5 * COUNT(*) AS n_triples FROM customer
        |  UNION ALL SELECT 'g:nation', 3 * COUNT(*) FROM nation
        |  UNION ALL SELECT 'g:region', 2 * COUNT(*) FROM region
        |  UNION ALL SELECT 'g:supplier', 4 * COUNT(*) FROM supplier
        |  UNION ALL SELECT 'g:orders', 6 * COUNT(*) FROM orders
        |  UNION ALL SELECT 'g:part', 6 * COUNT(*) FROM part
        |  UNION ALL SELECT 'g:lineitem', 10 * COUNT(*) FROM lineitem
        |) ORDER BY g""".stripMargin,
    "graph_named_pattern" ->
      """SELECT 's:'||CAST(s_suppkey AS VARCHAR) AS s,
        |  CAST(CAST(s_acctbal AS DECIMAL(18,2)) AS VARCHAR) AS bal
        |FROM supplier ORDER BY s""".stripMargin,

    "graph_with_update" ->
      """SELECT s, p, o FROM (
        |  SELECT 'r:'||CAST(r_regionkey AS VARCHAR) AS s, 'type' AS p, 'Region' AS o FROM region
        |  UNION ALL SELECT 'r:'||CAST(r_regionkey AS VARCHAR), 'label', r_name FROM region
        |) ORDER BY s, p, o""".stripMargin,

    "update_quad_template" ->
      """SELECT s, p, o, g FROM (
        |  SELECT 'r:'||CAST(r_regionkey AS VARCHAR) AS s, 'name' AS p, r_name AS o, 'g:archive' AS g FROM region
        |  UNION ALL SELECT 'r:'||CAST(r_regionkey AS VARCHAR), 'archived', 'y', 'g:default' FROM region
        |  UNION ALL SELECT 'r:'||CAST(r_regionkey AS VARCHAR), 'type', 'Region', 'g:region' FROM region
        |) ORDER BY g, s, p, o""".stripMargin,

    "graph_update" ->
      """SELECT g, n_triples FROM (
        |  SELECT 'g:customer' AS g, 5 * COUNT(*) AS n_triples FROM customer
        |  UNION ALL SELECT 'g:nation', 3 * COUNT(*) FROM nation
        |  UNION ALL SELECT 'g:region', 2 * COUNT(*) + 1 FROM region
        |  UNION ALL SELECT 'g:supplier', 4 * COUNT(*) FROM supplier
        |  UNION ALL SELECT 'g:orders', 6 * COUNT(*) FROM orders
        |  UNION ALL SELECT 'g:part', 6 * COUNT(*) FROM part
        |  UNION ALL SELECT 'g:lineitem', 10 * COUNT(*) FROM lineitem
        |  UNION ALL SELECT 'g:annotations', 2
        |) ORDER BY g""".stripMargin,

    "graph_management" ->
      """SELECT g, n_triples FROM (
        |  SELECT 'g:customer' AS g, 5 * COUNT(*) AS n_triples FROM customer
        |  UNION ALL SELECT 'g:nation', 3 * COUNT(*) FROM nation
        |  UNION ALL SELECT 'g:staging', 3 * COUNT(*) FROM nation
        |  UNION ALL SELECT 'g:archive', 2 * COUNT(*) FROM region
        |  UNION ALL SELECT 'g:supplier', 4 * COUNT(*) FROM supplier
        |  UNION ALL SELECT 'g:orders', 6 * COUNT(*) FROM orders
        |  UNION ALL SELECT 'g:lineitem', 10 * COUNT(*) FROM lineitem
        |) ORDER BY g""".stripMargin,

    "store_journal" ->
      """SELECT s, p, o, g FROM (
        |  SELECT 'n:'||CAST(n_nationkey AS VARCHAR) AS s, 'name' AS p,
        |         n_name AS o, 'g:n' AS g FROM nation
        |  UNION ALL SELECT 'n:'||CAST(n_nationkey AS VARCHAR), 'region',
        |         'r:'||CAST(n_regionkey AS VARCHAR), 'g:n' FROM nation WHERE n_regionkey <> 0
        |  UNION ALL SELECT 'n:'||CAST(n_nationkey AS VARCHAR), 'audited',
        |         'yes', 'g:n' FROM nation WHERE n_regionkey = 1
        |  UNION ALL SELECT 'meta:journal', 'compacted', 'true', 'g:meta'
        |) ORDER BY s, p, o, g""".stripMargin,

    "history_service" ->
      """SELECT s, o, v, act FROM (
        |  SELECT 'r:'||CAST(r_regionkey AS VARCHAR) AS s, r_name AS o,
        |         CAST(2 AS BIGINT) AS v, 'added' AS act FROM region
        |  UNION ALL SELECT 'n:1', (SELECT n_name FROM nation WHERE n_nationkey = 1),
        |         CAST(2 AS BIGINT), 'removed'
        |) ORDER BY v, act, s""".stripMargin,

    "store_repository" ->
      """SELECT s, p, o, g FROM (
        |  SELECT 'n:'||CAST(n_nationkey AS VARCHAR) AS s,
        |         CASE WHEN n_name LIKE 'A%' THEN 'renamed' ELSE 'name' END AS p,
        |         n_name AS o, 'g:n' AS g FROM nation
        |  UNION ALL SELECT 'meta:repo', 'versioned', 'true', 'g:meta'
        |) ORDER BY s, p, o, g""".stripMargin,

    "export_roundtrip" ->
      """SELECT s, p, o, g FROM (
        |  SELECT 'n:'||CAST(n_nationkey AS VARCHAR) AS s, 'name' AS p,
        |         n_name AS o, 'g:n' AS g FROM nation
        |  UNION ALL SELECT 'n:'||CAST(n_nationkey AS VARCHAR), 'region',
        |         'r:'||CAST(n_regionkey AS VARCHAR), 'g:n' FROM nation
        |) ORDER BY s, p, o, g""".stripMargin,

    "results_csv" ->
      """SELECT 'urn:graft:n:'||CAST(n_nationkey AS VARCHAR)||','||n_name AS value
        |FROM nation ORDER BY value""".stripMargin,

    "graph_mgmt_text" ->
      """SELECT g, n_triples FROM (
        |  SELECT 'g:customer' AS g, 5 * COUNT(*) AS n_triples FROM customer
        |  UNION ALL SELECT 'g:nation', 3 * COUNT(*) FROM nation
        |  UNION ALL SELECT 'g:staging',
        |    3 * (SELECT COUNT(*) FROM nation) + 2 * (SELECT COUNT(*) FROM region) + 1
        |  UNION ALL SELECT 'g:archive', 2 * COUNT(*) FROM region
        |  UNION ALL SELECT 'g:supplier', 4 * COUNT(*) FROM supplier
        |  UNION ALL SELECT 'g:orders', 6 * COUNT(*) FROM orders
        |  UNION ALL SELECT 'g:loaded', CAST(2 AS BIGINT)
        |) ORDER BY g""".stripMargin,
  )

  /** Deterministic synthetic coordinates for the geo operators. */
  private def geoPoints(s: SparkSession, dir: String): DataFrame =
    TpchRdf.supplierPoints(s, dir)

  private val T = "WITH " + TpchRdf.oracleCte + "\n"

  // identical result contract whether the index is built in-query or
  // read persisted — one oracle serves both
  private val ftSearchSql =
    """WITH toks AS (
      |  SELECT doc_id, t AS term
      |  FROM documents, UNNEST(string_split_regex(lower(text), '[^a-z0-9]+')) AS u(t)
      |  WHERE t <> ''
      |), tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
      |dn AS (SELECT doc_id, sqrt(SUM(tf*tf)) AS dn FROM tf GROUP BY 1),
      |q AS (SELECT UNNEST(['spark','join','vector']) AS term)
      |SELECT tf.doc_id, ROUND(SUM(tf.tf / dn.dn / sqrt(3.0)), 6) AS score
      |FROM tf JOIN q USING (term) JOIN dn USING (doc_id)
      |GROUP BY tf.doc_id
      |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin

  val oracles: Map[String, String] = Map(
    "fulltext_search" -> ftSearchSql,
    "fulltext_persisted" -> ftSearchSql,

    "fulltext_prefix" ->
      """WITH toks AS (
        |  SELECT doc_id, t AS term
        |  FROM documents, UNNEST(string_split_regex(lower(text), '[^a-z0-9]+')) AS u(t)
        |  WHERE t <> ''
        |), tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        |dn AS (SELECT doc_id, sqrt(SUM(tf*tf)) AS dn FROM tf GROUP BY 1),
        |q AS (SELECT UNNEST(['spar','vec']) AS q_term),
        |m AS (SELECT tf.doc_id, tf.term, tf.tf, q.q_term FROM tf JOIN q ON tf.term LIKE q.q_term || '%')
        |SELECT m.doc_id, ROUND(SUM(m.tf / dn.dn / sqrt(2.0)), 6) AS score
        |FROM m JOIN dn USING (doc_id)
        |GROUP BY m.doc_id
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,

    "fulltext_matchall" ->
      """WITH toks AS (
        |  SELECT doc_id, t AS term
        |  FROM documents, UNNEST(string_split_regex(lower(text), '[^a-z0-9]+')) AS u(t)
        |  WHERE t <> ''
        |), tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        |dn AS (SELECT doc_id, sqrt(SUM(tf*tf)) AS dn FROM tf GROUP BY 1),
        |q AS (SELECT UNNEST(['the','data']) AS q_term),
        |m AS (SELECT tf.doc_id, tf.term, tf.tf, q.q_term FROM tf JOIN q ON tf.term = q.q_term)
        |SELECT m.doc_id, ROUND(SUM(m.tf / dn.dn / sqrt(2.0)), 6) AS score
        |FROM m JOIN dn USING (doc_id)
        |GROUP BY m.doc_id
        |HAVING COUNT(DISTINCT m.q_term) = 2
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,

    "rdfs_closure" -> rdfsSql,
    // incremental assertion must equal the from-scratch closure
    "rdfs_incremental" -> rdfsSql,
    // DRed retraction must equal the from-scratch closure without the
    // retracted statements
    "rdfs_retract" -> rdfsRetractSql,

    "lexicon_roundtrip" ->
      (T + "SELECT s, p, o FROM triples WHERE s LIKE 'n:%' ORDER BY s, p, o"),

    // replay the mutations relationally: rename nation 1, detach
    // nation 2, drop region 0 with incident edges, add ATLANTIS
    "blueprints_write" ->
      """SELECT value FROM (
        |  SELECT CASE WHEN n_nationkey = 1 THEN 'RENAMED' ELSE n_name END AS value
        |  FROM nation WHERE n_regionkey <> 0 AND n_nationkey <> 2
        |  UNION ALL SELECT 'ATLANTIS' AS value) ORDER BY value""".stripMargin,

    "skew_salted_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    // the GOM write-back stores each region's in-link count as a term
    "gom_traversal" ->
      """SELECT r_name, CAST(count(*) AS VARCHAR) AS nations
        |FROM region JOIN nation ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "geo_zorder" ->
      """WITH s AS (SELECT s_suppkey AS k,
        |    (s_suppkey * 7919 % 18000) / 100.0 - 90 AS lat,
        |    (s_suppkey * 104729 % 36000) / 100.0 - 180 AS lon FROM supplier),
        |q AS (SELECT k,
        |    CAST(least(65535, greatest(0, floor((lat - (-90)) / 180 * 65536))) AS BIGINT) AS ly,
        |    CAST(least(65535, greatest(0, floor((lon - (-180)) / 360 * 65536))) AS BIGINT) AS lx FROM s),
        |z AS (SELECT k, CAST(SUM(
        |    ((ly // CAST(power(2, i) AS BIGINT)) % 2) * CAST(power(2, 2*i+1) AS BIGINT) +
        |    ((lx // CAST(power(2, i) AS BIGINT)) % 2) * CAST(power(2, 2*i) AS BIGINT)) AS BIGINT) AS zv
        |  FROM q CROSS JOIN (SELECT unnest(range(0, 16)) AS i) ii GROUP BY k)
        |SELECT zv // 4194304 AS zcell, COUNT(*) AS n FROM z GROUP BY 1 ORDER BY zcell""".stripMargin,

    "geo_bbox" ->
      """SELECT k, lat, lon FROM (
        |  SELECT s_suppkey AS k,
        |    (s_suppkey * 7919 % 18000) / 100.0 - 90 AS lat,
        |    (s_suppkey * 104729 % 36000) / 100.0 - 180 AS lon FROM supplier)
        |WHERE lat >= -45 AND lat <= 45 AND lon >= -90 AND lon <= 90
        |ORDER BY k""".stripMargin,

    "geo_time" ->
      """SELECT k, lat, lon, t FROM (
        |  SELECT s_suppkey AS k,
        |    (s_suppkey * 7919 % 18000) / 100.0 - 90 AS lat,
        |    (s_suppkey * 104729 % 36000) / 100.0 - 180 AS lon,
        |    CAST(s_suppkey * 131 % 1000 AS BIGINT) AS t FROM supplier)
        |WHERE lat >= -60 AND lat <= 60 AND lon >= -150 AND lon <= 90
        |  AND t >= 100 AND t <= 400
        |ORDER BY k""".stripMargin,

    // the prune never changes results, so the oracle is the plain
    // range filter over the declared components
    "geo_custom" ->
      """SELECT k, lat, lon, t FROM (
        |  SELECT s_suppkey AS k,
        |    (s_suppkey * 7919 % 18000) / 100.0 - 90 AS lat,
        |    (s_suppkey * 104729 % 36000) / 100.0 - 180 AS lon,
        |    CAST(s_suppkey * 131 % 1000 AS BIGINT) AS t FROM supplier)
        |WHERE lat >= -30 AND lat <= 75 AND lon >= -120 AND lon <= 60
        |  AND t >= 200 AND t <= 700
        |ORDER BY k""".stripMargin,

    "geo_service" ->
      """SELECT k, lat, lon FROM (
        |  SELECT s_suppkey AS k,
        |    (s_suppkey * 7919 % 18000) / 100.0 - 90 AS lat,
        |    (s_suppkey * 104729 % 36000) / 100.0 - 180 AS lon FROM supplier)
        |WHERE lat >= 0 AND lat <= 60 AND lon >= -120 AND lon <= 30
        |ORDER BY k""".stripMargin,

    "geo_circle" ->
      """WITH pts AS (
        |  SELECT s_suppkey AS k,
        |    (s_suppkey * 7919 % 18000) / 100.0 - 90 AS lat,
        |    (s_suppkey * 104729 % 36000) / 100.0 - 180 AS lon FROM supplier),
        |h AS (SELECT k, lat, lon,
        |  sin((lat - 10) * pi() / 180 / 2) AS sdlat,
        |  sin((lon - -40.0) * pi() / 180 / 2) AS sdlon,
        |  cos(lat * pi() / 180) AS clat
        |  FROM pts),
        |d AS (SELECT k, lat, lon,
        |  ROUND(2 * 6371.0 * asin(sqrt(
        |    sdlat * sdlat + clat * cos(10 * pi() / 180) * sdlon * sdlon)), 6) AS d
        |  FROM h)
        |SELECT k, lat, lon, d FROM d WHERE d <= 3000 ORDER BY k""".stripMargin,

    "describe_sym" ->
      (T + """SELECT DISTINCT s, p, o FROM triples
        |WHERE s = 'n:3' OR o = 'n:3'
        |ORDER BY s, p, o""".stripMargin),

    "describe_cbd" ->
      """WITH c AS (SELECT * FROM customer WHERE c_custkey = 5),
        |sid1 AS (SELECT 'sid:'||md5('c:5|nation|n:'||CAST(c_nationkey AS VARCHAR)) AS s FROM c)
        |SELECT s, p, o FROM (
        |  SELECT 'c:5' AS s, 'type' AS p, 'Customer' AS o FROM c
        |  UNION ALL SELECT 'c:5', 'name', c_name FROM c
        |  UNION ALL SELECT 'c:5', 'nation', 'n:'||CAST(c_nationkey AS VARCHAR) FROM c
        |  UNION ALL SELECT 'c:5', 'acctbal', CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS VARCHAR) FROM c
        |  UNION ALL SELECT 'c:5', 'mktsegment', c_mktsegment FROM c
        |  UNION ALL SELECT s, 'source', 'census' FROM sid1
        |  UNION ALL SELECT 'sid:'||md5(s||'|source|census'), 'checked_by', 'auditor' FROM sid1
        |) ORDER BY s, p, o""".stripMargin,

    "fulltext_rank" ->
      """WITH toks AS (
        |  SELECT doc_id, t AS term
        |  FROM documents, UNNEST(string_split_regex(lower(text), '[^a-z0-9]+')) AS u(t)
        |  WHERE t <> ''
        |), tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        |dn AS (SELECT doc_id, sqrt(SUM(tf*tf)) AS dn FROM tf GROUP BY 1),
        |q AS (SELECT UNNEST(['spark','join','vector']) AS term),
        |scored AS (
        |  SELECT tf.doc_id, ROUND(SUM(tf.tf / dn.dn / sqrt(3.0)), 6) AS score
        |  FROM tf JOIN q USING (term) JOIN dn USING (doc_id)
        |  GROUP BY tf.doc_id
        |), ranked AS (
        |  SELECT doc_id, score, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS r
        |  FROM scored WHERE score >= 0.05
        |)
        |SELECT doc_id, score FROM ranked WHERE r <= 12
        |ORDER BY score DESC, doc_id LIMIT 50""".stripMargin,

    "fulltext_regex" ->
      """WITH toks AS (
        |  SELECT doc_id, t AS term
        |  FROM documents, UNNEST(string_split_regex(lower(text), '[^a-z0-9]+')) AS u(t)
        |  WHERE t <> ''
        |), tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        |dn AS (SELECT doc_id, sqrt(SUM(tf*tf)) AS dn FROM tf GROUP BY 1),
        |q AS (SELECT DISTINCT term FROM tf WHERE regexp_matches(term, '^(sc|sp|st).*'))
        |SELECT tf.doc_id, ROUND(SUM(tf.tf / dn.dn), 6) AS score
        |FROM tf JOIN q USING (term) JOIN dn USING (doc_id)
        |GROUP BY tf.doc_id
        |ORDER BY score DESC, doc_id LIMIT 15""".stripMargin,

    "rdr_annotation" ->
      """SELECT 'c:'||CAST(c_custkey AS VARCHAR) AS c, c_mktsegment AS seg,
        |  'n:'||CAST(c_nationkey AS VARCHAR) AS n, 'gold' AS v,
        |  'sid:'||md5('c:'||CAST(c_custkey AS VARCHAR)||'|nation|n:'||
        |              CAST(c_nationkey AS VARCHAR)) AS sid
        |FROM customer WHERE c_acctbal > 9000 ORDER BY c""".stripMargin,

    "owl_closure" ->
      """WITH w AS (
        |  SELECT 'c:'||CAST(c_custkey AS VARCHAR) AS s, 'n:'||CAST(c_nationkey AS VARCHAR) AS o FROM customer
        |  UNION ALL SELECT 'n:'||CAST(n_nationkey AS VARCHAR), 'r:'||CAST(n_regionkey AS VARCHAR) FROM nation
        |  UNION ALL SELECT 'c:'||CAST(c_custkey AS VARCHAR), 'r:'||CAST(n_regionkey AS VARCHAR)
        |    FROM customer JOIN nation ON c_nationkey = n_nationkey
        |)
        |SELECT s, p, o FROM (
        |  SELECT s, 'within' AS p, o FROM w
        |  UNION ALL SELECT o AS s, 'contains' AS p, s AS o FROM w
        |  UNION ALL SELECT 'n:'||CAST(n_nationkey AS VARCHAR), 'alias_name', n_name FROM nation
        |) ORDER BY s, p, o""".stripMargin,

    "owl_maintained" ->
      """WITH surv AS (
        |  SELECT c_custkey, c_nationkey FROM customer WHERE c_custkey % 3 <> 0
        |), w AS (
        |  SELECT 'c:'||CAST(c_custkey AS VARCHAR) AS s, 'n:'||CAST(c_nationkey AS VARCHAR) AS o FROM surv
        |  UNION ALL SELECT 'n:'||CAST(n_nationkey AS VARCHAR), 'r:'||CAST(n_regionkey AS VARCHAR) FROM nation
        |  UNION ALL SELECT 'c:'||CAST(c_custkey AS VARCHAR), 'r:'||CAST(n_regionkey AS VARCHAR)
        |    FROM surv JOIN nation ON c_nationkey = n_nationkey
        |)
        |SELECT s, p, o FROM (
        |  SELECT s, 'within' AS p, o FROM w
        |  UNION ALL SELECT o AS s, 'contains' AS p, s AS o FROM w
        |  UNION ALL SELECT 'n:'||CAST(n_nationkey AS VARCHAR), 'alias_name', n_name FROM nation
        |) ORDER BY s, p, o""".stripMargin,

    // the final entailed state of the dynamic-ontology walk: surviving
    // within edges + the 2-level transitive composition + inverse
    // mirrors of the CLOSED relation + the vocabulary statements
    // themselves (the TBox is data here)
    "tm_dynamic" ->
      """WITH surv AS (
        |  SELECT c_custkey, c_nationkey FROM customer WHERE c_custkey % 3 <> 0
        |), w AS (
        |  SELECT 'c:'||CAST(c_custkey AS VARCHAR) AS s, 'n:'||CAST(c_nationkey AS VARCHAR) AS o FROM surv
        |  UNION ALL SELECT 'n:'||CAST(n_nationkey AS VARCHAR), 'r:'||CAST(n_regionkey AS VARCHAR) FROM nation
        |  UNION ALL SELECT 'c:'||CAST(c_custkey AS VARCHAR), 'r:'||CAST(n_regionkey AS VARCHAR)
        |    FROM surv JOIN nation ON c_nationkey = n_nationkey
        |)
        |SELECT s, p, o FROM (
        |  SELECT s, 'within' AS p, o FROM w
        |  UNION ALL SELECT o AS s, 'contains' AS p, s AS o FROM w
        |  UNION ALL SELECT 'within', 'type', 'TransitiveProperty'
        |  UNION ALL SELECT 'within', 'inverseOf', 'contains'
        |) ORDER BY s, p, o""".stripMargin,

    "owl_equiv" ->
      """WITH c AS (
        |  SELECT 'c:'||CAST(c_custkey AS VARCHAR) AS s, c_mktsegment AS seg FROM customer
        |)
        |SELECT s, p, o FROM (
        |  SELECT s, 'type' AS p, 'Customer' AS o FROM c
        |  UNION ALL SELECT s, 'type', 'Agent' FROM c
        |  UNION ALL SELECT s, 'type', 'Patron' FROM c
        |  UNION ALL SELECT s, 'mktsegment', seg FROM c
        |  UNION ALL SELECT s, 'segment', seg FROM c
        |  UNION ALL SELECT s, 'type', 'BuildingCustomer' FROM c WHERE seg = 'BUILDING'
        |  UNION ALL SELECT s, 'type', 'Priority' FROM c WHERE seg = 'BUILDING'
        |) ORDER BY s, p, o""".stripMargin,

    "stream_window" ->
      """SELECT strftime(to_timestamp(CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT)), '%Y-%m-%d') AS day,
        |  event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin,

    // identical result contract for the batch and streaming variants
    "stream_sessionize" -> sessionizeSql,
    "events_sessionize" -> sessionizeSql,

    // replays the hour×type heatmap with exact decimal value sums
    "events_heatmap" ->
      """SELECT CAST(date_part('hour', ts) AS BIGINT) AS hour_utc, event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY hour_utc, event_type""".stripMargin,

    // the stream replays as the batch lag formula (state carries
    // boundary transitions, so the batch answer IS the oracle)
    "stream_transitions" ->
      """WITH t AS (SELECT user_id, event_type AS to_type,
        |             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS from_type
        |           FROM events)
        |SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
        |FROM t WHERE from_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY from_type, to_type""".stripMargin,

    // replays the transition matrix: lag over (user, ts, event_id)
    "events_transitions" ->
      """WITH t AS (SELECT user_id, event_type AS to_type,
        |             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS from_type
        |           FROM events)
        |SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
        |FROM t WHERE from_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY from_type, to_type""".stripMargin,

    // replays the integer 3σ test: exact cents, (cn−S1)² > 9(nS2−S1²);
    // cross products in HUGEINT to mirror the decimal(38,0) Spark side
    "events_outliers" ->
      """WITH e AS (SELECT event_id, user_id, value,
        |             CAST(ROUND(value * 100, 0) AS BIGINT) AS c FROM events),
        |st AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(c) AS BIGINT) AS s1, CAST(SUM(c*c) AS BIGINT) AS s2
        |       FROM e GROUP BY 1),
        |j AS (SELECT event_id, e.user_id, value,
        |        CAST(c AS HUGEINT)*CAST(n AS HUGEINT) - CAST(s1 AS HUGEINT) AS d,
        |        CAST(n AS HUGEINT)*CAST(s2 AS HUGEINT)
        |          - CAST(s1 AS HUGEINT)*CAST(s1 AS HUGEINT) AS var9
        |      FROM e JOIN st ON e.user_id = st.user_id)
        |SELECT event_id, user_id, value FROM j
        |WHERE d > 0 AND d*d > 9*var9
        |ORDER BY event_id""".stripMargin,

    // replays cohort retention: first-seen day per user, distinct
    // (user, offset) activity within a week of the cohort day
    "events_retention" ->
      """WITH d AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
        |c AS (SELECT user_id, MIN(d) AS c0 FROM d GROUP BY 1),
        |a AS (SELECT DISTINCT d.user_id, c.c0, date_diff('day', c.c0, d.d) AS k
        |      FROM d JOIN c ON d.user_id = c.user_id WHERE date_diff('day', c.c0, d.d) <= 7)
        |SELECT strftime(c0, '%Y-%m-%d') AS cohort_day, CAST(k AS BIGINT) AS day_offset,
        |  CAST(COUNT(*) AS BIGINT) AS n_users
        |FROM a GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin,

    // replays the view→click→error funnel chain; delays in exact ns
    "events_funnel" ->
      """WITH v AS (SELECT user_id, MIN(ts) AS v_ts FROM events WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, MIN(e.ts) AS c_ts, MIN(v.v_ts) AS v_ts
        |      FROM events e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts >= v.v_ts GROUP BY 1),
        |er AS (SELECT e.user_id, MIN(e.ts) AS e_ts, MIN(c.c_ts) AS c_ts, MIN(c.v_ts) AS v_ts
        |       FROM events e JOIN c ON e.user_id = c.user_id
        |       WHERE e.event_type = 'error' AND e.ts >= c.c_ts GROUP BY 1)
        |SELECT user_id,
        |  (epoch_us(c_ts) - epoch_us(v_ts)) * 1000 AS click_delay_ns,
        |  (epoch_us(e_ts) - epoch_us(c_ts)) * 1000 AS error_delay_ns
        |FROM er ORDER BY user_id""".stripMargin,

    // replays the STREAM as its batch equivalent: the register merge
    // is a max-semilattice, so the batch HLL formula IS the oracle
    "stream_hll" ->
      """WITH h AS (SELECT event_type, user_id,
        |             CAST(('0x'||substr(md5(CAST(user_id AS VARCHAR)),1,8)) AS BIGINT) AS h FROM events),
        |r AS (SELECT event_type, h // 67108864 AS bucket,
        |        CASE WHEN h % 67108864 = 0 THEN 27
        |             ELSE 27 - length(bin(h % 67108864)) END AS rank FROM h),
        |reg AS (SELECT event_type, bucket, MAX(rank) AS M FROM r GROUP BY 1, 2),
        |agg AS (SELECT event_type, SUM(power(2.0, -M)) AS s, COUNT(*) AS nb,
        |          CAST(SUM(M * (bucket + 1)) AS BIGINT) AS reg_checksum FROM reg GROUP BY 1),
        |est AS (SELECT event_type, 0.709 * 64 * 64 / (s + (64 - nb)) AS e_raw,
        |          CAST(64 - nb AS BIGINT) AS v, reg_checksum FROM agg),
        |ex AS (SELECT event_type, COUNT(DISTINCT user_id) AS n_exact FROM events GROUP BY 1)
        |SELECT est.event_type,
        |  ROUND(CASE WHEN e_raw <= 160.0 AND v > 0 THEN 64.0 * ln(64.0 / v) ELSE e_raw END, 4) AS hll_est,
        |  v AS n_empty, reg_checksum, n_exact
        |FROM est JOIN ex ON est.event_type = ex.event_type ORDER BY est.event_type""".stripMargin,

    // replays the column profile: unpivot UNION ALL + the HLL formula
    // grouped by column name
    "table_profile" ->
      """WITH st AS (
        |  SELECT 'l_orderkey' AS cname, CAST(l_orderkey AS VARCHAR) AS v FROM lineitem
        |  UNION ALL SELECT 'l_partkey', CAST(l_partkey AS VARCHAR) FROM lineitem
        |  UNION ALL SELECT 'l_suppkey', CAST(l_suppkey AS VARCHAR) FROM lineitem
        |  UNION ALL SELECT 'l_returnflag', l_returnflag FROM lineitem
        |  UNION ALL SELECT 'l_linestatus', l_linestatus FROM lineitem),
        |stats AS (SELECT cname, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |            CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null
        |          FROM st GROUP BY 1),
        |h AS (SELECT cname, CAST(('0x'||substr(md5(v),1,8)) AS BIGINT) AS h
        |      FROM st WHERE v IS NOT NULL),
        |r AS (SELECT cname, h // 67108864 AS bucket,
        |        CASE WHEN h % 67108864 = 0 THEN 27
        |             ELSE 27 - length(bin(h % 67108864)) END AS rank FROM h),
        |reg AS (SELECT cname, bucket, MAX(rank) AS M FROM r GROUP BY 1, 2),
        |agg AS (SELECT cname, SUM(power(2.0, -M)) AS s, COUNT(*) AS nb FROM reg GROUP BY 1),
        |est AS (SELECT cname, 0.709 * 64 * 64 / (s + (64 - nb)) AS e_raw,
        |          CAST(64 - nb AS BIGINT) AS v FROM agg)
        |SELECT stats.cname, n_rows, n_null,
        |  ROUND(CASE WHEN e_raw <= 160.0 AND v > 0 THEN 64.0 * ln(64.0 / v) ELSE e_raw END, 4) AS hll_est
        |FROM stats JOIN est ON stats.cname = est.cname ORDER BY stats.cname""".stripMargin,

    // replays hllDistinct p=6: 32-bit md5 hash, 64 registers, ranks
    // via bin-length, linear-counting small-range correction
    "sketch_hll" ->
      """WITH h AS (SELECT l_returnflag AS flag, l_partkey,
        |             CAST(('0x'||substr(md5(CAST(l_partkey AS VARCHAR)),1,8)) AS BIGINT) AS h FROM lineitem),
        |r AS (SELECT flag, h // 67108864 AS bucket,
        |        CASE WHEN h % 67108864 = 0 THEN 27
        |             ELSE 27 - length(bin(h % 67108864)) END AS rank FROM h),
        |reg AS (SELECT flag, bucket, MAX(rank) AS M FROM r GROUP BY flag, bucket),
        |agg AS (SELECT flag, SUM(power(2.0, -M)) AS s, COUNT(*) AS nb,
        |          CAST(SUM(M * (bucket + 1)) AS BIGINT) AS reg_checksum FROM reg GROUP BY flag),
        |est AS (SELECT flag, 0.709 * 64 * 64 / (s + (64 - nb)) AS e_raw,
        |          CAST(64 - nb AS BIGINT) AS v, reg_checksum FROM agg),
        |ex AS (SELECT l_returnflag AS flag, COUNT(DISTINCT l_partkey) AS n_exact FROM lineitem GROUP BY 1)
        |SELECT est.flag AS l_returnflag,
        |  ROUND(CASE WHEN e_raw <= 160.0 AND v > 0 THEN 64.0 * ln(64.0 / v) ELSE e_raw END, 4) AS hll_est,
        |  v AS n_empty, reg_checksum, n_exact
        |FROM est JOIN ex ON est.flag = ex.flag ORDER BY l_returnflag""".stripMargin,

    // replays intervalJoin: inner range join, inclusive 2-hour
    // look-back window per error event
    "events_range" ->
      """SELECT l.event_id, CAST(COUNT(*) AS BIGINT) AS n_clicks,
        |  CAST(SUM(CAST(r.value AS DECIMAL(18,2))) AS DOUBLE) AS click_sum
        |FROM events l JOIN events r
        |  ON l.event_type = 'error' AND r.event_type = 'click'
        |  AND r.user_id = l.user_id
        |  AND r.ts <= l.ts AND r.ts >= l.ts - INTERVAL 7200 SECOND
        |GROUP BY l.event_id ORDER BY l.event_id""".stripMargin,

    // replays leftAsof: per click, the view with max (ts, event_id)
    // at-or-before the click's ts for the same user
    "events_asof" ->
      """SELECT l.event_id, l.user_id, l.value, v.view_event_id, v.view_value
        |FROM (SELECT * FROM events WHERE event_type = 'click') l
        |LEFT JOIN LATERAL (
        |  SELECT r.event_id AS view_event_id, r.value AS view_value
        |  FROM events r
        |  WHERE r.event_type = 'view' AND r.user_id = l.user_id AND r.ts <= l.ts
        |  ORDER BY r.ts DESC, r.event_id DESC LIMIT 1) v ON true
        |ORDER BY event_id""".stripMargin,

    "stream_enrich" ->
      """SELECT 'n:'||CAST(c_nationkey AS VARCHAR) AS nation, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY 1 ORDER BY nation""".stripMargin,

    "stream_dedup" ->
      """SELECT event_type, COUNT(DISTINCT event_id) AS n
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,

    "stream_stream_join" ->
      """SELECT a.user_id AS user_id, a.event_id AS view_id, b.event_id AS purchase_id
        |FROM events a JOIN events b ON a.user_id = b.user_id
        |  AND a.event_type = 'view' AND b.event_type = 'purchase'
        |  AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
        |ORDER BY user_id, view_id, purchase_id""".stripMargin,

    "update_delete_insert" -> updateSql,
    "sparql_parsed_update" -> updateSql,

    "blueprints_traversal" ->
      """SELECT DISTINCT r_name AS value
        |FROM region JOIN nation ON r_regionkey = n_regionkey
        |  JOIN customer ON n_nationkey = c_nationkey
        |WHERE c_mktsegment = 'BUILDING'
        |ORDER BY value""".stripMargin,

    "describe_where" ->
      (T + """SELECT s, p, o FROM triples
        |WHERE s IN (SELECT 's:'||CAST(s_suppkey AS VARCHAR) FROM supplier WHERE s_nationkey = 1)
        |ORDER BY s, p, o""".stripMargin),
  )

  private lazy val updateSql: String =
      """SELECT s, p, o FROM (
        |  SELECT 'c:'||CAST(c_custkey AS VARCHAR) AS s, 'segment_class' AS p,
        |    CASE WHEN c_mktsegment IN ('BUILDING','AUTOMOBILE') THEN 'RETAIL' ELSE 'OTHER' END AS o
        |  FROM customer
        |  UNION ALL
        |  SELECT 'c:'||CAST(c_custkey AS VARCHAR), 'acctbal',
        |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS VARCHAR)
        |  FROM customer
        |) ORDER BY s, p, o""".stripMargin

  private lazy val sessionizeSql: String =
      """WITH x AS (
        |  SELECT user_id, event_id, ts,
        |    LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events
        |), y AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN prev_ts IS NULL OR (epoch_ns(ts) - epoch_ns(prev_ts)) > 1800000000000 THEN 1 ELSE 0 END AS new_sess
        |  FROM x
        |), z AS (
        |  SELECT user_id, ts,
        |    -- DuckDB windowed SUM yields HUGEINT (float64 through pandas);
        |    -- Spark's running sum is BIGINT — cast for dtype parity
        |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_idx
        |  FROM y
        |)
        |SELECT user_id, sess_idx, COUNT(*) AS n_events,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS start_s,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS end_s
        |FROM z GROUP BY user_id, sess_idx ORDER BY user_id, sess_idx""".stripMargin

  private lazy val rdfsSql: String =
      """WITH RECURSIVE sub(c1, c2) AS (
        |  VALUES ('Customer','Agent'),('Supplier','Agent'),('Agent','Resource'),
        |         ('Order','Transaction'),('Lineitem','Transaction'),('Transaction','Resource'),
        |         ('Nation','Place'),('Region','Place'),('Place','Resource'),
        |         ('Part','Item'),('Item','Resource')
        |), subtc AS (
        |  SELECT c1, c2 FROM sub
        |  UNION SELECT s1.c1, s2.c2 FROM subtc s1 JOIN sub s2 ON s1.c2 = s2.c1
        |), types0(s, o) AS (
        |  SELECT 'c:'||CAST(c_custkey AS VARCHAR), 'Customer' FROM customer
        |  UNION ALL SELECT 'n:'||CAST(n_nationkey AS VARCHAR), 'Nation' FROM nation
        |  UNION ALL SELECT 's:'||CAST(s_suppkey AS VARCHAR), 'Supplier' FROM supplier
        |  UNION ALL SELECT 'r:'||CAST(r_regionkey AS VARCHAR), 'Region' FROM region
        |  -- rdfs2 domain(nation)=LocatedThing; rdfs3 range(nation)=Place, range(region)=Place
        |  UNION ALL SELECT 'c:'||CAST(c_custkey AS VARCHAR), 'LocatedThing' FROM customer
        |  UNION ALL SELECT 's:'||CAST(s_suppkey AS VARCHAR), 'LocatedThing' FROM supplier
        |  UNION ALL SELECT 'n:'||CAST(c_nationkey AS VARCHAR), 'Place' FROM customer
        |  UNION ALL SELECT 'n:'||CAST(s_nationkey AS VARCHAR), 'Place' FROM supplier
        |  UNION ALL SELECT 'r:'||CAST(n_regionkey AS VARCHAR), 'Place' FROM nation
        |), types AS (
        |  SELECT s, o FROM types0
        |  UNION SELECT t.s, x.c2 FROM types0 t JOIN subtc x ON t.o = x.c1
        |), located(s, o) AS (
        |  SELECT 'c:'||CAST(c_custkey AS VARCHAR), 'n:'||CAST(c_nationkey AS VARCHAR) FROM customer
        |  UNION ALL SELECT 's:'||CAST(s_suppkey AS VARCHAR), 'n:'||CAST(s_nationkey AS VARCHAR) FROM supplier
        |  UNION ALL SELECT 'n:'||CAST(n_nationkey AS VARCHAR), 'r:'||CAST(n_regionkey AS VARCHAR) FROM nation
        |)
        |SELECT DISTINCT * FROM (
        |  SELECT s, 'type' AS p, o FROM types
        |  UNION ALL SELECT s, 'locatedIn' AS p, o FROM located
        |  UNION ALL SELECT s, 'nation' AS p, o FROM located WHERE s NOT LIKE 'n:%'
        |  UNION ALL SELECT s, 'region' AS p, o FROM located WHERE s LIKE 'n:%'
        |) ORDER BY s, p, o""".stripMargin

  /** The closure WITHOUT the supplier statements — what DRed
    * retraction must reproduce (recompute-from-scratch oracle). */
  private lazy val rdfsRetractSql: String =
      """WITH RECURSIVE sub(c1, c2) AS (
        |  VALUES ('Customer','Agent'),('Supplier','Agent'),('Agent','Resource'),
        |         ('Order','Transaction'),('Lineitem','Transaction'),('Transaction','Resource'),
        |         ('Nation','Place'),('Region','Place'),('Place','Resource'),
        |         ('Part','Item'),('Item','Resource')
        |), subtc AS (
        |  SELECT c1, c2 FROM sub
        |  UNION SELECT s1.c1, s2.c2 FROM subtc s1 JOIN sub s2 ON s1.c2 = s2.c1
        |), types0(s, o) AS (
        |  SELECT 'c:'||CAST(c_custkey AS VARCHAR), 'Customer' FROM customer
        |  UNION ALL SELECT 'n:'||CAST(n_nationkey AS VARCHAR), 'Nation' FROM nation
        |  UNION ALL SELECT 'r:'||CAST(r_regionkey AS VARCHAR), 'Region' FROM region
        |  UNION ALL SELECT 'c:'||CAST(c_custkey AS VARCHAR), 'LocatedThing' FROM customer
        |  UNION ALL SELECT 'n:'||CAST(c_nationkey AS VARCHAR), 'Place' FROM customer
        |  UNION ALL SELECT 'r:'||CAST(n_regionkey AS VARCHAR), 'Place' FROM nation
        |), types AS (
        |  SELECT s, o FROM types0
        |  UNION SELECT t.s, x.c2 FROM types0 t JOIN subtc x ON t.o = x.c1
        |), located(s, o) AS (
        |  SELECT 'c:'||CAST(c_custkey AS VARCHAR), 'n:'||CAST(c_nationkey AS VARCHAR) FROM customer
        |  UNION ALL SELECT 'n:'||CAST(n_nationkey AS VARCHAR), 'r:'||CAST(n_regionkey AS VARCHAR) FROM nation
        |)
        |SELECT DISTINCT * FROM (
        |  SELECT s, 'type' AS p, o FROM types
        |  UNION ALL SELECT s, 'locatedIn' AS p, o FROM located
        |  UNION ALL SELECT s, 'nation' AS p, o FROM located WHERE s NOT LIKE 'n:%'
        |  UNION ALL SELECT s, 'region' AS p, o FROM located WHERE s LIKE 'n:%'
        |) ORDER BY s, p, o""".stripMargin
}
