package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.rdf.{Journal, TextIndexMaintenance}
import graft.search.{FullText, PersistedSearchIndex}

class SearchIndexSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft_$tag").resolve("ix").toString

  test("persisted index: create/open round-trip, delta update, re-add resolution, compact") {
    val dir = tmp("six")
    val c0 = Seq((1L, "spark join table"), (2L, "plain words")).toDF("doc_id", "text")
      .select(col("doc_id").cast("string"), col("text"))
    val ix = PersistedSearchIndex.create(spark, dir, c0, version = 0L)
    assert(ix.nDocs == 2 && ix.version == 0)
    def hits(i: PersistedSearchIndex, q: String) =
      FullText.searchIndexAll(i.view.postings, i.view.nDocs, Seq(q))
        .collect().map(_.getString(0)).toSet
    assert(hits(ix, "spark") == Set("1"))
    // delta: add doc 3, remove doc 2 — only doc 3 tokenizes
    ix.update(Seq(("3", "spark streams")).toDF("doc_id", "text"),
      Seq("2").toDF("doc_id"), toVersion = 1L)
    assert(ix.nDocs == 2 && ix.version == 1)
    assert(hits(ix, "spark") == Set("1", "3") && hits(ix, "plain").isEmpty)
    // re-add after removal: latest-action resolution keeps the re-add
    ix.update(Seq(("2", "plain words again")).toDF("doc_id", "text"),
      spark.emptyDataset[String].toDF("doc_id"), toVersion = 2L)
    assert(ix.nDocs == 3 && hits(ix, "plain") == Set("2"))
    // a fresh handle reads the same state
    val re = PersistedSearchIndex.open(spark, dir)
    assert(re.nDocs == 3 && re.version == 2 && hits(re, "spark") == Set("1", "3"))
    // compact: one segment, identical hits, plain-scan view (no join
    // in the resolved plan)
    re.compact()
    assert(hits(re, "spark") == Set("1", "3") && hits(re, "plain") == Set("2"))
    val plan = re.view.postings.queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("join"), plan)
  }

  test("maintained on journal commits: new literals searchable, removals exact") {
    val jdir = Files.createTempDirectory("graft_tij").resolve("j").toString
    val j = Journal.create(spark, jdir)
    def q(rows: (String, String, String)*) =
      rows.toSeq.toDF("s", "p", "o").withColumn("g", lit("g:default"))
    j.append(q(("x:a", "note", "the spark engine"), ("x:b", "note", "plain words")))
    val ix = TextIndexMaintenance.create(spark, tmp("tij"), j)
    def found(term: String): Set[String] =
      FullText.searchIndexAll(ix.view.postings, ix.view.nDocs, Seq(term))
        .collect().map(_.getString(0)).toSet
    assert(found("spark") == Set("the spark engine"))
    // commit → sync → the NEW literal is searchable, no rebuild
    j.append(q(("x:c", "note", "spark streams"), ("x:d", "note", "the spark engine")))
    assert(TextIndexMaintenance.sync(ix, j) == j.version)
    assert(found("spark") == Set("the spark engine", "spark streams"))
    assert(found("streams") == Set("spark streams"))
    // retract ONE of the two quads carrying "the spark engine": the
    // literal is still used, so it must survive; retract the last
    // usage of "spark streams": it must leave
    j.commit(adds = q(), dels = q(("x:c", "note", "spark streams"),
      ("x:d", "note", "the spark engine")))
    TextIndexMaintenance.sync(ix, j)
    assert(found("spark") == Set("the spark engine"))
    assert(found("streams").isEmpty)
    // sync is idempotent at head
    val v = ix.version
    assert(TextIndexMaintenance.sync(ix, j) == v)
    // a compaction between syncs costs the consumer nothing (skipped)
    j.append(q(("x:e", "note", "vector index")))
    j.compact()
    TextIndexMaintenance.sync(ix, j)
    assert(found("vector") == Set("vector index"))
  }

  test("sync membership is delta-bounded: doc-id sidecar scan only, no postings, no shuffle") {
    val jdir = Files.createTempDirectory("graft_tix").resolve("j").toString
    val j = Journal.create(spark, jdir)
    def q(rows: (String, String, String)*) =
      rows.toSeq.toDF("s", "p", "o").withColumn("g", lit("g:default"))
    j.append(q(("x:a", "note", "alpha text"), ("x:b", "note", "beta text")))
    val ix = TextIndexMaintenance.create(spark, tmp("tix"), j)
    // APPEND-ONLY sync: membership must plan as a bloom-filtered scan
    // of the doc-id sidecar — never the postings relation, and with no
    // shuffle anywhere (broadcast exchanges of the delta are the design)
    j.append(q(("x:c", "note", "gamma text"), ("x:a", "link", "x:b")))
    TextIndexMaintenance.sync(ix, j)
    val plans = TextIndexMaintenance.lastSyncPlans
    assert(plans.size == 3)
    val probe = plans.head
    assert(probe.contains("-docs.parquet"), probe)
    plans.foreach { p =>
      assert(!p.matches("(?s).*seg-\\d+-adds[.]parquet.*"),
        s"sync consulted the postings relation:\n$p")
      assert(!p.contains("hashpartitioning") && !p.contains("rangepartitioning"),
        s"sync planned a shuffle:\n$p")
    }
    // correctness didn't move: the new literal is searchable, the old
    // ones did NOT re-tokenize (their batch segments are untouched)
    def found(term: String): Set[String] =
      FullText.searchIndexAll(ix.view.postings, ix.view.nDocs, Seq(term))
        .collect().map(_.getString(0)).toSet
    assert(found("gamma") == Set("gamma text"))
    assert(found("text") == Set("alpha text", "beta text", "gamma text"))
    // with DELETES the liveness check may shuffle (store-side), but the
    // postings relation still never enters any sync plan
    j.commit(adds = q(), dels = q(("x:b", "note", "beta text")))
    TextIndexMaintenance.sync(ix, j)
    TextIndexMaintenance.lastSyncPlans.foreach(p =>
      assert(!p.matches("(?s).*seg-\\d+-adds[.]parquet.*"),
        s"delete-sync consulted the postings relation:\n$p"))
    assert(found("text") == Set("alpha text", "gamma text"))
  }

  test("zero-token docs count toward nDocs: indexed IDF matches the corpus path") {
    // "!!!" tokenizes to nothing under the latin analyzer — the corpus
    // path still counts it in N (docs.count()); the index must too, or
    // indexed-path scores diverge from the one-oracle contract
    val docs = Seq(("1", "spark engine"), ("2", "spark streams"), ("3", "!!!"))
      .toDF("doc_id", "text")
    val ix = PersistedSearchIndex.create(spark, tmp("zt"), docs)
    assert(ix.nDocs == 3)
    def scores(df: org.apache.spark.sql.DataFrame): Map[String, Double] =
      df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val corpus = scores(FullText.searchAll(docs, Seq("spark", "engine")))
    val indexed = scores(FullText.searchIndexAll(ix.view.postings, ix.view.nDocs,
      Seq("spark", "engine")))
    assert(corpus == indexed, s"corpus=$corpus indexed=$indexed")
    // the zero-token doc is MEMBER-tracked: removing it keeps the
    // arithmetic consistent and it never re-tokenizes on sync paths
    assert(ix.liveDocIds.collect().map(_.getString(0)).toSet == Set("1", "2", "3"))
    ix.update(Seq.empty[(String, String)].toDF("doc_id", "text"),
      Seq("3").toDF("doc_id"), toVersion = 1L)
    assert(ix.nDocs == 2)
    assert(ix.liveDocIds.collect().map(_.getString(0)).toSet == Set("1", "2"))
  }

  test("compact keeps superseded segments for in-flight views; vacuum reclaims them") {
    val dir = tmp("cv")
    val ix = PersistedSearchIndex.create(spark, dir,
      Seq(("1", "alpha beta"), ("2", "beta gamma")).toDF("doc_id", "text"))
    ix.update(Seq(("3", "gamma delta")).toDF("doc_id", "text"),
      Seq("1").toDF("doc_id"), toVersion = 1L)
    // a reader resolves a view against the pre-compact manifest…
    val inFlight = ix.view.postings
    ix.compact()
    // …and still reads it AFTER compact (segment files retained)
    assert(inFlight.select("doc_id").distinct().count() == 2)
    val seg0 = java.nio.file.Paths.get(dir).resolve("seg-0-adds.parquet")
    assert(Files.exists(seg0), "compact must keep superseded segments")
    // vacuum is the explicit reclaim: superseded files go, the live
    // (compacted) segment and the view survive
    ix.vacuum()
    assert(!Files.exists(seg0), "vacuum must delete superseded segments")
    assert(FullText.searchIndexAll(ix.view.postings, ix.view.nDocs, Seq("gamma"))
      .collect().map(_.getString(0)).toSet == Set("2", "3"))
    assert(ix.liveDocIds.collect().map(_.getString(0)).toSet == Set("2", "3"))
  }

  test("compact of an EMPTIED index keeps the segment watermark; updates continue") {
    val dir = tmp("cw")
    val ix = PersistedSearchIndex.create(spark, dir,
      Seq(("1", "alpha beta")).toDF("doc_id", "text"))
    ix.update(Seq.empty[(String, String)].toDF("doc_id", "text"),
      Seq("1").toDF("doc_id"), toVersion = 1L)
    ix.compact() // live state is empty; superseded seg-0/1 files stay
    assert(ix.view.postings.isEmpty)
    // the watermark survives: the next batch must not collide with the
    // retained seg-0 files (pre-fix: errorifexists threw, wedging
    // every later write until a manual vacuum)
    ix.update(Seq(("9", "gamma")).toDF("doc_id", "text"),
      Seq.empty[String].toDF("doc_id"), toVersion = 2L)
    assert(FullText.searchIndexAll(ix.view.postings, ix.view.nDocs, Seq("gamma"))
      .collect().map(_.getString(0)).toSeq == Seq("9"))
    // reopen sees the same state (the marker batch round-trips)
    val re = PersistedSearchIndex.open(spark, dir)
    assert(re.view.nDocs == 1 && re.liveDocIds.collect().map(_.getString(0)).toSeq == Seq("9"))
  }

  test("update rejects a doc_id in both sides of one batch") {
    val ix = PersistedSearchIndex.create(spark, tmp("dj"),
      Seq(("1", "alpha")).toDF("doc_id", "text"))
    val boom = intercept[IllegalArgumentException](
      ix.update(Seq(("1", "alpha prime")).toDF("doc_id", "text"),
        Seq("1").toDF("doc_id"), toVersion = 1L))
    assert(boom.getMessage.contains("BOTH"), boom.getMessage)
  }

  test("searchInSearch routes by index stats: broadcast-class terms → index, above cutoff → prefilter") {
    val g0 = Graft.empty(spark).update(
      """INSERT DATA {
        |  x:a note "magnetar pulse" . x:b note "plain words" .
        |  x:c note "magnetar flare" . }""".stripMargin)
    val ix = PersistedSearchIndex.create(spark, tmp("rt"),
      graft.sparql.BuiltinServices.literalSpace(g0.store.quads))
    // the index route needs BOTH the postings index and an
    // object-keyed hit→subject path (on a virtual view the prefilter's
    // one pass stays measured-cheaper) — lay down the OSP-hash twin
    val ospDir = tmp("rtosp")
    graft.rdf.TripleStorage.writeOspHash(
      g0.store.quads.select("s", "p", "o").distinct(), ospDir)
    val gi = g0.copy(textIndex = Some(ix.view), ospHash = Some(ospDir))
    // the stats hook bounds a term's postings volume from footers
    val bound = ix.view.bucketRowBound.get
    assert(bound(Seq(PersistedSearchIndex.termBucket("magnetar"))) >= 2)
    val q =
      """SELECT ?s WHERE {
        |  ?s note ?t .
        |  SERVICE bds:searchInSearch { ?s bds:searchInSearch "magnetar" . }
        |} ORDER BY ?s""".stripMargin
    // no score options → the prefilter APPLIES; the footer bound is
    // tiny (≤ cutoff) and the hit join is pruned, so the router takes
    // the bucket-pruned index lookup (both paths checkpoint their hit
    // sets, so the route is observed through the instrumentation)
    val viaIx = gi.query(q)
    assert(graft.sparql.BuiltinServices.lastRoute == "index")
    assert(viaIx.collect().map(_.getString(0)).toSeq == Seq("x:a", "x:c"))
    // squeeze the cutoff to 0: the SAME query keeps the prefilter
    // (the stopword-class route), answers identically
    spark.conf.set("graft.search.indexRouteMaxBucketRows", "0")
    try {
      val viaPre = gi.query(q)
      assert(graft.sparql.BuiltinServices.lastRoute == "prefilter",
        "cutoff 0 must route to the substring prefilter")
      assert(viaPre.collect().map(_.getString(0)).toSeq == Seq("x:a", "x:c"))
    } finally spark.conf.unset("graft.search.indexRouteMaxBucketRows")
    // index attached but NO object-keyed path: the r13 measurement
    // stands — the one-pass prefilter stays preferred on a virtual view
    assert(g0.copy(textIndex = Some(ix.view)).query(q)
      .collect().map(_.getString(0)).toSeq == Seq("x:a", "x:c"))
    assert(graft.sparql.BuiltinServices.lastRoute == "prefilter")
    // no index attached → the prefilter serves (stats can't route)
    assert(g0.query(q).collect().map(_.getString(0)).toSeq == Seq("x:a", "x:c"))
    assert(graft.sparql.BuiltinServices.lastRoute == "prefilter")
    // a score-class query (prefilter unsound) keeps the index route
    val scoreQ = q.replace("""?s bds:searchInSearch "magnetar" .""",
      """?s bds:searchInSearch "magnetar" . ?s bds:minRelevance "0.0001" .""")
    assert(gi.query(scoreQ).collect().map(_.getString(0)).toSeq == Seq("x:a", "x:c"))
    assert(graft.sparql.BuiltinServices.lastRoute == "index")
  }

  test("bds:search and searchInSearch consult the index: no tokenize stage, same results") {
    val g0 = Graft.empty(spark).update(
      """INSERT DATA {
        |  x:a note "the spark engine" . x:b note "plain words" .
        |  x:c note "spark join spark" . x:b link x:a . }""".stripMargin)
    val ixDir = tmp("gix")
    val ix = PersistedSearchIndex.create(spark, ixDir,
      graft.sparql.BuiltinServices.literalSpace(g0.store.quads))
    val gi = g0.copy(textIndex = Some(ix.view))
    val search =
      """SELECT ?lit ?sc WHERE {
        |  ?lit bds:search "spark" . ?lit bds:relevance ?sc .
        |} ORDER BY ?lit""".stripMargin
    // the score option routes past the substring prefilter (which
    // wins where it applies — measured) onto the INDEX path
    val sis =
      """SELECT ?s WHERE {
        |  ?s note ?t .
        |  SERVICE bds:searchInSearch {
        |    ?s bds:searchInSearch "spark" . ?s bds:minRelevance "0.001" .
        |  }
        |} ORDER BY ?s""".stripMargin
    // identical results through either path (scores included: df and
    // N come from the index, which IS the literal corpus)
    assert(gi.query(search).collect().toSeq == g0.query(search).collect().toSeq)
    assert(gi.query(sis).collect().toSeq == g0.query(sis).collect().toSeq)
    // the indexed plans contain NO tokenize/explode stage (Generate)
    def hasGenerate(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.executedPlan.toString.contains("Generate")
    assert(!hasGenerate(gi.query(search)), "indexed search should not tokenize")
    assert(!hasGenerate(gi.query(sis)), "indexed searchInSearch should not tokenize")
    // STRONGER than a plan string: the corpus is NEVER EVALUATED on
    // the index path — a source whose corpus throws on any evaluation
    // still answers the indexed search; without the index the same
    // source blows up (sanity that the poison is live)
    import graft.sparql.{Compiler, Parser, TriplePattern, TripleSource}
    val trips = g0.store.quads.select("s", "p", "o").distinct()
    def poisonSrc(withIx: Boolean): TripleSource = new TripleSource {
      def triples = trips
      def fuseStar(patterns: Seq[TriplePattern],
                   subjectTables: Option[Set[String]]) = None
      override def searchCorpus = Some(spark.range(1).select(
        raise_error(lit("corpus evaluated")).cast("string").as("doc_id"),
        lit("t").as("text")))
      override def searchIndex = if (withIx) Some(ix.view) else None
    }
    assert(Compiler.compile(Parser.parse(search), poisonSrc(withIx = true))
      .collect().nonEmpty)
    val boom = intercept[Exception](
      Compiler.compile(Parser.parse(search), poisonSrc(withIx = false)).collect())
    assert(boom.getMessage != null || boom.getCause != null) // corpus path pays the scan
    // option surface rides the index too: minRelevance/maxRank and
    // matchExact (text recomputed from the literal term id)
    val opt =
      """SELECT ?s WHERE {
        |  ?s note ?t .
        |  SERVICE bds:searchInSearch {
        |    ?s bds:searchInSearch "spark join" . ?s bds:matchExact "true" .
        |  }
        |} ORDER BY ?s""".stripMargin
    assert(gi.query(opt).collect().toSeq == g0.query(opt).collect().toSeq)
    // an analyzer-mismatched index is NOT consulted (its postings
    // were tokenized differently) — the corpus path serves instead:
    // results match the plain store, and the poisoned-corpus source
    // now BLOWS UP (proof the fallback really evaluates the corpus)
    val mismatched = g0.copy(textIndex = Some(ix.view.copy(analyzer = "cjk")))
    assert(mismatched.query(search).collect().toSeq == g0.query(search).collect().toSeq)
    def poisonMismatch: TripleSource = new TripleSource {
      def triples = trips
      def fuseStar(patterns: Seq[TriplePattern],
                   subjectTables: Option[Set[String]]) = None
      override def searchCorpus = Some(spark.range(1).select(
        raise_error(lit("corpus evaluated")).cast("string").as("doc_id"),
        lit("t").as("text")))
      override def searchIndex = Some(ix.view.copy(analyzer = "cjk"))
      override def defaultAnalyzer = Some("latin")
    }
    intercept[Exception](
      Compiler.compile(Parser.parse(search), poisonMismatch).collect())
  }
}
