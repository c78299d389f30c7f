package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.rdf.{Journal, QuadStore}

class JournalSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def quads(rows: (String, String, String, String)*) =
    rows.toDF("s", "p", "o", "g")

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3))).toSet

  private def tmp() = java.nio.file.Files.createTempDirectory("graft_journal").toString

  test("commit points accumulate; snapshot reads any historical version") {
    val j = Journal.create(spark, tmp())
    assert(j.version == 0 && rowsOf(j.snapshot()).isEmpty)
    j.append(quads(("a", "p", "1", "g"), ("b", "p", "2", "g")))
    j.commit(
      adds = quads(("c", "p", "3", "g")),
      dels = quads(("a", "p", "1", "g")))
    assert(j.version == 2)
    assert(rowsOf(j.snapshot(0)).isEmpty)
    assert(rowsOf(j.snapshot(1)) ==
      Set(("a", "p", "1", "g"), ("b", "p", "2", "g")))
    assert(rowsOf(j.snapshot()) ==
      Set(("b", "p", "2", "g"), ("c", "p", "3", "g")))
  }

  test("delete+insert of the same quad in one commit leaves it present (SPARQL order)") {
    val j = Journal.create(spark, tmp())
    j.append(quads(("x", "p", "1", "g")))
    j.commit(adds = quads(("x", "p", "1", "g")), dels = quads(("x", "p", "1", "g")))
    assert(rowsOf(j.snapshot()) == Set(("x", "p", "1", "g")))
    // and a later lone delete really removes it, then a re-add revives it
    j.commit(adds = quads(), dels = quads(("x", "p", "1", "g")))
    assert(rowsOf(j.snapshot()).isEmpty)
    j.append(quads(("x", "p", "1", "g")))
    assert(rowsOf(j.snapshot()) == Set(("x", "p", "1", "g")))
  }

  test("duplicate adds across commits resolve to one row (set semantics)") {
    val j = Journal.create(spark, tmp())
    j.append(quads(("a", "p", "1", "g"), ("a", "p", "1", "g")))
    j.append(quads(("a", "p", "1", "g")))
    assert(j.snapshot().count() == 1)
    // safe to hand to QuadStore's set-invariant constructor
    assert(QuadStore(j.snapshot()).graphs.count() == 1)
  }

  test("compact seals a fast path: snapshot of a compacted head is shuffle-free") {
    val j = Journal.create(spark, tmp())
    j.append(quads(("a", "p", "1", "g"), ("b", "p", "2", "g")))
    j.commit(adds = quads(("c", "q", "3", "h")), dels = quads(("a", "p", "1", "g")))
    val before = rowsOf(j.snapshot())
    val cv = j.compact()
    assert(rowsOf(j.snapshot()) == before)
    val plan = j.snapshot(cv).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"compacted snapshot should be a bare scan:\n$plan")
    // history before the compaction still resolves
    assert(rowsOf(j.snapshot(1)) == Set(("a", "p", "1", "g"), ("b", "p", "2", "g")))
    // deltas after the compaction resolve against the base via anti-join
    j.append(quads(("d", "p", "4", "g")))
    assert(rowsOf(j.snapshot()) == before + (("d", "p", "4", "g")))
    val deltaPlan = j.snapshot().queryExecution.executedPlan.toString
    assert(deltaPlan.contains("LeftAnti"), s"base should merge via anti-join:\n$deltaPlan")
  }

  test("vacuum drops pre-compaction history loudly, keeps the head readable") {
    val j = Journal.create(spark, tmp())
    j.append(quads(("a", "p", "1", "g")))
    j.commit(adds = quads(("b", "p", "2", "g")), dels = quads(("a", "p", "1", "g")))
    j.compact()
    j.vacuum()
    assert(rowsOf(j.snapshot()) == Set(("b", "p", "2", "g")))
    intercept[IllegalArgumentException](j.snapshot(1).collect())
  }

  test("sinkBatch is exactly-once: a replayed micro-batch id commits nothing") {
    val j = Journal.create(spark, tmp())
    j.sinkBatch(quads(("a", "p", "1", "g")), batchId = 0L)
    assert(j.version == 1)
    // Spark replays the in-flight batch after failure recovery
    j.sinkBatch(quads(("a", "p", "1", "g")), batchId = 0L)
    assert(j.version == 1)
    j.sinkBatch(quads(("b", "p", "2", "g")), batchId = 1L)
    assert(j.version == 2 && j.snapshot().count() == 2)
  }

  test("sink: batch ids are scoped per appId — a fresh query's batch 0 is not a replay") {
    val j = Journal.create(spark, tmp())
    j.sink("queryA")(quads(("a", "p", "1", "g")), batchId = 0L)
    assert(j.version == 1)
    // same app, same batch id: replay, skipped
    j.sink("queryA")(quads(("a", "p", "1", "g")), batchId = 0L)
    assert(j.version == 1)
    // a NEW streaming query (fresh checkpoint) restarts ids at 0 —
    // different appId, so its first batch is a new transaction
    j.sink("queryB")(quads(("b", "p", "2", "g")), batchId = 0L)
    assert(j.version == 2 && j.snapshot().count() == 2)
    intercept[IllegalArgumentException](j.sink("bad app id!")(quads(), 0L))
  }

  test("log tail is cached: many commits parse each record once, reattach parses all once") {
    val dir = tmp()
    val j = Journal.create(spark, dir)
    val n = 12
    (1 to n).foreach(i => j.append(quads(("s" + i, "p", i.toString, "g"))))
    // the publishing handle extends its own cache — zero re-parses of
    // its own records, so parses stay O(1) not O(commits^2)
    assert(j.recordParses <= 1, s"publisher re-parsed its own log: ${j.recordParses}")
    assert(j.snapshot().count() == n && j.recordParses <= 1)
    // a reattaching handle parses the whole tail exactly once...
    val j2 = Journal.open(spark, dir)
    assert(j2.version == n.toLong)
    val afterOpen = j2.recordParses
    assert(afterOpen == n + 1L, s"open should parse each record once: $afterOpen")
    // ...and subsequent operations parse nothing new
    j2.snapshot().count(); j2.version
    assert(j2.recordParses == afterOpen)
    // records published by ANOTHER handle are picked up incrementally
    j.append(quads(("x", "p", "x", "g")))
    assert(j2.version == n + 1L && j2.recordParses == afterOpen + 1)
    // compaction writes a log CHECKPOINT: a cold attach then reads ONE
    // checkpoint document + only post-compaction record files, instead
    // of parsing the whole history
    j2.compact()
    j2.append(quads(("y", "p", "y", "g")))
    val j3 = Journal.open(spark, dir)
    assert(j3.version == n + 3L)
    assert(j3.recordParses == 1,
      s"cold open after checkpoint should parse only the tail: ${j3.recordParses}")
    assert(j3.snapshot().count() == n + 2L)
    // vacuum rewrites the checkpoint so a stale version fails loud
    // from a COLD handle too
    j3.vacuum()
    val j4 = Journal.open(spark, dir)
    intercept[IllegalArgumentException](j4.snapshot(1).collect())
  }

  test("streaming ingest: readStream -> foreachBatch lands micro-batches as commits") {
    import org.apache.spark.sql.streaming.Trigger
    val in = java.nio.file.Files.createTempDirectory("graft_jstream")
    // two files -> two micro-batches at maxFilesPerTrigger=1
    quads(("a", "p", "1", "g")).coalesce(1).write.parquet(s"$in/f0.parquet")
    quads(("b", "p", "2", "g"), ("a", "p", "1", "g")).coalesce(1)
      .write.parquet(s"$in/f1.parquet")
    val j = Journal.create(spark, tmp())
    val q = spark.readStream.schema(quads().schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$in/*.parquet")
      .writeStream.foreachBatch(j.sinkBatch _)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(j.version == 2)
    assert(rowsOf(j.snapshot()) == Set(("a", "p", "1", "g"), ("b", "p", "2", "g")))
  }

  test("BulkLoad: mixed-format files land as one commit; reattach + incremental batch") {
    import graft.rdf.BulkLoad
    val nt = java.nio.file.Files.createTempFile("graft_bulk", ".nt")
    java.nio.file.Files.writeString(nt,
      "<urn:graft:b:1> <urn:graft:label> \"one\" .\n" +
      "<urn:graft:b:2> <urn:graft:label> \"two\" .\n")
    val ttl = java.nio.file.Files.createTempFile("graft_bulk", ".ttl")
    java.nio.file.Files.writeString(ttl,
      """@prefix v: <urn:graft:> . v:b:3 v:label "three" .""")
    val dir = tmp()
    val (v1, n1) = BulkLoad.run(spark, dir, Seq(nt.toString, ttl.toString))
    assert(n1 == 3 && v1 == 1)
    val j = Journal.open(spark, dir)
    assert(j.snapshot().count() == 3)
    // compacted: the head is a bare scan
    assert(!j.snapshot().queryExecution.executedPlan.toString.contains("Exchange"))
    // a second batch reattaches and appends into a named graph
    val nq = java.nio.file.Files.createTempFile("graft_bulk", ".nt")
    java.nio.file.Files.writeString(nq,
      "<urn:graft:b:4> <urn:graft:label> \"four\" .\n")
    val (v2, n2) = BulkLoad.run(spark, dir, Seq(nq.toString),
      graph = Some("g:extra"), compact = false)
    assert(n2 == 1 && v2 > v1)
    val snap = Journal.open(spark, dir).snapshot()
    assert(snap.count() == 4)
    assert(snap.filter(org.apache.spark.sql.functions.col("g") === "g:extra").count() == 1)
  }

  test("segments are graph-partitioned: a graph-bound read prunes to one partition") {
    val j = Journal.create(spark, tmp())
    j.append(quads(("a", "p", "1", "g1"), ("b", "p", "2", "g2"), ("c", "p", "3", "g3")))
    j.compact()
    val df = j.snapshot().filter($"g" === "g1")
    assert(rowsOf(df) == Set(("a", "p", "1", "g1")))
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: ["), s"no partition pruning in:\n$scan")
    val pf = "(?s).*PartitionFilters: \\[([^\\]]*)\\].*".r
      .replaceAllIn(scan, m => java.util.regex.Matcher.quoteReplacement(m.group(1)))
    assert(pf.contains("g"), s"partition filter should carry g, got: $pf")
  }

  test("touchedGraphs reads the manifest: per-commit graph sets, no data scan") {
    val j = Journal.create(spark, tmp())
    val v1 = j.append(quads(("a", "p", "1", "g1"), ("b", "p", "2", "g2")))
    val v2 = j.commit(quads(("c", "p", "3", "g3")), quads(("a", "p", "1", "g1")))
    assert(j.touchedGraphs(v1).contains(Set("g1", "g2")))
    // adds ∪ dels: the delete of g1 counts as touching g1
    assert(j.touchedGraphs(v2).contains(Set("g1", "g3")))
    intercept[RuntimeException] { j.touchedGraphs(99L) }
  }

  test("appendRaw skips the write-side distinct; snapshot stays set-semantic; footer counts") {
    val j = Journal.create(spark, tmp())
    val v = j.appendRaw(quads(
      ("a", "p", "1", "g1"), ("a", "p", "1", "g1"), ("b", "p", "2", "g2")))
    // the raw segment keeps the duplicate — the count is a FOOTER read
    assert(j.segmentRowCount(v).contains(3L))
    assert(j.segmentRowCount(v, Some("g2")).contains(1L))
    assert(j.segmentRowCount(v, Some("gX")).contains(0L))
    // resolution dedups; compaction rewrites the deduped state
    assert(j.snapshot().count() == 2)
    val cv = j.compact()
    assert(j.segmentRowCount(cv).contains(2L))
  }

  test("a vacuum by ANOTHER handle fails a stale handle's historical read loud") {
    val dir = tmp()
    val j = Journal.create(spark, dir)
    j.append(quads(("a", "p", "1", "g")))
    j.append(quads(("b", "p", "2", "g")))
    val stale = Journal.open(spark, dir)
    assert(stale.snapshot(1).count() == 1) // warm the stale handle's record cache
    j.compact()
    j.vacuum()
    // pre-fix: the cached record resolved version 1 from missing
    // segments into an EMPTY state; now the refresh drops removed
    // records and the read fails on "no commit point"
    intercept[IllegalArgumentException](stale.snapshot(1).collect())
    assert(stale.snapshot().count() == 2) // the head stays readable
  }

  test("changedQuads: logical delta of a range, compactions skipped, vacuum gaps loud") {
    val dir = tmp()
    val j = Journal.create(spark, dir)
    j.append(quads(("a", "p", "1", "g")))                       // v1
    j.commit(quads(("b", "p", "2", "g")), quads(("a", "p", "1", "g"))) // v2
    j.compact()                                                 // v3 (no logical change)
    j.append(quads(("c", "p", "3", "g")))                       // v4
    val (adds, dels) = j.changedQuads(1)
    // v2's add+del and v4's add; the compaction's full-state rewrite
    // contributes NOTHING
    assert(adds.select("s").collect().map(_.getString(0)).toSet == Set("b", "c"))
    assert(dels.select("s").collect().map(_.getString(0)).toSet == Set("a"))
    // empty range = empty sides
    val (a2, d2) = j.changedQuads(4)
    assert(a2.isEmpty && d2.isEmpty)
    // a vacuumed sub-range makes the delta unknowable — fail loud,
    // never resolve a partial change set
    j.vacuum() // drops v1-v2 (before the compaction at v3)
    val e = intercept[IllegalArgumentException](j.changedQuads(0))
    assert(e.getMessage.contains("vacuumed"), e.getMessage)
    // post-compaction catch-up still works
    assert(j.changedQuads(3)._1.count() == 1)
  }

  test("changeLog + SERVICE bd:history: version-attributed log, action/graph/range filters") {
    import graft.sparql.{Compiler, HistoryService, Parser, TripleSource}
    val dir = tmp()
    val j = Journal.create(spark, dir)
    j.append(quads(("a", "p", "1", "g:x")))                            // v1
    j.commit(quads(("b", "p", "2", "g:y")), quads(("a", "p", "1", "g:x"))) // v2
    j.compact()                                                        // v3 (no-op logically)
    j.append(quads(("c", "p", "3", "g:x")))                            // v4
    // full retained log: per-commit attribution, compaction contributes nothing
    val log = j.changeLog(0).collect()
      .map(r => (r.getString(0), r.getLong(4), r.getString(5))).toSet
    assert(log == Set(("a", 1L, "added"), ("a", 2L, "removed"),
      ("b", 2L, "added"), ("c", 4L, "added")))
    // scale shape: the log is a UNION of delta-segment scans with
    // constant columns — no shuffle, no head scan (plan-asserted)
    val plan = j.changeLog(0).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"changeLog must not shuffle:\n$plan")
    // the service surface over the same journal
    HistoryService.register(j)
    try {
      def q(opts: String) = Compiler.compile(Parser.parse(
        s"""SELECT ?s ?version ?action WHERE {
           |  SERVICE bd:history { $opts }
           |} ORDER BY ?version ?s""".stripMargin),
        TripleSource.plain(j.snapshot().select("s", "p", "o")))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
      assert(q("""_:h bd:fromVersion "0" .""") == Seq(
        ("a", 1L, "added"), ("a", 2L, "removed"), ("b", 2L, "added"),
        ("c", 4L, "added")))
      // action filter: one side only
      assert(q("""_:h bd:fromVersion "0" . _:h bd:action "removed" .""") ==
        Seq(("a", 2L, "removed")))
      // graph filter prunes to one named graph's changes
      assert(q("""_:h bd:fromVersion "0" . _:h bd:graph "g:y" .""") ==
        Seq(("b", 2L, "added")))
      // version window: (1, 2]
      assert(q("""_:h bd:fromVersion "1" . _:h bd:toVersion "2" .""") ==
        Seq(("a", 2L, "removed"), ("b", 2L, "added")))
      // unknown option is loud
      val e = intercept[RuntimeException](q("""_:h bd:nonsense "x" ."""))
      assert(e.getMessage.contains("unrecognized"), e.getMessage)
      // bd:rdrhistory: the statement-ANNOTATION slice of the same log
      // (subjects that are statement ids) — the reference's second
      // registered history name, likewise create()-throwing there
      j.append(quads((graft.rdf.Rdr.sidOf("a", "p", "1"), "assertedBy", "alice", "g:x"))) // v5
      val rdr = Compiler.compile(Parser.parse(
        """SELECT ?s ?o ?version WHERE {
          |  SERVICE bd:rdrhistory { _:h bd:fromVersion "0" . }
          |} ORDER BY ?version""".stripMargin),
        TripleSource.plain(j.snapshot().select("s", "p", "o")))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
      assert(rdr == Seq((graft.rdf.Rdr.sidOf("a", "p", "1"), "alice", 5L)), rdr.toString)
    } finally HistoryService.unregister()
    // a vacuumed sub-range keeps changedQuads' loud contract
    j.vacuum()
    val e2 = intercept[IllegalArgumentException](j.changeLog(0))
    assert(e2.getMessage.contains("vacuumed"), e2.getMessage)
  }

  test("ospHashTwin compaction: durable connection's hit→subject join prunes to obh buckets") {
    import graft.rdf.Repository
    val repo = Repository.create(spark, tmp())
    repo.update(
      """INSERT DATA {
        |  x:a note "alpha text" . x:b note "beta text" . x:c link x:a . }""".stripMargin)
    // before any twin: no osp access path on the connection
    assert(repo.connection().ospHash.isEmpty)
    repo.compact(ospHashTwin = true)
    val g = repo.connection()
    assert(g.ospHash.isDefined, "compacted head with a twin must wire the access path")
    // the score-class searchInSearch (minRelevance defeats the
    // substring prefilter) routes its O→S join through scanForObjects
    // — on this connection that is the bucket-pruned twin scan
    val q =
      """SELECT ?s WHERE {
        |  ?s note ?t .
        |  SERVICE bds:searchInSearch {
        |    ?s bds:searchInSearch "alpha" . ?s bds:minRelevance "0.0001" .
        |  }
        |} ORDER BY ?s""".stripMargin
    val df = g.query(q)
    assert(df.collect().map(_.getString(0)).toSeq == Seq("x:a"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("obh"),
      s"expected the twin's obh partition pruning in the plan:\n$plan")
    // a delta after the compaction INVALIDATES the twin for the head
    // (it mirrors the compacted state only) — and the historical
    // connection at the compaction point still serves it
    val twinV = repo.version
    repo.update("""INSERT DATA { x:d note "gamma text" }""")
    assert(repo.connection().ospHash.isEmpty,
      "a stale twin must not serve the moved head")
    assert(repo.connection(twinV).ospHash.isDefined)
    // the next twin compaction re-arms the head, with the new state
    repo.compact(ospHashTwin = true)
    val g2 = repo.connection()
    assert(g2.ospHash.isDefined)
    val q2 = q.replace("alpha", "gamma")
    assert(g2.query(q2).collect().map(_.getString(0)).toSeq == Seq("x:d"))
    // an IN-MEMORY mutation on a twin-bearing handle drops the
    // accelerator too: the twin describes the committed version, and a
    // hit→subject join through it would miss the staged triple
    val staged = g2.update("""INSERT DATA { x:e note "gamma fresh" }""")
    assert(staged.ospHash.isEmpty && staged.textIndex.isEmpty,
      "update must clear committed-version accelerators")
    assert(staged.query(q2).collect().map(_.getString(0)).toSeq == Seq("x:d", "x:e"))
  }

  test("open() reattaches; create() on an existing journal and version races fail loud") {
    val dir = tmp()
    val j = Journal.create(spark, dir)
    j.append(quads(("a", "p", "1", "g")))
    val j2 = Journal.open(spark, dir)
    assert(j2.version == 1 && rowsOf(j2.snapshot()) == Set(("a", "p", "1", "g")))
    intercept[IllegalArgumentException](Journal.create(spark, dir))
    // a racing writer's half-landed segment for the next version makes
    // the errorifexists append fail loud instead of overwriting
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(dir, "segments", "c2-adds.parquet"))
    intercept[Exception](j.append(quads(("b", "p", "2", "g"))))
  }
}
