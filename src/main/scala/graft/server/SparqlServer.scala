package graft.server

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.Graft
import graft.rdf.{QuadStore, Repository, Serializer}
import graft.sparql.{Algebra, Ask, Parser, Update}
import java.net.InetSocketAddress
import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.{ConcurrentHashMap, Executors}
import java.util.concurrent.atomic.AtomicReference
import org.apache.spark.sql.DataFrame
import scala.jdk.CollectionConverters._

/** SPARQL 1.1 Protocol endpoint + REST management plane over
  * [[graft.Graft]] handles — the NanoSparqlServer analog
  * (bigdata-core/bigdata-sails/.../webapp/NanoSparqlServer.java and its
  * servlet stack). JDK HttpServer, no new dependency.
  *
  * QUERY + UPDATE (QueryServlet/UpdateServlet):
  *   - `POST /sparql` with `application/sparql-query` (or
  *     `GET /sparql?query=…`): SELECT renders by Accept —
  *     `application/sparql-results+json` (default) / `+xml` /
  *     `text/csv` / `text/tab-separated-values`; ASK renders the
  *     boolean document (JSON/XML); CONSTRUCT / DESCRIBE render
  *     N-Triples. Result documents STREAM: rows leave through a
  *     chunked response via `toLocalIterator`, so an unbounded
  *     CONSTRUCT never buffers on the driver (one partition at a time
  *     does — the protocol's floor).
  *   - `…?explain` returns the formatted Spark plan as `text/plain`
  *     instead of results (BigdataRDFContext's explain mode analog).
  *   - `POST /sparql/update` with `application/sparql-update` (or
  *     form `update=`): applies the ';'-separated request, 204.
  *
  * DATA INGEST (InsertServlet/DeleteServlet — the curl surface every
  * migrating Blazegraph script hits on day one):
  *   - `POST /sparql` with an RDF document body — Content-Type picks
  *     the parser: `text/turtle`, `application/n-triples`,
  *     `application/rdf+xml`, `application/ld+json`,
  *     `application/n-quads`, `application/trig`; optional
  *     `context-uri=` (or `graph=`) targets a named graph. Returns the
  *     reference's `<data modified="N"/>` document. An unsupported
  *     content type is a loud 415, never a silent parse-as-query.
  *   - `DELETE /sparql?query=<CONSTRUCT…>` removes the construction's
  *     statements (every graph they appear in);
  *     `DELETE /sparql` with an RDF body removes those statements.
  *
  * METADATA (QueryServlet.java:152-171 / RESTServlet.java:252-269):
  *   - `GET /sparql?ESTCARD[&s=…&p=…&o=…&c=…]` — fast range count of
  *     the matching access path, `<data rangeCount="N"/>`;
  *   - `GET /sparql?CONTEXTS` — `<contexts><context uri=…/>…`;
  *   - `GET /sparql?GETSTMTS[&s=…&p=…&o=…&c=…]` — matching statements
  *     as streamed N-Quads. Term parameters are N-Triples-encoded
  *     (`<iri>`, `"lit"`, `"lit"@lang`, `"lit"^^<dt>`).
  *
  * STATUS + CANCEL (StatusServlet.java:165-240): every query runs in
  * its own Spark job group keyed by UUID; `GET /status` lists running
  * queries, `…?cancelQuery&queryId=<uuid>` cancels the group
  * (`SparkContext.cancelJobGroup` — the cluster-wide kill the
  * reference implements by hand).
  *
  * MULTI-TENANCY (MultiTenancyServlet — one server, many isolated
  * knowledge bases):
  *   - `GET /namespace` — one N-Triples description line per live
  *     namespace; `POST /namespace` with `name=…` creates (409 if it
  *     exists); `DELETE /namespace/<ns>` drops it — except the DEFAULT
  *     namespace, which is protected (403), as the reference protects
  *     its default KB;
  *   - `/namespace/<ns>/sparql[/update]` — the full surface above,
  *     scoped. The bare `/sparql` paths resolve the default namespace
  *     (`kb`) PER REQUEST, so they can never diverge from
  *     `/namespace/kb/sparql`.
  *
  * DURABILITY: constructed over a journal directory
  * ([[SparqlServer.durable]]), every namespace is a [[Repository]] —
  * updates commit their op-shaped delta through the journal
  * ([[Repository.update]]), ingest lands as insert-only commits, and a
  * server restart reattaches every namespace from disk (the
  * reference's namespaces are journal-backed the same way). The
  * in-memory constructor keeps the old ephemeral behavior for tests
  * and scratch serving.
  *
  * [[graft.sparql.RemoteService]] speaks this protocol back, so two
  * graft clusters federate over SERVICE with no extra glue, and
  * [[graft.server.RemoteRepository]] is the client-side analog of the
  * reference's bigdata-client RemoteRepository. */
final class SparqlServer private (initial: Graft, host: String, port: Int,
                                  val defaultNamespace: String,
                                  journalDir: Option[String],
                                  autoCompactEvery: Int) {

  def this(initial: Graft, host: String = "127.0.0.1", port: Int = 0,
           defaultNamespace: String = "kb") =
    this(initial, host, port, defaultNamespace, None, Int.MaxValue)

  private val spark = initial.spark
  import spark.implicits._

  // ---- tenants ----------------------------------------------------

  /** One namespace's store operations — memory- or journal-backed. */
  private sealed trait Tenant {
    def current: Graft
    def update(text: String): Unit =
      updateOps(graft.sparql.Parser.parseUpdates(text))
    /** Apply already-parsed update ops — the protocol dataset knobs
      * (using-graph-uri) rewrite the ops before application. */
    def updateOps(ops: Seq[graft.sparql.UpdateOp]): Unit
    /** Insert parsed quads; returns the statement count ingested. */
    def ingest(quads: DataFrame): Long
    /** Remove every graph's occurrence of the (s,p,o) rows; returns
      * the quad count removed. */
    def remove(spo: DataFrame): Long
    /** Remove exactly these (s,p,o,g) quads — the DELETE-by-access-
      * path arm (graph-scoped, unlike [[remove]]'s every-graph
      * contract); returns the quad count removed. */
    def removeQuads(quads: DataFrame): Long
    def removeQuadsSuppressed(quads: DataFrame): Long = removeQuads(quads)
    // `suppressTruthMaintenance=true` variants (the reference's update
    // servlets all accept the knob — QueryServlet.java:132,
    // DeleteServlet.java:128): identical to the plain ops on non-TM
    // tenants, verbatim commits (no closure maintenance) on TmTenant
    def updateOpsSuppressed(ops: Seq[graft.sparql.UpdateOp]): Unit = updateOps(ops)
    def ingestSuppressed(quads: DataFrame): Long = ingest(quads)
    def removeSuppressed(spo: DataFrame): Long = remove(spo)
    /** The ASSERTED-statements view — `includeInferred=false`
      * (QueryServlet.java:140, default true; honored by query/
      * HASSTMT/GETSTMTS): identical to [[current]] on non-TM tenants,
      * the base (un-entailed) store on a truth-maintenance tenant. */
    def asserted: Graft = current
    def assertedAt(version: Long): Graft = at(version)
    /** ATOMIC remove+insert — the reference's UPDATE-with-query /
      * UPDATE-with-body servlets (UpdateServlet.java:90,817): remove
      * every graph's occurrence of `removeSpo`, insert `adds`, as ONE
      * operation; returns removed + inserted. */
    def updateWithBody(removeSpo: DataFrame, adds: DataFrame,
                       suppress: Boolean): Long
    /** Read-only connection against a historical commit point — the
      * protocol's `?timestamp=` knob (TxServlet's read-only tx
      * analog); durable namespaces only. */
    def at(version: Long): Graft =
      sys.error("timestamp reads need a journal-backed namespace")
    /** Journal head version (-1 for in-memory tenants). */
    def version: Long = -1L
    /** The backing journal, when durable — put in dynamic scope
      * around query compilation so `SERVICE bd:history` serves THIS
      * namespace's commit log. */
    def journal: Option[graft.rdf.Journal] = None
    /** Graph Store Protocol PUT: replace graph `g` with `quads`. */
    def putGraph(g: String, quads: DataFrame): Unit
    /** Graph Store Protocol DELETE: drop graph `g`. */
    def dropGraph(g: String): Unit
    /** Mass-load server-visible files/globs as ONE commit (the
      * DataLoaderServlet analog); returns (version, statements). */
    def bulkLoad(paths: Seq[String], graph: Option[String],
                 compact: Boolean): (Long, Long) = {
      val quads = paths
        .map(p => Update.loadOpQuads(spark, p, graph, current.defaultGraph))
        .reduce(_ unionAll _)
      (-1L, ingest(quads))
    }
    /** Metadata-only ESTCARD: Some(n) when the count is answerable
      * from parquet footers (durable + fully compacted head), None →
      * caller falls back to an exact count job. */
    def metadataCount(graph: Option[String]): Option[Long] = None
    /** Atomically apply a staged tx's items (update texts + parsed
      * quad batches) as one commit; `expectVersion` is the journal
      * version at tx creation — a head that moved since is a CONFLICT
      * (first-committer-wins, whole-store granularity). */
    def commitStaged(items: Seq[Either[String, DataFrame]],
                     expectVersion: Long): Long
    /** PREPARE-TX (TxServlet.java:84): run the SAME validation
      * [[commitStaged]] applies, committing nothing — throws
      * TxConflict exactly when a commit now would. Advisory (no lock
      * is taken between prepare and commit). */
    def prepareStaged(items: Seq[Either[String, DataFrame]],
                      expectVersion: Long): Unit
    /** Online backup: snapshot the namespace's journal to a
      * server-visible directory while holding the write lock
      * (quiesced); durable namespaces only. Returns the backed-up
      * version. */
    def backup(target: Path): Long =
      sys.error("backup needs a journal-backed namespace")
    def destroy(): Unit
  }

  private def emptyQuads: DataFrame =
    Seq.empty[(String, String, String, String)].toDF("s", "p", "o", "g")

  private final class MemTenant(ref: AtomicReference[Graft]) extends Tenant {
    def current: Graft = ref.get()
    def updateOps(ops: Seq[graft.sparql.UpdateOp]): Unit = {
      ref.updateAndGet(_.updateOps(ops)); ()
    }
    // every mutation routes through withStore: a handle seeded from a
    // twin/index-bearing connection must not keep serving the
    // committed-version accelerators over mutated in-memory state
    def ingest(quads: DataFrame): Long = {
      val q = quads.localCheckpoint()
      ref.updateAndGet(g => g.withStore(g.store.insertQuads(q)))
      q.count()
    }
    def remove(spo: DataFrame): Long = {
      val keys = Seq("s", "p", "o")
      val doomed = ref.get().store.quads
        .join(spo.select(keys.map(org.apache.spark.sql.functions.col): _*).distinct(),
          keys, "left_semi")
        .localCheckpoint()
      ref.updateAndGet(g => g.withStore(
        QuadStore(g.store.quads.join(doomed, Seq("s", "p", "o", "g"), "left_anti"))))
      doomed.count()
    }
    def removeQuads(quads: DataFrame): Long = {
      val doomed = ref.get().store.quads
        .join(quads.select("s", "p", "o", "g").distinct(),
          Seq("s", "p", "o", "g"), "left_semi")
        .localCheckpoint()
      ref.updateAndGet(g => g.withStore(
        QuadStore(g.store.quads.join(doomed, Seq("s", "p", "o", "g"), "left_anti"))))
      doomed.count()
    }
    def updateWithBody(removeSpo: DataFrame, adds: DataFrame,
                       suppress: Boolean): Long = {
      val keys = Seq("s", "p", "o")
      val doomed = ref.get().store.quads
        .join(removeSpo.select(keys.map(org.apache.spark.sql.functions.col): _*)
          .distinct(), keys, "left_semi")
        .localCheckpoint()
      val a = adds.localCheckpoint()
      ref.updateAndGet(g => g.withStore(QuadStore(
        g.store.quads.join(doomed, Seq("s", "p", "o", "g"), "left_anti"))
        .insertQuads(a)))
      doomed.count() + a.count()
    }
    def putGraph(g: String, quads: DataFrame): Unit = {
      val q = quads.localCheckpoint()
      ref.updateAndGet(h => h.withStore(h.store.dropGraph(g).insertQuads(q)))
      ()
    }
    def dropGraph(g: String): Unit = {
      ref.updateAndGet(h => h.withStore(h.store.dropGraph(g)))
      ()
    }
    def commitStaged(items: Seq[Either[String, DataFrame]],
                     expectVersion: Long): Long = {
      // in-memory tenants have no commit log to conflict against; the
      // updateAndGet applies the whole staged sequence atomically
      ref.updateAndGet(g0 => items.foldLeft(g0) {
        case (h, Left(text)) => h.update(text)
        case (h, Right(df))  => h.withStore(h.store.insertQuads(df))
      })
      -1L
    }
    def prepareStaged(items: Seq[Either[String, DataFrame]],
                      expectVersion: Long): Unit = ()
    def destroy(): Unit = ()
  }

  /** Journal-backed namespace: reads serve a per-version cached
    * connection (so the union-default-graph merge view materializes
    * once per COMMIT, not once per request), writes commit through the
    * repository's delta path. Every `autoCompactEvery` commits the
    * journal compacts itself — a server-managed store must keep its
    * own snapshot-resolution cost bounded (the reference's journal
    * likewise compacts on its own overflow schedule), or a year of
    * small REST updates degrades every read into an
    * O(delta-count)-input resolution. */
  private final class DurableTenant(repo: Repository, dir: Path) extends Tenant {
    @volatile private var cached: (Long, Graft) = (-1L, null)
    // per-namespace analyzer config, persisted beside the journal
    // (ConfigurableAnalyzerFactory stores it in namespace properties);
    // read once at attach — restart reattaches it with the namespace
    private val analyzerConf: Option[String] = {
      val f = dir.resolve("analyzer.conf")
      if (Files.exists(f)) Some(Files.readString(f).trim).filter(_.nonEmpty) else None
    }
    private def withConf(g: Graft): Graft =
      if (analyzerConf.isDefined) g.copy(analyzerName = analyzerConf) else g
    // namespace-owned persisted literal text index (created by the
    // namespace POST's textIndex=true): reattached with the namespace
    // and synced at attach — a crash between a journal commit and its
    // index sync heals here, the MaintainedClosure recovery discipline
    private val textIx: Option[graft.search.PersistedSearchIndex] = {
      val d = dir.resolve("textindex")
      if (graft.search.PersistedSearchIndex.exists(d.toString)) {
        val ix = graft.search.PersistedSearchIndex.open(spark, d.toString)
        graft.rdf.TextIndexMaintenance.sync(ix, repo.journal)
        Some(ix)
      } else None
    }
    /** Attach the index view to a HEAD connection — only when current
      * to the head version (a stale index must not serve hits for
      * literals that were since removed); historical `at()` reads
      * never attach it. */
    private def withIx(g: Graft): Graft = textIx match {
      case Some(ix) if ix.version == repo.version => g.copy(textIndex = Some(ix.view))
      case _ => g
    }
    def current: Graft = {
      val v = repo.version
      val c = cached
      if (c._1 == v && c._2 != null) c._2
      else synchronized {
        if (cached._1 != v || cached._2 == null)
          cached = (v, withIx(withConf(repo.connection())))
        cached._2
      }
    }
    // ospIndex=true namespaces lay down the object-hash twin on every
    // compaction — searchInSearch hit joins then prune out of the box
    private val ospIndex: Boolean = Files.exists(dir.resolve("ospindex"))
    private def maybeCompact(): Unit = synchronized {
      // every write path runs through here; the journal compaction (if
      // due) happens FIRST, so the text-index sync lands on the
      // post-compaction head version — syncing before it would leave
      // ix.version one behind repo.version and withIx would silently
      // detach the index until the next write (the compaction commit
      // itself is skipped by changedQuads, so the sync stays
      // delta-sized either way)
      val compacting =
        repo.version - repo.journal.lastCompacted >= autoCompactEvery
      if (compacting) repo.compact(ospHashTwin = ospIndex)
      // the index (if any) catches up to the head (delta-sized batch),
      // so the next `current` serves index-backed search over the new
      // commit
      textIx.foreach { ix =>
        graft.rdf.TextIndexMaintenance.sync(ix, repo.journal)
        // the journal's compaction moment is the index's too: collapse
        // its segment log so steady-state search reads ONE postings
        // scan. Reclaim discipline: vacuum FIRST — it deletes only
        // files the CURRENT manifest no longer references, i.e. the
        // generation superseded by the PREVIOUS compaction, giving
        // in-flight readers a full compaction cycle of grace — then
        // compact, whose freshly superseded files stay until the NEXT
        // cycle. Without the vacuum the server leaks a full postings
        // copy per compaction (disk grows O(cycles × index)).
        if (compacting) { ix.vacuum(); ix.compact() }
      }
    }
    // writes serialize per namespace (the reference's single-writer
    // journal lock): two concurrent REST updates queue instead of one
    // failing loud on the journal's version race
    def updateOps(ops: Seq[graft.sparql.UpdateOp]): Unit =
      synchronized { repo.updateOps(ops); maybeCompact() }
    override def at(version: Long): Graft = withConf(repo.connection(version))
    override def version: Long = repo.version
    override def journal: Option[graft.rdf.Journal] = Some(repo.journal)
    def ingest(quads: DataFrame): Long = synchronized {
      val q = quads.localCheckpoint()
      repo.journal.commit(adds = q, dels = emptyQuads)
      maybeCompact()
      q.count()
    }
    def remove(spo: DataFrame): Long = synchronized {
      val keys = Seq("s", "p", "o")
      val doomed = current.store.quads
        .join(spo.select(keys.map(org.apache.spark.sql.functions.col): _*).distinct(),
          keys, "left_semi")
        .localCheckpoint()
      repo.journal.commit(adds = emptyQuads, dels = doomed)
      maybeCompact()
      doomed.count()
    }
    def removeQuads(quads: DataFrame): Long = synchronized {
      val doomed = current.store.quads
        .join(quads.select("s", "p", "o", "g").distinct(),
          Seq("s", "p", "o", "g"), "left_semi")
        .localCheckpoint()
      repo.journal.commit(adds = emptyQuads, dels = doomed)
      maybeCompact()
      doomed.count()
    }
    def updateWithBody(removeSpo: DataFrame, adds: DataFrame,
                       suppress: Boolean): Long = synchronized {
      val keys = Seq("s", "p", "o")
      val doomed = current.store.quads
        .join(removeSpo.select(keys.map(org.apache.spark.sql.functions.col): _*)
          .distinct(), keys, "left_semi")
        .localCheckpoint()
      val a = adds.localCheckpoint()
      repo.journal.commit(adds = a, dels = doomed)
      maybeCompact()
      doomed.count() + a.count()
    }
    def putGraph(g: String, quads: DataFrame): Unit = synchronized {
      import org.apache.spark.sql.functions.{col, lit}
      val old = current.store.quads.filter(col("g") === lit(g))
      repo.journal.commit(adds = quads.localCheckpoint(), dels = old)
      maybeCompact()
    }
    def dropGraph(g: String): Unit = synchronized {
      import org.apache.spark.sql.functions.{col, lit}
      val old = current.store.quads.filter(col("g") === lit(g))
      repo.journal.commit(adds = emptyQuads, dels = old)
      maybeCompact()
    }
    override def bulkLoad(paths: Seq[String], graph: Option[String],
                          compact: Boolean): (Long, Long) = synchronized {
      // drives THIS tenant's journal handle — no second handle on the
      // directory; single-pass (appendRaw + footer count) by design
      val r = graft.rdf.BulkLoad.runWith(spark, repo.journal, paths, graph, compact)
      // run even when the load already compacted: maybeCompact is also
      // the text-index sync point, and an explicitly-compacted journal
      // skips the inner compact anyway
      maybeCompact()
      r
    }
    override def metadataCount(graph: Option[String]): Option[Long] = {
      val j = repo.journal
      val v = j.version
      // fully-compacted head: the base segment IS the state, so its
      // footers answer exactly (the reference's rangeCount answers
      // from B+Tree page metadata the same way); with pending deltas
      // the caller runs the exact count instead
      if (j.lastCompacted != v) None
      else j.segmentRowCount(v, graph) match {
        case Some(n) => Some(n)
        // no adds segment at a compacted head = empty state; but a
        // graph-bound None may instead mean a legacy unpartitioned
        // segment the footers can't scope — fall back to the exact job
        case None => if (graph.isEmpty) Some(0L) else None
      }
    }
    override def backup(target: Path): Long = synchronized {
      // under the tenant write lock: no commit can land mid-copy, so
      // the snapshot is exactly the current version
      repo.journal.backupTo(target)
      repo.version
    }
    def commitStaged(items: Seq[Either[String, DataFrame]],
                     expectVersion: Long): Long = synchronized {
      val (adds, dels) = validateStaged(items, expectVersion)
      val v = repo.journal.commit(adds, dels)
      maybeCompact()
      v
    }
    override def prepareStaged(items: Seq[Either[String, DataFrame]],
                               expectVersion: Long): Unit = synchronized {
      validateStaged(items, expectVersion); ()
    }
    /** The front half of a staged commit: fold the items into one
      * (adds, dels) and run the two-sided conflict validation; throws
      * [[TxConflict]] exactly when a commit now would. */
    private def validateStaged(items: Seq[Either[String, DataFrame]],
                               expectVersion: Long): (DataFrame, DataFrame) = {
      val head = current
      val mixed = items.map {
        case Left(text) => Left(graft.sparql.Parser.parseUpdates(text))
        case Right(df)  => Right(df)
      }
      var (adds, dels) = Update.quadsDeltaMixed(head.store, mixed, head.defaultGraph)
      if (repo.version != expectVersion) {
        // Two-sided conflict validation when the head moved:
        //
        // 1. WRITE set (TxServlet.java:56-58's per-index-range revision
        //    check, at partition granularity): the partitionBy("g")
        //    segment manifests name every graph the interleaved commits
        //    wrote — 409 when that set intersects THIS tx's write set.
        //    Compaction commits are skipped: a compaction snapshot
        //    names every graph but changes nothing logically, and
        //    maybeCompact() runs after every write, so counting it
        //    would 409 every tx racing an auto-compaction.
        //
        // 2. READ set, by re-evaluation: graph manifests can't tell
        //    WHAT an update's WHERE read, so the staged delta is
        //    evaluated twice — against the expectVersion snapshot the
        //    client saw, and against the current head — and the tx
        //    409s when they differ. An update whose WHERE reads graph
        //    Y but writes graph X conflicts iff an interleaved commit
        //    to Y actually changed the update's effect; staged literal
        //    DataFrames evaluate identically on both sides and commit
        //    (their semantics are rebase-onto-head by definition —
        //    the server cannot see what stale reads produced them).
        adds = adds.localCheckpoint(); dels = dels.localCheckpoint()
        val interleaved: Option[Set[String]] =
          (expectVersion + 1 to repo.version)
            .filterNot(repo.journal.compactedAt)
            .foldLeft(Option(Set.empty[String])) { (acc, v) =>
              for { a <- acc; t <- repo.journal.touchedGraphs(v) } yield a ++ t
            }
        val mine = adds.select("g").unionByName(dels.select("g")).distinct()
          .collect().flatMap(r => Option(r.getString(0))).toSet
        interleaved match {
          case Some(gs) if (gs & mine).isEmpty => // disjoint: proceed
          case Some(gs) => throw new TxConflict(
            s"tx conflict: graph(s) ${(gs & mine).toSeq.sorted.mkString(", ")} " +
              s"modified since v$expectVersion (head now v${repo.version})")
          case None => throw new TxConflict(
            s"tx conflict: head moved from v$expectVersion to v${repo.version} " +
              "and a legacy unpartitioned segment hides its touched graphs")
        }
        val asSeen = at(expectVersion)
        val (adds0, dels0) =
          Update.quadsDeltaMixed(asSeen.store, mixed, asSeen.defaultGraph)
        def differ(x: DataFrame, y: DataFrame): Boolean =
          x.exceptAll(y).limit(1).count() > 0 ||
            y.exceptAll(x).limit(1).count() > 0
        if (differ(adds0, adds) || differ(dels0, dels))
          throw new TxConflict(
            s"tx conflict: a staged update reads data modified since " +
              s"v$expectVersion (head now v${repo.version}) — its effect " +
              "differs between the two snapshots")
      }
      (adds, dels)
    }
    def destroy(): Unit = deleteRecursively(dir)
  }

  /** Truth-maintenance namespace — the reference's inference-enabled
    * namespaces, where truth maintenance is a NAMESPACE property wired
    * into the commit path (BigdataSail's truthMaintenance option;
    * every update servlet honors `suppressTruthMaintenance` —
    * QueryServlet.java:132, DeleteServlet.java:128). Backed by a
    * paired base/closed journal under `dir/tm`
    * ([[graft.inference.MaintainedClosure]], DYNAMIC program: the
    * TBox arrives over the protocol as statements). Queries — head and
    * `?timestamp=` historical reads alike — serve the CLOSED
    * (entailed) store; mutations commit through the maintained
    * closure; suppressed requests commit verbatim and stay unclosed
    * until a re-derive-tier commit converges them.
    *
    * TRIPLES mode: the reference does not support truth maintenance
    * over quads (BigdataSail — TM requires a triples-mode KB), so
    * graph-scoped Graph Store ops are refused loud and all statements
    * live in the default graph. */
  private final class TmTenant(tm: graft.inference.MaintainedClosure,
                               dir: Path) extends Tenant {
    import org.apache.spark.sql.functions.{col, lit}
    @volatile private var cached: (Long, Graft) = (-1L, null)
    private def spoOf(df: DataFrame): DataFrame =
      df.select("s", "p", "o").distinct()
    // per-namespace analyzer + persisted literal text index compose
    // with TM exactly like DurableTenant — the index maintains over
    // the CLOSED journal (bds:search sees what queries see: the
    // entailed store), synced at attach and on every write
    private val analyzerConf: Option[String] = {
      val f = dir.resolve("analyzer.conf")
      if (Files.exists(f)) Some(Files.readString(f).trim).filter(_.nonEmpty) else None
    }
    private val textIx: Option[graft.search.PersistedSearchIndex] = {
      val d = dir.resolve("textindex")
      if (graft.search.PersistedSearchIndex.exists(d.toString)) {
        val ix = graft.search.PersistedSearchIndex.open(spark, d.toString)
        graft.rdf.TextIndexMaintenance.sync(ix, tm.journals._2)
        Some(ix)
      } else None
    }
    private def withConf(g: Graft): Graft = {
      val g1 = withAnalyzer(g)
      textIx match {
        case Some(ix) if ix.version == tm.journals._2.version =>
          g1.copy(textIndex = Some(ix.view))
        case _ => g1
      }
    }
    private def withAnalyzer(g: Graft): Graft =
      if (analyzerConf.isDefined) g.copy(analyzerName = analyzerConf) else g
    private def view(t: DataFrame): Graft = withAnalyzer(Graft(spark, QuadStore(
      t.select(col("s"), col("p"), col("o"), lit("g:default").as("g")))))
    def current: Graft = {
      val c = cached
      if (c._1 == tm.version && c._2 != null) c._2
      else synchronized {
        // version is re-read INSIDE the lock and the closure read from
        // the same lock-held point (mutations share this monitor), so
        // a commit landing between the fast-path check and here can
        // never cache a NEW closure under an OLD version key
        val vNow = tm.version
        if (cached._1 != vNow || cached._2 == null)
          cached = (vNow, withConf(view(tm.closure())))
        cached._2
      }
    }
    // historical / asserted views never attach the head index (it
    // serves hits for literals those views may not contain)
    override def at(version: Long): Graft = view(tm.closure(version))
    override def asserted: Graft = view(tm.base())
    override def assertedAt(version: Long): Graft = view(tm.base(version))
    override def version: Long = tm.version
    // bd:history serves the ASSERTED change log (the base journal) —
    // entailment churn is derived state, not user history
    override def journal: Option[graft.rdf.Journal] = Some(tm.journals._1)
    private def maybeCompact(): Unit = {
      val b = tm.journals._1
      val compacting = b.version - b.lastCompacted >= autoCompactEvery
      if (compacting) tm.compact()
      // the index catches up to the CLOSED head (delta-sized batch);
      // compaction is its vacuum/compact moment too (the DurableTenant
      // reclaim discipline)
      textIx.foreach { ix =>
        graft.rdf.TextIndexMaintenance.sync(ix, tm.journals._2)
        if (compacting) { ix.vacuum(); ix.compact() }
      }
    }
    private def applyDelta(adds: DataFrame, dels: DataFrame,
                           suppress: Boolean): Unit = {
      val a = spoOf(adds).localCheckpoint()
      val d = spoOf(dels).localCheckpoint()
      if (suppress) { tm.commitRaw(a, d); () }
      else if (!a.isEmpty || !d.isEmpty) {
        // ONE journal commit carries remove+insert — the documented
        // ATOMIC contract of updateWithBody (a crash cannot persist
        // the removal without the insert, readers never observe the
        // intermediate state, and one HTTP request = one version)
        tm.commitDelta(a, d)
        ()
      }
      maybeCompact()
    }
    private def updateOpsTm(ops: Seq[graft.sparql.UpdateOp],
                            suppress: Boolean): Unit = synchronized {
      val head = current
      // the ops' WHERE clauses evaluate against the ENTAILED store
      // (queries on an inferencing namespace see inference — the
      // reference's TM stores behave the same); the delta then applies
      // to the ASSERTED statements, DRed keeping derivable rows
      val (adds, dels) = Update.quadsDeltaSeq(head.store, ops, head.defaultGraph)
      applyDelta(adds, dels, suppress)
    }
    def updateOps(ops: Seq[graft.sparql.UpdateOp]): Unit =
      updateOpsTm(ops, suppress = false)
    override def updateOpsSuppressed(ops: Seq[graft.sparql.UpdateOp]): Unit =
      updateOpsTm(ops, suppress = true)
    def ingest(quads: DataFrame): Long = synchronized {
      val q = spoOf(quads).localCheckpoint()
      tm.assertTriples(q)
      maybeCompact()
      q.count()
    }
    override def ingestSuppressed(quads: DataFrame): Long = synchronized {
      val q = spoOf(quads).localCheckpoint()
      tm.commitRaw(q, q.limit(0))
      maybeCompact()
      q.count()
    }
    private def removeTm(spo: DataFrame, suppress: Boolean): Long = synchronized {
      val r = spoOf(spo).localCheckpoint()
      // modified count = what was actually ASSERTED (retracting an
      // inferred-only or absent row is a no-op on the base)
      val doomed = tm.base().join(r, Seq("s", "p", "o"), "left_semi")
        .localCheckpoint()
      if (suppress) tm.commitRaw(r.limit(0), r) else tm.retractTriples(r)
      maybeCompact()
      doomed.count()
    }
    def remove(spo: DataFrame): Long = removeTm(spo, suppress = false)
    override def removeSuppressed(spo: DataFrame): Long =
      removeTm(spo, suppress = true)
    // triples-mode: the quad form projects to statements (the only
    // graph is the synthetic default tag)
    def removeQuads(quads: DataFrame): Long = removeTm(quads, suppress = false)
    override def removeQuadsSuppressed(quads: DataFrame): Long =
      removeTm(quads, suppress = true)
    def updateWithBody(removeSpo: DataFrame, adds: DataFrame,
                       suppress: Boolean): Long = synchronized {
      val r = spoOf(removeSpo).localCheckpoint()
      val a = spoOf(adds).localCheckpoint()
      val doomed = tm.base().join(r, Seq("s", "p", "o"), "left_semi")
        .localCheckpoint()
      // the add side counts like the remove side: only statements NOT
      // already asserted are modifications (a re-insert counts 0)
      val added = a.join(tm.base(), Seq("s", "p", "o"), "left_anti")
        .localCheckpoint()
      applyDelta(a, r, suppress)
      doomed.count() + added.count()
    }
    private def triplesOnly(): Nothing = sys.error(
      "truth-maintenance namespaces are triples-mode (the reference's " +
        "TM requires a triples-mode KB) — graph-scoped Graph Store " +
        "operations are not supported")
    // GSP on the DEFAULT graph is the triples-mode store itself:
    // PUT = replace-all (retract the asserted base, assert the body),
    // DELETE = retract-all; NAMED graphs are refused loud above
    def putGraph(g: String, quads: DataFrame): Unit =
      if (g != "g:default") triplesOnly()
      else synchronized { applyDelta(quads, tm.base(), suppress = false) }
    def dropGraph(g: String): Unit =
      if (g != "g:default") triplesOnly()
      else synchronized {
        applyDelta(tm.base().limit(0), tm.base(), suppress = false)
      }
    override def bulkLoad(paths: Seq[String], graph: Option[String],
                          compact: Boolean): (Long, Long) = synchronized {
      require(graph.isEmpty,
        "truth-maintenance namespaces are triples-mode — no target graph")
      val quads = paths
        .map(p => Update.loadOpQuads(spark, p, None, "g:default"))
        .reduce(_ unionAll _)
      val n = ingest(quads)
      if (compact) tm.compact()
      (tm.version, n)
    }
    // staged tx: whole-store first-committer-wins (each item commits
    // through the maintained closure in arrival order — TM cannot fold
    // a tx into one commit because each mutation's entailment delta
    // depends on the prior closed state)
    def commitStaged(items: Seq[Either[String, DataFrame]],
                     expectVersion: Long): Long = synchronized {
      if (tm.version != expectVersion)
        throw new TxConflict(
          s"tx conflict: head moved from v$expectVersion to v${tm.version} " +
            "(truth-maintenance namespaces validate at whole-store granularity)")
      // pre-parse every update text and pre-materialize every data
      // item BEFORE the first commit: a malformed later item must not
      // leave earlier items durably committed. Beyond this point TM
      // transactions are NOT failure-atomic — each item commits
      // through the maintained closure in arrival order, because each
      // mutation's entailment delta depends on the prior closed state.
      val staged = items.map {
        case Left(text) => Left(graft.sparql.Parser.parseUpdates(text))
        case Right(df)  => Right(spoOf(df).localCheckpoint())
      }
      staged.foreach {
        case Left(ops) => updateOps(ops)
        case Right(df) => ingest(df)
      }
      tm.version
    }
    def prepareStaged(items: Seq[Either[String, DataFrame]],
                      expectVersion: Long): Unit = {
      if (tm.version != expectVersion)
        throw new TxConflict(
          s"tx conflict: head moved from v$expectVersion to v${tm.version} " +
            "(truth-maintenance namespaces validate at whole-store granularity)")
    }
    override def backup(target: Path): Long = synchronized {
      val (b, c) = tm.journals
      b.backupTo(target.resolve("base"))
      c.backupTo(target.resolve("closed"))
      tm.version
    }
    def destroy(): Unit = deleteRecursively(dir)
  }

  /** Staged-tx commit lost first-committer-wins validation. */
  private final class TxConflict(msg: String) extends RuntimeException(msg)

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.iterator().asScala.foreach(deleteRecursively) finally s.close()
    }
    Files.deleteIfExists(p)
    ()
  }

  private val namespaces = new ConcurrentHashMap[String, Tenant]()

  journalDir match {
    case None =>
      namespaces.put(defaultNamespace, new MemTenant(new AtomicReference(initial)))
    case Some(d) =>
      val root = Paths.get(d)
      Files.createDirectories(root)
      // re-apply a persisted SERVICE whitelist policy (written by
      // POST /whitelist): first line enabled flag, one URI per line
      val wl = root.resolve("whitelist.conf")
      if (Files.exists(wl)) {
        val lines = Files.readString(wl).split("\n").toSeq.filter(_.nonEmpty)
        lines.headOption.foreach(en =>
          graft.sparql.ServiceRegistry.setWhitelist(en.toBoolean, lines.tail))
      }
      // reattach every namespace the directory already holds; a `tm`
      // subdirectory marks a truth-maintenance namespace (paired
      // base/closed journals — openDynamic rolls the closure forward
      // if a crash landed between the two commits)
      val subs = Files.list(root)
      try subs.iterator().asScala.foreach { sub =>
        if (Files.isDirectory(sub.resolve("tm")))
          namespaces.put(sub.getFileName.toString,
            new TmTenant(graft.inference.MaintainedClosure.openDynamic(
              spark, sub.resolve("tm").toString), sub))
        else if (Files.exists(sub.resolve("commits")))
          namespaces.put(sub.getFileName.toString,
            new DurableTenant(Repository.open(spark, sub.toString), sub))
      } finally subs.close()
      if (!namespaces.containsKey(defaultNamespace)) {
        val sub = root.resolve(defaultNamespace)
        val repo = Repository.create(spark, sub.toString)
        if (!initial.store.quads.isEmpty)
          repo.journal.append(initial.store.quads)
        namespaces.put(defaultNamespace, new DurableTenant(repo, sub))
      }
  }

  private def tenant(ns: String): Tenant = {
    val t = namespaces.get(ns)
    require(t != null, s"no namespace $ns")
    t
  }

  /** The current (latest-updated) handle of a namespace (default: the
    * default namespace, resolved per call — never a stale alias). */
  def current(ns: String = defaultNamespace): Graft = tenant(ns).current

  // ---- multi-request write transactions (TxServlet analog) ---------

  /** One open transaction: staged items apply at commit in arrival
    * order, as ONE journal commit. `startVersion` is the namespace's
    * head at creation — validation is first-committer-wins at
    * whole-store granularity (coarser than the reference's
    * per-index-range conflict detection, never less safe). */
  private final case class Tx(id: String, ns: String, startVersion: Long,
                              base: Graft,
                              items: scala.collection.mutable.Buffer[Either[String, DataFrame]],
                              startedMs: Long)
  private val txs = new ConcurrentHashMap[String, Tx]()

  /** Read-your-writes view of an open transaction: the namespace as of
    * tx creation (`base` — Graft is immutable, so holding it IS the
    * start snapshot, for memory and journal tenants alike) with the
    * staged items folded on top in arrival order. Pure plan
    * composition — nothing is published, the journal never sees it —
    * giving queries carrying `?tx=` the reference TxServlet's full
    * read/write-tx isolation: a tx sees its own staged writes, other
    * connections don't. */
  private def txView(id: String, ns: String): Graft = {
    val tx = txs.get(id)
    require(tx != null, s"no such transaction: $id")
    require(tx.ns == ns, s"transaction $id belongs to namespace ${tx.ns}, not $ns")
    tx.items.synchronized { tx.items.toVector }.foldLeft(tx.base) {
      case (h, Left(text)) => h.update(text)
      // withStore: the staged writes invalidate the committed-version
      // accelerators (osp twin / text index) for THIS view
      case (h, Right(df))  => h.withStore(h.store.insertQuads(df))
    }
  }

  private def stageTx(id: String, ns: String,
                      item: Either[String, DataFrame]): Unit = {
    val tx = txs.get(id)
    require(tx != null, s"no such transaction: $id")
    require(tx.ns == ns, s"transaction $id belongs to namespace ${tx.ns}, not $ns")
    // stage-time parse check: a malformed update fails ITS request
    // loudly, not the eventual commit
    item.left.foreach(t => Parser.parseUpdates(t))
    tx.items.synchronized { tx.items += item }
    ()
  }

  // ---- running-query registry (StatusServlet analog) ---------------

  private final case class Running(id: String, ns: String, query: String,
                                   startedMs: Long)
  private val running = new ConcurrentHashMap[String, Running]()
  private val served = new java.util.concurrent.atomic.AtomicLong()

  /** Completed-operation stats ring (CountersServlet analog-lite):
    * the last [[HistoryCap]] operations with their wall times, the
    * per-query history document `/counters` serves. Deeper metrics
    * (task/shuffle/IO) are the Spark UI's job — deliberately not
    * re-implemented here. */
  private final case class Done(ns: String, op: String, elapsedMs: Long,
                                endedMs: Long)
  private val HistoryCap = 200
  private val history = new java.util.concurrent.ConcurrentLinkedDeque[Done]()

  /** Thrown when a query's deadline cancels its job group. */
  private final class QueryTimeout(val ms: Long)
    extends RuntimeException(s"query timeout after $ms ms")

  private val deadlines =
    java.util.concurrent.Executors.newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, "graft-query-deadline"); t.setDaemon(true); t
    })

  /** Run `body`'s Spark jobs inside a cancellable job group: a
    * `cancelQuery` on the UUID interrupts them cluster-wide, and a
    * positive `timeoutMs` arms a deadline that does the same (the
    * reference's query-timeout contract — the timeout interrupts the
    * engine's running work, BigdataRDFContext.newQuery setTimeout;
    * driver-side planning between jobs is not interruptible). */
  private def inJobGroup[T](ns: String, q: String, timeoutMs: Long = 0L)(body: => T): T = {
    val id = java.util.UUID.randomUUID().toString
    val t0 = System.currentTimeMillis()
    running.put(id, Running(id, ns, q, t0))
    spark.sparkContext.setJobGroup(id, s"sparql:$ns", interruptOnCancel = true)
    val timedOut = new java.util.concurrent.atomic.AtomicBoolean(false)
    val deadline =
      if (timeoutMs <= 0) None
      else Some(deadlines.schedule(new Runnable {
        def run(): Unit = {
          timedOut.set(true)
          // AndFutureJobs: the deadline may fire between a query's
          // jobs — later job submissions in the group must die too
          spark.sparkContext.cancelJobGroupAndFutureJobs(id)
        }
      }, timeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS))
    try body
    catch {
      case e: Throwable if timedOut.get() => throw new QueryTimeout(timeoutMs)
    } finally {
      deadline.foreach(_.cancel(false))
      spark.sparkContext.clearJobGroup(); running.remove(id); served.incrementAndGet()
      val now = System.currentTimeMillis()
      history.addFirst(Done(ns, q.replace('\n', ' ').take(120), now - t0, now))
      while (history.size > HistoryCap) history.pollLast()
    }
  }

  /** The request's query deadline in ms (0 = none): the reference's
    * three knobs with its precedence — the X-BIGDATA-MAX-QUERY-MILLIS
    * header overrides `maxQueryTimeMillis=` (ms) overrides `timeout=`
    * (whole seconds; ≤0 = unlimited). BigdataRDFContext.getQueryTimeout. */
  private def queryTimeoutMs(ex: HttpExchange,
                             qp: Map[String, Option[String]]): Long = {
    def num(s: String): Option[Long] = s.trim.toLongOption
    Option(ex.getRequestHeaders.getFirst("X-BIGDATA-MAX-QUERY-MILLIS"))
      .flatMap(num)
      .orElse(qp.get("maxQueryTimeMillis").flatten.flatMap(num))
      .orElse(qp.get("timeout").flatten.flatMap(num).map(_ * 1000L))
      .filter(_ > 0).getOrElse(0L)
  }

  // ---- http plumbing ----------------------------------------------

  private val server = HttpServer.create(new InetSocketAddress(host, port), 0)
  // a thread per in-flight exchange: a long-running query must not
  // block /status or the cancel that kills it
  server.setExecutor(Executors.newCachedThreadPool())

  /** `http://host:port` of the bound socket (port 0 = OS-assigned). */
  def address: String =
    s"http://${server.getAddress.getHostString}:${server.getAddress.getPort}"

  /** HTML-escape for workbench/status pages. */
  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  private def wantsGzip(ex: HttpExchange): Boolean =
    Option(ex.getRequestHeaders.getFirst("Accept-Encoding")).exists(_.contains("gzip"))

  private def respond(ex: HttpExchange, status: Int, contentType: String,
                      body: String): Unit = {
    val raw = body.getBytes("UTF-8")
    val bytes =
      if (raw.nonEmpty && wantsGzip(ex)) {
        ex.getResponseHeaders.add("Content-Encoding", "gzip")
        val buf = new java.io.ByteArrayOutputStream()
        val gz = new java.util.zip.GZIPOutputStream(buf)
        gz.write(raw); gz.close()
        buf.toByteArray
      } else raw
    ex.getResponseHeaders.add("Content-Type", contentType)
    ex.sendResponseHeaders(status, if (bytes.isEmpty) -1L else bytes.length.toLong)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
    ex.close()
  }

  /** Chunked-transfer document: `head`, then `rows` joined by `sep`,
    * then `foot` — written as each partition's iterator arrives, so
    * the driver holds one partition of rows at a time, never the
    * result set. */
  private def respondStream(ex: HttpExchange, contentType: String, head: String,
                            rows: Iterator[String], sep: String,
                            foot: String): Unit = {
    // force the FIRST partition's job before committing the status
    // line: a query error (or a cancelQuery) during it surfaces as a
    // clean 400 rather than an aborted 200 stream. Later partitions'
    // errors abort mid-stream — the floor of true streaming.
    rows.hasNext
    ex.getResponseHeaders.add("Content-Type", contentType)
    // transfer compression composes with chunking: a 100-GB N-Triples
    // export over HTTP is mostly repeated IRIs — gzip when asked
    val gzip = wantsGzip(ex)
    if (gzip) ex.getResponseHeaders.add("Content-Encoding", "gzip")
    ex.sendResponseHeaders(200, 0) // 0 = chunked
    val sink: java.io.OutputStream =
      if (gzip) new java.util.zip.GZIPOutputStream(ex.getResponseBody, 8192)
      else ex.getResponseBody
    val out = new java.io.BufferedWriter(
      new java.io.OutputStreamWriter(sink, "UTF-8"))
    out.write(head)
    var first = true
    rows.foreach { r =>
      if (!first) out.write(sep)
      out.write(r); first = false
    }
    out.write(foot)
    out.flush(); out.close(); ex.close()
  }

  /** One column of strings, driver-bounded to a partition at a time. */
  private def lines(df: DataFrame): Iterator[String] =
    df.toLocalIterator().asScala.map(_.getString(0))

  private def formParam(s: String, key: String): Option[String] =
    s.split('&').collectFirst {
      case kv if kv.startsWith(key + "=") =>
        java.net.URLDecoder.decode(kv.drop(key.length + 1), "UTF-8")
    }

  /** Query-string / form flags and values: `ESTCARD&s=…` parses to
    * presence + decoded values. */
  private def params(raw: String): Map[String, Option[String]] =
    raw.split('&').filter(_.nonEmpty).map { kv =>
      kv.split("=", 2) match {
        case Array(k)    => k -> None
        case Array(k, v) => k -> Some(java.net.URLDecoder.decode(v, "UTF-8"))
      }
    }.toMap

  private def rawQuery(ex: HttpExchange): String =
    Option(ex.getRequestURI.getRawQuery).getOrElse("")

  /** EVERY value of a repeated parameter, in order (the SPARQL 1.1
    * Protocol dataset parameters repeat: `default-graph-uri=g1&
    * default-graph-uri=g2` — [[params]]' Map collapses them). */
  private def multiParams(raw: String, key: String): Seq[String] =
    raw.split('&').toSeq.collect {
      case kv if kv.startsWith(key + "=") =>
        java.net.URLDecoder.decode(kv.drop(key.length + 1), "UTF-8")
    }

  /** Minimal RFC 7231 Accept negotiation: parse the media-range list
    * with q-values and return the SUPPORTED type with the highest q
    * (exact ranges beat wildcards at equal q, header order breaks
    * remaining ties, q=0 excludes). None when the header names no
    * supported type — callers keep their loose contains-dispatch
    * (the `Accept: xml` curl convenience). */
  private def negotiate(accept: String, supported: Seq[String]): Option[String] = {
    val ranges = accept.split(',').toSeq.map(_.trim).filter(_.nonEmpty)
      .zipWithIndex.map { case (r, i) =>
        val parts = r.split(';').map(_.trim)
        val q = parts.tail.collectFirst {
          case p if p.toLowerCase.startsWith("q=") =>
            p.drop(2).toDoubleOption.getOrElse(1.0)
        }.getOrElse(1.0)
        (parts.head.toLowerCase, q, i)
      }
    // RFC 7231 §5.3.2 precedence: a supported type's quality comes
    // from its MOST SPECIFIC matching range (exact > type/* > */*) —
    // a wildcard's q must not override the q the client put on the
    // type itself
    def spec(t: String, s: String): Int =
      if (t == s) 3
      else if (t != "*/*" && t.endsWith("/*") && s.startsWith(t.stripSuffix("*"))) 2
      else if (t == "*/*") 1
      else 0
    val scored = supported.flatMap { s =>
      val ms = ranges.filter { case (t, _, _) => spec(t, s) > 0 }
      if (ms.isEmpty) None
      else {
        val (_, q, i) = ms.maxBy { case (t, _, i) => (spec(t, s), -i) }
        Some((s, q, i))
      }
    }
    if (scored.isEmpty) None // nothing parseable matched → loose-value dispatch
    else {
      val acceptable = scored.filter(_._2 > 0)
      // every matched type carries q=0: the client excluded them all —
      // RFC 7231 lets the server ignore the header; serve the default
      // rather than an EXPLICITLY excluded type via substring dispatch
      if (acceptable.isEmpty) Some(supported.head)
      else Some(acceptable.minBy { case (_, q, i) => (-q, i) }._1)
    }
  }

  /** Protocol dataset parameters of a request — from the URL query
    * string AND (for the URL-encoded POST binding) the form body
    * [[queryText]] stashed. IRIs intern like every other loader path. */
  private def datasetParams(ex: HttpExchange,
                            defaultKey: String, namedKey: String): (Seq[String], Seq[String]) = {
    val sources = Seq(rawQuery(ex)) ++ formBody.get().toSeq
    def all(key: String): Seq[String] =
      sources.flatMap(multiParams(_, key)).map(internIri)
    (all(defaultKey), all(namedKey))
  }

  private def contentType(ex: HttpExchange): String =
    Option(ex.getRequestHeaders.getFirst("Content-Type")).getOrElse("")

  /** A form body's `update=`, stashed by [[queryText]] for the same
    * handler invocation (one thread per exchange) — the request body
    * can only be read once. */
  private val formUpdate = new ThreadLocal[Option[String]] {
    override def initialValue(): Option[String] = None
  }

  /** A form POST's raw URL-encoded body, stashed like [[formUpdate]] —
    * the protocol dataset parameters (`default-graph-uri` etc.) ride
    * in it under the URL-encoded POST binding. */
  private val formBody = new ThreadLocal[Option[String]] {
    override def initialValue(): Option[String] = None
  }

  private def queryText(ex: HttpExchange): Option[String] = {
    val ct = contentType(ex)
    formUpdate.set(None)
    formBody.set(None)
    if (ex.getRequestMethod == "GET" || ex.getRequestMethod == "DELETE")
      formParam(rawQuery(ex), "query")
    else {
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      if (ct.startsWith("application/x-www-form-urlencoded")) {
        formUpdate.set(formParam(body, "update"))
        formBody.set(Some(body))
        formParam(body, "query")
      } else Some(body) // application/sparql-query (and permissive default)
    }
  }

  // ---- term + document decoding -----------------------------------

  /** Content-Type → LOAD extension; the single dispatch table for both
    * ingest and body-DELETE (InsertServlet's Rio format negotiation). */
  private val rdfContentTypes = Map(
    "text/turtle" -> "ttl", "application/x-turtle" -> "ttl",
    "application/n-triples" -> "nt", "text/plain" -> "nt",
    "application/rdf+xml" -> "rdf", "application/ld+json" -> "jsonld",
    "application/n-quads" -> "nq", "application/trig" -> "trig",
    "application/trix" -> "trix", "application/rdf+json" -> "rj",
    "text/rdf+n3" -> "n3", "text/n3" -> "n3")

  private def rdfExtension(ct: String): Option[String] =
    rdfContentTypes.get(ct.split(';').head.trim.toLowerCase)

  /** Parse a request body as an RDF document by writing it to a spill
    * file and running the distributed LOAD readers over it — the same
    * code path (and the same loud parse failures) as SPARQL LOAD.
    * A POSTed body is driver-received by protocol nature (and the
    * spill file is driver-local): bulk cluster-scale ingest goes
    * through `?uri=` against shared storage instead, where executors
    * read the document directly. */
  private def bodyQuads(ex: HttpExchange, ext: String, graph: Option[String],
                        defaultGraph: String): (DataFrame, Path) =
    bytesQuads(ex.getRequestBody.readAllBytes(), ext, graph, defaultGraph)

  private def bytesQuads(bytes: Array[Byte], ext: String, graph: Option[String],
                         defaultGraph: String): (DataFrame, Path) = {
    val tmp = Files.createTempFile("graft_post", s".$ext")
    Files.write(tmp, bytes)
    (Update.loadOpQuads(spark, s"file://$tmp", graph, defaultGraph), tmp)
  }

  /** Minimal multipart/form-data reader for the UPDATE-with-body
    * servlet shape (two RDF document parts named `add`/`remove`):
    * field name from Content-Disposition, part Content-Type for the
    * parser dispatch, raw body bytes. Preamble/epilogue per RFC 2046;
    * good for document parts (no nested multiparts). */
  private def multipartParts(body: Array[Byte],
                             contentType: String): Map[String, (String, Array[Byte])] = {
    val boundary = contentType.split(';').map(_.trim)
      .collectFirst { case p if p.toLowerCase.startsWith("boundary=") =>
        p.substring("boundary=".length).stripPrefix("\"").stripSuffix("\"") }
      .getOrElse(sys.error("multipart body without a boundary parameter"))
    val text = new String(body, "ISO-8859-1") // byte-preserving charset
    // RFC 2046 §5.1.1: a delimiter is only valid at a LINE START —
    // split on CRLF+"--boundary" so a part whose content merely
    // contains the boundary byte sequence mid-line stays intact. The
    // body's FIRST delimiter has no preceding CRLF; prefixing one
    // makes the split rule uniform.
    val delim = "\r\n--" + boundary
    ("\r\n" + text).split(java.util.regex.Pattern.quote(delim)).toSeq
      .drop(1)                                  // preamble
      .takeWhile(p => !p.startsWith("--"))      // closing delimiter
      .flatMap { part =>
        val p = part.stripPrefix("\r\n")
        val headerEnd = p.indexOf("\r\n\r\n")
        if (headerEnd < 0) None
        else {
          val headers = p.substring(0, headerEnd).split("\r\n").toSeq
          def header(n: String): Option[String] = headers
            .find(_.toLowerCase.startsWith(n.toLowerCase + ":"))
            .map(_.split(":", 2)(1).trim)
          val name = header("Content-Disposition")
            .flatMap(_.split(';').map(_.trim)
              .collectFirst { case a if a.startsWith("name=") =>
                a.substring(5).stripPrefix("\"").stripSuffix("\"") })
          val ct = header("Content-Type").getOrElse("")
          // the CRLF preceding the next delimiter was consumed by the
          // delimiter split itself (it belongs to the delimiter, RFC
          // 2046), so the remainder is the EXACT part body
          val raw = p.substring(headerEnd + 4)
          name.map(n => n -> (ct, raw.getBytes("ISO-8859-1")))
        }
      }.toMap
  }

  /** Delete a request's spill file once the tenant op has MATERIALIZED
    * the parsed data (every mutation path localCheckpoints before it
    * returns) — a long-lived server must not accumulate request
    * bodies on disk. */
  private def dropSpill(p: Path): Unit = { Files.deleteIfExists(p); () }

  /** Intern a plain IRI the way the loaders do (`urn:graft:x` → `x`). */
  private def internIri(iri: String): String =
    if (iri.startsWith(Parser.Base)) iri.drop(Parser.Base.length) else iri

  /** An N-Triples-encoded term parameter (`<iri>`, `"lit"`,
    * `"lit"@lang`, `"lit"^^<dt>`, `_:b`) → the engine's term encoding;
    * a bare value passes through (convenience the reference's ESTCARD
    * does not need, but curl users will thank). */
  private def ntTerm(t: String): String = {
    // (?s): a literal term may carry raw newlines (the RdfLiteral
    // DOTALL convention) — without it such a term falls through to
    // the bare-value branch
    val Tagged = "(?s)^\"(.*)\"@([A-Za-z0-9-]+)$".r
    val Typed = "(?s)^\"(.*)\"\\^\\^<(.*)>$".r
    val Quoted = "(?s)^\"(.*)\"$".r
    def unesc(s: String): String = s
      .replace("\\\\", "￿").replace("\\n", "\n").replace("\\r", "\r")
      .replace("\\t", "\t").replace("\\\"", "\"").replace("￿", "\\")
    t match {
      case _ if t.startsWith("<") && t.endsWith(">") =>
        internIri(t.substring(1, t.length - 1))
      case Tagged(lex, lang) => "\"" + unesc(lex) + "\"@" + lang
      case Typed(lex, dt)    => "\"" + unesc(lex) + "\"^^" + internIri(dt)
      case Quoted(lex)       => unesc(lex)
      case _                 => t
    }
  }

  /** The quad access path for ESTCARD/GETSTMTS: bound terms prune the
    * scan (the narrow-scan pruning the quad source already proves). */
  private def accessPath(g: Graft, p: Map[String, Option[String]]): DataFrame = {
    import org.apache.spark.sql.functions.col
    Seq("s" -> "s", "p" -> "p", "o" -> "o", "c" -> "g").foldLeft(g.store.quads) {
      case (df, (param, column)) =>
        p.get(param).flatten match {
          case Some(term) => df.filter(col(column) === ntTerm(term))
          case None       => df
        }
    }
  }

  // ---- handlers ---------------------------------------------------

  private def isGraphResult(ast: Algebra): Boolean = ast match {
    case _: graft.sparql.Construct | _: graft.sparql.Describe |
         _: graft.sparql.DescribeWhere => true
    case _ => false
  }

  private def handleQuery(ex: HttpExchange, ns: String): Unit =
    try {
      val qp = params(rawQuery(ex))
      if (ex.getRequestMethod == "HEAD") {
        // HEAD /sparql: endpoint liveness probe (generic clients and
        // monitors send it; the reference's servlets inherit it from
        // HttpServlet) — status + headers, NO body. The namespace must
        // resolve FIRST: a monitor probing a deleted namespace must
        // see the same 4xx a GET would, not a healthy 200
        tenant(ns)
        ex.getResponseHeaders.set("Content-Type", "application/n-triples")
        ex.sendResponseHeaders(200, -1)
        ex.close()
      } else if (qp.contains("uuid"))
        // QueryServlet.java:183: mint a UUID server-side as text/plain
        // (RFC 4122 has no REST method, so the reference added one);
        // GET and POST alike, checked before the content-type arms
        respond(ex, 200, "text/plain", java.util.UUID.randomUUID().toString)
      else if (qp.contains("HASSTMT")) handleHasStmt(ex, ns)
      else if (ex.getRequestMethod == "PUT")
        // UPDATE-with-query: atomic delete-described + insert-body
        handleUpdateWithQuery(ex, ns)
      else if (ex.getRequestMethod == "POST" && qp.contains("updatePost"))
        // UPDATE via POST w/ multipart add/remove parts
        handleUpdateWithParts(ex, ns)
      else if (ex.getRequestMethod == "POST" && qp.contains("delete"))
        // DELETE via POST w/ body (clients that cannot send a DELETE
        // body — RESTServlet.java:275)
        handleDelete(ex, ns)
      else if (ex.getRequestMethod == "GET" && qp.isEmpty)
        // SPARQL 1.1 Service Description — the reference answers a
        // bare GET on the endpoint with one (BigdataRDFServlet /
        // VoID+SD document); N-Triples, one line per statement
        handleServiceDescription(ex, ns)
      else if (ex.getRequestMethod == "GET" && qp.contains("ESTCARD")) handleEstcard(ex, ns)
      else if (ex.getRequestMethod == "GET" && qp.contains("CONTEXTS")) handleContexts(ex, ns)
      else if (ex.getRequestMethod == "GET" && qp.contains("GETSTMTS")) handleGetStmts(ex, ns)
      else if (ex.getRequestMethod == "DELETE") handleDelete(ex, ns)
      else if (ex.getRequestMethod == "POST" &&
        contentType(ex).startsWith("application/sparql-update"))
        // the reference dispatches update bodies from /sparql by
        // content type (UpdateServlet via RESTServlet)
        handleUpdate(ex, ns)
      else if (ex.getRequestMethod == "POST" &&
        (rdfExtension(contentType(ex)).isDefined || qp.contains("uri")))
        handleInsert(ex, ns)
      else if (ex.getRequestMethod == "POST" &&
        contentType(ex).startsWith("application/x-www-form-urlencoded")) {
        // the one-shot request body is read ONCE here: queryText
        // stashes the form's update= and returns its query=, and the
        // reference's RESTServlet form dispatch follows — query= runs,
        // else update= applies, else a form with neither is not
        // guessed at (SPARQL 1.1 Protocol's URL-encoded POST binding)
        queryText(ex) match {
          case Some(q) => execQuery(ex, ns, qp, q)
          case None => formUpdate.get() match {
            case Some(u) =>
              val (ugs, ungs) =
                datasetParams(ex, "using-graph-uri", "using-named-graph-uri")
              val ops = Parser.parseUpdates(u)
              tenant(ns).updateOps(
                if (ugs.isEmpty && ungs.isEmpty) ops
                else graft.sparql.ProtocolDataset.usingIn(ops, ugs, ungs))
              respond(ex, 204, "text/plain", "")
            case None =>
              respond(ex, 400, "text/plain", "bad request: no query or update in form")
          }
        }
      } else {
        val ct = contentType(ex)
        if (ex.getRequestMethod == "POST" && ct.nonEmpty &&
            !ct.startsWith("application/sparql-query"))
          // a DECLARED media type none of the dispatch arms above
          // recognize → 415 (sparql11-protocol: the direct-POST query
          // binding is application/sparql-query; RDF ingest types and
          // the form binding dispatched earlier). A POST with NO
          // Content-Type stays the permissive query-text convenience.
          respond(ex, 415, "text/plain", s"unsupported media type: $ct")
        else {
          val q = queryText(ex).getOrElse(sys.error("no query in request"))
          execQuery(ex, ns, qp, q)
        }
      }
    } catch {
      case t: QueryTimeout =>
        // a deadline kill is the SERVER giving up, not a bad request
        try respond(ex, 503, "text/plain", t.getMessage)
        catch { case scala.util.control.NonFatal(_) => ex.close() }
      case scala.util.control.NonFatal(e) =>
        // if a streamed response already committed its status line the
        // best we can do is drop the connection
        try respond(ex, 400, "text/plain", s"bad request: ${e.getMessage}")
        catch { case scala.util.control.NonFatal(_) => ex.close() }
    }

  /** Execute query text `q` and render per the protocol knobs in `qp`
    * (`format=`, `timestamp=`, `explain`) — shared by every dispatch
    * arm that carries a query. */
  private def execQuery(ex: HttpExchange, ns: String,
                        qp: Map[String, Option[String]], q: String): Unit = {
        // ?format=json|xml|csv|tsv|turtle|ntriples|jsonld overrides the
        // Accept header (the reference's format= convenience for curl)
        val accept = qp.get("format").flatten.map {
          case "json" => "application/sparql-results+json"
          case "xml" => "application/sparql-results+xml"
          case "csv" => "text/csv"
          case "tsv" => "text/tab-separated-values"
          case "turtle" | "ttl" => "text/turtle"
          case "ntriples" | "nt" => "application/n-triples"
          case "jsonld" => "application/ld+json"
          case other => sys.error(s"unknown format: $other")
        }.getOrElse(Option(ex.getRequestHeaders.getFirst("Accept")).getOrElse(""))
        // ?timestamp=<version>: a read-only tx against that commit
        // point (the reference's TxServlet/timestamp protocol knob).
        // includeInferred=false (QueryServlet.java:140, default true)
        // reads the ASSERTED statements — meaningful on a
        // truth-maintenance namespace, identity elsewhere.
        val inferred = qp.get("includeInferred").flatten
          .forall(_.toBoolean)
        val g = qp.get("timestamp").flatten match {
          case Some(v) =>
            if (inferred) tenant(ns).at(v.toLong)
            else tenant(ns).assertedAt(v.toLong)
          // ?tx=<id>: read inside an open transaction — start snapshot
          // + own staged writes (read-your-writes)
          case None => qp.get("tx").flatten match {
            case Some(id) => txView(id, ns)
            case None     =>
              if (inferred) tenant(ns).current else tenant(ns).asserted
          }
        }
        val ast = Parser.parse(q)
        // SPARQL 1.1 Protocol §2.1.4: a protocol-supplied RDF dataset
        // (repeatable default-graph-uri=/named-graph-uri=, query
        // string or form body) takes precedence over the query's own
        // FROM / FROM NAMED
        val (dgs, ngs) = datasetParams(ex, "default-graph-uri", "named-graph-uri")
        // compile with THIS namespace's journal answering bd:history
        // (the built plan carries the segment scans; execution below
        // needs no scope) — in-memory namespaces compile bare and a
        // bd:history query there stays loud. A ?timestamp= read view
        // caps the visible log at its snapshot version.
        def build(): org.apache.spark.sql.DataFrame =
          if (dgs.isEmpty && ngs.isEmpty) g.query(q)
          else g.query(graft.sparql.ProtocolDataset.overrideIn(ast, dgs, ngs))
        val df = tenant(ns).journal match {
          case Some(j) =>
            val cap = qp.get("timestamp").flatten.map(_.toLong)
            graft.sparql.HistoryService.withJournal(j, cap)(build())
          // PINNED journal-less scope: an in-memory tenant's bd:history
          // must fail loud, never fall through to a process-global
          // default registration (cross-namespace history exposure)
          case None => graft.sparql.HistoryService.withoutJournal(build())
        }
        if (qp.contains("explain")) {
          // the reference's ?explain: the query PLAN, not the results.
          // maxBopLength clamps the rendered plan (the reference's
          // StatusServlet/BigdataRDFContext parameter — a pathological
          // plan must not produce an unbounded response body);
          // 0 = unlimited, matching the reference's interpretation.
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          val cap = qp.get("maxBopLength").flatten.map(_.toInt).getOrElse(0)
          val body =
            if (cap > 0 && plan.length > cap)
              plan.take(cap) + s"\n… [truncated at maxBopLength=$cap of ${plan.length} chars]"
            else plan
          respond(ex, 200, "text/plain", body)
        } else inJobGroup(ns, q, queryTimeoutMs(ex, qp)) {
          ast match {
            case _: Ask =>
              val b = df.collect().head.getBoolean(0)
              val a = negotiate(accept, Seq("application/sparql-results+json",
                "application/sparql-results+xml")).getOrElse(accept)
              if (a.contains("xml"))
                respond(ex, 200, "application/sparql-results+xml", Serializer.sparqlAskXml(b))
              else respond(ex, 200, "application/sparql-results+json", Serializer.sparqlAskJson(b))
            case _ if isGraphResult(ast) =>
              // graph results negotiate the RDF format (the reference
              // negotiates Rio writers the same way): Turtle and
              // compacted JSON-LD on request, N-Triples default —
              // all streamed; full media types honor RFC 7231 q-values
              val a = negotiate(accept, Seq("application/n-triples",
                "text/turtle", "application/ld+json")).getOrElse(accept)
              if (a.contains("turtle"))
                respondStream(ex, "text/turtle", Serializer.turtleHeader() + "\n",
                  lines(Serializer.toTurtle(df)), "\n", "")
              else if (a.contains("ld+json"))
                respondStream(ex, "application/ld+json",
                  "{\"@context\":" + Serializer.jsonLdContext() + ",\"@graph\":[",
                  lines(Serializer.toJsonLdCompact(df)), ",", "]}")
              else respondStream(ex, "application/n-triples", "",
                lines(Serializer.toNTriples(df)), "\n", "")
            case _ =>
              val vars = df.columns.toSeq
              val a = negotiate(accept, Seq("application/sparql-results+json",
                "application/sparql-results+xml", "text/csv",
                "text/tab-separated-values")).getOrElse(accept)
              if (a.contains("csv"))
                respondStream(ex, "text/csv", vars.mkString(",") + "\r\n",
                  lines(Serializer.sparqlCsvRows(df)), "\r\n", "")
              else if (a.contains("tab-separated"))
                respondStream(ex, "text/tab-separated-values",
                  vars.map("?" + _).mkString("\t") + "\n",
                  lines(Serializer.sparqlTsvRows(df)), "\n", "")
              else if (a.contains("xml"))
                respondStream(ex, "application/sparql-results+xml",
                  Serializer.sparqlXmlHead(vars),
                  lines(Serializer.sparqlXmlResults(df)), "", Serializer.sparqlXmlFoot)
              else
                respondStream(ex, "application/sparql-results+json",
                  Serializer.sparqlJsonHead(vars),
                  lines(Serializer.sparqlJsonBindings(df)), ",", Serializer.sparqlJsonFoot)
          }
        }
  }

  /** SPARQL 1.1 Service Description (§3): what this endpoint speaks,
    * as N-Triples over the `sd:` vocabulary. */
  private def handleServiceDescription(ex: HttpExchange, ns: String): Unit = {
    val sd = "http://www.w3.org/ns/sparql-service-description#"
    val ep = s"$address/namespace/$ns/sparql"
    val b = "_:svc"
    val lines = Seq(
      s"""$b <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <${sd}Service> .""",
      s"""$b <${sd}endpoint> <$ep> .""",
      s"""$b <${sd}supportedLanguage> <${sd}SPARQL11Query> .""",
      s"""$b <${sd}supportedLanguage> <${sd}SPARQL11Update> .""",
      s"""$b <${sd}feature> <${sd}UnionDefaultGraph> .""",
      s"""$b <${sd}feature> <${sd}BasicFederatedQuery> .""",
      s"""$b <${sd}resultFormat> <http://www.w3.org/ns/formats/SPARQL_Results_JSON> .""",
      s"""$b <${sd}resultFormat> <http://www.w3.org/ns/formats/SPARQL_Results_XML> .""",
      s"""$b <${sd}resultFormat> <http://www.w3.org/ns/formats/SPARQL_Results_CSV> .""",
      s"""$b <${sd}resultFormat> <http://www.w3.org/ns/formats/SPARQL_Results_TSV> .""",
      s"""$b <${sd}resultFormat> <http://www.w3.org/ns/formats/N-Triples> .""",
      s"""$b <${sd}resultFormat> <http://www.w3.org/ns/formats/Turtle> .""",
      s"""$b <${sd}resultFormat> <http://www.w3.org/ns/formats/JSON-LD> .""",
      s"""$b <${sd}inputFormat> <http://www.w3.org/ns/formats/Turtle> .""",
      s"""$b <${sd}inputFormat> <http://www.w3.org/ns/formats/N-Triples> .""",
      s"""$b <${sd}inputFormat> <http://www.w3.org/ns/formats/N-Quads> .""",
      s"""$b <${sd}inputFormat> <http://www.w3.org/ns/formats/TriG> .""",
      s"""$b <${sd}inputFormat> <http://www.w3.org/ns/formats/RDF_XML> .""",
      s"""$b <${sd}inputFormat> <http://www.w3.org/ns/formats/JSON-LD> .""")
    respond(ex, 200, "application/n-triples", lines.mkString("\n"))
  }

  /** `POST /sparql` with an RDF document body (InsertServlet.java:61:
    * POST-with-body; content-type picks the parser, `context-uri`
    * the target graph), or `?uri=<document-url>` (InsertServlet's
    * POST-with-URIs form, `file:` scheme — a cluster ingests from
    * shared storage, not by tunneling bytes through the coordinator). */
  private def handleInsert(ex: HttpExchange, ns: String): Unit = {
    val qp = params(rawQuery(ex))
    val graph = qp.get("context-uri").flatten.orElse(qp.get("graph").flatten)
      .map(internIri)
    val t = tenant(ns)
    val (quads, spill) = qp.get("uri").flatten match {
      case Some(uri) =>
        require(uri.startsWith("file:"), s"only file: ingest URIs are supported, got $uri")
        (Update.loadOpQuads(spark, uri, graph, t.current.defaultGraph), None)
      case None =>
        val ext = rdfExtension(contentType(ex)).getOrElse(
          sys.error(s"unsupported RDF content type: ${contentType(ex)}"))
        val (q, tmp) = bodyQuads(ex, ext, graph, t.current.defaultGraph)
        (q, Some(tmp))
    }
    qp.get("tx").flatten match {
      case Some(id) =>
        // materialize before the spill file drops, then stage
        val staged =
          try inJobGroup(ns, "data-POST (staged)") { quads.localCheckpoint() }
          finally spill.foreach(dropSpill)
        stageTx(id, ns, Right(staged))
        respond(ex, 200, "application/xml",
          s"""<?xml version="1.0"?><data modified="${staged.count()}" staged="true"/>""")
      case None =>
        val suppress = qp.get("suppressTruthMaintenance").flatten
          .exists(_.toBoolean)
        val n =
          try inJobGroup(ns, "data-POST") {
            if (suppress) t.ingestSuppressed(quads) else t.ingest(quads)
          }
          finally spill.foreach(dropSpill)
        respond(ex, 200, "application/xml",
          s"""<?xml version="1.0"?><data modified="$n"/>""")
    }
  }

  /** `PUT /sparql?query=<CONSTRUCT|DESCRIBE>` with an RDF body
    * (UpdateServlet.java:90 `doUpdateWithQuery`): ATOMIC update — the
    * query's materialized statements are removed and the body's
    * statements inserted as ONE commit; `<data modified="removed+
    * inserted"/>`. The curl-script shape for "replace what this query
    * describes with this document". */
  private def handleUpdateWithQuery(ex: HttpExchange, ns: String): Unit = {
    val qp = params(rawQuery(ex))
    val t = tenant(ns)
    val q = qp.get("query").flatten
      .getOrElse(sys.error("PUT update needs ?query=<CONSTRUCT|DESCRIBE>"))
    require(isGraphResult(Parser.parse(q)),
      "PUT update requires CONSTRUCT or DESCRIBE")
    val ext = rdfExtension(contentType(ex)).getOrElse(
      sys.error(s"unsupported RDF content type: ${contentType(ex)}"))
    val (adds, spill) = bodyQuads(ex, ext, None, t.current.defaultGraph)
    val suppress = qp.get("suppressTruthMaintenance").flatten.exists(_.toBoolean)
    val n =
      try inJobGroup(ns, "PUT update-with-query") {
        t.updateWithBody(t.current.query(q).select("s", "p", "o"), adds, suppress)
      } finally dropSpill(spill)
    respond(ex, 200, "application/xml",
      s"""<?xml version="1.0"?><data modified="$n"/>""")
  }

  /** `POST /sparql?updatePost` with a multipart body carrying RDF
    * document parts named `remove` and `add` (UpdateServlet.java:817
    * `doUpdateWithBody`): atomic remove+insert in one request; each
    * part's own Content-Type picks its parser. */
  private def handleUpdateWithParts(ex: HttpExchange, ns: String): Unit = {
    val qp = params(rawQuery(ex))
    val t = tenant(ns)
    val ct = contentType(ex)
    require(ct.toLowerCase.startsWith("multipart/"),
      s"updatePost needs a multipart body, got '$ct'")
    val parts = multipartParts(ex.getRequestBody.readAllBytes(), ct)
    def quadsOf(name: String): Option[(DataFrame, Path)] = parts.get(name).map {
      case (pct, bytes) =>
        val ext = rdfExtension(pct).getOrElse(
          sys.error(s"part '$name' has an unsupported RDF content type: '$pct'"))
        bytesQuads(bytes, ext, None, t.current.defaultGraph)
    }
    require(parts.contains("add") || parts.contains("remove"),
      "updatePost needs an 'add' and/or 'remove' part")
    val remove = quadsOf("remove")
    val add = quadsOf("add")
    val suppress = qp.get("suppressTruthMaintenance").flatten.exists(_.toBoolean)
    val n =
      try inJobGroup(ns, "updatePost") {
        t.updateWithBody(
          remove.map(_._1.select("s", "p", "o"))
            .getOrElse(emptyQuads.select("s", "p", "o")),
          add.map(_._1).getOrElse(emptyQuads),
          suppress)
      } finally (remove.toSeq ++ add.toSeq).foreach(p => dropSpill(p._2))
    respond(ex, 200, "application/xml",
      s"""<?xml version="1.0"?><data modified="$n"/>""")
  }

  /** `DELETE /sparql?query=<CONSTRUCT…>` or DELETE-with-body
    * (DeleteServlet.java); also reachable as `POST /sparql?delete`
    * with a body (RESTServlet.java:275 — the arm for clients that
    * cannot send DELETE with a body): removes the described
    * statements from every graph they appear in. */
  private def handleDelete(ex: HttpExchange, ns: String): Unit = {
    val t = tenant(ns)
    val qp = params(rawQuery(ex))
    // the delete query comes from the QUERY STRING (never the body —
    // under POST ?delete the body IS the RDF document to remove)
    val delQuery = qp.get("query").flatten
    val apBound = Seq("s", "p", "o", "c").exists(k => qp.get(k).flatten.isDefined)
    if (delQuery.isEmpty && rdfExtension(contentType(ex)).isEmpty && apBound) {
      // DELETE-by-access-path (DeleteServlet.java:106
      // doDeleteWithAccessPath): NT-encoded s/p/o/c terms choose the
      // doomed quads exactly like ESTCARD/GETSTMTS; `c=` scopes the
      // removal to one graph. A completely BARE DELETE stays loud
      // below — the reference wipes the namespace on an empty access
      // path, a foot-gun this server keeps behind the explicit update
      // path (DROP ALL).
      val suppressAp = qp.get("suppressTruthMaintenance").flatten
        .exists(_.toBoolean)
      val n = inJobGroup(ns, "data-DELETE (access path)") {
        val doomed = accessPath(t.current, qp)
        if (suppressAp) t.removeQuadsSuppressed(doomed) else t.removeQuads(doomed)
      }
      respond(ex, 200, "application/xml",
        s"""<?xml version="1.0"?><data modified="$n"/>""")
      return
    }
    val (spo, spill) = delQuery match {
      case Some(q) =>
        val ast = Parser.parse(q)
        require(isGraphResult(ast),
          "DELETE with query requires CONSTRUCT or DESCRIBE")
        (t.current.query(q).select("s", "p", "o"), None)
      case None =>
        val ext = rdfExtension(contentType(ex)).getOrElse(
          sys.error(s"DELETE needs ?query=… or an RDF body; got content type '${contentType(ex)}'"))
        val (q, tmp) = bodyQuads(ex, ext, None, t.current.defaultGraph)
        (q.select("s", "p", "o"), Some(tmp))
    }
    val suppress = params(rawQuery(ex)).get("suppressTruthMaintenance")
      .flatten.exists(_.toBoolean)
    val n =
      try inJobGroup(ns, "data-DELETE") {
        if (suppress) t.removeSuppressed(spo) else t.remove(spo)
      }
      finally spill.foreach(dropSpill)
    respond(ex, 200, "application/xml",
      s"""<?xml version="1.0"?><data modified="$n"/>""")
  }

  /** `GET /sparql?HASSTMT&s=&p=&o=&c=` (QueryServlet.java:159) —
    * boolean statement-existence probe over the chosen access path;
    * honors `?timestamp=` like the reference's HasStmtTask. Answers
    * `<data result="…" milliseconds="…"/>`, the
    * buildAndCommitBooleanResponse document
    * (BigdataRDFServlet.java:530). The probe is a `LIMIT 1` existence
    * job over the pruned access path — never a count. */
  private def handleHasStmt(ex: HttpExchange, ns: String): Unit = {
    val t0 = System.currentTimeMillis()
    val qp = params(rawQuery(ex))
    val inferred = qp.get("includeInferred").flatten.forall(_.toBoolean)
    val g = qp.get("timestamp").flatten match {
      case Some(v) =>
        if (inferred) tenant(ns).at(v.toLong) else tenant(ns).assertedAt(v.toLong)
      case None =>
        if (inferred) tenant(ns).current else tenant(ns).asserted
    }
    val found = inJobGroup(ns, "HASSTMT") { !accessPath(g, qp).isEmpty }
    respond(ex, 200, "application/xml",
      s"""<?xml version="1.0"?><data result="$found" milliseconds="${System.currentTimeMillis() - t0}"/>""")
  }

  /** `GET /sparql?ESTCARD&…` — the reference's fast range count
    * (QueryServlet.java:152: ESTCARD over the chosen access path).
    * The reference answers from B+Tree page metadata; here an unbound
    * or graph-only-bound count over a DURABLE, fully-compacted head is
    * answered from parquet FOOTERS (graph-partitioned segments scope
    * the `c=` term to one partition directory) — no Spark job, no data
    * read; the response carries `fastpath="metadata"` so callers (and
    * tests) can tell. Bound s/p/o terms run an exact count over the
    * pruned access path. */
  private def handleEstcard(ex: HttpExchange, ns: String): Unit = {
    val t0 = System.currentTimeMillis()
    val qp = params(rawQuery(ex))
    val spoBound = Seq("s", "p", "o").exists(k => qp.get(k).flatten.isDefined)
    val graph = qp.get("c").flatten.map(ntTerm)
    val fast = if (spoBound) None else tenant(ns).metadataCount(graph)
    val (n, attrs) = fast match {
      case Some(m) => (m, s""" fastpath="metadata"""")
      case None => (inJobGroup(ns, "ESTCARD") {
        accessPath(tenant(ns).current, qp).count()
      }, "")
    }
    respond(ex, 200, "application/xml",
      s"""<?xml version="1.0"?><data rangeCount="$n" milliseconds="${System.currentTimeMillis() - t0}"$attrs/>""")
  }

  /** `POST /dataloader` (namespace-scoped: `/namespace/<ns>/dataloader`)
    * — the DataLoaderServlet analog (bigdata-sails/.../webapp/
    * DataLoaderServlet.java:61: POST a properties doc naming
    * server-visible files/dirs to mass-load). Body: `text/plain`, one
    * file path/dir/glob per line (`#` comments skipped); `?graph=`
    * targets a named graph, `?no-compact` skips the final seal. The
    * whole batch lands as ONE commit through the tenant's own journal
    * (single-pass: segment write + footer count). Non-`file:` schemes
    * are refused loudly, like `?uri=` ingest. */
  private def handleDataLoader(ex: HttpExchange, ns: String): Unit =
    try {
      require(ex.getRequestMethod == "POST", "dataloader requires POST")
      val qp = params(rawQuery(ex))
      val graph = qp.get("graph").flatten.map(internIri)
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      val paths = body.split('\n').map(_.trim)
        .filter(p => p.nonEmpty && !p.startsWith("#")).toSeq
      require(paths.nonEmpty, "no input paths in body")
      paths.foreach { p =>
        require(!p.matches("^[A-Za-z][A-Za-z0-9+.-]*:.*") || p.startsWith("file:"),
          s"only file: ingest paths are supported, got $p")
      }
      val (v, n) = inJobGroup(ns, "BULK-LOAD") {
        tenant(ns).bulkLoad(paths, graph, compact = !qp.contains("no-compact"))
      }
      respond(ex, 200, "application/xml",
        s"""<?xml version="1.0"?><data modified="$n" version="$v"/>""")
    } catch {
      case scala.util.control.NonFatal(e) =>
        respond(ex, 400, "text/plain", s"bad request: ${e.getMessage}")
    }

  /** `GET /sparql?CONTEXTS` — the named graphs (QueryServlet CONTEXTS
    * op), as the reference's contexts XML document. */
  private def handleContexts(ex: HttpExchange, ns: String): Unit = {
    val gs = inJobGroup(ns, "CONTEXTS") {
      tenant(ns).current.store.graphs.collect().map(_.getString(0)).sorted
    }
    def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;").replace("\"", "&quot;")
    val body = gs.map { g =>
      val iri = if (g.matches("^(http|https|urn|file|mailto|did|tag):.*")) g
                else Parser.Base + g
      s"""<context uri="${esc(iri)}"/>"""
    }.mkString
    respond(ex, 200, "application/xml",
      s"""<?xml version="1.0"?><contexts>$body</contexts>""")
  }

  /** `GET /sparql?GETSTMTS&…` — the matching statements, streamed as
    * N-Quads (QueryServlet GETSTMTS / ExportServlet analog). */
  private def handleGetStmts(ex: HttpExchange, ns: String): Unit =
    inJobGroup(ns, "GETSTMTS") {
      val qp = params(rawQuery(ex))
      // BLZG-1207: getStatements must honor includeInferred
      val inferred = qp.get("includeInferred").flatten.forall(_.toBoolean)
      val g = if (inferred) tenant(ns).current else tenant(ns).asserted
      val df = accessPath(g, qp)
      respondStream(ex, "application/n-quads", "",
        lines(Serializer.toNQuads(df)), "\n", "")
    }

  /** SPARQL 1.1 Graph Store Protocol (`/rdf-graphs?graph=<iri>` or
    * `?default`): GET streams the graph as N-Triples, PUT replaces it
    * with the request body (204), POST merges the body into it
    * (`<data modified>`), DELETE drops it (204); GET/DELETE of an
    * empty graph is a 404 per the spec. The reference exposes the
    * same operations through its Insert/Delete servlets; GSP adds the
    * standard URL shapes a generic client library expects. */
  private def handleGraphStore(ex: HttpExchange, ns: String): Unit =
    try {
      val qp = params(rawQuery(ex))
      val t = tenant(ns)
      val g =
        if (qp.contains("default")) t.current.defaultGraph
        else internIri(qp.get("graph").flatten.getOrElse(
          sys.error("graph store request needs ?graph=<iri> or ?default")))
      def graphRows = t.current.store.graph(g)
      ex.getRequestMethod match {
        case "GET" => inJobGroup(ns, s"GSP GET $g") {
          if (graphRows.isEmpty) respond(ex, 404, "text/plain", s"no graph: $g")
          else respondStream(ex, "application/n-triples", "",
            lines(Serializer.toNTriples(graphRows)), "\n", "")
        }
        case "PUT" =>
          val ext = rdfExtension(contentType(ex)).getOrElse(
            sys.error(s"unsupported RDF content type: ${contentType(ex)}"))
          val (quads, spill) = bodyQuads(ex, ext, Some(g), g)
          try inJobGroup(ns, s"GSP PUT $g") { t.putGraph(g, quads) }
          finally dropSpill(spill)
          respond(ex, 204, "text/plain", "")
        case "POST" =>
          val ext = rdfExtension(contentType(ex)).getOrElse(
            sys.error(s"unsupported RDF content type: ${contentType(ex)}"))
          val (quads, spill) = bodyQuads(ex, ext, Some(g), g)
          val n =
            try inJobGroup(ns, s"GSP POST $g") { t.ingest(quads) }
            finally dropSpill(spill)
          respond(ex, 200, "application/xml",
            s"""<?xml version="1.0"?><data modified="$n"/>""")
        case "DELETE" => inJobGroup(ns, s"GSP DELETE $g") {
          if (graphRows.isEmpty) respond(ex, 404, "text/plain", s"no graph: $g")
          else { t.dropGraph(g); respond(ex, 204, "text/plain", "") }
        }
        case other => respond(ex, 405, "text/plain", s"method not allowed: $other")
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        try respond(ex, 400, "text/plain", s"bad request: ${e.getMessage}")
        catch { case scala.util.control.NonFatal(_) => ex.close() }
    }

  private def handleUpdate(ex: HttpExchange, ns: String): Unit =
    try {
      val ct = contentType(ex)
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      val isForm = ct.startsWith("application/x-www-form-urlencoded")
      val text =
        if (isForm) formParam(body, "update").getOrElse(sys.error("no update in form"))
        else body // application/sparql-update
      // protocol update dataset (§2.2.3) — query string or form body;
      // the stash must be set HERE (this handler reads the body
      // itself, a pooled thread may carry a previous request's form)
      formBody.set(if (isForm) Some(body) else None)
      val (ugs, ungs) =
        datasetParams(ex, "using-graph-uri", "using-named-graph-uri")
      params(rawQuery(ex)).get("tx").flatten match {
        case Some(id) =>
          require(ugs.isEmpty && ungs.isEmpty,
            "using-graph-uri/using-named-graph-uri are not supported on " +
              "staged (?tx=) updates — put USING in the update text")
          stageTx(id, ns, Left(text))  // staged, not committed
        case None =>
          val ops = Parser.parseUpdates(text)
          val rewritten =
            if (ugs.isEmpty && ungs.isEmpty) ops
            else graft.sparql.ProtocolDataset.usingIn(ops, ugs, ungs)
          // suppressTruthMaintenance=true (query string or form): skip
          // closure maintenance for THIS request (no-op on non-TM
          // namespaces) — QueryServlet.java:132's knob
          val suppress = params(rawQuery(ex))
            .get("suppressTruthMaintenance").flatten
            .orElse(if (isForm) formParam(body, "suppressTruthMaintenance") else None)
            .exists(_.toBoolean)
          if (suppress) tenant(ns).updateOpsSuppressed(rewritten)
          else tenant(ns).updateOps(rewritten)
      }
      respond(ex, 204, "text/plain", "")
    } catch {
      case scala.util.control.NonFatal(e) =>
        respond(ex, 400, "text/plain", s"bad request: ${e.getMessage}")
    }

  /** `GET/POST /whitelist` — the SERVICE-endpoint whitelist config
    * (ast/service/ServiceRegistry.java:354-381's
    * add/removeServiceWhitelistURL + setWhitelistEnabled, surfaced
    * over the management plane). POST replaces: form/query
    * `enabled=true|false` + repeated `uri=`; GET reads the current
    * policy back. The registry is process-global, exactly like the
    * reference's singleton — one policy per JVM, all namespaces. */
  private object WhitelistHandler extends HttpHandler {
    def handle(ex: HttpExchange): Unit =
      try {
        import graft.sparql.ServiceRegistry
        ex.getRequestMethod match {
          case "GET" =>
            val uris = ServiceRegistry.whitelisted
              .map(u => s"<uri>${esc(u)}</uri>").mkString
            respond(ex, 200, "application/xml",
              s"""<?xml version="1.0"?><whitelist enabled="${ServiceRegistry.isWhitelistEnabled}">$uris</whitelist>""")
          case "POST" =>
            // management-plane guard: the whitelist defends against
            // untrusted QUERIERS, so those same clients must not be
            // able to switch it off over HTTP. With
            // -Dgraft.whitelist.readonly=true (or a whitelist.readonly
            // marker beside the journals) the endpoint is read-only —
            // policy changes then happen only via config/filesystem,
            // the reference's config-file-fed registry posture.
            val readOnly =
              sys.props.get("graft.whitelist.readonly").exists(_.toBoolean) ||
                journalDir.exists(d =>
                  Files.exists(Paths.get(d).resolve("whitelist.readonly")))
            if (readOnly) {
              respond(ex, 403, "text/plain",
                "whitelist endpoint is read-only (graft.whitelist.readonly)")
              return
            }
            val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
            val sources = Seq(body, rawQuery(ex))
            val enabled = sources.flatMap(formParam(_, "enabled")).headOption
              .getOrElse(sys.error("no enabled= in request")).toBoolean
            val uris = sources.flatMap(multiParams(_, "uri"))
            ServiceRegistry.setWhitelist(enabled, uris)
            // durable servers persist the policy beside the journals;
            // startup re-applies it (the reference's singleton registry
            // is config-file-fed the same way)
            journalDir.foreach(d => Files.writeString(
              Paths.get(d).resolve("whitelist.conf"),
              (enabled.toString +: uris).mkString("\n")))
            respond(ex, 200, "text/plain",
              s"whitelist: enabled=$enabled uris=${uris.size}")
          case other => respond(ex, 405, "text/plain", s"method not allowed: $other")
        }
      } catch {
        case scala.util.control.NonFatal(e) =>
          respond(ex, 400, "text/plain", s"bad request: ${e.getMessage}")
      }
  }

  private object StatusHandler extends HttpHandler {
    def handle(ex: HttpExchange): Unit =
      try {
        val qp = params(rawQuery(ex))
        if (qp.contains("cancelQuery")) {
          val id = qp.get("queryId").flatten.getOrElse(sys.error("no queryId"))
          if (running.containsKey(id)) {
            spark.sparkContext.cancelJobGroup(id)
            respond(ex, 200, "text/plain", s"cancelled: $id")
          } else respond(ex, 404, "text/plain", s"no such query: $id")
        } else {
          val now = System.currentTimeMillis()
          // maxBopLength: the reference's StatusServlet detail clamp —
          // how much of each running operation's text is rendered
          val cap = qp.get("maxBopLength").flatten.map(_.toInt)
            .filter(_ > 0).getOrElse(120)
          val rows = running.values.asScala.toSeq.sortBy(_.startedMs).map { r =>
            val q1 = r.query.replace('\n', ' ').take(cap)
            s"${r.id}\t${r.ns}\t${now - r.startedMs}ms\t$q1"
          }
          respond(ex, 200, "text/plain",
            (s"running: ${rows.size} served: ${served.get()}" +: rows).mkString("\n"))
        }
      } catch {
        case scala.util.control.NonFatal(e) =>
          respond(ex, 400, "text/plain", s"bad request: ${e.getMessage}")
      }
  }

  /** `POST /backup?target=<dir>` (bare + namespace-scoped) — online
    * journal snapshot (BackupServlet.java:62 analog): copies the
    * namespace's commit log + segments to a server-visible directory
    * under the namespace WRITE LOCK (quiesced — no commit lands
    * mid-copy), so the copy is itself an openable journal
    * (`Repository.open`/`SparqlServer.durable` reattach it as-is).
    * Durable namespaces only; non-file targets refused. */
  private def handleBackup(ex: HttpExchange, ns: String): Unit =
    try {
      require(ex.getRequestMethod == "POST", "backup requires POST")
      val target = params(rawQuery(ex)).get("target").flatten
        .getOrElse(sys.error("backup needs ?target=<server-visible-dir>"))
      require(!target.matches("^[A-Za-z][A-Za-z0-9+.-]*:.*") || target.startsWith("file:"),
        s"only file: backup targets are supported, got $target")
      val v = tenant(ns).backup(Paths.get(target.stripPrefix("file://")))
      respond(ex, 200, "application/xml",
        s"""<?xml version="1.0"?><data backup="${target.replace("&", "&amp;").replace("\"", "&quot;")}" version="$v"/>""")
    } catch {
      case scala.util.control.NonFatal(e) =>
        respond(ex, 400, "text/plain", s"bad request: ${e.getMessage}")
    }

  /** `GET /counters` — performance-counters document (CountersServlet
    * analog-lite): served/running totals plus per-namespace
    * aggregates and the recent-operation history ring. Deep
    * executor/shuffle/IO metrics are deliberately NOT re-implemented
    * — that is the Spark UI's job (the declared non-goal split). */
  private object CountersHandler extends HttpHandler {
    def handle(ex: HttpExchange): Unit =
      try {
        def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;")
          .replace(">", "&gt;").replace("\"", "&quot;")
        val h = history.iterator().asScala.toSeq
        val byNs = h.groupBy(_.ns).toSeq.sortBy(_._1).map { case (n, ds) =>
          val avg = ds.map(_.elapsedMs).sum / ds.size
          s"""<namespace name="${esc(n)}" ops="${ds.size}" avgMs="$avg" maxMs="${ds.map(_.elapsedMs).max}"/>"""
        }.mkString
        val recent = h.take(20).map { d =>
          s"""<op ns="${esc(d.ns)}" ms="${d.elapsedMs}">${esc(d.op)}</op>"""
        }.mkString
        respond(ex, 200, "application/xml",
          s"""<?xml version="1.0"?><counters served="${served.get()}" running="${running.size}">$byNs<recent>$recent</recent></counters>""")
      } catch {
        case scala.util.control.NonFatal(e) =>
          respond(ex, 400, "text/plain", s"bad request: ${e.getMessage}")
      }
  }

  /** Multi-request write transactions, minimal form (TxServlet.java:71
    * analog): `POST /tx` begins one (`?ns=` scopes it; default
    * namespace otherwise) and returns its id; requests carrying
    * `?tx=<id>` STAGE their mutation instead of committing;
    * `POST /tx/<id>/commit` publishes the staged sequence as ONE
    * journal commit — a head that moved since tx creation is a loud
    * 409 (first-committer-wins); `POST /tx/<id>/abort` discards.
    * Queries carrying `?tx=<id>` read INSIDE the transaction — the
    * start snapshot plus the tx's own staged writes ([[txView]]) —
    * while other connections never see staged state until commit:
    * the reference's full read/write-tx isolation. `?timestamp=`
    * remains the read-only commit-point knob. */
  private object TxHandler extends HttpHandler {
    private def commitTx(ex: HttpExchange, id: String): Unit = {
      val tx = txs.remove(id)
      if (tx == null) respond(ex, 404, "text/plain", s"no such transaction: $id")
      else
        try {
          val v = inJobGroup(tx.ns, s"TX-COMMIT $id") {
            tenant(tx.ns).commitStaged(tx.items.synchronized(tx.items.toSeq),
              tx.startVersion)
          }
          respond(ex, 200, "application/xml",
            s"""<?xml version="1.0"?><tx txId="$id" committed="$v"/>""")
        } catch {
          case e: TxConflict => respond(ex, 409, "text/plain", e.getMessage)
        }
    }
    private def abortTx(ex: HttpExchange, id: String): Unit =
      if (txs.remove(id) == null)
        respond(ex, 404, "text/plain", s"no such transaction: $id")
      else respond(ex, 200, "application/xml",
        s"""<?xml version="1.0"?><tx txId="$id" aborted="true"/>""")
    def handle(ex: HttpExchange): Unit =
      try {
        val rest = ex.getRequestURI.getPath.stripPrefix("/tx").stripPrefix("/")
        val parts = if (rest.isEmpty) Nil else rest.split("/").toList
        (parts, ex.getRequestMethod) match {
          case (Nil, "POST") =>
            val ns = params(rawQuery(ex)).get("ns").flatten.getOrElse(defaultNamespace)
            val t = tenant(ns)
            val id = java.util.UUID.randomUUID().toString
            txs.put(id, Tx(id, ns, t.version, t.current,
              scala.collection.mutable.Buffer.empty, System.currentTimeMillis()))
            respond(ex, 201, "application/xml",
              s"""<?xml version="1.0"?><tx txId="$id" namespace="$ns" readsOnCommitTime="${t.version}"/>""")
          case (Nil, "GET") =>
            val rows = txs.values.asScala.toSeq.sortBy(_.startedMs).map { t =>
              s"""<tx txId="${t.id}" namespace="${t.ns}" staged="${t.items.size}"/>"""
            }
            respond(ex, 200, "application/xml",
              s"""<?xml version="1.0"?><txs>${rows.mkString}</txs>""")
          case (List(id, "commit"), "POST") => commitTx(ex, id)
          case (List(id, "abort"), "POST")  => abortTx(ex, id)
          // the reference's verb shape (TxServlet.java:82-94):
          // POST /tx/<id>?COMMIT|ABORT|PREPARE — param-dispatched
          case (List(id), "POST") =>
            val qp = params(rawQuery(ex))
            if (qp.contains("COMMIT")) commitTx(ex, id)
            else if (qp.contains("ABORT")) abortTx(ex, id)
            else if (qp.contains("PREPARE")) {
              // validate-without-commit; advisory (no lock is held
              // between prepare and commit — the reference's
              // single-writer semantics make the same caveat)
              val tx = txs.get(id)
              if (tx == null)
                respond(ex, 404, "text/plain", s"no such transaction: $id")
              else
                try {
                  inJobGroup(tx.ns, s"TX-PREPARE $id") {
                    tenant(tx.ns).prepareStaged(
                      tx.items.synchronized(tx.items.toSeq), tx.startVersion)
                  }
                  respond(ex, 200, "application/xml",
                    s"""<?xml version="1.0"?><tx txId="$id" prepared="true"/>""")
                } catch {
                  case e: TxConflict => respond(ex, 409, "text/plain", e.getMessage)
                }
            } else respond(ex, 405, "text/plain",
              "unsupported tx operation (COMMIT | ABORT | PREPARE)")
          case _ => respond(ex, 405, "text/plain", "unsupported tx operation")
        }
      } catch {
        case scala.util.control.NonFatal(e) =>
          respond(ex, 400, "text/plain", s"bad request: ${e.getMessage}")
      }
  }

  /** Blueprints REST binding (BlueprintsServletProxy.java:41 analog):
    * the [[graft.graph.MutableGraph]] mutation surface over HTTP,
    * compiled onto the namespace's own SPARQL UPDATE write path —
    * durable tenants journal these like any update, and vertices/
    * edges ARE statements (the BigdataGraph mapping). POST form:
    * {{{
    *   op=addVertex&id=v[&label=L]        op=addEdge&out=a&label=p&in=b
    *   op=setProperty&id=v&key=k&value=x  op=removeProperty&id=v&key=k
    *   op=removeEdge&out=a&label=p&in=b   op=removeVertex&id=v
    * }}}
    * GET `?vertex=<id>` streams the vertex's statements as N-Triples
    * (mutate → traverse round-trip for a remote property-graph
    * client). */
  private def handleBlueprints(ex: HttpExchange, ns: String): Unit =
    try {
      if (ex.getRequestMethod == "GET") {
        val id = params(rawQuery(ex)).get("vertex").flatten
          .getOrElse(sys.error("GET needs ?vertex=<id>"))
        import org.apache.spark.sql.functions.col
        val df = tenant(ns).current.store.quads
          .filter(col("s") === id).select("s", "p", "o").distinct()
        inJobGroup(ns, s"BLUEPRINTS GET $id") {
          respondStream(ex, "application/n-triples", "",
            lines(Serializer.toNTriples(df)), "\n", "")
        }
      } else {
        require(ex.getRequestMethod == "POST", "blueprints requires GET or POST")
        val form = params(new String(ex.getRequestBody.readAllBytes(), "UTF-8"))
        def p(k: String) = form.get(k).flatten.getOrElse(sys.error(s"missing param $k"))
        // bare ids render under the engine base (the loaders intern it
        // back to the local name MutableGraph uses); full IRIs pass
        def iri(x: String) = {
          require(x.matches("[^\\s<>\"{}|^`]+"), s"bad term: $x")
          if (x.matches("^(http|https|urn|file|mailto|did|tag):.*")) s"<$x>"
          else s"<${Parser.Base}$x>"
        }
        def strLit(x: String) = "\"" + x.replace("\\", "\\\\").replace("\"", "\\\"")
          .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t") + "\""
        val text = p("op") match {
          case "addVertex" =>
            s"INSERT DATA { ${iri(p("id"))} ${iri("type")} ${iri(form.get("label").flatten.getOrElse("Vertex"))} }"
          case "addEdge" =>
            s"INSERT DATA { ${iri(p("out"))} ${iri(p("label"))} ${iri(p("in"))} }"
          case "setProperty" =>
            s"DELETE { ${iri(p("id"))} ${iri(p("key"))} ?o } WHERE { ${iri(p("id"))} ${iri(p("key"))} ?o } ; " +
              s"INSERT DATA { ${iri(p("id"))} ${iri(p("key"))} ${strLit(p("value"))} }"
          case "removeProperty" =>
            s"DELETE { ${iri(p("id"))} ${iri(p("key"))} ?o } WHERE { ${iri(p("id"))} ${iri(p("key"))} ?o }"
          case "removeEdge" =>
            s"DELETE DATA { ${iri(p("out"))} ${iri(p("label"))} ${iri(p("in"))} }"
          case "removeVertex" =>
            s"DELETE { ${iri(p("id"))} ?p ?o } WHERE { ${iri(p("id"))} ?p ?o } ; " +
              s"DELETE { ?s ?p ${iri(p("id"))} } WHERE { ?s ?p ${iri(p("id"))} }"
          case other => sys.error(s"unknown blueprints op: $other")
        }
        inJobGroup(ns, s"BLUEPRINTS ${p("op")}") { tenant(ns).update(text) }
        respond(ex, 204, "text/plain", "")
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        respond(ex, 400, "text/plain", s"bad request: ${e.getMessage}")
    }

  /** Minimal workbench landing page (the spirit of
    * WorkbenchServlet.java:45, not the full browser workbench): each
    * namespace's endpoints plus a query form wired to the protocol's
    * own GET binding. */
  /** The workbench query form: a namespace switcher + textarea whose
    * POST renders an HTML bindings table ([[WorkbenchHandler]]). */
  private def workbenchForm(selectedNs: String,
                            queryText: String =
                              "SELECT ?s ?p ?o WHERE { ?s ?p ?o } LIMIT 10"): String = {
    val opts = namespaces.keys.asScala.toSeq.sorted.map { ns =>
      val sel = if (ns == selectedNs) " selected" else ""
      s"""<option value="${esc(ns)}"$sel>${esc(ns)}</option>"""
    }.mkString
    s"""<form action="/workbench" method="post">
       |<label>namespace <select name="ns">$opts</select></label><br/>
       |<textarea name="query" rows="6" cols="80">${esc(queryText)}</textarea><br/>
       |<button type="submit">Run</button>
       |</form>
       |<h3>Update</h3>
       |<form action="/workbench" method="post">
       |<label>namespace <select name="ns">$opts</select></label><br/>
       |<textarea name="update" rows="4" cols="80"></textarea><br/>
       |<button type="submit">Apply</button>
       |</form>
       |<h3>New namespace</h3>
       |<form action="/namespace" method="post">
       |<input name="name" pattern="[A-Za-z0-9_-]+"/><button type="submit">Create</button>
       |</form>""".stripMargin
  }

  /** Browser result rendering beyond the landing page
    * (WorkbenchServlet.java:45 / bigdata-war-html's query view, the
    * migration-comfort slice): the workbench form POSTs here and the
    * bindings render as an HTML table under the same form (namespace
    * switcher re-targets it). Row cap 500 keeps the page bounded —
    * the protocol endpoints stream full results; ASK renders its
    * boolean as a one-cell table through the same path. */
  private object WorkbenchHandler extends HttpHandler {
    def handle(ex: HttpExchange): Unit =
      try {
        if (ex.getRequestMethod == "GET")
          respond(ex, 200, "text/html; charset=utf-8",
            s"""<!DOCTYPE html><html><head><title>graft workbench</title></head>
               |<body><h1>graft workbench</h1>${workbenchForm(defaultNamespace)}</body></html>""".stripMargin)
        else if (ex.getRequestMethod == "POST" &&
                 params(rawQuery(ex)).contains("convert")) {
          // WorkbenchServlet.java:63 ATTR_CONVERT: POST an RDF
          // document; the Content-Type picks the parser, the Accept
          // header the output serialization — format conversion as a
          // service (no store touched)
          val ext = rdfExtension(contentType(ex)).getOrElse(
            sys.error(s"Content-Type not recognized as RDF: ${contentType(ex)}"))
          val (quads, spill) = bodyQuads(ex, ext, None, "g:default")
          try {
            val accept = Option(ex.getRequestHeaders.getFirst("Accept")).getOrElse("")
            val triples = quads.select("s", "p", "o")
            val (ct, df) =
              if (accept.contains("turtle"))
                ("text/turtle", Serializer.toTurtle(triples))
              else if (accept.contains("ld+json"))
                ("application/ld+json", Serializer.toJsonLdCompact(triples))
              else if (accept.contains("n-quads"))
                ("application/n-quads", Serializer.toNQuads(quads))
              else
                ("application/n-triples", Serializer.toNTriples(triples))
            respond(ex, 200, ct,
              df.collect().map(_.getString(0)).mkString("\n"))
          } finally dropSpill(spill)
        } else {
          require(ex.getRequestMethod == "POST", "workbench requires GET or POST")
          val form = params(new String(ex.getRequestBody.readAllBytes(), "UTF-8"))
          val ns = form.get("ns").flatten.getOrElse(defaultNamespace)
          if (!namespaces.containsKey(ns)) sys.error(s"no namespace: $ns")
          val upd = form.get("update").flatten.filter(_.trim.nonEmpty)
          if (upd.isDefined) {
            // browser update form: apply through the namespace's own
            // write path, confirm with the workbench page
            inJobGroup(ns, s"WORKBENCH-UPDATE ${upd.get}") { tenant(ns).update(upd.get) }
            respond(ex, 200, "text/html; charset=utf-8",
              s"""<!DOCTYPE html><html><head><title>graft workbench</title></head><body>
                 |<h1>graft workbench</h1><p>update applied to <code>${esc(ns)}</code></p>
                 |${workbenchForm(ns)}</body></html>""".stripMargin)
          } else {
          val q = form.get("query").flatten.getOrElse(sys.error("no query or update in form"))
          // the workbench compiles with the namespace's journal in
          // scope too — bd:history works from the form like /sparql
          val t = tenant(ns)
          val df = t.journal match {
            case Some(j) => graft.sparql.HistoryService.withJournal(j)(t.current.query(q))
            case None    => t.current.query(q)
          }
          val (vars, rows) = inJobGroup(ns, s"WORKBENCH $q") {
            (df.columns.toSeq, df.limit(501).collect())
          }
          val shown = rows.take(500)
          val thead = vars.map(v => s"<th>${esc(v)}</th>").mkString
          val trs = shown.map { r =>
            vars.indices.map { i =>
              val v = if (r.isNullAt(i)) "" else String.valueOf(r.get(i))
              s"<td>${esc(v)}</td>"
            }.mkString("<tr>", "", "</tr>")
          }.mkString
          val note =
            if (rows.length > 500)
              "<p>(first 500 rows shown — the protocol endpoint streams full results)</p>"
            else ""
          respond(ex, 200, "text/html; charset=utf-8",
            s"""<!DOCTYPE html><html><head><title>graft workbench</title></head><body>
               |<h1>graft workbench</h1>${workbenchForm(ns, q)}
               |<p>${shown.length} row(s) · namespace <code>${esc(ns)}</code></p>
               |<table border="1"><thead><tr>$thead</tr></thead><tbody>$trs</tbody></table>
               |$note</body></html>""".stripMargin)
          }
        }
      } catch {
        case scala.util.control.NonFatal(e) =>
          respond(ex, 400, "text/plain", s"bad request: ${e.getMessage}")
      }
  }

  private object IndexHandler extends HttpHandler {
    def handle(ex: HttpExchange): Unit =
      try {
        if (ex.getRequestURI.getPath != "/")
          respond(ex, 404, "text/plain",
            s"no such resource: ${ex.getRequestURI.getPath}")
        else {
          val nss = namespaces.keys.asScala.toSeq.sorted.map { ns =>
            s"""<li><b>$ns</b> — <a href="/namespace/$ns/sparql">sparql</a> · """ +
              s"""<a href="/namespace/$ns/properties">properties</a></li>"""
          }.mkString
          val html =
            s"""<!DOCTYPE html><html><head><title>graft</title></head><body>
               |<h1>graft SPARQL server</h1>
               |<p><a href="/status">status</a> · default namespace: <code>$defaultNamespace</code></p>
               |<h2>Namespaces</h2><ul>$nss</ul>
               |<h2>Query</h2>
               |${workbenchForm(defaultNamespace)}
               |</body></html>""".stripMargin
          respond(ex, 200, "text/html; charset=utf-8", html)
        }
      } catch {
        case scala.util.control.NonFatal(e) =>
          respond(ex, 400, "text/plain", s"bad request: ${e.getMessage}")
      }
  }

  private object NamespaceHandler extends HttpHandler {
    def handle(ex: HttpExchange): Unit =
      try {
        val rest = ex.getRequestURI.getPath.stripPrefix("/namespace").stripPrefix("/")
        val parts = if (rest.isEmpty) Nil else rest.split("/").toList
        (parts, ex.getRequestMethod) match {
          case (Nil, "GET") =>
            // one description line per namespace, like the reference's
            // RDF answer (title + its scoped protocol endpoint)
            val lines = namespaces.keys.asScala.toSeq.sorted.map { ns =>
              s"""<$address/namespace/$ns/sparql> <http://purl.org/dc/terms/title> "$ns" ."""
            }
            respond(ex, 200, "application/n-triples", lines.mkString("\n"))
          case (Nil, "POST") =>
            val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
            val name = formParam(body, "name")
              .orElse(formParam(rawQuery(ex), "name"))
              .getOrElse(sys.error("no name in request"))
            require(name.matches("[A-Za-z0-9_-]+"), s"bad namespace name: $name")
            // computeIfAbsent decides the winner BEFORE any disk state
            // is made — no check-then-create window where a racing
            // loser leaks a freshly created journal directory; a
            // journal dir already on disk (but unattached) surfaces as
            // Journal.create's "already exists" → 409 below
            val createdNew = new java.util.concurrent.atomic.AtomicBoolean(false)
            // optional per-namespace analyzer (bds:search default);
            // persisted beside a durable journal, restart reattaches it
            val analyzer = formParam(body, "analyzer")
              .orElse(formParam(rawQuery(ex), "analyzer"))
              .filter(_.nonEmpty)
            // plain names are id-shaped; pattern:<regex> and
            // termcompletion:<subword>[:<soft>] carry their regexes
            // verbatim (any chars except newlines — the conf file is
            // one line)
            analyzer.foreach(a => require(
              a.matches("[A-Za-z0-9_-]+") ||
                ((a.toLowerCase.startsWith("pattern:") ||
                  a.toLowerCase.startsWith("termcompletion:")) &&
                  !a.exists(c => c == '\n' || c == '\r')),
              s"bad analyzer name: $a"))
            // textIndex=true: create the namespace with a MAINTAINED
            // persisted literal text index (the reference's
            // AbstractTripleStore.Options.TEXT_INDEX namespace
            // property) — journal-backed namespaces only; it lives
            // beside the journal and syncs on every commit
            val wantTextIndex = formParam(body, "textIndex")
              .orElse(formParam(rawQuery(ex), "textIndex"))
              .exists(_.toBoolean)
            require(!wantTextIndex || journalDir.isDefined,
              "textIndex=true needs a journal-backed namespace " +
                "(start the server with a journal directory)")
            // ospIndex=true: every auto-compaction also lays down the
            // object-hash twin segment, so searchInSearch hit→subject
            // joins prune to the hits' buckets (the reference keeps
            // its OSP index beside SPO/POS the same way)
            val wantOspIndex = formParam(body, "ospIndex")
              .orElse(formParam(rawQuery(ex), "ospIndex"))
              .exists(_.toBoolean)
            require(!wantOspIndex || journalDir.isDefined,
              "ospIndex=true needs a journal-backed namespace " +
                "(start the server with a journal directory)")
            // truthMaintenance=true: an INFERENCING namespace — the
            // reference's truth-maintenance namespace option (TM wired
            // into the commit path; suppressTruthMaintenance honored
            // per update request). Durable only: the maintained
            // closure IS a pair of journals.
            val wantTm = formParam(body, "truthMaintenance")
              .orElse(formParam(rawQuery(ex), "truthMaintenance"))
              .exists(_.toBoolean)
            require(!wantTm || journalDir.isDefined,
              "truthMaintenance=true needs a journal-backed namespace " +
                "(start the server with a journal directory)")
            // analyzer/textIndex compose with TM (the index maintains
            // over the CLOSED journal); the OSP twin is tied to the
            // Repository compaction machinery and stays refused
            require(!wantTm || !wantOspIndex,
              "truthMaintenance namespaces do not support ospIndex " +
                "(the object-hash twin is a Repository compaction feature)")
            try {
              namespaces.computeIfAbsent(name, { _ =>
                val t: Tenant = journalDir match {
                  case None => new MemTenant(new AtomicReference(
                    Graft.empty(spark).copy(analyzerName = analyzer)))
                  case Some(d) if wantTm =>
                    val sub = Paths.get(d).resolve(name)
                    Files.createDirectories(sub)
                    val tmStore = graft.inference.MaintainedClosure
                      .createDynamic(spark, sub.resolve("tm").toString)
                    analyzer.foreach(a =>
                      Files.writeString(sub.resolve("analyzer.conf"), a))
                    if (wantTextIndex)
                      graft.rdf.TextIndexMaintenance.create(spark,
                        sub.resolve("textindex").toString, tmStore.journals._2,
                        analyzer.getOrElse("latin"))
                    new TmTenant(tmStore, sub)
                  case Some(d) =>
                    val sub = Paths.get(d).resolve(name)
                    val repo = Repository.create(spark, sub.toString)
                    analyzer.foreach(a => Files.writeString(sub.resolve("analyzer.conf"), a))
                    if (wantTextIndex)
                      graft.rdf.TextIndexMaintenance.create(spark,
                        sub.resolve("textindex").toString, repo.journal,
                        analyzer.getOrElse("latin"))
                    if (wantOspIndex)
                      Files.writeString(sub.resolve("ospindex"), "true")
                    new DurableTenant(repo, sub)
                }
                createdNew.set(true)
                t
              })
              if (createdNew.get) respond(ex, 201, "text/plain", s"created: $name")
              else respond(ex, 409, "text/plain", s"namespace exists: $name")
            } catch {
              case e: IllegalArgumentException
                if e.getMessage != null && e.getMessage.contains("already exists") =>
                respond(ex, 409, "text/plain", s"namespace exists: $name")
            }
          case (List(ns), "DELETE") =>
            // the default namespace backs the bare /sparql alias — the
            // reference's MultiTenancyServlet protects its default KB
            // the same way
            if (ns == defaultNamespace)
              respond(ex, 403, "text/plain", s"cannot delete the default namespace: $ns")
            else {
              val t = namespaces.remove(ns)
              if (t != null) { t.destroy(); respond(ex, 200, "text/plain", s"deleted: $ns") }
              else respond(ex, 404, "text/plain", s"no namespace: $ns")
            }
          case (ns :: tail, _) =>
            if (!namespaces.containsKey(ns))
              respond(ex, 404, "text/plain", s"no namespace: $ns")
            else tail match {
              case List("sparql")           => handleQuery(ex, ns)
              case List("sparql", "update") => handleUpdate(ex, ns)
              case List("rdf-graphs")       => handleGraphStore(ex, ns)
              case List("dataloader")       => handleDataLoader(ex, ns)
              case List("blueprints")       => handleBlueprints(ex, ns)
              case List("backup")           => handleBackup(ex, ns)
              case List("properties")       =>
                // MultiTenancyServlet's properties document, as the
                // reference's java.util.Properties XML format
                val durable = journalDir.isDefined
                val isTm = tenant(ns).isInstanceOf[TmTenant]
                val props = Seq(
                  "com.bigdata.rdf.sail.namespace" -> ns,
                  "graft.quads" -> (!isTm).toString,
                  "graft.durable" -> durable.toString) ++
                  (if (isTm) Seq("graft.truthMaintenance" -> "true") else Nil) ++
                  journalDir.map(d => "graft.journal" -> s"$d/$ns") ++
                  tenant(ns).current.analyzerName.map("graft.analyzer" -> _) ++
                  (if (tenant(ns).current.textIndex.isDefined)
                     Seq("graft.textIndex" -> "true")
                   else Nil) ++
                  (if (tenant(ns).current.ospHash.isDefined)
                     Seq("graft.ospIndex" -> "current")
                   else Nil)
                val entries = props.map { case (k, v) =>
                  s"""<entry key="$k">$v</entry>""" }.mkString
                respond(ex, 200, "application/xml",
                  s"""<?xml version="1.0"?><!DOCTYPE properties SYSTEM "http://java.sun.com/dtd/properties.dtd"><properties>$entries</properties>""")
              case _ => respond(ex, 404, "text/plain", s"no such resource: $rest")
            }
          case _ => respond(ex, 405, "text/plain", "method not allowed")
        }
      } catch {
        case scala.util.control.NonFatal(e) =>
          respond(ex, 400, "text/plain", s"bad request: ${e.getMessage}")
      }
  }

  // the bare paths resolve the DEFAULT namespace per request — they
  // alias /namespace/<default>/… exactly, never a captured handle
  server.createContext("/sparql/update",
    (ex: HttpExchange) => handleUpdate(ex, defaultNamespace))
  server.createContext("/sparql",
    (ex: HttpExchange) => handleQuery(ex, defaultNamespace))
  server.createContext("/rdf-graphs",
    (ex: HttpExchange) => handleGraphStore(ex, defaultNamespace))
  server.createContext("/dataloader",
    (ex: HttpExchange) => handleDataLoader(ex, defaultNamespace))
  server.createContext("/blueprints",
    (ex: HttpExchange) => handleBlueprints(ex, defaultNamespace))
  server.createContext("/backup",
    (ex: HttpExchange) => handleBackup(ex, defaultNamespace))
  server.createContext("/namespace", NamespaceHandler)
  server.createContext("/status", StatusHandler)
  server.createContext("/whitelist", WhitelistHandler)
  server.createContext("/counters", CountersHandler)
  server.createContext("/tx", TxHandler)
  server.createContext("/workbench", WorkbenchHandler)
  server.createContext("/", IndexHandler)

  def start(): this.type = { server.start(); this }
  def stop(): Unit = {
    server.stop(0)
    // the per-instance deadline scheduler would otherwise leak one
    // daemon thread per started server (noticeable in test suites)
    deadlines.shutdownNow()
  }
}

object SparqlServer {
  /** A server whose namespaces are journal-backed [[Repository]]s
    * under `journalDir` — restart reattaches every namespace from
    * disk. `initial` seeds the default namespace's journal on FIRST
    * creation only (reattachment keeps the durable state).
    * `autoCompactEvery`: compact a namespace's journal after that
    * many uncompacted commits (bounds snapshot-resolution cost under
    * a steady REST write load; history before the latest compaction
    * stays readable until `vacuum`). */
  def durable(initial: Graft, journalDir: String, host: String = "127.0.0.1",
              port: Int = 0, defaultNamespace: String = "kb",
              autoCompactEvery: Int = 64): SparqlServer =
    new SparqlServer(initial, host, port, defaultNamespace, Some(journalDir),
      autoCompactEvery)
}
