package graft.sparql

import org.apache.spark.sql.functions._

import graft.rdf.Journal

/** `SERVICE bd:history { … }` — a QUERYABLE change-log service over a
  * [[graft.rdf.Journal]]'s commit history.
  *
  * The reference default-registers `bd:history` and `bd:rdrhistory`
  * (ast/service/ServiceRegistry.java:163-176) but BOTH factories
  * throw `UnsupportedOperationException` on `create()`
  * (ast/service/history/HistoryServiceFactory.java:104,
  * bigdata-sails/…/RDRHistoryServiceFactory.java:112) — they are
  * change-CAPTURE listeners with no query side. This service supplies
  * the missing read half over the journal's per-commit delta
  * segments: each solution is one changed quad of one commit,
  * `(s, p, o, g, version, action)` with action ∈ added|removed.
  *
  * Options ride as magic-predicate patterns on one service subject
  * (the [[BuiltinServices]] convention):
  *
  *  - `bd:fromVersion "1"` — EXCLUSIVE lower commit bound (default 0
  *    = the full retained history);
  *  - `bd:toVersion "5"` — inclusive upper bound (default: head);
  *  - `bd:action "added"|"removed"` — one side only (default both);
  *  - `bd:graph "g:x"` — one named graph's changes;
  *  - `bd:outSubject/outPredicate/outObject/outGraph/outVersion/
  *    outAction ?v` — output variable names (defaults s/p/o/g/
  *    version/action).
  *
  * Plan shape: a union of the RANGE's delta segments with constant
  * version/action columns ([[Journal.changeLog]]) — delta-sized and
  * graph-partitioned (a `bd:graph` filter prunes to one partition
  * directory per segment), never a head scan. Compacted commits are
  * logical no-ops and are skipped; a partially-vacuumed range fails
  * loud rather than returning a silently-incomplete log. */
object HistoryService {

  /** `rdrOnly`: restrict the log to statement-ANNOTATION rows (the
    * subject is a statement id, [[graft.rdf.Rdr.Prefix]]) — the
    * `bd:rdrhistory` twin, the reference's SECOND registered history
    * name (RDRHistoryServiceFactory, likewise create()-throwing
    * there): what changed about statements-about-statements. */
  def handler(journal: Journal, rdrOnly: Boolean = false,
              capVersion: Option[Long] = None): ServiceRegistry.Handler =
    (inner, _) => {
    val pats = inner match {
      case Bgp(ps @ _*) => ps
      case other => sys.error(
        s"SERVICE bd:history expects a plain option group, got $other")
    }
    val known = Set("bd:fromVersion", "bd:toVersion", "bd:action", "bd:graph",
      "bd:outSubject", "bd:outPredicate", "bd:outObject", "bd:outGraph",
      "bd:outVersion", "bd:outAction")
    pats.foreach {
      case TriplePattern(_, Const(p), _) if known(p) => ()
      case other => sys.error(s"bd:history: unrecognized pattern $other " +
        s"(options: ${known.toSeq.sorted.mkString(", ")})")
    }
    def opt(name: String): Option[String] = pats.collectFirst {
      case TriplePattern(_, Const(p), Const(o)) if p == name => o
    }
    def outVar(name: String, dflt: String): String = pats.collectFirst {
      case TriplePattern(_, Const(p), Var(v)) if p == name => v
    }.getOrElse(dflt)
    val from = opt("bd:fromVersion").map(_.toLong).getOrElse(0L)
    val toAsked = opt("bd:toVersion").map(_.toLong)
    // a historical read view must not see commits after its snapshot:
    // the cap becomes the default upper bound, and asking past it is
    // loud (the journal HAS those commits — the VIEW does not)
    capVersion.foreach { cap =>
      toAsked.foreach(t => require(t <= cap,
        s"bd:toVersion $t is beyond this read view's timestamp ($cap)"))
    }
    val to = toAsked.orElse(capVersion).getOrElse(-1L)
    val logAll = journal.changeLog(from, to)
    val log0 =
      if (rdrOnly) logAll.filter(col("s").startsWith(graft.rdf.Rdr.Prefix))
      else logAll
    val log1 = opt("bd:graph").fold(log0)(g => log0.filter(col("g") === g))
    val log = opt("bd:action").fold(log1) { a =>
      require(a == "added" || a == "removed",
        s"bd:action must be 'added' or 'removed', got '$a'")
      log1.filter(col("action") === a)
    }
    log.select(
      col("s").as(outVar("bd:outSubject", "s")),
      col("p").as(outVar("bd:outPredicate", "p")),
      col("o").as(outVar("bd:outObject", "o")),
      col("g").as(outVar("bd:outGraph", "g")),
      col("version").as(outVar("bd:outVersion", "version")),
      col("action").as(outVar("bd:outAction", "action")))
  }

  // ---- registration and per-namespace scoping -----------------------
  //
  // ServiceRegistry is global but a deployment has MANY journals (one
  // per server namespace). The `bd:history` name therefore resolves
  // through two layers: a journal put in DYNAMIC scope by the party
  // evaluating the query (the protocol server wraps each namespace's
  // query compilation in [[withJournal]] — the reference scopes
  // service factories per triplestore the same way), else the
  // library-registered default. Both miss → loud.

  private sealed trait Scope
  /** No dynamic scope set: fall through to the library default. */
  private case object Unscoped extends Scope
  /** PINNED journal-less scope: a tenant with no commit log must fail
    * loud, never fall through to whatever unrelated journal some
    * embedding code registered as the process default — that would be
    * a cross-namespace history exposure. */
  private case object NoJournal extends Scope
  private final case class Scoped(j: Journal, cap: Option[Long]) extends Scope

  private val scoped = new scala.util.DynamicVariable[Scope](Unscoped)
  @volatile private var defaultJournal: Option[Journal] = None

  private lazy val installGlobal: Unit = {
    def scopedHandler(rdrOnly: Boolean): ServiceRegistry.Handler = (inner, src) =>
      (scoped.value match {
        case Scoped(j, cap) => Some((j, cap))
        case NoJournal      => sys.error(
          "SERVICE bd:history: this namespace has no commit log (not " +
            "journal-backed) — query a journal-backed namespace")
        case Unscoped       => defaultJournal.map(j => (j, Option.empty[Long]))
      }) match {
        case Some((j, cap)) => handler(j, rdrOnly, cap)(inner, src)
        case None => sys.error("SERVICE bd:history: no journal in scope — " +
          "query a journal-backed namespace, or HistoryService.register(journal)")
      }
    ServiceRegistry.register("bd:history", scopedHandler(rdrOnly = false))
    // the reference's second registered name: the statement-annotation
    // slice of the same log (both names share the journal scope)
    ServiceRegistry.register("bd:rdrhistory", scopedHandler(rdrOnly = true))
  }

  /** Evaluate `f` with `journal` answering `bd:history` — plan
    * COMPILATION must happen inside the scope (the built plan then
    * carries the journal's segment scans and needs no scope to run).
    * `capVersion`: a HISTORICAL read view (`?timestamp=v`) must not
    * see commits after its snapshot — the default toVersion becomes
    * the cap, and an explicit toVersion beyond it is loud. */
  def withJournal[T](journal: Journal, capVersion: Option[Long] = None)(f: => T): T = {
    installGlobal
    scoped.withValue(Scoped(journal, capVersion))(f)
  }

  /** Evaluate `f` with `bd:history` pinned to NO journal — the scope a
    * server puts around an in-memory (journal-less) tenant's query
    * compilation so it can never fall through to the process-global
    * default registration (an unrelated journal's history). */
  def withoutJournal[T](f: => T): T = {
    installGlobal
    scoped.withValue(NoJournal)(f)
  }

  /** Register the service for a journal (the per-namespace analog of
    * the reference's default registration — here explicit because a
    * deployment chooses WHICH journal's history a name serves). A
    * custom name binds that journal directly; the default name
    * installs it as the fallback under the scoped dispatch above. */
  def register(journal: Journal, name: String = "bd:history"): Unit =
    if (name == "bd:history" || name == "bd:rdrhistory") {
      installGlobal; defaultJournal = Some(journal)
    } else ServiceRegistry.register(name, handler(journal))

  def unregister(name: String = "bd:history"): Unit =
    if (name == "bd:history" || name == "bd:rdrhistory") defaultJournal = None
    else ServiceRegistry.unregister(name)
}
