package graft.sparql

import org.apache.spark.sql.DataFrame
import scala.collection.concurrent.TrieMap

/** SPARQL SERVICE federation — the reference's pluggable service
  * registry (ast/service/ServiceRegistry.java:67 maps a service IRI to
  * a ServiceFactory; unknown IRIs fall back to a remote HTTP call via
  * RemoteServiceCallImpl).
  *
  * Spark-native shape: a handler receives the SERVICE group's algebra
  * and returns its solution DataFrame; the compiler joins it into the
  * enclosing group on shared variables like any other operand. The
  * in-sandbox handlers are local (a handler backed by another triple
  * source — federation across stores in one cluster); a production
  * deployment registers a remote handler at exactly this seam, which
  * serializes the inner group back to SPARQL text, POSTs it to the
  * endpoint, and returns the result rows as a DataFrame (the
  * RemoteServiceCallImpl analog — not implementable here: no egress).
  * The magic services (gas:service, bds:search, geo:search) stay
  * first-class algebra nodes, mirroring the reference's built-in
  * factories.
  */
object ServiceRegistry {

  /** endpoint handler: (inner SERVICE group, enclosing source) → rows. */
  type Handler = (Algebra, TripleSource) => DataFrame

  private val handlers = TrieMap.empty[String, Handler]

  def register(endpoint: String, h: Handler): Unit = handlers.put(endpoint, h)

  def unregister(endpoint: String): Unit = handlers.remove(endpoint)

  def lookup(endpoint: String): Option[Handler] = handlers.get(endpoint)

  // ---- whitelist -----------------------------------------------------
  //
  // The reference's registry can refuse non-whitelisted SERVICE
  // endpoints (ast/service/ServiceRegistry.java:354-381 + the get()
  // check at :416: "Service URI ... is not allowed") — the security
  // knob a production federation turns on so a query cannot ship
  // bindings to an arbitrary URL. Same shape here: when enabled,
  // EVERY registry-resolved service IRI (local handler, remote
  // endpoint, and each binding of a variable endpoint) must be on the
  // list. The refusal is LOUD even under SERVICE SILENT — SILENT
  // masks evaluation failures, not policy (a silently-degraded
  // exfiltration attempt would be invisible to the operator).

  @volatile private var whitelistEnabled = false
  private val whitelist = TrieMap.empty[String, Unit]

  /** Enable/disable whitelisting, REPLACING the allowed set (the
    * config-file shape: one call per (re)load). */
  def setWhitelist(enabled: Boolean, uris: Iterable[String] = Nil): Unit = {
    whitelist.clear()
    uris.foreach(u => whitelist.put(u, ()))
    whitelistEnabled = enabled
  }

  def addToWhitelist(uri: String): Unit = whitelist.put(uri, ())

  def removeFromWhitelist(uri: String): Unit = whitelist.remove(uri)

  def isWhitelistEnabled: Boolean = whitelistEnabled

  def whitelisted: Seq[String] = whitelist.keys.toSeq.sorted

  /** Refuse a non-whitelisted service IRI loud (no-op while
    * whitelisting is disabled). Called at every resolution seam: the
    * compiler's SERVICE dispatch and the vectored remote join — the
    * variable-endpoint form resolves per BINDING, so each branch
    * passes through here with its concrete IRI. */
  def checkAllowed(endpoint: String): Unit =
    if (whitelistEnabled && !whitelist.contains(endpoint))
      throw new IllegalArgumentException(
        s"Service URI <$endpoint> is not allowed (SERVICE whitelist " +
          "enabled — ServiceRegistry.setWhitelist/addToWhitelist, or the " +
          "server's /whitelist endpoint)")

  /** Handler backed by a local (s,p,o) store: the SERVICE group is
    * compiled against it — a "federated endpoint" that happens to live
    * in the same cluster. */
  def localSource(triples: => DataFrame): Handler =
    (inner, _) => Compiler.compile(inner, TripleSource.plain(triples))

  // ---- remote (text-serializing) endpoints --------------------------

  /** Remote-endpoint handler: receives the SERVICE group's ORIGINAL
    * SPARQL TEXT (braces included — embed as `SELECT * WHERE <text>`)
    * and returns the endpoint's solutions. This is the serialization
    * half of the reference's RemoteServiceCallImpl (which re-renders
    * the service group to SPARQL and POSTs it); a production handler
    * wraps an HTTP client around exactly this signature — the
    * transport is the only piece the sandbox leaves out (no egress).
    * Parsed queries carry the text automatically
    * ([[ServiceCall.srcText]]); hand-built ASTs without text cannot be
    * remoted and fail loud. */
  type RemoteHandler = String => DataFrame

  private val remotes = TrieMap.empty[String, RemoteHandler]

  def registerRemote(endpoint: String, h: RemoteHandler): Unit = remotes.put(endpoint, h)

  def unregisterRemote(endpoint: String): Unit = remotes.remove(endpoint)

  def lookupRemote(endpoint: String): Option[RemoteHandler] = remotes.get(endpoint)

  // built-in magic services (searchInSearch / slice / sample) register
  // through the same seam user endpoints use — the reference wires its
  // ServiceFactory instances into the registry the same way
  // (ServiceRegistry.java static init). Runs after `handlers` above.
  BuiltinServices.all.foreach { case (name, h) => register(name, h) }
}
