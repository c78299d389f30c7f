package graft.server

import graft.sparql.{RemoteService, Update}
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Client-side analog of the reference's bigdata-client
  * RemoteRepository (bigdata-client/.../remote/RemoteRepository.java:
  * prepareTupleQuery / prepareUpdate / add(AddOp) / remove(RemoveOp) /
  * rangeCount / getContexts over the NanoSparqlServer protocol) —
  * the full [[SparqlServer]] surface from Scala, so a graft (or
  * Blazegraph-protocol) endpoint drives like a local [[graft.Graft]]:
  *
  *   - [[query]] / [[ask]] / [[queryGraph]] — SELECT / ASK /
  *     CONSTRUCT-DESCRIBE, results parsed back into the engine's term
  *     forms ([[graft.sparql.RemoteService.parseJsonResults]] for
  *     bindings; the distributed N-Triples loader for graphs — a big
  *     CONSTRUCT spills to disk and parses in executor tasks, not on
  *     the driver);
  *   - [[update]] — SPARQL UPDATE;
  *   - [[postData]] / [[postFile]] — RDF document ingest (the
  *     InsertServlet surface), returns the server's modified count;
  *   - [[deleteByQuery]] / [[deleteData]] — DeleteServlet;
  *   - [[estimateCardinality]] / [[contexts]] / [[statements]] —
  *     ESTCARD / CONTEXTS / GETSTMTS;
  *   - [[explain]] — the server-rendered query plan;
  *   - [[listNamespaces]] / [[createNamespace]] / [[dropNamespace]] —
  *     the MultiTenancy surface (RemoteRepositoryManager analog).
  *
  * `root` is the server address (`http://host:port`); `namespace`
  * scopes every data call to `/namespace/<ns>` (None = the server's
  * default namespace via the bare paths). JDK HttpClient, no new
  * dependency. */
final class RemoteRepository(spark: SparkSession, root: String,
                             namespace: Option[String] = None,
                             timeoutMs: Long = 60000) {

  private val base = namespace.fold(root)(ns => s"$root/namespace/$ns")
  private val http = HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofMillis(timeoutMs)).build()

  private def req(url: String): HttpRequest.Builder =
    HttpRequest.newBuilder(URI.create(url))
      .timeout(java.time.Duration.ofMillis(timeoutMs))

  private def send(b: HttpRequest.Builder, expect: Int*): HttpResponse[String] = {
    val resp = http.send(b.build(), HttpResponse.BodyHandlers.ofString())
    require(expect.contains(resp.statusCode()),
      s"remote repository: HTTP ${resp.statusCode()}: ${resp.body().take(300)}")
    resp
  }

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")

  /** Optional NT-encoded access-path terms → `s=…&p=…&o=…&c=…`. */
  private def termQuery(op: String, s: Option[String], p: Option[String],
                        o: Option[String], c: Option[String]): String =
    (Seq(op) ++ Seq("s" -> s, "p" -> p, "o" -> o, "c" -> c).collect {
      case (k, Some(v)) => s"$k=${enc(v)}"
    }).mkString("&")

  private val Modified = """modified="(\d+)"""".r.unanchored
  private val RangeCount = """rangeCount="(\d+)"""".r.unanchored

  // ---- query ------------------------------------------------------

  /** SELECT → solutions DataFrame (terms in engine encoding).
    * `timestamp` reads against a historical commit point (read-only
    * tx; journal-backed servers only). `defaultGraphUris` /
    * `namedGraphUris` supply the SPARQL 1.1 Protocol dataset
    * parameters (§2.1.4, repeatable) — the server evaluates the query
    * against THAT dataset, overriding any FROM/FROM NAMED in `q`.
    * `maxQueryMillis` sets the server-side deadline via the
    * X-BIGDATA-MAX-QUERY-MILLIS header (the reference
    * RemoteRepository's setMaxQueryMillis); the server answers 503
    * when it fires, surfaced here as a loud error. */
  def query(q: String, timestamp: Option[Long] = None,
            defaultGraphUris: Seq[String] = Nil,
            namedGraphUris: Seq[String] = Nil,
            maxQueryMillis: Long = 0L): DataFrame = {
    val qs = timestamp.map(v => s"timestamp=$v").toSeq ++
      defaultGraphUris.map(g => s"default-graph-uri=${enc(g)}") ++
      namedGraphUris.map(g => s"named-graph-uri=${enc(g)}")
    val url = s"$base/sparql" + (if (qs.isEmpty) "" else qs.mkString("?", "&", ""))
    val b = req(url)
      .header("Content-Type", "application/sparql-query")
      .header("Accept", "application/sparql-results+json")
    val withDeadline =
      if (maxQueryMillis > 0)
        b.header("X-BIGDATA-MAX-QUERY-MILLIS", maxQueryMillis.toString)
      else b
    val resp = send(withDeadline
      .POST(HttpRequest.BodyPublishers.ofString(q)), 200)
    RemoteService.parseJsonResults(spark, resp.body())
  }

  /** ASK → boolean. */
  def ask(q: String): Boolean = {
    val resp = send(req(s"$base/sparql")
      .header("Content-Type", "application/sparql-query")
      .header("Accept", "application/sparql-results+json")
      .POST(HttpRequest.BodyPublishers.ofString(q)), 200)
    resp.body().contains("\"boolean\":true")
  }

  /** CONSTRUCT / DESCRIBE → (s,p,o) DataFrame. The N-Triples response
    * STREAMS straight to a spill file (never a driver string — the
    * server chunks, the client writes as bytes arrive) and parses
    * through the distributed loader, so term decoding matches LOAD
    * exactly and an unbounded graph result never buffers anywhere. */
  def queryGraph(q: String): DataFrame = {
    val tmp = Files.createTempFile("graft_remote", ".nt")
    tmp.toFile.deleteOnExit() // consumed lazily by executor tasks
    val resp = http.send(req(s"$base/sparql")
      .header("Content-Type", "application/sparql-query")
      .header("Accept", "application/n-triples")
      .POST(HttpRequest.BodyPublishers.ofString(q)).build(),
      HttpResponse.BodyHandlers.ofFile(tmp))
    require(resp.statusCode() == 200,
      s"remote repository: HTTP ${resp.statusCode()}")
    Update.loadTriples(spark, tmp.toString)
  }

  /** The server-side formatted Spark plan for `q` (the `?explain`
    * protocol knob). */
  def explain(q: String): String =
    send(req(s"$base/sparql?explain&query=${enc(q)}").GET(), 200).body()

  // ---- mutation ---------------------------------------------------

  /** ';'-separated SPARQL UPDATE request. */
  def update(text: String): Unit = {
    send(req(s"$base/sparql/update")
      .header("Content-Type", "application/sparql-update")
      .POST(HttpRequest.BodyPublishers.ofString(text)), 204)
    ()
  }

  /** POST an RDF document body (`contentType` picks the parser, e.g.
    * `text/turtle`); returns the server's modified count. */
  def postData(body: String, contentType: String,
               graph: Option[String] = None): Long = {
    val url = s"$base/sparql" + graph.fold("")(g => s"?context-uri=${enc(g)}")
    val resp = send(req(url).header("Content-Type", contentType)
      .POST(HttpRequest.BodyPublishers.ofString(body)), 200)
    resp.body() match { case Modified(n) => n.toLong }
  }

  /** Ingest by URI (`POST /sparql?uri=file:…` — the InsertServlet
    * POST-with-URIs form): the SERVER's executors read the document
    * from shared storage, nothing tunnels through this client. */
  def postUri(uri: String, graph: Option[String] = None): Long = {
    val url = s"$base/sparql?uri=${enc(uri)}" +
      graph.fold("")(g => s"&context-uri=${enc(g)}")
    val resp = send(req(url).POST(HttpRequest.BodyPublishers.noBody()), 200)
    resp.body() match { case Modified(n) => n.toLong }
  }

  /** POST an RDF document file (content type by extension). */
  def postFile(path: String, graph: Option[String] = None): Long = {
    val ct = path.split('.').last match {
      case "ttl" => "text/turtle"
      case "nt" => "application/n-triples"
      case "nq" => "application/n-quads"
      case "trig" => "application/trig"
      case "jsonld" => "application/ld+json"
      case "rdf" | "rdfxml" | "owl" => "application/rdf+xml"
      case other => sys.error(s"unknown RDF extension: $other")
    }
    postData(Files.readString(Paths.get(path)), ct, graph)
  }

  /** DELETE the statements a CONSTRUCT/DESCRIBE query describes. */
  def deleteByQuery(constructQuery: String): Long = {
    val resp = send(req(s"$base/sparql?query=${enc(constructQuery)}")
      .DELETE(), 200)
    resp.body() match { case Modified(n) => n.toLong }
  }

  /** DELETE the statements of an RDF document body. */
  def deleteData(body: String, contentType: String): Long = {
    val resp = send(req(s"$base/sparql")
      .header("Content-Type", contentType)
      .method("DELETE", HttpRequest.BodyPublishers.ofString(body)), 200)
    resp.body() match { case Modified(n) => n.toLong }
  }

  // ---- metadata ---------------------------------------------------

  /** Fast range count of the access path (ESTCARD). Terms are
    * NT-encoded (`<iri>`, `"lit"`). */
  def estimateCardinality(s: Option[String] = None, p: Option[String] = None,
                          o: Option[String] = None,
                          c: Option[String] = None): Long = {
    val resp = send(req(s"$base/sparql?" + termQuery("ESTCARD", s, p, o, c)).GET(), 200)
    resp.body() match { case RangeCount(n) => n.toLong }
  }

  /** The store's named graphs (CONTEXTS). */
  def contexts(): Seq[String] = {
    val body = send(req(s"$base/sparql?CONTEXTS").GET(), 200).body()
    """uri="([^"]*)"""".r.findAllMatchIn(body).map(_.group(1)).toSeq
  }

  /** Matching statements as an (s,p,o,g) DataFrame (GETSTMTS),
    * stream-spilled and parsed like [[queryGraph]]. */
  def statements(s: Option[String] = None, p: Option[String] = None,
                 o: Option[String] = None, c: Option[String] = None): DataFrame = {
    val tmp = Files.createTempFile("graft_remote", ".nq")
    tmp.toFile.deleteOnExit() // consumed lazily by executor tasks
    val resp = http.send(
      req(s"$base/sparql?" + termQuery("GETSTMTS", s, p, o, c)).GET().build(),
      HttpResponse.BodyHandlers.ofFile(tmp))
    require(resp.statusCode() == 200,
      s"remote repository: HTTP ${resp.statusCode()}")
    Update.loadQuads(spark, tmp.toString)
  }

  // ---- Graph Store Protocol ---------------------------------------

  private def gspUrl(graph: Option[String]): String =
    s"$base/rdf-graphs?" + graph.fold("default")(g => s"graph=${enc(g)}")

  /** GSP GET: one graph as an (s,p,o) DataFrame (None = default
    * graph), stream-spilled like [[queryGraph]]. */
  def getGraph(graph: Option[String] = None): DataFrame = {
    val tmp = Files.createTempFile("graft_remote", ".nt")
    tmp.toFile.deleteOnExit() // consumed lazily by executor tasks
    val resp = http.send(req(gspUrl(graph)).GET().build(),
      HttpResponse.BodyHandlers.ofFile(tmp))
    require(resp.statusCode() == 200,
      s"remote repository: HTTP ${resp.statusCode()}")
    Update.loadTriples(spark, tmp.toString)
  }

  /** GSP PUT: replace a graph with the document body. */
  def putGraph(body: String, contentType: String,
               graph: Option[String] = None): Unit = {
    send(req(gspUrl(graph)).header("Content-Type", contentType)
      .PUT(HttpRequest.BodyPublishers.ofString(body)), 204)
    ()
  }

  /** GSP POST: merge the document body into a graph. */
  def mergeGraph(body: String, contentType: String,
                 graph: Option[String] = None): Long = {
    val resp = send(req(gspUrl(graph)).header("Content-Type", contentType)
      .POST(HttpRequest.BodyPublishers.ofString(body)), 200)
    resp.body() match { case Modified(n) => n.toLong }
  }

  /** GSP DELETE: drop a graph. */
  def dropGraph(graph: Option[String] = None): Unit = {
    send(req(gspUrl(graph)).DELETE(), 204)
    ()
  }

  // ---- management (RemoteRepositoryManager analog) ----------------

  /** Live namespaces on the server. */
  def listNamespaces(): Seq[String] = {
    val body = send(req(s"$root/namespace").GET(), 200).body()
    """/namespace/([^/]+)/sparql>""".r.findAllMatchIn(body).map(_.group(1)).toSeq
  }

  /** Create a namespace; fails loud on 409. */
  /** Create a namespace. `options` are the server's creation knobs
    * (`analyzer`, `textIndex`, `ospIndex`, `truthMaintenance` — the
    * reference's namespace properties document analog), form-encoded
    * alongside the name. */
  def createNamespace(name: String,
                      options: Map[String, String] = Map.empty): Unit = {
    val form = (("name" -> name) +: options.toSeq)
      .map { case (k, v) => s"${enc(k)}=${enc(v)}" }.mkString("&")
    send(req(s"$root/namespace")
      .header("Content-Type", "application/x-www-form-urlencoded")
      .POST(HttpRequest.BodyPublishers.ofString(form)), 201)
    ()
  }

  /** Drop a namespace (the server refuses for its default KB). */
  def dropNamespace(name: String): Unit = {
    send(req(s"$root/namespace/${enc(name)}").DELETE(), 200)
    ()
  }

  /** A copy of this client scoped to `ns`. */
  def forNamespace(ns: String): RemoteRepository =
    new RemoteRepository(spark, root, Some(ns), timeoutMs)

  /** Running queries (`GET /status`), one line per query. */
  def status(): String =
    send(req(s"$root/status").GET(), 200).body()

  /** Cancel a running query by UUID (cluster-wide job-group cancel). */
  def cancelQuery(queryId: String): Unit = {
    send(req(s"$root/status?cancelQuery&queryId=${enc(queryId)}").GET(), 200)
    ()
  }
}
