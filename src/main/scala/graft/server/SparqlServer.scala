package graft.server

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.Graft
import graft.rdf.Serializer
import graft.sparql.{Algebra, Ask, Parser}
import java.net.InetSocketAddress
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicReference

/** Minimal SPARQL 1.1 Protocol endpoint over [[graft.Graft]] handles —
  * the NanoSparqlServer analog (bigdata-core/bigdata-sails/.../webapp/
  * NanoSparqlServer.java: query + update servlets over a repository
  * connection). JDK HttpServer, no new dependency.
  *
  *   - `POST /sparql` with `application/sparql-query` (or
  *     `GET /sparql?query=…`): SELECT renders by Accept —
  *     `application/sparql-results+json` (default) / `+xml` /
  *     `text/csv` / `text/tab-separated-values`; ASK renders the
  *     boolean document (JSON/XML); CONSTRUCT / DESCRIBE render
  *     N-Triples (`application/n-triples`).
  *   - `POST /sparql/update` with `application/sparql-update`:
  *     applies the ';'-separated request to the handle (functional
  *     swap on an AtomicReference) and returns 204.
  *
  * MULTI-TENANCY (the reference's MultiTenancyServlet — one server,
  * many isolated knowledge bases, each a namespace):
  *
  *   - `GET /namespace` — one N-Triples description line per live
  *     namespace (the reference answers RDF here too);
  *   - `POST /namespace` with `name=…` — create an empty namespace
  *     (409 if it exists);
  *   - `DELETE /namespace/<ns>` — drop it (404 if absent);
  *   - `/namespace/<ns>/sparql` and `/namespace/<ns>/sparql/update` —
  *     the full protocol surface, scoped to that namespace's handle.
  *
  * The bare `/sparql` paths alias the DEFAULT namespace (`kb`, the
  * reference's default), which always exists.
  *
  * Serving is driver-side by nature — the protocol buffers one HTTP
  * response per request; the four results serializers themselves stay
  * distributed up to the final collect, and a 100-TB RESULT does not
  * belong on a protocol endpoint (export paths write files instead).
  * [[graft.sparql.RemoteService]] speaks this protocol back, so two
  * graft clusters federate over SERVICE with no extra glue
  * (integration-tested: server ↔ RemoteService round-trip). */
final class SparqlServer(initial: Graft, host: String = "127.0.0.1", port: Int = 0,
                         defaultNamespace: String = "kb") {

  private val namespaces = new ConcurrentHashMap[String, AtomicReference[Graft]]()
  namespaces.put(defaultNamespace, new AtomicReference[Graft](initial))
  private val server = HttpServer.create(new InetSocketAddress(host, port), 0)

  /** The current (latest-updated) handle of a namespace (default: the
    * default namespace). */
  def current(ns: String = defaultNamespace): Graft = {
    val ref = namespaces.get(ns)
    require(ref != null, s"no namespace $ns")
    ref.get()
  }

  /** `http://host:port` of the bound socket (port 0 = OS-assigned). */
  def address: String =
    s"http://${server.getAddress.getHostString}:${server.getAddress.getPort}"

  private def respond(ex: HttpExchange, status: Int, contentType: String,
                      body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.getResponseHeaders.add("Content-Type", contentType)
    ex.sendResponseHeaders(status, if (bytes.isEmpty) -1L else bytes.length.toLong)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
    ex.close()
  }

  /** `query=`/`update=` from a URL-encoded form or query string. */
  private def formParam(s: String, key: String): Option[String] =
    s.split('&').collectFirst {
      case kv if kv.startsWith(key + "=") =>
        java.net.URLDecoder.decode(kv.drop(key.length + 1), "UTF-8")
    }

  private def queryText(ex: HttpExchange): Option[String] = {
    val ct = Option(ex.getRequestHeaders.getFirst("Content-Type")).getOrElse("")
    if (ex.getRequestMethod == "GET")
      Option(ex.getRequestURI.getRawQuery).flatMap(formParam(_, "query"))
    else {
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      if (ct.startsWith("application/x-www-form-urlencoded")) formParam(body, "query")
      else Some(body) // application/sparql-query (and permissive default)
    }
  }

  private def handleQuery(ex: HttpExchange, ref: AtomicReference[Graft]): Unit =
    try {
      val q = queryText(ex).getOrElse(sys.error("no query in request"))
      val accept = Option(ex.getRequestHeaders.getFirst("Accept")).getOrElse("")
      val g = ref.get()
      val ast = Parser.parse(q)
      val df = g.query(q)
      ast match {
        case _: Ask =>
          val b = df.collect().head.getBoolean(0)
          if (accept.contains("xml"))
            respond(ex, 200, "application/sparql-results+xml", Serializer.sparqlAskXml(b))
          else respond(ex, 200, "application/sparql-results+json", Serializer.sparqlAskJson(b))
        case _ if isGraphResult(ast) =>
          val lines = Serializer.toNTriples(df).collect().map(_.getString(0))
          respond(ex, 200, "application/n-triples", lines.mkString("\n"))
        case _ =>
          val vars = df.columns.toSeq
          if (accept.contains("csv")) {
            val rows = Serializer.sparqlCsvRows(df).collect().map(_.getString(0))
            respond(ex, 200, "text/csv",
              (vars.mkString(",") +: rows).mkString("\r\n"))
          } else if (accept.contains("tab-separated")) {
            val rows = Serializer.sparqlTsvRows(df).collect().map(_.getString(0))
            respond(ex, 200, "text/tab-separated-values",
              (vars.map("?" + _).mkString("\t") +: rows).mkString("\n"))
          } else if (accept.contains("xml")) {
            val rows = Serializer.sparqlXmlResults(df).collect().map(_.getString(0))
            respond(ex, 200, "application/sparql-results+xml",
              Serializer.sparqlXmlHead(vars) + rows.mkString + Serializer.sparqlXmlFoot)
          } else {
            val rows = Serializer.sparqlJsonBindings(df).collect().map(_.getString(0))
            respond(ex, 200, "application/sparql-results+json",
              Serializer.sparqlJsonHead(vars) + rows.mkString(",") + Serializer.sparqlJsonFoot)
          }
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        respond(ex, 400, "text/plain", s"bad request: ${e.getMessage}")
    }

  /** CONSTRUCT and the DESCRIBE family produce triple-shaped output. */
  private def isGraphResult(ast: Algebra): Boolean = ast match {
    case _: graft.sparql.Construct | _: graft.sparql.Describe |
         _: graft.sparql.DescribeWhere => true
    case _ => false
  }

  private def handleUpdate(ex: HttpExchange, ref: AtomicReference[Graft]): Unit =
    try {
      val ct = Option(ex.getRequestHeaders.getFirst("Content-Type")).getOrElse("")
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      val text =
        if (ct.startsWith("application/x-www-form-urlencoded"))
          formParam(body, "update").getOrElse(sys.error("no update in form"))
        else body // application/sparql-update
      ref.updateAndGet(g => g.update(text))
      respond(ex, 204, "text/plain", "")
    } catch {
      case scala.util.control.NonFatal(e) =>
        respond(ex, 400, "text/plain", s"bad request: ${e.getMessage}")
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
            val lines = {
              import scala.jdk.CollectionConverters._
              namespaces.keys.asScala.toSeq.sorted.map { ns =>
                s"""<$address/namespace/$ns/sparql> <http://purl.org/dc/terms/title> "$ns" ."""
              }
            }
            respond(ex, 200, "application/n-triples", lines.mkString("\n"))
          case (Nil, "POST") =>
            val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
            val name = formParam(body, "name")
              .orElse(Option(ex.getRequestURI.getRawQuery).flatMap(formParam(_, "name")))
              .getOrElse(sys.error("no name in request"))
            require(name.matches("[A-Za-z0-9_-]+"), s"bad namespace name: $name")
            val fresh = new AtomicReference[Graft](Graft.empty(initial.spark))
            if (namespaces.putIfAbsent(name, fresh) != null)
              respond(ex, 409, "text/plain", s"namespace exists: $name")
            else respond(ex, 201, "text/plain", s"created: $name")
          case (List(ns), "DELETE") =>
            if (namespaces.remove(ns) != null) respond(ex, 200, "text/plain", s"deleted: $ns")
            else respond(ex, 404, "text/plain", s"no namespace: $ns")
          case (ns :: tail, _) =>
            val ref = namespaces.get(ns)
            if (ref == null) respond(ex, 404, "text/plain", s"no namespace: $ns")
            else tail match {
              case List("sparql")           => handleQuery(ex, ref)
              case List("sparql", "update") => handleUpdate(ex, ref)
              case _ => respond(ex, 404, "text/plain", s"no such resource: $rest")
            }
          case _ => respond(ex, 405, "text/plain", "method not allowed")
        }
      } catch {
        case scala.util.control.NonFatal(e) =>
          respond(ex, 400, "text/plain", s"bad request: ${e.getMessage}")
      }
  }

  private val defaultRef = namespaces.get(defaultNamespace)
  server.createContext("/sparql/update",
    (ex: HttpExchange) => handleUpdate(ex, defaultRef))
  server.createContext("/sparql",
    (ex: HttpExchange) => handleQuery(ex, defaultRef))
  server.createContext("/namespace", NamespaceHandler)

  def start(): this.type = { server.start(); this }
  def stop(): Unit = server.stop(0)
}
