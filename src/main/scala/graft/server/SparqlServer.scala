package graft.server

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.Graft
import graft.rdf.Serializer
import graft.sparql.{Algebra, Ask, Parser}
import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicReference

/** Minimal SPARQL 1.1 Protocol endpoint over a [[graft.Graft]] handle —
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
  * Serving is driver-side by nature — the protocol buffers one HTTP
  * response per request; the four results serializers themselves stay
  * distributed up to the final collect, and a 100-TB RESULT does not
  * belong on a protocol endpoint (export paths write files instead).
  * [[graft.sparql.RemoteService]] speaks this protocol back, so two
  * graft clusters federate over SERVICE with no extra glue
  * (integration-tested: server ↔ RemoteService round-trip). */
final class SparqlServer(initial: Graft, host: String = "127.0.0.1", port: Int = 0) {

  private val ref = new AtomicReference[Graft](initial)
  private val server = HttpServer.create(new InetSocketAddress(host, port), 0)

  /** The current (latest-updated) handle. */
  def current: Graft = ref.get()

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

  private object QueryHandler extends HttpHandler {
    def handle(ex: HttpExchange): Unit =
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
  }

  /** CONSTRUCT and the DESCRIBE family produce triple-shaped output. */
  private def isGraphResult(ast: Algebra): Boolean = ast match {
    case _: graft.sparql.Construct | _: graft.sparql.Describe |
         _: graft.sparql.DescribeWhere => true
    case _ => false
  }

  private object UpdateHandler extends HttpHandler {
    def handle(ex: HttpExchange): Unit =
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
  }

  server.createContext("/sparql/update", UpdateHandler)
  server.createContext("/sparql", QueryHandler)

  def start(): this.type = { server.start(); this }
  def stop(): Unit = server.stop(0)
}
