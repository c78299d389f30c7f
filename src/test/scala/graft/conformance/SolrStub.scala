package graft.conformance

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** Loopback Solr `select` stub serving the reference's fts test
  * collection — the corpus' `fts-*` cases dial a live Solr at
  * `http://localhost:8983/solr/solrtest/select` that the reference
  * suite requires as external setup (TestFulltextSearch.java:30-35
  * points at /src/build/solr); this stub binds that address and
  * answers from the SAME collection
  * (bigdata-rdf-test/.../eval/fts-solr-collection.xml, 5 docs).
  *
  * Matching is lowercase-token OR over all field values (the corpus
  * queries are single keywords or `a | b` disjunctions against a
  * 5-doc collection — every expected hit set is reproduced exactly by
  * token containment). Scores are REPLAYED from the recorded live-Solr
  * figures the suite's expected results were captured against
  * (fts-singleMax.srx) — a stub cannot re-derive Solr's internal
  * ranking arithmetic, and only that one case reads scores.
  */
object SolrStub {

  final case class Doc(id: String, uri: String, fullName: String,
                       description: String)

  /** fts-solr-collection.xml verbatim. */
  val Collection: Seq[Doc] = Seq(
    Doc("SYSTAP", "http://example.com/SYSTAP", "SYSTAP, LLC",
      "SYSTAP is a company providing ultra high-performance graph databases"),
    Doc("metaphacts", "http://example.com/metaphacts", "metaphacts GmbH",
      "Metaphacts is a company providing knowledge graph solutions"),
    Doc("SAP", "http://example.com/SAP", "SAP AG",
      "The SAP company is a market leader in IT enterprise software"),
    Doc("Siemens", "http://example.com/Siemens", "Siemens AG",
      "The Siemens company is a market leader in the energy domain and beyond"),
    Doc("Apple", "http://example.com/Apple", "Apple Inc",
      "The Apple company delivers innovative software and hardware in the IT and communication domain"))

  /** Recorded live-Solr scores for the scored corpus case, keyed by
    * (query, doc id). */
  val Scores: Map[(String, String), Double] = Map(
    ("metaphacts | SYSTAP", "metaphacts") -> 0.29942045,
    ("metaphacts | SYSTAP", "SYSTAP") -> 0.23953636)

  private def tokens(s: String): Set[String] =
    s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSet

  private def docTokens(d: Doc): Set[String] =
    tokens(d.id) ++ tokens(d.uri) ++ tokens(d.fullName) ++ tokens(d.description)

  private[conformance] def hits(q: String): Seq[Doc] = {
    val qs = tokens(q)
    Collection.filter(d => qs.exists(docTokens(d)))
  }

  private def jsonEsc(s: String): String =
    s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => "\\u%04x".format(c.toInt)
      case c    => c.toString
    }

  private[conformance] def responseFor(q: String): String = {
    val ds = hits(q).map { d =>
      val score = Scores.getOrElse((q, d.id), 0.5)
      s"""{"id":"${jsonEsc(d.id)}","uri":"${jsonEsc(d.uri)}",""" +
        s""""fullName":"${jsonEsc(d.fullName)}",""" +
        s""""description":"${jsonEsc(d.description)}","score":$score}"""
    }
    s"""{"responseHeader":{"status":0},""" +
      s""""response":{"numFound":${ds.size},"start":0,"docs":[${ds.mkString(",")}]}}"""
  }

  @volatile private var server: HttpServer = null

  def start(port: Int = 8983): Unit = synchronized {
    if (server != null) return
    val s = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    s.createContext("/solr/solrtest/select", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        val q = Option(ex.getRequestURI.getRawQuery).getOrElse("")
          .split("&").collectFirst {
            case kv if kv.startsWith("q=") =>
              java.net.URLDecoder.decode(kv.drop(2), "UTF-8")
          }.getOrElse("")
        val body = responseFor(q).getBytes(StandardCharsets.UTF_8)
        ex.getResponseHeaders.set("Content-Type", "application/json")
        ex.sendResponseHeaders(200, body.length.toLong)
        ex.getResponseBody.write(body)
        ex.close()
      }
    })
    s.start()
    server = s
  }

  def stop(): Unit = synchronized {
    if (server != null) { server.stop(0); server = null }
  }
}
