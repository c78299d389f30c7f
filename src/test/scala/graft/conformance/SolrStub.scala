package graft.conformance

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** Loopback Solr `select` stub serving the reference's fts test
  * collection — the corpus' `fts-*` cases dial a live Solr at
  * `http://localhost:8983/solr/solrtest/select` that the reference
  * suite requires as external setup (TestFulltextSearch.java:30-35
  * points at /src/build/solr); this stub binds that address and
  * answers from the SAME collection, read IN PLACE from the reference
  * checkout (fts-solr-collection.xml, 5 docs — external test data,
  * nothing copied into this repo, the [[W3c]] discipline).
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

  private val CollectionXml = W3c.EvalDir + "/fts-solr-collection.xml"

  /** field name → value, one map per <doc>. */
  lazy val collection: Seq[Map[String, String]] = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    f.setFeature(javax.xml.XMLConstants.FEATURE_SECURE_PROCESSING, true)
    val doc = f.newDocumentBuilder().parse(new java.io.File(CollectionXml))
    val docs = doc.getElementsByTagName("doc")
    (0 until docs.getLength).map { i =>
      val fields = docs.item(i).asInstanceOf[org.w3c.dom.Element]
        .getElementsByTagName("field")
      (0 until fields.getLength).map { j =>
        val e = fields.item(j).asInstanceOf[org.w3c.dom.Element]
        e.getAttribute("name") -> e.getTextContent
      }.toMap
    }
  }

  /** Recorded live-Solr scores for the scored corpus case, keyed by
    * (query, doc id) — fts-singleMax.srx's expected figures. */
  val Scores: Map[(String, String), Double] = Map(
    ("metaphacts | SYSTAP", "metaphacts") -> 0.29942045,
    ("metaphacts | SYSTAP", "SYSTAP") -> 0.23953636)

  private def tokens(s: String): Set[String] =
    s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSet

  private[conformance] def hits(q: String): Seq[Map[String, String]] = {
    val qs = tokens(q)
    collection.filter(d => qs.exists(d.values.flatMap(tokens).toSet))
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
      val score = Scores.getOrElse((q, d.getOrElse("id", "")), 0.5)
      (d.toSeq.sortBy(_._1).map { case (k, v) =>
        s""""${jsonEsc(k)}":"${jsonEsc(v)}"""" } :+ s""""score":$score""")
        .mkString("{", ",", "}")
    }
    s"""{"responseHeader":{"status":0},""" +
      s""""response":{"numFound":${ds.size},"start":0,"docs":[${ds.mkString(",")}]}}"""
  }

  @volatile private var server: HttpServer = null

  def start(port: Int = 8983): Unit = synchronized {
    if (server != null || !W3c.available) return
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
