package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.HttpServer
import org.scalatest.funsuite.AnyFunSuite
import graft.sparql.{Compiler, Parser, TripleSource}

/** Loopback tests for the external-fulltext SERVICE (fts:search) —
  * a stub HTTP server speaks the Solr select JSON shape and records
  * the request it received. */
class FtsServiceSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private lazy val trips =
    Seq(("x:a", "label", "ASIA"), ("x:b", "label", "EUROPE"),
      ("x:c", "label", "NOWHERE")).toDF("s", "p", "o")

  /** Start a stub Solr endpoint serving `body` with `status`; returns
    * (url, () => lastQueryString, stop). */
  private def stubSolr(body: String, status: Int = 200)
      : (String, () => String, () => Unit) = {
    val srv = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    @volatile var lastQuery = ""
    srv.createContext("/solr/select", { ex =>
      lastQuery = Option(ex.getRequestURI.getRawQuery).getOrElse("")
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(status, bytes.length.toLong)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    srv.start()
    (s"http://127.0.0.1:${srv.getAddress.getPort}/solr/select",
      () => lastQuery, () => srv.stop(0))
  }

  private val solrDoc =
    """{"responseHeader":{"status":0},"response":{"numFound":3,"start":0,"docs":[
      |  {"id":"ASIA","score":2.5,"snip":["large ","continent"]},
      |  {"id":"EUROPE","score":1.25,"snip":"west"},
      |  {"id":"n:7","score":0.5}
      |]}}""".stripMargin

  test("fts:search: dispatch, params, score/snippet binding, enclosing join") {
    val (url, lastQ, stop) = stubSolr(solrDoc)
    try {
      val rows = Compiler.compile(Parser.parse(
        s"""SELECT ?s ?res ?score ?snippet WHERE {
           |  ?s label ?res .
           |  SERVICE fts:search {
           |    ?res fts:search "asia continent" .
           |    ?res fts:endpoint "$url" .
           |    ?res fts:endpointType "Solr" .
           |    ?res fts:params "defType=dismax&bf=uses%5E50" .
           |    ?res fts:searchField "id" .
           |    ?res fts:scoreField "score" . ?res fts:score ?score .
           |    ?res fts:snippetField "snip" . ?res fts:snippet ?snippet .
           |  }
           |} ORDER BY ?s""".stripMargin), TripleSource.plain(trips)).collect()
      // the enclosing join keeps only the store-matched hits
      assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq ==
        Seq(("x:a", "ASIA"), ("x:b", "EUROPE")))
      assert(rows.map(_.getDouble(2)).toSeq == Seq(2.5, 1.25))
      // array-valued snippet fields flatten by concatenation
      assert(rows.map(_.getString(3)).toSeq == Seq("large continent", "west"))
      // the stub saw q, the forced JSON writer, and the params
      // (decoded then re-encoded)
      val q = lastQ()
      assert(q.contains("q=asia+continent") && q.contains("wt=json"), q)
      assert(q.contains("defType=dismax") && q.contains("bf=uses%5E50"), q)
    } finally stop()
  }

  test("fts:search: URI mode type-casts loud on non-IRI values; full service IRI routes too") {
    // all-IRI values pass through the full service IRI route
    val (url, _, stop) = stubSolr(
      """{"response":{"docs":[
        |  {"id":"http://example.org/a","score":1.0}
        |]}}""".stripMargin)
    try {
      val rows = Compiler.compile(Parser.parse(
        s"""SELECT ?res WHERE {
           |  SERVICE <http://www.bigdata.com/rdf/fts#search> {
           |    ?res fts:search "x" .
           |    ?res fts:endpoint "$url" .
           |    ?res fts:searchResultType "URI" .
           |  }
           |}""".stripMargin), TripleSource.plain(trips)).collect()
      assert(rows.map(_.getString(0)).toSeq == Seq("http://example.org/a"))
    } finally stop()
    // a non-IRI value under URI mode is the reference's
    // TYPE_CAST_EXCEPTION (FulltextSearchServiceFactory.java:558-567),
    // not a silent drop
    val (url2, _, stop2) = stubSolr(
      """{"response":{"docs":[
        |  {"id":"not an iri","score":0.5}
        |]}}""".stripMargin)
    try {
      val e = intercept[RuntimeException](Compiler.compile(Parser.parse(
        s"""SELECT ?res WHERE {
           |  SERVICE fts:search {
           |    ?res fts:search "x" .
           |    ?res fts:endpoint "$url2" .
           |    ?res fts:searchResultType "URI" .
           |  }
           |}""".stripMargin), TripleSource.plain(trips)).collect())
      assert(e.getMessage.contains("Type cast exception"), e.getMessage)
    } finally stop2()
  }

  test("fts:search failure semantics: non-200 loud, SILENT degrades, bad options loud") {
    val (url, _, stop) = stubSolr("""{"error":"boom"}""", status = 503)
    try {
      val loud = intercept[RuntimeException](Compiler.compile(Parser.parse(
        s"""SELECT ?res WHERE { SERVICE fts:search {
           |  ?res fts:search "x" . ?res fts:endpoint "$url" . } }""".stripMargin),
        TripleSource.plain(trips)))
      assert(loud.getMessage.contains("Status code != 200"), loud.getMessage)
      // SILENT absorbs the HTTP failure into the unit solution (§13.2)
      val silent = Compiler.compile(Parser.parse(
        s"""SELECT ?s WHERE { ?s label "ASIA" . SERVICE SILENT fts:search {
           |  ?res fts:search "x" . ?res fts:endpoint "$url" . } }""".stripMargin),
        TripleSource.plain(trips))
      assert(silent.collect().map(_.getString(0)).toSeq == Seq("x:a"))
    } finally stop()
    def bad(q: String): String =
      intercept[RuntimeException](Compiler.compile(Parser.parse(q),
        TripleSource.plain(trips))).getMessage
    assert(bad("""SELECT ?r WHERE { SERVICE fts:search {
      | ?r fts:serch "x" . ?r fts:endpoint "http://h" . } }""".stripMargin)
      .contains("Unknown search predicate"))
    assert(bad("""SELECT ?r WHERE { SERVICE fts:search {
      | ?r fts:search ?q . ?r fts:endpoint "http://h" . } }""".stripMargin)
      .contains("not a literal"))
    assert(bad("""SELECT ?r WHERE { SERVICE fts:search {
      | ?r fts:search "x" . ?r fts:endpoint "http://h" .
      | ?r fts:score "0.5" . } }""".stripMargin)
      .contains("must be a variable"))
    assert(bad("""SELECT ?r WHERE { SERVICE fts:search {
      | ?r fts:search "x" . } }""".stripMargin)
      .contains("fts:endpoint not specified"))
    assert(bad("""SELECT ?r WHERE { SERVICE fts:search {
      | ?r fts:search "x" . ?r fts:endpoint "http://h" .
      | ?r fts:endpointType "Elastic" . } }""".stripMargin)
      .contains("only SOLR"))
  }

  test("fts:search: classic inline magic form (no SERVICE) lifts — ASTFulltextSearchOptimizer analog") {
    val (url, _, stop) = stubSolr(solrDoc)
    try {
      val rows = Compiler.compile(Parser.parse(
        s"""SELECT ?s ?res ?score WHERE {
           |  ?s label ?res .
           |  ?res fts:search "asia continent" .
           |  ?res fts:endpoint "$url" .
           |  ?res fts:scoreField "score" .
           |  ?res fts:score ?score .
           |} ORDER BY ?s""".stripMargin), TripleSource.plain(trips)).collect()
      assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq ==
        Seq(("x:a", "ASIA"), ("x:b", "EUROPE")))
      assert(rows.map(_.getDouble(2)).toSeq == Seq(2.5, 1.25))
    } finally stop()
    // a typo'd inline fts predicate reaches the handler and errors loud
    val e = intercept[RuntimeException](Compiler.compile(Parser.parse(
      """SELECT ?r WHERE { ?r fts:serch "x" . ?r fts:endpoint "http://h" . }"""),
      TripleSource.plain(trips)))
    assert(e.getMessage.contains("Unknown search predicate"), e.getMessage)
  }

  test("fts:search: missing search field on a doc fails loud") {
    val (url, _, stop) = stubSolr("""{"response":{"docs":[{"notid":"x"}]}}""")
    try {
      val e = intercept[RuntimeException](Compiler.compile(Parser.parse(
        s"""SELECT ?res WHERE { SERVICE fts:search {
           |  ?res fts:search "x" . ?res fts:endpoint "$url" . } }""".stripMargin),
        TripleSource.plain(trips)))
      assert(e.getMessage.contains("Search field"), e.getMessage)
    } finally stop()
  }
}
