package graft.conformance

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** External conformance: the reference's data-driven SPARQL eval corpus
  * (query + data + expected-results files in the W3C test-suite shape,
  * many of them imported there from the W3C/Sesame suites) replayed
  * against this engine through the public `Graft.query` surface.
  *
  * EVERY complete case in the corpus runs — there is no pass-list to
  * go stale. A case is either green, an EXPECTED ERROR (negative tests
  * whose reference twin also asserts rejection), or an EXCLUSION with
  * a documented decision below. An exclusion name that stops matching
  * a corpus file fails the bookkeeping test at the bottom.
  *
  * Documented DECISIONS (deviations from the reference's expected
  * output, each deliberate):
  *
  *  - STRING-LEXICON CONFLATION (`sparql11-sum-03`, `ast_04`,
  *    `ticket_bg2082`, `aggregate-divide`): the one-string-column
  *    lexicon stores plain literals bare, so a quoted numeral equals
  *    the number ("1" = 1), a STR() result whose text is scheme-shaped
  *    is indistinguishable from an IRI, and `?_`-prefixed user
  *    variables collide with parser-synthesized columns. The same
  *    trade the driver's DuckDB oracle gate made; SURVEY §3.
  *  - BIND SCOPE (`bindingsWithSubquery03a/03b/05`,
  *    `simpleBindingsOptimizer_02`): a BIND expression sees only the
  *    variables bound BEFORE it in its group (§ Notes on BIND scope);
  *    the reference's bindings optimizer reorders the assignment
  *    after later patterns, changing results. We follow the spec.
  *  - LIMIT WITHOUT ORDER (`ticket_944`): which single row a
  *    sub-SELECT LIMIT 1 keeps is implementation-defined; the
  *    reference's pick differs from this engine's.
  *  - SEARCH SCORE ARITHMETIC (`search-2`): relevance implements the
  *    reference's documented formula (TermFrequencyData.normalize —
  *    L2-normalized term-frequency cosine; `search-1`/`search-3` and
  *    the SERVICE form agree on it), but this case's expected scores
  *    (0.44/0.35) do not follow from that formula (0.5/0.41).
  *  - PROPERTY-PATH ALP (`property-paths-2`, `property-paths-7`): the
  *    reference's expected sets omit genuine path solutions (e.g. a
  *    plain one-step `rdfs:subClassOf` hop from os:ClassE to
  *    os:ClassX in pp-2); we return the §18.4 ALP/ZeroLengthPath
  *    answer, a superset of the reference's.
  *  - SUBQUERY-IN-GRAPH SCOPE (`ticket-1892-additional2`): whether a
  *    sub-SELECT inside `GRAPH ?g` inherits the active graph is a
  *    known spec ambiguity; this engine scopes the subquery's
  *    patterns to the active graph (5 of the 6 ticket-1892 cases are
  *    insensitive to the choice and pass), the reference evaluates
  *    them against the default graph.
  *
  * ENVIRONMENT EXCLUSIONS (not deviations): cases whose reference
  * twin runs against in-process mocks or live endpoints the corpus
  * does not ship — remote SERVICE mocks, external Solr-style fts
  * endpoints, harness-supplied named solution sets. The engine's own
  * federation/INCLUDE surfaces are covered by ParserSpec (live
  * loopback HTTP SERVICE) and the driver's `sparql_named_subquery`.
  */
class W3cConformanceSpec extends AnyFunSuite with BeforeAndAfterAll {
  import org.apache.spark.sql.functions._
  import graft.sparql.RdfLiteral

  /** Deviations — documented in the scaladoc above. */
  private val Deviations: Map[String, String] = Map(
    "sparql11-sum-03" -> "string-lexicon conflation (quoted numeral = number)",
    "ast_04" -> "string-lexicon conflation (scheme-shaped STR result reads as IRI)",
    "ticket_bg2082" -> "string-lexicon conflation (scheme-shaped STRAFTER result)",
    "aggregate-divide" -> "reserved ?_ variable prefix (parser-synthesized column space)",
    "bindingsWithSubquery03a" -> "spec BIND scope (reference reorders the assignment)",
    "bindingsWithSubquery03b" -> "spec BIND scope (reference reorders the assignment)",
    "bindingsWithSubquery05" -> "spec BIND scope (reference reorders the assignment)",
    "simpleBindingsOptimizer_02" -> "spec BIND scope (reference reorders the assignment)",
    "ticket_944" -> "LIMIT without ORDER BY is implementation-defined",
    "search-2" -> "expected scores deviate from the reference's own documented formula",
    "property-paths-2" -> "W3C ALP answer is a superset of the reference's expected set",
    "property-paths-7" -> "W3C ALP answer (unbound path endpoint) differs",
    "ticket-1892-additional2" -> "subquery-in-GRAPH active-graph inheritance ambiguity")

  /** Environment exclusions — the reference twin needs mocks/endpoints
    * the corpus does not ship. */
  private val Environment: Map[String, String] = Map(
    "query-hints-08" -> "remote SERVICE mock", "query-hints-08b" -> "remote SERVICE mock",
    "query-hints-09" -> "remote SERVICE mock", "query-hints-10" -> "remote SERVICE mock",
    "sparql11-service-001" -> "remote SERVICE mock",
    "sparql11-service-002" -> "remote SERVICE mock",
    "stored-query-001" -> "stored-query service registration",
    "ticket_bg1817" -> "wikibase label service (remote)",
    "include_01" -> "harness-supplied named solution set",
    "include_02" -> "harness-supplied named solution set",
    "include_03" -> "harness-supplied named solution set",
    "ticket_bg1763b" -> "harness-supplied named solution set",
    "fts-filter" -> "live external fts endpoint",
    "fts-join" -> "live external fts endpoint",
    "fts-singleAsService" -> "live external fts endpoint",
    "fts-singleMax" -> "live external fts endpoint",
    "fts-singleMin" -> "live external fts endpoint",
    "fts-typeCastException" -> "live external fts endpoint",
    "fts-complexWithQuery" -> "live external fts endpoint (variable query injection)",
    "fts-multiRequest" -> "live external fts endpoint (variable query injection)")

  /** Negative cases: the reference twin ALSO asserts rejection — a
    * loud engine error IS the pass. */
  private val ExpectError: Set[String] = Set(
    "fts-rejectNoEndpoint", "fts-rejectEmptyEndpoint",
    "fts-rejectNoSearchString", "fts-rejectEmptySearchString",
    "fts-variableInjectionFailing")

  override def beforeAll(): Unit = {
    // the corpus' custom-function cases register their functions in
    // the reference harness (TestCustomFunction.java) — mirror them
    // through the engine's FunctionRegistry seam
    graft.sparql.FunctionRegistry.add("http://www.bigdata.com/myFunction",
      args => concat(RdfLiteral.strOf(args.head), lit("-"), RdfLiteral.strOf(args.head)))
    graft.sparql.FunctionRegistry.add("http://www.bigdata.com/myFunction2",
      args => RdfLiteral.strOf(args.head) === "Mike")
  }

  override def afterAll(): Unit = {
    graft.sparql.FunctionRegistry.remove("http://www.bigdata.com/myFunction")
    graft.sparql.FunctionRegistry.remove("http://www.bigdata.com/myFunction2")
  }

  private val names: Vector[String] =
    if (!W3c.available) Vector.empty
    else {
      val dir = Paths.get(W3c.EvalDir)
      val listing = Files.list(dir)
      try listing.iterator().asScala
        .map(_.getFileName.toString)
        .filter(_.endsWith(".rq")).map(_.dropRight(3))
        .filter { b =>
          Files.exists(dir.resolve(s"$b.srx")) &&
            (Files.exists(dir.resolve(s"$b.ttl")) || Files.exists(dir.resolve(s"$b.trig")))
        }.toVector.sorted
      finally listing.close()
    }

  private def skipped(n: String): Option[String] =
    Deviations.get(n).map("deviation: " + _)
      .orElse(Environment.get(n).map("environment: " + _))

  test("conformance corpus is present and non-trivial") {
    assume(W3c.available, s"reference eval corpus not present at ${W3c.EvalDir}")
    assert(names.size >= 250, s"expected the full corpus, found ${names.size} cases")
    // every exclusion still names a real case — a stale entry is a bug
    (Deviations.keySet ++ Environment.keySet ++ ExpectError).foreach { n =>
      assert(names.contains(n), s"exclusion '$n' matches no corpus case")
    }
  }

  // one ScalaTest per corpus case — ≥200 green required at the bottom
  private var green = 0
  names.foreach { n =>
    skipped(n) match {
      case Some(reason) =>
        ignore(s"w3c:$n [$reason]") {}
      case None =>
        test(s"w3c:$n") {
          assume(W3c.available)
          W3c.runCase(graft.TestSpark.spark, n) match {
            case W3c.Pass =>
              green += 1
            case W3c.Err(m) if ExpectError(n) =>
              // negative case: rejection is the expected outcome
              green += 1
              assert(m != null)
            case W3c.Fail(d) => fail(s"result mismatch: $d")
            case W3c.Err(m)  => fail(s"evaluation error: $m")
          }
        }
    }
  }

  test("conformance gate: >= 200 corpus cases green") {
    assume(W3c.available)
    assert(green >= 200, s"only $green corpus cases green")
  }
}
