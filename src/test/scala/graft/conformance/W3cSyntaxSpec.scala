package graft.conformance

import org.scalatest.funsuite.AnyFunSuite
import graft.sparql.Parser

/** Syntax conformance: positive and negative parse cases authored
  * from the SPARQL 1.1 grammar (the shapes the W3C syntax-query
  * manifests exercise — one case per grammar feature rather than the
  * full manifest enumeration; the eval corpus in
  * [[W3cConformanceSpec]] covers the semantic side of each).
  *
  * Positive = `Parser.parse` (or `parseUpdates`) must ACCEPT;
  * negative = must REJECT loudly. A parser that silently drops a
  * malformed clause would change results — the unconsumed-input check
  * makes truncation a syntax error too.
  */
class W3cSyntaxSpec extends AnyFunSuite {

  private val positive: Seq[(String, String)] = Seq(
    "prefixed and full IRIs" ->
      "PREFIX ex: <http://example/> SELECT ?x WHERE { ?x ex:p <http://example/o> }",
    "empty prefix" ->
      "PREFIX : <http://example/> SELECT * { :s :p ?o }",
    "base + relative-free query" ->
      "BASE <http://example/> SELECT * { ?s ?p ?o }",
    "a for rdf:type" -> "SELECT * { ?x a ?c }",
    "dollar variables" -> "SELECT $x { $x ?p $y }",
    "comments" -> "# leading\nSELECT * { ?s ?p ?o # trailing\n}",
    "WHERE optional" -> "SELECT ?s { ?s ?p ?o }",
    "numeric literals incl. negatives and decimals" ->
      "SELECT * { ?s ?p ?o FILTER(?o > -3.25 && ?o < 4e2) }",
    "boolean literals" -> "SELECT * { ?s ?p true . ?s ?q false }",
    "single-quoted strings" -> "SELECT * { ?s ?p 'abc' }",
    "long strings with quotes inside" ->
      "SELECT * { ?s ?p \"\"\"two \"quoted\" words\nacross lines\"\"\" }",
    "escaped string" -> "SELECT * { ?s ?p \"a\\tb\\\"c\\\\d\" }",
    "lang tag and typed literal" ->
      "PREFIX xsd: <http://www.w3.org/2001/XMLSchema#> SELECT * { ?s ?p \"chat\"@fr . ?s ?q \"5\"^^xsd:int }",
    "predicate-object and object lists" ->
      "SELECT * { ?s ?p1 ?o1 ; ?p2 ?o2 , ?o3 . }",
    "blank node property list" -> "SELECT * { [ ?p ?o ] ?q ?r }",
    "group graph patterns + UNION" ->
      "SELECT * { { ?s ?p ?o } UNION { ?s ?q ?o } UNION { } }",
    "OPTIONAL with FILTER" ->
      "SELECT * { ?s ?p ?o OPTIONAL { ?s ?q ?r FILTER(?r != ?o) } }",
    "MINUS" -> "SELECT * { ?s ?p ?o MINUS { ?s ?q ?o } }",
    "FILTER EXISTS / NOT EXISTS" ->
      "SELECT * { ?s ?p ?o FILTER EXISTS { ?s ?q ?o } FILTER NOT EXISTS { ?s ?r ?o } }",
    "FILTER bare builtin call (no brackets)" ->
      "SELECT * { ?s ?p ?o FILTER regex(?o, 'x', 'i') }",
    "BIND" -> "SELECT * { ?s ?p ?o BIND(?o AS ?copy) }",
    "VALUES inline (single and multi var)" ->
      "SELECT * { VALUES ?x { 1 2 } VALUES (?a ?b) { (1 2) (UNDEF 3) } ?x ?a ?b }",
    "trailing VALUES clause" ->
      "SELECT ?s { ?s ?p ?o } VALUES ?s { <http://example/s> }",
    "sub-SELECT directly braced" -> "SELECT * { SELECT ?s { ?s ?p ?o } }",
    "GROUP BY + HAVING + aggregate projection" ->
      "SELECT ?s (COUNT(?o) AS ?n) { ?s ?p ?o } GROUP BY ?s HAVING(COUNT(?o) > 1)",
    "GROUP BY expression with AS" ->
      "SELECT ?k (SUM(?o) AS ?t) { ?s ?p ?o } GROUP BY (?o + 1 AS ?k)",
    "ORDER BY with aggregate and direction" ->
      "SELECT ?s { ?s ?p ?o } GROUP BY ?s ORDER BY DESC(COUNT(?o)) ?s",
    "LIMIT / OFFSET" -> "SELECT * { ?s ?p ?o } ORDER BY ?s LIMIT 10 OFFSET 5",
    "DISTINCT and REDUCED" -> "SELECT DISTINCT ?s { ?s ?p ?o }",
    "property paths: seq, alt, inverse, star, plus, opt, NPS" ->
      "PREFIX : <http://example/> SELECT * { ?x :a/:b|^:c ?y . ?x :d* ?z . ?x :e+ ?w . ?x :f? ?v . ?x !(:g|^:h) ?u }",
    "bounded path quantifier (reference extension)" ->
      "PREFIX : <http://example/> SELECT * { ?x :p{1,3} ?y }",
    "GRAPH with IRI and variable" ->
      "SELECT * { GRAPH <http://example/g> { ?s ?p ?o } GRAPH ?g { ?s ?q ?r } }",
    "FROM / FROM NAMED" ->
      "SELECT ?s FROM <http://example/g1> FROM NAMED <http://example/g2> WHERE { ?s ?p ?o }",
    "ASK with modifiers" -> "ASK { ?s ?p ?o } LIMIT 1",
    "CONSTRUCT with template and WHERE-shorthand" ->
      "CONSTRUCT { ?s ?p ?o } WHERE { ?s ?p ?o }",
    "DESCRIBE forms" -> "DESCRIBE <http://example/x>",
    "IN / NOT IN with expressions" ->
      "SELECT * { ?s ?p ?o FILTER(?o IN (1, ?s, <http://example/x>)) FILTER(?o NOT IN ()) }",
    "IF / COALESCE / BOUND" ->
      "SELECT * { ?s ?p ?o OPTIONAL { ?s ?q ?r } BIND(IF(BOUND(?r), ?r, COALESCE(?o, 'x')) AS ?v) }",
    "builtin string/term functions" ->
      "SELECT * { ?s ?p ?o FILTER(STRSTARTS(STR(?o), 'a') || LANGMATCHES(LANG(?o), 'en') || ISIRI(?s) || ISNUMERIC(?o)) }",
    "VALUES with parenthesized single-var rows" ->
      "SELECT * { VALUES (?d) { (<http://example/a>) (<http://example/b>) } ?d ?p ?o }",
    "draft BINDINGS clause (reference grammar)" ->
      "SELECT ?s { ?s ?p ?o } BINDINGS ?s { (<http://example/s>) }",
    "LET assignment (reference grammar)" ->
      "PREFIX : <http://example/> SELECT * { ?s ?p ?o LET (?v := 1) }",
    "named subquery WITH/INCLUDE (reference grammar)" ->
      "SELECT ?s WITH { SELECT ?s { ?s ?p ?o } } AS %set WHERE { INCLUDE %set }",
    "update: INSERT/DELETE DATA and WHERE forms" ->
      "INSERT DATA { <http://e/s> <http://e/p> 1 } ; DELETE { ?s ?p ?o } INSERT { ?s ?p 2 } WHERE { ?s ?p ?o }",
    "update: graph management" ->
      "CREATE GRAPH <http://e/g> ; COPY <http://e/g> TO <http://e/h> ; DROP SILENT GRAPH <http://e/g>")

  private val negative: Seq[(String, String)] = Seq(
    "unterminated string" -> "SELECT * { ?s ?p \"abc }",
    "unterminated IRI datatype" -> "SELECT * { ?s ?p \"x\"^^<http://e }",
    "missing closing brace" -> "SELECT * { ?s ?p ?o",
    "unbalanced parens in FILTER" -> "SELECT * { ?s ?p ?o FILTER((?o > 1) }",
    "projection that is not a var or expression" -> "SELECT 42 { ?s ?p ?o }",
    "expression projection without AS alias" -> "SELECT (?o + 1) { ?s ?p ?o }",
    "reserved ?_ variable prefix" -> "SELECT ?_x { ?_x ?p ?o }",
    "bare dollar sign" -> "SELECT * { $ ?p ?o }",
    "trailing junk after query" -> "SELECT * { ?s ?p ?o } GARBAGE HERE",
    "solution modifier out of position" -> "SELECT * LIMIT 5 { ?s ?p ?o }",
    "BIND missing AS" -> "SELECT * { BIND(1 ?v) }",
    "VALUES row arity cannot open" -> "SELECT * { VALUES (?a ?b) { 1 2 } }",
    "empty path quantifier bound" -> "PREFIX : <http://e/> SELECT * { ?x :p{3,1} ?y }",
    "INCLUDE without a named set" -> "SELECT * { INCLUDE set }",
    "unknown custom function IRI" ->
      "SELECT * { ?s ?p ?o FILTER(<http://example/noSuchFn>(?o)) }")

  positive.foreach { case (label, q) =>
    test(s"syntax positive: $label") {
      if (q.matches("(?is).*(INSERT|DELETE|CREATE|COPY|DROP).*") &&
          !q.toUpperCase.startsWith("SELECT"))
        Parser.parseUpdates(q)
      else Parser.parse(q)
    }
  }

  negative.foreach { case (label, q) =>
    test(s"syntax negative: $label") {
      intercept[Exception] { Parser.parse(q) }
    }
  }
}
