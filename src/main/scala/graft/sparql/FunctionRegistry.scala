package graft.sparql

import org.apache.spark.sql.Column

/** Custom SPARQL function registry — the reference's
  * ast.FunctionRegistry (bigdata-core/bigdata-rdf/src/java/com/
  * bigdata/rdf/sparql/ast/FunctionRegistry.java: `add(URI, Factory)`
  * resolved at AST→BOp translation). Here a factory is simply
  * `Seq[Column] => Column` — the function body is a Spark Column
  * expression over the argument terms, so a registered function stays
  * inside whole-stage codegen like every built-in.
  *
  * The parser consults this registry for any IRI-named function call
  * (`<http://example/fn>(?x)` or a prefixed spelling); an unregistered
  * IRI is a loud parse error, matching the reference
  * (FunctionRegistry.toVE throws on an unknown URI).
  */
object FunctionRegistry {
  private val fns =
    scala.collection.concurrent.TrieMap.empty[String, Seq[Column] => Column]

  /** Register (or replace) a function under its IRI. The IRI is
    * stored in the lexicon's interned spelling. */
  def add(iri: String, f: Seq[Column] => Column): Unit = { fns.put(iri, f); () }

  def remove(iri: String): Unit = { fns.remove(iri); () }

  def lookup(iri: String): Option[Seq[Column] => Column] = fns.get(iri)

  def registered: Seq[String] = fns.keys.toSeq.sorted
}
