package graft.rdf

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** RDF serialization — the WRITE half of the reference's Rio stack
  * (bigdata-core/bigdata-rdf/src/java/com/bigdata/rdf/rio/ writers):
  * N-Triples and N-Quads, the line-oriented formats that stay
  * distributed on the way OUT too — one text line per statement, so a
  * 100-TB export is a map-only projection written by every task in
  * parallel (no document-global state like Turtle prefixes).
  *
  * Inverse of the LOAD readers ([[graft.sparql.Update.loadTriples]] /
  * `loadQuads`): base-local terms re-expand under `urn:graft:`, global
  * IRIs pass through, tagged/typed literal term forms
  * ([[graft.sparql.RdfLiteral]]) render as `"lex"@lang` /
  * `"lex"^^<dt>`, everything else quotes as a literal with escapes.
  * Term-type rule matches the engine's isIRI semantics: scheme-shaped
  * terms are IRIs (the string lexicon's documented convention).
  */
object Serializer {

  /** Schemes treated as GLOBAL IRIs; any other scheme-shaped term is a
    * base-local id (`c:42` ⇄ `<urn:graft:c:42>`), matching the
    * loaders' interning. */
  private val globalScheme = "^(http|https|urn|file|mailto|did|tag):"

  /** Escapes `"`, newline, tab (the characters that would break the
    * line format). A literal already CONTAINING a two-char `\"`/`\n`
    * sequence would alias on reload — chained regexp stages cannot do
    * the single-pass full escape; documented limitation, vanishingly
    * rare in text corpora, and the loaders mirror exactly this set. */
  private def escape(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(
      c, "\"", "\\\\\""), "\n", "\\\\n"), "\t", "\\\\t")

  /** Resource position (s/p/g): bnode label or an angle-bracketed IRI,
    * re-expanding base-local names. */
  private def resource(c: Column): Column =
    when(c.startsWith("_:"), c)
      .when(c.rlike(globalScheme), concat(lit("<"), c, lit(">")))
      .otherwise(concat(lit("<" + graft.sparql.Parser.Base), c, lit(">")))

  /** Object position: IRI/bnode → resource form; tagged literal is
    * already its N-Triples form (modulo datatype brackets); everything
    * else quotes as a plain literal. */
  private def objTerm(c: Column): Column = {
    val typedDt = regexp_extract(c, "\\^\\^(.*)$", 1)
    when(c.startsWith("_:"), c)
      .when(graft.sparql.RdfLiteral.isTagged(c), c)
      .when(graft.sparql.RdfLiteral.isTyped(c),
        concat(regexp_extract(c, "^(\".*\")\\^\\^", 1), lit("^^"), resource(typedDt)))
      .when(c.rlike(graft.sparql.Parser.IriShape), resource(c))
      .otherwise(concat(lit("\""), escape(c), lit("\"")))
  }

  /** triples(s,p,o) → one N-Triples line per row (column `value`). */
  def toNTriples(triples: DataFrame): DataFrame =
    triples.select(concat(
      resource(col("s")), lit(" "), resource(col("p")), lit(" "),
      objTerm(col("o")), lit(" .")).as("value"))

  /** quads(s,p,o,g) → one N-Quads line per row (column `value`). */
  def toNQuads(quads: DataFrame): DataFrame =
    quads.select(concat(
      resource(col("s")), lit(" "), resource(col("p")), lit(" "),
      objTerm(col("o")), lit(" "), resource(col("g")), lit(" .")).as("value"))
}
