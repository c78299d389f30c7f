package graft.conformance

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.Graft
import graft.rdf.Turtle

/** External-conformance harness: data-driven SPARQL evaluation cases
  * in the W3C test-suite shape (query `.rq` + data `.ttl`/`.trig` +
  * expected `.srx` SPARQL-XML results).
  *
  * The case FILES are read in place from the reference checkout
  * (`bigdata-rdf-test/src/test/java/com/bigdata/rdf/sparql/ast/eval/`,
  * the reference's Sesame-style data-driven eval corpus — external
  * test DATA authored by third parties, not engine code); nothing is
  * copied into this repo. Suites guard with `assume` so the build
  * stays green when the corpus is absent.
  *
  * Comparison canonicalizes both sides to the engine's string-lexicon
  * conventions (documented decisions, mirroring the DuckDB oracle
  * gate):
  *   - numeric literals compare by VALUE, not by xsd numeric subtype
  *     (the lexicon stores numbers by lexical form; `"04"^^xsd:int`,
  *     `4` and `4.0` are one value);
  *   - `xsd:string`-typed and plain literals are one term (RDF 1.1
  *     semantics);
  *   - `xsd:boolean` literals compare by value;
  *   - language tags compare case-insensitively (BCP 47);
  *   - rows compare as a MULTISET even under ORDER BY (the driver's
  *     correctness gate hashes sorted rows the same way); blank nodes
  *     compare up to label bijection.
  */
object W3c {

  val EvalDir =
    "/root/reference/bigdata-rdf-test/src/test/java/com/bigdata/rdf/sparql/ast/eval"

  def available: Boolean = Files.isDirectory(Paths.get(EvalDir))

  // ---- expected-results model ----

  sealed trait RTerm
  final case class RIri(v: String) extends RTerm
  final case class RBnode(id: String) extends RTerm
  /** Canonical literal key (see canonLit). */
  final case class RLit(key: String) extends RTerm

  sealed trait Expected
  final case class ExpBool(value: Boolean) extends Expected
  final case class ExpRows(vars: Vector[String],
                           rows: Vector[Map[String, RTerm]]) extends Expected

  private val XsdNumeric = Set(
    "integer", "decimal", "double", "float", "int", "long", "short",
    "byte", "nonNegativeInteger", "nonPositiveInteger", "negativeInteger",
    "positiveInteger", "unsignedLong", "unsignedInt", "unsignedShort",
    "unsignedByte").map("http://www.w3.org/2001/XMLSchema#" + _)
  private val XsdString = "http://www.w3.org/2001/XMLSchema#string"
  private val XsdBoolean = "http://www.w3.org/2001/XMLSchema#boolean"

  private val XsdDateTime = "http://www.w3.org/2001/XMLSchema#dateTime"

  /** xsd:dateTime values compare by INSTANT (the reference normalizes
    * lexical forms — "1996-05-30" becomes 1996-05-30T00:00:00.000Z —
    * while this engine keeps the asserted form). No offset = UTC. */
  private def canonDateTime(lex: String): String = {
    val t = lex.trim
    val full =
      if (t.matches("""\d{4}-\d{2}-\d{2}""")) t + "T00:00:00Z"
      else if (t.matches(""".*[T ]\d{2}:\d{2}:\d{2}(\.\d+)?""")) t + "Z"
      else t
    try java.time.Instant.parse(full.replace(' ', 'T')).toEpochMilli.toString
    catch { case _: Exception => lex }
  }

  /** Literal canonical key from (lexical form, lang, datatype). */
  def canonLit(lex: String, lang: Option[String], dt: Option[String]): String =
    (lang, dt) match {
      case (_, Some(XsdDateTime)) => "D:" + canonDateTime(lex)
      case (Some(l), _) => "L:" + lex + "@" + l.toLowerCase
      case (_, Some(d)) if XsdNumeric(d) && isNumeric(lex) => "N:" + numKey(lex)
      case (_, Some(XsdBoolean)) => "B:" + lex.trim
      case (_, Some(XsdString)) | (_, None) =>
        if (isNumeric(lex)) "N:" + numKey(lex)
        else if (lex == "true" || lex == "false") "B:" + lex
        else "S:" + lex
      case (_, Some(d)) => "T:" + lex + "^^" + d
    }

  private def isNumeric(lex: String): Boolean =
    lex.matches("""[-+]?(\d+\.?\d*|\.\d+)([eE][-+]?\d+)?""")

  private def numKey(lex: String): String = {
    val bd = new java.math.BigDecimal(lex).stripTrailingZeros()
    bd.toPlainString
  }

  /** Map one of the ENGINE's string-lexicon terms to the comparable
    * model (shape rules = the lexicon's own: RdfLiteral.scala,
    * Parser.IriShape). */
  def engineTerm(raw: String): RTerm = {
    // the lexicon's canonical `type` term denotes rdf:type
    if (raw == "type") RIri(graft.sparql.Parser.RdfTypeIri)
    else if (raw.startsWith("_:")) RBnode(raw)
    else if (raw.startsWith("\"")) {
      // tagged or typed: split at the LAST closing quote
      val close = raw.lastIndexOf('"')
      val lex = raw.substring(1, close)
      val tail = raw.substring(close + 1)
      if (tail.startsWith("@")) RLit(canonLit(lex, Some(tail.drop(1)), None))
      else if (tail.startsWith("^^")) RLit(canonLit(lex, None, Some(tail.drop(2))))
      else RLit(canonLit(raw, None, None)) // plain literal that merely starts with a quote
    }
    else if (raw.matches("^[A-Za-z][A-Za-z0-9+.-]*:.*")) RIri(raw)
    else RLit(canonLit(raw, None, None))
  }

  // ---- SRX (SPARQL XML results) reader ----

  def parseSrx(path: String): Expected = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    f.setFeature(javax.xml.XMLConstants.FEATURE_SECURE_PROCESSING, true)
    f.setNamespaceAware(true)
    val doc = f.newDocumentBuilder().parse(new java.io.File(path))
    val boolNodes = doc.getElementsByTagNameNS("*", "boolean")
    if (boolNodes.getLength > 0)
      return ExpBool(boolNodes.item(0).getTextContent.trim.toBoolean)
    val vars = {
      val ns = doc.getElementsByTagNameNS("*", "variable")
      (0 until ns.getLength).map(i =>
        ns.item(i).asInstanceOf[org.w3c.dom.Element].getAttribute("name")).toVector
    }
    val resNodes = doc.getElementsByTagNameNS("*", "result")
    val rows = (0 until resNodes.getLength).map { i =>
      val res = resNodes.item(i).asInstanceOf[org.w3c.dom.Element]
      val bindings = res.getElementsByTagNameNS("*", "binding")
      (0 until bindings.getLength).flatMap { j =>
        val b = bindings.item(j).asInstanceOf[org.w3c.dom.Element]
        val name = b.getAttribute("name")
        firstElementChild(b).map { v =>
          val term: RTerm = v.getLocalName match {
            case "uri" => RIri(v.getTextContent)
            case "bnode" => RBnode("_:" + v.getTextContent)
            case "literal" =>
              val lang = Option(v.getAttributeNS(
                "http://www.w3.org/XML/1998/namespace", "lang")).filter(_.nonEmpty)
                .orElse(Option(v.getAttribute("xml:lang")).filter(_.nonEmpty))
              val dt = Option(v.getAttribute("datatype")).filter(_.nonEmpty)
              RLit(canonLit(v.getTextContent, lang, dt))
            case other => sys.error(s"unknown binding value element <$other>")
          }
          name -> term
        }
      }.toMap
    }.toVector
    ExpRows(vars, rows)
  }

  private def firstElementChild(e: org.w3c.dom.Element): Option[org.w3c.dom.Element] = {
    val kids = e.getChildNodes
    (0 until kids.getLength).iterator.map(kids.item)
      .collectFirst { case el: org.w3c.dom.Element => el }
  }

  // ---- row-multiset compare with bnode bijection ----

  /** Multiset equality of rows up to a bijection between expected and
    * actual blank-node labels (backtracking; conformance result sets
    * are small). Rows are var→term maps; an absent var = unbound. */
  def sameRows(vars: Seq[String],
               expected: Vector[Map[String, RTerm]],
               actual: Vector[Map[String, RTerm]]): Boolean = {
    if (expected.length != actual.length) return false
    def tryMatch(exp: List[Map[String, RTerm]],
                 act: Vector[Map[String, RTerm]],
                 used: Set[Int],
                 bmap: Map[String, String],
                 bmapInv: Map[String, String]): Boolean = exp match {
      case Nil => true
      case row :: rest =>
        act.indices.exists { i =>
          if (used(i)) false
          else rowMatch(vars, row, act(i), bmap, bmapInv) match {
            case None => false
            case Some((bm, bmi)) => tryMatch(rest, act, used + i, bm, bmi)
          }
        }
    }
    tryMatch(expected.toList, actual, Set.empty, Map.empty, Map.empty)
  }

  private def rowMatch(vars: Seq[String],
                       exp: Map[String, RTerm], act: Map[String, RTerm],
                       bmap0: Map[String, String], bmapInv0: Map[String, String])
      : Option[(Map[String, String], Map[String, String])] = {
    var bmap = bmap0; var bmapInv = bmapInv0
    val ok = vars.forall { v =>
      (exp.get(v), act.get(v)) match {
        case (None, None) => true
        case (Some(RBnode(e)), Some(RBnode(a))) =>
          (bmap.get(e), bmapInv.get(a)) match {
            case (Some(x), _) if x != a => false
            case (_, Some(y)) if y != e => false
            case _ => bmap += (e -> a); bmapInv += (a -> e); true
          }
        case (Some(x), Some(y)) => x == y
        case _ => false
      }
    }
    if (ok) Some((bmap, bmapInv)) else None
  }

  // ---- case runner ----

  sealed trait CaseResult
  case object Pass extends CaseResult
  final case class Fail(detail: String) extends CaseResult
  final case class Err(msg: String) extends CaseResult

  def read(path: String): String =
    new String(Files.readAllBytes(Paths.get(path)), StandardCharsets.UTF_8)

  def dataFileOf(name: String): Option[String] =
    Seq(s"$EvalDir/$name.trig", s"$EvalDir/$name.ttl")
      .find(p => Files.exists(Paths.get(p)))

  /** Load a case's data into a Graft handle. TriG named graphs keep
    * their labels; top-level triples land in the default graph; the
    * handle's default graph for queries is the union merge (the
    * reference's quads-mode UNION_DEFAULT_GRAPH behavior its own
    * data-driven tests assume). */
  def loadData(spark: SparkSession, path: String): Graft = {
    import spark.implicits._
    val content = read(path)
    val quads = Turtle.parseTrig(content, "g:default")
    Graft.ofQuads(spark, quads.toDF("s", "p", "o", "g"))
  }

  def runCase(spark: SparkSession, name: String,
              namedSets: Map[String, org.apache.spark.sql.DataFrame] = Map.empty)
      : CaseResult =
    runCaseAt(spark, EvalDir, name, namedSets)

  def runCaseAt(spark: SparkSession, dir: String, name: String,
                namedSets: Map[String, org.apache.spark.sql.DataFrame] = Map.empty)
      : CaseResult = {
    try {
      val rq = read(s"$dir/$name.rq")
      val dataPath = Seq(s"$dir/$name.trig", s"$dir/$name.ttl")
        .find(p => Files.exists(Paths.get(p)))
        .getOrElse(return Err("no data file"))
      val expected = parseSrx(s"$dir/$name.srx")
      val g = loadData(spark, dataPath)
      val df = if (namedSets.isEmpty) g.query(rq) else g.query(rq, namedSets)
      expected match {
        case ExpBool(want) =>
          // an ASK answer is the boolean column; a few reference cases
          // pair a CONSTRUCT/SELECT query with a boolean expectation —
          // there the assertion is solution-EXISTENCE
          val got =
            if (df.columns.sameElements(Array("ask"))) df.collect().head.getBoolean(0)
            else !df.isEmpty
          if (got == want) Pass else Fail(s"ASK: want $want got $got")
        case ExpRows(vars, rows) =>
          val cols = df.columns.toSet
          val actual = df.collect().toVector.map { r =>
            vars.flatMap { v =>
              if (!cols(v)) None
              else Option(r.getAs[Any](v)).map(x => v -> engineTerm(String.valueOf(x)))
            }.toMap
          }
          if (sameRows(vars, rows, actual)) Pass
          else Fail(s"rows: want ${rows.length} got ${actual.length}\n" +
            s"  want: ${rows.take(6).mkString(" | ")}\n" +
            s"  got:  ${actual.take(6).mkString(" | ")}")
      }
    } catch {
      case e: Throwable => Err(s"${e.getClass.getSimpleName}: ${e.getMessage}")
    }
  }
}
