package graft.sparql

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Recursive-descent parser for a working subset of SPARQL 1.1 SELECT,
  * producing [[Algebra]] (which Compiler turns into a DataFrame plan).
  *
  * Covers the grammar Blazegraph's openrdf-based parser feeds into its
  * AST (bigdata-core/.../sparql/ast/ASTBase hierarchy): triple
  * patterns, `.`-separated blocks, FILTER (comparisons, &&, ||, !,
  * regex/contains/strstarts, numeric + string literals), OPTIONAL,
  * UNION, MINUS, FILTER [NOT] EXISTS, BIND(expr AS ?v), SELECT
  * [DISTINCT], ORDER BY [ASC|DESC], LIMIT/OFFSET.
  *
  * Terms: `?var`, `"string literal"`, numbers, and bare symbols
  * (`nation`, `c:42`) — matching the engine's string term model.
  */
object Parser {

  def parse(query: String): Algebra = new Parser(tokenize(query)).parseQuery()

  // ---- tokenizer ----
  private val symbolChars = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_:#-.".toSet

  private[sparql] def tokenize(q: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < q.length) {
      val c = q(i)
      if (c.isWhitespace) i += 1
      else if (c == '"') {
        val end = q.indexOf('"', i + 1)
        require(end > 0, s"unterminated string literal at $i")
        out += q.substring(i, end + 1); i = end + 1
      } else if (c == '?') {
        val start = i; i += 1
        while (i < q.length && (q(i).isLetterOrDigit || q(i) == '_')) i += 1
        out += q.substring(start, i)
      } else if ("{}().,".contains(c)) { out += c.toString; i += 1 }
      else if ("<>=!&|".contains(c)) {
        val two = q.substring(i, math.min(i + 2, q.length))
        if (Set("<=", ">=", "!=", "&&", "||").contains(two)) { out += two; i += 2 }
        else { out += c.toString; i += 1 }
      } else if (symbolChars(c)) {
        val start = i
        while (i < q.length && symbolChars(q(i))) i += 1
        val tok = q.substring(start, i)
        // a trailing '.' is the statement terminator unless the token is
        // a decimal number
        if (tok.length > 1 && tok.endsWith(".") && !tok.matches("""[-+]?\d*\.\d+""")) {
          out += tok.dropRight(1); out += "."
        } else out += tok
      } else sys.error(s"unexpected character '$c' at $i")
    }
    out.result()
  }

  private class Parser(tokens: Vector[String]) {
    private var pos = 0
    private def peek: String = if (pos < tokens.length) tokens(pos) else "<eof>"
    private def next(): String = { val t = peek; pos += 1; t }
    private def expect(t: String): Unit = {
      val got = next()
      require(got.equalsIgnoreCase(t), s"expected '$t', got '$got'")
    }
    private def peekIs(t: String): Boolean = peek.equalsIgnoreCase(t)

    def parseQuery(): Algebra = {
      expect("SELECT")
      val distinct = if (peekIs("DISTINCT")) { next(); true } else false
      val vars = Vector.newBuilder[String]
      var star = false
      while (!peekIs("WHERE")) {
        val t = next()
        if (t == "*") star = true else { require(t.startsWith("?"), s"bad projection '$t'"); vars += t.drop(1) }
      }
      expect("WHERE")
      var alg = parseGroup()
      val vs = vars.result()
      if (!star && vs.nonEmpty) alg = Project(alg, vs: _*)
      if (distinct) alg = Distinct(alg)
      // solution modifiers
      if (peekIs("ORDER")) {
        next(); expect("BY")
        val keys = Vector.newBuilder[Column]
        while (peekIs("ASC") || peekIs("DESC") || peek.startsWith("?")) {
          if (peekIs("ASC")) { next(); expect("("); val v = next().drop(1); expect(")"); keys += col(v).asc }
          else if (peekIs("DESC")) { next(); expect("("); val v = next().drop(1); expect(")"); keys += col(v).desc }
          else keys += col(next().drop(1)).asc
        }
        alg = OrderBy(alg, keys.result())
      }
      var offset = 0L; var limit = -1L
      while (peekIs("LIMIT") || peekIs("OFFSET")) {
        if (peekIs("LIMIT")) { next(); limit = next().toLong }
        else { next(); offset = next().toLong }
      }
      if (limit >= 0 || offset > 0) alg = Slice(alg, offset, if (limit >= 0) limit else Long.MaxValue)
      alg
    }

    /** GroupGraphPattern: { ... } */
    def parseGroup(): Algebra = {
      expect("{")
      var alg: Algebra = null
      def add(a: Algebra): Unit = alg = if (alg == null) a else Join(alg, a)
      var patterns = Vector.newBuilder[TriplePattern]
      def flush(): Unit = {
        val ps = patterns.result()
        if (ps.nonEmpty) { add(Bgp(ps: _*)); patterns = Vector.newBuilder }
      }
      while (!peekIs("}")) {
        if (peekIs("FILTER")) {
          next()
          if (peekIs("EXISTS")) { next(); flush(); val g = parseGroup(); alg = Exists(orUnit(alg), g) }
          else if (peekIs("NOT")) { next(); expect("EXISTS"); flush(); val g = parseGroup(); alg = NotExists(orUnit(alg), g) }
          else { val c = parseBracketedExpr(); flush(); alg = Filter(orUnit(alg), c) }
        } else if (peekIs("OPTIONAL")) {
          next(); flush(); val g = parseGroup(); alg = LeftJoin(orUnit(alg), g)
        } else if (peekIs("MINUS")) {
          next(); flush(); val g = parseGroup(); alg = Minus(orUnit(alg), g)
        } else if (peekIs("BIND")) {
          next(); expect("(")
          val e = parseExpr()
          expect("AS"); val v = next(); expect(")")
          flush(); alg = Extend(orUnit(alg), v.drop(1), e)
        } else if (peekIs("{")) {
          flush()
          var g = parseGroup()
          while (peekIs("UNION")) { next(); g = Union(g, parseGroup()) }
          add(g)
        } else if (peekIs(".")) next()
        else {
          // triple pattern
          val s = next(); val p = next(); val o = parseTermToken()
          patterns += TriplePattern(term(s), term(p), term(o))
          if (peekIs(".")) next()
        }
      }
      expect("}")
      flush()
      orUnit(alg)
    }

    private def orUnit(a: Algebra): Algebra =
      if (a == null) sys.error("empty group pattern") else a

    private def parseTermToken(): String = next()

    private def term(t: String): Term =
      if (t.startsWith("?")) Var(t.drop(1))
      else if (t.startsWith("\"")) Const(t.drop(1).dropRight(1))
      else Const(t)

    /** FILTER ( expr ) */
    private def parseBracketedExpr(): Column = {
      expect("(")
      val e = parseExpr()
      expect(")")
      e
    }

    /** expr := andExpr (|| andExpr)* */
    private def parseExpr(): Column = {
      var e = parseAnd()
      while (peek == "||") { next(); e = e || parseAnd() }
      e
    }
    private def parseAnd(): Column = {
      var e = parseRel()
      while (peek == "&&") { next(); e = e && parseRel() }
      e
    }
    private def parseRel(): Column = {
      if (peek == "!") { next(); return !parseRel() }
      if (peekIs("regex")) {
        next(); expect("("); val v = parsePrimary(); expect(",")
        val re = next(); expect(")")
        return v.rlike(re.drop(1).dropRight(1))
      }
      if (peekIs("contains")) {
        next(); expect("("); val v = parsePrimary(); expect(",")
        val s = next(); expect(")")
        return v.contains(s.drop(1).dropRight(1))
      }
      if (peekIs("strstarts")) {
        next(); expect("("); val v = parsePrimary(); expect(",")
        val s = next(); expect(")")
        return v.startsWith(s.drop(1).dropRight(1))
      }
      val (l, lNum) = parsePrimary2()
      peek match {
        case ">" | "<" | ">=" | "<=" | "=" | "!=" =>
          val op = next(); val (r0, rNum) = parsePrimary2()
          // string-typed solution terms compare numerically against a
          // numeric literal (xsd numeric comparison semantics)
          val (lc, rc) =
            if (rNum && !lNum) (l.cast("double"), r0)
            else if (lNum && !rNum) (l, r0.cast("double"))
            else (l, r0)
          op match {
            case ">" => lc > rc; case "<" => lc < rc
            case ">=" => lc >= rc; case "<=" => lc <= rc
            case "=" => lc === rc; case "!=" => lc =!= rc
          }
        case _ => l
      }
    }
    /** primary := ?var | number | "string"; Boolean = numeric literal */
    private def parsePrimary2(): (Column, Boolean) = {
      val t = next()
      if (t.startsWith("?")) (col(t.drop(1)), false)
      else if (t.startsWith("\"")) (lit(t.drop(1).dropRight(1)), false)
      else if (t.matches("""[-+]?\d+""")) (lit(t.toDouble), true)
      else if (t.matches("""[-+]?\d*\.\d+""")) (lit(t.toDouble), true)
      else (lit(t), false)
    }
    private def parsePrimary(): Column = parsePrimary2()._1
  }
}
