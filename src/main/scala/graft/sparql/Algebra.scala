package graft.sparql

import org.apache.spark.sql.Column

/** SPARQL 1.1 algebra as a Scala AST.
  *
  * Mirrors the node taxonomy of Blazegraph's query AST
  * (bigdata-core/bigdata-rdf/src/java/com/bigdata/rdf/sparql/ast/:
  * StatementPatternNode, JoinGroupNode, UnionNode, MinusNode,
  * FilterNode, AssignmentNode, BindingsClause, SubqueryRoot,
  * ArbitraryLengthPathNode, GroupByNode, HavingNode, OrderByNode,
  * SliceNode, ExistsNode, NotExistsNode, ConstructNode) — but compiled
  * to Spark DataFrames instead of Blazegraph's vectored BOp pipeline:
  * a solution multiset IS a DataFrame whose columns are the in-scope
  * variables, so Catalyst owns join ordering, predicate pushdown and
  * physical strategy selection.
  *
  * Value expressions (FILTER / BIND / aggregate args) are plain Spark
  * `Column`s referencing variables by name — they compile straight into
  * whole-stage codegen, the analog of Blazegraph's IValueExpression
  * with materialized IVs.
  */
sealed trait Term
final case class Var(name: String) extends Term
final case class Const(value: String) extends Term

final case class TriplePattern(s: Term, p: Term, o: Term)
object TriplePattern {
  def apply(s: String, p: String, o: String): TriplePattern = {
    def term(x: String): Term =
      if (x.startsWith("?")) Var(x.drop(1)) else Const(x)
    TriplePattern(term(s), term(p), term(o))
  }
}

sealed trait Algebra
/** Basic graph pattern: conjunctive triple patterns joined on shared vars. */
final case class Bgp(patterns: TriplePattern*) extends Algebra
/** OPTIONAL { right } — left outer join on shared vars. */
final case class LeftJoin(left: Algebra, right: Algebra) extends Algebra
final case class Join(left: Algebra, right: Algebra) extends Algebra
final case class Union(left: Algebra, right: Algebra) extends Algebra
/** SPARQL MINUS: drop left solutions having a compatible right solution. */
final case class Minus(left: Algebra, right: Algebra) extends Algebra
/** FILTER EXISTS { right } — left semi join. */
final case class Exists(left: Algebra, right: Algebra) extends Algebra
/** FILTER NOT EXISTS { right } — left anti join. */
final case class NotExists(left: Algebra, right: Algebra) extends Algebra
final case class Filter(child: Algebra, condition: Column) extends Algebra
/** BIND(expr AS ?v). */
final case class Extend(child: Algebra, varName: String, expr: Column) extends Algebra
/** VALUES (?v1 ?v2) { (..) (..) } — inline data joined on shared vars. */
final case class Values(vars: Seq[String], rows: Seq[Seq[Option[String]]]) extends Algebra
final case class Project(child: Algebra, vars: String*) extends Algebra
/** SELECT * — projects every NAMED variable, dropping parser-synthesized
  * ones (`_`-prefixed: anonymous bnodes, path endpoints, sids) which are
  * not projectable per SPARQL (anonymous bnodes are scoped to the
  * pattern; grammar [99]). */
final case class StarProject(child: Algebra) extends Algebra
final case class Distinct(child: Algebra) extends Algebra
final case class OrderBy(child: Algebra, keys: Seq[Column]) extends Algebra
final case class Slice(child: Algebra, offset: Long, limit: Long) extends Algebra
/** GROUP BY keys with named aggregates; HAVING via an outer Filter. */
final case class Group(child: Algebra, keys: Seq[String], aggs: Seq[(String, Column)]) extends Algebra
/** Sub-SELECT: compiled independently, then joined on shared vars. */
final case class SubQuery(left: Algebra, sub: Algebra) extends Algebra
/** Arbitrary-length path  ?s (step)+ ?o  over a union-of-predicates
  * step (ArbitraryLengthPathNode, lowerBound=1): transitive closure by
  * frontier fixpoint. Sugar for Path(s, PathPlusE(alt of preds), o). */
final case class PathPlus(s: Term, predicates: Seq[String], o: Term,
                          sVar: String, oVar: String) extends Algebra

/** SPARQL 1.1 property-path expression algebra (reference:
  * ast/PathNode.java:94-318 — PathAlternative, PathSequence, PathElt
  * with inverse/mod, PathNegatedPropertySet; zero-length semantics in
  * ast/ZeroLengthPathNode.java:22). */
sealed trait PathExpr
/** Atomic predicate step `p`. */
final case class PathPred(p: String) extends PathExpr
/** Sequence `l / r`. */
final case class PathSeq(l: PathExpr, r: PathExpr) extends PathExpr
/** Alternative `l | r`. */
final case class PathAlt(l: PathExpr, r: PathExpr) extends PathExpr
/** Inverse `^e`. */
final case class PathInverse(e: PathExpr) extends PathExpr
/** One-or-more `e+`. */
final case class PathPlusE(e: PathExpr) extends PathExpr
/** Zero-or-more `e*` (zero-length path relates a bound term to itself;
  * unbound ends range over all graph terms). */
final case class PathStar(e: PathExpr) extends PathExpr
/** Zero-or-one `e?`. */
final case class PathOpt(e: PathExpr) extends PathExpr
/** Negated property set `!(p1|…|pn|^q1|…|^qm)` — per SPARQL 1.1
  * §18.2.2.3 the forward elements form NPS(P) and the inverse elements
  * inv(NPS(R)); each part exists only when its set is non-empty. */
final case class PathNeg(preds: Seq[String],
                         revPreds: Seq[String] = Nil) extends PathExpr
/** Bounded quantifier `p{n,m}` / `p{n,}` / `p{n}` — Blazegraph's
  * grammar extension over SPARQL 1.1 (ArbitraryLengthPathNode
  * lowerBound/upperBound evaluation). `hi` None = unbounded. */
final case class PathBounded(e: PathExpr, lo: Int, hi: Option[Int]) extends PathExpr

/** General property-path pattern  s path o  → solutions (sVar, oVar). */
final case class Path(s: Term, path: PathExpr, o: Term,
                      sVar: String, oVar: String) extends Algebra

/** ASK { pattern } → one row, boolean column `ask` (AST2BOpUtility ask). */
final case class Ask(child: Algebra) extends Algebra

/** CONSTRUCT { template } WHERE { child } → distinct (s,p,o) rows
  * instantiated from the template (ConstructNode). */
final case class Construct(template: Seq[TriplePattern], child: Algebra) extends Algebra

/** DESCRIBE <term> → all triples about the term (DescribeModeEnum
  * ForwardOneStep; CBD adds blank-node expansion, moot in a model with
  * no blank nodes). */
final case class Describe(term: String) extends Algebra

/** DESCRIBE ?v WHERE { child } → triples about every node ?v binds to. */
final case class DescribeWhere(v: String, child: Algebra) extends Algebra

/** SPARQL 1.1 Update operations (reference: ast.DeleteInsertGraph,
  * ast.InsertData, ast.DeleteData via AST2BOpUpdate). Ground data
  * carries an optional named graph per triple (`GRAPH g { … }` blocks);
  * None = the default graph. */
sealed trait UpdateOp
/** The two template-driven WHERE ops — what a [[UsingClause]] dataset
  * clause can legally wrap (SPARQL 1.1 Update grammar [41] Modify:
  * UsingClause* applies to any DELETE/INSERT template form, quad
  * templates included). */
sealed trait TemplateWhereOp extends UpdateOp
/** INSERT DATA { ground triples | GRAPH g { … } }. */
final case class InsertData(data: Seq[(Option[String], TriplePattern)]) extends UpdateOp
/** DELETE DATA { ground triples | GRAPH g { … } }. */
final case class DeleteData(data: Seq[(Option[String], TriplePattern)]) extends UpdateOp
/** DELETE { template } INSERT { template } WHERE { pattern } —
  * templates instantiated against the pre-update state, deletes
  * applied before inserts (SPARQL 1.1 Update §3.1.3). */
final case class DeleteInsertWhere(delete: Seq[TriplePattern],
                                   insert: Seq[TriplePattern],
                                   where: Algebra) extends TemplateWhereOp
/** DELETE/INSERT with QUAD templates — `GRAPH g { … }` blocks inside
  * the template itself (SPARQL 1.1 Update grammar [49] QuadPattern;
  * reference: ast.QuadsData via AST2BOpUpdate). Each template triple
  * carries an optional graph TERM: None = the default graph, a Const
  * = that named graph, a Var = bound per solution row (so
  * `INSERT { GRAPH ?g { … } } WHERE { GRAPH ?g { … } }` fans results
  * across graphs). Parsed only when a template actually contains a
  * GRAPH block; plain templates keep [[DeleteInsertWhere]]. */
final case class QuadsTemplateWhere(delete: Seq[(Option[Term], TriplePattern)],
                                    insert: Seq[(Option[Term], TriplePattern)],
                                    where: Algebra) extends TemplateWhereOp
/** WITH <g> DELETE/INSERT WHERE — the op's WHERE and templates are
  * scoped to one named graph (§3.1.3 WITH). */
final case class WithGraph(g: String, op: DeleteInsertWhere) extends UpdateOp
/** DELETE/INSERT … USING <g> / USING NAMED <g> WHERE — the WHERE
  * evaluates against the USING dataset (the update-side FROM/FROM
  * NAMED, SPARQL 1.1 Update §3.1.3; reference: DeleteInsertGraph with
  * a DatasetNode). Plain templates act on the default graph; quad
  * templates ([[QuadsTemplateWhere]]) address their own graphs while
  * the WHERE still reads the USING dataset (reference AST2BOpUpdate
  * accepts the combination). */
final case class UsingClause(defaults: Seq[String], named: Seq[String],
                             op: TemplateWhereOp) extends UpdateOp

/** Text-form graph management (reference: ast/CreateGraph.java:48 and
  * siblings ClearGraph/DropGraph/CopyGraph/MoveGraph/AddGraph,
  * evaluated in ast/eval/AST2BOpUpdate.java). A `None` graph means the
  * default graph; SILENT suppresses errors (moot for most ops here —
  * graphs exist implicitly in a lazy view). */
final case class CreateGraph(g: String, silent: Boolean = false) extends UpdateOp
/** DROP [SILENT] GRAPH <g> | DEFAULT. */
final case class DropGraph(g: Option[String], silent: Boolean = false) extends UpdateOp
/** CLEAR [SILENT] GRAPH <g> | DEFAULT — same row-level effect as DROP
  * in a view-backed store (the graph's triples vanish). */
final case class ClearGraph(g: Option[String], silent: Boolean = false) extends UpdateOp
/** CLEAR ALL / DROP ALL. */
case object ClearAll extends UpdateOp
/** COPY [SILENT] <from> TO <to>. */
final case class CopyGraph(from: Option[String], to: Option[String],
                           silent: Boolean = false) extends UpdateOp
/** MOVE [SILENT] <from> TO <to>. */
final case class MoveGraph(from: Option[String], to: Option[String],
                           silent: Boolean = false) extends UpdateOp
/** ADD [SILENT] <from> TO <to>. */
final case class AddGraph(from: Option[String], to: Option[String],
                          silent: Boolean = false) extends UpdateOp
/** LOAD [SILENT] <source> [INTO GRAPH <g>] — source is a parquet
  * (s,p,o) table or an N-Triples text file (reference:
  * ast/LoadGraph.java via AST2BOpUpdate; the driver there is the
  * RDF parser pipeline, here a Spark read). */
final case class Load(source: String, graph: Option[String],
                      silent: Boolean = false) extends UpdateOp

/** bigdata NAMED SOLUTION SET update extensions (sparql.jj:335
  * `<SOLUTIONS>`, InsertClause `INSERT INTO %name Select()` /
  * DeleteClause `DELETE FROM %name Select()`, GraphRefAll's
  * SOLUTIONS/GRAPHS arms; evaluated in AST2BOpUpdate.java:728-1007
  * against an ISolutionSetManager). Solution sets are
  * CONNECTION-scoped here (they live on the [[graft.Graft]] handle —
  * the reference's default ISolutionSetManager is the SPARQL cache,
  * not the journal); `INCLUDE %name` reads them. */
sealed trait SolutionsOp extends UpdateOp
/** CREATE [SILENT] SOLUTIONS %name — an empty named set; exists is an
  * error unless SILENT. */
final case class CreateSolutions(name: String, silent: Boolean = false) extends SolutionsOp
/** DROP [SILENT] SOLUTIONS [%name] — None drops ALL named sets;
  * absent named set errors unless SILENT. */
final case class DropSolutions(name: Option[String], silent: Boolean = false) extends SolutionsOp
/** CLEAR [SILENT] SOLUTIONS [%name] — like DROP but the set remains,
  * empty. */
final case class ClearSolutions(name: Option[String], silent: Boolean = false) extends SolutionsOp
/** INSERT INTO %name SELECT … — APPENDS the SELECT's solutions to the
  * named set (the reference's putSolutions). */
final case class InsertIntoSolutions(name: String, select: Algebra) extends SolutionsOp
/** DELETE FROM %name SELECT … — removes every stored solution equal
  * to some produced solution (null-safe full-row equality; stored
  * duplicates of a matched solution all go, non-matching multiplicity
  * is preserved). */
final case class DeleteFromSolutions(name: String, select: Algebra) extends SolutionsOp
/** DROP [SILENT] GRAPHS — every NAMED graph goes, the default graph
  * and the solution sets stay (GraphRefAll's GRAPHS arm). */
final case class DropGraphs(silent: Boolean = false) extends UpdateOp

/** GRAPH g { child } — graph-scoped pattern group. A Const `g` scopes
  * every pattern to one named graph; a Var `g` binds the graph name as
  * a solution variable joined on shared vars. */
final case class GraphPattern(g: Term, child: Algebra) extends Algebra

/** Blazegraph named subquery: `WITH { SELECT … } AS %name` evaluated
  * ONCE into a named solution set; every INCLUDE joins against that
  * materialization (reference: ast/NamedSubqueryRoot.java — evaluated
  * before the WHERE clause into a hash-indexed solution set,
  * ast/eval/AST2BOpUtility.java addNamedSubqueries). */
final case class NamedSubquery(name: String, sub: Algebra, child: Algebra) extends Algebra

/** `INCLUDE %name` — joins the enclosing group against the named
  * solution set on shared variables (ast/NamedSubqueryInclude.java). */
final case class NamedInclude(name: String) extends Algebra

/** BGP whose join order is pinned to the textual pattern order —
  * produced by `hint:Query hint:optimizer "None"`
  * (com.bigdata.rdf.sparql.hints.QueryHintRegistry,
  * QueryOptimizerEnum.None): the user takes join-order control, so no
  * connectivity-greedy reorder and no star fusion. */
final case class BgpFixed(patterns: Seq[TriplePattern]) extends Algebra

/** BGP with position-pinned patterns — `hint:Prior hint:runFirst
  * "true"` / `hint:runLast "true"` (QueryHintRegistry.java RunFirst/
  * RunLast): the hinted pattern leads (trails) its group's join
  * order; the connectivity-greedy reorder owns everything between —
  * the reference's contract exactly (pin one access path's position,
  * the static optimizer orders the rest). */
final case class BgpPinned(first: Seq[TriplePattern], mid: Seq[TriplePattern],
                           last: Seq[TriplePattern]) extends Algebra

/** FROM / FROM NAMED dataset clauses (DatasetNode): the default graph
  * becomes the merge of `defaults`, and GRAPH patterns range only over
  * `named` (when non-empty). */
final case class DatasetClause(defaults: Seq[String], named: Seq[String],
                               child: Algebra) extends Algebra

/** FROM [NAMED] VIRTUAL GRAPH <vg> — the reference's virtual-graph
  * dataset extension (DatasetNode virtual graphs; membership asserted
  * as `<vg> bd:virtualGraph <g>` statements, BD.VIRTUAL_GRAPH): the
  * clause resolves to the member graphs at evaluation time and then
  * behaves exactly like the expanded FROM / FROM NAMED list. */
final case class VirtualGraphClause(vgDefaults: Seq[String], vgNamed: Seq[String],
                                    child: Algebra) extends Algebra

/** Graph analytics invoked from inside a query — the reference's
  * `SERVICE gas:service { … }` (rdf/graph/impl/bd/GASService.java:136).
  * `config` keys: gasClass (bfs|cc|pr), in (seed), linkType (edge
  * predicate, repeatable), traversalDirection (Forward|Reverse).
  * The result binds (outNode, outVal) and joins into the enclosing
  * group on shared variables like any pattern. */
final case class GasService(config: Seq[(String, String)],
                            outNode: String, outVal: String) extends Algebra

/** Full-text search invoked from inside a query — the reference's
  * `bds:search` magic service (ast/eval/SearchServiceFactory.java).
  * Binds (outDoc, outScore) over the source's search corpus. */
final case class SearchService(terms: Seq[String], limit: Int,
                               prefixMatch: Boolean, matchAll: Boolean,
                               outDoc: String, outScore: String,
                               regex: Option[String] = None,
                               minScore: Option[Double] = None,
                               maxRank: Option[Int] = None,
                               analyzer: Option[String] = None,
                               maxScore: Option[Double] = None,
                               minRank: Option[Int] = None,
                               matchExact: Boolean = false,
                               // classic magic-predicate outputs
                               // (ASTSearchOptimizer lift): hit rank
                               // variable, or ONE row binding the hit
                               // count instead of hits (bds:rangeCount)
                               outRank: Option[String] = None,
                               rangeCountVar: Option[String] = None) extends Algebra

/** SERVICE [SILENT] <endpoint> { group } — federation to a registered
  * endpoint (ast/service/ServiceRegistry.java:67; remote endpoints
  * would go through the RemoteServiceCallImpl analog registered
  * there). The handler's solution joins the enclosing group on shared
  * variables; with `silent`, an unreachable endpoint contributes the
  * unit solution instead of failing (§13.2 SILENT). `runLast` is the
  * reference's `hint:Prior hint:runLast` applied to a SERVICE node
  * (QueryHintRegistry RunLast): the service evaluates AFTER the rest
  * of its group, which licenses binding injection — a variable
  * `fts:search` term resolves per distinct binding computed by the
  * prior patterns (FulltextSearchServiceFactory's multi-request
  * form). Without the hint a variable search term stays a loud error,
  * exactly the reference's evaluation-order behavior. */
final case class ServiceCall(endpoint: String, inner: Algebra,
                             silent: Boolean = false,
                             srcText: Option[String] = None,
                             runLast: Boolean = false) extends Algebra

/** SERVICE [SILENT] ?endpoint { group } — the variable-endpoint form
  * of [[ServiceCall]] (the reference's ServiceCallJoin takes an
  * IVariableOrConstant serviceRef and dispatches per binding,
  * bop/controller/ServiceCallJoin.java:227). The endpoint variable
  * must be bound by the ENCLOSING group (a VoID catalog lookup, a
  * VALUES list, …): evaluation takes the distinct endpoint values
  * from the computed side, dispatches the service group once per
  * endpoint through the same registry as the constant form (SILENT
  * wraps each dispatch), and joins the union — tagged with the
  * endpoint value — back on the endpoint variable plus shared vars.
  * An unbound endpoint variable is a loud error, matching the
  * reference (ServiceCallJoin throws on an unbound serviceRef). */
final case class ServiceCallVar(endpointVar: String, inner: Algebra,
                                silent: Boolean = false,
                                srcText: Option[String] = None) extends Algebra

/** Geospatial search invoked from inside a query — the reference's
  * `geo:search` service (ast/eval/GeoSpatialServiceFactory.java:133,
  * inRectangle mode over z-order indices). Binds (outNode, outLat,
  * outLon) over the source's geo corpus; the compiled plan prunes by
  * covering z-cells before the exact bbox verify. */
final case class GeoService(latMin: Double, latMax: Double,
                            lonMin: Double, lonMax: Double,
                            outNode: String, outLat: String,
                            outLon: String,
                            // geo:timeStart/geo:timeEnd — the
                            // reference's DEFAULT lat-lon-TIME
                            // datatype adds a time-interval constraint
                            time: Option[(Long, Long)] = None,
                            outT: String = "t") extends Algebra

/** geo:search inCircle mode (the reference's pointDistance predicates,
  * com/bigdata/service/geospatial/GeoSpatial.java): points within
  * `radiusKm` of (lat, lon), the circle's bbox pruning z-cells ahead
  * of the exact haversine verify; binds (outNode, outLat, outLon,
  * outDist). */
final case class GeoCircle(lat: Double, lon: Double, radiusKm: Double,
                           outNode: String, outLat: String,
                           outLon: String, outDist: String) extends Algebra
