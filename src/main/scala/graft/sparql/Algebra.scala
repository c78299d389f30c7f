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
final case class Distinct(child: Algebra) extends Algebra
final case class OrderBy(child: Algebra, keys: Seq[Column]) extends Algebra
final case class Slice(child: Algebra, offset: Long, limit: Long) extends Algebra
/** GROUP BY keys with named aggregates; HAVING via an outer Filter. */
final case class Group(child: Algebra, keys: Seq[String], aggs: Seq[(String, Column)]) extends Algebra
/** Sub-SELECT: compiled independently, then joined on shared vars. */
final case class SubQuery(left: Algebra, sub: Algebra) extends Algebra
/** Arbitrary-length path  ?s (step)+ ?o  over a single-predicate step
  * (ArbitraryLengthPathNode): transitive closure by frontier fixpoint. */
final case class PathPlus(s: Term, predicates: Seq[String], o: Term,
                          sVar: String, oVar: String) extends Algebra
