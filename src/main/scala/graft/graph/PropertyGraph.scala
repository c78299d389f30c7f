package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sparql.{Const, TriplePattern, TripleSource, Var}

/** Gremlin/Blueprints-style property-graph façade over a triple
  * source — the Spark-native analog of `bigdata-blueprints`
  * (BigdataGraph/BigdataGraphQuery wrap the triple store and translate
  * Blueprints calls into statement-index scans).
  *
  * Vertices are subjects; vertex properties are datatype predicates;
  * edges are reference predicates. A traversal is LAZY: each step
  * composes another DataFrame join against the pattern's access path
  * (`TripleSource.scan`), so `g.V().has("mktsegment","BUILDING")
  * .out("nation")` compiles to the same pruned scans + joins the
  * SPARQL compiler would emit — Catalyst still owns join strategy,
  * and nothing materializes until the caller acts on `df`.
  */
final class PropertyGraph(src: TripleSource) {
  /** All vertices (frontier unset = the full subject set, resolved
    * lazily so `V().has(...)` never materializes it). */
  def V(): Traversal = new Traversal(src, None)

  /** Vertices with a bound id. */
  def V(id: String): Traversal = {
    val spark = src.triples.sparkSession
    import spark.implicits._
    new Traversal(src, Some(Seq(id).toDF("v")))
  }
}

final class Traversal private[graph] (src: TripleSource, frontier: Option[DataFrame]) {

  /** The current frontier as a 1-column (`v`) DataFrame. */
  def df: DataFrame = frontier.getOrElse(
    src.triples.select(col("s").as("v")).distinct())

  private def next(f: DataFrame): Traversal = new Traversal(src, Some(f))

  /** Keep vertices carrying (v, p, value). */
  def has(p: String, value: String): Traversal = {
    val matched = src.scan(TriplePattern(Var("s"), Const(p), Const(value)))
      .select(col("s").as("v"))
    next(frontier.map(_.join(matched, "v")).getOrElse(matched).distinct())
  }

  /** Keep vertices that have SOME value for p. */
  def has(p: String): Traversal = {
    val matched = src.scan(TriplePattern(Var("s"), Const(p), Var("o")))
      .select(col("s").as("v")).distinct()
    next(frontier.map(_.join(matched, "v")).getOrElse(matched))
  }

  /** Follow edge predicate p forward: v → o. */
  def out(p: String): Traversal = {
    val e = src.scan(TriplePattern(Var("s"), Const(p), Var("o")))
      .select(col("s").as("v"), col("o").as("_w"))
    next(df.join(e, "v").select(col("_w").as("v")).distinct())
  }

  /** Follow edge predicate p backward: s → v. */
  def in(p: String): Traversal = {
    val e = src.scan(TriplePattern(Var("s"), Const(p), Var("o")))
      .select(col("o").as("v"), col("s").as("_w"))
    next(df.join(e, "v").select(col("_w").as("v")).distinct())
  }

  /** Property values of the frontier's vertices. */
  def values(p: String): DataFrame = {
    val e = src.scan(TriplePattern(Var("s"), Const(p), Var("o")))
      .select(col("s").as("v"), col("o").as("value"))
    df.join(e, "v").select("value")
  }

  /** Frontier with its properties as (v, p, o) rows — through the
    * source's DESCRIBE access path, so a backed source prefix-prunes
    * the scan set instead of reading the full view. */
  def properties(): DataFrame =
    src.scanForSubjects(df.withColumnRenamed("v", "s"))
}

object PropertyGraph {
  def apply(src: TripleSource): PropertyGraph = new PropertyGraph(src)
}
