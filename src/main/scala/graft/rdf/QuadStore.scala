package graft.rdf

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Immutable quad-store handle with SPARQL 1.1 graph-management
  * operations (reference: ast/CreateGraph.java:48 and siblings
  * DropGraph / CopyGraph / MoveGraph / AddGraph, evaluated in
  * ast/eval/AST2BOpUpdate.java over Blazegraph's SPOC indices).
  *
  * Functional like [[TripleStore]]: every operation returns a new
  * handle over a derived lazy plan — at production scale these are
  * lakehouse MERGE/partition operations (a named graph maps naturally
  * onto a partition of the quad table, so DROP/MOVE are metadata-level
  * partition ops, not row rewrites).
  *
  * INVARIANT: every graph's triples form a SET — `quads` passed to the
  * constructor must be duplicate-free (RDF graphs are sets; the
  * backing views here are). insertData/LOAD dedup arbitrary incoming
  * data, and every graph-to-graph op preserves the invariant, which is
  * what lets COPY/MOVE be join-free and ADD skip a distinct. A caller
  * holding quads of UNKNOWN provenance must enter through
  * [[QuadStore.ofRaw]], which repairs duplicates once at the boundary
  * instead of every op paying a defensive distinct.
  */
final case class QuadStore(quads: DataFrame) {

  private def cols = Seq("s", "p", "o", "g")

  def graphs: DataFrame = quads.select("g").distinct()

  /** The triples of one named graph. */
  def graph(g: String): DataFrame =
    quads.filter(col("g") === lit(g)).select("s", "p", "o")

  /** CREATE GRAPH — graphs exist implicitly when non-empty (SPARQL
    * allows empty-graph creation; a lazy view has nothing to persist,
    * so CREATE is the identity, matching CREATE SILENT semantics). */
  def createGraph(g: String): QuadStore = this

  /** DROP GRAPH g. */
  def dropGraph(g: String): QuadStore =
    QuadStore(quads.filter(col("g") =!= lit(g)))

  /** ADD from TO to — union `from`'s triples into `to` (set semantics),
    * `from` unchanged. The dedup anti-join is scoped to graph `to` —
    * incoming rows can only collide there, so the right side is one
    * graph, never the whole store. STORE INVARIANT: every graph's
    * triples are a set (insertData dedups arbitrary incoming data;
    * graph-to-graph ops preserve it) — so set-minus-set here needs no
    * extra distinct, saving a graph-sized shuffle per op. */
  def addGraph(from: String, to: String): QuadStore = {
    val incoming = graph(from).withColumn("g", lit(to)).select(cols.map(col): _*)
    val fresh = incoming
      .join(quads.filter(col("g") === lit(to)), cols, "left_anti")
    QuadStore(quads.unionAll(fresh))
  }

  /** COPY from TO to — `to` is replaced by `from`'s triples. The
    * replaced target cannot collide with its replacement, so COPY is
    * join-free: filter out `to`, union `from` relabeled (at production
    * scale: a partition overwrite, no row rewrites). COPY g TO g is a
    * no-op (SPARQL 1.1 Update §3.2.3) — without the guard,
    * drop-then-recopy-from-the-dropped-graph would DELETE it. */
  def copyGraph(from: String, to: String): QuadStore =
    if (from == to) this
    else QuadStore(quads.filter(col("g") =!= lit(to)).unionAll(
      graph(from).withColumn("g", lit(to)).select(cols.map(col): _*)))

  /** MOVE from TO to — COPY then DROP the source; MOVE g TO g is a
    * no-op (SPARQL 1.1 Update §3.2.4). */
  def moveGraph(from: String, to: String): QuadStore =
    if (from == to) this else copyGraph(from, to).dropGraph(from)

  /** INSERT DATA into a named graph (set semantics; dedup scoped to
    * the target graph like [[addGraph]]). */
  def insertData(g: String, triples: DataFrame): QuadStore = {
    val incoming = triples.select("s", "p", "o").withColumn("g", lit(g))
      .select(cols.map(col): _*)
    val fresh = incoming
      .join(quads.filter(col("g") === lit(g)), cols, "left_anti").distinct()
    QuadStore(quads.unionAll(fresh))
  }

  /** INSERT quads that carry their OWN graph tags (the N-Quads LOAD
    * path): set semantics like [[insertData]], with the dedup anti-join
    * keyed on all four columns — at production scale only the touched
    * graphs' partitions participate. */
  def insertQuads(incoming0: DataFrame): QuadStore = {
    val incoming = incoming0.select(cols.map(col): _*).distinct()
    QuadStore(quads.unionAll(incoming.join(quads, cols, "left_anti")))
  }

  /** DELETE DATA from a named graph. */
  def deleteData(g: String, triples: DataFrame): QuadStore = {
    val doomed = triples.select("s", "p", "o").withColumn("g", lit(g))
      .select(cols.map(col): _*)
    QuadStore(quads.join(doomed, cols, "left_anti"))
  }

  /** DELETE quads that carry their OWN graph tags (the quad-template
    * DELETE { GRAPH g { … } } WHERE path): one anti-join keyed on all
    * four columns — only the touched graphs' partitions participate. */
  def deleteQuads(doomed: DataFrame): QuadStore =
    QuadStore(quads.join(doomed.select(cols.map(col): _*).distinct(),
      cols, "left_anti"))

  /** CLEAR ALL. */
  def clear(): QuadStore = QuadStore(quads.limit(0))
}

object QuadStore {
  /** Boundary constructor for quads of unknown provenance: dedups ONCE
    * so the set invariant holds and every subsequent op stays
    * join-free. Use the case-class constructor only for inputs already
    * known duplicate-free (the virtual TPC-H views are). */
  def ofRaw(quads: DataFrame): QuadStore = QuadStore(quads.distinct())
}
