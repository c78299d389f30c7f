package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.rdf.TripleStore
import graft.sparql.TripleSource

/** Blueprints WRITE surface over the triple store — the mutation half
  * of `bigdata-blueprints` BigdataGraph (addVertex/addEdge/
  * setProperty/removeVertex mapped onto statement-index mutations;
  * [[PropertyGraph]] is the read half).
  *
  * Functional like [[TripleStore]] itself: every call returns a new
  * handle over a derived lazy plan (production shape: lakehouse MERGE).
  * Deletes keyed by a literal vertex id compile to FILTERs, not
  * anti-joins — constant predicates a partitioned quad table prunes on.
  */
final case class MutableGraph(store: TripleStore) {

  private def one(s: String, p: String, o: String): DataFrame = {
    val spark = store.triples.sparkSession
    import spark.implicits._
    Seq((s, p, o)).toDF("s", "p", "o")
  }

  /** Blueprints addVertex: vertices exist as subjects; the type triple
    * is the vertex record (BigdataGraph maps Vertex → URI + label). */
  def addVertex(id: String, label: String = "Vertex"): MutableGraph =
    MutableGraph(store.insertData(one(id, "type", label)))

  /** Blueprints addEdge: a reference triple src —label→ dst. */
  def addEdge(src: String, label: String, dst: String): MutableGraph =
    MutableGraph(store.insertData(one(src, label, dst)))

  /** Blueprints setProperty: REPLACES any existing value(s) of (v, p) —
    * single-valued property semantics, unlike addEdge's set-union. */
  def setProperty(v: String, p: String, value: String): MutableGraph =
    MutableGraph(TripleStore(
      store.triples.filter(!(col("s") === lit(v) && col("p") === lit(p))))
      .insertData(one(v, p, value)))

  /** Blueprints removeProperty. */
  def removeProperty(v: String, p: String): MutableGraph =
    MutableGraph(TripleStore(
      store.triples.filter(!(col("s") === lit(v) && col("p") === lit(p)))))

  /** Blueprints removeEdge (exact triple). */
  def removeEdge(src: String, label: String, dst: String): MutableGraph =
    MutableGraph(store.deleteData(one(src, label, dst)))

  /** Blueprints removeVertex: drops the vertex's own statements AND
    * every edge referencing it (BigdataGraph removes incident edges). */
  def removeVertex(id: String): MutableGraph =
    MutableGraph(TripleStore(
      store.triples.filter(col("s") =!= lit(id) && col("o") =!= lit(id))))

  /** Read façade over the current state (mutate → traverse). */
  def traversal: PropertyGraph = PropertyGraph(TripleSource.plain(store.triples))
}

object MutableGraph {
  def empty(spark: org.apache.spark.sql.SparkSession): MutableGraph = {
    import spark.implicits._
    MutableGraph(TripleStore(Seq.empty[(String, String, String)].toDF("s", "p", "o")))
  }
}
