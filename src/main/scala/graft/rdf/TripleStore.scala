package graft.rdf

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Immutable triple-store handle with SPARQL-UPDATE-shaped operations.
  *
  * Blazegraph's UPDATE path (bigdata-core/bigdata-rdf/src/java/com/
  * bigdata/rdf/sparql/ast/DeleteInsertGraph.java, eval in
  * ast/eval/AST2BOpUpdate.java) mutates B+Tree indices under a
  * read/write transaction. The Spark-native equivalent is functional:
  * each operation returns a NEW store whose DataFrame is the old plan
  * plus an anti-join (delete) and/or union (insert) — the natural shape
  * for a lakehouse table (Delta/Iceberg MERGE at production scale;
  * in-memory lazy plan here).
  */
final case class TripleStore(triples: DataFrame) {

  /** DELETE WHERE: remove triples matching the (s,p,o) result of a
    * pattern DataFrame with columns s,p,o. */
  def deleteData(toDelete: DataFrame): TripleStore =
    TripleStore(triples.join(toDelete.select("s", "p", "o"), Seq("s", "p", "o"), "left_anti"))

  /** INSERT DATA / INSERT WHERE (set semantics on the inserted batch). */
  def insertData(toInsert: DataFrame): TripleStore =
    TripleStore(triples.unionAll(
      toInsert.select("s", "p", "o")
        .join(triples, Seq("s", "p", "o"), "left_anti").distinct()))

  /** DELETE/INSERT WHERE: templates instantiated against the pre-update
    * state, deletes applied before inserts (SPARQL 1.1 Update §3.1.3). */
  def deleteInsert(toDelete: DataFrame, toInsert: DataFrame): TripleStore =
    deleteData(toDelete).insertData(toInsert)

  /** CLEAR ALL / DROP. */
  def clear(): TripleStore = TripleStore(triples.limit(0))

  def filterP(p: String): DataFrame = triples.filter(col("p") === lit(p))
}
