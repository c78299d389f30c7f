package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed full-text index + search.
  *
  * Blazegraph embeds a full-text index over literal values
  * (bigdata-core/bigdata-rdf/src/java/com/bigdata/search/FullTextIndex.java:
  * tokenize → (token, docId, termFreq) keys; ReadIndexTask scores hits
  * by token weight overlap). Spark-native shape: the inverted index IS
  * a DataFrame `(term, doc_id, tf)` — built with one shuffle on
  * (doc, term) and one on term for document frequencies — and a search
  * is a broadcast semi-join of the (tiny) query-term set against the
  * postings, then a per-doc score aggregation. Scoring = TF·IDF with
  * natural-log IDF, deterministic across engines.
  */
object FullText {

  def tokens(c: Column): Column =
    filter(split(lower(c), "[^a-z0-9]+"), t => length(t) > 0)

  /** Inverted postings (term, doc_id, tf) from docs(doc_id, text). */
  def invertedIndex(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))

  /** Top-k docs for the query terms, scored Σ tf·ln(N/df). */
  def search(docs: DataFrame, query: Seq[String], k: Int = 20): DataFrame = {
    val postings = invertedIndex(docs)
    val dfreq = postings.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.select(count(lit(1)).as("n"))
    val q = docs.sparkSession.createDataFrame(query.map(Tuple1(_))).toDF("term")
    postings
      .join(broadcast(q), "term")
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(n))
      .groupBy("doc_id")
      .agg(round(sum(col("tf") * log(col("n").cast("double") / col("df"))), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }
}
