package graft.rdf

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.search.PersistedSearchIndex
import graft.sparql.BuiltinServices

/** Keeps a [[graft.search.PersistedSearchIndex]] over a [[Journal]]'s
  * LITERAL space in step with its commits — the composition the
  * reference wires into its SAIL commit path (the text indexer's
  * assert/retract hooks keep com.bigdata.search.FullTextIndex
  * transactionally aligned with the statement indices; here the same
  * contract rides the journal's commit log, the
  * [[graft.inference.MaintainedClosure]] discipline).
  *
  * [[sync]] advances the index from its recorded version to the
  * journal head in ONE batch whose cost scales with the DELTA:
  *  - the candidate literal set comes from the unprocessed commits'
  *    own segments ([[Journal.changedQuads]] — compactions skipped);
  *  - only literals NEW to the index tokenize;
  *  - removals are EXACT: a deleted quad's literal leaves the index
  *    only when no live quad still uses it. The liveness check is the
  *    one non-delta-bounded step — a semi-join of the head snapshot's
  *    object column against the (broadcast, delta-sized) candidates —
  *    and it runs ONLY when the batch contains deletes; the common
  *    append-only ingest path never scans the store. At production
  *    scale the store's O-keyed statement layout (OSP analog) prunes
  *    that check to the candidates' key ranges.
  */
object TextIndexMaintenance {

  /** Build a fresh literal index for the journal's HEAD state at
    * `dir` (one corpus pass), recorded as current to that version. */
  def create(spark: SparkSession, dir: String, journal: Journal,
             analyzer: String = "latin"): PersistedSearchIndex =
    PersistedSearchIndex.create(spark, dir,
      BuiltinServices.literalSpace(journal.snapshot()),
      analyzer = analyzer, termDocIds = true, version = journal.version)

  /** Catch `ix` up to the journal head; no-op when already current.
    * Returns the journal version the index is now current to. */
  def sync(ix: PersistedSearchIndex, journal: Journal): Long = {
    val head = journal.version
    if (ix.version >= head) return head
    val (adds, dels) = journal.changedQuads(ix.version, head)
    // candidate literals touched by the unprocessed commits — the
    // delta's literal space, deduplicated and checkpointed once (it
    // feeds up to three joins below)
    val touched = BuiltinServices.literalSpace(adds.unionAll(dels))
      .localCheckpoint()
    val anyDels = !dels.isEmpty
    val live =
      if (!anyDels) touched // nothing removed: every touched literal is live
      else {
        // liveness = still used by SOME quad at head: filter the
        // snapshot's object column by the broadcast candidate set
        // FIRST (candidate-sized survivors), distinct after
        val liveIds = journal.snapshot(head)
          .select(col("o").cast("string").as("doc_id"))
          .join(broadcast(touched.select("doc_id")), Seq("doc_id"), "left_semi")
          .distinct()
        touched.join(liveIds, "doc_id")
      }
    val ixDocs = ix.view.postings.select("doc_id")
    val newDocs = live.join(ixDocs, Seq("doc_id"), "left_anti")
    val gone: DataFrame =
      if (!anyDels) touched.limit(0).select("doc_id")
      else touched.select("doc_id")
        .join(live.select("doc_id"), Seq("doc_id"), "left_anti")
        .join(ixDocs, Seq("doc_id"), "left_semi")
    ix.update(newDocs, gone, head)
    head
  }
}
