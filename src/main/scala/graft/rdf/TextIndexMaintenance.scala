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
  *  - only literals NEW to the index tokenize. The already-indexed
  *    test NEVER touches the postings relation: it bloom-probes the
  *    index's doc-id SIDECAR map-side (delta-built sketch, exact
  *    verify on the survivor set — the incremental-dedup discipline),
  *    so an append-only sync plans no shuffle at all over index-sized
  *    data ([[membership]], plan-asserted in SearchIndexSpec);
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

  /** Physical plans of the last [[sync]]'s membership/delta
    * DataFrames — test instrumentation (the no-postings-exchange
    * assertion in SearchIndexSpec), the [[Journal.recordParses]]
    * discipline. Not part of the API. */
  @volatile private[graft] var lastSyncPlans: Seq[String] = Nil

  /** The already-indexed members of the candidate id set, WITHOUT
    * consulting the postings relation: ONE map-side bloom-filtered
    * scan of the index's doc-id sidecar (nDocs rows — the sketch is
    * built over the delta, so survivors ≈ |delta| + fpp·nDocs and
    * broadcast into the exact joins). Survivors are real index
    * members — a bloom false positive only inflates the broadcast by
    * an id the delta never mentions, it cannot mis-classify — so no
    * second verify join is needed: the output IS exact membership for
    * every id the delta contains. */
  private def membership(ix: PersistedSearchIndex,
                         candidateIds: DataFrame): DataFrame = {
    if (ix.nDocs == 0) return candidateIds.limit(0)
    val nCand = math.max(1L, candidateIds.count())
    val sketch = candidateIds.select(xxhash64(col("doc_id")).as("h"))
      .stat.bloomFilter("h", nCand, 0.01)
    // bloom prune (map-side, no shuffle over the sidecar) THEN the
    // exact verify as a broadcast semi join keyed by the DELTA — the
    // incremental-dedup discipline. Without the verify the survivors
    // carry ~fpp × nDocs false positives of full literal text, which
    // at a large index is an unbounded forced broadcast downstream.
    ix.liveDocIds
      .filter(
        graft.functions.BloomExprs.bloom_might_contain(xxhash64(col("doc_id")), sketch))
      .join(broadcast(candidateIds.select("doc_id")), Seq("doc_id"), "left_semi")
  }

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
    val probe = membership(ix, touched.select("doc_id"))
    val probePlan = probe.queryExecution.executedPlan.toString
    val present = probe.localCheckpoint()
    val newDocs = live.join(broadcast(present), Seq("doc_id"), "left_anti")
    val gone: DataFrame =
      if (!anyDels) touched.limit(0).select("doc_id")
      else touched.select("doc_id")
        .join(live.select("doc_id"), Seq("doc_id"), "left_anti")
        .join(broadcast(present), Seq("doc_id"), "left_semi")
    lastSyncPlans = Seq(probePlan,
      newDocs.queryExecution.executedPlan.toString,
      gone.queryExecution.executedPlan.toString)
    ix.update(newDocs, gone, head)
    head
  }
}
