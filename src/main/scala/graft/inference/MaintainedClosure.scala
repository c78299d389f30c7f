package graft.inference

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.rdf.Journal

/** Truth maintenance over the PERSISTENT store — the reference wires
  * TruthMaintenance (com.bigdata.rdf.inf.TruthMaintenance) into its
  * commit path: each assert/retract buffer updates the closed store's
  * indices, and every commit point therefore contains its own
  * entailments. Here the same contract rides two [[Journal]]s:
  *
  *  - `base/`   — the asserted statements, commit per mutation;
  *  - `closed/` — the MAINTAINED closure, whose commits carry exactly
  *    the entailment DELTA of the mutation (incremental closure on
  *    assert; DRed removed-set tombstones on retract — both
  *    |delta|-sized, never a store re-closure).
  *
  * So `closure(v)` time-travels the ENTAILED state: a historical read
  * sees the inferences that held at that commit point, exactly like a
  * read-only transaction against a reference commitTime. A retracted
  * statement that is still derivable from surviving statements stays
  * in the closure (DRed rederive) — the reference's TM semantics.
  *
  * Triples journal as quads under one fixed graph tag.
  */
final class MaintainedClosure private (spark: SparkSession,
                                       ont: Rdfs.Ontology,
                                       baseJ: Journal, closedJ: Journal) {

  private val G = "g:closure"
  private def withG(t: DataFrame): DataFrame =
    t.select(col("s"), col("p"), col("o"), lit(G).as("g"))
  private def stripG(q: DataFrame): DataFrame = q.select("s", "p", "o")
  private def none: DataFrame = withG(baseJ.snapshot(0))

  /** Latest commit point (base and closed journals advance in step). */
  def version: Long = baseJ.version

  /** Assert a statement batch: the delta's closure (exact — the RDFS
    * strata join only broadcast-sized ontology tables, so entailments
    * of the delta depend on the delta alone) lands as ONE closed-store
    * commit; duplicates against already-entailed rows resolve by the
    * journal's set semantics. */
  def assertTriples(delta: DataFrame): Long = {
    val d = delta.select("s", "p", "o").distinct().localCheckpoint()
    baseJ.append(withG(d))
    closedJ.append(withG(Rdfs.closure(d, ont)))
  }

  /** Retract a statement batch via DRed: tombstone exactly the rows
    * whose every derivation died ([[Rdfs.retractRemoved]] — overdelete
    * minus the neighborhood's rederivations). */
  def retractTriples(retracted: DataFrame): Long = {
    val r = retracted.select("s", "p", "o").distinct().localCheckpoint()
    val removed = Rdfs
      .retractRemoved(stripG(baseJ.snapshot()), r, ont)
      .localCheckpoint()
    baseJ.commit(adds = none, dels = withG(r))
    closedJ.commit(adds = none, dels = withG(removed))
  }

  /** The asserted statements at commit point `v` (default latest). */
  def base(v: Long = -1L): DataFrame = stripG(baseJ.snapshot(v))

  /** The ENTAILED state at commit point `v` (default latest). */
  def closure(v: Long = -1L): DataFrame = stripG(closedJ.snapshot(v))

  /** Seal both journals' current state for fast steady-state reads. */
  def compact(): Unit = { baseJ.compact(); closedJ.compact(); () }

  /** Lockstep recovery — assert/retract commit the two journals
    * non-atomically (base first), so a crash between the two publishes
    * leaves the closure exactly ONE commit behind. [[MaintainedClosure.open]]
    * calls this: the missing closure delta is recomputed from the base
    * journal's own last commit (adds → incremental closure, dels →
    * DRed removed-set against the pre-commit base — the same
    * |delta|-shaped math the live paths use, though the recovery diff
    * itself reads two base snapshots; recovery is a crash-rare path).
    * Any other version skew has no single-step repair and fails loud. */
  private def repairLockstep(): Unit = {
    val bv = baseJ.version
    val cv = closedJ.version
    if (bv == cv) ()
    else if (bv == cv + 1) {
      val before = stripG(baseJ.snapshot(cv)).localCheckpoint()
      val after = stripG(baseJ.snapshot(bv)).localCheckpoint()
      val added = after.exceptAll(before)
      val retracted = before.exceptAll(after)
      // the crash may have hit INSIDE the closure journal's own commit
      // — after its segment write, before its record publish. Those
      // orphan segments are unreachable by readers but would make the
      // recovery commit's own segment write fail (`errorifexists`);
      // clear them first so recovery converges instead of wedging.
      closedJ.dropOrphanSegments(cv + 1)
      closedJ.commit(
        adds = withG(Rdfs.closure(added, ont)),
        dels = withG(Rdfs.retractRemoved(before, retracted, ont)))
      ()
    } else throw new IllegalStateException(
      s"maintained store out of step beyond repair: base at v$bv, closure at v$cv")
  }
}

object MaintainedClosure {
  /** Initialize at `dir` (creates `dir/base` and `dir/closed`). */
  def create(spark: SparkSession, dir: String,
             ont: Rdfs.Ontology): MaintainedClosure =
    new MaintainedClosure(spark, ont,
      Journal.create(spark, s"$dir/base"), Journal.create(spark, s"$dir/closed"))

  /** Reattach to an existing maintained store, verifying the two
    * journals advance in lockstep and rolling the closure forward by
    * one recomputed delta if a crash landed between their commits. */
  def open(spark: SparkSession, dir: String,
           ont: Rdfs.Ontology): MaintainedClosure = {
    val tm = new MaintainedClosure(spark, ont,
      Journal.open(spark, s"$dir/base"), Journal.open(spark, s"$dir/closed"))
    tm.repairLockstep()
    tm
  }
}
