package graft.inference

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RDFS forward-chaining closure.
  *
  * Blazegraph materializes RDFS entailments at load time with its rule
  * engine (bigdata-core/bigdata-rdf/src/java/com/bigdata/rdf/rules/
  * RuleRdfs05.java, RuleRdfs07.java, RuleRdfs09.java, RuleRdfs11.java,
  * RuleRdfs02.java, RuleRdfs03.java + InferenceEngine). The rule set is
  * stratified, so instead of a generic semi-naive datalog loop we:
  *   1. close subClassOf / subPropertyOf transitively (rdfs11 / rdfs5)
  *      — tiny ontology tables, frontier fixpoint;
  *   2. lift properties along subPropertyOf (rdfs7);
  *   3. apply domain/range typing (rdfs2 / rdfs3);
  *   4. lift types along subClassOf (rdfs9).
  * Each step is a broadcast join of the instance data against the
  * (closed, tiny) ontology — no instance-side shuffle at all, which is
  * the right plan at 100 TB: the ontology is always broadcast-sized.
  */
object Rdfs {

  case class Ontology(subClassOf: DataFrame,    // (sub, sup)
                      subPropertyOf: DataFrame, // (sub, sup)
                      domain: DataFrame,        // (p, cls)
                      range: DataFrame)         // (p, cls)

  /** Transitive closure of a (sub, sup) ontology table, computed on the
    * driver: ontologies are broadcast-sized by definition (unlike the
    * instance data), so a Spark fixpoint would spend more on job
    * scheduling than on work. */
  private def closeTiny(df: DataFrame): DataFrame = {
    val pairs = df.collect().map(r => (r.getString(0), r.getString(1))).toSet
    var closure = pairs
    var grown = true
    while (grown) {
      val next = closure ++ (for {
        (a, b) <- closure; (c, d) <- pairs if b == c
      } yield (a, d))
      grown = next.size > closure.size
      closure = next
    }
    val spark = df.sparkSession
    import spark.implicits._
    closure.toSeq.sorted.toDF("from", "to")
  }

  /** Full closure of instance triples (s,p,o) under the ontology.
    *
    * The instance slice is materialized ONCE (localCheckpoint; a
    * cluster run would persist/checkpoint reliably): the stratified
    * rule tree references it from 8 subtrees, and without the
    * materialization every subtree re-scans the source — the same
    * read-amplification a load-time closure materialization avoids in
    * the reference's InferenceEngine.
    *
    * `axiomatic` additionally emits the RDF/RDFS axiomatic-rule
    * entailments rdf1, rdfs4a/4b, rdfs6, rdfs8, rdfs10, rdfs12, rdfs13
    * (reference: rules/RuleRdf01.java, RuleRdfs04a.java and siblings —
    * Blazegraph ships them behind its axioms/forwardChain options,
    * commonly OFF because they type every term as Resource/Property;
    * same default here). All are map-side projections/distincts of the
    * instance slice — no joins. */
  /** Provably-empty check WITHOUT running a job: true only when the
    * optimized plan is an empty LocalRelation (Seq.empty.toDF, or the
    * localized dynamic-mode ontologies [[MaintainedClosure]] builds).
    * A false negative just takes the general path. */
  private[inference] def provablyEmpty(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan match {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
        l.data.isEmpty
      case _ => false
    }

  private[inference] def provablyEmpty(ont: Ontology): Boolean =
    Seq(ont.subClassOf, ont.subPropertyOf, ont.domain, ont.range)
      .forall(provablyEmpty)

  def closure(instance: DataFrame, ont: Ontology, axiomatic: Boolean = false): DataFrame = {
    // EMPTY program (all four ontology tables provably empty, no
    // axiomatic rules): every rule is a no-op and the closure is the
    // instance set itself — skip the two materializations (inst,
    // lifted), the two closeTiny collects and the 8-subtree union
    // plan. The truth-maintenance fast tiers hit this on every commit
    // of an RDFS-empty store (measured: ~50 driver-blocking jobs per
    // tm_dynamic commit, the job-count floor being the whole cost at
    // sf0.1).
    if (!axiomatic && provablyEmpty(ont)) return instance.distinct()
    val subC = closeTiny(ont.subClassOf)
    val subP = closeTiny(ont.subPropertyOf)
    val inst = instance.localCheckpoint()

    // rdfs7: (s p o) & p ⊑* q → (s q o)  (4 downstream consumers →
    // materialized too)
    val lifted = inst.unionAll(
      inst.join(broadcast(subP), inst("p") === subP("from"))
        .select(col("s"), col("to").as("p"), col("o")))
      .localCheckpoint()

    // rdfs2/3: domain & range typing (applied post-lift)
    val domTypes = lifted.join(broadcast(ont.domain), lifted("p") === ont.domain("p"))
      .select(col("s"), lit("type").as("p"), col("cls").as("o"))
    val rngTypes = lifted.join(broadcast(ont.range), lifted("p") === ont.range("p"))
      .select(col("o").as("s"), lit("type").as("p"), col("cls").as("o"))

    val types0 = lifted.filter(col("p") === "type")
      .unionAll(domTypes).unionAll(rngTypes)

    // rdfs9: (s type c) & c ⊑* c' → (s type c')
    val types = types0.unionAll(
      types0.join(broadcast(subC), types0("o") === subC("from"))
        .select(col("s"), lit("type").as("p"), col("to").as("o")))

    val core = lifted.filter(col("p") =!= "type").unionAll(types)
    val full = if (!axiomatic) core else {
      // rdf1: every used predicate is a Property
      val rdf1 = inst.select(col("p").as("s")).distinct()
        .select(col("s"), lit("type").as("p"), lit("Property").as("o"))
      // rdfs4a/4b: every subject and object is a Resource
      val rdfs4 = inst.select(col("s"))
        .unionAll(inst.select(col("o").as("s"))).distinct()
        .select(col("s"), lit("type").as("p"), lit("Resource").as("o"))
      // rdfs6: p type Property → p ⊑ p (reflexive, over rdf1's set)
      val rdfs6 = inst.select(col("p").as("s")).distinct()
        .select(col("s"), lit("subPropertyOf").as("p"), col("s").as("o"))
      // rdfs8/10: c type Class → c ⊑ Resource, c ⊑ c — classes here are
      // the type objects in play (the model types instances, not classes)
      val classes = types0.select(col("o").as("s")).distinct()
      val rdfs8 = classes.select(col("s"), lit("subClassOf").as("p"), lit("Resource").as("o"))
      val rdfs10 = classes.select(col("s"), lit("subClassOf").as("p"), col("s").as("o"))
      // rdfs12/13: container-membership properties / datatypes (empty
      // unless the vocabulary appears)
      val rdfs12 = types0.filter(col("o") === "ContainerMembershipProperty")
        .select(col("s"), lit("subPropertyOf").as("p"), lit("member").as("o"))
      val rdfs13 = types0.filter(col("o") === "Datatype")
        .select(col("s"), lit("subClassOf").as("p"), lit("Literal").as("o"))
      Seq(core, rdf1, rdfs4, rdfs6, rdfs8, rdfs10, rdfs12, rdfs13).reduce(_ unionAll _)
    }
    full.distinct()
  }

  /** Incremental assertion — the truth-maintenance fast path
    * (reference: com.bigdata.rdf.inf.TruthMaintenance +
    * SPOAssertionBuffer: newly asserted statements run through the
    * rules against the already-closed store instead of re-closing
    * everything). The RDFS rule set is stratified with broadcast-sized
    * ontology tables, so the delta's entailments depend only on the
    * delta itself: closing the delta alone and unioning is exact.
    * Retraction has no such shortcut (a derived triple may have other
    * supports) — the Spark-native answer is that the closure is a
    * recomputable VIEW, so retraction = recompute (reference gets the
    * same effect via its "database-at-once" closure mode). */
  def incrementalClosure(closed: DataFrame, delta: DataFrame, ont: Ontology): DataFrame =
    closed.unionAll(closure(delta, ont)).distinct()

  /** Incremental RETRACTION via delete-rederive (DRed; reference:
    * com.bigdata.rdf.inf.TruthMaintenance retraction path, which
    * likewise computes the focused closure of the removed statements
    * and re-derives survivors, rather than re-closing the store).
    *
    * The RDFS rule set's derivations are UNARY chains from single base
    * statements (every join partner is a broadcast-sized ontology
    * table), so:
    *  1. overdelete = closure(retracted) — everything the retracted
    *     statements could ever have derived (|retracted|-sized);
    *  2. supporters = surviving base statements sharing a subject or
    *     object with an overdeleted triple — the only rows whose
    *     derivation chains can re-support one (retraction-sized
    *     semi-joins against the base, never a full re-closure);
    *  3. rederive = closure(supporters) ∩ overdelete;
    *  4. result = closed − overdelete + rederived.
    * Cost scales with |retracted| and its neighborhood, not |store|. */
  def retractClosure(closed: DataFrame, base: DataFrame,
                     retracted: DataFrame, ont: Ontology): DataFrame =
    closed.join(retractRemoved(base, retracted, ont), Seq("s", "p", "o"), "left_anti")

  /** The delta-scoped REMOVED set of a retraction: overdelete minus
    * what the retraction's neighborhood re-derives (steps 1-3 of the
    * DRed recipe) — |retracted|-sized, never |store|-sized. This is
    * what a maintained-closure store commits as tombstones
    * ([[MaintainedClosure]]); [[retractClosure]] is one anti-join on
    * top of it. */
  def retractRemoved(base: DataFrame, retracted: DataFrame,
                     ont: Ontology): DataFrame = {
    val spo = Seq("s", "p", "o")
    val over = closure(retracted, ont).localCheckpoint()
    val remaining = base.join(retracted.select(spo.map(col): _*), spo, "left_anti")
    val keys = over.select(col("s"))
      .unionAll(over.select(col("o").as("s"))).distinct()
    val supporters = remaining.join(keys, Seq("s"), "left_semi")
      .select(spo.map(col): _*)
      .unionAll(remaining.join(keys.withColumnRenamed("s", "o"), Seq("o"), "left_semi")
        .select(spo.map(col): _*))
      .distinct()
    val rederived = closure(supporters, ont).join(over, spo, "left_semi")
    over.join(rederived, spo, "left_anti")
  }
}
