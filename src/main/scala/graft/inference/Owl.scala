package graft.inference

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** OWL-ish forward-chaining rules layered over [[Rdfs]].
  *
  * Covers the rule families Blazegraph ships beyond RDFS
  * (bigdata-core/bigdata-rdf/src/java/com/bigdata/rdf/rules/):
  *  - owl:sameAs (RuleOwlSameAs1/2/3.java) — handled as co-reference
  *    NORMALIZATION: the sameAs graph's connected components pick a
  *    canonical id (min label) and every triple is rewritten onto the
  *    canonical ids. Materializing the pairwise sameAs clique is
  *    O(k²) per clique; normalization is the shape that scales (it is
  *    also what Blazegraph's "vocab + IV smush" effectively does).
  *  - owl:FunctionalProperty / owl:InverseFunctionalProperty — entail
  *    sameAs pairs; derived ON CANONICAL ids to fixpoint, since a
  *    merge can expose new shared keys (s1 sameAs s2, s1 p o1,
  *    s2 p o2 ⇒ o1 sameAs o2 only after s1/s2 merge).
  *  - owl:TransitiveProperty (RuleOwlTransitiveProperty1.java) —
  *    per declared predicate, a frontier-fixpoint transitive closure.
  *  - owl:inverseOf (RuleOwlInverseOf1/2.java) and
  *    owl:SymmetricProperty — mirror joins applied BOTH before the
  *    transitive step (so closures compose through mirrored edges —
  *    a symmetric+transitive predicate needs its base symmetrized
  *    first) and after it (so closed edges reflect into the inverse
  *    partner). The closure of a symmetrized relation is symmetric,
  *    so this stratification reaches the fixpoint: the post-mirror
  *    introduces no edge the closure step would grow further.
  */
object Owl {

  /** Declarative bits of the ontology (the instance data carries the
    * `sameAs` triples themselves). `functional` properties derive
    * sameAs: (s p o₁) ∧ (s p o₂) ⇒ o₁ sameAs o₂
    * (RuleOwlFunctionalProperty); `inverseFunctional` mirrors it on
    * the subject side (RuleOwlInverseFunctionalProperty). */
  case class Ontology(transitive: Seq[String] = Nil,
                      inverses: Seq[(String, String)] = Nil,
                      symmetric: Seq[String] = Nil,
                      functional: Seq[String] = Nil,
                      inverseFunctional: Seq[String] = Nil)

  /** Rewrite s/o onto canonical ids. The canonical map is
    * INSTANCE-derived (explicit sameAs triples + functional-property
    * entailments) — unlike the ontology tables it is not
    * broadcast-sized by definition and can reach billions of rows on a
    * web-scale corpus. No broadcast hint: AQE broadcasts when the
    * runtime size estimate fits, shuffles otherwise. */
  private[inference] def normalizeBy(df: DataFrame, canon: DataFrame): DataFrame = df
    .join(canon.withColumnRenamed("id", "s").withColumnRenamed("canon", "_cs"),
      Seq("s"), "left")
    .join(canon.withColumnRenamed("id", "o").withColumnRenamed("canon", "_co"),
      Seq("o"), "left")
    .select(coalesce(col("_cs"), col("s")).as("s"), col("p"),
            coalesce(col("_co"), col("o")).as("o"))

  /** sameAs pairs functional / inverse-functional properties entail on
    * `inst` (joins stay bounded: per key the value multiplicity is the
    * point of the declaration — violations are tiny by definition). */
  private def entailedPairs(inst: DataFrame, ont: Ontology): Seq[DataFrame] = {
    val fn = ont.functional.map { p =>
      val e = inst.filter(col("p") === p)
      e.select(col("s").as("k"), col("o").as("src"))
        .join(e.select(col("s").as("k"), col("o").as("dst")), "k")
        .filter(col("src") < col("dst")).select("src", "dst")
    }
    val ifn = ont.inverseFunctional.map { p =>
      val e = inst.filter(col("p") === p)
      e.select(col("o").as("k"), col("s").as("src"))
        .join(e.select(col("o").as("k"), col("s").as("dst")), "k")
        .filter(col("src") < col("dst")).select("src", "dst")
    }
    fn ++ ifn
  }

  /** Pair count below which components resolve with a driver-side
    * union-find instead of the distributed label-propagation loop:
    * sameAs cliques are tiny in practice (the closeTiny discipline —
    * co-reference declarations are vocabulary-shaped), and the
    * distributed loop costs ~8 driver-blocking jobs per call. Above
    * the bound (a genuinely instance-scale co-reference graph) the
    * distributed path takes over unchanged. */
  private val LocalComponentsBound = 100000L

  private def componentsOf(pairs: DataFrame): DataFrame = {
    // callers hand a localCheckpoint'ed pair set — the count is cheap
    if (pairs.count() <= LocalComponentsBound) {
      val spark = pairs.sparkSession
      import spark.implicits._
      val parent = scala.collection.mutable.HashMap.empty[String, String]
      def find(x: String): String = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x // path compression
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      pairs.collect().foreach { row =>
        val (a, b) = (find(row.getString(0)), find(row.getString(1)))
        if (a != b) parent(if (a < b) b else a) = if (a < b) a else b
      }
      // min ORIGINAL label per component (union-by-min keeps the root
      // minimal, matching connectedComponents' min-label semantics)
      parent.keys.toSeq.sorted
        .map(id => (id, find(id)))
        .filter { case (id, c) => id != c }
        .toDF("id", "canon")
    } else
      graft.gas.Analytics.connectedComponents(pairs, maxIter = 256)
        .filter(col("node") =!= col("label"))
        .select(col("node").as("id"), col("label").as("canon"))
  }

  /** Canonical-id mapping (id → canon): min label over each sameAs
    * component, iterated with the functional-property entailments to
    * FIXPOINT — a merge can expose new shared functional keys, so
    * pairs are re-derived on canonicalized ids until no new
    * co-reference appears (rounds track sameAs/functional nesting
    * depth; 1-2 in practice, capped defensively). */
  def sameAsCanon(instance: DataFrame, ont: Ontology = Ontology()): DataFrame = {
    val explicit = instance.filter(col("p") === "sameAs")
      .select(col("s").as("src"), col("o").as("dst"))
    var pairs = (explicit +: entailedPairs(instance, ont))
      .reduce(_ unionAll _).localCheckpoint()
    // no co-reference at all (common on structural-only stores): the
    // canonical map is empty — return a LocalRelation so downstream
    // normalizeBy joins fold away under PropagateEmptyRelation instead
    // of paying the connected-components loop's jobs on nothing
    if (pairs.isEmpty) {
      val spark = instance.sparkSession
      import spark.implicits._
      return Seq.empty[(String, String)].toDF("id", "canon")
    }
    var canon = componentsOf(pairs)
    if (ont.functional.nonEmpty || ont.inverseFunctional.nonEmpty) {
      var round = 0
      var done = false
      while (!done && round < 8) {
        // derive on CANONICAL ids: two objects already co-referent
        // normalize to one id and drop out under src < dst, so every
        // surviving pair is a genuinely new merge
        val fresh = entailedPairs(normalizeBy(instance, canon), ont)
          .reduceOption(_ unionAll _)
          .map(_.localCheckpoint())
        if (fresh.forall(_.isEmpty)) done = true
        else {
          pairs = pairs.unionAll(fresh.get).localCheckpoint()
          canon = componentsOf(pairs)
          round += 1
        }
      }
      // silent truncation would return an incomplete canonical map —
      // same hard-fail policy as the Compiler closure guards
      require(done, s"sameAs/functional-property fixpoint did not converge in 8 rounds")
    }
    canon
  }

  /** owl:equivalentClass / owl:equivalentProperty
    * (RuleOwlEquivalentClass.java / RuleOwlEquivalentProperty.java):
    * a ≡ b ⇔ a ⊑ b ∧ b ⊑ a, so equivalences fold into the RDFS
    * ontology as MUTUAL sub-edges — the existing broadcast-sized
    * closeTiny closures and rdfs7/rdfs9 lifts then entail both
    * directions with no new rule machinery (and equivalence composes
    * transitively with declared sub-edges for free). */
  def withEquivalences(ont: Rdfs.Ontology,
                       equivalentClasses: Seq[(String, String)] = Nil,
                       equivalentProperties: Seq[(String, String)] = Nil): Rdfs.Ontology = {
    val spark = ont.subClassOf.sparkSession
    import spark.implicits._
    def mutual(ps: Seq[(String, String)]) = ps.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val subC =
      if (equivalentClasses.isEmpty) ont.subClassOf
      else ont.subClassOf.unionAll(mutual(equivalentClasses).toDF("sub", "sup"))
    val subP =
      if (equivalentProperties.isEmpty) ont.subPropertyOf
      else ont.subPropertyOf.unionAll(mutual(equivalentProperties).toDF("sub", "sup"))
    ont.copy(subClassOf = subC, subPropertyOf = subP)
  }

  /** owl:hasValue (RuleOwlHasValue.java): a restriction class R with
    * owl:onProperty p / owl:hasValue v types every instance holding
    * (x p v): (x p v) ⇒ (x type R). `restrictions(cls, p, v)` is
    * declarative ontology — broadcast-sized by definition — so this is
    * ONE broadcast join against the instance data, no shuffle. Union
    * the result into the instance BEFORE an RDFS closure and the
    * restriction types lift through subClassOf like any other. */
  def hasValueTypes(instance: DataFrame, restrictions: DataFrame): DataFrame =
    instance
      .join(broadcast(restrictions.select(col("cls"), col("p"), col("v").as("o"))),
        Seq("p", "o"))
      .select(col("s"), lit("type").as("p"), col("cls").as("o"))

  /** NEW pairs of TC(closed ∪ delta) given `closed` ALREADY
    * transitively closed — every pair whose derivation uses ≥1 delta
    * edge (semi-naive over one-delta-segment paths: f1 = T?∘D∘T?
    * absorbs the closed runs around each delta segment because T is
    * closed, so T∘T = T; longer paths chain f1 pieces, and a chained
    * pair already present in T is safely dropped from the frontier —
    * any extension through it re-derives as T∘f1 ⊆ f1). Columns
    * (from, to) on both inputs; output excludes pairs already in
    * `closed`. The incremental-maintenance kernel
    * [[graft.inference.MaintainedClosure]] uses for non-merge
    * transitive asserts — joins are delta-keyed (the delta side
    * drives both composes), never a re-closure of the relation. */
  private[inference] def incrementalTc(closed: DataFrame, delta: DataFrame): DataFrame = {
    def comp(x: DataFrame, y: DataFrame): DataFrame =
      x.select(col("from"), col("to").as("m"))
        .join(y.select(col("from").as("m"), col("to")), "m")
        .select("from", "to")
    val d = delta.distinct().localCheckpoint()
    if (d.isEmpty) return d
    val t = closed.localCheckpoint()
    val f1 = d.unionAll(comp(t, d)).unionAll(comp(d, t))
      .unionAll(comp(comp(t, d), t))
      .distinct().localCheckpoint()
    // PATH DOUBLING: f1 already holds every path crossing exactly ONE
    // delta edge (t is closed, so its runs are single edges), and
    // composing the accumulator with itself doubles the number of
    // delta edges a path may cross per round — k rounds cover 2^k
    // delta edges on one path, so convergence depth is logarithmic in
    // the longest delta chain (a 64-round cap is unreachable; the
    // prior frontier∘f1 form grew linearly and a >64-edge chain in
    // ONE commit failed loud)
    var acc = f1
    var rounds = 0
    var done = false
    while (!done && rounds < 64) {
      val grown = comp(acc, acc)
        .join(acc, Seq("from", "to"), "left_anti")
        .join(t, Seq("from", "to"), "left_anti")
        .distinct().localCheckpoint()
      if (grown.isEmpty) done = true
      else {
        // disjoint by grown's anti-join; both sides internally distinct
        acc = acc.unionAll(grown).localCheckpoint()
        rounds += 1
      }
    }
    require(done, "incremental transitive closure did not converge (doubling, 64 rounds)")
    acc.join(t, Seq("from", "to"), "left_anti")
  }

  /** OWL closure of (s,p,o) instance triples. sameAs triples are
    * consumed by normalization and not re-emitted. */
  def closure(instance: DataFrame, ont: Ontology): DataFrame = {
    val canon = sameAsCanon(instance, ont)
    val base = normalizeBy(instance.filter(col("p") =!= "sameAs"), canon)

    val invPairs = ont.inverses.flatMap { case (p, q) => Seq(p -> q, q -> p) } ++
      ont.symmetric.map(p => p -> p)

    // PRE-mirror: symmetric/inverse base edges must exist in both
    // directions BEFORE the transitive step, or compositions through
    // mirrored edges are lost (a knows b, c knows b, knows
    // symmetric+transitive ⇒ a knows c)
    val preMirrored = invPairs.map { case (p, q) =>
      base.filter(col("p") === p)
        .select(col("o").as("s"), lit(q).as("p"), col("s").as("o"))
    }
    val seeded = (base +: preMirrored).reduce(_ unionAll _)

    // owl:TransitiveProperty — closure per declared predicate
    val closed = ont.transitive.foldLeft(seeded) { (acc, p) =>
      val step = acc.filter(col("p") === p)
        .select(col("s").as("from"), col("o").as("to"))
      val tc = graft.sparql.Compiler.transitiveClosure(step)
        .select(col("from").as("s"), lit(p).as("p"), col("to").as("o"))
      acc.filter(col("p") =!= p).unionAll(tc)
    }

    // POST-mirror: closed edges reflect into the inverse partner (the
    // closure of a symmetrized relation is symmetric, so nothing here
    // would grow further under the transitive step)
    val mirrored = invPairs.map { case (p, q) =>
      closed.filter(col("p") === p)
        .select(col("o").as("s"), lit(q).as("p"), col("s").as("o"))
    }

    (closed +: mirrored).reduce(_ unionAll _).distinct()
  }
}
