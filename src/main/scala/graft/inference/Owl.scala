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
  *  - owl:TransitiveProperty (RuleOwlTransitiveProperty1.java) —
  *    per declared predicate, a frontier-fixpoint transitive closure.
  *  - owl:inverseOf (RuleOwlInverseOf1/2.java) and
  *    owl:SymmetricProperty — mirror joins, applied after the
  *    transitive step so derived edges get mirrored too.
  *
  * Rule order is stratified (normalize → close → mirror), which
  * reaches the fixpoint in one pass for this rule set: closure inputs
  * are canonicalized, and mirrors of closed edges need no re-closure
  * (the mirror of a transitive closure IS the closure of the mirror).
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

  /** Canonical-id mapping (id → canon) from the instance's explicit
    * sameAs triples plus the pairs functional / inverse-functional
    * properties entail: min label over each sameAs component. */
  def sameAsCanon(instance: DataFrame, ont: Ontology = Ontology()): DataFrame = {
    val explicit = instance.filter(col("p") === "sameAs")
      .select(col("s").as("src"), col("o").as("dst"))
    // functional p: objects sharing a subject co-refer (join stays
    // bounded: per (s, p) the value multiplicity is the point of the
    // declaration — violations are tiny by definition)
    val fn = ont.functional.map { p =>
      val e = instance.filter(col("p") === p)
      e.select(col("s").as("k"), col("o").as("src"))
        .join(e.select(col("s").as("k"), col("o").as("dst")), "k")
        .filter(col("src") < col("dst")).select("src", "dst")
    }
    val ifn = ont.inverseFunctional.map { p =>
      val e = instance.filter(col("p") === p)
      e.select(col("o").as("k"), col("s").as("src"))
        .join(e.select(col("o").as("k"), col("s").as("dst")), "k")
        .filter(col("src") < col("dst")).select("src", "dst")
    }
    val sa = (explicit +: (fn ++ ifn)).reduce(_ unionAll _)
    graft.gas.Analytics.connectedComponents(sa)
      .filter(col("node") =!= col("label"))
      .select(col("node").as("id"), col("label").as("canon"))
  }

  /** OWL closure of (s,p,o) instance triples. sameAs triples are
    * consumed by normalization and not re-emitted. */
  def closure(instance: DataFrame, ont: Ontology): DataFrame = {
    val canon = sameAsCanon(instance, ont)

    // The canonical map is INSTANCE-derived (explicit sameAs triples +
    // functional-property entailments) — unlike the ontology tables it
    // is not broadcast-sized by definition and can reach billions of
    // rows on a web-scale corpus. No broadcast hint: AQE broadcasts
    // when the runtime size estimate fits, shuffles otherwise.
    def normalize(df: DataFrame): DataFrame = df
      .join(canon.withColumnRenamed("id", "s").withColumnRenamed("canon", "_cs"),
        Seq("s"), "left")
      .join(canon.withColumnRenamed("id", "o").withColumnRenamed("canon", "_co"),
        Seq("o"), "left")
      .select(coalesce(col("_cs"), col("s")).as("s"), col("p"),
              coalesce(col("_co"), col("o")).as("o"))

    val base = normalize(instance.filter(col("p") =!= "sameAs"))

    // owl:TransitiveProperty — closure per declared predicate
    val closed = ont.transitive.foldLeft(base) { (acc, p) =>
      val step = acc.filter(col("p") === p)
        .select(col("s").as("from"), col("o").as("to"))
      val tc = graft.sparql.Compiler.transitiveClosure(step)
        .select(col("from").as("s"), lit(p).as("p"), col("to").as("o"))
      acc.filter(col("p") =!= p).unionAll(tc)
    }

    // owl:inverseOf (both directions) + owl:SymmetricProperty mirrors
    val invPairs = ont.inverses.flatMap { case (p, q) => Seq(p -> q, q -> p) } ++
      ont.symmetric.map(p => p -> p)
    val mirrored = invPairs.map { case (p, q) =>
      closed.filter(col("p") === p)
        .select(col("o").as("s"), lit(q).as("p"), col("s").as("o"))
    }

    (closed +: mirrored).reduce(_ unionAll _).distinct()
  }
}
