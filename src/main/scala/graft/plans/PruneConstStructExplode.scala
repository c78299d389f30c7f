package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Statically prunes constant struct branches out of
  * `Filter(explode(array(struct(lit, …), …)))` plans — the optimizer
  * half of bound-predicate access-path selection over an
  * explode-shaped triple/quad view.
  *
  * The engine's row-to-triples views emit each table row as
  * `explode(array(struct('name', c_name), struct('type', 'Customer'),
  * …))`: one scan per table, k facts per row. A triple-pattern scan
  * with a bound predicate then filters `po.p = 'name'` ABOVE the
  * explode, which Spark evaluates by exploding every row k ways and
  * discarding k−1 of them — and a table that doesn't carry the
  * predicate at all (lineitem has no `name`) still pays a full scan +
  * explode for zero surviving rows. At 100-TB fact tables that is the
  * difference between scanning five small dimension tables and
  * scanning the whole corpus per pattern.
  *
  * The rule substitutes each array element's struct fields into the
  * filter's conjuncts; an element whose substituted conjunct folds to
  * FALSE (or null — AND-semantics reject the row anyway) can never
  * produce a surviving row and is dropped from the array. When no
  * element survives, the whole branch collapses to an empty relation
  * — union pruning then removes the table's scan entirely. Elements
  * whose substitution is not foldable (a data column) are always
  * kept, so the rewrite is strictly semantics-preserving. `outer`
  * explodes are left alone (dropping elements there could change
  * null-row emission).
  *
  * Registered through [[graft.functions.GraftExtensions]]
  * (`injectOptimizerRule`), which places it INSIDE the operator-
  * optimization fixed point — column pruning re-runs after a prune,
  * so a surviving branch's parquet scan narrows to the columns its
  * remaining structs reference (`ReadSchema` shows only the bound
  * predicate's columns).
  *
  * Reference analog: Blazegraph picks the POS/OSP statement index per
  * triple pattern's bound positions
  * (bigdata-rdf/src/java/com/bigdata/rdf/spo/SPOKeyOrder.java:733
  * `getKeyOrder`, bigdata/src/java/com/bigdata/relation/accesspath/
  * AccessPath.java) so a bound-predicate scan never touches unrelated
  * statements; here the same selectivity falls out of constant
  * folding the view's branch structure.
  */
object PruneConstStructExplode extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case fil @ Filter(cond,
        gen @ Generate(Explode(arr @ CreateArray(elems, _)), _, false, _, genOut, _))
        if genOut.size == 1 && elems.nonEmpty =>
      val out = genOut.head
      val conjuncts = splitConjunctivePredicates(cond)
      // an element is a CreateNamedStruct while it carries data columns
      // but constant-folds to a struct Literal when every field is
      // constant (the `struct('type','Customer')` branches) — rewriting
      // the field access onto the ELEMENT handles both: the access over
      // a Literal or all-constant struct is foldable and evaluates, the
      // access over a data-column struct is not and the element is kept
      def survives(e: Expression): Boolean = conjuncts.forall { c =>
        val sub = c.transform {
          case GetStructField(a: Attribute, ord, nm) if a.exprId == out.exprId =>
            e match {
              // field-level substitution: the p field of a
              // data-carrying struct is still a literal even though
              // the struct as a whole is not foldable
              case st: CreateNamedStruct => st.valExprs(ord)
              case other                 => GetStructField(other, ord, nm)
            }
        }
        // only a statically-decidable FALSE/null conjunct kills the
        // element; anything referencing data columns always survives
        if (sub.references.nonEmpty || !sub.foldable) true
        else try sub.eval(null) match {
          case null                 => false
          case b: java.lang.Boolean => b.booleanValue()
          case _                    => true
        } catch {
          // a folding error (overflow, malformed cast) is the RUNTIME
          // filter's to raise, not the optimizer's — keep the element
          case _: Exception => true
        }
      }
      val kept = elems.filter(survives)
      if (kept.size == elems.size) fil
      else if (kept.isEmpty) LocalRelation(fil.output)
      else fil.copy(child = gen.copy(generator =
        Explode(CreateArray(kept, arr.useStringTypeWhenEmpty))))
  }
}
