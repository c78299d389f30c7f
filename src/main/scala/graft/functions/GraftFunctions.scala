package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftshim.Shim

/** SQL registration for the native graft expressions, two ways:
  *
  *  - [[GraftExtensions]] — a `SparkSessionExtensions` injector for
  *    cluster deployments
  *    (`spark.sql.extensions=graft.functions.GraftExtensions`), the
  *    extension point the engine uses instead of patching Spark;
  *  - [[GraftFunctions.registerAll]] — imperative registration on a
  *    live session (tests, notebooks).
  *
  * Either way, `SELECT simhash64(tokens), lsh_bucket(emb, 8, 0) …`
  * works from plain SQL with full whole-stage codegen.
  */
object GraftFunctions {

  private def one(name: String)(b: Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftFunctions.type].getName, name),
      (args: Seq[Expression]) => b(args))

  private[functions] val all = Seq(
    one("polyhash") { a => PolyHash(a.head) },
    one("float_dot") { a => FloatDot(a(0), a(1)) },
    one("minhash_sig") { a => MinHashSig(a(0), Shim.intLiteral(a(1))) },
    one("simhash64") { a => SimHash64(a.head) },
    one("lsh_bucket") { a =>
      LshBucket(a(0), Shim.intLiteral(a(1)),
        if (a.size > 2) Shim.intLiteral(a(2)) else 0)
    })

  /** Register every graft function on a live session. */
  def registerAll(spark: SparkSession): Unit =
    all.foreach { case (id, _, builder) =>
      Shim.register(spark, id.funcName, builder)
    }
}

/** `spark.sql.extensions` entry point: the native SQL functions plus
  * the engine's optimizer rules
  * ([[graft.plans.PruneConstStructExplode]] — injected into the
  * operator-optimization fixed point, so column pruning composes with
  * the branch prune). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.PruneConstStructExplode)
  }
}
