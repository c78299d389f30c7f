package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(hash)` over a pre-built serialized
  * [[BloomFilter]] — the map-side prefilter of the incremental-dedup
  * path (reference analog: the journal's already-loaded-statement
  * short-circuit in `com.bigdata.rdf.rio.StatementBuffer`, done here
  * set-theoretically at corpus scale).
  *
  * The sketch bytes ride inside the expression tree, so every executor
  * deserializes the filter ONCE per task-set (lazy val), and the probe
  * itself is a reference-object call inside whole-stage codegen — no
  * UDF, no broadcast-variable plumbing in the query layer. False
  * positives are expected and harmless: callers must re-verify bloom
  * survivors with an exact join (the sketch only prunes the join's
  * input volume, it never decides membership).
  *
  * Scale note (100 TB): sketch size is O(expectedItems); at 1e10+ prior
  * keys either raise `fpp` (the exact verify join absorbs the extra
  * survivors) or shard the prior corpus and OR per-shard sketches —
  * both keep the probe map-side.
  */
case class BloomMightContain(child: Expression, sketchBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain needs a BIGINT hash, got ${child.dataType}")

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(sketchBytes))

  /** Executor-side probe (also the codegen target via reference obj). */
  def test(v: Long): Boolean = bloom.mightContainLong(v)

  override def nullSafeEval(v: Any): Any = test(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomExpr", this, classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.test($c);")
  }

  override protected def withNewChildInternal(c: Expression): BloomMightContain =
    copy(child = c)
}

object BloomExprs {
  def bloom_might_contain(hash: Column, sketch: BloomFilter): Column = {
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      sketch.writeTo(bos)
      bos.toByteArray
    }
    Shim.column(BloomMightContain(Shim.expression(hash), bytes))
  }
}
