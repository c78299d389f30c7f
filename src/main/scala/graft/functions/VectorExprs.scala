package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, CodegenFallback}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.unsafe.types.UTF8String

/** Native vector kernels for the similarity-search path.
  *
  * The generic higher-order-function route
  * (`aggregate(zip_with(a,b,*),0,+)`) falls out of whole-stage codegen
  * and allocates a lambda frame per element; on an all-pairs join that
  * is the entire query cost. These expressions compile to a tight
  * primitive loop inside WholeStageCodegen. Semantics (sequential
  * left-to-right double accumulation) are IDENTICAL to the HOF fold, so
  * the DuckDB oracles keep matching bit-for-bit.
  */

/** Σ aᵢ·bᵢ over two array<float> columns, accumulated in double. */
case class FloatDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"float_dot needs array<float> inputs, got $other")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double)$a.getFloat($i) * (double)$b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): FloatDot =
    copy(left = l, right = r)
}

/** MinHash signature: element i = min over shingles of
  * xxhash64(shingle, i) — exactly Spark's XxHash64 chain
  * (hashInt(i, hashUTF8String(s, 42L))), one UTF8 hash per shingle. */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"minhash_sig needs array<string>, got $other")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < arr.numElements()) {
      val hs = XXH64.hashUTF8String(arr.getUTF8String(j), 42L)
      var i = 0
      while (i < numHashes) {
        val h = XXH64.hashInt(i, hs)
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
}

/** 64-bit SimHash over a token array: bit b set iff
  * Σ_tokens (bit b of xxhash64(token) ? +1 : -1) > 0.
  * One UTF8 hash + 64 bit-tests per token in a primitive loop —
  * replaces an interpreted aggregate/zip_with chain. */
case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"simhash64 needs array<string>, got $other")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val sums = new Array[Long](64)
    var j = 0
    while (j < arr.numElements()) {
      val h = XXH64.hashUTF8String(arr.getUTF8String(j), 42L)
      var b = 0
      while (b < 64) {
        sums(b) += (if (((h >>> b) & 1L) == 1L) 1L else -1L)
        b += 1
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (sums(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}

object VectorExprs {
  def float_dot(a: Column, b: Column): Column =
    Shim.column(FloatDot(Shim.expression(a), Shim.expression(b)))

  def minhash_sig(shingles: Column, numHashes: Int): Column =
    Shim.column(MinHashSig(Shim.expression(shingles), numHashes))

  def simhash64(tokens: Column): Column =
    Shim.column(SimHash64(Shim.expression(tokens)))
}
