package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shannon entropy (nats) of a string's byte distribution — the
  * character-diversity quality signal of a training-data pipeline
  * (low-entropy docs are boilerplate/repetition; the Gopher rules
  * family uses exactly this gate). Native Catalyst expression with
  * whole-stage codegen: the 256-bucket histogram lives in operator
  * mutable state (one allocation per task, NOT per row), so the scan
  * stage stays zero-allocation — the same discipline as
  * [[PolyHash]] / [[SortedLongIntersectCount]].
  *
  * Defined over UTF-8 BYTES; on ASCII text (the oracle corpus) that is
  * identical to codepoint entropy, which is what the DuckDB oracle
  * computes with per-char grouping. Summation runs in ascending byte
  * order; oracle group-aggregate order differs, so consumers round
  * (4 dp absorbs the ~1-ulp drift, the logprob precedent).
  */
case class ByteEntropy(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"byte_entropy needs STRING, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    ByteEntropy.entropy(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val counts = ctx.addMutableState("long[]", "entropyCounts",
      v => s"$v = new long[256];")
    nullSafeCodeGen(ctx, ev, c => {
      val b = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val p = ctx.freshName("p")
      val n = ctx.freshName("n")
      s"""
         |byte[] $b = $c.getBytes();
         |java.util.Arrays.fill($counts, 0L);
         |for (int $i = 0; $i < $b.length; $i++) { $counts[$b[$i] & 0xff]++; }
         |double $h = 0.0;
         |double $n = (double) $b.length;
         |for (int $i = 0; $i < 256; $i++) {
         |  if ($counts[$i] > 0L) {
         |    double $p = (double) $counts[$i] / $n;
         |    $h -= $p * Math.log($p);
         |  }
         |}
         |${ev.value} = $h;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): ByteEntropy =
    copy(child = c)
}

object ByteEntropy {
  def entropy(bytes: Array[Byte]): Double = {
    val counts = new Array[Long](256)
    var i = 0
    while (i < bytes.length) { counts(bytes(i) & 0xff) += 1; i += 1 }
    var h = 0.0
    val n = bytes.length.toDouble
    i = 0
    while (i < 256) {
      if (counts(i) > 0L) { val p = counts(i) / n; h -= p * math.log(p) }
      i += 1
    }
    h
  }

  def byte_entropy(c: Column): Column = {
    import org.apache.spark.sql.graftshim.Shim
    Shim.column(ByteEntropy(Shim.expression(c)))
  }
}
