package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling-hash document fingerprint as a native Catalyst
  * expression with whole-stage codegen:
  *
  *   h = fold(bytes, 0)((acc, b) => (acc * 31 + b) % 1_000_000_007)
  *
  * The modulus keeps every intermediate < 2^35, so the same arithmetic
  * is expressible in 64-bit SQL engines (the DuckDB oracle replays it
  * with list_reduce over codepoints). A native expression rather than a
  * UDF keeps the fingerprint stage inside WholeStageCodegen — on a
  * 100-TB corpus this runs at scan speed with zero serialization.
  */
case class PolyHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"polyhash needs STRING, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    PolyHash.hash(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val b = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $b = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $b.length; $i++) {
         |  $h = ($h * 31L + (long)($b[$i] & 0xff)) % 1000000007L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): PolyHash = copy(child = c)
}

object PolyHash {
  final val Mod = 1000000007L

  def hash(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 31L + (bytes(i) & 0xff)) % Mod
      i += 1
    }
    h
  }

  def polyhash(c: Column): Column = {
    import org.apache.spark.sql.graftshim.Shim
    Shim.column(PolyHash(Shim.expression(c)))
  }
}
