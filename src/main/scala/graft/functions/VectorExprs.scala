package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftshim.Shim

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

/** Σ aᵢ·bᵢ over two array<float|double> columns (each side
  * independently float or double — the k-means reassignment dots
  * float corpus vectors against double centroid means), accumulated
  * in double. */
case class FloatDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
  private def isFloat(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"float_dot needs array<float|double> inputs, got (${left.dataType}, ${right.dataType})")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val (lf, rf) = (isFloat(left.dataType), isFloat(right.dataType))
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val acc = ctx.freshName("acc")
      def get(v: String, dt: DataType) =
        if (isFloat(dt)) s"(double)$v.getFloat($i)" else s"$v.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${get(a, left.dataType)} * ${get(b, right.dataType)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): FloatDot =
    copy(left = l, right = r)
}

/** MinHash signature: element i = min over shingles of
  * xxhash64(shingle, i) — exactly Spark's XxHash64 chain
  * (hashInt(i, hashUTF8String(s, 42L))), one UTF8 hash per shingle.
  * Codegen keeps the per-shingle×per-hash loop inside
  * WholeStageCodegen (the signature IS the map stage at 100 TB). */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {
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

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
      val mins = ctx.freshName("mins"); val j = ctx.freshName("j")
      val i = ctx.freshName("i"); val hs = ctx.freshName("hs"); val h = ctx.freshName("h")
      s"""
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $j = 0; $j < $a.numElements(); $j++) {
         |  long $hs = $xxh.hashUTF8String($a.getUTF8String($j), 42L);
         |  for (int $i = 0; $i < $numHashes; $i++) {
         |    long $h = $xxh.hashInt($i, $hs);
         |    if ($h < $mins[$i]) $mins[$i] = $h;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
}

/** 64-bit SimHash over a token array: bit b set iff
  * Σ_tokens sign_b(token) > 0, where
  *
  *   th      = fold(bytes, 0)((a, c) => (a*31 + c) % 1_000_000_007)
  *   sign_b  = +1 if (th * (2b+3) + b) % 1_000_000_007 > 500_000_003 else -1
  *
  * The per-bit decision derives from a polynomial rolling hash whose
  * every intermediate stays < 2^38 — the SAME arithmetic is replayable
  * in 64-bit SQL (the DuckDB oracle recomputes it with list_reduce
  * over codepoints), so the whole simhash pipeline is oracle-checkable
  * end-to-end. Codegen keeps the per-token loop at scan speed. */
case class SimHash64(child: Expression) extends UnaryExpression {
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
      val th = PolyHash.hash(arr.getUTF8String(j).getBytes)
      var b = 0
      while (b < 64) {
        val vb = (th * (2L * b + 3L) + b) % 1000000007L
        sums(b) += (if (vb > 500000003L) 1L else -1L)
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

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val sums = ctx.freshName("sums"); val j = ctx.freshName("j")
      val by = ctx.freshName("bytes"); val k = ctx.freshName("k")
      val th = ctx.freshName("th"); val b = ctx.freshName("b")
      val vb = ctx.freshName("vb"); val out = ctx.freshName("out")
      s"""
         |long[] $sums = new long[64];
         |for (int $j = 0; $j < $a.numElements(); $j++) {
         |  byte[] $by = $a.getUTF8String($j).getBytes();
         |  long $th = 0L;
         |  for (int $k = 0; $k < $by.length; $k++) {
         |    $th = ($th * 31L + (long)($by[$k] & 0xff)) % 1000000007L;
         |  }
         |  for (int $b = 0; $b < 64; $b++) {
         |    long $vb = ($th * (2L * $b + 3L) + $b) % 1000000007L;
         |    $sums[$b] += ($vb > 500000003L) ? 1L : -1L;
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($sums[$b] > 0) $out |= (1L << $b);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}

/** Random-hyperplane LSH bucket over array<float>: bit p of the bucket
  * is the sign of  Σ_d emb[d] · w(p+offset, d), with the hyperplane
  * component derived from pure 64-bit integer arithmetic
  *
  *   w(P, d) = ((P·1299721 + d·104729 + P·d·7919) % 1000003) / 1000003.0 − 0.5
  *
  * so the identical projection is computable in the DuckDB oracle
  * (list_sum of the same sequential double fold — bit-for-bit, like
  * FloatDot). `planeOffset` yields independent hash tables for
  * multi-table LSH. One pass over the vector computes all bits —
  * replaces 12 interpreted aggregate(zip_with(...)) folds per row. */
case class LshBucket(child: Expression, numBits: Int, planeOffset: Int = 0)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"lsh_bucket needs array<float>, got $other")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val projs = new Array[Double](numBits)
    val n = arr.numElements()
    var d = 0
    while (d < n) {
      val x = arr.getFloat(d).toDouble
      var p = 0
      while (p < numBits) {
        val k = ((p + planeOffset).toLong * 1299721L + d.toLong * 104729L + (p + planeOffset).toLong * d * 7919L) % 1000003L
        projs(p) += x * (k.toDouble / 1000003.0 - 0.5)
        p += 1
      }
      d += 1
    }
    var out = 0L
    var p = 0
    while (p < numBits) {
      if (projs(p) > 0) out |= (1L << p)
      p += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val projs = ctx.freshName("projs"); val n = ctx.freshName("n")
      val d = ctx.freshName("d"); val p = ctx.freshName("p")
      val x = ctx.freshName("x"); val k = ctx.freshName("k")
      val out = ctx.freshName("out")
      s"""
         |double[] $projs = new double[$numBits];
         |int $n = $a.numElements();
         |for (int $d = 0; $d < $n; $d++) {
         |  double $x = (double) $a.getFloat($d);
         |  for (int $p = 0; $p < $numBits; $p++) {
         |    long $k = (((long)($p + $planeOffset)) * 1299721L + ((long)$d) * 104729L + ((long)($p + $planeOffset)) * $d * 7919L) % 1000003L;
         |    $projs[$p] += $x * ((double)$k / 1000003.0 - 0.5);
         |  }
         |}
         |long $out = 0L;
         |for (int $p = 0; $p < $numBits; $p++) {
         |  if ($projs[$p] > 0) $out |= (1L << $p);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): LshBucket = copy(child = c)
}

/** |A ∩ B| of two SORTED duplicate-free string arrays by linear
  * merge. `array_intersect` builds a fresh hash set PER CALL — at
  * millions of enumerated candidate pairs inside a banded near-dup
  * join that allocation is the entire query cost (measured: the
  * round-8 inline-verify restructure spent ~90% of its CPU in
  * SQLOpenHashSet.<init>); the merge does one binary UTF8 comparison
  * per element with zero allocation. Caller contract: both inputs
  * ascending in UTF8 BINARY order with no duplicates —
  * [[graft.pipeline.Dedup.shingleSets]] emits exactly that (shingles
  * are ASCII by construction, so Java and UTF8 byte orders agree). */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"sorted_intersect_count needs array<string> inputs, got $other")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val (nx, ny) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var c = 0
    while (i < nx && j < ny) {
      // binaryCompare, NOT compareTo: Spark 4's compareTo routes
      // through an isTesting() guard that reads System.getenv PER
      // CALL — measured as the whole join's cost at millions of
      // comparisons/s across 32 threads
      val cmp = x.getUTF8String(i).binaryCompare(y.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val cmp = ctx.freshName("cmp")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0, $j = 0, $c = 0;
         |while ($i < $nx && $j < $ny) {
         |  int $cmp = $a.getUTF8String($i).binaryCompare($b.getUTF8String($j));
         |  if ($cmp == 0) { $c++; $i++; $j++; }
         |  else if ($cmp < 0) $i++;
         |  else $j++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedIntersectCount =
    copy(left = l, right = r)
}

/** |A ∩ B| of two SORTED duplicate-free long arrays — the primitive
  * twin of [[SortedIntersectCount]] and the verify kernel the banded
  * near-dup join actually uses: element access is a direct memory
  * read (`getLong`), so the merge allocates NOTHING per pair, where
  * even the string merge pays one UTF8String wrapper per element
  * (~10¹⁰ allocations at sf1's enumerated-pair counts, measured as
  * GC-bound). Callers pre-hash string sets with xxhash64 — a 64-bit
  * collision inside a ~10²-element set (≈10⁻¹⁶ per pair) is the
  * accepted error bound. */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"sorted_long_intersect_count needs array<bigint> inputs, got $other")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val (nx, ny) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var c = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0, $j = 0, $c = 0;
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) $i++;
         |  else $j++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedLongIntersectCount =
    copy(left = l, right = r)
}

object VectorExprs {

  /** JVM-side replication of [[LshBucket]] for kernels that already
    * hold the vector as exact float→double components (the conversion
    * is lossless, so the projections — and therefore the bucket — are
    * bit-identical to the expression path). Loop structure mirrors
    * nullSafeEval exactly: d outer, p inner, accumulation in d order. */
  def lshBucketOf(emb: Array[Double], numBits: Int, planeOffset: Int): Long = {
    val projs = new Array[Double](numBits)
    var d = 0
    while (d < emb.length) {
      val x = emb(d)
      var p = 0
      while (p < numBits) {
        val pp = (p + planeOffset).toLong
        val k = (pp * 1299721L + d.toLong * 104729L + pp * d * 7919L) % 1000003L
        projs(p) += x * (k.toDouble / 1000003.0 - 0.5)
        p += 1
      }
      d += 1
    }
    var out = 0L
    var p = 0
    while (p < numBits) {
      if (projs(p) > 0) out |= (1L << p)
      p += 1
    }
    out
  }

  def float_dot(a: Column, b: Column): Column =
    Shim.column(FloatDot(Shim.expression(a), Shim.expression(b)))

  def minhash_sig(shingles: Column, numHashes: Int): Column =
    Shim.column(MinHashSig(Shim.expression(shingles), numHashes))

  def simhash64(tokens: Column): Column =
    Shim.column(SimHash64(Shim.expression(tokens)))

  def lsh_bucket(emb: Column, numBits: Int, planeOffset: Int = 0): Column =
    Shim.column(LshBucket(Shim.expression(emb), numBits, planeOffset))

  def sorted_intersect_count(a: Column, b: Column): Column =
    Shim.column(SortedIntersectCount(Shim.expression(a), Shim.expression(b)))

  def sorted_long_intersect_count(a: Column, b: Column): Column =
    Shim.column(SortedLongIntersectCount(Shim.expression(a), Shim.expression(b)))
}
