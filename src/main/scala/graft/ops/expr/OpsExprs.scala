package graft.ops.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Pure-JVM kernels for the dedup / similarity hot paths, wrapped as native
  * Catalyst expressions with `doGenCode` so they stay inside whole-stage
  * codegen. The Column-combinator formulations they replace (32 `transform`
  * lambdas for a minhash signature, 64 `aggregate` folds for a simhash)
  * are higher-order functions, which Catalyst evaluates interpreted
  * (CodegenFallback) — orders of magnitude slower per row.
  */
object OpsKernels {

  /** Same value as Catalyst `xxhash64(stringCol)` (seed 42). */
  @inline def xxh64(s: UTF8String): Long = XxHash64Function.hash(s, StringType, 42L)

  private def mix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  private val MaxPerms = 512
  private val permSeeds: Array[Long] = Array.tabulate(MaxPerms)(i => mix(i.toLong))

  /** MinHash signature: sig[j] = min over shingles of mix(xxh64(s) ^ seed_j)
    * — one base hash per shingle, m cheap mixes (2-universal-ish family).
    * Empty input → all Long.MaxValue (matches "no shingles" semantics).
    */
  def minhashSig(shingles: ArrayData, m: Int): ArrayData = {
    val sig = new Array[Long](m)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val s = shingles.getUTF8String(i)
      if (s != null) {
        val base = xxh64(s)
        var j = 0
        while (j < m) {
          val h = mix(base ^ permSeeds(j))
          if (h < sig(j)) sig(j) = h
          j += 1
        }
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  /** 64-bit SimHash: bit b of the result is set iff the +1/−1 votes of the
    * tokens' xxhash64 bit-b values sum positive. Bit-for-bit identical to
    * the Column formulation it replaces (same xxhash64 seed 42).
    */
  def simhash64(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      if (t != null) {
        val h = xxh64(t)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Sequential-order dot product over float or double arrays, accumulated
    * in double (same accumulation order as the `aggregate` fold and as a SQL
    * engine's left-to-right sum, so rounded comparisons agree). Callers
    * (DotProductExpr) enforce equal lengths BEFORE calling — a silent
    * min-length dot would mask embedding-dimension bugs.
    */
  def dot(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  /** Number of positions where two long-array signatures agree. Callers
    * (SigAgreeExpr) enforce equal lengths BEFORE calling.
    */
  def sigAgree(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    var agree = 0
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) agree += 1
      i += 1
    }
    agree
  }

  /** Distinct token n-gram shingles joined by single spaces, first-occurrence
    * order (array_distinct semantics). Empty when fewer than n tokens.
    */
  def shingles(tokens: ArrayData, n: Int): ArrayData = {
    val cnt = tokens.numElements()
    if (cnt < n)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val space = UTF8String.fromString(" ")
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i <= cnt - n) {
      var j = 0
      while (j < n) { parts(j) = tokens.getUTF8String(i + j); j += 1 }
      seen.add(UTF8String.concatWs(space, parts: _*))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      seen.toArray.asInstanceOf[Array[AnyRef]])
  }
}

case class MinHashSigExpr(child: Expression, m: Int) extends UnaryExpression {
  require(m > 0 && m <= 512)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    OpsKernels.minhashSig(input.asInstanceOf[ArrayData], m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.expr.OpsKernels.minhashSig($c, $m)")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    OpsKernels.simhash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.expr.OpsKernels.simhash64($c)")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class ShinglesExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingles"

  override protected def nullSafeEval(input: Any): Any =
    OpsKernels.shingles(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.expr.OpsKernels.shingles($c, $n)")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Positions where two minhash signatures agree, as a codegen expression —
  * replaces the `zip_with`+`filter` higher-order Columns that evaluated
  * interpreted (CodegenFallback) once per candidate pair. Mismatched
  * signature lengths (mixed m, or a v1/v2 format mix) yield NULL so the
  * bug surfaces instead of producing a plausible estimate.
  */
case class SigAgreeExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sig_agree"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]; val bb = b.asInstanceOf[ArrayData]
    if (aa.numElements() != bb.numElements()) null
    else OpsKernels.sigAgree(aa, bb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.ops.expr.OpsKernels.sigAgree($a, $b);
         |}
       """.stripMargin)

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Mismatched array lengths yield NULL (not a truncated dot product) so
  * embedding-dimension bugs surface instead of producing plausible numbers.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_product"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"dot_product expects array<float|double>, got $t")
  }
  private lazy val lf = isFloat(left)
  private lazy val rf = isFloat(right)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]; val bb = b.asInstanceOf[ArrayData]
    if (aa.numElements() != bb.numElements()) null
    else OpsKernels.dot(aa, lf, bb, rf)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.ops.expr.OpsKernels.dot($a, $lf, $b, $rf);
         |}
       """.stripMargin)

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object OpsExprs {
  def shingles(tokens: Column, n: Int): Column =
    bridge.toColumn(ShinglesExpr(bridge.toExpression(tokens), n))
  def minhashSig(shingles: Column, m: Int): Column =
    bridge.toColumn(MinHashSigExpr(bridge.toExpression(shingles), m))
  def simhash64(tokens: Column): Column =
    bridge.toColumn(SimHash64Expr(bridge.toExpression(tokens)))
  def dot(a: Column, b: Column): Column =
    bridge.toColumn(DotProductExpr(bridge.toExpression(a), bridge.toExpression(b)))
  def sigAgree(a: Column, b: Column): Column =
    bridge.toColumn(SigAgreeExpr(bridge.toExpression(a), bridge.toExpression(b)))
}
