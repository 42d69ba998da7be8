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

  // ---- md5 hash family kernels (SQL-recomputable oracle variants) --------
  //
  // The md5-family dedup/fingerprint operators were introduced in round 6 as
  // Column pipelines (explode → groupBy 32×min(string) / 64 votes / per-doc
  // ordered window). min(string) aggregation plans as SortAggregate (string
  // buffers are not HashAggregate-mutable), so every md5 entry paid a full
  // shuffle + two sorts of the exploded shingle/token/k-gram table. These
  // kernels compute the identical values in ONE pass per document row —
  // no explode, no shuffle, no aggregation at all (guide §1.2 step 1: the
  // cheapest execution of a per-doc signature is a per-doc projection) —
  // and scale embarrassingly parallel at any corpus size.

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val HexChars = "0123456789abcdef".toCharArray

  /** Lowercase hex of a digest — byte-identical to Catalyst `md5(...)`. */
  private def hex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = HexChars(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** MinHash signature, md5 family: sig[j] = MIN over shingles of the md5
    * hex string of `"j:" + shingle` — value-identical to the 32-way
    * `min(md5(concat_ws(":", j, sh)))` aggregation it replaces (hex-string
    * order ≡ unsigned digest-byte order, so mins are tracked as raw
    * digests and hex-rendered once at the end). Empty input → empty array
    * (callers filter empty shingle sets, as the explode-based shape
    * dropped them implicitly).
    */
  def minhashSigMd5(shingles: ArrayData, prefixes: Array[Array[Byte]]): ArrayData = {
    val n = shingles.numElements()
    val m = prefixes.length
    if (n == 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val md = md5Local.get()
    val mins = new Array[Array[Byte]](m)
    var i = 0
    while (i < n) {
      val s = shingles.getUTF8String(i)
      if (s != null) {
        val sb = s.getBytes
        var j = 0
        while (j < m) {
          md.reset()
          md.update(prefixes(j))
          md.update(sb)
          val d = md.digest()
          if (mins(j) == null ||
              java.util.Arrays.compareUnsigned(d, mins(j)) < 0) mins(j) = d
          j += 1
        }
      }
      i += 1
    }
    if (mins(0) == null) // all-null input array: no shingle hashed
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      mins.map(hex(_)).asInstanceOf[Array[AnyRef]])
  }

  /** 64-bit SimHash, md5 family: per-bit ±1 votes of each token's
    * `md5Long64` (first 8 digest bytes big-endian as a signed long — the
    * value `('0x' || substr(md5(tok),1,16))::UBIGINT` reinterprets signed).
    * Bit-for-bit identical to the 64-conditional-sum aggregation it
    * replaces, duplicate tokens voting once per occurrence.
    */
  def simhashMd5_64(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val md = md5Local.get()
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      if (t != null) {
        md.reset()
        val d = md.digest(t.getBytes)
        var u = 0L
        var bi = 0
        while (bi < 8) { u = (u << 8) | (d(bi) & 0xffL); bi += 1 }
        var b = 0
        while (b < 64) {
          if (((u >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
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

  /** Number of positions where two STRING-array signatures agree (the md5
    * hex signature twin of [[sigAgree]]).
    */
  def sigAgreeStr(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    var agree = 0
    var i = 0
    while (i < n) {
      val x = a.getUTF8String(i); val y = b.getUTF8String(i)
      if (x != null && x.equals(y)) agree += 1
      i += 1
    }
    agree
  }

  /** Winnowing fingerprint, md5 family: h_i = md5 hex of the k-char
    * substring at 1-based char position i (i = 1..nk, nk = numChars−k+1);
    * window minima min(h_i..h_{min(i+w−1, nk)}) for the window STARTS
    * i ≤ max(nk−w+1, 1); distinct, ascending. Value-identical to the
    * explode + per-doc ordered-window-min pipeline it replaces (char
    * semantics via UTF8String.substringSQL — the same kernel Catalyst
    * `substr` uses; hex order ≡ unsigned digest order). Caller filters
    * docs shorter than k, as before.
    */
  def winnowMd5(t: UTF8String, k: Int, w: Int): ArrayData = {
    val nk = t.numChars() - k + 1
    if (nk < 1)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val md = md5Local.get()
    val hs = new Array[Array[Byte]](nk)
    var i = 0
    while (i < nk) {
      md.reset()
      hs(i) = md.digest(t.substringSQL(i + 1, k).getBytes)
      i += 1
    }
    val nStarts = math.max(nk - w + 1, 1)
    val sel = new java.util.TreeSet[Array[Byte]](
      new java.util.Comparator[Array[Byte]] {
        def compare(a: Array[Byte], b: Array[Byte]): Int =
          java.util.Arrays.compareUnsigned(a, b)
      })
    i = 0
    while (i < nStarts) {
      var min = hs(i)
      var j = i + 1
      val end = math.min(i + w, nk)
      while (j < end) {
        if (java.util.Arrays.compareUnsigned(hs(j), min) < 0) min = hs(j)
        j += 1
      }
      sel.add(min)
      i += 1
    }
    val out = new Array[AnyRef](sel.size)
    val it = sel.iterator()
    i = 0
    while (it.hasNext) { out(i) = hex(it.next()); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
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

/** MinHash signature with the md5 hash family — array of m min-md5-hex
  * strings, one pass per row (see OpsKernels.minhashSigMd5). The per-seed
  * `"j:"` prefixes are materialized once per expression instance.
  */
case class MinHashSigMd5Expr(child: Expression, m: Int) extends UnaryExpression {
  require(m > 0 && m <= 512)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig_md5"

  @transient private lazy val prefixes: Array[Array[Byte]] =
    Array.tabulate(m)(j => s"$j:".getBytes(java.nio.charset.StandardCharsets.UTF_8))

  override protected def nullSafeEval(input: Any): Any =
    OpsKernels.minhashSigMd5(input.asInstanceOf[ArrayData], prefixes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("prefixes", prefixes, "byte[][]")
    defineCodeGen(ctx, ev, c => s"graft.ops.expr.OpsKernels.minhashSigMd5($c, $ref)")
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** 64-bit SimHash with the md5 hash family (see OpsKernels.simhashMd5_64). */
case class SimHashMd5Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash_md5"

  override protected def nullSafeEval(input: Any): Any =
    OpsKernels.simhashMd5_64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.expr.OpsKernels.simhashMd5_64($c)")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Winnowing fingerprint with the md5 hash family: sorted distinct window
  * minima of the k-gram md5 hex strings (see OpsKernels.winnowMd5).
  */
case class WinnowMd5Expr(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k > 0 && w > 0)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnow_md5"

  override protected def nullSafeEval(input: Any): Any =
    OpsKernels.winnowMd5(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.expr.OpsKernels.winnowMd5($c, $k, $w)")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** [[SigAgreeExpr]] for STRING-array signatures (md5 hex components). */
case class SigAgreeStrExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sig_agree_str"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]; val bb = b.asInstanceOf[ArrayData]
    if (aa.numElements() != bb.numElements()) null
    else OpsKernels.sigAgreeStr(aa, bb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.ops.expr.OpsKernels.sigAgreeStr($a, $b);
         |}
       """.stripMargin)

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
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
  def minhashSigMd5(shingles: Column, m: Int): Column =
    bridge.toColumn(MinHashSigMd5Expr(bridge.toExpression(shingles), m))
  def simhashMd5(tokens: Column): Column =
    bridge.toColumn(SimHashMd5Expr(bridge.toExpression(tokens)))
  def winnowMd5(text: Column, k: Int, w: Int): Column =
    bridge.toColumn(WinnowMd5Expr(bridge.toExpression(text), k, w))
  def sigAgreeStr(a: Column, b: Column): Column =
    bridge.toColumn(SigAgreeStrExpr(bridge.toExpression(a), bridge.toExpression(b)))
}
