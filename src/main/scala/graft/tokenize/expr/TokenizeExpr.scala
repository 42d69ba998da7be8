package graft.tokenize.expr

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.tokenize.{SnowballEnStemmer, Tokenizer}

/** Single-pass tokenization kernel: lowercase → regex token scan →
  * (optional) stopword removal → (optional) snowball stem, in one JVM loop.
  *
  * Replaces the Column-combinator pipeline
  * `transform(filter(regexp_extract_all(lower(c))))`: `filter`/`transform`
  * are higher-order functions, which Catalyst evaluates INTERPRETED
  * (CodegenFallback) with per-element lambda dispatch — the dominant cost of
  * the index build's tokenize stage. Semantics identical to the reference
  * pipeline T1-T5 (utils/__init__.py:56-143; see Tokenizer).
  */
object TokenizerKernel {

  private val patterns = new java.util.concurrent.ConcurrentHashMap[String, Pattern]()

  def compiled(pattern: String): Pattern =
    patterns.computeIfAbsent(pattern, p => Pattern.compile(p))

  private val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Tokenizer.StopwordsEn.foreach(s.add)
    s
  }

  /** Per-thread memo of token → stemmed UTF8String. Corpus tokens are
    * Zipf-distributed, so stemming every OCCURRENCE re-ran the multi-step
    * Snowball rewrite on the same few thousand distinct tokens millions of
    * times — the reference stems unique tokens only for exactly this
    * reason (utils/__init__.py:104-126). Bounded: cleared when it exceeds
    * 2^16 entries (a pathological all-unique-token corpus can't grow it
    * without bound); stem() is pure, so the memo is semantics-free.
    */
  private val StemCacheMax = 1 << 16
  private val stemCache =
    new ThreadLocal[java.util.HashMap[String, UTF8String]] {
      override def initialValue() =
        new java.util.HashMap[String, UTF8String](1 << 12)
    }

  /** @return array<string> of tokens. Lowercasing matches Spark `lower()`
    * (UTF8String.toLowerCase), so oracle-checked queries agree with SQL.
    */
  def tokenize(input: UTF8String, p: Pattern, removeStop: Boolean,
               stem: Boolean): ArrayData = {
    val text = input.toLowerCase.toString
    val m = p.matcher(text)
    val out = new java.util.ArrayList[UTF8String]()
    val cache = if (stem) stemCache.get() else null
    while (m.find()) {
      val t = m.group()
      if (!removeStop || !stopSet.contains(t)) {
        if (stem) {
          var w = cache.get(t)
          if (w == null) {
            if (cache.size() >= StemCacheMax) cache.clear()
            w = UTF8String.fromString(SnowballEnStemmer.stem(t))
            cache.put(t, w)
          }
          out.add(w)
        } else out.add(UTF8String.fromString(t))
      }
    }
    new GenericArrayData(out.toArray())
  }
}

case class TokenizeExpr(child: Expression, pattern: String,
                        removeStop: Boolean, stem: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "tokenize"

  @transient private lazy val compiledPattern = TokenizerKernel.compiled(pattern)

  override protected def nullSafeEval(input: Any): Any =
    TokenizerKernel.tokenize(input.asInstanceOf[UTF8String],
      compiledPattern, removeStop, stem)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patRef = ctx.addReferenceObj("tokPattern", compiledPattern,
      classOf[Pattern].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.tokenize.expr.TokenizerKernel.tokenize($c, $patRef, $removeStop, $stem)")
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
