package graft.tokenize.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.tokenize.SnowballEnStemmer

/** Native Catalyst expression for Snowball-English stemming of one token —
  * stays inside whole-stage codegen (the generated code calls the static
  * stemmer directly; no UDF serialization, no Row boxing).
  *
  * Semantics: reference utils/__init__.py:104-126 (PyStemmer
  * `Stemmer("english")` applied per unique token).
  */
case class SnowballStemExpr(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "snowball_en"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      SnowballEnStemmer.stem(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.tokenize.SnowballEnStemmer.stem($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): SnowballStemExpr =
    copy(child = newChild)
}
