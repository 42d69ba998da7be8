package graft.index.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.sql.graft.bridge

import graft.index.Codec

/** Native Catalyst expressions for posting-payload decode on the query hot
  * path — delta+varbyte docIds and packed float32 impacts (Codec.scala).
  * Both generate direct static calls so the decode stays inside whole-stage
  * codegen (no UDF boxing), per the reference's compressed-index query model
  * (PISA block decode, benchmark/on_pisa.py:47-51).
  */
case class VarByteDecodeExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "varbyte_decode"

  override protected def nullSafeEval(payload: Any, n: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      Codec.decodeDeltaVarByte(payload.asInstanceOf[Array[Byte]],
        n.asInstanceOf[Int]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (p, n) =>
      s"org.apache.spark.sql.catalyst.expressions.UnsafeArrayData" +
        s".fromPrimitiveArray(graft.index.Codec.decodeDeltaVarByte($p, $n))")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class FloatsDecodeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "floats_decode"

  override protected def nullSafeEval(payload: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      Codec.decodeFloats(payload.asInstanceOf[Array[Byte]]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, p =>
      s"org.apache.spark.sql.catalyst.expressions.UnsafeArrayData" +
        s".fromPrimitiveArray(graft.index.Codec.decodeFloats($p))")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object CodecExprs {
  def varbyteDecode(payload: Column, n: Column): Column =
    bridge.toColumn(VarByteDecodeExpr(bridge.toExpression(payload), bridge.toExpression(n)))
  def floatsDecode(payload: Column): Column =
    bridge.toColumn(FloatsDecodeExpr(bridge.toExpression(payload)))
}
