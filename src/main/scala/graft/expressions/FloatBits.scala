package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.GraftShims
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** IEEE-754 bit view of a double (`Double.doubleToRawLongBits`) — the
  * primitive Gorilla-style XOR float compression needs: consecutive
  * samples of a slowly-moving gauge share sign/exponent/high-mantissa
  * bits, so `bits(v[i]) XOR bits(v[i-1])` concentrates its set bits in
  * a narrow window and packs far below 8 bytes. Spark exposes no
  * double<->bits conversion in SQL, and the raw-bits view is exactly
  * the case a codegen'd unary expression costs nothing: one JVM
  * intrinsic inline in the stage.
  *
  * Raw (non-canonicalizing) bits so the XOR roundtrip is the IDENTITY
  * on every input including NaN payloads — mirrors the reference's
  * float compression carrying NaN through unchanged
  * (numpy_utils.py:103-184).
  */
case class DoubleToBits(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires double input, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def prettyName: String = "double_bits"

  override protected def nullSafeEval(v: Any): Any =
    java.lang.Double.doubleToRawLongBits(v.asInstanceOf[Double])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"java.lang.Double.doubleToRawLongBits($x)")

  override protected def withNewChildInternal(newChild: Expression): DoubleToBits =
    copy(child = newChild)
}

/** Inverse of [[DoubleToBits]]: `Double.longBitsToDouble`. */
case class BitsToDouble(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires bigint input, got ${child.dataType.sql}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "bits_double"

  override protected def nullSafeEval(v: Any): Any =
    java.lang.Double.longBitsToDouble(v.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"java.lang.Double.longBitsToDouble($x)")

  override protected def withNewChildInternal(newChild: Expression): BitsToDouble =
    copy(child = newChild)
}

object FloatBits {
  def doubleBits(c: Column): Column = GraftShims.column(DoubleToBits(GraftShims.expression(c)))
  def bitsDouble(c: Column): Column = GraftShims.column(BitsToDouble(GraftShims.expression(c)))
}
