package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns — quantization
  * via built-in `transform`, dot products via the codegen'd native
  * expression [[graft.expressions.LongDotProduct]]; no UDFs, so the
  * whole pipeline stays inside whole-stage codegen.
  *
  * Everything works on *quantized* vectors: components are scaled to
  * integer micro-units first (the same fixed-point trick the reference
  * applies to floats, numpy_utils.py:266-275). Integer dot products
  * are exact and order-independent, which makes similarity thresholds
  * and top-k ranks deterministic across engines and across shuffle
  * orders — a property float sums cannot give at 100 TB.
  */
object VectorFunctions {

  /** float components -> integer micro-units (round(x * 1e6)) */
  def quantizeMicro(v: Column): Column =
    transform(v, x => round(x.cast("double") * lit(1000000)).cast("long"))

  /** exact integer dot product of two quantized vectors — a native
    * codegen'd Catalyst expression ([[graft.expressions.LongDotProduct]]);
    * the equivalent `aggregate(zip_with(...))` is a CodegenFallback and
    * ~4x slower on pair-heavy similarity plans.
    */
  def dotQ(a: Column, b: Column): Column =
    graft.expressions.LongDotProduct(a, b)

  /** exact integer squared L2 norm of a quantized vector */
  def norm2Q(a: Column): Column = dotQ(a, a)

  /** cosine from exact integer dot + squared norms. The float division
    * and sqrt are IEEE-deterministic given exact integer inputs, so
    * the same expression evaluates bit-identically everywhere.
    */
  def cosineQ(dot: Column, na2: Column, nb2: Column): Column =
    dot.cast("double") / sqrt(na2.cast("double") * nb2.cast("double"))
}
