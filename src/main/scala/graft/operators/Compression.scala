package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.FixedPoint._
import graft.operators.TimeSeries.eventsUs

/** Storage-planning operators — the reference's compression planner
  * re-expressed as distributed aggregations.
  *
  * The reference plans per-tag storage by scanning value ranges
  * (utils/binary.py:5-43 determine_required_bytes_*,
  * utils/numpy_utils.py:187-241 compress_array). On Spark those plans
  * are single-shuffle groupBy aggregates whose partial (map-side)
  * combine does nearly all the work — the natural 100 TB shape: each
  * executor reduces its slice to one (min,max,sum,count) tuple per
  * group before anything crosses the network.
  */
object Compression {

  // -------------------------------------------------------------------
  // 5. ts_downcast_plan — smallest integer width + signedness per tag
  // (binary.py:5-43: unsigned if min>=0, then 1/2/4/8 bytes by range).
  // -------------------------------------------------------------------
  def downcastPlan(spark: SparkSession, dir: String): DataFrame = {
    eventsUs(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        min(cents(col("value"))).as("min_c"),
        max(cents(col("value"))).as("max_c"),
        count(lit(1)).as("n")
      )
      .withColumn("type_char", when(col("min_c") >= 0, lit("u")).otherwise(lit("i")))
      .withColumn(
        "n_bytes",
        when(
          col("min_c") >= 0,
          when(col("max_c") < 256L, 1L)
            .when(col("max_c") < 65536L, 2L)
            .when(col("max_c") < 4294967296L, 4L)
            .otherwise(8L)
        ).otherwise(
          when(col("min_c") >= -128L && col("max_c") < 128L, 1L)
            .when(col("min_c") >= -32768L && col("max_c") < 32768L, 2L)
            .when(col("min_c") >= -2147483648L && col("max_c") < 2147483648L, 4L)
            .otherwise(8L)
        )
      )
  }

  // -------------------------------------------------------------------
  // 6. ts_compress_minref — mode-'m' compression: store values as
  // offsets from the per-series minimum (numpy_utils.py:187-241,
  // compress_array mode 'm'). The offset stream's checksum
  // (sum/max/count) is derived algebraically from one agg pass —
  // sum(offset) = sum(v) - n*min — so no second scan is needed.
  // -------------------------------------------------------------------
  def minRefCompress(spark: SparkSession, dir: String): DataFrame = {
    eventsUs(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        min(cents(col("value"))).as("min_c"),
        max(cents(col("value"))).as("max_c"),
        sum(cents(col("value"))).as("sum_c"),
        count(lit(1)).as("n")
      )
      .select(
        col("user_id"),
        col("min_c"),
        (col("max_c") - col("min_c")).as("max_offset_c"),
        (col("sum_c") - col("n") * col("min_c")).as("sum_offset_c"),
        col("n")
      )
  }

  // -------------------------------------------------------------------
  // 7. ts_round_fixed — fixed-point encode/decode roundtrip
  // (numpy_utils.py:266-275 round_array_returning_integers,
  // timebox_tag.py:229-266): round(v·10^d) → int64 → /10^d, at d=2 and
  // d=4, with a decode-reencode identity count proving losslessness.
  // -------------------------------------------------------------------
  def roundFixed(spark: SparkSession, dir: String): DataFrame = {
    val enc2 = fixed(col("value"), 2)
    val enc4 = fixed(col("value"), 4)
    val roundtrip2 = fixed(fromFixed(fixed(col("value"), 2), 2), 2)
    eventsUs(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(enc2).as("sum_enc2"),
        sum(enc4).as("sum_enc4"),
        sum(when(roundtrip2 === enc2, 1L).otherwise(0L)).as("n_roundtrip_ok")
      )
  }

  // -------------------------------------------------------------------
  // 6b. ts_value_delta — mode-'e' compression: store values as
  // element-wise differences from the previous point per series
  // (numpy_utils.py:187-241, compress_array mode 'e'). Emits the
  // per-series diff-stream plan: first value (stored separately, like
  // the reference's start date), the diff range for width planning,
  // and a reconstruction check (first + sum(diffs) == last).
  // -------------------------------------------------------------------
  def valueDelta(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    eventsUs(spark, dir)
      .select(col("user_id"), col("ts_us"), col("event_id"), cents(col("value")).as("value_c"))
      .withColumn("dv", col("value_c") - lag(col("value_c"), 1).over(w))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n"),
        min(when(col("dv").isNull, col("value_c"))).as("first_c"),
        max_by(col("value_c"), struct(col("ts_us"), col("event_id"))).as("last_c"),
        min(col("dv")).as("min_dv"),
        max(col("dv")).as("max_dv"),
        sum(coalesce(col("dv"), lit(0L))).as("sum_dv")
      )
      .withColumn(
        "recon_ok",
        when(col("first_c") + col("sum_dv") === col("last_c"), 1L).otherwise(0L)
      )
  }

  // -------------------------------------------------------------------
  // 5b. ts_float_downcast — lossless float width planning
  // (numpy_utils.py:103-184 compress_float_array): a tag can store as
  // f32 iff every value survives the f64->f32->f64 roundtrip (IEEE
  // round-to-nearest in both engines). The f16 leg of the reference's
  // ladder is in FloatWidth.fitsF16 (JDK 17 has no float16 cast, and
  // SQL oracles none), spec-verified against reference semantics.
  // -------------------------------------------------------------------
  def floatDowncast(spark: SparkSession, dir: String): DataFrame = {
    val losslessF32 = col("value").cast("float").cast("double") === col("value")
    eventsUs(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(losslessF32, 1L).otherwise(0L)).as("n_f32_ok")
      )
      .withColumn("float_bytes", when(col("n_f32_ok") === col("n"), 4L).otherwise(8L))
  }

  // -------------------------------------------------------------------
  // 5c. ts_float_xor — Gorilla-style XOR float packing (Pelkonen et
  // al., VLDB'15; the reference's float path stores raw f64/f32,
  // numpy_utils.py:103-184 — XOR packing is the lossless upgrade for
  // floats the fixed-point ladder can't take). Per (series, day) block,
  // ordered by (ts, seq): xd[i] = bits(v[i]) XOR bits(v[i-1]) (first
  // element keeps its raw bits). Consecutive gauge samples share
  // sign/exponent/high-mantissa bits, so xd packs into the few
  // MEANINGFUL bytes the width plan prices — and the decode is a
  // running bit_xor over the same block window the timestamp decode
  // already pays, reconstructing every bit pattern EXACTLY (NaN
  // payloads included; cents-rounding never enters the codec).
  //
  // Scale shape: one shuffle on the block key for the lag, the same
  // window for the cumulative XOR, partial-aggregable per-series
  // summary on top. The bit view is a codegen'd native expression
  // ([[graft.expressions.FloatBits]]) — no UDF, no codegen break.
  //
  // The oracle pins the roundtrip: n_bits_exact must equal n_points
  // (DuckDB asserts COUNT(*) twice) and the reconstructed values'
  // fixed-point sum must match the raw table's.
  // -------------------------------------------------------------------
  def floatXorRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import graft.expressions.FloatBits._
    val day = expr("ts_us DIV 86400000000")
    val w = Window.partitionBy(col("user_id"), col("day_id")).orderBy(col("ts_us"), col("event_id"))
    val encoded = eventsUs(spark, dir)
      .select(col("user_id"), day.as("day_id"), col("ts_us"), col("event_id"), col("value"))
      .withColumn("bits", doubleBits(col("value")))
      .withColumn("xd", coalesce(col("bits").bitwiseXOR(lag(col("bits"), 1).over(w)), col("bits")))
      // the codec's stored column is xd alone; `bits` stays only as
      // the co-located roundtrip witness (no re-scan, no join)
      .select(col("user_id"), col("day_id"), col("ts_us"), col("event_id"), col("xd"), col("bits"))
    encoded
      .withColumn(
        "rec_bits",
        expr(
          "bit_xor(xd) OVER (PARTITION BY user_id, day_id ORDER BY ts_us, event_id " +
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        )
      )
      .withColumn("recon", bitsDouble(col("rec_bits")))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_points"),
        sum(when(col("rec_bits") === col("bits"), 1L).otherwise(0L)).as("n_bits_exact"),
        sum(cents(col("recon"))).as("sum_value_c")
      )
  }
}

/** The reference's f64->f32->f16 ladder needs a float16 leg; JDK 17
  * has no Float.floatToFloat16, so this is the IEEE 754 binary16
  * conversion (round-to-nearest-even), matching numpy's astype
  * semantics used by the reference (numpy_utils.py:103-184).
  */
object FloatWidth {

  /** IEEE binary16 bits for a float (round-to-nearest-even). */
  def floatToFloat16Bits(f: Float): Int = {
    val bits = java.lang.Float.floatToIntBits(f)
    val sign = (bits >>> 16) & 0x8000
    val exp = (bits >>> 23) & 0xff
    val mant = bits & 0x7fffff
    if (exp == 0xff) return sign | 0x7c00 | (if (mant != 0) 0x200 | (mant >>> 13) else 0) // inf/nan
    // re-bias 127 -> 15
    val e16 = exp - 127 + 15
    if (e16 >= 0x1f) return sign | 0x7c00 // overflow -> inf
    if (e16 <= 0) {
      // subnormal half (or zero): shift mantissa with the implicit bit
      if (e16 < -10) return sign // underflows to zero
      val m = (mant | 0x800000) >>> (1 - e16)
      // round to nearest even on bit 13
      val rounded = (m >>> 13) + (if ((m & 0x1fff) > 0x1000 || ((m & 0x3fff) == 0x3000)) 1 else 0)
      return sign | rounded
    }
    val half = sign | (e16 << 10) | (mant >>> 13)
    val rem = mant & 0x1fff
    if (rem > 0x1000 || (rem == 0x1000 && (half & 1) == 1)) half + 1 else half
  }

  /** inverse: binary16 bits -> float */
  def float16BitsToFloat(h: Int): Float = {
    val sign = (h & 0x8000) << 16
    val exp = (h >>> 10) & 0x1f
    val mant = h & 0x3ff
    val bits =
      if (exp == 0) {
        if (mant == 0) sign
        else {
          // subnormal half: normalize
          var e = -1
          var m = mant
          while ((m & 0x400) == 0) { m <<= 1; e += 1 }
          sign | ((127 - 15 - e) << 23) | ((m & 0x3ff) << 13)
        }
      } else if (exp == 0x1f) sign | 0x7f800000 | (mant << 13)
      else sign | ((exp - 15 + 127) << 23) | (mant << 13)
    java.lang.Float.intBitsToFloat(bits)
  }

  /** true iff the double survives the full f64->f16->f64 roundtrip.
    * NaN is representable at every width (the reference's float
    * compression carries NaN through all downcasts, numpy semantics).
    */
  def fitsF16(x: Double): Boolean = {
    if (x.isNaN) return true
    val f = x.toFloat
    f.toDouble == x && float16BitsToFloat(floatToFloat16Bits(f)).toDouble == x
  }

  /** the reference's ladder: smallest lossless float width in bytes */
  def planFloatBytes(x: Double): Int =
    if (fitsF16(x)) 2 else if (x.toFloat.toDouble == x) 4 else 8
}
