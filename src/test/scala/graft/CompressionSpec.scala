package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Compression
import graft.functions.FixedPoint

/** Width planning + fixed-point semantics vs the reference's
  * utils/binary.py:5-43 (determine_required_bytes_*) and
  * numpy_utils.py:266-275 (fixed-point rounding).
  */
class CompressionSpec extends AnyFunSuite {
  import TestSpark._

  test("downcast plan: width actually holds the min/max range") {
    val df = Compression.downcastPlan(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (minC, maxC) = (r.getAs[Long]("min_c"), r.getAs[Long]("max_c"))
      val tc = r.getAs[String]("type_char")
      val nb = r.getAs[Long]("n_bytes")
      assert(tc === (if (minC >= 0) "u" else "i"))
      val fits = (tc, nb) match {
        case ("u", 1) => maxC < 256L
        case ("u", 2) => maxC < 65536L
        case ("u", 4) => maxC < 4294967296L
        case ("u", 8) => true
        case ("i", 1) => minC >= -128 && maxC < 128
        case ("i", 2) => minC >= -32768 && maxC < 32768
        case ("i", 4) => minC >= Int.MinValue.toLong && maxC <= Int.MaxValue.toLong
        case ("i", 8) => true
        case other    => fail(s"unexpected plan $other")
      }
      assert(fits, s"row $r does not fit its planned width")
      // minimality: the next-smaller width must NOT fit
      val minimal = (tc, nb) match {
        case (_, 1)   => true
        case ("u", 2) => maxC >= 256L
        case ("u", 4) => maxC >= 65536L
        case ("u", 8) => maxC >= 4294967296L
        case ("i", 2) => minC < -128 || maxC >= 128
        case ("i", 4) => minC < -32768 || maxC >= 32768
        case ("i", 8) => minC < Int.MinValue.toLong || maxC > Int.MaxValue.toLong
        case other    => fail(s"unexpected plan $other")
      }
      assert(minimal, s"row $r is not the smallest width")
    }
  }

  test("min-ref compression: offsets are non-negative and sum-consistent") {
    val df = Compression.minRefCompress(spark, sf)
    assert(df.filter(col("max_offset_c") < 0 || col("sum_offset_c") < 0).count() === 0)
    assert(df.filter(col("sum_offset_c") > col("max_offset_c") * col("n")).count() === 0)
  }

  test("fixed-point roundtrip property: |decode(encode(x)) - x| <= 0.5/scale") {
    val rnd = new scala.util.Random(42)
    (1 to 10000).foreach { _ =>
      val x = (rnd.nextDouble() - 0.5) * 2e9
      val enc = math.rint(x * 100).toLong
      val dec = enc / 100.0
      assert(math.abs(dec - x) <= 0.005 + 1e-9, s"roundtrip drift for $x")
    }
  }

  test("float16 ladder matches IEEE binary16 semantics (reference's f64->f32->f16 plan)") {
    import graft.operators.FloatWidth._
    // exactly representable in half precision
    assert(planFloatBytes(0.0) === 2)
    assert(planFloatBytes(1.0) === 2)
    assert(planFloatBytes(-2.5) === 2)
    assert(planFloatBytes(65504.0) === 2)          // max finite half
    assert(planFloatBytes(1.0 + math.pow(2, -10)) === 2) // last mantissa bit of f16
    assert(planFloatBytes(math.pow(2, -24)) === 2) // min subnormal half
    // needs single precision
    assert(planFloatBytes(1.0 + math.pow(2, -11)) === 4) // 11 mantissa bits
    assert(planFloatBytes(65520.0) === 4)          // rounds to +inf in f16
    assert(planFloatBytes(math.pow(2, -25)) === 4) // underflows f16
    assert(planFloatBytes(math.pow(2, 60)) === 4)  // overflows f16, exact in f32
    // needs double precision
    assert(planFloatBytes(1.0 / 3.0) === 8)
    assert(planFloatBytes(0.1) === 8)
    // NaN survives every downcast (reference carries NaN through)
    assert(planFloatBytes(Double.NaN) === 2)
    // the f16 roundtrip is the identity on all 2^16 bit patterns that
    // decode to finite values (total-function check, not samples)
    (0 until 0x10000).foreach { h =>
      val f = float16BitsToFloat(h)
      if (!f.isNaN && !f.isInfinite) {
        assert(floatToFloat16Bits(f) === h, s"f16 bits 0x${h.toHexString} did not roundtrip")
      }
    }
  }

  test("valueDelta: reconstruction identity holds for every series") {
    val df = Compression.valueDelta(spark, sf)
    assert(df.filter(col("recon_ok") =!= 1).count() === 0)
    assert(df.filter(col("first_c").isNull || col("last_c").isNull).count() === 0)
  }

  test("fixed() column matches scala rint on sample data") {
    import spark.implicits._
    val xs = Seq(1.005, -2.5, 3.345, 0.0, 99.994)
    val got = xs.toDF("x").select(FixedPoint.fixed(col("x"), 2).as("e")).as[Long].collect()
    // Spark round() is HALF_UP over the actual double product (e.g.
    // 1.005*100 == 100.4999... -> 100), matching DuckDB's round() —
    // which is exactly the cross-engine property the oracles rely on
    assert(got.toSeq === Seq(100L, -250L, 335L, 0L, 9999L))
  }

  test("XOR float packing: bit-exact on NaN payloads and subnormals, narrow on a slow gauge") {
    import spark.implicits._
    import graft.expressions.FloatBits._
    // adversarial doubles the cents-rounded oracle could never see:
    // quiet/signaling-style NaN payloads, ±0.0, subnormals, infinities
    val weird = Seq(
      java.lang.Double.longBitsToDouble(0x7ff8000000000001L),
      java.lang.Double.longBitsToDouble(0x7ff0000000000002L),
      0.0, -0.0, Double.MinPositiveValue, Double.PositiveInfinity, Double.NegativeInfinity, 1.0e300
    )
    val df = weird.zipWithIndex
      .map { case (v, i) => (1L, i.toLong, i.toLong, v) }
      .toDF("user_id", "day_id", "event_id", "value")
    // same chain floatXorRoundtrip runs, block = one partition here
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    val rec = df
      .withColumn("bits", doubleBits(col("value")))
      .withColumn("xd", coalesce(col("bits").bitwiseXOR(lag(col("bits"), 1).over(w)), col("bits")))
      .withColumn(
        "rec_bits",
        expr(
          "bit_xor(xd) OVER (PARTITION BY user_id ORDER BY event_id " +
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        )
      )
    assert(rec.filter(col("rec_bits") =!= col("bits")).count() === 0, "XOR chain lost bits")
    // a slowly-moving gauge XORs into few meaningful bytes: a 0.25-
    // stepping series (binary-representable, the Gorilla-friendly
    // shape) cancels sign/exponent/high-mantissa AND the low mantissa
    // — every delta spans <= 2 bytes (computed: 492× 1-byte, 19× 2)
    val gauge = (0 until 512).map(i => (1L, i.toLong, 100.0 + i * 0.25)).toDF("user_id", "event_id", "value")
    val xw = gauge
      .withColumn("bits", doubleBits(col("value")))
      .withColumn("xd", coalesce(col("bits").bitwiseXOR(lag(col("bits"), 1).over(w)), col("bits")))
      .filter(col("event_id") > 0)
      // meaningful width = bytes from highest set bit down to lowest
      // set bit (Gorilla prices leading+trailing zero runs)
      .select(
        (floor(log2(col("xd").cast("double")) / 8.0) -
          floor(log2(col("xd").bitwiseAND(-col("xd")).cast("double")) / 8.0) + 1).as("mbytes")
      )
    val narrow = xw.filter(col("mbytes") <= 2).count()
    assert(narrow === 511, s"only $narrow/511 XOR deltas packed to <= 2 meaningful bytes")
  }
}
