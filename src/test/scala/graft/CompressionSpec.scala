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

  test("fixed() column matches scala rint on sample data") {
    import spark.implicits._
    val xs = Seq(1.005, -2.5, 3.345, 0.0, 99.994)
    val got = xs.toDF("x").select(FixedPoint.fixed(col("x"), 2).as("e")).as[Long].collect()
    // Spark round() is HALF_UP over the actual double product (e.g.
    // 1.005*100 == 100.4999... -> 100), matching DuckDB's round() —
    // which is exactly the cross-engine property the oracles rely on
    assert(got.toSeq === Seq(100L, -250L, 335L, 0L, 9999L))
  }
}
