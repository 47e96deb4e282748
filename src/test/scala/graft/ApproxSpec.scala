package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational

/** Accuracy bounds for the sketch-based scale paths (no SQL oracle —
  * approximate results are engine-specific by construction).
  */
class ApproxSpec extends AnyFunSuite {
  import TestSpark._

  test("HLL distinct counts are within 5% of exact per group") {
    val exact = Relational.groupDistinct(spark, sf).select(col("event_type"), col("n_users"))
    val approx = Relational.groupDistinctApprox(spark, sf).select(col("event_type"), col("n_users_approx"))
    val joined = exact.join(approx, "event_type").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val e = r.getAs[Long]("n_users")
      val a = r.getAs[Long]("n_users_approx")
      assert(math.abs(a - e).toDouble / e <= 0.05, s"${r.getAs[String]("event_type")}: exact=$e approx=$a")
    }
  }

  test("portable HLL: registers bounded, estimate within the raw-HLL envelope") {
    val rows = Relational.approxHllUsers(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (nHit, sumInv, est, exact, errBp) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(nHit >= 1 && nHit <= 64)
      // sum_inv in (0, m·2^27]: empty registers contribute 2^27 each
      assert(sumInv > 0 && sumInv <= 64L * (1L << 27))
      assert(est > 0)
      // raw HLL (no linear-counting branch): generous envelope, and the
      // reported error must BE the |est−exact| ratio
      assert(errBp === math.abs(est - exact) * 10000 / exact)
      // linear counting handles the small range; 20% envelope
      assert(errBp <= 2000, s"estimate $est vs exact $exact drifted past 20%")
    }
  }
}
