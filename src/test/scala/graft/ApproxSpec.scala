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
}
