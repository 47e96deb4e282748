package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.expressions.LongDotProduct

class ExpressionSpec extends AnyFunSuite {
  import TestSpark._

  test("LongDotProduct evaluates exactly (Column API)") {
    import spark.implicits._
    val df = Seq((Seq(1L, 2L, 3L), Seq(4L, 5L, 6L))).toDF("a", "b")
    assert(df.select(LongDotProduct(col("a"), col("b"))).as[Long].head() === 32L)
  }

  test("LongDotProduct matches the higher-order-function formulation on real embeddings") {
    import graft.functions.VectorFunctions._
    val q = spark.read
      .parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), quantizeMicro(col("embedding")).as("q"))
    val hof = aggregate(zip_with(col("q"), col("q"), (x, y) => x * y), lit(0L), (acc, x) => acc + x)
    val bad = q.select((LongDotProduct(col("q"), col("q")) - hof).as("d")).filter(col("d") =!= 0)
    assert(bad.count() === 0)
  }

  test("long_dot registered in SQL via GraftExtensions") {
    // the shared session is built with spark.sql.extensions=GraftExtensions
    val n = spark.sql("SELECT long_dot(array(1L, 2L), array(3L, 4L)) AS d").collect()(0).getLong(0)
    assert(n === 11L)
  }

  test("LongDotProduct rejects non-array-of-long inputs") {
    import spark.implicits._
    val df = Seq(("x", Seq(1L))).toDF("a", "b")
    val e = intercept[Exception](df.select(LongDotProduct(col("a"), col("b"))).head())
    assert(e.getMessage.toLowerCase.contains("long_dot"))
  }
}
