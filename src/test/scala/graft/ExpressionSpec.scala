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

  test("scalar surface reachable from SQL text and identical to the Column API") {
    // graft_cents / graft_norm_text / vector kernel registered by GraftExtensions
    val r = spark
      .sql(
        "SELECT graft_cents(12.345) AS c, graft_micro(0.5) AS m, " +
          "graft_norm_text('  Hello,  World!! 42 ') AS t, " +
          "graft_norm2(graft_quantize_micro(array(CAST(0.5 AS FLOAT), CAST(-0.5 AS FLOAT)))) AS n2, " +
          "graft_cos_q(long_dot(array(1L, 0L), array(1L, 0L)), 1L, 1L) AS cos"
      )
      .head()
    assert(r.getAs[Long]("c") === 1235L)
    assert(r.getAs[Long]("m") === 500000L)
    assert(r.getAs[String]("t") === "hello world 42")
    assert(r.getAs[Long]("n2") === 500000L * 500000L * 2)
    assert(r.getAs[Double]("cos") === 1.0)
  }

  test("DotProductRewrite: HOF formulation optimizes to long_dot and results match") {
    import graft.functions.VectorFunctions._
    val hof = aggregate(zip_with(col("qa"), col("qb"), (x, y) => x * y), lit(0L), (acc, x) => acc + x)
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val pairs = e
      .select(col("vec_id"), quantizeMicro(col("embedding")).as("qa"))
      .crossJoin(
        e.select(col("vec_id").as("vb"), quantizeMicro(col("embedding")).as("qb")).limit(3)
      )
      .limit(50)
    val df = pairs.select(hof.as("d"))
    assert(
      df.queryExecution.optimizedPlan.toString.contains("long_dot"),
      s"rewrite did not fire:\n${df.queryExecution.optimizedPlan}"
    )
    // results identical to the native expression
    val direct = pairs.select(graft.expressions.LongDotProduct(col("qa"), col("qb")).as("d"))
    assert(df.exceptAll(direct).count() === 0)
  }

  test("DotProductRewrite leaves non-dot aggregates alone") {
    import graft.functions.VectorFunctions._
    val notDot = aggregate(zip_with(col("qa"), col("qb"), (x, y) => x * y), lit(1L), (acc, x) => acc + x)
    val e = spark.read.parquet(s"$sf/embeddings.parquet").limit(5)
    val df = e
      .select(quantizeMicro(col("embedding")).as("qa"), quantizeMicro(col("embedding")).as("qb"))
      .select(notDot.as("d"))
    assert(!df.queryExecution.optimizedPlan.toString.contains("long_dot"))
  }

  test("DotProductRewrite preserves ANSI overflow errors (no silent wrap)") {
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try {
      // non-foldable input (parquet round-trip): literal arrays would be
      // constant-folded — and raise — before the rewrite even runs
      val dir = java.nio.file.Files.createTempDirectory("graft_ansi").toString
      Seq((Seq(Long.MaxValue, Long.MaxValue), Seq(2L, 2L))).toDF("a", "b")
        .write.mode("overwrite").parquet(dir)
      val big = spark.read.parquet(dir)
      val hof = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0L), (acc, x) => acc + x)
      val df = big.select(hof.as("d"))
      // the rewrite still fires under ANSI...
      assert(df.queryExecution.optimizedPlan.toString.contains("long_dot"))
      // ...and overflow still raises, exactly as the ANSI HOF would
      intercept[Exception](df.head())
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }

  test("LongDotProduct null semantics match the HOF formulation") {
    import spark.implicits._
    val df = Seq(
      (Seq(1L, 2L), Seq(3L, 4L)),       // equal lengths -> 11
      (Seq(1L, 2L, 3L), Seq(1L, 1L))    // length mismatch -> null
    ).toDF("a", "b")
    val native = df.select(graft.expressions.LongDotProduct(col("a"), col("b")).as("d")).collect()
    val hof = df
      .select(aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0L), (acc, x) => acc + x).as("d"))
      .collect()
    assert(native.map(r => if (r.isNullAt(0)) null else r.getLong(0)).toSeq ===
      hof.map(r => if (r.isNullAt(0)) null else r.getLong(0)).toSeq)
  }

  test("LongDotProduct rejects non-array-of-long inputs") {
    import spark.implicits._
    val df = Seq(("x", Seq(1L))).toDF("a", "b")
    val e = intercept[Exception](df.select(LongDotProduct(col("a"), col("b"))).head())
    assert(e.getMessage.toLowerCase.contains("long_dot"))
  }
}
