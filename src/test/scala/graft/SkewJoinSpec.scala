package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SkewJoin

class SkewJoinSpec extends AnyFunSuite {
  import TestSpark._

  test("salted join returns exactly the plain join result") {
    val events = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_id"), col("user_id"), col("event_type"))
    val dim = spark.read.parquet(s"$sf/events.parquet")
      .select(col("user_id")).distinct()
      .withColumn("user_tag", concat(lit("u"), col("user_id")))

    val plain = events.join(dim, Seq("user_id"))
    val salted = SkewJoin.saltedJoin(events, dim, "user_id", Seq(col("event_id")), nSalts = 8)

    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("salt values actually spread (more than one distinct salt)") {
    val events = spark.read.parquet(s"$sf/events.parquet")
    val n = events
      .withColumn("s", pmod(hash(col("event_id")), lit(8)))
      .select(countDistinct(col("s")))
      .head()
      .getLong(0)
    assert(n === 8L)
  }
}
