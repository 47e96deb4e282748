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

  test("AQE splits the hot-key partition (skew=true in the finalized plan)") {
    // the unsalted path: a runtime-skewed shuffle join must come out of
    // AQE with the skewed partition split. Thresholds are lowered to
    // make the 1k-row fixture register as skewed; the assertion is on
    // the FINAL adaptive plan, after materialization.
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor"
    )
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      import spark.implicits._
      val fact = spark.read
        .parquet(s"$sf/events.parquet")
        // one small file = one map task, and AQE can only split a skewed
        // reduce partition on MAPPER boundaries — spread the map side first
        .repartition(8, col("event_id"))
        .select(
          when(col("user_id") % 10 =!= 0, lit(0L)).otherwise(col("user_id")).as("k"),
          col("event_id")
        )
      val dim = (0 until 15).map(i => (i.toLong, s"u$i")).toDF("k", "user_tag")
      val joined = fact.join(dim, Seq("k"))
      joined.collect() // materialize THIS frame — count() would plan a separate query
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"AQE did not split the hot partition:\n$plan")
    } finally saved.foreach { case (k, v) => v.fold(conf.unset(k))(conf.set(k, _)) }
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

  test("key skew profile: bands conserve the fact, hottest key is the true argmax") {
    val df = graft.operators.Relational.keySkewProfile(spark, sf).cache()
    try {
      val rows = df.collect()
      assert(rows.nonEmpty)
      val li = graft.sources.Tables.lineitem(spark, sf)
      assert(rows.map(_.getAs[Long]("n_rows")).sum === li.count(), "band row mass must conserve the fact")
      // hottest key columns repeat on every row; check against truth
      val truth = li
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("f"))
        .orderBy(col("f").desc, col("l_orderkey").desc)
        .limit(1)
        .head()
      assert(rows.forall(_.getAs[Long]("hottest_key") === truth.getLong(0)))
      assert(rows.forall(_.getAs[Long]("hottest_rows") === truth.getLong(1)))
      for (r <- rows)
        assert(r.getAs[Long]("freq_lo") === (1L << r.getAs[Long]("freq_band").toInt))
    } finally df.unpersist()
  }
}
