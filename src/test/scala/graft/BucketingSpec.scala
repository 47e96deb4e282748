package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Bucketing, Tables}

class BucketingSpec extends AnyFunSuite {
  import TestSpark._

  test("bucketed tables join with NO shuffle exchange (co-located join)") {
    val li = Tables.lineitem(spark, sf).select(col("l_suppkey"), col("l_extendedprice"))
    val sup = Tables.supplier(spark, sf).select(col("s_suppkey"), col("s_acctbal"))
    Bucketing.writeBucketed(li, "li_bucketed", "l_suppkey")
    Bucketing.writeBucketed(sup, "sup_bucketed", "s_suppkey")
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast join so bucket co-location is what's tested
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark
        .table("li_bucketed")
        .join(spark.table("sup_bucketed"), col("l_suppkey") === col("s_suppkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), s"bucketed join still shuffles:\n$plan")
      // and it is still correct
      val expected = li.join(sup, col("l_suppkey") === col("s_suppkey")).count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS sup_bucketed")
    }
  }
}
