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

  test("rel_bucketed_join query: the only exchange is the final nation-grain aggregate") {
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force non-broadcast so bucket co-location carries the join
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = graft.operators.Relational.bucketedJoin(spark, sf)
      val plan = df.queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges === 1, s"expected exactly the aggregate's exchange, got $exchanges:\n$plan")
      assert(
        plan.split("SortMergeJoin").last.indexOf("Exchange hashpartitioning") < 0,
        s"exchange below the co-located join:\n$plan"
      )
      assert(df.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold): Unit
  }

  test("bucketed signature stores cross-match with NO shuffle exchange") {
    import graft.sources.SignatureStore
    val docs = spark.read.parquet(s"$sf/documents.parquet").select(col("doc_id"), col("text"))
    SignatureStore.writeBucketedBands(spark, docs.filter(col("doc_id") < 250), "sig_a")
    SignatureStore.writeBucketedBands(spark, docs.filter(col("doc_id") >= 250), "sig_b")
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val matches = SignatureStore.crossStoreMatches(spark, "sig_a", "sig_b")
      val plan = matches.queryExecution.executedPlan.toString
      // exactly ONE exchange survives: the match-sized candidate dedup
      // ABOVE the join — the corpus-sized join inputs stay bucket-local
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges === 1, s"cross-store band join shuffles its inputs:\n$plan")
      assert(
        plan.split("SortMergeJoin").last.indexOf("Exchange hashpartitioning") < 0,
        s"exchange below the join:\n$plan"
      )
      // correctness: equals the plain (unbucketed) signature join
      val a = spark.table("sig_a").select(col("doc_id").as("doc_a"), col("sig"))
      val b = spark.table("sig_b").select(col("doc_id").as("doc_b"), col("sig"))
      val expected = a.join(b, Seq("sig")).select(col("doc_a"), col("doc_b")).distinct()
      assert(matches.exceptAll(expected).count() === 0 && expected.exceptAll(matches).count() === 0)
      assert(matches.count() > 0, "fixture produced no cross-store band matches")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      spark.sql("DROP TABLE IF EXISTS sig_a")
      spark.sql("DROP TABLE IF EXISTS sig_b")
    }
  }
}
