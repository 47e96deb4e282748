package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Scratch repro harness for the full-sweep concurrency anomaly:
  * contamination_long_match once wrote max_run_tokens = 0 for every
  * eval doc while 3 peer queries and their finally-clearCache blocks
  * ran in the same session. Runs the operator repeatedly with a
  * clearCache-hammering thread plus a cache-churning peer and checks
  * the run-sum invariant each iteration.
  */
object RaceRepro {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    // truth computed once, quietly
    val truth = Dedup.contaminationLongMatch(spark, dir)
      .agg(sum(col("max_run_tokens"))).head().getLong(0)
    println(s"TRUTH run-sum = $truth")
    @volatile var stop = false
    val hammer = new Thread(() => {
      while (!stop) { spark.catalog.clearCache(); Thread.sleep(3) }
    })
    val churn = new Thread(() => {
      SparkSession.setActiveSession(spark)
      while (!stop) {
        val d = spark.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), Dedup.normText(col("text")).as("norm"))
          .persist()
        d.count(); d.unpersist(false)
      }
    })
    hammer.start(); churn.start()
    var bad = 0
    for (i <- 1 to 15) {
      val got = Dedup.contaminationLongMatch(spark, dir)
        .agg(sum(col("max_run_tokens"))).head().getLong(0)
      if (got != truth) { bad += 1; println(s"ITER $i WRONG: $got != $truth") }
      else println(s"ITER $i ok")
    }
    stop = true; hammer.join(); churn.join()
    println(s"RESULT bad=$bad/15")
    spark.stop()
  }
}
