package graft.tools
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    val d = "/root/testdata/sf0.001"
    val checks: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      "bigram_pmi" -> graft.operators.TextAnalysis.bigramPmi(spark, d),
      "chunk_dedup" -> graft.operators.Multimodal.chunkDedup(spark, d),
      "retention" -> graft.operators.TimeSeries.retention(spark, d),
      "ivf_kmeans" -> graft.operators.Similarity.annIvfKmeans(spark, d),
      "q18" -> graft.operators.Relational.largeOrders(spark, d),
      "argmax" -> graft.operators.Relational.topCustomerPerNation(spark, d),
      "seasonal" -> graft.operators.TimeSeries.seasonalProfile(spark, d)
    )
    checks.foreach { case (n, df) =>
      val p = df.queryExecution.executedPlan.toString
      val ex = "Exchange hashpartitioning".r.findAllIn(p).size
      val bad = Seq("CartesianProduct", "BroadcastNestedLoopJoin").filter(p.contains)
      val sort = "Sort ".r.findAllIn(p).size
      println(f"$n%-12s exchanges=$ex sorts=$sort bad=${bad.mkString(",")} wsc=${"WholeStageCodegen".r.findAllIn(p).size}")
    }
    spark.stop()
  }
}
