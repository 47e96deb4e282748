package graft.tools

/** Dev tool: one-line plan metrics for EVERY SparkEntry query —
  * shuffle exchange count, scan count, join strategies, window count —
  * sorted by shuffle count, so plan outliers stand out. Streaming /
  * store drills run their side effects while the plan is built; run at
  * sf0.001 to keep that cheap.
  *
  * Usage: runMain graft.tools.InventoryAudit [sfDir]
  */
object InventoryAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    sys.props("graft.scratch.percall") = "true"
    val spark = graft.GraftSession.get()
    val rows = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val p = fn(spark, dir).queryExecution.executedPlan.toString
        val ex = "Exchange hashpartitioning".r.findAllIn(p).size
        val scans = "FileScan".r.findAllIn(p).size
        val smj = "SortMergeJoin".r.findAllIn(p).size
        val bhj = "BroadcastHashJoin".r.findAllIn(p).size
        val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
        val win = "Window ".r.findAllIn(p).size
        spark.catalog.clearCache()
        Some((name, ex, scans, smj, bhj, bnlj, win))
      } catch { case e: Throwable => println(s"AUDIT_ERR $name: ${e.getMessage}"); None }
    }
    println(f"${"query"}%-28s ex scan smj bhj bnlj win")
    rows.sortBy(-_._2).foreach { case (n, ex, sc, smj, bhj, bnlj, win) =>
      println(f"$n%-28s $ex%2d $sc%4d $smj%3d $bhj%3d $bnlj%4d $win%3d")
    }
    spark.stop()
  }
}
