package graft.tools

import graft.GraftSession
import graft.SparkEntry

/** Dev tool: per-query timing and plan inspection.
  *
  * Usage:
  *   runMain graft.tools.Profile <sfDir> <query> [reps]   — time a query N times
  *   runMain graft.tools.Profile <sfDir> _explain <q...>  — formatted plans
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) scala.util.Try(args(2).toInt).getOrElse(3) else 3
    val spark = GraftSession.get()
    if (name == "_explain") {
      args.drop(2).foreach { q =>
        println(s"\n========== $q ==========")
        SparkEntry.queries(q)(spark, sfDir).explain("formatted")
      }
      spark.stop(); return
    }
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[profile] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
