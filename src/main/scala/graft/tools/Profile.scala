package graft.tools

import graft.GraftSession
import graft.SparkEntry

/** Dev tool: time one query's sub-stages / repeated runs.
  * Usage: runMain graft.tools.Profile <sfDir> <query> [reps]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) scala.util.Try(args(2).toInt).getOrElse(3) else 3
    val spark = GraftSession.get()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    if (name == "_jaccard_pieces") {
      import org.apache.spark.sql.functions._
      time("warmup range")(spark.range(1000000L).count())
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      time("docs.count")(docs.count())
      time("docs.count 2")(docs.count())
      val sh = graft.operators.Dedup.shingles(spark, sfDir)
      time("shingles.count")(sh.count())
      time("shingles.count 2")(sh.count())
      val uniq0 = sh.distinct()
      time("uniq.count warm")(uniq0.count())
      val uniq = graft.operators.Dedup.shingles(spark, sfDir).distinct()
      time("uniq.count")(uniq.count())
      val uniqC = uniq.persist()
      time("uniq.persist.count")(uniqC.count())
      val mins = (0 until 12).map(j => min(md5(concat(lit(s"$j:"), col("shingle")))).as(s"mh$j"))
      val sigsOnly = uniqC.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
      time("sigs agg only")(sigsOnly.count())
      time("sigs agg only 2")(sigsOnly.count())
      val cand = graft.operators.Dedup.minhashLsh(spark, sfDir)
      time("cand.count (cached uniq)")(cand.count())
      time("cand.count 2")(cand.count())
      val counts = uniqC.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
      time("counts.count")(counts.count())
      val inter = cand
        .join(uniqC.as("x"), col("x.doc_id") === col("doc_a"))
        .join(uniqC.as("y"), col("y.doc_id") === col("doc_b") && col("y.shingle") === col("x.shingle"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("inter_n"))
      time("inter.count")(inter.count())
      time("full op cold-ish")(graft.operators.Dedup.ngramJaccard(spark, sfDir).count())
      spark.stop(); return
    }
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
    }
    spark.stop()
  }
}
