package graft
import org.apache.spark.sql.SparkSession

/** Single-query timing aid for local iteration: runs the named
  * queries (all, if none given) once warm after a first untimed pass,
  * same session config as [[Bench]]. Usage:
  *   sbt "runMain graft.QBench <sfdir> <query> [query ...]"
  */
object QBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq
    // per-call scratch: without it the warm pass's checkpoints turn a
    // streaming query's timed pass into a resume no-op (the r6 bench
    // artifact BASELINE.md's erratum documents)
    sys.props("graft.scratch.percall") = "true"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
      )
      .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).count() // warm: codegen + parquet footers
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir) // eager work (checkpoints, store writes) runs here
      val t1 = System.nanoTime()
      df.count()
      val t2 = System.nanoTime()
      spark.catalog.clearCache()
      println(
        f"QBENCH $name ${(t2 - t0) / 1e9}%.2f s (construct ${(t1 - t0) / 1e9}%.2f + run ${(t2 - t1) / 1e9}%.2f)"
      )
    }
    spark.stop()
  }
}
