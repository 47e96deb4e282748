package graft.tools

import graft.GraftSession

/** Dev tool: attribute the streaming store-read drills' wall time to
  * FIXTURE BUILD (nDays snapshot commits = 2·nDays encode+write jobs)
  * vs STREAM DRAIN (the subscription actually under test). The r10
  * bench read ts_store_stream_read_from at 25.1 s — 3.1x its own cold
  * single-query price — and this split is the measurement that names
  * the cost: the fixture, rebuilt per invocation under percall
  * scratch, dominated; the drain is O(delta). The fixture is now
  * built once per process (StreamingIngest.storeStreamFixture), so
  * the drills price the drain.
  *
  * Usage: runMain graft.tools.StreamReadProfile <sfDir>
  */
object StreamReadProfile {
  def main(args: Array[String]): Unit = {
    val dir   = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get()
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r  = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warm lap on a throwaway fixture: codegen + parquet footers, so
    // the splits below are measured the way Bench measures (warm JVM)
    sys.props("graft.scratch.percall") = "true"
    graft.sources.StreamingIngest.storeStreamRead(spark, dir, nDays = 2).count(): Unit
    timed("fixture build (8 daily commits, 16 encode+write jobs)") {
      graft.sources.StreamingIngest.storeStreamFixture(spark, dir, nDays = 8)
    }
    timed("drain from v1 (ts_store_stream_read minus fixture)") {
      graft.sources.StreamingIngest.storeStreamRead(spark, dir).count()
    }
    timed("drain from v5 (ts_store_stream_read_from minus fixture)") {
      graft.sources.StreamingIngest.storeStreamReadFrom(spark, dir).count()
    }
    // second drains price the steady state (no residual JIT)
    timed("drain from v1, second lap") {
      graft.sources.StreamingIngest.storeStreamRead(spark, dir).count()
    }
    timed("drain from v5, second lap") {
      graft.sources.StreamingIngest.storeStreamReadFrom(spark, dir).count()
    }
    spark.stop()
  }
}
