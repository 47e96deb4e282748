package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional extra args: run only these queries (local iteration aid;
    // the driver's two-arg invocation is unchanged)
    val only = args.drop(2).toSet
    // every query invocation gets its own scratch dir, so queries can
    // run CONCURRENTLY without two store builds racing on a shared path
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
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Run queries on a small thread pool: most of a query's wall time
    // at sf0.01 is job-scheduling latency and streaming micro-batch
    // floors, not CPU, so 4 concurrent queries cut the sweep's wall
    // clock ~3x — which is what keeps the whole sweep inside the
    // driver's round budget (round 6 lost all 72 ts_* results to a
    // wall-clock truncation). Safe because per-call scratch isolation
    // is on (above) and each query writes its own outDir subdir.
    val par = sys.env.getOrElse("SPARK_GRAFT_VERIFY_PAR", "4").toInt
    val pool = java.util.concurrent.Executors.newFixedThreadPool(par)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val todo = SparkEntry.queries.toSeq.filter(kv => only.isEmpty || only(kv._1))
    val failures = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val futures = todo.map { case (name, fn) =>
      scala.concurrent.Future {
        // pooled threads carry no active-session thread-local; without
        // it SQLConf.get falls back to DEFAULTS and silently drops
        // session confs (nanosAsLong made every events read blow up)
        SparkSession.setActiveSession(spark)
        try {
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          // EntrySpec pins >0 rows for every query even at sf0.001, so
          // an empty result here is always a bug — route it through
          // the sequential retry instead of silently recording 0 rows
          // (a concurrency race once emptied one query's eval filter)
          if (spark.read.parquet(s"$outDir/$name").isEmpty) {
            failures.add(name)
            System.err.println(s"[verify] $name wrote 0 rows under concurrency — retrying sequentially")
          }
        } catch { case e: Throwable =>
          failures.add(name)
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
        // NOTE deliberately NO per-query clearCache here: clearing the
        // shared CacheManager while PEER queries are mid-broadcast has
        // twice produced silently-wrong peer results (an emptied eval
        // filter in r8; a dropped-every-anchor long-match in r9) —
        // wrong VALUES, which no retry-on-exception can catch. Each
        // operator releases its own caches via releaseAfterRun; the
        // residue of the few that don't is bounded at sf0.01 and is
        // cleared once below, after the concurrent phase drains.
      }
    }
    futures.foreach(f => scala.concurrent.Await.ready(f, scala.concurrent.duration.Duration.Inf))
    pool.shutdown()
    spark.catalog.clearCache()
    // safety net: anything that failed under concurrency gets one
    // sequential retry on the main thread (a transient contention
    // failure must not cost the round a correctness row)
    failures.forEach { name =>
      try {
        SparkEntry.queries(name)(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        System.err.println(s"[verify] $name succeeded on sequential retry")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed on retry: ${e.getMessage}")
      } finally spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
