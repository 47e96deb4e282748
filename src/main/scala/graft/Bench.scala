package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // per-call scratch: each timed invocation builds its store /
    // checkpoint FRESH, so a best-of-2 second pass (or a leftover dir
    // from a previous round's run) can never turn a streaming query's
    // row into a checkpoint-resume no-op that understates the work ~10x
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
    // Untimed warmup: JIT/codegen machinery, parquet footers, shuffle
    // service init — one-time JVM costs that would otherwise be charged
    // to whichever query happens to run first.
    SparkEntry.entry(spark).count()
    Seq("events", "documents", "embeddings", "lineitem", "orders", "customer").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").count()
    }
    // best-of-2: a query's time is min over two isolated passes, so a
    // transient host-contention window doesn't distort one number. The
    // second pass runs in REVERSE order: whatever ran first in pass 1
    // (absorbing residual JIT, or paying a shared input tier's
    // one-time build) runs last in pass 2 fully warm, so min() strips
    // position-dependent cost from EVERY query — the cross-round
    // tables stop needing the "first query" footnote, deterministically
    // (no RNG, same coverage both passes).
    def pass(order: Seq[String]): Map[String, Double] = order.map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      // drop intermediates an operator materialized, so no query is
      // timed against another query's leftover cache (or its GC bill)
      spark.catalog.clearCache()
      name -> dt
    }.toMap
    val order = SparkEntry.queries.keys.toSeq
    val (p1, p2) = (pass(order), pass(order.reverse))
    val results = p1.map { case (name, t) => name -> math.min(t, p2(name)) }
    def r3(v: Double): String = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val total = if (results.nonEmpty) results.values.sum else 0.0
    def lineOf(entries: Seq[(String, Double)], omitted: Int): String = {
      val qs = entries.map { case (k, v) => s"\"" + k + "\":" + r3(v) }.mkString("{", ",", "}")
      val om = if (omitted > 0) s""","queries_omitted":$omitted""" else ""
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs$om,"sf":"$sfDir"}"""
    }
    // FULL table -> the artifact file (the machine-readable record of
    // every per-query number, full precision)
    val all = results.toSeq.sortBy(-_._2)
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LATEST.json")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(outFile),
      (lineOf(all, 0) + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8)
    )
    // stdout line: log-tail capture keeps only the LAST ~2000 chars, and
    // a longer line is truncated mid-JSON and unparseable downstream. So
    // emit the slowest queries that fit the window (the ones a
    // round-over-round diff cares about), declare how many cheap ones
    // were dropped, and leave the complete table to the file above.
    // ~2000-char capture window MINUS sbt's trailing "[success] Total
    // time ..." line (~70 chars) and slack: round 6's 1950-char line
    // lost its opening 20 chars to exactly that suffix and parsed null
    val budget = 1800
    var kept = all
    while (kept.nonEmpty && lineOf(kept, all.size - kept.size).length > budget)
      kept = kept.dropRight(1)
    println(lineOf(kept, all.size - kept.size))
    spark.stop()
  }
}
