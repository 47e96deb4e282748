package graft.tools

import graft.GraftSession
import graft.sources.{SignatureStore, Tables, TimeboxStore}
import org.apache.spark.sql.functions._

/** Dev tool: attribute dedup_stream / dedup_stream_cc wall time to its
  * components — corpus store BUILD vs per-batch match vs per-batch
  * append vs the streaming machinery itself. At 24/7 scale the
  * per-batch constant is the throughput ceiling, so this split is what
  * the round-over-round bench numbers need to be read against.
  *
  * Usage: runMain graft.tools.StreamDedupProfile <sfDir>
  */
object StreamDedupProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    sys.props("graft.scratch.percall") = "true"
    val spark = GraftSession.get()
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val splitId = 400L
    // warm pass: codegen + parquet footers, so components are measured
    // the way Bench measures queries (warm JVM)
    val warm = TimeboxStore.scratchPath("graft_sdprof_warm", dir)
    SignatureStore.write(spark, docs.filter(col("doc_id") < splitId), warm)

    val store = TimeboxStore.scratchPath("graft_sdprof", dir)
    val batch = docs.filter(col("doc_id") >= splitId)
    timed("store build (corpus side, < splitId)") {
      SignatureStore.write(spark, docs.filter(col("doc_id") < splitId), store)
    }
    timed("matchDelta (one batch vs store)") {
      SignatureStore.matchDelta(spark, store, batch).write.mode("overwrite").parquet(s"$store/m1")
    }
    timed("append (one batch into store)") {
      SignatureStore.append(spark, batch, store)
    }
    // second batch prices the steady-state per-batch floor against a
    // GROWN store (the first batch's appends included)
    timed("matchDelta (second batch, grown store)") {
      SignatureStore.matchDelta(spark, store, batch).write.mode("overwrite").parquet(s"$store/m2")
    }
    // fused match+append on a fresh store (what dedupStream's
    // foreachBatch now runs per batch)
    val store2 = TimeboxStore.scratchPath("graft_sdprof2", dir)
    SignatureStore.write(spark, docs.filter(col("doc_id") < splitId), store2)
    timed("matchAppend (fused, one signature pass)") {
      SignatureStore.matchAppend(spark, store2, batch).write.mode("overwrite").parquet(s"$store2/m1")
    }
    // the full query, single-batch drain: total − components = the
    // streaming machinery's fixed cost (source listing, checkpoint,
    // foreachBatch dispatch)
    timed("dedup_stream end-to-end (AvailableNow, 1 batch)") {
      graft.sources.StreamingIngest.dedupStream(spark, dir).count()
    }
    timed("dedup_stream end-to-end (maxFilesPerTrigger=1, multi-batch)") {
      graft.sources.StreamingIngest.dedupStream(spark, dir, filesPerTrigger = Some(1)).count()
    }
    timed("dedup_stream_cc end-to-end (AvailableNow, 1 batch)") {
      graft.sources.StreamingIngest.dedupStreamClusters(spark, dir).count()
    }
    // ---- PRODUCTION ratio: small batch vs large store, then the same
    // batch vs an 11x store (ScaleUp-derived docs). With the leveled
    // layout the per-batch match is prefix-pruned, so the second
    // number should sit ~flat instead of scaling with the store.
    // dirRows=1000 levels these toy-scale stores past the prune
    // threshold, so the measurement exercises the PRUNED match path
    // (production stores reach it at the default 8M-row dirs)
    val batchP = docs.filter(col("doc_id") >= 4500)
    val storeS = TimeboxStore.scratchPath("graft_sdprof_ps", dir)
    SignatureStore.write(spark, docs.filter(col("doc_id") < 4500), storeS, dirRows = 1000)
    timed("PROD matchDelta: 500-doc batch vs 4.5k-doc store") {
      SignatureStore.matchDelta(spark, storeS, batchP).write.mode("overwrite").parquet(s"$storeS/m1")
    }
    val sf1dir = ScaleUp.ensure(spark, dir)
    val docs1 = Tables.documents(spark, sf1dir).select(col("doc_id"), col("text"))
    val storeB = TimeboxStore.scratchPath("graft_sdprof_pb", dir)
    SignatureStore.write(
      spark,
      docs1.filter(col("doc_id") < 4500 || col("doc_id") >= 5000), // everything except the batch originals
      storeB,
      dirRows = 1000
    )
    timed("PROD matchDelta: same 500-doc batch vs 49.5k-doc store (11x)") {
      SignatureStore.matchDelta(spark, storeB, batchP).write.mode("overwrite").parquet(s"$storeB/m1")
    }
    spark.stop()
  }
}
