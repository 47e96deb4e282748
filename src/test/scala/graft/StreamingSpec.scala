package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.FixedPoint._
import graft.sources.{StreamingIngest, Tables}

class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  test("durable parquet ingest: streamed rows == batch projection, exactly once") {
    val out = java.nio.file.Files.createTempDirectory("graft_ingest").toString + "/data"
    StreamingIngest.ingestRawToParquet(spark, sf, out)
    val streamed = spark.read.parquet(out)
    val batch = Tables
      .events(spark, sf)
      .select(
        col("event_id"),
        col("user_id"),
        expr("ts DIV 1000").as("ts_us"),
        col("event_type"),
        cents(col("value")).as("value_c")
      )
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
    // replaying the drained stream appends nothing (checkpoint dedup)
    StreamingIngest.ingestRawToParquet(spark, sf, out)
    assert(spark.read.parquet(out).count() === batch.count())
  }

  /** Replay fixture: the sf events split at the median timestamp into
    * two time-ordered files inside an events.parquet directory, so
    * maxFilesPerTrigger=1 drives a genuine two-batch replay where the
    * watermark advances between batches.
    */
  private def twoBatchDir(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_replay").toString
    val ev = Tables.events(spark, sf)
    val cut = ev.selectExpr("approx_percentile(ts, 0.5)").head().getAs[Number](0).longValue()
    val evdir = s"$dir/events.parquet"
    ev.filter(col("ts") <= cut).coalesce(1).write.mode("append").parquet(evdir)
    Thread.sleep(1100) // file source orders batches by mod time
    ev.filter(col("ts") > cut).coalesce(1).write.mode("append").parquet(evdir)
    dir
  }

  test("sessionize stream: two-batch replay flushes idle state and matches batch exactly") {
    val dir = twoBatchDir()
    val streamed = StreamingIngest.sessionizeStream(spark, dir, filesPerTrigger = Some(1))
    val batch = graft.operators.TimeSeries
      .sessionize(spark, dir)
      .select(col("user_id"), col("start_us"), col("end_us"), col("n_events"))
    assert(streamed.exceptAll(batch).count() === 0, "streamed sessions not in batch answer")
    assert(batch.exceptAll(streamed).count() === 0, "batch sessions missing from stream")
  }

  test("kmv stream: two-batch replay drains the exact batch sketch (min-k merge algebra)") {
    val dir = twoBatchDir()
    val streamed = StreamingIngest.approxKmvStream(spark, dir, filesPerTrigger = Some(1))
    // batch truth: the per-type estimator over the same events
    val batch = graft.operators.Relational
      .kmvSetops(spark, dir)
      .select(col("type_a").as("event_type"), col("est_a").as("kmv_estimate"))
      .unionByName(
        graft.operators.Relational
          .kmvSetops(spark, dir)
          .select(col("type_b").as("event_type"), col("est_b").as("kmv_estimate"))
      )
      .distinct()
    val joined = streamed.select(col("event_type"), col("kmv_estimate").as("got")).join(batch, Seq("event_type"))
    assert(joined.count() > 0)
    assert(joined.filter(col("got") =!= col("kmv_estimate")).count() === 0,
      "streamed sketch estimate diverged from the batch sketch")
  }

  test("scd2 stream: two-batch replay maintains versions and matches batch exactly") {
    val dir = twoBatchDir()
    val streamed = StreamingIngest.scd2Stream(spark, dir, filesPerTrigger = Some(1))
    val batch = graft.operators.Relational.scd2(spark, dir)
    assert(streamed.exceptAll(batch).count() === 0, "streamed versions not in batch answer")
    assert(batch.exceptAll(streamed).count() === 0, "batch versions missing from stream")
  }

  test("append-mode windowed ingest emits closed windows once, each exactly the batch value") {
    val dir = twoBatchDir()
    val emitted = StreamingIngest.ingestHourlyAppend(spark, dir, Some(1)).cache()
    try {
      val batch = Tables
        .events(spark, dir)
        .groupBy(
          (expr("ts DIV 1000") - pmod(expr("ts DIV 1000"), lit(3600000000L))).as("window_start_us"),
          col("event_type")
        )
        .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_c"))
      // watermark advanced once (batch 1 -> 2), so batch-1 windows closed
      assert(emitted.count() > 0, "append mode emitted nothing across the two-batch replay")
      // no duplicate emissions
      assert(
        emitted.groupBy("window_start_us", "event_type").count().filter(col("count") > 1).count() === 0
      )
      // every emitted window carries the exact final batch aggregate
      assert(emitted.exceptAll(batch).count() === 0, "an emitted window disagrees with the batch value")
    } finally emitted.unpersist()
  }

  test("kill/resume: RocksDB-backed window state survives a stop between micro-batches") {
    import org.apache.spark.sql.streaming.Trigger
    assert(
      spark.conf
        .get("spark.sql.streaming.stateStore.providerClass")
        .contains("RocksDBStateStoreProvider"),
      "RocksDB state store provider not active"
    )
    val dir = twoBatchDir()
    val root = java.nio.file.Files.createTempDirectory("graft_recover").toString
    val out = s"$root/data"
    def start(trigger: Trigger) =
      StreamingIngest
        .hourlyAppendStream(spark, dir, Some(1))
        .writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", s"$root/ckpt")
        .outputMode("append")
        .trigger(trigger)
        .start()
    // run 1: batch 0 (first file) fires immediately; batch 1 would wait
    // for the 10 s processing-time tick, so stopping after the first
    // commit is a deterministic KILL between micro-batches. The
    // first file's open-window counts at that point exist ONLY in the
    // RocksDB state checkpoint.
    val q1 = start(Trigger.ProcessingTime("10 seconds"))
    while (!q1.recentProgress.exists(_.numInputRows > 0)) Thread.sleep(10)
    q1.stop()
    q1.awaitTermination()
    val afterKill =
      scala.util.Try(spark.read.parquet(out).count()).getOrElse(0L)
    // run 2: restart from the same checkpoint; the remaining data and
    // watermark-advancing batches drain with the window state RESTORED
    val q2 = start(Trigger.AvailableNow())
    q2.awaitTermination()
    val resumed = spark.read.parquet(out).cache()
    try {
      val oneShot = StreamingIngest.ingestHourlyAppend(spark, dir, Some(1))
      assert(resumed.count() > 0, "nothing emitted across kill/resume")
      assert(
        resumed.count() > afterKill,
        "the resumed run emitted nothing — recovery was not exercised"
      )
      assert(
        resumed.exceptAll(oneShot).count() === 0 && oneShot.exceptAll(resumed).count() === 0,
        "kill/resume result differs from the uninterrupted replay"
      )
    } finally resumed.unpersist()
  }

  test("streaming anomaly scoring: two-batch replay equals the batch z-score exactly") {
    val dir = twoBatchDir()
    val streamed = StreamingIngest.anomalyStream(spark, dir, filesPerTrigger = Some(1))
    val batch = graft.operators.TimeSeries.anomalyZscore(spark, dir)
    assert(streamed.exceptAll(batch).count() === 0, "streamed verdicts not in batch answer")
    assert(batch.exceptAll(streamed).count() === 0, "batch verdicts missing from stream")
  }

  test("streaming EWMA: two-batch replay equals the batch smoothing exactly") {
    val dir = twoBatchDir()
    val streamed = StreamingIngest.ewmaStream(spark, dir, filesPerTrigger = Some(1))
    val batch = graft.operators.TimeSeries.ewma(spark, dir)
    assert(streamed.exceptAll(batch).count() === 0, "streamed estimates not in batch answer")
    assert(batch.exceptAll(streamed).count() === 0, "batch estimates missing from stream")
  }

  test("streaming funnel: two-batch replay equals the batch funnel — steps advance across the boundary") {
    val dir = twoBatchDir()
    val streamed = StreamingIngest.funnelStream(spark, dir, filesPerTrigger = Some(1))
    val batch = graft.operators.TimeSeries.funnel(spark, dir)
    assert(streamed.exceptAll(batch).count() === 0, "streamed funnels not in batch answer")
    assert(batch.exceptAll(streamed).count() === 0, "batch funnels missing from stream")
  }

  test("streaming gapfill: two-batch replay equals the batch LOCF grid — fills cross the boundary") {
    val dir = twoBatchDir()
    val streamed = StreamingIngest.gapfillStream(spark, dir, filesPerTrigger = Some(1))
    val batch = graft.operators.TimeSeries.gapfillLocf(spark, dir)
    assert(streamed.exceptAll(batch).count() === 0, "streamed grid rows not in batch answer")
    assert(batch.exceptAll(streamed).count() === 0, "batch grid rows missing from stream")
  }

  test("reordering rate stream: out-of-order cross-batch arrival within the allowance still matches the oracle") {
    import spark.implicits._
    // dense synthetic series (2-min cadence) split with a jittered
    // stripe: batch 1 takes everything below the cut PLUS even-index
    // points for 24 min past it; batch 2 delivers that stripe's
    // odd-index points LATE. The stripe sits inside batch 1's final 30
    // event-minutes, so every late point is within the watermark
    // allowance — disorder the strict rateStream rejects and the
    // reordering buffer must absorb exactly.
    val base = 1704672000000000000L // 2024-01-08, ns
    val min = 60L * 1000000000L
    val pts = for (u <- 1L to 3L; i <- 0L until 61L) yield (
      u * 1000 + i,                       // event_id
      base + i * 2 * min,                 // ts (plain long ns, like nanosAsLong reads)
      u,                                  // user_id
      "click",
      (i * 7 % 13).toDouble + u,          // value
      "{}"
    )
    val ev = pts.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("graft_ooo").toString
    val evdir = s"$dir/events.parquet"
    val cut = base + 90 * min
    val stripe = 24 * min
    val b1 = ev.filter(col("ts") <= cut || (col("ts") <= cut + stripe && (col("event_id") % 2 === 0)))
    b1.coalesce(1).write.mode("append").parquet(evdir)
    Thread.sleep(1100)
    ev.exceptAll(b1).coalesce(1).write.mode("append").parquet(evdir)
    // strict variant must reject this disorder loudly
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      StreamingIngest.rateStream(spark, dir, filesPerTrigger = Some(1)).count()
    }
    assert(e.getMessage.contains("out-of-order"), s"unexpected failure: ${e.getMessage.take(200)}")
    // reordering variant must match the batch rate up to the
    // final-watermark cutoff
    val streamed = StreamingIngest.rateStreamReordering(spark, dir, filesPerTrigger = Some(1))
    val maxUs = Tables.events(spark, dir).selectExpr("MAX(ts DIV 1000)").head().getLong(0)
    val wmUs = (maxUs / 1000L - 1800000L) * 1000L
    val batch = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      graft.operators.TimeSeries
        .eventsUs(spark, dir)
        .select(col("user_id"), col("ts_us"), col("event_id"), graft.functions.FixedPoint.cents(col("value")).as("value_c"))
        .withColumn("dv", col("value_c") - lag(col("value_c"), 1).over(w))
        .filter(col("dv").isNotNull && col("ts_us") <= wmUs)
        .groupBy(col("user_id"), expr("ts_us DIV 3600000000").as("hour_id"))
        .agg(
          count(lit(1)).as("n_deltas"),
          sum(when(col("dv") > 0, col("dv")).otherwise(0L)).as("increase_c"),
          sum(col("dv")).as("net_delta_c")
        )
    }
    assert(streamed.exceptAll(batch).count() === 0, "streamed finalized rates not in batch answer")
    assert(batch.exceptAll(streamed).count() === 0, "batch rates missing from the finalized stream")
    // the same disordered replay through the reordering z-score: every
    // finalized point must score against exactly its batch trailing
    // window (win=5 so the short synthetic series produces verdicts)
    val scoredStream = StreamingIngest.anomalyStreamReordering(spark, dir, win = 5, filesPerTrigger = Some(1))
    val scoredBatch = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id")).rowsBetween(-5, -1)
      graft.operators.TimeSeries
        .eventsUs(spark, dir)
        .select(col("event_id"), col("user_id"), col("ts_us"), graft.functions.FixedPoint.cents(col("value")).as("x"))
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("s", sum(col("x")).over(w))
        .withColumn("q", sum(col("x") * col("x")).over(w))
        .filter(col("n") >= 5 && col("ts_us") <= wmUs)
        .withColumn("dev_n", col("n") * col("x") - col("s"))
        .withColumn(
          "is_anomaly",
          when(col("dev_n") * col("dev_n") > lit(9L) * (col("n") * col("q") - col("s") * col("s")), 1L)
            .otherwise(0L)
        )
        .select(col("event_id"), col("user_id"), col("ts_us"), col("x").as("value_c"), col("is_anomaly"))
    }
    assert(scoredStream.exceptAll(scoredBatch).count() === 0, "streamed verdicts not in batch answer")
    assert(scoredBatch.exceptAll(scoredStream).count() === 0, "batch verdicts missing from the finalized stream")
    // and the same disorder through the reordering EWMA: every
    // finalized point smooths over exactly its batch trailing history
    val ewmaStreamed = StreamingIngest.ewmaStreamReordering(spark, dir, filesPerTrigger = Some(1))
    val ewmaBatch = graft.operators.TimeSeries.ewma(spark, dir).filter(col("ts_us") <= wmUs)
    assert(ewmaStreamed.exceptAll(ewmaBatch).count() === 0, "streamed estimates not in batch answer")
    assert(ewmaBatch.exceptAll(ewmaStreamed).count() === 0, "batch estimates missing from the finalized stream")
  }

  test("streaming counter rate: two-batch replay equals the batch rate — deltas cross the batch boundary") {
    val dir = twoBatchDir()
    val streamed = StreamingIngest.rateStream(spark, dir, filesPerTrigger = Some(1))
    val batch = graft.operators.TimeSeries.rateIncrease(spark, dir)
    // the time-split replay guarantees every series has its first
    // batch-2 point rated against batch-1 state: any per-batch lag
    // shortcut would lose exactly those boundary deltas
    assert(streamed.exceptAll(batch).count() === 0, "streamed hourly rates not in batch answer")
    assert(batch.exceptAll(streamed).count() === 0, "batch hourly rates missing from stream")
  }

  test("streaming anomaly scoring REJECTS out-of-order cross-batch arrival loudly") {
    // reversed replay: the LATE half arrives in batch 0, the early half
    // in batch 1 — silent mis-scoring before; a loud contract error now
    val dir = java.nio.file.Files.createTempDirectory("graft_replay_rev").toString
    val ev = Tables.events(spark, sf)
    val cut = ev.selectExpr("approx_percentile(ts, 0.5)").head().getAs[Number](0).longValue()
    val evdir = s"$dir/events.parquet"
    ev.filter(col("ts") > cut).coalesce(1).write.mode("append").parquet(evdir)
    Thread.sleep(1100)
    ev.filter(col("ts") <= cut).coalesce(1).write.mode("append").parquet(evdir)
    val e = intercept[Exception] {
      StreamingIngest.anomalyStream(spark, dir, filesPerTrigger = Some(1))
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(
      messages(e).exists(_.contains("out-of-order arrival")),
      s"expected the ordering-contract error, got: ${messages(e).mkString(" | ")}"
    )
  }

  test("streaming ingest into the block store: two-batch replay decodes to the exact event set") {
    val dir = twoBatchDir()
    val out = java.nio.file.Files.createTempDirectory("graft_ingest_store").toString + "/blocks"
    StreamingIngest.ingestToStore(spark, dir, out, filesPerTrigger = Some(1))
    // a (series, day) straddling the batch cut now has TWO partial
    // blocks — decode must keep their positions separate
    val decoded = graft.sources.TimeboxStore.read(spark, out)
    val orig = Tables
      .events(spark, dir)
      .select(
        col("user_id").as("series_id"),
        expr("ts DIV 1000").as("ts_us"),
        col("event_id").as("seq"),
        cents(col("value")).as("value_c")
      )
    assert(decoded.exceptAll(orig).count() === 0)
    assert(orig.exceptAll(decoded).count() === 0)
    // drained checkpoint: replay appends nothing
    StreamingIngest.ingestToStore(spark, dir, out, filesPerTrigger = Some(1))
    assert(graft.sources.TimeboxStore.read(spark, out).count() === orig.count())
  }

  test("stream-stream interval join: two-batch replay emits exactly the batch pair set") {
    val dir = twoBatchDir()
    val streamed = StreamingIngest.attributionJoin(spark, dir, filesPerTrigger = Some(1))
    val ev = Tables.events(spark, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_event_id"), expr("ts DIV 1000").as("p_ts_us"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("c_event_id"), expr("ts DIV 1000").as("c_ts_us"))
    val batch = p
      .join(c, Seq("user_id"))
      .filter(col("c_ts_us") >= col("p_ts_us") - 3600000000L && col("c_ts_us") <= col("p_ts_us"))
      .select(col("p_event_id"), col("c_event_id"), col("p_ts_us"), col("c_ts_us"))
    assert(streamed.exceptAll(batch).count() === 0, "streamed pairs not in batch join")
    assert(batch.exceptAll(streamed).count() === 0, "batch pairs missing from stream (state dropped too early?)")
  }

  test("checkpointed ingest resumes incrementally: newly arrived files land exactly once") {
    val dir = java.nio.file.Files.createTempDirectory("graft_resume").toString
    val evdir = s"$dir/events.parquet"
    val ev = Tables.events(spark, sf)
    val cut = ev.selectExpr("approx_percentile(ts, 0.5)").head().getAs[Number](0).longValue()
    val out = java.nio.file.Files.createTempDirectory("graft_resume_out").toString + "/data"
    // day 1: only the first half exists
    ev.filter(col("ts") <= cut).coalesce(1).write.mode("append").parquet(evdir)
    StreamingIngest.ingestRawToParquet(spark, dir, out)
    val n1 = spark.read.parquet(out).count()
    assert(n1 === ev.filter(col("ts") <= cut).count())
    // day 2: more files arrive; the SAME checkpoint resumes and
    // processes only the new data — nothing is reprocessed
    Thread.sleep(1100)
    ev.filter(col("ts") > cut).coalesce(1).write.mode("append").parquet(evdir)
    StreamingIngest.ingestRawToParquet(spark, dir, out)
    val all = spark.read.parquet(out)
    assert(all.count() === ev.count(), "resume lost or duplicated rows")
    assert(all.select("event_id").distinct().count() === ev.count(), "duplicate event ids after resume")
  }

  test("streaming dedup: a batch-2 doc matches a batch-1 doc via the appended store") {
    import spark.implicits._
    // corpus doc 0 (text A); batch 1 brings doc 1000 (text B, new);
    // batch 2 brings doc 2000 (text B again) — its only match is the
    // batch-1 doc, which exists ONLY through the store append loop
    val dir = java.nio.file.Files.createTempDirectory("graft_dedup_stream").toString
    def docsDf(rows: Seq[(Long, String)]) =
      rows
        .toDF("doc_id", "text")
        .select(
          col("doc_id"),
          col("text"),
          lit("en").as("lang"),
          lit("synthetic").as("source"),
          length(col("text")).cast("long").as("n_chars")
        )
    val textA = "the quick brown fox jumps over the lazy dog again and again"
    val textB = "completely different content about distributed stream processing engines"
    val evdir = s"$dir/documents.parquet"
    docsDf(Seq((0L, textA))).coalesce(1).write.mode("append").parquet(evdir)
    Thread.sleep(1100)
    docsDf(Seq((1000L, textB))).coalesce(1).write.mode("append").parquet(evdir)
    Thread.sleep(1100)
    docsDf(Seq((2000L, textB))).coalesce(1).write.mode("append").parquet(evdir)
    val matches = StreamingIngest
      .dedupStream(spark, dir, splitId = 400L, filesPerTrigger = Some(1))
      .collect()
      .map(r => (r.getAs[Long]("new_doc_id"), r.getAs[Long]("match_doc_id"), r.getAs[String]("kind")))
      .toSet
    assert(
      matches.contains((2000L, 1000L, "exact")),
      s"intra-stream match missing — the store append loop is broken: $matches"
    )
    assert(!matches.exists(_._2 == 0L), s"unexpected corpus match for unrelated texts: $matches")
  }

  test("streaming dedup: multi-batch replay, kill between batches, resume keeps appended signatures") {
    import spark.implicits._
    // corpus: doc 0 (text A). Stream files (one micro-batch each):
    // f1 doc 1000 (text B, new), f2 doc 2000 (text B -> matches 1000
    // cross-batch), then KILL (the stream drains and terminates — the
    // same state a kill between micro-batches leaves: checkpoint +
    // appended store). f3 arrives: doc 3000 (text A -> corpus match)
    // and doc 3001 (text B -> must match BOTH pre-kill stream docs,
    // which exist only if the resume did NOT rebuild the store).
    val dir = java.nio.file.Files.createTempDirectory("graft_dedup_stream_mb").toString
    def docsDf(rows: Seq[(Long, String)]) =
      rows
        .toDF("doc_id", "text")
        .select(
          col("doc_id"),
          col("text"),
          lit("en").as("lang"),
          lit("synthetic").as("source"),
          length(col("text")).cast("long").as("n_chars")
        )
    val textA = "the quick brown fox jumps over the lazy dog again and again"
    val textB = "completely different content about distributed stream processing engines"
    val evdir = s"$dir/documents.parquet"
    docsDf(Seq((0L, textA))).coalesce(1).write.mode("append").parquet(evdir)
    Thread.sleep(1100)
    docsDf(Seq((1000L, textB))).coalesce(1).write.mode("append").parquet(evdir)
    Thread.sleep(1100)
    docsDf(Seq((2000L, textB))).coalesce(1).write.mode("append").parquet(evdir)
    def collectMatches() = StreamingIngest
      .dedupStream(spark, dir, splitId = 400L, filesPerTrigger = Some(1))
      .collect()
      .map(r => (r.getAs[Long]("new_doc_id"), r.getAs[Long]("match_doc_id"), r.getAs[String]("kind")))
    val run1 = collectMatches()
    assert(run1.toSet === Set((2000L, 1000L, "exact")), s"pre-kill matches wrong: ${run1.toSet}")
    // kill happened; new data lands; resume from the checkpoint
    docsDf(Seq((3000L, textA), (3001L, textB))).coalesce(1).write.mode("append").parquet(evdir)
    val run2 = collectMatches()
    val expected = Set(
      (2000L, 1000L, "exact"), // pre-kill history, not re-emitted twice
      (3000L, 0L, "exact"),    // corpus match survives resume
      (3001L, 1000L, "exact"), // pre-kill batch docs still in the store
      (3001L, 2000L, "exact")
    )
    assert(run2.toSet === expected, s"post-resume matches wrong: ${run2.toSet}")
    // exactly-once: completed batches were not replayed after the kill
    assert(run2.length === run2.distinct.length, "a batch replayed — duplicate match rows")
  }

  test("streaming cluster maintenance: per-batch relabel converges, a late bridge merges old components") {
    import spark.implicits._
    // corpus: two disjoint near-dup components (pre-searched texts —
    // same deterministic banding as the SignatureStoreSpec merge
    // drill; tools/BandSearch re-finds a fixture when the signature
    // family changes). Stream: batch 1 extends component A; batch 2
    // delivers the BRIDGE that merges A and B — the merge must happen
    // through the per-batch incremental relabel, across micro-batches.
    val baseA = "beta epsilon alpha gamma kappa delta delta gamma epsilon kappa eta tau delta tau beta"
    val baseB = "twelve two five seven three eight nine three two two ten six"
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_cc").toString
    def docsDf(rows: Seq[(Long, String)]) =
      rows
        .toDF("doc_id", "text")
        .select(
          col("doc_id"),
          col("text"),
          lit("en").as("lang"),
          lit("synthetic").as("source"),
          length(col("text")).cast("long").as("n_chars")
        )
    val evdir = s"$dir/documents.parquet"
    docsDf(Seq((1L, s"$baseA tail"), (2L, s"$baseA tails"), (10L, s"$baseB tail"), (11L, s"$baseB tails")))
      .coalesce(1).write.mode("append").parquet(evdir)
    Thread.sleep(1100)
    docsDf(Seq((400L, s"$baseA tail"))).coalesce(1).write.mode("append").parquet(evdir) // exact clone joins A
    Thread.sleep(1100)
    docsDf(Seq((500L, s"$baseA $baseB"))).coalesce(1).write.mode("append").parquet(evdir) // the bridge
    val labels = StreamingIngest
      .dedupStreamClusters(spark, dir, splitId = 400L, filesPerTrigger = Some(1))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    for (d <- Seq(1L, 2L, 10L, 11L, 400L, 500L))
      assert(labels.get(d).contains(1L), s"doc $d not in the merged component: $labels")
  }

  test("cms stream: two-batch replay drains the exact batch sketch (counter additivity)") {
    // the sketch is additive across micro-batches, so a genuine
    // two-batch replay over the REAL sf corpus must drain to the
    // bit-identical batch sketch — including the probe tier
    val dir = java.nio.file.Files.createTempDirectory("graft_cms_stream").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val cut = docs.selectExpr("approx_percentile(doc_id, 0.5)").head().getAs[Number](0).longValue()
    val evdir = s"$dir/documents.parquet"
    docs.filter(col("doc_id") <= cut).coalesce(1).write.mode("append").parquet(evdir)
    Thread.sleep(1100)
    docs.filter(col("doc_id") > cut).coalesce(1).write.mode("append").parquet(evdir)
    val streamed = StreamingIngest.approxCmsStream(spark, dir, filesPerTrigger = Some(1))
    val batch = graft.operators.TextAnalysis.cmsTokens(spark, dir)
    assert(streamed.count() === 20L)
    assert(streamed.exceptAll(batch).count() === 0, "streamed cms probe rows not in batch answer")
    assert(batch.exceptAll(streamed).count() === 0, "batch cms probe rows missing from stream")
  }

  test("hdr stream: two-batch replay drains the exact batch sketch (counter additivity)") {
    // HDR counters are additive across micro-batches; the static orders
    // dim joins each batch, so the drained (priority, code) table — and
    // therefore the shared probe tier — equals the batch sketch exactly
    val dir = java.nio.file.Files.createTempDirectory("graft_hdr_stream").toString
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val cut = li.selectExpr("approx_percentile(l_orderkey, 0.5)").head().getAs[Number](0).longValue()
    val lidir = s"$dir/lineitem.parquet"
    li.filter(col("l_orderkey") <= cut).coalesce(1).write.mode("append").parquet(lidir)
    Thread.sleep(1100)
    li.filter(col("l_orderkey") > cut).coalesce(1).write.mode("append").parquet(lidir)
    spark.read.parquet(s"$sf/orders.parquet").coalesce(1).write.parquet(s"$dir/orders.parquet")
    val streamed = StreamingIngest.approxHdrStream(spark, dir, filesPerTrigger = Some(1))
    val batch = graft.operators.Relational.hdrLatency(spark, dir)
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0, "streamed hdr rows not in batch answer")
    assert(batch.exceptAll(streamed).count() === 0, "batch hdr rows missing from stream")
  }

  test("cusum stream: two-batch replay drains the exact batch fold (calibrate-then-monitor)") {
    // hours close across the batch boundary and the provisional row of
    // the final batch must equal the batch recursion over all hours
    val dir = twoBatchDir()
    val streamed = StreamingIngest.cusumStream(spark, dir, filesPerTrigger = Some(1))
    val batch = graft.operators.TimeSeries.cusum(spark, dir)
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0, "streamed cusum rows not in batch answer")
    assert(batch.exceptAll(streamed).count() === 0, "batch cusum rows missing from stream")
  }

  test("bloom stream: two-batch replay drains the identical set-bit table (OR-merge idempotence)") {
    // Bloom set-bits are a set union across micro-batches, so the
    // drained bit table is the batch build's bit-for-bit; the shared
    // probe tier then makes the per-eval-doc output identical
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom_stream").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val cut = docs.selectExpr("approx_percentile(doc_id, 0.5)").head().getAs[Number](0).longValue()
    val evdir = s"$dir/documents.parquet"
    docs.filter(col("doc_id") <= cut).coalesce(1).write.mode("append").parquet(evdir)
    Thread.sleep(1100)
    docs.filter(col("doc_id") > cut).coalesce(1).write.mode("append").parquet(evdir)
    val streamed = StreamingIngest.approxBloomStream(spark, dir, filesPerTrigger = Some(1))
    val batch = graft.operators.Dedup.bloomPrefilter(spark, dir)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() === 0, "streamed bloom rows not in batch answer")
    assert(batch.exceptAll(streamed).count() === 0, "batch bloom rows missing from stream")
  }

  test("cap stream: two-batch replay drains the exact batch reservoir (min-k merge algebra)") {
    // hash-order bottom-k is arrival-order-insensitive, so the
    // two-batch replay over the REAL sf corpus must drain to the
    // identical kept set (checksummed) and total count
    val dir = java.nio.file.Files.createTempDirectory("graft_cap_stream").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val cut = docs.selectExpr("approx_percentile(doc_id, 0.5)").head().getAs[Number](0).longValue()
    val evdir = s"$dir/documents.parquet"
    docs.filter(col("doc_id") <= cut).coalesce(1).write.mode("append").parquet(evdir)
    Thread.sleep(1100)
    docs.filter(col("doc_id") > cut).coalesce(1).write.mode("append").parquet(evdir)
    val streamed = StreamingIngest.sampleCapStream(spark, dir, filesPerTrigger = Some(1))
    val batch = graft.operators.TextAnalysis.capPerSource(spark, dir)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() === 0, "streamed cap rows not in batch answer")
    assert(batch.exceptAll(streamed).count() === 0, "batch cap rows missing from stream")
  }

  test("vocab stream: two-batch replay drains the exact batch Heaps curve (min-merge algebra)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vocab_stream").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val cut = docs.selectExpr("approx_percentile(doc_id, 0.5)").head().getAs[Number](0).longValue()
    val evdir = s"$dir/documents.parquet"
    // REVERSED arrival order (late half first) — the min-merge must
    // still converge to the same first-occurrence table
    docs.filter(col("doc_id") > cut).coalesce(1).write.mode("append").parquet(evdir)
    Thread.sleep(1100)
    docs.filter(col("doc_id") <= cut).coalesce(1).write.mode("append").parquet(evdir)
    val streamed = StreamingIngest.vocabStream(spark, dir, filesPerTrigger = Some(1))
    val batch = graft.operators.TextAnalysis.vocabGrowth(spark, dir)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() === 0, "streamed curve rows not in batch answer")
    assert(batch.exceptAll(streamed).count() === 0, "batch curve rows missing from stream")
  }

  test("seasonal profile stream: two-batch replay drains the exact batch baseline") {
    val dir = twoBatchDir()
    val streamed = StreamingIngest.seasonalProfileStream(spark, dir, filesPerTrigger = Some(1))
    val batch = graft.operators.TimeSeries.seasonalProfile(spark, dir)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() === 0, "streamed profile rows not in batch answer")
    assert(batch.exceptAll(streamed).count() === 0, "batch profile rows missing from stream")
  }

  test("cas stream: two-batch replay drains the exact batch chunk-dedup report") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cas_stream").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val cut = docs.selectExpr("approx_percentile(doc_id, 0.5)").head().getAs[Number](0).longValue()
    val evdir = s"$dir/documents.parquet"
    docs.filter(col("doc_id") <= cut).coalesce(1).write.mode("append").parquet(evdir)
    Thread.sleep(1100)
    docs.filter(col("doc_id") > cut).coalesce(1).write.mode("append").parquet(evdir)
    val streamed = StreamingIngest.casStream(spark, dir, filesPerTrigger = Some(1))
    val batch = graft.operators.Multimodal.chunkDedup(spark, dir)
    assert(streamed.exceptAll(batch).count() === 0, "streamed dedup rows not in batch answer")
    assert(batch.exceptAll(streamed).count() === 0, "batch dedup rows missing from stream")
  }

  test("quality stream: two-batch replay drains the exact batch books (additive flags)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_q_stream").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val cut = docs.selectExpr("approx_percentile(doc_id, 0.5)").head().getAs[Number](0).longValue()
    docs.filter(col("doc_id") <= cut).coalesce(1).write.mode("append").parquet(s"$dir/documents.parquet")
    Thread.sleep(1100)
    docs.filter(col("doc_id") > cut).coalesce(1).write.mode("append").parquet(s"$dir/documents.parquet")
    val streamed = StreamingIngest.qualityRulesStream(spark, dir, filesPerTrigger = Some(1))
    val batch = graft.operators.TextAnalysis.qualityRulesBySource(spark, dir)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() === 0, "streamed books rows not in batch answer")
    assert(batch.exceptAll(streamed).count() === 0, "batch books rows missing from stream")
  }

  test("mv stream: two-batch replay drains the exact batch materialized view (additive algebra)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mv_stream").toString
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val cut = orders.selectExpr("approx_percentile(o_orderkey, 0.5)").head().getAs[Number](0).longValue()
    orders.filter(col("o_orderkey") <= cut).coalesce(1).write.mode("append").parquet(s"$dir/orders.parquet")
    Thread.sleep(1100)
    orders.filter(col("o_orderkey") > cut).coalesce(1).write.mode("append").parquet(s"$dir/orders.parquet")
    spark.read.parquet(s"$sf/customer.parquet").write.mode("overwrite").parquet(s"$dir/customer.parquet")
    spark.read.parquet(s"$sf/nation.parquet").write.mode("overwrite").parquet(s"$dir/nation.parquet")
    val streamed = StreamingIngest.mvStream(spark, dir, filesPerTrigger = Some(1))
    val batch = spark.read.parquet(s"$dir/orders.parquet")
      .join(spark.read.parquet(s"$dir/customer.parquet"), col("c_custkey") === col("o_custkey"))
      .join(spark.read.parquet(s"$dir/nation.parquet"), col("n_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("revenue_c")
      )
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() === 0, "streamed MV rows not in batch answer")
    assert(batch.exceptAll(streamed).count() === 0, "batch MV rows missing from stream")
  }

  test("ohlc stream: two-batch replay drains the exact batch candles (struct-min/max algebra)") {
    val dir = twoBatchDir()
    val streamed = StreamingIngest.ohlcStream(spark, dir, filesPerTrigger = Some(1))
    val batch = graft.operators.TimeSeries.ohlcDaily(spark, dir)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() === 0, "streamed candles not in batch answer")
    assert(batch.exceptAll(streamed).count() === 0, "batch candles missing from stream")
  }

  test("heavy hitters stream: two-batch replay recounts to the exact batch top-k") {
    // the MG floor bound is order-independent, so the drained candidate
    // set contains the true heavy hitters in any replay — the final
    // exact recount must therefore equal the batch answer exactly
    val dir = java.nio.file.Files.createTempDirectory("graft_hh_stream").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val cut = docs.selectExpr("approx_percentile(doc_id, 0.5)").head().getAs[Number](0).longValue()
    val evdir = s"$dir/documents.parquet"
    docs.filter(col("doc_id") <= cut).coalesce(1).write.mode("append").parquet(evdir)
    Thread.sleep(1100)
    docs.filter(col("doc_id") > cut).coalesce(1).write.mode("append").parquet(evdir)
    val streamed = StreamingIngest.heavyHittersStream(spark, dir, filesPerTrigger = Some(1))
    val batch = graft.operators.TextAnalysis.heavyHitters(spark, dir)
    assert(streamed.count() === 5L)
    assert(streamed.exceptAll(batch).count() === 0, "streamed top-k rows not in batch answer")
    assert(batch.exceptAll(streamed).count() === 0, "batch top-k rows missing from stream")
  }

  test("windowed ingest matches the direct batch aggregation") {
    val streamed = StreamingIngest.ingestHourly(spark, sf)
    val batch = Tables
      .events(spark, sf)
      .groupBy(
        (expr("ts DIV 1000") - pmod(expr("ts DIV 1000"), lit(3600000000L))).as("window_start_us"),
        col("event_type")
      )
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_c"))
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
  }

  test("streaming attribution: two-batch replay equals the batch last-touch rollup exactly") {
    val dir = twoBatchDir()
    val streamed = StreamingIngest.attributionStream(spark, dir, filesPerTrigger = Some(1))
    val batch = graft.operators.Relational.attribution(spark, dir)
    assert(streamed.exceptAll(batch).count() === 0, "streamed channels not in batch answer")
    assert(batch.exceptAll(streamed).count() === 0, "batch channels missing from stream")
  }

  /** Write `rows` as one parquet file inside `dir` with a controlled
    * name and modification time (the file source batches by mod-time
    * order, so the drill controls which file is which micro-batch).
    */
  private def writeSlice(rows: org.apache.spark.sql.DataFrame, dir: String, name: String, mtime: Long): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_cps_slice").toString
    rows.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".parquet")).head
    val dst = new java.io.File(dir, name)
    java.nio.file.Files.copy(part.toPath, dst.toPath)
    assert(dst.setLastModified(mtime))
  }

  test("co-purchase stream: per-file micro-batches converge to the from-scratch tier") {
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("graft_cps_spec").toString
    val lidir = new java.io.File(root, "lineitem.parquet"); assert(lidir.mkdir())
    val li = Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_partkey"))
    val mm = li.agg(min(col("l_orderkey")), max(col("l_orderkey"))).head()
    val (mn, mx) = (mm.getLong(0), mm.getLong(1))
    val split = (mn + mx + 1L) / 2L
    val q3 = (split + mx + 1L) / 2L
    val t0 = System.currentTimeMillis() - 60000
    // corpus file + two delta files, each holding COMPLETE orders
    writeSlice(li.filter(col("l_orderkey") < split), lidir.getPath, "p0.parquet", t0)
    writeSlice(li.filter(col("l_orderkey") >= split && col("l_orderkey") < q3), lidir.getPath, "p1.parquet", t0 + 2000)
    writeSlice(li.filter(col("l_orderkey") >= q3), lidir.getPath, "p2.parquet", t0 + 4000)
    val tier = StreamingIngest.coPurchaseStream(spark, root, filesPerTrigger = Some(1))
    val b = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("dst"))
    val expect = li
      .join(b, col("ok") === col("l_orderkey") && col("l_partkey") =!= col("dst"))
      .select(col("l_partkey").as("src"), col("dst"))
      .distinct()
    assert(tier.count() === expect.count())
    assert(tier.except(expect).count() === 0 && expect.except(tier).count() === 0,
      "multi-batch streamed tier diverges from the from-scratch self-join")
  }

  test("co-purchase stream: an order straddling two micro-batches fails loud, never silently drops pairs") {
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("graft_cps_straddle").toString
    val lidir = new java.io.File(root, "lineitem.parquet"); assert(lidir.mkdir())
    val li = Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_partkey"))
    val mm = li.agg(min(col("l_orderkey")), max(col("l_orderkey"))).head()
    val split = (mm.getLong(0) + mm.getLong(1) + 1L) / 2L
    // pick a post-split order with >= 2 items and split ITS rows
    // across the two delta files
    val x = li.filter(col("l_orderkey") >= split)
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2).agg(min(col("l_orderkey"))).head().getLong(0)
    val xRows = li.filter(col("l_orderkey") === x).collect()
    val xSplitPart = xRows.map(_.getLong(1)).sorted.apply(xRows.length / 2)
    val t0 = System.currentTimeMillis() - 60000
    writeSlice(li.filter(col("l_orderkey") < split), lidir.getPath, "p0.parquet", t0)
    writeSlice(
      li.filter(col("l_orderkey") >= split && col("l_orderkey") =!= x)
        .unionByName(li.filter(col("l_orderkey") === x && col("l_partkey") < xSplitPart)),
      lidir.getPath, "p1.parquet", t0 + 2000)
    writeSlice(li.filter(col("l_orderkey") === x && col("l_partkey") >= xSplitPart),
      lidir.getPath, "p2.parquet", t0 + 4000)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      StreamingIngest.coPurchaseStream(spark, root, filesPerTrigger = Some(1))
    )
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + chain(t.getCause)
    assert(chain(e).contains("straddled"), s"wrong failure: ${chain(e)}")
  }

  test("co-purchase stream: a replayed batchId is idempotent — no false straddle, no duplicate edges or ledger rows") {
    import org.apache.spark.sql.functions._
    import graft.sources.GraphTier
    // foreachBatch is at-least-once: a crash AFTER the ledger write but
    // BEFORE the checkpoint commit redelivers the same batchId. Drive
    // the per-batch body directly to simulate exactly that replay.
    val store = java.nio.file.Files.createTempDirectory("graft_cps_replay").toString + "/s"
    val li = Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_partkey"))
    val mm = li.agg(min(col("l_orderkey")), max(col("l_orderkey"))).head()
    val split = (mm.getLong(0) + mm.getLong(1) + 1L) / 2L
    GraphTier.writeCoPurchase(li.filter(col("l_orderkey") < split), store)
    StreamingIngest.writeOrderLedger(spark, store, li.filter(col("l_orderkey") < split), batchId = -1L, bootstrap = true)
    val batch1 = li.filter(col("l_orderkey") >= split).localCheckpoint()
    StreamingIngest.coPurchaseBatch(spark, store, batch1, batchId = 0L)
    val edges1 = GraphTier.readCoPurchase(spark, store).count()
    val ledger1 = spark.read.parquet(s"$store/orders").count()
    // the replay: same batch, same batchId — must complete (its own
    // ledger rows are not straddlers) and change nothing
    StreamingIngest.coPurchaseBatch(spark, store, batch1, batchId = 0L)
    assert(GraphTier.readCoPurchase(spark, store).count() === edges1, "replay duplicated edges")
    assert(spark.read.parquet(s"$store/orders").count() === ledger1, "replay duplicated ledger rows")
    // a genuinely split order (same orders under a NEW batchId) still fails loud
    val e = intercept[IllegalStateException](
      StreamingIngest.coPurchaseBatch(spark, store, batch1, batchId = 1L)
    )
    assert(e.getMessage.contains("straddled"))
  }

  test("watermark-bound streams fail loudly on a pre-epoch event instead of silently dropping it") {
    import spark.implicits._
    // Spark's global watermark floors at epoch 0 and only ratchets up,
    // so a watermark-filtered stream would DROP every pre-1970 row as
    // late — the guard turns that silent loss into an error naming the
    // row (tools/negts.py WATERMARK_BOUND; SURVEY §3)
    val dir = java.nio.file.Files.createTempDirectory("graft_preepoch").toString
    Seq(
      (1L, -3600L * 1000000000L), // one hour before epoch, nanos
      (1L, 7200L * 1000000000L)
    ).toDF("user_id", "ts").coalesce(1).write.parquet(s"$dir/events.parquet")
    val e = intercept[Throwable](StreamingIngest.sessionizeStream(spark, dir))
    val chain = Iterator
      .iterate(e)(_.getCause)
      .takeWhile(_ != null)
      .map(t => String.valueOf(t.getMessage))
      .mkString(" | ")
    assert(chain.contains("pre-epoch event time"), s"expected the loud guard, got: $chain")
    // post-epoch rows pass the guard untouched on the same stream shape
    val ok = java.nio.file.Files.createTempDirectory("graft_postepoch").toString
    Seq((1L, 3600L * 1000000000L), (1L, 7200L * 1000000000L))
      .toDF("user_id", "ts").coalesce(1).write.parquet(s"$ok/events.parquet")
    assert(StreamingIngest.sessionizeStream(spark, ok).count() === 2L) // 1h apart > 30min gap: two sessions
  }
}
