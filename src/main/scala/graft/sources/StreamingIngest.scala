package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.functions.FixedPoint._

/** Structured Streaming ingest path — the Spark-native re-expression of
  * the reference's write/ingest surface (timebox.py:57-88 from_pandas +
  * the fcntl-locked file update, timebox.py:405-455). In Spark-land the
  * single-writer lock becomes the streaming commit log: each micro-batch
  * is an atomic, exactly-once append, and readers never observe a
  * half-written update.
  *
  * The ingest pipeline is readStream → event-time tumbling-window
  * aggregation → sink. Here the sink is an in-memory table so the
  * driver's oracle can compare it against the batch answer; in
  * production the same query writes parquet/Kafka with identical
  * semantics. `Trigger.AvailableNow` drains the source to its current
  * end and stops — which is also the deterministic replay mode for a
  * correctness gate.
  *
  * Scale posture: the windowed aggregation is keyed on (window,
  * event_type), so state partitions across executors by group key;
  * map-side partial aggregation compacts each micro-batch before the
  * state-store shuffle. With a watermark (production mode `append`),
  * state for closed windows is dropped, so memory is bounded by the
  * watermark horizon, not stream length.
  */
object StreamingIngest {

  /** Hourly tumbling-window ingest aggregation over the events stream;
    * returns the materialized result table (== the batch oracle).
    */
  def ingestHourly(spark: SparkSession, dir: String): DataFrame = {
    // File streams need an explicit schema: take it from the batch reader.
    val schema = Tables.eventsFileSchema(spark, dir)
    val stream = spark.readStream
      .schema(schema)
      // the source path is a single file; glob it so the stream's base
      // path resolves to the enclosing directory
      .parquet(s"$dir/events.parque[t]")
      .transform(Tables.normalizeEventsTs)

    // ts is epoch-nanos (nanosAsLong); event-time windowing needs a real
    // timestamp column, truncated to micros exactly like the batch path.
    val agg = stream
      .withColumn("ts_t", timestamp_micros(expr("ts DIV 1000")))
      .withWatermark("ts_t", "1 hour")
      .groupBy(window(col("ts_t"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_c"))
      .select(
        unix_micros(col("w.start")).as("window_start_us"),
        col("event_type"),
        col("n"),
        col("sum_c")
      )

    runToMemory(spark, agg, "complete")
  }

  /** Production shape of [[ingestHourly]]: APPEND mode. Each window is
    * emitted exactly once — when the 1-hour watermark passes its end —
    * and its state is dropped, so state-store memory is bounded by the
    * watermark horizon, not stream length (the `complete`-mode variant
    * above re-emits everything and never drops state; it exists because
    * the oracle compares the full result set). Windows still open when
    * the stream drains are never emitted — correct append semantics.
    *
    * @param filesPerTrigger cap files per micro-batch so a replay has
    *        multiple batches to advance the watermark across
    */
  def ingestHourlyAppend(
      spark: SparkSession,
      dir: String,
      filesPerTrigger: Option[Int] = None
  ): DataFrame =
    runToMemory(spark, hourlyAppendStream(spark, dir, filesPerTrigger), "append")

  /** The un-sunk append-mode hourly aggregation stream — exposed so
    * recovery tests can drive their own sink/checkpoint lifecycle
    * (kill between micro-batches, restart from the checkpoint).
    */
  private[graft] def hourlyAppendStream(
      spark: SparkSession,
      dir: String,
      filesPerTrigger: Option[Int] = None
  ): DataFrame = {
    val schema = Tables.eventsFileSchema(spark, dir)
    val reader = spark.readStream.schema(schema)
    filesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader
      .parquet(s"$dir/events.parque[t]")
      .transform(Tables.normalizeEventsTs)
      .withColumn("ts_t", timestamp_micros(expr("ts DIV 1000")))
      .withWatermark("ts_t", "1 hour")
      .groupBy(window(col("ts_t"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_c"))
      .select(
        unix_micros(col("w.start")).as("window_start_us"),
        col("event_type"),
        col("n"),
        col("sum_c")
      )
  }

  /** Gap-based sessionization as CUSTOM STREAMING STATE
    * (`flatMapGroupsWithState`): per-user state carries the open
    * session across micro-batches; a >30-minute silence closes it.
    * Same semantics as the batch
    * [[graft.operators.TimeSeries.sessionize]], computed incrementally —
    * the ingest-time path a 100 TB deployment runs, where
    * re-sessionizing full history per query is not an option. State is
    * one (start, end, count) triple per live user — bounded by active
    * series, not stream length.
    *
    * Production hardening: the stream carries a 30-minute watermark and
    * the state an EVENT-TIME TIMEOUT at session end + gap, so an idle
    * user's open session is flushed (emitted + state dropped) as soon
    * as the watermark passes it — state never accumulates dead users.
    *
    * Emission contract: each batch emits every session it touched
    * (closed and timed-out sessions final, the still-open session as
    * its end-of-batch snapshot), and the returned table dedupes by
    * (user_id, start_us) keeping the latest extent — a session's start
    * never changes, so this is exact for any batch split of an
    * in-order replay. Under single-batch `Trigger.AvailableNow` the
    * dedupe is the identity and the result IS the batch
    * sessionization, which is what the oracle checks;
    * StreamingSpec additionally replays file-by-file and asserts the
    * multi-batch result matches batch exactly.
    *
    * @param filesPerTrigger cap files per micro-batch (None = drain in
    *        one batch) — the multi-batch replay knob for tests
    */
  def sessionizeStream(
      spark: SparkSession,
      dir: String,
      gapUs: Long = 30L * 60 * 1000000L,
      filesPerTrigger: Option[Int] = None
  ): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, GroupState}

    val schema = Tables.eventsFileSchema(spark, dir)
    val reader = spark.readStream.schema(schema)
    filesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    // the watermarked column must flow into the grouped Dataset's
    // output — Spark's streaming checker looks for the watermark
    // metadata on the flatMapGroupsWithState child's attributes
    val stream = reader
      .parquet(s"$dir/events.parque[t]")
      .transform(Tables.normalizeEventsTs)
      .transform(Tables.requirePostEpochTs) // watermark-bound stream: see Tables scaladoc
      .withColumn("ts_t", timestamp_micros(expr("ts DIV 1000")))
      .withWatermark("ts_t", "30 minutes")
      .select(
        col("user_id").as[Long],
        expr("ts DIV 1000").as("ts_us").as[Long],
        col("ts_t").as[java.sql.Timestamp]
      )
      .as[(Long, Long, java.sql.Timestamp)]

    val gapMs = gapUs / 1000L
    val sessions = stream
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long), (Long, Long, Long, Long)](
        OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout
      ) { (uid: Long, rows: Iterator[(Long, Long, java.sql.Timestamp)], state: GroupState[(Long, Long, Long)]) =>
        if (state.hasTimedOut) {
          // watermark passed session end + gap: the session can never
          // be extended — final-emit it and DROP the state
          val (s, e, n) = state.get
          state.remove()
          Iterator.single((uid, s, e, n))
        } else {
          val ts = rows.map(_._2).toArray
          java.util.Arrays.sort(ts)
          val out = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long, Long)]
          // (start, end, n) of the session currently open
          var cur = state.getOption.orNull
          ts.foreach { t =>
            cur match {
              case null => cur = (t, t, 1L)
              case (s, e, n) =>
                if (t - e > gapUs) { out += ((uid, s, e, n)); cur = (t, t, 1L) }
                else cur = (s, math.max(e, t), n + 1)
            }
          }
          if (cur != null) {
            state.update(cur)
            // flush when the watermark passes session end + gap; clamp
            // above the current watermark (a late row within the
            // allowance could otherwise compute a timeout in the past,
            // which Spark rejects)
            state.setTimeoutTimestamp(math.max(cur._2 / 1000L + gapMs, state.getCurrentWatermarkMs() + 1L))
            out += ((uid, cur._1, cur._2, cur._3))
          }
          out.iterator
        }
      }
      .toDF("user_id", "start_us", "end_us", "n_events")

    // exact-final-set view over the append log: latest extent per
    // (user, session start). Identity for a single-batch replay.
    runToMemory(spark, sessions, "append")
      .groupBy(col("user_id"), col("start_us"))
      .agg(max(col("end_us")).as("end_us"), max(col("n_events")).as("n_events"))
  }

  /** Streaming anomaly detection: the batch trailing-window z-score
    * ([[graft.operators.TimeSeries.anomalyZscore]]) as CUSTOM STREAMING
    * STATE — per-series state is a ring buffer of the last `win`
    * fixed-point values, so each arriving point is scored against its
    * own past immediately (the alerting path; re-scoring history per
    * query is not an option at 100 TB). State is `win` longs per live
    * series — bounded by active series count, not stream length. The
    * integer variance test (n·x−S)² > z²·(n·Q−S²) is exact, so the
    * streamed verdicts equal the batch operator's bit-for-bit — which
    * is what the oracle (the same SQL as ts_anomaly_zscore) checks.
    *
    * PRECONDITION (enforced, not assumed): the source must deliver each
    * series in event-time order ACROSS micro-batches (an ingest-ordered
    * log / time-split replay). Scoring is order-sensitive, so a point
    * older than one already scored cannot be repaired retroactively —
    * the state carries the last scored (ts, seq) per series and the
    * query FAILS LOUDLY on a cross-batch regression instead of silently
    * scoring against the wrong history. Buffering to full event-time
    * order behind a watermark is deliberately not done here: it would
    * hold back (and at drain, never emit) every point inside the
    * watermark horizon, breaking the alerting contract that each point
    * is scored on arrival.
    */
  def anomalyStream(
      spark: SparkSession,
      dir: String,
      win: Int = 20,
      z: Int = 3,
      filesPerTrigger: Option[Int] = None
  ): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, GroupState}
    val schema = Tables.eventsFileSchema(spark, dir)
    val reader = spark.readStream.schema(schema)
    filesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val stream = reader
      .parquet(s"$dir/events.parque[t]")
      .transform(Tables.normalizeEventsTs)
      .select(
        col("user_id").as[Long],
        expr("ts DIV 1000").as("ts_us").as[Long],
        col("event_id").as[Long],
        cents(col("value")).as("value_c").as[Long]
      )
      .as[(Long, Long, Long, Long)]
    val zz = z.toLong * z
    // state = (ring of last `win` values, last scored ts, last scored seq)
    val scored = stream
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Array[Long], Long, Long), (Long, Long, Long, Long, Long)](
        OutputMode.Append,
        GroupStateTimeout.NoTimeout // state is a fixed-size ring buffer by design
      ) { (uid: Long, rows: Iterator[(Long, Long, Long, Long)], state: GroupState[(Array[Long], Long, Long)]) =>
        val pts = rows.toArray.sortBy(r => (r._2, r._3))
        var (ring, lastTs, lastSeq) =
          state.getOption.getOrElse((Array.empty[Long], Long.MinValue, Long.MinValue))
        // enforce the cross-batch in-order precondition (see Scaladoc):
        // a regression means the source violated its ordering contract
        // and every later score for this series would be wrong
        pts.headOption.foreach { case (_, ts, eid, _) =>
          if (ts < lastTs || (ts == lastTs && eid < lastSeq))
            throw new IllegalStateException(
              s"anomalyStream: out-of-order arrival for series $uid — point (ts=$ts, seq=$eid) " +
                s"after already-scored (ts=$lastTs, seq=$lastSeq); the source must deliver each " +
                "series in event-time order across micro-batches"
            )
        }
        val out = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long, Long, Long)]
        pts.foreach { case (_, ts, eid, x) =>
          if (ring.length >= win) {
            val past = ring.takeRight(win)
            val n = past.length.toLong
            val s = past.sum
            val q = past.map(v => v * v).sum
            val devN = n * x - s
            val isAnom = if (devN * devN > zz * (n * q - s * s)) 1L else 0L
            out += ((eid, uid, ts, x, isAnom))
          }
          ring = (ring :+ x).takeRight(win)
          lastTs = ts
          lastSeq = eid
        }
        state.update((ring, lastTs, lastSeq))
        out.iterator
      }
      .toDF("event_id", "user_id", "ts_us", "value_c", "is_anomaly")
    runToMemory(spark, scored, "append")
  }

  /** Streaming histogram quantile: the PromQL-style
    * [[graft.operators.TimeSeries.histogramQuantile]] over a LIVE
    * stream. The trick is that the fixed-width value histogram IS the
    * streaming state — a (type, bucket) counter map bounded by the
    * bucket count, not the stream — so the aggregation runs as a
    * streaming groupBy and the quantile walk happens over the tiny
    * materialized histogram after each drain. Equals the batch
    * operator exactly (shared oracle): counts are exact integers
    * regardless of arrival order.
    */
  def histogramQuantileStream(
      spark: SparkSession,
      dir: String,
      qMicro: Long = 900000L,
      bucketC: Long = 500L,
      filesPerTrigger: Option[Int] = None
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val schema = Tables.eventsFileSchema(spark, dir)
    val reader = spark.readStream.schema(schema)
    filesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val hist = reader
      .parquet(s"$dir/events.parque[t]")
      .transform(Tables.normalizeEventsTs)
      .select(col("event_type"), cents(col("value")).as("v"))
      .groupBy(col("event_type"), expr(s"(v - pmod(v, ${bucketC}L)) DIV ${bucketC}L").as("bucket"))
      .agg(count(lit(1)).as("n"))
    val table = runToMemory(spark, hist, "complete")
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
    val wAll = Window.partitionBy(col("event_type"))
    table
      .withColumn("cum", sum(col("n")).over(wOrd))
      .withColumn("total_n", sum(col("n")).over(wAll))
      .withColumn("rank_k", expr(s"(total_n * ${qMicro}L + 999999L) DIV 1000000L"))
      .filter(col("cum") >= col("rank_k"))
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(wOrd))
      .filter(col("rn") === 1)
      .select(
        col("event_type"),
        col("total_n"),
        col("rank_k"),
        col("bucket"),
        expr(s"bucket * ${bucketC}L * 1000000L + (${bucketC}L * (rank_k - (cum - n)) * 1000000L) DIV n")
          .as("est_microc")
      )
  }

  /** Streaming TOP-K per hour — the live-leaderboard shape: a
    * watermarked event-time hourly window aggregates per-user counts
    * in APPEND mode, so a (window, user) row emits exactly once, when
    * the watermark passes the hour's end. State is bounded by the
    * watermark horizon (the open hours × active users), never stream
    * length — the 24/7 posture; complete-mode ranking over all history
    * would not be. The final rank runs over the emitted (finalized)
    * rows; the oracle applies the same finalization cutoff: only hours
    * whose END is at or below the final watermark score.
    */
  def topkStream(
      spark: SparkSession,
      dir: String,
      k: Int = 3,
      filesPerTrigger: Option[Int] = None
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val schema = Tables.eventsFileSchema(spark, dir)
    val reader = spark.readStream.schema(schema)
    filesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val counts = reader
      .parquet(s"$dir/events.parque[t]")
      .transform(Tables.normalizeEventsTs)
      .transform(Tables.requirePostEpochTs) // watermark-bound stream: see Tables scaladoc
      .withColumn("ts_t", timestamp_micros(expr("ts DIV 1000")))
      .withWatermark("ts_t", "30 minutes")
      .groupBy(window(col("ts_t"), "1 hour"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        expr("unix_micros(window.start) DIV 3600000000").as("hour_id"),
        col("user_id"),
        col("n_events")
      )
    val finalized = runToMemory(spark, counts, "append")
    val w = Window.partitionBy(col("hour_id")).orderBy(col("n_events").desc, col("user_id").asc)
    finalized
      .withColumn("rnk", rank().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** Streaming EWMA: the batch [[graft.operators.TimeSeries.ewma]]
    * (α = 1/2, 16-point truncation, exact power-of-two integer
    * weights) as per-series ring-buffer state — each arriving point is
    * smoothed on arrival against the last 15 values, the live-metrics
    * shape of the batch operator. Same enforced cross-batch
    * event-time-order contract as [[anomalyStream]]; because weights
    * and divisions are exact integers, the streamed estimates equal
    * the batch operator's bit-for-bit (shared oracle).
    */
  /** ts_cusum_stream — the OFFLINE-CALIBRATED ONLINE DRIFT MONITOR:
    * Page's two-sided CUSUM maintained as streaming state. Baseline
    * and scale (median/MAD ⇒ slack k, threshold h) are calibrated
    * BATCH-side and join the stream as a static per-series parameter
    * table (stream-static join — the production shape: you calibrate
    * on history, then monitor 24/7 against fixed thresholds). The
    * stream folds each CLOSED hour's mean into (gp, gn, alarms, max)
    * exactly as the batch fold does; hours close when a later-hour
    * point arrives. Each batch also emits a PROVISIONAL row that
    * virtually closes the still-open hour (state itself stays
    * unfolded), tagged with a per-series batch seq — at drain all data
    * has arrived, so the max-seq row per series IS the batch answer,
    * which is why ts_cusum's oracle verifies this stream. In-order
    * delivery across micro-batches is required and enforced loudly
    * (the ewmaStream contract).
    */
  def cusumStream(
      spark: SparkSession,
      dir: String,
      filesPerTrigger: Option[Int] = None
  ): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    // batch-side calibration: per-series lower-median and MAD of
    // hourly means, k = max(1, MAD DIV 2), h = 5·max(1, MAD)
    val params = graft.operators.TimeSeries
      .cusum(spark, dir)
      .select(
        col("user_id"),
        col("med_c"),
        col("mad_c"),
        expr("greatest(CAST(1 AS BIGINT), mad_c DIV 2)").as("kk"),
        expr("5L * greatest(CAST(1 AS BIGINT), mad_c)").as("hh")
      )
    val schema = Tables.eventsFileSchema(spark, dir)
    val reader = spark.readStream.schema(schema)
    filesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val stream = reader
      .parquet(s"$dir/events.parque[t]")
      .transform(Tables.normalizeEventsTs)
      .select(
        col("user_id"),
        expr("ts DIV 1000 DIV 3600000000").as("hour_id"),
        cents(col("value")).as("v")
      )
      .join(params, Seq("user_id")) // stream-static: calibration is a dim
      .select(
        col("user_id").as[Long],
        col("hour_id").as[Long],
        col("v").as[Long],
        col("med_c").as[Long],
        col("mad_c").as[Long],
        col("kk").as[Long],
        col("hh").as[Long]
      )
      .as[(Long, Long, Long, Long, Long, Long, Long)]
    // state: (curHour, sum, cnt, gp, gn, al, mx, nClosed, seq)
    val folded = stream
      .groupByKey(_._1)
      .flatMapGroupsWithState[
        (Long, Long, Long, Long, Long, Long, Long, Long, Long),
        (Long, Long, Long, Long, Long, Long, Long, Long, Long)
      ](
        OutputMode.Append,
        GroupStateTimeout.NoTimeout // state is a fixed tuple of longs
      ) { (uid: Long, rows: Iterator[(Long, Long, Long, Long, Long, Long, Long)],
           state: GroupState[(Long, Long, Long, Long, Long, Long, Long, Long, Long)]) =>
        val pts = rows.toArray.sortBy(_._2)
        val (med, mad, kk, hh) = (pts.head._4, pts.head._5, pts.head._6, pts.head._7)
        var (curH, sum, cnt, gp, gn, al, mx, nClosed, seq) =
          state.getOption.getOrElse((Long.MinValue, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L))
        if (pts.head._2 < curH)
          throw new IllegalStateException(
            s"cusumStream: out-of-order arrival for series $uid — hour ${pts.head._2} after " +
              s"already-open hour $curH; the source must deliver each series in event-time order"
          )
        def page(g1: Long, g2: Long, a: Long, m: Long, z: Long): (Long, Long, Long, Long) = {
          val gp1 = math.max(0L, g1 + (z - med) - kk)
          val gn1 = math.max(0L, g2 - (z - med) - kk)
          val m2  = math.max(m, math.max(gp1, gn1))
          if (gp1 > hh || gn1 > hh) (0L, 0L, a + 1, m2) else (gp1, gn1, a, m2)
        }
        pts.foreach { case (_, h, v, _, _, _, _) =>
          if (h != curH) {
            if (curH != Long.MinValue) {
              // Scala /, Spark DIV, DuckDB // all truncate toward zero
              val (a, b, c, d) = page(gp, gn, al, mx, sum / cnt)
              gp = a; gn = b; al = c; mx = d; nClosed += 1
            }
            curH = h; sum = 0L; cnt = 0L
          }
          sum += v; cnt += 1
        }
        seq += 1
        state.update((curH, sum, cnt, gp, gn, al, mx, nClosed, seq))
        // provisional: virtually close the open hour — at drain this IS final
        val (pg, pn, pa, pm) = page(gp, gn, al, mx, sum / cnt)
        Iterator.single((uid, seq, nClosed + 1, med, mad, pa, pm, pg, pn))
      }
      .toDF("user_id", "seq", "n_hours", "med_c", "mad_c", "n_alarms", "max_stat", "gp_final", "gn_final")
    // final view over the append log: the max-seq provisional per series
    runToMemory(spark, folded, "append")
      .groupBy(col("user_id"))
      .agg(
        max_by(
          struct(col("n_hours"), col("med_c"), col("mad_c"), col("n_alarms"), col("max_stat"), col("gp_final"), col("gn_final")),
          col("seq")
        ).as("f")
      )
      .select(
        col("user_id"),
        col("f.n_hours").as("n_hours"),
        col("f.med_c").as("med_c"),
        col("f.mad_c").as("mad_c"),
        col("f.n_alarms").as("n_alarms"),
        col("f.max_stat").as("max_stat"),
        col("f.gp_final").as("gp_final"),
        col("f.gn_final").as("gn_final")
      )
  }

  def ewmaStream(
      spark: SparkSession,
      dir: String,
      span: Int = 16,
      filesPerTrigger: Option[Int] = None
  ): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, GroupState}
    val schema = Tables.eventsFileSchema(spark, dir)
    val reader = spark.readStream.schema(schema)
    filesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val stream = reader
      .parquet(s"$dir/events.parque[t]")
      .transform(Tables.normalizeEventsTs)
      .select(
        col("user_id").as[Long],
        expr("ts DIV 1000").as("ts_us").as[Long],
        col("event_id").as[Long],
        cents(col("value")).as("value_c").as[Long]
      )
      .as[(Long, Long, Long, Long)]
    val smoothed = stream
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Array[Long], Long, Long), (Long, Long, Long, Long, Long)](
        OutputMode.Append,
        GroupStateTimeout.NoTimeout // state is a fixed-size ring buffer by design
      ) { (uid: Long, rows: Iterator[(Long, Long, Long, Long)], state: GroupState[(Array[Long], Long, Long)]) =>
        val pts = rows.toArray.sortBy(r => (r._2, r._3))
        var (ring, lastTs, lastSeq) =
          state.getOption.getOrElse((Array.empty[Long], Long.MinValue, Long.MinValue))
        pts.headOption.foreach { case (_, ts, eid, _) =>
          if (ts < lastTs || (ts == lastTs && eid < lastSeq))
            throw new IllegalStateException(
              s"ewmaStream: out-of-order arrival for series $uid — point (ts=$ts, seq=$eid) " +
                s"after already-smoothed (ts=$lastTs, seq=$lastSeq); the source must deliver each " +
                "series in event-time order across micro-batches"
            )
        }
        val out = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long, Long, Long)]
        pts.foreach { case (_, ts, eid, x) =>
          // terms oldest→newest over (ring :+ x), weights 2^(span-s)..2^(span-1)
          val vals = (ring :+ x).takeRight(span)
          val s = vals.length
          var num = 0L
          var den = 0L
          var wgt = 1L << (span - s)
          vals.foreach { v => num += v * wgt; den += wgt; wgt <<= 1 }
          out += ((eid, uid, ts, x, num / den)) // non-negative: / == floor DIV
          ring = (ring :+ x).takeRight(span - 1)
          lastTs = ts
          lastSeq = eid
        }
        state.update((ring, lastTs, lastSeq))
        out.iterator
      }
      .toDF("event_id", "user_id", "ts_us", "value_c", "ewma_c")
    runToMemory(spark, smoothed, "append")
  }

  /** Streaming COUNTER RATE — the PromQL-increase shape as a 24/7
    * pipeline: per-series state is ONE tuple (last value, last event
    * coordinates); each micro-batch emits its points' deltas against
    * that running state, so a counter's rate is continuous ACROSS
    * micro-batch boundaries (the property a per-batch window lag
    * cannot give). Per-hour aggregation runs over the emitted delta
    * log; the oracle is the batch rate query — replaying the same
    * files must land on identical hourly sums. Same in-order source
    * contract as the other per-series stateful streams (enforced
    * loudly, not assumed).
    */
  def rateStream(
      spark: SparkSession,
      dir: String,
      filesPerTrigger: Option[Int] = None
  ): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, GroupState}
    val schema = Tables.eventsFileSchema(spark, dir)
    val reader = spark.readStream.schema(schema)
    filesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val stream = reader
      .parquet(s"$dir/events.parque[t]")
      .transform(Tables.normalizeEventsTs)
      .select(
        col("user_id").as[Long],
        expr("ts DIV 1000").as("ts_us").as[Long],
        col("event_id").as[Long],
        cents(col("value")).as("value_c").as[Long]
      )
      .as[(Long, Long, Long, Long)]
    val deltas = stream
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long), (Long, Long, Long)](
        OutputMode.Append,
        GroupStateTimeout.NoTimeout // state is one tuple per live series
      ) { (uid: Long, rows: Iterator[(Long, Long, Long, Long)], state: GroupState[(Long, Long, Long)]) =>
        val pts = rows.toArray.sortBy(r => (r._2, r._3))
        var (lastVal, lastTs, lastSeq) =
          state.getOption.getOrElse((Long.MinValue, Long.MinValue, Long.MinValue))
        pts.headOption.foreach { case (_, ts, eid, _) =>
          if (ts < lastTs || (ts == lastTs && eid < lastSeq))
            throw new IllegalStateException(
              s"rateStream: out-of-order arrival for series $uid — point (ts=$ts, seq=$eid) " +
                s"after already-rated (ts=$lastTs, seq=$lastSeq); the source must deliver each " +
                "series in event-time order across micro-batches"
            )
        }
        val out = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long)]
        pts.foreach { case (_, ts, eid, v) =>
          if (lastTs != Long.MinValue) out += ((uid, ts, v - lastVal))
          lastVal = v
          lastTs = ts
          lastSeq = eid
        }
        state.update((lastVal, lastTs, lastSeq))
        out.iterator
      }
      .toDF("user_id", "ts_us", "dv")
    runToMemory(spark, deltas, "append")
      .groupBy(col("user_id"), expr("ts_us DIV 3600000000").as("hour_id"))
      .agg(
        count(lit(1)).as("n_deltas"),
        sum(when(col("dv") > 0, col("dv")).otherwise(0L)).as("increase_c"),
        sum(col("dv")).as("net_delta_c")
      )
  }

  /** [[rateStream]] WITHOUT the in-order source contract: a
    * watermark-bounded REORDERING BUFFER in front of the same
    * last-value state. Cross-batch disorder within the 30-minute
    * allowance is absorbed — each invocation merges arrivals into the
    * per-series buffer and FINALIZES (sorts + emits deltas for) only
    * points at or below the current watermark, which no later arrival
    * is allowed to precede; an event-time timeout flushes newly
    * eligible points when the watermark advances without new data for
    * the key. Points late beyond the allowance drop (the standard
    * streaming contract), and the un-finalizable tail above the final
    * watermark is EXCLUDED by construction — the oracle applies the
    * identical cutoff (max event ms − 30 min), so replay equality is
    * exact. State per series = one anchor tuple + the ≤allowance
    * buffer, bounded by data rate × allowance, never stream length.
    */
  def rateStreamReordering(
      spark: SparkSession,
      dir: String,
      filesPerTrigger: Option[Int] = None
  ): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, GroupState}
    val schema = Tables.eventsFileSchema(spark, dir)
    val reader = spark.readStream.schema(schema)
    filesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val stream = reader
      .parquet(s"$dir/events.parque[t]")
      .transform(Tables.normalizeEventsTs)
      .transform(Tables.requirePostEpochTs) // watermark-bound stream: see Tables scaladoc
      .withColumn("ts_t", timestamp_micros(expr("ts DIV 1000")))
      .withWatermark("ts_t", "30 minutes")
      .select(
        col("user_id").as[Long],
        expr("ts DIV 1000").as("ts_us").as[Long],
        col("event_id").as[Long],
        cents(col("value")).as("value_c").as[Long],
        col("ts_t").as[java.sql.Timestamp]
      )
      .as[(Long, Long, Long, Long, java.sql.Timestamp)]
    // state: (anchorVal, anchorTs, anchorSeq, buffer of (ts, seq, v))
    val deltas = stream
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long, Array[(Long, Long, Long)]), (Long, Long, Long)](
        OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout
      ) { (uid: Long, rows: Iterator[(Long, Long, Long, Long, java.sql.Timestamp)],
           state: GroupState[(Long, Long, Long, Array[(Long, Long, Long)])]) =>
        val wmUs = state.getCurrentWatermarkMs() * 1000L
        var (aVal, aTs, aSeq, buf) =
          state.getOption.getOrElse((Long.MinValue, Long.MinValue, Long.MinValue, Array.empty[(Long, Long, Long)]))
        // merge arrivals; drop only what is late BEYOND the allowance
        // (sorts before the already-finalized anchor)
        val incoming = rows.map(r => (r._2, r._3, r._4)).filter { case (ts, seq, _) =>
          aTs == Long.MinValue || ts > aTs || (ts == aTs && seq > aSeq)
        }
        buf = (buf ++ incoming).sortBy(p => (p._1, p._2))
        val (eligible, rest) = buf.partition(_._1 <= wmUs)
        val out = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long)]
        eligible.foreach { case (ts, seq, v) =>
          if (aTs != Long.MinValue) out += ((uid, ts, v - aVal))
          aVal = v; aTs = ts; aSeq = seq
        }
        state.update((aVal, aTs, aSeq, rest))
        // flush the remaining buffer when the watermark passes it
        if (rest.nonEmpty) state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1L)
        out.iterator
      }
      .toDF("user_id", "ts_us", "dv")
    runToMemory(spark, deltas, "append")
      .groupBy(col("user_id"), expr("ts_us DIV 3600000000").as("hour_id"))
      .agg(
        count(lit(1)).as("n_deltas"),
        sum(when(col("dv") > 0, col("dv")).otherwise(0L)).as("increase_c"),
        sum(col("dv")).as("net_delta_c")
      )
  }

  /** Out-of-order-tolerant streaming anomaly scoring — the
    * [[rateStreamReordering]] recipe applied to the trailing-window
    * z-score: the per-series state carries the ring buffer AND a
    * watermark-bounded reordering buffer; only at-or-below-watermark
    * points are scored (in event-time order, so every point's ring is
    * exactly its batch trailing window), an event-time timeout flushes
    * as the watermark advances, and the oracle applies the same
    * final-watermark cutoff. This lifts the in-order source contract
    * [[anomalyStream]] enforces loudly — the 24/7 deployment answer to
    * "my collectors deliver a few minutes late and shuffled".
    */
  def anomalyStreamReordering(
      spark: SparkSession,
      dir: String,
      win: Int = 20,
      z: Int = 3,
      filesPerTrigger: Option[Int] = None
  ): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, GroupState}
    val schema = Tables.eventsFileSchema(spark, dir)
    val reader = spark.readStream.schema(schema)
    filesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val stream = reader
      .parquet(s"$dir/events.parque[t]")
      .transform(Tables.normalizeEventsTs)
      .transform(Tables.requirePostEpochTs) // watermark-bound stream: see Tables scaladoc
      .withColumn("ts_t", timestamp_micros(expr("ts DIV 1000")))
      .withWatermark("ts_t", "30 minutes")
      .select(
        col("user_id").as[Long],
        expr("ts DIV 1000").as("ts_us").as[Long],
        col("event_id").as[Long],
        cents(col("value")).as("value_c").as[Long],
        col("ts_t").as[java.sql.Timestamp]
      )
      .as[(Long, Long, Long, Long, java.sql.Timestamp)]
    val zz = z.toLong * z
    // state: (ring, lastTs, lastSeq, reordering buffer of (ts, seq, x))
    val scored = stream
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Array[Long], Long, Long, Array[(Long, Long, Long)]), (Long, Long, Long, Long, Long)](
        OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout
      ) { (uid: Long, rows: Iterator[(Long, Long, Long, Long, java.sql.Timestamp)],
           state: GroupState[(Array[Long], Long, Long, Array[(Long, Long, Long)])]) =>
        val wmUs = state.getCurrentWatermarkMs() * 1000L
        var (ring, lastTs, lastSeq, buf) =
          state.getOption.getOrElse((Array.empty[Long], Long.MinValue, Long.MinValue, Array.empty[(Long, Long, Long)]))
        val incoming = rows.map(r => (r._2, r._3, r._4)).filter { case (ts, seq, _) =>
          lastTs == Long.MinValue || ts > lastTs || (ts == lastTs && seq > lastSeq)
        }
        buf = (buf ++ incoming).sortBy(p => (p._1, p._2))
        val (eligible, rest) = buf.partition(_._1 <= wmUs)
        val out = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long, Long, Long)]
        eligible.foreach { case (ts, seq, x) =>
          if (ring.length >= win) {
            val past = ring.takeRight(win)
            val n = past.length.toLong
            val s = past.sum
            val q = past.map(v => v * v).sum
            val devN = n * x - s
            val isAnom = if (devN * devN > zz * (n * q - s * s)) 1L else 0L
            out += ((seq, uid, ts, x, isAnom))
          }
          ring = (ring :+ x).takeRight(win)
          lastTs = ts
          lastSeq = seq
        }
        state.update((ring, lastTs, lastSeq, rest))
        if (rest.nonEmpty) state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1L)
        out.iterator
      }
      .toDF("event_id", "user_id", "ts_us", "value_c", "is_anomaly")
    runToMemory(spark, scored, "append")
  }

  /** Out-of-order-tolerant streaming EWMA — the reordering-buffer
    * recipe ([[rateStreamReordering]]) applied to the third strict
    * per-series stream: state carries the span-deep value ring AND a
    * watermark-bounded buffer; only at-or-below-watermark points
    * smooth (in event-time order, so every point sees exactly its
    * batch trailing history), an event-time timeout flushes as the
    * watermark advances, late-beyond-allowance points drop, and the
    * oracle applies the same final-watermark cutoff. Completes the
    * OOO story across rate / anomaly / ewma.
    */
  def ewmaStreamReordering(
      spark: SparkSession,
      dir: String,
      span: Int = 16,
      filesPerTrigger: Option[Int] = None
  ): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, GroupState}
    val schema = Tables.eventsFileSchema(spark, dir)
    val reader = spark.readStream.schema(schema)
    filesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val stream = reader
      .parquet(s"$dir/events.parque[t]")
      .transform(Tables.normalizeEventsTs)
      .transform(Tables.requirePostEpochTs) // watermark-bound stream: see Tables scaladoc
      .withColumn("ts_t", timestamp_micros(expr("ts DIV 1000")))
      .withWatermark("ts_t", "30 minutes")
      .select(
        col("user_id").as[Long],
        expr("ts DIV 1000").as("ts_us").as[Long],
        col("event_id").as[Long],
        cents(col("value")).as("value_c").as[Long],
        col("ts_t").as[java.sql.Timestamp]
      )
      .as[(Long, Long, Long, Long, java.sql.Timestamp)]
    // state: (ring, lastTs, lastSeq, reordering buffer of (ts, seq, x))
    val smoothed = stream
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Array[Long], Long, Long, Array[(Long, Long, Long)]), (Long, Long, Long, Long, Long)](
        OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout
      ) { (uid: Long, rows: Iterator[(Long, Long, Long, Long, java.sql.Timestamp)],
           state: GroupState[(Array[Long], Long, Long, Array[(Long, Long, Long)])]) =>
        val wmUs = state.getCurrentWatermarkMs() * 1000L
        var (ring, lastTs, lastSeq, buf) =
          state.getOption.getOrElse((Array.empty[Long], Long.MinValue, Long.MinValue, Array.empty[(Long, Long, Long)]))
        val incoming = rows.map(r => (r._2, r._3, r._4)).filter { case (ts, seq, _) =>
          lastTs == Long.MinValue || ts > lastTs || (ts == lastTs && seq > lastSeq)
        }
        buf = (buf ++ incoming).sortBy(p => (p._1, p._2))
        val (eligible, rest) = buf.partition(_._1 <= wmUs)
        val out = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long, Long, Long)]
        eligible.foreach { case (ts, seq, x) =>
          val vals = (ring :+ x).takeRight(span)
          val s = vals.length
          var num = 0L
          var den = 0L
          var wgt = 1L << (span - s)
          vals.foreach { v => num += v * wgt; den += wgt; wgt <<= 1 }
          out += ((seq, uid, ts, x, num / den))
          ring = (ring :+ x).takeRight(span - 1)
          lastTs = ts
          lastSeq = seq
        }
        state.update((ring, lastTs, lastSeq, rest))
        if (rest.nonEmpty) state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1L)
        out.iterator
      }
      .toDF("event_id", "user_id", "ts_us", "value_c", "ewma_c")
    runToMemory(spark, smoothed, "append")
  }

  /** STREAM-STREAM interval join: purchases joined to the clicks that
    * preceded them within the attribution window — both sides are
    * unbounded streams, so this is the stateful two-stream join
    * Structured Streaming exists for. The time-interval condition on
    * the two watermarked event-time columns is what lets Spark DROP
    * join state once the watermark passes a row's window (state is
    * bounded by the window horizon, not stream length); an
    * equality-only condition would buffer both streams forever. Under
    * `Trigger.AvailableNow` replay the emitted pair set equals the
    * batch join — which is what the oracle checks.
    */
  def attributionJoin(
      spark: SparkSession,
      dir: String,
      windowUs: Long = 3600L * 1000000L,
      filesPerTrigger: Option[Int] = None
  ): DataFrame = {
    val schema = Tables.eventsFileSchema(spark, dir)
    def src = {
      val r = spark.readStream.schema(schema)
      filesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
      r.parquet(s"$dir/events.parque[t]")
      .transform(Tables.normalizeEventsTs)
      .transform(Tables.requirePostEpochTs) // watermark-bound stream: see Tables scaladoc
    }
    val purchases = src
      .filter(col("event_type") === "purchase")
      .select(
        col("user_id").as("p_user_id"),
        col("event_id").as("p_event_id"),
        timestamp_micros(expr("ts DIV 1000")).as("p_ts"),
        expr("ts DIV 1000").as("p_ts_us")
      )
      .withWatermark("p_ts", "1 hour")
    val clicks = src
      .filter(col("event_type") === "click")
      .select(
        col("user_id").as("c_user_id"),
        col("event_id").as("c_event_id"),
        timestamp_micros(expr("ts DIV 1000")).as("c_ts"),
        expr("ts DIV 1000").as("c_ts_us")
      )
      .withWatermark("c_ts", "1 hour")
    val windowSec = windowUs / 1000000L
    val joined = purchases
      .join(
        clicks,
        expr(
          s"p_user_id = c_user_id AND c_ts BETWEEN p_ts - INTERVAL $windowSec SECONDS AND p_ts"
        )
      )
      .select(col("p_event_id"), col("c_event_id"), col("p_ts_us"), col("c_ts_us"))
    runToMemory(spark, joined, "append")
  }

  /** Durable ingest path: readStream → normalize (epoch-micro
    * timestamps, fixed-point cents) → parquet sink with a checkpoint.
    * This is the reference's locked-file write path as a streaming
    * commit log: each micro-batch is an exactly-once atomic append
    * (sink + checkpoint commit together), and concurrent readers never
    * see partial data — no fcntl needed. Stateless, so append mode
    * needs no watermark and every row lands regardless of event time.
    */
  def ingestRawToParquet(spark: SparkSession, dir: String, outPath: String): Unit = {
    val schema = Tables.eventsFileSchema(spark, dir)
    val q = spark.readStream
      .schema(schema)
      .parquet(s"$dir/events.parque[t]")
      .transform(Tables.normalizeEventsTs)
      .select(
        col("event_id"),
        col("user_id"),
        expr("ts DIV 1000").as("ts_us"),
        col("event_type"),
        cents(col("value")).as("value_c")
      )
      .writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", s"$outPath/_checkpoint")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Streaming ingest INTO THE ENCODED STORE: each micro-batch is
    * block-encoded (delta + unit + min-ref + width plans) and appended
    * to the day-partitioned block layout — the reference's
    * from_pandas→file update loop (timebox.py:57-88) as a continuous
    * pipeline. A batch boundary can split a (series, day) into two
    * partial blocks; decode handles that (per-block cumulative
    * windows), and [[TimeboxStore.compact]] re-blocks an aged store.
    * The checkpoint makes replay exactly-once in normal operation;
    * foreachBatch output is at-least-once across crash recovery (the
    * standard custom-sink contract) — dedupe on (series, seq) if the
    * downstream needs it.
    */
  def ingestToStore(
      spark: SparkSession,
      dir: String,
      outPath: String,
      filesPerTrigger: Option[Int] = None
  ): Unit = {
    val schema = Tables.eventsFileSchema(spark, dir)
    val reader = spark.readStream.schema(schema)
    filesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val stream = reader
      .parquet(s"$dir/events.parque[t]")
      .transform(Tables.normalizeEventsTs)
      .select(
        col("user_id"),
        expr("ts DIV 1000").as("ts_us"),
        col("event_id"),
        cents(col("value")).as("value_c")
      )
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        TimeboxStore
          .encode(batch)
          .write
          .mode("append")
          .partitionBy("day_id")
          .parquet(outPath)
      }
      .option("checkpointLocation", s"$outPath/_checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** STREAMING DEDUP — the production ingest-dedup loop: each arriving
    * micro-batch of documents is (1) matched against the persisted
    * [[SignatureStore]] (exact via content hash, near via LSH bands),
    * then (2) appended to the store, so later batches dedupe against
    * everything that came before — corpus AND earlier stream batches —
    * without ever re-reading corpus text. foreachBatch is the right
    * sink shape: the match result is a per-batch side output while the
    * store append is the state mutation; the checkpoint makes the loop
    * exactly-once per batch in normal operation.
    *
    * Under a single-batch `AvailableNow` drain the emitted match set
    * equals the batch [[graft.operators.Dedup.incrementalDedup]] — the
    * oracle contract; StreamingSpec replays a two-file delta and
    * asserts a batch-2 document matches a batch-1 document (the
    * intra-stream append path no batch operator covers).
    */
  def dedupStream(
      spark: SparkSession,
      dir: String,
      splitId: Long = 400L,
      filesPerTrigger: Option[Int] = None
  ): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val store = TimeboxStore.scratchPath("graft_sigstream", dir)
    // RESUME-SAFE: an existing checkpoint means this is a restart after
    // a kill — the store already holds the corpus PLUS every signature
    // appended by completed batches, and rebuilding it would silently
    // erase those appends (later batches would stop matching earlier
    // ones). A fresh start CLONES the shared corpus-side template
    // (built at most once per process) instead of re-encoding it —
    // the stream's subject, the per-batch match+append, still runs
    // from scratch against the private clone it mutates.
    if (!new java.io.File(s"$store/_checkpoint").exists())
      TimeboxStore.fixtureCloneTo(SignatureStore.baseStoreTemplate(spark, dir, splitId), store): Unit
    val matchesPath = s"$store/matches"
    val schema = Tables.documents(spark, dir).schema
    val reader = spark.readStream.schema(schema)
    filesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val stream = reader
      .parquet(s"$dir/documents.parque[t]")
      .filter(col("doc_id") >= splitId)
      .select(col("doc_id"), col("text"))
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // fused match+append: one signature pass per micro-batch (the
        // separate matchDelta-then-append loop computed the batch's
        // normalize/collapse/shingle/minhash twice)
        SignatureStore
          .matchAppend(spark, store, batch)
          .write.mode("append").parquet(matchesPath)
      }
      .option("checkpointLocation", s"$store/_checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(matchesPath)
  }

  /** STREAMING cluster maintenance — [[dedupStream]]'s 24/7 shape for
    * the LABEL tier: every micro-batch appends its signatures AND
    * refreshes the persisted cluster labels incrementally
    * ([[SignatureStore.appendRelabel]] — CC runs on the delta-sized
    * contracted graph, never the corpus). After the drain the store's
    * labels equal the from-scratch components of everything ingested —
    * the oracle is the same full-corpus reachability dedup_clusters
    * uses. Same resume posture as dedupStream: an existing checkpoint
    * means the store (and its labels) already carry completed batches'
    * appends, so only a fresh start builds them.
    */
  def dedupStreamClusters(
      spark: SparkSession,
      dir: String,
      splitId: Long = 400L,
      filesPerTrigger: Option[Int] = None
  ): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val store = TimeboxStore.scratchPath("graft_sigstrcc", dir)
    // fresh start clones the shared corpus-side template (labels
    // included); the stream's subject — per-batch append + incremental
    // relabel — mutates the private clone (resume posture unchanged)
    if (!new java.io.File(s"$store/_checkpoint").exists())
      TimeboxStore.fixtureCloneTo(SignatureStore.baseStoreTemplate(spark, dir, splitId), store): Unit
    val schema = Tables.documents(spark, dir).schema
    val reader = spark.readStream.schema(schema)
    filesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val stream = reader
      .parquet(s"$dir/documents.parque[t]")
      .filter(col("doc_id") >= splitId)
      .select(col("doc_id"), col("text"))
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        SignatureStore.appendRelabel(spark, batch, store)
      }
      .option("checkpointLocation", s"$store/_checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    SignatureStore.readClusters(spark, store)
  }

  /** graph_copurchase_stream — STREAMING maintenance of the
    * co-purchase edge tier (the 24/7 face of graph_copurchase_tier,
    * the [[dedupStreamClusters]] recipe on the relational graph): new
    * orders arrive as micro-batches, each batch appends its
    * within-batch pairs through [[GraphTier.appendCoPurchase]] (the
    * delta self-join + tier anti-join — old orders never recompute),
    * and after the drain the tier equals the from-scratch self-join
    * over everything ingested — the SAME oracle as the batch tier
    * drill, which is the whole claim.
    *
    * PRECONDITION (fail-loud, like attributionStream's ordering): a
    * micro-batch carries COMPLETE orders — co-purchase pairs never
    * span orders, so per-batch pair generation is exact exactly when
    * no order straddles two batches (the transactional-CDC grain a
    * real feed ships). Enforced with a persisted order ledger: a batch
    * whose order keys intersect the ledger means an order arrived
    * split — the maintenance throws instead of silently dropping that
    * order's cross-batch pairs.
    *
    * Same resume posture as dedupStream: an existing checkpoint means
    * the tier + ledger already carry completed batches; only a fresh
    * start builds the corpus side.
    */
  def coPurchaseStream(
      spark: SparkSession,
      dir: String,
      filesPerTrigger: Option[Int] = None,
      dirRows: Long = SignatureStore.DefaultDirRows
  ): DataFrame = {
    import graft.sources.{GraphTier, Tables, TimeboxStore}
    val li = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_partkey"))
    val mm = li.agg(min(col("l_orderkey")), max(col("l_orderkey"))).head()
    val split = (mm.getLong(0) + mm.getLong(1) + 1L) / 2L
    val store = TimeboxStore.scratchPath("graft_copstream", dir)
    // fresh start clones the shared bootstrap (tier + order ledger —
    // built once per process); the stream's subject, the per-batch
    // straddle probe + tier append + ledger write, mutates the clone
    if (!new java.io.File(s"$store/_checkpoint").exists()) {
      val tmpl = TimeboxStore.sharedFixture("graft_copstream_tmpl", dir, s"r$dirRows") { p =>
        GraphTier.writeCoPurchase(li.filter(col("l_orderkey") < split), p, dirRows)
        writeOrderLedger(spark, p, li.filter(col("l_orderkey") < split), batchId = -1L, bootstrap = true)
      }
      TimeboxStore.fixtureCloneTo(tmpl, store): Unit
    }
    val reader = spark.readStream.schema(li.schema)
    filesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val stream = reader
      .parquet(s"$dir/lineitem.parque[t]")
      .filter(col("l_orderkey") >= split)
      .select(col("l_orderkey"), col("l_partkey"))
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        coPurchaseBatch(spark, store, batch, batchId)
      }
      .option("checkpointLocation", s"$store/_checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    GraphTier.readCoPurchase(spark, store)
  }

  /** One co-purchase micro-batch: straddle guard, tier append, ledger
    * write — REPLAY-IDEMPOTENT end to end. foreachBatch is
    * at-least-once: a crash after the ledger write but before the
    * checkpoint commit replays this batchId, so (a) the straddle probe
    * EXCLUDES rows this batchId itself wrote (they are the replay, not
    * a split order), (b) the edge append is an anti-join no-op on
    * already-landed pairs, and (c) the ledger write dynamically
    * overwrites this batchId's own partitions instead of duplicating
    * them. The probe is pruned to the batch's order-key prefixes (the
    * tier's leveled layout) — O(batch) ledger bytes per batch, not
    * O(all orders ever ingested).
    */
  private[graft] def coPurchaseBatch(
      spark: SparkSession,
      store: String,
      batch: DataFrame,
      batchId: Long
  ): Unit = {
    import graft.sources.GraphTier
    val orders = batch.select(col("l_orderkey")).distinct().localCheckpoint()
    val lay = SignatureStore.readLayoutInfo(spark, store)
    val pl = if (lay.prune) lay.l else 0
    val leveled = SignatureStore
      .prunedScan(
        spark, store, "orders", pl, "op",
        SignatureStore.prefixesOf(orders, SignatureStore.idPrefix(col("l_orderkey"), pl))
      )
      .select(col("l_orderkey"), col("batch_id"))
    val l0 = ledgerL0Dirs(spark, store)
    val ledger =
      if (l0.isEmpty) leveled
      else leveled.unionByName(spark.read.parquet(l0: _*).select(col("l_orderkey"), col("batch_id")))
    val straddlers = orders
      .join(
        ledger.filter(col("batch_id") =!= batchId).select(col("l_orderkey")),
        Seq("l_orderkey"),
        "left_semi"
      )
      .count()
    if (straddlers > 0)
      throw new IllegalStateException(
        s"coPurchaseStream: $straddlers order(s) in this batch were already ingested — an " +
          "order straddled two micro-batches, whose cross-batch pairs would be silently " +
          "lost; the source must deliver complete orders per batch"
      )
    GraphTier.appendCoPurchase(spark, batch, store)
    writeOrderLedger(spark, store, batch, batchId, bootstrap = false)
  }

  /** The co-purchase stream's order ledger write — the edge tier's L0
    * discipline: the bootstrap corpus lands prefix-partitioned (the
    * tier's `_layout` level, so the straddle probe prunes at
    * file-listing time), and each micro-batch lands as ONE flat run
    * under a batchId-named dir — a replayed batchId OVERWRITES its own
    * run instead of duplicating it, and no per-batch write ever fans
    * out across the prefix dirs. Runs fold into the leveled table once
    * they pass the dir-size target; `batch_id` rides along as a DATA
    * column so replay exclusion still works on folded rows. A crash
    * between the fold's append and its L0 delete leaves duplicate
    * ledger rows — harmless by construction: every ledger consumer is
    * a left-semi probe.
    */
  private[graft] def writeOrderLedger(
      spark: SparkSession,
      store: String,
      batch: DataFrame,
      batchId: Long,
      bootstrap: Boolean
  ): Unit = {
    val lay = SignatureStore.readLayoutInfo(spark, store)
    val orders = batch
      .select(col("l_orderkey")).distinct()
      .withColumn("batch_id", lit(batchId))
    if (bootstrap)
      SignatureStore.writeTable(
        orders, store, "orders", lay.l, "op",
        SignatureStore.idPrefix(col("l_orderkey"), lay.l)
      )
    else {
      orders.coalesce(1).write.mode("overwrite").parquet(s"$store/orders_l0/batch=$batchId")
      val l0 = ledgerL0Dirs(spark, store)
      if (l0.nonEmpty && spark.read.parquet(l0: _*).count() > lay.dirRows) {
        SignatureStore.appendTable(
          spark.read.parquet(l0: _*).select(col("l_orderkey"), col("batch_id")),
          store, "orders", lay.l, "op",
          SignatureStore.idPrefix(col("l_orderkey"), lay.l)
        )
        val fs = new org.apache.hadoop.fs.Path(store)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(s"$store/orders_l0"), true): Unit
      }
    }
  }

  /** The ledger's L0 run dirs (one per micro-batch since the last fold). */
  private def ledgerL0Dirs(spark: SparkSession, store: String): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(s"$store/orders_l0")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root)
      .filter(d => d.isDirectory && d.getPath.getName.startsWith("batch="))
      .map(_.getPath.toString)
      .toIndexedSeq
  }

  /** STREAMING INDEX MAINTENANCE — the [[dedupStreamClusters]] recipe
    * applied to the ANN index: NEW vectors arrive as a stream, and
    * every micro-batch is encoded against the STORED IVF-PQ model
    * (nearest existing cell + existing residual codebook — two tiny
    * reads are the whole model) and appended into the cell-partitioned
    * codes layout. Because the encode is row-local given the model,
    * ANY batching of the same vectors appends the same codes — after
    * the drain, searching the maintained index is byte-identical to
    * the one-shot batch append (ann_index_append) AND to a full
    * rebuild, which is the shared oracle. At 100 TB this is the 24/7
    * shape: the index absorbs a vector feed continuously with
    * streaming-sized encode jobs; retrains happen only when drift
    * monitoring (emb_norm_stats) says so. Same resume posture as
    * dedupStream: an existing checkpoint means completed batches'
    * codes are already in the store, so only a fresh start builds the
    * base.
    */
  def annStreamIndex(
      spark: SparkSession,
      dir: String,
      splitId: Long = 400L,
      filesPerTrigger: Option[Int] = None
  ): DataFrame = {
    import graft.operators.Similarity
    val store = TimeboxStore.scratchPath("graft_vecidx_stream", dir)
    // fresh start clones the shared old-half base (the model + old
    // codes — built at ingest at scale); the stream's subject, the
    // per-batch encode+append, mutates the private clone
    if (!new java.io.File(s"$store/_checkpoint").exists())
      TimeboxStore.fixtureCloneTo(Similarity.appendBaseTemplate(spark, dir, splitId), store): Unit
    val schema = Tables.embeddings(spark, dir).schema
    val reader = spark.readStream.schema(schema)
    filesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val stream = reader
      .parquet(s"$dir/embeddings.parque[t]")
      .filter(col("vec_id") >= splitId)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Similarity.appendToStoredIndex(spark, batch, store)
      }
      .option("checkpointLocation", s"$store/_checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    Similarity.searchStoredIndex(spark, dir, store)
  }

  /** STREAMING ANN — probe vectors arrive as a stream and range-search
    * a STATIC bucketed corpus (the online-serving shape: a 100 TB
    * corpus indexed once, queries joined against it as they arrive).
    * Stateless stream-static inner join on the LSH bucket key — no
    * watermark, no state store: each micro-batch of probes touches its
    * buckets and streams results out. Under an AvailableNow drain the
    * emitted set equals the batch [[graft.operators.Similarity.annRangeSearch]]
    * — the shared oracle.
    */
  def annStreamSearch(
      spark: SparkSession,
      dir: String,
      nPlanes: Int = 4,
      nProbes: Int = 5,
      thresholdMicro: Long = 150000L
  ): DataFrame = {
    import graft.operators.Similarity
    import graft.functions.VectorFunctions._
    val corpus = Similarity
      .quantized(spark, dir)
      .withColumn("bucket", Similarity.bucketExpr(nPlanes))
    val schema = Tables.embeddings(spark, dir).schema
    val probes = spark.readStream
      .schema(schema)
      .parquet(s"$dir/embeddings.parque[t]")
      .filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), quantizeMicro(col("embedding")).as("q"))
      .withColumn("pn2", norm2Q(col("q")))
      .withColumn("bucket", Similarity.bucketExpr(nPlanes))
      .select(col("probe_id"), col("q").as("pq"), col("pn2"), col("bucket"))
    val cos = cosineQ(dotQ(col("pq"), col("q")), col("pn2"), col("n2"))
    val joined = probes
      .join(corpus, Seq("bucket"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(
        col("probe_id"),
        col("vec_id").as("neighbor_id"),
        col("bucket"),
        round(cos * lit(1000000)).cast("long").as("cos_micro")
      )
      .filter(col("cos_micro") >= thresholdMicro)
    runToMemory(spark, joined, "append")
  }

  /** Streaming FUNNEL — the batch view→click→purchase progression
    * (TimeSeries.funnel) as a 24/7 per-user state machine. State is
    * three monotone slots (first view; first click strictly after
    * it; first purchase strictly after that) — each sets at most
    * once, so state is O(1) per user forever and the stream's answer
    * is continuous across micro-batch boundaries. A row is emitted on
    * a user's FIRST event (so zero-step users surface, as in batch)
    * and on every slot advance; the final funnel per user is the
    * max-steps emission — the batch funnel oracle, reproduced on
    * replay. Same strict in-order source contract as the other
    * per-series stateful streams (enforced loudly); the reordering-
    * buffer recipe (rateStreamReordering) lifts it when needed.
    */
  def funnelStream(
      spark: SparkSession,
      dir: String,
      filesPerTrigger: Option[Int] = None
  ): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val schema = Tables.eventsFileSchema(spark, dir)
    val reader = spark.readStream.schema(schema)
    filesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val stream = reader
      .parquet(s"$dir/events.parque[t]")
      .transform(Tables.normalizeEventsTs)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(
        col("user_id").as[Long],
        expr("ts DIV 1000").as("ts_us").as[Long],
        col("event_id").as[Long],
        col("event_type").as[String]
      )
      .as[(Long, Long, Long, String)]
    // state: (view_us, click_us, purchase_us, lastTs, lastSeq).
    // Unset = Long.MinValue (no real timestamp), NOT -1: pre-epoch
    // event times are legitimate negative longs, and a `>= 0` slot
    // test would misread every one of them as "unset". The published
    // rows keep the batch oracle's -1 convention via pub() at the
    // emit edge only.
    val Unset = Long.MinValue
    val advanced = stream
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long, Long, Long), (Long, Long, Long, Long, Long)](
        OutputMode.Append,
        GroupStateTimeout.NoTimeout // three longs per user, set-once
      ) { (uid: Long, rows: Iterator[(Long, Long, Long, String)], state: GroupState[(Long, Long, Long, Long, Long)]) =>
        val pts = rows.toArray.sortBy(r => (r._2, r._3))
        var (view, click, purchase, lastTs, lastSeq) =
          state.getOption.getOrElse((Unset, Unset, Unset, Long.MinValue, Long.MinValue))
        val firstEver = state.getOption.isEmpty
        pts.headOption.foreach { case (_, ts, eid, _) =>
          if (state.getOption.isDefined && (ts < lastTs || (ts == lastTs && eid < lastSeq)))
            throw new IllegalStateException(
              s"funnelStream: out-of-order arrival for user $uid — (ts=$ts, seq=$eid) after " +
                s"(ts=$lastTs, seq=$lastSeq); the source must deliver each user in event-time order"
            )
        }
        val out = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long, Long, Long)]
        def pub(x: Long) = if (x == Unset) -1L else x
        def steps = (if (view != Unset) 1L else 0L) + (if (click != Unset) 1L else 0L) + (if (purchase != Unset) 1L else 0L)
        pts.foreach { case (_, ts, eid, etype) =>
          val before = steps
          etype match {
            case "view" if view == Unset                                      => view = ts
            case "click" if view != Unset && view < ts && click == Unset      => click = ts
            case "purchase" if click != Unset && click < ts && purchase == Unset => purchase = ts
            case _                                                            => ()
          }
          if (steps != before) out += ((uid, pub(view), pub(click), pub(purchase), steps))
          lastTs = ts
          lastSeq = eid
        }
        if (firstEver && out.isEmpty && pts.nonEmpty) out += ((uid, pub(view), pub(click), pub(purchase), steps))
        state.update((view, click, purchase, lastTs, lastSeq))
        out.iterator
      }
      .toDF("user_id", "view_us", "click_us", "purchase_us", "steps_completed")
    runToMemory(spark, advanced, "append")
      .groupBy(col("user_id"))
      .agg(
        max_by(
          struct(col("view_us"), col("click_us"), col("purchase_us"), col("steps_completed")),
          col("steps_completed")
        ).as("f")
      )
      .select(
        col("user_id"),
        col("f.view_us").as("view_us"),
        col("f.click_us").as("click_us"),
        col("f.purchase_us").as("purchase_us"),
        col("f.steps_completed").as("steps_completed")
      )
  }

  /** Streaming GAP-FILL — the batch LOCF grid
    * (TimeSeries.gapfillLocf) maintained continuously: per-series
    * state is ONE (current hour, running last value) pair; when an
    * event closes an hour, the hours between it and the next
    * observation emit exactly once as carried-forward fill rows, and
    * the open hour re-emits on every in-hour update (its last update
    * wins at reconciliation, the same emit-and-reconcile shape
    * sessionizeStream uses for its open session). State is O(1) per
    * series forever; emitted volume is the grid, shuffled volume at
    * reconciliation is the grid too — never more. Same strict
    * in-order source contract as the other per-series streams
    * (enforced loudly); replay == the batch gapfill oracle exactly.
    */
  def gapfillStream(
      spark: SparkSession,
      dir: String,
      filesPerTrigger: Option[Int] = None
  ): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val hourUs = 3600000000L
    val schema = Tables.eventsFileSchema(spark, dir)
    val reader = spark.readStream.schema(schema)
    filesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val stream = reader
      .parquet(s"$dir/events.parque[t]")
      .transform(Tables.normalizeEventsTs)
      .select(
        col("user_id").as[Long],
        expr("ts DIV 1000").as("ts_us").as[Long],
        col("event_id").as[Long],
        cents(col("value")).as("value_c").as[Long]
      )
      .as[(Long, Long, Long, Long)]
    // state: (curHour, curValue, lastTs, lastSeq)
    val grid = stream
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long, Long), (Long, Long, Long, Long, Long)](
        OutputMode.Append,
        GroupStateTimeout.NoTimeout // one (hour, value) pair per series
      ) { (uid: Long, rows: Iterator[(Long, Long, Long, Long)], state: GroupState[(Long, Long, Long, Long)]) =>
        val pts = rows.toArray.sortBy(r => (r._2, r._3))
        var (curHour, curValue, lastTs, lastSeq) =
          state.getOption.getOrElse((Long.MinValue, 0L, Long.MinValue, Long.MinValue))
        pts.headOption.foreach { case (_, ts, eid, _) =>
          if (ts < lastTs || (ts == lastTs && eid < lastSeq))
            throw new IllegalStateException(
              s"gapfillStream: out-of-order arrival for series $uid — (ts=$ts, seq=$eid) after " +
                s"(ts=$lastTs, seq=$lastSeq); the source must deliver each series in event-time order"
            )
        }
        val out = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long, Long, Long)]
        pts.foreach { case (_, ts, eid, v) =>
          val h = ts / hourUs
          if (curHour == Long.MinValue) {
            curHour = h; curValue = v
            out += ((uid, h, v, 1L, eid))
          } else if (h == curHour) {
            curValue = v
            out += ((uid, h, v, 1L, eid)) // open-hour update; last wins
          } else {
            var f = curHour + 1
            while (f < h) { out += ((uid, f, curValue, 0L, Long.MinValue)); f += 1 }
            curHour = h; curValue = v
            out += ((uid, h, v, 1L, eid))
          }
          lastTs = ts
          lastSeq = eid
        }
        state.update((curHour, curValue, lastTs, lastSeq))
        out.iterator
      }
      .toDF("user_id", "hour_id", "value_c", "is_observed", "upd_seq")
    // reconcile the append log: the open hour's LAST update wins
    runToMemory(spark, grid, "append")
      .groupBy(col("user_id"), col("hour_id"))
      .agg(
        max_by(struct(col("value_c"), col("is_observed")), col("upd_seq")).as("g")
      )
      .select(col("user_id"), col("hour_id"), col("g.value_c").as("value_c"), col("g.is_observed").as("is_observed"))
  }

  /** STREAMING interval join — ts_range_join's 24/7 face: events
    * arrive as a stream and range-join a STATIC incident-window table
    * through the same bucketed equi-join (window-length time
    * quantization, ≤2 exploded buckets per window, residual range
    * filter). The stream-static inner join is STATELESS — window
    * membership is decided per arriving row, so there is no state
    * store and no watermark, the online-serving shape. Matches drain
    * append-mode; the per-window aggregate runs on the drained
    * matches (the batch tail), so the drained result equals batch
    * ts_range_join — the shared oracle.
    */
  def rangeJoinStream(
      spark: SparkSession,
      dir: String,
      windowUs: Long = 600L * 1000000L,
      minCents: Long = 900L,
      filesPerTrigger: Option[Int] = None
  ): DataFrame = {
    import graft.operators.TimeSeries
    val windows = TimeSeries
      .eventsUs(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts_us"), col("event_type"), cents(col("value")).as("value_c"))
      .filter(col("event_type") === "error" && col("value_c") >= minCents)
      .select(col("event_id").as("window_id"), col("user_id").as("w_user"), col("ts_us").as("start_us"))
      .withColumn(
        "w_bucket",
        explode(expr(s"sequence(start_us DIV ${windowUs}L, (start_us + ${windowUs}L - 1) DIV ${windowUs}L)"))
      )
    val schema = Tables.eventsFileSchema(spark, dir)
    val reader = spark.readStream.schema(schema)
    filesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val stream = reader
      .parquet(s"$dir/events.parque[t]")
      .transform(Tables.normalizeEventsTs)
      .select(
        col("user_id"),
        expr("ts DIV 1000").as("ts_us"),
        col("event_type"),
        cents(col("value")).as("value_c")
      )
      .withColumn("bucket", expr(s"ts_us DIV ${windowUs}L"))
    val matches = stream
      .join(
        windows,
        col("user_id") === col("w_user") && col("bucket") === col("w_bucket") &&
          col("ts_us") >= col("start_us") && col("ts_us") < col("start_us") + lit(windowUs)
      )
      .select(col("window_id"), col("w_user").as("w_uid"), col("start_us"), col("event_type"), col("value_c"))
    runToMemory(spark, matches, "append")
      .groupBy(col("window_id"), col("w_uid").as("user_id"), col("start_us"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value_c")).as("sum_value_c"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_error")
      )
  }

  /** rel_scd2_stream — SLOWLY-CHANGING-DIMENSION TYPE-2 MAINTENANCE as
    * streaming state (the warehouse-streaming shape: the dimension
    * stays current 24/7 instead of being rebuilt per batch). Per
    * entity the state is exactly ONE tuple — the OPEN dimension
    * version (seg, state, valid_from, n) plus the last-applied (ts,
    * event_id) coordinates — which is the state a production SCD2
    * table keeps anyway, so memory is bounded by live entities by
    * construction (no watermark needed for boundedness). A state
    * change closes the open version (final emit, valid_to = the new
    * version's valid_from) and opens the next; each batch also emits
    * the open version's snapshot. The returned table resolves the
    * append log exactly: per (entity, seg) keep the max-n extent and
    * the max valid_to (the close, if one happened) — a version's seg
    * and valid_from never change, so this is exact for any batch
    * split of an in-order replay, and the result equals the batch
    * [[graft.operators.Relational.scd2]] (SHARED oracle).
    *
    * Same cross-batch ordering contract as anomalyStream: state
    * carries the last applied coordinates and the query FAILS LOUDLY
    * on a cross-batch regression instead of silently folding
    * out-of-order changes into the wrong version.
    */
  def scd2Stream(
      spark: SparkSession,
      dir: String,
      filesPerTrigger: Option[Int] = None
  ): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

    val schema = Tables.eventsFileSchema(spark, dir)
    val reader = spark.readStream.schema(schema)
    filesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val stream = reader
      .parquet(s"$dir/events.parque[t]")
      .transform(Tables.normalizeEventsTs)
      .select(
        col("user_id").as[Long],
        expr("ts DIV 1000").as("ts_us").as[Long],
        col("event_id").as[Long],
        col("event_type").as[String]
      )
      .as[(Long, Long, Long, String)]

    // state: (seg, stateStr, validFrom, n, lastTs, lastEid);
    // out: (user, seg, state, valid_from, valid_to, n, is_current).
    // Spelled as literal tuple types: encoder derivation does not see
    // through type aliases.
    val versions = stream
      .groupByKey(_._1)
      .flatMapGroupsWithState[
        (Long, String, Long, Long, Long, Long),
        (Long, Long, String, Long, Long, Long, Long)
      ](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (
            uid: Long,
            rows: Iterator[(Long, Long, Long, String)],
            st: GroupState[(Long, String, Long, Long, Long, Long)]
        ) =>
          val sorted = rows.toArray.sortBy(r => (r._2, r._3))
          val out =
            scala.collection.mutable.ListBuffer.empty[(Long, Long, String, Long, Long, Long, Long)]
          var cur: (Long, String, Long, Long, Long, Long) = st.getOption.orNull
          sorted.foreach { case (_, ts, eid, s) =>
            cur match {
              case null => cur = (1L, s, ts, 1L, ts, eid)
              case (seg, cs, from, n, lts, leid) =>
                if (ts < lts || (ts == lts && eid <= leid))
                  throw new IllegalStateException(
                    s"scd2Stream: series $uid regressed across batches (($ts,$eid) after ($lts,$leid)) — " +
                      "the source must deliver each entity in event-time order"
                  )
                if (s != cs) {
                  out += ((uid, seg, cs, from, ts, n, 0L)) // close the open version
                  cur = (seg + 1, s, ts, 1L, ts, eid)
                } else cur = (seg, cs, from, n + 1, ts, eid)
            }
          }
          if (cur != null) {
            st.update(cur)
            out += ((uid, cur._1, cur._2, cur._3, -1L, cur._4, 1L)) // open-version snapshot
          }
          out.iterator
      }
      .toDF("user_id", "seg", "state", "valid_from_us", "valid_to_us", "n_events", "is_current")

    // resolve the append log: per (entity, seg) the close wins over
    // snapshots (max valid_to) and the last snapshot's n is the max
    runToMemory(spark, versions, "append")
      .groupBy(col("user_id"), col("seg"))
      .agg(
        min(col("state")).as("state"),
        min(col("valid_from_us")).as("valid_from_us"),
        max(col("valid_to_us")).as("valid_to_us"),
        max(col("n_events")).as("n_events")
      )
      .withColumn("is_current", when(col("valid_to_us") === -1L, 1L).otherwise(0L))
      .select(
        col("user_id"),
        col("seg"),
        col("state"),
        col("valid_from_us"),
        col("valid_to_us"),
        col("n_events"),
        col("is_current")
      )
  }

  /** approx_hll_stream — the DISTINCT-COUNT SKETCH as streaming state:
    * the portable HLL's register table (event_type, bucket, max rho)
    * maintained by a streaming aggregation. max() is the whole merge
    * rule, so state is exactly 64 longs per group key at ANY stream
    * length — the sketch never grows, never needs a watermark to stay
    * bounded, and the drained registers are byte-identical to the
    * batch sketch by the register-merge algebra (shared oracle with
    * `approx_hll_users`). The exact side of the accuracy ledger is the
    * batch scan — the part a sketch exists to avoid, present here only
    * because the query REPORTS its own error.
    */
  /** Streaming KMV sketch: the k-minimum-values distinct sketch as
    * streaming state — per event type exactly ≤k longs at ANY stream
    * length (1 KiB at k=128). Merging a micro-batch is the sketch's
    * own merge rule — k smallest of (state ∪ batch hashes) — and
    * min-k is arrival-order-insensitive, so the drained sketch equals
    * the batch sketch by algebra, not by luck. Each batch emits the
    * current (version, size, θ) row per type; the final row per type
    * (max version) yields the estimate, published next to the exact
    * count as the accuracy ledger — the same θ = h_k estimator and
    * hash family as approx_kmv_setops, whose per-type tier is the
    * shared oracle.
    */
  def approxKmvStream(
      spark: SparkSession,
      dir: String,
      k: Int = 128,
      filesPerTrigger: Option[Int] = None
  ): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, GroupState}
    val schema = Tables.eventsFileSchema(spark, dir)
    val reader = spark.readStream.schema(schema)
    filesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val stream = reader
      .parquet(s"$dir/events.parque[t]")
      .transform(Tables.normalizeEventsTs)
      .select(
        col("event_type").as[String],
        expr("CAST(conv(substring(md5(concat('kmv:', CAST(user_id AS STRING))), 1, 12), 16, 10) AS BIGINT)")
          .as("h")
          .as[Long]
      )
      .as[(String, Long)]
    val perBatch = stream
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Array[Long], Long), (String, Long, Long, Long)](
        OutputMode.Append,
        GroupStateTimeout.NoTimeout // state is <= k longs by construction
      ) { (et: String, rows: Iterator[(String, Long)], state: GroupState[(Array[Long], Long)]) =>
        val (prev, ver) = state.getOption.getOrElse((Array.empty[Long], 0L))
        val merged = (prev ++ rows.map(_._2)).distinct.sorted.take(k)
        state.update((merged, ver + 1))
        Iterator((et, ver + 1, merged.length.toLong, if (merged.isEmpty) 0L else merged.last))
      }
      .toDF("event_type", "version", "n_sk", "h_k")
    val drained = runToMemory(spark, perBatch, "append")
      .groupBy(col("event_type"))
      .agg(max(struct(col("version"), col("n_sk"), col("h_k"))).as("s"))
      .select(col("event_type"), col("s.n_sk").as("n_sk"), col("s.h_k").as("h_k"))
      .withColumn(
        "kmv_estimate",
        when(col("n_sk") < k, col("n_sk")).otherwise(expr(s"(${(k - 1).toLong}L * 281474976710656L) DIV h_k"))
      )
    val exact = Tables
      .events(spark, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_exact"))
    drained
      .join(exact, Seq("event_type"))
      .withColumn("err_bp", expr("abs(kmv_estimate - n_exact) * 10000 DIV n_exact"))
      .select(col("event_type"), col("n_exact"), col("kmv_estimate"), col("err_bp"))
  }

  /** text_vocab_stream — VOCABULARY FIRST-OCCURRENCE as STREAMING
    * STATE: the (source, token) → min(doc_id) table maintained by a
    * complete-mode streaming groupBy — min-merge is order-insensitive,
    * so the drained table equals the batch first-occurrence table by
    * ALGEBRA no matter how documents arrive. The state IS the
    * vocabulary table (its growth is Heaps-law growth, not a leak —
    * the same "state = the store" posture as mm_cas_stream), and the
    * Heaps curve itself is finished in batch on the drained table via
    * the finisher shared with text_vocab_growth (whose oracle verifies
    * this stream).
    */
  def vocabStream(
      spark: SparkSession,
      dir: String,
      filesPerTrigger: Option[Int] = None
  ): DataFrame = {
    import graft.operators.{Dedup, TextAnalysis}
    val schema = Tables.documents(spark, dir).schema
    val reader = spark.readStream.schema(schema)
    filesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val firstSeen = reader
      .parquet(s"$dir/documents.parque[t]")
      .select(
        col("source"),
        col("doc_id"),
        explode(array_distinct(split(Dedup.normText(col("text")), " "))).as("tok")
      )
      .filter(length(col("tok")) > 0)
      .groupBy(col("source"), col("tok"))
      .agg(min(col("doc_id")).as("doc_id"))
    TextAnalysis.growthCurve(spark, dir, runToMemory(spark, firstSeen, "complete"))
  }

  /** ts_seasonal_profile_stream — the SEASONAL BASELINE as STREAMING
    * STATE: the (event_type, day-of-week, hour-of-day) profile table
    * maintained by a streaming groupBy in complete mode. count/sum are
    * additive and min/max idempotent-commutative, so the drained
    * profile equals the batch one by ALGEBRA, and state is EXACTLY
    * 7·24·|types| rows at any stream length — this is the materialized
    * baseline ts_anomaly_seasonal joins against, kept LIVE instead of
    * rebuilt nightly (a detector that learns the new normal as it
    * streams). Shared oracle with ts_seasonal_profile.
    */
  def seasonalProfileStream(
      spark: SparkSession,
      dir: String,
      filesPerTrigger: Option[Int] = None
  ): DataFrame = {
    val schema = Tables.eventsFileSchema(spark, dir)
    val reader = spark.readStream.schema(schema)
    filesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val profile = reader
      .parquet(s"$dir/events.parque[t]")
      .transform(Tables.normalizeEventsTs)
      .select(
        col("event_type"),
        expr("ts DIV 1000").as("ts_us"),
        cents(col("value")).as("value_c")
      )
      .groupBy(
        col("event_type"),
        expr("(ts_us DIV 86400000000 + 4) % 7").as("day_of_week"),
        expr("(ts_us DIV 3600000000) % 24").as("hour_of_day")
      )
      .agg(
        count(lit(1)).as("n"),
        sum(col("value_c")).as("sum_c"),
        min(col("value_c")).as("min_c"),
        max(col("value_c")).as("max_c")
      )
    runToMemory(spark, profile, "complete")
  }

  /** mm_cas_stream — the CONTENT-ADDRESSED STORE's reference table as
    * STREAMING STATE: payloads chunk row-locally as they arrive
    * (Multimodal.chunksOf — the shared fixed-size chunker), and the
    * (chunk_sha, doc_id) reference table is a streaming groupBy whose
    * counts are additive across micro-batches — the state IS the CAS
    * ref table, which is exactly what an incremental-backup/dedup
    * ingest persists (its growth is the store's own growth, not a
    * leak). Distinct-doc counting is NOT a streaming-legal aggregate,
    * so the dedup report (cross-doc chunks, occurrence counts,
    * canonical holder) is FINISHED in batch on the drained ref table —
    * the same drain-then-finish split as text_heavy_hitters_stream —
    * making the published rows equal mm_chunk_dedup by algebra
    * (shared oracle).
    */
  def casStream(
      spark: SparkSession,
      dir: String,
      chunkBytes: Int = 256,
      filesPerTrigger: Option[Int] = None
  ): DataFrame = {
    import graft.operators.Multimodal
    val schema = Tables.documents(spark, dir).schema
    val reader = spark.readStream.schema(schema)
    filesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val refs = Multimodal
      .chunksOf(reader.parquet(s"$dir/documents.parque[t]"), chunkBytes)
      .groupBy(col("chunk_sha"), col("doc_id"))
      .agg(count(lit(1)).as("n_occ"))
    runToMemory(spark, refs, "complete")
      .groupBy(col("chunk_sha"))
      .agg(
        countDistinct(col("doc_id")).as("n_docs"),
        sum(col("n_occ")).as("n_occurrences"),
        min(col("doc_id")).as("canonical_doc")
      )
      .filter(col("n_docs") > 1)
  }

  /** ts_ohlc_stream — OHLC candles as STREAMING STATE: per
    * (user, day), open/close maintained as min/max over the
    * (ts, event_id, value) struct — struct-min/max merge is
    * associative AND commutative, so the drained candles equal the
    * batch row-number formulation by ALGEBRA in any arrival order
    * (the reason a live candle feed never needs to re-sort history).
    * State is one row per open (user, day) key — bounded by the data's
    * own key space, the same argument as the windowed ingest. Shares
    * ts_ohlc_1d's oracle: first-by-(ts,id) ≡ min-struct.
    */
  def ohlcStream(
      spark: SparkSession,
      dir: String,
      filesPerTrigger: Option[Int] = None
  ): DataFrame = {
    val schema = Tables.eventsFileSchema(spark, dir)
    val reader = spark.readStream.schema(schema)
    filesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val candles = reader
      .parquet(s"$dir/events.parque[t]")
      .transform(Tables.normalizeEventsTs)
      .select(
        col("user_id"),
        expr("ts DIV 1000").as("ts_us"),
        col("event_id"),
        cents(col("value")).as("value_c")
      )
      .withColumn("day_id", expr("ts_us DIV 86400000000"))
      .groupBy(col("user_id"), col("day_id"))
      .agg(
        min(struct(col("ts_us"), col("event_id"), col("value_c"))).as("o"),
        max(col("value_c")).as("high_c"),
        min(col("value_c")).as("low_c"),
        max(struct(col("ts_us"), col("event_id"), col("value_c"))).as("c"),
        count(lit(1)).as("n")
      )
      .select(
        col("user_id"),
        col("day_id"),
        col("o.value_c").as("open_c"),
        col("high_c"),
        col("low_c"),
        col("c.value_c").as("close_c"),
        col("n")
      )
    runToMemory(spark, candles, "complete")
  }

  /** text_heavy_hitters_stream — MISRA-GRIES as streaming state: the
    * trending-terms monitor a 24/7 ingest keeps at O(shards·cap)
    * memory forever. Tokens hash-shard (each word lives wholly in one
    * shard, so the MG floor bound applies per shard), each shard's
    * state is one decrement-all counter summary of ≤cap entries,
    * resumed across micro-batches (continuing an MG summary IS
    * running MG on the concatenated stream). MG's guarantee is
    * ORDER-INDEPENDENT — any key with frequency > N_shard/cap
    * survives every arrival order — so although the candidate SET may
    * vary with shuffle order, the drained candidates always contain
    * the true heavy hitters, and the final exact recount over them
    * (the same candidates→recount→top-k contract as the batch
    * text_heavy_hitters) makes the published answer deterministic and
    * equal to the batch answer — which is why they share the oracle.
    */
  def heavyHittersStream(
      spark: SparkSession,
      dir: String,
      k: Int = 5,
      cap: Int = 16,
      shards: Int = 8,
      filesPerTrigger: Option[Int] = None
  ): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, GroupState}
    import graft.operators.{Dedup, TextAnalysis}
    val schema = Tables.documents(spark, dir).schema
    val reader = spark.readStream.schema(schema)
    filesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val stream = reader.parquet(s"$dir/documents.parque[t]")
    // the drill's token stream: corpus tokens + the amplified tail —
    // the streaming replay of TextAnalysis.heavyStream
    val base = stream
      .select(explode(split(Dedup.normText(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0)
    val heavy = stream
      .filter(col("doc_id") % 4 === 0)
      .select(explode(expr("transform(sequence(1, 120), i -> concat('hh_', CAST(doc_id % 5 AS STRING)))")).as("w"))
    val toks = base
      .unionByName(heavy)
      .select(pmod(hash(col("w")), lit(shards)).as("shard"), col("w"))
      .as[(Int, String)]
    val perBatch = toks
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Array[(String, Long)], Long), (Int, Long, String)](
        OutputMode.Append,
        GroupStateTimeout.NoTimeout // state is <= cap keyed counters by construction
      ) { (shard: Int, rows: Iterator[(Int, String)], state: GroupState[(Array[(String, Long)], Long)]) =>
        val (prev, ver) = state.getOption.getOrElse((Array.empty[(String, Long)], 0L))
        val m = scala.collection.mutable.HashMap.from[String, Long](prev)
        var delta = 0L
        rows.foreach { case (_, w) =>
          m.get(w) match {
            case Some(c) => m.update(w, c + 1)
            case None =>
              if (m.size < cap) m.update(w, delta + 1)
              else {
                // decrement-all: raise the floor, lazily evict sunk keys
                delta += 1
                m.filterInPlace((_, c) => c > delta)
                if (m.size < cap) m.update(w, delta + 1)
              }
          }
        }
        val eff = m.iterator.map { case (w, c) => (w, c - delta) }.toArray
        state.update((eff, ver + 1))
        eff.iterator.map { case (w, _) => (shard, ver + 1, w) }
      }
      .toDF("shard", "ver", "w")
    // drain; candidates = the FINAL summary per shard (max-struct per
    // shard — no self-join of the drained sink)
    val drained = runToMemory(spark, perBatch, "append")
    val cands = drained
      .groupBy(col("shard"), col("ver"))
      .agg(collect_set(col("w")).as("ws"))
      .groupBy(col("shard"))
      .agg(max(struct(col("ver"), col("ws"))).as("s"))
      .select(explode(col("s.ws")).as("w"))
      .distinct()
    // exact recount over the candidate superset — the batch contract
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("n").desc, col("w").asc)
    TextAnalysis
      .heavyStream(spark, dir)
      .join(broadcast(cands), Seq("w"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc)
      .limit(k)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .select(col("rnk"), col("w"), col("n"))
  }

  /** sample_cap_stream — the DISTRIBUTED RESERVOIR as streaming
    * state: per source, the k smallest (md5(doc_id), doc_id) pairs —
    * sample_cap_per_source's exact selection rule — maintained by a
    * min-k merge per micro-batch. Min-k is arrival-order- and
    * partition-insensitive, so the drained sample IS the batch cap by
    * algebra (shared oracle), and state is exactly ≤k pairs + one
    * counter per source at ANY stream length — the uniform-without-
    * replacement sample a 24/7 ingest keeps per shard without ever
    * re-scanning history (a classic reservoir is order-DEPENDENT and
    * unmergeable; hash-order bottom-k is the distributed fix).
    * Each batch emits a versioned summary row; the final row per
    * source (max version) carries n_total / n_kept / kept_id_sum.
    */
  def sampleCapStream(
      spark: SparkSession,
      dir: String,
      k: Int = 100,
      filesPerTrigger: Option[Int] = None
  ): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, GroupState}
    val schema = Tables.documents(spark, dir).schema
    val reader = spark.readStream.schema(schema)
    filesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val stream = reader
      .parquet(s"$dir/documents.parque[t]")
      .select(
        col("source").as[String],
        md5(concat(lit("cap:"), col("doc_id").cast("string"))).as("hkey").as[String],
        col("doc_id").as[Long]
      )
      .as[(String, String, Long)]
    val perBatch = stream
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Array[(String, Long)], Long, Long), (String, Long, Long, Long, Long)](
        OutputMode.Append,
        GroupStateTimeout.NoTimeout // state is <= k pairs + a counter by construction
      ) { (src: String, rows: Iterator[(String, String, Long)], state: GroupState[(Array[(String, Long)], Long, Long)]) =>
        val (prev, nTotal, ver) = state.getOption.getOrElse((Array.empty[(String, Long)], 0L, 0L))
        val batch = rows.map(r => (r._2, r._3)).toArray
        // min-k of (state ∪ batch) under (hkey, doc_id) order — the
        // same ORDER BY the batch rank window uses
        val merged = (prev ++ batch).sorted.take(k)
        state.update((merged, nTotal + batch.length, ver + 1))
        Iterator((src, ver + 1, nTotal + batch.length, merged.length.toLong, merged.map(_._2).sum))
      }
      .toDF("source", "version", "n_total", "n_kept", "kept_id_sum")
    runToMemory(spark, perBatch, "append")
      .groupBy(col("source"))
      .agg(max(struct(col("version"), col("n_total"), col("n_kept"), col("kept_id_sum"))).as("s"))
      .select(
        col("source"),
        col("s.n_total").as("n_total"),
        col("s.n_kept").as("n_kept"),
        col("s.kept_id_sum").as("kept_id_sum")
      )
  }

  /** approx_cms_stream — the COUNT-MIN SKETCH as streaming state: the
    * D×W counter table is a streaming groupBy in complete mode, so
    * state is exactly D·W = 1k rows at ANY stream length — the
    * bounded-sketch property that makes CMS the per-shard frequency
    * monitor a 24/7 ingest can afford. CMS is additive (counters sum
    * across micro-batches), so the drained counter table equals the
    * batch sketch by ALGEBRA, and the probe tier — top-k exact tokens,
    * estimate = min over D cells — is shared code with approx_cms,
    * which is also why the batch oracle verifies this stream.
    */
  def approxCmsStream(
      spark: SparkSession,
      dir: String,
      width: Int = 256,
      depth: Int = 4,
      k: Int = 20,
      filesPerTrigger: Option[Int] = None
  ): DataFrame = {
    import graft.operators.{Dedup, TextAnalysis}
    val schema = Tables.documents(spark, dir).schema
    val reader = spark.readStream.schema(schema)
    filesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val stream = reader
      .parquet(s"$dir/documents.parque[t]")
    val cells = stream
      .select(explode(split(Dedup.normText(col("text")), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .select(col("tok"), explode(expr(s"sequence(0, ${depth - 1})")).as("r"))
      .withColumn("bucket", TextAnalysis.cmsBucketExpr(width))
      .groupBy(col("r"), col("bucket"))
      .agg(count(lit(1)).as("c"))
    val drained = runToMemory(spark, cells, "complete")
    TextAnalysis.cmsProbe(spark, dir, drained, width, depth, k)
  }

  /** approx_bloom_stream — the decontamination BLOOM FILTER as
    * streaming state: train-side shingles stream in, their k probe
    * positions fold into the ≤m-row set-bit table (a streaming groupBy
    * in complete mode — the Bloom OR-merge is an idempotent set union,
    * so state is bounded by m = 2²⁰ rows at ANY stream length; this is
    * the filter a 24/7 train-ingest keeps warm so eval probes never
    * wait for a batch build). The drained bit SET is identical to the
    * batch build's by idempotence, and the probe tier is shared CODE
    * ([[graft.operators.Dedup.bloomProbe]]), so the per-eval-doc
    * output matches dedup_bloom_prefilter row for row — which is why
    * the batch oracle verifies this stream.
    */
  def approxBloomStream(
      spark: SparkSession,
      dir: String,
      filesPerTrigger: Option[Int] = None
  ): DataFrame = {
    import graft.operators.Dedup
    import graft.functions.BloomFilter
    val m       = BloomFilter.DefaultBits
    val kProbes = BloomFilter.DefaultProbes
    val docsStatic = Tables
      .documents(spark, dir)
      .select(col("doc_id"), col("source"), Dedup.normText(col("text")).as("norm"))
    val evalSrc = docsStatic.agg(min(col("source"))).head().getString(0)
    require(evalSrc != null, "approx_bloom_stream: empty corpus")
    val schema = Tables.documents(spark, dir).schema
    val reader = spark.readStream.schema(schema)
    filesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val bits = reader
      .parquet(s"$dir/documents.parque[t]")
      .filter(col("source") =!= evalSrc)
      .select(col("doc_id"), Dedup.normText(col("text")).as("norm"))
      .transform(df => Dedup.shinglesOf(df))
      .withColumn("hm", BloomFilter.baseHash(col("shingle")))
      .select(explode(BloomFilter.positions(col("hm"), m, kProbes)).as("pos"))
      .groupBy(col("pos"))
      .agg(count(lit(1)).as("n")) // set-bit table: presence is the state, n is discarded
    val drained = runToMemory(spark, bits, "complete").select(col("pos"))
    Dedup.bloomProbe(spark, docsStatic, evalSrc, drained, m, kProbes, 200000L)
  }

  def approxHllStream(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Relational
    val schema = Tables.eventsFileSchema(spark, dir)
    val stream = spark.readStream
      .schema(schema)
      .parquet(s"$dir/events.parque[t]")
      .transform(Tables.normalizeEventsTs)
    val regs = Relational
      .hllRhoRows(stream)
      .groupBy(col("event_type"), col("bucket"))
      .agg(max(col("rho")).as("r"))
    val drained = runToMemory(spark, regs, "complete")
    val exact = Relational
      .hllRhoRows(Tables.events(spark, dir))
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_exact"))
    Relational.hllFinalize(drained, exact)
  }

  /** rel_mv_stream — the revenue-per-nation MATERIALIZED VIEW
    * maintained as STREAMING STATE: orders micro-batches join the
    * BROADCAST customer→nation dims (stream-static broadcast — the
    * only scale-sane shape; the stream side never shuffles for the
    * dim lookup) and fold into a per-nation (count, revenue-cents)
    * aggregate. Both aggregates are ADDITIVE, so the drained state
    * equals the batch recompute by algebra — the batch MV SQL is the
    * oracle. This is rel_mv_delta's nightly-close pattern run
    * continuously: maintenance costs O(micro-batch), the recompute
    * tier exists only as the audit.
    */
  def mvStream(
      spark: SparkSession,
      dir: String,
      filesPerTrigger: Option[Int] = None
  ): DataFrame = {
    val schema = spark.read.parquet(s"$dir/orders.parquet").schema
    val reader = spark.readStream.schema(schema)
    filesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val dims = Tables
      .customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"))
      .join(
        Tables.nation(spark, dir).select(col("n_nationkey"), col("n_name")),
        col("n_nationkey") === col("c_nationkey")
      )
      .select(col("c_custkey"), col("n_name"))
    val mv = reader
      .parquet(s"$dir/orders.parque[t]")
      .select(col("o_custkey"), cents(col("o_totalprice")).as("rev_c"))
      .join(broadcast(dims), col("c_custkey") === col("o_custkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_orders"), sum(col("rev_c")).as("revenue_c"))
    runToMemory(spark, mv, "complete")
  }

  /** quality_rules_stream — the per-source QUALITY BOOKS as STREAMING
    * STATE: the rule flags are ROW-LOCAL
    * ([[graft.operators.TextAnalysis.qualityFlags]] — literally the
    * batch operator's own doc-grain stage) and every book column is an
    * additive count, so the drained state equals the batch report by
    * algebra and the batch oracle verifies the stream. This is the
    * live ingest-quality dashboard: state is one row of counters per
    * source at ANY stream length.
    */
  def qualityRulesStream(
      spark: SparkSession,
      dir: String,
      filesPerTrigger: Option[Int] = None
  ): DataFrame = {
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    val reader = spark.readStream.schema(schema)
    filesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val books = graft.operators.TextAnalysis.qualityBooks(
      graft.operators.TextAnalysis.qualityFlags(reader.parquet(s"$dir/documents.parque[t]"))
    )
    runToMemory(spark, books, "complete")
  }

  /** approx_hdr_stream — the HDR latency sketch as STREAMING STATE:
    * lineitem rows stream in, pick up their order's date/priority
    * through a stream-static join (the dimension is a static broadcast
    * — no state store, no watermark needed for the join), and fold
    * into the (priority, hdr-code) counter table as a streaming groupBy
    * in complete mode. HDR counters are ADDITIVE, so the drained table
    * equals the batch sketch by algebra at any batch split, and state
    * is bounded by the code space (≤ ~8·64 rows per priority) at ANY
    * stream length — the always-warm latency dashboard shape. The
    * probe/ledger tier is shared CODE with approx_hdr_latency
    * ([[graft.operators.Relational.hdrProbe]]), which is why the batch
    * oracle verifies the stream bit-for-bit.
    */
  def approxHdrStream(
      spark: SparkSession,
      dir: String,
      filesPerTrigger: Option[Int] = None
  ): DataFrame = {
    import graft.operators.Relational
    val schema = Tables.lineitem(spark, dir).schema
    val reader = spark.readStream.schema(schema)
    filesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val orders = Tables
      .orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    val sketch = reader
      .parquet(s"$dir/lineitem.parque[t]")
      .select(col("l_orderkey"), col("l_shipdate"))
      .join(broadcast(orders), col("o_orderkey") === col("l_orderkey"))
      .select(
        col("o_orderpriority"),
        datediff(col("l_shipdate"), col("o_orderdate")).cast("long").as("days")
      )
      .groupBy(col("o_orderpriority"), Relational.hdrCode("days").as("code"))
      .agg(count(lit(1)).as("cnt"))
    val drained = runToMemory(spark, sketch, "complete")
    Relational.hdrProbe(spark, dir, drained)
  }

  /** ts_dedup_stream_events — EXACTLY-ONCE EVENT DEDUP as streaming
    * state (the at-least-once-transport reality every ingest pipeline
    * lives with: retries and replays re-deliver events, and the
    * pipeline must collapse them by id before anything counts). The
    * drill doubles the event stream (two readers of the same files —
    * a deterministic 2x re-delivery), dedups on event_id with
    * `dropDuplicatesWithinWatermark` (bounded state: ids older than
    * the watermark horizon evict; the horizon here is generous so the
    * whole test window dedups — production tunes it to the
    * re-delivery SLA), lands the deduped stream in a file sink, and
    * reports per-type totals. Oracle = the plain per-type counts off
    * the raw table: n_events == n_distinct proves both directions —
    * no duplicate survived AND no event was lost to eviction.
    */
  def dedupStreamEvents(spark: SparkSession, dir: String): DataFrame = {
    val out = TimeboxStore.scratchPath("graft_dedupstream_events", dir)
    val schema = Tables.eventsFileSchema(spark, dir)
    def one = spark.readStream
      .schema(schema)
      .parquet(s"$dir/events.parque[t]")
      .transform(Tables.normalizeEventsTs)
      .transform(Tables.requirePostEpochTs) // watermark-bound stream: see Tables scaladoc
      .select(col("event_id"), col("event_type"), expr("ts DIV 1000").as("ts_us"))
    val q = one
      .unionByName(one)
      .withColumn("ts_t", timestamp_micros(col("ts_us")))
      .withWatermark("ts_t", "30 days")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", s"$out/_checkpoint")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read
      .parquet(out)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), countDistinct(col("event_id")).as("n_distinct"))
  }

  /** ts_store_stream_read — STREAMING READ OF THE TIMEBOX STORE, the
    * 24/7 face of the batch CDC diff (ts_store_cdc): 8 daily delta
    * snapshots commit to a [[SnapshotCatalog]] root, then
    * `spark.readStream.format("timebox").load(root)` serves each
    * committed version as a micro-batch of decoded points stamped with
    * `commit_version` ([[TimeboxStreamSource]] — offsets ARE catalog
    * versions). The drill aggregates per version under an AvailableNow
    * drain; the oracle restates each day-slice straight from raw
    * events, so a version served twice, skipped, or bleeding rows
    * across commit boundaries all fail the hash. Scale shape: a
    * micro-batch costs one manifest read + the DELTA snapshots' blocks
    * — never the catalog's history.
    */
  /** Shared day-sliced commit fixture for the two streaming-read
    * drills: nDays daily delta snapshots committed to one
    * [[SnapshotCatalog]] root, built AT MOST ONCE per process per
    * corpus dir. Both consumers subscribe with fresh (temp) stream
    * checkpoints, so sharing the store never turns a drain into a
    * resume no-op — it only stops each drill from re-paying the
    * 2·nDays encode+write jobs that are NOT the operator under test
    * (the r10 bench read 25.1 s for the startingVersion drill, 3.1x
    * its cold single-query price, and the whole gap was this fixture
    * being rebuilt per invocation; the subscription itself is
    * O(delta) — see tools/StreamReadProfile and the BASELINE.md row).
    * Ignores percall scratch for the same reason [[GraphTier]] does:
    * the store is a shared INPUT, not a per-query fixture under test.
    */
  // bounded + validated (ProcessMemo policy, SURVEY §4): capped
  // remembered roots; a root whose commit log vanished is rebuilt
  private val fixtureReady = new ProcessMemo[String, String](16)
  private[graft] def storeStreamFixture(spark: SparkSession, dir: String, nDays: Int): String = {
    val dayUs = 86400000000L
    val root  = TimeboxStore.sharedScratchPath(s"graft_store_streamfix_d$nDays", dir)
    fixtureReady.getOrElseUpdate(
      root,
      r => java.nio.file.Files.isDirectory(java.nio.file.Paths.get(r, "commits"))
    ) {
      // a half-built root (failed earlier attempt) would otherwise
      // accumulate appended versions beyond nDays — rebuild clean
      val f = new java.io.File(root)
      if (f.exists()) { def rm(x: java.io.File): Unit = { if (x.isDirectory) Option(x.listFiles()).getOrElse(Array.empty).foreach(rm); x.delete(): Unit }; rm(f) }
      val pts = graft.operators.TimeSeries
        .eventsUs(spark, dir)
        .select(col("user_id"), col("ts_us"), col("event_id"), cents(col("value")).as("value_c"))
      // truncated-day EQUALITY slices (see catalogMaintenanceSummary):
      // the range form diverges from the oracle's day grouping on
      // pre-epoch timestamps
      val d0 = pts.agg(min(expr(s"ts_us DIV ${dayUs}L"))).head().getLong(0)
      (0 until nDays).foreach { i =>
        SnapshotCatalog.commit(
          spark,
          root,
          p => TimeboxStore.encode(pts.filter(expr(s"ts_us DIV ${dayUs}L") === (d0 + i))).write.parquet(p)
        ): Unit
      }
      root
    }
  }

  def storeStreamRead(spark: SparkSession, dir: String, nDays: Int = 8): DataFrame = {
    val root = storeStreamFixture(spark, dir, nDays)
    val agg = spark.readStream
      .format("timebox")
      .load(root)
      .groupBy(col("commit_version"))
      .agg(
        count(col("value_c")).as("n_points"),
        sum(col("value_c")).as("sum_value_c"),
        min(col("ts_us")).as("min_ts_us"),
        max(col("ts_us")).as("max_ts_us")
      )
    runToMemory(spark, agg, "complete")
  }

  /** `ts_store_stream_read_from` — the startingVersion door on the
    * streaming read: a consumer that already holds versions 1..k−1
    * (a bootstrapped replica, a checkpointed downstream) subscribes
    * from version k instead of replaying the whole commit log —
    * `spark.readStream.format("timebox").option("startingVersion", k)`.
    * Same day-sliced commit fixture as [[storeStreamRead]]; the
    * drained result must be exactly that stream's ≥ k suffix, which
    * is what the shared-shape oracle pins (versions below k never
    * appear — at 100 TB the skipped history is the point: O(delta)
    * subscription, not O(store)).
    */
  def storeStreamReadFrom(
      spark: SparkSession,
      dir: String,
      nDays: Int = 8,
      fromVersion: Int = 5
  ): DataFrame = {
    val root = storeStreamFixture(spark, dir, nDays)
    val agg = spark.readStream
      .format("timebox")
      .option("startingVersion", fromVersion.toString)
      .load(root)
      .groupBy(col("commit_version"))
      .agg(
        count(col("value_c")).as("n_points"),
        sum(col("value_c")).as("sum_value_c"),
        min(col("ts_us")).as("min_ts_us"),
        max(col("ts_us")).as("max_ts_us")
      )
    runToMemory(spark, agg, "complete")
  }

  /** LAST-TOUCH ATTRIBUTION as CUSTOM STREAMING STATE: the batch
    * [[graft.operators.Relational.attribution]] computed incrementally
    * — per-user state is ONE (last-touch type, ts, seq) triple, so a
    * purchase credits its channel the moment it arrives (the
    * marketing-pipeline shape at 100 TB, where replaying full history
    * per report is not an option). State is bounded by live users,
    * never stream length.
    *
    * Same cross-batch in-order PRECONDITION (and the same fail-loud
    * enforcement) as [[anomalyStream]]: attribution is order-sensitive
    * — a touch arriving after the purchase it should have credited
    * cannot be repaired retroactively. Within a batch rows sort by
    * (ts, seq) exactly like the batch window's ORDER BY.
    *
    * Each purchase is emitted exactly once (file-source exactly-once ×
    * one emission per purchase row), so the post-drain per-channel
    * rollup equals the batch operator bit-for-bit — the shared oracle
    * checks exactly that. The share window runs over the ≤5-row
    * channel-enum aggregate.
    */
  def attributionStream(
      spark: SparkSession,
      dir: String,
      filesPerTrigger: Option[Int] = None
  ): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val schema = Tables.eventsFileSchema(spark, dir)
    val reader = spark.readStream.schema(schema)
    filesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val stream = reader
      .parquet(s"$dir/events.parque[t]")
      .transform(Tables.normalizeEventsTs)
      .select(
        col("user_id").as[Long],
        expr("ts DIV 1000").as("ts_us").as[Long],
        col("event_id").as[Long],
        col("event_type").as[String],
        cents(col("value")).as("v_c").as[Long]
      )
      .as[(Long, Long, Long, String, Long)]
    // state = (last non-purchase touch or "" for none, last ts, last seq)
    val credited = stream
      .groupByKey(_._1)
      .flatMapGroupsWithState[(String, Long, Long), (String, Long, Long)](
        OutputMode.Append,
        GroupStateTimeout.NoTimeout // state is one small triple per live user
      ) { (uid: Long, rows: Iterator[(Long, Long, Long, String, Long)], state: GroupState[(String, Long, Long)]) =>
        val pts = rows.toArray.sortBy(r => (r._2, r._3))
        var (touch, lastTs, lastSeq) =
          state.getOption.getOrElse(("", Long.MinValue, Long.MinValue))
        pts.headOption.foreach { case (_, ts, eid, _, _) =>
          if (ts < lastTs || (ts == lastTs && eid < lastSeq))
            throw new IllegalStateException(
              s"attributionStream: out-of-order arrival for user $uid — event (ts=$ts, seq=$eid) " +
                s"after already-processed (ts=$lastTs, seq=$lastSeq); the source must deliver each " +
                "user in event-time order across micro-batches"
            )
        }
        val out = scala.collection.mutable.ListBuffer.empty[(String, Long, Long)]
        pts.foreach { case (_, ts, eid, tpe, vc) =>
          if (tpe == "purchase") out += ((if (touch.isEmpty) "direct" else touch, vc, eid))
          else touch = tpe
          lastTs = ts
          lastSeq = eid
        }
        state.update((touch, lastTs, lastSeq))
        out.iterator
      }
      .toDF("channel", "v_c", "event_id")
    runToMemory(spark, credited, "append")
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_purchases"), sum(col("v_c")).as("credited_c"))
      .withColumn(
        "share_bp",
        expr("CAST((CAST(credited_c AS DECIMAL(38,0)) * 10000) DIV greatest(SUM(credited_c) OVER (), 1L) AS BIGINT)")
      )
  }

  private def runToMemory(spark: SparkSession, df: DataFrame, mode: String): DataFrame = {
    val name = "graft_stream_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
