package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.FixedPoint._
import graft.sources.Tables

/** Time-series query surface — the Spark-native re-expression of the
  * reference's timebox semantics (timebox/timebox.py and timebox/utils).
  *
  * The reference is a single-node columnar store whose format IS its
  * query capability: delta-encoded timestamps, unit compression,
  * integer downcasting, fixed-point floats, regular grids, and (its
  * declared roadmap) range + tag-subset reads. Here each of those
  * becomes a distributed operator over the `events` table:
  *
  *   - per-series work partitions by `user_id` (the series key) and is
  *     one `Window.partitionBy(user_id)` pass — a single shuffle that
  *     scales horizontally with series count, which is exactly the
  *     axis that grows at 100 TB;
  *   - timestamps are integer epoch-microseconds end-to-end (events
  *     parquet stores TIMESTAMP(NANOS); we read them as nano longs and
  *     `DIV 1000`), so all arithmetic is exact and cross-engine;
  *   - values are fixed-point integer cents (the reference's own
  *     round(x*10^d) trick, numpy_utils.py:266-275), so partial
  *     aggregation is exact and order-independent.
  */
object TimeSeries {

  private val HourUs = 3600L * 1000000L
  private val DayUs  = 24L * HourUs

  /** events with integer epoch-micro timestamps (ts canonicalized to
    * nano longs at the ingest edge — Tables.normalizeEventsTs handles
    * whichever physical type the file carries).
    */
  def eventsUs(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).withColumn("ts_us", expr("ts DIV 1000"))

  /** Per-series ordering used everywhere: time, then event_id as the
    * deterministic tiebreak.
    */
  private def seriesW = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))

  // -------------------------------------------------------------------
  // 1. ts_range_read — time-range + tag-subset read.
  // The reference's roadmap read path (timebox.py:102-106): a range +
  // column-subset retrieval. Spark-native: both the time predicate and
  // the 4-column projection push down to the parquet scan (verified:
  // PushedFilters on ts/event_type, ReadSchema of 4 cols), so at 100 TB
  // only matching row groups are read.
  // -------------------------------------------------------------------
  def rangeRead(
      spark: SparkSession,
      dir: String,
      startUs: Long = 1704672000000000L, // 2024-01-08 00:00:00 UTC
      endUs: Long = 1705276800000000L,   // 2024-01-15 00:00:00 UTC
      eventType: String = "click"
  ): DataFrame = {
    Tables
      // the time range rides the RAW on-disk ts column so the
      // predicate reaches parquet whatever the file's physical type
      .eventsInRangeUs(spark, dir, startUs, endUs)
      .filter(col("event_type") === eventType)
      .select(
        col("event_id"),
        col("user_id"),
        expr("ts DIV 1000").as("ts_us"),
        cents(col("value")).as("value_c")
      )
  }

  /** Sorted-order enforcement (timebox.py:363-376 raises on negative
    * date differentials): validates that a sequenced input is
    * time-ordered within every series, rejecting the frame otherwise.
    * One window pass; the count comes back to the driver, never rows.
    */
  def requireSorted(df: DataFrame, seriesCol: String, seqCol: String, tsCol: String): Unit = {
    val w = Window.partitionBy(seriesCol).orderBy(seqCol)
    val bad = df
      .withColumn("__delta", col(tsCol) - lag(col(tsCol), 1).over(w))
      .filter(col("__delta") < 0)
      .count()
    if (bad > 0)
      throw new IllegalArgumentException(
        s"$bad out-of-order points in $tsCol: dates must be sorted within each $seriesCol"
      )
  }

  // -------------------------------------------------------------------
  // 2. ts_delta_encode — start + per-point differentials per series
  // (timebox.py:363-376 _calculate_date_differentials). First point's
  // delta is 0 (the reference stores the start separately).
  // -------------------------------------------------------------------
  def deltaEncode(spark: SparkSession, dir: String): DataFrame = {
    val w = seriesW
    eventsUs(spark, dir)
      .select(
        col("user_id"),
        (row_number().over(w) - 1).cast("long").as("seq"),
        col("ts_us"),
        coalesce(col("ts_us") - lag(col("ts_us"), 1).over(w), lit(0L)).as("delta_us")
      )
  }

  // -------------------------------------------------------------------
  // 3. ts_delta_decode — reconstruct timestamps from start + cumulative
  // deltas and prove the roundtrip is lossless (timebox.py:343-361).
  // -------------------------------------------------------------------
  def deltaDecode(spark: SparkSession, dir: String): DataFrame = {
    val w = seriesW
    val cum = seriesW.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    eventsUs(spark, dir)
      .select(
        col("user_id"),
        col("event_id"),
        col("ts_us"),
        coalesce(col("ts_us") - lag(col("ts_us"), 1).over(w), lit(0L)).as("delta_us"),
        first(col("ts_us")).over(cum).as("start_us")
      )
      .withColumn("recon_us", col("start_us") + sum(col("delta_us")).over(cum))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_points"),
        sum(when(col("recon_us") =!= col("ts_us"), 1L).otherwise(0L)).as("n_mismatch"),
        min(col("ts_us")).as("min_ts_us"),
        max(col("ts_us")).as("max_ts_us")
      )
  }

  // -------------------------------------------------------------------
  // 4. ts_unit_compress — coarsest time unit dividing all of a series'
  // deltas (datetime_utils.py:118-142 compress_time_delta_array's
  // ns→D ladder). Run on lineitem ship-dates per supplier, where the
  // ladder lands on days; a second shuffle-free agg computes the
  // scaled-delta max used for width planning downstream.
  // -------------------------------------------------------------------
  def unitCompress(spark: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy("l_suppkey")
      .orderBy(col("ship_us"), col("l_orderkey"), col("l_linenumber"))
    Tables
      .lineitem(spark, dir)
      .select(
        col("l_suppkey"),
        col("l_orderkey"),
        col("l_linenumber"),
        // l_shipdate is TIMESTAMP_NTZ; session TZ is UTC so the cast is exact
        unix_micros(col("l_shipdate").cast("timestamp")).as("ship_us")
      )
      .withColumn("delta_us", col("ship_us") - lag(col("ship_us"), 1).over(w))
      .filter(col("delta_us").isNotNull)
      .groupBy(col("l_suppkey"))
      .agg(
        count(lit(1)).as("n_deltas"),
        expr(s"""CASE WHEN bool_and(delta_us % ${DayUs}L = 0) THEN ${DayUs}L
                 WHEN bool_and(delta_us % ${HourUs}L = 0) THEN ${HourUs}L
                 WHEN bool_and(delta_us % 60000000 = 0) THEN 60000000L
                 WHEN bool_and(delta_us % 1000000 = 0) THEN 1000000L
                 WHEN bool_and(delta_us % 1000 = 0) THEN 1000L
                 ELSE 1L END""").as("unit_us"),
        max(col("delta_us")).as("max_delta_us")
      )
      .withColumn("max_scaled_delta", expr("max_delta_us DIV unit_us"))
  }

  // -------------------------------------------------------------------
  // 8. ts_regular_grid — fixed-interval grid summary: how many
  // `seconds_between_points` slots a series spans and how many are
  // occupied (timebox.py:226-238 fixed-interval mode).
  // -------------------------------------------------------------------
  def regularGrid(spark: SparkSession, dir: String, intervalUs: Long = HourUs): DataFrame = {
    eventsUs(spark, dir)
      .withColumn("start_us", min(col("ts_us")).over(Window.partitionBy("user_id")))
      .groupBy(col("user_id"))
      .agg(
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"),
        count(lit(1)).as("n_events"),
        countDistinct(expr(s"(ts_us - start_us) DIV ${intervalUs}L")).as("n_filled_slots")
      )
      .withColumn("n_slots", expr(s"(end_us - start_us) DIV ${intervalUs}L + 1"))
  }

  // -------------------------------------------------------------------
  // 9. ts_resample_1h — classic downsample: per-hour per-type
  // count/sum/min/max. Single shuffle; integer-cents aggregates are
  // fully partial-aggregable (map-side combine does most of the work
  // at 100 TB).
  // -------------------------------------------------------------------
  def resampleHourly(spark: SparkSession, dir: String): DataFrame = {
    eventsUs(spark, dir)
      .groupBy(expr(s"ts_us DIV ${HourUs}L").as("hour_id"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(cents(col("value"))).as("sum_c"),
        min(cents(col("value"))).as("min_c"),
        max(cents(col("value"))).as("max_c")
      )
  }

  // -------------------------------------------------------------------
  // 10. ts_ohlc_1d — OHLC bars per user per day. Open/close are picked
  // by deterministic (ts, event_id) row-number rather than first/last
  // aggregates, so results are stable under any partitioning.
  // -------------------------------------------------------------------
  def ohlcDaily(spark: SparkSession, dir: String): DataFrame = {
    val asc = Window
      .partitionBy(col("user_id"), col("day_id"))
      .orderBy(col("ts_us").asc, col("event_id").asc)
    val desc = Window
      .partitionBy(col("user_id"), col("day_id"))
      .orderBy(col("ts_us").desc, col("event_id").desc)
    eventsUs(spark, dir)
      .select(
        col("user_id"),
        expr(s"ts_us DIV ${DayUs}L").as("day_id"),
        col("ts_us"),
        col("event_id"),
        cents(col("value")).as("value_c")
      )
      .withColumn("rn_a", row_number().over(asc))
      .withColumn("rn_d", row_number().over(desc))
      .groupBy(col("user_id"), col("day_id"))
      .agg(
        max(when(col("rn_a") === 1, col("value_c"))).as("open_c"),
        max(col("value_c")).as("high_c"),
        min(col("value_c")).as("low_c"),
        max(when(col("rn_d") === 1, col("value_c"))).as("close_c"),
        count(lit(1)).as("n")
      )
  }

  // -------------------------------------------------------------------
  // 10b. ts_downsample_m4 — M4 visualization downsampling (Jugel et
  // al., VLDB'14): per series, split its own time extent into nBuckets
  // equal pixels and keep min/max/first/last per pixel — the four
  // points that make the downsampled line render pixel-identically.
  // Bucket assignment, the first/last row-numbers, and the final agg
  // all share the series hash partitioning: ONE shuffle end-to-end.
  // -------------------------------------------------------------------
  def downsampleM4(spark: SparkSession, dir: String, nBuckets: Int = 100): DataFrame = {
    val wu = Window.partitionBy("user_id")
    val base = eventsUs(spark, dir)
      .select(col("user_id"), col("ts_us"), col("event_id"), cents(col("value")).as("value_c"))
      .withColumn("t0", min(col("ts_us")).over(wu))
      .withColumn("t1", max(col("ts_us")).over(wu))
      .withColumn(
        "bucket",
        least(lit(nBuckets - 1L), expr(s"(ts_us - t0) * $nBuckets DIV (t1 - t0 + 1)"))
      )
    val asc = Window.partitionBy(col("user_id"), col("bucket")).orderBy(col("ts_us").asc, col("event_id").asc)
    val desc = Window.partitionBy(col("user_id"), col("bucket")).orderBy(col("ts_us").desc, col("event_id").desc)
    base
      .withColumn("rn_a", row_number().over(asc))
      .withColumn("rn_d", row_number().over(desc))
      .groupBy(col("user_id"), col("bucket"))
      .agg(
        min(col("value_c")).as("min_c"),
        max(col("value_c")).as("max_c"),
        max(when(col("rn_a") === 1, col("value_c"))).as("first_c"),
        max(when(col("rn_d") === 1, col("value_c"))).as("last_c"),
        min(col("ts_us")).as("t_start_us"),
        max(col("ts_us")).as("t_end_us"),
        count(lit(1)).as("n")
      )
  }

  // -------------------------------------------------------------------
  // 10c. ts_downsample_lttb — largest-triangle downsampling, the other
  // canonical visualization reducer next to M4: per bucket keep the
  // point spanning the LARGEST TRIANGLE against its neighbor buckets
  // (Steinarsson's LTTB). The textbook algorithm anchors on the
  // previously SELECTED point — a sequential chain down each series —
  // so this is the PARALLEL variant: both anchors are the neighbor
  // buckets' mean coordinates (floor-div integers), which drops the
  // cross-bucket dependency and makes every bucket's argmax
  // independent. Areas are exact integer cross products
  // |（lx−x)(ry−y) − (rx−x)(ly−y)| over (us, cents) — no floats, no
  // tie drift; first/last buckets keep their first/last point (the
  // LTTB endpoint rule). One groupBy for means + one bucket-keyed
  // join + one per-bucket window — all on the series shuffle key.
  // -------------------------------------------------------------------
  def downsampleLttb(spark: SparkSession, dir: String, nBuckets: Int = 60): DataFrame = {
    val wu = Window.partitionBy("user_id")
    val base = eventsUs(spark, dir)
      .select(col("user_id"), col("ts_us"), col("event_id"), cents(col("value")).as("v"))
      .withColumn("t0", min(col("ts_us")).over(wu))
      .withColumn("t1", max(col("ts_us")).over(wu))
      .withColumn(
        "bucket",
        least(lit(nBuckets - 1L), expr(s"(ts_us - t0) * $nBuckets DIV (t1 - t0 + 1)"))
      )
      .drop("t0", "t1")
    val means = base
      .groupBy(col("user_id"), col("bucket"))
      .agg(count(lit(1)).as("n_pts"), sum(col("ts_us")).as("st"), sum(col("v")).as("sv"))
      .withColumn("mx", expr("st DIV n_pts"))
      .withColumn("my", expr("sv DIV n_pts"))
    val wb = Window.partitionBy("user_id").orderBy("bucket")
    val nb = means.select(
      col("user_id"),
      col("bucket"),
      col("n_pts"),
      lag(col("mx"), 1).over(wb).as("lx"),
      lag(col("my"), 1).over(wb).as("ly"),
      lead(col("mx"), 1).over(wb).as("rx"),
      lead(col("my"), 1).over(wb).as("ry")
    )
    val both = col("lx").isNotNull && col("rx").isNotNull
    val lastB = col("rx").isNull && col("lx").isNotNull
    val sel = Window
      .partitionBy(col("user_id"), col("bucket"))
      .orderBy(
        when(both, -abs((col("lx") - col("ts_us")) * (col("ry") - col("v")) -
          (col("rx") - col("ts_us")) * (col("ly") - col("v")))).otherwise(lit(0L)).asc,
        when(lastB, -col("ts_us")).otherwise(col("ts_us")).asc,
        when(lastB, -col("event_id")).otherwise(col("event_id")).asc
      )
    base
      .join(nb, Seq("user_id", "bucket"))
      .withColumn("rn", row_number().over(sel))
      .filter(col("rn") === 1)
      .select(
        col("user_id"),
        col("bucket"),
        col("ts_us").as("sel_ts_us"),
        col("v").as("sel_value_c"),
        col("n_pts")
      )
  }

  // -------------------------------------------------------------------
  // 10d. ts_downsample_lttb_seq — TEXTBOOK LTTB: the sequential
  // previous-selected-point chain (Steinarsson 2013), per series, over
  // the same time-grid buckets as the parallel variant. Bucket i's
  // winner maximizes the triangle against the PREVIOUSLY SELECTED
  // point and bucket i+1's floor-div mean — inherently sequential, so
  // it runs as ONE aggregate() fold over the series' bucket array (the
  // ts_holt_linear pattern): state is the selected-point chain (≤
  // nBuckets entries), the folded array groups each bucket's points.
  // First/last buckets keep the first/last data point; ties break to
  // the earliest (ts, event_id) — the fold's strict > keeps the first
  // maximum of the ascending-sorted bucket. The per-series collect is
  // bounded by series length: the operator's contract is downsampling
  // ONE renderable series, the shape dashboards ask for — corpus-wide
  // reduction is what ts_downsample_m4 / the parallel LTTB are for.
  // Oracle: a recursive CTE replaying the identical chain.
  // -------------------------------------------------------------------
  def downsampleLttbSeq(spark: SparkSession, dir: String, nBuckets: Int = 60): DataFrame = {
    val wu = Window.partitionBy("user_id")
    val base = eventsUs(spark, dir)
      .select(col("user_id"), col("ts_us"), col("event_id"), cents(col("value")).as("v"))
      .withColumn("t0", min(col("ts_us")).over(wu))
      .withColumn("t1", max(col("ts_us")).over(wu))
      .withColumn(
        "bucket",
        least(lit(nBuckets - 1L), expr(s"(ts_us - t0) * $nBuckets DIV (t1 - t0 + 1)"))
      )
    val bkt = base
      .groupBy(col("user_id"), col("bucket"))
      .agg(
        count(lit(1)).as("n_pts"),
        expr("sum(ts_us) DIV count(1)").as("mx"),
        expr("sum(v) DIV count(1)").as("my"),
        sort_array(collect_list(struct(col("ts_us"), col("event_id"), col("v")))).as("pts")
      )
    // anchor area vs the chain's last selected point, duplicated inline
    // because SQL lambda bodies cannot let-bind (the ts_holt_linear
    // convention); all terms are exact BIGINT cross products
    val area =
      "abs((element_at(acc, -1).p.ts_us - b.nx) * (p.v - element_at(acc, -1).p.v) - " +
        "(element_at(acc, -1).p.ts_us - p.ts_us) * (b.ny - element_at(acc, -1).p.v))"
    val fold =
      s"""aggregate(
         |  slice(bz, 2, size(bz) - 1),
         |  array(named_struct('bucket', bz[0].bucket, 'n_pts', bz[0].n_pts, 'p', bz[0].pts[0])),
         |  (acc, b) -> concat(acc, array(named_struct(
         |    'bucket', b.bucket,
         |    'n_pts', b.n_pts,
         |    'p', CASE WHEN b.last THEN element_at(b.pts, -1)
         |         ELSE aggregate(b.pts,
         |                named_struct('q', b.pts[0], 'a2', CAST(-1 AS BIGINT)),
         |                (w, p) -> CASE WHEN $area > w.a2
         |                          THEN named_struct('q', p, 'a2', $area)
         |                          ELSE w END).q
         |         END))))""".stripMargin
    bkt
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("bucket"), col("n_pts"), col("mx"), col("my"), col("pts")))).as("bk"))
      .withColumn(
        "bz",
        expr(
          """transform(sequence(0, size(bk) - 1), j -> named_struct(
            |  'bucket', bk[j].bucket, 'n_pts', bk[j].n_pts, 'pts', bk[j].pts,
            |  'nx', if(j + 1 < size(bk), bk[j + 1].mx, CAST(0 AS BIGINT)),
            |  'ny', if(j + 1 < size(bk), bk[j + 1].my, CAST(0 AS BIGINT)),
            |  'last', j = size(bk) - 1))""".stripMargin
        )
      )
      .withColumn("sel", expr(fold))
      .select(col("user_id"), explode(col("sel")).as("s"))
      .select(
        col("user_id"),
        col("s.bucket").as("bucket"),
        col("s.p.ts_us").as("sel_ts_us"),
        col("s.p.v").as("sel_value_c"),
        col("s.n_pts").as("n_pts")
      )
  }

  // -------------------------------------------------------------------
  // 11. ts_moving_avg — trailing-5-row moving aggregate per series.
  // Emitted as integer sum + count (avg = sum/n) so the result is
  // exact; a single window pass, one shuffle on the series key.
  // -------------------------------------------------------------------
  def movingAgg(spark: SparkSession, dir: String, nRows: Int = 5): DataFrame = {
    val w = seriesW.rowsBetween(-(nRows - 1), Window.currentRow)
    eventsUs(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts_us"), cents(col("value")).as("value_c"))
      .withColumn("w5_sum_c", sum(col("value_c")).over(w))
      .withColumn("w5_n", count(lit(1)).over(w).cast("long"))
      .drop("value_c")
  }

  // -------------------------------------------------------------------
  // 11d. ts_anomaly_zscore — trailing-window z-score outliers per
  // series: flag points where (x - mean)² > z²·var over the previous
  // W observations. The test is pure integer algebra on fixed-point
  // cents — (n·x − S)² > z²·(n·Q − S²) with S=Σx, Q=Σx² — so the
  // verdict is exact and engine-portable (no float variance drift),
  // and the whole operator is one window pass / one shuffle.
  // -------------------------------------------------------------------
  def anomalyZscore(spark: SparkSession, dir: String, win: Int = 20, z: Int = 3): DataFrame = {
    // trailing window EXCLUDING the current row: score x against its past
    val w = seriesW.rowsBetween(-win, -1)
    eventsUs(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts_us"), cents(col("value")).as("x"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s", sum(col("x")).over(w))
      .withColumn("q", sum(col("x") * col("x")).over(w))
      .filter(col("n") >= win) // need a full window of history
      .withColumn("dev_n", col("n") * col("x") - col("s"))
      .withColumn(
        "is_anomaly",
        when(col("dev_n") * col("dev_n") > lit(z.toLong * z) * (col("n") * col("q") - col("s") * col("s")), 1L)
          .otherwise(0L)
      )
      .select(col("event_id"), col("user_id"), col("ts_us"), col("x").as("value_c"), col("is_anomaly"))
  }

  // -------------------------------------------------------------------
  // 11d2. ts_mad_outlier — ROBUST per-series outlier summary via the
  // median absolute deviation. The z-score baseline (11d) is itself
  // pulled by outliers; MAD is not — the production-grade robust
  // detector. Exact medians come from rank selection (row_number +
  // conditional sum of the two middle ranks, kept DOUBLED so even
  // counts stay integer), never an approximate percentile: med2 =
  // v⌈n/2⌉ + v⌈(n+1)/2⌉. Deviations |2v − med2| rank the same way for
  // mad2, and the flag compares cross-multiplied integers —
  // |x−med| > 3·1.4826·MAD ⟺ dev·10⁴ > 44478·mad2 — so the verdict
  // is engine-exact. Both ranking windows and the final aggregate
  // share ONE user_id hash partitioning: a single shuffle end to end.
  // At 100 TB the per-series sort is the irreducible cost of an exact
  // median; a sketch tier (GK, as ts_percentiles) is the approximate
  // escape hatch when series stop fitting a partition.
  // -------------------------------------------------------------------
  def madOutlier(spark: SparkSession, dir: String): DataFrame = {
    val wv   = Window.partitionBy("user_id").orderBy(col("v"), col("event_id"))
    val wd   = Window.partitionBy("user_id").orderBy(col("dev"), col("event_id"))
    val wAll = Window.partitionBy("user_id")
    eventsUs(spark, dir)
      .select(col("user_id"), col("event_id"), cents(col("value")).as("v"))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("rv", row_number().over(wv).cast("long"))
      .withColumn(
        "med2",
        sum(when(col("rv") === expr("(n + 1) DIV 2"), col("v")).otherwise(0L)).over(wAll) +
          sum(when(col("rv") === expr("(n + 2) DIV 2"), col("v")).otherwise(0L)).over(wAll)
      )
      // dev = 2·|x − med| (doubled-median units); mad2 below = 4·MAD
      .withColumn("dev", abs(col("v") * 2 - col("med2")))
      .withColumn("rd", row_number().over(wd).cast("long"))
      .withColumn(
        "mad2",
        sum(when(col("rd") === expr("(n + 1) DIV 2"), col("dev")).otherwise(0L)).over(wAll) +
          sum(when(col("rd") === expr("(n + 2) DIV 2"), col("dev")).otherwise(0L)).over(wAll)
      )
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_points"),
        max(col("med2")).as("med2_c"),
        max(col("mad2")).as("mad2_c"),
        // |x−med| > 3·1.4826·MAD ⟺ (dev/2)·10⁴ > 44478·(mad2/4)
        //                        ⟺ dev·20000 > 44478·mad2
        sum(when(col("dev") * 20000 > col("mad2") * 44478, 1L).otherwise(0L)).as("n_outliers")
      )
  }

  // -------------------------------------------------------------------
  // 11d3. ts_sax — SAX symbolic approximation per series: hourly PAA
  // means (floor-div exact for any sign) → per-series value-QUARTILE
  // symbols a..d (rank-based NTILE, deterministic tiebreak — the
  // data-adaptive breakpoint choice that stays integer-exact where
  // Gaussian breakpoints would drag in floats) → the symbol STRING in
  // time order plus a duplicated-3-symbol-motif count (the classic
  // SAX motif-mining primitive). Everything after the hourly rollup
  // runs on the per-series hour table (quartile window + one ordered
  // collect), so the sort is hours-per-series, never raw events; the
  // rollup itself is one partial-aggregable shuffle.
  // -------------------------------------------------------------------
  def sax(spark: SparkSession, dir: String): DataFrame = {
    val paa = eventsUs(spark, dir)
      .select(col("user_id"), expr(s"ts_us DIV ${HourUs}L").as("hour_id"), cents(col("value")).as("v"))
      .groupBy(col("user_id"), col("hour_id"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      .withColumn("paa_c", expr("(s - pmod(s, n)) DIV n")) // floor(s/n), any sign
    val wq = Window.partitionBy(col("user_id")).orderBy(col("paa_c").asc, col("hour_id").asc)
    paa
      .withColumn("qt", ntile(4).over(wq))
      .withColumn(
        "sym",
        when(col("qt") === 1, "a").when(col("qt") === 2, "b").when(col("qt") === 3, "c").otherwise("d")
      )
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_hours"),
        array_join(
          transform(sort_array(collect_list(struct(col("hour_id"), col("sym")))), p => p.getField("sym")),
          ""
        ).as("sax")
      )
      .withColumn(
        "wins",
        when(
          length(col("sax")) >= 3,
          expr("transform(sequence(1, length(sax) - 2), i -> substring(sax, i, 3))")
        ).otherwise(array())
      )
      .select(
        col("user_id"),
        col("n_hours"),
        col("sax"),
        (size(col("wins")) - size(array_distinct(col("wins")))).cast("long").as("n_dup_motifs")
      )
  }

  // -------------------------------------------------------------------
  // 11e. ts_rate_increase — counter-rate per series per hour (the
  // PromQL `increase` shape): sum of positive value deltas between
  // consecutive observations, negative deltas (counter resets)
  // contributing zero, attributed to the hour of the later point. One
  // window pass; the per-hour aggregation reuses the series hash
  // partitioning, so the whole operator is a single shuffle.
  // -------------------------------------------------------------------
  def rateIncrease(spark: SparkSession, dir: String): DataFrame = {
    val w = seriesW
    eventsUs(spark, dir)
      .select(col("user_id"), col("ts_us"), col("event_id"), cents(col("value")).as("value_c"))
      .withColumn("dv", col("value_c") - lag(col("value_c"), 1).over(w))
      .filter(col("dv").isNotNull)
      .groupBy(col("user_id"), expr(s"ts_us DIV ${HourUs}L").as("hour_id"))
      .agg(
        count(lit(1)).as("n_deltas"),
        sum(when(col("dv") > 0, col("dv")).otherwise(0L)).as("increase_c"),
        sum(col("dv")).as("net_delta_c")
      )
  }

  // -------------------------------------------------------------------
  // 11f2. ts_counter_resets — PromQL increase() with RESET
  // compensation: a monotone counter that drops restarted, so a
  // negative delta is a reset and the post-reset value is the true
  // increase since the restart (increase = Σ max(dv, 0) + Σ v where
  // dv < 0 — exactly Prometheus' extrapolation-free core). Per-hour
  // reset counts ride the same pass; the plan is the one-window,
  // one-shuffle shape of ts_rate_increase.
  // -------------------------------------------------------------------
  def counterResets(spark: SparkSession, dir: String): DataFrame = {
    val w = seriesW
    eventsUs(spark, dir)
      .select(col("user_id"), col("ts_us"), col("event_id"), cents(col("value")).as("value_c"))
      .withColumn("dv", col("value_c") - lag(col("value_c"), 1).over(w))
      .filter(col("dv").isNotNull)
      .groupBy(col("user_id"), expr(s"ts_us DIV ${HourUs}L").as("hour_id"))
      .agg(
        count(lit(1)).as("n_deltas"),
        sum(when(col("dv") < 0, 1L).otherwise(0L)).as("n_resets"),
        sum(when(col("dv") >= 0, col("dv")).otherwise(col("value_c"))).as("adj_increase_c")
      )
  }

  // -------------------------------------------------------------------
  // 12c. ts_gap_stats — per-series sampling-health summary: how many
  // silent gaps (> threshold) a series has and its inter-arrival
  // extremes — the "is this series healthy / does it need gap-fill"
  // companion to ts_gapfill_locf. One window pass, one shuffle.
  // -------------------------------------------------------------------
  def gapStats(spark: SparkSession, dir: String, gapUs: Long = 30L * 60 * 1000000L): DataFrame = {
    val w = seriesW
    eventsUs(spark, dir)
      .select(col("user_id"), col("ts_us"), col("event_id"))
      .withColumn("delta", col("ts_us") - lag(col("ts_us"), 1).over(w))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_points"),
        sum(when(col("delta") > gapUs, 1L).otherwise(0L)).as("n_gaps"),
        max(col("delta")).as("max_delta_us"),
        min(col("delta")).as("min_delta_us")
      )
  }

  // -------------------------------------------------------------------
  // 11f. ts_seasonal_profile — seasonal baseline table: per event type,
  // activity profile by (day-of-week, hour-of-day) — what anomaly
  // detection compares against when "normal" is periodic. Epoch-day 0
  // is a Thursday, so dow = (epoch_day + 4) % 7 puts Sunday at 0; all
  // UTC, all integers. Single partial-aggregable shuffle on a 7×24×
  // types key space.
  // -------------------------------------------------------------------
  def seasonalProfile(spark: SparkSession, dir: String): DataFrame = {
    eventsUs(spark, dir)
      .groupBy(
        col("event_type"),
        expr(s"(ts_us DIV ${DayUs}L + 4) % 7").as("day_of_week"),
        expr(s"(ts_us DIV ${HourUs}L) % 24").as("hour_of_day")
      )
      .agg(
        count(lit(1)).as("n"),
        sum(cents(col("value"))).as("sum_c"),
        min(cents(col("value"))).as("min_c"),
        max(cents(col("value"))).as("max_c")
      )
  }

  // -------------------------------------------------------------------
  // 11i. ts_json_props — semi-structured extraction: parse the events
  // JSON props column with a TYPED schema (from_json → struct, not
  // string-hacking) and aggregate the extracted field per type. At
  // 100 TB the win is the schema: typed extraction happens once per
  // row inside the scan stage, and everything downstream is integer
  // arithmetic — the standard "JSON at the edge, columns inside"
  // pipeline shape.
  // -------------------------------------------------------------------
  def jsonProps(spark: SparkSession, dir: String): DataFrame = {
    Tables
      .events(spark, dir)
      .select(
        col("event_type"),
        from_json(col("props"), org.apache.spark.sql.types.StructType(
          Seq(org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType))
        )).getField("k").as("k")
      )
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("k").isNull, 1L).otherwise(0L)).as("n_null_k"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k")
      )
  }

  // -------------------------------------------------------------------
  // 11j. ts_changepoint — CUSUM changepoint per series, in EXACT
  // integer arithmetic: the classic statistic max_k |prefix_k − k·μ|
  // is scaled by n (μ = total/n) to n·prefix_k − k·total, which is an
  // integer — no float mean, no drift, the argmax is engine-exact.
  // Two window passes sharing one series shuffle (prefix sums + the
  // per-series totals), then an argmax aggregate with a deterministic
  // (dev desc, k asc) tiebreak riding in a max_by struct.
  // -------------------------------------------------------------------
  def changepoint(spark: SparkSession, dir: String): DataFrame = {
    val cum = seriesW.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy("user_id")
    eventsUs(spark, dir)
      .select(col("user_id"), col("ts_us"), col("event_id"), cents(col("value")).as("value_c"))
      .withColumn("k", row_number().over(seriesW).cast("long"))
      .withColumn("prefix", sum(col("value_c")).over(cum))
      .withColumn("n", count(lit(1)).over(whole))
      .withColumn("total", sum(col("value_c")).over(whole))
      .withColumn("dev", abs(col("n") * col("prefix") - col("k") * col("total")))
      .groupBy(col("user_id"))
      .agg(
        first(col("n")).as("n"),
        max(col("dev")).as("max_dev"),
        min_by(col("k"), struct(-col("dev"), col("k"))).as("cp_k"),
        min_by(col("ts_us"), struct(-col("dev"), col("k"))).as("cp_ts_us")
      )
  }

  // -------------------------------------------------------------------
  // 11h. ts_value_histogram — fixed-width value histogram per event
  // type (the Prometheus-histogram shape percentile sketches and SLO
  // math consume). Bucketing is exact floor division on fixed-point
  // cents ((v - pmod(v, w)) DIV w == SQL floor for any sign), so bucket
  // edges are engine-identical; one fully partial-aggregable shuffle
  // with output bounded by buckets × types, not rows.
  // -------------------------------------------------------------------
  def valueHistogram(spark: SparkSession, dir: String, bucketC: Long = 500L): DataFrame = {
    eventsUs(spark, dir)
      .select(col("event_type"), cents(col("value")).as("v"))
      .groupBy(
        col("event_type"),
        expr(s"(v - pmod(v, ${bucketC}L)) DIV ${bucketC}L").as("bucket")
      )
      .agg(
        count(lit(1)).as("n"),
        min(col("v")).as("min_c"),
        max(col("v")).as("max_c")
      )
  }

  // -------------------------------------------------------------------
  // 11k. ts_histogram_quantile — the PromQL histogram_quantile shape:
  // estimate a quantile FROM the fixed-width value histogram (never
  // the raw stream) by walking the cumulative bucket counts to the
  // target rank and interpolating linearly inside the landing bucket.
  // All integer micro-cents: rank k = ceil(q·total), estimate =
  // bucket_lo·10^6 + width·(k − cum_before)·10^6 DIV n. The histogram
  // is tiny per group (values DIV width), so the window runs over
  // buckets, not events — the same 100 TB posture as ts_percentiles.
  // -------------------------------------------------------------------
  def histogramQuantile(
      spark: SparkSession,
      dir: String,
      qMicro: Long = 900000L,
      bucketC: Long = 500L
  ): DataFrame = {
    val hist = valueHistogram(spark, dir, bucketC).select(col("event_type"), col("bucket"), col("n"))
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
    val wAll = Window.partitionBy(col("event_type"))
    hist
      .withColumn("cum", sum(col("n")).over(wOrd))
      .withColumn("total_n", sum(col("n")).over(wAll))
      .withColumn("rank_k", expr(s"(total_n * ${qMicro}L + 999999L) DIV 1000000L"))
      .filter(col("cum") >= col("rank_k"))
      .withColumn("rn", row_number().over(wOrd))
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

  // -------------------------------------------------------------------
  // 11m. ts_ewma — exponentially weighted moving average (α = 1/2,
  // truncated at 16 points) in EXACT integers: weights are powers of
  // two, so ewma = Σ v_{n-j}·2^(15-j) DIV Σ 2^(15-j) needs no floats
  // and partial windows are exact (the denominator only counts present
  // terms). Expressed as 16 lag() terms inside ONE window pass per
  // series — the same single-shuffle shape as ts_moving_avg, and the
  // formulation DuckDB reproduces verbatim.
  // -------------------------------------------------------------------
  def ewma(spark: SparkSession, dir: String, span: Int = 16): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val base = eventsUs(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts_us"), cents(col("value")).as("value_c"))
    val lagged = (0 until span).foldLeft(base) { (df, j) =>
      df.withColumn(s"l$j", lag(col("value_c"), j).over(w))
    }
    val num = (0 until span)
      .map(j => coalesce(col(s"l$j"), lit(0L)) * lit(1L << (span - 1 - j)))
      .reduce(_ + _)
    val den = (0 until span)
      .map(j => when(col(s"l$j").isNotNull, lit(1L << (span - 1 - j))).otherwise(lit(0L)))
      .reduce(_ + _)
    lagged
      .withColumn("num", num)
      .withColumn("den", den)
      // operands are non-negative, so truncating DIV == DuckDB's floor //
      .withColumn("ewma_c", expr("num DIV den"))
      .select(col("event_id"), col("user_id"), col("ts_us"), col("value_c"), col("ewma_c"))
  }

  // -------------------------------------------------------------------
  // 11l. ts_topk_per_window — top-3 most active users per hour: the
  // per-window leaderboard every ops dashboard runs. rank() over
  // (hour, count desc) with the filter pushed into WindowGroupLimit,
  // so each shuffle partition keeps only its top candidates — never a
  // full per-hour sort of all users at 100 TB.
  // -------------------------------------------------------------------
  def topkPerWindow(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val hourly = eventsUs(spark, dir)
      .groupBy(expr(s"ts_us DIV ${HourUs}L").as("hour_id"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy(col("hour_id")).orderBy(col("n_events").desc, col("user_id").asc)
    hourly
      .withColumn("rnk", rank().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }

  // -------------------------------------------------------------------
  // 11g. ts_cross_corr — cross-series correlation per user: do clicks
  // and views move together hour-to-hour? Aggregates the two series
  // onto a shared hourly grid (hours where the user was active), then
  // emits EXACT INTEGER moment sums and the Pearson numerators
  // (n·Σxy−ΣxΣy, n·Σx²−(Σx)², n·Σy²−(Σy)²) — the caller divides;
  // the stored form is lossless, re-aggregable, and engine-exact
  // (float r would drift under partial aggregation). Two
  // partial-aggregable shuffles, no window.
  // -------------------------------------------------------------------
  def crossCorr(
      spark: SparkSession,
      dir: String,
      typeX: String = "click",
      typeY: String = "view"
  ): DataFrame = {
    val hourly = eventsUs(spark, dir)
      .groupBy(col("user_id"), expr(s"ts_us DIV ${HourUs}L").as("hour_id"))
      .agg(
        sum(when(col("event_type") === typeX, 1L).otherwise(0L)).as("x"),
        sum(when(col("event_type") === typeY, 1L).otherwise(0L)).as("y")
      )
    hourly
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy")
      )
      .select(
        col("user_id"),
        col("n"),
        col("sx"),
        col("sy"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("cov_num"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("varx_num"),
        (col("n") * col("syy") - col("sy") * col("sy")).as("vary_num")
      )
  }

  /** Lag-1 AUTOCORRELATION of each series' hourly sums — "does this
    * metric remember its last hour", the stationarity probe run before
    * any forecasting model. Same exact-integer discipline as
    * [[crossCorr]]: the (x[t-1], x[t]) pairs come from ONE window lag
    * over the hourly aggregate (tiny vs raw events), and the output is
    * the integer numerators of the Pearson formula — the caller (or
    * spec) does the one float sqrt at the very end.
    */
  def autocorr(spark: SparkSession, dir: String): DataFrame = {
    val hourly = eventsUs(spark, dir)
      .groupBy(col("user_id"), expr(s"ts_us DIV ${HourUs}L").as("hour_id"))
      .agg(sum(cents(col("value"))).as("v"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("hour_id"))
    hourly
      .withColumn("x", lag(col("v"), 1).over(w))
      .filter(col("x").isNotNull)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(col("x")).as("sx"),
        sum(col("v")).as("sy"),
        sum(col("x") * col("v")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("v") * col("v")).as("syy")
      )
      .select(
        col("user_id"),
        col("n_pairs"),
        (col("n_pairs") * col("sxy") - col("sx") * col("sy")).as("cov_num"),
        (col("n_pairs") * col("sxx") - col("sx") * col("sx")).as("varx_num"),
        (col("n_pairs") * col("syy") - col("sy") * col("sy")).as("vary_num")
      )
  }

  /** ts_ar_fit — YULE-WALKER AR(2) FIT of each series' hourly sums,
    * the closed-form forecast-coefficient estimate run before reaching
    * for heavier models ([[autocorr]] is its stationarity probe; this
    * is the fit). Over the lag-2-aligned support (both lags present),
    * exact integer covariance numerators c0/c1/c2 (the n·Σxy − ΣxΣy
    * Pearson form), autocorrelations r_k in micro, then the 2×2
    * Yule-Walker solve in micro arithmetic: φ1 = r1(1−r2)/(1−r1²),
    * φ2 = (r2−r1²)/(1−r1²) — every division the shared
    * truncate-toward-zero integral DIV both engines replay, zero
    * denominators clamped structurally (greatest(·,1): constant or
    * perfectly-correlated series degrade to a clamped ratio, not a
    * crash). Scale shape: one hourly pre-aggregate (map-side
    * combinable), ONE window pass per series for the two lags, one
    * per-series aggregate — the ts_autocorr single-shuffle shape; r's
    * are micro (≤1e6) so the YW products stay < 2⁶².
    */
  def arFit(spark: SparkSession, dir: String): DataFrame = {
    val hourly = eventsUs(spark, dir)
      .groupBy(col("user_id"), expr(s"ts_us DIV ${HourUs}L").as("v_hour"))
      .agg(sum(cents(col("value"))).as("v"))
    val wOrd = Window.partitionBy(col("user_id")).orderBy(col("v_hour"))
    hourly
      // mean-centered form: the n·Σxy − ΣxΣy numerators square the
      // series length into the magnitude and overflow the bp multiply
      // at the sf1.0 climb; centering first keeps every product
      // < 2⁶² with 10⁴× headroom. The truncated integer mean is a
      // defined, cross-engine-identical estimator choice.
      .withColumn("mean_v", expr("sum(v) OVER (PARTITION BY user_id) DIV count(v) OVER (PARTITION BY user_id)"))
      .withColumn("dx", col("v") - col("mean_v"))
      .withColumn("d1", lag(col("dx"), 1).over(wOrd))
      .withColumn("d2", lag(col("dx"), 2).over(wOrd))
      .filter(col("d2").isNotNull)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_obs"),
        sum(col("dx") * col("dx")).as("sdd"),
        sum(col("dx") * col("d1")).as("s1"),
        sum(col("dx") * col("d2")).as("s2")
      )
      .withColumn("r1_bp", expr("greatest(least(s1 * 10000 DIV greatest(sdd, 1L), 10000L), -10000L)"))
      .withColumn("r2_bp", expr("greatest(least(s2 * 10000 DIV greatest(sdd, 1L), 10000L), -10000L)"))
      .withColumn("yw_den", expr("greatest(100000000 - r1_bp * r1_bp, 1L)"))
      .withColumn("phi1_bp", expr("r1_bp * (10000 - r2_bp) * 10000 DIV yw_den"))
      .withColumn("phi2_bp", expr("(r2_bp * 10000 - r1_bp * r1_bp) * 10000 DIV yw_den"))
      .select(
        col("user_id"),
        col("n_obs"),
        col("sdd"),
        col("s1"),
        col("s2"),
        col("r1_bp"),
        col("r2_bp"),
        col("phi1_bp"),
        col("phi2_bp")
      )
  }

  /** ts_wavelet_haar — INTEGER HAAR WAVELET energy ledger of each
    * series' hourly sums: 3 unrolled lifting-scheme levels, where each
    * level pairs consecutive samples (by the series-relative index),
    * emits detail d = a − b and carries approx (a + b) DIV 2 up (odd
    * tails carry unchanged — the standard lifting convention). The
    * per-level detail energy Σd² is the compression planner's number:
    * a series whose energy collapses after level 1 is smooth enough
    * for aggressive downsampling/delta coding, one that stays flat is
    * noise (the reference's whole codec — timebox delta/width planning
    * — is a bet on exactly this spectrum shape). All integer: the
    * floor average is truncate-toward-zero in BOTH engines (DuckDB //
    * == Spark DIV), so the pyramid replays bit-identically. Scale
    * shape: one hourly pre-aggregate (map-side combinable), then per
    * level ONE partial-aggregable groupBy on (series, pair-index) —
    * each level HALVES the rows, so the 3-level pyramid costs less
    * than 2 passes over the hourly table; nothing unpartitioned,
    * nothing corpus-grain.
    */
  def waveletHaar(spark: SparkSession, dir: String, levels: Int = 3): DataFrame = {
    // the hourly aggregate feeds all `levels` union branches — persist
    // it so the raw-events scan runs ONCE, not once per level
    val hourly = eventsUs(spark, dir)
      .groupBy(col("user_id"), expr(s"ts_us DIV ${HourUs}L").as("hour_id"))
      .agg(sum(cents(col("value"))).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val w = Window.partitionBy(col("user_id")).orderBy(col("hour_id"))
    var cur = hourly
      .withColumn("idx", (row_number().over(w) - 1).cast("long"))
      .select(col("user_id"), col("idx"), col("v"))
    val perLevel = (1 to levels).map { l =>
      val paired = cur
        .groupBy(col("user_id"), expr("idx DIV 2").as("p"))
        .agg(
          max(when(expr("idx % 2 = 0"), col("v"))).as("a"),
          max(when(expr("idx % 2 = 1"), col("v"))).as("b")
        )
      cur = paired
        .select(
          col("user_id"),
          col("p").as("idx"),
          when(col("b").isNull, col("a")).otherwise(expr("(a + b) DIV 2")).as("v")
        )
      paired
        .filter(col("b").isNotNull)
        .withColumn("d", col("a") - col("b"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_details"), sum(col("d") * col("d")).as("energy"))
        .select(col("user_id"), lit(l.toLong).as("level"), col("n_details"), col("energy"))
    }
    Dedup.releaseAfterRun(spark, perLevel.reduce(_.unionByName(_)), Seq(hourly))
  }

  // -------------------------------------------------------------------
  // 12d. ts_retention — cohort retention: users grouped by first-seen
  // day, counted distinct on each later active day (the product-
  // analytics triangle). Cohort assignment is a min-over-series window
  // (one shuffle on user); the (cohort, offset) distinct-count is a
  // second shuffle whose volume is active (user, day) pairs — already
  // collapsed from raw events by the window pass's projection.
  // -------------------------------------------------------------------
  def retention(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
    eventsUs(spark, dir)
      .select(col("user_id"), expr(s"ts_us DIV ${DayUs}L").as("day_id"))
      .withColumn("cohort_day", min(col("day_id")).over(w))
      .groupBy(col("cohort_day"), (col("day_id") - col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  // -------------------------------------------------------------------
  // 12. ts_sessionize — gap-based sessions (>30 min silence starts a
  // new session). lag + running-sum windows share one partitioning
  // with the final per-session agg (hash(user_id) satisfies the
  // (user_id, session_seq) clustering), so the whole operator is a
  // single shuffle.
  // -------------------------------------------------------------------
  def sessionize(spark: SparkSession, dir: String, gapUs: Long = 30L * 60 * 1000000L): DataFrame = {
    val w = seriesW
    val cum = seriesW.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    eventsUs(spark, dir)
      .select(col("user_id"), col("ts_us"), col("event_id"))
      .withColumn(
        "is_new",
        when(col("ts_us") - lag(col("ts_us"), 1).over(w) > gapUs || lag(col("ts_us"), 1).over(w).isNull, 1L)
          .otherwise(0L)
      )
      .withColumn("session_seq", sum(col("is_new")).over(cum))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"),
        count(lit(1)).as("n_events")
      )
      .withColumn("duration_us", col("end_us") - col("start_us"))
  }

  // -------------------------------------------------------------------
  // 12b. ts_funnel — ordered funnel conversion per user:
  // view -> click -> purchase, each step strictly after the previous.
  // ONE window pass over the user's time-ordered events: a running
  // min(view ts) marks each click that strictly follows some view, a
  // running min over those qualifying clicks marks each purchase that
  // strictly follows a qualifying click, and a final conditional-min
  // aggregate (same user partitioning — no second exchange) picks the
  // step timestamps. One shuffle, one scan, O(events) state; per-user
  // step tables never materialize, so series cardinality (the axis
  // that explodes at 100 TB) costs nothing extra.
  //
  // Equivalence with the "first click after the FIRST view" spec: the
  // running view-min at a click equals the user's global first-view ts
  // whenever that first view precedes the click (smaller ts sorts
  // first), and the strict `<` comparison fails in exactly the same
  // tie cases the global formulation's `>` does.
  // -------------------------------------------------------------------
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy("user_id")
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    eventsUs(spark, dir)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("event_type"), col("ts_us"), col("event_id"))
      .withColumn("run_view", min(when(col("event_type") === "view", col("ts_us"))).over(w))
      .withColumn(
        "click_ok",
        when(col("event_type") === "click" && col("run_view") < col("ts_us"), col("ts_us"))
      )
      .withColumn("run_click", min(col("click_ok")).over(w))
      .withColumn(
        "purchase_ok",
        when(col("event_type") === "purchase" && col("run_click") < col("ts_us"), col("ts_us"))
      )
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "view", col("ts_us"))).as("view_raw"),
        min(col("click_ok")).as("click_raw"),
        min(col("purchase_ok")).as("purchase_raw")
      )
      .select(
        col("user_id"),
        coalesce(col("view_raw"), lit(-1L)).as("view_us"),
        coalesce(col("click_raw"), lit(-1L)).as("click_us"),
        coalesce(col("purchase_raw"), lit(-1L)).as("purchase_us"),
        (when(col("view_raw").isNotNull, 1L).otherwise(0L) +
          when(col("click_raw").isNotNull, 1L).otherwise(0L) +
          when(col("purchase_raw").isNotNull, 1L).otherwise(0L)).as("steps_completed")
      )
  }

  // -------------------------------------------------------------------
  // 13. ts_asof_join — latest click at-or-before each purchase, per
  // user. Spark has no ASOF join; the scalable plan is the union
  // trick: interleave both streams on one (user, time) ordering and
  // carry the last click time forward with a running max — ONE shuffle
  // total, versus a range-join's quadratic blowup. Clicks sort before
  // purchases at equal timestamps, matching ASOF's >= semantics.
  // -------------------------------------------------------------------
  def asofJoin(spark: SparkSession, dir: String): DataFrame =
    asofJoinRaw(spark, dir)
      .select(
        col("event_id"),
        col("user_id"),
        col("ts_us"),
        coalesce(col("click_ts_us"), lit(-1L)).as("click_ts_us")
      )

  /** The as-of pipeline with a NULLABLE no-match column — the -1
    * sentinel is applied only at the published edge (asofJoin) or
    * after the tolerance test (asofJoinTolerance): a `>= 0` test on
    * the sentinel would misread every real pre-epoch (negative)
    * timestamp as "no click".
    */
  private def asofJoinRaw(spark: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy("user_id")
      .orderBy(col("ts_us"), col("kind"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    eventsUs(spark, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(
        col("event_id"),
        col("user_id"),
        col("ts_us"),
        when(col("event_type") === "purchase", 1).otherwise(0).as("kind")
      )
      .withColumn("click_ts_us", max(when(col("kind") === 0, col("ts_us"))).over(w))
      .filter(col("kind") === 1)
      .select(col("event_id"), col("user_id"), col("ts_us"), col("click_ts_us"))
  }

  // -------------------------------------------------------------------
  // 13b. ts_asof_tolerance — the BOUNDED as-of join: latest click
  // at-or-before each purchase, but only within a tolerance window
  // (stale matches are worthless to attribution — a click from last
  // month did not drive today's purchase). Same single-shuffle
  // union+running-max plan as ts_asof_join: the running max carries
  // the LATEST prior click, and the latest prior click is inside the
  // window iff ANY admissible click is, so the tolerance is one
  // post-filter on the carried timestamp — never a range join.
  // -------------------------------------------------------------------
  def asofJoinTolerance(spark: SparkSession, dir: String, tolUs: Long = HourUs): DataFrame =
    asofJoinRaw(spark, dir)
      .select(
        col("event_id"),
        col("user_id"),
        col("ts_us"),
        coalesce(
          when(col("ts_us") - col("click_ts_us") <= tolUs, col("click_ts_us")),
          lit(-1L)
        ).as("click_ts_us")
      )

  /** ts_event_collapse — BURST COLLAPSE / idempotency-window dedup:
    * at-least-once delivery and alert storms both produce semantic
    * repeats; the standard fix keeps ONE event per (series, type,
    * minute window) — this operator is that pass's accounting: per
    * event type, events in vs events kept vs the collapse rate. The
    * kept representative is the deterministic (ts, event_id) minimum
    * of its window. Scale shape: ONE partial-aggregable groupBy onto
    * (series, type, minute) for the keep set, one bounded groupBy
    * onto the type enum for the report — no window function at all.
    */
  def eventCollapse(spark: SparkSession, dir: String, windowUs: Long = 60L * 1000000L): DataFrame =
    eventsUs(spark, dir)
      .select(col("user_id"), col("event_type"), expr(s"ts_us DIV ${windowUs}L").as("w"))
      .groupBy(col("event_type"), col("user_id"), col("w"))
      .agg(count(lit(1)).as("n_in"))
      .groupBy(col("event_type"))
      .agg(sum(col("n_in")).as("n_events"), count(lit(1)).as("n_kept"))
      .withColumn("collapse_bp", expr("(n_events - n_kept) * 10000 DIV n_events"))

  /** ts_backfill_plan — the BACKFILL planner: per series, the
    * day-grain coverage audit against its own active range — days
    * expected (min..max), days present, days missing, and the longest
    * contiguous missing stretch (the job a backfill scheduler sizes
    * shards by). Scale shape: one partial-aggregable day rollup, one
    * lag window over the day-grain table (bounded by active days, not
    * events), one per-series aggregate.
    */
  def backfillPlan(spark: SparkSession, dir: String): DataFrame = {
    val days = eventsUs(spark, dir)
      .groupBy(col("user_id"), expr(s"ts_us DIV ${DayUs}L").as("day_id"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day_id"))
    days
      .withColumn("prev_day", lag(col("day_id"), 1).over(w))
      .groupBy(col("user_id"))
      .agg(
        (max(col("day_id")) - min(col("day_id")) + 1L).as("n_days_expected"),
        count(lit(1)).as("n_days_present"),
        coalesce(max(col("day_id") - col("prev_day") - 1L), lit(0L)).as("longest_missing")
      )
      .withColumn("n_missing", col("n_days_expected") - col("n_days_present"))
      .select(
        col("user_id"),
        col("n_days_expected"),
        col("n_days_present"),
        col("n_missing"),
        col("longest_missing")
      )
  }

  /** ts_gap_intervals — the OUTAGE REPORT: every silence longer than
    * the threshold as a first-class interval row (series, gap start,
    * gap end, duration) — [[gapStats]] publishes the distribution,
    * this publishes the incidents an on-call reviews. One lag window
    * per series on the event stream, a row-local filter; emits only
    * the qualifying gaps.
    */
  def gapIntervals(spark: SparkSession, dir: String, minGapUs: Long = 2L * HourUs): DataFrame =
    eventsUs(spark, dir)
      .select(col("user_id"), col("ts_us"), col("event_id"))
      .withColumn("prev_ts", lag(col("ts_us"), 1).over(seriesW))
      .filter(col("prev_ts").isNotNull && col("ts_us") - col("prev_ts") > minGapUs)
      .select(
        col("user_id"),
        col("prev_ts").as("gap_start_us"),
        col("ts_us").as("gap_end_us"),
        (col("ts_us") - col("prev_ts")).as("gap_us")
      )

  /** ts_outage_mttr — the RELIABILITY LEDGER off the gap incidents
    * ([[gapIntervals]]'s aggregate face): per series, outage count,
    * total downtime, MTTR (mean outage duration), MTBF (mean uptime
    * between outages), and availability in basis points — the four
    * numbers every SLO review starts from, all exact rationals in the
    * epoch-us gaps (truncating DIV, no float). An outage is a
    * silence longer than `minGapUs` (the gap-intervals convention).
    * Plan: ONE lag window per series + one partial-aggregable
    * per-series aggregate — nothing beyond the series key ever
    * shuffles, the same shape at 100 TB.
    */
  def outageMttr(spark: SparkSession, dir: String, minGapUs: Long = 2L * HourUs): DataFrame =
    eventsUs(spark, dir)
      .select(col("user_id"), col("ts_us"), col("event_id"))
      .withColumn("prev_ts", lag(col("ts_us"), 1).over(seriesW))
      .withColumn(
        "gap",
        when(col("prev_ts").isNotNull && col("ts_us") - col("prev_ts") > minGapUs, col("ts_us") - col("prev_ts"))
          .otherwise(0L)
      )
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("gap") > 0L, 1L).otherwise(0L)).as("n_outages"),
        sum(col("gap")).as("downtime_us"),
        (max(col("ts_us")) - min(col("ts_us"))).as("span_us")
      )
      .select(
        col("user_id"),
        col("n_outages"),
        col("downtime_us"),
        col("span_us"),
        expr("downtime_us DIV greatest(n_outages, 1L)").as("mttr_us"),
        expr("(span_us - downtime_us) DIV greatest(n_outages, 1L)").as("mtbf_us"),
        expr("(span_us - downtime_us) * 10000 DIV greatest(span_us, 1L)").as("availability_bp")
      )

  /** ts_period_detect — DOMINANT SEASONALITY detection: per series,
    * the time-lag L ∈ [2, 25] hours maximizing the autocorrelation of
    * the hourly sums (the argmax of the ACF — the period every
    * seasonal model downstream should be configured with; ties to the
    * smallest lag). Lags are TIME lags (hour_id − L), not row lags, so
    * missing hours shrink the aligned support instead of silently
    * shifting it. Mean-centered with the truncated integer mean and
    * normalized by the full-series Σdx² (the standard ACF denominator)
    * — the ts_ar_fit headroom discipline, every product < 2⁶². Scale
    * shape: one hourly pre-aggregate, one 24-way row-local lag
    * explode, ONE (user, hour) equi-join of the exploded table back to
    * the hourly table, partial-aggregable sums per (series, lag), and
    * a max_by argmax per series — everything keyed on the series.
    */
  def periodDetect(spark: SparkSession, dir: String, minLag: Int = 2, maxLag: Int = 25): DataFrame = {
    val hourly = eventsUs(spark, dir)
      .groupBy(col("user_id"), expr(s"ts_us DIV ${HourUs}L").as("hour_id"))
      .agg(sum(cents(col("value"))).as("v"))
      .withColumn("mean_v", expr("sum(v) OVER (PARTITION BY user_id) DIV count(v) OVER (PARTITION BY user_id)"))
      .select(col("user_id"), col("hour_id"), (col("v") - col("mean_v")).as("dx"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sdd = hourly.groupBy(col("user_id")).agg(sum(col("dx") * col("dx")).as("sdd"))
    val lagged = hourly
      .withColumn("lag", explode(typedlit((minLag to maxLag).map(_.toLong))))
      .select(col("user_id"), (col("hour_id") - col("lag")).as("hour_id"), col("lag"), col("dx").as("dx_t"))
    val corr = lagged
      .join(hourly.select(col("user_id"), col("hour_id"), col("dx").as("dx_l")), Seq("user_id", "hour_id"))
      .groupBy(col("user_id"), col("lag"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("dx_t") * col("dx_l")).as("sxy"))
    val out = corr
      .join(sdd, Seq("user_id"))
      .withColumn("r_bp", expr("greatest(least(sxy * 10000 DIV greatest(sdd, 1L), 10000L), -10000L)"))
      .groupBy(col("user_id"))
      .agg(max_by(struct(col("lag"), col("r_bp"), col("n_pairs")), struct(col("r_bp"), -col("lag"))).as("best"))
      .select(
        col("user_id"),
        col("best.lag").as("best_lag"),
        col("best.r_bp").as("r_bp"),
        col("best.n_pairs").as("n_pairs")
      )
    Dedup.releaseAfterRun(spark, out, Seq(hourly))
  }

  // -------------------------------------------------------------------
  // 13c. ts_asof_nearest — the NEAREST-in-time as-of join: the click
  // closest to each purchase in EITHER direction (ties to the earlier
  // side — backward attribution wins at equal distance). Same
  // single-shuffle union-interleave plan as ts_asof_join, with TWO
  // frame passes over the one ordering: the running max of prior
  // click times (inclusive of same-timestamp clicks, which sort
  // before purchases) and the running min of following click times —
  // then nearest is a row-local arbitration. Never a range join, so
  // the plan is immune to the quadratic candidate blowup a |ts-diff|
  // join would pay at 100 TB.
  // -------------------------------------------------------------------
  def asofNearest(spark: SparkSession, dir: String): DataFrame = {
    val ord = Seq(col("ts_us"), col("kind"), col("event_id"))
    val wPrev = Window
      .partitionBy("user_id")
      .orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window
      .partitionBy("user_id")
      .orderBy(ord: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    eventsUs(spark, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(
        col("event_id"),
        col("user_id"),
        col("ts_us"),
        when(col("event_type") === "purchase", 1).otherwise(0).as("kind")
      )
      .withColumn("prev_ts", max(when(col("kind") === 0, col("ts_us"))).over(wPrev))
      .withColumn("next_ts", min(when(col("kind") === 0, col("ts_us"))).over(wNext))
      .filter(col("kind") === 1)
      .select(
        col("event_id"),
        col("user_id"),
        col("ts_us"),
        when(col("prev_ts").isNull && col("next_ts").isNull, lit(-1L))
          .when(col("next_ts").isNull, col("prev_ts"))
          .when(col("prev_ts").isNull, col("next_ts"))
          .when(col("ts_us") - col("prev_ts") <= col("next_ts") - col("ts_us"), col("prev_ts"))
          .otherwise(col("next_ts"))
          .as("click_ts_us")
      )
  }

  // -------------------------------------------------------------------
  // 14b. ts_interp_linear — gap-fill by linear interpolation between
  // observed hours (the other classic reconstruction next to LOCF).
  // Same span-explode shape as gapfillLocf — the window runs over
  // observed knots only, dense rows are generated from spans. The
  // interpolated value rounds an IEEE double expression that both
  // engines evaluate identically from exact integer inputs.
  // -------------------------------------------------------------------
  def interpLinear(spark: SparkSession, dir: String): DataFrame = {
    val ev = eventsUs(spark, dir)
      .select(
        col("user_id"),
        expr(s"ts_us DIV ${HourUs}L").as("hour_id"),
        col("ts_us"),
        col("event_id"),
        cents(col("value")).as("value_c")
      )
    val knots = ev
      .groupBy(col("user_id"), col("hour_id"))
      .agg(max_by(col("value_c"), struct(col("ts_us"), col("event_id"))).as("value_c"))
    val w = Window.partitionBy("user_id").orderBy("hour_id")
    knots
      .withColumn("next_h", lead(col("hour_id"), 1).over(w))
      .withColumn("next_v", lead(col("value_c"), 1).over(w))
      .select(
        col("user_id"),
        col("hour_id").as("h0"),
        col("value_c").as("v0"),
        col("next_h"),
        col("next_v"),
        explode(sequence(col("hour_id"), coalesce(col("next_h") - 1, col("hour_id")))).as("hour_id")
      )
      .select(
        col("user_id"),
        col("hour_id"),
        when(col("hour_id") === col("h0"), col("v0"))
          .otherwise(
            round(
              col("v0").cast("double") +
                (col("next_v") - col("v0")).cast("double") *
                ((col("hour_id") - col("h0")).cast("double") / (col("next_h") - col("h0")).cast("double"))
            ).cast("long")
          )
          .as("interp_c"),
        when(col("hour_id") === col("h0"), 1L).otherwise(0L).as("is_observed")
      )
  }

  // -------------------------------------------------------------------
  // 11c. ts_twa_daily — time-weighted average per user per day, the
  // canonical irregular-sampling aggregate (a plain mean over-weights
  // burst periods). Each observation holds its value until the next
  // one (LOCF weighting); the last observation of a day holds to the
  // day boundary. Emitted as exact integer numerator (value_c·µs) and
  // denominator (µs) — division is the caller's choice, the stored
  // form is lossless and re-aggregable.
  // -------------------------------------------------------------------
  def twaDaily(spark: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy(col("user_id"), col("day_id"))
      .orderBy(col("ts_us"), col("event_id"))
    eventsUs(spark, dir)
      .select(
        col("user_id"),
        expr(s"ts_us DIV ${DayUs}L").as("day_id"),
        col("ts_us"),
        col("event_id"),
        cents(col("value")).as("value_c")
      )
      .withColumn(
        "hold_us",
        coalesce(lead(col("ts_us"), 1).over(w), (col("day_id") + 1) * DayUs) - col("ts_us")
      )
      .groupBy(col("user_id"), col("day_id"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value_c") * col("hold_us")).as("twa_num"),
        ((col("day_id") + 1) * DayUs - min(col("ts_us"))).as("twa_den")
      )
  }

  // -------------------------------------------------------------------
  // 11b. ts_percentiles — exact p50/p90/p99 per event type by the
  // rank formula (k-th smallest, k = ceil(p*n)): deterministic in any
  // engine, no interpolation-convention ambiguity.
  //
  // Scale shape: values are fixed-point integer cents, so the exact
  // rank comes from a VALUE HISTOGRAM — groupBy(event_type, value_c)
  // is fully partial-aggregable (map-side combine collapses each
  // partition to its distinct values before the shuffle), and the only
  // sort is the cumulative-count window over the tiny per-group
  // histogram (bounded by distinct values, not row count). The k-th
  // smallest is the histogram bin whose cumulative count first reaches
  // k. The raw event stream is never sorted and never funnels through
  // one partition per group — the failure mode of a rank window over
  // 100 TB with 5 event types.
  // -------------------------------------------------------------------
  def percentiles(spark: SparkSession, dir: String, ps: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame = {
    val hist = eventsUs(spark, dir)
      .groupBy(col("event_type"), cents(col("value")).as("value_c"))
      .agg(count(lit(1)).as("cnt"))
    val wCum = Window
      .partitionBy("event_type")
      .orderBy(col("value_c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy("event_type")))
    val picks = ps.map { p =>
      val k = ceil(lit(p) * col("n"))
      max(when(k > col("cum") - col("cnt") && k <= col("cum"), col("value_c")))
        .as(s"p${(p * 100).toInt}_c")
    }
    cum
      .groupBy(col("event_type"))
      .agg(first(col("n")).as("n"), picks: _*)
  }

  /** The continuous-value 100 TB path behind [[percentiles]]: when
    * values are not fixed-point (unbounded distinct values, so the
    * exact histogram can't stay small), `approx_percentile` keeps a
    * bounded Greenwald-Khanna sketch per group — fixed-size partial
    * aggregate, no sort anywhere. Rank error is bounded by
    * n/accuracy; no SQL oracle (sketch results are engine-specific) —
    * the rank-error bound is spec-asserted against the exact answer
    * instead, mirroring groupDistinctApprox.
    */
  def percentilesApprox(
      spark: SparkSession,
      dir: String,
      ps: Seq[Double] = Seq(0.5, 0.9, 0.99),
      accuracy: Int = 10000
  ): DataFrame = {
    val pArr = ps.map(p => lit(p))
    eventsUs(spark, dir)
      .select(col("event_type"), cents(col("value")).as("value_c"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        percentile_approx(col("value_c"), array(pArr: _*), lit(accuracy)).as("approx_c")
      )
  }

  // -------------------------------------------------------------------
  // 14. ts_gapfill_locf — dense hourly grid per user +
  // last-observation-carried-forward. Grid generation is
  // sequence+explode per series (no driver-side loop); LOCF is an
  // ignore-nulls last() over the series ordering. Leading holes (before
  // the first observation) stay at -1.
  // -------------------------------------------------------------------
  def gapfillLocf(spark: SparkSession, dir: String): DataFrame = {
    val ev = eventsUs(spark, dir)
      .select(
        col("user_id"),
        expr(s"ts_us DIV ${HourUs}L").as("hour_id"),
        col("ts_us"),
        col("event_id"),
        cents(col("value")).as("value_c")
      )
    // last observation within each hour — max_by over the deterministic
    // (ts, event_id) order: a hash aggregate with map-side combine, not
    // a window sort over the full event stream.
    val hourly = ev
      .groupBy(col("user_id"), col("hour_id"))
      .agg(max_by(col("value_c"), struct(col("ts_us"), col("event_id"))).as("value_c"))
    // LOCF as span-explode: each observed hour is valid until the next
    // observed hour. The window (lead) runs over OBSERVED hours only;
    // dense grid rows are generated directly from the spans. The grid
    // spans [min observed, max observed] hour, so every grid row falls
    // inside exactly one span — no join against the dense grid, no
    // window over the exploded rows. At 100 TB the shuffled/sorted
    // volume is the observation count, never the (much larger) grid.
    val w = Window.partitionBy("user_id").orderBy("hour_id")
    hourly
      .withColumn("next_h", lead(col("hour_id"), 1).over(w))
      .select(
        col("user_id"),
        col("hour_id").as("obs_hour"),
        col("value_c"),
        explode(sequence(col("hour_id"), coalesce(col("next_h") - 1, col("hour_id")))).as("hour_id")
      )
      .select(
        col("user_id"),
        col("hour_id"),
        col("value_c"),
        when(col("hour_id") === col("obs_hour"), 1L).otherwise(0L).as("is_observed")
      )
  }

  // -------------------------------------------------------------------
  // 11n. ts_linear_trend — per-series least-squares trend (the PromQL
  // deriv()/predict_linear() core): slope of value over time from the
  // five classic sums (n, Σx, Σy, Σxy, Σx²), all exact integers.
  //
  // Numerics are the design point. x is the series-RELATIVE hour index
  // (hour_id − min hour_id per series, a window min over the same
  // partition key the aggregate uses — Catalyst reuses one shuffle), so
  // the long sums stay small no matter where in epoch time the data
  // lives; the two final cross products n·Σxy − Σx·Σy and n·Σx² − (Σx)²
  // are DECIMAL(38,0) — at 10^9 points/series n·Σxy needs ~10^25, past
  // long range but comfortably inside 38 digits (DuckDB mirrors with
  // HUGEINT). Slope is published in micro-cents/hour via integral
  // division; Spark DIV and DuckDB // both truncate toward zero, so
  // negative slopes agree bit-for-bit. Flat or single-point series
  // (den = 0) report slope 0 rather than NULL so the result stays a
  // total function of the input.
  //
  // Scale shape: ONE shuffle on the series key; the window carries no
  // ordering (partition min), the aggregate is partial-aggregable, and
  // the output is one row per series.
  // -------------------------------------------------------------------
  def linearTrend(spark: SparkSession, dir: String): DataFrame = {
    val wMin = Window.partitionBy("user_id")
    eventsUs(spark, dir)
      .select(
        col("user_id"),
        expr(s"ts_us DIV ${HourUs}L").as("hour_id"),
        cents(col("value")).as("value_c")
      )
      .withColumn("x", col("hour_id") - min(col("hour_id")).over(wMin))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_points"),
        sum(col("x")).as("sx"),
        sum(col("value_c")).as("sy"),
        sum(col("x") * col("value_c")).as("sxy"),
        sum(col("x") * col("x")).as("sxx")
      )
      .select(
        col("user_id"),
        col("n_points"),
        expr("CAST(n_points AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy")
          .as("num"),
        expr("CAST(n_points AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx")
          .as("den")
      )
      .select(
        col("user_id"),
        col("n_points"),
        expr("CAST(num AS BIGINT)").as("slope_num_c"),
        expr("CAST(den AS BIGINT)").as("slope_den"),
        expr(
          "CASE WHEN den = 0 THEN CAST(0 AS BIGINT) " +
            "ELSE CAST((num * 1000000) DIV den AS BIGINT) END"
        ).as("slope_micro_c_per_hour")
      )
  }

  // -------------------------------------------------------------------
  // 11o. ts_burn_rate — SLO error-budget burn rate with MULTI-WINDOW
  // alerting (the SRE-workbook shape): per series, per active hour, the
  // error fraction over a trailing short window (6 h) AND a trailing
  // long window (24 h); the alert fires only when BOTH windows burn
  // faster than the 5 % budget — short window for responsiveness, long
  // window so a transient blip can't page.
  //
  // Scale shape: the rolling windows run over the per-(series, hour)
  // COUNTER table (one partial-aggregable shuffle from raw events;
  // ≤ 24·days rows per series), never the raw event stream — the same
  // histogram-first discipline as ts_percentiles. RANGE frames on the
  // integer hour index handle silent hours exactly (a series with gaps
  // still gets true trailing-time windows). Budget comparisons are
  // cross-multiplied (err·20 > total), so everything stays integer.
  // -------------------------------------------------------------------
  def burnRate(spark: SparkSession, dir: String): DataFrame = {
    val hourly = eventsUs(spark, dir)
      .groupBy(col("user_id"), expr(s"ts_us DIV ${HourUs}L").as("hour_id"))
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_err")
      )
    val ord = Window.partitionBy("user_id").orderBy(col("hour_id"))
    val w6  = ord.rangeBetween(-5L, 0L)
    val w24 = ord.rangeBetween(-23L, 0L)
    hourly
      .select(
        col("user_id"),
        col("hour_id"),
        sum(col("n_err")).over(w6).as("err_6h"),
        sum(col("n_total")).over(w6).as("tot_6h"),
        sum(col("n_err")).over(w24).as("err_24h"),
        sum(col("n_total")).over(w24).as("tot_24h")
      )
      .withColumn(
        "alert",
        when(col("err_6h") * 20L > col("tot_6h") && col("err_24h") * 20L > col("tot_24h"), 1L)
          .otherwise(0L)
      )
  }

  // -------------------------------------------------------------------
  // 11p. ts_step_detect — sustained LEVEL-SHIFT detection per series:
  // the two-sided edge filter (mean of the W points before vs the W
  // points at-and-after each position) that finds deploys/config flips
  // `ts_changepoint` (single global argmax) and `ts_anomaly_zscore`
  // (point outliers vs trailing window) don't. Full two-sided windows
  // only (no edge effects), shift fires when the means differ by more
  // than the threshold — compared CROSS-MULTIPLIED in cents so the
  // whole pass is integer-exact. One window pass sharing the one
  // series shuffle; emits only flagged rows.
  // -------------------------------------------------------------------
  def stepDetect(spark: SparkSession, dir: String, w: Int = 8, threshC: Long = 300L): DataFrame = {
    val left  = seriesW.rowsBetween(-w, -1)
    val right = seriesW.rowsBetween(0, w - 1)
    eventsUs(spark, dir)
      .select(col("user_id"), col("ts_us"), col("event_id"), cents(col("value")).as("v_c"))
      .withColumn("l_sum", sum(col("v_c")).over(left))
      .withColumn("l_n", count(lit(1)).over(left))
      .withColumn("r_sum", sum(col("v_c")).over(right))
      .withColumn("r_n", count(lit(1)).over(right))
      .filter(col("l_n") === w && col("r_n") === w)
      // |r_mean − l_mean| > thresh ⟺ |r_sum·l_n − l_sum·r_n| > thresh·l_n·r_n
      .filter(abs(col("r_sum") * col("l_n") - col("l_sum") * col("r_n")) > threshC * w.toLong * w.toLong)
      .select(
        col("user_id"),
        col("ts_us"),
        col("event_id"),
        col("l_sum"),
        col("r_sum"),
        (col("r_sum") - col("l_sum")).as("shift_sum_c")
      )
  }

  // -------------------------------------------------------------------
  // 11q. ts_path_transitions — behavioral path analysis: the
  // event-type TRANSITION MATRIX (from → next-within-series) with
  // per-origin probabilities in basis points — the "what do users do
  // next" primitive funnels are built from. One lead() over the
  // series order (shared series shuffle), then a partial-aggregable
  // groupBy on a |types|² key space; probabilities by integer division
  // against a window over the tiny aggregate.
  // -------------------------------------------------------------------
  def pathTransitions(spark: SparkSession, dir: String): DataFrame = {
    eventsUs(spark, dir)
      .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(seriesW))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p_bp", expr("n * 10000 DIV sum(n) OVER (PARTITION BY from_type)"))
      .select(col("from_type"), col("to_type"), col("n"), col("p_bp"))
  }

  // -------------------------------------------------------------------
  // 11r. ts_forecast_snaive — seasonal-naive forecast BACKTEST: the
  // sanity baseline every forecasting system is judged against
  // (predict each hour's level by the same hour yesterday) scored as
  // per-series MAE. Hourly floor-div means in cents (deterministic),
  // self-aligned by lag over each (series, hour-of-day) day sequence,
  // consecutive-day pairs only; error stays an integer numerator with
  // a micro-scaled mean. Two shuffles total: the hourly rollup and
  // the (series, hour-of-day) window — both on aggregates, never raw
  // events twice.
  // -------------------------------------------------------------------
  def forecastSnaive(spark: SparkSession, dir: String): DataFrame = {
    val wd = Window
      .partitionBy(col("user_id"), col("hour_of_day"))
      .orderBy(col("day_id"))
    eventsUs(spark, dir)
      .select(
        col("user_id"),
        expr(s"ts_us DIV ${DayUs}L").as("day_id"),
        expr(s"(ts_us DIV ${HourUs}L) % 24").as("hour_of_day"),
        cents(col("value")).as("v_c")
      )
      .groupBy(col("user_id"), col("day_id"), col("hour_of_day"))
      .agg(sum(col("v_c")).as("s"), count(lit(1)).as("n"))
      .withColumn("mean_c", expr("(s - pmod(s, n)) DIV n")) // floor(s/n), any sign
      .withColumn("prev_mean_c", lag(col("mean_c"), 1).over(wd))
      .withColumn("prev_day", lag(col("day_id"), 1).over(wd))
      .filter(col("prev_day") === col("day_id") - 1)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(abs(col("mean_c") - col("prev_mean_c"))).as("mae_num_c")
      )
      .withColumn("mae_micro", expr("mae_num_c * 1000000 DIV n_pairs"))
  }

  /** ts_anomaly_snaive — anomaly detection against the SEASONAL-NAIVE
    * BACKTEST residuals: a (series, hour-of-day) consecutive-day pair
    * is anomalous when its residual exceeds k× the series' own mean
    * absolute residual — the detector calibrated by the forecast
    * baseline itself ([[forecastSnaive]] publishes that baseline; this
    * flags against it). The threshold comparison is CROSS-MULTIPLIED
    * (|resid|·n_pairs > k·Σ|resid|), so no division ever runs and the
    * flag is exact integer arithmetic. Scale shape: the same hourly
    * rollup + (series, hour-of-day) lag window as the backtest, one
    * extra unordered per-series window for the totals, one final
    * per-series aggregate — all on the tiny pair table.
    */
  def anomalySnaive(spark: SparkSession, dir: String, k: Long = 5L): DataFrame = {
    val wd = Window
      .partitionBy(col("user_id"), col("hour_of_day"))
      .orderBy(col("day_id"))
    val wu = Window.partitionBy(col("user_id"))
    eventsUs(spark, dir)
      .select(
        col("user_id"),
        expr(s"ts_us DIV ${DayUs}L").as("day_id"),
        expr(s"(ts_us DIV ${HourUs}L) % 24").as("hour_of_day"),
        cents(col("value")).as("v_c")
      )
      .groupBy(col("user_id"), col("day_id"), col("hour_of_day"))
      .agg(sum(col("v_c")).as("s"), count(lit(1)).as("n"))
      .withColumn("mean_c", expr("(s - pmod(s, n)) DIV n"))
      .withColumn("prev_mean_c", lag(col("mean_c"), 1).over(wd))
      .withColumn("prev_day", lag(col("day_id"), 1).over(wd))
      .filter(col("prev_day") === col("day_id") - 1)
      .withColumn("resid", abs(col("mean_c") - col("prev_mean_c")))
      .withColumn("n_pairs", count(lit(1)).over(wu))
      .withColumn("mae_num_c", sum(col("resid")).over(wu))
      .withColumn("flag", when(col("resid") * col("n_pairs") > lit(k) * col("mae_num_c"), 1L).otherwise(0L))
      .groupBy(col("user_id"))
      .agg(
        max(col("n_pairs")).as("n_pairs"),
        max(col("mae_num_c")).as("mae_num_c"),
        sum(col("flag")).as("n_anomalies"),
        max(col("resid")).as("max_abs_resid_c")
      )
      .withColumn("mae_micro", expr("mae_num_c * 1000000 DIV n_pairs"))
      .select(
        col("user_id"),
        col("n_pairs"),
        col("mae_micro"),
        col("n_anomalies"),
        col("max_abs_resid_c")
      )
  }

  // -------------------------------------------------------------------
  // 11s. ts_anomaly_seasonal — anomaly vs the SEASONAL baseline: score
  // each point against its (event_type, day-of-week, hour-of-day)
  // profile mean instead of a trailing window — the detector that
  // catches "normal for 3am, anomalous for 3pm" which rolling z-score
  // structurally cannot. Two scans by design (the profile is built
  // from history; in production it's a materialized table), profile
  // joined back as a BROADCAST (7·24·|types| rows at any corpus
  // size); floor-div baseline mean, integer residual, emits flagged
  // rows only.
  // -------------------------------------------------------------------
  def anomalySeasonal(spark: SparkSession, dir: String, threshC: Long = 800L): DataFrame = {
    val e = eventsUs(spark, dir)
      .select(
        col("event_id"),
        col("user_id"),
        col("ts_us"),
        col("event_type"),
        expr(s"(ts_us DIV ${DayUs}L + 4) % 7").as("day_of_week"),
        expr(s"(ts_us DIV ${HourUs}L) % 24").as("hour_of_day"),
        cents(col("value")).as("v_c")
      )
    val prof = e
      .groupBy(col("event_type"), col("day_of_week"), col("hour_of_day"))
      .agg(sum(col("v_c")).as("s"), count(lit(1)).as("n"))
      .select(
        col("event_type"),
        col("day_of_week"),
        col("hour_of_day"),
        expr("(s - pmod(s, n)) DIV n").as("base_mean_c")
      )
    e.join(broadcast(prof), Seq("event_type", "day_of_week", "hour_of_day"))
      .withColumn("resid_c", col("v_c") - col("base_mean_c"))
      .filter(abs(col("resid_c")) > threshC)
      .select(
        col("event_id"),
        col("user_id"),
        col("ts_us"),
        col("event_type"),
        col("v_c"),
        col("base_mean_c"),
        col("resid_c")
      )
  }

  // -------------------------------------------------------------------
  // 11u. ts_stl_decompose — STL-style additive decomposition in EXACT
  // integers: level = per-(series, hour) floor-mean cents, trend =
  // centered ±12-row moving mean over the series' hourly sequence,
  // seasonal = per-(series, hour-of-day) truncated mean of the
  // DETRENDED level, residual = level − trend − seasonal. Negative
  // numerators are safe: Spark's DIV and DuckDB's // both truncate
  // toward zero, so the means are bit-identical across engines
  // without any floor gymnastics. Two shuffles (hourly rollup +
  // the series window; the seasonal profile joins back broadcast-
  // sized per series×24).
  // -------------------------------------------------------------------
  def stlDecompose(spark: SparkSession, dir: String): DataFrame = {
    val hourly = eventsUs(spark, dir)
      .select(col("user_id"), expr(s"ts_us DIV ${HourUs}L").as("hour_id"), cents(col("value")).as("v_c"))
      .groupBy(col("user_id"), col("hour_id"))
      .agg(sum(col("v_c")).as("s"), count(lit(1)).as("n"))
      .select(col("user_id"), col("hour_id"), expr("s DIV n").as("level_c")) // sums non-negative
    val wTrend = Window
      .partitionBy("user_id")
      .orderBy("hour_id")
      .rowsBetween(-12, 12)
    val trended = hourly
      .withColumn("ts_sum", sum(col("level_c")).over(wTrend))
      .withColumn("ts_n", count(lit(1)).over(wTrend))
      .withColumn("trend_c", expr("ts_sum DIV ts_n")) // level sums non-negative
      .withColumn("det_c", col("level_c") - col("trend_c"))
      .withColumn("hod", expr("hour_id % 24"))
    val seasonal = trended
      .groupBy(col("user_id"), col("hod"))
      .agg(sum(col("det_c")).as("ds"), count(lit(1)).as("dn"))
      // detrended sums CAN be negative — fine: Spark's DIV and
      // DuckDB's // both truncate toward zero (verified -7÷2 = -3)
      .select(col("user_id"), col("hod"), expr("ds DIV dn").as("seasonal_c"))
    trended
      .join(seasonal, Seq("user_id", "hod"))
      .select(
        col("user_id"),
        col("hour_id"),
        col("hod"),
        col("level_c"),
        col("trend_c"),
        col("seasonal_c"),
        (col("level_c") - col("trend_c") - col("seasonal_c")).as("resid_c")
      )
  }

  // -------------------------------------------------------------------
  // ts_stl_strength — SEASONALITY/TREND STRENGTH off the STL
  // components (Hyndman's F_s / F_t): per series,
  // F = max(0, 1 − Var(resid)/Var(component + resid)) in bp — the
  // forecastability TRIAGE that decides which of 10M series deserve a
  // seasonal model before anyone fits one. Integer-exact: variances
  // compare as the division-free numerators n·Σx² − (Σx)² (their n's
  // cancel in the ratio), scaled through DECIMAL(38,0) so the ×10000
  // can't overflow long; trunc division both engines share. One
  // series-grain aggregate over the stl rows — no new shuffle beyond
  // the decomposition's own.
  // -------------------------------------------------------------------
  def stlStrength(spark: SparkSession, dir: String): DataFrame =
    stlDecompose(spark, dir)
      .select(
        col("user_id"),
        col("resid_c").as("r"),
        (col("seasonal_c") + col("resid_c")).as("sr"),
        (col("trend_c") + col("resid_c")).as("tr")
      )
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_hours"),
        sum(col("r")).as("s_r"),
        sum(expr("r * r")).as("ss_r"),
        sum(col("sr")).as("s_sr"),
        sum(expr("sr * sr")).as("ss_sr"),
        sum(col("tr")).as("s_tr"),
        sum(expr("tr * tr")).as("ss_tr")
      )
      .select(
        col("user_id"),
        col("n_hours"),
        expr(
          "greatest(0L, 10000L - CAST(CAST(n_hours * ss_r - s_r * s_r AS DECIMAL(38,0)) * 10000" +
            " DIV CAST(greatest(n_hours * ss_sr - s_sr * s_sr, 1L) AS DECIMAL(38,0)) AS BIGINT))"
        ).as("season_strength_bp"),
        expr(
          "greatest(0L, 10000L - CAST(CAST(n_hours * ss_r - s_r * s_r AS DECIMAL(38,0)) * 10000" +
            " DIV CAST(greatest(n_hours * ss_tr - s_tr * s_tr, 1L) AS DECIMAL(38,0)) AS BIGINT))"
        ).as("trend_strength_bp")
      )

  // -------------------------------------------------------------------
  // 11t. ts_rollup_cascade — the continuous-aggregate CASCADE every
  // production TSDB materializes: minute → hour → day rollups where
  // each level aggregates the PREVIOUS level, never raw points (count/
  // sum/min/max all re-aggregate losslessly). The minute and hour
  // tables are persisted so the cascade computes each level exactly
  // once — one raw scan total; the coarser levels shuffle aggregate
  // rows, orders of magnitude below point count. At 100 TB these are
  // incremental materialized tables; the operator is the batch seed.
  // -------------------------------------------------------------------
  def rollupCascade(spark: SparkSession, dir: String): DataFrame = {
    val MinUs = 60L * 1000000L
    val m1 = eventsUs(spark, dir)
      .select(col("user_id"), expr(s"ts_us DIV ${MinUs}L").as("b1m"), cents(col("value")).as("v"))
      .groupBy(col("user_id"), col("b1m"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_c"), min(col("v")).as("min_c"), max(col("v")).as("max_c"))
      .persist()
    val h1 = m1
      .groupBy(col("user_id"), expr("b1m DIV 60").as("b1h"))
      .agg(sum(col("n")).as("n"), sum(col("sum_c")).as("sum_c"), min(col("min_c")).as("min_c"), max(col("max_c")).as("max_c"))
      .persist()
    val d1 = h1
      .groupBy(col("user_id"), expr("b1h DIV 24").as("b1d"))
      .agg(sum(col("n")).as("n"), sum(col("sum_c")).as("sum_c"), min(col("min_c")).as("min_c"), max(col("max_c")).as("max_c"))
    val out = m1
      .select(
        lit("1m").as("level"),
        col("user_id"),
        (col("b1m") * MinUs).as("bucket_start_us"),
        col("n"), col("sum_c"), col("min_c"), col("max_c")
      )
      .unionByName(
        h1.select(
          lit("1h").as("level"),
          col("user_id"),
          (col("b1h") * HourUs).as("bucket_start_us"),
          col("n"), col("sum_c"), col("min_c"), col("max_c")
        )
      )
      .unionByName(
        d1.select(
          lit("1d").as("level"),
          col("user_id"),
          (col("b1d") * DayUs).as("bucket_start_us"),
          col("n"), col("sum_c"), col("min_c"), col("max_c")
        )
      )
    Dedup.releaseAfterRun(spark, out, Seq(m1, h1))
  }

  // -------------------------------------------------------------------
  // 13c. ts_range_join — the general INTERVAL JOIN Spark lacks as a
  // native operator: every event inside each incident window
  // [anchor_ts, anchor_ts + 600 s) of the same user (windows = high-
  // severity errors, value >= 9.00). A literal `ON e.ts BETWEEN w.s
  // AND w.e` non-equi join plans as a nested loop — the 100 TB
  // killer — so this re-expresses it as a BUCKETED EQUI-JOIN: time is
  // quantized into window-length buckets, a window overlaps at most 2
  // buckets (explode(sequence) — row-local, bounded), the join runs on
  // (user_id, bucket) through the ordinary hash machinery, and the
  // exact range predicate is a residual filter AFTER the equi match.
  // Pair work is bounded by per-(user, bucket) co-occurrence — never
  // |events| × |windows|. The window side is anchor-derived and small;
  // Spark broadcasts it, and at 1000-executor scale the same plan
  // shuffles both sides on the bucket key — no skew beyond the data's
  // own per-user hot windows.
  // -------------------------------------------------------------------
  def rangeJoin(
      spark: SparkSession,
      dir: String,
      windowUs: Long = 600L * 1000000L,
      minCents: Long = 900L
  ): DataFrame = {
    val ev = eventsUs(spark, dir).select(
      col("event_id"),
      col("user_id"),
      col("ts_us"),
      col("event_type"),
      cents(col("value")).as("value_c")
    )
    val windows = ev
      .filter(col("event_type") === "error" && col("value_c") >= minCents)
      .select(
        col("event_id").as("window_id"),
        col("user_id").as("w_user"),
        col("ts_us").as("start_us")
      )
      // a [s, s + W) window overlaps buckets s DIV W .. (s + W − 1) DIV W:
      // at most two — the explode is bounded and row-local
      .withColumn(
        "w_bucket",
        explode(
          expr(s"sequence(start_us DIV ${windowUs}L, (start_us + ${windowUs}L - 1) DIV ${windowUs}L)")
        )
      )
    ev
      .withColumn("bucket", expr(s"ts_us DIV ${windowUs}L"))
      .join(
        windows,
        col("user_id") === col("w_user") && col("bucket") === col("w_bucket") &&
          col("ts_us") >= col("start_us") && col("ts_us") < col("start_us") + lit(windowUs),
        "inner"
      )
      .groupBy(col("window_id"), col("w_user").as("user_id"), col("start_us"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value_c")).as("sum_value_c"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_error")
      )
  }

  // -------------------------------------------------------------------
  // 11x. ts_benford — first-significant-digit audit per event type:
  // the classic Benford screen for fabricated / unit-drifted metric
  // feeds. Strictly-positive cents only (sign and zero carry no
  // leading digit), leading digit via the decimal string head —
  // engine-exact. Output is the ≤9-row digit distribution per type
  // with basis-point shares: one partial-aggregable groupBy on a
  // |types|×9 key space, then the share window over that bounded
  // aggregate — the scan is the whole cost at any corpus size.
  // -------------------------------------------------------------------
  def benford(spark: SparkSession, dir: String): DataFrame = {
    eventsUs(spark, dir)
      .select(col("event_type"), cents(col("value")).as("v_c"))
      .filter(col("v_c") > 0)
      .withColumn("d1", substring(col("v_c").cast("string"), 1, 1).cast("long"))
      .groupBy(col("event_type"), col("d1"))
      .agg(count(lit(1)).as("n"))
      .withColumn("share_bp", expr("n * 10000 DIV sum(n) OVER (PARTITION BY event_type)"))
  }

  // -------------------------------------------------------------------
  // 11y. ts_drawdown — per-series maximum drawdown of the cumulative
  // value path (the running-peak-minus-current gauge SLO/finance
  // dashboards track): cum = running sum of cents, peak = running max
  // of cum, drawdown = peak − cum. Both running frames share the ONE
  // series shuffle (same partition + order), and the final per-series
  // aggregate reuses that partitioning — a single shuffle end to end,
  // all integer-exact.
  // -------------------------------------------------------------------
  def drawdown(spark: SparkSession, dir: String): DataFrame = {
    val wRun = seriesW.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    eventsUs(spark, dir)
      .select(col("user_id"), col("ts_us"), col("event_id"), cents(col("value")).as("v_c"))
      .withColumn("cum_c", sum(col("v_c")).over(wRun))
      .withColumn("peak_c", max(col("cum_c")).over(wRun))
      .withColumn("dd_c", col("peak_c") - col("cum_c"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_points"),
        max(col("peak_c")).as("max_peak_c"),
        max(col("dd_c")).as("max_drawdown_c"),
        sum(when(col("dd_c") > 0, 1L).otherwise(0L)).as("n_underwater")
      )
  }

  // -------------------------------------------------------------------
  // 11z. ts_holt_linear — Holt double-exponential smoothing (level +
  // trend) per series over the hourly means, α = β = 1/2 with
  // TRUNCATING integer halving so both engines recurse to the same
  // integers (Spark DIV and DuckDB // both truncate toward zero —
  // verified on negatives; the recursion's l+b−x deltas DO go
  // negative, so a floor/trunc mix would drift one cent per step).
  //   l₀ = m₀, b₀ = 0;  lₜ = trunc((mₜ + lₜ₋₁ + bₜ₋₁)/2),
  //   bₜ = trunc((lₜ − lₜ₋₁ + bₜ₋₁)/2),  eₜ = eₜ₋₁ + |lₜ₋₁ + bₜ₋₁ − mₜ|.
  // The recursion is inherently sequential per series, so it runs as
  // ONE aggregate() fold over the series' sorted hour array — state
  // bounded by the backtest window (hours of retention), never by
  // corpus size; the hourly rollup is the only raw-event shuffle and
  // the fold reuses its partitioning. Emits final level/trend, the
  // one-step-ahead forecast, and the cumulative one-step SAE.
  // -------------------------------------------------------------------
  def holtLinear(spark: SparkSession, dir: String): DataFrame = {
    // trunc((y)/2) for any sign, duplicated inline because SQL lambda
    // bodies cannot let-bind
    def fd2(y: String) = s"($y) DIV 2"
    val lNew = fd2("x + acc.l + acc.b")
    val fold =
      s"""aggregate(
         |  slice(ms, 2, greatest(size(ms) - 1, 0)),
         |  named_struct('l', ms[0], 'b', CAST(0 AS BIGINT), 'e', CAST(0 AS BIGINT)),
         |  (acc, x) -> named_struct(
         |    'l', $lNew,
         |    'b', ${fd2(s"($lNew) - acc.l + acc.b")},
         |    'e', acc.e + abs(acc.l + acc.b - x)))""".stripMargin
    eventsUs(spark, dir)
      .select(col("user_id"), expr(s"ts_us DIV ${HourUs}L").as("hour_id"), cents(col("value")).as("v"))
      .groupBy(col("user_id"), col("hour_id"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      .withColumn("mean_c", expr("s DIV n")) // trunc, matching the oracle's //
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_hours"),
        sort_array(collect_list(struct(col("hour_id"), col("mean_c")))).as("hm")
      )
      .withColumn("ms", expr("transform(hm, p -> p.mean_c)"))
      .withColumn("st", expr(fold))
      .select(
        col("user_id"),
        col("n_hours"),
        col("st.l").as("level_c"),
        col("st.b").as("trend_c"),
        (col("st.l") + col("st.b")).as("forecast_c"),
        col("st.e").as("sae_c")
      )
  }

  // -------------------------------------------------------------------
  // 11z3. ts_holt_winters — additive HOLT-WINTERS (level + trend +
  // 24-hour seasonal) per series over the hourly means, α=β=γ=1/2
  // with the same truncating integer halving discipline as
  // ts_holt_linear (Spark DIV ≡ DuckDB // toward zero — the seasonal
  // deltas go negative too). Season slots are CALENDAR-aligned
  // (hour_id mod 24), so hour gaps skip updates instead of smearing
  // them. Recursion per observed hour t with season slot i = hₜ mod 24:
  //   eₜ = eₜ₋₁ + |lₜ₋₁ + bₜ₋₁ + sₜ₋₁[i] − mₜ|
  //   lₜ = trunc((mₜ − sₜ₋₁[i] + lₜ₋₁ + bₜ₋₁)/2)
  //   bₜ = trunc((lₜ − lₜ₋₁ + bₜ₋₁)/2)
  //   sₜ[i] = trunc((mₜ − lₜ + sₜ₋₁[i])/2), other slots carried
  // Like Holt, the inherently sequential chain runs as ONE
  // aggregate() fold per series — state is (l, b, e, 24 longs), never
  // corpus-scaled — and the only raw-event shuffle is the hourly
  // rollup the fold's groupBy reuses. Emits final level/trend, the
  // next-hour seasonal forecast, and the cumulative one-step SAE
  // (directly comparable to ts_holt_linear's — the seasonal term
  // must EARN its keep in the ts_forecast_eval sense).
  // -------------------------------------------------------------------
  def holtWinters(spark: SparkSession, dir: String): DataFrame = {
    // SQL lambda bodies cannot let-bind: s[i] and the new level are
    // inlined at every use (the holtLinear discipline)
    // pmod, not %: pre-epoch hour ids are negative and a signed
    // remainder would index element_at at <= 0 (crash at 0, from-the-end
    // reads below) — same fix in the DuckDB oracle
    val sIdx = "element_at(acc.s, CAST(pmod(x.hour_id, 24) AS INT) + 1)"
    val lNew = s"(x.mean_c - $sIdx + acc.l + acc.b) DIV 2"
    val fold =
      s"""aggregate(
         |  slice(hm, 2, greatest(size(hm) - 1, 0)),
         |  named_struct(
         |    'l', hm[0].mean_c, 'b', CAST(0 AS BIGINT), 'e', CAST(0 AS BIGINT),
         |    's', transform(sequence(0, 23), j -> CAST(0 AS BIGINT))),
         |  (acc, x) -> named_struct(
         |    'l', $lNew,
         |    'b', (($lNew) - acc.l + acc.b) DIV 2,
         |    'e', acc.e + abs(acc.l + acc.b + $sIdx - x.mean_c),
         |    's', transform(sequence(0, 23), j ->
         |      IF(j = CAST(pmod(x.hour_id, 24) AS INT),
         |         (x.mean_c - ($lNew) + $sIdx) DIV 2,
         |         element_at(acc.s, j + 1)))))""".stripMargin
    eventsUs(spark, dir)
      .select(col("user_id"), expr(s"ts_us DIV ${HourUs}L").as("hour_id"), cents(col("value")).as("v"))
      .groupBy(col("user_id"), col("hour_id"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      .withColumn("mean_c", expr("s DIV n"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_hours"),
        sort_array(collect_list(struct(col("hour_id"), col("mean_c")))).as("hm")
      )
      .withColumn("st", expr(fold))
      .withColumn("last_hour", expr("element_at(hm, size(hm)).hour_id"))
      .select(
        col("user_id"),
        col("n_hours"),
        col("st.l").as("level_c"),
        col("st.b").as("trend_c"),
        expr("st.l + st.b + element_at(st.s, CAST(pmod(last_hour + 1, 24) AS INT) + 1)").as("forecast_c"),
        col("st.e").as("sae_c")
      )
  }

  // -------------------------------------------------------------------
  // 11z2. ts_forecast_eval — MODEL-SELECTION backtest: seasonal-naive
  // vs Holt linear, per series, on the same hourly one-step errors —
  // the comparison a forecasting deployment actually decides by, as a
  // query. Composes the two existing backtests (each already one
  // oracle-checked pass over the hourly aggregate); the eval itself is
  // one user-keyed join + a row-local verdict (tie → the simpler
  // model). Holt's SAE normalizes over its n_hours−1 one-step
  // predictions; series with a single hour have no Holt backtest and
  // drop (inner join).
  // -------------------------------------------------------------------
  def forecastEval(spark: SparkSession, dir: String): DataFrame = {
    val sn = forecastSnaive(spark, dir).select(col("user_id"), col("mae_micro").as("snaive_mae_micro"))
    val h = holtLinear(spark, dir)
      .filter(col("n_hours") > 1)
      .select(col("user_id"), expr("sae_c * 1000000 DIV (n_hours - 1)").as("holt_mae_micro"))
    sn.join(h, Seq("user_id"))
      .withColumn(
        "winner",
        when(col("holt_mae_micro") < col("snaive_mae_micro"), lit("holt")).otherwise(lit("snaive"))
      )
  }

  // -------------------------------------------------------------------
  // 11d4. ts_motif_topk — each series' dominant SAX motif: the most
  // frequent 3-symbol word of the series' SAX string (the classic
  // motif-discovery read on top of 11d3). Reuses the sax() pipeline
  // unchanged, explodes the (hours−2) 3-gram windows row-locally,
  // counts per (series, motif), and rank-1s with a lexical tiebreak —
  // the ranking window is PARTITIONED by series and its input is the
  // per-series motif aggregate (≤ hours rows), never raw events.
  // -------------------------------------------------------------------
  def motifTopk(spark: SparkSession, dir: String): DataFrame = {
    val wr = Window.partitionBy(col("user_id")).orderBy(col("n_occ").desc, col("motif").asc)
    sax(spark, dir)
      .filter(length(col("sax")) >= 3)
      .select(
        col("user_id"),
        explode(expr("transform(sequence(1, length(sax) - 2), i -> substring(sax, i, 3))")).as("motif")
      )
      .groupBy(col("user_id"), col("motif"))
      .agg(count(lit(1)).as("n_occ"))
      .withColumn("rnk", row_number().over(wr).cast("long"))
      .filter(col("rnk") === 1)
      .select(col("user_id"), col("motif"), col("n_occ"))
  }

  // -------------------------------------------------------------------
  // 11z3. ts_kalman — scalar KALMAN FILTER (random-walk state model)
  // per series over the hourly means, in exact fixed-point so both
  // engines recurse to identical integers. Constants Q = 25, R = 400
  // (process / measurement variance, cents²); gain carried in ppm:
  //   pp = p + Q;  k = pp·10⁶ DIV (pp + R);
  //   x' = x + k·(z − x) DIV 10⁶;  p' = (10⁶ − k)·pp DIV 10⁶;
  //   e' = e + |z − x|  (one-step innovation SAE — x IS the random-
  //   walk forecast, so the backtest needs no second pass).
  // Every division truncates toward zero on BOTH engines (Spark DIV,
  // DuckDB //, verified on negatives — z − x does go negative), and
  // p is self-bounding: p' = pp·R/(pp+R) < R, so pp·10⁶ < 4.3·10⁸ —
  // no overflow anywhere near 2⁶³. The recursion is inherently
  // sequential per series, so it runs as ONE aggregate() fold over
  // the sorted hour array (the holtLinear pattern): state is three
  // longs regardless of series length, the hourly rollup is the only
  // raw-event shuffle, and the fold reuses its partitioning. Emits
  // the final estimate, converged variance + gain, and the SAE.
  // -------------------------------------------------------------------
  def kalman(spark: SparkSession, dir: String, q: Long = 25L, r: Long = 400L): DataFrame = {
    // SQL lambda bodies cannot let-bind: pp and k inline at every use
    val pp = s"(acc.p + ${q}L)"
    val k  = s"(($pp * 1000000L) DIV ($pp + ${r}L))"
    val fold =
      s"""aggregate(
         |  slice(ms, 2, greatest(size(ms) - 1, 0)),
         |  named_struct('x', ms[0], 'p', ${r}L, 'e', CAST(0 AS BIGINT)),
         |  (acc, z) -> named_struct(
         |    'x', acc.x + ($k * (z - acc.x)) DIV 1000000L,
         |    'p', ((1000000L - $k) * $pp) DIV 1000000L,
         |    'e', acc.e + abs(z - acc.x)))""".stripMargin
    eventsUs(spark, dir)
      .select(col("user_id"), expr(s"ts_us DIV ${HourUs}L").as("hour_id"), cents(col("value")).as("v"))
      .groupBy(col("user_id"), col("hour_id"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      .withColumn("mean_c", expr("s DIV n"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_hours"),
        sort_array(collect_list(struct(col("hour_id"), col("mean_c")))).as("hm")
      )
      .withColumn("ms", expr("transform(hm, p -> p.mean_c)"))
      .withColumn("st", expr(fold))
      .select(
        col("user_id"),
        col("n_hours"),
        col("st.x").as("est_c"),
        col("st.p").as("p_final"),
        expr(s"((st.p + ${q}L) * 1000000L) DIV (st.p + ${q}L + ${r}L)").as("gain_ppm"),
        col("st.e").as("sae_c")
      )
  }

  // -------------------------------------------------------------------
  // 11z7. ts_anomaly_topk — FLEET TRIAGE: rank series by trailing-
  // window z-score anomaly RATE and keep the top-20 — the on-call
  // dashboard's "which of my million series misbehave most" read on
  // top of 11a's per-point flags. Rates in exact micro; the top-k is
  // an orderBy+limit (TakeOrdered's bounded heap — never a global
  // sort), the dense rank then a window over ONLY the k survivors.
  // -------------------------------------------------------------------
  def anomalyTopk(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val ranked = anomalyZscore(spark, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_scored"), sum(col("is_anomaly")).as("n_anomalies"))
      .withColumn("rate_micro", expr("n_anomalies * 1000000 DIV n_scored"))
      .orderBy(col("rate_micro").desc, col("user_id").asc)
      .limit(k)
    ranked
      .withColumn(
        "rnk",
        row_number().over(Window.orderBy(col("rate_micro").desc, col("user_id").asc)).cast("long")
      )
      .select(col("user_id"), col("rnk"), col("n_scored"), col("n_anomalies"), col("rate_micro"))
  }

  // -------------------------------------------------------------------
  // 11z6. ts_profile_cluster — LOAD-SHAPE CLUSTERING of the series
  // fleet: each series collapses to its 24-slot hour-of-day profile
  // (mean cents per hod, missing slots 0), MEAN-CENTERED so clustering
  // sees shape rather than scale, then k-means in exact integer
  // arithmetic (the ann_ivf_kmeans Lloyd discipline: deterministic
  // first-k seeds, argmin by (d2, code), centroid = true integer FLOOR
  // (s − pmod(s, n)) DIV n — centered values go negative, trunc would
  // drift). The fleet-segmentation read a capacity planner runs:
  // "which of my million series share a daily shape". Scale shape: the
  // profile build is ONE series-grain shuffle; every Lloyd pass is a
  // k×24 centroid BROADCAST into a partial-aggregable groupBy — the
  // corpus-sized table never shuffles for the clustering itself.
  // -------------------------------------------------------------------
  def profileCluster(spark: SparkSession, dir: String, k: Int = 4, iters: Int = 2): DataFrame = {
    import graft.functions.VectorFunctions.{dotQ, norm2Q}
    val prof = eventsUs(spark, dir)
      .select(col("user_id"), expr(s"(ts_us DIV ${HourUs}L) % 24").as("hod"), cents(col("value")).as("v"))
      .groupBy(col("user_id"), col("hod"))
      .agg(expr("sum(v) DIV count(1)").as("m"))
      .groupBy(col("user_id"))
      .agg(map_from_entries(collect_list(struct(col("hod").cast("int"), col("m")))).as("pm"))
      .withColumn("p", expr("transform(sequence(0, 23), h -> coalesce(pm[h], 0L))"))
      .withColumn("mu", expr("aggregate(p, 0L, (a, x) -> a + x) DIV 24"))
      .withColumn("q", expr("transform(p, x -> x - mu)"))
      .select(col("user_id").as("vec_id"), col("q"))
      .withColumn("n2", norm2Q(col("q")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def dist(cen: DataFrame): DataFrame =
      prof
        .crossJoin(broadcast(cen))
        .select(
          col("vec_id"),
          col("c"),
          (col("n2") + col("c2") - lit(2L) * dotQ(col("q"), col("cq"))).as("d2")
        )
    var cen = prof
      .filter(col("vec_id") < k)
      .select(col("vec_id").as("c"), col("q").as("cq"))
      .withColumn("c2", norm2Q(col("cq")))
    for (_ <- 0 until iters) {
      val assigned = dist(cen)
        .groupBy(col("vec_id"))
        .agg(min_by(col("c"), struct(col("d2"), col("c"))).as("cell"))
      cen = prof
        .join(assigned, Seq("vec_id"))
        .select(col("cell"), posexplode(col("q")).as(Seq("i", "v")))
        .groupBy(col("cell"), col("i"))
        .agg(sum(col("v")).as("sv"), count(lit(1)).as("n"))
        .withColumn("cv", expr("(sv - pmod(sv, n)) DIV n")) // floor(sv / n), any sign
        .groupBy(col("cell").as("c"))
        .agg(transform(sort_array(collect_list(struct(col("i"), col("cv")))), p => p.getField("cv")).as("cq"))
        .withColumn("c2", norm2Q(col("cq")))
    }
    val out = dist(cen)
      .groupBy(col("vec_id"))
      .agg(min_by(struct(col("c"), col("d2")), struct(col("d2"), col("c"))).as("best"))
      .select(
        col("vec_id").as("user_id"),
        col("best.c").cast("long").as("cluster"),
        col("best.d2").as("d2")
      )
    graft.operators.Dedup.releaseAfterRun(spark, out, Seq(prof))
  }

  // -------------------------------------------------------------------
  // 11z5. ts_weekly_profile — the DOW×HOD occupancy matrix per event
  // type: the 7×24 weekly heatmap behind capacity planning and
  // anomaly baselines (ts_seasonal_profile is the hour-of-day cut per
  // SERIES; this is the full weekly grid per TYPE). Day-of-week is
  // pure integer arithmetic — (epoch_days + 4) % 7, 0 = Sunday
  // (1970-01-01 was a Thursday) — identical on both engines, no
  // locale-dependent date function. One partial-aggregable groupBy
  // onto the |types|·168-cell key space; the share window runs over
  // that bounded aggregate, never raw events.
  // -------------------------------------------------------------------
  def weeklyProfile(spark: SparkSession, dir: String): DataFrame = {
    val wType = Window.partitionBy(col("event_type"))
    eventsUs(spark, dir)
      .select(
        col("event_type"),
        expr(s"(ts_us DIV ${DayUs}L + 4) % 7").as("dow"),
        expr(s"(ts_us DIV ${HourUs}L) % 24").as("hod"),
        cents(col("value")).as("v")
      )
      .groupBy(col("event_type"), col("dow"), col("hod"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      .withColumn("mean_c", expr("sv DIV n"))
      .withColumn("total", sum(col("n")).over(wType))
      .withColumn("share_bp", expr("n * 10000 DIV total"))
      .select(col("event_type"), col("dow"), col("hod"), col("n"), col("mean_c"), col("share_bp"))
  }

  // -------------------------------------------------------------------
  // 11z4. ts_cusum — two-sided CUSUM drift detector per series over
  // the hourly means, the retrospective mean-shift audit next to
  // ts_changepoint's single split: the classic Page recursion
  //   gp' = max(0, gp + (z − med) − k);  gn' = max(0, gn − (z − med) − k)
  // with an alarm (and reset — restart-after-alarm, so repeated drifts
  // each count) whenever either statistic exceeds h. Baseline and
  // scale are the series' own MEDIAN and MAD of hourly means (lower-
  // median convention, rank (n+1) DIV 2 — exact integers, no float
  // quantile), slack k = max(1, MAD DIV 2), threshold h = 5·max(1, MAD)
  // — self-normalizing, so one parameterization serves every series.
  // All integer cents; the recursion is inherently sequential per
  // series, so it runs as ONE aggregate() fold over the sorted hour
  // array (the kalman pattern): state is four longs regardless of
  // length, the hourly rollup is the only raw-event shuffle, and the
  // median/MAD sorts are row-local array sorts at series grain.
  // -------------------------------------------------------------------
  def cusum(spark: SparkSession, dir: String): DataFrame = {
    val gp1 = "greatest(CAST(0 AS BIGINT), acc.gp + (z - med_c) - kk_c)"
    val gn1 = "greatest(CAST(0 AS BIGINT), acc.gn - (z - med_c) - kk_c)"
    val fold =
      s"""aggregate(
         |  ms,
         |  named_struct('gp', CAST(0 AS BIGINT), 'gn', CAST(0 AS BIGINT),
         |               'al', CAST(0 AS BIGINT), 'mx', CAST(0 AS BIGINT)),
         |  (acc, z) -> named_struct(
         |    'gp', IF($gp1 > hh_c OR $gn1 > hh_c, CAST(0 AS BIGINT), $gp1),
         |    'gn', IF($gp1 > hh_c OR $gn1 > hh_c, CAST(0 AS BIGINT), $gn1),
         |    'al', acc.al + IF($gp1 > hh_c OR $gn1 > hh_c, 1L, 0L),
         |    'mx', greatest(acc.mx, $gp1, $gn1)))""".stripMargin
    eventsUs(spark, dir)
      .select(col("user_id"), expr(s"ts_us DIV ${HourUs}L").as("hour_id"), cents(col("value")).as("v"))
      .groupBy(col("user_id"), col("hour_id"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      .withColumn("mean_c", expr("s DIV n"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_hours"),
        sort_array(collect_list(struct(col("hour_id"), col("mean_c")))).as("hm")
      )
      .withColumn("ms", expr("transform(hm, p -> p.mean_c)"))
      // lower median: element at rank (n+1) DIV 2 of the value-sorted array
      .withColumn("med_c", expr("element_at(sort_array(ms), CAST((size(ms) + 1) DIV 2 AS INT))"))
      .withColumn(
        "mad_c",
        expr("element_at(sort_array(transform(ms, x -> abs(x - med_c))), CAST((size(ms) + 1) DIV 2 AS INT))")
      )
      .withColumn("kk_c", expr("greatest(CAST(1 AS BIGINT), mad_c DIV 2)"))
      .withColumn("hh_c", expr("5L * greatest(CAST(1 AS BIGINT), mad_c)"))
      .withColumn("st", expr(fold))
      .select(
        col("user_id"),
        col("n_hours"),
        col("med_c"),
        col("mad_c"),
        col("st.al").as("n_alarms"),
        col("st.mx").as("max_stat"),
        col("st.gp").as("gp_final"),
        col("st.gn").as("gn_final")
      )
  }

  // -------------------------------------------------------------------
  // ts_mix_diversity — event-type MIX DIVERSITY per series: the
  // Gini-Simpson index 1 − Σpᵢ² and its "effective number of types"
  // inverse (Hill number of order 2) — the fleet read that separates
  // "this series is all heartbeats" from "this series does real work"
  // before anyone prices per-type storage or routing. Both are RATIONAL
  // in the raw counts (1 − Σcᵢ²/n² = (n² − Σcᵢ²)/n²; n²/Σcᵢ²), so no
  // float entropy is needed: bp/centi outputs are exact truncating
  // divisions, bit-identical cross-engine. Plan: one partial-aggregable
  // groupBy onto the (series × |types|)-key space, then a per-series
  // agg — both shuffles carry aggregates, never raw events twice. The
  // n² cross products ride DECIMAL(38,0) (the ts_linear_trend overflow
  // discipline) so per-series counts in the billions stay exact.
  // -------------------------------------------------------------------
  def mixDiversity(spark: SparkSession, dir: String): DataFrame = {
    eventsUs(spark, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_types"),
        sum(col("c")).as("n_events"),
        // square in DECIMAL(38,0): per-type counts above ~3e9 would
        // silently overflow a LONG c*c in non-ANSI mode
        sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("ssq"),
        max(struct(col("c"), col("event_type"))).as("top")
      )
      .select(
        col("user_id"),
        col("n_types"),
        col("n_events"),
        expr(
          "CAST((CAST(10000 AS DECIMAL(38,0)) * (CAST(n_events AS DECIMAL(38,0)) * n_events - ssq)) " +
            "DIV (CAST(n_events AS DECIMAL(38,0)) * n_events) AS BIGINT)"
        ).as("gini_simpson_bp"),
        expr(
          "CAST((CAST(100 AS DECIMAL(38,0)) * CAST(n_events AS DECIMAL(38,0)) * n_events) " +
            "DIV CAST(ssq AS DECIMAL(38,0)) AS BIGINT)"
        ).as("eff_types_centi"),
        col("top.event_type").as("top_type"),
        expr("(top.c * 10000) DIV n_events").as("top_share_bp")
      )
  }

  // -------------------------------------------------------------------
  // ts_exceedance_runs — EXCEEDANCE EPISODES per series: maximal runs
  // of CONSECUTIVE hours whose hourly mean sits above the series' own
  // upper quartile — the "sustained high load" read (heatwave /
  // saturation episodes) that point-anomaly flags can't express: ten
  // scattered hot hours and one ten-hour episode alarm differently.
  // The threshold is the exact rank-selected p75 of the series' hourly
  // means (rank ceil(3n/4), no float quantile); runs use the
  // gaps-and-islands constant (hour_id − row_number over exceedance
  // hours), so an hour GAP breaks an episode — calendar runs, not
  // row runs. Plan: one hourly rollup off raw events, then every
  // window and aggregate shares the series shuffle (the rank/threshold
  // windows, the island window, both episode aggregates); series with
  // no exceedance (constant series: p75 = max) keep zero books via the
  // left join.
  // -------------------------------------------------------------------
  def exceedanceRuns(spark: SparkSession, dir: String): DataFrame = {
    val hourly = eventsUs(spark, dir)
      .groupBy(col("user_id"), expr(s"ts_us DIV ${HourUs}L").as("hour_id"))
      .agg(sum(cents(col("value"))).as("s"), count(lit(1)).as("n"))
      .select(col("user_id"), col("hour_id"), expr("s DIV n").as("mean_c"))
    val wRank = Window.partitionBy("user_id").orderBy(col("mean_c").asc, col("hour_id").asc)
    val wAll  = Window.partitionBy("user_id")
    val ranked = hourly
      .withColumn("rnk", row_number().over(wRank).cast("long"))
      .withColumn("nh", count(lit(1)).over(wAll))
    val books = ranked
      .groupBy(col("user_id"))
      .agg(
        max(col("nh")).as("n_hours"),
        max(when(col("rnk") === expr("(3 * nh + 3) DIV 4"), col("mean_c"))).as("thr_c")
      )
    val wIsl = Window.partitionBy("user_id").orderBy("hour_id")
    val episodes = hourly
      .join(books.select(col("user_id"), col("thr_c")), Seq("user_id"))
      .filter(col("mean_c") > col("thr_c"))
      .withColumn("island", col("hour_id") - row_number().over(wIsl))
      .groupBy(col("user_id"), col("island"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_episodes"),
        max(col("len")).as("longest_run"),
        sum(col("len")).as("exceed_hours")
      )
    books
      .join(episodes, Seq("user_id"), "left")
      .select(
        col("user_id"),
        col("n_hours"),
        col("thr_c"),
        coalesce(col("n_episodes"), lit(0L)).as("n_episodes"),
        coalesce(col("longest_run"), lit(0L)).as("longest_run"),
        coalesce(col("exceed_hours"), lit(0L)).as("exceed_hours")
      )
  }

  // -------------------------------------------------------------------
  // ts_error_spikes — STATISTICALLY SIGNIFICANT error-rate spikes: per
  // series-hour, is the error share above the fleet baseline by more
  // than sampling noise explains? The z-test (p̂ − p₀)² > z²·p̂(1−p̂)/n
  // at z = 2 — cross-multiplied to (e·N − n·E)²·n > 4·e·(n−e)·N² with
  // p̂ > p₀ as the sign guard — is fully RATIONAL, so the verdict is
  // bit-identical cross-engine with no sqrt and no float: the
  // hypothesis-testing tier the raw-threshold alerts
  // (ts_anomaly_zscore, ts_burn_rate) don't give, and the reason a
  // 3-event hour with 2 errors doesn't page anyone. Per series the
  // output is the alarm book: scored hours, error hours, significant
  // hours, worst excess over baseline in bp. Plan: one
  // partial-aggregable (series, hour) groupBy, the fleet baseline is a
  // 1-row broadcast, verdicts row-local on DECIMAL(38,0) cross
  // products (N up to 10¹² stays exact), final per-series aggregate on
  // the same series key.
  // -------------------------------------------------------------------
  def errorSpikes(spark: SparkSession, dir: String, errType: String = "error"): DataFrame = {
    val hourly = eventsUs(spark, dir)
      .groupBy(col("user_id"), expr(s"ts_us DIV ${HourUs}L").as("hour_id"))
      .agg(
        sum(when(col("event_type") === errType, 1L).otherwise(0L)).as("e"),
        count(lit(1)).as("n")
      )
    val base = hourly.agg(sum(col("e")).as("be"), sum(col("n")).as("bn"))
    hourly
      .crossJoin(broadcast(base)) // 1-row fleet-baseline broadcast
      .withColumn(
        "sig",
        expr(
          "CASE WHEN CAST(e AS DECIMAL(38,0)) * bn - CAST(n AS DECIMAL(38,0)) * be > 0 AND " +
            "(CAST(e AS DECIMAL(38,0)) * bn - CAST(n AS DECIMAL(38,0)) * be) * " +
            "(CAST(e AS DECIMAL(38,0)) * bn - CAST(n AS DECIMAL(38,0)) * be) * n > " +
            "CAST(4 AS DECIMAL(38,0)) * e * (n - e) * bn * bn " +
            "THEN 1L ELSE 0L END"
        )
      )
      .withColumn("excess_bp", expr("(e * 10000) DIV n - (be * 10000) DIV bn"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_hours"),
        sum(when(col("e") > 0L, 1L).otherwise(0L)).as("err_hours"),
        sum(col("sig")).as("n_sig_hours"),
        max(when(col("sig") === 1L, col("excess_bp"))).as("max_sig_excess_bp"),
        max(col("bn")).as("fleet_n")
      )
      .select(
        col("user_id"),
        col("n_hours"),
        col("err_hours"),
        col("n_sig_hours"),
        coalesce(col("max_sig_excess_bp"), lit(0L)).as("max_sig_excess_bp"),
        col("fleet_n")
      )
  }

  // -------------------------------------------------------------------
  // ts_backtest_horizon — FORECAST-ERROR vs HORIZON for the
  // persistence (random-walk) baseline: fleet MAE of "the value at t
  // predicts t+h" for h = 1..6 hours — the curve that tells a planner
  // how far ahead ANY model must beat doing nothing (error growth in h
  // is also the fingerprint of mean-reversion vs drift). TIME lags,
  // not row lags: predictions meet outcomes in ONE (series, hour)
  // equi-join (the ts_period_detect discipline), so missing hours
  // shrink the support instead of mis-aligning it. Plan: one hourly
  // rollup shuffle off raw events, a 6-way row-local horizon explode
  // on the prediction side, the self-equi-join (Spark reuses the
  // rollup exchange), and a 6-row partial-aggregable final aggregate.
  // -------------------------------------------------------------------
  def backtestHorizon(spark: SparkSession, dir: String, maxH: Int = 6): DataFrame = {
    val base = eventsUs(spark, dir)
      .groupBy(col("user_id"), expr(s"ts_us DIV ${HourUs}L").as("hour_id"))
      .agg(sum(cents(col("value"))).as("s"), count(lit(1)).as("n"))
      .select(col("user_id"), col("hour_id"), expr("s DIV n").as("mean_c"))
    val preds = base
      .select(
        col("user_id"),
        col("hour_id").as("src_hour"),
        col("mean_c").as("pred_c"),
        explode(expr(s"sequence(1, $maxH)")).as("h")
      )
      .select(col("user_id"), (col("src_hour") + col("h")).as("hour_id"), col("h").cast("long").as("h"), col("pred_c"))
    preds
      .join(base, Seq("user_id", "hour_id"))
      .groupBy(col("h"))
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(abs(col("mean_c") - col("pred_c"))).as("sae_c")
      )
      .select(
        col("h"),
        col("n_pairs"),
        col("sae_c"),
        expr("CAST((CAST(sae_c AS DECIMAL(38,0)) * 1000) DIV n_pairs AS BIGINT)").as("mae_milli_c")
      )
  }

  // -------------------------------------------------------------------
  // ts_drift_tv — VALUE-DISTRIBUTION DRIFT per event type between the
  // first and second halves of the retention window: total-variation
  // distance ½·Σ|p₁(b) − p₂(b)| over the fixed-width value histogram
  // (the ts_value_histogram buckets) — the data-drift monitor run
  // before anyone trusts a model trained on last month's feed. TV is
  // rational where PSI/KL need logs: cross-multiplied to
  // Σ|c₁·n₂ − c₂·n₁| over 2·n₁·n₂ and published in bp via one exact
  // truncating DECIMAL division — bit-identical cross-engine, no float.
  // The split point is the global time midpoint (a 1-row broadcast
  // aggregate); histogramming is ONE partial-aggregable groupBy onto
  // the bounded (type × bucket × half) space, drift aggregation runs
  // over that tiny table. Also pins the single worst-drifting bucket
  // per type (max_by with bucket tiebreak) — the "where did it move"
  // pointer an on-call actually clicks.
  // -------------------------------------------------------------------
  def driftTv(spark: SparkSession, dir: String, bucketC: Long = 500L): DataFrame = {
    val ev = eventsUs(spark, dir).select(
      col("event_type"),
      col("ts_us"),
      cents(col("value")).as("v")
    )
    val mid = ev.agg(expr("(min(ts_us) + max(ts_us)) DIV 2").as("mid_us"))
    val hist = ev
      .crossJoin(broadcast(mid)) // 1-row global-midpoint broadcast
      .select(
        col("event_type"),
        expr(s"(v - pmod(v, ${bucketC}L)) DIV ${bucketC}L").as("bucket"),
        when(col("ts_us") <= col("mid_us"), 1L).otherwise(0L).as("h1")
      )
      .groupBy(col("event_type"), col("bucket"))
      .agg(sum(col("h1")).as("c1"), sum(lit(1L) - col("h1")).as("c2"))
    val wTot = Window.partitionBy("event_type")
    hist
      .withColumn("n1", sum(col("c1")).over(wTot))
      .withColumn("n2", sum(col("c2")).over(wTot))
      .groupBy(col("event_type"))
      .agg(
        max(col("n1")).as("n1"),
        max(col("n2")).as("n2"),
        count(lit(1)).as("n_buckets"),
        sum(expr("abs(CAST(c1 AS DECIMAL(38,0)) * n2 - CAST(c2 AS DECIMAL(38,0)) * n1)")).as("l1"),
        max_by(
          col("bucket"),
          struct(expr("abs(CAST(c1 AS DECIMAL(38,0)) * n2 - CAST(c2 AS DECIMAL(38,0)) * n1)"), (-col("bucket")).as("nb"))
        ).as("worst_bucket")
      )
      .select(
        col("event_type"),
        col("n1"),
        col("n2"),
        col("n_buckets"),
        expr(
          "CAST((CAST(10000 AS DECIMAL(38,0)) * l1) " +
            "DIV (CAST(2 AS DECIMAL(38,0)) * greatest(n1, 1L) * greatest(n2, 1L)) AS BIGINT)"
        ).as("tv_bp"),
        col("worst_bucket")
      )
  }

  // -------------------------------------------------------------------
  // 11z9. ts_peak_detect — PROMINENCE-gated local maxima per series
  // (the scipy find_peaks contract, distributed): on the per-type
  // hourly mean series, a peak is an hour strictly above its left
  // neighbor, at-or-above its right (ties resolve to the leftmost of a
  // plateau edge), equal to the ±w window max, with prominence =
  // peak − max(left-flank min, right-flank min) over the same w-hour
  // flanks. Edge hours without full two-sided flanks are out of scope
  // (no one-sided fabrications). One window pass over the hourly
  // rollup sharing a single per-type shuffle; every comparison is in
  // integer cents so the peak set is bit-identical cross-engine. At
  // 100 TB this scales on the series axis — windows stay per-type and
  // the hourly grain bounds rows per series at hours-in-retention.
  // -------------------------------------------------------------------
  def peakDetect(spark: SparkSession, dir: String, w: Int = 3, minPromC: Long = 50L): DataFrame = {
    val hourly = eventsUs(spark, dir)
      .groupBy(col("event_type"), expr(s"ts_us DIV ${HourUs}L").as("hour_id"))
      .agg(sum(cents(col("value"))).as("s"), count(lit(1)).as("n"))
      .withColumn("m", expr("s DIV n"))
    val ord   = Window.partitionBy("event_type").orderBy(col("hour_id"))
    val whole = Window.partitionBy("event_type")
    hourly
      .select(
        col("event_type"),
        col("hour_id"),
        col("m"),
        row_number().over(ord).cast("long").as("rn"),
        count(lit(1)).over(whole).as("nh"),
        lag(col("m"), 1).over(ord).as("prev_m"),
        lead(col("m"), 1).over(ord).as("next_m"),
        max(col("m")).over(ord.rowsBetween(-w, w)).as("win_max"),
        min(col("m")).over(ord.rowsBetween(-w, -1)).as("lmin"),
        min(col("m")).over(ord.rowsBetween(1, w)).as("rmin")
      )
      .filter(col("rn") > w && col("rn") <= col("nh") - w)
      .filter(col("m") > col("prev_m") && col("m") >= col("next_m") && col("m") === col("win_max"))
      .withColumn("prom_c", col("m") - greatest(col("lmin"), col("rmin")))
      .filter(col("prom_c") >= minPromC)
      .select(col("event_type"), col("hour_id"), col("m").as("peak_c"), col("prom_c"))
  }

  // -------------------------------------------------------------------
  // 11z10. ts_theta_forecast — the THETA method (M3 competition
  // winner, Assimakopoulos & Nikolopoulos 2000) per series in exact
  // micro fixed-point: decompose the hourly mean series into the θ=0
  // line (the OLS linear trend, computed in closed form — Σrn and Σrn²
  // are polynomial identities, so the fit is two aggregates) and the
  // θ=2 line z_t = 2·10⁶·m_t − trend_t (double curvature), smooth the
  // θ=2 line with SES α=1/2 (the same truncating integer halving as
  // ts_holt_linear), and forecast the average of the two legs. The
  // one-step-ahead SAE accumulates inside the same fold so the θ
  // combination must EARN its keep against ts_holt_linear /
  // ts_forecast_snaive in the ts_forecast_eval sense. The inherently
  // sequential SES chain runs as ONE aggregate() fold per series over
  // the already-aggregated hourly array — state is (s, e, t), never
  // corpus-scaled; the only raw-event shuffle is the hourly rollup.
  // Both engines truncate integer division toward zero (Spark DIV ≡
  // DuckDB //), so the recursion is bit-identical cross-engine.
  // -------------------------------------------------------------------
  def thetaForecast(spark: SparkSession, dir: String): DataFrame = {
    val ord = Window.partitionBy("user_id").orderBy(col("hour_id"))
    val hourly = eventsUs(spark, dir)
      .groupBy(col("user_id"), expr(s"ts_us DIV ${HourUs}L").as("hour_id"))
      .agg(sum(cents(col("value"))).as("s"), count(lit(1)).as("n"))
      .withColumn("m", expr("s DIV n"))
      .withColumn("rn", row_number().over(ord).cast("long"))
    val fitted = hourly
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_hours"),
        sum(col("m")).as("sm"),
        sum(col("rn") * col("m")).as("sxm"),
        sort_array(collect_list(struct(col("hour_id"), col("m")))).as("hm")
      )
      // Σrn = n(n+1)/2 and Σrn² = n(n+1)(2n+1)/6 are exact integer
      // identities, so denom = n²(n²−1)/12 divides exactly; the
      // greatest(…,1) guards the n=1 series (slope 0 by convention)
      .withColumn("srn", expr("(n_hours * (n_hours + 1)) DIV 2"))
      .withColumn("denom", expr("greatest((n_hours * n_hours * (n_hours * n_hours - 1)) DIV 12, 1L)"))
      // the fit numerators ride DECIMAL(38,0): at a year of hourly
      // grain n·Σ(rn·m)·10⁶ clears the long range
      .withColumn(
        "sl",
        expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * (n_hours * sxm - srn * sm)) DIV denom AS BIGINT)")
      )
      .withColumn(
        "ic",
        expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * sm - CAST(sl AS DECIMAL(38,0)) * srn) DIV n_hours AS BIGINT)")
      )
      .withColumn("ms", expr("transform(hm, p -> p.m)"))
    // fold state: s = SES level of the θ=2 line (micro), e = Σ|one-step
    // θ-forecast − 10⁶·actual|, t = index of the last consumed hour
    val fold =
      """aggregate(
        |  slice(ms, 2, greatest(size(ms) - 1, 0)),
        |  named_struct('s', 2000000L * ms[0] - (ic + sl), 'e', CAST(0 AS BIGINT), 't', CAST(1 AS BIGINT)),
        |  (acc, x) -> named_struct(
        |    's', (2000000L * x - (ic + sl * (acc.t + 1)) + acc.s) DIV 2,
        |    'e', acc.e + abs((acc.s + ic + sl * (acc.t + 1)) DIV 2 - 1000000L * x),
        |    't', acc.t + 1))""".stripMargin
    fitted
      .withColumn("st", expr(fold))
      .select(
        col("user_id"),
        col("n_hours"),
        col("sl").as("slope_micro"),
        col("st.s").as("ses_micro"),
        expr("(st.s + ic + sl * (n_hours + 1)) DIV 2").as("forecast_micro"),
        col("st.e").as("sae_micro")
      )
  }

  // -------------------------------------------------------------------
  // 11z11. ts_intervention_eval — IMPACT QUANTIFICATION at the
  // detected changepoint (the causal-impact-lite read a deploy/price
  // change review runs): the series splits at ts_changepoint's own
  // CUSUM argmax (same prefix-deviation convention, same tiebreak),
  // then publishes the before/after level means, the absolute and
  // relative shift, and a distribution-free SIGN TEST count (after
  // points strictly above the before-mean — n_after_above ≈ n_after/2
  // means no shift, ≈ n_after means a genuine level change). Two
  // window passes and one join back to the series, all sharing the
  // one per-series shuffle; means are truncating cents divisions
  // identical on both engines.
  // -------------------------------------------------------------------
  def interventionEval(spark: SparkSession, dir: String): DataFrame = {
    val cum   = seriesW.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy("user_id")
    val pts = eventsUs(spark, dir)
      .select(col("user_id"), col("ts_us"), col("event_id"), cents(col("value")).as("v"))
      .withColumn("k", row_number().over(seriesW).cast("long"))
    val cp = pts
      .withColumn("prefix", sum(col("v")).over(cum))
      .withColumn("n", count(lit(1)).over(whole))
      .withColumn("total", sum(col("v")).over(whole))
      .withColumn("dev", abs(col("n") * col("prefix") - col("k") * col("total")))
      .groupBy(col("user_id"))
      .agg(
        first(col("n")).as("n"),
        min_by(col("k"), struct(-col("dev"), col("k"))).as("cp_k"),
        min_by(col("prefix"), struct(-col("dev"), col("k"))).as("cp_prefix"),
        first(col("total")).as("total")
      )
      .withColumn("before_mean_c", expr("cp_prefix DIV cp_k"))
      .withColumn("after_mean_c", expr("CASE WHEN n > cp_k THEN (total - cp_prefix) DIV (n - cp_k) ELSE 0L END"))
    pts
      .join(cp, Seq("user_id"))
      .groupBy(col("user_id"))
      .agg(
        first(col("n")).as("n"),
        first(col("cp_k")).as("cp_k"),
        first(col("before_mean_c")).as("before_mean_c"),
        first(col("after_mean_c")).as("after_mean_c"),
        sum(when(col("k") > col("cp_k") && col("v") > col("before_mean_c"), 1L).otherwise(0L))
          .as("n_after_above")
      )
      .withColumn("n_after", col("n") - col("cp_k"))
      .withColumn("delta_c", col("after_mean_c") - col("before_mean_c"))
      .withColumn("rel_bp", expr("delta_c * 10000 DIV greatest(abs(before_mean_c), 1L)"))
      .select(
        col("user_id"),
        col("n"),
        col("cp_k"),
        col("n_after"),
        col("before_mean_c"),
        col("after_mean_c"),
        col("delta_c"),
        col("rel_bp"),
        col("n_after_above")
      )
  }

  // -------------------------------------------------------------------
  // 11z12. ts_capacity_forecast — the "DISK FULL IN N DAYS" read (the
  // capacity-planning extrapolation every SRE dashboard carries): per
  // event type, the cumulative value total over OBSERVED days is fit
  // with the closed-form integer OLS (same exact Σrn/Σrn² identities
  // as ts_theta_forecast) and extrapolated to the crossing of a
  // 120%-of-current headroom threshold. days_to_thr is a ceiling
  // division on non-negative operands (slope ≤ 0 reports -1 — no
  // crossing on current trend); the 10⁶-scaled numerators ride
  // DECIMAL(38,0) so a 100 TB cumulative total cannot overflow the
  // fit. One day rollup + one cumulative window + one per-type
  // aggregate, all on the type shuffle.
  // -------------------------------------------------------------------
  def capacityForecast(spark: SparkSession, dir: String): DataFrame = {
    val ord = Window.partitionBy("event_type").orderBy(col("day_id"))
    val daily = eventsUs(spark, dir)
      .groupBy(col("event_type"), expr(s"ts_us DIV ${DayUs}L").as("day_id"))
      .agg(sum(cents(col("value"))).as("d_c"))
      .withColumn("rn", row_number().over(ord).cast("long"))
      .withColumn("cum_c", sum(col("d_c")).over(ord.rowsBetween(Window.unboundedPreceding, 0)))
    daily
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_days"),
        max(col("cum_c")).as("total_c"),
        sum(col("cum_c")).as("sm"),
        sum(col("rn") * col("cum_c")).as("sxm")
      )
      .withColumn("srn", expr("(n_days * (n_days + 1)) DIV 2"))
      .withColumn("denom", expr("greatest((n_days * n_days * (n_days * n_days - 1)) DIV 12, 1L)"))
      .withColumn(
        "slope_micro",
        expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * (n_days * sxm - srn * sm)) DIV denom AS BIGINT)")
      )
      .withColumn(
        "ic",
        expr(
          "CAST((CAST(1000000 AS DECIMAL(38,0)) * sm - CAST(slope_micro AS DECIMAL(38,0)) * srn) DIV n_days AS BIGINT)"
        )
      )
      .withColumn("thr_c", expr("(total_c * 12 + 9) DIV 10"))
      .withColumn(
        "days_to_thr",
        expr(
          """CASE WHEN slope_micro <= 0 THEN -1L
            |ELSE greatest(CAST((CAST(thr_c AS DECIMAL(38,0)) * 1000000 - ic - slope_micro * n_days
            |  + slope_micro - 1) DIV slope_micro AS BIGINT), 0L) END""".stripMargin
        )
      )
      .select(
        col("event_type"),
        col("n_days"),
        col("total_c"),
        col("slope_micro"),
        col("thr_c"),
        col("days_to_thr")
      )
  }

  // -------------------------------------------------------------------
  // 11z13. ts_alert_fatigue — the ALERT-STORM ledger over the z-score
  // detector's own verdicts (the on-call hygiene read: an alerting
  // rule firing 50 times inside one incident is one page and 49
  // fatigue units): per series, anomalies within 2 h of the previous
  // one merge into an EPISODE (the lag-gap convention ts_gap_intervals
  // uses), and the report is alerts vs episodes — n_alerts,
  // n_episodes, alerts-per-episode in centi (100 = perfectly
  // deduplicated paging), and the largest single episode. One lag
  // window + one segment groupBy over ALERT rows only (the detector's
  // output is the input — the fatigue pass never rescans raw events).
  // -------------------------------------------------------------------
  def alertFatigue(spark: SparkSession, dir: String, mergeUs: Long = 2L * HourUs): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    val alerts = anomalyZscore(spark, dir)
      .filter(col("is_anomaly") === 1L)
      .withColumn("prev_ts", lag(col("ts_us"), 1).over(w))
      .withColumn(
        "brk",
        when(col("prev_ts").isNull || col("ts_us") - col("prev_ts") > mergeUs, 1L).otherwise(0L)
      )
      .withColumn("seg", sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    alerts
      .groupBy(col("user_id"), col("seg"))
      .agg(count(lit(1)).as("ep_n"))
      .groupBy(col("user_id"))
      .agg(
        sum(col("ep_n")).as("n_alerts"),
        count(lit(1)).as("n_episodes"),
        max(col("ep_n")).as("max_episode")
      )
      .withColumn("per_episode_centi", expr("n_alerts * 100 DIV n_episodes"))
  }

  // -------------------------------------------------------------------
  // 11z14. ts_residual_acf — MODEL-ADEQUACY check on the snaive
  // forecast (the Ljung-Box idea at lag 1, exact): residuals
  // r_t = m_t − m_{t−24h} (the seasonal-naive error, calendar-aligned
  // via a RANGE window — gaps skip, never smear), then the lag-1
  // autocorrelation of the residual sequence as exact Pearson
  // NUMERATORS (n·Σxy − ΣxΣy — no division, no sqrt) plus the
  // whiteness verdict with the 1.96/√n band CROSS-MULTIPLIED:
  // white ⇔ cov²·n·10⁴ ≤ 38416·varx·vary, every product riding
  // DECIMAL(38,0). Residual autocorrelation surviving the band means
  // snaive left structure on the table (reach for ts_holt_winters /
  // ts_theta_forecast); whiteness means the eval ledger's SAE is all
  // noise. One hourly rollup + two window passes + one per-series
  // aggregate, all on the series shuffle.
  // -------------------------------------------------------------------
  def residualAcf(spark: SparkSession, dir: String): DataFrame = {
    val ord = Window.partitionBy("user_id").orderBy(col("hour_id"))
    val hourly = eventsUs(spark, dir)
      .groupBy(col("user_id"), expr(s"ts_us DIV ${HourUs}L").as("hour_id"))
      .agg(sum(cents(col("value"))).as("s"), count(lit(1)).as("n"))
      .withColumn("m", expr("s DIV n"))
    val resid = hourly
      .withColumn("m24", max(col("m")).over(ord.rangeBetween(-24, -24)))
      .filter(col("m24").isNotNull)
      .withColumn("r", col("m") - col("m24"))
      .withColumn("x", lag(col("r"), 1).over(ord))
      .filter(col("x").isNotNull)
    resid
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(col("x")).as("sx"),
        sum(col("r")).as("sy"),
        sum(col("x") * col("r")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("r") * col("r")).as("syy")
      )
      .select(
        col("user_id"),
        col("n_pairs"),
        (col("n_pairs") * col("sxy") - col("sx") * col("sy")).as("cov_num"),
        (col("n_pairs") * col("sxx") - col("sx") * col("sx")).as("varx_num"),
        (col("n_pairs") * col("syy") - col("sy") * col("sy")).as("vary_num")
      )
      .withColumn(
        "white_lag1",
        expr(
          """CASE WHEN CAST(cov_num AS DECIMAL(38,0)) * cov_num * n_pairs * 10000
            |  <= CAST(38416 AS DECIMAL(38,0)) * varx_num * vary_num THEN 1L ELSE 0L END""".stripMargin
        )
      )
  }
}
