package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.FixedPoint._
import graft.operators.TimeSeries

/** The reference's storage format, re-expressed as a distributed
  * block-columnar codec (timebox.py to_file/from_file; the format
  * mechanics live in timebox_tag.py and the utils modules):
  *
  *   - points are grouped into (series, day) blocks — the reference's
  *     one-file-per-timebox becomes one ROW per block, so encode is one
  *     shuffle and blocks spread across executors at any scale;
  *   - per block, timestamps are start + unit-compressed deltas
  *     (timebox.py:363-376 date differentials;
  *     datetime_utils.py:118-142 unit ladder);
  *   - each TAG column (the reference supports any number of numeric
  *     tags per timebox, timebox_tag.py) is fixed-point encoded and
  *     offset from the block min (mode-'m' compression,
  *     numpy_utils.py:187-241), with the reference's width plan
  *     (binary.py:5-43) recorded per block per tag;
  *   - decode reverses losslessly: cumulative-sum the deltas back to
  *     absolute micros, add each tag's offsets back to its min.
  *
  * Parquet supplies the physical byte packing (dictionary/RLE/bit
  * width); the *semantic* compression — delta, unit, min-ref, width
  * plan — is the engine's, exactly as in the reference.
  */
object TimeboxStore {

  private val DayUs = 86400000000L
  private val UnitLadder = Seq(86400000000L, 3600000000L, 60000000L, 1000000L, 1000L)

  private def widthOf(c: Column): Column =
    when(c < 256L, 1).when(c < 65536L, 2).when(c < 4294967296L, 4).otherwise(8)

  /** Encode a points frame into block-columnar form: one row per
    * (series, day) block, any number of integer tag columns. Pure
    * DataFrame transform — `.write.parquet(...)` the result to persist.
    *
    * @param points  frame with seriesCol, tsCol (epoch micros), seqCol
    *                (unique within series — the deterministic tiebreak),
    *                and one LongType column per tag
    * @param histBins when > 0, each tag additionally stores a per-block
    *                equal-width VALUE HISTOGRAM (`hw_t` bin width,
    *                `hist_t` counts) — the summary quantile reads
    *                ([[kthSmallestEncoded]]) narrow on without decoding
    * @param maxPointsPerBlock when > 0, a (series, day) group holding
    *                more points splits into seq-ordered SUB-BLOCKS of at
    *                most this many points — the skew valve for hot
    *                series (a 1 kHz counter is ~86M points/day; one
    *                collect_list row that size is the single-task hole
    *                the cap closes). Decode already keys its cumulative
    *                sums per physical block row, so sub-blocks decode
    *                transparently; readers prune on day_id exactly as
    *                before.
    */
  def encode(
      points: DataFrame,
      seriesCol: String = "user_id",
      tsCol: String = "ts_us",
      seqCol: String = "event_id",
      tagCols: Seq[String] = Seq("value_c"),
      blockUs: Long = DayUs,
      histBins: Int = 0,
      maxPointsPerBlock: Int = 0
  ): DataFrame = {
    val pts = sort_array(
      collect_list(struct((Seq(tsCol, seqCol) ++ tagCols).map(col): _*))
    )
    val projected = points
      .select(
        Seq(
          col(seriesCol).as("series_id"),
          expr(s"$tsCol DIV ${blockUs}L").as("day_id"),
          col(tsCol),
          col(seqCol)
        ) ++ tagCols.map(col): _*
      )
    // the sub-block index needs a per-(series, day) ordered row number:
    // one window on the SAME key the groupBy shuffles on, so the
    // grouping reuses the window's partitioning (subset-key clustering
    // — no second shuffle)
    val grouped =
      if (maxPointsPerBlock <= 0)
        projected.groupBy(col("series_id"), col("day_id")).agg(pts.as("pts"))
      else
        projected
          .withColumn(
            "sub_id",
            ((row_number().over(
              Window.partitionBy(col("series_id"), col("day_id")).orderBy(col(tsCol), col(seqCol))
            ) - 1) / maxPointsPerBlock).cast("long")
          )
          .groupBy(col("series_id"), col("day_id"), col("sub_id"))
          .agg(pts.as("pts"))
    val base = grouped
      .select(
        Seq(
          col("series_id"),
          col("day_id"),
          expr(s"pts[0].$tsCol").as("start_us"),
          expr(s"transform(pts, (p, i) -> IF(i = 0, 0L, p.$tsCol - pts[i-1].$tsCol))").as("deltas_us"),
          expr(s"transform(pts, p -> p.$seqCol)").as("seqs")
        ) ++ tagCols.map(t => expr(s"transform(pts, p -> p.$t)").as(s"vals_$t")): _*
      )
      .withColumn(
        "unit_us",
        UnitLadder.foldRight(lit(1L)) { (u, fallback) =>
          when(forall(col("deltas_us"), d => d % u === 0), lit(u)).otherwise(fallback)
        }
      )
      .withColumn("deltas", expr("transform(deltas_us, d -> d DIV unit_us)"))
      .withColumn("delta_bytes", widthOf(coalesce(array_max(col("deltas")), lit(0L))))
    // per tag: block min/max (the ZONE MAP value-skipping reads prune
    // on), a 256-bit / 2-hash BLOOM filter over the block's values
    // (equality predicates skip blocks zone maps can't — a wide
    // [min, max] says nothing about one missing value), a DISTINCT-
    // VALUE DICTIONARY when the block is low-cardinality (<= 16
    // distinct values: exact membership, zero false positives — the
    // skip structure enum-like tags deserve; high-cardinality tags
    // store NULL and fall back to the bloom), then the ENCODING-MODE
    // CHOICE: min-ref offsets ('m') vs zigzag deltas ('d') vs
    // DELTA-OF-DELTA ('D', Gorilla-style: per-block header carries the
    // first value and first delta, the payload is zigzagged SECOND
    // differences), whichever width plan prices the block narrower.
    // Slow-moving tags (counters, drifting gauges) delta-pack to 1-2
    // bytes where min-ref pays the full block range; near-LINEAR tags
    // (regular counters, ramps, row-indexed sequences) second-diff to
    // ~0 where even the delta mode pays the slope every element; noisy
    // tags keep min-ref. The choice is per block per tag, recorded in
    // the layout, so decode needs no global knowledge.
    val withTags = tagCols.foldLeft(base) { (df, t) =>
      df.withColumn(s"min_$t", array_min(col(s"vals_$t")))
        .withColumn(s"max_$t", array_max(col(s"vals_$t")))
        .withColumn(
          s"dict_$t",
          expr(
            s"IF(size(array_distinct(vals_$t)) <= $DictMaxCard, sort_array(array_distinct(vals_$t)), NULL)"
          )
        )
        .withColumn(
          s"bloom_$t",
          expr(
            s"""aggregate(vals_$t, array(0L, 0L, 0L, 0L), (acc, v) -> transform(acc, (a, i) ->
               |  a | IF(pmod(xxhash64('b1', v), 256) DIV 64 = i,
               |         shiftleft(1L, CAST(pmod(xxhash64('b1', v), 256) % 64 AS INT)), 0L)
               |    | IF(pmod(xxhash64('b2', v), 256) DIV 64 = i,
               |         shiftleft(1L, CAST(pmod(xxhash64('b2', v), 256) % 64 AS INT)), 0L)))""".stripMargin
          )
        )
        .withColumn(s"offs_m_$t", expr(s"transform(vals_$t, v -> v - min_$t)"))
        // deltas: first element from the block min, then value-to-value;
        // zigzag ((d << 1) ^ (d >> 63)) maps signed deltas to small
        // unsigned codes the shared width plan can price
        .withColumn(
          s"offs_d_$t",
          expr(s"transform(vals_$t, (v, i) -> IF(i = 0, v - min_$t, v - vals_$t[i - 1]))")
        )
        .withColumn(s"offs_d_$t", expr(s"transform(offs_d_$t, d -> shiftleft(d, 1) ^ shiftright(d, 63))"))
        // delta-of-delta: header = (v[0]-min, d1 = v[1]-v[0]); payload
        // positions 0 and 1 are structural zeros (the header carries
        // them) so the width plan prices only the true second diffs —
        // without the header split, d1 alone would push a jittery ramp
        // back to the delta mode's width
        .withColumn(s"hdr0_$t", expr(s"vals_$t[0] - min_$t"))
        .withColumn(s"hdr1_$t", expr(s"IF(size(vals_$t) > 1, vals_$t[1] - vals_$t[0], 0L)"))
        .withColumn(
          s"offs_dd_$t",
          expr(
            s"transform(vals_$t, (v, i) -> IF(i <= 1, 0L, (v - vals_$t[i-1]) - (vals_$t[i-1] - vals_$t[i-2])))"
          )
        )
        .withColumn(s"offs_dd_$t", expr(s"transform(offs_dd_$t, d -> shiftleft(d, 1) ^ shiftright(d, 63))"))
        .withColumn(s"bytes_m_$t", widthOf(coalesce(array_max(col(s"offs_m_$t")), lit(0L))))
        .withColumn(s"bytes_d_$t", widthOf(coalesce(array_max(col(s"offs_d_$t")), lit(0L))))
        .withColumn(s"bytes_dd_$t", widthOf(coalesce(array_max(col(s"offs_dd_$t")), lit(0L))))
        .withColumn(
          s"mode_$t",
          when(col(s"bytes_dd_$t") < least(col(s"bytes_m_$t"), col(s"bytes_d_$t")), lit("D"))
            .when(col(s"bytes_d_$t") < col(s"bytes_m_$t"), lit("d"))
            .otherwise(lit("m"))
        )
        .withColumn(
          s"offs_$t",
          when(col(s"mode_$t") === "D", col(s"offs_dd_$t"))
            .when(col(s"mode_$t") === "d", col(s"offs_d_$t"))
            .otherwise(col(s"offs_m_$t"))
        )
        .withColumn(s"bytes_$t", least(col(s"bytes_m_$t"), col(s"bytes_d_$t"), col(s"bytes_dd_$t")))
        .transform(d =>
          if (histBins <= 0) d
          else
            // equal-width bins over the block's own [min, max]; width
            // `(range DIV nb) + 1` keeps every value's bin index in
            // [0, nb) by integer math alone. 16 longs per block — the
            // same footprint class as the bloom.
            d.withColumn(s"hw_$t", expr(s"(max_$t - min_$t) DIV $histBins + 1"))
              .withColumn(
                s"hist_$t",
                expr(
                  s"transform(sequence(0, ${histBins - 1}), " +
                    s"j -> CAST(size(filter(vals_$t, v -> (v - min_$t) DIV hw_$t = j)) AS BIGINT))"
                )
              )
        )
    }
    withTags.select(
      Seq(
        col("series_id"),
        col("day_id"),
        // block granularity is LAYOUT METADATA: readers derive their
        // day_id pruning bounds from it, so a compacted (7-day) or
        // coarse-block (32-day multitag) store range-reads correctly
        lit(blockUs).as("block_us"),
        col("start_us"),
        col("unit_us"),
        size(col("deltas")).cast("long").as("n_points"),
        col("delta_bytes"),
        col("deltas"),
        col("seqs")
      ) ++ tagCols.flatMap(t =>
        Seq(
          col(s"min_$t"),
          col(s"max_$t"),
          col(s"bloom_$t"),
          col(s"dict_$t"),
          col(s"mode_$t"),
          col(s"hdr0_$t"),
          col(s"hdr1_$t"),
          col(s"offs_$t"),
          col(s"bytes_$t")
        ) ++ (if (histBins > 0) Seq(col(s"hw_$t"), col(s"hist_$t")) else Nil)
      ): _*
    )
  }

  /** Per-block dictionary cap: above this many distinct values a tag's
    * dictionary is dropped (NULL) and equality probes fall back to the
    * bloom. 16 longs ≈ the bloom's own 4-word footprint — the
    * dictionary is never the bigger structure.
    */
  private[sources] val DictMaxCard = 16

  /** Read the store's block granularity from its layout metadata — a
    * tiny aggregate over one column (parquet stats make it near-free).
    * A store must be single-granularity; mixing blockUs in one path
    * would make day_id ranges ambiguous, so it throws loudly instead
    * of silently dropping blocks.
    */
  private[sources] def storedBlockUs(store: DataFrame): Long = {
    val r = store.agg(min(col("block_us")), max(col("block_us"))).head()
    val (lo, hi) = (r.getLong(0), r.getLong(1))
    require(lo == hi, s"mixed block granularities in one store path: $lo vs $hi")
    lo
  }

  /** Decode block-columnar rows back to one row per point. Lossless
    * inverse of [[encode]]: posexplode + running-sum of deltas per
    * block. The cumulative window shuffles on the block key — the same
    * key encode aggregated on, so with a bucketed block layout this is
    * co-located; block size bounds the sort, not series length.
    */
  def decode(blocks: DataFrame, tagCols: Seq[String] = Seq("value_c")): DataFrame = {
    val zipped = (Seq("deltas", "seqs") ++ tagCols.map(t => s"offs_$t")).mkString("arrays_zip(", ", ", ")")
    // the cumulative window runs per BLOCK, not per (series, day): an
    // append-mode store (streaming ingest, micro-batch boundaries) can
    // legally hold several partial blocks for one (series, day), and
    // their pos sequences must not interleave. block_id is a content
    // hash of the block row — stable, shuffle-safe, never stored.
    val w = Window
      .partitionBy("series_id", "day_id", "block_id")
      .orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    blocks
      // block_id must be unique PER PHYSICAL ROW, not a content hash:
      // at-least-once replay (crash-recovered foreachBatch ingest) can
      // leave two byte-identical block rows, and a shared id would
      // interleave their cumulative delta sums into corrupt timestamps.
      // monotonically_increasing_id is stable per (partition, position),
      // unique across rows, and never stored; duplicate blocks then
      // decode into clean duplicate POINTS a downstream (series, seq)
      // dedupe can drop.
      .withColumn("block_id", monotonically_increasing_id())
      .select(
        Seq(
          col("series_id"),
          col("day_id"),
          col("block_id"),
          col("start_us"),
          col("unit_us"),
          posexplode(expr(zipped)).as(Seq("pos", "p"))
        ) ++ tagCols.flatMap(t =>
          Seq(col(s"min_$t"), col(s"mode_$t"), col(s"hdr0_$t"), col(s"hdr1_$t"))
        ): _*
      )
      .withColumn("ts_us", col("start_us") + sum(col("p.deltas")).over(w) * col("unit_us"))
      // mode-'d' tags: un-zigzag ((zz >> 1) ^ -(zz & 1)) and running-sum
      // the deltas over the same block window the timestamps use.
      // mode-'D' tags need a SECOND running sum (sum of sums turns
      // second diffs back into value offsets); both windows share the
      // block partitioning, so the sort is paid once.
      .transform(df =>
        tagCols.foldLeft(df) { (d, t) =>
          d.withColumn(s"cum_$t", sum(expr(s"shiftright(p.offs_$t, 1) ^ -(p.offs_$t & 1)")).over(w))
        }
      )
      .transform(df =>
        tagCols.foldLeft(df) { (d, t) =>
          d.withColumn(s"cum2_$t", sum(col(s"cum_$t")).over(w))
        }
      )
      .select(
        Seq(
          col("series_id"),
          col("ts_us"),
          col("p.seqs").as("seq")
        ) ++ tagCols.map(t =>
          // 'D': v[i] = min + hdr0 + i*hdr1 + ΣΣ dd (positions 0/1 of
          // the payload are structural zeros, so the double sum starts
          // contributing exactly at i = 2 — see encode)
          when(
            col(s"mode_$t") === "D",
            col(s"min_$t") + col(s"hdr0_$t") + col("pos") * col(s"hdr1_$t") + col(s"cum2_$t")
          )
            .when(col(s"mode_$t") === "d", col(s"min_$t") + col(s"cum_$t"))
            .otherwise(col(s"min_$t") + col(s"p.offs_$t"))
            .as(t)
        ): _*
      )
  }

  /** AGGREGATE PUSHDOWN into the encoded store: per-series COUNT / SUM
    * / MIN / MAX computed from block rows ALONE — no posexplode, no
    * cumulative window, no point materialization. This is the read
    * path that makes the block layout pay at 100 TB: a fleet-wide
    * "sum per series over six months" touches each block row once,
    * does closed-form array math on the encoded payload, and ships one
    * partial aggregate per block.
    *
    *   - count: Σ n_points;  min/max: the zone maps, free;
    *   - sum, per encoding mode (exact integer algebra, never decode):
    *     'm'  Σv = n·min + Σ offs
    *     'd'  v_i - min is the prefix sum of deltas, so
    *          Σv = n·min + Σ_j (n-j)·d_j   (one indexed transform)
    *     'D'  v_i = min + hdr0 + i·hdr1 + ΣΣdd, so
    *          Σv = n·(min+hdr0) + hdr1·n(n-1)/2
    *               + Σ_k T(n-k)·dd_k  with T(m)=m(m+1)/2
    */
  def aggregateEncoded(blocks: DataFrame, tag: String = "value_c"): DataFrame =
    aggregateEncodedMulti(blocks, Seq(tag))

  /** Multi-tag [[aggregateEncoded]]: ONE scan of the block store and
    * ONE shuffle produce every tag's pushdown aggregate — the shape a
    * dashboard's "all metrics per series" query wants (per-tag calls
    * would re-scan the store once per metric).
    */
  /** Closed-form block SUM for one tag — the mode-branch algebra shared
    * by [[aggregateEncodedMulti]] and the facade's aggregate pushdown.
    */
  private[sources] def blockSumExpr(t: String): Column = {
    val unzig = (z: String) => s"(shiftright($z, 1) ^ -($z & 1))"
    when(
      col(s"mode_$t") === "m",
      col("n_points") * col(s"min_$t") + expr(s"aggregate(offs_$t, 0L, (a, x) -> a + x)")
    ).when(
      col(s"mode_$t") === "d",
      col("n_points") * col(s"min_$t") +
        expr(
          s"aggregate(transform(offs_$t, (z, i) -> (n_points - i) * ${unzig("z")}), 0L, (a, x) -> a + x)"
        )
    ).otherwise(
      col("n_points") * (col(s"min_$t") + col(s"hdr0_$t")) +
        col(s"hdr1_$t") * expr("(n_points * (n_points - 1)) DIV 2") +
        expr(
          s"aggregate(transform(offs_$t, (z, i) -> " +
            s"(((n_points - i) * (n_points - i + 1)) DIV 2) * ${unzig("z")}), 0L, (a, x) -> a + x)"
        )
    )
  }

  def aggregateEncodedMulti(blocks: DataFrame, tags: Seq[String]): DataFrame = {
    val withSums = tags.foldLeft(blocks) { (df, t) =>
      df.withColumn(s"block_sum_$t", blockSumExpr(t))
    }
    withSums
      .groupBy(col("series_id"))
      .agg(
        sum(col("n_points")).as("n_points"),
        tags.flatMap(t =>
          Seq(
            sum(col(s"block_sum_$t")).as(s"sum_$t"),
            min(col(s"min_$t")).as(s"min_$t"),
            max(col(s"max_$t")).as(s"max_$t")
          )
        ): _*
      )
  }

  /** Oracle-gated pushdown aggregate (ts_store_agg_pushdown): encode →
    * persist → per-series summary straight off the block rows. The
    * oracle recomputes from raw events; StoreSpec additionally pins
    * that the plan contains NO generate/explode and NO window — the
    * proof the aggregate never decoded a point.
    */
  /** ts_store_format_agg — the dashboard aggregate THROUGH the public
    * `timebox` format: a plain `groupBy(series).agg(count/sum/min/max
    * + ts bounds)` over `spark.read.format("timebox")`, answered by
    * the ScanBuilder's COMPLETE aggregate pushdown — block metadata +
    * the closed-form mode algebra, no point decoded (FormatSpec pins
    * that the outer plan carries no re-aggregation and the inner plan
    * no explode). Oracle = the same aggregate over raw events.
    */
  def formatAggSummary(spark: SparkSession, dir: String): DataFrame = {
    // read-only pushdown drill over the shared encoded events store
    val out = eventsStoreFixture(spark, dir)
    spark.read.format("timebox").load(out)
      .groupBy(col("series_id"))
      .agg(
        count(col("value_c")).as("n_points"),
        sum(col("value_c")).as("sum_value_c"),
        min(col("value_c")).as("min_value_c"),
        max(col("value_c")).as("max_value_c"),
        min(col("ts_us")).as("min_ts_us"),
        max(col("ts_us")).as("max_ts_us")
      )
      .withColumnRenamed("series_id", "user_id")
  }

  /** ts_store_format_write — the WRITE half of the public format,
    * end to end: history splits at the midpoint day, the first half
    * goes in with `df.write.format("timebox").mode("overwrite")`, the
    * second with `mode("append")` (blocks are self-contained — append
    * is new block files, no read-modify-write), and the verification
    * read comes back through `spark.read.format("timebox")` as a
    * per-series summary. The oracle recomputes from raw events, so a
    * single mis-encoded point (either half) or a dropped/duplicated
    * block on append breaks the hash match. Input is the POINT schema
    * the read side produces — write∘read round-trips compose without
    * renaming.
    */
  def formatWriteRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = scratchPath("graft_store_fmtw", dir)
    val pts = TimeSeries
      .eventsUs(spark, dir)
      .select(
        col("user_id").as("series_id"),
        col("ts_us"),
        col("event_id").as("seq"),
        cents(col("value")).as("value_c")
      )
    val mm = pts.agg(min(expr(s"ts_us DIV ${DayUs}L")), max(expr(s"ts_us DIV ${DayUs}L"))).head()
    val splitDay = (mm.getLong(0) + mm.getLong(1) + 1) / 2
    pts
      .filter(expr(s"ts_us DIV ${DayUs}L < ${splitDay}L"))
      .write.format("timebox").mode("overwrite").save(out)
    pts
      .filter(expr(s"ts_us DIV ${DayUs}L >= ${splitDay}L"))
      .write.format("timebox").mode("append").save(out)
    spark.read
      .format("timebox")
      .load(out)
      .groupBy(col("series_id"))
      .agg(
        count(col("value_c")).as("n_points"),
        sum(col("value_c")).as("sum_value_c"),
        sum(col("seq")).as("sum_event_id"),
        min(col("ts_us")).as("min_ts_us"),
        max(col("ts_us")).as("max_ts_us")
      )
      .withColumnRenamed("series_id", "user_id")
  }

  /** ts_store_stream_write — the STREAMING write door on the public
    * format, end to end: the first half of history lands through the
    * batch writer (`df.write.format("timebox")`), the second arrives
    * as a STREAM and lands through the sink
    * (`df.writeStream.format("timebox")` — [[TimeboxStreamSink]]: the
    * same encode pipeline per micro-batch, exactly-once over replays
    * via batchId-deterministic block names + commit markers), and the
    * verification read comes back through `spark.read.format
    * ("timebox")`. Same output contract and ORACLE as
    * ts_store_format_write: the drained store must summarize exactly
    * like the one-shot batch-written store — 24/7 ingest and nightly
    * batch loads are pinned to the same bytes-on-disk semantics.
    */
  def streamWriteRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val out = scratchPath("graft_store_stw", dir)
    val pts = TimeSeries
      .eventsUs(spark, dir)
      .select(
        col("user_id").as("series_id"),
        col("ts_us"),
        col("event_id").as("seq"),
        cents(col("value")).as("value_c")
      )
    val mm = pts.agg(min(expr(s"ts_us DIV ${DayUs}L")), max(expr(s"ts_us DIV ${DayUs}L"))).head()
    val splitDay = (mm.getLong(0) + mm.getLong(1) + 1) / 2
    pts
      .filter(expr(s"ts_us DIV ${DayUs}L < ${splitDay}L"))
      .write.format("timebox").mode("overwrite").save(out) // also clears old markers/checkpoint
    val stream = spark.readStream
      .schema(Tables.eventsFileSchema(spark, dir))
      .parquet(s"$dir/events.parque[t]")
      .transform(Tables.normalizeEventsTs)
      .select(
        col("user_id").as("series_id"),
        expr("ts DIV 1000").as("ts_us"),
        col("event_id").as("seq"),
        cents(col("value")).as("value_c")
      )
      .filter(expr(s"ts_us DIV ${DayUs}L >= ${splitDay}L"))
    val q = stream.writeStream
      .format("timebox")
      .option("checkpointLocation", s"$out/_checkpoint")
      .trigger(Trigger.AvailableNow())
      .start(out)
    q.awaitTermination()
    spark.read
      .format("timebox")
      .load(out)
      .groupBy(col("series_id"))
      .agg(
        count(col("value_c")).as("n_points"),
        sum(col("value_c")).as("sum_value_c"),
        sum(col("seq")).as("sum_event_id"),
        min(col("ts_us")).as("min_ts_us"),
        max(col("ts_us")).as("max_ts_us")
      )
      .withColumnRenamed("series_id", "user_id")
  }

  /** ts_store_stream_commit — the STREAM → CATALOG composition closing
    * read/write streaming symmetry: the raw-sink door
    * (ts_store_stream_write) lands block files a streaming READER
    * cannot tail; this drill streams through the VERSION-COMMITTING
    * sink ([[TimeboxCatalogStreamSink]] — one snapshot commit per
    * micro-batch, exactly-once over replays via batch-deterministic
    * snapshot names + the hard-link CAS), so the drained store is
    * simultaneously batch-readable, time-travelable, and
    * stream-tailable by the catalog streaming source. First half of
    * history commits as version 1 through the batch path, the second
    * half drains as a stream into the same root, and the verification
    * read comes back through the format door over the composed
    * versions. SAME oracle as ts_store_format_write /
    * ts_store_stream_write — all three write doors pinned to the same
    * decoded rows. Reference: timebox.py:102-123 read/write symmetry.
    */
  def streamCommitRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val root = scratchPath("graft_store_stc", dir)
    deleteRecursively(new java.io.File(root)) // versions are absolute
    val pts = TimeSeries
      .eventsUs(spark, dir)
      .select(
        col("user_id").as("series_id"),
        col("ts_us"),
        col("event_id").as("seq"),
        cents(col("value")).as("value_c")
      )
    val mm = pts.agg(min(expr(s"ts_us DIV ${DayUs}L")), max(expr(s"ts_us DIV ${DayUs}L"))).head()
    val splitDay = (mm.getLong(0) + mm.getLong(1) + 1) / 2
    SnapshotCatalog.commit(
      spark,
      root,
      p =>
        encode(pts.filter(expr(s"ts_us DIV ${DayUs}L < ${splitDay}L")), "series_id", "ts_us", "seq", Seq("value_c"))
          .write.parquet(p)
    )
    val stream = spark.readStream
      .schema(Tables.eventsFileSchema(spark, dir))
      .parquet(s"$dir/events.parque[t]")
      .transform(Tables.normalizeEventsTs)
      .select(
        col("user_id").as("series_id"),
        expr("ts DIV 1000").as("ts_us"),
        col("event_id").as("seq"),
        cents(col("value")).as("value_c")
      )
      .filter(expr(s"ts_us DIV ${DayUs}L >= ${splitDay}L"))
    val q = stream.writeStream
      .format("timebox")
      .option("checkpointLocation", s"$root/_checkpoint")
      .trigger(Trigger.AvailableNow())
      .start(root) // commits/ exists → the version-committing sink
    q.awaitTermination()
    spark.read
      .format("timebox")
      .load(root)
      .groupBy(col("series_id"))
      .agg(
        count(col("value_c")).as("n_points"),
        sum(col("value_c")).as("sum_value_c"),
        sum(col("seq")).as("sum_event_id"),
        min(col("ts_us")).as("min_ts_us"),
        max(col("ts_us")).as("max_ts_us")
      )
      .withColumnRenamed("series_id", "user_id")
  }

  def aggPushdownSummary(spark: SparkSession, dir: String): DataFrame = {
    val tags = Seq("value_c", "counter_c", "trend_c")
    // read-only closed-form aggregate over a shared encoded store
    val out = sharedFixture("graft_store_aggp", dir) { p =>
      encode(counterPoints(spark, dir), tagCols = tags, blockUs = 32 * DayUs)
        .write.mode("overwrite").parquet(p)
    }
    val blocks = spark.read.parquet(out)
    // all three encoding modes feed the same closed-form sum: value_c
    // stays min-ref, counter_c picks zigzag-delta, trend_c picks
    // delta-of-delta (StoreSpec pins the split) — ONE scan, ONE
    // shuffle, no decode
    aggregateEncodedMulti(blocks, tags)
      .select(
        Seq(col("series_id").as("user_id"), col("n_points")) ++
          tags.flatMap(t => Seq(col(s"sum_$t"), col(s"min_$t"), col(s"max_$t"))): _*
      )
  }

  /** TIME-RANGE aggregate pushdown — the warehouse query ("sum per
    * series for these two weeks") composed from the two read paths:
    * blocks FULLY INSIDE the range aggregate closed-form off their
    * encoded rows ([[aggregateEncodedMulti]] — no decode), and only
    * the (at most two per series-granularity) BOUNDARY blocks that
    * straddle a range edge decode and filter point-wise. Day-id
    * pruning drops everything else before IO. At 100 TB a quarter
    * query touches ~90 interior block rows per series closed-form and
    * decodes 2.
    */
  def aggregateEncodedRange(
      store: DataFrame,
      startUs: Long,
      endUs: Long,
      tags: Seq[String]
  ): DataFrame = {
    val blockUs = storedBlockUs(store)
    val inRange = store.filter(
      col("day_id") >= startUs / blockUs && col("day_id") <= (endUs - 1) / blockUs
    )
    // BLOCK-ALIGNED fast path: when both edges sit on block boundaries
    // (the dashboard "last N whole days" case) every in-range block is
    // interior — no boundary branch, no decode, no union; on a
    // series-bucketed layout the whole aggregate then runs with zero
    // exchanges
    if (startUs % blockUs == 0 && endUs % blockUs == 0)
      return aggregateEncodedMulti(inRange, tags)
    val interiorCond =
      col("day_id") * blockUs >= startUs && (col("day_id") + 1) * blockUs <= endUs
    val aggI = aggregateEncodedMulti(inRange.filter(interiorCond), tags)
    val aggB = decode(inRange.filter(!interiorCond), tags)
      .filter(col("ts_us") >= startUs && col("ts_us") < endUs)
      .groupBy(col("series_id"))
      .agg(
        count(lit(1)).as("n_points"),
        tags.flatMap(t =>
          Seq(
            sum(col(t)).as(s"sum_$t"),
            min(col(t)).as(s"min_$t"),
            max(col(t)).as(s"max_$t")
          )
        ): _*
      )
    aggI
      .unionByName(aggB)
      .groupBy(col("series_id"))
      .agg(
        sum(col("n_points")).as("n_points"),
        tags.flatMap(t =>
          Seq(
            sum(col(s"sum_$t")).as(s"sum_$t"),
            min(col(s"min_$t")).as(s"min_$t"),
            max(col(s"max_$t")).as(s"max_$t")
          )
        ): _*
      )
  }

  /** Oracle-gated range pushdown (ts_store_agg_range): a deliberately
    * MISALIGNED two-week range over day blocks, so both edges force
    * the boundary-decode path while the 12 interior days stay
    * closed-form. The oracle is the same range aggregate over raw
    * events.
    */
  def rangeAggSummary(spark: SparkSession, dir: String): DataFrame = {
    // read-only range-pushdown drill over a shared encoded store
    val out = sharedFixture("graft_store_rng", dir) { p =>
      val pts = TimeSeries
        .eventsUs(spark, dir)
        .select(
          col("user_id").as("series_id"),
          col("ts_us"),
          col("event_id").as("seq"),
          cents(col("value")).as("value_c")
        )
      encode(pts, "series_id", "ts_us", "seq", Seq("value_c"))
        .write.mode("overwrite").parquet(p)
    }
    // 2024-01-08 12:00 .. 2024-01-21 12:00 — half-day offsets on both ends
    val (startUs, endUs) = (1704715200000000L, 1705838400000000L)
    aggregateEncodedRange(spark.read.parquet(out), startUs, endUs, Seq("value_c"))
      .select(
        col("series_id").as("user_id"),
        col("n_points"),
        col("sum_value_c"),
        col("min_value_c"),
        col("max_value_c")
      )
  }

  /** Oracle-gated HYBRID-LAYOUT aggregate pushdown
    * (ts_store_hybrid_agg): the three storage levers composed in ONE
    * query — day partitions PRUNE the scan, the block-aligned range
    * aggregates CLOSED-FORM off encoded rows (no decode branch at
    * all), and the series-bucketed layout makes the per-series groupBy
    * exchange-free. At 100 TB this is the "sum per series for two
    * whole weeks" query: IO = the 14 matching day partitions, network
    * = nothing. StoreSpec pins zero shuffle exchanges AND the
    * partition-pruned scan on the same plan.
    */
  def hybridAggSummary(spark: SparkSession, dir: String): DataFrame = {
    // the bucketed table is a shared READ-ONLY fixture (the aggregate
    // below never mutates it) — built once per (process, dir); the
    // name carries a digest of the input dir so two corpora can never
    // share one table, and validity is checked against the live
    // session's catalog
    val tbl = "graft_hybrid_agg_" + java.security.MessageDigest
      .getInstance("MD5")
      .digest(dir.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.take(8)
    hybridTableReady.getOrElseUpdate(
      tbl,
      t => scala.util.Try(spark.catalog.tableExists(t)).getOrElse(false)
    ) {
      // a prior SESSION's run leaves the managed location behind with
      // no entry in this session's in-memory catalog — drop both, or
      // saveAsTable refuses with LOCATION_ALREADY_EXISTS
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir") + s"/$tbl"
      )
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
      writeHybridStore(spark, dir, tbl)
      tbl
    }
    // 2024-01-08 .. 2024-01-22, both edges day-aligned
    val (startUs, endUs) = (1704672000000000L, 1705881600000000L)
    aggregateEncodedRange(spark.table(tbl), startUs, endUs, Seq("value_c"))
      .select(
        col("series_id").as("user_id"),
        col("n_points"),
        col("sum_value_c"),
        col("min_value_c"),
        col("max_value_c")
      )
  }

  /** Phase 1 of the HISTOGRAM-QUANTILE pushdown: from block summary
    * rows ALONE (per-block equal-width histograms written by
    * [[encode]] with histBins > 0), narrow the k-th-smallest value of
    * a tag to a guaranteed interval per series.
    *
    * Every bin contributes two rank events at its boundaries: a value
    * in [lb, ub) is CERTAINLY below any v >= ub and POSSIBLY below any
    * v > lb. Running sums over the merged boundary set give, at each
    * candidate v, a lower bound (min_rank) and upper bound (max_rank)
    * on count(values < v); then
    *
    *   lo = max v with max_rank < k   (the k-th value is >= lo)
    *   hi = min v with min_rank >= k  (the k-th value is <  hi)
    *
    * min_rank <= max_rank at every v forces lo < hi, and both exist
    * (the smallest lb has max_rank 0, the largest ub has min_rank n).
    * Summary-level math only — bin rows are 16 ints per block, never
    * points.
    *
    * @param kOf rank as a function of the series' total count, e.g.
    *            `n => shiftright(n + 1, 1)` for the lower median
    * @return one row per series: (series_id, lo, hi, k, n)
    */
  def quantileBounds(store: DataFrame, tag: String, kOf: Column => Column): DataFrame = {
    val bins = store
      .select(
        col("series_id"),
        col(s"min_$tag").as("bmin"),
        col(s"hw_$tag").as("w"),
        posexplode(col(s"hist_$tag")).as(Seq("j", "c"))
      )
      .filter(col("c") > 0)
      .select(
        col("series_id"),
        (col("bmin") + col("j") * col("w")).as("lb"),
        (col("bmin") + (col("j") + 1) * col("w")).as("ub"),
        col("c")
      )
    val events = bins
      .select(col("series_id"), col("lb").as("v"), lit(0L).as("certain"), col("c").as("possible"))
      .unionByName(
        bins.select(col("series_id"), col("ub").as("v"), col("c").as("certain"), lit(0L).as("possible"))
      )
      .groupBy(col("series_id"), col("v"))
      .agg(sum("certain").as("certain"), sum("possible").as("possible"))
    val byV = Window.partitionBy("series_id").orderBy(col("v"))
    events
      // count(< v) bounds: certain values sit in bins with ub <= v
      // (frame through current row), possible ones in bins with lb < v
      // (frame ends one BELOW current row — rangeBetween on the Long
      // boundary value, so ties collapse correctly)
      .withColumn(
        "min_rank",
        coalesce(sum(col("certain")).over(byV.rangeBetween(Window.unboundedPreceding, 0)), lit(0L))
      )
      .withColumn(
        "max_rank",
        coalesce(sum(col("possible")).over(byV.rangeBetween(Window.unboundedPreceding, -1)), lit(0L))
      )
      .withColumn("n", sum(col("possible")).over(Window.partitionBy("series_id")))
      .withColumn("k", kOf(col("n")))
      .groupBy(col("series_id"))
      .agg(
        max(when(col("max_rank") < col("k"), col("v"))).as("lo"),
        min(when(col("min_rank") >= col("k"), col("v"))).as("hi"),
        first(col("k")).as("k"),
        first(col("n")).as("n")
      )
  }

  /** EXACT k-th smallest tag value per series off the encoded store —
    * the quantile member of the pushdown family. Phase 1
    * ([[quantileBounds]]) pins the answer inside [lo, hi) from
    * histogram summaries; phase 2 decodes ONLY the blocks whose
    * [min, max] straddles that interval:
    *
    *   - blocks entirely below lo contribute their n_points to a
    *     closed-form BELOW count (zone map, no decode);
    *   - blocks entirely at/above hi cannot hold values < hi and are
    *     skipped outright;
    *   - the straddlers decode, and the answer is the
    *     (k - below)-th smallest decoded value.
    *
    * At 100 TB a six-month per-series median reads every block's
    * 16-int histogram once and decodes the handful of blocks whose
    * value range crosses the pinned interval — the quantile analogue
    * of [[aggregateEncodedRange]]'s interior/boundary split.
    */
  def kthSmallestEncoded(store: DataFrame, tag: String, kOf: Column => Column): DataFrame = {
    // one row per series, consumed by THREE joins of the returned lazy
    // plan (below-count, straddler filter, final k lookup) — without
    // the persist each join re-runs the whole histogram narrowing
    val bounds = quantileBounds(store, tag, kOf)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val joined = store.join(bounds, "series_id")
    val below = joined
      .groupBy(col("series_id"))
      .agg(sum(when(col(s"max_$tag") < col("lo"), col("n_points")).otherwise(lit(0L))).as("below"))
    val straddlers = joined
      .filter(col(s"max_$tag") >= col("lo") && col(s"min_$tag") < col("hi"))
      .select(store.columns.map(col): _*)
    val byValue = Window.partitionBy("series_id").orderBy(col(tag), col("seq"))
    val out = decode(straddlers, Seq(tag))
      .withColumn("rn", row_number().over(byValue))
      .join(below, "series_id")
      .join(bounds.select(col("series_id"), col("k"), col("n")), "series_id")
      .filter(col("rn") === col("k") - col("below"))
      .select(col("series_id"), col("n").as("n_points"), col(tag).as(s"kth_$tag"))
    graft.operators.Dedup.releaseAfterRun(store.sparkSession, out, Seq(bounds))
  }

  /** Oracle-gated histogram-quantile read (ts_store_quantile_read):
    * encode (noisy value, monotone counter) with 16-bin histograms →
    * persist → exact per-series lower medians without a full decode.
    * The two tags are the two regimes: counter_c is value-LOCALIZED
    * per block (a running total), so the pinned interval straddles ~1
    * block per series and everything else is skipped or counted
    * closed-form; value_c is white noise whose blocks all span the
    * domain — the adversarial case where nothing skips but the answer
    * stays exact. The oracle recomputes both discrete medians from raw
    * events; StoreSpec pins the straddler-set sizes.
    */
  def quantileReadSummary(spark: SparkSession, dir: String): DataFrame = {
    val tags = Seq("value_c", "counter_c")
    // read-only histogram-quantile drill over a shared encoded store
    val out = sharedFixture("graft_store_qnt", dir) { p =>
      val pts = counterPoints(spark, dir)
        .select(
          col("user_id").as("series_id"),
          col("ts_us"),
          col("event_id").as("seq"),
          col("value_c"),
          col("counter_c")
        )
      encode(pts, "series_id", "ts_us", "seq", tags, histBins = 16)
        .write.mode("overwrite").parquet(p)
    }
    val store = spark.read.parquet(out)
    val lowerMedian: Column => Column = n => shiftright(n + 1, 1)
    kthSmallestEncoded(store, "value_c", lowerMedian)
      .select(col("series_id"), col("n_points"), col("kth_value_c").as("p50_value_c"))
      .join(
        kthSmallestEncoded(store, "counter_c", lowerMedian)
          .select(col("series_id"), col("kth_counter_c").as("p50_counter_c")),
        Seq("series_id")
      )
      .select(col("series_id").as("user_id"), col("n_points"), col("p50_value_c"), col("p50_counter_c"))
  }

  /** Point-level UPSERT into an encoded store — the reference's
    * update path is a whole-file decode→merge→rewrite
    * (timebox.py:57-88); distributed, that rewrite must touch ONLY
    * the blocks the new points land in. Mechanics:
    *
    *   1. affected (series, day) keys from the incoming points;
    *   2. untouched blocks PASS THROUGH ENCODED (anti join on the
    *      block key — never decoded, never re-written);
    *   3. touched blocks decode, merge with the incoming points
    *      (identity = (series, seq); incoming wins on conflict), and
    *      re-encode at the store's own granularity.
    *
    * At 100 TB a daily upsert decodes yesterday's blocks, not the
    * store. StoreSpec pins both properties: untouched block rows
    * survive byte-identical, and only one decode appears in the plan.
    *
    * @param newPoints frame with (series_id, ts_us, seq) + tagCols —
    *                  the canonical decoded-point schema
    */
  def upsertBlocks(store: DataFrame, newPoints: DataFrame, tagCols: Seq[String]): DataFrame = {
    val blockUs = storedBlockUs(store)
    val keys = newPoints
      .select(col("series_id"), expr(s"ts_us DIV ${blockUs}L").as("day_id"))
      .distinct()
    val untouched = store.join(keys, Seq("series_id", "day_id"), "left_anti")
    val touched = store.join(keys, Seq("series_id", "day_id"), "left_semi")
    val w = Window
      .partitionBy(col("series_id"), col("seq"))
      .orderBy(col("pri").desc)
    val merged = decode(touched, tagCols)
      .withColumn("pri", lit(0))
      .unionByName(newPoints.withColumn("pri", lit(1)))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("pri", "rn")
    untouched.unionByName(
      encode(merged, "series_id", "ts_us", "seq", tagCols, blockUs)
    )
  }

  /** Oracle-gated upsert roundtrip (ts_store_upsert): encode the
    * events table, upsert a week of MODIFIED points (same (series,
    * seq), shifted values — the correction/restatement shape), decode,
    * summarize. The oracle applies the same correction to raw events,
    * so a lost update, a duplicated point, or a corrupted untouched
    * block all fail the hash.
    */
  def upsertSummary(spark: SparkSession, dir: String): DataFrame = {
    val pts = TimeSeries
      .eventsUs(spark, dir)
      .select(
        col("user_id").as("series_id"),
        col("ts_us"),
        col("event_id").as("seq"),
        cents(col("value")).as("value_c")
      )
    val store = encode(pts, "series_id", "ts_us", "seq", Seq("value_c"))
    val (w2lo, w2hi) = (1704672000000000L, 1705276800000000L) // 2024-01-08 .. 01-15
    val corrections = pts
      .filter(col("ts_us") >= w2lo && col("ts_us") < w2hi)
      .withColumn("value_c", col("value_c") + 1000L)
    decode(upsertBlocks(store, corrections, Seq("value_c")))
      .groupBy(col("series_id").as("user_id"))
      .agg(
        count(lit(1)).as("n_points"),
        sum(col("value_c")).as("sum_value_c"),
        min(col("ts_us")).as("min_ts_us"),
        max(col("ts_us")).as("max_ts_us")
      )
  }

  /** CHANGE DATA FEED between two snapshots of an encoded store — the
    * incremental-consumer primitive (downstream jobs re-process only
    * what changed between versions, never the store). Two stages:
    *
    *   1. BLOCK fingerprint diff: full-outer join the block rows on
    *      (series, day) and compare the entire block payload as one
    *      struct (null-safe). A block unchanged between snapshots is
    *      proven identical WITHOUT decoding — at 100 TB a daily
    *      increment leaves >99% of blocks byte-identical, so the
    *      feed's cost scales with the delta, not the store.
    *   2. Point diff of changed blocks only: decode both sides,
    *      full-outer join on the point identity (series, seq), and
    *      classify insert / delete / update (any tag or timestamp
    *      differing). Points that moved across block boundaries still
    *      diff correctly: both their old and new blocks fingerprint
    *      as changed.
    *
    * Returns the row-level feed: (series_id, seq, ts_us,
    * change_type 'I'|'D'|'U', old_/new_ per tag).
    */
  def changeFeed(storeA: DataFrame, storeB: DataFrame, tagCols: Seq[String]): DataFrame = {
    val keyCols = Seq("series_id", "day_id")
    // Fingerprint over the UNION of both snapshots' content columns
    // (null-filling a column the other side lacks): if B evolved an
    // extra tag family, blocks differing ONLY in the new tag must
    // still fingerprint as changed — deriving the columns from A alone
    // would silently drop their point-level changes from the feed.
    val contentCols =
      (storeA.columns ++ storeB.columns.filterNot(storeA.columns.contains))
        .filterNot(keyCols.contains).toSeq
    val colType = (storeA.schema.fields ++ storeB.schema.fields)
      .map(f => f.name -> f.dataType).toMap
    def blocks(s: DataFrame, as: String) =
      s.select(
        keyCols.map(col) :+
          struct(contentCols.map(c =>
            if (s.columns.contains(c)) col(c) else lit(null).cast(colType(c)).as(c)
          ): _*).as(as): _*
      )
    val changedKeys = blocks(storeA, "blk_a")
      .join(blocks(storeB, "blk_b"), keyCols, "full_outer")
      .filter(!(col("blk_a") <=> col("blk_b")))
      .select(keyCols.map(col): _*)
    def pts(s: DataFrame, pfx: String) =
      decode(s.join(changedKeys, keyCols, "left_semi"), tagCols)
        .select(
          Seq(col("series_id"), col("seq"), col("ts_us").as(s"${pfx}ts_us")) ++
            tagCols.map(t => col(t).as(s"$pfx$t")): _*
        )
    val a = pts(storeA, "old_")
    val b = pts(storeB, "new_")
    val tagDiffers = tagCols
      .map(t => !(col(s"old_$t") <=> col(s"new_$t")))
      .reduce(_ || _)
    a.join(b, Seq("series_id", "seq"), "full_outer")
      .withColumn(
        "change_type",
        when(col("old_ts_us").isNull, "I")
          .when(col("new_ts_us").isNull, "D")
          .when(tagDiffers || col("old_ts_us") =!= col("new_ts_us"), "U")
      )
      .filter(col("change_type").isNotNull)
      .withColumn("ts_us", coalesce(col("new_ts_us"), col("old_ts_us")))
  }

  /** Oracle-gated CDC drill (ts_store_cdc): snapshot v1 = the encoded
    * enum-tagged events; v2 = v1 + a week of value corrections
    * (updates) + a week of cloned late arrivals (inserts, fresh seq)
    * + a store-wide purge of one event-type code (deletes), all
    * applied through the store's own upsert/delete operators and
    * PERSISTED — the feed then diffs the two on-disk snapshots. The
    * oracle replays the same edits over raw events and diffs
    * relationally, so a phantom change (false positive from the block
    * diff) or a missed one (skipped block) breaks the compare.
    */
  def cdcSummary(spark: SparkSession, dir: String): DataFrame = {
    val tags = Seq("value_c", "etype_c")
    val root = cdcAsofFixture(spark, dir)
    val v1 = spark.read.parquet(SnapshotCatalog.resolveAsOf(root, 1L).get.path)
    val v2 = spark.read.parquet(SnapshotCatalog.resolveAsOf(root, 2L).get.path)
    changeFeed(v1, v2, tags)
      .groupBy(col("series_id").as("user_id"))
      .agg(
        sum(when(col("change_type") === "I", 1L).otherwise(0L)).as("n_inserts"),
        sum(when(col("change_type") === "D", 1L).otherwise(0L)).as("n_deletes"),
        sum(when(col("change_type") === "U", 1L).otherwise(0L)).as("n_updates"),
        sum(coalesce(col("new_value_c"), lit(0L)) - coalesce(col("old_value_c"), lit(0L)))
          .as("net_delta_c")
      )
  }

  // bounded + validated (ProcessMemo policy, SURVEY §4): capped at 16
  // remembered fixture roots; a root whose commit log vanished is
  // rebuilt, never served dangling
  private val cdcFixture = new ProcessMemo[String, String](16)

  // bounded + validated (ProcessMemo policy, SURVEY §4): the bucketed
  // hybrid-agg table fixture, one entry per corpus dir
  private val hybridTableReady = new ProcessMemo[String, String](8)

  /** The shared two-version catalog fixture behind ts_store_cdc and
    * ts_store_asof (the storeStreamFixture discipline, r11): version 1
    * is the base encode, version 2 is built THROUGH upsert + predicate
    * delete and committed via [[SnapshotCatalog.commit]] — the exact
    * recipe both drills previously built per call. The two queries
    * price their READ paths (block-fingerprint diff; as-of manifest
    * resolution + snapshot decode) against one shared input; the
    * write/commit machinery itself is priced once here and drilled for
    * races/crashes by StoreSpec and FormatSpec. VERSIONED snapshots are
    * exactly what makes the share safe: v1 and v2 are immutable, so
    * neither query can perturb the other.
    */
  private[graft] def cdcAsofFixture(spark: SparkSession, dir: String): String = {
    val root0 = sharedScratchPath("graft_store_cdcfix", dir)
    cdcFixture.getOrElseUpdate(
      root0,
      r => java.nio.file.Files.isDirectory(java.nio.file.Paths.get(r, "commits"))
    ) {
      val root = root0
      locally {
        // a half-built root (failed earlier attempt) would hold partial
        // commits — rebuild clean
        deleteRecursively(new java.io.File(root))
        val tags = Seq("value_c", "etype_c")
        val (w2lo, w2hi) = (1704672000000000L, 1705276800000000L) // 2024-01-08 .. 01-15
        val (w3lo, w3hi) = (1705276800000000L, 1705881600000000L) // 2024-01-15 .. 01-22
        val ver1 = SnapshotCatalog.commit(
          spark,
          root,
          p => encode(eventTypePoints(spark, dir), tagCols = tags).write.parquet(p)
        )
        val v1 = spark.read.parquet(SnapshotCatalog.resolveAsOf(root, ver1).get.path)
        val p = eventTypePoints(spark, dir)
          .select(
            col("user_id").as("series_id"),
            col("ts_us"),
            col("event_id").as("seq"),
            col("value_c"),
            col("etype_c")
          )
        val corrections = p
          .filter(col("ts_us") >= w2lo && col("ts_us") < w2hi)
          .withColumn("value_c", col("value_c") + 1000L)
        // late-arrival clones: fresh point identity (seq offset clears
        // the event_id range at any tested SF), +1us so the clone is a
        // new instant, not a seq collision
        val lateArrivals = p
          .filter(col("ts_us") >= w3lo && col("ts_us") < w3hi)
          .withColumn("seq", col("seq") + 100000000L)
          .withColumn("ts_us", col("ts_us") + 1L)
        SnapshotCatalog.commit(
          spark,
          root,
          out =>
            deleteWhereEquals(upsertBlocks(v1, corrections.unionByName(lateArrivals), tags), "etype_c", 112L, tags)
              .write.parquet(out)
        )
      }
      root
    }
  }

  /** ts_store_asof — snapshot CATALOG + AS-OF read (the iceberg-lite
    * time-travel story over the store's own mutation operators):
    * version 1 is the base encode, version 2 is built THROUGH upsert +
    * predicate delete (the cdc drill's exact recipe). Both go through
    * [[SnapshotCatalog.commit]] — immutable uuid-named snapshot dirs +
    * an atomic CREATE_NEW commit marker carrying the manifest row
    * (version, path, block/point counts, day span, all from block
    * METADATA) — so a reader racing a commit resolves v_n or v_n+1,
    * never a half-rewritten manifest, and two writers serialize via
    * the marker CAS (the fcntl-lock semantics of timebox.py:405-455,
    * without locks). An AS-OF read resolves the greatest version ≤ the
    * requested one from immutable marker files and decodes only that
    * snapshot. Old versions are never rewritten; time travel costs one
    * listing + one tiny file read.
    */
  def asofReadSummary(spark: SparkSession, dir: String, asofVersion: Long = 2L): DataFrame = {
    val tags = Seq("value_c", "etype_c")
    val root = cdcAsofFixture(spark, dir)
    val chosen = SnapshotCatalog
      .resolveAsOf(root, asofVersion)
      .getOrElse(sys.error(s"no committed version <= $asofVersion under $root"))
    decode(spark.read.parquet(chosen.path), tags)
      .groupBy(col("series_id").as("user_id"))
      .agg(
        count(lit(1)).as("n_points"),
        sum(col("value_c")).as("sum_value_c"),
        min(col("ts_us")).as("min_ts_us"),
        max(col("ts_us")).as("max_ts_us")
      )
      .withColumn("version", lit(chosen.version))
  }

  /** ts_store_catalog — CONTINUOUS-snapshot catalog maintenance, the
    * 24/7 lifecycle over [[SnapshotCatalog]] in one drill: 12 daily
    * snapshots commit (one encoded day of events each), manifests
    * COMPACT mid-stream (after day 8 — so later markers stack on the
    * consolidated file and the read path resolves from BOTH), then
    * retention keeps the newest 5 and deletes expired snapshot data.
    * Output = the retained manifest rows (versions 8-12), whose block/
    * point/day stats the oracle recomputes from raw events — catalog
    * metadata is thereby value-checked, not just spec-checked. Without
    * compaction a 24/7 catalog's marker count grows forever and every
    * resolve lists-and-opens all of it; with it, resolution is one
    * small file + the tail since the last compaction. Assumes per-call
    * scratch (versions are absolute).
    */
  def catalogMaintenanceSummary(
      spark: SparkSession,
      dir: String,
      nDays: Int = 12,
      compactAfter: Int = 8,
      keepLast: Int = 5
  ): DataFrame = {
    import spark.implicits._
    // retention MUTATES the catalog (deletes expired snapshot dirs) —
    // clone the shared daily-commit template (manifest paths rewritten
    // to the clone, [[SnapshotCatalog.cloneRoot]]) so the drill prices
    // its subject: the expire + the manifest read
    val root = SnapshotCatalog.cloneRoot(
      dailyCatalogFixture(spark, dir, nDays, compactAfter),
      scratchPath("graft_store_catalog", dir)
    )
    SnapshotCatalog.expireSnapshots(root, keepLast)
    SnapshotCatalog
      .manifests(root)
      .map(m => (m.version, m.nBlocks, m.nPoints, m.minDay, m.maxDay))
      .toDF("version", "n_blocks", "n_points", "min_day", "max_day")
  }

  /** Shared DAILY-COMMIT catalog fixture: nDays delta snapshots (one
    * truncated-day slice each), manifests compacted after
    * `compactAfter` — the build ts_store_catalog / ts_store_timetravel
    * / ts_store_timetravel_api each re-ran per call. Built at most
    * once per process per (nDays, compactAfter); read-only consumers
    * use the path directly, the retention drill clones it
    * ([[SnapshotCatalog.cloneRoot]]). Versions stay absolute because
    * the template is built fresh in an empty dir.
    */
  private[graft] def dailyCatalogFixture(
      spark: SparkSession,
      dir: String,
      nDays: Int,
      compactAfter: Int
  ): String =
    sharedFixture("graft_store_dailycat", dir, s"n${nDays}_c$compactAfter") { root =>
      val pts = TimeSeries
        .eventsUs(spark, dir)
        .select(col("user_id"), col("ts_us"), col("event_id"), cents(col("value")).as("value_c"))
      // 1-value range plan (the house scalar-aggregate pattern): the
      // first day of history anchors the snapshot schedule.
      // day slices by TRUNCATED-day EQUALITY, not [d*Day, (d+1)*Day)
      // ranges: Spark DIV and DuckDB // both truncate toward zero, so on
      // pre-epoch data the range form and the day-index form disagree
      // (and points below the truncated min-day fall out of every
      // slice); the equality form IS the oracle's grouping on any input
      val d0 = pts.agg(min(expr(s"ts_us DIV ${DayUs}L"))).head().getLong(0)
      (0 until nDays).foreach { i =>
        SnapshotCatalog.commit(
          spark,
          root,
          p => encode(pts.filter(expr(s"ts_us DIV ${DayUs}L") === (d0 + i))).write.parquet(p)
        )
        if (i + 1 == compactAfter) SnapshotCatalog.compactManifests(root): Unit
      }
    }

  /** ts_store_timetravel — TIME TRAVEL over the snapshot catalog, the
    * read-side face of [[catalogMaintenanceSummary]]'s lifecycle: 10
    * daily DELTA snapshots commit (the log-structured append shape —
    * state(v) = union of deltas ≤ v, exactly how a table format's
    * add-files log composes), manifests compact mid-stream (after day
    * 6), then the store is read AS OF version 7 — resolution crosses
    * the compaction boundary on purpose (consolidated manifest rows
    * 1-6 + the stacked marker 7), and versions 8-10 exist but are
    * provably invisible (any leak fails the oracle hash). The as-of
    * read costs one manifest resolution + a parquet union of ≤v
    * snapshot paths — O(1) metadata in the catalog's age, and the
    * decode/aggregate pushes down exactly like any store read.
    * Assumes per-call scratch (versions are absolute).
    */
  def timeTravelSummary(
      spark: SparkSession,
      dir: String,
      nDays: Int = 10,
      compactAfter: Int = 6,
      asOfVersion: Long = 7
  ): DataFrame = {
    // as-of reads are read-only — the shared daily-commit fixture IS
    // the catalog this drill resolves against (built once per process)
    val root = dailyCatalogFixture(spark, dir, nDays, compactAfter)
    val asOf = SnapshotCatalog.manifests(root).filter(_.version <= asOfVersion)
    require(asOf.nonEmpty, s"no committed version <= $asOfVersion")
    decode(spark.read.parquet(asOf.map(_.path): _*))
      .groupBy(col("series_id").as("user_id"))
      .agg(
        count(lit(1)).as("n_points"),
        sum(col("value_c")).as("sum_value_c"),
        min(col("ts_us")).as("min_ts_us"),
        max(col("ts_us")).as("max_ts_us")
      )
  }

  /** ts_store_timetravel_api — [[timeTravelSummary]]'s exact semantics
    * re-expressed through the PUBLIC read door:
    * `spark.read.format("timebox").option("asOf", v).load(root)` — the
    * one-option versioned read the reference's API shape implies
    * (timebox.py:102-123 is "open the store, get the data"; here the
    * version rides the same call). Resolution is
    * [[TimeboxFormat.resolveDataPaths]]: one manifest read, then the
    * ≤v delta union scans like any store read — so the COMPLETE
    * aggregate pushdown fires on this exact query (count/sum/min/max
    * by series answered from block metadata of only the visible
    * versions; FormatSpec pins the plan has no aggregate above the
    * scan AND that versions > v contribute no path). Shares
    * ts_store_timetravel's oracle: any leak from a later version, or a
    * miss of a visible one, fails the hash.
    */
  def timeTravelFormatRead(
      spark: SparkSession,
      dir: String,
      nDays: Int = 10,
      compactAfter: Int = 6,
      asOfVersion: Long = 7
  ): DataFrame = {
    // the format-door as-of read is read-only — same shared fixture as
    // ts_store_timetravel (they share an oracle; now also an input)
    val root = dailyCatalogFixture(spark, dir, nDays, compactAfter)
    spark.read
      .format("timebox")
      .option("asOf", asOfVersion)
      .load(root)
      .groupBy(col("series_id"))
      .agg(
        count(col("value_c")).as("n_points"),
        sum(col("value_c")).as("sum_value_c"),
        min(col("ts_us")).as("min_ts_us"),
        max(col("ts_us")).as("max_ts_us")
      )
      .select(
        col("series_id").as("user_id"),
        col("n_points"), col("sum_value_c"), col("min_ts_us"), col("max_ts_us")
      )
  }

  /** POINT-EXACT retention expiry (TTL) — vacuum's exact sibling.
    * [[vacuum]] drops aged blocks at block granularity and keeps a
    * boundary block whole; production retention ("keep 90 days,
    * exactly") must also trim the straddler. Three-way split, zero
    * decode except at the boundary:
    *
    *   - wholly aged  ((day_id+1)·blockUs ≤ cut): dropped without
    *     decode — at 100 TB, one day's expiry discards whole block
    *     rows by metadata alone;
    *   - wholly live  (start_us ≥ cut, from the block header): pass
    *     through ENCODED, byte-identical;
    *   - straddlers (at most one block per series per expiry run):
    *     decode → drop below-cutoff points → re-encode.
    */
  def ttlExpire(store: DataFrame, cutUs: Long, tagCols: Seq[String]): DataFrame = {
    val blockUs = storedBlockUs(store)
    val wholeAged = (col("day_id") + 1) * blockUs <= cutUs
    val wholeLive = col("start_us") >= cutUs
    val live = store.filter(!wholeAged && wholeLive)
    val straddlers = decode(store.filter(!wholeAged && !wholeLive), tagCols)
      .filter(col("ts_us") >= cutUs)
      .transform(pts => encode(pts, "series_id", "ts_us", "seq", tagCols, blockUs))
    live.unionByName(straddlers)
  }

  /** Oracle-gated TTL drill (ts_store_ttl): encode events, expire
    * everything before a mid-corpus cutoff, decode, summarize per
    * series. The oracle filters raw events at the same cutoff, so an
    * over-eager block drop, a kept aged point, or a corrupted
    * pass-through block all fail the hash.
    */
  def ttlSummary(
      spark: SparkSession,
      dir: String,
      cutUs: Long = 1705276800000000L // 2024-01-15 00:00:00 UTC
  ): DataFrame = {
    val pts = TimeSeries
      .eventsUs(spark, dir)
      .select(
        col("user_id").as("series_id"),
        col("ts_us"),
        col("event_id").as("seq"),
        cents(col("value")).as("value_c")
      )
    val store = encode(pts, "series_id", "ts_us", "seq", Seq("value_c"))
    decode(ttlExpire(store, cutUs, Seq("value_c")))
      .groupBy(col("series_id").as("user_id"))
      .agg(
        count(lit(1)).as("n_points"),
        sum(col("value_c")).as("sum_value_c"),
        min(col("ts_us")).as("min_ts_us"),
        max(col("ts_us")).as("max_ts_us")
      )
  }

  /** MERGE two independently-written store snapshots — the
    * backfill-merge shape: a live-ingest store meets a batch
    * re-statement covering an overlapping time range. Three-way key
    * split on (series, day):
    *
    *   - keys only in A or only in B: blocks pass through ENCODED,
    *     byte-identical (never decoded);
    *   - keys in both: decode both sides, resolve point conflicts by
    *     identity (series, seq) with B — the backfill — winning, and
    *     re-encode at the shared granularity.
    *
    * At 100 TB a one-week backfill decodes one week of overlapping
    * blocks; the rest of both stores moves as opaque rows.
    */
  def mergeStores(storeA: DataFrame, storeB: DataFrame, tagCols: Seq[String]): DataFrame = {
    val blockUs = storedBlockUs(storeA)
    require(storedBlockUs(storeB) == blockUs, "stores must share a block granularity to merge")
    val keyCols = Seq("series_id", "day_id")
    val keysA = storeA.select(keyCols.map(col): _*).distinct()
    val keysB = storeB.select(keyCols.map(col): _*).distinct()
    val onlyA = storeA.join(keysB, keyCols, "left_anti")
    val onlyB = storeB.join(keysA, keyCols, "left_anti")
    val w = Window.partitionBy(col("series_id"), col("seq")).orderBy(col("pri").desc)
    val merged = decode(storeA.join(keysB, keyCols, "left_semi"), tagCols)
      .withColumn("pri", lit(0))
      .unionByName(decode(storeB.join(keysA, keyCols, "left_semi"), tagCols).withColumn("pri", lit(1)))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("pri", "rn")
    onlyA.unionByName(onlyB).unionByName(
      encode(merged, "series_id", "ts_us", "seq", tagCols, blockUs)
    )
  }

  /** Oracle-gated merge drill (ts_store_merge): snapshot A = weeks up
    * to the backfill horizon, snapshot B = a corrected re-statement
    * from the overlap start onward (+500 on every value, same point
    * identities). The merged store must decode to "B wins wherever B
    * covers" — which the oracle recomputes directly from raw events.
    */
  def mergeSummary(spark: SparkSession, dir: String): DataFrame = {
    val pts = TimeSeries
      .eventsUs(spark, dir)
      .select(
        col("user_id").as("series_id"),
        col("ts_us"),
        col("event_id").as("seq"),
        cents(col("value")).as("value_c")
      )
    // boundaries RELATIVE to the data's first (truncated) day — an
    // absolute epoch constant empties one side on a time-shifted slice
    // (the pre-epoch audit) and the merge fixture crashes on it; on the
    // standard 2024 events these resolve to the original Jan 22/Jan 8
    val d0  = pts.agg(min(expr(s"ts_us DIV ${DayUs}L"))).head().getLong(0)
    val aHi = (d0 + 21) * DayUs // A covers history up to here
    val bLo = (d0 + 7) * DayUs  // B re-states from here on
    val a = encode(pts.filter(col("ts_us") < aHi), "series_id", "ts_us", "seq", Seq("value_c"))
    val b = encode(
      pts.filter(col("ts_us") >= bLo).withColumn("value_c", col("value_c") + 500L),
      "series_id",
      "ts_us",
      "seq",
      Seq("value_c")
    )
    decode(mergeStores(a, b, Seq("value_c")))
      .groupBy(col("series_id").as("user_id"))
      .agg(
        count(lit(1)).as("n_points"),
        sum(col("value_c")).as("sum_value_c"),
        min(col("ts_us")).as("min_ts_us"),
        max(col("ts_us")).as("max_ts_us")
      )
  }

  /** Full write path from the raw events table (single value tag). */
  def write(spark: SparkSession, dir: String, outPath: String): Unit =
    encode(
      TimeSeries
        .eventsUs(spark, dir)
        .select(col("user_id"), col("ts_us"), col("event_id"), cents(col("value")).as("value_c"))
    ).write.mode("overwrite").parquet(outPath)

  /** Shared encoded events store ([[write]]'s exact content), built at
    * most once per process — the read-only base for the pushdown /
    * zone-map / SQL-surface read drills. Write-subject drills
    * (roundtrip, format_write, ...) keep building their own stores.
    */
  private[graft] def eventsStoreFixture(spark: SparkSession, dir: String): String =
    sharedFixture("graft_store_events", dir)(p => write(spark, dir, p))

  def read(spark: SparkSession, path: String): DataFrame =
    decode(spark.read.parquet(path))

  /** SCHEMA-EVOLVED read: decode a store whose snapshots were written
    * with different tag sets (a tag added later — the evolution every
    * long-lived store goes through; rewriting history at 100 TB is not
    * an option). `mergeSchema` surfaces a tag family absent from a
    * snapshot's write-time schema as NULL block columns; those are
    * normalized to per-point NULL values (offsets become a NULL-filled
    * array so the positional zip keeps every point; header columns
    * stay NULL so every mode branch yields NULL), and decode proceeds
    * unchanged — old points carry NULL for the new tag, new points the
    * real values. No block is rewritten, no extra pass.
    */
  def readEvolved(spark: SparkSession, paths: Seq[String], tagCols: Seq[String]): DataFrame = {
    var b = spark.read.option("mergeSchema", "true").parquet(paths: _*)
    val have = b.columns.toSet
    tagCols.foreach { t =>
      if (!have(s"offs_$t")) b = b.withColumn(s"offs_$t", expr("CAST(NULL AS ARRAY<BIGINT>)"))
      Seq(s"min_$t" -> "BIGINT", s"mode_$t" -> "STRING", s"hdr0_$t" -> "BIGINT", s"hdr1_$t" -> "BIGINT")
        .foreach { case (c, ty) => if (!b.columns.contains(c)) b = b.withColumn(c, expr(s"CAST(NULL AS $ty)")) }
      b = b.withColumn(
        s"offs_$t",
        coalesce(col(s"offs_$t"), expr("transform(deltas, d -> CAST(NULL AS BIGINT))"))
      )
    }
    decode(b, tagCols)
  }

  /** ts_store_stats — the store HEALTH report a DBA reads before
    * deciding to compact: per series, block count, point count, block
    * occupancy (micro), the day span, and how many blocks sit under
    * the 32-point fragmentation bar (the compactFragmented trigger).
    * Computed from block METADATA only — no decode, no explode; one
    * aggregation over block rows whose count is days·series, orders of
    * magnitude below points.
    */
  def storeStats(spark: SparkSession, dir: String): DataFrame = {
    val out = scratchPath("graft_store", dir)
    write(spark, dir, out)
    spark.read
      .parquet(out)
      .groupBy(col("series_id").as("user_id"))
      .agg(
        count(lit(1)).as("n_blocks"),
        sum(col("n_points")).as("n_points"),
        min(col("day_id")).as("min_day"),
        max(col("day_id")).as("max_day"),
        sum(when(col("n_points") < 32, 1L).otherwise(0L)).as("n_fragmented")
      )
      .withColumn("pts_per_block_micro", expr("n_points * 1000000 DIV n_blocks"))
  }

  /** ts_store_schema_evolve — the evolution drill end to end: the first
    * half of history is encoded with ONE tag, the second half with two
    * (a props-length tag added mid-stream), and the evolved read
    * decodes both snapshots in one pass — old points NULL for the new
    * tag, byte-identical old blocks untouched. The half-way split is a
    * 2-value scalar aggregate (same driver-side pattern as
    * storedBlockUs). Summary aggregates pin point counts, the old-tag
    * sum over ALL history, and the new tag's coverage + sum over the
    * evolved half only.
    */
  def schemaEvolveRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = scratchPath("graft_store_evolve", dir)
    val pts = TimeSeries
      .eventsUs(spark, dir)
      .select(
        col("user_id"),
        col("ts_us"),
        col("event_id"),
        expr(s"ts_us DIV ${DayUs}L").as("day_id"),
        cents(col("value")).as("value_c"),
        length(col("props")).cast("long").as("plen_c")
      )
    val mm = pts.agg(min(col("day_id")), max(col("day_id"))).head()
    val splitDay = (mm.getLong(0) + mm.getLong(1) + 1) / 2
    encode(pts.filter(col("day_id") < splitDay), tagCols = Seq("value_c"))
      .write.mode("overwrite").parquet(s"$out/v1")
    encode(pts.filter(col("day_id") >= splitDay), tagCols = Seq("value_c", "plen_c"))
      .write.mode("overwrite").parquet(s"$out/v2")
    readEvolved(spark, Seq(s"$out/v1", s"$out/v2"), Seq("value_c", "plen_c"))
      .groupBy(col("series_id").as("user_id"))
      .agg(
        count(lit(1)).as("n_points"),
        sum(col("value_c")).as("sum_value_c"),
        count(col("plen_c")).as("n_evolved"),
        sum(coalesce(col("plen_c"), lit(0L))).as("sum_plen_c")
      )
  }

  /** Production block layout: hive-partitioned by day, so time-range
    * reads prune whole partition directories before any IO — at 100 TB
    * the scan for a one-week query touches 7 directories, not the
    * store. (Series-bucketing within each partition is the natural
    * next axis on a warehouse deployment.)
    */
  def writePartitioned(spark: SparkSession, dir: String, outPath: String): Unit =
    encode(
      TimeSeries
        .eventsUs(spark, dir)
        .select(col("user_id"), col("ts_us"), col("event_id"), cents(col("value")).as("value_c"))
    ).write.mode("overwrite").partitionBy("day_id").parquet(outPath)

  /** Oracle-gated roundtrip query: encode -> persist -> decode -> per-
    * series summary. Any codec loss shows up against the DuckDB oracle
    * computed on the ORIGINAL events.
    */
  def roundtripSummary(spark: SparkSession, dir: String): DataFrame = {
    // fixed per-(tmpdir, sf) path + overwrite mode: repeated invocations
    // (Bench runs each query twice per pass) REUSE the location instead
    // of leaking a fresh encoded copy of the table per call
    val out = scratchPath("graft_store", dir)
    write(spark, dir, out)
    read(spark, out)
      .groupBy(col("series_id").as("user_id"))
      .agg(
        count(lit(1)).as("n_points"),
        min(col("ts_us")).as("min_ts_us"),
        max(col("ts_us")).as("max_ts_us"),
        sum(col("value_c")).as("sum_value_c"),
        sum(col("seq")).as("sum_event_id")
      )
  }

  /** ts_ingest_csv — the reference's FRONT DOOR, Spark-first: its own
    * performance drill reads a CSV feed and saves the store
    * (performance_tests.py:20-45, `TimeBox.save_pandas`). Here the
    * feed lands as a headered CSV scratch written once from the events
    * slice (ISO microsecond timestamps), parses back with an EXPLICIT
    * schema + timestampFormat — never inferSchema, which is a second
    * full scan of a 100 TB feed — encodes through the block codec, and
    * decodes to the per-series summary, which must equal the summary
    * over the ORIGINAL parquet rows (shared oracle with
    * ts_store_roundtrip). One mis-parsed timestamp, locale-bent
    * double, or dropped row breaks the hash; the CSV parser runs
    * PERMISSIVE by default, so the count aggregate doubles as the
    * no-row-lost check.
    */
  def ingestCsv(spark: SparkSession, dir: String): DataFrame = {
    val feed  = scratchPath("graft_csv_feed", dir)
    val store = scratchPath("graft_csv_store", dir)
    TimeSeries
      .eventsUs(spark, dir)
      .select(
        date_format(timestamp_micros(col("ts_us")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts"),
        col("event_id"),
        col("user_id"),
        col("event_type"),
        col("value")
      )
      .write
      .mode("overwrite")
      .option("header", "true")
      .csv(feed)
    val parsed = spark.read
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
      .schema("ts TIMESTAMP, event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE")
      .csv(feed)
    encode(
      parsed.select(
        col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        col("event_id"),
        cents(col("value")).as("value_c")
      )
    ).write.mode("overwrite").parquet(store)
    read(spark, store)
      .groupBy(col("series_id").as("user_id"))
      .agg(
        count(lit(1)).as("n_points"),
        min(col("ts_us")).as("min_ts_us"),
        max(col("ts_us")).as("max_ts_us"),
        sum(col("value_c")).as("sum_value_c"),
        sum(col("seq")).as("sum_event_id")
      )
  }

  /** Range + tag-subset read FROM THE ENCODED STORE — the reference's
    * roadmap read path (timebox.py:102-106) against our block layout:
    * the day-partition predicate prunes whole directories before any
    * IO (spec-asserted via partitionFilters), a block-level
    * `start_us < end` filter skips late blocks before decode, and only
    * the surviving blocks pay the decode cost; the exact point-level
    * range filter runs last. At 100 TB a one-week query touches 7
    * directories of a store this layout keeps sorted by time.
    */
  def rangeRead(
      spark: SparkSession,
      path: String,
      startUs: Long,
      endUs: Long,
      tagCols: Seq[String] = Seq("value_c")
  ): DataFrame = {
    val store = spark.read.parquet(path)
    val blockUs = storedBlockUs(store)
    val blocks = store
      .filter(col("day_id") >= startUs / blockUs && col("day_id") <= (endUs - 1) / blockUs)
      .filter(col("start_us") < endUs)
    decode(blocks, tagCols).filter(col("ts_us") >= startUs && col("ts_us") < endUs)
  }

  /** Value-predicate read via ZONE MAPS: blocks whose [min, max]
    * envelope for the tag misses the requested value range are skipped
    * BEFORE decode — the storage-side analogue of parquet row-group
    * statistics, on top of [[rangeRead]]'s day-partition pruning. At
    * 100 TB a selective value predicate (threshold alerts, outlier
    * scans) touches only the blocks that can possibly match; the exact
    * point-level filter runs after decode.
    */
  def rangeReadValueFiltered(
      spark: SparkSession,
      path: String,
      startUs: Long,
      endUs: Long,
      tag: String,
      loC: Long,
      hiC: Long
  ): DataFrame = {
    val store = spark.read.parquet(path)
    val blockUs = storedBlockUs(store)
    val blocks = store
      .filter(col("day_id") >= startUs / blockUs && col("day_id") <= (endUs - 1) / blockUs)
      .filter(col("start_us") < endUs)
      // zone-map skip: the block can hold a matching value only if the
      // envelopes overlap
      .filter(col(s"min_$tag") <= hiC && col(s"max_$tag") >= loC)
    decode(blocks, Seq(tag))
      .filter(col("ts_us") >= startUs && col("ts_us") < endUs)
      .filter(col(tag) >= loC && col(tag) <= hiC)
  }

  /** Oracle-gated zone-map read (ts_store_value_read): encode → persist
    * → value-filtered range read → per-series summary. The oracle is
    * the same filter over the RAW events, so a block skipped wrongly
    * (or a min/max envelope off by one) fails the hash compare.
    * Re-expressed through the [[TimeboxDataSource]] facade: the read
    * is `spark.read.format("timebox")` + plain `.filter`s, and the
    * ScanBuilder routes them into the same day-range + zone-map skip
    * machinery [[rangeReadValueFiltered]] wires by hand (FormatSpec
    * pins row-level equality between the two paths and the pushed
    * filters in the plan).
    */
  def valueReadSummary(
      spark: SparkSession,
      dir: String,
      startUs: Long = 1704672000000000L, // 2024-01-08
      endUs: Long = 1705276800000000L,   // 2024-01-15
      loC: Long = 9000L,
      hiC: Long = 12000L
  ): DataFrame = {
    // read-only zone-map drill over the shared encoded events store
    val out = eventsStoreFixture(spark, dir)
    spark.read.format("timebox").load(out)
      .filter(
        col("ts_us") >= startUs && col("ts_us") < endUs &&
          col("value_c") >= loC && col("value_c") <= hiC
      )
      .groupBy(col("series_id").as("user_id"))
      .agg(
        count(lit(1)).as("n_points"),
        min(col("ts_us")).as("min_ts_us"),
        max(col("ts_us")).as("max_ts_us"),
        sum(col("value_c")).as("sum_value_c")
      )
  }

  /** Multi-tag zone-map read: block pruning on SEVERAL tag envelopes
    * at once (AND of per-tag [min, max] overlaps) plus tag-subset
    * decode — only the requested tags' offset arrays are touched.
    * The conjunctive skip matters at 100 TB: each selective predicate
    * multiplies the block-skip rate before any decode work happens.
    */
  def rangeReadMultiFiltered(
      spark: SparkSession,
      path: String,
      startUs: Long,
      endUs: Long,
      preds: Seq[(String, Long, Long)]
  ): DataFrame = {
    val store = spark.read.parquet(path)
    val blockUs = storedBlockUs(store)
    val blocks = preds.foldLeft(
      store
        .filter(col("day_id") >= startUs / blockUs && col("day_id") <= (endUs - 1) / blockUs)
        .filter(col("start_us") < endUs)
    ) { case (df, (tag, lo, hi)) => df.filter(col(s"min_$tag") <= hi && col(s"max_$tag") >= lo) }
    preds.foldLeft(
      decode(blocks, preds.map(_._1)).filter(col("ts_us") >= startUs && col("ts_us") < endUs)
    ) { case (df, (tag, lo, hi)) => df.filter(col(tag) >= lo && col(tag) <= hi) }
  }

  /** Oracle-gated multi-tag zone-map read (ts_store_multitag_read):
    * the 32-day-block lineitem store read with a time range AND two
    * value bands, decoding only the two requested tags; oracle = the
    * same filters over raw lineitem.
    */
  def multitagValueReadSummary(
      spark: SparkSession,
      dir: String,
      startUs: Long = 820454400000000L, // 1996-01-01
      endUs: Long = 883612800000000L,   // 1998-01-01
      priceLoC: Long = 9500000L,
      priceHiC: Long = 11000000L,
      qtyLoC: Long = 1000L,
      qtyHiC: Long = 4000L
  ): DataFrame = {
    // read-only conjunctive zone-map drill over a shared encoded store
    val out = sharedFixture("graft_store_mt", dir) { p =>
      encode(lineitemPoints(spark, dir), "series_id", "ts_us", "seq", LineitemTags, blockUs = 32 * DayUs)
        .write.mode("overwrite").parquet(p)
    }
    // facade read: the two value bands + time range push down as
    // conjunctive zone-map skips; disc_c is never requested, so its
    // offset arrays are column-pruned out of the decode
    spark.read.format("timebox").load(out)
      .select(col("series_id"), col("ts_us"), col("price_c"), col("qty_c"))
      .filter(
        col("ts_us") >= startUs && col("ts_us") < endUs &&
          col("price_c") >= priceLoC && col("price_c") <= priceHiC &&
          col("qty_c") >= qtyLoC && col("qty_c") <= qtyHiC
      )
      .groupBy(col("series_id").as("l_suppkey"))
      .agg(
        count(lit(1)).as("n_points"),
        sum(col("qty_c")).as("sum_qty_c"),
        sum(col("price_c")).as("sum_price_c")
      )
  }

  /** Counter points: value_c plus a per-series RUNNING-TOTAL tag — the
    * monotone, wide-range shape where the zigzag-delta mode's width
    * plan beats min-ref (deltas are one observation, the range is the
    * whole block's drift) — plus a near-LINEAR ramp tag (a row-indexed
    * sequence with small jitter: a steady sampled counter), the shape
    * where only DELTA-OF-DELTA collapses the width: min-ref pays the
    * block range, delta pays the slope every element, second diffs pay
    * just the jitter.
    */
  def counterPoints(spark: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rn = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    TimeSeries
      .eventsUs(spark, dir)
      .select(col("user_id"), col("ts_us"), col("event_id"), cents(col("value")).as("value_c"))
      .withColumn("counter_c", sum(col("value_c")).over(w))
      .withColumn("trend_c", row_number().over(rn).cast("long") * 1000L + col("event_id") % 7L)
  }

  /** Oracle-gated mode-select roundtrip (ts_store_counter_roundtrip):
    * 32-day blocks over (noisy value, monotone counter, jittery ramp)
    * — the counter tag picks the delta mode, the ramp picks
    * delta-of-delta, the noisy tag keeps min-ref (StoreSpec asserts
    * the three-way split), and the oracle over raw events catches any
    * loss in ANY decode path.
    */
  def counterRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = scratchPath("graft_store_ctr", dir)
    val tags = Seq("value_c", "counter_c", "trend_c")
    encode(counterPoints(spark, dir), tagCols = tags, blockUs = 32 * DayUs)
      .write.mode("overwrite").parquet(out)
    decode(spark.read.parquet(out), tags)
      .groupBy(col("series_id").as("user_id"))
      .agg(
        count(lit(1)).as("n_points"),
        sum(col("value_c")).as("sum_value_c"),
        sum(col("counter_c")).as("sum_counter_c"),
        max(col("counter_c")).as("max_counter_c"),
        sum(col("trend_c")).as("sum_trend_c"),
        max(col("trend_c")).as("max_trend_c")
      )
  }

  /** Compaction: re-block an encoded store at a coarser granularity —
    * the reference's whole-file rewrite on update (timebox.py:57-88)
    * as a distributed decode→re-encode. Small blocks (sparse series,
    * streaming appends) coalesce into fewer, fuller blocks, which is
    * what keeps per-block metadata overhead and task counts bounded as
    * a store ages. Lossless by construction (codec roundtrip), spec-
    * asserted.
    */
  def compact(
      spark: SparkSession,
      inPath: String,
      outPath: String,
      blockUs: Long = 7 * DayUs,
      tagCols: Seq[String] = Seq("value_c")
  ): Unit =
    encode(
      decode(spark.read.parquet(inPath), tagCols)
        .toDF(Seq("series_id", "ts_us", "seq") ++ tagCols: _*),
      "series_id",
      "ts_us",
      "seq",
      tagCols,
      blockUs
    ).write.mode("overwrite").parquet(outPath)

  /** Equality read via block BLOOM filters: for `tag = value` probes,
    * a block is decoded only if BOTH bloom bits for the probe value
    * are set (plus the zone-map envelope check) — the skip path zone
    * maps cannot provide when the block's [min, max] is wide but the
    * one probed value is absent. The bit tests are literal expressions
    * over the stored words, so Catalyst folds the probe's hash at
    * optimize time; ~18% false-positive rate at 256 bits / 2 hashes /
    * ~70 values per block, and a false positive only costs a decode,
    * never correctness (the exact filter runs after).
    */
  def rangeReadValueEquals(
      spark: SparkSession,
      path: String,
      startUs: Long,
      endUs: Long,
      tag: String,
      valueC: Long
  ): DataFrame = {
    val store = spark.read.parquet(path)
    val blockUs = storedBlockUs(store)
    def bitSet(seed: String) = expr(
      s"(element_at(bloom_$tag, CAST(pmod(xxhash64('$seed', ${valueC}L), 256) DIV 64 AS INT) + 1)" +
        s" & shiftleft(1L, CAST(pmod(xxhash64('$seed', ${valueC}L), 256) % 64 AS INT))) != 0L"
    )
    val blocks = store
      .filter(col("day_id") >= startUs / blockUs && col("day_id") <= (endUs - 1) / blockUs)
      .filter(col("start_us") < endUs)
      .filter(col(s"min_$tag") <= valueC && col(s"max_$tag") >= valueC)
      // dictionary first: EXACT membership for low-cardinality blocks
      // (no false positives — a miss skips the block outright); blocks
      // without a dictionary fall through to the bloom bits
      .filter(col(s"dict_$tag").isNull || array_contains(col(s"dict_$tag"), lit(valueC)))
      .filter(bitSet("b1") && bitSet("b2"))
    decode(blocks, Seq(tag))
      .filter(col("ts_us") >= startUs && col("ts_us") < endUs)
      .filter(col(tag) === valueC)
  }

  /** Predicate DELETE on the encoded store — the missing letter of the
    * store's CRUD, and a composition of the skip structures with the
    * upsert machinery: a block whose dictionary/bloom/zone map PROVES
    * the probed value absent passes through ENCODED, byte-identical
    * (it cannot hold a doomed point); only blocks that might match
    * decode, drop the matching points, and re-encode (a fully-emptied
    * block simply vanishes — encode of zero points emits no row). At
    * 100 TB a "purge this event code" job rewrites the few blocks the
    * dictionaries admit, not the store.
    */
  def deleteWhereEquals(store: DataFrame, tag: String, valueC: Long, tagCols: Seq[String]): DataFrame =
    deleteWhereEqualsAll(store, Seq(tag -> valueC), tagCols)

  /** CONJUNCTION form of the predicate delete: a point is doomed iff it
    * matches EVERY (tag, value) equality — the semantics SQL's
    * `DELETE FROM t WHERE a = 1 AND b = 2` requires (deleting per-tag
    * sequentially would purge the UNION of the matches). Candidate
    * blocks are those the skip structures admit for ALL conjuncts —
    * tighter than any single conjunct's candidate set, so a
    * multi-predicate purge rewrites fewer blocks, not more; candidates
    * decode ONCE, drop only rows matching the full conjunction, and
    * re-encode.
    */
  /** Block-level candidate predicate of a conjunction delete: true on
    * blocks the skip structures cannot prove free of a point matching
    * EVERY (tag, value) equality. Shared by the in-place delete and the
    * catalog delete-commit (which needs it standalone to pick the files
    * to rewrite).
    */
  private[graft] def mayMatchExpr(eqs: Seq[(String, Long)]): Column = {
    def mayMatchOne(tag: String, valueC: Long) = {
      def bitSet(seed: String) = expr(
        s"(element_at(bloom_$tag, CAST(pmod(xxhash64('$seed', ${valueC}L), 256) DIV 64 AS INT) + 1)" +
          s" & shiftleft(1L, CAST(pmod(xxhash64('$seed', ${valueC}L), 256) % 64 AS INT))) != 0L"
      )
      col(s"min_$tag") <= valueC && col(s"max_$tag") >= valueC &&
        (col(s"dict_$tag").isNull || array_contains(col(s"dict_$tag"), lit(valueC))) &&
        bitSet("b1") && bitSet("b2")
    }
    eqs.map { case (t, v) => mayMatchOne(t, v) }.reduce(_ && _)
  }

  def deleteWhereEqualsAll(store: DataFrame, eqs: Seq[(String, Long)], tagCols: Seq[String]): DataFrame = {
    require(eqs.nonEmpty, "deleteWhereEqualsAll: at least one (tag, value) equality is required")
    val blockUs = storedBlockUs(store)
    val mayMatch = mayMatchExpr(eqs)
    val doomed = eqs.map { case (t, v) => col(t) === v }.reduce(_ && _)
    val untouched = store.filter(!mayMatch)
    val rewritten = decode(store.filter(mayMatch), tagCols)
      .filter(!doomed)
      .transform(pts => encode(pts, "series_id", "ts_us", "seq", tagCols, blockUs))
    untouched.unionByName(rewritten)
  }

  /** Oracle-gated predicate delete (ts_store_delete_value): encode the
    * enum-tagged events, purge one event-type code store-wide, decode
    * and summarize the survivors. The oracle filters the same code out
    * of the raw events — a lost survivor, an undeleted point, or a
    * corrupted pass-through block all break the hash.
    */
  def deleteSummary(spark: SparkSession, dir: String): DataFrame = {
    val out = scratchPath("graft_store_del", dir)
    val tags = Seq("value_c", "etype_c")
    encode(eventTypePoints(spark, dir), tagCols = tags)
      .write.mode("overwrite").parquet(out)
    // purge 'p*' events (ascii 112) — the dictReadSummary probe code
    val after = deleteWhereEquals(spark.read.parquet(out), "etype_c", 112L, tags)
    decode(after, tags)
      .groupBy(col("series_id").as("user_id"))
      .agg(
        count(lit(1)).as("n_points"),
        sum(col("value_c")).as("sum_value_c"),
        min(col("ts_us")).as("min_ts_us"),
        max(col("ts_us")).as("max_ts_us")
      )
  }

  /** Enum-tag points frame from events: series = user, plus the value
    * tag and a LOW-CARDINALITY event-type code (first-letter ASCII —
    * portable across engines, no value enumeration baked in).
    */
  def eventTypePoints(spark: SparkSession, dir: String): DataFrame =
    TimeSeries
      .eventsUs(spark, dir)
      .select(
        col("user_id"),
        col("ts_us"),
        col("event_id"),
        cents(col("value")).as("value_c"),
        ascii(substring(col("event_type"), 1, 1)).cast("long").as("etype_c")
      )

  /** ts_store_sql — the pure-SQL catalog surface: `CREATE TABLE ...
    * USING timebox LOCATION ...` registers the store in the session
    * catalog, and from that point a SQL-only user (the most common
    * kind at 100 TB) reaches the store, its pushdowns, and its pruning
    * with nothing but `spark.sql` — no DataFrame code, no library
    * import. This query IS that user: DDL, then one SQL aggregate per
    * series — the shape the COMPLETE aggregate pushdown answers from
    * block metadata without decoding a point (FormatSpec pins the
    * SQL-path plan has no aggregate exec and that SQL WHERE clauses
    * land as PushedFilters). The table name is keyed by the store path
    * so per-call scratch isolation extends to the catalog namespace.
    * Reference surface: timebox.py:102-123 (read) lifted to the one
    * public door Spark gives every BI tool.
    */
  def sqlSurfaceSummary(spark: SparkSession, dir: String): DataFrame = {
    // read-only SQL-door drill over the shared encoded events store
    // (the DDL below registers, never mutates, the location)
    val path = eventsStoreFixture(spark, dir)
    val tbl = "tb_" + java.security.MessageDigest
      .getInstance("MD5")
      .digest(path.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.take(12)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl USING timebox LOCATION '$path'")
    spark.sql(
      s"""SELECT series_id AS user_id,
         |  COUNT(value_c) AS n_points,
         |  SUM(value_c) AS sum_value_c,
         |  MIN(ts_us) AS min_ts_us,
         |  MAX(ts_us) AS max_ts_us
         |FROM $tbl
         |GROUP BY series_id""".stripMargin
    )
  }

  /** ts_store_sql_write — the pure-SQL WRITE door, closing the
    * SQL-only pipeline story the DDL read door (ts_store_sql) opened:
    * `CREATE TABLE ... USING timebox LOCATION ... AS SELECT ...`
    * (CTAS — create + first write in one statement) lays down the
    * first half of history, `INSERT INTO ... SELECT` appends the
    * second (new block files through the same V1Write ↔
    * InsertableRelation bridge the DataFrame writer rides — blocks are
    * self-contained, appends never read-modify-write), and the
    * verification read comes back as a SQL per-series summary through
    * the catalog table. Same output contract and oracle as
    * ts_store_format_write, so the SQL and DataFrame write doors are
    * pinned to byte-identical stores. A SQL-only user at 100 TB owns
    * the full lifecycle: create, load, append, query — no library
    * import anywhere.
    */
  def sqlWriteRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val path = scratchPath("graft_store_sqlw", dir)
    val key = java.security.MessageDigest
      .getInstance("MD5")
      .digest(path.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.take(12)
    val (tbl, v) = (s"tbw_$key", s"pts_$key") // path-keyed: percall scratch
    // isolation extends to the catalog + temp-view namespace (Verify
    // runs queries concurrently on one session)
    val pts = TimeSeries
      .eventsUs(spark, dir)
      .select(
        col("user_id").as("series_id"),
        col("ts_us"),
        col("event_id").as("seq"),
        cents(col("value")).as("value_c")
      )
    pts.createOrReplaceTempView(v)
    val mm = pts.agg(min(expr(s"ts_us DIV ${DayUs}L")), max(expr(s"ts_us DIV ${DayUs}L"))).head()
    val splitDay = (mm.getLong(0) + mm.getLong(1) + 1) / 2
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    deleteRecursively(new java.io.File(path)) // CTAS refuses a pre-existing location
    spark.sql(
      s"""CREATE TABLE $tbl USING timebox LOCATION '$path' AS
         |SELECT series_id, ts_us, seq, value_c FROM $v
         |WHERE ts_us DIV ${DayUs}L < ${splitDay}L""".stripMargin
    )
    spark.sql(
      s"""INSERT INTO $tbl
         |SELECT series_id, ts_us, seq, value_c FROM $v
         |WHERE ts_us DIV ${DayUs}L >= ${splitDay}L""".stripMargin
    )
    spark.sql(
      s"""SELECT series_id AS user_id,
         |  COUNT(value_c) AS n_points,
         |  SUM(value_c) AS sum_value_c,
         |  SUM(seq) AS sum_event_id,
         |  MIN(ts_us) AS min_ts_us,
         |  MAX(ts_us) AS max_ts_us
         |FROM $tbl
         |GROUP BY series_id""".stripMargin
    )
  }

  /** ts_store_sql_delete — the SQL DML door: `DELETE FROM t WHERE tag
    * = v` on the catalog table, riding [[deleteWhereEquals]] through
    * [[TimeboxTable]]'s SupportsDelete (skip-proven blocks pass through
    * encoded; only candidates rewrite). Same purge and same ORACLE as
    * ts_store_delete_value, so the SQL and library delete doors are
    * pinned to the same survivors — a SQL-only user now owns the full
    * lifecycle: create, load, append, query, purge.
    */
  def sqlDeleteSummary(spark: SparkSession, dir: String): DataFrame = {
    val path = scratchPath("graft_store_sqldel", dir)
    val tags = Seq("value_c", "etype_c")
    encode(eventTypePoints(spark, dir), tagCols = tags)
      .write.mode("overwrite").parquet(path)
    val tbl = "tbd_" + java.security.MessageDigest
      .getInstance("MD5")
      .digest(path.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.take(12)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl USING timebox LOCATION '$path'")
    // purge 'p*' events (ascii 112) — the same code ts_store_delete_value purges
    spark.sql(s"DELETE FROM $tbl WHERE etype_c = 112")
    spark.sql(
      s"""SELECT series_id AS user_id,
         |  COUNT(*) AS n_points,
         |  SUM(value_c) AS sum_value_c,
         |  MIN(ts_us) AS min_ts_us,
         |  MAX(ts_us) AS max_ts_us
         |FROM $tbl
         |GROUP BY series_id""".stripMargin
    )
  }

  /** ts_store_catalog_write — SQL INSERT as a VERSION COMMIT on the
    * snapshot-catalog root (the write half of the catalog DML
    * symmetry; the read/delete/merge halves are ts_store_timetravel_api
    * / ts_store_catalog_delete / ts_store_sql_merge): version 1 lands
    * the first half of history through [[SnapshotCatalog.commit]], the
    * catalog table's `INSERT INTO ... SELECT` lands the second as a
    * DELTA version through the same V1Write bridge the raw door rides
    * (INSERT OVERWRITE would commit a version superseding every live
    * file — FormatSpec drills both), and the verification read is the
    * SQL per-series summary over the composed versions. SAME oracle as
    * ts_store_sql_write / ts_store_format_write: all write doors land
    * identical stores, and on the versioned root every INSERT is
    * atomic (readers resolve v_n or v_n+1) and time-travelable.
    */
  def sqlCatalogWriteRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val pts = TimeSeries
      .eventsUs(spark, dir)
      .select(
        col("user_id").as("series_id"),
        col("ts_us"),
        col("event_id").as("seq"),
        cents(col("value")).as("value_c")
      )
    val mm = pts.agg(min(expr(s"ts_us DIV ${DayUs}L")), max(expr(s"ts_us DIV ${DayUs}L"))).head()
    val splitDay = (mm.getLong(0) + mm.getLong(1) + 1) / 2
    // the v1 base commit is a shared template; INSERT INTO commits a
    // NEW version on the clone (cloneRoot rewrites manifest paths), so
    // the drill prices its subject — the SQL write + read-back
    val tmpl = sharedFixture("graft_store_catw_tmpl", dir) { p =>
      SnapshotCatalog.commit(
        spark,
        p,
        q =>
          encode(pts.filter(expr(s"ts_us DIV ${DayUs}L < ${splitDay}L")), "series_id", "ts_us", "seq", Seq("value_c"))
            .write.parquet(q)
      ): Unit
    }
    val root = SnapshotCatalog.cloneRoot(tmpl, scratchPath("graft_store_catw", dir))
    val key = java.security.MessageDigest
      .getInstance("MD5")
      .digest(root.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.take(12)
    val (tbl, v) = (s"tbcw_$key", s"ptscw_$key")
    pts.createOrReplaceTempView(v)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl USING timebox LOCATION '$root'")
    spark.sql(
      s"""INSERT INTO $tbl
         |SELECT series_id, ts_us, seq, value_c FROM $v
         |WHERE ts_us DIV ${DayUs}L >= ${splitDay}L""".stripMargin
    )
    spark.sql(s"REFRESH TABLE $tbl")
    spark.sql(
      s"""SELECT series_id AS user_id,
         |  COUNT(value_c) AS n_points,
         |  SUM(value_c) AS sum_value_c,
         |  SUM(seq) AS sum_event_id,
         |  MIN(ts_us) AS min_ts_us,
         |  MAX(ts_us) AS max_ts_us
         |FROM $tbl
         |GROUP BY series_id""".stripMargin
    )
  }

  /** ts_store_sql_merge — the SQL MERGE door: `MERGE INTO t USING s ON
    * (point identity) WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED
    * THEN INSERT *` on the catalog table, rewritten by
    * [[TimeboxMergeRule]] into the library upsert
    * ([[upsertBlocks]] — untouched blocks pass through encoded via the
    * block-key anti join; only touched blocks decode/merge/re-encode)
    * and landed through the crash-recoverable staged swap DML shares.
    * The drill is ts_store_merge's EXACT backfill: history < day 21
    * through the batch writer, the +500 re-statement from day 7 onward
    * as the MERGE source — SAME oracle, so the SQL and library merge
    * doors are pinned to identical stores. A SQL-only user now owns
    * backfill, completing the lifecycle (create, load, append, query,
    * purge, merge). Reference: timebox.py:57-88 update path as SQL.
    */
  def sqlMergeSummary(spark: SparkSession, dir: String): DataFrame = {
    val path = scratchPath("graft_store_sqlm", dir)
    val key = java.security.MessageDigest
      .getInstance("MD5")
      .digest(path.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.take(12)
    val (tbl, v) = (s"tbm_$key", s"ptsm_$key")
    val pts = TimeSeries
      .eventsUs(spark, dir)
      .select(
        col("user_id").as("series_id"),
        col("ts_us"),
        col("event_id").as("seq"),
        cents(col("value")).as("value_c")
      )
    // same relative boundaries as the library merge drill (mergeSummary)
    val d0  = pts.agg(min(expr(s"ts_us DIV ${DayUs}L"))).head().getLong(0)
    val aHi = (d0 + 21) * DayUs
    val bLo = (d0 + 7) * DayUs
    encode(pts.filter(col("ts_us") < aHi), "series_id", "ts_us", "seq", Seq("value_c"))
      .write.mode("overwrite").parquet(path)
    pts
      .filter(col("ts_us") >= bLo)
      .withColumn("value_c", col("value_c") + 500L)
      .createOrReplaceTempView(v)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl USING timebox LOCATION '$path'")
    spark.sql(
      s"""MERGE INTO $tbl t USING $v s
         |ON t.series_id = s.series_id AND t.seq = s.seq
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin
    )
    spark.sql(s"REFRESH TABLE $tbl")
    spark.sql(
      s"""SELECT series_id AS user_id,
         |  COUNT(*) AS n_points,
         |  SUM(value_c) AS sum_value_c,
         |  MIN(ts_us) AS min_ts_us,
         |  MAX(ts_us) AS max_ts_us
         |FROM $tbl
         |GROUP BY series_id""".stripMargin
    )
  }

  /** ts_store_catalog_merge — the MERGE door on the VERSIONED root
    * (completing catalog DML symmetry's last face: read, insert,
    * delete, merge — each an atomic version commit): same backfill and
    * SAME oracle as ts_store_merge / ts_store_sql_merge, but the
    * target is a snapshot-catalog root, so [[TimeboxMergeCommand]]
    * lands only the files holding a touched (series, day) block into
    * the new version (removed list supersedes the originals; cost
    * O(delta)) and the pre-merge store stays time-travelable —
    * readers race-free resolve v_n or v_n+1 via the hard-link CAS,
    * which the raw root's staged swap can only approximate.
    */
  def sqlCatalogMergeSummary(spark: SparkSession, dir: String): DataFrame = {
    val pts = TimeSeries
      .eventsUs(spark, dir)
      .select(
        col("user_id").as("series_id"),
        col("ts_us"),
        col("event_id").as("seq"),
        cents(col("value")).as("value_c")
      )
    val d0  = pts.agg(min(expr(s"ts_us DIV ${DayUs}L"))).head().getLong(0)
    val aHi = (d0 + 21) * DayUs
    val bLo = (d0 + 7) * DayUs
    // the v1 history commit is a shared template; MERGE commits a NEW
    // version on the clone — the drill prices the merge + read-back
    val tmpl = sharedFixture("graft_store_catm_tmpl", dir) { p =>
      SnapshotCatalog.commit(
        spark,
        p,
        q =>
          encode(pts.filter(col("ts_us") < aHi), "series_id", "ts_us", "seq", Seq("value_c"))
            .write.parquet(q)
      ): Unit
    }
    val root = SnapshotCatalog.cloneRoot(tmpl, scratchPath("graft_store_catm", dir))
    val key = java.security.MessageDigest
      .getInstance("MD5")
      .digest(root.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.take(12)
    val (tbl, v) = (s"tbcm_$key", s"ptscm_$key")
    pts
      .filter(col("ts_us") >= bLo)
      .withColumn("value_c", col("value_c") + 500L)
      .createOrReplaceTempView(v)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl USING timebox LOCATION '$root'")
    spark.sql(
      s"""MERGE INTO $tbl t USING $v s
         |ON t.series_id = s.series_id AND t.seq = s.seq
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin
    )
    spark.sql(s"REFRESH TABLE $tbl")
    spark.sql(
      s"""SELECT series_id AS user_id,
         |  COUNT(*) AS n_points,
         |  SUM(value_c) AS sum_value_c,
         |  MIN(ts_us) AS min_ts_us,
         |  MAX(ts_us) AS max_ts_us
         |FROM $tbl
         |GROUP BY series_id""".stripMargin
    )
  }

  /** ts_store_catalog_delete — SQL DELETE as a VERSION COMMIT on the
    * snapshot-catalog root, closing the DML/atomicity asymmetry the raw
    * path's staged swap carries (its crash window is a marker-recovery,
    * not a transaction): the same `DELETE FROM t WHERE tag = v` lands
    * as a new catalog version holding ONLY the rewritten candidate
    * files (skip-proven files pass untouched and unread past block
    * metadata — cost O(delta)), the superseded originals named in the
    * manifest's removed list, and every prior version still
    * time-travelable (`option("asOf", v)` — FormatSpec pins v1 still
    * reads the pre-delete state). SAME purge and SAME oracle as
    * ts_store_delete_value / ts_store_sql_delete, pinning all three
    * delete doors to identical survivors. Reference surface:
    * timebox.py:57-88 update path composed with the catalog's own
    * snapshot discipline (timebox.py:405-455 locking, re-expressed as
    * immutable commits).
    */
  def sqlCatalogDeleteSummary(spark: SparkSession, dir: String): DataFrame = {
    val tags = Seq("value_c", "etype_c")
    // the v1 base commit is a shared template; DELETE commits a NEW
    // version on the clone — the drill prices the candidate-file
    // rewrite commit + read-back (cloneRoot clears the destination, so
    // a stale non-percall root can never stack a base on old history)
    val tmpl = sharedFixture("graft_store_catdel_tmpl", dir) { p =>
      SnapshotCatalog.commit(
        spark,
        p,
        q => encode(eventTypePoints(spark, dir), tagCols = tags).write.parquet(q)
      ): Unit
    }
    val root = SnapshotCatalog.cloneRoot(tmpl, scratchPath("graft_store_catdel", dir))
    val tbl = "tbcd_" + java.security.MessageDigest
      .getInstance("MD5")
      .digest(root.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.take(12)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl USING timebox LOCATION '$root'")
    // purge 'p*' events (ascii 112) — the code every delete door purges
    spark.sql(s"DELETE FROM $tbl WHERE etype_c = 112")
    // the relation's file set changed UNDER the table identifier (new
    // version) — drop any cached resolution before the verification read
    spark.sql(s"REFRESH TABLE $tbl")
    spark.sql(
      s"""SELECT series_id AS user_id,
         |  COUNT(*) AS n_points,
         |  SUM(value_c) AS sum_value_c,
         |  MIN(ts_us) AS min_ts_us,
         |  MAX(ts_us) AS max_ts_us
         |FROM $tbl
         |GROUP BY series_id""".stripMargin
    )
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(): Unit
  }

  /** Oracle-gated DICTIONARY equality read (ts_store_dict_read): encode
    * events with a low-cardinality event-type tag, probe one type code
    * over a week — per-block dictionaries skip every block that doesn't
    * contain the probed type (exactly: dictionary membership has no
    * false positives), composing with the day-range prune, the zone-map
    * envelope, and the blooms. Oracle = the same filter over raw
    * events, so a wrongly-skipped block fails the hash compare.
    */
  def dictReadSummary(
      spark: SparkSession,
      dir: String,
      startUs: Long = 1704672000000000L, // 2024-01-08
      endUs: Long = 1705276800000000L,   // 2024-01-15
      typeCode: Long = 112L              // 'p' — purchase
  ): DataFrame = {
    // read-only dictionary-skip drill over a shared encoded store
    val out = sharedFixture("graft_store_dict", dir) { p =>
      encode(eventTypePoints(spark, dir), tagCols = Seq("value_c", "etype_c"))
        .write.mode("overwrite").parquet(p)
    }
    // facade read: the equality predicate pushes down as dictionary
    // membership + bloom bit tests + the zone-map envelope, composing
    // with the day-range prune — rangeReadValueEquals' skip chain,
    // reached through spark.read.format("timebox")
    spark.read.format("timebox").load(out)
      .select(col("series_id"), col("ts_us"), col("seq"), col("etype_c"))
      .filter(col("ts_us") >= startUs && col("ts_us") < endUs && col("etype_c") === typeCode)
      .groupBy(col("series_id").as("user_id"))
      .agg(
        count(lit(1)).as("n_points"),
        min(col("ts_us")).as("min_ts_us"),
        max(col("ts_us")).as("max_ts_us"),
        sum(col("seq")).as("sum_event_id")
      )
  }

  /** Incremental compaction: re-block ONLY the (series, day) groups
    * that streaming appends fragmented into multiple partial blocks;
    * intact blocks pass through byte-identically, untouched by the
    * decode→re-encode cycle. On an aged 100 TB store this is the
    * difference between rewriting everything and rewriting the few
    * percent the last ingest window touched.
    */
  def compactFragmented(
      spark: SparkSession,
      inPath: String,
      outPath: String,
      tagCols: Seq[String] = Seq("value_c")
  ): Unit = {
    val store = spark.read.parquet(inPath)
    val blockUs = storedBlockUs(store)
    val w = Window.partitionBy(col("series_id"), col("day_id"))
    val marked = store.withColumn("n_blocks", count(lit(1)).over(w))
    val intact = marked.filter(col("n_blocks") === 1).drop("n_blocks")
    val frag = marked.filter(col("n_blocks") > 1).drop("n_blocks")
    val recompacted = encode(
      decode(frag, tagCols).toDF(Seq("series_id", "ts_us", "seq") ++ tagCols: _*),
      "series_id",
      "ts_us",
      "seq",
      tagCols,
      blockUs
    )
    intact.unionByName(recompacted).write.mode("overwrite").parquet(outPath)
  }

  /** Oracle-gated COMPACTION drill (ts_store_compact): the store is
    * deliberately fragmented the way continuous ingest fragments it —
    * two interleaved appends split every (series, day) into two
    * partial blocks (exactly what a micro-batch boundary mid-day does;
    * StreamingSpec drives the same state through the real
    * ingestToStore + checkpoint loop) — then [[compactFragmented]]
    * re-blocks ONLY the fragmented groups. The summary reads the
    * compacted store: n_blocks per series comes from BLOCK ROWS (one
    * per (series, day) iff compaction did its job — the oracle counts
    * DISTINCT days from raw events, so a leftover fragment fails the
    * hash), and the point summary proves the decode lost nothing.
    */
  def compactSummary(spark: SparkSession, dir: String): DataFrame = {
    // the deliberately-fragmented input store is a shared READ-ONLY
    // fixture (compactFragmented only reads it); the drill prices the
    // compaction rewrite + read-back
    val frag = sharedFixture("graft_store_frag", dir) { p =>
      val pts = TimeSeries
        .eventsUs(spark, dir)
        .select(
          col("user_id").as("series_id"),
          col("ts_us"),
          col("event_id").as("seq"),
          cents(col("value")).as("value_c")
        )
      encode(pts.filter(col("seq") % 2 === 0), "series_id", "ts_us", "seq")
        .write.mode("overwrite").partitionBy("day_id").parquet(p)
      encode(pts.filter(col("seq") % 2 === 1), "series_id", "ts_us", "seq")
        .write.mode("append").partitionBy("day_id").parquet(p)
    }
    val out = scratchPath("graft_store_compact", dir)
    compactFragmented(spark, frag, out)
    val store = spark.read.parquet(out)
    val blocks = store.groupBy(col("series_id")).agg(count(lit(1)).as("n_blocks"))
    decode(store)
      .groupBy(col("series_id"))
      .agg(
        count(lit(1)).as("n_points"),
        min(col("ts_us")).as("min_ts_us"),
        max(col("ts_us")).as("max_ts_us"),
        sum(col("value_c")).as("sum_value_c")
      )
      .join(blocks, Seq("series_id"))
      .select(
        col("series_id").as("user_id"),
        col("n_blocks"),
        col("n_points"),
        col("min_ts_us"),
        col("max_ts_us"),
        col("sum_value_c")
      )
  }

  /** Retention vacuum: drop whole blocks that end before `cutUs` and
    * rewrite the store — the aged-data deletion a retention policy
    * runs. Blocks are dropped by their id alone (no decode); the block
    * containing the cut survives whole (retention is block-granular,
    * like the reference's whole-file deletes).
    */
  def vacuum(spark: SparkSession, inPath: String, outPath: String, cutUs: Long): Unit = {
    val store = spark.read.parquet(inPath)
    val blockUs = storedBlockUs(store)
    store
      .filter(col("day_id") >= cutUs / blockUs)
      .write.mode("overwrite").parquet(outPath)
  }

  /** Bucketed block layout — the distributed analogue of the
    * reference's one-file-per-timebox locality (timebox.py:102-106):
    * blocks land in a metastore table bucketed AND sorted by
    * (series_id, day_id), so decode's per-block cumulative window and
    * any per-series aggregation read pre-clustered data with ZERO
    * exchanges (StoreSpec asserts it). At 100 TB this is the
    * difference between "every decode shuffles the store" and "the
    * scan IS the shuffle, paid once at write time".
    */
  def writeBucketedStore(spark: SparkSession, dir: String, table: String, buckets: Int = 8): Unit =
    encode(
      TimeSeries
        .eventsUs(spark, dir)
        .select(col("user_id"), col("ts_us"), col("event_id"), cents(col("value")).as("value_c"))
    ).write
      .mode("overwrite")
      .bucketBy(buckets, "series_id")
      .sortBy("series_id", "day_id")
      .saveAsTable(table)

  /** Decode straight off the bucketed table: the scan's bucket
    * partitioning satisfies the window's and any downstream per-series
    * aggregation's clustering, so the whole read path is exchange-free.
    */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    decode(spark.table(table))

  /** HYBRID layout: day-PARTITIONED directories × series-BUCKETED
    * files — the two prunes composed. A time-range read drops whole
    * day directories before any IO (partition pruning) and the
    * surviving scan still carries the series bucket partitioning, so
    * decode's per-block window and every per-series aggregation run
    * with ZERO exchanges (HashPartitioning(series) satisfies any
    * clustering that contains series). This is the production layout
    * for "last week, these series" reads on a 100 TB store: both
    * dominant predicates resolve before a byte of block data moves.
    */
  def writeHybridStore(spark: SparkSession, dir: String, table: String, buckets: Int = 8): Unit =
    encode(
      TimeSeries
        .eventsUs(spark, dir)
        .select(col("user_id"), col("ts_us"), col("event_id"), cents(col("value")).as("value_c"))
    ).write
      .mode("overwrite")
      .partitionBy("day_id")
      .bucketBy(buckets, "series_id")
      .sortBy("series_id")
      .saveAsTable(table)

  /** Range read off the hybrid table: day predicate prunes partitions,
    * decode stays exchange-free on the bucket layout (StoreSpec
    * asserts both on the same plan).
    */
  def readHybrid(spark: SparkSession, table: String, startUs: Long, endUs: Long): DataFrame = {
    val store = spark.table(table)
    val blockUs = storedBlockUs(store)
    val blocks = store
      .filter(col("day_id") >= startUs / blockUs && col("day_id") <= (endUs - 1) / blockUs)
      .filter(col("start_us") < endUs)
    decode(blocks).filter(col("ts_us") >= startUs && col("ts_us") < endUs)
  }

  /** Scratch location for in-query store builds. All scratch lives
    * under ONE per-process root that a shutdown hook deletes
    * recursively, so (a) two concurrent JVMs (a driver verify racing a
    * bench, say) can never overwrite-while-read each other's index
    * state, and (b) nothing leaks across runs.
    *
    * Within a process the path is keyed by (prefix, input dir) and
    * writers use overwrite mode — repeated invocations (Bench runs each
    * query twice) reuse the location. Setting the system property
    * `graft.scratch.percall=true` makes every call unique instead:
    * that is what Verify sets to run queries CONCURRENTLY (two queries
    * sharing a prefix would otherwise race), and what Bench sets so a
    * best-of-2 second pass measures a fresh build rather than a
    * checkpoint-resume no-op. Tests that exercise checkpoint RESUME
    * (StreamingSpec's kill-between-batches drill) rely on the stable
    * default.
    */
  private lazy val scratchRoot: String = {
    val root = new java.io.File(
      s"${sys.props("java.io.tmpdir")}/graft_scratch_${java.util.UUID.randomUUID().toString.take(12)}"
    )
    root.mkdirs()
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(): Unit
      }
      rm(root)
    }
    root.getAbsolutePath
  }

  private val scratchSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  // bounded + validated (ProcessMemo policy, SURVEY §4): capped at 32
  // remembered fixture templates; a template whose ready marker (or
  // directory) vanished is rebuilt, never served dangling
  private val fixtureTemplates = new ProcessMemo[String, String](32)

  /** Build-at-most-once INPUT fixture — the cdcAsofFixture /
    * storeStreamFixture discipline generalized: `build` materializes
    * the fixture at a process-shared path the first time a
    * (prefix, params, dir) key is seen; later calls reuse it. The
    * ready marker lives NEXT TO the directory (never inside it), so
    * the fixture's own contents stay byte-identical to a per-call
    * build. Read-only consumers use the returned path directly;
    * consumers that MUTATE the fixture take a private per-call clone
    * via [[fixtureClone]]. ProcessMemo holds its lock across the
    * build, so concurrent callers (Verify's 4-way pool) build once.
    */
  private[graft] def sharedFixture(prefix: String, dir: String, params: String = "")(
      build: String => Unit
  ): String = {
    val root = sharedScratchPath(if (params.isEmpty) prefix else s"${prefix}_$params", dir)
    val ready = java.nio.file.Paths.get(root + "__ready")
    fixtureTemplates.getOrElseUpdate(
      root,
      r => java.nio.file.Files.isDirectory(java.nio.file.Paths.get(r)) && java.nio.file.Files.exists(ready)
    ) {
      // a half-built template (failed earlier attempt) has no marker —
      // rebuild clean
      java.nio.file.Files.deleteIfExists(ready): Unit
      deleteRecursively(new java.io.File(root))
      build(root)
      java.nio.file.Files.createFile(ready): Unit
      root
    }
  }

  /** Per-call private clone of a [[sharedFixture]] template for
    * queries that MUTATE their fixture (appends, deletes, streaming
    * sinks): a local-fs file copy of the already-encoded template is
    * O(fixture bytes) with zero recompute — the query then pays only
    * its own subject (the mutation + read path). The destination is
    * cleared first so a stable-scratch (non-percall) second call can
    * never see the previous call's mutations.
    */
  private[graft] def fixtureClone(templatePath: String, dstPrefix: String, dir: String): String =
    fixtureCloneTo(templatePath, scratchPath(dstPrefix, dir))

  /** [[fixtureClone]] into a caller-chosen destination (streaming
    * queries pin their store path before the resume-or-build check).
    */
  private[graft] def fixtureCloneTo(templatePath: String, dst: String): String = {
    deleteRecursively(new java.io.File(dst))
    copyTree(templatePath, dst)
    dst
  }

  private[graft] def copyTree(src: String, dst: String): Unit = {
    val s = java.nio.file.Paths.get(src)
    val d = java.nio.file.Paths.get(dst)
    val walk = java.nio.file.Files.walk(s)
    try {
      val it = walk.iterator()
      while (it.hasNext) {
        val p = it.next()
        val t = d.resolve(s.relativize(p).toString)
        if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(t): Unit
        else {
          java.nio.file.Files.createDirectories(t.getParent): Unit
          java.nio.file.Files.copy(p, t, java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
        }
      }
    } finally walk.close()
  }

  private[graft] def scratchPath(prefix: String, dir: String): String = {
    val key = dir.replaceAll("[^A-Za-z0-9._-]", "_")
    if (sys.props.get("graft.scratch.percall").contains("true"))
      s"$scratchRoot/${prefix}_${key}_c${scratchSeq.incrementAndGet()}"
    else s"$scratchRoot/${prefix}_$key"
  }

  /** Like [[scratchPath]] but ALWAYS stable within the process,
    * ignoring `graft.scratch.percall`: the location for shared INPUT
    * tiers ([[GraphTier]]) that queries read but do not own — percall
    * exists to isolate per-query fixture builds from each other, and a
    * tier that every graph query reads is the opposite of a per-query
    * fixture (rebuilding it per call is exactly the per-dashboard-query
    * LSH recompute the tier eliminates). Still under the per-process
    * root, so cross-JVM isolation and shutdown cleanup hold.
    */
  private[graft] def sharedScratchPath(prefix: String, dir: String): String = {
    // the sanitizer is lossy (/a/b and /a_b collide) — a digest of the
    // RAW dir string makes the key collision-proof, so two corpora can
    // never silently share one tier within a process
    val digest = java.security.MessageDigest
      .getInstance("MD5")
      .digest(dir.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.take(8)
    s"$scratchRoot/${prefix}_${dir.replaceAll("[^A-Za-z0-9._-]", "_")}_$digest"
  }

  private val LineitemTags = Seq("qty_c", "price_c", "disc_c")

  /** Multi-tag points frame from lineitem: series = supplier, time =
    * ship date, three fixed-point tag columns (the reference's
    * many-tags-per-timebox shape, timebox_tag.py).
    */
  def lineitemPoints(spark: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(spark, dir)
      .select(
        col("l_suppkey").as("series_id"),
        unix_micros(col("l_shipdate").cast("timestamp")).as("ts_us"),
        (col("l_orderkey") * 10 + col("l_linenumber")).as("seq"),
        cents(col("l_quantity")).as("qty_c"),
        cents(col("l_extendedprice")).as("price_c"),
        cents(col("l_discount")).as("disc_c")
      )

  /** Oracle-gated multi-tag roundtrip on lineitem (3 tags, per-tag
    * min-ref + width plans), summarized per supplier.
    */
  def multitagRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = scratchPath("graft_store_mt", dir)
    // block granularity follows point density: ship dates are sparse
    // per supplier (~1/day would leave 1-point blocks), so block by
    // 32-day windows — the tuning knob a real deployment sets per table
    encode(lineitemPoints(spark, dir), "series_id", "ts_us", "seq", LineitemTags, blockUs = 32 * DayUs)
      .write.mode("overwrite").parquet(out)
    decode(spark.read.parquet(out), LineitemTags)
      .groupBy(col("series_id").as("l_suppkey"))
      .agg(
        count(lit(1)).as("n_points"),
        min(col("ts_us")).as("min_ship_us"),
        max(col("ts_us")).as("max_ship_us"),
        sum(col("qty_c")).as("sum_qty_c"),
        sum(col("price_c")).as("sum_price_c"),
        sum(col("disc_c")).as("sum_disc_c")
      )
  }
}
