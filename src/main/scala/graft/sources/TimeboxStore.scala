package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  *   - values are fixed-point cents, offset from the block min
  *     (mode-'m' compression, numpy_utils.py:187-241), with the
  *     reference's width plan (binary.py:5-43) recorded per block;
  *   - decode reverses losslessly: cumulative-sum the deltas back to
  *     absolute micros, add the value offsets back to the min.
  *
  * Parquet supplies the physical byte packing (dictionary/RLE/bit
  * width); the *semantic* compression — delta, unit, min-ref, width
  * plan — is the engine's, exactly as in the reference.
  */
object TimeboxStore {

  private val DayUs = 86400000000L
  private val UnitLadder = Seq(86400000000L, 3600000000L, 60000000L, 1000000L, 1000L)

  /** Encode an events-shaped frame into block-columnar form (one row
    * per (user_id, day) block). Pure DataFrame transform — call
    * `.write.parquet(...)` on the result to persist.
    */
  def encode(events: DataFrame): DataFrame = {
    val pts = sort_array(collect_list(struct(col("ts_us"), col("event_id"), col("value_c"))))
    val blocks = events
      .select(
        col("user_id"),
        expr(s"ts_us DIV ${DayUs}L").as("day_id"),
        col("ts_us"),
        col("event_id"),
        col("value_c")
      )
      .groupBy(col("user_id"), col("day_id"))
      .agg(pts.as("pts"))
      .select(
        col("user_id"),
        col("day_id"),
        expr("pts[0].ts_us").as("start_us"),
        expr("transform(pts, (p, i) -> IF(i = 0, 0L, p.ts_us - pts[i-1].ts_us))").as("deltas_us"),
        expr("transform(pts, p -> p.event_id)").as("event_ids"),
        expr("transform(pts, p -> p.value_c)").as("values_c")
      )
      // coarsest ladder unit dividing every delta in the block
      .withColumn(
        "unit_us",
        UnitLadder
          .foldRight(lit(1L)) { (u, fallback) =>
            when(forall(col("deltas_us"), d => d % u === 0), lit(u)).otherwise(fallback)
          }
      )
      .withColumn("deltas", expr("transform(deltas_us, d -> d DIV unit_us)"))
      .withColumn("value_min_c", array_min(col("values_c")))
      .withColumn("value_offs", expr("transform(values_c, v -> v - value_min_c)"))
    // the reference's width plan, recorded per block (binary.py:5-43):
    // deltas and offsets are unsigned post-encoding, so plan on the max
    def widthOf(maxCol: String) =
      when(col(maxCol) < 256L, 1).when(col(maxCol) < 65536L, 2).when(col(maxCol) < 4294967296L, 4).otherwise(8)
    blocks
      .withColumn("max_delta", coalesce(array_max(col("deltas")), lit(0L)))
      .withColumn("max_off", coalesce(array_max(col("value_offs")), lit(0L)))
      .select(
        col("user_id"),
        col("day_id"),
        col("start_us"),
        col("unit_us"),
        size(col("deltas")).cast("long").as("n_points"),
        widthOf("max_delta").as("delta_bytes"),
        widthOf("max_off").as("value_bytes"),
        col("value_min_c"),
        col("deltas"),
        col("event_ids"),
        col("value_offs")
      )
  }

  /** Decode block-columnar rows back to (user_id, ts_us, event_id,
    * value_c) points. Lossless inverse of [[encode]].
    */
  def decode(blocks: DataFrame): DataFrame = {
    // posexplode + running-sum of deltas per block. The cumulative
    // window shuffles on the block key — the same key the encode
    // aggregated on, so with a bucketed block layout this is co-located
    // and shuffle-free; block size bounds the sort, not series length.
    val w = Window
      .partitionBy("user_id", "day_id")
      .orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    blocks
      .select(
        col("user_id"),
        col("day_id"),
        col("start_us"),
        col("unit_us"),
        col("value_min_c"),
        posexplode(expr("arrays_zip(deltas, event_ids, value_offs)")).as(Seq("pos", "p"))
      )
      .withColumn("ts_us", col("start_us") + sum(col("p.deltas")).over(w) * col("unit_us"))
      .select(
        col("user_id"),
        col("ts_us"),
        col("p.event_ids").as("event_id"),
        (col("value_min_c") + col("p.value_offs")).as("value_c")
      )
  }

  /** Full write path from the raw events table. */
  def write(spark: SparkSession, dir: String, outPath: String): Unit =
    encode(
      TimeSeries
        .eventsUs(spark, dir)
        .select(col("user_id"), col("ts_us"), col("event_id"), cents(col("value")).as("value_c"))
    ).write.mode("overwrite").parquet(outPath)

  def read(spark: SparkSession, path: String): DataFrame =
    decode(spark.read.parquet(path))

  /** Oracle-gated roundtrip query: encode -> persist -> decode -> per-
    * series summary. Any codec loss shows up against the DuckDB oracle
    * computed on the ORIGINAL events.
    */
  def roundtripSummary(spark: SparkSession, dir: String): DataFrame = {
    val out = java.nio.file.Files.createTempDirectory("graft_store").toString
    write(spark, dir, out)
    read(spark, out)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_points"),
        min(col("ts_us")).as("min_ts_us"),
        max(col("ts_us")).as("max_ts_us"),
        sum(col("value_c")).as("sum_value_c"),
        sum(col("event_id")).as("sum_event_id")
      )
  }
}
