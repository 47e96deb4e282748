package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.FixedPoint._
import graft.operators.TimeSeries.eventsUs

/** Storage-planning operators — the reference's compression planner
  * re-expressed as distributed aggregations.
  *
  * The reference plans per-tag storage by scanning value ranges
  * (utils/binary.py:5-43 determine_required_bytes_*,
  * utils/numpy_utils.py:187-241 compress_array). On Spark those plans
  * are single-shuffle groupBy aggregates whose partial (map-side)
  * combine does nearly all the work — the natural 100 TB shape: each
  * executor reduces its slice to one (min,max,sum,count) tuple per
  * group before anything crosses the network.
  */
object Compression {

  // -------------------------------------------------------------------
  // 5. ts_downcast_plan — smallest integer width + signedness per tag
  // (binary.py:5-43: unsigned if min>=0, then 1/2/4/8 bytes by range).
  // -------------------------------------------------------------------
  def downcastPlan(spark: SparkSession, dir: String): DataFrame = {
    eventsUs(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        min(cents(col("value"))).as("min_c"),
        max(cents(col("value"))).as("max_c"),
        count(lit(1)).as("n")
      )
      .withColumn("type_char", when(col("min_c") >= 0, lit("u")).otherwise(lit("i")))
      .withColumn(
        "n_bytes",
        when(
          col("min_c") >= 0,
          when(col("max_c") < 256L, 1L)
            .when(col("max_c") < 65536L, 2L)
            .when(col("max_c") < 4294967296L, 4L)
            .otherwise(8L)
        ).otherwise(
          when(col("min_c") >= -128L && col("max_c") < 128L, 1L)
            .when(col("min_c") >= -32768L && col("max_c") < 32768L, 2L)
            .when(col("min_c") >= -2147483648L && col("max_c") < 2147483648L, 4L)
            .otherwise(8L)
        )
      )
  }

  // -------------------------------------------------------------------
  // 6. ts_compress_minref — mode-'m' compression: store values as
  // offsets from the per-series minimum (numpy_utils.py:187-241,
  // compress_array mode 'm'). The offset stream's checksum
  // (sum/max/count) is derived algebraically from one agg pass —
  // sum(offset) = sum(v) - n*min — so no second scan is needed.
  // -------------------------------------------------------------------
  def minRefCompress(spark: SparkSession, dir: String): DataFrame = {
    eventsUs(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        min(cents(col("value"))).as("min_c"),
        max(cents(col("value"))).as("max_c"),
        sum(cents(col("value"))).as("sum_c"),
        count(lit(1)).as("n")
      )
      .select(
        col("user_id"),
        col("min_c"),
        (col("max_c") - col("min_c")).as("max_offset_c"),
        (col("sum_c") - col("n") * col("min_c")).as("sum_offset_c"),
        col("n")
      )
  }

  // -------------------------------------------------------------------
  // 7. ts_round_fixed — fixed-point encode/decode roundtrip
  // (numpy_utils.py:266-275 round_array_returning_integers,
  // timebox_tag.py:229-266): round(v·10^d) → int64 → /10^d, at d=2 and
  // d=4, with a decode-reencode identity count proving losslessness.
  // -------------------------------------------------------------------
  def roundFixed(spark: SparkSession, dir: String): DataFrame = {
    val enc2 = fixed(col("value"), 2)
    val enc4 = fixed(col("value"), 4)
    val roundtrip2 = fixed(fromFixed(fixed(col("value"), 2), 2), 2)
    eventsUs(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(enc2).as("sum_enc2"),
        sum(enc4).as("sum_enc4"),
        sum(when(roundtrip2 === enc2, 1L).otherwise(0L)).as("n_roundtrip_ok")
      )
  }
}
