package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Fixed-point encodings for cross-engine-exact numeric results.
  *
  * The reference stores floats as `round(x * 10^d) -> int64`
  * (timebox/utils/numpy_utils.py:266-275 round_array_returning_integers,
  * timebox/timebox_tag.py:229-250 encode_data); we use the same trick so
  * aggregate results are integers — exact, order-independent, and
  * identical between Spark and any SQL oracle. At 100 TB this also makes
  * sums re-aggregable across partial aggregates with zero FP drift.
  */
object FixedPoint {
  /** money-like doubles -> integer cents */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** scores/ratios -> integer micro-units (1e-6 resolution) */
  def micro(c: Column): Column = round(c * 1e6).cast("long")

  /** decode: integer cents -> double */
  def fromCents(c: Column): Column = c.cast("double") / 100.0

  /** fixed-point with caller-chosen decimals (reference's num_decimals_to_store) */
  def fixed(c: Column, decimals: Int): Column =
    round(c * math.pow(10, decimals)).cast("long")

  def fromFixed(c: Column, decimals: Int): Column =
    c.cast("double") / math.pow(10, decimals)
}
