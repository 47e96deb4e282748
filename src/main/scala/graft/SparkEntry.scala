package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- time-series core (timebox semantics) --------------------------
    "ts_range_read"      -> ((s, d) => TimeSeries.rangeRead(s, d)),
    "ts_delta_encode"    -> ((s, d) => TimeSeries.deltaEncode(s, d)),
    "ts_delta_decode"    -> ((s, d) => TimeSeries.deltaDecode(s, d)),
    "ts_unit_compress"   -> ((s, d) => TimeSeries.unitCompress(s, d)),
    "ts_downcast_plan"   -> ((s, d) => Compression.downcastPlan(s, d)),
    "ts_compress_minref" -> ((s, d) => Compression.minRefCompress(s, d)),
    "ts_round_fixed"     -> ((s, d) => Compression.roundFixed(s, d)),
    "ts_regular_grid"    -> ((s, d) => TimeSeries.regularGrid(s, d)),
    "ts_resample_1h"     -> ((s, d) => TimeSeries.resampleHourly(s, d)),
    "ts_ohlc_1d"         -> ((s, d) => TimeSeries.ohlcDaily(s, d)),
    "ts_moving_avg"      -> ((s, d) => TimeSeries.movingAgg(s, d)),
    "ts_sessionize"      -> ((s, d) => TimeSeries.sessionize(s, d)),
    "ts_asof_join"       -> ((s, d) => TimeSeries.asofJoin(s, d)),
    "ts_gapfill_locf"    -> ((s, d) => TimeSeries.gapfillLocf(s, d)),
    // -- relational analytics ------------------------------------------
    "q1_pricing_summary" -> ((s, d) => Relational.pricingSummary(s, d)),
    "q3_topk_revenue"    -> ((s, d) => Relational.topkRevenue(s, d)),
    "q5_region_revenue"  -> ((s, d) => Relational.regionRevenue(s, d)),
    "topk_per_group"     -> ((s, d) => Relational.topkPerGroup(s, d)),
    "group_distinct"     -> ((s, d) => Relational.groupDistinct(s, d))
  )

  /** DuckDB oracle SQL for the time-series queries (§2 rows 1-14). */
  private val tsOracles: Map[String, String] = Map(
    "ts_range_read" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |  CAST(round(value*100) AS BIGINT) AS value_c
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-15 00:00:00' AND event_type = 'click'""".stripMargin,
    "ts_delta_encode" ->
      """SELECT user_id, CAST(ROW_NUMBER() OVER w - 1 AS BIGINT) AS seq,
        |  epoch_us(ts) AS ts_us,
        |  COALESCE(epoch_us(ts) - lag(epoch_us(ts)) OVER w, 0) AS delta_us
        |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin,
    "ts_delta_decode" ->
      """WITH d AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |         COALESCE(epoch_us(ts) - lag(epoch_us(ts)) OVER w, 0) AS delta_us
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), r AS (
        |  SELECT user_id, ts_us,
        |         first_value(ts_us) OVER w2 + CAST(SUM(delta_us) OVER w2 AS BIGINT) AS recon_us
        |  FROM d WINDOW w2 AS (PARTITION BY user_id ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING)
        |)
        |SELECT user_id, COUNT(*) AS n_points,
        |  CAST(SUM(CASE WHEN recon_us != ts_us THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch,
        |  MIN(ts_us) AS min_ts_us, MAX(ts_us) AS max_ts_us
        |FROM r GROUP BY user_id""".stripMargin,
    "ts_unit_compress" ->
      """WITH d AS (
        |  SELECT l_suppkey,
        |         epoch_us(l_shipdate) - lag(epoch_us(l_shipdate)) OVER w AS delta_us
        |  FROM lineitem
        |  WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber)
        |), u AS (
        |  SELECT l_suppkey, COUNT(*) AS n_deltas,
        |         CASE WHEN bool_and(delta_us % 86400000000 = 0) THEN 86400000000
        |              WHEN bool_and(delta_us % 3600000000 = 0) THEN 3600000000
        |              WHEN bool_and(delta_us % 60000000 = 0) THEN 60000000
        |              WHEN bool_and(delta_us % 1000000 = 0) THEN 1000000
        |              WHEN bool_and(delta_us % 1000 = 0) THEN 1000
        |              ELSE 1 END AS unit_us,
        |         MAX(delta_us) AS max_delta_us
        |  FROM d WHERE delta_us IS NOT NULL GROUP BY l_suppkey
        |)
        |SELECT l_suppkey, n_deltas, CAST(unit_us AS BIGINT) AS unit_us, max_delta_us,
        |       max_delta_us // CAST(unit_us AS BIGINT) AS max_scaled_delta
        |FROM u""".stripMargin,
    "ts_downcast_plan" ->
      """WITH a AS (
        |  SELECT event_type, MIN(CAST(round(value*100) AS BIGINT)) AS min_c,
        |         MAX(CAST(round(value*100) AS BIGINT)) AS max_c, COUNT(*) AS n
        |  FROM events GROUP BY event_type
        |)
        |SELECT event_type, min_c, max_c, n,
        |  CASE WHEN min_c >= 0 THEN 'u' ELSE 'i' END AS type_char,
        |  CAST(CASE WHEN min_c >= 0 THEN
        |         CASE WHEN max_c < 256 THEN 1 WHEN max_c < 65536 THEN 2
        |              WHEN max_c < 4294967296 THEN 4 ELSE 8 END
        |       ELSE
        |         CASE WHEN min_c >= -128 AND max_c < 128 THEN 1
        |              WHEN min_c >= -32768 AND max_c < 32768 THEN 2
        |              WHEN min_c >= -2147483648 AND max_c < 2147483648 THEN 4
        |              ELSE 8 END END AS BIGINT) AS n_bytes
        |FROM a""".stripMargin,
    "ts_compress_minref" ->
      """WITH a AS (
        |  SELECT user_id, MIN(CAST(round(value*100) AS BIGINT)) AS min_c,
        |         MAX(CAST(round(value*100) AS BIGINT)) AS max_c,
        |         CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_c,
        |         COUNT(*) AS n
        |  FROM events GROUP BY user_id
        |)
        |SELECT user_id, min_c, max_c - min_c AS max_offset_c,
        |       sum_c - n * min_c AS sum_offset_c, n
        |FROM a""".stripMargin,
    "ts_round_fixed" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_enc2,
        |  CAST(SUM(CAST(round(value*10000) AS BIGINT)) AS BIGINT) AS sum_enc4,
        |  CAST(SUM(CASE WHEN CAST(round((CAST(round(value*100) AS BIGINT) / 100.0) * 100.0) AS BIGINT)
        |                     = CAST(round(value*100) AS BIGINT) THEN 1 ELSE 0 END) AS BIGINT) AS n_roundtrip_ok
        |FROM events GROUP BY event_type""".stripMargin,
    "ts_regular_grid" ->
      """WITH b AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us,
        |         MIN(epoch_us(ts)) OVER (PARTITION BY user_id) AS start_us
        |  FROM events
        |)
        |SELECT user_id, MIN(ts_us) AS start_us, MAX(ts_us) AS end_us, COUNT(*) AS n_events,
        |  CAST(COUNT(DISTINCT (ts_us - start_us) // 3600000000) AS BIGINT) AS n_filled_slots,
        |  (MAX(ts_us) - MIN(ts_us)) // 3600000000 + 1 AS n_slots
        |FROM b GROUP BY user_id""".stripMargin,
    "ts_resample_1h" ->
      """SELECT epoch_us(ts) // 3600000000 AS hour_id, event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_c,
        |  MIN(CAST(round(value*100) AS BIGINT)) AS min_c,
        |  MAX(CAST(round(value*100) AS BIGINT)) AS max_c
        |FROM events GROUP BY 1, 2""".stripMargin,
    "ts_ohlc_1d" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day_id, epoch_us(ts) AS ts_us,
        |         event_id, CAST(round(value*100) AS BIGINT) AS value_c
        |  FROM events
        |), r AS (
        |  SELECT *,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, day_id ORDER BY ts_us ASC, event_id ASC) AS rn_a,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, day_id ORDER BY ts_us DESC, event_id DESC) AS rn_d
        |  FROM e
        |)
        |SELECT user_id, day_id,
        |  MAX(CASE WHEN rn_a = 1 THEN value_c END) AS open_c,
        |  MAX(value_c) AS high_c, MIN(value_c) AS low_c,
        |  MAX(CASE WHEN rn_d = 1 THEN value_c END) AS close_c,
        |  COUNT(*) AS n
        |FROM r GROUP BY user_id, day_id""".stripMargin,
    "ts_moving_avg" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |  CAST(SUM(CAST(round(value*100) AS BIGINT)) OVER w AS BIGINT) AS w5_sum_c,
        |  CAST(COUNT(*) OVER w AS BIGINT) AS w5_n
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)""".stripMargin,
    "ts_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |              THEN 1 ELSE 0 END AS is_new
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), s AS (
        |  SELECT user_id, ts_us,
        |         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        |  FROM g
        |)
        |SELECT user_id, session_seq, MIN(ts_us) AS start_us, MAX(ts_us) AS end_us,
        |       COUNT(*) AS n_events, MAX(ts_us) - MIN(ts_us) AS duration_us
        |FROM s GROUP BY user_id, session_seq""".stripMargin,
    "ts_asof_join" ->
      """SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
        |       COALESCE(epoch_us(c.ts), -1) AS click_ts_us
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin,
    "ts_gapfill_locf" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) // 3600000000 AS hour_id, epoch_us(ts) AS ts_us,
        |         event_id, CAST(round(value*100) AS BIGINT) AS value_c
        |  FROM events
        |), h AS (
        |  SELECT user_id, hour_id, value_c FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, hour_id
        |                                 ORDER BY ts_us DESC, event_id DESC) AS rn
        |    FROM e
        |  ) WHERE rn = 1
        |), g AS (
        |  SELECT user_id, unnest(generate_series(MIN(hour_id), MAX(hour_id))) AS hour_id
        |  FROM e GROUP BY user_id
        |), j AS (
        |  SELECT g.user_id, g.hour_id, h.value_c,
        |         CASE WHEN h.value_c IS NULL THEN 0 ELSE 1 END AS is_observed
        |  FROM g LEFT JOIN h ON g.user_id = h.user_id AND g.hour_id = h.hour_id
        |)
        |SELECT user_id, hour_id,
        |  COALESCE(last_value(value_c IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY hour_id
        |                                                  ROWS UNBOUNDED PRECEDING), -1) AS value_c,
        |  CAST(is_observed AS BIGINT) AS is_observed
        |FROM j""".stripMargin
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = tsOracles ++ Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
        |  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_c,
        |  CAST(SUM(CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT) AS sum_disc_c,
        |  CAST(SUM(CAST(round(l_extendedprice*(1.0-l_discount)*(1.0+l_tax)*100) AS BIGINT)) AS BIGINT) AS sum_charge_c,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q3_topk_revenue" ->
      """SELECT l_orderkey,
        |  CAST(SUM(CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_c
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey
        |ORDER BY revenue_c DESC, l_orderkey ASC
        |LIMIT 10""".stripMargin,
    "q5_region_revenue" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_c
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name""".stripMargin,
    "topk_per_group" ->
      """SELECT o_custkey, o_orderkey, totalprice_c, rnk FROM (
        |  SELECT o_custkey, o_orderkey,
        |    CAST(round(o_totalprice*100) AS BIGINT) AS totalprice_c,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
        |  FROM orders) t
        |WHERE rnk <= 3""".stripMargin,
    "group_distinct" ->
      """SELECT event_type,
        |  COUNT(DISTINCT user_id) AS n_users,
        |  COUNT(*) AS n_events
        |FROM events
        |GROUP BY event_type""".stripMargin
  )
}
