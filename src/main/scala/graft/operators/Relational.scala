package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.FixedPoint._
import graft.sources.Tables

/** Relational analytics surface on the TPC-H-ish tables.
  *
  * Scale notes: dimension tables (region/nation/supplier/customer at
  * these ratios) are broadcast; fact-fact joins shuffle on the join key
  * only, with AQE free to pick better at runtime. All money aggregates
  * are integer cents ([[graft.functions.FixedPoint]]) so partial
  * aggregation (map-side combine) is exact and order-independent.
  */
object Relational {

  /** TPC-H Q1 shape: single scan, fully partial-aggregable, 2-col group key. */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables
      .lineitem(spark, dir)
      .filter($"l_shipdate" <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum(cents($"l_quantity")).as("sum_qty_c"),
        sum(cents($"l_extendedprice")).as("sum_base_c"),
        sum(cents($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("sum_disc_c"),
        sum(cents($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax"))).as("sum_charge_c"),
        count(lit(1)).as("count_order")
      )
  }

  /** TPC-H Q3 shape: customer ⋈ orders ⋈ lineitem, broadcast the filtered
    * customer side, aggregate revenue, top-10 by revenue.
    */
  def topkRevenue(spark: SparkSession, dir: String, segment: String = "BUILDING", k: Int = 10): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, dir).filter($"c_mktsegment" === segment).select($"c_custkey")
    val ord  = Tables.orders(spark, dir).select($"o_orderkey", $"o_custkey", $"o_orderdate")
    val li   = Tables.lineitem(spark, dir).select($"l_orderkey", $"l_extendedprice", $"l_discount")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey")
      .agg(sum(cents($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("revenue_c"))
      .orderBy($"revenue_c".desc, $"l_orderkey".asc)
      .limit(k)
  }

  /** TPC-H Q5 shape: 6-way join; all dims broadcast, single fact shuffle. */
  def regionRevenue(spark: SparkSession, dir: String, regionName: String = "ASIA"): DataFrame = {
    import spark.implicits._
    val region = Tables.region(spark, dir).filter($"r_name" === regionName)
    val nation = Tables.nation(spark, dir)
    val cust   = Tables.customer(spark, dir).select($"c_custkey", $"c_nationkey")
    val sup    = Tables.supplier(spark, dir).select($"s_suppkey", $"s_nationkey")
    val ord    = Tables.orders(spark, dir).select($"o_orderkey", $"o_custkey")
    val li     = Tables.lineitem(spark, dir).select($"l_orderkey", $"l_suppkey", $"l_extendedprice", $"l_discount")

    val dims = broadcast(
      nation
        .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
        .select($"n_nationkey", $"n_name")
    )
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .join(broadcast(sup), $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
      .join(dims, $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(sum(cents($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("revenue_c"))
  }

  /** Window rank: top-N orders per customer by price (deterministic
    * tiebreak on orderkey). One shuffle on the partition key.
    */
  def topkPerGroup(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    Tables
      .orders(spark, dir)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter($"rnk" <= k)
      .select($"o_custkey", $"o_orderkey", cents($"o_totalprice").as("totalprice_c"), $"rnk")
  }

  /** Exact distinct counting per group (shuffle-expand then agg; Spark
    * plans the two-phase distinct automatically).
    */
  def groupDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables
      .events(spark, dir)
      .groupBy($"event_type")
      .agg(
        countDistinct($"user_id").as("n_users"),
        count(lit(1)).as("n_events")
      )
  }

  /** TPC-H Q14 shape: conditional aggregation over a fact ⋈ dim join —
    * promo revenue share per part type bucket. The dim broadcasts; the
    * CASE folds into the partial aggregate, so the answer is one scan +
    * one small exchange.
    */
  def promoRevenueShare(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val part = Tables.part(spark, dir).select($"p_partkey", $"p_type")
    Tables
      .lineitem(spark, dir)
      .select($"l_partkey", $"l_extendedprice", $"l_discount")
      .join(broadcast(part), $"l_partkey" === $"p_partkey")
      .agg(
        sum(
          when($"p_type" === "PROMO", cents($"l_extendedprice" * (lit(1.0) - $"l_discount"))).otherwise(0L)
        ).as("promo_c"),
        sum(cents($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("total_c"),
        count(lit(1)).as("n")
      )
      .select(
        $"promo_c",
        $"total_c",
        $"n",
        expr("promo_c * 1000000 DIV total_c").as("promo_share_micro")
      )
  }

  /** Anti-join: customers with no order in a given year. LeftAnti
    * plans as a broadcast/shuffled hash join emitting only non-matches
    * — no NOT-IN subquery materialization, no null-semantics trap, and
    * the date filter pushes into the build side's scan.
    */
  def customersWithoutOrders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ordersInYear = Tables
      .orders(spark, dir)
      .filter(
        $"o_orderdate" >= lit(java.sql.Timestamp.valueOf("1995-01-01 00:00:00")) &&
          $"o_orderdate" < lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00"))
      )
      .select($"o_custkey")
    Tables
      .customer(spark, dir)
      .select($"c_custkey", $"c_nationkey".cast("long").as("c_nationkey"))
      .join(ordersInYear, $"c_custkey" === $"o_custkey", "left_anti")
  }

  /** Semi-join: suppliers with at least one shipment in a date window.
    * LeftSemi stops probing at the first match — no duplicate blowup,
    * no distinct needed.
    */
  def suppliersShippedInWindow(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val shipped = Tables
      .lineitem(spark, dir)
      .filter(
        $"l_shipdate" >= lit(java.sql.Timestamp.valueOf("1995-01-01 00:00:00")) &&
          $"l_shipdate" < lit(java.sql.Timestamp.valueOf("1995-04-01 00:00:00"))
      )
      .select($"l_suppkey")
    Tables
      .supplier(spark, dir)
      .select($"s_suppkey", $"s_nationkey".cast("long").as("s_nationkey"))
      .join(shipped, $"s_suppkey" === $"l_suppkey", "left_semi")
  }

  /** Rollup aggregation: revenue by (returnflag, linestatus) with
    * subtotals and a grand total — one pass, Spark expands the
    * grouping sets internally; integer cents keep every level exact.
    */
  def revenueRollup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables
      .lineitem(spark, dir)
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(
        sum(cents($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("revenue_c"),
        count(lit(1)).as("n")
      )
      .select(
        coalesce($"l_returnflag", lit("ALL")).as("returnflag"),
        coalesce($"l_linestatus", lit("ALL")).as("linestatus"),
        $"revenue_c",
        $"n"
      )
  }

  /** CUBE aggregation (rel_cube): revenue across every combination of
    * (returnflag, linestatus) marginals — rollup's sibling that also
    * produces the per-linestatus totals. Same one-pass grouping-set
    * expansion; integer cents keep all 2^k levels exact.
    */
  def revenueCube(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables
      .lineitem(spark, dir)
      .cube($"l_returnflag", $"l_linestatus")
      .agg(
        sum(cents($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("revenue_c"),
        count(lit(1)).as("n")
      )
      .select(
        coalesce($"l_returnflag", lit("ALL")).as("returnflag"),
        coalesce($"l_linestatus", lit("ALL")).as("linestatus"),
        $"revenue_c",
        $"n"
      )
  }

  /** TPC-H Q10 shape (rel_q10_returns): revenue lost to returned items
    * per customer — fact filtered and aggregated FIRST (pushed
    * returnflag filter + partial aggregation), then the small survivor
    * set joins the customer dimension; top 20 via TakeOrdered, never a
    * global sort.
    */
  def returnedRevenue(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    import spark.implicits._
    val returned = Tables
      .lineitem(spark, dir)
      .filter($"l_returnflag" === "R")
      .join(
        Tables.orders(spark, dir).select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey"
      )
      .groupBy($"o_custkey")
      .agg(sum(cents($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("revenue_c"))
    returned
      .join(Tables.customer(spark, dir).select($"c_custkey", $"c_name"), $"o_custkey" === $"c_custkey")
      .select($"c_custkey", $"c_name", $"revenue_c")
      .orderBy($"revenue_c".desc, $"c_custkey".asc)
      .limit(k)
      .withColumn("rnk", row_number().over(
        Window.orderBy($"revenue_c".desc, $"c_custkey".asc)
      ).cast("long"))
  }

  /** TPC-H Q18 shape: large-quantity orders — aggregate the fact table
    * FIRST, filter the groups (HAVING), then join only the few
    * survivors to orders/customer. The aggregate-then-join ordering is
    * the scale-critical choice: the join input shrinks from the fact
    * table to the filtered group set, which AQE then broadcasts at
    * runtime.
    */
  def largeOrders(spark: SparkSession, dir: String, minQtyC: Long = 25000L): DataFrame = {
    import spark.implicits._
    val qty = Tables
      .lineitem(spark, dir)
      .groupBy($"l_orderkey")
      .agg(sum(cents($"l_quantity")).as("sum_qty_c"))
      .filter($"sum_qty_c" > minQtyC)
    val ord = Tables
      .orders(spark, dir)
      .select($"o_orderkey", $"o_custkey", cents($"o_totalprice").as("totalprice_c"))
    val cust = Tables.customer(spark, dir).select($"c_custkey", $"c_name")
    qty
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      .select($"c_name", $"c_custkey", $"o_orderkey", $"totalprice_c", $"sum_qty_c")
  }

  /** Per-group argmax WITHOUT a window: the top customer by balance in
    * each nation via max_by over an ordering struct — one
    * partial-aggregable pass (each partition keeps one candidate per
    * group before the shuffle), versus a rank window's full per-group
    * sort. The tiebreak (max balance, then MIN custkey) rides in the
    * struct: negating the key makes lexicographic max pick the
    * smallest id.
    */
  def topCustomerPerNation(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables
      .customer(spark, dir)
      .groupBy($"c_nationkey".cast("long").as("nationkey"))
      .agg(
        max_by($"c_custkey", struct(cents($"c_acctbal"), -$"c_custkey")).as("top_custkey"),
        max(cents($"c_acctbal")).as("top_acctbal_c"),
        count(lit(1)).as("n_customers")
      )
  }

  /** Running total per customer over order history — the canonical
    * cumulative window (account balance / lifetime-value shape). One
    * shuffle on the customer key; the frame is rows-unbounded-
    * preceding over the deterministic (date, orderkey) order, so the
    * cumulative sum is exact integer cents at any parallelism.
    */
  def runningRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window
      .partitionBy($"o_custkey")
      .orderBy($"order_us", $"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables
      .orders(spark, dir)
      .select(
        $"o_custkey",
        $"o_orderkey",
        unix_micros($"o_orderdate".cast("timestamp")).as("order_us"),
        cents($"o_totalprice").as("totalprice_c")
      )
      .withColumn("cum_c", sum($"totalprice_c").over(w))
      .withColumn("order_seq", row_number().over(w).cast("long"))
  }

  /** The 100 TB path for distinct counting: HyperLogLog++ sketches.
    * Exact distinct shuffle-expands every (group, value) pair; the
    * sketch is a fixed-size partial aggregate per group, so the shuffle
    * volume is groups x sketch size regardless of cardinality. No SQL
    * oracle (approximate results are engine-specific) — accuracy is
    * spec-bound against the exact counts instead.
    */
  def groupDistinctApprox(spark: SparkSession, dir: String, rsd: Double = 0.02): DataFrame = {
    import spark.implicits._
    Tables
      .events(spark, dir)
      .groupBy($"event_type")
      .agg(
        approx_count_distinct($"user_id", rsd).as("n_users_approx"),
        count(lit(1)).as("n_events")
      )
  }

  /** rel_key_skew_profile — the JOIN-KEY skew report a planner reads
    * BEFORE shuffling 100 TB on that key: per power-of-2 frequency
    * band of the fact's join key (lineitem.l_orderkey — the one
    * fact-fact shuffle key in the TPC-H plans here), the key count,
    * row mass, and row share in bp, plus the single hottest key's
    * share — the number that decides between a plain hash join, AQE
    * skew splitting, and salting (rel_skew_join's remedy). Two
    * partial-aggregable groupBys (key grain → ~log₂(maxfreq) bands);
    * the hottest key is a 1-row max-struct, not a sort.
    */
  def keySkewProfile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val freq = Tables
      .lineitem(spark, dir)
      .groupBy($"l_orderkey")
      .agg(count(lit(1)).as("f"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tot = freq.agg(
      sum($"f").as("total_rows"),
      max(struct($"f", $"l_orderkey")).as("hot")
    )
    val out = freq
      .groupBy(expr("CAST(length(bin(f)) - 1 AS BIGINT)").as("freq_band"))
      .agg(count(lit(1)).as("n_keys"), sum($"f").as("n_rows"))
      .crossJoin(broadcast(tot))
      .select(
        $"freq_band",
        expr("CAST(pow(2, freq_band) AS BIGINT)").as("freq_lo"),
        $"n_keys",
        $"n_rows",
        expr("n_rows * 10000 DIV total_rows").as("row_share_bp"),
        $"hot.l_orderkey".as("hottest_key"),
        $"hot.f".as("hottest_rows"),
        expr("hot.f * 10000 DIV total_rows").as("hottest_share_bp")
      )
    graft.operators.Dedup.releaseAfterRun(spark, out, Seq(freq))
  }

  /** rel_salt_plan — the ACTIONABLE output of skew diagnosis: per hot
    * join key (frequency > 4× the mean rows-per-key), the salt factor
    * that splits it back into mean-sized slices — exactly the table
    * [[graft.operators.SkewJoin.saltedJoin]] would be configured from
    * ([[keySkewProfile]] is the dashboard; this is the plan). Runs on
    * the null-user/"unknown device" fact shape the skew-join drill
    * uses, where ~90% of rows share one key. Hot = the key holds over
    * 20% of ALL rows (f·5 > total, cross-multiplied — a share rule,
    * not a mean-relative one, so it is invariant to how many cold
    * keys exist); factor = ceil(f / target) with target =
    * max(total DIV n_keys, 1), by cross-addition. Scale shape: one
    * partial-aggregable key-frequency groupBy, a 1-row totals
    * broadcast, a row-local filter — at most 4 keys can ever qualify.
    */
  def saltPlan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val freq = Tables
      .events(spark, dir)
      .select(when($"user_id" % 10 =!= 0, lit(0L)).otherwise($"user_id").as("k"))
      .groupBy($"k")
      .agg(count(lit(1)).as("f"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tot = freq.agg(sum($"f").as("total"), count(lit(1)).as("n_keys"))
    val out = freq
      .crossJoin(broadcast(tot))
      .withColumn("target", expr("greatest(total DIV n_keys, 1L)"))
      .filter($"f" * 5L > $"total")
      .select(
        $"k",
        $"f",
        expr("f * 10000 DIV total").as("share_bp"),
        expr("(f + target - 1) DIV target").as("salt_factor")
      )
    graft.operators.Dedup.releaseAfterRun(spark, out, Seq(freq))
  }

  /** Pathological-key join drill (rel_skew_join): ~90% of the fact
    * collapses onto ONE join key (the null-user/"unknown-device" shape
    * that melts a plain hash-partitioned join at 100 TB — every row of
    * the hot key lands on one reducer). The join runs through
    * [[SkewJoin.saltedJoin]]: the shuffle key becomes (key, salt) so
    * the hot key spreads over nSalts tasks, while results stay exactly
    * the plain join's (the DuckDB oracle IS the plain join;
    * SkewJoinSpec additionally pins the AQE skew-split plan shape for
    * the unsalted path).
    */
  def skewJoin(spark: SparkSession, dir: String, nSalts: Int = 16): DataFrame = {
    import spark.implicits._
    val fact = Tables
      .events(spark, dir)
      .select(
        when($"user_id" % 10 =!= 0, lit(0L)).otherwise($"user_id").as("k"),
        $"event_id",
        cents($"value").as("value_c")
      )
    val dim = fact
      .select($"k")
      .distinct()
      .withColumn("user_tag", concat(lit("u"), $"k"))
    SkewJoin
      .saltedJoin(fact, dim, "k", Seq($"event_id"), nSalts)
      .groupBy($"k", $"user_tag")
      .agg(count(lit(1)).as("n_rows"), sum($"value_c").as("sum_value_c"))
  }

  /** TPC-H Q6 shape: the pure SCAN query — conjunctive range filters +
    * one global aggregate, zero joins. Every predicate (shipdate
    * window, discount band, quantity cap) must reach the parquet
    * scan's PushedFilters; at 100 TB this query IS its scan, and the
    * row-group/zone pruning those filters buy is the whole cost model
    * (PlanSpec pins the pushdown). Revenue stays in the exact integer
    * domain: cents × discount-percent points.
    */
  def q6Revenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables
      .lineitem(spark, dir)
      .filter(
        $"l_shipdate" >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
          $"l_shipdate" < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
          $"l_discount" >= 0.05 && $"l_discount" <= 0.07 && $"l_quantity" < 24
      )
      .agg(
        sum(cents($"l_extendedprice") * fixed($"l_discount", 2)).as("revenue_cpct"),
        count(lit(1)).as("n_items")
      )
  }

  /** TPC-H Q4 shape: EXISTS decorrelated to a left-semi join — orders
    * in a quarter with at least one line shipped after the order date,
    * counted per priority. The semi join ships only o_orderkey +
    * the join bit, never multiplies rows, and both date filters push
    * to their scans; the agg runs on the (small) filtered orders side.
    */
  def q4OrderPriority(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ord = Tables
      .orders(spark, dir)
      .filter(
        $"o_orderdate" >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
          $"o_orderdate" < lit(java.sql.Timestamp.valueOf("1996-04-01 00:00:00"))
      )
      .select($"o_orderkey", $"o_orderdate", $"o_orderpriority")
    val late = Tables.lineitem(spark, dir).select($"l_orderkey", $"l_shipdate")
    ord
      .join(late, $"l_orderkey" === $"o_orderkey" && $"l_shipdate" > $"o_orderdate", "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
  }

  /** TPC-H Q17 shape: correlated scalar subquery decorrelated to an
    * AGGREGATE-BELOW-JOIN — revenue from lineitems whose quantity is
    * below 20% of their part's average. The per-part average joins
    * back as a pre-aggregated frame (one row per part, broadcastable);
    * the threshold comparison stays in the exact integer domain by
    * cross-multiplying (5·qty·n < Σqty) instead of dividing.
    */
  def q17SmallQuantity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables
      .lineitem(spark, dir)
      .select($"l_partkey", cents($"l_quantity").as("qty_c"), cents($"l_extendedprice").as("price_c"))
    val avgQty = li
      .groupBy($"l_partkey".as("ap_key"))
      .agg(sum($"qty_c").as("sum_qty_c"), count(lit(1)).as("n_li"))
    val brands = Tables.part(spark, dir).select($"p_partkey", $"p_brand")
    li.join(avgQty, $"l_partkey" === $"ap_key")
      .filter($"qty_c" * $"n_li" * 5 < $"sum_qty_c")
      .join(broadcast(brands), $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand")
      .agg(sum($"price_c").as("sum_price_c"), count(lit(1)).as("n_small"))
  }

  /** TPC-H Q19 shape: DISJUNCTIVE predicate over a fact ⋈ dim join —
    * three (brand, size-band, quantity-band) OR-blocks. The partkey
    * equality stays the join key; the OR lands as a post-join filter
    * whose part-side conjuncts (brand ∈ …, size bands) still prune the
    * broadcast build side, because each disjunct's part predicate is
    * OR-able into one scan filter.
    */
  def q19Disjunctive(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val part = Tables.part(spark, dir).select($"p_partkey", $"p_brand", $"p_size")
    val li = Tables
      .lineitem(spark, dir)
      .select($"l_partkey", $"l_quantity", $"l_extendedprice", $"l_discount")
    li.join(broadcast(part), $"l_partkey" === $"p_partkey")
      .filter(
        ($"p_brand" === "Brand#1" && $"p_size".between(1, 15) && $"l_quantity".between(1, 11)) ||
          ($"p_brand" === "Brand#13" && $"p_size".between(1, 25) && $"l_quantity".between(10, 20)) ||
          ($"p_brand" === "Brand#20" && $"p_size".between(1, 35) && $"l_quantity".between(20, 30))
      )
      .agg(
        sum(cents($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("revenue_c"),
        count(lit(1)).as("n_items")
      )
  }

  /** TPC-H Q22 shape: anti-join + scalar-subquery threshold — LAPSED
    * customers with above-average positive balance and no order since
    * a cutoff, profiled per market segment. The global average is a
    * 2-value aggregate that BROADCASTS into the filter
    * (cross-multiplied: bal·n > Σbal, exact integers); the anti join
    * prunes to customers only, never materializing a NOT IN list, and
    * the cutoff pushes into the orders scan so the build side is the
    * recent slice, not the table.
    */
  def q22IdleCustomers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables
      .customer(spark, dir)
      .select($"c_custkey", $"c_mktsegment", cents($"c_acctbal").as("bal_c"))
    val avgPos = cust
      .filter($"bal_c" > 0)
      .agg(sum($"bal_c").as("sum_pos"), count(lit(1)).as("n_pos"))
    val recent = Tables
      .orders(spark, dir)
      .filter($"o_orderdate" >= lit(java.sql.Timestamp.valueOf("1999-01-01 00:00:00")))
      .select($"o_custkey")
    cust
      .crossJoin(broadcast(avgPos))
      .filter($"bal_c" * $"n_pos" > $"sum_pos")
      .join(recent, $"o_custkey" === $"c_custkey", "left_anti")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_cust"), sum($"bal_c").as("sum_bal_c"))
  }

  /** Exact median order value per market segment via VALUE-HISTOGRAM
    * rank — the relational twin of ts_percentiles' scale story: the
    * sort runs over the (segment, price) histogram (distinct prices
    * per segment), never the raw orders stream, so no single partition
    * ever holds a segment's full order list. Lower median (smallest
    * value whose cumulative count reaches ceil(n/2)) keeps the answer
    * in the exact integer domain.
    */
  def medianOrderValue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, dir).select($"c_custkey", $"c_mktsegment")
    val hist = Tables
      .orders(spark, dir)
      .select($"o_custkey", cents($"o_totalprice").as("price_c"))
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment", $"price_c")
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy($"c_mktsegment").orderBy($"price_c")
    hist
      .withColumn("cum", sum($"cnt").over(w))
      .withColumn("total", sum($"cnt").over(Window.partitionBy($"c_mktsegment")))
      .filter($"cum" >= expr("(total + 1) DIV 2"))
      .groupBy($"c_mktsegment")
      .agg(max($"total").as("n_orders"), min($"price_c").as("p50_price_c"))
  }

  /** TPC-H Q7 shape: bidirectional trade volume between two nations
    * per ship year. Both nation lookups ride BROADCAST dims on the two
    * fact keys (supplier side onto lineitem, customer side onto
    * orders); the one real shuffle is the orderkey fact-fact join, and
    * the symmetric nation-pair disjunction prunes each broadcast
    * build side before the join.
    */
  def q7NationVolume(
      spark: SparkSession,
      dir: String,
      tradeBloc: Seq[String] = Seq("NATION_1", "NATION_2", "NATION_3", "NATION_4")
  ): DataFrame = {
    import spark.implicits._
    val nations = Tables.nation(spark, dir).select($"n_nationkey", $"n_name")
    val supp = Tables
      .supplier(spark, dir)
      .join(nations, $"s_nationkey" === $"n_nationkey")
      .filter($"n_name".isin(tradeBloc: _*))
      .select($"s_suppkey", $"n_name".as("supp_nation"))
    val cust = Tables
      .customer(spark, dir)
      .join(nations, $"c_nationkey" === $"n_nationkey")
      .filter($"n_name".isin(tradeBloc: _*))
      .select($"c_custkey", $"n_name".as("cust_nation"))
    val ord = Tables
      .orders(spark, dir)
      .select($"o_orderkey", $"o_custkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
    Tables
      .lineitem(spark, dir)
      .select($"l_orderkey", $"l_suppkey", $"l_shipdate", $"l_extendedprice", $"l_discount")
      .join(broadcast(supp), $"l_suppkey" === $"s_suppkey")
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .filter($"supp_nation" =!= $"cust_nation")
      .groupBy($"supp_nation", $"cust_nation", year($"l_shipdate").cast("long").as("l_year"))
      .agg(
        sum(cents($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("revenue_c"),
        count(lit(1)).as("n_items")
      )
  }

  /** TPC-H Q8 shape: market share — one brand's slice of a region's
    * yearly revenue. The share is a conditional-sum ratio inside ONE
    * aggregation pass (brand flag folded into the partial aggregate),
    * never two scans; region membership broadcasts through
    * nation ⋈ customer onto orders.
    */
  def q8MarketShare(
      spark: SparkSession,
      dir: String,
      regionName: String = "ASIA",
      brand: String = "Brand#1"
  ): DataFrame = {
    import spark.implicits._
    val regionCust = Tables
      .customer(spark, dir)
      .join(
        Tables.nation(spark, dir).join(
          Tables.region(spark, dir).filter($"r_name" === regionName),
          $"n_regionkey" === $"r_regionkey"
        ),
        $"c_nationkey" === $"n_nationkey"
      )
      .select($"c_custkey")
    val ord = Tables
      .orders(spark, dir)
      .join(broadcast(regionCust), $"o_custkey" === $"c_custkey", "left_semi")
      .select($"o_orderkey", year($"o_orderdate").cast("long").as("o_year"))
    val parts = Tables.part(spark, dir).select($"p_partkey", ($"p_brand" === brand).as("is_brand"))
    Tables
      .lineitem(spark, dir)
      .select($"l_orderkey", $"l_partkey", $"l_extendedprice", $"l_discount")
      .join(broadcast(parts), $"l_partkey" === $"p_partkey")
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_year")
      .agg(
        sum(when($"is_brand", cents($"l_extendedprice" * (lit(1.0) - $"l_discount"))).otherwise(0L))
          .as("brand_c"),
        sum(cents($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("total_c")
      )
      .select(
        $"o_year",
        $"brand_c",
        $"total_c",
        expr("brand_c * 1000000 DIV total_c").as("share_micro")
      )
  }

  /** TPC-H Q15 shape: argmax over an aggregate — the top supplier(s)
    * by shipped revenue in a quarter. One fact-side partial agg; the
    * global max is a 1-row tree-reduced aggregate that BROADCASTS back
    * as the filter (an empty-partition window would drag the whole
    * supplier aggregate onto one partition instead). Never a second
    * fact scan like the view-based original; ties all surface,
    * matching Q15's spec.
    */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rev = Tables
      .lineitem(spark, dir)
      .filter(
        $"l_shipdate" >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
          $"l_shipdate" < lit(java.sql.Timestamp.valueOf("1996-04-01 00:00:00"))
      )
      .groupBy($"l_suppkey")
      .agg(sum(cents($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("total_rev_c"))
    val mx = rev.agg(max($"total_rev_c").as("max_rev_c"))
    rev
      .crossJoin(broadcast(mx))
      .filter($"total_rev_c" === $"max_rev_c")
      .join(broadcast(Tables.supplier(spark, dir).select($"s_suppkey", $"s_name")), $"s_suppkey" === $"l_suppkey")
      .select($"s_suppkey", $"s_name", $"total_rev_c")
  }

  /** NTILE quartile report: customers split into 4 balance quartiles
    * per market segment (deterministic (balance, custkey) order), with
    * per-quartile count and balance envelope — the "who's in my top
    * quartile" segmentation query. One window pass on the segment
    * shuffle; ntile is rank-based, so the quartile split stays exact
    * integer logic at any scale.
    */
  def ntileQuartiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window
      .partitionBy($"c_mktsegment")
      .orderBy($"bal_c".asc, $"c_custkey".asc)
    Tables
      .customer(spark, dir)
      .select($"c_custkey", $"c_mktsegment", cents($"c_acctbal").as("bal_c"))
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .groupBy($"c_mktsegment", $"quartile")
      .agg(
        count(lit(1)).as("n_cust"),
        min($"bal_c").as("min_bal_c"),
        max($"bal_c").as("max_bal_c"),
        sum($"bal_c").as("sum_bal_c")
      )
  }

  /** TPC-H Q12 shape: conditional two-way classification over the
    * lineitem ⋈ orders fact-fact join (the testdata ships no
    * l_shipmode, so the return flag plays the mode and the order
    * priority the urgency class — the plan shape is Q12's exactly).
    * One orderkey shuffle join, the date filter pushed to the lineitem
    * scan, both counts from one conditional aggregation pass.
    */
  def q12PriorityClass(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables
      .lineitem(spark, dir)
      .filter(
        $"l_shipdate" >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
          $"l_shipdate" < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00"))
      )
      .select($"l_orderkey", $"l_returnflag")
    li.join(Tables.orders(spark, dir).select($"o_orderkey", $"o_orderpriority"), $"o_orderkey" === $"l_orderkey")
      .groupBy($"l_returnflag")
      .agg(
        sum(when($"o_orderpriority".isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L)).as("high_line_count"),
        sum(when($"o_orderpriority".isin("1-URGENT", "2-HIGH"), 0L).otherwise(1L)).as("low_line_count")
      )
  }

  /** TPC-H Q13 shape: customer order-count DISTRIBUTION. The LEFT
    * OUTER join is the load-bearing piece — customers with zero
    * qualifying orders must survive into the c_count = 0 bucket (an
    * inner join silently drops exactly the bucket the business
    * question asks about). Two aggregations: per-customer counts on
    * the custkey shuffle, then the tiny count-of-counts. The comment
    * anti-pattern filter becomes a priority filter (no o_comment in
    * the testdata); it lives in the JOIN CONDITION, not a WHERE — a
    * post-join filter would also drop the zero-order customers.
    */
  def q13OrderCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ord = Tables
      .orders(spark, dir)
      .filter($"o_orderpriority" =!= "5-LOW")
      .select($"o_custkey", $"o_orderkey")
    Tables
      .customer(spark, dir)
      .select($"c_custkey")
      .join(ord, $"o_custkey" === $"c_custkey", "left")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count"))
      .groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
  }

  /** TPC-H Q21 shape: suppliers who BLOCKED multi-supplier finished
    * orders — their line shipped strictly last (no commit/receipt
    * dates in the testdata, so "kept waiting" = latest l_shipdate).
    * The decorrelation is Q21's signature double self-join:
    * EXISTS(other supplier in the order) → left-semi,
    * NOT EXISTS(other supplier shipping LATER) → left-anti, both on
    * the orderkey shuffle key; the order-status filter rides a semi
    * join and the supplier/nation dims broadcast.
    */
  def q21WaitingSupplier(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir).select($"l_orderkey", $"l_suppkey", $"l_shipdate")
    val finished = Tables
      .orders(spark, dir)
      .filter($"o_orderstatus" === "F")
      .select($"o_orderkey")
    val other = li.select($"l_orderkey".as("o2_key"), $"l_suppkey".as("o2_supp"), $"l_shipdate".as("o2_ship"))
    val sup = Tables
      .supplier(spark, dir)
      .select($"s_suppkey", $"s_name", $"s_nationkey")
      .join(broadcast(Tables.nation(spark, dir).select($"n_nationkey", $"n_name")), $"n_nationkey" === $"s_nationkey")
    // the three probe sides are FACT-scaled (orders subset, lineitem
    // itself) — pin them to the shuffle merge join so the plan is the
    // same one that runs at 100 TB; at tiny SFs Spark would broadcast
    // them and the profile would flip the moment the data grew past
    // the 10 MB threshold (ScaleSpec's sf1.0 climb caught exactly that)
    li.join(finished.hint("merge"), $"o_orderkey" === $"l_orderkey", "left_semi")
      .join(other.hint("merge"), $"o2_key" === $"l_orderkey" && $"o2_supp" =!= $"l_suppkey", "left_semi")
      .join(
        other.hint("merge"),
        $"o2_key" === $"l_orderkey" && $"o2_supp" =!= $"l_suppkey" && $"o2_ship" > $"l_shipdate",
        "left_anti"
      )
      .join(broadcast(sup), $"s_suppkey" === $"l_suppkey")
      .groupBy($"n_name", $"s_name")
      .agg(count(lit(1)).as("numwait"))
  }

  /** rel_top_movers — biggest week-over-week revenue swings per
    * supplier: the ops-report shape ("which accounts moved most this
    * week"). Weekly rollup (one partial-aggregable shuffle on the
    * supplier key), lag over each supplier's OBSERVED weeks (the
    * window input is the weekly aggregate, never raw lineitem), then
    * a global top-10 by absolute swing — planned as TakeOrdered, so
    * no global sort materializes. Week ids are epoch-week integers,
    * identical in both engines under the UTC session.
    */
  def topMovers(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"l_suppkey").orderBy($"week_id")
    Tables
      .lineitem(spark, dir)
      .select(
        $"l_suppkey",
        // DIV = true floor division, matching the oracle's `//` for
        // negative (pre-1970) timestamps too; long `/` truncates toward 0
        expr("unix_timestamp(l_shipdate) DIV 604800").as("week_id"),
        cents($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("rev_c")
      )
      .groupBy($"l_suppkey", $"week_id")
      .agg(sum($"rev_c").as("rev_c"))
      .withColumn("prev_rev_c", lag($"rev_c", 1).over(w))
      .filter($"prev_rev_c".isNotNull)
      .withColumn("delta_c", $"rev_c" - $"prev_rev_c")
      .orderBy(abs($"delta_c").desc, $"l_suppkey".asc, $"week_id".asc)
      .limit(k)
  }

  /** rel_pivot — monthly revenue PIVOTED by return flag: the
    * wide-report shape (one row per month, one column per category).
    * Spelled as DECLARED-category conditional aggregation — one
    * sum(when(flag = c)) per category in a single groupBy — rather
    * than `Dataset.pivot`, which (even with declared values) plans a
    * two-phase pivotfirst aggregation with a second shuffle. This
    * shape is ONE scan + ONE 2-digit-cardinality shuffle, fully
    * map-side partial-aggregable (PlanSpec pins all three). Missing
    * (month, flag) cells are pinned to 0 so the report is dense.
    */
  def pivotReturnflag(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def cell(flag: String) =
      coalesce(sum(when($"l_returnflag" === flag, $"rev_c")), lit(0L))
    Tables
      .lineitem(spark, dir)
      .select(
        (year($"l_shipdate") * 100 + month($"l_shipdate")).cast("long").as("ship_month"),
        $"l_returnflag",
        cents($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("rev_c")
      )
      .groupBy($"ship_month")
      .agg(cell("A").as("rev_a_c"), cell("N").as("rev_n_c"), cell("R").as("rev_r_c"))
  }

  /** rel_grouping_sets — GROUPING SETS distinct from rollup/cube: the
    * two one-dimension marginals plus the grand total, WITHOUT the
    * (flag, status) cross cells cube would add or the asymmetric
    * nesting rollup imposes. Uses the Dataset groupingSets API
    * (Spark 4), which plans a single Expand + one aggregation —
    * each input row fans to its 3 grouping-set copies map-side, so
    * the cost is one scan and one shuffle regardless of how many
    * sets are requested. The set id is derived from the NULL pattern
    * (both engines agree) rather than grouping_id(), keeping the
    * oracle engine-neutral.
    */
  def groupingSetsReport(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables
      .lineitem(spark, dir)
      .select($"l_returnflag", $"l_linestatus", cents($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("rev_c"))
      .groupingSets(
        Seq(Seq($"l_returnflag"), Seq($"l_linestatus"), Seq.empty),
        $"l_returnflag",
        $"l_linestatus"
      )
      .agg(sum($"rev_c").as("revenue_c"), count(lit(1)).as("n"))
      .select(
        coalesce($"l_returnflag", lit("ALL")).as("returnflag"),
        coalesce($"l_linestatus", lit("ALL")).as("linestatus"),
        (when($"l_returnflag".isNull, 2L).otherwise(0L) +
          when($"l_linestatus".isNull, 1L).otherwise(0L)).as("set_id"),
        $"revenue_c",
        $"n"
      )
  }

  /** rel_basket_pairs — market-basket co-occurrence: the top part
    * PAIRS ordered together, with support and PMI-style lift. The
    * pair blowup is bounded by basket size, never order count: the
    * self-join runs on the orderkey (both sides co-partitioned by the
    * SAME key — one shuffle family), each order contributes
    * C(items, 2) ≤ ~20 pairs, and `a < b` halves + dedups
    * orientation. Lift goes through DECIMAL(38,0) — n_ab·n_orders·10⁶
    * overflows BIGINT at warehouse scale — and the global order count
    * rides a 1-row broadcast. Top-20 by support with a full
    * deterministic tiebreak, planned as TakeOrdered.
    */
  /** rel_rfm_segments — RFM customer segmentation (the classic CRM
    * analysis): per market segment, customers quartiled independently
    * on Recency (days since last order vs the corpus max date — a
    * 1-row broadcast), Frequency (order count) and Monetary (cents
    * total), with fully deterministic NTILE tiebreaks, then the
    * 4×4×4 segment-cell census. All three windows share the one
    * mktsegment shuffle; everything downstream is a bounded-key
    * groupBy. Customers with no orders are out of scope (RFM is
    * undefined without a purchase).
    */
  def rfmSegments(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val mx = Tables.orders(spark, dir).agg(max($"o_orderdate").as("max_date"))
    val per = Tables
      .orders(spark, dir)
      .groupBy($"o_custkey")
      .agg(
        max($"o_orderdate").as("last_date"),
        count(lit(1)).as("f"),
        sum(cents($"o_totalprice")).as("m_c")
      )
      .join(
        Tables.customer(spark, dir).select($"c_custkey", $"c_mktsegment"),
        $"c_custkey" === $"o_custkey"
      )
      .crossJoin(broadcast(mx))
      .withColumn("r_days", datediff($"max_date", $"last_date").cast("long"))
    val wr = Window.partitionBy($"c_mktsegment").orderBy($"r_days".asc, $"c_custkey".asc)
    val wf = Window.partitionBy($"c_mktsegment").orderBy($"f".desc, $"c_custkey".asc)
    val wm = Window.partitionBy($"c_mktsegment").orderBy($"m_c".desc, $"c_custkey".asc)
    per
      .withColumn("r_q", ntile(4).over(wr).cast("long"))
      .withColumn("f_q", ntile(4).over(wf).cast("long"))
      .withColumn("m_q", ntile(4).over(wm).cast("long"))
      .groupBy($"c_mktsegment", $"r_q", $"f_q", $"m_q")
      .agg(count(lit(1)).as("n_customers"), sum($"m_c").as("sum_m_c"))
  }

  /** rel_order_recon — the RECONCILIATION audit between a header table
    * and its detail rollup (orders.o_totalprice vs the per-order
    * lineitem price sum): FULL OUTER join on the key, every row
    * classified match / mismatch / missing-detail / missing-header,
    * aggregated per order status with the absolute drift where both
    * sides exist. The classic two-system consistency check (billing vs
    * ledger); one co-partitioned outer join + a bounded-key groupBy —
    * the detail side is pre-aggregated to one row per key BEFORE the
    * join, so the outer join never sees raw detail rows.
    */
  def orderRecon(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables
      .orders(spark, dir)
      .select($"o_orderkey", $"o_orderstatus", cents($"o_totalprice").as("total_c"))
    val l = Tables
      .lineitem(spark, dir)
      .select($"l_orderkey", cents($"l_extendedprice").as("p_c"))
      .groupBy($"l_orderkey")
      .agg(sum($"p_c").as("detail_c"))
    o.join(l, $"o_orderkey" === $"l_orderkey", "full_outer")
      .select(
        coalesce($"o_orderstatus", lit("NONE")).as("status"),
        when($"o_orderkey".isNull, "missing_header")
          .when($"l_orderkey".isNull, "missing_detail")
          .when($"total_c" === $"detail_c", "match")
          .otherwise("mismatch")
          .as("recon_class"),
        coalesce(abs($"total_c" - $"detail_c"), lit(0L)).as("drift_c")
      )
      .groupBy($"status", $"recon_class")
      .agg(count(lit(1)).as("n"), sum($"drift_c").as("sum_drift_c"), max($"drift_c").as("max_drift_c"))
  }

  /** graph_part_rank — PageRank over the part CO-PURCHASE graph
    * (undirected edges between parts sharing an order), in EXACT
    * integer micro-units: three power-iteration rounds of
    * rank' = 0.15 + 0.85·Σ(rank_src DIV outdeg_src), every division a
    * floor — bit-identical across engines, no float drift. This is
    * the iterative-graph family beyond connected components: each
    * round is one edge-join + one partial-aggregable sum on the dst
    * key (the standard distributed power iteration), with a per-round
    * localCheckpoint lineage cut like the CC loop. Isolated parts
    * (never co-ordered) have no edges and are out of scope by
    * definition. Top-20 by final rank, full deterministic tiebreak.
    */
  def partRank(spark: SparkSession, dir: String, iters: Int = 3, k: Int = 20): DataFrame = {
    import spark.implicits._
    // the co-purchase edge list is a PERSISTED tier (GraphTier) — the
    // order-key self-join ran once at build; this query reads a table
    val edges = graft.sources.GraphTier.coPurchaseEdges(spark, dir)
    val outdeg = edges.groupBy($"src").agg(count(lit(1)).as("outdeg")).localCheckpoint()
    var ranks = outdeg.select($"src".as("node"), lit(1000000L).as("rank_micro"))
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(outdeg, Seq("src"))
        .join(ranks.select($"node".as("src"), $"rank_micro"), Seq("src"))
        .select($"dst", expr("rank_micro DIV outdeg").as("c"))
        .groupBy($"dst")
        .agg(sum($"c").as("in_sum"))
      ranks = outdeg
        .select($"src".as("node"))
        .join(contrib.select($"dst".as("node"), $"in_sum"), Seq("node"), "left")
        .select($"node", (lit(150000L) + expr("85 * coalesce(in_sum, 0L) DIV 100")).as("rank_micro"))
        .localCheckpoint()
    }
    val w = Window.orderBy($"rank_micro".desc, $"node".asc)
    ranks
      .orderBy($"rank_micro".desc, $"node".asc)
      .limit(k)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .select($"rnk", $"node", $"rank_micro")
  }

  def basketPairs(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    import spark.implicits._
    val li = Tables
      .lineitem(spark, dir)
      .select($"l_orderkey", $"l_partkey")
      .distinct()
    val tot  = li.select(countDistinct($"l_orderkey").as("n_orders"))
    val pa   = li.groupBy($"l_partkey").agg(count(lit(1)).as("n_p"))
    val b    = li.select($"l_orderkey".as("b_orderkey"), $"l_partkey".as("part_b"))
    val w    = Window.orderBy($"n_ab".desc, $"part_a".asc, $"part_b".asc)
    li.join(b, $"b_orderkey" === $"l_orderkey" && $"l_partkey" < $"part_b")
      .groupBy($"l_partkey".as("part_a"), $"part_b")
      .agg(count(lit(1)).as("n_ab"))
      .join(pa.select($"l_partkey".as("part_a"), $"n_p".as("n_a")), Seq("part_a"))
      .join(pa.select($"l_partkey".as("part_b"), $"n_p".as("n_b")), Seq("part_b"))
      .crossJoin(broadcast(tot))
      .withColumn(
        "lift_micro",
        expr(
          "CAST(n_ab AS DECIMAL(19,0)) * CAST(n_orders AS DECIMAL(19,0)) * 1000000" +
            " DIV (CAST(n_a AS DECIMAL(19,0)) * CAST(n_b AS DECIMAL(19,0)))"
        )
      )
      .orderBy($"n_ab".desc, $"part_a".asc, $"part_b".asc)
      .limit(k)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .select($"rnk", $"part_a", $"part_b", $"n_ab", $"n_a", $"n_b", $"lift_micro")
  }

  // =====================================================================
  // partsupp family — the five classic TPC-H shapes (Q2/Q9/Q11/Q16/Q20)
  // that need the part-supplier bridge table. The shipped testdata has
  // no partsupp, so it is SYNTHESIZED deterministically from the tables
  // that do exist: 4 supplier slots per part, every column a pure
  // integer function of (p_partkey, slot, |supplier|). Both engines
  // derive the identical relation from the identical inputs, so the
  // oracle discipline is unchanged — and the generation is ROW-LOCAL
  // (a broadcast 4-row slot spine and a broadcast 1-row supplier count;
  // zero shuffles), so "materializing" partsupp at 100 TB costs one
  // map pass over part.
  // =====================================================================

  /** Synthetic partsupp: (ps_partkey, ps_i slot 0-3, ps_suppkey,
    * ps_availqty, ps_supplycost_c). Suppkeys are 0-based like the
    * shipped tables; the slot stride |supplier|/4 keeps a part's 4
    * suppliers distinct, the *13 scatter decorrelates neighbouring
    * parts (the join-balance property the TPC-H generator's formula
    * exists for).
    */
  def partsupp(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ns = Tables.supplier(spark, dir).agg(count(lit(1)).as("n_supp"))
    Tables
      .part(spark, dir)
      // 4-slot expansion is row-local (explode of a constant array) —
      // no join, no broadcast, strictly cheaper than a 4-row spine at
      // any scale
      .select($"p_partkey", explode(sequence(lit(0L), lit(3L))).as("ps_i"))
      .crossJoin(broadcast(ns))
      .select(
        $"p_partkey".as("ps_partkey"),
        $"ps_i",
        expr("(p_partkey * 13 + p_partkey DIV n_supp + ps_i * (n_supp DIV 4)) % n_supp")
          .as("ps_suppkey"),
        expr("(p_partkey * 7 + ps_i * 11) % 9999 + 1").as("ps_availqty"),
        expr("(p_partkey * 97 + ps_i * 31) % 100000 + 100").as("ps_supplycost_c")
      )
  }

  /** Q2 shape — correlated min-cost supplier: for every qualifying
    * part, the European supplier(s) quoting the per-part MINIMUM
    * supply cost. The correlation is a per-part min + an equality
    * join back (ties keep all witnesses, TPC-H semantics); the
    * region-restricted supplier dimension broadcasts, and the min
    * table reuses the partsupp shuffle partitioning on ps_partkey.
    */
  def q2MinCostSupplier(spark: SparkSession, dir: String, k: Int = 100): DataFrame = {
    import spark.implicits._
    val supp = Tables
      .supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), $"s_nationkey" === $"n_nationkey")
      .join(
        broadcast(Tables.region(spark, dir).filter($"r_name" === "EUROPE")),
        $"n_regionkey" === $"r_regionkey"
      )
      .select($"s_suppkey", $"s_name", cents($"s_acctbal").as("acctbal_c"), $"n_name")
    val eu = partsupp(spark, dir).join(broadcast(supp), $"ps_suppkey" === $"s_suppkey")
    val minCost = eu.groupBy($"ps_partkey").agg(min($"ps_supplycost_c").as("cost_c"))
    eu.join(minCost, Seq("ps_partkey"))
      .filter($"ps_supplycost_c" === $"cost_c")
      .join(
        Tables.part(spark, dir).filter($"p_size" <= 15 && $"p_type" === "LARGE").select($"p_partkey"),
        $"ps_partkey" === $"p_partkey"
      )
      .select($"acctbal_c", $"s_name", $"n_name", $"p_partkey", $"cost_c", $"ps_suppkey")
      .orderBy($"acctbal_c".desc, $"n_name".asc, $"s_name".asc, $"p_partkey".asc, $"ps_suppkey".asc)
      .limit(k)
  }

  /** Q9 shape — product-line profit by nation and year:
    * profit = revenue − supply cost · quantity, all integer cents.
    * Lineitem matches its partsupp row on the COMPOSITE key
    * (ps_partkey, slot = l_suppkey % 4) so every line finds exactly
    * one cost quote (the synthetic bridge's analogue of TPC-H's
    * (partkey, suppkey) FK); supplier→nation broadcasts; the final
    * groupBy is a (25 nations × years) key — partial-aggregable.
    */
  def q9ProductProfit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables
      .lineitem(spark, dir)
      .select(
        $"l_orderkey",
        $"l_partkey",
        $"l_suppkey",
        expr("CAST(round(l_quantity) AS BIGINT)").as("qty"),
        cents($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("rev_c")
      )
    val red = broadcast(
      Tables.part(spark, dir).filter($"p_name".like("%red%")).select($"p_partkey")
    )
    val nat = broadcast(
      Tables
        .supplier(spark, dir)
        .join(Tables.nation(spark, dir), $"s_nationkey" === $"n_nationkey")
        .select($"s_suppkey", $"n_name")
    )
    val years = Tables.orders(spark, dir).select($"o_orderkey", year($"o_orderdate").cast("long").as("o_year"))
    li.join(red, $"l_partkey" === $"p_partkey")
      .join(
        partsupp(spark, dir),
        $"ps_partkey" === $"l_partkey" && $"ps_i" === $"l_suppkey" % 4
      )
      .join(nat, $"s_suppkey" === $"l_suppkey")
      .join(years, $"o_orderkey" === $"l_orderkey")
      .select($"n_name", $"o_year", ($"rev_c" - $"ps_supplycost_c" * $"qty").as("profit_c"))
      .groupBy($"n_name", $"o_year")
      .agg(sum($"profit_c").as("sum_profit_c"))
  }

  /** Q11 shape — important stock: per part, the inventory value held
    * by one nation's suppliers, kept where it exceeds a fixed share
    * of that nation's total (integer cross-multiply, no float
    * fraction). The total is a 1-row broadcast; the per-part agg is
    * one partial-aggregable shuffle on ps_partkey.
    */
  def q11ImportantStock(spark: SparkSession, dir: String, k: Int = 100): DataFrame = {
    import spark.implicits._
    val suppN = broadcast(
      Tables
        .supplier(spark, dir)
        .join(Tables.nation(spark, dir).filter($"n_name" === "NATION_3"), $"s_nationkey" === $"n_nationkey")
        .select($"s_suppkey")
    )
    val held = partsupp(spark, dir)
      .join(suppN, $"ps_suppkey" === $"s_suppkey")
      .select($"ps_partkey", ($"ps_supplycost_c" * $"ps_availqty").as("value_c"))
    val byPart = held.groupBy($"ps_partkey").agg(sum($"value_c").as("value_c"))
    val total = held.agg(sum($"value_c").as("total_c"))
    byPart
      .crossJoin(broadcast(total))
      .filter($"value_c" * 500 > $"total_c")
      .select($"ps_partkey", $"value_c")
      .orderBy($"value_c".desc, $"ps_partkey".asc)
      .limit(k)
  }

  /** Q16 shape — supplier diversity per part profile: how many
    * DISTINCT suppliers stock each (brand, type, size) combination,
    * excluding one brand and a "complaint" supplier denylist (name
    * ends in '3'). count_distinct over the bounded profile key space;
    * the denylist is an anti-joined broadcast.
    */
  def q16SupplierCnt(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bad = broadcast(
      Tables.supplier(spark, dir).filter($"s_name".like("%3")).select($"s_suppkey")
    )
    partsupp(spark, dir)
      .join(
        Tables
          .part(spark, dir)
          .filter($"p_brand" =!= "Brand#5" && $"p_size".isin(1, 9, 19, 29, 39, 49))
          .select($"p_partkey", $"p_brand", $"p_type", $"p_size"),
        $"ps_partkey" === $"p_partkey"
      )
      .join(bad, $"ps_suppkey" === $"s_suppkey", "left_anti")
      .groupBy($"p_brand", $"p_type", $"p_size".cast("long").as("p_size"))
      .agg(countDistinct($"ps_suppkey").as("supplier_cnt"))
  }

  /** Q20 shape — potential promotion stock: suppliers in one nation
    * whose available quantity of 'small %' parts exceeds HALF of what
    * they actually shipped in 1996 (avail·2 > shipped, integer).
    * Shipped volume aggregates per (part, slot) — the same composite
    * FK as Q9 — then the availability check is a per-row filter; the
    * supplier dimension broadcasts for the name resolve.
    */
  def q20PotentialPromo(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val smallParts = broadcast(
      Tables.part(spark, dir).filter($"p_name".like("small%")).select($"p_partkey")
    )
    val shipped = Tables
      .lineitem(spark, dir)
      .filter(year($"l_shipdate") === 1996)
      .join(smallParts, $"l_partkey" === $"p_partkey")
      .groupBy($"l_partkey", ($"l_suppkey" % 4).as("slot"))
      .agg(sum(expr("CAST(round(l_quantity) AS BIGINT)")).as("shipped_qty"))
    val suppN = broadcast(
      Tables
        .supplier(spark, dir)
        .join(Tables.nation(spark, dir).filter($"n_name" === "NATION_3"), $"s_nationkey" === $"n_nationkey")
        .select($"s_suppkey", $"s_name")
    )
    partsupp(spark, dir)
      .join(shipped, $"ps_partkey" === $"l_partkey" && $"ps_i" === $"slot")
      .filter($"ps_availqty" * 2 > $"shipped_qty")
      .join(suppN, $"ps_suppkey" === $"s_suppkey")
      .groupBy($"s_name")
      .agg(count(lit(1)).as("n_parts"), sum($"ps_availqty").as("avail_qty"))
  }

  // -------------------------------------------------------------------
  // rel_scd2 — SLOWLY-CHANGING-DIMENSION TYPE 2 build, the canonical
  // warehouse dimension-maintenance operator: fold a per-entity change
  // stream (events ordered by time) into versioned validity intervals —
  // consecutive duplicate states collapse, each surviving state gets
  // [valid_from, valid_to) with valid_to = the next version's
  // valid_from (-1 on the current row) and an is_current flag. One
  // shuffle on the entity key serves everything: the change-detect lag,
  // the running segment sum, the per-segment aggregate, and the
  // valid_to lead all share the user_id partitioning (two sorts, one
  // exchange). At 100 TB this is the standard "rebuild the dimension
  // from the CDC log" pass — embarrassingly parallel per entity.
  // -------------------------------------------------------------------
  def scd2(spark: SparkSession, dir: String): DataFrame = {
    val w  = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val ws = Window.partitionBy(col("user_id")).orderBy(col("seg"))
    TimeSeries
      .eventsUs(spark, dir)
      .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type").as("state"))
      .withColumn("prev", lag(col("state"), 1).over(w))
      .withColumn("chg", when(col("prev").isNull || col("prev") =!= col("state"), 1L).otherwise(0L))
      .withColumn("seg", sum(col("chg")).over(w))
      .groupBy(col("user_id"), col("seg"))
      .agg(
        min(col("state")).as("state"), // constant within a segment
        min(col("ts_us")).as("valid_from_us"),
        count(lit(1)).as("n_events")
      )
      .withColumn("valid_to_us", coalesce(lead(col("valid_from_us"), 1).over(ws), lit(-1L)))
      .withColumn("is_current", when(col("valid_to_us") === -1L, 1L).otherwise(0L))
      .select(col("user_id"), col("seg"), col("state"), col("valid_from_us"), col("valid_to_us"), col("n_events"), col("is_current"))
  }

  // -------------------------------------------------------------------
  // rel_pit_join — POINT-IN-TIME dimension join, the feature-store
  // correctness primitive: every purchase fact is attributed to the
  // account state (signup/error marker stream) valid AT ITS TIMESTAMP,
  // never a later one — the leakage-free join a training pipeline must
  // use when attaching slowly-changing features to events. A literal
  // `fact.ts BETWEEN valid_from AND valid_to` interval join plans as a
  // nested loop; instead the dimension rows and facts UNION into one
  // per-entity stream and a running last-non-null carry resolves the
  // valid state — the same single-shuffle union+carry plan as
  // ts_asof_join, aggregated per state. Facts before any dimension row
  // surface as 'unknown' (they must NOT inherit a future state).
  // -------------------------------------------------------------------
  def pitJoin(spark: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("kind"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ev = TimeSeries.eventsUs(spark, dir)
    val dim = ev
      .filter(col("event_type").isin("signup", "error"))
      .select(
        col("user_id"),
        col("ts_us"),
        col("event_id"),
        lit(0).as("kind"),
        col("event_type").as("state"),
        lit(null).cast("long").as("value_c")
      )
    val facts = ev
      .filter(col("event_type") === "purchase")
      .select(
        col("user_id"),
        col("ts_us"),
        col("event_id"),
        lit(1).as("kind"),
        lit(null).cast("string").as("state"),
        cents(col("value")).as("value_c")
      )
    dim
      .unionByName(facts)
      .withColumn("cur", last(col("state"), ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      .groupBy(coalesce(col("cur"), lit("unknown")).as("state"))
      .agg(
        count(lit(1)).as("n_purchases"),
        sum(col("value_c")).as("revenue_c")
      )
  }

  // -------------------------------------------------------------------
  // rel_profile — per-column data-quality profile of `orders`: row
  // count, null count, EXACT distinct count, lexical min/max. The
  // table is UNPIVOTed to (col_name, value-as-string) rows — numerics
  // canonicalized first (price → cents, date → epoch µs) so the string
  // form is engine-stable — then profiled with a TWO-LEVEL aggregate:
  // groupBy(col, value) before groupBy(col), so the distinct count is
  // exact yet fully partial-aggregable (no Expand ×K plan, no
  // count(distinct) shuffle of raw rows). 6× row multiplication is the
  // honest price of one-pass profiling; both shuffles carry only
  // (col, value) pairs.
  // -------------------------------------------------------------------
  def profile(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(
      col("o_orderkey").cast("string").as("o_orderkey"),
      col("o_custkey").cast("string").as("o_custkey"),
      col("o_orderstatus").as("o_orderstatus"),
      cents(col("o_totalprice")).cast("string").as("o_totalprice_c"),
      unix_micros(col("o_orderdate").cast("timestamp")).cast("string").as("o_orderdate_us"),
      col("o_orderpriority").as("o_orderpriority")
    )
    o.unpivot(
      Array.empty[org.apache.spark.sql.Column],
      o.columns.map(col),
      "col_name",
      "v"
    )
      .groupBy(col("col_name"), col("v"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("col_name"))
      .agg(
        sum(col("n")).as("n_rows"),
        sum(when(col("v").isNull, col("n")).otherwise(0L)).as("n_null"),
        count(col("v")).as("n_distinct"),
        min(col("v")).as("min_v"),
        max(col("v")).as("max_v")
      )
  }

  // -------------------------------------------------------------------
  // approx_hll_users — a PORTABLE deterministic HyperLogLog: 64
  // max-registers from md5-derived bits, so (unlike Spark's native
  // HLL++, already exposed as group_distinct's spec-checked scale
  // path) the sketch is bit-identical cross-engine and ORACLE-checked.
  // The register table IS the sketch and max() makes it mergeable —
  // partial aggregation combines shards' registers exactly like a
  // production rollup would merge daily sketches. Integer-only math:
  // rho from length(bin(w)) (no float log), the harmonic indicator
  // scaled by 2²⁷ so Z stays an exact integer, and the raw-HLL
  // estimate alpha·m²/Z as one integral division. Emits estimate vs
  // exact side by side with the error in bp — the accuracy ledger a
  // sketch deployment is judged by. The small-range LINEAR-COUNTING
  // branch (E ≤ 2.5m with empty registers: m·ln(m/V)) needs no
  // runtime floats either — V ∈ 1..64, so the whole correction is a
  // 64-entry precomputed integer lookup, identical in both engines.
  // -------------------------------------------------------------------
  /** round(64·ln(64/V)) for V = 1..64 — the linear-counting estimates. */
  private val LcTable: Seq[Long] = Seq(266L, 222L, 196L, 177L, 163L, 151L, 142L, 133L, 126L, 119L,
    113L, 107L, 102L, 97L, 93L, 89L, 85L, 81L, 78L, 74L, 71L, 68L, 65L, 63L, 60L, 58L, 55L, 53L,
    51L, 48L, 46L, 44L, 42L, 40L, 39L, 37L, 35L, 33L, 32L, 30L, 28L, 27L, 25L, 24L, 23L, 21L, 20L,
    18L, 17L, 16L, 15L, 13L, 12L, 11L, 10L, 9L, 7L, 6L, 5L, 4L, 3L, 2L, 1L, 0L)

  /** (event_type, bucket, rho) rows from an events projection — the
    * pre-register sketch stream; groupBy(event_type, bucket).max(rho)
    * over it IS the sketch, batch or streaming alike.
    */
  private[graft] def hllRhoRows(events: DataFrame): DataFrame = {
    // 8 hex chars → 32-bit integer, the instr ladder both engines share
    val hexval = (1 to 8)
      .map(i => s"(instr('0123456789abcdef', substring(h, $i, 1)) - 1) * ${1L << (4 * (8 - i))}L")
      .mkString(" + ")
    events
      .select(col("event_type"), col("user_id"))
      .withColumn("h", md5(concat(lit("hll:"), col("user_id").cast("string"))))
      .withColumn("hv", expr(hexval))
      .withColumn("bucket", expr("hv % 64"))
      .withColumn("w", expr("hv DIV 64")) // 26 payload bits
      .withColumn("rho", expr("CASE WHEN w = 0 THEN 27 ELSE 27 - length(bin(w)) END"))
  }

  /** Finalize a register table (event_type, bucket, r) against the
    * exact side: harmonic sum, raw estimate, linear-counting branch,
    * error ledger.
    */
  private[graft] def hllFinalize(regs: DataFrame, exact: DataFrame): DataFrame = {
    val sk = regs
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_hit"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), 27 - CAST(r AS INT))")).as("s_hit")
      )
      // empty registers contribute 2^-0 each: (m − hit)·2^27 in scaled units
      .withColumn("sum_inv", expr(s"s_hit + (64 - n_hit) * ${1L << 27}L"))
      .withColumn("raw_est", expr(s"${2904064L * (1L << 27)}L DIV (sum_inv * 1000)"))
      // linear counting when the raw estimate is small and empty
      // registers remain: m·ln(m/V) precomputed for V = 1..64
      .withColumn(
        "hll_estimate",
        expr(
          s"CASE WHEN raw_est <= 160 AND n_hit < 64 THEN " +
            s"element_at(array(${LcTable.mkString(", ")}), CAST(64 - n_hit AS INT)) " +
            "ELSE raw_est END"
        )
      )
      .drop("s_hit", "raw_est")
    sk.join(exact, Seq("event_type"))
      .withColumn("err_bp", expr("abs(hll_estimate - n_exact) * 10000 DIV n_exact"))
  }

  def approxHllUsers(spark: SparkSession, dir: String): DataFrame = {
    val rho = hllRhoRows(Tables.events(spark, dir))
    val regs = rho.groupBy(col("event_type"), col("bucket")).agg(max(col("rho")).as("r"))
    val exact = rho
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_exact"))
    hllFinalize(regs, exact)
  }

  // -------------------------------------------------------------------
  // rel_fk_audit — REFERENTIAL-INTEGRITY audit (the ingest-gate FK
  // check a warehouse runs before publishing): for each declared
  // child→parent relationship, the child row count, orphan row count,
  // and distinct orphan keys. Each leg is ONE left join against the
  // parent's distinct key projection (broadcast when the dim is small,
  // shuffle-hash otherwise — Spark's call) + a conditional aggregate;
  // no anti-join double pass. The synthetic tables are referentially
  // COMPLETE in every direction (checked: no orphans, no childless
  // parents), so the fourth leg is an explicit NEGATIVE CONTROL — the
  // same audit against the customer dim with a deterministic 10% of
  // keys withheld (c_custkey % 10 = 0) — proving the detector fires
  // on exactly the injected fault instead of vacuously passing.
  // -------------------------------------------------------------------
  def fkAudit(spark: SparkSession, dir: String): DataFrame = {
    def leg(name: String, child: DataFrame, key: String, parent: DataFrame, pkey: String): DataFrame =
      child
        .select(col(key).as("k"))
        .join(parent.select(col(pkey).as("k")).distinct().withColumn("hit", lit(1)), Seq("k"), "left")
        .agg(
          count(lit(1)).as("n_child"),
          sum(when(col("hit").isNull, 1L).otherwise(0L)).as("n_orphans"),
          countDistinct(when(col("hit").isNull, col("k"))).as("n_orphan_keys")
        )
        .select(lit(name).as("fk_name"), col("n_child"), col("n_orphans"), col("n_orphan_keys"))
    leg("orders_customer", Tables.orders(spark, dir), "o_custkey", Tables.customer(spark, dir), "c_custkey")
      .unionByName(
        leg("lineitem_orders", Tables.lineitem(spark, dir), "l_orderkey", Tables.orders(spark, dir), "o_orderkey")
      )
      .unionByName(
        leg("lineitem_part", Tables.lineitem(spark, dir), "l_partkey", Tables.part(spark, dir), "p_partkey")
      )
      .unionByName(
        leg(
          "negative_control",
          Tables.orders(spark, dir),
          "o_custkey",
          Tables.customer(spark, dir).filter(expr("c_custkey % 10 != 0")),
          "c_custkey"
        )
      )
  }

  // -------------------------------------------------------------------
  // rel_histogram_equi — equi-depth DECILE histogram of order totals
  // without a global sort: the two-level banded prefix sum (the same
  // design as text_coverage_topk). Prices band at $1000 (100k cents,
  // a bounded few-hundred-row domain at any corpus size), band counts
  // roll up partial-aggregably, the cumulative walk runs over the
  // TINY band table, and each band emits the deciles whose
  // ceil(d·N/10) rank it crosses — row-local given (cum_prev, cum].
  // Boundaries are exact at band resolution (the scale-correct
  // contract: a 100 TB exact-rank decile would be a global sort).
  // -------------------------------------------------------------------
  def histogramEqui(spark: SparkSession, dir: String): DataFrame = {
    val bandC = 100000L // $1000 bands in cents
    val wCum  = Window.orderBy(col("band"))
    val bands = Tables.orders(spark, dir)
      .select(cents(col("o_totalprice")).as("p_c"))
      .select(expr(s"p_c DIV ${bandC}L").as("band"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n"))
      .withColumn("cum", sum(col("n")).over(wCum))
      .withColumn("total", sum(col("n")).over(Window.partitionBy()))
    bands
      // deciles d with cum_prev < ceil(d·total/10) <= cum, i.e.
      // d in ( 10·cum_prev/total , 10·cum/total ] by integer walk
      .withColumn("cum_prev", col("cum") - col("n"))
      .withColumn(
        "decile",
        explode(expr("""filter(sequence(1, 10),
          d -> cum_prev * 10 < d * total AND d * total <= cum * 10)"""))
      )
      .select(
        col("decile").cast("long").as("decile"),
        col("band"),
        ((col("band") + 1) * bandC).as("upper_bound_c"),
        col("cum").as("cum_n"),
        col("total").as("n_total")
      )
  }

  // -------------------------------------------------------------------
  // approx_kmv_setops — KMV (k-minimum-values) sketch SET OPERATIONS:
  // per event-type pair, union and intersection cardinality estimates
  // from two k=128 sketches, published NEXT TO the exact answers so the
  // operator is its own error report. This is the sketch a 100 TB
  // pipeline keeps per partition/day/source to answer "how much do
  // these two feeds overlap" without ever joining the raw sets: a
  // sketch is k 48-bit integers (1 KiB), merge = k smallest of the
  // concatenation, and θ = h_k gives |S| ≈ (k−1)·2⁴⁸ / h_k — all
  // exact integer arithmetic both engines replay. Intersection via the
  // merged sketch's inclusion ratio: |A∩B| ≈ (|{v ∈ merged-k: v in
  // both}| · est_union) / k. Scale shape: per-type k-smallest runs
  // through the rank-filter window Spark rewrites into a
  // WindowGroupLimit (a bounded heap per partition, never a per-type
  // sort of all member hashes); the pair frame is the |types|²-bounded
  // self-join of the 1-row-per-type summary (tiny broadcast BNLJ, the
  // whitelisted house pattern); the exact tier joins member sets on
  // the member key with ≤|types|² fan-out per member.
  // -------------------------------------------------------------------
  def kmvSetops(spark: SparkSession, dir: String, kSketch: Int = 128): DataFrame = {
    val P48   = 281474976710656L // 2^48
    val kNum  = (kSketch - 1).toLong
    val tu = Tables
      .events(spark, dir)
      .select(col("event_type"), col("user_id"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val th = tu
      .withColumn(
        "h",
        conv(substring(md5(concat(lit("kmv:"), col("user_id").cast("string"))), 1, 12), 16, 10).cast("long")
      )
      .select(col("event_type"), col("h"))
      .distinct()
    val sketch = th
      .withColumn("rn", row_number().over(Window.partitionBy(col("event_type")).orderBy(col("h"))))
      .filter(col("rn") <= kSketch)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val exact = tu.groupBy(col("event_type")).agg(count(lit(1)).as("n_exact"))
    val perType = sketch
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_sk"), max(col("h")).as("h_k"))
      .join(exact, Seq("event_type"))
      .withColumn(
        "est",
        when(col("n_sk") < kSketch, col("n_sk")).otherwise(expr(s"(${kNum}L * ${P48}L) DIV h_k"))
      )
    val a = perType.select(
      col("event_type").as("type_a"),
      col("n_exact").as("exact_a"),
      col("est").as("est_a")
    )
    val b = perType.select(
      col("event_type").as("type_b"),
      col("n_exact").as("exact_b"),
      col("est").as("est_b")
    )
    val pairs = a.join(broadcast(b), col("type_a") < col("type_b")) // |types|² rows
    // merged sketch per pair: tag each sketch row with membership,
    // re-rank the DISTINCT merged hashes, keep the k smallest
    val pairSh = pairs
      .select(col("type_a"), col("type_b"))
      .join(
        broadcast(sketch.select(col("event_type"), col("h"))),
        col("event_type") === col("type_a") || col("event_type") === col("type_b")
      )
      .groupBy(col("type_a"), col("type_b"), col("h"))
      .agg(
        max(when(col("event_type") === col("type_a"), 1L).otherwise(0L)).as("in_a"),
        max(when(col("event_type") === col("type_b"), 1L).otherwise(0L)).as("in_b")
      )
      .withColumn(
        "rn",
        row_number().over(Window.partitionBy(col("type_a"), col("type_b")).orderBy(col("h")))
      )
      .filter(col("rn") <= kSketch)
      .groupBy(col("type_a"), col("type_b"))
      .agg(
        count(lit(1)).as("n_u"),
        max(col("h")).as("h_ku"),
        sum(col("in_a") * col("in_b")).as("n_both")
      )
    // exact pair tier at the member grain
    val exactInter = tu
      .as("x")
      .join(tu.as("y"), col("x.user_id") === col("y.user_id") && col("x.event_type") < col("y.event_type"))
      .groupBy(col("x.event_type").as("type_a"), col("y.event_type").as("type_b"))
      .agg(count(lit(1)).as("exact_inter"))
    val out = pairs
      .join(pairSh, Seq("type_a", "type_b"))
      .join(exactInter, Seq("type_a", "type_b"), "left")
      .withColumn("exact_inter", coalesce(col("exact_inter"), lit(0L)))
      .withColumn("exact_union", expr("exact_a + exact_b - exact_inter"))
      .withColumn(
        "est_union",
        when(col("n_u") < kSketch, col("n_u")).otherwise(expr(s"(${kNum}L * ${P48}L) DIV h_ku"))
      )
      // inclusion ratio over the merged sketch's ACTUAL size: n_u = k
      // when the sketch is full, fewer when the union itself is small
      // (then the sketch IS the union and the ratio is exact)
      .withColumn("est_inter", expr("n_both * est_union DIV greatest(n_u, 1L)"))
      .withColumn("union_err_bp", expr("abs(est_union - exact_union) * 10000 DIV exact_union"))
      .withColumn("inter_err_bp", expr("abs(est_inter - exact_inter) * 10000 DIV greatest(exact_inter, 1L)"))
      .select(
        col("type_a"),
        col("type_b"),
        col("exact_a"),
        col("exact_b"),
        col("est_a"),
        col("est_b"),
        col("exact_union"),
        col("est_union"),
        col("exact_inter"),
        col("est_inter"),
        col("union_err_bp"),
        col("inter_err_bp")
      )
    graft.operators.Dedup.releaseAfterRun(spark, out, Seq(tu, sketch))
  }

  // -------------------------------------------------------------------
  // rel_bloom_join_prune — RUNTIME-FILTER accounting: the classic
  // bloom-pruned join (what Spark's runtime bloom filter / a
  // semi-join pushdown does under AQE), expressed as an operator with
  // exact false-positive bookkeeping. Build side: order keys from a
  // ~4%-selective date window, folded into an m = 2¹⁶-bit Bloom bitmap
  // (≤m-row distinct-position table here — 8 KiB as a real bitmap —
  // broadcast either way). Probe side: lineitem, pre-aggregated to the
  // join-key grain (partial-aggregable; the production probe is
  // row-local against the broadcast bitmap BEFORE any shuffle, which
  // is the entire point of the technique — rows that fail the filter
  // never enter the join exchange). The single output row reports key
  // and row counts at each funnel stage (all / bloom-pass / true
  // match), the false-positive rate among true non-matches, and the
  // shuffle-row savings in basis points. m is FIXED for cross-engine
  // replay; production sizes m at ~10 bits per build key for a ~1% FP
  // rate.
  // -------------------------------------------------------------------
  def bloomJoinPrune(
      spark: SparkSession,
      dir: String,
      m: Int = 1 << 16,
      kProbes: Int = graft.functions.BloomFilter.DefaultProbes
  ): DataFrame = {
    import graft.functions.BloomFilter
    val build = Tables
      .orders(spark, dir)
      .filter(
        col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1995-04-01").cast("timestamp")
      )
      .select(col("o_orderkey"))
      .distinct()
    val bits = build
      .withColumn("hm", BloomFilter.baseHash(concat(lit("bjp:"), col("o_orderkey").cast("string"))))
      .select(explode(BloomFilter.positions(col("hm"), m, kProbes)).as("pos"))
      .distinct() // <= m rows, structurally
    val probeKeys = Tables
      .lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("hm", BloomFilter.baseHash(concat(lit("bjp:"), col("l_orderkey").cast("string"))))
    val probed = probeKeys
      .select(col("l_orderkey"), col("n_rows"), explode(BloomFilter.positions(col("hm"), m, kProbes)).as("pos"))
      .join(broadcast(bits.withColumn("set", lit(1L))), Seq("pos"), "left")
      .groupBy(col("l_orderkey"), col("n_rows"))
      .agg(sum(coalesce(col("set"), lit(0L))).as("n_set"))
      .withColumn("pass", col("n_set") === kProbes.toLong)
      .join(
        broadcast(build.withColumn("true_match", lit(1L))),
        col("l_orderkey") === col("o_orderkey"),
        "left"
      )
      .withColumn("true_match", coalesce(col("true_match"), lit(0L)))
    probed
      .agg(
        count(lit(1)).as("n_keys"),
        sum(col("n_rows")).as("n_rows"),
        sum(when(col("pass"), 1L).otherwise(0L)).as("n_keys_pass"),
        sum(when(col("pass"), col("n_rows")).otherwise(0L)).as("n_rows_pass"),
        sum(col("true_match")).as("n_keys_true"),
        sum(col("true_match") * col("n_rows")).as("n_rows_true")
      )
      .withColumn("n_keys_fp", expr("n_keys_pass - n_keys_true"))
      .withColumn("fp_bp", expr("n_keys_fp * 10000 DIV greatest(n_keys - n_keys_true, 1L)"))
      .withColumn("pruned_rows_bp", expr("(n_rows - n_rows_pass) * 10000 DIV n_rows"))
  }

  /** graph_khop — BFS REACHABILITY profile of the part co-purchase
    * graph (graph_part_rank's edges): from the max-degree part
    * (deterministic root), the frontier sizes at depths 0..k — the
    * "how connected is this catalog" read, and the iterative-BFS
    * primitive (frontier ⋈ edges, anti-join visited) every
    * distributed graph walk builds on. Each round is one edge-join +
    * one distinct + one anti-join against the visited set, with a
    * localCheckpoint lineage cut per round (the CC-loop discipline);
    * the frontier and visited sets are node-grain — never edge-grain
    * — so rounds are bounded by |V| regardless of path multiplicity
    * (the reason the oracle also unrolls level-by-level instead of
    * enumerating paths: a dense graph has combinatorially many
    * length-3 walks but at most |V| reached nodes).
    */
  def kHop(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    import spark.implicits._
    // the co-purchase edge list is a PERSISTED tier (GraphTier) — the
    // order-key self-join ran once at build; this query reads a table
    val edges = graft.sources.GraphTier.coPurchaseEdges(spark, dir)
    val deg  = edges.groupBy($"src").agg(count(lit(1)).as("deg"))
    val root = deg.orderBy($"deg".desc, $"src".asc).limit(1).head().getLong(0)
    var visited  = Seq((root, 0L)).toDF("node", "depth").localCheckpoint()
    var frontier = visited.select($"node")
    for (d <- 1 to k) {
      val next = edges
        .join(frontier.withColumnRenamed("node", "src"), Seq("src"))
        .select($"dst".as("node"))
        .distinct()
        .join(visited.select($"node"), Seq("node"), "left_anti")
        .withColumn("depth", lit(d.toLong))
        .localCheckpoint()
      visited = visited.union(next).localCheckpoint()
      frontier = next.select($"node")
    }
    visited
      .groupBy($"depth")
      .agg(
        count(lit(1)).as("n_nodes"),
        min($"node").cast("long").as("min_node"),
        max($"node").cast("long").as("max_node")
      )
  }

  /** graph_common_neighbors — LINK PREDICTION over the part
    * co-purchase graph (graph_part_rank's edges): for part pairs NOT
    * already co-purchased, the common-neighbor count and neighbor
    * Jaccard — "parts bought with the same things are next to be
    * bought together", the classic recommender signal. Scale shape:
    * candidate pairs come from a WEDGE join through the middle node,
    * and the middle is DEGREE-CAPPED (deg ≤ cap, default 128) before
    * the join — a hub middle contributes deg² wedge rows into one
    * shuffle key, exactly the blowup `dropOversizedBuckets` exists to
    * stop, and a hub shared by everything carries no predictive
    * signal anyway (the same df-cap argument as boilerplate
    * shingles; the drop is part of the operator's contract and the
    * oracle replays it). cn is therefore a documented LOWER bound
    * through informative middles; degrees for the Jaccard come from
    * the full uncapped degree table. Top-k via orderBy+limit
    * (TakeOrdered, no global sort); existing edges leave via
    * left_anti on the edge key.
    */
  def commonNeighbors(spark: SparkSession, dir: String, cap: Long = 128L, k: Int = 20): DataFrame = {
    import spark.implicits._
    // the co-purchase edge list is a PERSISTED tier (GraphTier) — the
    // order-key self-join ran once at build; this query reads a table
    val edges = graft.sources.GraphTier.coPurchaseEdges(spark, dir)
    val deg = edges.groupBy($"src").agg(count(lit(1)).as("deg")).localCheckpoint()
    val informative = deg.filter($"deg" <= cap).select($"src".as("mid"))
    val half = edges
      .select($"dst".as("mid"), $"src".as("node"))
      .join(informative, Seq("mid"))
    val wedges = half
      .as("x")
      .join(half.as("y"), col("x.mid") === col("y.mid") && col("x.node") < col("y.node"))
      .select(col("x.node").as("node_a"), col("y.node").as("node_b"))
    val cn = wedges
      .groupBy($"node_a", $"node_b")
      .agg(count(lit(1)).as("cn"))
      .join(
        // shuffled-HASH anti join: the build side is the edge table's
        // per-partition slice (E/P rows — bounded), and the O(Σdeg²)
        // pair side streams WITHOUT the sort-merge sort a default SMJ
        // would pay on the much bigger side; measured ~1.4× on this
        // operator at sf0.1, and the asymmetry only grows with scale
        edges.select($"src".as("node_a"), $"dst".as("node_b")).hint("shuffle_hash"),
        Seq("node_a", "node_b"),
        "left_anti"
      )
    // top-k FIRST: the selection key is (cn, node_a, node_b), so the
    // degree joins and the Jaccard only ever touch the k survivors —
    // scoring the full O(Σdeg²) pair table before the limit was
    // measured at ~2× this operator's runtime at sf0.1 for identical
    // output (the candidate table barely aggregates: mean multiplicity
    // ~1.2, so it is wedge-sized going into those joins)
    val topk = cn.orderBy($"cn".desc, $"node_a".asc, $"node_b".asc).limit(k)
    val w = Window.orderBy($"cn".desc, $"node_a".asc, $"node_b".asc)
    topk
      .join(broadcast(deg.select($"src".as("node_a"), $"deg".as("deg_a"))), Seq("node_a"))
      .join(broadcast(deg.select($"src".as("node_b"), $"deg".as("deg_b"))), Seq("node_b"))
      .withColumn("jaccard_bp", expr("cn * 10000 DIV greatest(deg_a + deg_b - cn, 1L)"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .select($"rnk", $"node_a", $"node_b", $"cn", $"deg_a", $"deg_b", $"jaccard_bp")
  }

  /** graph_copurchase_tier — INCREMENTAL MAINTENANCE of the
    * co-purchase edge tier (the dedup_edge_tier discipline on the
    * relational graph): the tier is built from the first half of
    * order history, a batch of NEW orders appends through
    * [[graft.sources.GraphTier.appendCoPurchase]] — within-batch
    * self-join only (an order's items ship complete; pairs never span
    * orders) plus a delta-keyed anti-join against the stored tier for
    * the already-co-bought pairs the LSH tier's fresh-rep argument
    * doesn't cover — and the query reads the tier back. Oracle = the
    * from-scratch self-join over the FULL table: equality proves
    * incremental ≡ rebuild while no order-key self-join ever touches
    * the old half again. This is what lets graph_part_rank & co read
    * a TABLE at 100 TB while ingest keeps it current per batch.
    */
  def coPurchaseTier(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir).select($"l_orderkey", $"l_partkey")
    val mm = li.agg(min($"l_orderkey"), max($"l_orderkey")).head()
    val split = (mm.getLong(0) + mm.getLong(1) + 1L) / 2L
    // the first-half tier is a shared template (built once per
    // process); appendCoPurchase MUTATES, so the drill clones it and
    // prices its subject — the delta append + read-back
    val tmpl = graft.sources.TimeboxStore.sharedFixture("graft_coptier_tmpl", dir) { p =>
      graft.sources.GraphTier.writeCoPurchase(li.filter($"l_orderkey" < split), p)
    }
    val store = graft.sources.TimeboxStore.fixtureClone(tmpl, "graft_coptier", dir)
    graft.sources.GraphTier.appendCoPurchase(spark, li.filter($"l_orderkey" >= split), store)
    graft.sources.GraphTier.readCoPurchase(spark, store)
  }

  /** rel_mv_delta — INCREMENTAL VIEW MAINTENANCE with its own proof:
    * the revenue-per-nation materialized view is built WITHOUT the
    * late-arriving partition (o_orderkey % 10 = 0, the house
    * late-batch convention), the delta aggregate is computed over
    * ONLY that partition, and the maintained view (mv + delta) is
    * published next to a from-scratch recompute with a match flag —
    * the operator demonstrates that sum-aggregates maintain
    * incrementally and audits itself. Scale shape: the delta pass
    * scans only the late partition (the modulo predicate pushes to
    * the orders scan and the lineitem side prunes through the join);
    * dims broadcast; both aggregates are partial-aggregable
    * nation-grain. At 100 TB this is the nightly-close pattern:
    * maintaining the MV costs O(delta), and the full-recompute tier
    * here exists only as the audit.
    */
  def mvDelta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ord  = Tables.orders(spark, dir).select($"o_orderkey", $"o_custkey")
    val li   = Tables.lineitem(spark, dir).select($"l_orderkey", $"l_extendedprice", $"l_discount")
    val dims = broadcast(
      Tables
        .customer(spark, dir)
        .select($"c_custkey", $"c_nationkey")
        .join(broadcast(Tables.nation(spark, dir).select($"n_nationkey", $"n_name")), $"c_nationkey" === $"n_nationkey")
        .select($"c_custkey", $"n_name")
    )
    def revenueByNation(o: DataFrame): DataFrame =
      li.join(o, $"l_orderkey" === $"o_orderkey")
        .join(dims, $"o_custkey" === $"c_custkey")
        .groupBy($"n_name")
        .agg(sum(cents($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("rev_c"))
    val mv    = revenueByNation(ord.filter($"o_orderkey" % 10 =!= 0)).withColumnRenamed("rev_c", "mv_c")
    val delta = revenueByNation(ord.filter($"o_orderkey" % 10 === 0)).withColumnRenamed("rev_c", "delta_c")
    val full  = revenueByNation(ord).withColumnRenamed("rev_c", "full_c")
    full
      .join(mv, Seq("n_name"), "left")
      .join(delta, Seq("n_name"), "left")
      .select(
        $"n_name",
        coalesce($"mv_c", lit(0L)).as("mv_c"),
        coalesce($"delta_c", lit(0L)).as("delta_c"),
        (coalesce($"mv_c", lit(0L)) + coalesce($"delta_c", lit(0L))).as("maintained_c"),
        $"full_c",
        (coalesce($"mv_c", lit(0L)) + coalesce($"delta_c", lit(0L)) === $"full_c").as("matches")
      )
  }

  /** rel_join_size_estimate — JOIN CARDINALITY ESTIMATION by
    * count-min-sketch inner product (Cormode–Muthukrishnan / the AMS
    * family), published next to the exact answer so the operator is
    * its own error report (the approx_cms house pattern). The planner
    * question at 100 TB is "how big is lineitem⋈lineitem ON partkey
    * BEFORE I run it" — the answer decides broadcast vs shuffle vs
    * don't-run; the sketch answers from one cheap pass while the
    * exact Σ f(k)² needs the full key-frequency table. For each join,
    * each of D=4 sketch rows estimates the self-join size as
    * ip(r) = Σ_w c[r][w]² and the estimate is the MIN over rows;
    * bucket collisions only ADD cross terms, so est ≥ exact
    * structurally (one-sided, pinned in spec). Width is 65536 —
    * inner-product error is ~N²/W, so a narrow 256-wide sketch would
    * drown the signal; D·W = 256k counters is still executor-hash
    * small. Scale shape: the frequency table and the sketch cells are
    * each ONE partial-aggregable groupBy (map-side combine collapses
    * every partition to ≤ D·W cell rows regardless of fact size); the
    * per-row inner products and mins are 4-row aggregates; nothing
    * pairwise ever runs — the operator prices the quadratic join
    * without executing it.
    */
  def joinSizeEstimate(spark: SparkSession, dir: String, width: Int = 65536, depth: Int = 4): DataFrame = {
    import spark.implicits._
    val keys = Tables
      .lineitem(spark, dir)
      .select(lit("li_partkey_self").as("join_name"), $"l_partkey".cast("long").as("k"))
      .unionByName(
        Tables.orders(spark, dir).select(lit("ord_custkey_self").as("join_name"), $"o_custkey".cast("long").as("k"))
      )
    val f = keys
      .groupBy($"join_name", $"k")
      .agg(count(lit(1)).as("f"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val exact = f.groupBy($"join_name").agg(sum($"f" * $"f").as("exact_rows"))
    val cells = f
      .select($"join_name", $"k", $"f", explode(expr(s"sequence(0, ${depth - 1})")).as("r"))
      .withColumn(
        "bucket",
        expr(
          s"CAST(conv(substring(md5(concat('jse:', join_name, ':', CAST(r AS STRING), ':', CAST(k AS STRING))), 1, 12), 16, 10) AS BIGINT) % $width"
        )
      )
      .groupBy($"join_name", $"r", $"bucket")
      .agg(sum($"f").as("c"))
    val ip  = cells.groupBy($"join_name", $"r").agg(sum($"c" * $"c").as("ip"))
    val est = ip.groupBy($"join_name").agg(min($"ip").as("est_rows"))
    val out = ip
      .join(broadcast(est), Seq("join_name"))
      .join(broadcast(exact), Seq("join_name"))
      .withColumn("over_bp", expr("(est_rows - exact_rows) * 10000 DIV exact_rows"))
      .select($"join_name", $"r".cast("long").as("r"), $"ip", $"est_rows", $"exact_rows", $"over_bp")
    graft.operators.Dedup.releaseAfterRun(spark, out, Seq(f))
  }

  /** Morton interleave of two already-bucketed coordinates (each in
    * [0, 2^bits)): bit i of `a` lands at position 2i, bit i of `b` at
    * 2i+1 — pure integer arithmetic (DIV/%/×) so both engines replay
    * it bit-identically. `div` is the floor-division spelling ("DIV"
    * for Spark, "//" for DuckDB).
    */
  private[graft] def zInterleaveSql(a: String, b: String, bits: Int, div: String): String =
    (0 until bits)
      .map { i =>
        val pa = 1L << i
        s"(($a $div $pa) % 2) * ${1L << (2 * i)} + (($b $div $pa) % 2) * ${1L << (2 * i + 1)}"
      }
      .mkString(" + ")

  /** rel_zorder_layout — DATA LAYOUT PLANNING: the z-order
    * (Morton-curve) clustering audit behind every "OPTIMIZE ZORDER
    * BY" decision. lineitem rows are assigned to 64 files under three
    * layouts — natural (orderkey ranges: arrival order), sorted
    * (shipdate ranges: the single-column winner), zorder (Morton
    * interleave of 8-bit shipdate × partkey buckets) — and each
    * layout's per-file (min,max) zone maps are replayed against three
    * reference query boxes (date-range only, partkey-range only,
    * both). A file is scanned iff its zone map intersects the box;
    * the report is files/rows scanned vs rows actually matched per
    * (layout, box) — the number that shows sorted wins its own
    * dimension but degrades to a full scan on the other, while
    * z-order bounds BOTH. At 100 TB this IS the table-layout
    * decision: zone-map skipping is the first 100× and it only
    * exists if the layout clusters the query dimensions. Scale
    * shape: bucket bounds are a 1-row aggregate broadcast back
    * (named BNLJ shape); file stats are ONE partial-aggregable
    * groupBy on (layout, file) — ≤ 192 groups regardless of fact
    * size; the box replay runs on the 192-row zone-map table. All
    * integer (datediff days, DIV buckets, Morton arithmetic).
    */
  // -------------------------------------------------------------------
  // rel_bucketed_join — CO-LOCATED JOIN off bucketed metastore tables:
  // both fact sides are written bucketBy/sortBy on their join keys
  // (same bucket count), so the per-supplier revenue join plans with
  // ZERO exchange below it — the scan IS the shuffle, paid once at
  // write time instead of per query. This is THE layout answer to
  // "we join these two 30 TB tables every hour": at 100 TB the write
  // is amortized over every downstream join, and the only exchange
  // left in this plan is the final nation-grain aggregate.
  // BucketingSpec pins the no-exchange join plan; the oracle is the
  // plain join restated from the raw tables (layout must never change
  // answers). Table names key on the per-call scratch path so
  // concurrent query runs never collide in the catalog.
  // -------------------------------------------------------------------
  def bucketedJoin(spark: SparkSession, dir: String, buckets: Int = 8): DataFrame = {
    val tag = java.security.MessageDigest
      .getInstance("MD5")
      .digest(graft.sources.TimeboxStore.scratchPath("rbj", dir).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.take(10)
    val (liTbl, supTbl) = (s"rbj_li_$tag", s"rbj_sup_$tag")
    graft.sources.Bucketing.writeBucketed(
      Tables.lineitem(spark, dir).select(col("l_suppkey"), cents(col("l_extendedprice")).as("price_c")),
      liTbl, "l_suppkey", buckets
    )
    graft.sources.Bucketing.writeBucketed(
      Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey")),
      supTbl, "s_suppkey", buckets
    )
    spark
      .table(liTbl)
      .join(spark.table(supTbl), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_items"), sum(col("price_c")).as("sum_price_c"))
  }

  def zorderLayout(spark: SparkSession, dir: String, files: Int = 64, bits: Int = 8): DataFrame = {
    import spark.implicits._
    val side = 1L << bits // buckets per dimension
    val li = Tables
      .lineitem(spark, dir)
      .select(
        $"l_orderkey".cast("long").as("ok"),
        $"l_partkey".cast("long").as("pk"),
        datediff($"l_shipdate", lit(java.sql.Date.valueOf("1992-01-01"))).cast("long").as("d")
      )
    val bounds = li.agg(
      min($"d").as("dmin"),
      max($"d").as("dmax"),
      min($"pk").as("pmin"),
      max($"pk").as("pmax"),
      min($"ok").as("omin"),
      max($"ok").as("omax")
    )
    val rows = li
      .crossJoin(broadcast(bounds)) // 1-row bounds broadcast (named BNLJ shape)
      .withColumn("ab", expr(s"(d - dmin) * $side DIV (dmax - dmin + 1)"))
      .withColumn("bb", expr(s"(pk - pmin) * $side DIV (pmax - pmin + 1)"))
      .withColumn("z", expr(zInterleaveSql("ab", "bb", bits, "DIV")))
      .withColumn("pk_hi", expr("pmin + (pmax - pmin) DIV 8"))
      .withColumn("hit_d", $"d" >= 2200L && $"d" <= 2229L)
      .withColumn("hit_pk", $"pk" <= $"pk_hi")
      .withColumn("file_natural", expr(s"(ok - omin) * $files DIV (omax - omin + 1)"))
      .withColumn("file_sorted", expr(s"(d - dmin) * $files DIV (dmax - dmin + 1)"))
      .withColumn("file_zorder", expr(s"z * $files DIV ${side * side}"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val lay = rows
      .select(
        explode(
          array(
            struct(lit("natural").as("layout"), $"file_natural".as("file")),
            struct(lit("sorted").as("layout"), $"file_sorted".as("file")),
            struct(lit("zorder").as("layout"), $"file_zorder".as("file"))
          )
        ).as("lf"),
        $"d",
        $"pk",
        $"pk_hi",
        $"hit_d",
        $"hit_pk"
      )
      .select($"lf.layout".as("layout"), $"lf.file".as("file"), $"d", $"pk", $"pk_hi", $"hit_d", $"hit_pk")
    val perFile = lay
      .groupBy($"layout", $"file")
      .agg(
        min($"d").as("f_dmin"),
        max($"d").as("f_dmax"),
        min($"pk").as("f_pmin"),
        max($"pk").as("f_pmax"),
        min($"pk_hi").as("pk_hi"),
        count(lit(1)).as("f_rows"),
        sum(when($"hit_d" && $"hit_pk", 1L).otherwise(0L)).as("f_match_both"),
        sum(when($"hit_d", 1L).otherwise(0L)).as("f_match_d"),
        sum(when($"hit_pk", 1L).otherwise(0L)).as("f_match_pk")
      )
    val boxes = Seq(("d_range", true, false), ("pk_range", false, true), ("both", true, true))
      .toDF("box", "use_d", "use_pk")
    val audited = perFile
      .crossJoin(broadcast(boxes)) // 3-row box table broadcast (named BNLJ shape)
      .withColumn(
        "scanned",
        (!$"use_d" || ($"f_dmax" >= 2200L && $"f_dmin" <= 2229L)) &&
          (!$"use_pk" || $"f_pmin" <= $"pk_hi")
      )
      .withColumn(
        "f_matched",
        when($"use_d" && $"use_pk", $"f_match_both")
          .when($"use_d", $"f_match_d")
          .otherwise($"f_match_pk")
      )
    val out = audited
      .groupBy($"layout", $"box")
      .agg(
        count(lit(1)).as("n_files"),
        sum(when($"scanned", 1L).otherwise(0L)).as("files_scanned"),
        sum($"f_rows").as("rows_total"),
        sum(when($"scanned", $"f_rows").otherwise(0L)).as("rows_scanned"),
        sum($"f_matched").as("rows_matched")
      )
      .withColumn("scan_share_bp", expr("rows_scanned * 10000 DIV rows_total"))
      .withColumn("waste_bp", expr("(rows_scanned - rows_matched) * 10000 DIV greatest(rows_scanned, 1L)"))
    graft.operators.Dedup.releaseAfterRun(spark, out, Seq(rows))
  }

  /** rel_compaction_plan — SMALL-FILE COMPACTION planning (the
    * lakehouse OPTIMIZE/bin-packing decision): lineitem is viewed as a
    * run of files (64 orders per file, per-row byte proxy
    * 64 + price-cents % 191 so sizes vary deterministically), and
    * adjacent files are greedily packed into target-size rewrite
    * groups — a file joins the group where its cumulative START byte
    * falls, so groups are contiguous, order-preserving, and overflow a
    * target only by less than one file. The report (per group: files,
    * rows, bytes, fill) is what a compaction scheduler submits as its
    * rewrite manifest; at 100 TB small-file pressure is THE metadata
    * killer and this is the maintenance pass that bounds it. Scale
    * shape: file stats are ONE partial-aggregable groupBy (map-side
    * combine collapses data-grain to file-grain); the running sum is
    * the house TWO-LEVEL banded prefix sum (in-band cumsum partitioned
    * by the 256-file band; band offsets via a window over the
    * band-count-sized table — never a corpus-grain single-reducer
    * sort), same discipline as sample_pack_sequences.
    */
  def compactionPlan(
      spark: SparkSession,
      dir: String,
      ordersPerFile: Long = 64L,
      targetBytes: Long = 262144L
  ): DataFrame = {
    val files = Tables
      .lineitem(spark, dir)
      .select(
        expr(s"l_orderkey DIV ${ordersPerFile}L").as("file_id"),
        (lit(64L) + cents(col("l_extendedprice")) % 191L).as("b")
      )
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_rows"), sum(col("b")).as("bytes"))
      .withColumn("band", expr("file_id DIV 256"))
    val wBand = Window.orderBy(col("band")).rowsBetween(Window.unboundedPreceding, -1)
    val wIn = Window
      .partitionBy(col("band"))
      .orderBy(col("file_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bandTotals = files
      .groupBy(col("band"))
      .agg(sum(col("bytes")).as("band_bytes"))
      .withColumn("band_offset", coalesce(sum(col("band_bytes")).over(wBand), lit(0L)))
      .select(col("band"), col("band_offset"))
    files
      .join(broadcast(bandTotals), Seq("band"))
      .withColumn("g_start", col("band_offset") + sum(col("bytes")).over(wIn) - col("bytes"))
      .withColumn("group_id", expr(s"g_start DIV ${targetBytes}L"))
      .groupBy(col("group_id"))
      .agg(
        count(lit(1)).as("n_files"),
        sum(col("n_rows")).as("n_rows"),
        sum(col("bytes")).as("bytes"),
        min(col("file_id")).as("file_lo"),
        max(col("file_id")).as("file_hi")
      )
      .withColumn("fill_bp", expr(s"bytes * 10000 DIV ${targetBytes}L"))
  }

  /** rel_latency_percentiles — fulfilment-SLA percentiles: per order
    * priority, exact p50/p90/p99 of order→ship latency in days (the
    * number an ops SLA is written against), via the house exact-
    * histogram percentile plan: latency domain is SMALL (bounded
    * days), so the histogram groupBy is partial-aggregable onto
    * (priority × days) and the rank walk runs over that bounded
    * table — no global sort, no per-row window. The ceil(p·n) rank
    * pick is the ts_percentiles spelling, replayed identically by
    * the oracle.
    */
  def latencyPercentiles(spark: SparkSession, dir: String): DataFrame = {
    val lat = Tables
      .lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_shipdate"))
      .join(
        Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority")),
        col("o_orderkey") === col("l_orderkey")
      )
      .select(col("o_orderpriority"), datediff(col("l_shipdate"), col("o_orderdate")).cast("long").as("days"))
    val hist = lat.groupBy(col("o_orderpriority"), col("days")).agg(count(lit(1)).as("cnt"))
    val wCum = Window
      .partitionBy("o_orderpriority")
      .orderBy(col("days"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy("o_orderpriority")))
    val picks = Seq(0.5, 0.9, 0.99).map { p =>
      val k = ceil(lit(p) * col("n"))
      max(when(k > col("cum") - col("cnt") && k <= col("cum"), col("days")))
        .as(s"p${(p * 100).toInt}_days")
    }
    cum.groupBy(col("o_orderpriority")).agg(first(col("n")).as("n"), picks: _*)
  }

  /** rel_max_concurrency — INTERVAL CONCURRENCY sweep (the classic
    * +1/−1 event-boundary pattern behind capacity planning, room
    * booking, and connection-pool sizing): each lineitem is an open
    * interval [order day, ship day] at its supplier; the report is
    * each supplier's peak number of simultaneously-open lineitems and
    * the first day that peak is reached. Ends are exclusive at
    * day + 1, so same-day touch counts as overlap. Determinism needs
    * NO intra-day event order: deltas are aggregated per (supplier,
    * day) FIRST, so the running sum is over one row per day and the
    * prefix values are order-free. Scale shape: one fact-fact equi
    * join on orderkey (both sides shuffle on the key, AQE free to
    * re-plan), one partial-aggregable groupBy onto (supplier, day) —
    * the sweep's domain is supplier × active-days, metadata-sized —
    * then per-supplier windows over that compressed table.
    */
  def maxConcurrency(spark: SparkSession, dir: String): DataFrame = {
    val iv = Tables
      .lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(
        Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderdate")),
        col("o_orderkey") === col("l_orderkey")
      )
      .select(
        col("l_suppkey"),
        datediff(col("o_orderdate"), lit(java.sql.Date.valueOf("1992-01-01"))).cast("long").as("s"),
        (datediff(col("l_shipdate"), lit(java.sql.Date.valueOf("1992-01-01"))).cast("long") + 1L).as("e")
      )
    val events = iv
      .select(col("l_suppkey"), col("s").as("t"), lit(1L).as("delta"))
      .unionByName(iv.select(col("l_suppkey"), col("e").as("t"), lit(-1L).as("delta")))
      .groupBy(col("l_suppkey"), col("t"))
      .agg(sum(col("delta")).as("d"), sum(when(col("delta") > 0, 1L).otherwise(0L)).as("starts"))
    val wRun = Window
      .partitionBy(col("l_suppkey"))
      .orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("l_suppkey"))
    events
      .withColumn("open", sum(col("d")).over(wRun))
      .withColumn("max_open", max(col("open")).over(wAll))
      .withColumn("n_intervals", sum(col("starts")).over(wAll))
      .filter(col("open") === col("max_open"))
      .groupBy(col("l_suppkey"))
      .agg(
        min(col("t")).as("peak_day"),
        max(col("max_open")).as("max_open"),
        max(col("n_intervals")).as("n_intervals")
      )
      .select(col("l_suppkey"), col("n_intervals"), col("max_open"), col("peak_day"))
  }

  // -------------------------------------------------------------------
  // graph_kcore — K-CORE PEELING on the part co-purchase graph (the
  // graph_khop edge set): iteratively remove nodes with degree < k
  // and every edge touching them, T fixed rounds, emitting the
  // CONVERGENCE TRACE (survivors + remaining directed edges + degree
  // extremes per round) — the dense-subgraph census behind community
  // seeds and hub detection, and the graph analogue of the peel loops
  // a dedup pipeline runs on its candidate graph. Each round is ONE
  // degree aggregate + one semi-join per endpoint (all equi-joins on
  // the node key, partial-aggregable), per-round localCheckpoint cuts
  // the lineage exactly like the other iterative graph ops; rounds
  // are a fixed constant, so the plan depth is bounded at any corpus
  // size.
  // -------------------------------------------------------------------
  def kCore(spark: SparkSession, dir: String, k: Int = 3, rounds: Int = 4): DataFrame = {
    import spark.implicits._
    // persisted co-purchase tier (GraphTier); the peel loop below
    // re-assigns edges per round, so the seed is the tier read
    var edges = graft.sources.GraphTier.coPurchaseEdges(spark, dir)
    val trace = scala.collection.mutable.ListBuffer.empty[DataFrame]
    for (r <- 1 to rounds) {
      val keep = edges
        .groupBy($"src")
        .agg(count(lit(1)).as("deg"))
        .filter($"deg" >= k.toLong)
        .select($"src".as("node"), $"deg")
        .localCheckpoint()
      edges = edges
        .join(keep.select($"node".as("src")), Seq("src"))
        .join(keep.select($"node".as("dst")), Seq("dst"))
        .select($"src", $"dst")
        .localCheckpoint()
      trace += keep
        .agg(
          count(lit(1)).as("n_kept"),
          min($"deg").as("min_deg"),
          max($"deg").as("max_deg")
        )
        .crossJoin(edges.agg(count(lit(1)).as("n_edges_directed")))
        .select(
          lit(r.toLong).as("round"),
          col("n_kept"),
          col("n_edges_directed"),
          coalesce(col("min_deg"), lit(0L)).as("min_deg"),
          coalesce(col("max_deg"), lit(0L)).as("max_deg")
        )
    }
    trace.reduce(_ unionByName _)
  }

  // -------------------------------------------------------------------
  // rel_unpivot — MELT, the inverse reshape of rel_pivot: the wide
  // (ship_month × 3 flag columns) revenue table unpivots back to long
  // (ship_month, flag, revenue) via `stack` — one codegen'd row-local
  // expansion, no shuffle beyond the pivot's own aggregate. Round-trip
  // law: unpivot(pivot(x)) equals the direct long-form aggregate
  // wherever a cell is nonzero (pivot materializes absent cells as 0;
  // the melt drops them so the long form is exactly recoverable — the
  // oracle IS the direct aggregate, which is the strongest form of
  // the round-trip claim). The reshape pair a reporting layer needs
  // in both directions.
  // -------------------------------------------------------------------
  def unpivotReturnflag(spark: SparkSession, dir: String): DataFrame =
    pivotReturnflag(spark, dir)
      .select(
        col("ship_month"),
        expr("stack(3, 'A', rev_a_c, 'N', rev_n_c, 'R', rev_r_c) AS (l_returnflag, rev_c)")
      )
      .filter(col("rev_c") =!= 0L)

  // -------------------------------------------------------------------
  // rel_interval_union — UNION-OF-INTERVALS coverage per supplier, the
  // companion read to rel_max_concurrency's peak: the same +1/−1 sweep
  // line, but integrated — covered days (length of the union), merged
  // SEGMENT count (maximal busy runs), the longest segment, and the
  // utilization share of the active span. The classic "how busy was
  // this resource, really" audit that naive sum-of-durations
  // double-counts whenever intervals overlap. Plan shape: intervals
  // collapse to per-(key, day) net-delta events BEFORE any window (one
  // supplier-keyed shuffle serves the running sum, the lead/lag, and
  // the segment aggregation), coverage = Σ gap·[open>0], segments via
  // the 0→positive transition counter — all per-key windows, nothing
  // corpus-global.
  // -------------------------------------------------------------------
  def intervalUnion(spark: SparkSession, dir: String): DataFrame = {
    val iv = Tables
      .lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(
        Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderdate")),
        col("o_orderkey") === col("l_orderkey")
      )
      .select(
        col("l_suppkey"),
        datediff(col("o_orderdate"), lit(java.sql.Date.valueOf("1992-01-01"))).cast("long").as("s"),
        (datediff(col("l_shipdate"), lit(java.sql.Date.valueOf("1992-01-01"))).cast("long") + 1L).as("e")
      )
    val events = iv
      .select(col("l_suppkey"), col("s").as("t"), lit(1L).as("delta"))
      .unionByName(iv.select(col("l_suppkey"), col("e").as("t"), lit(-1L).as("delta")))
      .groupBy(col("l_suppkey"), col("t"))
      .agg(sum(col("delta")).as("d"), sum(when(col("delta") > 0, 1L).otherwise(0L)).as("starts"))
    val wRun  = Window.partitionBy(col("l_suppkey")).orderBy(col("t")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wLead = Window.partitionBy(col("l_suppkey")).orderBy(col("t"))
    val swept = events
      .withColumn("open", sum(col("d")).over(wRun))
      .withColumn("next_t", lead(col("t"), 1).over(wLead))
      .withColumn("prev_open", lag(col("open"), 1, 0L).over(wLead))
      // every open>0 row has a successor: the final event per key
      // closes the last interval, so its open is 0 by construction
      .withColumn("covered", when(col("open") > 0, col("next_t") - col("t")).otherwise(lit(0L)))
      .withColumn("seg_start", when(col("open") > 0 && col("prev_open") === 0L, 1L).otherwise(0L))
      .withColumn("seg_id", sum(col("seg_start")).over(wRun))
    val segs = swept
      .filter(col("open") > 0)
      .groupBy(col("l_suppkey"), col("seg_id"))
      .agg(sum(col("covered")).as("seg_days"))
      .groupBy(col("l_suppkey"))
      .agg(
        count(lit(1)).as("n_segments"),
        sum(col("seg_days")).as("covered_days"),
        max(col("seg_days")).as("longest_days")
      )
    iv.groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_intervals"), min(col("s")).as("lo"), max(col("e")).as("hi"))
      .join(segs, Seq("l_suppkey"))
      .withColumn("span_days", expr("hi - lo"))
      .withColumn("util_bp", expr("covered_days * 10000 DIV span_days"))
      .select(
        col("l_suppkey"),
        col("n_intervals"),
        col("n_segments"),
        col("covered_days"),
        col("longest_days"),
        col("span_days"),
        col("util_bp")
      )
  }

  // -------------------------------------------------------------------
  // approx_hdr_latency — the HDR-HISTOGRAM quantile sketch (the
  // production latency sketch: hdrhistogram.org / DDSketch's bounded-
  // relative-error idea) next to rel_latency_percentiles' exact tier,
  // with the accuracy ledger that justifies it. Values bucket into
  // log₂ octaves with 8 linear sub-buckets each, all in integer bit
  // arithmetic (msb via length(bin(v)) — the portable-HLL trick):
  // codes 0..15 are exact, code(v≥16) = 8·(msb−3) + 8 + top-3-bits,
  // so the bucket midpoint is within 1/16 relative error of any member.
  // The sketch is a (group, code) counter table — ADDITIVE, so partial
  // aggregation IS sketch merging and a 24/7 stream can keep it warm
  // (approx_hdr_stream drains the identical table). Per group the
  // sketch is ≤ ~8·64 longs at ANY value range; quantile probes walk
  // the cumulative codes (a window over the tiny sketch), and the
  // ledger publishes est vs exact vs err_bp for p50/p90/p99.
  // -------------------------------------------------------------------

  /** HDR code of a non-negative long column (see approx_hdr_latency). */
  def hdrCode(v: String): Column =
    expr(
      s"CASE WHEN $v < 16 THEN $v ELSE " +
        s"(length(bin($v)) - 4) * 8 + 8 + (shiftright($v, CAST(length(bin($v)) - 4 AS INT)) & 7) END"
    )

  /** Midpoint estimate of an HDR code's bucket: codes <16 are exact,
    * otherwise [lb, lb + 2^(m-3)) with lb = (8 + s) << (m-3).
    */
  private def hdrMid(c: String): Column =
    expr(
      s"CASE WHEN $c < 16 THEN $c ELSE " +
        s"shiftleft(8 + ($c - 8) % 8, CAST(($c - 8) DIV 8 AS INT)) + " +
        s"(shiftleft(1L, CAST(($c - 8) DIV 8 AS INT)) - 1) DIV 2 END"
    )

  /** ship-latency days per order priority (shared with the exact tier). */
  private[graft] def shipLatencyDays(spark: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_shipdate"))
      .join(
        Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority")),
        col("o_orderkey") === col("l_orderkey")
      )
      .select(col("o_orderpriority"), datediff(col("l_shipdate"), col("o_orderdate")).cast("long").as("days"))

  /** Finish an HDR sketch table (o_orderpriority, code, cnt) into the
    * p50/p90/p99 est-vs-exact ledger. Shared verbatim by the batch and
    * streaming variants — the reason one oracle verifies both.
    */
  private[graft] def hdrProbe(spark: SparkSession, dir: String, sketch: DataFrame): DataFrame = {
    val wCum = Window
      .partitionBy("o_orderpriority")
      .orderBy(col("code"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = sketch
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy("o_orderpriority")))
      .withColumn("mid", hdrMid("code"))
    val estPicks = Seq(0.5, 0.9, 0.99).map { p =>
      val k = ceil(lit(p) * col("n"))
      max(when(k > col("cum") - col("cnt") && k <= col("cum"), col("mid")))
        .as(s"p${(p * 100).toInt}_est")
    }
    val est = cum.groupBy(col("o_orderpriority")).agg(max(col("n")).as("n"), estPicks: _*)
    val exact = latencyPercentiles(spark, dir)
      .select(
        col("o_orderpriority"),
        col("p50_days").as("p50_exact"),
        col("p90_days").as("p90_exact"),
        col("p99_days").as("p99_exact")
      )
    est
      .join(exact, Seq("o_orderpriority"))
      .select(
        col("o_orderpriority") +: col("n") +: Seq(50, 90, 99).flatMap { p =>
          Seq(
            col(s"p${p}_est"),
            col(s"p${p}_exact"),
            expr(s"abs(p${p}_est - p${p}_exact) * 10000 DIV greatest(p${p}_exact, 1L)")
              .as(s"p${p}_err_bp")
          )
        }: _*
      )
  }

  def hdrLatency(spark: SparkSession, dir: String): DataFrame = {
    val sketch = shipLatencyDays(spark, dir)
      .groupBy(col("o_orderpriority"), hdrCode("days").as("code"))
      .agg(count(lit(1)).as("cnt"))
    hdrProbe(spark, dir, sketch)
  }

  // -------------------------------------------------------------------
  // rel_gap_islands — the GAPS-AND-ISLANDS pattern (the classic
  // streak analysis every warehouse interview and every retention
  // report runs): per customer, maximal runs of CONSECUTIVE active
  // months. The island id is the classic month_id − row_number()
  // constant — one window over the customer's (bounded, calendar-
  // scaled) distinct-month list, never over raw orders. Plan: the
  // corpus-scaled work is ONE partial-aggregable distinct at
  // (customer, month) grain; the window + both aggregates share the
  // customer shuffle. Longest streak ties break to the earliest start.
  // -------------------------------------------------------------------
  def gapIslands(spark: SparkSession, dir: String): DataFrame = {
    val months = Tables
      .orders(spark, dir)
      .select(
        col("o_custkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1).cast("long").as("month_id")
      )
      .distinct()
    val w = Window.partitionBy("o_custkey").orderBy("month_id")
    months
      .withColumn("island", col("month_id") - row_number().over(w))
      .groupBy(col("o_custkey"), col("island"))
      .agg(count(lit(1)).as("len"), min(col("month_id")).as("start_month"))
      .groupBy(col("o_custkey"))
      .agg(
        sum(col("len")).as("n_active_months"),
        count(lit(1)).as("n_islands"),
        max(struct(col("len"), (-col("start_month")).as("ns"))).as("b")
      )
      .select(
        col("o_custkey"),
        col("n_active_months"),
        col("n_islands"),
        col("b.len").as("longest_months"),
        (-col("b.ns")).as("longest_start_month")
      )
  }

  // -------------------------------------------------------------------
  // rel_concentration — REVENUE CONCENTRATION per market (nation):
  // the Herfindahl–Hirschman index and CR-1/CR-3 shares of customer
  // revenue — the dependency-risk read procurement and finance run
  // ("is this market three whales or a long tail"), and the
  // revenue-weighted dual of ts_mix_diversity's count-based index.
  // HHI = Σ shareᵢ² is rational in the raw cents: cross-multiplied to
  // 10⁴·Σrevᵢ²/total², computed on DECIMAL(38,0) so billion-customer
  // markets stay exact. Plan: per-customer revenue is ONE
  // partial-aggregable groupBy on the fact; nation rides a broadcast
  // dim; the rank window and both aggregates share the nation shuffle
  // over the customer-grain rollup (never raw orders).
  // -------------------------------------------------------------------
  def concentration(spark: SparkSession, dir: String): DataFrame = {
    val nat = Tables.nation(spark, dir).select(col("n_nationkey"), col("n_name"))
    val byCust = Tables
      .orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(cents(col("o_totalprice"))).as("rev_c"))
      .join(
        Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey")),
        col("c_custkey") === col("o_custkey")
      )
      .join(broadcast(nat), col("n_nationkey") === col("c_nationkey"))
      .select(col("n_name"), col("o_custkey"), col("rev_c"))
    val w = Window.partitionBy("n_name").orderBy(col("rev_c").desc, col("o_custkey").asc)
    byCust
      .withColumn("rk", row_number().over(w))
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("n_customers"),
        sum(col("rev_c")).as("total_c"),
        sum(when(col("rk") <= 1, col("rev_c")).otherwise(0L)).as("top1_c"),
        sum(when(col("rk") <= 3, col("rev_c")).otherwise(0L)).as("top3_c"),
        sum(expr("CAST(rev_c AS DECIMAL(38,0)) * rev_c")).as("ssq")
      )
      .select(
        col("n_name"),
        col("n_customers"),
        col("total_c"),
        expr("CAST((CAST(top1_c AS DECIMAL(38,0)) * 10000) DIV total_c AS BIGINT)").as("cr1_bp"),
        expr("CAST((CAST(top3_c AS DECIMAL(38,0)) * 10000) DIV total_c AS BIGINT)").as("cr3_bp"),
        expr(
          "CAST((CAST(10000 AS DECIMAL(38,0)) * ssq) DIV (CAST(total_c AS DECIMAL(38,0)) * total_c) AS BIGINT)"
        ).as("hhi_bp")
      )
  }

  /** rel_decile_lift — the DECILE GAINS/LIFT table (the classic
    * campaign-targeting read): per market segment, customers ranked
    * into spend deciles (NTILE 10 with fully deterministic tiebreaks,
    * zero-spend customers in scope — the bottom deciles ARE the
    * point), then each decile's capture of returned-item revenue and
    * its cumulative lift vs random targeting. Capture answers "what
    * share of returns do my top-k deciles reach"; lift is that share
    * over the customer share (100 = random). The windows are all
    * per-segment (the RFM discipline), the lift ratios
    * cross-multiplied in DECIMAL(38,0) so 100 TB cumulative cents
    * never overflow. Scale: two fact aggregates to customer grain, one
    * segment-partitioned rank, then a 10-row-per-segment table.
    */
  def decileLift(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val spend = Tables
      .orders(spark, dir)
      .groupBy($"o_custkey")
      .agg(sum(cents($"o_totalprice")).as("spend_c"))
    val ret = Tables
      .lineitem(spark, dir)
      .filter($"l_returnflag" === "R")
      .join(Tables.orders(spark, dir).select($"o_orderkey", $"o_custkey"), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_custkey")
      .agg(sum(cents($"l_extendedprice")).as("ret_c"))
      .withColumnRenamed("o_custkey", "r_custkey")
    val base = Tables
      .customer(spark, dir)
      .select($"c_custkey", $"c_mktsegment")
      .join(spend, $"c_custkey" === $"o_custkey", "left")
      .join(ret, $"c_custkey" === $"r_custkey", "left")
      .select(
        $"c_mktsegment",
        $"c_custkey",
        coalesce($"spend_c", lit(0L)).as("spend_c"),
        coalesce($"ret_c", lit(0L)).as("ret_c")
      )
    val wRank = Window.partitionBy($"c_mktsegment").orderBy($"spend_c".desc, $"c_custkey".asc)
    val byDecile = base
      .withColumn("decile", ntile(10).over(wRank).cast("long"))
      .groupBy($"c_mktsegment", $"decile")
      .agg(count(lit(1)).as("n_cust"), sum($"spend_c").as("spend_c"), sum($"ret_c").as("ret_c"))
    val wCum = Window.partitionBy($"c_mktsegment").orderBy($"decile").rowsBetween(Window.unboundedPreceding, 0)
    val wSeg = Window.partitionBy($"c_mktsegment")
    byDecile
      .withColumn("cum_cust", sum($"n_cust").over(wCum))
      .withColumn("cum_ret", sum($"ret_c").over(wCum))
      .withColumn("seg_cust", sum($"n_cust").over(wSeg))
      .withColumn("seg_ret", sum($"ret_c").over(wSeg))
      .select(
        $"c_mktsegment",
        $"decile",
        $"n_cust",
        $"spend_c",
        $"ret_c",
        expr("CAST((CAST(cum_ret AS DECIMAL(38,0)) * 10000) DIV greatest(seg_ret, 1L) AS BIGINT)")
          .as("capture_bp"),
        expr(
          "CAST((CAST(cum_ret AS DECIMAL(38,0)) * seg_cust * 100) DIV greatest(CAST(seg_ret AS DECIMAL(38,0)) * cum_cust, 1) AS BIGINT)"
        ).as("lift_centi")
      )
  }

  /** rel_attribution — LAST-TOUCH marketing attribution over the
    * event stream: each purchase credits its full value to the
    * nearest PRECEDING non-purchase touchpoint of the same user
    * (strictly before — the purchase row itself never self-credits),
    * `direct` when no touch exists. The per-user scan is one
    * window pass (last-ignoring-nulls over an unbounded-preceding
    * frame, the standard sessionless attribution shape); the report
    * is a bounded-key groupBy over the event-type enum with shares in
    * basis points off the ≤5-row aggregate (the one unpartitioned
    * window, a bounded domain). Scale: attribution work partitions by
    * user — the axis that grows at 100 TB — and nothing downstream
    * sees raw-event grain.
    */
  def attribution(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables
      .events(spark, dir)
      .select(
        $"user_id",
        expr("ts DIV 1000").as("ts_us"),
        $"event_id",
        $"event_type",
        cents($"value").as("v_c")
      )
    val wPrev = Window
      .partitionBy($"user_id")
      .orderBy($"ts_us".asc, $"event_id".asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val credited = e
      .withColumn(
        "touch",
        last(when($"event_type" =!= "purchase", $"event_type"), ignoreNulls = true).over(wPrev)
      )
      .filter($"event_type" === "purchase")
      .select(coalesce($"touch", lit("direct")).as("channel"), $"v_c")
      .groupBy($"channel")
      .agg(count(lit(1)).as("n_purchases"), sum($"v_c").as("credited_c"))
    credited
      .withColumn(
        "share_bp",
        expr("CAST((CAST(credited_c AS DECIMAL(38,0)) * 10000) DIV greatest(SUM(credited_c) OVER (), 1L) AS BIGINT)")
      )
  }
}
