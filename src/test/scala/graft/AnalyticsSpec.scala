package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{TextAnalysis, TimeSeries}

class AnalyticsSpec extends AnyFunSuite {
  import TestSpark._

  test("funnel: steps are ordered and counted consistently") {
    val df = TimeSeries.funnel(spark, sf).cache()
    try {
      // a completed step implies the previous step completed earlier
      assert(df.filter(col("click_us") =!= -1 && col("view_us") === -1).count() === 0)
      assert(df.filter(col("purchase_us") =!= -1 && col("click_us") === -1).count() === 0)
      assert(df.filter(col("click_us") =!= -1 && col("click_us") <= col("view_us")).count() === 0)
      assert(df.filter(col("purchase_us") =!= -1 && col("purchase_us") <= col("click_us")).count() === 0)
      // steps_completed matches the populated timestamps
      val recount = when(col("view_us") =!= -1, 1L).otherwise(0L) +
        when(col("click_us") =!= -1, 1L).otherwise(0L) +
        when(col("purchase_us") =!= -1, 1L).otherwise(0L)
      assert(df.filter(col("steps_completed") =!= recount).count() === 0)
    } finally df.unpersist()
  }

  test("anomaly: flagged points really exceed 3 sigma of their trailing window") {
    val df = TimeSeries.anomalyZscore(spark, sf)
    // sanity: flags are rare (< 10% of scored points) but the op runs
    val total = df.count()
    val flagged = df.filter(col("is_anomaly") === 1).count()
    assert(total > 0)
    assert(flagged < total / 10, s"$flagged/$total flagged — threshold logic suspect")
  }

  test("stratified sample: per-stratum keep rates land near their targets") {
    val lang = TextAnalysis.langId(spark, sf).groupBy(col("pred_lang")).agg(count(lit(1)).as("n_all"))
    val kept = TextAnalysis
      .stratifiedSample(spark, sf)
      .groupBy(col("pred_lang"))
      .agg(count(lit(1)).as("n_kept"))
    val rates = Map("en" -> 0.50, "es" -> 0.301, "de" -> 0.199, "fr" -> 0.102)
    lang.join(kept, Seq("pred_lang"), "left").collect().foreach { r =>
      val all = r.getAs[Long]("n_all")
      val k = Option(r.get(r.fieldIndex("n_kept"))).map(_.asInstanceOf[Long]).getOrElse(0L)
      val target = rates(r.getAs[String]("pred_lang"))
      if (all >= 50) { // only strata big enough for the rate to stabilize
        val rate = k.toDouble / all
        assert(math.abs(rate - target) < 0.2, s"${r.getAs[String]("pred_lang")}: $k/$all vs $target")
      }
    }
  }

  test("stratified sample is idempotent (same sample every run)") {
    val a = TextAnalysis.stratifiedSample(spark, sf)
    val b = TextAnalysis.stratifiedSample(spark, sf)
    assert(a.exceptAll(b).count() === 0)
    assert(b.exceptAll(a).count() === 0)
  }

  test("pivot: per-flag columns re-sum to the unpivoted revenue total") {
    import graft.operators.Relational
    val piv = Relational
      .pivotReturnflag(spark, sf)
      .agg(sum(col("rev_a_c") + col("rev_n_c") + col("rev_r_c")).as("t"))
      .head()
      .getLong(0)
    val flat = spark.read
      .parquet(s"$sf/lineitem.parquet")
      .agg(sum(expr("CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)")))
      .head()
      .getLong(0)
    assert(piv === flat, "pivoted cells lost or double-counted revenue")
  }

  test("grouping sets: both marginals and the grand total agree") {
    import graft.operators.Relational
    val df = Relational.groupingSetsReport(spark, sf).cache()
    try {
      val grand = df.filter(col("set_id") === 3L).select(col("revenue_c"), col("n")).head()
      for (sid <- Seq(1L, 2L)) {
        val m = df.filter(col("set_id") === sid).agg(sum(col("revenue_c")), sum(col("n"))).head()
        assert(m.getLong(0) === grand.getLong(0) && m.getLong(1) === grand.getLong(1),
          s"marginal set $sid does not re-aggregate to the grand total")
      }
      // exactly the requested sets: two marginals + one grand total, no cross cells
      assert(df.filter(col("set_id") === 0L).count() === 0, "unexpected (flag,status) cross cells")
    } finally df.unpersist()
  }

  test("profile: per-column accounting is internally consistent") {
    import graft.operators.Relational
    val rows = Relational.profile(spark, sf).collect()
    assert(rows.length === 6)
    val nRows = rows.map(_.getLong(1)).distinct
    assert(nRows.length === 1, s"column row counts disagree: ${nRows.mkString(",")}")
    for (r <- rows) {
      val (n, nNull, nDist) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nDist <= n - nNull && nDist >= (if (n > nNull) 1L else 0L))
      assert(r.getString(4) <= r.getString(5), s"${r.getString(0)}: min > max")
    }
    // the key column is unique
    val key = rows.find(_.getString(0) == "o_orderkey").get
    assert(key.getLong(3) === key.getLong(1) - key.getLong(2), "o_orderkey not distinct per row")
  }

  test("histogram equi: deciles complete, cumulative walk monotone, last decile closes the table") {
    import graft.operators.Relational
    val rows = Relational.histogramEqui(spark, sf).collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toList === (1L to 10L).toList, "missing or duplicate deciles")
    val total = rows.head.getLong(4)
    assert(rows.forall(_.getLong(4) === total))
    // cum is non-decreasing in decile order and each decile's cum covers ceil(d*N/10)
    val cums = rows.map(_.getLong(3))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
    for (r <- rows) {
      val (d, cum) = (r.getLong(0), r.getLong(3))
      assert(cum * 10 >= d * total, s"decile $d: cum $cum below rank")
    }
    assert(rows.last.getLong(3) === total, "decile 10 must close at the full count")
  }

  test("fk audit: clean TPC-H legs hold, the violating leg actually detects orphans") {
    import graft.operators.Relational
    val rows = Relational.fkAudit(spark, sf).collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet === Set("orders_customer", "lineitem_orders", "lineitem_part", "negative_control"))
    for (leg <- Seq("orders_customer", "lineitem_orders", "lineitem_part"))
      assert(rows(leg).getLong(2) === 0L, s"$leg reports orphans on referentially-clean data")
    val nc = rows("negative_control")
    assert(nc.getLong(2) > 0L, "the injected fault (withheld customer keys) went undetected")
    assert(nc.getLong(3) <= nc.getLong(2), "distinct orphan keys exceed orphan rows")
  }

  test("kcore: peel trace is monotone non-increasing and self-consistent") {
    val rows = graft.operators.Relational.kCore(spark, sf).collect().sortBy(_.getAs[Long]("round"))
    assert(rows.map(_.getAs[Long]("round")).toSeq === Seq(1L, 2L, 3L, 4L))
    val kept  = rows.map(_.getAs[Long]("n_kept"))
    val edges = rows.map(_.getAs[Long]("n_edges_directed"))
    assert(kept.toSeq === kept.sorted.reverse.toSeq, "survivors grew during a peel")
    assert(edges.toSeq === edges.sorted.reverse.toSeq, "edges grew during a peel")
    for (r <- rows; if r.getAs[Long]("n_kept") > 0L) {
      assert(r.getAs[Long]("min_deg") >= 3L, "a survivor had degree below k")
      assert(r.getAs[Long]("max_deg") >= r.getAs[Long]("min_deg"))
    }
  }

  test("unpivot: melt(pivot(x)) recovers the direct long-form aggregate exactly") {
    import spark.implicits._
    val melted = graft.operators.Relational.unpivotReturnflag(spark, sf)
    val direct = graft.sources.Tables
      .lineitem(spark, sf)
      .select(
        (year($"l_shipdate") * 100 + month($"l_shipdate")).cast("long").as("ship_month"),
        $"l_returnflag",
        graft.functions.FixedPoint.cents($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("rc")
      )
      .groupBy($"ship_month", $"l_returnflag")
      .agg(sum($"rc").as("rev_c"))
      .filter($"rev_c" =!= 0L)
    assert(melted.exceptAll(direct).count() === 0, "melted rows not in the direct aggregate")
    assert(direct.exceptAll(melted).count() === 0, "direct rows missing from the melt")
  }

  test("forecast eval: winner verdict is exactly the MAE comparison") {
    import graft.operators.TimeSeries
    val rows = TimeSeries.forecastEval(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (snaive, holt, winner) = (r.getLong(1), r.getLong(2), r.getString(3))
      assert(winner === (if (holt < snaive) "holt" else "snaive"), s"series ${r.getLong(0)}")
    }
  }

  test("gap islands: books reconcile per customer, one replayed streak matches") {
    import graft.operators.Relational
    val rows = Relational.gapIslands(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (act, isl, long) =
        (r.getAs[Long]("n_active_months"), r.getAs[Long]("n_islands"), r.getAs[Long]("longest_months"))
      assert(isl >= 1L && isl <= act, "island count must partition the active months")
      assert(long >= 1L && long <= act)
      // islands partition the months: at least ceil(act / islands) in the longest
      assert(long * isl >= act, "longest streak below the pigeonhole floor")
    }
    // independent replay for the smallest customer key
    val ck = rows.map(_.getAs[Long]("o_custkey")).min
    val months = graft.sources.Tables
      .orders(spark, sf)
      .filter(col("o_custkey") === ck)
      .select((year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1).cast("long").as("m"))
      .distinct()
      .collect()
      .map(_.getLong(0))
      .sorted
    val streaks = months
      .foldLeft(List.empty[(Long, Long)]) { // (start, len) runs
        case (Nil, m)                                   => List((m, 1L))
        case ((s, l) :: t, m) if m == s + l             => (s, l + 1L) :: t
        case (acc, m)                                   => (m, 1L) :: acc
      }
    val got = rows.find(_.getAs[Long]("o_custkey") == ck).get
    assert(got.getAs[Long]("n_active_months") === months.length.toLong)
    assert(got.getAs[Long]("n_islands") === streaks.length.toLong)
    val best = streaks.sortBy { case (s, l) => (-l, s) }.head
    assert(got.getAs[Long]("longest_months") === best._2)
    assert(got.getAs[Long]("longest_start_month") === best._1)
  }

  test("concentration: shares nested and lawful, HHI between uniform floor and monopoly") {
    import graft.operators.Relational
    val rows = Relational.concentration(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (n, cr1, cr3, hhi) =
        (r.getAs[Long]("n_customers"), r.getAs[Long]("cr1_bp"), r.getAs[Long]("cr3_bp"), r.getAs[Long]("hhi_bp"))
      assert(n >= 1L && r.getAs[Long]("total_c") > 0L)
      assert(cr1 >= 1L && cr1 <= cr3 && cr3 <= 10000L, "CR shares must nest")
      // top share at least 1/n; HHI in [uniform 1/n, monopoly 1]
      assert(cr1 * n >= 10000L - n)
      assert(hhi * n >= 10000L - n, s"HHI $hhi below the uniform floor at n=$n")
      assert(hhi <= 10000L)
      // Σshare² dominates the top share squared (integer slack for the
      // two truncations)
      assert(hhi + 2L >= cr1 * cr1 / 10000L, s"HHI $hhi vs CR1 $cr1 inconsistent")
      if (n === 1L) assert(cr1 === 10000L && hhi === 10000L)
    }
  }

  test("backtest horizon: all horizons present, MAE books exact, support bounded by h=0 grid") {
    val rows = TimeSeries.backtestHorizon(spark, sf).collect().sortBy(_.getAs[Long]("h"))
    assert(rows.map(_.getAs[Long]("h")).toSeq === (1L to 6L))
    val nHours = TimeSeries
      .eventsUs(spark, sf)
      .select(col("user_id"), expr("ts_us DIV 3600000000L").as("hh"))
      .distinct()
      .count()
    for (r <- rows) {
      val (n, sae, mae) = (r.getAs[Long]("n_pairs"), r.getAs[Long]("sae_c"), r.getAs[Long]("mae_milli_c"))
      assert(n > 0L && n < nHours, "every horizon must lose at least one pair per series")
      assert(sae >= 0L)
      assert(mae === sae * 1000L / n)
    }
  }
}
