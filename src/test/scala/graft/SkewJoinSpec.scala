package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SkewJoin

class SkewJoinSpec extends AnyFunSuite {
  import TestSpark._

  test("salted join returns exactly the plain join result") {
    val events = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_id"), col("user_id"), col("event_type"))
    val dim = spark.read.parquet(s"$sf/events.parquet")
      .select(col("user_id")).distinct()
      .withColumn("user_tag", concat(lit("u"), col("user_id")))

    val plain = events.join(dim, Seq("user_id"))
    val salted = SkewJoin.saltedJoin(events, dim, "user_id", Seq(col("event_id")), nSalts = 8)

    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("AQE splits the hot-key partition (skew=true in the finalized plan)") {
    // the unsalted path: a runtime-skewed shuffle join must come out of
    // AQE with the skewed partition split. Thresholds are lowered to
    // make the 1k-row fixture register as skewed; the assertion is on
    // the FINAL adaptive plan, after materialization.
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor"
    )
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      import spark.implicits._
      val fact = spark.read
        .parquet(s"$sf/events.parquet")
        // one small file = one map task, and AQE can only split a skewed
        // reduce partition on MAPPER boundaries — spread the map side first
        .repartition(8, col("event_id"))
        .select(
          when(col("user_id") % 10 =!= 0, lit(0L)).otherwise(col("user_id")).as("k"),
          col("event_id")
        )
      val dim = (0 until 15).map(i => (i.toLong, s"u$i")).toDF("k", "user_tag")
      val joined = fact.join(dim, Seq("k"))
      joined.collect() // materialize THIS frame — count() would plan a separate query
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"AQE did not split the hot partition:\n$plan")
    } finally saved.foreach { case (k, v) => v.fold(conf.unset(k))(conf.set(k, _)) }
  }

  test("salt values actually spread (more than one distinct salt)") {
    val events = spark.read.parquet(s"$sf/events.parquet")
    val n = events
      .withColumn("s", pmod(hash(col("event_id")), lit(8)))
      .select(countDistinct(col("s")))
      .head()
      .getLong(0)
    assert(n === 8L)
  }

  test("key skew profile: bands conserve the fact, hottest key is the true argmax") {
    val df = graft.operators.Relational.keySkewProfile(spark, sf).cache()
    try {
      val rows = df.collect()
      assert(rows.nonEmpty)
      val li = graft.sources.Tables.lineitem(spark, sf)
      assert(rows.map(_.getAs[Long]("n_rows")).sum === li.count(), "band row mass must conserve the fact")
      // hottest key columns repeat on every row; check against truth
      val truth = li
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("f"))
        .orderBy(col("f").desc, col("l_orderkey").desc)
        .limit(1)
        .head()
      assert(rows.forall(_.getAs[Long]("hottest_key") === truth.getLong(0)))
      assert(rows.forall(_.getAs[Long]("hottest_rows") === truth.getLong(1)))
      for (r <- rows)
        assert(r.getAs[Long]("freq_lo") === (1L << r.getAs[Long]("freq_band").toInt))
    } finally df.unpersist()
  }

  test("join size estimate: one-sided over exact, exact matches brute sum(f^2), est is the row min") {
    val df   = graft.operators.Relational.joinSizeEstimate(spark, sf).cache()
    try {
      val rows = df.collect()
      assert(rows.length === 8, "2 joins x 4 sketch rows")
      // CMS inner product is a one-sided overestimate: collisions only add
      assert(rows.forall(r => r.getAs[Long]("est_rows") >= r.getAs[Long]("exact_rows")))
      assert(rows.forall(r => r.getAs[Long]("ip") >= r.getAs[Long]("est_rows")))
      val estByJoin = rows.groupBy(_.getAs[String]("join_name"))
      for ((_, rs) <- estByJoin)
        assert(rs.map(_.getAs[Long]("ip")).min === rs.head.getAs[Long]("est_rows"))
      val li = graft.sources.Tables.lineitem(spark, sf)
      val truth = li
        .groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("f"))
        .select(sum(col("f") * col("f")))
        .head()
        .getLong(0)
      assert(rows.filter(_.getAs[String]("join_name") == "li_partkey_self").forall(_.getAs[Long]("exact_rows") === truth))
    } finally df.unpersist()
  }

  test("zorder layout: row mass conserves, scans cover matches, zorder bounds both dimensions") {
    val df = graft.operators.Relational.zorderLayout(spark, sf).cache()
    try {
      val rows = df.collect()
      assert(rows.length === 9, "3 layouts x 3 boxes")
      val byKey = rows.map(r => (r.getAs[String]("layout"), r.getAs[String]("box")) -> r).toMap
      val total = byKey(("natural", "both")).getAs[Long]("rows_total")
      // every (layout, box) sees the same fact and never scans less than it matches
      for (r <- rows) {
        assert(r.getAs[Long]("rows_total") === total)
        assert(r.getAs[Long]("rows_scanned") >= r.getAs[Long]("rows_matched"))
        assert(r.getAs[Long]("rows_scanned") <= total)
      }
      // matched counts depend only on the box, not the layout
      for (box <- Seq("d_range", "pk_range", "both"))
        assert(
          Seq("natural", "sorted", "zorder").map(l => byKey((l, box)).getAs[Long]("rows_matched")).distinct.size === 1
        )
      // the layout story: sorted wins its own dimension but degrades to a
      // (near-)full scan on the pk box; zorder skips on BOTH boxes
      val sortedPk = byKey(("sorted", "pk_range")).getAs[Long]("rows_scanned")
      val zorderPk = byKey(("zorder", "pk_range")).getAs[Long]("rows_scanned")
      val zorderD  = byKey(("zorder", "d_range")).getAs[Long]("rows_scanned")
      assert(zorderPk < sortedPk, "zorder must skip where the single-column sort cannot")
      assert(zorderD < total, "zorder must also skip on the date box")
      assert(byKey(("sorted", "d_range")).getAs[Long]("rows_scanned") < total)
    } finally df.unpersist()
  }

  test("compaction plan: groups contiguous and order-preserving, mass conserved, overflow < one file") {
    val target = 262144L
    val df     = graft.operators.Relational.compactionPlan(spark, sf).cache()
    try {
      val groups = df.collect().sortBy(_.getAs[Long]("group_id"))
      assert(groups.length > 1, "the drill needs more than one rewrite group")
      // file ranges are contiguous and strictly ordered across groups
      for (Array(a, b) <- groups.sliding(2))
        assert(a.getAs[Long]("file_hi") < b.getAs[Long]("file_lo"))
      // byte/row/file mass conserves vs the file table
      val li = graft.sources.Tables.lineitem(spark, sf)
      val totalRows = li.count()
      assert(groups.map(_.getAs[Long]("n_rows")).sum === totalRows)
      // a group exceeds the target only by less than its last file's
      // size; every group except possibly the last is at least full
      // enough that the NEXT file would have started a new group
      for (g <- groups) {
        assert(g.getAs[Long]("fill_bp") === g.getAs[Long]("bytes") * 10000L / target)
        assert(g.getAs[Long]("n_files") >= 1L)
      }
      val allButLast = groups.dropRight(1)
      assert(allButLast.forall(_.getAs[Long]("bytes") > 0L))
    } finally df.unpersist()
  }

  test("salt plan: exactly the planted hot key, factor splits it back to mean slices") {
    val rows = graft.operators.Relational.saltPlan(spark, sf).collect()
    assert(rows.length === 1, "the drill plants exactly one hot key (the null-user bucket)")
    val r = rows.head
    assert(r.getAs[Long]("k") === 0L)
    assert(r.getAs[Long]("share_bp") > 8000L, "the hot key holds ~90% of the fact")
    val (f, factor) = (r.getAs[Long]("f"), r.getAs[Long]("salt_factor"))
    assert(factor >= 2L)
    // factor slices are mean-sized: f/factor is within one mean of the target
    val events = graft.sources.Tables.events(spark, sf).count()
    val nKeys = graft.sources.Tables.events(spark, sf)
      .selectExpr("CASE WHEN user_id % 10 != 0 THEN 0 ELSE user_id END AS k").distinct().count()
    val target = math.max(events / nKeys, 1L)
    assert(factor === (f + target - 1L) / target)
  }

  test("latency percentiles: ranks bounded, monotone across the p ladder") {
    val rows = graft.operators.Relational.latencyPercentiles(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (p50, p90, p99) =
        (r.getAs[Long]("p50_days"), r.getAs[Long]("p90_days"), r.getAs[Long]("p99_days"))
      assert(p50 <= p90 && p90 <= p99, "percentile ladder must be monotone")
      assert(r.getAs[Long]("n") > 0L)
    }
  }

  test("max concurrency: hand-built overlap pattern lands peak and first peak day") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_conc").toString
    def d(day: Int) = java.sql.Timestamp.valueOf(f"1992-01-${day + 1}%02d 00:00:00")
    // supplier 1: intervals [0,2],[1,3],[2,2] -> open(0)=1 open(1)=2
    // open(2)=3 (peak, day 2) open(3)=2; supplier 2: disjoint [0,0],[2,2]
    Seq(
      (10L, 1L, d(2)), (11L, 1L, d(3)), (12L, 1L, d(2)),
      (20L, 2L, d(0)), (21L, 2L, d(2))
    ).toDF("l_orderkey", "l_suppkey", "l_shipdate").write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq(
      (10L, d(0)), (11L, d(1)), (12L, d(2)),
      (20L, d(0)), (21L, d(2))
    ).toDF("o_orderkey", "o_orderdate").write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = graft.operators.Relational.maxConcurrency(spark, dir).collect()
      .map(r => r.getAs[Long]("l_suppkey") -> ((r.getAs[Long]("n_intervals"), r.getAs[Long]("max_open"), r.getAs[Long]("peak_day")))).toMap
    assert(out === Map(1L -> ((3L, 3L, 2L)), 2L -> ((2L, 1L, 0L))))
  }

  test("interval union: hand-built overlap pattern lands coverage, segments, longest run") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_iu").toString
    def d(day: Int) = java.sql.Timestamp.valueOf(f"1992-01-${day + 1}%02d 00:00:00")
    // supplier 1: [0,3),[1,4),[2,3) -> union [0,4): covered 4, 1 segment
    // supplier 2: [0,1),[2,3) -> covered 2, 2 segments, span 3
    Seq(
      (10L, 1L, d(2)), (11L, 1L, d(3)), (12L, 1L, d(2)),
      (20L, 2L, d(0)), (21L, 2L, d(2))
    ).toDF("l_orderkey", "l_suppkey", "l_shipdate").write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq(
      (10L, d(0)), (11L, d(1)), (12L, d(2)),
      (20L, d(0)), (21L, d(2))
    ).toDF("o_orderkey", "o_orderdate").write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = graft.operators.Relational
      .intervalUnion(spark, dir)
      .collect()
      .map(r =>
        r.getAs[Long]("l_suppkey") -> ((r.getAs[Long]("n_intervals"), r.getAs[Long]("n_segments"),
          r.getAs[Long]("covered_days"), r.getAs[Long]("longest_days"), r.getAs[Long]("span_days"),
          r.getAs[Long]("util_bp")))
      )
      .toMap
    assert(out === Map(1L -> ((3L, 1L, 4L, 4L, 4L, 10000L)), 2L -> ((2L, 2L, 2L, 1L, 3L, 6666L))))
    // structural invariants on the real corpus
    val sfRows = graft.operators.Relational.intervalUnion(spark, sf).collect()
    assert(sfRows.nonEmpty)
    for (r <- sfRows) {
      assert(r.getAs[Long]("covered_days") <= r.getAs[Long]("span_days"))
      assert(r.getAs[Long]("longest_days") <= r.getAs[Long]("covered_days"))
      assert(r.getAs[Long]("n_segments") >= 1L && r.getAs[Long]("n_segments") <= r.getAs[Long]("n_intervals"))
      assert(r.getAs[Long]("util_bp") >= 1L && r.getAs[Long]("util_bp") <= 10000L)
    }
  }
}
