package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational

/** Accuracy bounds for the sketch-based scale paths (no SQL oracle —
  * approximate results are engine-specific by construction).
  */
class ApproxSpec extends AnyFunSuite {
  import TestSpark._

  test("HLL distinct counts are within 5% of exact per group") {
    val exact = Relational.groupDistinct(spark, sf).select(col("event_type"), col("n_users"))
    val approx = Relational.groupDistinctApprox(spark, sf).select(col("event_type"), col("n_users_approx"))
    val joined = exact.join(approx, "event_type").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val e = r.getAs[Long]("n_users")
      val a = r.getAs[Long]("n_users_approx")
      assert(math.abs(a - e).toDouble / e <= 0.05, s"${r.getAs[String]("event_type")}: exact=$e approx=$a")
    }
  }

  test("portable HLL: registers bounded, estimate within the raw-HLL envelope") {
    val rows = Relational.approxHllUsers(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (nHit, sumInv, est, exact, errBp) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(nHit >= 1 && nHit <= 64)
      // sum_inv in (0, m·2^27]: empty registers contribute 2^27 each
      assert(sumInv > 0 && sumInv <= 64L * (1L << 27))
      assert(est > 0)
      // raw HLL (no linear-counting branch): generous envelope, and the
      // reported error must BE the |est−exact| ratio
      assert(errBp === math.abs(est - exact) * 10000 / exact)
      // linear counting handles the small range; 20% envelope
      assert(errBp <= 2000, s"estimate $est vs exact $exact drifted past 20%")
    }
  }

  test("KMV setops: sketch algebra consistent, estimates within the k=128 envelope") {
    val rows = Relational.kmvSetops(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val exactU = r.getAs[Long]("exact_union"); val estU = r.getAs[Long]("est_union")
      val exactI = r.getAs[Long]("exact_inter"); val estI = r.getAs[Long]("est_inter")
      val exactA = r.getAs[Long]("exact_a"); val exactB = r.getAs[Long]("exact_b")
      assert(estI <= estU, "intersection estimate exceeds union estimate")
      assert(exactI <= math.min(exactA, exactB) && exactU >= math.max(exactA, exactB))
      // k=128 → σ ≈ 1/√128 ≈ 8.8%; 35% is a > 3σ envelope
      assert(math.abs(estU - exactU).toDouble / exactU <= 0.35, s"union est $estU vs $exactU")
      // the inclusion ratio compounds both variances; bound only when
      // the intersection is big enough for a relative bound to mean anything
      if (exactI > 50) assert(math.abs(estI - exactI).toDouble / exactI <= 0.5, s"inter est $estI vs $exactI")
    }
  }

  test("bloom join prune: funnel monotone, no true match pruned, FP books balance") {
    val r = Relational.bloomJoinPrune(spark, sf).head()
    val (nK, nR) = (r.getAs[Long]("n_keys"), r.getAs[Long]("n_rows"))
    val (kPass, rPass) = (r.getAs[Long]("n_keys_pass"), r.getAs[Long]("n_rows_pass"))
    val (kTrue, rTrue) = (r.getAs[Long]("n_keys_true"), r.getAs[Long]("n_rows_true"))
    assert(nK > 0 && nR >= nK)
    // no false negatives: a true-match key always passes its own bits
    assert(kTrue <= kPass && kPass <= nK)
    assert(rTrue <= rPass && rPass <= nR)
    assert(r.getAs[Long]("n_keys_fp") === kPass - kTrue)
    assert(r.getAs[Long]("pruned_rows_bp") === (nR - rPass) * 10000 / nR)
  }

  test("khop: depth 0 is a single root, frontiers disjoint, reach bounded by |V|") {
    val rows = Relational.kHop(spark, sf).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows(0L) === 1L, "depth 0 must be exactly the root")
    assert(rows.keys.forall(d => d >= 0 && d <= 3))
    // frontiers are disjoint by construction (anti-join vs visited),
    // so their sum is the reached-node count and cannot exceed |V|
    val nV = graft.sources.Tables
      .lineitem(spark, sf)
      .select(col("l_partkey"))
      .distinct()
      .count()
    assert(rows.values.sum <= nV)
    assert(rows.getOrElse(1L, 0L) > 0, "max-degree root has no neighbors — graph degenerate")
  }

  test("mv delta: maintained view equals the full recompute on every nation") {
    val rows = Relational.mvDelta(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getAs[Long]("maintained_c") === r.getAs[Long]("mv_c") + r.getAs[Long]("delta_c"))
      assert(r.getAs[Boolean]("matches"), s"nation ${r.getString(0)}: mv+delta != full recompute")
    }
    // the late partition is non-empty at this SF, so the delta tier
    // must actually carry revenue (the incremental path isn't dead)
    assert(rows.map(_.getAs[Long]("delta_c")).sum > 0)
  }

  test("common neighbors: predictions are non-edges, scores lawful, ranking dense") {
    import spark.implicits._
    val df = Relational.commonNeighbors(spark, sf).cache()
    try {
      val rows = df.collect()
      assert(rows.nonEmpty, "no link predictions at this SF — degenerate graph")
      assert(rows.map(_.getAs[Long]("rnk")).toSeq === (1L to rows.length))
      assert(rows.forall(r => r.getAs[Long]("cn") >= 1L))
      assert(rows.forall(r => r.getAs[Long]("jaccard_bp") <= 10000L))
      // a predicted pair must NOT be an existing co-purchase edge
      val li = graft.sources.Tables.lineitem(spark, sf).select($"l_orderkey", $"l_partkey").distinct()
      val e = li
        .join(li.select($"l_orderkey".as("ok"), $"l_partkey".as("pb")), $"ok" === $"l_orderkey" && $"l_partkey" =!= $"pb")
        .select($"l_partkey".as("node_a"), $"pb".as("node_b"))
        .distinct()
      assert(df.select($"node_a", $"node_b").join(e, Seq("node_a", "node_b")).count() === 0,
        "an existing edge leaked into the prediction list")
    } finally df.unpersist()
  }

  test("hdr code: monotone in the value, bucket midpoint within the 1/8 relative bound") {
    // pin the bit arithmetic on a dense value sweep: codes must be
    // monotone non-decreasing and every bucket's midpoint within
    // ceil(lb/8) of any member (codes < 16 are exact)
    val vals = spark.range(0L, 5000L).toDF("days")
    val coded = vals
      .select(col("days"), Relational.hdrCode("days").as("code"))
      .collect()
      .sortBy(_.getAs[Long]("days"))
    val codes = coded.map(_.getAs[Long]("code"))
    assert(codes.zip(codes.tail).forall { case (a, b) => a <= b }, "hdr code not monotone")
    for (r <- coded) {
      val (v, c) = (r.getAs[Long]("days"), r.getAs[Long]("code"))
      if (v < 16) assert(c === v)
      else {
        val m = 63 - java.lang.Long.numberOfLeadingZeros(v)
        assert(c === (m - 3).toLong * 8 + 8 + ((v >> (m - 3)) & 7))
        val lb = (8 + (c - 8) % 8) << ((c - 8) / 8).toInt
        val width = 1L << ((c - 8) / 8).toInt
        assert(v >= lb && v < lb + width, s"value $v outside bucket [$lb, ${lb + width})")
      }
    }
  }

  test("hdr latency: estimates within the sketch's relative-error bound of the exact tier") {
    val rows = Relational.hdrLatency(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows; p <- Seq(50, 90, 99)) {
      val est = r.getAs[Long](s"p${p}_est")
      val exact = r.getAs[Long](s"p${p}_exact")
      val err = r.getAs[Long](s"p${p}_err_bp")
      // the ledger IS the |est−exact| ratio
      assert(err === math.abs(est - exact) * 10000L / math.max(exact, 1L))
      // midpoint of a 1/8-relative bucket: ≤ 1/16 of the lower bound
      // plus integer rounding — 1300 bp is the structural ceiling
      assert(err <= 1300L, s"p$p est $est vs exact $exact: $err bp blows the HDR bound")
    }
    // quantiles monotone within each tier
    for (r <- rows) {
      assert(r.getAs[Long]("p50_est") <= r.getAs[Long]("p90_est"))
      assert(r.getAs[Long]("p90_est") <= r.getAs[Long]("p99_est"))
      assert(r.getAs[Long]("p50_exact") <= r.getAs[Long]("p90_exact"))
      assert(r.getAs[Long]("p90_exact") <= r.getAs[Long]("p99_exact"))
    }
  }
}
