package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Relational, TimeSeries}

/** Plan-shape regression guards: the properties that make these
  * operators scale are asserted, not just claimed in comments.
  */
class PlanSpec extends AnyFunSuite {
  import TestSpark._

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("range read pushes time+type predicates and prunes columns at the scan") {
    val scan = TimeSeries
      .rangeRead(spark, sf)
      .queryExecution
      .executedPlan
      .collect { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
      .head
    val pushed = scan.metadata("PushedFilters")
    assert(pushed.contains("GreaterThanOrEqual(ts"), s"time lower bound not pushed: $pushed")
    assert(pushed.contains("LessThan(ts"), s"time upper bound not pushed: $pushed")
    assert(pushed.contains("EqualTo(event_type,click)"), s"tag predicate not pushed: $pushed")
    val readCols = scan.requiredSchema.fieldNames.toSet
    assert(readCols === Set("event_id", "ts", "user_id", "event_type", "value"), s"column pruning broken: $readCols")
  }

  test("q5 broadcasts every dimension and scans lineitem exactly once") {
    val plan = planOf(Relational.regionRevenue(spark, sf))
    assert("lineitem\\.parquet".r.findAllIn(plan).size >= 1)
    assert(plan.contains("BroadcastHashJoin"), "dims not broadcast")
    assert(!plan.contains("SortMergeJoin"), "unexpected shuffle join of a dimension")
    assert(!plan.contains("CartesianProduct"))
  }

  test("as-of join is one shuffle (no range join, no cartesian)") {
    val plan = planOf(TimeSeries.asofJoin(spark, sf))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected exactly 1 shuffle, saw $exchanges:\n$plan")
  }

  test("moving aggregate is one shuffle on the series key") {
    val plan = planOf(TimeSeries.movingAgg(spark, sf))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected exactly 1 shuffle, saw $exchanges")
  }

  test("funnel is one shuffle on the user key — no per-user broadcast") {
    val plan = planOf(TimeSeries.funnel(spark, sf))
    // the scale-killer shape is a BroadcastExchange whose build side is a
    // per-user aggregate: at 10^9 users that broadcast OOMs the driver
    assert(!plan.contains("BroadcastExchange"), s"per-user table broadcast resurfaced:\n$plan")
    assert(!plan.contains("Join"), s"funnel should be window+agg, not self-joins:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected exactly 1 shuffle, saw $exchanges:\n$plan")
  }

  test("rate-increase and gap-stats are one shuffle on the series key") {
    for (
      df <- Seq(
        TimeSeries.rateIncrease(spark, sf),
        TimeSeries.gapStats(spark, sf),
        TimeSeries.downsampleM4(spark, sf)
      )
    ) {
      val plan = planOf(df)
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges === 1, s"expected exactly 1 shuffle, saw $exchanges:\n$plan")
    }
  }

  test("q18 aggregates the fact BEFORE any join (group-filter, then enrich)") {
    val exec = Relational.largeOrders(spark, sf).queryExecution.sparkPlan
    val joins = exec.collect { case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j }
    assert(joins.nonEmpty)
    // the lineitem aggregate must sit BELOW the joins: joining the raw
    // fact first would drag the full table through the join at 100 TB
    val aggUnderJoin = joins.exists(_.collect {
      case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
    }.nonEmpty)
    assert(aggUnderJoin, s"fact aggregate is not below the joins:\n$exec")
  }

  test("pipeline keep-set is ONE corpus scan and one shuffle") {
    val df = graft.operators.TextAnalysis.pipelineKeepSet(spark, sf)
    val scans = df.queryExecution.sparkPlan
      .collect { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
    assert(scans.length === 1, s"pipeline re-scans the corpus (${scans.length} scans)")
    // exchanges exist only after EnsureRequirements — count on executedPlan
    val exchanges = "Exchange hashpartitioning".r.findAllIn(planOf(df)).size
    assert(exchanges === 1, s"expected exactly 1 shuffle, saw $exchanges")
  }

  test("incremental dedup matches against the signature STORE — corpus text is never re-read") {
    val df = graft.operators.Dedup.incrementalDedup(spark, sf, splitId = 400L)
    // sparkPlan, not executedPlan: AQE wraps the adaptive plan in a
    // childless node that collect() cannot see into
    val scans = df.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    val docScans = scans.filter(_.metadata("Location").contains("documents.parquet"))
    assert(docScans.nonEmpty, "expected the delta-side documents scan")
    // every documents scan must be the DELTA side (doc_id >= 400 pushed
    // to parquet) — an unfiltered scan means the corpus text is being
    // re-shingled, which at 100 TB is the cost the store exists to kill
    docScans.foreach { s =>
      val pushed = s.metadata("PushedFilters")
      assert(
        pushed.contains("GreaterThanOrEqual(doc_id,400"),
        s"corpus-side documents scan leaked into the match plan: $pushed"
      )
    }
    assert(
      scans.exists(_.metadata("Location").contains("graft_sigstore")),
      "match plan does not read the signature store"
    )
  }

  test("EWMA's 16 lag terms run in one window pass, one shuffle on the series key") {
    val df = TimeSeries.ewma(spark, sf)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(planOf(df)).size
    assert(exchanges === 1, s"expected exactly 1 shuffle, saw $exchanges")
    val windows = df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.size === 1, s"lags split into ${windows.size} window passes")
  }

  test("percentiles sorts a value histogram, never the raw event stream") {
    val exec = TimeSeries.percentiles(spark, sf).queryExecution.sparkPlan
    val windows = exec.collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.nonEmpty, "expected the cumulative-count window")
    // every window must run over the (event_type, value_c) histogram —
    // i.e. a hash aggregate below it — not the raw scan: a rank window
    // straight over events funnels 100 TB through one partition per group
    windows.foreach { w =>
      val aggsBelow = w.child.collect {
        case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
      }
      assert(aggsBelow.nonEmpty, s"window runs over the raw event stream:\n$exec")
    }
  }

  test("q7 broadcasts both nation-tagged sides; the orderkey fact-fact join is the only shuffle join") {
    val plan = Relational.q7NationVolume(spark, sf).queryExecution.sparkPlan
    val shuffleJoins = plan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec    => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }
    assert(shuffleJoins.size === 1, s"expected exactly the orderkey shuffle join, got ${shuffleJoins.size}")
    val bhj = plan.collect { case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j }
    assert(bhj.size >= 2, "nation-tagged supplier/customer sides not broadcast")
  }

  test("q8 semi-joins region membership and keeps one fact-fact shuffle join") {
    val plan = Relational.q8MarketShare(spark, sf).queryExecution.sparkPlan
    val shuffleJoins = plan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec    => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }
    // at test SF the orders side is small enough to broadcast too —
    // the scale property is that AT MOST the orderkey join shuffles
    assert(shuffleJoins.size <= 1, s"more than the orderkey join shuffles: ${shuffleJoins.size}")
    assert(
      plan.toString.contains("LeftSemi"),
      "region membership should reach orders as a semi join"
    )
  }

  test("q13 keeps the zero-order bucket: outer join in the plan, priority filter below it") {
    val df = Relational.q13OrderCounts(spark, sf)
    // the contract itself: EVERY customer lands in some bucket — an
    // inner join (or post-join filter) loses exactly the zero-order
    // customers, so the distribution's total mass must equal the
    // customer count
    val mass = df
      .agg(org.apache.spark.sql.functions.sum("custdist"))
      .head()
      .getLong(0)
    val nCust = graft.sources.Tables.customer(spark, sf).count()
    assert(mass === nCust, s"distribution covers $mass of $nCust customers — outer join broken")
    val joins = df.queryExecution.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec    => j.joinType
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j.joinType
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j.joinType
    }
    assert(
      joins.exists(_.toString.contains("Outer")),
      s"expected an outer join preserving customers, got $joins"
    )
  }

  test("q21 runs the EXISTS/NOT-EXISTS pair as semi + anti joins on the orderkey — never a blowup join") {
    val plan = Relational.q21WaitingSupplier(spark, sf).queryExecution.sparkPlan
    val s = plan.toString
    assert(s.contains("LeftSemi"), "multi-supplier EXISTS should be a left-semi join")
    assert(s.contains("LeftAnti"), "ships-later NOT EXISTS should be a left-anti join")
    assert(
      !s.contains("CartesianProduct"),
      "q21 decorrelation must not fall back to a cartesian product"
    )
  }

  test("q6 pushes every conjunct to the lineitem scan and reads only the needed columns") {
    val scan = Relational
      .q6Revenue(spark, sf)
      .queryExecution
      .sparkPlan
      .collect { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
      .head
    val pushed = scan.metadata("PushedFilters")
    assert(pushed.contains("GreaterThanOrEqual(l_shipdate"), s"date lower bound not pushed: $pushed")
    assert(pushed.contains("LessThan(l_shipdate"), s"date upper bound not pushed: $pushed")
    assert(pushed.contains("GreaterThanOrEqual(l_discount,0.05)"), s"discount band not pushed: $pushed")
    assert(pushed.contains("LessThan(l_quantity,24.0)"), s"quantity cap not pushed: $pushed")
    val readCols = scan.requiredSchema.fieldNames.toSet
    assert(
      readCols === Set("l_quantity", "l_extendedprice", "l_discount", "l_shipdate"),
      s"column pruning broken: $readCols"
    )
  }

  test("linear trend is one shuffle: partition-min window and aggregate share the series key") {
    val plan = planOf(TimeSeries.linearTrend(spark, sf))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected exactly 1 shuffle, saw $exchanges:\n$plan")
  }

  test("burn rate's rolling windows run over the hourly counter table, not raw events") {
    val plan = planOf(TimeSeries.burnRate(spark, sf))
    // two exchanges is the RIGHT shape here: the first carries map-side
    // combined (user, hour) buckets (partial_count below it proves the
    // combine), the second re-keys only the tiny hourly counter table for
    // the window. One user-keyed shuffle instead would move raw events.
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 2, s"expected bucket-agg + window re-key shuffles, saw $exchanges:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("partial count"),
      s"hourly rollup not partial-aggregated below the first shuffle:\n$plan")
    // the window must consume the aggregate, never the raw stream: a
    // raw-events window would sort on (ts_us, event_id); here it's hour_id.
    assert(!plan.contains("ts_us"), s"window consumes raw events:\n$plan")
  }

  test("pivot compiles to ONE aggregation pass — no distinct-values pre-query, no Expand") {
    val plan = planOf(Relational.pivotReturnflag(spark, sf))
    assert(!plan.contains("Expand"), s"pivot expanded rows — declared values should not:\n$plan")
    // one scan of lineitem, one shuffle carrying the partial aggregates
    assert("lineitem\\.parquet".r.findAllIn(plan).size === 1, "pivot re-scanned the fact table")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected exactly 1 shuffle, saw $exchanges:\n$plan")
    assert(plan.contains("partial_sum") || plan.contains("partial sum"),
      s"pivot cells not map-side combined:\n$plan")
  }

  test("grouping sets is one Expand + one aggregation — cost independent of the set count") {
    val plan = planOf(Relational.groupingSetsReport(spark, sf))
    assert("Expand".r.findAllIn(plan).size === 1, s"expected exactly one Expand:\n$plan")
    assert("lineitem\\.parquet".r.findAllIn(plan).size === 1, "grouping sets re-scanned the fact table")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected exactly 1 shuffle, saw $exchanges:\n$plan")
  }

  test("label kNN joins on the predicate key: broadcast HASH join, never a nested loop") {
    val plan = planOf(graft.operators.Similarity.annLabelKnn(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), s"label filter not a hash join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"filtered search degenerated to an unkeyed join:\n$plan")
  }

  test("vocab growth reads only (source, doc_id, text) and shuffles the vocabulary, not tokens") {
    val qe = graft.operators.TextAnalysis.vocabGrowth(spark, sf).queryExecution
    // sparkPlan, not executedPlan: AQE wraps the executed tree and
    // hides the scans from collect until the query actually runs
    val scans = qe.sparkPlan.collect { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
    assert(scans.nonEmpty)
    scans.foreach { s =>
      assert(s.requiredSchema.fieldNames.toSet.subsetOf(Set("source", "doc_id", "text")),
        s"vocab growth reads extra columns: ${s.requiredSchema.fieldNames.mkString(",")}")
    }
    // within-doc repeats collapse in the scan stage: the per-token agg
    // must see array_distinct'ed tokens (partial agg below the shuffle)
    val plan = qe.executedPlan.toString
    assert(plan.contains("array_distinct"), s"within-doc dedup not in the scan stage:\n$plan")
  }

  test("indexed BPE apply reads the persisted vocab, never the training lineage") {
    val qe = graft.operators.TextAnalysis.bpeIndexApply(spark, sf).queryExecution
    val scans = qe.sparkPlan
      .collect { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
      .flatMap(_.relation.location.rootPaths.map(_.toString))
    assert(scans.exists(_.contains("graft_bpe")), s"vocab parquet not read: $scans")
    assert(scans.count(_.contains("documents.parquet")) === 1, s"expected one corpus scan: $scans")
    // no localCheckpoint/training RDD survives into the apply plan
    assert(!qe.executedPlan.toString.contains("ExistingRDD"), "training lineage leaked into apply")
  }

  test("scd2 and pit join: one entity-key exchange serves the whole plan") {
    // SCD2: change-detect lag, segment sum, per-segment agg, and the
    // valid_to lead all share the user_id partitioning — exactly one
    // shuffle of the fact table (hashpartitioning(user_id) satisfies
    // the (user_id, seg) aggregate's clustering)
    val scdPlan = planOf(Relational.scd2(spark, sf))
    val scdShuffles = "Exchange hashpartitioning".r.findAllIn(scdPlan).size
    assert(scdShuffles === 1, s"scd2 planned $scdShuffles exchanges:\n$scdPlan")
    // PIT join: the union + running-carry resolves states in ONE
    // shuffle; the per-state aggregate adds its tiny-key exchange
    val pitPlan = planOf(Relational.pitJoin(spark, sf))
    val pitShuffles = "Exchange hashpartitioning".r.findAllIn(pitPlan).size
    assert(pitShuffles <= 2, s"pit join planned $pitShuffles exchanges:\n$pitPlan")
    assert(!pitPlan.contains("BroadcastNestedLoopJoin"), "pit join nested-looped")
  }

  test("bucketed interval join: equi-join machinery only, range as residual filter") {
    val plan = planOf(TimeSeries.rangeJoin(spark, sf))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"interval join fell back to a nested loop:\n$plan")
    // the range predicate survives as a join-condition residual, not a
    // post-join filter over a wider pair set
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin") ||
      plan.contains("ShuffledHashJoin"), s"no hash/merge join in:\n$plan")
  }

  test("search index query prunes to the query terms' bucket partitions") {
    val qe = graft.operators.TextAnalysis.searchIndexTopk(spark, sf).queryExecution
    val idxScans = qe.sparkPlan
      .collect { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
      .filter(_.relation.location.rootPaths.exists { p =>
        val sp = p.toString
        sp.contains("graft_text_search_index") && !sp.contains("stats") // stats = unpartitioned 1-row file
      })
    assert(idxScans.nonEmpty, "persisted index not read")
    idxScans.foreach { s =>
      assert(
        s.partitionFilters.nonEmpty,
        s"term-bucket predicate did not become a partition filter: ${s.partitionFilters}"
      )
    }
    // ≤3 query terms ⇒ ≤3 of the 16 bucket directories actually read
    val postings = idxScans.filter(_.relation.location.rootPaths.exists(_.toString.contains("postings")))
    postings.foreach { s =>
      assert(s.relation.location.listFiles(s.partitionFilters, s.dataFilters).size <= 3,
        "postings read more bucket partitions than query terms")
    }
  }

  test("top movers plans the global top-10 as TakeOrdered — no full sort materializes") {
    val plan = planOf(Relational.topMovers(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), s"expected TakeOrdered:\n$plan")
    // the window runs over the weekly AGGREGATE: partial aggregation
    // (map-side combine) must sit below the supplier shuffle
    assert(plan.contains("partial_sum") || plan.contains("HashAggregate"), plan)
  }

  test("q9 scans lineitem exactly once; dims broadcast; only the bridge's 1-row |supplier| join nests") {
    val qe = Relational.q9ProductProfit(spark, sf).queryExecution
    val liScans = qe.sparkPlan
      .collect { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
      .count(_.metadata("Location").contains("lineitem.parquet"))
    assert(liScans === 1, s"lineitem scanned $liScans times — the fact must be read once")
    val s = qe.executedPlan.toString
    assert(s.contains("BroadcastHashJoin"), s"red-part / supplier-nation dims not broadcast:\n$s")
    assert(!s.contains("CartesianProduct"), s)
    // exactly the partsupp bridge's 1-row |supplier| broadcast may plan
    // a nested loop; a second one would mean the composite-key partsupp
    // match degenerated to a theta join
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(s).size
    assert(bnlj <= 1, s"$bnlj nested-loop joins — partsupp match degenerated:\n$s")
  }

  test("q2's region-restricted supplier dim broadcasts; the min-cost correlate is an equality join") {
    val s = Relational.q2MinCostSupplier(spark, sf).queryExecution.executedPlan.toString
    assert(s.contains("BroadcastHashJoin"), s"EUROPE supplier dim not broadcast:\n$s")
    assert(!s.contains("CartesianProduct"), s)
    // the per-part min re-expands the partsupp lineage (eu appears on
    // both sides of the min-cost join), so the bridge's 1-row
    // |supplier| broadcast shows up TWICE — both are 1-row sides; a
    // THIRD nested loop would mean the correlate itself degenerated to
    // a range/theta join
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(s).size
    assert(bnlj <= 2, s"$bnlj nested-loop joins — min-cost correlate degenerated:\n$s")
  }

  test("seasonal anomaly joins the profile as a broadcast, never a shuffle join") {
    val plan = planOf(TimeSeries.anomalySeasonal(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), s"profile not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"), plan)
  }

  test("rollup cascade scans raw events exactly once; coarser levels re-aggregate the persisted finer level") {
    val qe = TimeSeries.rollupCascade(spark, sf).queryExecution
    val plan = qe.executedPlan.toString
    try {
      // the printed tree re-embeds each cache's LINEAGE (so the raw
      // scan text appears once per level); the runtime invariant is
      // that every union branch reads a persisted level: the 1m branch
      // scans the minute cache, 1h the hour cache, and 1d aggregates
      // the hour cache again — ≥3 InMemoryTableScans, and the raw scan
      // never appears outside an InMemoryRelation's lineage
      val imts = "InMemoryTableScan".r.findAllIn(plan).size
      assert(imts >= 3, s"cascade not reading persisted levels ($imts cache scans):\n$plan")
      // the PHYSICAL tree's leaves must all be cache scans — a
      // FileSourceScanExec here would mean a union branch re-reads raw
      // events instead of the previous level (the cached lineage shown
      // in the printed text is not part of this tree)
      val rawScans = qe.sparkPlan.collect { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
      assert(rawScans.isEmpty, s"raw scan outside the cascade caches:\n${rawScans.mkString("\n")}")
    } finally spark.catalog.clearCache()
  }

  test("drawdown: both running frames and the final agg share one series shuffle") {
    val plan = planOf(TimeSeries.drawdown(spark, sf))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected exactly 1 shuffle, saw $exchanges:\n$plan")
    assert(!plan.contains("Join"), plan)
  }

  test("holt linear: hourly rollup and the per-series fold share one shuffle chain") {
    val plan = planOf(TimeSeries.holtLinear(spark, sf))
    // hourly groupBy shuffles on (user, hour); the per-series collect
    // re-shuffles the hourly AGGREGATE on user — never raw events twice
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 2, s"expected <= 2 shuffles, saw $exchanges:\n$plan")
    assert("events\\.parquet".r.findAllIn(plan).size <= 1, s"raw events scanned twice:\n$plan")
  }

  test("profile: one orders scan, only the unpivot Expand (never multi-distinct's)") {
    val qe = graft.operators.Relational.profile(spark, sf).queryExecution
    // the UNPIVOT lowers to one 6-way Expand — that is the operator's
    // intended row multiplication; a SECOND Expand would mean Spark
    // planned count(distinct)-style expansion on top
    val expands = "Expand".r.findAllIn(qe.executedPlan.toString).size
    assert(expands === 1, s"expected exactly the unpivot Expand, saw $expands:\n${qe.executedPlan}")
    val scans = qe.sparkPlan.collect { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
    assert(scans.size === 1, s"orders should be scanned exactly once, saw ${scans.size}")
  }

  test("histogram equi: no global sort of raw rows — windows run over the band table") {
    val plan = planOf(graft.operators.Relational.histogramEqui(spark, sf))
    assert(!plan.contains("Exchange rangepartitioning"), s"global sort resurfaced:\n$plan")
    assert(!plan.contains("Join") || plan.contains("BroadcastHashJoin") === false, s"unexpected join:\n$plan")
  }

  test("bigram lm: rank <= 3 plans a window group-limit pushdown") {
    val sparkPlan = graft.operators.TextAnalysis.bigramLm(spark, sf).queryExecution.sparkPlan
    val hasLimit = sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec => w
    }.nonEmpty
    assert(hasLimit, s"per-head top-k not pushed down:\n$sparkPlan")
  }

  test("int8 quantize: row-local — no shuffle, no join, single embeddings scan") {
    val plan = planOf(graft.operators.Similarity.embQuantizeInt8(spark, sf))
    assert(!plan.contains("Exchange"), s"quantization should not shuffle:\n$plan")
    assert(!plan.contains("Join"), plan)
  }

  test("minhash signatures: one doc-grain shuffle, no token-grain exchange, one scan") {
    import graft.operators.Dedup
    val qe = Dedup
      .minhashSignaturesOf(
        graft.sources.Tables
          .documents(spark, sf)
          .select(org.apache.spark.sql.functions.col("doc_id"),
            Dedup.normText(org.apache.spark.sql.functions.col("text")).as("norm"))
      )
      .queryExecution
    val plan = qe.executedPlan.toString
    // the explode is pipeline-local and the groupBy partially
    // aggregates per partition: exactly ONE exchange, keyed on doc_id
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1, s"signature generation grew an exchange:\n$plan")
    assert(plan.contains("partial_min") || plan.contains("partial_"),
      s"map-side combine missing — the shuffle would carry token-grain rows:\n$plan")
    val scans = qe.sparkPlan.collect { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
    assert(scans.size === 1)
  }

  test("bloom join prune: bit set and build keys broadcast — probe side never shuffle-joins") {
    val plan = planOf(Relational.bloomJoinPrune(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), s"bloom bit table not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"probe side shuffle-joined against the tiny build side:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("bloom prefilter: train bit set reaches the eval probes as a broadcast") {
    val plan = planOf(graft.operators.Dedup.bloomPrefilter(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), s"bit-position table not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("importance weights: the <=1024-row bucket-stat table broadcasts into the apply join") {
    val plan = planOf(graft.operators.TextAnalysis.importanceWeights(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), s"bucket stats not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("KMV sketch: per-type k-smallest plans a window group-limit, never a full per-type sort pass") {
    val plan = planOf(Relational.kmvSetops(spark, sf))
    assert(plan.contains("WindowGroupLimit"), s"rank filter not pushed into a bounded group-limit:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("holt winters: hourly rollup and the per-series fold share one shuffle chain") {
    val plan = planOf(TimeSeries.holtWinters(spark, sf))
    // rollup shuffles on (user, hour); the per-series collect reuses
    // the subset key — same contract as holt linear
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 2, s"holt winters grew extra exchanges:\n$plan")
    assert(!plan.contains("Join"), s"the fold should be join-free:\n$plan")
  }
}
