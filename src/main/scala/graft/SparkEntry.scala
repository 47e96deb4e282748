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
    "ts_value_delta"     -> ((s, d) => Compression.valueDelta(s, d)),
    "ts_float_downcast"  -> ((s, d) => Compression.floatDowncast(s, d)),
    "ts_float_xor"       -> ((s, d) => Compression.floatXorRoundtrip(s, d)),
    "ts_round_fixed"     -> ((s, d) => Compression.roundFixed(s, d)),
    "ts_regular_grid"    -> ((s, d) => TimeSeries.regularGrid(s, d)),
    "ts_resample_1h"     -> ((s, d) => TimeSeries.resampleHourly(s, d)),
    "ts_ohlc_1d"         -> ((s, d) => TimeSeries.ohlcDaily(s, d)),
    "ts_moving_avg"      -> ((s, d) => TimeSeries.movingAgg(s, d)),
    "ts_downsample_m4"   -> ((s, d) => TimeSeries.downsampleM4(s, d)),
    "ts_downsample_lttb" -> ((s, d) => TimeSeries.downsampleLttb(s, d)),
    "ts_downsample_lttb_seq" -> ((s, d) => TimeSeries.downsampleLttbSeq(s, d)),
    "ts_percentiles"     -> ((s, d) => TimeSeries.percentiles(s, d)),
    "ts_twa_daily"       -> ((s, d) => TimeSeries.twaDaily(s, d)),
    "ts_anomaly_zscore"  -> ((s, d) => TimeSeries.anomalyZscore(s, d)),
    "ts_mad_outlier"     -> ((s, d) => TimeSeries.madOutlier(s, d)),
    "ts_sax"             -> ((s, d) => TimeSeries.sax(s, d)),
    "ts_rate_increase"   -> ((s, d) => TimeSeries.rateIncrease(s, d)),
    "ts_counter_resets"  -> ((s, d) => TimeSeries.counterResets(s, d)),
    "ts_linear_trend"    -> ((s, d) => TimeSeries.linearTrend(s, d)),
    "ts_burn_rate"       -> ((s, d) => TimeSeries.burnRate(s, d)),
    "ts_gap_stats"       -> ((s, d) => TimeSeries.gapStats(s, d)),
    "ts_retention"       -> ((s, d) => TimeSeries.retention(s, d)),
    "ts_seasonal_profile" -> ((s, d) => TimeSeries.seasonalProfile(s, d)),
    "ts_cross_corr"      -> ((s, d) => TimeSeries.crossCorr(s, d)),
    "ts_autocorr"        -> ((s, d) => TimeSeries.autocorr(s, d)),
    "ts_ar_fit"          -> ((s, d) => TimeSeries.arFit(s, d)),
    "ts_wavelet_haar"    -> ((s, d) => TimeSeries.waveletHaar(s, d)),
    "ts_period_detect"   -> ((s, d) => TimeSeries.periodDetect(s, d)),
    "ts_step_detect"     -> ((s, d) => TimeSeries.stepDetect(s, d)),
    "ts_path_transitions" -> ((s, d) => TimeSeries.pathTransitions(s, d)),
    "ts_forecast_snaive" -> ((s, d) => TimeSeries.forecastSnaive(s, d)),
    "ts_anomaly_seasonal" -> ((s, d) => TimeSeries.anomalySeasonal(s, d)),
    "ts_anomaly_snaive"  -> ((s, d) => TimeSeries.anomalySnaive(s, d)),
    "ts_gap_intervals"   -> ((s, d) => TimeSeries.gapIntervals(s, d)),
    "ts_event_collapse"  -> ((s, d) => TimeSeries.eventCollapse(s, d)),
    "ts_backfill_plan"   -> ((s, d) => TimeSeries.backfillPlan(s, d)),
    "sample_split_leakage" -> ((s, d) => TextAnalysis.splitLeakage(s, d)),
    "ts_stl_decompose"   -> ((s, d) => TimeSeries.stlDecompose(s, d)),
    "ts_stl_strength"    -> ((s, d) => TimeSeries.stlStrength(s, d)),
    "ts_benford"         -> ((s, d) => TimeSeries.benford(s, d)),
    "ts_drawdown"        -> ((s, d) => TimeSeries.drawdown(s, d)),
    "ts_holt_linear"     -> ((s, d) => TimeSeries.holtLinear(s, d)),
    "ts_holt_winters"    -> ((s, d) => TimeSeries.holtWinters(s, d)),
    "ts_theta_forecast"  -> ((s, d) => TimeSeries.thetaForecast(s, d)),
    "ts_capacity_forecast" -> ((s, d) => TimeSeries.capacityForecast(s, d)),
    "ts_alert_fatigue"   -> ((s, d) => TimeSeries.alertFatigue(s, d)),
    "ts_residual_acf"    -> ((s, d) => TimeSeries.residualAcf(s, d)),
    "ts_peak_detect"     -> ((s, d) => TimeSeries.peakDetect(s, d)),
    "ts_kalman"          -> ((s, d) => TimeSeries.kalman(s, d)),
    "ts_cusum"           -> ((s, d) => TimeSeries.cusum(s, d)),
    "ts_cusum_stream"    -> ((s, d) => graft.sources.StreamingIngest.cusumStream(s, d)),
    "ts_anomaly_topk"    -> ((s, d) => TimeSeries.anomalyTopk(s, d)),
    "ts_mix_diversity"   -> ((s, d) => TimeSeries.mixDiversity(s, d)),
    "ts_drift_tv"        -> ((s, d) => TimeSeries.driftTv(s, d)),
    "approx_hdr_latency" -> ((s, d) => Relational.hdrLatency(s, d)),
    "approx_hdr_stream"  -> ((s, d) => graft.sources.StreamingIngest.approxHdrStream(s, d)),
    "emb_centroid_drift" -> ((s, d) => Similarity.centroidDrift(s, d)),
    "text_zipf_slope"    -> ((s, d) => TextAnalysis.zipfSlope(s, d)),
    "ts_exceedance_runs" -> ((s, d) => TimeSeries.exceedanceRuns(s, d)),
    "ts_error_spikes"    -> ((s, d) => TimeSeries.errorSpikes(s, d)),
    "rel_gap_islands"    -> ((s, d) => Relational.gapIslands(s, d)),
    "rel_concentration"  -> ((s, d) => Relational.concentration(s, d)),
    "rel_decile_lift"    -> ((s, d) => Relational.decileLift(s, d)),
    "rel_attribution"    -> ((s, d) => Relational.attribution(s, d)),
    "rel_attribution_stream" -> ((s, d) => graft.sources.StreamingIngest.attributionStream(s, d)),
    "ts_backtest_horizon" -> ((s, d) => TimeSeries.backtestHorizon(s, d)),
    "dedup_minhash_k_curve" -> ((s, d) => Dedup.minhashKCurve(s, d)),
    "dedup_norm_ablation" -> ((s, d) => Dedup.normAblation(s, d)),
    "graph_modularity"   -> ((s, d) => Dedup.modularity(s, d)),
    "contamination_ngram_curve" -> ((s, d) => Dedup.contaminationNgramCurve(s, d)),
    "dedup_winnowing"    -> ((s, d) => Dedup.winnowingPairs(s, d)),
    "ts_weekly_profile"  -> ((s, d) => TimeSeries.weeklyProfile(s, d)),
    "ts_profile_cluster" -> ((s, d) => TimeSeries.profileCluster(s, d)),
    "rel_interval_union" -> ((s, d) => Relational.intervalUnion(s, d)),
    "rel_unpivot"        -> ((s, d) => Relational.unpivotReturnflag(s, d)),
    "ts_motif_topk"      -> ((s, d) => TimeSeries.motifTopk(s, d)),
    "ts_forecast_eval"   -> ((s, d) => TimeSeries.forecastEval(s, d)),
    "ts_rollup_cascade"  -> ((s, d) => TimeSeries.rollupCascade(s, d)),
    "ts_rate_stream"     -> ((s, d) => graft.sources.StreamingIngest.rateStream(s, d)),
    "ts_rate_stream_ooo" -> ((s, d) => graft.sources.StreamingIngest.rateStreamReordering(s, d)),
    "ts_anomaly_stream_ooo" -> ((s, d) => graft.sources.StreamingIngest.anomalyStreamReordering(s, d)),
    "ts_value_histogram" -> ((s, d) => TimeSeries.valueHistogram(s, d)),
    "ts_json_props"      -> ((s, d) => TimeSeries.jsonProps(s, d)),
    "ts_changepoint"     -> ((s, d) => TimeSeries.changepoint(s, d)),
    "ts_intervention_eval" -> ((s, d) => TimeSeries.interventionEval(s, d)),
    "ts_histogram_quantile" -> ((s, d) => TimeSeries.histogramQuantile(s, d)),
    "ts_topk_per_window" -> ((s, d) => TimeSeries.topkPerWindow(s, d)),
    "ts_topk_stream"     -> ((s, d) => graft.sources.StreamingIngest.topkStream(s, d)),
    "ts_ewma"            -> ((s, d) => TimeSeries.ewma(s, d)),
    "ts_ewma_stream"     -> ((s, d) => graft.sources.StreamingIngest.ewmaStream(s, d)),
    "ts_ewma_stream_ooo" -> ((s, d) => graft.sources.StreamingIngest.ewmaStreamReordering(s, d)),
    "ts_histquant_stream" -> ((s, d) => graft.sources.StreamingIngest.histogramQuantileStream(s, d)),
    "ts_funnel"          -> ((s, d) => TimeSeries.funnel(s, d)),
    "ts_funnel_stream"   -> ((s, d) => graft.sources.StreamingIngest.funnelStream(s, d)),
    "ts_sessionize"      -> ((s, d) => TimeSeries.sessionize(s, d)),
    "ts_asof_join"       -> ((s, d) => TimeSeries.asofJoin(s, d)),
    "ts_asof_tolerance"  -> ((s, d) => TimeSeries.asofJoinTolerance(s, d)),
    "ts_asof_nearest"    -> ((s, d) => TimeSeries.asofNearest(s, d)),
    "ts_range_join"      -> ((s, d) => TimeSeries.rangeJoin(s, d)),
    "ts_range_join_stream" -> ((s, d) => graft.sources.StreamingIngest.rangeJoinStream(s, d)),
    "ts_gapfill_locf"    -> ((s, d) => TimeSeries.gapfillLocf(s, d)),
    "ts_gapfill_stream"  -> ((s, d) => graft.sources.StreamingIngest.gapfillStream(s, d)),
    "ts_interp_linear"   -> ((s, d) => TimeSeries.interpLinear(s, d)),
    "ts_ingest_stream"   -> ((s, d) => graft.sources.StreamingIngest.ingestHourly(s, d)),
    "ts_store_roundtrip"  -> ((s, d) => graft.sources.TimeboxStore.roundtripSummary(s, d)),
    "ts_ingest_csv"       -> ((s, d) => graft.sources.TimeboxStore.ingestCsv(s, d)),
    "ts_store_compact"    -> ((s, d) => graft.sources.TimeboxStore.compactSummary(s, d)),
    "ts_store_multitag"   -> ((s, d) => graft.sources.TimeboxStore.multitagRoundtrip(s, d)),
    "ts_store_value_read" -> ((s, d) => graft.sources.TimeboxStore.valueReadSummary(s, d)),
    "ts_store_multitag_read" -> ((s, d) => graft.sources.TimeboxStore.multitagValueReadSummary(s, d)),
    "ts_store_dict_read"  -> ((s, d) => graft.sources.TimeboxStore.dictReadSummary(s, d)),
    "ts_store_counter_roundtrip" -> ((s, d) => graft.sources.TimeboxStore.counterRoundtrip(s, d)),
    "ts_store_agg_pushdown" -> ((s, d) => graft.sources.TimeboxStore.aggPushdownSummary(s, d)),
    "ts_store_format_agg" -> ((s, d) => graft.sources.TimeboxStore.formatAggSummary(s, d)),
    "ts_store_format_write" -> ((s, d) => graft.sources.TimeboxStore.formatWriteRoundtrip(s, d)),
    "ts_store_stream_write" -> ((s, d) => graft.sources.TimeboxStore.streamWriteRoundtrip(s, d)),
    "ts_store_stream_commit" -> ((s, d) => graft.sources.TimeboxStore.streamCommitRoundtrip(s, d)),
    "ts_store_sql_delete" -> ((s, d) => graft.sources.TimeboxStore.sqlDeleteSummary(s, d)),
    "ts_store_catalog_delete" -> ((s, d) => graft.sources.TimeboxStore.sqlCatalogDeleteSummary(s, d)),
    "ts_store_upsert"    -> ((s, d) => graft.sources.TimeboxStore.upsertSummary(s, d)),
    "ts_store_agg_range" -> ((s, d) => graft.sources.TimeboxStore.rangeAggSummary(s, d)),
    "ts_store_quantile_read" -> ((s, d) => graft.sources.TimeboxStore.quantileReadSummary(s, d)),
    "ts_store_hybrid_agg" -> ((s, d) => graft.sources.TimeboxStore.hybridAggSummary(s, d)),
    "ts_store_delete_value" -> ((s, d) => graft.sources.TimeboxStore.deleteSummary(s, d)),
    "ts_store_cdc"       -> ((s, d) => graft.sources.TimeboxStore.cdcSummary(s, d)),
    "ts_store_ttl"       -> ((s, d) => graft.sources.TimeboxStore.ttlSummary(s, d)),
    "ts_store_merge"     -> ((s, d) => graft.sources.TimeboxStore.mergeSummary(s, d)),
    "ts_store_sql_merge" -> ((s, d) => graft.sources.TimeboxStore.sqlMergeSummary(s, d)),
    "ts_store_catalog_merge" -> ((s, d) => graft.sources.TimeboxStore.sqlCatalogMergeSummary(s, d)),
    "ts_store_schema_evolve" -> ((s, d) => graft.sources.TimeboxStore.schemaEvolveRoundtrip(s, d)),
    "ts_store_stats"     -> ((s, d) => graft.sources.TimeboxStore.storeStats(s, d)),
    "ts_store_catalog"   -> ((s, d) => graft.sources.TimeboxStore.catalogMaintenanceSummary(s, d)),
    "ts_store_timetravel" -> ((s, d) => graft.sources.TimeboxStore.timeTravelSummary(s, d)),
    "ts_store_timetravel_api" -> ((s, d) => graft.sources.TimeboxStore.timeTravelFormatRead(s, d)),
    "ts_store_sql" -> ((s, d) => graft.sources.TimeboxStore.sqlSurfaceSummary(s, d)),
    "ts_store_sql_write" -> ((s, d) => graft.sources.TimeboxStore.sqlWriteRoundtrip(s, d)),
    "ts_store_catalog_write" -> ((s, d) => graft.sources.TimeboxStore.sqlCatalogWriteRoundtrip(s, d)),
    "ts_store_stream_read" -> ((s, d) => graft.sources.StreamingIngest.storeStreamRead(s, d)),
    "ts_store_stream_read_from" -> ((s, d) => graft.sources.StreamingIngest.storeStreamReadFrom(s, d)),
    "ts_outage_mttr" -> ((s, d) => TimeSeries.outageMttr(s, d)),
    "ts_dedup_stream_events" -> ((s, d) => graft.sources.StreamingIngest.dedupStreamEvents(s, d)),
    "mm_shard_plan" -> ((s, d) => Multimodal.shardPlan(s, d)),
    "mm_ahash_neardup"   -> ((s, d) => Multimodal.ahashNearDup(s, d)),
    "mm_scene_split"     -> ((s, d) => Multimodal.sceneSplit(s, d)),
    "rel_bucketed_join" -> ((s, d) => Relational.bucketedJoin(s, d)),
    "text_rank_fusion" -> ((s, d) => TextAnalysis.rankFusion(s, d)),
    "ts_store_asof"      -> ((s, d) => graft.sources.TimeboxStore.asofReadSummary(s, d)),
    "ts_sessionize_stream" -> ((s, d) => graft.sources.StreamingIngest.sessionizeStream(s, d)),
    "ts_anomaly_stream"  -> ((s, d) => graft.sources.StreamingIngest.anomalyStream(s, d)),
    "ts_stream_join"     -> ((s, d) => graft.sources.StreamingIngest.attributionJoin(s, d)),
    // -- relational analytics ------------------------------------------
    "q1_pricing_summary" -> ((s, d) => Relational.pricingSummary(s, d)),
    "q3_topk_revenue"    -> ((s, d) => Relational.topkRevenue(s, d)),
    "q5_region_revenue"  -> ((s, d) => Relational.regionRevenue(s, d)),
    "topk_per_group"     -> ((s, d) => Relational.topkPerGroup(s, d)),
    "group_distinct"     -> ((s, d) => Relational.groupDistinct(s, d)),
    "rel_antijoin"       -> ((s, d) => Relational.customersWithoutOrders(s, d)),
    "q14_promo_share"    -> ((s, d) => Relational.promoRevenueShare(s, d)),
    "rel_semijoin"       -> ((s, d) => Relational.suppliersShippedInWindow(s, d)),
    "rel_rollup"         -> ((s, d) => Relational.revenueRollup(s, d)),
    "q18_large_orders"   -> ((s, d) => Relational.largeOrders(s, d)),
    "rel_argmax"         -> ((s, d) => Relational.topCustomerPerNation(s, d)),
    "rel_running_total"  -> ((s, d) => Relational.runningRevenue(s, d)),
    "rel_skew_join"      -> ((s, d) => Relational.skewJoin(s, d)),
    "rel_key_skew_profile" -> ((s, d) => Relational.keySkewProfile(s, d)),
    "rel_salt_plan"      -> ((s, d) => Relational.saltPlan(s, d)),
    "q6_revenue"         -> ((s, d) => Relational.q6Revenue(s, d)),
    "q4_order_priority"  -> ((s, d) => Relational.q4OrderPriority(s, d)),
    "q17_small_qty"      -> ((s, d) => Relational.q17SmallQuantity(s, d)),
    "q19_disjunctive"    -> ((s, d) => Relational.q19Disjunctive(s, d)),
    "q22_idle_customers" -> ((s, d) => Relational.q22IdleCustomers(s, d)),
    "q15_top_supplier"   -> ((s, d) => Relational.q15TopSupplier(s, d)),
    "q7_nation_volume"   -> ((s, d) => Relational.q7NationVolume(s, d)),
    "q8_market_share"    -> ((s, d) => Relational.q8MarketShare(s, d)),
    "q12_priority_class" -> ((s, d) => Relational.q12PriorityClass(s, d)),
    "q13_order_counts"   -> ((s, d) => Relational.q13OrderCounts(s, d)),
    "q21_waiting_supplier" -> ((s, d) => Relational.q21WaitingSupplier(s, d)),
    "rel_pivot"          -> ((s, d) => Relational.pivotReturnflag(s, d)),
    "rel_grouping_sets"  -> ((s, d) => Relational.groupingSetsReport(s, d)),
    "rel_median_order"   -> ((s, d) => Relational.medianOrderValue(s, d)),
    "rel_cube"           -> ((s, d) => Relational.revenueCube(s, d)),
    "rel_top_movers"     -> ((s, d) => Relational.topMovers(s, d)),
    "rel_basket_pairs"   -> ((s, d) => Relational.basketPairs(s, d)),
    "graph_part_rank"    -> ((s, d) => Relational.partRank(s, d)),
    "graph_khop"         -> ((s, d) => Relational.kHop(s, d)),
    "graph_kcore"        -> ((s, d) => Relational.kCore(s, d)),
    "emb_outlier_topk"   -> ((s, d) => Similarity.embOutlierTopk(s, d)),
    "graph_common_neighbors" -> ((s, d) => Relational.commonNeighbors(s, d)),
    "graph_copurchase_tier" -> ((s, d) => Relational.coPurchaseTier(s, d)),
    "graph_copurchase_stream" -> ((s, d) => graft.sources.StreamingIngest.coPurchaseStream(s, d)),
    "rel_mv_delta"       -> ((s, d) => Relational.mvDelta(s, d)),
    "rel_join_size_estimate" -> ((s, d) => Relational.joinSizeEstimate(s, d)),
    "rel_zorder_layout"  -> ((s, d) => Relational.zorderLayout(s, d)),
    "rel_compaction_plan" -> ((s, d) => Relational.compactionPlan(s, d)),
    "rel_max_concurrency" -> ((s, d) => Relational.maxConcurrency(s, d)),
    "rel_latency_percentiles" -> ((s, d) => Relational.latencyPercentiles(s, d)),
    "rel_order_recon"    -> ((s, d) => Relational.orderRecon(s, d)),
    "rel_rfm_segments"   -> ((s, d) => Relational.rfmSegments(s, d)),
    "rel_scd2"           -> ((s, d) => Relational.scd2(s, d)),
    "rel_scd2_stream"    -> ((s, d) => graft.sources.StreamingIngest.scd2Stream(s, d)),
    "rel_mv_stream"      -> ((s, d) => graft.sources.StreamingIngest.mvStream(s, d)),
    "rel_profile"        -> ((s, d) => Relational.profile(s, d)),
    "rel_histogram_equi" -> ((s, d) => Relational.histogramEqui(s, d)),
    "rel_fk_audit"       -> ((s, d) => Relational.fkAudit(s, d)),
    "approx_hll_users"   -> ((s, d) => Relational.approxHllUsers(s, d)),
    "approx_hll_stream"  -> ((s, d) => graft.sources.StreamingIngest.approxHllStream(s, d)),
    "approx_kmv_setops"  -> ((s, d) => Relational.kmvSetops(s, d)),
    "approx_kmv_stream"  -> ((s, d) => graft.sources.StreamingIngest.approxKmvStream(s, d)),
    "approx_cms_stream"  -> ((s, d) => graft.sources.StreamingIngest.approxCmsStream(s, d)),
    "approx_bloom_stream" -> ((s, d) => graft.sources.StreamingIngest.approxBloomStream(s, d)),
    "sample_cap_stream"  -> ((s, d) => graft.sources.StreamingIngest.sampleCapStream(s, d)),
    "text_heavy_hitters_stream" -> ((s, d) => graft.sources.StreamingIngest.heavyHittersStream(s, d)),
    "ts_ohlc_stream"     -> ((s, d) => graft.sources.StreamingIngest.ohlcStream(s, d)),
    "mm_cas_stream"      -> ((s, d) => graft.sources.StreamingIngest.casStream(s, d)),
    "ts_seasonal_profile_stream" -> ((s, d) => graft.sources.StreamingIngest.seasonalProfileStream(s, d)),
    "text_vocab_stream"  -> ((s, d) => graft.sources.StreamingIngest.vocabStream(s, d)),
    "rel_bloom_join_prune" -> ((s, d) => Relational.bloomJoinPrune(s, d)),
    "dedup_recall_eval"  -> ((s, d) => Dedup.recallEval(s, d)),
    "dedup_source_overlap" -> ((s, d) => Dedup.sourceOverlap(s, d)),
    "graph_triangles"    -> ((s, d) => Dedup.graphTriangles(s, d)),
    "graph_clustering_coeff" -> ((s, d) => Dedup.clusteringCoeff(s, d)),
    "graph_assortativity" -> ((s, d) => Dedup.graphAssortativity(s, d)),
    "graph_degree_dist"  -> ((s, d) => Dedup.graphDegreeDist(s, d)),
    "dedup_lsh_tune"     -> ((s, d) => Dedup.lshTune(s, d)),
    "dedup_soft_weights" -> ((s, d) => Dedup.softWeights(s, d)),
    "rel_pit_join"       -> ((s, d) => Relational.pitJoin(s, d)),
    "rel_q10_returns"    -> ((s, d) => Relational.returnedRevenue(s, d)),
    "q2_min_cost_supplier" -> ((s, d) => Relational.q2MinCostSupplier(s, d)),
    "q9_product_profit"  -> ((s, d) => Relational.q9ProductProfit(s, d)),
    "q11_important_stock" -> ((s, d) => Relational.q11ImportantStock(s, d)),
    "q16_supplier_cnt"   -> ((s, d) => Relational.q16SupplierCnt(s, d)),
    "q20_potential_promo" -> ((s, d) => Relational.q20PotentialPromo(s, d)),
    // -- deduplication ---------------------------------------------------
    "dedup_exact"            -> ((s, d) => Dedup.exact(s, d)),
    "dedup_exact_keep_first" -> ((s, d) => Dedup.exactKeepFirst(s, d)),
    "dedup_minhash_lsh"      -> ((s, d) => Dedup.minhashLsh(s, d)),
    "dedup_clusters"         -> ((s, d) => Dedup.clusters(s, d)),
    "dedup_near_rate_by_source" -> ((s, d) => Dedup.nearDupRateBySource(s, d)),
    "dedup_label_prop"       -> ((s, d) => Dedup.labelProp(s, d)),
    "dedup_clusters_star"    -> ((s, d) => Dedup.clustersStar(s, d)),
    "dedup_cluster_stats"    -> ((s, d) => Dedup.clusterStats(s, d)),
    "contamination_doc_overlap" -> ((s, d) => Dedup.contaminationDocOverlap(s, d)),
    "contamination_long_match"  -> ((s, d) => Dedup.contaminationLongMatch(s, d)),
    "dedup_bloom_prefilter"     -> ((s, d) => Dedup.bloomPrefilter(s, d)),
    "dedup_substring"           -> ((s, d) => Dedup.substringDedup(s, d)),
    "dedup_paragraph"           -> ((s, d) => Dedup.dedupParagraph(s, d)),
    "text_ngram_novelty"        -> ((s, d) => Dedup.ngramNovelty(s, d)),
    "dedup_store_stats"         -> ((s, d) => Dedup.storeStats(s, d)),
    "dedup_ngram_jaccard"    -> ((s, d) => Dedup.ngramJaccard(s, d)),
    "dedup_prefix_filter"    -> ((s, d) => Dedup.prefixFilterPairs(s, d)),
    "dedup_containment"      -> ((s, d) => Dedup.containmentPairs(s, d)),
    "dedup_keep_best"        -> ((s, d) => Dedup.keepBest(s, d)),
    "dedup_containment_estimate" -> ((s, d) => Dedup.containmentEstimate(s, d)),
    "dedup_simhash"          -> ((s, d) => Dedup.simhash(s, d)),
    "dedup_incremental"      -> ((s, d) => Dedup.incrementalDedup(s, d)),
    "dedup_store_delete"     -> ((s, d) => Dedup.storeDeleteMatch(s, d)),
    "dedup_edge_tier"        -> ((s, d) => Dedup.edgeTier(s, d)),
    "dedup_incremental_cc"   -> ((s, d) => Dedup.incrementalClusters(s, d)),
    "dedup_incremental_bbit" -> ((s, d) => Dedup.incrementalBbit(s, d)),
    "dedup_stream_cc"        -> ((s, d) => graft.sources.StreamingIngest.dedupStreamClusters(s, d)),
    "dedup_contamination"    -> ((s, d) => Dedup.contamination(s, d)),
    "dedup_minhash_estimate" -> ((s, d) => Dedup.minhashEstimate(s, d)),
    "dedup_minhash_bbit"     -> ((s, d) => Dedup.minhashBbit(s, d)),
    "dedup_skewed_corpus"    -> ((s, d) => Dedup.skewedCorpus(s, d)),
    "contamination_ngram"    -> ((s, d) => Dedup.contaminationNgram(s, d)),
    "dedup_stream"           -> ((s, d) => graft.sources.StreamingIngest.dedupStream(s, d)),
    // synthetic embeddings are near-orthogonal (max cos ~0.51); 0.4
    // keeps the semantics (default threshold is 0.95) with a non-empty
    // verification set. Bucketing is hyperplane LSH (8 tables x 4 bits).
    "dedup_embedding" -> ((s, d) => Dedup.embeddingNearDup(s, d, threshold = 0.4)),
    "emb_threshold_curve" -> ((s, d) => Dedup.embThresholdCurve(s, d)),
    "graph_louvain_gain"  -> ((s, d) => Dedup.louvainGain(s, d)),
    "graph_louvain_apply" -> ((s, d) => Dedup.louvainApply(s, d)),
    "graph_louvain_levels" -> ((s, d) => Dedup.louvainLevels(s, d)),
    "graph_louvain_labels" -> ((s, d) => Dedup.louvainLabels(s, d)),
    "dedup_embedding_clusters" -> ((s, d) => Dedup.embeddingClusters(s, d, threshold = 0.4)),
    // -- similarity search ------------------------------------------------
    "ann_topk_bruteforce" -> ((s, d) => Similarity.annTopkBruteForce(s, d)),
    "ann_lsh_bucketed"    -> ((s, d) => Similarity.annLshBucketed(s, d)),
    "ann_lsh_multiprobe"  -> ((s, d) => Similarity.annLshMultiprobe(s, d)),
    "ann_ivf_bucketed"    -> ((s, d) => Similarity.annIvfBucketed(s, d)),
    "ann_ivf_kmeans"      -> ((s, d) => Similarity.annIvfKmeans(s, d)),
    "ann_pq_search"       -> ((s, d) => Similarity.annPqSearch(s, d)),
    "ann_sq_search"       -> ((s, d) => Similarity.annSqSearch(s, d)),
    "ann_ivfpq_search"    -> ((s, d) => Similarity.annIvfPqSearch(s, d)),
    "ann_label_knn"       -> ((s, d) => Similarity.annLabelKnn(s, d)),
    "ann_index_search"    -> ((s, d) => Similarity.annIndexSearch(s, d)),
    "ann_index_delete"    -> ((s, d) => Similarity.annIndexDelete(s, d)),
    "ann_range_search"    -> ((s, d) => Similarity.annRangeSearch(s, d)),
    "emb_norm_stats"      -> ((s, d) => Similarity.embNormStats(s, d)),
    "emb_quantize_int8"   -> ((s, d) => Similarity.embQuantizeInt8(s, d)),
    "emb_pca_power"       -> ((s, d) => Similarity.pcaPower(s, d)),
    "emb_matryoshka_eval" -> ((s, d) => Similarity.matryoshkaEval(s, d)),
    "emb_dim_variance"    -> ((s, d) => Similarity.dimVariance(s, d)),
    "emb_cosine_histogram" -> ((s, d) => Similarity.cosineHistogram(s, d)),
    "emb_label_centroids" -> ((s, d) => Similarity.labelCentroids(s, d)),
    "ann_knn_join"        -> ((s, d) => Similarity.annKnnJoin(s, d)),
    "ann_knn_recall"      -> ((s, d) => Similarity.annKnnRecall(s, d)),
    "ann_cell_skew"       -> ((s, d) => Similarity.annCellSkew(s, d)),
    "ann_index_append"    -> ((s, d) => Similarity.annIndexAppend(s, d)),
    "ann_recall_eval"     -> ((s, d) => Similarity.annRecallEval(s, d)),
    "ann_recall_vs_nprobe" -> ((s, d) => Similarity.recallVsNprobe(s, d)),
    "ann_recall_vs_shortlist" -> ((s, d) => Similarity.recallVsShortlist(s, d)),
    "ann_recall_vs_nplanes" -> ((s, d) => Similarity.recallVsNplanes(s, d)),
    "emb_pq_distortion"   -> ((s, d) => Similarity.pqDistortion(s, d)),
    "ann_hamming_search"  -> ((s, d) => Similarity.annHammingSearch(s, d)),
    "ann_hamming_rerank"  -> ((s, d) => Similarity.annHammingRerank(s, d)),
    "ann_hamming_recall"  -> ((s, d) => Similarity.annHammingRecall(s, d)),
    "ann_stream_search"   -> ((s, d) => graft.sources.StreamingIngest.annStreamSearch(s, d)),
    "ann_stream_index"    -> ((s, d) => graft.sources.StreamingIngest.annStreamIndex(s, d)),
    // -- text analysis ----------------------------------------------------
    "text_tokens"      -> ((s, d) => TextAnalysis.tokens(s, d)),
    "text_bigram_pmi"  -> ((s, d) => TextAnalysis.bigramPmi(s, d)),
    "text_ngram_freq"  -> ((s, d) => TextAnalysis.ngramFreq(s, d)),
    "text_salient"     -> ((s, d) => TextAnalysis.salient(s, d)),
    "sample_stratified" -> ((s, d) => TextAnalysis.stratifiedSample(s, d)),
    "text_quality"     -> ((s, d) => TextAnalysis.quality(s, d)),
    "quality_rules_by_source" -> ((s, d) => TextAnalysis.qualityRulesBySource(s, d)),
    "quality_rules_stream" -> ((s, d) => graft.sources.StreamingIngest.qualityRulesStream(s, d)),
    "sample_temperature" -> ((s, d) => TextAnalysis.sampleTemperature(s, d)),
    "sample_hash_split" -> ((s, d) => TextAnalysis.hashSplit(s, d)),
    "sample_quality_weighted" -> ((s, d) => TextAnalysis.qualityWeightedSample(s, d)),
    "text_dedup_rate_by_source" -> ((s, d) => TextAnalysis.dedupRateBySource(s, d)),
    "text_langid"      -> ((s, d) => TextAnalysis.langId(s, d)),
    "text_langid_eval" -> ((s, d) => TextAnalysis.langIdEval(s, d)),
    "text_lexical_diversity" -> ((s, d) => TextAnalysis.lexicalDiversity(s, d)),
    "text_span_df_profile" -> ((s, d) => TextAnalysis.spanDfProfile(s, d)),
    "text_repetition"  -> ((s, d) => TextAnalysis.repetition(s, d)),
    "text_fingerprint" -> ((s, d) => TextAnalysis.fingerprint(s, d)),
    "text_winnowing"   -> ((s, d) => TextAnalysis.winnowing(s, d)),
    "text_vocab_growth" -> ((s, d) => TextAnalysis.vocabGrowth(s, d)),
    "text_coverage_topk" -> ((s, d) => TextAnalysis.coverageTopk(s, d)),
    "text_oov_rate"     -> ((s, d) => TextAnalysis.oovRate(s, d)),
    "text_source_terms" -> ((s, d) => TextAnalysis.sourceTerms(s, d)),
    "text_domain_mix"   -> ((s, d) => TextAnalysis.domainMix(s, d)),
    "text_length_histogram" -> ((s, d) => TextAnalysis.lengthHistogram(s, d)),
    "text_encoding_audit"   -> ((s, d) => TextAnalysis.encodingAudit(s, d)),
    "text_bm25_topk"        -> ((s, d) => TextAnalysis.bm25Topk(s, d)),
    "sample_interleave"     -> ((s, d) => TextAnalysis.sampleInterleave(s, d)),
    "text_bpe_train"    -> ((s, d) => TextAnalysis.bpeTrain(s, d)),
    "text_bpe_apply"    -> ((s, d) => TextAnalysis.bpeApply(s, d)),
    "text_fertility_by_lang" -> ((s, d) => TextAnalysis.fertilityByLang(s, d)),
    "text_chunk_for_rag" -> ((s, d) => TextAnalysis.chunkForRag(s, d)),
    "text_heavy_hitters" -> ((s, d) => TextAnalysis.heavyHitters(s, d)),
    "text_bpe_index"    -> ((s, d) => TextAnalysis.bpeIndexApply(s, d)),
    "text_bpe_batch"    -> ((s, d) => TextAnalysis.bpeBatchTrain(s, d, rounds = 4, m = 6, cand = 24)),
    "text_search_topk"  -> ((s, d) => TextAnalysis.searchTopk(s, d)),
    "text_pii_scrub"    -> ((s, d) => TextAnalysis.piiScrub(s, d)),
    "text_search_index" -> ((s, d) => TextAnalysis.searchIndexTopk(s, d)),
    "text_cdc_chunks"   -> ((s, d) => TextAnalysis.cdcChunks(s, d)),
    "text_surprisal"    -> ((s, d) => TextAnalysis.surprisal(s, d)),
    "pipeline_keep_set" -> ((s, d) => TextAnalysis.pipelineKeepSet(s, d)),
    "pipeline_funnel"   -> ((s, d) => TextAnalysis.pipelineFunnel(s, d)),
    "pipeline_mix_plan" -> ((s, d) => TextAnalysis.mixPlan(s, d)),
    "text_readability"  -> ((s, d) => TextAnalysis.readability(s, d)),
    "text_bigram_lm"    -> ((s, d) => TextAnalysis.bigramLm(s, d)),
    "sample_cap_per_source" -> ((s, d) => TextAnalysis.capPerSource(s, d)),
    "sample_pack_sequences" -> ((s, d) => TextAnalysis.packSequences(s, d)),
    "sample_epoch_schedule" -> ((s, d) => TextAnalysis.epochSchedule(s, d)),
    "sample_importance" -> ((s, d) => TextAnalysis.importanceWeights(s, d)),
    "sample_perplexity_filter" -> ((s, d) => TextAnalysis.perplexityFilter(s, d)),
    "sample_budget_alloc" -> ((s, d) => TextAnalysis.budgetAlloc(s, d)),
    "text_boilerplate"  -> ((s, d) => TextAnalysis.boilerplate(s, d)),
    "approx_cms"        -> ((s, d) => TextAnalysis.cmsTokens(s, d)),
    "text_boilerplate_scrub" -> ((s, d) => TextAnalysis.boilerplateScrub(s, d)),
    "sample_priority"   -> ((s, d) => TextAnalysis.prioritySample(s, d)),
    // -- multimodal plumbing ------------------------------------------------
    "mm_binary_stats" -> ((s, d) => Multimodal.binaryStats(s, d)),
    "mm_chunk_table"  -> ((s, d) => Multimodal.chunkTable(s, d)),
    "mm_chunk_dedup"  -> ((s, d) => Multimodal.chunkDedup(s, d)),
    "mm_chunk_gc"     -> ((s, d) => Multimodal.chunkGc(s, d)),
    "mm_asset_dedup"  -> ((s, d) => Multimodal.assetDedup(s, d)),
    "mm_decode_index" -> ((s, d) => Multimodal.decodeIndex(s, d)),
    "mm_frame_sample" -> ((s, d) => Multimodal.frameSamplePlan(s, d)),
    "mm_frame_dedup"  -> ((s, d) => Multimodal.frameDedup(s, d)),
    "mm_resize_plan"  -> ((s, d) => Multimodal.resizePlan(s, d)),
    "mm_modality_route" -> ((s, d) => Multimodal.modalityRoute(s, d)),
    "mm_modal_mix_plan" -> ((s, d) => Multimodal.modalMixPlan(s, d)),
    "mm_aspect_bucket" -> ((s, d) => Multimodal.aspectBucket(s, d)),
    "mm_chunk_restore" -> ((s, d) => Multimodal.chunkRestore(s, d)),
    "rel_ntile_quartiles" -> ((s, d) => Relational.ntileQuartiles(s, d)),
    "mm_upload_plan"  -> ((s, d) => Multimodal.uploadPlan(s, d))
  )

  /** DuckDB fragments shared by the text/dedup oracles — must mirror
    * Dedup.normText exactly (note DuckDB regexp_replace needs 'g').
    */
  private val normSql =
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"

  /** last-touch attribution oracle: the carried-forward non-purchase
    * channel credits each purchase (ties to ts_attribution's window).
    */
  private lazy val attributionOracleSql: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
        |             CAST(round(value*100) AS BIGINT) AS v_c FROM events),
        |t AS (SELECT *,
        |        LAST_VALUE(CASE WHEN event_type != 'purchase' THEN event_type END IGNORE NULLS)
        |          OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
        |      FROM e),
        |g AS (SELECT COALESCE(touch, 'direct') AS channel,
        |        CAST(COUNT(*) AS BIGINT) AS n_purchases,
        |        CAST(SUM(v_c) AS BIGINT) AS credited_c
        |      FROM t WHERE event_type = 'purchase' GROUP BY 1)
        |SELECT channel, n_purchases, credited_c,
        |  CAST((CAST(credited_c AS HUGEINT) * 10000) // GREATEST(SUM(credited_c) OVER (), 1) AS BIGINT) AS share_bp
        |FROM g""".stripMargin

  /** BPE training oracle: 5 unrolled merge rounds over the distinct-
    * word frequency table; each round counts '<'-delimited adjacent
    * symbol pairs, picks the (count desc, lex) argmax, and applies the
    * merge as a plain left-to-right replace — byte-identical to the
    * Spark loop's semantics.
    */
  private def bpeChain(rounds: Int): String = {
    val perRound = (1 to rounds).map { r =>
      s"""p$r AS (SELECT sy[i] AS lhs, sy[i+1] AS rhs, CAST(SUM(f) AS BIGINT) AS c
         |  FROM (SELECT f, sy, unnest(generate_series(1, len(sy)-1)) AS i
         |        FROM (SELECT f, list_filter(string_split(s, '<'), x -> x <> '') AS sy FROM w${r - 1})
         |        WHERE len(sy) >= 2)
         |  GROUP BY 1, 2),
         |b$r AS (SELECT lhs, rhs, c FROM p$r ORDER BY c DESC, lhs ASC, rhs ASC LIMIT 1),
         |w$r AS (SELECT w, f, replace(s, '<'||lhs||'<'||rhs, '<'||lhs||rhs) AS s FROM w${r - 1}, b$r)""".stripMargin
    }
    s"""WITH wf AS (
       |  SELECT w, CAST(COUNT(*) AS BIGINT) AS f
       |  FROM (SELECT unnest($toksSql) AS w FROM documents)
       |  WHERE w <> '' GROUP BY 1),
       |w0 AS (SELECT w, f, regexp_replace(w, '(.)', '<\\1', 'g') AS s FROM wf),
       |${perRound.mkString(",\n")}""".stripMargin
  }

  /** Batched BPE oracle: per round, rank the top-`cand` pairs, keep up
    * to `m` pairwise-disjoint ones (a pair survives iff NO higher-ranked
    * candidate shares a symbol), apply the kept merges in k order. The
    * within-round fold unrolls as `m` LEFT JOIN ON TRUE steps (0-or-1
    * row per k ⇒ identity when the round kept fewer than m).
    */
  private def bpeBatchOracle(rounds: Int, m: Int, cand: Int): String = {
    val perRound = (1 to rounds).map { r =>
      val wordSteps = (1 to m).map { k =>
        val prev = if (k == 1) s"w${r - 1}" else s"w${r}_${k - 1}"
        s"""w${r}_$k AS (SELECT t.w, t.f,
           |  CASE WHEN mg.lhs IS NULL THEN t.s
           |       ELSE replace(t.s, '<'||mg.lhs||'<'||mg.rhs, '<'||mg.lhs||mg.rhs) END AS s
           |  FROM $prev t LEFT JOIN (SELECT lhs, rhs FROM kp$r WHERE k = $k) mg ON TRUE)""".stripMargin
      }
      // AS MATERIALIZED is load-bearing: every round's CTEs are
      // referenced several times (kp by each word step + the final
      // select; rk twice in the NOT EXISTS) — inlined, each reference
      // re-expands the whole prior-round chain and the oracle goes
      // exponential in rounds·m (measured: >240 s vs ~1 s at sf0.01)
      s"""p$r AS MATERIALIZED (SELECT sy[i] AS lhs, sy[i+1] AS rhs, CAST(SUM(f) AS BIGINT) AS c
         |  FROM (SELECT f, sy, unnest(generate_series(1, len(sy)-1)) AS i
         |        FROM (SELECT f, list_filter(string_split(s, '<'), x -> x <> '') AS sy FROM w${r - 1})
         |        WHERE len(sy) >= 2)
         |  GROUP BY 1, 2),
         |rk$r AS MATERIALIZED (SELECT lhs, rhs, c, CAST(ROW_NUMBER() OVER (ORDER BY c DESC, lhs ASC, rhs ASC) AS BIGINT) AS rn
         |  FROM (SELECT lhs, rhs, c FROM p$r ORDER BY c DESC, lhs ASC, rhs ASC LIMIT $cand)),
         |kp$r AS MATERIALIZED (SELECT lhs, rhs, c, k FROM (
         |    SELECT a.lhs, a.rhs, a.c, CAST(ROW_NUMBER() OVER (ORDER BY a.rn ASC) AS BIGINT) AS k
         |    FROM rk$r a
         |    WHERE NOT EXISTS (SELECT 1 FROM rk$r b WHERE b.rn < a.rn
         |      AND (b.lhs = a.lhs OR b.lhs = a.rhs OR b.rhs = a.lhs OR b.rhs = a.rhs)))
         |  WHERE k <= $m),
         |${wordSteps.mkString(",\n")},
         |w$r AS MATERIALIZED (SELECT w, f, s FROM w${r}_$m)""".stripMargin
    }
    val selects = (1 to rounds)
      .map(r => s"SELECT CAST($r AS BIGINT) AS merge_round, k, lhs, rhs, c AS pair_weight FROM kp$r")
      .mkString("\nUNION ALL\n")
    s"""WITH wf AS (
       |  SELECT w, CAST(COUNT(*) AS BIGINT) AS f
       |  FROM (SELECT unnest($toksSql) AS w FROM documents)
       |  WHERE w <> '' GROUP BY 1),
       |w0 AS MATERIALIZED (SELECT w, f, regexp_replace(w, '(.)', '<\\1', 'g') AS s FROM wf),
       |${perRound.mkString(",\n")}
       |$selects""".stripMargin
  }

  private def bpeOracle(rounds: Int): String = {
    val selects = (1 to rounds)
      .map(r => s"SELECT CAST($r AS BIGINT) AS merge_round, lhs, rhs, c AS pair_weight FROM b$r")
      .mkString("\nUNION ALL\n")
    s"${bpeChain(rounds)}\n$selects"
  }

  /** synchronous label propagation, unrolled: plurality label with
    * (count desc, label asc) tiebreak each round
    */
  /** cross-source shared-n-gram curve at the given n values — mirrors
    * Dedup.contaminationNgramCurve's 60-bit hashed-shingle tier;
    * pairs with zero sharing drop from a leg (inner-join semantics)
    */
  private def contaminationCurveOracle(ns: Seq[Int]): String = {
    val ctes = ns.map { n =>
      val cat = (0 until n).map(j => s"toks[i+$j]").mkString(" || ' ' || ")
      s"""sh$n AS (SELECT DISTINCT source,
         |    CAST('0x' || substr(md5($cat), 1, 15) AS BIGINT) AS hsh
         |  FROM (SELECT source, toks, unnest(generate_series(1, len(toks) - ${n - 1})) AS i
         |        FROM d WHERE len(toks) >= $n)),
         |sz$n AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sh FROM sh$n GROUP BY 1),
         |sp$n AS (SELECT x.source AS source_a, y.source AS source_b, CAST(COUNT(*) AS BIGINT) AS n_shared
         |  FROM sh$n x JOIN sh$n y ON y.hsh = x.hsh AND x.source < y.source GROUP BY 1, 2)""".stripMargin
    }
    val legs = ns.map { n =>
      s"""SELECT CAST($n AS BIGINT) AS n, sp.source_a, sp.source_b, sp.n_shared,
         |  a.n_sh AS n_a, b.n_sh AS n_b,
         |  CAST((sp.n_shared * 1000000) // least(a.n_sh, b.n_sh) AS BIGINT) AS contain_small_micro
         |FROM sp$n sp JOIN sz$n a ON a.source = sp.source_a JOIN sz$n b ON b.source = sp.source_b""".stripMargin
    }
    s"""WITH d AS (SELECT source, $toksSql AS toks FROM documents),
       |${ctes.mkString(",\n")}
       |${legs.mkString("\nUNION ALL\n")}""".stripMargin
  }

  /** Newman modularity of the LPA communities over the candidate
    * graph: Q = (4m·I − Σ_c deg_c²) / 4m² — exact rationals, one
    * truncating bp division; the LPA CTE chain is labelPropOracle's.
    */
  /** Shared by ts_store_timetravel (library resolve) and
    * ts_store_timetravel_api (format door with option("asOf", 7)).
    */
  private val timeTravelOracleSql: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us,
      |    epoch_us(ts) // 86400000000 AS day_id,
      |    CAST(round(value * 100) AS BIGINT) AS value_c FROM events),
      |d0 AS (SELECT MIN(day_id) AS d0 FROM e)
      |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_points,
      |  CAST(SUM(value_c) AS BIGINT) AS sum_value_c,
      |  MIN(ts_us) AS min_ts_us, MAX(ts_us) AS max_ts_us
      |FROM e, d0 WHERE day_id < d0.d0 + 7
      |GROUP BY 1""".stripMargin

  private def modularityOracle(rounds: Int): String = {
    val perRound = (1 to rounds).map { r =>
      s"""g$r AS (SELECT e.src AS node, l.lab, COUNT(*) AS cnt
         |  FROM ed e JOIN l${r - 1} l ON l.node = e.dst GROUP BY 1, 2),
         |l$r AS (SELECT node, lab FROM (SELECT node, lab,
         |    ROW_NUMBER() OVER (PARTITION BY node ORDER BY cnt DESC, lab ASC) AS rn FROM g$r)
         |  WHERE rn = 1)""".stripMargin
    }
    s"""WITH $shingleCtes,
       |ed AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |       UNION SELECT doc_b, doc_a FROM pairs),
       |l0 AS (SELECT DISTINCT src AS node, src AS lab FROM ed),
       |${perRound.mkString(",\n")},
       |mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM pairs),
       |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM l$rounds),
       |ia AS (SELECT CAST(COUNT(*) AS BIGINT) AS intra FROM pairs p
       |       JOIN l$rounds a ON a.node = p.doc_a
       |       JOIN l$rounds b ON b.node = p.doc_b AND b.lab = a.lab),
       |dg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg FROM ed GROUP BY 1),
       |dc AS (SELECT l.lab, CAST(SUM(dg.deg) AS BIGINT) AS dc
       |       FROM dg JOIN l$rounds l ON l.node = dg.node GROUP BY 1),
       |sm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_comm,
       |              SUM(CAST(dc AS HUGEINT) * dc) AS sdc2 FROM dc)
       |SELECT nn.n_nodes, mm.m AS n_edges, sm.n_comm AS n_communities, ia.intra AS intra_edges,
       |  CASE WHEN mm.m = 0 THEN CAST(0 AS BIGINT)
       |       ELSE CAST((CAST(10000 AS HUGEINT) * (CAST(4 AS HUGEINT) * mm.m * ia.intra - COALESCE(sm.sdc2, 0)))
       |            // (CAST(4 AS HUGEINT) * mm.m * mm.m) AS BIGINT) END AS modularity_bp
       |FROM nn, mm, ia, sm""".stripMargin
  }

  private def labelPropOracle(rounds: Int): String = {
    val perRound = (1 to rounds).map { r =>
      s"""g$r AS (SELECT e.src AS node, l.lab, COUNT(*) AS cnt
         |  FROM ed e JOIN l${r - 1} l ON l.node = e.dst GROUP BY 1, 2),
         |l$r AS (SELECT node, lab FROM (SELECT node, lab,
         |    ROW_NUMBER() OVER (PARTITION BY node ORDER BY cnt DESC, lab ASC) AS rn FROM g$r)
         |  WHERE rn = 1)""".stripMargin
    }
    s"""WITH $shingleCtes,
       |ed AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |       UNION SELECT doc_b, doc_a FROM pairs),
       |l0 AS (SELECT DISTINCT src AS node, src AS lab FROM ed),
       |${perRound.mkString(",\n")}
       |SELECT node AS doc_id, lab AS label FROM l$rounds""".stripMargin
  }

  /** integer power-iteration pagerank, unrolled; every division a
    * floor so ranks are bit-identical across engines
    */
  private def pagerankOracle(iters: Int): String = {
    val rounds = (1 to iters).map { r =>
      s"""c$r AS (SELECT e.dst AS node, CAST(SUM(r.rank_micro // o.outdeg) AS BIGINT) AS in_sum
         |  FROM ed e JOIN r${r - 1} r ON r.node = e.src JOIN od o ON o.src = e.src GROUP BY 1),
         |r$r AS (SELECT od.src AS node,
         |  CAST(150000 + 85 * COALESCE(c$r.in_sum, 0) // 100 AS BIGINT) AS rank_micro
         |  FROM od LEFT JOIN c$r ON c$r.node = od.src)""".stripMargin
    }
    s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |ed AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
       |       FROM li a JOIN li b ON b.l_orderkey = a.l_orderkey AND a.l_partkey <> b.l_partkey),
       |od AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg FROM ed GROUP BY 1),
       |r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS rank_micro FROM od),
       |${rounds.mkString(",\n")},
       |f AS (SELECT node, rank_micro,
       |   CAST(ROW_NUMBER() OVER (ORDER BY rank_micro DESC, node ASC) AS BIGINT) AS rnk FROM r$iters)
       |SELECT rnk, node, rank_micro FROM f WHERE rnk <= 20""".stripMargin
  }

  /** fertility panel under the same trained merge chain as bpe_apply,
    * aggregated onto the language enum instead of the doc grain
    */
  private def fertilityOracle(rounds: Int): String =
    s"""${bpeChain(rounds)},
       |ws AS (SELECT w, CAST(length(w) AS BIGINT) AS w_chars,
       |  CAST(len(list_filter(string_split(s, '<'), x -> x <> '')) AS BIGINT) AS n_syms FROM w$rounds),
       |dw AS (SELECT lang, unnest($toksSql) AS w FROM documents)
       |SELECT lang, COUNT(*) AS n_ws_tokens, CAST(SUM(n_syms) AS BIGINT) AS n_bpe_tokens,
       |  CAST(SUM(w_chars) AS BIGINT) AS n_chars,
       |  CAST(SUM(n_syms) * 10000 // COUNT(*) AS BIGINT) AS fertility_x10k,
       |  CAST(SUM(w_chars) * 10000 // SUM(n_syms) AS BIGINT) AS chars_per_tok_x10k
       |FROM dw JOIN ws USING (w) WHERE w <> '' GROUP BY 1""".stripMargin

  private def bpeApplyOracle(rounds: Int): String =
    s"""${bpeChain(rounds)},
       |ws AS (SELECT w, CAST(length(w) AS BIGINT) AS w_chars,
       |  CAST(len(list_filter(string_split(s, '<'), x -> x <> '')) AS BIGINT) AS n_syms FROM w$rounds),
       |dw AS (SELECT doc_id, unnest($toksSql) AS w FROM documents)
       |SELECT doc_id, COUNT(*) AS n_ws_tokens, CAST(SUM(n_syms) AS BIGINT) AS n_bpe_tokens,
       |  CAST(SUM(w_chars) AS BIGINT) AS n_chars,
       |  CAST(SUM(n_syms) * 10000 // SUM(w_chars) AS BIGINT) AS compress_bp
       |FROM dw JOIN ws USING (w) WHERE w <> '' GROUP BY 1""".stripMargin
  private val toksSql = s"string_split($normSql, ' ')"

  /** Count-min sketch replay, shared by approx_cms and its streaming
    * twin: the sketch is additive across micro-batches, so the drained
    * streaming counter table equals the batch one bit-for-bit and one
    * oracle verifies both. D=4 x W=256 cells from the exploded token
    * stream, point estimate = MIN over the 4 cells, probes = the
    * top-20 exact tokens (deterministic tiebreak); the bucket hash is
    * the house md5-hex-prefix integer on both engines.
    */
  private val cmsOracle =
    s"""WITH o AS (SELECT tok FROM (SELECT unnest($toksSql) AS tok FROM documents)
       |           WHERE length(tok) > 0),
       |e AS (SELECT tok, r FROM o, (SELECT unnest(generate_series(0, 3)) AS r)),
       |cells AS (SELECT r,
       |    CAST('0x' || substr(md5('cms' || CAST(r AS VARCHAR) || ':' || tok), 1, 12) AS BIGINT) % 256 AS bucket,
       |    CAST(COUNT(*) AS BIGINT) AS c
       |  FROM e GROUP BY 1, 2),
       |probes AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_exact FROM o GROUP BY 1
       |           ORDER BY n_exact DESC, tok ASC LIMIT 20),
       |pe AS (SELECT p.tok, p.n_exact, g.r,
       |    CAST('0x' || substr(md5('cms' || CAST(g.r AS VARCHAR) || ':' || p.tok), 1, 12) AS BIGINT) % 256 AS bucket
       |  FROM probes p, (SELECT unnest(generate_series(0, 3)) AS r) g)
       |SELECT pe.tok, pe.n_exact, MIN(cells.c) AS est_cms,
       |  MIN(cells.c) - pe.n_exact AS over_count
       |FROM pe JOIN cells ON cells.r = pe.r AND cells.bucket = pe.bucket
       |GROUP BY 1, 2""".stripMargin

  /** Per-source cap replay, shared by sample_cap_per_source and its
    * streaming-reservoir twin: kept set = first k=100 docs per source
    * under (md5('cap:'||doc_id), doc_id) order. Min-k under that
    * order is arrival-order-insensitive, so the drained streaming
    * sample equals the batch cap and one oracle verifies both.
    */
  private val capOracle =
    """WITH r AS (SELECT source, doc_id,
      |             md5('cap:' || CAST(doc_id AS VARCHAR)) AS hkey FROM documents),
      |w AS (SELECT source, doc_id,
      |        CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY hkey, doc_id) AS BIGINT) AS rn
      |      FROM r)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_total,
      |  CAST(SUM(CASE WHEN rn <= 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(SUM(CASE WHEN rn <= 100 THEN doc_id ELSE 0 END) AS BIGINT) AS kept_id_sum
      |FROM w GROUP BY 1""".stripMargin

  /** CAS chunk-dedup replay (fixed 256-byte chunks, cross-doc chunks
    * only), shared by mm_chunk_dedup and the streaming CAS ingest.
    */
  private val chunkDedupOracle =
    """WITH d AS (SELECT doc_id, text, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes FROM documents),
      |c AS (SELECT doc_id, text,
      |        unnest(generate_series(0, (n_bytes + 255) // 256 - 1)) AS chunk_idx
      |      FROM d WHERE n_bytes > 0),
      |h AS (SELECT doc_id, sha256(substr(text, CAST(chunk_idx * 256 + 1 AS INTEGER), 256)) AS chunk_sha FROM c)
      |SELECT chunk_sha, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
      |  COUNT(*) AS n_occurrences, MIN(doc_id) AS canonical_doc
      |FROM h GROUP BY 1 HAVING COUNT(DISTINCT doc_id) > 1""".stripMargin

  /** Heaps vocabulary-growth replay (first occurrence at min doc_id
    * per (source, token)), shared by text_vocab_growth and its
    * streaming-state twin.
    */
  private lazy val vocabGrowthOracle =
    s"""WITH d AS (SELECT source, doc_id, $toksSql AS toks FROM documents),
       |t AS (SELECT source, doc_id, unnest(list_distinct(toks)) AS tok FROM d),
       |f AS (SELECT source, tok, MIN(doc_id) AS doc_id FROM t WHERE length(tok) > 0 GROUP BY 1, 2),
       |np AS (SELECT source, doc_id, CAST(COUNT(*) AS BIGINT) AS n_new_tokens FROM f GROUP BY 1, 2)
       |SELECT s.source, s.doc_id,
       |  CAST(COALESCE(np.n_new_tokens, 0) AS BIGINT) AS n_new_tokens,
       |  CAST(SUM(COALESCE(np.n_new_tokens, 0))
       |       OVER (PARTITION BY s.source ORDER BY s.doc_id) AS BIGINT) AS vocab_size
       |FROM (SELECT source, doc_id FROM documents) s
       |LEFT JOIN np ON np.source = s.source AND np.doc_id = s.doc_id""".stripMargin

  /** Seasonal (type, dow, hod) profile replay, shared by
    * ts_seasonal_profile and its streaming-state twin.
    */
  private val seasonalProfileOracle =
    """SELECT event_type,
      |  (epoch_us(ts) // 86400000000 + 4) % 7 AS day_of_week,
      |  (epoch_us(ts) // 3600000000) % 24 AS hour_of_day,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_c,
      |  MIN(CAST(round(value*100) AS BIGINT)) AS min_c,
      |  MAX(CAST(round(value*100) AS BIGINT)) AS max_c
      |FROM events GROUP BY 1, 2, 3""".stripMargin

  /** OHLC replay (first/last by (ts, event_id) row-number; ≡ the
    * stream's min/max-struct), shared by ts_ohlc_1d and its
    * streaming-state twin.
    */
  private val ohlcOracle =
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
      |FROM r GROUP BY user_id, day_id""".stripMargin

  /** Heavy-hitters replay (drill stream = corpus tokens + amplified
    * tail; exact top-5), shared by text_heavy_hitters and its
    * streaming-MG twin: both publish the exact recount over a
    * candidate superset, so one oracle verifies both.
    */
  private val hhOracle =
    s"""WITH base AS (SELECT unnest($toksSql) AS w FROM documents),
       |hv AS (SELECT 'hh_' || CAST(doc_id % 5 AS VARCHAR) AS w
       |       FROM (SELECT doc_id, unnest(generate_series(1, 120)) AS i
       |             FROM documents WHERE doc_id % 4 = 0)),
       |t AS (SELECT w FROM base WHERE w <> '' UNION ALL SELECT w FROM hv),
       |c AS (SELECT w, COUNT(*) AS n FROM t GROUP BY 1),
       |r AS (SELECT w, n, CAST(ROW_NUMBER() OVER (ORDER BY n DESC, w ASC) AS BIGINT) AS rnk FROM c)
       |SELECT rnk, w, n FROM r WHERE rnk <= 5""".stripMargin

  /** per-slot b-bit agreement: parity of each integer min-hash slot */
  private val bbitAgreeSql = (0 until 12)
    .map(j => s"(CASE WHEN (a.mh$j % 2) = (b.mh$j % 2) THEN 1 ELSE 0 END)")
    .mkString(" + ")

  /** The K min-slot SELECT list, generated from Dedup.MhA/MhB so the
    * oracle replays the ENGINE's exact 61-bit-prime split multiply
    * (Dedup.mhSlotSql): slot = (th + tl*2^30 + a*xl + b) mod 2^61-1
    * with t = a*xh. All operands non-negative, every intermediate
    * < 2^63 - DuckDB BIGINT arithmetic is exact and `//`/`%` agree
    * with Spark's DIV/% on negative-free inputs.
    */
  private val mhSlotMins: String = (0 until 12).map { j =>
    val (a, b) = (graft.operators.Dedup.MhA(j), graft.operators.Dedup.MhB(j))
    s"MIN((($a*xh) // 2147483648 + (($a*xh) % 2147483648) * 1073741824 + $a*xl + $b) % 2305843009213693951) AS mh$j"
  }.mkString(",\n        ")

  /** hi + m CTEs off a `sh(doc_id, shingle)` relation: 60-bit digest
    * prefix split (xh, xl), then the K generated min slots. Embedded
    * into already-stripped oracle strings, so no margin chars here.
    */
  private val mhSlotCtes: String =
    s"""hi AS (SELECT doc_id, h60 // 1073741824 AS xh, h60 % 1073741824 AS xl
       |       FROM (SELECT doc_id,
       |               CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT) AS h60 FROM sh)),
       |m AS (SELECT doc_id,
       |        $mhSlotMins
       |      FROM hi GROUP BY doc_id)""".stripMargin

  /** shingle + minhash-band CTE chain reused by the LSH oracles */
  private val shingleCtes =
    s"""d AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |sh AS (SELECT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
       |       FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 2)) AS i
       |             FROM d WHERE len(toks) >= 3)),
       |$mhSlotCtes,
       |bs AS (SELECT doc_id, band,
       |         CASE band
       |           WHEN 0 THEN md5(CAST(mh0 AS VARCHAR) || ':' || CAST(mh1 AS VARCHAR) || ':' || CAST(mh2 AS VARCHAR))
       |           WHEN 1 THEN md5(CAST(mh3 AS VARCHAR) || ':' || CAST(mh4 AS VARCHAR) || ':' || CAST(mh5 AS VARCHAR))
       |           WHEN 2 THEN md5(CAST(mh6 AS VARCHAR) || ':' || CAST(mh7 AS VARCHAR) || ':' || CAST(mh8 AS VARCHAR))
       |           ELSE md5(CAST(mh9 AS VARCHAR) || ':' || CAST(mh10 AS VARCHAR) || ':' || CAST(mh11 AS VARCHAR)) END AS sig
       |       FROM (SELECT m.*, unnest([0, 1, 2, 3]) AS band FROM m)),
       |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |          FROM bs a JOIN bs b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id)""".stripMargin

  /** the LSH CTE chain restricted to the deterministic ~50% md5-band
    * eval sample — the recall/precision evaluation corpus
    */
  private val shingleCtesSampled =
    """sdocs AS (SELECT * FROM documents
      |  WHERE (instr('0123456789abcdef', substr(md5('eval:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
      |      + (instr('0123456789abcdef', substr(md5('eval:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1) < 128),
      |""".stripMargin + shingleCtes.replace("FROM documents", "FROM sdocs")

  /** lexical TF-IDF top-10 oracle, shared by the inline search and
    * the persisted-index roundtrip (byte-identical by construction)
    */
  private lazy val searchTopkOracleSql: String =
    s"""WITH t AS (SELECT doc_id, unnest($toksSql) AS tok FROM documents),
       |q AS (SELECT tok FROM (VALUES ('fast'), ('key'), ('sort')) v(tok)),
       |tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
       |       FROM t JOIN q USING (tok) GROUP BY 1, 2),
       |df AS (SELECT tok, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
       |       FROM t JOIN q USING (tok) GROUP BY 1),
       |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM documents),
       |sc AS (SELECT doc_id, CAST(SUM(tf * (nd * 1000000 // df)) AS BIGINT) AS score
       |       FROM tf JOIN df USING (tok), n GROUP BY 1),
       |r AS (SELECT doc_id, score,
       |        CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rnk FROM sc)
       |SELECT rnk, doc_id, score FROM r WHERE rnk <= 10""".stripMargin

  /** interval-join oracle, shared by ts_range_join and its streaming
    * twin (whose AvailableNow drain emits the same matched set)
    */
  private val rangeJoinOracleSql: String =
    """WITH ev AS (SELECT event_id, user_id, ts, event_type,
      |                   CAST(round(value * 100) AS BIGINT) AS value_c FROM events),
      |w AS (SELECT event_id AS window_id, user_id, ts AS s FROM ev
      |      WHERE event_type = 'error' AND value_c >= 900)
      |SELECT w.window_id, w.user_id, epoch_us(w.s) AS start_us,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(e.value_c) AS BIGINT) AS sum_value_c,
      |  CAST(SUM(CASE WHEN e.event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error
      |FROM w JOIN ev e
      |  ON e.user_id = w.user_id AND e.ts >= w.s AND e.ts < w.s + INTERVAL 600 SECOND
      |GROUP BY 1, 2, 3""".stripMargin

  /** bands×rows sweep oracle: every banding's member-level band pairs
    * off the shared sampled signature CTEs, scored against the same
    * exact-Jaccard truth as dedup_recall_eval
    */
  private lazy val lshTuneOracleSql: String = {
    val bandSelects = graft.operators.Dedup.TuneConfigs
      .flatMap { case (b, r) =>
        (0 until b).map { i =>
          val cat = (0 until r).map(j => s"CAST(mh${i * r + j} AS VARCHAR)").mkString(" || ':' || ")
          s"SELECT doc_id, '${b}x$r' AS cfg, $i AS band, md5($cat) AS sig FROM m"
        }
      }
      .mkString(" UNION ALL ")
    s"""WITH $shingleCtesSampled,
       |tb AS ($bandSelects),
       |tp AS (SELECT DISTINCT a.cfg, a.doc_id AS doc_a, b.doc_id AS doc_b
       |       FROM tb a JOIN tb b ON b.cfg = a.cfg AND b.band = a.band AND b.sig = a.sig AND a.doc_id < b.doc_id),
       |u AS (SELECT DISTINCT doc_id, shingle FROM sh),
       |cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM u GROUP BY 1),
       |ip AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS inter_n
       |       FROM u x JOIN u y ON y.shingle = x.shingle AND x.doc_id < y.doc_id GROUP BY 1, 2),
       |tr AS (SELECT ip.doc_a, ip.doc_b FROM ip
       |       JOIN cnt ca ON ca.doc_id = ip.doc_a JOIN cnt cb ON cb.doc_id = ip.doc_b
       |       WHERE ip.inter_n * 10 >= (ca.n_sh + cb.n_sh - ip.inter_n) * 8),
       |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM tr),
       |pc AS (SELECT cfg, CAST(COUNT(*) AS BIGINT) AS n_cand FROM tp GROUP BY 1),
       |hc AS (SELECT tp.cfg, CAST(COUNT(*) AS BIGINT) AS n_hits
       |       FROM tp JOIN tr ON tr.doc_a = tp.doc_a AND tr.doc_b = tp.doc_b GROUP BY 1)
       |SELECT pc.cfg, nt.n_truth, pc.n_cand,
       |  CAST(COALESCE(hc.n_hits, 0) AS BIGINT) AS n_hits,
       |  CAST(CASE WHEN nt.n_truth > 0 THEN COALESCE(hc.n_hits, 0) * 10000 // nt.n_truth ELSE 10000 END AS BIGINT) AS recall_bp,
       |  CAST(CASE WHEN pc.n_cand > 0 THEN COALESCE(hc.n_hits, 0) * 10000 // pc.n_cand ELSE 10000 END AS BIGINT) AS precision_bp
       |FROM pc LEFT JOIN hc ON hc.cfg = pc.cfg, nt""".stripMargin
  }

  /** quantized-embedding CTEs reused by the similarity oracles */
  /** HDR latency sketch oracle — shared by the batch operator and its
    * streaming dual (HDR counters are additive, so the drained stream
    * state equals the batch sketch by algebra; the probe tier is the
    * same code on the Spark side). Codes: exact below 16, then log₂
    * octaves × 8 linear sub-buckets via the length(bin(·)) msb trick;
    * estimates are bucket midpoints; the exact tier is the
    * rel_latency_percentiles rank select.
    */
  private val hdrOracleSql =
    """WITH lat AS (SELECT o_orderpriority,
      |    CAST(CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE) AS BIGINT) AS days
      |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey),
      |sk AS (SELECT o_orderpriority,
      |         CASE WHEN days < 16 THEN days
      |              ELSE (length(bin(days)) - 4) * 8 + 8 + ((days >> (length(bin(days)) - 4)) & 7) END AS code,
      |         CAST(COUNT(*) AS BIGINT) AS cnt
      |       FROM lat GROUP BY 1, 2),
      |cum AS (SELECT *, CAST(SUM(cnt) OVER (PARTITION BY o_orderpriority ORDER BY code) AS BIGINT) AS cum,
      |               CAST(SUM(cnt) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS n
      |        FROM sk),
      |mids AS (SELECT *, CASE WHEN code < 16 THEN code
      |           ELSE ((8 + (code - 8) % 8) << ((code - 8) // 8))
      |                + ((CAST(1 AS BIGINT) << ((code - 8) // 8)) - 1) // 2 END AS mid
      |         FROM cum),
      |est AS (SELECT o_orderpriority, MAX(n) AS n,
      |          MAX(CASE WHEN ceil(0.5 * n) > cum - cnt AND ceil(0.5 * n) <= cum THEN mid END) AS p50_est,
      |          MAX(CASE WHEN ceil(0.9 * n) > cum - cnt AND ceil(0.9 * n) <= cum THEN mid END) AS p90_est,
      |          MAX(CASE WHEN ceil(0.99 * n) > cum - cnt AND ceil(0.99 * n) <= cum THEN mid END) AS p99_est
      |        FROM mids GROUP BY 1),
      |r AS (SELECT o_orderpriority, days,
      |        ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY days) AS rnk,
      |        COUNT(*) OVER (PARTITION BY o_orderpriority) AS nn
      |      FROM lat),
      |ex AS (SELECT o_orderpriority,
      |         MAX(CASE WHEN rnk = CAST(ceil(0.5 * nn) AS BIGINT) THEN days END) AS p50_exact,
      |         MAX(CASE WHEN rnk = CAST(ceil(0.9 * nn) AS BIGINT) THEN days END) AS p90_exact,
      |         MAX(CASE WHEN rnk = CAST(ceil(0.99 * nn) AS BIGINT) THEN days END) AS p99_exact
      |       FROM r GROUP BY 1)
      |SELECT o_orderpriority, n,
      |  p50_est, p50_exact, abs(p50_est - p50_exact) * 10000 // greatest(p50_exact, 1) AS p50_err_bp,
      |  p90_est, p90_exact, abs(p90_est - p90_exact) * 10000 // greatest(p90_exact, 1) AS p90_err_bp,
      |  p99_est, p99_exact, abs(p99_est - p99_exact) * 10000 // greatest(p99_exact, 1) AS p99_err_bp
      |FROM est JOIN ex USING (o_orderpriority)""".stripMargin

  /** per-series lossless-roundtrip summary over raw events — shared by
    * the parquet store roundtrip and the CSV ingest path (the CSV feed
    * must reproduce it bit-for-bit)
    */
  private val storeRoundtripOracleSql =
    """SELECT user_id, COUNT(*) AS n_points,
      |  MIN(epoch_us(ts)) AS min_ts_us, MAX(epoch_us(ts)) AS max_ts_us,
      |  CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c,
      |  CAST(SUM(event_id) AS BIGINT) AS sum_event_id
      |FROM events GROUP BY user_id""".stripMargin

  private val quantCtes =
    """q AS (SELECT vec_id, i, CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS v
      |      FROM (SELECT vec_id, embedding, unnest(generate_series(1, 64)) AS i FROM embeddings)),
      |n AS (SELECT vec_id, CAST(SUM(v * v) AS BIGINT) AS n2 FROM q GROUP BY 1)""".stripMargin

  /** incremental-dedup oracle, shared by the batch operator and the
    * streaming loop (whose single-batch drain emits the same set)
    */
  /** one unrolled PQ Lloyd iteration over the TRAINING SAMPLE svt:
    * assign sub-vectors to cb{t}, floor-average members into cb{t+1}
    * (DuckDB // == Spark's (s - pmod(s, n)) DIV n on non-negative
    * counts)
    */
  /** NOTE the centroid average is the exact integer FLOOR
    * (s − ((s%n)+n)%n) // n — NOT plain `//`: normalized components go
    * negative, DuckDB `//` truncates toward zero there, and the Spark
    * side floors via (s − pmod(s, n)) DIV n. The top-k searches are
    * insensitive to the ±1 component drift a trunc/floor mismatch
    * causes, but emb_pq_distortion's exact d2 sums are not — the
    * ledger is what exposed the divergence.
    */
  private def pqLloydCtes(iters: Int): String =
    (0 until iters).map { t =>
      s"""ad$t AS (SELECT s.vec_id, s.mi, c.code, CAST(SUM((s.v - c.v) * (s.v - c.v)) AS BIGINT) AS d2
         |        FROM svt s JOIN cb$t c ON c.mi = s.mi AND c.i = s.i GROUP BY 1, 2, 3),
         |as$t AS (SELECT vec_id, mi, code FROM
         |        (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, mi ORDER BY d2 ASC, code ASC) AS rn
         |         FROM ad$t) WHERE rn = 1),
         |cb${t + 1} AS (SELECT a.code, a.mi, s.i,
         |         CAST((SUM(s.v) - (((SUM(s.v) % COUNT(*)) + COUNT(*)) % COUNT(*))) // COUNT(*) AS BIGINT) AS v
         |       FROM as$t a JOIN svt s ON s.vec_id = a.vec_id AND s.mi = a.mi
         |       GROUP BY 1, 2, s.i)""".stripMargin
    }.mkString(",\n")

  /** bucketed cosine range search (all neighbors >= threshold) —
    * shared by ann_range_search and its streaming dual
    */
  /** IVF-PQ oracle — shared verbatim by the in-memory search and
    * the persisted-index search (the index roundtrip must be
    * byte-identical). `trainN` bounds the Lloyd sample: 500 for the
    * full builds, 400 for the append drill whose training must see
    * only the old half.
    */
  private lazy val ivfPqOracleSql: String = ivfPqOracle(500)

  /** Exact top-10 cosine neighbors for the 5 probes — the ANN ground
    * truth, shared by `ann_topk_bruteforce` and the recall evaluation.
    */
  /** per-source quality books, shared by the batch report and the
    * streaming dual (whose drain emits the same additive counters)
    */
  private lazy val qualityRulesOracleSql: String =
    s"""WITH t AS (SELECT source, $normSql AS nrm, $toksSql AS toks FROM documents),
       |m AS (SELECT source,
       |        CAST(len(toks) AS BIGINT) AS n_toks,
       |        CAST(length(nrm) - (len(toks) - 1) AS BIGINT) AS sum_len,
       |        CAST(len(list_filter(toks, x -> list_contains(['the','a','of','to','and','in','is','it'], x))) AS BIGINT) AS n_stop
       |      FROM t),
       |r AS (SELECT source,
       |        CASE WHEN n_toks < 25 THEN 1 ELSE 0 END AS fail_short,
       |        CASE WHEN n_toks > 80 THEN 1 ELSE 0 END AS fail_long,
       |        CASE WHEN sum_len * 1000000 // n_toks < 4000000
       |               OR sum_len * 1000000 // n_toks > 5000000 THEN 1 ELSE 0 END AS fail_wordlen,
       |        CASE WHEN n_stop < 2 THEN 1 ELSE 0 END AS fail_stop
       |      FROM m)
       |SELECT source, COUNT(*) AS n_docs,
       |  CAST(SUM(fail_short) AS BIGINT) AS n_fail_short,
       |  CAST(SUM(fail_long) AS BIGINT) AS n_fail_long,
       |  CAST(SUM(fail_wordlen) AS BIGINT) AS n_fail_wordlen,
       |  CAST(SUM(fail_stop) AS BIGINT) AS n_fail_stop,
       |  CAST(SUM(CASE WHEN fail_short + fail_long + fail_wordlen + fail_stop = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
       |FROM r GROUP BY 1""".stripMargin

  /** magic-byte modality classification, shared by the doc-grain
    * route and the mix plan built on top of it
    */
  private lazy val modalityRouteOracleSql: String =
    """WITH p AS (SELECT doc_id,
      |    (strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1) % 5 AS k,
      |    lower(hex(encode(text))) AS body_hex FROM documents),
      |h AS (SELECT doc_id,
      |    ['ffd8ffe000104a464946','89504e470d0a1a0a',
      |     '52494646aabbccdd57415645','000000186674797069736f6d',
      |     ''][CAST(k + 1 AS INTEGER)] || body_hex AS ph FROM p),
      |c AS (SELECT doc_id, ph,
      |    CASE WHEN ph LIKE 'ffd8ff%' THEN 'jpeg'
      |         WHEN ph LIKE '89504e47%' THEN 'png'
      |         WHEN ph LIKE '52494646%' AND substr(ph, 17, 8) = '57415645' THEN 'wav'
      |         WHEN substr(ph, 9, 8) = '66747970' THEN 'mp4'
      |         ELSE 'raw_text' END AS container FROM h)
      |SELECT doc_id, CAST(length(ph) // 2 AS BIGINT) AS n_bytes, container,
      |  CASE WHEN container IN ('jpeg','png') THEN 'image'
      |       WHEN container = 'wav' THEN 'audio'
      |       WHEN container = 'mp4' THEN 'video'
      |       ELSE 'text' END AS modality,
      |  CASE WHEN container IN ('jpeg','png') THEN 'img-decode'
      |       WHEN container = 'wav' THEN 'audio-decode'
      |       WHEN container = 'mp4' THEN 'frame-sample'
      |       ELSE 'tokenize' END AS queue
      |FROM c""".stripMargin

  /** IVF probe-budget recall curve: shared assignment/probe-ranking
    * CTEs, one candidate-scoring tier per budget (r <= p is a nested
    * prefix of the shared ranked probe cells), each scored against
    * the brute-force truth tier
    */
  /** SQ8 shortlist-depth recall curve: the ann_sq_search CTE chain
    * (per-dim grid, dequantize, ADC ranking) shared across depths; per
    * depth d, exact-cosine rerank among sq_rnk <= d, scored against
    * the brute-force truth
    */
  private lazy val recallVsShortlistOracleSql: String = {
    val depths = Seq(10, 30, 50)
    val perDepth = depths
      .map { d =>
        s"""tk$d AS (SELECT probe_id, neighbor_id FROM (
           |          SELECT s.probe_id, s.neighbor_id,
           |            ROW_NUMBER() OVER (PARTITION BY s.probe_id ORDER BY
           |              CAST(t.dot AS DOUBLE) / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)) DESC,
           |              s.neighbor_id ASC) AS rnk
           |          FROM sl s JOIN td t ON t.probe_id = s.probe_id AND t.neighbor_id = s.neighbor_id
           |          JOIN n na ON na.vec_id = s.probe_id JOIN n nb ON nb.vec_id = s.neighbor_id
           |          WHERE s.sq_rnk <= $d) WHERE rnk <= 10)""".stripMargin
      }
      .mkString(",\n")
    val selects = depths
      .map { d =>
        s"""SELECT t.probe_id, CAST($d AS BIGINT) AS depth,
           |  CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_hits,
           |  CAST(COUNT(a.neighbor_id) * 10000 // 10 AS BIGINT) AS recall_bp
           |FROM tr t LEFT JOIN tk$d a
           |  ON a.probe_id = t.probe_id AND a.neighbor_id = t.neighbor_id
           |GROUP BY 1, 2""".stripMargin
      }
      .mkString("\nUNION ALL\n")
    s"""WITH $quantCtes,
       |rng AS (SELECT i, MIN(v) AS lo, MAX(v) AS hi, GREATEST(MAX(v) - MIN(v), 1) AS span
       |        FROM q GROUP BY 1),
       |dqv AS (SELECT q.vec_id, q.i,
       |          CAST(r.lo + ((((q.v - r.lo) * 255) // r.span) * r.span) // 255 AS BIGINT) AS dq
       |        FROM q JOIN rng r ON r.i = q.i),
       |dn AS (SELECT vec_id, GREATEST(CAST(SUM(dq * dq) AS BIGINT), 1) AS dn2 FROM dqv GROUP BY 1),
       |ad AS (SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id, CAST(SUM(a.v * b.dq) AS BIGINT) AS adot
       |       FROM (SELECT * FROM q WHERE vec_id < 5) a
       |       JOIN dqv b ON b.i = a.i AND b.vec_id != a.vec_id GROUP BY 1, 2),
       |sl AS (SELECT probe_id, neighbor_id,
       |         CAST(ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY
       |           CAST(adot AS DOUBLE) / sqrt(CAST(pa.n2 AS DOUBLE) * CAST(d.dn2 AS DOUBLE)) DESC,
       |           neighbor_id ASC) AS BIGINT) AS sq_rnk
       |       FROM ad JOIN n pa ON pa.vec_id = probe_id JOIN dn d ON d.vec_id = neighbor_id),
       |td AS (SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id, CAST(SUM(a.v * b.v) AS BIGINT) AS dot
       |       FROM (SELECT * FROM q WHERE vec_id < 5) a
       |       JOIN q b ON b.i = a.i AND b.vec_id != a.vec_id GROUP BY 1, 2),
       |tr AS (SELECT probe_id, neighbor_id FROM (
       |        SELECT probe_id, neighbor_id,
       |          ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY
       |            CAST(dot AS DOUBLE) / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)) DESC,
       |            neighbor_id ASC) AS rnk
       |        FROM td JOIN n na ON na.vec_id = probe_id JOIN n nb ON nb.vec_id = neighbor_id)
       |      WHERE rnk <= 10),
       |$perDepth
       |$selects""".stripMargin
  }

  private lazy val recallVsNprobeOracleSql: String = {
    val budgets = Seq(1, 2, 3, 4)
    val perBudget = budgets
      .map { p =>
        s"""cand$p AS (SELECT pr.probe_id, a.vec_id AS neighbor_id
           |        FROM pr JOIN asg a ON a.cell = pr.cell AND a.vec_id != pr.probe_id
           |        WHERE pr.r <= $p),
           |dt$p AS (SELECT c.probe_id, c.neighbor_id, CAST(SUM(x.v * y.v) AS BIGINT) AS dot
           |       FROM cand$p c JOIN q x ON x.vec_id = c.probe_id
           |       JOIN q y ON y.vec_id = c.neighbor_id AND y.i = x.i GROUP BY 1, 2),
           |tk$p AS (SELECT probe_id, neighbor_id FROM (
           |          SELECT probe_id, neighbor_id,
           |            ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY
           |              CAST(dot AS DOUBLE) / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)) DESC,
           |              neighbor_id ASC) AS rnk
           |          FROM dt$p JOIN n na ON na.vec_id = probe_id JOIN n nb ON nb.vec_id = neighbor_id)
           |        WHERE rnk <= 10)""".stripMargin
      }
      .mkString(",\n")
    val selects = budgets
      .map { p =>
        s"""SELECT t.probe_id, CAST($p AS BIGINT) AS nprobe,
           |  CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_hits,
           |  CAST(COUNT(a.neighbor_id) * 10000 // 10 AS BIGINT) AS recall_bp
           |FROM tr t LEFT JOIN tk$p a
           |  ON a.probe_id = t.probe_id AND a.neighbor_id = t.neighbor_id
           |GROUP BY 1, 2""".stripMargin
      }
      .mkString("\nUNION ALL\n")
    s"""WITH $quantCtes,
       |seed AS (SELECT vec_id - 100 AS c, i, v FROM q WHERE vec_id >= 100 AND vec_id < 108),
       |sn AS (SELECT c, CAST(SUM(v * v) AS BIGINT) AS c2 FROM seed GROUP BY 1),
       |ad AS (SELECT q.vec_id, s.c, CAST(SUM(q.v * s.v) AS BIGINT) AS dot
       |       FROM q JOIN seed s ON s.i = q.i GROUP BY 1, 2),
       |dist AS (SELECT ad.vec_id, ad.c, n.n2 + sn.c2 - 2 * ad.dot AS d2
       |         FROM ad JOIN n ON n.vec_id = ad.vec_id JOIN sn ON sn.c = ad.c),
       |asg AS (SELECT vec_id, c AS cell FROM (
       |          SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2 ASC, c ASC) AS r
       |          FROM dist) WHERE r = 1),
       |pr AS (SELECT vec_id AS probe_id, c AS cell, r FROM (
       |         SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2 ASC, c ASC) AS r
       |         FROM dist WHERE vec_id < 5)),
       |td AS (SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id, CAST(SUM(a.v * b.v) AS BIGINT) AS dot
       |       FROM (SELECT * FROM q WHERE vec_id < 5) a
       |       JOIN q b ON b.i = a.i AND b.vec_id != a.vec_id GROUP BY 1, 2),
       |tr AS (SELECT probe_id, neighbor_id FROM (
       |        SELECT probe_id, neighbor_id,
       |          ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY
       |            CAST(dot AS DOUBLE) / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)) DESC,
       |            neighbor_id ASC) AS rnk
       |        FROM td JOIN n na ON na.vec_id = probe_id JOIN n nb ON nb.vec_id = neighbor_id)
       |      WHERE rnk <= 10),
       |$perBudget
       |$selects""".stripMargin
  }

  /** hyperplane-budget recall curve: per plane count P, the
    * single-bucket LSH top-10 (the ann_lsh_bucketed plane/bucket
    * formulas over planes 0..P−1) scored against the brute-force truth
    */
  private lazy val recallVsNplanesOracleSql: String = {
    val budgets = Seq(2, 4, 6)
    val perBudget = budgets
      .map { p =>
        s"""pl$p AS (SELECT p, i,
           |         2 * (instr('0123456789abcdef',
           |                    substr(md5('plane:' || CAST(p AS VARCHAR) || ':' || CAST(i AS VARCHAR)), 1, 1)) - 1) - 15 AS w
           |       FROM (SELECT unnest(generate_series(0, ${p - 1})) AS p), (SELECT unnest(generate_series(1, 64)) AS i)),
           |db$p AS (SELECT q.vec_id, pl.p, CAST(SUM(q.v * pl.w) AS BIGINT) AS dt
           |       FROM q JOIN pl$p pl ON pl.i = q.i GROUP BY 1, 2),
           |bk$p AS (SELECT vec_id,
           |         CAST(SUM(CASE WHEN dt > 0 THEN (1 << CAST(p AS INTEGER)) ELSE 0 END) AS BIGINT) AS bucket
           |       FROM db$p GROUP BY 1),
           |cd$p AS (SELECT pr.vec_id AS probe_id, bk.vec_id AS neighbor_id
           |       FROM (SELECT * FROM bk$p WHERE vec_id < 5) pr
           |       JOIN bk$p bk ON bk.bucket = pr.bucket AND bk.vec_id != pr.vec_id),
           |dt$p AS (SELECT c.probe_id, c.neighbor_id, CAST(SUM(a.v * b.v) AS BIGINT) AS dot
           |       FROM cd$p c JOIN q a ON a.vec_id = c.probe_id
           |       JOIN q b ON b.vec_id = c.neighbor_id AND b.i = a.i GROUP BY 1, 2),
           |tk$p AS (SELECT probe_id, neighbor_id FROM (
           |          SELECT probe_id, neighbor_id,
           |            ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY
           |              CAST(dot AS DOUBLE) / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)) DESC,
           |              neighbor_id ASC) AS rnk
           |          FROM dt$p JOIN n na ON na.vec_id = probe_id JOIN n nb ON nb.vec_id = neighbor_id)
           |        WHERE rnk <= 10)""".stripMargin
      }
      .mkString(",\n")
    val selects = budgets
      .map { p =>
        s"""SELECT t.probe_id, CAST($p AS BIGINT) AS nplanes,
           |  CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_hits,
           |  CAST(COUNT(a.neighbor_id) * 10000 // 10 AS BIGINT) AS recall_bp
           |FROM tr t LEFT JOIN tk$p a
           |  ON a.probe_id = t.probe_id AND a.neighbor_id = t.neighbor_id
           |GROUP BY 1, 2""".stripMargin
      }
      .mkString("\nUNION ALL\n")
    s"""WITH $quantCtes,
       |td AS (SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id, CAST(SUM(a.v * b.v) AS BIGINT) AS dot
       |       FROM (SELECT * FROM q WHERE vec_id < 5) a
       |       JOIN q b ON b.i = a.i AND b.vec_id != a.vec_id GROUP BY 1, 2),
       |tr AS (SELECT probe_id, neighbor_id FROM (
       |         SELECT probe_id, neighbor_id,
       |           ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY
       |             CAST(dot AS DOUBLE) / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)) DESC,
       |             neighbor_id ASC) AS rnk
       |         FROM td JOIN n na ON na.vec_id = probe_id JOIN n nb ON nb.vec_id = neighbor_id)
       |       WHERE rnk <= 10),
       |$perBudget
       |$selects""".stripMargin
  }

  private lazy val bruteTopkOracleSql: String =
    s"""WITH $quantCtes,
       |d AS (SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id, CAST(SUM(a.v * b.v) AS BIGINT) AS dot
       |      FROM (SELECT * FROM q WHERE vec_id < 5) a
       |      JOIN q b ON b.i = a.i AND b.vec_id != a.vec_id GROUP BY 1, 2),
       |s AS (SELECT probe_id, neighbor_id,
       |             CAST(dot AS DOUBLE) / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)) AS cos
       |      FROM d JOIN n na ON na.vec_id = probe_id JOIN n nb ON nb.vec_id = neighbor_id)
       |SELECT probe_id, neighbor_id,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id ASC) AS BIGINT) AS rnk,
       |  CAST(round(cos * 1000000) AS BIGINT) AS cos_micro
       |FROM s QUALIFY rnk <= 10""".stripMargin

  /** prefix-dimension recall oracle: per d, the exact prefix top-10
    * on the shared quantized (vec_id, i, v) grain with the same
    * GREATEST(n2, 1) zero-norm clamp as the Spark side, each tier
    * scored against the full-dimension (d = 64) tier
    */
  private lazy val matryoshkaOracleSql: String = {
    val dims = Seq(8, 16, 32, 64)
    val tiers = dims
      .map { d =>
        s"""n$d AS (SELECT vec_id, GREATEST(CAST(SUM(v * v) AS BIGINT), 1) AS n2 FROM q WHERE i <= $d GROUP BY 1),
           |d$d AS (SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id, CAST(SUM(a.v * b.v) AS BIGINT) AS dot
           |        FROM (SELECT * FROM q WHERE vec_id < 5 AND i <= $d) a
           |        JOIN q b ON b.i = a.i AND b.vec_id != a.vec_id GROUP BY 1, 2),
           |t$d AS (SELECT probe_id, neighbor_id FROM (
           |          SELECT probe_id, neighbor_id,
           |            ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY
           |              CAST(dot AS DOUBLE) / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)) DESC,
           |              neighbor_id ASC) AS rnk
           |          FROM d$d JOIN n$d na ON na.vec_id = probe_id JOIN n$d nb ON nb.vec_id = neighbor_id)
           |        WHERE rnk <= 10)""".stripMargin
      }
      .mkString(",\n")
    val selects = dims
      .map { d =>
        s"""SELECT t.probe_id, CAST($d AS BIGINT) AS dims,
           |  CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_hits,
           |  CAST(COUNT(a.neighbor_id) * 10000 // 10 AS BIGINT) AS recall_bp
           |FROM t64 t LEFT JOIN t$d a ON a.probe_id = t.probe_id AND a.neighbor_id = t.neighbor_id
           |GROUP BY 1, 2""".stripMargin
      }
      .mkString("\nUNION ALL\n")
    s"WITH $quantCtes,\n$tiers\n$selects"
  }

  /** @param deleteCond extra AND-condition on candidate codes (e.g.
    *        " AND co.vec_id % 7 != 6") — the tombstone-delete oracle:
    *        the model CTEs upstream are untouched (no retrain), only
    *        the candidate codes vanish, exactly like the store rewrite
    */
  private def ivfPqOracle(trainN: Int, deleteCond: String = ""): String =
    s"""WITH $quantCtes,
         |qn AS (SELECT q.vec_id, q.i,
         |         CAST(round(CAST(q.v AS DOUBLE) * 1000000 / sqrt(CAST(n.n2 AS DOUBLE))) AS BIGINT) AS v
         |       FROM q JOIN n ON n.vec_id = q.vec_id),
         |qn2 AS (SELECT vec_id, CAST(SUM(v * v) AS BIGINT) AS n2 FROM qn GROUP BY 1),
         |cen AS (SELECT vec_id - 100 AS cell, i, v FROM qn WHERE vec_id BETWEEN 100 AND 107),
         |cn AS (SELECT cell, CAST(SUM(v * v) AS BIGINT) AS c2 FROM cen GROUP BY 1),
         |cd AS (SELECT qn.vec_id, cen.cell, CAST(SUM(qn.v * cen.v) AS BIGINT) AS dot
         |       FROM qn JOIN cen ON cen.i = qn.i GROUP BY 1, 2),
         |dist AS (SELECT cd.vec_id, cd.cell, q2.n2 + cn.c2 - 2 * cd.dot AS d2
         |         FROM cd JOIN qn2 q2 ON q2.vec_id = cd.vec_id JOIN cn ON cn.cell = cd.cell),
         |asg AS (SELECT vec_id, cell FROM (
         |          SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS r
         |          FROM dist) WHERE r = 1),
         |resid AS (SELECT qn.vec_id, asg.cell, qn.i, qn.v - cen.v AS v
         |          FROM qn JOIN asg ON asg.vec_id = qn.vec_id
         |          JOIN cen ON cen.cell = asg.cell AND cen.i = qn.i),
         |rs AS (SELECT vec_id, cell, CAST((i - 1) // 8 AS BIGINT) AS mi, i, v FROM resid),
         |svt AS (SELECT vec_id, mi, i, v FROM rs WHERE vec_id < $trainN),
         |cb0 AS (SELECT vec_id - 200 AS code, mi, i, v FROM rs WHERE vec_id BETWEEN 200 AND 263),
         |${pqLloydCtes(3)},
         |cb AS (SELECT code, mi, i, v FROM cb3),
         |ad AS (SELECT s.vec_id, s.mi, s.cell, c.code,
         |         CAST(SUM((s.v - c.v) * (s.v - c.v)) AS BIGINT) AS d2
         |       FROM rs s JOIN cb c ON c.mi = s.mi AND c.i = s.i GROUP BY 1, 2, 3, 4),
         |codes AS (SELECT vec_id, mi, cell, code FROM
         |          (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, mi ORDER BY d2 ASC, code ASC) AS rn
         |           FROM ad) WHERE rn = 1),
         |pc AS (SELECT vec_id AS probe_id, cell FROM (
         |         SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS r
         |         FROM dist WHERE vec_id < 5) WHERE r <= 4),
         |presid AS (SELECT pc.probe_id, pc.cell, qn.i, qn.v - cen.v AS v
         |           FROM pc JOIN qn ON qn.vec_id = pc.probe_id
         |           JOIN cen ON cen.cell = pc.cell AND cen.i = qn.i),
         |prs AS (SELECT probe_id, cell, CAST((i - 1) // 8 AS BIGINT) AS mi, i, v FROM presid),
         |lut AS (SELECT p.probe_id, p.cell, p.mi, c.code,
         |          CAST(SUM((p.v - c.v) * (p.v - c.v)) AS BIGINT) AS d2
         |        FROM prs p JOIN cb c ON c.mi = p.mi AND c.i = p.i GROUP BY 1, 2, 3, 4),
         |ac AS (SELECT l.probe_id, co.vec_id AS neighbor_id, CAST(SUM(l.d2) AS BIGINT) AS adist
         |       FROM codes co JOIN lut l ON l.cell = co.cell AND l.mi = co.mi AND l.code = co.code
         |       WHERE co.vec_id != l.probe_id$deleteCond GROUP BY 1, 2),
         |sl AS (SELECT probe_id, neighbor_id FROM
         |        (SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY adist ASC, neighbor_id ASC) AS srnk
         |         FROM ac) WHERE srnk <= 100),
         |dt AS (SELECT sl.probe_id, sl.neighbor_id, CAST(SUM(a.v * b.v) AS BIGINT) AS dot
         |       FROM sl JOIN q a ON a.vec_id = sl.probe_id
         |       JOIN q b ON b.vec_id = sl.neighbor_id AND b.i = a.i
         |       GROUP BY 1, 2),
         |cc AS (SELECT dt.probe_id, dt.neighbor_id,
         |         CAST(dt.dot AS DOUBLE) / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)) AS cos
         |       FROM dt JOIN n na ON na.vec_id = dt.probe_id JOIN n nb ON nb.vec_id = dt.neighbor_id)
         |SELECT probe_id, neighbor_id,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id ASC) AS BIGINT) AS rnk,
         |  CAST(round(cos * 1000000) AS BIGINT) AS cos_micro
         |FROM cc QUALIFY rnk <= 10""".stripMargin

  /** LOCF grid oracle — shared by the batch gapfill and its
    * streaming dual (replay must reproduce the batch grid)
    */
  private lazy val gapfillOracleSql: String =
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

  private lazy val rangeSearchOracleSql: String =
    s"""WITH $quantCtes,
       |pl AS (SELECT p, i,
       |         2 * (instr('0123456789abcdef',
       |                    substr(md5('plane:' || CAST(p AS VARCHAR) || ':' || CAST(i AS VARCHAR)), 1, 1)) - 1) - 15 AS w
       |       FROM (SELECT unnest(generate_series(0, 3)) AS p), (SELECT unnest(generate_series(1, 64)) AS i)),
       |db AS (SELECT q.vec_id, pl.p, CAST(SUM(q.v * pl.w) AS BIGINT) AS dt
       |       FROM q JOIN pl ON pl.i = q.i GROUP BY 1, 2),
       |bk AS (SELECT vec_id,
       |         CAST(SUM(CASE WHEN dt > 0 THEN (1 << CAST(p AS INTEGER)) ELSE 0 END) AS BIGINT) AS bucket
       |       FROM db GROUP BY 1),
       |cd AS (SELECT pr.vec_id AS probe_id, bk.vec_id AS neighbor_id, pr.bucket
       |       FROM (SELECT * FROM bk WHERE vec_id < 5) pr
       |       JOIN bk ON bk.bucket = pr.bucket AND bk.vec_id != pr.vec_id),
       |dt AS (SELECT cd.probe_id, cd.neighbor_id, cd.bucket, CAST(SUM(a.v * b.v) AS BIGINT) AS dot
       |       FROM cd JOIN q a ON a.vec_id = cd.probe_id
       |       JOIN q b ON b.vec_id = cd.neighbor_id AND b.i = a.i
       |       GROUP BY 1, 2, 3),
       |sc AS (SELECT probe_id, neighbor_id, bucket,
       |              CAST(dot AS DOUBLE) / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)) AS cos
       |       FROM dt JOIN n na ON na.vec_id = probe_id JOIN n nb ON nb.vec_id = neighbor_id)
       |SELECT probe_id, neighbor_id, bucket,
       |  CAST(round(cos * 1000000) AS BIGINT) AS cos_micro
       |FROM sc WHERE CAST(round(cos * 1000000) AS BIGINT) >= 150000""".stripMargin

  private val incrementalOracleSql: String =
    s"""WITH $shingleCtes,
       |h AS (SELECT doc_id, md5($normSql) AS th FROM documents),
       |ex AS (SELECT i.doc_id AS new_doc_id, c.doc_id AS match_doc_id, 'exact' AS kind
       |       FROM h i JOIN h c ON c.th = i.th
       |       WHERE i.doc_id >= 400 AND c.doc_id < 400),
       |nr AS (SELECT DISTINCT b.doc_id AS new_doc_id, a.doc_id AS match_doc_id, 'near' AS kind
       |       FROM bs a JOIN bs b ON b.band = a.band AND b.sig = a.sig
       |       WHERE b.doc_id >= 400 AND a.doc_id < 400)
       |SELECT new_doc_id, match_doc_id, MIN(kind) AS kind
       |FROM (SELECT * FROM ex UNION ALL SELECT * FROM nr) GROUP BY 1, 2""".stripMargin

  /** DuckDB oracle SQL for dedup / similarity / text / multimodal. */
  /** binary sign-code CTEs (two 32-bit words) + hamming top-10 —
    * shared by the raw search, the rerank chain, and the recall eval
    */
  private lazy val hammingCodesCtes: String =
    s"""$quantCtes,
       |hb AS (SELECT vec_id,
       |        CAST(SUM(CASE WHEN v > 0 AND i <= 32 THEN CAST(1 AS BIGINT) << (i - 1) ELSE 0 END) AS BIGINT) AS lo,
       |        CAST(SUM(CASE WHEN v > 0 AND i >= 33 THEN CAST(1 AS BIGINT) << (i - 33) ELSE 0 END) AS BIGINT) AS hi
       |      FROM q GROUP BY 1),
       |hp AS (SELECT vec_id AS probe_id, lo AS plo, hi AS phi FROM hb WHERE vec_id < 5),
       |hd AS (SELECT hp.probe_id, hb.vec_id AS neighbor_id,
       |        CAST(bit_count(xor(hb.lo, hp.plo)) + bit_count(xor(hb.hi, hp.phi)) AS BIGINT) AS ham
       |      FROM hb JOIN hp ON hb.vec_id != hp.probe_id)""".stripMargin

  private lazy val hammingTopkOracleSql: String =
    s"""WITH $hammingCodesCtes,
       |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY ham ASC, neighbor_id ASC) AS rn FROM hd)
       |SELECT probe_id, neighbor_id, CAST(rn AS BIGINT) AS rnk, ham FROM r WHERE rn <= 10""".stripMargin

  private lazy val hammingRerankOracleSql: String =
    s"""WITH $hammingCodesCtes,
       |hs AS (SELECT * FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY ham ASC, neighbor_id ASC) AS ham_rnk
       |                      FROM hd) WHERE ham_rnk <= 50),
       |hdot AS (SELECT hs.probe_id, hs.neighbor_id, CAST(hs.ham_rnk AS BIGINT) AS ham_rnk,
       |          CAST(SUM(a.v * b.v) AS BIGINT) AS dt
       |        FROM hs JOIN q a ON a.vec_id = hs.probe_id
       |        JOIN q b ON b.vec_id = hs.neighbor_id AND b.i = a.i
       |        GROUP BY 1, 2, 3),
       |hcos AS (SELECT d.probe_id, d.neighbor_id, d.ham_rnk,
       |          CAST(d.dt AS DOUBLE) / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)) AS cos
       |        FROM hdot d JOIN n na ON na.vec_id = d.probe_id JOIN n nb ON nb.vec_id = d.neighbor_id),
       |hrr AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id ASC) AS rn FROM hcos)
       |SELECT probe_id, neighbor_id, CAST(rn AS BIGINT) AS rnk, ham_rnk, cos FROM hrr WHERE rn <= 10""".stripMargin

  /** bloom-funnel oracle, shared by the batch prefilter and its
    * streaming dual (identical drained bit set by idempotence +
    * shared probe code ⇒ identical per-doc output)
    */
  private val bloomPrefilterOracleSql: String =
    s"""WITH m AS (SELECT MIN(source) AS es FROM documents),
       |d AS (SELECT doc_id, source, $toksSql AS toks FROM documents),
       |esh AS (SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS sh
       |        FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 2)) AS i
       |              FROM d, m WHERE d.source = m.es AND len(toks) >= 3)),
       |tsh AS (SELECT DISTINCT toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS sh
       |        FROM (SELECT toks, unnest(generate_series(1, len(toks) - 2)) AS i
       |              FROM d, m WHERE d.source != m.es AND len(toks) >= 3)),
       |ab AS (SELECT * FROM (VALUES ${graft.functions.BloomFilter.duckAbValues()}) t(a, b)),
       |bits AS (SELECT DISTINCT ((ab.a * h.hm + ab.b) % 2147483647) % 1048576 AS pos
       |         FROM (SELECT CAST('0x' || substr(md5(sh), 1, 15) AS BIGINT) % 2147483647 AS hm
       |               FROM tsh) h CROSS JOIN ab),
       |eshd AS (SELECT sh, CAST('0x' || substr(md5(sh), 1, 15) AS BIGINT) % 2147483647 AS hm
       |         FROM (SELECT DISTINCT sh FROM esh)),
       |hits AS (SELECT e.sh, SUM(CASE WHEN bits.pos IS NOT NULL THEN 1 ELSE 0 END) AS n_set
       |         FROM eshd e CROSS JOIN ab
       |         LEFT JOIN bits ON bits.pos = ((ab.a * e.hm + ab.b) % 2147483647) % 1048576
       |         GROUP BY 1),
       |per AS (SELECT esh.doc_id,
       |          CAST(COUNT(*) AS BIGINT) AS n_sh,
       |          CAST(SUM(CASE WHEN h.n_set = 7 THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_hit,
       |          CAST(SUM(CASE WHEN t.sh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_hit
       |        FROM esh JOIN hits h ON h.sh = esh.sh LEFT JOIN tsh t ON t.sh = esh.sh
       |        GROUP BY 1)
       |SELECT doc_id, n_sh, n_bloom_hit,
       |  CAST(n_bloom_hit * 1000000 // n_sh AS BIGINT) AS bloom_micro,
       |  n_exact_hit,
       |  CAST(n_exact_hit * 1000000 // n_sh AS BIGINT) AS exact_micro,
       |  (n_bloom_hit * 1000000 // n_sh >= 200000) AS is_candidate,
       |  (n_exact_hit * 1000000 // n_sh >= 200000) AS is_contaminated
       |FROM per""".stripMargin

  /** graph_kcore oracle — the unrolled peel: each round re-derives
    * degrees on the surviving edge set and keeps nodes with deg ≥ k
    */
  private val kcoreOracleSql: String = {
    val k = 3; val rounds = 4
    val peels = (1 to rounds).map { r =>
      s"""k$r AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
         |       FROM e${r - 1} GROUP BY 1 HAVING COUNT(*) >= $k),
         |e$r AS (SELECT e.src, e.dst FROM e${r - 1} e
         |       JOIN k$r a ON a.node = e.src JOIN k$r b ON b.node = e.dst)""".stripMargin
    }.mkString(",\n")
    val rows = (1 to rounds).map { r =>
      s"""SELECT CAST($r AS BIGINT) AS round,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM k$r) AS n_kept,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM e$r) AS n_edges_directed,
         |  (SELECT CAST(COALESCE(MIN(deg), 0) AS BIGINT) FROM k$r) AS min_deg,
         |  (SELECT CAST(COALESCE(MAX(deg), 0) AS BIGINT) FROM k$r) AS max_deg""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |e0 AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
       |       FROM li a JOIN li b ON b.l_orderkey = a.l_orderkey AND b.l_partkey != a.l_partkey),
       |$peels
       |$rows""".stripMargin
  }

  private val mlOracles: Map[String, String] = Map(
    // log2-binned degree distribution of the rep-level candidate
    // graph: same member-pair → rep mapping as graph_triangles,
    // deg_bin = length of the binary representation (⌊log₂ deg⌋ + 1)
    "graph_degree_dist" ->
      s"""WITH $shingleCtes,
         |rp AS (SELECT doc_id, MIN(doc_id) OVER (PARTITION BY md5($normSql)) AS rep FROM documents),
         |re AS (SELECT DISTINCT LEAST(ra.rep, rb.rep) AS a, GREATEST(ra.rep, rb.rep) AS b
         |       FROM pairs p JOIN rp ra ON ra.doc_id = p.doc_a JOIN rp rb ON rb.doc_id = p.doc_b
         |       WHERE ra.rep != rb.rep),
         |dg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM
         |        (SELECT a AS node FROM re UNION ALL SELECT b FROM re) GROUP BY 1)
         |SELECT CAST(length(bin(deg)) AS BIGINT) AS deg_bin, CAST(COUNT(*) AS BIGINT) AS n_nodes,
         |  MIN(deg) AS min_deg, MAX(deg) AS max_deg, CAST(SUM(deg) AS BIGINT) AS sum_deg
         |FROM dg GROUP BY 1""".stripMargin,
    // k-NN join: the IVF-bucketed search with a corpus-scaled query
    // set (every 50th vector) probing its top-2 cells, k=5
    "ann_knn_join" ->
      s"""WITH $quantCtes,
         |seed AS (SELECT vec_id - 100 AS c, i, v FROM q WHERE vec_id >= 100 AND vec_id < 108),
         |sn AS (SELECT c, CAST(SUM(v * v) AS BIGINT) AS c2 FROM seed GROUP BY 1),
         |ad AS (SELECT q.vec_id, s.c, CAST(SUM(q.v * s.v) AS BIGINT) AS dot
         |       FROM q JOIN seed s ON s.i = q.i GROUP BY 1, 2),
         |dist AS (SELECT ad.vec_id, ad.c, n.n2 + sn.c2 - 2 * ad.dot AS d2
         |         FROM ad JOIN n ON n.vec_id = ad.vec_id JOIN sn ON sn.c = ad.c),
         |asg AS (SELECT vec_id, c AS cell FROM (
         |          SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2 ASC, c ASC) AS r
         |          FROM dist) WHERE r = 1),
         |pcells AS (SELECT vec_id AS probe_id, c AS cell FROM (
         |             SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2 ASC, c ASC) AS r
         |             FROM dist WHERE vec_id % 50 = 0) WHERE r <= 2),
         |cand AS (SELECT p.probe_id, a.vec_id AS neighbor_id
         |         FROM pcells p JOIN asg a ON a.cell = p.cell AND a.vec_id != p.probe_id),
         |dt AS (SELECT cand.probe_id, cand.neighbor_id, CAST(SUM(x.v * y.v) AS BIGINT) AS dot
         |       FROM cand JOIN q x ON x.vec_id = cand.probe_id
         |       JOIN q y ON y.vec_id = cand.neighbor_id AND y.i = x.i
         |       GROUP BY 1, 2),
         |sc AS (SELECT probe_id, neighbor_id,
         |              CAST(dot AS DOUBLE) / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)) AS cos
         |       FROM dt JOIN n na ON na.vec_id = probe_id JOIN n nb ON nb.vec_id = neighbor_id)
         |SELECT probe_id, neighbor_id,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id ASC) AS BIGINT) AS rnk,
         |  CAST(round(cos * 1000000) AS BIGINT) AS cos_micro
         |FROM sc QUALIFY rnk <= 5""".stripMargin,
    // knn-join recall: the join's own answers (same CTE chain as
    // ann_knn_join) intersected with exact brute-force top-5 for the
    // bounded eval-probe subset (query-set members under id 2500)
    "ann_knn_recall" ->
      s"""WITH $quantCtes,
         |seed AS (SELECT vec_id - 100 AS c, i, v FROM q WHERE vec_id >= 100 AND vec_id < 108),
         |sn AS (SELECT c, CAST(SUM(v * v) AS BIGINT) AS c2 FROM seed GROUP BY 1),
         |ad AS (SELECT q.vec_id, s.c, CAST(SUM(q.v * s.v) AS BIGINT) AS dot
         |       FROM q JOIN seed s ON s.i = q.i GROUP BY 1, 2),
         |dist AS (SELECT ad.vec_id, ad.c, n.n2 + sn.c2 - 2 * ad.dot AS d2
         |         FROM ad JOIN n ON n.vec_id = ad.vec_id JOIN sn ON sn.c = ad.c),
         |asg AS (SELECT vec_id, c AS cell FROM (
         |          SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2 ASC, c ASC) AS r
         |          FROM dist) WHERE r = 1),
         |pcells AS (SELECT vec_id AS probe_id, c AS cell FROM (
         |             SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2 ASC, c ASC) AS r
         |             FROM dist WHERE vec_id % 50 = 0) WHERE r <= 2),
         |cand AS (SELECT p.probe_id, a.vec_id AS neighbor_id
         |         FROM pcells p JOIN asg a ON a.cell = p.cell AND a.vec_id != p.probe_id),
         |dt AS (SELECT cand.probe_id, cand.neighbor_id, CAST(SUM(x.v * y.v) AS BIGINT) AS dot
         |       FROM cand JOIN q x ON x.vec_id = cand.probe_id
         |       JOIN q y ON y.vec_id = cand.neighbor_id AND y.i = x.i
         |       GROUP BY 1, 2),
         |sc AS (SELECT probe_id, neighbor_id,
         |              CAST(dot AS DOUBLE) / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)) AS cos
         |       FROM dt JOIN n na ON na.vec_id = probe_id JOIN n nb ON nb.vec_id = neighbor_id),
         |apx AS (SELECT probe_id, neighbor_id FROM sc
         |        QUALIFY ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id ASC) <= 5),
         |ep AS (SELECT vec_id AS probe_id FROM n WHERE vec_id % 50 = 0 AND vec_id < 2500),
         |bt AS (SELECT ep.probe_id, y.vec_id AS neighbor_id, CAST(SUM(x.v * y.v) AS BIGINT) AS dot
         |       FROM ep JOIN q x ON x.vec_id = ep.probe_id
         |       JOIN q y ON y.i = x.i AND y.vec_id != ep.probe_id
         |       GROUP BY 1, 2),
         |bc AS (SELECT probe_id, neighbor_id,
         |         CAST(dot AS DOUBLE) / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)) AS cos
         |       FROM bt JOIN n na ON na.vec_id = probe_id JOIN n nb ON nb.vec_id = neighbor_id),
         |tr AS (SELECT probe_id, neighbor_id FROM bc
         |       QUALIFY ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id ASC) <= 5),
         |h AS (SELECT t.probe_id, CAST(COUNT(*) AS BIGINT) AS hits
         |      FROM tr t JOIN apx a ON a.probe_id = t.probe_id AND a.neighbor_id = t.neighbor_id
         |      GROUP BY 1)
         |SELECT p.probe_id, CAST(COALESCE(h.hits, 0) AS BIGINT) AS n_hits,
         |  CAST(COALESCE(h.hits, 0) * 10000 // 5 AS BIGINT) AS recall_bp
         |FROM (SELECT DISTINCT probe_id FROM tr) p LEFT JOIN h ON h.probe_id = p.probe_id""".stripMargin,
    // IVF cell-occupancy skew: same deterministic assignment CTEs,
    // per-cell counts + share/load vs uniform over the cell aggregate
    "ann_cell_skew" ->
      s"""WITH $quantCtes,
         |seed AS (SELECT vec_id - 100 AS c, i, v FROM q WHERE vec_id >= 100 AND vec_id < 108),
         |sn AS (SELECT c, CAST(SUM(v * v) AS BIGINT) AS c2 FROM seed GROUP BY 1),
         |ad AS (SELECT q.vec_id, s.c, CAST(SUM(q.v * s.v) AS BIGINT) AS dot
         |       FROM q JOIN seed s ON s.i = q.i GROUP BY 1, 2),
         |dist AS (SELECT ad.vec_id, ad.c, n.n2 + sn.c2 - 2 * ad.dot AS d2
         |         FROM ad JOIN n ON n.vec_id = ad.vec_id JOIN sn ON sn.c = ad.c),
         |asg AS (SELECT vec_id, c AS cell FROM (
         |          SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2 ASC, c ASC) AS r
         |          FROM dist) WHERE r = 1),
         |g AS (SELECT CAST(cell AS BIGINT) AS cell, CAST(COUNT(*) AS BIGINT) AS n_vecs
         |      FROM asg GROUP BY 1)
         |SELECT cell, n_vecs,
         |  CAST(n_vecs * 10000 // SUM(n_vecs) OVER () AS BIGINT) AS share_bp,
         |  CAST(n_vecs * 8 * 10000 // SUM(n_vecs) OVER () AS BIGINT) AS load_bp
         |FROM g""".stripMargin,
    // repeated 8-word-span boilerplate: per-doc distinct sliding
    // windows over the normalized tokens, spans in >=2 docs, top-20
    "text_boilerplate" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |w AS (SELECT DISTINCT doc_id, array_to_string(toks[i:i+7], ' ') AS span
         |      FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 7)) AS i
         |            FROM t WHERE len(toks) >= 8)),
         |g AS (SELECT span, CAST(COUNT(*) AS BIGINT) AS n_docs, MIN(doc_id) AS first_doc
         |      FROM w GROUP BY 1)
         |SELECT span, n_docs, first_doc FROM g WHERE n_docs >= 2
         |ORDER BY n_docs DESC, span ASC LIMIT 20""".stripMargin,
    // sequence-packing audit: two-level deterministic prefix sum,
    // boundary test start DIV L != (end-1) DIV L
    "sample_pack_sequences" ->
      """WITH d AS (SELECT doc_id, source, GREATEST(n_chars // 4, 1) AS toks,
        |             md5('pack:' || CAST(doc_id AS VARCHAR)) AS hkey FROM documents),
        |b AS (SELECT *, (instr('0123456789abcdef', substr(hkey, 1, 1)) - 1) * 16
        |             + (instr('0123456789abcdef', substr(hkey, 2, 1)) - 1) AS band FROM d),
        |bt AS (SELECT band, CAST(SUM(toks) AS BIGINT) AS band_toks FROM b GROUP BY 1),
        |bo AS (SELECT band, CAST(COALESCE(SUM(band_toks) OVER (ORDER BY band
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS band_offset
        |       FROM bt),
        |g AS (SELECT b.source, b.toks,
        |        bo.band_offset + SUM(b.toks) OVER (PARTITION BY b.band ORDER BY b.hkey, b.doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g_end
        |      FROM b JOIN bo ON bo.band = b.band),
        |y AS (SELECT source, toks,
        |        CASE WHEN (g_end - toks) // 2048 != (g_end - 1) // 2048 THEN 1 ELSE 0 END AS crosses
        |      FROM g)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(toks) AS BIGINT) AS n_tokens,
        |  CAST(SUM(crosses) AS BIGINT) AS n_boundary_crossings,
        |  CAST(SUM(1 - crosses) * 10000 // COUNT(*) AS BIGINT) AS pure_bp
        |FROM y GROUP BY 1""".stripMargin,
    // DSIR importance weights: hashed-unigram LMs (B=1024 buckets,
    // Laplace +1), per-raw-doc log-weight in integer bits via the
    // length(bin(·)) idiom; target = min source; the corpus-size term
    // keeps weights centered so keep = logw >= 0
    "sample_importance" ->
      s"""WITH m AS (SELECT MIN(source) AS ts FROM documents),
         |t AS (SELECT doc_id, source, tok,
         |        CAST('0x' || substr(md5('dsir:' || tok), 1, 12) AS BIGINT) % 1024 AS bucket
         |      FROM (SELECT doc_id, source, unnest($toksSql) AS tok FROM documents)
         |      WHERE tok <> ''),
         |n AS (SELECT CAST(SUM(CASE WHEN t.source = m.ts THEN 1 ELSE 0 END) AS BIGINT) AS nt,
         |        CAST(SUM(CASE WHEN t.source != m.ts THEN 1 ELSE 0 END) AS BIGINT) AS nr
         |      FROM t, m),
         |tg AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS ct FROM t, m
         |       WHERE t.source = m.ts GROUP BY 1),
         |bt AS (SELECT r.bucket, COALESCE(tg.ct, 0) AS ct, r.cr
         |       FROM (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cr FROM t, m
         |             WHERE t.source != m.ts GROUP BY 1) r
         |       LEFT JOIN tg ON tg.bucket = r.bucket),
         |c AS (SELECT bt.bucket,
         |        CAST(length(bin(ct + 1)) - length(bin(cr + 1))
         |             + length(bin(nr + 1024)) - length(bin(nt + 1024)) AS BIGINT) AS contrib
         |      FROM bt, n)
         |SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_toks,
         |  CAST(SUM(c.contrib) AS BIGINT) AS logw_bits,
         |  CAST(SUM(c.contrib) * 1000 // COUNT(*) AS BIGINT) AS mean_logw_milli,
         |  (SUM(c.contrib) >= 0) AS keep
         |FROM t JOIN c ON c.bucket = t.bucket, m
         |WHERE t.source != m.ts
         |GROUP BY 1""".stripMargin,
    // centroid drift between the vec_id-parity snapshot halves: milli
    // centroids by truncating integer division per half, drift² summed
    // per label, worst dim ties to the smallest dim
    "emb_centroid_drift" ->
      """WITH qm AS (SELECT vec_id, CAST(label AS BIGINT) AS label, i - 1 AS i,
        |         CAST(round(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT) AS qi
        |       FROM (SELECT vec_id, label, embedding, unnest(generate_series(1, 64)) AS i FROM embeddings)),
        |g AS (SELECT label, i,
        |        CAST(SUM(CASE WHEN vec_id % 2 = 0 THEN qi ELSE 0 END) AS BIGINT) AS sa,
        |        CAST(SUM(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |        CAST(SUM(CASE WHEN vec_id % 2 = 0 THEN 0 ELSE qi END) AS BIGINT) AS sb,
        |        CAST(SUM(CASE WHEN vec_id % 2 = 0 THEN 0 ELSE 1 END) AS BIGINT) AS nb
        |      FROM qm GROUP BY 1, 2),
        |c AS (SELECT label, i, na, nb,
        |        sa // greatest(na, 1) AS ca, sb // greatest(nb, 1) AS cb FROM g),
        |w AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY label ORDER BY abs(ca - cb) DESC, i ASC) AS rk FROM c)
        |SELECT label, MAX(na) AS n_a, MAX(nb) AS n_b,
        |  CAST(SUM((ca - cb) * (ca - cb)) AS BIGINT) AS drift2_milli2,
        |  CAST(MAX(CASE WHEN rk = 1 THEN i END) AS BIGINT) AS worst_dim,
        |  CAST(MAX(CASE WHEN rk = 1 THEN abs(ca - cb) END) AS BIGINT) AS worst_delta_milli
        |FROM w GROUP BY 1""".stripMargin,
    // label-centroid separation: milli centroids by integer DIV,
    // squared distances, nearest-other-label by (d2, label) tiebreak
    "emb_label_centroids" ->
      """WITH q AS (SELECT CAST(label AS BIGINT) AS label,
        |             list_transform(embedding, x -> CAST(round(x * 1000.0) AS BIGINT)) AS q
        |           FROM embeddings),
        |x AS (SELECT label, i - 1 AS i, q[i] AS qi
        |      FROM (SELECT label, q, unnest(generate_series(1, len(q))) AS i FROM q)),
        |sl AS (SELECT label, i, CAST(SUM(qi) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
        |       FROM x GROUP BY 1, 2),
        |cl AS (SELECT label, i, CAST(s // n AS BIGINT) AS c, n FROM sl),
        |g AS (SELECT i, CAST(CAST(SUM(s) AS BIGINT) // CAST(SUM(n) AS BIGINT) AS BIGINT) AS gc
        |      FROM sl GROUP BY 1),
        |dg AS (SELECT label, MAX(n) AS n_vecs,
        |         CAST(SUM((c - gc) * (c - gc)) AS BIGINT) AS dist2_global
        |       FROM cl JOIN g USING (i) GROUP BY 1),
        |pr AS (SELECT a.label AS la, b.label AS lb,
        |         CAST(SUM((a.c - b.c) * (a.c - b.c)) AS BIGINT) AS d2
        |       FROM cl a JOIN cl b ON a.i = b.i AND a.label <> b.label GROUP BY 1, 2),
        |nr AS (SELECT la, lb, d2,
        |         ROW_NUMBER() OVER (PARTITION BY la ORDER BY d2 ASC, lb ASC) AS rn FROM pr)
        |SELECT dg.label, dg.n_vecs, dg.dist2_global,
        |  nr.lb AS nearest_label, nr.d2 AS dist2_nearest
        |FROM dg JOIN nr ON nr.la = dg.label AND nr.rn = 1""".stripMargin,
    // top principal component by integer power iteration: milli-unit
    // quantize, division-free centered scatter (correction term
    // integer-divided first), 3 unrolled Cv steps with L-inf
    // renormalization — every op integer, both engines bit-identical
    "emb_pca_power" ->
      """WITH q AS (SELECT vec_id,
        |             list_transform(embedding, x -> CAST(round(x * 1000.0) AS BIGINT)) AS q
        |           FROM embeddings),
        |x AS (SELECT vec_id, i - 1 AS i, q[i] AS qi
        |      FROM (SELECT vec_id, q, unnest(generate_series(1, len(q))) AS i FROM q)),
        |p AS (SELECT a.i, b.i AS j, CAST(SUM(a.qi * b.qi) AS BIGINT) AS p
        |      FROM x a JOIN x b USING (vec_id) GROUP BY 1, 2),
        |s AS (SELECT i, CAST(SUM(qi) AS BIGINT) AS s FROM x GROUP BY 1),
        |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM q),
        |c AS (SELECT p.i, p.j, CAST(p.p - (sa.s * sb.s // nn.n) AS BIGINT) AS c
        |      FROM p JOIN s sa ON sa.i = p.i JOIN s sb ON sb.i = p.j, nn),
        |w1 AS (SELECT i, CAST(SUM(c * 1000) AS BIGINT) AS w FROM c GROUP BY 1),
        |m1 AS (SELECT MAX(ABS(w)) AS m FROM w1),
        |v1 AS (SELECT i, CAST(w * 1000 // GREATEST(m, 1) AS BIGINT) AS v FROM w1, m1),
        |w2 AS (SELECT c.i, CAST(SUM(c.c * v1.v) AS BIGINT) AS w FROM c JOIN v1 ON v1.i = c.j GROUP BY 1),
        |m2 AS (SELECT MAX(ABS(w)) AS m FROM w2),
        |v2 AS (SELECT i, CAST(w * 1000 // GREATEST(m, 1) AS BIGINT) AS v FROM w2, m2),
        |w3 AS (SELECT c.i, CAST(SUM(c.c * v2.v) AS BIGINT) AS w FROM c JOIN v2 ON v2.i = c.j GROUP BY 1),
        |m3 AS (SELECT MAX(ABS(w)) AS m FROM w3),
        |v3 AS (SELECT i, CAST(w * 1000 // GREATEST(m, 1) AS BIGINT) AS v FROM w3, m3)
        |SELECT CAST(i AS BIGINT) AS dim, v AS v_milli FROM v3""".stripMargin,
    // symmetric int8 scalar quantization — floor (never CAST: DuckDB's
    // double→int CAST rounds) of x·127/maxabs, identical operation
    // order to the Spark transform; GREATEST(·,-127) clamps the
    // one-ulp-under floor escape to keep codes in [-127,127] on both
    // engines
    "emb_quantize_int8" ->
      """WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |m AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS maxabs FROM v),
        |c AS (SELECT vec_id, v, maxabs,
        |        list_transform(v, x -> GREATEST(CAST(floor(x * 127.0 / maxabs) AS BIGINT), CAST(-127 AS BIGINT))) AS codes
        |      FROM m WHERE maxabs > 0)
        |SELECT vec_id, CAST(len(v) AS BIGINT) AS dim,
        |  CAST(floor(maxabs * 1000000) AS BIGINT) AS maxabs_micro,
        |  CAST(list_sum(codes) AS BIGINT) AS sum_code,
        |  CAST(list_min(codes) AS BIGINT) AS min_code,
        |  CAST(list_max(codes) AS BIGINT) AS max_code,
        |  CAST(len(list_filter(codes, x -> x <= -127 OR x >= 127)) AS BIGINT) AS n_sat
        |FROM c""".stripMargin,
    // ARI-style readability: integer score, floor-banded per source
    "text_readability" ->
      """WITH d AS (SELECT source,
        |    CAST(length(text) AS BIGINT) AS n_chars_t,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_words,
        |    GREATEST(CAST(1 AS BIGINT),
        |             CAST(length(text) - length(translate(text, '.!?', '')) AS BIGINT)) AS n_sents
        |  FROM documents),
        |s AS (SELECT source,
        |        CAST(4710 * n_chars_t // n_words + 500 * n_words // n_sents - 21430 AS BIGINT) AS score_milli
        |      FROM d)
        |SELECT source, CAST(score_milli // 5000 AS BIGINT) AS band,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  MIN(score_milli) AS min_milli, MAX(score_milli) AS max_milli
        |FROM s GROUP BY 1, 2""".stripMargin,
    // bigram LM: per-head top-3 continuations, conditional bp
    "text_bigram_lm" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |bg AS (SELECT toks[i] AS a, toks[i+1] AS b
         |       FROM (SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS i
         |             FROM t WHERE len(toks) >= 2)),
         |nab AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n_ab FROM bg GROUP BY 1, 2),
         |wr AS (SELECT a, b, n_ab,
         |         CAST(SUM(n_ab) OVER (PARTITION BY a) AS BIGINT) AS n_a,
         |         CAST(ROW_NUMBER() OVER (PARTITION BY a ORDER BY n_ab DESC, b ASC) AS BIGINT) AS rnk
         |       FROM nab)
         |SELECT a, b, n_ab, n_a, rnk, CAST(n_ab * 10000 // n_a AS BIGINT) AS cond_bp
         |FROM wr WHERE n_a >= 50 AND rnk <= 3""".stripMargin,
    // per-source cap by deterministic md5 order, summary + checksum
    "sample_cap_per_source" -> capOracle,
    // per-epoch hash order decorrelation: row-local double hashing per
    // pair, one bounded groupBy; overlap expectation composed from the
    // aggregates directly
    "sample_epoch_schedule" ->
      """WITH p AS (SELECT a.e AS e1, b.e AS e2
        |           FROM (SELECT unnest(generate_series(0, 3)) AS e) a,
        |                (SELECT unnest(generate_series(0, 3)) AS e) b
        |           WHERE a.e < b.e),
        |d AS (SELECT doc_id, e1, e2,
        |        CAST('0x' || substr(md5('epoch:' || CAST(e1 AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS h1,
        |        CAST('0x' || substr(md5('epoch:' || CAST(e2 AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS h2
        |      FROM documents, p)
        |SELECT CAST(e1 AS BIGINT) AS e1, CAST(e2 AS BIGINT) AS e2,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN h1 % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_s1,
        |  CAST(SUM(CASE WHEN h2 % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_s2,
        |  CAST(SUM(CASE WHEN h1 % 10 = 0 AND h2 % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
        |  CAST(SUM(abs(h1 % 256 - h2 % 256)) * 100 // COUNT(*) AS BIGINT) AS mean_disp_x100,
        |  CAST(SUM(CASE WHEN h1 % 10 = 0 AND h2 % 10 = 0 THEN 1 ELSE 0 END) * 10000 * COUNT(*)
        |       // GREATEST(SUM(CASE WHEN h1 % 10 = 0 THEN 1 ELSE 0 END)
        |                 * SUM(CASE WHEN h2 % 10 = 0 THEN 1 ELSE 0 END), 1) AS BIGINT) AS overlap_vs_exp_bp
        |FROM d GROUP BY 1, 2""".stripMargin,
    // the streaming reservoir drains to the identical kept set — min-k
    // under the same (hkey, doc_id) order is arrival-order-insensitive
    // — so the batch cap oracle verifies the stream bit-for-bit
    "sample_cap_stream" -> capOracle,
    // balanced mixture plan: equalize every source to the scarcest
    "pipeline_mix_plan" ->
      """WITH p AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |             CAST(SUM(n_chars // 4) AS BIGINT) AS avail_tokens
        |           FROM documents GROUP BY 1),
        |w AS (SELECT *, CAST(MIN(avail_tokens) OVER () AS BIGINT) AS target_tokens FROM p)
        |SELECT source, n_docs, avail_tokens, target_tokens,
        |  CAST(target_tokens * 10000 // avail_tokens AS BIGINT) AS keep_bp,
        |  CAST(avail_tokens * (target_tokens * 10000 // avail_tokens) // 10000 AS BIGINT) AS expected_tokens
        |FROM w""".stripMargin,
    "dedup_exact" ->
      s"""SELECT md5($normSql) AS text_hash, COUNT(*) AS n_docs, MIN(doc_id) AS canonical_id
         |FROM documents GROUP BY 1""".stripMargin,
    "dedup_exact_keep_first" ->
      s"""WITH h AS (SELECT doc_id, md5($normSql) AS text_hash FROM documents),
         |c AS (SELECT doc_id, MIN(doc_id) OVER (PARTITION BY text_hash) AS canonical_id FROM h)
         |SELECT doc_id, canonical_id,
         |  CAST(CASE WHEN doc_id != canonical_id THEN 1 ELSE 0 END AS BIGINT) AS is_dup
         |FROM c""".stripMargin,
    "dedup_minhash_lsh" ->
      s"""WITH $shingleCtes
         |SELECT doc_a, doc_b FROM pairs""".stripMargin,
    // the persisted candidate-edge tier, incrementally maintained
    // across an append, must equal the from-scratch LSH pair set
    "dedup_edge_tier" ->
      s"""WITH $shingleCtes
         |SELECT doc_a, doc_b FROM pairs""".stripMargin,
    // soft-dedup weights: the cluster labels (recursive reachability)
    // left-joined to the full corpus; singletons weigh 1.0
    "dedup_soft_weights" ->
      s"""WITH RECURSIVE $shingleCtes,
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
         |          UNION ALL SELECT doc_b, doc_a FROM pairs),
         |reach(src, dst) AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.dst
         |),
         |lab AS (SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
         |        FROM reach GROUP BY src),
         |al AS (SELECT d.doc_id, COALESCE(lab.cluster_id, d.doc_id) AS cluster_id
         |       FROM documents d LEFT JOIN lab ON lab.doc_id = d.doc_id),
         |cs AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size FROM al GROUP BY 1)
         |SELECT al.doc_id, al.cluster_id, cs.cluster_size,
         |  CAST(1000000 // cs.cluster_size AS BIGINT) AS weight_micro
         |FROM al JOIN cs USING (cluster_id)""".stripMargin,
    "dedup_lsh_tune" -> lshTuneOracleSql,
    // triangle census on the rep-level candidate graph: the oracle
    // maps member band pairs to reps, then runs the same degree-ordered
    // orientation
    "graph_triangles" ->
      s"""WITH $shingleCtes,
         |rp AS (SELECT doc_id, MIN(doc_id) OVER (PARTITION BY md5($normSql)) AS rep FROM documents),
         |re AS (SELECT DISTINCT LEAST(ra.rep, rb.rep) AS a, GREATEST(ra.rep, rb.rep) AS b
         |       FROM pairs p JOIN rp ra ON ra.doc_id = p.doc_a JOIN rp rb ON rb.doc_id = p.doc_b
         |       WHERE ra.rep != rb.rep),
         |dg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM
         |        (SELECT a AS node FROM re UNION ALL SELECT b FROM re) GROUP BY 1),
         |ke AS (SELECT a, b, da.deg * 4294967296 + a AS ka, db.deg * 4294967296 + b AS kb
         |       FROM re JOIN dg da ON da.node = re.a JOIN dg db ON db.node = re.b),
         |o AS (SELECT CASE WHEN ka < kb THEN a ELSE b END AS src,
         |             CASE WHEN ka < kb THEN b ELSE a END AS dst,
         |             LEAST(ka, kb) AS ksrc, GREATEST(ka, kb) AS kdst FROM ke),
         |wp AS (SELECT x.dst AS v, y.dst AS w FROM o x JOIN o y ON y.src = x.src AND x.kdst < y.kdst),
         |tri AS (SELECT v FROM wp WHERE EXISTS (SELECT 1 FROM o WHERE o.src = wp.v AND o.dst = wp.w)),
         |agg AS (SELECT
         |  (SELECT COUNT(*) FROM dg) AS n_nodes,
         |  (SELECT COUNT(*) FROM re) AS n_edges,
         |  (SELECT COALESCE(SUM(deg * (deg - 1) // 2), 0) FROM dg) AS n_wedges,
         |  (SELECT COUNT(*) FROM tri) AS n_triangles)
         |SELECT CAST(n_nodes AS BIGINT) AS n_nodes, CAST(n_edges AS BIGINT) AS n_edges,
         |  CAST(n_wedges AS BIGINT) AS n_wedges, CAST(n_triangles AS BIGINT) AS n_triangles,
         |  CAST(CASE WHEN n_wedges > 0 THEN n_triangles * 3 * 10000 // n_wedges ELSE 0 END AS BIGINT) AS transitivity_bp
         |FROM agg""".stripMargin,
    // degree assortativity: Pearson of endpoint degrees over both edge
    // orientations; DuckDB sums ride HUGEINT, the Spark side rides
    // DECIMAL(38,0) — both // and DIV truncate toward zero
    "graph_assortativity" ->
      s"""WITH $shingleCtes,
         |rp AS (SELECT doc_id, MIN(doc_id) OVER (PARTITION BY md5($normSql)) AS rep FROM documents),
         |re AS (SELECT DISTINCT LEAST(ra.rep, rb.rep) AS a, GREATEST(ra.rep, rb.rep) AS b
         |       FROM pairs p JOIN rp ra ON ra.doc_id = p.doc_a JOIN rp rb ON rb.doc_id = p.doc_b
         |       WHERE ra.rep != rb.rep),
         |dg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM
         |        (SELECT a AS node FROM re UNION ALL SELECT b FROM re) GROUP BY 1),
         |inc AS (SELECT da.deg AS x, db.deg AS y
         |        FROM re JOIN dg da ON da.node = re.a JOIN dg db ON db.node = re.b
         |        UNION ALL
         |        SELECT db.deg, da.deg
         |        FROM re JOIN dg da ON da.node = re.a JOIN dg db ON db.node = re.b),
         |s AS (SELECT COUNT(*) AS n_inc, SUM(x) AS sx, SUM(x * y) AS sxy, SUM(x * x) AS sxx FROM inc)
         |SELECT CAST(n_inc AS BIGINT) AS n_inc,
         |  CAST(n_inc * sxy - sx * sx AS BIGINT) AS cov_num,
         |  CAST(n_inc * sxx - sx * sx AS BIGINT) AS var_num,
         |  CAST(CASE WHEN n_inc * sxx - sx * sx = 0 THEN 0
         |       ELSE (n_inc * sxy - sx * sx) * 10000 // (n_inc * sxx - sx * sx) END AS BIGINT) AS assort_bp
         |FROM s""".stripMargin,
    // per-node clustering coefficient: the census's oriented
    // enumeration with the apex kept, corners exploded, coefficient
    // against the closed-form wedge budget
    "graph_clustering_coeff" ->
      s"""WITH $shingleCtes,
         |rp AS (SELECT doc_id, MIN(doc_id) OVER (PARTITION BY md5($normSql)) AS rep FROM documents),
         |re AS (SELECT DISTINCT LEAST(ra.rep, rb.rep) AS a, GREATEST(ra.rep, rb.rep) AS b
         |       FROM pairs p JOIN rp ra ON ra.doc_id = p.doc_a JOIN rp rb ON rb.doc_id = p.doc_b
         |       WHERE ra.rep != rb.rep),
         |dg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM
         |        (SELECT a AS node FROM re UNION ALL SELECT b FROM re) GROUP BY 1),
         |ke AS (SELECT a, b, da.deg * 4294967296 + a AS ka, db.deg * 4294967296 + b AS kb
         |       FROM re JOIN dg da ON da.node = re.a JOIN dg db ON db.node = re.b),
         |o AS (SELECT CASE WHEN ka < kb THEN a ELSE b END AS src,
         |             CASE WHEN ka < kb THEN b ELSE a END AS dst,
         |             LEAST(ka, kb) AS ksrc, GREATEST(ka, kb) AS kdst FROM ke),
         |tc AS (SELECT x.src AS apex, x.dst AS v, y.dst AS w
         |       FROM o x JOIN o y ON y.src = x.src AND x.kdst < y.kdst),
         |tri AS (SELECT apex, v, w FROM tc
         |        WHERE EXISTS (SELECT 1 FROM o WHERE o.src = tc.v AND o.dst = tc.w)),
         |pn AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri
         |       FROM (SELECT unnest([apex, v, w]) AS node FROM tri) GROUP BY 1)
         |SELECT dg.node, dg.deg, COALESCE(pn.n_tri, 0) AS n_tri,
         |  CAST(dg.deg * (dg.deg - 1) // 2 AS BIGINT) AS n_wedges,
         |  CAST(CASE WHEN dg.deg >= 2
         |       THEN COALESCE(pn.n_tri, 0) * 10000 // (dg.deg * (dg.deg - 1) // 2)
         |       ELSE 0 END AS BIGINT) AS coeff_bp
         |FROM dg LEFT JOIN pn USING (node)""".stripMargin,
    // LSH recall/precision vs exact Jaccard >= 0.8 truth on the
    // md5-band eval sample; truth = the shingle inverted-index join
    "dedup_recall_eval" ->
      s"""WITH $shingleCtesSampled,
         |u AS (SELECT DISTINCT doc_id, shingle FROM sh),
         |cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM u GROUP BY 1),
         |ip AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS inter_n
         |       FROM u x JOIN u y ON y.shingle = x.shingle AND x.doc_id < y.doc_id GROUP BY 1, 2),
         |tr AS (SELECT ip.doc_a, ip.doc_b FROM ip
         |       JOIN cnt ca ON ca.doc_id = ip.doc_a JOIN cnt cb ON cb.doc_id = ip.doc_b
         |       WHERE ip.inter_n * 10 >= (ca.n_sh + cb.n_sh - ip.inter_n) * 8),
         |h AS (SELECT t.doc_a FROM tr t JOIN pairs c ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b),
         |agg AS (SELECT (SELECT COUNT(*) FROM tr) AS n_truth,
         |               (SELECT COUNT(*) FROM pairs) AS n_cand,
         |               (SELECT COUNT(*) FROM h) AS n_hits)
         |SELECT CAST(n_truth AS BIGINT) AS n_truth, CAST(n_cand AS BIGINT) AS n_cand,
         |  CAST(n_hits AS BIGINT) AS n_hits,
         |  CAST(CASE WHEN n_truth > 0 THEN n_hits * 10000 // n_truth ELSE 10000 END AS BIGINT) AS recall_bp,
         |  CAST(CASE WHEN n_cand > 0 THEN n_hits * 10000 // n_cand ELSE 10000 END AS BIGINT) AS precision_bp
         |FROM agg""".stripMargin,
    // the keep/drop verdict: longest copy wins per cluster, doc_id ties
    "dedup_keep_best" ->
      s"""WITH RECURSIVE $shingleCtes,
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
         |          UNION ALL SELECT doc_b, doc_a FROM pairs),
         |reach(src, dst) AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.dst
         |),
         |cl AS (SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
         |       FROM reach GROUP BY src)
         |SELECT cl.doc_id, cl.cluster_id, CAST(d.n_chars AS BIGINT) AS n_chars,
         |  CAST(CASE WHEN ROW_NUMBER() OVER (PARTITION BY cl.cluster_id
         |                                    ORDER BY d.n_chars DESC, cl.doc_id ASC) = 1
         |       THEN 1 ELSE 0 END AS BIGINT) AS keep
         |FROM cl JOIN documents d ON d.doc_id = cl.doc_id""".stripMargin,
    "dedup_clusters" ->
      s"""WITH RECURSIVE $shingleCtes,
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
         |          UNION ALL SELECT doc_b, doc_a FROM pairs),
         |reach(src, dst) AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.dst
         |)
         |SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
         |FROM reach GROUP BY src""".stripMargin,
    // per-source drop fraction if near-dedup kept each cluster's
    // min-id canonical; docs outside any cluster count only in n_docs
    "dedup_near_rate_by_source" ->
      s"""WITH RECURSIVE $shingleCtes,
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
         |          UNION ALL SELECT doc_b, doc_a FROM pairs),
         |reach(src, dst) AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.dst
         |),
         |cl AS (SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
         |       FROM reach GROUP BY src)
         |SELECT d.source, COUNT(*) AS n_docs,
         |  CAST(COUNT(cl.cluster_id) AS BIGINT) AS n_clustered,
         |  CAST(SUM(CASE WHEN cl.cluster_id IS NOT NULL AND cl.cluster_id <> d.doc_id
         |                THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
         |  CAST(SUM(CASE WHEN cl.cluster_id IS NOT NULL AND cl.cluster_id <> d.doc_id
         |                THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT) AS drop_rate_micro
         |FROM documents d LEFT JOIN cl ON cl.doc_id = d.doc_id
         |GROUP BY 1""".stripMargin,
    // the b-bit tier match: band candidates straddling the split,
    // scored with the debiased low-bit estimator — recomputed by the
    // oracle from raw shingles, so a stale or mis-packed stored tier
    // breaks the integer hash equality
    "dedup_incremental_bbit" ->
      s"""WITH $shingleCtes,
         |nr AS (SELECT DISTINCT b.doc_id AS new_doc_id, a.doc_id AS match_doc_id
         |       FROM bs a JOIN bs b ON b.band = a.band AND b.sig = a.sig
         |       WHERE b.doc_id >= 400 AND a.doc_id < 400)
         |SELECT nr.new_doc_id, nr.match_doc_id,
         |  CAST($bbitAgreeSql AS BIGINT) AS n_bit_agree,
         |  CAST(GREATEST(0, (2 * ($bbitAgreeSql) - 12) * 1000000 // 12) AS BIGINT) AS est_jaccard_micro
         |FROM nr JOIN m a ON a.doc_id = nr.match_doc_id JOIN m b ON b.doc_id = nr.new_doc_id""".stripMargin,
    // the streaming drain of label maintenance lands on the identical
    // from-scratch components
    "dedup_stream_cc" ->
      s"""WITH RECURSIVE $shingleCtes,
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
         |          UNION ALL SELECT doc_b, doc_a FROM pairs),
         |reach(src, dst) AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.dst
         |)
         |SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
         |FROM reach GROUP BY src""".stripMargin,
    // incremental label maintenance must converge to the from-scratch
    // components: same reachability oracle as dedup_clusters
    "dedup_incremental_cc" ->
      s"""WITH RECURSIVE $shingleCtes,
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
         |          UNION ALL SELECT doc_b, doc_a FROM pairs),
         |reach(src, dst) AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.dst
         |)
         |SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
         |FROM reach GROUP BY src""".stripMargin,
    // the star-contraction CC must land on the SAME min-label
    // components as relax+jump — one oracle, two distributed cores
    "dedup_clusters_star" ->
      s"""WITH RECURSIVE $shingleCtes,
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
         |          UNION ALL SELECT doc_b, doc_a FROM pairs),
         |reach(src, dst) AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.dst
         |)
         |SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
         |FROM reach GROUP BY src""".stripMargin,
    "dedup_cluster_stats" ->
      s"""WITH RECURSIVE $shingleCtes,
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
         |          UNION ALL SELECT doc_b, doc_a FROM pairs),
         |reach(src, dst) AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.dst
         |),
         |lab AS (SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
         |        FROM reach GROUP BY src),
         |cs AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size FROM lab GROUP BY 1)
         |SELECT cluster_size, COUNT(*) AS n_clusters FROM cs GROUP BY 1""".stripMargin,
    // containment of the smaller shingle set (quote/subset leak
    // detection) — orientation-invariant verdict, same candidates
    "dedup_containment" ->
      s"""WITH $shingleCtes,
         |u AS (SELECT DISTINCT doc_id, shingle FROM sh),
         |uh AS (SELECT doc_id, CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT) AS hsh FROM u),
         |cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM u GROUP BY 1),
         |i AS (SELECT p.doc_a, p.doc_b, COUNT(*) AS inter_n
         |      FROM pairs p JOIN uh x ON x.doc_id = p.doc_a
         |      JOIN uh y ON y.doc_id = p.doc_b AND y.hsh = x.hsh
         |      GROUP BY 1, 2)
         |SELECT p.doc_a, p.doc_b, COALESCE(i.inter_n, 0) AS inter_n,
         |  CAST(LEAST(ca.n_sh, cb.n_sh) AS BIGINT) AS n_small,
         |  CAST(GREATEST(ca.n_sh, cb.n_sh) AS BIGINT) AS n_big,
         |  CAST(CASE WHEN COALESCE(i.inter_n, 0) * 10 >= LEAST(ca.n_sh, cb.n_sh) * 9
         |       THEN 1 ELSE 0 END AS BIGINT) AS is_contained
         |FROM pairs p LEFT JOIN i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
         |JOIN cnt ca ON ca.doc_id = p.doc_a JOIN cnt cb ON cb.doc_id = p.doc_b""".stripMargin,
    // AllPairs/PPJoin prefix filtering over 3-gram shingle sets:
    // rarest-(df, shingle) prefixes, p = n - ceil(tau*n) + 1 with
    // ceil(8n/10) = (8n+9)//10, exact Jaccard cross-multiplied
    "dedup_prefix_filter" ->
      s"""WITH d0 AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |s0 AS (SELECT doc_id, tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS tok
         |       FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 2)) AS i
         |             FROM d0 WHERE len(tk) >= 3)),
         |toks AS (SELECT DISTINCT doc_id, tok FROM s0),
         |df AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM toks GROUP BY 1),
         |ranked AS (SELECT t.doc_id, t.tok,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY t.doc_id ORDER BY d.df ASC, t.tok ASC) AS BIGINT) AS rn,
         |    CAST(COUNT(*) OVER (PARTITION BY t.doc_id) AS BIGINT) AS n
         |  FROM toks t JOIN df d ON d.tok = t.tok),
         |pref AS (SELECT doc_id, tok FROM ranked WHERE rn <= n - (8 * n + 9) // 10 + 1),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |         FROM pref a JOIN pref b ON b.tok = a.tok AND a.doc_id < b.doc_id),
         |cnts AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok FROM toks GROUP BY 1),
         |i AS (SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT) AS inter_n
         |      FROM cand c JOIN toks x ON x.doc_id = c.doc_a
         |      JOIN toks y ON y.doc_id = c.doc_b AND y.tok = x.tok GROUP BY 1, 2),
         |sc AS (SELECT c.doc_a, c.doc_b,
         |         CAST(COALESCE(i.inter_n, 0) AS BIGINT) AS inter_n,
         |         CAST(ca.n_tok + cb.n_tok - COALESCE(i.inter_n, 0) AS BIGINT) AS union_n
         |       FROM cand c LEFT JOIN i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
         |       JOIN cnts ca ON ca.doc_id = c.doc_a JOIN cnts cb ON cb.doc_id = c.doc_b)
         |SELECT doc_a, doc_b, inter_n, union_n,
         |  CAST(inter_n * 10000 // union_n AS BIGINT) AS jac_bp
         |FROM sc WHERE inter_n * 10 >= union_n * 8""".stripMargin,
    "dedup_ngram_jaccard" ->
      s"""WITH $shingleCtes,
         |u AS (SELECT DISTINCT doc_id, shingle FROM sh),
         |uh AS (SELECT doc_id, CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT) AS hsh FROM u),
         |cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM u GROUP BY 1),
         |i AS (SELECT p.doc_a, p.doc_b, COUNT(*) AS inter_n
         |      FROM pairs p JOIN uh x ON x.doc_id = p.doc_a
         |      JOIN uh y ON y.doc_id = p.doc_b AND y.hsh = x.hsh
         |      GROUP BY 1, 2)
         |SELECT p.doc_a, p.doc_b, COALESCE(i.inter_n, 0) AS inter_n,
         |  ca.n_sh + cb.n_sh - COALESCE(i.inter_n, 0) AS union_n,
         |  CAST(CASE WHEN COALESCE(i.inter_n, 0) * 10 >= (ca.n_sh + cb.n_sh - COALESCE(i.inter_n, 0)) * 8
         |       THEN 1 ELSE 0 END AS BIGINT) AS is_dup
         |FROM pairs p LEFT JOIN i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
         |JOIN cnt ca ON ca.doc_id = p.doc_a JOIN cnt cb ON cb.doc_id = p.doc_b""".stripMargin,
    // normalization ablation: exact-dup books under raw / casefold /
    // full-norm keys; DuckDB regexp_replace needs 'g' to match Spark
    "dedup_norm_ablation" ->
      """WITH t AS (
        |  SELECT 'raw' AS tier, md5(text) AS h FROM documents
        |  UNION ALL
        |  SELECT 'casefold' AS tier, md5(lower(text)) AS h FROM documents
        |  UNION ALL
        |  SELECT 'norm' AS tier,
        |    md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS h
        |  FROM documents),
        |g AS (SELECT tier, h, CAST(COUNT(*) AS BIGINT) AS sz FROM t GROUP BY 1, 2)
        |SELECT tier, CAST(SUM(sz) AS BIGINT) AS n_docs, CAST(COUNT(*) AS BIGINT) AS n_groups,
        |  CAST(SUM(CASE WHEN sz >= 2 THEN sz ELSE 0 END) AS BIGINT) AS n_dup_docs,
        |  CAST(SUM(CASE WHEN sz >= 2 THEN sz ELSE 0 END) * 10000 // SUM(sz) AS BIGINT) AS dup_bp
        |FROM g GROUP BY 1""".stripMargin,
    // the signature-budget curve: K-prefix estimates vs the exact
    // hash-join Jaccard over the same LSH candidate pairs; truncating
    // integer mean, the same universal-hash slots as the estimator
    "dedup_minhash_k_curve" ->
      s"""WITH $shingleCtes,
         |u AS (SELECT DISTINCT doc_id, shingle FROM sh),
         |uh AS (SELECT doc_id, CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT) AS hsh FROM u),
         |cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM u GROUP BY 1),
         |i AS (SELECT p.doc_a, p.doc_b, COUNT(*) AS inter_n
         |      FROM pairs p JOIN uh x ON x.doc_id = p.doc_a
         |      JOIN uh y ON y.doc_id = p.doc_b AND y.hsh = x.hsh
         |      GROUP BY 1, 2),
         |ex AS (SELECT p.doc_a, p.doc_b,
         |         CAST(COALESCE(i.inter_n, 0) * 1000000
         |              // (ca.n_sh + cb.n_sh - COALESCE(i.inter_n, 0)) AS BIGINT) AS exact_micro
         |       FROM pairs p LEFT JOIN i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
         |       JOIN cnt ca ON ca.doc_id = p.doc_a JOIN cnt cb ON cb.doc_id = p.doc_b),
         |ag AS (SELECT p.doc_a, p.doc_b,
         |         (CASE WHEN a.mh0 = b.mh0 THEN 1 ELSE 0 END) AS g0,
         |         (CASE WHEN a.mh1 = b.mh1 THEN 1 ELSE 0 END) AS g1,
         |         (CASE WHEN a.mh2 = b.mh2 THEN 1 ELSE 0 END) AS g2,
         |         (CASE WHEN a.mh3 = b.mh3 THEN 1 ELSE 0 END) AS g3,
         |         (CASE WHEN a.mh4 = b.mh4 THEN 1 ELSE 0 END) AS g4,
         |         (CASE WHEN a.mh5 = b.mh5 THEN 1 ELSE 0 END) AS g5,
         |         (CASE WHEN a.mh6 = b.mh6 THEN 1 ELSE 0 END) AS g6,
         |         (CASE WHEN a.mh7 = b.mh7 THEN 1 ELSE 0 END) AS g7,
         |         (CASE WHEN a.mh8 = b.mh8 THEN 1 ELSE 0 END) AS g8,
         |         (CASE WHEN a.mh9 = b.mh9 THEN 1 ELSE 0 END) AS g9,
         |         (CASE WHEN a.mh10 = b.mh10 THEN 1 ELSE 0 END) AS g10,
         |         (CASE WHEN a.mh11 = b.mh11 THEN 1 ELSE 0 END) AS g11
         |       FROM pairs p JOIN m a ON a.doc_id = p.doc_a JOIN m b ON b.doc_id = p.doc_b),
         |er AS (
         |  SELECT CAST(4 AS BIGINT) AS k,
         |    abs((g0+g1+g2+g3) * 1000000 // 4 - exact_micro) AS err
         |  FROM ex JOIN ag ON ag.doc_a = ex.doc_a AND ag.doc_b = ex.doc_b
         |  UNION ALL
         |  SELECT CAST(8 AS BIGINT) AS k,
         |    abs((g0+g1+g2+g3+g4+g5+g6+g7) * 1000000 // 8 - exact_micro) AS err
         |  FROM ex JOIN ag ON ag.doc_a = ex.doc_a AND ag.doc_b = ex.doc_b
         |  UNION ALL
         |  SELECT CAST(12 AS BIGINT) AS k,
         |    abs((g0+g1+g2+g3+g4+g5+g6+g7+g8+g9+g10+g11) * 1000000 // 12 - exact_micro) AS err
         |  FROM ex JOIN ag ON ag.doc_a = ex.doc_a AND ag.doc_b = ex.doc_b)
         |SELECT k, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |  CAST(SUM(err) // COUNT(*) AS BIGINT) AS mean_abs_err_micro,
         |  CAST(MAX(err) AS BIGINT) AS max_abs_err_micro
         |FROM er GROUP BY 1""".stripMargin,
    "dedup_simhash" ->
      s"""WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |t AS (SELECT doc_id, tok, COUNT(*) AS c
         |      FROM (SELECT doc_id, unnest(toks) AS tok FROM d) GROUP BY 1, 2),
         |tb AS (SELECT doc_id, c, substr(md5(tok), 1, 16) AS h,
         |              unnest(generate_series(0, 63)) AS b FROM t),
         |sb AS (SELECT doc_id, b,
         |         SUM(c * (2 * (((instr('0123456789abcdef', substr(h, CAST(b // 4 AS INTEGER) + 1, 1)) - 1)
         |                        >> CAST(3 - b % 4 AS INTEGER)) & 1) - 1)) AS s
         |       FROM tb GROUP BY 1, 2),
         |bv AS (SELECT doc_id, b // 16 AS blk,
         |         CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << CAST(b % 16 AS INTEGER)) ELSE 0 END) AS BIGINT) AS v
         |       FROM sb GROUP BY 1, 2),
         |sg AS (SELECT doc_id,
         |         MAX(CASE WHEN blk = 0 THEN v END) AS h0, MAX(CASE WHEN blk = 1 THEN v END) AS h1,
         |         MAX(CASE WHEN blk = 2 THEN v END) AS h2, MAX(CASE WHEN blk = 3 THEN v END) AS h3
         |       FROM bv GROUP BY 1),
         |cd AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |       FROM bv a JOIN bv b ON a.blk = b.blk AND a.v = b.v AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b,
         |  CAST(bit_count(xor(x.h0, y.h0)) + bit_count(xor(x.h1, y.h1)) +
         |       bit_count(xor(x.h2, y.h2)) + bit_count(xor(x.h3, y.h3)) AS BIGINT) AS hamming
         |FROM cd JOIN sg x ON x.doc_id = doc_a JOIN sg y ON y.doc_id = doc_b
         |WHERE bit_count(xor(x.h0, y.h0)) + bit_count(xor(x.h1, y.h1)) +
         |      bit_count(xor(x.h2, y.h2)) + bit_count(xor(x.h3, y.h3)) <= 3""".stripMargin,
    "dedup_minhash_estimate" ->
      s"""WITH $shingleCtes
         |SELECT p.doc_a, p.doc_b,
         |  CAST((CASE WHEN a.mh0 = b.mh0 THEN 1 ELSE 0 END) + (CASE WHEN a.mh1 = b.mh1 THEN 1 ELSE 0 END) +
         |       (CASE WHEN a.mh2 = b.mh2 THEN 1 ELSE 0 END) + (CASE WHEN a.mh3 = b.mh3 THEN 1 ELSE 0 END) +
         |       (CASE WHEN a.mh4 = b.mh4 THEN 1 ELSE 0 END) + (CASE WHEN a.mh5 = b.mh5 THEN 1 ELSE 0 END) +
         |       (CASE WHEN a.mh6 = b.mh6 THEN 1 ELSE 0 END) + (CASE WHEN a.mh7 = b.mh7 THEN 1 ELSE 0 END) +
         |       (CASE WHEN a.mh8 = b.mh8 THEN 1 ELSE 0 END) + (CASE WHEN a.mh9 = b.mh9 THEN 1 ELSE 0 END) +
         |       (CASE WHEN a.mh10 = b.mh10 THEN 1 ELSE 0 END) + (CASE WHEN a.mh11 = b.mh11 THEN 1 ELSE 0 END)
         |       AS BIGINT) AS n_agree,
         |  CAST(((CASE WHEN a.mh0 = b.mh0 THEN 1 ELSE 0 END) + (CASE WHEN a.mh1 = b.mh1 THEN 1 ELSE 0 END) +
         |        (CASE WHEN a.mh2 = b.mh2 THEN 1 ELSE 0 END) + (CASE WHEN a.mh3 = b.mh3 THEN 1 ELSE 0 END) +
         |        (CASE WHEN a.mh4 = b.mh4 THEN 1 ELSE 0 END) + (CASE WHEN a.mh5 = b.mh5 THEN 1 ELSE 0 END) +
         |        (CASE WHEN a.mh6 = b.mh6 THEN 1 ELSE 0 END) + (CASE WHEN a.mh7 = b.mh7 THEN 1 ELSE 0 END) +
         |        (CASE WHEN a.mh8 = b.mh8 THEN 1 ELSE 0 END) + (CASE WHEN a.mh9 = b.mh9 THEN 1 ELSE 0 END) +
         |        (CASE WHEN a.mh10 = b.mh10 THEN 1 ELSE 0 END) + (CASE WHEN a.mh11 = b.mh11 THEN 1 ELSE 0 END))
         |       * 1000000 // 12 AS BIGINT) AS est_jaccard_micro
         |FROM pairs p JOIN m a ON a.doc_id = p.doc_a JOIN m b ON b.doc_id = p.doc_b""".stripMargin,
    // signature-only containment: I ≈ agree·(na+nb)/(K+agree) over
    // exact shingle counts; containment of the smaller set, micro ints
    "dedup_containment_estimate" ->
      s"""WITH $shingleCtes,
         |u AS (SELECT DISTINCT doc_id, shingle FROM sh),
         |cnt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM u GROUP BY 1),
         |ag AS (SELECT p.doc_a, p.doc_b,
         |  CAST((CASE WHEN a.mh0 = b.mh0 THEN 1 ELSE 0 END) + (CASE WHEN a.mh1 = b.mh1 THEN 1 ELSE 0 END) +
         |       (CASE WHEN a.mh2 = b.mh2 THEN 1 ELSE 0 END) + (CASE WHEN a.mh3 = b.mh3 THEN 1 ELSE 0 END) +
         |       (CASE WHEN a.mh4 = b.mh4 THEN 1 ELSE 0 END) + (CASE WHEN a.mh5 = b.mh5 THEN 1 ELSE 0 END) +
         |       (CASE WHEN a.mh6 = b.mh6 THEN 1 ELSE 0 END) + (CASE WHEN a.mh7 = b.mh7 THEN 1 ELSE 0 END) +
         |       (CASE WHEN a.mh8 = b.mh8 THEN 1 ELSE 0 END) + (CASE WHEN a.mh9 = b.mh9 THEN 1 ELSE 0 END) +
         |       (CASE WHEN a.mh10 = b.mh10 THEN 1 ELSE 0 END) + (CASE WHEN a.mh11 = b.mh11 THEN 1 ELSE 0 END)
         |       AS BIGINT) AS n_agree
         |  FROM pairs p JOIN m a ON a.doc_id = p.doc_a JOIN m b ON b.doc_id = p.doc_b)
         |SELECT ag.doc_a, ag.doc_b, ag.n_agree,
         |  CAST(LEAST(ca.n_sh, cb.n_sh) AS BIGINT) AS n_small,
         |  CAST(GREATEST(ca.n_sh, cb.n_sh) AS BIGINT) AS n_big,
         |  CAST(ag.n_agree * (ca.n_sh + cb.n_sh) * 1000000
         |       // ((12 + ag.n_agree) * LEAST(ca.n_sh, cb.n_sh)) AS BIGINT) AS est_containment_micro
         |FROM ag JOIN cnt ca ON ca.doc_id = ag.doc_a JOIN cnt cb ON cb.doc_id = ag.doc_b""".stripMargin,
    // b-bit estimator: debiased 2·(agree/K)−1, clamped at 0, exact ints
    "dedup_minhash_bbit" ->
      s"""WITH $shingleCtes
         |SELECT p.doc_a, p.doc_b,
         |  CAST($bbitAgreeSql AS BIGINT) AS n_bit_agree,
         |  CAST(GREATEST(0, (2 * ($bbitAgreeSql) - 12) * 1000000 // 12) AS BIGINT) AS est_jaccard_micro
         |FROM pairs p JOIN m a ON a.doc_id = p.doc_a JOIN m b ON b.doc_id = p.doc_b""".stripMargin,
    // the skew drill: 10k exact clones of doc 0 collapse to one rep
    // BEFORE shingling; the band pipeline then runs over reps only and
    // the O(n) per-rep summary (group size, candidate partners) is the
    // output — mirrors Dedup.skewedCorpus exactly.
    "dedup_skewed_corpus" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT 1000000 + s AS doc_id, d0.text
         |  FROM (SELECT unnest(generate_series(0, 9999)) AS s),
         |       (SELECT text FROM documents WHERE doc_id = 0) d0
         |),
         |nm AS (SELECT doc_id, $normSql AS norm FROM corpus),
         |g AS (SELECT doc_id, norm, MIN(doc_id) OVER (PARTITION BY md5(norm)) AS rep_id FROM nm),
         |sizes AS (SELECT rep_id, COUNT(*) AS group_n FROM g GROUP BY 1),
         |reps AS (SELECT doc_id, string_split(norm, ' ') AS toks FROM g WHERE doc_id = rep_id),
         |sh AS (SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
         |       FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 2)) AS i
         |             FROM reps WHERE len(toks) >= 3)),
         |$mhSlotCtes,
         |bs AS (SELECT doc_id, band,
         |         CASE band
         |           WHEN 0 THEN md5(CAST(mh0 AS VARCHAR) || ':' || CAST(mh1 AS VARCHAR) || ':' || CAST(mh2 AS VARCHAR))
         |           WHEN 1 THEN md5(CAST(mh3 AS VARCHAR) || ':' || CAST(mh4 AS VARCHAR) || ':' || CAST(mh5 AS VARCHAR))
         |           WHEN 2 THEN md5(CAST(mh6 AS VARCHAR) || ':' || CAST(mh7 AS VARCHAR) || ':' || CAST(mh8 AS VARCHAR))
         |           ELSE md5(CAST(mh9 AS VARCHAR) || ':' || CAST(mh10 AS VARCHAR) || ':' || CAST(mh11 AS VARCHAR)) END AS sig
         |       FROM (SELECT m.*, unnest([0, 1, 2, 3]) AS band FROM m)),
         |rp AS (SELECT DISTINCT a.doc_id AS rep_a, b.doc_id AS rep_b
         |       FROM bs a JOIN bs b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
         |cnt AS (SELECT rep_id, CAST(COUNT(*) AS BIGINT) AS n_cand
         |        FROM (SELECT rep_a AS rep_id FROM rp UNION ALL SELECT rep_b FROM rp) GROUP BY 1)
         |SELECT s.rep_id, s.group_n, COALESCE(c.n_cand, 0) AS n_cand
         |FROM sizes s LEFT JOIN cnt c ON c.rep_id = s.rep_id
         |WHERE s.group_n > 1 OR COALESCE(c.n_cand, 0) > 0""".stripMargin,
    // phrase-level contamination: distinct shingle sets per SOURCE,
    // pairwise shared counts + integer containment micro-ratios
    "contamination_ngram" ->
      s"""WITH d AS (SELECT source, $toksSql AS toks FROM documents),
         |sh AS (SELECT DISTINCT source, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
         |       FROM (SELECT source, toks, unnest(generate_series(1, len(toks) - 2)) AS i
         |             FROM d WHERE len(toks) >= 3)),
         |sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sh FROM sh GROUP BY 1),
         |sp AS (SELECT x.source AS source_a, y.source AS source_b, CAST(COUNT(*) AS BIGINT) AS n_shared
         |       FROM sh x JOIN sh y ON y.shingle = x.shingle AND x.source < y.source GROUP BY 1, 2)
         |SELECT sp.source_a, sp.source_b, sp.n_shared, a.n_sh AS n_a, b.n_sh AS n_b,
         |  CAST(sp.n_shared * 1000000 // a.n_sh AS BIGINT) AS contain_a_micro,
         |  CAST(sp.n_shared * 1000000 // b.n_sh AS BIGINT) AS contain_b_micro
         |FROM sp JOIN sz a ON a.source = sp.source_a JOIN sz b ON b.source = sp.source_b""".stripMargin,
    // per-doc decontamination: 8-token anchors of the MIN-source docs
    // vs the distinct anchor set of every other source
    "contamination_doc_overlap" ->
      s"""WITH m AS (SELECT MIN(source) AS es FROM documents),
         |d AS (SELECT doc_id, source, $toksSql AS toks FROM documents),
         |esh AS (SELECT DISTINCT doc_id,
         |          toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' ||
         |          toks[i+4] || ' ' || toks[i+5] || ' ' || toks[i+6] || ' ' || toks[i+7] AS sh
         |        FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 7)) AS i
         |              FROM d, m WHERE d.source = m.es AND len(toks) >= 8)),
         |tsh AS (SELECT DISTINCT
         |          toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' ||
         |          toks[i+4] || ' ' || toks[i+5] || ' ' || toks[i+6] || ' ' || toks[i+7] AS sh
         |        FROM (SELECT toks, unnest(generate_series(1, len(toks) - 7)) AS i
         |              FROM d, m WHERE d.source != m.es AND len(toks) >= 8)),
         |cnt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM esh GROUP BY 1),
         |hit AS (SELECT e.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hit
         |        FROM esh e JOIN tsh t ON t.sh = e.sh GROUP BY 1)
         |SELECT c.doc_id, c.n_sh, COALESCE(h.n_hit, 0) AS n_hit,
         |  CAST(COALESCE(h.n_hit, 0) * 1000000 // c.n_sh AS BIGINT) AS overlap_micro
         |FROM cnt c LEFT JOIN hit h ON h.doc_id = c.doc_id""".stripMargin,
    // bloom tier of the contamination funnel: 3-gram shingles, the
    // BloomFilter (a·hm + b) mod p mod 2²⁰ probe family replayed over
    // a 7-row (a, b) VALUES table; bloom hit = all 7 positions set;
    // exact tier alongside — n_bloom_hit >= n_exact_hit structurally
    "dedup_bloom_prefilter" -> bloomPrefilterOracleSql,
    // the streaming dual drains the identical set-bit table (Bloom
    // OR-merge is an idempotent set union) and shares the probe CODE,
    // so the batch oracle verifies the stream
    "approx_bloom_stream" -> bloomPrefilterOracleSql,
    // longest shared token run per eval doc: consecutive same-diagonal
    // anchor streaks + (n-1); 1-based vs 0-based positions cancel in
    // the diagonal arithmetic. Anchors at > 64 positions on either
    // side (Dedup.AnchorDfCap — boilerplate phrases) are dropped from
    // the pair join on BOTH engines; n_sh stays uncapped.
    "contamination_long_match" ->
      s"""WITH m AS (SELECT MIN(source) AS es FROM documents),
         |d AS (SELECT doc_id, source, $toksSql AS toks FROM documents),
         |esh AS (SELECT doc_id, i AS pos,
         |          toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' ||
         |          toks[i+4] || ' ' || toks[i+5] || ' ' || toks[i+6] || ' ' || toks[i+7] AS sh
         |        FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 7)) AS i
         |              FROM d, m WHERE d.source = m.es AND len(toks) >= 8)),
         |tsh AS (SELECT doc_id AS t_doc, i AS t_pos,
         |          toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' ||
         |          toks[i+4] || ' ' || toks[i+5] || ' ' || toks[i+6] || ' ' || toks[i+7] AS sh
         |        FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 7)) AS i
         |              FROM d, m WHERE d.source != m.es AND len(toks) >= 8)),
         |ec AS (SELECT * FROM esh QUALIFY COUNT(*) OVER (PARTITION BY sh) <= 64),
         |tc AS (SELECT * FROM tsh QUALIFY COUNT(*) OVER (PARTITION BY sh) <= 64),
         |isl AS (SELECT e.doc_id, t.t_doc, e.pos - t.t_pos AS diag, e.pos,
         |          e.pos - ROW_NUMBER() OVER (PARTITION BY e.doc_id, t.t_doc, e.pos - t.t_pos
         |                                     ORDER BY e.pos) AS island
         |        FROM ec e JOIN tc t ON t.sh = e.sh),
         |st AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS streak
         |       FROM isl GROUP BY doc_id, t_doc, diag, island),
         |mr AS (SELECT doc_id, MAX(streak) + 7 AS max_run FROM st GROUP BY 1),
         |cnt AS (SELECT doc_id, CAST(COUNT(DISTINCT sh) AS BIGINT) AS n_sh FROM esh GROUP BY 1)
         |SELECT c.doc_id, c.n_sh,
         |  CAST(COALESCE(mr.max_run, 0) AS BIGINT) AS max_run_tokens
         |FROM cnt c LEFT JOIN mr ON mr.doc_id = c.doc_id""".stripMargin,
    // signature-store health: replay rep collapse, chooseL's level
    // rule, and per-tier prefix cardinalities (band prefixes off the
    // shared minhash CTE chain — clone docs share sigs, so doc-grain
    // distinct == rep-grain distinct)
    "dedup_store_stats" ->
      s"""WITH $shingleCtes,
         |dd AS (SELECT doc_id, md5($normSql) AS h FROM documents),
         |gg AS (SELECT doc_id, h, MIN(doc_id) OVER (PARTITION BY h) AS rep_id FROM dd),
         |rr AS (SELECT rep_id, h FROM gg WHERE doc_id = rep_id),
         |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_reps,
         |         (SELECT CAST(COUNT(*) AS BIGINT) FROM dd) AS n_docs FROM rr),
         |ll AS (SELECT CASE WHEN 4 * n_reps <= 4 * 8388608 THEN 0
         |                   WHEN 4 * n_reps / 16.0 <= 8388608.0 THEN 1
         |                   WHEN 4 * n_reps / 256.0 <= 8388608.0 THEN 2
         |                   WHEN 4 * n_reps / 4096.0 <= 8388608.0 THEN 3
         |                   ELSE 4 END AS l, n_reps, n_docs FROM nn),
         |tiers AS (
         |  SELECT 'groups' AS tier, n_docs AS n_rows,
         |    (SELECT CAST(COUNT(DISTINCT rep_id % CAST(pow(16, l) AS BIGINT)) AS BIGINT) FROM rr, ll) AS n_dirs,
         |    l FROM ll
         |  UNION ALL
         |  SELECT 'reps', n_reps,
         |    (SELECT CAST(COUNT(DISTINCT substr(h, 1, l)) AS BIGINT) FROM rr, ll), l FROM ll
         |  UNION ALL
         |  SELECT 'bands', 4 * n_reps,
         |    (SELECT CAST(COUNT(DISTINCT substr(sig, 1, l)) AS BIGINT) FROM bs, ll), l FROM ll
         |  UNION ALL
         |  SELECT 'bbits', n_reps,
         |    (SELECT CAST(COUNT(DISTINCT rep_id % CAST(pow(16, l) AS BIGINT)) AS BIGINT) FROM rr, ll), l FROM ll)
         |SELECT tier, CAST(n_rows AS BIGINT) AS n_rows, n_dirs, CAST(l AS BIGINT) AS layout_l,
         |  CAST(n_rows // GREATEST(n_dirs, 1) AS BIGINT) AS rows_per_dir
         |FROM tiers""".stripMargin,
    // per-doc novelty: fraction of distinct 8-gram shingles whose
    // corpus-wide first occurrence (min doc_id) is this doc
    "text_ngram_novelty" ->
      s"""WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |sh AS (SELECT DISTINCT doc_id,
         |         toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' ||
         |         toks[i+4] || ' ' || toks[i+5] || ' ' || toks[i+6] || ' ' || toks[i+7] AS shingle
         |       FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 7)) AS i
         |             FROM d WHERE len(toks) >= 8)),
         |f AS (SELECT shingle, MIN(doc_id) AS first_doc FROM sh GROUP BY 1),
         |cnt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM sh GROUP BY 1),
         |nv AS (SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_novel
         |       FROM sh s JOIN f ON f.shingle = s.shingle AND f.first_doc = s.doc_id GROUP BY 1)
         |SELECT cnt.doc_id, cnt.n_sh, COALESCE(nv.n_novel, 0) AS n_novel,
         |  CAST(COALESCE(nv.n_novel, 0) * 10000 // GREATEST(cnt.n_sh, 1) AS BIGINT) AS novelty_bp
         |FROM cnt LEFT JOIN nv USING (doc_id)""".stripMargin,
    // segment-grain keep-first dedup: fixed 8-token windows stand in
    // for paragraphs; an occurrence survives iff globally first by
    // (doc_id, seg_idx). Spark seg_idx (posexplode) and DuckDB i
    // (range) are both 0-based; list slicing clamps identically
    "dedup_paragraph" ->
      s"""WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |s AS (SELECT doc_id, i AS seg_idx,
         |        array_to_string(toks[i*8+1 : i*8+8], ' ') AS seg
         |      FROM (SELECT doc_id, toks, unnest(range(((len(toks) - 1) // 8) + 1)) AS i FROM d)),
         |k AS (SELECT doc_id,
         |        ROW_NUMBER() OVER (PARTITION BY md5(seg) ORDER BY doc_id, seg_idx) AS rnk
         |      FROM s)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_segs,
         |  CAST(SUM(CASE WHEN rnk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(SUM(CASE WHEN rnk = 1 THEN 1 ELSE 0 END) * 10000 // COUNT(*) AS BIGINT) AS kept_bp
         |FROM k GROUP BY 1""".stripMargin,
    // within-corpus substring dedup: same diagonal-streak machinery
    // self-joined with doc_id != t_doc; dup_tokens = per-doc interval
    // union of DISTINCT spans with run >= 16 (running-max merge);
    // 0-based (Spark) vs 1-based (DuckDB) positions cancel in both the
    // diagonal and the coverage arithmetic
    "dedup_substring" ->
      s"""WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |nt AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_toks FROM d),
         |sh AS (SELECT doc_id, i AS pos,
         |         toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' ||
         |         toks[i+4] || ' ' || toks[i+5] || ' ' || toks[i+6] || ' ' || toks[i+7] AS sh
         |       FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 7)) AS i
         |             FROM d WHERE len(toks) >= 8)),
         |c AS (SELECT * FROM sh QUALIFY COUNT(*) OVER (PARTITION BY sh) <= 64),
         |isl AS (SELECT a.doc_id, b.doc_id AS t_doc, a.pos - b.pos AS diag, a.pos,
         |          a.pos - ROW_NUMBER() OVER (PARTITION BY a.doc_id, b.doc_id, a.pos - b.pos
         |                                     ORDER BY a.pos) AS island
         |        FROM c a JOIN c b ON b.sh = a.sh AND b.doc_id <> a.doc_id),
         |runs AS (SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS s, CAST(COUNT(*) + 7 AS BIGINT) AS run
         |         FROM isl GROUP BY doc_id, t_doc, diag, island),
         |mr AS (SELECT doc_id, CAST(MAX(run) AS BIGINT) AS max_run_tokens FROM runs GROUP BY 1),
         |iv AS (SELECT DISTINCT doc_id, s, s + run AS e FROM runs WHERE run >= 16),
         |cv AS (SELECT doc_id, e,
         |         GREATEST(COALESCE(MAX(e) OVER (PARTITION BY doc_id ORDER BY s, e
         |                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), s), s) AS lo
         |       FROM iv),
         |cov AS (SELECT doc_id, CAST(SUM(GREATEST(e - lo, 0)) AS BIGINT) AS dup_tokens
         |        FROM cv GROUP BY 1)
         |SELECT nt.doc_id, nt.n_toks,
         |  CAST(COALESCE(mr.max_run_tokens, 0) AS BIGINT) AS max_run_tokens,
         |  CAST(COALESCE(cov.dup_tokens, 0) AS BIGINT) AS dup_tokens,
         |  CAST(COALESCE(cov.dup_tokens, 0) * 10000 // nt.n_toks AS BIGINT) AS dup_share_bp
         |FROM nt LEFT JOIN mr USING (doc_id) LEFT JOIN cov USING (doc_id)""".stripMargin,
    "dedup_contamination" ->
      s"""WITH $shingleCtes,
         |ps AS (SELECT LEAST(da.source, db.source) AS source_a,
         |              GREATEST(da.source, db.source) AS source_b
         |       FROM pairs p JOIN documents da ON da.doc_id = p.doc_a
         |       JOIN documents db ON db.doc_id = p.doc_b
         |       WHERE da.source != db.source)
         |SELECT source_a, source_b, COUNT(*) AS n_pairs FROM ps GROUP BY 1, 2""".stripMargin,
    "dedup_incremental" -> incrementalOracleSql,
    // takedown tombstones: a deleted corpus doc can never be reported
    // as a match — the oracle is the incremental match over the corpus
    // MINUS the deleted docs (tombstone-filtered store ≡ live-corpus
    // store; surviving group members still match through shared bands)
    "dedup_store_delete" ->
      s"""WITH $shingleCtes,
         |h AS (SELECT doc_id, md5($normSql) AS th FROM documents),
         |ex AS (SELECT i.doc_id AS new_doc_id, c.doc_id AS match_doc_id, 'exact' AS kind
         |       FROM h i JOIN h c ON c.th = i.th
         |       WHERE i.doc_id >= 400 AND c.doc_id < 400 AND c.doc_id % 11 != 4),
         |nr AS (SELECT DISTINCT b.doc_id AS new_doc_id, a.doc_id AS match_doc_id, 'near' AS kind
         |       FROM bs a JOIN bs b ON b.band = a.band AND b.sig = a.sig
         |       WHERE b.doc_id >= 400 AND a.doc_id < 400 AND a.doc_id % 11 != 4)
         |SELECT new_doc_id, match_doc_id, MIN(kind) AS kind
         |FROM (SELECT * FROM ex UNION ALL SELECT * FROM nr) GROUP BY 1, 2""".stripMargin,
    // the streaming loop drains the whole delta in one AvailableNow
    // batch under Verify, so its match set equals the batch incremental
    // dedup — same oracle; the intra-stream append path is spec-bound
    "dedup_stream" -> incrementalOracleSql,
    // hyperplane-LSH OR-construction: 8 tables x 4 sign bits; candidate
    // pairs share a bucket in ANY table, verified by exact cosine.
    // plane p (0..31) belongs to table p//4, bit p%4 — mirrors
    // PortableHash.planeWeights(32, 64) exactly.
    "dedup_embedding" ->
      s"""WITH qe AS (SELECT vec_id, label, i, CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS v
         |            FROM (SELECT vec_id, label, embedding, unnest(generate_series(1, 64)) AS i FROM embeddings)),
         |nn AS (SELECT vec_id, CAST(SUM(v * v) AS BIGINT) AS n2 FROM qe GROUP BY 1),
         |pl AS (SELECT p, i,
         |         2 * (instr('0123456789abcdef',
         |                    substr(md5('plane:' || CAST(p AS VARCHAR) || ':' || CAST(i AS VARCHAR)), 1, 1)) - 1) - 15 AS w
         |       FROM (SELECT unnest(generate_series(0, 31)) AS p), (SELECT unnest(generate_series(1, 64)) AS i)),
         |db AS (SELECT qe.vec_id, pl.p, CAST(SUM(qe.v * pl.w) AS BIGINT) AS dt
         |       FROM qe JOIN pl ON pl.i = qe.i GROUP BY 1, 2),
         |bk AS (SELECT vec_id, p // 4 AS tbl,
         |         CAST(SUM(CASE WHEN dt > 0 THEN (1 << CAST(p % 4 AS INTEGER)) ELSE 0 END) AS BIGINT) AS bucket
         |       FROM db GROUP BY 1, 2),
         |cd AS (SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
         |       FROM bk x JOIN bk y ON y.tbl = x.tbl AND y.bucket = x.bucket AND x.vec_id < y.vec_id),
         |dt AS (SELECT cd.vec_a, cd.vec_b, CAST(SUM(a.v * b.v) AS BIGINT) AS dot
         |       FROM cd JOIN qe a ON a.vec_id = cd.vec_a
         |       JOIN qe b ON b.vec_id = cd.vec_b AND b.i = a.i
         |       GROUP BY 1, 2),
         |cc AS (SELECT vec_a, vec_b,
         |              CAST(dot AS DOUBLE) / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)) AS cos
         |       FROM dt JOIN nn na ON na.vec_id = vec_a JOIN nn nb ON nb.vec_id = vec_b)
         |SELECT cc.vec_a, cc.vec_b, CAST(e.label AS BIGINT) AS label,
         |       CAST(round(cos * 1000000) AS BIGINT) AS cos_micro
         |FROM cc JOIN embeddings e ON e.vec_id = cc.vec_a
         |WHERE cos >= 0.4""".stripMargin,
    // apply the gain round: CC over the move edges (simultaneous
    // apply), Newman Q before (singletons) and after in exact bp —
    // BigInt / and DuckDB // both truncate toward zero on the
    // negative singleton Q
    "graph_louvain_apply" ->
      s"""WITH RECURSIVE $shingleCtes,
         |ed AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
         |       UNION ALL SELECT doc_b, doc_a FROM pairs),
         |dg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS k FROM ed GROUP BY 1),
         |mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM pairs),
         |g AS (SELECT e.src AS node, e.dst AS mi,
         |        CAST(2 * mm.m - di.k * dj.k AS BIGINT) AS gain_num
         |      FROM ed e JOIN dg di ON di.node = e.src JOIN dg dj ON dj.node = e.dst CROSS JOIN mm),
         |mv AS (SELECT node, mi FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY node
         |         ORDER BY gain_num DESC, mi ASC) AS rnk FROM g)
         |       WHERE rnk = 1 AND gain_num > 0),
         |me AS (SELECT node AS src, mi AS dst FROM mv UNION ALL SELECT mi, node FROM mv),
         |reach(src, dst) AS (
         |  SELECT src, dst FROM me
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN me e ON e.src = r.dst),
         |ccl AS (SELECT src AS node, LEAST(src, MIN(dst)) AS lab FROM reach GROUP BY src),
         |lab AS (SELECT dg.node, COALESCE(ccl.lab, dg.node) AS lab
         |        FROM dg LEFT JOIN ccl ON ccl.node = dg.node),
         |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM dg),
         |nmv AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_moves FROM mv),
         |ia AS (SELECT CAST(COUNT(*) AS BIGINT) AS intra FROM pairs p
         |       JOIN lab a ON a.node = p.doc_a
         |       JOIN lab b ON b.node = p.doc_b AND b.lab = a.lab),
         |dc AS (SELECT l.lab, CAST(SUM(dg.k) AS BIGINT) AS dc
         |       FROM dg JOIN lab l ON l.node = dg.node GROUP BY 1),
         |sm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_comm, SUM(CAST(dc AS HUGEINT) * dc) AS sdc2 FROM dc),
         |sk AS (SELECT SUM(CAST(k AS HUGEINT) * k) AS sk2 FROM dg)
         |SELECT nn.n_nodes, mm.m AS n_edges, nmv.n_moves, sm.n_comm AS n_communities,
         |  ia.intra AS intra_edges,
         |  CASE WHEN mm.m = 0 THEN CAST(0 AS BIGINT)
         |    ELSE CAST((CAST(-10000 AS HUGEINT) * sk.sk2)
         |      // (CAST(4 AS HUGEINT) * mm.m * mm.m) AS BIGINT) END AS q_before_bp,
         |  CASE WHEN mm.m = 0 THEN CAST(0 AS BIGINT)
         |    ELSE CAST((CAST(10000 AS HUGEINT) * (CAST(4 AS HUGEINT) * mm.m * ia.intra - COALESCE(sm.sdc2, 0)))
         |      // (CAST(4 AS HUGEINT) * mm.m * mm.m) AS BIGINT) END AS q_after_bp
         |FROM nn, mm, nmv, ia, sm, sk""".stripMargin,
    // the REAL Louvain loop, 3 unrolled levels: weighted gain + CC
    // apply + Q-acceptance gate + community contraction per level.
    // The gate compares Q NUMERATORS over the shared constant
    // denominator 4M² (M = total weight, invariant under contraction)
    // so no truncation enters accept/reject; bp truncation only in
    // the published q_bp (HUGEINT // matches BigInt / toward zero)
    "graph_louvain_levels" -> louvainLevelsOracleSql(3),
    // the composed final communities off the same 3-level chain
    "graph_louvain_labels" -> louvainLabelsOracleSql(3),
    // one Louvain gain round from singletons: numerator 2m - ki*kj per
    // edge, per-node argmax (gain desc, neighbor asc), positive only
    "graph_louvain_gain" ->
      s"""WITH $shingleCtes,
         |ed AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
         |       UNION ALL SELECT doc_b, doc_a FROM pairs),
         |dg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS k FROM ed GROUP BY 1),
         |mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM pairs),
         |g AS (SELECT e.src AS node, e.dst AS merges_into, di.k AS k_node, dj.k AS k_best,
         |        CAST(2 * mm.m - di.k * dj.k AS BIGINT) AS gain_num
         |      FROM ed e JOIN dg di ON di.node = e.src JOIN dg dj ON dj.node = e.dst CROSS JOIN mm),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY node
         |        ORDER BY gain_num DESC, merges_into ASC) AS rnk FROM g)
         |SELECT node, merges_into, k_node, k_best, gain_num
         |FROM r WHERE rnk = 1 AND gain_num > 0""".stripMargin,
    // threshold operating curve: the dedup_embedding candidate+verify
    // chain, rolled up per cosine tier
    "emb_threshold_curve" ->
      s"""WITH qe AS (SELECT vec_id, label, i, CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS v
         |            FROM (SELECT vec_id, label, embedding, unnest(generate_series(1, 64)) AS i FROM embeddings)),
         |nn AS (SELECT vec_id, CAST(SUM(v * v) AS BIGINT) AS n2 FROM qe GROUP BY 1),
         |pl AS (SELECT p, i,
         |         2 * (instr('0123456789abcdef',
         |                    substr(md5('plane:' || CAST(p AS VARCHAR) || ':' || CAST(i AS VARCHAR)), 1, 1)) - 1) - 15 AS w
         |       FROM (SELECT unnest(generate_series(0, 31)) AS p), (SELECT unnest(generate_series(1, 64)) AS i)),
         |db AS (SELECT qe.vec_id, pl.p, CAST(SUM(qe.v * pl.w) AS BIGINT) AS dt
         |       FROM qe JOIN pl ON pl.i = qe.i GROUP BY 1, 2),
         |bk AS (SELECT vec_id, p // 4 AS tbl,
         |         CAST(SUM(CASE WHEN dt > 0 THEN (1 << CAST(p % 4 AS INTEGER)) ELSE 0 END) AS BIGINT) AS bucket
         |       FROM db GROUP BY 1, 2),
         |cd AS (SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
         |       FROM bk x JOIN bk y ON y.tbl = x.tbl AND y.bucket = x.bucket AND x.vec_id < y.vec_id),
         |dt AS (SELECT cd.vec_a, cd.vec_b, CAST(SUM(a.v * b.v) AS BIGINT) AS dot
         |       FROM cd JOIN qe a ON a.vec_id = cd.vec_a
         |       JOIN qe b ON b.vec_id = cd.vec_b AND b.i = a.i
         |       GROUP BY 1, 2),
         |cc AS (SELECT vec_a, vec_b,
         |              CAST(dot AS DOUBLE) / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)) AS cos
         |       FROM dt JOIN nn na ON na.vec_id = vec_a JOIN nn nb ON nb.vec_id = vec_b),
         |sc AS (SELECT vec_a, vec_b, CAST(round(cos * 1000000) AS BIGINT) AS cm FROM cc WHERE cos >= 0.4),
         |tiers AS (SELECT CAST(unnest([400000, 600000, 800000, 950000]) AS BIGINT) AS thr_micro),
         |tp AS (SELECT t.thr_micro, s.vec_a, s.vec_b FROM tiers t JOIN sc s ON s.cm >= t.thr_micro),
         |np AS (SELECT thr_micro, CAST(COUNT(*) AS BIGINT) AS n_pairs FROM tp GROUP BY 1),
         |nd AS (SELECT thr_micro, CAST(COUNT(DISTINCT v) AS BIGINT) AS n_dup_docs
         |       FROM (SELECT thr_micro, vec_a AS v FROM tp UNION ALL SELECT thr_micro, vec_b FROM tp)
         |       GROUP BY 1),
         |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs FROM embeddings)
         |SELECT t.thr_micro, COALESCE(np.n_pairs, 0) AS n_pairs,
         |  COALESCE(nd.n_dup_docs, 0) AS n_dup_docs,
         |  CAST(COALESCE(nd.n_dup_docs, 0) * 10000 // tot.n_vecs AS BIGINT) AS dup_mass_bp
         |FROM tiers t CROSS JOIN tot
         |LEFT JOIN np ON np.thr_micro = t.thr_micro
         |LEFT JOIN nd ON nd.thr_micro = t.thr_micro""".stripMargin,
    // semantic clusters: reachability over the member-level verified
    // cosine pair set — rep-level CC + star expansion must reproduce it
    "dedup_embedding_clusters" ->
      s"""WITH RECURSIVE qe AS (SELECT vec_id, label, i, CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS v
         |            FROM (SELECT vec_id, label, embedding, unnest(generate_series(1, 64)) AS i FROM embeddings)),
         |nn AS (SELECT vec_id, CAST(SUM(v * v) AS BIGINT) AS n2 FROM qe GROUP BY 1),
         |pl AS (SELECT p, i,
         |         2 * (instr('0123456789abcdef',
         |                    substr(md5('plane:' || CAST(p AS VARCHAR) || ':' || CAST(i AS VARCHAR)), 1, 1)) - 1) - 15 AS w
         |       FROM (SELECT unnest(generate_series(0, 31)) AS p), (SELECT unnest(generate_series(1, 64)) AS i)),
         |db AS (SELECT qe.vec_id, pl.p, CAST(SUM(qe.v * pl.w) AS BIGINT) AS dt
         |       FROM qe JOIN pl ON pl.i = qe.i GROUP BY 1, 2),
         |bk AS (SELECT vec_id, p // 4 AS tbl,
         |         CAST(SUM(CASE WHEN dt > 0 THEN (1 << CAST(p % 4 AS INTEGER)) ELSE 0 END) AS BIGINT) AS bucket
         |       FROM db GROUP BY 1, 2),
         |cd AS (SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
         |       FROM bk x JOIN bk y ON y.tbl = x.tbl AND y.bucket = x.bucket AND x.vec_id < y.vec_id),
         |dt AS (SELECT cd.vec_a, cd.vec_b, CAST(SUM(a.v * b.v) AS BIGINT) AS dot
         |       FROM cd JOIN qe a ON a.vec_id = cd.vec_a
         |       JOIN qe b ON b.vec_id = cd.vec_b AND b.i = a.i
         |       GROUP BY 1, 2),
         |pr AS (SELECT vec_a, vec_b FROM dt
         |       JOIN nn na ON na.vec_id = vec_a JOIN nn nb ON nb.vec_id = vec_b
         |       WHERE CAST(dot AS DOUBLE) / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)) >= 0.4),
         |edges AS (SELECT vec_a AS src, vec_b AS dst FROM pr
         |          UNION ALL SELECT vec_b, vec_a FROM pr),
         |reach(src, dst) AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.dst
         |)
         |SELECT src AS vec_id, LEAST(src, MIN(dst)) AS cluster_id
         |FROM reach GROUP BY src""".stripMargin,
    // hygiene report: exact integer squared norms via the same
    // micro-quantization the ANN oracles use
    "emb_norm_stats" ->
      s"""WITH $quantCtes,
         |e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
         |             CAST(len(embedding) AS BIGINT) AS vdim FROM embeddings)
         |SELECT label, COUNT(*) AS n_vecs,
         |  CAST(SUM(CASE WHEN vdim <> 64 THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_dim,
         |  CAST(SUM(CASE WHEN n2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
         |  MIN(n2) AS min_n2, MAX(n2) AS max_n2
         |FROM e JOIN n USING (vec_id) GROUP BY 1""".stripMargin,
    "ann_topk_bruteforce" -> bruteTopkOracleSql,
    // recall@10 of the IVF-PQ index vs exact brute force, per probe:
    // both sides are the queries' own oracles composed as derived
    // tables (DuckDB allows WITH inside a FROM subquery)
    "emb_matryoshka_eval" -> matryoshkaOracleSql,
    "ann_recall_vs_nprobe" -> recallVsNprobeOracleSql,
    "ann_recall_vs_shortlist" -> recallVsShortlistOracleSql,
    "ann_recall_vs_nplanes" -> recallVsNplanesOracleSql,
    // truncated-mean variance (E[x²]−E[x]² in micro², toward-zero //
    // both engines); DuckDB's i is 1-based, Spark's posexplode 0-based
    "emb_dim_variance" ->
      s"""WITH $quantCtes,
         |m AS (SELECT i - 1 AS dim, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(v) AS BIGINT) AS sum_q,
         |        CAST(SUM(v * v) AS BIGINT) AS sumsq_q FROM q GROUP BY 1),
         |vv AS (SELECT *, sumsq_q // n - (sum_q // n) * (sum_q // n) AS var_micro2 FROM m)
         |SELECT CAST(dim AS BIGINT) AS dim, n, sum_q, sumsq_q,
         |  CAST(var_micro2 AS BIGINT) AS var_micro2,
         |  CAST(var_micro2 * 10000 // GREATEST(SUM(var_micro2) OVER (), 1) AS BIGINT) AS share_bp
         |FROM vv""".stripMargin,
    "emb_cosine_histogram" ->
      s"""WITH $quantCtes,
         |d AS (SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id, CAST(SUM(a.v * b.v) AS BIGINT) AS dot
         |      FROM (SELECT * FROM q WHERE vec_id < 5) a
         |      JOIN q b ON b.i = a.i AND b.vec_id != a.vec_id GROUP BY 1, 2),
         |c AS (SELECT CAST(round(CAST(dot AS DOUBLE) / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)) * 1000000) AS BIGINT) AS cos_micro
         |      FROM d JOIN n na ON na.vec_id = probe_id JOIN n nb ON nb.vec_id = neighbor_id)
         |SELECT CAST((cos_micro + 1000000) // 100000 AS BIGINT) AS bin,
         |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |  CAST(MIN(cos_micro) AS BIGINT) AS lo_micro, CAST(MAX(cos_micro) AS BIGINT) AS hi_micro
         |FROM c GROUP BY 1""".stripMargin,
    // binary sign codes packed into two 32-bit words (lo = dims 1–32,
    // hi = 33–64) so every shift stays in signed-64 range on both
    // engines; Hamming = bit_count(xor) per word, summed
    "ann_hamming_search" -> hammingTopkOracleSql,
    // two-stage: hamming shortlist-50 group-limit, exact-cosine rerank
    // of the shortlist only (the float cos is IEEE-identical from
    // exact integer dot/norms — the bruteforce oracle's precedent)
    "ann_hamming_rerank" -> hammingRerankOracleSql,
    "ann_hamming_recall" ->
      s"""SELECT t.probe_id,
         |  CAST(SUM(CASE WHEN r.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits_binary,
         |  CAST(SUM(CASE WHEN rr.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits_rerank,
         |  CAST(SUM(CASE WHEN r.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) * 10000 // 10 AS BIGINT) AS recall_binary_bp,
         |  CAST(SUM(CASE WHEN rr.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) * 10000 // 10 AS BIGINT) AS recall_rerank_bp
         |FROM ($bruteTopkOracleSql) t
         |LEFT JOIN ($hammingTopkOracleSql) r
         |  ON r.probe_id = t.probe_id AND r.neighbor_id = t.neighbor_id
         |LEFT JOIN ($hammingRerankOracleSql) rr
         |  ON rr.probe_id = t.probe_id AND rr.neighbor_id = t.neighbor_id
         |GROUP BY 1""".stripMargin,
    "graph_kcore" -> kcoreOracleSql,
    // the MOSS matcher: same winnowing selection CTEs as
    // text_winnowing, DISTINCT selected fingerprints per doc, df-capped
    // pair join (QUALIFY ≤ 64 — the dropOversizedBuckets policy),
    // denominators from the UNCAPPED per-doc counts
    "dedup_winnowing" ->
      s"""WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |g AS (SELECT doc_id, i - 1 AS pos,
         |        md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]) AS h
         |      FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 3)) AS i
         |            FROM d WHERE len(toks) >= 4)),
         |m AS (SELECT doc_id, pos, h,
         |        MIN(h) OVER (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN 0 PRECEDING AND 3 FOLLOWING) AS m0,
         |        MIN(h) OVER (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN 1 PRECEDING AND 2 FOLLOWING) AS m1,
         |        MIN(h) OVER (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING) AS m2,
         |        MIN(h) OVER (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN 3 PRECEDING AND 0 FOLLOWING) AS m3
         |      FROM g),
         |fp AS (SELECT DISTINCT doc_id, h FROM m WHERE h = m0 OR h = m1 OR h = m2 OR h = m3),
         |fc AS (SELECT * FROM fp QUALIFY COUNT(*) OVER (PARTITION BY h) <= 64),
         |pd AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_fp FROM fp GROUP BY 1),
         |pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS n_shared
         |       FROM fc a JOIN fc b ON b.h = a.h AND a.doc_id < b.doc_id GROUP BY 1, 2
         |       HAVING COUNT(*) >= 2)
         |SELECT pr.doc_a, pr.doc_b, pr.n_shared, pa.n_fp AS n_fp_a, pb.n_fp AS n_fp_b,
         |  CAST(pr.n_shared * 10000 // least(pa.n_fp, pb.n_fp) AS BIGINT) AS overlap_bp
         |FROM pr JOIN pd pa ON pa.doc_id = pr.doc_a JOIN pd pb ON pb.doc_id = pr.doc_b""".stripMargin,
    // centroid is the exact FLOOR average per dim (pmod identity);
    // d2 = Σ(v−cv)² equals the Spark side's n2 + c2 − 2·dot integer
    "emb_outlier_topk" ->
      s"""WITH $quantCtes,
         |cen AS (SELECT i, CAST((SUM(v) - (((SUM(v) % COUNT(*)) + COUNT(*)) % COUNT(*))) // COUNT(*) AS BIGINT) AS cv
         |        FROM q GROUP BY 1),
         |d AS (SELECT q.vec_id, CAST(SUM((q.v - cen.cv) * (q.v - cen.cv)) AS BIGINT) AS d2
         |      FROM q JOIN cen ON cen.i = q.i GROUP BY 1),
         |r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY d2 DESC, vec_id ASC) AS rn FROM d)
         |SELECT vec_id, CAST(rn AS BIGINT) AS rnk, d2 FROM r WHERE rn <= 20""".stripMargin,
    "ann_recall_eval" ->
      s"""SELECT t.probe_id,
         |  CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_hits,
         |  CAST(COUNT(a.neighbor_id) * 10000 // 10 AS BIGINT) AS recall_bp
         |FROM ($bruteTopkOracleSql) t
         |LEFT JOIN ($ivfPqOracleSql) a
         |  ON a.probe_id = t.probe_id AND a.neighbor_id = t.neighbor_id
         |GROUP BY 1""".stripMargin,
    "ann_lsh_bucketed" ->
      s"""WITH $quantCtes,
         |pl AS (SELECT p, i,
         |         2 * (instr('0123456789abcdef',
         |                    substr(md5('plane:' || CAST(p AS VARCHAR) || ':' || CAST(i AS VARCHAR)), 1, 1)) - 1) - 15 AS w
         |       FROM (SELECT unnest(generate_series(0, 3)) AS p), (SELECT unnest(generate_series(1, 64)) AS i)),
         |db AS (SELECT q.vec_id, pl.p, CAST(SUM(q.v * pl.w) AS BIGINT) AS dt
         |       FROM q JOIN pl ON pl.i = q.i GROUP BY 1, 2),
         |bk AS (SELECT vec_id,
         |         CAST(SUM(CASE WHEN dt > 0 THEN (1 << CAST(p AS INTEGER)) ELSE 0 END) AS BIGINT) AS bucket
         |       FROM db GROUP BY 1),
         |cd AS (SELECT pr.vec_id AS probe_id, bk.vec_id AS neighbor_id, pr.bucket
         |       FROM (SELECT * FROM bk WHERE vec_id < 5) pr
         |       JOIN bk ON bk.bucket = pr.bucket AND bk.vec_id != pr.vec_id),
         |dt AS (SELECT cd.probe_id, cd.neighbor_id, cd.bucket, CAST(SUM(a.v * b.v) AS BIGINT) AS dot
         |       FROM cd JOIN q a ON a.vec_id = cd.probe_id
         |       JOIN q b ON b.vec_id = cd.neighbor_id AND b.i = a.i
         |       GROUP BY 1, 2, 3),
         |sc AS (SELECT probe_id, neighbor_id, bucket,
         |              CAST(dot AS DOUBLE) / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)) AS cos
         |       FROM dt JOIN n na ON na.vec_id = probe_id JOIN n nb ON nb.vec_id = neighbor_id)
         |SELECT probe_id, neighbor_id, bucket,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id ASC) AS BIGINT) AS rnk,
         |  CAST(round(cos * 1000000) AS BIGINT) AS cos_micro
         |FROM sc QUALIFY rnk <= 10""".stripMargin,
    // multiprobe: the probe side explodes to its bucket + the 4
    // Hamming-1 flips; everything downstream is the bucketed search
    "ann_lsh_multiprobe" ->
      s"""WITH $quantCtes,
         |pl AS (SELECT p, i,
         |         2 * (instr('0123456789abcdef',
         |                    substr(md5('plane:' || CAST(p AS VARCHAR) || ':' || CAST(i AS VARCHAR)), 1, 1)) - 1) - 15 AS w
         |       FROM (SELECT unnest(generate_series(0, 3)) AS p), (SELECT unnest(generate_series(1, 64)) AS i)),
         |db AS (SELECT q.vec_id, pl.p, CAST(SUM(q.v * pl.w) AS BIGINT) AS dt
         |       FROM q JOIN pl ON pl.i = q.i GROUP BY 1, 2),
         |bk AS (SELECT vec_id,
         |         CAST(SUM(CASE WHEN dt > 0 THEN (1 << CAST(p AS INTEGER)) ELSE 0 END) AS BIGINT) AS bucket
         |       FROM db GROUP BY 1),
         |pb AS (SELECT vec_id AS probe_id,
         |         unnest([bucket, xor(bucket, CAST(1 AS BIGINT)), xor(bucket, CAST(2 AS BIGINT)),
         |                 xor(bucket, CAST(4 AS BIGINT)), xor(bucket, CAST(8 AS BIGINT))]) AS bucket
         |       FROM bk WHERE vec_id < 5),
         |cd AS (SELECT pb.probe_id, bk.vec_id AS neighbor_id
         |       FROM pb JOIN bk ON bk.bucket = pb.bucket AND bk.vec_id != pb.probe_id),
         |dt AS (SELECT cd.probe_id, cd.neighbor_id, CAST(SUM(a.v * b.v) AS BIGINT) AS dot
         |       FROM cd JOIN q a ON a.vec_id = cd.probe_id
         |       JOIN q b ON b.vec_id = cd.neighbor_id AND b.i = a.i
         |       GROUP BY 1, 2),
         |sc AS (SELECT probe_id, neighbor_id,
         |              CAST(dot AS DOUBLE) / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)) AS cos
         |       FROM dt JOIN n na ON na.vec_id = probe_id JOIN n nb ON nb.vec_id = neighbor_id)
         |SELECT probe_id, neighbor_id,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id ASC) AS BIGINT) AS rnk,
         |  CAST(round(cos * 1000000) AS BIGINT) AS cos_micro
         |FROM sc QUALIFY rnk <= 10""".stripMargin,
    // range search: same bucketed candidate generation as
    // ann_lsh_bucketed, threshold filter instead of top-k ranking.
    // ann_stream_search shares it: the stream-static bucket join over
    // an AvailableNow drain emits exactly the batch range search.
    "ann_range_search" -> rangeSearchOracleSql,
    "ann_stream_search" -> rangeSearchOracleSql,
    "ann_ivf_bucketed" ->
      s"""WITH $quantCtes,
         |seed AS (SELECT vec_id - 100 AS c, i, v FROM q WHERE vec_id >= 100 AND vec_id < 108),
         |sn AS (SELECT c, CAST(SUM(v * v) AS BIGINT) AS c2 FROM seed GROUP BY 1),
         |ad AS (SELECT q.vec_id, s.c, CAST(SUM(q.v * s.v) AS BIGINT) AS dot
         |       FROM q JOIN seed s ON s.i = q.i GROUP BY 1, 2),
         |dist AS (SELECT ad.vec_id, ad.c, n.n2 + sn.c2 - 2 * ad.dot AS d2
         |         FROM ad JOIN n ON n.vec_id = ad.vec_id JOIN sn ON sn.c = ad.c),
         |asg AS (SELECT vec_id, c AS cell FROM (
         |          SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2 ASC, c ASC) AS r
         |          FROM dist) WHERE r = 1),
         |pcells AS (SELECT vec_id AS probe_id, c AS cell FROM (
         |             SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2 ASC, c ASC) AS r
         |             FROM dist WHERE vec_id < 5) WHERE r <= 2),
         |cand AS (SELECT p.probe_id, a.vec_id AS neighbor_id, p.cell
         |         FROM pcells p JOIN asg a ON a.cell = p.cell AND a.vec_id != p.probe_id),
         |dt AS (SELECT cand.probe_id, cand.neighbor_id, cand.cell, CAST(SUM(x.v * y.v) AS BIGINT) AS dot
         |       FROM cand JOIN q x ON x.vec_id = cand.probe_id
         |       JOIN q y ON y.vec_id = cand.neighbor_id AND y.i = x.i
         |       GROUP BY 1, 2, 3),
         |sc AS (SELECT probe_id, neighbor_id, cell,
         |              CAST(dot AS DOUBLE) / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)) AS cos
         |       FROM dt JOIN n na ON na.vec_id = probe_id JOIN n nb ON nb.vec_id = neighbor_id)
         |SELECT probe_id, neighbor_id, CAST(cell AS BIGINT) AS cell,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id ASC) AS BIGINT) AS rnk,
         |  CAST(round(cos * 1000000) AS BIGINT) AS cos_micro
         |FROM sc QUALIFY rnk <= 10""".stripMargin,
    // product quantization + exact re-rank: unit-normalize from the
    // exact integer norm, 8 subspaces × 8 dims, production-K codebook =
    // sub-vectors of vecs 100..355 (256 entries) refined by THREE Lloyd
    // iterations (floor-averaged integer components, // == Spark's pmod
    // formula), codes by integer L2 argmin, ADC shortlist of 100 by
    // summed probe-to-codebook lookups, exact cosine re-rank
    // filtered search: the label predicate is the join key, so the
    // candidate set is the matching class, exact at any selectivity
    "ann_label_knn" ->
      s"""WITH $quantCtes,
         |lb AS (SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings),
         |p AS (SELECT vec_id AS probe_id, label FROM lb WHERE vec_id < 5),
         |cand AS (SELECT p.probe_id, p.label, lb.vec_id AS neighbor_id
         |         FROM p JOIN lb ON lb.label = p.label AND lb.vec_id != p.probe_id),
         |dt AS (SELECT c.probe_id, c.label, c.neighbor_id, CAST(SUM(a.v * b.v) AS BIGINT) AS dot
         |       FROM cand c JOIN q a ON a.vec_id = c.probe_id
         |       JOIN q b ON b.vec_id = c.neighbor_id AND b.i = a.i
         |       GROUP BY 1, 2, 3),
         |cc AS (SELECT dt.probe_id, dt.label, dt.neighbor_id,
         |         CAST(dt.dot AS DOUBLE) / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)) AS cos
         |       FROM dt JOIN n na ON na.vec_id = dt.probe_id JOIN n nb ON nb.vec_id = dt.neighbor_id)
         |SELECT probe_id, label, neighbor_id,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id ASC) AS BIGINT) AS rnk,
         |  CAST(round(cos * 1000000) AS BIGINT) AS cos_micro
         |FROM cc QUALIFY rnk <= 10""".stripMargin,
    // IVF-PQ: seeded cells over the normalized vectors, residual
    // codebook from a deterministic sample, per-cell probe-residual
    // LUT, ADC over probed cells only, exact cosine re-rank
    "ann_ivfpq_search" -> ivfPqOracleSql,
    "ann_index_search" -> ivfPqOracleSql,
    // tombstone delete: same pipeline, deleted candidate codes excluded
    "ann_index_delete" -> ivfPqOracle(500, " AND co.vec_id % 7 != 6"),
    // append-without-retrain: every training input lives in the old
    // half, so the appended index == a full rebuild trained on it
    "ann_index_append" -> ivfPqOracle(400),
    // streaming maintenance drains to the SAME index bytes as the
    // batch append (row-local encode against the stored model), so the
    // oracle is shared
    "ann_stream_index" -> ivfPqOracle(400),
    // PQ distortion ledger: the same trained chain, stopped at the
    // assignment; per subspace the assigned row's exact d2 sums
    "emb_pq_distortion" ->
      s"""WITH $quantCtes,
         |qn AS (SELECT q.vec_id, q.i,
         |         CAST(round(CAST(q.v AS DOUBLE) * 1000000 / sqrt(CAST(n.n2 AS DOUBLE))) AS BIGINT) AS v
         |       FROM q JOIN n ON n.vec_id = q.vec_id),
         |sv AS (SELECT vec_id, CAST((i - 1) // 8 AS BIGINT) AS mi, i, v FROM qn),
         |svt AS (SELECT * FROM sv WHERE vec_id < 1000),
         |cb0 AS (SELECT vec_id - 100 AS code, mi, i, v FROM sv WHERE vec_id BETWEEN 100 AND 355),
         |${pqLloydCtes(3)},
         |ad AS (SELECT s.vec_id, s.mi, c.code, CAST(SUM((s.v - c.v) * (s.v - c.v)) AS BIGINT) AS d2
         |       FROM sv s JOIN cb3 c ON c.mi = s.mi AND c.i = s.i GROUP BY 1, 2, 3),
         |codes AS (SELECT vec_id, mi, code, d2 FROM
         |          (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, mi ORDER BY d2 ASC, code ASC) AS rn
         |           FROM ad) WHERE rn = 1)
         |SELECT CAST(mi AS BIGINT) AS mi, CAST(COUNT(*) AS BIGINT) AS n_vecs,
         |  CAST(SUM(d2) AS BIGINT) AS sum_d2, CAST(MAX(d2) AS BIGINT) AS max_d2,
         |  CAST(SUM(d2) // COUNT(*) AS BIGINT) AS mean_d2
         |FROM codes GROUP BY 1""".stripMargin,
    // SQ8: per-dim [lo, hi] grid, truncating quantize/dequantize on
    // non-negative operands, asymmetric-distance shortlist (30), exact
    // rerank — both cosines IEEE off exact integer inputs
    "ann_sq_search" ->
      s"""WITH $quantCtes,
         |rng AS (SELECT i, MIN(v) AS lo, MAX(v) AS hi, GREATEST(MAX(v) - MIN(v), 1) AS span
         |        FROM q GROUP BY 1),
         |dqv AS (SELECT q.vec_id, q.i,
         |          CAST(r.lo + ((((q.v - r.lo) * 255) // r.span) * r.span) // 255 AS BIGINT) AS dq
         |        FROM q JOIN rng r ON r.i = q.i),
         |dn AS (SELECT vec_id, GREATEST(CAST(SUM(dq * dq) AS BIGINT), 1) AS dn2 FROM dqv GROUP BY 1),
         |ad AS (SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id, CAST(SUM(a.v * b.dq) AS BIGINT) AS adot
         |       FROM (SELECT * FROM q WHERE vec_id < 5) a
         |       JOIN dqv b ON b.i = a.i AND b.vec_id != a.vec_id GROUP BY 1, 2),
         |sl AS (SELECT probe_id, neighbor_id,
         |         CAST(ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY
         |           CAST(adot AS DOUBLE) / sqrt(CAST(pa.n2 AS DOUBLE) * CAST(d.dn2 AS DOUBLE)) DESC,
         |           neighbor_id ASC) AS BIGINT) AS sq_rnk
         |       FROM ad JOIN n pa ON pa.vec_id = probe_id JOIN dn d ON d.vec_id = neighbor_id),
         |sh AS (SELECT * FROM sl WHERE sq_rnk <= 30),
         |ex AS (SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id, CAST(SUM(a.v * b.v) AS BIGINT) AS dot
         |       FROM (SELECT * FROM q WHERE vec_id < 5) a
         |       JOIN q b ON b.i = a.i GROUP BY 1, 2),
         |sc AS (SELECT sh.probe_id, sh.neighbor_id, sh.sq_rnk,
         |         CAST(ex.dot AS DOUBLE) / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)) AS cos
         |       FROM sh JOIN ex ON ex.probe_id = sh.probe_id AND ex.neighbor_id = sh.neighbor_id
         |       JOIN n na ON na.vec_id = sh.probe_id JOIN n nb ON nb.vec_id = sh.neighbor_id)
         |SELECT probe_id, neighbor_id,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id ASC) AS BIGINT) AS rnk,
         |  sq_rnk, CAST(round(cos * 1000000) AS BIGINT) AS cos_micro
         |FROM sc QUALIFY rnk <= 10""".stripMargin,
    "ann_pq_search" ->
      s"""WITH $quantCtes,
         |qn AS (SELECT q.vec_id, q.i,
         |         CAST(round(CAST(q.v AS DOUBLE) * 1000000 / sqrt(CAST(n.n2 AS DOUBLE))) AS BIGINT) AS v
         |       FROM q JOIN n ON n.vec_id = q.vec_id),
         |sv AS (SELECT vec_id, CAST((i - 1) // 8 AS BIGINT) AS mi, i, v FROM qn),
         |svt AS (SELECT * FROM sv WHERE vec_id < 1000),
         |cb0 AS (SELECT vec_id - 100 AS code, mi, i, v FROM sv WHERE vec_id BETWEEN 100 AND 355),
         |${pqLloydCtes(3)},
         |ad AS (SELECT s.vec_id, s.mi, c.code, CAST(SUM((s.v - c.v) * (s.v - c.v)) AS BIGINT) AS d2
         |       FROM sv s JOIN cb3 c ON c.mi = s.mi AND c.i = s.i GROUP BY 1, 2, 3),
         |codes AS (SELECT vec_id, mi, code FROM
         |          (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, mi ORDER BY d2 ASC, code ASC) AS rn
         |           FROM ad) WHERE rn = 1),
         |pd AS (SELECT vec_id AS probe_id, mi, code, d2 FROM ad WHERE vec_id < 5),
         |ac AS (SELECT pd.probe_id, codes.vec_id AS neighbor_id, CAST(SUM(pd.d2) AS BIGINT) AS adist
         |       FROM codes JOIN pd ON pd.mi = codes.mi AND pd.code = codes.code
         |       WHERE codes.vec_id != pd.probe_id
         |       GROUP BY 1, 2),
         |sl AS (SELECT probe_id, neighbor_id FROM
         |        (SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY adist ASC, neighbor_id ASC) AS srnk
         |         FROM ac) WHERE srnk <= 100),
         |dt AS (SELECT sl.probe_id, sl.neighbor_id, CAST(SUM(a.v * b.v) AS BIGINT) AS dot
         |       FROM sl JOIN q a ON a.vec_id = sl.probe_id
         |       JOIN q b ON b.vec_id = sl.neighbor_id AND b.i = a.i
         |       GROUP BY 1, 2),
         |cc AS (SELECT dt.probe_id, dt.neighbor_id,
         |         CAST(dt.dot AS DOUBLE) / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)) AS cos
         |       FROM dt JOIN n na ON na.vec_id = dt.probe_id JOIN n nb ON nb.vec_id = dt.neighbor_id)
         |SELECT probe_id, neighbor_id,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id ASC) AS BIGINT) AS rnk,
         |  CAST(round(cos * 1000000) AS BIGINT) AS cos_micro
         |FROM cc QUALIFY rnk <= 10""".stripMargin,
    // two Lloyd iterations from the same seeds, floor-averaged integer
    // centroids (// == Spark's (sv - pmod(sv, n)) DIV n), then the
    // same probe/search tail as ann_ivf_bucketed
    "ann_ivf_kmeans" ->
      s"""WITH $quantCtes,
         |c0 AS (SELECT vec_id - 100 AS c, i, v FROM q WHERE vec_id >= 100 AND vec_id < 108),
         |c0n AS (SELECT c, CAST(SUM(v * v) AS BIGINT) AS c2 FROM c0 GROUP BY 1),
         |d0 AS (SELECT q.vec_id, s.c, CAST(SUM(q.v * s.v) AS BIGINT) AS dot
         |       FROM q JOIN c0 s ON s.i = q.i GROUP BY 1, 2),
         |a0 AS (SELECT vec_id, c AS cell FROM (
         |         SELECT d0.vec_id, d0.c, ROW_NUMBER() OVER (PARTITION BY d0.vec_id
         |                ORDER BY n.n2 + cn.c2 - 2 * d0.dot ASC, d0.c ASC) AS r
         |         FROM d0 JOIN n ON n.vec_id = d0.vec_id JOIN c0n cn ON cn.c = d0.c) WHERE r = 1),
         |c1 AS (SELECT a0.cell AS c, q.i, CAST(CAST(SUM(q.v) AS BIGINT) // COUNT(*) AS BIGINT) AS v
         |       FROM q JOIN a0 ON a0.vec_id = q.vec_id GROUP BY 1, 2),
         |c1n AS (SELECT c, CAST(SUM(v * v) AS BIGINT) AS c2 FROM c1 GROUP BY 1),
         |d1 AS (SELECT q.vec_id, s.c, CAST(SUM(q.v * s.v) AS BIGINT) AS dot
         |       FROM q JOIN c1 s ON s.i = q.i GROUP BY 1, 2),
         |a1 AS (SELECT vec_id, c AS cell FROM (
         |         SELECT d1.vec_id, d1.c, ROW_NUMBER() OVER (PARTITION BY d1.vec_id
         |                ORDER BY n.n2 + cn.c2 - 2 * d1.dot ASC, d1.c ASC) AS r
         |         FROM d1 JOIN n ON n.vec_id = d1.vec_id JOIN c1n cn ON cn.c = d1.c) WHERE r = 1),
         |cf AS (SELECT a1.cell AS c, q.i, CAST(CAST(SUM(q.v) AS BIGINT) // COUNT(*) AS BIGINT) AS v
         |       FROM q JOIN a1 ON a1.vec_id = q.vec_id GROUP BY 1, 2),
         |cfn AS (SELECT c, CAST(SUM(v * v) AS BIGINT) AS c2 FROM cf GROUP BY 1),
         |df AS (SELECT q.vec_id, s.c, CAST(SUM(q.v * s.v) AS BIGINT) AS dot
         |       FROM q JOIN cf s ON s.i = q.i GROUP BY 1, 2),
         |dist AS (SELECT df.vec_id, df.c, n.n2 + cn.c2 - 2 * df.dot AS d2
         |         FROM df JOIN n ON n.vec_id = df.vec_id JOIN cfn cn ON cn.c = df.c),
         |asg AS (SELECT vec_id, c AS cell FROM (
         |          SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2 ASC, c ASC) AS r
         |          FROM dist) WHERE r = 1),
         |pcells AS (SELECT vec_id AS probe_id, c AS cell FROM (
         |             SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2 ASC, c ASC) AS r
         |             FROM dist WHERE vec_id < 5) WHERE r <= 2),
         |cand AS (SELECT p.probe_id, a.vec_id AS neighbor_id, p.cell
         |         FROM pcells p JOIN asg a ON a.cell = p.cell AND a.vec_id != p.probe_id),
         |dt AS (SELECT cand.probe_id, cand.neighbor_id, cand.cell, CAST(SUM(x.v * y.v) AS BIGINT) AS dot
         |       FROM cand JOIN q x ON x.vec_id = cand.probe_id
         |       JOIN q y ON y.vec_id = cand.neighbor_id AND y.i = x.i
         |       GROUP BY 1, 2, 3),
         |sc AS (SELECT probe_id, neighbor_id, cell,
         |              CAST(dot AS DOUBLE) / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)) AS cos
         |       FROM dt JOIN n na ON na.vec_id = probe_id JOIN n nb ON nb.vec_id = neighbor_id)
         |SELECT probe_id, neighbor_id, CAST(cell AS BIGINT) AS cell,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id ASC) AS BIGINT) AS rnk,
         |  CAST(round(cos * 1000000) AS BIGINT) AS cos_micro
         |FROM sc QUALIFY rnk <= 10""".stripMargin,
    "text_tokens" ->
      s"""SELECT doc_id,
         |  CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_ws_tokens,
         |  CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS BIGINT) AS n_alpha_tokens,
         |  CAST(len(list_distinct($toksSql)) AS BIGINT) AS n_unique_tokens
         |FROM documents""".stripMargin,
    // span df histogram: per-doc-distinct 8-word spans, df per span,
    // power-of-2 bands via length(bin(df)) - 1, occurrence mass share
    "text_span_df_profile" ->
      s"""WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |sp AS (SELECT DISTINCT doc_id,
         |         toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' ||
         |         toks[i+4] || ' ' || toks[i+5] || ' ' || toks[i+6] || ' ' || toks[i+7] AS span
         |       FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 7)) AS i
         |             FROM d WHERE len(toks) >= 8)),
         |f AS (SELECT span, CAST(COUNT(*) AS BIGINT) AS df FROM sp GROUP BY 1),
         |tot AS (SELECT CAST(SUM(df) AS BIGINT) AS total_occ FROM f),
         |b AS (SELECT CAST(length(bin(df)) - 1 AS BIGINT) AS df_band,
         |        CAST(COUNT(*) AS BIGINT) AS n_spans, CAST(SUM(df) AS BIGINT) AS occ
         |      FROM f GROUP BY 1)
         |SELECT df_band, CAST(pow(2, df_band) AS BIGINT) AS df_lo, n_spans, occ,
         |  CAST(occ * 10000 // total_occ AS BIGINT) AS occ_share_bp
         |FROM b, tot""".stripMargin,
    // lexical diversity replayed as run-length analysis of the sorted
    // token list (1-based DuckDB indexing mirrors the clamped 0-based
    // Spark probes; OOB list access is NULL here, dropped by filter)
    "text_lexical_diversity" ->
      s"""WITH t AS (SELECT doc_id,
         |             list_sort(list_filter($toksSql, x -> x <> '')) AS srt FROM documents),
         |n AS (SELECT doc_id, srt, CAST(len(srt) AS BIGINT) AS n_toks,
         |        CASE WHEN len(srt) = 0 THEN CAST([] AS BIGINT[])
         |             ELSE generate_series(1, len(srt)) END AS pos
         |      FROM t),
         |r AS (SELECT doc_id, n_toks, srt,
         |        list_filter(pos, i -> i = 1 OR srt[i] <> srt[i - 1]) AS starts,
         |        CAST(len(list_filter(pos, i -> (i = 1 OR srt[i] <> srt[i - 1])
         |          AND (i = len(srt) OR srt[i] <> srt[i + 1]))) AS BIGINT) AS n_hapax
         |      FROM n),
         |s AS (SELECT doc_id, n_toks, CAST(len(starts) AS BIGINT) AS n_types, n_hapax,
         |        CAST(COALESCE(list_max(list_transform(generate_series(1, len(starts)), k ->
         |          CASE WHEN k = len(starts) THEN n_toks + 1 - starts[k]
         |               ELSE starts[k + 1] - starts[k] END)), 0) AS BIGINT) AS top_tok_n
         |      FROM r)
         |SELECT doc_id, n_toks, n_types,
         |  CAST(n_types * 10000 // GREATEST(n_toks, 1) AS BIGINT) AS ttr_bp,
         |  n_hapax,
         |  CAST(n_hapax * 10000 // GREATEST(n_toks, 1) AS BIGINT) AS hapax_bp,
         |  top_tok_n,
         |  CAST(top_tok_n * 10000 // GREATEST(n_toks, 1) AS BIGINT) AS top_tok_bp
         |FROM s""".stripMargin,
    "text_bigram_pmi" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |bg AS (SELECT toks[i] AS a, toks[i+1] AS b
         |       FROM (SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS i
         |             FROM t WHERE len(toks) >= 2)),
         |nab AS (SELECT a, b, COUNT(*) AS n_ab FROM bg GROUP BY 1, 2),
         |u AS (SELECT unnest(toks) AS tok FROM t),
         |un AS (SELECT tok, COUNT(*) AS n_tok FROM u GROUP BY 1),
         |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM u),
         |top AS (SELECT a, b, n_ab,
         |          CAST(ROW_NUMBER() OVER (ORDER BY n_ab DESC, a ASC, b ASC) AS BIGINT) AS rnk
         |        FROM nab QUALIFY rnk <= 20)
         |SELECT top.a, top.b, top.n_ab, ua.n_tok AS n_a, ub.n_tok AS n_b,
         |  CAST(CAST(top.n_ab AS HUGEINT) * tot.n_total * 1000000
         |       // (CAST(ua.n_tok AS HUGEINT) * ub.n_tok) AS BIGINT) AS lift_micro,
         |  top.rnk
         |FROM top JOIN un ua ON ua.tok = top.a JOIN un ub ON ub.tok = top.b, tot""".stripMargin,
    "text_ngram_freq" ->
      s"""WITH t AS (SELECT doc_id, unnest($toksSql) AS tok FROM documents),
         |a AS (SELECT tok, COUNT(*) AS n_total, COUNT(DISTINCT doc_id) AS n_docs FROM t GROUP BY tok),
         |r AS (SELECT tok, n_total, n_docs,
         |        CAST(ROW_NUMBER() OVER (ORDER BY n_total DESC, tok ASC) AS BIGINT) AS rnk FROM a)
         |SELECT tok, n_total, n_docs, rnk FROM r WHERE rnk <= 20""".stripMargin,
    "sample_stratified" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |s AS (SELECT doc_id,
         |  CAST(len(list_filter(toks, x -> list_contains(['the','a','of','is'], x))) AS BIGINT) AS s_en,
         |  CAST(len(list_filter(toks, x -> list_contains(['el','la','los','es'], x))) AS BIGINT) AS s_es,
         |  CAST(len(list_filter(toks, x -> list_contains(['der','die','das','und'], x))) AS BIGINT) AS s_de,
         |  CAST(len(list_filter(toks, x -> list_contains(['le','les','des','et'], x))) AS BIGINT) AS s_fr
         |  FROM t),
         |l AS (SELECT doc_id,
         |  CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
         |       WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
         |       WHEN s_de >= s_fr THEN 'de' ELSE 'fr' END AS pred_lang
         |  FROM s),
         |h AS (SELECT doc_id, pred_lang, substr(md5('sample:' || doc_id), 1, 2) AS h2 FROM l)
         |SELECT doc_id, pred_lang, h2 FROM h
         |WHERE h2 < CASE pred_lang WHEN 'en' THEN '80' WHEN 'es' THEN '4d'
         |                          WHEN 'de' THEN '33' ELSE '1a' END""".stripMargin,
    "text_salient" ->
      s"""WITH t AS (SELECT doc_id, unnest($toksSql) AS tok FROM documents),
         |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM t GROUP BY 1, 2),
         |df AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM t GROUP BY 1),
         |s AS (SELECT tf.doc_id, tf.tok, tf.tf, df.df, tf.tf * 1000000 // df.df AS score_micro
         |      FROM tf JOIN df ON df.tok = tf.tok),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
         |                                   ORDER BY score_micro DESC, tok ASC) AS rn FROM s)
         |SELECT doc_id, tok AS salient_tok, tf, df, score_micro FROM r WHERE rn = 1""".stripMargin,
    // doc-level importance sampling: 16-bit md5 threshold against the
    // token-ramp/stopword-halved quality score, all integer
    "sample_quality_weighted" ->
      s"""WITH t AS (SELECT doc_id, source, $toksSql AS toks FROM documents),
         |s AS (SELECT doc_id, source,
         |    CAST(len(toks) AS BIGINT) AS n_toks,
         |    CAST(len(list_filter(toks, x -> list_contains(['the','a','of','to','and','in','is','it'], x))) AS BIGINT) AS n_stop,
         |    md5('qw:' || doc_id) AS h FROM t),
         |x AS (SELECT doc_id, source, n_toks, n_stop,
         |    CAST((strpos('0123456789abcdef', substr(h,1,1))-1)*4096
         |       + (strpos('0123456789abcdef', substr(h,2,1))-1)*256
         |       + (strpos('0123456789abcdef', substr(h,3,1))-1)*16
         |       + (strpos('0123456789abcdef', substr(h,4,1))-1) AS BIGINT) AS hash16 FROM s),
         |q AS (SELECT doc_id, source, n_toks, hash16,
         |    CASE WHEN n_stop * 40 < n_toks THEN least(10000, n_toks*250) // 2
         |         ELSE least(10000, n_toks*250) END AS quality_bp FROM x)
         |SELECT doc_id, source, n_toks, CAST(quality_bp AS BIGINT) AS quality_bp, hash16,
         |  CASE WHEN hash16 * 10000 < quality_bp * 65536
         |       THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS kept
         |FROM q""".stripMargin,
    "text_quality" ->
      s"""WITH t AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
         |w AS (SELECT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] AS win
         |      FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 3)) AS i
         |            FROM t WHERE len(toks) >= 4)),
         |wc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows,
         |              CAST(COUNT(DISTINCT win) AS BIGINT) AS n_unique_windows
         |       FROM w GROUP BY 1),
         |m AS (SELECT doc_id,
         |        CAST(length(text) AS BIGINT) AS n_chars_raw,
         |        CAST(len(toks) AS BIGINT) AS n_tokens,
         |        CAST(len(list_filter(toks, x -> list_contains(['the','a','of','to','and','in','is','it'], x))) AS BIGINT) AS n_stopwords,
         |        CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS BIGINT) AS n_punct
         |      FROM t)
         |SELECT m.doc_id, n_chars_raw, n_tokens, n_stopwords, n_punct,
         |  COALESCE(wc.n_windows, 0) AS n_windows,
         |  COALESCE(wc.n_unique_windows, 0) AS n_unique_windows,
         |  n_stopwords * 1000000 // n_tokens AS stop_ratio_micro,
         |  CASE WHEN COALESCE(wc.n_windows, 0) > 0
         |       THEN (wc.n_windows - wc.n_unique_windows) * 1000000 // wc.n_windows
         |       ELSE 0 END AS dup_win_micro,
         |  CAST(CASE WHEN n_chars_raw >= 100 AND n_stopwords * 20 >= n_tokens THEN 1 ELSE 0 END AS BIGINT) AS is_quality
         |FROM m LEFT JOIN wc ON wc.doc_id = m.doc_id""".stripMargin,
    // corpus-health audit: the hard-filter rule set aggregated per
    // source; sum_len = len(norm) - (n_toks - 1) over single-spaced norm
    "quality_rules_by_source" -> qualityRulesOracleSql,
    // the streamed books drain to the identical table (row-local flags,
    // additive counts) — shared oracle
    "quality_rules_stream" -> qualityRulesOracleSql,
    // temperature mixing (T=2): threshold = floor(256·sqrt(min_n/n)),
    // kept iff first two md5 hex digits of 'mix:'||doc_id are below it
    "sample_temperature" ->
      """WITH c AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY 1),
        |m AS (SELECT MIN(n_docs) AS min_n FROM c),
        |t AS (SELECT lang, n_docs,
        |        CAST(floor(256 * sqrt(CAST(min_n AS DOUBLE) / CAST(n_docs AS DOUBLE))) AS BIGINT) AS thresh
        |      FROM c, m),
        |d AS (SELECT lang,
        |        CAST((instr('0123456789abcdef', substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
        |           + (instr('0123456789abcdef', substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1) AS BIGINT) AS hv
        |      FROM documents)
        |SELECT t.lang, t.n_docs, t.thresh,
        |  CAST(SUM(CASE WHEN d.hv < t.thresh THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        |FROM d JOIN t ON t.lang = d.lang GROUP BY 1, 2, 3""".stripMargin,
    // deterministic 80/10/10 split: band of the first two md5 hex
    // digits of 'split:'||doc_id — content-independent, rerun-stable
    "sample_hash_split" ->
      """WITH h AS (SELECT source, n_chars,
        |  (instr('0123456789abcdef', substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
        |  + (instr('0123456789abcdef', substr(md5('split:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1) AS hv
        |  FROM documents)
        |SELECT source,
        |  CASE WHEN hv < 204 THEN 'train' WHEN hv < 230 THEN 'valid' ELSE 'test' END AS split,
        |  COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM h GROUP BY 1, 2""".stripMargin,
    "text_dedup_rate_by_source" ->
      s"""WITH h AS (SELECT source, md5($normSql) AS th FROM documents)
         |SELECT source, COUNT(*) AS n_docs, COUNT(DISTINCT th) AS n_distinct,
         |  CAST((COUNT(*) - COUNT(DISTINCT th)) * 1000000 // COUNT(*) AS BIGINT) AS dup_rate_micro
         |FROM h GROUP BY 1""".stripMargin,
    "text_bpe_train" -> bpeOracle(5),
    "text_bpe_batch" -> bpeBatchOracle(4, 6, 24),
    // exact top-5 over the amplified stream; the Spark side's MG
    // candidate pass is exact whenever rank-k count > n/cap (spec-
    // asserted), so both engines produce the same plain top-k
    "text_heavy_hitters" -> hhOracle,
    // the streamed MG summary's drained candidates always contain the
    // true heavy hitters (order-independent floor bound) and the final
    // exact recount is the same contract as batch — shared oracle
    "text_heavy_hitters_stream" -> hhOracle,
    "text_bpe_apply" -> bpeApplyOracle(5),
    "text_fertility_by_lang" -> fertilityOracle(5),
    // RAG chunk table: row-local sequence + slice + md5; tail chunks
    // below minLen drop unless they are the doc's only chunk
    "text_chunk_for_rag" ->
      s"""WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |n AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_toks FROM d),
         |st AS (SELECT doc_id, toks, n_toks,
         |         unnest(generate_series(0, CAST(GREATEST(n_toks - 1, 0) AS BIGINT), 48)) AS s0
         |       FROM n),
         |c AS (SELECT doc_id, toks, s0, LEAST(64, n_toks - s0) AS len FROM st)
         |SELECT doc_id, CAST(s0 // 48 AS BIGINT) AS chunk_id, CAST(s0 AS BIGINT) AS start,
         |  CAST(len AS BIGINT) AS len,
         |  md5(array_to_string(list_slice(toks, CAST(s0 + 1 AS BIGINT), CAST(s0 + len AS BIGINT)), ' ')) AS chunk_md5
         |FROM c WHERE len > 0 AND (len >= 16 OR s0 = 0)""".stripMargin,
    // the persisted-index roundtrip must lose nothing: same oracle as
    // the in-memory apply
    "text_bpe_index" -> bpeApplyOracle(5),
    // integer-exact tf-idf: idf = N*10^6 // df, HUGEINT sum mirrors
    // the DECIMAL path
    // unigram surprisal: bit length of N/freq per token (no float log)
    // water-filling: c0 is the equal split, each refinement pins the
    // fully-kept sources and re-floors the level over the open ones;
    // (budget − spent) and // truncate identically on both engines
    "sample_budget_alloc" ->
      s"""WITH t AS (SELECT doc_id, w AS tok FROM
         |        (SELECT doc_id, unnest($toksSql) AS w FROM documents) WHERE w <> ''),
         |ps AS (SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n
         |       FROM t JOIN documents d ON d.doc_id = t.doc_id GROUP BY 1),
         |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total, CAST(COUNT(*) AS BIGINT) AS s FROM ps),
         |c0 AS (SELECT CAST(total * 4000 // 10000 AS BIGINT) AS budget,
         |         CAST((total * 4000 // 10000) // greatest(s, 1) AS BIGINT) AS cap FROM tot),
         |c1 AS (SELECT budget, CAST(CASE WHEN open > 0 THEN (budget - spent) // open ELSE cap END AS BIGINT) AS cap
         |       FROM (SELECT c0.budget, c0.cap,
         |               CAST(COALESCE(SUM(CASE WHEN ps.n <= c0.cap THEN ps.n END), 0) AS BIGINT) AS spent,
         |               CAST(SUM(CASE WHEN ps.n > c0.cap THEN 1 ELSE 0 END) AS BIGINT) AS open
         |             FROM ps, c0 GROUP BY 1, 2)),
         |c2 AS (SELECT budget, CAST(CASE WHEN open > 0 THEN (budget - spent) // open ELSE cap END AS BIGINT) AS cap
         |       FROM (SELECT c1.budget, c1.cap,
         |               CAST(COALESCE(SUM(CASE WHEN ps.n <= c1.cap THEN ps.n END), 0) AS BIGINT) AS spent,
         |               CAST(SUM(CASE WHEN ps.n > c1.cap THEN 1 ELSE 0 END) AS BIGINT) AS open
         |             FROM ps, c1 GROUP BY 1, 2)),
         |c3 AS (SELECT budget, CAST(CASE WHEN open > 0 THEN (budget - spent) // open ELSE cap END AS BIGINT) AS cap
         |       FROM (SELECT c2.budget, c2.cap,
         |               CAST(COALESCE(SUM(CASE WHEN ps.n <= c2.cap THEN ps.n END), 0) AS BIGINT) AS spent,
         |               CAST(SUM(CASE WHEN ps.n > c2.cap THEN 1 ELSE 0 END) AS BIGINT) AS open
         |             FROM ps, c2 GROUP BY 1, 2))
         |SELECT ps.source, ps.n AS n_tokens,
         |  CAST(least(ps.n, c3.cap) AS BIGINT) AS alloc_tokens,
         |  CAST(least(ps.n, c3.cap) * 10000 // ps.n AS BIGINT) AS kept_bp,
         |  (ps.n > c3.cap) AS is_capped,
         |  c3.cap AS cap_tokens
         |FROM ps, c3""".stripMargin,
    // CCNet tercile selection off the 1/40-bit surprisal histogram:
    // threshold bins are the smallest bins whose per-lang cumulative
    // count clears 1/3 and 2/3 — integer cross-multiplication, no
    // percentile function on either engine
    "sample_perplexity_filter" ->
      s"""WITH t AS (SELECT doc_id, w AS tok FROM
         |        (SELECT doc_id, unnest($toksSql) AS w FROM documents) WHERE w <> ''),
         |f AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS f FROM t GROUP BY 1),
         |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM t),
         |pd AS (SELECT t.doc_id, d.lang, CAST(COUNT(*) AS BIGINT) AS n_toks,
         |         CAST(SUM(CAST(length(bin(nt // f)) AS BIGINT)) AS BIGINT) AS sum_bits
         |       FROM t JOIN f USING (tok) JOIN documents d ON d.doc_id = t.doc_id, n
         |       GROUP BY 1, 2),
         |pm AS (SELECT doc_id, lang, n_toks,
         |         CAST(sum_bits * 1000000 // n_toks AS BIGINT) AS mean_micro,
         |         CAST((sum_bits * 1000000 // n_toks) // 25000 AS BIGINT) AS bin FROM pd),
         |h AS (SELECT lang, bin, CAST(COUNT(*) AS BIGINT) AS nb FROM pm GROUP BY 1, 2),
         |c AS (SELECT lang, bin,
         |        CAST(SUM(nb) OVER (PARTITION BY lang ORDER BY bin) AS BIGINT) AS cum,
         |        CAST(SUM(nb) OVER (PARTITION BY lang) AS BIGINT) AS total FROM h),
         |th AS (SELECT lang, MIN(CASE WHEN cum * 3 >= total THEN bin END) AS t1,
         |         MIN(CASE WHEN cum * 3 >= total * 2 THEN bin END) AS t2 FROM c GROUP BY 1),
         |b AS (SELECT pm.lang,
         |        CASE WHEN bin <= t1 THEN 'head' WHEN bin <= t2 THEN 'middle' ELSE 'tail' END AS bucket,
         |        CASE WHEN bin > t2 THEN 0 ELSE 1 END AS keep, n_toks, mean_micro
         |      FROM pm JOIN th ON th.lang = pm.lang)
         |SELECT lang, bucket, CAST(MIN(keep) AS BIGINT) AS keep, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(n_toks) AS BIGINT) AS n_toks, CAST(MIN(mean_micro) AS BIGINT) AS lo_micro,
         |  CAST(MAX(mean_micro) AS BIGINT) AS hi_micro
         |FROM b GROUP BY 1, 2""".stripMargin,
    "text_surprisal" ->
      s"""WITH t AS (SELECT doc_id, w AS tok FROM
         |        (SELECT doc_id, unnest($toksSql) AS w FROM documents) WHERE w <> ''),
         |f AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS f FROM t GROUP BY 1),
         |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM t),
         |sc AS (SELECT doc_id, CAST(length(bin(nt // f)) AS BIGINT) AS sbits
         |       FROM t JOIN f USING (tok), n)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_toks,
         |  CAST(SUM(sbits) AS BIGINT) AS sum_bits,
         |  CAST(MAX(sbits) AS BIGINT) AS max_bits,
         |  CAST(SUM(sbits) * 1000000 // COUNT(*) AS BIGINT) AS mean_bits_micro
         |FROM sc GROUP BY 1""".stripMargin,
    // CDC chunking: identical rolling-hash boundaries restated with
    // DuckDB list comprehensions; chunk membership then groups by md5
    "text_cdc_chunks" ->
      s"""WITH t AS (SELECT doc_id, $normSql AS s FROM documents),
         |c0 AS (SELECT doc_id, s, string_split(s, '') AS cs,
         |         CAST(len(string_split(s, '')) AS INT) AS n,
         |         [513573, 286364, 727379, 211660, 55051, 259963, 108855, 176404, 718906, 982590, 373914, 499039, 248085, 17161, 131, 1] AS pw
         |       FROM t WHERE length(s) >= 1),
         |b AS (SELECT doc_id, s, n,
         |        CASE WHEN n >= 16 THEN
         |          list_filter(range(1, n - 14), i ->
         |            list_sum(list_transform(range(0, 16), j ->
         |              CAST(unicode(cs[i + j]) AS BIGINT) * pw[j + 1])) % 1000003 % 61 = 0)
         |        ELSE [] END AS bnds
         |      FROM c0),
         |e AS (SELECT doc_id, s, n,
         |        list_concat(ebs, CASE WHEN len(ebs) > 0 AND ebs[len(ebs)] = n
         |                              THEN [] ELSE [n] END) AS ends
         |      FROM (SELECT doc_id, s, n, list_transform(bnds, i -> i + 15) AS ebs FROM b)),
         |ch AS (SELECT doc_id, s,
         |         unnest(list_transform(range(1, len(ends) + 1), k ->
         |           {'st': CASE WHEN k = 1 THEN 1 ELSE ends[k - 1] + 1 END, 'en': ends[k]})) AS c
         |       FROM e),
         |g AS (SELECT doc_id, md5(substr(s, c.st, c.en - c.st + 1)) AS chunk_md5,
         |        CAST(c.en - c.st + 1 AS BIGINT) AS chunk_len FROM ch)
         |SELECT chunk_md5, MIN(chunk_len) AS chunk_len,
         |  CAST(COUNT(*) AS BIGINT) AS n_occ,
         |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |  MIN(doc_id) AS canonical_doc
         |FROM g GROUP BY 1""".stripMargin,
    "text_search_topk" -> searchTopkOracleSql,
    // the persisted-index roundtrip is byte-identical — shared oracle
    "text_search_index" -> searchTopkOracleSql,
    // PII scrub: both engines splice the identical doc_id-derived
    // residue, then count/redact with ASCII-safe regexes shared by
    // Java regex and RE2 (DuckDB needs the 'g' flag to replace all)
    "text_pii_scrub" ->
      """WITH a AS (SELECT doc_id, text
        |  || CASE WHEN doc_id % 5 = 0 THEN ' contact user' || doc_id || '@example.com now' ELSE '' END
        |  || CASE WHEN doc_id % 7 = 0 THEN ' from 10.' || (doc_id % 200) || '.0.' || (doc_id % 250) || ' logged' ELSE '' END
        |  || CASE WHEN doc_id % 11 = 0 THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' today' ELSE '' END
        |  AS aug FROM documents),
        |m AS (SELECT doc_id,
        |  CAST(len(regexp_extract_all(aug, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(aug, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ipv4,
        |  CAST(len(regexp_extract_all(aug, '\b555-\d{3}-\d{4}\b')) AS BIGINT) AS n_phones,
        |  regexp_replace(regexp_replace(regexp_replace(aug,
        |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |    '\b555-\d{3}-\d{4}\b', '<PHONE>', 'g') AS scrubbed
        |  FROM a)
        |SELECT doc_id, n_emails, n_ipv4, n_phones,
        |  n_emails + n_ipv4 + n_phones AS n_pii,
        |  CAST(length(scrubbed) AS BIGINT) AS scrub_len,
        |  md5(scrubbed) AS scrub_md5
        |FROM m""".stripMargin,
    // character-class census + the non-ASCII / C0-control hygiene
    // gates: length-minus-stripped counts, punctuation as the residual
    "text_encoding_audit" ->
      """WITH per AS (SELECT source, CAST(length(text) AS BIGINT) AS nc,
        |  CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS BIGINT) AS letters,
        |  CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS digits,
        |  CAST(length(text) - length(regexp_replace(text, ' ', '', 'g')) AS BIGINT) AS spaces,
        |  CAST(length(text) - length(regexp_replace(text, '[^\x00-\x7F]', '', 'g')) AS BIGINT) AS nonascii,
        |  CAST(length(text) - length(regexp_replace(text, '[\x00-\x1F]', '', 'g')) AS BIGINT) AS ctrl
        |  FROM documents)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(nc) AS BIGINT) AS n_chars,
        |  CAST(SUM(letters) * 10000 // GREATEST(SUM(nc), 1) AS BIGINT) AS letters_bp,
        |  CAST(SUM(digits) * 10000 // GREATEST(SUM(nc), 1) AS BIGINT) AS digits_bp,
        |  CAST(SUM(spaces) * 10000 // GREATEST(SUM(nc), 1) AS BIGINT) AS space_bp,
        |  CAST((SUM(nc) - SUM(letters) - SUM(digits) - SUM(spaces) - SUM(nonascii) - SUM(ctrl)) * 10000
        |    // GREATEST(SUM(nc), 1) AS BIGINT) AS punct_bp,
        |  CAST(SUM(nonascii) AS BIGINT) AS nonascii_chars,
        |  CAST(SUM(ctrl) AS BIGINT) AS control_chars,
        |  CAST(SUM(CASE WHEN nonascii + ctrl = 0 THEN 1 ELSE 0 END) * 10000
        |    // GREATEST(COUNT(*), 1) AS BIGINT) AS clean_bp
        |FROM per GROUP BY 1""".stripMargin,
    // log2 length buckets: bucket = length(bin(n_chars)) both engines
    "text_length_histogram" ->
      """SELECT source, CAST(length(bin(CAST(length(text) AS BIGINT))) AS BIGINT) AS bucket,
        |  COUNT(*) AS n_docs,
        |  MIN(CAST(length(text) AS BIGINT)) AS min_chars,
        |  MAX(CAST(length(text) AS BIGINT)) AS max_chars
        |FROM documents GROUP BY 1, 2""".stripMargin,
    // mixture table: per-source token share (bp) + uniform-target
    // reweight factor (micro); DuckDB HUGEINT mirrors the DECIMAL path
    "text_domain_mix" ->
      s"""WITH s AS (SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(len($toksSql)) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY 1)
         |SELECT source, n_docs, n_tokens,
         |  CAST(n_tokens * 10000 // SUM(n_tokens) OVER () AS BIGINT) AS share_bp,
         |  CAST(SUM(n_tokens) OVER () * 1000000
         |       // (COUNT(*) OVER () * n_tokens) AS BIGINT) AS weight_micro
         |FROM s""".stripMargin,
    "text_langid" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |s AS (SELECT doc_id,
         |  CAST(len(list_filter(toks, x -> list_contains(['the','a','of','is'], x))) AS BIGINT) AS s_en,
         |  CAST(len(list_filter(toks, x -> list_contains(['el','la','los','es'], x))) AS BIGINT) AS s_es,
         |  CAST(len(list_filter(toks, x -> list_contains(['der','die','das','und'], x))) AS BIGINT) AS s_de,
         |  CAST(len(list_filter(toks, x -> list_contains(['le','les','des','et'], x))) AS BIGINT) AS s_fr
         |  FROM t)
         |SELECT doc_id, s_en, s_es, s_de, s_fr,
         |  CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
         |       WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
         |       WHEN s_de >= s_fr THEN 'de' ELSE 'fr' END AS pred_lang
         |FROM s""".stripMargin,
    // langid confusion matrix vs the gold lang label: same scorer CTE
    // as text_langid, cells share_bp within each gold language
    "text_langid_eval" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |s AS (SELECT doc_id,
         |  CAST(len(list_filter(toks, x -> list_contains(['the','a','of','is'], x))) AS BIGINT) AS s_en,
         |  CAST(len(list_filter(toks, x -> list_contains(['el','la','los','es'], x))) AS BIGINT) AS s_es,
         |  CAST(len(list_filter(toks, x -> list_contains(['der','die','das','und'], x))) AS BIGINT) AS s_de,
         |  CAST(len(list_filter(toks, x -> list_contains(['le','les','des','et'], x))) AS BIGINT) AS s_fr
         |  FROM t),
         |p AS (SELECT doc_id,
         |  CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
         |       WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
         |       WHEN s_de >= s_fr THEN 'de' ELSE 'fr' END AS pred_lang FROM s),
         |c AS (SELECT d.lang, p.pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
         |      FROM documents d JOIN p ON p.doc_id = d.doc_id GROUP BY 1, 2),
         |g AS (SELECT lang, SUM(n_docs) AS n_gold FROM c GROUP BY 1)
         |SELECT c.lang, c.pred_lang, c.n_docs,
         |  CAST(c.n_docs * 10000 // g.n_gold AS BIGINT) AS share_bp,
         |  c.lang = c.pred_lang AS correct
         |FROM c JOIN g ON g.lang = c.lang""".stripMargin,
    // span-scrub accounting: boilerplate spans (>=2 docs), per-doc
    // interval union via gaps-and-islands (an island starts where
    // pos >= max(prev pos+8)); coverage never double-counts overlaps
    "text_boilerplate_scrub" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |sp AS (SELECT doc_id, i - 1 AS pos, array_to_string(toks[i:i+7], ' ') AS span
         |       FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 7)) AS i
         |             FROM t WHERE len(toks) >= 8)),
         |b AS (SELECT span FROM (SELECT span, COUNT(DISTINCT doc_id) AS nd FROM sp GROUP BY 1)
         |      WHERE nd >= 2),
         |h AS (SELECT sp.doc_id, sp.pos FROM sp JOIN b USING (span)),
         |i1 AS (SELECT doc_id, pos,
         |        MAX(pos + 8) OVER (PARTITION BY doc_id ORDER BY pos
         |                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
         |       FROM h),
         |i3 AS (SELECT doc_id, pos,
         |        SUM(CASE WHEN prev_end IS NULL OR pos >= prev_end THEN 1 ELSE 0 END)
         |          OVER (PARTITION BY doc_id ORDER BY pos) AS island
         |       FROM i1),
         |isl AS (SELECT doc_id, island, MIN(pos) AS s, MAX(pos) + 8 AS e, COUNT(*) AS n_hits
         |        FROM i3 GROUP BY 1, 2),
         |cov AS (SELECT doc_id, CAST(SUM(e - s) AS BIGINT) AS covered,
         |        CAST(SUM(n_hits) AS BIGINT) AS n_spans FROM isl GROUP BY 1),
         |d AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_toks FROM t)
         |SELECT d.doc_id, d.n_toks,
         |  COALESCE(cov.n_spans, 0) AS n_boiler_spans,
         |  COALESCE(cov.covered, 0) AS covered_tokens,
         |  d.n_toks - COALESCE(cov.covered, 0) AS residual_tokens,
         |  CAST(COALESCE(cov.covered, 0) * 10000 // GREATEST(d.n_toks, 1) AS BIGINT) AS scrub_bp
         |FROM d LEFT JOIN cov USING (doc_id)""".stripMargin,
    // Count-min sketch replay: D=4 x W=256 cells from the exploded
    // token stream, point estimate = MIN over the 4 cells, probes =
    // the top-20 exact tokens (deterministic tiebreak); the bucket
    // hash is the house md5-hex-prefix integer on both engines
    "approx_cms" -> cmsOracle,
    // the streaming CMS drains to the identical counter table (the
    // sketch is additive across micro-batches), so the batch oracle
    // verifies the stream bit-for-bit
    "approx_cms_stream" -> cmsOracle,
    // Priority sampling (Duffield-Lund-Thorup): q = w*2^48 // u from
    // the md5 uniform, top-20 per source, tau = the 21st priority
    // (0 when the source has <= 20 docs), w_hat = max(w, tau); all
    // divisions floor on positive integers so both engines agree
    "sample_priority" ->
      """WITH d AS (SELECT source, doc_id, n_chars AS weight,
        |    GREATEST(CAST('0x' || substr(md5('ps:' || CAST(doc_id AS VARCHAR)), 1, 12) AS BIGINT), 1) AS u
        |  FROM documents),
        |q AS (SELECT source, doc_id, weight, weight * 281474976710656 // u AS q FROM d),
        |r AS (SELECT source, doc_id, weight, q,
        |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY q DESC, doc_id ASC) AS rn FROM q),
        |tau AS (SELECT source, CAST(MAX(CASE WHEN rn = 21 THEN q ELSE 0 END) AS BIGINT) AS tau
        |        FROM r WHERE rn <= 21 GROUP BY 1),
        |tot AS (SELECT source, CAST(SUM(n_chars) AS BIGINT) AS total_weight FROM documents GROUP BY 1)
        |SELECT r.source, r.doc_id, CAST(r.weight AS BIGINT) AS weight, CAST(r.q AS BIGINT) AS q,
        |  tau.tau, CAST(GREATEST(r.weight, tau.tau) AS BIGINT) AS w_hat, tot.total_weight
        |FROM r JOIN tau USING (source) JOIN tot USING (source) WHERE r.rn <= 20""".stripMargin,
    // Gopher repetition filter: one tagged gram family ('2:'/'3:'
    // prefixes), duplicate-occurrence fractions in bp, DIV guarded by
    // GREATEST(·,1); docs shorter than 2 tokens drop on both engines
    "text_repetition" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |g AS (
         |  SELECT doc_id, len(toks) AS n_toks, '2:' || toks[i] || ' ' || toks[i+1] AS gram
         |  FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 1)) AS i
         |        FROM t WHERE len(toks) >= 2)
         |  UNION ALL
         |  SELECT doc_id, len(toks) AS n_toks, '3:' || toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS gram
         |  FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 2)) AS i
         |        FROM t WHERE len(toks) >= 3)),
         |c AS (SELECT doc_id, n_toks, gram, COUNT(*) AS c FROM g GROUP BY 1, 2, 3),
         |s AS (SELECT doc_id, n_toks,
         |  SUM(CASE WHEN gram LIKE '2:%' THEN c ELSE 0 END) AS g2_total,
         |  SUM(CASE WHEN gram LIKE '2:%' AND c >= 2 THEN c ELSE 0 END) AS g2_dup,
         |  SUM(CASE WHEN gram LIKE '3:%' THEN c ELSE 0 END) AS g3_total,
         |  SUM(CASE WHEN gram LIKE '3:%' AND c >= 2 THEN c ELSE 0 END) AS g3_dup
         |  FROM c GROUP BY 1, 2)
         |SELECT doc_id, CAST(n_toks AS BIGINT) AS n_toks,
         |  CAST(g2_dup AS BIGINT) AS g2_dup,
         |  CAST(g2_dup * 10000 // GREATEST(g2_total, 1) AS BIGINT) AS rep2_bp,
         |  CAST(g3_dup AS BIGINT) AS g3_dup,
         |  CAST(g3_dup * 10000 // GREATEST(g3_total, 1) AS BIGINT) AS rep3_bp,
         |  (g2_dup * 10000 // GREATEST(g2_total, 1) > 2000)
         |    OR (g3_dup * 10000 // GREATEST(g3_total, 1) > 1800) AS flagged
         |FROM s""".stripMargin,
    "text_fingerprint" ->
      s"""WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |s AS (SELECT doc_id, md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]) AS h
         |      FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 3)) AS i
         |            FROM d WHERE len(toks) >= 4))
         |SELECT doc_id, MIN(h) AS fingerprint, COUNT(*) AS n_windows FROM s GROUP BY 1""".stripMargin,
    // winnowing selection: pos selected iff it is the min of SOME
    // length-4 window = OR over the 4 frame minima; ROWS frames clip
    // at doc edges identically in both engines
    "text_winnowing" ->
      s"""WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |g AS (SELECT doc_id, i - 1 AS pos,
         |        md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]) AS h
         |      FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 3)) AS i
         |            FROM d WHERE len(toks) >= 4)),
         |m AS (SELECT doc_id, pos, h,
         |        MIN(h) OVER (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN 0 PRECEDING AND 3 FOLLOWING) AS m0,
         |        MIN(h) OVER (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN 1 PRECEDING AND 2 FOLLOWING) AS m1,
         |        MIN(h) OVER (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING) AS m2,
         |        MIN(h) OVER (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN 3 PRECEDING AND 0 FOLLOWING) AS m3
         |      FROM g)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kgrams,
         |  CAST(SUM(CASE WHEN h = m0 OR h = m1 OR h = m2 OR h = m3 THEN 1 ELSE 0 END) AS BIGINT) AS n_selected,
         |  CAST(SUM(CASE WHEN h = m0 OR h = m1 OR h = m2 OR h = m3 THEN 1 ELSE 0 END) * 10000
         |       // COUNT(*) AS BIGINT) AS density_bp
         |FROM m GROUP BY 1""".stripMargin,
    // Heaps-law curve: a token counts once, at its first (source,
    // doc) occurrence; the running sum over the doc spine rebuilds
    // the distinct-so-far size without any quadratic re-count
    "text_vocab_growth" -> vocabGrowthOracle,
    // the streamed first-occurrence state drains to the identical
    // (source, tok, min doc_id) table (min-merge algebra) and the
    // curve finisher is shared code — shared oracle
    "text_vocab_stream" -> vocabGrowthOracle,
    // smallest top-k vocabulary covering each occurrence-mass
    // threshold; coverage compared cross-multiplied in integers
    // Zipf slope over the top-256 vocabulary in floor-log₂ space: both
    // engines derive msb via length(bin(·)), regression is the exact
    // five-sum formula, milli division truncates toward zero
    "text_zipf_slope" ->
      s"""WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |c AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n
         |      FROM (SELECT unnest(toks) AS tok FROM d) WHERE length(tok) > 0 GROUP BY 1),
         |r AS (SELECT tok, n, CAST(ROW_NUMBER() OVER (ORDER BY n DESC, tok ASC) AS BIGINT) AS rnk
         |      FROM c QUALIFY rnk <= 256),
         |p AS (SELECT rnk, n, CAST(length(bin(rnk)) - 1 AS BIGINT) AS lx,
         |             CAST(length(bin(n)) - 1 AS BIGINT) AS ly FROM r),
         |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
         |        CAST(MAX(CASE WHEN rnk = 1 THEN n END) AS BIGINT) AS top_freq,
         |        CAST(SUM(lx) AS BIGINT) AS sx, CAST(SUM(ly) AS BIGINT) AS sy,
         |        CAST(SUM(lx * ly) AS BIGINT) AS sxy, CAST(SUM(lx * lx) AS BIGINT) AS sxx FROM p)
         |SELECT n_points, top_freq,
         |  n_points * sxy - sx * sy AS slope_num,
         |  n_points * sxx - sx * sx AS slope_den,
         |  CAST(CASE WHEN n_points * sxx - sx * sx = 0 THEN 0
         |       ELSE ((n_points * sxy - sx * sy) * 1000) // (n_points * sxx - sx * sx) END AS BIGINT) AS slope_milli
         |FROM a""".stripMargin,
    "text_coverage_topk" ->
      s"""WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |c AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n
         |      FROM (SELECT unnest(toks) AS tok FROM d) WHERE length(tok) > 0 GROUP BY 1),
         |r AS (SELECT tok, n,
         |        CAST(ROW_NUMBER() OVER (ORDER BY n DESC, tok ASC) AS BIGINT) AS rnk,
         |        CAST(SUM(n) OVER (ORDER BY n DESC, tok ASC
         |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n
         |      FROM c),
         |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total_n FROM c),
         |thr AS (SELECT CAST(unnest([5000, 9000, 9900]) AS BIGINT) AS threshold_bp)
         |SELECT threshold_bp, CAST(MIN(rnk) AS BIGINT) AS k_tokens, CAST(MAX(total_n) AS BIGINT) AS total_n
         |FROM r, tot, thr WHERE cum_n * 10000 >= threshold_bp * total_n
         |GROUP BY 1""".stripMargin,
    // smoothed contrastive lift through HUGEINT (mirrors the Spark
    // DECIMAL(38,0) path), top-3 per source deterministic
    "text_source_terms" ->
      s"""WITH d AS (SELECT source, doc_id, $toksSql AS toks FROM documents),
         |t AS (SELECT source, tok FROM (SELECT source, unnest(toks) AS tok FROM d)
         |      WHERE length(tok) > 0),
         |bs AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS tf_src FROM t GROUP BY 1, 2),
         |bt AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS tf_all FROM t GROUP BY 1),
         |st AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS src_total FROM t GROUP BY 1),
         |g AS (SELECT CAST(COUNT(*) AS BIGINT) AS all_total FROM t),
         |l AS (SELECT bs.source, bs.tok, bs.tf_src,
         |        CAST(CAST(bs.tf_src AS HUGEINT) * (g.all_total - st.src_total) * 1000000
         |             // (CAST(bt.tf_all - bs.tf_src + 1 AS HUGEINT) * st.src_total) AS BIGINT) AS lift_micro
         |      FROM bs JOIN bt ON bt.tok = bs.tok JOIN st ON st.source = bs.source, g)
         |SELECT source,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY lift_micro DESC, tok ASC) AS BIGINT) AS rnk,
         |  tok, tf_src, lift_micro
         |FROM l QUALIFY rnk <= 3""".stripMargin,
    // per-doc OOV vs the corpus top-32 vocabulary; left-join null
    // pattern scores each occurrence, rates in basis points
    "text_oov_rate" ->
      s"""WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |t AS (SELECT doc_id, tok FROM (SELECT doc_id, unnest(toks) AS tok FROM d) WHERE length(tok) > 0),
         |c AS (SELECT tok, COUNT(*) AS n FROM t GROUP BY 1),
         |v AS (SELECT tok FROM (SELECT tok, ROW_NUMBER() OVER (ORDER BY n DESC, tok ASC) AS rnk FROM c)
         |      WHERE rnk <= 32)
         |SELECT t.doc_id, COUNT(*) AS n_tokens,
         |  CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
         |  CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) * 10000 // COUNT(*) AS BIGINT) AS oov_bp
         |FROM t LEFT JOIN v ON v.tok = t.tok GROUP BY 1""".stripMargin,
    "mm_chunk_table" ->
      """WITH d AS (SELECT doc_id, text, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes FROM documents),
        |c AS (SELECT doc_id, text,
        |        unnest(generate_series(0, (n_bytes + 255) // 256 - 1)) AS chunk_idx
        |      FROM d)
        |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
        |  CAST(chunk_idx * 256 AS BIGINT) AS offset,
        |  CAST(octet_length(encode(substr(text, CAST(chunk_idx * 256 + 1 AS INTEGER), 256))) AS BIGINT) AS chunk_len,
        |  sha256(substr(text, CAST(chunk_idx * 256 + 1 AS INTEGER), 256)) AS chunk_sha
        |FROM c""".stripMargin,
    // composition of the quality, keep-first, and stratified-sample
    // oracles — the end-to-end keep set
    "pipeline_keep_set" ->
      s"""WITH t AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
         |qf AS (SELECT doc_id FROM t WHERE length(text) >= 100
         |       AND len(list_filter(toks, x -> list_contains(['the','a','of','to','and','in','is','it'], x))) * 20 >= len(toks)),
         |h AS (SELECT doc_id, md5($normSql) AS th FROM documents),
         |cn AS (SELECT doc_id FROM (SELECT doc_id, MIN(doc_id) OVER (PARTITION BY th) AS c FROM h)
         |       WHERE doc_id = c),
         |s AS (SELECT doc_id,
         |  CAST(len(list_filter(toks, x -> list_contains(['the','a','of','is'], x))) AS BIGINT) AS s_en,
         |  CAST(len(list_filter(toks, x -> list_contains(['el','la','los','es'], x))) AS BIGINT) AS s_es,
         |  CAST(len(list_filter(toks, x -> list_contains(['der','die','das','und'], x))) AS BIGINT) AS s_de,
         |  CAST(len(list_filter(toks, x -> list_contains(['le','les','des','et'], x))) AS BIGINT) AS s_fr
         |  FROM t),
         |l AS (SELECT doc_id,
         |  CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
         |       WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
         |       WHEN s_de >= s_fr THEN 'de' ELSE 'fr' END AS pred_lang
         |  FROM s),
         |sm AS (SELECT doc_id, pred_lang FROM (
         |         SELECT doc_id, pred_lang, substr(md5('sample:' || doc_id), 1, 2) AS h2 FROM l)
         |       WHERE h2 < CASE pred_lang WHEN 'en' THEN '80' WHEN 'es' THEN '4d'
         |                                 WHEN 'de' THEN '33' ELSE '1a' END)
         |SELECT sm.doc_id, sm.pred_lang
         |FROM sm JOIN qf USING (doc_id) JOIN cn USING (doc_id)""".stripMargin,
    // per-source cumulative stage survival of the keep pipeline —
    // same stage predicates as pipeline_keep_set
    "pipeline_funnel" ->
      s"""WITH t AS (SELECT doc_id, source, text, $toksSql AS toks FROM documents),
         |q AS (SELECT doc_id, (length(text) >= 100
         |       AND len(list_filter(toks, x -> list_contains(['the','a','of','to','and','in','is','it'], x))) * 20 >= len(toks)) AS is_q
         |      FROM t),
         |h AS (SELECT doc_id, md5($normSql) AS th FROM documents),
         |cn AS (SELECT doc_id, (doc_id = MIN(doc_id) OVER (PARTITION BY th)) AS is_c FROM h),
         |s AS (SELECT doc_id,
         |  CAST(len(list_filter(toks, x -> list_contains(['the','a','of','is'], x))) AS BIGINT) AS s_en,
         |  CAST(len(list_filter(toks, x -> list_contains(['el','la','los','es'], x))) AS BIGINT) AS s_es,
         |  CAST(len(list_filter(toks, x -> list_contains(['der','die','das','und'], x))) AS BIGINT) AS s_de,
         |  CAST(len(list_filter(toks, x -> list_contains(['le','les','des','et'], x))) AS BIGINT) AS s_fr
         |  FROM t),
         |l AS (SELECT doc_id,
         |  CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
         |       WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
         |       WHEN s_de >= s_fr THEN 'de' ELSE 'fr' END AS pred_lang
         |  FROM s),
         |sm AS (SELECT doc_id,
         |         (substr(md5('sample:' || doc_id), 1, 2) <
         |            CASE pred_lang WHEN 'en' THEN '80' WHEN 'es' THEN '4d'
         |                           WHEN 'de' THEN '33' ELSE '1a' END) AS is_s
         |       FROM l),
         |f AS (SELECT t.source, CAST(COUNT(*) AS BIGINT) AS n_raw,
         |        CAST(SUM(CASE WHEN is_q THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
         |        CAST(SUM(CASE WHEN is_q AND is_c THEN 1 ELSE 0 END) AS BIGINT) AS n_canonical,
         |        CAST(SUM(CASE WHEN is_q AND is_c AND is_s THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
         |      FROM t JOIN q USING (doc_id) JOIN cn USING (doc_id) JOIN sm USING (doc_id)
         |      GROUP BY 1)
         |SELECT source, n_raw, n_quality, n_canonical, n_kept,
         |  CAST(n_quality * 10000 // GREATEST(n_raw, 1) AS BIGINT) AS quality_bp,
         |  CAST(n_canonical * 10000 // GREATEST(n_quality, 1) AS BIGINT) AS dedup_keep_bp,
         |  CAST(n_kept * 10000 // GREATEST(n_canonical, 1) AS BIGINT) AS sample_keep_bp,
         |  CAST(n_kept * 10000 // GREATEST(n_raw, 1) AS BIGINT) AS end_to_end_bp
         |FROM f""".stripMargin,
    "mm_asset_dedup" ->
      """WITH a AS (SELECT doc_id, source, sha256(text) AS sha,
        |             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes FROM documents),
        |c AS (SELECT sha, MIN(doc_id) AS canonical_doc FROM a GROUP BY 1)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_assets,
        |  CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
        |  CAST(COUNT(DISTINCT a.sha) AS BIGINT) AS n_unique,
        |  CAST(SUM(CASE WHEN a.doc_id = c.canonical_doc THEN n_bytes ELSE 0 END) AS BIGINT) AS cas_bytes,
        |  CAST(SUM(CASE WHEN a.doc_id = c.canonical_doc THEN 1 ELSE 0 END) AS BIGINT) AS n_canonical,
        |  CAST((SUM(n_bytes) - SUM(CASE WHEN a.doc_id = c.canonical_doc THEN n_bytes ELSE 0 END)) * 10000
        |       // SUM(n_bytes) AS BIGINT) AS savings_bp
        |FROM a JOIN c ON c.sha = a.sha GROUP BY 1""".stripMargin,
    "mm_chunk_dedup" -> chunkDedupOracle,
    // the streamed CAS ref table drains to the identical (sha, doc)
    // population (counts additive), and the dedup report is finished
    // in batch on it — shared oracle
    "mm_cas_stream" -> chunkDedupOracle,
    // CAS garbage collection: a chunk is reclaimable iff NO live doc
    // references it; per-source accounting by the canonical holder
    "mm_chunk_gc" ->
      """WITH d AS (SELECT doc_id, text, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes FROM documents),
        |c AS (SELECT doc_id, text,
        |        unnest(generate_series(0, (n_bytes + 255) // 256 - 1)) AS chunk_idx
        |      FROM d WHERE n_bytes > 0),
        |h AS (SELECT doc_id,
        |        CAST(octet_length(encode(substr(text, CAST(chunk_idx * 256 + 1 AS INTEGER), 256))) AS BIGINT) AS chunk_len,
        |        sha256(substr(text, CAST(chunk_idx * 256 + 1 AS INTEGER), 256)) AS chunk_sha,
        |        CASE WHEN doc_id % 17 = 0 THEN 1 ELSE 0 END AS deleted
        |      FROM c),
        |g AS (SELECT chunk_sha, MIN(chunk_len) AS chunk_len, MIN(doc_id) AS canonical_doc,
        |        CAST(SUM(1 - deleted) AS BIGINT) AS live_refs
        |      FROM h GROUP BY 1)
        |SELECT s.source, CAST(COUNT(*) AS BIGINT) AS n_chunks,
        |  CAST(SUM(CASE WHEN g.live_refs = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_gc_chunks,
        |  CAST(SUM(CASE WHEN g.live_refs = 0 THEN g.chunk_len ELSE 0 END) AS BIGINT) AS gc_bytes,
        |  CAST(SUM(CASE WHEN g.live_refs > 0 AND g.canonical_doc % 17 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_pinned_by_live_refs
        |FROM g JOIN documents s ON s.doc_id = g.canonical_doc
        |GROUP BY 1""".stripMargin,
    "mm_binary_stats" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  sha256(text) AS sha256_hex, md5(text) AS md5_hex,
        |  (CAST(octet_length(encode(text)) AS BIGINT) + 255) // 256 AS n_chunks,
        |  sha256(substr(text, 1, 256)) AS first_chunk_sha
        |FROM documents""".stripMargin,
    // upload batching: bin = exclusive running byte total DIV capacity
    "mm_upload_plan" ->
      """SELECT doc_id, source, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(SUM(octet_length(encode(text))) OVER w AS BIGINT) AS cum_bytes,
        |  CAST((SUM(octet_length(encode(text))) OVER w - octet_length(encode(text))) // 4096 AS BIGINT) AS bin_id
        |FROM documents
        |WINDOW w AS (PARTITION BY source ORDER BY doc_id ROWS UNBOUNDED PRECEDING)""".stripMargin,
    // reassemble-and-hash integrity proof; empty payloads restore to ''
    // byte-accurate chunking in hex space (2 hex chars = 1 byte): chunk
    // boundaries are byte offsets even for multibyte text; sha-256 over
    // the (injective) hex string is the engine-portable integrity hash
    "mm_chunk_restore" ->
      """WITH b AS (SELECT doc_id, lower(hex(encode(text))) AS body_hex,
        |             octet_length(encode(text)) AS n_bytes
        |           FROM documents WHERE octet_length(encode(text)) > 0),
        |c AS (SELECT doc_id, i AS chunk_idx, substr(body_hex, i*512 + 1, 512) AS chunk_hex
        |      FROM (SELECT doc_id, body_hex,
        |              unnest(generate_series(0, CAST((n_bytes + 255) // 256 AS INTEGER) - 1)) AS i
        |            FROM b)),
        |r AS (SELECT doc_id, COUNT(*) AS n_chunks,
        |        string_agg(chunk_hex, '' ORDER BY chunk_idx) AS reassembled_hex
        |      FROM c GROUP BY 1)
        |SELECT d.doc_id, CAST(COALESCE(r.n_chunks, 0) AS BIGINT) AS n_chunks,
        |  sha256(lower(hex(encode(d.text)))) AS orig_sha,
        |  sha256(COALESCE(r.reassembled_hex, '')) AS restored_sha,
        |  CAST(CASE WHEN sha256(COALESCE(r.reassembled_hex, '')) = sha256(lower(hex(encode(d.text))))
        |       THEN 1 ELSE 0 END AS BIGINT) AS intact
        |FROM documents d LEFT JOIN r USING (doc_id)""".stripMargin,
    // magic-byte sniff in hex-string space; the stub header (one of four
    // real container signatures, or none) is chosen by md5 first nibble
    // mod 5 — the router CASE reads only the synthesized bytes
    "mm_modality_route" -> modalityRouteOracleSql,
    // the mix plan aggregates the same classification onto the <=5
    // modality enum; keep = min_n/n rebalances to a uniform mix
    "mm_modal_mix_plan" ->
      s"""WITH r AS ($modalityRouteOracleSql),
         |a AS (SELECT modality, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |        CAST(SUM(n_bytes) AS BIGINT) AS n_bytes FROM r GROUP BY 1),
         |t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total, CAST(MIN(n_docs) AS BIGINT) AS min_n FROM a)
         |SELECT a.modality, a.n_docs, a.n_bytes,
         |  CAST(a.n_docs * 10000 // t.total AS BIGINT) AS share_bp,
         |  CAST(t.min_n * 10000 // a.n_docs AS BIGINT) AS keep_bp
         |FROM a, t""".stripMargin,
    // reproduces Multimodal.stubDecode byte-for-byte: the checksum is a
    // left fold (a*31+b)&0x7fffffff over the utf-8 payload bytes
    // (hex-decoded two chars at a time), then the quantized 4-float
    // feature [n, width, height, checksum%1000] is hyperplane-LSH
    // bucketed with the same md5-derived planes as dedup_embedding.
    // resize plan: aspect-preserving fit inside a 48-box, integer math
    // (cross-multiplied limiting side, floor-div dims, micro ratio)
    "mm_resize_plan" ->
      """WITH p AS (SELECT doc_id, lower(hex(encode(text))) AS h,
        |                  CAST(octet_length(encode(text)) AS BIGINT) AS n FROM documents),
        |cs AS (SELECT doc_id, n,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      [CAST((strpos('0123456789abcdef', h[2*i-1:2*i-1]) - 1) * 16
        |           + (strpos('0123456789abcdef', h[2*i:2*i]) - 1) AS BIGINT)
        |       FOR i IN generate_series(1, CAST(n AS INTEGER))]),
        |    (a, b) -> (a * 31 + b) & 2147483647) AS checksum
        |  FROM p),
        |f AS (SELECT doc_id, 16 + checksum % 64 AS width,
        |             16 + (checksum // 64) % 64 AS height FROM cs)
        |SELECT doc_id, CAST(width AS BIGINT) AS width, CAST(height AS BIGINT) AS height,
        |  CAST(CASE WHEN width <= 48 AND height <= 48 THEN width
        |            WHEN width >= height THEN 48
        |            ELSE (width * 48) // height END AS BIGINT) AS out_w,
        |  CAST(CASE WHEN width <= 48 AND height <= 48 THEN height
        |            WHEN height > width THEN 48
        |            ELSE (height * 48) // width END AS BIGINT) AS out_h,
        |  CAST(CASE WHEN width <= 48 AND height <= 48 THEN 1000000
        |            WHEN width >= height THEN (48 * 1000000) // width
        |            ELSE (48 * 1000000) // height END AS BIGINT) AS scale_micro
        |FROM f""".stripMargin,
    // ntile is rank-based (equal buckets, larger first) in both engines
    "rel_ntile_quartiles" ->
      """WITH c AS (SELECT c_custkey, c_mktsegment,
        |                  CAST(round(c_acctbal*100) AS BIGINT) AS bal_c FROM customer),
        |q AS (SELECT c_mktsegment, bal_c,
        |        CAST(NTILE(4) OVER (PARTITION BY c_mktsegment
        |                            ORDER BY bal_c ASC, c_custkey ASC) AS BIGINT) AS quartile
        |      FROM c)
        |SELECT c_mktsegment, quartile, COUNT(*) AS n_cust,
        |  MIN(bal_c) AS min_bal_c, MAX(bal_c) AS max_bal_c,
        |  CAST(SUM(bal_c) AS BIGINT) AS sum_bal_c
        |FROM q GROUP BY 1, 2""".stripMargin,
    // pivot = declared-values conditional aggregation; empty cells 0
    // the melt's oracle is the DIRECT long-form aggregate — the
    // strongest statement of the unpivot(pivot(x)) round-trip law
    "rel_unpivot" ->
      """SELECT CAST(year(l_shipdate)*100 + month(l_shipdate) AS BIGINT) AS ship_month,
        |  l_returnflag,
        |  CAST(SUM(CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT) AS rev_c
        |FROM lineitem GROUP BY 1, 2
        |HAVING SUM(CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) != 0""".stripMargin,
    "rel_pivot" ->
      """SELECT CAST(year(l_shipdate)*100 + month(l_shipdate) AS BIGINT) AS ship_month,
        |  CAST(COALESCE(SUM(CASE WHEN l_returnflag = 'A'
        |    THEN CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT) END), 0) AS BIGINT) AS rev_a_c,
        |  CAST(COALESCE(SUM(CASE WHEN l_returnflag = 'N'
        |    THEN CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT) END), 0) AS BIGINT) AS rev_n_c,
        |  CAST(COALESCE(SUM(CASE WHEN l_returnflag = 'R'
        |    THEN CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT) END), 0) AS BIGINT) AS rev_r_c
        |FROM lineitem GROUP BY 1""".stripMargin,
    // the two one-dim marginals + grand total, set id from the NULL
    // pattern (engine-neutral, unlike grouping_id bit order)
    "rel_grouping_sets" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        |  COALESCE(l_linestatus, 'ALL') AS linestatus,
        |  CAST((CASE WHEN l_returnflag IS NULL THEN 2 ELSE 0 END)
        |     + (CASE WHEN l_linestatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS set_id,
        |  CAST(SUM(CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_c,
        |  COUNT(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin,
    "graph_part_rank" -> pagerankOracle(3),
    // BFS unrolled level-by-level (node-grain, never path-grain — a
    // recursive UNION ALL would enumerate combinatorially many walks
    // on this dense co-purchase graph); root = max-degree part
    "graph_khop" ->
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        |      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
        |deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY 1),
        |d0 AS (SELECT src AS node FROM deg ORDER BY deg DESC, src ASC LIMIT 1),
        |d1 AS (SELECT DISTINCT e.dst AS node FROM e JOIN d0 ON e.src = d0.node
        |       WHERE e.dst NOT IN (SELECT node FROM d0)),
        |d2 AS (SELECT DISTINCT e.dst AS node FROM e JOIN d1 ON e.src = d1.node
        |       WHERE e.dst NOT IN (SELECT node FROM d0 UNION ALL SELECT node FROM d1)),
        |d3 AS (SELECT DISTINCT e.dst AS node FROM e JOIN d2 ON e.src = d2.node
        |       WHERE e.dst NOT IN (SELECT node FROM d0 UNION ALL SELECT node FROM d1
        |                           UNION ALL SELECT node FROM d2)),
        |a AS (SELECT 0 AS depth, node FROM d0 UNION ALL SELECT 1, node FROM d1
        |      UNION ALL SELECT 2, node FROM d2 UNION ALL SELECT 3, node FROM d3)
        |SELECT CAST(depth AS BIGINT) AS depth, CAST(COUNT(*) AS BIGINT) AS n_nodes,
        |  CAST(MIN(node) AS BIGINT) AS min_node, CAST(MAX(node) AS BIGINT) AS max_node
        |FROM a GROUP BY 1""".stripMargin,
    // join-key skew report: power-of-2 frequency bands of the fact
    // join key + the hottest key's share (max-struct tiebreak: larger
    // key wins on equal frequency)
    // the actionable salting plan: hot keys (> 20% of all rows,
    // cross-multiplied share rule) with ceil-div salt factors back to
    // mean-sized slices
    "rel_salt_plan" ->
      """WITH fct AS (SELECT CASE WHEN user_id % 10 <> 0 THEN 0 ELSE user_id END AS k FROM events),
        |f AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS f FROM fct GROUP BY 1),
        |t AS (SELECT CAST(SUM(f) AS BIGINT) AS total, CAST(COUNT(*) AS BIGINT) AS n_keys FROM f),
        |j AS (SELECT f.k, f.f, t.total, GREATEST(t.total // t.n_keys, 1) AS target FROM f, t)
        |SELECT k, f, CAST(f * 10000 // total AS BIGINT) AS share_bp,
        |  CAST((f + target - 1) // target AS BIGINT) AS salt_factor
        |FROM j WHERE f * 5 > total""".stripMargin,
    "rel_key_skew_profile" ->
      """WITH f AS (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS f FROM lineitem GROUP BY 1),
        |t AS (SELECT CAST(SUM(f) AS BIGINT) AS total_rows FROM f),
        |h AS (SELECT l_orderkey AS hottest_key, f AS hottest_rows FROM f
        |      ORDER BY f DESC, l_orderkey DESC LIMIT 1),
        |b AS (SELECT CAST(length(bin(f)) - 1 AS BIGINT) AS freq_band,
        |        CAST(COUNT(*) AS BIGINT) AS n_keys, CAST(SUM(f) AS BIGINT) AS n_rows
        |      FROM f GROUP BY 1)
        |SELECT freq_band, CAST(pow(2, freq_band) AS BIGINT) AS freq_lo, n_keys, n_rows,
        |  CAST(n_rows * 10000 // total_rows AS BIGINT) AS row_share_bp,
        |  hottest_key, hottest_rows,
        |  CAST(hottest_rows * 10000 // total_rows AS BIGINT) AS hottest_share_bp
        |FROM b, t, h""".stripMargin,
    // link prediction: common neighbors through degree-capped middles
    // (deg <= 128 — the df-cap drop is part of the contract), Jaccard
    // from the full degree table, existing edges excluded, top-20
    // incremental co-purchase tier == the from-scratch self-join over
    // the full order history (split-independent by construction)
    "graph_copurchase_tier" ->
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        |SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        |FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey""".stripMargin,
    // the streaming maintenance must converge to the same tier
    "graph_copurchase_stream" ->
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        |SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        |FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey""".stripMargin,
    "graph_common_neighbors" ->
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        |      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
        |deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY 1),
        |h AS (SELECT e.dst AS mid, e.src AS node FROM e
        |      JOIN deg ON deg.src = e.dst AND deg.deg <= 128),
        |wd AS (SELECT x.node AS node_a, y.node AS node_b
        |       FROM h x JOIN h y ON x.mid = y.mid AND x.node < y.node),
        |cn AS (SELECT node_a, node_b, CAST(COUNT(*) AS BIGINT) AS cn FROM wd GROUP BY 1, 2),
        |ne AS (SELECT cn.* FROM cn
        |       WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.src = cn.node_a AND e.dst = cn.node_b)),
        |sc AS (SELECT ne.node_a, ne.node_b, ne.cn, da.deg AS deg_a, db.deg AS deg_b,
        |         CAST(ne.cn * 10000 // GREATEST(da.deg + db.deg - ne.cn, 1) AS BIGINT) AS jaccard_bp
        |       FROM ne JOIN deg da ON da.src = ne.node_a
        |       JOIN deg db ON db.src = ne.node_b),
        |r AS (SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY cn DESC, node_a ASC, node_b ASC) AS BIGINT) AS rnk
        |      FROM sc)
        |SELECT rnk, node_a, node_b, cn, deg_a, deg_b, jaccard_bp
        |FROM r WHERE rnk <= 20""".stripMargin,
    // incremental view maintenance self-proof: mv (without the late
    // partition) + delta (only the late partition) vs full recompute
    "rel_mv_delta" ->
      """WITH rev AS (SELECT o.o_orderkey, n.n_name,
        |        CAST(round(l.l_extendedprice*(1.0-l.l_discount)*100) AS BIGINT) AS r_c
        |      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |      JOIN customer c ON o.o_custkey = c.c_custkey
        |      JOIN nation n ON c.c_nationkey = n.n_nationkey),
        |mv AS (SELECT n_name, CAST(SUM(r_c) AS BIGINT) AS mv_c FROM rev
        |       WHERE o_orderkey % 10 <> 0 GROUP BY 1),
        |dl AS (SELECT n_name, CAST(SUM(r_c) AS BIGINT) AS delta_c FROM rev
        |       WHERE o_orderkey % 10 = 0 GROUP BY 1),
        |fl AS (SELECT n_name, CAST(SUM(r_c) AS BIGINT) AS full_c FROM rev GROUP BY 1)
        |SELECT fl.n_name, COALESCE(mv.mv_c, 0) AS mv_c, COALESCE(dl.delta_c, 0) AS delta_c,
        |  COALESCE(mv.mv_c, 0) + COALESCE(dl.delta_c, 0) AS maintained_c, fl.full_c,
        |  COALESCE(mv.mv_c, 0) + COALESCE(dl.delta_c, 0) = fl.full_c AS matches
        |FROM fl LEFT JOIN mv USING (n_name) LEFT JOIN dl USING (n_name)""".stripMargin,
    // join cardinality by CMS inner product: D=4 x W=65536 cells from
    // the key-frequency tables, per-row ip = sum(c^2), est = min over
    // rows, published next to exact sum(f^2); est >= exact one-sided
    "rel_join_size_estimate" ->
      """WITH keys AS (SELECT 'li_partkey_self' AS join_name, CAST(l_partkey AS BIGINT) AS k FROM lineitem
        |              UNION ALL
        |              SELECT 'ord_custkey_self', CAST(o_custkey AS BIGINT) FROM orders),
        |f AS (SELECT join_name, k, CAST(COUNT(*) AS BIGINT) AS f FROM keys GROUP BY 1, 2),
        |ex AS (SELECT join_name, CAST(SUM(f * f) AS BIGINT) AS exact_rows FROM f GROUP BY 1),
        |e AS (SELECT join_name, k, f, r FROM f, (SELECT unnest(generate_series(0, 3)) AS r)),
        |cells AS (SELECT join_name, r,
        |    CAST('0x' || substr(md5('jse:' || join_name || ':' || CAST(r AS VARCHAR) || ':' || CAST(k AS VARCHAR)), 1, 12) AS BIGINT) % 65536 AS bucket,
        |    CAST(SUM(f) AS BIGINT) AS c
        |  FROM e GROUP BY 1, 2, 3),
        |ip AS (SELECT join_name, CAST(r AS BIGINT) AS r, CAST(SUM(c * c) AS BIGINT) AS ip
        |       FROM cells GROUP BY 1, 2),
        |est AS (SELECT join_name, CAST(MIN(ip) AS BIGINT) AS est_rows FROM ip GROUP BY 1)
        |SELECT ip.join_name, ip.r, ip.ip, est.est_rows, ex.exact_rows,
        |  CAST((est.est_rows - ex.exact_rows) * 10000 // ex.exact_rows AS BIGINT) AS over_bp
        |FROM ip JOIN est USING (join_name) JOIN ex USING (join_name)""".stripMargin,
    // compaction bin-packing: a file joins the group where its
    // cumulative START byte falls; the oracle's flat window is the
    // same prefix sum the Spark side computes banded
    "rel_compaction_plan" ->
      """WITH r AS (SELECT l_orderkey // 64 AS file_id,
        |             64 + CAST(round(l_extendedprice * 100) AS BIGINT) % 191 AS b FROM lineitem),
        |f AS (SELECT file_id, CAST(COUNT(*) AS BIGINT) AS n_rows, CAST(SUM(b) AS BIGINT) AS bytes
        |      FROM r GROUP BY 1),
        |c AS (SELECT *, CAST(COALESCE(SUM(bytes) OVER (ORDER BY file_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS g_start FROM f)
        |SELECT CAST(g_start // 262144 AS BIGINT) AS group_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_files, CAST(SUM(n_rows) AS BIGINT) AS n_rows,
        |  CAST(SUM(bytes) AS BIGINT) AS bytes,
        |  CAST(MIN(file_id) AS BIGINT) AS file_lo, CAST(MAX(file_id) AS BIGINT) AS file_hi,
        |  CAST(SUM(bytes) * 10000 // 262144 AS BIGINT) AS fill_bp
        |FROM c GROUP BY 1""".stripMargin,
    // interval concurrency sweep: deltas aggregated per (supplier, day)
    // BEFORE the running sum, so prefix values need no intra-day order;
    // ends exclusive at day + 1
    "rel_max_concurrency" ->
      """WITH iv AS (SELECT l_suppkey,
        |        CAST(CAST(o_orderdate AS DATE) - DATE '1992-01-01' AS BIGINT) AS s,
        |        CAST(CAST(l_shipdate AS DATE) - DATE '1992-01-01' AS BIGINT) + 1 AS e
        |      FROM lineitem JOIN orders ON o_orderkey = l_orderkey),
        |ev AS (SELECT l_suppkey, t, CAST(SUM(delta) AS BIGINT) AS d,
        |         CAST(SUM(CASE WHEN delta > 0 THEN 1 ELSE 0 END) AS BIGINT) AS starts
        |       FROM (SELECT l_suppkey, s AS t, 1 AS delta FROM iv
        |             UNION ALL SELECT l_suppkey, e, -1 FROM iv)
        |       GROUP BY 1, 2),
        |r AS (SELECT l_suppkey, t,
        |        CAST(SUM(d) OVER (PARTITION BY l_suppkey ORDER BY t
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS open,
        |        CAST(SUM(starts) OVER (PARTITION BY l_suppkey) AS BIGINT) AS n_intervals
        |      FROM ev),
        |m AS (SELECT *, MAX(open) OVER (PARTITION BY l_suppkey) AS max_open FROM r)
        |SELECT l_suppkey, n_intervals, CAST(MAX(max_open) AS BIGINT) AS max_open,
        |  CAST(MIN(t) AS BIGINT) AS peak_day
        |FROM m WHERE open = max_open GROUP BY 1, 2""".stripMargin,
    // z-order layout audit: 64 files under natural/sorted/zorder
    // layouts, zone-map skipping replayed against 3 query boxes; the
    // Morton interleave is the same generated integer arithmetic on
    // both engines (Relational.zInterleaveSql)
    "rel_zorder_layout" ->
      s"""WITH li AS (SELECT CAST(l_orderkey AS BIGINT) AS ok, CAST(l_partkey AS BIGINT) AS pk,
        |        CAST(CAST(l_shipdate AS DATE) - DATE '1992-01-01' AS BIGINT) AS d FROM lineitem),
        |b AS (SELECT MIN(d) AS dmin, MAX(d) AS dmax, MIN(pk) AS pmin, MAX(pk) AS pmax,
        |        MIN(ok) AS omin, MAX(ok) AS omax FROM li),
        |r AS (SELECT ok, pk, d,
        |        (d - dmin) * 256 // (dmax - dmin + 1) AS ab,
        |        (pk - pmin) * 256 // (pmax - pmin + 1) AS bb,
        |        pmin + (pmax - pmin) // 8 AS pk_hi,
        |        (d >= 2200 AND d <= 2229) AS hit_d,
        |        (ok - omin) * 64 // (omax - omin + 1) AS file_natural,
        |        (d - dmin) * 64 // (dmax - dmin + 1) AS file_sorted
        |      FROM li, b),
        |r2 AS (SELECT *, (pk <= pk_hi) AS hit_pk,
        |         (${graft.operators.Relational.zInterleaveSql("ab", "bb", 8, "//")}) * 64 // 65536 AS file_zorder
        |       FROM r),
        |lay AS (SELECT 'natural' AS layout, file_natural AS file, d, pk, pk_hi, hit_d, hit_pk FROM r2
        |        UNION ALL SELECT 'sorted', file_sorted, d, pk, pk_hi, hit_d, hit_pk FROM r2
        |        UNION ALL SELECT 'zorder', file_zorder, d, pk, pk_hi, hit_d, hit_pk FROM r2),
        |pf AS (SELECT layout, file, MIN(d) AS f_dmin, MAX(d) AS f_dmax, MIN(pk) AS f_pmin,
        |         MAX(pk) AS f_pmax, MIN(pk_hi) AS pk_hi, CAST(COUNT(*) AS BIGINT) AS f_rows,
        |         CAST(SUM(CASE WHEN hit_d AND hit_pk THEN 1 ELSE 0 END) AS BIGINT) AS f_match_both,
        |         CAST(SUM(CASE WHEN hit_d THEN 1 ELSE 0 END) AS BIGINT) AS f_match_d,
        |         CAST(SUM(CASE WHEN hit_pk THEN 1 ELSE 0 END) AS BIGINT) AS f_match_pk
        |       FROM lay GROUP BY 1, 2),
        |bx AS (SELECT * FROM (VALUES ('d_range', true, false), ('pk_range', false, true),
        |                             ('both', true, true)) t(box, use_d, use_pk)),
        |au AS (SELECT *,
        |         ((NOT use_d) OR (f_dmax >= 2200 AND f_dmin <= 2229))
        |           AND ((NOT use_pk) OR (f_pmin <= pk_hi)) AS scanned,
        |         CASE WHEN use_d AND use_pk THEN f_match_both
        |              WHEN use_d THEN f_match_d ELSE f_match_pk END AS f_matched
        |       FROM pf, bx)
        |SELECT layout, box, CAST(COUNT(*) AS BIGINT) AS n_files,
        |  CAST(SUM(CASE WHEN scanned THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned,
        |  CAST(SUM(f_rows) AS BIGINT) AS rows_total,
        |  CAST(SUM(CASE WHEN scanned THEN f_rows ELSE 0 END) AS BIGINT) AS rows_scanned,
        |  CAST(SUM(f_matched) AS BIGINT) AS rows_matched,
        |  CAST(SUM(CASE WHEN scanned THEN f_rows ELSE 0 END) * 10000 // SUM(f_rows) AS BIGINT) AS scan_share_bp,
        |  CAST((SUM(CASE WHEN scanned THEN f_rows ELSE 0 END) - SUM(f_matched)) * 10000
        |       // GREATEST(SUM(CASE WHEN scanned THEN f_rows ELSE 0 END), 1) AS BIGINT) AS waste_bp
        |FROM au GROUP BY 1, 2""".stripMargin,
    "dedup_label_prop" -> labelPropOracle(3),
    "graph_modularity" -> modularityOracle(3),
    "contamination_ngram_curve" -> contaminationCurveOracle(Seq(3, 5, 8)),
    // per-segment RFM quartiles with full NTILE tiebreaks; recency vs
    // SCD2: consecutive duplicate states collapse; valid_to = next
    // version's valid_from, -1 + is_current on the head version
    "rel_scd2" -> scd2OracleSql,
    "rel_scd2_stream" -> scd2OracleSql,
    // the drained MV state equals the batch recompute (count/sum
    // additive over micro-batches) — the batch SQL is the oracle
    "rel_mv_stream" ->
      """SELECT n.n_name, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_c
        |FROM orders o
        |JOIN customer c ON c.c_custkey = o.o_custkey
        |JOIN nation n ON n.n_nationkey = c.c_nationkey
        |GROUP BY 1""".stripMargin,

    // point-in-time join: the oracle resolves each purchase's state
    // with the same union + running last-non-null carry (IGNORE NULLS),
    // including the (ts, kind, event_id) tie order
    "rel_pit_join" ->
      """WITH u AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id, 0 AS kind,
        |         event_type AS state, CAST(NULL AS BIGINT) AS value_c
        |  FROM events WHERE event_type IN ('signup', 'error')
        |  UNION ALL
        |  SELECT user_id, epoch_us(ts), event_id, 1, NULL,
        |         CAST(round(value * 100) AS BIGINT)
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT *, last_value(state IGNORE NULLS) OVER (
        |        PARTITION BY user_id ORDER BY ts_us, kind, event_id
        |        ROWS UNBOUNDED PRECEDING) AS cur FROM u)
        |SELECT COALESCE(cur, 'unknown') AS state,
        |  CAST(COUNT(*) AS BIGINT) AS n_purchases,
        |  CAST(SUM(value_c) AS BIGINT) AS revenue_c
        |FROM c WHERE kind = 1 GROUP BY 1""".stripMargin,
    // the corpus max order date
    "rel_rfm_segments" ->
      """WITH mx AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS max_date FROM orders),
        |per AS (SELECT o_custkey, MAX(CAST(o_orderdate AS DATE)) AS last_date,
        |          CAST(COUNT(*) AS BIGINT) AS f,
        |          CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS m_c
        |        FROM orders GROUP BY 1),
        |j AS (SELECT c.c_mktsegment, c.c_custkey, per.f, per.m_c,
        |        CAST(date_diff('day', per.last_date, mx.max_date) AS BIGINT) AS r_days
        |      FROM per JOIN customer c ON c.c_custkey = per.o_custkey, mx),
        |q AS (SELECT c_mktsegment,
        |        CAST(NTILE(4) OVER (PARTITION BY c_mktsegment ORDER BY r_days ASC, c_custkey ASC) AS BIGINT) AS r_q,
        |        CAST(NTILE(4) OVER (PARTITION BY c_mktsegment ORDER BY f DESC, c_custkey ASC) AS BIGINT) AS f_q,
        |        CAST(NTILE(4) OVER (PARTITION BY c_mktsegment ORDER BY m_c DESC, c_custkey ASC) AS BIGINT) AS m_q,
        |        m_c
        |      FROM j)
        |SELECT c_mktsegment, r_q, f_q, m_q, COUNT(*) AS n_customers,
        |  CAST(SUM(m_c) AS BIGINT) AS sum_m_c
        |FROM q GROUP BY 1, 2, 3, 4""".stripMargin,
    // header-vs-detail reconciliation: full outer join, four-way class
    "rel_order_recon" ->
      """WITH l AS (SELECT l_orderkey,
        |    CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS detail_c
        |  FROM lineitem GROUP BY 1),
        |j AS (SELECT COALESCE(o.o_orderstatus, 'NONE') AS status,
        |    CASE WHEN o.o_orderkey IS NULL THEN 'missing_header'
        |         WHEN l.l_orderkey IS NULL THEN 'missing_detail'
        |         WHEN CAST(round(o.o_totalprice*100) AS BIGINT) = l.detail_c THEN 'match'
        |         ELSE 'mismatch' END AS recon_class,
        |    COALESCE(abs(CAST(round(o.o_totalprice*100) AS BIGINT) - l.detail_c), 0) AS drift_c
        |  FROM orders o FULL OUTER JOIN l ON l.l_orderkey = o.o_orderkey)
        |SELECT status, recon_class, COUNT(*) AS n,
        |  CAST(SUM(drift_c) AS BIGINT) AS sum_drift_c,
        |  CAST(MAX(drift_c) AS BIGINT) AS max_drift_c
        |FROM j GROUP BY 1, 2""".stripMargin,
    // basket co-occurrence: distinct (order, part), oriented pairs,
    // HUGEINT lift mirrors the DECIMAL path
    "rel_basket_pairs" ->
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |tot AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM li),
        |pa AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_p FROM li GROUP BY 1),
        |pr AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, CAST(COUNT(*) AS BIGINT) AS n_ab
        |       FROM li a JOIN li b ON b.l_orderkey = a.l_orderkey AND a.l_partkey < b.l_partkey
        |       GROUP BY 1, 2),
        |e AS (SELECT part_a, part_b, n_ab, x.n_p AS n_a, y.n_p AS n_b,
        |        CAST(n_ab * n_orders * 1000000 // (x.n_p * y.n_p) AS BIGINT) AS lift_micro
        |      FROM pr JOIN pa x ON x.l_partkey = pr.part_a
        |              JOIN pa y ON y.l_partkey = pr.part_b, tot),
        |r AS (SELECT e.*, CAST(ROW_NUMBER() OVER (ORDER BY n_ab DESC, part_a ASC, part_b ASC) AS BIGINT) AS rnk FROM e)
        |SELECT rnk, part_a, part_b, n_ab, n_a, n_b, lift_micro FROM r WHERE rnk <= 20""".stripMargin,
    // weekly rollup first, lag over observed weeks, top-10 by |swing|
    // with full tie-break; epoch-week floor-division matches Spark's
    // truncating cast on positive epoch seconds
    "rel_top_movers" ->
      """WITH w AS (
        |  SELECT l_suppkey, epoch_us(l_shipdate) // 604800000000 AS week_id,
        |    CAST(SUM(CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT) AS rev_c
        |  FROM lineitem GROUP BY 1, 2),
        |l AS (
        |  SELECT l_suppkey, week_id, rev_c,
        |    lag(rev_c) OVER (PARTITION BY l_suppkey ORDER BY week_id) AS prev_rev_c
        |  FROM w)
        |SELECT l_suppkey, week_id, rev_c, prev_rev_c,
        |  rev_c - prev_rev_c AS delta_c
        |FROM l WHERE prev_rev_c IS NOT NULL
        |ORDER BY abs(rev_c - prev_rev_c) DESC, l_suppkey ASC, week_id ASC
        |LIMIT 10""".stripMargin,
    // frame-sample plan: clip length from the same deterministic byte
    // fold ((checksum mod 4096) mod 120), uniform indices and byte seek
    // ranges in exact integers
    // cross-asset shared frames: content-hash the deterministic frame
    // grid, df ≥ 2 means chrome; trailing remainder bytes dropped
    // identically on both engines
    // deterministic proportional interleave: w = floor(1000*sqrt(n)),
    // vt = rn*10^6 // w, first-500 window by (vt, source, rn)
    "sample_interleave" ->
      """WITH c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY 1),
        |w AS (SELECT source, n_docs,
        |        CAST(floor(1000.0 * sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT) AS w FROM c),
        |r AS (SELECT d.source, d.doc_id,
        |        CAST(ROW_NUMBER() OVER (PARTITION BY d.source ORDER BY d.doc_id) AS BIGINT) AS rn
        |      FROM documents d),
        |v AS (SELECT r.source, r.rn, (r.rn * 1000000) // w.w AS vt
        |      FROM r JOIN w ON w.source = r.source),
        |sel AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sel FROM (
        |          SELECT * FROM v ORDER BY vt ASC, source ASC, rn ASC LIMIT 500)
        |        GROUP BY 1),
        |tw AS (SELECT CAST(SUM(w) AS BIGINT) AS tw FROM w)
        |SELECT w.source, w.n_docs, w.w,
        |  COALESCE(sel.n_sel, 0) AS n_sel,
        |  CAST(COALESCE(sel.n_sel, 0) * 10000 // 500 AS BIGINT) AS sel_share_bp,
        |  CAST(w.w * 10000 // tw.tw AS BIGINT) AS weight_share_bp
        |FROM w CROSS JOIN tw LEFT JOIN sel ON sel.source = w.source""".stripMargin,
    // BM25 with cleared denominators: k1=6/5, b=3/4 multiplied
    // through by 20*avgdl, per-term floor division THEN sum
    "text_bm25_topk" ->
      s"""WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM d),
         |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd,
         |         GREATEST(CAST(SUM(dl) AS BIGINT) // COUNT(*), 1) AS a FROM dl),
         |t AS (SELECT doc_id, unnest(toks) AS tok FROM d),
         |qq AS (SELECT * FROM t WHERE tok IN ('fast', 'key', 'sort')),
         |tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf FROM qq GROUP BY 1, 2),
         |dfq AS (SELECT tok, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM qq GROUP BY 1),
         |sc AS (SELECT tf.doc_id,
         |         CAST(SUM(CAST(st.nd * 1000000 // dfq.df AS HUGEINT) * (44 * st.a * tf.tf)
         |           // (20 * st.a * tf.tf + 6 * st.a + 18 * dl.dl)) AS BIGINT) AS score_micro
         |       FROM tf JOIN dfq ON dfq.tok = tf.tok JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN st
         |       GROUP BY 1)
         |SELECT CAST(ROW_NUMBER() OVER (ORDER BY score_micro DESC, doc_id ASC) AS BIGINT) AS rnk,
         |       doc_id, score_micro
         |FROM sc ORDER BY score_micro DESC, doc_id ASC LIMIT 10""".stripMargin,
    // histogram-difference scene detection in 1-D: 32-byte frames,
    // 8-sample stride-4 byte means, boundary when the mean jumps > 2
    "mm_scene_split" ->
      """WITH f AS (SELECT doc_id, length(text) // 32 AS nf, text FROM documents
        |           WHERE length(text) // 32 >= 1),
        |fr AS (SELECT doc_id, i,
        |         (ascii(substring(text, i * 32 + 1, 1)) + ascii(substring(text, i * 32 + 5, 1))
        |          + ascii(substring(text, i * 32 + 9, 1)) + ascii(substring(text, i * 32 + 13, 1))
        |          + ascii(substring(text, i * 32 + 17, 1)) + ascii(substring(text, i * 32 + 21, 1))
        |          + ascii(substring(text, i * 32 + 25, 1)) + ascii(substring(text, i * 32 + 29, 1))) // 8 AS mean_b
        |       FROM (SELECT doc_id, text, unnest(generate_series(0, nf - 1)) AS i FROM f)),
        |b AS (SELECT doc_id, i,
        |        CASE WHEN lag(mean_b) OVER w IS NULL
        |             OR abs(mean_b - lag(mean_b) OVER w) > 2 THEN 1 ELSE 0 END AS brk
        |      FROM fr WINDOW w AS (PARTITION BY doc_id ORDER BY i)),
        |g AS (SELECT doc_id, i, SUM(brk) OVER (PARTITION BY doc_id ORDER BY i
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seg FROM b),
        |ep AS (SELECT doc_id, seg, CAST(COUNT(*) AS BIGINT) AS sc_n FROM g GROUP BY 1, 2)
        |SELECT doc_id, CAST(SUM(sc_n) AS BIGINT) AS n_frames, CAST(COUNT(*) AS BIGINT) AS n_scenes,
        |  CAST(MAX(sc_n) AS BIGINT) AS longest_scene,
        |  CAST(SUM(sc_n) * 100 // COUNT(*) AS BIGINT) AS scene_len_centi
        |FROM ep GROUP BY 1""".stripMargin,
    // aHash ledger: 64 byte-sample "pixels", mean-threshold bits into
    // two 32-bit words, 4x16-bit banded candidates, Hamming radius 6
    "mm_ahash_neardup" ->
      """WITH px AS (SELECT doc_id, i, ascii(substring(text, CAST(1 + (i * length(text)) // 64 AS BIGINT), 1)) AS p
        |            FROM documents, (SELECT unnest(generate_series(0, 63)) AS i)),
        |mn AS (SELECT doc_id, SUM(p) // 64 AS mean_p FROM px GROUP BY 1),
        |code AS (SELECT px.doc_id,
        |           CAST(SUM(CASE WHEN px.i < 32 AND px.p > mn.mean_p THEN CAST(1 AS BIGINT) << px.i ELSE 0 END) AS BIGINT) AS lo,
        |           CAST(SUM(CASE WHEN px.i >= 32 AND px.p > mn.mean_p THEN CAST(1 AS BIGINT) << (px.i - 32) ELSE 0 END) AS BIGINT) AS hi
        |         FROM px JOIN mn ON mn.doc_id = px.doc_id GROUP BY 1),
        |bands AS (SELECT doc_id, b,
        |            CASE WHEN b < 2 THEN (lo >> (b * 16)) & 65535 ELSE (hi >> ((b - 2) * 16)) & 65535 END AS sig,
        |            lo, hi
        |          FROM code, (SELECT unnest([0, 1, 2, 3]) AS b)),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |           a.lo AS la, a.hi AS ha, b.lo AS lb, b.hi AS hb
        |         FROM bands a JOIN bands b ON a.b = b.b AND a.sig = b.sig AND a.doc_id < b.doc_id),
        |cl AS (SELECT doc_a, doc_b,
        |         CASE WHEN bit_count(xor(la, lb)) + bit_count(xor(ha, hb)) <= 6 THEN 1 ELSE 0 END AS close
        |       FROM cand),
        |per AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS cand, CAST(SUM(close) AS BIGINT) AS nc
        |        FROM (SELECT doc_a AS doc_id, close FROM cl UNION ALL SELECT doc_b, close FROM cl)
        |        GROUP BY 1)
        |SELECT c.doc_id, c.lo, c.hi,
        |  COALESCE(p.cand, 0) AS n_cand, COALESCE(p.nc, 0) AS n_close
        |FROM code c LEFT JOIN per p ON p.doc_id = c.doc_id""".stripMargin,
    "mm_frame_dedup" ->
      """WITH f AS (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS len,
        |             CAST(1 + length(text) % 24 AS BIGINT) AS vf
        |           FROM documents WHERE length(text) >= 24),
        |fr AS (SELECT doc_id,
        |         md5(substr(text, CAST(i * (len // vf) + 1 AS INTEGER), CAST(len // vf AS INTEGER))) AS h
        |       FROM (SELECT doc_id, text, len, vf,
        |               unnest(generate_series(0, CAST(vf AS INTEGER) - 1)) AS i FROM f)),
        |df AS (SELECT h, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM fr GROUP BY 1)
        |SELECT fr.doc_id, CAST(COUNT(*) AS BIGINT) AS n_frames,
        |  CAST(SUM(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
        |  CAST(SUM(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) * 10000 // COUNT(*) AS BIGINT) AS shared_bp
        |FROM fr JOIN df USING (h) GROUP BY 1""".stripMargin,
    "mm_frame_sample" ->
      """WITH p AS (SELECT doc_id, lower(hex(encode(text))) AS h,
        |                  CAST(octet_length(encode(text)) AS BIGINT) AS n FROM documents),
        |cs AS (SELECT doc_id, n,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      [CAST((strpos('0123456789abcdef', h[2*i-1:2*i-1]) - 1) * 16
        |           + (strpos('0123456789abcdef', h[2*i:2*i]) - 1) AS BIGINT)
        |       FOR i IN generate_series(1, CAST(n AS INTEGER))]),
        |    (a, b) -> (a * 31 + b) & 2147483647) AS checksum
        |  FROM p),
        |f AS (SELECT doc_id, n, 1 + (checksum % 4096) % 120 AS vframes FROM cs),
        |s AS (SELECT doc_id, n, vframes, LEAST(8, vframes) AS n_samples,
        |             unnest(generate_series(0, CAST(LEAST(8, vframes) AS INTEGER) - 1)) AS sample_ord
        |      FROM f)
        |SELECT doc_id, CAST(sample_ord AS BIGINT) AS sample_ord,
        |  CAST((sample_ord * vframes) // n_samples AS BIGINT) AS frame_idx,
        |  CAST(vframes AS BIGINT) AS vframes,
        |  CAST(((sample_ord * vframes) // n_samples) * (n // vframes) AS BIGINT) AS frame_offset,
        |  CAST(n // vframes
        |       + CASE WHEN (sample_ord * vframes) // n_samples = vframes - 1
        |              THEN n % vframes ELSE 0 END AS BIGINT) AS frame_len
        |FROM s""".stripMargin,
    // aspect-ratio bucketing: same stub-decode dimension CTEs as
    // mm_decode_index; nearest-ladder pick replayed as a ROW_NUMBER
    // over (|ratio−b|, b) — tie lands on the smaller bucket on both
    // engines (Spark's struct array_min orders (d, b) the same way)
    "mm_aspect_bucket" ->
      """WITH p AS (SELECT doc_id, lower(hex(encode(text))) AS h,
        |                  CAST(octet_length(encode(text)) AS BIGINT) AS n FROM documents),
        |cs AS (SELECT doc_id, n,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      [CAST((strpos('0123456789abcdef', h[2*i-1:2*i-1]) - 1) * 16
        |           + (strpos('0123456789abcdef', h[2*i:2*i]) - 1) AS BIGINT)
        |       FOR i IN generate_series(1, CAST(n AS INTEGER))]),
        |    (a, b) -> (a * 31 + b) & 2147483647) AS checksum
        |  FROM p),
        |f AS (SELECT doc_id, 16 + checksum % 64 AS width,
        |             16 + (checksum // 64) % 64 AS height FROM cs),
        |r AS (SELECT doc_id, CAST((width * 10000) // height AS BIGINT) AS ratio_bp FROM f),
        |lad AS (SELECT CAST(unnest([2500, 5000, 7500, 10000, 13333, 20000, 40000]) AS BIGINT) AS b),
        |a AS (SELECT doc_id, ratio_bp, b,
        |        ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY abs(ratio_bp - b), b) AS rn
        |      FROM r, lad),
        |g AS (SELECT b AS bucket_bp, CAST(COUNT(*) AS BIGINT) AS n_assets,
        |        CAST(MIN(ratio_bp) AS BIGINT) AS lo_ratio_bp,
        |        CAST(MAX(ratio_bp) AS BIGINT) AS hi_ratio_bp
        |      FROM a WHERE rn = 1 GROUP BY 1)
        |SELECT bucket_bp, n_assets, CAST(n_assets // 32 AS BIGINT) AS n_batches,
        |  CAST(n_assets % 32 AS BIGINT) AS n_dropped, lo_ratio_bp, hi_ratio_bp FROM g""".stripMargin,
    "mm_decode_index" ->
      """WITH p AS (SELECT doc_id, lower(hex(encode(text))) AS h,
        |                  CAST(octet_length(encode(text)) AS BIGINT) AS n FROM documents),
        |cs AS (SELECT doc_id, n,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      [CAST((strpos('0123456789abcdef', h[2*i-1:2*i-1]) - 1) * 16
        |           + (strpos('0123456789abcdef', h[2*i:2*i]) - 1) AS BIGINT)
        |       FOR i IN generate_series(1, CAST(n AS INTEGER))]),
        |    (a, b) -> (a * 31 + b) & 2147483647) AS checksum
        |  FROM p),
        |f AS (SELECT doc_id, n, checksum, 16 + checksum % 64 AS width,
        |             16 + (checksum // 64) % 64 AS height, 1 + n % 4 AS n_frames FROM cs),
        |q AS (SELECT doc_id, width, height, n_frames,
        |        [CAST(n * 1000000 AS BIGINT), CAST(width * 1000000 AS BIGINT),
        |         CAST(height * 1000000 AS BIGINT), CAST((checksum % 1000) * 1000000 AS BIGINT)] AS qv
        |      FROM f),
        |pl AS (SELECT p, i,
        |         2 * (instr('0123456789abcdef',
        |                    substr(md5('plane:' || CAST(p AS VARCHAR) || ':' || CAST(i AS VARCHAR)), 1, 1)) - 1) - 15 AS w
        |       FROM (SELECT unnest(generate_series(0, 3)) AS p), (SELECT unnest(generate_series(1, 4)) AS i)),
        |d AS (SELECT q.doc_id, pl.p, CAST(SUM(qv[CAST(pl.i AS INTEGER)] * pl.w) AS BIGINT) AS dt
        |      FROM q, pl GROUP BY 1, 2),
        |b AS (SELECT doc_id,
        |        CAST(SUM(CASE WHEN dt > 0 THEN (1 << CAST(p AS INTEGER)) ELSE 0 END) AS BIGINT) AS bucket
        |      FROM d GROUP BY 1)
        |SELECT q.doc_id, CAST(q.width AS BIGINT) AS width, CAST(q.height AS BIGINT) AS height,
        |  CAST(q.n_frames AS BIGINT) AS n_frames, b.bucket
        |FROM q JOIN b USING (doc_id)""".stripMargin
  )

  /** Multi-level Louvain oracle: `levels` unrolled rounds of weighted
    * gain → move-CC → Q-acceptance gate → contraction, mirroring
    * [[graft.operators.Dedup.louvainLevels]] CTE-for-operator. Level
    * tables: e{l}(a,b,w) cross-community edges, s{l}(node,s)
    * self-loop weights, lb{l} gated labels, qp{l} the gated Q
    * numerator (4M·ΣIN − Σdeg_c² — exact HUGEINT, compared strictly,
    * so a no-move level whose identity labels reproduce the previous
    * partition's Q exactly is rejected and the chain is a no-op from
    * there on, both engines).
    */
  private def louvainOracle(levels: Int, finalSelect: String): String = {
    val lvl = (1 to levels).map { l =>
      val p = l - 1
      val qp0 = if (l == 1) s",\nqp0 AS MATERIALIZED (SELECT -(SELECT SUM(k*k) FROM dg1) AS qn)" else ""
      s"""ed$l AS MATERIALIZED (SELECT a AS src, b AS dst, w FROM e$p UNION ALL SELECT b, a, w FROM e$p),
         |nd$l AS MATERIALIZED (SELECT DISTINCT node FROM
         |  (SELECT src AS node FROM ed$l UNION ALL SELECT node FROM s$p)),
         |dg$l AS MATERIALIZED (SELECT n.node, CAST(COALESCE(x.kw, 0) + 2 * COALESCE(s.s, 0) AS HUGEINT) AS k
         |  FROM nd$l n
         |  LEFT JOIN (SELECT src AS node, SUM(w) AS kw FROM ed$l GROUP BY 1) x ON x.node = n.node
         |  LEFT JOIN s$p s ON s.node = n.node)$qp0,
         |g$l AS MATERIALIZED (SELECT e.src AS node, e.dst AS mi, 2 * mq.m * e.w - di.k * dj.k AS gain
         |  FROM ed$l e JOIN dg$l di ON di.node = e.src JOIN dg$l dj ON dj.node = e.dst CROSS JOIN mq),
         |mv$l AS MATERIALIZED (SELECT node, mi FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY node
         |    ORDER BY gain DESC, mi ASC) AS rnk FROM g$l) WHERE rnk = 1 AND gain > 0),
         |me$l AS MATERIALIZED (SELECT node AS src, mi AS dst FROM mv$l UNION ALL SELECT mi, node FROM mv$l),
         |rc$l(src, dst) AS (
         |  SELECT src, dst FROM me$l
         |  UNION
         |  SELECT r.src, e.dst FROM rc$l r JOIN me$l e ON e.src = r.dst),
         |cl$l AS MATERIALIZED (SELECT src AS node, LEAST(src, MIN(dst)) AS lab FROM rc$l GROUP BY src),
         |lc$l AS MATERIALIZED (SELECT n.node, COALESCE(c.lab, n.node) AS lab FROM nd$l n LEFT JOIN cl$l c ON c.node = n.node),
         |ia$l AS MATERIALIZED (SELECT CAST(COALESCE((SELECT SUM(e.w) FROM e$p e
         |      JOIN lc$l x ON x.node = e.a JOIN lc$l y ON y.node = e.b AND y.lab = x.lab), 0)
         |    + COALESCE((SELECT SUM(s) FROM s$p), 0) AS HUGEINT) AS sin),
         |dc$l AS MATERIALIZED (SELECT lx.lab, CAST(SUM(d.k) AS HUGEINT) AS dcv
         |  FROM dg$l d JOIN lc$l lx ON lx.node = d.node GROUP BY 1),
         |qc$l AS MATERIALIZED (SELECT 4 * mq.m * ia.sin - COALESCE((SELECT SUM(dcv * dcv) FROM dc$l), 0) AS qn
         |  FROM mq, ia$l ia),
         |ac$l AS MATERIALIZED (SELECT (qc.qn > qp$p.qn) AS ok FROM qc$l qc, qp$p),
         |lb$l AS MATERIALIZED (SELECT c.node, CASE WHEN a.ok THEN c.lab ELSE c.node END AS lab
         |  FROM lc$l c CROSS JOIN ac$l a),
         |qp$l AS MATERIALIZED (SELECT CASE WHEN a.ok THEN qc.qn ELSE qp.qn END AS qn FROM qc$l qc, qp$p qp, ac$l a),
         |e$l AS MATERIALIZED (SELECT LEAST(x.lab, y.lab) AS a, GREATEST(x.lab, y.lab) AS b, CAST(SUM(e.w) AS HUGEINT) AS w
         |  FROM e$p e JOIN lb$l x ON x.node = e.a JOIN lb$l y ON y.node = e.b
         |  WHERE x.lab <> y.lab GROUP BY 1, 2),
         |s$l AS MATERIALIZED (SELECT node, CAST(SUM(s) AS HUGEINT) AS s FROM (
         |    SELECT x.lab AS node, e.w AS s FROM e$p e
         |      JOIN lb$l x ON x.node = e.a JOIN lb$l y ON y.node = e.b AND y.lab = x.lab
         |    UNION ALL SELECT lx.lab AS node, s.s FROM s$p s JOIN lb$l lx ON lx.node = s.node)
         |  GROUP BY 1),
         |rw$l AS MATERIALIZED (SELECT CAST($l AS BIGINT) AS level,
         |    (SELECT CAST(COUNT(*) AS BIGINT) FROM nd$l) AS n_nodes,
         |    (SELECT CAST((SELECT COALESCE(SUM(w), 0) FROM e$p)
         |        + (SELECT COALESCE(SUM(s), 0) FROM s$p) AS BIGINT)) AS m_w,
         |    (SELECT CAST(COUNT(*) AS BIGINT) FROM mv$l) AS n_moves,
         |    (SELECT CASE WHEN ok THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END FROM ac$l) AS accepted,
         |    (SELECT CASE WHEN a.ok THEN (SELECT CAST(COUNT(DISTINCT lab) AS BIGINT) FROM lc$l)
         |        ELSE (SELECT CAST(COUNT(*) AS BIGINT) FROM nd$l) END FROM ac$l a) AS n_communities,
         |    (SELECT CASE WHEN mq.m = 0 THEN CAST(0 AS BIGINT)
         |        ELSE CAST((CAST(10000 AS HUGEINT) * q.qn) // (CAST(4 AS HUGEINT) * mq.m * mq.m) AS BIGINT) END
         |     FROM qp$l q, mq) AS q_bp)""".stripMargin
    }
    s"""WITH RECURSIVE $shingleCtes,
       |e0 AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b, CAST(1 AS HUGEINT) AS w FROM pairs),
       |s0 AS MATERIALIZED (SELECT CAST(NULL AS BIGINT) AS node, CAST(NULL AS HUGEINT) AS s WHERE 1 = 0),
       |mq AS MATERIALIZED (SELECT CAST(COALESCE(SUM(w), 0) AS HUGEINT) AS m FROM e0),
       |${lvl.mkString(",\n")}
       |$finalSelect""".stripMargin
  }

  private def louvainLevelsOracleSql(levels: Int): String =
    louvainOracle(levels, (1 to levels).map(l => s"SELECT * FROM rw$l").mkString("\nUNION ALL "))

  /** Final-community oracle: compose the gated label tables through
    * the levels (a level's node IS the previous level's label).
    */
  private def louvainLabelsOracleSql(levels: Int): String = {
    val joins = (2 to levels).map(l => s"JOIN lb$l l$l ON l$l.node = l${l - 1}.lab").mkString(" ")
    louvainOracle(levels, s"SELECT l1.node AS doc_id, l$levels.lab AS community FROM lb1 l1 $joins")
  }

  // bucket = FLOOR division like the ts_value_histogram oracle (DuckDB's
  // bare `//` truncates toward zero, Spark's plan floors via pmod —
  // subtract the non-negative mod first so `//` divides an exact
  // multiple on both engines; diverges on negative v otherwise)
  private val histQuantOracleSql: String =
    """WITH e AS (SELECT event_type, CAST(round(value*100) AS BIGINT) AS v FROM events),
      |h AS (SELECT event_type, (v - ((v % 500) + 500) % 500) // 500 AS bucket, CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY 1, 2),
      |c AS (SELECT event_type, bucket, n,
      |        CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY bucket) AS BIGINT) AS cum,
      |        CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT) AS total_n
      |      FROM h),
      |k AS (SELECT *, (total_n * 900000 + 999999) // 1000000 AS rank_k FROM c),
      |f AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY bucket) AS rn
      |      FROM k WHERE cum >= rank_k)
      |SELECT event_type, total_n, rank_k, bucket,
      |  CAST(bucket * 500 * 1000000 + (500 * (rank_k - (cum - n)) * 1000000) // n AS BIGINT) AS est_microc
      |FROM f WHERE rn = 1""".stripMargin

  private val ewmaOracleSql: String = {
    val num = (0 until 16)
      .map(j => s"COALESCE(lag(value_c, $j) OVER w, 0) * ${1L << (15 - j)}")
      .mkString(" + ")
    val den = (0 until 16)
      .map(j => s"CASE WHEN lag(value_c, $j) OVER w IS NOT NULL THEN ${1L << (15 - j)} ELSE 0 END")
      .mkString(" + ")
    s"""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
       |             CAST(round(value*100) AS BIGINT) AS value_c FROM events)
       |SELECT event_id, user_id, ts_us, value_c,
       |  CAST(($num) // ($den) AS BIGINT) AS ewma_c
       |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)""".stripMargin
  }

  /** EWMA oracle with the reordering variant's final-watermark cutoff:
    * the smoothing window computes over ALL events (the engine's ring
    * sees full history), only the EMITTED set is truncated at the
    * watermark — so the filter must sit outside the window CTE.
    */
  private val ewmaOooOracleSql: String = {
    val num = (0 until 16)
      .map(j => s"COALESCE(lag(value_c, $j) OVER w, 0) * ${1L << (15 - j)}")
      .mkString(" + ")
    val den = (0 until 16)
      .map(j => s"CASE WHEN lag(value_c, $j) OVER w IS NOT NULL THEN ${1L << (15 - j)} ELSE 0 END")
      .mkString(" + ")
    s"""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
       |             CAST(round(value*100) AS BIGINT) AS value_c FROM events),
       |c AS (SELECT ((MAX(ts_us) // 1000) - 1800000) * 1000 AS wm_us FROM e),
       |v AS (SELECT event_id, user_id, ts_us, value_c,
       |        CAST(($num) // ($den) AS BIGINT) AS ewma_c
       |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id))
       |SELECT event_id, user_id, ts_us, value_c, ewma_c
       |FROM v, c WHERE ts_us <= wm_us""".stripMargin
  }

  /** DuckDB oracle SQL for the time-series queries (§2 rows 1-14). */
  /** ts_cusum oracle — the gp'/gn' candidates repeat inside the
    * alarm test, the reset, and the running max, so they're built
    * once here and interpolated (the lambda-can't-let-bind problem,
    * mirrored on the oracle side)
    */
  private val cusumOracleSql: String = {
    val gp1 = "greatest(0, r.gp + (o.m - p.med) - p.kk)"
    val gn1 = "greatest(0, r.gn - (o.m - p.med) - p.kk)"
    val alarm = s"($gp1 > p.hh OR $gn1 > p.hh)"
    s"""WITH RECURSIVE ev AS (SELECT user_id, epoch_us(ts) // 3600000000 AS hour_id,
       |                  CAST(round(value*100) AS BIGINT) AS v FROM events),
       |h AS (SELECT user_id, hour_id, CAST(SUM(v) // COUNT(*) AS BIGINT) AS m
       |      FROM ev GROUP BY 1, 2),
       |o AS (SELECT user_id, hour_id, m,
       |        CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY hour_id) AS BIGINT) AS rn
       |      FROM h),
       |mx AS (SELECT user_id, MAX(rn) AS n_hours FROM o GROUP BY 1),
       |vs AS (SELECT user_id, m, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY m) AS vr FROM o),
       |md AS (SELECT v.user_id, v.m AS med FROM vs v JOIN mx ON mx.user_id = v.user_id
       |       WHERE v.vr = (mx.n_hours + 1) // 2),
       |ds AS (SELECT o.user_id, abs(o.m - md.med) AS a,
       |        ROW_NUMBER() OVER (PARTITION BY o.user_id ORDER BY abs(o.m - md.med)) AS ar
       |      FROM o JOIN md ON md.user_id = o.user_id),
       |mq AS (SELECT d.user_id, d.a AS mad FROM ds d JOIN mx ON mx.user_id = d.user_id
       |        WHERE d.ar = (mx.n_hours + 1) // 2),
       |p0 AS (SELECT md.user_id, CAST(md.med AS BIGINT) AS med, CAST(mq.mad AS BIGINT) AS mad,
       |         CAST(greatest(1, mq.mad // 2) AS BIGINT) AS kk,
       |         CAST(5 * greatest(1, mq.mad) AS BIGINT) AS hh
       |       FROM md JOIN mq ON mq.user_id = md.user_id),
       |rec AS (
       |  SELECT user_id, CAST(0 AS BIGINT) AS rn, CAST(0 AS BIGINT) AS gp, CAST(0 AS BIGINT) AS gn,
       |         CAST(0 AS BIGINT) AS al, CAST(0 AS BIGINT) AS mxs
       |  FROM mx
       |  UNION ALL
       |  SELECT o.user_id, o.rn,
       |    CAST(CASE WHEN $alarm THEN 0 ELSE $gp1 END AS BIGINT),
       |    CAST(CASE WHEN $alarm THEN 0 ELSE $gn1 END AS BIGINT),
       |    CAST(r.al + CASE WHEN $alarm THEN 1 ELSE 0 END AS BIGINT),
       |    CAST(greatest(r.mxs, $gp1, $gn1) AS BIGINT)
       |  FROM rec r JOIN o ON o.user_id = r.user_id AND o.rn = r.rn + 1
       |  JOIN p0 p ON p.user_id = r.user_id
       |)
       |SELECT r.user_id, mx.n_hours, p.med AS med_c, p.mad AS mad_c,
       |  r.al AS n_alarms, r.mxs AS max_stat, r.gp AS gp_final, r.gn AS gn_final
       |FROM rec r JOIN mx ON mx.user_id = r.user_id AND r.rn = mx.n_hours
       |JOIN p0 p ON p.user_id = r.user_id""".stripMargin
  }

  /** ts_profile_cluster oracle — the unrolled integer Lloyd over
    * mean-centered 24-slot hod profiles (pqLloydCtes discipline: the
    * centroid average is the exact FLOOR (s − pmod)/n because centered
    * values go negative)
    */
  private val profileClusterOracleSql: String = {
    val iters = 2
    val rounds = (0 until iters).map { t =>
      s"""ad$t AS (SELECT q.vec_id, c.code, CAST(SUM((q.v - c.v) * (q.v - c.v)) AS BIGINT) AS d2
         |        FROM q JOIN cb$t c ON c.i = q.i GROUP BY 1, 2),
         |as$t AS (SELECT vec_id, code FROM
         |        (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2 ASC, code ASC) AS rn FROM ad$t)
         |        WHERE rn = 1),
         |cb${t + 1} AS (SELECT a.code, q.i,
         |         CAST((SUM(q.v) - (((SUM(q.v) % COUNT(*)) + COUNT(*)) % COUNT(*))) // COUNT(*) AS BIGINT) AS v
         |       FROM as$t a JOIN q ON q.vec_id = a.vec_id GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (SELECT user_id, (epoch_us(ts) // 3600000000) % 24 AS hod,
       |            CAST(round(value*100) AS BIGINT) AS v FROM events),
       |hm AS (SELECT user_id, hod, CAST(SUM(v) // COUNT(*) AS BIGINT) AS m FROM e GROUP BY 1, 2),
       |grid AS (SELECT u.user_id, h.hod FROM (SELECT DISTINCT user_id FROM e) u,
       |         (SELECT unnest(generate_series(0, 23)) AS hod) h),
       |p AS (SELECT g.user_id, g.hod AS i, CAST(COALESCE(hm.m, 0) AS BIGINT) AS pv
       |      FROM grid g LEFT JOIN hm ON hm.user_id = g.user_id AND hm.hod = g.hod),
       |mu AS (SELECT user_id, CAST(SUM(pv) // 24 AS BIGINT) AS mu FROM p GROUP BY 1),
       |q AS (SELECT p.user_id AS vec_id, p.i, CAST(p.pv - mu.mu AS BIGINT) AS v
       |      FROM p JOIN mu ON mu.user_id = p.user_id),
       |cb0 AS (SELECT vec_id AS code, i, v FROM q WHERE vec_id < 4),
       |$rounds,
       |adF AS (SELECT q.vec_id, c.code, CAST(SUM((q.v - c.v) * (q.v - c.v)) AS BIGINT) AS d2
       |        FROM q JOIN cb$iters c ON c.i = q.i GROUP BY 1, 2)
       |SELECT vec_id AS user_id, CAST(code AS BIGINT) AS cluster, d2 FROM
       |  (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2 ASC, code ASC) AS rn FROM adF)
       |WHERE rn = 1""".stripMargin
  }

  private val tsOracles: Map[String, String] = Map(
    // Benford first-digit audit: strictly-positive cents, leading
    // decimal digit from the string head, bp share over the ≤9-row
    // per-type digit table
    "ts_benford" ->
      """WITH e AS (SELECT event_type, CAST(round(value*100) AS BIGINT) AS v FROM events),
        |g AS (SELECT event_type, CAST(substr(CAST(v AS VARCHAR), 1, 1) AS BIGINT) AS d1,
        |             CAST(COUNT(*) AS BIGINT) AS n
        |      FROM e WHERE v > 0 GROUP BY 1, 2)
        |SELECT event_type, d1, n,
        |  CAST(n * 10000 // SUM(n) OVER (PARTITION BY event_type) AS BIGINT) AS share_bp
        |FROM g""".stripMargin,
    // max drawdown of the per-series cumulative cents path: running
    // sum, running max of it, peak − cum
    "ts_drawdown" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |                  CAST(round(value*100) AS BIGINT) AS v FROM events),
        |r AS (SELECT user_id, ts_us, event_id,
        |        CAST(SUM(v) OVER w AS BIGINT) AS cum
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
        |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |p AS (SELECT user_id, cum, CAST(MAX(cum) OVER w AS BIGINT) AS peak
        |      FROM r WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
        |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_points,
        |  MAX(peak) AS max_peak_c, MAX(peak - cum) AS max_drawdown_c,
        |  CAST(SUM(CASE WHEN peak - cum > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_underwater
        |FROM p GROUP BY 1""".stripMargin,
    // Holt linear recursion replayed exactly: hourly means and l/b
    // halving by // — DuckDB's // and Spark's DIV both truncate
    // toward zero (verified: -7 // 2 = -3 on both), so the recursion
    // is bit-identical cross-engine with plain integral division on
    // both sides; one recursive step per hour rank
    "ts_holt_linear" ->
      """WITH RECURSIVE ev AS (SELECT user_id, epoch_us(ts) // 3600000000 AS hour_id,
        |                  CAST(round(value*100) AS BIGINT) AS v FROM events),
        |h AS (SELECT user_id, hour_id, CAST(SUM(v) // COUNT(*) AS BIGINT) AS m
        |      FROM ev GROUP BY 1, 2),
        |o AS (SELECT user_id, hour_id, m,
        |        CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY hour_id) AS BIGINT) AS rn
        |      FROM h),
        |mx AS (SELECT user_id, MAX(rn) AS n_hours FROM o GROUP BY 1),
        |rec AS (
        |  SELECT user_id, rn, m AS l, CAST(0 AS BIGINT) AS b, CAST(0 AS BIGINT) AS er
        |  FROM o WHERE rn = 1
        |  UNION ALL
        |  SELECT o.user_id, o.rn,
        |    CAST((o.m + r.l + r.b) // 2 AS BIGINT),
        |    CAST(((o.m + r.l + r.b) // 2 - r.l + r.b) // 2 AS BIGINT),
        |    CAST(r.er + abs(r.l + r.b - o.m) AS BIGINT)
        |  FROM rec r JOIN o ON o.user_id = r.user_id AND o.rn = r.rn + 1
        |)
        |SELECT r.user_id, mx.n_hours, r.l AS level_c, r.b AS trend_c,
        |  r.l + r.b AS forecast_c, r.er AS sae_c
        |FROM rec r JOIN mx ON mx.user_id = r.user_id AND r.rn = mx.n_hours""".stripMargin,
    // scalar Kalman filter, Q=25 R=400, gain in ppm: the same
    // truncating integer recursion on both engines (Spark DIV and
    // DuckDB // truncate toward zero; z - x goes negative); p is
    // self-bounding below R so no intermediate nears 2^63
    "ts_profile_cluster" -> profileClusterOracleSql,
    // dow = (epoch_days + 4) % 7 on both engines — integer arithmetic,
    // no locale-dependent date function
    "ts_weekly_profile" ->
      """WITH e AS (SELECT event_type,
        |             (epoch_us(ts) // 86400000000 + 4) % 7 AS dow,
        |             (epoch_us(ts) // 3600000000) % 24 AS hod,
        |             CAST(round(value*100) AS BIGINT) AS v FROM events),
        |g AS (SELECT event_type, CAST(dow AS BIGINT) AS dow, CAST(hod AS BIGINT) AS hod,
        |        CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(v) AS BIGINT) AS sv
        |      FROM e GROUP BY 1, 2, 3)
        |SELECT event_type, dow, hod, n, CAST(sv // n AS BIGINT) AS mean_c,
        |  CAST(n * 10000 // SUM(n) OVER (PARTITION BY event_type) AS BIGINT) AS share_bp
        |FROM g""".stripMargin,
    // the +1/−1 sweep integrated: covered = Σ gap·[open>0], segments
    // via the 0→positive transition counter — windows all per-supplier
    "rel_interval_union" ->
      """WITH iv AS (SELECT l_suppkey,
        |        CAST(datediff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS s,
        |        CAST(datediff('day', DATE '1992-01-01', l_shipdate) AS BIGINT) + 1 AS e
        |      FROM lineitem JOIN orders ON o_orderkey = l_orderkey),
        |ev AS (SELECT l_suppkey, t, CAST(SUM(d) AS BIGINT) AS d,
        |         CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS starts
        |       FROM (SELECT l_suppkey, s AS t, 1 AS d FROM iv
        |             UNION ALL SELECT l_suppkey, e AS t, -1 AS d FROM iv)
        |       GROUP BY 1, 2),
        |op AS (SELECT l_suppkey, t, starts,
        |         SUM(d) OVER (PARTITION BY l_suppkey ORDER BY t) AS open
        |       FROM ev),
        |sw AS (SELECT l_suppkey, t, starts, open,
        |         LEAD(t) OVER (PARTITION BY l_suppkey ORDER BY t) AS next_t,
        |         COALESCE(LAG(open) OVER (PARTITION BY l_suppkey ORDER BY t), 0) AS prev_open
        |       FROM op),
        |sg AS (SELECT *, CASE WHEN open > 0 THEN next_t - t ELSE 0 END AS covered,
        |         SUM(CASE WHEN open > 0 AND prev_open = 0 THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY l_suppkey ORDER BY t) AS seg_id
        |       FROM sw),
        |segs AS (SELECT l_suppkey, seg_id, CAST(SUM(covered) AS BIGINT) AS seg_days
        |         FROM sg WHERE open > 0 GROUP BY 1, 2),
        |pseg AS (SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n_segments,
        |           CAST(SUM(seg_days) AS BIGINT) AS covered_days,
        |           CAST(MAX(seg_days) AS BIGINT) AS longest_days
        |         FROM segs GROUP BY 1),
        |piv AS (SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n_intervals,
        |          CAST(MIN(s) AS BIGINT) AS lo, CAST(MAX(e) AS BIGINT) AS hi
        |        FROM iv GROUP BY 1)
        |SELECT piv.l_suppkey, piv.n_intervals, pseg.n_segments, pseg.covered_days,
        |  pseg.longest_days, CAST(piv.hi - piv.lo AS BIGINT) AS span_days,
        |  CAST(pseg.covered_days * 10000 // (piv.hi - piv.lo) AS BIGINT) AS util_bp
        |FROM piv JOIN pseg ON pseg.l_suppkey = piv.l_suppkey""".stripMargin,
    // Page's two-sided CUSUM: med/MAD are the lower-median convention
    // (value at rank (n+1)//2 — a ROW_NUMBER pick here, an array index
    // on the Spark side; equal values make the tiebreak irrelevant),
    // and the alarm-reset recursion replays Spark's aggregate() fold
    "ts_cusum" -> cusumOracleSql,
    // the streaming dual's max-seq provisional row at drain IS the
    // batch fold (same closed-hour means, same Page recursion, same
    // batch-calibrated med/MAD), so the batch oracle verifies it
    "ts_cusum_stream" -> cusumOracleSql,
    "ts_kalman" ->
      """WITH RECURSIVE ev AS (SELECT user_id, epoch_us(ts) // 3600000000 AS hour_id,
        |                  CAST(round(value*100) AS BIGINT) AS v FROM events),
        |h AS (SELECT user_id, hour_id, CAST(SUM(v) // COUNT(*) AS BIGINT) AS m
        |      FROM ev GROUP BY 1, 2),
        |o AS (SELECT user_id, hour_id, m,
        |        CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY hour_id) AS BIGINT) AS rn
        |      FROM h),
        |mx AS (SELECT user_id, MAX(rn) AS n_hours FROM o GROUP BY 1),
        |rec AS (
        |  SELECT user_id, rn, m AS x, CAST(400 AS BIGINT) AS p, CAST(0 AS BIGINT) AS er
        |  FROM o WHERE rn = 1
        |  UNION ALL
        |  SELECT o.user_id, o.rn,
        |    CAST(r.x + (((r.p + 25) * 1000000 // (r.p + 25 + 400)) * (o.m - r.x)) // 1000000 AS BIGINT),
        |    CAST(((1000000 - (r.p + 25) * 1000000 // (r.p + 25 + 400)) * (r.p + 25)) // 1000000 AS BIGINT),
        |    CAST(r.er + abs(o.m - r.x) AS BIGINT)
        |  FROM rec r JOIN o ON o.user_id = r.user_id AND o.rn = r.rn + 1
        |)
        |SELECT r.user_id, mx.n_hours, r.x AS est_c, r.p AS p_final,
        |  CAST((r.p + 25) * 1000000 // (r.p + 25 + 400) AS BIGINT) AS gain_ppm,
        |  r.er AS sae_c
        |FROM rec r JOIN mx ON mx.user_id = r.user_id AND r.rn = mx.n_hours""".stripMargin,
    // theta method: the OLS fit in closed-form integer identities
    // (Σrn, Σrn², n²(n²−1)/12 all exact), the θ=2-line SES recursion
    // replayed step for step — // and DIV both truncate toward zero,
    // HUGEINT carries the 10⁶-scaled fit numerators like Spark's
    // DECIMAL(38,0) does
    "ts_theta_forecast" ->
      """WITH RECURSIVE ev AS (SELECT user_id, epoch_us(ts) // 3600000000 AS hour_id,
        |                  CAST(round(value*100) AS BIGINT) AS v FROM events),
        |h AS (SELECT user_id, hour_id, CAST(SUM(v) // COUNT(*) AS BIGINT) AS m
        |      FROM ev GROUP BY 1, 2),
        |o AS (SELECT user_id, hour_id, m,
        |        CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY hour_id) AS BIGINT) AS rn
        |      FROM h),
        |fit AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(m) AS BIGINT) AS sm,
        |          CAST(SUM(rn * m) AS BIGINT) AS sxm FROM o GROUP BY 1),
        |co AS (SELECT user_id, n, (n * (n + 1)) // 2 AS srn,
        |         CAST((CAST(1000000 AS HUGEINT) * (n * sxm - ((n * (n + 1)) // 2) * sm))
        |           // GREATEST((n * n * (n * n - 1)) // 12, 1) AS BIGINT) AS sl,
        |         sm FROM fit),
        |co2 AS (SELECT user_id, n, srn, sl,
        |          CAST((CAST(1000000 AS HUGEINT) * sm - CAST(sl AS HUGEINT) * srn) // n AS BIGINT) AS ic
        |        FROM co),
        |rec AS (
        |  SELECT o.user_id, o.rn, CAST(2000000 * o.m - (c.ic + c.sl) AS BIGINT) AS s,
        |         CAST(0 AS BIGINT) AS e
        |  FROM o JOIN co2 c ON c.user_id = o.user_id WHERE o.rn = 1
        |  UNION ALL
        |  SELECT o.user_id, o.rn,
        |    CAST((2000000 * o.m - (c.ic + c.sl * o.rn) + r.s) // 2 AS BIGINT),
        |    CAST(r.e + abs((r.s + c.ic + c.sl * o.rn) // 2 - 1000000 * o.m) AS BIGINT)
        |  FROM rec r JOIN o ON o.user_id = r.user_id AND o.rn = r.rn + 1
        |  JOIN co2 c ON c.user_id = o.user_id
        |)
        |SELECT r.user_id, c.n AS n_hours, c.sl AS slope_micro, r.s AS ses_micro,
        |  CAST((r.s + c.ic + c.sl * (c.n + 1)) // 2 AS BIGINT) AS forecast_micro,
        |  r.e AS sae_micro
        |FROM rec r JOIN co2 c ON c.user_id = r.user_id AND r.rn = c.n""".stripMargin,
    // prominence-gated local maxima: full two-sided 3-hour flanks
    // only, every comparison in integer cents
    "ts_peak_detect" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hour_id,
        |             CAST(round(value*100) AS BIGINT) AS v FROM events),
        |h AS (SELECT event_type, hour_id, CAST(SUM(v) // COUNT(*) AS BIGINT) AS m
        |      FROM e GROUP BY 1, 2),
        |o AS (SELECT event_type, hour_id, m,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hour_id) AS BIGINT) AS rn,
        |  CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS nh,
        |  LAG(m, 1) OVER (PARTITION BY event_type ORDER BY hour_id) AS prev_m,
        |  LEAD(m, 1) OVER (PARTITION BY event_type ORDER BY hour_id) AS next_m,
        |  MAX(m) OVER (PARTITION BY event_type ORDER BY hour_id
        |               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS win_max,
        |  MIN(m) OVER (PARTITION BY event_type ORDER BY hour_id
        |               ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS lmin,
        |  MIN(m) OVER (PARTITION BY event_type ORDER BY hour_id
        |               ROWS BETWEEN 1 FOLLOWING AND 3 FOLLOWING) AS rmin
        |  FROM h)
        |SELECT event_type, hour_id, m AS peak_c,
        |  CAST(m - GREATEST(lmin, rmin) AS BIGINT) AS prom_c
        |FROM o WHERE rn > 3 AND rn <= nh - 3
        |  AND m > prev_m AND m >= next_m AND m = win_max
        |  AND m - GREATEST(lmin, rmin) >= 50""".stripMargin,
    // additive Holt-Winters: the same truncating-halving recursion
    // with a 24-slot calendar-aligned seasonal LIST carried through
    // the recursive CTE; slot update mirrors the Spark fold exactly
    "ts_holt_winters" ->
      """WITH RECURSIVE ev AS (SELECT user_id, epoch_us(ts) // 3600000000 AS hour_id,
        |                  CAST(round(value*100) AS BIGINT) AS v FROM events),
        |h AS (SELECT user_id, hour_id, CAST(SUM(v) // COUNT(*) AS BIGINT) AS m
        |      FROM ev GROUP BY 1, 2),
        |o AS (SELECT user_id, hour_id, m,
        |        CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY hour_id) AS BIGINT) AS rn
        |      FROM h),
        |mx AS (SELECT user_id, MAX(rn) AS n_hours FROM o GROUP BY 1),
        |rec AS (
        |  SELECT user_id, rn, hour_id, m AS l, CAST(0 AS BIGINT) AS b,
        |         list_transform(range(24), j -> CAST(0 AS BIGINT)) AS s,
        |         CAST(0 AS BIGINT) AS er
        |  FROM o WHERE rn = 1
        |  UNION ALL
        |  SELECT o.user_id, o.rn, o.hour_id,
        |    CAST((o.m - r.s[CAST(((o.hour_id % 24) + 24) % 24 AS INT) + 1] + r.l + r.b) // 2 AS BIGINT) AS l,
        |    CAST(((o.m - r.s[CAST(((o.hour_id % 24) + 24) % 24 AS INT) + 1] + r.l + r.b) // 2 - r.l + r.b) // 2 AS BIGINT) AS b,
        |    list_transform(range(24), j -> CASE WHEN j = CAST(((o.hour_id % 24) + 24) % 24 AS BIGINT)
        |      THEN CAST((o.m - ((o.m - r.s[CAST(((o.hour_id % 24) + 24) % 24 AS INT) + 1] + r.l + r.b) // 2)
        |                 + r.s[CAST(((o.hour_id % 24) + 24) % 24 AS INT) + 1]) // 2 AS BIGINT)
        |      ELSE r.s[CAST(j AS INT) + 1] END) AS s,
        |    CAST(r.er + abs(r.l + r.b + r.s[CAST(((o.hour_id % 24) + 24) % 24 AS INT) + 1] - o.m) AS BIGINT) AS er
        |  FROM rec r JOIN o ON o.user_id = r.user_id AND o.rn = r.rn + 1
        |)
        |SELECT r.user_id, mx.n_hours, r.l AS level_c, r.b AS trend_c,
        |  CAST(r.l + r.b + r.s[CAST((((r.hour_id + 1) % 24) + 24) % 24 AS INT) + 1] AS BIGINT) AS forecast_c,
        |  r.er AS sae_c
        |FROM rec r JOIN mx ON mx.user_id = r.user_id AND r.rn = mx.n_hours""".stripMargin,
    // model selection: snaive vs Holt one-step MAE per series — both
    // backtests replayed, joined, verdict row-local (tie → snaive)
    "ts_forecast_eval" ->
      """WITH RECURSIVE e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day_id,
        |                  (epoch_us(ts) // 3600000000) % 24 AS hour_of_day,
        |                  epoch_us(ts) // 3600000000 AS hour_id,
        |                  CAST(round(value*100) AS BIGINT) AS v_c FROM events),
        |h1 AS (SELECT user_id, day_id, hour_of_day,
        |        CAST(SUM(v_c) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
        |      FROM e GROUP BY 1, 2, 3),
        |m1 AS (SELECT user_id, day_id, hour_of_day, CAST((s - ((s % n) + n) % n) // n AS BIGINT) AS mean_c FROM h1),
        |l1 AS (SELECT user_id, day_id, mean_c,
        |        lag(mean_c) OVER wd AS prev_mean_c, lag(day_id) OVER wd AS prev_day
        |      FROM m1 WINDOW wd AS (PARTITION BY user_id, hour_of_day ORDER BY day_id)),
        |sn AS (SELECT user_id,
        |         CAST(SUM(abs(mean_c - prev_mean_c)) * 1000000 // COUNT(*) AS BIGINT) AS snaive_mae_micro
        |       FROM l1 WHERE prev_day = day_id - 1 GROUP BY 1),
        |h AS (SELECT user_id, hour_id, CAST(SUM(v_c) // COUNT(*) AS BIGINT) AS m
        |      FROM e GROUP BY 1, 2),
        |o AS (SELECT user_id, hour_id, m,
        |        CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY hour_id) AS BIGINT) AS rn
        |      FROM h),
        |mx AS (SELECT user_id, MAX(rn) AS n_hours FROM o GROUP BY 1),
        |rec AS (
        |  SELECT user_id, rn, m AS l, CAST(0 AS BIGINT) AS b, CAST(0 AS BIGINT) AS er
        |  FROM o WHERE rn = 1
        |  UNION ALL
        |  SELECT o.user_id, o.rn,
        |    CAST((o.m + r.l + r.b) // 2 AS BIGINT),
        |    CAST(((o.m + r.l + r.b) // 2 - r.l + r.b) // 2 AS BIGINT),
        |    CAST(r.er + abs(r.l + r.b - o.m) AS BIGINT)
        |  FROM rec r JOIN o ON o.user_id = r.user_id AND o.rn = r.rn + 1),
        |ho AS (SELECT r.user_id, CAST(r.er * 1000000 // (mx.n_hours - 1) AS BIGINT) AS holt_mae_micro
        |       FROM rec r JOIN mx ON mx.user_id = r.user_id AND r.rn = mx.n_hours
        |       WHERE mx.n_hours > 1)
        |SELECT sn.user_id, sn.snaive_mae_micro, ho.holt_mae_micro,
        |  CASE WHEN ho.holt_mae_micro < sn.snaive_mae_micro THEN 'holt' ELSE 'snaive' END AS winner
        |FROM sn JOIN ho ON ho.user_id = sn.user_id""".stripMargin,
    // dominant SAX 3-gram per series: the ts_sax pipeline verbatim,
    // then a per-series motif count + rank-1 with lexical tiebreak
    "ts_motif_topk" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 3600000000 AS hour_id,
        |                  CAST(round(value*100) AS BIGINT) AS v FROM events),
        |h AS (SELECT user_id, hour_id, CAST(SUM(v) AS BIGINT) AS s,
        |             CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY 1, 2),
        |p AS (SELECT user_id, hour_id, CAST(s // n AS BIGINT) AS paa FROM h),
        |q AS (SELECT user_id, hour_id, paa,
        |        NTILE(4) OVER (PARTITION BY user_id ORDER BY paa ASC, hour_id ASC) AS qt FROM p),
        |sy AS (SELECT user_id, hour_id,
        |         CASE qt WHEN 1 THEN 'a' WHEN 2 THEN 'b' WHEN 3 THEN 'c' ELSE 'd' END AS sym FROM q),
        |ag AS (SELECT user_id, string_agg(sym, '' ORDER BY hour_id) AS sax FROM sy GROUP BY 1),
        |g AS (SELECT user_id,
        |        unnest(list_transform(generate_series(1, CAST(length(sax) AS BIGINT) - 2),
        |                              i -> substr(sax, CAST(i AS INTEGER), 3))) AS motif
        |      FROM ag WHERE length(sax) >= 3),
        |c AS (SELECT user_id, motif, CAST(COUNT(*) AS BIGINT) AS n_occ FROM g GROUP BY 1, 2),
        |r AS (SELECT user_id, motif, n_occ,
        |        ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n_occ DESC, motif ASC) AS rnk FROM c)
        |SELECT user_id, motif, n_occ FROM r WHERE rnk = 1""".stripMargin,
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
    "ts_value_delta" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |         CAST(round(value*100) AS BIGINT) AS value_c
        |  FROM events
        |), d AS (
        |  SELECT user_id, ts_us, event_id, value_c,
        |         value_c - lag(value_c) OVER w AS dv
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        |), l AS (
        |  SELECT user_id, value_c AS last_c FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts_us DESC, event_id DESC) AS rn
        |    FROM e) WHERE rn = 1
        |), a AS (
        |  SELECT user_id, COUNT(*) AS n,
        |    MIN(CASE WHEN dv IS NULL THEN value_c END) AS first_c,
        |    MIN(dv) AS min_dv, MAX(dv) AS max_dv,
        |    CAST(SUM(COALESCE(dv, 0)) AS BIGINT) AS sum_dv
        |  FROM d GROUP BY user_id
        |)
        |SELECT a.user_id, a.n, a.first_c, l.last_c, a.min_dv, a.max_dv, a.sum_dv,
        |  CAST(CASE WHEN a.first_c + a.sum_dv = l.last_c THEN 1 ELSE 0 END AS BIGINT) AS recon_ok
        |FROM a JOIN l ON l.user_id = a.user_id""".stripMargin,
    "ts_float_downcast" ->
      """WITH a AS (
        |  SELECT event_type, COUNT(*) AS n,
        |    CAST(SUM(CASE WHEN CAST(CAST(value AS REAL) AS DOUBLE) = value THEN 1 ELSE 0 END) AS BIGINT) AS n_f32_ok
        |  FROM events GROUP BY event_type
        |)
        |SELECT event_type, n, n_f32_ok,
        |  CAST(CASE WHEN n_f32_ok = n THEN 4 ELSE 8 END AS BIGINT) AS float_bytes
        |FROM a""".stripMargin,
    // XOR packing is bit-exact by construction: the oracle demands
    // n_bits_exact == n_points (COUNT(*) twice) and the reconstructed
    // values' fixed-point sum equal to the raw table's — any bit the
    // XOR chain loses breaks one of the three columns
    "ts_float_xor" ->
      """SELECT user_id, COUNT(*) AS n_points, COUNT(*) AS n_bits_exact,
        |  CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c
        |FROM events GROUP BY user_id""".stripMargin,
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
    "ts_ohlc_1d" -> ohlcOracle,
    // streamed candles: struct-min/max merge is associative and
    // commutative, so the drained state equals the batch row-number
    // formulation in any arrival order — shared oracle
    "ts_ohlc_stream" -> ohlcOracle,
    "ts_moving_avg" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |  CAST(SUM(CAST(round(value*100) AS BIGINT)) OVER w AS BIGINT) AS w5_sum_c,
        |  CAST(COUNT(*) OVER w AS BIGINT) AS w5_n
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)""".stripMargin,
    "ts_downsample_m4" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |         CAST(round(value*100) AS BIGINT) AS value_c,
        |         MIN(epoch_us(ts)) OVER (PARTITION BY user_id) AS t0,
        |         MAX(epoch_us(ts)) OVER (PARTITION BY user_id) AS t1
        |  FROM events
        |), b AS (
        |  SELECT user_id, ts_us, event_id, value_c,
        |         LEAST(99, (ts_us - t0) * 100 // (t1 - t0 + 1)) AS bucket
        |  FROM e
        |), r AS (
        |  SELECT *,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, bucket ORDER BY ts_us ASC, event_id ASC) AS rn_a,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, bucket ORDER BY ts_us DESC, event_id DESC) AS rn_d
        |  FROM b
        |)
        |SELECT user_id, bucket,
        |  MIN(value_c) AS min_c, MAX(value_c) AS max_c,
        |  MAX(CASE WHEN rn_a = 1 THEN value_c END) AS first_c,
        |  MAX(CASE WHEN rn_d = 1 THEN value_c END) AS last_c,
        |  MIN(ts_us) AS t_start_us, MAX(ts_us) AS t_end_us, COUNT(*) AS n
        |FROM r GROUP BY user_id, bucket""".stripMargin,
    // STL decomposition: hourly mean levels, ±12-row centered trend,
    // hour-of-day seasonal of the detrended level. Detrended sums can
    // be negative; DuckDB's // and Spark's DIV both truncate toward
    // zero, so plain integral division matches bit-for-bit
    "ts_stl_decompose" ->
      """WITH h AS (SELECT user_id, epoch_us(ts) // 3600000000 AS hour_id,
        |        CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS s,
        |        CAST(COUNT(*) AS BIGINT) AS n
        |      FROM events GROUP BY 1, 2),
        |l AS (SELECT user_id, hour_id, CAST(s // n AS BIGINT) AS level_c FROM h),
        |t AS (SELECT *, CAST(SUM(level_c) OVER w // COUNT(*) OVER w AS BIGINT) AS trend_c
        |      FROM l WINDOW w AS (PARTITION BY user_id ORDER BY hour_id
        |                          ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
        |d AS (SELECT *, level_c - trend_c AS det_c, hour_id % 24 AS hod FROM t),
        |sn AS (SELECT user_id, hod, CAST(SUM(det_c) // COUNT(*) AS BIGINT) AS seasonal_c
        |       FROM d GROUP BY 1, 2)
        |SELECT d.user_id, d.hour_id, d.hod, d.level_c, d.trend_c, sn.seasonal_c,
        |  d.level_c - d.trend_c - sn.seasonal_c AS resid_c
        |FROM d JOIN sn ON sn.user_id = d.user_id AND sn.hod = d.hod""".stripMargin,
    // seasonality/trend strength off the STL rows: division-free
    // variance numerators, HUGEINT/DECIMAL scaling, trunc division
    "ts_stl_strength" ->
      """WITH h AS (SELECT user_id, epoch_us(ts) // 3600000000 AS hour_id,
        |        CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS s,
        |        CAST(COUNT(*) AS BIGINT) AS n
        |      FROM events GROUP BY 1, 2),
        |l AS (SELECT user_id, hour_id, CAST(s // n AS BIGINT) AS level_c FROM h),
        |t AS (SELECT *, CAST(SUM(level_c) OVER w // COUNT(*) OVER w AS BIGINT) AS trend_c
        |      FROM l WINDOW w AS (PARTITION BY user_id ORDER BY hour_id
        |                          ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
        |d AS (SELECT *, level_c - trend_c AS det_c, hour_id % 24 AS hod FROM t),
        |sn AS (SELECT user_id, hod, CAST(SUM(det_c) // COUNT(*) AS BIGINT) AS seasonal_c
        |       FROM d GROUP BY 1, 2),
        |x AS (SELECT d.user_id, d.level_c - d.trend_c - sn.seasonal_c AS r,
        |        sn.seasonal_c + (d.level_c - d.trend_c - sn.seasonal_c) AS sr,
        |        d.trend_c + (d.level_c - d.trend_c - sn.seasonal_c) AS tr
        |      FROM d JOIN sn ON sn.user_id = d.user_id AND sn.hod = d.hod),
        |a AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_hours,
        |        CAST(SUM(r) AS BIGINT) AS s_r, CAST(SUM(r * r) AS BIGINT) AS ss_r,
        |        CAST(SUM(sr) AS BIGINT) AS s_sr, CAST(SUM(sr * sr) AS BIGINT) AS ss_sr,
        |        CAST(SUM(tr) AS BIGINT) AS s_tr, CAST(SUM(tr * tr) AS BIGINT) AS ss_tr
        |      FROM x GROUP BY 1)
        |SELECT user_id, n_hours,
        |  CAST(GREATEST(0, 10000 - CAST(n_hours * ss_r - s_r * s_r AS HUGEINT) * 10000
        |    // CAST(GREATEST(n_hours * ss_sr - s_sr * s_sr, 1) AS HUGEINT)) AS BIGINT) AS season_strength_bp,
        |  CAST(GREATEST(0, 10000 - CAST(n_hours * ss_r - s_r * s_r AS HUGEINT) * 10000
        |    // CAST(GREATEST(n_hours * ss_tr - s_tr * s_tr, 1) AS HUGEINT)) AS BIGINT) AS trend_strength_bp
        |FROM a""".stripMargin,
    // parallel LTTB: neighbor-bucket floor-div mean anchors, exact
    // integer cross-product areas; endpoint buckets keep first/last
    "ts_downsample_lttb" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |         CAST(round(value*100) AS BIGINT) AS v,
        |         MIN(epoch_us(ts)) OVER (PARTITION BY user_id) AS t0,
        |         MAX(epoch_us(ts)) OVER (PARTITION BY user_id) AS t1
        |  FROM events),
        |b AS (SELECT user_id, ts_us, event_id, v,
        |        LEAST(59, (ts_us - t0) * 60 // (t1 - t0 + 1)) AS bucket FROM e),
        |m AS (SELECT user_id, bucket, CAST(COUNT(*) AS BIGINT) AS n_pts,
        |        CAST(SUM(ts_us) // COUNT(*) AS BIGINT) AS mx,
        |        CAST(SUM(v) // COUNT(*) AS BIGINT) AS my
        |      FROM b GROUP BY 1, 2),
        |nb AS (SELECT user_id, bucket, n_pts,
        |         lag(mx) OVER w AS lx, lag(my) OVER w AS ly,
        |         lead(mx) OVER w AS rx, lead(my) OVER w AS ry
        |       FROM m WINDOW w AS (PARTITION BY user_id ORDER BY bucket)),
        |p AS (SELECT b.user_id, b.bucket, b.ts_us, b.event_id, b.v, nb.n_pts,
        |        nb.lx, nb.ly, nb.rx, nb.ry
        |      FROM b JOIN nb ON nb.user_id = b.user_id AND nb.bucket = b.bucket),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, bucket ORDER BY
        |        CASE WHEN lx IS NOT NULL AND rx IS NOT NULL
        |             THEN -abs((lx - ts_us) * (ry - v) - (rx - ts_us) * (ly - v))
        |             ELSE 0 END ASC,
        |        CASE WHEN rx IS NULL AND lx IS NOT NULL THEN -ts_us ELSE ts_us END ASC,
        |        CASE WHEN rx IS NULL AND lx IS NOT NULL THEN -event_id ELSE event_id END ASC) AS rn
        |      FROM p)
        |SELECT user_id, bucket, ts_us AS sel_ts_us, v AS sel_value_c, n_pts
        |FROM r WHERE rn = 1""".stripMargin,
    // textbook sequential LTTB: the recursion walks bucket ordinals,
    // each step's window argmax scores candidates against the chain's
    // PREVIOUS selected point and the next bucket's floor-div mean;
    // last bucket keeps the last point, ties to earliest (ts, eid)
    "ts_downsample_lttb_seq" ->
      """WITH RECURSIVE e AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |         CAST(round(value*100) AS BIGINT) AS v,
        |         MIN(epoch_us(ts)) OVER (PARTITION BY user_id) AS t0,
        |         MAX(epoch_us(ts)) OVER (PARTITION BY user_id) AS t1
        |  FROM events),
        |b AS (SELECT user_id, ts_us, event_id, v,
        |        LEAST(59, (ts_us - t0) * 60 // (t1 - t0 + 1)) AS bucket FROM e),
        |m AS (SELECT user_id, bucket, CAST(COUNT(*) AS BIGINT) AS n_pts,
        |        CAST(SUM(ts_us) // COUNT(*) AS BIGINT) AS mx,
        |        CAST(SUM(v) // COUNT(*) AS BIGINT) AS my
        |      FROM b GROUP BY 1, 2),
        |o AS (SELECT user_id, bucket, n_pts,
        |        CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
        |        LEAD(mx) OVER w AS nx, LEAD(my) OVER w AS ny
        |      FROM m WINDOW w AS (PARTITION BY user_id ORDER BY bucket)),
        |c AS (SELECT b.user_id, b.bucket, b.ts_us, b.event_id, b.v,
        |        o.rn, o.n_pts, o.nx, o.ny
        |      FROM b JOIN o ON o.user_id = b.user_id AND o.bucket = b.bucket),
        |f AS (SELECT user_id, rn, bucket, n_pts, ts_us, v FROM (
        |        SELECT c.*, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS r
        |        FROM c WHERE rn = 1) WHERE r = 1),
        |rec AS (
        |  SELECT user_id, rn, bucket, n_pts, ts_us, v FROM f
        |  UNION ALL
        |  SELECT user_id, rn, bucket, n_pts, ts_us, v FROM (
        |    SELECT c.user_id, c.rn, c.bucket, c.n_pts, c.ts_us, c.v,
        |      ROW_NUMBER() OVER (PARTITION BY c.user_id ORDER BY
        |        CASE WHEN c.nx IS NOT NULL
        |             THEN -abs((r.ts_us - c.nx) * (c.v - r.v) - (r.ts_us - c.ts_us) * (c.ny - r.v))
        |             ELSE 0 END ASC,
        |        CASE WHEN c.nx IS NULL THEN -c.ts_us ELSE c.ts_us END ASC,
        |        CASE WHEN c.nx IS NULL THEN -c.event_id ELSE c.event_id END ASC) AS pick
        |    FROM rec r JOIN c ON c.user_id = r.user_id AND c.rn = r.rn + 1
        |  ) WHERE pick = 1
        |)
        |SELECT user_id, bucket, ts_us AS sel_ts_us, v AS sel_value_c, n_pts
        |FROM rec""".stripMargin,
    "ts_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
        |           WHERE event_type IN ('view', 'click', 'purchase')),
        |v AS (SELECT user_id, MIN(CASE WHEN event_type = 'view' THEN ts_us END) AS view_us
        |      FROM e GROUP BY 1),
        |c AS (SELECT e.user_id, MIN(v.view_us) AS view_us,
        |        MIN(CASE WHEN e.event_type = 'click' AND v.view_us IS NOT NULL
        |                  AND e.ts_us > v.view_us THEN e.ts_us END) AS click_us
        |      FROM e JOIN v ON v.user_id = e.user_id GROUP BY 1),
        |p AS (SELECT e.user_id, MIN(c.view_us) AS view_us, MIN(c.click_us) AS click_us,
        |        MIN(CASE WHEN e.event_type = 'purchase' AND c.click_us IS NOT NULL
        |                  AND e.ts_us > c.click_us THEN e.ts_us END) AS purchase_us
        |      FROM e JOIN c ON c.user_id = e.user_id GROUP BY 1)
        |SELECT user_id, COALESCE(view_us, -1) AS view_us, COALESCE(click_us, -1) AS click_us,
        |  COALESCE(purchase_us, -1) AS purchase_us,
        |  CAST((CASE WHEN view_us IS NOT NULL THEN 1 ELSE 0 END) +
        |       (CASE WHEN click_us IS NOT NULL THEN 1 ELSE 0 END) +
        |       (CASE WHEN purchase_us IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS steps_completed
        |FROM p""".stripMargin,
    // the streaming funnel replayed over the same files must land on
    // the batch funnel exactly
    "ts_funnel_stream" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
        |           WHERE event_type IN ('view', 'click', 'purchase')),
        |v AS (SELECT user_id, MIN(CASE WHEN event_type = 'view' THEN ts_us END) AS view_us
        |      FROM e GROUP BY 1),
        |c AS (SELECT e.user_id, MIN(v.view_us) AS view_us,
        |        MIN(CASE WHEN e.event_type = 'click' AND v.view_us IS NOT NULL
        |                  AND e.ts_us > v.view_us THEN e.ts_us END) AS click_us
        |      FROM e JOIN v ON v.user_id = e.user_id GROUP BY 1),
        |p AS (SELECT e.user_id, MIN(c.view_us) AS view_us, MIN(c.click_us) AS click_us,
        |        MIN(CASE WHEN e.event_type = 'purchase' AND c.click_us IS NOT NULL
        |                  AND e.ts_us > c.click_us THEN e.ts_us END) AS purchase_us
        |      FROM e JOIN c ON c.user_id = e.user_id GROUP BY 1)
        |SELECT user_id, COALESCE(view_us, -1) AS view_us, COALESCE(click_us, -1) AS click_us,
        |  COALESCE(purchase_us, -1) AS purchase_us,
        |  CAST((CASE WHEN view_us IS NOT NULL THEN 1 ELSE 0 END) +
        |       (CASE WHEN click_us IS NOT NULL THEN 1 ELSE 0 END) +
        |       (CASE WHEN purchase_us IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS steps_completed
        |FROM p""".stripMargin,
    // SAX: hourly floor-div PAA, rank-based quartile symbols, ordered
    // symbol string + duplicated-3-gram motif count
    "ts_sax" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 3600000000 AS hour_id,
        |                  CAST(round(value*100) AS BIGINT) AS v FROM events),
        |h AS (SELECT user_id, hour_id, CAST(SUM(v) AS BIGINT) AS s,
        |             CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY 1, 2),
        |p AS (SELECT user_id, hour_id, CAST(s // n AS BIGINT) AS paa FROM h),
        |q AS (SELECT user_id, hour_id, paa,
        |        NTILE(4) OVER (PARTITION BY user_id ORDER BY paa ASC, hour_id ASC) AS qt FROM p),
        |sy AS (SELECT user_id, hour_id,
        |         CASE qt WHEN 1 THEN 'a' WHEN 2 THEN 'b' WHEN 3 THEN 'c' ELSE 'd' END AS sym FROM q),
        |ag AS (SELECT user_id, COUNT(*) AS n_hours,
        |         string_agg(sym, '' ORDER BY hour_id) AS sax FROM sy GROUP BY 1),
        |w AS (SELECT user_id, n_hours, sax,
        |        CASE WHEN length(sax) >= 3
        |             THEN list_transform(generate_series(1, CAST(length(sax) AS BIGINT) - 2),
        |                                 i -> substr(sax, CAST(i AS INTEGER), 3))
        |             ELSE [] END AS wins
        |      FROM ag)
        |SELECT user_id, n_hours, sax,
        |  CAST(len(wins) - len(list_distinct(wins)) AS BIGINT) AS n_dup_motifs
        |FROM w""".stripMargin,
    // exact rank-selected medians kept doubled (med2 = the two middle
    // values summed); flag cross-multiplied: dev·20000 > 44478·mad2
    "ts_mad_outlier" ->
      """WITH e AS (SELECT user_id, event_id,
        |                  CAST(round(value*100) AS BIGINT) AS v FROM events),
        |r AS (SELECT user_id, event_id, v,
        |        CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n,
        |        CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY v, event_id) AS BIGINT) AS rv
        |      FROM e),
        |m AS (SELECT user_id, event_id, v, n,
        |        CAST(SUM(CASE WHEN rv = (n + 1) // 2 THEN v ELSE 0 END) OVER (PARTITION BY user_id)
        |           + SUM(CASE WHEN rv = (n + 2) // 2 THEN v ELSE 0 END) OVER (PARTITION BY user_id)
        |          AS BIGINT) AS med2
        |      FROM r),
        |d AS (SELECT user_id, event_id, v, n, med2, abs(v * 2 - med2) AS dev FROM m),
        |r2 AS (SELECT user_id, v, n, med2, dev,
        |        CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY dev, event_id) AS BIGINT) AS rd
        |      FROM d),
        |m2 AS (SELECT user_id, v, n, med2, dev,
        |        CAST(SUM(CASE WHEN rd = (n + 1) // 2 THEN dev ELSE 0 END) OVER (PARTITION BY user_id)
        |           + SUM(CASE WHEN rd = (n + 2) // 2 THEN dev ELSE 0 END) OVER (PARTITION BY user_id)
        |          AS BIGINT) AS mad2
        |      FROM r2)
        |SELECT user_id, COUNT(*) AS n_points,
        |  CAST(MAX(med2) AS BIGINT) AS med2_c, CAST(MAX(mad2) AS BIGINT) AS mad2_c,
        |  CAST(SUM(CASE WHEN dev * 20000 > mad2 * 44478 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM m2 GROUP BY 1""".stripMargin,
    // capacity extrapolation: cumulative daily totals fit by the same
    // closed-form integer OLS identities as ts_theta_forecast, crossing
    // solved by ceiling division on a positive slope (both engines
    // truncate toward zero, so the +slope-1 trick agrees at any sign)
    "ts_capacity_forecast" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day_id,
        |             CAST(round(value*100) AS BIGINT) AS v FROM events),
        |d AS (SELECT event_type, day_id, CAST(SUM(v) AS BIGINT) AS d_c FROM e GROUP BY 1, 2),
        |o AS (SELECT event_type, day_id, d_c,
        |        CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day_id) AS BIGINT) AS rn,
        |        CAST(SUM(d_c) OVER (PARTITION BY event_type ORDER BY day_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_c
        |      FROM d),
        |f AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days, CAST(MAX(cum_c) AS BIGINT) AS total_c,
        |        CAST(SUM(cum_c) AS BIGINT) AS sm, CAST(SUM(rn * cum_c) AS BIGINT) AS sxm FROM o GROUP BY 1),
        |c AS (SELECT event_type, n_days, total_c, (n_days * (n_days + 1)) // 2 AS srn,
        |        GREATEST((n_days * n_days * (n_days * n_days - 1)) // 12, 1) AS denom, sm, sxm FROM f),
        |s AS (SELECT event_type, n_days, total_c,
        |        CAST((CAST(1000000 AS HUGEINT) * (n_days * sxm - srn * sm)) // denom AS BIGINT) AS slope_micro,
        |        srn, sm FROM c),
        |i AS (SELECT *, CAST((CAST(1000000 AS HUGEINT) * sm - CAST(slope_micro AS HUGEINT) * srn) // n_days AS BIGINT) AS ic,
        |        (total_c * 12 + 9) // 10 AS thr_c FROM s)
        |SELECT event_type, n_days, total_c, slope_micro, CAST(thr_c AS BIGINT) AS thr_c,
        |  CAST(CASE WHEN slope_micro <= 0 THEN -1
        |  ELSE GREATEST(CAST((CAST(thr_c AS HUGEINT) * 1000000 - ic - slope_micro * n_days
        |    + slope_micro - 1) // slope_micro AS BIGINT), 0) END AS BIGINT) AS days_to_thr
        |FROM i""".stripMargin,
    // residual lag-1 ACF after snaive: calendar-aligned RANGE lag-24
    // residuals, exact Pearson numerators, the 1.96/sqrt(n) whiteness
    // band cross-multiplied in HUGEINT
    "ts_residual_acf" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 3600000000 AS hour_id,
        |             CAST(round(value*100) AS BIGINT) AS v FROM events),
        |h AS (SELECT user_id, hour_id, CAST(SUM(v) // COUNT(*) AS BIGINT) AS m
        |      FROM e GROUP BY 1, 2),
        |rr AS (SELECT user_id, hour_id, m,
        |         MAX(m) OVER (PARTITION BY user_id ORDER BY hour_id
        |              RANGE BETWEEN 24 PRECEDING AND 24 PRECEDING) AS m24
        |       FROM h),
        |rs AS (SELECT user_id, hour_id, m - m24 AS r FROM rr WHERE m24 IS NOT NULL),
        |lg AS (SELECT user_id, r,
        |         LAG(r) OVER (PARTITION BY user_id ORDER BY hour_id) AS x
        |       FROM rs),
        |ag AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(r) AS BIGINT) AS sy,
        |         CAST(SUM(x * r) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx,
        |         CAST(SUM(r * r) AS BIGINT) AS syy
        |       FROM lg WHERE x IS NOT NULL GROUP BY 1)
        |SELECT user_id, n_pairs,
        |  CAST(n_pairs * sxy - sx * sy AS BIGINT) AS cov_num,
        |  CAST(n_pairs * sxx - sx * sx AS BIGINT) AS varx_num,
        |  CAST(n_pairs * syy - sy * sy AS BIGINT) AS vary_num,
        |  CAST(CASE WHEN CAST(n_pairs * sxy - sx * sy AS HUGEINT) * (n_pairs * sxy - sx * sy) * n_pairs * 10000
        |    <= CAST(38416 AS HUGEINT) * (n_pairs * sxx - sx * sx) * (n_pairs * syy - sy * sy)
        |    THEN 1 ELSE 0 END AS BIGINT) AS white_lag1
        |FROM ag""".stripMargin,
    // alert fatigue over the z-score verdicts: alerts within 2h merge
    // into episodes via the lag-gap segment counter
    "ts_alert_fatigue" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |                  CAST(round(value*100) AS BIGINT) AS x FROM events),
        |v AS (SELECT event_id, user_id, ts_us, x,
        |        COUNT(*) OVER w AS n,
        |        CAST(SUM(x) OVER w AS BIGINT) AS s,
        |        CAST(SUM(x * x) OVER w AS BIGINT) AS q
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
        |                          ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),
        |a AS (SELECT user_id, ts_us, event_id FROM v
        |      WHERE n >= 20 AND (n * x - s) * (n * x - s) > 9 * (n * q - s * s)),
        |b AS (SELECT user_id, ts_us, event_id,
        |        CASE WHEN lag(ts_us) OVER w2 IS NULL
        |             OR ts_us - lag(ts_us) OVER w2 > 7200000000 THEN 1 ELSE 0 END AS brk
        |      FROM a WINDOW w2 AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |g AS (SELECT user_id, ts_us, event_id,
        |        SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seg
        |      FROM b),
        |ep AS (SELECT user_id, seg, CAST(COUNT(*) AS BIGINT) AS ep_n FROM g GROUP BY 1, 2)
        |SELECT user_id, CAST(SUM(ep_n) AS BIGINT) AS n_alerts,
        |  CAST(COUNT(*) AS BIGINT) AS n_episodes,
        |  CAST(MAX(ep_n) AS BIGINT) AS max_episode,
        |  CAST(SUM(ep_n) * 100 // COUNT(*) AS BIGINT) AS per_episode_centi
        |FROM ep GROUP BY 1""".stripMargin,
    "ts_anomaly_zscore" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |                  CAST(round(value*100) AS BIGINT) AS x FROM events),
        |v AS (SELECT event_id, user_id, ts_us, x,
        |        COUNT(*) OVER w AS n,
        |        CAST(SUM(x) OVER w AS BIGINT) AS s,
        |        CAST(SUM(x * x) OVER w AS BIGINT) AS q
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
        |                          ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
        |SELECT event_id, user_id, ts_us, x AS value_c,
        |  CAST(CASE WHEN (n * x - s) * (n * x - s) > 9 * (n * q - s * s)
        |       THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
        |FROM v WHERE n >= 20""".stripMargin,
    "ts_rate_increase" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |                  CAST(round(value*100) AS BIGINT) AS value_c FROM events),
        |d AS (SELECT user_id, ts_us, value_c - lag(value_c) OVER w AS dv
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id))
        |SELECT user_id, ts_us // 3600000000 AS hour_id, COUNT(*) AS n_deltas,
        |  CAST(SUM(CASE WHEN dv > 0 THEN dv ELSE 0 END) AS BIGINT) AS increase_c,
        |  CAST(SUM(dv) AS BIGINT) AS net_delta_c
        |FROM d WHERE dv IS NOT NULL GROUP BY 1, 2""".stripMargin,
    // reset compensation: a negative delta is a counter restart, and
    // the post-reset value is the true increase since the restart
    "ts_counter_resets" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |                  CAST(round(value*100) AS BIGINT) AS value_c FROM events),
        |d AS (SELECT user_id, ts_us, value_c, value_c - lag(value_c) OVER w AS dv
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id))
        |SELECT user_id, ts_us // 3600000000 AS hour_id, COUNT(*) AS n_deltas,
        |  CAST(SUM(CASE WHEN dv < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_resets,
        |  CAST(SUM(CASE WHEN dv >= 0 THEN dv ELSE value_c END) AS BIGINT) AS adj_increase_c
        |FROM d WHERE dv IS NOT NULL GROUP BY 1, 2""".stripMargin,
    // least-squares slope from the five classic sums; x is the
    // series-relative hour index, cross products in HUGEINT, and both
    // engines' integral division truncates toward zero
    "ts_linear_trend" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 3600000000 AS hour_id,
        |                  CAST(round(value*100) AS BIGINT) AS value_c FROM events),
        |x AS (SELECT user_id, hour_id - MIN(hour_id) OVER (PARTITION BY user_id) AS x,
        |             value_c FROM e),
        |s AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_points,
        |             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(value_c) AS BIGINT) AS sy,
        |             CAST(SUM(x*value_c) AS BIGINT) AS sxy, CAST(SUM(x*x) AS BIGINT) AS sxx
        |      FROM x GROUP BY 1),
        |p AS (SELECT user_id, n_points,
        |             CAST(n_points AS HUGEINT)*sxy - CAST(sx AS HUGEINT)*sy AS num,
        |             CAST(n_points AS HUGEINT)*sxx - CAST(sx AS HUGEINT)*sx AS den
        |      FROM s)
        |SELECT user_id, n_points, CAST(num AS BIGINT) AS slope_num_c,
        |  CAST(den AS BIGINT) AS slope_den,
        |  CASE WHEN den = 0 THEN CAST(0 AS BIGINT)
        |       ELSE CAST((num * 1000000) // den AS BIGINT) END AS slope_micro_c_per_hour
        |FROM p""".stripMargin,
    // multi-window SLO burn: rolling RANGE frames over the hourly
    // counter table, budget comparison cross-multiplied (5% budget)
    "ts_burn_rate" ->
      """WITH h AS (SELECT user_id, epoch_us(ts) // 3600000000 AS hour_id,
        |                  CAST(COUNT(*) AS BIGINT) AS n_total,
        |                  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_err
        |           FROM events GROUP BY 1, 2)
        |SELECT user_id, hour_id,
        |  CAST(SUM(n_err) OVER w6 AS BIGINT) AS err_6h,
        |  CAST(SUM(n_total) OVER w6 AS BIGINT) AS tot_6h,
        |  CAST(SUM(n_err) OVER w24 AS BIGINT) AS err_24h,
        |  CAST(SUM(n_total) OVER w24 AS BIGINT) AS tot_24h,
        |  CASE WHEN SUM(n_err) OVER w6 * 20 > SUM(n_total) OVER w6
        |        AND SUM(n_err) OVER w24 * 20 > SUM(n_total) OVER w24
        |       THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS alert
        |FROM h
        |WINDOW w6 AS (PARTITION BY user_id ORDER BY hour_id
        |              RANGE BETWEEN 5 PRECEDING AND CURRENT ROW),
        |       w24 AS (PARTITION BY user_id ORDER BY hour_id
        |               RANGE BETWEEN 23 PRECEDING AND CURRENT ROW)""".stripMargin,
    // seasonal-residual anomaly: floor-div (type, dow, hod) profile
    // mean joined back, flagged where |residual| > 800 cents
    "ts_anomaly_seasonal" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type,
        |    (epoch_us(ts) // 86400000000 + 4) % 7 AS day_of_week,
        |    (epoch_us(ts) // 3600000000) % 24 AS hour_of_day,
        |    CAST(round(value*100) AS BIGINT) AS v_c FROM events),
        |p AS (SELECT event_type, day_of_week, hour_of_day,
        |    CAST((SUM(v_c) - ((SUM(v_c) % COUNT(*)) + COUNT(*)) % COUNT(*)) // COUNT(*) AS BIGINT) AS base_mean_c
        |  FROM e GROUP BY 1, 2, 3)
        |SELECT event_id, user_id, ts_us, e.event_type, v_c, base_mean_c,
        |  v_c - base_mean_c AS resid_c
        |FROM e JOIN p USING (event_type, day_of_week, hour_of_day)
        |WHERE abs(v_c - base_mean_c) > 800""".stripMargin,
    // minute/hour/day cascade, each level from the previous
    "ts_rollup_cascade" ->
      """WITH m AS (SELECT user_id, epoch_us(ts) // 60000000 AS b1m,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_c,
        |    MIN(CAST(round(value*100) AS BIGINT)) AS min_c,
        |    MAX(CAST(round(value*100) AS BIGINT)) AS max_c
        |  FROM events GROUP BY 1, 2),
        |h AS (SELECT user_id, b1m // 60 AS b1h, CAST(SUM(n) AS BIGINT) AS n,
        |    CAST(SUM(sum_c) AS BIGINT) AS sum_c, MIN(min_c) AS min_c, MAX(max_c) AS max_c
        |  FROM m GROUP BY 1, 2),
        |d AS (SELECT user_id, b1h // 24 AS b1d, CAST(SUM(n) AS BIGINT) AS n,
        |    CAST(SUM(sum_c) AS BIGINT) AS sum_c, MIN(min_c) AS min_c, MAX(max_c) AS max_c
        |  FROM h GROUP BY 1, 2)
        |SELECT '1m' AS level, user_id, b1m * 60000000 AS bucket_start_us, n, sum_c, min_c, max_c FROM m
        |UNION ALL
        |SELECT '1h', user_id, b1h * 3600000000, n, sum_c, min_c, max_c FROM h
        |UNION ALL
        |SELECT '1d', user_id, b1d * 86400000000, n, sum_c, min_c, max_c FROM d""".stripMargin,
    // two-sided level-shift filter: full 8-point windows either side,
    // means compared cross-multiplied in cents
    "ts_step_detect" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |                  CAST(round(value*100) AS BIGINT) AS v_c FROM events),
        |w AS (SELECT user_id, ts_us, event_id,
        |        SUM(v_c) OVER wl AS l_sum, COUNT(*) OVER wl AS l_n,
        |        SUM(v_c) OVER wr AS r_sum, COUNT(*) OVER wr AS r_n
        |      FROM e
        |      WINDOW wl AS (PARTITION BY user_id ORDER BY ts_us, event_id
        |                    ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING),
        |             wr AS (PARTITION BY user_id ORDER BY ts_us, event_id
        |                    ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING))
        |SELECT user_id, ts_us, event_id,
        |  CAST(l_sum AS BIGINT) AS l_sum, CAST(r_sum AS BIGINT) AS r_sum,
        |  CAST(r_sum - l_sum AS BIGINT) AS shift_sum_c
        |FROM w WHERE l_n = 8 AND r_n = 8
        |  AND abs(r_sum * l_n - l_sum * r_n) > 300 * 8 * 8""".stripMargin,
    // event-type transition matrix with per-origin probabilities (bp)
    "ts_path_transitions" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type FROM events),
        |nx AS (SELECT event_type AS from_type,
        |         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS to_type
        |       FROM e),
        |c AS (SELECT from_type, to_type, COUNT(*) AS n
        |      FROM nx WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  CAST(n * 10000 // SUM(n) OVER (PARTITION BY from_type) AS BIGINT) AS p_bp
        |FROM c""".stripMargin,
    // seasonal-naive backtest: hourly floor-div means, lag over each
    // (series, hour-of-day) day sequence, consecutive days only
    "ts_forecast_snaive" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day_id,
        |                  (epoch_us(ts) // 3600000000) % 24 AS hour_of_day,
        |                  CAST(round(value*100) AS BIGINT) AS v_c FROM events),
        |h AS (SELECT user_id, day_id, hour_of_day,
        |        CAST(SUM(v_c) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
        |      FROM e GROUP BY 1, 2, 3),
        |m AS (SELECT user_id, day_id, hour_of_day, CAST((s - ((s % n) + n) % n) // n AS BIGINT) AS mean_c FROM h),
        |l AS (SELECT user_id, day_id, mean_c,
        |        lag(mean_c) OVER wd AS prev_mean_c,
        |        lag(day_id) OVER wd AS prev_day
        |      FROM m
        |      WINDOW wd AS (PARTITION BY user_id, hour_of_day ORDER BY day_id))
        |SELECT user_id, COUNT(*) AS n_pairs,
        |  CAST(SUM(abs(mean_c - prev_mean_c)) AS BIGINT) AS mae_num_c,
        |  CAST(SUM(abs(mean_c - prev_mean_c)) * 1000000 // COUNT(*) AS BIGINT) AS mae_micro
        |FROM l WHERE prev_day = day_id - 1
        |GROUP BY 1""".stripMargin,
    // burst collapse: one kept event per (series, type, minute);
    // report per type
    "ts_event_collapse" ->
      """WITH k AS (SELECT event_type, user_id, epoch_us(ts) // 60000000 AS w,
        |             CAST(COUNT(*) AS BIGINT) AS n_in
        |           FROM events GROUP BY 1, 2, 3)
        |SELECT event_type, CAST(SUM(n_in) AS BIGINT) AS n_events,
        |  CAST(COUNT(*) AS BIGINT) AS n_kept,
        |  CAST((SUM(n_in) - COUNT(*)) * 10000 // SUM(n_in) AS BIGINT) AS collapse_bp
        |FROM k GROUP BY 1""".stripMargin,
    // backfill planner: day-grain coverage vs the series' own range
    "ts_backfill_plan" ->
      """WITH d AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day_id
        |           FROM events GROUP BY 1, 2),
        |l AS (SELECT user_id, day_id,
        |        lag(day_id) OVER (PARTITION BY user_id ORDER BY day_id) AS prev_day
        |      FROM d)
        |SELECT user_id,
        |  CAST(MAX(day_id) - MIN(day_id) + 1 AS BIGINT) AS n_days_expected,
        |  CAST(COUNT(*) AS BIGINT) AS n_days_present,
        |  CAST(MAX(day_id) - MIN(day_id) + 1 - COUNT(*) AS BIGINT) AS n_missing,
        |  CAST(COALESCE(MAX(day_id - prev_day - 1), 0) AS BIGINT) AS longest_missing
        |FROM l GROUP BY 1""".stripMargin,
    // outage report: every silence > 2h as an interval row
    "ts_gap_intervals" ->
      """SELECT user_id, prev_ts AS gap_start_us, ts_us AS gap_end_us,
        |  CAST(ts_us - prev_ts AS BIGINT) AS gap_us
        |FROM (SELECT user_id, epoch_us(ts) AS ts_us,
        |        lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_ts
        |      FROM events)
        |WHERE prev_ts IS NOT NULL AND ts_us - prev_ts > 7200000000""".stripMargin,
    // near-dup pairs straddling the train/valid/test hash split —
    // LSH pairs joined to the split rule, 6 split-pair cells
    "sample_split_leakage" ->
      s"""WITH $shingleCtes,
         |sp AS (SELECT doc_id,
         |        CASE WHEN hv < 204 THEN 'train' WHEN hv < 230 THEN 'valid' ELSE 'test' END AS split
         |      FROM (SELECT doc_id,
         |              (instr('0123456789abcdef', substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16 +
         |              (instr('0123456789abcdef', substr(md5('split:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1) AS hv
         |            FROM documents))
         |SELECT split_lo, split_hi, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |  split_lo <> split_hi AS is_leak
         |FROM (SELECT LEAST(sa.split, sb.split) AS split_lo, GREATEST(sa.split, sb.split) AS split_hi
         |      FROM pairs p JOIN sp sa ON sa.doc_id = p.doc_a JOIN sp sb ON sb.doc_id = p.doc_b)
         |GROUP BY 1, 2""".stripMargin,
    // anomaly vs the snaive backtest residuals: cross-multiplied
    // threshold (|resid|·n > k·Σ|resid|) — no division in the flag
    "ts_anomaly_snaive" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day_id,
        |                  (epoch_us(ts) // 3600000000) % 24 AS hour_of_day,
        |                  CAST(round(value*100) AS BIGINT) AS v_c FROM events),
        |h AS (SELECT user_id, day_id, hour_of_day,
        |        CAST(SUM(v_c) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
        |      FROM e GROUP BY 1, 2, 3),
        |m AS (SELECT user_id, day_id, hour_of_day, CAST((s - ((s % n) + n) % n) // n AS BIGINT) AS mean_c FROM h),
        |l AS (SELECT user_id, day_id, mean_c,
        |        lag(mean_c) OVER wd AS prev_mean_c,
        |        lag(day_id) OVER wd AS prev_day
        |      FROM m
        |      WINDOW wd AS (PARTITION BY user_id, hour_of_day ORDER BY day_id)),
        |p AS (SELECT user_id, abs(mean_c - prev_mean_c) AS resid
        |      FROM l WHERE prev_day = day_id - 1),
        |t AS (SELECT user_id, resid,
        |        CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_pairs,
        |        CAST(SUM(resid) OVER (PARTITION BY user_id) AS BIGINT) AS mae_num_c
        |      FROM p)
        |SELECT user_id, CAST(MAX(n_pairs) AS BIGINT) AS n_pairs,
        |  CAST(MAX(mae_num_c) * 1000000 // MAX(n_pairs) AS BIGINT) AS mae_micro,
        |  CAST(SUM(CASE WHEN resid * n_pairs > 5 * mae_num_c THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
        |  CAST(MAX(resid) AS BIGINT) AS max_abs_resid_c
        |FROM t GROUP BY 1""".stripMargin,
    // the reordering-buffer rate: identical to the batch rate up to
    // the finalization cutoff — the final watermark (max event ms −
    // 30 min), which the oracle recomputes exactly
    "ts_rate_stream_ooo" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |                  CAST(round(value*100) AS BIGINT) AS value_c FROM events),
        |c AS (SELECT ((MAX(ts_us) // 1000) - 1800000) * 1000 AS wm_us FROM e),
        |d AS (SELECT user_id, ts_us, value_c - lag(value_c) OVER w AS dv
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id))
        |SELECT user_id, ts_us // 3600000000 AS hour_id, COUNT(*) AS n_deltas,
        |  CAST(SUM(CASE WHEN dv > 0 THEN dv ELSE 0 END) AS BIGINT) AS increase_c,
        |  CAST(SUM(dv) AS BIGINT) AS net_delta_c
        |FROM d, c WHERE dv IS NOT NULL AND ts_us <= wm_us GROUP BY 1, 2""".stripMargin,
    // the streaming rate must replay to the batch answer exactly
    "ts_rate_stream" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |                  CAST(round(value*100) AS BIGINT) AS value_c FROM events),
        |d AS (SELECT user_id, ts_us, value_c - lag(value_c) OVER w AS dv
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id))
        |SELECT user_id, ts_us // 3600000000 AS hour_id, COUNT(*) AS n_deltas,
        |  CAST(SUM(CASE WHEN dv > 0 THEN dv ELSE 0 END) AS BIGINT) AS increase_c,
        |  CAST(SUM(dv) AS BIGINT) AS net_delta_c
        |FROM d WHERE dv IS NOT NULL GROUP BY 1, 2""".stripMargin,
    "ts_gap_stats" ->
      """WITH d AS (
        |  SELECT user_id, epoch_us(ts) - lag(epoch_us(ts)) OVER w AS delta
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |)
        |SELECT user_id, COUNT(*) AS n_points,
        |  CAST(SUM(CASE WHEN delta > 1800000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps,
        |  MAX(delta) AS max_delta_us, MIN(delta) AS min_delta_us
        |FROM d GROUP BY user_id""".stripMargin,
    "ts_retention" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day_id FROM events),
        |c AS (SELECT user_id, day_id, MIN(day_id) OVER (PARTITION BY user_id) AS cohort_day FROM e)
        |SELECT cohort_day, day_id - cohort_day AS day_offset,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM c GROUP BY 1, 2""".stripMargin,
    "ts_stream_join" ->
      """SELECT p.event_id AS p_event_id, c.event_id AS c_event_id,
        |  epoch_us(p.ts) AS p_ts_us, epoch_us(c.ts) AS c_ts_us
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON c.user_id = p.user_id
        | AND c.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts""".stripMargin,
    // identical semantics (and SQL) to the batch ts_anomaly_zscore —
    // the streamed ring-buffer scoring must reproduce it exactly
    "ts_anomaly_stream" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |                  CAST(round(value*100) AS BIGINT) AS x FROM events),
        |v AS (SELECT event_id, user_id, ts_us, x,
        |        COUNT(*) OVER w AS n,
        |        CAST(SUM(x) OVER w AS BIGINT) AS s,
        |        CAST(SUM(x * x) OVER w AS BIGINT) AS q
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
        |                          ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
        |SELECT event_id, user_id, ts_us, x AS value_c,
        |  CAST(CASE WHEN (n * x - s) * (n * x - s) > 9 * (n * q - s * s)
        |       THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
        |FROM v WHERE n >= 20""".stripMargin,
    // reordering variant: identical verdicts up to the final-watermark
    // finalization cutoff
    "ts_anomaly_stream_ooo" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |                  CAST(round(value*100) AS BIGINT) AS x FROM events),
        |c AS (SELECT ((MAX(ts_us) // 1000) - 1800000) * 1000 AS wm_us FROM e),
        |v AS (SELECT event_id, user_id, ts_us, x,
        |        COUNT(*) OVER w AS n,
        |        CAST(SUM(x) OVER w AS BIGINT) AS s,
        |        CAST(SUM(x * x) OVER w AS BIGINT) AS q
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
        |                          ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
        |SELECT event_id, user_id, ts_us, x AS value_c,
        |  CAST(CASE WHEN (n * x - s) * (n * x - s) > 9 * (n * q - s * s)
        |       THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
        |FROM v, c WHERE n >= 20 AND ts_us <= wm_us""".stripMargin,
    "ts_json_props" ->
      """WITH e AS (SELECT event_type,
        |                  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
        |SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_k,
        |  CAST(SUM(k) AS BIGINT) AS sum_k, MIN(k) AS min_k, MAX(k) AS max_k
        |FROM e GROUP BY 1""".stripMargin,
    // split at ts_changepoint's own CUSUM argmax (same deviation,
    // same tiebreak), before/after truncating-cents means, the sign
    // test counted against the before-mean
    "ts_intervention_eval" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |                  CAST(round(value*100) AS BIGINT) AS v FROM events),
        |p AS (SELECT user_id, ts_us, event_id, v,
        |        CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS BIGINT) AS k,
        |        CAST(SUM(v) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS prefix,
        |        CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n,
        |        CAST(SUM(v) OVER (PARTITION BY user_id) AS BIGINT) AS total
        |      FROM e),
        |cp AS (SELECT user_id, n, k AS cp_k,
        |         CAST(prefix // k AS BIGINT) AS before_mean_c,
        |         CAST(CASE WHEN n > k THEN (total - prefix) // (n - k) ELSE 0 END AS BIGINT) AS after_mean_c
        |       FROM p QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
        |             ORDER BY abs(n * prefix - k * total) DESC, k ASC) = 1)
        |SELECT p.user_id, cp.n, cp.cp_k, cp.n - cp.cp_k AS n_after,
        |  cp.before_mean_c, cp.after_mean_c,
        |  CAST(cp.after_mean_c - cp.before_mean_c AS BIGINT) AS delta_c,
        |  CAST((cp.after_mean_c - cp.before_mean_c) * 10000 // GREATEST(abs(cp.before_mean_c), 1) AS BIGINT) AS rel_bp,
        |  CAST(SUM(CASE WHEN p.k > cp.cp_k AND p.v > cp.before_mean_c THEN 1 ELSE 0 END) AS BIGINT) AS n_after_above
        |FROM p JOIN cp ON cp.user_id = p.user_id
        |GROUP BY 1, 2, 3, 4, 5, 6, 7, 8""".stripMargin,
    "ts_changepoint" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |                  CAST(round(value*100) AS BIGINT) AS value_c FROM events),
        |p AS (SELECT user_id, ts_us,
        |        CAST(ROW_NUMBER() OVER w AS BIGINT) AS k,
        |        CAST(SUM(value_c) OVER w AS BIGINT) AS prefix,
        |        CAST(COUNT(*) OVER v AS BIGINT) AS n,
        |        CAST(SUM(value_c) OVER v AS BIGINT) AS total
        |      FROM e
        |      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING),
        |             v AS (PARTITION BY user_id)),
        |d AS (SELECT user_id, ts_us, k, n, abs(n * prefix - k * total) AS dev FROM p),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY dev DESC, k ASC) AS rn FROM d),
        |m AS (SELECT user_id, MAX(dev) AS max_dev FROM d GROUP BY 1)
        |SELECT r.user_id, r.n, m.max_dev, r.k AS cp_k, r.ts_us AS cp_ts_us
        |FROM r JOIN m ON m.user_id = r.user_id WHERE r.rn = 1""".stripMargin,
    // bucket = FLOOR division (DuckDB's bare `//` truncates toward
    // zero, Spark's plan floors via pmod — subtract the non-negative
    // mod first so `//` divides an exact multiple on both engines)
    "ts_value_histogram" ->
      """WITH e AS (SELECT event_type, CAST(round(value*100) AS BIGINT) AS v FROM events)
        |SELECT event_type, (v - ((v % 500) + 500) % 500) // 500 AS bucket, COUNT(*) AS n,
        |  MIN(v) AS min_c, MAX(v) AS max_c
        |FROM e GROUP BY 1, 2""".stripMargin,
    // value-distribution drift: TV distance between the time-half
    // histograms, cross-multiplied (|c1·n2 − c2·n1| over 2·n1·n2) so
    // no float ever appears; worst bucket ties to the smallest bucket
    "ts_drift_tv" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) AS ts_us,
        |             CAST(round(value*100) AS BIGINT) AS v FROM events),
        |m AS (SELECT (MIN(ts_us) + MAX(ts_us)) // 2 AS mid_us FROM e),
        |h AS (SELECT event_type, (v - ((v % 500) + 500) % 500) // 500 AS bucket,
        |        CAST(SUM(CASE WHEN ts_us <= mid_us THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |        CAST(SUM(CASE WHEN ts_us <= mid_us THEN 0 ELSE 1 END) AS BIGINT) AS c2
        |      FROM e, m GROUP BY 1, 2),
        |t AS (SELECT *, CAST(SUM(c1) OVER (PARTITION BY event_type) AS BIGINT) AS n1,
        |             CAST(SUM(c2) OVER (PARTITION BY event_type) AS BIGINT) AS n2 FROM h),
        |d AS (SELECT event_type, bucket, n1, n2,
        |        abs(CAST(c1 AS HUGEINT) * n2 - CAST(c2 AS HUGEINT) * n1) AS term FROM t),
        |w AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY term DESC, bucket ASC) AS rk FROM d)
        |SELECT event_type, MAX(n1) AS n1, MAX(n2) AS n2, CAST(COUNT(*) AS BIGINT) AS n_buckets,
        |  CAST(CAST(10000 AS HUGEINT) * SUM(term)
        |       // (CAST(2 AS HUGEINT) * greatest(MAX(n1), 1) * greatest(MAX(n2), 1)) AS BIGINT) AS tv_bp,
        |  MAX(CASE WHEN rk = 1 THEN bucket END) AS worst_bucket
        |FROM w GROUP BY 1""".stripMargin,
    // exceedance episodes: exact rank-selected p75 threshold, islands
    // over the exceedance HOURS (gaps break runs), zero books kept
    "ts_exceedance_runs" ->
      """WITH hh AS (SELECT user_id, epoch_us(ts) // 3600000000 AS hour_id,
        |        CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS s,
        |        CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1, 2),
        |b AS (SELECT user_id, hour_id, s // n AS mean_c FROM hh),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY mean_c ASC, hour_id ASC) AS rnk,
        |        COUNT(*) OVER (PARTITION BY user_id) AS nh FROM b),
        |t AS (SELECT user_id, CAST(MAX(nh) AS BIGINT) AS n_hours,
        |        MAX(CASE WHEN rnk = (3 * nh + 3) // 4 THEN mean_c END) AS thr_c FROM r GROUP BY 1),
        |ab AS (SELECT b.user_id, b.hour_id FROM b JOIN t USING (user_id) WHERE b.mean_c > t.thr_c),
        |isl AS (SELECT user_id, hour_id - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY hour_id) AS island FROM ab),
        |ep AS (SELECT user_id, island, CAST(COUNT(*) AS BIGINT) AS len FROM isl GROUP BY 1, 2),
        |agg AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_episodes, MAX(len) AS longest_run,
        |          CAST(SUM(len) AS BIGINT) AS exceed_hours FROM ep GROUP BY 1)
        |SELECT t.user_id, t.n_hours, t.thr_c,
        |  CAST(COALESCE(agg.n_episodes, 0) AS BIGINT) AS n_episodes,
        |  CAST(COALESCE(agg.longest_run, 0) AS BIGINT) AS longest_run,
        |  CAST(COALESCE(agg.exceed_hours, 0) AS BIGINT) AS exceed_hours
        |FROM t LEFT JOIN agg USING (user_id)""".stripMargin,
    // significant error spikes: the z=2 test cross-multiplied to
    // (e·N − n·E)²·n > 4·e·(n−e)·N² — rational, no sqrt, no float
    "ts_error_spikes" ->
      """WITH hh AS (SELECT user_id, epoch_us(ts) // 3600000000 AS hour_id,
        |        CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS e,
        |        CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1, 2),
        |base AS (SELECT CAST(SUM(e) AS BIGINT) AS be, CAST(SUM(n) AS BIGINT) AS bn FROM hh),
        |s AS (SELECT hh.*, base.be, base.bn,
        |        CASE WHEN CAST(e AS HUGEINT) * bn - CAST(n AS HUGEINT) * be > 0
        |              AND (CAST(e AS HUGEINT) * bn - CAST(n AS HUGEINT) * be)
        |                * (CAST(e AS HUGEINT) * bn - CAST(n AS HUGEINT) * be) * n
        |                > CAST(4 AS HUGEINT) * e * (n - e) * bn * bn
        |             THEN 1 ELSE 0 END AS sig,
        |        (e * 10000) // n - (be * 10000) // bn AS excess_bp
        |      FROM hh, base)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_hours,
        |  CAST(SUM(CASE WHEN e > 0 THEN 1 ELSE 0 END) AS BIGINT) AS err_hours,
        |  CAST(SUM(sig) AS BIGINT) AS n_sig_hours,
        |  CAST(COALESCE(MAX(CASE WHEN sig = 1 THEN excess_bp END), 0) AS BIGINT) AS max_sig_excess_bp,
        |  CAST(MAX(bn) AS BIGINT) AS fleet_n
        |FROM s GROUP BY 1""".stripMargin,
    // persistence-forecast error vs horizon: TIME-lag alignment (the
    // hour_id + h equi-join), truncating milli MAE
    "ts_backtest_horizon" ->
      """WITH hh AS (SELECT user_id, epoch_us(ts) // 3600000000 AS hour_id,
        |        CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS s,
        |        CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1, 2),
        |b AS (SELECT user_id, hour_id, s // n AS mean_c FROM hh),
        |p AS (SELECT user_id, hour_id + h AS hour_id, CAST(h AS BIGINT) AS h, mean_c AS pred_c
        |      FROM b, (SELECT unnest(generate_series(1, 6)) AS h)),
        |j AS (SELECT p.h, abs(b.mean_c - p.pred_c) AS ae FROM p JOIN b USING (user_id, hour_id))
        |SELECT h, CAST(COUNT(*) AS BIGINT) AS n_pairs, CAST(SUM(ae) AS BIGINT) AS sae_c,
        |  CAST(CAST(SUM(ae) AS HUGEINT) * 1000 // COUNT(*) AS BIGINT) AS mae_milli_c
        |FROM j GROUP BY 1""".stripMargin,
    // event-type mix diversity: Gini-Simpson (n²−Σc²)/n² and the
    // order-2 Hill number n²/Σc², both exact rationals in the counts;
    // top type ties break to the lexically larger type (struct max)
    "ts_mix_diversity" ->
      """WITH c AS (SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY 1, 2),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY c DESC, event_type DESC) AS rk FROM c),
        |a AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_types, CAST(SUM(c) AS BIGINT) AS n_events,
        |        CAST(SUM(c * c) AS BIGINT) AS ssq,
        |        MAX(CASE WHEN rk = 1 THEN event_type END) AS top_type,
        |        MAX(CASE WHEN rk = 1 THEN c END) AS top_c
        |      FROM r GROUP BY 1)
        |SELECT user_id, n_types, n_events,
        |  CAST(CAST(10000 AS HUGEINT) * (CAST(n_events AS HUGEINT) * n_events - ssq)
        |       // (CAST(n_events AS HUGEINT) * n_events) AS BIGINT) AS gini_simpson_bp,
        |  CAST(CAST(100 AS HUGEINT) * n_events * n_events // CAST(ssq AS HUGEINT) AS BIGINT) AS eff_types_centi,
        |  top_type,
        |  CAST(top_c * 10000 // n_events AS BIGINT) AS top_share_bp
        |FROM a""".stripMargin,
    // PromQL histogram_quantile: walk cumulative bucket counts to the
    // ceil(q·total) rank, interpolate linearly inside the landing
    // bucket. The streaming variant aggregates the same histogram as
    // streaming state, so both share the oracle.
    "ts_histogram_quantile" -> histQuantOracleSql,
    "ts_histquant_stream" -> histQuantOracleSql,
    "ts_topk_per_window" ->
      """WITH h AS (SELECT epoch_us(ts) // 3600000000 AS hour_id, user_id, COUNT(*) AS n_events
        |           FROM events GROUP BY 1, 2)
        |SELECT hour_id, user_id, n_events,
        |  CAST(RANK() OVER (PARTITION BY hour_id ORDER BY n_events DESC, user_id ASC) AS BIGINT) AS rnk
        |FROM h QUALIFY rnk <= 3""".stripMargin,
    // append-mode leaderboard: only hours finalized by the final
    // watermark (window end at or below it) may rank
    "ts_topk_stream" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
        |c AS (SELECT ((MAX(ts_us) // 1000) - 1800000) * 1000 AS wm_us FROM e),
        |h AS (SELECT ts_us // 3600000000 AS hour_id, user_id, COUNT(*) AS n_events
        |      FROM e GROUP BY 1, 2),
        |f AS (SELECT h.* FROM h, c WHERE (hour_id + 1) * 3600000000 <= wm_us)
        |SELECT hour_id, user_id, n_events,
        |  CAST(RANK() OVER (PARTITION BY hour_id ORDER BY n_events DESC, user_id ASC) AS BIGINT) AS rnk
        |FROM f QUALIFY rnk <= 3""".stripMargin,
    // α=1/2 EWMA truncated at 16 points: power-of-two weights as 16
    // explicit lag terms; denominator counts only present terms. The
    // streaming dual emits identical integers (ring-buffer state),
    // so both share the oracle.
    "ts_ewma" -> ewmaOracleSql,
    "ts_ewma_stream" -> ewmaOracleSql,
    "ts_ewma_stream_ooo" -> ewmaOooOracleSql,
    "ts_cross_corr" ->
      """WITH h AS (
        |  SELECT user_id, epoch_us(ts) // 3600000000 AS hour_id,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS x,
        |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2
        |), m AS (
        |  SELECT user_id, COUNT(*) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(x * y) AS BIGINT) AS sxy,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(y * y) AS BIGINT) AS syy
        |  FROM h GROUP BY 1
        |)
        |SELECT user_id, n, sx, sy,
        |  n * sxy - sx * sy AS cov_num,
        |  n * sxx - sx * sx AS varx_num,
        |  n * syy - sy * sy AS vary_num
        |FROM m""".stripMargin,
    // lag-1 autocorrelation over observed hourly samples, integer
    // numerators only (the sqrt stays with the caller)
    "ts_autocorr" ->
      """WITH h AS (
        |  SELECT user_id, epoch_us(ts) // 3600000000 AS hour_id,
        |    CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2
        |), p AS (
        |  SELECT user_id, v, lag(v) OVER (PARTITION BY user_id ORDER BY hour_id) AS x FROM h
        |)
        |SELECT user_id, COUNT(*) AS n_pairs,
        |  CAST(COUNT(*) * SUM(x*v) - SUM(x) * SUM(v) AS BIGINT) AS cov_num,
        |  CAST(COUNT(*) * SUM(x*x) - SUM(x) * SUM(x) AS BIGINT) AS varx_num,
        |  CAST(COUNT(*) * SUM(v*v) - SUM(v) * SUM(v) AS BIGINT) AS vary_num
        |FROM p WHERE x IS NOT NULL GROUP BY 1""".stripMargin,
    // Yule-Walker AR(2) over mean-centered hourly sums: truncated
    // integer mean, lag-2-aligned support, r's clamped to [-1e4, 1e4],
    // one exact bp division per phi; DuckDB // and Spark DIV both
    // truncate toward zero so the negative ratios agree
    "ts_ar_fit" ->
      """WITH h AS (
        |  SELECT user_id, epoch_us(ts) // 3600000000 AS v_hour,
        |    CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2
        |), m AS (
        |  SELECT user_id, v_hour, v,
        |    CAST(SUM(v) OVER (PARTITION BY user_id) AS BIGINT) // COUNT(v) OVER (PARTITION BY user_id) AS mean_v
        |  FROM h
        |), d AS (
        |  SELECT user_id, v - mean_v AS dx,
        |    lag(v - mean_v, 1) OVER w AS d1, lag(v - mean_v, 2) OVER w AS d2
        |  FROM m WINDOW w AS (PARTITION BY user_id ORDER BY v_hour)
        |), s AS (
        |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_obs,
        |    CAST(SUM(dx * dx) AS BIGINT) AS sdd,
        |    CAST(SUM(dx * d1) AS BIGINT) AS s1,
        |    CAST(SUM(dx * d2) AS BIGINT) AS s2
        |  FROM d WHERE d2 IS NOT NULL GROUP BY 1
        |), r AS (
        |  SELECT *, GREATEST(LEAST(s1 * 10000 // GREATEST(sdd, 1), 10000), -10000) AS r1_bp,
        |    GREATEST(LEAST(s2 * 10000 // GREATEST(sdd, 1), 10000), -10000) AS r2_bp
        |  FROM s
        |), y AS (SELECT *, GREATEST(100000000 - r1_bp * r1_bp, 1) AS yw_den FROM r)
        |SELECT user_id, n_obs, sdd, s1, s2,
        |  CAST(r1_bp AS BIGINT) AS r1_bp, CAST(r2_bp AS BIGINT) AS r2_bp,
        |  CAST(r1_bp * (10000 - r2_bp) * 10000 // yw_den AS BIGINT) AS phi1_bp,
        |  CAST((r2_bp * 10000 - r1_bp * r1_bp) * 10000 // yw_den AS BIGINT) AS phi2_bp
        |FROM y""".stripMargin,
    // ACF argmax over TIME lags 2..25 on mean-centered hourly sums,
    // full-series Σdx² denominator, ties to the smallest lag
    "ts_period_detect" ->
      """WITH h AS (SELECT user_id, epoch_us(ts) // 3600000000 AS hour_id,
        |             CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS v
        |           FROM events GROUP BY 1, 2),
        |m AS (SELECT user_id, hour_id,
        |        v - CAST(SUM(v) OVER (PARTITION BY user_id) AS BIGINT) // COUNT(v) OVER (PARTITION BY user_id) AS dx
        |      FROM h),
        |s AS (SELECT user_id, CAST(SUM(dx * dx) AS BIGINT) AS sdd FROM m GROUP BY 1),
        |c AS (SELECT a.user_id, l.lg, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |        CAST(SUM(a.dx * b.dx) AS BIGINT) AS sxy
        |      FROM m a
        |      CROSS JOIN (SELECT unnest(generate_series(2, 25)) AS lg) l
        |      JOIN m b ON b.user_id = a.user_id AND b.hour_id = a.hour_id - l.lg
        |      GROUP BY 1, 2),
        |r AS (SELECT c.user_id, c.lg, c.n_pairs,
        |        GREATEST(LEAST(sxy * 10000 // GREATEST(s.sdd, 1), 10000), -10000) AS r_bp
        |      FROM c JOIN s ON s.user_id = c.user_id)
        |SELECT user_id, CAST(lg AS BIGINT) AS best_lag, CAST(r_bp AS BIGINT) AS r_bp, n_pairs
        |FROM r QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY r_bp DESC, lg ASC) = 1""".stripMargin,
    // integer Haar pyramid: 3 unrolled lifting levels over the hourly
    // sums; (a+b)//2 and Spark's (a+b) DIV 2 both truncate toward
    // zero, odd tails carry unchanged, so the pyramid replays
    // bit-identically level by level
    "ts_wavelet_haar" ->
      """WITH h AS (
        |  SELECT user_id, epoch_us(ts) // 3600000000 AS hour_id,
        |    CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |l0 AS (SELECT user_id, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY hour_id) - 1 AS idx, v FROM h),
        |p1 AS (SELECT user_id, idx // 2 AS p,
        |         MAX(CASE WHEN idx % 2 = 0 THEN v END) AS a,
        |         MAX(CASE WHEN idx % 2 = 1 THEN v END) AS b
        |       FROM l0 GROUP BY 1, 2),
        |l1 AS (SELECT user_id, p AS idx, CASE WHEN b IS NULL THEN a ELSE (a + b) // 2 END AS v FROM p1),
        |p2 AS (SELECT user_id, idx // 2 AS p,
        |         MAX(CASE WHEN idx % 2 = 0 THEN v END) AS a,
        |         MAX(CASE WHEN idx % 2 = 1 THEN v END) AS b
        |       FROM l1 GROUP BY 1, 2),
        |l2 AS (SELECT user_id, p AS idx, CASE WHEN b IS NULL THEN a ELSE (a + b) // 2 END AS v FROM p2),
        |p3 AS (SELECT user_id, idx // 2 AS p,
        |         MAX(CASE WHEN idx % 2 = 0 THEN v END) AS a,
        |         MAX(CASE WHEN idx % 2 = 1 THEN v END) AS b
        |       FROM l2 GROUP BY 1, 2)
        |SELECT user_id, CAST(1 AS BIGINT) AS level, CAST(COUNT(*) AS BIGINT) AS n_details,
        |  CAST(SUM((a - b) * (a - b)) AS BIGINT) AS energy
        |FROM p1 WHERE b IS NOT NULL GROUP BY 1
        |UNION ALL
        |SELECT user_id, CAST(2 AS BIGINT), CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM((a - b) * (a - b)) AS BIGINT)
        |FROM p2 WHERE b IS NOT NULL GROUP BY 1
        |UNION ALL
        |SELECT user_id, CAST(3 AS BIGINT), CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM((a - b) * (a - b)) AS BIGINT)
        |FROM p3 WHERE b IS NOT NULL GROUP BY 1""".stripMargin,
    "ts_seasonal_profile" -> seasonalProfileOracle,
    // the streamed profile drains to the identical table (count/sum
    // additive, min/max idempotent-commutative) — shared oracle
    "ts_seasonal_profile_stream" -> seasonalProfileOracle,
    "ts_twa_daily" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |                  epoch_us(ts) // 86400000000 AS day_id,
        |                  CAST(round(value*100) AS BIGINT) AS value_c FROM events),
        |h AS (SELECT user_id, day_id, ts_us, value_c,
        |        COALESCE(lead(ts_us) OVER w, (day_id + 1) * 86400000000) - ts_us AS hold_us
        |      FROM e WINDOW w AS (PARTITION BY user_id, day_id ORDER BY ts_us, event_id))
        |SELECT user_id, day_id, COUNT(*) AS n,
        |  CAST(SUM(value_c * hold_us) AS BIGINT) AS twa_num,
        |  (day_id + 1) * 86400000000 - MIN(ts_us) AS twa_den
        |FROM h GROUP BY user_id, day_id""".stripMargin,
    "ts_percentiles" ->
      """WITH e AS (SELECT event_type, CAST(round(value*100) AS BIGINT) AS value_c FROM events),
        |r AS (SELECT event_type, value_c,
        |        ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value_c) AS rnk,
        |        COUNT(*) OVER (PARTITION BY event_type) AS n
        |      FROM e)
        |SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
        |  MAX(CASE WHEN rnk = CAST(ceil(0.5 * n) AS BIGINT) THEN value_c END) AS p50_c,
        |  MAX(CASE WHEN rnk = CAST(ceil(0.9 * n) AS BIGINT) THEN value_c END) AS p90_c,
        |  MAX(CASE WHEN rnk = CAST(ceil(0.99 * n) AS BIGINT) THEN value_c END) AS p99_c
        |FROM r GROUP BY event_type""".stripMargin,
    // ship-latency SLA percentiles per priority — the per-row
    // ROW_NUMBER replay of the ceil(p*n) rank pick
    "rel_latency_percentiles" ->
      """WITH e AS (SELECT o_orderpriority,
        |    CAST(CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE) AS BIGINT) AS days
        |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey),
        |r AS (SELECT o_orderpriority, days,
        |        ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY days) AS rnk,
        |        COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
        |      FROM e)
        |SELECT o_orderpriority, CAST(MAX(n) AS BIGINT) AS n,
        |  MAX(CASE WHEN rnk = CAST(ceil(0.5 * n) AS BIGINT) THEN days END) AS p50_days,
        |  MAX(CASE WHEN rnk = CAST(ceil(0.9 * n) AS BIGINT) THEN days END) AS p90_days,
        |  MAX(CASE WHEN rnk = CAST(ceil(0.99 * n) AS BIGINT) THEN days END) AS p99_days
        |FROM r GROUP BY o_orderpriority""".stripMargin,
    // the HDR sketch tier next to the exact tier above — shared by the
    // batch sketch and its streaming dual (additive counters + shared
    // probe code)
    "approx_hdr_latency" -> hdrOracleSql,
    "approx_hdr_stream" -> hdrOracleSql,
    // gaps-and-islands: island id = month_id − row_number, longest
    // streak ties to the earliest start
    "rel_gap_islands" ->
      """WITH m AS (SELECT DISTINCT o_custkey,
        |        CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT) AS month_id FROM orders),
        |i AS (SELECT o_custkey, month_id,
        |        month_id - ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY month_id) AS island FROM m),
        |s AS (SELECT o_custkey, island, CAST(COUNT(*) AS BIGINT) AS len,
        |             MIN(month_id) AS start_month FROM i GROUP BY 1, 2),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY len DESC, start_month ASC) AS rk FROM s)
        |SELECT o_custkey, CAST(SUM(len) AS BIGINT) AS n_active_months, CAST(COUNT(*) AS BIGINT) AS n_islands,
        |  MAX(CASE WHEN rk = 1 THEN len END) AS longest_months,
        |  MAX(CASE WHEN rk = 1 THEN start_month END) AS longest_start_month
        |FROM r GROUP BY 1""".stripMargin,
    // revenue concentration per nation: HHI cross-multiplied to
    // 10⁴·Σrev²/total² on HUGEINT, CR-k shares off the rank window
    // decile gains/lift: NTILE(10) with the (spend desc, custkey)
    // total order, the ratios cross-multiplied in HUGEINT exactly as
    // the Spark side rides DECIMAL(38,0)
    "rel_decile_lift" ->
      """WITH spend AS (SELECT o_custkey,
        |         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS spend_c
        |       FROM orders GROUP BY 1),
        |ret AS (SELECT o_custkey,
        |          CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS ret_c
        |        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |        WHERE l_returnflag = 'R' GROUP BY 1),
        |base AS (SELECT c_mktsegment, c_custkey,
        |           COALESCE(s.spend_c, 0) AS spend_c, COALESCE(r.ret_c, 0) AS ret_c
        |         FROM customer c LEFT JOIN spend s ON s.o_custkey = c.c_custkey
        |         LEFT JOIN ret r ON r.o_custkey = c.c_custkey),
        |dec AS (SELECT c_mktsegment,
        |          CAST(NTILE(10) OVER (PARTITION BY c_mktsegment
        |                               ORDER BY spend_c DESC, c_custkey ASC) AS BIGINT) AS decile,
        |          spend_c, ret_c FROM base),
        |g AS (SELECT c_mktsegment, decile, CAST(COUNT(*) AS BIGINT) AS n_cust,
        |        CAST(SUM(spend_c) AS BIGINT) AS spend_c, CAST(SUM(ret_c) AS BIGINT) AS ret_c
        |      FROM dec GROUP BY 1, 2),
        |w AS (SELECT *,
        |        CAST(SUM(n_cust) OVER (PARTITION BY c_mktsegment ORDER BY decile
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cust,
        |        CAST(SUM(ret_c) OVER (PARTITION BY c_mktsegment ORDER BY decile
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_ret,
        |        CAST(SUM(n_cust) OVER (PARTITION BY c_mktsegment) AS BIGINT) AS seg_cust,
        |        CAST(SUM(ret_c) OVER (PARTITION BY c_mktsegment) AS BIGINT) AS seg_ret
        |      FROM g)
        |SELECT c_mktsegment, decile, n_cust, spend_c, ret_c,
        |  CAST((CAST(cum_ret AS HUGEINT) * 10000) // GREATEST(seg_ret, 1) AS BIGINT) AS capture_bp,
        |  CAST((CAST(cum_ret AS HUGEINT) * seg_cust * 100)
        |    // GREATEST(CAST(seg_ret AS HUGEINT) * cum_cust, 1) AS BIGINT) AS lift_centi
        |FROM w""".stripMargin,
    // last-touch attribution: LAST_VALUE IGNORE NULLS over the
    // strictly-preceding frame, 'direct' when no touch exists; the
    // streaming dual drains to the identical per-channel rollup
    "rel_attribution" -> attributionOracleSql,
    "rel_attribution_stream" -> attributionOracleSql,
    "rel_concentration" ->
      """WITH rev AS (SELECT o_custkey, CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_c
        |             FROM orders GROUP BY 1),
        |bc AS (SELECT n.n_name, rev.o_custkey, rev.rev_c
        |       FROM rev JOIN customer c ON c.c_custkey = rev.o_custkey
        |       JOIN nation n ON n.n_nationkey = c.c_nationkey),
        |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY rev_c DESC, o_custkey ASC) AS rk FROM bc)
        |SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_customers, CAST(SUM(rev_c) AS BIGINT) AS total_c,
        |  CAST(CAST(SUM(CASE WHEN rk <= 1 THEN rev_c ELSE 0 END) AS HUGEINT) * 10000 // SUM(rev_c) AS BIGINT) AS cr1_bp,
        |  CAST(CAST(SUM(CASE WHEN rk <= 3 THEN rev_c ELSE 0 END) AS HUGEINT) * 10000 // SUM(rev_c) AS BIGINT) AS cr3_bp,
        |  CAST(CAST(10000 AS HUGEINT) * SUM(CAST(rev_c AS HUGEINT) * rev_c)
        |       // (CAST(SUM(rev_c) AS HUGEINT) * SUM(rev_c)) AS BIGINT) AS hhi_bp
        |FROM rk GROUP BY 1""".stripMargin,
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
    // bounded as-of: DuckDB's ASOF finds the latest prior click; the
    // tolerance is a post-condition on the matched timestamp (the
    // latest prior click is in-window iff any admissible one is)
    "ts_asof_tolerance" ->
      """SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
        |  COALESCE(CASE WHEN epoch_us(p.ts) - epoch_us(c.ts) <= 3600000000
        |                THEN epoch_us(c.ts) END, -1) AS click_ts_us
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin,
    // nearest-in-time as-of: the oracle replays the same two-frame
    // union-interleave (prev inclusive of same-ts clicks via the kind
    // sort, next exclusive), tie to the earlier side
    "ts_asof_nearest" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |        CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS kind
        |      FROM events WHERE event_type IN ('click', 'purchase')),
        |w AS (SELECT *,
        |  MAX(CASE WHEN kind = 0 THEN ts_us END) OVER (PARTITION BY user_id ORDER BY ts_us, kind, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_ts,
        |  MIN(CASE WHEN kind = 0 THEN ts_us END) OVER (PARTITION BY user_id ORDER BY ts_us, kind, event_id
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_ts
        |  FROM e)
        |SELECT event_id, user_id, ts_us,
        |  CAST(CASE WHEN prev_ts IS NULL AND next_ts IS NULL THEN -1
        |       WHEN next_ts IS NULL THEN prev_ts
        |       WHEN prev_ts IS NULL THEN next_ts
        |       WHEN ts_us - prev_ts <= next_ts - ts_us THEN prev_ts
        |       ELSE next_ts END AS BIGINT) AS click_ts_us
        |FROM w WHERE kind = 1""".stripMargin,
    // interval join: the oracle states the range predicate literally;
    // the Spark side reaches the same rows through the bucketed
    // equi-join (window length == bucket width, residual range filter)
    "ts_range_join" -> rangeJoinOracleSql,
    // the streaming drain is the same row set — shared oracle
    "ts_range_join_stream" -> rangeJoinOracleSql,
    // compaction: n_blocks == DISTINCT days iff every fragmented
    // (series, day) collapsed back to ONE block; the point summary is
    // the lossless-roundtrip check over the same store
    "ts_store_compact" ->
      """SELECT user_id,
        |  CAST(COUNT(DISTINCT epoch_us(ts) // 86400000000) AS BIGINT) AS n_blocks,
        |  COUNT(*) AS n_points,
        |  MIN(epoch_us(ts)) AS min_ts_us, MAX(epoch_us(ts)) AS max_ts_us,
        |  CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c
        |FROM events GROUP BY user_id""".stripMargin,
    "ts_store_roundtrip" -> storeRoundtripOracleSql,
    // the CSV front door must land on the identical per-series summary
    // as the parquet ingest — hence the shared oracle
    "ts_ingest_csv" -> storeRoundtripOracleSql,
    // the zone-map read: the oracle filters the RAW events with the
    // same time range + value band the store read prunes blocks for
    "ts_store_value_read" ->
      """SELECT user_id, COUNT(*) AS n_points,
        |  MIN(epoch_us(ts)) AS min_ts_us, MAX(epoch_us(ts)) AS max_ts_us,
        |  CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-15 00:00:00'
        |  AND CAST(round(value*100) AS BIGINT) BETWEEN 9000 AND 12000
        |GROUP BY user_id""".stripMargin,
    // mode-select roundtrip: the running-total tag exercises the
    // zigzag-delta decode path, the jittery ramp tag the
    // delta-of-delta path; the oracle recomputes all three tags from
    // raw events, so loss in any mode fails the hash
    "ts_store_counter_roundtrip" ->
      """WITH c AS (SELECT user_id, value_c,
        |  SUM(value_c) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS counter_c,
        |  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) * 1000 + event_id % 7 AS trend_c
        |  FROM (SELECT user_id, ts, event_id, CAST(round(value*100) AS BIGINT) AS value_c FROM events))
        |SELECT user_id, COUNT(*) AS n_points,
        |  CAST(SUM(value_c) AS BIGINT) AS sum_value_c,
        |  CAST(SUM(counter_c) AS BIGINT) AS sum_counter_c,
        |  CAST(MAX(counter_c) AS BIGINT) AS max_counter_c,
        |  CAST(SUM(trend_c) AS BIGINT) AS sum_trend_c,
        |  CAST(MAX(trend_c) AS BIGINT) AS max_trend_c
        |FROM c GROUP BY 1""".stripMargin,
    // the pushdown aggregate must equal the raw-events aggregate for
    // all three tags — i.e. for all three encoding modes' closed-form
    // block sums — without ever decoding a point
    // the facade's COMPLETE aggregate pushdown: same numbers the raw
    // events produce, computed from block metadata + mode algebra
    "ts_store_format_agg" ->
      """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_points,
        |  CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c,
        |  CAST(MIN(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS min_value_c,
        |  CAST(MAX(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS max_value_c,
        |  CAST(MIN(epoch_us(ts)) AS BIGINT) AS min_ts_us,
        |  CAST(MAX(epoch_us(ts)) AS BIGINT) AS max_ts_us
        |FROM events GROUP BY user_id""".stripMargin,
    // the write facade's roundtrip: overwrite first half, append the
    // second, read back through the format — oracle is the raw table
    "ts_store_format_write" ->
      """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_points,
        |  CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c,
        |  CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
        |  CAST(MIN(epoch_us(ts)) AS BIGINT) AS min_ts_us,
        |  CAST(MAX(epoch_us(ts)) AS BIGINT) AS max_ts_us
        |FROM events GROUP BY user_id""".stripMargin,
    // the streaming write door (writeStream sink, exactly-once blocks)
    // must land the identical store the batch writer lands — shared
    // oracle by design
    "ts_store_stream_write" ->
      """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_points,
        |  CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c,
        |  CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
        |  CAST(MIN(epoch_us(ts)) AS BIGINT) AS min_ts_us,
        |  CAST(MAX(epoch_us(ts)) AS BIGINT) AS max_ts_us
        |FROM events GROUP BY user_id""".stripMargin,
    // stream -> catalog composition: same rows, landed as one snapshot
    // commit per micro-batch — shared oracle with the other write doors
    "ts_store_stream_commit" ->
      """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_points,
        |  CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c,
        |  CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
        |  CAST(MIN(epoch_us(ts)) AS BIGINT) AS min_ts_us,
        |  CAST(MAX(epoch_us(ts)) AS BIGINT) AS max_ts_us
        |FROM events GROUP BY user_id""".stripMargin,
    // the SQL write door (CTAS + INSERT INTO) must land the identical
    // store the DataFrame writer lands — shared oracle by design
    "ts_store_sql_write" ->
      """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_points,
        |  CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c,
        |  CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
        |  CAST(MIN(epoch_us(ts)) AS BIGINT) AS min_ts_us,
        |  CAST(MAX(epoch_us(ts)) AS BIGINT) AS max_ts_us
        |FROM events GROUP BY user_id""".stripMargin,
    // SQL INSERT on the VERSIONED root — same rows, landed as a delta
    // version commit; shared oracle with the other write doors
    "ts_store_catalog_write" ->
      """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_points,
        |  CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c,
        |  CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
        |  CAST(MIN(epoch_us(ts)) AS BIGINT) AS min_ts_us,
        |  CAST(MAX(epoch_us(ts)) AS BIGINT) AS max_ts_us
        |FROM events GROUP BY user_id""".stripMargin,
    "ts_store_agg_pushdown" ->
      """WITH c AS (SELECT user_id, ts, event_id,
        |             CAST(round(value*100) AS BIGINT) AS value_c FROM events),
        |w AS (SELECT user_id, value_c,
        |        SUM(value_c) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS counter_c,
        |        ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) * 1000 + event_id % 7 AS trend_c
        |      FROM c)
        |SELECT user_id, COUNT(*) AS n_points,
        |  CAST(SUM(value_c) AS BIGINT) AS sum_value_c,
        |  CAST(MIN(value_c) AS BIGINT) AS min_value_c,
        |  CAST(MAX(value_c) AS BIGINT) AS max_value_c,
        |  CAST(SUM(counter_c) AS BIGINT) AS sum_counter_c,
        |  CAST(MIN(counter_c) AS BIGINT) AS min_counter_c,
        |  CAST(MAX(counter_c) AS BIGINT) AS max_counter_c,
        |  CAST(SUM(trend_c) AS BIGINT) AS sum_trend_c,
        |  CAST(MIN(trend_c) AS BIGINT) AS min_trend_c,
        |  CAST(MAX(trend_c) AS BIGINT) AS max_trend_c
        |FROM w GROUP BY 1""".stripMargin,
    // hybrid layout + block-ALIGNED range: pruning, closed-form
    // aggregation, and bucket-colocated grouping compose to a
    // zero-exchange plan; oracle = the raw whole-day range aggregate
    "ts_store_hybrid_agg" ->
      """SELECT user_id, COUNT(*) AS n_points,
        |  CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c,
        |  MIN(CAST(round(value*100) AS BIGINT)) AS min_value_c,
        |  MAX(CAST(round(value*100) AS BIGINT)) AS max_value_c
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-22 00:00:00'
        |GROUP BY 1""".stripMargin,
    // misaligned range: both edges exercise the boundary-decode path,
    // the interior stays closed-form; oracle = the raw range aggregate
    "ts_store_agg_range" ->
      """SELECT user_id, COUNT(*) AS n_points,
        |  CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c,
        |  MIN(CAST(round(value*100) AS BIGINT)) AS min_value_c,
        |  MAX(CAST(round(value*100) AS BIGINT)) AS max_value_c
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-08 12:00:00' AND ts < TIMESTAMP '2024-01-21 12:00:00'
        |GROUP BY 1""".stripMargin,
    // upsert: the oracle applies the same +1000 correction to the
    // raw week-2 events — lost updates, duplicates, or corrupted
    // untouched blocks all break count or sum
    "ts_store_upsert" ->
      """SELECT user_id, COUNT(*) AS n_points,
        |  CAST(SUM(CAST(round(value*100) AS BIGINT)
        |    + CASE WHEN ts >= TIMESTAMP '2024-01-08 00:00:00'
        |            AND ts < TIMESTAMP '2024-01-15 00:00:00'
        |           THEN 1000 ELSE 0 END) AS BIGINT) AS sum_value_c,
        |  MIN(epoch_us(ts)) AS min_ts_us,
        |  MAX(epoch_us(ts)) AS max_ts_us
        |FROM events GROUP BY 1""".stripMargin,
    // histogram-quantile pushdown: exact lower median recovered from
    // per-block histograms + straddler-only decode; oracle = the
    // discrete median over raw events (histogram-rank form, so tie
    // semantics align with the engine's k-th-smallest by construction)
    "ts_store_quantile_read" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |                  CAST(round(value*100) AS BIGINT) AS value_c
        |           FROM events),
        |r AS (SELECT user_id, value_c,
        |        SUM(value_c) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                           ROWS UNBOUNDED PRECEDING) AS counter_c
        |      FROM e),
        |hv AS (SELECT user_id, value_c AS v, COUNT(*) AS cnt FROM r GROUP BY 1, 2),
        |cv AS (SELECT user_id, v,
        |         SUM(cnt) OVER (PARTITION BY user_id ORDER BY v) AS cum,
        |         SUM(cnt) OVER (PARTITION BY user_id) AS total
        |       FROM hv),
        |mv AS (SELECT user_id, CAST(MAX(total) AS BIGINT) AS n_points,
        |         CAST(MIN(v) AS BIGINT) AS p50_value_c
        |       FROM cv WHERE cum >= (total + 1) // 2 GROUP BY 1),
        |hc AS (SELECT user_id, counter_c AS v, COUNT(*) AS cnt FROM r GROUP BY 1, 2),
        |cc AS (SELECT user_id, v,
        |         SUM(cnt) OVER (PARTITION BY user_id ORDER BY v) AS cum,
        |         SUM(cnt) OVER (PARTITION BY user_id) AS total
        |       FROM hc),
        |mc AS (SELECT user_id, CAST(MIN(v) AS BIGINT) AS p50_counter_c
        |       FROM cc WHERE cum >= (total + 1) // 2 GROUP BY 1)
        |SELECT user_id, n_points, p50_value_c, p50_counter_c
        |FROM mv JOIN mc USING (user_id)""".stripMargin,
    // predicate delete: skip-structure-proven blocks pass through
    // encoded; oracle = raw events minus the purged code
    "ts_store_delete_value" ->
      """SELECT user_id, COUNT(*) AS n_points,
        |  CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c,
        |  MIN(epoch_us(ts)) AS min_ts_us, MAX(epoch_us(ts)) AS max_ts_us
        |FROM events
        |WHERE ascii(substr(event_type, 1, 1)) <> 112
        |GROUP BY 1""".stripMargin,
    // the SQL DML door must purge exactly what the library operator
    // purges — shared oracle with ts_store_delete_value by design
    "ts_store_sql_delete" ->
      """SELECT user_id, COUNT(*) AS n_points,
        |  CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c,
        |  MIN(epoch_us(ts)) AS min_ts_us, MAX(epoch_us(ts)) AS max_ts_us
        |FROM events
        |WHERE ascii(substr(event_type, 1, 1)) <> 112
        |GROUP BY 1""".stripMargin,
    // same purge through the versioned (catalog) root — the delete
    // lands as a version commit, but the surviving points are pinned
    // identical to the other two delete doors
    "ts_store_catalog_delete" ->
      """SELECT user_id, COUNT(*) AS n_points,
        |  CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c,
        |  MIN(epoch_us(ts)) AS min_ts_us, MAX(epoch_us(ts)) AS max_ts_us
        |FROM events
        |WHERE ascii(substr(event_type, 1, 1)) <> 112
        |GROUP BY 1""".stripMargin,
    // the CDC drill replayed relationally: v2 = corrections (week 2,
    // +1000) + late-arrival clones (week 3, fresh seq) minus the
    // purged type code; the diff joins v1 to v2 on (user, seq)
    "ts_store_cdc" ->
      """WITH e AS (SELECT user_id, event_id AS seq, epoch_us(ts) AS ts_us,
        |                  CAST(round(value*100) AS BIGINT) AS v,
        |                  CAST(ascii(substr(event_type, 1, 1)) AS BIGINT) AS et FROM events),
        |f0 AS (SELECT user_id, seq, ts_us,
        |              v + CASE WHEN ts_us >= 1704672000000000 AND ts_us < 1705276800000000
        |                       THEN 1000 ELSE 0 END AS v, et
        |       FROM e
        |       UNION ALL
        |       SELECT user_id, seq + 100000000, ts_us + 1, v, et FROM e
        |       WHERE ts_us >= 1705276800000000 AND ts_us < 1705881600000000),
        |f AS (SELECT * FROM f0 WHERE et <> 112),
        |d AS (SELECT COALESCE(a.user_id, b.user_id) AS user_id,
        |             a.seq AS aseq, b.seq AS bseq, a.v AS av, b.v AS bv
        |      FROM e a FULL OUTER JOIN f b ON a.user_id = b.user_id AND a.seq = b.seq),
        |s AS (SELECT user_id,
        |        CAST(SUM(CASE WHEN aseq IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_inserts,
        |        CAST(SUM(CASE WHEN bseq IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_deletes,
        |        CAST(SUM(CASE WHEN aseq IS NOT NULL AND bseq IS NOT NULL AND av <> bv
        |                 THEN 1 ELSE 0 END) AS BIGINT) AS n_updates,
        |        CAST(SUM(CASE WHEN aseq IS NULL OR bseq IS NULL OR av <> bv
        |                 THEN COALESCE(bv, 0) - COALESCE(av, 0) ELSE 0 END) AS BIGINT) AS net_delta_c
        |      FROM d GROUP BY 1)
        |SELECT * FROM s WHERE n_inserts + n_deletes + n_updates > 0""".stripMargin,
    // as-of version 2 == the cdc model's f: corrections applied, late
    // clones added, etype 112 deleted
    "ts_store_asof" ->
      """WITH e AS (SELECT user_id, event_id AS seq, epoch_us(ts) AS ts_us,
        |                  CAST(round(value*100) AS BIGINT) AS v,
        |                  CAST(ascii(substr(event_type, 1, 1)) AS BIGINT) AS et FROM events),
        |f0 AS (SELECT user_id, seq, ts_us,
        |              v + CASE WHEN ts_us >= 1704672000000000 AND ts_us < 1705276800000000
        |                       THEN 1000 ELSE 0 END AS v, et
        |       FROM e
        |       UNION ALL
        |       SELECT user_id, seq + 100000000, ts_us + 1, v, et FROM e
        |       WHERE ts_us >= 1705276800000000 AND ts_us < 1705881600000000),
        |f AS (SELECT * FROM f0 WHERE et <> 112)
        |SELECT user_id, COUNT(*) AS n_points,
        |  CAST(SUM(v) AS BIGINT) AS sum_value_c,
        |  MIN(ts_us) AS min_ts_us, MAX(ts_us) AS max_ts_us,
        |  CAST(2 AS BIGINT) AS version
        |FROM f GROUP BY 1""".stripMargin,
    // backfill merge: B (the re-statement, +500 from its start) wins
    // wherever it covers; A supplies the older history
    "ts_store_merge" ->
      """SELECT user_id, COUNT(*) AS n_points,
        |  CAST(SUM(CAST(round(value*100) AS BIGINT) +
        |           CASE WHEN epoch_us(ts) >= (SELECT (MIN(epoch_us(ts)) // 86400000000 + 7) * 86400000000 FROM events)
        |                THEN 500 ELSE 0 END) AS BIGINT) AS sum_value_c,
        |  MIN(epoch_us(ts)) AS min_ts_us, MAX(epoch_us(ts)) AS max_ts_us
        |FROM events
        |GROUP BY 1""".stripMargin,
    // SAME backfill, landed as an O(delta) version commit on the
    // catalog root — third merge door, same oracle
    "ts_store_catalog_merge" ->
      """SELECT user_id, COUNT(*) AS n_points,
        |  CAST(SUM(CAST(round(value*100) AS BIGINT) +
        |           CASE WHEN epoch_us(ts) >= (SELECT (MIN(epoch_us(ts)) // 86400000000 + 7) * 86400000000 FROM events)
        |                THEN 500 ELSE 0 END) AS BIGINT) AS sum_value_c,
        |  MIN(epoch_us(ts)) AS min_ts_us, MAX(epoch_us(ts)) AS max_ts_us
        |FROM events
        |GROUP BY 1""".stripMargin,
    // SAME backfill through the SQL MERGE door — pinned to the library
    // merge's store
    "ts_store_sql_merge" ->
      """SELECT user_id, COUNT(*) AS n_points,
        |  CAST(SUM(CAST(round(value*100) AS BIGINT) +
        |           CASE WHEN epoch_us(ts) >= (SELECT (MIN(epoch_us(ts)) // 86400000000 + 7) * 86400000000 FROM events)
        |                THEN 500 ELSE 0 END) AS BIGINT) AS sum_value_c,
        |  MIN(epoch_us(ts)) AS min_ts_us, MAX(epoch_us(ts)) AS max_ts_us
        |FROM events
        |GROUP BY 1""".stripMargin,
    // store health from block metadata: blocks are exactly the
    // (series, day) groups encode forms
    // catalog maintenance: the retained manifest rows' stats recompute
    // from raw events — version v is day (d0 + v - 1)'s snapshot;
    // compaction+retention keep versions 8-12
    "ts_store_catalog" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day_id FROM events),
        |d0 AS (SELECT MIN(day_id) AS d0 FROM e),
        |b AS (SELECT day_id, user_id, COUNT(*) AS np FROM e GROUP BY 1, 2),
        |per AS (SELECT day_id, CAST(COUNT(*) AS BIGINT) AS n_blocks,
        |        CAST(SUM(np) AS BIGINT) AS n_points FROM b GROUP BY 1)
        |SELECT CAST(day_id - d0 + 1 AS BIGINT) AS version, n_blocks, n_points,
        |  day_id AS min_day, day_id AS max_day
        |FROM per, d0 WHERE day_id - d0 + 1 BETWEEN 8 AND 12""".stripMargin,
    // time travel: state(v=7) = deltas of days d0..d0+6; the oracle
    // restates that slice straight from raw events — a leak from any
    // later-committed day fails the hash. The _api twin reads the same
    // catalog through spark.read.format("timebox").option("asOf", 7),
    // so the shared oracle also gates the public versioned-read door.
    "ts_store_timetravel" -> timeTravelOracleSql,
    "ts_store_timetravel_api" -> timeTravelOracleSql,
    // reliability ledger off the gap incidents: outage = silence > 2h,
    // MTTR/MTBF/availability as exact rationals off one lag window
    "ts_outage_mttr" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id FROM events),
        |g AS (SELECT user_id, ts_us,
        |        ts_us - LAG(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS d
        |      FROM e),
        |a AS (SELECT user_id,
        |        CAST(SUM(CASE WHEN d > 7200000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_outages,
        |        CAST(SUM(CASE WHEN d > 7200000000 THEN d ELSE 0 END) AS BIGINT) AS downtime_us,
        |        MAX(ts_us) - MIN(ts_us) AS span_us
        |      FROM g GROUP BY 1)
        |SELECT user_id, n_outages, downtime_us, span_us,
        |  CAST(downtime_us // GREATEST(n_outages, 1) AS BIGINT) AS mttr_us,
        |  CAST((span_us - downtime_us) // GREATEST(n_outages, 1) AS BIGINT) AS mtbf_us,
        |  CAST((span_us - downtime_us) * 10000 // GREATEST(span_us, 1) AS BIGINT) AS availability_bp
        |FROM a""".stripMargin,
    // streaming exactly-once event dedup: the doubled stream collapses
    // back to the raw table's per-type counts; n_events == n_distinct
    // proves no duplicate survived AND no event was lost to eviction
    "ts_dedup_stream_events" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct
        |FROM events GROUP BY 1""".stripMargin,
    // offset-based shard packing: pure window math both engines replay
    "mm_shard_plan" ->
      """WITH a AS (SELECT source, doc_id,
        |             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes FROM documents),
        |c AS (SELECT source, doc_id, n_bytes,
        |        CAST(SUM(n_bytes) OVER (PARTITION BY source ORDER BY doc_id
        |          ROWS UNBOUNDED PRECEDING) - n_bytes AS BIGINT) AS cum_before FROM a)
        |SELECT source, cum_before // 16384 AS shard_seq,
        |  CAST(COUNT(*) AS BIGINT) AS n_assets,
        |  CAST(SUM(n_bytes) AS BIGINT) AS shard_bytes,
        |  MIN(doc_id) AS first_doc_id, MAX(doc_id) AS last_doc_id
        |FROM c GROUP BY 1, 2""".stripMargin,
    // layout must never change answers: the co-located bucketed join
    // equals the plain join restated from the raw tables
    "rel_bucketed_join" ->
      """SELECT s.s_nationkey, CAST(COUNT(*) AS BIGINT) AS n_items,
        |  CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c
        |FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |GROUP BY 1""".stripMargin,
    // RRF fusion of the TF-IDF leg (text_search_topk's scoring, depth
    // 20) and the length-prior leg; missing legs contribute 0
    "text_rank_fusion" ->
      s"""WITH t AS (SELECT doc_id, unnest($toksSql) AS tok FROM documents),
         |q AS (SELECT tok FROM (VALUES ('fast'), ('key'), ('sort')) v(tok)),
         |tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
         |       FROM t JOIN q USING (tok) GROUP BY 1, 2),
         |df AS (SELECT tok, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
         |       FROM t JOIN q USING (tok) GROUP BY 1),
         |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM documents),
         |sc AS (SELECT doc_id, CAST(SUM(tf * (nd * 1000000 // df)) AS BIGINT) AS score
         |       FROM tf JOIN df USING (tok), n GROUP BY 1),
         |rel AS (SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rel_rank
         |        FROM sc QUALIFY rel_rank <= 20),
         |ln AS (SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY len($toksSql) DESC, doc_id ASC) AS BIGINT) AS len_rank
         |       FROM documents QUALIFY len_rank <= 20),
         |f AS (SELECT COALESCE(rel.doc_id, ln.doc_id) AS doc_id, rel.rel_rank, ln.len_rank,
         |        COALESCE(1000000 // (60 + rel.rel_rank), 0) + COALESCE(1000000 // (60 + ln.len_rank), 0) AS rrf_micro
         |      FROM rel FULL OUTER JOIN ln ON ln.doc_id = rel.doc_id)
         |SELECT CAST(ROW_NUMBER() OVER (ORDER BY rrf_micro DESC, doc_id ASC) AS BIGINT) AS rnk,
         |  doc_id, rel_rank, len_rank, CAST(rrf_micro AS BIGINT) AS rrf_micro
         |FROM f QUALIFY rnk <= 10""".stripMargin,
    // streaming read of the store: each committed daily delta snapshot
    // is served as a micro-batch stamped with its commit_version; the
    // oracle restates each day slice from raw events (version i = day
    // d0+i-1) — double-serves, skips, and cross-version bleed all fail
    // the startingVersion door: the same day-sliced stream, suffix >= 5
    "ts_store_stream_read_from" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us,
        |    epoch_us(ts) // 86400000000 AS day_id,
        |    CAST(round(value * 100) AS BIGINT) AS value_c FROM events),
        |d0 AS (SELECT MIN(day_id) AS d0 FROM e)
        |SELECT CAST(day_id - d0 + 1 AS BIGINT) AS commit_version,
        |  CAST(COUNT(*) AS BIGINT) AS n_points,
        |  CAST(SUM(value_c) AS BIGINT) AS sum_value_c,
        |  MIN(ts_us) AS min_ts_us, MAX(ts_us) AS max_ts_us
        |FROM e, d0 WHERE day_id - d0 < 8 AND day_id - d0 + 1 >= 5
        |GROUP BY 1""".stripMargin,
    "ts_store_stream_read" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us,
        |    epoch_us(ts) // 86400000000 AS day_id,
        |    CAST(round(value * 100) AS BIGINT) AS value_c FROM events),
        |d0 AS (SELECT MIN(day_id) AS d0 FROM e)
        |SELECT CAST(day_id - d0 + 1 AS BIGINT) AS commit_version,
        |  CAST(COUNT(*) AS BIGINT) AS n_points,
        |  CAST(SUM(value_c) AS BIGINT) AS sum_value_c,
        |  MIN(ts_us) AS min_ts_us, MAX(ts_us) AS max_ts_us
        |FROM e, d0 WHERE day_id - d0 < 8
        |GROUP BY 1""".stripMargin,
    // the SQL-DDL door: CREATE TABLE USING timebox, then one pure-SQL
    // per-series aggregate — the oracle restates it from raw events
    "ts_store_sql" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us,
        |    CAST(round(value * 100) AS BIGINT) AS value_c FROM events)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_points,
        |  CAST(SUM(value_c) AS BIGINT) AS sum_value_c,
        |  MIN(ts_us) AS min_ts_us, MAX(ts_us) AS max_ts_us
        |FROM e GROUP BY 1""".stripMargin,
    "ts_store_stats" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day_id FROM events),
        |b AS (SELECT user_id, day_id, COUNT(*) AS np FROM e GROUP BY 1, 2)
        |SELECT user_id, COUNT(*) AS n_blocks, CAST(SUM(np) AS BIGINT) AS n_points,
        |  MIN(day_id) AS min_day, MAX(day_id) AS max_day,
        |  CAST(SUM(CASE WHEN np < 32 THEN 1 ELSE 0 END) AS BIGINT) AS n_fragmented,
        |  CAST(SUM(np) * 1000000 // COUNT(*) AS BIGINT) AS pts_per_block_micro
        |FROM b GROUP BY 1""".stripMargin,
    // evolved read: old half NULL for the added tag; split day is the
    // same (min+max+1)/2 scalar both engines compute
    "ts_store_schema_evolve" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day_id,
        |    CAST(round(value*100) AS BIGINT) AS value_c,
        |    CAST(length(props) AS BIGINT) AS plen_c FROM events),
        |s AS (SELECT (MIN(day_id) + MAX(day_id) + 1) // 2 AS split_day FROM e)
        |SELECT user_id, COUNT(*) AS n_points,
        |  CAST(SUM(value_c) AS BIGINT) AS sum_value_c,
        |  CAST(SUM(CASE WHEN day_id >= split_day THEN 1 ELSE 0 END) AS BIGINT) AS n_evolved,
        |  CAST(SUM(CASE WHEN day_id >= split_day THEN plen_c ELSE 0 END) AS BIGINT) AS sum_plen_c
        |FROM e, s GROUP BY 1""".stripMargin,
    // point-exact retention: survivors = raw events at/after the cutoff
    "ts_store_ttl" ->
      """SELECT user_id, COUNT(*) AS n_points,
        |  CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c,
        |  MIN(epoch_us(ts)) AS min_ts_us, MAX(epoch_us(ts)) AS max_ts_us
        |FROM events
        |WHERE epoch_us(ts) >= 1705276800000000
        |GROUP BY 1""".stripMargin,
    // the dictionary read: per-block distinct-value dictionaries skip
    // blocks lacking the probed enum code; oracle = the same
    // time-range + type-code filter over the raw events
    "ts_store_dict_read" ->
      """SELECT user_id, COUNT(*) AS n_points,
        |  MIN(epoch_us(ts)) AS min_ts_us, MAX(epoch_us(ts)) AS max_ts_us,
        |  CAST(SUM(event_id) AS BIGINT) AS sum_event_id
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-15 00:00:00'
        |  AND ascii(substr(event_type, 1, 1)) = 112
        |GROUP BY user_id""".stripMargin,
    "ts_interp_linear" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) // 3600000000 AS hour_id, epoch_us(ts) AS ts_us,
        |         event_id, CAST(round(value*100) AS BIGINT) AS value_c
        |  FROM events
        |), k AS (
        |  SELECT user_id, hour_id, value_c FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, hour_id
        |                                 ORDER BY ts_us DESC, event_id DESC) AS rn
        |    FROM e) WHERE rn = 1
        |), s AS (
        |  SELECT user_id, hour_id AS h0, value_c AS v0,
        |         lead(hour_id) OVER w AS next_h, lead(value_c) OVER w AS next_v
        |  FROM k WINDOW w AS (PARTITION BY user_id ORDER BY hour_id)
        |), g AS (
        |  SELECT user_id, h0, v0, next_h, next_v,
        |         unnest(generate_series(h0, COALESCE(next_h - 1, h0))) AS hour_id
        |  FROM s
        |)
        |SELECT user_id, hour_id,
        |  CASE WHEN hour_id = h0 THEN v0
        |       ELSE CAST(round(CAST(v0 AS DOUBLE) + CAST(next_v - v0 AS DOUBLE) *
        |                       (CAST(hour_id - h0 AS DOUBLE) / CAST(next_h - h0 AS DOUBLE))) AS BIGINT)
        |  END AS interp_c,
        |  CAST(CASE WHEN hour_id = h0 THEN 1 ELSE 0 END AS BIGINT) AS is_observed
        |FROM g""".stripMargin,
    // multi-tag zone-map read: same time range + two value bands over
    // the raw fact — block skipping and tag-subset decode must be
    // invisible in the result
    "ts_store_multitag_read" ->
      """SELECT l_suppkey, COUNT(*) AS n_points,
        |  CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
        |  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_price_c
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND CAST(round(l_extendedprice*100) AS BIGINT) BETWEEN 9500000 AND 11000000
        |  AND CAST(round(l_quantity*100) AS BIGINT) BETWEEN 1000 AND 4000
        |GROUP BY 1""".stripMargin,
    "ts_store_multitag" ->
      """SELECT l_suppkey, COUNT(*) AS n_points,
        |  MIN(epoch_us(l_shipdate)) AS min_ship_us, MAX(epoch_us(l_shipdate)) AS max_ship_us,
        |  CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
        |  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_price_c,
        |  CAST(SUM(CAST(round(l_discount*100) AS BIGINT)) AS BIGINT) AS sum_disc_c
        |FROM lineitem GROUP BY l_suppkey""".stripMargin,
    // same gap semantics as the batch ts_sessionize (> gap opens a
    // new session), aggregated to the deterministic (user, start) set
    "ts_sessionize_stream" ->
      """WITH g AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |              THEN 1 ELSE 0 END AS is_new
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), s AS (
        |  SELECT user_id, ts_us, event_id,
        |         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS seq
        |  FROM g
        |)
        |SELECT user_id, MIN(ts_us) AS start_us, MAX(ts_us) AS end_us, COUNT(*) AS n_events
        |FROM s GROUP BY user_id, seq""".stripMargin,
    // window start = FLOOR hour (Spark's window() floors; a bare //
    // truncates toward zero and merges the two hours around the epoch)
    "ts_ingest_stream" ->
      """SELECT epoch_us(ts) - ((epoch_us(ts) % 3600000000) + 3600000000) % 3600000000 AS window_start_us,
        |  event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_c
        |FROM events GROUP BY 1, 2""".stripMargin,
    // the streaming LOCF grid replayed == the batch gapfill exactly
    "ts_gapfill_stream" -> gapfillOracleSql,
    "ts_gapfill_locf" -> gapfillOracleSql
  )

  /** The synthetic partsupp bridge, derived in SQL exactly as
    * Relational.partsupp derives it in Spark (shared prefix of the
    * five partsupp-family oracles).
    */
  private val PartsuppCte: String =
    """WITH ns AS (SELECT COUNT(*) AS n_supp FROM supplier),
      |partsupp AS (
      |  SELECT p_partkey AS ps_partkey, i AS ps_i,
      |    (p_partkey * 13 + p_partkey // n_supp + i * (n_supp // 4)) % n_supp AS ps_suppkey,
      |    (p_partkey * 7 + i * 11) % 9999 + 1 AS ps_availqty,
      |    (p_partkey * 97 + i * 31) % 100000 + 100 AS ps_supplycost_c
      |  FROM part CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS i) g CROSS JOIN ns)""".stripMargin

  private lazy val scd2OracleSql: String =
      """WITH e AS (SELECT user_id, event_type AS state, epoch_us(ts) AS ts_us, event_id FROM events),
        |o AS (SELECT *, CASE WHEN lag(state) OVER w IS DISTINCT FROM state THEN 1 ELSE 0 END AS chg
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |s AS (SELECT *, CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS seg FROM o),
        |g AS (SELECT user_id, seg, MIN(state) AS state, MIN(ts_us) AS valid_from_us,
        |        CAST(COUNT(*) AS BIGINT) AS n_events
        |      FROM s GROUP BY 1, 2)
        |SELECT user_id, seg, state, valid_from_us,
        |  COALESCE(lead(valid_from_us) OVER wv, -1) AS valid_to_us, n_events,
        |  CAST(CASE WHEN lead(valid_from_us) OVER wv IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
        |FROM g WINDOW wv AS (PARTITION BY user_id ORDER BY seg)""".stripMargin

  private lazy val hllOracleSql: String =
      """WITH b AS (SELECT event_type, user_id,
        |    md5('hll:' || CAST(user_id AS VARCHAR)) AS h FROM events),
        |v AS (SELECT event_type, user_id,
        |    (instr('0123456789abcdef', substr(h, 1, 1)) - 1) * 268435456
        |  + (instr('0123456789abcdef', substr(h, 2, 1)) - 1) * 16777216
        |  + (instr('0123456789abcdef', substr(h, 3, 1)) - 1) * 1048576
        |  + (instr('0123456789abcdef', substr(h, 4, 1)) - 1) * 65536
        |  + (instr('0123456789abcdef', substr(h, 5, 1)) - 1) * 4096
        |  + (instr('0123456789abcdef', substr(h, 6, 1)) - 1) * 256
        |  + (instr('0123456789abcdef', substr(h, 7, 1)) - 1) * 16
        |  + (instr('0123456789abcdef', substr(h, 8, 1)) - 1) AS hv FROM b),
        |r0 AS (SELECT event_type, user_id, hv % 64 AS bucket, hv // 64 AS w FROM v),
        |r1 AS (SELECT event_type, user_id, bucket,
        |         CASE WHEN w = 0 THEN 27 ELSE 27 - length(bin(w)) END AS rho FROM r0),
        |regs AS (SELECT event_type, bucket, MAX(rho) AS r FROM r1 GROUP BY 1, 2),
        |sk AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_hit,
        |         CAST(SUM(CAST(1 AS BIGINT) << (27 - r)) AS BIGINT) AS s_hit
        |       FROM regs GROUP BY 1),
        |sk2 AS (SELECT event_type, n_hit,
        |          CAST(s_hit + (64 - n_hit) * 134217728 AS BIGINT) AS sum_inv FROM sk),
        |sk2b AS (SELECT event_type, n_hit, sum_inv,
        |          CAST(389776872046592 // (sum_inv * 1000) AS BIGINT) AS raw_est FROM sk2),
        |sk3 AS (SELECT event_type, n_hit, sum_inv,
        |          CAST(CASE WHEN raw_est <= 160 AND n_hit < 64 THEN
        |            [266, 222, 196, 177, 163, 151, 142, 133, 126, 119,
        |             113, 107, 102, 97, 93, 89, 85, 81, 78, 74, 71, 68, 65, 63, 60, 58, 55, 53,
        |             51, 48, 46, 44, 42, 40, 39, 37, 35, 33, 32, 30, 28, 27, 25, 24, 23, 21, 20,
        |             18, 17, 16, 15, 13, 12, 11, 10, 9, 7, 6, 5, 4, 3, 2, 1, 0][64 - n_hit]
        |          ELSE raw_est END AS BIGINT) AS hll_estimate FROM sk2b),
        |ex AS (SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
        |       FROM r1 GROUP BY 1)
        |SELECT sk3.event_type, sk3.n_hit, sk3.sum_inv, sk3.hll_estimate, ex.n_exact,
        |  CAST(abs(sk3.hll_estimate - ex.n_exact) * 10000 // ex.n_exact AS BIGINT) AS err_bp
        |FROM sk3 JOIN ex ON ex.event_type = sk3.event_type""".stripMargin

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = tsOracles ++ mlOracles ++ Map(
    // fleet triage over the zscore flags: the per-point oracle is
    // reused verbatim as a subquery, then rate + top-20
    "ts_anomaly_topk" ->
      s"""WITH z AS (${tsOracles("ts_anomaly_zscore")}),
         |p AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_scored,
         |        CAST(SUM(is_anomaly) AS BIGINT) AS n_anomalies FROM z GROUP BY 1),
         |r AS (SELECT *, CAST(n_anomalies * 1000000 // n_scored AS BIGINT) AS rate_micro FROM p)
         |SELECT user_id, CAST(ROW_NUMBER() OVER (ORDER BY rate_micro DESC, user_id ASC) AS BIGINT) AS rnk,
         |  n_scored, n_anomalies, rate_micro
         |FROM r ORDER BY rate_micro DESC, user_id ASC LIMIT 20""".stripMargin,
    // portable deterministic HLL: md5-derived 32-bit hash, bucket =
    // h % 64, rho = 27 − bitlen(w), register max, harmonic sum scaled
    // by 2^27, raw estimate alpha·m²/Z in one integral division. The
    // streaming dual maintains the same registers as streaming state
    // and drains to the identical sketch — SHARED oracle.
    "approx_hll_stream" -> hllOracleSql,
    "approx_hll_users" -> hllOracleSql,

    // KMV sketch set ops: k=128 minimum 48-bit hashes per event type,
    // θ = h_k estimator, merged-sketch union + inclusion-ratio
    // intersection, exact tiers alongside; < k distinct hashes falls
    // back to the exact sketch count on both engines
    // cross-source overlap matrix over distinct 4-gram shingle hashes:
    // same KMV estimator algebra / hash family as approx_kmv_setops
    "dedup_source_overlap" ->
      s"""WITH t AS (SELECT source, $toksSql AS toks FROM documents),
         |m AS (SELECT DISTINCT source,
         |        CAST('0x' || substr(md5('kso:' || toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]), 1, 12) AS BIGINT) AS h
         |       FROM (SELECT source, toks, unnest(generate_series(1, len(toks) - 3)) AS i
         |             FROM t WHERE len(toks) >= 4)),
         |sk AS (SELECT source, h FROM (
         |        SELECT source, h, ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn
         |        FROM m) WHERE rn <= 128),
         |ex AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_exact FROM m GROUP BY 1),
         |pt AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sk, MAX(h) AS h_k FROM sk GROUP BY 1),
         |est AS (SELECT pt.source, ex.n_exact,
         |         CAST(CASE WHEN pt.n_sk < 128 THEN pt.n_sk
         |              ELSE (127 * 281474976710656) // pt.h_k END AS BIGINT) AS est
         |        FROM pt JOIN ex USING (source)),
         |pr AS (SELECT a.source AS src_a, b.source AS src_b,
         |         a.n_exact AS exact_a, b.n_exact AS exact_b, a.est AS est_a, b.est AS est_b
         |       FROM est a JOIN est b ON a.source < b.source),
         |ms AS (SELECT pr.src_a, pr.src_b, sk.h,
         |         MAX(CASE WHEN sk.source = pr.src_a THEN 1 ELSE 0 END) AS in_a,
         |         MAX(CASE WHEN sk.source = pr.src_b THEN 1 ELSE 0 END) AS in_b
         |       FROM pr JOIN sk ON sk.source = pr.src_a OR sk.source = pr.src_b
         |       GROUP BY 1, 2, 3),
         |mu AS (SELECT src_a, src_b, CAST(COUNT(*) AS BIGINT) AS n_u, MAX(h) AS h_ku,
         |         CAST(SUM(in_a * in_b) AS BIGINT) AS n_both
         |       FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY src_a, src_b ORDER BY h) AS rn FROM ms)
         |       WHERE rn <= 128 GROUP BY 1, 2),
         |ei AS (SELECT x.source AS src_a, y.source AS src_b,
         |         CAST(COUNT(*) AS BIGINT) AS exact_inter
         |       FROM m x JOIN m y ON x.h = y.h AND x.source < y.source
         |       GROUP BY 1, 2),
         |f AS (SELECT pr.src_a, pr.src_b, pr.exact_a, pr.exact_b, pr.est_a, pr.est_b,
         |        CAST(pr.exact_a + pr.exact_b - COALESCE(ei.exact_inter, 0) AS BIGINT) AS exact_union,
         |        CAST(CASE WHEN mu.n_u < 128 THEN mu.n_u
         |             ELSE (127 * 281474976710656) // mu.h_ku END AS BIGINT) AS est_union,
         |        CAST(COALESCE(ei.exact_inter, 0) AS BIGINT) AS exact_inter, mu.n_both, mu.n_u
         |      FROM pr JOIN mu ON mu.src_a = pr.src_a AND mu.src_b = pr.src_b
         |      LEFT JOIN ei ON ei.src_a = pr.src_a AND ei.src_b = pr.src_b)
         |SELECT src_a, src_b, exact_a, exact_b, est_a, est_b, exact_union, est_union,
         |  exact_inter, CAST(n_both * est_union // GREATEST(n_u, 1) AS BIGINT) AS est_inter,
         |  CAST(abs(n_both * est_union // GREATEST(n_u, 1) - exact_inter) AS BIGINT) AS inter_err
         |FROM f""".stripMargin,
    "approx_kmv_setops" ->
      """WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
        |th AS (SELECT DISTINCT event_type,
        |        CAST('0x' || substr(md5('kmv:' || CAST(user_id AS VARCHAR)), 1, 12) AS BIGINT) AS h
        |       FROM tu),
        |sk AS (SELECT event_type, h FROM (
        |        SELECT event_type, h, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
        |        FROM th) WHERE rn <= 128),
        |ex AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_exact FROM tu GROUP BY 1),
        |pt AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_sk, MAX(h) AS h_k FROM sk GROUP BY 1),
        |est AS (SELECT pt.event_type, ex.n_exact,
        |         CAST(CASE WHEN pt.n_sk < 128 THEN pt.n_sk
        |              ELSE (127 * 281474976710656) // pt.h_k END AS BIGINT) AS est
        |        FROM pt JOIN ex USING (event_type)),
        |pr AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |         a.n_exact AS exact_a, b.n_exact AS exact_b, a.est AS est_a, b.est AS est_b
        |       FROM est a JOIN est b ON a.event_type < b.event_type),
        |ms AS (SELECT pr.type_a, pr.type_b, sk.h,
        |         MAX(CASE WHEN sk.event_type = pr.type_a THEN 1 ELSE 0 END) AS in_a,
        |         MAX(CASE WHEN sk.event_type = pr.type_b THEN 1 ELSE 0 END) AS in_b
        |       FROM pr JOIN sk ON sk.event_type = pr.type_a OR sk.event_type = pr.type_b
        |       GROUP BY 1, 2, 3),
        |mu AS (SELECT type_a, type_b, CAST(COUNT(*) AS BIGINT) AS n_u, MAX(h) AS h_ku,
        |         CAST(SUM(in_a * in_b) AS BIGINT) AS n_both
        |       FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY type_a, type_b ORDER BY h) AS rn FROM ms)
        |       WHERE rn <= 128 GROUP BY 1, 2),
        |ei AS (SELECT x.event_type AS type_a, y.event_type AS type_b,
        |         CAST(COUNT(*) AS BIGINT) AS exact_inter
        |       FROM tu x JOIN tu y ON x.user_id = y.user_id AND x.event_type < y.event_type
        |       GROUP BY 1, 2),
        |f AS (SELECT pr.type_a, pr.type_b, pr.exact_a, pr.exact_b, pr.est_a, pr.est_b,
        |        CAST(pr.exact_a + pr.exact_b - COALESCE(ei.exact_inter, 0) AS BIGINT) AS exact_union,
        |        CAST(CASE WHEN mu.n_u < 128 THEN mu.n_u
        |             ELSE (127 * 281474976710656) // mu.h_ku END AS BIGINT) AS est_union,
        |        CAST(COALESCE(ei.exact_inter, 0) AS BIGINT) AS exact_inter, mu.n_both, mu.n_u
        |      FROM pr JOIN mu ON mu.type_a = pr.type_a AND mu.type_b = pr.type_b
        |      LEFT JOIN ei ON ei.type_a = pr.type_a AND ei.type_b = pr.type_b)
        |SELECT type_a, type_b, exact_a, exact_b, est_a, est_b, exact_union, est_union,
        |  exact_inter, CAST(n_both * est_union // GREATEST(n_u, 1) AS BIGINT) AS est_inter,
        |  CAST(abs(est_union - exact_union) * 10000 // exact_union AS BIGINT) AS union_err_bp,
        |  CAST(abs(n_both * est_union // GREATEST(n_u, 1) - exact_inter) * 10000
        |       // GREATEST(exact_inter, 1) AS BIGINT) AS inter_err_bp
        |FROM f""".stripMargin,

    // the KMV sketch as streaming state: drained sketch == batch
    // sketch by the min-k merge algebra, so the oracle is the batch
    // per-type estimator over raw events
    "approx_kmv_stream" ->
      """WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
        |th AS (SELECT DISTINCT event_type,
        |        CAST('0x' || substr(md5('kmv:' || CAST(user_id AS VARCHAR)), 1, 12) AS BIGINT) AS h
        |       FROM tu),
        |sk AS (SELECT event_type, h FROM (
        |        SELECT event_type, h, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
        |        FROM th) WHERE rn <= 128),
        |pt AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_sk, MAX(h) AS h_k FROM sk GROUP BY 1),
        |ex AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_exact FROM tu GROUP BY 1),
        |est AS (SELECT pt.event_type, ex.n_exact,
        |         CAST(CASE WHEN pt.n_sk < 128 THEN pt.n_sk
        |              ELSE (127 * 281474976710656) // pt.h_k END AS BIGINT) AS kmv_estimate
        |        FROM pt JOIN ex USING (event_type))
        |SELECT event_type, n_exact, kmv_estimate,
        |  CAST(abs(kmv_estimate - n_exact) * 10000 // n_exact AS BIGINT) AS err_bp
        |FROM est""".stripMargin,

    // runtime-filter accounting: bloom over a ~4%-selective order-key
    // build side, probed at the lineitem join-key grain; funnel stage
    // counts + FP rate among true non-matches + pruned-row bp
    "rel_bloom_join_prune" ->
      s"""WITH ab AS (SELECT * FROM (VALUES ${graft.functions.BloomFilter.duckAbValues()}) t(a, b)),
         |bk AS (SELECT DISTINCT o_orderkey FROM orders
         |       WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1995-04-01'),
         |bh AS (SELECT o_orderkey,
         |         CAST('0x' || substr(md5('bjp:' || CAST(o_orderkey AS VARCHAR)), 1, 15) AS BIGINT)
         |           % 2147483647 AS hm FROM bk),
         |bits AS (SELECT DISTINCT ((ab.a * bh.hm + ab.b) % 2147483647) % 65536 AS pos
         |         FROM bh CROSS JOIN ab),
         |pk AS (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_rows FROM lineitem GROUP BY 1),
         |ph AS (SELECT pk.*,
         |         CAST('0x' || substr(md5('bjp:' || CAST(l_orderkey AS VARCHAR)), 1, 15) AS BIGINT)
         |           % 2147483647 AS hm FROM pk),
         |pp AS (SELECT ph.l_orderkey, ph.n_rows,
         |         SUM(CASE WHEN bits.pos IS NOT NULL THEN 1 ELSE 0 END) AS n_set
         |       FROM ph CROSS JOIN ab
         |       LEFT JOIN bits ON bits.pos = ((ab.a * ph.hm + ab.b) % 2147483647) % 65536
         |       GROUP BY 1, 2),
         |pj AS (SELECT pp.n_rows, (pp.n_set = 7) AS pass,
         |         CASE WHEN bk.o_orderkey IS NULL THEN 0 ELSE 1 END AS true_match
         |       FROM pp LEFT JOIN bk ON bk.o_orderkey = pp.l_orderkey),
         |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_keys, CAST(SUM(n_rows) AS BIGINT) AS n_rows,
         |        CAST(SUM(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_keys_pass,
         |        CAST(SUM(CASE WHEN pass THEN n_rows ELSE 0 END) AS BIGINT) AS n_rows_pass,
         |        CAST(SUM(true_match) AS BIGINT) AS n_keys_true,
         |        CAST(SUM(true_match * n_rows) AS BIGINT) AS n_rows_true
         |      FROM pj)
         |SELECT *, CAST(n_keys_pass - n_keys_true AS BIGINT) AS n_keys_fp,
         |  CAST((n_keys_pass - n_keys_true) * 10000
         |       // GREATEST(n_keys - n_keys_true, 1) AS BIGINT) AS fp_bp,
         |  CAST((n_rows - n_rows_pass) * 10000 // n_rows AS BIGINT) AS pruned_rows_bp
         |FROM s""".stripMargin,

    // referential-integrity audit: per FK leg, one left join against
    // the parent's distinct keys + conditional aggregates; the fourth
    // leg is a negative control (10% of customer keys withheld)
    "rel_fk_audit" ->
      """SELECT 'orders_customer' AS fk_name, CAST(COUNT(*) AS BIGINT) AS n_child,
        |  CAST(SUM(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans,
        |  CAST(COUNT(DISTINCT CASE WHEN p.k IS NULL THEN c.k END) AS BIGINT) AS n_orphan_keys
        |FROM (SELECT o_custkey AS k FROM orders) c
        |LEFT JOIN (SELECT DISTINCT c_custkey AS k FROM customer) p ON p.k = c.k
        |UNION ALL
        |SELECT 'lineitem_orders', CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(COUNT(DISTINCT CASE WHEN p.k IS NULL THEN c.k END) AS BIGINT)
        |FROM (SELECT l_orderkey AS k FROM lineitem) c
        |LEFT JOIN (SELECT DISTINCT o_orderkey AS k FROM orders) p ON p.k = c.k
        |UNION ALL
        |SELECT 'lineitem_part', CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(COUNT(DISTINCT CASE WHEN p.k IS NULL THEN c.k END) AS BIGINT)
        |FROM (SELECT l_partkey AS k FROM lineitem) c
        |LEFT JOIN (SELECT DISTINCT p_partkey AS k FROM part) p ON p.k = c.k
        |UNION ALL
        |SELECT 'negative_control', CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(COUNT(DISTINCT CASE WHEN p.k IS NULL THEN c.k END) AS BIGINT)
        |FROM (SELECT o_custkey AS k FROM orders) c
        |LEFT JOIN (SELECT DISTINCT c_custkey AS k FROM customer WHERE c_custkey % 10 != 0) p ON p.k = c.k""".stripMargin,
    // per-column profile over the canonicalized string projection —
    // explicit UNION ALL unpivot (DuckDB's UNPIVOT drops NULLs by
    // default; UNION ALL keeps the semantics aligned with Spark's)
    "rel_profile" ->
      """WITH o AS (SELECT CAST(o_orderkey AS VARCHAR) AS o_orderkey,
        |    CAST(o_custkey AS VARCHAR) AS o_custkey, o_orderstatus,
        |    CAST(CAST(round(o_totalprice*100) AS BIGINT) AS VARCHAR) AS o_totalprice_c,
        |    CAST(epoch_us(o_orderdate) AS VARCHAR) AS o_orderdate_us,
        |    o_orderpriority FROM orders),
        |u AS (
        |  SELECT 'o_orderkey' AS col_name, o_orderkey AS v FROM o UNION ALL
        |  SELECT 'o_custkey', o_custkey FROM o UNION ALL
        |  SELECT 'o_orderstatus', o_orderstatus FROM o UNION ALL
        |  SELECT 'o_totalprice_c', o_totalprice_c FROM o UNION ALL
        |  SELECT 'o_orderdate_us', o_orderdate_us FROM o UNION ALL
        |  SELECT 'o_orderpriority', o_orderpriority FROM o)
        |SELECT col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(COUNT(*) - COUNT(v) AS BIGINT) AS n_null,
        |  CAST(COUNT(DISTINCT v) AS BIGINT) AS n_distinct,
        |  MIN(v) AS min_v, MAX(v) AS max_v
        |FROM u GROUP BY 1""".stripMargin,
    // equi-depth deciles by the banded prefix sum: a band emits each
    // decile d with cum_prev·10 < d·total ≤ cum·10
    "rel_histogram_equi" ->
      """WITH b AS (SELECT CAST(round(o_totalprice*100) AS BIGINT) // 100000 AS band FROM orders),
        |g AS (SELECT band, CAST(COUNT(*) AS BIGINT) AS n FROM b GROUP BY 1),
        |c AS (SELECT band, n,
        |        CAST(SUM(n) OVER (ORDER BY band ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |        CAST(SUM(n) OVER () AS BIGINT) AS total FROM g),
        |d AS (SELECT *, cum - n AS cum_prev FROM c)
        |SELECT CAST(t.dec AS BIGINT) AS decile, d.band,
        |  (d.band + 1) * 100000 AS upper_bound_c, d.cum AS cum_n, d.total AS n_total
        |FROM d CROSS JOIN (SELECT unnest(generate_series(1, 10)) AS dec) t
        |WHERE d.cum_prev * 10 < t.dec * d.total AND t.dec * d.total <= d.cum * 10""".stripMargin,
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
        |GROUP BY event_type""".stripMargin,
    "rel_antijoin" ->
      """SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |                    AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00')""".stripMargin,
    "rel_semijoin" ->
      """SELECT s_suppkey, CAST(s_nationkey AS BIGINT) AS s_nationkey
        |FROM supplier
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_suppkey = s_suppkey
        |                AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |                AND l_shipdate <  TIMESTAMP '1995-04-01 00:00:00')""".stripMargin,
    "q14_promo_share" ->
      """WITH a AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN p_type = 'PROMO'
        |             THEN CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)
        |             ELSE 0 END) AS BIGINT) AS promo_c,
        |    CAST(SUM(CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT) AS total_c,
        |    COUNT(*) AS n
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |)
        |SELECT promo_c, total_c, n, promo_c * 1000000 // total_c AS promo_share_micro
        |FROM a""".stripMargin,
    "q18_large_orders" ->
      """WITH q AS (
        |  SELECT l_orderkey, CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_c
        |  FROM lineitem GROUP BY 1 HAVING sum_qty_c > 25000
        |)
        |SELECT c_name, c_custkey, o_orderkey,
        |  CAST(round(o_totalprice*100) AS BIGINT) AS totalprice_c, q.sum_qty_c
        |FROM q JOIN orders ON o_orderkey = q.l_orderkey
        |JOIN customer ON c_custkey = o_custkey""".stripMargin,
    "rel_running_total" ->
      """SELECT o_custkey, o_orderkey, epoch_us(o_orderdate) AS order_us,
        |  CAST(round(o_totalprice*100) AS BIGINT) AS totalprice_c,
        |  CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) OVER w AS BIGINT) AS cum_c,
        |  CAST(ROW_NUMBER() OVER w AS BIGINT) AS order_seq
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS UNBOUNDED PRECEDING)""".stripMargin,
    "rel_argmax" ->
      """WITH b AS (SELECT c_nationkey, c_custkey,
        |                  CAST(round(c_acctbal*100) AS BIGINT) AS bal_c FROM customer),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY c_nationkey
        |                                   ORDER BY bal_c DESC, c_custkey ASC) AS rn FROM b),
        |n AS (SELECT c_nationkey, COUNT(*) AS n_customers, MAX(bal_c) AS top_acctbal_c
        |      FROM b GROUP BY 1)
        |SELECT CAST(r.c_nationkey AS BIGINT) AS nationkey, r.c_custkey AS top_custkey,
        |  n.top_acctbal_c, n.n_customers
        |FROM r JOIN n ON n.c_nationkey = r.c_nationkey WHERE r.rn = 1""".stripMargin,
    // the salted-join drill: the oracle is the PLAIN join — salting is
    // an execution detail that must not change results
    "rel_skew_join" ->
      """WITH f AS (SELECT CASE WHEN user_id % 10 != 0 THEN 0 ELSE user_id END AS k,
        |                  CAST(round(value*100) AS BIGINT) AS value_c FROM events),
        |d AS (SELECT DISTINCT k, 'u' || CAST(k AS VARCHAR) AS user_tag FROM f)
        |SELECT f.k, d.user_tag, COUNT(*) AS n_rows,
        |  CAST(SUM(f.value_c) AS BIGINT) AS sum_value_c
        |FROM f JOIN d ON d.k = f.k GROUP BY 1, 2""".stripMargin,
    // Q6: pure scan-aggregate; revenue in cents × discount-points
    "q6_revenue" ->
      """SELECT CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
        |               * CAST(round(l_discount*100) AS BIGINT)) AS BIGINT) AS revenue_cpct,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,
    // Q4: EXISTS with a correlated date comparison
    "q4_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
        |GROUP BY 1""".stripMargin,
    // Q17: correlated per-part average, cross-multiplied to integers
    "q17_small_qty" ->
      """WITH li AS (SELECT l_partkey, CAST(round(l_quantity*100) AS BIGINT) AS qty_c,
        |                   CAST(round(l_extendedprice*100) AS BIGINT) AS price_c FROM lineitem),
        |a AS (SELECT l_partkey AS ap_key, CAST(SUM(qty_c) AS BIGINT) AS sum_qty_c,
        |             COUNT(*) AS n_li FROM li GROUP BY 1)
        |SELECT p_brand, CAST(SUM(price_c) AS BIGINT) AS sum_price_c, COUNT(*) AS n_small
        |FROM li JOIN a ON ap_key = l_partkey JOIN part ON p_partkey = l_partkey
        |WHERE qty_c * n_li * 5 < sum_qty_c
        |GROUP BY 1""".stripMargin,
    // Q19: OR-of-ANDs over the fact ⋈ dim join
    "q19_disjunctive" ->
      """SELECT CAST(SUM(CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_c,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#1'  AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    // Q22: scalar-subquery threshold + NOT EXISTS, integer-exact
    "q22_idle_customers" ->
      """WITH c AS (SELECT c_custkey, c_mktsegment,
        |                  CAST(round(c_acctbal*100) AS BIGINT) AS bal_c FROM customer),
        |a AS (SELECT CAST(SUM(bal_c) AS BIGINT) AS sum_pos, COUNT(*) AS n_pos
        |      FROM c WHERE bal_c > 0)
        |SELECT c_mktsegment, COUNT(*) AS n_cust, CAST(SUM(bal_c) AS BIGINT) AS sum_bal_c
        |FROM c, a
        |WHERE bal_c * n_pos > sum_pos
        |  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        |                  AND o.o_orderdate >= TIMESTAMP '1999-01-01')
        |GROUP BY 1""".stripMargin,
    // Q15: argmax over the quarterly supplier revenue aggregate (ties kept)
    "q15_top_supplier" ->
      """WITH r AS (SELECT l_suppkey,
        |             CAST(SUM(CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT) AS total_rev_c
        |           FROM lineitem
        |           WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
        |           GROUP BY 1)
        |SELECT s_suppkey, s_name, total_rev_c
        |FROM r JOIN supplier ON s_suppkey = l_suppkey
        |WHERE total_rev_c = (SELECT MAX(total_rev_c) FROM r)""".stripMargin,
    // Q7: bidirectional nation-pair trade volume per ship year
    "q7_nation_volume" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |  CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
        |  CAST(SUM(CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_c,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN nation sn ON sn.n_nationkey = s_nationkey
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |JOIN nation cn ON cn.n_nationkey = c_nationkey
        |WHERE sn.n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
        |  AND cn.n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
        |  AND sn.n_name != cn.n_name
        |GROUP BY 1, 2, 3""".stripMargin,
    // Q8: one brand's share of a region's yearly revenue, single pass
    "q8_market_share" ->
      """WITH rc AS (SELECT c_custkey FROM customer
        |            JOIN nation ON n_nationkey = c_nationkey
        |            JOIN region ON r_regionkey = n_regionkey
        |            WHERE r_name = 'ASIA'),
        |y AS (SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
        |        CAST(SUM(CASE WHEN p_brand = 'Brand#1'
        |                 THEN CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)
        |                 ELSE 0 END) AS BIGINT) AS brand_c,
        |        CAST(SUM(CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT) AS total_c
        |      FROM lineitem
        |      JOIN part ON p_partkey = l_partkey
        |      JOIN orders ON o_orderkey = l_orderkey
        |      WHERE o_custkey IN (SELECT c_custkey FROM rc)
        |      GROUP BY 1)
        |SELECT o_year, brand_c, total_c,
        |  CAST(brand_c * 1000000 // total_c AS BIGINT) AS share_micro
        |FROM y""".stripMargin,
    // exact lower median via histogram rank; both engines use RANGE
    // frames, and (segment, price) histogram rows have no peers, so
    // tie semantics align by construction
    "rel_median_order" ->
      """WITH h AS (SELECT c_mktsegment, CAST(round(o_totalprice*100) AS BIGINT) AS price_c,
        |                  COUNT(*) AS cnt
        |           FROM orders JOIN customer ON c_custkey = o_custkey GROUP BY 1, 2),
        |c AS (SELECT c_mktsegment, price_c,
        |        SUM(cnt) OVER (PARTITION BY c_mktsegment ORDER BY price_c) AS cum,
        |        SUM(cnt) OVER (PARTITION BY c_mktsegment) AS total
        |      FROM h)
        |SELECT c_mktsegment, CAST(MAX(total) AS BIGINT) AS n_orders,
        |  CAST(MIN(price_c) AS BIGINT) AS p50_price_c
        |FROM c WHERE cum >= (total + 1) // 2 GROUP BY 1""".stripMargin,
    // Q12 shape: conditional urgency classification over the orderkey join
    "q12_priority_class" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1""".stripMargin,
    // Q13 shape: the zero-order bucket only exists if the filter lives
    // in the outer-join condition
    "q13_order_counts" ->
      """SELECT c_count, COUNT(*) AS custdist FROM (
        |  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        |  GROUP BY c_custkey)
        |GROUP BY 1""".stripMargin,
    // partsupp family: the bridge table is synthesized IDENTICALLY in
    // both engines (pure integer functions of p_partkey, slot 0-3,
    // |supplier|) — see Relational.partsupp; `//` is DuckDB floor
    // division = Spark DIV on these non-negative longs
    "q2_min_cost_supplier" ->
      (PartsuppCte + """,
        |supp AS (
        |  SELECT s_suppkey, s_name, CAST(round(s_acctbal*100) AS BIGINT) AS acctbal_c, n_name
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE'),
        |eu AS (SELECT * FROM partsupp JOIN supp ON ps_suppkey = s_suppkey),
        |mc AS (SELECT ps_partkey, MIN(ps_supplycost_c) AS cost_c FROM eu GROUP BY 1)
        |SELECT acctbal_c, s_name, n_name, p_partkey, cost_c, ps_suppkey
        |FROM eu JOIN mc USING (ps_partkey)
        |JOIN part ON ps_partkey = p_partkey
        |WHERE ps_supplycost_c = cost_c AND p_size <= 15 AND p_type = 'LARGE'
        |ORDER BY acctbal_c DESC, n_name ASC, s_name ASC, p_partkey ASC, ps_suppkey ASC
        |LIMIT 100""".stripMargin),
    "q9_product_profit" ->
      (PartsuppCte + """
        |SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(SUM(CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)
        |       - ps_supplycost_c * CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_profit_c
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
        |JOIN partsupp ON ps_partkey = l_partkey AND ps_i = l_suppkey % 4
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON o_orderkey = l_orderkey
        |GROUP BY 1, 2""".stripMargin),
    "q11_important_stock" ->
      (PartsuppCte + """,
        |held AS (
        |  SELECT ps_partkey, ps_supplycost_c * ps_availqty AS v
        |  FROM partsupp JOIN supplier ON ps_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey WHERE n_name = 'NATION_3'),
        |tot AS (SELECT CAST(SUM(v) AS BIGINT) AS total_c FROM held)
        |SELECT ps_partkey, CAST(SUM(v) AS BIGINT) AS value_c
        |FROM held CROSS JOIN tot GROUP BY ps_partkey, total_c
        |HAVING SUM(v) * 500 > total_c
        |ORDER BY value_c DESC, ps_partkey ASC LIMIT 100""".stripMargin),
    "q16_supplier_cnt" ->
      (PartsuppCte + """
        |SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
        |  CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
        |FROM partsupp JOIN part ON ps_partkey = p_partkey
        |WHERE p_brand <> 'Brand#5' AND p_size IN (1, 9, 19, 29, 39, 49)
        |  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%3')
        |GROUP BY 1, 2, 3""".stripMargin),
    "q20_potential_promo" ->
      (PartsuppCte + """,
        |shipped AS (
        |  SELECT l_partkey, l_suppkey % 4 AS slot,
        |    CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS shipped_qty
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE year(l_shipdate) = 1996 AND p_name LIKE 'small%'
        |  GROUP BY 1, 2)
        |SELECT s_name, COUNT(*) AS n_parts, CAST(SUM(ps_availqty) AS BIGINT) AS avail_qty
        |FROM partsupp
        |JOIN shipped ON ps_partkey = l_partkey AND ps_i = slot
        |JOIN supplier ON ps_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_3' AND ps_availqty * 2 > shipped_qty
        |GROUP BY 1""".stripMargin),
    // Q21 shape: EXISTS / NOT EXISTS double self-join on the order key
    "q21_waiting_supplier" ->
      """SELECT n_name, s_name, COUNT(*) AS numwait
        |FROM lineitem l1
        |JOIN supplier ON s_suppkey = l1.l_suppkey
        |JOIN nation ON n_nationkey = s_nationkey
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l1.l_orderkey AND o_orderstatus = 'F')
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > l1.l_shipdate)
        |GROUP BY 1, 2""".stripMargin,
    "rel_cube" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        |  COALESCE(l_linestatus, 'ALL') AS linestatus,
        |  CAST(SUM(CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_c,
        |  COUNT(*) AS n
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin,
    "rel_q10_returns" ->
      """WITH r AS (
        |  SELECT o_custkey, CAST(SUM(CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_c
        |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |  WHERE l_returnflag = 'R' GROUP BY 1)
        |SELECT c_custkey, c_name, revenue_c,
        |  CAST(ROW_NUMBER() OVER (ORDER BY revenue_c DESC, c_custkey ASC) AS BIGINT) AS rnk
        |FROM r JOIN customer ON c_custkey = o_custkey
        |QUALIFY rnk <= 20""".stripMargin,
    "rel_rollup" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        |  COALESCE(l_linestatus, 'ALL') AS linestatus,
        |  CAST(SUM(CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_c,
        |  COUNT(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin
  )
}
