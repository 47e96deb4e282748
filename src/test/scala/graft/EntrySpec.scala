package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants: every inventory query runs, returns
  * rows, and (where SQL-expressible) has an oracle with matching intent.
  */
class EntrySpec extends AnyFunSuite {
  import TestSpark._

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query key has an oracle") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  test("every oracle key has a query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without query: $orphans")
  }

  test("SURVEY §2 inventory and SparkEntry.queries agree line for line") {
    val survey = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("SURVEY.md")),
      "UTF-8"
    )
    val section = survey.substring(
      survey.indexOf("## §2"),
      survey.indexOf("Plus non-query library surface")
    )
    val surveyKeys = "`([a-z0-9_]+)`".r.findAllMatchIn(section).map(_.group(1)).toSet
    val missingImpl = surveyKeys -- SparkEntry.queries.keySet
    assert(missingImpl.isEmpty, s"SURVEY rows with no queries entry: $missingImpl")
    val undocumented = SparkEntry.queries.keySet -- surveyKeys
    assert(undocumented.isEmpty, s"queries not documented in SURVEY §2: $undocumented")
  }

  // queries whose plans legitimately contain a broadcast nested-loop
  // join: a crossJoin of a PROVABLY tiny broadcast side (5 probes, ≤8
  // centroids, a 1-row total/min) — everything else is banned
  private val tinyBroadcastCrossJoins = Set(
    "ann_topk_bruteforce",
    "emb_matryoshka_eval",       // same ≤5-row probe broadcast, once per prefix-dim tier
    "emb_cosine_histogram",      // same ≤5-row probe broadcast over the corpus
    "ann_ivf_bucketed",
    "ann_recall_vs_nprobe",      // the same ≤8-row centroid + ≤5-row probe broadcasts, once per budget
    "ann_recall_vs_nplanes",     // the brute-force truth leg's ≤5-row probe broadcast
    "emb_pq_distortion",         // the PQ chain's bounded codebook/sample broadcasts
    "ann_ivf_kmeans",
    "ts_profile_cluster",        // k=4 × 24-slot centroid broadcasts, one per Lloyd pass (the ann_ivf_kmeans shape)
    "ann_ivfpq_search",          // ≤8-row centroid broadcast
    "ann_knn_join",              // same ≤8-row centroid broadcast; the query↔corpus meet is a cell-keyed equi-join
    "ann_knn_recall",            // bounded eval-probe broadcast for the brute-force truth + the knn join's own centroid broadcast
    "ann_cell_skew",             // ≤8-row centroid broadcast for the assignment pass
    "ann_hamming_search",        // same ≤5-row probe broadcast over the binary-code table
    "ann_hamming_rerank",        // same probe broadcast; exact dot only after the shortlist group-limit
    "ann_sq_search",             // same ≤5-row probe broadcast over the dequantized-code table; exact dot only after the SQ shortlist
    "ann_recall_vs_shortlist",   // the SQ-search legs + brute-force truth, each the same ≤5-row probe broadcast
    "emb_threshold_curve",       // 1-row corpus-count broadcast under the 4-row tier table
    "text_bm25_topk",            // 1-row (N, avgdl) corpus-stats broadcast, the text_search_topk shape
    "graph_louvain_gain",        // 1-row edge-count broadcast over the per-edge gain table
    "graph_louvain_apply",       // the same 1-row edge-count broadcast under the move-selection rank
    "sample_interleave",         // 1-row total-weight broadcast over the ≤20-row source table
    "ann_hamming_recall",        // composes bruteforce + hamming tiers, all already whitelisted
    "ann_index_search",          // same tail over the persisted index
    "ann_index_append",          // same tail over the appended index
    "ann_index_delete",          // same tail over the tombstone-pruned index
    "text_bigram_pmi",
    "sample_temperature",
    // (contamination_* now pull their 1-row eval-source scalar to the
    // driver — no broadcast crossJoin left in those plans)
    "q22_idle_customers",        // 1-row global-average broadcast
    "q15_top_supplier",          // 1-row global-max broadcast
    "text_coverage_topk",        // 1-row total + 3-row threshold broadcasts
    "text_source_terms",         // 1-row grand-total broadcast
    "text_bpe_train",            // 1-row argmax-pair broadcast per merge round
    "text_bpe_apply",            // same trained-merge chain under the word join
    "text_bpe_batch",            // ≤C-row candidate disjointness anti-join + 1-row merge-list broadcast
    "rel_basket_pairs",          // 1-row order-count broadcast
    "text_search_topk",          // 1-row corpus-size broadcast
    "text_rank_fusion",          // the same 1-row corpus-size broadcast in its TF-IDF leg
    "text_search_index",         // the same 1-row corpus-size broadcast off the stats file
    "rel_rfm_segments",          // 1-row max-order-date broadcast
    "q2_min_cost_supplier",      // 1-row |supplier| broadcast (partsupp bridge)
    "q9_product_profit",         // 1-row |supplier| broadcast (partsupp bridge)
    "q11_important_stock",       // 1-row |supplier| + 1-row total-value broadcasts
    "q16_supplier_cnt",          // 1-row |supplier| broadcast (partsupp bridge)
    "q20_potential_promo",       // 1-row |supplier| broadcast (partsupp bridge)
    "ann_stream_index",          // 5-probe crossJoin over the streamed index (house ANN pattern)
    "ann_recall_eval",           // composes bruteforce + ivfpq, both already whitelisted
    "dedup_recall_eval",         // three 1-row count-aggregate broadcasts into the summary row
    "graph_triangles",           // 1-row count broadcasts into the census row
    "graph_kcore",               // 1-row per-round stat aggregates crossJoined into the trace rows
    "emb_outlier_topk",          // 1-row corpus-centroid broadcast into the d2 scan
    "text_surprisal",            // 1-row corpus-token-count broadcast
    "sample_perplexity_filter",  // the same 1-row corpus-token-count broadcast under the surprisal stage
    "dedup_lsh_tune",            // 1-row truth-count + 4-row config broadcasts
    "approx_kmv_setops",         // |types|²-bounded pair frame: self-join of the 1-row-per-type sketch summary + pair↔sketch tag join, both sides tiny broadcasts
    "dedup_source_overlap",      // same shape over sources: |sources|²-bounded pair frame of 1-row-per-source sketch summaries + pair↔sketch tag join, both sides tiny broadcasts
    "emb_pca_power",             // 1-row corpus-count + 1-row L∞-norm broadcasts into the d²-row scatter iteration
    "text_span_df_profile",      // 1-row total-occurrence broadcast into the band table
    "rel_key_skew_profile",      // 1-row totals+hottest-key broadcast into the band table
    "rel_salt_plan",             // 1-row totals broadcast into the key-frequency table
    "rel_zorder_layout",         // 1-row bucket-bounds + 3-row query-box broadcasts into the zone-map audit
    "ts_drift_tv",               // 1-row global-time-midpoint broadcast into the histogram scan
    "ts_error_spikes"            // 1-row fleet-baseline broadcast into the hourly verdicts
  )

  // unpartitioned windows whose INPUT is an aggregate with a provably
  // compressed key space (not corpus-scaled) — the limit-below-window
  // heuristic can't see that, so these are allowed by name
  private val boundedDomainWindows = Set(
    "text_coverage_topk", // two-level banded prefix sum: the window runs over the (count, prefix) BAND table (≈ |distinct count values| × 16 rows), exactly the design that keeps the full vocabulary off one reducer
    "text_domain_mix",    // unbounded-frame window over the per-SOURCE aggregate — one row per corpus source/domain, a bounded enum
    "pipeline_mix_plan",  // same shape: min-over-sources window on the per-source aggregate
    "rel_histogram_equi", // banded prefix sum: cum/total windows run over the $1000 price-BAND table (bounded few-hundred-row domain), the design that avoids the global sort
    "sample_pack_sequences", // band-offset window over the 256-row md5-band table — the two-level prefix sum's bounded upper level
    "rel_compaction_plan", // band-offset window over the 256-file band table — the same two-level prefix sum's bounded upper level (file-METADATA grain, ~nFiles/256 rows)
    "ann_cell_skew", // total-occupancy window over the nCells-row cell aggregate — the report's whole domain is the cell table
    "emb_dim_variance", // total-variance window over the d-row (=64) per-dimension aggregate
    "mm_modal_mix_plan", // share/min windows over the ≤5-row modality-enum aggregate
    "rel_attribution", // share window over the ≤5-row channel-enum aggregate (the event-type domain)
    "rel_attribution_stream" // same ≤5-row channel-enum share window over the drained rollup
  )

  // one pass over the whole inventory: runs + rows>0 + plan hygiene —
  // NO query may plan a cartesian product, and nested-loop broadcast
  // joins are allowed only on the whitelisted tiny-side cross joins
  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs with rows at sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$name plans a cartesian product")
      if (!tinyBroadcastCrossJoins(name))
        assert(!plan.contains("BroadcastNestedLoopJoin"), s"$name plans a nested-loop join")
      // no query may rank an UNBOUNDED domain on one reducer: an
      // unpartitioned Window is allowed only when its input is provably
      // bounded — a limit / TakeOrdered / rank-pushdown group-limit
      // below it (at 100 TB an unpartitioned window over e.g. a
      // whitespace vocabulary is a 10^9-row single-partition sort)
      val unboundedWindows = df.queryExecution.sparkPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec if w.partitionSpec.isEmpty =>
          val bounded = w.child.find {
            case _: org.apache.spark.sql.execution.GlobalLimitExec           => true
            case _: org.apache.spark.sql.execution.LocalLimitExec            => true
            case _: org.apache.spark.sql.execution.CollectLimitExec          => true
            case _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => true
            case _: org.apache.spark.sql.execution.window.WindowGroupLimitExec => true
            case _ => false
          }.isDefined
          (w, bounded)
      }.collect { case (w, false) => w }
      if (!boundedDomainWindows(name))
        assert(
          unboundedWindows.isEmpty,
          s"$name plans an unpartitioned Window over an unbounded domain:\n${unboundedWindows.mkString("\n")}"
        )
      assert(df.count() > 0, s"$name returned 0 rows")
    }
  }
}
