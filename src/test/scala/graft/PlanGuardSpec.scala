package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan guards over EVERY query — the scale posture enforced at
  * test time, not just by review. A new query that accidentally introduces
  * an unbounded nested-loop join or a cartesian product fails here before
  * it ever reaches the bench.
  */
class PlanGuardSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  /** Queries whose plan legitimately contains BroadcastNestedLoopJoin —
    * every one broadcasts a BOUNDED side (never corpus-sized):
    *   - q10: the 1-row global-min aggregate (class-weight denominator)
    *   - q24: the query set (|Q| = nQueries, fixed)
    *   - q25/q39/q50: the centroid set (|C| = nCentroids, fixed)
    *   - q43/q45: the 1-row corpus-count aggregate (IDF / PMI denominator)
    *   - q72: the 1-row corpus-token-total aggregate (LM denominator)
    *   - q68: the 1-row global-min language-count aggregate
    *   - q83/q94: the centroid set (Lloyd assignment / bucket profile)
    *   - q84: the query set (kNN vote, |Q| = nQueries)
    *   - q86: the 1-row (corpus total, vocab size) aggregate
    *   - q101/q111: the per-group totals relation (|sources| / |months|
    *     rows — the vocab × groups grid is built against a bounded side)
    */
  private val boundedNlj = Set(
    "q161_lapsed_wealth",       // 1-row balance-sum bound
    "q167_vocab_pruning",       // 1-row corpus-token-total bound
    "q174_decile_lift",         // 1-row percentile-cuts bound
    // (q157's 1-row max bound does NOT appear here: the equality filter
    // over its cross join collapses into a BroadcastHashJoin condition)
    "q188_daily_anomaly",       // 1-row global mean/stddev aggregate bound
    "q338_golden_record",       // name-dictionary all-pairs (≤64² rows; was
                                // hidden behind the CC checkpoint before the
                                // r13 supernode contraction)
    "q136_nb_attribution",      // 1-row vocab/corpus totals + label-constant row set
    "q137_rolling_active",      // 1-row max-day aggregate bound
    "q146_lsh_eval",            // 1-row true-pair-count aggregate
    "q147_rfm_segments",        // 1-row reference-date + 1-row quartile aggregates
    "q153_delete_cascade",      // per-table 1-row before/deleted count pairs
    "q101_source_jsd",
    "q111_temporal_jsd",
    "q290_cramers_v",            // 1-row s9/r/c/n aggregates crossed
    "q304_heldout_nll",          // 1-row train-vocab-size bound
    "q307_rbo_eval",             // q24-style 5-row query-broadcast inequality join
    "q308_hill_tail_index",      // 1-row x_k bound over the bounded top-100
    "q294_ndcg_eval",            // q24-style 5-row query-broadcast inequality join
    "q296_wasserstein",          // 1-row (na, nb) totals bound
    "q299_twopass_quantiles",    // bounded histogram (value-range/65536 bins)
    "q300_pipeline_card",        // 1-row raw-count bound for survival ppm
    "q114_source_concentration", // 1-row (total, n_sources) aggregate
    "q116_kmeans_fit",           // k·dim fitted centroid set
    "q117_cluster_purity",       // same fitted centroid broadcast
    "q125_blocking_overlap",     // three 1-row count aggregates
    "q228_benford_audit",        // 1-row digit-total aggregate bound
    "q229_assoc_rules",          // 1-row basket-count aggregate bound
    "q232_welch_ttest",          // 1-row per-segment moment aggregates
    "q236_important_parts",      // 1-row grand-total threshold bound
    "q242_kcore",                // 1-row node/edge count pairs per peel round
    "q244_removal_effect",       // 1-row base-reach aggregate bound
    "q246_simpsons_flip",        // 1-row overall-sign aggregate bound
    "q248_weighted_pagerank",    // 1-row node-count aggregate bound
    "q249_mutual_information",   // 1-row corpus-total aggregate bound
    "q264_modularity",           // 1-row edge/moment aggregate bounds
    "q266_hll_union",            // 1-row register-summary aggregate bounds
    "q268_multistage_sample",    // 1-row stage-count/total aggregate bounds
    "q10_class_weights",
    "q68_temperature_sample",
    "q24_embed_topk",
    "q25_embed_ivf",
    "q39_embed_neardup",
    "q43_tfidf_terms",
    "q45_pmi_cooccurrence",
    "q50_embed_multiprobe",
    "q72_unigram_logprob",
    "q83_kmeans_step",
    "q84_knn_classify",
    "q86_logodds_terms",
    "q94_ivf_profile",
    "q209_bm25_topk",          // 1-row (Σlen, N) corpus-totals bound
    "q214_cusum_changepoint",  // 1-row totals + 1-row max-|cusum| bounds
    "q221_hybrid_retrieval",   // q209's corpus-totals bound (BM25 leg)
    "q223_seasonal_index",     // 1-row (Σn, Σrev) totals bound
    "q273_heavy_hitters",      // 1-row token-total aggregate bound
    "q274_quantized_recall",   // the query set (|Q| = nQueries, fixed)
    "q284_km_survival",        // 1-row corpus-horizon aggregate bound
    "q285_decontam_sweep",     // 1-row train-count aggregate bound
    "q313_hard_negatives",     // fixed nQueries-row broadcast query set
    "q315_isotonic_calibration", // ≤10-row decile grid interval lattice
    "q316_jl_distortion",      // bounded sign matrix + query-row broadcast
    "q318_negative_sampling",  // 1-row corpus-total bounds (×2)
    "q321_cluster_sharding",   // 1-row total-load aggregate bound
    "q322_mrr_eval",           // fixed nQueries-row broadcast query set
    "q323_trending_terms",     // 1-row max-id + corpus-total bounds
    "q333_histogram_quantiles", // 1-row min/max/n + 64-bin histogram bounds
    "q334_join_estimate",      // 1-row per-side stat aggregate bounds
    "q320_damerau_linkage",    // bounded name-dictionary pair broadcast
    "q340_runtime_filter_plan", // 1-row build-count aggregate bound
    "q341_optimize_planner",   // bounded block-stat + date-dictionary broadcasts
    "q344_retention_reclaim",  // 1-row latest-month aggregate bound
    "q345_equidepth_histogram", // bounded histogram + 7-cut broadcasts
    "q346_selectivity_audit",  // 1-row min/max + 64-bin histogram broadcasts
    "q355_stickiness",         // 1-row max-day aggregate bound
    "q366_imputation",         // 1-row stat/median/mode aggregate bounds
    "q421_t_closeness",        // 1-row min/max band bound + 10-row band dict cross
    "q422_pps_sample",         // 1-row total-weight bound + 20-point probe interval join
    "q423_matryoshka_recall",  // q24-style 8-row query-broadcast inequality join
    "q425_aqe_coalesce_sim",   // 1-row total-rows bound crossed into the 128-bucket dict
    "q428_quality_knapsack",   // 1-row total-bytes budget bound
    "q430_vocab_coverage",     // 1-row token-total bound over the vocab dict
    "q431_token_bucket",       // 1-row refill-rate row crossed into the 24-hour grid (r12 fold rewrite)
    "q432_stupid_backoff",     // 1-row train-token-total bound (q304's shape)
    "q435_recency_weights",    // 1-row max-month bound over the month dict
    "q436_abc_xyz",            // 1-row total-revenue bound over the part dict
    "q438_ar2_yule_walker",    // 1-row (n, Σy) bound over the month dict
    "q441_youden_threshold",   // 1-row min/max bound + 9-row threshold sweep cross
    "q445_sales_opportunity",  // 1-row positive-balance average bound (TPC-H Q22 shape)
    "q446_information_value",  // 1-row min/max + (gt, bt) totals bounds
    "q451_qte_deciles",        // 9-row decile probe × per-arm rank inequality join
    "q453_block_bootstrap",    // 1-row month-count bound + 50×20 replicate grid
    "q459_median_ci",          // 1-row (n, ranks) bound crossed into the rank filter
    "q460_ljung_box",          // 1-row (n, Σy) bound over the month dict
    "q461_hash_ring",          // 32-row vnode ring crossed into the key relation
    "q462_error_budget",       // 1-row min-ts bound over events
    "q464_anova_interaction",  // 1-row factor-margin aggregates crossed (7×5 grid)
    "q466_l_moments",          // 1-row n bound crossed into the rank weights
    "q469_range_partitioner_sim", // 31-row sampled split dictionary crossed into the scan
    "q479_ipf_raking",         // 1-row (N, margins) bound over the 5×20 cell grid
    "q481_dirichlet_lm",       // 3-row term-cf + 1-row collection-total bounds
    "q483_holm_correction",    // 1-row global-moment bound over the 5 segments
    "q484_eb_shrinkage",       // 1-row ANOVA-component bound over the brand dict
    "q485_pearson_residuals",  // 1-row grand-total bound over the 5×20 grid
    "q486_coupon_collector",   // 1-row source-count bound (harmonic expectation)
    "q488_bh_fdr",             // 1-row global-moment bound over the 5 segments
    "q490_poisson_gof",        // 1-row (N, λ) + tail-mass bounds over the 11 bins
    "q493_bootstrap_ab_ci",    // 50-row replicate dict crossed + 1-row full-diff bound
    "q494_kruskal_wallis",     // 1-row N/ties totals crossed into the k-row group aggregate
    "q497_lru_stack_distance", // 1-row access total crossed into the ≤|vocab|-row histogram
    "q498_kmv_distinct",       // 1-row exact-distinct bound crossed into the 1-row sketch row
    "q501_hits_trade",         // 1-row max-score normalizer crossed into the ≤n_nations relation
    "q504_kneser_ney",         // 1-row bigram-type total crossed into the bounded type relation
    "q509_somers_gamma",       // 20×20 contingency-cell pair join on x< (bounded, never row pairs)
    "q510_theils_u",           // three 1-row entropy totals crossed together
    "q511_gram_schmidt",       // 1-row dot/norm row crossed into the 64-dim relation
    "q513_variance_ratio",     // 1-row base-variance row crossed into each per-q aggregate
    "q514_dp_noise",           // 3-row ε dictionary crossed into the bounded per-source counts
    "q517_grubbs_test",        // 1-row moment row crossed into the scan for the argmax residual
    "q520_temperature_sweep",  // 1-row total + 3-row T dictionary crossed into per-source counts
    "q521_friedman_w",         // 5-row priority dictionary crossed into the bounded month grid
    "q525_page_trend",         // same 5-row priority dictionary cross as q521
    "q530_histogram_error",    // 1-row min/span row + 5-row range dict crossed into the scan
    "q531_learned_index",      // 1-row OLS-coefficient row crossed into the ranked scan
    "q532_cache_ttl",          // 3-row TTL dictionary crossed into the lag relation
    "q534_join_order_costs",   // five 1-row stat/actual aggregates crossed together
    "q535_load_shedding",      // 1-row capacity row crossed into the per-second arrivals
    "q537_forecast_reconciliation", // 1-row max-month/total rows crossed into ≤n_regions
    "q540_enrichment_test",    // 1-row exact-median row crossed into the doc scan
    "q541_bradley_terry",      // ≤5-region dictionary + 1-row normalizer crossed
    "q547_mann_kendall",       // ~84-month dictionary pair join + 1-row tie row
    "q548_conover_scale",      // 1-row group-total row crossed into the scan
    "q549_calinski_harabasz",  // bounded centroid cross + 1-row W/B/nk rows
    "q550_dunn_index",         // bounded centroid cross + 1-row max-radius row
    "q551_adjusted_rand",      // bounded centroid cross + 1-row pair-count rows
    "q552_fowlkes_mallows",    // bounded centroid cross + 1-row pair-count rows
    "q553_map_eval",           // bounded 5-query broadcast (q294's scaffold)
    "q556_doremi_step",        // 1-row corpus-total row crossed into the source scan
    "q564_newsvendor",         // 1-row Q*/mean row crossed into the demand dictionary
    "q568_hodges_lehmann",     // bounded 84-month dictionary crossed for pair diffs
    "q573_inequality_panel",   // 1-row totals row crossed for the Hoover pass
    "q557_err_eval",           // bounded 5-query broadcast (q294's scaffold)
    "q542_power_mde",          // 1-row variance row + 3-row n dictionary crossed
    "q543_davies_bouldin",     // 1-row mean-ratio row crossed into the 8-cluster relation
    "q523_weighted_kappa",     // bounded 5×5 margin cross + 1-row denominator cross
    "q368_lsh_cost_model",     // 1-row distinct-candidate count bound
    "q369_storage_tiering",    // 1-row max-date aggregate bound
    "q373_postings_intersect", // 1-row corpus-doc-count bound
    "q377_block_bloom",        // 1-row block-count bound
    "q383_seasonal_anomaly",   // 1-row MAD-median aggregate bound
    "q384_reciprocity",        // 1-row mutual-edge aggregate bound
    "q385_neyman_allocation",  // 1-row weight-total / floor-sum bounds
    "q388_array_setops",       // bounded 20-row source-dictionary pairs
    "q392_histogram_2d",       // 1-row min/max bounds broadcast
    "q403_expanding_slope",    // 1-row start-date aggregate bound
    "q405_bowley_skewness",    // 1-row count + bounded histogram broadcasts
    "q406_ri_audit",           // 1-row ref/orphan count pairs per edge
    "q578_quade_test",         // 1-row A-sum crossed with the 1-row T-sum
    "q579_hellinger_sources",  // 1-row corpus-total row in the lang grid
    "q580_tv_distance",        // same sourceLangGrid 1-row total
    "q581_chi2_divergence",    // same sourceLangGrid 1-row total
    "q583_gk_gamma",           // bounded 16-cell contingency self-cross
    "q585_chow_test",          // 1-row pooled-SSR row crossed into the split row
    "q587_brier_decomposition",// 1-row test-total row crossed into 5 bins
    "q592_mcc",                // 1-row train-global row + 1-row confusion row
    "q594_theil_sen",          // bounded ~80-month dictionary pair cross
    "q599_split_gini",         // 1-row root-impurity totals per feature
    "q602_region_mixing",      // 1-row Σa·b row crossed into the totals row
    "q605_mauve_proxy",        // 1-row corpus-total row in the label grid
    "q606_hopkins",            // 1-row ΣU row crossed into the 1-row ΣW row
    "q615_dobrushin",          // 1-row transition-total row behind LIMIT 1
    "q620_german_tank")        // 1-row true-max row crossed into the sample row

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("no query plan contains a CartesianProduct") {
    SparkEntry.queries.keys.foreach { name =>
      assert(!planOf(name).contains("CartesianProduct"), s"$name has a cartesian product")
    }
  }

  test("BroadcastNestedLoopJoin appears only where the broadcast side is bounded") {
    val withNlj = SparkEntry.queries.keys
      .filter(planOf(_).contains("BroadcastNestedLoopJoin")).toSet
    assert(
      withNlj === boundedNlj,
      s"unexpected NLJ in ${withNlj -- boundedNlj}; vanished from ${boundedNlj -- withNlj}")
  }

  test("rank filters plan as map-side WindowGroupLimits") {
    // The per-group top-k must keep only local top-K per map task BEFORE
    // the shuffle — without WindowGroupLimit, a 10^8-doc language would
    // funnel every row into one window partition.
    Seq("q73_group_sample", "q86_logodds_terms", "q89_weighted_sample").foreach { name =>
      assert(planOf(name).contains("WindowGroupLimit"), s"rank-filter pushdown vanished from $name")
    }
  }

  test("r12 broadcast batch stays broadcast (q541/q303/q264/q292/q625)") {
    // r12 replaced 62/56/8/4/4 SortMergeJoins nested through these
    // queries' iteration fan-outs with broadcasts of dictionary-bounded
    // sides (brand/nation/candidate cardinality). A stats change or a
    // Spark upgrade silently re-introducing the SMJ nest is exactly what
    // this pins (r12 verdict item 7).
    Seq("q541_bradley_terry", "q303_keeper_hops", "q264_modularity",
        "q292_adamic_adar", "q625_scc_directed").foreach { name =>
      val p = planOf(name)
      assert(!p.contains("SortMergeJoin"), s"$name re-nested SortMergeJoins")
      assert(p.contains("BroadcastHashJoin"), s"$name lost its broadcast joins")
    }
  }

  test("q87's source-pair generation is join-free (map-side combos, one gram agg)") {
    // The Σ-pairs output must come from per-gram array lambdas, not a
    // gram-key self-join that re-exchanges the full gram relation twice.
    val p = planOf("q87_source_jaccard")
    assert(!p.contains("SortMergeJoin"), s"q87 regressed to a self-join:\n$p")
  }

  test("q96's bloom prefilter survives optimization (might_contain reaches the plan)") {
    // The whole point of the bloom variant is the MAP-SIDE prune before
    // the confirm join; if the filter is optimized away or reordered
    // after the join, q96 silently degrades to q74's full-shuffle plan.
    assert(planOf("q96_bloom_decontam").contains("might_contain"),
      "bloom might_contain prefilter missing from q96's physical plan")
  }

  test("q97 chunking shuffles nothing but the output sort") {
    val exchanges = "Exchange".r.findAllIn(planOf("q97_doc_chunks")).size
    assert(exchanges === 1, s"q97 should have exactly the final sort exchange, found $exchanges")
  }

  test("q95's rule battery is a single corpus scan") {
    val scans = "Scan parquet".r.findAllIn(planOf("q95_gopher_rules")).size
    assert(scans === 1, s"q95 should scan documents once, found $scans scans")
  }

  test("q105's exact pass is join-free: the CMS prefilter stays a literal-array lookup") {
    val p = planOf("q105_heavy_hitters")
    assert(!p.contains("Join"), "q105 grew a join — the sketch prefilter should be broadcast counters in the projection")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans === 1, s"q105's exact pass should scan documents once, found $scans")
  }

  test("q112 scans the corpus once and keys its aggregations by doc id (skew-proof)") {
    val scans = "Scan parquet".r.findAllIn(planOf("q112_intra_doc_repetition")).size
    assert(scans === 1, s"q112 should scan documents once, found $scans scans")
  }

  test("q115's cumulative window partitions by source, never a global sort") {
    val p = planOf("q115_token_budget")
    assert(p.contains("Window"), "q115 lost its window")
    assert(!p.contains("No Partition Defined"), "q115's window went global")
  }

  test("star-join dimension filters push down to the scans (q133/q141)") {
    // The region/date predicates must reach the parquet readers — a scan
    // that reads everything and filters post-join would read 100 TB.
    val p133 = planOf("q133_regional_revenue")
    assert(p133.contains("EqualTo(r_name,ASIA)"), "q133 region filter not pushed to scan")
    assert(p133.contains("GreaterThanOrEqual(o_orderdate"), "q133 date filter not pushed to scan")
    val p141 = planOf("q141_nation_trade")
    assert(p141.contains("GreaterThanOrEqual(l_shipdate"), "q141 ship-date filter not pushed to scan")
  }

  test("q154's predicates all reach the parquet scan (pure-pushdown aggregate)") {
    // Q6 shape: the whole query is scan + 1-row agg; every filter must be
    // in PushedFilters or the scan reads the full fact table.
    // The PushedFilters list is elided ("...") in toString for long
    // filter sets, so assert on the scan-adjacent Filter operator text.
    val p = planOf("q154_forecast_revenue")
    assert("""l_shipdate#\d+ >= 1997-01-01""".r.findFirstIn(p).isDefined,
      "q154 date filter not next to the scan")
    assert("""l_quantity#\d+ < 24\.0""".r.findFirstIn(p).isDefined,
      "q154 quantity filter not next to the scan")
    assert("""l_discount#\d+ >= 0\.05""".r.findFirstIn(p).isDefined,
      "q154 discount filter not next to the scan")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      "q154 lost parquet filter pushdown entirely")
  }

  test("q142's fused top-3 plans as a map-side WindowGroupLimit") {
    assert(planOf("q142_rank_fusion").contains("WindowGroupLimit"),
      "rank-filter pushdown vanished from q142")
  }

  test("q143's EXISTS stays a semi join (never materializes matching lineitems)") {
    assert(planOf("q143_late_orders").contains("LeftSemi"), "q143 lost its semi join")
  }

  test("q138 explodes the corpus once (both consumers read the checkpointed signatures)") {
    // The (doc, hash) relation materializes once; per-doc totals and
    // per-hash counts both read it back, so the final plan holds ZERO
    // parquet scans — the corpus explode cannot run twice.
    val p = planOf("q138_substring_dups")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans === 0, s"q138 should read only the checkpointed signatures, found $scans corpus scans")
    assert(p.contains("ExistingRDD"), "q138 lost its checkpointed signature relation")
  }

  test("q165's lang filter resolves as PARTITION pruning, not a data filter") {
    // The hive-partitioned layout means lang='en' prunes whole
    // directories at listing time — zero non-en bytes ever read.
    val p = planOf("q165_partition_pruning")
    assert(p.contains("PartitionFilters: [isnotnull(lang"),
      "q165 lang filter did not become a partition filter")
    assert("""PushedFilters: \[\], ReadSchema""".r.findFirstIn(p).isDefined ||
      !p.contains("PushedFilters: [IsNotNull(lang)"),
      "q165 lang filter leaked into the data-filter path")
  }

  test("q176's three dimension joins all broadcast (one shuffle join on orderkey)") {
    val p = planOf("q176_part_profit")
    val bhj = "BroadcastHashJoin".r.findAllIn(p).size
    assert(bhj >= 3, s"q176 expected part/supplier/nation broadcasts, found $bhj")
  }

  test("q178's EXISTS/NOT-EXISTS pair stays two stacked aggregates over one scan") {
    val p = planOf("q178_sole_late_supplier")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans === 3, s"q178 expected lineitem+orders+supplier scans, found $scans")
  }

  test("q192's date filter reaches the parquet scan (Q1 is scan-dominated)") {
    val p = planOf("q192_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      "q192 lost its ship-date pushdown")
  }

  test("q193's NOT IN plans as a broadcast anti join") {
    val p = planOf("q193_supplier_diversity")
    assert(p.contains("LeftAnti"), "q193 lost its anti join")
  }

  test("no query plan evaluates Python or interpreted UDF-like stages") {
    SparkEntry.queries.keys.foreach { name =>
      val p = planOf(name)
      assert(!p.contains("BatchEvalPython"), s"$name runs Python")
      assert(!p.contains("ArrowEvalPython"), s"$name runs Python")
    }
  }
}
