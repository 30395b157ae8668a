package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Executable architecture invariant: NO query in the whole surface may
  * plan a cartesian product, and nested-loop joins are allowed only
  * where a declared broadcast baseline or a K-row broadcast constant
  * frame makes them linear. A new query that accidentally cross-joins
  * two fact tables fails here, not in production.
  */
class PlanInvariantsSpec extends SparkTestBase {

  /** Queries whose plans legitimately contain BroadcastNestedLoopJoin:
    * either the DECLARED exact Q×N baseline, or crossJoin(broadcast(x))
    * where x is a K-row centroid/codebook/bounds frame — linear scans
    * by construction, argued in each operator's Scaladoc. */
  private val bnlAllowed = Set(
    "q33_ann_bruteforce", // declared exact baseline
    "q34_ann_ivf", "q57_ann_pq", "q58_ann_ivfpq", "q59_kmeans", // K-row centroids/codebooks
    "q72_ann_ivfpq_residual", // K-row centroids/codebooks
    "q93_sem_dedup", // q59's K-row centroid assign, twice (members + rep)
    "q111_hard_negatives", // q34's K-row centroid assign

    "q49_tfidf_topk", // 1-row corpus count
    "q62_data_profile", // 1-row hash-agg profile × 1-row string bounds
    "q66_resample_ffill", // 1-row grid bounds
    "q119_interp_resample", // 1-row grid bounds (q66's build, twice as-of'd)
    "q68_triangles", // 1-row stats × 1-row triangle count
    "q70_bm25", // 1-row corpus stats
    "q71_heavy_hitters", // 1-row totals × 1-row sketch
    "q75_pmi_pairs", // 1-row corpus count
    "q105_dsir_weights", // 1-row distribution totals
    "q115_ks_drift", // bounded value-grid × sources + 1-row corpus count
    "q125_centroid_confusion", // K-row label-centroid frame (q34/q59 pattern)
    "q133_equiwidth_hist", // 1-row min/max bounds (q66's pattern)
    "q143_ann_recall", // composes q33's declared baseline + q34's probes
    "q144_matryoshka_overlap", // declared Q×N truncation audit
    "q145_token_coverage", // 1-row corpus total + 4-row threshold frame
    "q153_rfm_features", // 1-row corpus last-day frame
    "q156_negative_sampling", // Q-row broadcast node sample (q34 pattern)
    "q157_context_lift", // 1-row pair-event total
    "q160_overlap_sketch", // K-row per-type sketch census (K = |types|)
    "q167_hits", // 1-row max frame per normalize (4 rounds)
    "q170_token_burstiness", // 1-row doc-count frame
    "q171_quantile_norm", // 1-row corpus count onto the bounded census
    "q181_rolling_wau", // 1-row last-day span frame
    "q182_power_iteration", // 1-row max-norm frame per round
    "q184_churn_accounting", // 1-row observed-span frame
    "q185_dedup_threshold_curve" // 1-row corpus count
  )

  private def operators(p: SparkPlan): Seq[SparkPlan] = {
    val self = p match {
      case a: AdaptiveSparkPlanExec => operators(a.inputPlan)
      case other => other.children.flatMap(operators) ++
        other.subqueries.flatMap(operators)
    }
    p +: self
  }

  test("no query plans a cartesian product; nested-loop joins only where declared") {
    val dir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, dir).queryExecution.executedPlan
        val ops = operators(plan)
        val cartesian = ops.exists(_.isInstanceOf[CartesianProductExec])
        val bnl = ops.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec])
        val bad =
          (if (cartesian) Seq(s"$name: CartesianProduct") else Nil) ++
            (if (bnl && !bnlAllowed(name)) Seq(s"$name: undeclared BNLJ") else Nil)
        bad
    }
    assert(offenders.isEmpty,
      s"plan invariant violations:\n${offenders.mkString("\n")}")
  }

  /** Declared shuffle budget per query: the static ShuffleExchange
    * count of the plan each operator's Scaladoc argues for, measured
    * with AQE off (AQE hides exchanges until stage materialization).
    * A future edit that adds an exchange fails HERE, with a named
    * query, instead of surfacing rounds later as a bench regression —
    * raise a budget only with a plan-shape justification in the
    * operator's doc. Counts are static plan properties (sf0.001 reads
    * the same schemas; exchange structure is data-independent). */
  private val shuffleBudgets = Map(
    "q01_pricing_summary" -> 2, "q02_selective_scan" -> 1,
    "q03_revenue_by_nation" -> 2, "q04_top_urgent_orders" -> 1,
    "q05_semi_join" -> 1, "q06_anti_join" -> 1,
    "q07_top_per_customer" -> 2, "q08_running_totals" -> 2,
    "q09_global_topk" -> 0, "q10_distinct_agg" -> 3,
    "q11_set_ops" -> 2, "q12_rollup" -> 2, "q13_cube" -> 2,
    "q14_promo_share" -> 2, "q15_string_funcs" -> 1,
    "q16_small_qty_revenue" -> 2, "q17_order_count_distribution" -> 3,
    "q18_events_daily" -> 3, "q19_json_extract" -> 2,
    "q20_sessionize" -> 2, "q21_asof_last_signup" -> 2,
    "q22_union_dedup" -> 3, "q23_flight_clean" -> 1,
    "q24_flight_airborne" -> 2, "q25_doc_stats" -> 1,
    "q26_doc_langid" -> 1, "q27_doc_fingerprint" -> 1,
    "q28_minhash_lsh_pairs" -> 3, "q29_near_dedup" -> 5,
    "q30_simhash" -> 1, "q31_simhash_pairs" -> 3,
    "q32_ngram_anchor_jaccard" -> 2, "q33_ann_bruteforce" -> 2,
    // q34: the centroid assign/probe ranking runs INSIDE a scalar
    // expression (no N×K window exchange — see Similarity
    // .centroidRanks); what remains is the bucket join + top-k window
    "q34_ann_ivf" -> 2, "q35_emb_neardup" -> 3,
    // q111: q34's map-side probe shape with the label threaded through
    "q111_hard_negatives" -> 2,
    "q36_mm_metadata" -> 1, "q37_mm_features" -> 1,
    "q38_mm_frames" -> 1, "q39_sketch_distinct" -> 3,
    "q40_quantile_sketch" -> 5, "q41_range_join_attribution" -> 2,
    "q42_emb_near_dedup" -> 5, "q43_range_join_natural" -> 2,
    "q44_exact_dedup" -> 2, "q45_asof_custom" -> 4,
    "q46_asof_forward" -> 4, "q47_repetition_stats" -> 5,
    "q48_hash_split" -> 1, "q49_tfidf_topk" -> 6,
    "q50_stratified_sample" -> 1, "q51_feature_binning" -> 2,
    "q52_dedup_clusters" -> 2, "q53_pii_scrub" -> 1,
    "q54_decontaminate" -> 3, "q55_sequence_pack" -> 2,
    "q56_dedup_clusters_ls" -> 2, "q57_ann_pq" -> 4,
    // q58/q59: centroid assignment is map-side (centroidRanks/argmin
    // rewrite); q59's only exchange is the final orderBy
    "q58_ann_ivfpq" -> 5, "q59_kmeans" -> 1,
    "q60_funnel" -> 4, "q61_cohort_retention" -> 5,
    // q62: Expand hash-agg (2) + the split-off grouping-free string
    // bounds pass (1) — the split is what keeps the Expand hash-based
    // (see Quality.profile; measured 3.79 s → 1.60 s isolated)
    "q62_data_profile" -> 3, "q63_constraints" -> 2,
    "q64_geo_density" -> 3, "q65_geo_close_pairs" -> 3,
    "q66_resample_ffill" -> 4, "q67_pagerank" -> 10,
    "q68_triangles" -> 11, "q69_inverted_index" -> 3,
    "q70_bm25" -> 7, "q71_heavy_hitters" -> 5,
    // q72: residual IVF-PQ after the map-side centroidRanks rewrite
    // (was 10 with the window-based assign/probe rankings)
    "q72_ann_ivfpq_residual" -> 5, "q73_dataset_mix" -> 1,
    "q74_dup_gram_coverage" -> 5, "q75_pmi_pairs" -> 3,
    "q76_scd2_history" -> 2, "q77_bigram_lm" -> 2,
    "q78_iqr_outliers" -> 3,
    "q79_unpivot" -> 2, "q80_pivot" -> 3, "q81_grouping_sets" -> 2,
    "q82_quality_rules" -> 2, "q83_cdc_chunk_dedup" -> 6,
    "q84_source_sample" -> 2,
    "q85_bloom_semi_join" -> 5, "q86_zorder_stats" -> 2,
    // q87/q88 run their rounds eagerly (per-round persist + checkpoint
    // — see Graphs.kcore); the declared plan is the post-checkpoint
    // presentation sort only.
    "q87_kcore" -> 1, "q88_bfs_hops" -> 1,
    "q89_vocab_growth" -> 4, "q90_rolling_wavg" -> 2,
    // q91 composes q52 (whose label-prop rounds run eagerly at plan
    // time); the declared plan is clusters→chars join + rank window +
    // canon self-join + presentation sort.
    "q91_er_canonical" -> 8,
    "q92_salted_agg" -> 3,
    // q59's map-side assign leaves only the rep rank window on k and
    // the members↔rep broadcast join.
    "q93_sem_dedup" -> 2,
    // chunk_hash first-occurrence window + doc_id regroup + sort
    "q94_paragraph_dedup" -> 3,
    // q96: vocab join rides a broadcast off the checkpointed BPE
    // vocabulary; doc_id agg + left-join-back + presentation sort
    "q96_bpe_tokenize" -> 3,
    // q97: one per-source running-sum window + presentation sort
    "q97_token_budget" -> 2,
    // q98: cab/ca aggs, pair-key scoring join, doc_id agg + join back
    "q98_lm_fluency" -> 5,
    // q102: clusters(checkpointed leaf) ⋈ split on doc_id + the
    // cluster census groupBy
    "q102_split_leakage" -> 2,
    // q105: bucket agg + 1-row totals agg + per-doc (doc,source) agg
    // + census sort-merge join back to documents + presentation sort
    "q105_dsir_weights" -> 6,
    // q106: (source,score) histogram agg + bounded histogram window +
    // decile regroup (presentation sort folds into the final agg key)
    "q106_quality_calibration" -> 3,
    // q107: user-timeline window + |E|² pair agg + tiny row-normalize
    // window + presentation sort
    "q107_markov_transitions" -> 4,
    // q108: stage frames spliced by doc_id sort-merge joins (langid /
    // quality / canonical off the checkpointed clusters / contam) +
    // the per-source census agg + presentation sort
    "q108_curation_funnel" -> 8,
    // q109: pair list ⋈ two signature projections off the shared
    // persisted hx + presentation sort
    "q109_minhash_calibration" -> 3,
    // q112: map-side tokenize/explode; the only exchange is the
    // output's (doc_id, chunk_idx) range sort
    "q112_sliding_chunks" -> 1,
    // q110: positional-gram eval broadcast semi-join + per-doc
    // two-distinct span agg (expand) + presentation sort
    "q110_contam_spans" -> 4,
    // q103: (source,token) agg + source totals agg + vocab-key
    // self-join (reused exchange) + pair groupBy + Σf agg
    "q103_source_divergence" -> 5,
    // q104: shingle df agg + posting⋈df on sh + per-doc rank window +
    // set-attach join off the persisted hx + prefix self-join on
    // shingle (reused) + output distinct — one more than the old
    // candidate-materializing shape (5), but every exchange is now
    // LINEAR in the posting volume: the r11 sf10 sweep showed the old
    // shape's distinct + two verify joins shuffling the quadratic
    // candidate set (>78 GB spill, ENOSPC on a bounded-vocab corpus);
    // verification now runs inline inside the streamed self-join
    "q104_jaccard_join_exact" -> 6,
    // q99: posting agg + shingle-key self-join (reused) + verify joins;
    // the df-capped blocking adds no exchange beyond the posting agg
    "q99_containment_pairs" -> 4,
    // q100: (hash, source) distinct + hash self-join (reused) +
    // source-pair agg + the two per-source-count joins
    "q100_source_overlap" -> 5,
    // q101: store content/chunk distincts + the two membership joins
    // + incoming doc_id agg + the intra-batch keep-min window (one
    // content_hash exchange over the SMALL side); probe side is the
    // small batch throughout
    "q101_incremental_dedup" -> 6,
    // merge rounds run eagerly (q87 pattern); declared plan = union of
    // BpeRounds one-row checkpoint leaves + presentation sort
    "q95_bpe_merges" -> 1,
    // q113: pair census groupBy + per-lang rank window + presentation
    // sort — the explode itself is map-side
    "q113_bigram_topk" -> 3,
    // q114: (doc,char) census + doc regroup + presentation sort
    "q114_char_diversity" -> 3,
    // q115: the only data-sized exchange is the (source,v) census; the
    // rest (source totals, value grid, grid-completion join, the two
    // cumulative windows, final per-source agg) move the bounded
    // grid × sources frame
    "q115_ks_drift" -> 8,
    // q116: per audited key (×4): the key groupBy the audited join
    // itself would pay + the all-to-one agg of per-key counts
    "q116_skew_audit" -> 8,
    // q117: the q78 shape — one rank window on the group key, the
    // bound pick reuses it, clamp joins by broadcast + final sort
    "q117_winsorized_mean" -> 3,
    // q118: pass 2 only (pass 1's 64-row min/max agg runs eagerly at
    // plan-build, q85 pattern): label agg + presentation sort
    "q118_int8_quant" -> 2,
    // q119: two as-of merges × one user_id Exchange+Sort per side
    // sharing the grid's partitioning + presentation sort (q66 is 4
    // with ONE as-of; the second merge rides the first's exchange)
    "q119_interp_resample" -> 4,
    // q120: one user_id window exchange (both leads share it) + the
    // |types|³ census; top-k is a TakeOrdered, no exchange
    "q120_event_triples" -> 2,
    // q121: the block-key equi-self-join plans broadcast at this SF
    // (shuffle-free; at scale it becomes one reused (lang,blk)
    // exchange), leaving the presentation sort as the only exchange
    "q121_editdist_pairs" -> 1,
    // q122: source totals agg + per-source cumsum window (+ the
    // broadcast-join build) + presentation sort
    "q122_pps_sample" -> 3,
    // q123: (type,dow) census + the two per-type total windows on the
    // 35-row result + presentation sort
    "q123_dow_seasonality" -> 3,
    // q124: q78's rank-window shape run twice (median, then MAD) —
    // the deviation pass reuses the group partitioning
    "q124_mad_outliers" -> 4,
    // q125: centroid posexplode agg (×2: groupBy (label,dim) then
    // label) + per-vector argmin window + |labels|² census + sort
    "q125_centroid_confusion" -> 5,
    // q126: one source-key rank window (the n-count window reuses its
    // exchange) + presentation sort
    "q126_rank_normalize" -> 2,
    // q127: user_id timeline window + (type × bucket) census + the
    // tiny per-type share window + presentation sort
    "q127_gap_histogram" -> 4,
    // q128: quasi-identifier groupBy + presentation sort
    "q128_k_anonymity" -> 2,
    // q129: l_orderkey derive agg + status census (the orders side
    // broadcasts at this SF; at scale the agg's partitioning feeds
    // the sort-merge join directly) + presentation sort
    "q129_totals_reconcile" -> 3,
    // q130: q91's post-checkpoint shape (clusters ⋈ chars + rank
    // window + canon join) + the documents left-join + source census
    "q130_dedup_savings" -> 6,
    // q131: one natural-key rank window + presentation sort
    "q131_latest_compaction" -> 2,
    // q132: q03's aggregation; the K-row rank window and regroup ride
    // the agg's single-partition output + presentation sort
    "q132_topn_other" -> 2,
    // q133: bounds agg (1-row) + bin census + presentation sort
    "q133_equiwidth_hist" -> 3,
    // q134: degree agg (under the explicit broadcast of the
    // low-degree center set — r13 fix: unhinted, the AQE-off plan
    // semi-joined with two extra exchanges) + incidence self-join
    // (reused exchange) + wedge census + the anti-join against the
    // edge set + TakeOrdered
    "q134_link_prediction" -> 5,
    // q135: first-seen agg + distinct + the user_id join + day census
    // (the cumulative window rides the bounded census)
    "q135_growth_accounting" -> 4,
    // q136: (lang, source) census + the margin windows over K rows
    "q136_lang_source_lift" -> 2,
    // q137: (type, week) census + bounded lag window + sort
    "q137_wow_change" -> 3,
    // q138: q60's user_id-keyed chain + the constant bucket census
    "q138_conversion_latency" -> 4,
    // q139: (type, digest) census + type census + sort — the payload
    // itself never shuffles (digested in the scan)
    "q139_mm_dedup" -> 3,
    // q140: daily sketch agg + weekly union merge + the direct-path
    // (week) sketch+distinct aggs joined on week + presentation sort
    "q140_sketch_rollup" -> 5,
    // q141: day census + the constant-sized merge
    "q141_stats_rollup" -> 2,
    // q143: q33's plan (2) + q34's map-side plan (2) + the (q_id,
    // vec_id) audit join and per-query rollup
    "q143_ann_recall" -> 6,
    // q144: ONE Q×N broadcast pass computes both cosines; both rank
    // windows partition by q_id (one exchange, two sorts) + rollup
    "q144_matryoshka_overlap" -> 2,
    // q145: token census + single-partition cumulative window over the
    // constant-size ranked head + threshold rollup
    "q145_token_coverage" -> 3,
    // q146: (type, day) census + type-keyed lag window + sort
    "q146_ewma_anomaly" -> 3,
    // q147: (user, day) distinct + user window (islands + rollup
    // reuse the user exchange) + sort
    "q147_activity_streaks" -> 3,
    // q148: user timeline window + channel rollup + sort
    "q148_last_touch" -> 3,
    // q149: user timeline exchange serves session flag, running
    // session id AND path assembly; path census; TakeOrdered head
    "q149_session_paths" -> 2,
    // q150: day census + single-partition prefix-sum window over the
    // O(days) frame (bin rollup + sort ride the same tiny frame)
    "q150_compaction_plan" -> 2,
    // q151: token census + doc tally on the same token key + doc-keyed
    // join of the per-doc frame back to documents
    "q151_hapax_ratio" -> 5,
    // q152: distinct (source, gram) + spread census on the same gram
    // key + per-source rollup + sort
    "q152_source_novelty" -> 5,
    // q153: flat RFM rollup (distinct-day expand) + (user, type)
    // census/rank + user join + sort; corpus day is a 1-row broadcast
    "q153_rfm_features" -> 7,
    // q154: user timeline exchange (q149's) + position census + sort
    "q154_position_conversion" -> 3,
    // q155: one opening-keyed hash agg (distinct-source Expand rides
    // it) + sort
    "q155_template_openings" -> 3,
    // q156: the capped incidence expands under nodes / the sample /
    // both neighborhood probes; identical subtrees collapse to
    // ReusedExchange at execution — the budget is the REAL exchanges
    // of the deduped plan: incidence distinct + basket window + node
    // distinct + sample + probe joins + neighbor distinct + rank
    // window + sort
    "q156_negative_sampling" -> 12,
    // q157: pair census + two marginal windows on the same frame +
    // TakeOrdered league; the total is a 1-row broadcast
    "q157_context_lift" -> 5,
    // q158: customer join (two sides at sf0.001 static estimates) +
    // QI census with distinct Expand + sort
    "q158_l_diversity" -> 5,
    // q159: user-keyed purchase×touch join + p_id share windows +
    // channel rollup + direct anti-join + sort
    "q159_linear_attribution" -> 8,
    // q160: (user, type) distinct + per-type census + user-keyed
    // overlap self-join + pair census + final pair join + sort; the
    // K-row sketch cross is broadcast
    "q160_overlap_sketch" -> 9,
    // q161: three partial builds (base, delta, rebuild certificate)
    // each one custkey join + nation census; merge + final join ride
    // the nation-keyed frames; 25-row nation broadcast
    "q161_mv_incremental" -> 7,
    // q162: one type-keyed exchange serves rank + count windows AND
    // the (type, bucket) census + sort
    "q162_equidepth_hist" -> 2,
    // q163: token explode → per-doc census + doc join + two value-
    // census builds (bounded single-partition windows) + two census
    // joins + the 1-row moment aggregation
    "q163_spearman_corr" -> 9,
    // q164: (type, day) census + type-keyed lag window + per-lag
    // rollups off the same census + sort
    "q164_volume_autocorr" -> 5,
    // q165: (type, day) census + one type-keyed window exchange
    // (baseline, prefix sums and running mins all share it) + sort
    "q165_cusum_shift" -> 3,
    // q166: (type, day) census + type window (trend; the seasonal
    // census RIDES it as a ReusedExchange) + presentation sort; the
    // (type, dow) join-back broadcasts
    "q166_seasonal_decompose" -> 3,
    // q167: rounds run eagerly against the checkpointed incidence and
    // node-frame checkpoints (see Graphs.hits — the broadcast-max
    // builds forced the materialization); the declared plan is the
    // final pdeg join off the checkpoint leaves + presentation sort
    "q167_hits" -> 3,
    // q168: the corpus-scale work (bigram census + vocab census +
    // edge agg) runs eagerly into the ≤V²/2-row edge checkpoint
    // (round 13 — see textrank's scaladoc; before it the unrolled
    // static plan re-derived the census per reference: 96 parquet
    // scans, 12 shuffles, rescued only by AQE reuse); the declared
    // plan is wsum agg + 3 rounds × (join + dst agg) + degree agg +
    // final join off the checkpoint leaves; TakeOrdered head
    "q168_textrank" -> 8,
    // q169: token census; the top-N head is TakeOrdered and every
    // window/moment runs on the constant N-row frame
    "q169_zipf_fit" -> 1,
    // q170: (tok, doc) census + tok rollup + presentation sort; the
    // doc count is a 1-row broadcast
    "q170_token_burstiness" -> 3,
    // q171: source census + source window exchange + global census
    // (+ its bounded single-partition cumulative window) + the merge
    // frame's single-partition sort + presentation sort — all census-
    // sized after the two aggs
    "q171_quantile_norm" -> 6,
    // q172: (type, day) census + type window + the per-type moment
    // rollup rides the window's partitioning... plus presentation sort
    "q172_volume_trend" -> 3,
    // q173: posexplode is map-side; dim hash agg + presentation sort
    "q173_embedding_stats" -> 2,
    // q174: q107's user window + K² census chain: census agg + the
    // from_type share window + two mult joins (each join + agg) + the
    // two full-outer splice joins + presentation sort — everything
    // past the window moves the K²-row matrix
    "q174_markov_power" -> 10,
    // q175: 9-row digit census + the single-partition total window +
    // presentation sort rides it
    "q175_benford_audit" -> 2,
    // q176: (doc, tok) tf census + df census + the weighted join +
    // (doc, key) collision-merge agg + doc vector agg + the rare-token
    // blocked self-join (reused exchange) + pair distinct + the two
    // verify joins' pair-key exchange + presentation sort
    "q176_tfidf_cosine_join" -> 9,
    // q177: q67's plan-only rounds (edge-build exchanges dedupe via
    // ReuseExchange — 4 reused statically) + the 3 rounds' dst
    // censuses + the final report join + presentation sort; the ONE
    // fused (node, deg, sm) frame is a checkpointed NODE-sized scan
    // (r13 sf10 OOM fix; r14 fused the former deg+seed pair and the
    // two-join report tail into one join — SMJ 11 → 10 in the golden)
    "q177_personalized_pagerank" -> 8,
    // q178: q52's label-prop rounds run eagerly at plan time (q87
    // pattern); the declared plan is the hash projection off the
    // checkpointed cluster leaf + presentation sort
    "q178_cluster_split" -> 1,
    // q179: per-doc token agg + the doc left-join + length census +
    // threshold rollup (the explode itself is map-side on the census)
    "q179_truncation_curve" -> 4,
    // q180: both placements are map-side hashes; (scheme, shard)
    // census + the 2·N-row skew window + presentation sort
    "q180_shard_balance" -> 3,
    // q181: (user, day) distinct + day-keyed distinct-count agg +
    // presentation sort; the constant-width unfold is map-side and
    // the span frame is a 1-row broadcast
    "q181_rolling_wau" -> 5,
    // q182: Gram census + rounds run eagerly against checkpointed D-
    // and D²-cell frames (Similarity.powerIteration); the declared
    // plan is the final normalize off the last round's leaf + sort
    "q182_power_iteration" -> 2,
    // q183: incidence self-join (reused) + degree census + the two
    // degree splices on the adjacency + the 1-row moment rollup
    "q183_assortativity" -> 7,
    // q184: (user, week) distinct + user window (lag/lead share it) +
    // two O(weeks) censuses + their splice + presentation sort; the
    // span frame is a 1-row broadcast
    "q184_churn_accounting" -> 6,
    // q185: q28's pairs pipeline feeds two |T|·pairs aggs + the
    // (t, doc) distinct + the |T|-row splice joins + sort; corpus
    // count is a 1-row broadcast
    "q185_dedup_threshold_curve" -> 9,
    // q142: block distinct + digest df census + digest self-join
    // (reused exchange) + pair census + presentation sort
    "q142_frame_overlap" -> 5
  )

  /** Queries whose plans must statically reuse an exchange — the
    * self-join families where both sides are the same frame, so the
    * physical plan should shuffle ONCE (ReuseExchange applies even
    * before AQE's runtime stage reuse). */
  private val mustReuseExchange = Seq(
    "q28_minhash_lsh_pairs", // band self-join
    "q35_emb_neardup", // bucket self-join
    "q67_pagerank", "q68_triangles" // shared co-purchase edge build
  )

  test("no query exceeds its declared shuffle budget; self-join families reuse exchanges") {
    val dir = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val queries = SparkEntry.queries
      val missing = queries.keySet.diff(shuffleBudgets.keySet)
      assert(missing.isEmpty,
        s"queries without a declared shuffle budget: ${missing.toSeq.sorted}")
      val over = shuffleBudgets.toSeq.sortBy(_._1).flatMap { case (name, budget) =>
        val ops = operators(queries(name)(spark, dir).queryExecution.executedPlan)
        val n = ops.count(_.isInstanceOf[ShuffleExchangeLike])
        if (n > budget) Seq(s"$name: $n shuffles > budget $budget") else Nil
      }
      assert(over.isEmpty, s"shuffle budget violations:\n${over.mkString("\n")}")
      mustReuseExchange.foreach { name =>
        val ops = operators(queries(name)(spark, dir).queryExecution.executedPlan)
        assert(ops.exists(_.isInstanceOf[ReusedExchangeExec]),
          s"$name: expected a ReusedExchange (self-join shuffling once)")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
