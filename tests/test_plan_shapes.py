"""Physical-plan shape gates: queries that claim a scale-safe join
strategy must actually plan it. Guards against regressions where an
equi-join silently degenerates into a nested loop / cartesian product
(the O(N²) shapes that melt at 100 TB)."""

from __future__ import annotations

from data_engineering_rag_spark.plans import REGISTRY


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_near_dup_via_ivf_is_equi_join(spark, sf_dir):
    """The production near-dup path must be a hash/sort-merge equi-join
    on the bucket key — never a BroadcastNestedLoopJoin or cartesian
    product over the full table."""
    df = REGISTRY["embedding_near_dup_via_ivf"].spark(spark, sf_dir)
    plan = _physical_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_near_dup_via_ivf_salts_the_self_join(spark, sf_dir):
    """r13 scale rewrite (caught by the expanded scaleprobe): the
    bucket self-join must carry the (p, q) salt sub-block columns in
    its equi-join keys — the bare 10-value label key capped the join
    at 10 tasks and blew the SMJ group buffer at sf10 (4,991 s vs the
    salted plan's wall; same 10.8M-pair answer). pmod-derived salts
    appearing as join keys is the pinned shape."""
    df = REGISTRY["embedding_near_dup_via_ivf"].spark(spark, sf_dir)
    plan = _physical_plan(df)
    assert "pmod" in plan, plan
    # both salt columns are equi-join keys (pa/qa vs pb/qb)
    for col in ("pa", "qa", "pb", "qb"):
        assert col in plan, (col, plan)


def test_near_dup_via_ivf_emits_each_pair_once(spark):
    """The triangle decomposition's exactly-once claim, checked
    directly: no (vec_a, vec_b) key may appear twice, every pair must
    be canonically oriented, and the pair SET must equal the unsalted
    label self-join's (the oracle proves values; this pins the set
    even where oracles don't run)."""
    import pyspark.sql.functions as F

    sf = "/root/testdata/sf0.01"
    df = REGISTRY["embedding_near_dup_via_ivf"].spark(spark, sf)
    dup = df.groupBy("vec_a", "vec_b").count().where(F.col("count") > 1)
    assert dup.count() == 0
    assert df.where(F.col("vec_a") >= F.col("vec_b")).count() == 0
    # The docstring's set-equality claim, asserted (r14, ADVICE): the
    # salted pairs must equal the plain unsalted label self-join's.
    from data_engineering_rag_spark.plans import load
    from data_engineering_rag_spark.plans.vectors import NEAR_DUP_COS, dot, l2_norm_sq

    v = (
        load(spark, sf, "embeddings")
        .select(
            "vec_id", "label",
            F.col("embedding").cast("array<double>").alias("ev"),
        )
        .withColumn("nrm", F.sqrt(l2_norm_sq(F.col("ev"))))
    )
    a = v.select(
        F.col("vec_id").alias("vec_a"), F.col("label").alias("la"),
        F.col("ev").alias("ea"), F.col("nrm").alias("na"),
    )
    b = v.select(
        F.col("vec_id").alias("vec_b"), F.col("label").alias("lb"),
        F.col("ev").alias("eb"), F.col("nrm").alias("nb"),
    )
    plain = (
        a.join(b, (F.col("la") == F.col("lb")) & (F.col("vec_a") < F.col("vec_b")))
        .select(
            "vec_a", "vec_b",
            (F.round(dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), 8)
             + F.lit(0.0)).alias("cosine"),
        )
        .where(F.col("cosine") > NEAR_DUP_COS)
    )
    assert df.exceptAll(plain).count() == 0
    assert plain.exceptAll(df).count() == 0


def test_lsh_candidate_pairs_is_equi_join(spark, sf_dir):
    """LSH banding's self-join is an equi-join on (band, band_hash)."""
    df = REGISTRY["minhash_lsh_candidate_pairs"].spark(spark, sf_dir)
    plan = _physical_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_knn_graph_is_equi_join(spark, sf_dir):
    df = REGISTRY["knn_graph_by_label"].spark(spark, sf_dir)
    plan = _physical_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_simhash_near_dup_pairs_is_equi_join(spark, sf_dir):
    """SimHash banding: candidate generation and the signature re-join
    for hamming verification are all equi-joins on (band, band_value) /
    doc_id — no all-pairs shape anywhere in the plan."""
    df = REGISTRY["simhash_near_dup_pairs"].spark(spark, sf_dir)
    plan = _physical_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_minhash_dedup_verify_stage_is_equi_join(spark, sf_dir):
    """The end-to-end dedup pipeline's pre-CC stages (LSH banding +
    Jaccard verification joins on doc_id) must stay equi-joins; the CC
    driver loop executes eagerly inside the query function, so the
    returned plan covers the final component/size join."""
    df = REGISTRY["minhash_dedup_canonical"].spark(spark, sf_dir)
    plan = _physical_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_snapshot_diff_single_join_no_nested_loop(spark, sf_dir):
    """CDC diff is one full-outer hash join on the key."""
    df = REGISTRY["snapshot_diff_orders"].spark(spark, sf_dir)
    plan = _physical_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "FullOuter" in plan, plan


def test_pagerank_iterations_are_equi_joins(spark, sf_dir):
    df = REGISTRY["pagerank_knn_2iter"].spark(spark, sf_dir)
    plan = _physical_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_retrieval_eval_scoring_broadcasts_queries(spark, sf_dir):
    """The eval-search join must broadcast the query-vector side (the
    index side never shuffles at scoring time). build_tfidf's 1-row
    n_docs crossJoin legitimately plans a broadcast-cross of a scalar —
    every OTHER nested-loop join is a regression, so count them."""
    df = REGISTRY["retrieval_eval_metrics"].spark(spark, sf_dir)
    plan = _physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    n_bnlj = plan.count("BroadcastNestedLoopJoin")
    n_scalar_cross = plan.count("BroadcastNestedLoopJoin BuildRight, Cross")
    assert n_bnlj == n_scalar_cross, plan


def test_rerank_scorer_sees_only_the_pool(spark, sf_dir):
    """Two-stage contract: the Python scorer (MapInPandas) must sit
    ABOVE the top-k pool truncation, so the expensive stage touches
    pool-many rows, never the corpus. (Scalar 1-row crosses from
    query-vector normalization are benign and not gated here.)"""
    from data_engineering_rag_spark.plans.rag import RERANK_POOL_K

    df = REGISTRY["rerank_stub_topk"].spark(spark, sf_dir)
    plan = _physical_plan(df)
    assert "MapInPandas" in plan, plan
    assert f"TakeOrderedAndProject(limit={RERANK_POOL_K}" in plan, plan
    pandas_pos = plan.index("MapInPandas")
    pool_pos = plan.index(f"TakeOrderedAndProject(limit={RERANK_POOL_K}")
    assert pandas_pos < pool_pos, "scorer must consume the truncated pool"


def test_crossdoc_ngram_join_is_equi_join(spark, sf_dir):
    """Gram frequency rejoin is an equi-join on the gram key — never a
    nested loop over the exploded window table."""
    df = REGISTRY["crossdoc_ngram_dup_fraction"].spark(spark, sf_dir)
    plan = _physical_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_triangle_wedge_join_is_equi_join(spark, sf_dir):
    """Triangle counting's edge-edge-edge joins are equi-joins on node
    keys (degree is bounded by k, so this is the linear-in-|N| shape).
    The final combine of three SINGLE-ROW aggregates is an intentional
    broadcast cross join — allowed; what must never appear is a
    CartesianProduct or a nested loop carrying an edge-table stream."""
    df = REGISTRY["knn_triangle_stats"].spark(spark, sf_dir)
    plan = _physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    # every wedge join planned as hash/sort-merge equi-join
    assert "SortMergeJoin [b" in plan or "BroadcastHashJoin [b" in plan, plan


def test_q11_total_is_broadcast_not_window(spark, sf_dir):
    """q11's global total joins in as a broadcast single row; the plan
    must not fall back to a cartesian/nested-loop over all parts (a
    1-row broadcast nested loop is fine and expected — assert no
    SortMergeJoin/shuffle on the threshold compare instead)."""
    df = REGISTRY["q11_important_parts"].spark(spark, sf_dir)
    plan = _physical_plan(df)
    assert "CartesianProduct" not in plan, plan


def test_binned_range_join_is_equi_join(spark, sf_dir):
    """The interval-containment join must plan as a hash/sort-merge
    equi-join on (user_id, bucket) with the BETWEEN as a residual
    filter — the whole point of the binning rewrite."""
    df = REGISTRY["events_errors_per_session"].spark(spark, sf_dir)
    plan = _physical_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


# --- Global-window gate: a Window with orderBy and no partitionBy plans
# `Exchange SinglePartition` — every row through ONE task, the classic
# 100 TB scale-killer. The six queries below used to ship it; they must
# now plan threshold-broadcast / range-exchange / TakeOrdered shapes.
# Pool-bounded windows (input capped by an upstream limit, e.g. the
# rag.py rerank pools and zipf's top-N) stay exempt.

import re


def _unbounded_single_partition_windows(plan: str) -> int:
    """Count Window nodes fed by an `Exchange SinglePartition` whose
    input is NOT bounded by a limit (TakeOrderedAndProject /
    GlobalLimit / LocalLimit directly beneath the exchange)."""
    lines = plan.splitlines()
    hits = 0
    for i, ln in enumerate(lines):
        if not re.search(r"\bWindow\b", ln):  # excludes WindowGroupLimit
            continue
        for j in range(i + 1, min(i + 4, len(lines))):
            if "Exchange SinglePartition" in lines[j]:
                below = "\n".join(lines[j + 1 : j + 3])
                if not re.search(r"TakeOrderedAndProject|GlobalLimit|LocalLimit", below):
                    hits += 1
                break
    return hits


def test_detector_flags_global_window(spark, sf_dir):
    """Positive control: the detector must flag the anti-pattern it
    exists to catch (guards the gate itself against plan-text drift)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    df = (
        spark.range(0, 1000)
        .withColumn("rn", F.row_number().over(Window.orderBy("id")))
    )
    assert _unbounded_single_partition_windows(_physical_plan(df)) == 1


GLOBAL_WINDOW_GATED = [
    "orders_rfm_segments",
    "quality_decile_tiers",
    "temporal_split_audit",
    "orders_pareto_frontier",
    "vocab_oov_stats",
    "zipf_fit_stats",
]


AUDITQ_ROUND6 = [
    "zorder_layout_audit", "bloom_prefilter_audit", "kmv_overlap_matrix",
    "k_anonymity_audit", "time_weighted_user_value", "session_gap_survival",
    "robust_outlier_audit", "events_attribution_last_touch",
    "split_leakage_audit", "contrastive_negatives_sample",
    "embedding_centroid_shift", "shingle_containment_pairs",
    "pq_codebook_train", "hits_hub_authority", "markov_stationary_power",
    "partition_file_planner", "funnel_time_to_convert", "doc_prefix_dedup",
    "good_turing_counts", "acctbal_gini_by_nation",
    # analyticsq forward batch
    "basket_pair_lift_top20", "customer_ltv_cohort", "supplier_scorecard",
    "orders_status_trend_ols", "ewma_user_value", "events_hourly_anomaly",
    "text_readability_scores", "window_value_functions",
    "weighted_median_price_by_flag", "rolling_7d_active_users",
    "knn_degree_powerlaw", "length_decile_normalize",
    "scalar_variant_events", "pandas_udaf_geomean", "pyds_telemetry_agg",
    "knn_two_hop_reach", "repeat_purchase_intervals",
    "sessions_bounce_rate_daily", "lang_source_chisq",
    # curationq (round 6g)
    "semantic_cluster_dedup", "dsir_importance_scores",
    "bigram_lm_perplexity_buckets", "nb_source_confusion",
    "curriculum_order_assign", "pipeline_retention_funnel",
    # round-6h ops
    "merge_upsert_orders", "l_diversity_audit", "lsh_banding_design_curve",
    "part_abc_classification", "dup_span_stats",
    # round-6j Spark-4 SQL syntax surface
    "recursive_cte_bfs_hops", "pipe_syntax_returns_summary",
    # round-6k stats/sampling + IVM
    "neyman_budget_allocation", "bootstrap_mean_ci_poisson",
    "ivm_join_delta_merge",
]


def test_no_unbounded_single_partition_windows(spark, sf_dir):
    for name in GLOBAL_WINDOW_GATED + AUDITQ_ROUND6:
        df = REGISTRY[name].spark(spark, sf_dir)
        plan = _physical_plan(df)
        n = _unbounded_single_partition_windows(plan)
        assert n == 0, f"{name}: {n} unbounded single-partition window(s)\n{plan}"


def test_grouped_window_rewrites_keep_parallel_shape(spark, sf_dir):
    """The low-cardinality-group rewrites must keep their parallel
    shape. grouped_prefix_sum still carries its two-phase kernel (the
    per-(group, partition) column appears in the Window spec).
    grouped_top_k was simplified in r17 to a single row_number window
    because Spark 3.5+ plans the rank<=k filter as a per-partition
    WindowGroupLimit BEFORE the exchange (SPARK-37099) — the invariant
    to pin is therefore that WindowGroupLimit is present, i.e. at most
    k rows per input partition per group reach the ≤|groups| final
    tasks (a Spark regression or a filter spelling that defeats the
    pushdown would drop the node)."""
    for name, marker in [
        ("sample_n_per_lang", "WindowGroupLimit"),
        ("top_terms_per_lang", "WindowGroupLimit"),
        ("sequence_pack_greedy", "_gps_pid"),
        ("events_winsorized_values", "_gps_pid"),
        # round-6 auditq: per-source/per-pair/per-anchor top-k and the
        # within-nation Gini rank all ride the grouped kernels
        ("kmv_overlap_matrix", "WindowGroupLimit"),
        ("contrastive_negatives_sample", "WindowGroupLimit"),
        ("acctbal_gini_by_nation", "_gps_pid"),
        ("weighted_median_price_by_flag", "_gps_pid"),
        ("length_decile_normalize", "_gps_pid"),
    ]:
        plan = _physical_plan(REGISTRY[name].spark(spark, sf_dir))
        assert marker in plan, f"{name}: expected {marker} in plan\n{plan}"


ROUND7_QUERIES = [
    "lateral_topn_customers", "trigram_blocked_fuzzy_join",
    "logreg_gradient_step", "join_cardinality_estimate",
    "conformal_interval_coverage", "dp_noised_counts_audit",
    "parquet_encoding_planner", "orders_drift_ks_binned",
    # batch 2
    "feature_hashing_collision_audit", "target_encoding_loo",
    "decision_stump_train", "kfold_cv_mean_predictor",
    "logreg_calibration_bins", "pit_feature_join_purchases",
    "bitmap_rolling_actives",
    # batch 3
    "cuped_ab_test", "postings_compression_audit", "km_user_churn",
    "changepoint_daily_events", "pinball_quantile_grid",
    # batch 4
    "spearman_acctbal_orders", "feature_mi_ranking",
    "levene_variance_test", "theil_sen_daily_trend",
    # batch 5
    "sql_sugar_group_by_all", "parameterized_sql_orders",
    "huber_mean_value_by_type", "equidepth_histogram_totalprice",
]


def test_round7_no_unbounded_global_windows(spark, sf_dir):
    """Round-7 additions: the only single-partition window is the
    drift test's CDF pass over the limit-bounded ≤200-bin aggregate
    (exempted by the detector's limit rule, like the bootstrap
    replicate table)."""
    for name in ROUND7_QUERIES:
        plan = _physical_plan(REGISTRY[name].spark(spark, sf_dir))
        n = _unbounded_single_partition_windows(plan)
        assert n == 0, f"{name}: {n} unbounded single-partition window(s)\n{plan}"


def test_round7_join_shapes_are_equi(spark, sf_dir):
    """The join-bearing round-7 plans must stay hash/sort-merge
    equi-joins: the blocked fuzzy join (block_key / trigram equi-joins,
    never all-pairs over the dictionary), the decorrelated LATERAL
    top-N, and conformal's broadcast per-group predictor joins.
    (logreg / drift_ks legitimately broadcast-cross a ONE-ROW scalar
    aggregate — same exemption as build_tfidf's n_docs — so they are
    asserted separately via the scalar-side row bound.)"""
    for name in (
        "trigram_blocked_fuzzy_join",
        "lateral_topn_customers",
        "conformal_interval_coverage",
        "join_cardinality_estimate",
        "kfold_cv_mean_predictor",
        "pit_feature_join_purchases",
        "feature_hashing_collision_audit",
    ):
        plan = _physical_plan(REGISTRY[name].spark(spark, sf_dir))
        assert "BroadcastNestedLoopJoin" not in plan, f"{name}\n{plan}"
        assert "CartesianProduct" not in plan, f"{name}\n{plan}"
    # scalar-broadcast queries: the cross side must be an Aggregate
    # with no grouping keys (exactly one row), which is the safe shape
    for name in ("logreg_gradient_step", "orders_drift_ks_binned",
                 "target_encoding_loo", "logreg_calibration_bins",
                 "cuped_ab_test", "km_user_churn", "pinball_quantile_grid"):
        df = REGISTRY[name].spark(spark, sf_dir)
        plan = _physical_plan(df)
        assert "CartesianProduct" not in plan, f"{name}\n{plan}"
        assert len(df.collect()) >= 1


#: The round-8 family was split into thematic modules in round 10
#: (VERDICT r9 item 7) — the shape gates keep covering all of them.
_ROUND8_FAMILY_MODULES = ("round8q", "stattestsq", "forecastq", "sketchq", "linkageq")
ROUND8_QUERIES = [
    n for n, s in REGISTRY.items()
    if s.spark.__module__.rsplit(".", 1)[-1] in _ROUND8_FAMILY_MODULES
]

#: Round-8 queries whose plans legitimately contain single-partition
#: windows: each rides a PROVABLY BOUNDED aggregate, never raw rows —
#: the distinct-value rank tables are domain-bounded (2-decimal values
#: in [0, ~1000] → ≤ ~100k rows), per-nation tables are ≤ 25 rows, and
#: daily rollups are calendar-bounded (≤ 36 600 rows for a century).
#: The count pins the exact number so a regression that moves a window
#: onto raw rows (or adds one) fails loudly.
ROUND8_BOUNDED_GLOBAL_WINDOWS = {
    "mann_whitney_purchase_vs_rest": 1,   # rank cumsum over distinct values
    "kruskal_wallis_value_by_type": 1,    # same rank table
    "anova_f_price_by_status": 1,         # ordered prefix sum over ≤3 groups
    "bh_fdr_nation_acctbal": 2,           # p-value rank + count over ≤25 nations
    "page_hinkley_daily_drift": 1,        # PH recursion over the daily rollup
    "runs_test_daily_counts": 1,          # lag compare over the daily rollup
    "stl_weekly_decompose_events": 1,     # 7-day moving avg over the daily rollup
}


def test_round8_no_unbounded_global_windows(spark, sf_dir):
    """Round-8 additions: any single-partition window must be one of
    the documented bounded-aggregate cases above, at its pinned count;
    everything else must have zero."""
    for name in ROUND8_QUERIES:
        plan = _physical_plan(REGISTRY[name].spark(spark, sf_dir))
        n = _unbounded_single_partition_windows(plan)
        allowed = ROUND8_BOUNDED_GLOBAL_WINDOWS.get(name, 0)
        assert n == allowed, (
            f"{name}: {n} single-partition window(s), {allowed} allowed\n{plan}"
        )


def test_round8_join_shapes_are_equi(spark, sf_dir):
    """Join-bearing round-8 plans stay equi (hash/sort-merge/broadcast)
    — the FS linkage blocked pair join, the KN continuation joins, the
    ACF/Mann-Kendall lag self-joins, and the Yuen cut-table joins must
    never degrade to a nested-loop over data rows. Broadcast
    nested-loop joins ARE expected where a 1-row scalar aggregate
    crosses the data (the canonical broadcast-scalar pattern), so only
    non-broadcast cartesian products fail."""
    for name in [
        "fellegi_sunter_linkage", "kneser_ney_bigram_topk",
        "daily_count_acf", "mann_kendall_trend", "yuen_trimmed_ttest",
        "item_cosine_similarity_topk", "association_rules_conviction_topk",
    ]:
        plan = _physical_plan(REGISTRY[name].spark(spark, sf_dir))
        assert "CartesianProduct" not in plan, f"{name}:\n{plan}"


def test_jaccard_verification_join_no_forced_broadcast(spark, sf_dir):
    """VERDICT r8: the candidate-pair set is data-dependent and
    unbounded in principle, so the verification join must carry NO
    broadcast hint (AQE may still pick broadcast when cand measures
    small — that's fine; a forced hint routing an unbounded relation
    through the driver is not). It must also stay an equi-join."""
    df = REGISTRY["jaccard_prefix_filter_pairs"].spark(spark, sf_dir)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed, analyzed
    plan = _physical_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_media_dedup_shuffle_carries_digests_not_payloads(spark, sf_dir):
    """media_dedup_payloads' 100 TB claim: payloads are hashed JVM-side
    and the shuffle moves 32-byte digests + counts, never media bytes.
    Pin it: no Exchange in the executed plan may list the payload
    column among its outputs, and the scan must prune to the three
    synthesis inputs (doc_id, text, n_chars) — no payload column even
    exists before the mapInPandas stage."""
    df = REGISTRY["media_dedup_payloads"].spark(spark, sf_dir)
    plan = _physical_plan(df)
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "payload#" not in line, line
    import re

    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
        assert cols <= {"doc_id", "text", "n_chars"}, m.group(1)


def test_ml_lsh_probe_join_broadcasts_probe_side(spark, sf_dir):
    """ml_minhash_similarity_join's 100 TB claim: the candidate
    equi-join builds/broadcasts the PROBE block (|probes|·L hash
    entries — constant), never the exploded corpus (n·L entries, each
    carrying the full sparse vector). The ML-transformed sides have no
    reliable size estimate, and before the round-11 fix Spark chose
    BuildRight — building the CORPUS side as the broadcast hash
    relation, which OOMed the driver at ~30x bench scale. The probe
    side is the join's LEFT input (approxSimilarityJoin(probes, vecs)),
    so any hash-entry broadcast join must be BuildLeft."""
    df = REGISTRY["ml_minhash_similarity_join"].spark(spark, sf_dir)
    plan = _physical_plan(df)
    matched = 0
    for line in plan.splitlines():
        if "BroadcastHashJoin" in line and "hashValue#" in line:
            assert "BuildLeft" in line, line
            matched += 1
    # no match = the hint stopped propagating (e.g. a Spark upgrade) and
    # the planner fell back to something else — fail loudly, not green
    assert matched, f"no hash-entry BroadcastHashJoin found in plan:\n{plan}"


KNN_GRAPH_FAMILY = [
    "knn_graph_by_label", "pagerank_knn_2iter", "knn_triangle_stats",
    "lpa_communities_2iter", "knn_degree_powerlaw", "knn_two_hop_reach",
    "recursive_cte_bfs_hops", "hits_hub_authority",
]


def test_knn_graph_family_surfaces_universe_bound(spark, sf_dir):
    """ADVICE r11: KNN_UNIVERSE silently changes these queries' answers
    on any corpus larger than sf0.1 (graph built over the calibration
    sample only), so every graph-family result must carry the bound as
    a constant knn_universe column — in the Spark schema AND the oracle
    SQL — so downstream consumers can't mistake a sample-built graph
    for a full-corpus one. A new graph consumer that forgets the column
    fails here."""
    from data_engineering_rag_spark.plans.vectors import KNN_UNIVERSE

    for name in KNN_GRAPH_FAMILY:
        spec = REGISTRY[name]
        df = spec.spark(spark, sf_dir)
        assert "knn_universe" in df.columns, name
        assert dict(df.dtypes)["knn_universe"] == "bigint", name
        assert "knn_universe" in spec.oracle, name
        assert str(KNN_UNIVERSE) in spec.oracle, name


def test_fellegi_sunter_blocks_on_band_at_scale(spark):
    """r12 scale rewrite: the FS candidate join must include the $100
    band in its block key whenever ≥ FS_TOPK band-agreeing pairs exist
    (every non-tiny table) — the coarse (nation, mktsegment) key has
    fixed cardinality, so its pair space grows quadratically (9e9
    pairs / 361 s at the sf10 probe). sf0.01 has 93 fine pairs, so the
    fine path must plan; its join keys must carry _fs_band."""
    df = REGISTRY["fellegi_sunter_linkage"].spark(spark, "/root/testdata/sf0.01")
    plan = _physical_plan(df)
    # the pair join must be keyed on the band column (fine path); the
    # only nested-loop join allowed is the deliberate 1-row broadcast
    # of the u constants
    assert "_fs_band" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_fellegi_sunter_falls_back_when_dominance_fails(spark, tmp_path):
    """r13 ADVICE: the fine-band shortcut's containment proof assumes
    the agreement weight dominates (m > data-estimated u, with margin
    for the 6-decimal rounding). On a balance-CONCENTRATED table
    (u_band > FS_M_BAND) band-disagreement outweighs agreement, so the
    true top-k is band-disagreeing pairs — which the fine join can
    never emit. The executable guard must route to the coarse join:
    48 of 50 customers share one $100 band → u_band ≈ 0.92 > 0.9, the
    96 cross-band pairs carry ln(0.1/0.078) ≈ +0.24 vs ln(0.9/0.92) <
    0 for same-band, and the whole top-20 must be band_agree=false."""
    rows = [(i, 1, "SEG", 150.0 if i <= 48 else 250.0) for i in range(1, 51)]
    spark.createDataFrame(
        rows, "c_custkey bigint, c_nationkey bigint, c_mktsegment string, c_acctbal double"
    ).write.parquet(str(tmp_path / "customer.parquet"))
    out = REGISTRY["fellegi_sunter_linkage"].spark(spark, str(tmp_path)).collect()
    assert len(out) == 20
    assert all(not r.band_agree for r in out), out
    # and every emitted pair straddles the two bands (one key ≤ 48)
    assert all((r.custkey_a <= 48) != (r.custkey_b <= 48) for r in out), out


def test_fellegi_sunter_empty_and_single_row_tables(spark, tmp_path):
    """r14 ADVICE: with n=0 (and n=1, where n·(n−1)=0 divides to NULL)
    the u estimates come back NULL; the dominance guard must treat a
    None/NaN estimate as dominance failure and return an empty result
    via the coarse path — not raise TypeError on `0.0 < None`."""
    schema = "c_custkey bigint, c_nationkey bigint, c_mktsegment string, c_acctbal double"
    empty_dir = tmp_path / "empty"
    spark.createDataFrame([], schema).write.parquet(str(empty_dir / "customer.parquet"))
    assert REGISTRY["fellegi_sunter_linkage"].spark(spark, str(empty_dir)).collect() == []
    one_dir = tmp_path / "one"
    spark.createDataFrame([(1, 1, "SEG", 100.0)], schema).write.parquet(
        str(one_dir / "customer.parquet")
    )
    assert REGISTRY["fellegi_sunter_linkage"].spark(spark, str(one_dir)).collect() == []


def test_q18_aggregates_below_the_join(spark, sf_dir):
    """r12 scale rewrite: q18 must pre-aggregate lineitem by
    l_orderkey (map-side combinable) and apply the HAVING filter BELOW
    the 1:1 join to orders — the original agg-above-join plan shuffled
    the full joined fact and spilled at the sf10 probe (16-85 s walls
    vs ~27 s rewritten). In the optimized plan the root prints first,
    so the Join must appear before (above) the Aggregate."""
    df = REGISTRY["q18_large_orders_having"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    join_at = plan.index("Join Inner")
    agg_at = plan.index("Aggregate [")
    assert join_at < agg_at, plan
    # the HAVING filter must also sit below the join (pre-join prune)
    having_at = plan.index("> 140")
    assert join_at < having_at, plan


def test_near_dup_via_ivf_mixed_salt_counts_exactly_once(spark, tmp_path):
    """r14: at every testdata SF the buckets are small enough that the
    derived salt degenerates to S=1 (plain label join), so the triangle
    decomposition's exactly-once property under S>1 — and under
    DIFFERENT S per bucket — was only exercised at the sf10 probe.
    Pin it at unit scale: one bucket past the group target (2500 rows
    -> S=2) and one under it (100 rows -> S=1); the salted pair set
    must equal the plain unsalted label self-join's, no key twice."""
    import numpy as np
    import pyspark.sql.functions as F

    from data_engineering_rag_spark.plans.vectors import NEAR_DUP_COS, dot, l2_norm_sq

    rng = np.random.default_rng(14)
    rows = []
    for vid in range(2600):
        label = 0 if vid < 2500 else 1
        # base direction per label + noise: plenty of pairs clear the
        # 0.40 cosine threshold, plenty don't
        base = np.eye(4)[label * 2]
        v = base * rng.uniform(0.3, 1.0) + rng.normal(0, 0.45, 4)
        rows.append((vid, label, [float(x) for x in v]))
    spark.createDataFrame(
        rows, "vec_id bigint, label int, embedding array<float>"
    ).write.parquet(str(tmp_path / "embeddings.parquet"))

    df = REGISTRY["embedding_near_dup_via_ivf"].spark(spark, str(tmp_path))
    got = df.collect()
    key_counts = {}
    for r in got:
        assert r.vec_a < r.vec_b
        key_counts[(r.vec_a, r.vec_b)] = key_counts.get((r.vec_a, r.vec_b), 0) + 1
    dups = [k for k, c in key_counts.items() if c > 1]
    assert not dups, f"pairs emitted twice: {dups[:5]}"

    from data_engineering_rag_spark.plans import load

    v = (
        load(spark, str(tmp_path), "embeddings")
        .select("vec_id", "label", F.col("embedding").cast("array<double>").alias("ev"))
        .withColumn("nrm", F.sqrt(l2_norm_sq(F.col("ev"))))
    )
    a = v.select(F.col("vec_id").alias("vec_a"), F.col("label").alias("la"),
                 F.col("ev").alias("ea"), F.col("nrm").alias("na"))
    b = v.select(F.col("vec_id").alias("vec_b"), F.col("label").alias("lb"),
                 F.col("ev").alias("eb"), F.col("nrm").alias("nb"))
    plain = (
        a.join(b, (F.col("la") == F.col("lb")) & (F.col("vec_a") < F.col("vec_b")))
        .select("vec_a", "vec_b",
                (F.round(dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), 8)
                 + F.lit(0.0)).alias("cosine"))
        .where(F.col("cosine") > NEAR_DUP_COS)
    )
    assert df.exceptAll(plain).count() == 0
    assert plain.exceptAll(df).count() == 0
    assert len(got) == plain.count() > 0  # non-vacuous
