"""Rows-only evidence map enforcement (VERDICT r9 item 5).

31 registry queries carry no DuckDB oracle by design (streaming,
approx sketches, iterative algorithms, xxhash64 production twins,
golden-pinned ingest stages). Their legitimacy rests on named
equivalence / golden / error-bound / parity tests. This module pins
the map itself: every rows-only query MUST name at least one evidence
test that actually exists, and the map may not carry stale entries —
so a new rows-only query without evidence, or a renamed test, fails
loudly instead of rotting silently. The same map renders as the
COVERAGE.md "Rows-only evidence map" table.
"""

from __future__ import annotations

import ast
import os

from data_engineering_rag_spark.plans import REGISTRY

#: rows-only query -> (evidence class, ["tests/file.py::test_name", ...])
ROWS_ONLY_EVIDENCE: dict[str, tuple[str, list[str]]] = {
    # approx sketches: error-bound tests against the exact computation
    "agg_approx_distinct": (
        "error-bound vs exact",
        ["tests/test_oracle_parity.py::test_approx_distinct_error_bounded"],
    ),
    "agg_approx_percentile": (
        "error-bound vs exact",
        ["tests/test_edge_cases.py::test_approx_percentile_error_bound"],
    ),
    "approx_top_terms_cms": (
        "error-bound vs exact",
        ["tests/test_cms.py::test_cms_overestimates_and_recalls"],
    ),
    "qdigest_price_quantiles": (
        "error-bound vs exact",
        [
            "tests/test_round8_batch7.py::test_qdigest_guarantee_vs_exact_ranks",
            "tests/test_round8_batch7.py::test_qdigest_merge_is_order_independent",
        ],
    ),
    "robust_outlier_audit_approx": (
        "error-bound vs exact twin",
        ["tests/test_scale_helpers.py::test_robust_outlier_approx_twin_close_to_exact"],
    ),
    "hll_sketch_partition_merge": (
        "error-bound vs exact",
        ["tests/test_streaming.py::test_hll_sketch_estimates_within_tolerance"],
    ),
    # xxhash64 production twins: parity vs the oracle-checked md5 mode
    "minhash_lsh_candidate_pairs_xxh": (
        "hash-mode parity vs oracle-checked twin",
        ["tests/test_textops_modes.py::test_lsh_candidate_pairs_mode_parity"],
    ),
    "simhash_signatures_xxh": (
        "hash-mode parity vs oracle-checked twin",
        [
            "tests/test_textops_modes.py::test_simhash_signature_modes_same_shape",
            "tests/test_textops_modes.py::test_simhash_pairs_mode_parity",
        ],
    ),
    "minhash_decontaminate_xxh": (
        "hash-mode parity + planted-contamination recall",
        ["tests/test_textops_modes.py::test_minhash_decontaminate_flags_planted_contamination"],
    ),
    "bootstrap_mean_ci_poisson_xxh": (
        "hash-mode distribution parity vs oracle-checked twin",
        ["tests/test_auditq.py::test_bootstrap_xxh_multiplicity_distribution_matches_md5"],
    ),
    # iterative / sequential algorithms: brute-force or independent-
    # algorithm pins
    "isotonic_pava_calibration": (
        "brute-force pin + invariants",
        ["tests/test_round8_batch3.py::test_pava_matches_bruteforce_and_invariants"],
    ),
    "markov_removal_effect": (
        "independent-algorithm pin (power iteration)",
        ["tests/test_round8_batch5.py::test_markov_removal_effect_vs_power_iteration"],
    ),
    # golden-pinned ingest / log stages (reference-parity semantics)
    "ingest_notebook_markdown": (
        "golden vs reference algorithm",
        ["tests/test_ingest.py::test_notebook_to_markdown_golden"],
    ),
    "ingest_full_pipeline": (
        "determinism pin over the fixture corpus",
        ["tests/test_ingest.py::test_full_pipeline_deterministic"],
    ),
    "logs_simplify": (
        "golden vs reference algorithm",
        ["tests/test_logs.py::test_simplify_matches_reference"],
    ),
    "media_features_sample": (
        "real-decode value pin (PNG/WAV histograms, NULL at ffmpeg seam)",
        ["tests/test_multimodal_io.py::test_media_features_sample_real_values"],
    ),
    # streaming: finalized-prefix / full equivalence vs the
    # oracle-checked batch twin
    "stream_hourly_stats": (
        "stream-batch equivalence",
        ["tests/test_streaming.py::test_hourly_stats_stream_equals_batch_finalized"],
    ),
    "stream_sessionize": (
        "stream-batch equivalence",
        ["tests/test_streaming.py::test_sessionize_stream_equals_batch_finalized"],
    ),
    "stream_session_journeys": (
        "stream-batch equivalence",
        ["tests/test_streaming.py::test_session_journeys_stream_equals_batch_finalized"],
    ),
    "stream_sliding_counts": (
        "stream-batch equivalence",
        ["tests/test_streaming.py::test_sliding_counts_stream_equals_batch_finalized"],
    ),
    "stream_dedup_first_arrivals": (
        "bound vs exact distinct",
        ["tests/test_streaming.py::test_dedup_stream_counts_bounded_by_batch"],
    ),
    "stream_view_purchase_funnel": (
        "stream-batch equivalence",
        ["tests/test_streaming.py::test_funnel_stream_equals_batch"],
    ),
    "stream_user_totals_stateful": (
        "stream-batch equivalence + multi-microbatch state survival",
        [
            "tests/test_streaming.py::test_stateful_totals_equal_batch_aggregate",
            "tests/test_streaming.py::test_stateful_stream_survives_multiple_microbatches",
        ],
    ),
    "stream_enriched_static": (
        "stream-batch equivalence",
        ["tests/test_streaming.py::test_enriched_static_stream_equals_batch"],
    ),
    "stream_replay_filtered": (
        "stream-batch equivalence",
        ["tests/test_streaming.py::test_replay_filter_stream_equals_batch"],
    ),
    "stream_doc_dedup_gate": (
        "stream-batch equivalence",
        ["tests/test_streaming.py::test_doc_dedup_gate_stream_equals_batch"],
    ),
    "stream_daily_rollup": (
        "stream-batch equivalence",
        ["tests/test_streaming.py::test_daily_rollup_stream_matches_batch"],
    ),
    "stream_view_purchase_left": (
        "finalized-prefix equivalence",
        ["tests/test_streaming.py::test_left_outer_funnel_stream_finalized_prefix"],
    ),
    "stream_rolling_actives": (
        "stream-batch equivalence",
        ["tests/test_streaming.py::test_rolling_actives_stream_equals_batch_finalized"],
    ),
    # state-v2 (transformWithStateInPandas) — registered only where
    # google.protobuf is importable (plans/streaming_q.py gate); the
    # conftest protobuf shim makes that true under pytest
    "stream_first_type_occurrence": (
        "stream-batch equivalence",
        ["tests/test_streaming.py::test_first_type_occurrence_stream_equals_batch"],
    ),
    "stream_user_totals_state_v2": (
        "stream-batch equivalence (transitive with the v1 twin)",
        ["tests/test_streaming.py::test_state_v2_totals_equal_batch_and_v1_twin"],
    ),
}

#: registered only when google.protobuf is importable — absent from
#: REGISTRY in bare driver environments, present under pytest (the
#: conftest shim), so the stale check tolerates their absence.
ENV_GATED = frozenset({"stream_first_type_occurrence", "stream_user_totals_state_v2"})

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _test_functions(path: str) -> set[str]:
    tree = ast.parse(open(os.path.join(_REPO, path)).read())
    return {n.name for n in ast.walk(tree) if isinstance(n, ast.FunctionDef)}


def test_every_rows_only_query_has_named_evidence():
    rows_only = {n for n, s in REGISTRY.items() if s.oracle is None}
    missing = rows_only - set(ROWS_ONLY_EVIDENCE)
    assert not missing, (
        f"rows-only queries without a named evidence test: {sorted(missing)} "
        "- add them to ROWS_ONLY_EVIDENCE and COVERAGE.md"
    )
    stale = set(ROWS_ONLY_EVIDENCE) - rows_only - ENV_GATED
    assert not stale, (
        f"ROWS_ONLY_EVIDENCE entries that are not rows-only registry "
        f"queries (renamed? oracle added?): {sorted(stale)}"
    )


def test_evidence_tests_exist():
    cache: dict[str, set[str]] = {}
    for qname, (_, refs) in ROWS_ONLY_EVIDENCE.items():
        assert refs, f"{qname}: empty evidence list"
        for ref in refs:
            path, _, fn = ref.partition("::")
            assert fn, f"{qname}: malformed evidence ref {ref!r}"
            if path not in cache:
                assert os.path.exists(os.path.join(_REPO, path)), f"{qname}: {path} missing"
                cache[path] = _test_functions(path)
            assert fn in cache[path], f"{qname}: {ref} names a test that does not exist"


def test_coverage_md_table_in_sync():
    """COVERAGE.md's rows-only table must list exactly the rows-only
    registry queries (same source of truth as this module's map)."""
    text = open(os.path.join(_REPO, "COVERAGE.md")).read()
    section = text.split("## Rows-only evidence map", 1)
    assert len(section) == 2, "COVERAGE.md lacks the 'Rows-only evidence map' section"
    body = section[1]
    for qname in ROWS_ONLY_EVIDENCE:
        assert f"`{qname}`" in body, f"COVERAGE.md rows-only table missing {qname}"
