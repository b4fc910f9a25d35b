"""Round-9 pins: the ML ``MinHashLSH`` oracle query and the
``foreachBatch`` streaming IVM twin.

The oracle-parity suite proves end-result equality with DuckDB; these
tests pin the properties parity alone can't see — micro-batch-split
invariance, full-retraction semantics on the STREAMING path, and the
candidate join's plan shape.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from data_engineering_rag_spark.plans import REGISTRY, load
from data_engineering_rag_spark.plans.sketchq import IVM_DELETE_MOD, IVM_SPLIT_DAY
from data_engineering_rag_spark.streaming.events import ivm_cdc_stream_merge


def _ts(s: str) -> datetime:
    return datetime.strptime(s, "%Y-%m-%d %H:%M:%S")


def test_stream_ivm_batch_split_invariance(spark, sf_dir, tmp_path):
    """The IVM invariant itself: folding the SAME events through FOUR
    micro-batches (directory of 4 part files, maxFilesPerTrigger=1)
    must merge to exactly the batch twin's from-scratch answer. This is
    the multi-batch case the single-file testdata layout masks (cf. the
    round-7 sf1-soak lesson)."""
    ev = load(spark, sf_dir, "events")
    ev.repartition(4).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    streamed = ivm_cdc_stream_merge(
        spark,
        str(tmp_path),
        str(tmp_path / "state"),
        split_day=IVM_SPLIT_DAY,
        delete_mod=IVM_DELETE_MOD,
    ).collect()
    batch = REGISTRY["ivm_agg_delta_merge"].spark(spark, sf_dir).collect()

    assert len(streamed) > 1, "vacuous: need multiple event types"
    assert [r.asDict() for r in streamed] == [r.asDict() for r in batch]


def test_stream_ivm_full_retraction_drops_group(spark, tmp_path):
    """The ADVICE-r8 degenerate pin, re-asserted on the STREAMING path:
    a type whose base rows are all retracted and that has no inserts
    must be absent from the merged view, even when the retractions
    arrive in a different micro-batch than the (empty) inserts."""
    rows = [
        (IVM_DELETE_MOD, _ts("2024-01-01 10:00:00"), 1, "dead", 5.0, "{}"),
        (2 * IVM_DELETE_MOD, _ts("2024-01-02 10:00:00"), 1, "dead", 7.0, "{}"),
        (1, _ts("2024-01-01 11:00:00"), 2, "live", 1.0, "{}"),
        (2, _ts("2024-02-15 11:00:00"), 2, "live", 2.0, "{}"),
    ]
    schema = (
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string"
    )
    spark.createDataFrame(rows, schema).repartition(3).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    got = ivm_cdc_stream_merge(
        spark,
        str(tmp_path),
        str(tmp_path / "state"),
        split_day=IVM_SPLIT_DAY,
        delete_mod=IVM_DELETE_MOD,
    ).collect()
    assert [r["event_type"] for r in got] == ["live"]
    assert got[0]["n_events"] == 2 and got[0]["total_value"] == 3.0


def test_ml_lsh_join_is_equi_join(spark, sf_dir):
    """``approxSimilarityJoin``'s candidate generation must be an
    equi-join on exploded (table, hash) entries — never an all-pairs
    nested loop — or the library path would not survive 100 TB any
    better than brute force."""
    df = REGISTRY["ml_minhash_similarity_join"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_ml_lsh_matches_exact_jaccard_for_probes(spark, sf_dir):
    """Cross-implementation sanity: the ML probe lookup must return
    EXACTLY the brute-force τ-filtered neighbors of each probe (both
    verify with the exact distance, so the outputs are comparable
    sets, not candidate supersets)."""
    from data_engineering_rag_spark.plans.round9q import ML_LSH_PROBE_IDS

    ml_pairs = {
        (r["probe_id"], r["doc_id"])
        for r in REGISTRY["ml_minhash_similarity_join"].spark(spark, sf_dir).collect()
    }
    docs = load(spark, sf_dir, "documents")
    from tests.test_lsh_ml import exact_jaccard_pairs

    truth_undirected = exact_jaccard_pairs(spark, docs, 0.5, strict=True)
    probes = set(ML_LSH_PROBE_IDS)
    truth = {
        (p, d)
        for (a, b) in truth_undirected
        for (p, d) in ((a, b), (b, a))
        if p in probes
    }
    assert ml_pairs == truth, (
        f"ml-extra={sorted(ml_pairs - truth)[:5]} "
        f"ml-missed={sorted(truth - ml_pairs)[:5]}"
    )


def test_ml_lsh_probe_ids_present_at_every_sf():
    """ADVICE r9: ML_LSH_PROBE_IDS existence was asserted only in a
    comment — a data regeneration that drops a probe id would shrink
    `ml_minhash_similarity_join` silently (both engines agree on the
    smaller probe set, so oracle parity still passes). Pin it loudly:
    every probe id must exist in `documents` at every generated SF.
    DuckDB scan — no Spark session, runs in milliseconds."""
    import os

    import duckdb

    from data_engineering_rag_spark.plans.round9q import ML_LSH_PROBE_IDS

    from .conftest import TEST_SF_DIR

    # ADVICE r10: derive the root from the conftest sf dir (no second
    # env var), and require that at least one documents.parquet was
    # actually checked so the loop can't pass vacuously.
    root = os.path.dirname(os.path.abspath(TEST_SF_DIR.rstrip("/")))
    sf_dirs = sorted(
        os.path.join(root, d)
        for d in os.listdir(root)
        if d.startswith("sf") and os.path.isdir(os.path.join(root, d))
    )
    assert sf_dirs, f"no sf dirs under {root}"
    ids = ", ".join(str(p) for p in ML_LSH_PROBE_IDS)
    checked = 0
    for sf in sf_dirs:
        path = os.path.join(sf, "documents.parquet")
        if not os.path.exists(path):
            continue
        checked += 1
        present = {
            r[0]
            for r in duckdb.sql(
                f"SELECT DISTINCT doc_id FROM '{path}' WHERE doc_id IN ({ids})"
            ).fetchall()
        }
        missing = set(ML_LSH_PROBE_IDS) - present
        assert not missing, f"{sf}: probe ids missing from documents: {sorted(missing)}"
    assert checked > 0, f"no documents.parquet found under any sf dir in {root}"
