#!/usr/bin/env python
"""Interleaved same-process A/B harness (VERDICT r16 item 1 protocol):
time N interleaved rounds of named DataFrame-builder variants through
the noop sink and emit one JSON line with every sample, so keep/revert
decisions rest on alternating pairs measured in one host phase, not on
cross-session comparisons.

Usage: python scripts/ab_variants.py <suite> [--rounds 6] [--sf DIR] [--out FILE]

Suites are defined in this file: each is a dict of variant-name →
builder(spark, sf_dir) → DataFrame. The per-round variant order rotates
so no variant systematically lands on the warm (or busy) phase.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


# ---------------------------------------------------------------- suites
def _simhash_r16(spark, sf_dir):
    """The r16 shape: guard + explode + groupBy(doc_id, term)."""
    from data_engineering_rag_spark.plans import load
    from data_engineering_rag_spark.plans.textops import SIMHASH_BITS
    from data_engineering_rag_spark.operators.scale import ensure_scan_parallelism
    from data_engineering_rag_spark.operators.tfidf import TOKEN_PATTERN

    d = ensure_scan_parallelism(load(spark, sf_dir, "documents"), label="ab")
    tok = (
        d.select(
            "doc_id",
            F.explode(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_PATTERN), F.lit(0))
            ).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    h = F.conv(F.substring(F.md5("term"), 1, 15), 16, 10).cast("long")
    th = tok.select("doc_id", "tf", h.alias("h"))
    weights = th.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.expr(f"(shiftright(h, {b}) & 1) = 1"), F.col("tf")).otherwise(
                    -F.col("tf")
                )
            ).alias(f"w{b}")
            for b in range(SIMHASH_BITS)
        ]
    )
    sig_expr = " + ".join(f"IF(w{b} > 0, {1 << b}L, 0L)" for b in range(SIMHASH_BITS))
    return weights.select("doc_id", F.expr(sig_expr).cast("long").alias("simhash"))


def _simhash_r17(spark, sf_dir):
    """HEAD shape: guard + run-length tf kernel."""
    from data_engineering_rag_spark.plans.textops import _simhash_signatures

    return _simhash_signatures(spark, sf_dir, hash_mode="md5")


def _simhash_r17_noguard(spark, sf_dir):
    """HEAD shape with the scan guard disabled (identity)."""
    import data_engineering_rag_spark.operators.scale as scale
    from data_engineering_rag_spark.plans.textops import _simhash_signatures

    orig = scale.ensure_scan_parallelism
    scale.ensure_scan_parallelism = lambda df, *a, **k: df
    try:
        return _simhash_signatures(spark, sf_dir, hash_mode="md5")
    finally:
        scale.ensure_scan_parallelism = orig


def _registry_builder(name):
    def build(spark, sf_dir):
        from data_engineering_rag_spark.plans import REGISTRY

        return REGISTRY[name].spark(spark, sf_dir)

    return build


def _noguard(builder):
    def build(spark, sf_dir):
        import data_engineering_rag_spark.operators.scale as scale

        orig = scale.ensure_scan_parallelism
        scale.ensure_scan_parallelism = lambda df, *a, **k: df
        try:
            return builder(spark, sf_dir)
        finally:
            scale.ensure_scan_parallelism = orig

    return build


SUITES = {
    "simhash": {
        "r16_explode_groupby": _simhash_r16,
        "r17_runlength": _simhash_r17,
        "r17_runlength_noguard": _simhash_r17_noguard,
    },
    "tfidf": {
        "search_ckpt": _registry_builder("tfidf_search_topk"),
        "search_persist": None,  # filled below
        "search_nomat": None,
        "multi_ckpt": _registry_builder("tfidf_multiquery_topk"),
        "multi_persist": None,
        "multi_nomat": None,
    },
}


def _with_tf_materialization(builder, mode):
    """Run a builder with operators.scale.durable_checkpoint swapped for
    persist() or identity — isolates the tf-table materialization
    strategy while keeping everything else at HEAD."""

    def build(spark, sf_dir):
        import data_engineering_rag_spark.operators.scale as scale
        from pyspark import StorageLevel

        orig = scale.durable_checkpoint
        if mode == "persist":
            scale.durable_checkpoint = lambda df, *a, **k: df.persist(
                StorageLevel.MEMORY_AND_DISK
            )
        elif mode == "none":
            scale.durable_checkpoint = lambda df, *a, **k: df
        try:
            return builder(spark, sf_dir)
        finally:
            scale.durable_checkpoint = orig

    return build


SUITES["tfidf"]["search_persist"] = _with_tf_materialization(
    _registry_builder("tfidf_search_topk"), "persist"
)
SUITES["tfidf"]["search_nomat"] = _with_tf_materialization(
    _registry_builder("tfidf_search_topk"), "none"
)
SUITES["tfidf"]["multi_persist"] = _with_tf_materialization(
    _registry_builder("tfidf_multiquery_topk"), "persist"
)
SUITES["tfidf"]["multi_nomat"] = _with_tf_materialization(
    _registry_builder("tfidf_multiquery_topk"), "none"
)


def main() -> None:
    args = sys.argv[1:]
    rounds, sf_dir, out, names = 6, os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    ), None, []
    while args:
        a = args.pop(0)
        if a == "--rounds":
            rounds = int(args.pop(0))
        elif a == "--sf":
            sf_dir = args.pop(0)
        elif a == "--out":
            out = args.pop(0)
        else:
            names.append(a)
    suite = SUITES[names[0]]

    from data_engineering_rag_spark.session import get_spark

    spark = get_spark(app_name=f"ab_{names[0]}")
    spark.sparkContext.setLogLevel("ERROR")
    # bench.py's JVM warm-up
    from data_engineering_rag_spark.plans import REGISTRY

    REGISTRY["q1_pricing_summary"].spark(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    for builder in suite.values():  # one discarded warm rep per variant
        builder(spark, sf_dir).write.format("noop").mode("overwrite").save()

    samples: dict[str, list[float]] = {k: [] for k in suite}
    keys = list(suite)
    for r in range(rounds):
        order = keys[r % len(keys):] + keys[: r % len(keys)]  # rotate
        for k in order:
            spark.sparkContext.setJobDescription(f"ab:{names[0]}:{k}:round{r}")
            t0 = time.perf_counter()
            suite[k](spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples[k].append(round(time.perf_counter() - t0, 3))
    result = {
        "suite": names[0],
        "sf_dir": sf_dir,
        "rounds": rounds,
        "samples": samples,
        "medians": {k: round(statistics.median(v), 3) for k, v in samples.items()},
    }
    line = json.dumps(result)
    print(line)
    if out:
        with open(out, "w") as fh:
            fh.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
