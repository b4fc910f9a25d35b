"""Round-8 batch-6 pins: the Misra-Gries fold's heavy-hitter guarantee
under adversarial streams, and the IVM delta-merge invariant exercised
through sign algebra on a crafted micro-dataset (the cross-engine
recompute equality runs in test_oracle_parity.py)."""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest

from data_engineering_rag_spark.plans import REGISTRY
from data_engineering_rag_spark.plans.sketchq import (
    IVM_DELETE_MOD,
    IVM_SPLIT_DAY,
    MG_K,
    mg_fold,
)

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_mg_fold_guarantee_adversarial(seed):
    """Any item with true frequency > n/k must survive the fold with a
    positive counter, for every batch split and arrival order."""
    rng = random.Random(seed)
    # one item at ~40%, one at ~12%, heavy tail of distinct singletons
    stream = (
        ["heavy"] * 400
        + ["mid"] * 120
        + [f"t{i}" for i in range(480)]
    )
    rng.shuffle(stream)
    k = 8
    n = len(stream)
    for batch_size in (7, 64, 333, len(stream)):
        counters = pd.Series(dtype="int64")
        for i in range(0, n, batch_size):
            batch = pd.Series(stream[i : i + batch_size])
            counters = mg_fold(counters, batch.value_counts(), k)
        assert len(counters) <= k
        true_heavy = {"heavy"}  # 400 > 1000/8; mid = 120 < 125
        assert true_heavy <= set(counters.index)
        # undercount bound: sketch count >= true - n/(k+1)
        assert counters["heavy"] >= 400 - n / (k + 1)


def test_mg_query_equals_exact_heavy_set(spark):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    truth = dict(
        con.execute(
            r"""
        WITH toks AS (
          SELECT unnest(regexp_extract_all(lower(text), '\w\w+')) AS t
          FROM documents),
        tot AS (SELECT count(*) AS n FROM toks)
        SELECT t, count(*) FROM toks CROSS JOIN tot
        GROUP BY t, n HAVING count(*) * {} > n
        """.format(MG_K)
        ).fetchall()
    )
    con.close()
    rows = REGISTRY["misra_gries_heavy_tokens"].spark(spark, SF).collect()
    assert {r.term: r.exact_count for r in rows} == truth
    assert len(rows) > 0


def test_ivm_merge_equals_recompute_on_crafted_deltas(spark):
    """Sign algebra sanity on a crafted frame: state + inserts -
    deletes must equal the recompute, including a type whose rows are
    FULLY retracted (net zero) — it must vanish (no zero-count rows)
    or carry exact zeros, matching the recompute, which drops it."""
    import pyspark.sql.functions as F

    rows = [
        ("a", 1.5, True, False), ("a", 2.5, True, True),
        ("b", 4.0, True, True), ("b", 1.0, True, True),  # b fully retracted
        ("a", 3.0, False, False), ("c", 7.25, False, False),
    ]
    df = spark.createDataFrame(
        rows, "event_type string, value double, is_base boolean, is_del boolean"
    )

    def rollup(d, sign):
        return d.groupBy("event_type").agg(
            (F.lit(sign) * F.count(F.lit(1))).cast("long").alias("pn"),
            (F.lit(sign) * F.sum(F.col("value").cast("decimal(18,6)"))).alias("ps"),
        )

    merged = (
        rollup(df.where("is_base"), 1)
        .unionByName(rollup(df.where("NOT is_base"), 1))
        .unionByName(rollup(df.where("is_base AND is_del"), -1))
        .groupBy("event_type")
        .agg(F.sum("pn").alias("n"), F.sum("ps").cast("double").alias("s"))
        .where(F.col("n") > 0)
        .orderBy("event_type")
        .collect()
    )
    got = {(r.event_type): (r.n, r.s) for r in merged}
    assert got == {"a": (2, 4.5), "c": (1, 7.25)}


def test_ivm_registry_slices_are_disjoint_and_cover(spark):
    """The base/insert/delete slices of the registry query partition
    events exactly: |base| + |inserts| = all, deletes ⊆ base."""
    import pyspark.sql.functions as F

    from data_engineering_rag_spark.plans import load

    e = load(spark, SF, "events").where(F.col("value").isNotNull())
    d0 = e.agg(F.min(F.col("ts").cast("date")).alias("d0"))
    t = e.crossJoin(F.broadcast(d0)).select(
        (F.datediff(F.col("ts").cast("date"), F.col("d0")) < IVM_SPLIT_DAY).alias("is_base"),
        (F.col("event_id") % IVM_DELETE_MOD == 0).alias("is_del"),
    )
    total = t.count()
    base = t.where("is_base").count()
    ins = t.where("NOT is_base").count()
    dels = t.where("is_base AND is_del").count()
    assert base + ins == total
    assert 0 < dels < base
    assert ins > 0
