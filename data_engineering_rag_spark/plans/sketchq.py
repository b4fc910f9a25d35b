"""Mergeable-sketch and integrity operators (split from round8q.py,
VERDICT r9 item 7 — registry names and oracle SQL byte-identical):
Misra-Gries heavy hitters (with the exact verification pass), q-digest
quantiles, per-bucket partition checksums, and the batch
incremental-view-maintenance delta merge whose streaming twin lives in
``streaming/events.py``.

Everything here is an abelian-merge shape: per-partition partials
combine associatively/commutatively, so the same code serves batch,
backfill, and foreachBatch streaming without rescans.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

from . import load, query
from ..operators.tfidf import TOKEN_PATTERN


#: Checksum manifest: fixed bucket count (the "partition" grain an
#: integrity sync would reconcile at).
CKSUM_BUCKETS = 32


@query(
    "partition_checksum_manifest",
    f"""
    WITH rows_h AS (
      SELECT o_orderkey % {CKSUM_BUCKETS} AS bucket,
             o_orderkey,
             cast(concat('0x', substr(md5(concat_ws(',',
                    cast(o_orderkey as varchar),
                    cast(o_custkey as varchar),
                    o_orderstatus,
                    o_orderpriority,
                    cast(cast(o_orderdate as date) as varchar))), 1, 10))
                  as bigint) AS h
      FROM orders)
    SELECT cast(bucket as bigint) AS bucket,
           cast(count(*) as bigint) AS n_rows,
           cast(min(o_orderkey) as bigint) AS min_key,
           cast(max(o_orderkey) as bigint) AS max_key,
           cast(sum(h) as bigint) AS checksum
    FROM rows_h GROUP BY bucket ORDER BY bucket
    """,
)
def partition_checksum_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATA-INTEGRITY CHECKSUM MANIFEST over orders: each key bucket
    (orderkey mod {CKSUM_BUCKETS}) rolls up a COMMUTATIVE checksum —
    the SUM of a 40-bit md5-prefix hash of each row's canonical string
    form — plus row count and key range. Sum (not concat-then-hash) is
    the 100 TB design: it is order- and partition-independent, so the
    manifest is reproducible under any shuffle layout and two sides of
    a replication/sync can diff manifests bucket-by-bucket without
    moving data (the rsync/Merkle pattern; 40-bit values keep the
    bigint sum overflow-safe to ~10^7 rows per bucket — widen the
    bucket count, not the hash, beyond that). Canonical form uses only
    integer/string/date fields rendered identically by both engines.
    One narrow map + one combinable groupBy."""
    o = load(spark, sf_dir, "orders")
    repr_ = F.concat_ws(
        ",",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.col("o_orderpriority"),
        F.col("o_orderdate").cast("date").cast("string"),
    )
    h = F.conv(F.substring(F.md5(repr_), 1, 10), 16, 10).cast("long")
    return (
        o.select((F.col("o_orderkey") % CKSUM_BUCKETS).alias("bucket"), F.col("o_orderkey"), h.alias("h"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("o_orderkey").cast("long").alias("min_key"),
            F.max("o_orderkey").cast("long").alias("max_key"),
            F.sum("h").cast("long").alias("checksum"),
        )
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            "n_rows", "min_key", "max_key", "checksum",
        )
        .orderBy("bucket")
    )


# --------------------------------------------------------------------------
# Batch 6: engine maintenance ops — groupBy incremental view
# maintenance under signed deltas, and Misra-Gries heavy hitters with
# an exact-guarantee verification pass
# --------------------------------------------------------------------------

#: IVM scenario split: base = days < IVM_SPLIT_DAY, inserts arrive
#: after, deletes retract a deterministic subset of the base.
IVM_SPLIT_DAY = 25
IVM_DELETE_MOD = 97


@query(
    "ivm_agg_delta_merge",
    f"""
    WITH bounds AS (SELECT min(cast(ts as date)) AS d0 FROM events),
    tagged AS (
      SELECT event_type, value,
             datediff('day', b.d0, cast(ts as date)) < {IVM_SPLIT_DAY} AS is_base,
             event_id % {IVM_DELETE_MOD} = 0 AS is_del
      FROM events CROSS JOIN bounds b
      WHERE value IS NOT NULL),
    -- the ORACLE recomputes from scratch over base \\ deletes + inserts
    effective AS (
      SELECT event_type, value FROM tagged
      WHERE (is_base AND NOT is_del) OR NOT is_base)
    SELECT event_type,
           cast(count(*) as bigint) AS n_events,
           round(cast(sum(cast(value as decimal(18,6))) as double), 6)
             AS total_value
    FROM effective GROUP BY event_type ORDER BY event_type
    """,
)
def ivm_agg_delta_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL VIEW MAINTENANCE for an aggregate view: the per-type
    (count, sum) rollup is maintained as mergeable partials — state
    from the base window, PLUS an insert-delta rollup, MINUS a signed
    delete-delta rollup (retractions of base rows) — and the merged
    state is returned WITHOUT ever rescanning base ∪ delta together.
    The DuckDB oracle recomputes the view from scratch over
    (base \\ deletes) ∪ inserts, so the hash equality IS the IVM
    invariant: merge(state, +Δ, -Δ) ≡ recompute — checked cross-engine.
    This is the groupBy companion of `ivm_join_delta_merge`
    (plans/cdcq.py): count/decimal-sum partials absorb inserts AND
    deletes because both are abelian-group ops; avg derives at read
    time. Scale: three combinable rollups over disjoint slices (each
    |types| rows), one tiny merge — the 100 TB pattern where the base
    scan happened LAST month and only deltas are touched today."""
    e = load(spark, sf_dir, "events").where(F.col("value").isNotNull())
    bounds = e.agg(F.min(F.col("ts").cast("date")).alias("d0"))
    tagged = e.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        "value",
        (F.datediff(F.col("ts").cast("date"), F.col("d0")) < IVM_SPLIT_DAY).alias("is_base"),
        (F.col("event_id") % IVM_DELETE_MOD == 0).alias("is_del"),
    )

    def rollup(df, sign: int):
        return df.groupBy("event_type").agg(
            (F.lit(sign) * F.count(F.lit(1))).cast("long").alias("pn"),
            (F.lit(sign) * F.sum(F.col("value").cast("decimal(18,6)"))).alias("ps"),
        )

    state = rollup(tagged.where("is_base"), 1)              # last month's state
    ins = rollup(tagged.where("NOT is_base"), 1)            # +Δ inserts
    dels = rollup(tagged.where("is_base AND is_del"), -1)   # -Δ retractions
    merged = (
        state.unionByName(ins)
        .unionByName(dels)
        .groupBy("event_type")
        .agg(F.sum("pn").cast("long").alias("n_events"), F.sum("ps").alias("ts_sum"))
        # Degenerate-input semantics (ADVICE r8): a type whose base
        # rows were ALL retracted and that has no inserts merges to
        # (n=0, sum=0) state, but a from-scratch recompute has no such
        # group at all — drop empty groups so merge ≡ recompute holds
        # on that input too (pinned in tests/test_round8.py).
        .where(F.col("n_events") > 0)
    )
    return merged.select(
        "event_type",
        "n_events",
        F.round(F.col("ts_sum").cast("double"), 6).alias("total_value"),
    ).orderBy("event_type")


#: Misra-Gries sketch size; the guarantee verified below is "every
#: token with frequency > n/MG_K appears in the sketch output".
MG_K = 56


def mg_fold(counters, batch_counts, k: int):
    """Fold one batch's exact value_counts into a k-counter MG summary:
    add, then apply the standard batch decrement — subtract the
    (k+1)-th largest counter from every counter and drop non-positive
    ones. This is the MERGE of Agarwal et al. 2012 (Mergeable
    Summaries) with the batch treated as a zero-error summary; total
    undercount after any fold sequence is < n/ (k+1), which implies the
    heavy-hitter guarantee: an item with true frequency > n/k survives
    with positive count. Module-level so tests can drive it with
    adversarial streams directly."""
    counters = counters.add(batch_counts, fill_value=0)
    if len(counters) > k:
        cut = counters.nlargest(k + 1).iloc[-1]
        counters = counters - cut
        counters = counters[counters > 0]
    return counters


@query(
    "misra_gries_heavy_tokens",
    f"""
    WITH toks AS (
      SELECT unnest(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS term
      FROM documents),
    tot AS (SELECT cast(count(*) as bigint) AS n FROM toks),
    freq AS (
      SELECT term, cast(count(*) as bigint) AS exact_count
      FROM toks GROUP BY term)
    SELECT f.term, f.exact_count
    FROM freq f CROSS JOIN tot t
    WHERE f.exact_count * {{MG_K}} > t.n
    ORDER BY f.exact_count DESC, f.term
    """.replace("{MG_K}", str(MG_K)),
)
def misra_gries_heavy_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MISRA-GRIES HEAVY HITTERS over corpus tokens, with the guarantee
    made checkable: each partition folds its token stream into a
    k={MG_K}-counter MG summary (vectorized per Arrow batch: add the
    batch's value_counts, then apply the standard batch decrement —
    subtract the (k+1)-th largest counter from all and drop the
    non-positive — the mergeable-summaries merge of Agarwal et al.
    2012); partition summaries merge by counter addition; a second
    pass joins EXACT counts for the surviving candidates only. The
    emitted rows are candidates whose exact frequency exceeds n/k, and
    the MG guarantee (an item with true frequency > n/k cannot be
    decremented to zero in every summary) makes this equal the TRUE
    heavy-hitter set — exactly what the DuckDB oracle computes with a
    full GROUP BY ... HAVING. The sketch is the 100 TB mechanism (the
    full term dictionary may not fit a reducer; {MG_K} counters per
    partition always do); the oracle proves the guarantee held.
    Integer multiply (count*k > n) avoids float thresholds."""
    import pandas as pd

    toks = (
        load(spark, sf_dir, "documents")
        .select(
            F.explode(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_PATTERN), F.lit(0))
            ).alias("term")
        )
    )

    def mg_sketch(batches):
        counters = pd.Series(dtype="int64")
        for pdf in batches:
            counters = mg_fold(counters, pdf["term"].value_counts(), MG_K)
        yield pd.DataFrame({"term": counters.index, "cnt": counters.to_numpy("int64")})

    candidates = (
        toks.mapInPandas(mg_sketch, "term string, cnt bigint")
        .groupBy("term")
        .agg(F.sum("cnt").alias("_mg"))
        .select("term")
    )
    tot = toks.agg(F.count(F.lit(1)).cast("long").alias("n"))
    exact = (
        toks.join(F.broadcast(candidates), "term")  # exact pass, candidates only
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_count"))
    )
    return (
        exact.crossJoin(F.broadcast(tot))
        .where(F.col("exact_count") * MG_K > F.col("n"))
        .select("term", "exact_count")
        .orderBy(F.col("exact_count").desc(), "term")
    )


# --------------------------------------------------------------------------
# q-digest: deterministic mergeable quantile sketch (Shrivastava et al.
# 2004) — the quantile member of the mergeable-summaries family next to
# HLL (distinct), KMV (overlap), CMS/Misra-Gries (frequency)
# --------------------------------------------------------------------------

QD_BITS = 26          # universe = [0, 2^26) cents — covers prices to $671k
QD_K = 2000           # compression factor: rank error <= QD_BITS/QD_K * n
QD_QUANTILES = (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
QD_MERGED_CAP = 500_000  # loud bound on the merged node table


def qdigest_compress(nodes, n: int, k: int, bits: int):
    """Bottom-up q-digest compression over a {(level, idx): count} node
    dict: a node whose (count + sibling + parent) fits under n/k folds
    into its parent. Works for fresh leaf dicts AND for merged digests
    (recompression against a new global n). Mutates and returns
    ``nodes``; node (level, idx) covers [idx*2^level, (idx+1)*2^level),
    level 0 = leaves."""
    thr = n / k
    for level in range(bits):
        for lv, idx in sorted(nodes):
            if lv != level:
                continue
            c = nodes.get((level, idx))
            if c is None:
                continue
            sib = nodes.get((level, idx ^ 1), 0)
            par = nodes.get((level + 1, idx >> 1), 0)
            if c + sib + par <= thr:
                nodes[(level + 1, idx >> 1)] = c + sib + par
                nodes.pop((level, idx), None)
                nodes.pop((level, idx ^ 1), None)
    return nodes


def qdigest_build(value_counts, n: int, k: int, bits: int):
    """Leaf counts {value: count} -> compressed q-digest node dict."""
    return qdigest_compress(
        {(0, int(v)): int(c) for v, c in value_counts.items()}, n, k, bits
    )


def qdigest_quantile(nodes, n: int, q: float, bits: int) -> int:
    """Rank query: scan nodes in increasing upper-bound order (smaller
    ranges first on ties) accumulating counts; the node that crosses
    ceil(q*n) answers with its upper bound. True rank of the answer is
    within (bits/k)*n of q*n — the q-digest guarantee."""
    target = max(1, -(-int(q * n * 1_000_000) // 1_000_000))  # ceil without floats
    acc = 0
    for ub, lv, cnt in sorted(
        ((idx + 1) * (1 << lv) - 1, lv, c) for (lv, idx), c in nodes.items()
    ):
        acc += cnt
        if acc >= target:
            return min(ub, (1 << bits) - 1)
    return (1 << bits) - 1


@query("qdigest_price_quantiles", None)
def qdigest_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q-DIGEST QUANTILES of order totals — the deterministic MERGEABLE
    quantile sketch (Shrivastava et al. 2004): every partition folds
    its rows into <= O(k log U) dyadic-interval counters, counters add
    nodewise across partitions (a plain groupBy-sum — the abelian merge
    all sketch families here share), and one bounded recompress +
    rank-scan answers every quantile with rank error <= (log2 U / k)·n
    = {QD_BITS}/{QD_K}·n ≈ 1.3 %. This is the 100 TB quantile path when
    even the value DOMAIN is too wide for an exact
    distinct-value rollup and percentile_approx's internal sketch
    can't be persisted/merged across jobs: q-digest state is plain
    (level, idx, count) rows — storable, unionable, incrementally
    maintainable like the HLL/KMV/MG registers. Rows-only by design
    (sketch internals are engine-specific); the guarantee is verified
    against exact DuckDB ranks in tests/test_round8_batch7.py, the
    same error-bound contract as `agg_approx_distinct` and
    `misra_gries_heavy_tokens`."""
    import pandas as pd

    orders = load(spark, sf_dir, "orders")
    cents = orders.select(
        F.least(
            F.greatest(F.round(F.col("o_totalprice") * 100).cast("long"), F.lit(0)),
            F.lit((1 << QD_BITS) - 1),
        ).alias("v")
    )

    def sketch_partition(batches):
        counts: dict[int, int] = {}
        n = 0
        for pdf in batches:
            vc = pdf["v"].value_counts()
            n += int(vc.sum())
            for v, c in vc.items():
                counts[int(v)] = counts.get(int(v), 0) + int(c)
        if not counts:
            return
        nodes = qdigest_build(counts, n, QD_K, QD_BITS)
        yield pd.DataFrame(
            {
                "level": [lv for lv, _ in nodes],
                "idx": [ix for _, ix in nodes],
                "cnt": [int(c) for c in nodes.values()],
            }
        )

    merged = (
        cents.mapInPandas(sketch_partition, "level int, idx long, cnt long")
        .groupBy("level", "idx")
        .agg(F.sum("cnt").alias("cnt"))
    )

    def finalize(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > QD_MERGED_CAP:
            raise ValueError(
                f"qdigest_price_quantiles: merged node table {len(pdf)} rows "
                f"exceeds the {QD_MERGED_CAP} cap"
            )
        nodes = {
            (int(lv), int(ix)): int(c)
            for lv, ix, c in zip(pdf["level"], pdf["idx"], pdf["cnt"])
        }
        n = sum(nodes.values())
        # recompress against the GLOBAL n/k threshold (the per-partition
        # passes compressed against their local n)
        thr_nodes = qdigest_compress(nodes, n, QD_K, QD_BITS)
        rows = []
        for q in QD_QUANTILES:
            est = qdigest_quantile(thr_nodes, n, q, QD_BITS)
            rows.append(
                {
                    "q": q,
                    "est_cents": est,
                    "est_price": est / 100.0,
                    "n": n,
                    "n_nodes": len(thr_nodes),
                    "rank_bound": int(QD_BITS / QD_K * n) + 1,
                }
            )
        return pd.DataFrame(rows)

    return (
        merged.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(
            lambda _, pdf: finalize(pdf.drop(columns=["g"])),
            "q double, est_cents bigint, est_price double, n bigint, "
            "n_nodes bigint, rank_bound bigint",
        )
    )
