#!/usr/bin/env python
"""Key-offset replication of the driver testdata to a larger SF.

The driver generates sf{0.001,0.01,0.1}; the design claims in
PERFORMANCE.md (range-exchange kernels, LSH banding, IVF probes) should
be demonstrated at least one order of magnitude past the bench scale.
This script synthesizes an sf1-equivalent from sf0.1 by unioning K
key-offset copies of every scaling table — the TPC-H scaling rule
(nation/region fixed; customer/supplier/part/orders/lineitem/events/
documents/embeddings grow linearly) with referential integrity
preserved: each copy i shifts every key family by i·(max_key+1), so
joins fan out exactly as a natively generated sf1 would.

Text/vector copies are deterministically perturbed (a per-copy suffix
token; a per-copy epsilon on one embedding coordinate) so exact-dup,
MinHash and ANN workloads keep realistic selectivity instead of
degenerating into 10-way duplicate clusters.

Usage: python scripts/make_scale_data.py [--k 10] [--src /root/testdata/sf0.1]
           [--out .scale/sf1]
Output is for LOCAL performance evidence only — never an oracle input
(the driver's correctness gate runs on its own parquet).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

TABLES_FIXED = ["region", "nation"]
# table -> {column: key_family}; every member of a family shifts by the
# same per-copy offset so FK edges stay intact across copies.
KEYED = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {
        "l_orderkey": "order",
        "l_partkey": "part",
        "l_suppkey": "supp",
    },
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=".scale/sf1")
    args = ap.parse_args()

    from data_engineering_rag_spark.session import get_spark
    from data_engineering_rag_spark.sources.catalog import read_parquet_table

    spark = get_spark(app_name="make_scale_data")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.out, exist_ok=True)

    for t in TABLES_FIXED:
        read_parquet_table(spark, args.src, t).write.mode("overwrite").parquet(
            os.path.join(args.out, f"{t}.parquet")
        )
        print(f"{t}: copied (fixed dimension)")

    # one offset per key family = max(key)+1 over the source table that
    # owns it (PK side), shared by every FK reference.
    owners = {
        "cust": ("customer", "c_custkey"),
        "supp": ("supplier", "s_suppkey"),
        "part": ("part", "p_partkey"),
        "order": ("orders", "o_orderkey"),
        "event": ("events", "event_id"),
        "user": ("events", "user_id"),
        "doc": ("documents", "doc_id"),
        "vec": ("embeddings", "vec_id"),
    }
    offsets = {}
    for fam, (tbl, col) in owners.items():
        offsets[fam] = (
            read_parquet_table(spark, args.src, tbl).agg(F.max(col)).first()[0] + 1
        )
    print("offsets:", offsets)

    copies = spark.range(args.k).select(F.col("id").alias("_copy"))
    for t, keymap in KEYED.items():
        df = read_parquet_table(spark, args.src, t)
        out = df.crossJoin(copies)
        for col, fam in keymap.items():
            out = out.withColumn(
                col, (F.col(col) + F.col("_copy") * F.lit(offsets[fam])).cast("long")
            )
        if t == "documents":
            # a distinct per-copy char interleaved every 8 chars drives
            # cross-copy Jaccard (char 5-shingles) to ~0.3, so copies
            # are neither exact dups nor LSH near-dups — selectivity
            # stays that of the base corpus instead of every doc
            # becoming a 10-way duplicate cluster (which makes the
            # candidate-pair verify stage quadratic in K, a workload
            # change, not a scale-up; both runs are recorded in
            # PERFORMANCE.md).
            marks = F.array(*[F.lit(chr(0x0391 + j)) for j in range(args.k)])
            out = out.withColumn(
                "text",
                F.when(F.col("_copy") == 0, F.col("text")).otherwise(
                    F.regexp_replace(
                        F.col("text"),
                        F.lit("(.{8})"),
                        F.concat(F.lit("$1"), F.element_at(marks, F.col("_copy").cast("int") + 1)),
                    )
                ),
            ).withColumn("n_chars", F.length("text").cast("long"))
        if t == "embeddings":
            eps = F.col("_copy").cast("float") * F.lit(1e-3)
            out = out.withColumn(
                "embedding",
                F.concat(
                    F.array((F.element_at("embedding", 1) + eps).cast("float")),
                    F.slice("embedding", 2, 10_000_000),
                ),
            )
        out = out.drop("_copy").select(*df.columns)
        out.repartition(32).write.mode("overwrite").parquet(
            os.path.join(args.out, f"{t}.parquet")
        )
        n = spark.read.parquet(os.path.join(args.out, f"{t}.parquet")).count()
        print(f"{t}: {n} rows (x{args.k})")


if __name__ == "__main__":
    main()
