#!/usr/bin/env python
"""Isolated per-query timing: noop-sink walls for named queries, N reps
each, one warmed session — the same methodology as bench.py minus the
unrelated queries. Usage:

    python scripts/time_query.py name1 [name2 ...] [--reps 3] [--sf DIR]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    reps, sf_dir, names = 3, os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"), []
    while args:
        a = args.pop(0)
        if a == "--reps":
            reps = int(args.pop(0))
        elif a == "--sf":
            sf_dir = args.pop(0)
        else:
            names.append(a)

    from data_engineering_rag_spark.plans import REGISTRY
    from data_engineering_rag_spark.session import get_spark

    spark = get_spark(app_name="time_query")
    spark.sparkContext.setLogLevel("ERROR")
    # Same JVM/codegen warm-up as bench.py.
    REGISTRY["q1_pricing_summary"].spark(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    for name in names:
        spec = REGISTRY[name]
        runs = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"time_query:{name}")
            t0 = time.perf_counter()
            spec.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        print(
            f"{name}: median {statistics.median(runs):.3f}s  "
            f"runs {[round(r, 3) for r in runs]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
