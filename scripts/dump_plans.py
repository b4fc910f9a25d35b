#!/usr/bin/env python
"""Dump .explain("formatted") for bench queries to plans/r16/<name>_<tag>.txt.

Usage: python scripts/dump_plans.py <tag> [name ...]
With no names, dumps every bench.py query. The session uses the same
get_spark() config as bench.py so plan shapes match what the bench runs.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r16")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    if not names:
        from bench import BENCH_QUERIES

        names = list(BENCH_QUERIES)

    from data_engineering_rag_spark.plans import REGISTRY
    from data_engineering_rag_spark.session import get_spark

    spark = get_spark(app_name="dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in names:
        df = REGISTRY[name].spark(spark, SF_DIR)
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange mentions)")
    spark.stop()


if __name__ == "__main__":
    main()
