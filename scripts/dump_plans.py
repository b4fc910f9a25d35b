#!/usr/bin/env python
"""Dump .explain("formatted") for bench queries to plans/<round>/<name>_<tag>.txt.

Usage: python scripts/dump_plans.py [--out plans/rNN] <tag> [name ...]
With no names, dumps every bench.py query. The session uses the same
get_spark() config as bench.py so plan shapes match what the bench runs.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    args = sys.argv[1:]
    out_dir = None
    if args and args[0] == "--out":
        args.pop(0)
        out_dir = os.path.join(_REPO, args.pop(0))
    if not args:
        print(__doc__.strip(), file=sys.stderr)
        raise SystemExit(2)
    tag = args.pop(0)
    names = args
    out = out_dir or os.path.join(_REPO, "plans", "r17")
    if not names:
        from bench import BENCH_QUERIES

        names = list(BENCH_QUERIES)

    from data_engineering_rag_spark.plans import REGISTRY
    from data_engineering_rag_spark.session import get_spark

    spark = get_spark(app_name="dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)
    for name in names:
        df = REGISTRY[name].spark(spark, SF_DIR)
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        path = os.path.join(out, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange mentions)")
    spark.stop()


if __name__ == "__main__":
    main()
