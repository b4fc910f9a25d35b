#!/usr/bin/env python
"""Structural census over the whole registry: for every query, count
`Scan parquet` nodes and Exchanges in the physical plan (tree section of
explain formatted). Repeated scans of the same base pipeline mark
un-deduplicated subtrees — the round-16 systemic finding. Plan-building
only (queries with eager checkpoints/fits do execute their
materialization step).

Usage: python scripts/scan_census.py [--sf DIR] > census.tsv
"""
from __future__ import annotations

import contextlib
import io
import os
import sys
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = "/root/testdata/sf0.01"
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--sf":
            sf_dir = args.pop(0)

    from data_engineering_rag_spark.operators.scale import ScanParallelismWarning
    from data_engineering_rag_spark.plans import REGISTRY
    from data_engineering_rag_spark.session import get_spark

    warnings.simplefilter("ignore", ScanParallelismWarning)
    spark = get_spark(app_name="scan_census")
    spark.sparkContext.setLogLevel("ERROR")
    for name, spec in REGISTRY.items():
        try:
            df = spec.spark(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
            tree = plan.split("\n\n")[0]  # tree section only
            scans = tree.count("Scan parquet")
            exch = tree.count("Exchange")
            gens = tree.count("Generate")
            pyev = sum(tree.count(k) for k in ("BatchEvalPython", "ArrowEvalPython"))
            mip = sum(tree.count(k) for k in ("MapInPandas", "PythonMapInArrow", "MapInArrow"))
            print(f"{name}\t{scans}\t{exch}\t{gens}\t{pyev}\t{mip}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}\tERR\t{type(e).__name__}: {str(e)[:80]}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
