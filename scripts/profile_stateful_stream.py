#!/usr/bin/env python
"""Profile stream_user_totals_stateful's Python-rate bound (VERDICT r12
item 5).

The r12 sf10 soak recorded 575 s for the applyInPandasWithState running
totals — the registry's worst wall after the FS fix. This script makes
the cost model executable instead of anecdotal:

1. ARITHMETIC — the operator's Python work is one `update()` call per
   (micro-batch, user-group-present-in-that-batch) pair, each of which
   constructs a 1-row pandas DataFrame. With per-file triggers (kept by
   design: the multi-batch equivalence test needs >1 batch) the exact
   invocation count is sum over part files of distinct(user_id), which
   a cheap batch job computes here.
2. MEASURE v1 — wall for the registered applyInPandasWithState query.
3. MEASURE v2 — wall for the transformWithStateInPandas twin
   (user_totals_state_v2_stream), which batches state traffic
   differently; needs the protobuf fallback bootstrap (same mechanism
   as tests/conftest.py) — skipped with a note if unavailable.

Prints one JSON line; paste the numbers into PERFORMANCE.md.

Usage: python scripts/profile_stateful_stream.py [--sf .scale/sf10]
           [--skip-v1] [--skip-v2]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_BOOT = (
    "import sys, os\n"
    f"sys.path.insert(0, {REPO!r})\n"
    "sys.path.insert(0, os.path.join({REPO!r}, 'tests'))\n".replace("{REPO!r}", repr(REPO))
    + "import conftest  # protobuf fallback bootstrap (no-op if present)\n"
)


def _child(code: str) -> dict:
    proc = subprocess.run([sys.executable, "-c", code], capture_output=True,
                          text=True, cwd=REPO)
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    tail = (proc.stderr or proc.stdout).strip().splitlines()[-12:]
    return {"error": " | ".join(tail)[-500:]}


def _session_code() -> str:
    return (
        "from pyspark.sql import SparkSession\n"
        "spark = (SparkSession.builder.master('local[32]')\n"
        "    .config('spark.sql.shuffle.partitions', '32')\n"
        "    .config('spark.driver.memory', '48g')\n"
        "    .config('spark.ui.enabled', 'false').getOrCreate())\n"
        "spark.sparkContext.setLogLevel('ERROR')\n"
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=".scale/sf10")
    ap.add_argument("--skip-v1", action="store_true")
    ap.add_argument("--skip-v2", action="store_true")
    ap.add_argument("--coarse", action="store_true",
                    help="also measure the single-drain (files_per_trigger="
                         "None) escape-hatch variants")
    args = ap.parse_args()
    sf = args.sf if os.path.isabs(args.sf) else os.path.join(REPO, args.sf)
    out: dict = {"sf_dir": args.sf}

    # 1) arithmetic: group invocations = sum over files of distinct users
    code = _BOOT + _session_code() + (
        "import json, glob, os\n"
        "import pyspark.sql.functions as F\n"
        "from data_engineering_rag_spark.sources.catalog import read_parquet_table\n"
        f"ev = read_parquet_table(spark, {sf!r}, 'events')\n"
        "from pyspark.sql.functions import input_file_name\n"
        "per_file = (ev.select(input_file_name().alias('f'), 'user_id')\n"
        "    .groupBy('f').agg(F.countDistinct('user_id').alias('u'),"
        " F.count(F.lit(1)).alias('rows')))\n"
        "rows = per_file.collect()\n"
        "res = {'files': len(rows), 'group_invocations': int(sum(r.u for r in rows)),\n"
        "       'total_rows': int(sum(r.rows for r in rows)),\n"
        "       'distinct_users': ev.select('user_id').distinct().count()}\n"
        "print('RESULT ' + json.dumps(res))\n"
    )
    out["arithmetic"] = _child(code)

    # 2) + 3) walls, one fresh subprocess each (probe methodology).
    # The *_coarse variants are the single-drain escape hatch
    # (files_per_trigger=None → one availableNow batch → ONE update()
    # call per user instead of one per (file, user) — ~|files|× fewer
    # Python state calls, identical final totals).
    variants = []
    if not args.skip_v1:
        variants.append(("v1_applyInPandasWithState", "user_totals_stateful_stream", ""))
        if args.coarse:
            variants.append(("v1_coarse_single_drain",
                             "user_totals_stateful_stream", ", files_per_trigger=None"))
    if not args.skip_v2:
        variants.append(("v2_transformWithStateInPandas", "user_totals_state_v2_stream", ""))
        if args.coarse:
            variants.append(("v2_coarse_single_drain",
                             "user_totals_state_v2_stream", ", files_per_trigger=None"))
    for label, fn, extra in variants:
        code = _BOOT + _session_code() + (
            "import json, time\n"
            f"from data_engineering_rag_spark.streaming.events import {fn}\n"
            f"t0 = time.time(); n = {fn}(spark, {sf!r}{extra}).count()\n"
            "print('RESULT ' + json.dumps({'rows': n, 'sec': round(time.time()-t0, 1)}))\n"
        )
        out[label] = _child(code)

    a = out.get("arithmetic", {})
    for label in ("v1_applyInPandasWithState", "v2_transformWithStateInPandas"):
        r = out.get(label)
        if r and "sec" in r and a.get("group_invocations"):
            r["us_per_group_call"] = round(1e6 * r["sec"] / a["group_invocations"], 1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
