#!/usr/bin/env python
"""Full-registry soak: execute EVERY registered query (count-only) at a
given SF dir — default the sf1-equivalent at .scale/sf1 — and report
wall + row count per query. Empty stream outputs are failures (the r7
soak caught two multi-batch streaming bugs exactly this way).

Usage: python scripts/soak_registry.py [--sf DIR] [--only SUBSTR] [--skip-slow]
"""
import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import SparkSession

sf_dir = "/root/repo/.scale/sf1"
only = None
skip: set = set()
args = sys.argv[1:]
while args:
    a = args.pop(0)
    if a == "--sf":
        sf_dir = args.pop(0)
    elif a == "--only":
        only = args.pop(0)
    elif a == "--skip":
        # comma-separated names (e.g. the two documented
        # output-quadratic similarity joins at sf10 — their true
        # answers grow ~K^2 in the replication factor)
        skip = set(args.pop(0).split(","))

from data_engineering_rag_spark.plans import REGISTRY

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "48g")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

fails = []
results = {}
t_all = time.time()
names = [n for n in REGISTRY if (only is None or only in n) and n not in skip]
if skip:
    print(f"skipping {sorted(skip & set(REGISTRY))}", flush=True)
for i, name in enumerate(names):
    spec = REGISTRY[name]
    t0 = time.time()
    try:
        cnt = spec.spark(spark, sf_dir).count()
        wall = time.time() - t0
        # Streams that emit zero rows at sf1 are red flags, not passes
        # (directory-table stream bug class). Batch queries may be
        # legitimately empty at some SFs; streams should never be.
        suspicious = cnt == 0 and name.startswith(("stream_", "pyds_stream"))
        results[name] = {"rows": cnt, "sec": round(wall, 1)}
        mark = "SUSPICIOUS-EMPTY" if suspicious else "ok"
        if suspicious:
            fails.append((name, "stream produced 0 rows"))
        print(f"[{i:03d}/{len(names)}] {mark} {name}: {cnt} rows ({wall:.1f}s)", flush=True)
    except Exception as e:  # noqa: BLE001
        wall = time.time() - t0
        fails.append((name, f"{type(e).__name__}: {e}"))
        results[name] = {"error": str(e)[:500], "sec": round(wall, 1)}
        print(f"[{i:03d}/{len(names)}] FAIL {name} ({wall:.1f}s): {type(e).__name__}: {str(e)[:300]}", flush=True)

# Memo teardown (r16, VERDICT r15 item 6): the soak runs with
# SPARK_GRAFT_TFIDF_REUSE=1, so both fitted-artifact memos hold
# persisted tables keyed on THIS session — release them before the
# session goes away (see operators/memo.py lifecycle contract).
from data_engineering_rag_spark.operators.lsh_ml import clear_ml_lsh_memo
from data_engineering_rag_spark.plans.rag import clear_tfidf_memo

clear_tfidf_memo()
clear_ml_lsh_memo()

print(f"\nsoak {len(names)} queries, {len(fails)} failures, total {time.time()-t_all:.0f}s")
for n, msg in fails:
    print(f"  FAIL {n}: {msg[:200]}")
with open("/tmp/soak_results.json", "w") as f:
    json.dump(results, f, indent=1)
sys.exit(1 if fails else 0)
