#!/usr/bin/env python
"""Ad-hoc parity check for a subset of registered queries:
python scripts/check_queries.py name1 name2 ... [--sf DIR]"""
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

from pyspark.sql import SparkSession

from data_engineering_rag_spark.plans import REGISTRY
from oracle_harness import compare, duckdb_conn

sf_dir = "/root/testdata/sf0.001"
names = []
args = sys.argv[1:]
while args:
    a = args.pop(0)
    if a == "--sf":
        sf_dir = args.pop(0)
    else:
        names.append(a)

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.driver.memory", "8g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
con = duckdb_conn(sf_dir)
fail = 0
for n in names:
    spec = REGISTRY[n]
    t0 = time.time()
    try:
        if spec.oracle is None:
            cnt = spec.spark(spark, sf_dir).count()
            print(f"ROWS-ONLY {n}: {cnt} rows ({time.time()-t0:.1f}s)")
            continue
        ok, msg = compare(spec.spark(spark, sf_dir), con, spec.oracle)
    except Exception as e:  # noqa: BLE001
        ok, msg = False, f"EXC {type(e).__name__}: {e}"
    status = "OK" if ok else "FAIL"
    if not ok:
        fail += 1
    print(f"{status} {n} ({time.time()-t0:.1f}s)" + ("" if ok else f"\n  {msg[:2000]}"))
sys.exit(1 if fail else 0)
