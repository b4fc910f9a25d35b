#!/usr/bin/env python
"""A/B the session-scoped TF-IDF index reuse (VERDICT r12 item 4).

Runs the ten shared-model search-family queries sequentially in ONE
SparkSession (the soak shape, where the rebuild cost actually repeats)
twice — once self-contained (flag off) and once with
SPARK_GRAFT_TFIDF_REUSE=1 — each leg in its own subprocess so JVM/GC
state can't leak between legs. Prints one JSON line with per-query and
total walls for both legs.

Usage: python scripts/ab_tfidf_reuse.py [--sf .scale/sf10] [--legs both|off|on]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FAMILY = [
    # docs-model consumers (8)
    "tfidf_doc_weights",
    "tfidf_multiquery_topk",
    "hybrid_rrf_related_docs",
    "tfidf_search_rocchio",
    "retrieval_eval_metrics",
    "ndcg_retrieval_eval",
    "rag_context_assembly",
    "rerank_stub_topk",
    # chunks-model consumers (2)
    "tfidf_search_topk",
    "mmr_diversified_topk",
]


def run_leg(sf_dir: str, reuse: bool) -> dict:
    code = (
        "import sys, time, json\n"
        f"sys.path.insert(0, {REPO!r})\n"
        "from pyspark.sql import SparkSession\n"
        "spark = (SparkSession.builder.master('local[32]')\n"
        "    .config('spark.sql.shuffle.partitions', '32')\n"
        "    .config('spark.driver.memory', '48g')\n"
        "    .config('spark.sql.adaptive.enabled', 'true')\n"
        "    .config('spark.ui.enabled', 'false').getOrCreate())\n"
        "spark.sparkContext.setLogLevel('ERROR')\n"
        "from data_engineering_rag_spark.plans import REGISTRY\n"
        f"names = {FAMILY!r}\n"
        "walls = {}\n"
        "for n in names:\n"
        f"    t0 = time.time(); REGISTRY[n].spark(spark, {sf_dir!r}).count()\n"
        "    walls[n] = round(time.time() - t0, 1)\n"
        "print('LEG_RESULT ' + json.dumps(walls))\n"
    )
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_TFIDF_REUSE", None)
    if reuse:
        env["SPARK_GRAFT_TFIDF_REUSE"] = "1"
    proc = subprocess.run([sys.executable, "-c", code], capture_output=True,
                          text=True, cwd=REPO, env=env)
    for line in proc.stdout.splitlines():
        if line.startswith("LEG_RESULT "):
            walls = json.loads(line[len("LEG_RESULT "):])
            return {"walls": walls, "total_sec": round(sum(walls.values()), 1)}
    tail = (proc.stderr or proc.stdout).strip().splitlines()[-12:]
    return {"error": " | ".join(tail)[-500:]}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=".scale/sf10")
    ap.add_argument("--legs", default="both", choices=["both", "off", "on"])
    args = ap.parse_args()
    sf = args.sf if os.path.isabs(args.sf) else os.path.join(REPO, args.sf)
    out: dict = {"sf_dir": args.sf, "family": FAMILY}
    if args.legs in ("both", "off"):
        out["self_contained"] = run_leg(sf, reuse=False)
        print(f"off leg: {out['self_contained'].get('total_sec')}s", file=sys.stderr)
    if args.legs in ("both", "on"):
        out["reuse"] = run_leg(sf, reuse=True)
        print(f"on leg: {out['reuse'].get('total_sec')}s", file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
