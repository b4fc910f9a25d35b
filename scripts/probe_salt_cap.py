#!/usr/bin/env python
"""Measure the IVF self-join salt-CAP region (r15, VERDICT r14 item 3).

The derived salt (plans/vectors.py::ivf_self_join_salt) is
S = clamp(ceil(n/2048), 1, 64); r14 measured S<=11 (20k-row sf10
buckets) and the cap region was arithmetic, not evidence. This probe
builds DEGENERATE-LABEL fixtures (one bucket of exactly n rows, label
collapsed to 0, vectors sliced from .scale/sf10 embeddings) and runs
the registered ``embedding_near_dup_via_ivf`` query on them — the
real plan, the real derived salt, one fresh subprocess per variant
(the scale_probe methodology).

Variant design — the pair space grows as n^2/2, so the cap region is
probed with one honest point per question rather than a sweep:

- ``s10_n20k``  / ``s32_n65k`` / ``s64_n131k_cap``: the derived rule
  at n = 20,000 / 65,536 / 131,072 — S = 10/32/64, salted groups held
  at ~2,000 rows throughout. 131,072 is the exact row count where the
  cap binds (ceil(n/2048) = 64). "Flat walls approaching the cap"
  means flat ns/PAIR across these three (total pairs n(n-1)/2 grow
  43x), not flat absolute walls.
- ``s64geom_n16k``: cheap cap-GEOMETRY twin — IVF_SALT_GROUP_TARGET
  overridden to 256 so a 16,384-row bucket derives S=64: the full
  2,080-block / 32.5x-replication explode shape at 1/64 the pair
  work. Separates "does the S=64 block geometry behave" from the
  hours-long full-scale wall.
- ``pastcap_g5k`` / ``pastcap_g10k``: the PAST-CAP regime (a bucket
  past ~262k rows would have groups > 4096 even at S=64) emulated at
  controlled geometry by clamping IVF_SELF_JOIN_SALT_CAP to 4 / 2 on
  the 20k-row bucket — salted groups of 5,000 / 10,000 rows, past the
  sortMergeJoinExec in-memory buffer cliff. The per-pair penalty vs
  ``s10_n20k`` (same bucket, same pairs, only the group size moves)
  IS the documented "IVF is mis-sized" cost curve.

Overrides patch module constants in the CHILD process only; the
checked-in constants never change. Results go to
.scale/salt_cap_probe.json and the PERFORMANCE.md r15 entry.

Methodology notes (learned from the first s64geom run, 989.7 s, and
the controlled follow-up that isolated the variable):
- The fixture is written as ~32 parquet files, NOT one. The file
  count was the ENTIRE 16.5x effect: single-file 989.7 s vs 32-file
  55.9 s at identical default AQE config — one small file is one
  scan partition, and the plan keeps that one-partition layout
  through the join (one core for the whole wall). Kept in the JSON
  as ``s64geom_n16k_singlefile_aqe``.
- The child disables spark.sql.adaptive.coalescePartitions as a
  DETERMINISM guard only — measured cost none (55.9 s coalescing-on
  vs 54.5/59.9 s off on the 32-file fixture); production keeps
  coalescing ON.

Usage:
  python scripts/probe_salt_cap.py            # all variants (~90 min)
  python scripts/probe_salt_cap.py --only pastcap
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
SRC = os.path.join(REPO, ".scale", "sf10", "embeddings.parquet")
OUT_DIR = os.path.join(REPO, ".scale", "saltcap")

#: (label, n_rows, {vectors-module constant overrides}, note[, opts])
#: opts (optional 5th element): n_files — fixture file count (default
#: 32); default_aqe — True keeps AQE partition coalescing at its
#: default ON (the production config) instead of the probe's
#: determinism-guard OFF.
VARIANTS = [
    ("s64_n131k_cap", 131_072, {},
     "cap point: derived S=64, groups 2048 (8.6e9 pairs)"),
    ("s32_n65k", 65_536, {},
     "derived S=32, groups 2048 (2.1e9 pairs)"),
    ("s10_n20k", 20_000, {},
     "baseline: derived S=10, groups 2000 (2.0e8 pairs)"),
    ("s64geom_n16k", 16_384, {"IVF_SALT_GROUP_TARGET": 256},
     "cap geometry twin: S=64, groups 256, 2080 blocks, 1.3e8 pairs"),
    ("pastcap_g5k", 20_000, {"IVF_SELF_JOIN_SALT_CAP": 4},
     "past-cap emulation: S clamped to 4, groups 5000 (over the cliff)"),
    ("pastcap_g10k", 20_000, {"IVF_SELF_JOIN_SALT_CAP": 2},
     "deep past-cap: S clamped to 2, groups 10000"),
    # r16 (VERDICT item 1 acceptance): the EXACT 989.7 s condition —
    # ONE fixture file, default AQE — rerun with the engine's
    # ensure_scan_parallelism guard in place. Done = the wall lands
    # near the 32-file 55.9 s, not the unguarded 989.7 s.
    ("s64geom_n16k_singlefile_guarded", 16_384,
     {"IVF_SALT_GROUP_TARGET": 256},
     "guard acceptance: single-file fixture + default AQE; r15 measured "
     "989.7 s unguarded vs 55.9 s at 32 files",
     {"n_files": 1, "default_aqe": True}),
]


N_FIXTURE_FILES = 32


def ensure_bucket(n: int, n_files: int = N_FIXTURE_FILES) -> str:
    """One-bucket fixture dir: embeddings.parquet/ (n_files files — 32
    by default so the scan, and the explode it feeds, parallelizes;
    1 for the guard-acceptance variant) with label := 0. Written to a
    temp dir and renamed into place so an interrupted write can never
    be mistaken for a complete fixture, and row-count-ASSERTED before
    the rename (ADVICE r15): the WHERE vec_id < n slice silently
    shrinks if the source vec_ids are not dense 0..N-1, which would
    skew every ns_per_pair denominator."""
    suffix = f"n{n}" if n_files == N_FIXTURE_FILES else f"n{n}_f{n_files}"
    d = os.path.join(OUT_DIR, suffix)
    pq_dir = os.path.join(d, "embeddings.parquet")
    if not os.path.exists(pq_dir):
        import shutil

        tmp_dir = pq_dir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)  # prior aborted write
        os.makedirs(tmp_dir)
        import duckdb

        for i in range(n_files):
            duckdb.sql(
                f"COPY (SELECT vec_id, embedding, 0::INTEGER AS label "
                f"FROM read_parquet('{SRC}/*.parquet') "
                f"WHERE vec_id < {n} AND vec_id % {n_files} = {i}) "
                f"TO '{tmp_dir}/part-{i:03d}.parquet' (FORMAT PARQUET)"
            )
        written = duckdb.sql(
            f"SELECT count(*) FROM read_parquet('{tmp_dir}/*.parquet')"
        ).fetchone()[0]
        if written != n:
            shutil.rmtree(tmp_dir, ignore_errors=True)
            raise AssertionError(
                f"fixture n{n}: wrote {written} rows, expected {n} — source "
                f"vec_ids not dense 0..N-1? ({SRC})"
            )
        os.rename(tmp_dir, pq_dir)
    return d


def run_child(sf_dir: str, overrides: dict, default_aqe: bool = False) -> dict:
    """One variant in a fresh subprocess (shared scaffold:
    scripts/probe_child.py, r15 review)."""
    from scripts.probe_child import run_probe_child

    patches = "".join(
        f"V.{k} = {v}\n" for k, v in overrides.items()
    )
    body = (
        "import data_engineering_rag_spark.plans.vectors as V\n"
        + patches +
        "from data_engineering_rag_spark.plans import REGISTRY\n"
        "t0 = time.time()\n"
        f"n = REGISTRY['embedding_near_dup_via_ivf'].spark(spark, {sf_dir!r}).count()\n"
    )
    # see module docstring: measurement variants keep join parallelism
    # fixed at 32 so walls compare GROUP behavior, not AQE's coalescing
    # of a compressed-small single-bucket shuffle; the guard-acceptance
    # variant keeps the production default (coalescing ON — the exact
    # 989.7 s condition).
    confs = (
        [] if default_aqe
        else [("spark.sql.adaptive.coalescePartitions.enabled", "false")]
    )
    return run_probe_child(REPO, body, extra_confs=confs)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None)
    ap.add_argument("--out-json", default=".scale/salt_cap_probe.json")
    args = ap.parse_args()

    print(f"host 1-min load average (this VM only): {os.getloadavg()[0]:.1f}",
          flush=True)
    out = os.path.join(REPO, args.out_json)
    results: dict[str, dict] = {}
    if os.path.exists(out):  # merge: --only reruns one variant, keeps rest
        with open(out) as f:
            results = json.load(f)
    ran: list[str] = []  # exit status judges THIS run, not merged history
    for label, n, overrides, note, *rest in VARIANTS:
        opts = rest[0] if rest else {}
        if args.only and args.only not in label:
            continue
        ran.append(label)
        sf_dir = ensure_bucket(n, n_files=opts.get("n_files", N_FIXTURE_FILES))
        t0 = time.time()
        res = run_child(sf_dir, overrides, default_aqe=opts.get("default_aqe", False))
        if "error" in res:
            results[label] = {"n": n, "overrides": overrides, **res}
            print(f"ERROR {label}: {res['error'][:300]}", flush=True)
            continue
        pairs = n * (n - 1) // 2
        res.update(
            n=n, overrides=overrides, note=note, pairs=pairs,
            ns_per_pair=round(1e9 * res["sec"] / pairs, 1),
            child_total_sec=round(time.time() - t0, 1),
        )
        results[label] = res
        print(f"{label}: n={n} rows_out={res['rows']} wall={res['sec']}s "
              f"({res['ns_per_pair']} ns/pair)  # {note}", flush=True)

    with open(out, "w") as f:
        json.dump(results, f, indent=1)
        f.write("\n")
    print(f"-> {out}")
    return 1 if any("error" in results[label] for label in ran) else 0


if __name__ == "__main__":
    sys.exit(main())
