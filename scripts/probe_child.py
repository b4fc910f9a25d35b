#!/usr/bin/env python
"""Shared subprocess runner for the measurement/gate probes (r15
review cleanup): ``scale_probe.py`` and ``probe_salt_cap.py`` each
launch one fresh SparkSession per measured family so every wall is a
single-shot number. The child scaffold — sys.path setup, the
standard local[32] session, the ``PROBE_RESULT`` line protocol, and
the stderr-tail error capture — lives here once, so a fix to the
protocol or the session config reaches every probe script.

``body`` is a string of python statements executed after the session
exists; it must bind ``n`` (the result row count) and ``t0`` (the
measurement start time). ``extra_confs`` appends session configs;
``bootstrap_conftest`` runs the tests' protobuf fallback bootstrap
BEFORE the JVM starts (needed by families that register the state-v2
streaming queries).
"""

from __future__ import annotations

import json
import subprocess
import sys


def run_probe_child(
    repo: str,
    body: str,
    extra_confs: list[tuple[str, str]] | None = None,
    bootstrap_conftest: bool = False,
) -> dict:
    """Run ``body`` in a fresh subprocess; returns {rows, sec} or {error}."""
    # !r interpolation (ADVICE r15): a quote/backslash in a conf value
    # must not become a child SyntaxError that only surfaces as a
    # truncated stderr tail
    confs = "".join(
        f"    .config({k!r}, {v!r})\n" for k, v in (extra_confs or [])
    )
    boot = ""
    if bootstrap_conftest:
        # protobuf fallback bootstrap (tests/conftest.py) BEFORE the JVM
        # starts: registers the state-v2 streaming queries and exports
        # PYTHONPATH so stateful workers can deserialize proto messages
        boot = (
            f"sys.path.insert(0, os.path.join({repo!r}, 'tests'))\n"
            "import conftest\n"
            "sys.path.pop(0)\n"
        )
    code = (
        "import sys, os, time, json\n"
        f"sys.path.insert(0, {repo!r})\n"
        + boot +
        "from pyspark.sql import SparkSession\n"
        "spark = (SparkSession.builder.master('local[32]')\n"
        "    .config('spark.sql.shuffle.partitions', '32')\n"
        "    .config('spark.driver.memory', '48g')\n"
        "    .config('spark.sql.adaptive.enabled', 'true')\n"
        + confs +
        "    .config('spark.ui.enabled', 'false').getOrCreate())\n"
        "spark.sparkContext.setLogLevel('ERROR')\n"
        + body +
        "print('PROBE_RESULT ' + json.dumps({'rows': n, 'sec': round(time.time() - t0, 1)}))\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, cwd=repo
    )
    for line in proc.stdout.splitlines():
        if line.startswith("PROBE_RESULT "):
            return json.loads(line[len("PROBE_RESULT "):])
    tail = (proc.stderr or proc.stdout).strip().splitlines()[-15:]
    return {"error": " | ".join(tail)[-500:] or f"exit {proc.returncode}"}
