"""Registry invariants: every query has a well-formed oracle (DuckDB
can EXPLAIN it against the real views — catches dialect drift in
seconds, before any data runs) and a correctly-shaped Spark callable."""

from __future__ import annotations

import inspect

from data_engineering_rag_spark.plans import REGISTRY

from .oracle_harness import duckdb_conn


def test_registry_shapes():
    assert len(REGISTRY) >= 100
    for name, spec in REGISTRY.items():
        assert spec.name == name
        params = list(inspect.signature(spec.spark).parameters)
        assert len(params) == 2, f"{name}: callable must take (spark, sf_dir)"


def test_all_oracles_explain(sf_dir):
    con = duckdb_conn(sf_dir)
    try:
        for name, spec in sorted(REGISTRY.items()):
            if spec.oracle is None:
                continue
            try:
                con.execute(f"EXPLAIN {spec.oracle}")
            except Exception as exc:  # pragma: no cover
                raise AssertionError(f"oracle for {name!r} failed to plan: {exc}") from exc
    finally:
        con.close()
