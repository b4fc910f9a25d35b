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


def test_coverage_md_counts():
    """COVERAGE.md's headline registry counts must match the live
    REGISTRY — the r7 verdict caught this sentence drifting (321/296
    while the registry imported at 325/300)."""
    import pathlib
    import re

    text = pathlib.Path(__file__).resolve().parents[1].joinpath("COVERAGE.md").read_text()
    m = re.search(r"\*\*(\d+) queries / (\d+)\s*\noracles\*\*", text) or re.search(
        r"\*\*(\d+) queries / (\d+) oracles\*\*", text
    )
    assert m, "COVERAGE.md must state '**N queries / M oracles**'"
    # Count what the DRIVER sees: a plain import without the conftest
    # protobuf bootstrap. The state-v2 queries are env-gated (they
    # register only where transformWithStateInPandas's protobuf works —
    # pytest's conftest repairs it, the driver env may not). Single
    # source of truth: test_rows_only_evidence.ENV_GATED.
    from tests.test_rows_only_evidence import ENV_GATED

    names = set(REGISTRY) - set(ENV_GATED)
    n_oracle = sum(1 for n in names if REGISTRY[n].oracle is not None)
    assert (int(m.group(1)), int(m.group(2))) == (len(names), n_oracle), (
        f"COVERAGE.md says {m.group(1)}/{m.group(2)}, registry (minus "
        f"env-gated) is {len(names)}/{n_oracle} — update COVERAGE.md"
    )


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
