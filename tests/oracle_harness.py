"""Local mirror of the driver's DuckDB-oracle comparison: run a
registered Spark query and its oracle SQL on the same parquet tables,
sort columns by name, sort rows, and compare values exactly (floats
must match bit-for-bit after the queries' own explicit rounding —
the driver hashes, so approximate equality is NOT enough)."""

from __future__ import annotations

import math
from datetime import datetime
from decimal import Decimal

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm(v):
    # Type classes are preserved deliberately: an int must NOT equal an
    # equal-valued float (the driver may hash types/representations, so
    # e.g. DuckDB ceil()→DOUBLE vs Spark ceil()→LONG has to FAIL here
    # and be fixed with explicit casts in the oracle SQL).
    if v is None:
        return None
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, Decimal):
        return ("decimal", str(v))
    if isinstance(v, float):
        return ("float", "NaN" if math.isnan(v) else v)
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return [c for _, c in sorted(zip(range(len(cols)), [cols[i] for i in order]))], out


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> tuple[bool, str]:
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    res = con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    _, s_canon = _canon(s_rows, s_cols)
    _, d_canon = _canon(d_rows, d_cols)
    for i, (a, b) in enumerate(zip(s_canon, d_canon)):
        if a != b:
            return False, f"first row diff at sorted idx {i}:\n  spark : {a}\n  duckdb: {b}"
    return True, f"ok:{len(s_rows)}"
