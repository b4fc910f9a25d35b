"""Sliding-window document chunker (SURVEY.md §2.3 C1/C2).

Semantics (parity with reference ``zc_agent/load_data.py:13-39``):
windows of ``size`` chars every ``step`` chars over a text column; each
chunk carries its 0-based ``start`` offset; iteration STOPS after the
first window whose end reaches strictly past the end of the text
(``i + size > n`` → emit, then break). An empty text emits zero chunks.
``size``/``step`` must be positive.

Spark-first design: the reference's per-row Python loop becomes one
``explode(sequence(...))`` — a narrow, fully codegen'd transform with no
shuffle and no Python. The loop's break rule has the closed form

    last_start(n) = min( step * floor((n-1)/step),
                         step * max(0, floor((n-size)/step) + 1) )

for n > 0: the second term is the first start past ``n - size`` (the
break), the first term caps it at the last start the ``range`` would
ever yield (reachable when ``size <= step`` — windows that never cover
the tail, matching the reference loop exactly).

At 100 TB this matters: chunking is the fan-out stage of ingest
(~2-5× row multiplication) and runs as a map-only stage here — the
expensive shuffle only happens later, keyed however downstream (e.g.
TF-IDF term aggregation) needs it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _last_start(n: Column, size: int, step: int) -> Column:
    past_end = F.lit(step) * F.greatest(
        F.lit(0).cast("long"),
        (F.floor((n - F.lit(size)).cast("double") / F.lit(step)) + F.lit(1)).cast("long"),
    )
    range_cap = F.lit(step) * F.floor((n - F.lit(1)).cast("double") / F.lit(step)).cast("long")
    return F.least(range_cap, past_end)


def sliding_window_starts_sql(n_expr: str, size: int, step: int) -> str:
    """ANSI-SQL fragment for the chunk-start list, shared verbatim by the
    DuckDB oracle (FIXTURES.md B3). Returns a list/array expression."""
    past_end = f"{step} * greatest(0, cast(floor(({n_expr} - {size}) / {step}.0) + 1 as bigint))"
    range_cap = f"{step} * cast(floor(({n_expr} - 1) / {step}.0) as bigint)"
    return f"generate_series(0, least({range_cap}, {past_end}), {step})"


def chunk_documents(
    df: DataFrame,
    text_col: str = "content",
    size: int = 2000,
    step: int = 1000,
    start_col: str = "start",
) -> DataFrame:
    """Explode ``df`` into chunk rows.

    Every other column is inherited by each chunk (reference
    ``chunk_documents`` copies all parent keys except the text); the
    text column is replaced by the chunk substring.
    """
    if size <= 0 or step <= 0:
        raise ValueError("size and step must be positive")

    n = F.length(F.col(text_col))
    starts = F.sequence(F.lit(0).cast("long"), _last_start(n, size, step), F.lit(step).cast("long"))

    passthrough = [c for c in df.columns if c != text_col]
    return (
        df.where(n > 0)
        .withColumn(start_col, F.explode(starts))
        .select(
            *passthrough,
            F.col(start_col),
            F.substring(F.col(text_col), F.col(start_col) + 1, size).alias(text_col),
        )
    )


def chunk_tokens(
    df: DataFrame,
    text_col: str = "content",
    size: int = 64,
    step: int = 32,
    token_pattern: str = r"\w\w+",
    start_col: str = "tok_start",
    chunk_col: str = "chunk",
) -> DataFrame:
    """Token-granularity sliding windows: same break rule as the char
    chunker (C1), applied to the token sequence instead of the raw
    string — the shape an LLM-ingest pipeline uses when chunk budgets
    are counted in tokens, not characters.

    Emits ``start_col`` (0-based token offset), ``chunk_col`` (the
    window's tokens re-joined with single spaces) and ``n_tokens`` (the
    clipped window length). Tokenization keeps the original case — the
    chunk text is payload, not an index key. Docs with zero tokens emit
    zero chunks, mirroring C1's empty-doc rule.

    Same scale story as C1: explode over a codegen'd sequence, map-only,
    no Python and no shuffle.
    """
    if size <= 0 or step <= 0:
        raise ValueError("size and step must be positive")

    toks = F.regexp_extract_all(F.col(text_col), F.lit(token_pattern), F.lit(0))
    df = df.withColumn("_toks", toks)
    n = F.size("_toks").cast("long")
    starts = F.sequence(F.lit(0).cast("long"), _last_start(n, size, step), F.lit(step).cast("long"))

    passthrough = [c for c in df.columns if c not in (text_col, "_toks")]
    return (
        df.where(n > 0)
        .withColumn(start_col, F.explode(starts))
        .select(
            *passthrough,
            F.col(start_col),
            F.array_join(F.slice(F.col("_toks"), F.col(start_col) + 1, size), " ").alias(
                chunk_col
            ),
            F.least(F.lit(size).cast("long"), n - F.col(start_col)).alias("n_tokens"),
        )
    )
