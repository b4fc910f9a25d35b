"""Python UDTFs (SURVEY.md §2.11 U4 — the true table-function surface).

The reference's structured-output LLM calls are UDTF-shaped (1 row in,
N typed rows out — ``zc_agent/eval/generate_questions.py:31-36``); the
engine's production implementations use ``mapInPandas`` (Arrow-batched,
the fast path). This module provides the same shape as a real Spark 4
``@udtf`` table function for API completeness: per-row Python, lateral
join — the right tool when per-row fan-out logic is genuinely
imperative and batch-vectorization buys nothing.

Documented trade-off: a UDTF runs row-at-a-time Python (no Arrow
batching in the eval loop), so the built-in ``explode(transform(...))``
chunkers in ``operators/chunker.py`` remain the 100 TB path; the test
suite pins this UDTF's output equal to ``chunk_tokens`` so the two can
never drift.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf


@udtf(returnType="tok_start: bigint, chunk: string, n_tokens: bigint")
class TokenWindows:
    """Sliding token windows with the C1 break rule (strict-``>`` stop
    after the first window reaching past the end; zero tokens → zero
    rows). Mirrors ``operators/chunker.py::chunk_tokens`` exactly."""

    def eval(self, text: str, size: int, step: int):  # noqa: D102
        if size is None or step is None or size <= 0 or step <= 0:
            raise ValueError("size and step must be positive")
        toks = re.findall(r"\w\w+", text or "", re.ASCII)
        n = len(toks)
        for i in range(0, n, step):
            w = toks[i : i + size]
            yield i, " ".join(w), len(w)
            if i + size > n:
                break


def token_windows_via_udtf(
    spark: SparkSession,
    df: DataFrame,
    text_col: str = "content",
    size: int = 64,
    step: int = 32,
) -> DataFrame:
    """Lateral-join the UDTF against ``df`` (one fan-out per row),
    carrying every non-text column through — the table-function
    spelling of the chunker. SQL `LATERAL` keeps the join co-located:
    no shuffle, same as the explode path."""
    spark.udtf.register("token_windows", TokenWindows)
    df.createOrReplaceTempView("_udtf_src")
    passthrough = [c for c in df.columns if c != text_col]
    cols = ", ".join([f"s.{c}" for c in passthrough] + ["f.tok_start", "f.chunk", "f.n_tokens"])
    return spark.sql(
        f"SELECT {cols} FROM _udtf_src s, "
        f"LATERAL token_windows(s.{text_col}, {int(size)}, {int(step)}) f"
    )
