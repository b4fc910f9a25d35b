"""Text projections (SURVEY.md §2.2 F8 fence strip and friends).

Parity target: ``zc_agent/prepare_data.py:147-160`` —
``strip()`` the text; if it doesn't start with ``````` return it; else drop
the first line; if the (remaining) last line strips to ``````` drop it
too; join with newlines.

Implemented as pure Column expressions over ``\\n``-separated text
(documented narrowing: Python ``splitlines`` also splits on ``\\r`` and
exotic separators; the engine pins ``\\n``, which is what the corpus
contains). The identical regexes run in the DuckDB oracle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# NOTE: \x0B (vertical tab), NOT \v — Java regex \v is the vertical-
# WHITESPACE class (includes \n), which would eat blank lines before a
# trailing fence. \x0B parses identically in Java and RE2.
_WS = r"[ \t\r\f\x0B]"
# Python str.strip(): all leading/trailing whitespace.
_STRIP_LEAD = r"^\s+"
_STRIP_TRAIL = r"\s+$"
# First line incl. its newline (or the whole single-line string).
_FIRST_LINE = "^[^\\n]*(\\n|$)"
# A trailing line consisting of ``` with optional surrounding blanks,
# including the preceding newline (or the whole remaining string).
_TRAIL_FENCE = f"(^|\\n){_WS}*```{_WS}*$"


def _pystrip(col: Column) -> Column:
    return F.regexp_replace(F.regexp_replace(col, _STRIP_LEAD, ""), _STRIP_TRAIL, "")


def strip_code_fence_py(text: str) -> str:
    """Driver/UDF-side twin of ``strip_code_fence_col`` — same algorithm
    as the reference (strip → drop fence head → drop fence tail)."""
    if text is None:
        return None
    t = text.strip()
    if not t.startswith("```"):
        return t
    lines = t.splitlines()[1:]
    if lines and lines[-1].strip() == "```":
        lines = lines[:-1]
    return "\n".join(lines)


def strip_code_fence_col(text: Column) -> Column:
    stripped = _pystrip(text)
    body = F.regexp_replace(
        F.regexp_replace(stripped, _FIRST_LINE, ""), _TRAIL_FENCE, ""
    )
    return F.when(stripped.startswith("```"), body).otherwise(stripped)


# DuckDB-dialect mirror; {t} is the text expression.
STRIP_FENCE_SQL = (
    "CASE WHEN starts_with(regexp_replace(regexp_replace({t}, '^\\s+', ''), '\\s+$', ''), '```') "
    "THEN regexp_replace(regexp_replace("
    "  regexp_replace(regexp_replace({t}, '^\\s+', ''), '\\s+$', ''), "
    "  '^[^\\n]*(\\n|$)', ''), '(^|\\n)[ \\t\\r\\f\\x0B]*```[ \\t\\r\\f\\x0B]*$', '') "
    "ELSE regexp_replace(regexp_replace({t}, '^\\s+', ''), '\\s+$', '') END"
)


def nfc_normalize_col(text: Column) -> Column:
    """Unicode NFC normalization as an Arrow-batched pandas UDF (Spark
    has no built-in normalizer; per-batch ``unicodedata.normalize`` is
    the vectorized path). The DuckDB oracle's ``nfc_normalize`` and
    Python's ``unicodedata`` both implement the Unicode standard's NFC,
    so outputs agree byte-for-byte."""
    @F.pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(lambda t: None if t is None else unicodedata.normalize("NFC", t))

    return _nfc(text)
