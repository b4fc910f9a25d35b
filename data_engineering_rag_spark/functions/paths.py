"""Path predicates / projections for repo ingest (SURVEY.md §2.2 F1-F3).

Parity targets in the reference:
- extension: lowercased basename, text after the last ``.``, else ``""``
  (``zc_agent/prepare_data.py:90-95``).
- skip rule: directory (trailing ``/``), hidden basename (leading ``.``),
  extension outside the allow-list (``prepare_data.py:71-88``).
- normalization: drop the first path segment —
  ``repo-main/a/b → a/b`` (``prepare_data.py:97-106``).

All pure Column expressions (whole-stage codegen, no Python), with the
same regexes usable verbatim in the DuckDB oracle dialect.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DOC_EXTENSIONS = ("md", "mdx")
CODE_EXTENSIONS = ("py", "sql", "java", "ipynb")
ALL_EXTENSIONS = DOC_EXTENSIONS + CODE_EXTENSIONS

_BASENAME_RE = "([^/]*)$"
_EXT_RE = r"\.([^.]*)$"


def _basename_lower(path: Column) -> Column:
    return F.regexp_extract(F.lower(path), _BASENAME_RE, 1)


def extension_of(path: Column) -> Column:
    """Lowercased extension, '' when the basename has no dot."""
    base = _basename_lower(path)
    return F.when(base.contains("."), F.regexp_extract(base, _EXT_RE, 1)).otherwise(F.lit(""))


def should_skip(path: Column, allowed: tuple[str, ...] = ALL_EXTENSIONS) -> Column:
    lowered = F.lower(path)
    return (
        lowered.endswith("/")
        | _basename_lower(path).startswith(".")
        | ~extension_of(path).isin(list(allowed))
    )


def normalize_path(path: Column) -> Column:
    """Drop the leading path segment (zip top-level directory)."""
    return F.regexp_replace(path, "^[^/]*/", "")


# DuckDB-dialect fragments for the oracle SQL, kept adjacent to the Spark
# expressions they must mirror. {p} is the path column/expression.
SKIP_SQL_SNIPPETS = {
    "basename_lower": "regexp_extract(lower({p}), '([^/]*)$', 1)",
    "extension": (
        "CASE WHEN contains(regexp_extract(lower({p}), '([^/]*)$', 1), '.') "
        "THEN regexp_extract(regexp_extract(lower({p}), '([^/]*)$', 1), '\\.([^.]*)$', 1) "
        "ELSE '' END"
    ),
    "normalize": "regexp_replace({p}, '^[^/]*/', '')",
}
