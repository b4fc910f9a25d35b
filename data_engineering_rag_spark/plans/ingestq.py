"""Ingest-pipeline queries (SURVEY.md §3.1): the reference's
``prepare_data`` flow — skip-filter, frontmatter split, per-extension
typing, stub-LLM enrichment — over a deterministic literal corpus, with
DuckDB oracles that recompute each step in SQL (including the stub's
sha256-derived output, so even the 'LLM' stage is hash-checked).

The notebook branch (U1) is Python-shaped (JSON walk) → rows-only +
pytest goldens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.ingest import (
    convert_notebooks,
    ingest_pipeline,
    llm_enrich,
    parse_repo_files,
)
from ..sources.repo import FILE_SCHEMA
from . import query

SYSTEM_PROMPT = "Summarize for retrieval."

# FIXTURES.md B1-style corpus: every branch of the skip/parse logic.
REPO_FILES: list[tuple[str, str]] = [
    ("repo-main/README.md", "---\ntitle: Zoomcamp\nauthor: team\n---\n# Welcome\nIntro text."),
    ("repo-main/docs/plain.md", "# No frontmatter\nJust body."),
    ("repo-main/docs/guide.mdx", "---\ntitle: Guide\n---\nMDX body here."),
    ("repo-main/src/app.py", "print('hello world')\n"),
    ("repo-main/src/query.sql", "SELECT 1;\n"),
    ("repo-main/src/Main.java", "class Main {}\n"),
    (
        "repo-main/notebooks/demo.ipynb",
        '{"cells": [{"cell_type": "markdown", "source": ["# Demo"]}, '
        '{"cell_type": "code", "source": ["x = 1\\n", "print(x)"], "outputs": [{"text": "1"}]}], '
        '"metadata": {"kernelspec": {"language": "python"}}, "nbformat": 4}',
    ),
    ("repo-main/.github/ci.yml", "name: ci"),
    ("repo-main/src/.hidden.py", "secret"),
    ("repo-main/assets/logo.png", "\x89PNG"),
    ("repo-main/docs/", ""),
    ("repo-main/Makefile", "all:"),
]


def _files_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(REPO_FILES, FILE_SCHEMA)


def _values_sql() -> str:
    def esc(s: str) -> str:
        return s.replace("'", "''").replace("\n", "' || chr(10) || '")

    return ", ".join(f"('{esc(p)}', '{esc(c)}')" for p, c in REPO_FILES)


# Shared DuckDB fragments mirroring functions.paths / operators.ingest.
_EXT = (
    "CASE WHEN contains(regexp_extract(lower(path), '([^/]*)$', 1), '.') "
    "THEN regexp_extract(regexp_extract(lower(path), '([^/]*)$', 1), '\\.([^.]*)$', 1) ELSE '' END"
)
_KEEP = (
    "NOT (ends_with(lower(path), '/') "
    "OR starts_with(regexp_extract(lower(path), '([^/]*)$', 1), '.') "
    f"OR NOT ({_EXT} IN ('md','mdx','py','sql','java','ipynb')))"
)
_FM_BLOCK = "regexp_extract(content, '(?s)^---\\n(.*?)\\n---', 1)"
_BODY = (
    "CASE WHEN starts_with(content, '---' || chr(10)) "
    "THEN regexp_replace(content, '(?s)^---\\n.*?\\n---\\n?', '') ELSE content END"
)


@query(
    "ingest_parse_corpus",
    f"""
    WITH files AS (SELECT * FROM (VALUES {_values_sql()}) AS t(path, content)),
    kept AS (SELECT * FROM files WHERE {_KEEP})
    SELECT regexp_replace(path, '^[^/]*/', '') AS filename,
           {_EXT} AS ext,
           {_EXT} IN ('py','sql','java','ipynb') AS code,
           CASE WHEN {_EXT} IN ('md','mdx') THEN {_BODY} ELSE content END AS content,
           CASE WHEN {_EXT} IN ('md','mdx')
                THEN regexp_extract({_FM_BLOCK}, 'title: *([^\\n]*)', 1) ELSE '' END AS title,
           CASE WHEN {_EXT} IN ('md','mdx')
                THEN cast(len(list_filter(string_split({_FM_BLOCK}, chr(10)), l -> contains(l, ':'))) as bigint)
                ELSE 0 END AS n_meta
    FROM kept
    """,
)
def ingest_parse_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-F4: skip-filter + normalize + frontmatter/typed parse. The
    oracle recomputes the frontmatter split with regexes — valid for
    this corpus's simple ``key: value`` blocks."""
    corpus = parse_repo_files(_files_df(spark))
    return corpus.select(
        "filename",
        "ext",
        "code",
        "content",
        F.coalesce(F.element_at(F.col("metadata"), "title"), F.lit("")).alias("title"),
        F.size("metadata").cast("long").alias("n_meta"),
    )


_STUB_DIGEST = f"sha256('42|{SYSTEM_PROMPT}|' || content)"
_HEADLINE = (
    "substr(regexp_extract(regexp_replace(content, '^\\s+', ''), '^[^\\n]*'), 1, 60)"
)


@query(
    "ingest_enrich_stub",
    f"""
    WITH files AS (SELECT * FROM (VALUES {_values_sql()}) AS t(path, content)),
    kept AS (SELECT * FROM files WHERE {_KEEP} AND {_EXT} IN ('py','sql','java'))
    SELECT regexp_replace(path, '^[^/]*/', '') AS filename,
           false AS code,
           '# Summary ' || substr({_STUB_DIGEST}, 1, 12) || chr(10) || chr(10)
             || 'Derived from: ' || {_HEADLINE} || chr(10)
             || 'Checksum: ' || {_STUB_DIGEST} AS content
    FROM kept
    """,
)
def ingest_enrich_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3+F9+F8 on the non-notebook code files: the deterministic stub
    'LLM' rewrite, fence-stripped — the oracle recomputes the sha256-
    templated output, so the whole enrichment stage is value-checked."""
    files = _files_df(spark).where(~F.col("path").endswith(".ipynb"))
    corpus = parse_repo_files(files).where(F.col("code"))
    enriched = llm_enrich(corpus, SYSTEM_PROMPT)
    return enriched.select("filename", "code", "content")


@query("ingest_notebook_markdown", None)
def ingest_notebook_markdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: nbformat-JSON → markdown (rows-only; exact output pinned by
    tests/test_ingest.py goldens)."""
    corpus = convert_notebooks(parse_repo_files(_files_df(spark)))
    return corpus.where(F.col("filename").endswith(".ipynb")).select("filename", "content")


@query("ingest_full_pipeline", None)
def ingest_full_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1→F9 end-to-end including notebooks (rows-only smoke; stages
    individually oracle-checked above)."""
    return ingest_pipeline(_files_df(spark), SYSTEM_PROMPT)
