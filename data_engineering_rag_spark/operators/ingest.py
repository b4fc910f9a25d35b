"""Ingest pipeline (SURVEY.md §2.1-2.2, §2.11 U1-U3; reference
``zc_agent/prepare_data.py``): raw repo files → filtered → parsed →
(stub-)LLM-enriched corpus.

Record shapes (SURVEY §1.1): the engine-owned columns are a closed
StructType (``filename, content, code``) plus an open
``metadata: map<string,string>`` absorbing arbitrary frontmatter keys —
Catalyst can prune/push the closed columns while the open world stays
queryable via map functions.

Scale design: every stage is a narrow DataFrame transform (no
shuffles anywhere in ingest); the two Python steps (frontmatter parse,
notebook→markdown) are Arrow-batched pandas UDFs, and LLM enrichment
is ``mapInPandas`` with a per-task client — the reference's bounded
async fan-out (``async_paralell.py:5-31``, parallelism 6) becomes
partition-level parallelism, resumable per-partition.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    MapType,
    StringType,
    StructField,
    StructType,
)

from ..functions.paths import (
    CODE_EXTENSIONS,
    DOC_EXTENSIONS,
    extension_of,
    normalize_path,
    should_skip,
)
from ..functions.text import strip_code_fence_py
from ..llm import DeterministicStubLLM


# --------------------------------------------------------------------------
# Frontmatter (U2; reference uses python-frontmatter at prepare_data.py:111-115)
# --------------------------------------------------------------------------

def parse_frontmatter(text: str) -> tuple[dict[str, str], str]:
    """Minimal YAML-frontmatter split: a leading ``---`` block of
    ``key: value`` lines, then the body. Values are kept as strings
    (documented narrowing of full YAML — the engine's metadata column
    is map<string,string>; nested YAML is out of scope)."""
    if text is None:
        return {}, None
    if not text.startswith("---"):
        return {}, text
    lines = text.split("\n")
    if lines[0].strip() != "---":
        return {}, text
    meta: dict[str, str] = {}
    for i in range(1, len(lines)):
        line = lines[i]
        if line.strip() in ("---", "..."):
            body = "\n".join(lines[i + 1 :])
            return meta, body
        if ":" in line:
            k, _, v = line.partition(":")
            meta[k.strip()] = v.strip().strip("'\"")
    return {}, text  # unterminated block → treat as plain body


_FM_SCHEMA = StructType(
    [
        StructField("metadata", MapType(StringType(), StringType()), False),
        StructField("body", StringType(), True),
    ]
)


@F.pandas_udf(_FM_SCHEMA)
def _frontmatter_udf(content: pd.Series) -> pd.DataFrame:
    parsed = [parse_frontmatter(c) for c in content]
    return pd.DataFrame({"metadata": [p[0] for p in parsed], "body": [p[1] for p in parsed]})


# --------------------------------------------------------------------------
# Notebook → markdown (U1; reference uses nbconvert MarkdownExporter with
# ClearOutputPreprocessor, prepare_data.py:131-144). nbconvert is not in
# this container; the converter implements the same publicly-documented
# transformation directly on the nbformat JSON: markdown cells verbatim,
# code cells as fenced blocks, outputs cleared.
# --------------------------------------------------------------------------

def notebook_to_markdown(raw_notebook: str) -> str:
    try:
        nb = json.loads(raw_notebook)
    except (ValueError, TypeError):
        return ""
    lang = (
        nb.get("metadata", {})
        .get("kernelspec", {})
        .get("language", "python")
    )
    parts: list[str] = []
    for cell in nb.get("cells", []):
        src = cell.get("source", [])
        text = "".join(src) if isinstance(src, list) else str(src)
        kind = cell.get("cell_type")
        if kind == "markdown":
            parts.append(text)
        elif kind == "code":
            parts.append(f"```{lang}\n{text}\n```")
        elif kind == "raw":
            parts.append(text)
    return "\n\n".join(parts)


@F.pandas_udf(StringType())
def _notebook_md_udf(raw: pd.Series) -> pd.Series:
    return raw.map(notebook_to_markdown)


# --------------------------------------------------------------------------
# Pipeline stages
# --------------------------------------------------------------------------

def parse_repo_files(files: DataFrame) -> DataFrame:
    """(path, content) → typed corpus records.

    Mirrors ``RepoDataReader`` (skip → normalize → per-extension
    parse): doc files get frontmatter split into ``metadata``; code
    files get ``code=true``. Unsupported extensions are dropped by the
    skip filter, all as Column predicates that push into the scan.
    """
    kept = files.where(~should_skip(F.col("path")))
    typed = kept.select(
        normalize_path(F.col("path")).alias("filename"),
        extension_of(F.col("path")).alias("ext"),
        F.col("content"),
    )
    parsed = typed.withColumn(
        "fm",
        F.when(F.col("ext").isin(list(DOC_EXTENSIONS)), _frontmatter_udf(F.col("content"))),
    )
    return parsed.select(
        "filename",
        "ext",
        F.when(F.col("ext").isin(list(DOC_EXTENSIONS)), F.col("fm.body"))
        .otherwise(F.col("content"))
        .alias("content"),
        F.coalesce(F.col("fm.metadata"), F.create_map().cast("map<string,string>")).alias(
            "metadata"
        ),
        F.col("ext").isin(list(CODE_EXTENSIONS)).alias("code"),
    )


def convert_notebooks(corpus: DataFrame) -> DataFrame:
    """F5 + U1: for code ipynb records, replace JSON with markdown."""
    is_nb = F.col("code") & F.col("filename").endswith(".ipynb")
    return corpus.withColumn(
        "content", F.when(is_nb, _notebook_md_udf(F.col("content"))).otherwise(F.col("content"))
    )


def llm_enrich(
    corpus: DataFrame,
    system_prompt: str,
    only_code: bool = True,
    seed: int = 42,
) -> DataFrame:
    """U3 + F9: per-record LLM rewrite of ``content``; enriched records
    flip ``code`` to false (reference ``prepare_data.py:203-207``).
    Output is fence-stripped (F8) like the reference does.

    mapInPandas: the client is constructed inside the closure (per
    task), prompts batch through Arrow. With a real client this is
    where you'd bound in-flight requests per task.
    """
    schema = corpus.schema

    def enrich(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        client = DeterministicStubLLM(seed=seed)
        for pdf in batches:
            mask = pdf["code"] if only_code else pd.Series(True, index=pdf.index)
            pdf = pdf.copy()
            # Fence-strip only the enriched output, exactly like the
            # reference (strip_code_fence wraps the LLM call, not docs).
            pdf.loc[mask, "content"] = [
                strip_code_fence_py(client.complete(system_prompt, c))
                for c in pdf.loc[mask, "content"]
            ]
            pdf.loc[mask, "code"] = False
            yield pdf

    return corpus.mapInPandas(enrich, schema)


def ingest_pipeline(files: DataFrame, system_prompt: str = "Summarize for retrieval.") -> DataFrame:
    """Full S1→F9 pipeline: parse → notebook-convert → enrich."""
    return llm_enrich(convert_notebooks(parse_repo_files(files)), system_prompt)
