"""Second-stage reranking seam (EXT family — the cross-encoder /
LLM-scorer step production RAG layers over first-stage retrieval).

Same architecture as the LLM-enrichment seam (``operators/ingest.py``
enrich, ``llm.py`` stub): candidates flow through an Arrow-batched
``mapInPandas`` scorer whose stub implementation is sha256-templated —
deterministic, so the whole rerank stage is oracle-checkable — and
whose real implementation is a documented drop-in (batch the
(query, text) pairs into the model, one call per Arrow batch).

Scale notes: reranking only ever touches the candidate POOL (k' rows
per query, k' ≪ corpus), so the expensive scorer runs on thousands of
rows, not billions — the standard two-stage retrieval contract. The
pool rows cross JVM↔Python once per batch (Arrow), never per row.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, StructField, StructType

_HEX8 = float(16**8)


def stub_xenc_score(query: str, doc_key: str, text: str) -> float:
    """Deterministic fake cross-encoder relevance in [0,1): uniform
    from sha256 of (query, doc key, text). Replace with a real model
    call batch-wise; the signature is the seam."""
    digest = hashlib.sha256(f"xenc|{query}|{doc_key}|{text}".encode()).hexdigest()
    return int(digest[:8], 16) / _HEX8


def rerank_stub(candidates: DataFrame, query: str, key_col: str, text_col: str) -> DataFrame:
    """Append a ``xenc_score`` column to a candidate pool via the
    Arrow-batched stub scorer. Output schema = input + xenc_score."""
    fields = list(candidates.schema.fields) + [StructField("xenc_score", DoubleType(), False)]
    out_schema = StructType(fields)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            scores = [
                stub_xenc_score(query, str(k), t)
                for k, t in zip(pdf[key_col], pdf[text_col])
            ]
            pdf = pdf.copy()
            pdf["xenc_score"] = scores
            yield pdf

    return candidates.mapInPandas(run, out_schema)
