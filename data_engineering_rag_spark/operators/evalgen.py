"""Eval question generation (SURVEY.md §3.3 stage 1, §2.11 U4;
reference ``zc_agent/eval/generate_questions.py``): sample docs, ask an
LLM for 3 questions each, flatten to (filepath, question) rows.

The UDTF shape (1 doc in → N typed rows out) runs as ``mapInPandas``
with fan-out inside the batch function. The stub generator is
sha256-templated, so the whole stage — including the 'LLM' — is
expressible in oracle SQL and value-checked, like ``ingest_enrich_stub``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StringType, StructField, StructType

QUESTIONS_PER_DOC = 3  # reference: 3 per doc (eval_question_generator.md:10)

QUESTION_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("q_num", LongType(), False),
        StructField("question", StringType(), False),
    ]
)


def stub_question(seed: int, doc_id: int, text: str, q_num: int) -> str:
    digest = hashlib.sha256(f"evalq|{seed}|{doc_id}|{text}|{q_num}".encode()).hexdigest()
    first_tok = text.split()[0] if text.split() else ""
    return f"Q{q_num}: what about {first_tok}? [{digest[:8]}]"


def generate_questions(docs: DataFrame, seed: int = 42) -> DataFrame:
    """(doc_id, text) → 3 question rows per doc via Arrow batches."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "q_num": [], "question": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                for qn in range(1, QUESTIONS_PER_DOC + 1):
                    out["doc_id"].append(doc_id)
                    out["q_num"].append(qn)
                    out["question"].append(stub_question(seed, int(doc_id), text, qn))
            yield pd.DataFrame(out)

    return docs.select("doc_id", "text").mapInPandas(run, QUESTION_SCHEMA)
