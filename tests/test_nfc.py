"""NFC normalization: planted decomposed/composed pairs must flag and
converge — the dedup-prep property (same text, different code points →
identical after NFC)."""

from __future__ import annotations

import unicodedata

import pandas as pd
import pytest

from data_engineering_rag_spark.functions.text import nfc_normalize_col
from data_engineering_rag_spark.plans import REGISTRY

COMPOSED = "café résumé"
DECOMPOSED = unicodedata.normalize("NFD", COMPOSED)


@pytest.fixture(scope="module")
def nfc_dir(tmp_path_factory):
    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [COMPOSED, DECOMPOSED, "plain ascii"],
            "lang": "fr",
            "source": "fixture",
            "n_chars": [len(COMPOSED), len(DECOMPOSED), 11],
        }
    )
    d = tmp_path_factory.mktemp("nfc")
    df.to_parquet(d / "documents.parquet", index=False)
    return str(d)


def test_nfc_flags_and_lengths(spark, nfc_dir):
    out = {r.doc_id: r for r in REGISTRY["normalize_nfc_stats"].spark(spark, nfc_dir).collect()}
    assert out[0].is_nfc and out[2].is_nfc
    assert not out[1].is_nfc
    # decomposed text shrinks to the composed length after NFC
    assert out[1].n_chars == len(DECOMPOSED)
    assert out[1].n_chars_nfc == len(COMPOSED) == out[0].n_chars


def test_nfc_converges_for_dedup(spark):
    df = spark.createDataFrame([(0, COMPOSED), (1, DECOMPOSED)], ["id", "t"])
    vals = {r.id: r.n for r in df.select("id", nfc_normalize_col(df.t).alias("n")).collect()}
    assert vals[0] == vals[1] == COMPOSED


def test_nfc_null_passthrough(spark):
    df = spark.createDataFrame([(0, None)], "id: long, t: string")
    assert df.select(nfc_normalize_col(df.t).alias("n")).collect()[0].n is None
