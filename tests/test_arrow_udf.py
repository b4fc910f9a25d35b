"""Spark-4 Arrow-optimized Python UDF surface: `udf(useArrow=True)`
ships batches over Arrow instead of pickled rows. Pin that (a) the
Arrow path produces EXACTLY the built-in-expression result, and (b) it
agrees with the classic pickled UDF — so either spelling can host the
genuinely-Python seams (the multimodal codecs) without a semantics
gap. The hot paths themselves stay on built-in expressions (UDFs are
the slow path; see PERFORMANCE.md)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql.functions import udf
from pyspark.sql.types import LongType


def _vowel_runs(s):
    if s is None:
        return None
    n, inside = 0, False
    for ch in s.lower():
        v = ch in "aeiou"
        if v and not inside:
            n += 1
        inside = v
    return n


def test_arrow_udf_matches_pickled_udf_and_builtin(spark, sf_dir):
    from data_engineering_rag_spark.plans import load

    d = load(spark, sf_dir, "documents").select("doc_id", "text").limit(200)
    arrow_f = udf(_vowel_runs, LongType(), useArrow=True)
    plain_f = udf(_vowel_runs, LongType(), useArrow=False)
    # built-in spelling of the same count: vowel-group starts
    builtin = F.size(
        F.regexp_extract_all(F.lower("text"), F.lit("[aeiou]+"), F.lit(0))
    ).cast("long")
    got = d.select(
        "doc_id",
        arrow_f("text").alias("a"),
        plain_f("text").alias("p"),
        builtin.alias("b"),
    ).collect()
    assert got
    for r in got:
        assert r.a == r.p == r.b, r
