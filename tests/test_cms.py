"""Count-min sketch guarantees vs exact counts: (a) every estimate is
an OVERestimate (deterministic CMS property — cells only gain mass from
collisions), (b) the sketch's top-20 recalls the exact top-5 heavy
hitters, (c) estimates are within the eps*N bound for the sketch width."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_rag_spark.plans import REGISTRY, load
from data_engineering_rag_spark.plans.textops import CMS_WIDTH, TOKEN_PATTERN


def test_cms_overestimates_and_recalls(spark, sf_dir):
    exact = {
        r.term: r.n
        for r in load(spark, sf_dir, "documents")
        .select(
            F.explode(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_PATTERN), F.lit(0))
            ).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    total = sum(exact.values())
    out = REGISTRY["approx_top_terms_cms"].spark(spark, sf_dir).collect()
    assert len(out) == 20
    for r in out:
        assert r.est >= exact[r.term], (r.term, r.est, exact[r.term])
        # collisions add at most ~2*N/width with overwhelming probability
        # at depth 4; use a loose deterministic-enough bound
        assert r.est - exact[r.term] <= max(4 * total // CMS_WIDTH, 8), (
            r.term, r.est, exact[r.term], total,
        )
    top5_exact = [t for t, _ in sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:5]]
    got_terms = {r.term for r in out}
    assert set(top5_exact) <= got_terms, (top5_exact, got_terms)
