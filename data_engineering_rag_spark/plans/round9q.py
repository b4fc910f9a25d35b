"""Round-9 additions (VERDICT r8 item 8): the two named family-closing
queries — a driver-checkable query through the Spark ML ``MinHashLSH``
path (so the library LSH earns oracle evidence like the hand-rolled SQL
path did), and the ``foreachBatch`` streaming twin of the IVM aggregate
merge (closing the incremental-view-maintenance loop).

Both carry real DuckDB oracles: the ML join's brute-force oracle
equality is a recorded recall=1 proof (see ``operators/lsh_ml.py``);
the streaming twin's from-scratch oracle equality proves the
merge ≡ recompute invariant across arbitrary micro-batch splits.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.lsh_ml import ml_minhash_candidates
from ..operators.tfidf import TOKEN_PATTERN
from ..streaming.events import ivm_cdc_stream_merge
from . import load, query
from .round8q import IVM_DELETE_MOD, IVM_SPLIT_DAY

#: ML LSH query knobs: τ(Jaccard)=0.5 → distance filter < 0.5; 32 hash
#: tables puts the per-qualifying-pair miss probability at
#: (1-s)^32 ≤ 2.4e-10 for s ≥ 0.5, which is what lets the brute-force
#: oracle equality double as a recall proof. The query probes a FIXED
#: handful of doc_ids against the whole corpus instead of self-joining:
#: ML MinHashLSH tables are single hash functions (OR-amplification
#: only, no banded AND-step), so self-join candidates grow with
#: L·s̄·n²/2 — measured mean unigram Jaccard on `documents` is ≈0.61,
#: which at sf1 is ~24e9 candidate rows. Probe ids exist at every SF
#: (doc_id 0–499 present from sf0.001 up).
ML_LSH_TABLES = 32
ML_LSH_JACCARD = 0.5
ML_LSH_PROBE_IDS = (3, 41, 97, 202, 458)


@query(
    "ml_minhash_similarity_join",
    f"""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_distinct(regexp_extract_all(lower(text), '{TOKEN_PATTERN}'))) AS term
      FROM documents),
    sizes AS (SELECT doc_id, cast(count(*) as bigint) AS sz FROM tok GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS probe_id, b.doc_id AS doc_id, cast(count(*) as bigint) AS i
      FROM tok a JOIN tok b ON a.term = b.term AND a.doc_id <> b.doc_id
      WHERE a.doc_id IN {ML_LSH_PROBE_IDS}
      GROUP BY 1, 2),
    pairs AS (
      SELECT inter.probe_id, inter.doc_id,
             1.0 - (i / cast(sa.sz + sb.sz - i as double)) AS d
      FROM inter
        JOIN sizes sa ON inter.probe_id = sa.doc_id
        JOIN sizes sb ON inter.doc_id = sb.doc_id)
    SELECT probe_id, doc_id, round(d, 8) AS jaccard_dist
    FROM pairs WHERE d < {1.0 - ML_LSH_JACCARD}
    ORDER BY probe_id, doc_id
    """,
)
def ml_minhash_similarity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark ML ``MinHashLSH.approxSimilarityJoin`` over binary
    token-set vectors (SURVEY.md §2.4 X5 — the LIBRARY implementation
    of the minhash idea `plans/textops.py` hand-rolls in SQL; reference
    semantics: minsearch-style near-dup lookup, cf.
    ``zc_agent/prepare_data.py``'s dedup intent): for a fixed batch of
    probe documents, every corpus doc at Jaccard ≥ {ML_LSH_JACCARD},
    found via {ML_LSH_TABLES} seeded min-hash tables (OR-amplified
    candidate join) and verified with the EXACT Jaccard distance.

    Probe-batch (not self-join) is deliberate: ML ``MinHashLSH`` has no
    banded AND-amplification, so on this corpus (mean pairwise unigram
    Jaccard ≈ 0.61) a self-join's candidate set AND its τ=0.5 output
    are both Θ(n²) — the full-corpus near-dup job belongs to the banded
    SQL path (`plans/textops.py:383`) or the lossless prefix filter
    (`plans/round8q.py`). Probe lookup bounds candidates at
    L·s̄·n·|probes| — linear in the corpus.

    The oracle brute-forces the same τ-filtered pairs from distinct
    tokens; because ``approxSimilarityJoin`` verifies candidates with
    the exact distance, Spark's output ⊆ oracle, and hash EQUALITY is
    a recorded recall=1 proof for the seeded run (miss probability
    ≤ 2.4e-10 per qualifying pair — the probabilistic sibling of
    ``jaccard_prefix_filter_pairs``' guaranteed-lossless prefix
    filter). Scale shape: candidate generation is an equi-join on
    (table-idx, hash) exploded entries with a 5-row probe side —
    never all-pairs; the exact-distance verification touches
    candidates only."""
    docs = load(spark, sf_dir, "documents")
    pairs = ml_minhash_candidates(
        docs,
        id_col="doc_id",
        text_col="text",
        num_hash_tables=ML_LSH_TABLES,
        jaccard_threshold=ML_LSH_JACCARD,
        seed=42,
        probe_ids=list(ML_LSH_PROBE_IDS),
    )
    return pairs.select(
        F.col("probe_id").cast("long").alias("probe_id"),
        F.col("doc_id").cast("long").alias("doc_id"),
        "jaccard_dist",
    ).orderBy("probe_id", "doc_id")


@query(
    "stream_ivm_agg_merge",
    f"""
    WITH bounds AS (SELECT min(cast(ts as date)) AS d0 FROM events),
    tagged AS (
      SELECT event_type, value,
             datediff('day', b.d0, cast(ts as date)) < {IVM_SPLIT_DAY} AS is_base,
             event_id % {IVM_DELETE_MOD} = 0 AS is_del
      FROM events CROSS JOIN bounds b
      WHERE value IS NOT NULL),
    -- from-scratch recompute over base \\ deletes + inserts: equality
    -- with the streamed merge IS the IVM invariant
    effective AS (
      SELECT event_type, value FROM tagged
      WHERE (is_base AND NOT is_del) OR NOT is_base)
    SELECT event_type,
           cast(count(*) as bigint) AS n_events,
           round(cast(sum(cast(value as decimal(18,6))) as double), 6)
             AS total_value
    FROM effective GROUP BY event_type ORDER BY event_type
    """,
)
def stream_ivm_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING IVM twin of ``ivm_agg_delta_merge`` (§2.10 meets
    §2.12): the event stream is consumed once via ``foreachBatch``,
    each micro-batch folds to per-type (±count, ±decimal-sum) partials
    appended to a parquet state table, and the served view is the tiny
    merge of the partials. Abelian-group partials ⇒ the merged view is
    invariant to the micro-batch split, which the from-scratch DuckDB
    oracle proves cross-engine (full mechanics + scale notes:
    ``streaming/events.py:ivm_cdc_stream_merge``)."""
    state_dir = tempfile.mkdtemp(prefix="ivm_stream_state_")
    return ivm_cdc_stream_merge(
        spark,
        sf_dir,
        state_dir + "/state",
        split_day=IVM_SPLIT_DAY,
        delete_mod=IVM_DELETE_MOD,
    )
