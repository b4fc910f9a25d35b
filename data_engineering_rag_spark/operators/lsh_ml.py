"""Spark ML LSH fast path (SURVEY.md §2.4 X5 scale column):
``pyspark.ml.feature.MinHashLSH`` over token-set binary vectors with
``approxSimilarityJoin`` — the library implementation of the same
banding idea as ``plans/textops.py``'s hand-rolled MinHash+LSH.

The ML path uses library RNG for its hash coefficients (seeded, but
not reproducible in DuckDB), so the CANDIDATE SET is not
oracle-checkable. The VERIFIED OUTPUT is: ``approxSimilarityJoin``
filters candidates by their EXACT Jaccard distance, so its output is
a subset of the brute-force τ-filtered pairs, with equality iff no
qualifying pair was missed by every hash table. With L hash tables
(OR-amplification) a pair at similarity s is missed with probability
(1−s)^L — ≤ 2·10⁻¹⁰ for s ≥ 0.5 at L=32 — and the seed makes the run
deterministic, so brute-force oracle equality doubles as a recorded
recall=1 proof on the tested data (the same losslessness-proof
pattern as ``jaccard_prefix_filter_pairs``). The recall test in
``tests/test_lsh_ml.py`` pins the contract independently.

OR-amplification cuts the other way on candidate VOLUME: with no
banded AND-step, every pair collides per table with probability equal
to its Jaccard, so a corpus with high ambient similarity makes the
self-join quadratic in practice (see ``ml_minhash_candidates``'s
``probe_ids`` parameter for the linear probe-batch shape).
"""

from __future__ import annotations

from pyspark.ml.feature import CountVectorizer, MinHashLSH, RegexTokenizer
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .tfidf import TOKEN_PATTERN

#: Upper bound on ``probe_ids`` for the probe-batch path: the probe
#: side is force-broadcast (its LSH-exploded size is |probes|·L
#: entries, each carrying the sparse vector), so the batch must stay
#: small enough that the broadcast is trivially cheap on any executor.
MAX_PROBE_BATCH = 4096

# --------------------------------------------------------------------------
# Fitted-model memo (r15, VERDICT item 5 — the SPARK_GRAFT_TFIDF_REUSE
# pattern from plans/rag.py extended to the ML LSH estimators): the
# CountVectorizer + MinHashLSH fits dominate ml_minhash_similarity_join's
# wall and are re-paid on every bench/soak invocation even though the
# fitted models are deterministic in (corpus, params, seed). With
# SPARK_GRAFT_TFIDF_REUSE=1 (the process-wide reuse switch the soak
# already sets; default OFF → byte-identical plans to before) a caller
# that supplies ``memo_key`` — an explicit identity for ``docs`` it
# guarantees, e.g. ("documents", sf_dir) — gets the fitted (vecs, lsh)
# pair back from the memo on repeat calls, with ``vecs`` persisted.
# Correctness is untouched: the fits are seeded and the memo key pins
# the exact (session, corpus, params) identity, unit-pinned equal in
# tests/test_lsh_ml.py.
# --------------------------------------------------------------------------

_ML_LSH_MEMO: dict = {}

# Flag check + eviction rule shared with the TF-IDF memo (r15 review:
# one definition, no drift between the two memos).
from .memo import reuse_enabled as _reuse_enabled  # noqa: E402


def clear_ml_lsh_memo() -> None:
    """Unpersist every memoized vector table and empty the memo — the
    sibling of ``plans/rag.py::clear_tfidf_memo`` for session/sf_dir
    changes in long-lived processes."""
    for vecs, _lsh in _ML_LSH_MEMO.values():
        try:
            vecs.unpersist()
        except Exception:
            pass  # a stopped SparkSession makes unpersist moot
    _ML_LSH_MEMO.clear()


def _fitted_vecs_and_lsh(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    num_hash_tables: int,
    seed: int,
    vocab_size: int,
    memo_key,
):
    """tokenize → fit CountVectorizer → transform → fit MinHashLSH,
    memoized under the reuse flag when ``memo_key`` identifies the
    corpus. Returns ``(vecs, lsh_model)``."""
    key = None
    if memo_key is not None and _reuse_enabled():
        key = (
            docs.sparkSession, memo_key, id_col, text_col,
            num_hash_tables, seed, vocab_size,
        )
        if key in _ML_LSH_MEMO:
            return _ML_LSH_MEMO[key]
    # r16 OPTIMIZATION: (a) guard the corpus scan — a single-file input
    # gives the tokenizer+CountVectorizer fit/transform ONE partition,
    # serializing the whole vectorize pipeline to one core; (b)
    # materialize the vector table once — it feeds the CV fit pass,
    # the LSH fit, and BOTH approxSimilarityJoin sides, each of which
    # re-ran tokenize+transform from the scan. The checkpoint carries
    # only (id, sparse vector). Identity on multi-file inputs; exact-
    # distance verification makes the output independent of the
    # vectorizer's internal vocab tie-order either way (re-verified
    # against the brute-force oracle at sf0.001/0.01/0.1 this round).
    from .scale import durable_checkpoint, ensure_scan_parallelism

    docs = ensure_scan_parallelism(docs, label="ml lsh corpus scan")
    tok = RegexTokenizer(
        inputCol=text_col, outputCol="_tokens", pattern=TOKEN_PATTERN, gaps=False,
        toLowercase=True, minTokenLength=2,
    )
    tokens = tok.transform(docs).where(F.size("_tokens") > 0)
    cv = CountVectorizer(
        inputCol="_tokens", outputCol="_vec", binary=True, minDF=1.0,
        vocabSize=vocab_size,
    )
    model_cv = cv.fit(tokens)
    vecs = durable_checkpoint(model_cv.transform(tokens).select(id_col, "_vec"))
    if key is not None:
        vecs = vecs.persist()
    lsh = MinHashLSH(
        inputCol="_vec", outputCol="_hashes",
        numHashTables=num_hash_tables, seed=seed,
    )
    model = lsh.fit(vecs)
    if key is not None:
        # exclusive_scope: each entry pins its own persisted vector
        # table, so a same-corpus param sweep must SUPERSEDE (and
        # unpersist) the prior entry, not accumulate one persisted
        # copy per param combination (r15 review); other (session,
        # corpus) scopes are evicted as in the rag.py memo.
        from .memo import scoped_put

        scoped_put(
            _ML_LSH_MEMO, key, (vecs, model),
            lambda v: v[0].unpersist(), exclusive_scope=True,
        )
    return vecs, model


def ml_minhash_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hash_tables: int = 8,
    jaccard_threshold: float = 0.5,
    seed: int = 42,
    vocab_size: int = 1 << 20,
    probe_ids: list[int] | None = None,
    memo_key=None,
) -> DataFrame:
    """Similar pairs with Jaccard distance below ``1 - jaccard_threshold``
    per the ML estimator.

    ``probe_ids=None`` → corpus self-join, emitting ``(id_a, id_b,
    jaccard_dist)`` with ``id_a < id_b``. **Self-join is only safe on
    corpora with LOW ambient token overlap**: ``MinHashLSH`` tables are
    single hash functions, so ``approxSimilarityJoin`` OR-amplifies
    with per-table collision probability = the pair's Jaccard — there
    is no banded AND-step to crush background collisions (that is the
    hand-rolled path's job, ``plans/textops.py``). On a corpus whose
    MEAN pairwise Jaccard is high, candidates grow ~ L·s̄·n²/2
    (measured: the synthetic documents table has mean unigram Jaccard
    ≈ 0.61, which at n=50k, L=32 is ~24e9 candidate rows — a
    non-starter).

    ``probe_ids=[...]`` → probe-batch lookup, the scale-sane ML usage:
    join a FIXED handful of probe docs against the whole corpus,
    emitting ``(probe_id, doc_id, jaccard_dist)`` (both directions when
    two probes qualify against each other, never self-pairs).
    Candidates are then ≤ L·s̄·n·|probes| — linear in the corpus.

    ``vocab_size`` raises CountVectorizer's default 2¹⁸ cap: a silently
    truncated vocabulary would drop rare tokens from the binary
    vectors and skew every Jaccard distance.

    ``memo_key`` (optional): an identity for ``docs`` the CALLER
    guarantees (e.g. ``("documents", sf_dir)``). When set and the
    process-wide reuse flag is on (``SPARK_GRAFT_TFIDF_REUSE=1``),
    the fitted CountVectorizer+MinHashLSH pair and the persisted
    vector table are reused across calls — the fits dominate this
    function's wall in bench/soak loops. Default ``None`` → no
    memoization, identical behavior to before."""
    vecs, model = _fitted_vecs_and_lsh(
        docs, id_col, text_col, num_hash_tables, seed, vocab_size, memo_key
    )
    if probe_ids is None:
        joined = model.approxSimilarityJoin(
            vecs, vecs, 1.0 - jaccard_threshold, distCol="jaccard_dist"
        )
        return (
            joined.where(F.col(f"datasetA.{id_col}") < F.col(f"datasetB.{id_col}"))
            .select(
                F.col(f"datasetA.{id_col}").alias("id_a"),
                F.col(f"datasetB.{id_col}").alias("id_b"),
                F.round("jaccard_dist", 8).alias("jaccard_dist"),
            )
        )
    # Broadcast-hint the PROBE side: approxSimilarityJoin's internal
    # (entry, hashValue) equi-join has no reliable size estimate for
    # the ML-transformed sides, and Spark picked BuildRight — i.e. it
    # built and broadcast the EXPLODED CORPUS (n·L hash entries, each
    # row carrying the full sparse vector), which OOMs the driver at
    # ~30x the bench scale. The hint survives the estimator's internal
    # transforms (EliminateResolvedHint pulls it up to the join), so
    # the build side becomes the |probes|·L entry block — constant.
    # The forced broadcast scales with |probes|·L, so bound the probe
    # count: beyond a few thousand ids the "small fixed probe batch"
    # premise is gone and the caller should shard or use the all-pairs
    # path instead of silently shipping an oversized broadcast.
    if len(probe_ids) > MAX_PROBE_BATCH:
        raise ValueError(
            f"probe batch of {len(probe_ids)} exceeds MAX_PROBE_BATCH="
            f"{MAX_PROBE_BATCH}; the forced probe-side broadcast is only "
            "safe for small fixed probe batches — shard the probes or "
            "use the all-pairs path (probe_ids=None)"
        )
    probes = F.broadcast(vecs.where(F.col(id_col).isin([int(p) for p in probe_ids])))
    joined = model.approxSimilarityJoin(
        probes, vecs, 1.0 - jaccard_threshold, distCol="jaccard_dist"
    )
    return (
        joined.where(F.col(f"datasetA.{id_col}") != F.col(f"datasetB.{id_col}"))
        .select(
            F.col(f"datasetA.{id_col}").alias("probe_id"),
            F.col(f"datasetB.{id_col}").alias("doc_id"),
            F.round("jaccard_dist", 8).alias("jaccard_dist"),
        )
    )
