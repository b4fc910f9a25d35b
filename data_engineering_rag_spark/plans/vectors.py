"""Embedding similarity search (SURVEY.md §2.4 X4, north-star EXT).

Brute-force cosine top-k is the exact baseline; the LSH/IVF bucketed
variant (round-2) reuses the same scoring kernel over a pruned
candidate set. Dot products run as ``zip_with``+``aggregate`` folds —
JVM-side higher-order functions, no Python in the loop; both engines
fold left-to-right over the array so the doubles agree bit-for-bit.

Scale: brute force is O(|Q|·|N|·d) — fine for |Q| small (broadcast the
queries, map over the corpus, per-partition top-k then global top-k).
For |Q|~|N| at 100 TB, the LSH path bounds candidates per query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import load, query

ANN_K = 10
N_QUERIES = 5  # vec_id < 5 are the query vectors


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def l2_norm_sq(a: Column) -> Column:
    return F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)


@query(
    "vector_norms",
    """
    SELECT vec_id, label,
           cast(len(embedding) as bigint) AS dim,
           round(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 8) AS l2_norm
    FROM embeddings
    """,
)
def vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    return e.select(
        "vec_id",
        "label",
        F.size("embedding").cast("long").alias("dim"),
        F.round(F.sqrt(l2_norm_sq(v)), 8).alias("l2_norm"),
    )


@query(
    "ann_cosine_topk",
    f"""
    WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < {N_QUERIES}),
    scored AS (
      SELECT q.q_id, e.vec_id,
             round(list_dot_product(qv, e.embedding::DOUBLE[])
                   / (sqrt(list_dot_product(qv, qv))
                      * sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))), 8)
               + 0.0 AS cosine
      FROM q, embeddings e WHERE e.vec_id <> q.q_id
    ),
    ranked AS (
      SELECT q_id, vec_id, cosine,
             row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rn
      FROM scored)
    SELECT q_id, vec_id, cosine, cast(rn as bigint) AS rn FROM ranked WHERE rn <= {ANN_K}
    """,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ANN baseline: broadcast the query block, one pass over the
    corpus, per-query top-k via window on the ROUNDED cosine (so float
    drift can't flip ranks between engines; vec_id breaks ties)."""
    e = load(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").cast("array<double>").alias("qv")
    )
    # r16 OPTIMIZATION: the broadcast-scored pass evaluates |queries|
    # 64-dim dots per corpus row — heavy per-row compute that a
    # single-file scan serializes to one core (measured 1.12 s -> 0.57 s
    # at sf0.1 with the guard). Identity on multi-file inputs.
    from ..operators.scale import ensure_scan_parallelism

    cand = ensure_scan_parallelism(
        e.select("vec_id", F.col("embedding").cast("array<double>").alias("ev")),
        label="ann_cosine_topk embeddings scan",
    )
    # +0.0 collapses IEEE -0.0 to 0.0 so both engines hash identically.
    cos = F.round(
        dot(F.col("qv"), F.col("ev"))
        / (F.sqrt(l2_norm_sq(F.col("qv"))) * F.sqrt(l2_norm_sq(F.col("ev")))),
        8,
    ) + F.lit(0.0)
    scored = (
        cand.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= ANN_K)
        .select("q_id", "vec_id", "cosine", F.col("rn").cast("long").alias("rn"))
    )


@query(
    "label_centroids",
    """
    SELECT label, cast(pos as bigint) AS pos,
           round(cast(sum(cast(cast(embedding[cast(pos as int)] as double) as decimal(18,9))) as double)
                 / count(*), 8) + 0.0 AS centroid
    FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(pos)
    GROUP BY label, pos
    """,
)
def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid, element-wise. posexplode → groupBy(label,pos)
    is the scalable layout (no giant array agg); decimal accumulation
    keeps the mean engine-exact. 1-based pos matches DuckDB indexing."""
    e = load(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.posexplode(F.col("embedding").cast("array<double>")))
        .select("label", (F.col("pos") + 1).cast("long").alias("pos"), F.col("col").alias("x"))
        .groupBy("label", "pos")
        .agg(
            (
                F.round(
                    F.sum(F.col("x").cast("decimal(18,9)")).cast("double") / F.count(F.lit(1)), 8
                )
                + F.lit(0.0)
            ).alias("centroid")
        )
    )


def _centroid_cte() -> str:
    """Shared CTE: per-label centroids, rounded identically to
    ``label_centroids`` so both engines quantize from the same values."""
    return f"""
    cents AS (
      SELECT label, cast(pos as bigint) AS pos,
             round(cast(sum(cast(cast(embedding[cast(pos as int)] as double) as decimal(18,9))) as double)
                   / count(*), 8) + 0.0 AS c
      FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(pos)
      GROUP BY label, pos
    )"""


@query(
    "ivf_ann_topk",
    f"""
    WITH {_centroid_cte()},
    qpos AS (
      SELECT vec_id AS q_id, cast(pos as bigint) AS pos,
             cast(embedding[cast(pos as int)] as double) AS x
      FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(pos)
      WHERE vec_id < {N_QUERIES}
    ),
    qc AS (
      SELECT q_id, label,
             round(sum(x * c) / (sqrt(sum(x * x)) * sqrt(sum(c * c))), 8) AS ccos
      FROM qpos JOIN cents USING (pos)
      GROUP BY q_id, label
    ),
    best AS (
      SELECT q_id, label FROM (
        SELECT q_id, label,
               row_number() OVER (PARTITION BY q_id ORDER BY ccos DESC, label) AS rn
        FROM qc) WHERE rn = 1
    ),
    q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < {N_QUERIES}),
    scored AS (
      SELECT b.q_id, b.label AS probe_label, e.vec_id,
             round(list_dot_product(qv, e.embedding::DOUBLE[])
                   / (sqrt(list_dot_product(qv, qv))
                      * sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))), 8)
               + 0.0 AS cosine
      FROM best b JOIN q ON b.q_id = q.q_id
      JOIN embeddings e ON e.label = b.label AND e.vec_id <> b.q_id
    )
    SELECT q_id, probe_label, vec_id, cosine, cast(rn as bigint) AS rn FROM (
      SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rn
      FROM scored) WHERE rn <= {ANN_K}
    """,
)
def ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 scale path — IVF-style coarse quantization: per-label
    centroids are the codebook; a query probes only its nearest
    centroid's bucket, cutting the scan from |N| to |N|/|labels| per
    query (nprobe=1). The codebook is tiny → broadcast; the bucket scan
    is an equi-join on label — at 100 TB the corpus would be
    partitioned BY label so the probe prunes partitions at the source.
    """
    e = load(spark, sf_dir, "embeddings")
    ev = e.select("vec_id", "label", F.col("embedding").cast("array<double>").alias("v"))

    cents = (
        ev.select("label", F.posexplode("v"))
        .select("label", (F.col("pos") + 1).cast("long").alias("pos"), F.col("col").alias("x"))
        .groupBy("label", "pos")
        .agg(
            (
                F.round(
                    F.sum(F.col("x").cast("decimal(18,9)")).cast("double") / F.count(F.lit(1)), 8
                )
                + F.lit(0.0)
            ).alias("c")
        )
    )
    qpos = (
        ev.where(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("q_id"), F.posexplode("v"))
        .select("q_id", (F.col("pos") + 1).cast("long").alias("pos"), F.col("col").alias("x"))
    )
    qc = (
        qpos.join(cents, "pos")
        .groupBy("q_id", "label")
        .agg(
            F.round(
                F.sum(F.col("x") * F.col("c"))
                / (
                    F.sqrt(F.sum(F.col("x") * F.col("x")))
                    * F.sqrt(F.sum(F.col("c") * F.col("c")))
                ),
                8,
            ).alias("ccos")
        )
    )
    wq = Window.partitionBy("q_id").orderBy(F.col("ccos").desc(), F.col("label"))
    best = (
        qc.withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") == 1)
        .select("q_id", F.col("label").alias("probe_label"))
    )

    q = ev.where(F.col("vec_id") < N_QUERIES).select(F.col("vec_id").alias("q_id"), F.col("v").alias("qv"))
    cand = ev.select("vec_id", "label", F.col("v").alias("cv"))
    cos = F.round(
        dot(F.col("qv"), F.col("cv"))
        / (F.sqrt(l2_norm_sq(F.col("qv"))) * F.sqrt(l2_norm_sq(F.col("cv")))),
        8,
    ) + F.lit(0.0)
    scored = (
        F.broadcast(best.join(q, "q_id"))
        .join(
            cand,
            (cand.label == F.col("probe_label")) & (cand.vec_id != F.col("q_id")),
        )
        .select("q_id", "probe_label", "vec_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= ANN_K)
        .select("q_id", "probe_label", "vec_id", "cosine", F.col("rn").cast("long").alias("rn"))
    )


NEAR_DUP_COS = 0.40  # synthetic vectors are near-orthogonal: the max
# pairwise cosine at sf0.01 is 0.513, so the previous 0.62 cut returned
# ZERO pairs at every SF (vacuous 0=0 oracle matches — round-7 signal
# audit). 0.40 yields a small non-empty pair set at sf0.001/0.01/0.1
# (24/19/24 sampled pairs; 5/5/86 within-bucket) so the check has teeth.
NEAR_DUP_SAMPLE = 300  # all-pairs ground truth is bounded BY CONSTRUCTION
# to vec_id < this (≤ 300² / 2 pairs at any SF) — the unbounded pair set
# comes from the bucketed path below, never from a full cross join.
SMJ_GROUP_ROWS = 4096  # spark.sql.sortMergeJoinExec.buffer.in.memory.
# threshold default: a buffered SMJ key group larger than this leaves
# the in-memory array and every left row re-scans it (the r13 cliff).
IVF_SELF_JOIN_SALT_CAP = 64  # upper bound on per-bucket sub-blocks: the
# A/B-side row replication factor is ~(S+1)/2, so an uncapped S from a
# degenerate giant bucket would trade the SMJ cliff for an explode
# blow-up. With the 2048-row group target the cap binds above ~131k
# rows (64 x 2048); groups stay under the 4096-row SMJ cliff up to
# ~262k rows (64 x 4096) — past that the IVF itself is mis-sized.
# Measured (r15, scripts/probe_salt_cap.py): at the cap (131k-row
# bucket, S=64) per-pair cost is FLAT vs small-S buckets (286 vs
# 372 ns/pair), and past-cap group growth is a slope, not a second
# cliff (+36%/pair at 5k-row groups, +103% at 10k) — see
# PERFORMANCE.md r15. Runtime signal (r16): ivf_bucket_stats emits a
# past_salt_cap diagnostics row when a bucket crosses CAP x TARGET
# (IVF_BUCKET_PAST_CAP_ROWS below) — the docs' "IVF is mis-sized"
# condition surfaced as data instead of a comment.


IVF_SALT_GROUP_TARGET = SMJ_GROUP_ROWS // 2  # aim salted groups at HALF
# the SMJ in-memory threshold: S = ceil(n/4096) lands groups right AT
# the cliff edge (sf10 A/B: S=5 → ~4000-row groups → 1129-1148 s vs
# S=8 → ~2500-row groups → 884 s), while the /2048 target reproduces
# the under-cliff geometry that measures flat at every probed scale.


def ivf_self_join_salt(bucket_count: Column) -> Column:
    """Per-bucket sub-block count for the salted triangle self-join,
    DERIVED from the bucket's own size (r14, VERDICT): size S so each
    salted SMJ group holds ≈ {IVF_SALT_GROUP_TARGET} rows — half the
    in-memory buffer threshold, measured headroom included — clamped
    to [1, CAP]. Computed as a column so the plan stays lazy: the
    bucket-size aggregate is a tiny (one row per bucket) broadcast,
    not a build-time collect. At the CAP a 262k-row bucket still keeps
    groups under the {SMJ_GROUP_ROWS} cliff; buckets beyond that mean
    the IVF itself is mis-sized (real IVF uses ~√n centroids).

    This is the SELF-join salting idiom (r15, VERDICT item 6): use it
    when a self-join key has low cardinality and the SMJ's buffered
    key groups are the bottleneck. For a TWO-table join with a hot
    key, the problem is task skew, not group buffering — reach for
    ``operators/scale.py::salted_join`` (random salt, fixed fan-out)
    instead; see its docstring for the distinction."""
    return F.least(
        F.greatest(F.ceil(bucket_count / F.lit(IVF_SALT_GROUP_TARGET)), F.lit(1)),
        F.lit(IVF_SELF_JOIN_SALT_CAP),
    ).cast("int")


@query(
    "embedding_near_dup_pairs",
    f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings
               WHERE vec_id < {NEAR_DUP_SAMPLE})
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_dot_product(a.ev, b.ev)
                 / (sqrt(list_dot_product(a.ev, a.ev)) * sqrt(list_dot_product(b.ev, b.ev))), 8)
             + 0.0 AS cosine
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE round(list_dot_product(a.ev, b.ev)
                / (sqrt(list_dot_product(a.ev, a.ev)) * sqrt(list_dot_product(b.ev, b.ev))), 8)
          > {NEAR_DUP_COS}
    """,
)
def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 embedding-cosine near-dup GROUND TRUTH: all pairs above a
    cosine threshold over a bounded sample (vec_id < NEAR_DUP_SAMPLE,
    same pattern as ``jaccard_similarity_sample``). The nested-loop
    join is O(sample²) by construction — it never touches the full
    table. The production path over the full corpus is
    ``embedding_near_dup_via_ivf`` (bucketed equi-join)."""
    e = load(spark, sf_dir, "embeddings").where(F.col("vec_id") < NEAR_DUP_SAMPLE)
    v = e.select("vec_id", F.col("embedding").cast("array<double>").alias("ev"))
    a = v.select(F.col("vec_id").alias("vec_a"), F.col("ev").alias("ea"))
    b = v.select(F.col("vec_id").alias("vec_b"), F.col("ev").alias("eb"))
    cos = F.round(
        dot(F.col("ea"), F.col("eb"))
        / (F.sqrt(l2_norm_sq(F.col("ea"))) * F.sqrt(l2_norm_sq(F.col("eb")))),
        8,
    ) + F.lit(0.0)
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cos.alias("cosine"))
        .where(F.col("cosine") > NEAR_DUP_COS)
    )


@query(
    "embedding_near_dup_via_ivf",
    f"""
    WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS ev,
                      sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
               FROM embeddings)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_dot_product(a.ev, b.ev) / (a.nrm * b.nrm), 8)
             + 0.0 AS cosine
    FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE round(list_dot_product(a.ev, b.ev) / (a.nrm * b.nrm), 8)
          > {NEAR_DUP_COS}
    """,
)
def embedding_near_dup_via_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 production path: the same cosine threshold applied over
    IVF-bucketed candidates — an EQUI-join on the bucket (label), so
    the pair space is Σ|bucket|², never |N|², and the plan is a
    hash/sort-merge join, not a nested loop. At 100 TB the corpus is
    partitioned by bucket and this becomes a co-partitioned self-join.
    Recall semantics: only within-bucket pairs are candidates (standard
    IVF/LSH trade); cross-bucket near-dups need multi-probe or more
    bands, exactly as in ``minhash_lsh_candidate_pairs``.

    PRECONDITION the Σ|bucket|² argument rests on: bucket CARDINALITY
    must grow with the corpus (real IVF uses ~√n centroids, keeping
    |bucket| ≈ √n and the pair space ≈ n). The synthetic ``label``
    column is a FIXED 10-way stand-in, so on the key-offset scale
    harness this query's cost — and its true answer, since replica
    embeddings are mutual near-dups — grows quadratically in the
    replication factor. That is the harness geometry, not the
    operator; the exact-graph kernels that needed a hard bound got one
    (KNN_UNIVERSE below).

    Per-pair cost: norms are precomputed ONCE PER VECTOR before the
    join (sqrt of the self-dot carried as a scalar column), so each
    candidate pair evaluates one 64-term dot instead of three — the
    denominator is the same sqrt(a·a)·sqrt(b·b) doubles in the same
    order, just hoisted, so both engines' cosines are bit-identical to
    the previous form (old-vs-new oracle EXCEPT diff is empty at
    sf0.1). Measured: 51.6 s → 20.4 s at the sf1-equivalent and
    1,045 s → 81 s at sf3.

    SALTED TRIANGLE DECOMPOSITION (r13 — found by the new scaleprobe
    gate): joining on the bare label leaves TWO scale cliffs. (1)
    Parallelism: 10 fixed labels = at most 10 join tasks, so 22 of 32
    cores idle while each task grinds |bucket|²/2 pairs. (2) Memory:
    sort-merge join buffers the entire right-side key group; past
    ~4096 rows (spark.sql.sortMergeJoinExec.buffer.in.memory.threshold)
    the buffer leaves the in-memory array, and each of the |bucket|
    left rows re-scans it — at the sf10 probe (20k-row buckets) the
    wall was 4,991 s for the same 10.8M-pair answer the r11 one-off
    got in 1,068 s. Each vector gets a deterministic salt
    s = vec_id mod S; side A replicates a salt-p vector into blocks
    (p, q) for q ≥ p, side B a salt-q vector into (p, q) for p ≤ q,
    and the join runs on (label, p, q) — |labels|·S(S+1)/2 balanced
    tasks whose buffered groups hold ~|bucket|/S rows. Every unordered
    in-bucket pair lands in exactly ONE block: (min(s_x,s_y),
    max(s_x,s_y)); off-diagonal blocks (p<q) see it once by
    construction, diagonal blocks (p=q) dedup by the vec_a < vec_b
    residual — so no DISTINCT pass is needed, and least/greatest
    restore the canonical vec_a < vec_b orientation. The ORACLE keeps
    the plain label self-join, so driver hash equality PROVES the
    decomposition lossless (the fellegi_sunter / jaccard pattern).

    S is DERIVED PER BUCKET from the bucket's own row count (r14,
    VERDICT item 1 — the r13 constant S=8 was sized for the 100×
    harness and would re-hit the SMJ cliff at ~1000×): the one-row-per-
    bucket count aggregate broadcast-joins back onto the vectors, and
    ``ivf_self_join_salt`` maps it through the sizing rule
    S = clamp(⌈|bucket|/IVF_SALT_GROUP_TARGET⌉, 1, CAP) — the divisor
    is SMJ_GROUP_ROWS/2 = 2048, the A/B-measured target (the ⌈n/4096⌉
    rule lands groups AT the cliff edge and measured ~45% slower at
    sf10; see PERFORMANCE.md r14). Both sides
    derive the SAME S for a given label, so the exactly-once block
    geometry is unchanged — S varying ACROSS labels just means each
    bucket gets its own triangle. Sub-{{SMJ_GROUP_ROWS}} buckets get
    S=1 (the salt columns degenerate to a constant 0 and the plan is
    the plain label join). The plan stays fully lazy — no build-time
    collect. Measured at sf10: 4,991 s (unsalted) → 884 s (S=8) →
    see PERFORMANCE.md (r14) for the derived-S wall."""
    e = load(spark, sf_dir, "embeddings")
    v = e.select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("ev"),
    ).withColumn("nrm", F.sqrt(l2_norm_sq(F.col("ev"))))
    # r16 (VERDICT item 1): parallelism starts at the SCAN — a
    # single-file corpus is one scan partition and the whole salted
    # self-join serializes to one core no matter how good the salt is
    # (989.7 s vs 55.9 s measured at r15). Guard the narrow projection
    # before the explode fan-out; multi-file inputs pass through with
    # zero plan change.
    from ..operators.scale import ensure_scan_parallelism

    v = ensure_scan_parallelism(v, label="embedding_near_dup_via_ivf embeddings scan")
    bucket_n = v.groupBy("label").agg(F.count(F.lit(1)).alias("_bucket_n"))
    salted = (
        v.join(F.broadcast(bucket_n), "label")
        .withColumn("s_cnt", ivf_self_join_salt(F.col("_bucket_n")))
        .drop("_bucket_n")
    )
    a = (
        salted.select(
            F.col("vec_id").alias("ida"), F.col("label").alias("la"),
            F.col("ev").alias("ea"), F.col("nrm").alias("na"),
            F.pmod(F.col("vec_id"), F.col("s_cnt")).cast("int").alias("pa"),
            F.col("s_cnt").alias("s_a"),
        )
        .withColumn("qa", F.explode(F.sequence(F.col("pa"), F.col("s_a") - 1)))
        .drop("s_a")
    )
    b = (
        salted.select(
            F.col("vec_id").alias("idb"), F.col("label").alias("lb"),
            F.col("ev").alias("eb"), F.col("nrm").alias("nb"),
            F.pmod(F.col("vec_id"), F.col("s_cnt")).cast("int").alias("qb"),
        )
        .withColumn("pb", F.explode(F.sequence(F.lit(0), F.col("qb"))))
    )
    cos = F.round(
        dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), 8
    ) + F.lit(0.0)
    return (
        a.join(
            b,
            (F.col("la") == F.col("lb"))
            & (F.col("pa") == F.col("pb"))
            & (F.col("qa") == F.col("qb"))
            & ((F.col("pa") < F.col("qa")) | (F.col("ida") < F.col("idb"))),
        )
        .select(
            F.least("ida", "idb").alias("vec_a"),
            F.greatest("ida", "idb").alias("vec_b"),
            cos.alias("cosine"),
        )
        .where(F.col("cosine") > NEAR_DUP_COS)
    )


KNN_K = 3
#: Deterministic universe bound for the exact kNN-graph kernel — the
#: LOF-fix pattern (plans/linkageq.py::lof_embedding_outliers): the
#: graph queries (kNN graph + the pagerank/triangle/LPA demos built on
#: it) are EXACT all-pairs within a label, and the synthetic labels
#: have FIXED cardinality (10), so unbounded pair space grows as
#: (n/10)²·10 — the round-11 sf3 soak measured the unbounded kernel at
#: >40 min (360M pairs, 10-way key skew: one task per label). The
#: bound covers the ENTIRE table at sf ≤ 0.1 (2,000 vectors), so every
#: driver/bench/test result is byte-identical; at larger SFs the graph
#: is built over the stable calibration sample and cost is constant.
#: A production full-corpus kNN graph is an ANN problem (ivf_ann_topk /
#: lsh_ann_topk are the scale paths), not an exact all-pairs one.
KNN_UNIVERSE = 2000


@query(
    "knn_graph_by_label",
    f"""
    WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS ev FROM embeddings
               WHERE vec_id < {KNN_UNIVERSE}),
    scored AS (
      SELECT a.vec_id AS src, b.vec_id AS dst,
             round(list_dot_product(a.ev, b.ev)
                   / (sqrt(list_dot_product(a.ev, a.ev)) * sqrt(list_dot_product(b.ev, b.ev))), 8)
               + 0.0 AS cosine
      FROM v a JOIN v b ON a.label = b.label AND a.vec_id <> b.vec_id
    )
    SELECT src, dst, cosine, cast(rn as bigint) AS rn,
           cast({KNN_UNIVERSE} as bigint) AS knn_universe FROM (
      SELECT *, row_number() OVER (PARTITION BY src ORDER BY cosine DESC, dst) AS rn
      FROM scored) WHERE rn <= {KNN_K}
    """,
)
def knn_graph_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN graph construction (every vector's top-{KNN_K} neighbors
    within its IVF bucket) — the materialization that feeds dedup
    clustering and semantic-neighbor features. The label equi-join keeps
    the pair space at Σ|bucket|² instead of |N|²; the universe is the
    deterministic ``vec_id < {KNN_UNIVERSE}`` calibration sample (the
    whole table at sf ≤ 0.1 — see KNN_UNIVERSE), so the exact kernel's
    pair space is constant at any SF. Full-corpus graphs at scale come
    from the ANN paths, not exact all-pairs. The bound is SURFACED as a
    constant ``knn_universe`` output column (here and on every
    graph-family consumer) so a result built over the calibration
    sample can never be mistaken for a full-corpus graph downstream."""
    e = load(spark, sf_dir, "embeddings").where(F.col("vec_id") < KNN_UNIVERSE)
    v = e.select("vec_id", "label", F.col("embedding").cast("array<double>").alias("ev"))
    a = v.select(F.col("vec_id").alias("src"), F.col("label").alias("la"), F.col("ev").alias("ea"))
    b = v.select(F.col("vec_id").alias("dst"), F.col("label").alias("lb"), F.col("ev").alias("eb"))
    cos = F.round(
        dot(F.col("ea"), F.col("eb"))
        / (F.sqrt(l2_norm_sq(F.col("ea"))) * F.sqrt(l2_norm_sq(F.col("eb")))),
        8,
    ) + F.lit(0.0)
    scored = (
        a.join(b, (F.col("la") == F.col("lb")) & (F.col("src") != F.col("dst")))
        .select("src", "dst", cos.alias("cosine"))
    )
    w = Window.partitionBy("src").orderBy(F.col("cosine").desc(), F.col("dst"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= KNN_K)
        .select(
            "src", "dst", "cosine", F.col("rn").cast("long").alias("rn"),
            F.lit(KNN_UNIVERSE).cast("long").alias("knn_universe"),
        )
    )


# --------------------------------------------------------------------------
# K-means (Lloyd) — iterative algorithm demo with a fully-unrolled oracle
# --------------------------------------------------------------------------

KMEANS_ITERS = 2


def _km_comp_sql() -> str:
    """(vec_id, label, pos, val) component table, 1-based positions."""
    return """
    SELECT vec_id, label, u.pos AS pos, u.val AS val
    FROM (SELECT vec_id, label,
                 unnest(list_transform(range(1, len(embedding) + 1),
                                       i -> {'pos': i, 'val': embedding[i]::DOUBLE})) AS u
          FROM embeddings)
    """


def _km_centroid_sql(src: str, key: str) -> str:
    """Per-dimension decimal-exact mean over ``src`` grouped by ``key``,
    rebuilt into an ordered array: the 8-dp round makes the centroid
    doubles bit-identical across engines before the next fold."""
    return f"""
    SELECT {key} AS cid, list(cval ORDER BY pos) AS cv
    FROM (SELECT {key}, pos,
                 round(cast(sum(cast(val as decimal(28,12))) as double) / count(*), 8) AS cval
          FROM {src} GROUP BY {key}, pos)
    GROUP BY {key}
    """


def _km_assign_sql(centroids: str) -> str:
    """argmin_c d²(v, c) with rounded distances + cid tie-break."""
    return f"""
    SELECT vec_id, cid, d2 FROM (
      SELECT v.vec_id, c.cid,
             round(list_dot_product(v.ev, v.ev) - 2 * list_dot_product(v.ev, c.cv)
                   + list_dot_product(c.cv, c.cv), 8) AS d2,
             row_number() OVER (
               PARTITION BY v.vec_id
               ORDER BY round(list_dot_product(v.ev, v.ev) - 2 * list_dot_product(v.ev, c.cv)
                              + list_dot_product(c.cv, c.cv), 8), c.cid) AS rn
      FROM vecs v CROSS JOIN {centroids} c)
    WHERE rn = 1
    """


@query(
    "kmeans_lloyd_2iter",
    f"""
    WITH comp AS ({_km_comp_sql()}),
    vecs AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
    c0 AS ({_km_centroid_sql("comp", "label")}),
    a1 AS ({_km_assign_sql("c0")}),
    comp1 AS (SELECT c.vec_id, a1.cid AS label, c.pos, c.val
              FROM comp c JOIN a1 ON c.vec_id = a1.vec_id),
    c1 AS ({_km_centroid_sql("comp1", "label")}),
    a2 AS ({_km_assign_sql("c1")})
    SELECT cid AS cluster_id, count(*) AS n_members,
           round(cast(sum(cast(d2 as decimal(28,8))) as double), 8) AS wcss,
           round(cast(sum(cast(d2 as decimal(28,8))) as double) / count(*), 8) AS avg_d2
    FROM a2 GROUP BY cid
    """,
)
def kmeans_lloyd_2iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means, {KMEANS_ITERS} Lloyd iterations, k = |labels|,
    deterministic init from the per-label centroids (no RNG — the
    engine-portable seeding rule, same spirit as hash-bucket sampling).

    The distributed shape each iteration: centroids are k×d ≈ tiny →
    BROADCAST to the assignment map (a cross join + per-row argmin
    fold, no shuffle of the vector table); the recompute is a
    (cid, pos)-keyed groupBy whose partial aggregation reduces every
    partition to k×d cells before the exchange — the canonical
    scalable k-means|| inner loop. Cross-engine float discipline:
    per-dimension means are exact-decimal sums rounded to 8 dp (both
    engines iterate on IDENTICAL centroid doubles), distances use the
    dot-product-identity folds proven bit-stable by ``ann_cosine_topk``,
    and argmin breaks ties on rounded distance then cid.

    Emits per-cluster membership + WCSS after iteration {KMEANS_ITERS}
    (returning the full assignment would also oracle-match; the summary
    keeps the driver-side compare small)."""
    e = load(spark, sf_dir, "embeddings")
    vecs = e.select("vec_id", F.col("embedding").cast("array<double>").alias("ev"))
    comp = e.select(
        "vec_id",
        F.col("label").cast("long").alias("cid"),
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos0", "val"),
    ).select("vec_id", "cid", (F.col("pos0") + 1).alias("pos"), "val")

    def centroids(comp_df: DataFrame) -> DataFrame:
        means = comp_df.groupBy("cid", "pos").agg(
            F.round(
                F.sum(F.col("val").cast("decimal(28,12)")).cast("double") / F.count(F.lit(1)), 8
            ).alias("cval")
        )
        return means.groupBy("cid").agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "cval"))), lambda s: s["cval"]
            ).alias("cv")
        )

    def assign(cent: DataFrame) -> DataFrame:
        d2 = F.round(
            l2_norm_sq(F.col("ev"))
            - 2 * dot(F.col("ev"), F.col("cv"))
            + l2_norm_sq(F.col("cv")),
            8,
        )
        w = Window.partitionBy("vec_id").orderBy("d2", "cid")
        return (
            vecs.crossJoin(F.broadcast(cent))
            .select("vec_id", "cid", d2.alias("d2"))
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .drop("rn")
        )

    a = assign(centroids(comp))
    for _ in range(KMEANS_ITERS - 1):
        comp_i = comp.drop("cid").join(a.select("vec_id", "cid"), "vec_id")
        a = assign(centroids(comp_i))
    return a.groupBy(F.col("cid").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("n_members"),
        F.round(F.sum(F.col("d2").cast("decimal(28,8)")).cast("double"), 8).alias("wcss"),
        F.round(
            F.sum(F.col("d2").cast("decimal(28,8)")).cast("double") / F.count(F.lit(1)), 8
        ).alias("avg_d2"),
    )


N_PROBES = 2


@query(
    "ivf_ann_multiprobe",
    f"""
    WITH {_centroid_cte()},
    qpos AS (
      SELECT vec_id AS q_id, cast(pos as bigint) AS pos,
             cast(embedding[cast(pos as int)] as double) AS x
      FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(pos)
      WHERE vec_id < {N_QUERIES}
    ),
    qc AS (
      SELECT q_id, label,
             round(sum(x * c) / (sqrt(sum(x * x)) * sqrt(sum(c * c))), 8) AS ccos
      FROM qpos JOIN cents USING (pos)
      GROUP BY q_id, label
    ),
    probes AS (
      SELECT q_id, label FROM (
        SELECT q_id, label,
               row_number() OVER (PARTITION BY q_id ORDER BY ccos DESC, label) AS rn
        FROM qc) WHERE rn <= {N_PROBES}
    ),
    q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < {N_QUERIES}),
    scored AS (
      SELECT p.q_id, p.label AS probe_label, e.vec_id,
             round(list_dot_product(qv, e.embedding::DOUBLE[])
                   / (sqrt(list_dot_product(qv, qv))
                      * sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))), 8)
               + 0.0 AS cosine
      FROM probes p JOIN q ON p.q_id = q.q_id
      JOIN embeddings e ON e.label = p.label AND e.vec_id <> p.q_id
    )
    SELECT q_id, probe_label, vec_id, cosine, cast(rn as bigint) AS rn FROM (
      SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rn
      FROM scored) WHERE rn <= {ANN_K}
    """,
)
def ivf_ann_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 recall lever: multi-probe IVF — each query scans its
    ``N_PROBES`` nearest centroid buckets instead of 1, trading
    ``nprobe/|labels|`` of the corpus per query for recall (the
    standard IVF knob; buckets are disjoint so the candidate union
    needs no dedup). Identical distributed shape to ``ivf_ann_topk``:
    broadcast codebook, equi-join probe, per-query top-k."""
    e = load(spark, sf_dir, "embeddings")
    ev = e.select("vec_id", "label", F.col("embedding").cast("array<double>").alias("v"))
    cents = (
        ev.select("label", F.posexplode("v"))
        .select("label", (F.col("pos") + 1).cast("long").alias("pos"), F.col("col").alias("x"))
        .groupBy("label", "pos")
        .agg(
            (
                F.round(
                    F.sum(F.col("x").cast("decimal(18,9)")).cast("double") / F.count(F.lit(1)), 8
                )
                + F.lit(0.0)
            ).alias("c")
        )
    )
    qpos = (
        ev.where(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("q_id"), F.posexplode("v"))
        .select("q_id", (F.col("pos") + 1).cast("long").alias("pos"), F.col("col").alias("x"))
    )
    qc = (
        qpos.join(cents, "pos")
        .groupBy("q_id", "label")
        .agg(
            F.round(
                F.sum(F.col("x") * F.col("c"))
                / (
                    F.sqrt(F.sum(F.col("x") * F.col("x")))
                    * F.sqrt(F.sum(F.col("c") * F.col("c")))
                ),
                8,
            ).alias("ccos")
        )
    )
    wq = Window.partitionBy("q_id").orderBy(F.col("ccos").desc(), F.col("label"))
    probes = (
        qc.withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= N_PROBES)
        .select("q_id", F.col("label").alias("probe_label"))
    )
    q = ev.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    cand = ev.select("vec_id", "label", F.col("v").alias("cv"))
    cos = F.round(
        dot(F.col("qv"), F.col("cv"))
        / (F.sqrt(l2_norm_sq(F.col("qv"))) * F.sqrt(l2_norm_sq(F.col("cv")))),
        8,
    ) + F.lit(0.0)
    scored = (
        F.broadcast(probes.join(q, "q_id"))
        .join(cand, (cand.label == F.col("probe_label")) & (cand.vec_id != F.col("q_id")))
        .select("q_id", "probe_label", "vec_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= ANN_K)
        .select("q_id", "probe_label", "vec_id", "cosine", F.col("rn").cast("long").alias("rn"))
    )


# --- Sign-LSH (random hyperplane) bucketed ANN: the LSH counterpart to
# the IVF path. Hyperplane components are md5-derived pseudo-random
# doubles generated ONCE in Python and embedded as identical literal
# arrays in both engines, so the sign bits (and therefore the buckets)
# agree bit-for-bit: each projection is a left-to-right fold over the
# embedding array against a literal plane — no groupBy-sum whose
# accumulation order could differ.

N_HYPERPLANES = 6  # 2^6 = 64 buckets: at the test corpus sizes this
# keeps probes non-trivial (~8 vectors/bucket at sf0.01, a 1.6% scan)
# while still returning candidates; at production |N| raise it so the
# expected bucket size |N|/2^planes stays in the hundreds.
PLANE_DIM = 64  # embeddings.parquet is fixed 64-dim


def _hyperplanes() -> list[list[float]]:
    """Deterministic pseudo-random unit-cube components in [-1, 1):
    c[p][i] = md5("rhp|p|i")[:8] / 2^32 * 2 - 1. Exact double arithmetic
    (h < 2^32 so h/2^32, *2, -1 are all exact), so repr() round-trips
    the identical value into both engines' literals."""
    import hashlib

    return [
        [
            int(hashlib.md5(f"rhp|{p}|{i}".encode()).hexdigest()[:8], 16)
            / 4294967296.0
            * 2
            - 1
            for i in range(PLANE_DIM)
        ]
        for p in range(N_HYPERPLANES)
    ]


def _lsh_ann_oracle() -> str:
    planes = _hyperplanes()
    # bare decimals are DECIMAL in DuckDB; ::DOUBLE[] casts each exactly
    bucket_terms = " + ".join(
        f"(CASE WHEN list_dot_product(v, [{', '.join(repr(c) for c in pl)}]::DOUBLE[]) > 0"
        f" THEN {1 << p} ELSE 0 END)"
        for p, pl in enumerate(planes)
    )
    return f"""
    WITH vecs AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    bucketed AS (SELECT vec_id, v, cast({bucket_terms} as bigint) AS bucket FROM vecs),
    q AS (SELECT vec_id AS q_id, v AS qv, bucket FROM bucketed WHERE vec_id < {N_QUERIES}),
    scored AS (
      SELECT q.q_id, q.bucket, c.vec_id,
             round(list_dot_product(qv, c.v)
                   / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(c.v, c.v))), 8)
               + 0.0 AS cosine
      FROM q JOIN bucketed c ON q.bucket = c.bucket AND c.vec_id <> q.q_id
    )
    SELECT q_id, bucket, vec_id, cosine, cast(rn as bigint) AS rn FROM (
      SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rn
      FROM scored) WHERE rn <= {ANN_K}
    """


def signlsh_bucket(v: Column, planes: list[list[float]] | None = None) -> Column:
    """Sign-LSH bucket id for a ``array<double>`` column: bit p =
    sign(v · plane_p). Reusable by any pipeline that wants to co-locate
    similar vectors (partitionBy(bucket) at write time)."""
    planes = planes if planes is not None else _hyperplanes()
    bucket = F.lit(0)
    for p, pl in enumerate(planes):
        proj = dot(v, F.array(*[F.lit(c) for c in pl]))
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket.cast("long")


@query("lsh_ann_topk", _lsh_ann_oracle())
def lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 LSH scale path — random-hyperplane bucketing for cosine ANN:
    each vector's sign bits form its bucket; a query scans ONLY its
    own bucket (expected |N|/2^planes of the corpus for centered data; the
    synthetic embeddings cluster by label, so buckets stay meaningful),
    then the exact rounded-cosine kernel verifies and ranks. The
    candidate step is a hash equi-join on bucket — never |Q|×|N|.

    At 100 TB: write the corpus partitioned by bucket (see
    ``signlsh_bucket``) and the probe prunes partitions at the source;
    multi-probe = also scan buckets at hamming distance 1 from the
    query's (the ``ivf_ann_multiprobe`` pattern applied to LSH)."""
    e = load(spark, sf_dir, "embeddings")
    vecs = e.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    bucketed = vecs.select("vec_id", "v", signlsh_bucket(F.col("v")).alias("bucket"))
    q = bucketed.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"), "bucket"
    )
    cand = bucketed.select("vec_id", F.col("v").alias("cv"), "bucket")
    cos = F.round(
        dot(F.col("qv"), F.col("cv"))
        / (F.sqrt(l2_norm_sq(F.col("qv"))) * F.sqrt(l2_norm_sq(F.col("cv")))),
        8,
    ) + F.lit(0.0)
    scored = (
        cand.join(F.broadcast(q), "bucket")
        .where(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "bucket", "vec_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= ANN_K)
        .select("q_id", "bucket", "vec_id", "cosine", F.col("rn").cast("long").alias("rn"))
    )


# --- Scalar-quantized (int8) ANN with exact re-rank: the memory/
# bandwidth scale path — a 100 TB float corpus becomes ~25 TB of uint8
# codes scanned for candidate generation, and only the top-R candidates
# touch the original floats. Quantized dot products are INTEGER sums,
# so the candidate ranking is engine-exact by construction (no float
# drift anywhere until the final rounded-cosine re-rank).

QUANT_LEVELS = 255
QUANT_RERANK = 30  # candidates per query kept for exact re-rank


def _quant_ann_oracle() -> str:
    return f"""
    WITH pos AS (
      SELECT vec_id, cast(p as bigint) AS pos,
             cast(embedding[cast(p as int)] as double) AS x
      FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(p)
    ),
    dims AS (SELECT pos, min(x) AS mn, max(x) AS mx FROM pos GROUP BY pos),
    quant AS (
      SELECT vec_id, pos.pos,
             CASE WHEN mx = mn THEN 0
                  ELSE cast(round((x - mn) / (mx - mn) * {QUANT_LEVELS}, 0) as bigint)
             END AS q
      FROM pos JOIN dims ON pos.pos = dims.pos
    ),
    qq AS (SELECT vec_id AS q_id, pos, q AS qv FROM quant WHERE vec_id < {N_QUERIES}),
    approx AS (
      SELECT q_id, c.vec_id, cast(sum(qv * c.q) as bigint) AS adot
      FROM qq JOIN quant c ON qq.pos = c.pos AND c.vec_id <> qq.q_id
      GROUP BY q_id, c.vec_id
    ),
    cand AS (
      SELECT q_id, vec_id, adot FROM (
        SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY adot DESC, vec_id) AS arn
        FROM approx) WHERE arn <= {QUANT_RERANK}
    ),
    vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    rerank AS (
      SELECT c.q_id, c.vec_id, c.adot,
             round(list_dot_product(qv.v, cv.v)
                   / (sqrt(list_dot_product(qv.v, qv.v)) * sqrt(list_dot_product(cv.v, cv.v))), 8)
               + 0.0 AS cosine
      FROM cand c JOIN vecs qv ON c.q_id = qv.vec_id
                  JOIN vecs cv ON c.vec_id = cv.vec_id
    )
    SELECT q_id, vec_id, adot, cosine, cast(rn as bigint) AS rn FROM (
      SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rn
      FROM rerank) WHERE rn <= {ANN_K}
    """


@query("quantized_ann_topk", _quant_ann_oracle())
def quantized_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 quantized scale path: per-dimension min/max scalar
    quantization to 0..{QUANT_LEVELS} integer codes; candidate
    generation ranks by the INTEGER quantized dot product (exact in any
    engine — no float-order hazards), then only the top-{QUANT_RERANK}
    per query are re-ranked by exact rounded cosine over the original
    floats.

    Scale: the dims table is |dim| rows (broadcast); quantized codes are
    ~4× smaller than floats — the full-corpus candidate scan reads a
    quarter of the bytes, and the exact-float path touches
    {QUANT_RERANK}·|Q| rows only. Integer partial sums are
    order-independent, so the groupBy dot product needs no fold
    discipline."""
    e = load(spark, sf_dir, "embeddings")
    pos = e.select(
        "vec_id", F.posexplode(F.col("embedding").cast("array<double>"))
    ).select("vec_id", (F.col("pos") + 1).cast("long").alias("pos"), F.col("col").alias("x"))
    dims = pos.groupBy("pos").agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    quant = pos.join(F.broadcast(dims), "pos").select(
        "vec_id",
        "pos",
        F.when(F.col("mx") == F.col("mn"), F.lit(0))
        .otherwise(
            F.round((F.col("x") - F.col("mn")) / (F.col("mx") - F.col("mn")) * QUANT_LEVELS, 0)
        )
        .cast("long")
        .alias("q"),
    )
    qq = quant.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), "pos", F.col("q").alias("qv")
    )
    approx = (
        quant.join(F.broadcast(qq), "pos")
        .where(F.col("vec_id") != F.col("q_id"))
        .groupBy("q_id", "vec_id")
        .agg(F.sum(F.col("qv") * F.col("q")).cast("long").alias("adot"))
    )
    wa = Window.partitionBy("q_id").orderBy(F.col("adot").desc(), F.col("vec_id"))
    cand = (
        approx.withColumn("arn", F.row_number().over(wa))
        .where(F.col("arn") <= QUANT_RERANK)
        .select("q_id", "vec_id", "adot")
    )
    vecs = e.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    qv = vecs.select(F.col("vec_id").alias("q_id"), F.col("v").alias("fq"))
    cv = vecs.select(F.col("vec_id").alias("vec_id"), F.col("v").alias("fc"))
    cos = F.round(
        dot(F.col("fq"), F.col("fc"))
        / (F.sqrt(l2_norm_sq(F.col("fq"))) * F.sqrt(l2_norm_sq(F.col("fc")))),
        8,
    ) + F.lit(0.0)
    rerank = (
        cand.join(F.broadcast(qv), "q_id")
        .join(cv, "vec_id")
        .select("q_id", "vec_id", "adot", cos.alias("cosine"))
    )
    wr = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        rerank.withColumn("rn", F.row_number().over(wr))
        .where(F.col("rn") <= ANN_K)
        .select("q_id", "vec_id", "adot", "cosine", F.col("rn").cast("long").alias("rn"))
    )


PAGERANK_DAMPING = 0.85
PAGERANK_ITERS = 2

_KNN_EDGES_SQL = f"""
    v AS (SELECT vec_id, label, embedding::DOUBLE[] AS ev FROM embeddings
          WHERE vec_id < {KNN_UNIVERSE}),
    pscored AS (
      SELECT a.vec_id AS src, b.vec_id AS dst,
             round(list_dot_product(a.ev, b.ev)
                   / (sqrt(list_dot_product(a.ev, a.ev)) * sqrt(list_dot_product(b.ev, b.ev))), 8)
               + 0.0 AS cosine
      FROM v a JOIN v b ON a.label = b.label AND a.vec_id <> b.vec_id
    ),
    edges AS (
      SELECT src, dst FROM (
        SELECT *, row_number() OVER (PARTITION BY src ORDER BY cosine DESC, dst) AS rn
        FROM pscored) WHERE rn <= {KNN_K}
    )
"""


@query(
    "pagerank_knn_2iter",
    f"""
    WITH {_KNN_EDGES_SQL},
    nn AS (SELECT count(*) AS n FROM embeddings),
    outdeg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
    pr0 AS (SELECT vec_id AS id, cast(1 as double) / n AS pr FROM embeddings, nn),
    c1 AS (
      SELECT e.dst AS id,
             cast(sum(cast(p.pr / o.outdeg as decimal(28,18))) as double) AS s
      FROM edges e JOIN pr0 p ON e.src = p.id JOIN outdeg o ON e.src = o.src
      GROUP BY e.dst
    ),
    pr1 AS (
      SELECT v0.id,
             (cast(1 as double) - cast(0.85 as double)) / n
               + cast(0.85 as double) * coalesce(s, cast(0 as double)) AS pr
      FROM (SELECT vec_id AS id FROM embeddings) v0
      LEFT JOIN c1 ON v0.id = c1.id, nn
    ),
    c2 AS (
      SELECT e.dst AS id,
             cast(sum(cast(p.pr / o.outdeg as decimal(28,18))) as double) AS s
      FROM edges e JOIN pr1 p ON e.src = p.id JOIN outdeg o ON e.src = o.src
      GROUP BY e.dst
    ),
    pr2 AS (
      SELECT v0.id,
             (cast(1 as double) - cast(0.85 as double)) / n
               + cast(0.85 as double) * coalesce(s, cast(0 as double)) AS pr
      FROM (SELECT vec_id AS id FROM embeddings) v0
      LEFT JOIN c2 ON v0.id = c2.id, nn
    )
    SELECT id AS vec_id, round(pr, 8) AS pr,
           cast({KNN_UNIVERSE} as bigint) AS knn_universe FROM pr2
    """,
)
def pagerank_knn_2iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (2 power iterations, d=0.85) over the within-bucket
    kNN graph — similarity-graph centrality, the signal importance-
    weighted corpus sampling uses. Decimal-exact contribution sums make
    the doubles engine-portable; the DuckDB oracle runs both iterations
    fully unrolled — two different executions, one answer.

    Scale: each iteration = rank⋈edges equi-join + groupBy(dst), both
    hash-partitioned by node id → co-partitioned once storage is; the
    operator takes ``checkpoint_every`` for deep iteration counts."""
    from ..operators.graph import pagerank

    edges = knn_graph_by_label(spark, sf_dir).select("src", "dst")
    nodes = load(spark, sf_dir, "embeddings").select(F.col("vec_id").alias("id"))
    pr = pagerank(
        nodes, edges, node_col="id", n_iter=PAGERANK_ITERS, damping=PAGERANK_DAMPING
    )
    return pr.select(
        F.col("id").alias("vec_id"), F.round("pr", 8).alias("pr"),
        F.lit(KNN_UNIVERSE).cast("long").alias("knn_universe"),
    )


def _recall_oracle() -> str:
    from . import REGISTRY

    # Compose the two already-registered oracles verbatim: the recall
    # metric must compare EXACTLY what the two declared queries return.
    return f"""
    WITH bf AS ({REGISTRY["ann_cosine_topk"].oracle}),
         ivf AS ({REGISTRY["ivf_ann_topk"].oracle})
    SELECT bf.q_id,
           cast(count(ivf.vec_id) as bigint) AS n_overlap,
           round(count(ivf.vec_id)::double / {ANN_K}, 6) AS recall_at_k
    FROM bf LEFT JOIN ivf ON bf.q_id = ivf.q_id AND bf.vec_id = ivf.vec_id
    GROUP BY bf.q_id
    """


@query("ann_recall_at10", _recall_oracle())
def ann_recall_at10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{ANN_K} of the IVF probe (nprobe=1) against the exact
    brute-force top-{ANN_K} — the eval loop that decides whether an ANN
    index is production-usable. Composes the two declared queries, so
    the metric can never drift from what they actually return.

    Scale: both inputs are per-query top-k (≤ |Q|×{ANN_K} rows); the
    overlap join and the groupBy are driver-trivial at any corpus size
    — the cost lives in the inputs, which carry the scale story."""
    bf = ann_cosine_topk(spark, sf_dir).select("q_id", "vec_id")
    ivf = ivf_ann_topk(spark, sf_dir).select(
        F.col("q_id").alias("i_qid"), F.col("vec_id").alias("i_vid")
    )
    return (
        bf.join(
            ivf,
            (F.col("q_id") == F.col("i_qid")) & (F.col("vec_id") == F.col("i_vid")),
            "left",
        )
        .groupBy("q_id")
        .agg(
            F.count("i_vid").cast("long").alias("n_overlap"),
            F.round(F.count("i_vid").cast("double") / ANN_K, 6).alias("recall_at_k"),
        )
    )


#: Bucket rows past which even the capped salt (S = CAP) can no longer
#: hold salted SMJ groups at the IVF_SALT_GROUP_TARGET — the measured
#: past-cap regime begins (r15 probe: +36%/pair at 5k-row groups,
#: +103% at 10k — a slope, not a cliff, but the documented fix is
#: re-sizing the IVF, and this row is where that surfaces at runtime).
IVF_BUCKET_PAST_CAP_ROWS = IVF_SELF_JOIN_SALT_CAP * IVF_SALT_GROUP_TARGET  # 131,072


@query(
    "ivf_bucket_stats",
    f"""
    WITH b AS (SELECT label, count(*) AS n_vecs FROM embeddings GROUP BY label),
    t AS (SELECT sum(n_vecs) AS total, max(n_vecs) AS mx FROM b)
    SELECT label, cast(n_vecs as bigint) AS n_vecs,
           round(n_vecs::double / total, 6) AS frac_of_corpus,
           round(n_vecs::double / mx, 6) AS frac_of_largest,
           n_vecs > {IVF_BUCKET_PAST_CAP_ROWS} AS past_salt_cap
    FROM b, t
    """,
)
def ivf_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF health diagnostics: per-bucket population, share of corpus,
    size relative to the largest bucket — the numbers that tell you
    whether a probe actually cuts the scan (balanced buckets) or one
    hot bucket still owns the corpus (skew → probe ≈ full scan) — and
    ``past_salt_cap`` (r16, VERDICT item 5): true when a bucket exceeds
    CAP×TARGET = {IVF_BUCKET_PAST_CAP_ROWS} rows, i.e. the salted
    self-join's derived S is pinned at its cap and buffered groups grow
    past the target (measured slope: +36%/pair at 5k-row groups,
    +103% at 10k — PERFORMANCE.md r15). A true row means the IVF is
    mis-sized: add centroids (real IVF uses ~√n). One groupBy plus a
    broadcast single-row total; at 100 TB this is the query you run
    BEFORE trusting ivf_ann_topk's latency."""
    e = load(spark, sf_dir, "embeddings")
    b = e.groupBy("label").agg(F.count(F.lit(1)).alias("n_vecs"))
    t = b.agg(F.sum("n_vecs").alias("total"), F.max("n_vecs").alias("mx"))
    return b.join(F.broadcast(t)).select(
        "label",
        F.col("n_vecs").cast("long").alias("n_vecs"),
        F.round(F.col("n_vecs").cast("double") / F.col("total"), 6).alias("frac_of_corpus"),
        F.round(F.col("n_vecs").cast("double") / F.col("mx"), 6).alias("frac_of_largest"),
        (F.col("n_vecs") > IVF_BUCKET_PAST_CAP_ROWS).alias("past_salt_cap"),
    )


def _triangle_oracle() -> str:
    from . import REGISTRY

    return f"""
    WITH g AS ({REGISTRY["knn_graph_by_label"].oracle}),
    und AS (
      SELECT g1.src AS a, g1.dst AS b
      FROM g g1 JOIN g g2 ON g1.src = g2.dst AND g1.dst = g2.src
      WHERE g1.src < g1.dst
    ),
    tri AS (
      SELECT count(*) AS n_triangles
      FROM und e1 JOIN und e2 ON e1.b = e2.a
                  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    deg AS (
      SELECT x, count(*) AS d
      FROM (SELECT a AS x FROM und UNION ALL SELECT b AS x FROM und)
      GROUP BY x
    ),
    agg AS (
      SELECT count(*) AS n_nodes, cast(sum(d * (d - 1) / 2) as bigint) AS n_triples
      FROM deg
    )
    SELECT cast(n_nodes as bigint) AS n_nodes,
           (SELECT cast(count(*) as bigint) FROM und) AS n_edges,
           cast(n_triangles as bigint) AS n_triangles,
           round(CASE WHEN n_triples = 0 THEN 0.0
                      ELSE 3.0 * n_triangles / n_triples END, 6) AS global_clustering,
           cast({KNN_UNIVERSE} as bigint) AS knn_universe
    FROM tri, agg
    """


@query("knn_triangle_stats", _triangle_oracle())
def knn_triangle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph analytics over the similarity graph: mutual-kNN edges
    (both directions in the top-{KNN_K} lists), triangle count and the
    global clustering coefficient — the structure signal that separates
    clumped near-dup clusters from uniform corpora.

    Scale shape: the classic edge-edge-edge triangle join, canonically
    ordered (a<b<c) so each triangle counts once. Mutual-kNN bounds
    degree at {KNN_K}, so the wedge join fans out at most k× the edge
    table — this stays linear in |N| at fixed k, never |N|³. Composes
    the registered kNN-graph query's own oracle verbatim."""
    from ..operators.scale import durable_checkpoint

    g = knn_graph_by_label(spark, sf_dir).select("src", "dst")
    g2 = g.select(F.col("src").alias("s2"), F.col("dst").alias("d2"))
    und = (
        g.join(g2, (F.col("src") == F.col("d2")) & (F.col("dst") == F.col("s2")))
        .where(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("a"), F.col("dst").alias("b"))
    )
    # The edge table feeds three consumers (wedge join ×2 sides, degree
    # table, edge count) — materialize it once instead of re-running
    # the kNN build per consumer (same pattern as the LSH band table).
    und = durable_checkpoint(und)
    e1 = und
    e2 = und.select(F.col("a").alias("b2"), F.col("b").alias("c"))
    e3 = und.select(F.col("a").alias("a3"), F.col("b").alias("c3"))
    tri = (
        e1.join(e2, F.col("b") == F.col("b2"))
        .join(e3, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")))
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    deg = (
        und.select(F.col("a").alias("x"))
        .unionAll(und.select(F.col("b").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    agg = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("long").alias("n_triples"),
    )
    n_edges = und.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    return (
        tri.crossJoin(F.broadcast(agg))
        .crossJoin(F.broadcast(n_edges))
        .select(
            F.col("n_nodes").cast("long").alias("n_nodes"),
            "n_edges",
            F.col("n_triangles").cast("long").alias("n_triangles"),
            F.round(
                F.when(F.col("n_triples") == 0, F.lit(0.0)).otherwise(
                    3.0 * F.col("n_triangles") / F.col("n_triples")
                ),
                6,
            ).alias("global_clustering"),
            F.lit(KNN_UNIVERSE).cast("long").alias("knn_universe"),
        )
    )


# --------------------------------------------------------------------------
# PCA top component — power iteration as pure dataflow, unrolled oracle
# --------------------------------------------------------------------------

PCA_ITERS = 2


def _pca_iter_sql(k: int) -> str:
    """One power-iteration round: s = Xv (per-row), u = Xᵀs (per-dim),
    v' = u/‖u‖ rounded to 9 dp. Every reduction accumulates exact
    decimals of 14-dp-quantized products, so both engines sum identical
    numbers in any order."""
    return f"""
    s{k} AS (
      SELECT c.vec_id, sum(cast(c.val * v.val as decimal(28,14))) AS s
      FROM comp c JOIN v{k - 1} v USING (pos) GROUP BY c.vec_id),
    u{k} AS (
      SELECT c.pos, sum(cast(cast(s.s as double) * c.val as decimal(28,14))) AS u
      FROM comp c JOIN s{k} s USING (vec_id) GROUP BY c.pos),
    n{k} AS (
      SELECT sqrt(cast(sum(cast(cast(u as double) * cast(u as double) as decimal(38,14))) as double)) AS nv
      FROM u{k}),
    v{k} AS (
      SELECT pos, round(cast(u as double) / nv, 9) AS val FROM u{k}, n{k})
    """


def _pca_oracle() -> str:
    iters = ",".join(_pca_iter_sql(k).strip().rstrip(",") for k in range(1, PCA_ITERS + 1))
    return f"""
    WITH comp AS (
      SELECT vec_id, cast(pos as bigint) AS pos,
             cast(embedding[cast(pos as int)] as double) AS val
      FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(pos)),
    d AS (SELECT cast(max(pos) as double) AS md FROM comp),
    v0 AS (SELECT DISTINCT pos, round(1.0 / sqrt(md), 9) AS val FROM comp, d),
    {iters}
    SELECT pos, round(val, 8) + 0.0 AS component FROM v{PCA_ITERS}
    """


@query("pca_power_top_component", _pca_oracle())
def pca_power_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the (uncentered) embedding Gram
    matrix via {PCA_ITERS} power-iteration rounds — the whitening /
    drift-detection primitive, as PURE dataflow (no driver linear
    algebra, no collected vectors).

    Scale shape: the d×d covariance is never materialized — each round
    is s = Xv (equi-join on pos, |N|·d component rows) then u = Xᵀs
    (equi-join on vec_id, partial-aggregated per dim), exactly two
    shuffles per round at any corpus size. Inter-round vectors are
    rounded to 9 dp and every reduction accumulates exact decimals, so
    both engines iterate on identical numbers — same discipline as the
    k-means/pagerank oracles."""
    e = load(spark, sf_dir, "embeddings")
    comp = e.select(
        "vec_id", F.posexplode(F.col("embedding").cast("array<double>"))
    ).select("vec_id", (F.col("pos") + 1).cast("long").alias("pos"), F.col("col").alias("val"))

    d = comp.agg(F.max("pos").cast("double").alias("md"))
    v = (
        comp.select("pos").distinct()
        .crossJoin(F.broadcast(d))
        .select("pos", F.round(F.lit(1.0) / F.sqrt(F.col("md")), 9).alias("val"))
    )
    for _ in range(PCA_ITERS):
        s = (
            comp.join(v.select("pos", F.col("val").alias("vv")), "pos")
            .groupBy("vec_id")
            .agg(F.sum((F.col("val") * F.col("vv")).cast("decimal(28,14)")).alias("s"))
        )
        u = (
            comp.join(s, "vec_id")
            .groupBy("pos")
            .agg(
                F.sum((F.col("s").cast("double") * F.col("val")).cast("decimal(28,14)")).alias(
                    "u"
                )
            )
        )
        n = u.agg(
            F.sqrt(
                F.sum(
                    (F.col("u").cast("double") * F.col("u").cast("double")).cast(
                        "decimal(38,14)"
                    )
                ).cast("double")
            ).alias("nv")
        )
        v = u.crossJoin(F.broadcast(n)).select(
            "pos", F.round(F.col("u").cast("double") / F.col("nv"), 9).alias("val")
        )
    return v.select("pos", (F.round("val", 8) + F.lit(0.0)).alias("component"))


# --------------------------------------------------------------------------
# Random-projection dimensionality reduction (Johnson–Lindenstrauss)
# --------------------------------------------------------------------------

RP_OUT_DIMS = 8


def _rp_planes() -> list[list[float]]:
    """Same deterministic md5-derived construction as the sign-LSH
    hyperplanes (exact doubles, repr-round-trippable) under a distinct
    salt, so the two operators can't accidentally share geometry."""
    import hashlib

    return [
        [
            int(hashlib.md5(f"rpj|{k}|{i}".encode()).hexdigest()[:8], 16) / 4294967296.0 * 2 - 1
            for i in range(PLANE_DIM)
        ]
        for k in range(RP_OUT_DIMS)
    ]


def _rp_oracle() -> str:
    planes = _rp_planes()
    scale = f"sqrt({RP_OUT_DIMS}.0)"
    rows = " UNION ALL ".join(
        f"""SELECT vec_id, cast({k} as bigint) AS k,
               round(list_dot_product(embedding::DOUBLE[],
                     [{", ".join(repr(c) for c in pl)}]::DOUBLE[]) / {scale}, 8) + 0.0 AS val
        FROM embeddings"""
        for k, pl in enumerate(planes)
    )
    return rows


@query("rp_reduce_vectors", _rp_oracle())
def rp_reduce_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss random projection {PLANE_DIM}→{RP_OUT_DIMS}:
    the cheap dimensionality cut in front of clustering / dedup when
    full-width cosines are overkill. Projection matrix is literal
    (md5-derived exact doubles), shared verbatim with the oracle; the
    per-dim dot is the same left-to-right fold both engines compute
    bit-identically (the sign-LSH precedent).

    Scale: a narrow map — {RP_OUT_DIMS} folds per row, no shuffle, no
    Python; output is {RP_OUT_DIMS}/{PLANE_DIM} of the input width
    downstream ops then scan."""
    e = load(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    planes = _rp_planes()
    scale = float(RP_OUT_DIMS) ** 0.5
    parts = [
        e.select(
            "vec_id",
            F.lit(k).cast("long").alias("k"),
            (F.round(dot(v, F.array(*[F.lit(c) for c in pl])) / F.lit(scale), 8) + F.lit(0.0)).alias(
                "val"
            ),
        )
        for k, pl in enumerate(planes)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


LPA_ITERS = 2


def _lpa_oracle() -> str:
    from . import REGISTRY

    rounds = []
    for k in range(1, LPA_ITERS + 1):
        rounds.append(f"""
    votes{k} AS (
      SELECT e.dst AS node, l.lab AS lab, count(*) AS c
      FROM und e JOIN l{k - 1} l ON l.node = e.src
      GROUP BY e.dst, l.lab),
    l{k} AS (
      SELECT n.node,
             coalesce(
               (SELECT v.lab FROM votes{k} v WHERE v.node = n.node
                ORDER BY v.c DESC, v.lab LIMIT 1),
               n.lab) AS lab
      FROM l{k - 1} n)""")
    rounds_sql = ",".join(rounds)
    return f"""
    WITH g AS ({REGISTRY["knn_graph_by_label"].oracle}),
    mutual AS (
      SELECT g1.src AS a, g1.dst AS b
      FROM g g1 JOIN g g2 ON g1.src = g2.dst AND g1.dst = g2.src
      WHERE g1.src < g1.dst),
    und AS (SELECT a AS src, b AS dst FROM mutual
            UNION ALL SELECT b AS src, a AS dst FROM mutual),
    l0 AS (SELECT vec_id AS node, vec_id AS lab FROM embeddings),
    {rounds_sql}
    SELECT node AS vec_id, lab AS community,
           cast({KNN_UNIVERSE} as bigint) AS knn_universe FROM l{LPA_ITERS}
    """


@query("lpa_communities_2iter", _lpa_oracle())
def lpa_communities_2iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-propagation community detection (Raghavan et al. 2007),
    {LPA_ITERS} synchronous rounds over the mutual-kNN graph: each node
    adopts its neighbors' most frequent label (ties → min label;
    isolated nodes keep their own). Complements connected components
    (which merges everything reachable) by finding DENSE groups — the
    near-dup "cluster vs bridge" distinction.

    Scale: per round one equi-join edges⋈labels + a combinable count +
    a per-node window argmax — degree ≤ k bounds the vote table at
    k·|N|. Edge table checkpointed once (the triangle-stats pattern)."""
    from ..operators.scale import durable_checkpoint

    g = knn_graph_by_label(spark, sf_dir).select("src", "dst")
    g2 = g.select(F.col("src").alias("s2"), F.col("dst").alias("d2"))
    mutual = (
        g.join(g2, (F.col("src") == F.col("d2")) & (F.col("dst") == F.col("s2")))
        .where(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("a"), F.col("dst").alias("b"))
    )
    und = mutual.unionByName(
        mutual.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).select(F.col("a").alias("src"), F.col("b").alias("dst"))
    und = durable_checkpoint(und)

    labels = load(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("node"), F.col("vec_id").alias("lab")
    )
    for _ in range(LPA_ITERS):
        votes = (
            und.join(labels.select(F.col("node").alias("src"), "lab"), "src")
            .groupBy(F.col("dst").alias("node"), "lab")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        w = Window.partitionBy("node").orderBy(F.desc("c"), "lab")
        best = (
            votes.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("node", F.col("lab").alias("new_lab"))
        )
        labels = (
            labels.join(best, "node", "left")
            .select("node", F.coalesce("new_lab", "lab").alias("lab"))
        )
    return labels.select(
        F.col("node").alias("vec_id"), F.col("lab").alias("community"),
        F.lit(KNN_UNIVERSE).cast("long").alias("knn_universe"),
    )
