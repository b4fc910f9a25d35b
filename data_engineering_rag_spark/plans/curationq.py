"""Model-centric data-curation operators (round-6g EXT family): the
published LLM-corpus curation techniques beyond rule filters and
lexical dedup.

All from public literature:
- SemDedup (Abbas et al. 2023): cluster embeddings, drop near-
  duplicate members within each cluster — catches paraphrase-level
  duplication MinHash can't see (`semantic_cluster_dedup`).
- DSIR (Xie et al. 2023): hashed n-gram importance weights
  log(p_target/p_raw) select raw documents that look like a
  high-quality target distribution (`dsir_importance_scores`).
- CCNet (Wenzek et al. 2019): score every document with an LM trained
  on a trusted slice; bucket the corpus into head/middle/tail by
  perplexity terciles (`bigram_lm_perplexity_buckets`).
- Multinomial Naive Bayes classification (the fastText-classifier
  analog) in its sparse parameterization (`nb_source_confusion`).
- Curriculum ordering — easiest-first global rank on the scale-safe
  kernel (`curriculum_order_assign`).
- The cumulative stage-retention funnel every pipeline owner reads
  first (`pipeline_retention_funnel`).
- ExactSubstr duplicate spans (Lee et al. 2022) at K-shingle
  granularity (`dup_span_stats`).

Scale notes (the 100 TB shapes):
- SemDedup's all-pairs stage exists ONLY within a cluster — cluster
  count grows with the corpus so member count stays bounded; the
  assignment pass is a broadcast-centroid argmax (no shuffle of the
  vector table).
- DSIR's model is a B-bucket weight table (B = {DSIR_BUCKETS}) —
  broadcast to the token stream; the only shuffle is the per-doc
  decimal sum.
- The bigram LM's count tables shuffle on token/bigram keys
  (partial-aggregated); scoring is two equi-joins, never a cross
  product. Tercile thresholds are two exact percentiles over the
  per-doc aggregate (swap for approx_percentile at 100 TB).

Cross-engine float discipline (see plans/__init__.py): log/ln values
are rounded per row, then accumulated as exact decimals; every
reduction result is rounded explicitly in both dialects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.tfidf import TOKEN_PATTERN
from .vectors import dot, l2_norm_sq
from . import load, query

# --------------------------------------------------------------------
# SemDedup: embedding-cluster near-duplicate pruning
# --------------------------------------------------------------------

SEMDEDUP_SAMPLE = 1500  # bounds the oracle's all-pairs replay
# Synthetic embeddings are near-orthogonal (max pair cosine ~0.51 at
# sf0.01), so the demo threshold sits below the real-corpus ~0.95+
# operating point; the planted-duplicate unit test pins the drop rule.
SEMDEDUP_COS = 0.40


def _semdedup_sql() -> str:
    cos = (
        "round(list_dot_product(a.ev, b.ev) / "
        "(sqrt(list_dot_product(a.ev, a.ev)) * sqrt(list_dot_product(b.ev, b.ev))), 8)"
    )
    return f"""
    WITH cents AS (
      SELECT label, cast(pos as bigint) AS pos,
             round(cast(sum(cast(cast(embedding[cast(pos as int)] as double) as decimal(18,9))) as double)
                   / count(*), 8) + 0.0 AS c
      FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(pos)
      GROUP BY label, pos
    ),
    vpos AS (
      SELECT vec_id, cast(pos as bigint) AS pos,
             cast(embedding[cast(pos as int)] as double) AS x
      FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(pos)
      WHERE vec_id < {SEMDEDUP_SAMPLE}
    ),
    vc AS (
      SELECT vec_id, label,
             round(sum(x * c) / (sqrt(sum(x * x)) * sqrt(sum(c * c))), 8) AS ccos
      FROM vpos JOIN cents USING (pos)
      GROUP BY vec_id, label
    ),
    asg AS (
      SELECT vec_id, label AS cluster_id FROM (
        SELECT vec_id, label,
               row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, label) AS rn
        FROM vc) WHERE rn = 1
    ),
    v AS (
      SELECT a.cluster_id, e.vec_id, e.embedding::DOUBLE[] AS ev
      FROM embeddings e JOIN asg a USING (vec_id)
    ),
    dup AS (
      SELECT b.vec_id AS vec_id, count(*) AS n, max({cos}) AS mx
      FROM v a JOIN v b
        ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
      WHERE {cos} >= {SEMDEDUP_COS}
      GROUP BY b.vec_id
    )
    SELECT s.vec_id, cast(s.cluster_id as bigint) AS cluster_id,
           cast(coalesce(d.n, 0) as bigint) AS n_dup_lower,
           d.mx AS max_cos_lower,
           coalesce(d.n, 0) = 0 AS is_kept
    FROM asg s LEFT JOIN dup d ON s.vec_id = d.vec_id
    """


@query("semantic_cluster_dedup", _semdedup_sql())
def semantic_cluster_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDedup (Abbas et al. 2023): assign each vector to its nearest
    per-label centroid by cosine (the deterministic stand-in for a
    k-means pass — same broadcast-argmax fold as ``ivf_ann_topk``),
    then inside each cluster flag any vector whose cosine to a
    LOWER-id cluster-mate reaches {SEMDEDUP_COS}; the lowest id of a
    duplicate set survives (first-survivor rule — canonical-doc dedup
    uses the same convention). Emits the per-vector audit row:
    cluster, duplicate-neighbor count, max offending cosine, keep flag.

    100 TB shape: the all-pairs stage is bounded BY CONSTRUCTION to a
    cluster's members (cluster count scales with the corpus, member
    count stays ~constant); the assignment is a broadcast-centroid
    cross join + per-row argmax — the vector table never shuffles
    until the (cluster-keyed, bounded) pair join."""
    from pyspark import StorageLevel

    e = load(spark, sf_dir, "embeddings")
    comp = e.select(
        F.col("label").cast("long").alias("cluster_label"),
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos0", "val"),
    )
    cents = (
        comp.groupBy("cluster_label", "pos0")
        .agg(
            F.round(
                F.sum(F.col("val").cast("decimal(18,9)")).cast("double") / F.count(F.lit(1)), 8
            ).alias("cval")
        )
        .groupBy("cluster_label")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos0", "cval"))), lambda s: s["cval"]
            ).alias("cv")
        )
    )
    vecs = e.where(F.col("vec_id") < SEMDEDUP_SAMPLE).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("ev")
    )
    ccos = F.round(
        dot(F.col("ev"), F.col("cv"))
        / (F.sqrt(l2_norm_sq(F.col("ev"))) * F.sqrt(l2_norm_sq(F.col("cv")))),
        8,
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), "cluster_label")
    asg = (
        vecs.crossJoin(F.broadcast(cents))
        .select("vec_id", "cluster_label", ccos.alias("ccos"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", F.col("cluster_label").alias("cluster_id"))
        .persist(StorageLevel.MEMORY_AND_DISK)  # feeds pair join AND final audit
    )
    # both sides of the within-cluster pair join read this frame
    v = vecs.join(asg, "vec_id").persist(StorageLevel.MEMORY_AND_DISK)
    a = v.select(
        F.col("cluster_id").alias("cid"),
        F.col("vec_id").alias("va"),
        F.col("ev").alias("eva"),
    )
    b = v.select(
        F.col("cluster_id").alias("cid"),
        F.col("vec_id").alias("vb"),
        F.col("ev").alias("evb"),
    )
    pcos = F.round(
        dot(F.col("eva"), F.col("evb"))
        / (F.sqrt(l2_norm_sq(F.col("eva"))) * F.sqrt(l2_norm_sq(F.col("evb")))),
        8,
    )
    dup = (
        a.join(b, ["cid"])
        .where(F.col("va") < F.col("vb"))
        .select("vb", pcos.alias("cos"))
        .where(F.col("cos") >= SEMDEDUP_COS)
        .groupBy("vb")
        .agg(F.count(F.lit(1)).alias("n"), F.max("cos").alias("mx"))
    )
    return (
        asg.join(dup, asg.vec_id == dup.vb, "left")
        .select(
            "vec_id",
            F.col("cluster_id").cast("long").alias("cluster_id"),
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_dup_lower"),
            F.col("mx").alias("max_cos_lower"),
            (F.coalesce(F.col("n"), F.lit(0)) == 0).alias("is_kept"),
        )
    )


# --------------------------------------------------------------------
# DSIR: hashed-unigram importance-resampling scores
# --------------------------------------------------------------------

DSIR_BUCKETS = 512
_DSIR_SALT = "dsir|"
DSIR_TARGET_SOURCE = "src0"  # the declared high-quality proxy slice


def _dsir_bucket_sql(tok: str) -> str:
    return (
        f"cast(concat('0x', substr(md5(concat('{_DSIR_SALT}', {tok})), 1, 15)) as bigint)"
        f" % {DSIR_BUCKETS}"
    )


def _dsir_bucket_col(tok) -> F.Column:
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit(_DSIR_SALT), tok)), 1, 15), 16, 10).cast("long")
        % DSIR_BUCKETS
    )


@query(
    "dsir_importance_scores",
    f"""
    WITH toks AS (
      SELECT doc_id, source,
             {_dsir_bucket_sql("tok")} AS bucket
      FROM (SELECT doc_id, source,
                   unnest(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS tok
            FROM documents)
    ),
    raw AS (SELECT bucket, count(*) AS cr FROM toks GROUP BY bucket),
    tgt AS (SELECT bucket, count(*) AS ct FROM toks
            WHERE source = '{DSIR_TARGET_SOURCE}' GROUP BY bucket),
    tot AS (SELECT cast(count(*) as double) AS nr,
                   cast(count(*) FILTER (source = '{DSIR_TARGET_SOURCE}') as double) AS nt
            FROM toks),
    wts AS (
      SELECT r.bucket,
             round(ln(((coalesce(t.ct, 0) + 1.0) / (tot.nt + {DSIR_BUCKETS}))
                      / ((r.cr + 1.0) / (tot.nr + {DSIR_BUCKETS}))), 8) AS w
      FROM raw r LEFT JOIN tgt t ON r.bucket = t.bucket CROSS JOIN tot
    )
    SELECT k.doc_id, cast(count(*) as bigint) AS n_tokens,
           floor(cast(sum(cast(w.w as decimal(20,8))) as double) / count(*) * 100000000.0 + 0.5)
             / 100000000.0 AS dsir_score
    FROM toks k JOIN wts w ON k.bucket = w.bucket
    GROUP BY k.doc_id
    """,
)
def dsir_importance_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR (Xie et al. 2023) data selection: hash every token into
    {DSIR_BUCKETS} buckets, estimate the target distribution from the
    '{DSIR_TARGET_SOURCE}' slice (the declared high-quality proxy) and
    the raw distribution from the whole corpus (both add-1 smoothed),
    and score each document by its mean per-token log importance
    weight ln(p_target/p_raw). High scores → doc looks like the
    target; resampling by these weights is the published recipe for
    quality-targeted corpus selection without a trained classifier.

    100 TB shape: the model is the B={DSIR_BUCKETS}-row weight table —
    built by two combinable token-count aggs, then BROADCAST to the
    token stream; scoring shuffles only the per-doc decimal sum. The
    per-bucket weight is rounded to 8 dp before the exact-decimal
    accumulation (cross-engine ln discipline)."""
    from pyspark import StorageLevel

    d = load(spark, sf_dir, "documents")
    # the bucketed token stream feeds raw/target/total counts and the
    # final scoring join — materialize it once (at 100 TB, trade this
    # persist for recomputation: the narrow map is cheaper than disk)
    toks = (
        d.select(
            "doc_id",
            "source",
            F.explode(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_PATTERN), F.lit(0))
            ).alias("tok"),
        )
        .select("doc_id", "source", _dsir_bucket_col(F.col("tok")).alias("bucket"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    raw = toks.groupBy("bucket").agg(F.count(F.lit(1)).alias("cr"))
    tgt = (
        toks.where(F.col("source") == DSIR_TARGET_SOURCE)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    tot = toks.agg(
        F.count(F.lit(1)).cast("double").alias("nr"),
        F.count(F.when(F.col("source") == DSIR_TARGET_SOURCE, 1)).cast("double").alias("nt"),
    )
    wts = (
        raw.join(tgt, "bucket", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.round(
                F.log(
                    ((F.coalesce(F.col("ct"), F.lit(0)) + 1.0) / (F.col("nt") + DSIR_BUCKETS))
                    / ((F.col("cr") + 1.0) / (F.col("nr") + DSIR_BUCKETS))
                ),
                8,
            ).alias("w"),
        )
    )
    return (
        toks.join(F.broadcast(wts), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            # floor-based half-up rounding: engine-exact on quotient
            # ties where round()'s shortest-repr HALF_UP can diverge
            (
                F.floor(
                    F.sum(F.col("w").cast("decimal(20,8)")).cast("double")
                    / F.count(F.lit(1))
                    * 100000000.0
                    + 0.5
                ).cast("double")
                / 100000000.0
            ).alias("dsir_score"),
        )
    )


# --------------------------------------------------------------------
# CCNet-style bigram-LM perplexity buckets
# --------------------------------------------------------------------

_LM_SALT = "lm7|"
LM_TRAIN_BUCKETS = 50  # doc-hash bucket < this → LM training slice


def _lm_bucket_sql(key: str) -> str:
    return (
        f"cast(concat('0x', substr(md5(concat('{_LM_SALT}', cast({key} as varchar))), 1, 15)) "
        "as bigint) % 100"
    )


def _lm_bucket_col(key) -> F.Column:
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(_LM_SALT), key.cast("string"))), 1, 15), 16, 10
        ).cast("long")
        % 100
    )


@query(
    "bigram_lm_perplexity_buckets",
    f"""
    WITH da AS (
      SELECT doc_id, {_lm_bucket_sql("doc_id")} < {LM_TRAIN_BUCKETS} AS is_train,
             regexp_extract_all(lower(text), '{TOKEN_PATTERN}') AS a
      FROM documents
    ),
    vocab AS (
      SELECT DISTINCT unnest(a) AS tok FROM da WHERE is_train
    ),
    vsize AS (SELECT cast(count(*) + 1 as double) AS v FROM vocab),
    mapped AS (
      SELECT t.doc_id, t.is_train, t.i,
             CASE WHEN vo.tok IS NULL THEN '<unk>' ELSE t.tok END AS tok
      FROM (SELECT doc_id, is_train, unnest(a) AS tok,
                   generate_subscripts(a, 1) AS i FROM da) t
      LEFT JOIN vocab vo ON t.tok = vo.tok
    ),
    bg AS (
      SELECT m1.doc_id, m1.is_train, m1.i, m1.tok AS w1, m2.tok AS w2
      FROM mapped m1 JOIN mapped m2
        ON m1.doc_id = m2.doc_id AND m2.i = m1.i + 1
    ),
    c12 AS (SELECT w1, w2, count(*) AS c FROM bg WHERE is_train GROUP BY w1, w2),
    c1 AS (SELECT w1, sum(c) AS c FROM c12 GROUP BY w1),
    scored AS (
      SELECT b.doc_id,
             round(-ln((coalesce(p.c, 0) + 1.0) / (coalesce(u.c, 0) + vsize.v)), 8) AS nll
      FROM bg b
      LEFT JOIN c12 p ON b.w1 = p.w1 AND b.w2 = p.w2
      LEFT JOIN c1 u ON b.w1 = u.w1
      CROSS JOIN vsize
    ),
    perdoc AS (
      SELECT doc_id, cast(count(*) as bigint) AS n_bigrams,
             floor(cast(sum(cast(nll as decimal(20,8))) as double) / count(*) * 1000000.0 + 0.5)
               / 1000000.0 AS log_ppl
      FROM scored GROUP BY doc_id
    ),
    th AS (
      SELECT percentile_cont(1.0/3) WITHIN GROUP (ORDER BY log_ppl) AS t1,
             percentile_cont(2.0/3) WITHIN GROUP (ORDER BY log_ppl) AS t2
      FROM perdoc
    )
    SELECT p.doc_id, p.n_bigrams, p.log_ppl,
           CASE WHEN p.log_ppl <= th.t1 THEN 'head'
                WHEN p.log_ppl <= th.t2 THEN 'middle'
                ELSE 'tail' END AS ppl_bucket
    FROM perdoc p CROSS JOIN th
    """,
)
def bigram_lm_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style (Wenzek et al. 2019) perplexity bucketing with an
    in-engine LM: train an add-1-smoothed bigram model on the
    hash-selected {LM_TRAIN_BUCKETS}% training slice (out-of-vocab
    tokens collapse to '<unk>'), score EVERY document by mean bigram
    negative log-likelihood (log-perplexity — monotone in perplexity,
    so bucketing on it is equivalent and skips the cross-engine exp),
    and cut the corpus into head/middle/tail at the exact terciles.

    100 TB shape: the LM is two count tables shuffled on token/bigram
    keys (partial-aggregated — never a collect); scoring is two
    equi-joins of the corpus bigram stream against them; the tercile
    thresholds are one exact-percentile agg over the per-doc result
    (swap for approx_percentile at scale), broadcast back as a 1-row
    table. Per-bigram nll is rounded to 8 dp, then decimal-summed
    (cross-engine ln discipline)."""
    from pyspark import StorageLevel

    d = load(spark, sf_dir, "documents")
    da = d.select(
        "doc_id",
        (_lm_bucket_col(F.col("doc_id")) < LM_TRAIN_BUCKETS).alias("is_train"),
        F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_PATTERN), F.lit(0)).alias("a"),
    )
    # the positional token stream feeds the vocab build AND the
    # OOV-mapping join
    tokpos = (
        da.select("doc_id", "is_train", F.posexplode("a").alias("pos0", "tok"))
        .select("doc_id", "is_train", (F.col("pos0") + 1).alias("i"), "tok")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # vocab feeds the size scalar and the OOV-mapping join
    vocab = (
        tokpos.where("is_train").select("tok").distinct().persist(StorageLevel.MEMORY_AND_DISK)
    )
    vsize = vocab.agg((F.count(F.lit(1)) + 1).cast("double").alias("v"))
    # the UNK-mapped positional token stream feeds BOTH sides of the
    # consecutive-pair self-join
    mapped = (
        tokpos.join(vocab.withColumn("_inv", F.lit(1)), "tok", "left")
        .select(
            "doc_id",
            "is_train",
            "i",
            F.when(F.col("_inv").isNull(), F.lit("<unk>")).otherwise(F.col("tok")).alias("tok"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    m1 = mapped.select("doc_id", "is_train", "i", F.col("tok").alias("w1"))
    m2 = mapped.select(F.col("doc_id").alias("doc_id2"), (F.col("i") - 1).alias("i2"), F.col("tok").alias("w2"))
    # the bigram stream feeds the training counts AND the scoring pass
    bg = (
        m1.join(m2, (F.col("doc_id") == F.col("doc_id2")) & (F.col("i") == F.col("i2")))
        .select("doc_id", "is_train", "w1", "w2")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    c12 = bg.where("is_train").groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    c1 = c12.groupBy("w1").agg(F.sum("c").alias("cu"))
    nll = F.round(
        -F.log(
            (F.coalesce(F.col("c"), F.lit(0)) + 1.0)
            / (F.coalesce(F.col("cu"), F.lit(0)) + F.col("v"))
        ),
        8,
    )
    scored = (
        bg.join(c12, ["w1", "w2"], "left")
        .join(c1, "w1", "left")
        .crossJoin(F.broadcast(vsize))
        .select("doc_id", nll.alias("nll"))
    )
    # per-doc scores feed the tercile agg AND the final bucket join
    perdoc = (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            # floor-based half-up rounding (see dsir_importance_scores)
            (
                F.floor(
                    F.sum(F.col("nll").cast("decimal(20,8)")).cast("double")
                    / F.count(F.lit(1))
                    * 1000000.0
                    + 0.5
                ).cast("double")
                / 1000000.0
            ).alias("log_ppl"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    th = perdoc.agg(
        F.expr("percentile_cont(1.0/3) WITHIN GROUP (ORDER BY log_ppl)").alias("t1"),
        F.expr("percentile_cont(2.0/3) WITHIN GROUP (ORDER BY log_ppl)").alias("t2"),
    )
    return perdoc.crossJoin(F.broadcast(th)).select(
        "doc_id",
        "n_bigrams",
        "log_ppl",
        F.when(F.col("log_ppl") <= F.col("t1"), F.lit("head"))
        .when(F.col("log_ppl") <= F.col("t2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("ppl_bucket"),
    )


# --------------------------------------------------------------------
# Multinomial Naive Bayes source classifier (confusion matrix)
# --------------------------------------------------------------------

_NB_SALT = "nb9|"
NB_TRAIN_BUCKETS = 70  # doc-hash bucket < this → classifier training


def _nb_bucket_sql(key: str) -> str:
    return (
        f"cast(concat('0x', substr(md5(concat('{_NB_SALT}', cast({key} as varchar))), 1, 15)) "
        "as bigint) % 100"
    )


def _nb_bucket_col(key) -> F.Column:
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(_NB_SALT), key.cast("string"))), 1, 15), 16, 10
        ).cast("long")
        % 100
    )


@query(
    "nb_source_confusion",
    f"""
    WITH dt AS (
      SELECT doc_id, source, {_nb_bucket_sql("doc_id")} < {NB_TRAIN_BUCKETS} AS is_train,
             unnest(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS tok
      FROM documents
    ),
    cls AS (
      SELECT source, count(*) AS nc FROM dt WHERE is_train GROUP BY source
    ),
    vsz AS (SELECT cast(count(DISTINCT tok) as double) AS v FROM dt WHERE is_train),
    docs_per_class AS (
      SELECT source, cast(count(DISTINCT doc_id) as double) AS dc
      FROM dt WHERE is_train GROUP BY source
    ),
    total_docs AS (
      SELECT cast(count(DISTINCT doc_id) as double) AS dt_total FROM dt WHERE is_train
    ),
    cstats AS (
      SELECT c.source,
             round(ln(d.dc / t.dt_total), 8) AS prior,
             round(-ln(c.nc + vsz.v), 8) AS wdef
      FROM cls c JOIN docs_per_class d ON c.source = d.source
      CROSS JOIN total_docs t CROSS JOIN vsz
    ),
    sparse AS (
      SELECT k.tok, k.source,
             round(ln(count(*) + 1.0) - ln(c.nc + vsz.v), 8)
               - s.wdef AS delta
      FROM dt k JOIN cls c ON k.source = c.source
      JOIN cstats s ON k.source = s.source
      CROSS JOIN vsz
      WHERE k.is_train
      GROUP BY k.tok, k.source, c.nc, vsz.v, s.wdef
    ),
    test_toks AS (SELECT doc_id, source, tok FROM dt WHERE NOT is_train),
    doc_len AS (
      SELECT doc_id, source AS true_source, count(*) AS n FROM test_toks GROUP BY doc_id, source
    ),
    doc_delta AS (
      SELECT t.doc_id, s.source AS pred_cand,
             sum(cast(s.delta as decimal(28,8))) AS dsum
      FROM test_toks t JOIN sparse s ON t.tok = s.tok
      GROUP BY t.doc_id, s.source
    ),
    scored AS (
      SELECT dl.doc_id, dl.true_source, cs.source AS pred_cand,
             cast(cs.prior as decimal(28,8)) + dl.n * cast(cs.wdef as decimal(28,8))
               + coalesce(dd.dsum, cast(0 as decimal(28,8))) AS score
      FROM doc_len dl CROSS JOIN cstats cs
      LEFT JOIN doc_delta dd ON dl.doc_id = dd.doc_id AND cs.source = dd.pred_cand
    ),
    pred AS (
      SELECT doc_id, true_source, pred_cand AS pred_source FROM (
        SELECT doc_id, true_source, pred_cand,
               row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, pred_cand) AS rn
        FROM scored) WHERE rn = 1
    )
    SELECT true_source, pred_source, cast(count(*) as bigint) AS n_docs
    FROM pred GROUP BY true_source, pred_source
    """,
)
def nb_source_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes text classifier (the in-engine stand-in
    for fastText-style quality/domain classifiers): train add-1-smoothed
    per-source token models on the hash-selected {NB_TRAIN_BUCKETS}%
    slice, classify every held-out doc, and emit the
    (true_source, pred_source) confusion matrix.

    Sparse scalable parameterization: score_c = prior_c + n·wdef_c +
    Σ_tok delta(tok, c), where wdef_c = -ln(N_c + V) is the zero-count
    (and OOV) weight and delta exists ONLY for observed (token, class)
    pairs — the dense V×C table never materializes. Exactness: per-pair
    deltas/priors are rounded to 8 dp then accumulated as decimals, so
    the argmax compares EXACT decimal scores (no float reduction ever
    crosses the engine boundary); ties break to the lexicographically
    smallest source.

    100 TB shape: model build is one (token, class) combinable count
    agg; scoring joins the token stream to the sparse weights on the
    token key (never a cross product), fans out only by classes
    actually sharing a token, and argmaxes per doc with a
    high-cardinality window. Class stats (C rows) broadcast."""
    from pyspark import StorageLevel

    d = load(spark, sf_dir, "documents")
    # the exploded (doc, source, split, token) stream feeds the class
    # counts, vocab size, doc counts, sparse weights, and test scoring
    dt = (
        d.select(
            "doc_id",
            "source",
            (_nb_bucket_col(F.col("doc_id")) < NB_TRAIN_BUCKETS).alias("is_train"),
            F.explode(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_PATTERN), F.lit(0))
            ).alias("tok"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    train = dt.where("is_train")
    cls = train.groupBy("source").agg(F.count(F.lit(1)).alias("nc"))
    vsz = train.agg(F.countDistinct("tok").cast("double").alias("v"))
    dpc = train.groupBy("source").agg(
        F.countDistinct("doc_id").cast("double").alias("dc")
    )
    tot = train.agg(F.countDistinct("doc_id").cast("double").alias("dt_total"))
    cstats = (
        cls.join(dpc, "source")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(vsz))
        .select(
            "source",
            "nc",
            "v",
            F.round(F.log(F.col("dc") / F.col("dt_total")), 8).alias("prior"),
            F.round(-F.log(F.col("nc") + F.col("v")), 8).alias("wdef"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)  # feeds sparse weights AND scoring
    )
    sparse = (
        train.groupBy("tok", "source")
        .agg(F.count(F.lit(1)).alias("ctc"))
        .join(F.broadcast(cstats), "source")
        .select(
            "tok",
            "source",
            (
                F.round(F.log(F.col("ctc") + 1.0) - F.log(F.col("nc") + F.col("v")), 8)
                - F.col("wdef")
            ).alias("delta"),
        )
    )
    test_toks = dt.where(~F.col("is_train"))
    doc_len = test_toks.groupBy(
        "doc_id", F.col("source").alias("true_source")
    ).agg(F.count(F.lit(1)).alias("n"))
    doc_delta = (
        test_toks.join(sparse.select("tok", F.col("source").alias("pred_cand"), "delta"), "tok")
        .groupBy("doc_id", "pred_cand")
        .agg(F.sum(F.col("delta").cast("decimal(28,8)")).alias("dsum"))
    )
    scored = (
        doc_len.crossJoin(
            F.broadcast(cstats.select(F.col("source").alias("pred_cand"), "prior", "wdef"))
        )
        .join(doc_delta, ["doc_id", "pred_cand"], "left")
        .select(
            "doc_id",
            "true_source",
            "pred_cand",
            (
                F.col("prior").cast("decimal(28,8)")
                + F.col("n") * F.col("wdef").cast("decimal(28,8)")
                + F.coalesce(F.col("dsum"), F.lit(0).cast("decimal(28,8)"))
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "pred_cand")
    pred = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("true_source", F.col("pred_cand").alias("pred_source"))
    )
    return pred.groupBy("true_source", "pred_source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )


# --------------------------------------------------------------------
# Curriculum ordering (scale-safe exact global rank)
# --------------------------------------------------------------------


@query(
    "curriculum_order_assign",
    f"""
    WITH sig AS (
      SELECT doc_id,
             cast(len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) as bigint) AS n_tokens,
             CASE WHEN len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) = 0 THEN 0.0
                  ELSE cast(len(array_to_string(regexp_extract_all(lower(text), '{TOKEN_PATTERN}'), '')) as double)
                       / len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) END AS mean_tok_len
      FROM documents
    )
    SELECT doc_id, n_tokens, mean_tok_len,
           cast(row_number() OVER (ORDER BY n_tokens, mean_tok_len, doc_id) as bigint)
             AS curriculum_rank
    FROM sig
    """,
)
def curriculum_order_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-learning order: rank the corpus easiest-first by
    (token count, mean token length, doc_id-tiebreak) — the standard
    short-and-simple-first schedule for staged pretraining.

    The oracle spells it as the obvious global ``row_number()`` — the
    Spark side must NOT (an unpartitioned window is the classic 100 TB
    single-task funnel). It reuses ``with_global_rank``: range exchange
    on the sort key, per-partition row_number, broadcast prefix counts
    (exactness pinned in tests/test_scale_helpers.py)."""
    from ..operators.scale import with_global_rank

    d = load(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_PATTERN), F.lit(0))
    sig = d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.when(F.size(toks) == 0, F.lit(0.0))
        .otherwise(
            F.length(F.array_join(toks, "")).cast("double") / F.size(toks)
        )
        .alias("mean_tok_len"),
    )
    return with_global_rank(
        sig, ["n_tokens", "mean_tok_len", "doc_id"], rank_col="curriculum_rank"
    )


# --------------------------------------------------------------------
# Pipeline retention funnel
# --------------------------------------------------------------------

FUNNEL_MIN_CHARS = 100
FUNNEL_MAX_DIGIT_FRAC = 0.3
FUNNEL_MAX_REP = 0.5  # dup char-{SHINGLE_REP_K}-gram fraction cap


@query(
    "pipeline_retention_funnel",
    f"""
    WITH flags AS (
      SELECT doc_id, text, n_chars,
             n_chars >= {FUNNEL_MIN_CHARS} AS p1,
             (CASE WHEN length(text) = 0 THEN 1.0
                   ELSE cast(len(regexp_extract_all(text, '[0-9]')) as double) / length(text) END)
               <= {FUNNEL_MAX_DIGIT_FRAC} AS p2,
             (CASE WHEN length(text) < 5 THEN 0.0
                   ELSE 1.0 - cast(len(list_distinct(
                          list_transform(generate_series(1, length(text) - 4),
                                         i -> substr(text, cast(i as int), 5)))) as double)
                        / (length(text) - 4) END)
               <= {FUNNEL_MAX_REP} AS p3
      FROM documents
    ),
    canon AS (
      SELECT md5(text) AS h, min(doc_id) AS keep_id
      FROM flags WHERE p1 AND p2 AND p3 GROUP BY md5(text)
    ),
    flagged AS (
      SELECT f.*, (f.p1 AND f.p2 AND f.p3 AND f.doc_id = c.keep_id) AS p4
      FROM flags f LEFT JOIN canon c ON md5(f.text) = c.h
    ),
    agg AS (
      SELECT count(*) AS n0, cast(sum(n_chars) as bigint) AS c0,
             count(*) FILTER (p1) AS n1, cast(coalesce(sum(n_chars) FILTER (p1), 0) as bigint) AS c1,
             count(*) FILTER (p1 AND p2) AS n2, cast(coalesce(sum(n_chars) FILTER (p1 AND p2), 0) as bigint) AS c2,
             count(*) FILTER (p1 AND p2 AND p3) AS n3, cast(coalesce(sum(n_chars) FILTER (p1 AND p2 AND p3), 0) as bigint) AS c3,
             count(*) FILTER (coalesce(p4, false)) AS n4, cast(coalesce(sum(n_chars) FILTER (coalesce(p4, false)), 0) as bigint) AS c4
      FROM flagged
    ),
    stages AS (
      SELECT 'raw' AS stage, 0 AS stage_order, n0 AS n_docs, c0 AS n_chars, n0 FROM agg
      UNION ALL SELECT 'min_chars', 1, n1, c1, n0 FROM agg
      UNION ALL SELECT 'digit_frac', 2, n2, c2, n0 FROM agg
      UNION ALL SELECT 'repetition', 3, n3, c3, n0 FROM agg
      UNION ALL SELECT 'exact_dedup', 4, n4, c4, n0 FROM agg
    )
    SELECT stage, cast(stage_order as int) AS stage_order,
           cast(n_docs as bigint) AS n_docs, n_chars,
           floor(cast(n_docs as double) / n0 * 1000000.0 + 0.5) / 1000000.0 AS retention
    FROM stages
    """,
)
def pipeline_retention_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation funnel audit: how many docs (and chars)
    survive each cumulative stage — raw → min-length →
    digit-fraction cap → repetition cap → exact-content dedup
    (canonical = min doc_id, applied AMONG prior-stage survivors).
    The per-stage retention table is the first thing a pipeline owner
    asks for and the driver of every threshold decision above.

    100 TB shape: stage flags are one narrow pass over the payload;
    dedup adds the 16-byte-hash min-agg + hash-keyed rejoin (payloads
    shuffle as digests, same kernel as ``dedup_exact_stats``); the
    funnel itself is ONE combinable conditional agg → a 5-row stack.
    Retention quotients use the floor-based half-up spelling (int/int
    quotients DO land on round-tie boundaries)."""
    from pyspark import StorageLevel

    d = load(spark, sf_dir, "documents")
    digit_frac = F.when(F.length("text") == 0, F.lit(1.0)).otherwise(
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[0-9]"), F.lit(0))).cast("double")
        / F.length("text")
    )
    sh = F.transform(
        F.sequence(F.lit(1), F.length("text") - 4),
        lambda i: F.col("text").substr(i, F.lit(5)),
    )
    rep_frac = F.when(F.length("text") < 5, F.lit(0.0)).otherwise(
        F.lit(1.0) - F.size(F.array_distinct(sh)).cast("double") / (F.length("text") - 4)
    )
    flags = d.select(
        "doc_id",
        "n_chars",
        F.md5("text").alias("h"),
        (F.col("n_chars") >= FUNNEL_MIN_CHARS).alias("p1"),
        (digit_frac <= FUNNEL_MAX_DIGIT_FRAC).alias("p2"),
        (rep_frac <= FUNNEL_MAX_REP).alias("p3"),
    ).persist(StorageLevel.MEMORY_AND_DISK)  # feeds canon agg AND final agg
    canon = (
        flags.where("p1 AND p2 AND p3")
        .groupBy("h")
        .agg(F.min("doc_id").alias("keep_id"))
    )
    flagged = flags.join(canon, "h", "left").withColumn(
        "p4",
        F.col("p1") & F.col("p2") & F.col("p3") & (F.col("doc_id") == F.col("keep_id")),
    )
    agg = flagged.agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum("n_chars").cast("long").alias("c0"),
        F.count(F.when(F.col("p1"), 1)).alias("n1"),
        F.coalesce(F.sum(F.when(F.col("p1"), F.col("n_chars"))), F.lit(0)).cast("long").alias("c1"),
        F.count(F.when(F.col("p1") & F.col("p2"), 1)).alias("n2"),
        F.coalesce(F.sum(F.when(F.col("p1") & F.col("p2"), F.col("n_chars"))), F.lit(0))
        .cast("long")
        .alias("c2"),
        F.count(F.when(F.col("p1") & F.col("p2") & F.col("p3"), 1)).alias("n3"),
        F.coalesce(
            F.sum(F.when(F.col("p1") & F.col("p2") & F.col("p3"), F.col("n_chars"))), F.lit(0)
        )
        .cast("long")
        .alias("c3"),
        F.count(F.when(F.coalesce(F.col("p4"), F.lit(False)), 1)).alias("n4"),
        F.coalesce(
            F.sum(F.when(F.coalesce(F.col("p4"), F.lit(False)), F.col("n_chars"))), F.lit(0)
        )
        .cast("long")
        .alias("c4"),
    )
    stacked = agg.select(
        F.expr(
            "stack(5, 'raw', 0, n0, c0, 'min_chars', 1, n1, c1, "
            "'digit_frac', 2, n2, c2, 'repetition', 3, n3, c3, "
            "'exact_dedup', 4, n4, c4) AS (stage, stage_order, n_docs, n_chars)"
        ),
        F.col("n0"),
    )
    return stacked.select(
        "stage",
        F.col("stage_order").cast("int").alias("stage_order"),
        F.col("n_docs").cast("long").alias("n_docs"),
        "n_chars",
        (
            F.floor(F.col("n_docs").cast("double") / F.col("n0") * 1000000.0 + 0.5).cast("double")
            / 1000000.0
        ).alias("retention"),
    )


# --------------------------------------------------------------------
# ExactSubstr-style duplicate spans (Lee et al. 2022, "Deduplicating
# Training Data Makes Language Models Better"): corpus-wide repeated
# K-char substrings, merged into per-doc duplicate intervals. The
# published tool uses suffix arrays; the Spark spelling is the
# K-shingle-hash equivalent — any duplicated span of length >= K
# contains a duplicated K-gram, so span detection at K-granularity is
# identical; only sub-K tails at span edges differ.
# --------------------------------------------------------------------

DUP_SPAN_K = 50


@query(
    "dup_span_stats",
    f"""
    WITH pos AS (
      SELECT doc_id, cast(i as bigint) AS p, length(text) AS len,
             md5(substr(text, cast(i as int), {DUP_SPAN_K})) AS h
      FROM documents, unnest(generate_series(1, length(text) - {DUP_SPAN_K} + 1)) AS t(i)
      WHERE length(text) >= {DUP_SPAN_K}
    ),
    dups AS (SELECT h FROM pos GROUP BY h HAVING count(*) >= 2),
    hits AS (
      SELECT pos.doc_id, pos.p, pos.p + {DUP_SPAN_K} AS e, pos.len
      FROM pos JOIN dups ON pos.h = dups.h
    ),
    isl AS (
      SELECT doc_id, p, e, len,
             CASE WHEN p > coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY p
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                  THEN 1 ELSE 0 END AS new_isl
      FROM hits
    ),
    grp AS (
      SELECT doc_id, p, e, len,
             sum(new_isl) OVER (PARTITION BY doc_id ORDER BY p
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl_id
      FROM isl
    ),
    spans AS (
      SELECT doc_id, isl_id, min(p) AS s, max(e) AS e, min(len) AS len
      FROM grp GROUP BY doc_id, isl_id
    )
    SELECT doc_id,
           cast(count(*) as bigint) AS n_dup_spans,
           cast(sum(e - s) as bigint) AS dup_chars,
           cast(min(len) as bigint) AS n_chars,
           floor(cast(sum(e - s) as double) / min(len) * 1000000.0 + 0.5)
             / 1000000.0 AS dup_frac
    FROM spans GROUP BY doc_id
    """,
)
def dup_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-SPAN statistics per document: every {DUP_SPAN_K}-char
    substring occurring ≥2 times corpus-wide (self-repeats included,
    as in the paper) marks an interval; overlapping intervals merge
    into maximal duplicate spans (gaps-and-islands). Emits, for each
    affected doc, the span count, duplicated char mass, and duplicated
    fraction — the decision table for span-level (rather than
    doc-level) dedup.

    100 TB shape: positions shuffle as 16-byte md5 keys; the duplicate
    filter is a combinable count + semi-join back on the hash key; the
    interval merge is a per-doc window (doc_id is high-cardinality).
    The |chars| position fan-out is the honest cost of substring-level
    detection (the paper pays it as a suffix array); df-cap the
    hottest hashes before the join at extreme scale."""
    from pyspark import StorageLevel

    d = load(spark, sf_dir, "documents").where(F.length("text") >= DUP_SPAN_K)
    # the hashed position stream feeds the duplicate filter AND the
    # semi-join back — materialize the md5 work once
    pos = (
        d.select(
            "doc_id",
            F.length("text").cast("long").alias("len"),
            F.explode(F.sequence(F.lit(1), F.length("text") - DUP_SPAN_K + 1)).alias("i"),
            "text",
        )
        .select(
            "doc_id",
            F.col("i").cast("long").alias("p"),
            "len",
            F.md5(F.expr(f"substring(text, i, {DUP_SPAN_K})")).alias("h"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    dups = pos.groupBy("h").agg(F.count(F.lit(1)).alias("c")).where("c >= 2").select("h")
    hits = pos.join(dups, "h").select(
        "doc_id", "p", (F.col("p") + DUP_SPAN_K).alias("e"), "len"
    )
    w = Window.partitionBy("doc_id").orderBy("p")
    prev_max_e = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    isl = hits.withColumn(
        "new_isl",
        F.when(F.col("p") > F.coalesce(prev_max_e, F.lit(-1)), 1).otherwise(0),
    )
    grp = isl.withColumn(
        "isl_id", F.sum("new_isl").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    spans = grp.groupBy("doc_id", "isl_id").agg(
        F.min("p").alias("s"), F.max("e").alias("e"), F.min("len").alias("len")
    )
    return spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_dup_spans"),
        F.sum(F.col("e") - F.col("s")).cast("long").alias("dup_chars"),
        F.min("len").cast("long").alias("n_chars"),
        (
            F.floor(
                F.sum(F.col("e") - F.col("s")).cast("double")
                / F.min("len")
                * 1000000.0
                + 0.5
            ).cast("double")
            / 1000000.0
        ).alias("dup_frac"),
    )


NEYMAN_BUDGET = 1000


@query(
    "neyman_budget_allocation",
    f"""
    WITH s AS (
      SELECT lang, cast(count(*) as bigint) AS n_docs,
             cast(sum(n_chars) as bigint) AS sy,
             cast(sum(n_chars * n_chars) as bigint) AS syy
      FROM documents GROUP BY lang),
    st AS (
      SELECT lang, n_docs,
             sqrt((cast(syy as double)
                   - cast(sy as double) * cast(sy as double) / cast(n_docs as double))
                  / cast(n_docs - 1 as double)) AS sd
      FROM s WHERE n_docs > 1),
    terms AS (
      SELECT lang, n_docs, sd,
             cast(round(cast(n_docs as double) * sd, 6) as decimal(27,6)) AS nhsh
      FROM st),
    tot AS (SELECT cast(sum(nhsh) as double) AS t, cast(sum(n_docs) as bigint) AS nt
            FROM terms)
    SELECT lang, n_docs,
           round(sd, 6) AS char_sd,
           cast(floor({NEYMAN_BUDGET}.0 * cast(nhsh as double) / t + 0.5) as bigint)
             AS neyman_n,
           cast(floor({NEYMAN_BUDGET}.0 * cast(n_docs as double) / cast(nt as double) + 0.5)
                as bigint) AS proportional_n
    FROM terms CROSS JOIN tot
    """,
)
def neyman_budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance-optimal budget allocation (Neyman 1934) for a fixed
    annotation/eval budget of {NEYMAN_BUDGET} docs across language
    strata: n_h ∝ N_h·S_h (stratum size × within-stratum char-length
    stddev), side-by-side with naive proportional allocation — the
    high-variance strata get oversampled, which is what minimizes the
    estimator variance when human-labeling a corpus slice or sizing
    per-language eval sets.

    Determinism: S_h comes from exact integer sufficient statistics
    (Σy, Σy²) with the SAME double spelling in both dialects; each
    N_h·S_h term is rounded then accumulated as exact decimal (the
    5-term float sum would be order-dependent); allocations use the
    floor-half-up spelling. Shape: ONE combinable groupBy over
    documents + a broadcast 1-row total — nothing else touches the
    corpus."""
    d = load(spark, sf_dir, "documents")
    s = d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sy"),
        F.sum(F.col("n_chars") * F.col("n_chars")).cast("long").alias("syy"),
    )
    sd = F.sqrt(
        (
            F.col("syy").cast("double")
            - F.col("sy").cast("double") * F.col("sy").cast("double") / F.col("n_docs").cast("double")
        )
        / (F.col("n_docs") - 1).cast("double")
    )
    terms = s.where(F.col("n_docs") > 1).select(
        "lang",
        "n_docs",
        sd.alias("sd"),
        F.round(F.col("n_docs").cast("double") * sd, 6).cast("decimal(27,6)").alias("nhsh"),
    )
    tot = terms.agg(
        F.sum("nhsh").cast("double").alias("t"), F.sum("n_docs").cast("long").alias("nt")
    )
    b = float(NEYMAN_BUDGET)
    return terms.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        F.round("sd", 6).alias("char_sd"),
        F.floor(b * F.col("nhsh").cast("double") / F.col("t") + 0.5).cast("long").alias("neyman_n"),
        F.floor(b * F.col("n_docs").cast("double") / F.col("nt").cast("double") + 0.5)
        .cast("long")
        .alias("proportional_n"),
    )
