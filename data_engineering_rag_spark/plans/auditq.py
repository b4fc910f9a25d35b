"""Round-6b audits: storage-layout planning, membership prefilters,
sketch calibration, and privacy/ops analytics — the queries that decide
HOW 100 TB gets laid out and filtered before anything heavy runs.

These extend the reference's corpus scope (zc_agent/prepare_data.py)
with the public large-scale warehouse practices: Z-order multi-
dimensional clustering for file skipping (public Delta/Iceberg
OPTIMIZE ZORDER semantics), Bloom-filter join prefilters (Spark's own
runtime bloom pushdown, made explicit and measurable), KMV distinct
sketches for cross-source overlap (Bar-Yossef et al.), and k-anonymity
audits over quasi-identifiers (Sweeney). Cross-engine determinism
rules follow plans/__init__.py: integer/bit math everywhere possible,
exact decimal accumulation for float reductions, identical aliases and
rounding in both dialects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.tfidf import TOKEN_PATTERN
from . import load, query

# --------------------------------------------------------------------------
# Z-order layout audit — multi-dimensional clustering vs linear sort
# --------------------------------------------------------------------------

ZO_BITS = 4  # 4 bits/dim -> 16x16 grid, 256 z-values
ZO_FILES = 16  # both layouts pack rows into 16 "files"
ZO_BOX = (4, 7)  # the probe box: cx in [4,7] AND cy in [4,7]


def _bit(expr: str, b: int, *, duck: bool) -> str:
    """Arithmetic bit extraction — `(expr // 2^b) % 2` — spelled in the
    right integer-division dialect (DuckDB `//`, Spark SQL `div`)."""
    d = "//" if duck else "div"
    return f"(({expr}) {d} {1 << b}) % 2"


def _zvalue(cx: str, cy: str, *, duck: bool) -> str:
    """Interleave ZO_BITS bits of cx (odd positions) and cy (even):
    the Morton/Z-order curve index, in pure +/div/% integer math so
    both engines agree bit-for-bit."""
    terms = []
    for b in range(ZO_BITS):
        terms.append(f"{_bit(cx, b, duck=duck)} * {1 << (2 * b + 1)}")
        terms.append(f"{_bit(cy, b, duck=duck)} * {1 << (2 * b)}")
    return " + ".join(terms)


def _zorder_oracle() -> str:
    lo, hi = ZO_BOX
    d = "//"
    return f"""
    WITH bounds AS (
      SELECT min(o_custkey) AS mnc, max(o_custkey) AS mxc,
             min(o_orderdate) AS mnd, max(o_orderdate) AS mxd
      FROM orders),
    bucketed AS (
      SELECT ((o_custkey - mnc) * {1 << ZO_BITS}) {d} (mxc - mnc + 1) AS cx,
             (date_diff('day', mnd, o_orderdate) * {1 << ZO_BITS})
               {d} (date_diff('day', mnd, mxd) + 1) AS cy
      FROM orders, bounds),
    filed AS (
      SELECT cx, cy,
             ({_zvalue("cx", "cy", duck=True)}) {d} {256 // ZO_FILES} AS file_z,
             cy AS file_lin
      FROM bucketed),
    long AS (
      SELECT 'zorder' AS layout, file_z AS file_id, cx, cy FROM filed
      UNION ALL
      SELECT 'linear' AS layout, file_lin AS file_id, cx, cy FROM filed),
    files AS (
      SELECT layout, file_id,
             min(cx) AS mncx, max(cx) AS mxcx, min(cy) AS mncy, max(cy) AS mxcy,
             count(*) AS n_rows,
             sum(CASE WHEN cx BETWEEN {lo} AND {hi} AND cy BETWEEN {lo} AND {hi}
                      THEN 1 ELSE 0 END) AS n_match
      FROM long GROUP BY layout, file_id)
    SELECT layout,
           cast(count(*) as bigint) AS n_files,
           cast(sum(CASE WHEN mxcx >= {lo} AND mncx <= {hi}
                          AND mxcy >= {lo} AND mncy <= {hi} THEN 1 ELSE 0 END) as bigint)
             AS n_files_scanned,
           cast(sum(CASE WHEN mxcx >= {lo} AND mncx <= {hi}
                          AND mxcy >= {lo} AND mncy <= {hi} THEN n_rows ELSE 0 END) as bigint)
             AS rows_scanned,
           cast(sum(n_match) as bigint) AS rows_matched,
           round(sum(CASE WHEN mxcx >= {lo} AND mncx <= {hi}
                           AND mxcy >= {lo} AND mncy <= {hi} THEN n_rows ELSE 0 END)::double
                 / sum(n_rows), 6) AS scan_fraction
    FROM files GROUP BY layout
    """


@query("zorder_layout_audit", _zorder_oracle())
def zorder_layout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER vs linear layout, measured: bucket orders onto a
    {2**ZO_BITS}x{2**ZO_BITS} (custkey, orderdate) grid, pack rows into
    {ZO_FILES} files either by Morton z-value or by date alone, then
    replay a 2-D box predicate against per-file min/max stats — exactly
    the footer-stats skipping a parquet reader does. The point the
    numbers make: a linear sort gives perfect skipping on ONE dimension
    and none on the other; the z-curve bounds BOTH dims per file, so
    the 2-D box scans a fraction of the files. At 100 TB this query is
    the layout-planning decision for OPTIMIZE ZORDER BY (k1, k2); the
    audit itself is two cheap groupBys over pure integer bit math (no
    UDFs, whole-stage codegen end-to-end)."""
    lo, hi = ZO_BOX
    o = load(spark, sf_dir, "orders")
    b = o.agg(
        F.min("o_custkey").alias("mnc"),
        F.max("o_custkey").alias("mxc"),
        F.min("o_orderdate").alias("mnd"),
        F.max("o_orderdate").alias("mxd"),
    )
    bucketed = o.crossJoin(F.broadcast(b)).select(
        F.expr(f"((o_custkey - mnc) * {1 << ZO_BITS}) div (mxc - mnc + 1)").alias("cx"),
        F.expr(
            f"(datediff(o_orderdate, mnd) * {1 << ZO_BITS}) div (datediff(mxd, mnd) + 1)"
        ).alias("cy"),
    )
    filed = bucketed.select(
        "cx",
        "cy",
        F.expr(f"({_zvalue('cx', 'cy', duck=False)}) div {256 // ZO_FILES}").alias("file_z"),
        F.col("cy").alias("file_lin"),
    )
    long = filed.select(F.lit("zorder").alias("layout"), F.col("file_z").alias("file_id"), "cx", "cy").unionAll(
        filed.select(F.lit("linear").alias("layout"), F.col("file_lin").alias("file_id"), "cx", "cy")
    )
    in_box = (
        F.col("cx").between(lo, hi) & F.col("cy").between(lo, hi)
    ).cast("int")
    files = long.groupBy("layout", "file_id").agg(
        F.min("cx").alias("mncx"),
        F.max("cx").alias("mxcx"),
        F.min("cy").alias("mncy"),
        F.max("cy").alias("mxcy"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(in_box).alias("n_match"),
    )
    hit = (
        (F.col("mxcx") >= lo) & (F.col("mncx") <= hi)
        & (F.col("mxcy") >= lo) & (F.col("mncy") <= hi)
    )
    return files.groupBy("layout").agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum(hit.cast("int")).cast("long").alias("n_files_scanned"),
        F.sum(F.when(hit, F.col("n_rows")).otherwise(0)).cast("long").alias("rows_scanned"),
        F.sum("n_match").cast("long").alias("rows_matched"),
        F.round(
            F.sum(F.when(hit, F.col("n_rows")).otherwise(0)).cast("double") / F.sum("n_rows"),
            6,
        ).alias("scan_fraction"),
    )


# --------------------------------------------------------------------------
# Bloom-filter prefilter audit — explicit, measurable membership pushdown
# --------------------------------------------------------------------------

BF_BITS = 8192  # m
BF_SALTS = ("bf0|", "bf1|", "bf2|")  # k = 3 independent hash positions
BF_PRICE_CUT = 150000.0  # build side: customers with a big-ticket order


def _bf_pos_sql(salt: str, key: str) -> str:
    return (
        f"cast(concat('0x', substr(md5(concat('{salt}', cast({key} as varchar))), 1, 15)) "
        f"as bigint) % {BF_BITS}"
    )


def _bf_pos_col(salt: str, key) -> F.Column:
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 15), 16, 10
        ).cast("long")
        % BF_BITS
    )


def _bloom_oracle() -> str:
    pos_union = " UNION ALL ".join(
        f"SELECT {_bf_pos_sql(s, 'k')} AS pos FROM build" for s in BF_SALTS
    )
    probe_pos = " UNION ALL ".join(
        f"SELECT c_custkey AS pk, {_bf_pos_sql(s, 'c_custkey')} AS pos FROM probe"
        for s in BF_SALTS
    )
    return f"""
    WITH build AS (
      SELECT DISTINCT o_custkey AS k FROM orders WHERE o_totalprice > {BF_PRICE_CUT}),
    probe AS (SELECT DISTINCT c_custkey FROM customer),
    bits AS (SELECT DISTINCT pos FROM ({pos_union})),
    pp AS ({probe_pos}),
    hits AS (
      SELECT pk, count(*) AS n_hit
      FROM (SELECT DISTINCT pk, pos FROM pp) q JOIN bits USING (pos)
      GROUP BY pk),
    passed AS (SELECT pk FROM hits WHERE n_hit = {len(BF_SALTS)}),
    truth AS (SELECT c_custkey AS pk FROM probe JOIN build ON c_custkey = k)
    SELECT cast((SELECT count(*) FROM build) as bigint) AS n_build_keys,
           cast((SELECT count(*) FROM bits) as bigint) AS n_bits_set,
           cast((SELECT count(*) FROM probe) as bigint) AS n_probe,
           cast((SELECT count(*) FROM passed) as bigint) AS n_pass,
           cast((SELECT count(*) FROM truth) as bigint) AS n_true_members,
           cast((SELECT count(*) FROM passed) - (SELECT count(*) FROM truth) as bigint)
             AS n_false_pos,
           round(CASE WHEN (SELECT count(*) FROM probe) = (SELECT count(*) FROM truth)
                      THEN 0.0
                      ELSE ((SELECT count(*) FROM passed) - (SELECT count(*) FROM truth))::double
                           / ((SELECT count(*) FROM probe) - (SELECT count(*) FROM truth)) END,
                 6) AS false_pos_rate
    """


@query("bloom_prefilter_audit", _bloom_oracle())
def bloom_prefilter_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter join prefilter, made explicit and measured: build an
    m={BF_BITS}, k={len(BF_SALTS)} filter over the big-ticket customer
    keys (the small/selective join side), probe every customer key, and
    report the pass set vs ground truth — the false-positive rate IS
    the wasted-shuffle fraction a bloom pushdown would leave. Spark
    does this implicitly (spark.sql.optimizer.runtimeFilter.bloomFilter);
    this audit sizes m/k on real key distributions before you trust it
    at 100 TB, where the filter broadcast (KB) replaces shuffling the
    non-matching majority of the probe side. No bloom never drops a
    true member (n_pass >= n_true_members, a superset by construction).

    Shape: the occupied-bit set and per-key hash positions are pure
    column math; membership = a {len(BF_SALTS)}-way position semi-join
    and a count-match — partial-aggregable throughout."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    build = (
        o.where(F.col("o_totalprice") > BF_PRICE_CUT).select(F.col("o_custkey").alias("k")).distinct()
    )
    probe = c.select(F.col("c_custkey").alias("pk")).distinct()
    bits = None
    for s in BF_SALTS:
        p = build.select(_bf_pos_col(s, F.col("k")).alias("pos"))
        bits = p if bits is None else bits.unionAll(p)
    bits = bits.distinct()
    pp = None
    for s in BF_SALTS:
        p = probe.select("pk", _bf_pos_col(s, F.col("pk")).alias("pos"))
        pp = p if pp is None else pp.unionAll(p)
    passed = (
        pp.distinct()
        .join(bits, "pos")
        .groupBy("pk")
        .agg(F.count(F.lit(1)).alias("n_hit"))
        .where(F.col("n_hit") == len(BF_SALTS))
        .select("pk")
    )
    truth = probe.join(build, probe.pk == build.k, "semi")
    stats = (
        build.agg(F.count(F.lit(1)).alias("n_build_keys"))
        .crossJoin(bits.agg(F.count(F.lit(1)).alias("n_bits_set")))
        .crossJoin(probe.agg(F.count(F.lit(1)).alias("n_probe")))
        .crossJoin(passed.agg(F.count(F.lit(1)).alias("n_pass")))
        .crossJoin(truth.agg(F.count(F.lit(1)).alias("n_true_members")))
    )
    return stats.select(
        F.col("n_build_keys").cast("long").alias("n_build_keys"),
        F.col("n_bits_set").cast("long").alias("n_bits_set"),
        F.col("n_probe").cast("long").alias("n_probe"),
        F.col("n_pass").cast("long").alias("n_pass"),
        F.col("n_true_members").cast("long").alias("n_true_members"),
        (F.col("n_pass") - F.col("n_true_members")).cast("long").alias("n_false_pos"),
        F.round(
            F.when(F.col("n_probe") == F.col("n_true_members"), F.lit(0.0)).otherwise(
                (F.col("n_pass") - F.col("n_true_members")).cast("double")
                / (F.col("n_probe") - F.col("n_true_members"))
            ),
            6,
        ).alias("false_pos_rate"),
    )


# --------------------------------------------------------------------------
# KMV overlap matrix — sketch-estimated vs exact cross-source overlap
# --------------------------------------------------------------------------

KMV_K = 64
KMV_SPACE = float(1 << 60)  # 15 hex digits of md5 = a 60-bit hash space
KMV_SALT = "kmv|"


def _kmv_oracle() -> str:
    return f"""
    WITH st AS (
      SELECT DISTINCT source, tok
      FROM (SELECT source, unnest(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS tok
            FROM documents)),
    hashed AS (
      SELECT source, tok,
             cast(concat('0x', substr(md5(concat('{KMV_SALT}', tok)), 1, 15)) as bigint) AS h
      FROM st),
    sk AS (
      SELECT source, h FROM (
        SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn
        FROM hashed) WHERE rn <= {KMV_K}),
    kth AS (SELECT source, max(h) AS hk, count(*) AS nk FROM sk GROUP BY source),
    pairs AS (
      SELECT a.source AS source_a, b.source AS source_b
      FROM (SELECT DISTINCT source FROM st) a
      JOIN (SELECT DISTINCT source FROM st) b ON a.source < b.source),
    usk_in AS (
      SELECT DISTINCT p.source_a, p.source_b, u.h
      FROM pairs p JOIN sk u ON u.source IN (p.source_a, p.source_b)),
    usk AS (
      SELECT source_a, source_b, h FROM (
        SELECT source_a, source_b, h,
               row_number() OVER (PARTITION BY source_a, source_b ORDER BY h) AS rn
        FROM usk_in) q WHERE rn <= {KMV_K}),
    ukth AS (
      SELECT source_a, source_b, max(h) AS hk
      FROM usk GROUP BY source_a, source_b),
    exact AS (
      SELECT p.source_a, p.source_b,
             (SELECT count(*) FROM st WHERE source = p.source_a) AS na,
             (SELECT count(*) FROM st WHERE source = p.source_b) AS nb,
             (SELECT count(*) FROM st x JOIN st y
               ON x.tok = y.tok AND x.source = p.source_a AND y.source = p.source_b) AS ni
      FROM pairs p)
    SELECT e.source_a, e.source_b,
           cast(e.na + e.nb - e.ni as bigint) AS n_exact_union,
           cast(e.ni as bigint) AS n_exact_inter,
           round(e.ni::double / (e.na + e.nb - e.ni), 6) AS exact_jaccard,
           round(({KMV_K} - 1) * {KMV_SPACE} / u.hk, 4) AS est_union,
           round(((({KMV_K} - 1) * {KMV_SPACE} / ka.hk)
                  + (({KMV_K} - 1) * {KMV_SPACE} / kb.hk)
                  - (({KMV_K} - 1) * {KMV_SPACE} / u.hk))
                 / (({KMV_K} - 1) * {KMV_SPACE} / u.hk), 6) AS est_jaccard
    FROM exact e
    JOIN ukth u ON u.source_a = e.source_a AND u.source_b = e.source_b
    JOIN kth ka ON ka.source = e.source_a
    JOIN kth kb ON kb.source = e.source_b
    """


@query("kmv_overlap_matrix", _kmv_oracle())
def kmv_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source vocabulary overlap, twice: exactly (distinct-token
    set algebra — the O(|vocab|) shuffle you can afford at test scale)
    and from {KMV_K}-minimum-values sketches (Bar-Yossef et al.): the
    kth smallest 60-bit hash estimates distinct counts as (k-1)*2^60/h_k,
    and KMV sketches UNION losslessly (merge, keep k smallest), so one
    tiny per-source sketch answers every pairwise union/Jaccard. The
    audit pins estimate vs exact side-by-side — the justification table
    for replacing the exact join with sketches at 100 TB, where each
    source's sketch is {KMV_K} longs regardless of corpus size.

    Shape: per-source/per-pair top-k run through ``grouped_top_k``
    (sources are a LOW-cardinality key — a plain partitionBy window
    would funnel the token stream into ~5 tasks)."""
    from ..operators.scale import grouped_top_k

    d = load(spark, sf_dir, "documents")
    st = (
        d.select(
            "source",
            F.explode(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_PATTERN), F.lit(0))
            ).alias("tok"),
        )
        .distinct()
    )
    hashed = st.select(
        "source",
        "tok",
        F.conv(F.substring(F.md5(F.concat(F.lit(KMV_SALT), F.col("tok"))), 1, 15), 16, 10)
        .cast("long")
        .alias("h"),
    )
    sk = grouped_top_k(hashed.select("source", "h"), ["source"], ["h"], KMV_K).drop("rn")
    kth = sk.groupBy("source").agg(F.max("h").alias("hk"))
    srcs = st.select("source").distinct()
    pairs = (
        srcs.select(F.col("source").alias("source_a"))
        .crossJoin(srcs.select(F.col("source").alias("source_b")))
        .where(F.col("source_a") < F.col("source_b"))
    )
    usk_in = (
        sk.select(F.col("source").alias("_s"), "h")
        .join(
            F.broadcast(pairs),
            (F.col("_s") == F.col("source_a")) | (F.col("_s") == F.col("source_b")),
        )
        .select("source_a", "source_b", "h")
        .distinct()
    )
    usk = grouped_top_k(usk_in, ["source_a", "source_b"], ["h"], KMV_K).drop("rn")
    ukth = usk.groupBy("source_a", "source_b").agg(F.max("h").alias("uhk"))
    per_src = st.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        st.select(F.col("source").alias("source_a"), "tok")
        .join(st.select(F.col("source").alias("source_b"), "tok"), "tok")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("ni"))
    )
    est = lambda hk: (KMV_K - 1) * F.lit(KMV_SPACE) / hk  # noqa: E731
    out = (
        pairs.join(inter, ["source_a", "source_b"], "left")
        .join(per_src.select(F.col("source").alias("source_a"), F.col("n").alias("na")), "source_a")
        .join(per_src.select(F.col("source").alias("source_b"), F.col("n").alias("nb")), "source_b")
        .join(ukth, ["source_a", "source_b"])
        .join(kth.select(F.col("source").alias("source_a"), F.col("hk").alias("hka")), "source_a")
        .join(kth.select(F.col("source").alias("source_b"), F.col("hk").alias("hkb")), "source_b")
        .withColumn("ni", F.coalesce(F.col("ni"), F.lit(0)))
    )
    return out.select(
        "source_a",
        "source_b",
        (F.col("na") + F.col("nb") - F.col("ni")).cast("long").alias("n_exact_union"),
        F.col("ni").cast("long").alias("n_exact_inter"),
        F.round(F.col("ni").cast("double") / (F.col("na") + F.col("nb") - F.col("ni")), 6).alias(
            "exact_jaccard"
        ),
        F.round(est(F.col("uhk")), 4).alias("est_union"),
        F.round(
            (est(F.col("hka")) + est(F.col("hkb")) - est(F.col("uhk"))) / est(F.col("uhk")), 6
        ).alias("est_jaccard"),
    )


# --------------------------------------------------------------------------
# k-anonymity audit — quasi-identifier group-size risk
# --------------------------------------------------------------------------

KA_BAND = 1000.0  # acctbal band width for the quasi-identifier


@query(
    "k_anonymity_audit",
    f"""
    WITH qi AS (
      SELECT c_nationkey, c_mktsegment,
             cast(floor(c_acctbal / {KA_BAND}) as bigint) AS bal_band
      FROM customer),
    grp AS (
      SELECT c_nationkey, c_mktsegment, bal_band, count(*) AS sz
      FROM qi GROUP BY ALL)
    SELECT cast(sum(sz) as bigint) AS n_rows,
           cast(count(*) as bigint) AS n_groups,
           cast(min(sz) as bigint) AS min_group_size,
           cast(max(sz) as bigint) AS max_group_size,
           cast(sum(CASE WHEN sz < 2 THEN sz ELSE 0 END) as bigint) AS n_rows_unique,
           cast(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) as bigint) AS n_rows_below_k5,
           round(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END)::double / sum(sz), 6)
             AS frac_at_risk_k5
    FROM grp
    """,
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity over the (nation, segment, balance-band) quasi-
    identifier (Sweeney's re-identification model): group sizes, the
    minimum k the table actually achieves, and how many rows sit in
    groups smaller than k=5 — the privacy gate a training-data release
    runs before shipping anything row-level. Two partial-aggregable
    groupBys; the QI banding is a pure projection, so the whole audit
    is one shuffle on the QI key at any scale."""
    c = load(spark, sf_dir, "customer")
    qi = c.select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / KA_BAND).cast("long").alias("bal_band"),
    )
    grp = qi.groupBy("c_nationkey", "c_mktsegment", "bal_band").agg(
        F.count(F.lit(1)).alias("sz")
    )
    return grp.agg(
        F.sum("sz").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.min("sz").cast("long").alias("min_group_size"),
        F.max("sz").cast("long").alias("max_group_size"),
        F.sum(F.when(F.col("sz") < 2, F.col("sz")).otherwise(0)).cast("long").alias("n_rows_unique"),
        F.sum(F.when(F.col("sz") < 5, F.col("sz")).otherwise(0)).cast("long").alias("n_rows_below_k5"),
        F.round(
            F.sum(F.when(F.col("sz") < 5, F.col("sz")).otherwise(0)).cast("double") / F.sum("sz"),
            6,
        ).alias("frac_at_risk_k5"),
    )


# --------------------------------------------------------------------------
# Irregular time-series & attribution analytics over events
# --------------------------------------------------------------------------


@query(
    "time_weighted_user_value",
    """
    WITH iv AS (
      SELECT user_id, value,
             date_diff('second', ts,
                       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS dt
      FROM events)
    SELECT user_id,
           cast(count(*) as bigint) AS n_intervals,
           cast(sum(dt) as bigint) AS total_secs,
           round(cast(sum(cast(value as decimal(18,6)) * dt) as double) / sum(dt), 6)
             AS twa_value
    FROM iv WHERE dt IS NOT NULL AND dt > 0
    GROUP BY user_id
    """,
)
def time_weighted_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-weighted average value per user — each reading holds until
    the next one, so it is weighted by its interval length, the correct
    mean for irregularly-sampled gauges (row-weighted means over-count
    burst periods). Zero-length intervals carry no weight and drop out.

    Shape: one lead() window on the HIGH-cardinality user_id key, then
    a partial-aggregable groupBy. The value*dt products accumulate as
    exact decimals so both engines emit bit-identical doubles."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    iv = ev.select(
        "user_id",
        "value",
        (F.unix_timestamp(F.lead("ts").over(w)) - F.unix_timestamp("ts")).alias("dt"),
    ).where(F.col("dt").isNotNull() & (F.col("dt") > 0))
    return iv.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_intervals"),
        F.sum("dt").cast("long").alias("total_secs"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)") * F.col("dt")).cast("double")
            / F.sum("dt"),
            6,
        ).alias("twa_value"),
    )


GAP_THRESHOLDS_S = (60, 300, 600, 1800, 3600)


@query(
    "session_gap_survival",
    f"""
    WITH gaps AS (
      SELECT date_diff('second',
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) AS gap_s
      FROM events)
    SELECT t.threshold_s,
           cast(count(*) as bigint) AS n_gaps,
           cast(sum(CASE WHEN gap_s > t.threshold_s THEN 1 ELSE 0 END) as bigint) AS n_exceed,
           round(sum(CASE WHEN gap_s > t.threshold_s THEN 1 ELSE 0 END)::double / count(*), 6)
             AS survival
    FROM gaps CROSS JOIN (VALUES {", ".join(f"({t})" for t in GAP_THRESHOLDS_S)}) t(threshold_s)
    WHERE gap_s IS NOT NULL
    GROUP BY t.threshold_s
    """,
)
def session_gap_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survival curve of inter-event gaps — P(gap > t) at candidate
    session-timeout thresholds. This is the evidence behind the 10-min
    gap every sessionize query in this repo uses: pick the threshold
    where the curve flattens (real session boundaries) instead of the
    steep head (within-session pauses). One lag() window on user_id,
    then a broadcast 5-row threshold table and a partial-aggregable
    conditional count — the 5x row fan-out happens map-side."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))).alias("gap_s")
    ).where(F.col("gap_s").isNotNull())
    thresholds = F.broadcast(
        load(spark, sf_dir, "events")
        .sparkSession.createDataFrame(
            [(t,) for t in GAP_THRESHOLDS_S], "threshold_s int"
        )
    )
    return gaps.crossJoin(thresholds).groupBy("threshold_s").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum((F.col("gap_s") > F.col("threshold_s")).cast("int")).cast("long").alias("n_exceed"),
        F.round(
            F.sum((F.col("gap_s") > F.col("threshold_s")).cast("int")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("survival"),
    )


MAD_CUT = 4.4478  # 3 * 1.4826 (the normal-consistency constant), one literal


@query(
    "robust_outlier_audit",
    f"""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type),
    dev AS (
      SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS adev
      FROM events e JOIN med m USING (event_type)),
    mad AS (
      SELECT event_type, quantile_cont(adev, 0.5) AS mad
      FROM dev GROUP BY event_type)
    SELECT d.event_type,
           cast(count(*) as bigint) AS n,
           round(any_value(d.med), 6) AS median_value,
           round(any_value(m.mad), 6) AS mad_value,
           cast(sum(CASE WHEN d.adev > {MAD_CUT} * m.mad THEN 1 ELSE 0 END) as bigint)
             AS n_outliers,
           round(sum(CASE WHEN d.adev > {MAD_CUT} * m.mad THEN 1 ELSE 0 END)::double
                 / count(*), 6) AS outlier_rate
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type
    """,
)
def robust_outlier_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD outlier detection per event type — the robust
    alternative to mean/stddev z-scores (one fat-tailed burst inflates
    a stddev until nothing is an outlier; the median absolute deviation
    doesn't move). Flags |x - med| > 3·1.4826·MAD, the standard
    normal-consistent cut. Shape: two exact-percentile groupBys on the
    same low-cardinality key with broadcast joins back — no windows, no
    per-group sort concentration (percentile_cont aggregates
    per-group, it doesn't single-task the partition)."""
    ev = load(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY value)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY adev)").alias("mad")
    )
    d = dev.join(F.broadcast(mad), "event_type")
    out_flag = (F.col("adev") > F.lit(MAD_CUT) * F.col("mad")).cast("int")
    return d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.first("med"), 6).alias("median_value"),
        F.round(F.first("mad"), 6).alias("mad_value"),
        F.sum(out_flag).cast("long").alias("n_outliers"),
        F.round(F.sum(out_flag).cast("double") / F.count(F.lit(1)), 6).alias("outlier_rate"),
    )


ATTR_WINDOW_MIN = 30


@query(
    "events_attribution_last_touch",
    f"""
    WITH p AS (
      SELECT event_id AS purchase_id, user_id, ts AS p_ts
      FROM events WHERE event_type = 'purchase'),
    touch AS (
      SELECT purchase_id, event_type FROM (
        SELECT p.purchase_id, e.event_type,
               row_number() OVER (PARTITION BY p.purchase_id
                                  ORDER BY e.ts DESC, e.event_id DESC) AS rn
        FROM p JOIN events e
          ON e.user_id = p.user_id AND e.event_type <> 'purchase'
         AND e.ts < p.p_ts AND e.ts >= p.p_ts - INTERVAL {ATTR_WINDOW_MIN} MINUTE
      ) q WHERE rn = 1),
    attributed AS (
      SELECT p.purchase_id, coalesce(t.event_type, 'direct') AS attributed_type
      FROM p LEFT JOIN touch t USING (purchase_id))
    SELECT attributed_type,
           cast(count(*) as bigint) AS n_purchases,
           round(count(*)::double / (SELECT count(*) FROM p), 6) AS share
    FROM attributed GROUP BY attributed_type
    """,
)
def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch conversion attribution: each purchase credits the
    most recent non-purchase event by the same user inside a
    {ATTR_WINDOW_MIN}-minute lookback, else 'direct'. The
    marketing-analytics shape behind every as-of join in this repo —
    here the argmax-per-purchase is a partial-aggregable
    max(struct(ts, event_id, type)), never a window over the raw join
    fan-out, and the time bound keeps the per-user join quadratic only
    within the lookback, which is what makes it tractable at 100 TB."""
    ev = load(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    cand = p.join(
        ev.select("user_id", "event_type", "ts", "event_id"),
        (F.col("user_id") == F.col("p_user"))
        & (F.col("event_type") != "purchase")
        & (F.col("ts") < F.col("p_ts"))
        & (F.col("ts") >= F.col("p_ts") - F.expr(f"INTERVAL {ATTR_WINDOW_MIN} MINUTES")),
    )
    touch = cand.groupBy("purchase_id").agg(
        F.max(F.struct("ts", "event_id", F.col("event_type").alias("et"))).alias("m")
    ).select("purchase_id", F.col("m.et").alias("touch_type"))
    attributed = p.join(touch, "purchase_id", "left").select(
        "purchase_id", F.coalesce(F.col("touch_type"), F.lit("direct")).alias("attributed_type")
    )
    total = p.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        attributed.groupBy("attributed_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(F.broadcast(total))
        .select(
            "attributed_type",
            F.col("n").cast("long").alias("n_purchases"),
            F.round(F.col("n").cast("double") / F.col("n_total"), 6).alias("share"),
        )
    )
