"""Statistical quality gates + training-set assembly (round 7).

The reference's verification discipline (CuratorClient.java:660-853:
re-read what you wrote and CHECK it) applied to the statistics a
training-data pipeline runs before it trusts a corpus: distributional
audits (Benford, KS drift, PSI), robust summaries (winsorized/trimmed
means), resampled uncertainty (deterministic bootstrap, split-conformal
coverage), model-side diagnostics (decision-tree splits at depth 1 and
2, calibration error), Pareto frontiers, leakage-free point-in-time
feature assembly, zero-coordination coherent cross-table sampling, and
first-occurrence n-gram novelty.

House rules (same as every operator module):
- every number that reaches the output is integer fixed-point, so no
  floating summation order can flip the driver's value hash;
- every per-row expression is a JVM built-in (zero Python UDFs);
- the heavy relation is always collapsed FIRST (value histogram, day
  rollup, digit census) and windows/joins run over the collapsed,
  value-domain-bounded relation — the calendar/domain-bounded-relation
  discipline from ts_theilsen_trend/ts_ewma.

Scale notes per operator are on the docstrings; the module-wide shape:
one partial-agged scan into a domain-sized relation, then constant or
domain-bounded post-processing. No operator here shuffles the corpus
twice.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from curatorhadoopinterface_spark.operators import query
from curatorhadoopinterface_spark.session import ensure_min_partitions, load_table

# --------------------------------------------------------------------------
# shared fixed-point constants (identical literals reach both engines)
# --------------------------------------------------------------------------

# Benford first-digit expectation, floor(log10(1+1/d) * 1e6)
_BENFORD_PPM = {d: math.floor(math.log10(1 + 1 / d) * 1_000_000) for d in range(1, 10)}

# Poisson(1) inverse-CDF thresholds on a 1e8 uniform grid:
# floor(P(X<=k) * 1e8) for k = 0..5; u >= the last threshold draws 6.
_POISSON_CUM_1E8 = (36787944, 73575888, 91969860, 98101184, 99634015, 99940581)
_BOOT_B = 32  # bootstrap replicas

_CENTS = "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)"


def _poisson_case(u: str) -> str:
    """CASE expr mapping a 0..1e8 uniform to a Poisson(1) draw — same
    SQL text in both dialects."""
    clauses = " ".join(
        f"WHEN {u} < {t} THEN {k}" for k, t in enumerate(_POISSON_CUM_1E8)
    )
    return f"CASE {clauses} ELSE 6 END"


# --------------------------------------------------------------------------
# skyline_pareto: 2-D dominance frontier without a pairwise join
# --------------------------------------------------------------------------
@query(
    "skyline_pareto",
    oracle="""
    WITH base AS (
        SELECT p_partkey,
               CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT) AS price_cents,
               CAST(p_size AS BIGINT) AS size_v
        FROM part),
    lvl AS (
        SELECT price_cents, MAX(size_v) AS lvl_max
        FROM base GROUP BY price_cents),
    fr AS (
        SELECT price_cents, lvl_max,
               MAX(lvl_max) OVER (ORDER BY price_cents
                   RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS cheaper_max
        FROM lvl),
    frontier AS (
        SELECT price_cents, lvl_max FROM fr
        WHERE cheaper_max IS NULL OR cheaper_max < lvl_max)
    SELECT b.p_partkey, b.price_cents, b.size_v
    FROM base b JOIN frontier f
      ON b.price_cents = f.price_cents AND b.size_v = f.lvl_max
    ORDER BY b.price_cents, b.p_partkey
    """,
)
def skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D SKYLINE (Pareto frontier) of parts: minimize price, maximize
    size — every part not dominated by a cheaper-or-equal, at-least-
    as-large rival (a strict improvement on at least one axis). The
    multi-objective shortlist query (Borzsony/Kossmann skyline) that a
    naive engine writes as a quadratic NOT EXISTS self-join.

    Exactness: prices quantize to integer cents first; dominance and
    the frontier test are pure integer comparisons. Ties — several
    parts sharing a frontier (price, size) point — are all emitted
    (none strictly dominates another), which the equality join back
    to base reproduces deterministically.

    Scale shape: the corpus collapses to the per-price-level max-size
    relation FIRST (one partial-agged groupBy — map-side combine does
    the heavy lifting); the running-max frontier window runs over
    DISTINCT price levels only, bounded by the price domain, not the
    row count; the frontier itself (monotone staircase, <= |size
    domain| points) broadcasts back onto the base scan. No pairwise
    dominance join at any size."""
    p = load_table(spark, sf_dir, "part")
    base = p.select(
        "p_partkey",
        F.floor(F.col("p_retailprice") * 100 + 0.5).cast("bigint").alias("price_cents"),
        F.col("p_size").cast("bigint").alias("size_v"),
    )
    lvl = base.groupBy("price_cents").agg(F.max("size_v").alias("lvl_max"))
    w = Window.orderBy("price_cents").rangeBetween(Window.unboundedPreceding, -1)
    frontier = (
        lvl.withColumn("cheaper_max", F.max("lvl_max").over(w))
        .where(F.col("cheaper_max").isNull() | (F.col("cheaper_max") < F.col("lvl_max")))
        .select("price_cents", F.col("lvl_max").alias("size_v"))
    )
    return (
        base.join(F.broadcast(frontier), ["price_cents", "size_v"])
        .select("p_partkey", "price_cents", "size_v")
        .orderBy("price_cents", "p_partkey")
    )


# --------------------------------------------------------------------------
# benford_digit_audit: first-significant-digit distribution audit
# --------------------------------------------------------------------------
_BENFORD_CASE = (
    "CASE "
    + " ".join(f"WHEN digit = {d} THEN {p}" for d, p in _BENFORD_PPM.items())
    + " END"
)


@query(
    "benford_digit_audit",
    oracle=f"""
    WITH digits AS (
        SELECT CAST(SUBSTR(CAST({_CENTS} AS VARCHAR), 1, 1) AS INTEGER)
                   AS digit
        FROM orders),
    census AS (
        SELECT digit, COUNT(*) AS n FROM digits GROUP BY digit)
    SELECT digit, n,
           n * 1000000 // SUM(n) OVER () AS obs_ppm,
           {_BENFORD_CASE} AS exp_ppm,
           ABS(n * 1000000 // SUM(n) OVER () - ({_BENFORD_CASE}))
               AS dev_ppm
    FROM census ORDER BY digit
    """,
)
def benford_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BENFORD first-significant-digit audit over order totals: the
    classic forgery/synthetic-data detector (fabricated numbers are
    uniform-ish in the leading digit; organically-grown magnitudes
    follow log10(1+1/d)). Emits the 9-digit census with observed vs
    expected shares and the absolute deviation, all in integer ppm.

    Exactness: the digit comes from the decimal string of integer
    cents (no log/pow floats); expected shares are shared fixed-point
    constants (floor(log10(1+1/d)*1e6) — module header) interpolated
    into BOTH dialects from the same dict.

    Scale shape: one scan, map-side partial agg into <= 9 groups; the
    share window runs over the 9-row census. Constant exchange at any
    corpus size."""
    o = load_table(spark, sf_dir, "orders")
    census = (
        o.select(
            F.substring(
                F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").cast("string"),
                1,
                1,
            )
            .cast("int")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    census = census.withColumn("tot_n", F.sum("n").over(Window.partitionBy()))
    return (
        census.select(
            "digit",
            "n",
            F.expr("n * 1000000 div tot_n").alias("obs_ppm"),
            F.expr(_BENFORD_CASE).alias("exp_ppm"),
            F.expr(f"abs(n * 1000000 div tot_n - ({_BENFORD_CASE}))").alias("dev_ppm"),
        )
        .orderBy("digit")
    )


# --------------------------------------------------------------------------
# stats_bootstrap_ci: deterministic Poisson bootstrap
# --------------------------------------------------------------------------
def _boot_u(dialect: str) -> str:
    """0..1e8 uniform from md5(orderkey '#' replica) — the module's
    shared cross-engine hash recipe (12 hex chars = 48 bits, modulo
    bias < 4e-7)."""
    if dialect == "spark":
        return (
            "pmod(cast(conv(substring(md5(concat(cast(o_orderkey as string),"
            " '#', cast(b as string))), 1, 12), 16, 10) as bigint), 100000000)"
        )
    return (
        "CAST(CONCAT('0x', SUBSTR(MD5(CONCAT(CAST(o_orderkey AS VARCHAR),"
        " '#', CAST(b AS VARCHAR))), 1, 12)) AS BIGINT) % 100000000"
    )


@query(
    "stats_bootstrap_ci",
    oracle=f"""
    WITH base AS (
        SELECT o_orderkey, {_CENTS} AS cents FROM orders),
    rep AS (
        SELECT o_orderkey, cents, b
        FROM base CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, {_BOOT_B - 1}))
                              AS b) reps),
    weighted AS (
        SELECT b, {_poisson_case(_boot_u("duckdb"))} AS w, cents FROM rep),
    replica AS (
        SELECT b, SUM(w * cents) AS wc, SUM(w) AS wn
        FROM weighted GROUP BY b),
    means AS (
        SELECT b, wc * 100 // wn AS mean_centi,
               ROW_NUMBER() OVER (ORDER BY wc * 100 // wn, b) AS rk
        FROM replica),
    boot AS (
        SELECT MIN(CASE WHEN rk = 2 THEN mean_centi END) AS boot_lo_centi,
               MAX(CASE WHEN rk = {_BOOT_B - 1} THEN mean_centi END)
                   AS boot_hi_centi,
               MIN(mean_centi) AS boot_min_centi,
               MAX(mean_centi) AS boot_max_centi
        FROM means),
    pt AS (
        SELECT COUNT(*) AS n_orders,
               SUM(cents) * 100 // COUNT(*) AS point_mean_centi
        FROM base)
    SELECT p.n_orders, p.point_mean_centi, {_BOOT_B} AS n_replicas,
           b.boot_lo_centi, b.boot_hi_centi, b.boot_min_centi,
           b.boot_max_centi
    FROM pt p CROSS JOIN boot b
    """,
)
def stats_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic POISSON BOOTSTRAP confidence interval for the mean
    order total: each of the 32 replicas reweights every order by a
    Poisson(1) draw (the streaming-safe bootstrap of Chamandy et al. —
    resampling without materializing resamples), and the replica-mean
    order statistics give the interval. The uncertainty quantification
    every data-quality dashboard should attach to its point estimates.

    Exactness: the per-(order, replica) draw is md5-derived (module
    recipe) against shared integer CDF thresholds, so both engines
    produce the IDENTICAL replica weighting; replica means are integer
    centi-cents via integer division; the interval is an order-statistic
    pick (ranks 2 and B-1 of 32 — a ~94% interval), not a float
    quantile interpolation.

    Scale shape: the replica explode is a constant 32x map-side
    multiply that partial-aggregates into exactly 32 groups before the
    exchange — the shuffle carries 32 rows regardless of corpus size;
    the rank pass runs over 32 rows. One scan, constant exchange.
    The scan is spread over the cores before the 32x explode
    (ensure_min_partitions — plan-side, no-op at scale): the md5 chain
    is the per-row cost and a single-split local scan serializes it
    (r9 measured: 4.4 s single-task -> ~0.9 s)."""
    o = ensure_min_partitions(
        load_table(spark, sf_dir, "orders").select(
            "o_orderkey",
            F.floor(F.col("o_totalprice") * 100 + 0.5)
            .cast("bigint")
            .alias("cents"),
        )
    )
    rep = o.select(
        "o_orderkey",
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b"),
    ).withColumn("w", F.expr(_poisson_case(_boot_u("spark"))))
    replica = rep.groupBy("b").agg(
        F.sum(F.expr("w * cents")).alias("wc"), F.sum("w").alias("wn")
    )
    means = replica.select(
        "b", F.expr("wc * 100 div wn").alias("mean_centi")
    ).withColumn(
        "rk", F.row_number().over(Window.orderBy("mean_centi", "b"))
    )
    boot = means.agg(
        F.min(F.when(F.col("rk") == 2, F.col("mean_centi"))).alias("boot_lo_centi"),
        F.max(
            F.when(F.col("rk") == _BOOT_B - 1, F.col("mean_centi"))
        ).alias("boot_hi_centi"),
        F.min("mean_centi").alias("boot_min_centi"),
        F.max("mean_centi").alias("boot_max_centi"),
    )
    pt = o.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.expr("sum(cents) * 100 div count(1)").alias("point_mean_centi"),
    )
    return pt.crossJoin(F.broadcast(boot)).select(
        "n_orders",
        "point_mean_centi",
        F.lit(_BOOT_B).alias("n_replicas"),
        "boot_lo_centi",
        "boot_hi_centi",
        "boot_min_centi",
        "boot_max_centi",
    )


# --------------------------------------------------------------------------
# winsorize_stats: robust per-group means from a value histogram
# --------------------------------------------------------------------------
@query(
    "winsorize_stats",
    oracle="""
    WITH hist AS (
        SELECT l_returnflag AS flag,
               CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
               COUNT(*) AS cnt
        FROM lineitem GROUP BY flag, cents),
    cum AS (
        SELECT flag, cents, cnt,
               SUM(cnt) OVER (PARTITION BY flag ORDER BY cents) AS cum,
               SUM(cnt) OVER (PARTITION BY flag) AS n
        FROM hist),
    ranks AS (
        SELECT *, (n + 19) // 20 AS lo_rank, (19 * n + 19) // 20 AS hi_rank
        FROM cum),
    thresholds AS (
        SELECT flag,
               MIN(CASE WHEN cum >= lo_rank THEN cents END) AS lo_val,
               MIN(CASE WHEN cum >= hi_rank THEN cents END) AS hi_val
        FROM ranks GROUP BY flag),
    joined AS (
        SELECT r.*, t.lo_val, t.hi_val,
               GREATEST(0, LEAST(r.cum, r.hi_rank)
                   - GREATEST(r.cum - r.cnt + 1, r.lo_rank) + 1) AS inc
        FROM ranks r JOIN thresholds t ON r.flag = t.flag)
    SELECT flag, MAX(n) AS n, MAX(lo_val) AS lo_val_cents,
           MAX(hi_val) AS hi_val_cents,
           SUM(LEAST(GREATEST(cents, lo_val), hi_val) * cnt) * 100 // MAX(n)
               AS winsor_mean_centi,
           SUM(inc) AS trim_n,
           SUM(cents * inc) * 100 // SUM(inc) AS trim_mean_centi
    FROM joined GROUP BY flag ORDER BY flag
    """,
)
def winsorize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WINSORIZED and TRIMMED means per return flag at the 5th/95th
    percentiles — the robust location estimates a telemetry pipeline
    trusts when agg_zscore_outlier says the tails are contaminated.
    Winsorizing clamps to the percentile values; trimming drops the
    tail ranks entirely (boundary values partially, by exact rank
    overlap).

    Exactness: percentile thresholds are discrete order statistics
    (value at rank ceil(p*n) — no interpolation), computed from the
    cumulative value histogram; the trimmed inclusion count per value
    is the exact integer overlap of [cum-cnt+1, cum] with [lo_rank,
    hi_rank], so boundary ties resolve identically in both engines;
    means are integer centi-cents.

    Scale shape: the corpus collapses FIRST to the (flag, cents) value
    histogram — one partial-agged exchange bounded by the VALUE DOMAIN
    (price range x 3 flags), not the row count; every window and the
    3-row threshold join run over that domain-sized relation. The
    same discipline as ts_theilsen_trend's calendar-bounded pairs:
    never sort the corpus when the domain is smaller."""
    li = load_table(spark, sf_dir, "lineitem")
    hist = (
        li.select(
            F.col("l_returnflag").alias("flag"),
            F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("bigint").alias("cents"),
        )
        .groupBy("flag", "cents")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wc = Window.partitionBy("flag").orderBy("cents")
    wn = Window.partitionBy("flag")
    ranks = (
        hist.withColumn("cum", F.sum("cnt").over(wc))
        .withColumn("n", F.sum("cnt").over(wn))
        .withColumn("lo_rank", F.expr("(n + 19) div 20"))
        .withColumn("hi_rank", F.expr("(19 * n + 19) div 20"))
    )
    # r9: thresholds as WINDOW aggregates over the flag partition the
    # ranks already occupy, not a groupBy + broadcast join back — the
    # old two-branch shape re-executed the hist+window subtree once per
    # consumer (the multi-consumer disease) and added a join; the
    # min-over-partition window computes the identical per-flag value
    # on the same exchange. A/B sf0.1: 2.32 -> 1.94 s min-of-4, values
    # identical.
    joined = (
        ranks.withColumn(
            "lo_val",
            F.min(
                F.when(F.col("cum") >= F.col("lo_rank"), F.col("cents"))
            ).over(wn),
        )
        .withColumn(
            "hi_val",
            F.min(
                F.when(F.col("cum") >= F.col("hi_rank"), F.col("cents"))
            ).over(wn),
        )
        .withColumn(
            "inc",
            F.expr(
                "greatest(0, least(cum, hi_rank)"
                " - greatest(cum - cnt + 1, lo_rank) + 1)"
            ),
        )
    )
    return (
        joined.groupBy("flag")
        .agg(
            F.max("n").alias("n"),
            F.max("lo_val").alias("lo_val_cents"),
            F.max("hi_val").alias("hi_val_cents"),
            F.expr(
                "sum(least(greatest(cents, lo_val), hi_val) * cnt) * 100"
                " div max(n)"
            ).alias("winsor_mean_centi"),
            F.sum("inc").alias("trim_n"),
            F.expr("sum(cents * inc) * 100 div sum(inc)").alias("trim_mean_centi"),
        )
        .orderBy("flag")
    )


# --------------------------------------------------------------------------
# drift_ks_test: exact two-sample Kolmogorov-Smirnov distance
# --------------------------------------------------------------------------
@query(
    "drift_ks_test",
    oracle="""
    WITH tagged AS (
        SELECT n_chars AS v, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS s1
        FROM documents),
    hist AS (
        SELECT v, SUM(s1) AS c1, SUM(1 - s1) AS c2
        FROM tagged GROUP BY v),
    cdf AS (
        SELECT v,
               SUM(c1) OVER (ORDER BY v) AS cum1,
               SUM(c2) OVER (ORDER BY v) AS cum2,
               SUM(c1) OVER () AS n1, SUM(c2) OVER () AS n2
        FROM hist)
    SELECT MAX(n1) AS n1, MAX(n2) AS n2,
           MAX(ABS(cum1 * n2 - cum2 * n1)) AS d_num,
           MAX(ABS(cum1 * n2 - cum2 * n1)) * 1000000 // (MAX(n1) * MAX(n2))
               AS d_ppm
    FROM cdf
    """,
)
def drift_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample KOLMOGOROV-SMIRNOV distance between the
    document-length distributions of English vs non-English docs —
    the distribution-drift gate (did this ingest batch change shape?)
    that emb_drift runs in embedding space, here on a scalar feature
    with the EXACT sup-norm, not a binned approximation.

    Exactness: the KS statistic sup|F1 - F2| is evaluated in
    cross-multiplied integers — |cum1*n2 - cum2*n1| — so there is no
    float CDF anywhere; d_ppm quantizes once at the end by integer
    division. Evaluating at every distinct value is exact: the sup of
    a pair of step functions is attained at a step.

    Scale shape: corpus -> (value) histogram with both sample counts
    in one partial-agged pass (no join between the samples); the CDF
    window runs over DISTINCT values only — bounded by the length
    domain, not the corpus. One exchange, domain-sized tail."""
    d = load_table(spark, sf_dir, "documents")
    hist = (
        d.select(
            F.col("n_chars").alias("v"),
            F.when(F.col("lang") == "en", 1).otherwise(0).alias("s1"),
        )
        .groupBy("v")
        .agg(F.sum("s1").alias("c1"), F.sum(F.expr("1 - s1")).alias("c2"))
    )
    wv = Window.orderBy("v")
    wall = Window.partitionBy()
    cdf = (
        hist.withColumn("cum1", F.sum("c1").over(wv))
        .withColumn("cum2", F.sum("c2").over(wv))
        .withColumn("n1", F.sum("c1").over(wall))
        .withColumn("n2", F.sum("c2").over(wall))
    )
    return cdf.agg(
        F.max("n1").alias("n1"),
        F.max("n2").alias("n2"),
        F.max(F.expr("abs(cum1 * n2 - cum2 * n1)")).alias("d_num"),
        F.expr(
            "max(abs(cum1 * n2 - cum2 * n1)) * 1000000 div (max(n1) * max(n2))"
        ).alias("d_ppm"),
    )


# --------------------------------------------------------------------------
# ml_tree_split: exact 1-level decision-tree split finder
# --------------------------------------------------------------------------
_GINI_L = (
    "1000000000000 - (pl * 1000000 div l) * (pl * 1000000 div l)"
    " - ((l - pl) * 1000000 div l) * ((l - pl) * 1000000 div l)"
)
_GINI_R = (
    "1000000000000 - (pr * 1000000 div r) * (pr * 1000000 div r)"
    " - ((r - pr) * 1000000 div r) * ((r - pr) * 1000000 div r)"
)


@query(
    "ml_tree_split",
    oracle=f"""
    WITH hist AS (
        SELECT CAST(l_quantity AS BIGINT) AS thr,
               COUNT(*) AS cnt,
               SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS pos
        FROM lineitem GROUP BY thr),
    cum AS (
        SELECT thr,
               SUM(cnt) OVER (ORDER BY thr) AS l,
               SUM(pos) OVER (ORDER BY thr) AS pl,
               SUM(cnt) OVER () AS t, SUM(pos) OVER () AS p
        FROM hist),
    split AS (
        SELECT thr, l, t - l AS r, pl, p - pl AS pr, t, p
        FROM cum WHERE l < t),
    scored AS (
        SELECT thr, l AS n_left, r AS n_right,
               CAST((CAST(l AS HUGEINT) * ({_GINI_L.replace('div', '//')})
                   + CAST(r AS HUGEINT) * ({_GINI_R.replace('div', '//')}))
                   // t AS BIGINT) AS gini_split_e12,
               1000000000000 - (p * 1000000 // t) * (p * 1000000 // t)
                   - ((t - p) * 1000000 // t) * ((t - p) * 1000000 // t)
                   AS gini_base_e12
        FROM split),
    best AS (
        SELECT *, ROW_NUMBER() OVER (ORDER BY gini_split_e12, thr) AS rk
        FROM scored)
    SELECT thr, n_left, n_right, gini_base_e12, gini_split_e12,
           gini_base_e12 - gini_split_e12 AS gain_e12
    FROM best WHERE rk = 1
    """,
)
def ml_tree_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 1-level DECISION-TREE split finder: the quantity threshold
    that best separates returned lineitems (Gini impurity), i.e. the
    first node XGBoost/sklearn would grow — distributed the way MLlib
    does it (per-value label histogram, then a cumulative scan over
    candidate thresholds), but integer-exact end to end.

    Exactness: class proportions quantize to integer ppm BEFORE
    squaring (a shared, documented 1e-6 quantization — both engines
    floor identically, so the argmin cannot flip on float dust); the
    size-weighted combination runs in HUGEINT/DECIMAL(38) headroom
    (l * gini <= t * 1e12 — past BIGINT at ~9M rows, hence the wide
    intermediate) and divides back to an e12-scaled BIGINT. Tie-break
    on the threshold value makes the argmin injective.

    Scale shape: ONE partial-agged scan into the (value) label
    histogram — bounded by the feature's value domain (50 quantity
    levels), not the corpus; the cumulative windows and the argmin
    run over that domain-sized relation. The exchange carries |domain|
    rows at any corpus size."""
    li = load_table(spark, sf_dir, "lineitem")
    hist = (
        li.select(
            F.col("l_quantity").cast("bigint").alias("thr"),
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("is_pos"),
        )
        .groupBy("thr")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("is_pos").alias("pos"))
    )
    wv = Window.orderBy("thr")
    wall = Window.partitionBy()
    cum = (
        hist.withColumn("l", F.sum("cnt").over(wv))
        .withColumn("pl", F.sum("pos").over(wv))
        .withColumn("t", F.sum("cnt").over(wall))
        .withColumn("p", F.sum("pos").over(wall))
    )
    split = cum.where(F.col("l") < F.col("t")).select(
        "thr",
        "l",
        F.expr("t - l").alias("r"),
        "pl",
        F.expr("p - pl").alias("pr"),
        "t",
        "p",
    )
    scored = split.select(
        "thr",
        F.col("l").alias("n_left"),
        F.col("r").alias("n_right"),
        F.expr(
            f"cast((cast(l as decimal(38, 0)) * ({_GINI_L})"
            f" + cast(r as decimal(38, 0)) * ({_GINI_R})) div t as bigint)"
        ).alias("gini_split_e12"),
        F.expr(
            "1000000000000 - (p * 1000000 div t) * (p * 1000000 div t)"
            " - ((t - p) * 1000000 div t) * ((t - p) * 1000000 div t)"
        ).alias("gini_base_e12"),
    )
    best = scored.withColumn(
        "rk", F.row_number().over(Window.orderBy("gini_split_e12", "thr"))
    ).where(F.col("rk") == 1)
    return best.select(
        "thr",
        "n_left",
        "n_right",
        "gini_base_e12",
        "gini_split_e12",
        F.expr("gini_base_e12 - gini_split_e12").alias("gain_e12"),
    )


# --------------------------------------------------------------------------
# calibration_ece: reliability diagram + expected calibration error
# --------------------------------------------------------------------------
_ECE_RAMP_DAYS = 1460  # 4-year linear confidence ramp


@query(
    "calibration_ece",
    oracle=f"""
    WITH base AS (
        SELECT DATE_DIFF('day', DATE '1970-01-01', o_orderdate) AS day,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        FROM orders),
    anchor AS (SELECT MAX(day) AS maxd FROM base),
    scored AS (
        SELECT y, LEAST(999999, (a.maxd - b.day) * 1000000
                   // {_ECE_RAMP_DAYS}) AS pred_ppm
        FROM base b CROSS JOIN anchor a),
    census AS (
        SELECT pred_ppm // 100000 AS bin, COUNT(*) AS n,
               SUM(pred_ppm) // COUNT(*) AS conf_ppm,
               SUM(y) * 1000000 // COUNT(*) AS acc_ppm
        FROM scored GROUP BY bin)
    SELECT bin, n, conf_ppm, acc_ppm,
           ABS(conf_ppm - acc_ppm) AS gap_ppm,
           SUM(n * ABS(conf_ppm - acc_ppm)) OVER () // SUM(n) OVER ()
               AS ece_ppm
    FROM census ORDER BY bin
    """,
)
def calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RELIABILITY DIAGRAM + expected calibration error for a
    rule-based classifier: confidence that an order is finished
    (o_orderstatus = 'F') as a linear ramp in order AGE, binned into
    deciles and compared to the observed positive rate per bin — the
    ECE audit any learned quality/toxicity filter must pass before its
    scores gate a 100 TB corpus (a filter overconfident in its top
    decile silently biases everything it admits). On the synthetic
    corpus the status is drawn independently of the date, so the audit
    correctly reports the ramp as badly calibrated (ECE ~0.43) — the
    operator's job is the measurement, not a flattering verdict.

    Exactness: age is integer epoch-days against a 1-row max-date
    anchor; confidence is an integer-division ppm ramp (shared
    _ECE_RAMP_DAYS constant); per-bin confidence/accuracy and the
    n-weighted ECE are integer divisions — no float reaches the
    output.

    Scale shape: the anchor is a 1-row aggregate broadcast back onto
    the scan (the score_time_decay pattern — a deliberate broadcast
    BNLJ); per-row scoring is scan-local; one partial-agged exchange
    into <= 10 bins; the ECE window runs over the 10-row census.
    Constant exchange at any corpus size."""
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date"))
        .cast("bigint")
        .alias("day"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    anchor = base.agg(F.max("day").alias("maxd"))
    scored = base.crossJoin(F.broadcast(anchor)).select(
        "y",
        F.expr(
            f"least(999999, (maxd - day) * 1000000 div {_ECE_RAMP_DAYS})"
        ).alias("pred_ppm"),
    )
    census = scored.groupBy(F.expr("pred_ppm div 100000").alias("bin")).agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("sum(pred_ppm) div count(1)").alias("conf_ppm"),
        F.expr("sum(y) * 1000000 div count(1)").alias("acc_ppm"),
    )
    wall = Window.partitionBy()
    return (
        census.select(
            "bin",
            "n",
            "conf_ppm",
            "acc_ppm",
            F.expr("abs(conf_ppm - acc_ppm)").alias("gap_ppm"),
        )
        .withColumn("tot_w", F.sum(F.expr("n * gap_ppm")).over(wall))
        .withColumn("tot_n", F.sum("n").over(wall))
        .withColumn("ece_ppm", F.expr("tot_w div tot_n"))
        .drop("tot_w", "tot_n")
        .orderBy("bin")
    )


# --------------------------------------------------------------------------
# feature_pit_trailing: leakage-free point-in-time feature assembly
# --------------------------------------------------------------------------
@query(
    "feature_pit_trailing",
    oracle="""
    WITH base AS (
        SELECT o_orderkey, o_custkey,
               DATE_DIFF('day', DATE '1970-01-01', o_orderdate) AS day,
               CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        FROM orders),
    feats AS (
        SELECT o_orderkey, cents AS label_cents,
               COALESCE(SUM(cents) OVER (PARTITION BY o_custkey ORDER BY day
                   RANGE BETWEEN 90 PRECEDING AND 1 PRECEDING), 0)
                   AS trail_cents,
               COUNT(*) OVER (PARTITION BY o_custkey ORDER BY day
                   RANGE BETWEEN 90 PRECEDING AND 1 PRECEDING) AS trail_n
        FROM base)
    SELECT o_orderkey, trail_cents, trail_n, label_cents
    FROM feats ORDER BY trail_cents DESC, o_orderkey LIMIT 100
    """,
)
def feature_pit_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-IN-TIME training-set assembly: for every order, the
    customer's trailing-90-day spend and order count STRICTLY BEFORE
    the order date (RANGE 90 PRECEDING AND 1 PRECEDING), next to the
    label — the leakage-free as-of feature join every feature store
    exists to get right (a frame that included day 0 would leak the
    label into its own feature). Emits the top-100 rows by trailing
    spend as the audit sample.

    Exactness: days are integer epoch days, money is integer cents,
    and the strict-precedence frame is closed-form in both engines;
    the top-100 tie-breaks on the order key.

    Scale shape: ONE exchange hash-partitioned by customer, one
    per-customer sort shared by both window frames (same partition
    and ordering -> one Window node); the top-100 is TakeOrdered —
    per-partition heaps, no global sort. Range frames over integer
    days avoid the self-join a naive as-of assembly would run."""
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey",
        "o_custkey",
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")).alias(
            "day"
        ),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("cents"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day")
        .rangeBetween(-90, -1)
    )
    feats = base.select(
        "o_orderkey",
        F.col("cents").alias("label_cents"),
        F.coalesce(F.sum("cents").over(w), F.lit(0)).alias("trail_cents"),
        F.count(F.lit(1)).over(w).alias("trail_n"),
    )
    return (
        feats.select("o_orderkey", "trail_cents", "trail_n", "label_cents")
        .orderBy(F.desc("trail_cents"), "o_orderkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# text_ngram_novelty: first-occurrence shingle attribution
# --------------------------------------------------------------------------
_NOVEL_K = 5  # words per shingle


@query(
    "text_ngram_novelty",
    oracle=f"""
    WITH words AS (
        SELECT doc_id, source, STRING_SPLIT(text, ' ') AS w
        FROM documents),
    sh AS (
        SELECT doc_id, source,
               LIST_DISTINCT(LIST_TRANSFORM(
                   GENERATE_SERIES(1, LEN(w) - {_NOVEL_K - 1}),
                   i -> ARRAY_TO_STRING(LIST_SLICE(w, i, i + {_NOVEL_K - 1}),
                                        ' '))) AS sset
        FROM words WHERE LEN(w) >= {_NOVEL_K}),
    exploded AS (
        SELECT doc_id, UNNEST(sset) AS shingle FROM sh),
    firsts AS (
        SELECT shingle, MIN(doc_id) AS first_doc
        FROM exploded GROUP BY shingle),
    novel AS (
        SELECT first_doc AS doc_id, COUNT(*) AS n_novel
        FROM firsts GROUP BY first_doc),
    per_doc AS (
        SELECT s.doc_id, s.source, LEN(s.sset) AS n_sh,
               COALESCE(v.n_novel, 0) AS n_novel
        FROM sh s LEFT JOIN novel v ON s.doc_id = v.doc_id)
    SELECT source, COUNT(*) AS n_docs, SUM(n_sh) AS n_shingles,
           SUM(n_novel) AS n_novel,
           SUM(n_novel) * 1000000 // SUM(n_sh) AS novelty_ppm
    FROM per_doc GROUP BY source ORDER BY source
    """,
)
def text_ngram_novelty(
    spark: SparkSession, sf_dir: str, checkpoint: bool = True
) -> DataFrame:
    """N-GRAM NOVELTY scoring: per source, the share of distinct
    5-word shingles whose FIRST occurrence (min doc_id = ingest order)
    lands in that source's documents — the first-occurrence
    attribution used in memorization/contamination studies (novel
    text vs text already seen earlier in the corpus), and the
    curation signal for ordering dedup: low-novelty sources are
    re-serving content the corpus already has.

    Exactness: shingles are exact strings; first-occurrence is an
    integer MIN; the novelty share is integer ppm. Spark's sequence()
    is DESCENDING when stop < start, so short docs are excluded
    before shingling in both engines (LEN >= k guard).

    Scale shape: explode of per-doc DISTINCT shingles -> ONE
    partial-agged groupBy on the shingle (MIN combines map-side, so
    the stopword-shingle skew never concentrates raw rows on one
    reducer — the reason this is a groupBy, not a window); novel
    counts re-aggregate by first_doc (doc-sized), then a doc-sized
    equi join back to per-doc totals. The corpus text shuffles
    ONCE."""
    # spread the single-split documents scan before the shingle
    # transform+explode (CPU-dense per-row work; plan-side no-op at scale)
    d = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    words = d.select("doc_id", "source", F.split("text", " ").alias("w"))
    sh = words.where(F.size("w") >= _NOVEL_K).select(
        "doc_id",
        "source",
        F.array_distinct(
            F.expr(
                f"transform(sequence(1, size(w) - {_NOVEL_K - 1}),"
                f" i -> array_join(slice(w, i, {_NOVEL_K}), ' '))"
            )
        ).alias("sset"),
    )
    # r9: sh feeds TWO exchange consumers (the shingle-keyed firsts agg
    # and the per-doc totals join) and each exchange re-ran the
    # CPU-dense transform+array_distinct map stage. Persist the per-doc
    # shingle sets for the duration of the query (alternating A/B at
    # sf0.1: 4.65 -> 3.06 s min-of-4), eagerly checkpoint the 3-row
    # report, unpersist before return. checkpoint=False keeps the plan
    # fully lazy for plan audits.
    if checkpoint:
        sh = sh.persist()
    exploded = sh.select("doc_id", F.explode("sset").alias("shingle"))
    firsts = exploded.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    novel = firsts.groupBy(F.col("first_doc").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_novel")
    )
    per_doc = (
        sh.select("doc_id", "source", F.size("sset").alias("n_sh"))
        .join(novel, "doc_id", "left")
        .select(
            "source", "n_sh", F.coalesce("n_novel", F.lit(0)).alias("n_novel")
        )
    )
    out = (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_sh").alias("n_shingles"),
            F.sum("n_novel").alias("n_novel"),
            F.expr("sum(n_novel) * 1000000 div sum(n_sh)").alias("novelty_ppm"),
        )
        .orderBy("source")
    )
    if not checkpoint:
        return out
    out = out.localCheckpoint(eager=True)
    sh.unpersist()
    return out


# --------------------------------------------------------------------------
# drift_psi: population stability index in fixed point
# --------------------------------------------------------------------------
_PSI_BINS = 10


@query(
    "drift_psi",
    oracle=f"""
    WITH base AS (
        SELECT n_chars AS v, doc_id % 2 AS grp FROM documents),
    anchor AS (SELECT MIN(v) AS vmin, MAX(v) AS vmax FROM base),
    binned AS (
        SELECT LEAST({_PSI_BINS - 1},
                     (b.v - a.vmin) * {_PSI_BINS} // (a.vmax - a.vmin + 1))
                   AS bin,
               CASE WHEN grp = 0 THEN 1 ELSE 0 END AS s1
        FROM base b CROSS JOIN anchor a),
    hist AS (
        SELECT bin, SUM(s1) AS c1, SUM(1 - s1) AS c2
        FROM binned GROUP BY bin),
    tot AS (
        SELECT bin, c1, c2,
               c1 + 1 AS c1s, c2 + 1 AS c2s,
               SUM(c1) OVER () + COUNT(*) OVER () AS n1s,
               SUM(c2) OVER () + COUNT(*) OVER () AS n2s
        FROM hist),
    terms AS (
        SELECT bin, c1, c2,
               c1s * 1000000 // n1s AS p1_ppm,
               c2s * 1000000 // n2s AS p2_ppm,
               CAST(FLOOR(LN(
                   (CAST(c1s AS DOUBLE) * CAST(n2s AS DOUBLE)) /
                   (CAST(c2s AS DOUBLE) * CAST(n1s AS DOUBLE))
               ) * 1e9) AS BIGINT) AS ln_nano
        FROM tot)
    SELECT bin, c1, c2, p1_ppm, p2_ppm, ln_nano,
           SUM((p1_ppm - p2_ppm) * ln_nano) OVER () // 1000000000
               AS psi_micro
    FROM terms ORDER BY bin
    """,
)
def drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POPULATION STABILITY INDEX between two halves of the corpus
    (even vs odd doc_id, standing in for baseline vs current ingest):
    sum((p1-p2) * ln(p1/p2)) over 10 equal-width document-length bins —
    the model-monitoring drift number (PSI < 0.1 stable, > 0.25 act)
    that complements drift_ks_test's sup-norm with a mass-weighted
    divergence. Laplace +1 smoothing keeps every present bin finite.

    Exactness (the text_kl_divergence fixed-point composition): the
    log of the smoothed odds ratio quantizes to integer nano-nats
    FIRST (the ln argument is the identical left-associated double
    chain in both engines), shares are integer ppm, and the PSI
    reduction is an order-free integer sum quantized once to
    micro-PSI at the end.

    Scale shape: a 1-row min/max anchor broadcast onto the scan (the
    calibration_ece pattern), then ONE partial-agged exchange into
    <= 10 bins carrying both sample counts (no join between the
    samples); every window runs over the 10-row census. Constant
    exchange at any corpus size."""
    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        F.col("n_chars").alias("v"), (F.col("doc_id") % 2).alias("grp")
    )
    anchor = base.agg(F.min("v").alias("vmin"), F.max("v").alias("vmax"))
    binned = base.crossJoin(F.broadcast(anchor)).select(
        F.expr(
            f"least({_PSI_BINS - 1},"
            f" (v - vmin) * {_PSI_BINS} div (vmax - vmin + 1))"
        ).alias("bin"),
        F.when(F.col("grp") == 0, 1).otherwise(0).alias("s1"),
    )
    hist = binned.groupBy("bin").agg(
        F.sum("s1").alias("c1"), F.sum(F.expr("1 - s1")).alias("c2")
    )
    wall = Window.partitionBy()
    tot = (
        hist.withColumn("c1s", F.expr("c1 + 1"))
        .withColumn("c2s", F.expr("c2 + 1"))
        .withColumn("n1s", F.sum("c1").over(wall) + F.count(F.lit(1)).over(wall))
        .withColumn("n2s", F.sum("c2").over(wall) + F.count(F.lit(1)).over(wall))
    )
    terms = tot.select(
        "bin",
        "c1",
        "c2",
        F.expr("c1s * 1000000 div n1s").alias("p1_ppm"),
        F.expr("c2s * 1000000 div n2s").alias("p2_ppm"),
        F.expr(
            "cast(floor(ln((cast(c1s as double) * cast(n2s as double)) /"
            " (cast(c2s as double) * cast(n1s as double))) * 1e9) as bigint)"
        ).alias("ln_nano"),
    )
    # stay in BIGINT end-to-end: the window sum already is bigint, and the
    # oracle's `// 1000000000` is integer too — any double hop would lose
    # exactness once |sum| clears 2^53 (the extreme-drift regime a drift
    # gate exists to report; r7 ADVICE stats.py:953)
    return (
        terms.withColumn(
            "psi_micro",
            F.expr("sum((p1_ppm - p2_ppm) * ln_nano)").over(wall),
        )
        .withColumn("psi_micro", F.expr("psi_micro div 1000000000"))
        .orderBy("bin")
    )


# --------------------------------------------------------------------------
# conformal_threshold: split-conformal quantile + empirical coverage
# --------------------------------------------------------------------------
_CONF_TARGET_PPM = 900_000  # 90% nominal coverage


def _conf_u100(key: str, dialect: str) -> str:
    if dialect == "spark":
        return (
            f"pmod(cast(conv(substring(md5(concat(cast({key} as string),"
            f" '#cal')), 1, 12), 16, 10) as bigint), 100)"
        )
    return (
        f"CAST(CONCAT('0x', SUBSTR(MD5(CONCAT(CAST({key} AS VARCHAR),"
        f" '#cal')), 1, 12)) AS BIGINT) % 100"
    )


@query(
    "conformal_threshold",
    oracle=f"""
    WITH scored AS (
        SELECT {_CENTS} AS cents,
               CASE WHEN {_conf_u100("o_orderkey", "duckdb")} < 50
                    THEN 1 ELSE 0 END AS is_cal
        FROM orders),
    hist AS (
        SELECT cents, SUM(is_cal) AS c_cal
        FROM scored GROUP BY cents),
    cum AS (
        SELECT cents,
               SUM(c_cal) OVER (ORDER BY cents) AS cum_cal,
               SUM(c_cal) OVER () AS n_cal
        FROM hist),
    q AS (
        SELECT MAX(n_cal) AS n_cal,
               LEAST((9 * MAX(n_cal) + 18) // 10, MAX(n_cal)) AS q_rank,
               MIN(CASE WHEN cum_cal >=
                   LEAST((9 * n_cal + 18) // 10, n_cal)
                   THEN cents END) AS q_hat_cents
        FROM cum),
    cov AS (
        SELECT COUNT(*) AS n_test,
               SUM(CASE WHEN s.cents <= q.q_hat_cents THEN 1 ELSE 0 END)
                   AS n_covered
        FROM scored s CROSS JOIN q WHERE s.is_cal = 0)
    SELECT q.n_cal, c.n_test, q.q_rank, q.q_hat_cents,
           c.n_covered * 1000000 // c.n_test AS coverage_ppm,
           {_CONF_TARGET_PPM} AS target_ppm
    FROM q CROSS JOIN cov c
    """,
)
def conformal_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPLIT-CONFORMAL threshold calibration: a deterministic md5 coin
    splits orders into calibration/test halves; the calibration
    quantile at rank ceil(0.9*(n+1)) (the finite-sample-corrected
    conformal rank, clamped to n) becomes the prediction threshold,
    and the test half reports empirical coverage — the
    distribution-free uncertainty wrapper every learned scorer should
    ship with, verified A19-style against held-out data in the same
    query.

    Exactness: the split is the module's md5 recipe (seeded,
    replayable); the quantile is a discrete order statistic from the
    cumulative value histogram (no interpolation); coverage is integer
    ppm. The conformal guarantee (coverage >= 90% in expectation over
    calibration draws) is REPORTED, not asserted — a single draw may
    under-cover by finite-sample noise, and the query's job is the
    measurement.

    Scale shape: one partial-agged (cents) value histogram carrying
    the calibration counts (domain-bounded, the winsorize_stats
    discipline); the threshold is a 1-row aggregate broadcast onto
    the test-side scan. Two scans, domain-sized tail."""
    o = load_table(spark, sf_dir, "orders")
    scored = o.select(
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("cents"),
        F.when(F.expr(_conf_u100("o_orderkey", "spark")) < 50, 1)
        .otherwise(0)
        .alias("is_cal"),
    )
    hist = scored.groupBy("cents").agg(F.sum("is_cal").alias("c_cal"))
    cum = hist.withColumn(
        "cum_cal", F.sum("c_cal").over(Window.orderBy("cents"))
    ).withColumn("n_cal", F.sum("c_cal").over(Window.partitionBy()))
    q = cum.agg(
        F.max("n_cal").alias("n_cal"),
        F.expr("least((9 * max(n_cal) + 18) div 10, max(n_cal))").alias("q_rank"),
        F.min(
            F.when(
                F.col("cum_cal")
                >= F.expr("least((9 * n_cal + 18) div 10, n_cal)"),
                F.col("cents"),
            )
        ).alias("q_hat_cents"),
    )
    cov = (
        scored.where(F.col("is_cal") == 0)
        .crossJoin(F.broadcast(q))
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.sum(
                F.when(F.col("cents") <= F.col("q_hat_cents"), 1).otherwise(0)
            ).alias("n_covered"),
        )
    )
    return (
        q.crossJoin(F.broadcast(cov))
        .select(
            "n_cal",
            "n_test",
            "q_rank",
            "q_hat_cents",
            F.expr("n_covered * 1000000 div n_test").alias("coverage_ppm"),
            F.lit(_CONF_TARGET_PPM).alias("target_ppm"),
        )
    )


# --------------------------------------------------------------------------
# sample_coherent: zero-coordination cross-table sampling
# --------------------------------------------------------------------------
_COH_PCT = 20


def _coh_u100(key: str, dialect: str) -> str:
    if dialect == "spark":
        return (
            f"pmod(cast(conv(substring(md5(concat(cast({key} as string),"
            f" '#coh')), 1, 12), 16, 10) as bigint), 100)"
        )
    return (
        f"CAST(CONCAT('0x', SUBSTR(MD5(CONCAT(CAST({key} AS VARCHAR),"
        f" '#coh')), 1, 12)) AS BIGINT) % 100"
    )


@query(
    "sample_coherent",
    oracle=f"""
    WITH cs AS (
        SELECT c_custkey,
               CASE WHEN {_coh_u100("c_custkey", "duckdb")} < {_COH_PCT}
                    THEN 1 ELSE 0 END AS kept
        FROM customer),
    os AS (
        SELECT o_custkey,
               CASE WHEN {_coh_u100("o_custkey", "duckdb")} < {_COH_PCT}
                    THEN 1 ELSE 0 END AS kept
        FROM orders),
    orphans AS (
        SELECT COUNT(*) AS n_orphans
        FROM os WHERE os.kept = 1 AND os.o_custkey NOT IN
            (SELECT c_custkey FROM cs WHERE kept = 1)),
    c AS (SELECT COUNT(*) AS n_cust, SUM(kept) AS n_cust_s FROM cs),
    o AS (SELECT COUNT(*) AS n_orders, SUM(kept) AS n_orders_s FROM os)
    SELECT c.n_cust, c.n_cust_s, o.n_orders, o.n_orders_s, p.n_orphans,
           c.n_cust_s * 1000000 // c.n_cust AS cust_share_ppm,
           o.n_orders_s * 1000000 // o.n_orders AS order_share_ppm
    FROM c CROSS JOIN o CROSS JOIN orphans p
    """,
)
def sample_coherent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COHERENT cross-table sampling: customers and orders each keep
    rows where md5(custkey)%100 < 20 — the SAME hash of the SHARED key,
    evaluated independently per table with ZERO coordination — and the
    query verifies A19-style that the resulting sample is referentially
    closed (n_orphans must read 0: every sampled order's customer was
    sampled). The debugging workhorse at 100 TB: a 20% slice of a
    multi-table warehouse that still JOINS correctly, without shipping
    a key list between tables.

    Exactness: the keep decision is the module's md5 recipe on the
    join key (kept iff the KEY hashes low, so FK rows agree by
    construction); shares are integer ppm; the orphan count is an
    exact anti-join census.

    Scale shape: each table filters scan-locally (no exchange to
    decide membership); the orphan CHECK is one keyed anti join of the
    sampled orders against the sampled customers — the only shuffle,
    and only over the 20% slice. At 100 TB the sample is produced by
    two independent scans."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.when(F.expr(_coh_u100("c_custkey", "spark")) < _COH_PCT, 1)
        .otherwise(0)
        .alias("kept"),
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.when(F.expr(_coh_u100("o_custkey", "spark")) < _COH_PCT, 1)
        .otherwise(0)
        .alias("kept"),
    )
    orphans = (
        o.where(F.col("kept") == 1)
        .join(
            c.where(F.col("kept") == 1).select(
                F.col("c_custkey").alias("o_custkey")
            ),
            "o_custkey",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n_orphans"))
    )
    cagg = c.agg(
        F.count(F.lit(1)).alias("n_cust"), F.sum("kept").alias("n_cust_s")
    )
    oagg = o.agg(
        F.count(F.lit(1)).alias("n_orders"), F.sum("kept").alias("n_orders_s")
    )
    return (
        cagg.crossJoin(F.broadcast(oagg))
        .crossJoin(F.broadcast(orphans))
        .select(
            "n_cust",
            "n_cust_s",
            "n_orders",
            "n_orders_s",
            "n_orphans",
            F.expr("n_cust_s * 1000000 div n_cust").alias("cust_share_ppm"),
            F.expr("n_orders_s * 1000000 div n_orders").alias("order_share_ppm"),
        )
    )


# --------------------------------------------------------------------------
# ml_tree_split2: depth-2 tree growth (the recursive histogram pattern)
# --------------------------------------------------------------------------
def _tree2_oracle() -> str:
    gini_l = _GINI_L.replace("div", "//")
    gini_r = _GINI_R.replace("div", "//")
    return f"""
    WITH hist AS (
        SELECT CAST(l_quantity AS BIGINT) AS thr,
               COUNT(*) AS cnt,
               SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS pos
        FROM lineitem GROUP BY thr),
    cum AS (
        SELECT thr,
               SUM(cnt) OVER (ORDER BY thr) AS l,
               SUM(pos) OVER (ORDER BY thr) AS pl,
               SUM(cnt) OVER () AS t, SUM(pos) OVER () AS p
        FROM hist),
    scored AS (
        SELECT thr, l, t - l AS r, pl, p - pl AS pr,
               CAST((CAST(l AS HUGEINT) * ({gini_l})
                   + CAST(t - l AS HUGEINT) * (1000000000000
                       - ((p - pl) * 1000000 // (t - l))
                           * ((p - pl) * 1000000 // (t - l))
                       - ((t - l - p + pl) * 1000000 // (t - l))
                           * ((t - l - p + pl) * 1000000 // (t - l))))
                   // t AS BIGINT) AS w_e12
        FROM cum WHERE l < t),
    root AS (
        SELECT thr AS root_thr FROM scored
        ORDER BY w_e12, thr LIMIT 1),
    hist2 AS (
        SELECT CASE WHEN CAST(li.l_quantity AS BIGINT) <= rt.root_thr
                    THEN 0 ELSE 1 END AS side,
               CAST(FLOOR(li.l_discount * 100 + 0.5) AS BIGINT) AS thr,
               COUNT(*) AS cnt,
               SUM(CASE WHEN li.l_returnflag = 'R' THEN 1 ELSE 0 END) AS pos
        FROM lineitem li CROSS JOIN root rt
        GROUP BY side, thr),
    cum2 AS (
        SELECT side, thr,
               SUM(cnt) OVER (PARTITION BY side ORDER BY thr) AS l,
               SUM(pos) OVER (PARTITION BY side ORDER BY thr) AS pl,
               SUM(cnt) OVER (PARTITION BY side) AS t,
               SUM(pos) OVER (PARTITION BY side) AS p
        FROM hist2),
    scored2 AS (
        SELECT side, thr, l AS n_left, t - l AS n_right,
               CAST((CAST(l AS HUGEINT) * ({gini_l})
                   + CAST(t - l AS HUGEINT) * (1000000000000
                       - ((p - pl) * 1000000 // (t - l))
                           * ((p - pl) * 1000000 // (t - l))
                       - ((t - l - p + pl) * 1000000 // (t - l))
                           * ((t - l - p + pl) * 1000000 // (t - l))))
                   // t AS BIGINT) AS w_e12,
               1000000000000 - (p * 1000000 // t) * (p * 1000000 // t)
                   - ((t - p) * 1000000 // t) * ((t - p) * 1000000 // t)
                   AS node_gini_e12
        FROM cum2 WHERE l < t),
    best2 AS (
        SELECT side, thr, n_left, n_right, node_gini_e12, w_e12,
               ROW_NUMBER() OVER (PARTITION BY side
                   ORDER BY w_e12, thr) AS rk
        FROM scored2)
    SELECT b.side, r.root_thr, b.thr AS child_thr, b.n_left, b.n_right,
           b.node_gini_e12, b.w_e12 AS child_split_e12,
           b.node_gini_e12 - b.w_e12 AS gain_e12
    FROM best2 b CROSS JOIN root r WHERE b.rk = 1 ORDER BY b.side
    """


@query("ml_tree_split2", oracle=_tree2_oracle())
def ml_tree_split2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEPTH-2 decision-tree growth: the root split on quantity (from
    ml_tree_split's argmin) partitions the corpus into two children,
    and each child finds ITS best split on a SECOND feature (discount)
    — the recursive histogram pattern every distributed tree learner
    (MLlib, XGBoost-on-Spark) runs per level: one pass builds ALL
    nodes' per-(node, value) label histograms simultaneously, so a
    level costs one scan regardless of node count.

    Exactness: the root threshold comes from the same ppm-quantized
    Gini argmin as ml_tree_split (injective tie-break); child
    histograms key on (side, discount-cents); the size-weighted child
    impurities run in the same DECIMAL(38)/HUGEINT headroom. Output is
    one row per child: its best threshold, sizes, node impurity,
    post-split impurity, and gain.

    Scale shape: pass 1 is ml_tree_split's domain-bounded histogram;
    the 1-row root threshold broadcasts back onto pass 2's scan (the
    calibration_ece anchor pattern), which partial-aggregates into
    (2 sides x 11 discount levels) rows; each child's cumulative +
    argmin windows run per side over that domain-sized relation. Two
    scans, constant exchange — per tree LEVEL, not per node."""
    li = load_table(spark, sf_dir, "lineitem")
    hist = (
        li.select(
            F.col("l_quantity").cast("bigint").alias("thr"),
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("is_pos"),
        )
        .groupBy("thr")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("is_pos").alias("pos"))
    )
    wv = Window.orderBy("thr")
    wall = Window.partitionBy()
    cum = (
        hist.withColumn("l", F.sum("cnt").over(wv))
        .withColumn("pl", F.sum("pos").over(wv))
        .withColumn("t", F.sum("cnt").over(wall))
        .withColumn("p", F.sum("pos").over(wall))
    )
    scored = cum.where(F.col("l") < F.col("t")).select(
        "thr",
        "l",
        F.expr("t - l").alias("r"),
        "pl",
        F.expr("p - pl").alias("pr"),
        "t",
    )
    w_e12 = F.expr(
        f"cast((cast(l as decimal(38, 0)) * ({_GINI_L})"
        f" + cast(r as decimal(38, 0)) * ({_GINI_R})) div t as bigint)"
    )
    root = (
        scored.select("thr", w_e12.alias("w_e12"))
        .orderBy("w_e12", "thr")
        .limit(1)
        .select(F.col("thr").alias("root_thr"))
    )
    hist2 = (
        li.crossJoin(F.broadcast(root))
        .select(
            F.when(
                F.col("l_quantity").cast("bigint") <= F.col("root_thr"), 0
            )
            .otherwise(1)
            .alias("side"),
            F.floor(F.col("l_discount") * 100 + 0.5).cast("bigint").alias("thr"),
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("is_pos"),
        )
        .groupBy("side", "thr")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("is_pos").alias("pos"))
    )
    ws = Window.partitionBy("side").orderBy("thr")
    wside = Window.partitionBy("side")
    cum2 = (
        hist2.withColumn("l", F.sum("cnt").over(ws))
        .withColumn("pl", F.sum("pos").over(ws))
        .withColumn("t", F.sum("cnt").over(wside))
        .withColumn("p", F.sum("pos").over(wside))
    )
    scored2 = cum2.where(F.col("l") < F.col("t")).select(
        "side",
        "thr",
        F.col("l").alias("n_left"),
        F.expr("t - l").alias("n_right"),
        F.col("l").alias("l"),
        F.expr("t - l").alias("r"),
        "pl",
        F.expr("p - pl").alias("pr"),
        "t",
        F.expr(
            "1000000000000 - (p * 1000000 div t) * (p * 1000000 div t)"
            " - ((t - p) * 1000000 div t) * ((t - p) * 1000000 div t)"
        ).alias("node_gini_e12"),
    )
    best2 = scored2.select(
        "side",
        "thr",
        "n_left",
        "n_right",
        "node_gini_e12",
        w_e12.alias("child_split_e12"),
    ).withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("side").orderBy("child_split_e12", "thr")
        ),
    ).where(F.col("rk") == 1)
    return (
        best2.crossJoin(F.broadcast(root))
        .select(
            "side",
            "root_thr",
            F.col("thr").alias("child_thr"),
            "n_left",
            "n_right",
            "node_gini_e12",
            "child_split_e12",
            F.expr("node_gini_e12 - child_split_e12").alias("gain_e12"),
        )
        .orderBy("side")
    )


# --------------------------------------------------------------------------
# score_quantile_norm: cross-source quantile normalization (CDF matching)
# --------------------------------------------------------------------------
@query(
    "score_quantile_norm",
    oracle="""
    WITH h AS (
        SELECT source, n_chars AS v, COUNT(*) AS n
        FROM documents GROUP BY 1, 2),
    st AS (
        SELECT source, v, n,
               SUM(n) OVER (PARTITION BY source ORDER BY v) * 1000000
                   // SUM(n) OVER (PARTITION BY source) AS scdf_ppm
        FROM h),
    g AS (
        SELECT v, SUM(n) AS n FROM h GROUP BY v),
    gt AS (
        SELECT v, SUM(n) OVER (ORDER BY v) * 1000000
                   // SUM(n) OVER () AS gcdf_ppm
        FROM g)
    SELECT s.source, s.v, s.scdf_ppm,
           MIN(t.v) AS v_norm
    FROM st s JOIN gt t ON t.gcdf_ppm >= s.scdf_ppm
    GROUP BY s.source, s.v, s.scdf_ppm
    ORDER BY s.source, s.v
    """,
)
def score_quantile_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source quantile normalization (CDF matching): every
    source's document-length distribution is mapped onto the GLOBAL
    distribution — source value v normalizes to the smallest global
    value whose global CDF reaches v's within-source CDF. The
    calibration step a pipeline runs before comparing quality scores
    across heterogeneous sources (one crawl's '300 chars' is another
    archive's median): after mapping, every source's normalized
    distribution is the global one by construction.

    Spark-first shape: the corpus collapses FIRST to per-(source,
    value) histograms (one partial-agged groupBy — the stats.py law);
    both CDFs are windows over the value-DOMAIN-bounded histogram, and
    the mapping is a broadcast non-equi join of two domain-bounded
    relations (|sources|x|values| by |values|) resolved by a MIN — the
    corpus itself never joins anything. Output is the mapping TABLE
    (bounded by domain, not corpus), which a consumer broadcasts back
    onto the raw scan.

    Exactness: CDFs are integer ppm (cum*1e6 div total) and the
    mapped value is an integer MIN under an exact >= compare — no
    interpolation, no floats, identical in both engines."""
    d = load_table(spark, sf_dir, "documents")
    h = d.groupBy("source", F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).alias("n")
    )
    ws_cum = (
        Window.partitionBy("source")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ws_all = Window.partitionBy("source")
    st = h.select(
        "source",
        "v",
        F.expr("sum(n)").over(ws_cum).alias("cum"),
        F.expr("sum(n)").over(ws_all).alias("tot"),
    ).select(
        "source", "v", F.expr("cum * 1000000 div tot").alias("scdf_ppm")
    )
    g = h.groupBy("v").agg(F.sum("n").alias("n"))
    wg_cum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    wg_all = Window.partitionBy()
    gt = g.select(
        "v",
        F.expr("sum(n)").over(wg_cum).alias("cum"),
        F.expr("sum(n)").over(wg_all).alias("tot"),
    ).select(
        F.col("v").alias("gv"),
        F.expr("cum * 1000000 div tot").alias("gcdf_ppm"),
    )
    return (
        st.join(F.broadcast(gt), F.col("gcdf_ppm") >= F.col("scdf_ppm"))
        .groupBy("source", "v", "scdf_ppm")
        .agg(F.min("gv").alias("v_norm"))
        .orderBy("source", "v")
    )
