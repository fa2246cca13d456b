"""Embedding-space ML operators over the ``embeddings`` table
(LLM-pipeline extension list: the vector-index side of a training-data
platform).

- kmeans_lloyd:   one exact Lloyd iteration — assign every vector to its
  nearest coarse centroid (squared-L2), recompute the means, report
  per-cluster size and centroid drift. The deterministic inner loop of
  the IVF index builder (sim_ivf_topk consumes exactly these centroids).
- emb_quantize:   int8 scalar quantization — per-dimension global
  min/max, affine code mapping, reconstruction-error report. The
  index-compression pass that turns a 256-byte float64 vector into 64
  bytes before ANN serving.
- sim_ivf_nprobe: IVF search with nprobe=2 — each query probes its TWO
  nearest inverted lists, fixing nprobe=1's recall cliff for queries
  that land near a Voronoi boundary (sim_ann_recall measures the gap).

Determinism contract (same as similarity.py): every reduction over a
vector is a sequential left fold in double precision — Spark
``aggregate(zip_with(...))`` vs DuckDB ``list_reduce(list_transform(...))``
(both left-to-right, and a 0-init fold equals a first-element-init fold
exactly because 0.0 + x == x); distances are rounded to 6 decimals
before any argmin/ranking with explicit tie-breaks; quantization codes
use the floor(x + 0.5) half-up form (functions/numeric.py's
round_pos_double idiom — both engines' double-native path, non-negative
domain); per-group outputs are exact integers or order-independent
max/min, never raw double sums.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from curatorhadoopinterface_spark.functions.vec import (
    dot_bigint,
    dot_double,
    sqdist_bigint,
    sqdist_double,
)
from curatorhadoopinterface_spark.operators import query
from curatorhadoopinterface_spark.operators.similarity import (
    N_QUERIES,
    TOP_K,
    _with_norm,
)
from curatorhadoopinterface_spark.session import ensure_min_partitions, load_table

DIM = 64
NPROBE = 2
QBITS_MAX = 255  # int8-range code book (0..255)

# ---- shared Spark/oracle fragments ----------------------------------------

def _d2(a: str, b: str):
    """Rounded squared-L2 distance between two double arrays (r9:
    unrolled codegen form, value-identical to the sequential fold)."""
    return F.expr(f"round({sqdist_double(a, b, DIM)}, 6)")


def _o_d2(a: str, b: str) -> str:
    return (
        f"ROUND(list_reduce(list_transform(GENERATE_SERIES(1, {DIM}),"
        f" i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])), (x, y) -> x + y), 6)"
    )


_O_BASE = """
    base AS (
        SELECT vec_id, label, embedding::DOUBLE[] AS e,
               SQRT(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
        FROM embeddings)
"""

_O_CENT = f"""
    cent AS (
        SELECT label,
               LIST(ROUND(s, 4) ORDER BY i) AS ce
        FROM (
            SELECT label, i, SUM(e[i]) / COUNT(*) AS s
            FROM base, UNNEST(GENERATE_SERIES(1, {DIM})) AS t(i)
            GROUP BY label, i)
        GROUP BY label)
"""


def _base(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _with_norm(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id",
        "label",
        F.expr("transform(embedding, x -> cast(x as double))").alias("e"),
        "norm",
    )


def _centroids(base: DataFrame) -> DataFrame:
    """Per-label mean vectors rounded to 4 decimals (the IVF coarse
    centroids; rounding makes the mean independent of summation order)."""
    return (
        base.select("label", F.posexplode("e").alias("i", "v"))
        .groupBy("label", "i")
        .agg((F.sum("v") / F.count("*")).alias("s"))
        .groupBy("label")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(i, s))), p -> round(p.s, 4))"
            ).alias("ce")
        )
    )


@query(
    "kmeans_lloyd",
    oracle=f"""
    WITH {_O_BASE},
    {_O_CENT},
    assign AS (
        SELECT b.vec_id, b.e, c.label AS cluster,
               ROW_NUMBER() OVER (
                   PARTITION BY b.vec_id
                   ORDER BY {_o_d2('b.e', 'c.ce')} ASC, c.label) AS rk
        FROM base b CROSS JOIN cent c),
    members AS (SELECT vec_id, e, cluster FROM assign WHERE rk = 1),
    newc AS (
        SELECT cluster,
               LIST(ROUND(s, 4) ORDER BY i) AS ne,
               MAX(n) AS n_points
        FROM (
            SELECT cluster, i, SUM(e[i]) / COUNT(*) AS s, COUNT(*) AS n
            FROM members, UNNEST(GENERATE_SERIES(1, {DIM})) AS t(i)
            GROUP BY cluster, i)
        GROUP BY cluster)
    SELECT n.cluster, n.n_points,
           ROUND(SQRT({_o_d2('n.ne', 'c.ce')}), 6) AS drift
    FROM newc n JOIN cent c ON c.label = n.cluster
    """,
)
def kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One exact Lloyd iteration from the per-label centroids: nearest-
    centroid assignment (squared-L2, rounded, label tie-break), mean
    recomputation, per-cluster drift report.

    Plan: centroids are k rows — broadcast into a map-side nearest-
    centroid pass (the corpus is scanned once, no shuffle for the
    assignment); the recompute is one partial-aggregated (cluster, dim)
    shuffle of k*64 cells, not vectors. At 100 TB every further
    iteration is the same shape — the classic broadcast-Lloyd loop.
    """
    base = _base(spark, sf_dir)
    cent = _centroids(base)
    w = Window.partitionBy("vec_id").orderBy(
        _d2("e", "ce").asc(), F.col("label").asc()
    )
    members = (
        # drop base's own label before the cross join: assignment must
        # not see it, and it would shadow the centroid's label column
        base.select("vec_id", "e").crossJoin(F.broadcast(cent))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("vec_id", "e", F.col("label").alias("cluster"))
    )
    newc = (
        members.select("cluster", F.posexplode("e").alias("i", "v"))
        .groupBy("cluster", "i")
        .agg((F.sum("v") / F.count("*")).alias("s"), F.count("*").alias("n"))
        .groupBy("cluster")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(i, s))), p -> round(p.s, 4))"
            ).alias("ne"),
            F.max("n").alias("n_points"),
        )
    )
    return (
        newc.join(F.broadcast(cent), newc["cluster"] == cent["label"])
        .select(
            "cluster",
            "n_points",
            F.round(F.sqrt(_d2("ne", "ce")), 6).alias("drift"),
        )
    )


_O_QSPAN = f"""
    span AS (
        SELECT i, MIN(e[i]) AS mn, MAX(e[i]) AS mx
        FROM base, UNNEST(GENERATE_SERIES(1, {DIM})) AS t(i)
        GROUP BY i)
"""


@query(
    "emb_quantize",
    oracle=f"""
    WITH {_O_BASE},
    {_O_QSPAN},
    codes AS (
        SELECT b.vec_id, b.label, s.i,
               CAST(FLOOR((b.e[s.i] - s.mn) / (s.mx - s.mn) * {QBITS_MAX} + 0.5)
                    AS BIGINT) AS q,
               s.mn, s.mx, b.e[s.i] AS x
        FROM base b JOIN span s ON s.mx > s.mn),
    errs AS (
        SELECT vec_id, label,
               SUM(q) AS code_sum,
               MAX(ROUND(ABS(mn + q * (mx - mn) / {QBITS_MAX} - x), 6)) AS max_abs_err
        FROM codes GROUP BY vec_id, label)
    SELECT label,
           COUNT(*) AS n_vecs,
           SUM(code_sum) AS total_code,
           MAX(max_abs_err) AS max_abs_err
    FROM errs GROUP BY label
    """,
)
def emb_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8-range scalar quantization: global per-dimension min/max spans,
    affine codes q = floor((x-mn)/(mx-mn)*255 + 0.5), and the
    reconstruction-error report per label (exact integer code totals +
    order-independent max error — no raw double sums cross the group
    boundary, so the hash can't wobble).

    Plan: the span table is 64 rows (partial-agged per-dim min/max —
    one tiny shuffle) and broadcasts back onto a single corpus scan; the
    per-vector fold is array-local. At 100 TB this is the one-pass +
    map-side-join shape every vector-index compressor wants; constant
    dims (mx == mn) are dropped from the code book by the join predicate.
    """
    base = _base(spark, sf_dir)
    span = (
        base.select(F.posexplode("e").alias("i", "v"))
        .groupBy("i")
        .agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
        .filter(F.col("mx") > F.col("mn"))
    )
    codes = (
        base.crossJoin(F.broadcast(span.groupBy().agg(
            F.expr("transform(array_sort(collect_list(struct(i, mn, mx))),"
                   " p -> struct(p.i as i, p.mn as mn, p.mx as mx))").alias("sp")
        )))
        .select(
            "vec_id",
            "label",
            F.explode("sp").alias("s"),
            F.col("e"),
        )
        .select(
            "vec_id",
            "label",
            # span's i is posexplode's 0-based position; Spark e[i] is
            # 0-based too (the oracle's 1-based lists line up by dim)
            F.expr(
                f"cast(floor((e[s.i] - s.mn) / (s.mx - s.mn) * {QBITS_MAX}"
                " + cast(0.5 as double)) as bigint)"
            ).alias("q"),
            F.col("s.mn").alias("mn"),
            F.col("s.mx").alias("mx"),
            F.expr("e[s.i]").alias("x"),
        )
    )
    errs = codes.groupBy("vec_id", "label").agg(
        F.sum("q").alias("code_sum"),
        F.max(
            F.round(
                F.abs(
                    F.col("mn")
                    + F.col("q") * (F.col("mx") - F.col("mn")) / QBITS_MAX
                    - F.col("x")
                ),
                6,
            )
        ).alias("max_abs_err"),
    )
    return errs.groupBy("label").agg(
        F.count("*").alias("n_vecs"),
        F.sum("code_sum").alias("total_code"),
        F.max("max_abs_err").alias("max_abs_err"),
    )


@query(
    "sim_ivf_nprobe",
    oracle=f"""
    WITH {_O_BASE},
    {_O_CENT},
    q AS MATERIALIZED (SELECT * FROM base WHERE vec_id < {N_QUERIES}),
    assign AS (
        SELECT q.vec_id, q.e, q.norm, c.label,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY ROUND(list_dot_product(q.e, c.ce), 6) DESC, c.label) AS rk
        FROM q CROSS JOIN cent c),
    probed AS (SELECT * FROM assign WHERE rk <= {NPROBE}),
    scored AS (
        SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROUND(list_dot_product(p.e, c.e) / (p.norm * c.norm), 6) AS cosine,
               ROW_NUMBER() OVER (
                   PARTITION BY p.vec_id
                   ORDER BY ROUND(list_dot_product(p.e, c.e) / (p.norm * c.norm), 6) DESC,
                            c.vec_id) AS rk
        FROM probed p JOIN base c
          ON c.label = p.label AND c.vec_id <> p.vec_id)
    SELECT query_id, neighbor_id, cosine, rk
    FROM scored WHERE rk <= {TOP_K}
    """,
)
def sim_ivf_nprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search with nprobe=2: each query scores against its two
    nearest centroids' inverted lists (disjoint by construction, so the
    union needs no dedup) and takes top-k over the merged candidates.
    Same broadcast-centroid assignment and equi probe join as
    sim_ivf_topk — the extra probe doubles candidates, not shuffles.
    sim_ann_recall quantifies what the second probe buys near Voronoi
    boundaries.
    """
    base = _base(spark, sf_dir)
    cent = _centroids(base)
    qdot = F.round(F.expr(dot_double("e", "ce", DIM)), 6)
    q = base.filter(F.col("vec_id") < N_QUERIES).select("vec_id", "e", "norm")
    w_assign = Window.partitionBy("vec_id").orderBy(F.desc("qc"), F.asc("label"))
    probed = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("qc", qdot)
        .withColumn("rk", F.row_number().over(w_assign))
        .filter(F.col("rk") <= NPROBE)
        .select("vec_id", "e", "norm", "label")
    )
    cos = F.round(
        F.expr(dot_double("p.e", "c.e", DIM))
        / (F.col("p.norm") * F.col("c.norm")),
        6,
    )
    scored = (
        F.broadcast(probed).alias("p")
        .join(
            base.alias("c"),
            (F.col("c.label") == F.col("p.label"))
            & (F.col("c.vec_id") != F.col("p.vec_id")),
        )
        .select(
            F.col("p.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            cos.alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= TOP_K)


# ---- product quantization ---------------------------------------------------

M_SUB = 4  # subspaces
SUBDIM = DIM // M_SUB  # 16 dims each

_O_SUB = f"""
    sub AS (
        SELECT vec_id, label, m,
               e[m * {SUBDIM} + 1 : (m + 1) * {SUBDIM}] AS sv
        FROM base, UNNEST(GENERATE_SERIES(0, {M_SUB - 1})) AS t(m))
"""

_O_CB = f"""
    cb AS (
        SELECT m, label,
               LIST(ROUND(s, 4) ORDER BY i) AS ce
        FROM (
            SELECT m, label, i, SUM(sv[i]) / COUNT(*) AS s
            FROM sub, UNNEST(GENERATE_SERIES(1, {SUBDIM})) AS t(i)
            GROUP BY m, label, i)
        GROUP BY m, label)
"""


def _o_d2i(a: str, b: str) -> str:
    """Integer-scaled squared-L2 over a subvector: exact bigint, so sums
    across subspaces are order-independent."""
    return (
        f"CAST(FLOOR(list_reduce(list_transform(GENERATE_SERIES(1, {SUBDIM}),"
        f" i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])), (x, y) -> x + y)"
        f" * 1000000 + 0.5) AS BIGINT)"
    )


@query(
    "sim_pq_adc",
    oracle=f"""
    WITH {_O_BASE},
    {_O_SUB},
    {_O_CB},
    codes AS (
        SELECT vec_id, m, label AS code FROM (
            SELECT s.vec_id, s.m, c.label,
                   ROW_NUMBER() OVER (
                       PARTITION BY s.vec_id, s.m
                       ORDER BY {_o_d2i('s.sv', 'c.ce')} ASC, c.label) AS rk
            FROM sub s JOIN cb c ON c.m = s.m)
        WHERE rk = 1),
    q AS (SELECT vec_id, m, sv FROM sub WHERE vec_id < {N_QUERIES}),
    qd AS (
        SELECT q.vec_id AS query_id, q.m, c.label,
               {_o_d2i('q.sv', 'c.ce')} AS d2i
        FROM q JOIN cb c ON c.m = q.m),
    adc AS (
        SELECT qd.query_id, codes.vec_id AS neighbor_id,
               SUM(qd.d2i) AS adc_i
        FROM codes JOIN qd ON qd.m = codes.m AND qd.label = codes.code
        WHERE codes.vec_id <> qd.query_id
        GROUP BY qd.query_id, codes.vec_id)
    SELECT query_id, neighbor_id,
           ROUND(adc_i / 1000000.0, 6) AS adc_dist, rk
    FROM (
        SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY adc_i ASC, neighbor_id) AS rk
        FROM adc)
    WHERE rk <= {TOP_K}
    """,
)
def sim_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization + asymmetric-distance (ADC) search: vectors
    compress to {M_SUB} one-byte codes (nearest per-subspace centroid);
    a query scores the WHOLE corpus from a tiny per-query lookup table
    (query-to-centroid distances per subspace) — sum of {M_SUB} table
    entries per candidate instead of a 64-dim fold. The memory-bound ANN
    serving layer: at 100 TB the codes table is ~256x smaller than the
    float corpus and the scoring join moves codes, never vectors.

    Determinism: subspace distances are floor(d2*1e6+0.5) BIGINTs, so
    the cross-subspace sum is exact integer arithmetic — immune to
    summation order (the double-sum would wobble in the last ulp);
    argmin/rank ties break on label/neighbor_id. Codebooks are the
    per-label subvector means rounded to 4 (the kmeans_lloyd /
    sim_ivf_topk centroid discipline).
    """
    base = _base(spark, sf_dir)
    sub = base.select(
        "vec_id",
        "label",
        F.explode(F.array(*[F.lit(m) for m in range(M_SUB)])).alias("m"),
        "e",
    ).select(
        "vec_id",
        "label",
        "m",
        F.expr(f"slice(e, m * {SUBDIM} + 1, {SUBDIM})").alias("sv"),
    )
    cb = (
        sub.select("m", "label", F.posexplode("sv").alias("i", "v"))
        .groupBy("m", "label", "i")
        .agg((F.sum("v") / F.count("*")).alias("s"))
        .groupBy("m", "label")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(i, s))), p -> round(p.s, 4))"
            ).alias("ce")
        )
    )

    def d2i(a: str, b: str):
        return F.expr(
            f"cast(floor({sqdist_double(a, b, SUBDIM)} * 1000000"
            " + cast(0.5 as double)) as bigint)"
        )

    w_code = Window.partitionBy("vec_id", "m").orderBy(
        F.asc("di"), F.asc("label")
    )
    codes = (
        # drop the vector's own label first: the codebook's label is the
        # candidate code, and keeping both makes the join ambiguous
        sub.select("vec_id", "m", "sv")
        .join(F.broadcast(cb), "m")
        .select(
            "vec_id",
            "m",
            "label",
            d2i("sv", "ce").alias("di"),
        )
        .withColumn("rk", F.row_number().over(w_code))
        .filter(F.col("rk") == 1)
        .select("vec_id", "m", F.col("label").alias("code"))
    )
    q = sub.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "m", "sv"
    )
    qd = q.join(F.broadcast(cb), "m").select(
        "query_id", "m", "label", d2i("sv", "ce").alias("d2i")
    )
    # codes and qd share lineage through `sub` — explicit aliases keep the
    # join predicate unambiguous instead of leaning on Spark's dataset-id
    # self-join disambiguation ("trivially true equals predicate" warning).
    adc = (
        codes.alias("c")
        .join(
            F.broadcast(qd.alias("q")),
            (F.col("q.m") == F.col("c.m"))
            & (F.col("q.label") == F.col("c.code"))
            & (F.col("c.vec_id") != F.col("q.query_id")),
        )
        .groupBy("q.query_id", F.col("c.vec_id").alias("neighbor_id"))
        .agg(F.sum("q.d2i").alias("adc_i"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_i"), F.asc("neighbor_id"))
    return (
        adc.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("adc_i") / 1000000.0, 6).alias("adc_dist"),
            "rk",
        )
    )


@query(
    "sim_pq_recall",
    oracle=f"""
    WITH {_O_BASE},
    {_O_SUB},
    {_O_CB},
    codes AS (
        SELECT vec_id, m, label AS code FROM (
            SELECT s.vec_id, s.m, c.label,
                   ROW_NUMBER() OVER (
                       PARTITION BY s.vec_id, s.m
                       ORDER BY {_o_d2i('s.sv', 'c.ce')} ASC, c.label) AS rk
            FROM sub s JOIN cb c ON c.m = s.m)
        WHERE rk = 1),
    q AS (SELECT vec_id, m, sv FROM sub WHERE vec_id < {N_QUERIES}),
    qd AS (
        SELECT q.vec_id AS query_id, q.m, c.label,
               {_o_d2i('q.sv', 'c.ce')} AS d2i
        FROM q JOIN cb c ON c.m = q.m),
    pq_top AS (
        SELECT query_id, neighbor_id FROM (
            SELECT qd.query_id, codes.vec_id AS neighbor_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY qd.query_id
                       ORDER BY SUM(qd.d2i) ASC, codes.vec_id) AS rk
            FROM codes JOIN qd ON qd.m = codes.m AND qd.label = codes.code
            WHERE codes.vec_id <> qd.query_id
            GROUP BY qd.query_id, codes.vec_id)
        WHERE rk <= {TOP_K}),
    qfull AS (SELECT vec_id, e FROM base WHERE vec_id < {N_QUERIES}),
    exact_top AS (
        SELECT query_id, neighbor_id FROM (
            SELECT qf.vec_id AS query_id, b.vec_id AS neighbor_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY qf.vec_id
                       ORDER BY {_o_d2('qf.e', 'b.e')} ASC, b.vec_id) AS rk
            FROM qfull qf JOIN base b ON b.vec_id <> qf.vec_id)
        WHERE rk <= {TOP_K})
    SELECT e.query_id,
           COUNT(p.neighbor_id) AS n_hit,
           {TOP_K} AS k,
           ROUND(COUNT(p.neighbor_id) * 1.0 / {TOP_K}, 2) AS recall
    FROM exact_top e
    LEFT JOIN pq_top p
      ON p.query_id = e.query_id AND p.neighbor_id = e.neighbor_id
    GROUP BY e.query_id
    """,
)
def sim_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of PQ-ADC search against the exact squared-L2 baseline —
    the honesty metric every quantized index ships with (sim_ann_recall
    is the LSH twin): compression trades recall for memory, and the
    trade must be MEASURED, not assumed. Full value check: per-query
    hit counts, not just an average.

    Plan: the PQ side is sim_pq_adc's broadcast-lookup pipeline; the
    exact side is one brute-force pass over the corpus for the tiny
    query set (broadcast, map-side); the comparison is a per-query
    left join of two k-row lists.
    """
    pq_top = sim_pq_adc(spark, sf_dir).select("query_id", "neighbor_id")
    base = _base(spark, sf_dir)
    qfull = base.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    d2 = F.round(F.expr(sqdist_double("qe", "e", DIM)), 6)
    w = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("neighbor_id"))
    exact_top = (
        F.broadcast(qfull)
        .join(base, base["vec_id"] != qfull["query_id"])
        .select(
            "query_id", F.col("vec_id").alias("neighbor_id"), d2.alias("d2")
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "neighbor_id")
    )
    return (
        exact_top.alias("e")
        .join(
            pq_top.alias("p"),
            (F.col("p.query_id") == F.col("e.query_id"))
            & (F.col("p.neighbor_id") == F.col("e.neighbor_id")),
            "left",
        )
        .groupBy(F.col("e.query_id").alias("query_id"))
        .agg(
            F.count(F.col("p.neighbor_id")).alias("n_hit"),
            F.lit(TOP_K).alias("k"),
            F.round(F.count(F.col("p.neighbor_id")) * 1.0 / TOP_K, 2).alias(
                "recall"
            ),
        )
    )


# --------------------------------------------------------------------------
# Embedding distribution drift (continuous-ingest monitoring)
# --------------------------------------------------------------------------
_EMB_DIM = 64
_DRIFT_SCALE = 10000  # fixed-point: component -> floor(x * 10^4)
_DRIFT_CUT = 50  # |mean shift| > 50 quantized units (0.005) -> drifted


@query(
    "emb_drift",
    oracle=f"""
    WITH q AS (
        SELECT vec_id % 2 AS batch, d.dim,
               CAST(FLOOR(CAST(embedding[d.dim] AS DOUBLE) * {_DRIFT_SCALE})
                    AS BIGINT) AS qv
        FROM embeddings
        CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(1, {_EMB_DIM})) AS dim) d),
    agg AS (
        SELECT dim,
               SUM(CASE WHEN batch = 0 THEN qv ELSE 0 END) AS sum_a,
               SUM(CASE WHEN batch = 0 THEN 1 ELSE 0 END) AS n_a,
               SUM(CASE WHEN batch = 1 THEN qv ELSE 0 END) AS sum_b,
               SUM(CASE WHEN batch = 1 THEN 1 ELSE 0 END) AS n_b
        FROM q GROUP BY dim)
    SELECT dim, n_a, n_b,
           ROUND((sum_a * 1.0 / n_a - sum_b * 1.0 / n_b)
                 / {_DRIFT_SCALE}, 6) AS mean_shift,
           ABS(sum_a * n_b - sum_b * n_a) > {_DRIFT_CUT} * n_a * n_b
               AS drifted
    FROM agg
    """,
)
def emb_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding distribution drift between two crawl
    batches (vec_id parity stands in for old-vs-new ingest): the
    monitoring query a continuous pipeline runs before trusting a new
    batch's embeddings — encoder version skew, normalization bugs, and
    upstream data shifts all show up as per-dimension mean movement.

    Exactness: components quantize to fixed-point integers
    (floor(x * 10^4) — floor, not cast, because Spark's double->bigint
    cast truncates while DuckDB's rounds); sums are exact integer
    arithmetic and the drift verdict is an integer cross-multiplication
    |sum_a*n_b - sum_b*n_a| > cut*n_a*n_b — no float comparison
    anywhere. The reported mean_shift divides exact integers (identical
    IEEE in both engines) and rounds for display only.

    Spark-first shape: NO explode — the 64 per-dimension sums are 64
    partial-aggregated expressions over element_at, so the corpus-scale
    work is one scan with map-side combine into a 1-row frame; only the
    64-row unpivot runs downstream. The DuckDB oracle explodes 64x
    instead (fine at oracle scale). At 100 TB this is the difference
    between shuffling 64x|corpus| rows and shuffling 64 numbers.
    """
    e = load_table(spark, sf_dir, "embeddings")
    batch = (F.col("vec_id") % 2).alias("batch")

    # identical expression tree to the previous per-column builder, but
    # assembled as SQL strings: 130 F.sum(F.when(...)) column objects
    # cost ~2.5 s of py4j round trips PER CALL at build time (measured
    # r9); two F.expr parses hand the same tree to Catalyst in two calls
    def qv(i: int) -> str:
        return (
            f"cast(floor(cast(element_at(embedding, {i}) as double)"
            f" * {_DRIFT_SCALE}) as bigint)"
        )

    aggs = []
    for i in range(1, _EMB_DIM + 1):
        aggs.append(
            f"sum(case when batch = 0 then {qv(i)} else 0L end) as sa{i}"
        )
        aggs.append(
            f"sum(case when batch = 1 then {qv(i)} else 0L end) as sb{i}"
        )
    counted = e.select(batch, "embedding").agg(
        F.expr("sum(case when batch = 0 then 1 else 0 end) as n_a"),
        F.expr("sum(case when batch = 1 then 1 else 0 end) as n_b"),
        *[F.expr(a) for a in aggs],
    )
    # 64-row unpivot of the single aggregate row (driver-free: stack())
    stacked = counted.select(
        "n_a",
        "n_b",
        F.expr(
            "stack("
            + str(_EMB_DIM)
            + ", "
            + ", ".join(f"{i}, sa{i}, sb{i}" for i in range(1, _EMB_DIM + 1))
            + ") as (dim, sum_a, sum_b)"
        ),
    )
    return stacked.select(
        F.col("dim").cast("long").alias("dim"),
        "n_a",
        "n_b",
        F.round(
            (
                F.col("sum_a") / F.col("n_a")
                - F.col("sum_b") / F.col("n_b")
            )
            / _DRIFT_SCALE,
            6,
        ).alias("mean_shift"),
        (
            F.abs(F.col("sum_a") * F.col("n_b") - F.col("sum_b") * F.col("n_a"))
            > _DRIFT_CUT * F.col("n_a") * F.col("n_b")
        ).alias("drifted"),
    )


# -- per-cluster embedding outlier census -------------------------------------

_OUT_SCALE = 1_000_000  # component -> floor(x * 10^6) BIGINT
# squared distance (at _OUT_SCALE^2 fixed point) above which a vector is
# an outlier vs its label centroid; ~p95 of the fixture's distance
# distribution (mislabeled / corrupted-embedding detection threshold)
_OUT_CUT = 1_030_000_000_000


@query(
    "emb_outliers",
    oracle=f"""
    WITH q AS (
        SELECT vec_id, label, d.dim,
               CAST(FLOOR(CAST(embedding[d.dim] AS DOUBLE) * {_OUT_SCALE})
                    AS BIGINT) AS qv
        FROM embeddings
        CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(1, {_EMB_DIM})) AS dim) d),
    cent AS (
        SELECT label, dim,
               CAST(FLOOR(SUM(qv) * 1.0 / COUNT(*)) AS BIGINT) AS cq
        FROM q GROUP BY label, dim),
    per_vec AS (
        SELECT q.vec_id, q.label,
               SUM((q.qv - c.cq) * (q.qv - c.cq)) AS dist2
        FROM q JOIN cent c ON c.label = q.label AND c.dim = q.dim
        GROUP BY q.vec_id, q.label)
    SELECT label, COUNT(*) AS n_vecs,
           SUM(CASE WHEN dist2 > {_OUT_CUT} THEN 1 ELSE 0 END) AS n_outliers,
           ROUND(MIN(dist2) / 1e12, 6) AS min_dist2,
           ROUND(MAX(dist2) / 1e12, 6) AS max_dist2
    FROM per_vec GROUP BY label ORDER BY label
    """,
)
def emb_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster embedding outlier census: squared Euclidean distance
    of every vector to its LABEL centroid, flagging the far tail —
    the mislabeled/corrupted-vector detection pass a training pipeline
    runs before contrastive sampling or ANN index builds.

    Exactness (the emb_drift fixed-point pattern): components quantize
    to BIGINT (floor(x*1e6)) BEFORE any aggregation, so the centroid
    numerator is an order-independent integer sum; the per-dim centroid
    is floor(sum/n) where sum*1.0 stays under 2^53 (exact IEEE division,
    identical in both engines); dist2 is a pure BIGINT sum (max ~2.6e14,
    no overflow) and the outlier cut is an integer compare — no float
    threshold can flip between engines.

    Scale shape: centroids come from ONE explode + partial-agged
    (label, dim) exchange — output is |labels| x 64 rows, broadcast back
    onto the corpus for a map-side zip_with/aggregate dist2 (the vector
    table is never re-shuffled, no per-vec regroup). Census is a
    |labels|-sized aggregate. At 100 TB: one scan, one tiny exchange,
    one broadcast join, one census exchange."""
    e = load_table(spark, sf_dir, "embeddings")
    qv_arr = F.expr(
        f"transform(embedding,"
        f" x -> cast(floor(cast(x as double) * {_OUT_SCALE}) as bigint))"
    )
    q = e.select(
        "vec_id", "label", F.posexplode(qv_arr).alias("dim0", "qv")
    )
    cent = (
        q.groupBy("label", F.col("dim0").alias("dim"))
        .agg(
            F.floor(F.sum("qv") / F.count(F.lit(1))).cast("bigint").alias("cq")
        )
        .groupBy("label")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(dim, cq))),"
                " s -> s.cq)"
            ).alias("c_arr")
        )
    )
    per_vec = e.select("vec_id", "label", qv_arr.alias("qv_arr")).join(
        F.broadcast(cent), "label"
    ).select(
        "label",
        F.expr(sqdist_bigint("qv_arr", "c_arr", DIM)).alias("dist2"),
    )
    return (
        per_vec.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum(
                F.when(F.col("dist2") > _OUT_CUT, F.lit(1)).otherwise(F.lit(0))
            ).alias("n_outliers"),
            F.round(F.min("dist2") / F.lit(1e12), 6).alias("min_dist2"),
            F.round(F.max("dist2") / F.lit(1e12), 6).alias("max_dist2"),
        )
        .orderBy("label")
    )


@query(
    "emb_silhouette",
    oracle=f"""
    WITH q AS (
        SELECT vec_id, label, d.dim,
               CAST(FLOOR(CAST(embedding[d.dim] AS DOUBLE) * {_OUT_SCALE})
                    AS BIGINT) AS qv
        FROM embeddings
        CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(1, {_EMB_DIM})) AS dim) d),
    cent AS (
        SELECT label, dim,
               CAST(FLOOR(SUM(qv) * 1.0 / COUNT(*)) AS BIGINT) AS cq
        FROM q GROUP BY label, dim),
    per_vec AS (
        SELECT q.vec_id, q.label,
               SUM((q.qv - c.cq) * (q.qv - c.cq)) // 1000 AS dist2m
        FROM q JOIN cent c ON c.label = q.label AND c.dim = q.dim
        GROUP BY q.vec_id, q.label),
    intra AS (
        SELECT label, COUNT(*) AS n_vecs,
               CAST(SUM(dist2m) // COUNT(*) AS BIGINT) AS intra_milli
        FROM per_vec GROUP BY label),
    cpair AS (
        SELECT a.label AS label, b.label AS other_label,
               SUM((a.cq - b.cq) * (a.cq - b.cq)) AS d2
        FROM cent a JOIN cent b
          ON b.dim = a.dim AND b.label <> a.label
        GROUP BY a.label, b.label),
    nearest AS (
        SELECT label, other_label AS nearest_label, d2 AS nearest_d2
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY label
                                           ORDER BY d2, other_label) AS rk
              FROM cpair)
        WHERE rk = 1)
    SELECT i.label, i.n_vecs,
           ROUND(i.intra_milli / 1e9, 6) AS intra_d2,
           n.nearest_label,
           ROUND(n.nearest_d2 / 1e12, 6) AS nearest_centroid_d2,
           n.nearest_d2 // GREATEST(i.intra_milli, 1) AS separation_permille
    FROM intra i JOIN nearest n ON n.label = i.label
    ORDER BY i.label
    """,
)
def emb_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-separation audit (silhouette-lite): per label, the mean
    squared distance of members to their OWN centroid vs the squared
    distance to the NEAREST OTHER centroid — the one-table answer to
    "are these labels actually separated, or is the ANN index built on
    mush?". separation_permille >> 1000 = compact well-separated
    clusters; ~1000 or below = label overlap (IVF probes will leak,
    SemDedup clusters will mix).

    Exactness: the emb_outliers fixed-point chain end-to-end — BIGINT
    quantization before any sum, per-vector dist2 scaled to milli-units
    BEFORE the per-label sum (keeps the sum under 2^63 at 100x+ while
    the division stays pure integer: sum div n, never a float mean),
    centroid-pair distances exact BIGINT, nearest-centroid tie broken
    (d2, label), ratio an integer per-mille.

    Scale shape: centroids from the ONE (label, dim) partial-agged
    exchange emb_outliers already pays; the centroid-pair matrix is
    |labels|^2 x 64 — dims-bounded, never corpus-bounded; per-vector
    distances are the same broadcast zip_with map pass; census output
    is |labels| rows."""
    e = load_table(spark, sf_dir, "embeddings")
    qv_arr = F.expr(
        f"transform(embedding,"
        f" x -> cast(floor(cast(x as double) * {_OUT_SCALE}) as bigint))"
    )
    q = e.select("vec_id", "label", F.posexplode(qv_arr).alias("dim0", "qv"))
    cent_dim = q.groupBy("label", F.col("dim0").alias("dim")).agg(
        F.floor(F.sum("qv") / F.count(F.lit(1))).cast("bigint").alias("cq")
    )
    cent = cent_dim.groupBy("label").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(dim, cq))), s -> s.cq)"
        ).alias("c_arr")
    )
    per_vec = (
        e.select("vec_id", "label", qv_arr.alias("qv_arr"))
        .join(F.broadcast(cent), "label")
        .select(
            "label",
            F.expr(
                f"{sqdist_bigint('qv_arr', 'c_arr', DIM)} div 1000"
            ).alias("dist2m"),
        )
    )
    intra = per_vec.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.expr("sum(dist2m) div count(1)").cast("bigint").alias("intra_milli"),
    )
    a = cent.select(F.col("label"), F.col("c_arr").alias("ca"))
    b = cent.select(
        F.col("label").alias("other_label"), F.col("c_arr").alias("cb")
    )
    cpair = (
        a.join(F.broadcast(b), F.col("label") != F.col("other_label"))
        .select(
            "label",
            "other_label",
            F.expr(sqdist_bigint("ca", "cb", DIM)).alias("d2"),
        )
    )
    nearest = (
        cpair.groupBy("label")
        .agg(F.min(F.struct("d2", "other_label")).alias("m"))
        .select(
            "label",
            F.col("m.other_label").alias("nearest_label"),
            F.col("m.d2").alias("nearest_d2"),
        )
    )
    return (
        intra.join(nearest, "label")
        .select(
            "label",
            "n_vecs",
            F.round(F.col("intra_milli") / F.lit(1e9), 6).alias("intra_d2"),
            "nearest_label",
            F.round(F.col("nearest_d2") / F.lit(1e12), 6).alias(
                "nearest_centroid_d2"
            ),
            F.expr("nearest_d2 div greatest(intra_milli, 1L)").alias(
                "separation_permille"
            ),
        )
        .orderBy("label")
    )


@query(
    "emb_covariance",
    oracle=f"""
    WITH q AS (
        SELECT vec_id, d.dim,
               CAST(FLOOR(CAST(embedding[d.dim] AS DOUBLE) * {_OUT_SCALE})
                    AS BIGINT) AS qv
        FROM embeddings
        CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(1, {_EMB_DIM})) AS dim) d),
    m AS (
        SELECT dim, SUM(qv) // COUNT(*) AS mq FROM q GROUP BY dim),
    c AS (
        SELECT q.vec_id, q.dim, q.qv - m.mq AS cv
        FROM q JOIN m ON m.dim = q.dim),
    p AS (
        SELECT a.dim AS dim_i, b.dim AS dim_j,
               SUM(a.cv * b.cv) AS s, COUNT(*) AS n
        FROM c a JOIN c b ON b.vec_id = a.vec_id
         AND (b.dim = a.dim
              OR (a.dim <= 8 AND b.dim <= 8 AND b.dim > a.dim))
        GROUP BY a.dim, b.dim)
    SELECT dim_i, dim_j, n AS n_vecs,
           s // n AS cov_pico,
           ROUND((s // n) / 1e12, 9) AS cov
    FROM p
    ORDER BY dim_i, dim_j
    """,
)
def emb_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed covariance matrix over the embedding corpus — the
    one-pass Gram-accumulation core of distributed PCA (the d x d
    statistic a driver-side eigensolver turns into principal
    components; d is model-sized, the corpus is not). Emits the full
    diagonal (per-dimension variance) plus the leading 8x8 block —
    enough to read off variance concentration and cross-dim structure
    without a 2080-row dump.

    Exactness: two-pass centered covariance in pure BIGINT — components
    quantized to 1e-6 units BEFORE any sum, per-dimension integer means
    (sum div n, truncation identical in Spark ``div`` and DuckDB
    ``//``), centered products summed exactly, final cov an integer
    div. Negative-value division parity verified (both engines
    truncate toward zero).

    Scale shape: pass 1 is a 64-group partial-agged exchange (means);
    pass 2 broadcasts the 64-entry mean array, builds each vector's
    centered array JVM-side, and map-side explodes ONLY THE OUTPUT
    CELLS — the diagonal plus the strict-upper 8x8 block, 92 structs
    per vector (r8: the cell filter is pushed INTO the explode; the
    old plan generated all d(d+1)/2 = 2080 upper-triangle products and
    filtered 96% of them away afterward — a 22x map-side constant for
    rows the query never returns, the dominant operator-hour on the
    sf10 rung at 147 s). The hash aggregate has 92 groups and the
    exchange carries partitions x 92 rows regardless of corpus size.
    A consumer needing the FULL Gram (distributed PCA's d x d input)
    composes it the emb_pca_power way — this query's contract is the
    variance diagonal + leading block. Products
    |cv|^2 <= 1e12 per vector keep the BIGINT sum in range past 10^6
    vectors; beyond that, drop the quantization scale one decade (the
    knob is the shared _OUT_SCALE pattern). That precondition is now
    CHECKED, not just documented: pass 1 also computes the exact
    per-corpus centered-component bound cmax = max over dims of
    max(mx - mq, mq - mn), and an assert_true fails the job loudly
    when n_vecs * cmax^2 could exceed BIGINT range — the failure says
    "drop _OUT_SCALE a decade" instead of silently wrapping."""
    e = load_table(spark, sf_dir, "embeddings")
    qv_arr = F.expr(
        f"transform(embedding,"
        f" x -> cast(floor(cast(x as double) * {_OUT_SCALE}) as bigint))"
    )
    q = e.select("vec_id", F.posexplode(qv_arr).alias("dim0", "qv"))
    means = (
        q.groupBy(F.col("dim0").alias("dim"))
        .agg(
            F.expr("sum(qv) div count(1)").alias("mq"),
            F.max("qv").alias("mx"),
            F.min("qv").alias("mn"),
            F.count(F.lit(1)).alias("n"),
        )
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(dim, mq))),"
                " s -> s.mq)"
            ).alias("m_arr"),
            F.max(F.greatest(F.col("mx") - F.col("mq"),
                             F.col("mq") - F.col("mn"))).alias("cmax"),
            F.max("n").alias("n_rows"),
        )
        # The when() makes m_arr data-depend on the assertion so column
        # pruning cannot eliminate the check (assert_true yields NULL on
        # success, so the branch is always taken — or the job fails loudly).
        .select(
            F.when(
                F.assert_true(
                    (F.col("cmax").cast("double")
                     * F.col("cmax").cast("double")
                     * F.col("n_rows").cast("double")) < F.lit(9.0e18),
                    F.lit(
                        "emb_covariance BIGINT overflow risk:"
                        " n_vecs * cmax^2 >= 2^63 — drop _OUT_SCALE one"
                        " decade for this corpus"
                    ),
                ).isNull(),
                F.col("m_arr"),
            ).alias("m_arr")
        )
    )
    centered = (
        e.select("vec_id", qv_arr.alias("qv_arr"))
        .join(F.broadcast(means))
        .select(
            F.expr("zip_with(qv_arr, m_arr, (a, b) -> a - b)").alias("cv")
        )
    )
    # only the cells the query RETURNS are generated: j == i (diagonal)
    # plus j > i within the leading 8x8 block — 92 structs per vector,
    # not 2080 (0-based i/j here; the 1-based output adds 1)
    pairs = centered.select(
        F.explode(
            F.expr(
                f"flatten(transform(sequence(0, {_EMB_DIM - 1}),"
                f" i -> transform("
                f"   filter(sequence(i, {_EMB_DIM - 1}),"
                f"          j -> j = i or (i < 8 and j < 8)),"
                f" j -> struct(i + 1 as dim_i, j + 1 as dim_j,"
                f" cv[i] * cv[j] as prod))))"
            )
        ).alias("p")
    ).select("p.dim_i", "p.dim_j", "p.prod")
    agg = pairs.groupBy("dim_i", "dim_j").agg(
        F.sum("prod").alias("s"), F.count(F.lit(1)).alias("n_vecs")
    )
    return (
        agg
        .select(
            "dim_i",
            "dim_j",
            "n_vecs",
            F.expr("s div n_vecs").alias("cov_pico"),
            F.round(F.expr("(s div n_vecs) / 1e12"), 9).alias("cov"),
        )
        .orderBy("dim_i", "dim_j")
    )


_PCA_ITERS = 8  # unrolled power-iteration steps (deterministic, PSD matrix)


def _pca_oracle() -> str:
    """Generate the unrolled power-iteration oracle: covariance CTEs
    (the emb_covariance chain, mirrored to a full matrix), then
    _PCA_ITERS exact integer mat-vec + max-abs-normalize steps."""
    steps = []
    prev = "v0"
    for k in range(1, _PCA_ITERS + 1):
        steps.append(f"""
    u{k} AS (
        SELECT c.dim_i AS dim, SUM(c.val * v.v) AS u
        FROM cfull c JOIN {prev} v ON v.dim = c.dim_j
        GROUP BY c.dim_i),
    m{k} AS (SELECT MAX(ABS(u)) AS m FROM u{k}),
    v{k} AS (
        SELECT dim, u * 1000 // m AS v FROM u{k} CROSS JOIN m{k})""")
        prev = f"v{k}"
    last = _PCA_ITERS
    return f"""
    WITH q AS (
        SELECT vec_id, d.dim,
               CAST(FLOOR(CAST(embedding[d.dim] AS DOUBLE) * {_OUT_SCALE})
                    AS BIGINT) AS qv
        FROM embeddings
        CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(1, {_EMB_DIM})) AS dim) d),
    mn AS MATERIALIZED (SELECT dim, SUM(qv) // COUNT(*) AS mq FROM q GROUP BY dim),
    cv AS MATERIALIZED (
        SELECT q.vec_id, q.dim, q.qv - mn.mq AS c
        FROM q JOIN mn ON mn.dim = q.dim),
    ctri AS MATERIALIZED (
        SELECT a.dim AS dim_i, b.dim AS dim_j,
               SUM(a.c * b.c) // COUNT(*) AS val
        FROM cv a JOIN cv b ON b.vec_id = a.vec_id AND b.dim >= a.dim
        GROUP BY a.dim, b.dim),
    cfull AS MATERIALIZED (
        SELECT dim_i, dim_j, val FROM ctri
        UNION ALL
        SELECT dim_j, dim_i, val FROM ctri WHERE dim_i <> dim_j),
    v0 AS (
        SELECT UNNEST(GENERATE_SERIES(1, {_EMB_DIM})) AS dim,
               CAST(1000 AS BIGINT) AS v),{",".join(steps)},
    tr AS (
        SELECT SUM(val) AS trace FROM ctri WHERE dim_i = dim_j)
    SELECT f.dim, f.v AS evec_milli,
           m.m // 1000 AS eig_pico,
           ROUND((m.m // 1000) / 1e12, 9) AS eigenvalue,
           (m.m // 1000) * 1000 // t.trace AS explained_permille
    FROM v{last} f CROSS JOIN m{last} m CROSS JOIN tr t
    ORDER BY f.dim
    """


@query("emb_pca_power", oracle=_pca_oracle())
def emb_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component by POWER ITERATION in pure integer
    arithmetic — the follow-through on emb_covariance: the corpus
    reduces once to the exact 64x64 covariance matrix (BIGINT pico
    units), then 8 unrolled mat-vec + max-abs-normalize steps run on
    the dims-bounded table, yielding the dominant eigenvector (milli
    units), its eigenvalue, and the explained-variance share. The
    "which direction holds the variance" audit that decides whether
    embeddings need whitening before ANN/SemDedup.

    Exactness: iterative float linear algebra is rank-UNSTABLE across
    engines (summation order flips signs of near-ties), so every step
    here is exact: the covariance integers are the emb_covariance
    chain; each mat-vec term val*v <= ~1e15 sums over 64 dims far
    under 2^63 BECAUSE the vector renormalizes to max-abs = 1000 every
    step (truncating integer division, parity verified); the
    eigenvalue estimate is the last growth factor m/1000, an integer.
    The matrix is PSD, so no sign oscillation; 8 steps settle the
    dominant direction to the milli grid deterministically.

    Scale shape: corpus work is exactly emb_covariance's (two
    partial-agged exchanges, 2080-group hash agg); the matrix then
    collapses to ONE row-major array row and the iteration runs as
    chained array expressions on that 1-row relation — ZERO exchanges,
    8 single-task micro-jobs (the per-round localCheckpoint barrier
    that keeps Catalyst's expression tree linear) — at 100 TB the
    eigensolve costs the SAME as at 1 GB, which is the whole point of
    reducing to sufficient statistics."""
    e = load_table(spark, sf_dir, "embeddings")
    qv_arr = F.expr(
        f"transform(embedding,"
        f" x -> cast(floor(cast(x as double) * {_OUT_SCALE}) as bigint))"
    )
    q = e.select("vec_id", F.posexplode(qv_arr).alias("dim0", "qv"))
    means = (
        q.groupBy(F.col("dim0").alias("dim"))
        .agg(F.expr("sum(qv) div count(1)").alias("mq"))
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(dim, mq))),"
                " s -> s.mq)"
            ).alias("m_arr")
        )
    )
    centered = (
        e.select("vec_id", qv_arr.alias("qv_arr"))
        .join(F.broadcast(means))
        .select(F.expr("zip_with(qv_arr, m_arr, (a, b) -> a - b)").alias("cv"))
    )
    # r9: the full 64x64 matrix (the eigensolve needs every cell, so
    # emb_covariance's 92-cell pruning cannot apply) used to come from
    # a 2080-structs-per-vector explode + (dim_i, dim_j) hash agg —
    # 4.2M generated rows at sf0.1 for 2000 vectors. Guide 4.2 instead:
    # ONE exact int64 M^T @ M per Arrow batch inside mapInPandas
    # (pass ONLY the cv column), one accumulated partial matrix per
    # TASK, then a 4096-cell integer sum over <= n_tasks tiny rows.
    # Exactness: numpy int64 matmul is exact integer arithmetic and
    # the cross-task sum runs in Spark's checked bigint; per-task
    # |partial[k]| <= n_rows * cmax^2, the SAME bound emb_covariance's
    # assert_true guards globally, so no new overflow surface. Cell
    # values verified identical to the explode form over all 4096
    # cells at sf0.1 (and the oracle compare re-run at sf0.01/sf0.1).
    # A/B: covariance stage 3.61 -> 1.80 s min-of-3.
    d = _EMB_DIM

    def _cov_partials(it):
        import numpy as np
        import pandas as pd

        tot = None
        n = 0
        for pdf in it:
            if len(pdf) == 0:
                continue
            m = np.array(pdf["cv"].tolist(), dtype=np.int64)
            p = m.T @ m
            tot = p if tot is None else tot + p
            n += len(pdf)
        if tot is not None:
            yield pd.DataFrame({"s": [tot.reshape(-1).tolist()], "n": [n]})

    parts = ensure_min_partitions(centered.select("cv")).mapInPandas(
        _cov_partials, "s array<bigint>, n bigint"
    )
    csum = (
        parts.select(F.posexplode("s").alias("k", "v"), "n")
        .groupBy("k")
        .agg(F.sum("v").alias("sv"), F.sum("n").alias("nv"))
        .select("k", F.expr("sv div nv").alias("val"))
    )
    # collapse the matrix to ONE row-major array row: the whole
    # eigensolve then runs as chained array expressions on a 1-row
    # relation — ZERO exchanges for the iteration (an earlier draft
    # iterated as 8 join+agg rounds of 64-row tables: correct, but
    # ~3 s of stage-scheduling latency per round; the statistic is
    # dims-bounded, so it belongs in one task). k is 0-based row-major
    # (i-1)*d + (j-1), so the sorted collect_list positions line up
    # with the c[(i - 1) * d + j - 1] lookups below exactly as the old
    # 1-based dim_i * d + dim_j keys did.
    state = csum.groupBy().agg(
        F.expr(
            "transform(array_sort(collect_list("
            "struct(k, val))), s -> s.val)"
        ).alias("c")
    ).select(
        "c",
        F.expr(
            f"transform(sequence(1, {d}), i -> cast(1000 as bigint))"
        ).alias("v"),
    )
    # r9: the 8 rounds run as ONE nested-lambda expression instead of 8
    # per-round localCheckpoint barriers. The barrier existed because
    # ProjectCollapse duplicated each round's u/v subtree into the next
    # round (2^rounds planning blowup); binding each round's vector as
    # a single-element-array LAMBDA VARIABLE (transform(array(expr),
    # vk -> body)[0]) makes every reference a variable lookup, so the
    # tree grows LINEARLY in rounds and the whole eigensolve is one
    # 1-row single-task projection — the 8 sequential micro-jobs (one
    # job submission + AQE compile each, ~1.5 s of the query's wall at
    # sf0.1) disappear. Arithmetic per round is unchanged:
    # u = C*v; m = max|u|; v' = u * 1000 div m.
    def _mv(v: str) -> str:
        return (
            f"transform(sequence(1, {d}), i -> aggregate(sequence(1, {d}),"
            f" cast(0 as bigint),"
            f" (acc, j) -> acc + c[(i - 1) * {d} + j - 1] * {v}[j - 1]))"
        )

    vexpr = "v"
    for k in range(1, _PCA_ITERS):
        vexpr = (
            f"transform(array({vexpr}), v{k} ->"
            f" transform(array({_mv(f'v{k}')}), u{k} ->"
            f" transform(u{k}, x -> x * 1000"
            f" div array_max(transform(u{k}, y -> abs(y)))))[0])[0]"
        )
    fin = (
        f"transform(array({vexpr}), vf ->"
        f" transform(array({_mv('vf')}), uf ->"
        f" struct(transform(uf, x -> x * 1000"
        f" div array_max(transform(uf, y -> abs(y)))) as v,"
        f" array_max(transform(uf, y -> abs(y))) as m))[0])[0]"
    )
    final = state.select(
        F.expr(f"({fin}).v").alias("v"),
        F.expr(f"({fin}).m").alias("m"),
        F.expr(
            f"aggregate(sequence(1, {d}), cast(0 as bigint),"
            f" (acc, i) -> acc + c[(i - 1) * {d + 1}])"
        ).alias("trace"),
    )
    return final.select(
        F.posexplode("v").alias("dim0", "evec_milli"),
        F.expr("m div 1000").alias("eig_pico"),
        F.round(F.expr("(m div 1000) / 1e12"), 9).alias("eigenvalue"),
        F.expr("(m div 1000) * 1000 div trace").alias("explained_permille"),
    ).select(
        (F.col("dim0") + 1).cast("bigint").alias("dim"),
        "evec_milli",
        "eig_pico",
        "eigenvalue",
        "explained_permille",
    ).orderBy("dim")


# Johnson-Lindenstrauss random projection: d=64 -> k=16 with Rademacher
# (+/-1) entries seeded from md5("rp_{j}_{i}") parity — the sign matrix
# is a CONSTANT computed once here and inlined as the same literal into
# the Spark expression and the DuckDB oracle, so both engines project
# with the identical matrix (a production run swaps the seed string).
_RP_K = 16
_RP_SCALE = 10_000  # 1e4 keeps p2*1000 inside BIGINT (see docstring)


def _rp_signs() -> list[list[int]]:
    import hashlib

    return [
        [
            1
            if int(hashlib.md5(f"rp_{j}_{i}".encode()).hexdigest()[:7], 16) % 2
            == 0
            else -1
            for i in range(_EMB_DIM)
        ]
        for j in range(_RP_K)
    ]


def _rp_oracle() -> str:
    signs = _rp_signs()
    mat = ", ".join(
        "[" + ", ".join(str(s) for s in row) + "]" for row in signs
    )
    return f"""
    WITH q AS (
        SELECT vec_id,
               [CAST(FLOOR(CAST(x AS DOUBLE) * {_RP_SCALE}) AS BIGINT)
                FOR x IN embedding] AS qv
        FROM embeddings),
    s AS (SELECT [{mat}] AS m),
    pr AS (
        SELECT vec_id,
               [CAST(list_dot_product(qv, mj) AS BIGINT) FOR mj IN m]
                   AS proj,
               CAST(list_dot_product(qv, qv) AS BIGINT) AS q2
        FROM q CROSS JOIN s),
    r AS (
        SELECT vec_id,
               CAST(list_dot_product(proj, proj) AS BIGINT) AS p2, q2
        FROM pr WHERE q2 > 0)
    SELECT p2 * 1000 // ({_RP_K} * q2) // 100 AS bucket,
           COUNT(*) AS n_vecs,
           SUM(p2 * 1000 // ({_RP_K} * q2)) // COUNT(*)
               AS mean_ratio_permille
    FROM r GROUP BY bucket ORDER BY bucket
    """


@query("emb_random_projection", oracle=_rp_oracle())
def emb_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss RANDOM PROJECTION distortion census — the
    dimensionality-reduction workhorse (d=64 -> k=16 via a seeded
    Rademacher matrix) measured the way JL guarantees it: for every
    vector, the squared-norm ratio ||Pv||^2 / (k * ||v||^2) should
    concentrate near 1.0 (E[||Pv||^2] = k||v||^2 for +/-1 entries).
    The output histograms that ratio in 0.1-wide per-mille buckets —
    the empirical concentration curve that tells you whether k is
    large enough before you commit the cheap projected representation
    to the ANN index (sim_* family) or the dedup embedding store.

    Exactness: components quantize to integer 1e-4 units BEFORE the
    mat-vec; the projection is +/-1 dot products (exact BIGINT sums,
    |p2|*1000 <= ~7e15 at this scale — in range by construction, the
    emb_covariance headroom discipline); ratios are integer per-mille
    floor-divisions. The sign matrix is the same md5-parity literal in
    both engines.

    Scale shape: pure map — transform(sequence(0,k-1)) folds the
    zip_with dot product INSIDE the row, no explode, no join; the only
    exchange is the |buckets|-row histogram aggregate. At 100 TB the
    projection is scan-speed and the reduced vectors are 4x smaller
    for every downstream shuffle."""
    signs = _rp_signs()
    mat = ", ".join(
        "array(" + ", ".join(str(s) for s in row) + ")" for row in signs
    )
    e = load_table(spark, sf_dir, "embeddings")
    q = e.select(
        F.expr(
            f"transform(embedding,"
            f" x -> cast(floor(cast(x as double) * {_RP_SCALE}) as bigint))"
        ).alias("qv")
    )
    pr = q.select(
        F.expr(
            f"transform(array({mat}), mj -> {dot_bigint('qv', 'mj', DIM)})"
        ).alias("proj"),
        F.expr(dot_bigint("qv", "qv", DIM)).alias("q2"),
    )
    r = pr.where(F.col("q2") > 0).select(
        F.expr(dot_bigint("proj", "proj", _RP_K)).alias("p2"),
        "q2",
    )
    ratio = F.expr(f"p2 * 1000 div ({_RP_K} * q2)")
    return (
        r.select(ratio.alias("ratio_permille"))
        .groupBy(F.expr("ratio_permille div 100").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.expr("sum(ratio_permille) div count(1)").alias(
                "mean_ratio_permille"
            ),
        )
        .orderBy("bucket")
    )


# -- balanced k-means assignment (capacity-capped IVF build) -----------------

_BAL_SLACK_PCT = 125  # cap = ceil(n / k * 1.25)


@query(
    "emb_kmeans_balanced",
    oracle=f"""
    WITH {_O_BASE},
    {_O_CENT},
    tot AS (
        SELECT COUNT(*) AS n, (SELECT COUNT(*) FROM cent) AS k FROM base),
    cap AS (
        SELECT CAST(CEIL(n * {_BAL_SLACK_PCT} / (k * 100.0)) AS BIGINT)
            AS cap FROM tot),
    ranked AS (
        SELECT b.vec_id, c.label AS cluster,
               ROW_NUMBER() OVER (
                   PARTITION BY b.vec_id
                   ORDER BY {_o_d2('b.e', 'c.ce')} ASC, c.label) AS rk,
               {_o_d2('b.e', 'c.ce')} AS d2
        FROM base b CROSS JOIN cent c),
    primary_a AS (
        SELECT vec_id, cluster, d2,
               ROW_NUMBER() OVER (PARTITION BY cluster
                                  ORDER BY d2 ASC, vec_id) AS fill
        FROM ranked WHERE rk = 1),
    kept AS (
        SELECT p.vec_id, p.cluster FROM primary_a p CROSS JOIN cap
        WHERE p.fill <= cap.cap),
    spilled AS (
        SELECT r.vec_id, r.cluster
        FROM ranked r
        JOIN primary_a p ON p.vec_id = r.vec_id CROSS JOIN cap
        WHERE p.fill > cap.cap AND r.rk = 2),
    final AS (
        SELECT vec_id, cluster, 0 AS is_spill FROM kept
        UNION ALL SELECT vec_id, cluster, 1 AS is_spill FROM spilled)
    SELECT f.cluster,
           SUM(CASE WHEN is_spill = 0 THEN 1 ELSE 0 END) AS n_primary,
           SUM(is_spill) AS n_spill_in,
           COUNT(*) AS n_total,
           COUNT(*) * 1000 // MAX(cap.cap) AS fill_permille
    FROM final f CROSS JOIN cap GROUP BY f.cluster
    """,
)
def emb_kmeans_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capacity-capped nearest-centroid assignment — the balanced IVF
    build (faiss-style two-choice balancing): each vector goes to its
    nearest per-label centroid, every cluster keeps only its closest
    cap = ceil(1.25 * n/k) members, overflow re-lands on the vector's
    SECOND-nearest centroid. Balanced cells keep ANN probe latency
    uniform — an unbalanced IVF list is the query-time skew the build
    pays to avoid. Reports per-cluster primary/spill/fill census.

    Scale shape: centroids are k broadcast rows; nearest + runner-up
    assignment is a map-side cross with a per-vec_id window over k rows
    (vec_id partitions — perfectly uniform). The capacity rank is ONE
    window per cluster ordered by distance: k groups of ~n/k rows — the
    balance the operator itself enforces is what bounds its own window
    groups. Distances are rounded squared-L2 (one IEEE chain, identical
    in both engines); every census column is exact integer arithmetic.
    """
    base = _base(spark, sf_dir)
    cent = _centroids(base)
    w_near = Window.partitionBy("vec_id").orderBy(
        _d2("e", "ce").asc(), F.col("label").asc()
    )
    ranked = (
        base.select("vec_id", "e")
        .crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            F.col("label").alias("cluster"),
            F.row_number().over(w_near).alias("rk"),
            _d2("e", "ce").alias("d2"),
        )
        .filter(F.col("rk") <= 2)
    )
    tot = base.agg(F.count(F.lit(1)).alias("n")).crossJoin(
        F.broadcast(cent.agg(F.count(F.lit(1)).alias("k")))
    )
    cap = tot.select(
        F.expr(
            f"cast(ceil(n * {_BAL_SLACK_PCT} / (k * 100.0)) as bigint)"
        ).alias("cap")
    )
    w_fill = Window.partitionBy("cluster").orderBy(
        F.col("d2").asc(), F.col("vec_id").asc()
    )
    primary = (
        ranked.filter(F.col("rk") == 1)
        .withColumn("fill", F.row_number().over(w_fill))
        .crossJoin(F.broadcast(cap))
    )
    kept = primary.filter(F.col("fill") <= F.col("cap")).select(
        "vec_id", "cluster", F.lit(0).alias("is_spill")
    )
    spilled = (
        primary.filter(F.col("fill") > F.col("cap"))
        .select("vec_id")
        .join(ranked.filter(F.col("rk") == 2), "vec_id")
        .select("vec_id", "cluster", F.lit(1).alias("is_spill"))
    )
    return (
        kept.unionAll(spilled)
        .crossJoin(F.broadcast(cap))
        .groupBy("cluster")
        .agg(
            F.sum(F.when(F.col("is_spill") == 0, 1).otherwise(0)).alias(
                "n_primary"
            ),
            F.sum("is_spill").alias("n_spill_in"),
            F.count(F.lit(1)).alias("n_total"),
            F.expr("count(1) * 1000 div max(cap)").alias("fill_permille"),
        )
    )
