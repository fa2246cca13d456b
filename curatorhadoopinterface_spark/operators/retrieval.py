"""Retrieval-side operators for a training-data platform (LLM-pipeline
extension list: the ranking/curation ops that sit on top of the
index_inverted / similarity.py families).

- query_bm25:     Okapi BM25 ranking of the ``documents`` corpus for a
  fixed term query — the retrieval scorer every dataset-search /
  decontamination tool runs over the corpus index. Expressed as pure
  column algebra: per-document term frequencies come from array-local
  ``filter()`` counts (no explode), corpus statistics (N, avgdl, per-term
  document frequency) are ONE tiny aggregate row broadcast back over the
  scan, and the score is a fixed-order sum of per-term contributions.
- dedup_semantic: SemDedup (Abbas et al., 2023, arXiv:2303.09540) —
  within-cluster pairwise cosine over embeddings; a vector is dropped
  when a lower-id member of the SAME cluster is more similar than the
  threshold. The cluster key makes the join equi (shuffle moves
  clusters, never the corpus cross product); the ``label`` column is the
  coarse k-means assignment (kmeans_lloyd builds exactly these
  centroids/assignments at index time).

Determinism contract (same as similarity.py / mlops.py): dot products
are sequential left folds after exact float->double widening; cosines
and score terms are rounded to 6 decimals BEFORE any threshold compare
or ranking; ranking ties break on doc_id/vec_id; cross-group sums are
fixed-order sums of pre-rounded terms, never order-dependent double
reductions.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from curatorhadoopinterface_spark.functions.vec import dot_float_as_double
from curatorhadoopinterface_spark.operators import query
from curatorhadoopinterface_spark.session import ensure_min_partitions, load_table

_DIM = 64  # embeddings fixture dimension (FIXTURES.md)

# BM25 constants (the canonical Robertson/Sparck-Jones parameterization).
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TERMS = ("spark", "join", "filter")  # fixed query, present in the fixture
BM25_TOP = 10

SEMDEDUP_COS = 0.3  # calibrated to the synthetic fixture (real corpora: ~0.95+)


def _tf_cols_spark(df: DataFrame) -> DataFrame:
    """Per-document length + one tf column per query term, all array-local
    (filter+size over the split words — no explode, stays in codegen)."""
    words = F.split(F.col("text"), " ")

    def matcher(term: str):
        # one-arg closure: a two-parameter lambda would make PySpark pass
        # the (element, index) pair and bind the term to the index column
        return lambda w: w == F.lit(term)

    return df.select(
        "doc_id",
        F.size(words).alias("dl"),
        *[
            F.size(F.filter(words, matcher(t))).alias(f"tf_{t}")
            for t in BM25_TERMS
        ],
    )


_O_TF = (
    "SELECT doc_id, LEN(STRING_SPLIT(text, ' ')) AS dl,\n"
    + ",\n".join(
        f"           LEN(LIST_FILTER(STRING_SPLIT(text, ' '), w -> w = '{t}'))"
        f" AS tf_{t}"
        for t in BM25_TERMS
    )
    + "\n    FROM documents"
)

_O_STATS = (
    "SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl,\n"
    + ",\n".join(
        f"           SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}"
        for t in BM25_TERMS
    )
    + "\n    FROM tf"
)


def _o_contrib(t: str) -> str:
    """One term's BM25 contribution, rounded to 6 before the fixed-order
    sum. idf uses the +1 form (always positive)."""
    idf = f"LN((s.n_docs - s.df_{t} + 0.5) / (s.df_{t} + 0.5) + 1)"
    tfn = (
        f"tf.tf_{t} * ({BM25_K1} + 1) / (tf.tf_{t} + {BM25_K1} *"
        f" (1 - {BM25_B} + {BM25_B} * tf.dl / (s.sum_dl * 1.0 / s.n_docs)))"
    )
    return f"ROUND({idf} * {tfn}, 6)"


@query(
    "query_bm25",
    oracle=f"""
    WITH tf AS (
    {_O_TF}),
    s AS (
    {_O_STATS})
    SELECT tf.doc_id, tf.dl,
           {', '.join(f'tf.tf_{t}' for t in BM25_TERMS)},
           ROUND({' + '.join(_o_contrib(t) for t in BM25_TERMS)}, 6) AS score
    FROM tf CROSS JOIN s
    WHERE {' + '.join(f'tf.tf_{t}' for t in BM25_TERMS)} > 0
    ORDER BY score DESC, tf.doc_id
    LIMIT {BM25_TOP}
    """,
)
def query_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-{k} for the fixed query over ``documents``.

    Plan shape (the 100 TB one): pass 1 computes the corpus statistics —
    N, total doc length, per-term document frequency — as one
    partial-aggregated row over a narrow projection (tf columns are
    array-local ``size(filter(...))``, so nothing explodes and the agg is
    map-side-combined down to one row per partition). That single row is
    broadcast back over pass 2's scan; the per-document score is a
    fixed-order sum of per-term contributions each rounded to 6 decimals
    (cross-libm ``ln`` ulp dust can't flip the ranking), and the top-10
    is a TakeOrdered — no global sort materializes.
    """
    d = load_table(spark, sf_dir, "documents")
    tf = _tf_cols_spark(d)
    stats = tf.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum(F.when(F.col(f"tf_{t}") > 0, 1).otherwise(0)).alias(f"df_{t}")
            for t in BM25_TERMS
        ],
    )

    def contrib(t: str):
        idf = F.log(
            (F.col("n_docs") - F.col(f"df_{t}") + 0.5) / (F.col(f"df_{t}") + 0.5)
            + 1
        )
        avgdl = F.col("sum_dl") * 1.0 / F.col("n_docs")
        tfn = (
            F.col(f"tf_{t}")
            * (BM25_K1 + 1)
            / (
                F.col(f"tf_{t}")
                + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / avgdl)
            )
        )
        return F.round(idf * tfn, 6)

    score = F.round(
        sum((contrib(t) for t in BM25_TERMS[1:]), contrib(BM25_TERMS[0])), 6
    )
    hits = F.col(f"tf_{BM25_TERMS[0]}")
    for t in BM25_TERMS[1:]:
        hits = hits + F.col(f"tf_{t}")
    return (
        tf.crossJoin(F.broadcast(stats))
        .filter(hits > 0)
        .select(
            "doc_id",
            "dl",
            *[f"tf_{t}" for t in BM25_TERMS],
            score.alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(BM25_TOP)
    )


# ---- SemDedup --------------------------------------------------------------

_O_BASE = """
    base AS (
        SELECT vec_id, label, embedding::DOUBLE[] AS e,
               SQRT(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
        FROM embeddings)
"""


@query(
    "dedup_semantic",
    oracle=f"""
    WITH {_O_BASE},
    pairs AS (
        SELECT a.label AS label, b.vec_id AS dup_id
        FROM base a JOIN base b
          ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE ROUND(list_dot_product(a.e, b.e) / (a.norm * b.norm), 6)
              >= {SEMDEDUP_COS}),
    dropped AS (
        SELECT label, COUNT(DISTINCT dup_id) AS n_dropped
        FROM pairs GROUP BY label),
    counts AS (SELECT label, COUNT(*) AS n_vecs FROM base GROUP BY label)
    SELECT c.label, c.n_vecs,
           COALESCE(d.n_dropped, 0) AS n_dropped,
           c.n_vecs - COALESCE(d.n_dropped, 0) AS n_kept
    FROM counts c LEFT JOIN dropped d ON d.label = c.label
    """,
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDedup: drop a vector when a lower-id member of the SAME coarse
    cluster exceeds the cosine threshold; report per-cluster kept/dropped.

    Plan shape: the pair join is EQUI on the cluster key — the shuffle
    moves each cluster to one partition and the quadratic work is
    per-cluster-local, exactly the SemDedup contract (at 100 TB the
    k-means k is chosen so clusters hold ~1e3-1e4 vectors, keeping the
    local pair loop bounded; kmeans_lloyd is that assignment pass).
    Dropped-set dedup (COUNT DISTINCT dup_id) and the per-cluster counts
    are both partial-aggregated on the same key, so the whole query is
    one cluster-keyed exchange plus a tiny summary join.
    """
    base = ensure_min_partitions(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "label", "embedding",
        F.sqrt(
            F.expr(dot_float_as_double("embedding", "embedding", _DIM))
        ).alias("norm"),
    )
    cos = F.round(
        F.expr(dot_float_as_double("a.embedding", "b.embedding", _DIM))
        / (F.col("a.norm") * F.col("b.norm")),
        6,
    )
    pairs = (
        base.alias("a")
        .join(
            base.alias("b"),
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(cos >= SEMDEDUP_COS)
        .select(F.col("a.label").alias("label"), F.col("b.vec_id").alias("dup_id"))
    )
    dropped = pairs.groupBy("label").agg(
        F.countDistinct("dup_id").alias("n_dropped")
    )
    counts = base.groupBy("label").agg(F.count("*").alias("n_vecs"))
    return (
        counts.join(dropped, "label", "left")
        .select(
            "label",
            "n_vecs",
            F.coalesce(F.col("n_dropped"), F.lit(0)).alias("n_dropped"),
            (F.col("n_vecs") - F.coalesce(F.col("n_dropped"), F.lit(0))).alias(
                "n_kept"
            ),
        )
    )


#: scaled-k target: max vectors per (label x sign-pattern) sub-cluster
#: before another splitting bit is added
SEMDEDUP_TARGET = 512


@query(
    "dedup_semantic_scaledk",
    oracle=f"""
    WITH {_O_BASE},
    nb AS (
        SELECT LENGTH(LTRIM(BIN(
                   ((COUNT(*) + {SEMDEDUP_TARGET * 10 - 1})
                    // {SEMDEDUP_TARGET * 10}) - 1), '0')) AS bits
        FROM base),
    keyed AS (
        SELECT vec_id, e, norm,
               label || '_' ||
               COALESCE(ARRAY_TO_STRING(LIST_TRANSFORM(
                   GENERATE_SERIES(1, (SELECT bits FROM nb)),
                   i -> CASE WHEN e[i] >= 0 THEN '1' ELSE '0' END), ''), '')
                   AS ck
        FROM base),
    pairs AS (
        SELECT a.ck AS ck, b.vec_id AS dup_id
        FROM keyed a JOIN keyed b
          ON a.ck = b.ck AND a.vec_id < b.vec_id
        WHERE ROUND(list_dot_product(a.e, b.e) / (a.norm * b.norm), 6)
              >= {SEMDEDUP_COS}),
    dropped AS (SELECT COUNT(DISTINCT dup_id) AS n_dropped FROM pairs),
    clus AS (SELECT ck, COUNT(*) AS n FROM keyed GROUP BY ck)
    SELECT (SELECT COUNT(*) FROM base) AS n_vecs,
           (SELECT bits FROM nb) AS bits,
           (SELECT COUNT(*) FROM clus) AS n_clusters,
           (SELECT MAX(n) FROM clus) AS max_cluster,
           (SELECT n_dropped FROM dropped) AS n_dropped,
           (SELECT COUNT(*) FROM base) - (SELECT n_dropped FROM dropped)
               AS n_kept
    """,
)
def dedup_semantic_scaledk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDedup with the k-PROPORTIONAL-TO-CORPUS policy made executable
    — the contract dedup_semantic documents (and stress_semdedup
    measures) but cannot itself enforce, because its cluster count is
    the fixture's fixed 10 labels (quadratic per-cluster work at 30x:
    15k-vector clusters -> 2e9 pairs, excluded from the 30x sweep by
    contract).

    Mechanism: the coarse label splits further by the SIGN PATTERN of
    the first ``bits`` embedding dimensions (the sim_lsh_topk SRP
    bucketing), where ``bits = ceil(log2(ceil(n / (10 * 512))))`` —
    INTEGER-exact in both engines via the BIN-length identity
    (ceil(log2 x) = length of binary(x-1)), never a libm log2 whose ulp
    could flip a boundary. Cluster count therefore DOUBLES as the corpus
    doubles and expected cluster size stays ~512: the within-cluster
    pair join is bounded at any corpus size. sf0.1: bits=0 (reduces to
    dedup_semantic); 10x: bits=2; 30x: bits=4.

    Trades, stated honestly: near-duplicates straddling a sign boundary
    are missed (the standard LSH-partitioned-dedup recall trade —
    SemDedup itself accepts cross-cluster misses), and sign-pattern
    buckets can skew on correlated dimensions (max_cluster is an OUTPUT
    column so the skew is measured, not assumed); production swaps the
    splitter for kmeans_lloyd assignment with the same k schedule.
    """
    base = ensure_min_partitions(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id",
        "label",
        "embedding",
        F.sqrt(
            F.expr(dot_float_as_double("embedding", "embedding", _DIM))
        ).alias("norm"),
    )
    tgt = SEMDEDUP_TARGET * 10
    nb = base.agg(
        F.expr(
            f"length(trim(LEADING '0' FROM"
            f" bin(((count(1) + {tgt - 1}) div {tgt}) - 1)))"
        ).alias("bits")
    )
    keyed = (
        base.crossJoin(F.broadcast(nb))
        .withColumn(
            "ck",
            F.concat(
                F.col("label").cast("string"),
                F.lit("_"),
                # Spark's sequence(1, 0) is DESCENDING [1, 0] (DuckDB's
                # GENERATE_SERIES(1, 0) is empty) — guard bits = 0
                F.expr(
                    "CASE WHEN bits < 1 THEN ''"
                    " ELSE array_join(transform(sequence(1, bits),"
                    " i -> CASE WHEN element_at(embedding, i) >= 0"
                    " THEN '1' ELSE '0' END), '') END"
                ),
            ),
        )
        .select("vec_id", "embedding", "norm", "ck")
    )
    cos = F.round(
        F.expr(dot_float_as_double("a.embedding", "b.embedding", _DIM))
        / (F.col("a.norm") * F.col("b.norm")),
        6,
    )
    pairs = (
        keyed.alias("a")
        .join(
            keyed.alias("b"),
            (F.col("a.ck") == F.col("b.ck"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(cos >= SEMDEDUP_COS)
        .select(F.col("b.vec_id").alias("dup_id"))
    )
    clus = keyed.groupBy("ck").agg(F.count(F.lit(1)).alias("n"))
    summary = (
        base.agg(F.count(F.lit(1)).alias("n_vecs"))
        .crossJoin(F.broadcast(nb))
        .crossJoin(
            F.broadcast(
                clus.agg(
                    F.count(F.lit(1)).alias("n_clusters"),
                    F.max("n").alias("max_cluster"),
                )
            )
        )
        .crossJoin(
            F.broadcast(
                pairs.agg(F.countDistinct("dup_id").alias("n_dropped"))
            )
        )
    )
    return summary.select(
        "n_vecs",
        "bits",
        "n_clusters",
        "max_cluster",
        "n_dropped",
        (F.col("n_vecs") - F.col("n_dropped")).alias("n_kept"),
    )


# ---- Hybrid retrieval: reciprocal rank fusion ------------------------------

RRF_K = 60  # the canonical Cormack/Clarke/Buettcher constant
RRF_CAND = 50  # per-list candidate depth
RRF_TOP = 10
RRF_QUERY_VEC = 0  # the dense query vector (embeddings.vec_id)

_O_SPARSE_SCORED = f"""
    tf AS (
    {_O_TF}),
    s AS (
    {_O_STATS}),
    sparse AS (
        SELECT doc_id, rk AS bm25_rank FROM (
            SELECT tf.doc_id,
                   ROW_NUMBER() OVER (
                       ORDER BY ROUND({' + '.join(_o_contrib(t) for t in BM25_TERMS)}, 6) DESC,
                                tf.doc_id) AS rk
            FROM tf CROSS JOIN s
            WHERE {' + '.join(f'tf.tf_{t}' for t in BM25_TERMS)} > 0)
        WHERE rk <= {RRF_CAND})
"""

_O_DENSE_SCORED = f"""
    base AS (
        SELECT vec_id, embedding::DOUBLE[] AS e,
               SQRT(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
        FROM embeddings),
    qv AS (SELECT * FROM base WHERE vec_id = {RRF_QUERY_VEC}),
    dense AS (
        SELECT vec_id AS doc_id, rk AS dense_rank FROM (
            SELECT c.vec_id,
                   ROW_NUMBER() OVER (
                       ORDER BY ROUND(list_dot_product(qv.e, c.e)
                                      / (qv.norm * c.norm), 6) DESC,
                                c.vec_id) AS rk
            FROM base c CROSS JOIN qv
            WHERE c.vec_id <> {RRF_QUERY_VEC})
        WHERE rk <= {RRF_CAND})
"""


@query(
    "query_hybrid_rrf",
    oracle=f"""
    WITH {_O_SPARSE_SCORED},
    {_O_DENSE_SCORED}
    SELECT COALESCE(sp.doc_id, de.doc_id) AS doc_id,
           sp.bm25_rank, de.dense_rank,
           ROUND(COALESCE(1.0 / ({RRF_K} + sp.bm25_rank), 0.0)
               + COALESCE(1.0 / ({RRF_K} + de.dense_rank), 0.0), 9) AS rrf_score
    FROM sparse sp FULL OUTER JOIN dense de ON de.doc_id = sp.doc_id
    ORDER BY rrf_score DESC, doc_id
    LIMIT {RRF_TOP}
    """,
)
def query_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid sparse+dense retrieval fused with Reciprocal Rank Fusion
    (Cormack et al., SIGIR'09): score(d) = sum over lists of
    1/(k + rank_list(d)), k=60, over the BM25 top-{RRF_CAND} and the
    embedding-cosine top-{RRF_CAND} for one query. The fusion every
    hybrid dataset-search / decontamination stack runs when lexical and
    vector indexes disagree.

    Determinism: ranks are integers from (rounded score, id)-ordered
    ROW_NUMBER; the fused score is a TWO-term fixed-order double sum of
    exactly representable reciprocals — identical in any engine — then
    rounded to 9.

    Plan shape (the 100 TB one): each list is a TakeOrdered({RRF_CAND})
    over its scan — the BM25 side broadcasts its one corpus-stats row,
    the dense side broadcasts the single query vector; neither side
    global-sorts the corpus. The rank windows and the full-outer fusion
    join run on two {RRF_CAND}-row lists (constant size regardless of
    corpus scale), so fusion cost never grows with data volume.
    """
    # sparse list: BM25 candidates (same algebra as query_bm25)
    d = load_table(spark, sf_dir, "documents")
    tf = _tf_cols_spark(d)
    stats = tf.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum(F.when(F.col(f"tf_{t}") > 0, 1).otherwise(0)).alias(f"df_{t}")
            for t in BM25_TERMS
        ],
    )

    def contrib(t: str):
        idf = F.log(
            (F.col("n_docs") - F.col(f"df_{t}") + 0.5) / (F.col(f"df_{t}") + 0.5)
            + 1
        )
        avgdl = F.col("sum_dl") * 1.0 / F.col("n_docs")
        tfn = (
            F.col(f"tf_{t}")
            * (BM25_K1 + 1)
            / (
                F.col(f"tf_{t}")
                + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / avgdl)
            )
        )
        return F.round(idf * tfn, 6)

    score = F.round(
        sum((contrib(t) for t in BM25_TERMS[1:]), contrib(BM25_TERMS[0])), 6
    )
    hits = F.col(f"tf_{BM25_TERMS[0]}")
    for t in BM25_TERMS[1:]:
        hits = hits + F.col(f"tf_{t}")
    sparse_cand = (
        tf.crossJoin(F.broadcast(stats))
        .filter(hits > 0)
        .select("doc_id", score.alias("s"))
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(RRF_CAND)
    )
    wsp = Window.orderBy(F.desc("s"), F.asc("doc_id"))
    sparse = sparse_cand.select(
        "doc_id", F.row_number().over(wsp).alias("bm25_rank")
    )

    # dense list: cosine vs the single query vector (similarity.py algebra)
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding"),
        F.sqrt(
            F.expr(dot_float_as_double("embedding", "embedding", _DIM))
        ).alias("norm"),
    )
    qv = emb.filter(F.col("vec_id") == RRF_QUERY_VEC).select(
        F.col("embedding").alias("q_e"), F.col("norm").alias("q_norm")
    )
    cos = F.round(
        F.expr(dot_float_as_double("q_e", "embedding", _DIM))
        / (F.col("q_norm") * F.col("norm")),
        6,
    )
    dense_cand = (
        emb.filter(F.col("vec_id") != RRF_QUERY_VEC)
        .crossJoin(F.broadcast(qv))
        .select(F.col("vec_id").alias("doc_id"), cos.alias("c"))
        .orderBy(F.desc("c"), F.asc("doc_id"))
        .limit(RRF_CAND)
    )
    wde = Window.orderBy(F.desc("c"), F.asc("doc_id"))
    dense = dense_cand.select(
        "doc_id", F.row_number().over(wde).alias("dense_rank")
    )

    fused = sparse.alias("sp").join(
        dense.alias("de"), on="doc_id", how="full_outer"
    )
    rrf = F.round(
        F.coalesce(1.0 / (RRF_K + F.col("bm25_rank")), F.lit(0.0))
        + F.coalesce(1.0 / (RRF_K + F.col("dense_rank")), F.lit(0.0)),
        9,
    )
    return (
        fused.select("doc_id", "bm25_rank", "dense_rank", rrf.alias("rrf_score"))
        .orderBy(F.desc("rrf_score"), F.asc("doc_id"))
        .limit(RRF_TOP)
    )


# ---- pseudo-relevance feedback (RM3-lite query expansion) -------------------

PRF_FB_DOCS = BM25_TOP  # feedback set = pass-1 top-10
PRF_EXP_TERMS = 3       # expansion terms added to the query
PRF_MIN_FB_DF = 2       # expansion term must appear in >= 2 feedback docs

_O_FB = f"""
    SELECT tf.doc_id,
           ROUND({' + '.join(_o_contrib(t) for t in BM25_TERMS)}, 6) AS score
    FROM tf CROSS JOIN s
    WHERE {' + '.join(f'tf.tf_{t}' for t in BM25_TERMS)} > 0
    ORDER BY score DESC, tf.doc_id
    LIMIT {PRF_FB_DOCS}
"""

_O_GEN_CONTRIB = (
    f"LN((s.n_docs - dfq.df + 0.5) / (dfq.df + 0.5) + 1)"
    f" * (tfq.tf * ({BM25_K1} + 1) / (tfq.tf + {BM25_K1} *"
    f" (1 - {BM25_B} + {BM25_B} * dl.dl / (s.sum_dl * 1.0 / s.n_docs))))"
)


@query(
    "query_bm25_prf",
    oracle=f"""
    WITH tf AS (
    {_O_TF}),
    s AS (
    {_O_STATS}),
    fb AS ({_O_FB}),
    fbw AS (
        SELECT d.doc_id, UNNEST(STRING_SPLIT(d.text, ' ')) AS term
        FROM documents d JOIN fb ON fb.doc_id = d.doc_id),
    exp AS (
        SELECT term FROM fbw
        WHERE term NOT IN ({', '.join(f"'{t}'" for t in BM25_TERMS)})
        GROUP BY term HAVING COUNT(DISTINCT doc_id) >= {PRF_MIN_FB_DF}
        ORDER BY COUNT(DISTINCT doc_id) DESC, term LIMIT {PRF_EXP_TERMS}),
    terms AS (
        SELECT UNNEST([{', '.join(f"'{t}'" for t in BM25_TERMS)}]) AS term
        UNION SELECT term FROM exp),
    w AS (
        SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS term
        FROM documents),
    tfq AS (
        SELECT w.doc_id, w.term, COUNT(*) AS tf
        FROM w JOIN terms USING (term) GROUP BY w.doc_id, w.term),
    dfq AS (SELECT term, COUNT(*) AS df FROM tfq GROUP BY term),
    dl AS (
        SELECT doc_id, LEN(STRING_SPLIT(text, ' ')) AS dl FROM documents),
    scored AS (
        SELECT tfq.doc_id,
               CAST(FLOOR(ROUND({_O_GEN_CONTRIB}, 6) * 1000000 + 0.5)
                    AS BIGINT) AS cs
        FROM tfq
        JOIN dfq USING (term)
        JOIN dl ON dl.doc_id = tfq.doc_id
        CROSS JOIN s)
    SELECT doc_id, COUNT(*) AS n_terms_matched,
           ROUND(SUM(cs) / 1000000.0, 6) AS score
    FROM scored GROUP BY doc_id
    ORDER BY score DESC, doc_id
    LIMIT {BM25_TOP}
    """,
)
def query_bm25_prf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-pass retrieval with pseudo-relevance feedback (RM3-lite):
    pass 1 is query_bm25's fixed-term top-10; the query expands with the
    {PRF_EXP_TERMS} most-frequent new terms of that feedback set (>= 2
    feedback docs, ties on term); pass 2 re-scores the corpus with the
    expanded term set through a GENERALIZED BM25 — per-(doc, term) tf
    from an explode + join against the (broadcast, <= 6-row) term table
    rather than fixed tf columns, since the terms are now data-dependent.

    Determinism: the cross-term score is a sum of integer-scaled
    pre-rounded contributions (floor(round(c,6)*1e6+0.5) as BIGINT) —
    aggregation ORDER cannot move it, unlike a double sum over a
    variable term set; expansion selection is total-ordered.

    Scale shape: pass 1 is the query_bm25 shape (1-row broadcast
    stats); feedback-doc word extraction touches 10 docs; pass-2
    scoring explodes the corpus ONCE, immediately semi-joins against
    the broadcast 6-term table (surviving rows ~ docs x 6), then one
    (doc, term) partial-agged exchange and a doc-level rollup. The
    inverted-index alternative (index_inverted) serves the same pass at
    scale if the corpus is pre-indexed."""
    d = load_table(spark, sf_dir, "documents")
    fb = query_bm25(spark, sf_dir).select("doc_id")
    fbw = d.join(F.broadcast(fb), "doc_id").select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    exp = (
        fbw.filter(~F.col("term").isin(*BM25_TERMS))
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df_fb"))
        .filter(F.col("df_fb") >= PRF_MIN_FB_DF)
        .orderBy(F.col("df_fb").desc(), "term")
        .limit(PRF_EXP_TERMS)
        .select("term")
    )
    terms = (
        spark.createDataFrame([(t,) for t in BM25_TERMS], "term string")
        .union(exp)
        .distinct()
    )
    # pass-2 corpus explode is the CPU-dense stage: spread the
    # single-split local scan first (plan-side no-op at scale)
    w = ensure_min_partitions(d).select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    tfq = (
        w.join(F.broadcast(terms), "term")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfq = tfq.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    dl = d.select("doc_id", F.size(F.split("text", " ")).alias("dl"))
    # r9: the corpus stats only need (count, sum dl) — aggregating the
    # _tf_cols_spark relation computed six per-term tf columns per doc
    # just to throw them away; dl's identical size(split(text)) feeds
    # the same integers without that pass.
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1
    )
    avgdl = F.col("sum_dl") * 1.0 / F.col("n_docs")
    tfn = (
        F.col("tf")
        * (BM25_K1 + 1)
        / (F.col("tf") + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / avgdl))
    )
    cs = F.floor(F.round(idf * tfn, 6) * 1_000_000 + 0.5).cast("bigint")
    scored = (
        tfq.join(F.broadcast(dfq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", cs.alias("cs"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms_matched"),
            F.round(F.sum("cs") / 1_000_000.0, 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(BM25_TOP)
    )


# NDCG@10 position discounts floor(1e9 / log2(i+1)) — rank is the only
# input, so the whole discount schedule is 10 shared integer constants
_NDCG_DISC = {
    1: 1000000000, 2: 630929753, 3: 500000000, 4: 430676558,
    5: 386852807, 6: 356207187, 7: 333333333, 8: 315464876,
    9: 301029995, 10: 289064826,
}
_NDCG_K = 10
_NDCG_GAIN = {0: 0, 1: 1, 2: 3, 3: 7}  # 2^rel - 1

_DISC_CASE = (
    "CAST(CASE rk "
    + " ".join(f"WHEN {i} THEN {d}" for i, d in _NDCG_DISC.items())
    + " ELSE 0 END AS BIGINT)"
)
_GAIN_CASE = (
    "CAST(CASE rel "
    + " ".join(f"WHEN {r} THEN {g}" for r, g in _NDCG_GAIN.items())
    + " END AS BIGINT)"
)
# ideal relevance at position i given per-level counts (levels 3,2,1)
_IDEAL_REL = (
    "CASE WHEN rk <= n3 THEN 3 WHEN rk <= n3 + n2 THEN 2"
    " WHEN rk <= n3 + n2 + n1 THEN 1 ELSE 0 END"
)


@query(
    "retrieval_ndcg",
    oracle=f"""
    WITH tf AS (
    {_O_TF}),
    scored AS (
        SELECT doc_id,
               {' + '.join(f'tf_{t}' for t in BM25_TERMS)} AS tf_sum,
               {' + '.join(f'CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END'
                           for t in BM25_TERMS)} AS rel
        FROM tf),
    top AS (
        SELECT rel,
               ROW_NUMBER() OVER (ORDER BY tf_sum DESC, doc_id) AS rk
        FROM scored ORDER BY tf_sum DESC, doc_id LIMIT {_NDCG_K}),
    dcg AS (
        SELECT SUM(({_GAIN_CASE}) * ({_DISC_CASE})) AS dcg_nano,
               MIN(CASE WHEN rel >= 2 THEN rk END) AS first_good_rk
        FROM top),
    counts AS (
        SELECT COUNT(*) AS n_docs,
               SUM(CASE WHEN rel = 3 THEN 1 ELSE 0 END) AS n3,
               SUM(CASE WHEN rel = 2 THEN 1 ELSE 0 END) AS n2,
               SUM(CASE WHEN rel = 1 THEN 1 ELSE 0 END) AS n1
        FROM scored),
    ideal AS (
        SELECT SUM(CAST(CASE ({_IDEAL_REL})
                    WHEN 3 THEN 7 WHEN 2 THEN 3 WHEN 1 THEN 1 ELSE 0
                    END AS BIGINT)
                   * ({_DISC_CASE})) AS idcg_nano
        FROM (SELECT UNNEST(GENERATE_SERIES(1, {_NDCG_K})) AS rk) spine
        CROSS JOIN counts)
    SELECT c.n_docs, c.n3 AS n_rel3, c.n2 AS n_rel2, c.n1 AS n_rel1,
           d.dcg_nano, i.idcg_nano,
           d.dcg_nano * 1000 // i.idcg_nano AS ndcg_permille,
           COALESCE(1000000 // d.first_good_rk, 0) AS mrr_micro
    FROM counts c CROSS JOIN dcg d CROSS JOIN ideal i
    """,
)
def retrieval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANKING-QUALITY metrics for the retrieval shelf: NDCG@10 and MRR
    of a term-frequency ranking judged against graded coverage
    relevance (rel = number of distinct query terms present, gain
    2^rel - 1) — the offline eval every retrieval stack (query_bm25 /
    _prf / hybrid_rrf) needs before its ranking gates anything. The
    ranker (total tf, repetition-biased) deliberately differs from the
    judge (term coverage), so the metric is informative, not a
    tautological 1.0.

    Exactness: position discounts 1/log2(i+1) depend ONLY on rank, so
    the whole schedule is 10 Python-computed integer nano constants
    inlined into both engines (the shard_consistent_hash pattern) — no
    runtime log; gains are small integers; DCG/IDCG are exact integer
    sums, NDCG one permille division, MRR one micro division. The
    ideal ranking needs no sort: with 4 relevance levels, IDCG is
    arithmetic over per-level counts against a 10-row rank spine.

    Scale shape: per-doc tf/rel are array-local (no explode); the
    top-10 is TakeOrdered (per-partition heaps); the level counts are
    one partial-agged 1-row aggregate; everything downstream operates
    on <= 10 rows. Two scans, constant exchange."""
    d = load_table(spark, sf_dir, "documents")
    tf = _tf_cols_spark(d)
    scored = tf.select(
        "doc_id",
        sum(
            (F.col(f"tf_{t}") for t in BM25_TERMS[1:]),
            F.col(f"tf_{BM25_TERMS[0]}"),
        ).alias("tf_sum"),
        sum(
            (
                F.when(F.col(f"tf_{t}") > 0, 1).otherwise(0)
                for t in BM25_TERMS[1:]
            ),
            F.when(F.col(f"tf_{BM25_TERMS[0]}") > 0, 1).otherwise(0),
        ).alias("rel"),
    )
    top = (
        scored.orderBy(F.desc("tf_sum"), "doc_id")
        .limit(_NDCG_K)
        .withColumn(
            "rk",
            F.row_number().over(Window.orderBy(F.desc("tf_sum"), "doc_id")),
        )
    )
    dcg = top.agg(
        F.sum(F.expr(f"({_GAIN_CASE}) * ({_DISC_CASE})")).alias("dcg_nano"),
        F.min(F.when(F.col("rel") >= 2, F.col("rk"))).alias("first_good_rk"),
    )
    counts = scored.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("rel") == 3, 1).otherwise(0)).alias("n3"),
        F.sum(F.when(F.col("rel") == 2, 1).otherwise(0)).alias("n2"),
        F.sum(F.when(F.col("rel") == 1, 1).otherwise(0)).alias("n1"),
    )
    spine = spark.range(1, _NDCG_K + 1).select(F.col("id").alias("rk"))
    ideal = spine.crossJoin(F.broadcast(counts)).agg(
        F.sum(
            F.expr(
                f"cast(CASE ({_IDEAL_REL}) WHEN 3 THEN 7 WHEN 2 THEN 3"
                f" WHEN 1 THEN 1 ELSE 0 END as bigint) * ({_DISC_CASE})"
            )
        ).alias("idcg_nano")
    )
    return (
        counts.crossJoin(F.broadcast(dcg))
        .crossJoin(F.broadcast(ideal))
        .select(
            "n_docs",
            F.col("n3").alias("n_rel3"),
            F.col("n2").alias("n_rel2"),
            F.col("n1").alias("n_rel1"),
            "dcg_nano",
            "idcg_nano",
            F.expr("dcg_nano * 1000 div idcg_nano").alias("ndcg_permille"),
            F.expr("coalesce(1000000 div first_good_rk, 0)").alias("mrr_micro"),
        )
    )
