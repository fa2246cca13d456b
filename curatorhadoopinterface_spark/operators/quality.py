"""Corpus QA / governance shelf (round 8).

The reference's verify-what-you-wrote discipline (CuratorClient.java:
660-853) applied to the JUDGMENT layer of a training-data pipeline:
do two quality signals agree (rank correlation), do two filter rules
agree (Cohen's kappa), which filter rule is load-bearing (ablation
census), how much of the corpus is duplicated content (inflation
curve), what co-occurs (Apriori frequent triples), and what slips past
a naive blocklist (obfuscation-folded matching).

House rules (same as every operator module):
- every number that reaches the output is integer fixed-point
  (per-mille / ppm via integer division; DECIMAL(38,0) where an
  intermediate product can clear 2^63), so no floating summation order
  can flip the driver's value hash;
- every per-row expression is a JVM built-in (zero Python UDFs);
- the corpus collapses FIRST to a value-DOMAIN-bounded relation (the
  16x16 rank grid, the 4-cell confusion matrix, the md5 class table,
  the frequent-pair set) and all pairwise/post processing runs over
  the collapsed relation — the stats.py law. No operator here shuffles
  the corpus twice or materializes a corpus-sized pair relation.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from curatorhadoopinterface_spark.operators import query
from curatorhadoopinterface_spark.session import load_table

# --------------------------------------------------------------------------
# shared rule expressions (identical text reaches both engines)
# --------------------------------------------------------------------------

# doc features: token count, distinct-token count, non-space char count
_FEAT_DUCK = """
        SELECT n_chars,
               LENGTH(REPLACE(text, ' ', '')) AS nospace,
               LEN(STRING_SPLIT(text, ' ')) AS n_words,
               LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS n_distinct
        FROM documents
"""

_GRID = 16  # rank-correlation grid edge (fixed forever; see qa_kendall_tau)


def _doc_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    return d.select(
        "lang",
        "n_chars",
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).alias("nospace"),
        F.size(words).alias("n_words"),
        F.size(F.array_distinct(words)).alias("n_distinct"),
    )


# --------------------------------------------------------------------------
# qa_kendall_tau: do two quality signals rank documents the same way?
# --------------------------------------------------------------------------
@query(
    "qa_kendall_tau",
    oracle=f"""
    WITH feat AS ({_FEAT_DUCK}),
    cell AS (
        SELECT LEAST(n_chars // 64, {_GRID - 1}) AS ca,
               LEAST((n_distinct * 1000 // n_words) // 64, {_GRID - 1}) AS cb,
               COUNT(*) AS n
        FROM feat GROUP BY 1, 2),
    pairs AS (
        SELECT SUM(CASE WHEN (h1.ca < h2.ca AND h1.cb < h2.cb)
                          OR (h1.ca > h2.ca AND h1.cb > h2.cb)
                        THEN h1.n * h2.n ELSE 0 END) AS c2,
               SUM(CASE WHEN (h1.ca < h2.ca AND h1.cb > h2.cb)
                          OR (h1.ca > h2.ca AND h1.cb < h2.cb)
                        THEN h1.n * h2.n ELSE 0 END) AS d2
        FROM cell h1 JOIN cell h2
          ON h1.ca * {_GRID} + h1.cb < h2.ca * {_GRID} + h2.cb),
    tot AS (SELECT SUM(n) AS n_docs FROM cell)
    SELECT t.n_docs,
           t.n_docs * (t.n_docs - 1) // 2 AS n_pairs,
           p.c2 AS concordant, p.d2 AS discordant,
           CAST(CAST((p.c2 - p.d2) AS HUGEINT) * 1000000
                // (t.n_docs * (t.n_docs - 1) // 2) AS BIGINT) AS tau_a_ppm
    FROM pairs p CROSS JOIN tot t
    """,
)
def qa_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-a rank agreement between two per-document quality
    signals — length (n_chars) and lexical diversity (distinct-token
    ratio) — the score-vs-score audit run before swapping one quality
    filter for a cheaper one (do they ORDER the corpus the same way?).

    Spark-first shape: the corpus collapses FIRST to a fixed 16x16
    joint value-histogram (one partial-agged groupBy; bucket edges are
    value-DOMAIN constants, never quantiles, so no rank pass exists);
    concordant/discordant mass comes from the histogram's self-join
    over at most C(256,2) cell pairs — CONSTANT post-processing at any
    corpus size, the stats.py law. A per-document rank join (the
    textbook Kendall) would be corpus-quadratic; the grid form is
    exact for the bucketed statistic and the grid is fixed forever.

    Exactness: bucket ids, pair products, and the tau numerator are
    pure integer arithmetic; the single division is DECIMAL(38,0)
    (the c2-d2 * 1e6 product clears 2^63 past ~4M docs) truncated back
    to BIGINT ppm. Ties (same cell, same row, same column) are simply
    not counted — tau-a semantics, identical in both engines.
    """
    feat = _doc_features(spark, sf_dir)
    g = F.lit(_GRID)
    cell = (
        feat.select(
            F.least(F.expr("n_chars div 64"), g - 1).alias("ca"),
            F.least(
                F.expr("(n_distinct * 1000 div n_words) div 64"), g - 1
            ).alias("cb"),
        )
        .groupBy("ca", "cb")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    h1, h2 = cell.alias("h1"), cell.alias("h2")
    conc = (
        (F.col("h1.ca") < F.col("h2.ca")) & (F.col("h1.cb") < F.col("h2.cb"))
    ) | ((F.col("h1.ca") > F.col("h2.ca")) & (F.col("h1.cb") > F.col("h2.cb")))
    disc = (
        (F.col("h1.ca") < F.col("h2.ca")) & (F.col("h1.cb") > F.col("h2.cb"))
    ) | ((F.col("h1.ca") > F.col("h2.ca")) & (F.col("h1.cb") < F.col("h2.cb")))
    prod = F.col("h1.n") * F.col("h2.n")
    pairs = (
        h1.join(
            F.broadcast(h2),
            F.col("h1.ca") * _GRID + F.col("h1.cb")
            < F.col("h2.ca") * _GRID + F.col("h2.cb"),
        )
        .agg(
            F.sum(F.when(conc, prod).otherwise(0)).alias("c2"),
            F.sum(F.when(disc, prod).otherwise(0)).alias("d2"),
        )
    )
    tot = cell.agg(F.sum("n").alias("n_docs"))
    return pairs.crossJoin(F.broadcast(tot)).select(
        "n_docs",
        F.expr("n_docs * (n_docs - 1) div 2").alias("n_pairs"),
        F.col("c2").alias("concordant"),
        F.col("d2").alias("discordant"),
        F.expr(
            "cast(cast((c2 - d2) as decimal(38, 0)) * 1000000"
            " div (n_docs * (n_docs - 1) div 2) as bigint)"
        ).alias("tau_a_ppm"),
    )


# --------------------------------------------------------------------------
# qa_kappa_agreement: Cohen's kappa between two independent filter rules
# --------------------------------------------------------------------------
@query(
    "qa_kappa_agreement",
    oracle=f"""
    WITH feat AS ({_FEAT_DUCK}),
    lab AS (
        SELECT CASE WHEN 2 * n_distinct < n_words THEN 1 ELSE 0 END AS a,
               CASE WHEN n_chars < 150 OR nospace > 6 * n_words
                    THEN 1 ELSE 0 END AS b
        FROM feat),
    m AS (
        SELECT COUNT(*) AS n,
               SUM(a * b) AS n_ll,
               SUM(a * (1 - b)) AS n_lo,
               SUM((1 - a) * b) AS n_ol,
               SUM((1 - a) * (1 - b)) AS n_oo
        FROM lab),
    r AS (
        SELECT n, n_ll, n_lo, n_ol, n_oo,
               (n_ll + n_oo) * 1000000 // n AS po_ppm,
               CAST((CAST(n_ll + n_lo AS HUGEINT) * (n_ll + n_ol)
                     + CAST(n_ol + n_oo AS HUGEINT) * (n_lo + n_oo))
                    * 1000000 // (CAST(n AS HUGEINT) * n)
                    AS BIGINT) AS pe_ppm
        FROM m)
    SELECT n AS n_docs, n_ll, n_lo, n_ol, n_oo, po_ppm, pe_ppm,
           CASE WHEN pe_ppm = 1000000 THEN 1000000
                ELSE (po_ppm - pe_ppm) * 1000000 // (1000000 - pe_ppm)
           END AS kappa_ppm
    FROM r
    """,
)
def qa_kappa_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two independent low-quality labelers —
    the repetition rule (distinct-token ratio < 0.5) vs the
    length/gibberish rule (hard char floor OR mean word length > 6):
    chance-corrected agreement, the standard answer to "my two cheap
    filters agree 90% of the time" when both rules barely fire (raw
    agreement is inflated by the shared 'ok' majority; kappa is not).

    Spark-first shape: one corpus scan computes both labels as column
    algebra (split/array_distinct inside codegen, no explode); the
    4-cell confusion matrix is ONE partial-agged aggregate to a single
    row, and po/pe/kappa are scalar expressions over that row. The
    only exchange is the 1-row final agg — the cheapest possible plan
    for the statistic at 100 TB.

    Exactness: po is exact integer ppm; pe's marginal cross-products
    run in DECIMAL(38,0) (n^2 * 1e6 clears 2^63 past ~3M docs) and
    truncate to BIGINT ppm; kappa is the integer ppm quotient with the
    pe=1 degenerate case pinned. Identical literals in both engines.
    """
    feat = _doc_features(spark, sf_dir)
    lab = feat.select(
        F.when(2 * F.col("n_distinct") < F.col("n_words"), 1)
        .otherwise(0)
        .alias("a"),
        F.when(
            (F.col("n_chars") < 150)
            | (F.col("nospace") > 6 * F.col("n_words")),
            1,
        )
        .otherwise(0)
        .alias("b"),
    )
    m = lab.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr("a * b")).alias("n_ll"),
        F.sum(F.expr("a * (1 - b)")).alias("n_lo"),
        F.sum(F.expr("(1 - a) * b")).alias("n_ol"),
        F.sum(F.expr("(1 - a) * (1 - b)")).alias("n_oo"),
    )
    r = m.select(
        "*",
        F.expr("(n_ll + n_oo) * 1000000 div n").alias("po_ppm"),
        F.expr(
            "cast((cast(n_ll + n_lo as decimal(38, 0)) * (n_ll + n_ol)"
            " + cast(n_ol + n_oo as decimal(38, 0)) * (n_lo + n_oo))"
            " * 1000000 div (cast(n as decimal(38, 0)) * n) as bigint)"
        ).alias("pe_ppm"),
    )
    return r.select(
        F.col("n").alias("n_docs"),
        "n_ll",
        "n_lo",
        "n_ol",
        "n_oo",
        "po_ppm",
        "pe_ppm",
        F.expr(
            "case when pe_ppm = 1000000 then 1000000"
            " else (po_ppm - pe_ppm) * 1000000 div (1000000 - pe_ppm) end"
        ).alias("kappa_ppm"),
    )


# --------------------------------------------------------------------------
# filter_rule_ablation: which filter rule is load-bearing?
# --------------------------------------------------------------------------
@query(
    "filter_rule_ablation",
    oracle=f"""
    WITH feat AS ({_FEAT_DUCK}),
    flags AS (
        SELECT CASE WHEN n_chars < 150 THEN 1 ELSE 0 END AS f1,
               CASE WHEN nospace > 6 * n_words THEN 1 ELSE 0 END AS f2,
               CASE WHEN 2 * n_distinct < n_words THEN 1 ELSE 0 END AS f3
        FROM feat),
    s AS (
        SELECT COUNT(*) AS n_docs,
               SUM(f1) AS any1, SUM(f2) AS any2, SUM(f3) AS any3,
               SUM(f1) AS first1,
               SUM((1 - f1) * f2) AS first2,
               SUM((1 - f1) * (1 - f2) * f3) AS first3,
               SUM(f1 * (1 - f2) * (1 - f3)) AS uniq1,
               SUM((1 - f1) * f2 * (1 - f3)) AS uniq2,
               SUM((1 - f1) * (1 - f2) * f3) AS uniq3
        FROM flags)
    SELECT 'too_short' AS rule, n_docs, any1 AS n_any, first1 AS n_first,
           uniq1 AS n_unique FROM s
    UNION ALL
    SELECT 'long_words', n_docs, any2, first2, uniq2 FROM s
    UNION ALL
    SELECT 'repetitious', n_docs, any3, first3, uniq3 FROM s
    ORDER BY rule
    """,
)
def filter_rule_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-rule ablation census — for each quality rule in the
    filter_census cascade: how many docs it fires on AT ALL (n_any),
    how many it is the FIRST to kill under cascade order (n_first),
    and how many ONLY it kills (n_unique — the docs the corpus regains
    if the rule is dropped). n_unique is the load-bearing metric:
    a rule with high n_any but zero n_unique is fully shadowed and
    free to remove; filter_census alone cannot distinguish the two.

    Spark-first shape: one corpus scan computes the three boolean
    flags as column algebra; ONE partial-agged aggregate collapses the
    corpus to a single 10-sum row; the 3-rule readout is a constant
    stack() unpivot of that row. One exchange, 1-row payload, at any
    corpus size.

    Exactness: every output is a flag-product sum — pure 0/1 integer
    arithmetic, bit-stable at any SF and identical in both engines.
    """
    feat = _doc_features(spark, sf_dir)
    flags = feat.select(
        F.when(F.col("n_chars") < 150, 1).otherwise(0).alias("f1"),
        F.when(F.col("nospace") > 6 * F.col("n_words"), 1)
        .otherwise(0)
        .alias("f2"),
        F.when(2 * F.col("n_distinct") < F.col("n_words"), 1)
        .otherwise(0)
        .alias("f3"),
    )
    s = flags.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("f1").alias("any1"),
        F.sum("f2").alias("any2"),
        F.sum("f3").alias("any3"),
        F.sum("f1").alias("first1"),
        F.sum(F.expr("(1 - f1) * f2")).alias("first2"),
        F.sum(F.expr("(1 - f1) * (1 - f2) * f3")).alias("first3"),
        F.sum(F.expr("f1 * (1 - f2) * (1 - f3)")).alias("uniq1"),
        F.sum(F.expr("(1 - f1) * f2 * (1 - f3)")).alias("uniq2"),
        F.sum(F.expr("(1 - f1) * (1 - f2) * f3")).alias("uniq3"),
    )
    return s.select(
        F.expr(
            "stack(3,"
            " 'too_short',   n_docs, any1, first1, uniq1,"
            " 'long_words',  n_docs, any2, first2, uniq2,"
            " 'repetitious', n_docs, any3, first3, uniq3)"
            " as (rule, n_docs, n_any, n_first, n_unique)"
        )
    ).orderBy("rule")


# --------------------------------------------------------------------------
# dup_inflation_curve: how much of the corpus is duplicated content?
# --------------------------------------------------------------------------
@query(
    "dup_inflation_curve",
    oracle="""
    WITH cls AS (
        SELECT MD5(text) AS h, COUNT(*) AS k, SUM(n_chars) AS chars
        FROM documents GROUP BY 1),
    b AS (
        SELECT CASE WHEN k = 1 THEN 'k1_unique'
                    WHEN k = 2 THEN 'k2'
                    WHEN k <= 5 THEN 'k3_5'
                    WHEN k <= 10 THEN 'k6_10'
                    ELSE 'k11_plus' END AS bucket,
               k, chars
        FROM cls),
    tot AS (SELECT SUM(k) AS nd, SUM(chars) AS nc FROM b)
    SELECT bucket,
           COUNT(*) AS n_classes,
           SUM(k) AS n_docs,
           SUM(chars) AS n_chars,
           SUM(k) * 1000000 // t.nd AS doc_share_ppm,
           SUM(chars) * 1000000 // t.nc AS char_share_ppm
    FROM b CROSS JOIN tot t
    GROUP BY bucket, t.nd, t.nc
    ORDER BY bucket
    """,
)
def dup_inflation_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplication inflation curve — the corpus-level report behind
    every dedup decision (C4/Gopher-style): exact-duplicate classes
    bucketed by multiplicity (unique / x2 / x3-5 / x6-10 / x11+), with
    per-bucket class count, document count, character volume, and ppm
    share of the corpus. Reading it answers "what fraction of my
    tokens are copies, and is the mass in a few mega-clusters or many
    small pairs?" — which decides doc-level vs class-level dedup and
    predicts the duplication-quadratic traps (SCALE.md r7).

    Spark-first shape: md5 collapses every doc to 32 bytes map-side;
    the class table is one partial-agged groupBy on the hash; the
    bucket census is a second agg over the (already class-sized)
    relation; totals broadcast back as a 1-row cross. No joins over
    the corpus, no pair relation at any duplication factor — a 10k-way
    duplicate class is ONE class row here.

    Exactness: counts and char sums are exact integers; shares are
    integer ppm (x*1e6 div total, headroom to ~9e12 chars).
    """
    d = load_table(spark, sf_dir, "documents")
    cls = (
        d.select(F.md5("text").alias("h"), "n_chars")
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("k"), F.sum("n_chars").alias("chars"))
    )
    b = cls.select(
        F.when(F.col("k") == 1, "k1_unique")
        .when(F.col("k") == 2, "k2")
        .when(F.col("k") <= 5, "k3_5")
        .when(F.col("k") <= 10, "k6_10")
        .otherwise("k11_plus")
        .alias("bucket"),
        "k",
        "chars",
    )
    tot = b.agg(F.sum("k").alias("nd"), F.sum("chars").alias("nc"))
    return (
        b.crossJoin(F.broadcast(tot))
        .groupBy("bucket", "nd", "nc")
        .agg(
            F.count(F.lit(1)).alias("n_classes"),
            F.sum("k").alias("n_docs"),
            F.sum("chars").alias("n_chars"),
        )
        .select(
            "bucket",
            "n_classes",
            "n_docs",
            "n_chars",
            F.expr("n_docs * 1000000 div nd").alias("doc_share_ppm"),
            F.expr("n_chars * 1000000 div nc").alias("char_share_ppm"),
        )
        .orderBy("bucket")
    )


# --------------------------------------------------------------------------
# basket_apriori_triples: frequent 3-itemsets with Apriori pruning
# --------------------------------------------------------------------------
_TRIPLE_MINSUP = 2


@query(
    "basket_apriori_triples",
    oracle=f"""
    WITH basket AS (
        SELECT DISTINCT l.l_orderkey AS o, p.p_brand AS it
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
    fp AS (
        SELECT b1.it AS i1, b2.it AS i2, COUNT(*) AS s
        FROM basket b1 JOIN basket b2
          ON b1.o = b2.o AND b1.it < b2.it
        GROUP BY 1, 2 HAVING COUNT(*) >= {_TRIPLE_MINSUP}),
    cand AS (
        SELECT f.i1, f.i2, b3.it AS i3, f.o FROM (
            SELECT fp.i1, fp.i2, b1.o
            FROM fp JOIN basket b1 ON b1.it = fp.i1
            JOIN basket b2 ON b2.o = b1.o AND b2.it = fp.i2) f
        JOIN basket b3 ON b3.o = f.o AND b3.it > f.i2),
    pruned AS (
        SELECT c.i1, c.i2, c.i3, COUNT(*) AS support
        FROM cand c
        WHERE EXISTS (SELECT 1 FROM fp WHERE fp.i1 = c.i2 AND fp.i2 = c.i3)
          AND EXISTS (SELECT 1 FROM fp WHERE fp.i1 = c.i1 AND fp.i2 = c.i3)
        GROUP BY 1, 2, 3 HAVING COUNT(*) >= {_TRIPLE_MINSUP})
    SELECT i1, i2, i3, support
    FROM pruned
    ORDER BY support DESC, i1, i2, i3
    LIMIT 20
    """,
)
def basket_apriori_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent 3-itemsets over market baskets (order x part-brand)
    with the Apriori candidate prune — a triple is generated only by
    EXTENDING a frequent pair, and kept only if all three of its
    sub-pairs are frequent, before its support is ever counted. The
    classic "customers who bought X and Y also bought Z" rung above
    basket_association_rules' pairs.

    Spark-first shape: baskets collapse to DISTINCT (order, brand)
    first (the brand lookup is one equi-join); pair blowup is
    basket-local; the frequent-pair table is small (bounded by the
    brand-pair domain) and BROADCASTS into every prune, so candidate
    triples that Apriori would kill are dropped map-side before the
    triple exchange — monotonicity doing the shuffle-avoidance work.
    Support counts partial-aggregate; top-20 is TakeOrdered, no global
    sort.

    Exactness: supports are exact integer counts; the ranking key
    (support DESC, i1, i2, i3) is total, so LIMIT 20 is deterministic
    in both engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part")
    # r9 measured-and-REVERTED: persisting basket/fp (repartition("o")
    # + persist + count barriers + eager checkpoint) won nothing in a
    # fresh session and LOST interleaved — same-session alternating A/B
    # 3.64 s (this lazy form) vs 4.18 s (persisted), interleaved bench
    # 4.45 -> 5.60 s. The five basket consumers re-derive a cheap
    # map-side join; cache materialization barriers cost more than the
    # recompute at any load. Kept lazy.
    # r9 second pass (the _copurchase_pairs discipline, extended to
    # triples): ONE groupBy(o) sorted-distinct-item aggregate replaces
    # every basket self-join — pairs are the i < j index combinations
    # of the array, candidate triples the i < j < k combinations, both
    # map-side explodes; the old plan paid the b1 x b2 pair self-join
    # PLUS a 3-join frequent-pair-instance chain (fp ⋈ x1 ⋈ x2 ⋈ b3)
    # before the prune. The Apriori prune itself is unchanged: all
    # remaining sub-pairs must be frequent, enforced by broadcast
    # semi-joins BEFORE the support exchange. Value-identical by the
    # batch-13 proof (sorted distinct array index combos are exactly
    # the strict it-ascending combinations the self-joins produced);
    # a basket's triple blowup is |basket| choose 3 over the BRAND
    # domain (<= 25 distinct), bounded per order.
    ord_items = (
        li.select("l_orderkey", "l_partkey")
        .join(pt.select("p_partkey", "p_brand"), li.l_partkey == pt.p_partkey)
        .select(F.col("l_orderkey").alias("o"), F.col("p_brand").alias("it"))
        .groupBy("o")
        .agg(F.sort_array(F.collect_set("it")).alias("its"))
    )
    fp = (
        ord_items.select(
            F.explode(
                F.expr(
                    "flatten(transform(its, (x, i) -> "
                    "transform(slice(its, i + 2, size(its) - i - 1), "
                    "y -> struct(x AS i1, y AS i2))))"
                )
            ).alias("pr")
        )
        .groupBy(F.col("pr.i1").alias("i1"), F.col("pr.i2").alias("i2"))
        .agg(F.count(F.lit(1)).alias("s"))
        .where(F.col("s") >= _TRIPLE_MINSUP)
        .select("i1", "i2")
    )
    cand = ord_items.select(
        F.explode(
            F.expr(
                "flatten(transform(its, (x, i) -> "
                "flatten(transform(slice(its, i + 2, size(its) - i - 1), "
                "(y, j) -> transform("
                "slice(its, i + j + 3, size(its) - i - j - 2), "
                "z -> struct(x AS i1, y AS i2, z AS i3))))))"
            )
        ).alias("tr")
    ).select("tr.i1", "tr.i2", "tr.i3")
    # Apriori prune: ALL sub-pairs must be frequent (map-side broadcast
    # semi-joins — candidates die before the support exchange). The
    # (i1, i2) membership was the generation rule in the join form; it
    # is an explicit prune here since the explode generates every
    # in-basket triple.
    fp23 = fp.select(F.col("i1").alias("i2"), F.col("i2").alias("i3"))
    fp13 = fp.select(F.col("i1").alias("i1"), F.col("i2").alias("i3"))
    pruned = (
        cand.join(F.broadcast(fp), ["i1", "i2"], "left_semi")
        .join(F.broadcast(fp23), ["i2", "i3"], "left_semi")
        .join(F.broadcast(fp13), ["i1", "i3"], "left_semi")
    )
    return (
        pruned.groupBy("i1", "i2", "i3")
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= _TRIPLE_MINSUP)
        .orderBy(F.desc("support"), "i1", "i2", "i3")
        .limit(20)
    )


# --------------------------------------------------------------------------
# qa_blocklist_leet: obfuscation-folded blocklist census
# --------------------------------------------------------------------------
_LEET_FROM = "4301!$5@7"
_LEET_TO = "aeoiissat"
_BLOCKLIST = ("slow", "big", "vector")


def _blk_in(quote: str = "'") -> str:
    return ", ".join(f"{quote}{w}{quote}" for w in _BLOCKLIST)


@query(
    "qa_blocklist_leet",
    oracle=f"""
    WITH folded AS (
        SELECT source,
               STRING_SPLIT(TRANSLATE(LOWER(text),
                            '{_LEET_FROM}', '{_LEET_TO}'), ' ') AS ws
        FROM documents),
    hits AS (
        SELECT source,
               LEN(LIST_FILTER(ws, w -> w IN ({_blk_in()}))) AS n_hits
        FROM folded)
    SELECT source,
           COUNT(*) AS n_docs,
           SUM(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END) AS n_docs_hit,
           SUM(n_hits) AS total_hits,
           SUM(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END) * 1000
               // COUNT(*) AS hit_permille
    FROM hits GROUP BY source
    ORDER BY source
    """,
)
def qa_blocklist_leet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Obfuscation-folded blocklist census — the word-boundary
    blocklist pass every corpus-governance pipeline runs (UT1-style
    lists), hardened against leetspeak evasion: the text is folded
    through a fixed character map (4->a, 3->e, 0->o, 1->i, !->i, $->s,
    5->s, @->a, 7->t) and lowercased BEFORE matching, so 'b1g'/'B!G'
    count the same as 'big'. Per-source doc hit rate and total hit
    volume — the evidence for dropping or reviewing a source.

    Spark-first shape: fold + split + filter-count is per-row column
    algebra (translate/lower/split/filter all whole-stage codegen, no
    explode, nothing leaves the JVM); the only exchange is the
    O(|sources|)-row census partial-aggregate. One corpus scan reading
    (text, source) at 100 TB.

    Exactness: hit counts are exact integers from identical fold maps
    and word lists in both engines; the rate is integer per-mille.
    """
    d = load_table(spark, sf_dir, "documents")
    hits = d.select(
        "source",
        F.expr(
            f"size(filter(split(translate(lower(text),"
            f" '{_LEET_FROM}', '{_LEET_TO}'), ' '),"
            f" w -> w in ({_blk_in()})))"
        ).alias("n_hits"),
    )
    return (
        hits.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("n_hits") > 0, 1).otherwise(0)).alias(
                "n_docs_hit"
            ),
            F.sum("n_hits").alias("total_hits"),
        )
        .select(
            "source",
            "n_docs",
            "n_docs_hit",
            "total_hits",
            F.expr("n_docs_hit * 1000 div n_docs").alias("hit_permille"),
        )
        .orderBy("source")
    )
