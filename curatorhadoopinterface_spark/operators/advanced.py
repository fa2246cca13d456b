"""Analytics batch 4: warehouse + Spark-4-native surface growth.

- ``merge_scd2``: slowly-changing-dimension type-2 reconstruction (validity
  intervals from an event log) — the warehouse twin of the reference's
  version-staleness model (CuratorHandler.java:816-896: a view is "current"
  until a newer annotator version supersedes it).
- ``join_salted_skew``: explicit salted equi-join — the M7/SCALE.md skew
  remedy as a declared, oracle-checked query (result must equal the plain
  join byte-for-byte).
- ``text_repetition``: Gopher-style repetition quality signals (top-bigram
  fraction, duplicate-word fraction) computed ARRAY-LOCALLY per document —
  zero shuffles, the only scale-sane way to score 100 TB of text.
- ``udtf_native``: Spark 4 Python UDTF (`@udtf`) in a LATERAL join — the
  typed-table-function face of the annotator dispatch (A24,
  CuratorHandler.java:911-961 ``transform``).
- ``json_variant``: Spark 4 VARIANT ingestion (``parse_json`` +
  ``try_variant_get``) over the ``events.props`` JSON column — the engine's
  debug/interchange format (SURVEY.md §2C json row) upgraded to the
  binary-encoded open type.
- ``agg_sketch_hll``: Datasketches HLL distinct-count sketch
  (``hll_sketch_agg``/``hll_sketch_estimate``) — mergeable partials, the
  100 TB answer to COUNT(DISTINCT). Self-verifying: the query emits a
  Spark-side boolean asserting the estimate lands within 5% of exact; the
  oracle pins the exact count and expects the boolean TRUE, so a drifting
  sketch fails the hash.
- ``agg_zscore_outlier``: per-group z-score outlier screen — the
  statistical quality gate a training-data pipeline runs over telemetry
  (two-pass: tiny stats aggregate broadcast back onto the fact stream).

Scale notes:
- scd2 uses ONE user_id sort exchange for both window passes (lag-change
  detection + lead valid_to share partitioning and ordering);
- the salted join multiplies only the SMALL side (x8 explode of orders)
  and salts the fact side with a deterministic hash — at 100 TB this is
  what turns one straggler reducer on a hot key into 8 even tasks;
- text_repetition does sort+fold inside the row (array_sort + aggregate
  over the bigram array): no explode, no shuffle, scan-shaped;
- hll partials merge map-side exactly like any hash agg — constant-size
  state per group vs the O(distinct) state of exact COUNT(DISTINCT).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from curatorhadoopinterface_spark.operators import query
from curatorhadoopinterface_spark.session import load_table


# --------------------------------------------------------------------------
# SCD2 reconstruction from an event log
# --------------------------------------------------------------------------
@query(
    "merge_scd2",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, ts, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events
    ),
    chg AS (
      SELECT * FROM ordered WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id, event_type, ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
           (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL)
             AS is_current
    FROM chg
    """,
)
def merge_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing dimension from the events log: collapse
    consecutive same-type rows per user, then assign [valid_from,
    valid_to) intervals with the next change's timestamp (NULL = current
    row). Mirrors the reference's "view valid until a newer annotator
    version supersedes it" semantics (CuratorHandler.java:816-896).
    Both window passes share one (user_id, ts, event_id) sort exchange."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = load_table(spark, sf_dir, "events")
    chg = (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type")))
    )
    valid_to = F.lead("ts").over(w)
    return chg.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
    )


# --------------------------------------------------------------------------
# salted skew join (result identical to the plain join)
# --------------------------------------------------------------------------
_SALT_BUCKETS = 8

@query(
    "join_salted_skew",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_items,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(14,2))
                          * (CAST(1 AS DECIMAL(3,2))
                             - CAST(l.l_discount AS DECIMAL(3,2)))), 2)
                AS DOUBLE) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key remedy as a declared query: the fact side gets a
    deterministic salt in [0, 8) and the dim side is exploded x8, so one
    skewed orderkey spreads over 8 reducers. The oracle is the PLAIN
    join — salting must not change a single row. At 100 TB this (or
    AQE's skewedJoin, enabled in session.py) is the difference between
    one 2-hour straggler and 8 even 15-minute tasks."""
    l = load_table(spark, sf_dir, "lineitem").withColumn(
        "salt", F.pmod(F.xxhash64("l_partkey", "l_suppkey"), F.lit(_SALT_BUCKETS)).cast("int")
    )
    # the exploded side must NEVER broadcast: the planner sizes it from
    # the pre-explosion scan stats, picks BroadcastHashJoin, and dies
    # building the x8 table driver-side (observed at 30x: 'Not enough
    # memory to build and broadcast'). Salting exists to spread a
    # SHUFFLED join — pin sort-merge so the plan is the one the
    # technique is for, at every scale.
    o = load_table(spark, sf_dir, "orders").withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(_SALT_BUCKETS - 1)))
    ).hint("merge")
    return (
        l.join(
            o,
            (l["l_orderkey"] == o["o_orderkey"]) & (l["salt"] == o["salt"]),
            "inner",
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            # exact DECIMAL money math (flagship_pricing_summary policy):
            # a 6e11 double sum rounded to 2dp flipped a cent at 100x
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(14,2)")
                    * (
                        F.lit(1).cast("decimal(3,2)")
                        - F.col("l_discount").cast("decimal(3,2)")
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue"),
        )
    )


# --------------------------------------------------------------------------
# Gopher-style repetition signals, array-local
# --------------------------------------------------------------------------
@query(
    "text_repetition",
    oracle="""
    WITH w AS (
      SELECT doc_id, word, ord
      FROM (
        SELECT doc_id,
               unnest(string_split(text, ' ')) AS word,
               generate_subscripts(string_split(text, ' '), 1) AS ord
        FROM documents
      )
    ),
    b AS (
      SELECT doc_id,
             word || ' ' || lead(word) OVER (PARTITION BY doc_id ORDER BY ord)
               AS bigram
      FROM w
    ),
    bc AS (
      SELECT doc_id, bigram, COUNT(*) AS c
      FROM b WHERE bigram IS NOT NULL GROUP BY doc_id, bigram
    ),
    top AS (
      SELECT doc_id, MAX(c) AS top_bigram_cnt, SUM(c) AS nb
      FROM bc GROUP BY doc_id
    ),
    ws AS (
      SELECT doc_id, COUNT(*) AS n_words, COUNT(DISTINCT word) AS n_distinct
      FROM w GROUP BY doc_id
    )
    SELECT ws.doc_id,
           ws.n_words,
           top.top_bigram_cnt,
           ROUND(top.top_bigram_cnt * 1.0 / top.nb, 9) AS top_bigram_frac,
           ROUND(1.0 - ws.n_distinct * 1.0 / ws.n_words, 9) AS dup_word_frac
    FROM ws JOIN top USING (doc_id)
    WHERE ws.n_words >= 2
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality signals (the Gopher/MassiveText filters): the
    fraction of bigrams taken by the single most frequent bigram, and
    the fraction of duplicated word occurrences. Everything happens
    INSIDE the row — zip_with builds the bigram array, array_sort +
    aggregate folds out the longest equal-run (= max bigram count)
    without any explode or shuffle. The oracle rebuilds the same stats
    relationally (unnest + windows + group-bys). Plan shape: scan ->
    project, zero exchanges."""
    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n = F.size(words)
    bigrams = F.zip_with(
        F.slice(words, 1, n - 1),
        F.slice(words, 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    run_step = lambda acc, x: F.struct(  # noqa: E731
        x.alias("prev"),
        F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
        F.greatest(
            acc["best"],
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
        ).alias("best"),
    )
    top_cnt = F.aggregate(
        F.array_sort(bigrams),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        run_step,
        lambda acc: acc["best"],
    )
    return (
        d.select(
            "doc_id",
            n.cast("long").alias("n_words"),
            top_cnt.cast("long").alias("top_bigram_cnt"),
            F.round(top_cnt / (n - 1).cast("double"), 9).alias("top_bigram_frac"),
            F.round(
                F.lit(1.0) - F.size(F.array_distinct(words)) / n.cast("double"), 9
            ).alias("dup_word_frac"),
        )
        .filter(F.col("n_words") >= 2)
    )


# --------------------------------------------------------------------------
# Spark 4 native Python UDTF in a LATERAL join
# --------------------------------------------------------------------------
@query(
    "udtf_native",
    oracle="""
    WITH t AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    )
    SELECT doc_id,
           COUNT(*) AS n_terms,
           COUNT(DISTINCT term) AS n_distinct_terms
    FROM t GROUP BY doc_id
    """,
)
def udtf_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The typed table-function face of annotator dispatch (A24,
    CuratorHandler.java:911-961): a Spark 4 ``@udtf`` class yields
    (term, pos) rows per document and is applied with a SQL LATERAL
    join, then aggregated. This is the registered-UDTF API surface;
    the hot path for the same computation is the pure-SQL split +
    explode (see text_token_count) — the UDTF form is for logic a SQL
    expression can't state."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="term string, term_pos int")
    class SplitWords:
        def eval(self, text: str):  # noqa: ANN001
            # `is not None`, not truthiness: DuckDB's string_split('')
            # unnests one '' term, so an empty-string doc must still
            # emit a row to keep row counts aligned across engines.
            if text is not None:
                for i, t in enumerate(text.split(" ")):
                    yield t, i

    spark.udtf.register("adv_split_words", SplitWords)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("adv_docs")
    return spark.sql(
        """
        SELECT d.doc_id,
               COUNT(*) AS n_terms,
               COUNT(DISTINCT s.term) AS n_distinct_terms
        FROM adv_docs d, LATERAL adv_split_words(d.text) s
        GROUP BY d.doc_id
        """
    )


# --------------------------------------------------------------------------
# Spark 4 VARIANT ingestion of the JSON props column
# --------------------------------------------------------------------------
@query(
    "json_variant",
    oracle="""
    SELECT event_type,
           COUNT(CAST(props->>'$.k' AS INTEGER)) AS n_k,
           MIN(CAST(props->>'$.k' AS INTEGER)) AS min_k,
           MAX(CAST(props->>'$.k' AS INTEGER)) AS max_k,
           ROUND(AVG(CAST(props->>'$.k' AS INTEGER)), 6) AS avg_k
    FROM events GROUP BY event_type
    """,
)
def json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-schema JSON ingestion via the Spark 4 VARIANT type:
    ``parse_json`` binary-encodes ``events.props`` once, then
    ``try_variant_get`` extracts typed paths without a fixed schema —
    the engine's upgrade of the reference's stringly-typed attributes
    map (Span.attributes, curator.thrift / SURVEY.md section 1.2). At
    100 TB, VARIANT beats per-query ``get_json_object`` re-parsing
    (one decode, shredded binary access after)."""
    e = load_table(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json(F.col("props")), "$.k", "int")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.round(F.avg("k"), 6).alias("avg_k"),
        )
    )


# --------------------------------------------------------------------------
# HLL distinct sketch (self-verifying against exact)
# --------------------------------------------------------------------------
@query(
    "agg_sketch_hll",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS est_within_5pct
    FROM events GROUP BY event_type
    """,
)
def agg_sketch_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datasketches HLL per-group distinct-user count. The sketch state
    is constant-size and MERGEABLE, so partial aggregation works
    map-side exactly like a sum — the 100 TB replacement for exact
    COUNT(DISTINCT)'s O(distinct)-sized hash state. Self-verifying
    oracle contract: the Spark side computes BOTH the sketch estimate
    and the exact count and emits ``est_within_5pct``; the oracle pins
    the exact count and expects TRUE, so an out-of-tolerance sketch
    flips the boolean and fails the value hash."""
    e = load_table(spark, sf_dir, "events")
    g = e.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    return g.select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("est") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users")
        ).alias("est_within_5pct"),
    )


# --------------------------------------------------------------------------
# per-group z-score outlier screen
# --------------------------------------------------------------------------
@query(
    "agg_zscore_outlier",
    oracle="""
    WITH stats AS (
      SELECT event_type, AVG(value) AS mu, STDDEV_POP(value) AS sigma
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           COUNT(*) AS n,
           SUM(CASE WHEN ABS((e.value - s.mu) / s.sigma) > 2 THEN 1 ELSE 0 END)
             AS n_outliers
    FROM events e JOIN stats s ON e.event_type = s.event_type
    GROUP BY e.event_type
    """,
)
def agg_zscore_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical quality gate: count |z| > 2 outliers per event_type.
    Two-pass shape that scales: pass 1 reduces 100 TB to a
    groups-sized stats table; pass 2 broadcasts it back onto the fact
    stream — the fact table is scanned twice but never shuffled on a
    data-sized key. (A training-data pipeline uses the same shape to
    drop documents with outlier perplexity/length per source.)"""
    e = load_table(spark, sf_dir, "events")
    stats = e.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_pop("value").alias("sigma")
    )
    z = F.abs((F.col("value") - F.col("mu")) / F.col("sigma"))
    return (
        e.join(F.broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(z > 2, 1).otherwise(0)).alias("n_outliers"),
        )
    )


@query(
    "diag_key_skew",
    oracle="""
    WITH freq AS (
        SELECT l_partkey AS key, COUNT(*) AS cnt
        FROM lineitem GROUP BY l_partkey),
    tot AS (
        SELECT SUM(cnt) AS total, COUNT(*) AS n_keys, MAX(cnt) AS max_cnt
        FROM freq)
    SELECT f.key, f.cnt,
           ROUND(f.cnt * 1.0 / t.total, 6) AS share,
           ROUND(f.cnt * t.n_keys * 1.0 / t.total, 4) AS skew_vs_mean,
           (f.cnt = t.max_cnt) AS is_heaviest
    FROM freq f CROSS JOIN tot t
    ORDER BY f.cnt DESC, f.key
    LIMIT 10
    """,
)
def diag_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic: the top-10 heavy hitters of a join key
    with their share of all rows and their multiple of the mean key
    frequency — the report you run BEFORE deciding between AQE skew
    splitting and explicit salting (join_salted_skew is the cure this
    tool prescribes; at 100 TB a key with skew_vs_mean in the thousands
    is the straggler that pins one reducer for hours).

    Scale shape: one partial-aggregated group-by on the key, a one-row
    totals aggregate broadcast back over the frequency table, and a
    TakeOrdered top-10 — the frequency table never sorts globally and
    the raw rows are touched exactly once.
    """
    li = load_table(spark, sf_dir, "lineitem")
    freq = li.groupBy(F.col("l_partkey").alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    tot = freq.agg(
        F.sum("cnt").alias("total"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("cnt").alias("max_cnt"),
    )
    return (
        freq.crossJoin(F.broadcast(tot))
        .select(
            "key",
            "cnt",
            F.round(F.col("cnt") * 1.0 / F.col("total"), 6).alias("share"),
            F.round(F.col("cnt") * F.col("n_keys") * 1.0 / F.col("total"), 4).alias(
                "skew_vs_mean"
            ),
            (F.col("cnt") == F.col("max_cnt")).alias("is_heaviest"),
        )
        .orderBy(F.desc("cnt"), "key")
        .limit(10)
    )


@query(
    "agg_sketch_theta",
    oracle="""
    WITH c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
    p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
    SELECT (SELECT COUNT(*) FROM c) AS exact_click,
           (SELECT COUNT(*) FROM p) AS exact_purchase,
           (SELECT COUNT(*) FROM (SELECT * FROM c UNION SELECT * FROM p))
               AS exact_union,
           (SELECT COUNT(*) FROM (SELECT * FROM c INTERSECT SELECT * FROM p))
               AS exact_both,
           TRUE AS union_within_5pct,
           TRUE AS inter_within_5pct
    """,
)
def agg_sketch_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datasketches Theta sketches: mergeable SET ALGEBRA on distinct
    sets — union AND intersection estimated from two constant-size
    sketches without ever co-shuffling the raw sets (the 100 TB answer
    to "how many users clicked AND purchased" across partitioned,
    separately-aggregated data; HLL can union but cannot intersect).
    Self-verifying contract (agg_sketch_hll pattern): the Spark side
    computes sketch estimates AND the exact set sizes, emitting
    within-5% booleans; the oracle pins the exact values and expects
    TRUE, so sketch drift fails the value hash.
    """
    e = load_table(spark, sf_dir, "events")
    sk = e.agg(
        F.theta_sketch_agg(
            F.when(F.col("event_type") == "click", F.col("user_id"))
        ).alias("sk_c"),
        F.theta_sketch_agg(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).alias("sk_p"),
        F.countDistinct(
            F.when(F.col("event_type") == "click", F.col("user_id"))
        ).alias("exact_click"),
        F.countDistinct(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).alias("exact_purchase"),
        F.countDistinct(
            F.when(
                F.col("event_type").isin("click", "purchase"), F.col("user_id")
            )
        ).alias("exact_union"),
    )
    both = (
        e.filter(F.col("event_type") == "click")
        .select("user_id")
        .intersect(
            e.filter(F.col("event_type") == "purchase").select("user_id")
        )
        .agg(F.count(F.lit(1)).alias("exact_both"))
    )
    est_u = F.theta_sketch_estimate(F.theta_union(F.col("sk_c"), F.col("sk_p")))
    est_i = F.theta_sketch_estimate(
        F.theta_intersection(F.col("sk_c"), F.col("sk_p"))
    )
    return (
        sk.crossJoin(F.broadcast(both))
        .select(
            "exact_click",
            "exact_purchase",
            "exact_union",
            "exact_both",
            (
                F.abs(est_u - F.col("exact_union"))
                <= 0.05 * F.col("exact_union")
            ).alias("union_within_5pct"),
            (
                F.abs(est_i - F.col("exact_both"))
                <= 0.05 * F.greatest(F.col("exact_both"), F.lit(1))
            ).alias("inter_within_5pct"),
        )
    )


# -- partition-balance diagnosis ----------------------------------------------

_PB_BUCKETS = 32  # candidate shuffle width being diagnosed


@query(
    "diag_partition_balance",
    oracle=f"""
    WITH b AS (
        SELECT CAST(CONCAT('0x',
                   SUBSTR(MD5(CAST(l_orderkey AS VARCHAR)), 1, 7))
               AS BIGINT) % {_PB_BUCKETS} AS bucket
        FROM lineitem),
    per AS (SELECT bucket, COUNT(*) AS rows_in FROM b GROUP BY bucket),
    tot AS (SELECT SUM(rows_in) AS total, MAX(rows_in) AS max_r,
                   MIN(rows_in) AS min_r, COUNT(*) AS n_used FROM per)
    SELECT n_used AS n_buckets_used,
           total AS n_rows,
           min_r AS min_rows,
           max_r AS max_rows,
           max_r * 1000 // (total // {_PB_BUCKETS}) AS max_vs_even_permille,
           max_r * 1000 // total AS top_share_permille
    FROM tot
    """,
)
def diag_partition_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-balance diagnosis for a candidate partition key: hash
    l_orderkey into the target shuffle width (32) and report the
    straggler ratio — max bucket vs the even share — BEFORE paying for
    the real shuffle. The one-row census a pipeline runs when choosing
    between partition keys (the companion of diag_key_skew, which ranks
    the hot KEYS; this measures the resulting TASK imbalance).

    Determinism: the bucket is md5-derived (the mixture_sample idiom),
    NOT Spark's internal murmur hash — so the oracle replays it exactly
    and the census is engine-independent; Spark's own hash partitioner
    has the same uniformity class. Integer per-milles throughout.

    Scale shape: map-side partial agg collapses to <= 32 rows before
    one exchange; the census is a 1-row aggregate. Cost: one scan of
    ONE column."""
    l = load_table(spark, sf_dir, "lineitem")
    bucket = F.expr(
        f"pmod(cast(conv(substring(md5(cast(l_orderkey as string)), 1, 7),"
        f" 16, 10) as bigint), {_PB_BUCKETS})"
    )
    per = l.select(bucket.alias("bucket")).groupBy("bucket").agg(
        F.count(F.lit(1)).alias("rows_in")
    )
    return per.agg(
        F.count(F.lit(1)).alias("n_buckets_used"),
        F.sum("rows_in").alias("n_rows"),
        F.min("rows_in").alias("min_rows"),
        F.max("rows_in").alias("max_rows"),
    ).select(
        "n_buckets_used",
        "n_rows",
        "min_rows",
        "max_rows",
        F.expr(
            f"max_rows * 1000 div (n_rows div {_PB_BUCKETS})"
        ).alias("max_vs_even_permille"),
        F.expr("max_rows * 1000 div n_rows").alias("top_share_permille"),
    )


# -- rolling distinct actives (DAU / 3-day WAU / stickiness) ------------------

_ROLL_DAYS = 3


@query(
    "events_rolling_actives",
    oracle=f"""
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
    days AS (SELECT DISTINCT day FROM ud),
    cover AS (
        SELECT DISTINCT user_id, day + CAST(o.off AS INT) AS day
        FROM ud, LATERAL (SELECT UNNEST(GENERATE_SERIES(
            0, {_ROLL_DAYS - 1})) AS off) o),
    dau AS (SELECT day, COUNT(*) AS dau FROM ud GROUP BY day),
    roll AS (SELECT day, COUNT(*) AS actives_3d FROM cover GROUP BY day)
    SELECT d.day, dau.dau, r.actives_3d,
           dau.dau * 1000 // r.actives_3d AS stickiness_permille
    FROM days d
    JOIN dau ON dau.day = d.day
    JOIN roll r ON r.day = d.day
    ORDER BY d.day
    """,
)
def events_rolling_actives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily actives + rolling 3-day distinct actives + DAU/WAU-style
    stickiness per day — the engagement dashboard every event pipeline
    serves. Rolling DISTINCT counts are NOT window-expressible (a frame
    can sum, not dedupe), so this uses the coverage trick: each
    (user, day) pair covers days d..d+2; a second distinct collapses
    multi-day users; a plain count per covered day IS the rolling
    distinct count. Phantom trailing days are dropped by joining back
    to observed days.

    Scale shape: two distinct exchanges on (user, day) — the first
    collapses event volume to active-pairs (partial agg map-side), the
    explode is a fixed x{_ROLL_DAYS}, never event-volume; all counts
    integer, stickiness is exact integer per-mille. At 100 TB the
    exchanges carry user-day pairs (days x actives), orders of
    magnitude under event volume."""
    e = load_table(spark, sf_dir, "events")
    ud = e.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    days = ud.select("day").distinct()
    cover = (
        ud.select(
            "user_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, {_ROLL_DAYS - 1}),"
                    f" o -> date_add(day, o))"
                )
            ).alias("day"),
        )
        .distinct()
    )
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    roll = cover.groupBy("day").agg(F.count(F.lit(1)).alias("actives_3d"))
    return (
        days.join(dau, "day")
        .join(roll, "day")
        .select(
            "day",
            "dau",
            "actives_3d",
            F.expr("dau * 1000 div actives_3d").alias("stickiness_permille"),
        )
        .orderBy("day")
    )


# -- A/B experiment readout -----------------------------------------------------


@query(
    "events_ab_test",
    oracle="""
    WITH q AS (
        SELECT user_id % 2 AS grp,
               CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS qv
        FROM events),
    s AS (
        SELECT
            SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS n_a,
            SUM(CASE WHEN grp = 0 THEN qv ELSE 0 END) AS s_a,
            SUM(CASE WHEN grp = 0 THEN qv * qv ELSE 0 END) AS ss_a,
            SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS n_b,
            SUM(CASE WHEN grp = 1 THEN qv ELSE 0 END) AS s_b,
            SUM(CASE WHEN grp = 1 THEN qv * qv ELSE 0 END) AS ss_b
        FROM q),
    d AS (
        SELECT n_a, n_b,
               s_a * 1.0 / n_a AS m_a,
               s_b * 1.0 / n_b AS m_b,
               CASE WHEN n_a > 1 THEN
                   (ss_a - s_a * 1.0 * s_a / n_a) / (n_a - 1) END AS v_a,
               CASE WHEN n_b > 1 THEN
                   (ss_b - s_b * 1.0 * s_b / n_b) / (n_b - 1) END AS v_b
        FROM s)
    SELECT n_a, n_b,
           ROUND(m_a / 100, 6) AS mean_a,
           ROUND(m_b / 100, 6) AS mean_b,
           CASE WHEN n_a > 1 AND n_b > 1 AND v_a / n_a + v_b / n_b > 0
                THEN ROUND((m_a - m_b) / SQRT(v_a / n_a + v_b / n_b), 6)
           END AS t_stat,
           CASE WHEN n_a > 1 AND n_b > 1 AND v_a / n_a + v_b / n_b > 0
                THEN ABS(ROUND((m_a - m_b) /
                               SQRT(v_a / n_a + v_b / n_b), 6)) > 1.96
                ELSE FALSE
           END AS significant
    FROM d
    """,
)
def events_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample A/B readout (Welch t statistic) over a deterministic
    user split (user_id parity = assignment) — the experimentation
    census every event pipeline serves, reduced to engine-exact
    sufficient statistics.

    Exactness (the emb_drift pattern): the metric quantizes to integer
    cents BEFORE aggregation, so n/sum/sum-of-squares are
    order-independent BIGINTs; means and variances derive from those
    exact integers through one fixed chain of correctly-rounded IEEE
    ops (s*1.0*s stays under 2^53 where it must be exact), and the t
    statistic is rounded to 6dp before the significance compare —
    identical in both engines by construction, not by luck.

    Scale shape: ONE scan, one 6-column conditional aggregate with
    map-side partials, a 1-row report. The entire test costs a
    word-count."""
    e = load_table(spark, sf_dir, "events")
    q = e.select(
        (F.col("user_id") % 2).alias("grp"),
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("qv"),
    )
    is_a, is_b = F.col("grp") == 0, F.col("grp") == 1
    s = q.agg(
        F.sum(F.when(is_a, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(is_a, F.col("qv")).otherwise(F.lit(0))).alias("s_a"),
        F.sum(
            F.when(is_a, F.col("qv") * F.col("qv")).otherwise(F.lit(0))
        ).alias("ss_a"),
        F.sum(F.when(is_b, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(is_b, F.col("qv")).otherwise(F.lit(0))).alias("s_b"),
        F.sum(
            F.when(is_b, F.col("qv") * F.col("qv")).otherwise(F.lit(0))
        ).alias("ss_b"),
    )
    m_a = F.col("s_a") * 1.0 / F.col("n_a")
    m_b = F.col("s_b") * 1.0 / F.col("n_b")
    # variance defined only past one observation (the n-1 divisor);
    # NULL propagates through the guard below, so a degenerate split
    # (an arm with <=1 row, or zero pooled variance) reports an
    # explicit NULL t and significant=false instead of Inf/NaN
    v_a = F.when(
        F.col("n_a") > 1,
        (F.col("ss_a") - F.col("s_a") * 1.0 * F.col("s_a") / F.col("n_a"))
        / (F.col("n_a") - 1),
    )
    v_b = F.when(
        F.col("n_b") > 1,
        (F.col("ss_b") - F.col("s_b") * 1.0 * F.col("s_b") / F.col("n_b"))
        / (F.col("n_b") - 1),
    )
    ok = (
        (F.col("n_a") > 1)
        & (F.col("n_b") > 1)
        & (v_a / F.col("n_a") + v_b / F.col("n_b") > 0)
    )
    t = F.when(
        ok,
        F.round((m_a - m_b) / F.sqrt(v_a / F.col("n_a") + v_b / F.col("n_b")), 6),
    )
    return s.select(
        "n_a",
        "n_b",
        F.round(m_a / 100, 6).alias("mean_a"),
        F.round(m_b / 100, 6).alias("mean_b"),
        t.alias("t_stat"),
        F.when(ok, F.abs(t) > 1.96).otherwise(F.lit(False)).alias("significant"),
    )


_CSTAT_COLS = (
    # (name, kind): numeric columns report min/max as rounded doubles,
    # the string column reports min/max lexicographic, the date column
    # reports epoch days — one uniform output schema for all five
    ("l_orderkey", "num"),
    ("l_quantity", "num"),
    ("l_extendedprice", "num"),
    ("l_returnflag", "str"),
    ("l_shipdate", "day"),
)


def _cstat_oracle(exact: bool = True) -> str:
    parts = []
    for name, kind in _CSTAT_COLS:
        if kind == "num":
            mn, mx = f"ROUND(MIN({name}), 4)", f"ROUND(MAX({name}), 4)"
            ms = me = "NULL"
        elif kind == "day":
            mn = f"CAST(DATE_DIFF('day', DATE '1970-01-01', MIN({name})) AS DOUBLE)"
            mx = f"CAST(DATE_DIFF('day', DATE '1970-01-01', MAX({name})) AS DOUBLE)"
            ms = me = "NULL"
        else:
            mn = mx = "NULL"
            ms, me = f"MIN({name})", f"MAX({name})"
        ndv = (
            "COUNT(DISTINCT {0}) AS n_distinct, TRUE AS ndv_approx_ok,"
            if exact
            else "TRUE AS ndv_in_envelope,"
        ).format(name)
        parts.append(f"""
    SELECT '{name}' AS col_name,
           COUNT(*) AS n_rows,
           COUNT(*) - COUNT({name}) AS n_nulls,
           {ndv}
           CAST({mn} AS DOUBLE) AS min_num, CAST({mx} AS DOUBLE) AS max_num,
           CAST({ms} AS VARCHAR) AS min_str, CAST({me} AS VARCHAR) AS max_str
    FROM lineitem""")
        # noqa: the UNION keeps one scan per column in DuckDB; fine for
        # an oracle — the ENGINE side does it in ONE pass
    return "\nUNION ALL".join(parts) + "\nORDER BY col_name"


def _cstat_pass(li: DataFrame, exact: bool) -> DataFrame:
    """Shared single-pass column-statistics builder: one scan, one
    aggregate, output stacked to |columns| rows in-row. ``exact=True``
    pays Spark's Expand(5x) for exact COUNT(DISTINCT); ``exact=False``
    swaps in approx_count_distinct (HLL, rsd 2%) — constant sketch
    state per column, NO Expand, the 100 TB production form."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for name, kind in _CSTAT_COLS:
        aggs.append(
            F.sum(F.when(F.col(name).isNull(), 1).otherwise(0)).alias(
                f"nn_{name}"
            )
        )
        if exact:
            aggs.append(F.countDistinct(name).alias(f"nd_{name}"))
        aggs.append(
            F.approx_count_distinct(name, rsd=0.02).alias(f"ad_{name}")
        )
        if kind == "num":
            aggs.append(F.round(F.min(name), 4).cast("double").alias(f"mn_{name}"))
            aggs.append(F.round(F.max(name), 4).cast("double").alias(f"mx_{name}"))
        elif kind == "day":
            aggs.append(
                F.datediff(F.to_date(F.min(name)), F.lit("1970-01-01"))
                .cast("double")
                .alias(f"mn_{name}")
            )
            aggs.append(
                F.datediff(F.to_date(F.max(name)), F.lit("1970-01-01"))
                .cast("double")
                .alias(f"mx_{name}")
            )
        else:
            aggs.append(F.min(name).cast("string").alias(f"ms_{name}"))
            aggs.append(F.max(name).cast("string").alias(f"me_{name}"))
    wide = li.agg(*aggs)
    structs = []
    for name, kind in _CSTAT_COLS:
        if kind == "str":
            mn_num, mx_num = "cast(null as double)", "cast(null as double)"
            mn_str, mx_str = f"ms_{name}", f"me_{name}"
        else:
            mn_num, mx_num = f"mn_{name}", f"mx_{name}"
            mn_str, mx_str = "cast(null as string)", "cast(null as string)"
        if exact:
            # self-verification rung: the HLL estimate must land within
            # 3x its configured rsd of the exact count (|est-exact| <=
            # 6% — 3 sigma of rsd=0.02), so the approx twin's estimates
            # carry a machine-checked accuracy signal on every run
            ndv_cols = (
                f"nd_{name} as n_distinct,"
                f" abs(ad_{name} - nd_{name}) <= cast(0.06 * nd_{name}"
                f" as bigint) + 1 as ndv_approx_ok,"
            )
        else:
            # no exact ndv available in-pass (that's the point); the
            # hash-compared contract is the sanity envelope [1, 1.1 *
            # non-null count] — accuracy itself is pinned by the exact
            # rung's ndv_approx_ok on the same table
            ndv_cols = (
                f"ad_{name} >= least(1L, n_rows - nn_{name}) and"
                f" ad_{name} <= cast(1.1 * (n_rows - nn_{name}) as bigint)"
                f" + 1 as ndv_in_envelope,"
            )
        structs.append(
            f"struct('{name}' as col_name, n_rows, nn_{name} as n_nulls,"
            f" {ndv_cols} {mn_num} as min_num,"
            f" {mx_num} as max_num, {mn_str} as min_str, {mx_str} as max_str)"
        )
    return (
        wide.select(F.explode(F.expr(f"array({', '.join(structs)})")).alias("s"))
        .select("s.*")
        .orderBy("col_name")
    )


@query("diag_column_stats", oracle=_cstat_oracle())
def diag_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style per-column catalog statistics in ONE pass: row
    count, null count, EXACT distinct count, and min/max per column —
    the statistics a cost-based optimizer (and every capacity plan)
    feeds on. The reference's verify-everything discipline applied to
    the table itself: n_distinct(l_orderkey) vs n_rows reads fan-out,
    null counts catch ingestion drift, min/max bound partition pruning.

    Exactness: counts are integers; numeric min/max are exact column
    values rounded for display; the date column reports epoch days (no
    timestamp formatting parity trap); multiple exact COUNT(DISTINCT)s
    in one aggregate plan via Spark's Expand (each row replicated once
    per distinct-column — the documented cost of exact ndv; swap in
    approx_count_distinct when 2% error is acceptable at 100 TB).

    Scale shape: ONE scan, one Expand(5x) feeding a partial-agged
    exchange; output is |columns| rows via an in-row stack — no second
    pass, no join. The oracle unions per-column scans instead (DuckDB
    has no Expand); both reduce to identical integers.

    Round 7: this exact form is the VERIFICATION rung — it now also
    runs the HLL sketches in the same pass and hash-checks
    ndv_approx_ok (estimate within 3*rsd of exact, per column), so the
    benched diag_column_stats_approx twin's estimates carry a
    machine-checked accuracy bound on every oracle run."""
    return _cstat_pass(load_table(spark, sf_dir, "lineitem"), exact=True)


@query("diag_column_stats_approx", oracle=_cstat_oracle(exact=False))
def diag_column_stats_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION form of the column-statistics pass: identical
    single-scan shape but approx_count_distinct (HLL, rsd 2%) in place
    of exact COUNT(DISTINCT) — constant sketch state per column, no
    Expand(5x) row replication, so the scan costs what a plain
    aggregate costs at any corpus size. This is the form a 100 TB
    ANALYZE runs; diag_column_stats (exact) is its A19-style
    verification rung (the agg_approx_quantile / _verified precedent).

    Hash-compared contract: counts, nulls and min/max are exact; the
    per-column HLL estimate is pinned to the sanity envelope
    [1, 1.1 * non-null count] (ndv_in_envelope TRUE), while the
    accuracy bound |est - exact| <= 6% is enforced by the exact rung's
    ndv_approx_ok column over the same table."""
    return _cstat_pass(load_table(spark, sf_dir, "lineitem"), exact=False)


# Bloom-filter existence pre-join: m = 2^18 bits packed into 32-bit
# words (bit values < 2^32 fit BIGINT in both engines — no sign-bit
# trap at 1<<63), k = 3 md5-derived hash functions
_BLOOM_M = 1 << 18
_BLOOM_WORD = 32
_BLOOM_K = 3


def _bloom_h(key_sql: str, t: int, dialect: str) -> str:
    if dialect == "spark":
        return (
            f"pmod(cast(conv(substring(md5(concat(cast({key_sql} as string),"
            f" '#{t}')), 1, 7), 16, 10) as bigint), {_BLOOM_M})"
        )
    return (
        f"CAST(CONCAT('0x', SUBSTR(MD5(CONCAT(CAST({key_sql} AS VARCHAR),"
        f" '#{t}')), 1, 7)) AS BIGINT) % {_BLOOM_M}"
    )


def _bloom_oracle() -> str:
    build_rows = " UNION ALL ".join(
        f"SELECT {_bloom_h('o_orderkey', t, 'duck')} AS h FROM dim"
        for t in range(_BLOOM_K)
    )
    probe_rows = " UNION ALL ".join(
        f"SELECT k, {t} AS t, {_bloom_h('k', t, 'duck')} AS h FROM keys"
        for t in range(_BLOOM_K)
    )
    return f"""
    WITH dim AS (
        SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'),
    hs AS ({build_rows}),
    bloom AS (
        SELECT h // {_BLOOM_WORD} AS word,
               BIT_OR(CAST(1 AS BIGINT) << CAST(h % {_BLOOM_WORD} AS INT))
                   AS bits
        FROM hs GROUP BY word),
    keys AS (SELECT DISTINCT l_orderkey AS k FROM lineitem),
    probes AS ({probe_rows}),
    hit AS (
        SELECT p.k,
               SUM(CASE WHEN (b.bits >> CAST(p.h % {_BLOOM_WORD} AS INT))
                             & 1 = 1 THEN 1 ELSE 0 END) AS n_hit
        FROM probes p
        LEFT JOIN bloom b ON b.word = p.h // {_BLOOM_WORD}
        GROUP BY p.k),
    verdict AS (
        SELECT h.k, h.n_hit = {_BLOOM_K} AS bloom_pass,
               EXISTS (SELECT 1 FROM dim d WHERE d.o_orderkey = h.k)
                   AS is_member
        FROM hit h)
    SELECT COUNT(*) AS n_keys,
           SUM(CASE WHEN is_member THEN 1 ELSE 0 END) AS n_true,
           SUM(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS n_bloom_pass,
           SUM(CASE WHEN is_member AND NOT bloom_pass THEN 1 ELSE 0 END)
               AS n_false_neg,
           SUM(CASE WHEN bloom_pass AND NOT is_member THEN 1 ELSE 0 END)
               * 1000
               // GREATEST(COUNT(*) - SUM(CASE WHEN is_member THEN 1
                                          ELSE 0 END), 1)
               AS fp_permille,
           {_BLOOM_M} AS m_bits, {_BLOOM_K} AS k_hashes
    FROM verdict
    """


@query("join_existence_bloom", oracle=_bloom_oracle())
def join_existence_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter EXISTENCE pre-join, measured: build an m = 2^18-bit
    / k = 3 Bloom filter over a selective dim key set (urgent orders),
    probe every distinct fact key map-side, and compare the verdict
    against the exact semi join — n_false_neg MUST read 0 (the Bloom
    guarantee, hash-checked by the oracle) and fp_permille is the
    measured false-positive cost of skipping the exact join for
    filtered-out rows. This is the runtime-filter pattern Spark's own
    bloom-join rewrite applies under AQE, reified as a declared,
    value-checked operator: at 100 TB you ship the 32 KB filter to
    every scan task and drop non-member fact rows BEFORE the shuffle,
    paying only the measured fp rate in extra rows.

    Exactness: hash positions are md5-28-bit integers mod m (both
    engines bit-identical); the filter packs into 32-bit words in
    BIGINT lanes (no 1<<63 sign trap); membership is integer shift/AND;
    all counts exact.

    Scale shape: the build side partial-aggs |dim| keys into <= 8192
    words (constant-size, broadcast); probes fold per fact key after a
    DISTINCT partial-agg; the verdict joins fact keys against the
    BROADCAST bloom + a semi-check against dim. The whole census is
    one fact-key-sized exchange — the pair dump never exists."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    dim = o.where(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    hs = None
    for t in range(_BLOOM_K):
        part = dim.select(
            F.expr(_bloom_h("o_orderkey", t, "spark")).alias("h")
        )
        hs = part if hs is None else hs.unionAll(part)
    bloom = (
        hs.groupBy(F.expr(f"h div {_BLOOM_WORD}").alias("word"))
        .agg(
            F.expr(
                f"bit_or(shiftleft(1L, cast(h % {_BLOOM_WORD} as int)))"
            ).alias("bits")
        )
    )
    keys = li.select(F.col("l_orderkey").alias("k")).distinct()
    probes = None
    for t in range(_BLOOM_K):
        part = keys.select(
            "k", F.expr(_bloom_h("k", t, "spark")).alias("h")
        )
        probes = part if probes is None else probes.unionAll(part)
    hit = (
        probes.join(
            F.broadcast(bloom),
            F.expr(f"h div {_BLOOM_WORD}") == F.col("word"),
            "left",
        )
        .select(
            "k",
            F.when(
                F.expr(
                    f"(bits >> cast(h % {_BLOOM_WORD} as int)) & 1"
                ) == 1,
                1,
            )
            .otherwise(0)
            .alias("hit"),
        )
        .groupBy("k")
        .agg(F.sum("hit").alias("n_hit"))
    )
    member = dim.select(F.col("o_orderkey").alias("k")).withColumn(
        "is_member", F.lit(True)
    )
    verdict = (
        hit.join(member, "k", "left")
        .select(
            (F.col("n_hit") == _BLOOM_K).alias("bloom_pass"),
            F.coalesce("is_member", F.lit(False)).alias("is_member"),
        )
    )
    return verdict.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(F.when(F.col("is_member"), 1).otherwise(0)).alias("n_true"),
        F.sum(F.when(F.col("bloom_pass"), 1).otherwise(0)).alias(
            "n_bloom_pass"
        ),
        F.sum(
            F.when(F.col("is_member") & ~F.col("bloom_pass"), 1).otherwise(0)
        ).alias("n_false_neg"),
        F.expr(
            "sum(case when bloom_pass and not is_member then 1 else 0 end)"
            " * 1000 div greatest(count(1) - sum(case when is_member then 1"
            " else 0 end), 1L)"
        ).alias("fp_permille"),
        F.lit(_BLOOM_M).alias("m_bits"),
        F.lit(_BLOOM_K).alias("k_hashes"),
    )


# Count-Min sketch: D=4 hash rows x W=1024 columns; md5-derived column
# positions, estimates take the min over rows — one-sided (never
# under-counts), the mergeable heavy-hitter counter for 100 TB streams
_CM_D = 4
_CM_W = 1024
_CM_PROBE = 20


def _cm_col(key_sql: str, d: int, dialect: str) -> str:
    if dialect == "spark":
        return (
            f"pmod(cast(conv(substring(md5(concat(cast({key_sql} as string),"
            f" '#cm{d}')), 1, 7), 16, 10) as bigint), {_CM_W})"
        )
    return (
        f"CAST(CONCAT('0x', SUBSTR(MD5(CONCAT(CAST({key_sql} AS VARCHAR),"
        f" '#cm{d}')), 1, 7)) AS BIGINT) % {_CM_W}"
    )


def _cm_oracle() -> str:
    cells = " UNION ALL ".join(
        f"SELECT {d} AS d, {_cm_col('l_partkey', d, 'duck')} AS col"
        f" FROM lineitem"
        for d in range(_CM_D)
    )
    probe_est = " UNION ALL ".join(
        f"SELECT p.l_partkey, s.cnt FROM probe p JOIN sk s"
        f" ON s.d = {d} AND s.col = {_cm_col('p.l_partkey', d, 'duck')}"
        for d in range(_CM_D)
    )
    return f"""
    WITH exact AS (
        SELECT l_partkey, COUNT(*) AS n FROM lineitem GROUP BY l_partkey),
    probe AS (
        SELECT l_partkey, n FROM exact
        ORDER BY n DESC, l_partkey LIMIT {_CM_PROBE}),
    cells AS ({cells}),
    sk AS (SELECT d, col, COUNT(*) AS cnt FROM cells GROUP BY d, col),
    est AS (
        SELECT l_partkey, MIN(cnt) AS estimate
        FROM ({probe_est}) GROUP BY l_partkey)
    SELECT p.l_partkey, p.n AS exact_count, e.estimate,
           e.estimate >= p.n AS never_undercounts,
           (e.estimate - p.n) * 1000 // p.n AS over_permille
    FROM probe p JOIN est e USING (l_partkey)
    ORDER BY p.n DESC, p.l_partkey
    """


@query("agg_sketch_countmin", oracle=_cm_oracle())
def agg_sketch_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT-MIN sketch (Cormode-Muthukrishnan) with its guarantee
    hash-checked: a D=4 x W=1024 counter array over the part-key
    stream, probed at the 20 true heavy hitters — every estimate must
    satisfy estimate >= exact (never_undercounts TRUE in the compared
    output; a CM can only over-count on collisions) and the census
    reports the collision inflation in per-mille. Completes the sketch
    shelf: HLL (distinct), theta (set ops), GK (quantiles), Bloom
    (membership), CM (frequencies) — the five constant-memory answers
    a 100 TB pipeline substitutes for exact state.

    Exactness: column positions are md5-28-bit integers mod W in both
    engines; sketch cells and estimates are exact integer counts; the
    probe set is the exact top-20 with a deterministic (count DESC,
    key) tie-break.

    Scale shape: the sketch build is ONE pass — the D-way explode
    partial-aggregates map-side into at most D*W = 4096 cells
    (constant exchange at any corpus size; this is the point of CM);
    the exact side here exists only to verify the probes and is
    partial-agged on the key; estimates join the 20-row probe set
    against the 4096-cell sketch (both broadcast-sized)."""
    li = load_table(spark, sf_dir, "lineitem")
    exact = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n"))
    probe = exact.orderBy(F.desc("n"), F.asc("l_partkey")).limit(_CM_PROBE)
    cells = None
    for d in range(_CM_D):
        part = li.select(
            F.lit(d).alias("d"),
            F.expr(_cm_col("l_partkey", d, "spark")).alias("col"),
        )
        cells = part if cells is None else cells.unionAll(part)
    sk = cells.groupBy("d", "col").agg(F.count(F.lit(1)).alias("cnt"))
    est = None
    for d in range(_CM_D):
        part = probe.join(
            F.broadcast(sk.where(F.col("d") == d)),
            F.expr(_cm_col("l_partkey", d, "spark")) == F.col("col"),
        ).select("l_partkey", "cnt")
        est = part if est is None else est.unionAll(part)
    est = est.groupBy("l_partkey").agg(F.min("cnt").alias("estimate"))
    return (
        probe.join(est, "l_partkey")
        .select(
            "l_partkey",
            F.col("n").alias("exact_count"),
            "estimate",
            (F.col("estimate") >= F.col("n")).alias("never_undercounts"),
            F.expr("(estimate - n) * 1000 div n").alias("over_permille"),
        )
        .orderBy(F.desc("exact_count"), F.asc("l_partkey"))
    )


# packed-bitmap set index: 32 bit-positions per BIGINT word (the
# join_existence_bloom lane discipline) over the part-key domain
_BM_WORD = 32


@query(
    "bitmap_index_overlap",
    oracle=f"""
    WITH base AS (
        SELECT DISTINCT c.c_mktsegment AS seg, l.l_partkey AS p
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey),
    bm AS (
        SELECT seg, p // {_BM_WORD} AS word,
               BIT_OR(CAST(1 AS BIGINT) << CAST(p % {_BM_WORD} AS INT))
                   AS bits
        FROM base GROUP BY seg, word),
    card AS (
        SELECT seg, SUM(bit_count(bits)) AS n FROM bm GROUP BY seg),
    inter AS (
        SELECT a.seg AS seg_a, b.seg AS seg_b,
               SUM(bit_count(CAST(a.bits & b.bits AS BIGINT))) AS n_common
        FROM bm a JOIN bm b ON b.word = a.word AND a.seg < b.seg
        GROUP BY a.seg, b.seg)
    SELECT i.seg_a, i.seg_b,
           ca.n AS n_a, cb.n AS n_b, i.n_common,
           i.n_common * 1000 // (ca.n + cb.n - i.n_common)
               AS jaccard_permille
    FROM inter i
    JOIN card ca ON ca.seg = i.seg_a
    JOIN card cb ON cb.seg = i.seg_b
    ORDER BY seg_a, seg_b
    """,
)
def bitmap_index_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PACKED-BITMAP set index with pairwise overlap: the set of parts
    each customer segment buys, packed 32 keys per BIGINT word
    (roaring-lite), then every segment pair's EXACT intersection
    cardinality via bit_count(a & b) summed over co-located words —
    the columnar bitmap-index pattern (and the exact complement to
    agg_sketch_theta's approximate set algebra). Answers "how much do
    segment product ranges overlap" — market-basket separation — with
    set ops that cost popcounts, not joins over members.

    Exactness: bit positions are key modulo arithmetic; intersection
    is bitwise AND + popcount — all integers, both engines identical.

    Scale shape: the member list collapses to DISTINCT (seg, key) with
    a partial-agged exchange, then packs ~32x smaller into (seg, word)
    bitmaps; the pair pass is an EQUI join on word (co-partitioned,
    |segments|^2 rows per word at worst) — member rows are never
    pairwise-joined. At 100 TB with S segments and K keys the overlap
    costs S^2 * K/32 word-ANDs, shuffled once by word."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    base = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            F.col("c_mktsegment").alias("seg"),
            F.col("l_partkey").alias("p"),
        )
        .distinct()
    )
    bm = base.groupBy(
        "seg", F.expr(f"p div {_BM_WORD}").alias("word")
    ).agg(
        F.expr(
            f"bit_or(shiftleft(1L, cast(p % {_BM_WORD} as int)))"
        ).alias("bits")
    )
    card = bm.groupBy("seg").agg(
        F.expr("sum(bit_count(bits))").alias("n")
    )
    a, b = bm.alias("a"), bm.alias("b")
    inter = (
        a.join(
            b,
            (F.col("b.word") == F.col("a.word"))
            & (F.col("a.seg") < F.col("b.seg")),
        )
        .groupBy(
            F.col("a.seg").alias("seg_a"), F.col("b.seg").alias("seg_b")
        )
        .agg(
            F.expr(
                "sum(bit_count(cast(a.bits & b.bits as bigint)))"
            ).alias("n_common")
        )
    )
    ca = card.select(F.col("seg").alias("seg_a"), F.col("n").alias("n_a"))
    cb = card.select(F.col("seg").alias("seg_b"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(ca), "seg_a")
        .join(F.broadcast(cb), "seg_b")
        .select(
            "seg_a",
            "seg_b",
            "n_a",
            "n_b",
            "n_common",
            F.expr(
                "n_common * 1000 div (n_a + n_b - n_common)"
            ).alias("jaccard_permille"),
        )
        .orderBy("seg_a", "seg_b")
    )
