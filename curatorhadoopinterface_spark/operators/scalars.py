"""Scalar function surface (SURVEY.md section 2C: str/date/math/array/
map/json/hash functions, all JVM-side — no Python UDFs here).

Every expression stays inside whole-stage codegen; these are the
building blocks the annotation layer composes (span substring
extraction, content hashing, view-map algebra).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from curatorhadoopinterface_spark.functions.numeric import round_pos_double
from curatorhadoopinterface_spark.operators import query
from curatorhadoopinterface_spark.session import load_table


@query(
    "str_funcs",
    oracle="""
    SELECT c_custkey,
           SUBSTR(c_name, 1, 8)                         AS name_prefix,
           LENGTH(c_name)                               AS name_len,
           LOWER(c_mktsegment)                          AS seg_lower,
           UPPER(c_mktsegment)                          AS seg_upper,
           TRIM(CONCAT('  ', c_mktsegment, '  '))       AS seg_trim,
           CONCAT(c_name, '/', c_mktsegment)            AS name_seg,
           SPLIT_PART(c_name, '#', 2)                   AS name_num,
           REGEXP_EXTRACT(c_name, '([0-9]+)', 1)        AS digits,
           REGEXP_REPLACE(c_name, '[0-9]', 'x', 'g')    AS masked,
           LEVENSHTEIN(c_mktsegment, 'BUILDING')        AS lev_building,
           REPLACE(c_name, 'Customer', 'Cust')          AS short_name,
           LPAD(CAST(c_custkey AS VARCHAR), 10, '0')    AS padded_key
    FROM customer
    """,
)
def str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # substring-by-span (CuratorClient.java:1051-1053), Levenshtein text
    # guard (A15, implemented correctly — the reference self-compares).
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.upper("c_mktsegment").alias("seg_upper"),
        F.trim(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit("  "))).alias("seg_trim"),
        F.concat(F.col("c_name"), F.lit("/"), F.col("c_mktsegment")).alias("name_seg"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("name_num"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("digits"),
        F.regexp_replace("c_name", "[0-9]", "x").alias("masked"),
        F.levenshtein("c_mktsegment", F.lit("BUILDING")).alias("lev_building"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("short_name"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
    )


@query(
    "date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER)    AS yr,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER)   AS mo,
           CAST(EXTRACT(DAY FROM o_orderdate) AS INTEGER)     AS dom,
           CAST(EXTRACT(QUARTER FROM o_orderdate) AS INTEGER) AS qtr,
           CAST(DATE_TRUNC('month', o_orderdate) AS DATE)     AS month_start,
           CAST(DATE_DIFF('day', DATE '1995-01-01',
                          CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since_epoch_start,
           CAST(o_orderdate AS DATE) + 30                     AS due_date,
           LAST_DAY(CAST(o_orderdate AS DATE))                AS month_end
    FROM orders
    """,
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # lock-staleness/idle-kill time arithmetic analogue
    # (CuratorReducer.java:269-277, CuratorServer.java:174).
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.quarter("o_orderdate").alias("qtr"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch_start"
        ),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
        F.last_day(F.col("o_orderdate").cast("date")).alias("month_end"),
    )


@query(
    "math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount), 4)      AS net,
           ABS(l_discount - 0.05)                            AS disc_dev,
           CAST(FLOOR(l_quantity) AS BIGINT)                 AS qty_floor,
           CAST(CEIL(l_extendedprice / 1000.0) AS BIGINT)    AS price_k_ceil,
           ROUND(POW(l_quantity, 2), 2)                      AS qty_sq,
           ROUND(SQRT(l_extendedprice), 6)                   AS price_sqrt,
           ROUND(LN(l_extendedprice + 1), 6)                 AS price_ln,
           ROUND(LOG10(l_extendedprice + 1), 6)              AS price_log10,
           l_orderkey % 7                                    AS key_mod,
           CAST(SIGN(l_discount - 0.05) AS INTEGER)          AS disc_sign
    FROM lineitem
    """,
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # avg-ms-per-annotation style arithmetic (CuratorHandler.java:1006-1012).
    # Per-row rounds use round_pos_double (all inputs non-negative):
    # F.round on doubles is BigDecimal-per-value and dominated this
    # query's runtime (5.4s -> ~1s at sf0.1, bit-identical output).
    l = load_table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        # rounded at the exact decimal resolution (2dec x 2dec = 4dec) so
        # HALF_UP (Spark) vs HALF_EVEN (DuckDB) can never disagree
        round_pos_double(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("net"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor("l_quantity").alias("qty_floor"),
        F.ceil(F.col("l_extendedprice") / 1000.0).alias("price_k_ceil"),
        round_pos_double(F.pow("l_quantity", F.lit(2)), 2).alias("qty_sq"),
        round_pos_double(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        round_pos_double(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        round_pos_double(F.log10(F.col("l_extendedprice") + 1), 6).alias("price_log10"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.sign(F.col("l_discount") - 0.05).cast("int").alias("disc_sign"),
    )


@query(
    "array_funcs",
    oracle="""
    SELECT doc_id,
           LEN(STRING_SPLIT(text, ' '))                                  AS n_words,
           STRING_SPLIT(text, ' ')[1]                                    AS first_word,
           LIST_CONTAINS(STRING_SPLIT(text, ' '), 'data')                AS has_data,
           LEN(LIST_DISTINCT(STRING_SPLIT(text, ' ')))                   AS n_distinct_words,
           LIST_SORT(LIST_DISTINCT(STRING_SPLIT(text, ' ')))[1]          AS min_word,
           LEN(LIST_FILTER(STRING_SPLIT(text, ' '), w -> LENGTH(w) > 4)) AS n_long_words,
           ROUND(LIST_SUM(LIST_TRANSFORM(STRING_SPLIT(text, ' '),
                                         w -> LENGTH(w))) / 1.0, 2)      AS total_chars
    FROM documents
    """,
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # span-list algebra analogue (Labeling.labels arrays, SQL lambda fns).
    d = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.element_at(words, 1).alias("first_word"),
        F.array_contains(words, "data").alias("has_data"),
        F.size(F.array_distinct(words)).alias("n_distinct_words"),
        F.element_at(F.sort_array(F.array_distinct(words)), 1).alias("min_word"),
        F.size(F.filter(words, lambda w: F.length(w) > 4)).alias("n_long_words"),
        F.round(
            F.aggregate(words, F.lit(0), lambda acc, w: acc + F.length(w)).cast("double"), 2
        ).alias("total_chars"),
    )


@query(
    "map_funcs",
    oracle="""
    SELECT event_id,
           CASE event_type WHEN 'click' THEN 1 WHEN 'view' THEN 2
                WHEN 'purchase' THEN 3 WHEN 'signup' THEN 4
                WHEN 'error' THEN 5 END          AS type_code,
           event_type IN ('click','view','purchase','signup','error')
                                                 AS known_type,
           5                                     AS n_types
    FROM events
    """,
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # view-map algebra analogue (A17: map_keys/map_contains_key over the 4
    # view maps). The lookup table is a MAP column; the oracle states the
    # same lookups as CASE. Full MapType round-trips are exercised on the
    # Record corpus in tests (nested view maps).
    e = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("click"), F.lit(1), F.lit("view"), F.lit(2), F.lit("purchase"), F.lit(3),
        F.lit("signup"), F.lit(4), F.lit("error"), F.lit(5),
    )
    return e.select(
        "event_id",
        F.element_at(m, F.col("event_type")).alias("type_code"),
        F.map_contains_key(m, F.col("event_type")).alias("known_type"),
        F.size(F.map_keys(m)).alias("n_types"),
    )


@query(
    "json_funcs",
    oracle="""
    SELECT event_id,
           CAST(props->>'$.k' AS INTEGER) AS k_val,
           (props->>'$.k') IS NOT NULL    AS has_k
    FROM events
    """,
)
def json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Thrift-struct ser/de analogue (A5) — JSON is the engine's debug
    # interchange; from_json gives the typed struct path.
    e = load_table(spark, sf_dir, "events")
    parsed = F.from_json("props", "k INT")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
        parsed.getField("k").isNotNull().alias("has_k"),
    )


@query(
    "hash_funcs",
    oracle="""
    SELECT doc_id,
           MD5(text)                 AS text_md5,
           SHA256(text)              AS text_sha256,
           MD5(CONCAT('FLAG:false:', text)) AS identifier_md5
    FROM documents
    """,
)
def hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # content-hash identity (Identifier.java:38-70). SHA-1 (the exact
    # reference algorithm) has no DuckDB twin, so the oracle checks
    # md5/sha256; sha1 parity vs hashlib is covered in tests.
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2(F.col("text"), 256).alias("text_sha256"),
        F.md5(F.concat(F.lit("FLAG:false:"), F.col("text"))).alias("identifier_md5"),
    )


@query(
    "map_transform_funcs",
    oracle="""
    WITH per AS (
        SELECT user_id, event_type,
               COUNT(*) AS c, ROUND(SUM(value), 4) AS s
        FROM events GROUP BY user_id, event_type)
    SELECT user_id,
           COUNT(*) AS n_types,
           MAX(CASE WHEN event_type = 'click' THEN c * 10 END) AS click_x10,
           BOOL_OR(event_type = 'view') AS has_view,
           MAX(CASE WHEN event_type = 'purchase'
                    THEN FLOOR(s / c * 10000 + 0.5) / 10000 END)
               AS avg_purchase
    FROM per GROUP BY user_id
    """,
)
def map_transform_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-lambda algebra (the open-keyed view-map manipulation layer the
    Record model leans on, SURVEY §1.3): build per-user MAP columns with
    map_from_entries, then exercise transform_values (rescale),
    transform_keys (canonicalize), and map_zip_with (join two maps
    key-wise — counts vs sums → per-type average). Results project to
    scalars via element_at so the oracle states the identical lookups as
    conditional aggregates.

    Scale shape: ONE (user_id, event_type) partial-agged exchange feeds
    the map construction; all map lambdas are row-local JVM expressions
    (no second shuffle, no UDF) — at 100 TB this is how per-document
    view maps are rewritten in place without exploding them.
    """
    e = load_table(spark, sf_dir, "events")
    per = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c"), F.round(F.sum("value"), 4).alias("s")
    )
    maps = per.groupBy("user_id").agg(
        F.map_from_entries(F.collect_list(F.struct("event_type", "c"))).alias(
            "m_cnt"
        ),
        F.map_from_entries(F.collect_list(F.struct("event_type", "s"))).alias(
            "m_sum"
        ),
    )
    return maps.select(
        "user_id",
        F.size("m_cnt").alias("n_types"),
        F.element_at(
            F.transform_values("m_cnt", lambda k, v: v * 10), F.lit("click")
        ).alias("click_x10"),
        F.map_contains_key(
            F.transform_keys("m_cnt", lambda k, v: F.upper(k)), F.lit("VIEW")
        ).alias("has_view"),
        F.element_at(
            # floor(x*1e4+0.5)/1e4: both engines' identical double-native
            # half-up (a ROUND here can flip at a .00005 boundary because
            # the two engines' dividends differ by an ulp)
            F.map_zip_with(
                "m_cnt",
                "m_sum",
                lambda k, a, b: F.floor(b / a * 10000 + F.lit(0.5)) / 10000,
            ),
            F.lit("purchase"),
        ).alias("avg_purchase"),
    )


@query(
    "safe_arithmetic",
    oracle="""
    SELECT event_id,
           ROUND(value / NULLIF(user_id % 3, 0), 4) AS third_rate,
           (user_id % 3 = 0) AS div_by_zero,
           TRY_CAST(event_type AS INTEGER) AS bad_cast,
           TRY_CAST(props->>'$.k' AS INTEGER) AS good_cast,
           COALESCE(TRY_CAST(event_type AS INTEGER),
                    TRY_CAST(props->>'$.k' AS INTEGER), -1) AS first_valid
    FROM events
    """,
)
def safe_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe expression surface: try_divide (NULL instead of a
    divide-by-zero job failure), try_cast on non-numeric and numeric
    strings, and the coalesce-over-try fallback chain — the per-row
    failure budget (the reference tolerates 40% reduce failures,
    CuratorJob.java:280-285; the engine degrades per VALUE, not per
    task). Under ANSI mode plain ``/`` and ``CAST`` would abort the
    whole 100 TB job on one bad row; the try_* forms are the contract
    that keeps ingest running.

    Pure row-local column algebra: fuses into the scan, zero exchanges.
    """
    e = load_table(spark, sf_dir, "events")
    third = F.try_divide(F.col("value"), F.col("user_id") % 3)
    good = F.try_to_number(
        F.get_json_object("props", "$.k"), F.lit("999999")
    ).cast("int")
    return e.select(
        "event_id",
        F.round(third, 4).alias("third_rate"),
        (F.col("user_id") % 3 == 0).alias("div_by_zero"),
        F.col("event_type").try_cast("int").alias("bad_cast"),
        good.alias("good_cast"),
        F.coalesce(
            F.col("event_type").try_cast("int"), good, F.lit(-1)
        ).alias("first_valid"),
    )
