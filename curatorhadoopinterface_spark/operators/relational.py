"""Relational core (SURVEY.md section 2C: scans, projection, filter,
joins, aggregates, set ops, sampling, pivot, conditionals).

Design rules for 100 TB (see README "Scale notes"):
- every query is a single lazy Catalyst plan: filters first (pushdown),
  projections minimal (pruning), small dims broadcast explicitly;
- large-large joins are plain equi-joins so AQE can pick SMJ/SHJ and
  split skewed partitions;
- the as-of join uses the union+sort trick (one shuffle by key) instead
  of a non-equi join that would explode at scale;
- sampling/top-k are expressed with deterministic keys so results are
  reproducible across engines and cluster sizes.

Reference analogues cited per query (SURVEY.md section 2C table).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from curatorhadoopinterface_spark.operators import query
from curatorhadoopinterface_spark.session import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# flagship: pricing-summary scan+filter+agg (TPC-H Q1 shape). Exercises
# parquet scan w/ pushdown, grouped agg w/ partial aggregation (map-side
# combine is automatic in Catalyst hash agg).
# --------------------------------------------------------------------------
@query(
    "flagship_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE)
               AS sum_base_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(14,2))
                    * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))), 2)
               AS DOUBLE) AS sum_disc_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(14,2))
                    * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
                    * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))), 2)
               AS DOUBLE) AS sum_charge,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def flagship_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1. Money math is EXACT DECIMAL, not rounded double: at 10x
    volume (sf1 sweep) a 4.4e10 double sum holds only ~5 reliable decimal
    digits, so even 2-decimal rounding exposed last-cent summation-order
    dust. The 2-dp source values cast losslessly to DECIMAL, products
    widen exactly ((14,2)x(3,2)x(3,2) -> scale 6), and the sums are
    order-independent integers underneath — correct at ANY scale factor.
    Partial aggregation (map-side combine) still applies to decimal sums.
    avg derives from the exact sum / count in double (identical IEEE
    division in both engines)."""
    l = _t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(12,2)")
    price = F.col("l_extendedprice").cast("decimal(14,2)")
    one = F.lit(1).cast("decimal(3,2)")
    disc_price = price * (one - F.col("l_discount").cast("decimal(3,2)"))
    charge = disc_price * (one + F.col("l_tax").cast("decimal(3,2)"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            # round the EXACT decimal to 2dp before the double cast: a
            # scale-6 4e10 decimal needs 17 sig digits — past double
            # precision, where the two engines' decimal->double paths
            # differ in the last ulp; the 2dp value (13 digits) converts
            # to one unique nearest double
            F.round(F.sum(disc_price), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(charge), 2).cast("double").alias("sum_charge"),
            F.round(
                F.sum(qty).cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# scans & projection (A1/A2 directory scan; RecordTools.getContents)
# --------------------------------------------------------------------------
@query(
    "scan_parquet",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
    FROM lineitem WHERE l_linenumber >= 4
    """,
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    # projection + predicate reach the parquet reader (PushedFilters /
    # ReadSchema visible in .explain("formatted")).
    return (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_linenumber") >= 4)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
    )


@query(
    "project_rename_cast",
    oracle="""
    SELECT c_custkey AS custkey,
           UPPER(c_name) AS cust_name,
           CAST(TRUNC(c_acctbal) AS BIGINT) AS acctbal_int,
           CAST(c_nationkey AS VARCHAR) AS nation_str
    FROM customer
    """,
)
def project_rename_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"),
        F.upper("c_name").alias("cust_name"),
        F.col("c_acctbal").cast("bigint").alias("acctbal_int"),
        F.col("c_nationkey").cast("string").alias("nation_str"),
    )


@query(
    "filter_pred",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders
    WHERE (o_orderstatus = 'F' OR o_orderstatus = 'P')
      AND NOT (o_totalprice < 1000.0)
      AND o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1999-12-31'
      AND o_custkey IS NOT NULL
      AND o_orderpriority LIKE '%H%'
    """,
)
def filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    # empty-text filter analogue: CuratorClient.java:527-536.
    o = _t(spark, sf_dir, "orders")
    return o.filter(
        ((F.col("o_orderstatus") == "F") | (F.col("o_orderstatus") == "P"))
        & ~(F.col("o_totalprice") < 1000.0)
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & F.col("o_orderdate").between(
            F.lit("1995-01-01").cast("timestamp"), F.lit("1999-12-31").cast("timestamp")
        )
        & F.col("o_custkey").isNotNull()
        & F.col("o_orderpriority").like("%H%")
    ).select("o_orderkey", "o_totalprice", "o_orderpriority")


# --------------------------------------------------------------------------
# joins
# --------------------------------------------------------------------------
@query(
    "join_broadcast",
    oracle="""
    SELECT r_name, n_name, COUNT(*) AS n_customers,
           ROUND(SUM(c_acctbal), 2) AS total_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    # record<->DB match by hash analogue (A18); dims broadcast so the fact
    # table never shuffles — the 100 TB plan for star joins.
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


@query(
    "join_sortmerge",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE)
               AS revenue
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
    GROUP BY o_orderpriority
    """,
)
def join_sortmerge(spark: SparkSession, sf_dir: str) -> DataFrame:
    # large-large equi join: shuffle on the join key; AQE picks SMJ/SHJ
    # and splits skewed partitions at scale.
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
    l = _t(spark, sf_dir, "lineitem")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            # exact DECIMAL sum: a 4e11 double sum rounded to 2dp flips
            # a cent at 100x on summation order (caught by the sf10
            # sweep; the recurring Q1/rollup/scan_orc class)
            F.sum(F.col("l_extendedprice").cast("decimal(14,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


@query(
    "join_outer",
    oracle="""
    SELECT c_custkey,
           COUNT(o_orderkey) AS n_orders,
           ROUND(COALESCE(SUM(o_totalprice), 0.0), 2) AS spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DB-miss => blank record analogue (A21): unmatched left rows survive
    # with null right side.
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("spend"),
        )
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (
        SELECT o_custkey FROM orders WHERE o_totalprice > 40000.0)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    # cache-hit skip analogue (A21): keep rows with a match, no dup blowup.
    c = _t(spark, sf_dir, "customer")
    big = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 40000.0)
    return c.join(big, c.c_custkey == big.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the incremental layer's cache-miss detection (A21) is exactly this.
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "join_range",
    oracle="""
    SELECT p_brand, COUNT(*) AS n_pairs, ROUND(SUM(l_quantity), 2) AS qty
    FROM lineitem JOIN part ON l_partkey = p_partkey AND l_quantity > p_size
    GROUP BY p_brand
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    # theta predicate on top of the equi key: Catalyst keeps the equi part
    # as the shuffle key and applies the range residual post-match, so
    # this stays a hash/SMJ join (never a cartesian) at any scale.
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    return (
        l.join(p, (l.l_partkey == p.p_partkey) & (l.l_quantity > p.p_size))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.sum("l_quantity"), 2).alias("qty"),
        )
    )


@query(
    "join_interval",
    oracle="""
    SELECT a.user_id, COUNT(*) AS n_overlaps
    FROM events a JOIN events b
      ON a.user_id = b.user_id AND a.event_id < b.event_id
     AND a.ts < b.ts + INTERVAL 5 MINUTE AND b.ts < a.ts + INTERVAL 5 MINUTE
    GROUP BY a.user_id
    """,
)
def join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    # span-overlap test (IllinoisNERHandler.findSpan:309-329 analogue):
    # equi key (user) bounds the candidate set; interval predicate is the
    # residual. Same pattern as token-span x sentence-span joins.
    e = _t(spark, sf_dir, "events")
    a = e.alias("a")
    b = e.alias("b")
    five = F.expr("INTERVAL 5 MINUTES")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_id") < F.col("b.event_id"))
            & (F.col("a.ts") < F.col("b.ts") + five)
            & (F.col("b.ts") < F.col("a.ts") + five),
        )
        .groupBy(F.col("a.user_id").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n_overlaps"))
    )


@query(
    "join_asof",
    oracle="""
    SELECT e.event_id, MAX(o.o_orderdate) AS last_order_ts
    FROM events e
    LEFT JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    GROUP BY e.event_id
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    # As-of join via the union+sort trick: tag both sides, union, one
    # shuffle by key, running last(order_ts) over the merged timeline.
    # At 100 TB this is ONE shuffle + sort per side (no non-equi blowup:
    # a naive range join would be |events| x |orders| per key).
    e = _t(spark, sf_dir, "events")
    o = _t(spark, sf_dir, "orders")
    order_side = o.select(
        F.col("o_custkey").alias("uid"),
        F.col("o_orderdate").alias("ts"),
        F.lit(0).alias("kind"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("o_orderdate").alias("order_ts"),
    )
    event_side = e.select(
        F.col("user_id").alias("uid"),
        F.col("ts"),
        F.lit(1).alias("kind"),
        F.col("event_id"),
        F.lit(None).cast("timestamp").alias("order_ts"),
    )
    merged = order_side.unionByName(event_side)
    # order rows sort before event rows at equal ts (kind 0 < 1), so an
    # order exactly at the event time counts (<= semantics, matching the
    # oracle's o_orderdate <= e.ts).
    w = (
        Window.partitionBy("uid")
        .orderBy("ts", "kind", "order_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        merged.withColumn("last_order_ts", F.last("order_ts", ignorenulls=True).over(w))
        .filter(F.col("kind") == 1)
        .select("event_id", "last_order_ts")
    )


# --------------------------------------------------------------------------
# aggregates
# --------------------------------------------------------------------------
@query(
    "agg_groupby",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           ROUND(SUM(l_quantity), 2) AS total_qty,
           ROUND(MIN(l_extendedprice), 2) AS min_price,
           ROUND(MAX(l_extendedprice), 2) AS max_price,
           ROUND(AVG(l_discount), 6) AS avg_disc
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    # view-counting analogue (A17); partial aggregation (map-side combine)
    # is automatic in Catalyst HashAggregate.
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
            F.round(F.min("l_extendedprice"), 2).alias("min_price"),
            F.round(F.max("l_extendedprice"), 2).alias("max_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        )
    )


@query(
    "agg_count_distinct",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(DISTINCT o_orderpriority) AS n_priorities
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    # annotation-set dedup analogue (A12).
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.countDistinct("o_orderpriority").alias("n_priorities"),
        )
    )


@query(
    "agg_approx_count_distinct",
    oracle="SELECT TRUE AS approx_ok",
)
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    # HLL sketches differ across engines, so the oracle contract is a
    # bounded-error check: the query itself asserts |approx-exact| <= 5%
    # and returns the boolean — hash-matches iff the sketch is in bounds.
    o = _t(spark, sf_dir, "orders")
    agg = o.agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx"),
        F.countDistinct("o_custkey").alias("exact"),
    )
    return agg.select(
        (F.abs(F.col("approx") - F.col("exact")) <= 0.05 * F.col("exact")).alias("approx_ok")
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2)
                AS DOUBLE) AS total
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact-DECIMAL money sum (flagship_pricing_summary policy): the
    # grand-total rollup row reaches 3.75e12 at sf10, where a double
    # sum rounded to 2dp drifted 2 cents (round-5 100x rung)
    return (
        _t(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total"),
        )
    )


@query(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


# --------------------------------------------------------------------------
# sort / limit / sampling / set ops / dedup / pivot / conditional
# --------------------------------------------------------------------------
@query(
    "sort_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
    """,
)
def sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # global top-N: Spark runs per-partition TakeOrdered + driver merge —
    # no full sort of 100 TB. Unique-key tiebreak keeps it deterministic.
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(25)
    )


@query(
    "sample_n",
    oracle="""
    SELECT l_orderkey, l_linenumber FROM lineitem
    ORDER BY md5(CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR))
    LIMIT 100
    """,
)
def sample_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A13 random sampling w/o replacement, made engine-reproducible:
    # order by a keyed hash instead of rand(seed) (seeds don't transfer
    # across engines). Distributed top-N by hash — no global sort.
    l = _t(spark, sf_dir, "lineitem")
    h = F.md5(F.concat_ws(":", F.col("l_orderkey"), F.col("l_linenumber")))
    return l.orderBy(h).select("l_orderkey", "l_linenumber").limit(100)


@query(
    "set_union",
    oracle="""
    SELECT n_nationkey AS k FROM nation WHERE n_regionkey = 0
    UNION
    SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9000.0
    """,
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _t(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 0).select(F.col("n_nationkey").alias("k"))
    b = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000.0).select(F.col("c_nationkey").alias("k"))
    return a.union(b).distinct()


@query(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS k FROM customer
    INTERSECT
    SELECT s_nationkey AS k FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    # common-annotation intersect analogue (A12, JobHandler.java:508-546).
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.intersect(s)


@query(
    "set_except",
    oracle="""
    SELECT c_nationkey AS k FROM customer
    EXCEPT
    SELECT s_nationkey AS k FROM supplier
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    # verify-diff analogue (A19, CuratorClient.verifyRecords).
    # subtract == EXCEPT (set semantics); exceptAll is the bag variant.
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.subtract(s)


@query(
    "dedup_exact",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus, l_quantity FROM lineitem
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    # by-hash identity dedup (Identifier.java:67-70: same text => same id).
    # dropDuplicates over the projected key set == DISTINCT; the content-
    # hash variant for corpora lives in plans/incremental.py.
    return _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus", "l_quantity").dropDuplicates()


@query(
    "pivot_table",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS F,
           ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS O
    FROM lineitem GROUP BY l_returnflag
    """,
)
def pivot_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    # explicit pivot values avoid the extra distinct-values job at scale.
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )


@query(
    "case_when",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 30000.0 THEN 'high'
                WHEN o_totalprice >= 10000.0 THEN 'mid'
                ELSE 'low' END AS price_band,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_norm
    FROM orders
    """,
)
def case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    # blank-record-on-miss analogue (CuratorHandler.java:511-521).
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 30000.0, "high")
        .when(F.col("o_totalprice") >= 10000.0, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias("status_norm"),
    )


@query(
    "join_outer_full",
    oracle="""
    WITH c AS (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 5000),
    o AS (SELECT o_custkey, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS spend
          FROM orders WHERE o_totalprice > 100000 GROUP BY o_custkey)
    SELECT COALESCE(c.c_custkey, o.o_custkey) AS custkey,
           c.c_custkey IS NOT NULL AS has_customer,
           o.o_custkey IS NOT NULL AS has_orders,
           COALESCE(o.n_orders, 0) AS n_orders,
           ROUND(COALESCE(c.c_acctbal, 0.0), 2) AS acctbal,
           COALESCE(o.spend, 0.0) AS spend
    FROM c FULL OUTER JOIN o ON o.o_custkey = c.c_custkey
    """,
)
def join_outer_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER with both sides genuinely null-extending (each side is
    filtered so the other contributes unmatched rows) — the blank-record-
    on-miss shape of A21 from both directions. AQE plans a sort-merge
    full join; at scale the null-extended sides stream, nothing builds a
    hash table of the big side."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000).select(
        "c_custkey", "c_acctbal"
    )
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 100000)
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("spend"),
        )
    )
    j = c.join(o, c["c_custkey"] == o["o_custkey"], "full_outer")
    return j.select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        F.col("c_custkey").isNotNull().alias("has_customer"),
        F.col("o_custkey").isNotNull().alias("has_orders"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.round(F.coalesce("c_acctbal", F.lit(0.0)), 2).alias("acctbal"),
        F.coalesce("spend", F.lit(0.0)).alias("spend"),
    )


@query(
    "agg_percentile",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
           ROUND(quantile_cont(l_quantity, 0.9), 4) AS p90_qty,
           ROUND(quantile_cont(l_extendedprice, 0.99), 2) AS p99_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (continuous interpolation — Spark `percentile`
    == DuckDB `quantile_cont`). Exact quantiles need the group's values
    together (one shuffle); at 100 TB swap in approx_percentile
    (t-digest, partial-aggregable, no full materialization) once the
    tolerance is agreed — the approximate twin of A17's counters."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("median_qty"),
        F.round(F.expr("percentile(l_quantity, 0.9)"), 4).alias("p90_qty"),
        F.round(F.expr("percentile(l_extendedprice, 0.99)"), 2).alias("p99_price"),
    )


@query(
    "flagship_local_supplier_volume",
    oracle="""
    SELECT n.n_name AS nation,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           COUNT(*) AS n_items
    FROM customer c
    JOIN orders o    ON o.o_custkey = c.c_custkey
    JOIN lineitem l  ON l.l_orderkey = o.o_orderkey
    JOIN supplier s  ON s.s_suppkey = l.l_suppkey
                    AND s.s_nationkey = c.c_nationkey
    JOIN nation n    ON n.n_nationkey = c.c_nationkey
    JOIN region r    ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= DATE '1994-01-01'
      AND o.o_orderdate <  DATE '1996-01-01'
    GROUP BY n.n_name
    """,
)
def flagship_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: the multi-way join every warehouse query at
    100 TB lives and dies by. Catalyst reorders; only the FIXED-SIZE
    dims (nation/region) carry broadcast hints — supplier scales with
    SF, so its join strategy is left to AQE (broadcast at small SF,
    shuffle join at 100x). The fact-fact orders-lineitem join shuffles
    once on orderkey, and the o_orderdate range predicate pushes into
    the orders scan (at scale: the partition-pruning column). The
    customer-nation == supplier-nation equality is the 'local supplier'
    residual."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1994-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("date"))
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    j = (
        c.join(o, o["o_custkey"] == c["c_custkey"])
        .join(li, li["l_orderkey"] == o["o_orderkey"])
        .join(
            # no broadcast hint: supplier scales with SF (~10M rows/TB);
            # AQE picks broadcast at small SF and shuffle join at 100x.
            # nation/region below stay hinted — they are fixed-size dims.
            s,
            (s["s_suppkey"] == li["l_suppkey"])
            & (s["s_nationkey"] == c["c_nationkey"]),
        )
        .join(F.broadcast(n), n["n_nationkey"] == c["c_nationkey"])
        .join(F.broadcast(r), r["r_regionkey"] == n["n_regionkey"])
    )
    return j.groupBy(F.col("n_name").alias("nation")).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "sample_stratified",
    oracle="""
    SELECT lang, source,
           COUNT(*) AS n_sampled,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents
    WHERE SUBSTR(MD5(text), 1, 1) <
          CASE WHEN lang = 'en' THEN '4' ELSE '8' END
    GROUP BY lang, source
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling with per-stratum rates (downsample the
    dominant language: 25% for 'en', 50% for the rest) — the
    training-data-mix knob every corpus pipeline needs, and the exact-
    semantics upgrade of the reference's random file sampling
    (JobHandler.java:579-606, A13).

    Content-hash thresholding (first md5 hex nibble) instead of rand():
    deterministic across engines/retries/cluster sizes, embarrassingly
    parallel (a pure filter — no shuffle, no seed coordination), and
    stable under re-partitioning, which rand(seed) is NOT at scale.
    """
    d = load_table(spark, sf_dir, "documents")
    thr = F.when(F.col("lang") == "en", F.lit("4")).otherwise(F.lit("8"))
    return (
        d.filter(F.substring(F.md5("text"), 1, 1) < thr)
        .groupBy("lang", "source")
        .agg(F.count("*").alias("n_sampled"), F.sum("n_chars").alias("sum_chars"))
    )


@query(
    "agg_histogram",
    oracle="""
    SELECT CAST(FLOOR(value / 5.0) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS sum_value
    FROM events
    GROUP BY bucket
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram over a numeric column (width_bucket
    emulation with plain integer arithmetic so both engines bucket
    identically). Distribution profiling is a first-pass op on any new
    100 TB corpus; the plan is a single map-side-combined hash aggregate
    on a derived key — the cheapest shuffle shape there is (bucket
    cardinality, not row count, crosses the wire).
    """
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.floor(F.col("value") / 5.0).cast("long").alias("bucket"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
    )


@query(
    "agg_argmax",
    oracle="""
    SELECT user_id,
           arg_max(event_id, ts) AS last_event_id,
           arg_min(event_id, ts) AS first_event_id,
           MAX(ts) AS last_ts
    FROM events GROUP BY user_id
    """,
)
def agg_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest/earliest row per key via max_by/min_by — the argmax
    aggregate (reference analogue: keep the record copy with the most
    views, CuratorClient.java:581-651/A18, which is argmax over view
    count). ONE hash aggregate with map-side partials — strictly
    cheaper at scale than the row_number window idiom, which must sort
    every partition. Deterministic because (user_id, ts) is unique."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.max_by("event_id", "ts").alias("last_event_id"),
        F.min_by("event_id", "ts").alias("first_event_id"),
        F.max("ts").alias("last_ts"),
    )


@query(
    "subquery_correlated",
    oracle="""
    SELECT p.p_brand,
           COUNT(*) AS n_small,
           ROUND(SUM(l.l_extendedprice), 2) AS small_revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_quantity < (
        SELECT 0.5 * AVG(l2.l_quantity)
        FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
    GROUP BY p.p_brand
    """,
)
def subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: lineitems below half their part's average
    quantity, revenue per brand. Expressed DE-CORRELATED — the
    per-part average is ONE aggregate joined back on l_partkey —
    which is exactly the rewrite Catalyst would have to find for the
    correlated scalar subquery; writing it directly guarantees the
    single-pass plan (no per-row re-aggregation) at any scale. The
    part dim joins broadcast; the lineitem-vs-avg join co-partitions
    on l_partkey."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    part_avg = l.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg_qty")
    )
    return (
        l.join(part_avg, "l_partkey")
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_small"),
            F.round(F.sum("l_extendedprice"), 2).alias("small_revenue"),
        )
    )


@query(
    "flagship_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate,
           o_orderpriority
    FROM customer
    JOIN orders    ON c_custkey = o_custkey
    JOIN lineitem  ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-01'
      AND l_shipdate  > TIMESTAMP '1998-06-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def flagship_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): the 10 highest-revenue
    unshipped orders for one market segment as of a cutoff date.

    Scale shape: both date predicates push to the parquet scans
    (orders and lineitem shrink BEFORE any join); the customer side is
    filtered to one segment and only contributes a semi-join-like
    existence check, so it joins first against the reduced orders; the
    revenue aggregate partial-aggregates on l_orderkey before its
    exchange, and the top-10 is a TakeOrdered, never a full sort.
    Determinism: revenue rounds to 2dp in-query and ties break on
    (o_orderdate, l_orderkey).
    """
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "flagship_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           EXTRACT(YEAR FROM l_shipdate) AS l_year,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def flagship_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): bilateral trade volume between
    two nations per shipment year.

    Scale shape: the shipdate range predicate pushes to the lineitem
    scan (the fact table shrinks first); nation is a fixed 25-row dim —
    both copies broadcast, and the nation-pair disjunction evaluates
    AFTER the cheap broadcast joins rather than forcing a pre-join
    filter on the scaling tables. supplier and customer join on their
    keys under AQE (they scale with SF, so no broadcast hint —
    flagship_local_supplier_volume precedent); the final aggregate is
    three columns wide and partial-aggregates map-side.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") <= F.lit("1996-12-31").cast("timestamp"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    n1 = F.broadcast(
        load_table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = F.broadcast(
        load_table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
        )
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        supp.join(li, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "flagship_market_share",
    oracle="""
    WITH all_nations AS (
        SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               n2.n_name AS supp_nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region    ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'EUROPE'
          AND p_type = 'PROMO'
          AND o_orderdate BETWEEN TIMESTAMP '1995-01-01'
                              AND TIMESTAMP '1996-12-31')
    SELECT o_year,
           ROUND(SUM(CASE WHEN supp_nation = 'NATION_1' THEN volume ELSE 0 END), 2)
               AS nation_volume,
           ROUND(SUM(volume), 2) AS total_volume,
           ROUND(ROUND(SUM(CASE WHEN supp_nation = 'NATION_1' THEN volume ELSE 0 END), 2)
                 / ROUND(SUM(volume), 2), 6) AS mkt_share
    FROM all_nations GROUP BY o_year
    """,
)
def flagship_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): one supplier nation's
    share of PROMO-part revenue sold into EUROPE customers, per order
    year.

    Scale shape: the p_type predicate pushes to the part scan and the
    order-date range to the orders scan — both join inputs shrink before
    the fact joins; region (5 rows) and both nation copies (25 rows)
    broadcast; the conditional share is a single-pass pivot-free
    CASE aggregate, so one group-by exchange on o_year carries two
    partial sums. Determinism: numerator and denominator round to 2dp
    in-query before the share division rounds to 6dp, matching the
    corpus-wide rounding discipline.
    """
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") <= F.lit("1996-12-31").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    n1 = F.broadcast(
        load_table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n1_key"),
            F.col("n_regionkey").alias("n1_region"),
        )
    )
    n2 = F.broadcast(
        load_table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
        )
    )
    region = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nation_vol = F.round(
        F.sum(F.when(F.col("supp_nation") == "NATION_1", vol).otherwise(0.0)), 2
    )
    total_vol = F.round(F.sum(vol), 2)
    return (
        part.join(li, F.col("p_partkey") == F.col("l_partkey"))
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(n1, F.col("c_nationkey") == F.col("n1_key"))
        .join(region, F.col("n1_region") == F.col("r_regionkey"))
        .join(n2, F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            nation_vol.alias("nation_volume"),
            total_vol.alias("total_volume"),
            F.round(nation_vol / total_vol, 6).alias("mkt_share"),
        )
    )


@query(
    "flagship_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           ROUND(c_acctbal, 2) AS acctbal,
           n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1995-07-01'
      AND o_orderdate <  TIMESTAMP '1995-10-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def flagship_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): the 20 customers who
    returned the most revenue in one quarter.

    Scale shape: the quarter predicate pushes to the orders scan and the
    returnflag predicate to the lineitem scan — both fact inputs shrink
    before the join; nation broadcasts; the group-by keys include the
    customer attributes so the aggregate needs no join-back; top-20 is a
    TakeOrdered with (revenue DESC, c_custkey) tie-break.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-10-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            "c_custkey",
            "c_name",
            F.round("c_acctbal", 2).alias("acctbal"),
            "n_name",
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "flagship_customer_distribution",
    oracle="""
    WITH c_orders AS (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer
        LEFT JOIN orders ON c_custkey = o_custkey
                        AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey)
    SELECT c_count, COUNT(*) AS custdist
    FROM c_orders
    GROUP BY c_count
    """,
)
def flagship_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer distribution): histogram of per-customer
    non-urgent order counts, INCLUDING the zero bucket — the left join
    keeps order-less customers and COUNT(o_orderkey) ignores their null
    rows (the classic outer-join-into-double-aggregate pattern).

    Scale shape: the priority predicate lives in the JOIN condition (not
    a WHERE, which would silently turn the outer join inner); the first
    aggregate is keyed on the join key so it rides the join's own
    c_custkey exchange, and the second group-by is over a few dozen
    count buckets — a tiny partial-agged exchange.
    """
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority"
    )
    c_orders = (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return c_orders.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "join_asof_tolerance",
    oracle="""
    WITH matched AS (
        SELECT e.event_id, e.ts, MAX(o.o_orderdate) AS last_order_ts
        FROM events e
        LEFT JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        GROUP BY e.event_id, e.ts)
    SELECT event_id,
           CASE WHEN last_order_ts >= ts - INTERVAL 30 DAY
                THEN last_order_ts END AS last_order_ts,
           (last_order_ts IS NOT NULL
            AND last_order_ts >= ts - INTERVAL 30 DAY) AS within_tolerance
    FROM matched
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a max-staleness tolerance: the latest order at or
    before each event counts only if it is within 30 days — older
    matches null out (the time-series join contract: a stale quote is
    no quote).

    Scale shape: identical to join_asof — ONE shuffle per side via the
    union+sort trick, running last() over the merged per-user timeline —
    the tolerance is a post-window column predicate, so it adds zero
    exchanges (a naive bounded-range join would be |events| x |orders|
    per key before filtering).
    """
    e = _t(spark, sf_dir, "events")
    o = _t(spark, sf_dir, "orders")
    order_side = o.select(
        F.col("o_custkey").alias("uid"),
        F.col("o_orderdate").alias("ts"),
        F.lit(0).alias("kind"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("o_orderdate").alias("order_ts"),
    )
    event_side = e.select(
        F.col("user_id").alias("uid"),
        F.col("ts"),
        F.lit(1).alias("kind"),
        F.col("event_id"),
        F.lit(None).cast("timestamp").alias("order_ts"),
    )
    merged = order_side.unionByName(event_side)
    w = (
        Window.partitionBy("uid")
        .orderBy("ts", "kind", "order_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ok = F.col("raw_last") >= F.col("ts") - F.expr("INTERVAL 30 DAYS")
    return (
        merged.withColumn("raw_last", F.last("order_ts", ignorenulls=True).over(w))
        .filter(F.col("kind") == 1)
        .select(
            "event_id",
            F.when(ok, F.col("raw_last")).alias("last_order_ts"),
            (F.col("raw_last").isNotNull() & ok).alias("within_tolerance"),
        )
    )


@query(
    "flagship_forecast_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def flagship_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (forecasting revenue change): the pure-pushdown
    flagship — three conjunctive predicates on one table collapsing to a
    single global aggregate.

    Scale shape: ALL three predicates reach the parquet reader
    (PushedFilters carries the date range, the discount band, and the
    quantity bound — row groups outside any band never decompress), the
    scan reads only the four referenced columns, and the aggregate is a
    map-side partial folded to one row. At 100 TB this query is pure
    scan bandwidth; anything beyond one exchange of 32 partial rows is
    a plan bug.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "flagship_promo_effect",
    oracle="""
    SELECT ROUND(100.0 * ROUND(SUM(CASE WHEN p_type = 'PROMO'
                         THEN l_extendedprice * (1 - l_discount)
                         ELSE 0 END), 2)
                 / ROUND(SUM(l_extendedprice * (1 - l_discount)), 2), 4)
               AS promo_pct,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01'
      AND l_shipdate <  TIMESTAMP '1996-04-01'
    """,
)
def flagship_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): promotional revenue share of
    one month's shipments — the conditional-share-of-total aggregate.

    Scale shape: the month predicate pushes to the lineitem scan, the
    part side joins on its key (a dimension that scales with SF — no
    broadcast hint, AQE decides; only p_partkey and p_type are read),
    and both the conditional and total revenue fold as partials in ONE
    aggregation pass — no self-join, no pivot. Share determinism:
    numerator and denominator round to 2dp before the division rounds
    to 4dp (the flagship_market_share discipline).
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.round(
        F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(0.0)), 2
    )
    total = F.round(F.sum(vol), 2)
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(100.0 * promo / total, 4).alias("promo_pct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "flagship_bracket_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 35)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 50)
    """,
)
def flagship_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue brackets): revenue matching a
    DISJUNCTION of (brand, size, quantity) bracket conjunctions — the
    OR-of-ANDs predicate that stresses an optimizer's disjunctive
    pushdown.

    Scale shape: Catalyst factors the common columns — each side of the
    join gets the UNION of its bracket ranges pushed to its scan
    (lineitem: quantity 1-50, part: the brand/size envelope) so rows
    outside every bracket never leave the readers; the exact bracket
    pairing evaluates post-join. One partial-agged global row out.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    joined = li.join(p, F.col("p_partkey") == F.col("l_partkey"))
    b = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 35)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 50)
        )
    )
    return joined.filter(b).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "join_null_safe",
    oracle="""
    WITH keyed AS (
        SELECT event_id,
               CASE WHEN user_id % 10 = 0 THEN NULL ELSE user_id % 10 END
                   AS bucket_key,
               value
        FROM events)
    SELECT a.bucket_key,
           COUNT(*) AS n_pairs,
           ROUND(SUM(a.value + b.value), 2) AS pair_value
    FROM keyed a JOIN keyed b
      ON a.bucket_key IS NOT DISTINCT FROM b.bucket_key
     AND a.event_id + 1 = b.event_id
    GROUP BY a.bucket_key
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi join (<=> / IS NOT DISTINCT FROM): NULL keys MATCH
    each other instead of silently dropping — the semantics an equality
    join gets wrong when the key is a nullable derived column (here a
    bucket where one residue class is nulled out). The second conjunct
    (adjacent event ids) keeps the null bucket from going quadratic.

    Scale shape: Spark plans <=> as a HASH join (null hashes like any
    value), so this stays a normal shuffled equi join — but every NULL
    row lands in ONE partition: at 100 TB a large null population is
    the canonical skew key, and the fix is the same salting
    join_salted_skew demonstrates (or filtering nulls into a separate
    union branch).
    """
    e = load_table(spark, sf_dir, "events")
    keyed = e.select(
        "event_id",
        F.when(F.col("user_id") % 10 == 0, F.lit(None))
        .otherwise(F.col("user_id") % 10)
        .alias("bucket_key"),
        "value",
    )
    a = keyed.alias("a")
    b = keyed.alias("b")
    return (
        a.join(
            b,
            F.col("a.bucket_key").eqNullSafe(F.col("b.bucket_key"))
            & (F.col("a.event_id") + 1 == F.col("b.event_id")),
        )
        .groupBy(F.col("a.bucket_key").alias("bucket_key"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.sum(F.col("a.value") + F.col("b.value")), 2).alias(
                "pair_value"
            ),
        )
    )


@query(
    "flagship_top_supplier",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def flagship_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): the supplier(s) whose quarterly
    revenue equals the maximum — the view-plus-scalar-subquery pattern
    (the revenue "view" is computed once and consumed twice: per-supplier
    rows AND its max).

    Scale shape: the quarter predicate pushes to the lineitem scan; the
    revenue aggregate partials on l_suppkey; the MAX is a one-row
    aggregate over the already-small revenue table joined back as a
    broadcast filter (Spark de-duplicates the shared subplan via
    ReusedExchange rather than re-scanning lineitem). Revenue ties both
    round to 2dp before the equality compare, so the max-match set is
    deterministic.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .join(supp, F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "flagship_sales_opportunity",
    oracle="""
    WITH rich AS (
        SELECT c_custkey, c_nationkey, c_acctbal
        FROM customer
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                           WHERE c_acctbal > 0)),
    inactive AS (
        SELECT r.* FROM rich r
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = r.c_custkey
                            AND o.o_orderdate >= TIMESTAMP '2001-01-01'))
    SELECT c_nationkey,
           COUNT(*) AS n_custs,
           ROUND(SUM(c_acctbal), 2) AS total_acctbal
    FROM inactive
    GROUP BY c_nationkey
    """,
)
def flagship_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): customers with
    above-average positive balances and NO orders, rolled up per nation
    — the scalar-aggregate-subquery + anti-join pattern (the reference's
    cache-miss semantics, A21, inverted: who is NOT in the store).

    Scale shape: the average is a one-row aggregate broadcast into the
    customer filter (no re-scan per row — the decorrelated form); the
    no-orders test is a LEFT ANTI join on o_custkey (orders side reads
    ONE column); the surviving set partial-aggregates per nation.
    """
    cust = load_table(spark, sf_dir, "customer")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    rich = (
        cust.select("c_custkey", "c_nationkey", "c_acctbal")
        .crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
    ).select("o_custkey")
    inactive = rich.join(
        orders, rich["c_custkey"] == orders["o_custkey"], "left_anti"
    )
    return inactive.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_custs"),
        F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
    )


@query(
    "flagship_small_qty_revenue",
    oracle="""
    WITH pa AS (
        SELECT l_partkey, AVG(l_quantity) AS avg_qty
        FROM lineitem GROUP BY l_partkey)
    SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pa    ON pa.l_partkey = l.l_partkey
    WHERE p.p_brand IN ('Brand#1', 'Brand#2')
      AND l.l_quantity < 0.2 * pa.avg_qty
    """,
)
def flagship_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): lineitems of two
    brands whose quantity is under 20% of that part's average quantity —
    the CORRELATED scalar aggregate decorrelated into a per-part
    aggregate join.

    Scale shape: the per-part average is a bounded aggregate (one row
    per part, not per lineitem) joined back on the same l_partkey the
    brand join uses, so Catalyst shares one exchange; the brand
    predicate broadcasts a tiny part dim that prunes lineitem FIRST.
    Determinism across engines: quantities are integer-valued doubles,
    so each part's sum — and therefore avg and the 0.2*avg threshold —
    is EXACT in IEEE arithmetic regardless of summation order; the
    boundary cannot flip."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#1", "Brand#2")
    ).select("p_partkey")
    pa = li.groupBy("l_partkey").agg(F.avg("l_quantity").alias("avg_qty"))
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(pa.withColumnRenamed("l_partkey", "pa_partkey"),
              F.col("pa_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "flagship_large_orders",
    oracle="""
    WITH big AS (
        SELECT l_orderkey, SUM(l_quantity) AS sum_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING SUM(l_quantity) > 150)
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           ROUND(o.o_totalprice, 2) AS totalprice, big.sum_qty
    FROM big
    JOIN orders o   ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY big.sum_qty DESC, o.o_orderkey
    LIMIT 20
    """,
)
def flagship_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): the 20 biggest orders by
    total quantity over a HAVING threshold, with their customers — the
    aggregate-then-rejoin-facts pattern (the IN-subquery of the official
    text, decorrelated to a join).

    Scale shape: the quantity rollup partial-aggregates lineitem down to
    one row per qualifying order BEFORE any join; orders joins that
    small set on its key; customer joins last on the shrunken result;
    top-20 is TakeOrdered with an o_orderkey tie-break. Quantity sums
    are integer-valued — exact at any SF."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        big.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            "sum_qty",
        )
        .orderBy(F.desc("sum_qty"), "o_orderkey")
        .limit(20)
    )


@query(
    "flagship_waiting_supplier",
    oracle="""
    WITH late AS (
        SELECT l.l_orderkey, l.l_suppkey
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderstatus = 'F'
          AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
    SELECT s.s_name, COUNT(*) AS numwait
    FROM late l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
)
def flagship_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): suppliers
    whose lineitem shipped >90 days after the order date on a finalized
    MULTI-supplier order where NO other supplier was late — the
    EXISTS + NOT-EXISTS double-correlated pattern, the hardest
    decorrelation in the TPC-H suite. (The official commit/receipt-date
    lateness is adapted to shipdate-vs-orderdate — the test tables carry
    no commitdate — structure preserved exactly.)

    Scale shape: the late set is computed ONCE (filter pushed into both
    scans) and reused for both the candidate side and the NOT-EXISTS
    side; EXISTS becomes a LEFT SEMI and NOT EXISTS a LEFT ANTI join,
    both equi on l_orderkey with the supplier-inequality residual —
    hash-partitionable, never a per-row subquery; supplier broadcasts
    onto the counted result."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    )
    l3 = late.select(
        F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3")
    )
    waiting = (
        late.join(
            l2,
            (F.col("ok2") == F.col("l_orderkey"))
            & (F.col("sk2") != F.col("l_suppkey")),
            "left_semi",
        ).join(
            l3,
            (F.col("ok3") == F.col("l_orderkey"))
            & (F.col("sk3") != F.col("l_suppkey")),
            "left_anti",
        )
    )
    s = F.broadcast(load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name"))
    return (
        waiting.join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@query(
    "join_interval_binned",
    oracle="""
    SELECT a.user_id AS user_id, COUNT(*) AS n_overlaps
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_id < b.event_id
     AND a.ts < b.ts + INTERVAL 5 MINUTES
     AND b.ts < a.ts + INTERVAL 5 MINUTES
    GROUP BY a.user_id
    """,
)
def join_interval_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME interval-overlap semantics as join_interval, executed as
    a BINNED equi join — the production plan for interval joins at
    scale: each event lands in its 5-minute bin plus the next one, the
    join is equi on (user_id, bin), and the exact overlap predicate
    evaluates only on bin-collisions. A |A|x|B|-per-key non-equi join
    becomes hash-partitionable; at 100 TB this is the difference
    between a shuffled hash join and a per-key nested loop. Identical
    oracle to join_interval — the value hash PROVES plan equivalence.

    Dedup subtlety: a pair can collide in at most min(2,2) shared bins;
    emitting (pair, bin) would double-count, so each pair is attributed
    to ONE bin — the bin containing the LATER event's start (which both
    sides' bin sets always contain when they overlap within one bin
    width).
    """
    e = load_table(spark, sf_dir, "events")
    binned = e.select(
        "event_id",
        "user_id",
        "ts",
        F.floor(F.unix_timestamp("ts") / 300).alias("bin0"),
    ).select(
        "event_id",
        "user_id",
        "ts",
        F.explode(F.array(F.col("bin0"), F.col("bin0") + 1)).alias("bin"),
        "bin0",
    )
    a = binned.alias("a")
    b = binned.alias("b")
    five = F.expr("INTERVAL 5 MINUTES")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.bin") == F.col("b.bin"))
            & (F.col("a.event_id") < F.col("b.event_id"))
            & (F.col("a.ts") < F.col("b.ts") + five)
            & (F.col("b.ts") < F.col("a.ts") + five)
            # attribute the pair to exactly ONE shared bin: the bin that
            # holds the later start (always in both explode sets here)
            & (F.col("a.bin") == F.greatest(F.col("a.bin0"), F.col("b.bin0"))),
        )
    )
    return pairs.groupBy(F.col("a.user_id").alias("user_id")).agg(
        F.count(F.lit(1)).alias("n_overlaps")
    )


# --------------------------------------------------------------------------
# TPC-H closure: the six shapes the registry didn't yet cover (Q2, Q9,
# Q11, Q12, Q16, Q20). The fixture schema is slimmed TPC-H — no
# partsupp, no l_shipmode/commit/receipt dates — so each query states
# its documented adaptation inline; the SHAPE (decorrelation pattern,
# join topology, aggregate structure) is the thing being ported, per
# the round-1 flagship precedent (subquery_exists = Q4 adapted the
# same way).
# --------------------------------------------------------------------------
@query(
    "flagship_mincost_supplier",
    oracle="""
    WITH cost AS (
        SELECT l.l_partkey, l.l_suppkey,
               MIN(l.l_extendedprice / l.l_quantity) AS unit_cost
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE n.n_regionkey = 1
        GROUP BY l.l_partkey, l.l_suppkey),
    best AS (
        SELECT l_partkey, MIN(unit_cost) AS best_cost
        FROM cost GROUP BY l_partkey)
    SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name, s.s_acctbal,
           ROUND(c.unit_cost, 4) AS unit_cost
    FROM cost c
    JOIN best b ON b.l_partkey = c.l_partkey AND c.unit_cost = b.best_cost
    JOIN part p ON p.p_partkey = c.l_partkey
    JOIN supplier s ON s.s_suppkey = c.l_suppkey
    WHERE p.p_size = 15 AND p.p_type = 'STANDARD'
    """,
)
def flagship_mincost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): for each qualifying part,
    the region-1 supplier(s) offering it cheapest — the correlated-MIN
    decorrelation (compute the per-part MIN once as a relation, join it
    back as a filter). Adaptation: the fixture has no partsupp, so
    "cost" is each supplier's best observed unit price
    MIN(l_extendedprice / l_quantity) from lineitem — MIN over
    identical IEEE-754 per-row divisions is order-insensitive and
    bit-exact in both engines, so the equality join back is safe
    (no summation-order drift, unlike AVG).

    Scale shape: the region filter prunes suppliers BEFORE the fact
    join (nation is a broadcast dim); the per-(part,supplier) MIN
    partial-aggregates map-side; `best` is a second small aggregate
    over the already-reduced cost relation; part attributes filter a
    scan-pruned part table joined on the shrunken survivor keys. No
    correlated re-scan of lineitem — the 100 TB version reads the fact
    table exactly once.
    """
    nat = F.broadcast(
        load_table(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 1)
    )
    supp = load_table(spark, sf_dir, "supplier")
    r1_supp = supp.join(
        nat, F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name", "s_acctbal")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    cost = (
        li.join(r1_supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
                "unit_cost"
            )
        )
    )
    best = cost.groupBy(F.col("l_partkey").alias("b_partkey")).agg(
        F.min("unit_cost").alias("best_cost")
    )
    parts = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    return (
        cost.join(
            best,
            (F.col("l_partkey") == F.col("b_partkey"))
            & (F.col("unit_cost") == F.col("best_cost")),
        )
        .join(parts, F.col("p_partkey") == F.col("l_partkey"))
        .join(r1_supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            "p_partkey",
            "p_name",
            "s_suppkey",
            "s_name",
            "s_acctbal",
            F.round("unit_cost", 4).alias("unit_cost"),
        )
    )


@query(
    "flagship_product_profit",
    oracle="""
    SELECT n_name AS nation,
           EXTRACT(YEAR FROM o_orderdate) AS o_year,
           CAST(ROUND(SUM(
               CAST(l_extendedprice AS DECIMAL(14,2))
                 * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
               - CAST(p_retailprice AS DECIMAL(12,2))
                 * CAST(l_quantity AS DECIMAL(12,2))
                 * CAST(0.6 AS DECIMAL(2,1))
           ), 2) AS DOUBLE) AS sum_profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, EXTRACT(YEAR FROM o_orderdate)
    """,
)
def flagship_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): profit on a part family per
    supplier nation per order year — the widest join in the suite
    (lineitem x part x supplier x orders x nation). Adaptation: no
    partsupp, so unit cost is 60% of p_retailprice (a fixed margin
    proxy); the SHAPE — fact table joined to two scaling dims plus a
    broadcast dim, profit expression mixing columns from three tables,
    two-level group-by — is Q9's.

    Money math is exact DECIMAL end-to-end (the flagship_pricing_summary
    rule): products widen exactly, the sum is order-independent integer
    arithmetic underneath, and only the final 2-dp round casts to
    double — bit-stable at any SF.

    Scale shape: the p_name filter prunes part first and the join to
    the shrunken part side shrinks lineitem before the orders join
    (AQE re-sizes it; at real part cardinality this side is still
    broadcastable at ~1/12 selectivity of a dictionary-encoded name
    scan). nation broadcasts; the aggregate partials map-side over
    (nation, year) — 25 x ~7 groups, so the final exchange is tiny.
    """
    li = load_table(spark, sf_dir, "lineitem")
    parts = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")
    ).select("p_partkey", "p_retailprice")
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    nat = F.broadcast(
        load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    )
    one = F.lit(1).cast("decimal(3,2)")
    rev = F.col("l_extendedprice").cast("decimal(14,2)") * (
        one - F.col("l_discount").cast("decimal(3,2)")
    )
    cost = (
        F.col("p_retailprice").cast("decimal(12,2)")
        * F.col("l_quantity").cast("decimal(12,2)")
        * F.lit(0.6).cast("decimal(2,1)")
    )
    return (
        li.join(parts, F.col("p_partkey") == F.col("l_partkey"))
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(nat, F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            F.round(F.sum(rev - cost), 2).cast("double").alias("sum_profit")
        )
    )


@query(
    "flagship_important_stock",
    oracle="""
    WITH nval AS (
        SELECT l_partkey,
               SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS part_value
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON n_nationkey = s_nationkey
        WHERE n_name = 'NATION_3'
        GROUP BY l_partkey)
    SELECT l_partkey, CAST(part_value AS DOUBLE) AS part_value
    FROM nval
    WHERE part_value * (SELECT COUNT(*) FROM nval)
          > (SELECT SUM(part_value) FROM nval) * 2
    """,
)
def flagship_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock identification): parts whose
    value held via one nation's suppliers exceeds a threshold derived
    from that nation's total — the aggregate-vs-scalar-of-itself
    pattern. Adaptations: no partsupp availqty/supplycost, so "value"
    is the summed extended price shipped by NATION_3 suppliers; and
    where spec Q11 scales its fraction by 1/SF to keep the answer set
    non-degenerate, the scale-INVARIANT equivalent is used — a part is
    important when its value exceeds 2x the mean part value
    (value * n_parts > total * 2), so the query returns a meaningful
    set at every SF with no per-SF parameter.

    Exactness: per-part values and the grand total are exact DECIMAL
    sums, n_parts is an exact integer, and both comparison sides are
    exact products (decimal x bigint, decimal x 2) — the > comparison
    can never flip on summation order, and there is no decimal
    DIVISION (whose result scale differs between engines). Double cast
    happens only in the output projection.

    Scale shape: the nation filter broadcasts into supplier, the
    surviving ~1/25 of suppliers joins lineitem on its key, the
    per-part aggregate partials map-side, and the grand total is a
    one-row aggregate over the ALREADY-AGGREGATED nval relation
    (re-used via ReusedExchange, not a second lineitem scan) broadcast
    into the filter. At 100 TB the fact table is read once.
    """
    nat = F.broadcast(
        load_table(spark, sf_dir, "nation").filter(
            F.col("n_name") == "NATION_3"
        )
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    nval = (
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(14,2)")).alias(
                "part_value"
            )
        )
    )
    thresh = nval.agg(
        F.sum("part_value").alias("total_value"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        nval.join(
            F.broadcast(thresh),
            F.col("part_value") * F.col("n_parts")
            > F.col("total_value") * F.lit(2),
        )
        .select("l_partkey", F.col("part_value").cast("double").alias("part_value"))
    )


@query(
    "flagship_late_shipments",
    oracle="""
    SELECT CASE WHEN l_shipdate >= o_orderdate + INTERVAL 90 DAY
                    THEN 'LATE-90'
                WHEN l_shipdate >= o_orderdate + INTERVAL 30 DAY
                    THEN 'LATE-30'
                ELSE 'ON-TIME' END AS delay_bucket,
           SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS high_line_count,
           SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS low_line_count
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY delay_bucket
    """,
)
def flagship_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping modes and order priority): per shipping
    category, how many high- vs low-priority orders it carried — the
    conditional-SUM pivot over a fact-to-fact join. Adaptation: the
    fixture has no l_shipmode or commit/receipt dates, so the category
    is the shipping DELAY bucket (l_shipdate vs o_orderdate + 30/90
    days) — the urgent-cargo-on-slow-channels question Q12 actually
    asks, expressed with the columns present.

    Scale shape: the one-year predicate pushes to the lineitem scan;
    the orderkey join is the only exchange (AQE-sized); the CASE pivot
    is pure JVM expression inside whole-stage codegen, and the
    3-group aggregate partials map-side to almost nothing. Integer
    counts — no float math anywhere.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_shipdate")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    bucket = (
        F.when(
            F.col("l_shipdate")
            >= F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
            "LATE-90",
        )
        .when(
            F.col("l_shipdate")
            >= F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"),
            "LATE-30",
        )
        .otherwise("ON-TIME")
    )
    return (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(bucket.alias("delay_bucket"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@query(
    "flagship_parts_suppliers",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5'
      AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29, 33, 37)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_name LIKE '%77%')
    GROUP BY p_brand, p_type, p_size
    """,
)
def flagship_parts_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): how many distinct
    suppliers can ship each part configuration, excluding a
    complaint-flagged supplier set — the NOT-IN-becomes-anti-join
    pattern plus COUNT(DISTINCT) over a multi-attribute group.
    Adaptation: no partsupp, so the part-supplier relationship is
    observed shipments (lineitem); the complaint set is a supplier-name
    pattern (the reference Q16 uses 'Customer%Complaints' comments —
    same shape, a column the fixture lacks).

    Scale shape: the excluded-supplier set is a tiny broadcast LEFT
    ANTI join (s_suppkey is non-null, so NOT IN == anti-join with no
    null trap); the part filter prunes before the fact join;
    COUNT(DISTINCT) expands to the standard two-level partial-distinct
    aggregate (Expand + two HashAggregates), never a driver collect.
    """
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_name").like("%77%"))
        .select("s_suppkey")
    )
    parts = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29, 33, 37))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(parts, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


@query(
    "flagship_excess_supplier",
    oracle="""
    WITH shipped AS (
        SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE '%blue%'
          AND l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY l_partkey, l_suppkey),
    tot AS (
        SELECT l_partkey, SUM(qty) AS tot_qty, COUNT(*) AS n_supp
        FROM shipped GROUP BY l_partkey)
    SELECT s.s_suppkey, s.s_name,
           COUNT(*) AS n_dominated_parts,
           ROUND(SUM(sh.qty), 2) AS dominated_qty
    FROM shipped sh
    JOIN tot t ON t.l_partkey = sh.l_partkey
    JOIN supplier s ON s.s_suppkey = sh.l_suppkey
    WHERE t.n_supp > 1 AND sh.qty > 0.5 * t.tot_qty
    GROUP BY s.s_suppkey, s.s_name
    """,
)
def flagship_excess_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): suppliers holding an
    outsized share of a part family's flow — the correlated
    half-of-total threshold (ps_availqty > 0.5 * sum(l_quantity))
    decorrelated into grouped-aggregate + join-back. Adaptation: no
    partsupp availqty, so the threshold compares a supplier's shipped
    quantity of a part against HALF the part's total shipped quantity
    (contested parts only, n_supp > 1) — same correlated-aggregate
    shape, observed-flow data.

    Exactness: quantities are small integers (exact in doubles), sums
    and the x0.5 product are exact IEEE arithmetic — the > threshold
    cannot flip on aggregation order.

    Scale shape: name + date predicates prune part and lineitem at the
    scans; the per-(part,supplier) aggregate partials map-side; `tot`
    re-aggregates the already-small shipped relation (ReusedExchange,
    one fact-scan total); the supplier join moves only dominated
    survivor keys.
    """
    parts = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%blue%")
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_partkey", "l_suppkey", "l_quantity")
    shipped = (
        li.join(parts, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    tot = shipped.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum("qty").alias("tot_qty"), F.count(F.lit(1)).alias("n_supp")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        shipped.join(
            tot,
            (F.col("l_partkey") == F.col("t_partkey"))
            & (F.col("n_supp") > 1)
            & (F.col("qty") > 0.5 * F.col("tot_qty")),
        )
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(
            F.count(F.lit(1)).alias("n_dominated_parts"),
            F.round(F.sum("qty"), 2).alias("dominated_qty"),
        )
    )


# -- referential-integrity audit ----------------------------------------------


@query(
    "audit_referential",
    oracle="""
    SELECT 'lineitem->orders' AS relation,
           (SELECT COUNT(*) FROM lineitem) AS n_child,
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans
    UNION ALL
    SELECT 'orders->customer',
           (SELECT COUNT(*) FROM orders),
           (SELECT COUNT(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'customer->nation',
           (SELECT COUNT(*) FROM customer),
           (SELECT COUNT(*) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM nation n
                              WHERE n.n_nationkey = c.c_nationkey))
    UNION ALL
    SELECT 'supplier->nation',
           (SELECT COUNT(*) FROM supplier),
           (SELECT COUNT(*) FROM supplier s
            WHERE NOT EXISTS (SELECT 1 FROM nation n
                              WHERE n.n_nationkey = s.s_nationkey))
    ORDER BY relation
    """,
)
def audit_referential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the star schema: orphan counts
    for every FK edge (child rows whose parent key is missing) — the
    load-time data-quality gate a warehouse runs before exposing a
    snapshot, and the first thing to check when a join "loses" rows.

    Plan shape: each orphan count is a LEFT ANTI join — the parent side
    of nation-keyed edges broadcasts (25 rows), the fact-fact edge
    (lineitem->orders) anti-joins on the same key the tables would be
    bucketed by at scale, so a bucketed layout makes it shuffle-free;
    counts are 1-row aggregates unioned into a 4-row report. No
    CartesianProduct; nothing wide survives the anti join."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")

    def edge(name, child, parent, ck, pk, bcast_parent):
        p = parent.select(pk)
        if bcast_parent:
            p = F.broadcast(p)
        orphans = child.join(
            p, child[ck] == p[pk], "left_anti"
        ).agg(F.count(F.lit(1)).alias("n_orphans"))
        total = child.agg(F.count(F.lit(1)).alias("n_child"))
        return total.crossJoin(orphans).select(
            F.lit(name).alias("relation"), "n_child", "n_orphans"
        )

    return (
        edge("lineitem->orders", li, o, "l_orderkey", "o_orderkey", False)
        .unionByName(edge("orders->customer", o, c, "o_custkey", "c_custkey", False))
        .unionByName(edge("customer->nation", c, n, "c_nationkey", "n_nationkey", True))
        .unionByName(edge("supplier->nation", s, n, "s_nationkey", "n_nationkey", True))
        .orderBy("relation")
    )


# -- as-of join, NEAREST direction --------------------------------------------

ASOF_NEAREST_TOL_US = 7 * 24 * 3600 * 1_000_000  # 7-day match window


@query(
    "join_asof_nearest",
    oracle=f"""
    WITH b AS (
        SELECT e.event_id, MAX(o.o_orderdate) AS bt
        FROM events e LEFT JOIN orders o
          ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        GROUP BY e.event_id),
    f AS (
        SELECT e.event_id, MIN(o.o_orderdate) AS ft
        FROM events e LEFT JOIN orders o
          ON o.o_custkey = e.user_id AND o.o_orderdate > e.ts
        GROUP BY e.event_id),
    j AS (
        SELECT e.event_id,
               epoch_us(e.ts) - epoch_us(b.bt) AS db,
               epoch_us(f.ft) - epoch_us(e.ts) AS df
        FROM events e
        JOIN b ON b.event_id = e.event_id
        JOIN f ON f.event_id = e.event_id),
    v AS (
        SELECT event_id,
               db IS NOT NULL AND db <= {ASOF_NEAREST_TOL_US} AS vb,
               df IS NOT NULL AND df <= {ASOF_NEAREST_TOL_US} AS vf,
               db, df
        FROM j)
    SELECT event_id,
           CASE WHEN vb AND (NOT vf OR db <= df) THEN 'backward'
                WHEN vf THEN 'forward' ELSE 'none' END AS direction,
           CASE WHEN vb AND (NOT vf OR db <= df) THEN db
                WHEN vf THEN df END AS delta_us
    FROM v
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join in the NEAREST direction (the pandas
    merge_asof(direction='nearest') / polars join_asof 'nearest' mode):
    each event matches the closest order of the same user within a
    7-day tolerance on EITHER side; ties at equal distance go backward.

    Plan: the SAME union-sort trick as join_asof, but one merged sort
    serves BOTH directions — a running last(order_ts) (backward) and a
    reversed-frame first(order_ts) (forward) over one shuffle on the
    key and one sort. A naive formulation is two range joins; this is
    zero joins. Equal-timestamp semantics match the oracle exactly
    because order rows sort BEFORE event rows at the same instant
    (backward <=, forward >). Distances are exact integer micros; the
    tolerance and tie rules are integer compares."""
    e = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    order_side = o.select(
        F.col("o_custkey").alias("uid"),
        F.col("o_orderdate").alias("ts"),
        F.lit(0).alias("kind"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("o_orderdate").alias("order_ts"),
    )
    event_side = e.select(
        F.col("user_id").alias("uid"),
        F.col("ts"),
        F.lit(1).alias("kind"),
        F.col("event_id"),
        F.lit(None).cast("timestamp").alias("order_ts"),
    )
    merged = order_side.unionByName(event_side)
    base = Window.partitionBy("uid").orderBy("ts", "kind", "order_ts")
    w_back = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_fwd = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    tol = F.lit(ASOF_NEAREST_TOL_US)
    out = (
        merged.withColumn(
            "bt", F.last("order_ts", ignorenulls=True).over(w_back)
        )
        .withColumn("ft", F.first("order_ts", ignorenulls=True).over(w_fwd))
        .filter(F.col("kind") == 1)
        .select(
            "event_id",
            (F.unix_micros("ts") - F.unix_micros("bt")).alias("db"),
            (F.unix_micros("ft") - F.unix_micros("ts")).alias("df"),
        )
    )
    vb = F.col("db").isNotNull() & (F.col("db") <= tol)
    vf = F.col("df").isNotNull() & (F.col("df") <= tol)
    back_wins = vb & (~vf | (F.col("db") <= F.col("df")))
    return out.select(
        "event_id",
        F.when(back_wins, F.lit("backward"))
        .when(vf, F.lit("forward"))
        .otherwise(F.lit("none"))
        .alias("direction"),
        F.when(back_wins, F.col("db")).when(vf, F.col("df")).alias("delta_us"),
    )
