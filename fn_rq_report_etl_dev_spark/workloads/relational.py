"""General relational surface over the TPC-H-ish corpus: multi-way joins,
grouped/rolled-up aggregation, window functions (rank / running / lag /
as-of), semi/anti joins, set operations, pivot, sessionization, JSON and
scalar functions.

The reference only exercises these operators through one MERGE statement
(SURVEY.md §2.1); this module is the "comes free with df.join/groupBy"
surface, exercised properly so the engine's coverage is demonstrated and
oracle-checked.

Float determinism: every SUM over money flows through DECIMAL(18,2/4/6)
intermediates with explicit casts after each multiply (identical exact
values in Spark and DuckDB regardless of precision-promotion rules), and is
cast to DOUBLE only at the end; AVG is exact-sum ÷ count in double.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# pandas is imported at MODULE level so the type-hint-style pandas-UDF
# signatures (strings under `from __future__ import annotations`) resolve
# against these globals during eval-type inference.

from . import load, workload

_D2 = "decimal(18,2)"
_ONE = "CAST(1 AS DECIMAL(18,2))"


def _dec2(c: str) -> F.Column:
    return F.col(c).cast(_D2)


@workload(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * ({_ONE} - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
           CAST(sum(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * ({_ONE} - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) * ({_ONE} + CAST(l_tax AS DECIMAL(18,2))) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
           CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-aggregate with 8 aggregates. The filter
    pushes to the parquet scan; partial aggregation is map-side."""
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00")
    )
    one = F.expr(_ONE)
    qty, price, disc, tax = (_dec2(c) for c in
                             ("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
    disc_price = (price * (one - disc)).cast("decimal(18,4)")
    charge = (disc_price * (one + tax)).cast("decimal(18,6)")
    n = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(qty).cast("double").alias("sum_qty"),
        F.sum(price).cast("double").alias("sum_base_price"),
        F.sum(disc_price).cast("double").alias("sum_disc_price"),
        F.sum(charge).cast("double").alias("sum_charge"),
        (F.sum(qty).cast("double") / n).alias("avg_qty"),
        (F.sum(price).cast("double") / n).alias("avg_price"),
        (F.sum(disc).cast("double") / n).alias("avg_disc"),
        n.alias("count_order"),
    )


_REVENUE_SQL = f"CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * ({_ONE} - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))"


def _revenue() -> F.Column:
    one = F.expr(_ONE)
    return (_dec2("l_extendedprice") * (one - _dec2("l_discount"))).cast("decimal(18,4)")


@workload(
    "q3_shipping_priority",
    oracle=f"""
    SELECT o_orderkey, o_orderdate, o_orderpriority,
           CAST(sum({_REVENUE_SQL}) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY sum({_REVENUE_SQL}) DESC, o_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + group + exact-decimal top-10 (ties
    broken by key, so the row SET is deterministic). customer is small →
    broadcast; lineitem⋈orders shuffles on the order key."""
    cutoff = F.lit("1998-01-01 00:00:00")
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    )
    agg = joined.groupBy("o_orderkey", "o_orderdate", "o_orderpriority").agg(
        F.sum(_revenue()).alias("rev_exact")
    )
    return (
        agg.orderBy(F.col("rev_exact").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_orderdate", "o_orderpriority",
                F.col("rev_exact").cast("double").alias("revenue"))
    )


@workload(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT r_name, n_name, CAST(sum({_REVENUE_SQL}) AS DOUBLE) AS revenue
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY r_name, n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join. All dimensions (region, nation,
    customer, supplier) broadcast; only the orders⋈lineitem edge shuffles."""
    region = load(spark, sf_dir, "region")
    nation = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer")
    sup = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < F.lit("1999-01-01 00:00:00"))
    )
    li = load(spark, sf_dir, "lineitem")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(sup),
            (li.l_suppkey == sup.s_suppkey) & (sup.s_nationkey == cust.c_nationkey),
        )
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return joined.groupBy("r_name", "n_name").agg(
        F.sum(_revenue()).cast("double").alias("revenue")
    )


@workload(
    "join_semi_urgent_customers",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    """,
)
def join_semi_urgent_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS): customers with ≥1 urgent order."""
    cust = load(spark, sf_dir, "customer")
    urgent = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return cust.join(
        urgent, cust.c_custkey == urgent.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


@workload(
    "join_anti_no_big_order",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    """,
)
def join_anti_no_big_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS): customers with no order above 300k."""
    cust = load(spark, sf_dir, "customer")
    big = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return cust.join(
        big, cust.c_custkey == big.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@workload(
    "agg_rollup_returnflag",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets: per-(flag,status), per-flag subtotals, grand
    total — one pass, no self-union."""
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec2("l_quantity")).cast("double").alias("sum_qty"),
    )


@workload(
    "window_running_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           rank() OVER w AS rnk,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
           CAST(lag(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS prev_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey)
    """,
)
def window_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window frames + analytics: rank, running sum over an explicit ROWS
    frame, lag — per-customer order history."""
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    price = _dec2("o_totalprice")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.sum(price).over(frame).cast("double").alias("running_spend"),
        F.lag(price).over(w).cast("double").alias("prev_price"),
    )


@workload(
    "topk_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
)
def topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group: the scalable pattern (partition-local sort, no
    global sort), deterministic via the key tiebreak."""
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice",
                F.col("rn").cast("bigint").alias("rn"))
    )


@workload(
    "set_ops_nations",
    oracle="""
    SELECT n.nationkey, 'both' AS side
    FROM (SELECT c_nationkey AS nationkey FROM customer
          INTERSECT
          SELECT s_nationkey FROM supplier) n
    UNION ALL
    SELECT n.nationkey, 'customer_only' AS side
    FROM (SELECT c_nationkey AS nationkey FROM customer
          EXCEPT
          SELECT s_nationkey FROM supplier) n
    """,
)
def set_ops_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations: INTERSECT / EXCEPT (distinct semantics) + UNION ALL."""
    cn = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    sn = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    both = cn.intersect(sn).withColumn("side", F.lit("both"))
    cust_only = cn.subtract(sn).withColumn("side", F.lit("customer_only"))
    return both.unionAll(cust_only)


@workload(
    "json_extract_agg",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           min(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           max(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
           CAST(sum(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
    FROM events
    GROUP BY event_type
    """,
)
def json_extract_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON column querying: extract a field from the props JSON string and
    aggregate it (exact integer arithmetic)."""
    events = load(spark, sf_dir, "events")
    k = F.expr("try_cast(get_json_object(props, '$.k') AS BIGINT)")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
        F.sum(k).alias("sum_k"),
    )


@workload(
    "pivot_user_event_counts",
    oracle="""
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'click')    AS click,
           count(*) FILTER (WHERE event_type = 'error')    AS error,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           count(*) FILTER (WHERE event_type = 'signup')   AS signup,
           count(*) FILTER (WHERE event_type = 'view')     AS view
    FROM events
    GROUP BY user_id
    """,
)
def pivot_user_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: event-type counts as columns per user. Explicit value list =
    one pass, no distinct-values pre-query (the scalable form)."""
    events = load(spark, sf_dir, "events")
    kinds = ["click", "error", "purchase", "signup", "view"]
    piv = events.groupBy("user_id").pivot("event_type", kinds).count()
    return piv.select(
        "user_id", *[F.coalesce(F.col(k), F.lit(0)).alias(k) for k in kinds]
    )


@workload(
    "sessionize_events",
    oracle="""
    WITH flagged AS (
        SELECT user_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions
    FROM flagged GROUP BY user_id
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-minute-gap session starts via lag + conditional
    count — the batch form of session_window."""
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    # microsecond-exact gap: timestamp subtraction yields a day-time
    # interval (works for TIMESTAMP and TIMESTAMP_NTZ alike); casting to
    # long would truncate to seconds and disagree with the oracle's
    # interval comparison at the boundary
    new_session = F.when(
        prev_ts.isNull()
        | ((F.col("ts") - prev_ts) > F.expr("INTERVAL 30 MINUTES")),
        1,
    ).otherwise(0)
    return (
        events.select("user_id", new_session.alias("new_session"))
        .groupBy("user_id")
        .agg(F.sum("new_session").cast("bigint").alias("n_sessions"))
    )


@workload(
    "asof_prior_purchase",
    oracle="""
    SELECT event_id, user_id, ts,
           max(CASE WHEN event_type = 'purchase' THEN ts END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_purchase_ts
    FROM events
    """,
)
def asof_prior_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (point-in-time lookup) expressed as a running-max window:
    for every event, the timestamp of that user's most recent PRIOR
    purchase. Spark lacks a native as-of join; this composition is the
    shuffle-minimal equivalent for self-asof (one exchange on user_id)."""
    events = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    purchase_ts = F.when(F.col("event_type") == "purchase", F.col("ts"))
    return events.select(
        "event_id", "user_id", "ts",
        F.max(purchase_ts).over(w).alias("last_purchase_ts"),
    )


@workload(
    "scalar_functions_showcase",
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS brand_u,
           lower(p_type) AS type_l,
           substring(p_name, 1, 8) AS name8,
           length(p_name) AS name_len,
           concat_ws(':', p_brand, p_type) AS brand_type,
           abs(p_size - 25) AS size_dev,
           p_partkey % 7 AS pk_mod,
           greatest(p_size, 10) AS size_floor10,
           CAST(round(CAST(p_retailprice AS DECIMAL(18,2)), 1) AS DOUBLE) AS price_r1,
           CAST(CAST(p_retailprice AS DECIMAL(18,2)) AS DOUBLE) * p_size AS ext_value
    FROM part
    """,
)
def scalar_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/math scalar function surface (all JVM built-ins, codegen'd)."""
    part = load(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.lower("p_type").alias("type_l"),
        F.substring("p_name", 1, 8).alias("name8"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.abs(F.col("p_size") - 25).alias("size_dev"),
        (F.col("p_partkey") % 7).alias("pk_mod"),
        F.greatest(F.col("p_size"), F.lit(10)).cast("bigint").alias("size_floor10"),
        F.round(_dec2("p_retailprice"), 1).cast("double").alias("price_r1"),
        (_dec2("p_retailprice").cast("double") * F.col("p_size")).alias("ext_value"),
    )


@workload(
    "datetime_functions_showcase",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS y,
           month(o_orderdate) AS m,
           dayofmonth(o_orderdate) AS d,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CASE WHEN year(o_orderdate) < 9999
                THEN o_orderdate + INTERVAL 7 DAY END AS plus_week,
           date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since_95
    FROM orders
    """,
)
def datetime_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime scalar function surface (O-series date ops generalized).
    Interval arithmetic is guarded at the calendar ceiling: the
    overflow-free comparison form for date predicates is integer
    datediff (see q12), and additions near the boundary go through an
    explicit sentinel guard."""
    orders = load(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("y"),
        F.month("o_orderdate").cast("bigint").alias("m"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("d"),
        # NOT date_trunc (and NOT make_timestamp): both yield a
        # session-zone TIMESTAMP, and PySpark's LTZ collect path
        # (datetime.fromtimestamp) cannot represent year-1 instants — a
        # 0001-01-xx sentinel crashes the conversion (date-audit
        # finding). make_timestamp_ntz from the extracted fields stays on
        # the NTZ path, exact for the whole supported calendar.
        F.expr(
            "make_timestamp_ntz(year(o_orderdate), month(o_orderdate), 1, 0, 0, 0)"
        ).alias("month_start"),
        # guarded: a "never expires" 9999 sentinel + interval crosses the
        # calendar ceiling — unrepresentable in the Python/Arrow layer and
        # type-unstable in DuckDB (date-audit finding); sentinel years map
        # to NULL in both engines.
        F.when(
            F.year("o_orderdate") < 9999,
            F.col("o_orderdate") + F.expr("INTERVAL 7 DAY"),
        ).alias("plus_week"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01 00:00:00").cast("timestamp"))
        .cast("bigint").alias("days_since_95"),
    )


@workload(
    "agg_percentiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS q25,
           quantile_cont(l_quantity, 0.5)  AS median_qty,
           quantile_cont(l_quantity, 0.9)  AS q90,
           max(l_quantity) AS max_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles (Spark ``percentile`` ≙
    DuckDB ``quantile_cont``). At 100 TB swap to ``percentile_approx``
    (t-digest, mergeable map-side) — kept exact here for the oracle."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.25)").alias("q25"),
        F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
        F.expr("percentile(l_quantity, 0.9)").alias("q90"),
        F.max("l_quantity").alias("max_qty"),
    )


@workload(
    "agg_cube_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets: all 4 grouping combinations in one pass."""
    orders = load(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec2("o_totalprice")).cast("double").alias("total"),
    )


@workload(
    "unpivot_money_measures",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'extendedprice' AS measure, l_extendedprice AS amount FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem
    """,
)
def unpivot_money_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT via stack(): wide money columns → long (measure, amount)
    rows in one scan (the UNION-ALL formulation would scan 3×)."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "stack(3, 'extendedprice', l_extendedprice,"
            " 'discount', l_discount, 'tax', l_tax) AS (measure, amount)"
        ),
    )


@workload(
    "range_join_ship_week",
    oracle="""
    SELECT o.o_orderkey,
           count(l.l_orderkey) AS n_shipped,
           CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_shipped
    FROM orders o
    LEFT JOIN lineitem l
      ON l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate < o.o_orderdate + INTERVAL 7 DAY
    WHERE o.o_orderkey % 100 = 0
    GROUP BY o.o_orderkey
    """,
)
def range_join_ship_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (non-equi) join, bucketized: lineitems shipped within 7 days
    of each (sampled) order.

    Spark has no native range-join optimization, and a raw theta join is a
    broadcast-nested-loop over the full corpus. The scalable composition:
    bucketize both sides to the 7-day grain, equi-join on the bucket (each
    probe checks its own and the next bucket), then apply the exact range
    filter. The cross product shrinks from |O|×|L| to per-bucket work —
    at 100 TB the equi-join shuffles by bucket like any other key.

    r12 (§2.3 aggregate-before-shuffle): the probe side only ever
    compares SHIPDATES, and both aggregates (count, exact decimal
    quantity sum) are associative — so lineitem is pre-aggregated to one
    (l_bucket, l_shipdate, cnt, qty) row per distinct date BEFORE the
    range join. The join then multiplies probes by the ~7 date summaries
    per bucket instead of by every item row (measured 4.8 M → ~40 k
    intermediate rows at sf0.1), and at scale the exchange carries
    |distinct dates| rows instead of |lineitem|. Decimal sums re-sum
    exactly (no float seam); count(l_orderkey)'s non-NULL semantics ride
    along as a conditional count inside the pre-aggregate.
    """
    bucket_secs = 7 * 86400
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 100 == 0)
        .select(
            "o_orderkey",
            "o_orderdate",
            (F.unix_timestamp("o_orderdate") / bucket_secs).cast("long").alias("o_bucket"),
        )
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey",
            "l_quantity",
            "l_shipdate",
            (F.unix_timestamp("l_shipdate") / bucket_secs).cast("long").alias("l_bucket"),
        )
        .groupBy("l_bucket", "l_shipdate")
        .agg(
            F.count("l_orderkey").alias("__cnt"),
            F.sum(_dec2("l_quantity")).alias("__qty"),
        )
    )
    # A 7-day window starting anywhere inside bucket b ends in b or b+1.
    probes = orders.withColumn(
        "l_bucket", F.explode(F.array(F.col("o_bucket"), F.col("o_bucket") + 1))
    )
    matched = probes.join(li, "l_bucket").filter(
        (F.col("l_shipdate") >= F.col("o_orderdate"))
        & (F.col("l_shipdate") < F.col("o_orderdate") + F.expr("INTERVAL 7 DAY"))
    )
    per_order = matched.groupBy("o_orderkey").agg(
        F.sum("__cnt").alias("n_shipped"),
        F.sum("__qty").cast("double").alias("qty_shipped"),
    )
    # LEFT semantics: orders with zero shipments keep a 0-count row.
    return (
        orders.select("o_orderkey")
        .join(per_order, "o_orderkey", "left")
        .select(
            "o_orderkey",
            F.coalesce(F.col("n_shipped"), F.lit(0)).alias("n_shipped"),
            "qty_shipped",
        )
    )


# -- Approximate aggregates: the 100 TB path for distinct counts and
# quantiles (HyperLogLog / KLL are mergeable map-side, no global sort).
# Raw estimates are engine-specific, so every entry here emits only
# driver-falsifiable columns: the EXACT side (value-checked against
# DuckDB) plus a within-bound boolean the estimate must satisfy — the
# sketch path still executes and is what the bench times (VERDICT r05
# ask #2: zero rows-only entries). approx_*_error check VALUE error;
# approx_distinct_parts / approx_quantiles_price check the multiset-join
# shape and the sketch's RANK guarantee respectively.


@workload(
    "approx_distinct_parts",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(1 AS BIGINT) AS est_within_4pct
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++, rsd 1%) next to the exact distinct
    AND the multiset row count — at scale the exact distinct shuffles
    every key, the sketch doesn't. Distinct from the
    ``approx_distinct_error`` companion by the null-safe multiset-count
    join (n_rows) and the integer-exact bound form.

    The estimate itself is engine-specific, so the hashed output carries
    the exact sides plus ``est_within_4pct`` — 25·|approx − exact| ≤ exact
    in pure bigints (no float division), vacuously 1 for an all-NULL
    group. The sketch still executes inside the same aggregate. The 4%
    bound is 4 sigma for HLL++ at rsd 1% (ADVICE r06: the previous 2%
    was only ~2 sigma — deterministic per dataset, but a new corpus or
    scale factor could legitimately land outside it with no engine bug;
    P(>4 sigma) is negligible for any input).

    r05: sketch-over-distinct rewrite (SCALING.md): both measures evaluate
    over the pre-deduplicated (flag, partkey) pairs — bit-identical HLL
    estimate (registers are max-of-hashes), exact count becomes a plain
    count, and the Expand-based multi-phase distinct-aggregate plan
    collapses into two map-side-combined shuffles plus a 3-row null-safe
    join for the multiset row count (measured 3.74 s → 1.76 s at sf0.1)."""
    li = load(spark, sf_dir, "lineitem")
    pairs = li.select("l_returnflag", "l_partkey").distinct()
    # count(col): a (flag, NULL) pair must not count — COUNT(DISTINCT)
    # excludes NULLs — while the group stays present when every partkey
    # is NULL (same 3VL contract as approx_distinct_error).
    approx = F.approx_count_distinct("l_partkey", rsd=0.01)
    exact = F.count("l_partkey")
    sketch_side = pairs.groupBy("l_returnflag").agg(
        exact.alias("exact_parts"),
        F.when(exact == 0, F.lit(1))
        .otherwise(
            (F.lit(25) * F.abs(approx - exact) <= exact).cast("bigint")
        )
        .cast("bigint")
        .alias("est_within_4pct"),
    )
    rows_side = li.groupBy(F.col("l_returnflag").alias("rf2")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    return sketch_side.join(
        rows_side, sketch_side.l_returnflag.eqNullSafe(F.col("rf2"))
    ).select("l_returnflag", "exact_parts", "n_rows", "est_within_4pct")


@workload(
    "approx_quantiles_price",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(o_totalprice) AS BIGINT) AS n,
           CAST(1 AS BIGINT) AS p50_rank_ok,
           CAST(1 AS BIGINT) AS p95_rank_ok
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def approx_quantiles_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx (mergeable KLL-style quantile sketch, accuracy
    10 000) per order status, verified by the sketch's own RANK guarantee
    — the complement of ``approx_quantiles_error``'s value-error check:
    the returned p-quantile estimate must sit at a data rank within ±1%
    of p·n, i.e. count(x < est)/n ≤ p + 0.01 and count(x ≤ est)/n ≥
    p − 0.01 (duplicates make the estimate's rank an interval
    [count_lt, count_le]; accuracy 10 000 guarantees rank error ≤ n/10⁴,
    well inside the 1% slack). Both comparisons run in pure bigints
    (100·count vs (100p±1)·n). The estimate is engine-specific so only
    n (value-checked) and the booleans are hashed; the sketch aggregate
    and the rank-count join-back are what the bench times. A group whose
    prices are all NULL has no estimate — vacuously ok."""
    orders = load(spark, sf_dir, "orders")
    est = orders.groupBy("o_orderstatus").agg(
        F.percentile_approx("o_totalprice", [0.5, 0.95], 10_000).alias("ap"),
        F.count("o_totalprice").alias("n"),
    ).select(
        "o_orderstatus",
        F.element_at("ap", 1).alias("e50"),
        F.element_at("ap", 2).alias("e95"),
        "n",
    )
    ranks = (
        orders.join(
            F.broadcast(est.withColumnRenamed("o_orderstatus", "st2")),
            F.col("o_orderstatus").eqNullSafe(F.col("st2")),
        )
        .groupBy(F.col("st2"))
        .agg(
            F.count(F.when(F.col("o_totalprice") < F.col("e50"), 1)).alias("lt50"),
            F.count(F.when(F.col("o_totalprice") <= F.col("e50"), 1)).alias("le50"),
            F.count(F.when(F.col("o_totalprice") < F.col("e95"), 1)).alias("lt95"),
            F.count(F.when(F.col("o_totalprice") <= F.col("e95"), 1)).alias("le95"),
        )
    )

    def _rank_ok(lt: str, le: str, p100: int):
        # count_le/n ≥ p − 1% and count_lt/n ≤ p + 1%, in bigints.
        return (
            (F.lit(100) * F.col(le) >= F.lit(p100 - 1) * F.col("n"))
            & (F.lit(100) * F.col(lt) <= F.lit(p100 + 1) * F.col("n"))
        ).cast("bigint")

    return (
        est.join(ranks, est.o_orderstatus.eqNullSafe(F.col("st2")), "left")
        .select(
            "o_orderstatus",
            "n",
            F.when(F.col("n") == 0, F.lit(1))
            .otherwise(_rank_ok("lt50", "le50", 50))
            .cast("bigint")
            .alias("p50_rank_ok"),
            F.when(F.col("n") == 0, F.lit(1))
            .otherwise(_rank_ok("lt95", "le95", 95))
            .cast("bigint")
            .alias("p95_rank_ok"),
        )
    )


@workload(
    "approx_distinct_error",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           CAST(1 AS BIGINT) AS err_within_2pct
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def approx_distinct_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable bound for the HLL++ sketch (VERDICT r03 next-round
    #4): per-group relative error of approx_count_distinct(rsd=1%) vs the
    exact distinct, asserted ≤ 2% (measured max 0.65% at sf0.01; HLL is
    deterministic for fixed data, so the bound is closed-form). The exact
    counts themselves are value-checked against DuckDB.

    Both measures evaluate over the pre-deduplicated (flag, partkey)
    pairs: HLL registers are max-of-hashes, so duplicates never change
    the estimate — sketching the distinct set is bit-identical to
    sketching the multiset while feeding the (rsd=1% → 2^14-register)
    sketch ~10x fewer updates, and the exact count becomes a plain count.
    One map-side-combined distinct shuffle replaces the multi-phase
    distinct-aggregate plan (measured 3.5 s → ~0.8 s at sf0.1)."""
    li = load(spark, sf_dir, "lineitem")
    pairs = li.select("l_returnflag", "l_partkey").distinct()
    # count(col), not count(1): a (flag, NULL) pair must not count —
    # COUNT(DISTINCT l_partkey) excludes NULLs — while still keeping the
    # group present when every partkey is NULL (null-key audit finding).
    n = F.count("l_partkey")
    return pairs.groupBy("l_returnflag").agg(
        n.alias("exact_parts"),
        F.when(n == 0, F.lit(1))
        .otherwise(
            (
                F.abs(F.approx_count_distinct("l_partkey", rsd=0.01) - n) / n
                <= 0.02
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("err_within_2pct"),
    )


@workload(
    "approx_quantiles_error",
    oracle="""
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
           CAST(1 AS BIGINT) AS p50_within_1pct,
           CAST(1 AS BIGINT) AS p95_within_1pct
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def approx_quantiles_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable bound for the mergeable quantile sketch (VERDICT
    r03 next-round #4): percentile_approx(accuracy=10000) vs Spark's exact
    interpolating percentile, relative error asserted ≤ 1% per order
    status (measured max 0.18% at sf0.001, 0.06% at sf0.01; the sketch is
    deterministic for fixed data). Group sizes are value-checked."""
    orders = load(spark, sf_dir, "orders")
    agg = orders.groupBy("o_orderstatus").agg(
        F.percentile_approx("o_totalprice", [0.5, 0.95], 10_000).alias("ap"),
        F.expr("percentile(o_totalprice, array(0.5, 0.95))").alias("ex"),
        F.count(F.lit(1)).alias("n"),
    )
    def _ok(i: int):
        a, e = F.element_at("ap", i), F.element_at("ex", i)
        return (F.abs(a - e) / e <= 0.01).cast("bigint")
    return agg.select(
        "o_orderstatus",
        "n",
        _ok(1).alias("p50_within_1pct"),
        _ok(2).alias("p95_within_1pct"),
    )


@workload(
    "correlated_subquery_rich_customers",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE c_acctbal > (SELECT 1.2 * (CAST(sum(CASE WHEN abs(c2.c_acctbal) < 1e15 THEN CAST(c2.c_acctbal AS DECIMAL(18,2)) END) AS DOUBLE)
                                     / count(*))
                       FROM customer c2
                       WHERE c2.c_nationkey = c.c_nationkey)
    """,
)
def correlated_subquery_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (decorrelated by Catalyst into the same
    aggregate-join the DataFrame form spells out): customers 20% above
    their nation's average balance. Comparison happens on both engines'
    identical double averages of the same doubles — per-nation sums are
    accumulated in decimal first, divided in double."""
    cust = load(spark, sf_dir, "customer")
    per_nation = cust.groupBy("c_nationkey").agg(
        (
            F.sum(
                F.when(
                    F.abs(F.col("c_acctbal")) < 1e15,
                    F.col("c_acctbal").cast("decimal(18,2)"),
                )
            ).cast("double")
            / F.count(F.lit(1))
        ).alias("nation_avg")
    )
    return (
        cust.join(F.broadcast(per_nation), "c_nationkey")
        .filter(F.col("c_acctbal") > 1.2 * F.col("nation_avg"))
        .select("c_custkey", "c_name", "c_acctbal")
    )


@workload(
    "grouped_map_rank",
    oracle="""
    SELECT user_id, event_id,
           row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS value_rank
    FROM events
    """,
)
def grouped_map_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped-map UDF: per-user pandas transform (rank by
    value). Exercises the Arrow grouped-map path with an exact integer
    result the window-function oracle reproduces. Prefer the built-in
    window for THIS computation — the pattern exists for per-group logic
    Spark can't express (model scoring, per-group fitting)."""
    import pandas as pd

    # Arrow hands pandas ONE representation for SQL NULL and IEEE NaN (both
    # NaN in a float64 column), but SQL row_number ORDER BY value DESC puts
    # NaN FIRST (greatest, both engines) and NULL LAST (default NULLS LAST,
    # both engines) — so the null-ness must travel as an explicit flag
    # computed before the Arrow transfer (null- + float-audit findings).
    events = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "value", F.col("value").isNull().alias("__vnull")
    )

    def rank_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["__vnull", "value", "event_id"],
            ascending=[True, False, True],
            na_position="first",
        )
        pdf["value_rank"] = range(1, len(pdf) + 1)
        return pdf[["user_id", "event_id", "value_rank"]]

    return events.groupBy("user_id").applyInPandas(
        rank_group, "user_id long, event_id long, value_rank long"
    )


@workload(
    "timeseries_gapfill",
    oracle="""
    WITH bounds AS (
        SELECT user_id, CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1
        FROM events GROUP BY user_id
    ),
    calendar AS (
        SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS d
        FROM bounds
    ),
    daily AS (
        SELECT user_id, CAST(ts AS DATE) AS d, count(*) AS n
        FROM events GROUP BY user_id, CAST(ts AS DATE)
    )
    SELECT c.user_id, c.d, COALESCE(n, 0) AS n
    FROM calendar c LEFT JOIN daily USING (user_id, d)
    """,
)
def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification: per-user daily counts with missing days
    zero-filled — sequence() generates each user's date range (no
    driver-side calendar), then a left join fills gaps. The resample/
    gap-fill primitive every time-series pipeline needs."""
    events = load(spark, sf_dir, "events")
    bounds = events.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    calendar = bounds.select(
        "user_id",
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("d"),
    )
    daily = events.groupBy("user_id", F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return calendar.join(daily, ["user_id", "d"], "left").select(
        "user_id", "d", F.coalesce("n", F.lit(0)).alias("n")
    )


@workload(
    "window_analytics_extended",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ntile(4) OVER w AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cdist,
           first_value(o_orderkey) OVER w AS first_ok,
           nth_value(o_orderkey, 2) OVER w AS second_ok
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey)
    """,
)
def window_analytics_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended window analytics: ntile, percent_rank, cume_dist,
    first/nth value over a deterministic ordering."""
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cdist"),
        F.first("o_orderkey").over(w).alias("first_ok"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_ok"),
    )


@workload(
    "quality_constraint_report",
    oracle="""
    WITH agg AS (
        SELECT count(*) AS n,
               count(*) FILTER (WHERE o_custkey IS NULL) AS custkey_nulls,
               count(*) FILTER (WHERE o_totalprice IS NOT NULL
                                AND (o_totalprice < 0 OR o_totalprice > 1000000)) AS price_range,
               count(*) FILTER (WHERE o_orderstatus IS NOT NULL
                                AND o_orderstatus NOT IN ('O', 'F', 'P')) AS status_domain,
               count(*) FILTER (WHERE o_orderpriority IS NOT NULL
                                AND NOT regexp_full_match(o_orderpriority, '[1-5]-[A-Z ]+')) AS priority_shape
        FROM orders
    )
    SELECT rule, n_violations, n AS n_rows,
           CAST(n_violations AS DOUBLE) / n AS violation_rate
    FROM (
        SELECT n, 'o_custkey_not_null' AS rule, custkey_nulls AS n_violations FROM agg
        UNION ALL SELECT n, 'o_totalprice_in_range', price_range FROM agg
        UNION ALL SELECT n, 'o_orderstatus_accepted', status_domain FROM agg
        UNION ALL SELECT n, 'o_orderpriority_matches', priority_shape FROM agg
    )
    """,
)
def quality_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality gate: 4 constraint rules evaluated in one scan
    (conditional counts), emitted as a per-rule violation report."""
    from ..operators.quality import accepted_values, constraint_report, in_range, matches, not_null

    orders = load(spark, sf_dir, "orders")
    rules = [
        not_null("o_custkey"),
        in_range("o_totalprice", 0, 1_000_000),
        accepted_values("o_orderstatus", ["O", "F", "P"]),
        matches("o_orderpriority", r"^[1-5]-[A-Z ]+$"),
    ]
    return constraint_report(orders, rules)


@workload(
    "merge_scd2_history",
    oracle="""
    WITH hist AS (
        SELECT user_id, event_type, value, ts AS valid_from
        FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                           ORDER BY ts DESC, event_id DESC) AS rn
              FROM events WHERE ts < TIMESTAMP '2024-01-15 00:00:00')
        WHERE rn = 1
    ),
    src AS (
        SELECT user_id, event_type, value
        FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                           ORDER BY ts DESC, event_id DESC) AS rn
              FROM events WHERE ts >= TIMESTAMP '2024-01-15 00:00:00')
        WHERE rn = 1
    )
    SELECT h.user_id, h.event_type, h.value, h.valid_from,
           NULL::TIMESTAMP AS valid_to, true AS is_current
    FROM hist h LEFT JOIN src s ON h.user_id = s.user_id
    WHERE s.user_id IS NULL
       OR NOT ((h.event_type IS DISTINCT FROM s.event_type)
               OR (h.value IS DISTINCT FROM s.value))
    UNION ALL
    SELECT h.user_id, h.event_type, h.value, h.valid_from,
           TIMESTAMP '2024-06-01 00:00:00', false
    FROM hist h JOIN src s ON h.user_id = s.user_id
    WHERE (h.event_type IS DISTINCT FROM s.event_type)
       OR (h.value IS DISTINCT FROM s.value)
    UNION ALL
    SELECT s.user_id, s.event_type, s.value,
           TIMESTAMP '2024-06-01 00:00:00', NULL::TIMESTAMP, true
    FROM src s LEFT JOIN hist h ON h.user_id = s.user_id
    WHERE h.user_id IS NULL
       OR (h.event_type IS DISTINCT FROM s.event_type)
       OR (h.value IS DISTINCT FROM s.value)
    """,
)
def merge_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 merge: the pre-cutoff latest event per user seeds a
    versioned history; the post-cutoff snapshot closes changed versions
    (valid_to stamped) and opens new current ones. One full-outer join,
    each row conditionally exploding to 1-2 output rows — history-keeping
    MERGE without per-branch re-joins."""
    from ..operators.dedup import latest_per_key
    from ..operators.scd import SCD_CURRENT, SCD_FROM, SCD_TO, merge_scd2

    events = load(spark, sf_dir, "events")
    cutoff = F.to_timestamp(F.lit("2024-01-15 00:00:00"))
    now = F.to_timestamp(F.lit("2024-06-01 00:00:00"))
    hist = latest_per_key(
        events.filter(F.col("ts") < cutoff), ["user_id"], ["ts", "event_id"]
    ).select(
        "user_id",
        "event_type",
        "value",
        F.col("ts").alias(SCD_FROM),
        F.lit(None).cast("timestamp").alias(SCD_TO),
        F.lit(True).alias(SCD_CURRENT),
    )
    src = latest_per_key(
        events.filter(F.col("ts") >= cutoff), ["user_id"], ["ts", "event_id"]
    ).select("user_id", "event_type", "value")
    return merge_scd2(hist, src, "user_id", ["event_type", "value"], now=now)


@workload(
    "scd2_point_in_time_join",
    oracle="""
    WITH v AS (
        SELECT user_id, event_id AS ver_id, event_type, value, ts AS valid_from
        FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ),
    f AS (
        SELECT user_id, event_id AS fact_id, ts + INTERVAL 36 HOUR AS fact_ts
        FROM events
        WHERE event_id % 5 = 0 AND ts IS NOT NULL AND user_id IS NOT NULL
    ),
    j AS (
        SELECT f.user_id, f.fact_id, f.fact_ts,
               v.ver_id, v.event_type, v.value,
               row_number() OVER (PARTITION BY f.fact_id
                                  ORDER BY v.valid_from DESC, v.ver_id DESC)
                   AS rn
        FROM f JOIN v ON v.user_id = f.user_id AND v.valid_from <= f.fact_ts
    )
    SELECT user_id, fact_id, fact_ts, ver_id, event_type, value
    FROM j WHERE rn = 1
    """,
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) join: each fact row picks the dimension
    VERSION that was valid at the fact's timestamp — the lookup every
    SCD2 history exists to serve. The version history is the per-user
    event stream itself (version i valid from ts_i until the next
    event), and facts are a deterministic event subset probing 36 h after
    their own timestamp, so matches cross version boundaries.

    Spark-side this is the union-window as-of shape generalized to TWO
    relations (``asof_prior_purchase`` is the self-join special case):
    tag versions kind=0 and facts kind=1, union, ONE window partitioned
    by the join key ordered by (t, kind, id), and ``last(version_struct,
    ignorenulls)`` hands every fact the latest version at-or-before its
    probe time. One exchange total — no range join, no per-fact
    subquery; the oracle replays it as the classic BETWEEN-style
    rank-1-over-(valid_from DESC) lookup. At 100 TB the window state per
    task is one struct (the running version), and AQE splits hot users
    the same way it does for the dedup window.

    Contract (3VL seams made explicit, null-audit discipline): versions
    need a valid_from and both sides need the join key — NULL ts / NULL
    user_id rows are dropped on BOTH sides, because the oracle's
    equi-join would silently drop NULL keys while a window PARTITION BY
    groups them."""
    events = load(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    v = events.select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(0).alias("kind"),
        F.col("event_id").alias("ver_id"),
        "event_type",
        "value",
        F.lit(None).cast("long").alias("fact_id"),
    )
    f = events.filter(F.col("event_id") % 5 == 0).select(
        "user_id",
        (F.col("ts") + F.expr("INTERVAL 36 HOURS")).alias("t"),
        F.lit(1).alias("kind"),
        F.lit(None).cast("long").alias("ver_id"),
        F.lit(None).cast("string").alias("event_type"),
        F.lit(None).cast("double").alias("value"),
        F.col("event_id").alias("fact_id"),
    )
    u = v.unionByName(f)
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "kind", F.coalesce("ver_id", "fact_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    picked = F.last(
        F.when(
            F.col("kind") == 0,
            F.struct("ver_id", "event_type", "value"),
        ),
        ignorenulls=True,
    ).over(w)
    return (
        u.withColumn("__v", picked)
        .filter(F.col("kind") == 1)
        .select(
            "user_id",
            "fact_id",
            F.col("t").alias("fact_ts"),
            F.col("__v.ver_id").alias("ver_id"),
            F.col("__v.event_type").alias("event_type"),
            F.col("__v.value").alias("value"),
        )
    )


@workload(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                            (o_orderstatus, o_orderpriority), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS (the shapes ROLLUP/CUBE can't express):
    per-status, per-priority, the full cross, and the grand total in ONE
    aggregation pass — Catalyst expands to a single Expand + partial agg,
    not a 4-way self-union of scans."""
    orders = load(spark, sf_dir, "orders")
    return orders.groupingSets(
        [["o_orderstatus"], ["o_orderpriority"],
         ["o_orderstatus", "o_orderpriority"], []],
        "o_orderstatus", "o_orderpriority",
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(_dec2("o_totalprice")).cast("double").alias("total_price"),
    )


@workload(
    "lateral_nation_customer_stats",
    oracle="""
    SELECT n.n_name AS nation, t.n_cust, t.max_bal, t.total_bal
    FROM nation n,
    LATERAL (
        SELECT count(*) AS n_cust,
               CAST(max(CASE WHEN abs(c_acctbal) < 1e15 THEN CAST(c_acctbal AS DECIMAL(18,2)) END) AS DOUBLE) AS max_bal,
               CAST(sum(CASE WHEN abs(c_acctbal) < 1e15 THEN CAST(c_acctbal AS DECIMAL(18,2)) END) AS DOUBLE) AS total_bal
        FROM customer c
        WHERE c.c_nationkey = n.n_nationkey
    ) t
    """,
)
def lateral_nation_customer_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated aggregate subquery in FROM — per-nation customer
    stats. Catalyst decorrelates it into the same aggregate + join a
    hand-written plan would use (no per-row re-execution), so the 100 TB
    cost is one customer-side aggregation and a broadcast-able join with
    the tiny nation table."""
    load(spark, sf_dir, "nation").createOrReplaceTempView("nation_lat_v")
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer_lat_v")
    return spark.sql("""
        SELECT n.n_name AS nation, t.n_cust, t.max_bal, t.total_bal
        FROM nation_lat_v n,
        LATERAL (
            SELECT count(*) AS n_cust,
                   CAST(max(CASE WHEN abs(c_acctbal) < 1e15 THEN CAST(c_acctbal AS DECIMAL(18,2)) END) AS DOUBLE) AS max_bal,
                   CAST(sum(CASE WHEN abs(c_acctbal) < 1e15 THEN CAST(c_acctbal AS DECIMAL(18,2)) END) AS DOUBLE) AS total_bal
            FROM customer_lat_v c
            WHERE c.c_nationkey = n.n_nationkey
        ) t
    """)


@workload(
    "array_hof_showcase",
    oracle="""
    WITH arr AS (
        SELECT l_orderkey AS orderkey,
               list_sort(list_filter(list(CAST(l_quantity AS INT)),
                                     x -> x IS NOT NULL)) AS qtys
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT orderkey,
           coalesce(array_to_string(qtys, ','), '') AS qtys_csv,
           CAST(len(qtys) AS BIGINT) AS n_items,
           coalesce(array_to_string(list_transform(qtys, x -> CAST(x * 2 AS INT)),
                    ','), '') AS doubled_csv,
           coalesce(array_to_string(list_filter(qtys, x -> x > 25), ','), '')
               AS big_qtys_csv,
           CAST(coalesce(list_sum(qtys), 0) AS BIGINT) AS sum_qty,
           coalesce(array_to_string(qtys[1:3], ','), '') AS first3_csv,
           list_contains(qtys, 50) AS has_50
    FROM arr
    """,
)
def array_hof_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array construction + higher-order functions: collect per-order
    quantities (sort_array normalizes the collect_list order), then
    transform / filter / aggregate / slice / contains — all JVM-side
    expression work on integer arrays. Output serializes the array columns
    to CSV strings (array_join / array_to_string) so the driver's pandas
    canonicalizer can hash the rows (VERDICT r02 item 1); the HOF work
    itself still runs on real array<int> values."""
    li = load(spark, sf_dir, "lineitem")
    arr = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list(F.col("l_quantity").cast("int"))).alias("qtys")
    )
    csv = lambda expr: F.expr(  # noqa: E731 — array<int> → '1,2,3'
        f"array_join(transform({expr}, x -> CAST(x AS STRING)), ',')"
    )
    return arr.select(
        F.col("l_orderkey").alias("orderkey"),
        csv("qtys").alias("qtys_csv"),
        F.size("qtys").cast("bigint").alias("n_items"),
        csv("transform(qtys, x -> CAST(x * 2 AS INT))").alias("doubled_csv"),
        csv("filter(qtys, x -> x > 25)").alias("big_qtys_csv"),
        F.expr("CAST(aggregate(qtys, 0L, (a, x) -> a + x) AS BIGINT)").alias("sum_qty"),
        csv("slice(qtys, 1, 3)").alias("first3_csv"),
        F.array_contains("qtys", F.lit(50)).alias("has_50"),
    )


@workload(
    "histogram_totalprice",
    oracle="""
    SELECT CAST(floor(o_totalprice / 25000) AS BIGINT) AS bucket,
           count(*) AS n_orders,
           min(o_totalprice) AS min_price,
           max(o_totalprice) AS max_price
    FROM orders
    GROUP BY 1
    """,
)
def histogram_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric histogram: fixed-width bucketing via floor division (the
    identical double expression both engines evaluate — width_bucket's
    engine-internal edge handling is deliberately avoided). min/max are
    selections of input values, never computed floats, so no rounding is
    needed for cross-engine identity."""
    orders = load(spark, sf_dir, "orders")
    return orders.groupBy(
        F.floor(F.col("o_totalprice") / 25000).cast("bigint").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


@workload(
    "sliding_window_event_counts",
    oracle="""
    SELECT make_timestamp((CAST(floor(epoch(ts) / 10800) AS BIGINT) * 10800
                           - k.k * 10800) * 1000000) AS window_start,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_users
    FROM events, (VALUES (0), (1)) AS k(k)
    GROUP BY 1
    """,
)
def sliding_window_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows (6 h window, 3 h slide): every event
    lands in window/slide = 2 overlapping windows. Spark's window()
    expands rows before the aggregation — the oracle mirrors the same
    epoch-aligned expansion with an explicit 2-value unnest. Counts are
    per-window; the shuffle key is the window start."""
    events = load(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "6 hours", "3 hours").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "n_users")
    )


@workload(
    "map_functions_roundtrip",
    oracle="""
    WITH per AS (
        SELECT user_id, event_type, count(*) AS n
        FROM events WHERE event_type IS NOT NULL
        GROUP BY user_id, event_type
    ),
    t AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_types FROM per GROUP BY user_id)
    SELECT p.user_id, p.event_type, p.n, t.n_types
    FROM per p JOIN t ON p.user_id IS NOT DISTINCT FROM t.user_id
    """,
)
def map_functions_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column roundtrip: per-user event-type counts packed into
    a map (map_from_entries ∘ collect_list ∘ struct), interrogated with
    size(), then exploded back to rows. Map iteration order is engine-
    private, but the exploded ROW SET is deterministic — which is exactly
    what the order-insensitive hash checks. NULL event types are excluded
    up front — map keys cannot be NULL (NULL_MAP_KEY), and a dirty corpus
    always has some."""
    events = load(spark, sf_dir, "events").filter(F.col("event_type").isNotNull())
    per = events.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    packed = per.groupBy("user_id").agg(
        F.map_from_entries(F.collect_list(F.struct("event_type", "n"))).alias("tc")
    )
    return packed.select(
        "user_id",
        F.size("tc").cast("bigint").alias("n_types"),
        F.explode("tc").alias("event_type", "n"),
    ).select("user_id", "event_type", "n", "n_types")


@workload(
    "custdist_order_counts",
    oracle="""
    WITH c_orders AS (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM c_orders GROUP BY c_count
    """,
)
def custdist_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer order-count distribution — left outer
    join (zero-order customers count as c_count 0 via count of a nullable
    column), double aggregation. The outer join shuffles on the customer
    key; the second agg is tiny."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    c_orders = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return c_orders.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@workload(
    "large_quantity_orders",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 120
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate
    """,
)
def large_quantity_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN over a grouped-HAVING subquery (expressed as a
    semi join against the pre-aggregated order totals — the plan Catalyst
    rewrites the IN into anyway), then the 3-way join re-aggregates for
    output. The HAVING side reuses the same lineitem scan shape; at scale
    the semi join prunes orders before the wide join."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec2("l_quantity")).alias("tq"))
        .filter(F.col("tq") > 120)
        .select("l_orderkey")
    )
    return (
        li.join(big, "l_orderkey", "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate")
        .agg(F.sum(_dec2("l_quantity")).cast("double").alias("total_qty"))
    )


@workload(
    "nation_trade_volume",
    oracle=f"""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           CAST(sum({_REVENUE_SQL}) AS DOUBLE) AS volume,
           count(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE cn.n_name <> sn.n_name
    GROUP BY cn.n_name, sn.n_name
    """,
)
def nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: the same dimension table (nation) joined in TWO
    roles (customer side + supplier side) with a cross-border filter —
    the classic star join with role-playing dimensions. All four
    dimension joins broadcast; only orders⋈lineitem shuffles."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    cn = nat.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = nat.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    revenue = (_dec2("l_extendedprice") * (F.expr(_ONE) - _dec2("l_discount"))).cast(
        "decimal(18,4)"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), cust.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), supp.s_nationkey == F.col("sn_key"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation")
        .agg(
            F.sum(revenue).cast("double").alias("volume"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@workload(
    "udaf_weighted_avg_quantity",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CAST(l_quantity AS BIGINT) * l_linenumber) AS DOUBLE)
               / CAST(sum(l_linenumber) AS DOUBLE) AS wavg_qty,
           CAST(sum(l_linenumber) AS BIGINT) AS total_weight,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def udaf_weighted_avg_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom UDAF via a GROUPED_AGG pandas UDF: linenumber-weighted mean
    quantity. All accumulation is int64 (exact in any order — the
    Arrow-batched numpy sum can't diverge from the oracle's); only the
    final division is float. At scale this is Spark's partial-aggregation
    path for pandas UDAFs — state is the per-group series, so groups must
    fit a task; for unbounded groups prefer the expression form
    sum(q*w)/sum(w), shown in total_weight."""
    from pyspark.sql.functions import pandas_udf

    # Type-hint form (Series, Series) -> float infers GROUPED_AGG
    # (SPARK-28264: the PandasUDFType constant is deprecated).
    @pandas_udf("double")
    def wavg(q: pd.Series, w: pd.Series) -> float:
        # 3VL seam (ADVICE r04): pandas' skipna sum over an all-NULL
        # product series is 0.0, but SQL's SUM over all-NULL is NULL —
        # return None so an all-NULL-quantity group matches the oracle.
        p = q * w
        if p.notna().sum() == 0:
            return None
        return float(p.sum() / w.sum())

    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("q"),
        F.col("l_linenumber").cast("long").alias("w"),
    )
    # Spark disallows mixing a GROUPED_AGG pandas UDF with JVM aggregates
    # in one agg() — run them as two aggs over the same grouped shuffle
    # and join on the (3-row) group key. The join must be NULL-SAFE: a
    # NULL group key survives both GROUP BYs but a plain equi-join drops
    # it (NULL != NULL), silently losing the NULL-returnflag group the
    # oracle keeps (null-audit finding).
    udaf_side = li.groupBy("l_returnflag").agg(wavg("q", "w").alias("wavg_qty"))
    expr_side = li.groupBy(F.col("l_returnflag").alias("rf2")).agg(
        F.sum("w").cast("bigint").alias("total_weight"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return udaf_side.join(
        expr_side, udaf_side.l_returnflag.eqNullSafe(F.col("rf2"))
    ).select("l_returnflag", "wavg_qty", "total_weight", "n_rows")


@workload(
    "cdc_snapshot_diff",
    oracle="""
    WITH old_snap AS (
        SELECT o_orderkey, o_totalprice, o_orderpriority
        FROM orders WHERE o_orderkey % 10 <> 0
    ),
    new_snap AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 1.1
                    ELSE o_totalprice END AS o_totalprice,
               CASE WHEN o_orderkey % 5 = 0 THEN 'X-CHANGED'
                    ELSE o_orderpriority END AS o_orderpriority
        FROM orders WHERE o_orderkey % 7 <> 0
    ),
    j AS (
        SELECT o.o_orderkey AS ok, n.o_orderkey AS nk,
               o.o_totalprice AS ov_p, n.o_totalprice AS nv_p,
               o.o_orderpriority AS ov_r, n.o_orderpriority AS nv_r
        FROM old_snap o FULL OUTER JOIN new_snap n
            ON o.o_orderkey = n.o_orderkey
    ),
    d AS (
        SELECT *,
               list_sort(list_filter([
                   CASE WHEN ov_p IS DISTINCT FROM nv_p THEN 'o_totalprice' END,
                   CASE WHEN ov_r IS DISTINCT FROM nv_r THEN 'o_orderpriority' END
               ], x -> x IS NOT NULL)) AS diffs
        FROM j
    )
    SELECT coalesce(nk, ok) AS o_orderkey,
           CASE WHEN ok IS NOT NULL AND nk IS NULL THEN 'delete'
                WHEN ok IS NULL AND nk IS NOT NULL THEN 'insert'
                WHEN len(diffs) > 0 THEN 'update' END AS cdc_action,
           coalesce(array_to_string(
               CASE WHEN ok IS NOT NULL AND nk IS NOT NULL THEN diffs
                    ELSE CAST([] AS VARCHAR[]) END, ','), '') AS changed_columns,
           nv_p AS new_o_totalprice, nv_r AS new_o_orderpriority
    FROM d
    WHERE (ok IS NOT NULL AND nk IS NULL)
       OR (ok IS NULL AND nk IS NOT NULL)
       OR len(diffs) > 0
    """,
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC: diff two keyed snapshots into the minimal insert/delete/update
    changelog with per-row changed-column lists (operators/cdc.py — the
    inverse of the reference's keyed MERGE apply). Synthetic snapshots:
    old drops every 10th order, new drops every 7th, bumps price on %3
    and priority on %5. One full-outer join on the key. The operator API
    keeps changed_columns as array<string>; only this registered query's
    output flattens it to a CSV string so the driver can hash the rows
    (VERDICT r02 item 2)."""
    from ..operators.cdc import snapshot_diff

    orders = load(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderkey") % 10 != 0).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    new = orders.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") * 1.1
        ).otherwise(F.col("o_totalprice")).alias("o_totalprice"),
        F.when(F.col("o_orderkey") % 5 == 0, F.lit("X-CHANGED"))
        .otherwise(F.col("o_orderpriority")).alias("o_orderpriority"),
    )
    diff = snapshot_diff(
        old, new, ["o_orderkey"], ["o_totalprice", "o_orderpriority"]
    )
    return diff.withColumn(
        "changed_columns", F.array_join("changed_columns", ",")
    )


@workload(
    "outlier_filter_iqr",
    oracle="""
    WITH b AS (
        SELECT event_type,
               quantile_cont(value, 0.25) AS q1,
               quantile_cont(value, 0.75) AS q3
        FROM events WHERE isfinite(value) GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           b.q1 - 1.5 * (b.q3 - b.q1) AS lo,
           b.q3 + 1.5 * (b.q3 - b.q1) AS hi
    FROM events e JOIN b ON e.event_type = b.event_type
    WHERE e.value IS NOT NULL
      AND (NOT isfinite(e.value)
           OR e.value < b.q1 - 1.5 * (b.q3 - b.q1)
           OR e.value > b.q3 + 1.5 * (b.q3 - b.q1))
    """,
)
def outlier_filter_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier detection per group: exact linear-interpolated
    quartiles (Spark `percentile` ≙ DuckDB `quantile_cont`, verified
    bit-identical), fences built with the same arithmetic shape on both
    engines, tiny per-group bounds broadcast back onto the fact scan.

    Scale note: exact percentile is HOLISTIC — each group's values gather
    on one reducer. With few, huge groups at 100 TB, swap the quartile
    stage to `percentile_approx` (mergeable sketch, map-side partials);
    the fence-and-broadcast shape is unchanged. The exact form is kept
    here because the oracle demands bit-equality."""
    events = load(spark, sf_dir, "events")
    finite = ~F.isnan(F.col("value")) & (F.abs(F.col("value")) != F.lit(float("inf")))
    b = events.filter(F.col("value").isNotNull() & finite).groupBy("event_type").agg(
        F.expr("percentile(value, 0.25)").alias("q1"),
        F.expr("percentile(value, 0.75)").alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    fences = b.select(
        "event_type",
        (F.col("q1") - 1.5 * iqr).alias("lo"),
        (F.col("q3") + 1.5 * iqr).alias("hi"),
    )
    return (
        events.join(F.broadcast(fences), "event_type")
        .filter(
            F.col("value").isNotNull()
            & (~finite | (F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi")))
        )
        .select("event_id", "event_type", "value", "lo", "hi")
    )


@workload(
    "session_window_native",
    oracle="""
    WITH o AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
        SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid
        FROM o
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events,
           min(event_id) AS min_event_id
    FROM s GROUP BY user_id, sid
    """,
)
def session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE session_window aggregation (dynamic-gap windows
    merged inside the agg operator — no explicit lag/cumsum pass), next
    to the hand-built sessionize_events and the stateful streaming
    sessionizer. Oracle is the classic gaps-and-islands rewrite; the
    break rule (`diff >= gap` starts a new session) mirrors Spark's
    end-exclusive [start, last+gap) window merge exactly."""
    events = load(spark, sf_dir, "events")
    return (
        events.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("w")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("event_id").alias("min_event_id"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "min_event_id",
        )
    )


@workload(
    "agg_listagg_sorted",
    oracle="""
    SELECT o_orderstatus,
           string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority)
               AS priorities,
           count(*) AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_listagg_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG/string_agg: sorted-distinct CSV per group. collect_set is
    order-nondeterministic, so determinism comes from sort_array before
    array_join — the only engine-portable listagg form (matches the
    oracle's ORDER BY inside the aggregate)."""
    orders = load(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.array_join(
            F.sort_array(F.collect_set("o_orderpriority")), ","
        ).alias("priorities"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@workload(
    "window_range_frame",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(count(*) OVER w AS BIGINT) AS n_last_hour,
           CAST(sum(CASE WHEN abs(value) < 1e12
                         THEN CAST(floor(value * 100) AS BIGINT) END)
                    OVER w AS BIGINT)
               AS cents_last_hour
    FROM events
    WINDOW w AS (
        PARTITION BY user_id ORDER BY epoch_us(ts)
        RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
    )
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE (value-based) window frame — trailing 1-hour totals per user.
    Unlike ROWS frames, RANGE bounds are data values: the frame is every
    event within 3600s of the current one, ties included as peers. The
    order key is integer microseconds (identical on both engines); the
    summed measure is integer cents (floor(value*100)) so the running
    totals are engine-exact regardless of accumulation order."""
    events = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    cents = F.when(
        F.abs(F.col("value")) < 1e12, F.floor(F.col("value") * 100).cast("bigint")
    )
    return events.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_last_hour"),
        F.sum(cents).over(w).cast("bigint").alias("cents_last_hour"),
    )


@workload(
    "window_rank_distribution",
    oracle="""
    WITH o AS (
        SELECT o_orderkey, o_orderpriority,
               CASE WHEN abs(o_totalprice) < 1e12
                    THEN CAST(floor(o_totalprice * 100) AS BIGINT) END AS cents
        FROM orders
    )
    SELECT o_orderkey, o_orderpriority,
           percent_rank() OVER w AS pr,
           cume_dist() OVER w AS cd,
           CAST(nth_value(o_orderkey, 3) OVER w2 AS BIGINT) AS third_key
    FROM o
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY cents ASC NULLS FIRST, o_orderkey ASC NULLS FIRST),
           w2 AS (PARTITION BY o_orderpriority
                  ORDER BY cents ASC NULLS FIRST, o_orderkey ASC NULLS FIRST
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_rank_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-analytic window functions — percent_rank, cume_dist,
    nth_value — per order priority over the integer-cents price order.
    The ordering is total and NULL-pinned explicitly (`ASC NULLS FIRST`
    on both keys in BOTH engines: Spark defaults NULLS FIRST on ASC
    where DuckDB defaults NULLS LAST — the classic silent divergence).
    percent_rank = (rank−1)/(n−1) and cume_dist = peers≤/n are single
    divisions of identical integers, bit-equal cross-engine; nth_value
    uses the explicit unbounded ROWS frame (its default frame ends at
    CURRENT ROW, which would NULL the first two rows of every group)."""
    orders = load(spark, sf_dir, "orders")
    cents = F.when(
        F.abs(F.col("o_totalprice")) < 1e12,
        F.floor(F.col("o_totalprice") * 100).cast("bigint"),
    )
    o = orders.select("o_orderkey", "o_orderpriority", cents.alias("cents"))
    order_keys = [
        F.col("cents").asc_nulls_first(),
        F.col("o_orderkey").asc_nulls_first(),
    ]
    w = Window.partitionBy("o_orderpriority").orderBy(*order_keys)
    w2 = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.nth_value(F.col("o_orderkey"), 3).over(w2).cast("bigint").alias(
            "third_key"
        ),
    )


# The recursive min-label closure: IDENTICAL SQL text runs on both engines
# (the one dialect-neutral recursion in the suite). Edges form a chain —
# each doc points at the NEXT larger id in its exact-duplicate group — so
# the recursion is acyclic (UNION ALL-safe in both engines) and label
# propagation walks real multi-step paths, unlike a clique where one hop
# would suffice.
_RECURSIVE_COMPONENTS_SQL = """
WITH RECURSIVE g AS (
    SELECT doc_id, md5(text) AS h FROM documents
),
edges AS (
    SELECT a.doc_id AS src, min(b.doc_id) AS dst
    FROM g a JOIN g b ON a.h = b.h AND b.doc_id > a.doc_id
    GROUP BY a.doc_id
),
r(node, reach) AS (
    SELECT doc_id, doc_id FROM g
    UNION ALL
    SELECT e.dst, r.reach FROM r JOIN edges e ON r.node = e.src
)
SELECT node AS doc_id, CAST(min(reach) AS BIGINT) AS component
FROM r GROUP BY node
"""


@workload("sql_recursive_components", oracle=_RECURSIVE_COMPONENTS_SQL)
def sql_recursive_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4): exact-dup components via chain-edge label
    propagation — the SAME SQL text executes on Spark and DuckDB. The
    DataFrame-API equivalent for unbounded-diameter graphs at scale is
    ``operators/graph.connected_components`` (checkpointed iteration);
    this is the SQL-surface form for bounded recursion."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_RECURSIVE_COMPONENTS_SQL)


@workload(
    "json_variant_extract",
    oracle="""
    SELECT event_id,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           TRY_CAST(json_extract_string(props, '$.missing') AS BIGINT)
               AS absent_val
    FROM events
    """,
)
def json_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT (Spark 4): parse the JSON column once into the binary
    variant encoding, then typed-path extraction — the modern form of
    get_json_object that avoids re-parsing per extracted field and keeps
    shredded access O(paths), not O(document). Missing paths yield NULL
    (lenient, matching the engine's cast policy)."""
    events = load(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    return events.select(
        "event_id",
        F.try_variant_get(v, "$.k", "bigint").alias("k_val"),
        F.try_variant_get(v, "$.missing", "bigint").alias("absent_val"),
    )


@workload(
    "sql_pipe_syntax",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n_rows,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4): the |> operator chain compiles to the
    IDENTICAL logical plan as the standard GROUP BY form the oracle uses —
    surface sugar, same Catalyst plan, same pushdown."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |> AGGREGATE count(*) AS n_rows,
                     CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                         AS sum_qty
           GROUP BY l_returnflag, l_linestatus
        """
    )


@workload(
    "funnel_view_click_purchase",
    oracle="""
    WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
          JOIN v ON v.user_id = e.user_id
          WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
          JOIN c ON c.user_id = e.user_id
          WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id)
    SELECT step, n_users FROM (
        SELECT 1 AS ord, 'view' AS step, CAST(count(*) AS BIGINT) AS n_users FROM v
        UNION ALL
        SELECT 2, 'view>click', CAST(count(*) AS BIGINT) FROM c
        UNION ALL
        SELECT 3, 'view>click>purchase', CAST(count(*) AS BIGINT) FROM p
    ) ORDER BY ord
    """,
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence funnel (view → click → purchase, strictly
    increasing timestamps): the product-analytics staple. Step k's
    earliest qualifying time is the min event time AFTER step k-1's —
    computed as k passes of filter+groupBy(user) joined on user_id, each
    reusing the same hash distribution; no per-user event collection, no
    window over the whole event stream, so a power user with millions of
    events costs one partial-aggregated key, not a task-sized array."""
    ev = load(spark, sf_dir, "events")

    def first_after(event_type: str, prev, prev_t: str, out_t: str):
        e = ev.filter(F.col("event_type") == event_type)
        if prev is None:
            return e.groupBy("user_id").agg(F.min("ts").alias(out_t))
        return (
            e.join(prev, "user_id")
            .filter(F.col("ts") > F.col(prev_t))
            .groupBy("user_id")
            .agg(F.min("ts").alias(out_t))
        )

    v = first_after("view", None, "", "t1")
    c = first_after("click", v, "t1", "t2")
    p = first_after("purchase", c, "t2", "t3")
    steps = [("view", v), ("view>click", c), ("view>click>purchase", p)]
    out = None
    for name, df in steps:
        row = df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(name).alias("step"), F.col("n_users").cast("bigint")
        )
        out = row if out is None else out.unionByName(row)
    return out


@workload(
    "cohort_weekly_retention",
    oracle="""
    WITH first_signup AS (
        SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    activity AS (
        SELECT f.cohort_week,
               CAST(datediff('day', f.cohort_week,
                             CAST(date_trunc('week', e.ts) AS DATE)) / 7
                    AS BIGINT) AS week_offset,
               e.user_id
        FROM events e JOIN first_signup f ON f.user_id = e.user_id
        WHERE e.ts >= f.cohort_week
    )
    SELECT cohort_week, week_offset,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM activity GROUP BY cohort_week, week_offset
    """,
)
def cohort_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users bucketed by their first-signup week,
    counted distinct in each subsequent activity week. Two shuffles, both
    on user_id (first-signup agg, then the activity join reuses the
    distribution); the final (cohort, offset) grid is tiny. date_trunc
    week starts Monday in both engines; the offset is exact integer
    day-arithmetic between week starts, so no cross-engine rounding."""
    ev = load(spark, sf_dir, "events")
    first_signup = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.to_date(F.date_trunc("week", F.min("ts"))).alias("cohort_week"))
    )
    activity = (
        ev.join(first_signup, "user_id")
        .filter(F.col("ts").cast("date") >= F.col("cohort_week"))
        .select(
            "cohort_week",
            (
                F.datediff(
                    F.to_date(F.date_trunc("week", F.col("ts"))),
                    F.col("cohort_week"),
                )
                / 7
            ).cast("bigint").alias("week_offset"),
            "user_id",
        )
    )
    return activity.groupBy("cohort_week", "week_offset").agg(
        F.countDistinct("user_id").alias("n_users")
    )


@workload(
    "profile_column_stats",
    oracle="""
    WITH s AS (
        SELECT count(*) AS n_rows,
               count(o_orderstatus)   AS nn1, count(DISTINCT o_orderstatus)   AS nd1,
               min(o_orderstatus)     AS mn1, max(o_orderstatus)              AS mx1,
               count(o_custkey)       AS nn2, count(DISTINCT o_custkey)       AS nd2,
               CAST(min(o_custkey) AS VARCHAR) AS mn2,
               CAST(max(o_custkey) AS VARCHAR) AS mx2,
               count(o_totalprice)    AS nn3, count(DISTINCT o_totalprice)    AS nd3,
               CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS mn3,
               CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS mx3,
               count(o_orderdate)     AS nn4, count(DISTINCT o_orderdate)     AS nd4,
               CAST(min(CAST(o_orderdate AS DATE)) AS VARCHAR) AS mn4,
               CAST(max(CAST(o_orderdate AS DATE)) AS VARCHAR) AS mx4,
               count(o_orderpriority) AS nn5, count(DISTINCT o_orderpriority) AS nd5,
               min(o_orderpriority)   AS mn5, max(o_orderpriority)            AS mx5
        FROM orders
    )
    SELECT 'o_orderstatus' AS col_name, n_rows, nn1 AS n_nonnull,
           nd1 AS n_distinct, mn1 AS min_str, mx1 AS max_str FROM s
    UNION ALL SELECT 'o_custkey', n_rows, nn2, nd2, mn2, mx2 FROM s
    UNION ALL SELECT 'o_totalprice', n_rows, nn3, nd3, mn3, mx3 FROM s
    UNION ALL SELECT 'o_orderdate', n_rows, nn4, nd4, mn4, mx4 FROM s
    UNION ALL SELECT 'o_orderpriority', n_rows, nn5, nd5, mn5, mx5 FROM s
    """,
)
def profile_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-scan table profiling (the ANALYZE-TABLE primitive): per-column
    non-null count, exact NDV, and canonical min/max strings for five
    orders columns, emitted long-form via stack(). All five exact
    count(DISTINCT)s run in ONE aggregate — Catalyst plans the standard
    Expand (one row per distinct-group per input row, factor 6) followed
    by two-level partial aggregation, so it stays a single scan + one
    shuffle. At 100 TB you'd swap exact NDV for approx_count_distinct
    (single-pass HLL, no Expand) and keep this exact form as the
    small-sample oracle — the bounded-error contract is already proven by
    `approx_distinct_error`. Min/max canonicalization (decimal(18,2) for
    doubles, DATE for timestamps, raw for strings/bigints) renders
    identically in Spark and DuckDB, so the whole profile value-hashes."""
    orders = load(spark, sf_dir, "orders")
    # canon must be a MONOTONIC recast of the column (decimal, date, or
    # identity) — min/max aggregate the typed value and only the RESULT
    # is rendered to string, matching the oracle's CAST(min(x) AS VARCHAR).
    specs = [
        ("o_orderstatus", F.col("o_orderstatus")),
        ("o_custkey", F.col("o_custkey")),
        ("o_totalprice", F.col("o_totalprice").cast("decimal(18,2)")),
        ("o_orderdate", F.to_date("o_orderdate")),
        ("o_orderpriority", F.col("o_orderpriority")),
    ]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for i, (name, canon) in enumerate(specs, start=1):
        aggs += [
            F.count(F.col(name)).alias(f"nn{i}"),
            F.countDistinct(F.col(name)).alias(f"nd{i}"),
            F.min(canon).cast("string").alias(f"mn{i}"),
            F.max(canon).cast("string").alias(f"mx{i}"),
        ]
    wide = orders.agg(*aggs)
    stack_args = ", ".join(
        f"'{name}', nn{i}, nd{i}, mn{i}, mx{i}"
        for i, (name, _) in enumerate(specs, start=1)
    )
    return wide.selectExpr(
        f"stack({len(specs)}, {stack_args}) AS "
        "(col_name, n_nonnull, n_distinct, min_str, max_str)",
        "n_rows",
    ).select("col_name", "n_rows", "n_nonnull", "n_distinct", "min_str", "max_str")


@workload(
    "basket_brand_pairs",
    oracle="""
    WITH items AS (
        SELECT DISTINCT l_orderkey, p_brand
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE l_orderkey IS NOT NULL
    ),
    nb AS (SELECT count(DISTINCT l_orderkey) AS n_baskets FROM items),
    freq AS (
        SELECT p_brand FROM items GROUP BY p_brand
        HAVING count(*) * 100 >= (SELECT n_baskets FROM nb)
    ),
    pruned AS (SELECT i.* FROM items i JOIN freq USING (p_brand))
    SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
           CAST(count(*) AS BIGINT) AS pair_support
    FROM pruned a JOIN pruned b
      ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
    GROUP BY 1, 2
    HAVING count(*) * 100 >= (SELECT n_baskets FROM nb)
    """,
)
def basket_brand_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket frequent-pair mining (apriori-pruned co-occurrence):
    brand pairs appearing together in >= 1% of order baskets. The scale
    shape: (1) the item->brand dimension broadcasts; (2) ONE orderkey
    aggregate turns items into sorted distinct-brand basket arrays
    (collect_set dedupes in the same pass — no separate item-level
    distinct shuffle); basket count and brand support derive from the
    persisted basket relation; (3) apriori prune — a pair can only be
    frequent if BOTH items are — applies MAP-SIDE as an array_intersect
    with the 1-row frequent-brand array (brand domain is dimension-
    bounded) BEFORE any pair is generated; (4) pairs are generated
    MAP-SIDE per basket (slice/transform/flatten HOFs — C(k,2) per
    basket, k bounded by basket size), never via a row-level self-join
    shuffle; the only shuffles are the basket groupBy, the tiny exploded
    brand-support agg, and the pair-count agg. Support thresholds compare
    as exact integers (support*100 >= n_baskets) so both engines cut
    identically; the oracle replays the semantics with the classic
    self-join formulation. NULL order keys are filtered explicitly
    (Spark's groupBy would pool them into one giant pseudo-basket; SQL's
    equi-join drops them) — documented 3VL seam."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # r12 (§2.3/§2.4): ONE basket shuffle instead of three item-level
    # passes. collect_set dedupes brands within a basket by itself, so
    # the former distinct-(order, brand) shuffle + brand-support pass +
    # prune-join + SECOND orderkey groupBy collapse into one orderkey
    # aggregate; basket count and brand support then derive from the
    # persisted basket-sized relation (one row per order, not one per
    # item), and the apriori prune applies MAP-SIDE as an array_intersect
    # with the 1-row frequent-brand array (brand domain is dimension-
    # bounded, so the array broadcast is safe at any fact-table scale).
    baskets = (
        li.filter(F.col("l_orderkey").isNotNull())
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("p_brand")).alias("brands"))
        .select("brands")
        .persist()
    )
    n_baskets = baskets.select(F.count(F.lit(1)).alias("n_baskets"))
    frequent = (
        baskets.select(F.explode("brands").alias("p_brand"))
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("brand_support"))
        .crossJoin(F.broadcast(n_baskets))
        .filter(F.col("brand_support") * 100 >= F.col("n_baskets"))
        .agg(F.array_sort(F.collect_list("p_brand")).alias("freq_brands"))
    )
    pruned = baskets.crossJoin(F.broadcast(frequent)).select(
        F.array_intersect(F.col("brands"), F.col("freq_brands")).alias("brands")
    )
    pairs = pruned.select(
        F.explode(
            F.expr(
                "flatten(transform(brands, (x, i) -> "
                "transform(slice(brands, i + 2, size(brands)), "
                "y -> struct(x AS brand_a, y AS brand_b))))"
            )
        ).alias("p")
    ).select("p.brand_a", "p.brand_b")
    return (
        pairs.groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("pair_support"))
        .crossJoin(F.broadcast(n_baskets))
        .filter(F.col("pair_support") * 100 >= F.col("n_baskets"))
        .select("brand_a", "brand_b", "pair_support")
    )


@workload(
    "regression_ship_price_trend",
    oracle="""
    WITH pts AS (
        SELECT l_returnflag AS flag,
               CAST(CAST(l_shipdate AS DATE) - DATE '1992-01-01' AS BIGINT) AS x,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM lineitem
        WHERE l_returnflag IS NOT NULL AND l_shipdate IS NOT NULL
          AND l_extendedprice IS NOT NULL AND abs(l_extendedprice) < 1e12
    ),
    s AS (
        SELECT flag,
               CAST(count(*) AS BIGINT) AS n,
               sum(CAST(x AS DECIMAL(18,0))) AS sx,
               sum(CAST(x AS DECIMAL(18,0)) * CAST(x AS DECIMAL(18,0))) AS sxx,
               sum(CAST(cents AS DECIMAL(18,0))) AS sy,
               sum(CAST(cents AS DECIMAL(18,0)) * CAST(cents AS DECIMAL(18,0))) AS syy,
               sum(CAST(x AS DECIMAL(18,0)) * CAST(cents AS DECIMAL(18,0))) AS sxy
        FROM pts GROUP BY flag
    )
    SELECT flag, n,
           CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
                THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) + 0.0
           END AS slope_cents_per_day,
           CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                     * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
                THEN ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                      * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
                     / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) + 0.0
           END AS r_squared
    FROM s
    """,
)
def regression_ship_price_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ordinary-least-squares trend (does extended price drift
    over ship date?) computed from EXACT sufficient statistics: x = days
    since 1992-01-01 (integer), y = price in integer cents, and the five
    sums (Σx, Σx², Σy, Σy², Σxy) accumulated in DECIMAL — so the
    distributed aggregation is order-insensitive and the ONLY floating
    point is the final closed-form division, written with the identical
    expression tree in both engines (deterministic IEEE, no regr_slope
    merge-order seam — the reason this does not use the built-in
    regr_* aggregates, whose one-pass covariance update is
    partition-order-dependent in a parallel engine).

    Scale: one map-side-combined groupBy over three keys; the sufficient-
    statistics pattern is how any moment-based model (OLS, variance,
    covariance matrices) should aggregate at 100 TB — exact partials that
    merge associatively, floats only at the driver-sized end. Zero-
    variance groups yield NULL slope/r² via the explicit positive-
    denominator guard on both sides; `+ 0.0` folds a potential -0.0.
    """
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isNotNull()
        & F.col("l_shipdate").isNotNull()
        & F.col("l_extendedprice").isNotNull()
        & (F.abs(F.col("l_extendedprice")) < 1e12)
    )
    d18 = "decimal(18,0)"
    pts = li.select(
        F.col("l_returnflag").alias("flag"),
        F.datediff(F.to_date("l_shipdate"), F.lit("1992-01-01"))
        .cast("bigint")
        .alias("x"),
        (F.col("l_extendedprice").cast(_D2) * 100).cast("bigint").alias("cents"),
    )
    s = pts.groupBy("flag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("x").cast(d18)).alias("sx"),
        F.sum(F.col("x").cast(d18) * F.col("x").cast(d18)).alias("sxx"),
        F.sum(F.col("cents").cast(d18)).alias("sy"),
        F.sum(F.col("cents").cast(d18) * F.col("cents").cast(d18)).alias("syy"),
        F.sum(F.col("x").cast(d18) * F.col("cents").cast(d18)).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sxd, sxxd = F.col("sx").cast("double"), F.col("sxx").cast("double")
    syd, syyd = F.col("sy").cast("double"), F.col("syy").cast("double")
    sxyd = F.col("sxy").cast("double")
    dxx = nd * sxxd - sxd * sxd
    dyy = nd * syyd - syd * syd
    cov = nd * sxyd - sxd * syd
    return s.select(
        "flag",
        "n",
        F.when(dxx > 0, cov / dxx + 0.0).alias("slope_cents_per_day"),
        F.when(dxx * dyy > 0, (cov * cov) / (dxx * dyy) + 0.0).alias("r_squared"),
    )


@workload(
    "gaps_missing_event_ids",
    oracle="""
    WITH k AS (
        SELECT DISTINCT event_id AS k FROM events
        WHERE event_id IS NOT NULL AND event_type = 'purchase'
    ),
    nx AS (SELECT k, lead(k) OVER (ORDER BY k) AS nk FROM k)
    SELECT k + 1 AS gap_start, nk - 1 AS gap_end, nk - k - 1 AS n_missing
    FROM nx WHERE nk - k > 1
    """,
)
def gaps_missing_event_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ID-space gap detection: the maximal runs of event_id values
    absent from the purchase feed (purchases are ~20% of events, so the
    id space is gap-dense) — the completeness audit an ingest pipeline
    runs over a sequence-keyed replication stream (reference analogue:
    the daily-window completeness concern of rqtradein_etl.py's
    incremental fetch). The oracle is the textbook
    `lead() OVER (ORDER BY k)`, which on Spark would plan a ONE-TASK
    window; the engine instead runs the TWO-LEVEL decomposition of a
    distributed lag/lead:

    1. keys bucket by ``k div 1000`` — lead() within each bucket is an
       ordinary partitioned window (parallel, no skew: buckets are
       fixed-width ID ranges);
    2. only the per-bucket min summary — |id range|/1000 rows —
       crosses a small ordered window to stitch boundaries: each
       bucket-max key's successor is the NEXT NON-EMPTY bucket's min.
       At 100 TB the summary is 3–5 orders of magnitude smaller than the
       keys (size the bucket width so it stays single-task-scale, or
       recurse the same decomposition once more).

    Integer-only output (gap bounds inclusive, plus run length), so the
    match is exact.
    """
    keys = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_id").isNotNull() & (F.col("event_type") == "purchase"))
        .select(F.col("event_id").alias("k"))
        .distinct()
        .withColumn("bkt", F.expr("k div 1000"))
    )
    in_bucket = keys.withColumn(
        "nk_in",
        F.lead("k").over(Window.partitionBy("bkt").orderBy("k")),
    )
    summary = keys.groupBy("bkt").agg(F.min("k").alias("bmin"))
    next_min = summary.withColumn(
        "next_bmin", F.lead("bmin").over(Window.orderBy("bkt"))
    ).select("bkt", "next_bmin")
    stitched = in_bucket.join(F.broadcast(next_min), "bkt").select(
        "k", F.coalesce("nk_in", "next_bmin").alias("nk")
    )
    return stitched.filter((F.col("nk") - F.col("k")) > 1).select(
        (F.col("k") + 1).alias("gap_start"),
        (F.col("nk") - 1).alias("gap_end"),
        (F.col("nk") - F.col("k") - 1).alias("n_missing"),
    )


@workload(
    "weighted_median_price",
    oracle="""
    WITH pts AS (
        SELECT l_returnflag AS flag,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents,
               CAST(l_quantity AS BIGINT) AS w
        FROM lineitem
        WHERE l_returnflag IS NOT NULL
          AND l_extendedprice IS NOT NULL AND abs(l_extendedprice) < 1e12
          AND NOT isnan(l_extendedprice)
          AND l_quantity IS NOT NULL AND NOT isnan(l_quantity)
          AND l_quantity >= 1 AND l_quantity < 1e9
    ),
    tied AS (SELECT flag, cents, sum(w) AS w FROM pts GROUP BY flag, cents),
    cum AS (
        SELECT flag, cents, w,
               sum(w) OVER (PARTITION BY flag ORDER BY cents
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cw,
               sum(w) OVER (PARTITION BY flag) AS tot
        FROM tied
    )
    SELECT flag, CAST(min(cents) AS DOUBLE) / 100.0 AS median_price,
           CAST(max(tot) AS BIGINT) AS total_weight
    FROM cum WHERE 2 * cw >= tot GROUP BY flag
    """,
)
def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact WEIGHTED median (lower weighted median: the smallest value
    whose cumulative weight reaches half the total) of extended price
    per return flag, weighted by quantity — the robust-statistics
    aggregate percentile_cont can't express.

    Exactness: prices become integer cents, weights integer units, ties
    COLLAPSE FIRST (groupBy (flag, cents) — the running window then
    scans distinct values, not rows), and the median pick is pure
    integer comparison `2·cumw ≥ total` — no interpolation, no float
    ordering. Scale: both windows partition by flag (no global window);
    the tie-collapse is a map-side-combinable aggregate that bounds the
    window input by value cardinality. NaN/NULL/absurd values are
    filtered identically on both sides (ANSI casts crash on NaN — the
    guard is load-bearing, not cosmetic).
    """
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isNotNull()
        & F.col("l_extendedprice").isNotNull()
        & (F.abs(F.col("l_extendedprice")) < 1e12)
        & ~F.isnan(F.col("l_extendedprice"))
        & F.col("l_quantity").isNotNull()
        & ~F.isnan(F.col("l_quantity"))
        & (F.col("l_quantity") >= 1)
        & (F.col("l_quantity") < 1e9)
    )
    pts = li.select(
        F.col("l_returnflag").alias("flag"),
        (F.col("l_extendedprice").cast(_D2) * 100).cast("bigint").alias("cents"),
        F.col("l_quantity").cast("bigint").alias("w"),
    )
    tied = pts.groupBy("flag", "cents").agg(F.sum("w").alias("w"))
    wflag = Window.partitionBy("flag")
    cum = tied.select(
        "flag",
        "cents",
        F.sum("w")
        .over(wflag.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0))
        .alias("cw"),
        F.sum("w").over(wflag).alias("tot"),
    )
    return (
        cum.filter(2 * F.col("cw") >= F.col("tot"))
        .groupBy("flag")
        .agg(
            (F.min("cents").cast("double") / 100.0).alias("median_price"),
            F.max("tot").cast("bigint").alias("total_weight"),
        )
    )


@workload(
    "running_total_global_scan",
    oracle="""
    WITH o AS (
        SELECT o_orderkey, o_orderdate,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM orders
        WHERE o_orderkey IS NOT NULL AND o_orderdate IS NOT NULL
          AND o_totalprice IS NOT NULL AND NOT isnan(o_totalprice)
          AND abs(o_totalprice) < 1e12
    )
    SELECT o_orderkey, o_orderdate,
           CAST(sum(cents) OVER (ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_revenue_cents
    FROM o
    """,
)
def running_total_global_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative revenue over EVERY order in date order — a running sum
    whose window has no PARTITION BY, i.e. the query class where the
    naive plan is a ONE-TASK global sort-window. The engine runs
    ``operators/scan.bucketed_running_sum``: per-64-day-bucket windows
    fully parallel, one tiny ordered window over the |buckets|-row
    summary for the carry-ins, broadcast back. Money in integer cents so
    the distributed re-association is exact; (o_orderdate, o_orderkey) is
    a total order; NaN/absurd guards mirror the oracle (ANSI cast
    crashes on NaN)."""
    from ..operators.scan import bucketed_running_sum

    o = (
        load(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderkey").isNotNull()
            & F.col("o_orderdate").isNotNull()
            & F.col("o_totalprice").isNotNull()
            & ~F.isnan(F.col("o_totalprice"))
            & (F.abs(F.col("o_totalprice")) < 1e12)
        )
        .select(
            "o_orderkey",
            "o_orderdate",
            (F.col("o_totalprice").cast(_D2) * 100).cast("bigint").alias("cents"),
        )
    )
    day = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1990-01-01").cast("date"))
    scanned = bucketed_running_sum(
        o,
        bucket=((day - F.pmod(day, F.lit(64))) / 64).cast("bigint"),
        order_by=[F.col("o_orderdate"), F.col("o_orderkey")],
        value=F.col("cents"),
        out_col="cum_revenue_cents",
    )
    return scanned.select("o_orderkey", "o_orderdate", "cum_revenue_cents")


@workload(
    "concurrency_peak_daily",
    oracle="""
    WITH ev AS (
        SELECT user_id, event_id, ts FROM events
        WHERE user_id IS NOT NULL AND event_id IS NOT NULL AND ts IS NOT NULL
    ),
    flagged AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_s,
               event_id
        FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, ts,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM flagged
    ),
    sess AS (
        SELECT user_id, sid, min(ts) AS s_start, max(ts) AS s_end
        FROM numbered GROUP BY user_id, sid
    ),
    sweep AS (
        SELECT user_id, s_start, s_start AS ts, 1 AS delta FROM sess
        UNION ALL
        SELECT user_id, s_start, s_end AS ts, -1 AS delta FROM sess
    ),
    run AS (
        SELECT ts,
               sum(delta) OVER (ORDER BY ts, delta DESC, user_id, s_start
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
        FROM sweep
    )
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           CAST(max(conc) AS BIGINT) AS peak_concurrency
    FROM run GROUP BY 1
    """,
)
def concurrency_peak_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak number of SIMULTANEOUSLY open sessions per day — the
    interval-overlap maximum (room occupancy / concurrent connections),
    computed as a sweep line: sessionize (30-min gap), emit +1 at session
    start and −1 at session end, running-sum the deltas over the global
    time order, max per day. The global running sum is the one-task-
    window trap again — ``operators/scan.bucketed_running_sum`` keys the
    in-bucket windows by calendar day (the summary is |days| rows).
    Overlap is INCLUSIVE at the instant boundary: +1 sorts before −1 at
    equal ts (delta DESC), so back-to-back touching sessions count as
    concurrent; (ts, delta, user_id, s_start) is a total order because a
    session contributes exactly one +1 and one −1. All-integer deltas —
    exact in any association."""
    from ..operators.scan import bucketed_running_sum

    ev = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & F.col("event_id").isNotNull()
        & F.col("ts").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    new_s = F.when(
        prev_ts.isNull() | ((F.col("ts") - prev_ts) > F.expr("INTERVAL 30 MINUTES")),
        1,
    ).otherwise(0)
    numbered = ev.select(
        "user_id",
        "ts",
        F.sum(new_s).over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("sid"),
    )
    sess = numbered.groupBy("user_id", "sid").agg(
        F.min("ts").alias("s_start"), F.max("ts").alias("s_end")
    )
    sweep = sess.select(
        "user_id", "s_start", F.col("s_start").alias("ts"), F.lit(1).alias("delta")
    ).unionByName(
        sess.select(
            "user_id", "s_start", F.col("s_end").alias("ts"), F.lit(-1).alias("delta")
        )
    )
    run = bucketed_running_sum(
        sweep,
        bucket=F.to_date("ts"),
        order_by=[
            F.col("ts"),
            F.col("delta").desc(),
            F.col("user_id"),
            F.col("s_start"),
        ],
        value=F.col("delta"),
        out_col="conc",
    )
    return run.groupBy(F.to_date("ts").alias("day")).agg(
        F.max("conc").cast("bigint").alias("peak_concurrency")
    )


@workload(
    "global_median_twophase",
    oracle="""
    WITH pts AS (
        SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
            AS cents
        FROM lineitem
        WHERE l_extendedprice IS NOT NULL AND NOT isnan(l_extendedprice)
          AND abs(l_extendedprice) < 1e12
    ),
    nn AS (SELECT count(*) AS n FROM pts)
    SELECT
        (SELECT cents FROM pts ORDER BY cents
         LIMIT 1 OFFSET (SELECT (n + 1) // 2 FROM nn) - 1) AS median_cents,
        (SELECT CAST(n AS BIGINT) FROM nn) AS n_rows
    """,
)
def global_median_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT global median (lower median: the ⌈n/2⌉-th smallest) of
    extendedprice over ALL lineitems — the distributed SELECTION problem.
    A naive exact median sorts the whole relation (one-task window or a
    full range sort for one value); the two-phase plan never sorts data:

    1. histogram pass: count per 65536-cent bucket — one
       map-side-combinable aggregate; the driver receives only the
       ≤ |value range|/65536 bucket counts (bounded scalars for any row
       count, since the PRICE RANGE, not the data, fixes the bucket
       count) and locates the bucket containing rank ⌈n/2⌉;
    2. refine pass: only that bucket's rows (≈ n/buckets) are re-counted
       per distinct value and a tiny ordered window finds the first
       value whose in-bucket cumulative count reaches the residual rank.

    Recursing step 2 handles a pathological all-one-bucket distribution.
    Integer cents ⇒ exact; the oracle is the literal ORDER BY/OFFSET
    definition."""
    pts = (
        load(spark, sf_dir, "lineitem")
        .filter(
            F.col("l_extendedprice").isNotNull()
            & ~F.isnan(F.col("l_extendedprice"))
            & (F.abs(F.col("l_extendedprice")) < 1e12)
        )
        .select(
            (F.col("l_extendedprice").cast(_D2) * 100)
            .cast("bigint")
            .alias("cents")
        )
        .persist()
    )
    hist = sorted(
        (r["b"], r["c"])
        for r in pts.groupBy(F.expr("cents div 65536").alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    n = sum(c for _, c in hist)
    if n == 0:
        pts.unpersist()
        return spark.createDataFrame([], "median_cents bigint, n_rows bigint")
    k = (n + 1) // 2
    cum = 0
    for b_star, c in hist:
        if cum + c >= k:
            break
        cum += c
    local_k = k - cum
    wb = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    med = (
        pts.filter(F.expr("cents div 65536") == b_star)
        .groupBy("cents")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("cum", F.sum("c").over(wb))
        .filter(F.col("cum") >= local_k)
        .orderBy("cents")
        .limit(1)
        .select(
            F.col("cents").alias("median_cents"),
            F.lit(n).cast("bigint").alias("n_rows"),
        )
    )
    return med


@workload(
    "histogram_equidepth_price",
    oracle="""
    WITH pts AS (
        SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
            AS cents
        FROM lineitem
        WHERE l_extendedprice IS NOT NULL AND NOT isnan(l_extendedprice)
          AND abs(l_extendedprice) < 1e12
    ),
    t AS (SELECT cents, ntile(16) OVER (ORDER BY cents) AS bucket FROM pts)
    SELECT CAST(bucket AS INT) AS bucket, count(*) AS n_rows,
           min(cents) AS lo_cents, max(cents) AS hi_cents
    FROM t GROUP BY bucket
    """,
)
def histogram_equidepth_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EQUI-DEPTH (quantile) histogram of extendedprice: 16 buckets of
    equal row count with exact boundaries — what an optimizer's
    statistics collector or a data-profiling pass computes. The oracle's
    `ntile(16) OVER (ORDER BY cents)` is the one-task global sort;
    the engine runs `operators/ranking.distributed_ntile` (range
    partition → per-partition row_number → partition-count offsets).
    Ordering by cents alone is NOT total — but rows with equal cents are
    interchangeable, so each bucket's (count, min, max) over CENTS is
    determined by the sorted multiset alone and both engines agree
    exactly."""
    from ..operators.ranking import distributed_ntile

    pts = (
        load(spark, sf_dir, "lineitem")
        .filter(
            F.col("l_extendedprice").isNotNull()
            & ~F.isnan(F.col("l_extendedprice"))
            & (F.abs(F.col("l_extendedprice")) < 1e12)
        )
        .select(
            (F.col("l_extendedprice").cast(_D2) * 100)
            .cast("bigint")
            .alias("cents")
        )
    )
    binned = distributed_ntile(pts, [F.col("cents")], 16, "bucket")
    return binned.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("cents").alias("lo_cents"),
        F.max("cents").alias("hi_cents"),
    )


@workload(
    "session_seconds_per_day",
    oracle="""
    WITH ev AS (
        SELECT user_id, event_id, ts FROM events
        WHERE user_id IS NOT NULL AND event_id IS NOT NULL AND ts IS NOT NULL
    ),
    flagged AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_s,
               event_id
        FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, ts,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM flagged
    ),
    sess AS (
        SELECT user_id, sid, min(ts) AS s_start, max(ts) AS s_end
        FROM numbered GROUP BY user_id, sid
    ),
    segs AS (
        SELECT s.user_id, s.s_start, s.s_end,
               UNNEST(generate_series(CAST(s.s_start AS DATE),
                                      CAST(s.s_end AS DATE),
                                      INTERVAL 1 DAY)) AS day
        FROM sess s
    )
    SELECT CAST(day AS DATE) AS day,
           CAST(sum(
               epoch_us(least(s_end, CAST(day AS TIMESTAMP) + INTERVAL 1 DAY))
               - epoch_us(greatest(s_start, CAST(day AS TIMESTAMP)))
           ) AS BIGINT) AS session_micros,
           count(*) AS n_session_days
    FROM segs GROUP BY 1
    """,
)
def session_seconds_per_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-in-state per calendar day: total session-open microseconds
    attributed to each day — the interval-SPLIT aggregation (billing,
    SLA accounting, occupancy integrals). Sessions crossing midnight are
    EXPLODED into one row per overlapped day (``sequence`` of days — a
    session spans few days, so the expansion is bounded) and each
    segment contributes its clamped [max(start, day), min(end, day+1))
    overlap. Microsecond integers end to end — exact; the day split is
    pure map-side after the one sessionize exchange."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & F.col("event_id").isNotNull()
        & F.col("ts").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    new_s = F.when(
        prev_ts.isNull() | ((F.col("ts") - prev_ts) > F.expr("INTERVAL 30 MINUTES")),
        1,
    ).otherwise(0)
    numbered = ev.select(
        "user_id",
        "ts",
        F.sum(new_s).over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("sid"),
    )
    sess = numbered.groupBy("user_id", "sid").agg(
        F.min("ts").alias("s_start"), F.max("ts").alias("s_end")
    )
    segs = sess.select(
        "s_start",
        "s_end",
        F.explode(
            F.sequence(F.to_date("s_start"), F.to_date("s_end"))
        ).alias("day"),
    )
    day_start = F.col("day").cast("timestamp")
    day_end = F.col("day").cast("timestamp") + F.expr("INTERVAL 1 DAY")
    return segs.groupBy("day").agg(
        F.sum(
            F.unix_micros(F.least(F.col("s_end"), day_end))
            - F.unix_micros(F.greatest(F.col("s_start"), day_start))
        )
        .cast("bigint")
        .alias("session_micros"),
        F.count(F.lit(1)).alias("n_session_days"),
    )
