"""TPC-H family completion: the remaining classic decision-support query
shapes expressible over the testdata star schema (SURVEY.md §2.1 joins /
aggregation / subquery checklist, widened to the full canonical suite).

Covered here: Q2 (min-cost supplier, correlated per-group MIN),
Q4 (EXISTS), Q6 (selective scan-agg), Q7 (two-nation
volume, symmetric disjunctive pair filter), Q8 (market share, two-role
nation), Q9 (profit roll-up), Q10 (top-k returned-item revenue),
Q11 (important stock, fraction-of-total scalar subquery),
Q12 (conditional priority counts), Q13 (left-outer order-count
distribution, agg-of-agg), Q14 (promo ratio), Q15 (scalar-max
top supplier), Q16 (distinct-supplier counts with exclusion), Q17
(correlated avg subquery), Q18 (large-volume customers,
aggregate-then-join), Q19 (disjunctive pushdown), Q20 (excess-stock
suppliers, nested semi-join chain), Q21 (waiting suppliers, EXISTS +
NOT EXISTS self-joins), Q22 (dormant customers, scalar avg + anti
join). With Q1/Q3/Q5 in relational.py, all 22 canonical shapes are
registered.

The testdata schema is TPC-H-ish but trimmed — no ``partsupp`` table and
no ``l_commitdate``/``l_receiptdate``/``l_shipmode``/``p_container``/
``c_phone`` columns — so shapes that depend on them are adapted, keeping
the *plan shape* (the thing that matters for engine coverage) intact:

- Q2/Q11/Q20 (partsupp-centric) run against a **pseudo-partsupp derived
  from lineitem**: one aggregate per distinct ``(l_partkey, l_suppkey)``
  pair with ``ps_supplycost = min(l_extendedprice)`` and
  ``ps_availqty = sum(l_quantity)`` (Q20 uses returned quantity — see its
  docstring), both exact DECIMAL so every downstream comparison is
  bit-identical across engines. The derivation is itself the missing
  table's construction, so each query pays one extra
  groupBy(part, supp) shuffle the spec's versions don't have — a fair
  trade for keeping the three canonical plan shapes (correlated
  per-group MIN join-back, fraction-of-total scalar subquery, nested
  semi-join chain) in the suite.
- "late shipment" (Q4/Q12/Q21's commit-vs-receipt lag) becomes a
  shipdate-vs-orderdate lag, which preserves the compound join predicate
  referencing both sides.
- Q22's phone country code becomes ``c_custkey % 10``.

Float determinism follows the module-wide rule (relational.py header):
money sums in DECIMAL, divide/compare only on already-exact doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load, workload
from .relational import _ONE, _REVENUE_SQL, _dec2, _revenue

_D4 = "decimal(18,4)"


@workload(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS with a compound correlated predicate (key
    equality + inequality referencing BOTH relations) → left-semi join.
    The quarter filter prunes the orders scan before the semi join; the
    lineitem side needs no filter because the predicate is join-local."""
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01 00:00:00"))
        & (F.col("o_orderdate") < F.lit("1997-10-01 00:00:00"))
    )
    li = load(spark, sf_dir, "lineitem")
    late = (li.l_orderkey == orders.o_orderkey) & (
        li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 30 DAYS")
    )
    return (
        orders.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@workload(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                         * CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount >= 0.02 AND l_discount <= 0.06
      AND l_quantity < 10
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan→filter→agg, zero joins. The point of this shape
    is pushdown: all three predicates reach the parquet scan (PushedFilters)
    and only 3 columns are read (ReadSchema) — the plan is a single
    WholeStageCodegen span with a 1-row partial+final agg."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 10)
        )
        .agg(
            F.sum((_dec2("l_extendedprice") * _dec2("l_discount")).cast(_D4))
            .cast("double")
            .alias("revenue")
        )
    )


@workload(
    "q8_market_share",
    oracle=f"""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(CAST(sum(CASE WHEN sn.n_name = 'NATION_7' THEN {_REVENUE_SQL}
                              ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                / CAST(sum({_REVENUE_SQL}) AS DOUBLE) AS DOUBLE) AS mkt_share
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation cn ON cn.n_nationkey = c_nationkey
    JOIN region   ON r_regionkey = cn.n_regionkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation sn ON sn.n_nationkey = s_nationkey
    WHERE r_name = 'ASIA' AND p_type = 'PROMO'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY year(o_orderdate)
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: national market share — an 8-way star join where the
    nation dimension plays two roles (customer region gate, supplier
    nationality tag) and the measure is a conditional-sum ratio. Every
    dimension broadcasts; the one shuffle is orders⋈lineitem. The ratio
    divides two exact DECIMAL sums in double, so it hash-matches DuckDB."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00"))
    )
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cn = nat.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = nat.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = _revenue()
    zero = F.lit(0).cast(_D4)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), cust.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_region") == region.r_regionkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), supp.s_nationkey == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == "NATION_7", vol).otherwise(zero))
                .cast("double")
                / F.sum(vol).cast("double")
            )
            .cast("double")
            .alias("mkt_share")
        )
    )


@workload(
    "q9_product_profit",
    oracle=f"""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(sum(CAST({_REVENUE_SQL}
                         - CAST(CAST(p_retailprice AS DECIMAL(18,2))
                                * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(18,4))
                         AS DECIMAL(18,4))) AS DOUBLE) AS profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    JOIN orders   ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%widget%'
    GROUP BY n_name, year(o_orderdate)
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: product-type profit rolled up by supplier nation ×
    order year. Adapted: the testdata has no partsupp, so unit cost is
    ``p_retailprice × l_quantity`` instead of ``ps_supplycost × l_quantity``
    — same expression tree (revenue minus a part-priced cost), same joins
    minus the partsupp edge. LIKE-filtered part broadcasts."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    supp = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders")
    cost = (_dec2("p_retailprice") * _dec2("l_quantity")).cast(_D4)
    profit = (_revenue() - cost).cast(_D4)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("profit"))
    )


@workload(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, CAST(sum({_REVENUE_SQL}) AS DOUBLE) AS revenue,
           c_acctbal + 0.0 AS c_acctbal, n_name
    FROM customer
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON n_nationkey = c_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by lost (returned) revenue in a quarter.
    Global top-k: Spark plans orderBy+limit as TakeOrderedAndProject —
    per-partition top-20 then a single 20-row merge on the driver, never a
    full sort shuffle. ``c_custkey`` tiebreaks revenue ties so the LIMIT
    frontier is deterministic in both engines."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nat = load(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            # +0.0 folds IEEE negative zero into 0.0: Spark's group-key
            # NormalizeFloatingNumbers already rewrote -0.0 on this side,
            # DuckDB emits the raw key (float-audit finding).
            (F.col("c_acctbal") + 0.0).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@workload(
    "q12_late_shipment_priority",
    oracle="""
    SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 45 DAY
                THEN 'late' ELSE 'ontime' END AS ship_class,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY CASE WHEN l_shipdate > o_orderdate + INTERVAL 45 DAY
                  THEN 'late' ELSE 'ontime' END
    """,
)
def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + conditional aggregation (priority split per
    class). Adapted: no l_shipmode/l_commitdate in the testdata, so the
    grouping class is the shipdate-vs-orderdate lag bucket — the grouping
    key is still a derived expression over the joined row, the measures
    still CASE-sums."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ship_class = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS"),
        F.lit("late"),
    ).otherwise(F.lit("ontime"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(ship_class.alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


@workload(
    "q14_promo_revenue",
    oracle=f"""
    SELECT CAST(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN {_REVENUE_SQL}
                                      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                / CAST(sum({_REVENUE_SQL}) AS DOUBLE) AS DOUBLE) AS promo_revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promotion revenue share for one month — broadcast part
    join, conditional-sum ratio, single output row. The month predicate is
    pushed to the lineitem scan; part broadcasts unfiltered (the CASE needs
    every part's type)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01 00:00:00"))
        & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00"))
    )
    part = load(spark, sf_dir, "part")
    vol = _revenue()
    zero = F.lit(0).cast(_D4)
    return li.join(F.broadcast(part), li.l_partkey == part.p_partkey).agg(
        (
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(zero)).cast(
                "double"
            )
            / F.sum(vol).cast("double")
        )
        .cast("double")
        .alias("promo_revenue")
    )


_Q15_REV_SQL = f"""
    SELECT l_suppkey AS supplier_no,
           sum({_REVENUE_SQL}) AS total_rev
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-10-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_suppkey
"""


@workload(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS ({_Q15_REV_SQL})
    SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT max(total_rev) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue — a scalar
    MAX subquery over a derived aggregate. The aggregate is computed ONCE
    and persisted; the 1-row max broadcasts back onto it (no second scan,
    no unpartitioned window). DECIMAL equality against the max is exact, so
    ties surface every argmax row, identically in both engines."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-10-01 00:00:00"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00"))
    )
    supp = load(spark, sf_dir, "supplier")
    srev = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_revenue()).alias("total_rev"))
        .persist()
    )
    mx = srev.agg(F.max("total_rev").alias("mx"))
    return (
        srev.join(F.broadcast(mx), srev.total_rev == F.col("mx"))
        .join(F.broadcast(supp), F.col("supplier_no") == supp.s_suppkey)
        .select(
            "s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_revenue")
        )
    )


@workload(
    "q16_part_supplier_counts",
    oracle="""
    SELECT p_brand, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 100)
    GROUP BY p_brand, p_size
    """,
)
def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers serve each surviving
    (brand, size) bucket, excluding a supplier denylist. Adapted: the
    part↔supplier relation comes from lineitem (no partsupp table), and the
    denylist predicate is an acctbal floor (no s_comment column). The NOT IN
    becomes a left-anti broadcast join — safe here because s_suppkey is
    never NULL (NOT IN's NULL trap doesn't arise)."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    bad_supp = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 100)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(bad_supp), li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@workload(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
                AS DOUBLE) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#13'
      AND l_quantity < (
          SELECT 0.2 * (CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                        / count(*))
          FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: small-quantity-order revenue — a correlated scalar AVG
    subquery per part. Expressed as the plan Catalyst would decorrelate it
    into anyway: one per-part aggregate over lineitem (exact decimal sum ÷
    count, so the 0.2·avg threshold is bit-identical in DuckDB), joined
    back and filtered. Only the per-part agg and its join-back shuffle on
    l_partkey; the brand dimension broadcasts."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13")
    thresholds = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (
            F.lit(0.2)
            * (F.sum(_dec2("l_quantity")).cast("double") / F.count(F.lit(1)))
        ).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(thresholds, li.l_partkey == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (F.sum(_dec2("l_extendedprice")).cast("double") / F.lit(7.0))
            .cast("double")
            .alias("avg_yearly")
        )
    )


@workload(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT CAST(sum({_REVENUE_SQL}) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#24' AND p_size BETWEEN 16 AND 30
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#7' AND p_size BETWEEN 31 AND 50
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: OR-of-ANDs over a join — the classic disjunctive-
    pushdown stressor. Catalyst extracts the common l_quantity ∈ [1,30]
    and p_size ∈ [1,50] envelopes below the join while keeping the full
    disjunction as the post-join filter; part broadcasts."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    disj = (
        ((b == "Brand#12") & s.between(1, 15) & (q >= 1) & (q <= 11))
        | ((b == "Brand#24") & s.between(16, 30) & (q >= 10) & (q <= 20))
        | ((b == "Brand#7") & s.between(31, 50) & (q >= 20) & (q <= 30))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(disj)
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
    )


@workload(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN nation ON n_nationkey = s_nationkey
    JOIN (SELECT DISTINCT l_orderkey, l_suppkey
          FROM lineitem JOIN orders ON o_orderkey = l_orderkey
          WHERE o_orderstatus = 'F'
            AND l_shipdate > o_orderdate + INTERVAL 60 DAY) l1
      ON l1.l_suppkey = s_suppkey
    WHERE n_name IN ('NATION_3', 'NATION_13', 'NATION_23')
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21: suppliers who alone shipped late on a finalized
    multi-supplier order — EXISTS plus NOT EXISTS against the SAME fact
    table (lineitem in three roles). Adapted lateness: shipdate >
    orderdate + 60d (no commit/receipt dates). The late set l1 is computed
    once and persisted; the EXISTS becomes a left-semi and the NOT EXISTS
    a left-anti, both shuffling on l_orderkey; supplier/nation broadcast.

    The persist's useful lifetime is the consumption of the returned
    DataFrame (it feeds three join roles in one plan). Spark keeps the
    CacheManager entry after that; long-lived sessions release it with
    ``session.release_intermediates`` or by running the query under
    ``with session.released(spark):`` (bench.py's per-query isolation
    does the former)."""
    li = load(spark, sf_dir, "lineitem")
    orders_f = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_13", "NATION_23")
    )
    late = (
        li.join(orders_f, li.l_orderkey == orders_f.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .persist()
    )
    all_pairs = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    ).distinct()
    late_pairs = late.select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    l1 = (
        late.join(
            all_pairs,
            (late.l_orderkey == F.col("o2")) & (late.l_suppkey != F.col("s2")),
            "left_semi",
        ).join(
            late_pairs,
            (late.l_orderkey == F.col("o3")) & (late.l_suppkey != F.col("s3")),
            "left_anti",
        )
    )
    return (
        l1.join(F.broadcast(supp), l1.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey, "left_semi")
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@workload(
    "q7_volume_shipping",
    oracle=f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           CAST(sum({_REVENUE_SQL}) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation sn ON sn.n_nationkey = s_nationkey
    JOIN nation cn ON cn.n_nationkey = c_nationkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND ((sn.n_name = 'NATION_5' AND cn.n_name = 'NATION_10')
        OR (sn.n_name = 'NATION_10' AND cn.n_name = 'NATION_5'))
    GROUP BY sn.n_name, cn.n_name, CAST(year(l_shipdate) AS BIGINT)
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: trade volume between a nation PAIR by ship year — the
    two-role-nation join where the filter is a symmetric disjunction over
    both roles. Both nation dims broadcast (25 rows); the disjunctive pair
    predicate evaluates after the broadcast joins, so the only shuffles
    are lineitem→orders (orderkey) and the final 2×2×2-group aggregate.
    Revenue sums in DECIMAL(18,4), cast to double only at output."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00"))
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    sn = nat.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = nat.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_5") & (F.col("cust_nation") == "NATION_10")
    ) | ((F.col("supp_nation") == "NATION_10") & (F.col("cust_nation") == "NATION_5"))
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
    )


@workload(
    "q13_customer_order_distribution",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
          FROM customer
          LEFT JOIN orders ON c_custkey = o_custkey
                          AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey) c_orders
    GROUP BY c_count
    """,
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of customers by order count — the
    LEFT OUTER join with a filter INSIDE the join condition (customers
    with zero qualifying orders must still appear with c_count = 0),
    then a second aggregate over the first's output. Adapted: the
    o_comment NOT LIKE exclusion becomes an o_orderpriority exclusion
    (no comment column). Two shuffles: custkey for the join+count (one
    exchange, reused), then the tiny c_count regroup."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@workload(
    "q18_large_volume_customers",
    oracle="""
    SELECT c_name, c_custkey, o.o_orderkey, o_orderdate, o_totalprice,
           CAST(big.sum_qty_dec AS DOUBLE) AS sum_qty
    FROM (SELECT l_orderkey,
                 sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty_dec
          FROM lineitem GROUP BY l_orderkey
          HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 250) big
    JOIN orders o ON o.o_orderkey = big.l_orderkey
    JOIN customer ON c_custkey = o_custkey
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total quantity exceeds a threshold, with
    their customer — aggregate-then-join (the IN-subquery of the spec
    decorrelated into a HAVING aggregate used as the join's left side).
    The lineitem aggregate and the orders join share the l_orderkey
    exchange; quantity sums in DECIMAL so the >250 cut and the output are
    bit-identical across engines."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec2("l_quantity")).alias("sum_qty_dec"))
        .filter(F.col("sum_qty_dec") > 250)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("sum_qty_dec").cast("double").alias("sum_qty"),
        )
    )


@workload(
    "q22_dormant_customers",
    oracle="""
    SELECT CAST(c_custkey % 10 AS VARCHAR) AS cntrycode,
           count(*) AS numcust,
           CAST(sum(CASE WHEN abs(c_acctbal) < 1e15 THEN CAST(c_acctbal AS DECIMAL(18,2)) END) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT CAST(sum(CASE WHEN abs(c_acctbal) < 1e15 THEN CAST(c_acctbal AS DECIMAL(18,2)) END) AS DOUBLE)
                              / count(*)
                       FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY CAST(c_custkey % 10 AS VARCHAR)
    """,
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22: wealthy customers who never ordered, bucketed by country
    code — a scalar AVG subquery (computed once, broadcast as a 1-row
    cross join) feeding a filter, then an anti join against orders.
    Adapted: cntrycode is ``c_custkey % 10`` (no c_phone column). The avg
    is an exact decimal sum ÷ count so the filter threshold is
    bit-identical in both engines."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(
                F.when(
                    F.abs(F.col("c_acctbal")) < 1e15,
                    F.col("c_acctbal").cast("decimal(18,2)"),
                )
            ).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_bal")
        )
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy((F.col("c_custkey") % 10).cast("string").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(
                F.when(
                    F.abs(F.col("c_acctbal")) < 1e15,
                    F.col("c_acctbal").cast("decimal(18,2)"),
                )
            )
            .cast("double")
            .alias("totacctbal"),
        )
    )


# Pseudo-partsupp (module docstring): the supply relation the testdata
# lacks, derived once per query from lineitem. Exact DECIMAL measures so
# min-equality joins and threshold comparisons are bit-identical in DuckDB.
_PS_SQL = """
    SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
           min(CAST(l_extendedprice AS DECIMAL(18,2))) AS ps_supplycost,
           sum(CAST(l_quantity AS DECIMAL(18,2))) AS ps_availqty
    FROM lineitem
    GROUP BY l_partkey, l_suppkey
"""


def _pseudo_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min(_dec2("l_extendedprice")).alias("ps_supplycost"),
        F.sum(_dec2("l_quantity")).alias("ps_availqty"),
    )


@workload(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH ps AS ({_PS_SQL}),
    eligible AS (
        SELECT ps_partkey, ps_supplycost, s_acctbal, s_name, n_name
        FROM ps
        JOIN part     ON p_partkey = ps_partkey
        JOIN supplier ON s_suppkey = ps_suppkey
        JOIN nation   ON n_nationkey = s_nationkey
        JOIN region   ON r_regionkey = n_regionkey
        WHERE r_name = 'EUROPE' AND p_type = 'LARGE' AND p_size <= 10),
    minc AS (
        SELECT ps_partkey AS m_partkey, min(ps_supplycost) AS min_cost
        FROM eligible GROUP BY ps_partkey)
    SELECT CAST(s_acctbal AS DOUBLE) AS s_acctbal, s_name, n_name,
           p_partkey, p_name, CAST(ps_supplycost AS DOUBLE) AS supply_cost
    FROM eligible
    JOIN minc ON ps_partkey = m_partkey AND ps_supplycost = min_cost
    JOIN part ON p_partkey = ps_partkey
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the cheapest supplier in
    one region — the correlated scalar-MIN subquery, decorrelated the way
    Catalyst would: per-part MIN over the eligible supply rows, equi-joined
    back on (partkey, cost = min). Supply rows come from the pseudo-
    partsupp (module docstring). Join order puts the broadcast part filter
    FIRST so the 52k-pair supply relation shrinks ~30x before the
    supplier/nation/region broadcasts. ``eligible`` feeds both the MIN
    aggregate and the join-back, so it is persisted (one pseudo-partsupp
    shuffle, not two; released by bench/driver isolation), and ``minc``
    is explicitly broadcast — its cardinality is bounded by the filtered
    part dimension, never the fact table, so the join-back is a
    broadcast hash join at any scale instead of a sort-merge shuffle.
    DECIMAL min-equality surfaces every tied supplier, identically in
    DuckDB; the top-100 sort key chain ends in (s_name, p_partkey),
    unique per row, so the LIMIT frontier is deterministic (top-100 runs
    as TakeOrderedAndProject — no global sort shuffle)."""
    ps = _pseudo_partsupp(spark, sf_dir)
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") <= 10)
    )
    supp = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eligible = (
        ps.join(F.broadcast(part), ps.ps_partkey == part.p_partkey)
        .join(F.broadcast(supp), ps.ps_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(region), nat.n_regionkey == region.r_regionkey, "left_semi")
        .select("ps_partkey", "ps_supplycost", "s_acctbal", "s_name", "n_name",
                "p_partkey", "p_name")
        .persist()
    )
    minc = eligible.groupBy(F.col("ps_partkey").alias("m_partkey")).agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    return (
        eligible.join(
            F.broadcast(minc),
            (eligible.ps_partkey == minc.m_partkey)
            & (eligible.ps_supplycost == minc.min_cost),
        )
        .select(
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.col("ps_supplycost").cast("double").alias("supply_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@workload(
    "q11_important_stock",
    oracle=f"""
    WITH ps AS ({_PS_SQL}),
    natps AS (
        SELECT ps_partkey,
               CAST(ps_supplycost * ps_availqty AS DECIMAL(30,4)) AS val
        FROM ps
        JOIN supplier ON s_suppkey = ps_suppkey
        JOIN nation   ON n_nationkey = s_nationkey
        WHERE n_name = 'NATION_7')
    SELECT ps_partkey, CAST(part_value_dec AS DOUBLE) AS part_value
    FROM (SELECT ps_partkey, sum(val) AS part_value_dec
          FROM natps GROUP BY ps_partkey)
    WHERE CAST(part_value_dec AS DOUBLE)
          > (SELECT CAST(sum(val) AS DOUBLE) FROM natps) * 0.001
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose stock value in one nation exceeds a
    fraction of the nation's total stock value — a scalar subquery that
    aggregates the SAME relation as the outer group-by. The nation-
    filtered supply rows are persisted so the per-part and total
    aggregates share one computation; the 1-row total broadcasts back as
    a cross join (no shuffle). Value = supplycost x availqty, exact
    DECIMAL(30,4) summed then compared in double on both engines, so the
    0.001-fraction cut is bit-identical. The persist's lifetime is the
    returned plan's consumption; bench/driver isolation releases it."""
    ps = _pseudo_partsupp(spark, sf_dir)
    supp = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    natps = (
        ps.join(F.broadcast(supp), ps.ps_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey, "left_semi")
        .select(
            "ps_partkey",
            (F.col("ps_supplycost") * F.col("ps_availqty"))
            .cast("decimal(30,4)")
            .alias("val"),
        )
        .persist()
    )
    total = natps.agg(F.sum("val").cast("double").alias("total_value"))
    return (
        natps.groupBy("ps_partkey")
        .agg(F.sum("val").alias("part_value_dec"))
        .join(F.broadcast(total))
        .filter(
            F.col("part_value_dec").cast("double")
            > F.col("total_value") * F.lit(0.001)
        )
        .select(
            "ps_partkey",
            F.col("part_value_dec").cast("double").alias("part_value"),
        )
    )


@workload(
    "q20_excess_stock_suppliers",
    oracle="""
    WITH avail AS (
        SELECT l_partkey AS a_pk, l_suppkey AS a_sk,
               sum(CAST(l_quantity AS DECIMAL(18,2))) AS returned_qty
        FROM lineitem WHERE l_returnflag = 'R'
        GROUP BY l_partkey, l_suppkey),
    shipped AS (
        SELECT l_partkey AS sh_pk, l_suppkey AS sh_sk,
               sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty_1997
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_partkey, l_suppkey)
    SELECT s_name, CAST(s_acctbal AS DOUBLE) AS s_acctbal
    FROM supplier
    JOIN nation ON n_nationkey = s_nationkey
    WHERE n_name = 'NATION_3'
      AND s_suppkey IN (
          SELECT a_sk FROM avail
          JOIN shipped ON sh_pk = a_pk AND sh_sk = a_sk
          WHERE a_pk IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
            AND CAST(returned_qty AS DOUBLE)
                > 0.5 * CAST(qty_1997 AS DOUBLE))
    """,
)
def q20_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers of one nation holding excess stock of
    promotable parts — the doubly-nested IN chain (supplier IN (supply
    pairs WHERE part IN promo-parts AND availqty > 0.5 x year-shipped)),
    expressed as the semi-join chain Catalyst decorrelates it into.
    Adapted availqty: quantity RETURNED per (part, supplier)
    (l_returnflag = 'R' — goods back on the shelf), which keeps the
    spec's stock-vs-demand comparison selective (~25% of pairs) where a
    lineitem-sum availqty would trivially satisfy it (module docstring).
    Both grouped aggregates shuffle on the same (partkey, suppkey) key
    and equi-join without a third exchange; the part LIKE filter and the
    nation filter broadcast; the final IN is a left-semi against
    supplier. Exact DECIMAL sums compared in double on both engines."""
    li = load(spark, sf_dir, "lineitem")
    avail = (
        li.filter(F.col("l_returnflag") == "R")
        .groupBy(F.col("l_partkey").alias("a_pk"), F.col("l_suppkey").alias("a_sk"))
        .agg(F.sum(_dec2("l_quantity")).alias("returned_qty"))
    )
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00"))
        )
        .groupBy(F.col("l_partkey").alias("sh_pk"), F.col("l_suppkey").alias("sh_sk"))
        .agg(F.sum(_dec2("l_quantity")).alias("qty_1997"))
    )
    red_parts = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    qual = (
        avail.join(F.broadcast(red_parts), avail.a_pk == F.col("p_partkey"), "left_semi")
        .join(shipped, (avail.a_pk == shipped.sh_pk) & (avail.a_sk == shipped.sh_sk))
        .filter(
            F.col("returned_qty").cast("double")
            > F.lit(0.5) * F.col("qty_1997").cast("double")
        )
        .select(F.col("a_sk"))
    )
    supp = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    return (
        supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey, "left_semi")
        .join(qual, supp.s_suppkey == qual.a_sk, "left_semi")
        .select("s_name", F.col("s_acctbal").cast("double").alias("s_acctbal"))
    )
