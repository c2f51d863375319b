"""Customer/event analytics workloads: marketing attribution, RFM
segmentation, robust anomaly detection, activity streaks, referential-
integrity auditing and Z-order layout — the reporting queries a warehouse
built on the ETL core (SURVEY.md §2 O1–O21) actually serves.

Determinism rules (shared with the rest of the registry):
- every window carries a unique tiebreaker; ordering keys are non-NULL by
  explicit filter or coalesce (Spark sorts NULLS FIRST on ASC, DuckDB
  defaults NULLS LAST — never let a NULL reach an ORDER BY);
- money goes through DECIMAL(18,2); doubles only for already-identical
  values, divisions written with the same association in both engines;
- timestamps compare at microsecond precision on both sides (the parquet
  NANOS column is floor-divided on load; DuckDB's epoch_us truncates the
  same way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.graph import bfs_min_hops, pagerank_integer
from ..operators.ranking import distributed_ntile, pareto_frontier_2d
from ..operators.zorder import _normalize_to_bits, zorder_value
from . import load, workload

# Injected "now" for recency: the day after the last o_orderdate in the
# generated corpus (wall-clock would break value-hash determinism).
_RFM_NOW = "2001-08-02"

_TOUCH_GUARD = "t IS NOT NULL AND t.ts >= ts - INTERVAL 7 DAY"

_US_PER_MIN = 60_000_000


def _idiv_min(d):
    """Exact integer division µs→whole minutes: subtracting pmod makes the
    numerator divisible, so the double division is exact (a bare truncating
    cast can be off near huge quotients; a rounded fractional gap is a
    half-tie trap between Spark's HALF_UP and DuckDB's half-even)."""
    return ((d - F.pmod(d, F.lit(_US_PER_MIN))) / F.lit(_US_PER_MIN)).cast("bigint")


@workload(
    "attribution_last_touch",
    oracle=f"""
    WITH lt AS (
        SELECT event_id, user_id, ts, event_type,
               max(CASE WHEN event_type IN ('view', 'click')
                        THEN struct_pack(ts := ts, event_id := event_id,
                                         event_type := event_type) END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS t
        FROM events
        WHERE ts IS NOT NULL AND user_id IS NOT NULL AND event_id IS NOT NULL
    )
    SELECT event_id, user_id, ts,
           CASE WHEN {_TOUCH_GUARD} THEN t.event_type ELSE 'direct' END AS channel,
           CASE WHEN {_TOUCH_GUARD} THEN t.event_id END AS touch_event_id,
           CASE WHEN {_TOUCH_GUARD}
                THEN (epoch_us(ts) - epoch_us(t.ts)) // 60000000
           END AS gap_minutes
    FROM lt WHERE event_type = 'purchase'
    """,
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase is credited to the
    user's most recent view/click within a 7-day lookback, else 'direct'.

    The conditional as-of is ONE window over (user_id) — a running
    struct-max of (ts, event_id, event_type) restricted to touch events —
    so the whole attribution costs a single exchange, not a
    purchases×touches range join (the ``asof_prior_purchase`` shape with a
    channel payload and a lookback horizon). Struct max orders
    lexicographically in both engines; event_id makes the order total at
    equal timestamps. NULL contract: attribution requires an identity and
    an instant — rows with NULL user_id/ts/event_id are excluded on BOTH
    sides (a window would group NULL users the oracle semantics drop).
    """
    events = load(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_id").isNotNull()
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(
        F.col("event_type").isin("view", "click"),
        F.struct("ts", "event_id", "event_type"),
    )
    attributed = F.col("t").isNotNull() & (
        F.col("t.ts") >= F.col("ts") - F.expr("INTERVAL 7 DAYS")
    )
    return (
        events.withColumn("t", F.max(touch).over(w))
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            "ts",
            F.when(attributed, F.col("t.event_type"))
            .otherwise(F.lit("direct"))
            .alias("channel"),
            F.when(attributed, F.col("t.event_id")).alias("touch_event_id"),
            # Whole minutes as EXACT integer division (pmod-subtracted
            # numerator → the double division is exact): a rounded
            # fractional gap is a half-tie trap — µs/6e7 lands exactly on
            # x.xxxxxx5 constantly, where Spark rounds HALF_UP and DuckDB
            # half-even.
            F.when(attributed, _idiv_min(F.unix_micros(F.col("ts")) - F.unix_micros(F.col("t.ts")))).alias(
                "gap_minutes"
            ),
        )
    )


# (relationship, child table, fk column, parent table, pk column,
#  parent-is-broadcastable-at-scale)
_FK_RELS: list[tuple[str, str, str, str, str, bool]] = [
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey", True),
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey", False),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey", False),
    ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey", False),
    ("nation->region", "nation", "n_regionkey", "region", "r_regionkey", True),
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey", False),
    ("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey", True),
]


def _fk_oracle() -> str:
    parts = []
    for name, child, fk, parent, pk, _ in _FK_RELS:
        parts.append(f"""
    SELECT '{name}' AS relationship,
           (SELECT count(*) FROM {child}) AS n_child,
           (SELECT count(*) FROM {child} WHERE {fk} IS NULL) AS n_null_fk,
           (SELECT count(*) FROM {child}
             WHERE {fk} IS NOT NULL
               AND {fk} NOT IN (SELECT {pk} FROM {parent} WHERE {pk} IS NOT NULL))
               AS n_orphan,
           (SELECT count(DISTINCT {pk}) FROM {parent}) AS n_parent,
           (SELECT count(DISTINCT {fk}) FROM {child}
             WHERE {fk} IN (SELECT {pk} FROM {parent})) AS n_parent_covered""")
    body = "\n    UNION ALL".join(parts)
    return f"""
    SELECT relationship, n_child, n_null_fk, n_orphan, n_parent, n_parent_covered,
           CASE WHEN n_parent > 0
                THEN round(n_parent_covered * 1.0 / n_parent, 6) END AS coverage
    FROM ({body})
    """


@workload("quality_fk_orphans", oracle=_fk_oracle())
def quality_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: one row per foreign-key relationship
    with child cardinality, NULL-FK count (3VL: a NULL key is *missing*,
    not an orphan), orphan count (left-anti join on non-NULL keys) and
    parent-key coverage.

    Scale: dimension parents (nation/region) are broadcast; the fact-to-
    fact checks (lineitem->orders/part/supplier) shuffle on the key —
    exactly the joins AQE bloom-filters — and every per-relationship
    result is a 1-row aggregate, so the union is driver-light. Coverage
    is NULL (not a division blow-up) when the parent side is empty.
    """
    row_dfs = []
    for name, child_t, fk, parent_t, pk, small in _FK_RELS:
        child = load(spark, sf_dir, child_t)
        parent = load(spark, sf_dir, parent_t)
        ckeys = child.select(F.col(fk).alias("k"))
        pkeys = (
            parent.select(F.col(pk).alias("k"))
            .filter(F.col("k").isNotNull())
            .distinct()
        )
        # ONE pass over the child per relationship (r11, guide §2.4): a
        # single left join against the distinct parent keys classifies
        # every child row at once — NULL FK (no match possible), orphan
        # (non-NULL, no parent), covered (match) — and one aggregate
        # derives all four child-side stats. The previous shape ran three
        # separate child scans (base agg + left_anti orphan count +
        # distinct/semi coverage), i.e. 3 fact-table passes and up to 3
        # shuffles per relationship; this is 1 scan + 1 shuffle join (or
        # a broadcast for dimension parents).
        flagged = pkeys.select("k", F.lit(1).alias("__p"))
        j = ckeys.join(
            F.broadcast(flagged) if small else flagged, "k", "left"
        )
        stats = j.agg(
            F.count(F.lit(1)).alias("n_child"),
            F.sum(F.col("k").isNull().cast("long")).alias("n_null_fk"),
            F.sum(
                (F.col("k").isNotNull() & F.col("__p").isNull()).cast("long")
            ).alias("n_orphan"),
            F.countDistinct(
                F.when(F.col("__p").isNotNull(), F.col("k"))
            ).alias("n_parent_covered"),
        )
        n_parent = pkeys.agg(F.count(F.lit(1)).alias("n_parent"))
        row = (
            stats.crossJoin(F.broadcast(n_parent))
            .select(
                F.lit(name).alias("relationship"),
                F.col("n_child").cast("bigint").alias("n_child"),
                F.coalesce(F.col("n_null_fk"), F.lit(0))
                .cast("bigint")
                .alias("n_null_fk"),
                F.coalesce(F.col("n_orphan"), F.lit(0))
                .cast("bigint")
                .alias("n_orphan"),
                F.col("n_parent").cast("bigint").alias("n_parent"),
                F.col("n_parent_covered").cast("bigint").alias("n_parent_covered"),
                F.when(
                    F.col("n_parent") > 0,
                    F.round(F.col("n_parent_covered") * 1.0 / F.col("n_parent"), 6),
                ).alias("coverage"),
            )
        )
        row_dfs.append(row)
    out = row_dfs[0]
    for r in row_dfs[1:]:
        out = out.unionAll(r)
    return out


_SEGMENT_SQL = """CASE
        WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4 THEN 'champion'
        WHEN f_score >= 4 THEN 'loyal'
        WHEN r_score <= 2 AND m_score >= 4 THEN 'at_risk'
        WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating'
        ELSE 'regular' END"""


@workload(
    "rfm_customer_segments",
    oracle=f"""
    WITH base AS (
        SELECT o_custkey,
               CAST(datediff('day', CAST(max(o_orderdate) AS DATE),
                             DATE '{_RFM_NOW}') AS INTEGER) AS recency_days,
               count(*) AS frequency,
               sum(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
        FROM orders
        WHERE o_custkey IS NOT NULL
        GROUP BY o_custkey
        HAVING count(o_orderdate) > 0
    ),
    scored AS (
        SELECT o_custkey, recency_days, frequency,
               CAST(monetary AS DOUBLE) AS monetary,
               CAST(ntile(5) OVER (ORDER BY recency_days DESC, o_custkey)
                    AS INTEGER) AS r_score,
               CAST(ntile(5) OVER (ORDER BY frequency ASC, o_custkey)
                    AS INTEGER) AS f_score,
               CAST(ntile(5) OVER (ORDER BY coalesce(monetary, 0) ASC, o_custkey)
                    AS INTEGER) AS m_score
        FROM base
    )
    SELECT o_custkey, recency_days, CAST(frequency AS BIGINT) AS frequency,
           monetary, r_score, f_score, m_score,
           {_SEGMENT_SQL} AS segment
    FROM scored
    """,
)
def rfm_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-customer Recency/Frequency/Monetary quintile
    scores and a segment label.

    The three NTILE(5)s use ``operators/ranking.distributed_ntile`` —
    range partitioning + per-partition ranks + the NTILE closed form —
    because a bare ``ntile() OVER (ORDER BY ...)`` is a ONE-task global
    sort (the oracle can afford it; a 1.5B-customer table cannot). The
    per-customer base is persisted once and feeds all three rankings.
    NULL contract: customers with a NULL key or no non-NULL order date
    are excluded (their recency is undefined and NULL ordering diverges
    between engines); an all-NULL-price customer RANKS as monetary 0 but
    keeps the true NULL monetary in the output column.
    """
    orders = load(spark, sf_dir, "orders")
    base = (
        orders.filter(F.col("o_custkey").isNotNull())
        .groupBy("o_custkey")
        .agg(
            F.datediff(
                F.lit(_RFM_NOW).cast("date"), F.to_date(F.max("o_orderdate"))
            ).alias("recency_days"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("monetary"),
            F.count("o_orderdate").alias("__n_dates"),
        )
        .filter(F.col("__n_dates") > 0)
        .drop("__n_dates")
        .persist()
    )
    scored = distributed_ntile(
        base, [F.col("recency_days").desc(), F.col("o_custkey").asc()], 5, "r_score"
    )
    scored = distributed_ntile(
        scored, [F.col("frequency").asc(), F.col("o_custkey").asc()], 5, "f_score"
    )
    scored = distributed_ntile(
        scored,
        [
            F.coalesce(F.col("monetary"), F.lit(0).cast("decimal(18,2)")).asc(),
            F.col("o_custkey").asc(),
        ],
        5,
        "m_score",
    )
    return scored.select(
        "o_custkey",
        "recency_days",
        F.col("frequency").cast("bigint").alias("frequency"),
        F.col("monetary").cast("double").alias("monetary"),
        "r_score",
        "f_score",
        "m_score",
        F.expr(_SEGMENT_SQL).alias("segment"),
    )


# Exact median via the dual-rank trick: for n ordered values the median is
# the mean of the values at ranks (n+1) DIV 2 and (n+2) DIV 2 (equal for
# odd n). Pure integer rank arithmetic + one mean of at most two doubles —
# bit-identical in both engines, no interpolation-formula seam.
_MEDIAN_CTE = """
vals AS (
    SELECT event_type, event_id, value FROM events WHERE value IS NOT NULL
),
ranked AS (
    SELECT event_type, value,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY value, event_id) AS rn,
           count(*) OVER (PARTITION BY event_type) AS n
    FROM vals
),
med AS (
    SELECT event_type, avg(value) AS med
    FROM ranked
    WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
    GROUP BY event_type
),
devs AS (
    SELECT v.event_type, v.event_id, v.value, m.med,
           abs(v.value - m.med) AS dev
    FROM vals v JOIN med m ON v.event_type IS NOT DISTINCT FROM m.event_type
),
dev_ranked AS (
    SELECT event_type, dev,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY dev, event_id) AS rn,
           count(*) OVER (PARTITION BY event_type) AS n
    FROM devs
),
mad AS (
    SELECT event_type, avg(dev) AS mad
    FROM dev_ranked
    WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
    GROUP BY event_type
)"""


@workload(
    "anomaly_mad_robust_z",
    oracle=f"""
    WITH {_MEDIAN_CTE}
    SELECT d.event_type,
           CAST(count(*) AS BIGINT) AS n_values,
           round(any_value(d.med), 6) AS med,
           round(any_value(a.mad), 6) AS mad,
           CAST(sum(CASE WHEN a.mad > 0
                          AND abs(0.6745 * (d.value - d.med) / a.mad) > 3.5
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM devs d JOIN mad a ON d.event_type IS NOT DISTINCT FROM a.event_type
    GROUP BY d.event_type
    """,
)
def anomaly_mad_robust_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection per event type: modified z-score
    ``0.6745·(x − median) / MAD`` with outliers at |z| > 3.5 (the
    Iglewicz–Hoaglin rule) — median/MAD shrug off the heavy tail that
    wrecks a mean/stddev z-score (cf. ``outlier_filter_iqr`` for the
    quartile-fence variant).

    Medians are EXACT via the dual-rank trick (see ``_MEDIAN_CTE``): rank
    arithmetic is integral and the final mean touches at most two doubles,
    so Spark and DuckDB agree bit-for-bit — no percentile-interpolation
    seam. Two exchanges on event_type (values pass + deviations pass); the
    per-type medians join back broadcast. At 100 TB the same shape holds
    with approx_percentile replacing the exact ranks (see
    ``approx_quantiles_error`` for the bounded-error variant).
    NULL contract: NULL values are excluded (count(value) semantics); a
    NULL event_type forms its own group in BOTH engines (GROUP BY and
    window PARTITION BY both retain it; the joins are null-safe).
    """
    events = load(spark, sf_dir, "events")
    vals = events.filter(F.col("value").isNotNull()).select(
        "event_type", "event_id", "value"
    )

    def exact_median(df: DataFrame, col: str, out: str) -> DataFrame:
        w = Window.partitionBy("event_type").orderBy(col, "event_id")
        wc = Window.partitionBy("event_type")
        ranked = df.withColumn("rn", F.row_number().over(w)).withColumn(
            "n", F.count(F.lit(1)).over(wc)
        )
        mid = ranked.filter(
            (F.col("rn") == F.floor((F.col("n") + 1) / 2))
            | (F.col("rn") == F.floor((F.col("n") + 2) / 2))
        )
        return mid.groupBy("event_type").agg(F.avg(col).alias(out))

    # The MAD median derives from `devs`, which derives from `vals` — the
    # join keys must be renamed or Spark's ambiguous-self-join detection
    # (correctly) refuses the shared-lineage equality.
    med = exact_median(vals, "value", "med").withColumnRenamed("event_type", "et")
    devs = vals.join(
        F.broadcast(med), F.col("event_type").eqNullSafe(F.col("et")), "inner"
    ).select(
        "event_type",
        "event_id",
        "value",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("dev"),
    )
    mad = exact_median(devs, "dev", "mad").withColumnRenamed("event_type", "et")
    joined = devs.join(
        F.broadcast(mad), F.col("event_type").eqNullSafe(F.col("et")), "inner"
    ).select("event_type", "value", "med", "dev", "mad")
    is_out = (F.col("mad") > 0) & (
        F.abs(F.lit(0.6745) * (F.col("value") - F.col("med")) / F.col("mad")) > 3.5
    )
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_values"),
        F.round(F.any_value("med"), 6).alias("med"),
        F.round(F.any_value("mad"), 6).alias("mad"),
        F.sum(F.when(is_out, 1).otherwise(0)).cast("bigint").alias("n_outliers"),
    )


@workload(
    "streak_longest_daily",
    oracle="""
    WITH active AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
        FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ),
    grouped AS (
        SELECT user_id, d,
               d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                        AS INTEGER) AS grp
        FROM active
    ),
    streaks AS (
        SELECT user_id, count(*) AS streak_len, min(d) AS streak_start
        FROM grouped GROUP BY user_id, grp
    ),
    flagged AS (
        SELECT user_id, streak_len, streak_start,
               max(streak_len) OVER (PARTITION BY user_id) AS max_len
        FROM streaks
    )
    SELECT user_id,
           CAST(sum(streak_len) AS BIGINT) AS n_active_days,
           CAST(max(streak_len) AS BIGINT) AS longest_streak,
           min(CASE WHEN streak_len = max_len THEN streak_start END)
               AS streak_start
    FROM flagged GROUP BY user_id
    """,
)
def streak_longest_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-active-days streak per user (gaps-and-islands):
    distinct (user, day) → ``day − row_number`` collapses each run to a
    constant → one groupBy sizes the runs, a window + groupBy picks the
    longest (earliest-start tiebreak). Everything partitions by user_id —
    one exchange chain, no global sort. NULL contract: activity needs a
    user and an instant; NULL user_id/ts rows are excluded on both sides.
    """
    events = load(spark, sf_dir, "events")
    active = (
        events.filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select("user_id", F.to_date("ts").alias("d"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("d")
    grouped = active.withColumn("grp", F.date_sub(F.col("d"), F.row_number().over(w)))
    streaks = grouped.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("streak_len"), F.min("d").alias("streak_start")
    )
    flagged = streaks.withColumn(
        "max_len", F.max("streak_len").over(Window.partitionBy("user_id"))
    )
    return flagged.groupBy("user_id").agg(
        F.sum("streak_len").cast("bigint").alias("n_active_days"),
        F.max("streak_len").cast("bigint").alias("longest_streak"),
        F.min(
            F.when(F.col("streak_len") == F.col("max_len"), F.col("streak_start"))
        ).alias("streak_start"),
    )


_Z_BITS = 8  # per dimension; 16-bit Morton code, 64 buckets of 1024 codes
_Z_BUCKET_SHIFT = 10


def _zorder_interleave_sql(u: str, d: str) -> str:
    """The exact SQL twin of ``operators/zorder.zorder_value`` for two
    dimensions: column 0 (u) lands on even bit positions, column 1 (d) on
    odd — generated, not hand-written, so the bit layout can't drift."""
    terms = []
    for j in range(_Z_BITS):
        terms.append(f"((({u} >> {j}) & 1) << {2 * j})")
        terms.append(f"((({d} >> {j}) & 1) << {2 * j + 1})")
    return " | ".join(terms)


def _zorder_norm_sql(col: str, mn: str, mx: str) -> str:
    """SQL twin of ``operators/zorder._normalize_to_bits``: identical
    association — (x − mn) * (255.0 / (mx − mn)) — so the doubles match
    Spark bit-for-bit, then the same floor + clamp."""
    hi = (1 << _Z_BITS) - 1
    return f"""CASE WHEN {mx} = {mn} THEN 0
            ELSE least(greatest(CAST(floor((CAST({col} AS DOUBLE) - {mn})
                                * (CAST({hi} AS DOUBLE) / ({mx} - {mn})))
                           AS BIGINT), 0), {hi}) END"""


@workload(
    "zorder_layout_events",
    oracle=f"""
    WITH coords AS (
        SELECT CAST(user_id AS BIGINT) AS u,
               CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
                    AS BIGINT) AS d
        FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ),
    s AS (
        SELECT CAST(min(u) AS DOUBLE) AS mnu, CAST(max(u) AS DOUBLE) AS mxu,
               CAST(min(d) AS DOUBLE) AS mnd, CAST(max(d) AS DOUBLE) AS mxd
        FROM coords
    ),
    nrm AS (
        SELECT u, d,
               {_zorder_norm_sql("u", "s.mnu", "s.mxu")} AS un,
               {_zorder_norm_sql("d", "s.mnd", "s.mxd")} AS dn
        FROM coords, s
    ),
    coded AS (
        SELECT u, d, ({_zorder_interleave_sql("un", "dn")}) >> {_Z_BUCKET_SHIFT}
                   AS bucket
        FROM nrm
    )
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           min(u) AS min_user, max(u) AS max_user,
           min(d) AS min_day, max(d) AS max_day,
           max(u) - min(u) AS user_span,
           max(d) - min(d) AS day_span
    FROM coded GROUP BY bucket
    """,
)
def zorder_layout_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) layout audit over events on (user_id, day):
    normalize both dimensions to 8 bits, interleave, bucket by the top
    6 Morton bits, and report each bucket's per-dimension min/max spans —
    the row-group statistics a writer clustered this way would expose for
    data skipping (see ``operators/zorder.zorder_repartition``, which is
    the write path; tight spans on BOTH columns = both predicates prune).

    The min/max normalization bounds are two scalar aggregates collected
    once on the driver (bounds, not data); the oracle recomputes them in a
    CTE with the identical double association, and the bit interleave SQL
    is GENERATED from the same layout as ``zorder_value`` so the bucket
    ids match exactly. NULL coordinates have no place on the curve and are
    excluded on both sides.
    """
    events = load(spark, sf_dir, "events")
    coords = (
        events.filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select(
            F.col("user_id").cast("bigint").alias("u"),
            F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
            .cast("bigint")
            .alias("d"),
        )
    )
    stats = coords.agg(
        F.min("u").cast("double").alias("mnu"),
        F.max("u").cast("double").alias("mxu"),
        F.min("d").cast("double").alias("mnd"),
        F.max("d").cast("double").alias("mxd"),
    ).first()
    un = _normalize_to_bits(F.col("u"), stats["mnu"], stats["mxu"], _Z_BITS)
    dn = _normalize_to_bits(F.col("d"), stats["mnd"], stats["mxd"], _Z_BITS)
    bucket = F.shiftright(zorder_value([un, dn], _Z_BITS), _Z_BUCKET_SHIFT)
    return (
        coords.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("u").alias("min_user"),
            F.max("u").alias("max_user"),
            F.min("d").alias("min_day"),
            F.max("d").alias("max_day"),
            (F.max("u") - F.min("u")).alias("user_span"),
            (F.max("d") - F.min("d")).alias("day_span"),
        )
    )


@workload(
    "timeseries_ohlc_daily",
    oracle="""
    WITH pts AS (
        SELECT user_id, CAST(ts AS DATE) AS d, ts, event_id, value
        FROM events
        WHERE user_id IS NOT NULL AND ts IS NOT NULL
          AND event_id IS NOT NULL AND value IS NOT NULL
    )
    SELECT user_id, d,
           (min(struct_pack(ts := ts, event_id := event_id, value := value))).value
               AS open,
           max(value) AS high,
           min(value) AS low,
           (max(struct_pack(ts := ts, event_id := event_id, value := value))).value
               AS close,
           CAST(count(*) AS BIGINT) AS n_points
    FROM pts GROUP BY user_id, d
    """,
)
def timeseries_ohlc_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series downsampling to daily OHLC bars per user: open/close
    via lexicographic struct min/max over (ts, event_id, value) — the
    argmin/argmax-by-time trick that stays a plain aggregate (map-side
    partials, ONE exchange on (user, day)) instead of a first_value
    window + distinct. event_id makes the order total at equal
    timestamps. NULL contract: a bar point needs user, instant and value
    — NULL in any of them excludes the row on both sides."""
    events = load(spark, sf_dir, "events")
    pts = events.filter(
        F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("event_id").isNotNull()
        & F.col("value").isNotNull()
    ).select(
        "user_id", F.to_date("ts").alias("d"), "ts", "event_id", "value"
    )
    point = F.struct("ts", "event_id", "value")
    return pts.groupBy("user_id", "d").agg(
        F.min(point).getField("value").alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(point).getField("value").alias("close"),
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
    )


@workload(
    "event_bigram_lift",
    oracle="""
    WITH seq AS (
        SELECT user_id, ts, event_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
        WHERE user_id IS NOT NULL AND ts IS NOT NULL
          AND event_id IS NOT NULL AND event_type IS NOT NULL
    ),
    pairs AS (
        SELECT prev_type, event_type FROM seq WHERE prev_type IS NOT NULL
    ),
    ab AS (
        SELECT prev_type, event_type, count(*) AS n_ab
        FROM pairs GROUP BY prev_type, event_type
    ),
    margins AS (
        SELECT prev_type, sum(n_ab) AS n_prev FROM ab GROUP BY prev_type
    ),
    margins2 AS (
        SELECT event_type, sum(n_ab) AS n_cur FROM ab GROUP BY event_type
    ),
    tot AS (SELECT sum(n_ab) AS n_total FROM ab)
    SELECT ab.prev_type, ab.event_type,
           CAST(ab.n_ab AS BIGINT) AS n_ab,
           CAST(m1.n_prev AS BIGINT) AS n_prev,
           CAST(m2.n_cur AS BIGINT) AS n_cur,
           CAST(tot.n_total AS BIGINT) AS n_total,
           round((CAST(ab.n_ab AS DOUBLE) * CAST(tot.n_total AS DOUBLE))
                 / (CAST(m1.n_prev AS DOUBLE) * CAST(m2.n_cur AS DOUBLE)), 6)
               AS lift
    FROM ab
    JOIN margins m1 ON m1.prev_type = ab.prev_type
    JOIN margins2 m2 ON m2.event_type = ab.event_type
    CROSS JOIN tot
    """,
)
def event_bigram_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-transition lift: for every consecutive (prev → next)
    event-type bigram per user, the observed/expected-under-independence
    ratio — lift > 1 marks real behavioral sequences (view→click),
    lift < 1 anti-patterns. The market-basket lift formula on sequence
    bigrams, with no log (libm seams) — pure integer counts and one
    double ratio with identical association in both engines.

    Shape: ONE window exchange on user_id builds the bigrams, one
    groupBy on the (prev, next) pair; the marginals derive FROM the pair
    counts (≤ |types|² rows) and broadcast back — consistent by
    construction, no second scan. NULL contract: sequence position needs
    user/ts/event_id/type; NULL-type rows are removed BEFORE the lag so
    they don't break adjacency; the lag's leading NULL pairs drop.
    """
    events = load(spark, sf_dir, "events")
    seq = (
        events.filter(
            F.col("user_id").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("event_id").isNotNull()
            & F.col("event_type").isNotNull()
        )
        .select(
            "user_id",
            "ts",
            "event_id",
            "event_type",
            F.lag("event_type")
            .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
            .alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
    )
    ab = seq.groupBy("prev_type", "event_type").agg(
        F.count(F.lit(1)).alias("n_ab")
    ).persist()
    m1 = ab.groupBy("prev_type").agg(F.sum("n_ab").alias("n_prev"))
    m2 = ab.groupBy("event_type").agg(F.sum("n_ab").alias("n_cur"))
    tot = ab.agg(F.sum("n_ab").alias("n_total"))
    return (
        ab.join(F.broadcast(m1), "prev_type")
        .join(F.broadcast(m2), "event_type")
        .crossJoin(F.broadcast(tot))
        .select(
            "prev_type",
            "event_type",
            F.col("n_ab").cast("bigint").alias("n_ab"),
            F.col("n_prev").cast("bigint").alias("n_prev"),
            F.col("n_cur").cast("bigint").alias("n_cur"),
            F.col("n_total").cast("bigint").alias("n_total"),
            F.round(
                (F.col("n_ab").cast("double") * F.col("n_total").cast("double"))
                / (F.col("n_prev").cast("double") * F.col("n_cur").cast("double")),
                6,
            ).alias("lift"),
        )
    )


@workload(
    "session_paths_topk",
    oracle="""
    WITH seq AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WHERE user_id IS NOT NULL AND ts IS NOT NULL
          AND event_id IS NOT NULL AND event_type IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, ts, event_id, event_type,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM seq
    ),
    ranked AS (
        SELECT user_id, sid, event_type,
               row_number() OVER (PARTITION BY user_id, sid
                                  ORDER BY ts, event_id) AS rn
        FROM sess
    ),
    paths AS (
        SELECT user_id, sid, string_agg(event_type, '>' ORDER BY rn) AS path
        FROM ranked WHERE rn <= 5 GROUP BY user_id, sid
    )
    SELECT path,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM paths GROUP BY path
    """,
)
def session_paths_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session path analysis: 30-minute-gap sessions (the ``sessionize_
    events`` definition), each summarized by its first five event types
    joined ``a>b>c``, then path frequencies and user reach — the funnel-
    discovery query behind "what do users actually do".

    The ordered path concat is engine-portable: Spark has no ordered
    string_agg, so the path is ``array_join(transform(array_sort(
    collect_list(struct(rn, event_type)))))`` — collect_list is
    order-nondeterministic, but sorting the (rn, type) structs AFTER
    collection restores the unique rn order, making the result exact.
    Everything partitions by user (two stacked windows share one
    exchange), then one groupBy on the bounded path domain.
    NULL contract: as ``sessionize_events`` plus NULL event_type/event_id
    rows excluded (a path element must exist and order must be total).
    """
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    base = events.filter(
        F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("event_id").isNotNull()
        & F.col("event_type").isNotNull()
    )
    prev_ts = F.lag("ts").over(w)
    new_s = F.when(
        prev_ts.isNull()
        | ((F.col("ts") - prev_ts) > F.expr("INTERVAL 30 MINUTES")),
        1,
    ).otherwise(0)
    sess = base.withColumn("new_s", new_s).withColumn(
        "sid",
        F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    ranked = sess.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("user_id", "sid").orderBy("ts", "event_id")
        ),
    ).filter(F.col("rn") <= 5)
    paths = ranked.groupBy("user_id", "sid").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return paths.groupBy("path").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.count_distinct("user_id").cast("bigint").alias("n_users"),
    )


def _pagerank_oracle(iterations: int = 5, scale: int = 10**12) -> str:
    """Unroll the integer-PageRank recurrence of
    ``operators.graph.pagerank_integer`` into a DuckDB CTE chain — the
    sketch-replay trick (`text_heavy_hitters_cms`, `ann_ivf_topk`) applied
    to an iterative algorithm: because every step is integral, the SQL
    replay is bit-identical, not approximately equal."""
    base = f"({scale} // (SELECT n_nodes FROM n))"
    ctes = [
        """items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
    )""",
        """edges AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        GROUP BY 1, 2
    )""",
        "nodes AS (SELECT DISTINCT l_partkey AS node FROM items)",
        "n AS (SELECT count(*) AS n_nodes FROM nodes)",
        "deg AS (SELECT src AS node, count(*) AS outdeg FROM edges GROUP BY src)",
        f"r0 AS (SELECT node, CAST({base} AS BIGINT) AS r FROM nodes)",
    ]
    for k in range(1, iterations + 1):
        ctes.append(
            f"""i{k} AS (
        SELECT e.dst AS node, sum(r.r // d.outdeg) AS s
        FROM edges e
        JOIN r{k - 1} r ON r.node = e.src
        JOIN deg d ON d.node = e.src
        GROUP BY e.dst
    )"""
        )
        ctes.append(
            f"""r{k} AS (
        SELECT nd.node,
               CAST((15 * {base} + 85 * coalesce(i.s, 0)) // 100 AS BIGINT) AS r
        FROM nodes nd LEFT JOIN i{k} i ON i.node = nd.node
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT nd.node AS partkey,
           CAST(coalesce(d.outdeg, 0) AS BIGINT) AS degree,
           r.r AS rank5
    FROM nodes nd
    LEFT JOIN deg d ON d.node = nd.node
    JOIN r{iterations} r ON r.node = nd.node
    """
    )


@workload("graph_pagerank_parts", oracle=_pagerank_oracle(), iterative=True)
def graph_pagerank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the part co-purchase graph (edge = two parts appear
    in the same order), 5 damped iterations — "which products sit at the
    center of the catalog". The engine's second iterative-algorithm class
    after min-label components, and the first with a VALUE-HASHED oracle:
    the whole recurrence runs in scaled-integer arithmetic
    (`operators.graph.pagerank_integer`), so the DuckDB replay of the
    same 5 unrolled rounds is bit-identical — no float-order seam.

    Scale shape: co-purchase pairs are generated MAP-SIDE per order from
    a sorted distinct-part array (C(k,2) HOF expansion, k = basket size —
    never a row-level self-join; the measured-cheaper shape from
    SCALING.md's pair-generation experiment), deduped once; per PageRank
    round the node-sized contribution table broadcasts and the single
    shuffle is the map-side-combined sum over ``dst``. Edges/nodes are
    persisted across the 5 rounds. NULL contract: NULL order/part keys
    are filtered before pairing (Spark's groupBy would pool NULL keys
    into one giant pseudo-basket; SQL equi-joins drop them). Isolated
    parts (never co-purchased) stay at the teleport rank with degree 0.
    """
    li = load(spark, sf_dir, "lineitem")
    items = (
        li.filter(F.col("l_orderkey").isNotNull() & F.col("l_partkey").isNotNull())
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    baskets = items.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("parts")
    )
    half = (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(parts, (x, i) -> "
                    "transform(slice(parts, i + 2, size(parts)), "
                    "y -> struct(x AS a, y AS b))))"
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
        .distinct()
    )
    edges = (
        half.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .union(half.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .persist()
    )
    nodes = items.select(F.col("l_partkey").alias("node")).distinct().persist()
    ranks = pagerank_integer(nodes, edges, iterations=5)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    return (
        ranks.join(F.broadcast(deg), ranks["node"] == deg["src"], "left")
        .select(
            F.col("node").alias("partkey"),
            F.coalesce(F.col("outdeg"), F.lit(0)).cast("bigint").alias("degree"),
            F.col("r").alias("rank5"),
        )
    )


@workload(
    "skyline_customer_value",
    oracle="""
    WITH agg0 AS (
        SELECT o_custkey,
               CAST(count(*) AS BIGINT) AS n_orders,
               sum(CAST(o_totalprice AS DECIMAL(18,2))) AS total_spend
        FROM orders WHERE o_custkey IS NOT NULL GROUP BY o_custkey
    ),
    agg AS (SELECT * FROM agg0 WHERE total_spend IS NOT NULL)
    SELECT a.o_custkey, a.n_orders,
           CAST(a.total_spend AS DOUBLE) AS total_spend
    FROM agg a
    WHERE NOT EXISTS (
        SELECT 1 FROM agg b
        WHERE b.total_spend >= a.total_spend
          AND b.n_orders >= a.n_orders
          AND (b.total_spend > a.total_spend OR b.n_orders > a.n_orders)
    )
    """,
)
def skyline_customer_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto-frontier query: customers not strictly dominated
    on (total spend, order count) — "who is inarguably a top customer".
    A new operator class (multi-objective preference query, the classic
    SKYLINE OF from the literature).

    The Spark plan is `operators.ranking.pareto_frontier_2d`: bucketed
    LOCAL frontier pruning, then ONE global sorted sweep over the tiny
    survivor set — O(n log n) with no single-task scan of n, vs the
    oracle which states the O(n²) NOT-EXISTS dominance definition
    directly (sound at driver-check scale). Equal (spend, count) points
    tie and survive together via the join-back on the frontier point set.
    Money stays in DECIMAL(18,2) end to end; NULL customer keys are
    excluded on both engines.
    """
    orders = load(spark, sf_dir, "orders")
    agg = (
        orders.filter(F.col("o_custkey").isNotNull())
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias(
                "total_spend"
            ),
        )
        # A customer whose prices are ALL NULL aggregates to NULL
        # total_spend, which violates pareto_frontier_2d's non-NULL x/y
        # contract (and the oracle's NOT-EXISTS dominance test is 3VL-blind
        # to it) — exclude the row identically on both engines (the
        # oracle's agg CTE carries the same IS NOT NULL predicate).
        .filter(F.col("total_spend").isNotNull())
    )
    frontier = pareto_frontier_2d(agg, "total_spend", "n_orders")
    # DECIMAL end-to-end internally; the registered output casts money to
    # DOUBLE at the boundary (driver hash canonicalization contract —
    # tests/test_schema_alignment.py), after all comparisons are done.
    return agg.join(
        F.broadcast(frontier), ["total_spend", "n_orders"]
    ).select(
        "o_custkey", "n_orders", F.col("total_spend").cast("double").alias("total_spend")
    )


def _floor_bucket_us(bucket_us: int):
    """FLOOR-division time bucket from unix_micros. `div` truncates
    toward zero, which shifts every negative NON-multiple up one bucket;
    case analysis shows the 2-bucket covering still holds, but only via a
    sign-dependent argument — floor buckets make it unconditional
    (window end in bucket b ⇒ start in b-1 or b, any sign). pmod's
    nonnegative remainder makes the subtraction an exact multiple, so
    the double division is exact (same idiom as `_idiv_min`)."""
    m = F.unix_micros(F.col("ts"))
    return ((m - F.pmod(m, F.lit(bucket_us))) / F.lit(bucket_us)).cast("bigint")


@workload(
    "attribution_position_based",
    oracle="""
    WITH ev AS (
        SELECT event_id, user_id, ts, event_type FROM events
        WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_id IS NOT NULL
    ),
    p AS (SELECT user_id, ts AS pts, event_id AS pid
          FROM ev WHERE event_type = 'purchase'),
    t AS (SELECT user_id, ts AS tts, event_id AS tid
          FROM ev WHERE event_type IN ('view', 'click')),
    cand AS (
        SELECT p.pid, t.tid, t.tts FROM p JOIN t
          ON p.user_id = t.user_id
         AND t.tts < p.pts AND t.tts >= p.pts - INTERVAL 7 DAY
    ),
    rk AS (
        SELECT pid, tid,
               row_number() OVER (PARTITION BY pid ORDER BY tts, tid) AS pos,
               count(*) OVER (PARTITION BY pid) AS k
        FROM cand
    )
    SELECT pid AS purchase_id, tid AS touch_event_id,
           CAST(pos AS BIGINT) AS pos, CAST(k AS BIGINT) AS n_touches,
           CAST(CASE WHEN k = 1 THEN 10000
                     WHEN k = 2 THEN 5000
                     WHEN pos = 1 OR pos = k THEN 4000
                     ELSE 2000 // (k - 2)
                          + CASE WHEN pos = k - 1 THEN 2000 % (k - 2) ELSE 0 END
                END AS BIGINT) AS credit_bps
    FROM rk
    """,
)
def attribution_position_based(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped (position-based) multi-touch attribution in EXACT basis
    points: each purchase splits 10000 bps across its view/click touches
    of the prior 7 days — 40/40 to first and last, middles share 2000 via
    integer division with the remainder pinned to the last middle, so
    credits sum to exactly 10000 per purchase on any engine (no float
    split, no drifting percentages).

    Scale shape: purchase×touch candidates come from the bucketized
    range-join pattern (`range_join_ship_week`): both sides bucketed to
    the 7-day grain, purchases exploded to the 2 covering buckets,
    equi-join on (user, bucket) + exact residual — never a per-user
    theta join. Ranking then partitions by purchase id (bounded groups).
    NULL user/ts/event_id rows are excluded on both engines.
    """
    bucket_us = 7 * 86400 * 1_000_000
    ev = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("event_id").isNotNull()
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("pts"),
        F.col("event_id").alias("pid"),
        _floor_bucket_us(bucket_us).alias("p_bucket"),
    )
    touch = ev.filter(F.col("event_type").isin("view", "click")).select(
        "user_id",
        F.col("ts").alias("tts"),
        F.col("event_id").alias("tid"),
        _floor_bucket_us(bucket_us).alias("t_bucket"),
    )
    probes = purch.withColumn(
        "t_bucket",
        F.explode(F.array(F.col("p_bucket") - 1, F.col("p_bucket"))),
    )
    cand = probes.join(touch, ["user_id", "t_bucket"]).filter(
        (F.col("tts") < F.col("pts"))
        & (F.col("tts") >= F.col("pts") - F.expr("INTERVAL 7 DAYS"))
    )
    win = Window.partitionBy("pid")
    rk = cand.select(
        "pid",
        "tid",
        F.row_number()
        .over(win.orderBy("tts", "tid"))
        .cast("bigint")
        .alias("pos"),
        F.count(F.lit(1)).over(win).cast("bigint").alias("k"),
    )
    return rk.select(
        F.col("pid").alias("purchase_id"),
        F.col("tid").alias("touch_event_id"),
        "pos",
        F.col("k").alias("n_touches"),
        F.expr(
            "CAST(CASE WHEN k = 1 THEN 10000"
            "          WHEN k = 2 THEN 5000"
            "          WHEN pos = 1 OR pos = k THEN 4000"
            "          ELSE 2000 div (k - 2)"
            "               + CASE WHEN pos = k - 1 THEN 2000 % (k - 2)"
            "                      ELSE 0 END"
            "     END AS BIGINT)"
        ).alias("credit_bps"),
    )


@workload(
    "rolling_distinct_users",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ),
    days AS (SELECT DISTINCT day FROM ud)
    SELECT d.day AS end_day,
           CAST(count(DISTINCT u.user_id) AS BIGINT) AS n_users_7d
    FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
    GROUP BY d.day
    """,
)
def rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users (the product-metrics WAU curve): for
    each ACTIVE day, the exact distinct-user count over the window ending
    that day. Distinct-over-sliding-windows does NOT decompose like a sum
    — the exact pattern is the k-way expansion: each (user, day) pair
    contributes itself to the 7 windows it can close, then one
    count_distinct per end day.

    Scale shape: the expansion multiplies the DISTINCT (user, day) pairs
    (not raw events) by exactly 7 before the final shuffle — linear,
    bounded, no per-window re-scan; the 100 TB escape hatch when 7× is
    too much is the mergeable-sketch path already proven by
    `approx_distinct_error`. Windows ending on inactive days are excluded
    by construction (the end-day set is the active-day set — same join in
    the oracle). NULL user/ts rows are excluded on both engines.
    """
    ud = (
        load(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    days = ud.select("day").distinct()
    expanded = ud.select(
        "user_id",
        F.explode(
            F.expr("transform(sequence(0, 6), i -> date_add(day, i))")
        ).alias("end_day"),
    )
    return (
        expanded.join(
            F.broadcast(days.select(F.col("day").alias("end_day"))),
            "end_day",
            "semi",
        )
        .groupBy("end_day")
        .agg(F.count_distinct("user_id").cast("bigint").alias("n_users_7d"))
    )


_KHOP_EDGE_CTES = """items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
    ),
    edges AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        GROUP BY 1, 2
    )"""


@workload(
    "graph_khop_reach",
    iterative=True,
    oracle=f"""
    WITH RECURSIVE {_KHOP_EDGE_CTES},
    seeds AS (
        SELECT DISTINCT p_partkey AS node FROM part
        WHERE p_size = 1 AND p_partkey IS NOT NULL
    ),
    reach(node, hops) AS (
        SELECT node, 0 FROM seeds
        UNION
        SELECT e.dst, r.hops + 1
        FROM reach r JOIN edges e ON e.src = r.node
        WHERE r.hops < 3
    )
    SELECT node AS partkey, CAST(min(hops) AS INT) AS hops
    FROM reach GROUP BY node
    """,
)
def graph_khop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-radius reachability: minimum co-purchase hop distance
    (≤ 3) from the size-1 parts — "how close is every product to the
    seed assortment". Third member of the iterative-graph family
    (components, PageRank, now BFS), exercising the level-synchronous
    frontier shape where each round is one edge join + one anti-join and
    a node is expanded at most once (`operators.graph.bfs_min_hops`).

    The oracle states the same bound as a recursive CTE whose UNION
    dedups (node, hop) pairs; min(hop) per node is the BFS distance —
    integer-only, so the match is exact. Scale: the co-purchase edges are
    generated map-side per basket (the measured C(k,2) HOF expansion from
    `graph_pagerank_parts`), and BFS touches each edge at most once per
    round with the frontier shrinking monotonically; contrast with the
    oracle's path enumeration, which is exponential in dense graphs.
    NULL keys are filtered before pairing on both sides.
    """
    li = load(spark, sf_dir, "lineitem")
    items = (
        li.filter(F.col("l_orderkey").isNotNull() & F.col("l_partkey").isNotNull())
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    baskets = items.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("parts")
    )
    half = (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(parts, (x, i) -> "
                    "transform(slice(parts, i + 2, size(parts)), "
                    "y -> struct(x AS a, y AS b))))"
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
        .distinct()
    )
    edges = (
        half.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .union(half.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .persist()
    )
    seeds = (
        load(spark, sf_dir, "part")
        .filter((F.col("p_size") == 1) & F.col("p_partkey").isNotNull())
        .select(F.col("p_partkey").alias("node"))
    )
    reached = bfs_min_hops(edges, seeds, max_hops=3)
    edges.unpersist()
    return reached.select(F.col("node").alias("partkey"), F.col("hops"))


@workload(
    "timeseries_multigrain_rollup",
    oracle="""
    WITH b AS (
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bh,
               CAST(date_trunc('day',  ts) AS TIMESTAMP) AS bd,
               CAST(date_trunc('week', ts) AS TIMESTAMP) AS bw,
               value
        FROM events WHERE ts IS NOT NULL
    )
    SELECT CASE WHEN GROUPING(bh) = 0 THEN 'hour'
                WHEN GROUPING(bd) = 0 THEN 'day' ELSE 'week' END AS grain,
           coalesce(bh, bd, bw) AS bucket_ts,
           count(*) AS n_events,
           CAST(sum(CASE WHEN abs(value) < 1e15
                         THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE)
               AS total_value
    FROM b
    GROUP BY GROUPING SETS ((bh), (bd), (bw))
    """,
)
def timeseries_multigrain_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: the SAME event stream
    aggregated at hour, day, and week grain in ONE pass. GROUPING SETS
    over the three precomputed buckets makes Catalyst expand the scan
    once (a single Expand + partial agg + one exchange) instead of three
    separate scan/shuffle pipelines — at 100 TB that is one read of the
    fact table for the whole rollup hierarchy, the multi-grain matview
    refresh shape (TimescaleDB continuous aggregates, Druid rollup).

    Grain is derived from GROUPING() (not bucket NULL-ness alone) so a
    hypothetical NULL bucket can't masquerade as a coarser grain; ts is
    filtered non-NULL on both sides. Week truncation is ISO-Monday in
    both engines (DuckDB returns DATE for week — CAST unifies). The value
    sum carries the registry's guarded DECIMAL(18,2) money contract.
    """
    ev = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    b = ev.select(
        F.date_trunc("hour", "ts").alias("bh"),
        F.date_trunc("day", "ts").alias("bd"),
        F.date_trunc("week", "ts").alias("bw"),
        "value",
    )
    return (
        b.groupingSets([["bh"], ["bd"], ["bw"]], "bh", "bd", "bw")
        .agg(
            # grouping() resolves only during the aggregate — computed
            # here, consumed by the grain CASE one projection later.
            F.expr("grouping(bh)").alias("g_bh"),
            F.expr("grouping(bd)").alias("g_bd"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.when(F.abs(F.col("value")) < 1e15, F.col("value").cast("decimal(18,2)"))
            )
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.when(F.col("g_bh") == 0, F.lit("hour"))
            .when(F.col("g_bd") == 0, F.lit("day"))
            .otherwise(F.lit("week"))
            .alias("grain"),
            F.coalesce("bh", "bd", "bw").alias("bucket_ts"),
            "n_events",
            "total_value",
        )
    )


@workload(
    "cep_funnel_regex",
    oracle="""
    WITH seq AS (
        SELECT user_id,
               string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
                   AS s
        FROM events
        WHERE user_id IS NOT NULL AND ts IS NOT NULL
          AND event_id IS NOT NULL AND event_type IS NOT NULL
        GROUP BY user_id
    )
    SELECT user_id,
           CAST(length(s) AS BIGINT) AS seq_len,
           CAST(len(regexp_extract_all(s, 'vc+p')) AS BIGINT) AS n_funnels
    FROM seq
    """,
)
def cep_funnel_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex-event-processing pattern match (Flink CEP / MATCH_RECOGNIZE
    strict contiguity): per user, how many times does the exact sequence
    view → click⁺ → purchase occur with NO intervening event? The event
    history compresses to one character per event (the five generated
    types have distinct initials) ordered by (ts, event_id) — a total
    order — and the pattern becomes a regex over that string; counting is
    leftmost non-overlapping in both engines, and the pattern avoids
    constructs where Java and RE2 semantics diverge (no \\b, no
    backrefs).

    Scale: one groupBy shuffle keyed on user; per-user history must fit a
    row (bounded event cardinality per user — same contract as
    `session_paths_topk`); the regex evaluates JVM-side per row, no UDF.
    """
    ev = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("event_id").isNotNull()
        & F.col("event_type").isNotNull()
    )
    seq = (
        ev.select(
            "user_id",
            F.struct("ts", "event_id", F.substring("event_type", 1, 1).alias("ch")).alias(
                "o"
            ),
        )
        .groupBy("user_id")
        .agg(
            F.expr("array_join(transform(array_sort(collect_list(o)), x -> x.ch), '')")
            .alias("s")
        )
    )
    return seq.select(
        "user_id",
        F.length("s").cast("bigint").alias("seq_len"),
        F.expr("regexp_count(s, 'vc+p')").cast("bigint").alias("n_funnels"),
    )


@workload(
    "drift_value_chi2",
    oracle="""
    WITH ev AS (
        SELECT CAST(floor(value / 25) AS BIGINT) AS bin,
               CAST(floor(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) / 7)
                    AS BIGINT) AS wk
        FROM events
        WHERE value IS NOT NULL AND NOT isnan(value)
          AND value >= 0 AND value < 1e6 AND ts IS NOT NULL
    ),
    c AS (
        SELECT bin,
               count(*) FILTER (wk = 0) AS n_ref,
               count(*) FILTER (wk = 1) AS n_cur
        FROM ev WHERE wk IN (0, 1) GROUP BY bin
    ),
    t AS (
        SELECT bin, n_ref, n_cur,
               sum(n_ref) OVER () AS tot_ref,
               sum(n_cur) OVER () AS tot_cur
        FROM c
    )
    SELECT bin, CAST(n_ref AS BIGINT) AS n_ref, CAST(n_cur AS BIGINT) AS n_cur,
           CASE WHEN n_ref > 0 THEN
               (CAST(n_cur AS DOUBLE)
                   - CAST(n_ref AS DOUBLE) * CAST(tot_cur AS DOUBLE)
                     / CAST(tot_ref AS DOUBLE))
               * (CAST(n_cur AS DOUBLE)
                   - CAST(n_ref AS DOUBLE) * CAST(tot_cur AS DOUBLE)
                     / CAST(tot_ref AS DOUBLE))
               / (CAST(n_ref AS DOUBLE) * CAST(tot_cur AS DOUBLE)
                     / CAST(tot_ref AS DOUBLE))
           END AS chi2_term
    FROM t
    """,
)
def drift_value_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor: chi-square contribution per value bin,
    week 2 observed vs week 1 expected — the data-quality gate that
    catches an upstream schema/unit change before it poisons training
    data. Exact integer bin counts flow through ONE groupBy; the totals
    come from an unpartitioned window over the ≤|bins| summary rows (the
    tiny-side SinglePartition, same budget as the scan operators); the
    only floats are the final expected/term expressions, written with the
    identical association in both engines on identical integers. Bins
    with no reference mass report NULL (no defensible expectation), not
    +inf."""
    ev = (
        load(spark, sf_dir, "events")
        .filter(
            F.col("value").isNotNull()
            & ~F.isnan(F.col("value"))
            & (F.col("value") >= 0)
            & (F.col("value") < 1e6)
            & F.col("ts").isNotNull()
        )
        .select(
            F.floor(F.col("value") / 25).cast("bigint").alias("bin"),
            F.floor(
                F.datediff(
                    F.to_date("ts"), F.lit("2024-01-01").cast("date")
                )
                / 7
            )
            .cast("bigint")
            .alias("wk"),
        )
        .filter(F.col("wk").isin(0, 1))
    )
    c = ev.groupBy("bin").agg(
        F.count(F.when(F.col("wk") == 0, 1)).alias("n_ref"),
        F.count(F.when(F.col("wk") == 1, 1)).alias("n_cur"),
    )
    wall = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    t = c.select(
        "bin",
        "n_ref",
        "n_cur",
        F.sum("n_ref").over(wall).alias("tot_ref"),
        F.sum("n_cur").over(wall).alias("tot_cur"),
    )
    e = (
        F.col("n_ref").cast("double")
        * F.col("tot_cur").cast("double")
        / F.col("tot_ref").cast("double")
    )
    d = F.col("n_cur").cast("double") - e
    return t.select(
        "bin",
        F.col("n_ref").cast("bigint").alias("n_ref"),
        F.col("n_cur").cast("bigint").alias("n_cur"),
        F.when(F.col("n_ref") > 0, d * d / e).alias("chi2_term"),
    )


# Shared first-half/second-half split + value guards for the two-sample
# drift statistics below (chi2 above uses week bins; these use raw values).
_TWO_SAMPLE_PTS_SQL = """
    pts AS (
        SELECT value AS v,
               CASE WHEN CAST(ts AS DATE) <= DATE '2024-01-15' THEN 0 ELSE 1 END AS cur
        FROM events
        WHERE value IS NOT NULL AND NOT isnan(value)
          AND value >= 0 AND value < 1e6 AND ts IS NOT NULL
    )"""


def _two_sample_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(v double, cur int) — events value observations split first half of
    the month (ref, cur=0) vs second half (cur=1), with the same NaN/range
    guards as drift_value_chi2. -0.0 passes the >= 0 guard on both
    engines and both group it WITH +0.0 (Spark normalizes float group
    keys; DuckDB groups by IEEE equality) — and v itself is never
    emitted, only counts derived from it."""
    return (
        load(spark, sf_dir, "events")
        .filter(
            F.col("value").isNotNull()
            & ~F.isnan(F.col("value"))
            & (F.col("value") >= 0)
            & (F.col("value") < 1e6)
            & F.col("ts").isNotNull()
        )
        .select(
            F.col("value").alias("v"),
            F.when(
                F.to_date("ts") <= F.lit("2024-01-15").cast("date"), 0
            ).otherwise(1).alias("cur"),
        )
    )


@workload(
    "drift_ks_value",
    oracle=f"""
    WITH {_TWO_SAMPLE_PTS_SQL},
    g AS (
        SELECT v, count(*) FILTER (cur = 0) AS nr,
               count(*) FILTER (cur = 1) AS ncur
        FROM pts GROUP BY v
    ),
    c AS (
        SELECT sum(nr) OVER (ORDER BY v) AS cr,
               sum(ncur) OVER (ORDER BY v) AS cc
        FROM g
    ),
    t AS (SELECT sum(nr) AS tr, sum(ncur) AS tc FROM g)
    SELECT CAST(t.tr AS BIGINT) AS n_ref, CAST(t.tc AS BIGINT) AS n_cur,
           CAST(max(abs(c.cr * t.tc - c.cc * t.tr)) AS BIGINT) AS d_num,
           CAST(max(abs(c.cr * t.tc - c.cc * t.tr)) AS DOUBLE)
               / (CAST(t.tr AS DOUBLE) * CAST(t.tc AS DOUBLE)) AS ks_d
    FROM c, t GROUP BY t.tr, t.tc
    """,
)
def drift_ks_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift statistic over the events
    value distribution, first half of the month vs second —
    D = max_x |ECDF_ref(x) − ECDF_cur(x)|, evaluated exactly at every
    observed value (ECDFs are step functions, so the max over step
    points is the max over ℝ). The nonparametric companion to
    `drift_value_chi2`: no binning choice, sensitive to location AND
    shape changes.

    Distributed shape: ONE groupBy(value) for per-point counts, then the
    two cumulative counts ride `operators.scan.bucketed_running_sum`
    (per-bucket windows + broadcast carry — no one-task global window
    even though the ECDF needs a global order), a 1-row broadcast
    cross-join for the totals, and a final max-aggregate. All integers
    until the last division: D's numerator is max |cum_ref·N_cur −
    cum_cur·N_ref| in bigints (exact in any association; products bounded
    by N_ref·N_cur — switch the comparison column to DECIMAL(38,0) past
    ~3·10⁹ rows per side), so the oracle matches bit-for-bit and ks_d is
    one identical double division at the boundary. Core:
    `operators.stats.ks_statistic` (property-tested against a Python
    brute-force ECDF)."""
    from ..operators.stats import ks_statistic

    pts = _two_sample_points(spark, sf_dir)
    bucket = F.floor(F.col("v") / F.lit(16.0)).cast("bigint")
    return ks_statistic(pts, "v", "cur", bucket)


@workload(
    "drift_rank_mannwhitney",
    oracle=f"""
    WITH {_TWO_SAMPLE_PTS_SQL},
    g AS (
        SELECT v, count(*) AS cnt,
               count(*) FILTER (cur = 1) AS ncur
        FROM pts GROUP BY v
    ),
    c AS (
        SELECT cnt, ncur, sum(cnt) OVER (ORDER BY v) AS cum
        FROM g
    ),
    t AS (SELECT sum(cnt) - sum(ncur) AS tr, sum(ncur) AS tc FROM g)
    SELECT CAST(t.tr AS BIGINT) AS n_ref, CAST(t.tc AS BIGINT) AS n_cur,
           CAST(sum(c.ncur * (2 * (c.cum - c.cnt) + c.cnt + 1)) AS BIGINT)
               AS two_ranksum_cur,
           CAST(sum(c.ncur * (2 * (c.cum - c.cnt) + c.cnt + 1))
                - t.tc * (t.tc + 1) AS BIGINT) AS two_u_cur
    FROM c, t GROUP BY t.tr, t.tc
    """,
)
def drift_rank_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U (Wilcoxon rank-sum) for the same two-sample drift
    split — the location-shift test that needs GLOBAL ranks with
    average-rank tie handling, the classic one-task-sort trap. Doubling
    keeps ties integer-exact: a value with cnt tied observations starting
    after cumulative count b has average rank b + (cnt+1)/2, so
    2·avg_rank = 2b + cnt + 1 — integers end to end, no half-rank
    floats, and 2·ranksum / 2·U are what's emitted (two_u_cur =
    2·ranksum_cur − n_cur·(n_cur+1)).

    Distributed shape: groupBy(value) → ONE `bucketed_running_sum` pass
    for the inclusive cumulative count (per-bucket windows + broadcast
    carry, no global window) → one map-side-combinable sum. The oracle
    replays the identical integer recurrence through a SQL window. Core:
    `operators.stats.mannwhitney_2u` (property-tested against a Python
    brute-force average-rank computation)."""
    from ..operators.stats import mannwhitney_2u

    pts = _two_sample_points(spark, sf_dir)
    bucket = F.floor(F.col("v") / F.lit(16.0)).cast("bigint")
    return mannwhitney_2u(pts, "v", "cur", bucket)


@workload(
    "cdc_apply_changelog",
    oracle="""
    WITH log AS (
        SELECT user_id,
               CASE WHEN event_type = 'purchase' THEN 'D'
                    WHEN event_type = 'click' THEN 'U' ELSE 'I' END AS op,
               CASE WHEN value IS NOT NULL AND NOT isnan(value)
                         AND abs(value) < 1e12
                    THEN CAST(floor(value * 100) AS BIGINT) END AS cents,
               ts, event_id
        FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ),
    ranked AS (
        SELECT user_id, op, cents,
               row_number() OVER (
                   PARTITION BY user_id
                   ORDER BY ts DESC NULLS LAST, event_id DESC NULLS LAST,
                            op DESC NULLS LAST, cents DESC NULLS LAST) AS rn,
               count(*) OVER (PARTITION BY user_id) AS n_ops
        FROM log
    )
    SELECT user_id, op AS last_op, cents AS last_cents,
           CAST(n_ops AS BIGINT) AS n_ops
    FROM ranked WHERE rn = 1 AND op <> 'D'
    """,
)
def cdc_apply_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog apply with DELETE tombstones — the lakehouse
    "materialize a Debezium/CDF log" operator: events become an ordered
    per-key op stream (purchase→D, click→U, else I) and the live table
    state is each key's LAST op, with keys whose final op is a delete
    absent from the result. The upsert half is the engine's standard
    top-1-per-key (WindowGroupLimit map-side trim — same plan family as
    `o15_window_dedup`); the tombstone is one post-window filter, which
    is the whole point: at 100 TB "apply the log" costs exactly one
    dedup-shaped shuffle, never a per-op loop. The total order is pinned
    (ts, event_id, op, cents) DESC NULLS LAST identically on both
    engines, so concurrent same-timestamp ops resolve deterministically."""
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select(
            "user_id",
            F.when(F.col("event_type") == "purchase", "D")
            .when(F.col("event_type") == "click", "U")
            .otherwise("I")
            .alias("op"),
            F.when(
                F.col("value").isNotNull()
                & ~F.isnan(F.col("value"))
                & (F.abs(F.col("value")) < 1e12),
                F.floor(F.col("value") * 100).cast("bigint"),
            ).alias("cents"),
            "ts",
            "event_id",
        )
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc_nulls_last(),
        F.col("event_id").desc_nulls_last(),
        F.col("op").desc_nulls_last(),
        F.col("cents").desc_nulls_last(),
    )
    wc = Window.partitionBy("user_id")
    return (
        ev.withColumn("__rn", F.row_number().over(w))
        .withColumn("n_ops", F.count(F.lit(1)).over(wc))
        .filter((F.col("__rn") == 1) & (F.col("op") != "D"))
        .select(
            "user_id",
            F.col("op").alias("last_op"),
            F.col("cents").alias("last_cents"),
            F.col("n_ops").cast("bigint").alias("n_ops"),
        )
    )


@workload(
    "abtest_conversion_exact",
    oracle="""
    WITH u AS (
        SELECT user_id,
               CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 32, 1)
                         IN ('0','1','2','3','4','5','6','7')
                    THEN 'A' ELSE 'B' END AS variant,
               CAST(max(CASE WHEN event_type = 'purchase'
                              AND value IS NOT NULL AND NOT isnan(value)
                              AND value >= 300 AND value < 1e6
                             THEN 1 ELSE 0 END)
                    AS BIGINT) AS converted
        FROM events WHERE user_id IS NOT NULL
        GROUP BY user_id
    ),
    v AS (
        -- COALESCE mirrors the Spark side: an empty variant (e.g. an
        -- empty or all-NULL events table) must emit x=0, not NULL, so
        -- the hashed outputs agree on degenerate inputs (ADVICE r06).
        SELECT count(*) FILTER (variant = 'A') AS n_a,
               COALESCE(sum(converted) FILTER (variant = 'A'), 0) AS x_a,
               count(*) FILTER (variant = 'B') AS n_b,
               COALESCE(sum(converted) FILTER (variant = 'B'), 0) AS x_b
        FROM u
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(x_a AS BIGINT) AS x_a,
           CAST(n_b AS BIGINT) AS n_b, CAST(x_b AS BIGINT) AS x_b,
           CAST(CASE WHEN n_a > 0 AND n_b > 0
                      AND (x_a + x_b) > 0
                      AND (n_a + n_b - x_a - x_b) > 0
                     THEN CASE WHEN
                          100000 * (n_a + n_b)
                              * (x_a * n_b - x_b * n_a)
                              * (x_a * n_b - x_b * n_a)
                          >= 384146 * n_a * n_b * (x_a + x_b)
                              * (n_a + n_b - x_a - x_b)
                          THEN 1 ELSE 0 END
                     ELSE 0 END AS BIGINT) AS significant_95
    FROM v
    """,
)
def abtest_conversion_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B test with an EXACT significance decision: users hash-split
    into variants (portable md5 last-nibble — replayable in any engine,
    unlike Spark's private hash()), conversion = a HIGH-VALUE purchase
    (≥ $300 — "any purchase" is degenerate on this corpus: every user
    converts and the N−X margin zeroes out), and the 2×2 Pearson
    chi-square compared against the 95% critical value entirely in exact
    arithmetic (`operators.stats.chi2_2x2_significant_95`):

        χ² = N·(x_a·n_b − x_b·n_a)² / (n_a·n_b·X·(N−X)) ≥ 3.84146
        ⟺ 100000·N·D² ≥ 384146·n_a·n_b·X·(N−X)

    — no float ever computed, so the accept/reject bit is bit-identical
    cross-engine (the classic failure is a χ² that floats to
    3.8414599999 on one engine and 3.84146 on the other). Spark
    accumulates the cross-products in DECIMAL(38,0) (D² ≈ 1e16, lhs
    ≈ 1e21 at sf0.1 — inside 38 digits up to ~10¹² users); DuckDB's
    integer ops auto-promote to HUGEINT. Degenerate margins (an empty
    variant, zero or all conversions) are defined as not-significant on
    both engines; a random split on homogeneous data correctly reports
    0 — the significant=1 branch is property-tested in isolation with
    counts on both sides of the critical value. One groupBy(user) + one
    global aggregate."""
    from ..operators.stats import chi2_2x2_significant_95

    u = (
        load(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & F.col("value").isNotNull()
                    & ~F.isnan(F.col("value"))
                    & (F.col("value") >= 300)
                    & (F.col("value") < 1e6),
                    1,
                ).otherwise(0)
            ).alias("converted")
        )
        .withColumn(
            "variant",
            F.when(
                F.substring(F.md5(F.col("user_id").cast("string")), 32, 1).isin(
                    *"01234567"
                ),
                "A",
            ).otherwise("B"),
        )
    )
    v = u.agg(
        F.count(F.when(F.col("variant") == "A", 1)).alias("n_a"),
        F.sum(F.when(F.col("variant") == "A", F.col("converted"))).alias("x_a"),
        F.count(F.when(F.col("variant") == "B", 1)).alias("n_b"),
        F.sum(F.when(F.col("variant") == "B", F.col("converted"))).alias("x_b"),
    ).select(
        *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in ("n_a", "x_a", "n_b", "x_b")]
    )
    return v.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("x_a").cast("bigint").alias("x_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.col("x_b").cast("bigint").alias("x_b"),
        chi2_2x2_significant_95(
            F.col("n_a"), F.col("x_a"), F.col("n_b"), F.col("x_b")
        ).alias("significant_95"),
    )


@workload(
    "skew_key_gini",
    oracle="""
    WITH c AS (
        SELECT l_partkey AS k, count(*) AS cnt
        FROM lineitem WHERE l_partkey IS NOT NULL GROUP BY l_partkey
    ),
    r AS (
        SELECT cnt, row_number() OVER (ORDER BY cnt, k) AS i FROM c
    ),
    t AS (SELECT count(*) AS n, sum(cnt) AS tot FROM c)
    SELECT CAST(t.n AS BIGINT) AS n_keys,
           CAST(t.tot AS BIGINT) AS total_rows,
           CAST(sum((2 * r.i - t.n - 1) * r.cnt) AS BIGINT) AS gini_num,
           CAST(sum((2 * r.i - t.n - 1) * r.cnt) AS DOUBLE)
               / (CAST(t.n AS DOUBLE) * CAST(t.tot AS DOUBLE)) AS gini
    FROM r, t GROUP BY t.n, t.tot
    """,
)
def skew_key_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew profiler: the exact Gini coefficient of the per-partkey
    row-count distribution — G = Σ(2i−n−1)·x_i / (n·Σx) over counts
    sorted ascending — the one-number answer to "will this join key
    skew a reducer?" that a shuffle planner wants BEFORE launching the
    join (G≈0 uniform, G→1 one hot key owns everything).

    The rank i over the global (count, key) order comes from
    `ranking.global_row_number` (range partition + per-partition
    row_number + ≤#partitions offset scalars — its third consumer; the
    oracle states the same rank as a one-task window, sound at check
    scale). The numerator is an exact bigint (tie-insensitive: equal
    counts contribute count-weighted consecutive ranks whose sum is
    order-free), totals ride a 1-row broadcast, and the only float is
    the final division of identical integers. Past ~10⁹ keys the
    (2i−n−1)·x products outgrow bigint — switch the accumulator to
    DECIMAL(38,0), the shape is unchanged."""
    from ..operators.ranking import global_row_number

    li = load(spark, sf_dir, "lineitem")
    c = (
        li.filter(F.col("l_partkey").isNotNull())
        .groupBy(F.col("l_partkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    r = global_row_number(c, [F.col("cnt"), F.col("k")], "i")
    totals = c.agg(F.count(F.lit(1)).alias("n"), F.sum("cnt").alias("tot"))
    return (
        r.crossJoin(F.broadcast(totals))
        .groupBy("n", "tot")
        .agg(
            F.sum(
                (2 * F.col("i") - F.col("n") - 1) * F.col("cnt")
            ).alias("gini_num")
        )
        .select(
            F.col("n").cast("bigint").alias("n_keys"),
            F.col("tot").cast("bigint").alias("total_rows"),
            F.col("gini_num").cast("bigint").alias("gini_num"),
            (
                F.col("gini_num").cast("double")
                / (F.col("n").cast("double") * F.col("tot").cast("double"))
            ).alias("gini"),
        )
    )


@workload(
    "agg_event_type_salted",
    oracle="""
    SELECT event_type,
           CAST(sum(CASE WHEN value IS NOT NULL AND NOT isnan(value)
                          AND abs(value) < 1e6
                         THEN CAST(floor(value * 100) AS BIGINT) END)
                AS BIGINT) AS total,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM events GROUP BY event_type
    """,
)
def agg_event_type_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-stress aggregate (VERDICT r06 ask #4): total cents + row
    count per event_type, routed through ``skew.salted_sum_count`` so
    the salted path is oracle-checked and bench-timed every round, not
    just equivalence-tested. events has only 5 distinct types — the
    pathological low-cardinality case where a plain groupBy funnels the
    whole table through 5 reducers; the salted rewrite spreads each hot
    key over 16 (keys × salt) partials and re-aggregates the tiny
    partial table. Algebraic rewrite: the salt NEVER affects the final
    sums (bigint cents, order-insensitive), so the output is
    bit-identical to the plain GROUP BY oracle no matter how rand()
    lands — which is exactly what makes a salted plan safe to drop into
    an existing pipeline. NaN/overflow-guarded cents as elsewhere;
    NULL-valued rows still count toward n_rows (sum skips, count(*)
    doesn't)."""
    from ..operators.skew import salted_sum_count

    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.when(
            F.col("value").isNotNull()
            & ~F.isnan(F.col("value"))
            & (F.abs(F.col("value")) < 1e6),
            F.floor(F.col("value") * 100).cast("bigint"),
        ).alias("cents"),
    )
    out = salted_sum_count(ev, ["event_type"], "cents", n_salts=16)
    return out.select(
        "event_type",
        F.col("total").cast("bigint").alias("total"),
        F.col("n_rows").cast("bigint").alias("n_rows"),
    )


@workload(
    "timeseries_twap_user",
    oracle="""
    WITH obs AS (
        SELECT user_id, ts, event_id,
               CAST(floor(value * 100) AS BIGINT) AS cents
        FROM events
        WHERE user_id IS NOT NULL AND ts IS NOT NULL
          AND value IS NOT NULL AND NOT isnan(value) AND abs(value) < 1e4
    ),
    seg AS (
        SELECT user_id, cents,
               epoch_us(lead(ts) OVER w) - epoch_us(ts) AS dur_us
        FROM obs
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY ts ASC NULLS LAST, event_id ASC NULLS LAST,
                              cents ASC NULLS LAST)
    ),
    g AS (
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_segments,
               CAST(sum(CAST(cents AS DECIMAL(18,0))
                        * CAST(dur_us AS DECIMAL(18,0))) AS BIGINT)
                   AS twap_num,
               CAST(sum(dur_us) AS BIGINT) AS dur_us
        FROM seg WHERE dur_us IS NOT NULL
        GROUP BY user_id
    )
    SELECT user_id, n_segments, twap_num, dur_us,
           CASE WHEN dur_us > 0 THEN
               CAST(twap_num AS DOUBLE) / CAST(dur_us AS DOUBLE)
           END AS twap_cents
    FROM g
    """,
)
def timeseries_twap_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (TWAP / TimescaleDB `time_weight`, LOCF
    interpolation) of the event value per user: between consecutive
    observations the value holds piecewise-constant, so the average
    weights each reading by the integer MICROSECONDS until the next one —
    the correct aggregate for irregularly-sampled series, where a plain
    AVG over-weights bursts. The final (open-ended) observation carries
    no duration and drops out, identically on both engines.

    All-integer accumulation, with the guard enforcing the overflow
    bound it relies on (ADVICE r06): abs(value) < 1e4 caps cents below
    1e6, so per-user sum(cents·dur_us) ≤ 1e6 × user_span_µs — inside
    bigint for corpora spanning up to ~106 days (the committed events
    table spans 30 days with value < 491, i.e. ≤ ~1.3e17, >60×
    headroom). Belt-and-braces, the numerator ACCUMULATES in
    DECIMAL(38,0) on both engines (Spark decimal sum / DuckDB HUGEINT-
    backed decimal), so even past that bound the sum itself never
    silently wraps — only the final BIGINT cast would surface it, and
    identically-valued sums cast identically. Numerator/denominator
    sums are order-insensitive; the only float is the single boundary
    division of two already-identical integers. One per-user lead
    window (fully parallel) + one map-side-combinable aggregate; ties
    in the total order carry zero duration, so tie-order can never
    change the integral."""
    ev = (
        load(spark, sf_dir, "events")
        .filter(
            F.col("user_id").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("value").isNotNull()
            & ~F.isnan(F.col("value"))
            & (F.abs(F.col("value")) < 1e4)
        )
        .select(
            "user_id",
            "ts",
            "event_id",
            F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
        )
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc_nulls_last(),
        F.col("event_id").asc_nulls_last(),
        F.col("cents").asc_nulls_last(),
    )
    seg = ev.select(
        "user_id",
        "cents",
        (F.unix_micros(F.lead("ts", 1).over(w)) - F.unix_micros(F.col("ts"))).alias(
            "dur_us"
        ),
    ).filter(F.col("dur_us").isNotNull())
    g = seg.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_segments"),
        F.sum(
            F.col("cents").cast("decimal(18,0)")
            * F.col("dur_us").cast("decimal(18,0)")
        )
        .cast("bigint")
        .alias("twap_num"),
        F.sum("dur_us").cast("bigint").alias("dur_us"),
    )
    return g.select(
        "user_id",
        "n_segments",
        "twap_num",
        "dur_us",
        F.when(
            F.col("dur_us") > 0,
            F.col("twap_num").cast("double") / F.col("dur_us").cast("double"),
        ).alias("twap_cents"),
    )


@workload(
    "timeseries_gapfill_locf",
    oracle="""
    WITH obs AS (
        SELECT user_id, CAST(ts AS DATE) AS day, ts, event_id,
               CAST(floor(value * 100) AS BIGINT) AS cents
        FROM events
        WHERE user_id IS NOT NULL AND ts IS NOT NULL
          AND value IS NOT NULL AND NOT isnan(value) AND abs(value) < 1e12
    ),
    daily AS (
        SELECT user_id, day, cents FROM (
            SELECT user_id, day, cents,
                   row_number() OVER (
                       PARTITION BY user_id, day
                       ORDER BY ts DESC NULLS LAST, event_id DESC NULLS LAST,
                                cents DESC NULLS LAST) AS rn
            FROM obs) WHERE rn = 1
    ),
    users AS (SELECT DISTINCT user_id FROM obs),
    days AS (SELECT CAST(generate_series AS DATE) AS day
             FROM generate_series(DATE '2024-01-01', DATE '2024-01-30',
                                  INTERVAL 1 DAY)),
    grid AS (SELECT u.user_id, d.day FROM users u CROSS JOIN days d)
    SELECT g.user_id, g.day,
           CAST(last_value(dl.cents IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cents_locf,
           CAST(CASE WHEN dl.cents IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
               AS is_observed
    FROM grid g
    LEFT JOIN daily dl ON dl.user_id = g.user_id AND dl.day = g.day
    """,
)
def timeseries_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filling + LOCF (last observation carried forward) — the
    hypertable `time_bucket_gapfill`/`locf` operator every monitoring and
    feature-engineering pipeline needs: one row per (user, calendar day)
    for the full month, each day carrying the user's most recent daily
    closing value; days before a user's first observation stay NULL
    (nothing to carry). Daily close is deterministic: top-1 by (ts,
    event_id, cents) DESC with NULLS LAST pinned on BOTH engines (Spark
    and DuckDB disagree on default NULL order under DESC).

    Scale shape: the dense grid is users × broadcast(30 literal days) —
    the explode is map-side and the grid is |users|·days rows BY DESIGN
    (that's the output contract); the LOCF window partitions by user
    (fully parallel, no global order), and the daily-close top-1 compiles
    to the WindowGroupLimit map-side trim like every other top-1-per-key
    in the engine."""
    ev = (
        load(spark, sf_dir, "events")
        .filter(
            F.col("user_id").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("value").isNotNull()
            & ~F.isnan(F.col("value"))
            & (F.abs(F.col("value")) < 1e12)
        )
        .select(
            "user_id",
            F.to_date("ts").alias("day"),
            "ts",
            "event_id",
            F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
        )
    )
    w_day = Window.partitionBy("user_id", "day").orderBy(
        F.col("ts").desc_nulls_last(),
        F.col("event_id").desc_nulls_last(),
        F.col("cents").desc_nulls_last(),
    )
    daily = (
        ev.withColumn("__rn", F.row_number().over(w_day))
        .filter(F.col("__rn") == 1)
        .select("user_id", "day", "cents")
    )
    users = ev.select("user_id").distinct()
    days = spark.range(1).select(
        F.explode(
            F.expr(
                "sequence(to_date('2024-01-01'), to_date('2024-01-30'), "
                "interval 1 day)"
            )
        ).alias("day")
    )
    grid = users.crossJoin(F.broadcast(days))
    w_locf = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return grid.join(daily, ["user_id", "day"], "left").select(
        "user_id",
        "day",
        F.last("cents", ignorenulls=True).over(w_locf).cast("bigint").alias(
            "cents_locf"
        ),
        F.col("cents").isNotNull().cast("bigint").alias("is_observed"),
    )


@workload(
    "approx_overlap_hll",
    oracle="""
    WITH ue AS (
        SELECT DISTINCT user_id, event_type FROM events
        WHERE user_id IS NOT NULL AND event_type IS NOT NULL
    ),
    t AS (SELECT event_type, count(*) AS n FROM ue GROUP BY event_type),
    ov AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               count(*) AS n_overlap
        FROM ue a JOIN ue b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT ov.type_a, ov.type_b,
           CAST(ta.n AS BIGINT) AS n_a, CAST(tb.n AS BIGINT) AS n_b,
           CAST(ta.n + tb.n - ov.n_overlap AS BIGINT) AS n_union,
           CAST(ov.n_overlap AS BIGINT) AS n_overlap,
           CAST(1 AS BIGINT) AS overlap_est_ok
    FROM ov
    JOIN t ta ON ta.event_type = ov.type_a
    JOIN t tb ON tb.event_type = ov.type_b
    """,
)
def approx_overlap_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap estimation via HLL inclusion–exclusion:
    |A∩B| ≈ est(A) + est(B) − est(A∪B), where est(A∪B) comes from the
    BINARY `hll_union` of the two audience sketches — the composition
    that makes sketches an audience-analytics primitive: per-audience
    sketches are built ONCE (one groupBy over distinct (user, type)
    pairs) and any pairwise overlap is then a driver-free kilobyte-sized
    merge, never a re-scan. The classic caveat is honest here:
    intersection error scales with the UNION's sketch error (lgK=14 →
    rsd = 1.04/√2¹⁴ ≈0.81% per sketch), so the driver-falsifiable bound is
    |est∩ − exact∩| ≤ 5% of the exact union, not of the (possibly tiny)
    intersection. Exact n_a/n_b/n_union/n_overlap are value-checked
    against DuckDB; the union count is the exact identity
    n_a + n_b − n_overlap (no separate union aggregation). Pairs appear
    iff the audiences co-occur for ≥1 user, identically on both engines
    (inner user self-join)."""
    ue = (
        load(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull() & F.col("event_type").isNotNull())
        .select("user_id", "event_type")
        .distinct()
        .persist()
    )
    per_type = ue.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sk"),
        F.count(F.lit(1)).alias("n"),
    )
    a = ue.select(F.col("user_id").alias("u"), F.col("event_type").alias("type_a"))
    b = ue.select(F.col("user_id").alias("u2"), F.col("event_type").alias("type_b"))
    ov = (
        a.join(b, (F.col("u") == F.col("u2")) & (F.col("type_a") < F.col("type_b")))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    ta = per_type.select(
        F.col("event_type").alias("type_a"),
        F.col("sk").alias("sk_a"),
        F.col("n").alias("n_a"),
    )
    tb = per_type.select(
        F.col("event_type").alias("type_b"),
        F.col("sk").alias("sk_b"),
        F.col("n").alias("n_b"),
    )
    est_overlap = (
        F.hll_sketch_estimate("sk_a")
        + F.hll_sketch_estimate("sk_b")
        - F.hll_sketch_estimate(F.expr("hll_union(sk_a, sk_b)"))
    )
    return (
        ov.join(F.broadcast(ta), "type_a")
        .join(F.broadcast(tb), "type_b")
        .select(
            "type_a",
            "type_b",
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            (F.col("n_a") + F.col("n_b") - F.col("n_overlap"))
            .cast("bigint")
            .alias("n_union"),
            F.col("n_overlap").cast("bigint").alias("n_overlap"),
            (
                F.abs(est_overlap - F.col("n_overlap")).cast("double")
                <= 0.05
                * (F.col("n_a") + F.col("n_b") - F.col("n_overlap")).cast(
                    "double"
                )
            )
            .cast("bigint")
            .alias("overlap_est_ok"),
        )
    )


def _sssp_oracle(rounds: int) -> str:
    """Bounded Bellman-Ford unrolled into a CTE chain (the pagerank
    trick): d_{i+1} = min(d_i, min over edges(d_i[src] + w)). Weighted
    edges reuse the khop co-purchase CTEs plus an integer weight."""
    parts = [
        _KHOP_EDGE_CTES.replace(
            "AS dst\n",
            "AS dst, 1 + (a.l_partkey + b.l_partkey) % 7 AS w\n",
        ).replace("GROUP BY 1, 2", "GROUP BY 1, 2, 3"),
        """seeds AS (
        SELECT DISTINCT p_partkey AS node FROM part
        WHERE p_size = 1 AND p_partkey IS NOT NULL
    )""",
        "d0 AS (SELECT node, CAST(0 AS BIGINT) AS d FROM seeds)",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"d{i} AS (SELECT node, min(d) AS d FROM ("
            f"SELECT node, d FROM d{i - 1} "
            f"UNION ALL "
            f"SELECT e.dst AS node, p.d + e.w AS d "
            f"FROM d{i - 1} p JOIN edges e ON e.src = p.node"
            f") GROUP BY node)"
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT node AS partkey, CAST(d AS BIGINT) AS dist FROM d{rounds}"
    )


@workload("graph_sssp_weighted", oracle=_sssp_oracle(4), iterative=True)
def graph_sssp_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED shortest paths (4 Bellman-Ford relaxation rounds) from
    the size-1 parts over the co-purchase graph, edge weight
    1 + (src+dst) mod 7 — the weighted counterpart to `graph_khop_reach`:
    with real weights a settled node's label can still IMPROVE, so the
    BFS frontier/anti-join shape is unsound and the correct round is
    relax-all + min-aggregate (`operators.graph.sssp_relax`: one join +
    one map-side-combinable min per round, early exit on the monotone
    (count, sum) fixed-point signature). Integer weights make the
    distributed min-plus exact, so the oracle — the same recurrence
    unrolled into a CTE chain — matches bit-for-bit. NULL keys filtered
    before pairing on both sides."""
    from ..operators.graph import sssp_relax

    edges, seeds = _copurchase_weighted_graph(spark, sf_dir)
    dist = sssp_relax(edges, seeds, rounds=4)
    edges.unpersist()
    return dist.select(F.col("node").alias("partkey"), F.col("dist"))


def _copurchase_weighted_graph(spark: SparkSession, sf_dir: str):
    """(edges persisted, seeds) for the weighted co-purchase graph shared
    by the two SSSP variants — weight 1 + (src+dst) mod 7, seeds = the
    size-1 parts. Caller unpersists edges."""
    li = load(spark, sf_dir, "lineitem")
    items = (
        li.filter(F.col("l_orderkey").isNotNull() & F.col("l_partkey").isNotNull())
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    baskets = items.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("parts")
    )
    half = (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(parts, (x, i) -> "
                    "transform(slice(parts, i + 2, size(parts)), "
                    "y -> struct(x AS a, y AS b))))"
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
        .distinct()
    )
    edges = (
        half.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .union(half.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .withColumn("w", 1 + (F.col("src") + F.col("dst")) % 7)
        .persist()
    )
    seeds = (
        load(spark, sf_dir, "part")
        .filter((F.col("p_size") == 1) & F.col("p_partkey").isNotNull())
        .select(F.col("p_partkey").alias("node"))
    )
    return edges, seeds


@workload("graph_sssp_delta", oracle=_sssp_oracle(4), iterative=True)
def graph_sssp_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DELTA-FRONTIER Bellman-Ford (`operators.graph.sssp_relax_delta`)
    on the same weighted co-purchase graph, same 4 rounds, same unrolled-
    CTE oracle as `graph_sssp_weighted` — per-round labels are provably
    identical to relax-all (only nodes whose label improved last round
    can improve a neighbor this round), so one oracle checks both
    operators bit-for-bit. This is the run-to-convergence scale path:
    SCALING.md's sssp experiment measured it 3.6× faster than relax-all
    at 20M edges / avg degree 20 (the frontier collapses once labels
    stabilize) and ~1.5× slower at 5M edges / degree 5 within the round
    bound (frontier stays ≈|V|, the improvement-detection join is pure
    overhead) — pick by regime, both exact."""
    from ..operators.graph import sssp_relax_delta

    edges, seeds = _copurchase_weighted_graph(spark, sf_dir)
    dist = sssp_relax_delta(edges, seeds, rounds=4)
    edges.unpersist()
    return dist.select(F.col("node").alias("partkey"), F.col("dist"))


@workload(
    "approx_rolling_distinct_hll",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ),
    days AS (SELECT DISTINCT day FROM ud)
    SELECT d.day AS end_day,
           CAST(count(DISTINCT u.user_id) AS BIGINT) AS n_users_7d,
           CAST(1 AS BIGINT) AS est_within_5pct
    FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
    GROUP BY d.day
    """,
)
def approx_rolling_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE PATH for `rolling_distinct_users`: one Datasketches HLL
    sketch per day (`hll_sketch_agg`), each sketch replicated to the 7
    windows it serves, merged per end day with `hll_union_agg` — sketch
    MERGEABILITY is the property that makes rolling distinct tractable at
    100 TB: the window expansion carries 7×|days| kilobyte sketches
    instead of 7×|user-days| rows, and the same daily sketches serve ANY
    window length for free. The estimate is asserted within 5% of the
    exact count (lgConfigK=14 → rsd = 1.04/√2¹⁴ ≈0.81%, deterministic for fixed
    data; measured max ≈1% at sf0.01); the exact counts themselves are
    value-checked against DuckDB, so the flag row is driver-falsifiable."""
    ud = (
        load(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    days = ud.select("day").distinct()
    daily_sk = ud.groupBy("day").agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sk")
    )
    exp_sk = daily_sk.select(
        "sk",
        F.explode(
            F.expr("transform(sequence(0, 6), i -> date_add(day, i))")
        ).alias("end_day"),
    )
    est = (
        exp_sk.join(
            F.broadcast(days.select(F.col("day").alias("end_day"))),
            "end_day",
            "semi",
        )
        .groupBy("end_day")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
    )
    exact = (
        ud.select(
            "user_id",
            F.explode(
                F.expr("transform(sequence(0, 6), i -> date_add(day, i))")
            ).alias("end_day"),
        )
        .join(
            F.broadcast(days.select(F.col("day").alias("end_day"))),
            "end_day",
            "semi",
        )
        .groupBy("end_day")
        .agg(F.count_distinct("user_id").cast("bigint").alias("n_users_7d"))
    )
    return exact.join(est, "end_day").select(
        "end_day",
        "n_users_7d",
        (
            F.abs(F.col("est") - F.col("n_users_7d"))
            / F.col("n_users_7d")
            <= 0.05
        )
        .cast("bigint")
        .alias("est_within_5pct"),
    )
