"""Scaling evidence for SCALING.md.

Experiments (select with argv; `all` / no argument runs every one):
  merge — full-table merge vs bucketed incremental merge as target size
          grows while the daily batch stays fixed.
  skew  — unsalted vs salted latest_per_key on a 90%-one-key table
          (VERDICT r03 #7): where the two-phase salted window wins.
  bloom — runtime bloom-filter join pruning: shuffle bytes with the
          InjectRuntimeFilter rule on vs off.
  ann   — quantized-rerank vs exact brute force at 1M×64 (prep-once
          packing; exactness assertion).
  ivf_assign — codebook-IVF cell assignment at 1M×64: scan-side argmin
          projection vs naive cross-join+window (equality asserted).
  ivf_recall — recall@3 vs probe budget: Lloyd quantizer vs the r05
          seeded codebook, at sf0.01 and sf0.1.
  pairs — frequent-pair mining at 1M baskets: map-side HOF pair
          generation vs the row-level self-join (equality asserted).
  substr — exact-substring dedup (runs + clip) at 100k/400k docs
          with planted boilerplate: linear-scaling check +
          closed-form ground-truth assertions.
  pps   — weighted PPS sampling (sample_weighted_reservoir's shape) on a
          90%-one-source corpus: Partial WindowGroupLimit pre-trim on vs
          off — shuffle records and hot-reducer behavior (equality
          asserted).

Run: python scripts_scaling_experiment.py
     [merge|skew|bloom|ann|ivf_assign|ivf_recall|pairs|pps|substr|all]"""
import sys, os, time, tempfile, json
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from pyspark.sql import functions as F
from fn_rq_report_etl_dev_spark.session import get_spark
from fn_rq_report_etl_dev_spark.catalog import Warehouse
from fn_rq_report_etl_dev_spark.operators.merge import merge_upsert
from fn_rq_report_etl_dev_spark.operators.merge_partitioned import (
    ensure_bucketed_target, merge_into_bucketed_target)
from pyspark.sql import types as T

EXPERIMENT = sys.argv[1] if len(sys.argv) > 1 else "all"
# bloom experiment reads shuffle metrics from the UI REST API
_conf = {"spark.ui.enabled": "true"} if EXPERIMENT in ("bloom", "pairs", "pps", "all") else None
spark = get_spark(app_name="scaling", extra_conf=_conf)


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def skew_experiment():
    """90% of rows share ONE key. Two regimes measured (SCALING.md §skew):

    - group_limit=on (Spark ≥3.5 default): `InferWindowGroupLimit` pushes
      the rn=1 filter MAP-SIDE, pre-reducing the hot key to one row per map
      task before the shuffle — the unsalted window is already skew-safe
      and salting only adds a second window pass.
    - group_limit=off (older engines, or window shapes the rule can't
      rewrite — full rank lists, lag chains, whole-partition aggregates):
      the unsalted form funnels 0.9*N rows into ONE reducer; n_salts=32
      spreads them 32 ways and re-ranks the ≤32 winners.

    Uniform keys are the control — salting must cost ~nothing there."""
    from fn_rq_report_etl_dev_spark.operators.dedup import latest_per_key

    GROUP_LIMIT_RULE = "org.apache.spark.sql.catalyst.optimizer.InferWindowGroupLimit"
    n_rows = 32_000_000
    n_keys = n_rows // 100
    out = []
    for dist in ("skew90", "uniform"):
        base = (spark.range(n_rows).withColumnRenamed("id", "rid")
                .withColumn("u", F.rand(seed=7)))
        if dist == "skew90":
            k = F.when(F.col("u") < 0.9, F.lit(0)).otherwise(
                (F.col("rid") % n_keys) + 1)
        else:
            k = F.col("rid") % n_keys
        df = (base.withColumn("k", k.cast("long"))
              .withColumn("ts", (F.col("rid") * 7919) % n_rows)
              .drop("u"))
        _force(latest_per_key(df.limit(1_000_000), ["k"], ["ts", "rid"]))  # warm
        for mode, excluded in (("on", ""), ("off", GROUP_LIMIT_RULE)):
            spark.conf.set("spark.sql.optimizer.excludedRules", excluded)
            timings = {}
            for label, n_salts in (("unsalted", None), ("salted32", 32)):
                t0 = time.perf_counter()
                _force(latest_per_key(df, ["k"], ["ts", "rid"], n_salts=n_salts))
                timings[label] = round(time.perf_counter() - t0, 2)
            row = {"experiment": "skew_dedup", "rows": n_rows, "dist": dist,
                   "window_group_limit": mode, **timings}
            out.append(row)
            print(json.dumps(row))
        spark.conf.unset("spark.sql.optimizer.excludedRules")
        # identical results regardless of salting (counts as cheap proxy)
        n_un = latest_per_key(df, ["k"], ["ts", "rid"]).count()
        n_sa = latest_per_key(df, ["k"], ["ts", "rid"], n_salts=32).count()
        assert n_un == n_sa, (n_un, n_sa)
    return out


def bloom_join_experiment():
    """Runtime bloom-filter join pruning (`InjectRuntimeFilter`,
    `spark.sql.optimizer.runtime.bloomFilter.*`): a selective dim filter
    builds a bloom filter that prunes the FACT side's shuffle BEFORE the
    join. Modeled on the 100 TB case — dim too big to broadcast
    (autoBroadcast disabled to stand in for a multi-GB dim), 64M-row
    parquet fact.

    Preconditions discovered while making the rule fire (SCALING.md
    §bloom): (1) both sides must be FILE scans (a `spark.range` source
    never triggers injection); (2) the creation-side predicate must be
    "likely selective" — literal equality/comparison/IN/LIKE; a bare
    boolean column (`WHERE sel`) does NOT qualify; (3) the creation side's
    SIZE ESTIMATE must fit creationSideThreshold — without CBO stats a
    filter's estimate equals its child's, so the default 10 MB skips any
    dim scan over ~10 MB (raised to 1 GB here; on a stats-enabled
    warehouse ANALYZE TABLE fixes the estimate instead).

    Shuffle bytes/records are read from the UI REST API — the
    scale-relevant metric (local NVMe wall-clock undersells a win that is
    mostly network at cluster scale)."""
    import tempfile
    import urllib.request

    ui = spark.conf.get("spark.ui.enabled", "false") == "true"
    d = tempfile.mkdtemp(prefix="rtflt-")
    (spark.range(64_000_000).withColumnRenamed("id", "k")
     .withColumn("v", (F.col("k") % 997).cast("double"))
     .withColumn("pad", F.md5(F.col("k").cast("string")))
     .write.parquet(f"{d}/fact"))
    (spark.range(2_000_000).withColumnRenamed("id", "k")
     .withColumn("grp", (F.col("k") % 100).cast("int"))
     .withColumn("attr", F.md5(F.col("k").cast("string")))
     .write.parquet(f"{d}/dim"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "1GB")

    def build():
        fact = spark.read.parquet(f"{d}/fact")
        dim = spark.read.parquet(f"{d}/dim").filter("grp = 0")  # 1% selective
        return fact.join(dim, "k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))

    app = spark.sparkContext.applicationId

    def shuffle_totals():
        if not ui:
            return 0, 0
        url = f"http://localhost:4040/api/v1/applications/{app}/stages?status=complete"
        st = json.loads(urllib.request.urlopen(url).read())
        return (sum(s.get("shuffleWriteBytes", 0) for s in st),
                sum(s.get("shuffleWriteRecords", 0) for s in st))

    out = []
    for mode in ("true", "false"):
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", mode)
        if mode == "true":
            assert "might_contain" in build()._jdf.queryExecution().optimizedPlan().toString()
        _force(build())  # warm
        b0, r0 = shuffle_totals()
        t0 = time.perf_counter(); _force(build())
        b1, r1 = shuffle_totals()
        row = {"experiment": "bloom_join", "bloom": mode,
               "sec": round(time.perf_counter() - t0, 2),
               "shuffle_mb": round((b1 - b0) / 1e6, 1),
               "shuffle_records": r1 - r0}
        out.append(row)
        print(json.dumps(row))
    for key in ("spark.sql.autoBroadcastJoinThreshold",
                "spark.sql.adaptive.autoBroadcastJoinThreshold",
                "spark.sql.optimizer.runtime.bloomFilter.enabled",
                "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
                "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"):
        spark.conf.unset(key)
    return out


def pps_sample_experiment():
    """The PPS sampler's scale claim, measured: ranking ascending by
    h/weight with a rank<=K cut compiles to a Partial WindowGroupLimit
    (Spark >=3.5) that trims every map task to a K-heap per source BEFORE
    the exchange. On a 90%-one-source corpus the exchange therefore
    carries O(K x sources x tasks) records; with the rule excluded (older
    engines / shapes the rule can't rewrite) the full corpus shuffles and
    the hot source funnels 90% of it into ONE reducer. The drawn sample is
    asserted identical in both regimes — the rule is pure pushdown."""
    import urllib.request
    from pyspark.sql import Window

    GROUP_LIMIT_RULE = "org.apache.spark.sql.catalyst.optimizer.InferWindowGroupLimit"
    K = 25
    n_rows = 20_000_000
    app = spark.sparkContext.applicationId

    def shuffle_totals():
        url = f"http://localhost:4040/api/v1/applications/{app}/stages?status=complete"
        st = json.load(urllib.request.urlopen(url))
        return (sum(s.get("shuffleWriteBytes", 0) for s in st),
                sum(s.get("shuffleWriteRecords", 0) for s in st))

    base = (spark.range(n_rows).withColumnRenamed("id", "rid")
            .withColumn("u", F.rand(seed=11)))
    src = F.when(F.col("u") < 0.9, F.lit("hot")).otherwise(
        F.concat(F.lit("src"), (F.col("rid") % 19).cast("string")))
    df = (base.withColumn("source", src)
          .withColumn("weight", ((F.col("rid") % 997) + 1).cast("bigint"))
          .withColumn("h", F.conv(
              F.substring(F.md5(F.col("rid").cast("string")), 1, 12), 16, 10
          ).cast("bigint"))
          .drop("u"))
    key = F.col("h").cast("double") / F.col("weight").cast("double")
    w = Window.partitionBy("source").orderBy(key.asc(), F.col("rid").asc())

    def sample(d):
        return (d.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= K))

    _force(sample(df.limit(1_000_000)))  # warm
    out = []
    drawn = {}
    for mode, excluded in (("on", ""), ("off", GROUP_LIMIT_RULE)):
        spark.conf.set("spark.sql.optimizer.excludedRules", excluded)
        b0, r0 = shuffle_totals()
        t0 = time.perf_counter()
        _force(sample(df))
        wall = round(time.perf_counter() - t0, 2)
        b1, r1 = shuffle_totals()
        drawn[mode] = {(r["source"], r["rid"]) for r in
                       sample(df).select("source", "rid").collect()}
        row = {"experiment": "pps_sample", "rows": n_rows,
               "window_group_limit": mode, "wall_s": wall,
               "shuffle_mb": round((b1 - b0) / 1e6, 1),
               "shuffle_records": r1 - r0}
        out.append(row)
        print(json.dumps(row))
    spark.conf.unset("spark.sql.optimizer.excludedRules")
    assert drawn["on"] == drawn["off"], (
        len(drawn["on"]), len(drawn["off"]))
    assert len(drawn["on"]) == K * 20
    return out


def ntile_experiment():
    """distributed_ntile vs the bare global-window ntile at 20M rows
    (SCALING.md §ntile). The global form plans `Exchange SinglePartition`
    — ONE task sorts all 20M rows; the distributed form range-partitions,
    ranks per partition, and applies the NTILE closed form with
    per-partition-count offsets. Equality asserted exactly: identical
    per-bucket counts AND an id×bucket checksum over all 20M rows."""
    from pyspark.sql.window import Window

    from fn_rq_report_etl_dev_spark.operators.ranking import distributed_ntile

    N, K = 20_000_000, 100
    df = (
        spark.range(N)
        .select(
            "id",
            F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8), 16, 10)
            .cast("bigint")
            .alias("v"),
        )
        .persist()
    )
    df.count()
    order = [F.col("v").asc(), F.col("id").asc()]

    def run(frame):
        chk = frame.agg(
            F.sum(F.col("id") * F.col("nt")).alias("chk"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        counts = {
            r["nt"]: r["c"]
            for r in frame.groupBy("nt").agg(F.count(F.lit(1)).alias("c")).collect()
        }
        return chk["chk"], chk["n"], counts

    out = {}
    t0 = time.time()
    d_chk, d_n, d_counts = run(
        distributed_ntile(df, order, K, "nt", num_partitions=32)
    )
    out["distributed_sec"] = round(time.time() - t0, 2)
    t1 = time.time()
    g_chk, g_n, g_counts = run(
        df.select("id", F.ntile(K).over(Window.orderBy(*order)).alias("nt"))
    )
    out["global_window_sec"] = round(time.time() - t1, 2)
    assert (d_chk, d_n) == (g_chk, g_n), (d_chk, d_n, g_chk, g_n)
    assert d_counts == g_counts
    out["n_rows"], out["k"] = N, K
    print(json.dumps({"ntile": out}))


def _hash_edges(n_edges, n_nodes, salt):
    return (
        spark.range(n_edges)
        .select(
            (
                F.conv(
                    F.substring(F.md5(F.concat(F.lit(salt), F.col("id").cast("string"))), 1, 8),
                    16,
                    10,
                ).cast("bigint")
                % (n_nodes - 1)
                + 1
            ).alias("x"),
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(salt + "y"), F.col("id").cast("string"))), 1, 8
                    ),
                    16,
                    10,
                ).cast("bigint")
                % (n_nodes - 1)
                + 1
            ).alias("y"),
        )
        .filter(F.col("x") != F.col("y"))
        .select(F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b"))
        .distinct()
    )


def tri_experiment():
    """Degree-oriented triangle counting on a hub-skewed graph
    (SCALING.md §triangles). Naive wedge enumeration is Σ C(deg,2): a
    50k-degree hub ALONE contributes C(50k,2) ≈ 1.25e9 wedges — the
    power-law failure mode. Orientation (low→high by (deg,id)) makes the
    hub's out-degree ~0, so enumerated wedges collapse to Σ C(outdeg,2).
    Correctness: asserted exactly vs a DuckDB naive a<b<c triple join on
    a 50k-edge subgraph (plus the unit test's adjacency enumeration)."""
    import duckdb

    from fn_rq_report_etl_dev_spark.operators.graph import oriented_triangle_stats

    # -- sub-scale exact equality vs an independent engine
    small = _hash_edges(50_000, 5_000, "s").persist()
    srow = oriented_triangle_stats(small).collect()[0]
    pdf = small.toPandas()
    con = duckdb.connect()
    con.register("e", pdf)
    naive = con.execute(
        "SELECT count(*) FROM e e1 JOIN e e2 ON e2.a = e1.b "
        "JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b"
    ).fetchone()[0]
    assert srow["n_triangles"] == naive, (srow["n_triangles"], naive)

    # -- hub scale: 1M random edges + one 50k-degree hub
    N_NODES, HUB, N_RAND = 200_000, 50_000, 1_000_000
    hub = spark.range(1, HUB + 1).select(
        F.lit(0).cast("bigint").alias("a"), F.col("id").alias("b")
    )
    edges = hub.unionAll(_hash_edges(N_RAND, N_NODES, "big")).distinct().persist()
    n_edges = edges.count()
    t0 = time.time()
    row = oriented_triangle_stats(edges).collect()[0]
    secs = round(time.time() - t0, 2)
    # enumerated wedges under orientation = Σ C(outdeg, 2)
    deg = (
        edges.select(F.col("a").alias("node"))
        .unionAll(edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    dega = deg.select(F.col("node").alias("a"), F.col("deg").alias("dega"))
    degb = deg.select(F.col("node").alias("b"), F.col("deg").alias("degb"))
    ed = edges.join(dega, "a").join(degb, "b")
    a_lower = F.struct(F.col("dega"), F.col("a")) < F.struct(
        F.col("degb"), F.col("b")
    )
    out_wedges = (
        ed.select(F.when(a_lower, F.col("a")).otherwise(F.col("b")).alias("src"))
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("od"))
        .agg(F.sum(((F.col("od") * (F.col("od") - 1)) / 2).cast("bigint")))
        .collect()[0][0]
    )
    print(
        json.dumps(
            {
                "triangles": {
                    "sub_equality_vs_duckdb": int(naive),
                    "n_nodes": int(row["n_nodes"]),
                    "n_edges": int(n_edges),
                    "naive_wedges": int(row["n_wedges"]),
                    "oriented_wedges": int(out_wedges),
                    "n_triangles": int(row["n_triangles"]),
                    "oriented_sec": secs,
                }
            }
        )
    )




def skyline_experiment():
    """pareto_frontier_2d at 20M random points: the bucketed local-prune
    pass vs the naive single global window. Measures (a) how many rows
    survive local pruning (= the global window's input), (b) wall time of
    both plans; asserts identical frontiers. On iid random (x, y) the
    expected frontier size is ~ln(n) — the local prune should collapse
    20M rows to a few hundred survivors, making the global sort free."""
    from pyspark.sql.window import Window
    from fn_rq_report_etl_dev_spark.operators.ranking import pareto_frontier_2d

    N = 20_000_000
    pts = (
        spark.range(N)
        .select(
            (F.hash(F.col("id"), F.lit(1)).cast("bigint") % 1_000_003).alias("x"),
            (F.hash(F.col("id"), F.lit(2)).cast("bigint") % 1_000_003).alias("y"),
        )
        .persist()
    )
    _force(pts)

    t0 = time.perf_counter()
    two_phase = pareto_frontier_2d(pts, "x", "y")
    tp_rows = sorted(map(tuple, two_phase.collect()))
    tp_s = round(time.perf_counter() - t0, 2)

    # survivors entering the global window (re-run the local pass alone)
    d = pts.select("x", "y").distinct()
    prev_max = lambda w: F.max("y").over(w.rowsBetween(Window.unboundedPreceding, -1))
    wb = Window.partitionBy("__b").orderBy(F.col("x").desc(), F.col("y").desc())
    survivors = (
        d.withColumn("__b", F.pmod(F.hash(F.col("x")), F.lit(32)))
        .withColumn("__pm", prev_max(wb))
        .filter(F.col("__pm").isNull() | (F.col("__pm") < F.col("y")))
        .count()
    )

    t0 = time.perf_counter()
    wg = Window.orderBy(F.col("x").desc(), F.col("y").desc())
    naive = (
        d.withColumn("__pm", prev_max(wg))
        .filter(F.col("__pm").isNull() | (F.col("__pm") < F.col("y")))
        .drop("__pm")
    )
    nv_rows = sorted(map(tuple, naive.collect()))
    nv_s = round(time.perf_counter() - t0, 2)

    assert tp_rows == nv_rows, "two-phase frontier != naive frontier"
    pts.unpersist()
    print(json.dumps({
        "experiment": "skyline", "n_points": N,
        "frontier_size": len(tp_rows),
        "global_window_input_rows": survivors,
        "two_phase_s": tp_s, "naive_global_window_s": nv_s,
    }))


def pagerank_experiment():
    """pagerank_integer on a synthetic hub-skewed digraph (dst keys
    concentrate on low ids — a hubby in-degree distribution): the
    broadcast-contrib plan vs a variant that shuffle-joins ranks into
    edges, at 5M and 20M edges over 100k nodes. Asserts identical final
    ranks (integer arithmetic => bit equality or bust)."""
    from fn_rq_report_etl_dev_spark.operators.graph import pagerank_integer

    N_NODES = 100_000
    for n_edges in (5_000_000, 20_000_000):
        edges = (
            spark.range(n_edges)
            .select(
                (F.abs(F.hash(F.col("id"), F.lit(11))).cast("bigint")
                 % N_NODES).alias("src"),
                (F.pmod(
                    F.abs(F.hash(F.col("id"), F.lit(23))).cast("bigint"),
                    F.when(F.pmod(F.col("id"), F.lit(10)) < 7, F.lit(1000))
                    .otherwise(F.lit(N_NODES)),
                )).alias("dst"),
            )
            .filter(F.col("src") != F.col("dst"))
            .distinct()
            .persist()
        )
        nodes = spark.range(N_NODES).select(F.col("id").alias("node")).persist()
        _force(edges); _force(nodes)

        t0 = time.perf_counter()
        bc = pagerank_integer(nodes, edges, iterations=5)
        bc_sum = bc.agg(F.sum("r"), F.sum(F.hash("node", "r").cast("bigint")), F.count("*")).collect()[0]
        bc_s = round(time.perf_counter() - t0, 2)

        # shuffle-join variant: identical recurrence, no broadcast hints
        t0 = time.perf_counter()
        deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
        degc = deg.select(F.col("src").alias("cnode"), "outdeg")
        n_df = nodes.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
        base = "CAST(1000000000000 AS BIGINT) div n_nodes"
        ranks = nodes.crossJoin(F.broadcast(n_df)).select(
            "node", F.expr(base).alias("r"))
        for _ in range(5):
            contrib = ranks.join(degc, ranks["node"] == degc["cnode"]).select(
                F.col("cnode").alias("csrc"), F.expr("r div outdeg").alias("c"))
            insum = (edges.join(contrib, F.col("src") == F.col("csrc"))
                     .groupBy("dst").agg(F.sum("c").alias("s"))
                     .select(F.col("dst").alias("vdst"), "s"))
            ranks = (nodes.join(insum, nodes["node"] == insum["vdst"], "left")
                     .crossJoin(F.broadcast(n_df))
                     .select("node", F.expr(
                         f"(15 * ({base}) + 85 * coalesce(s, CAST(0 AS BIGINT)))"
                         " div 100").alias("r")))
        sh_sum = ranks.agg(F.sum("r"), F.sum(F.hash("node", "r").cast("bigint")), F.count("*")).collect()[0]
        sh_s = round(time.perf_counter() - t0, 2)

        assert tuple(bc_sum) == tuple(sh_sum), (bc_sum, sh_sum)
        n_e = edges.count()
        edges.unpersist(); nodes.unpersist()
        print(json.dumps({
            "experiment": "pagerank", "n_nodes": N_NODES,
            "n_distinct_edges": n_e, "iterations": 5,
            "broadcast_contrib_s": bc_s, "shuffle_join_s": sh_s,
            "rank_checksum": int(bc_sum[0]),
        }))




def bfs_experiment():
    """bfs_min_hops on a synthetic digraph (20M edges / 1M nodes, avg
    degree ~20): the level-synchronous FRONTIER shape (newly discovered
    nodes only, anti-join against reached) vs the naive fixed-point
    iterate that re-joins the ENTIRE reached set to the edge table every
    round and min-aggregates. Same hop assignments (integer BFS => exact
    equality asserted via checksum). The radius matters: up to the
    saturation hop the two join similar row counts (frontier ≈ newly
    reached ≈ most of reached, since expansion is geometric), but PAST
    saturation the frontier empties — the frontier variant's remaining
    rounds are no-ops (early exit) while the naive one re-joins all |V|
    reached rows against the full edge table every round. 8 hops on a
    graph that saturates at ~4 makes both regimes visible in one run."""
    from fn_rq_report_etl_dev_spark.operators.graph import bfs_min_hops

    N_NODES = 1_000_000
    MAX_HOPS = 8
    for n_edges in (5_000_000, 20_000_000):
        edges = (
            spark.range(n_edges)
            .select(
                (F.pmod(F.hash(F.col("id"), F.lit(31)).cast("bigint"),
                        F.lit(N_NODES))).alias("src"),
                (F.pmod(F.hash(F.col("id"), F.lit(47)).cast("bigint"),
                        F.lit(N_NODES))).alias("dst"),
            )
            .filter(F.col("src") != F.col("dst"))
            .distinct()
            .persist()
        )
        seeds = spark.range(100).select(F.col("id").alias("node")).persist()
        _force(edges); _force(seeds)

        t0 = time.perf_counter()
        fr = bfs_min_hops(edges, seeds, max_hops=MAX_HOPS)
        fr_sum = fr.agg(
            F.sum(F.hash("node", "hops").cast("bigint")), F.count("*"),
            F.sum("hops")).collect()[0]
        fr_s = round(time.perf_counter() - t0, 2)

        # naive fixed-point: re-join the whole reached set every round,
        # min-aggregate hop labels (localCheckpoint discipline identical
        # so the comparison isolates the JOIN-INPUT shape, not lineage).
        t0 = time.perf_counter()
        e = edges.select(F.col("src").alias("e_src"), F.col("dst").alias("e_dst"))
        reached = seeds.withColumn("hops", F.lit(0).cast("int")).localCheckpoint(eager=True)
        for hop in range(1, MAX_HOPS + 1):
            nxt = (
                reached.join(e, reached["node"] == e["e_src"])
                .select(F.col("e_dst").alias("node"),
                        (F.col("hops") + 1).alias("hops"))
            )
            reached = (
                reached.unionByName(nxt)
                .groupBy("node")
                .agg(F.min("hops").cast("int").alias("hops"))
                .localCheckpoint(eager=True)
            )
        nv_sum = reached.agg(
            F.sum(F.hash("node", "hops").cast("bigint")), F.count("*"),
            F.sum("hops")).collect()[0]
        nv_s = round(time.perf_counter() - t0, 2)

        assert tuple(fr_sum) == tuple(nv_sum), (fr_sum, nv_sum)
        n_e = edges.count()
        edges.unpersist(); seeds.unpersist()
        print(json.dumps({
            "experiment": "bfs", "n_nodes": N_NODES, "max_hops": MAX_HOPS,
            "n_distinct_edges": n_e, "n_reached": int(fr_sum[1]),
            "frontier_s": fr_s, "naive_reiterate_s": nv_s,
            "hops_checksum": int(fr_sum[2]),
        }))




def sssp_experiment():
    """sssp_relax (relax-ALL labels × edges every round) vs
    sssp_relax_delta (join only the changed-label frontier) on a
    synthetic weighted digraph — 1M nodes, 5M and 20M edges, uniform
    integer weights 1..100, 100 seeds, 8 rounds. Integer min-plus =>
    bit-identical labels required (checksum assertion). The delta
    frontier is SOUND (per-round labels identical — see the operator
    docstring), unlike BFS's anti-join frontier; what this measures is
    where the frontier's geometric collapse beats relax-all's flat
    |V| ⋈ E join, and what the extra per-round full-outer label join
    costs before the collapse pays for it."""
    from fn_rq_report_etl_dev_spark.operators.graph import (
        sssp_relax,
        sssp_relax_delta,
    )

    N_NODES = 1_000_000
    ROUNDS = 8
    for n_edges in (5_000_000, 20_000_000):
        edges = (
            spark.range(n_edges)
            .select(
                (F.pmod(F.hash(F.col("id"), F.lit(31)).cast("bigint"),
                        F.lit(N_NODES))).alias("src"),
                (F.pmod(F.hash(F.col("id"), F.lit(47)).cast("bigint"),
                        F.lit(N_NODES))).alias("dst"),
                (F.pmod(F.hash(F.col("id"), F.lit(7)).cast("bigint"),
                        F.lit(100)) + 1).alias("w"),
            )
            .filter(F.col("src") != F.col("dst"))
            # one weight per distinct (src, dst): min — the multigraph
            # collapse both variants would apply on the first relax anyway
            .groupBy("src", "dst").agg(F.min("w").alias("w"))
            .persist()
        )
        seeds = spark.range(100).select(F.col("id").alias("node")).persist()
        _force(edges); _force(seeds)

        t0 = time.perf_counter()
        ra = sssp_relax(edges, seeds, rounds=ROUNDS)
        ra_sum = ra.agg(
            F.sum(F.hash("node", "dist").cast("bigint")), F.count("*"),
            F.sum("dist")).collect()[0]
        ra_s = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        de = sssp_relax_delta(edges, seeds, rounds=ROUNDS)
        de_sum = de.agg(
            F.sum(F.hash("node", "dist").cast("bigint")), F.count("*"),
            F.sum("dist")).collect()[0]
        de_s = round(time.perf_counter() - t0, 2)

        assert tuple(ra_sum) == tuple(de_sum), (ra_sum, de_sum)
        n_e = edges.count()
        edges.unpersist(); seeds.unpersist()
        print(json.dumps({
            "experiment": "sssp", "n_nodes": N_NODES, "rounds": ROUNDS,
            "n_distinct_edges": n_e, "n_reached": int(ra_sum[1]),
            "relax_all_s": ra_s, "delta_frontier_s": de_s,
            "dist_checksum": int(ra_sum[2]),
        }))


def scan_experiment():
    """bucketed_running_sum (per-bucket windows + broadcast carry-in) vs
    the naive one-task global window `sum(v) OVER (ORDER BY k)` on 5M and
    20M rows, local[32]; cumulative sums asserted IDENTICAL via per-row
    hash checksum (integer values => bit-equality). The naive plan is the
    scale-killer being designed out: ALL rows sort in ONE task."""
    from pyspark.sql import Window
    from fn_rq_report_etl_dev_spark.operators.scan import bucketed_running_sum

    for n in (5_000_000, 20_000_000):
        base = (
            spark.range(n)
            .select(
                F.col("id").alias("k"),
                (F.pmod(F.hash(F.col("id")), F.lit(1001)) - 500)
                .cast("bigint")
                .alias("v"),
            )
            .repartition(32)  # hash-spread: the input arrives unsorted
            .persist()
        )
        _force(base)

        t0 = time.perf_counter()
        two = bucketed_running_sum(
            base,
            bucket=F.expr("k div 65536"),
            order_by=[F.col("k")],
            value=F.col("v"),
            out_col="cum",
        )
        two_sum = two.agg(
            F.sum(F.hash("k", "cum").cast("bigint")), F.count("*")
        ).collect()[0]
        two_s = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
        naive = base.withColumn("cum", F.sum("v").over(w))
        nv_sum = naive.agg(
            F.sum(F.hash("k", "cum").cast("bigint")), F.count("*")
        ).collect()[0]
        nv_s = round(time.perf_counter() - t0, 2)

        assert tuple(two_sum) == tuple(nv_sum), (two_sum, nv_sum)
        base.unpersist()
        print(json.dumps({
            "experiment": "scan", "n_rows": n, "bucket_width": 65536,
            "two_level_s": two_s, "one_task_window_s": nv_s,
        }))


if EXPERIMENT == "skyline":
    skyline_experiment()
    sys.exit(0)
if EXPERIMENT == "pagerank":
    pagerank_experiment()
    sys.exit(0)
if EXPERIMENT == "bfs":
    bfs_experiment()
    sys.exit(0)
if EXPERIMENT == "sssp":
    sssp_experiment()
    sys.exit(0)

if EXPERIMENT == "scan":
    scan_experiment()
    sys.exit(0)
if EXPERIMENT == "tri":
    tri_experiment()
    sys.exit(0)
if EXPERIMENT == "ntile":
    ntile_experiment()
    sys.exit(0)
if EXPERIMENT == "skew":
    skew_experiment()
    sys.exit(0)
if EXPERIMENT == "pps":
    pps_sample_experiment()
    sys.exit(0)
if EXPERIMENT == "bloom":
    bloom_join_experiment()
    sys.exit(0)
SCHEMA = T.StructType([
    T.StructField("k", T.LongType(), True),
    T.StructField("v", T.StringType(), True),
    T.StructField("amount", T.DoubleType(), True),
])

def synth(n, tag):
    return (spark.range(n).withColumnRenamed("id", "k")
            .withColumn("v", F.concat(F.lit(tag), F.col("k")))
            .withColumn("amount", (F.col("k") % 1000).cast("double")))

_CORPUS_1M_PATH = None


def corpus_1m(dim=64):
    """Shared 1M×dim md5-derived synthetic corpus for the ANN/IVF
    experiments — generated ONCE per process and reused (r05 review
    finding: ann + ivf_assign each synthesized an identical multi-GB
    copy into separate temp dirs)."""
    global _CORPUS_1M_PATH
    if _CORPUS_1M_PATH is None:
        d = tempfile.mkdtemp(prefix="ann-corpus-")
        (spark.range(1_000_000).withColumnRenamed("id", "vec_id")
         .withColumn("embedding", F.expr(
             f"transform(sequence(0,{dim-1}), i -> "
             "cast(conv(substring(md5(concat(cast(vec_id as string),':',"
             "cast(i as string))),1,8),16,10) as double)/2147483648.0 - 1.0)"))
         .write.parquet(f"{d}/emb"))
        _CORPUS_1M_PATH = f"{d}/emb"
    return spark.read.parquet(_CORPUS_1M_PATH)


def ann_experiment():
    """Quantized-rerank vs exact brute force at 1M×64 (SCALING.md §ann):
    corpus synthesized from md5-derived doubles, packed ONCE offline
    (quantized_corpus → parquet), then both paths answer the same 8
    queries. Measures the prep-once lesson (inline quantization had
    dominated query cost 6×) and the local compute tie — the quantized
    path's real advantage is candidate-gen scan bytes (8× smaller), which
    local NVMe does not surface."""
    import tempfile

    from fn_rq_report_etl_dev_spark.operators.similarity import (
        brute_force_topk, quantized_corpus, quantized_rerank_topk)

    d = tempfile.mkdtemp(prefix="ann-")
    emb = corpus_1m()
    t0 = time.perf_counter()
    quantized_corpus(emb).write.parquet(f"{d}/packed")
    prep = round(time.perf_counter() - t0, 2)
    packed = spark.read.parquet(f"{d}/packed")
    q = emb.filter(F.col("vec_id") < 8)
    _force(brute_force_topk(q, emb, k=5, exclude_self=True))  # warm
    out = [{"experiment": "ann_quantized", "label": "quantize_prep_once", "sec": prep}]
    for label, fn in (
        ("bruteforce", lambda: brute_force_topk(q, emb, k=5, exclude_self=True)),
        ("quantized_prepacked", lambda: quantized_rerank_topk(
            q, emb, k=5, m=32, exclude_self=True, corpus_packed=packed)),
    ):
        t0 = time.perf_counter(); _force(fn())
        out.append({"experiment": "ann_quantized", "label": label,
                    "sec": round(time.perf_counter() - t0, 2)})
        print(json.dumps(out[-1]))
    got = {(r["query_id"], r["rank"]): r["neighbor_id"]
           for r in quantized_rerank_topk(q, emb, k=5, m=32, exclude_self=True,
                                          corpus_packed=packed).collect()}
    exp = {(r["query_id"], r["rank"]): r["neighbor_id"]
           for r in brute_force_topk(q, emb, k=5, exclude_self=True).collect()}
    assert got == exp, "quantized rerank diverged from brute force at 1M"
    print(json.dumps(out[0]))
    return out


def ivf_assign_experiment():
    """Codebook-IVF cell assignment at 1M×64 (r05): the scan-side
    literal-centroid argmin projection (array_min over (dist, cell)
    structs — build_codebook_index's shape, zero shuffle) vs the naive
    cross-join + per-id window argmin (shuffles |corpus|×n_cells wide
    rows). Same assignment bit-for-bit; the plan difference is what
    separates a map-only pass from a corpus-size shuffle at 100 TB."""
    from pyspark.sql import Window

    from fn_rq_report_etl_dev_spark.operators.similarity import (
        as_double, build_codebook_index, sqdist)

    emb = corpus_1m()
    _force(emb)  # warm the scan

    t0 = time.perf_counter()
    idx = build_codebook_index(emb, n_cells=16, seed=42)
    _force(idx.assigned)
    proj_s = round(time.perf_counter() - t0, 2)
    print(json.dumps({"experiment": "ivf_assign", "label": "argmin_projection",
                      "sec": proj_s, "includes_codebook_pick": True}))

    c = emb.select(F.col("vec_id").alias("neighbor_id"),
                   as_double(F.col("embedding")).alias("cv"))
    naive = (
        c.crossJoin(F.broadcast(idx.centroids))
        .withColumn("__d", sqdist(F.col("cv"), F.col("centroid")))
        .withColumn("__rk", F.row_number().over(
            Window.partitionBy("neighbor_id").orderBy("__d", "cell")))
        .filter(F.col("__rk") == 1)
        .select("neighbor_id", "cv", "cell")
    )
    t0 = time.perf_counter()
    _force(naive)
    naive_s = round(time.perf_counter() - t0, 2)
    print(json.dumps({"experiment": "ivf_assign",
                      "label": "crossjoin_window", "sec": naive_s}))

    # Equality checks AFTER the timed sections, on persisted results so
    # neither expensive plan re-executes per check (r05 review finding).
    # Cardinality first — an inner join alone would silently pass if one
    # shape dropped/duplicated vectors.
    idx.assigned.persist()
    naive.persist()
    n_proj, n_naive, n_corpus = idx.assigned.count(), naive.count(), emb.count()
    assert n_proj == n_naive == n_corpus, (n_proj, n_naive, n_corpus)
    n_diff = (idx.assigned.select("neighbor_id", "cell")
              .join(naive.select("neighbor_id",
                                 F.col("cell").alias("cell2")), "neighbor_id")
              .filter(F.col("cell") != F.col("cell2")).count())
    assert n_diff == 0, f"assignment shapes diverged on {n_diff} vectors"
    idx.assigned.unpersist()
    naive.unpersist()
    print(json.dumps({"experiment": "ivf_assign", "label": "equal", "ok": True,
                      "n": n_corpus}))


def ivf_recall_experiment():
    """Recall@3 vs probe budget: Lloyd k-means quantizer (ann_ivf_recall's
    production build) vs the r05 SQL-replayable seeded codebook, same
    corpus/queries/cells. The probe budget decides what fraction of the
    corpus a query scans at 100 TB; this measures how much of that budget
    the cheaper (training-free, oracle-replayable) codebook gives back."""
    from fn_rq_report_etl_dev_spark.operators.similarity import (
        brute_force_topk, build_codebook_index, build_ivf_index, ivf_query)
    from fn_rq_report_etl_dev_spark.workloads import load

    for sf in ("0.01", "0.1"):
        sf_dir = f"/root/testdata/sf{sf}"
        emb = load(spark, sf_dir, "embeddings")
        queries = emb.filter(F.col("vec_id") < 8)
        bf = {(r["query_id"], r["neighbor_id"])
              for r in brute_force_topk(queries, emb, k=3, exclude_self=True)
              .select("query_id", "neighbor_id").collect()}
        for label, idx in (
            ("lloyd", build_ivf_index(emb, n_cells=8, seed=42)),
            ("codebook", build_codebook_index(emb, n_cells=8, seed=42)),
        ):
            rec = {}
            for n_probe in (2, 4, 6, 8):
                got = {(r["query_id"], r["neighbor_id"])
                       for r in ivf_query(idx, queries, k=3, n_probe=n_probe,
                                          exclude_self=True)
                       .select("query_id", "neighbor_id").collect()}
                rec[n_probe] = round(len(got & bf) / len(bf), 3)
            print(json.dumps({"experiment": "ivf_recall", "sf": sf,
                              "quantizer": label, "recall_at_3": rec}))


def pairs_experiment():
    """Frequent-pair co-occurrence at 1M baskets / ~5M basket-items
    (basket_brand_pairs' shape question): map-side pair generation —
    groupBy(basket) -> sorted distinct array -> slice/transform/flatten
    C(k,2) explode — vs the textbook row-level self-join (items a ⋈ items
    b ON basket AND a<b). Both emit the identical pair multiset; the
    difference is the self-join shuffling the item table TWICE (once per
    side) and running join machinery per basket, vs ONE basket shuffle
    whose pair expansion happens inside the same stage (paid for with an
    ObjectHashAggregate collect_set — CPU, not network). Wall-clock AND
    shuffle volume are both reported: local[32] makes shuffles ~free
    (loopback NVMe), so the CPU overhead shows while the halved
    item-table shuffle — the term that dominates on a real cluster
    network at 100 TB — does not. Same caveat as the bloom experiment.
    Equality is asserted on the full pair-count table after the timed
    sections.

    TWO item domains, because the winner flips with the pair-count
    domain: at |items|=1000 (500k distinct pairs) partial aggregation
    cannot collapse the exploded pair rows, so pair volume dominates both
    shapes and the self-join's codegen'd join beats the HOF path's
    ObjectHashAggregate; at |items|=25 (300 pairs — the brand case)
    partial agg collapses pairs to ~nothing and the ITEM-TABLE shuffle is
    the whole cost, which map-side halves."""
    for n_items in (1_000, 25):
        _pairs_once(1_000_000, n_items)


def substr_experiment():
    """Exact-substring dedup (r07's dedup_substring_runs/clip) at corpus
    scale: synthetic corpora of 50-token docs where 10% are "carriers"
    embedding one shared 20-token boilerplate passage at a hash-chosen
    offset and every other token is globally unique (zero accidental
    shingle repeats) — so ground truth is closed-form: exactly one
    maximal run per carrier, length 20, and the clip must remove exactly
    those 20 tokens. Timed at 100k and 400k docs (5M / 20M tokens,
    ~4.6M / 18.4M shingle sites): the three keyed stages (shingle count,
    semi-join, islands window) should scale ~linearly in corpus tokens —
    the 100 TB question for this family is shuffle volume per token, not
    algorithmic blowup, because no stage is ever quadratic. Correctness
    asserted AFTER the timed section at the smaller scale (run set ==
    carrier set, all lengths 20; clip removes exactly the passage)."""
    from fn_rq_report_etl_dev_spark.operators.text_dedup import (
        substring_clip,
        substring_duplicate_runs,
    )

    PASSAGE, DOC, MOD = 20, 50, 10

    def corpus(n_docs):
        base = spark.range(n_docs).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % MOD == 0).alias("carrier"),
            F.pmod(F.hash("id"), F.lit(DOC - PASSAGE + 1)).alias("off"),
        )
        toks = F.transform(
            F.sequence(F.lit(1), F.lit(DOC)),
            lambda i: F.when(
                F.col("carrier")
                & (i > F.col("off"))
                & (i <= F.col("off") + PASSAGE),
                F.concat(F.lit("p"), (i - F.col("off")).cast("string")),
            ).otherwise(
                F.concat(
                    F.lit("w"),
                    F.col("doc_id").cast("string"),
                    F.lit("_"),
                    i.cast("string"),
                )
            ),
        )
        return base.select(
            "doc_id", "carrier", "off", F.array_join(toks, " ").alias("text")
        )

    def clip_join_strategy(docs):
        """Joins AQE FINALIZES for the clip (r09 interval form): the
        r07/r08 per-position covered-set LeftAnti — whose AQE
        broadcast->SMJ degradation was the measured sort-bound
        bottleneck at 1.6M docs — is GONE (asserted); what remains are
        the duplicated-shingle semi-join and the per-doc rows<->runs
        LEFT join on interval ARRAYS. A cheap count-agg forces the plan
        on the SAME Dataset so queryExecution() exposes the mutated
        AdaptiveSparkPlan."""
        agg = substring_clip(docs, "doc_id", "text", k=5).groupBy().count()
        agg.collect()
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "LeftAnti" not in plan, "per-position anti-join resurfaced"
        joins = sorted({
            w
            for line in plan.splitlines()
            if "Join" in line
            for w in line.split()
            if w.endswith("Join")
        })
        return joins, "isFinalPlan=true" in plan

    timings = {}
    for n_docs in (100_000, 400_000, 1_600_000):
        docs = corpus(n_docs).persist()
        docs.count()  # materialize the generator before timing
        t0 = time.perf_counter()
        _force(substring_duplicate_runs(docs, "doc_id", "text", k=5))
        runs_s = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        _force(substring_clip(docs, "doc_id", "text", k=5))
        clip_s = round(time.perf_counter() - t0, 2)
        timings[n_docs] = (runs_s, clip_s)
        print(json.dumps({
            "experiment": "substr", "n_docs": n_docs,
            "n_tokens": n_docs * DOC, "n_carriers": n_docs // MOD,
            "runs_sec": runs_s, "clip_sec": clip_s,
        }))
        if n_docs in (100_000, 1_600_000):
            joins, final = clip_join_strategy(docs)
            print(json.dumps({
                "experiment": "substr", "label": "clip_joins",
                "n_docs": n_docs, "join_ops": joins,
                "aqe_final": final,
            }))
        if n_docs == 100_000:
            runs = substring_duplicate_runs(docs, "doc_id", "text", k=5).persist()
            n_runs = runs.count()
            bad_len = runs.filter(F.col("run_len_tokens") != PASSAGE).count()
            non_carrier = runs.join(
                docs.filter(~F.col("carrier")).select("doc_id"), "doc_id",
                "left_semi").count()
            assert n_runs == n_docs // MOD, (n_runs, n_docs // MOD)
            assert bad_len == 0 and non_carrier == 0, (bad_len, non_carrier)
            clip = substring_clip(docs, "doc_id", "text", k=5)
            bad_clip = clip.join(
                docs.select("doc_id", "carrier"), "doc_id"
            ).filter(
                (F.col("carrier") & (F.col("n_removed") != PASSAGE))
                | (~F.col("carrier") & (F.col("n_removed") != 0))
            ).count()
            assert bad_clip == 0, bad_clip
            runs.unpersist()
            print(json.dumps({"experiment": "substr", "label": "equal",
                              "n_docs": n_docs, "ok": True}))
        docs.unpersist()
    r1, r4 = timings[100_000][0], timings[400_000][0]
    print(json.dumps({"experiment": "substr", "label": "scaling_4x",
                      "runs_ratio": round(r4 / r1, 2)}))
    c4, c16 = timings[400_000][1], timings[1_600_000][1]
    print(json.dumps({"experiment": "substr", "label": "clip_4x_to_16x",
                      "clip_ratio": round(c16 / c4, 2)}))


def _pairs_once(n_baskets, n_items):
    # ~5 items/basket, hash-spread so basket sizes vary (1..~12 distinct)
    items = (
        spark.range(n_baskets * 5)
        .select((F.col("id") % n_baskets).alias("basket"),
                F.pmod(F.hash("id"), F.lit(n_items)).alias("item"))
        .distinct()
        .persist()
    )
    n_rows = items.count()  # materialize before timing

    mapside = (
        items.groupBy("basket")
        .agg(F.array_sort(F.collect_set("item")).alias("arr"))
        .select(F.explode(F.expr(
            "flatten(transform(arr, (x, i) -> "
            "transform(slice(arr, i + 2, size(arr)), "
            "y -> struct(x AS a, y AS b))))")).alias("p"))
        .groupBy("p.a", "p.b").agg(F.count(F.lit(1)).alias("n"))
    )
    import urllib.request

    app = spark.sparkContext.applicationId

    def shuffle_totals():
        if spark.conf.get("spark.ui.enabled", "false") != "true":
            return 0, 0
        url = (f"http://localhost:4040/api/v1/applications/{app}"
               "/stages?status=complete")
        st = json.loads(urllib.request.urlopen(url).read())
        return (sum(x.get("shuffleWriteBytes", 0) for x in st),
                sum(x.get("shuffleWriteRecords", 0) for x in st))

    b0, r0 = shuffle_totals()
    t0 = time.perf_counter()
    _force(mapside)
    map_s = round(time.perf_counter() - t0, 2)
    b1, r1 = shuffle_totals()
    print(json.dumps({"experiment": "pairs", "label": "mapside_hof",
                      "n_items": n_items, "sec": map_s, "basket_items": n_rows,
                      "shuffle_mb": round((b1 - b0) / 1e6, 1),
                      "shuffle_records": r1 - r0}))

    lhs = items.select("basket", F.col("item").alias("a"))
    rhs = items.select("basket", F.col("item").alias("b"))
    selfjoin = (
        lhs.join(rhs, "basket")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b").agg(F.count(F.lit(1)).alias("n"))
    )
    b0, r0 = shuffle_totals()
    t0 = time.perf_counter()
    _force(selfjoin)
    join_s = round(time.perf_counter() - t0, 2)
    b1, r1 = shuffle_totals()
    print(json.dumps({"experiment": "pairs", "label": "row_selfjoin",
                      "n_items": n_items, "sec": join_s, "shuffle_mb": round((b1 - b0) / 1e6, 1),
                      "shuffle_records": r1 - r0}))

    mapside.persist(); selfjoin.persist()
    n_m, n_j = mapside.count(), selfjoin.count()
    assert n_m == n_j, (n_m, n_j)
    n_diff = (mapside.join(selfjoin.withColumnRenamed("n", "n2"), ["a", "b"])
              .filter(F.col("n") != F.col("n2")).count())
    assert n_diff == 0, f"pair counts diverged on {n_diff} pairs"
    print(json.dumps({"experiment": "pairs", "label": "equal",
                      "n_items": n_items, "ok": True, "n_pairs": n_m}))
    mapside.unpersist(); selfjoin.unpersist(); items.unpersist()




def kmeans_experiment():
    """Lloyd k-means scaling (r08, embedding_kmeans_lloyd's engine): the
    claim is ONE corpus pass per round — a zero-shuffle literal-centroid
    assignment projection plus a groupBy(cell, dim) whose map-side
    partials bound the exchange at k*d rows per task — so wall time must
    scale ~linearly with the corpus while the driver only ever collects
    k*d partial sums per round. Measured at 250k and 1M x 64 (4x data),
    k=8, 3 rounds, end-to-end including the final assignment force."""
    from fn_rq_report_etl_dev_spark.operators.similarity import kmeans_lloyd

    emb = corpus_1m()
    out = []
    for n in (250_000, 1_000_000):
        sub = emb.filter(F.col("vec_id") < n)
        _force(sub.select("vec_id"))  # warm the scan
        t0 = time.perf_counter()
        _force(kmeans_lloyd(sub, k=8, rounds=3))
        out.append({"experiment": "kmeans_lloyd", "n_vectors": n,
                    "sec": round(time.perf_counter() - t0, 2)})
        print(json.dumps(out[-1]))
    ratio = out[1]["sec"] / out[0]["sec"]
    print(json.dumps({"experiment": "kmeans_lloyd", "label": "4x_data_ratio",
                      "ratio": round(ratio, 2)}))
    assert ratio < 8, f"kmeans scaling superlinear: {ratio}"
    return out


def semdedup_experiment():
    """SemDeDup scaling (r08, dedup_semantic_clusters' engine; r09 adds
    the hot-cell salt split): the paper's contract is that k GROWS WITH
    THE CORPUS so cell size stays ~constant and the within-cell pair
    space scales LINEARLY (an all-pairs join would be quadratic: 4x
    data -> 16x pairs). The r08 run showed quantizer imbalance breaking
    that promise anyway — Σ cell² grew 7.2x at 4x data because Lloyd's
    cell-size SKEW inflates the square sum. r09's guard salt-splits
    cells above max_cell; this experiment measures BOTH pair spaces
    (raw Σ C(size,2) vs capped Σ C(subcell,2) at max_cell=256, ~2.5x
    the mean cell size of ~100) and runs the guarded operator, asserting
    the capped growth stays near the 4x data ratio."""
    from fn_rq_report_etl_dev_spark.operators.similarity import (
        build_ivf_index, hot_cell_salt, semantic_dedup)

    max_cell = int(os.environ.get("SEMDEDUP_MAX_CELL", "256"))
    emb = corpus_1m()
    out = []
    for n, cells in ((100_000, 1024), (400_000, 4096)):
        sub = emb.filter(F.col("vec_id") < n)
        idx = build_ivf_index(sub, n_cells=cells, train_sample=32768)
        sizes = idx.assigned.groupBy("cell").agg(
            F.count(F.lit(1)).alias("csz"))
        raw_pairs = sizes.select(
            F.sum(F.col("csz") * (F.col("csz") - 1) / 2).alias("p")
        ).collect()[0]["p"]
        salted = idx.assigned.join(F.broadcast(sizes), "cell").withColumn(
            "salt", hot_cell_salt("neighbor_id", "csz", max_cell)
        )
        capped_pairs = (
            salted.groupBy("cell", "salt").agg(F.count(F.lit(1)).alias("c"))
            .select(F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("p"))
            .collect()[0]["p"]
        )
        t0 = time.perf_counter()
        res = semantic_dedup(idx, min_cosine=0.95, max_cell=max_cell)
        kept_bridged = res.agg(F.sum("kept")).collect()[0][0]
        sec = round(time.perf_counter() - t0, 2)
        # Bridge recovery (r10): the phase-1-only arm on the SAME index —
        # the kept-count delta is exactly the cross-sub-cell duplicates
        # the exemplar bridge recovers (each recovered removal is a
        # duplicate the salt split had let through).
        kept_p1 = (
            semantic_dedup(idx, min_cosine=0.95, max_cell=max_cell,
                           exemplar_bridge=False)
            .agg(F.sum("kept")).collect()[0][0]
        )
        idx.unpersist()
        out.append({"experiment": "semdedup", "n_vectors": n,
                    "n_cells": cells, "max_cell": max_cell,
                    "raw_pair_rows": int(raw_pairs),
                    "pair_rows": int(capped_pairs), "sec": sec,
                    "kept_phase1": int(kept_p1),
                    "kept_bridged": int(kept_bridged),
                    "bridge_recovered": int(kept_p1 - kept_bridged)})
        print(json.dumps(out[-1]))
    rr = out[1]["raw_pair_rows"] / max(out[0]["raw_pair_rows"], 1)
    pr = out[1]["pair_rows"] / max(out[0]["pair_rows"], 1)
    wr = out[1]["sec"] / out[0]["sec"]
    print(json.dumps({"experiment": "semdedup", "label": "4x_data_ratios",
                      "raw_pair_ratio": round(rr, 2),
                      "pair_ratio": round(pr, 2),
                      "wall_ratio": round(wr, 2)}))
    assert pr < 6, f"capped pair space superlinear: {pr} (quadratic = 16)"

    # --- bridge recovery on a planted boilerplate cluster (r10): the
    # random corpus has no 0.95-cosine pairs, so the arms above measure
    # pair SPACE only. Plant what SemDeDup actually targets — one
    # boilerplate vector duplicated 4096x (16x max_cell) flooding one
    # cell — and quantify what each phase keeps of it: uncapped truth
    # is 1 survivor; phase 1 alone keeps ~ceil(cluster/max_cell) (one
    # per sub-cell — the r09 recall loss); the exemplar bridge's
    # cross-sub-cell pass collapses those toward 1.
    n_dup = 4096
    emb2 = corpus_1m()
    dup_vec = F.expr(
        "transform(sequence(0,63), i -> CAST(1.0 + i AS DOUBLE) / 64.0)"
    )
    planted = emb2.filter(F.col("vec_id") < 400_000).withColumn(
        "embedding",
        F.when(F.col("vec_id") < n_dup, dup_vec.cast("array<float>"))
         .otherwise(F.col("embedding")),
    )
    idx = build_ivf_index(planted, n_cells=4096, train_sample=32768)
    dup_ids = planted.filter(F.col("vec_id") < n_dup).select("vec_id")
    res_b = semantic_dedup(idx, min_cosine=0.95, max_cell=max_cell)
    kept_b = (res_b.join(dup_ids, res_b.vec_id == dup_ids.vec_id)
              .agg(F.sum("kept")).collect()[0][0])
    res_1 = semantic_dedup(idx, min_cosine=0.95, max_cell=max_cell,
                           exemplar_bridge=False)
    kept_1 = (res_1.join(dup_ids, res_1.vec_id == dup_ids.vec_id)
              .agg(F.sum("kept")).collect()[0][0])
    idx.unpersist()
    rec = {"experiment": "semdedup", "label": "bridge_recovery",
           "planted_cluster": n_dup, "max_cell": max_cell,
           "uncapped_truth_kept": 1,
           "phase1_kept": int(kept_1), "bridged_kept": int(kept_b),
           "bridge_recovered_removals": int(kept_1 - kept_b)}
    print(json.dumps(rec))
    out.append(rec)
    assert kept_b < kept_1, "bridge recovered nothing on the planted cluster"
    return out


if EXPERIMENT == "kmeans":
    kmeans_experiment()
    sys.exit(0)

if EXPERIMENT == "semdedup":
    semdedup_experiment()
    sys.exit(0)

if EXPERIMENT == "pairs":
    pairs_experiment()
    sys.exit(0)

if EXPERIMENT == "ivf_recall":
    ivf_recall_experiment()
    sys.exit(0)

if EXPERIMENT == "ivf_assign":
    ivf_assign_experiment()
    sys.exit(0)

if EXPERIMENT == "ann":
    ann_experiment()
    sys.exit(0)

# merge experiment (default + 'merge'): guarded so 'ann' doesn't run it
if EXPERIMENT == "substr":
    substr_experiment()
    sys.exit(0)

def standing_state_experiment():
    """The r11 standing-state amortization, measured: with the corpus
    LSH signatures persisted as a warehouse table, the daily near-dup
    screen costs O(increment) tokenize + one equi-join against the
    stored signatures, while the recompute form re-tokenizes the corpus
    every run — so as the corpus grows 4x with a FIXED daily increment,
    the recompute screen should scale ~linearly and the standing screen
    should stay near-flat (its only corpus-side work is the signature
    scan). The candidate pair sets are asserted identical (the two forms
    derive both join sides from the same band_signatures definition).
    Also measured: the batch refresh job (linear — it IS the corpus
    pass, paid once per refresh window) vs the streamed per-increment
    maintenance append (flat — each micro-batch tokenizes only itself),
    which is the cost a production deployment actually pays daily."""
    from fn_rq_report_etl_dev_spark.operators.text_dedup import (
        incremental_lsh_candidates, incremental_lsh_candidates_standing)
    from fn_rq_report_etl_dev_spark.state import (
        CORPUS_SIGNATURES, refresh_corpus_state,
        stream_refresh_corpus_signatures)

    INCREMENT = 2_000
    DUP = 500  # increment docs that duplicate corpus texts (planted hits)

    def doc_text(idcol):
        # 18 id-derived words (unique per doc — no cross-doc shingle
        # sharing, so ground truth is EXACTLY the planted dups) + 2
        # anchor words so every doc shingles
        parts = [F.concat(F.lit("w"), idcol.cast("string"),
                          F.lit(f"_{i}"))
                 for i in range(18)]
        return F.concat_ws(" ", F.lit("alpha"), F.lit("beta"), *parts)

    results = []
    for n_corpus in (100_000, 400_000, 1_600_000):
        corpus = (spark.range(n_corpus)
                  .select(F.col("id").alias("doc_id"),
                          doc_text(F.col("id")).alias("text")))
        # increment: DUP exact-text dups of corpus docs (text derived from
        # the SAME id formula) + fresh docs beyond the corpus keyspace
        inc = (spark.range(INCREMENT)
               .select((F.col("id") + 10_000_000).alias("doc_id"),
                       F.when(F.col("id") < DUP, doc_text(F.col("id")))
                        .otherwise(doc_text(F.col("id") + 20_000_000))
                        .alias("text")))
        _force(corpus); _force(inc)

        wh = Warehouse(tempfile.mkdtemp(prefix="scale-standing-"))
        t0 = time.perf_counter()
        refresh_corpus_state(corpus, wh)
        refresh_s = round(time.perf_counter() - t0, 2)

        # streamed per-increment maintenance: land the increment, drain
        land = tempfile.mkdtemp(prefix="scale-standing-land-")
        ckpt = tempfile.mkdtemp(prefix="scale-standing-ckpt-")
        inc.write.mode("append").parquet(land)
        t0 = time.perf_counter()
        stream_refresh_corpus_signatures(
            spark, land, ckpt, wh, inc.schema)
        stream_append_s = round(time.perf_counter() - t0, 2)

        sigs = wh.read(spark, CORPUS_SIGNATURES).filter(
            F.col("doc_id") < 10_000_000)  # corpus side only, as stored
        t0 = time.perf_counter()
        standing = incremental_lsh_candidates_standing(
            inc, sigs, "doc_id", "text").collect()
        standing_s = round(time.perf_counter() - t0, 2)

        both = corpus.withColumn("__new", F.lit(False)).unionByName(
            inc.withColumn("__new", F.lit(True)))
        t0 = time.perf_counter()
        recompute = incremental_lsh_candidates(
            both, "doc_id", "text", F.col("__new")).collect()
        recompute_s = round(time.perf_counter() - t0, 2)

        assert set(map(tuple, standing)) == set(map(tuple, recompute)), (
            len(standing), len(recompute))
        assert len(standing) == DUP  # exactly the planted dups
        row = {"experiment": "standing_state", "corpus_docs": n_corpus,
               "increment_docs": INCREMENT, "planted_dups": DUP,
               "candidate_pairs": len(standing),
               "batch_refresh_s": refresh_s,
               "streamed_increment_append_s": stream_append_s,
               "daily_screen_standing_s": standing_s,
               "daily_screen_recompute_s": recompute_s}
        results.append(row)
        print(json.dumps(row))
    return results


if EXPERIMENT == "standing":
    standing_state_experiment()
    sys.exit(0)


if EXPERIMENT not in ("merge", "all"):
    sys.exit(0)

BATCH = 40_000  # fixed daily batch
results = []
for target_rows in (500_000, 2_000_000, 8_000_000):
    # half the batch updates existing keys (contiguous range inside the
    # target keyspace), half inserts brand-new keys beyond it — both merge
    # branches are exercised at every target size.
    lo = target_rows // 2
    batch = synth(BATCH, "s").withColumn(
        "k",
        F.when(F.col("k") < BATCH // 2, F.col("k") + lo)
        .otherwise(F.col("k") - BATCH // 2 + target_rows),
    )

    # full-table merge: read whole target, full-outer join, rewrite all
    wh = Warehouse(tempfile.mkdtemp(prefix="scale-flat-"))
    synth(target_rows, "t").write.parquet(wh.path("tgt"))
    t0 = time.perf_counter()
    merged = merge_upsert(wh.read(spark, "tgt", SCHEMA), batch, "k")
    wh.overwrite_atomic(merged, "tgt")
    flat_s = round(time.perf_counter() - t0, 2)

    # bucketed merge: 64 buckets, batch touches all buckets here (uniform
    # keys) -> worst case for bucketing; also try a bucket-aligned batch
    wh2 = Warehouse(tempfile.mkdtemp(prefix="scale-bkt-"))
    ensure_bucketed_target(spark, wh2, "tgt", SCHEMA, 64)
    merge_into_bucketed_target(spark, wh2, "tgt", synth(target_rows, "t"), "k", 64)
    t0 = time.perf_counter()
    merge_into_bucketed_target(spark, wh2, "tgt", batch, "k", 64)
    bkt_uniform_s = round(time.perf_counter() - t0, 2)

    # bucket-aligned batch (keys ≡ 0 mod 64 → touches 1 of 64 buckets)
    aligned = synth(BATCH, "s").withColumn("k", F.col("k") * 64)
    t0 = time.perf_counter()
    merge_into_bucketed_target(spark, wh2, "tgt", aligned, "k", 64)
    bkt_aligned_s = round(time.perf_counter() - t0, 2)

    results.append({"target_rows": target_rows, "batch_rows": BATCH,
                    "full_table_merge_s": flat_s,
                    "bucketed_uniform_batch_s": bkt_uniform_s,
                    "bucketed_aligned_batch_s": bkt_aligned_s})
    print(json.dumps(results[-1]))

if EXPERIMENT == "all":
    substr_experiment()
    kmeans_experiment()
    semdedup_experiment()
    pps_sample_experiment()
    pairs_experiment()
    skew_experiment()
    bloom_join_experiment()
    ann_experiment()
    ivf_assign_experiment()
    ivf_recall_experiment()


