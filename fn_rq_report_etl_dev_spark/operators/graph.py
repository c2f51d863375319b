"""Iterative graph operator: connected components by min-label
propagation — the transitive-closure step a dedup pipeline needs to turn
pairwise near-duplicate CANDIDATES into duplicate CLUSTERS (pick one
survivor per component, drop the rest).

This is the engine's iterative-algorithm class (no single SQL statement
expresses a fixed-point loop): a driver-side loop over DataFrame steps,
each iteration one join + aggregate, with ``localCheckpoint`` breaking the
lineage so plans don't grow unboundedly. Convergence is monotone (labels
only decrease), detected by the exact integer label-sum reaching a fixed
point; iteration count is bounded by the component diameter — tiny for
near-dup clusters, and at 100 TB each iteration is an ordinary shuffled
join/agg (the standard large-scale connected-components shape; switch to
GraphFrames/Pregel only for web-scale graphs with huge diameters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Label every node with the minimum node id reachable through the
    (undirected) edge set. Returns DataFrame[id, component].

    ``nodes``: one row per node id; ``edges``: undirected pairs (each pair
    listed once; both directions are derived).
    """
    und = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).union(edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))

    # localCheckpoint blocks live outside the CacheManager (clearCache
    # never frees them), so a long-running session would leak one
    # checkpoint per iteration. Each checkpoint's backing RDD is the
    # LogicalRDD plan node's rdd; unpersist the superseded one as soon as
    # its successor is eagerly materialized (it is never referenced
    # again — local checkpoints have no lineage to recompute from). Only
    # the final labels' blocks survive the loop.
    def _checkpoint_rdd(df: DataFrame):
        plan = df._jdf.queryExecution().analyzed()
        return plan.rdd() if plan.getClass().getSimpleName() == "LogicalRDD" else None

    labels = nodes.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("component")
    ).localCheckpoint(eager=True)
    prev_rdd = _checkpoint_rdd(labels)
    prev_sum = labels.agg(F.sum("component")).collect()[0][0]

    for _ in range(max_iterations):
        neighbor_min = (
            und.join(labels, und.src == labels.id)
            .groupBy("dst")
            .agg(F.min("component").alias("nb_min"))
        )
        labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.dst, "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("nb_min"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        if prev_rdd is not None:
            prev_rdd.unpersist(False)
        prev_rdd = _checkpoint_rdd(labels)
        new_sum = labels.agg(F.sum("component")).collect()[0][0]
        if new_sum == prev_sum:  # monotone → fixed point reached
            break
        prev_sum = new_sum
    return labels


def cluster_survivors(components: DataFrame) -> DataFrame:
    """One survivor per cluster (the component's min id) + cluster size —
    the keep/drop decision table for cluster-level dedup."""
    return components.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min("id").alias("survivor_id"),
    )


def oriented_triangle_stats(pairs: DataFrame) -> DataFrame:
    """Graph-level triangle statistics over an undirected edge set
    ``(a, b)`` with a < b: one row of (n_nodes, n_edges, n_wedges,
    n_triangles, clustering) where n_wedges = Σ C(deg, 2) over undirected
    degrees and clustering = 3·triangles / wedges.

    Triangles run the DEGREE-ORIENTED node-iterator: each edge is
    oriented from its lower-(degree, id) endpoint to the higher, wedges
    are enumerated from the common *source* and closed with one more
    oriented-edge equi-join. Under this total order every triangle is
    counted exactly once at its lowest-order vertex, and per-node wedge
    fan-out is C(out-degree, 2) — bounded by graph arboricity, so a
    power-law hub (whose edges all orient INTO it, out-degree ~0)
    cannot explode the join the way the naive Σ C(deg, 2) enumeration
    does. ``pairs`` is persisted (it feeds the degree pass and the edge
    count)."""
    pairs = pairs.persist()
    deg = (
        pairs.select(F.col("a").alias("node"))
        .unionAll(pairs.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
        .persist()
    )
    dega = deg.select(F.col("node").alias("a"), F.col("deg").alias("dega"))
    degb = deg.select(F.col("node").alias("b"), F.col("deg").alias("degb"))
    ed = pairs.join(dega, "a").join(degb, "b")
    a_lower = F.struct(F.col("dega"), F.col("a")) < F.struct(
        F.col("degb"), F.col("b")
    )
    okey_b = F.struct(F.col("degb").alias("dk"), F.col("b").alias("nk"))
    okey_a = F.struct(F.col("dega").alias("dk"), F.col("a").alias("nk"))
    o = ed.select(
        F.when(a_lower, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(a_lower, F.col("b")).otherwise(F.col("a")).alias("dst"),
        F.when(a_lower, okey_b).otherwise(okey_a).alias("okey_dst"),
    )
    o1 = o.select("src", F.col("dst").alias("y"), F.col("okey_dst").alias("ky"))
    o2 = o.select("src", F.col("dst").alias("z"), F.col("okey_dst").alias("kz"))
    wedges_df = o1.join(o2, "src").filter(F.col("ky") < F.col("kz"))
    closing = o.select(F.col("src").alias("y"), F.col("dst").alias("z"))
    tri = wedges_df.join(closing, ["y", "z"]).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triangles")
    )
    nd = deg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        F.sum(((F.col("deg") * (F.col("deg") - 1)) / 2).cast("bigint"))
        .cast("bigint")
        .alias("n_wedges"),
    )
    n_edges = pairs.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    return (
        nd.crossJoin(F.broadcast(n_edges))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.when(
                F.col("n_wedges") > 0,
                F.round(F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"), 6),
            ).alias("clustering"),
        )
    )


def pagerank_integer(
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = 5,
    scale: int = 10**12,
    damping_pct: int = 85,
) -> DataFrame:
    """Fixed-iteration damped PageRank in SCALED-INTEGER arithmetic.

    ``nodes`` is one column ``node``; ``edges`` is distinct directed
    ``(src, dst)``. Returns ``(node, r)`` where ``r`` is the rank after
    ``iterations`` rounds, represented as a bigint on a ``scale`` grid.

    Why integers: the textbook formulation sums doubles across incoming
    edges, and float addition is order-dependent — the same graph would
    hash differently across partition counts (and engines). Every
    quantity here is a nonnegative bigint and every division an integral
    ``div``, so the result is EXACTLY reproducible: any engine replaying
    the same recurrence (e.g. an unrolled SQL CTE chain in DuckDB) gets
    bit-identical ranks. The recurrence per round:

        contrib(u) = r(u) div outdeg(u)                    (u with edges)
        r'(v) = ((100-d)*(scale div N) + d*sum_in(v)) div 100

    Dangling/isolated nodes keep the teleport term only (their mass is
    dropped, not redistributed — documented contract, same both engines).

    Scale shape: ranks and degrees are node-sized (|parts| << |edges|),
    so the per-round edge join BROADCASTS the contribution table and the
    only shuffle per round is the map-side-combined sum over ``dst``; the
    big edge relation is never re-partitioned. A fixed iteration count
    keeps the composed plan depth bounded (no convergence collect).
    """
    teleport_pct = 100 - damping_pct
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    n_df = nodes.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    base = f"CAST({scale} AS BIGINT) div n_nodes"
    ranks = (
        nodes.crossJoin(F.broadcast(n_df)).select("node", F.expr(base).alias("r"))
    )
    # deg re-derives from `edges`, so its key is RENAMED before joining
    # back (cnode/csrc) — avoids Spark's ambiguous self-join lineage.
    # Teleport for no-inflow nodes is a UNION of zero rows into the same
    # dst aggregate, NOT a nodes-LEFT-JOIN-insum: the left-join form costs
    # an extra broadcast-exchange materialization JOB per round (nested
    # broadcasts serialize), measured ~25% of round wall on tiny rounds —
    # and at scale the union rides the existing dst shuffle for free.
    degc = deg.select(F.col("src").alias("cnode"), "outdeg")
    zero = nodes.select("node", F.lit(0).cast("bigint").alias("c"))
    for _ in range(iterations):
        contrib = ranks.join(
            degc, ranks["node"] == degc["cnode"]
        ).select(F.col("cnode").alias("csrc"), F.expr("r div outdeg").alias("c"))
        inflow = edges.join(
            F.broadcast(contrib), F.col("src") == F.col("csrc")
        ).select(F.col("dst").alias("node"), "c")
        ranks = (
            inflow.unionByName(zero)
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
            .crossJoin(F.broadcast(n_df))
            .select(
                "node",
                F.expr(
                    f"({teleport_pct} * ({base}) + {damping_pct} * s) div 100"
                ).alias("r"),
            )
        )
    return ranks


def bfs_min_hops(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int,
    src_col: str = "src",
    dst_col: str = "dst",
    seed_col: str = "node",
) -> DataFrame:
    """Minimum hop distance (breadth-first) from a seed node set over a
    DIRECTED edge list, bounded at ``max_hops``. Returns
    DataFrame[node, hops] covering exactly the nodes reachable within the
    bound (seeds themselves at 0).

    The level-synchronous shape: the frontier of round ``i`` joins the
    edge table once, newly discovered nodes (anti-join against everything
    already reached) become round ``i+1``'s frontier. BFS invariant: a
    node discovered in round i has min-distance i, so no re-visits and no
    min-aggregation over paths is ever needed — each edge is traversed at
    most once per endpoint. ``localCheckpoint`` breaks per-round lineage
    (same discipline as :func:`connected_components`, incl. unpersisting
    superseded blocks); the per-round cost is ONE shuffled join + ONE
    anti-join, and the loop is a fixed ``max_hops`` — no convergence
    collect needed beyond an early-exit emptiness check on the frontier.
    """
    def _checkpoint_rdd(df: DataFrame):
        plan = df._jdf.queryExecution().analyzed()
        return plan.rdd() if plan.getClass().getSimpleName() == "LogicalRDD" else None

    frontier = (
        seeds.select(F.col(seed_col).alias("node"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    reached = frontier.withColumn("hops", F.lit(0).cast("int")).localCheckpoint(
        eager=True
    )
    dead: list = []
    prev_frontier_rdd = _checkpoint_rdd(frontier)
    prev_reached_rdd = _checkpoint_rdd(reached)
    e = edges.select(F.col(src_col).alias("e_src"), F.col(dst_col).alias("e_dst"))
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["e_src"])
            .select(F.col("e_dst").alias("node"))
            .distinct()
            .join(reached, "node", "left_anti")
            .localCheckpoint(eager=True)
        )
        if prev_frontier_rdd is not None:
            prev_frontier_rdd.unpersist(False)
        prev_frontier_rdd = _checkpoint_rdd(nxt)
        frontier = nxt
        if frontier.isEmpty():
            break
        reached = reached.unionByName(
            frontier.withColumn("hops", F.lit(hop).cast("int"))
        ).localCheckpoint(eager=True)
        # the old reached blocks feed nothing after the union materializes
        if prev_reached_rdd is not None:
            prev_reached_rdd.unpersist(False)
        prev_reached_rdd = _checkpoint_rdd(reached)
    return reached


def sssp_relax(
    edges: DataFrame,
    seeds: DataFrame,
    rounds: int,
    src_col: str = "src",
    dst_col: str = "dst",
    w_col: str = "w",
    seed_col: str = "node",
) -> DataFrame:
    """Multi-source shortest path over NONNEGATIVE integer edge weights:
    ``rounds`` synchronous Bellman-Ford relaxations, i.e. exact min-plus
    distance over paths of at most ``rounds`` edges (seeds at 0).
    Returns DataFrame[node, dist] for every node reachable within the
    bound. The weighted counterpart to :func:`bfs_min_hops` — hop counts
    are the w≡1 special case, but with real weights a node's label can
    IMPROVE after first discovery, so the frontier/anti-join shape is
    unsound; the correct round is relax-everything + min-aggregate:

        dist_{i+1}(v) = min(dist_i(v), min over (u,v,w): dist_i(u) + w)

    Per round: ONE shuffled join (current labels × edges) + ONE
    map-side-combinable min-aggregate. Integer arithmetic — exact in any
    association, so a SQL replay of the unrolled recurrence matches
    bit-for-bit. Early exit on a fixed point via a (count, sum) scalar
    pair — the label multiset is monotone (counts only grow, sums only
    shrink per node), so an unchanged pair means convergence.
    ``localCheckpoint`` + unpersist-superseded lineage discipline as in
    :func:`connected_components_min_label`.
    """

    def _checkpoint_rdd(df: DataFrame):
        plan = df._jdf.queryExecution().analyzed()
        return plan.rdd() if plan.getClass().getSimpleName() == "LogicalRDD" else None

    e = edges.select(
        F.col(src_col).alias("e_src"),
        F.col(dst_col).alias("e_dst"),
        F.col(w_col).cast("bigint").alias("e_w"),
    )
    dist = (
        seeds.select(F.col(seed_col).alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0).cast("bigint"))
        .localCheckpoint(eager=True)
    )
    prev_rdd = _checkpoint_rdd(dist)
    prev_sig = tuple(dist.agg(F.count(F.lit(1)), F.sum("dist")).collect()[0])
    for _ in range(rounds):
        relaxed = dist.join(e, dist["node"] == e["e_src"]).select(
            F.col("e_dst").alias("node"), (F.col("dist") + F.col("e_w")).alias("dist")
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
        if prev_rdd is not None:
            prev_rdd.unpersist(False)
        prev_rdd = _checkpoint_rdd(dist)
        sig = tuple(dist.agg(F.count(F.lit(1)), F.sum("dist")).collect()[0])
        if sig == prev_sig:
            break
        prev_sig = sig
    return dist


def sssp_relax_delta(
    edges: DataFrame,
    seeds: DataFrame,
    rounds: int,
    src_col: str = "src",
    dst_col: str = "dst",
    w_col: str = "w",
    seed_col: str = "node",
) -> DataFrame:
    """Delta-frontier Bellman-Ford: bit-identical per-round labels to
    :func:`sssp_relax` (asserted in SCALING.md's sssp experiment and the
    shared unrolled-CTE oracle), but each round joins only the FRONTIER —
    the nodes whose label improved last round — against the edge table,
    not the whole label set.

    Soundness (why this frontier is fine while BFS's reached/anti-join
    frontier is not): in relax-all, a round-``i+1`` improvement of v via
    edge (u, v, w) uses dist_i(u) + w; if u's label did NOT improve in
    round ``i`` (dist_i(u) = dist_{i-1}(u)) then round ``i`` already
    applied exactly that value, so re-relaxing u's out-edges is a no-op.
    Hence restricting round ``i+1``'s join to round-``i`` improvers
    yields the SAME label function every round — this is the Pregel/
    delta-stepping-lite formulation, not an approximation. (The unsound
    shape the relax-all docstring warns about is the BFS anti-join that
    FREEZES a node's label at first discovery; here nodes re-enter the
    frontier whenever they improve.)

    Scale shape per round: join(|frontier| ⋈ E_out) + min-aggregate over
    the candidates only + one full-outer join against the |V| label table
    to detect improvements. Relax-all's per-round cost is join(|V| ⋈ E) +
    aggregate over |V| + |relaxed| — on graphs that mostly converge in a
    few rounds the frontier collapses geometrically while |V| ⋈ E stays
    flat, which is exactly the measured two-regime behavior (SCALING.md).
    Early exit when the frontier empties = the true fixed point (every
    edge relaxed against its source's final label)."""

    def _checkpoint_rdd(df: DataFrame):
        plan = df._jdf.queryExecution().analyzed()
        return plan.rdd() if plan.getClass().getSimpleName() == "LogicalRDD" else None

    e = edges.select(
        F.col(src_col).alias("e_src"),
        F.col(dst_col).alias("e_dst"),
        F.col(w_col).cast("bigint").alias("e_w"),
    )
    dist = (
        seeds.select(F.col(seed_col).alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0).cast("bigint"))
        .localCheckpoint(eager=True)
    )
    frontier = dist
    prev_dist_rdd = _checkpoint_rdd(dist)
    for _ in range(rounds):
        cand = (
            frontier.join(e, frontier["node"] == e["e_src"])
            .select(
                F.col("e_dst").alias("node"),
                (F.col("dist") + F.col("e_w")).alias("nd"),
            )
            .groupBy("node")
            .agg(F.min("nd").alias("nd"))
        )
        merged = dist.join(cand, "node", "full_outer")
        improved = F.col("nd").isNotNull() & (
            F.col("dist").isNull() | (F.col("nd") < F.col("dist"))
        )
        nxt = merged.select(
            "node",
            F.when(improved, F.col("nd")).otherwise(F.col("dist")).alias("dist"),
            improved.alias("__imp"),
        ).localCheckpoint(eager=True)
        new_frontier = nxt.filter(F.col("__imp")).select("node", "dist")
        new_dist = nxt.select("node", "dist")
        # The frontier is a filter VIEW over the same checkpointed `nxt`
        # plan, so draining the single prev_dist_rdd handle releases the
        # round's only materialization — there is no separate frontier
        # RDD to unpersist (ADVICE r06: the old prev_frontier_rdd slot
        # was dead code, never assigned a real RDD).
        if prev_dist_rdd is not None:
            prev_dist_rdd.unpersist(False)
        prev_dist_rdd = _checkpoint_rdd(nxt)
        dist, frontier = new_dist, new_frontier
        if frontier.isEmpty():
            break
    return dist
