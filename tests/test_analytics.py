"""Unit/property tests for the analytics batch: the distributed NTILE
operator against Spark's own ntile(), and the degree-oriented triangle
count against a naive a<b<c enumeration."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fn_rq_report_etl_dev_spark.operators.ranking import distributed_ntile


@pytest.mark.parametrize(
    ("n", "k"),
    [(0, 5), (1, 5), (3, 5), (5, 5), (7, 3), (100, 5), (101, 4), (997, 7)],
)
def test_distributed_ntile_matches_native(spark, n, k):
    """distributed_ntile == ntile() OVER (ORDER BY v, id) for a total
    order, across empty / n<k / n%k==0 / n%k!=0 shapes, with heavy value
    ties (id breaks them)."""
    rng = random.Random(42 + n)
    rows = [(i, rng.randint(0, 9)) for i in range(n)]
    df = spark.createDataFrame(rows, "id bigint, v int") if rows else (
        spark.createDataFrame([], "id bigint, v int")
    )
    order = [F.col("v").asc(), F.col("id").asc()]
    got = {
        r["id"]: r["nt"]
        for r in distributed_ntile(df, order, k, "nt", num_partitions=5).collect()
    }
    want = {
        r["id"]: r["nt"]
        for r in df.select(
            "id", F.ntile(k).over(Window.orderBy(*order)).alias("nt")
        ).collect()
    }
    assert got == want


def test_distributed_ntile_desc_and_single_partition(spark):
    """Descending order and num_partitions=1 both reproduce native ntile."""
    rows = [(i, i % 13) for i in range(57)]
    df = spark.createDataFrame(rows, "id bigint, v int")
    order = [F.col("v").desc(), F.col("id").asc()]
    got = {
        r["id"]: r["nt"]
        for r in distributed_ntile(df, order, 4, "nt", num_partitions=1).collect()
    }
    want = {
        r["id"]: r["nt"]
        for r in df.select(
            "id", F.ntile(4).over(Window.orderBy(*order)).alias("nt")
        ).collect()
    }
    assert got == want


def _naive_triangles(edges: set[tuple[int, int]]) -> int:
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    count = 0
    for a, b in edges:
        for c in adj[a]:
            if c > b and c in adj[b]:
                count += 1
    return count


def test_oriented_triangle_count_matches_naive(spark):
    """oriented_triangle_stats counts exactly the naive a<b<c triangle
    set on a random graph (including hub skew), and its wedge count is
    the closed-form sum of C(deg, 2)."""
    from fn_rq_report_etl_dev_spark.operators.graph import oriented_triangle_stats

    rng = random.Random(7)
    edges = set()
    # a hub node (0) plus random sparse edges — exercises the orientation
    for i in range(1, 30):
        edges.add((0, i))
    while len(edges) < 120:
        a, b = rng.randrange(60), rng.randrange(60)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    pairs = spark.createDataFrame(sorted(edges), "a bigint, b bigint")
    row = oriented_triangle_stats(pairs).collect()[0]
    assert row["n_triangles"] == _naive_triangles(edges)
    deg: dict[int, int] = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    assert row["n_wedges"] == sum(d * (d - 1) // 2 for d in deg.values())
    assert row["n_edges"] == len(edges)
    assert row["n_nodes"] == len(deg)


@pytest.mark.parametrize("n", [0, 1, 7, 100, 997])
def test_global_row_number_matches_native(spark, n):
    """global_row_number == row_number() OVER (ORDER BY v DESC, id) across
    empty / tiny / tie-heavy inputs and both sort directions."""
    from fn_rq_report_etl_dev_spark.operators.ranking import global_row_number

    rng = random.Random(7 + n)
    rows = [(i, rng.randint(0, 9)) for i in range(n)]
    df = spark.createDataFrame(rows, "id bigint, v int") if rows else (
        spark.createDataFrame([], "id bigint, v int")
    )
    order = [F.col("v").desc(), F.col("id").asc()]
    got = {
        r["id"]: r["seq"]
        for r in global_row_number(df, order, "seq", num_partitions=5).collect()
    }
    want = {
        r["id"]: r["seq"]
        for r in df.select(
            "id", F.row_number().over(Window.orderBy(*order)).alias("seq")
        ).collect()
    }
    assert got == want
