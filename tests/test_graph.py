"""connected_components (large-star/small-star) vs a union-find oracle."""

import random

import pytest
from pyspark.sql import functions as F

from firebolt_cdc_lambda_spark.operators.graph import connected_components


def _uf_oracle(edges, nodes=None):
    """Min-member component labels via plain union-find."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    for a, b in edges:
        union(a, b)
    for n in (nodes or []):
        find(n)
    comps = {}
    for n in parent:
        comps.setdefault(find(n), []).append(n)
    out = {}
    for members in comps.values():
        m = min(members)
        for n in members:
            out[n] = m
    return out


def _run(spark, edges):
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["component"]
           for r in connected_components(df).collect()}
    assert got == _uf_oracle(edges)


def test_two_triangles_and_bridge(spark):
    _run(spark, [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (12, 10), (3, 10)])


def test_disjoint_components(spark):
    _run(spark, [(5, 6), (100, 200), (7, 8), (8, 9)])


def test_long_chain_converges_fast(spark):
    # naive label propagation needs O(n) rounds on a chain; star rounds
    # must close a 60-node path well inside the max_iter=50 budget.
    edges = [(i, i + 1) for i in range(60)]
    _run(spark, edges)


def test_hub(spark):
    # one doc near-dup to everything (boilerplate) — skew shape
    _run(spark, [(0, i) for i in range(1, 120)])


def test_duplicates_reversed_selfloops(spark):
    _run(spark, [(2, 1), (1, 2), (1, 1), (2, 2), (3, 2), (2, 3), (4, 4)])


def test_string_node_ids(spark):
    edges = [("b", "a"), ("c", "b"), ("x", "y")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["component"]
           for r in connected_components(df).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_custom_column_names(spark):
    df = spark.createDataFrame([(1, 2)], ["d1", "d2"])
    got = connected_components(df, src="d1", dst="d2").collect()
    assert {(r["node"], r["component"]) for r in got} == {(1, 1), (2, 1)}


def test_empty_edges(spark):
    df = spark.createDataFrame([], "src BIGINT, dst BIGINT")
    assert connected_components(df).count() == 0


@pytest.mark.parametrize("seed", [7, 21, 42])
def test_random_graphs(spark, seed):
    rng = random.Random(seed)
    n = 80
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(90)]
    edges = [e for e in edges if e[0] != e[1]]
    _run(spark, edges)


def test_components_are_min_labeled(spark):
    # representative selection contract: component == min(member ids),
    # so `node == component` picks exactly one representative per cluster
    edges = [(3, 9), (9, 4), (17, 12), (50, 3)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    out = connected_components(df)
    reps = out.where("node = component")
    sizes = out.groupBy("component").agg(F.count("*").alias("n"))
    assert reps.count() == sizes.count() == 2
    assert {r["component"] for r in reps.collect()} == {3, 12}
