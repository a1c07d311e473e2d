"""Connected components vs a pure-Python union-find oracle
(FIXTURES.md §6: CC oracle)."""

from __future__ import annotations

import random

from clann_spark.operators.connected_components import connected_components


def uf_oracle(edges):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    # relabel every node by component min
    comp: dict[int, list[int]] = {}
    for n in parent:
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for root, members in comp.items() for n in members}


def _run(spark, edges):
    df = spark.createDataFrame(edges, "a long, b long")
    want = uf_oracle(edges)
    # driver union-find fast path
    got = {r["doc_id"]: r["cluster_id"] for r in connected_components(df).collect()}
    assert got == want
    # distributed large-star/small-star path (threshold forced to 0)
    got_dist = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(df, driver_threshold=0).collect()
    }
    assert got_dist == want


def test_cc_golden_shapes(spark):
    # FIXTURES.md §5: chain + star + isolated pair
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (10, 13), (20, 21)]
    _run(spark, edges)


def test_cc_two_merging_paths(spark):
    edges = [(5, 1), (5, 9), (9, 3), (3, 1), (7, 8)]
    _run(spark, edges)


def test_cc_random_graph(spark):
    rng = random.Random(42)
    nodes = list(range(100))
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(120)]
    edges = [(a, b) for a, b in edges if a != b]
    _run(spark, edges)


def test_cc_empty(spark):
    df = spark.createDataFrame([], "a long, b long")
    assert connected_components(df).count() == 0
