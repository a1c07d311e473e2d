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


def test_cc_scale_pin_skewed_100k(spark):
    """Round-4 VERDICT item 8: the distributed large-star/small-star
    loop on a >=100k-node skewed fixture (one 100k-spoke star + a
    4096-node chain + scattered small components) must converge within
    the O(log n) round bound with bounded per-round edge growth —
    the properties that make a 10^12-scale CC feasible on a cluster.
    driver_threshold=0 forces the distributed path."""
    import math

    from pyspark.sql import functions as F

    star_n, chain_n, smalls = 100_000, 4_096, 1_000
    hub = 0
    star = spark.range(1, star_n).select(
        F.lit(hub).alias("a"), F.col("id").alias("b")
    )
    base = 10_000_000
    chain = spark.range(chain_n - 1).select(
        (base + F.col("id")).alias("a"), (base + F.col("id") + 1).alias("b")
    )
    sbase = 20_000_000
    small = spark.range(smalls).select(
        (sbase + 2 * F.col("id")).alias("a"), (sbase + 2 * F.col("id") + 1).alias("b")
    )
    edges = star.union(chain).union(small)

    out = connected_components(edges, driver_threshold=0)
    stats = out._clann_cc_stats
    n_nodes = star_n + chain_n + 2 * smalls
    # O(log n) convergence: the chain (diameter 4096) dominates; each
    # large-star round at least halves tree height
    bound = 2 * math.ceil(math.log2(n_nodes)) + 2
    assert stats["rounds"] <= bound, stats
    # bounded shuffle growth: no round's distinct edge set exceeds a
    # small multiple of the input's (the star-contraction property —
    # a blowup here is what stalls CC at web scale)
    e0 = stats["edges_per_round"][0]
    assert max(stats["edges_per_round"]) <= 3 * e0, stats["edges_per_round"]

    # correctness on the skewed shape: star + chain + isolated pairs
    agg = (
        out.groupBy("cluster_id").agg(F.count("*").alias("n"))
        .groupBy("n").agg(F.count("*").alias("k")).collect()
    )
    sizes = {r["n"]: r["k"] for r in agg}
    assert sizes[star_n] == 1 and sizes[chain_n] == 1 and sizes[2] == smalls
