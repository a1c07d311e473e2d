"""Connected components over verified duplicate pairs
(large-star / small-star alternation, Kiveris et al. "Connected
Components in MapReduce and Beyond" — cited as the CC building block
in PAPERS.md; BTS/ICDE'24 is the load-balanced successor).

Target-only operator: the reference returns candidate pairs
(collection.hpp:390-504) but never resolves them into clusters; the
BASELINE.json north_rule demands duplicate *clusters*, with the
cluster id matching the reference's ClusterCenter.assignment semantics
(src/core/index.rs:32) — every member labeled by a representative,
here min(doc_id) of the component.

Convergence: large-star halves the height of any tree, small-star
re-parents everything at the local min; O(log n) rounds. Each round is
two groupBy shuffles; lineage is cut with localCheckpoint so the plan
does not grow across iterations (this is what makes a 50-round loop
feasible on a real cluster).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(e: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(N(u) ∪ {u})."""
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("mn"))
    # ^ min over neighbors and self
    return (
        sym.join(m, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("mn").alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Within each node's smaller-or-equal neighborhood, star at the min."""
    canon = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    m = canon.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("mn"))
    nodes = canon.select("u", "v").union(canon.select("u", F.col("u").alias("v"))).distinct()
    return (
        nodes.join(m, "u")
        .where(F.col("v") != F.col("mn"))
        .select(F.col("v").alias("u"), F.col("mn").alias("v"))
        .distinct()
    )


def _driver_union_find(spark, edges: list) -> DataFrame:
    """Small-graph fast path: classic union-find on the driver.

    Alternating-star rounds cost ~10 Spark jobs each; below the
    threshold the whole edge list fits comfortably in driver memory
    (2M edges ≈ 32 MB) and union-find is O(E α). Same output contract.
    """
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    import pandas as pd

    # pandas frame -> Arrow path for createDataFrame: the list-of-tuples
    # form pickles row-by-row through the JVM (a flat serial cost on
    # every run); the Arrow path ships two int64 buffers
    rows = pd.DataFrame(
        {"doc_id": list(parent), "cluster_id": [find(n) for n in parent]},
        dtype="int64",
    )
    return spark.createDataFrame(rows)


def connected_components(
    pairs: DataFrame,
    max_iter: int = 50,
    checkpoint_every: int = 2,
    driver_threshold: int = 2_000_000,
) -> DataFrame:
    """(a, b) edges -> (doc_id, cluster_id) with cluster_id = component min.

    Only nodes that appear in an edge are returned (isolated docs keep
    themselves as their own cluster trivially; callers left-join).

    Adaptive execution: the distinct edge count is known after the first
    materialization; below driver_threshold the component resolution
    runs as driver-side union-find (identical result, ~10x fewer jobs),
    above it the O(log n)-round large-star/small-star loop runs fully
    distributed. Dedup edge sets at 10^12-doc scale exceed any driver,
    so the loop is the scale path; the threshold only short-circuits
    the long tail of small graphs.
    """
    e = pairs.select(F.col("a").cast("long").alias("u"), F.col("b").cast("long").alias("v"))
    e = e.where(F.col("u") != F.col("v")).distinct()

    # single-probe small-graph shortcut: persist the distinct edge set
    # and probe it with ONE limit(threshold+1).toPandas() job. The old
    # form ran an eager localCheckpoint job first and then the probe —
    # two sequential jobs on every run's serial path; the common small-
    # graph case now pays exactly one. The large path localCheckpoints
    # from the cache below (lineage cut for the loop), then releases it.
    spark = pairs.sparkSession
    cached = e.persist()
    # toPandas: Arrow transfer of two int64 columns, vs collect()'s
    # per-Row pickling — the probe is on every run's serial path
    head = cached.limit(driver_threshold + 1).toPandas()
    if len(head) <= driver_threshold:
        cached.unpersist()
        if head.empty:
            return spark.createDataFrame([], "doc_id long, cluster_id long")
        return _driver_union_find(
            spark, list(zip(head["u"].tolist(), head["v"].tolist()))
        )
    e = cached.localCheckpoint()
    cached.unpersist()

    def _fingerprint(df: DataFrame) -> tuple:
        # order-insensitive set fingerprint: (count, sum of row hashes).
        # Equal sets -> equal fingerprints; unequal sets collide with
        # probability ~2^-64 — fine for convergence detection.
        # hashes reduced mod 2^32, then summed as decimal(38,0): an int64
        # sum would overflow (and raise under ANSI mode, the Spark 4
        # default) beyond ~2^31 edges — exactly the scale this loop is
        # the designated path for.
        row = df.agg(
            F.count("*").alias("n"),
            F.sum(
                F.pmod(F.xxhash64("u", "v"), F.lit(1 << 32)).cast("decimal(38,0)")
            ).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    fp = _fingerprint(e)
    edges_per_round = [fp[0]]
    for i in range(max_iter):
        # localCheckpoint every round: each star is 2 shuffles and the
        # convergence check re-executes the plan, so an uncut lineage
        # would re-run all previous rounds.
        e2 = _small_star(_large_star(e)).localCheckpoint()
        fp2 = _fingerprint(e2)
        e = e2
        edges_per_round.append(fp2[0])
        if fp2 == fp:
            break
        fp = fp2
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")

    # final edges are (node -> component min) stars; add the roots
    assign = e.select(F.col("u").alias("doc_id"), F.col("v").alias("cluster_id"))
    roots = assign.select(F.col("cluster_id").alias("doc_id"), F.col("cluster_id")).distinct()
    out = assign.union(roots).groupBy("doc_id").agg(F.min("cluster_id").alias("cluster_id"))
    # scale observability (tests pin the O(log n) round bound and the
    # bounded per-round edge growth): rounds run + distinct edge count
    # after each round, including the input round 0
    out._clann_cc_stats = {"rounds": i + 1, "edges_per_round": edges_per_round}
    return out
