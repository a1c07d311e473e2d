"""Gonzalez partitioning vs reference semantics (gmm.rs:21-63) and the
cluster-ordering golden pattern (src/core/index.rs:688-749)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from clann_spark.operators.clustering import (
    assign_partitions,
    cluster_stats,
    default_k,
    fit_partitioner,
    gonzalez,
    pairwise_distance,
    sort_clusters_for_query,
)


def test_gonzalez_farthest_first():
    # 3 tight groups on a line (euclidean): centers must land in
    # distinct groups, assignment must follow proximity
    pts = np.array(
        [[0.0], [0.1], [0.2], [10.0], [10.1], [20.0], [20.2]], dtype=np.float64
    )
    centers, assign, radii, _ = gonzalez(pts, 3, "euclidean")
    assert centers[0] == 0
    want_groups = {frozenset({0, 1, 2}), frozenset({3, 4}), frozenset({5, 6})}
    got_groups = {frozenset(np.where(assign == c)[0].tolist()) for c in range(3)}
    assert got_groups == want_groups
    assert (radii <= 0.21).all()


def test_gonzalez_radius_shrinks_with_k():
    rng = np.random.default_rng(42)
    pts = rng.normal(size=(200, 8))
    r = []
    for k in (1, 4, 16, 64):
        _, _, radii, d = gonzalez(pts, k, "euclidean")
        r.append(d.max())
    assert r == sorted(r, reverse=True)


def test_default_k():
    assert default_k(0) == 1
    assert default_k(100) == 10
    assert default_k(100, factor=0.4) == 4


def test_sort_clusters_for_query_ordering():
    # mirrors the reference golden test pattern (test_sort_cluster,
    # src/core/index.rs:696-749): fixed centers, query nearest to #2,
    # then #0, then #1
    centers = np.array([[1.0, 0.2], [-1.0, 0.0], [1.0, 0.0]])
    query = np.array([1.0, 0.05])
    order = sort_clusters_for_query(centers, query, "cosine").tolist()
    assert order == [2, 0, 1]


def test_assign_partitions_matches_numpy(spark, embeddings):
    centers = fit_partitioner(embeddings, "embedding", id_col="vec_id", k=8)
    assigned = assign_partitions(embeddings, centers, "embedding")
    rows = assigned.select("vec_id", "embedding", "partition_id", "center_dist").collect()
    x = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    d = pairwise_distance(x, centers, "cosine")
    want_pid = d.argmin(axis=1)
    got_pid = np.array([r["partition_id"] for r in rows])
    assert (got_pid == want_pid).all()
    got_d = np.array([r["center_dist"] for r in rows])
    assert np.allclose(got_d, d[np.arange(len(rows)), want_pid])


def test_cluster_stats_routing(spark, embeddings):
    centers = fit_partitioner(embeddings, "embedding", id_col="vec_id", k=4)
    assigned = assign_partitions(embeddings, centers, "embedding")
    stats = cluster_stats(assigned, brute_force_below=100).collect()
    assert sum(r["n_points"] for r in stats) == embeddings.count()
    for r in stats:
        assert r["brute_force"] == (r["n_points"] < 100)
        assert r["radius"] >= 0.0


def test_fit_deterministic(spark, embeddings):
    c1 = fit_partitioner(embeddings, "embedding", id_col="vec_id", k=8)
    c2 = fit_partitioner(embeddings, "embedding", id_col="vec_id", k=8)
    assert np.array_equal(c1, c2)
