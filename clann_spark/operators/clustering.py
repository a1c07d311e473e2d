"""Coarse metric partitioning — the Spark rendering of clann's
greedy min-max (Gonzalez) clustering build stage.

Reference semantics:
  greedy_minimum_maximum  -> src/core/gmm.rs:21-63 (start at point 0,
      repeatedly take the point farthest from its nearest chosen
      center; maintain per-row min distance + assignment; radii = max
      assigned distance per center)
  k = floor(factor * sqrt(n)) -> src/core/index.rs:78-80
  argmax helper            -> src/core/gmm.rs:5-15
  assignment inversion     -> src/core/index.rs:188-192 (here: a
      partition_id column, never a nested list)
  cluster radius           -> src/core/gmm.rs:56-60
  brute-force routing      -> src/core/index.rs:204-205 (< 100 points)
  cluster ordering by query distance -> src/core/index.rs:592-616

Spark-first shape (SURVEY.md §2.4 C1): the reference runs k full-data
passes; at 10^12 rows that is k full scans. Here Gonzalez runs on a
deterministic driver-side SAMPLE (k-means||-style), then every row is
assigned by one broadcast argmin projection (P8: a projection, not a
join). Sampling keeps the k-center guarantee approximately (standard
practice); the assignment pass is exact for the chosen centers.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pairwise_distance(x: np.ndarray, c: np.ndarray, metric: str) -> np.ndarray:
    """(n, d) x (k, d) -> (n, k) distances."""
    if metric == "cosine":
        xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        cn = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)
        return 1.0 - xn @ cn.T
    if metric == "euclidean":
        x2 = (x * x).sum(axis=1)[:, None]
        c2 = (c * c).sum(axis=1)[None, :]
        return np.sqrt(np.maximum(0.0, x2 + c2 - 2.0 * (x @ c.T)))
    if metric == "sig_jaccard":
        # estimated Jaccard distance between MinHash signatures:
        # 1 - fraction of matching lanes
        n, k = x.shape[0], c.shape[0]
        out = np.empty((n, k))
        for j in range(k):
            out[:, j] = 1.0 - (x == c[j][None, :]).mean(axis=1)
        return out
    raise ValueError(f"unknown metric {metric!r}")


def gonzalez(points: np.ndarray, k: int, metric: str = "cosine"):
    """Greedy k-center on a point matrix (gmm.rs:21-63 semantics).

    Returns (center_indices, assignment, radii, min_dists).
    Deterministic: starts at row 0; ties break to the lowest index
    (np.argmax picks the first maximum, like the reference's argmax
    scan gmm.rs:5-15).
    """
    n = points.shape[0]
    k = max(1, min(k, n))
    centers = [0]
    d = pairwise_distance(points, points[[0]], metric)[:, 0]
    assign = np.zeros(n, dtype=np.int64)
    for _ in range(1, k):
        nxt = int(np.argmax(d))
        if d[nxt] <= 0.0:
            break  # all points coincide with chosen centers
        centers.append(nxt)
        nd = pairwise_distance(points, points[[nxt]], metric)[:, 0]
        closer = nd < d
        assign[closer] = len(centers) - 1
        d = np.where(closer, nd, d)
    radii = np.zeros(len(centers))
    for ci in range(len(centers)):
        mask = assign == ci
        if mask.any():
            radii[ci] = d[mask].max()
    return np.array(centers, dtype=np.int64), assign, radii, d


def default_k(n: int, factor: float = 1.0) -> int:
    """k = floor(factor * sqrt(n)), min 1 (src/core/index.rs:78-80)."""
    return max(1, int(factor * math.isqrt(max(1, n))))


def sample_points(
    df: DataFrame, vec_col: str, id_col: str, n_sample: int, order: str = "hash"
) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic sample: the n_sample rows with smallest
    xxhash64(id) — stable across partitioning, retries, cluster size.

    order='id' sorts by the raw id instead — less statistically spread,
    but expressible in ANSI SQL, which lets the DuckDB oracle reproduce
    the exact center choice (used by the gonzalez driver query)."""
    key = F.col("_id") if order == "id" else F.xxhash64(F.col("_id"))
    rows = (
        df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .withColumn("_h", key)
        .orderBy("_h")
        .limit(n_sample)
        .collect()
    )
    ids = np.array([r["_id"] for r in rows], dtype=np.int64)
    pts = np.array([list(r["_v"]) for r in rows], dtype=np.float64)
    return ids, pts


def fit_partitioner(
    df: DataFrame,
    vec_col: str,
    id_col: str = "doc_id",
    k: int | None = None,
    n_sample: int = 4096,
    metric: str = "cosine",
    sample_order: str = "hash",
) -> np.ndarray:
    """Gonzalez on a deterministic sample -> (k, d) center matrix."""
    ids, pts = sample_points(df, vec_col, id_col, n_sample, order=sample_order)
    if k is None:
        k = default_k(pts.shape[0])
    centers_idx, _, _, _ = gonzalez(pts, k, metric)
    return pts[centers_idx]


def assign_partitions(
    df: DataFrame,
    centers: np.ndarray,
    vec_col: str,
    metric: str = "cosine",
) -> DataFrame:
    """Broadcast-argmin assignment: adds partition_id + center_dist.

    One narrow vectorized projection over the whole table — the scale
    analog of the reference's all_distances broadcast map (P8,
    angulardata.rs:38-43) followed by argmin.
    """
    from pyspark.sql.types import DoubleType, IntegerType, StructField, StructType

    c = centers.copy()

    schema = StructType(
        [
            StructField("partition_id", IntegerType()),
            StructField("center_dist", DoubleType()),
        ]
    )

    @F.pandas_udf(schema)
    def _assign(vecs: pd.Series) -> pd.DataFrame:
        if len(vecs) == 0:
            return pd.DataFrame({"partition_id": [], "center_dist": []})
        x = np.vstack(vecs.to_numpy()).astype(np.float64, copy=False)
        d = pairwise_distance(x, c, metric)
        pid = d.argmin(axis=1)
        return pd.DataFrame(
            {
                "partition_id": pid.astype(np.int32),
                "center_dist": d[np.arange(len(pid)), pid],
            }
        )

    out = df.withColumn("_p", _assign(F.col(vec_col)))
    return (
        out.withColumn("partition_id", F.col("_p.partition_id"))
        .withColumn("center_dist", F.col("_p.center_dist"))
        .drop("_p")
    )


def cluster_stats(assigned: DataFrame, brute_force_below: int = 100) -> DataFrame:
    """Per-partition size + radius + brute-force routing flag
    (C4/C5: src/core/index.rs:204-205, gmm.rs:56-60)."""
    return assigned.groupBy("partition_id").agg(
        F.count("*").alias("n_points"),
        F.max("center_dist").alias("radius"),
        (F.count("*") < brute_force_below).alias("brute_force"),
    )


def sort_clusters_for_query(
    centers: np.ndarray, query: np.ndarray, metric: str = "cosine"
) -> np.ndarray:
    """Cluster visit order for a query: ascending center distance
    (src/core/index.rs:592-616). Driver-side — centers are tiny."""
    d = pairwise_distance(query[None, :], centers, metric)[0]
    return np.argsort(d, kind="stable")
