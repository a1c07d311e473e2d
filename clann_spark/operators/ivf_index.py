"""Persisted IVF index: build-once / query-many over committed stage
tables — the reference's index (de)serialization lifecycle (S3/S4:
serialize -> src/core/index.rs:511-557 writes config JSON + per-cluster
blobs; init_from_file re-reads them, index.rs:107-162) re-expressed as
StageRunner-committed parquet tables plus a JSON sidecar of centers.

Layout under workdir:
  assigned/      (vec_id, embedding, partition_id)  — the "clusters"
  stats/         (partition_id, n_points, radius)   — radii + routing
  _lineage/      per-stage commit rows (fingerprint, files, counters)
  centers.json   (k, d) center matrix + metric + config fingerprint

Queries against a loaded index skip partition assignment entirely —
the analog of searching a deserialized index without rebuilding it.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clann_spark.config import DedupConfig
from clann_spark.operators.clustering import (
    assign_partitions,
    fit_partitioner,
)
from clann_spark.sources.stages import StageRunner


@dataclass
class IvfIndex:
    assigned: DataFrame     # vec_id, embedding, partition_id [, embedding_q]
    centers: np.ndarray     # (k, d)
    radii: np.ndarray       # (k,)
    forced: list[int]       # brute-force-routed partitions (C4)
    metric: str
    has_quantized: bool = False  # int16 embedding_q persisted alongside


def build_ivf_index(
    spark: SparkSession,
    emb: DataFrame,
    workdir: str,
    k: int | None = None,
    metric: str = "cosine",
    brute_force_below: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantized: bool = False,
) -> IvfIndex:
    """Partition the corpus and COMMIT the index as stage tables;
    re-running with the same input/config resumes from the checkpoint
    (the insert+rebuild+serialize build of SURVEY §3.1).

    quantized=True additionally persists the int16 fixed-point column
    embedding_q in the assigned table — the reference's on-disk dataset
    IS int16 (unit_vector.hpp:40-51 stored per cluster blob,
    index.rs:511-557); queries against such an index can score the
    slim integer column and stay exact (knn.py _make_score_fn)."""
    cfg = DedupConfig()  # banding fields unused; carries seed into lineage
    runner = StageRunner(
        spark, workdir, cfg,
        input_fingerprint=f"semhash:{emb.semanticHash()}|{metric}|{k}|q={int(quantized)}",
    )

    centers_path = os.path.join(workdir, "centers.json")
    # The sidecar carries the same input/config fingerprint as the
    # stage lineage: a different corpus, k, or metric in the same
    # workdir REFITS instead of silently reusing stale centers
    # (round-2 ADVICE; mirrors index.rs:511-557 writing config JSON
    # alongside the cluster blobs).
    want_fp = {
        "config_fingerprint": runner.fingerprint,
        "input_fingerprint": runner.input_fingerprint,
        "k": k,
        "metric": metric,
    }
    centers = None
    if os.path.exists(centers_path):
        with open(centers_path) as f:
            meta = json.load(f)
        if {kk: meta.get(kk) for kk in want_fp} == want_fp:
            centers = np.array(meta["centers"], dtype=np.float64)
    if centers is None:
        centers = fit_partitioner(emb, vec_col, id_col=id_col, k=k, metric=metric)
        tmp = centers_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"centers": centers.tolist(), **want_fp}, f)
        os.replace(tmp, centers_path)

    def _assigned():
        cols = [
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("embedding"),
            "partition_id",
            "center_dist",
        ]
        if quantized:
            from clann_spark.functions.quantize import quantize_udf

            cols.append(quantize_udf()(F.col(vec_col)).alias("embedding_q"))
        return assign_partitions(emb, centers, vec_col, metric=metric).select(*cols)

    assigned = runner.stage("assigned", _assigned)
    stats = runner.stage(
        "stats",
        lambda: assigned.groupBy("partition_id").agg(
            F.count("*").alias("n_points"), F.max("center_dist").alias("radius")
        ),
        deps=["assigned"],
    )
    return _index_from_tables(assigned, stats, centers, metric, brute_force_below)


def load_ivf_index(
    spark: SparkSession,
    workdir: str,
    brute_force_below: int = 100,
) -> IvfIndex:
    """Re-open a committed index (init_from_file analog): no
    recomputation, just the stage tables + centers sidecar."""
    with open(os.path.join(workdir, "centers.json")) as f:
        meta = json.load(f)
    assigned = spark.read.parquet(os.path.join(workdir, "assigned"))
    stats = spark.read.parquet(os.path.join(workdir, "stats"))
    return _index_from_tables(
        assigned,
        stats,
        np.array(meta["centers"], dtype=np.float64),
        meta["metric"],
        brute_force_below,
    )


def _index_from_tables(assigned, stats, centers, metric, brute_force_below) -> IvfIndex:
    rows = stats.collect()
    radii = np.zeros(centers.shape[0])
    forced = []
    for r in rows:
        radii[r["partition_id"]] = r["radius"]
        if r["n_points"] < brute_force_below:
            forced.append(int(r["partition_id"]))
    has_q = "embedding_q" in assigned.columns
    keep = ["vec_id", "embedding", "partition_id"] + (["embedding_q"] if has_q else [])
    return IvfIndex(
        assigned=assigned.select(*keep),
        centers=centers,
        radii=radii,
        forced=forced,
        metric=metric,
        has_quantized=has_q,
    )


def knn_ivf_index(
    queries: DataFrame,
    index: IvfIndex,
    k: int = 10,
    nprobe: int = 4,
    rescue: bool = True,
    broadcast_limit: int = 4_000_000,
    counters=None,
    quantized: bool = False,
    probe_salts: int = 8,
) -> DataFrame:
    """Query a built/loaded index: identical semantics to knn_ivf (probe
    UDF + C4 routing + J6 rescue -> exact when rescue=True) but the
    corpus partitioning comes from the committed table — searching a
    deserialized index, never rebuilding it.

    quantized=True requires an index built with quantized=True: the
    probe join ships the PERSISTED int16 embedding_q column (1/4 the
    bytes of array<double> — the dominant shuffle at scale), scores
    with the JVM integer dot, and exact-rescores only the provable
    shortlist. Results remain exact (equal to brute force)."""
    from clann_spark.operators.knn import (
        _METRICS,
        _make_score_fn,
        _probe_udf,
        _rescue_udf,
        _topk,
        quantized_cos_epsilon,
    )

    expr, col, desc = _METRICS[index.metric]
    if quantized and index.metric != "cosine":
        raise ValueError("quantized scoring is fixed-point cosine only")
    if quantized and not index.has_quantized:
        raise ValueError(
            "index was built without quantized=True (no embedding_q column)"
        )
    sentinel = -2.0 if index.metric == "cosine" else -1.0
    assigned_cols = [
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("vb"),
        "partition_id",
    ]
    corpus_f = eps2 = None
    if quantized:
        assigned_cols[1] = F.col("embedding_q").alias("vb_q")
        corpus_f = index.assigned.selectExpr("vec_id AS neighbor_id", "embedding AS vb")
        eps2 = quantized_cos_epsilon(index.centers.shape[1])
    assigned = index.assigned.select(*assigned_cols)
    acc = counters.acc("center_dist_computations") if counters is not None else None

    n_q = queries.count()
    small_q = n_q * (nprobe + len(index.forced)) <= broadcast_limit
    q = queries.selectExpr("vec_id AS query_id", "embedding AS va")
    if quantized:
        from clann_spark.functions.quantize import quantize_udf

        q = q.withColumn("va_q", quantize_udf()(F.col("va")))
    q = q.persist()
    probe1 = q.select(
        "query_id",
        "va",
        _probe_udf(index.centers, nprobe, np.array(index.forced), acc, metric=index.metric)(
            F.col("va")
        ).alias("pids"),
    ).persist()
    probe1_x = probe1.select("query_id", F.explode("pids").alias("partition_id"))

    _score = _make_score_fn(
        assigned, q, small_q, index.metric, k=k,
        quantized=quantized, corpus_f=corpus_f, eps2=eps2, probe_salts=probe_salts,
    )

    from clann_spark.metrics import attach_cluster_metrics, attach_query_metrics
    from clann_spark.session import track_cache

    scored1 = _score(probe1_x)
    if not rescue:
        out = track_cache(_topk(scored1, k, index.metric), q, probe1)
        out = attach_cluster_metrics(out, probe1_x, None, assigned)
        return attach_query_metrics(out, probe1, scored1, None)

    scored1 = scored1.persist()
    kth_agg = F.min(col) if desc else F.max(col)
    kth = (
        _topk(scored1, k, index.metric)
        .groupBy("query_id")
        .agg(F.count("*").alias("cnt"), kth_agg.alias("kth0"))
        .select(
            "query_id",
            F.when(F.col("cnt") >= k, F.col("kth0")).otherwise(F.lit(sentinel)).alias("kth_score"),
        )
    )
    rescue_df = (
        probe1.join(kth, "query_id", "left")
        .select(
            "query_id",
            "va",
            F.coalesce("kth_score", F.lit(sentinel)).alias("kth_score"),
            "pids",
        )
        .select(
            "query_id",
            _rescue_udf(index.centers, index.radii, acc=acc, metric=index.metric)(
                F.col("va"), F.col("kth_score"), F.col("pids")
            ).alias("extra"),
        )
        .select("query_id", F.explode("extra").alias("partition_id"))
    )
    scored2 = _score(rescue_df)
    out = track_cache(
        _topk(scored1.unionByName(scored2), k, index.metric),
        q,
        probe1,
        scored1,
    )
    out = attach_cluster_metrics(out, probe1_x, rescue_df, assigned)
    return attach_query_metrics(out, probe1, scored1, scored2)
