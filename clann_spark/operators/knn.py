"""Similarity search: exact brute-force k-NN, IVF-partitioned ANN over
embeddings, and the LSH query mode for incremental text dedup.

Reference lifecycle being re-expressed (SURVEY.md §3.2):
  search = sort clusters by center distance (index.rs:592-616), probe
  nearest clusters with triangle-inequality pruning (index.rs:342-361),
  per-cluster LSH probe (collection.hpp:543-601), exact re-score into a
  top-k heap (heap.rs:10-49).

Batch Spark analog: queries is a (small) table; candidates come from a
partition-pruned join; top-k is a window row_number — Spark's
TakeOrderedAndProject replaces the heap, partial/final agg replaces the
thread-buffer merges (A1-A3).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clann_spark.config import DedupConfig
from clann_spark.operators.clustering import assign_partitions, sort_clusters_for_query

COS_SQL = (
    "aggregate(zip_with(va, vb, (x, y) -> cast(x as double) * cast(y as double)), 0D,"
    " (acc, v) -> acc + v) / "
    "(sqrt(aggregate(va, 0D, (acc, x) -> acc + cast(x as double) * cast(x as double))) * "
    "sqrt(aggregate(vb, 0D, (acc, x) -> acc + cast(x as double) * cast(x as double))))"
)

#: Euclidean distance fold (ref euclideandata.rs:24-45, minus the
#: norm-precompute rearrangement — the fold shape matches the DuckDB
#: oracle exactly)
L2_SQL = (
    "sqrt(aggregate(zip_with(va, vb, (x, y) -> "
    "(cast(x as double) - cast(y as double)) * (cast(x as double) - cast(y as double))), "
    "0D, (acc, v) -> acc + v))"
)

#: metric -> (score SQL, output column, better = descending?)
_METRICS = {
    "cosine": (COS_SQL, "cos", True),
    "euclidean": (L2_SQL, "dist", False),
}


def _topk(scored: DataFrame, k: int, metric: str = "cosine") -> DataFrame:
    """Deterministic top-k per query: best score first (cos desc / dist
    asc), id asc tie-break (ref maxbuffer.hpp:28-31 breaks ties by id)."""
    _, col, desc = _METRICS[metric]
    order = F.desc(col) if desc else F.asc(col)
    w = Window.partitionBy("query_id").orderBy(order, F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", col, F.col("rank").cast("long").alias("rank"))
    )


def knn_bruteforce(
    queries: DataFrame, corpus: DataFrame, k: int = 10, metric: str = "cosine"
) -> DataFrame:
    """Exact top-k (cosine or euclidean): broadcast the (small) query
    table against the corpus — the J5/J4 brute-force oracle
    (collection.hpp:506-521)."""
    expr, col, _ = _METRICS[metric]
    q = queries.selectExpr("vec_id AS query_id", "embedding AS va")
    c = corpus.selectExpr("vec_id AS neighbor_id", "embedding AS vb")
    scored = (
        c.join(F.broadcast(q))
        .where("query_id != neighbor_id")
        .selectExpr("query_id", "neighbor_id", f"{expr} AS {col}")
    )
    return _topk(scored, k, metric)


def _probe_udf(centers: np.ndarray, nprobe: int, forced: np.ndarray, acc=None, metric: str = "cosine"):
    """embedding -> array<int> of the nprobe nearest partition ids plus
    every forced (brute-force-routed) partition. Vectorized per Arrow
    batch — the distributed replacement for the round-1 driver-side
    collect-and-loop (the reference's per-query cluster sort,
    index.rs:592-616, now computed where the queries live)."""
    from pyspark.sql.types import ArrayType, IntegerType

    from clann_spark.operators.clustering import pairwise_distance

    c = centers.copy()
    forced_list = [int(x) for x in forced]

    @F.pandas_udf(ArrayType(IntegerType()))
    def _probe(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        x = np.array([list(v) for v in vecs], dtype=np.float64)
        d = pairwise_distance(x, c, metric)
        if acc is not None:  # A8 distance-computation counter
            acc.add(int(x.shape[0] * c.shape[0]))
        order = np.argsort(d, axis=1, kind="stable")[:, :nprobe]
        out = []
        for row in order:
            pids = [int(p) for p in row]
            pids += [p for p in forced_list if p not in set(pids)]
            out.append(pids)
        return pd.Series(out)

    return _probe


def _rescue_udf(
    centers: np.ndarray,
    radii: np.ndarray,
    eps: float = 1e-9,
    acc=None,
    metric: str = "cosine",
):
    """(embedding, kth_score, probed) -> array<int> of additional
    partitions that could still hold a top-k neighbor: the J6
    triangle-inequality test (src/core/index.rs:342-361).

    cosine: the test runs in CHORD space, where it is a valid metric
    bound for unit vectors (||q-x|| >= ||q-c|| - r; 1-cos itself
    violates the triangle inequality, chord = sqrt(2*(1-cos)) does
    not); kth_score is the kth-best cosine, sentinel < -1 rescues all.
    euclidean: L2 is a metric — the bound applies directly; kth_score
    is the kth-best distance, sentinel < 0 rescues all."""
    from pyspark.sql.types import ArrayType, IntegerType

    from clann_spark.operators.clustering import pairwise_distance

    c = centers.copy()
    if metric == "cosine":
        r_bound = np.sqrt(2.0 * np.maximum(radii, 0.0))
    else:
        r_bound = np.maximum(radii, 0.0)

    @F.pandas_udf(ArrayType(IntegerType()))
    def _rescue(vecs: pd.Series, kth: pd.Series, probed: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        x = np.array([list(v) for v in vecs], dtype=np.float64)
        d = pairwise_distance(x, c, metric)
        if acc is not None:
            acc.add(int(x.shape[0] * c.shape[0]))
        kth_arr = kth.to_numpy(dtype=np.float64)
        if metric == "cosine":
            d_bound = np.sqrt(2.0 * np.maximum(d, 0.0))
            kth_bound = np.sqrt(2.0 * np.maximum(1.0 - kth_arr, 0.0))
            need_all_arr = kth_arr < -1.0
        else:
            d_bound = d
            kth_bound = kth_arr
            need_all_arr = kth_arr < 0.0
        out = []
        for i in range(len(x)):
            need_all = need_all_arr[i]
            lower = d_bound[i] - r_bound
            seen = set(int(p) for p in probed.iloc[i])
            out.append(
                [
                    int(p)
                    for p in range(c.shape[0])
                    if p not in seen
                    and (need_all or lower[p] <= kth_bound[i] + eps)
                ]
            )
        return pd.Series(out)

    return _rescue


def knn_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    centers: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    rescue: bool = True,
    brute_force_below: int = 100,
    broadcast_limit: int = 4_000_000,
    counters=None,
    metric: str = "cosine",
    quantized: bool = False,
) -> DataFrame:
    """IVF k-NN: corpus pre-partitioned by nearest Gonzalez center; each
    query probes its nprobe nearest partitions, then a single RESCUE
    round re-probes any partition whose chord-space lower bound beats
    the round-1 kth distance — after which the result is EXACT (equal
    to brute force), with pruning deciding cost, not correctness.

    Reference lifecycle re-expressed (SURVEY.md §3.2):
      * per-query cluster ordering (index.rs:592-616) -> _probe_udf,
        computed distributedly (no driver collect of the query table);
      * brute-force small-cluster routing (C4, index.rs:204-205 /
        :364-378) -> partitions under brute_force_below points are
        unconditionally probed by every query (cheap scans; exempt
        from bound bookkeeping);
      * triangle-inequality early exit (J6, index.rs:342-361) ->
        _rescue_udf chord bound; batch Spark cannot exit adaptively,
        so the bound instead *extends* the probe set exactly where the
        exit condition would have kept searching. Two rounds replace
        the sequential loop; queries with enough round-1 neighbors
        rescue nothing.

    rescue=False gives the round-1 approximate answer (the fixed-nprobe
    recall/latency trade).

    counters: optional clann_spark.metrics.CounterSet — the probe and
    rescue UDFs add their center-distance computations to the
    'center_dist_computations' accumulator (A8, the per-query
    distance-computation counter of performance.hpp:72-80 summed at
    run granularity).

    quantized=True (cosine only) is the reference's int16 fixed-point
    storage in the hot path (unit_vector.hpp:40-51 + the integer dot of
    math.hpp): the partitioned corpus carries ONLY the int16 column
    (1/4 the bytes of array<double> through the probe join — the
    dominant shuffle), candidates score with the JVM integer dot, and
    survivors within the provable error band (|cos_q - cos| <=
    2^-15*(sqrt(d)+1)) are re-scored exactly from the float column —
    the result stays EXACT (equal to brute force when rescue=True).
    """
    expr, col, desc = _METRICS[metric]
    if quantized and metric != "cosine":
        raise ValueError("quantized scoring is fixed-point cosine only")
    sentinel = -2.0 if metric == "cosine" else -1.0
    spark = queries.sparkSession
    assigned_cols = [
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("vb"),
        "partition_id",
        "center_dist",
    ]
    if quantized:
        from clann_spark.functions.quantize import quantize_udf

        # the big (corpus) side of the scoring join carries int16 only
        assigned_cols[1] = quantize_udf()(F.col("embedding")).alias("vb_q")
    assigned = assign_partitions(corpus, centers, "embedding", metric=metric).select(
        *assigned_cols
    ).persist()
    stats = (
        assigned.groupBy("partition_id")
        .agg(F.count("*").alias("n_points"), F.max("center_dist").alias("radius"))
        .collect()
    )
    radii = np.zeros(centers.shape[0])
    forced = []
    for r in stats:
        radii[r["partition_id"]] = r["radius"]
        if r["n_points"] < brute_force_below:
            forced.append(r["partition_id"])
    assigned = assigned.drop("center_dist")

    n_q = queries.count()
    small_q = n_q * (nprobe + len(forced)) <= broadcast_limit

    acc = counters.acc("center_dist_computations") if counters is not None else None
    q = queries.selectExpr("vec_id AS query_id", "embedding AS va")
    if quantized:
        from clann_spark.functions.quantize import COS_I16_SQL, quantize_udf

        q = q.withColumn("va_q", quantize_udf()(F.col("va")))
        qscore_sql = COS_I16_SQL.replace("qa", "va_q").replace("qb", "vb_q")
        # |cos_q - cos| <= 2^-15*(sqrt(d)+1): round-off of both unit
        # operands through the integer dot; the shortlist keeps every
        # candidate within TWICE the bound of the kth quantized score,
        # which provably contains the exact top-k
        eps2 = 2.0 * (float(np.sqrt(centers.shape[1])) + 1.0) / 32768.0
        corpus_f = corpus.selectExpr("vec_id AS neighbor_id", "embedding AS vb")
    q = q.persist()
    probe1 = q.select(
        "query_id",
        "va",
        _probe_udf(centers, nprobe, np.array(forced), acc, metric=metric)(
            F.col("va")
        ).alias("pids"),
    ).persist()
    probe1_x = probe1.select("query_id", F.explode("pids").alias("partition_id"))

    def _score(probe_x: DataFrame) -> DataFrame:
        p = F.broadcast(probe_x) if small_q else probe_x
        cand = (
            assigned.join(p, "partition_id")
            .join(F.broadcast(q) if small_q else q, "query_id")
            .where("query_id != neighbor_id")
        )
        if not quantized:
            return cand.selectExpr("query_id", "neighbor_id", f"{expr} AS {col}")
        # integer-dot scoring on the slim join, then exact float
        # re-score of the provable shortlist only
        scored_q = cand.selectExpr("query_id", "neighbor_id", f"{qscore_sql} AS qscore")
        wq = Window.partitionBy("query_id").orderBy(
            F.desc("qscore"), F.asc("neighbor_id")
        )
        ranked = scored_q.withColumn("rk", F.row_number().over(wq))
        kth = ranked.where(F.col("rk") == k).select(
            "query_id", F.col("qscore").alias("kthq")
        )
        short = (
            ranked.join(kth, "query_id", "left")
            .where(
                (F.col("rk") <= k)
                | (F.col("qscore") >= F.col("kthq") - F.lit(eps2))
            )
            .select("query_id", "neighbor_id")
        )
        return (
            short.join(corpus_f, "neighbor_id")
            .join(F.broadcast(q) if small_q else q, "query_id")
            .selectExpr("query_id", "neighbor_id", f"{expr} AS {col}")
        )

    from clann_spark.metrics import attach_query_metrics
    from clann_spark.session import track_cache

    scored1 = _score(probe1_x)
    if not rescue:
        out = track_cache(_topk(scored1, k, metric), assigned, q, probe1)
        return attach_query_metrics(out, probe1, scored1, None)

    scored1 = scored1.persist()
    # round-1 kth-best score per query; queries with fewer than k
    # results get the sentinel (rescue everything unprobed)
    kth_agg = F.min(col) if desc else F.max(col)
    kth = (
        _topk(scored1, k, metric)
        .groupBy("query_id")
        .agg(F.count("*").alias("cnt"), kth_agg.alias("kth0"))
        .select(
            "query_id",
            F.when(F.col("cnt") >= k, F.col("kth0"))
            .otherwise(F.lit(sentinel))
            .alias("kth_score"),
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
            _rescue_udf(centers, radii, acc=acc, metric=metric)(
                F.col("va"), F.col("kth_score"), F.col("pids")
            ).alias("extra"),
        )
        .select("query_id", F.explode("extra").alias("partition_id"))
    )
    scored2 = _score(rescue_df)
    # register persisted intermediates for per-micro-batch callers
    # (session.unpersist_intermediates) — they'd leak over a stream
    out = track_cache(
        _topk(scored1.unionByName(scored2), k, metric), assigned, q, probe1, scored1
    )
    return attach_query_metrics(out, probe1, scored1, scored2)


def lsh_text_query(
    queries: DataFrame,
    corpus_sigs: DataFrame,
    corpus_docs: DataFrame,
    cfg: DedupConfig,
    k: int = 10,
    query_sigs: DataFrame | None = None,
) -> DataFrame:
    """Incremental dedup query mode (J2): hash the query docs with the
    SAME seeded signature config, join their band hashes against the
    corpus bucket table, exact-verify, window top-k.

    queries: (doc_id, text) new docs; corpus_sigs: (doc_id, bands);
    corpus_docs: (doc_id, text) for exact verification.
    Returns (query_id, doc_id, jaccard, rank).
    """
    from clann_spark.operators.signatures import compute_signatures, explode_bands
    from clann_spark.operators.verify import verify_pairs_from_text

    q_sigs = (
        query_sigs
        if query_sigs is not None
        else compute_signatures(
            queries, cfg, include_shingles=False, include_sig=False, drop_text=True
        )
    )
    q_buckets = explode_bands(q_sigs, cfg).withColumnRenamed("doc_id", "query_id")
    c_buckets = explode_bands(corpus_sigs, cfg)

    # size-gate the query-band broadcast: incremental batches are
    # usually tiny, but a backfill of millions of queries must degrade
    # to a shuffle join rather than OOM the executors
    q_buckets = q_buckets.persist()
    q_small = q_buckets.count() <= cfg.broadcast_limit
    cand = (
        c_buckets.join(
            F.broadcast(q_buckets) if q_small else q_buckets,
            ["band_id", "band_hash"],
        )
        .where("query_id != doc_id")
        .select("query_id", "doc_id")
        .dropDuplicates(["query_id", "doc_id"])
    )
    pairs = cand.select(F.col("query_id").alias("a"), F.col("doc_id").alias("b"))
    docs_union = corpus_docs.select("doc_id", "text").unionByName(
        queries.select("doc_id", "text")
    )
    verified = verify_pairs_from_text(pairs, docs_union, cfg, keep_below_tau=True)
    w = Window.partitionBy("a").orderBy(F.desc("jaccard"), F.asc("b"))
    from clann_spark.session import track_cache

    out = (
        verified.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("a").alias("query_id"),
            F.col("b").alias("doc_id"),
            "jaccard",
            F.col("rank").cast("long").alias("rank"),
        )
    )
    # q_buckets + the verify stage's pair cache: released per micro-batch
    # by streaming callers via session.unpersist_intermediates
    out = track_cache(out, q_buckets, verified)
    # per-query counters (search_metrics_query parity): band-join
    # candidates == exact Jaccard comparisons in this operator
    out._clann_query_metrics = cand.groupBy(F.col("query_id")).agg(
        F.count("*").alias("n_candidates"),
        F.count("*").alias("n_comparisons"),
    )
    return out
