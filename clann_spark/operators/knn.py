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


def _topk(scored: DataFrame, k: int) -> DataFrame:
    """Deterministic top-k per query: cos desc, id asc tie-break
    (ref maxbuffer.hpp:28-31 breaks ties by id)."""
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", F.col("rank").cast("long").alias("rank"))
    )


def knn_bruteforce(queries: DataFrame, corpus: DataFrame, k: int = 10) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query table against the
    corpus — the J5/J4 brute-force oracle (collection.hpp:506-521)."""
    q = queries.selectExpr("vec_id AS query_id", "embedding AS va")
    c = corpus.selectExpr("vec_id AS neighbor_id", "embedding AS vb")
    scored = (
        c.join(F.broadcast(q))
        .where("query_id != neighbor_id")
        .selectExpr("query_id", "neighbor_id", f"{COS_SQL} AS cos")
    )
    return _topk(scored, k)


def knn_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    centers: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """IVF ANN: corpus pre-partitioned by nearest Gonzalez center;
    each query probes its nprobe nearest partitions only.

    This is clann's cluster-then-probe re-expressed as partition
    pruning: the per-query cluster ordering (index.rs:592-616) becomes
    a broadcastable (query_id, partition_id) probe list, and the scan
    is a partition-pruned join instead of a triangle-inequality loop —
    statically provisioned recall instead of adaptive early exit
    (SURVEY.md §4 optimizer table).
    """
    assigned = assign_partitions(corpus, centers, "embedding").select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("vb"),
        "partition_id",
    )
    q_rows = queries.select("vec_id", "embedding").collect()
    probe = [
        (int(r["vec_id"]), int(pid))
        for r in q_rows
        for pid in sort_clusters_for_query(
            centers, np.array(list(r["embedding"]), dtype=np.float64)
        )[:nprobe]
    ]
    spark = queries.sparkSession
    probe_df = spark.createDataFrame(probe, "query_id long, partition_id int")
    q = queries.selectExpr("vec_id AS query_id", "embedding AS va")
    scored = (
        assigned.join(F.broadcast(probe_df), "partition_id")
        .join(F.broadcast(q), "query_id")
        .where("query_id != neighbor_id")
        .selectExpr("query_id", "neighbor_id", f"{COS_SQL} AS cos")
    )
    return _topk(scored, k)


def lsh_text_query(
    queries: DataFrame,
    corpus_sigs: DataFrame,
    corpus_docs: DataFrame,
    cfg: DedupConfig,
    k: int = 10,
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

    q_sigs = compute_signatures(queries, cfg, include_shingles=False)
    q_buckets = explode_bands(q_sigs, cfg).withColumnRenamed("doc_id", "query_id")
    c_buckets = explode_bands(corpus_sigs, cfg)

    cand = (
        c_buckets.join(F.broadcast(q_buckets), ["band_id", "band_hash"])
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
    return (
        verified.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("a").alias("query_id"),
            F.col("b").alias("doc_id"),
            "jaccard",
            F.col("rank").cast("long").alias("rank"),
        )
    )
