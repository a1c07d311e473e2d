"""k-NN / ANN: exact top-k vs numpy oracle; IVF recall vs exact
(reference recall-vs-bruteforce pattern, puffinn.rs:178-225); LSH text
query mode finds planted near-dups."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from clann_spark.config import DedupConfig
from clann_spark.operators.clustering import fit_partitioner
from clann_spark.operators.knn import knn_bruteforce, knn_ivf, lsh_text_query
from clann_spark.operators.signatures import compute_signatures


@pytest.fixture(scope="module")
def emb_small(spark, embeddings):
    return embeddings.cache()


def _numpy_topk(rows, k):
    ids = np.array([r["vec_id"] for r in rows])
    x = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    sims = xn @ xn.T
    out = {}
    for qi, qid in enumerate(ids):
        if qid % 50 != 0:
            continue
        order = sorted(
            [(float(-sims[qi, j]), int(ids[j])) for j in range(len(ids)) if j != qi]
        )[:k]
        out[int(qid)] = [nid for _, nid in order]
    return out


def test_bruteforce_matches_numpy(spark, emb_small):
    queries = emb_small.where("vec_id % 50 = 0")
    got_rows = knn_bruteforce(queries, emb_small, k=5).collect()
    got = {}
    for r in sorted(got_rows, key=lambda r: (r["query_id"], r["rank"])):
        got.setdefault(r["query_id"], []).append(r["neighbor_id"])
    want = _numpy_topk(emb_small.collect(), 5)
    assert got == want


def test_ivf_with_rescue_is_exact(spark, emb_small):
    """The chord-bound rescue round (J6 triangle-inequality analog)
    makes IVF equal to brute force — ranks and all — regardless of
    nprobe or brute-force routing threshold."""
    queries = emb_small.where("vec_id % 50 = 0")
    exact = {
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in knn_bruteforce(queries, emb_small, k=5).collect()
    }
    centers = fit_partitioner(emb_small, "embedding", id_col="vec_id", k=8)
    got = {
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in knn_ivf(
            queries, emb_small, centers, k=5, nprobe=2, brute_force_below=16
        ).collect()
    }
    assert got == exact


def test_ivf_no_rescue_recall(spark, emb_small):
    queries = emb_small.where("vec_id % 50 = 0")
    exact = knn_bruteforce(queries, emb_small, k=5).collect()
    centers = fit_partitioner(emb_small, "embedding", id_col="vec_id", k=8)
    approx = knn_ivf(
        queries, emb_small, centers, k=5, nprobe=4, rescue=False
    ).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # nprobe=4 of 8 partitions: the reference accepts 0.8*delta recall
    # in its statistical tests (puffinn.rs:189-223); we require 0.6 for
    # a half-probe config on random vectors
    assert recall >= 0.6, recall


def test_euclidean_bruteforce_and_ivf_exact(spark, emb_small):
    """P3 in query mode: L2 brute force matches numpy; L2 IVF with the
    direct triangle-inequality rescue equals brute force."""
    rows = emb_small.collect()
    ids = np.array([r["vec_id"] for r in rows])
    x = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    want = {}
    for qi, qid in enumerate(ids):
        if qid % 50 != 0:
            continue
        d = np.sqrt(((x - x[qi]) ** 2).sum(axis=1))
        order = sorted(
            (float(d[j]), int(ids[j])) for j in range(len(ids)) if j != qi
        )[:5]
        want[int(qid)] = [nid for _, nid in order]

    queries = emb_small.where("vec_id % 50 = 0")
    bf_rows = knn_bruteforce(queries, emb_small, k=5, metric="euclidean").collect()
    got = {}
    for r in sorted(bf_rows, key=lambda r: (r["query_id"], r["rank"])):
        got.setdefault(r["query_id"], []).append(r["neighbor_id"])
    assert got == want

    centers = fit_partitioner(
        emb_small, "embedding", id_col="vec_id", k=8, metric="euclidean"
    )
    ivf = {
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in knn_ivf(
            queries, emb_small, centers, k=5, nprobe=2,
            brute_force_below=16, metric="euclidean",
        ).collect()
    }
    bf = {(r["query_id"], r["rank"], r["neighbor_id"]) for r in bf_rows}
    assert ivf == bf


def test_lsh_text_query_finds_near_dups(spark):
    cfg = DedupConfig()
    corpus = spark.createDataFrame(
        [(i, f"the quick brown fox jumps over lazy dog number {i} " * 8) for i in range(50)],
        "doc_id long, text string",
    )
    sigs = compute_signatures(corpus, cfg, include_shingles=False).select("doc_id", "bands")
    # queries: near-clone of doc 7 and one unrelated doc
    queries = spark.createDataFrame(
        [
            (1007, "the quick brown fox jumps over lazy dog number 7 " * 8),
            (9999, "completely unrelated query text with nothing shared at all"),
        ],
        "doc_id long, text string",
    )
    got = lsh_text_query(queries, sigs, corpus, cfg, k=3).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["doc_id"], r["jaccard"], r["rank"]))
    assert by_q[1007][0][0] == 7 and by_q[1007][0][1] > 0.9
    assert 9999 not in by_q  # no bucket collision for unrelated text


def test_per_query_metrics_on_ivf_and_lsh(spark, emb_small, tmp_path_factory):
    """A7/S5 per-query counters (search_metrics_query parity,
    result_schema.sql:32-75): one row per query with candidate /
    comparison / rescue counts, persistable as a StageRunner stage."""
    from clann_spark.metrics import query_metrics

    queries = emb_small.where("vec_id % 50 = 0")
    centers = fit_partitioner(emb_small, "embedding", id_col="vec_id", k=8)
    res = knn_ivf(queries, emb_small, centers, k=5, nprobe=2, brute_force_below=16)
    res.count()  # the search itself
    qm = query_metrics(res)
    assert qm is not None
    rows = {r["query_id"]: r for r in qm.collect()}
    assert set(rows) == {r["vec_id"] for r in queries.select("vec_id").collect()}
    for r in rows.values():
        assert r["n_probes"] >= 2
        assert r["n_candidates"] > 0
        assert r["n_comparisons"] == r["n_candidates"] + r["n_rescued"]

    # persists through the StageRunner like any stage table
    from clann_spark.sources.stages import StageRunner

    wd = str(tmp_path_factory.mktemp("qm_stage"))
    runner = StageRunner(spark, wd, DedupConfig(), input_fingerprint="qm-test")
    committed = runner.stage("query_metrics", lambda: qm)
    assert committed.count() == len(rows)

    # LSH text-query mode emits per-query counters too
    docs = spark.createDataFrame(
        [(i, f"shared boilerplate words {i % 3} " * 10) for i in range(30)],
        "doc_id long, text string",
    )
    cfg = DedupConfig(signature_impl="fast", hamming_prefilter=None)
    sigs = compute_signatures(docs, cfg, include_shingles=False).select("doc_id", "bands")
    q = spark.createDataFrame(
        [(100, "shared boilerplate words 0 " * 10)], "doc_id long, text string"
    )
    out = lsh_text_query(q, sigs, docs, cfg, k=3)
    out.count()
    lqm = query_metrics(out).collect()
    assert len(lqm) == 1 and lqm[0]["n_candidates"] >= 1


def test_ivf_quantized_is_exact(spark, emb_small):
    """P5/P6 consumed in the hot path: int16 fixed-point scoring join +
    exact float re-score of the provable shortlist must still equal
    brute force (the rescue/error band absorbs the <=2^-15*(sqrt(d)+1)
    quantization error)."""
    queries = emb_small.where("vec_id % 50 = 0")
    exact = {
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in knn_bruteforce(queries, emb_small, k=5).collect()
    }
    centers = fit_partitioner(emb_small, "embedding", id_col="vec_id", k=8)
    got = {
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in knn_ivf(
            queries, emb_small, centers, k=5, nprobe=2,
            brute_force_below=16, quantized=True,
        ).collect()
    }
    assert got == exact


def test_probe_rescue_batch_cores_match_naive():
    """The vectorized probe/rescue cores (round-3 VERDICT item 3) equal
    a straightforward per-row loop on random input — and run the
    10^5 x 10^3 shape in array time, not interpreted time."""
    import time

    import numpy as np

    from clann_spark.operators.clustering import pairwise_distance
    from clann_spark.operators.knn import _probe_batch, _rescue_batch

    rng = np.random.default_rng(7)
    n, k_centers, d, nprobe = 300, 40, 16, 4
    x = rng.normal(size=(n, d))
    c = rng.normal(size=(k_centers, d))
    forced = np.array([3, 17, 25], dtype=np.int64)

    got = _probe_batch(x, c, nprobe, forced, "cosine")
    dist = pairwise_distance(x, c, "cosine")
    for i in range(n):
        order = np.argsort(dist[i], kind="stable")[:nprobe]
        want = [int(p) for p in order]
        want += [int(p) for p in forced if p not in set(want)]
        assert got[i] == want, i

    radii = np.abs(rng.normal(size=k_centers)) * 0.3
    r_bound = np.sqrt(2.0 * np.maximum(radii, 0.0))
    kth = rng.uniform(-1.5, 1.0, size=n)  # some sentinels (< -1) too
    probed = [list(map(int, rng.choice(k_centers, size=5, replace=False))) for _ in range(n)]
    got_r = _rescue_batch(x, c, r_bound, kth, probed, "cosine", 1e-9)
    d_bound = np.sqrt(2.0 * np.maximum(dist, 0.0))
    kth_bound = np.sqrt(2.0 * np.maximum(1.0 - kth, 0.0))
    for i in range(n):
        seen = set(probed[i])
        want = [
            p
            for p in range(k_centers)
            if p not in seen
            and (kth[i] < -1.0 or d_bound[i][p] - r_bound[p] <= kth_bound[i] + 1e-9)
        ]
        assert got_r[i] == want, i

    # scale guard: 1e5 queries x 1e3 centers must complete in array time
    # (the old per-row set/loop path took minutes at this shape)
    xb = rng.normal(size=(100_000, 8))
    cb = rng.normal(size=(1_000, 8))
    t0 = time.monotonic()
    _probe_batch(xb, cb, nprobe, forced, "cosine")
    _rescue_batch(
        xb,
        cb,
        np.full(1_000, 0.05),
        rng.uniform(0.5, 1.0, size=100_000),
        [[] for _ in range(100_000)],
        "cosine",
        1e-9,
    )
    # generous bound: ~17 s idle, but this host's wall clocks swing 2-3x
    # under load (BASELINE.md); the interpreted path this guards against
    # took >10 min at this shape, so 240 s still discriminates
    assert time.monotonic() - t0 < 240.0


def test_lsh_query_true_comparison_counts_with_prefilter(spark):
    """round-3 VERDICT item 4: n_comparisons counts the exact Jaccard
    evaluations actually run, NOT the band-join candidates — with the
    J7 simhash prefilter enabled the two diverge, and the run-level
    Observation totals agree with the per-query sum."""
    from clann_spark.metrics import query_metrics, verify_observation

    base = " ".join(f"tok{i}" for i in range(200))
    docs = spark.createDataFrame(
        [(0, base), (1, base)], "doc_id long, text string"
    )
    # query shares nearly all shingles with the corpus (band collision)
    # but a changed word flips simhash bits -> Hamming > 0
    q = spark.createDataFrame(
        [(100, base.replace("tok100", "OMEGA"))], "doc_id long, text string"
    )
    cfg = DedupConfig(signature_impl="fast", hamming_prefilter=0)
    sigs = compute_signatures(docs, cfg, include_shingles=False, drop_text=True).select(
        "doc_id", "bands", "simhash"
    )
    out = lsh_text_query(q, sigs, docs, cfg, k=3)
    n_out = out.count()
    qm = query_metrics(out).collect()
    assert len(qm) == 1
    r = qm[0]
    assert r["n_candidates"] >= 1  # band join found the near-identical docs
    assert r["n_comparisons"] == 0  # Hamming-0 prefilter dropped them all
    assert n_out == 0
    obs = verify_observation(out)
    assert obs.get["comparisons"] == 0

    # prefilter off: every candidate is verified, counts coincide
    cfg_off = DedupConfig(signature_impl="fast", hamming_prefilter=None)
    sigs_off = compute_signatures(
        docs, cfg_off, include_shingles=False, drop_text=True
    ).select("doc_id", "bands", "simhash")
    out2 = lsh_text_query(q, sigs_off, docs, cfg_off, k=3)
    out2.count()
    r2 = query_metrics(out2).collect()[0]
    assert r2["n_comparisons"] == r2["n_candidates"] >= 1
    assert verify_observation(out2).get["comparisons"] == r2["n_comparisons"]


def test_per_cluster_metrics_on_ivf(spark, emb_small, tmp_path_factory):
    """round-3 VERDICT item 7: per-CLUSTER search metrics
    (search_metrics_cluster parity, result_schema.sql:77+) — one row
    per partition with probe/rescue query counts and candidate rows,
    persistable beside the per-query rows."""
    from clann_spark.metrics import cluster_metrics, query_metrics

    queries = emb_small.where("vec_id % 50 = 0")
    centers = fit_partitioner(emb_small, "embedding", id_col="vec_id", k=8)
    res = knn_ivf(queries, emb_small, centers, k=5, nprobe=2, brute_force_below=16)
    res.count()
    cm = cluster_metrics(res)
    assert cm is not None
    rows = cm.collect()
    assert {r["partition_id"] for r in rows} == set(range(8))
    n_q = queries.count()
    total_probe = sum(r["n_queries_probe"] for r in rows)
    assert total_probe >= n_q * 2  # nprobe=2 + forced routing
    for r in rows:
        assert r["n_candidates"] == (
            (r["n_queries_probe"] + r["n_queries_rescue"]) * r["n_points"]
        )

    # cross-check against the per-query rows: candidate totals agree
    # (cluster side counts self-pairs the per-query side filters)
    qrows = query_metrics(res).collect()
    per_query_total = sum(r["n_candidates"] + r["n_rescued"] for r in qrows)
    cluster_total = sum(r["n_candidates"] for r in rows)
    self_pairs = total_probe  # at most one self-hit per (query, probe)
    assert per_query_total <= cluster_total <= per_query_total + self_pairs

    # persists through the StageRunner beside query_metrics
    from clann_spark.sources.stages import StageRunner

    wd = str(tmp_path_factory.mktemp("cm_stage"))
    runner = StageRunner(spark, wd, DedupConfig(), input_fingerprint="cm-test")
    committed = runner.stage("cluster_metrics", lambda: cm)
    assert committed.count() == 8


def test_probe_join_salting_bounds_hot_cell(spark):
    """round-3 VERDICT item 8: one hot IVF cell (80% of the corpus in a
    dense blob) with a non-broadcastable probe side. The salted
    shuffle join must (a) split the hot partition_id key into
    probe_salts balanced sub-groups — no reducer sees more than ~2x
    hot/probe_salts rows — and (b) leave the result exactly equal to
    brute force (each corpus row carries exactly one salt)."""
    import numpy as np

    rng = np.random.default_rng(11)
    hot = rng.normal(loc=5.0, scale=0.05, size=(400, 8))   # dense blob
    rest = rng.normal(scale=3.0, size=(100, 8))
    vecs = np.vstack([hot, rest])
    emb = spark.createDataFrame(
        [(i, [float(v) for v in vecs[i]]) for i in range(len(vecs))],
        "vec_id long, embedding array<double>",
    ).cache()
    queries = emb.where("vec_id % 25 = 0")
    centers = fit_partitioner(emb, "embedding", id_col="vec_id", k=6)

    # the skew is real: one partition holds >= 70% of the corpus
    from clann_spark.operators.clustering import assign_partitions

    assigned = assign_partitions(emb, centers, "embedding").cache()
    sizes = {r["partition_id"]: r["count"] for r in assigned.groupBy("partition_id").count().collect()}
    hot_pid, hot_n = max(sizes.items(), key=lambda kv: kv[1])
    assert hot_n >= 0.7 * len(vecs), sizes

    # salted sub-groups are balanced (the per-reducer bound)
    n_salts = 8
    salted = assigned.withColumn("_salt", F.pmod(F.hash("vec_id"), F.lit(n_salts)))
    grp = salted.groupBy("partition_id", "_salt").count()
    max_grp = grp.agg(F.max("count")).collect()[0][0]
    assert max_grp <= 2 * hot_n / n_salts + 1, (max_grp, hot_n)

    # broadcast_limit=0 forces the salted shuffle join; result is exact
    exact = {
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in knn_bruteforce(queries, emb, k=5).collect()
    }
    got = {
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in knn_ivf(
            queries, emb, centers, k=5, nprobe=2, brute_force_below=16,
            broadcast_limit=0, probe_salts=n_salts,
        ).collect()
    }
    assert got == exact

    # quantized shuffle path through the same salting: still exact
    got_q = {
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in knn_ivf(
            queries, emb, centers, k=5, nprobe=2, brute_force_below=16,
            broadcast_limit=0, probe_salts=n_salts, quantized=True,
        ).collect()
    }
    assert got_q == exact
