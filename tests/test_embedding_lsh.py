"""Hyperplane LSH over embeddings: planner math, determinism, pair
recall vs the exact crossJoin oracle at both a gate-style low threshold
and a production-style high threshold with planted near-dups
(reference recall-vs-bruteforce pattern, puffinn.rs:178-225)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from clann_spark.operators.embedding_lsh import embedding_buckets, embedding_lsh_pairs
from clann_spark.planner import (
    hyperplane_candidate_probability,
    plan_hyperplane_banding,
)


def test_planner_meets_recall_and_is_monotone():
    for tau in (0.4, 0.7, 0.9):
        plan = plan_hyperplane_banding(tau, target_recall=0.999, max_bits=1024)
        assert plan.recall_at_tau >= 0.999
        assert plan.num_perm <= 1024
        # sharper threshold -> per-band agreement rises
        assert hyperplane_candidate_probability(tau + 0.05, plan.bands, plan.rows_per_band) >= plan.recall_at_tau - 1e-12


def _planted(spark, n=200, dim=32, n_dups=25, seed=7):
    """Random unit-ish vectors + planted near-dups at cos ~0.95-0.99."""
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n, dim))
    rows = [(i, base[i].tolist()) for i in range(n)]
    for j in range(n_dups):
        noisy = base[j] + 0.15 * rng.standard_normal(dim)
        rows.append((n + j, noisy.tolist()))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _exact_pairs(df, tau):
    rows = df.collect()
    ids = [r["vec_id"] for r in rows]
    x = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    sims = xn @ xn.T
    out = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if sims[i, j] >= tau:
                out.add((min(ids[i], ids[j]), max(ids[i], ids[j])))
    return out


def test_high_threshold_planted_dups_full_recall(spark):
    emb = _planted(spark)
    tau = 0.9
    plan = plan_hyperplane_banding(tau, target_recall=0.9999, max_bits=1024)
    got = {
        (r["a"], r["b"])
        for r in embedding_lsh_pairs(
            emb, tau, plan.bands, plan.rows_per_band
        ).collect()
    }
    want = _exact_pairs(emb, tau)
    assert len(want) >= 20  # the plant is real
    missed = want - got
    assert len(missed) <= max(1, int(0.01 * len(want))), missed  # >=0.99 recall
    assert not (got - want)  # exact verification => precision 1.0


def test_low_threshold_matches_fixture_oracle(spark, embeddings):
    emb = embeddings.where("vec_id % 5 = 0")
    plan = plan_hyperplane_banding(0.4, target_recall=0.99999, max_bits=256)
    got = {
        (r["a"], r["b"])
        for r in embedding_lsh_pairs(emb, 0.4, plan.bands, plan.rows_per_band).collect()
    }
    assert got == _exact_pairs(emb, 0.4)


def test_mixed_dim_column_hashes_each_dim_consistently(spark):
    """ADVICE r4: dims split across tasks must not hash in unrelated
    spaces. The plane draw is keyed by (seed, dim) inside the UDF, so a
    mixed-dim column — dims interleaved across many partitions — finds
    every same-dim pair; cross-dim rows (no defined cosine) never pair."""
    tau = 0.9
    a = _planted(spark, n=120, dim=16, n_dups=15, seed=3)
    b = _planted(spark, n=120, dim=48, n_dups=15, seed=4).select(
        (F.col("vec_id") + 10_000).alias("vec_id"), "embedding"
    )
    mixed = a.unionByName(b).repartition(16)  # dims interleave across tasks
    plan = plan_hyperplane_banding(tau, target_recall=0.9999, max_bits=1024)
    got = {
        (r["a"], r["b"])
        for r in embedding_lsh_pairs(
            mixed, tau, plan.bands, plan.rows_per_band
        ).collect()
    }
    want = _exact_pairs(a, tau) | _exact_pairs(b, tau)
    assert len(want) >= 20
    missed = want - got
    assert len(missed) <= max(1, int(0.01 * len(want))), missed
    assert not (got - want)
    # and the single-dim draw is unchanged by other dims having been
    # seen first (pure function of (seed, dim), not of arrival order)
    alone = {
        (r["a"], r["b"])
        for r in embedding_lsh_pairs(a, tau, plan.bands, plan.rows_per_band).collect()
    }
    assert alone == {p for p in got if p[0] < 10_000 and p[1] < 10_000}


def test_mixed_dim_fast_verify_matches_fold(spark):
    """verify_impl='fast' must survive mixed-dim corpora: same-dim
    pairs of several dims land in one Arrow batch, which the old bare
    np.vstack crashed on. The grouped-by-dim cosine returns exactly the
    fold path's pair set; dim-mismatched candidates (possible only via
    hash-family quirks) score NaN and are filtered, never crash."""
    tau = 0.9
    a = _planted(spark, n=80, dim=16, n_dups=10, seed=5)
    b = _planted(spark, n=80, dim=48, n_dups=10, seed=6).select(
        (F.col("vec_id") + 10_000).alias("vec_id"), "embedding"
    )
    mixed = a.unionByName(b).repartition(8)
    plan = plan_hyperplane_banding(tau, target_recall=0.9999, max_bits=1024)
    kw = dict(tau=tau, bands=plan.bands, rows_per_band=plan.rows_per_band)
    fold = {(r["a"], r["b"]) for r in embedding_lsh_pairs(mixed, **kw).collect()}
    fast = {
        (r["a"], r["b"])
        for r in embedding_lsh_pairs(mixed, verify_impl="fast", **kw).collect()
    }
    assert fast == fold and len(fold) >= 10


def test_wide_rows_per_band_config_still_works(spark):
    """rows_per_band in (48, 63) was valid before the dim tag landed
    and must stay valid: the dim is splitmix-XOR-mixed instead of
    disjointly tagged. Same-dim recall on planted dups is unaffected."""
    from clann_spark.operators.embedding_lsh import hyperplane_bands_udf

    with pytest.raises(ValueError):
        hyperplane_bands_udf(bands=2, rows_per_band=63)
    # exact duplicates: cos = 1 collides in every band at ANY r, so
    # recall is deterministic even at r = 50 where near-dups wouldn't be
    rng = np.random.default_rng(7)
    base = rng.standard_normal((40, 16))
    rows = [(i, base[i].tolist()) for i in range(40)]
    rows += [(100 + j, base[j].tolist()) for j in range(8)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r["a"], r["b"])
        for r in embedding_lsh_pairs(df, 0.999, bands=4, rows_per_band=50).collect()
    }
    want = _exact_pairs(df, 0.999)
    assert len(want) >= 8 and got == want


def test_identical_vector_skew_is_salted(spark):
    """Degenerate corpus: many identical embeddings form one mega
    bucket in every band; the shared candidate machinery salts it
    (bucket_cap) so no task sees the full clique, and the true
    Hamming-0 connectivity survives via CC transitivity semantics —
    here we assert the salted pair count stays far below the full
    clique while every doc appears in at least one pair."""
    from clann_spark.config import DedupConfig
    from clann_spark.operators.candidates import candidate_pairs
    from clann_spark.operators.embedding_lsh import embedding_buckets

    n = 600
    rows = [(i, [1.0, 2.0, -1.0, 0.5] * 8) for i in range(n)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cfg = DedupConfig(signature_impl="fast", bucket_cap=50)
    buckets = embedding_buckets(emb, bands=8, rows_per_band=4)
    pairs = candidate_pairs(buckets, cfg, mode="auto", anchor_threshold=32)
    got = pairs.collect()
    assert len(got) < n * (n - 1) // 4  # nowhere near the full clique
    touched = {r["a"] for r in got} | {r["b"] for r in got}
    assert len(touched) == n  # every doc reachable for CC


def test_bands_deterministic(spark, embeddings):
    emb = embeddings.limit(40)
    a = {(r["doc_id"], r["band_id"]): r["band_hash"]
         for r in embedding_buckets(emb, 8, 4).collect()}
    b = {(r["doc_id"], r["band_id"]): r["band_hash"]
         for r in embedding_buckets(emb, 8, 4).collect()}
    assert a == b and len(a) == 40 * 8
