"""Cross-polytope LSH (H6/H7): FHT correctness, Monte-Carlo collision
curve sanity, planner integration, and planted-near-dup recall through
the shared candidate machinery."""

from __future__ import annotations

import numpy as np
import pytest

from clann_spark.functions.crosspolytope import (
    cp_codes,
    cp_collision_probability,
    cp_diagonals,
    cp_probability_at,
    cp_probability_table,
    fht_batch,
    next_pow2,
)
from clann_spark.planner import plan_cp_banding


def test_fht_involution_and_orthogonality():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((5, 64))
    # H H x = d x  (unnormalized Hadamard is d^(1/2)-orthogonal)
    assert np.allclose(fht_batch(fht_batch(x)), 64 * x)
    # energy preserved up to the d factor
    assert np.allclose(
        (fht_batch(x) ** 2).sum(axis=1), 64 * (x**2).sum(axis=1)
    )


def test_cp_codes_deterministic_and_ranged():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((40, 48))
    d = cp_diagonals(6, next_pow2(48), seed=9)
    c1, c2 = cp_codes(x, d), cp_codes(x, d)
    assert (c1 == c2).all()
    assert c1.min() >= 0 and c1.max() < 2 * next_pow2(48)
    # identical vectors collide with certainty
    assert (cp_codes(x * 3.0, d) == c1).all()  # scale-invariant (normalized)


def test_collision_curve_monotone():
    ps = [cp_collision_probability(s, 64, n_trials=1500) for s in (0.0, 0.5, 0.9, 1.0)]
    assert ps[0] < ps[1] < ps[2] <= ps[3] == 1.0
    table = cp_probability_table(16)
    # 0.775 sits halfway between grid points 15 (0.75) and 16 (0.80)
    assert cp_probability_at(0.775, table) == pytest.approx(
        (table[15] + table[16]) / 2, abs=1e-12
    )
    assert cp_probability_at(0.75, table) == pytest.approx(table[15], abs=1e-12)


def test_planner_and_planted_recall(spark):
    """End-to-end: CP-banded candidates + exact verify reach >=0.99
    recall on planted near-dups at tau=0.9 (reference
    recall-vs-bruteforce pattern with the reference's own default
    angular family)."""
    from clann_spark.operators.embedding_lsh import embedding_lsh_pairs

    rng = np.random.default_rng(5)
    dim, n, n_dups = 32, 150, 25
    base = rng.standard_normal((n, dim))
    rows = [(i, base[i].tolist()) for i in range(n)]
    for j in range(n_dups):
        rows.append((n + j, (base[j] + 0.12 * rng.standard_normal(dim)).tolist()))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    tau = 0.9
    plan = plan_cp_banding(tau, dim, target_recall=0.999, max_funcs=256)
    assert plan.recall_at_tau >= 0.999

    got = {
        (r["a"], r["b"])
        for r in embedding_lsh_pairs(
            emb, tau, plan.bands, plan.rows_per_band, hash_family="crosspolytope"
        ).collect()
    }

    x = np.array([r[1] for r in rows])
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    sims = xn @ xn.T
    ids = [r[0] for r in rows]
    want = {
        (min(ids[i], ids[j]), max(ids[i], ids[j]))
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        if sims[i, j] >= tau
    }
    assert len(want) >= 15
    missed = want - got
    assert len(missed) <= max(1, int(0.01 * len(want))), missed
    assert not (got - want)  # exact verify => precision 1.0
