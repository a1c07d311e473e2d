"""Pooled / tensored band sources (H9/H10, reference pool.hpp /
tensor.hpp): many LSH tables from few signature lanes. The reference's
headline config (L=84 tables) is only affordable through these; here
they are lane-selection strategies over the vectorized signature stage,
with the same candidate machinery downstream."""

from __future__ import annotations

import numpy as np
import pytest

from clann_spark.config import DedupConfig
from clann_spark.functions import hashing as H
from clann_spark.pipeline import prepare_pages, run_dedup
from clann_spark.sources.pages import make_pages, pages_to_spark


@pytest.fixture(scope="module")
def fixture():
    return make_pages(n_base=150, seed=11)


@pytest.fixture(scope="module")
def docs(spark, fixture):
    pages, _ = pages_to_spark(spark, fixture)
    return prepare_pages(pages).select("doc_id", "text").cache()


def _cluster_recall(spark, fixture, docs, cfg):
    res = run_dedup(docs, cfg)
    gt = fixture.gt_pairs
    gt_tau = gt[gt["jaccard"] >= cfg.tau]
    url_cluster = {
        r["url"]: r["cluster_id"]
        for r in prepare_pages(pages_to_spark(spark, fixture)[0])
        .select("doc_id", "url")
        .join(res.assignments, "doc_id")
        .collect()
    }
    hit = sum(
        1 for _, p in gt_tau.iterrows()
        if url_cluster[p["url_a"]] == url_cluster[p["url_b"]]
    )
    return hit / max(1, len(gt_tau))


def test_pooled_source_recall(spark, fixture, docs):
    """84 bands x 4 rows drawn from a 128-lane pool: 336 virtual lanes
    from 128 computed ones; recall still >= 0.99 (exact verify keeps
    precision 1.0 regardless)."""
    cfg = DedupConfig(
        signature_impl="fast", hash_source="pooled", bands=84, rows_per_band=4
    )
    assert _cluster_recall(spark, fixture, docs, cfg) >= 0.99


def test_tensored_source_recall(spark, fixture, docs):
    """84 bands as 9x10 half-code pairs: 38 lanes folded instead of 336."""
    cfg = DedupConfig(
        signature_impl="fast", hash_source="tensored", bands=84, rows_per_band=4
    )
    t1, t2 = cfg.tensor_shape
    r_l = cfg.rows_per_band // 2
    assert t1 * r_l + t2 * (cfg.rows_per_band - r_l) <= cfg.num_perm
    assert _cluster_recall(spark, fixture, docs, cfg) >= 0.99


def test_independent_identity_and_determinism():
    """Lane-index banding reproduces the contiguous-reshape values for
    the independent source, and pooled indices are seed-deterministic."""
    cfg = DedupConfig(signature_impl="fast")
    rng = np.random.default_rng(3)
    sig = rng.integers(0, 2**31 - 1, size=(20, cfg.num_perm), dtype=np.int64)
    b = H.np_band_hashes_from_sig(sig, cfg)
    assert b.shape == (20, cfg.bands)
    cfg_p = DedupConfig(
        signature_impl="fast", hash_source="pooled", bands=64, rows_per_band=4
    )
    i1 = H.band_lane_indices(cfg_p)
    i2 = H.band_lane_indices(cfg_p)
    assert (i1 == i2).all() and i1.max() < cfg_p.num_perm
    # different seeds draw different pools
    i3 = H.band_lane_indices(cfg_p.with_(seed=43))
    assert not (i1 == i3).all()
