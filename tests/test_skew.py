"""Adversarial skew (FIXTURES.md §4 / north_rule explicit-skew
requirement): 1000 exact copies of one page + a boilerplate template
shared by 30% of docs. The reference has no skew handling
(collection.hpp:415-441 loops whole segments); here salting must cap
per-task pair work while CC + multi-band salting preserve recall."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clann_spark.config import DedupConfig
from clann_spark.operators.candidates import salted_buckets
from clann_spark.operators.signatures import compute_signatures, explode_bands
from clann_spark.pipeline import prepare_pages, run_dedup
from clann_spark.sources.pages import make_pages, pages_to_spark

CFG = DedupConfig(signature_impl="fast", bucket_cap=150)


@pytest.fixture(scope="module")
def skew_setup(spark):
    fx = make_pages(n_base=150, seed=42, skew=True)
    pages, _ = pages_to_spark(spark, fx)
    docs = prepare_pages(pages)
    return fx, docs


def test_salting_caps_group_size(spark, skew_setup):
    _, docs = skew_setup
    sigs = compute_signatures(
        docs.select("doc_id", "text"), CFG, include_shingles=False
    )
    sb = salted_buckets(explode_bands(sigs, CFG), CFG)
    biggest_raw = sb.groupBy("band_hash").count().agg(F.max("count")).collect()[0][0]
    assert biggest_raw >= 1000  # the mega-bucket is real
    biggest_salted = (
        sb.groupBy("band_hash", "salt").count().agg(F.max("count")).collect()[0][0]
    )
    # hash-balanced split: no salt group beyond ~2x the cap
    assert biggest_salted <= 2 * CFG.bucket_cap, biggest_salted


def test_mega_cluster_reassembled_and_recall(spark, skew_setup):
    fx, docs = skew_setup
    res = run_dedup(docs, CFG, pair_mode="auto")
    res.assignments.cache()

    sizes = res.assignments.groupBy("cluster_id").count()
    assert sizes.agg(F.max("count")).collect()[0][0] == 1001

    # cluster-level recall on planted pairs >= tau
    gt = fx.gt_pairs
    gt_tau = gt[gt["jaccard"] >= CFG.tau]
    url_cluster = {
        r["url"]: r["cluster_id"]
        for r in docs.select("doc_id", "url").join(res.assignments, "doc_id").collect()
    }
    hit = sum(
        1 for _, p in gt_tau.iterrows() if url_cluster[p["url_a"]] == url_cluster[p["url_b"]]
    )
    recall = hit / len(gt_tau)
    assert recall >= 0.99, f"skew recall {recall:.4f} over {len(gt_tau)} pairs"
