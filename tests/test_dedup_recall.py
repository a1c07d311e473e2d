"""Milestone-0 gate (SURVEY.md §7): end-to-end near-duplicate detection
on the planted-duplicates pages fixture, recall >= 0.99 vs BOTH the
planted ground truth and an exact brute-force oracle
(reference pattern: recall tests vs brute_force_search,
src/puffinn_binds/puffinn.rs:178-225; adapted to dup pairs per
BASELINE.json north_rule)."""

from __future__ import annotations

from itertools import combinations

import pytest
from pyspark.sql import functions as F

from clann_spark.config import DedupConfig
from clann_spark.functions.hashing import np_shingle_hashes
from clann_spark.functions.text import py_shingles
from clann_spark.pipeline import dedup_summary, prepare_pages, run_dedup
from clann_spark.sources.pages import make_pages, pages_to_spark

CFG = DedupConfig()  # tau=0.8, 32x4 banding -> planner recall ~1-5e-8


@pytest.fixture(scope="module")
def fixture():
    return make_pages(n_base=300, seed=42)


@pytest.fixture(scope="module")
def result(spark, fixture):
    pages, _ = pages_to_spark(spark, fixture)
    docs = prepare_pages(pages)
    res = run_dedup(docs, CFG)
    res.verified = res.verified.cache()
    res.assignments = res.assignments.cache()
    return res


def _exact_oracle_pairs(fixture, tau):
    """Brute-force all-pairs exact Jaccard on shingle-hash sets
    (reference analog: global_bf_join, collection.hpp:506-521)."""
    texts = list(fixture.pages["text"])
    urls = list(fixture.pages["url"])
    sets = [set(np_shingle_hashes(py_shingles(t, CFG.shingle_k)).tolist()) for t in texts]
    out = set()
    for i, j in combinations(range(len(sets)), 2):
        inter = len(sets[i] & sets[j])
        if inter == 0:
            continue
        jac = inter / len(sets[i] | sets[j])
        if jac >= tau:
            out.add(tuple(sorted((urls[i], urls[j]))))
    return out


def test_pair_recall_vs_exact_oracle(spark, fixture, result):
    gt = _exact_oracle_pairs(fixture, CFG.tau)
    assert len(gt) >= 100, "fixture must plant enough >=tau pairs to be meaningful"

    id2url = {
        r["doc_id"]: r["url"]
        for r in prepare_pages(pages_to_spark(spark, fixture)[0]).select("doc_id", "url").collect()
    }
    found = {
        tuple(sorted((id2url[r["a"]], id2url[r["b"]])))
        for r in result.verified.collect()
    }
    missed = gt - found
    recall = 1 - len(missed) / len(gt)
    assert recall >= 0.99, f"recall {recall:.4f}, missed {list(missed)[:5]}"
    # exact verification => no pair below tau sneaks in (precision 1.0)
    assert not (found - gt), f"false positives: {list(found - gt)[:5]}"


def test_planted_gt_recall_after_clustering(spark, fixture, result):
    """Recall on the planted gt measured at the cluster level: a gt pair
    counts as found iff both docs land in the same cluster (dedup
    semantics — transitivity allowed)."""
    gt = fixture.gt_pairs
    gt_tau = gt[gt["jaccard"] >= CFG.tau]
    assert len(gt_tau) >= 80

    url2cluster = {}
    pages, _ = pages_to_spark(spark, fixture)
    with_urls = prepare_pages(pages).select("doc_id", "url").join(result.assignments, "doc_id")
    for r in with_urls.collect():
        url2cluster[r["url"]] = r["cluster_id"]

    hit = sum(
        1
        for _, row in gt_tau.iterrows()
        if url2cluster[row["url_a"]] == url2cluster[row["url_b"]]
    )
    recall = hit / len(gt_tau)
    assert recall >= 0.99, f"cluster-level recall {recall:.4f}"


def test_summary_counts_consistent(spark, result):
    s = dedup_summary(result).collect()[0]
    assert s["n_docs"] == s["n_clusters"] + s["n_removed"]
    assert s["n_removed"] > 0  # the fixture plants duplicates


def test_hamming_prefilter_keeps_pair_set(spark, fixture, result):
    """J7 enabled at the planner threshold: the verify stage sees fewer
    candidates but the verified pair set is UNCHANGED (the filter's
    per-pair miss probability is accounted at 1e-4; on this fixture it
    must drop nothing above tau)."""
    from clann_spark.planner import planned_prefilter

    cfg = CFG.with_(hamming_prefilter=planned_prefilter(CFG))
    pages, _ = pages_to_spark(spark, fixture)
    docs = prepare_pages(pages)
    filtered = {
        (r["a"], r["b"]) for r in run_dedup(docs, cfg).verified.collect()
    }
    unfiltered = {(r["a"], r["b"]) for r in result.verified.collect()}
    assert filtered == unfiltered


def test_determinism_two_runs(spark, fixture):
    """Reference determinism analog (collection_test.hpp:291-336
    round-trip): two full runs produce identical cluster assignments."""
    pages, _ = pages_to_spark(spark, fixture)
    docs = prepare_pages(pages)
    a = {(r["doc_id"], r["cluster_id"]) for r in run_dedup(docs, CFG).assignments.collect()}
    b = {(r["doc_id"], r["cluster_id"]) for r in run_dedup(docs, CFG).assignments.collect()}
    assert a == b
