"""Banded SimHash near-dup pairs vs brute-force Hamming oracle —
pigeonhole recall must be exactly 1.0 for t <= n_bands - 1."""

from __future__ import annotations

from itertools import combinations

import pytest

from clann_spark.config import DedupConfig
from clann_spark.operators.signatures import compute_signatures
from clann_spark.operators.simhash_dedup import simhash_near_pairs

CFG = DedupConfig()


@pytest.fixture(scope="module")
def sigs(spark, documents):
    return (
        compute_signatures(documents.select("doc_id", "text"), CFG)
        .select("doc_id", "simhash")
        .cache()
    )


def test_matches_bruteforce_oracle(spark, sigs):
    rows = {r["doc_id"]: r["simhash"] for r in sigs.collect()}
    for t in (2, 4):
        want = {
            (a, b, bin(rows[a] ^ rows[b]).count("1"))
            for a, b in combinations(sorted(rows), 2)
            if bin(rows[a] ^ rows[b]).count("1") <= t
        }
        got = {
            (r["a"], r["b"], r["hamming"])
            for r in simhash_near_pairs(sigs, max_hamming=t).collect()
        }
        assert got == want, f"t={t}: {len(got)} vs {len(want)}"


def test_more_bands_than_needed_same_result(spark, sigs):
    a = {(r["a"], r["b"]) for r in simhash_near_pairs(sigs, 3, n_bands=4).collect()}
    b = {(r["a"], r["b"]) for r in simhash_near_pairs(sigs, 3, n_bands=10).collect()}
    assert a == b


def test_anchor_mode_same_clusters(spark, sigs):
    """emit='anchor'/'auto' must produce the same connected components
    as the full clique output (connectivity is all CC consumes)."""
    from clann_spark.operators.connected_components import connected_components

    def clusters(emit):
        pairs = simhash_near_pairs(sigs, max_hamming=4, emit=emit, anchor_threshold=4)
        return {
            (r["doc_id"], r["cluster_id"])
            for r in connected_components(pairs.select("a", "b")).collect()
        }

    ref = clusters("clique")
    assert clusters("anchor") == ref
    assert clusters("auto") == ref


def test_anchor_mode_linear_on_identity_mega_group(spark):
    """A boilerplate mega-group (10^5 docs sharing one fingerprint) must
    emit m-1 anchor edges, not m(m-1)/2 clique pairs — the round-2
    'What's wrong #1' skew case."""
    m = 100_000
    df = (
        spark.range(m + 3)
        .selectExpr(
            "id as doc_id",
            # docs 0..m-1: identical fingerprint; 3 extra docs at
            # Hamming 1/2/61 from it
            "CASE WHEN id < %d THEN 1048575 "
            " WHEN id = %d THEN 1048574 "
            " WHEN id = %d + 1 THEN 1048572 "
            " ELSE 576460752302472704 END as simhash" % (m, m, m),
        )
    )
    pairs = simhash_near_pairs(df, max_hamming=2, emit="anchor").collect()
    # m-1 identity edges + 3 bridges (mega<->1048574 at H1,
    # mega<->1048572 at H2, 1048574<->1048572 at H1)
    assert len(pairs) == (m - 1) + 3
    # every doc in the mega-group lands in one cluster with the bridges
    from clann_spark.operators.connected_components import connected_components

    import pyspark.sql.functions as F

    n = (
        connected_components(spark.createDataFrame(pairs).select("a", "b"))
        .agg(F.countDistinct("cluster_id"))
        .collect()[0][0]
    )
    assert n == 1
