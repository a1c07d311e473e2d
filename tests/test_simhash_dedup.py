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
