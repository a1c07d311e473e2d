"""Winnowing fingerprints + suffix-array LCS (north_rule substring
pass) vs brute-force Python oracles."""

from __future__ import annotations

import numpy as np
import pytest

from clann_spark.operators.substring import (
    kasai_lcp,
    longest_common_substring_len,
    rolling_window_hashes,
    substring_pairs,
    suffix_array,
    winnow,
)


def _bf_lcs(a: str, b: str) -> int:
    # O(n*m) DP oracle
    n, m = len(a), len(b)
    best = 0
    prev = [0] * (m + 1)
    for i in range(1, n + 1):
        cur = [0] * (m + 1)
        ai = a[i - 1]
        for j in range(1, m + 1):
            if ai == b[j - 1]:
                cur[j] = prev[j - 1] + 1
                if cur[j] > best:
                    best = cur[j]
        prev = cur
    return best


def test_suffix_array_vs_sorted_suffixes():
    rng = np.random.default_rng(42)
    for _ in range(5):
        s = rng.integers(0, 4, size=50).astype(np.int64)
        sa = suffix_array(s)
        txt = "".join(map(str, s.tolist()))
        want = sorted(range(len(txt)), key=lambda i: txt[i:])
        assert sa.tolist() == want


def test_kasai_lcp():
    s = np.frombuffer(b"banana", dtype=np.uint8).astype(np.int64)
    sa = suffix_array(s)
    lcp = kasai_lcp(s, sa)
    # classic banana: sa = [5,3,1,0,4,2], lcp = [0,1,3,0,0,2]
    assert sa.tolist() == [5, 3, 1, 0, 4, 2]
    assert lcp.tolist() == [0, 1, 3, 0, 0, 2]


@pytest.mark.parametrize(
    "a,b",
    [
        ("hello world this is a shared run of text", "unrelated shared run of text tail"),
        ("abcabcabc", "xbcabcy"),
        ("no overlap at all", "zzzzzz"),
        ("", "x"),
        ("same", "same"),
    ],
)
def test_lcs_vs_dp_oracle(a, b):
    assert longest_common_substring_len(a, b) == _bf_lcs(a, b)


def test_lcs_random_vs_dp():
    rng = np.random.default_rng(7)
    alpha = "abcd"
    for _ in range(10):
        a = "".join(rng.choice(list(alpha), size=80))
        b = "".join(rng.choice(list(alpha), size=60))
        assert longest_common_substring_len(a, b) == _bf_lcs(a, b)


def test_winnowing_guarantee():
    # two texts sharing a run of exactly window + w - 1 chars must share
    # a fingerprint
    rng = np.random.default_rng(3)
    window, w = 16, 8
    shared = "".join(rng.choice(list("abcdefgh"), size=window + w - 1))
    t1 = "x" * 40 + shared + "y" * 40
    t2 = "p" * 33 + shared + "q" * 21
    f1 = winnow(rolling_window_hashes(t1, window), w)
    f2 = winnow(rolling_window_hashes(t2, window), w)
    assert set(f1.tolist()) & set(f2.tolist())


def test_substring_pairs_end_to_end(spark):
    rng = np.random.default_rng(5)
    alpha = list("abcdefghijklmnop ")
    shared = "".join(rng.choice(alpha, size=300))
    mk = lambda: "".join(rng.choice(alpha, size=400))
    rows = [
        (1, mk() + shared + mk()),
        (2, mk() + shared + mk()),   # shares 300 chars with 1
        (3, mk()),                    # unrelated
        (4, mk() + shared[:100] + mk()),  # only 100 shared -> below 256
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["a"], r["b"]): r["lcs_len"] for r in substring_pairs(docs, min_len=256).collect()}
    assert set(got) == {(1, 2)}
    assert got[(1, 2)] >= 300


def test_substring_pass_on_planted_fixture(spark):
    """The pages fixture plants 'substring' clones sharing a >=40-word
    run inside otherwise-different docs (FIXTURES.md §1). The winnowing
    + suffix-array pass must recover >=95% of them."""
    from clann_spark.pipeline import prepare_pages
    from clann_spark.sources.pages import make_pages, pages_to_spark

    fx = make_pages(n_base=200, seed=13)
    gt = fx.gt_pairs
    sub_gt = gt[gt["kind"] == "substring"]
    assert len(sub_gt) >= 10
    pages, _ = pages_to_spark(spark, fx)
    docs = prepare_pages(pages)
    got = substring_pairs(docs.select("doc_id", "text"), min_len=200).collect()
    id2url = {r["doc_id"]: r["url"] for r in docs.select("doc_id", "url").collect()}
    found = {tuple(sorted((id2url[r["a"]], id2url[r["b"]]))) for r in got}
    want = {tuple(sorted((r["url_a"], r["url_b"]))) for _, r in sub_gt.iterrows()}
    recall = len(found & want) / len(want)
    assert recall >= 0.95, f"substring recall {recall:.3f}"


def test_vectorized_lcp_matches_kasai():
    """Binary-lifting LCP (vectorized) must equal the per-char Kasai
    reference on random strings, including adjacent-pair extraction."""
    import numpy as np

    from clann_spark.operators.substring import lcp_of_position_pairs

    rng = np.random.default_rng(7)
    for trial in range(20):
        n = int(rng.integers(2, 200))
        s = rng.integers(0, 4, size=n).astype(np.int64)
        sa, levels = suffix_array(s, return_levels=True)
        want = kasai_lcp(s, sa)[1:]
        got = lcp_of_position_pairs(sa[:-1], sa[1:], levels, n)
        assert (got == want).all(), (trial, s.tolist())


def test_batch_winnow_matches_per_doc_reference():
    """The flat-stream batched fingerprint core (VERDICT r4 item 6) is
    value-identical to the per-doc winnow(rolling_window_hashes(...))
    reference on adversarial shapes: empty, None-ish, shorter than the
    hash window, hash counts straddling the winnow window, unicode,
    and long repetitive text."""
    import random

    from clann_spark.operators.substring import batch_winnow_fingerprints

    rng = random.Random(11)
    window, w = 8, 4
    texts = [
        "", "a", "x" * (window - 1), "y" * window, "z" * (window + w - 1),
        "hello world " * 40, "абв гдё" * 30, "a" * 500,
    ]
    for _ in range(40):
        n = rng.randrange(0, 120)
        texts.append("".join(rng.choice("abcdef ") for _ in range(n)))
    rng.shuffle(texts)

    vals, offs = batch_winnow_fingerprints(texts, window, w)
    for i, t in enumerate(texts):
        want = winnow(rolling_window_hashes(t, window), w)
        got = vals[offs[i] : offs[i + 1]]
        assert np.array_equal(np.sort(got), np.sort(want)), (i, t[:40])

    # per-doc cost independent of batch size: doubling the batch must
    # not change any doc's fingerprints (pure flat-stream recompute)
    vals2, offs2 = batch_winnow_fingerprints(texts + texts, window, w)
    k = len(texts)
    for i in range(k):
        a = np.sort(vals[offs[i] : offs[i + 1]])
        b = np.sort(vals2[offs2[k + i] : offs2[k + i + 1]])
        assert np.array_equal(a, b)


def test_batch_winnow_short_doc_before_trailing_empty():
    """Regression: a short doc (<= w hashes) whose minimum hash sits at
    its LAST position, followed by empty docs, must keep that min. The
    old reduceat start-clamp (h.size - 1) ended the doc's segment one
    hash early, dropping the trailing min and bucketing the doc wrong."""
    from clann_spark.operators.substring import batch_winnow_fingerprints

    window, w = 8, 4
    for tail in ([""], ["", ""], ["", "ab"]):
        texts = ["ecdcaehbb"] + tail  # 2 hashes; true min is the 2nd
        vals, offs = batch_winnow_fingerprints(texts, window, w)
        for i, t in enumerate(texts):
            want = winnow(rolling_window_hashes(t, window), w)
            got = vals[offs[i] : offs[i + 1]]
            assert np.array_equal(np.sort(got), np.sort(np.unique(want))), (
                tail, i, got, want,
            )
