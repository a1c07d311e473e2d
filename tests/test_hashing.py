"""Bit-identity contract: Spark SQL exprs == NumPy twins == DuckDB oracle.

This is the analog of the reference's serialization/determinism tests
(libpuffinn collection_test.hpp:291-336): signatures must be a pure
function of content — identical across engines, retries, parallelism.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from clann_spark import oracles as OQ
from clann_spark.config import DedupConfig, md5_int60, perm_params
from clann_spark.functions import hashing as H
from clann_spark.functions import text as T

CFG = DedupConfig(num_perm=16, bands=4, rows_per_band=4)

SAMPLE = [
    (1, "The quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog"),  # case dup of 1
    (3, "a completely different document about spark and large scale data"),
    (4, "short"),
    (5, ""),
    (6, "  padded   whitespace\ttabs\nnewlines  here  "),
]


@pytest.fixture(scope="module")
def sample_df(spark):
    return spark.createDataFrame(SAMPLE, "doc_id long, text string")


def _spark_rows(spark, df, cfg):
    sh = T.shingles_sql("text", cfg.shingle_k)
    hs = H.shingle_hashes_sql(sh)
    wh = H.word_hashes_sql(T.words_sql("text"))
    out = df.select(
        "doc_id",
        F.expr(hs).alias("hashes"),
        F.expr(H.minhash_sql(hs, cfg)).alias("sig"),
        F.expr(H.bands_sql(H.minhash_sql(hs, cfg), cfg)).alias("bands"),
        F.expr(H.simhash_sql(wh)).alias("simhash"),
    )
    return {r["doc_id"]: r for r in out.collect()}


def _duck_rows(cfg):
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", SAMPLE)
    sh = OQ.duck_shingles("text", cfg.shingle_k)
    hs = OQ.duck_shingle_hashes(sh)
    q = f"""
      SELECT doc_id,
             {hs} AS hashes,
             {OQ.duck_minhash(hs, cfg)} AS sig,
             {OQ.duck_bands(OQ.duck_minhash(hs, cfg), cfg)} AS bands,
             {OQ.duck_simhash(OQ.duck_word_hashes('text'))} AS simhash
      FROM t
    """
    return {r[0]: r for r in con.sql(q).fetchall()}


def test_md5_int60_matches_spark(spark):
    df = spark.createDataFrame([("abc",), ("", ), ("clann spark",)], "s string")
    got = {r["s"]: r["h"] for r in df.select("s", F.expr(H.h60_sql("s")).alias("h")).collect()}
    for s, h in got.items():
        assert h == md5_int60(s)


def test_perm_params_deterministic():
    p1 = perm_params(8, 42)
    p2 = perm_params(8, 42)
    assert p1 == p2
    assert p1 != perm_params(8, 43)
    assert all(a >= 1 for a, _ in p1)


def test_spark_equals_numpy(spark, sample_df):
    rows = _spark_rows(spark, sample_df, CFG)
    a = np.array([p[0] for p in CFG.perms], dtype=np.int64)
    b = np.array([p[1] for p in CFG.perms], dtype=np.int64)
    for doc_id, text in SAMPLE:
        sh = T.py_shingles(text, CFG.shingle_k)
        hs = np.unique(H.np_shingle_hashes(sh))
        assert sorted(rows[doc_id]["hashes"]) == hs.tolist(), f"doc {doc_id} hashes"
        sig = H.np_minhash(hs, a, b)
        assert rows[doc_id]["sig"] == sig.tolist(), f"doc {doc_id} sig"
        assert rows[doc_id]["bands"] == H.np_band_hashes(sig, CFG).tolist()
        wh = np.unique(
            np.array([md5_int60(w) for w in set(T.py_words(text))], dtype=np.int64)
        ) if text.strip() else np.array([], dtype=np.int64)
        assert rows[doc_id]["simhash"] == H.np_simhash(wh), f"doc {doc_id} simhash"


def test_spark_equals_duckdb(spark, sample_df):
    s_rows = _spark_rows(spark, sample_df, CFG)
    d_rows = _duck_rows(CFG)
    for doc_id, _ in SAMPLE:
        s, d = s_rows[doc_id], d_rows[doc_id]
        assert sorted(s["hashes"]) == sorted(d[1]), f"doc {doc_id} hashes"
        assert s["sig"] == list(d[2]), f"doc {doc_id} sig"
        assert s["bands"] == list(d[3]), f"doc {doc_id} bands"
        assert s["simhash"] == d[4], f"doc {doc_id} simhash"


def test_pandas_udf_equals_expr(spark, sample_df):
    cfg = CFG
    expr_rows = _spark_rows(spark, sample_df, cfg)
    udf = H.signature_udf(cfg)
    got = {
        r["doc_id"]: r
        for r in sample_df.select("doc_id", udf("text").alias("s")).select(
            "doc_id", "s.shingle_hashes", "s.sig", "s.simhash"
        ).collect()
    }
    for doc_id, _ in SAMPLE:
        assert sorted(got[doc_id]["shingle_hashes"]) == sorted(expr_rows[doc_id]["hashes"])
        assert got[doc_id]["sig"] == expr_rows[doc_id]["sig"]
        assert got[doc_id]["simhash"] == expr_rows[doc_id]["simhash"]


def test_simhash_similar_docs_close(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5),
            (2, "alpha beta gamma delta epsilon zeta eta theta iota kappaX " * 5),
            (3, "totally unrelated words nothing shared here at all xyz qrs"),
        ],
        "doc_id long, text string",
    )
    wh = H.word_hashes_sql(T.words_sql("text"))
    rows = {r["doc_id"]: r["sh"] for r in df.select("doc_id", F.expr(H.simhash_sql(wh)).alias("sh")).collect()}
    ham12 = bin(rows[1] ^ rows[2]).count("1")
    ham13 = bin(rows[1] ^ rows[3]).count("1")
    assert ham12 < ham13


def test_md5_parity_arrow_path_equals_sql_exprs(spark, sample_df):
    """Round-6 pin: compute_signatures' vectorized md5-parity path
    (JVM hash arrays + md5_parity_signature_arrow for the MinHash
    fold / SimHash vote / band folds) is bit-identical to the
    definitional *_sql expression chain it replaced — including the
    empty-doc, short-doc and whitespace edge rows."""
    from clann_spark.operators.signatures import compute_signatures

    cfg = CFG
    expr_rows = _spark_rows(spark, sample_df, cfg)
    got = {
        r["doc_id"]: r
        for r in compute_signatures(sample_df, cfg).select(
            "doc_id", "shingle_hashes", "sig", "bands", "simhash"
        ).collect()
    }
    for doc_id, _ in SAMPLE:
        assert sorted(got[doc_id]["shingle_hashes"]) == sorted(
            expr_rows[doc_id]["hashes"]
        ), f"doc {doc_id} hashes"
        assert got[doc_id]["sig"] == expr_rows[doc_id]["sig"], f"doc {doc_id} sig"
        assert got[doc_id]["bands"] == expr_rows[doc_id]["bands"], f"doc {doc_id} bands"
        assert got[doc_id]["simhash"] == expr_rows[doc_id]["simhash"], f"doc {doc_id} simhash"


def test_xxhash_impl_runs_and_matches_dedup_outcome(spark):
    """The xxhash impl shares the round-6 vectorized fold path with the
    expr impl (different hash space, same structure); pin that it runs
    and that the verified pair set — which is hash-space independent
    for clear duplicates — matches the md5 impl on a fixture of exact
    and near duplicates."""
    from clann_spark.pipeline import run_dedup

    rows = []
    for i in range(30):
        base = f"some stable sentence about topic {i} repeated for shingles " * 6
        rows.append((i, base))
        if i % 3 == 0:  # near-dup: one word appended
            rows.append((1000 + i, base + "tail"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def pairset(impl):
        res = run_dedup(
            docs,
            DedupConfig(signature_impl=impl, hamming_prefilter=None),
            pair_mode="clique",
        )
        out = {(r["a"], r["b"]) for r in res.verified.collect()}
        res.unpersist()
        return out

    assert pairset("xxhash") == pairset("expr")
