"""Text layer: shingling parity + the html round-trip invariant
(BASELINE.json input_hint: extracted text byte-identical per url)."""

from __future__ import annotations

from pyspark.sql import functions as F

from clann_spark.functions import text as T

GOLDEN = [
    "plain ascii text with words",
    "entities & brackets <like> this \"quoted\" and 'single'",
    "unicode: café naïve — dash ümläut",
    "",
    "trailing spaces and\nnewlines\t\ttabs",
]


def test_words_parity(spark):
    df = spark.createDataFrame([(t,) for t in GOLDEN], "text string")
    got = [r["w"] for r in df.select(T.words_col("text").alias("w")).collect()]
    for t, w in zip(GOLDEN, got):
        assert w == T.py_words(t), t


def test_shingles_parity(spark):
    df = spark.createDataFrame([(t,) for t in GOLDEN], "text string")
    got = [r["s"] for r in df.select(T.shingles_col("text", 3).alias("s")).collect()]
    for t, s in zip(GOLDEN, got):
        assert s == T.py_shingles(t, 3), t


def test_html_roundtrip_bytes():
    for t in GOLDEN:
        h = T.py_wrap_html(t, title="t")
        assert T.py_extract_text(h) == t, t


def test_extract_text_udf(spark):
    rows = [(T.py_wrap_html(t), t) for t in GOLDEN]
    df = spark.createDataFrame(rows, "html binary, expected string")
    out = df.select(T.extract_text_udf()(F.col("html")).alias("got"), "expected").collect()
    for r in out:
        assert r["got"] == r["expected"]
