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
    # whitespace-class parity traps: \x0B (Java \s has it, RE2 \s does
    # not) and U+00A0 (Python \s has it, the others do not) — the
    # explicit ASCII class makes all three engines agree
    "vertical\x0btab and form\x0cfeed and\rcarriage",
    "nbsp stays attached and ideographic　space too",
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


def test_words_three_engine_parity(spark):
    """Spark SQL, DuckDB and Python tokenizers agree on the explicit
    ASCII whitespace class — including \\x0B and Unicode spaces (the
    round-1 parity hole flagged in ADVICE)."""
    import duckdb

    from clann_spark.oracles import duck_words

    df = spark.createDataFrame([(t,) for t in GOLDEN], "text string")
    spark_out = [r["w"] for r in df.select(T.words_col("text").alias("w")).collect()]
    con = duckdb.connect()
    for t, sw in zip(GOLDEN, spark_out):
        dw = con.sql(
            f"SELECT {duck_words('t.text')} FROM (SELECT ? AS text) t", params=[t]
        ).fetchone()[0]
        assert sw == dw == T.py_words(t), t


def test_extract_text_udf(spark):
    rows = [(T.py_wrap_html(t), t) for t in GOLDEN]
    df = spark.createDataFrame(rows, "html binary, expected string")
    out = df.select(T.extract_text_udf()(F.col("html")).alias("got"), "expected").collect()
    for r in out:
        assert r["got"] == r["expected"]
