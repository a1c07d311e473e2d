"""Fixed-point quantization (P5/P6, unit_vector.hpp parity): error
bound vs float cosine, range/validity, Spark column round-trip."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from clann_spark.functions.quantize import (
    COS_I16_SQL,
    FIXED_ONE,
    np_cosine_i16,
    np_quantize_unit,
    quantize_embeddings,
)


def test_quantize_range_and_norm():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((100, 64)) * 5.0
    q = np_quantize_unit(x)
    assert q.dtype == np.int16
    assert q.min() >= -FIXED_ONE and q.max() <= FIXED_ONE - 1
    # quantized rows stay ~unit-norm in fixed-point space
    norms = np.sqrt((q.astype(np.int64) ** 2).sum(axis=1)) / FIXED_ONE
    assert np.abs(norms - 1.0).max() < 1e-3


def test_fixed_point_cosine_error_bound():
    rng = np.random.default_rng(3)
    a = rng.standard_normal((500, 64))
    b = rng.standard_normal((500, 64))
    an = a / np.linalg.norm(a, axis=1, keepdims=True)
    bn = b / np.linalg.norm(b, axis=1, keepdims=True)
    exact = (an * bn).sum(axis=1)
    approx = np_cosine_i16(np_quantize_unit(a), np_quantize_unit(b))
    assert np.abs(approx - exact).max() < 2e-3  # ~d * 2^-15 headroom


def test_spark_column_and_sql_cosine(spark, embeddings):
    emb = quantize_embeddings(embeddings.limit(60)).cache()
    row = emb.select(F.expr("size(embedding_q)").alias("d")).first()
    assert row["d"] == 64
    # self-cosine via the SQL fold == 1 within fixed-point error
    j = emb.selectExpr("embedding_q AS qa", "embedding_q AS qb").selectExpr(
        f"{COS_I16_SQL} AS c"
    )
    vals = [r["c"] for r in j.collect()]
    assert all(abs(v - 1.0) < 2e-3 for v in vals)
