"""Persisted IVF index (S3/S4 lifecycle): build commits stage tables,
rebuild resumes, load reopens without recompute, and queries against
the loaded index equal brute force (rescue on)."""

from __future__ import annotations

import os

import pytest

from clann_spark.operators.ivf_index import (
    build_ivf_index,
    knn_ivf_index,
    load_ivf_index,
)
from clann_spark.operators.knn import knn_bruteforce


@pytest.fixture(scope="module")
def emb(spark, embeddings):
    return embeddings.cache()


def test_build_query_load_roundtrip(spark, emb, tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("ivf"))
    idx = build_ivf_index(spark, emb, wd, k=8, brute_force_below=16)
    queries = emb.where("vec_id % 50 = 0")
    exact = {
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in knn_bruteforce(queries, emb, k=5).collect()
    }
    got = {
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in knn_ivf_index(queries, idx, k=5, nprobe=2).collect()
    }
    assert got == exact

    # second build in the same workdir resumes from the checkpoint
    idx2 = build_ivf_index(spark, emb, wd, k=8, brute_force_below=16)
    assert (idx2.centers == idx.centers).all()
    assert os.path.exists(os.path.join(wd, "_lineage", "assigned.json"))

    # a fresh process would load instead: same answers, no recompute
    idx3 = load_ivf_index(spark, wd, brute_force_below=16)
    assert idx3.metric == "cosine" and (idx3.radii == idx.radii).all()
    got3 = {
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in knn_ivf_index(queries, idx3, k=5, nprobe=2).collect()
    }
    assert got3 == exact


def test_stale_centers_refit_on_config_change(spark, emb, tmp_path_factory):
    """centers.json carries the input/config fingerprint: reusing the
    SAME workdir with a different k or metric must refit the centers
    instead of silently reusing stale ones (round-2 ADVICE)."""
    wd = str(tmp_path_factory.mktemp("ivf_stale"))
    idx4 = build_ivf_index(spark, emb, wd, k=4, brute_force_below=16)
    assert idx4.centers.shape[0] == 4
    # different k, same workdir -> refit (shape changes), not reuse
    idx8 = build_ivf_index(spark, emb, wd, k=8, brute_force_below=16)
    assert idx8.centers.shape[0] == 8
    # different metric, same workdir -> refit + stored metric updates
    idx_l2 = build_ivf_index(spark, emb, wd, k=8, metric="euclidean", brute_force_below=16)
    assert idx_l2.metric == "euclidean"
    reloaded = load_ivf_index(spark, wd, brute_force_below=16)
    assert reloaded.metric == "euclidean"


def test_quantized_index_persists_int16_and_stays_exact(spark, emb, tmp_path_factory):
    """quantized=True commits embedding_q (int16) in the assigned stage
    table (the reference stores int16 per cluster blob,
    unit_vector.hpp:40-51 / index.rs:511-557); a LOADED index answers
    quantized queries equal to brute force (provable-shortlist exact
    re-score)."""
    from pyspark.sql.types import ArrayType, ShortType

    wd = str(tmp_path_factory.mktemp("ivf_q"))
    idx = build_ivf_index(spark, emb, wd, k=8, brute_force_below=16, quantized=True)
    assert idx.has_quantized
    # the int16 column is ON DISK, not recomputed at query time
    stored = spark.read.parquet(os.path.join(wd, "assigned"))
    assert isinstance(stored.schema["embedding_q"].dataType, ArrayType)
    assert isinstance(stored.schema["embedding_q"].dataType.elementType, ShortType)

    queries = emb.where("vec_id % 50 = 0")
    exact = {
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in knn_bruteforce(queries, emb, k=5).collect()
    }
    loaded = load_ivf_index(spark, wd, brute_force_below=16)
    assert loaded.has_quantized
    got = {
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in knn_ivf_index(queries, loaded, k=5, nprobe=2, quantized=True).collect()
    }
    assert got == exact

    # an index built WITHOUT quantized=True refuses quantized queries
    wd2 = str(tmp_path_factory.mktemp("ivf_nq"))
    idx_nq = build_ivf_index(spark, emb, wd2, k=8, brute_force_below=16)
    with pytest.raises(ValueError, match="embedding_q"):
        knn_ivf_index(queries, idx_nq, k=5, nprobe=2, quantized=True)
