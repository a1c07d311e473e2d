"""Physical-plan audits: the properties that decide 100-TB behavior —
scan column pruning + predicate pushdown, the signature stage staying
narrow (no shuffle), and broadcast vs shuffle join selection — pinned
against .explain() output so a regression is a test failure, not a
production surprise."""

from __future__ import annotations

import pytest

from clann_spark.config import DedupConfig
from clann_spark.operators.signatures import compute_signatures, explode_bands

CFG = DedupConfig(signature_impl="fast")


def _plan(df) -> str:
    # the helper pyspark's own DataFrame.explain() uses
    jvm = df.sparkSession._jvm
    return jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_scan_prunes_columns_and_pushes_filters(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    q = docs.where("doc_id % 2 = 0").where("lang = 'en'").select("doc_id", "text")
    plan = _plan(q)
    # projection reaches the parquet reader: only the needed columns
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "doc_id" in read_schema and "text" in read_schema
    assert "html" not in read_schema and "warc_ts" not in read_schema
    # the literal predicate reaches the scan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln][0]
    assert "lang" in pushed and "IsNotNull" in pushed


def test_signature_stage_is_narrow(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    sigs = compute_signatures(docs, CFG, include_shingles=False, include_sig=False)
    plan = _plan(sigs)
    assert "Exchange" not in plan, "signature stage must not shuffle"


def test_candidates_stage_is_one_exchange(spark, sf_dir):
    """Round-4 invariant: census, singleton drop, salting AND the
    clique pair join all hang off a single hashpartitioning(band_hash)
    exchange — no broadcast, no second shuffle, no driver action
    (candidates.py module docstring). The only other exchange in the
    full candidate plan is the unavoidable cross-band distinct."""
    from clann_spark.operators.candidates import candidate_pairs, salted_buckets

    def _simple(df) -> str:
        # simple mode keeps each Exchange's partitioning on its own
        # plan line, so node counting works (formatted mode splits the
        # arguments into a detail section)
        jvm = df.sparkSession._jvm
        return jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "simple"
        )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    sigs = compute_signatures(docs, CFG, include_shingles=False, include_sig=False)
    sb = salted_buckets(explode_bands(sigs, CFG), CFG)
    plan = _simple(sb)
    assert "BroadcastExchange" not in plan
    assert plan.count("Exchange hashpartitioning") == 1, plan

    pairs = candidate_pairs(explode_bands(sigs, CFG), CFG, mode="clique")
    pplan = _simple(pairs)
    assert "BroadcastExchange" not in pplan
    # the self-join must ride the band_hash exchanges directly (AQE
    # dedups the two canonically-equal sides into one shuffle at
    # runtime); EnsureRequirements must NOT insert (band_hash, salt)
    # re-shuffles — subset co-partitioning is accepted via
    # requireAllClusterKeysForCoPartition=false (session.py)
    for ln in pplan.splitlines():
        if "Exchange hashpartitioning" in ln and "salt" in ln:
            raise AssertionError(f"redundant salted re-shuffle: {ln}")
    assert "SortMergeJoin" in pplan


def test_bruteforce_knn_broadcasts_queries(spark, embeddings):
    from clann_spark.operators.knn import knn_bruteforce

    q = embeddings.where("vec_id % 50 = 0")
    plan = _plan(knn_bruteforce(q, embeddings, k=5))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_shuffle_path_has_no_broadcast_of_pairs(spark):
    """With the gate forced to 0, the verify joins must be shuffle
    joins (SortMergeJoin/ShuffledHashJoin), proving the at-scale plan
    shape exists and is selected."""
    from clann_spark.operators.verify import verify_pairs_from_text

    cfg = CFG.with_(broadcast_limit=0)
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta number {i} " * 4) for i in range(50)],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2), (3, 4)], "a long, b long")
    plan = _plan(verify_pairs_from_text(pairs, docs, cfg))
    # the pair side must NOT be broadcast (AQE may still broadcast tiny
    # sides at runtime, but the static plan must come from the shuffle
    # family for the gated joins)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
