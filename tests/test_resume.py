"""Checkpoint/lineage/resume (north_rule): kill after stage k, rerun,
committed stages are skipped and the final output is identical."""

from __future__ import annotations

import json
import os

import pytest

from clann_spark.config import DedupConfig
from clann_spark.pipeline import prepare_pages
from clann_spark.sources.pages import make_pages, pages_to_spark
from clann_spark.sources.stages import StageRunner, run_dedup_checkpointed

CFG = DedupConfig(signature_impl="fast")


@pytest.fixture(scope="module")
def docs(spark):
    pages, _ = pages_to_spark(spark, make_pages(n_base=120, seed=21))
    return prepare_pages(pages).select("doc_id", "text").cache()


def test_full_run_then_resume_skips_everything(spark, docs, tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("ckpt"))
    r1 = run_dedup_checkpointed(spark, docs, CFG, wd)
    assert r1["runner"].executed == [
        "signatures", "buckets", "candidates", "verified", "clusters", "assignments",
    ]
    a1 = {(r["doc_id"], r["cluster_id"]) for r in r1["assignments"].collect()}

    r2 = run_dedup_checkpointed(spark, docs, CFG, wd)
    assert r2["runner"].executed == []
    assert set(r2["runner"].skipped) == set(r1["runner"].executed)
    a2 = {(r["doc_id"], r["cluster_id"]) for r in r2["assignments"].collect()}
    assert a1 == a2


def test_crash_mid_pipeline_resumes_from_checkpoint(spark, docs, tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("ckpt"))

    # simulate a crash: run only the first two stages, then "die"
    from clann_spark.operators.signatures import compute_signatures, explode_bands

    runner = StageRunner(spark, wd, CFG)
    sigs = runner.stage(
        "signatures", lambda: compute_signatures(docs, CFG, include_shingles=False).drop("text")
    )
    runner.stage("buckets", lambda: explode_bands(sigs, CFG))
    # (process exits here)

    r = run_dedup_checkpointed(spark, docs, CFG, wd)
    assert r["runner"].skipped == ["signatures", "buckets"]
    assert r["runner"].executed == ["candidates", "verified", "clusters", "assignments"]
    assert r["assignments"].count() == docs.count()


def test_config_change_invalidates_checkpoint(spark, docs, tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("ckpt"))
    run_dedup_checkpointed(spark, docs, CFG, wd)
    r2 = run_dedup_checkpointed(spark, docs, CFG.with_(tau=0.7), wd)
    assert "signatures" in r2["runner"].executed  # fingerprint mismatch -> rebuilt


def test_lineage_records_per_partition_rows(spark, docs, tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("ckpt"))
    r = run_dedup_checkpointed(spark, docs, CFG, wd)
    with open(os.path.join(wd, "_lineage", "signatures.json")) as f:
        li = json.load(f)
    assert li["rows"] == docs.count()
    assert li["n_files"] == len(li["partitions"]) >= 1
    assert sum(p["rows"] for p in li["partitions"]) == li["rows"]
    m = {row["stage"]: row for row in r["metrics"].collect()}
    assert set(m) == {"signatures", "buckets", "candidates", "verified", "clusters", "assignments"}
    assert all(row["wall_ms"] >= 0 for row in m.values())


def test_torn_commit_is_rebuilt(spark, docs, tmp_path_factory):
    """A stage dir without its lineage row (crash between write and
    commit) must be rebuilt, not trusted."""
    wd = str(tmp_path_factory.mktemp("ckpt"))
    run_dedup_checkpointed(spark, docs, CFG, wd)
    os.remove(os.path.join(wd, "_lineage", "candidates.json"))
    r = run_dedup_checkpointed(spark, docs, CFG, wd)
    assert "candidates" in r["runner"].executed
    assert "signatures" in r["runner"].skipped
