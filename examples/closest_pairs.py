#!/usr/bin/env python
"""Closest-pairs example — the reference's examples/closest-pairs.py
surface (Index.closest_pairs(k, recall)) re-expressed on the Spark
engine: find the global top-k most-similar document pairs with
planner-provisioned recall.

Run: python examples/closest_pairs.py [sf_dir] [k]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from clann_spark.config import DedupConfig
from clann_spark.planner import plan_banding, planned_prefilter
from clann_spark.pipeline import run_dedup
from clann_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    # plan the banding for the design threshold + recall contract
    # (the reference's runtime recall knob, chosen at plan time)
    plan = plan_banding(tau=0.8, target_recall=0.99)
    cfg = DedupConfig(
        signature_impl="fast",
        bands=plan.bands,
        rows_per_band=plan.rows_per_band,
        num_perm=plan.num_perm,
        tau=0.8,
    )
    # J7 sketch prefilter defaults to 'auto' (the planner threshold)
    print(
        f"banding plan: {plan.bands} bands x {plan.rows_per_band} rows, "
        f"recall_at_tau={plan.recall_at_tau:.6f}"
    )

    spark = get_spark("closest-pairs-example", master="local[4]", shuffle_partitions=8)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    res = run_dedup(docs, cfg)

    # global top-k pairs (A3 pair-buffer analog: TakeOrderedAndProject)
    top = (
        res.verified.orderBy(F.desc("jaccard"), F.asc("a"), F.asc("b"))
        .limit(k)
        .collect()
    )
    print(f"top-{k} most-similar pairs (exact Jaccard):")
    for r in top:
        print(f"  ({r['a']}, {r['b']})  jaccard={r['jaccard']:.4f}")

    summary = res.assignments.agg(
        F.count("*").alias("docs"), F.countDistinct("cluster_id").alias("clusters")
    ).first()
    print(f"corpus: {summary['docs']} docs -> {summary['clusters']} clusters")
    spark.stop()


if __name__ == "__main__":
    main()
