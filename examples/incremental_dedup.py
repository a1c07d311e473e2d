#!/usr/bin/env python
"""Incremental dedup example — new document batches streamed against a
built corpus (the reference's insert/search lifecycle as Structured
Streaming): matches land per batch, accepted docs join the corpus
state so later batches dedup against them.

Run: python examples/incremental_dedup.py [workdir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clann_spark.config import DedupConfig
from clann_spark.operators.signatures import compute_signatures
from clann_spark.session import get_spark
from clann_spark.streaming.incremental import stream_dedup_query


def main() -> None:
    workdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="incdedup-")
    cfg = DedupConfig(signature_impl="fast")
    spark = get_spark("incremental-example", master="local[4]", shuffle_partitions=8)

    corpus = spark.createDataFrame(
        [(i, f"corpus page number {i} with stable body text repeated " * 6)
         for i in range(100)],
        "doc_id long, text string",
    ).cache()
    sigs = compute_signatures(corpus, cfg, include_shingles=False, include_sig=False)
    sigs = sigs.select("doc_id", "bands").cache()
    sigs.count()

    in_dir = os.path.join(workdir, "incoming")
    os.makedirs(in_dir, exist_ok=True)
    batch = spark.createDataFrame(
        [(1007, "corpus page number 7 with stable body text repeated " * 6),
         (9001, "an entirely new page about something else altogether " * 6)],
        "doc_id long, text string",
    )
    batch.coalesce(1).write.mode("append").parquet(in_dir)

    q = stream_dedup_query(
        spark, in_dir, sigs, corpus, cfg,
        output_dir=os.path.join(workdir, "matches"),
        checkpoint_dir=os.path.join(workdir, "ckpt"),
        state_dir=os.path.join(workdir, "state"),
    )
    q.awaitTermination(120)

    out = spark.read.parquet(os.path.join(workdir, "matches"))
    print("matches:")
    for r in out.orderBy("query_id", "rank").collect():
        print(f"  query {r['query_id']} -> doc {r['doc_id']} "
              f"jaccard={r['jaccard']:.3f} rank={r['rank']}")
    state = spark.read.parquet(os.path.join(workdir, "state"))
    print("accepted into corpus state:", [r["doc_id"] for r in state.collect()])
    spark.stop()


if __name__ == "__main__":
    main()
