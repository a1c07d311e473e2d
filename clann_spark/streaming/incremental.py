"""Incremental dedup as a Structured Streaming job.

The reference is batch-only (main.rs runs a sequential query loop;
SURVEY.md §2.9: no streaming operator exists), so this module is the
target-side extension for the "new documents arriving continuously"
deployment: a file-source stream of page batches is matched against
the committed corpus (bucket table + accepted-stream state) with the
LSH query mode.

Exactly-once contract: foreachBatch is at-least-once per batch_id, so
BOTH sinks are made idempotent by writing each micro-batch to its own
batch_id-derived directory with mode('overwrite') — a retried batch
replaces its own output rather than appending a duplicate. The state
read excludes the current batch_id, so a retry observes exactly the
state the failed attempt observed.

State update: new docs whose best match is BELOW tau are "accepted"
into the corpus — their (doc_id, text, bands) rows land in
state_dir/batch=<id> and later batches dedup against them (the
reference's insert-then-rebuild lifecycle, collection.hpp:218-222 /
:241-306, re-expressed as an append-only bucket-state table).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clann_spark.config import DedupConfig

STATE_SCHEMA = "doc_id long, text string, bands array<bigint>"


def _read_state(spark: SparkSession, state_dir: str, before_batch: int) -> DataFrame | None:
    """Union of accepted-doc state from every batch BEFORE before_batch
    (excluding it makes retries deterministic)."""
    if not os.path.isdir(state_dir):
        return None
    dirs = [
        os.path.join(state_dir, d)
        for d in sorted(os.listdir(state_dir))
        if d.startswith("batch=") and int(d.split("=")[1]) < before_batch
        and os.path.exists(os.path.join(state_dir, d, "_SUCCESS"))
    ]
    if not dirs:
        return None
    return spark.read.schema(STATE_SCHEMA).parquet(*dirs)


def stream_dedup_query(
    spark: SparkSession,
    input_dir: str,
    corpus_sigs: DataFrame,
    corpus_docs: DataFrame,
    cfg: DedupConfig,
    output_dir: str,
    checkpoint_dir: str,
    k: int = 5,
    available_now: bool = True,
    state_dir: str | None = None,
):
    """Start (and by default drain-and-stop) the incremental-dedup
    stream: parquet page batches in input_dir -> top-k near-dup matches
    per new doc in output_dir/batch=<id>.

    With state_dir set, accepted (non-duplicate) docs join the corpus
    state and later batches dedup against them too. Returns the
    StreamingQuery. available_now=True processes everything currently
    in input_dir and stops (batch catch-up); False runs continuously.
    """
    from clann_spark.operators.knn import lsh_text_query
    from clann_spark.operators.signatures import compute_signatures

    schema = "doc_id long, text string"
    stream = spark.readStream.schema(schema).parquet(input_dir)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_df = batch_df.persist()
        q_sigs = compute_signatures(
            batch_df, cfg, include_shingles=False, include_sig=False
        ).persist()

        all_sigs = corpus_sigs.select("doc_id", "bands")
        all_docs = corpus_docs.select("doc_id", "text")
        state = _read_state(spark, state_dir, batch_id) if state_dir else None
        if state is not None:
            all_sigs = all_sigs.unionByName(state.select("doc_id", "bands"))
            all_docs = all_docs.unionByName(state.select("doc_id", "text"))

        matches = lsh_text_query(
            batch_df, all_sigs, all_docs, cfg, k=k,
            query_sigs=q_sigs.select("doc_id", "bands"),
        ).persist()
        # idempotent sink: a retried batch overwrites its own directory
        matches.write.mode("overwrite").parquet(f"{output_dir}/batch={batch_id}")

        if state_dir:
            dup_ids = (
                matches.where(F.col("jaccard") >= cfg.tau)
                .select(F.col("query_id").alias("doc_id"))
                .distinct()
            )
            accepted = q_sigs.select("doc_id", "text", "bands").join(
                dup_ids, "doc_id", "left_anti"
            )
            accepted.write.mode("overwrite").parquet(f"{state_dir}/batch={batch_id}")
        matches.unpersist()
        q_sigs.unpersist()
        batch_df.unpersist()

    writer = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
