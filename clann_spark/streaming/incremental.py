"""Incremental dedup as a Structured Streaming job.

The reference is batch-only (main.rs runs a sequential query loop;
SURVEY.md §2.9: no streaming operator exists), so this module is the
target-side extension for the "new documents arriving continuously"
deployment: a file-source stream of page batches is matched against
the committed corpus bucket table with the LSH query mode, and matches
land in an append sink.

foreachBatch is the right tool (not a stateful streaming agg): each
micro-batch runs the same deterministic batch operators against corpus
state, so exactly-once comes from the sink's idempotence + the
checkpoint dir, and NO custom streaming state machine is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from clann_spark.config import DedupConfig


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
):
    """Start (and by default drain-and-stop) the incremental-dedup
    stream: parquet page batches in input_dir -> top-k near-dup matches
    per new doc appended to output_dir.

    Returns the StreamingQuery. With available_now=True the query
    processes everything currently in input_dir and stops — the batch
    "catch-up" trigger; pass False for a continuously running micro-
    batch stream.
    """
    from clann_spark.operators.knn import lsh_text_query

    schema = "doc_id long, text string"
    stream = spark.readStream.schema(schema).parquet(input_dir)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        matches = lsh_text_query(batch_df, corpus_sigs, corpus_docs, cfg, k=k)
        matches.write.mode("append").parquet(output_dir)

    writer = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
