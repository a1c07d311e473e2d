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

Intra-batch duplicates: docs arriving in the SAME micro-batch are
deduped against each other first (band self-join + exact verify,
canonical a < b): the later copy gets a match row pointing at the
earlier one and is NOT accepted into state. Without this, availableNow
backfills (one giant batch) would admit every duplicate.

State compaction: every compact_every batches the accumulated
batch=<id> directories are rewritten into a single base-<upto>
directory (idempotent: fixed target dir + overwrite + _SUCCESS gate),
so the per-batch read fan-in is bounded by compact_every instead of
growing with stream lifetime.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clann_spark.config import DedupConfig
from clann_spark.sources.fs import fs_for

STATE_SCHEMA = "doc_id long, text string, bands array<bigint>"


def _state_parts(spark: SparkSession, state_dir: str, before_batch: int) -> list[str]:
    """Committed state directories covering batches < before_batch:
    the newest base-<upto> (upto <= before_batch) plus every
    batch=<id> with upto <= id < before_batch.

    All listing/exists checks go through fs_for — os/shutil for plain
    local paths, the JVM Hadoop FileSystem API for any URI scheme
    (file://, hdfs://, s3a://), so the state dir can live wherever the
    stream's sink does."""
    fs = fs_for(spark, state_dir)
    if not fs.isdir(state_dir):
        return []
    names = fs.listdir(state_dir)
    bases = sorted(
        int(d.split("-")[1])
        for d in names
        if d.startswith("base-")
        and int(d.split("-")[1]) <= before_batch
        and fs.exists(os.path.join(state_dir, d, "_SUCCESS"))
    )
    upto = bases[-1] if bases else 0
    parts = [os.path.join(state_dir, f"base-{upto}")] if bases else []
    parts += [
        os.path.join(state_dir, d)
        for d in sorted(names)
        if d.startswith("batch=")
        and upto <= int(d.split("=")[1]) < before_batch
        and fs.exists(os.path.join(state_dir, d, "_SUCCESS"))
    ]
    return parts


def _read_state(spark: SparkSession, state_dir: str, before_batch: int) -> DataFrame | None:
    parts = _state_parts(spark, state_dir, before_batch)
    if not parts:
        return None
    return spark.read.schema(STATE_SCHEMA).parquet(*parts)


def _check_state_meta(spark: SparkSession, state_dir: str, cfg: DedupConfig) -> None:
    """Guard the state layout against hash-space drift: band values
    written by a different fast-path HASH_IMPL_VERSION (or another
    config) never collide with the current one, so a stale state dir
    would silently produce zero candidates. Refuse loudly instead."""
    import json

    from clann_spark.sources.stages import _config_fingerprint

    fs = fs_for(spark, state_dir)
    meta_path = os.path.join(state_dir, "_meta.json")
    want = {"config_fingerprint": _config_fingerprint(cfg)}
    if fs.exists(meta_path):
        have = json.loads(fs.read_text(meta_path))
        if have != want:
            raise ValueError(
                f"streaming state at {state_dir} was written under a different "
                f"config/hash-impl fingerprint ({have} != {want}); delete the "
                "state_dir (and checkpoint) to rebuild, or run the old config"
            )
        return
    fs.mkdirs(state_dir)
    fs.write_text(meta_path, json.dumps(want))


def _compact_state(
    spark: SparkSession, state_dir: str, batch_id: int, compact_every: int
) -> None:
    """Rewrite base + batch dirs < batch_id into base-<batch_id> once
    the batch-dir fan-in reaches compact_every. Idempotent: the target
    name is a pure function of batch_id, written with overwrite; a
    retried batch that already committed its base skips the rewrite.
    Old dirs are removed only after the new base's _SUCCESS exists —
    readers pick the newest committed base, so a crash between write
    and cleanup leaves a consistent (merely redundant) layout.

    Filesystem ops route through fs_for: os/shutil locally, the JVM
    Hadoop FileSystem API for any URI scheme (HDFS/S3/file://)."""
    fs = fs_for(spark, state_dir)
    target = os.path.join(state_dir, f"base-{batch_id}")
    parts = _state_parts(spark, state_dir, batch_id)
    n_batch_dirs = sum("batch=" in p for p in parts)
    if n_batch_dirs < compact_every:
        return
    if not fs.exists(os.path.join(target, "_SUCCESS")):
        df = spark.read.schema(STATE_SCHEMA).parquet(*parts)
        df.write.mode("overwrite").parquet(target)
    # cleanup: everything the new base covers
    for p in parts:
        if not fs.same_path(p, target):
            fs.delete_recursive(p)


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
    compact_every: int = 16,
    accept_duplicates: bool = False,
    max_files_per_trigger: int | None = None,
):
    """Start (and by default drain-and-stop) the incremental-dedup
    stream: parquet page batches in input_dir -> top-k near-dup matches
    per new doc in output_dir/batch=<id>.

    With state_dir set, accepted (non-duplicate) docs join the corpus
    state and later batches dedup against them too. Returns the
    StreamingQuery. available_now=True processes everything currently
    in input_dir and stops (batch catch-up); False runs continuously.

    accept_duplicates=True is ARCHIVE mode: every doc joins the state,
    duplicates included (building a dup-map over an archive instead of
    filtering an incoming feed). Because each arriving doc is then
    matched against ALL earlier docs, every verified pair (a, b) is
    discovered exactly once — when its later member arrives — so, with
    k at least the largest cluster size, connected components over the
    streamed match edges equal the batch pipeline's clusters REGARDLESS
    of arrival order (the filtering default can split transitive
    chains whose hub is rejected from state before a spoke arrives).
    max_files_per_trigger caps files per micro-batch (file-source
    option), pinning a deterministic batch split for tests/oracles.
    """
    from clann_spark.operators.candidates import candidate_pairs
    from clann_spark.operators.knn import lsh_text_query
    from clann_spark.operators.signatures import compute_signatures, explode_bands
    from clann_spark.operators.verify import verify_pairs_from_text
    from clann_spark.session import unpersist_intermediates

    schema = "doc_id long, text string"
    if state_dir:
        _check_state_meta(spark, state_dir, cfg)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_df = batch_df.persist()
        q_sigs = compute_signatures(
            batch_df, cfg, include_shingles=False, include_sig=False, drop_text=True
        ).persist()

        # intra-batch dedup FIRST: duplicates arriving within one
        # micro-batch (the whole backfill, under availableNow) must be
        # caught before corpus matching. Canonical a < b: the later
        # copy is the duplicate of the earlier.
        intra = verify_pairs_from_text(
            candidate_pairs(explode_bands(q_sigs, cfg), cfg, mode="clique"),
            batch_df,
            cfg,
        ).persist()
        intra_dup_ids = intra.select(F.col("b").alias("doc_id")).distinct()

        all_sigs = corpus_sigs.select("doc_id", "bands")
        all_docs = corpus_docs.select("doc_id", "text")
        state = _read_state(spark, state_dir, batch_id) if state_dir else None
        if state is not None:
            all_sigs = all_sigs.unionByName(state.select("doc_id", "bands"))
            all_docs = all_docs.unionByName(state.select("doc_id", "text"))

        corpus_matches = lsh_text_query(
            batch_df, all_sigs, all_docs, cfg, k=k,
            query_sigs=q_sigs.select("doc_id", "bands"),
        )
        # intra-batch matches appear in the output too (the later copy
        # points at the earlier); rank joins after the corpus ranks
        intra_matches = intra.select(
            F.col("b").alias("query_id"),
            F.col("a").alias("doc_id"),
            "jaccard",
            F.lit(0).cast("long").alias("rank"),
        )
        matches = corpus_matches.unionByName(intra_matches).persist()
        # idempotent sink: a retried batch overwrites its own directory
        matches.write.mode("overwrite").parquet(f"{output_dir}/batch={batch_id}")

        if state_dir:
            # q_sigs is slim (text never crossed the Arrow stage); graft
            # the original batch text back on for the state table. The
            # join is batch-scale, not corpus-scale.
            accepted = batch_df.join(q_sigs.select("doc_id", "bands"), "doc_id")
            if not accept_duplicates:
                dup_ids = (
                    matches.where(F.col("jaccard") >= cfg.tau)
                    .select(F.col("query_id").alias("doc_id"))
                    .distinct()
                )
                accepted = accepted.join(
                    dup_ids.unionByName(intra_dup_ids).distinct(), "doc_id", "left_anti"
                )
            accepted.write.mode("overwrite").parquet(f"{state_dir}/batch={batch_id}")
            _compact_state(spark, state_dir, batch_id, compact_every)
        # release every cache this batch registered (corpus_matches'
        # verify/q_bucket caches included) — a continuous stream would
        # otherwise accumulate executor storage without bound
        unpersist_intermediates(corpus_matches)
        unpersist_intermediates(intra)
        matches.unpersist()
        intra.unpersist()
        q_sigs.unpersist()
        batch_df.unpersist()

    writer = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
