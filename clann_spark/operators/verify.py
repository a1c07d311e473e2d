"""Exact verification of candidate pairs.

Two-stage, mirroring the reference's probe path:
  1. cheap sketch prefilter — Hamming distance between 60-bit SimHash
     fingerprints (ref: filterer.hpp:20-32 QuerySketches / :108-111
     threshold), expressed as a bit_count(xor) predicate Catalyst can
     evaluate before the expensive set intersection;
  2. exact Jaccard on the 31-bit shingle-hash sets (ref: the exact
     re-scoring of survivors, collection.hpp:909-920), JVM-side via
     array_intersect/array_union — no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clann_spark.config import DedupConfig

JACCARD_SQL = (
    "size(array_intersect(sh_a, sh_b)) / "
    "cast(size(array_union(sh_a, sh_b)) as double)"
)


def verify_pairs(
    pairs: DataFrame,
    sig_df: DataFrame,
    cfg: DedupConfig,
    keep_below_tau: bool = False,
) -> DataFrame:
    """(a, b) candidates -> (a, b, jaccard) verified pairs.

    sig_df must carry doc_id, shingle_hashes and (if the prefilter is
    enabled) simhash. Joins are plain shuffle hash joins on doc id —
    candidates are a small fraction of the corpus, so Catalyst/AQE
    sizes them; at 100 TB these become shuffle joins against the
    bucketed signature table.
    """
    cols = [F.col("doc_id"), F.col("shingle_hashes")]
    has_simhash = "simhash" in sig_df.columns and cfg.hamming_prefilter is not None
    if has_simhash:
        cols.append(F.col("simhash"))
    s = sig_df.select(*cols)

    j = (
        pairs.join(
            s.select(
                F.col("doc_id").alias("a"),
                F.col("shingle_hashes").alias("sh_a"),
                *([F.col("simhash").alias("sim_a")] if has_simhash else []),
            ),
            "a",
        ).join(
            s.select(
                F.col("doc_id").alias("b"),
                F.col("shingle_hashes").alias("sh_b"),
                *([F.col("simhash").alias("sim_b")] if has_simhash else []),
            ),
            "b",
        )
    )
    if has_simhash:
        j = j.where(F.expr("bit_count(sim_a ^ sim_b)") <= cfg.hamming_prefilter)
    out = j.select("a", "b", F.expr(JACCARD_SQL).alias("jaccard"))
    if not keep_below_tau:
        out = out.where(F.col("jaccard") >= cfg.tau)
    return out
