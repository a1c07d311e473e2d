"""SimHash Hamming-distance near-dup pairs.

The reference uses 1-bit-LSH sketches as a query-time FILTER
(filterer.hpp:20-32); as a standalone dedup operator the fingerprint
becomes the signature itself: pairs with Hamming distance <= t on the
60-bit SimHash.

Scale shape: banded pigeonhole. Split the fingerprint into n_bands
contiguous chunks; any pair with Hamming <= n_bands - 1 shares at
least one identical chunk, so grouping by (band_id, chunk value) has
RECALL 1.0 for t <= n_bands - 1 — a deterministic guarantee, unlike
the probabilistic MinHash banding. Then the exact bit_count(xor)
predicate filters false candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clann_spark.config import SIMHASH_BITS


def simhash_bands_expr(col: str, n_bands: int, bits: int = SIMHASH_BITS) -> str:
    """array of n_bands chunk values (each ~bits/n_bands bits)."""
    width = (bits + n_bands - 1) // n_bands
    mask = (1 << width) - 1
    return (
        f"transform(sequence(0, {n_bands - 1}), "
        f"j -> shiftright({col}, j * {width}) & {mask}L)"
    )


def simhash_near_pairs(
    sig_df: DataFrame,
    max_hamming: int = 4,
    n_bands: int | None = None,
    id_col: str = "doc_id",
    simhash_col: str = "simhash",
) -> DataFrame:
    """(id, simhash) -> (a, b, hamming) pairs with Hamming <= max_hamming.

    n_bands defaults to max_hamming + 1 (the pigeonhole minimum for
    exact recall). Canonical a < b, deduped across bands (U2/J8
    semantics, maxpairbuffer.hpp:64-80).
    """
    n_bands = n_bands or (max_hamming + 1)
    s = sig_df.select(
        F.col(id_col).alias("doc_id"), F.col(simhash_col).alias("simhash")
    )
    b = s.select(
        "doc_id",
        "simhash",
        F.posexplode(F.expr(simhash_bands_expr("simhash", n_bands))).alias(
            "band_id", "chunk"
        ),
    )
    census = b.groupBy("band_id", "chunk").agg(F.count("*").alias("cnt")).where("cnt >= 2")
    nb = b.join(F.broadcast(census), ["band_id", "chunk"])
    left = nb.select("band_id", "chunk", F.col("doc_id").alias("a"), F.col("simhash").alias("sh_a"))
    right = nb.select("band_id", "chunk", F.col("doc_id").alias("b"), F.col("simhash").alias("sh_b"))
    pairs = (
        left.join(right, ["band_id", "chunk"])
        .where("a < b")
        .select("a", "b", F.expr("bit_count(sh_a ^ sh_b)").alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .dropDuplicates(["a", "b"])
    )
    return pairs
