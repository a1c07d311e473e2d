"""SimHash Hamming-distance near-dup pairs.

The reference uses 1-bit-LSH sketches as a query-time FILTER
(filterer.hpp:20-32); as a standalone dedup operator the fingerprint
becomes the signature itself: pairs with Hamming distance <= t on the
60-bit SimHash.

Scale shape — two levels, both exact:

  1. VALUE COLLAPSE. Docs are grouped by their full fingerprint first,
     so all banding/pairing below operates on DISTINCT fingerprint
     values, never on docs. This kills the worst real-world skew dead:
     a web corpus where millions of empty/boilerplate docs all hash to
     the same fingerprint contributes ONE value row, not a mega-bucket
     (the round-1 quadratic blowup). Identical-fingerprint doc pairs
     (Hamming 0) are emitted by a separate within-group expansion.

  2. BANDED PIGEONHOLE over values. Split the fingerprint into n_bands
     contiguous chunks; any pair with Hamming <= n_bands - 1 shares at
     least one identical chunk, so grouping values by (band_id, chunk)
     has RECALL 1.0 for t <= n_bands - 1 — a deterministic guarantee,
     unlike the probabilistic MinHash banding. The exact bit_count(xor)
     predicate then removes false candidates.

Remaining quadratic terms are the TRUE output size (a clique of
near-identical-but-distinct fingerprints really has that many pairs);
callers that only need connectivity for clustering should feed these
pairs into connected_components where `mode='anchor'` semantics apply
upstream.
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
    broadcast_limit: int = 4_000_000,
) -> DataFrame:
    """(id, simhash) -> (a, b, hamming) pairs with Hamming <= max_hamming.

    n_bands defaults to max_hamming + 1 (the pigeonhole minimum for
    exact recall). Canonical a < b, deduped across bands (U2/J8
    semantics, maxpairbuffer.hpp:64-80). The census join-back is
    size-gated: broadcast under broadcast_limit rows, shuffle join
    above.
    """
    n_bands = n_bands or (max_hamming + 1)
    s = sig_df.select(
        F.col(id_col).alias("doc_id"), F.col(simhash_col).alias("simhash")
    )

    # level 1: distinct fingerprint values (+ how many docs carry each)
    vals = s.groupBy("simhash").agg(F.count("*").alias("n_docs")).persist()

    # Hamming-0 pairs: all doc pairs within an identical-fingerprint
    # group. This is the true output (every such pair IS a near-dup);
    # the join key is the full 60-bit value, so Spark distributes the
    # groups and AQE splits any skewed one.
    dup_vals = vals.where("n_docs >= 2").select("simhash")
    same = s.join(dup_vals, "simhash")
    identity_pairs = (
        same.select("simhash", F.col("doc_id").alias("a"))
        .join(same.select("simhash", F.col("doc_id").alias("b")), "simhash")
        .where("a < b")
        .select("a", "b", F.lit(0).alias("hamming"))
    )

    # level 2: banded pigeonhole over VALUES
    vb = vals.select(
        "simhash",
        F.posexplode(F.expr(simhash_bands_expr("simhash", n_bands))).alias(
            "band_id", "chunk"
        ),
    )
    census = (
        vb.groupBy("band_id", "chunk").agg(F.count("*").alias("cnt")).where("cnt >= 2")
    ).persist()
    census_gated = (
        F.broadcast(census) if census.count() <= broadcast_limit else census
    )
    nb = vb.join(census_gated, ["band_id", "chunk"])
    left = nb.select("band_id", "chunk", F.col("simhash").alias("va"))
    right = nb.select("band_id", "chunk", F.col("simhash").alias("vb"))
    value_pairs = (
        left.join(right, ["band_id", "chunk"])
        .where("va < vb")
        .select("va", "vb", F.expr("bit_count(va ^ vb)").alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .dropDuplicates(["va", "vb"])
    )

    # expand value pairs to doc pairs (each doc belongs to exactly one
    # value group, so no cross-band dup can reappear here)
    cross_pairs = (
        value_pairs.join(
            s.select(F.col("simhash").alias("va"), F.col("doc_id").alias("ia")), "va"
        )
        .join(s.select(F.col("simhash").alias("vb"), F.col("doc_id").alias("ib")), "vb")
        .select(
            F.least("ia", "ib").alias("a"),
            F.greatest("ia", "ib").alias("b"),
            "hamming",
        )
    )
    return identity_pairs.unionByName(cross_pairs)
