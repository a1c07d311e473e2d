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

Quadratic clique output is the TRUE pair set (every pair in a group of
near-identical fingerprints IS a near-dup), but callers that only need
CC connectivity can pass emit='anchor' (or 'auto'): identity groups
emit m-1 min-doc anchor edges instead of m(m-1)/2 pairs, and large
cross-value expansions emit one representative edge per value pair —
mirroring candidates.py pair modes. Final clusters are identical
(tests/test_simhash_dedup.py); emit='clique' stays the oracle contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clann_spark.config import SIMHASH_BITS, DedupConfig


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
    broadcast_limit: int | None = None,
    emit: str = "clique",
    anchor_threshold: int = 64,
) -> DataFrame:
    """(id, simhash) -> (a, b, hamming) pairs with Hamming <= max_hamming.

    n_bands defaults to max_hamming + 1 (the pigeonhole minimum for
    exact recall). Canonical a < b, deduped across bands (U2/J8
    semantics, maxpairbuffer.hpp:64-80). The census join-back is
    size-gated: broadcast under broadcast_limit rows (default: the
    DedupConfig.broadcast_limit knob), shuffle join above.

    emit: 'clique' (every true pair — the oracle contract), 'anchor'
    (CC-connectivity edges only: min-doc anchors within identity
    groups, one representative edge per cross-value pair), or 'auto'
    (clique while the expansion stays under anchor_threshold, anchor
    above — pair-complete where it matters, linear where a boilerplate
    mega-group would emit O(m^2)).
    """
    if emit not in ("clique", "anchor", "auto"):
        raise ValueError(f"unknown emit mode {emit!r}")
    if broadcast_limit is None:
        broadcast_limit = DedupConfig().broadcast_limit
    n_bands = n_bands or (max_hamming + 1)
    s = sig_df.select(
        F.col(id_col).alias("doc_id"), F.col(simhash_col).alias("simhash")
    )

    # level 1: distinct fingerprint values (+ how many docs carry each,
    # + the group's min doc id — the anchor / representative)
    vals = (
        s.groupBy("simhash")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("rep"))
        .persist()
    )

    # Hamming-0 pairs within an identical-fingerprint group. clique:
    # all doc pairs (the true output; the join key is the full 60-bit
    # value, so Spark distributes the groups and AQE splits skew).
    # anchor: m-1 edges (rep, doc) — same CC connectivity in O(m).
    dup_vals = vals.where("n_docs >= 2")
    if emit == "clique":
        cliq_vals = dup_vals.select("simhash")
    elif emit == "auto":
        cliq_vals = dup_vals.where(F.col("n_docs") <= anchor_threshold).select("simhash")
    else:
        cliq_vals = None
    identity_parts = []
    if cliq_vals is not None:
        same = s.join(cliq_vals, "simhash")
        identity_parts.append(
            same.select("simhash", F.col("doc_id").alias("a"))
            .join(same.select("simhash", F.col("doc_id").alias("b")), "simhash")
            .where("a < b")
            .select("a", "b", F.lit(0).alias("hamming"))
        )
    if emit != "clique":
        anch_vals = (
            dup_vals
            if emit == "anchor"
            else dup_vals.where(F.col("n_docs") > anchor_threshold)
        ).select("simhash", "rep")
        identity_parts.append(
            s.join(anch_vals, "simhash")
            .where(F.col("doc_id") != F.col("rep"))
            .select(
                F.least("rep", "doc_id").alias("a"),
                F.greatest("rep", "doc_id").alias("b"),
                F.lit(0).alias("hamming"),
            )
        )
    identity_pairs = identity_parts[0]
    for extra in identity_parts[1:]:
        identity_pairs = identity_pairs.unionByName(extra)

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
    # value group, so no cross-band dup can reappear here). clique:
    # full na x nb expansion (true output). anchor: ONE representative
    # edge per value pair — groups are internally connected by the
    # identity edges, so one bridge suffices for CC. auto: full
    # expansion while na*nb <= anchor_threshold, bridge above.
    vp = value_pairs.join(
        vals.select(
            F.col("simhash").alias("va"),
            F.col("n_docs").alias("na"),
            F.col("rep").alias("ra"),
        ),
        "va",
    ).join(
        vals.select(
            F.col("simhash").alias("vb"),
            F.col("n_docs").alias("nb"),
            F.col("rep").alias("rb"),
        ),
        "vb",
    )
    cross_parts = []
    if emit == "clique":
        full, bridged = vp, None
    elif emit == "anchor":
        full, bridged = None, vp
    else:
        gate = F.col("na") * F.col("nb") <= anchor_threshold
        full, bridged = vp.where(gate), vp.where(~gate)
    if full is not None:
        cross_parts.append(
            full.select("va", "vb", "hamming")
            .join(
                s.select(F.col("simhash").alias("va"), F.col("doc_id").alias("ia")),
                "va",
            )
            .join(
                s.select(F.col("simhash").alias("vb"), F.col("doc_id").alias("ib")),
                "vb",
            )
            .select(
                F.least("ia", "ib").alias("a"),
                F.greatest("ia", "ib").alias("b"),
                "hamming",
            )
        )
    if bridged is not None:
        cross_parts.append(
            bridged.select(
                F.least("ra", "rb").alias("a"),
                F.greatest("ra", "rb").alias("b"),
                "hamming",
            )
        )
    out = identity_pairs
    for part in cross_parts:
        out = out.unionByName(part)
    return out
