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
    broadcast_limit: int | None = None,
    emit: str = "clique",
    anchor_threshold: int = 64,
) -> DataFrame:
    """(id, simhash) -> (a, b, hamming) pairs with Hamming <= max_hamming.

    n_bands defaults to max_hamming + 1 (the pigeonhole minimum for
    exact recall). Canonical a < b, deduped across bands (U2/J8
    semantics, maxpairbuffer.hpp:64-80).

    Round-6 plan shape: VALUE pairs stream join-free from suffix-slice
    generators over per-(band_id, chunk) sorted value arrays — the old
    census aggregation + size-gated broadcast + (band, chunk) SELF-join
    (54 Exchange nodes, one extra blocking census job) are gone. In
    clique mode identity pairs and doc expansion also stream from
    per-value sorted doc arrays (the corpus projection is scanned
    ONCE); the O(m) arrays are dominated by clique's O(m^2) output. In
    anchor/auto modes doc expansion stays join-based and ARRAY-FREE so
    identity mega-groups never collapse into one aggregation buffer.
    broadcast_limit is accepted for API compatibility but unused: no
    census broadcast exists at any size (expansion joins are sized by
    Catalyst/AQE at runtime).

    emit: 'clique' (every true pair — the oracle contract), 'anchor'
    (CC-connectivity edges only: min-doc anchors within identity
    groups, one representative edge per cross-value pair), or 'auto'
    (clique while the expansion stays under anchor_threshold, anchor
    above — pair-complete where it matters, linear where a boilerplate
    mega-group would emit O(m^2)).
    """
    if emit not in ("clique", "anchor", "auto"):
        raise ValueError(f"unknown emit mode {emit!r}")
    n_bands = n_bands or (max_hamming + 1)
    s = sig_df.select(
        F.col(id_col).alias("doc_id"), F.col(simhash_col).alias("simhash")
    )

    # level 1: one value-collapse aggregation. In CLIQUE mode (the
    # oracle contract) each distinct fingerprint also keeps its sorted
    # member-doc array: identity pairs and the doc expansion then read
    # ONLY this table — the corpus projection `s` is scanned exactly
    # once per run, where the round-1..5 shape re-scanned it ~5x (two
    # identity self-join sides + two expansion join sides). The O(m)
    # array for an m-doc identity group is dominated by clique mode's
    # own O(m^2) output, so this adds no new scale cliff — callers that
    # must survive boilerplate mega-groups use anchor/auto, which stay
    # ARRAY-FREE (distributed joins, O(m) output, O(1)/row residence).
    # Persisted + counted once: the barrier fills the cache before its
    # consumers race (replaces the old census.count() barrier).
    with_docs = emit == "clique"
    aggs = [F.count("*").alias("n_docs"), F.min("doc_id").alias("rep")]
    if with_docs:
        aggs.append(F.array_sort(F.collect_list("doc_id")).alias("docs"))
    vals = s.groupBy("simhash").agg(*aggs).persist()
    vals.count()

    # Hamming-0 pairs within an identical-fingerprint group. clique:
    # all doc pairs, streamed join-free from the suffix-slice generator
    # (docs sorted -> a < b is positional). anchor: m-1 distributed
    # (rep, doc) edges — same CC connectivity in O(m).
    dup_vals = vals.where("n_docs >= 2")
    identity_parts = []
    if emit == "clique":
        e = dup_vals.select(F.posexplode("docs").alias("_i", "a"), "docs").select(
            "a", F.expr("slice(docs, _i + 2, size(docs) - _i - 1)").alias("_rest")
        )
        identity_parts.append(
            e.select("a", F.explode("_rest").alias("b"), F.lit(0).alias("hamming"))
        )
    else:
        if emit == "auto":
            cliq_vals = dup_vals.where(
                F.col("n_docs") <= anchor_threshold
            ).select("simhash")
            same = s.join(cliq_vals, "simhash")
            identity_parts.append(
                same.select("simhash", F.col("doc_id").alias("a"))
                .join(same.select("simhash", F.col("doc_id").alias("b")), "simhash")
                .where("a < b")
                .select("a", "b", F.lit(0).alias("hamming"))
            )
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

    # level 2: banded pigeonhole over VALUES, join-free. Group the
    # (band_id, chunk) buckets to sorted value arrays; value pairs
    # stream from the suffix-slice generator (va < vb free), far pairs
    # die on the exact bit_count predicate, and the cross-band distinct
    # sees only survivors. The value table is the DISTINCT-fingerprint
    # set, so a boilerplate mega-group is ONE array element here.
    vb = vals.select(
        "simhash",
        F.posexplode(F.expr(simhash_bands_expr("simhash", n_bands))).alias(
            "band_id", "chunk"
        ),
    )
    g = (
        vb.groupBy("band_id", "chunk")
        .agg(F.array_sort(F.collect_list("simhash")).alias("vs"))
        .where(F.size("vs") >= 2)
    )
    ve = g.select(F.posexplode("vs").alias("_i", "va"), "vs").select(
        "va", F.expr("slice(vs, _i + 2, size(vs) - _i - 1)").alias("_rest")
    )
    value_pairs = (
        ve.select("va", F.explode("_rest").alias("vb"))
        .select("va", "vb", F.expr("bit_count(va ^ vb)").alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .dropDuplicates(["va", "vb"])
    )

    # expand value pairs to doc pairs (each doc belongs to exactly one
    # value group, so no cross-band dup can reappear here). clique:
    # full na x nb expansion (true output). anchor: ONE representative
    # edge per value pair — groups are internally connected by the
    # identity edges, so one bridge suffices for CC. auto: full
    # expansion while na*nb <= anchor_threshold, bridge above. Join
    # strategies are left to Catalyst/AQE (value pairs are usually tiny
    # — broadcast; shuffle joins at scale).
    a_cols = [F.col("simhash").alias("va"), F.col("n_docs").alias("na"),
              F.col("rep").alias("ra")]
    b_cols = [F.col("simhash").alias("vb"), F.col("n_docs").alias("nb"),
              F.col("rep").alias("rb")]
    if with_docs:
        a_cols.append(F.col("docs").alias("docs_a"))
        b_cols.append(F.col("docs").alias("docs_b"))
    vp = value_pairs.join(vals.select(*a_cols), "va").join(
        vals.select(*b_cols), "vb"
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
        if with_docs:
            # clique: expand from the vals arrays — no corpus re-join
            cross_parts.append(
                full.select("hamming", F.explode("docs_a").alias("ia"), "docs_b")
                .select("hamming", "ia", F.explode("docs_b").alias("ib"))
                .select(
                    F.least("ia", "ib").alias("a"),
                    F.greatest("ia", "ib").alias("b"),
                    "hamming",
                )
            )
        else:
            cross_parts.append(
                full.select("va", "vb", "hamming")
                .join(
                    s.select(
                        F.col("simhash").alias("va"), F.col("doc_id").alias("ia")
                    ),
                    "va",
                )
                .join(
                    s.select(
                        F.col("simhash").alias("vb"), F.col("doc_id").alias("ib")
                    ),
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
    from clann_spark.session import track_cache

    # register the value table so long-lived callers can release it
    # (session.unpersist_intermediates); one-shot queries just let the
    # session end
    return track_cache(out, vals)
