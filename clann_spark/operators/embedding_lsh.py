"""Embedding-space near-duplicate pair generation via banded
random-hyperplane LSH — the reference's core competency re-expressed
for the embedding column.

Reference parity: SimHash over VECTORS, i.e. the sign of the dot
product with seeded Gaussian hyperplanes
(libpuffinn/include/puffinn/hash/simhash.hpp:41-45, sampling :17-23),
L independent concatenated tables (hash_source/independent.hpp:19-86),
pair generation within equal-hash segments (collection.hpp:390-504).
Here: one batched `(X @ R) >= 0` per Arrow batch, bit-packed into b
band values of r bits; the bucket rows feed the SAME salted-census
candidate machinery as MinHash bands, and survivors are exactly
re-scored with the fold-summed cosine (the DuckDB-oracle-identical
expression).

Recall contract: plan-time, not adaptive — choose (b, r) with
clann_spark.planner.plan_hyperplane_banding so
1-(1-p^r)^b >= target_recall at the design threshold, where
p = 1 - acos(tau)/pi (simhash.hpp:96-102). Skewed buckets (low-entropy
band values — r-bit band spaces are small by construction) are salted
by the shared candidate_pairs machinery; cross-band redundancy restores
pair recall across salt groups exactly as for MinHash bands.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from clann_spark.config import DedupConfig

#: fold-summed cosine between two float arrays va/vb, bit-identical to
#: the DuckDB oracle's list_sum/list_transform formulation
COS_SQL = (
    "aggregate(zip_with(va, vb, (x, y) -> cast(x as double) * cast(y as double)), 0D,"
    " (acc, v) -> acc + v) / "
    "(sqrt(aggregate(va, 0D, (acc, x) -> acc + cast(x as double) * cast(x as double))) * "
    "sqrt(aggregate(vb, 0D, (acc, x) -> acc + cast(x as double) * cast(x as double))))"
)


def hyperplane_bands_udf(bands: int, rows_per_band: int, seed: int = 42):
    """embedding -> array<long> of b band values (r packed sign bits
    each). The Gaussian plane matrix is drawn lazily from each Arrow
    batch's dim, with the rng KEYED BY (seed, dim): every executor,
    retry, task and cluster size derives identical planes for a given
    dim (simhash.hpp:17-23 sampling, made deterministic) and the caller
    never runs a driver-side job just to learn the embedding dim.

    Mixed-dim columns (ADVICE r4): a per-task "dim changed" raise was
    best-effort — dims split across tasks would each re-draw planes
    from the same un-keyed seed and hash unrelated spaces without ever
    raising. Keying the draw by dim makes every task hash a given dim
    identically, and folding the dim into the band value puts different
    dims in disjoint bucket spaces — the only coherent semantics, since
    vectors of different dims have no cosine and can never be a pair."""
    if rows_per_band >= 63:
        raise ValueError("rows_per_band must leave the int64 sign bit free")
    # dim tag placement: disjoint spaces cost 14 bits above the sign
    # bits. r <= 48 keeps the historical tag at bit 48; 49 <= r <= 62
    # has no disjoint room left, so the dim is mixed in by XORing a
    # dim-keyed splitmix constant instead (cross-dim band collision
    # ~2^-r — still never a systematic collision, and the previously
    # valid wide-r config space keeps working).
    tag_shift = 48 if rows_per_band <= 48 else None
    weights = (1 << np.arange(rows_per_band, dtype=np.int64))[None, None, :]
    state: dict = {}

    def _vals_for_dim(x: np.ndarray) -> np.ndarray:
        dim = x.shape[1]
        if dim >= 1 << 14:
            raise ValueError(f"embedding dim {dim} >= 16384 unsupported")
        planes = state.get(dim)
        if planes is None:
            # the draw is a pure function of (seed, dim): identical on
            # every task/executor/retry, and bit-identical to a draw
            # that never saw any other dim
            planes = np.random.default_rng(seed).standard_normal(
                (dim, bands * rows_per_band)
            )
            state[dim] = planes
        bits = (x @ planes >= 0).reshape(len(x), bands, rows_per_band)
        vals = (bits * weights).sum(axis=2)
        # disjoint band spaces per dim (r sign bits below the tag):
        # same-dim pairs unaffected; cross-dim band collisions — which
        # could only waste verify work or split same-dim mega-buckets
        # differently — become impossible (or ~2^-r for wide r, where
        # the dim is splitmix-XOR-mixed instead)
        if tag_shift is not None:
            return vals + (np.int64(dim) << np.int64(tag_shift))
        from clann_spark.functions.hashing import _splitmix_step

        const = _splitmix_step(np.array([dim], dtype=np.uint64))[0]
        return (vals.view(np.uint64) ^ const).view(np.int64)

    @F.pandas_udf(ArrayType(LongType()))
    def _bands(vecs: pd.Series) -> pd.Series:
        return _grouped_by_dim(vecs, _vals_for_dim)

    # the function is pure, but the marker stops the optimizer from
    # duplicating the evaluation below pushed-down filters (the
    # posexplode's implicit size()>0 filter produced TWO ArrowEvalPython
    # nodes for one UDF call — guide §4.4 pattern, seen in the round-6
    # plan audit)
    return _bands.asNondeterministic()


def _grouped_by_dim(vecs: pd.Series, fn) -> pd.Series:
    """Apply fn((n, dim) float64 matrix -> (n, bands) int64) per
    distinct row length in the Arrow batch. Single-dim batches (the
    normal case) take one vstack; mixed-dim batches — Arrow happily
    packs ragged lists — are split by length so each dim hashes in its
    own keyed space instead of crashing the vstack (ADVICE r4)."""
    if len(vecs) == 0:
        return pd.Series([], dtype=object)
    arr = vecs.to_numpy()
    lens = np.fromiter((len(v) for v in arr), dtype=np.int64, count=len(arr))
    dims = np.unique(lens)
    if dims.size == 1:
        return pd.Series(list(fn(np.vstack(arr).astype(np.float64, copy=False))))
    out = np.empty(len(arr), dtype=object)
    for dim in dims:
        idx = np.nonzero(lens == dim)[0]
        vals = fn(np.vstack([arr[i] for i in idx]).astype(np.float64, copy=False))
        for j, i in enumerate(idx):
            out[i] = vals[j]
    return pd.Series(list(out))


def crosspolytope_bands_udf(bands: int, rows_per_band: int, seed: int = 42):
    """embedding -> array<long> of b band values, each a splitmix fold
    of r cross-polytope codes (H6, crosspolytope.hpp:121-209 — three
    ±1-diagonal x FHT rounds, argmax-axis+sign encoding). One CP
    function carries log2(2*dpad) bits, so bands need far fewer
    functions than hyperplane bands at equal selectivity. Diagonals
    are derived lazily from the first batch's dim (seeded — identical
    on every executor), like hyperplane_bands_udf."""
    from clann_spark.functions.crosspolytope import cp_codes, cp_diagonals, next_pow2
    from clann_spark.functions.hashing import _splitmix_step

    state: dict = {}

    def _vals_for_dim(x: np.ndarray) -> np.ndarray:
        dim = x.shape[1]
        dim = int(dim)
        if dim >= 1 << 14:
            raise ValueError(f"embedding dim {dim} >= 16384 unsupported")
        diagonals = state.get(dim)
        if diagonals is None:
            # pure function of (seed, dim) — identical across tasks, so
            # mixed-dim columns hash each dim consistently (ADVICE r4)
            diagonals = cp_diagonals(bands * rows_per_band, next_pow2(dim), seed)
            state[dim] = diagonals
        codes = cp_codes(x, diagonals).astype(np.uint64).reshape(
            len(x), bands, rows_per_band
        )
        acc = np.full((len(x), bands), 0x243F6A8885A308D3, dtype=np.uint64)
        acc ^= np.arange(bands, dtype=np.uint64)[None, :] * np.uint64(0x100000001B3)
        for j in range(rows_per_band):
            acc = _splitmix_step(acc ^ codes[:, :, j])
        # 46 fold bits + an explicit dim tag at bit 46. The tag is NOT
        # redundant with the keyed diagonal draw: dims sharing
        # next_pow2(dim) get IDENTICAL diagonals, so a padded vector
        # whose trailing components are ~0 produces the same CP codes
        # as its shorter-dim prefix — a systematic (not 2^-60)
        # cross-dim collision. The tag makes dim spaces disjoint;
        # same-dim selectivity at 2^46 band space is unaffected.
        return (
            (acc >> np.uint64(18)) | (np.uint64(dim) << np.uint64(46))
        ).astype(np.int64)

    @F.pandas_udf(ArrayType(LongType()))
    def _bands(vecs: pd.Series) -> pd.Series:
        return _grouped_by_dim(vecs, _vals_for_dim)

    # pure function; marker prevents double evaluation under pushed
    # filters (guide §4.4) — see hyperplane_bands_udf
    return _bands.asNondeterministic()


def embedding_buckets(
    emb: DataFrame,
    bands: int,
    rows_per_band: int,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    hash_family: str = "hyperplane",
) -> DataFrame:
    """(id, embedding) -> exploded (doc_id, band_id, band_hash) bucket
    rows, shaped exactly like signatures.explode_bands output so the
    candidate machinery is shared. hash_family: 'hyperplane' (H1 over
    vectors) or 'crosspolytope' (H6)."""
    from clann_spark.session import adaptive_input_split

    if hash_family == "crosspolytope":
        udf = crosspolytope_bands_udf(bands, rows_per_band, seed)
    else:
        udf = hyperplane_bands_udf(bands, rows_per_band, seed)
    # the banding matmul ((n, dim) @ (dim, bands*rows)) is the per-row
    # heavy work of this operator; a 1-partition local scan would run
    # it single-task (measured: the whole 10x-corpus banding in one
    # ~2s task). ~512 KiB of estimated input per task keeps each task
    # at ~0.1-0.2 s of matmul; cluster-scale scans are untouched.
    return adaptive_input_split(emb, 512 << 10).select(
        F.col(id_col).alias("doc_id"), udf(F.col(vec_col)).alias("bands")
    ).select("doc_id", F.posexplode("bands").alias("band_id", "band_hash"))


def embedding_lsh_pairs(
    emb: DataFrame,
    tau: float,
    bands: int,
    rows_per_band: int,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cfg: DedupConfig | None = None,
    hash_family: str = "hyperplane",
    verify_impl: str = "fold",
) -> DataFrame:
    """(id, embedding) -> (a, b, cos) pairs with exact cosine >= tau,
    candidates from banded hyperplane LSH, exactly verified.

    Same three-stage shape as the MinHash flagship: bucket rows ->
    salted-census candidate pairs (shared candidates.candidate_pairs:
    singleton-bucket drop, mega-bucket salting, size-gated census) ->
    gated-broadcast join of the embedding column back for exact
    re-scoring. At 10^12 rows every stage is shuffle-joined."""
    from clann_spark.operators.candidates import candidate_pairs

    cfg = cfg or DedupConfig()
    buckets = embedding_buckets(
        emb, bands, rows_per_band, seed, id_col, vec_col, hash_family
    )
    # No persist / count gate (round 6): the candidate table appears
    # exactly ONCE in the join chain below (unlike the text pipeline,
    # where the pair list feeds three consumers), so the blocking
    # count() bought nothing but a serial job. Join strategy is left to
    # Catalyst/AQE, which converts to broadcast at runtime when the
    # materialized candidate side is small and keeps shuffle joins at
    # scale — the same sizes the old row-count gate approximated.
    cands = candidate_pairs(buckets, cfg, mode="clique")

    e = emb.select(F.col(id_col).alias("doc_id"), F.col(vec_col).alias("v"))
    j = (
        cands
        .join(e.select(F.col("doc_id").alias("a"), F.col("v").alias("va")), "a")
        .join(e.select(F.col("doc_id").alias("b"), F.col("v").alias("vb")), "b")
    )
    if verify_impl == "fast":
        # vectorized NumPy cosine per Arrow batch — ~100x the
        # interpreted HOF fold when the candidate set is large (the
        # leaky low-tau regime); 'fold' stays the DuckDB-bit-parity
        # path used by the oracle gate
        from pyspark.sql.types import DoubleType

        @F.pandas_udf(DoubleType())
        def _cos(va: pd.Series, vb: pd.Series) -> pd.Series:
            n = len(va)
            if n == 0:
                return pd.Series([], dtype=np.float64)
            a, b = va.to_numpy(), vb.to_numpy()
            la = np.fromiter((len(v) for v in a), dtype=np.int64, count=n)
            lb = np.fromiter((len(v) for v in b), dtype=np.int64, count=n)
            # mixed-dim corpora land same-dim pairs of several dims in
            # one Arrow batch (a bare vstack would raise on the ragged
            # rows); group by dim and score each group vectorized. A
            # dim-mismatched pair has no cosine — score NaN, which the
            # caller's `cos >= tau` filter drops.
            out = np.full(n, np.nan)
            eq = la == lb
            for dim in np.unique(la[eq]):
                idx = np.nonzero(eq & (la == dim))[0]
                x = np.vstack([a[i] for i in idx]).astype(np.float64, copy=False)
                y = np.vstack([b[i] for i in idx]).astype(np.float64, copy=False)
                num = (x * y).sum(axis=1)
                den = np.linalg.norm(x, axis=1) * np.linalg.norm(y, axis=1)
                out[idx] = num / np.maximum(den, 1e-300)
            return pd.Series(out)

        # pure function; the marker keeps the `cos >= tau` filter from
        # duplicating the UDF evaluation (two ArrowEvalPython nodes for
        # one logical call — guide §4.4, round-6 plan audit)
        scored = j.select(
            "a", "b", _cos.asNondeterministic()("va", "vb").alias("cos")
        )
    else:
        scored = j.selectExpr("a", "b", f"{COS_SQL} AS cos")
    return scored.where(F.col("cos") >= tau)
