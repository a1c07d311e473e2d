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
    each). The Gaussian plane matrix is drawn lazily from the FIRST
    Arrow batch's dim with a fixed seed — every executor, retry and
    cluster size derives identical planes (simhash.hpp:17-23 sampling,
    made deterministic) and the caller never runs a driver-side job
    just to learn the embedding dim."""
    weights = (1 << np.arange(rows_per_band, dtype=np.int64))[None, None, :]
    state: dict = {}

    @F.pandas_udf(ArrayType(LongType()))
    def _bands(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        x = np.vstack(vecs.to_numpy()).astype(np.float64, copy=False)
        planes = state.get("planes")
        if planes is None:
            planes = np.random.default_rng(seed).standard_normal(
                (x.shape[1], bands * rows_per_band)
            )
            state["planes"] = planes
        elif planes.shape[0] != x.shape[1]:
            # a mixed-dim embedding column must fail loudly: silently
            # re-drawing planes per dim would hash the groups in
            # unrelated spaces and drop their cross pairs with no error
            raise ValueError(
                f"embedding dim changed mid-column: saw {planes.shape[0]}, "
                f"got {x.shape[1]}"
            )
        bits = (x @ planes >= 0).reshape(len(x), bands, rows_per_band)
        vals = (bits * weights).sum(axis=2)
        return pd.Series(list(vals))

    return _bands


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

    @F.pandas_udf(ArrayType(LongType()))
    def _bands(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        x = np.vstack(vecs.to_numpy()).astype(np.float64, copy=False)
        diagonals = state.get("diag")
        if diagonals is None:
            diagonals = cp_diagonals(bands * rows_per_band, next_pow2(x.shape[1]), seed)
            state["diag"], state["dim"] = diagonals, x.shape[1]
        elif state.get("dim") != x.shape[1]:
            # same loud-failure contract as the hyperplane family above
            raise ValueError(
                f"embedding dim changed mid-column: saw {state.get('dim')}, "
                f"got {x.shape[1]}"
            )
        codes = cp_codes(x, diagonals).astype(np.uint64).reshape(
            len(x), bands, rows_per_band
        )
        acc = np.full((len(x), bands), 0x243F6A8885A308D3, dtype=np.uint64)
        acc ^= np.arange(bands, dtype=np.uint64)[None, :] * np.uint64(0x100000001B3)
        for j in range(rows_per_band):
            acc = _splitmix_step(acc ^ codes[:, :, j])
        return pd.Series(list((acc >> np.uint64(4)).astype(np.int64)))

    return _bands


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
    if hash_family == "crosspolytope":
        udf = crosspolytope_bands_udf(bands, rows_per_band, seed)
    else:
        udf = hyperplane_bands_udf(bands, rows_per_band, seed)
    return emb.select(
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
    cands = candidate_pairs(buckets, cfg, mode="clique").persist()
    small = cands.count() <= cfg.broadcast_limit

    e = emb.select(F.col(id_col).alias("doc_id"), F.col(vec_col).alias("v"))
    j = (
        (F.broadcast(cands) if small else cands)
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
            if len(va) == 0:
                return pd.Series([], dtype=np.float64)
            x = np.vstack(va.to_numpy()).astype(np.float64, copy=False)
            y = np.vstack(vb.to_numpy()).astype(np.float64, copy=False)
            num = (x * y).sum(axis=1)
            den = np.linalg.norm(x, axis=1) * np.linalg.norm(y, axis=1)
            return pd.Series(num / np.maximum(den, 1e-300))

        scored = j.select("a", "b", _cos("va", "vb").alias("cos"))
    else:
        scored = j.selectExpr("a", "b", f"{COS_SQL} AS cos")
    return scored.where(F.col("cos") >= tau)
