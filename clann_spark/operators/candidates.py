"""Candidate-pair generation — the distributed analog of the
reference's `closest_pairs` within-segment all-pairs stage
(libpuffinn collection.hpp:390-504: per table, segment rows by equal
hash code, all-pairs compare within segment).

Here: explode (doc_id, band_id, band_hash) bucket rows, then form
pairs of docs sharing a bucket. Two pair modes:

  clique : all pairs within a bucket (exact reference semantics —
           collection.hpp:415-441). Default; required for oracle
           equality and per-pair recall.
  anchor : each doc pairs only with the bucket's min doc_id —
           m-1 edges instead of m(m-1)/2. Sufficient for connected-
           components dedup connectivity, and the scale path for
           mega-clusters (1000 identical docs → 999 edges, not 500k).
  auto   : clique for buckets with cnt <= anchor_threshold, anchor
           above. Pair-complete where it matters, linear where a
           clique would blow up (measured: the 1000-copy skew fixture
           runs 8x faster with identical final clusters).

ONE-EXCHANGE PLAN (round 4). Rounds 1-3 built this stage as census
aggregation -> size-gated broadcast of the census -> join-back ->
self-join on (band_hash, salt): two shuffles of the bucket table plus,
below the gate, a flat 20-30 s driver collect+broadcast at a 2M-doc
census — the dominant parallelism-INDEPENDENT term in the e2e scaling
measurement (BASELINE.md round-4 attribution). The redesign hashes the
bucket table by band_hash ONCE; everything downstream — the per-bucket
census (a window count), singleton drop, mega-bucket salting, anchor
minima, and the clique self-join — runs co-partitioned with NO further
exchange (Spark reuses the single Exchange for both self-join sides,
and HashPartitioning(band_hash) satisfies the (band_hash, salt) join's
clustering requirement because the join key is a superset). There is
no broadcast and no driver action anywhere in the stage: it runs
unchanged at any census size, including the 10^12-doc regime where the
old census could never have been broadcast. tests/test_plans.py pins
the single-exchange property.

Skew handling (north_rule explicit requirement; the reference has
none — collection.hpp:415-441 loops whole segments unconditionally):
buckets larger than cfg.bucket_cap are salted into ceil(cnt/cap)
subgroups keyed by xxhash64(doc_id, band_hash); pairs form within a
salt group only, capping the m^2 clique blowup. Because the salt
depends on the band hash, different bands split a mega-cluster
differently, so connectivity across subgroups is restored by the
other bands (and by CC transitivity). Note the one-exchange plan
co-locates a whole bucket in one partition, so salting bounds pair
EXPLOSION but not single-partition residence; a bucket whose raw rows
alone exceed a partition's memory budget (>>bucket_cap) is handled by
the anchor path (auto mode), which emits m-1 rows from a single
sorted pass and never buffers the m^2 join group.

Sketch prefilter fusion (J7, filterer.hpp:20-32): pass
sketch_col/hamming_threshold to carry a per-doc int64 fingerprint
through the exchange (+8 B/row) and drop far pairs with one
bit_count(a^b) predicate INSIDE the pair join — replacing the two
post-hoc shuffle joins of the old prefilter_pairs_by_simhash step
(verify.py keeps that form for pair lists that arrive without bucket
context, e.g. loaded stage tables).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from clann_spark.config import DedupConfig


def bucket_census(bucket_df: DataFrame) -> DataFrame:
    """band_hash -> cnt. One map-side-combined shuffle.

    band_id is NOT part of the key: the band index is folded into the
    60-bit band hash itself (hashing.bands_sql / np_band_hashes_from_sig
    salt the fold with the band index), so equal hashes from different
    bands are ~n²·b²/2^60 random collisions — vanishing, and the exact
    verify stage removes any pair they admit. Dropping the column cuts
    the census/shuffle key width by a third at 10^12-row bucket tables.
    """
    return bucket_df.groupBy("band_hash").agg(F.count("*").alias("cnt"))


def salted_buckets(
    bucket_df: DataFrame,
    cfg: DedupConfig,
    broadcast_limit: int | None = None,  # kept for API compat; unused
    extra_cols: tuple = (),
) -> DataFrame:
    """Census + singleton drop + mega-bucket salting, co-partitioned.

    Output: (doc_id, band_hash, *extra_cols, cnt, salt). Singleton
    buckets (cnt=1) can never produce a pair and are dropped — at web
    scale that is the vast majority of bucket rows.

    Physical plan: ONE Exchange (hashpartitioning(band_hash)), then a
    window count, filter and salt projection — all narrow. The window
    count needs the same in-partition sort the downstream merge join
    needs anyway; measured against the round-3 census+broadcast
    join-back at 2M docs it removes both the second shuffle and the
    flat ~20-30 s census collect (BASELINE.md round-4).

    broadcast_limit is accepted for source compatibility with the
    round-3 gate but ignored: the plan contains no broadcast at any
    size (the property the gate used to protect is now structural).
    """
    cols = ["doc_id", "band_hash", *extra_cols]
    slim = bucket_df.select(*cols)
    part = slim.repartition("band_hash")
    w = Window.partitionBy("band_hash")
    b = part.withColumn("cnt", F.count("*").over(w)).where(F.col("cnt") >= 2)
    n_salt = F.ceil(F.col("cnt") / F.lit(cfg.bucket_cap)).cast("int")
    # the salt key mixes in band_hash so different bands split a
    # mega-cluster differently and CC reconnects across salt groups
    return b.withColumn(
        "salt",
        F.when(
            F.col("cnt") > cfg.bucket_cap,
            F.pmod(F.xxhash64(F.col("doc_id"), F.col("band_hash")), n_salt).cast("int"),
        ).otherwise(F.lit(0)),
    )


def _clique(
    b: DataFrame,
    key: list,
    sketch_col: str | None = None,
    hamming_threshold: int | None = None,
) -> DataFrame:
    """All within-group pairs via a co-partitioned merge self-join.

    Both inputs project from the same child, so Spark plans a single
    reused Exchange; the join itself adds only in-partition sorts.
    With a sketch column, far pairs die inside the join output before
    the cross-band distinct ever sees them.
    """
    lcols = [*key, F.col("doc_id").alias("a")]
    rcols = [*key, F.col("doc_id").alias("b")]
    if sketch_col is not None:
        lcols.append(F.col(sketch_col).alias("_sk_a"))
        rcols.append(F.col(sketch_col).alias("_sk_b"))
    # merge hint: Catalyst's size estimate at small inputs would pick a
    # BroadcastHashJoin whose build side re-computes the entire upstream
    # subtree (signatures included) for the broadcast; the merge join
    # instead rides the single reused exchange at EVERY size — both
    # sides are already co-partitioned by band_hash, so it adds only
    # in-partition sorts.
    pairs = (
        b.select(*lcols)
        .join(b.select(*rcols).hint("shuffle_merge"), key)
        .where(F.col("a") < F.col("b"))
    )
    if sketch_col is not None and hamming_threshold is not None:
        pairs = pairs.where(
            F.expr("bit_count(_sk_a ^ _sk_b)") <= F.lit(hamming_threshold)
        )
    return pairs.select("a", "b")


def _anchor(
    b: DataFrame,
    key: list,
    sketch_col: str | None = None,
    hamming_threshold: int | None = None,
) -> DataFrame:
    """Spanning edges to each group's min doc_id — join-free.

    The anchor (and, when sketch-filtering, its fingerprint) is a
    window MIN over the already-partitioned group: a struct min keyed
    by doc_id, so no join and no extra exchange. m-1 edges stream out
    of one sorted pass regardless of group size — this is why auto
    mode routes mega-buckets here.
    """
    w = Window.partitionBy(*key)
    if sketch_col is not None:
        mn = F.min(F.struct("doc_id", sketch_col)).over(w)
        b = b.withColumn("_anchor", mn["doc_id"]).withColumn("_anchor_sk", mn[sketch_col])
    else:
        b = b.withColumn("_anchor", F.min("doc_id").over(w))
    pairs = b.where(F.col("doc_id") != F.col("_anchor"))
    if sketch_col is not None and hamming_threshold is not None:
        pairs = pairs.where(
            F.expr(f"bit_count(_anchor_sk ^ {sketch_col})") <= F.lit(hamming_threshold)
        )
    return pairs.select(F.col("_anchor").alias("a"), F.col("doc_id").alias("b"))


def candidate_pairs(
    bucket_df: DataFrame,
    cfg: DedupConfig,
    mode: str = "clique",
    anchor_threshold: int = 64,
    sketch_col: str | None = None,
    hamming_threshold: int | None = None,
) -> DataFrame:
    """Distinct canonical candidate pairs (a < b) from bucket rows.

    Pair canonicalization + cross-band dedup mirrors the reference's
    MaxPairBuffer (maxpairbuffer.hpp:64-80 canonicalize, :33-46 dedup).

    sketch_col/hamming_threshold fuse the J7 sketch prefilter into the
    pair join (see module docstring); bucket_df must then carry
    sketch_col per row (explode_bands(..., extra_cols=[...])). The
    filter commutes with the cross-band distinct, so the surviving
    pair set equals running prefilter_pairs_by_simhash afterwards.
    """
    extra = (sketch_col,) if sketch_col is not None else ()
    b = salted_buckets(bucket_df, cfg, extra_cols=extra)
    key = ["band_hash", "salt"]
    args = (sketch_col, hamming_threshold)
    if mode == "anchor":
        pairs = _anchor(b, key, *args)
    elif mode == "clique":
        pairs = _clique(b, key, *args)
    elif mode == "auto":
        pairs = _clique(b.where(F.col("cnt") <= anchor_threshold), key, *args).union(
            _anchor(b.where(F.col("cnt") > anchor_threshold), key, *args)
        )
    else:
        raise ValueError(f"unknown pair mode {mode!r}")
    return pairs.dropDuplicates(["a", "b"])
