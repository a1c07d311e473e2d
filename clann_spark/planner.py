"""Offline banding planner — the plan-time replacement for the
reference's runtime recall machinery.

The reference stops probing when the failure probability of the
current prefix depth drops below 1-delta
(libpuffinn hash_source/independent.hpp:108-119 `failure_probability`,
collection.hpp:484-495). A batch Spark plan cannot adapt at runtime,
so we solve the same inequality offline using the MinHash collision
probability (minhash.hpp:213-220: P[collide] = s for a full hash;
banding: P[candidate] = 1 - (1 - s^r)^b) and provision (b, r)
statically for the design threshold tau.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from clann_spark.config import DedupConfig


def candidate_probability(s: float, bands: int, rows_per_band: int) -> float:
    """P[pair with Jaccard s becomes an LSH candidate]."""
    if s <= 0.0:
        return 0.0
    if s >= 1.0:
        return 1.0
    return 1.0 - (1.0 - s**rows_per_band) ** bands


def simhash_collision_probability(cos_sim: float) -> float:
    """P[one SimHash bit agrees] = 1 - acos(s)/pi for cosine similarity
    s (ref: simhash.hpp:96-102, which states it over 2s-1 because its
    input is the [0,1]-mapped similarity). Used to pick the Hamming
    prefilter threshold offline."""
    s = min(1.0, max(-1.0, cos_sim))
    return 1.0 - math.acos(s) / math.pi


def hamming_threshold_for(cos_sim: float, target_recall: float, bits: int = 60) -> int:
    """Smallest Hamming cutoff t so that P[Hamming(a,b) <= t] >=
    target_recall for a pair at cosine similarity cos_sim (binomial
    tail over independent bits — the offline analog of the reference's
    per-query sketch threshold, filterer.hpp:108-111)."""
    p_disagree = 1.0 - simhash_collision_probability(cos_sim)
    # accumulate binomial CDF until target is covered
    prob = 0.0
    log_c = 0.0  # log C(bits, j) built incrementally
    for t in range(bits + 1):
        if t > 0:
            log_c += math.log(bits - t + 1) - math.log(t)
        term = math.exp(
            log_c + t * math.log(max(p_disagree, 1e-300)) + (bits - t) * math.log(max(1 - p_disagree, 1e-300))
        )
        prob += term
        if prob >= target_recall:
            return t
    return bits


def hyperplane_candidate_probability(cos_sim: float, bands: int, rows_per_band: int) -> float:
    """P[pair at cosine similarity s becomes a candidate] under banded
    random-hyperplane hashing: per-bit agreement p = 1 - acos(s)/pi
    (simhash.hpp:96-102), band match = p^r, candidate = 1-(1-p^r)^b."""
    p = simhash_collision_probability(cos_sim)
    if p <= 0.0:
        return 0.0
    if p >= 1.0:
        return 1.0
    return 1.0 - (1.0 - p**rows_per_band) ** bands


def plan_hyperplane_banding(
    tau: float,
    target_recall: float = 0.99,
    max_bits: int = 1024,
    max_rows_per_band: int = 24,
) -> BandingPlan:
    """Choose (b, r) for hyperplane LSH over embeddings: the sharpest r
    whose required band count still fits max_bits total hyperplanes —
    the plan-time replacement for the reference's adaptive prefix
    search, identical in spirit to plan_banding but on the angular
    collision curve instead of the Jaccard one."""
    p = simhash_collision_probability(tau)
    best: BandingPlan | None = None
    for r in range(max_rows_per_band, 0, -1):
        miss = 1.0 - p**r
        if miss >= 1.0:
            continue
        b = 1 if miss <= 0.0 else max(
            1, math.ceil(math.log(1.0 - target_recall) / math.log(miss))
        )
        if b * r > max_bits:
            continue
        best = BandingPlan(
            bands=b,
            rows_per_band=r,
            recall_at_tau=hyperplane_candidate_probability(tau, b, r),
            fp_rate_at_half_tau=hyperplane_candidate_probability(tau / 2.0, b, r),
        )
        break
    if best is None:
        raise ValueError(
            f"no hyperplane (b, r) with b*r <= {max_bits} reaches recall "
            f"{target_recall} at tau={tau}"
        )
    return best


def plan_cp_banding(
    tau: float,
    dim: int,
    target_recall: float = 0.99,
    max_funcs: int = 256,
    max_rows_per_band: int = 4,
    seed: int = 1234,
) -> BandingPlan:
    """Banding plan for the cross-polytope family (H6): per-function
    collision probability comes from the seeded Monte-Carlo table (H7,
    crosspolytope.hpp:10-119) instead of a closed form; the S-curve
    solve is identical to the other planners."""
    from clann_spark.functions.crosspolytope import (
        cp_probability_at,
        cp_probability_table,
    )

    table = cp_probability_table(dim, seed=seed)
    p = cp_probability_at(tau, table)
    best: BandingPlan | None = None
    for r in range(max_rows_per_band, 0, -1):
        miss = 1.0 - p**r
        if miss >= 1.0:
            continue
        b = 1 if miss <= 0.0 else max(
            1, math.ceil(math.log(1.0 - target_recall) / math.log(miss))
        )
        if b * r > max_funcs:
            continue
        fp_half = cp_probability_at(tau / 2.0, table)
        best = BandingPlan(
            bands=b,
            rows_per_band=r,
            recall_at_tau=1.0 - (1.0 - p**r) ** b,
            fp_rate_at_half_tau=1.0 - (1.0 - fp_half**r) ** b,
        )
        break
    if best is None:
        raise ValueError(
            f"no cross-polytope (b, r) with b*r <= {max_funcs} reaches "
            f"recall {target_recall} at tau={tau}"
        )
    return best


def planned_prefilter(cfg: DedupConfig, target_recall: float = 0.9999) -> int:
    """J7 sketch-filter threshold for a dedup config.

    The 60-bit SimHash is over WORD sets while tau is shingle-set
    Jaccard; for any two sets, cos >= J (|A∩B|/sqrt(|A||B|) >=
    |A∩B|/|A∪B|), and high shingle overlap forces at least comparable
    word overlap, so cos = tau is the conservative design point. The
    returned threshold keeps P(drop | true pair) <= 1 - target_recall
    under the independent-bit binomial model (the offline analog of
    filterer.hpp:108-111)."""
    return hamming_threshold_for(cfg.tau, target_recall)


def lsh_threshold(bands: int, rows_per_band: int) -> float:
    """The similarity where the banding S-curve crosses ~0.5:
    (1/b)^(1/r) — the classic approximation."""
    return (1.0 / bands) ** (1.0 / rows_per_band)


@dataclass(frozen=True)
class BandingPlan:
    bands: int
    rows_per_band: int
    recall_at_tau: float
    fp_rate_at_half_tau: float

    @property
    def num_perm(self) -> int:
        return self.bands * self.rows_per_band


def plan_banding(
    tau: float,
    target_recall: float = 0.99,
    max_perm: int = 512,
    max_rows_per_band: int = 16,
) -> BandingPlan:
    """Choose (b, r) with minimal verification cost meeting the recall
    contract at tau.

    Larger r → sharper S-curve → fewer false candidates (cheaper exact
    verify) but needs more bands for the same recall. We scan r
    descending and take the largest r whose required b fits max_perm —
    i.e. the cheapest plan that satisfies 1-(1-tau^r)^b >= target_recall.
    """
    best: BandingPlan | None = None
    for r in range(max_rows_per_band, 0, -1):
        # smallest b with 1-(1-tau^r)^b >= target_recall
        miss = 1.0 - tau**r
        if miss >= 1.0:
            continue
        if miss <= 0.0:
            b = 1
        else:
            b = max(1, math.ceil(math.log(1.0 - target_recall) / math.log(miss)))
        if b * r > max_perm:
            continue
        plan = BandingPlan(
            bands=b,
            rows_per_band=r,
            recall_at_tau=candidate_probability(tau, b, r),
            fp_rate_at_half_tau=candidate_probability(tau / 2.0, b, r),
        )
        if best is None or plan.rows_per_band > best.rows_per_band:
            best = plan
        break  # r scanned descending: first feasible r is the sharpest
    if best is None:
        raise ValueError(
            f"no (b, r) with b*r <= {max_perm} reaches recall {target_recall} at tau={tau}"
        )
    return best


def config_recall(cfg: DedupConfig, s: float | None = None) -> float:
    """Candidate recall of a config at similarity s (default: its tau)."""
    return candidate_probability(s if s is not None else cfg.tau, cfg.bands, cfg.rows_per_band)


def expected_pair_recall(cfg: DedupConfig, sims: list[float]) -> float:
    """Mean candidate probability over a list of true-pair similarities —
    the planner-side estimate of the dup-pair recall metric
    (adaptation of the reference's get_recall_values,
    src/utils/mod.rs:59-95, to pairs).

    List form for tests/small inputs; at scale use
    expected_pair_recall_agg — a duplicate-heavy 10^12-doc corpus has
    billions of true pairs, and collecting their similarities to the
    driver is exactly the anti-pattern the rest of the engine avoids."""
    if not sims:
        return 1.0
    return sum(candidate_probability(s, cfg.bands, cfg.rows_per_band) for s in sims) / len(sims)


def expected_pair_recall_agg(cfg: DedupConfig, jaccard_col: str = "jaccard"):
    """The same S-curve mean as a Spark AGGREGATE EXPRESSION —
    avg(1 - (1 - j^r)^b) over the pair DataFrame, computed where the
    pairs live instead of on the driver (round-4 VERDICT item 4).
    Empty input keeps the vacuous-recall-1.0 contract of the list form.

    Usage: pairs.agg(expected_pair_recall_agg(cfg).alias("er"))."""
    from pyspark.sql import functions as F

    s_curve = 1.0 - F.pow(
        1.0 - F.pow(F.col(jaccard_col), F.lit(float(cfg.rows_per_band))),
        F.lit(float(cfg.bands)),
    )
    return F.coalesce(F.avg(s_curve), F.lit(1.0))
