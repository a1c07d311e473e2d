"""Banding planner math (the static replacement for the reference's
failure-probability stopping rule, independent.hpp:108-119)."""

from __future__ import annotations

import pytest

from clann_spark.config import DedupConfig
from clann_spark.planner import (
    candidate_probability,
    config_recall,
    lsh_threshold,
    plan_banding,
)


def test_candidate_probability_monotone():
    ps = [candidate_probability(s / 10, 32, 4) for s in range(11)]
    assert ps == sorted(ps)
    assert ps[0] == 0.0 and ps[10] == 1.0


def test_default_config_meets_recall_contract():
    cfg = DedupConfig()  # 32x4 @ tau=0.8
    assert config_recall(cfg) >= cfg.target_recall
    # and not a vacuous plan: false-positive rate at s=0.4 stays low
    assert candidate_probability(0.4, cfg.bands, cfg.rows_per_band) < 0.6


def test_plan_banding_solves_inequality():
    for tau in (0.5, 0.7, 0.8, 0.9):
        plan = plan_banding(tau, target_recall=0.99, max_perm=512)
        assert candidate_probability(tau, plan.bands, plan.rows_per_band) >= 0.99
        assert plan.num_perm <= 512
        # the S-curve threshold sits below tau (catches, not misses)
        assert lsh_threshold(plan.bands, plan.rows_per_band) <= tau


def test_plan_banding_infeasible():
    with pytest.raises(ValueError):
        plan_banding(0.05, target_recall=0.999999, max_perm=8)


def test_simhash_collision_probability():
    from clann_spark.planner import hamming_threshold_for, simhash_collision_probability

    assert abs(simhash_collision_probability(1.0) - 1.0) < 1e-12
    assert abs(simhash_collision_probability(0.0) - 0.5) < 1e-12
    assert abs(simhash_collision_probability(-1.0)) < 1e-12
    # threshold grows as similarity drops; extremes behave
    t_hi = hamming_threshold_for(0.95, 0.99)
    t_lo = hamming_threshold_for(0.6, 0.99)
    assert 0 < t_hi < t_lo <= 60


def test_expected_pair_recall_agg_matches_list_form(spark):
    # the Spark aggregate (scale path, VERDICT r4 item 4) and the
    # driver-side list form are the same estimator
    import math

    from clann_spark.planner import expected_pair_recall, expected_pair_recall_agg

    cfg = DedupConfig()
    sims = [0.81, 0.85, 0.92, 0.99, 1.0]
    df = spark.createDataFrame([(s,) for s in sims], "jaccard double")
    got = df.agg(expected_pair_recall_agg(cfg).alias("er")).collect()[0]["er"]
    assert math.isclose(got, expected_pair_recall(cfg, sims), rel_tol=1e-12)
    # empty input keeps the vacuous-recall-1.0 contract
    empty = spark.createDataFrame([], "jaccard double")
    assert empty.agg(expected_pair_recall_agg(cfg).alias("er")).collect()[0]["er"] == 1.0
