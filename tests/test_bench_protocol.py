"""Unit tests for the scaling-protocol plumbing in bench.py (no Spark):
master-string core parsing and the bracketing-control pair selection
that decides which N/4N measurements count as evidence."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _clean_pair_efficiencies, _control_task, _master_cores


def test_master_cores():
    assert _master_cores("local[2]") == 2
    assert _master_cores("local[32]") == 32
    assert _master_cores("local[*]") == (os.cpu_count() or 32)
    assert _master_cores("local-cluster[1,2,8192]") == 2
    assert _master_cores("local-cluster[4,2,8192]") == 8
    assert _master_cores("local-cluster[4,1,8192]") == 4


def test_clean_pairs_require_both_brackets():
    # pair i is clean iff controls[i] AND controls[i+1] pass the gate:
    # a host that degrades mid-protocol invalidates the pair it brackets
    adj = [0.85, 0.60, 0.82]
    controls = [0.95, 0.92, 0.55, 0.97]  # degraded window around pair 1/2
    assert _clean_pair_efficiencies(adj, controls, 0.9) == [0.85]
    # fully-quiet protocol keeps every pair
    assert _clean_pair_efficiencies(adj, [1.0] * 4, 0.9) == adj
    # fully-degraded protocol keeps none
    assert _clean_pair_efficiencies(adj, [0.5] * 4, 0.9) == []


def _fake_result(adj, controls, tn=None, t4n=None):
    return {
        "adjacent_pair_efficiencies": adj,
        "bracketing_controls": controls,
        "control_gate": 0.9,
        "reps": {"t_n": tn or [100.0] * len(adj), "t_4n": t4n or [30.0] * len(adj)},
        "n_docs": 1000,
        "masters": ["local-cluster[1,2,8192]", "local-cluster[4,2,8192]"],
    }


def test_merge_history_records_sha_and_scopes_headline(tmp_path):
    import json

    from bench import _code_sha, _merge_scaling_history

    rec = str(tmp_path / "SCALING_RESULT.json")
    # stale-code history: two clean pairs recorded without a sha
    with open(rec, "w") as f:
        json.dump(
            {"clean_pairs_history": [
                {"efficiency": 0.50, "recorded_at": "old"},
                {"efficiency": 0.52, "recorded_at": "old"},
            ]},
            f,
        )
    # one new clean pair: not enough current-code evidence -> headline
    # spans all clean pairs and surfaces the version mix
    m1 = _merge_scaling_history(_fake_result([0.80], [0.95, 0.96]), rec)
    assert m1["clean_pairs_history"][-1]["code_sha"] == _code_sha()
    from bench import _code_fingerprint

    assert m1["clean_pairs_history"][-1]["code_fp"] == _code_fingerprint()
    assert m1["n_clean_pairs"] == 3
    assert m1["efficiency_n_to_4n"] == 0.52  # true median, all pairs
    assert "mix" in m1["headline_scope"]
    with open(rec, "w") as f:
        json.dump(m1, f)
    # a second current-code pair flips the headline scope to current
    m2 = _merge_scaling_history(_fake_result([0.84], [0.95, 0.96]), rec)
    assert m2["n_clean_pairs"] == 2
    assert m2["efficiency_n_to_4n"] == 0.82  # median of [0.80, 0.84]
    assert _code_sha() in m2["headline_scope"]
    assert m2["all_clean_pair_efficiencies"] == [0.5, 0.52, 0.8, 0.84]
    # pairs recorded under a commit that only touched docs/evidence
    # (different git sha, same engine fingerprint) still count as
    # current-code evidence
    with open(rec, "w") as f:
        json.dump(m2, f)
    with open(rec) as f:
        stored = json.load(f)
    for h in stored["clean_pairs_history"]:
        if h.get("code_fp"):
            h["code_sha"] = "0000000"
    with open(rec, "w") as f:
        json.dump(stored, f)
    m3 = _merge_scaling_history(_fake_result([0.90], [0.95, 0.96]), rec)
    assert m3["n_clean_pairs"] == 3
    assert m3["efficiency_n_to_4n"] == 0.84  # median of [0.80, 0.84, 0.90]
    assert "mix" not in m3["headline_scope"]


def test_merge_history_true_median_even_count(tmp_path):
    # ADVICE r4: effs[len//2] was the upper-middle element, not the
    # median, for even-length lists — pin statistics.median semantics
    from bench import _merge_scaling_history

    rec = str(tmp_path / "none.json")
    m = _merge_scaling_history(
        _fake_result([0.60, 0.80], [0.95, 0.96, 0.97]), rec
    )
    assert m["efficiency_n_to_4n"] == 0.70


def test_compact_scaling_fits_one_line():
    import json

    from bench import _compact_scaling

    fat = {
        "efficiency_n_to_4n": 0.728,
        "n_clean_pairs": 5,
        "clean_pair_efficiencies": [0.56, 0.586, 0.607, 0.645, 0.728],
        "headline_scope": "all recorded code versions",
        "recorded_at": "2026-08-18T00:00:00Z",
        "clean_pairs_history": [{"big": "x" * 4000}] * 10,
        "latest_run": {"substrate_control": {"compute": {"t_n": [1] * 50}}},
    }
    slim = _compact_scaling(fat)
    assert "clean_pairs_history" not in slim and "latest_run" not in slim
    # the whole headline line must fit the driver's tail window
    assert len(json.dumps(slim)) < 1000
    assert slim["efficiency_n_to_4n"] == 0.728


def test_control_task_deterministic_and_fixed_work():
    # same seed -> same result (the control times FIXED work; a seed-
    # dependent amount of work would make walls incomparable)
    assert _control_task(("compute", 7)) == _control_task(("compute", 7))
    assert _control_task(("bandwidth", 3)) == _control_task(("bandwidth", 3))
