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


def test_control_task_deterministic_and_fixed_work():
    # same seed -> same result (the control times FIXED work; a seed-
    # dependent amount of work would make walls incomparable)
    assert _control_task(("compute", 7)) == _control_task(("compute", 7))
    assert _control_task(("bandwidth", 3)) == _control_task(("bandwidth", 3))
