"""Pure-python pins for the bench harness's cross-round history logic —
the outlier detectors silently disengage on shape mismatches, so these
tests pin the shapes that must keep matching."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def test_prior_timings_filter_by_scale():
    """An artifact measured at another SF must not contribute minima (a
    smoke run at sf0.001 would otherwise make every sf0.1 query look 100x
    starved and double the bench wall with pointless re-runs)."""
    at_01 = bench._prior_round_timings(expect_sf="0.1")
    assert at_01, "committed BENCH artifacts should yield sf0.1 minima"
    assert all(v > 0 for v in at_01.values())
    assert bench._prior_round_timings(expect_sf="9.9") == {}


def test_prior_timings_tier_selection_reads_base_sf():
    """tier='x10' minima come from the sub-document and are keyed on its
    base_sf — the LAST_FULL artifact (committed each round) must satisfy
    both, or the sustained-starvation trigger disengages silently."""
    x10 = bench._prior_round_timings(tier="x10", expect_sf="0.1")
    assert x10, "BENCH_LAST_FULL.json should carry x10 history"
    base = bench._prior_round_timings(expect_sf="0.1")
    # tier timings are a different population than base timings
    common = set(x10) & set(base)
    assert common and any(x10[k] != base[k] for k in common)


def test_last_full_artifact_is_current_shape():
    """The in-repo full-fidelity artifact must parse and carry every field
    the detectors and the driver's tail-window summary rely on."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "BENCH_LAST_FULL.json")) as f:
        d = json.load(f)
    assert d["queries"] and d["samples"]
    assert d["x10"]["base_sf"] == 0.1 and d["x10"]["queries"]
    for k in ("headline_wall", "x10_max_ratio", "state_store_provider"):
        assert k in d["summary"]
    # summary must be the LAST key so any stdout tail window keeps it
    assert list(d.keys())[-1] == "summary"


def test_remeasure_trigger_tiers():
    """Sub-second prior-best queries re-measure at 1.5x, multi-second at
    3x, and an unknown prior never triggers (VERDICT r10 next #3: the
    r10 ANN rungs drifted just under a uniform 3x — 1.909 s vs a 0.963 s
    prior must now trip the guard)."""
    import bench

    assert bench._remeasure_trigger(None) == 3.0
    assert bench._remeasure_trigger(5.0) == 3.0
    assert bench._remeasure_trigger(1.0) == 3.0
    assert bench._remeasure_trigger(0.963) == 1.5
    # the r10 case: min-of-3 1.909 vs prior 0.963 -> re-measure fires
    assert 1.909 > bench._remeasure_trigger(0.963) * 0.963
