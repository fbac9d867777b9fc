"""Canary v3 — the bench's uniform-inflation detector.

Spark-free unit tests: ``bench.median_vs_anchor`` is the decision
kernel (median per-query ratio vs the committed r01 anchors); the
run-level behavior it gates (one cooldown + headline re-run, both
figures in the summary line) is exercised by the driver's own bench
runs.  The median-not-max choice is the load-bearing part: a genuine
code regression moves only the queries that changed, steady-state
machine heat moves the whole anchored block together.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_no_anchors_returns_none():
    # non-anchor SF (e.g. sf0.01 runs): detector off by construction
    assert bench.median_vs_anchor({"a": 1.0, "b": 2.0}, {}) is None


def test_below_min_anchored_returns_none():
    t = {f"q{i}": 2.0 for i in range(bench.MIN_ANCHORED - 1)}
    a = {f"q{i}": 1.0 for i in range(bench.MIN_ANCHORED - 1)}
    assert bench.median_vs_anchor(t, a) is None


def test_uniform_heat_trips_tolerance():
    n = bench.MIN_ANCHORED + 3
    t = {f"q{i}": 1.3 for i in range(n)}
    a = {f"q{i}": 1.0 for i in range(n)}
    med = bench.median_vs_anchor(t, a)
    assert med == 1.3 and med > bench.UNIFORM_INFLATION_TOL


def test_single_regression_does_not_trip_median():
    """One 10x-regressed query among clean anchors must NOT read as
    machine heat — that case should surface via worst_vs_r01 instead."""
    n = bench.MIN_ANCHORED + 3
    t = {f"q{i}": 1.0 for i in range(n)}
    t["q0"] = 10.0
    a = {f"q{i}": 1.0 for i in range(n)}
    med = bench.median_vs_anchor(t, a)
    assert med == 1.0 and med <= bench.UNIFORM_INFLATION_TOL


def test_even_count_median_interpolates():
    t = {f"q{i}": (1.0 if i < 4 else 2.0) for i in range(8)}
    a = {f"q{i}": 1.0 for i in range(8)}
    assert bench.median_vs_anchor(t, a) == 1.5


def test_unanchored_queries_ignored():
    # queries added after round 1 have no anchor and must not skew the
    # median (they'd otherwise divide by a missing/zero anchor)
    n = bench.MIN_ANCHORED
    t = {f"q{i}": 1.0 for i in range(n)} | {"new_op": 99.0}
    a = {f"q{i}": 1.0 for i in range(n)}
    assert bench.median_vs_anchor(t, a) == 1.0


def test_worst_anchored_picks_highest_ratios_and_skips_unanchored():
    """Extra-tier defense (round 9): the bounded re-run set is the k
    worst timing/anchor ratios; queries without a committed best-known
    (first appearance) can't be ranked and are excluded."""
    t = {"a": 3.0, "b": 1.1, "c": 2.0, "d": 0.9, "new": 50.0}
    a = {"a": 1.0, "b": 1.0, "c": 1.0, "d": 1.0}
    assert bench.worst_anchored(t, a, 2) == ["a", "c"]
    assert bench.worst_anchored(t, a, 10) == ["a", "c", "b", "d"]
    assert bench.worst_anchored(t, {}, 3) == []


def test_extra_tolerance_sits_above_best_known_bias():
    """The extra tier anchors on per-query BEST-KNOWNs (ratios biased
    >= 1 by construction), so its tolerance must exceed the headline's
    r01-anchored one — equal tolerances would false-positive on every
    clean run."""
    assert bench.EXTRA_INFLATION_TOL > bench.UNIFORM_INFLATION_TOL
    assert bench.EXTRA_RERUN_WORST > 0


def test_r01_anchor_artifact_is_loadable_at_its_own_sf():
    """The committed BENCH_r01.json must keep parsing into the anchor
    dict the detector depends on — a format drift here silently turns
    the detector off for every future round."""
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_r01.json",
    )
    with open(path) as fh:
        parsed = json.load(fh).get("parsed") or {}
    assert parsed.get("sf") == 0.1
    anchors = parsed.get("queries", {})
    assert len(anchors) >= bench.MIN_ANCHORED
    assert all(isinstance(v, (int, float)) and v > 0 for v in anchors.values())


def test_headline_suspects_per_query_not_median():
    """The r11 whipsaw case: ONE query at 1.6x its best-known among an
    otherwise-clean block is a suspect even though the median is 1.0
    (the uniform detector stays silent by design)."""
    best = {f"q{i}": 1.0 for i in range(10)}
    t = {f"q{i}": 1.0 for i in range(10)}
    t["q3"] = 1.6
    assert bench.headline_suspects(t, best) == ["q3"]
    assert bench.median_vs_anchor(t, best) == 1.0


def test_headline_suspects_skip_unreferenced_and_below_tol():
    best = {"a": 1.0}
    t = {"a": bench.HEADLINE_QUERY_TOL * 0.99, "new_query": 99.0}
    assert bench.headline_suspects(t, best) == []


def test_headline_tolerance_sits_above_best_known_bias():
    """Clean readings vs a best-known minimum sit ~1.0-1.2x (the bias
    of comparing against a committed min); the observed bimodal high
    mode reads ~1.4-1.6x.  The tolerance must separate the two."""
    assert 1.2 < bench.HEADLINE_QUERY_TOL < 1.4


def test_every_headline_query_belongs_to_exactly_one_family():
    """The suspect re-run goes by family — a query in zero families
    would silently never re-run, one in two would re-run twice."""
    from collections import Counter

    counts = Counter(q for _, qs in bench.HEADLINE_FAMILIES for q in qs)
    assert set(counts) == set(bench.HEADLINE)
    assert all(c == 1 for c in counts.values())
