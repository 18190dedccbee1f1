"""bench_result.json is the driver's round-over-round anchor: BENCH_r{N}'s
``vs_prev`` map is computed against it. Guard the comparability contract so a
headline-list edit can't silently break the per-query deltas."""

from __future__ import annotations

import json
import os

import bench
import __spark_entry__ as entrymod

REPO = os.path.dirname(os.path.abspath(bench.__file__))


def test_headline_names_are_registered_queries():
    registered = set(entrymod._all_specs())
    missing = [n for n in bench.HEADLINE if n not in registered]
    assert not missing, f"headline queries not registered: {missing}"


def test_headline_matches_sidecar_keys():
    """Every sidecar key must still be timed next round (else its vs_prev row
    silently disappears), and every headline must have a sidecar row (else
    next round's delta is incomplete). stream_passthrough is the one
    non-HEADLINE metric bench.py appends."""
    side = os.path.join(REPO, "bench_result.json")
    with open(side) as fh:
        prev = json.load(fh)
    expected = set(bench.HEADLINE) | {"stream_passthrough"}
    assert set(prev.get("queries", {})) == expected, (
        "bench_result.json keys diverged from bench.HEADLINE — "
        "round-over-round vs_prev would be incomplete"
    )


def test_sidecar_sf_matches_default_bench_sf():
    side = os.path.join(REPO, "bench_result.json")
    with open(side) as fh:
        prev = json.load(fh)
    # bench.py string-compares sf before emitting vs_prev
    assert str(prev.get("sf")) == "0.1"
