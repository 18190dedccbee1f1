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
    missing = [n for n in bench.HEADLINE + bench.HEADLINE2 if n not in registered]
    assert not missing, f"headline queries not registered: {missing}"


def test_headline2_key_set_is_pinned():
    """The second metric's key set (round-4 verdict ask #6) — editing it
    breaks queries2's round-over-round comparability just like HEADLINE's."""
    assert bench.HEADLINE2 == [
        "ann_ivfpq_topk",
        "set_similarity_prefix_join",
        "decontam_bloom_prefilter",
        "column_profile_stats",
        "transitive_closure_depth",
    ]
    assert not set(bench.HEADLINE2) & set(bench.HEADLINE)


def test_headline_matches_prev_record_keys():
    """Every previously recorded key must still be timed next round (else its
    vs_prev row silently disappears), and every headline must have a prev row
    (else next round's delta is incomplete). stream_passthrough is the one
    non-HEADLINE metric bench.py appends. _load_prev falls back to the newest
    committed BENCH_r*.json on a fresh checkout, so this holds everywhere."""
    prev = bench._load_prev(0.1)
    assert prev, "no previous bench record found (sidecar or BENCH_r*.json)"
    expected = set(bench.HEADLINE) | {"stream_passthrough"}
    assert set(prev.get("queries", {})) == expected, (
        "previous bench record keys diverged from bench.HEADLINE — "
        "round-over-round vs_prev would be incomplete"
    )


def test_prev_record_skips_mismatched_sf():
    """A local bench run at another sf must not clobber the driver's sf0.1
    anchor: _load_prev skips mismatched-sf records and falls back to the
    committed BENCH_r*.json rounds."""
    prev = bench._load_prev(0.1)
    assert str(prev.get("sf")) == "0.1"
    # no committed record exists at a made-up sf
    assert bench._load_prev(7.77) == {}
