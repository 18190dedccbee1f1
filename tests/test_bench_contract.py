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


def test_stdout_line_fits_driver_tail_window():
    """Round-5 regression (VERDICT r5 #1): the driver records only the LAST
    2000 chars of stdout; the bench line grew to ~2.9k with both vs_prev maps
    and BENCH_r05.json came back parsed:null. Pin the compact line under 1800
    via the real _compact_line path, with worst-plausible-width timings
    (hundreds of seconds, 3 decimals) for every key main() emits."""
    worst = 999.999
    result = {
        "metric": "headline_queries_total_runtime",
        "value": round(worst * (len(bench.HEADLINE) + 1), 3),
        "unit": "sec",
        "queries": {n: worst for n in bench.HEADLINE + ["stream_passthrough"]},
        "metric2": "headline2_queries_total_runtime",
        "value2": round(worst * len(bench.HEADLINE2), 3),
        "queries2": {n: worst for n in bench.HEADLINE2},
        "sf": 0.1,
        # vs_prev detail must NOT leak into the stdout line
        "vs_prev": {n: {"prev": worst, "delta_pct": -99.9} for n in bench.HEADLINE},
        "vs_prev2": {n: {"prev": worst, "delta_pct": -99.9} for n in bench.HEADLINE2},
        "vs_prev_total_pct": -99.9,
    }
    line = bench._compact_line(result)
    assert len(line) < 1800, f"bench stdout line too long: {len(line)} chars"
    parsed = json.loads(line)
    assert "vs_prev" not in parsed and "vs_prev2" not in parsed
    # both metric totals must survive compaction — the driver's record for the
    # round is exactly this line
    assert parsed["metric"] == "headline_queries_total_runtime"
    assert parsed["metric2"] == "headline2_queries_total_runtime"
    assert set(parsed["queries"]) == set(bench.HEADLINE) | {"stream_passthrough"}


def test_compact_line_sheds_queries2_before_breaching():
    """Defensive path: if headline growth ever pushes the line toward the
    cliff, queries2 detail is dropped (value2 survives) rather than losing
    the whole record to the driver's tail window."""
    result = {
        "metric": "m",
        "value": 1.0,
        "unit": "sec",
        "queries": {f"q{i:04d}_{'x' * 40}": 999.999 for i in range(30)},
        "metric2": "m2",
        "value2": 2.0,
        "queries2": {f"h2_{i}": 1.0 for i in range(5)},
        "sf": 0.1,
    }
    line = bench._compact_line(result)
    parsed = json.loads(line)
    assert "queries2" not in parsed
    assert parsed["value2"] == 2.0


def test_sidecar_carries_vs_prev2_anchor():
    """Round-5 verdict ask #6: headline2 is anchored (driver 10.08 s in r5) —
    the sidecar written by the last bench run must carry queries2 so the next
    run can compute vs_prev2. Skipped only if no local sidecar exists yet
    (fresh checkout before any bench run)."""
    side = os.path.join(REPO, "bench_result.json")
    if not os.path.exists(side):
        import pytest

        pytest.skip("no local bench sidecar yet")
    with open(side) as fh:
        rec = json.load(fh)
    assert set(rec.get("queries2", {})) == set(bench.HEADLINE2), (
        "sidecar lost queries2 — vs_prev2 would be empty next round"
    )


def test_prev_anchor_is_newest_driver_record():
    """r7 ADVICE (medium): _load_prev must anchor vs_prev on the newest
    DRIVER-recorded round (BENCH_r*.json — only the driver writes those), NOT
    the sidecar, which every local bench run rewrites. Anchoring on the
    sidecar let a local iteration run silently shift the next round's
    baseline away from driver-to-driver deltas (observed r6→r7)."""
    import glob
    import re

    def _round_no(path: str) -> int:
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        return int(m.group(1)) if m else -1

    newest = None
    for path in sorted(
        glob.glob(os.path.join(REPO, "BENCH_r*.json")), key=_round_no, reverse=True
    ):
        with open(path) as fh:
            rec = json.load(fh)
        parsed = rec.get("parsed") or {}
        if parsed.get("queries") and str(parsed.get("sf")) == "0.1":
            newest = parsed
            break
    assert newest is not None, "no driver BENCH_r*.json record at sf0.1"
    prev = bench._load_prev(0.1)
    assert prev == newest, (
        "_load_prev did not return the newest driver record — the vs_prev "
        "anchor is no longer driver-to-driver"
    )


def test_prev_record_skips_mismatched_sf():
    """A local bench run at another sf must not clobber the driver's sf0.1
    anchor: _load_prev skips mismatched-sf records and falls back to the
    committed BENCH_r*.json rounds."""
    prev = bench._load_prev(0.1)
    assert str(prev.get("sf")) == "0.1"
    # no committed record exists at a made-up sf
    assert bench._load_prev(7.77) == {}


def test_stream_passthrough_auto_bounds_past_the_bar(spark, monkeypatch):
    """r13 ADVICE: bench._stream_passthrough used to declare the whole
    staged corpus as an int per_trigger_bound, which build_routed_stream
    rejects once the events table exceeds the whole-trigger bar (sf>=~5)
    — aborting the bench. The mirrored auto-bound branch must instead
    re-stage into small files + maxFilesPerTrigger=1 and still route every
    record. Bar shrunk so the sf0.001 corpus (1000 events) takes the
    branch: 1000 > 400 -> <=80-row files, one per trigger."""
    from hri_flink_validation_passthrough_spark.streaming import topology

    monkeypatch.setattr(topology, "TRIGGER_GROUP_WARN_ROWS", 400)
    dt = bench._stream_passthrough(spark, "/root/testdata/sf0.001")
    assert dt > 0
