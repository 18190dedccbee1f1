"""The driver verifies only the FIRST ~50 registered queries per round, so
registration order IS verification coverage. Pin the self-rotation contract
of ``__spark_entry__._all_specs``."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_never_driver_verified_queries_register_first():
    """Window order: [latest-round failures] + [stale rows-only refresh] +
    [never-verified] + [verified tail]. After the two bounded front
    partitions, no unverified query may trail a verified one."""
    specs = list(entrymod._all_specs())
    verified = entrymod._driver_verified_names()
    front = set(entrymod._latest_round_failures()) | set(
        entrymod._stale_rows_only()
    )
    seen_verified = False
    for name in specs:
        if name in front:
            continue  # deliberately re-fronted despite being verified
        if name in verified:
            seen_verified = True
        else:
            assert not seen_verified, (
                f"unverified query {name!r} registered after a verified one — "
                "it would fall outside the driver's correctness window"
            )


def test_correctness_paths_sort_numerically(tmp_path, monkeypatch):
    """ADVICE r5: lexicographic path sort puts CORRECTNESS_r100 before r99,
    making the retry-first rule read the wrong round. Paths must sort by the
    parsed round integer."""
    import json
    import os

    for n in (9, 10, 100, 99, 2):
        with open(tmp_path / f"CORRECTNESS_r{n:02d}.json", "w") as fh:
            json.dump({}, fh)
    monkeypatch.setattr(entrymod, "_REPO_ROOT", str(tmp_path))
    rounds = [
        int(os.path.basename(p).split("_r")[1].split(".")[0])
        for p in entrymod._correctness_paths()
    ]
    assert rounds == [2, 9, 10, 99, 100]


def test_verified_tail_is_staleness_ordered():
    """The verified partition is ordered by each query's latest green
    driver receipt, OLDEST first (r7: replaced the r3 modular stride, whose
    offset collided with the previous round's slice and would have
    re-verified the same queries twice). A regression in any verified query
    resurfaces within ceil(N/window) rounds, and no receipt ages
    unboundedly."""
    specs = list(entrymod._all_specs())
    verified = entrymod._driver_verified_names()
    front = set(entrymod._latest_round_failures()) | set(
        entrymod._stale_rows_only()
    )
    tail = [n for n in specs if n in verified and n not in front]
    if len(tail) < 3:
        return  # nothing meaningful to order yet
    last_green, _, _ = entrymod._receipts()
    rounds = [last_green.get(n, -1) for n in tail]
    assert rounds == sorted(rounds), (
        "verified tail is not staleness-ordered (latest-green ascending)"
    )
    # and the window actually mixes rounds — the whole point of the order.
    # Guarded (r7 ADVICE): after a round whose window re-verifies the whole
    # tail, every latest-green round is equal and strict inequality would
    # fail spuriously even though the ordering is correct.
    if len(set(rounds)) > 1:
        assert rounds[0] < rounds[-1]


def test_no_receipt_ages_past_a_full_rotation():
    """r7 verdict ask #6: with ~228 queries and a ~50-row driver window, a
    full stalest-first rotation is ~4.6 rounds — every verified query's
    latest productive receipt must stay <= 5 rounds behind the newest round.
    If this trips, either the registry outgrew the window (shrink HEADline?
    no — revisit the rotation) or the stalest-first tail ordering regressed."""
    latest_green, _, newest = entrymod._receipts()
    if newest < 5:
        return  # too early in the build for a full rotation to exist
    overdue = {
        n: newest - r for n, r in latest_green.items() if newest - r > 5
    }
    assert not overdue, f"receipts older than one full rotation: {overdue}"


def test_retired_names_are_real_retirements():
    """r13 verdict ask #1: the RETIRED set that keeps frozen receipts out
    of the rotation must stay in lockstep with COVERAGE.md's dated
    rule-#2c/registry-swap records — a name in RETIRED that is still
    registered would silently exempt a live query from the ageing bar,
    and a retirement missing from RETIRED re-detonates the ageing test
    the next time the driver writes a CORRECTNESS file."""
    import os

    registered = set(entrymod.queries())
    assert not (entrymod.RETIRED & registered), (
        "RETIRED names must not be in the live registry: "
        f"{entrymod.RETIRED & registered}"
    )
    coverage = open(
        os.path.join(entrymod._REPO_ROOT, "COVERAGE.md"), encoding="utf-8"
    ).read()
    undocumented = {n for n in entrymod.RETIRED if n not in coverage}
    assert not undocumented, (
        f"RETIRED names without a COVERAGE.md retirement record: {undocumented}"
    )
    # every retired name really does have frozen driver receipts — that's
    # the whole reason the filter exists; an entry with no receipts is
    # either a typo or premature.
    import glob as _glob
    import json as _json

    seen: set[str] = set()
    for path in _glob.glob(
        os.path.join(entrymod._REPO_ROOT, "CORRECTNESS_r*.json")
    ):
        try:
            seen.update(_json.load(open(path)))
        except (OSError, ValueError):
            continue
    if seen:  # skip on trees without driver artifacts (fresh clones)
        phantom = entrymod.RETIRED - seen
        assert not phantom, (
            f"RETIRED names with no receipt in any CORRECTNESS file: {phantom}"
        )


def test_stale_rows_only_ignores_unproductive_rows(tmp_path, monkeypatch):
    """A failed refresh attempt (error/stall/0-row driver row) must NOT
    reset a rows-only query's staleness clock — staleness keys on the
    latest PRODUCTIVE receipt (r7 review)."""
    import json

    # r0: productive rows-only receipt; r5 (newest): a stalled attempt.
    (tmp_path / "CORRECTNESS_r00.json").write_text(
        json.dumps({"victim": {"err": "no_oracle", "spark_rows": 7}})
    )
    (tmp_path / "CORRECTNESS_r05.json").write_text(
        json.dumps({"victim": {"err": "no_oracle", "spark_rows": 0}})
    )
    monkeypatch.setattr(entrymod, "_REPO_ROOT", str(tmp_path))
    assert entrymod._stale_rows_only() == ["victim"]


def test_oracle_and_query_keys_align():
    specs = entrymod._all_specs()
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert list(queries) == list(specs)
    assert set(oracles) <= set(queries)
    # rows-only queries are the documented exceptions, not accidents
    rows_only = {n for n, s in specs.items() if not s.oracle}
    assert rows_only == set(queries) - set(oracles)
    assert len(rows_only) <= 3


def test_latest_round_hash_failures_register_at_position_zero(tmp_path, monkeypatch):
    """A query whose newest CORRECTNESS row hash-failed must lead the
    registry: its oracle fix has to land a green row in the very next
    driver window, ahead of every new registration. Simulated by writing a
    synthetic newest round that fails one otherwise-early query."""
    import json

    specs_now = list(entrymod._all_specs())
    victim = specs_now[10]  # an ordinary unverified/early query

    (tmp_path / "CORRECTNESS_r99.json").write_text(
        json.dumps(
            {victim: {"rows_match": True, "schema_match": True, "hash_match": False}}
        )
    )
    monkeypatch.setattr(entrymod, "_REPO_ROOT", str(tmp_path))
    assert entrymod._latest_round_failures() == [victim]
    assert list(entrymod._all_specs())[0] == victim


def test_regressed_previously_verified_query_also_leads(tmp_path, monkeypatch):
    """A query green in a PAST round but hash-failed in the newest one is a
    regression — it must lead the registry too, not wait for the verified-
    tail rotation to cycle back (review finding: the retry-first rule must
    not be gated on never-verified status)."""
    import json

    specs_now = list(entrymod._all_specs())
    verified_now = entrymod._driver_verified_names()
    # Exclude SUPERSEDED_IN names: their synthetic r00/r01 receipts below
    # would be erased by the supersession cutoff, failing the test for a
    # reason unrelated to what it pins (observed when the r15 receipts
    # rotated ann_ivfpq_durable_topk, superseded in r10, to the front).
    victim = next(
        n
        for n in specs_now
        if n in verified_now and n not in entrymod.SUPERSEDED_IN
    )

    (tmp_path / "CORRECTNESS_r00.json").write_text(
        json.dumps(
            {victim: {"rows_match": True, "schema_match": True, "hash_match": True}}
        )
    )
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps(
            {victim: {"rows_match": True, "schema_match": True, "hash_match": False}}
        )
    )
    monkeypatch.setattr(entrymod, "_REPO_ROOT", str(tmp_path))
    assert victim in entrymod._driver_verified_names()  # green row exists
    assert entrymod._latest_round_failures() == [victim]  # but newest is red
    assert list(entrymod._all_specs())[0] == victim


def test_registry_within_rotation_capacity():
    """r8 verdict ask #7: the ≤5-round receipt-age bound above is REACTIVE —
    it trips only after a receipt has already silently aged past a full
    rotation. This guard is PREDICTIVE: with the driver verifying W queries
    per round (observed from the CORRECTNESS records, 50 every round so
    far), receipts can only stay within 5 rounds if the registry keeps
    slack under 5*W — each net-new registration transiently eats a stalest-
    tail slot. Capacity = 5*W − 10 (the 10 reserves headroom for one
    round's worth of new registrations + stale rows-only refreshes). At
    238/240 this forces the growth decision explicitly: past ~240, prefer
    deepening existing queries (tests, scaling rows, A/Bs) or retiring a
    superseded query over net-new registration."""
    import json

    windows = [
        len(json.load(open(p))) for p in entrymod._correctness_paths()
    ]
    if not windows:
        return
    w = min(windows[-3:])  # observed driver window, newest rounds
    n = len(entrymod._all_specs())
    cap = 5 * w - 10
    assert n <= cap, (
        f"registry ({n}) exceeds rotation capacity ({cap} = 5x{w} - 10): "
        "some receipt WILL age past one full rotation — retire a query, "
        "or accept and loosen the age bound deliberately"
    )


def test_supersession_erases_pre_supersession_receipts(tmp_path, monkeypatch):
    """r10 verdict ask #1: an in-place supersession (same registration, new
    semantics — e.g. the r10 trained PQ codebook) resets the query's receipt
    age. Receipts from rounds before SUPERSEDED_IN[name] attest retired
    semantics and must not count — the query re-enters the order as
    never-verified until a post-supersession receipt lands."""
    import json

    (tmp_path / "CORRECTNESS_r05.json").write_text(
        json.dumps(
            {"victim": {"rows_match": True, "schema_match": True, "hash_match": True}}
        )
    )
    monkeypatch.setattr(entrymod, "_REPO_ROOT", str(tmp_path))
    monkeypatch.setattr(entrymod, "SUPERSEDED_IN", {"victim": 6})
    latest_green, ever_hash_green, _ = entrymod._receipts()
    assert "victim" not in latest_green
    assert "victim" not in ever_hash_green

    # a POST-supersession receipt counts again (the erase is one-way in
    # time, not a permanent blacklist)
    (tmp_path / "CORRECTNESS_r07.json").write_text(
        json.dumps(
            {"victim": {"rows_match": True, "schema_match": True, "hash_match": True}}
        )
    )
    latest_green, ever_hash_green, _ = entrymod._receipts()
    assert latest_green.get("victim") == 7
    assert "victim" in ever_hash_green


def test_superseded_queries_without_fresh_receipt_lead_the_window():
    """Live contract: every name in SUPERSEDED_IN whose latest receipt
    predates its supersession round must register inside the driver's
    ~50-query window. Once the driver re-attests the new semantics the
    query rejoins the verified tail and this check becomes vacuous for it."""
    latest_green, _, _ = entrymod._receipts()
    specs = list(entrymod._all_specs())
    for name, rno in entrymod.SUPERSEDED_IN.items():
        if name not in specs:
            continue  # retired registration
        if latest_green.get(name, -1) >= rno:
            continue  # driver already caught up
        pos = specs.index(name)
        assert pos < 50, (
            f"superseded query {name!r} (no post-r{rno} receipt) registers "
            f"at position {pos} — outside the driver's window"
        )


def test_superseded_in_names_are_real():
    """Typo guard: every SUPERSEDED_IN key must be a registered query (or a
    documented retirement still present as a module function); a misspelled
    name would silently erase nothing and the stale receipt would keep
    rotating normally. Rounds must be plausible (1..newest+1)."""
    specs = entrymod._all_specs()
    _, _, newest = entrymod._receipts()
    for name, rno in entrymod.SUPERSEDED_IN.items():
        assert name in specs, f"SUPERSEDED_IN names unknown query {name!r}"
        assert 1 <= rno <= newest + 1, (
            f"SUPERSEDED_IN[{name!r}] = {rno} is outside 1..{newest + 1}"
        )
