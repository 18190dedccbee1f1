"""The driver verifies only the FIRST ~50 registered queries per round, so
registration order IS verification coverage. Pin the self-rotation contract
of ``__spark_entry__._all_specs``."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_never_driver_verified_queries_register_first():
    specs = list(entrymod._all_specs())
    verified = entrymod._driver_verified_names()
    seen_verified = False
    for name in specs:
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


def test_verified_tail_rotates_with_round_count(tmp_path, monkeypatch):
    """The verified partition's order must depend on the number of recorded
    rounds, so each round's window tail re-checks a different verified slice
    (a regression in a late-registered query can resurface)."""
    specs = list(entrymod._all_specs())
    verified = entrymod._driver_verified_names()
    tail_now = [n for n in specs if n in verified]
    if len(tail_now) < 3:
        return  # nothing meaningful to rotate yet

    # Simulate one more recorded round: same rows, one extra file.
    import json
    import shutil

    for i, src in enumerate(
        sorted(__import__("glob").glob(entrymod.os.path.join(entrymod._REPO_ROOT, "CORRECTNESS_r*.json")))
    ):
        shutil.copy(src, tmp_path / f"CORRECTNESS_r{i:02d}.json")
    n = len(list(tmp_path.glob("CORRECTNESS_r*.json")))
    shutil.copy(
        tmp_path / f"CORRECTNESS_r{n - 1:02d}.json",
        tmp_path / f"CORRECTNESS_r{n:02d}.json",
    )
    monkeypatch.setattr(entrymod, "_REPO_ROOT", str(tmp_path))
    specs_next = list(entrymod._all_specs())
    tail_next = [n_ for n_ in specs_next if n_ in verified]
    assert set(tail_now) == set(tail_next)
    assert tail_now != tail_next, "verified tail did not rotate across rounds"


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
    victim = next(n for n in specs_now if n in verified_now)

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
