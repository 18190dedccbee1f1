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
