"""Oracle output-dtype lint (round-4 verdict ask #2).

Twice now a driver CORRECTNESS hash-fail was a *type* artifact, not a value
difference: r1's ``array_functions_showcase`` and r4's ``q12_shipmode_priority``
both had identical values in both engines, but the DuckDB oracle left a
``sum(INTEGER)`` uncast, so DuckDB returned HUGEINT (→ pandas float64) while
Spark returned int64 and the driver's value hash diverged on dtype.

This lint makes the class impossible: every registered oracle is bound through
DuckDB ``DESCRIBE`` over the sf0.01 views (binding only — the query body never
executes, so the whole sweep is sub-second) and every final-projection column
must belong to the allowlist of types that have *proven* hash-stable against
Spark across four driver rounds. Any new type (HUGEINT, DECIMAL, TIMESTAMP,
LIST, …) fails here first with a pointer to the casting rules, instead of
failing in the driver a round later.
"""

from __future__ import annotations

import duckdb
import pytest

from tests.conftest import SF_ORACLE
from tests.oracle import TABLES

# Types observed across all 154 hash-green oracles through round 4. Extend
# ONLY after verifying the new type hashes identically to Spark's pandas
# output in the driver compare (sorted-column value hash):
#   - integer sums: DuckDB sum(INTEGER/BIGINT) -> HUGEINT; always
#     CAST(... AS BIGINT).
#   - timestamps: format to VARCHAR on both sides (strftime/date_format).
#   - decimals: cast to DOUBLE (then round identically on both sides).
#   - arrays: to_json/array_to_string to VARCHAR on both sides.
ALLOWED = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "VARCHAR", "DOUBLE", "FLOAT", "BOOLEAN"}


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{SF_ORACLE}/{t}.parquet'"
        )
    return con


def _oracle_items():
    import __spark_entry__ as entry

    return sorted(entry.oracle_sql().items())


@pytest.mark.parametrize(
    "name,sql", _oracle_items(), ids=[n for n, _ in _oracle_items()]
)
def test_oracle_projection_types_hashable(oracle_con, name, sql):
    desc = oracle_con.sql(f"DESCRIBE ({sql})").fetchall()
    offending = [
        (col, typ)
        for col, typ, *_ in desc
        if typ.split("(")[0].upper() not in ALLOWED
    ]
    assert not offending, (
        f"{name}: oracle projects non-hash-stable DuckDB types {offending}. "
        f"DuckDB sum(INTEGER) yields HUGEINT -> pandas float64 while Spark "
        f"yields int64, so the driver value-hash diverges on dtype even when "
        f"values are identical (this killed q12_shipmode_priority in r4 and "
        f"array_functions_showcase in r1). Cast in the oracle SQL: integer "
        f"sums -> CAST(... AS BIGINT); timestamps -> strftime VARCHAR; "
        f"decimals -> DOUBLE; arrays -> VARCHAR via to_json."
    )
