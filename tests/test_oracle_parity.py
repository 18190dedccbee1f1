"""Every registered query hash-matches its DuckDB oracle at the driver's SF.

This is the local pre-flight for the driver's CORRECTNESS_r{N}.json gate.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_ORACLE
from tests.oracle import assert_matches_oracle

SPECS = entrymod._all_specs()
ORACLE_NAMES = [n for n, s in SPECS.items() if s.oracle]
ROWS_ONLY_NAMES = [n for n, s in SPECS.items() if not s.oracle]


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, name):
    spec = SPECS[name]
    df = spec.fn(spark, SF_ORACLE)
    assert_matches_oracle(df, spec.oracle, SF_ORACLE, name=name)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_query_runs(spark, name):
    df = SPECS[name].fn(spark, SF_ORACLE)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert rows is not None and len(df.schema.fields) > 0
