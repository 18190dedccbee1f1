"""Local replica of the driver's DuckDB-oracle compare (CORRECTNESS gate).

The driver runs each ``queries()[name]`` on Spark and ``oracle_sql()[name]``
on DuckDB over the same parquet tables, then compares row count + schema +
order-insensitive value hash with columns sorted by name. This module
reproduces that so every registered query is pre-verified in CI.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con.sql(sql).df()


def _norm(v):
    if v is None:
        return None
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return None
        return round(f, 9)
    if isinstance(v, (np.integer, int)):
        return float(v)  # unify int/float numeric identity across engines
    if isinstance(v, (np.bool_, bool)):
        return bool(v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    if isinstance(v, np.ndarray):
        return tuple(_norm(x) for x in v)
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    s = str(v)
    return None if s in ("NaT", "nan", "None", "<NA>") else s


def canon_rows(pdf) -> list[tuple]:
    cols = sorted(pdf.columns)
    rows = [
        tuple(_norm(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows, key=repr)


def assert_matches_oracle(spark_df, oracle_sql: str, sf_dir: str, name: str = "?"):
    got = canon_rows(spark_df.toPandas())
    want = canon_rows(run_oracle(oracle_sql, sf_dir))
    assert len(got) == len(want), (
        f"{name}: row count {len(got)} != oracle {len(want)}"
    )
    mismatches = [
        (i, g, w) for i, (g, w) in enumerate(zip(got, want)) if g != w
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} row mismatches; first 3: {mismatches[:3]}"
    )
