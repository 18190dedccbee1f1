"""Query registry: every engine capability is exposed as a named query.

Each entry pairs a Spark implementation ``fn(spark, sf_dir) -> DataFrame``
with an (optional) ANSI-SQL oracle string that DuckDB runs on the same parquet
tables. The driver hash-compares the two at sf0.01 (order-insensitive, columns
sorted by name) — so every computed column is aliased identically on both
sides, doubles are rounded identically on both sides, and timestamps are
emitted as formatted strings to sidestep tz/precision representation drift.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""


# module-level registries are merged by __spark_entry__
def register(registry: dict[str, QuerySpec], name: str, oracle: str | None, doc: str = ""):
    """Decorator: add a query function to a module registry."""

    def deco(fn):
        registry[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco
