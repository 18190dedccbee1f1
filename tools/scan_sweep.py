#!/usr/bin/env python
"""Consumer-fanout scan sweep: flag queries that scan a base table >= N times.

The round-5 perf lesson: a small reused intermediate (an aggregate, a
dictionary, a model table) that is NOT persisted re-runs its whole lineage —
including the base-table scan — once per consumer. Harmless at sf0.1, the
entire cost at 100 TB (observed: lm_trigram_score 18 s -> 1.7 s at sf1 from
one such fix). This sweep counts ``Scan parquet`` occurrences per table in
each registered query's FRESH formatted plan (the section above the first
InMemoryRelation, so already-persisted lineage reprints don't false-flag)
and prints queries that hit the threshold.

Triage guidance for flags (not every flag is a bug):
- pushdown-pruned mini-scans (e.g. IVF centroid/query subsets filtered by
  ``vec_id < k``) are cheap — the scan reads a sliver;
- inherently multi-scan shapes (TPC-H Q21's l1/l2/l3) are the query;
- re-scanning a FACT table 2-3x is usually the right trade vs caching
  O(data) — persist only intermediates much smaller than their input.

Usage: python tools/scan_sweep.py [threshold=3] [sf_dir=/root/testdata/sf0.01]
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    threshold = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    n_flagged = 0
    for name, fn in sorted(entry.queries().items()):
        if name.startswith("stream_"):
            continue  # constructing these boots a streaming query
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            live = plan.split("InMemoryRelation")[0]
            tables = re.findall(r"file:[^\n]*?/(\w+)\.parquet", live)
            hot = {t: n for t, n in Counter(tables).items() if n >= threshold}
            if hot:
                n_flagged += 1
                print(f"FLAG {name}: {hot}")
        except Exception as ex:  # noqa: BLE001 — diagnostic sweep, keep going
            print(f"ERR {name}: {str(ex)[:120]}")
    print(f"sweep done: {n_flagged} flagged at threshold {threshold}")


if __name__ == "__main__":
    main()
