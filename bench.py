#!/usr/bin/env python
"""Benchmark the engine's headline queries.

Runs each headline query at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Each query is forced end-to-end with the noop sink (full compute, no driver
collect). stderr carries human-readable progress; stdout is only the JSON.
"""

from __future__ import annotations

import json
import os
import sys
import time


HEADLINE = [
    # relational core
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q10_returned_customers",
    "top3_orders_per_customer",
    "events_sessionize",
    "asof_latest_order_per_event",
    # reference-parity pipeline
    "passthrough_route",
    # LLM-data operators
    "dedup_minhash_lsh",
    "dedup_exact",
    "knn_brute_force",
    "ann_ivf_topk",
    "text_quality_score",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from hri_flink_validation_passthrough_spark.session import build_session

    spark = build_session("hri_spark_bench", cpus=cpus)

    import __spark_entry__ as entrymod

    queries = entrymod.queries()

    # JVM/codegen warmup on a trivial plan
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        print(f"{name}: {dt:.3f}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
