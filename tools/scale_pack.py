#!/usr/bin/env python
"""Multi-level depth soak for the recursive packing prefix sum (r15,
VERDICT ask #4).

r14 replaced sequence_packing's upper prefix level (one global window over
N/64 block totals + a FORCED driver broadcast) with a recursive
blocks-of-blocks exclusive prefix (`exclusive_block_offsets`). The r14
pins shrink the bar to 1/4/64 on driver-sized data; this soak exercises
the recursion at REAL scale and at the PRODUCTION bar:

1. **sf1 real corpus** (make_scale 10x of sf0.1, 50k docs): the block
   summary is ~781 rows — single-task top level at the production bar.
   Arms: production bar vs the bar forced ONE level lower (256 rows, so
   the 781-row summary recurses once). Equality + wall per arm.
2. **synthetic 2^23-row frame** (spark.range -> deterministic n_tokens;
   pack_token_counts is frame-parameterized, so this is the production
   plan on a frame whose 131072-row block summary EXCEEDS the production
   64k bar): the recursion engages at the SHIPPED bar value — no test
   shrinkage — and a second arm forces one more level (bar 1024: depth
   131072 -> 2048 -> 32). Equality + wall per arm.
3. Physical-plan excerpt of the synthetic production-bar arm: the
   offsets join must show the reused level-1 hash partitioning (no third
   full-data exchange) or an AQE broadcast of the summary side — the
   exchange-reuse claim from the r14 plan-lint rationale, checked on the
   multi-level plan shape.

Checksums: (row count, sum(start_offset), max(chunk_id)) — depth cannot
change a single offset, so the three-tuple pins bit-equality of the
packing without a 2^23-row collect.

Usage: python tools/scale_pack.py [sf1_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _checksum(df):
    from pyspark.sql import functions as F

    r = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("start_offset").alias("s"),
        F.max("chunk_id").alias("c"),
    ).collect()[0]
    return (int(r["n"]), int(r["s"]), int(r["c"]))


def _timed(fn, reps=3):
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        walls.append(time.perf_counter() - t0)
    return out, min(walls), walls


def main() -> None:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfgen/sf1"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    from hri_flink_validation_passthrough_spark.operators import sampling
    from hri_flink_validation_passthrough_spark.operators.sampling import (
        pack_token_counts,
        sequence_packing,
    )
    from hri_flink_validation_passthrough_spark.session import build_session

    spark = build_session("scale_pack", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    prod_bar = sampling.PREFIX_SINGLE_TASK_BAR
    print(f"production PREFIX_SINGLE_TASK_BAR = {prod_bar}")

    # --- arm 1: real 10x corpus, production bar vs one level lower -----
    if os.path.isdir(sf1):
        n_docs = spark.read.parquet(f"{sf1}/documents.parquet").count()
        n_sum = n_docs // sampling.PACK_BLOCK + 1
        print(f"[sf1] docs={n_docs} block-summary~{n_sum} rows")
        cs_prod, w_prod, walls_p = _timed(
            lambda: _checksum(sequence_packing(spark, sf1))
        )
        try:
            sampling.PREFIX_SINGLE_TASK_BAR = 256  # one level below n_sum
            cs_deep, w_deep, walls_d = _timed(
                lambda: _checksum(sequence_packing(spark, sf1))
            )
        finally:
            sampling.PREFIX_SINGLE_TASK_BAR = prod_bar
        print(f"[sf1] prod-bar  checksum={cs_prod} best={w_prod:.3f}s {walls_p}")
        print(f"[sf1] bar=256   checksum={cs_deep} best={w_deep:.3f}s {walls_d}")
        assert cs_prod == cs_deep, "depth changed the packing on sf1!"
    else:
        print(f"[sf1] {sf1} missing — run tools/make_scale.py first", file=sys.stderr)

    # --- arm 2: synthetic 2^23 frame, recursion AT the production bar --
    n = 1 << 23  # block summary = n/64 = 131072 > 65536 -> genuine depth 2
    frame = spark.range(n).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") * F.lit(2654435761)) % 997 + 1).alias("n_tokens"),
    )
    print(f"[syn] rows={n} block-summary={n // sampling.PACK_BLOCK} rows")
    cs_p2, w_p2, walls_p2 = _timed(lambda: _checksum(pack_token_counts(frame)))
    try:
        sampling.PREFIX_SINGLE_TASK_BAR = 1024  # force one MORE level
        cs_d2, w_d2, walls_d2 = _timed(lambda: _checksum(pack_token_counts(frame)))
    finally:
        sampling.PREFIX_SINGLE_TASK_BAR = prod_bar
    print(f"[syn] prod-bar  checksum={cs_p2} best={w_p2:.3f}s {walls_p2}")
    print(f"[syn] bar=1024  checksum={cs_d2} best={w_d2:.3f}s {walls_d2}")
    assert cs_p2 == cs_d2, "depth changed the packing on the synthetic frame!"

    # --- plan excerpt: exchange reuse / AQE broadcast on offsets join --
    # The EXECUTED (AQE-final) plan, not the initial one: AQE converts the
    # offsets joins to broadcast at runtime when the summary side is small,
    # and reuse only materializes in the final plan.
    df = pack_token_counts(frame)
    df.count()  # execute so AQE finalizes every stage
    plan = df._jdf.queryExecution().executedPlan().toString()
    wanted = [
        ln
        for ln in plan.splitlines()
        if any(
            k in ln
            for k in (
                "Exchange",
                "ReusedExchange",
                "Broadcast",
                "Window",
                "AQEShuffleRead",
                "Join",
            )
        )
    ]
    print("[plan] executed (AQE-final) skeleton of the production-bar plan:")
    for ln in wanted:
        print("   ", ln.rstrip()[:150])
    spark.stop()


if __name__ == "__main__":
    main()
