#!/usr/bin/env python
"""Interleaved A/B settling the r15 transitive_closure_depth perf-weak
verdict: NEW = per-root aggregate broadcast-joined back (shipped r15);
OLD = root_n as count(*) OVER (PARTITION BY anc) — a window partitioned by
a 2-value key. Both run the identical doubling loop (the exact-rounds
bound is strictly-fewer-joins and not under suspicion); only the root_n
tail differs. Outputs are checksum-compared each run.

Usage: python tools/ab_closure_r16.py [reps] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _closure_window(spark, sf_dir):
    """r15-pre-43eb51d tail: window root_n over the same doubling loop."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from hri_flink_validation_passthrough_spark.materialize import cut
    from hri_flink_validation_passthrough_spark.plans.relational import _closure_rounds
    from hri_flink_validation_passthrough_spark.session import load_table, prepare

    prepare(spark)
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    max_key = c.agg(F.max("c_custkey")).collect()[0][0]
    max_key = -1 if max_key is None else int(max_key)
    dom = spark.range(0, max_key + 1).select(F.col("id").alias("node"))
    is_root = F.col("node") <= 2
    state = dom.select(
        "node",
        F.when(is_root, F.col("node"))
        .otherwise(F.greatest(F.expr("node div 3"), F.lit(1)))
        .alias("anc"),
        F.when(is_root, F.lit(0)).otherwise(F.lit(1)).cast("long").alias("depth"),
    )
    state = state.transform(cut(iterative=True))
    rounds = _closure_rounds(int(max_key))
    for i in range(rounds):
        hop = state.select(
            F.col("node").alias("h_node"),
            F.col("anc").alias("h_anc"),
            F.col("depth").alias("h_depth"),
        )
        state = state.join(hop, state.anc == hop.h_node).select(
            "node",
            F.col("h_anc").alias("anc"),
            (F.col("depth") + F.col("h_depth")).alias("depth"),
        )
        if i % 2 == 1 or i == rounds - 1:
            state = state.transform(cut(iterative=True))
    resolved = c.join(state, c.c_custkey == state.node)
    w = Window.partitionBy("anc")
    return resolved.select(
        "c_custkey",
        F.col("anc").alias("root_key"),
        "depth",
        F.count(F.lit(1)).over(w).cast("long").alias("root_n"),
    )


def _checksum(df):
    from pyspark.sql import functions as F

    r = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64("c_custkey", "root_key", "depth", "root_n")).alias("h"),
    ).collect()[0]
    return (r["n"], r["h"])


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from hri_flink_validation_passthrough_spark.session import build_session

    spark = build_session(
        "ab_closure_r16", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    fn_new = entry.queries()["transitive_closure_depth"]

    def run(tag, f):
        t0 = time.perf_counter()
        f(spark, sf_dir).write.mode("overwrite").format("noop").save()
        dt = time.perf_counter() - t0
        print(f"{tag}: {dt:.3f}s", flush=True)
        return dt

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    run("warm-new", fn_new)
    run("warm-old", _closure_window)
    cn, co = _checksum(fn_new(spark, sf_dir)), _checksum(_closure_window(spark, sf_dir))
    print(f"checksum new={cn} old={co} equal={cn == co}")

    res = {"new": [], "old": []}
    for i in range(reps):
        res["new"].append(run(f"rep{i} NEW", fn_new))
        res["old"].append(run(f"rep{i} OLD", _closure_window))
    for arm in ("new", "old"):
        t = sorted(res[arm])
        print(f"{arm}: best {t[0]:.3f} med {t[len(t)//2]:.3f} all {[round(x,3) for x in res[arm]]}")
    spark.stop()


if __name__ == "__main__":
    main()
