#!/usr/bin/env python
"""Interleaved A/B of the SRP signature stage's materialization policy
(r7 verdict ask #2; r13: the knob is now the REPO-WIDE materialize.POLICY
switch, generalized per the r12 verdict): the r7 driver bench showed
dedup_embedding_srp_lsh
+35.8% after commit 6b8b962 swapped a per-call persist for a lazy
localCheckpoint — the one touched headline regressor. This harness runs the
candidate policies INTERLEAVED in one session (A-B-C-A-B-C...) so box drift
hits all arms equally, unlike consecutive driver rounds.

Policies:
  ckpt     lazy localCheckpoint (shipped in r7)
  persist  persist() + explicit unpersist after the consuming action
           (the leak-free form of the pre-r7 per-call persist)
  none     no materialization (pandas-UDF stage recomputes per consumer)

Usage: python tools/ab_srp_materialize.py [reps-per-arm, default 4]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from hri_flink_validation_passthrough_spark.session import build_session
    from hri_flink_validation_passthrough_spark.operators import dedup
    from hri_flink_validation_passthrough_spark import materialize

    spark = build_session("srp_ab", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    fn = dedup.dedup_embedding_srp_lsh

    def run_once(policy: str) -> float:
        # try/finally: a throw mid-measurement must not leave the production
        # knob on 'persist'/'none' or handles pinned — that would skew every
        # later arm in this session (r8 ADVICE)
        materialize.POLICY = policy
        try:
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
        finally:
            # explicit unpersist AFTER the consuming action — the leak-free
            # persist contract the r7 verdict asked to benchmark
            materialize.release_pinned()
            materialize.POLICY = "ckpt"
        return dt

    arms = ["ckpt", "persist", "none", "reliable"]  # reliable: r13 cluster arm
    # one unmeasured warm pass (JIT, parquet footer cache, broadcast paths)
    for a in arms:
        run_once(a)

    times: dict[str, list[float]] = {a: [] for a in arms}
    for r in range(reps):
        for a in arms:  # interleaved: every rep cycles all arms
            dt = run_once(a)
            times[a].append(dt)
            print(f"rep {r} {a:8s} {dt:.3f}s", file=sys.stderr)

    print("\npolicy    min     median  mean    all")
    for a in arms:
        ts = times[a]
        print(
            f"{a:8s} {min(ts):.3f}  {statistics.median(ts):.3f}  "
            f"{statistics.mean(ts):.3f}  {[round(t, 3) for t in ts]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
