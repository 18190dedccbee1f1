#!/usr/bin/env python
"""Rep-spread adjudication for set_similarity_prefix_join (r8 verdict ask #1):
the r8 driver bench recorded +113% (0.579 -> 1.233 s) on code with ZERO diffs
since r5. There is no candidate policy to race, so per the verdict's fallback
protocol this harness bounds the SAME-CODE rep spread: several fresh sessions,
each warming once (builds the shingle/prefix memos exactly like the driver's
best-of-2 first pass) then measuring R reps; if the pooled spread covers both
driver numbers, the delta is box drift, not a plan cost.

Usage: python tools/ab_prefix_join.py [sessions=4] [reps-per-session=4]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sessions = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from hri_flink_validation_passthrough_spark.session import build_session
    from hri_flink_validation_passthrough_spark.operators import linkage

    all_times: list[float] = []
    bests: list[float] = []
    for s in range(sessions):
        spark = build_session(f"prefix_ab_{s}", cpus=cpus)
        spark.sparkContext.setLogLevel("ERROR")
        fn = linkage.set_similarity_prefix_join

        def run_once() -> float:
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            return time.perf_counter() - t0

        warm = run_once()  # cold: builds shingle + prefix memos (unmeasured)
        ts = [run_once() for _ in range(reps)]
        all_times.extend(ts)
        bests.append(min(ts))
        print(
            f"session {s}: warm={warm:.3f}s reps={[round(t, 3) for t in ts]} "
            f"best={min(ts):.3f}s",
            file=sys.stderr,
        )
        # fresh JVM per session so parquet footer caches / code caches /
        # persisted memos never carry across arms
        spark.stop()

    print(
        f"\npooled warm reps n={len(all_times)}: min={min(all_times):.3f} "
        f"median={statistics.median(all_times):.3f} "
        f"mean={statistics.mean(all_times):.3f} max={max(all_times):.3f}"
    )
    print(f"per-session bests (driver records best-of-2): "
          f"{[round(b, 3) for b in bests]}")
    print("driver anchors: r7=0.579s  r8=1.233s")


if __name__ == "__main__":
    main()
