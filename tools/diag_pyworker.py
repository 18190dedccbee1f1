#!/usr/bin/env python
"""Python-worker diagnostics for the passthrough_route watch (BASELINE.md
r11: the r10 driver anchor sits 20% above the same-code spread and this is
the repo's only applyInPandas-heavy headline query — worker-pool
contention on a loaded box is the remaining suspect).

Runs the query under worker-pool configurations that bracket the suspect:
- reuse=true (default): workers persist across tasks — a loaded box that
  evicts/starves the pooled workers shows up as rep-to-rep variance.
- reuse=false: a fresh fork per task — the upper bound on worker startup
  cost; if the driver anchor matches THIS arm's numbers, the spike was
  worker churn.

Per arm: fresh JVM, 1 unmeasured warm rep, R measured reps. Compare the
arms' spreads with the driver anchor to attribute (or clear) worker churn.

Usage: python tools/diag_pyworker.py [query=passthrough_route] [reps=4]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1] if len(sys.argv) > 1 else "passthrough_route"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import __spark_entry__ as entrymod
    from hri_flink_validation_passthrough_spark.session import build_session

    spec = entrymod._all_specs()[name]

    for reuse in ("true", "false"):
        spark = build_session(
            f"diag_pyworker_{reuse}",
            cpus=cpus,
            extra_conf={"spark.python.worker.reuse": reuse},
        )
        spark.sparkContext.setLogLevel("ERROR")

        def run_once() -> float:
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            return time.perf_counter() - t0

        warm = run_once()
        ts = [run_once() for _ in range(reps)]
        print(
            f"reuse={reuse}: warm={warm:.3f}s "
            f"reps={[round(t, 3) for t in ts]} "
            f"best={min(ts):.3f} median={statistics.median(ts):.3f}"
        )
        spark.stop()


if __name__ == "__main__":
    main()
