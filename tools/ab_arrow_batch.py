#!/usr/bin/env python
"""A/B the r11 passthrough_route watch's named mitigation: fewer, larger
Arrow batches (BASELINE.md r11 post-script — if the driver box's steady
state is worker churn, the fix is reducing per-task Python round-trips).

Arms: {worker reuse true/false} x {arrow.maxRecordsPerBatch 10000/65536}.
The no-reuse arms are the churn regime (a fork per task); if larger
batches help there, the conf is a cheap robustness lever for the driver
box. The reuse arms guard against regressing the quiet path.

Per arm: fresh JVM, 1 unmeasured warm rep, R measured reps.

Usage: python tools/ab_arrow_batch.py [query=passthrough_route] [reps=4]
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
        for batch in ("10000", "65536"):
            spark = build_session(
                f"ab_arrow_{reuse}_{batch}",
                cpus=cpus,
                extra_conf={
                    "spark.python.worker.reuse": reuse,
                    "spark.sql.execution.arrow.maxRecordsPerBatch": batch,
                },
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
                f"reuse={reuse} maxRecordsPerBatch={batch}: "
                f"warm={warm:.3f}s reps={[round(t, 3) for t in ts]} "
                f"best={min(ts):.3f} median={statistics.median(ts):.3f}",
                flush=True,
            )
            spark.stop()


if __name__ == "__main__":
    main()
