#!/usr/bin/env python
"""r16 optimization-round measurement harness (guide §1).

For each headline query (bench.py HEADLINE + HEADLINE2):
  - time fn(spark, sf_dir) (plan construction, driver-side) vs the noop-sink
    execution, warm (2nd rep) — separates planning tax from compute;
  - count Spark jobs the warm rep triggers (extra jobs = driver-side
    collects / checkpoint barriers);
  - dump .explain("formatted") to plans/r16/<query>_<tag>.txt.

Usage: python tools/r16_measure.py <tag> [query ...]
  tag = before | after (suffix for the plan files)
  default queries = HEADLINE + HEADLINE2
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    import bench

    names = sys.argv[2:] or (bench.HEADLINE + bench.HEADLINE2)

    from hri_flink_validation_passthrough_spark.session import build_session

    spark = build_session("r16_measure", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    queries = entry.queries()
    os.makedirs(os.path.join(REPO, "plans", "r16"), exist_ok=True)

    # warm JVM like bench.py
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    tracker = spark.sparkContext.statusTracker()
    rows = []
    for name in names:
        fn = queries[name]
        if name.startswith("stream_"):
            continue
        # rep 1: cold (warms per-query persisted state exactly like bench)
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        t_plan_cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        t_exec_cold = time.perf_counter() - t0
        # rep 2: warm, with job counting
        all_before = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
        t0 = time.perf_counter()
        df2 = fn(spark, SF_DIR)
        t_plan = time.perf_counter() - t0
        t0 = time.perf_counter()
        df2.write.mode("overwrite").format("noop").save()
        t_exec = time.perf_counter() - t0
        all_after = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
        n_jobs = all_after - all_before
        # plan dump (before the write, formatted)
        plan_path = os.path.join(REPO, "plans", "r16", f"{name}_{tag}.txt")
        try:
            plan = df2._sc._jvm.PythonSQLUtils.explainString(
                df2._jdf.queryExecution(), "formatted"
            )
        except Exception:
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df2.explain("formatted")
            plan = buf.getvalue()
        with open(plan_path, "w") as fh:
            fh.write(plan)
        rows.append((name, t_plan_cold, t_exec_cold, t_plan, t_exec, n_jobs))
        print(
            f"{name}: cold plan {t_plan_cold:.3f}s exec {t_exec_cold:.3f}s | "
            f"warm plan {t_plan:.3f}s exec {t_exec:.3f}s | jobs(warm) {n_jobs}",
            flush=True,
        )

    print("\n== summary (warm) ==")
    for name, _pc, _ec, tp, te, nj in sorted(rows, key=lambda r: -(r[3] + r[4])):
        print(f"{name:38s} plan {tp:6.3f}  exec {te:6.3f}  total {tp+te:6.3f}  jobs {nj}")
    spark.stop()


if __name__ == "__main__":
    main()
