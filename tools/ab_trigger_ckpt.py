"""A/B the per-trigger state-commit overhead of the bounded replay (r13 #7).

BASELINE.md r13 measured ~0.75 s/trigger of microbatch overhead on the
past-the-bar bounded replay (state-store commit + planning). This tool
asks whether the RocksDB provider's CHANGELOG checkpointing (append the
per-batch delta, snapshot asynchronously/periodically) moves that number
versus the default full-snapshot upload, at the same 25-trigger split —
and anchors both against the group_state path (HDFSBackedStateStore).

Same harness as the r13 measurement: sf0.1 events (100k rows), warn bar
patched to 20k so the staged replay re-stages into ~4k-row files with
maxFilesPerTrigger=1 (25 triggers). Each rep times the full registered
query fn end-to-end (staging + replay + summarize); arms interleave, one
warm pass first.

Usage: python tools/ab_trigger_ckpt.py [reps=3]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CHANGELOG_CONF = (
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from hri_flink_validation_passthrough_spark.protobuf_shim import (
        pre_jvm_env,
    )
    from hri_flink_validation_passthrough_spark.session import build_session
    from hri_flink_validation_passthrough_spark.streaming import (
        topology,
        windows,
    )

    # the TWS arms need a protobuf runtime visible to every Python process
    # the JVM launches — must run BEFORE the JVM starts (conftest does the
    # same for the test tier)
    pre_jvm_env()
    spark = build_session("trigger_ckpt_ab", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # force the past-the-bar branch: 100k events / (20k/5 rows per file)
    # = 25 staged files, one per trigger (the r13 measurement shape)
    topology.TRIGGER_GROUP_WARN_ROWS = 20_000

    fn = windows.QUERIES["stream_passthrough_route"].fn
    real_build = topology.build_routed_stream

    def run_once(arm: str) -> float:
        if arm == "group_state":
            prefer = False
        else:
            prefer = True
            spark.conf.set(_CHANGELOG_CONF, str(arm == "changelog").lower())

        def forced(records, notifs, **kw):
            kw["prefer_transform_with_state"] = prefer
            return real_build(records, notifs, **kw)

        topology.build_routed_stream = forced
        try:
            t0 = time.perf_counter()
            n = fn(spark, sf_dir).count()
            dt = time.perf_counter() - t0
        finally:
            topology.build_routed_stream = real_build
            spark.conf.unset(_CHANGELOG_CONF)
        assert n > 0
        return dt

    arms = ["group_state", "snapshot", "changelog"]
    for a in arms:  # warm pass: JIT, parquet cache, python worker pool
        run_once(a)

    times: dict[str, list[float]] = {a: [] for a in arms}
    for r in range(reps):
        for a in arms:
            dt = run_once(a)
            times[a].append(dt)
            print(f"rep {r} {a:12s} {dt:.2f}s", file=sys.stderr)

    print("\narm           min     median  all (25-trigger bounded replay)")
    for a in arms:
        ts = sorted(times[a])
        med = ts[len(ts) // 2]
        print(
            f"{a:12s}  {ts[0]:6.2f}  {med:6.2f}  "
            + "/".join(f"{t:.2f}" for t in times[a])
        )


if __name__ == "__main__":
    main()
