#!/usr/bin/env python
"""Interleaved worktree A/B for the r15 optimization targets.

Method of record (BASELINE.md r13): alternating fresh JVMs per tree,
best-of + per-rep list reported, same box, back to back. Each arm runs the
named queries warm (1 untimed + N timed reps via the noop sink) inside one
session, exactly like bench.py's timing discipline.

Usage: python tools/ab_r15_queries.py TREE_A TREE_B [sessions=3] [reps=3] [sf_dir] [q1 q2 ...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

DEFAULT_QUERIES = [
    "transitive_closure_depth",
    "dedup_clusters",
    "dedup_embedding_srp_lsh",
    "passthrough_route",
]

_CHILD = r"""
import sys, time, json
repo = sys.argv[1]
sys.path.insert(0, repo)
sf = sys.argv[2]
reps = int(sys.argv[3])
names = json.loads(sys.argv[4])
from hri_flink_validation_passthrough_spark.session import build_session
spark = build_session("ab_r15", cpus=int(__import__("os").environ.get("SPARK_GRAFT_CPUS", "32")))
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as entry
qs = entry.queries()
spark.range(1_000_000).selectExpr("sum(id)").collect()
out = {}
for name in names:
    fn = qs[name]
    fn(spark, sf).write.mode("overwrite").format("noop").save()  # warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(spark, sf).write.mode("overwrite").format("noop").save()
        ts.append(round(time.perf_counter() - t0, 3))
    out[name] = ts
print("ABRESULT " + json.dumps(out), flush=True)
spark.stop()
"""


def run_arm(tree: str, sf: str, reps: int, names: list[str]) -> dict:
    env = dict(os.environ)
    p = subprocess.run(
        [sys.executable, "-c", _CHILD, tree, sf, str(reps), json.dumps(names)],
        capture_output=True, text=True, env=env, cwd=tree,
    )
    for line in p.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    print(p.stdout[-2000:], file=sys.stderr)
    print(p.stderr[-2000:], file=sys.stderr)
    raise RuntimeError(f"arm failed in {tree}")


def main() -> None:
    tree_a, tree_b = sys.argv[1], sys.argv[2]
    sessions = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    sf = sys.argv[5] if len(sys.argv) > 5 else "/root/testdata/sf0.1"
    names = sys.argv[6:] or DEFAULT_QUERIES

    acc: dict[str, dict[str, list[float]]] = {tree_a: {}, tree_b: {}}
    for s in range(sessions):
        for tree in (tree_a, tree_b):
            res = run_arm(tree, sf, reps, names)
            for q, ts in res.items():
                acc[tree].setdefault(q, []).extend(ts)
            print(f"session {s} {tree}: "
                  + " ".join(f"{q}={min(ts):.3f}" for q, ts in res.items()),
                  flush=True)

    print("\n== pooled (min / median) ==")
    import statistics
    for q in names:
        row = []
        for tree in (tree_a, tree_b):
            ts = acc[tree][q]
            row.append(f"{tree}: min {min(ts):.3f} med {statistics.median(ts):.3f}")
        print(f"{q:32s} " + " | ".join(row))


if __name__ == "__main__":
    main()
