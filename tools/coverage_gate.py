#!/usr/bin/env python
"""Line-coverage gate — parity with the reference's JaCoCo minimum
(build.gradle:226-237: `violationRules { limit { minimum = 0.90 } }`).

The container has neither coverage.py nor pytest-cov (and installs are
barred), so this uses stdlib ``trace`` with everything outside the repo
ignored: the global trace hook returns None for stdlib/site-packages
frames, so line events fire only inside ``hri_flink_validation_passthrough_spark/``
and the overhead stays tolerable.

Scope caveats (documented, JaCoCo-comparable-but-not-identical):
- Python-UDF bodies run in forked worker processes and are not observed by
  the in-process tracer; their lines stay IN the denominator (no marker
  mechanism — r13 correction of an over-claim here), which honestly
  depresses the per-file numbers of pandas-UDF-heavy modules
  (multimodal/similarity/fixture). They are behavior-tested through their
  operators' oracle checks instead.
- The Kafka builders require a broker/connector jar absent here; kafka.py
  is excluded the same way the reference excludes its uncovered config
  shell from the JaCoCo rule.

Usage: ``python tools/coverage_gate.py`` (runs the designated test set,
prints per-file and total coverage, exits 1 below the threshold).
"""

from __future__ import annotations

import os
import sys
import trace

THRESHOLD = 0.90
PKG = "hri_flink_validation_passthrough_spark"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Files whose code runs out-of-process (Python UDF workers) or against
# infrastructure absent in the container; excluded from the gate denominator.
EXCLUDED_FILES = {"sources/kafka.py"}

# The gate's test set: the ENTIRE suite (r13 — the r9-era designated list
# had aged: rounds 10-13 added modules whose tests live in newer files
# (similarity ladder -> test_ann_quality/test_trained_*/test_round*_ops,
# state_ttl -> test_round10_ops, materialize.py -> test_materialize,
# ckpt.py -> test_plan_lint), so the gate under-measured real coverage
# at 89.2%. The path-filtered tracer keeps overhead tolerable: only
# package frames pay; streaming waits are untraced sleeps.)
TEST_SET = sorted(
    os.path.relpath(p, REPO)
    for p in __import__("glob").glob(os.path.join(REPO, "tests", "test_*.py"))
)


def main() -> int:
    os.chdir(REPO)
    sys.path.insert(0, REPO)
    tracer = trace.Trace(count=1, trace=0)
    # Do NOT use trace's ignoredirs: its ignore cache is keyed by module
    # BASENAME, so ignoring site-packages also ignores any repo module that
    # shares a name with a pyspark/pandas module (session.py, functions,
    # monitor, __init__ ... all silently dropped — observed as 0% rows).
    # Instead, filter by full path: only frames inside the package are
    # traced, everything else returns None (which also makes tracing cheap).
    pkg_prefix = os.path.join(REPO, PKG) + os.sep

    def globaltrace(frame, why, arg):
        if why == "call" and frame.f_code.co_filename.startswith(pkg_prefix):
            return tracer.localtrace
        return None

    tracer.globaltrace = globaltrace
    # StreamingQueryListener callbacks (streaming/monitor.py) arrive on py4j
    # callback threads; runfunc only hooks the calling thread, so register
    # the same hook for threads spawned during the run.
    import threading

    threading.settrace(globaltrace)

    import pytest

    rc = tracer.runfunc(pytest.main, ["-q", "-p", "no:cacheprovider", *TEST_SET])
    if rc != 0:
        print(f"coverage gate: test set FAILED (pytest rc={rc})", flush=True)
        return int(rc)

    counts = tracer.results().counts  # {(filename, lineno): hits}
    hit_by_file: dict[str, set[int]] = {}
    for (fn, lineno), _hits in counts.items():
        if f"{os.sep}{PKG}{os.sep}" in fn:
            hit_by_file.setdefault(fn, set()).add(lineno)

    total_exec = total_hit = 0
    print(f"\n{'file':<58} {'lines':>6} {'hit':>6} {'cov':>7}")
    pkg_root = os.path.join(REPO, PKG)
    for dirpath, _dirs, files in os.walk(pkg_root):
        for base in sorted(files):
            if not base.endswith(".py"):
                continue
            fn = os.path.join(dirpath, base)
            rel = os.path.relpath(fn, pkg_root)
            if rel in EXCLUDED_FILES:
                print(f"{rel:<58} {'—':>6} {'—':>6} {'excl':>7}")
                continue
            executable = _executable_lines(fn)
            hit = hit_by_file.get(fn, set()) & executable
            total_exec += len(executable)
            total_hit += len(hit)
            cov = len(hit) / len(executable) if executable else 1.0
            print(f"{rel:<58} {len(executable):>6} {len(hit):>6} {cov:>6.1%}")

    total = total_hit / total_exec if total_exec else 1.0
    print(f"\nTOTAL: {total_hit}/{total_exec} = {total:.1%} "
          f"(threshold {THRESHOLD:.0%})")
    if total < THRESHOLD:
        print("coverage gate: FAIL")
        return 1
    print("coverage gate: PASS")
    return 0


def _executable_lines(fn: str) -> set[int]:
    """Executable (bytecode-bearing) lines of a module, via compile()."""
    import dis

    with open(fn, encoding="utf-8") as fh:
        src = fh.read()
    try:
        code = compile(src, fn, "exec")
    except SyntaxError:
        return set()
    lines: set[int] = set()

    def walk(c):
        lines.update(l for _o, l in dis.findlinestarts(c) if l is not None)
        for const in c.co_consts:
            if hasattr(const, "co_code"):
                walk(const)

    walk(code)
    # compile() marks def/class/docstring lines as starts too; that matches
    # what trace counts, so numerator and denominator agree.
    return lines


if __name__ == "__main__":
    sys.exit(main())
