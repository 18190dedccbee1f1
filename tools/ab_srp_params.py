#!/usr/bin/env python
"""A/B the SRP-LSH parameter-scaling lever (r12 — backs the srp_lsh_pairs
docstring): at growing corpus size, RANDOM band collisions at fixed
(SRP_ROWS, SRP_BANDS) inflate the candidate stage; production raises rows
(and re-splits the bit budget into fewer, longer bands) to hold bucket
occupancy. Each arm runs in a FRESH JVM (the signature UDF factory bakes
the module constants at build time), 1 warm + 3 measured reps, and the
arms' pair sets are compared for equality (the lever must be a
constant-factor knob, never a correctness one — miss probability at the
0.95 threshold stays <= ~3e-5 for the B arm on near-orthogonal corpora).

The B arm re-splits the SAME 256-bit budget into 16 bands x 16 rows
(the signature packing needs bits % 64 == 0, so the budget is held and
only the band shape moves). The parent captures each arm's report and
prints an explicit PAIRS EQUAL / PAIRS DIFF verdict line from the parsed
n_pairs/pairs_hash — the B arm's theoretical miss at EXACTLY the 0.95
threshold is ~4%, so equality is expected only when the corpus's true
pairs sit safely above the threshold; a DIFF is reported, not asserted
(the lever is a perf knob with a quantified recall floor, see
tests/test_llm_operators.py's band-shape recall pin).

Usage: python tools/ab_srp_params.py [sfdir] [rows_b=16] [bands_b=16]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_arm(sf: str, rows: int, bands: int, cpus: int):
    from hri_flink_validation_passthrough_spark.operators import dedup as D
    from hri_flink_validation_passthrough_spark.session import build_session

    D.SRP_ROWS = rows
    D.SRP_BANDS = bands  # bit budget = rows * bands, resolved at call time

    spark = build_session(f"ab_srp_{rows}x{bands}", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    def once() -> float:
        t = time.perf_counter()
        D.dedup_embedding_srp_lsh(spark, sf).write.mode("overwrite").format(
            "noop"
        ).save()
        return time.perf_counter() - t

    once()  # warm: session memos, codegen
    reps = [once() for _ in range(3)]
    pairs = {
        (r["vec_a"], r["vec_b"])
        for r in D.dedup_embedding_srp_lsh(spark, sf).collect()
    }
    spark.stop()
    return reps, pairs


def _pairs_digest(pairs: set) -> str:
    """Process-stable digest (hash(frozenset) is salted for str elements —
    two arms in different JVM-less subprocesses must agree bit-for-bit)."""
    import hashlib

    return hashlib.sha256(repr(sorted(pairs)).encode()).hexdigest()[:16]


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfgen/sf1"
    rows_b = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    bands_b = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    # fresh process per arm so the baked UDF constants cannot leak across
    if os.environ.get("_AB_SRP_ARM"):
        rows, bands = (
            (8, 32)
            if os.environ["_AB_SRP_ARM"] == "A"
            else (rows_b, bands_b)
        )
        reps, pairs = run_arm(sf, rows, bands, cpus)
        print(
            f"ARM {os.environ['_AB_SRP_ARM']} rows={rows} bands={bands} "
            f"reps={[round(t, 3) for t in reps]} "
            f"best={min(reps):.3f} median={statistics.median(reps):.3f} "
            f"n_pairs={len(pairs)} pairs_hash={_pairs_digest(pairs)}",
            flush=True,
        )
        return

    import re
    import subprocess

    # ADVICE r12: the parent COMPARES the arms — capture each arm's report,
    # parse n_pairs/pairs_hash, and print an explicit verdict so a silent
    # correctness regression between arms surfaces without a manual diff.
    parsed: dict[str, tuple[int, str]] = {}
    for arm in ("A", "B"):
        env = dict(os.environ, _AB_SRP_ARM=arm)
        out = subprocess.run(
            [sys.executable, __file__, *sys.argv[1:]],
            env=env,
            check=True,
            capture_output=True,
            text=True,
        ).stdout
        print(out, end="", flush=True)
        m = re.search(r"n_pairs=(\d+) pairs_hash=(\w+)", out)
        if m:
            parsed[arm] = (int(m.group(1)), m.group(2))
    if len(parsed) == 2:
        (na, ha), (nb, hb) = parsed["A"], parsed["B"]
        if (na, ha) == (nb, hb):
            print(f"PAIRS EQUAL: both arms found {na} pairs, hash {ha}")
        else:
            print(
                f"PAIRS DIFF: A n={na} hash={ha} vs B n={nb} hash={hb} "
                f"(delta {na - nb:+d} — expected to be the near-threshold "
                f"tail; investigate if |delta|/n exceeds ~1e-4)"
            )
    else:
        print("PAIRS VERDICT UNAVAILABLE: could not parse both arm reports")


if __name__ == "__main__":
    main()
