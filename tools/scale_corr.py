"""Measure the corr-matrix pre-centering lever where it matters (r13 ask #5).

The registered `numeric_corr_matrix` uses one-pass raw sufficient
statistics; its documented conditioning caveat (operators/analytics.py):
`n*Saa - Sa^2` cancellation grows with n and column magnitude, and
`ss_l_extendedprice` exceeds 2^53 near sf1, after which the double sums
quantize and the cancellation digs into rounded bits. The documented
large-SF lever is PRE-CENTERING (first pass: means; second pass: centered
co-moments — better-conditioned, one extra scan).

For each sf dir this prints, per form: wall time, the max |r_raw −
r_centered| across the 6 pairs, and the largest raw moment magnitude in
units of 2^53 — the evidence row for SCALING.md. numpy float128 (80-bit
extended on x86) of the centered form serves as the truth anchor: at
lineitem scale its co-moments carry ~18 extra mantissa bits, so both
double forms' errors are visible against it.

Usage: python tools/scale_corr.py [sfdir ...]
       (default: /root/testdata/sf0.1 /tmp/sfgen/sf1)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/sfgen/sf1"]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    from hri_flink_validation_passthrough_spark.operators.analytics import (
        _CORR_COLS,
        numeric_corr_matrix,
    )
    from hri_flink_validation_passthrough_spark.session import (
        build_session,
        load_table,
    )

    spark = build_session("scale_corr", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    pairs = [
        (a, b) for i, a in enumerate(_CORR_COLS) for b in _CORR_COLS[i + 1 :]
    ]

    for sf_dir in dirs:
        li = load_table(spark, sf_dir, "lineitem")

        # registered one-pass raw-moment form (timed end-to-end)
        t0 = time.perf_counter()
        raw = {
            (r.col_a, r.col_b): r.pearson_r
            for r in numeric_corr_matrix(spark, sf_dir).collect()
        }
        t_raw = time.perf_counter() - t0

        # pre-centered two-pass twin (the lever under measurement)
        t0 = time.perf_counter()
        means = li.agg(*[F.avg(c).alias(c) for c in _CORR_COLS]).collect()[0]
        cen = li.agg(
            *[
                F.sum(
                    (F.col(a) - means[a]) * (F.col(b) - means[b])
                ).alias(f"c_{a}_{b}")
                for a, b in pairs
            ],
            *[
                F.sum(
                    (F.col(c) - means[c]) * (F.col(c) - means[c])
                ).alias(f"v_{c}")
                for c in _CORR_COLS
            ],
        ).collect()[0]
        centered = {
            (a, b): round(
                cen[f"c_{a}_{b}"] / (cen[f"v_{a}"] * cen[f"v_{b}"]) ** 0.5, 6
            )
            for a, b in pairs
        }
        t_cen = time.perf_counter() - t0

        # extended-precision anchor: exact-ish centered moments driver-side
        X = np.column_stack(
            [
                np.asarray(c, dtype=np.float128)
                for c in zip(*li.select(*_CORR_COLS).collect())
            ]
        )
        Xc = X - X.mean(axis=0)
        idx = {c: i for i, c in enumerate(_CORR_COLS)}
        anchor = {
            (a, b): float(
                (Xc[:, idx[a]] * Xc[:, idx[b]]).sum()
                / np.sqrt(
                    (Xc[:, idx[a]] ** 2).sum() * (Xc[:, idx[b]] ** 2).sum()
                )
            )
            for a, b in pairs
        }

        # conditioning evidence: biggest raw second moment vs 2^53
        ss = li.agg(
            *[
                F.sum(F.col(c) * F.col(c)).alias(c) for c in _CORR_COLS
            ]
        ).collect()[0]
        worst_ss = max(abs(ss[c]) for c in _CORR_COLS) / 2.0**53

        err_raw = max(abs(raw[p] - anchor[p]) for p in pairs)
        err_cen = max(abs(centered[p] - anchor[p]) for p in pairs)
        drift = max(abs(raw[p] - centered[p]) for p in pairs)
        n = X.shape[0]
        print(
            f"{sf_dir}: n={n} max_ss/2^53={worst_ss:.3f} | "
            f"raw {t_raw:.2f}s err={err_raw:.2e} | "
            f"centered {t_cen:.2f}s err={err_cen:.2e} | "
            f"max|raw-centered|={drift:.2e}"
        )


if __name__ == "__main__":
    main()
