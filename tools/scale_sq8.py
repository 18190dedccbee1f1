#!/usr/bin/env python
"""Scale soak for the SQ8 search rung (r11).

Measures at each sf dir (default sf0.1 and the make_scale.py sf1),
best-of-3 warm walls for:
- knn_brute_force: the exact raw-float scan (the bandwidth ceiling),
- ann_sq8_adc_topk: the flat SQ8 ADC scan + exact rerank (registered),
- ann_ivf_sq8_topk: the composed IVF-pruned SQ8 path (the 100 TB shape).

Expectation: the two flat scans grow ~linearly with the corpus while the
IVF-composed path grows with rows-per-probed-cell only — the same
pruning shape as the PQ read paths in SCALING.md.

Usage: python tools/scale_sq8.py [sfdir ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sfs = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/sfgen/sf1"]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from hri_flink_validation_passthrough_spark.session import build_session

    for sf in sfs:
        from hri_flink_validation_passthrough_spark.operators import (
            similarity as S,
        )

        spark = build_session(f"scale_sq8_{os.path.basename(sf)}", cpus=cpus)
        spark.sparkContext.setLogLevel("ERROR")

        for label, fn in (
            ("knn_brute_force", S.knn_brute_force),
            ("ann_sq8_adc_topk", S.ann_sq8_adc_topk),
            ("ann_ivf_sq8_topk", S.ann_ivf_sq8_topk),
        ):

            def run_once() -> float:
                t = time.perf_counter()
                fn(spark, sf).write.mode("overwrite").format("noop").save()
                return time.perf_counter() - t

            run_once()  # warm (memoized cell assignment builds here)
            ts = [run_once() for _ in range(3)]
            print(
                f"{os.path.basename(sf)} {label}: "
                f"reps={[round(t, 3) for t in ts]} best={min(ts):.3f} "
                f"median={statistics.median(ts):.3f}",
                flush=True,
            )
        spark.stop()


if __name__ == "__main__":
    main()
