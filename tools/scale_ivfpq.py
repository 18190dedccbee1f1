#!/usr/bin/env python
"""Scale soak for the r10/r11 codes-only ingest paths (r10 verdict ask #6).

Measures, at each sf dir given (default sf0.1 and the make_scale.py sf1):
- ivfpq_trained_upsert_index: one-shot build wall (train both quantizer
  levels on the base slice + encode/assign/write base then delta), and the
  warm read (ann_ivfpq_trained_upsert_topk) best-of-3.
- stream_ivfpq_maintenance: first maintenance run (base build + stream
  replay) and steady-state maintenance wall best-of-2 (delta replay over
  committed epochs — idempotent overwrite — plus drift bookkeeping and the
  combined pruned read), the same protocol as the r10
  stream_ann_index_maintenance row.

Usage: python tools/scale_ivfpq.py [sfdir ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sfs = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/sfgen/sf1"]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from hri_flink_validation_passthrough_spark.session import build_session

    for sf in sfs:
        # fresh session AND fresh index root per sf: build costs must not
        # hide behind a previous run's published index
        import tempfile

        from hri_flink_validation_passthrough_spark.operators import (
            similarity as S,
        )
        from hri_flink_validation_passthrough_spark.streaming.windows import (
            stream_ivfpq_maintenance,
        )

        os.environ[S.INDEX_ROOT_ENV] = tempfile.mkdtemp(prefix="scale_ivfpq_")
        S._ivf_index_dir_memo.clear()
        spark = build_session(f"scale_ivfpq_{os.path.basename(sf)}", cpus=cpus)
        spark.sparkContext.setLogLevel("ERROR")

        t0 = time.perf_counter()
        S.ivfpq_trained_upsert_index(spark, sf)
        build = time.perf_counter() - t0

        def read_once() -> float:
            t = time.perf_counter()
            S.ann_ivfpq_trained_upsert_topk(spark, sf).write.mode(
                "overwrite"
            ).format("noop").save()
            return time.perf_counter() - t

        reads = [read_once() for _ in range(3)]

        def maint_once() -> float:
            t = time.perf_counter()
            stream_ivfpq_maintenance(spark, sf).write.mode(
                "overwrite"
            ).format("noop").save()
            return time.perf_counter() - t

        first = maint_once()  # includes the codes-only base build
        steady = [maint_once() for _ in range(2)]
        print(
            f"{sf}: upsert_build={build:.3f}s "
            f"read_best={min(reads):.3f}s "
            f"maint_first={first:.3f}s "
            f"maint_steady_best={min(steady):.3f}s"
        )
        spark.stop()


if __name__ == "__main__":
    main()
