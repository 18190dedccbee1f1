#!/usr/bin/env python
"""Scale soak for epoch compaction (fold_delta_epochs) on BOTH
stream-maintained index layouts (r12 — the round's headline fix made the
codes-only fold work at all).

For each sf dir, for each maintainer cell (raw vectors / codes-only):
1. run the registered streaming maintainer end-to-end (base build + live
   delta ingest into committed _delta_epochs trees),
2. snapshot the top-k read BEFORE the fold,
3. fold, timing the wall and recording file counts before/after,
4. re-run the read and assert frame-set equality (fold is pure layout
   maintenance — rows/cells/assignments must be byte-identical).

Expectation: fold wall grows ~linearly with index rows (it rewrites the
cell layout once — the compaction cost a 100 TB deployment schedules),
while the POST-fold read loses the per-epoch listing/open overhead, and
epochs after = 0 on both layouts.

Uses an isolated SPARK_GRAFT_INDEX_ROOT so published bench/test indexes
are untouched.

Usage: python tools/scale_fold.py [sfdir ...]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["SPARK_GRAFT_INDEX_ROOT"] = tempfile.mkdtemp(prefix="scale_fold_")


def main() -> None:
    sfs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from hri_flink_validation_passthrough_spark.operators import (
        maintenance as M,
    )
    from hri_flink_validation_passthrough_spark.operators import (
        similarity as S,
    )
    from hri_flink_validation_passthrough_spark.session import build_session
    from hri_flink_validation_passthrough_spark.streaming import windows as W

    for sf in sfs:
        spark = build_session(
            f"scale_fold_{os.path.basename(sf)}", cpus=cpus
        )
        spark.sparkContext.setLogLevel("ERROR")
        for label, read_fn, index_fn in (
            ("raw", W.stream_ann_index_maintenance, S.stream_maintained_ivf_index),
            (
                "codes",
                W.stream_ivfpq_maintenance,
                S.stream_maintained_ivfpq_index,
            ),
        ):
            before_rows = {tuple(r) for r in read_fn(spark, sf).collect()}
            path = index_fn(spark, sf)
            epochs = S.committed_delta_epochs(path)
            files_before = len(
                M._data_files(path, include_hidden_trees=True)
            )
            t = time.perf_counter()
            res = M.fold_delta_epochs(spark, path)
            wall = time.perf_counter() - t
            after_rows = {tuple(r) for r in read_fn(spark, sf).collect()}
            assert after_rows == before_rows, f"{label}@{sf}: read changed!"
            assert S.committed_delta_epochs(path) == []
            print(
                f"{os.path.basename(sf)} {label}: epochs={len(epochs)} "
                f"files {files_before} -> {res['files_after']} "
                f"fold_wall={wall:.2f}s read-equal=yes",
                flush=True,
            )
        spark.stop()


if __name__ == "__main__":
    main()
