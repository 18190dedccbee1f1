#!/usr/bin/env python
"""A/B: fixed-nprobe vs drift-adaptive probes (r10 verdict ask #5).

Builds trained-upsert IVF indexes over synthetic drifted corpora whose
delta piles N vectors near base vector 0 (the skew-inducing upsert
sequence from tests/test_round10_ops.py), then compares the two probe
policies on scanned index rows and recall@5 vs exact KNN. The point at
scale: the fixed policy's scan cost for pile-local queries grows linearly
with the pile, while the adaptive policy caps it near the fair-share
target — at unchanged recall (the top-cell fat gate only prunes when the
covered mass is relevant mass).

Usage: python tools/ab_adaptive_probes.py [pile_sizes...]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_corpus(tmp: str, pile: int) -> str:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(7)
    base = rng.normal(size=(300, 64))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    delta = base[0][None, :] + 0.05 * rng.normal(size=(pile, 64))
    pts = np.vstack([base, delta])
    d = os.path.join(tmp, f"corpus_{pile}")
    os.makedirs(d, exist_ok=True)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(pts)), type=pa.int64()),
            "embedding": pa.array(
                [row.astype("float32") for row in pts],
                type=pa.list_(pa.float32()),
            ),
        }
    )
    pq.write_table(tbl, os.path.join(d, "embeddings.parquet"))
    return d


def main() -> None:
    piles = [int(x) for x in sys.argv[1:]] or [100, 400, 1600]
    from hri_flink_validation_passthrough_spark.operators import similarity as S
    from hri_flink_validation_passthrough_spark.operators.similarity import (
        knn_brute_force,
    )
    from hri_flink_validation_passthrough_spark.session import build_session

    spark = build_session("ab_adaptive_probes", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="ab_adapt_")
    os.environ[S.INDEX_ROOT_ENV] = tmp

    def topsets(df):
        out: dict = {}
        for r in df.collect():
            out.setdefault(r["qid"], set()).add(r["nid"])
        return out

    print(f"{'pile':>6} {'policy':>8} {'probes':>6} {'rows':>7} "
          f"{'q0_rows':>8} {'recall@5':>9}")
    for pile in piles:
        sf = make_corpus(tmp, pile)
        S._ivf_index_dir_memo.clear()
        path = S.ivf_trained_upsert_index(spark, sf, nlist=8)
        meta = S.read_index_meta(path)
        cents = [[float(x) for x in c] for c in meta["centroids"]]
        cell_rows = meta["drift"]["cell_rows"]
        ex = topsets(knn_brute_force(spark, sf))

        for policy, probes in (
            ("fixed", S._probes_from_centroids(spark, sf, cents)),
            ("adaptive", S._adaptive_probes(spark, sf, cents, cell_rows)),
        ):
            pl = probes.select("qid", "cell").collect()
            rows = sum(cell_rows.get(str(r["cell"]), 0) for r in pl)
            q0 = sum(
                cell_rows.get(str(r["cell"]), 0) for r in pl if r["qid"] == 0
            )
            top = topsets(
                S._ivf_index_read_topk(spark, sf, path, probes=probes)
            )
            rec = sum(
                len(top.get(q, set()) & ex[q]) / len(ex[q]) for q in ex
            ) / len(ex)
            print(f"{pile:>6} {policy:>8} {len(pl):>6} {rows:>7} "
                  f"{q0:>8} {rec:>9.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
