"""Quality guards for the Lloyd-trained coarse quantizer (r8 verdict ask #2).

Two complementary pins, both against `lloyd_trained_centroids` — the exact
training loop `ivf_trained_index` bakes into the durable index build:

1. **Clustered corpus, held-out queries — training must WIN.** On a corpus
   with real cluster structure (8 gaussian bundles on the unit sphere), the
   trained centroids move from their arbitrary first-n init points to the
   cluster means, and recall@5 at equal nprobe rises measurably (held-out
   queries, i.e. queries that are NOT the init vectors). Measured 0.64 →
   0.76 at nprobe=2 for this fixed seed; the pin keeps a 0.04 margin.

2. **Isotropic driver corpus — training must NOT LOSE.** The driver's
   synthetic embeddings are near-random unit vectors (no structure to
   learn), and the benchmark's query set (vec_id < 10) coincides with the
   first-n anchor vectors — the most favorable case for the UNtrained grid.
   Even there the trained index holds recall@5 (measured 0.74 = first-n's
   0.74 at nprobe=4) and cell balance (max cell 14 vs 15). The pin is a
   0.70 floor plus balance-not-worse.

Together these document what the BASELINE.md r9 table measures: training
is recall-positive exactly when the corpus has structure — which real
embedding corpora do and the synthetic one does not.
"""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import SF_ORACLE

K = 8
DIM = 16
N = 512
SIGMA = 0.7
SEED = 2
NPROBE = 2
TOP_K = 5
QIDX = list(range(100, 110))  # held-out: none of these seed the quantizer


def _clustered_corpus() -> np.ndarray:
    rng = np.random.default_rng(SEED)
    centers = rng.normal(size=(K, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    cl = np.arange(N) % K  # first K points seed every cluster once
    return centers[cl] + SIGMA * rng.normal(size=(N, DIM))


def _cos(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return (a @ b.T) / (
        np.linalg.norm(a, axis=1)[:, None] * np.linalg.norm(b, axis=1)[None, :]
    )


def _recall_at_5(pts: np.ndarray, cents: np.ndarray, nprobe: int) -> float:
    """Mean recall@5 of IVF(cents, nprobe) vs exact cosine top-5, over the
    held-out queries — same rounded-cosine / lowest-index tiebreaks as the
    Spark assignment (`_assign_by_literal`)."""
    assign = np.round(_cos(pts, cents), 6).argmax(1)
    allsim = np.round(_cos(pts[QIDX], pts), 6)
    qsim = np.round(_cos(pts[QIDX], cents), 6)
    hits = 0
    for qi, q in enumerate(QIDX):
        exact = set(np.argsort(-allsim[qi] + (np.arange(N) == q) * 9)[:TOP_K])
        probes = np.argsort(-qsim[qi])[:nprobe]
        cand = [i for i in range(N) if assign[i] in probes and i != q]
        approx = set(sorted(cand, key=lambda i: -allsim[qi][i])[:TOP_K])
        hits += len(exact & approx)
    return hits / (len(QIDX) * TOP_K)


@pytest.fixture(scope="module")
def clustered_dir(spark, tmp_path_factory):
    """A tmp sf_dir whose embeddings.parquet carries the clustered corpus
    in the driver schema (vec_id int64, embedding list<float>)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pts = _clustered_corpus()
    d = tmp_path_factory.mktemp("clustered_sf")
    tbl = pa.table(
        {
            "vec_id": pa.array(range(N), type=pa.int64()),
            "embedding": pa.array(
                [row.astype("float32") for row in pts],
                type=pa.list_(pa.float32()),
            ),
        }
    )
    pq.write_table(tbl, str(d / "embeddings.parquet"))
    return str(d)


def test_trained_beats_firstn_on_clustered_corpus(spark, clustered_dir):
    from hri_flink_validation_passthrough_spark.operators.similarity import (
        lloyd_trained_centroids,
    )

    # the eval runs on the float32-roundtripped values Spark actually reads
    import pyarrow.parquet as pq

    pts = np.array(
        pq.read_table(clustered_dir + "/embeddings.parquet")
        .column("embedding")
        .to_pylist(),
        dtype=np.float64,
    )
    firstn = pts[:K]
    trained = np.array(
        lloyd_trained_centroids(spark, clustered_dir, k=K, iters=2)
    )
    r_first = _recall_at_5(pts, firstn, NPROBE)
    r_trained = _recall_at_5(pts, trained, NPROBE)
    assert r_trained >= r_first + 0.04, (
        f"trained quantizer no longer beats first-n on clustered data: "
        f"trained={r_trained:.2f} first-n={r_first:.2f} "
        "(measured 0.76 vs 0.64)"
    )


def test_trained_holds_recall_and_balance_on_isotropic_corpus(spark):
    """On the structureless driver corpus the trained grid must at least
    hold the line: recall@5 floor at the shipped nprobe, and no worse cell
    skew (the property that sizes index partitions at 100 TB)."""
    from pyspark.sql import functions as F

    from hri_flink_validation_passthrough_spark.operators.similarity import (
        DNLIST,
        NPROBE as SHIP_NPROBE,
        TOP_K as SHIP_TOP_K,
        _assign_by_literal,
        _emb,
        _first_n_centroids,
        _probes_from_centroids,
        knn_brute_force,
        lloyd_trained_centroids,
    )

    v = _emb(spark, SF_ORACLE)
    exact: dict[int, set[int]] = {}
    for r in knn_brute_force(spark, SF_ORACLE).collect():
        exact.setdefault(r["qid"], set()).add(r["nid"])

    def recall_and_max(cents):
        assign = _assign_by_literal(v, cents)
        probes = _probes_from_centroids(spark, SF_ORACLE, cents, nprobe=SHIP_NPROBE)
        j = (
            probes.join(
                assign.withColumnsRenamed({"vec_id": "nid", "e": "ne"}), "cell"
            )
            .filter(F.col("nid") != F.col("qid"))
            .select(
                "qid",
                "nid",
                F.round(
                    F.expr(
                        "aggregate(zip_with(qe, ne, (x, y) -> x * y),"
                        " 0D, (a, x) -> a + x)"
                        " / (sqrt(aggregate(qe, 0D, (a, x) -> a + x * x))"
                        " * sqrt(aggregate(ne, 0D, (a, x) -> a + x * x)))"
                    ),
                    6,
                ).alias("cs"),
            )
        )
        from pyspark.sql import Window

        w = Window.partitionBy("qid").orderBy(F.desc("cs"), F.asc("nid"))
        top = (
            j.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= SHIP_TOP_K)
            .collect()
        )
        approx: dict[int, set[int]] = {}
        for r in top:
            approx.setdefault(r["qid"], set()).add(r["nid"])
        rec = sum(
            len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact
        ) / len(exact)
        mx = assign.groupBy("cell").count().agg(F.max("count")).collect()[0][0]
        return rec, mx

    r_trained, mx_trained = recall_and_max(
        lloyd_trained_centroids(spark, SF_ORACLE, DNLIST, 2)
    )
    assert r_trained >= 0.70, (
        f"trained-grid recall@5 fell to {r_trained:.2f} on the isotropic "
        "corpus (measured 0.74, = first-n parity)"
    )
    _, mx_first = recall_and_max(_first_n_centroids(spark, SF_ORACLE, DNLIST))
    assert mx_trained <= mx_first, (
        f"trained grid got MORE skewed than first-n: max cell "
        f"{mx_trained} vs {mx_first} (measured 14 vs 15)"
    )
