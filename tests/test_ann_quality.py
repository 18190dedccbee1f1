"""ANN approximation-quality guards: the approximate paths must stay close
to the exact baseline, not merely oracle-match their own definitions.

Recall is measured against `knn_brute_force` (exact cosine top-5) over the
driver's deterministic embeddings, so these numbers are exact and stable —
the pins sit just below measured values to catch a quality regression
(e.g. a banding/codebook change that silently guts recall) without flaking.

Context for the PQ floor: the synthetic embeddings are near-random unit
vectors — the worst case for product quantization (no cluster structure to
exploit; measured one-shot ADC recall@5 is 0.16 at 8×8-dim and 0.38 at
16×4-dim subspaces with the frozen-init codebook). The shipped two-phase
shape (ADC shortlist of 50 → exact rerank) measures 0.92 with the
Lloyd-TRAINED codebook (r10; 0.82 at the frozen init — even this
worst-case corpus rewards training, because Lloyd provably shrinks
quantization error) and is the production IVF-PQ read path; real embedding
corpora compress far better. Trained-vs-frozen curves are guarded in
tests/test_trained_pq.py.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_ORACLE


def _topsets(df):
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r["qid"], set()).add(r["nid"])
    return out


@pytest.fixture(scope="module")
def exact(spark):
    from hri_flink_validation_passthrough_spark.operators.similarity import (
        knn_brute_force,
    )

    return _topsets(knn_brute_force(spark, SF_ORACLE))


def _mean_recall(exact, approx):
    recalls = [
        len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact
    ]
    return sum(recalls) / len(recalls)


def test_ivf_recall_vs_exact(spark, exact):
    from hri_flink_validation_passthrough_spark.operators.similarity import (
        ann_ivf_topk,
    )

    r = _mean_recall(exact, _topsets(ann_ivf_topk(spark, SF_ORACLE)))
    assert r >= 0.85, f"IVF mean recall@5 dropped to {r:.3f} (measured 0.92)"


def test_pq_adc_rerank_recall_vs_exact(spark, exact):
    from hri_flink_validation_passthrough_spark.operators.similarity import (
        ann_pq_adc_topk,
    )

    r = _mean_recall(exact, _topsets(ann_pq_adc_topk(spark, SF_ORACLE)))
    assert r >= 0.85, (
        f"PQ shortlist+rerank mean recall@5 dropped to {r:.3f} "
        "(measured 0.92 trained / 0.82 frozen on this worst-case corpus)"
    )


def test_ivfpq_composed_recall_vs_exact(spark, exact):
    """The composed IVF-PQ path: probing costs what IVF costs (cells missed),
    the in-cell ADC shortlist + exact rerank costs almost nothing more —
    measured 0.92 (trained codebook, r10) vs IVF's 0.92 on this worst-case
    random corpus."""
    from hri_flink_validation_passthrough_spark.operators.similarity import (
        ann_ivfpq_topk,
    )

    r = _mean_recall(exact, _topsets(ann_ivfpq_topk(spark, SF_ORACLE)))
    assert r >= 0.85, f"IVF-PQ mean recall@5 dropped to {r:.3f} (measured 0.92)"


def test_sq8_adc_rerank_recall_vs_exact(spark, exact):
    """SQ8 is the near-lossless rung of the quantized-scan ladder: per-
    vector symmetric int8 keeps max-abs reconstruction error ~0.4% of
    |x|max, so the ADC shortlist of 50 (10% of this corpus) must recover
    the exact top-5 perfectly (measured 1.00). A drop below 1.0 here
    while PQ holds its floor means the SQ8 quantize/decode math changed."""
    from hri_flink_validation_passthrough_spark.operators.similarity import (
        ann_sq8_adc_topk,
    )

    r = _mean_recall(exact, _topsets(ann_sq8_adc_topk(spark, SF_ORACLE)))
    assert r >= 1.0, f"SQ8 shortlist+rerank mean recall@5 dropped to {r:.3f}"


def test_ivf_sq8_composed_equals_ivf(spark):
    """The full SQ8 read path (IVF cell pruning -> int8 ADC scan within
    probed cells -> exact rerank) must return EXACTLY what the pure-IVF
    exact scan returns over the same probed candidate set: the near-
    lossless SQ8 shortlist of 50 recovers the within-probe top-5, so any
    divergence is a bug in the decode or the shared shortlist/rerank
    tail, not an approximation artifact."""
    from hri_flink_validation_passthrough_spark.operators.similarity import (
        ann_ivf_sq8_topk,
        ann_ivf_topk,
    )

    want = {tuple(r) for r in ann_ivf_topk(spark, SF_ORACLE).collect()}
    got = {tuple(r) for r in ann_ivf_sq8_topk(spark, SF_ORACLE).collect()}
    assert got == want


def test_filtered_ann_matches_sql_oracle_and_fills_topk(spark):
    """Filtered vector search, oracle-checked with the driver's own
    compare (registered r12 — this pytest pins the fill/underfill guard
    the driver's hash compare can't express): the metadata predicate
    applies to the candidate set BEFORE distance work, inside the probed
    cells. With this corpus's 50% selectivity every query still fills a
    complete top-5."""
    from hri_flink_validation_passthrough_spark.operators.similarity import (
        NLIST,
        NPROBE,
        N_QUERIES,
        _ivf_topk_oracle,
        ann_ivf_filtered_topk,
    )
    from tests.oracle import assert_matches_oracle

    oracle = _ivf_topk_oracle(
        NLIST, NPROBE, cand_predicate=" AND a.vec_id % 2 = 0"
    )
    df = ann_ivf_filtered_topk(spark, SF_ORACLE)
    assert_matches_oracle(df, oracle, SF_ORACLE, name="ann_ivf_filtered_topk")
    rows = df.collect()
    assert all(r["nid"] % 2 == 0 for r in rows)
    per_q = {}
    for r in rows:
        per_q[r["qid"]] = per_q.get(r["qid"], 0) + 1
    # every query present AND full — a dict built from the result alone
    # would silently skip a fully-underfilled query (review finding)
    assert sorted(per_q) == list(range(N_QUERIES)), per_q
    assert all(per_q[q] == 5 for q in per_q), per_q
