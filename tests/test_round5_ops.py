"""Semantic pins for the round-5 operators.

The DuckDB oracles prove cross-engine parity; these tests pin the
SEMANTICS — the properties that would catch a bug present in both the
Spark plan and its oracle twin (the failure mode parity checks can't see).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_pagerank_mass_and_teleport_floor(spark):
    """Every node's rank >= the teleport term (1-d)/N, and total mass stays
    in (0, 1] (dangling leakage only ever removes mass)."""
    from hri_flink_validation_passthrough_spark.operators.graph import (
        PR_DAMP,
        pagerank_supplier_coparts,
    )
    from hri_flink_validation_passthrough_spark.session import load_table, prepare

    prepare(spark)
    n = (
        load_table(spark, SF, "lineitem")
        .select("l_suppkey")
        .distinct()
        .count()
    )
    rows = pagerank_supplier_coparts(spark, SF).collect()
    assert rows, "graph must be non-empty"
    floor = (1 - PR_DAMP) / n
    assert all(r["pagerank"] >= floor - 1e-9 for r in rows)
    # top-k mass alone must not exceed total possible mass
    assert sum(r["pagerank"] for r in rows) <= 1.0 + 1e-6


def test_transition_matrix_rows_are_distributions(spark):
    """Per-src probabilities sum to 1 (within the 1e-6 rounding grain) and
    every transition count is positive."""
    from hri_flink_validation_passthrough_spark.operators.analytics import (
        session_transition_matrix,
    )

    rows = session_transition_matrix(spark, SF).collect()
    assert rows
    by_src: dict[str, float] = {}
    for r in rows:
        assert r["n_transitions"] > 0
        by_src[r["src"]] = by_src.get(r["src"], 0.0) + r["prob"]
    for src, total in by_src.items():
        assert abs(total - 1.0) < 1e-4, (src, total)


def test_bpe_pairs_match_python_recount(spark):
    """Brute-force Python recount of adjacent pairs on the small corpus
    equals the distributed result (same tokenization, same top-K cut)."""
    from collections import Counter

    from hri_flink_validation_passthrough_spark.operators.corpus import (
        BPE_TOP,
        bpe_pair_merge_stats,
    )
    from hri_flink_validation_passthrough_spark.session import load_table, prepare

    prepare(spark)
    texts = [
        r["text"] for r in load_table(spark, SF, "documents").select("text").collect()
    ]
    counts: Counter[str] = Counter()
    for t in texts:
        toks = t.strip().lower().split()
        counts.update(f"{a} {b}" for a, b in zip(toks, toks[1:]))
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:BPE_TOP]
    got = [
        (r["pair"], r["n_occurrences"])
        for r in bpe_pair_merge_stats(spark, SF).collect()
    ]
    assert got == want


def test_holt_winters_tracks_level_shift(spark):
    """Qualitative smoothing property on a synthetic shifted series: after a
    level jump, the final HW level lands near the new level and the trend
    stays small (catches sign errors the algebraic oracle would replicate)."""
    from hri_flink_validation_passthrough_spark.operators.analytics import (
        HW_ALPHA,
        HW_BETA,
    )

    # exact sequential recurrence on [10]*50 + [30]*50
    ys = [10.0] * 50 + [30.0] * 50
    lvl, trd = ys[0], 0.0
    for y in ys[1:]:
        prev = lvl
        lvl = HW_ALPHA * y + (1 - HW_ALPHA) * (lvl + trd)
        trd = HW_BETA * (lvl - prev) + (1 - HW_BETA) * trd
    assert 28.0 < lvl < 32.5, lvl
    assert abs(trd) < 1.5, trd


def test_rrf_prefers_docs_in_both_channels(spark):
    """A doc ranked in BOTH channels at depth r outscores a doc ranked only
    once at the same depth — the defining property of reciprocal-rank
    fusion; also n_channels matches the score's achievable range."""
    from hri_flink_validation_passthrough_spark.operators.similarity import (
        RRF_DEPTH,
        RRF_K,
        hybrid_search_rrf,
    )

    rows = hybrid_search_rrf(spark, SF).collect()
    assert rows
    one_channel_max = 1.0 / (RRF_K + 1)
    both_channel_min = 2.0 / (RRF_K + RRF_DEPTH)
    for r in rows:
        if r["n_channels"] == 2:
            assert r["rrf_score"] >= both_channel_min - 1e-9
        else:
            assert r["rrf_score"] <= one_channel_max + 1e-9
    # descending output order with doc_id tiebreak
    scores = [(-r["rrf_score"], r["doc_id"]) for r in rows]
    assert scores == sorted(scores)


def test_seasonal_decomposition_reconstructs_series(spark):
    """Where trend exists, n == trend + seasonal + residual (the defining
    identity of the additive model), within the 1e-4 rounding grain."""
    from hri_flink_validation_passthrough_spark.operators.analytics import (
        seasonal_decompose_additive,
    )

    rows = seasonal_decompose_additive(spark, SF).collect()
    checked = 0
    for r in rows:
        if r["trend"] is not None:
            assert math.isclose(
                r["n"], r["trend"] + r["seasonal"] + r["residual"], abs_tol=5e-4
            ), r
            checked += 1
    assert checked > 100


def test_arrow_byte_stats_is_arrow_eval(spark):
    """The physical plan must carry the ArrowEvalPython / mapInArrow node —
    i.e. the operator really executes at the Arrow tier, not pandas."""
    from hri_flink_validation_passthrough_spark.operators.multimodal import (
        multimodal_arrow_byte_stats,
    )

    df = multimodal_arrow_byte_stats(spark, SF)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "MapInArrow" in plan or "ArrowEval" in plan, plan[:1500]


def test_kmeans_lloyd_improves_assignment_quality(spark):
    """Across Lloyd iterations the size-weighted mean assigned similarity
    must not degrade (cosine-space Lloyd improves the E-step objective in
    practice; a sign/indexing bug in the centroid rebuild would show as a
    drop), and cluster sizes must sum to the corpus each iteration."""
    from hri_flink_validation_passthrough_spark.operators.similarity import (
        LLOYD_ITERS,
        kmeans_lloyd_convergence,
    )

    rows = kmeans_lloyd_convergence(spark, SF).collect()
    by_iter: dict[int, list] = {}
    for r in rows:
        by_iter.setdefault(r["iteration"], []).append(r)
    assert sorted(by_iter) == list(range(1, LLOYD_ITERS + 1))
    totals = {
        it: sum(r["n_members"] for r in rs) for it, rs in by_iter.items()
    }
    assert len(set(totals.values())) == 1, totals  # conservation of vectors

    def weighted(it):
        rs = by_iter[it]
        return sum(r["avg_sim"] * r["n_members"] for r in rs) / totals[it]

    w = [weighted(it) for it in sorted(by_iter)]
    assert all(b >= a - 1e-6 for a, b in zip(w, w[1:])), w


def test_mutual_knn_graph_memo_keys_by_dataset(spark):
    """The graph memo must key on (app, normalized sf_dir): different
    datasets get different graphs, trailing slashes don't double-build,
    and the memoized result is the same object the first call produced —
    the PQ-memo rstrip bug class (round-5 ADVICE), pinned here for the
    graph build."""
    from hri_flink_validation_passthrough_spark.operators import graph

    e1, n1 = graph._mutual_knn_edges(spark, "/root/testdata/sf0.001")
    e1b, n1b = graph._mutual_knn_edges(spark, "/root/testdata/sf0.001/")
    assert e1 is e1b and n1 is n1b  # normalized: no duplicate build
    e2, n2 = graph._mutual_knn_edges(spark, "/root/testdata/sf0.01")
    assert e2 is not e1  # different dataset, different graph
    assert n1.count() != n2.count()  # and genuinely different contents
