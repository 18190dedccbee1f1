"""Repo-wide physical-plan lints over every registered batch query.

Two scale-hazard classes are checked on each query's formatted plan (one
plan construction, both rules):

1. **No accidental cartesian products** — CartesianProduct /
   BroadcastNestedLoopJoin turns a 100 TB join into an O(n*m) scan.
2. **No single-partition Sort/Window over data-cardinality input**
   (round-4 verdict ask #4) — an ``Exchange SinglePartition`` feeding a
   Sort/Window runs the whole input through ONE task. Scalar aggregates
   (1-row reductions after map-side partials) and rangepartitioning output
   sorts are structurally excluded by the plan-graph walk in
   ``tools/plan_graph.py``.

Queries that are DOCUMENTED brute-force references (oracle twins of LSH
paths), intentionally cross-join a tiny broadcast side, or run their global
window over a tiny data-size-independent domain (per-block / per-day offset
tables of a two-level prefix sum) are allowlisted with the reason inline.
"""

from __future__ import annotations

import os
import sys

import pytest

from tests.conftest import REPO_ROOT, SF_ORACLE

sys.path.insert(0, os.path.join(REPO_ROOT, "tools"))
from plan_graph import single_partition_sorts  # noqa: E402

# name -> why a nested-loop/cartesian is acceptable there
ALLOWED_NESTED_LOOP = {
    # documented brute-force reference paths (the LSH variants are the scale
    # path; these exist as their oracles):
    "dedup_embedding_cosine": "exact all-pairs oracle for dedup_embedding_srp_lsh",
    "knn_brute_force": "exact top-k baseline for ann_ivf_topk",
    "hard_negative_mining": "broadcast query set (N_QUERIES rows) x candidate scan, same shape as knn_brute_force; at scale the candidate side is IVF-pruned",
    "ann_recall_at_k": "composes knn_brute_force (allowlisted exact baseline) with ann_ivf_topk — the brute-force side IS the eval ground truth",
    "ann_nprobe_recall_sweep": "same composition as ann_recall_at_k: knn_brute_force ground truth + the broadcast centroid-table crossJoin (nlist rows); the sweep itself is explode+filter over the one materialized candidate set, no extra join",
    "ann_pq_depth_recall_sweep": "same composition as ann_nprobe_recall_sweep: knn_brute_force ground truth + the broadcast centroid-table crossJoin (nlist rows); the depth sweep is explode+filter over the ONE reranked max-depth shortlist, no extra join or rerank",
    # tiny broadcast cross joins by construction (scalar/1-row side):
    "ann_ivf_topk": "crossJoin against the broadcast centroid table (nlist rows)",
    "ann_ivf_filtered_topk": "same probes-side crossJoin against the broadcast centroid table (nlist rows) as ann_ivf_topk — identical plan with the candidate filter evaluated above the assignment scan (registered r12)",
    "ann_ivf_durable_topk": "same probes-side crossJoin against the broadcast centroid table (nlist rows) as ann_ivf_topk; the index side is a partition-pruned parquet scan equi-joined on cell",
    "ann_ivf_upsert_topk": "same probes-side crossJoin against the broadcast centroid table (nlist rows); identical read path to ann_ivf_durable_topk over the upserted index dir",
    "ann_ivf_objectstore_topk": "same probes-side crossJoin against the broadcast centroid table (nlist rows) as ann_ivf_durable_topk; identical partition-pruned read path, only the catalog root is a scheme:// URI (r15 object-store arm)",
    "ann_ivf_trained_topk": "same probes-side crossJoin against the broadcast centroid table (nlist rows), built from the SIDECAR's centroids (r9: centroids ride as data, not a k x dim literal expression — 1.8x faster read path, BASELINE.md r9)",
    "ann_ivfpq_topk": "crossJoin against the broadcast centroid table (nlist rows); the ADC/rerank stages are equi-joins on cell/vec_id",
    "ann_ivfpq_durable_topk": "same probes-side crossJoin against the broadcast centroid table (nlist rows) as ann_ivfpq_topk; codes come from a partition-pruned parquet scan, ADC/rerank are equi-joins on cell/vec_id",
    "ann_pq_adc_topk": "candidate codes × broadcast query set (N_QUERIES rows) — at scale the candidate side is pre-pruned by IVF cells, the query side stays a tiny broadcast",
    "ann_sq8_adc_topk": "same shape as ann_pq_adc_topk: SQ8 candidate codes × broadcast query set (N_QUERIES rows); at scale the candidate side is pre-pruned by IVF cells",
    "kmeans_one_iteration": "crossJoin against the broadcast centroid table (nlist rows)",
    "dedup_semantic_ivf": "crossJoin against the broadcast centroid table (nlist rows); within-cell pairing itself is an equi-join on cell",
    "q11_important_parts": "1-row scalar threshold broadcast-joined",
    "q22_wealthy_inactive_customers": "1-row avg(c_acctbal) scalar broadcast cross join",
    "lm_trigram_score": "1-row corpus-total scalar broadcast cross join",
    "bm25_keyword_search": "1-row corpus-stats (N, avgdl, df) broadcast cross join",
    "tfidf_top_terms": "1-row corpus-size (N) broadcast cross join",
    "market_basket_lift": "1-row basket-count (N) scalar broadcast cross join",
    "pmi_cooccurrence_topk": "1-row corpus-totals (Tp, Tu) scalar broadcast cross join",
    "hybrid_search_rrf": "1-row query-vector broadcast cross join (dense channel)",
    "corpus_split_kl_divergence": "dense source x top-100-vocab grid cross join — n_sources x 100 rows, data-size-independent (zero-count words must contribute smoothed KL mass)",
    "naive_bayes_lang_confusion": "dense |classes| x |vocab| model grid cross join — zero-count (class, token) cells must receive Laplace-smoothed mass; both sides are aggregates, data-size-independent",
    "welch_t_event_values": "theta self-join (type_a < type_b) of the |event_types|-row moment table — both sides aggregates, |types|^2/2 output pairs, data-size-independent",
    "hll_set_algebra": "theta self-join (type_a < type_b) of the |event_types|-row DISTINCT-TYPE table forms the pair grid; the register merge itself is an equi-join on (type, bucket) and the exact counts are equi-joins on type/user — pair grid is |types|^2/2 rows, data-size-independent",
    "acf_hourly_counts": "deviation series x 24-row literal lag grid cross join — the series is the hours x types aggregate, the lag table is constant; every lag ships in one shuffle",
    "mann_whitney_u_event_types": "distinct-value table x broadcast |types|^2/2-row pair grid (OR-membership join) — both sides aggregates, data-size-independent",
    "lorenz_curve_deciles": "distinct-value cumulative table x 10-row literal decile grid cross join — aggregate x constant, data-size-independent",
    "ks_two_sample_event_types": "distinct-value table x broadcast |types|^2/2-row pair grid (OR-membership join) — both sides aggregates, data-size-independent",
    "rfm_customer_segments": "1-row cutoff-date scalar broadcast cross join",
    "decontam_bloom_prefilter": "1-row bloom-bitmap broadcast cross join (the 8 KiB model artifact rides as data, not a 1024-literal expression — r9 planning-tax fix)",
    "chi_square_type_by_dow": "1-row grand-total (n) scalar broadcast cross join onto the 35-cell contingency table",
}

# name -> why a single-partition Sort/Window is acceptable there: the window
# input is a tiny DATA-SIZE-INDEPENDENT domain (the offset level of a
# two-level prefix sum), not the record stream.
ALLOWED_GLOBAL_SORT = {
    "sequence_packing": "block-total exclusive prefix: one row per PACK_BLOCK docs (N/64 rows), joined back on the level-1 partition key (AQE broadcasts while small); above PREFIX_SINGLE_TASK_BAR the summary recurses blocks-of-blocks and only the tiny top level sorts globally",
    "max_concurrent_sessions": "day-total offset window: ONE ROW PER DAY (thousands at a century of data); the event-level running sum is partitioned by day",
    "hybrid_search_rrf": "rank assignment over the two depth-50 TakeOrderedAndProject channel outputs — k rows by construction, data-size-independent; the corpus-wide cut itself is the parallel partial top-k",
    "session_path_topk": "rank window over the path-FREQUENCY table: at most |event_types|^PATH_LEN (~625) rows regardless of data volume; session windows themselves are partitioned by user",
    "spearman_pearson_price_quantity": "band-offset windows of the two midrank dictionaries: ONE ROW PER BAND (~50 x-bands / ~100 y-bands by value-range/band_width, data-size-independent); the value-level cumulative windows are partitioned by band",
    # NOTE: the r6-verdict candidate (passthrough_terminate_relational's
    # scenario window, hidden behind an eager localCheckpoint) needs NO entry:
    # the checkpoint-capture lint shows Catalyst rewrites the row_number==100
    # filter into TakeOrderedAndProject feeding the Window — a parallel
    # partial top-k, no Exchange SinglePartition anywhere in the sub-plan.
}

# queries that EXECUTE work when constructed (streaming boots a query; these
# write files/tables) — plan text is still linted, construction is just slower
_EAGER = ("stream_", "custom_source_stream")  # boot a streaming query when constructed


def _all_batch_queries():
    import __spark_entry__ as entry

    return {
        n: fn
        for n, fn in entry.queries().items()
        if not n.startswith(_EAGER)
    }


def test_subplan_capture_is_live(spark):
    """The capture patch must actually intercept localCheckpoint — Spark 4's
    classic DataFrame subclass shadows the base method, and patching only
    the base silently captures NOTHING (observed), which would quietly
    reopen the blind spot on a PySpark bump."""
    from hri_flink_validation_passthrough_spark import ckpt

    got: list[str] = []
    with ckpt.capture_subplans(got):
        spark.range(3).localCheckpoint()
    assert len(got) == 1 and "Range" in got[0]
    # and the patch is gone outside the context: a leaked patch would still
    # append to `got` (it closes over that list), so the count must stay 1
    spark.range(3).localCheckpoint()
    assert len(got) == 1


@pytest.mark.parametrize("name", sorted(_all_batch_queries()))
def test_plan_scale_hazards(spark, name):
    from hri_flink_validation_passthrough_spark import ckpt

    fn = _all_batch_queries()[name]
    # r6 verdict blind spot: an eager localCheckpoint at construction time
    # materializes its sub-plan before the lint can see it — the final plan
    # shows only a Scan ExistingRDD. capture_subplans patches
    # DataFrame.localCheckpoint to surrender each pre-checkpoint plan, so
    # BOTH rules run over the final plan AND every hidden sub-plan.
    subplans: list[str] = []
    with ckpt.capture_subplans(subplans):
        df = fn(spark, SF_ORACLE)
    plans = [("final", ckpt.formatted_plan(df))] + [
        (f"ckpt[{i}]", p) for i, p in enumerate(subplans)
    ]

    for where, plan in plans:
        nested = ("CartesianProduct" in plan) or (
            "BroadcastNestedLoopJoin" in plan
        )
        if name not in ALLOWED_NESTED_LOOP:
            assert not nested, (
                f"{name} ({where} plan): contains a cartesian/nested-loop "
                f"join — a scale hazard; either fix the join or add an "
                f"explicit allowlist entry with justification.\n{plan[:2000]}"
            )

        hits = single_partition_sorts(plan)
        if name not in ALLOWED_GLOBAL_SORT:
            assert not hits, (
                f"{name} ({where} plan): single-partition Sort/Window "
                f"node(s) {hits} — the whole input funnels through ONE task "
                f"at scale. Partition the window, use the two-level banded "
                f"prefix-sum scheme (equi_depth_histogram / rfm bounds), or "
                f"allowlist with a tiny-domain justification.\n{plan[:2000]}"
            )
