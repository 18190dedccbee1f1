"""Repo-wide plan lint: no accidental cartesian products.

Every registered batch query's physical plan is checked for
CartesianProduct / BroadcastNestedLoopJoin — the operators that turn a
100 TB join into an O(n*m) scan. Queries that are DOCUMENTED brute-force
references (the oracle twins of LSH paths) or that intentionally cross-join
a tiny broadcast side are allowlisted with the reason inline.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_ORACLE

# name -> why a nested-loop/cartesian is acceptable there
ALLOWED_NESTED_LOOP = {
    # documented brute-force reference paths (the LSH variants are the scale
    # path; these exist as their oracles):
    "dedup_embedding_cosine": "exact all-pairs oracle for dedup_embedding_srp_lsh",
    "knn_brute_force": "exact top-k baseline for ann_ivf_topk",
    # tiny broadcast cross joins by construction (scalar/1-row side):
    "ann_ivf_topk": "crossJoin against the broadcast centroid table (nlist rows)",
    "ann_ivfpq_topk": "crossJoin against the broadcast centroid table (nlist rows); the ADC/rerank stages are equi-joins on cell/vec_id",
    "ann_pq_adc_topk": "candidate codes × broadcast query set (N_QUERIES rows) — at scale the candidate side is pre-pruned by IVF cells, the query side stays a tiny broadcast",
    "kmeans_one_iteration": "crossJoin against the broadcast centroid table (nlist rows)",
    "dedup_semantic_ivf": "crossJoin against the broadcast centroid table (nlist rows); within-cell pairing itself is an equi-join on cell",
    "q11_important_parts": "1-row scalar threshold broadcast-joined",
    "q22_wealthy_inactive_customers": "1-row avg(c_acctbal) scalar broadcast cross join",
    "lm_trigram_score": "1-row corpus-total scalar broadcast cross join",
    "bm25_keyword_search": "1-row corpus-stats (N, avgdl, df) broadcast cross join",
    "tfidf_top_terms": "1-row corpus-size (N) broadcast cross join",
    "market_basket_lift": "1-row basket-count (N) scalar broadcast cross join",
    "rfm_customer_segments": "1-row cutoff-date scalar broadcast cross join",
}

# queries that EXECUTE work when constructed (streaming boots a query; these
# write files/tables) — plan text is still linted, construction is just slower
_EAGER = ("stream_",)


def _all_batch_queries():
    import __spark_entry__ as entry

    return {
        n: fn
        for n, fn in entry.queries().items()
        if not n.startswith(_EAGER)
    }


@pytest.mark.parametrize("name", sorted(_all_batch_queries()))
def test_no_accidental_cartesian(spark, name):
    fn = _all_batch_queries()[name]
    df = fn(spark, SF_ORACLE)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    nested = ("CartesianProduct" in plan) or ("BroadcastNestedLoopJoin" in plan)
    if name in ALLOWED_NESTED_LOOP:
        return  # documented; presence is allowed (not required)
    assert not nested, (
        f"{name}: plan contains a cartesian/nested-loop join — a scale "
        f"hazard; either fix the join or add an explicit allowlist entry "
        f"with justification.\n{plan[:2000]}"
    )
