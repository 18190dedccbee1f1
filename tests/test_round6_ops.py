"""Semantic pins for the round-6 fixes and operators.

ADVICE-r5 regression pins first (short-doc PMI clamp, shared-table memos),
then the semantics tests for queries added this round.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_pmi_handles_short_documents(spark, tmp_path):
    """ADVICE r5: a document with <= PMI_W tokens used to drive F.slice's
    length expression negative and throw at runtime; the clamp makes short
    docs contribute zero pairs (matching the oracle's empty range())."""
    from hri_flink_validation_passthrough_spark.operators.corpus import (
        pmi_cooccurrence_topk,
    )

    rows = [
        # 2-token docs (< PMI_W+1: the gap-2/3 slice length would go
        # negative without the clamp); 5 copies clear the PMI_MIN=5 floor
        *[(i, "alpha beta", "en", "s", 10) for i in range(1, 6)],
        (6, "x", "en", "s", 1),  # single token: no pairs at ANY gap
        (7, "one two three four five six seven eight", "en", "s", 40),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = pmi_cooccurrence_topk(spark, str(tmp_path)).collect()  # must not throw
    pairs = {r["pair"] for r in out}
    # doc 1 still contributes its one adjacent pair; doc 2 none
    assert "alpha beta" in pairs
    assert not any(p.startswith("x ") or p.endswith(" x") for p in pairs)


def test_bm25_scored_is_session_memoized(spark):
    """ADVICE r5: bm25_keyword_search and hybrid_search_rrf share one scored
    table per (session, dataset) instead of persisting independent copies."""
    from hri_flink_validation_passthrough_spark.operators import similarity

    a = similarity._bm25_scored(spark, SF)
    b = similarity._bm25_scored(spark, SF + "/")  # normalized key
    assert a is b


def test_oriented_edges_is_session_memoized(spark):
    """Triangle count and clustering coefficient share one oriented edge
    list (src < dst) instead of persisting two copies."""
    from hri_flink_validation_passthrough_spark.operators import graph

    a = graph._oriented_edges(spark, SF)
    b = graph._oriented_edges(spark, SF + "/")
    assert a is b
    # orientation invariant: every edge strictly low->high
    assert a.filter(F.col("src") >= F.col("dst")).count() == 0
