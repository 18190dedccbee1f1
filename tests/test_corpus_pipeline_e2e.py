"""End-to-end corpus-pipeline composition: the LLM-training-data user
story chained from the repo's REAL operators on one session —

    quality filter -> exact dedup -> near-dup removal -> eval-set
    decontamination -> sequence packing -> train/val/test split

Each stage is individually oracle-checked by the driver; what only THIS
test pins is the composition: stages agree on identifiers, survivor sets
shrink monotonically, and the downstream stages (packing, split) hold
their invariants over a FILTERED corpus, not just the raw table. This is
the "switch from the reference and run your pipeline" claim exercised as
one flow. Every stage expression is IMPORTED from the operators
(quality_score_per_doc, dedup_removal_list, decontam_ngram_overlap,
pack_token_counts, split_assignment_col) — the chain builder holds no
private copy that could drift from the registered semantics.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE

CONTAM_TAU = 0.05


def _run_chain(spark):
    """Stages A-D over the documents table; returns (counts, survivors)."""
    from hri_flink_validation_passthrough_spark.operators.corpus import (
        EVAL_MOD,
        EVAL_REM,
        decontam_ngram_overlap,
    )
    from hri_flink_validation_passthrough_spark.operators.dedup import (
        dedup_removal_list,
    )
    from hri_flink_validation_passthrough_spark.operators.text import (
        quality_score_per_doc,
    )
    from hri_flink_validation_passthrough_spark.session import load_table

    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "text")
    n0 = docs.count()

    # stage A — quality: the registered score per doc, keep the top 75%
    # (threshold = exact 25th percentile of the corpus itself, so the
    # stage always drops AND keeps documents on any corpus)
    scored = quality_score_per_doc(spark, SF_ORACLE).select("doc_id", "q")
    thr = scored.select(
        F.expr("percentile(q, 0.25)").alias("t")
    ).collect()[0]["t"]
    a = scored.filter(F.col("q") >= thr).select("doc_id")

    # stage B — exact dedup: keep the lowest doc_id per identical text
    # (this corpus has all-distinct texts, so B drops 0 — the invariant
    # below still must HOLD, which is the point of asserting it)
    keep_exact = (
        docs.join(a, "doc_id")
        .groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )

    # stage C — near-dup removal: anti-join the LSH-verified jaccard>=0.5
    # removal list (keep-lowest-id winners stay)
    c = keep_exact.join(
        dedup_removal_list(spark, SF_ORACLE).withColumnsRenamed(
            {"removed_doc_id": "doc_id"}
        ),
        "doc_id",
        "left_anti",
    )

    # stage D — decontamination: drop the eval holdout itself plus any
    # training doc sharing >= CONTAM_TAU of its shingles with the eval set
    contaminated = (
        decontam_ngram_overlap(spark, SF_ORACLE)
        .filter(F.col("contam_ratio") >= CONTAM_TAU)
        .select("doc_id")
    )
    d = c.filter((F.col("doc_id") % EVAL_MOD) != EVAL_REM).join(
        contaminated, "doc_id", "left_anti"
    )

    counts = {
        "raw": n0,
        "quality": a.count(),
        "exact": keep_exact.count(),
        "neardup": c.count(),
        "decontam": d.count(),
    }
    return counts, d


@pytest.fixture(scope="module")
def survivors(spark):
    counts, d = _run_chain(spark)
    d = d.persist()
    yield counts, d
    d.unpersist()


def test_stages_shrink_monotonically_and_stay_nonempty(survivors):
    counts, _ = survivors
    order = ["raw", "quality", "exact", "neardup", "decontam"]
    for prev, cur in zip(order, order[1:]):
        assert counts[cur] <= counts[prev], counts
    assert counts["quality"] < counts["raw"]  # A dropped something
    assert counts["decontam"] < counts["neardup"]  # D dropped something
    assert counts["decontam"] > 0  # and a corpus remains


def test_survivors_satisfy_every_stage_contract(spark, survivors):
    from hri_flink_validation_passthrough_spark.operators.corpus import (
        EVAL_MOD,
        EVAL_REM,
        decontam_ngram_overlap,
    )
    from hri_flink_validation_passthrough_spark.operators.dedup import (
        dedup_removal_list,
    )
    from hri_flink_validation_passthrough_spark.session import load_table

    _, d = survivors
    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "text")
    kept = d.join(docs, "doc_id")
    # no duplicate texts among survivors
    assert kept.count() == kept.select("text").distinct().count()
    # no survivor is on the near-dup removal list
    assert (
        d.join(
            dedup_removal_list(spark, SF_ORACLE).withColumnsRenamed(
                {"removed_doc_id": "doc_id"}
            ),
            "doc_id",
        ).count()
        == 0
    )
    # no eval-holdout doc and no contaminated doc among survivors
    assert d.filter((F.col("doc_id") % EVAL_MOD) == EVAL_REM).count() == 0
    assert (
        d.join(
            decontam_ngram_overlap(spark, SF_ORACLE).filter(
                F.col("contam_ratio") >= CONTAM_TAU
            ),
            "doc_id",
        ).count()
        == 0
    )


def test_packing_covers_survivors_exactly_once(spark, survivors):
    from hri_flink_validation_passthrough_spark.operators.sampling import (
        PACK_CTX,
        pack_token_counts,
    )
    from hri_flink_validation_passthrough_spark.session import load_table

    _, d = survivors
    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "text")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    t = d.join(docs, "doc_id").select(
        "doc_id", F.size(toks).cast("long").alias("n_tokens")
    )
    packed = pack_token_counts(t).collect()
    n_docs = d.count()
    assert len(packed) == n_docs  # every survivor packed exactly once
    rows = sorted(packed, key=lambda r: r["doc_id"])
    total = sum(r["n_tokens"] for r in rows)
    # offsets are the exclusive prefix sum in doc_id order: contiguous,
    # non-overlapping layout ending exactly at the token total
    run = 0
    for r in rows:
        assert r["start_offset"] == run
        assert r["chunk_id"] == run // PACK_CTX
        run += r["n_tokens"]
    assert run == total


def test_split_partitions_survivors(survivors):
    from hri_flink_validation_passthrough_spark.operators.corpus import (
        split_assignment_col,
    )

    _, d = survivors
    # the registered split's own assignment Column applied to the SURVIVOR
    # set: content-independent, so filtering upstream must not change any
    # doc's assignment — only remove docs
    per = {
        r["split"]: r["n"]
        for r in d.groupBy(split_assignment_col().alias("split"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert sum(per.values()) == d.count()  # disjoint + exhaustive
    assert per.get("train", 0) > per.get("val", 0)
    assert per.get("train", 0) > per.get("test", 0)


def test_pipeline_is_deterministic(spark, survivors):
    """Re-running the full chain yields the identical survivor set — no
    rand(), no ordering dependence anywhere in the composition."""
    counts, d = survivors
    counts2, d2 = _run_chain(spark)
    assert counts2 == counts
    ids1 = {r["doc_id"] for r in d.collect()}
    ids2 = {r["doc_id"] for r in d2.collect()}
    assert ids1 == ids2 and len(ids1) == counts["decontam"]
