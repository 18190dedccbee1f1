"""Round-9 additions: streaming incremental dedup (r8 verdict ask #3) and
the PQ rerank-depth recall sweep (ask #5)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_ORACLE
from tests.oracle import assert_matches_oracle

_PROVIDERS = {
    "hdfs": "org.apache.spark.sql.execution.streaming.state."
    "HDFSBackedStateStoreProvider",
    "rocksdb": "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider",
}


# --------------------------------------------------------------------------
# Streaming incremental dedup
# --------------------------------------------------------------------------


@pytest.mark.parametrize("provider", sorted(_PROVIDERS))
def test_stream_dedup_incremental_both_backends(spark, provider):
    """The continuous-ingest twin must hash-match the batch twin's oracle
    on BOTH state-store providers (the provider conf is read lazily at
    checkpoint init, so it is stashed/restored around the full query)."""
    import __spark_entry__ as entrymod

    conf = "spark.sql.streaming.stateStore.providerClass"
    try:
        prev = spark.conf.get(conf)
    except Exception:
        prev = None
    spark.conf.set(conf, _PROVIDERS[provider])
    try:
        qs, osql = entrymod.queries(), entrymod.oracle_sql()
        name = "stream_dedup_incremental"
        assert_matches_oracle(
            qs[name](spark, SF_ORACLE), osql[name], SF_ORACLE, name
        )
    finally:
        if prev is None:
            spark.conf.unset(conf)
        else:
            spark.conf.set(conf, prev)


def test_stream_dedup_incremental_matches_batch_twin(spark):
    """Stream and batch twins must agree row-for-row — same split, same
    banding, same verification, different execution engines."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    got = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in qs["stream_dedup_incremental"](spark, SF_ORACLE).collect()
    }
    want = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in qs["dedup_incremental_delta"](spark, SF_ORACLE).collect()
    }
    assert got == want


def test_stream_dedup_incremental_is_multi_microbatch(spark, monkeypatch):
    """The replay must actually exercise >1 microbatch (maxFilesPerTrigger=1
    over the multi-file delta) — otherwise the foreachBatch loop degenerates
    to a single batch job and the epoch-idempotence shape goes untested.

    r15 fix: the old witness looked for LEFTOVER ``hri_sdi_*`` run dirs in
    the tempdir, but the query cleans its run tree on every successful exit
    (the r12 lifecycle fix) — the witness only ever passed when suite
    ordering happened to leave dirs behind, and fails deterministically in
    isolation. Defer the query's own rmtree for its run dir, count the
    per-epoch output directories, then remove it ourselves."""
    from hri_flink_validation_passthrough_spark.streaming.windows import (
        _SDI_DELTA_FILES,
        stream_dedup_incremental,
    )

    assert _SDI_DELTA_FILES >= 2
    import os
    import re
    import shutil

    real_rmtree = shutil.rmtree
    kept: list[str] = []

    def deferring_rmtree(path, *a, **kw):
        if os.path.basename(str(path)).startswith("hri_sdi_"):
            kept.append(str(path))
            return None
        return real_rmtree(path, *a, **kw)

    monkeypatch.setattr(shutil, "rmtree", deferring_rmtree)
    try:
        stream_dedup_incremental(spark, SF_ORACLE).collect()
    finally:
        monkeypatch.setattr(shutil, "rmtree", real_rmtree)
    assert kept, "stream_dedup_incremental left no run directory"
    epochs = [
        d
        for d in os.listdir(os.path.join(kept[0], "out"))
        if re.fullmatch(r"e\d+", d)
    ]
    for p in kept:
        real_rmtree(p, ignore_errors=True)
    assert len(epochs) >= 2, f"expected >=2 microbatch epochs, got {epochs}"


# --------------------------------------------------------------------------
# PQ rerank-depth recall sweep
# --------------------------------------------------------------------------


def test_ann_pq_depth_sweep_matches_oracle(spark):
    import __spark_entry__ as entrymod

    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    name = "ann_pq_depth_recall_sweep"
    assert_matches_oracle(qs[name](spark, SF_ORACLE), osql[name], SF_ORACLE, name)


def test_ann_pq_depth_sweep_monotone(spark):
    """Recall must be non-decreasing in rerank depth, and the max-depth
    point must coincide with the shipped PQ_SHORTLIST so the sweep's
    deepest row IS the production configuration's measured recall."""
    from hri_flink_validation_passthrough_spark.operators.similarity import (
        PQ_SHORTLIST,
        SWEEP_DEPTHS,
        ann_pq_depth_recall_sweep,
    )

    assert max(SWEEP_DEPTHS) == PQ_SHORTLIST
    rows = sorted(
        ann_pq_depth_recall_sweep(spark, SF_ORACLE).collect(),
        key=lambda r: r["depth"],
    )
    recalls = [r["mean_recall"] for r in rows]
    assert recalls == sorted(recalls), f"recall not monotone in depth: {recalls}"
    assert recalls[-1] >= 0.85, (
        f"max-depth recall {recalls[-1]:.2f} fell below the composed "
        "IVF-PQ pin (measured 0.90)"
    )
