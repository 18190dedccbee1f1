"""Round-10 additions: streaming ANN index maintenance (r9 verdict ask #2)
— the continuous-ingest leg of the durable-index trio."""

from __future__ import annotations

import glob
import os

import pytest

from tests.conftest import SF_ORACLE
from tests.oracle import assert_matches_oracle

_PROVIDERS = {
    "hdfs": "org.apache.spark.sql.execution.streaming.state."
    "HDFSBackedStateStoreProvider",
    "rocksdb": "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider",
}


def _fresh_index_root(monkeypatch, tmp_path):
    from hri_flink_validation_passthrough_spark.operators import similarity as S

    monkeypatch.setenv(S.INDEX_ROOT_ENV, str(tmp_path))
    S._ivf_index_dir_memo.clear()
    return S


@pytest.mark.parametrize("provider", sorted(_PROVIDERS))
def test_stream_ann_maintenance_both_backends(
    spark, provider, tmp_path, monkeypatch
):
    """Hash-match the full-rebuild-equivalence oracle on BOTH state-store
    providers."""
    import __spark_entry__ as entrymod

    _fresh_index_root(monkeypatch, tmp_path)
    conf = "spark.sql.streaming.stateStore.providerClass"
    try:
        prev = spark.conf.get(conf)
    except Exception:
        prev = None
    spark.conf.set(conf, _PROVIDERS[provider])
    try:
        qs, osql = entrymod.queries(), entrymod.oracle_sql()
        name = "stream_ann_index_maintenance"
        assert_matches_oracle(
            qs[name](spark, SF_ORACLE), osql[name], SF_ORACLE, name
        )
    finally:
        if prev is None:
            spark.conf.unset(conf)
        else:
            spark.conf.set(conf, prev)


def test_stream_ann_maintenance_replay_idempotent(
    spark, tmp_path, monkeypatch
):
    """A second full replay (fresh checkpoint — epoch ids restart at 0, the
    production restart-from-scratch case) must overwrite the committed
    epoch directories byte-idempotently: same results, same epoch count,
    no row duplication in the combined index."""
    from hri_flink_validation_passthrough_spark.streaming.windows import (
        _SAIM_DELTA_FILES,
        stream_ann_index_maintenance,
    )

    S = _fresh_index_root(monkeypatch, tmp_path)
    first = {
        (r["qid"], r["nid"], r["rnk"])
        for r in stream_ann_index_maintenance(spark, SF_ORACLE).collect()
    }
    path = S.stream_maintained_ivf_index(spark, SF_ORACLE)
    epochs1 = S.committed_delta_epochs(path)
    assert len(epochs1) >= 2, "replay must span multiple microbatches"

    again = {
        (r["qid"], r["nid"], r["rnk"])
        for r in stream_ann_index_maintenance(spark, SF_ORACLE).collect()
    }
    assert again == first
    epochs2 = S.committed_delta_epochs(path)
    assert len(epochs2) == len(epochs1) <= _SAIM_DELTA_FILES + 1
    # the combined index holds every corpus vector exactly once (each
    # source is its own hive tree — read separately, union, like the
    # production reader)
    from functools import reduce

    idx = reduce(
        lambda a, b: a.unionByName(b),
        [
            spark.read.parquet(p).select("vec_id")
            for p in [path, *epochs2]
        ],
    )
    total = idx.count()
    assert total == idx.distinct().count(), "replay duplicated vectors"
    n_corpus = S._emb(spark, SF_ORACLE).count()
    assert total == n_corpus


def test_stream_ann_maintenance_leaves_base_untouched(
    spark, tmp_path, monkeypatch
):
    """The stream only ADDS committed epoch dirs under _delta_epochs — every
    base part-file survives byte-for-byte (mtime+size), the upsert
    contract's streaming analog."""
    from hri_flink_validation_passthrough_spark.streaming.windows import (
        stream_ann_index_maintenance,
    )

    S = _fresh_index_root(monkeypatch, tmp_path)
    path = S.stream_maintained_ivf_index(spark, SF_ORACLE)
    before = {
        p: (os.path.getsize(p), os.path.getmtime(p))
        for p in glob.glob(f"{path}/cell=*/*.parquet")
    }
    assert before, "base index has no cell files"
    stream_ann_index_maintenance(spark, SF_ORACLE).collect()
    after = {
        p: (os.path.getsize(p), os.path.getmtime(p))
        for p in glob.glob(f"{path}/cell=*/*.parquet")
    }
    assert after == before, "stream rewrote base index files"


def test_stream_ann_maintenance_equals_batch_trained_upsert(
    spark, tmp_path, monkeypatch
):
    """Stream-maintained and batch trained-upsert indexes share the same
    contract (base-slice-trained frozen centroids, full corpus), so their
    top-k must agree row-for-row — two ingest engines, one index."""
    from hri_flink_validation_passthrough_spark.streaming.windows import (
        stream_ann_index_maintenance,
    )

    S = _fresh_index_root(monkeypatch, tmp_path)
    got = {
        (r["qid"], r["nid"], r["rnk"])
        for r in stream_ann_index_maintenance(spark, SF_ORACLE).collect()
    }
    up = S.ivf_trained_upsert_index(spark, SF_ORACLE)
    meta = S.read_index_meta(up)
    probes = S._probes_from_centroids(spark, SF_ORACLE, meta["centroids"])
    want = {
        (r["qid"], r["nid"], r["rnk"])
        for r in S._ivf_index_read_topk(
            spark, SF_ORACLE, up, probes=probes
        ).collect()
    }
    assert got == want
