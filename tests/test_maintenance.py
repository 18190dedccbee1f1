"""Table-maintenance utilities: compaction preserves content and hits the
file-count target; vacuum keeps the newest versions; the layout report
reflects the filesystem truth."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hri_flink_validation_passthrough_spark.operators.maintenance import (
    compact_small_files,
    table_layout_report,
    vacuum_table_versions,
)


@pytest.fixture()
def fragmented(spark, tmp_path):
    src = str(tmp_path / "frag")
    df = spark.range(0, 20_000).selectExpr(
        "id", "id % 7 AS k", "cast(id * 1.5 as double) AS v"
    )
    df.repartition(64).write.parquet(src)
    return src


def test_layout_report_counts_files_and_rows(spark, fragmented):
    rep = table_layout_report(spark, fragmented)
    assert rep["n_files"] == 64
    assert rep["n_rows"] == 20_000
    assert rep["min_bytes"] > 0 and rep["total_bytes"] >= 64 * rep["min_bytes"]


def test_compaction_preserves_rows_and_reduces_files(spark, fragmented, tmp_path):
    dst = str(tmp_path / "compact")
    rep = compact_small_files(spark, fragmented, dst, target_bytes=1 << 30)
    assert rep["before"]["n_files"] == 64
    assert rep["after"]["n_files"] == 1  # everything fits one target file
    assert rep["after"]["n_rows"] == rep["before"]["n_rows"] == 20_000
    src_rows = sorted(
        tuple(r) for r in spark.read.parquet(fragmented).collect()
    )
    dst_rows = sorted(tuple(r) for r in spark.read.parquet(dst).collect())
    assert src_rows == dst_rows


def test_compaction_respects_target_size(spark, fragmented, tmp_path):
    dst = str(tmp_path / "sized")
    total = table_layout_report(spark, fragmented)["total_bytes"]
    rep = compact_small_files(spark, fragmented, dst, target_bytes=total // 4 + 1)
    assert rep["target_files"] == 4
    assert rep["after"]["n_files"] == 4


def test_vacuum_keeps_newest_versions(tmp_path):
    root = str(tmp_path)
    for v in (1, 2, 3, 7, 10):
        os.makedirs(os.path.join(root, f"v{v}"))
        with open(os.path.join(root, f"v{v}", "part.parquet"), "w") as fh:
            fh.write("x")
    os.makedirs(os.path.join(root, "ckpt"))  # non-version dirs untouched
    out = vacuum_table_versions(root, keep=2)
    assert out == {"kept": [7, 10], "removed": [1, 2, 3]}
    assert sorted(d for d in os.listdir(root)) == ["ckpt", "v10", "v7"]


def test_vacuum_never_drops_the_only_version(tmp_path):
    os.makedirs(tmp_path / "v5")
    out = vacuum_table_versions(str(tmp_path), keep=3)
    assert out == {"kept": [5], "removed": []}
    with pytest.raises(ValueError):
        vacuum_table_versions(str(tmp_path), keep=0)


def _mk_version(root, v, marked):
    os.makedirs(os.path.join(root, f"v{v}"))
    with open(os.path.join(root, f"v{v}", "part.parquet"), "w") as fh:
        fh.write("x")
    if marked:
        with open(os.path.join(root, f"v{v}", "_EPOCH"), "w") as fh:
            fh.write(f"{v}\nckpt-a")


def test_vacuum_prefers_dropping_uncommitted_partial_versions(tmp_path):
    """Crash between parquet write and _EPOCH marker write leaves the
    numerically-newest version uncommitted; vacuum must drop THAT one and
    keep the committed versions recover_cdc_state can actually restore."""
    root = str(tmp_path)
    for v, marked in ((1, True), (2, True), (3, False)):
        _mk_version(root, v, marked)
    out = vacuum_table_versions(root, keep=2)
    assert out == {"kept": [1, 2], "removed": [3]}

    from hri_flink_validation_passthrough_spark.streaming.windows import (
        recover_cdc_state,
    )

    rec = recover_cdc_state(root)
    assert rec["ver"] == 2 and rec["last_epoch"] == 2 and rec["run_id"] == "ckpt-a"


def test_vacuum_newest_marked_version_survives_any_keep(tmp_path):
    """keep=1 with an uncommitted newest version: the marker-ranked top pick
    is the partial v4 under pure-number ranking — the newest MARKED version
    must survive regardless so recovery never loses its anchor."""
    root = str(tmp_path)
    for v, marked in ((1, True), (2, True), (3, True), (4, False)):
        _mk_version(root, v, marked)
    out = vacuum_table_versions(root, keep=1)
    assert 3 in out["kept"]  # the recovery anchor
    assert 4 in out["removed"]  # the uncommitted partial goes first
    assert out["removed"] == [1, 2, 4]


def test_list_table_versions_excludes_unmarked(tmp_path):
    root = str(tmp_path)
    for v, marked in ((1, True), (2, False), (5, True)):
        _mk_version(root, v, marked)
    from hri_flink_validation_passthrough_spark.operators.maintenance import (
        list_table_versions,
    )

    assert list_table_versions(root) == [1, 5]
    assert list_table_versions(str(tmp_path / "nope")) == []


def test_read_table_version_time_travel(spark, tmp_path):
    """Each committed v{N} is a self-contained snapshot: time travel is a
    plain read of that directory; unknown/uncommitted versions raise with
    the committed list in the message."""
    import pytest as _pytest

    from hri_flink_validation_passthrough_spark.operators.maintenance import (
        read_table_version,
    )

    root = str(tmp_path / "tbl")
    for v, n in ((1, 3), (2, 5)):
        path = os.path.join(root, f"v{v}")
        spark.range(0, n).write.parquet(path)
        with open(os.path.join(path, "_EPOCH"), "w") as fh:
            fh.write(f"{v}\nckpt-a")
    # v3: torn write — parquet landed, marker didn't
    spark.range(0, 9).write.parquet(os.path.join(root, "v3"))

    assert read_table_version(spark, root, 1).count() == 3
    assert read_table_version(spark, root, 2).count() == 5
    with _pytest.raises(ValueError, match=r"\[1, 2\]"):
        read_table_version(spark, root, 3)  # uncommitted: not readable history
    with _pytest.raises(ValueError, match="v7"):
        read_table_version(spark, root, 7)


def test_checksum_flips_exactly_the_tampered_bucket(spark):
    """Any single-row corruption must flip its own bucket's checksum and
    no other's (md5 avalanche + XOR locality) — the property that makes
    bucket checksums a repair-scoping tool, not just a boolean."""
    from hri_flink_validation_passthrough_spark.operators.maintenance import (
        CS_BUCKETS,
        checksum_by_bucket,
    )

    df = spark.range(0, 2000).selectExpr(
        "id AS k", "CAST(id AS STRING) AS a", "CAST(id % 13 AS STRING) AS b"
    )
    base = {
        r["bucket"]: r["checksum"]
        for r in checksum_by_bucket(df, ["a", "b"], "k").collect()
    }
    tampered = df.withColumn(
        "b", F.when(F.col("k") == 777, F.lit("CORRUPT")).otherwise(F.col("b"))
    )
    after = {
        r["bucket"]: r["checksum"]
        for r in checksum_by_bucket(tampered, ["a", "b"], "k").collect()
    }
    hot = 777 % CS_BUCKETS
    assert base[hot] != after[hot]
    for bkt in base:
        if bkt != hot:
            assert base[bkt] == after[bkt]


def test_vacuum_then_time_travel_interplay(spark, tmp_path):
    """After vacuum keep=1, removed versions are no longer time-travelable
    (and say so, listing survivors), while the newest committed version
    still reads — retention policy and the read path must agree."""
    from hri_flink_validation_passthrough_spark.operators.maintenance import (
        read_table_version,
        vacuum_table_versions,
    )

    root = str(tmp_path / "tbl")
    for v, n in ((1, 2), (2, 4), (3, 6)):
        path = os.path.join(root, f"v{v}")
        spark.range(0, n).write.parquet(path)
        with open(os.path.join(path, "_EPOCH"), "w") as fh:
            fh.write(f"{v}\nckpt-a")
    out = vacuum_table_versions(root, keep=1)
    assert out["kept"] == [3] and out["removed"] == [1, 2]
    assert read_table_version(spark, root, 3).count() == 6
    with pytest.raises(ValueError, match=r"\[3\]"):
        read_table_version(spark, root, 2)


def test_committed_delta_epochs_skips_torn_and_empty(tmp_path):
    """The stream-maintained read's crash-safety contract at the listing
    layer: an epoch dir counts only with BOTH its _EPOCH marker (written
    after the parquet data) and at least one part file. A torn write
    (parquet landed, marker didn't) and an empty-trigger commit (marker,
    no rows) must both be invisible; ordering is numeric, not lexical."""
    import os

    from hri_flink_validation_passthrough_spark.operators.similarity import (
        committed_delta_epochs,
    )

    root = str(tmp_path / "idx")

    def _epoch(name: str, marker: bool, parquet: bool) -> str:
        d = os.path.join(root, "_delta_epochs", name)
        os.makedirs(os.path.join(d, "cell=0"), exist_ok=True)
        if parquet:
            with open(os.path.join(d, "cell=0", "part-0.parquet"), "wb") as fh:
                fh.write(b"x")
        if marker:
            with open(os.path.join(d, "_EPOCH"), "w") as fh:
                fh.write(name)
        return d

    committed2 = _epoch("e2", marker=True, parquet=True)
    committed10 = _epoch("e10", marker=True, parquet=True)  # numeric > e2
    _epoch("e3", marker=False, parquet=True)  # torn: no marker
    _epoch("e4", marker=True, parquet=False)  # empty trigger: no rows
    _epoch("junk", marker=True, parquet=True)  # non-epoch name ignored

    assert committed_delta_epochs(root) == [committed2, committed10]
    assert committed_delta_epochs(str(tmp_path / "missing")) == []


def test_vacuum_missing_root_is_graceful(tmp_path):
    """A scheduled vacuum against a not-yet-created table root returns the
    empty result like list_table_versions, never FileNotFoundError."""
    from hri_flink_validation_passthrough_spark.operators.maintenance import (
        vacuum_table_versions,
    )

    assert vacuum_table_versions(str(tmp_path / "nope")) == {
        "kept": [],
        "removed": [],
    }


def test_checksum_buckets_cover_negative_keys(spark):
    """checksum_by_bucket is a generic anti-entropy primitive: negative
    keys must land in 0..CS_BUCKETS-1 (pmod), not scatter across
    sign-preserving negative buckets."""
    from hri_flink_validation_passthrough_spark.operators.maintenance import (
        CS_BUCKETS,
        checksum_by_bucket,
    )

    df = spark.createDataFrame(
        [(k, f"v{k}") for k in range(-40, 40)], "k long, v string"
    )
    out = checksum_by_bucket(df, ["k", "v"], "k").collect()
    buckets = {r["bucket"] for r in out}
    assert buckets == set(range(CS_BUCKETS))
    assert sum(r["n_rows"] for r in out) == 80
