"""Schema evolution on the parquet table surface: additive columns merge,
old files read as null, pruning still reaches the scan — the contract a
long-lived table (e.g. the CDC upsert's versions) relies on when its schema
grows over time."""

from __future__ import annotations


def test_additive_column_merges_and_backfills_null(spark, tmp_path):
    root = str(tmp_path / "tbl")
    spark.range(0, 10).selectExpr("id", "id * 2 AS a").write.parquet(
        f"{root}/gen=1"
    )
    spark.range(10, 20).selectExpr(
        "id", "id * 2 AS a", "concat('v', id) AS b"
    ).write.parquet(f"{root}/gen=2")

    df = spark.read.option("mergeSchema", "true").parquet(root)
    assert [f.name for f in df.schema.fields if f.name != "gen"] == ["id", "a", "b"]
    rows = {r["id"]: (r["a"], r["b"]) for r in df.collect()}
    assert rows[3] == (6, None)  # old file: new column backfilled as null
    assert rows[15] == (30, "v15")
    assert len(rows) == 20


def test_pruned_read_skips_missing_column_files(spark, tmp_path):
    root = str(tmp_path / "tbl2")
    spark.range(0, 5).selectExpr("id", "id + 1 AS a").write.parquet(f"{root}/gen=1")
    spark.range(5, 9).selectExpr(
        "id", "id + 1 AS a", "id + 2 AS b"
    ).write.parquet(f"{root}/gen=2")
    # projecting only the original columns must not require mergeSchema
    got = sorted(
        r["a"] for r in spark.read.parquet(root).select("a").collect()
    )
    assert got == [1, 2, 3, 4, 5, 6, 7, 8, 9]


def test_cdc_versions_tolerate_added_column(spark, tmp_path):
    """A newer CDC version with an extra column still merges with history
    readers that pass mergeSchema — the upgrade path for the versioned
    table maintained by stream_cdc_upsert."""
    base = str(tmp_path / "cdc")
    spark.createDataFrame(
        [(1, "a", 2)], "user_id long, last_type string, n_updates long"
    ).write.parquet(f"{base}/v1")
    spark.createDataFrame(
        [(1, "b", 3, 0.9)],
        "user_id long, last_type string, n_updates long, quality double",
    ).write.parquet(f"{base}/v2")
    v2 = spark.read.parquet(f"{base}/v2")
    both = (
        spark.read.option("mergeSchema", "true")
        .option("recursiveFileLookup", "true")  # v{N} dirs are not key=value partitions
        .parquet(base)
    )
    assert "quality" in both.columns and v2.collect()[0]["quality"] == 0.9
