"""Registry-wide degenerate-corpus pin (r14).

Every registered batch query must SURVIVE an empty corpus — at 100 TB an
over-aggressive upstream filter, an empty ingest day, or a mis-scoped
partition predicate produces exactly this input, and the pipeline must
yield empty results, not die in model-training math. The r14 sweep found
19 of 238 queries crashing (empty centroid/codebook literals failing
analysis, None from aggregates entering Python arithmetic, [0]-indexing
empty collects, divide-by-count, schema inference over part-file-less
index trees); each got a guard at its model-artifact seam. This test
keeps the whole registry inside that contract as new queries land.

One looping test (not parametrize): a single pass over the registry
shares the staged corpus and session, and the failure report lists every
offender at once instead of 238 separate entries."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory):
    import pyarrow.parquet as pq

    from hri_flink_validation_passthrough_spark.session import TABLES

    d = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        src = pq.read_schema(f"/root/testdata/sf0.001/{t}.parquet")
        pq.write_table(src.empty_table(), str(d / f"{t}.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def one_row_sf_dir(tmp_path_factory):
    """One row per table — the other degenerate shape: splits/quantile/
    upsert anchors degenerate to a single point (the r14 sweep found a
    zero PCA spectrum and a part-file-less upsert BASE tree here even
    after the empty-corpus fixes)."""
    import pyarrow.parquet as pq

    from hri_flink_validation_passthrough_spark.session import TABLES

    d = tmp_path_factory.mktemp("one_row_sf")
    for t in TABLES:
        src = pq.read_table(f"/root/testdata/sf0.001/{t}.parquet")
        pq.write_table(src.slice(0, 1), str(d / f"{t}.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def null_heavy_sf_dir(tmp_path_factory):
    """Every other row's nullable payload columns nulled — the shape real
    ingests produce (failed embed jobs, absent metadata). The r14 sweep
    found 14 crashes here: NaN cents killing the TTL worker (visible only
    as a 300 s stall before the dead-query fast-fail), NULL map keys, and
    None embeddings in every model-artifact collect."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from hri_flink_validation_passthrough_spark.session import TABLES

    nullable = {
        "documents": ["text", "lang", "source"],
        "events": ["event_type", "props", "value"],
        "embeddings": ["embedding", "label"],
        "customer": ["c_comment", "c_mktsegment"],
        "orders": ["o_comment"],
        "lineitem": ["l_comment", "l_shipmode"],
    }
    d = tmp_path_factory.mktemp("null_sf")
    for t in TABLES:
        src = pq.read_table(f"/root/testdata/sf0.001/{t}.parquet")
        n = src.num_rows
        mask = pa.array([i % 2 == 0 for i in range(n)])
        cols = {}
        for name in src.schema.names:
            col = src.column(name)
            if name in nullable.get(t, []):
                col = pc.if_else(
                    mask, col, pa.nulls(n, src.schema.field(name).type)
                )
            cols[name] = col
        pq.write_table(pa.table(cols), str(d / f"{t}.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def all_null_sf_dir(tmp_path_factory):
    """EVERY row's nullable payload columns nulled (r15, VERDICT ask #5).
    The null-heavy sweep nulls every other row, so every aggregate still
    sees data; a 100%-null payload column exercises the next seam out:
    min/max/avg collapse to None at every driver-side collect, and the
    embedding loader's null-drop leaves trainers facing a fully EMPTY
    corpus even though the table itself has rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hri_flink_validation_passthrough_spark.session import TABLES

    nullable = {
        "documents": ["text", "lang", "source"],
        "events": ["event_type", "props", "value"],
        "embeddings": ["embedding", "label"],
        "customer": ["c_comment", "c_mktsegment"],
        "orders": ["o_comment"],
        "lineitem": ["l_comment", "l_shipmode"],
    }
    d = tmp_path_factory.mktemp("all_null_sf")
    for t in TABLES:
        src = pq.read_table(f"/root/testdata/sf0.001/{t}.parquet")
        n = src.num_rows
        cols = {}
        for name in src.schema.names:
            col = src.column(name)
            if name in nullable.get(t, []):
                col = pa.nulls(n, src.schema.field(name).type)
            cols[name] = col
        pq.write_table(pa.table(cols), str(d / f"{t}.parquet"))
    return str(d)


def _sweep(spark, sf_dir, label):
    import __spark_entry__ as entrymod

    failures = {}
    for name, fn in entrymod.queries().items():
        try:
            fn(spark, sf_dir).collect()
        except Exception as e:  # noqa: BLE001 — we report them all below
            failures[name] = f"{type(e).__name__}: {str(e).splitlines()[0][:120]}"
    assert not failures, (
        f"{len(failures)} queries crash on {label}:\n"
        + "\n".join(f"  {n}: {m}" for n, m in sorted(failures.items()))
    )


def test_every_registered_query_survives_an_empty_corpus(spark, empty_sf_dir):
    _sweep(spark, empty_sf_dir, "an empty corpus")


def test_every_registered_query_survives_a_one_row_corpus(
    spark, one_row_sf_dir
):
    _sweep(spark, one_row_sf_dir, "a one-row corpus")


def test_every_registered_query_survives_a_null_heavy_corpus(
    spark, null_heavy_sf_dir
):
    _sweep(spark, null_heavy_sf_dir, "a null-heavy corpus")


def test_every_registered_query_survives_an_all_null_corpus(
    spark, all_null_sf_dir
):
    _sweep(spark, all_null_sf_dir, "an all-null-payload corpus")
