"""The `hri_fixture` Python DataSource (Spark 4 DataSource API): the
reference spec's record producer as a pluggable source, batch + streaming,
driven through the SAME topology seam as the Kafka source."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def registered(spark):
    from hri_flink_validation_passthrough_spark.sources.fixture import register

    register(spark)
    return spark


def test_batch_read_shape_and_partitioning(registered):
    spark = registered
    df = (
        spark.read.format("hri_fixture")
        .option("n_batches", 4)
        .option("records_per_batch", 10)
        .load()
    )
    assert df.count() == 40
    # one generated partition per batch
    assert df.rdd.getNumPartitions() == 4
    row = df.filter(F.col("seq") == 0).collect()[0]
    assert bytes(row.key) == b"rec-0-0"
    assert json.loads(bytes(row.value))["batch"] == "batch-0"
    assert [(h.key, bytes(h.value)) for h in row.headers] == [
        ("batchId", b"batch-0")
    ]


def test_batch_records_complete_through_pipeline(registered):
    """Wire records from the source -> envelope -> state machine: every
    batch completes with the exact expected count (spec.rb happy path)."""
    spark = registered
    from hri_flink_validation_passthrough_spark.model import (
        SEND_COMPLETED,
        STARTED,
    )
    from hri_flink_validation_passthrough_spark.operators.passthrough import (
        run_pipeline_batch,
    )

    n_batches, per_batch = 3, 7
    records = (
        spark.read.format("hri_fixture")
        .option("n_batches", n_batches)
        .option("records_per_batch", per_batch)
        .load()
    )
    base = spark.createDataFrame(
        [(f"batch-{b}",) for b in range(n_batches)], "id string"
    ).select(
        "id",
        F.col("id").alias("name"),
        F.lit("ingest.t.fixture.in").alias("topic"),
        F.lit("fixture").alias("dataType"),
        F.lit(-1).alias("invalidThreshold"),
    )
    controls = base.select(
        "*",
        F.lit(STARTED).alias("status"),
        F.lit(None).cast("int").alias("expectedRecordCount"),
        F.lit(1_699_999_000_000).alias("time_ms"),
        F.lit(0).cast("long").alias("seq"),
    ).unionByName(
        base.select(
            "*",
            F.lit(SEND_COMPLETED).alias("status"),
            F.lit(per_batch).cast("int").alias("expectedRecordCount"),
            F.lit(1_700_000_900_000).alias("time_ms"),
            F.lit(1).cast("long").alias("seq"),
        )
    )
    routed = run_pipeline_batch(records, controls, completion_delay_ms=1000)
    summary = (
        routed.groupBy("batch_id")
        .agg(
            F.count(F.when(F.col("dest") == "out", 1)).alias("n_out"),
            F.max(
                F.when(
                    F.col("dest") == "notification",
                    F.get_json_object(F.col("value").cast("string"), "$.status"),
                )
            ).alias("final"),
        )
        .collect()
    )
    assert len(summary) == n_batches
    for r in summary:
        assert r.n_out == per_batch and r.final == "completed"


def test_stream_read_routes_through_topology(registered, tmp_path):
    """readStream from the Python source through the real streaming state
    machine; control plane from a file stream (the Kafka-less e2e)."""
    spark = registered
    from hri_flink_validation_passthrough_spark.model import (
        SEND_COMPLETED,
        STARTED,
    )
    from hri_flink_validation_passthrough_spark.streaming.topology import (
        build_routed_stream,
        start_memory_query,
    )

    n_batches, per_batch = 2, 20
    records = (
        spark.readStream.format("hri_fixture")
        .option("n_batches", n_batches)
        .option("records_per_batch", per_batch)
        .option("rows_per_trigger", 7)
        .load()
    )
    ctrl_rows = []
    for b in range(n_batches):
        common = (f"batch-{b}", f"batch-{b}", "ingest.t.fixture.in", "fixture", -1)
        ctrl_rows.append(common + (STARTED, None, 1_699_999_000_000, 0))
        ctrl_rows.append(common + (SEND_COMPLETED, per_batch, 1_700_000_900_000, 1))
    ctrl_schema = (
        "id string, name string, topic string, dataType string, "
        "invalidThreshold int, status string, expectedRecordCount int, "
        "time_ms long, seq long"
    )
    spark.createDataFrame(ctrl_rows, ctrl_schema).write.parquet(
        str(tmp_path / "ctrl")
    )
    notifs = spark.readStream.schema(ctrl_schema).parquet(str(tmp_path / "ctrl"))

    routed = build_routed_stream(
        records, notifs, completion_delay_ms=500,
        per_trigger_bound='source-option',  # hri_fixture emits bounded microbatches
    )
    q = start_memory_query(routed, "fixture_e2e", str(tmp_path / "ckpt"))
    try:
        import time

        deadline = time.time() + 120
        while time.time() < deadline:
            out = spark.sql(
                "SELECT count(*) FROM fixture_e2e WHERE dest = 'out'"
            ).collect()[0][0]
            done = spark.sql(
                "SELECT count(*) FROM fixture_e2e WHERE dest = 'notification' "
                "AND CAST(value AS STRING) LIKE '%completed%'"
            ).collect()[0][0]
            if out == n_batches * per_batch and done == n_batches:
                break
            time.sleep(0.5)
        assert out == n_batches * per_batch
        assert done == n_batches
    finally:
        q.stop()
