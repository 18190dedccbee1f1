"""Pipeline observability via DataFrame.observe: task-side metric
accumulation with no separate job — the API a production pipeline uses to
count invalid/late/filtered rows without a second pass over the data."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from hri_flink_validation_passthrough_spark.session import load_table, prepare


def test_batch_observation_counts_filtered_rows_in_one_pass(spark):
    prepare(spark)
    e = load_table(spark, "/root/testdata/sf0.01", "events")
    obs = Observation("quality")
    observed = e.observe(
        obs,
        F.count(F.lit(1)).alias("n_in"),
        F.sum((F.col("value") < 0).cast("long")).alias("n_negative"),
        F.max("value").alias("max_value"),
    )
    kept = observed.filter(F.col("value") >= 0)
    n_kept = kept.count()

    got = obs.get
    assert got["n_in"] == 10_000
    assert got["n_in"] - got["n_negative"] == n_kept
    assert got["max_value"] >= 0
    # the metrics rode the SAME job as the count — no extra scan happened


def test_streaming_observed_metrics_surface_in_progress(spark, tmp_path):
    prepare(spark)
    from hri_flink_validation_passthrough_spark.streaming.windows import (
        _events_stream,
        _pinned_state,
    )

    e = _events_stream(spark, "/root/testdata/sf0.001")
    observed = e.observe(
        "ingest",
        F.count(F.lit(1)).alias("rows"),
        F.sum((F.col("event_type") == "error").cast("long")).alias("errors"),
    )
    agg = observed.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    with _pinned_state(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName("obs_sink")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        progresses = [p for p in q.recentProgress if p.get("observedMetrics")]
    assert progresses, "no progress carried observedMetrics"
    total_rows = sum(p["observedMetrics"]["ingest"]["rows"] for p in progresses)
    total_errors = sum(p["observedMetrics"]["ingest"]["errors"] for p in progresses)
    batch = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum((F.col("event_type") == "error").cast("long")).alias("errors"),
        )
        .collect()[0]
    )
    assert total_rows == batch["rows"]
    assert total_errors == batch["errors"]
