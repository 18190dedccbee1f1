"""Watermark semantics (SURVEY.md §2B 'streaming watermarks'): append-mode
windowed aggregation emits a window only after the watermark passes its end,
and drops events arriving later than the allowed lateness."""

from __future__ import annotations

import time
import uuid
from datetime import datetime

import pytest

from pyspark.sql import functions as F


def test_watermark_closes_windows_and_drops_late(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    schema = "ts timestamp, v long"

    def write_chunk(rows):
        spark.createDataFrame(
            [(datetime(2024, 1, 1, h, m), v) for h, m, v in rows], schema
        ).coalesce(1).write.mode("append").parquet(src)

    # chunk 1: events in hour 10
    write_chunk([(10, 5, 1), (10, 20, 1)])

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("ws"), "n"
        )
    )
    name = f"wm_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )

    def rows():
        return {r.ws: r.n for r in spark.sql(f"SELECT * FROM {name}").collect()}

    def wait_for(cond, msg, timeout=30):
        t0 = time.time()
        while time.time() - t0 < timeout:
            if cond(rows()):
                return
            time.sleep(0.3)
        pytest.fail(f"timeout: {msg}; sink={rows()}")

    try:
        q.processAllAvailable()
        assert rows() == {}, "hour-10 window must stay open (watermark not past)"

        # chunk 2 advances event time to hour 12 → watermark 11:30 → the
        # hour-10 window closes and emits
        write_chunk([(12, 0, 1)])
        wait_for(lambda r: "2024-01-01 10:00:00" in r, "hour-10 window emitted")
        assert rows()["2024-01-01 10:00:00"] == 2

        # a straggler inside the closed hour-10 window is LATE (10:40 <
        # watermark 11:30) and must be dropped, not re-emitted
        write_chunk([(10, 40, 1)])
        # advance watermark far enough to close hour 12 as well
        write_chunk([(14, 0, 1)])
        wait_for(lambda r: "2024-01-01 12:00:00" in r, "hour-12 window emitted")
        assert rows()["2024-01-01 10:00:00"] == 2, "late event must be dropped"
    finally:
        q.stop()


def test_drop_duplicates_within_watermark_bounds_state(spark, tmp_path):
    """The production streaming-dedup form: duplicates arriving within the
    watermark horizon are dropped while state stays bounded (keys age out
    once the watermark passes) — the scale path stream_dedup_exact's
    docstring points at."""
    from datetime import datetime, timedelta

    src = tmp_path / "dupfeed"
    src.mkdir()
    rows = []
    base = datetime(2026, 1, 1)
    for i in range(50):
        ts = base + timedelta(seconds=i)
        rows.append((i, ts))
        rows.append((i, ts))  # exact duplicate, same event time
    pdf = spark.createDataFrame(rows, "event_id long, ts timestamp")
    pdf.write.parquet(str(src / "part0"))

    stream = spark.readStream.schema("event_id long, ts timestamp").parquet(
        str(src / "*")
    )
    deduped = stream.withWatermark("ts", "10 seconds").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("ddww")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM ddww").collect()[0]
    assert got.n == 50 and got.d == 50


def test_dedup_within_watermark_multibatch_replay_matches_oracle(spark, tmp_path):
    """Round-4 verdict ask #8: stream_dedup_within_watermark's oracle parity
    rests on the watermark delay EXCEEDING the replay's event-time span, so
    state is never evicted mid-replay. Pin that guarantee under the exact
    failure mode it protects against — a MULTI-microbatch replay (one file
    per trigger, duplicates split across batches): the dedup must still be
    exact, and the run must genuinely have used several microbatches."""
    import uuid
    from datetime import datetime, timedelta

    src = tmp_path / "mbfeed"
    src.mkdir()
    base = datetime(2026, 1, 1)
    # 3 files; every event_id appears in TWO different files so cross-batch
    # state is what dedups them (intra-batch dedup alone would fail)
    for part in range(3):
        rows = [
            (i, base + timedelta(hours=i))
            for i in range(100)
            if i % 3 != part  # id i is present in exactly 2 of the 3 files
        ]
        spark.createDataFrame(rows, "event_id long, ts timestamp").coalesce(
            1
        ).write.parquet(str(src / f"part{part}"))

    stream = (
        spark.readStream.schema("event_id long, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    # same shape as stream_dedup_within_watermark: delay >> event-time span
    deduped = stream.withWatermark("ts", "3650 days").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    name = f"ddmb_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_batches = sum(
        1 for p in q.recentProgress if p["numInputRows"] and int(p["numInputRows"]) > 0
    )
    assert n_batches >= 3, f"replay must span multiple microbatches, got {n_batches}"
    got = spark.sql(
        f"SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM {name}"
    ).collect()[0]
    assert got.n == 100 and got.d == 100, "multi-batch replay diverged from exact dedup"
