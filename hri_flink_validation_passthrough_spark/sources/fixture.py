"""`hri_fixture` — a Spark 4 Python DataSource that generates the reference
integration spec's record traffic (test/spec/flink_validation_passthrough_spec.rb:24-132:
producer writes N records with a batchId header, then the batch completes).

This is the Kafka-less twin of the reference's record producer, implemented
as a first-class pluggable source rather than test scaffolding:

- batch: ``spark.read.format("hri_fixture")`` — one InputPartition per
  batchId, so generation parallelizes exactly like a partitioned topic.
- streaming: ``spark.readStream.format("hri_fixture")`` — a
  SimpleDataSourceStreamReader whose offset is the global record index;
  each microbatch emits ``rows_per_trigger`` records, restart-safe because
  row content is a pure function of the index.

Rows are Kafka-wire-shaped (key/value binary + batchId header + replay
time_ms/seq), so the source plugs into the SAME topology seam as the real
Kafka source (`sources/envelope.data_to_envelope`): swap the format string,
nothing else changes — that is the injection contract the reference's
PassthroughStreamingJob.java:49-60 keeps for its tests.

Options: ``n_batches`` (default 3), ``records_per_batch`` (default 5),
``rows_per_trigger`` (streaming, default 100), ``base_ms`` (event-time
origin, default 1_700_000_000_000).
"""

from __future__ import annotations

import json

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

BATCH_ID_HEADER = "batchId"  # envelope.py contract

WIRE_SCHEMA = (
    "key binary, value binary, "
    "headers array<struct<key:string,value:binary>>, "
    "time_ms long, seq long"
)


def _record(batch: int, idx: int, base_ms: int):
    """Deterministic wire record #idx of batch #batch (pure function, so
    batch generation, streaming replay, and restarts all agree)."""
    batch_id = f"batch-{batch}"
    key = f"rec-{batch}-{idx}".encode()
    value = json.dumps(
        {"batch": batch_id, "idx": idx, "body": f"payload-{batch}-{idx}"}
    ).encode()
    headers = [(BATCH_ID_HEADER, batch_id.encode())]
    time_ms = base_ms + idx
    seq = batch * 1_000_000 + idx
    return (key, value, headers, time_ms, seq)


class _Part(InputPartition):
    def __init__(self, batch: int):
        self.batch = batch


class FixtureBatchReader(DataSourceReader):
    def __init__(self, options):
        self.n_batches = int(options.get("n_batches", 3))
        self.records_per_batch = int(options.get("records_per_batch", 5))
        self.base_ms = int(options.get("base_ms", 1_700_000_000_000))

    def partitions(self):
        # one partition per batch — reads parallelize like topic partitions
        return [_Part(b) for b in range(self.n_batches)]

    def read(self, partition):
        b = partition.batch
        for i in range(self.records_per_batch):
            yield _record(b, i, self.base_ms)


class FixtureStreamReader(SimpleDataSourceStreamReader):
    """Offset = {"index": <next global record index>}; record g belongs to
    batch g // records_per_batch. Bounded sources end after
    n_batches*records_per_batch records; unbounded (n_batches=0) run on."""

    def __init__(self, options):
        self.n_batches = int(options.get("n_batches", 3))
        self.records_per_batch = int(options.get("records_per_batch", 5))
        self.rows_per_trigger = int(options.get("rows_per_trigger", 100))
        self.base_ms = int(options.get("base_ms", 1_700_000_000_000))

    def initialOffset(self):
        return {"index": 0}

    def _total(self):
        return self.n_batches * self.records_per_batch if self.n_batches else None

    def read(self, start):
        g0 = start["index"]
        g1 = g0 + self.rows_per_trigger
        total = self._total()
        if total is not None:
            g1 = min(g1, total)
        rows = []
        for g in range(g0, g1):
            b, i = divmod(g, self.records_per_batch)
            rows.append(_record(b, i, self.base_ms))
        return (iter(rows), {"index": g1})

    def readBetweenOffsets(self, start, end):
        # deterministic replay for recovery: same pure function of the index
        rows = []
        for g in range(start["index"], end["index"]):
            b, i = divmod(g, self.records_per_batch)
            rows.append(_record(b, i, self.base_ms))
        return iter(rows)


class FixtureDataSource(DataSource):
    @classmethod
    def name(cls):
        return "hri_fixture"

    def schema(self):
        return WIRE_SCHEMA

    def reader(self, schema):
        return FixtureBatchReader(self.options)

    def simpleStreamReader(self, schema):
        return FixtureStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(FixtureDataSource)
