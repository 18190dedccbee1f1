"""Normalized envelope: both planes (data records + control notifications)
mapped onto ONE schema so they can be unioned and keyed by ``batch_id``.

This is the idiomatic Spark replacement for Flink's connect+broadcast
(SURVEY.md §2A op 4): normalize → ``unionByName`` → one keyed stateful
operator. Works identically for batch DataFrames and streaming DataFrames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..model import BATCH_ID_HEADER, HEADER_TYPE, NOTIFICATION_SCHEMA

KIND_CONTROL = "control"
KIND_DATA = "data"

ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("batch_id", T.StringType(), True),
        T.StructField("kind", T.StringType(), False),
        T.StructField("time_ms", T.LongType(), True),
        T.StructField("seq", T.LongType(), True),
        T.StructField("key", T.BinaryType(), True),
        T.StructField("value", T.BinaryType(), True),
        T.StructField("headers", HEADER_TYPE, True),
        T.StructField("notification", NOTIFICATION_SCHEMA, True),
    ]
)

# What the pipeline emits: Kafka-producer-shaped rows, destination-tagged.
ROUTED_SCHEMA = T.StructType(
    [
        T.StructField("dest", T.StringType(), False),  # out | invalid | notification
        T.StructField("batch_id", T.StringType(), True),
        T.StructField("key", T.BinaryType(), True),
        T.StructField("value", T.BinaryType(), True),
        T.StructField("headers", HEADER_TYPE, True),
    ]
)


def batch_id_from_headers():
    """Extract the batchId header value as a string (first occurrence)."""
    return F.expr(
        f"CAST(filter(headers, h -> h.key = '{BATCH_ID_HEADER}')[0].value AS STRING)"
    )


def data_to_envelope(records: DataFrame, time_ms=None, seq=None) -> DataFrame:
    """records: (key BINARY, value BINARY, headers ARRAY<STRUCT<..>>) plus
    optional ``time_ms``/``seq`` columns for deterministic replay order."""
    cols = records.columns
    df = records
    if "time_ms" not in cols:
        df = df.withColumn("time_ms", time_ms if time_ms is not None else F.lit(None).cast("long"))
    if "seq" not in cols:
        df = df.withColumn("seq", seq if seq is not None else F.monotonically_increasing_id())
    return df.select(
        batch_id_from_headers().alias("batch_id"),
        F.lit(KIND_DATA).alias("kind"),
        F.col("time_ms").cast("long"),
        F.col("seq").cast("long"),
        "key",
        "value",
        "headers",
        F.lit(None).cast(NOTIFICATION_SCHEMA).alias("notification"),
    )


def control_to_envelope(notifications: DataFrame) -> DataFrame:
    """notifications: NOTIFICATION_SCHEMA fields as top-level columns plus
    optional ``time_ms``/``seq``."""
    df = notifications
    if "time_ms" not in df.columns:
        df = df.withColumn("time_ms", F.lit(None).cast("long"))
    if "seq" not in df.columns:
        df = df.withColumn("seq", F.lit(0).cast("long"))
    notif_struct = F.struct(
        *[
            (F.col(f.name) if f.name in notifications.columns else F.lit(None)).cast(
                f.dataType
            ).alias(f.name)
            for f in NOTIFICATION_SCHEMA.fields
        ]
    )
    return df.select(
        F.col("id").cast("string").alias("batch_id"),
        F.lit(KIND_CONTROL).alias("kind"),
        F.col("time_ms").cast("long"),
        F.col("seq").cast("long"),
        F.lit(None).cast("binary").alias("key"),
        F.lit(None).cast("binary").alias("value"),
        F.lit(None).cast(HEADER_TYPE).alias("headers"),
        notif_struct.alias("notification"),
    )


def events_as_records(events: DataFrame, batch_col: str = "event_type") -> DataFrame:
    """Replay the driver's ``events`` table as data-plane records
    (FIXTURES.md §5): event_id → key, full row JSON → value, batch
    assignment → batchId header. Keeps event time for deterministic order."""
    payload = F.to_json(F.struct(*[F.col(c) for c in events.columns]))
    return events.select(
        F.col("event_id").cast("string").cast("binary").alias("key"),
        payload.cast("binary").alias("value"),
        F.array(
            F.struct(
                F.lit(BATCH_ID_HEADER).alias("key"),
                F.col(batch_col).cast("string").cast("binary").alias("value"),
            )
        ).alias("headers"),
        F.unix_millis(F.col("ts")).alias("time_ms"),
        F.col("event_id").cast("long").alias("seq"),
    )
