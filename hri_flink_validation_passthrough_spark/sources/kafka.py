"""Kafka source/sink builders (SURVEY.md §2A ops 1-2, 14-16).

The reference consumes ``<base>.in`` + ``<base>.notification`` and produces
``<base>.out`` / ``<base>.invalid`` / ``<base>.notification`` over SASL_SSL
with user ``token`` (flink_validation_passthrough_spec.rb:38). Spark's
built-in Kafka connector provides the same envelope with
``includeHeaders=true`` — no custom deserializers needed.

NOTE: the spark-sql-kafka connector jar (and a broker) are not present in
the dev container; everything here builds options/DataFrames lazily and is
exercised against live Kafka on a real cluster. The topology itself is
tested through file/memory sources (tests/test_streaming.py), which is the
same seam the reference's MiniCluster tests use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..model import NOTIFICATION_SCHEMA, consumer_group
from ..streaming.topology import build_routed_stream, kafka_fanout_writer


def kafka_security_options(password: str | None) -> dict[str, str]:
    """SASL_SSL/PLAIN with user 'token' — the reference's Event Streams
    client config (flink_validation_passthrough_spec.rb:38).

    The password is interpolated into a JAAS config string, whose grammar
    treats backslashes and double quotes specially — escape them so a
    password containing either can't corrupt (or inject into) the config."""
    if not password:
        return {}
    escaped = password.replace("\\", "\\\\").replace('"', '\\"')
    jaas = (
        "org.apache.kafka.common.security.plain.PlainLoginModule required "
        f'username="token" password="{escaped}";'
    )
    return {
        "kafka.security.protocol": "SASL_SSL",
        "kafka.sasl.mechanism": "PLAIN",
        "kafka.sasl.jaas.config": jaas,
    }


def kafka_reader_options(
    topic: str,
    brokers: list[str] | str,
    password: str | None = None,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    include_headers: bool = True,
) -> dict[str, str]:
    """The exact option dict a Kafka readStream uses — a pure function so
    source assembly (subscription, offsets, throttle, SASL) is testable
    without the connector jar; only ``.format("kafka").load()`` needs it."""
    brokers_s = brokers if isinstance(brokers, str) else ",".join(brokers)
    opts = {
        "kafka.bootstrap.servers": brokers_s,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
    }
    if include_headers:
        opts["includeHeaders"] = "true"
    if max_offsets_per_trigger:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    opts.update(kafka_security_options(password))
    return opts


# Bounded-by-construction default (r12 verdict ask #3): the lifecycle state
# function buffers each (batch_id, trigger) group as one pandas frame, so
# the production sources must never start an unbounded backlog replay —
# an "earliest" restart over a deep topic would otherwise land a key's
# whole history in one trigger. 1M records/trigger is well under the
# whole-trigger concat's warning bar (topology.TRIGGER_GROUP_WARN_ROWS)
# while keeping steady-state throughput untouched (a trigger drains at
# most this many records, then the next trigger continues immediately).
DEFAULT_MAX_OFFSETS_PER_TRIGGER = 1_000_000


def read_records_stream(
    spark: SparkSession,
    topic: str,
    brokers: list[str] | str,
    password: str | None = None,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = DEFAULT_MAX_OFFSETS_PER_TRIGGER,
) -> DataFrame:
    """Data-plane source: Kafka envelope + time_ms/seq for replay order.
    ``max_offsets_per_trigger`` defaults BOUNDED; pass None only for a
    source that will not feed the whole-trigger-ordering path."""
    df = (
        spark.readStream.format("kafka")
        .options(
            **kafka_reader_options(
                topic,
                brokers,
                password,
                starting_offsets,
                max_offsets_per_trigger,
            )
        )
        .load()
    )
    return df.select(
        "key",
        "value",
        "headers",
        "topic",
        "partition",
        "offset",
        F.unix_millis("timestamp").alias("time_ms"),
        F.col("offset").alias("seq"),
    )


def read_notifications_stream(
    spark: SparkSession,
    topic: str,
    brokers: list[str] | str,
    password: str | None = None,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = DEFAULT_MAX_OFFSETS_PER_TRIGGER,
) -> DataFrame:
    """Control-plane source: JSON value → typed notification columns.
    Control volume is tiny, but the bounded default (see
    read_records_stream) applies for the same backlog-restart reason."""
    df = (
        spark.readStream.format("kafka")
        .options(
            **kafka_reader_options(
                topic,
                brokers,
                password,
                starting_offsets,
                max_offsets_per_trigger,
                include_headers=False,
            )
        )
        .load()
    )
    parsed = df.select(
        F.from_json(F.col("value").cast("string"), NOTIFICATION_SCHEMA).alias("n"),
        F.unix_millis("timestamp").alias("time_ms"),
        F.col("offset").alias("seq"),
    )
    return parsed.select("n.*", "time_ms", "seq")


def run_validation_job(spark: SparkSession, config):
    """Assemble the full production topology from a CLI JobConfig: two Kafka
    sources → stateful routing → foreachBatch fan-out, checkpointed under
    the consumer group name (ops 17-18)."""
    topics = config.topics
    group = consumer_group(topics.input, topics.output)
    records = read_records_stream(
        spark, topics.input, config.brokers, config.password
    )
    notifs = read_notifications_stream(
        spark, topics.notification, config.brokers, config.password
    )
    lookup = None
    notifier = None
    if config.mgmt:
        from .lookup import MgmtApiBatchLookup, MgmtApiBatchNotifier, OAuthTokenProvider

        # tenant id per reference convention: ingest.<tenant>.<stream>.in
        tenant = topics.input.split(".")[1]
        tokens = OAuthTokenProvider(
            config.mgmt["oauth_url"],
            config.mgmt["client_id"],
            config.mgmt["client_secret"],
            config.mgmt["audience"],
        )
        lookup = MgmtApiBatchLookup(config.mgmt["mgmt_url"], tenant, tokens)
        notifier = MgmtApiBatchNotifier(config.mgmt["mgmt_url"], tenant, tokens)
    routed = build_routed_stream(
        records,
        notifs,
        completion_delay_ms=config.batch_completion_delay_ms,
        lookup=lookup,
        # both sources above carry the bounded maxOffsetsPerTrigger default
        per_trigger_bound="source-option",
    )
    writer = kafka_fanout_writer(
        topics,
        ",".join(config.brokers),
        extra_options=kafka_security_options(config.password),
        notifier=notifier,
    )
    return (
        routed.writeStream.foreachBatch(writer)
        .outputMode("append")
        .option("checkpointLocation", f"/tmp/hri-checkpoints/{group}")
        .queryName("Passthrough")
        .start()
    )
