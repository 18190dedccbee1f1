"""Byte-exact Kafka option-assembly tests (SURVEY.md §2A ops 1-2, 14-16).

The sandbox has no broker and no spark-sql-kafka connector jar, so the
Kafka surface is verified down to the narrowest possible seam: the option
dicts handed to ``.format("kafka")`` readers/writers are produced by pure
functions and asserted byte-exactly here — including SASL/JAAS escaping.
Only ``.load()``/``.save()`` themselves remain connector-jar territory
(reference e2e: test/spec/flink_validation_passthrough_spec.rb:24-63).
"""

from __future__ import annotations

import json

from hri_flink_validation_passthrough_spark.model import derive_topics
from hri_flink_validation_passthrough_spark.sources.kafka import (
    kafka_reader_options,
    kafka_security_options,
)
from hri_flink_validation_passthrough_spark.streaming.topology import (
    kafka_fanout_writer,
    kafka_writer_options,
)


def test_security_options_empty_without_password():
    assert kafka_security_options(None) == {}
    assert kafka_security_options("") == {}


def test_security_options_sasl_ssl_plain_token_user():
    opts = kafka_security_options("s3cret")
    assert opts == {
        "kafka.security.protocol": "SASL_SSL",
        "kafka.sasl.mechanism": "PLAIN",
        "kafka.sasl.jaas.config": (
            "org.apache.kafka.common.security.plain.PlainLoginModule "
            'required username="token" password="s3cret";'
        ),
    }


def test_jaas_escaping_backslash_quote_and_semicolon():
    """JAAS grammar treats backslash and double-quote specially; a hostile
    password must not terminate the quoted string or inject config. A
    semicolon inside the quotes is literal and needs no escape."""
    jaas = kafka_security_options('p"w\\d;end')["kafka.sasl.jaas.config"]
    assert jaas == (
        "org.apache.kafka.common.security.plain.PlainLoginModule "
        'required username="token" password="p\\"w\\\\d;end";'
    )
    # escaping is idempotent-safe for the classic injection shape: the
    # payload cannot close the quote and start a new JAAS clause
    evil = '" password="x'
    jaas2 = kafka_security_options(evil)["kafka.sasl.jaas.config"]
    assert jaas2.count('";') == 1  # still exactly one clause terminator
    assert '\\" password=\\"x' in jaas2


def test_reader_options_records_source():
    opts = kafka_reader_options(
        "ingest.t1.data.in",
        ["b1:9093", "b2:9093"],
        password="pw",
        max_offsets_per_trigger=50000,
    )
    assert opts == {
        "kafka.bootstrap.servers": "b1:9093,b2:9093",
        "subscribe": "ingest.t1.data.in",
        "startingOffsets": "earliest",
        "includeHeaders": "true",
        "maxOffsetsPerTrigger": "50000",
        "kafka.security.protocol": "SASL_SSL",
        "kafka.sasl.mechanism": "PLAIN",
        "kafka.sasl.jaas.config": (
            "org.apache.kafka.common.security.plain.PlainLoginModule "
            'required username="token" password="pw";'
        ),
    }


def test_reader_options_notification_source_no_headers():
    opts = kafka_reader_options(
        "ingest.t1.data.notification",
        "b1:9093",
        starting_offsets="latest",
        include_headers=False,
    )
    assert opts == {
        "kafka.bootstrap.servers": "b1:9093",
        "subscribe": "ingest.t1.data.notification",
        "startingOffsets": "latest",
    }


def test_writer_options_include_security_passthrough():
    sec = kafka_security_options("pw")
    opts = kafka_writer_options("ingest.t1.data.out", "b1:9093", sec)
    assert opts == {
        "kafka.bootstrap.servers": "b1:9093",
        "topic": "ingest.t1.data.out",
        "includeHeaders": "true",
        **sec,
    }


def test_fanout_writer_passes_exact_options_per_topic(spark):
    """The fan-out writer must hand every topic's sink the same dict the
    default Kafka write would use — asserted byte-exactly, SASL included."""
    topics = derive_topics("ingest.t1.events.in")
    sec = kafka_security_options('tok"en')
    batch = spark.createDataFrame(
        [
            ("out", b"k1", b"v1", []),
            ("invalid", b"k2", b'{"failure": "bad"}', []),
            ("notification", b"b1", json.dumps({"id": "b1"}).encode(), []),
        ],
        "dest string, key binary, value binary, "
        "headers array<struct<key:string,value:binary>>",
    )
    seen: dict[str, dict] = {}

    def sink(part, topic, options):
        seen[topic] = options
        part.collect()

    kafka_fanout_writer(topics, "b1:9093,b2:9093", extra_options=sec, sink=sink)(
        batch, epoch_id=0
    )
    for topic in (topics.output, topics.invalid, topics.notification):
        assert seen[topic] == {
            "kafka.bootstrap.servers": "b1:9093,b2:9093",
            "topic": topic,
            "includeHeaders": "true",
            "kafka.security.protocol": "SASL_SSL",
            "kafka.sasl.mechanism": "PLAIN",
            "kafka.sasl.jaas.config": (
                "org.apache.kafka.common.security.plain.PlainLoginModule "
                'required username="token" password="tok\\"en";'
            ),
        }
