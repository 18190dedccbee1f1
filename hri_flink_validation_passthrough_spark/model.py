"""Data model: record envelope, BatchNotification schema, topic rules.

Reference parity (SURVEY.md §1):

- HriRecord == the Kafka source row with ``includeHeaders=true`` — key/value
  BINARY, headers ARRAY<STRUCT<key STRING, value BINARY>> (ordered,
  multi-valued; reference asserts the *last* header positionally,
  PassthroughStreamingJobIntTest.java:166-169).
- BatchNotification == the control-plane JSON (PassthroughJobTestHelper.java:63-72,
  test/spec/kafka_notification_builder.rb:7-42). ``metadata`` is kept as a raw
  JSON string so arbitrary nested objects round-trip byte-exactly
  (flink_validation_passthrough_spec.rb:112-114).
- Topic quartet: ``ingest.<t>.in`` → ``.out`` / ``.invalid`` / ``.notification``
  (flink_validation_passthrough_spec.rb:24-32); name rules enforced like
  PassthroughStreamingJobTest.java:104-121.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Batch lifecycle statuses (flink_validation_passthrough_spec.rb:131,261,317,355)
# ---------------------------------------------------------------------------
STARTED = "started"
SEND_COMPLETED = "sendCompleted"
COMPLETED = "completed"
FAILED = "failed"
TERMINATED = "terminated"
TERMINAL_STATUSES = frozenset({COMPLETED, FAILED, TERMINATED})

# Failure body for records whose batchId matches no known batch
# (kafka_record_validator.rb:110).
UNKNOWN_BATCH_FAILURE = "Bad Message - Unknown batchId"

# Default completion delay: production 300 000 ms
# (PassthroughStreamingJob.java:40-41); tests use 5 000 ms.
DEFAULT_BATCH_COMPLETION_DELAY_MS = 300_000

# The header that ties a data record to its batch
# (flink_validation_passthrough_spec.rb:120).
BATCH_ID_HEADER = "batchId"

# ---------------------------------------------------------------------------
# Spark schemas
# ---------------------------------------------------------------------------
HEADER_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("key", T.StringType(), True),
            T.StructField("value", T.BinaryType(), True),
        ]
    )
)

# Matches spark.readStream.format("kafka").option("includeHeaders","true").
HRI_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType(), True),
        T.StructField("value", T.BinaryType(), True),
        T.StructField("headers", HEADER_TYPE, True),
        T.StructField("topic", T.StringType(), True),
        T.StructField("partition", T.IntegerType(), True),
        T.StructField("offset", T.LongType(), True),
    ]
)

# Control-plane payload (§1.2). Dates stay strings (byte fidelity); metadata is
# raw JSON text.
NOTIFICATION_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("topic", T.StringType(), True),
        T.StructField("dataType", T.StringType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("startDate", T.StringType(), True),
        T.StructField("endDate", T.StringType(), True),
        T.StructField("expectedRecordCount", T.IntegerType(), True),
        T.StructField("recordCount", T.IntegerType(), True),
        T.StructField("invalidThreshold", T.IntegerType(), True),
        T.StructField("metadata", T.StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Topic rules (op 17)
# ---------------------------------------------------------------------------
INPUT_TOPIC_RE = re.compile(r"^ingest\..+\.in$")


class TopicNameError(ValueError):
    pass


@dataclass(frozen=True)
class TopicQuartet:
    """The four Kafka topics of one pipeline (SURVEY.md §1.1)."""

    input: str
    output: str
    invalid: str
    notification: str


def derive_topics(input_topic: str) -> TopicQuartet:
    """``ingest.<tenant>.<stream>.in`` → the out/invalid/notification names.

    Raises TopicNameError with the reference's message semantics when the
    input topic does not start with ``ingest.`` or end with ``.in``
    (PassthroughStreamingJobTest.java:104-121).
    """
    if not input_topic.startswith("ingest."):
        raise TopicNameError(
            f"The Input Topic Name {input_topic} is invalid. "
            'It must start with "ingest."'
        )
    if not input_topic.endswith(".in"):
        raise TopicNameError(
            f"The Input Topic Name {input_topic} is invalid. "
            'It must end with ".in"'
        )
    base = input_topic[: -len(".in")]
    return TopicQuartet(
        input=input_topic,
        output=f"{base}.out",
        invalid=f"{base}.invalid",
        notification=f"{base}.notification",
    )


def consumer_group(input_topic: str, output_topic: str) -> str:
    """``hri-validation-<in>-<out>`` (flink_validation_passthrough_spec.rb:61)."""
    return f"hri-validation-{input_topic}-{output_topic}"
