"""hri_flink_validation_passthrough_spark — a PySpark-native engine with the
query/data-processing capabilities of Alvearie/hri-flink-validation-passthrough.

The reference (see /root/reference, SURVEY.md) is a Flink streaming validation
job: opaque records from a Kafka input topic are routed to out/invalid topics
with byte fidelity while a per-batch lifecycle state machine (started →
sendCompleted → completed | failed | terminated) reconciles record counts.

This package re-expresses that contract Spark-first:

- ``model``          — record-envelope & BatchNotification schemas, topic rules
- ``operators``      — the keyed batch state machine + LLM-pipeline operators
                       (dedup, similarity search, text analysis, multimodal)
- ``plans``          — the relational/analytical query layer (DataFrame/SQL)
- ``sources``        — Kafka / memory / envelope source builders
- ``functions``      — JVM-side column helpers (vector math, text metrics)
- ``streaming``      — the Structured Streaming topology (parity path)
- ``cli``            — picocli-parity command line surface

Design stance: library, not framework. Pipelines are pure functions over
DataFrames so tests can inject memory sources/sinks exactly like the
reference's MiniCluster tests do (SURVEY.md §3.2).
"""

__version__ = "0.1.0"
