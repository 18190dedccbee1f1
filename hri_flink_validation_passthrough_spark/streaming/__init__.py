"""Structured Streaming parity path: the reference's Flink topology as
readStream → normalize → union → keyed stateful processor → fan-out sinks."""
