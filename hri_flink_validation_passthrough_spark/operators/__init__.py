"""Custom operators: the batch lifecycle state machine (reference parity) and
the LLM-data-pipeline operator family (dedup, similarity, text, multimodal)."""
