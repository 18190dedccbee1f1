"""Behavioral tests for the LLM-pipeline operators beyond the oracle gate."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from hri_flink_validation_passthrough_spark.operators.multimodal import (
    decode_real,
    extract_features,
)


def test_simhash_identical_docs_collide(spark):
    from hri_flink_validation_passthrough_spark.operators import dedup

    df = spark.createDataFrame(
        [
            (1, "spark window join batch merge fast table"),
            (2, "spark window join batch merge fast table"),  # identical
            (3, "completely different words entirely here now"),
        ],
        "doc_id long, text string",
    )
    # reuse the query body against an in-memory table by monkey-through:
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    hashed = df.select(
        "doc_id", F.transform(toks, lambda t: F.xxhash64(t)).alias("hs")
    )
    simhash_udf = F.pandas_udf(dedup._simhash_from_hashes, "long")
    sk = hashed.select("doc_id", simhash_udf("hs").alias("simhash")).collect()
    by_id = {r.doc_id: r.simhash for r in sk}
    assert by_id[1] == by_id[2]
    assert by_id[1] != by_id[3]


def test_multimodal_real_decoder_is_stubbed(spark):
    blobs = spark.createDataFrame([(1, b"xx")], "doc_id long, content binary")
    with pytest.raises(Exception) as ei:
        extract_features(blobs, decoder=decode_real).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_multimodal_empty_blob(spark):
    blobs = spark.createDataFrame(
        [(1, b""), (2, None), (3, b"abc")], "doc_id long, content binary"
    )
    rows = {r.doc_id: r for r in extract_features(blobs).collect()}
    assert rows[1].byte_len == 0 and rows[1].first_byte == -1
    assert rows[2].byte_len == 0
    assert rows[3].byte_len == 3 and rows[3].first_byte == ord("a")


def test_knn_self_excluded_and_k(spark):
    from hri_flink_validation_passthrough_spark.operators.similarity import (
        TOP_K,
        knn_brute_force,
    )

    res = knn_brute_force(spark, "/root/testdata/sf0.001").collect()
    assert all(r.qid != r.nid for r in res)
    from collections import Counter

    counts = Counter(r.qid for r in res)
    assert all(c == TOP_K for c in counts.values())
