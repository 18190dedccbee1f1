"""Round-7 additions: ADVICE-r6 regression pins."""

from __future__ import annotations

import numpy as np
import pandas as pd


def test_letter_counts_null_text_yields_zero_histogram():
    """ADVICE r6: a NULL text value arrives as None in the pandas batch;
    the histogram must be all-zero (→ n_letters=0 → filtered, matching the
    oracle's NULL propagation) instead of raising AttributeError and
    killing the whole query on real corpora."""
    from hri_flink_validation_passthrough_spark.operators.text import (
        _letter_counts,
    )

    out = _letter_counts(pd.Series(["abc", None, "zz!"]))
    assert np.array_equal(out.iloc[0][:3], [1, 1, 1])
    assert int(out.iloc[1].sum()) == 0
    assert int(out.iloc[2][25]) == 2


def test_tws_provider_conf_is_stashed_and_restored(spark):
    """ADVICE r6: _tws_session switches the session-wide state-store
    provider to RocksDB; without a restore every LATER streaming query
    silently inherits it. The stash/restore pair must round-trip."""
    from hri_flink_validation_passthrough_spark.streaming import state_ttl

    conf = state_ttl._PROVIDER_CONF
    try:
        before = spark.conf.get(conf)
    except Exception:
        before = None

    # simulate the switch without requiring protobuf: stash + set directly
    spark._hri_prev_state_provider = before
    spark.conf.set(conf, "org.example.FakeProvider")
    state_ttl.restore_state_provider(spark)

    try:
        after = spark.conf.get(conf)
    except Exception:
        after = None
    assert after == before
    # idempotent no-op when nothing was stashed
    state_ttl.restore_state_provider(spark)


def test_quantile_sketch_merges_losslessly(spark):
    """The sketch's core contract: build on two disjoint halves, merge by
    cell-wise addition, and the quantile readout equals the single-pass
    build — the property that makes it streaming/partition-safe."""
    from pyspark.sql import functions as F

    from hri_flink_validation_passthrough_spark.operators.text import (
        quantile_sketch_build,
        quantile_sketch_quantiles,
    )
    from hri_flink_validation_passthrough_spark.session import load_table

    e = load_table(spark, "/root/testdata/sf0.01", "events")
    whole = quantile_sketch_quantiles(quantile_sketch_build(e)).collect()

    h1 = quantile_sketch_build(e.filter(F.xxhash64("event_id") % 2 == 0))
    h2 = quantile_sketch_build(e.filter(F.xxhash64("event_id") % 2 != 0))
    merged_bins = (
        h1.unionByName(h2)
        .groupBy("event_type", "bin")
        .agg(F.sum("cnt").alias("cnt"))
    )
    merged = quantile_sketch_quantiles(merged_bins).collect()

    assert sorted(map(tuple, whole)) == sorted(map(tuple, merged))
    assert len(whole) > 0
