#!/usr/bin/env python
"""Interleaved A/B settling the r15 dedup_minhash_lsh perf-weak verdict:

  OLD = per-doc Python loop signature UDF + (band, bkey) bucket rows
        (pre-62d22b5)
  NEW = chunked batch-wide multiply-add + segmented reduceat signature,
        (doc_id, bkey)-only bucket rows (shipped r15)

Runs the FULL dedup_minhash_lsh pipeline under both arms in ONE session,
alternating, so box drift cannot fake a winner; checks the two arms'
outputs are identical (count + xxhash checksum) each rep.

Usage: python tools/ab_minhash_r16.py [reps] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np
import pandas as pd


def _minhash_signature_old(hs: pd.Series) -> pd.Series:
    """r14-shipped form, verbatim (git 62d22b5^)."""
    from hri_flink_validation_passthrough_spark.operators.dedup import _MH_A, _MH_B

    out = []
    with np.errstate(over="ignore"):
        for arr in hs:
            a = np.asarray(arr, dtype=np.int64).view(np.uint64)
            if a.size == 0:
                out.append(np.full(64, np.iinfo(np.int64).max, dtype=np.int64))
                continue
            perms = a[:, None] * _MH_A[None, :] + _MH_B[None, :]  # mod 2^64
            out.append(perms.min(axis=0).view(np.int64))
    return pd.Series(out)


def _minhash_buckets_old(s):
    """r14-shipped bucket shape: (doc_id, band, bkey) rows."""
    from pyspark.sql import functions as F

    base = s.select(
        "doc_id",
        F.transform(F.col("sh"), lambda g: F.xxhash64(g)).alias("hs"),
    )
    sig_udf = F.pandas_udf(_minhash_signature_old, "array<long>")
    signed = base.select("doc_id", sig_udf("hs").alias("sig"))
    bands = F.transform(
        F.sequence(F.lit(0), F.lit(31)),
        lambda b: F.struct(
            b.alias("band"),
            F.xxhash64(
                F.element_at(F.col("sig"), (2 * b + 1).cast("int")),
                F.element_at(F.col("sig"), (2 * b + 2).cast("int")),
                b,
            ).alias("bkey"),
        ),
    )
    return signed.select("doc_id", F.explode(bands).alias("bb")).select(
        "doc_id", "bb.band", "bb.bkey"
    )


def _query_old(spark, sf_dir):
    from pyspark.sql import functions as F

    from hri_flink_validation_passthrough_spark.operators import dedup as D
    from hri_flink_validation_passthrough_spark.session import prepare

    prepare(spark)
    s = D._shingles_for(spark, sf_dir)
    buckets = _minhash_buckets_old(s)
    pair_structs = D._pair_structs(F.col("ids"))
    cand = (
        buckets.groupBy("band", "bkey")
        .agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids") > 1)
        .select(F.explode(pair_structs).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return D._verify_jaccard_pairs(cand, s, 0.8)


def _checksum(df):
    from pyspark.sql import functions as F

    r = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64("doc_a", "doc_b", "jaccard")).alias("h"),
    ).collect()[0]
    return (r["n"], r["h"])


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from hri_flink_validation_passthrough_spark.session import build_session

    spark = build_session(
        "ab_minhash_r16", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    fn_new = entry.queries()["dedup_minhash_lsh"]

    def run(tag, f):
        t0 = time.perf_counter()
        f(spark, sf_dir).write.mode("overwrite").format("noop").save()
        dt = time.perf_counter() - t0
        print(f"{tag}: {dt:.3f}s", flush=True)
        return dt

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    # warm both arms (shingle memo, python workers, codegen)
    run("warm-new", fn_new)
    run("warm-old", _query_old)
    cn, co = _checksum(fn_new(spark, sf_dir)), _checksum(_query_old(spark, sf_dir))
    print(f"checksum new={cn} old={co} equal={cn == co}")

    res = {"new": [], "old": []}
    for i in range(reps):
        res["new"].append(run(f"rep{i} NEW", fn_new))
        res["old"].append(run(f"rep{i} OLD", _query_old))
    for arm in ("new", "old"):
        t = sorted(res[arm])
        print(f"{arm}: best {t[0]:.3f} med {t[len(t)//2]:.3f} all {[round(x,3) for x in res[arm]]}")
    spark.stop()


if __name__ == "__main__":
    main()
