"""Bucketed (pre-partitioned) co-located join — the zero-shuffle fact-fact
join technique for 100 TB (SURVEY.md §2B 'joins', scale posture).

At scale, lineitem⋈orders is a fact-fact join: neither side broadcasts, so a
plain join shuffles BOTH tables on every query. Bucketing both tables on the
join key at WRITE time (``bucketBy(n, key).sortBy(key)``) moves that shuffle
to ingestion: every subsequent join on the key reads co-located, pre-sorted
buckets and sort-merge-joins them with NO Exchange and NO Sort —
``tests/test_plans.py`` asserts exactly that on this query's physical plan.

The query hints ``merge`` (forcing SMJ) because at sf0.01 AQE would broadcast
the small side and hide the property being demonstrated; at 100 TB SMJ is
what the optimizer picks anyway, so the hint mirrors the at-scale plan
without touching session conf.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_table, prepare
from . import QuerySpec, register

QUERIES: dict[str, QuerySpec] = {}

N_BUCKETS = 8


def bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """(lineitem, orders) bucketed+sorted on the order key, written once per
    (session, sf_dir) into external parquet under a temp dir. The bucket
    metadata lives in the session catalog; re-registration is idempotent."""
    tag = f"bkt_{abs(hash((spark.sparkContext.applicationId, sf_dir))) % 10**8}"
    lt, ot = f"lineitem_{tag}", f"orders_{tag}"
    if not spark.catalog.tableExists(lt):
        base = tempfile.mkdtemp(prefix=f"bucketed_{uuid.uuid4().hex[:6]}_")
        prepare(spark)
        (
            load_table(spark, sf_dir, "lineitem")
            .write.mode("overwrite")
            .option("path", f"{base}/{lt}")
            .bucketBy(N_BUCKETS, "l_orderkey")
            .sortBy("l_orderkey")
            .saveAsTable(lt)
        )
        (
            load_table(spark, sf_dir, "orders")
            .write.mode("overwrite")
            .option("path", f"{base}/{ot}")
            .bucketBy(N_BUCKETS, "o_orderkey")
            .sortBy("o_orderkey")
            .saveAsTable(ot)
        )
    return spark.table(lt), spark.table(ot)


@register(
    QUERIES,
    "bucketed_join_revenue",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_items,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
    doc="Fact-fact join over bucket-co-located tables: both sides bucketed "
    "and sorted on the order key at write time, so the sort-merge join has "
    "no Exchange and no Sort (asserted in tests/test_plans.py) — the "
    "ingest-once-shuffle-never layout for repeated 100 TB joins.",
)
def bucketed_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    lb, ob = bucketed_tables(spark, sf_dir)
    return (
        lb.hint("merge")
        .join(ob, lb.l_orderkey == ob.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
    )
