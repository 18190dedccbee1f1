"""Iterative graph algorithms as unrolled relational dataflow.

PageRank over the supplier co-part graph (suppliers are adjacent when they
supply at least one common part — the TPC-H-shaped stand-in for any
entity-affinity graph). The power iteration is expressed as a STATIC chain
of join→aggregate stages: each iteration is

    new_rank(v) = (1-d)/N + d * SUM over in-neighbors u of rank(u)/deg(u)

— an equi-join of the rank table with the edge list on src, then a groupBy
on dst. No driver-side loop state, no collect of per-node data (the single
driver scalar is N, the node count); edges + degrees are computed once and
persisted because every iteration re-reads them (the standard iterative-
graph trade — at 100 TB this is the edge-partitioned layout GraphX/Pregel
use, with rank exchange hashed on the join key each round).

Dangling nodes (no out-edges) keep receiving the (1-d)/N teleport term and
simply leak their mass (the common practical simplification — documented,
deterministic, identical in the oracle).

Reference parity note: the reference engine (Alvearie
hri-flink-validation-passthrough, PassthroughStreamingJob.java:1) has no
graph surface; this is a SURVEY.md §2 north-star extension next to
``transitive_closure_depth`` (plans/relational.py) and ``dedup_clusters``
(pointer-jumping connected components, operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans import QuerySpec, register
from ..session import load_table, prepare

QUERIES: dict[str, QuerySpec] = {}

PR_DAMP = 0.85
PR_ITERS = 3
PR_TOP = 20


def _pr_oracle() -> str:
    d = PR_DAMP
    its = []
    for k in range(1, PR_ITERS + 1):
        prev = f"r{k - 1}"
        its.append(
            f"""r{k} AS (
      SELECT nodes.s,
             (1 - {d}) / nn.n
               + {d} * coalesce(sum({prev}.r / deg.deg), 0) AS r
      FROM nodes CROSS JOIN nn
      LEFT JOIN e ON e.dst = nodes.s
      LEFT JOIN {prev} ON {prev}.s = e.src
      LEFT JOIN deg ON deg.s = e.src
      GROUP BY nodes.s, nn.n
    )"""
        )
    chain = ",\n    ".join(its)
    return f"""
    WITH ps AS (
      SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
    ), e AS (
      SELECT DISTINCT a.s AS src, b.s AS dst
      FROM ps a JOIN ps b ON a.p = b.p AND a.s <> b.s
    ), nodes AS (
      SELECT DISTINCT s FROM ps
    ), deg AS (
      SELECT src AS s, count(*) AS deg FROM e GROUP BY 1
    ), nn AS (SELECT count(*) AS n FROM nodes),
    r0 AS (SELECT s, 1.0 / nn.n AS r FROM nodes CROSS JOIN nn),
    {chain},
    ranked AS (
      SELECT s, floor(r * 100000000 + 0.500001) / 100000000 AS pagerank
      FROM r{PR_ITERS}
    )
    SELECT CAST(ranked.s AS BIGINT) AS s_suppkey, sup.s_name, pagerank
    FROM ranked JOIN supplier sup ON ranked.s = sup.s_suppkey
    ORDER BY pagerank DESC, s_suppkey
    LIMIT {PR_TOP}
    """


@register(
    QUERIES,
    "pagerank_supplier_coparts",
    oracle=_pr_oracle(),
    doc="PageRank (d=0.85, 3 power iterations) over the supplier co-part "
    "graph, unrolled as join->aggregate stages: rank ⨝ edges on src, "
    "groupBy dst, teleport term (1-d)/N with N the one driver scalar. "
    "Edges + degrees persisted once for the three iterations (the "
    "edge-partitioned iterative layout); dangling mass leaks by design, "
    "identically in both engines. Output: top-20 by 8-dp-rounded rank with "
    "suppkey tiebreak.",
)
def pagerank_supplier_coparts(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare(spark)
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")

    ps = li.select(
        F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")
    ).distinct()
    a, b = ps.alias("a"), ps.alias("b")
    edges = (
        a.join(b, (F.col("a.p") == F.col("b.p")) & (F.col("a.s") != F.col("b.s")))
        .select(F.col("a.s").alias("src"), F.col("b.s").alias("dst"))
        .distinct()
        .persist()
    )
    nodes = ps.select("s").distinct().persist()
    deg = edges.groupBy(F.col("src").alias("s")).agg(F.count(F.lit(1)).alias("deg"))
    deg = deg.persist()
    n = nodes.count()  # the single driver scalar (node count)

    ranks = nodes.withColumn("r", F.lit(1.0 / n))
    for _ in range(PR_ITERS):
        contrib = (
            edges.join(ranks.withColumnRenamed("s", "src"), "src")
            .join(F.broadcast(deg.withColumnRenamed("s", "src")), "src")
            .groupBy(F.col("dst").alias("s"))
            .agg(F.sum(F.col("r") / F.col("deg")).alias("inflow"))
        )
        ranks = nodes.join(contrib, "s", "left").select(
            "s",
            (
                F.lit((1 - PR_DAMP) / n)
                + F.lit(PR_DAMP) * F.coalesce("inflow", F.lit(0.0))
            ).alias("r"),
        )
    ranked = ranks.select(
        "s",
        (F.floor(F.col("r") * 100000000 + F.lit(0.500001)) / 100000000).alias(
            "pagerank"
        ),
    )
    return (
        ranked.join(F.broadcast(sup), ranked.s == sup.s_suppkey)
        .select(F.col("s").cast("long").alias("s_suppkey"), "s_name", "pagerank")
        .orderBy(F.col("pagerank").desc(), "s_suppkey")
        .limit(PR_TOP)
    )
