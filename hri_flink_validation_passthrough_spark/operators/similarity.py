"""Similarity search over an embedding column (north star surface).

- ``knn_brute_force``: exact cosine top-k — the correctness baseline. Query
  side is broadcast; candidate scan is embarrassingly parallel; ranking uses
  a per-query window (shuffle on query id only).
- ``ann_ivf_topk``: IVF-style ANN — vectors are partitioned by nearest coarse
  centroid; queries probe only the closest ``nprobe`` partitions. This is the
  scale path: at 100 TB the candidate scan drops by ~nlist/nprobe, the
  centroid assignment is a broadcast join, and partitions can be pruned on
  disk when written out bucketed by ``cell``. Centroid choice is
  deterministic (the first ``nlist`` vectors by id) precisely so the whole
  operator is SQL-expressible and oracle-checked.

Vector math stays JVM-side (``zip_with``/``aggregate`` — codegen, no Python).
Ranking keys round the similarity to 6 decimals and tiebreak on neighbor id,
so ordering is reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import cosine_similarity
from ..plans import QuerySpec, register
from ..session import load_table, prepare

QUERIES: dict[str, QuerySpec] = {}

N_QUERIES = 10  # vec_id < 10 are the query vectors
TOP_K = 5
NLIST = 16  # IVF coarse cells (first NLIST vectors are the centroids)
NPROBE = 4


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare(spark)
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )


@register(
    QUERIES,
    "knn_brute_force",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ), q AS (
      SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id < {N_QUERIES}
    ), s AS (
      SELECT qid, v.vec_id AS nid,
             round(list_cosine_similarity(qe, v.e), 6) AS cos_sim
      FROM q, v WHERE v.vec_id != qid
    )
    SELECT qid, nid, cos_sim, rnk FROM (
      SELECT qid, nid, cos_sim,
             CAST(row_number() OVER (PARTITION BY qid
                                     ORDER BY cos_sim DESC, nid) AS BIGINT) AS rnk
      FROM s
    ) WHERE rnk <= {TOP_K}
    """,
    doc="Exact cosine top-k per query vector (broadcast queries × parallel "
    "candidate scan + per-query window).",
)
def knn_brute_force(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = _emb(spark, sf_dir)
    q = v.filter(F.col("vec_id") < N_QUERIES).withColumnsRenamed(
        {"vec_id": "qid", "e": "qe"}
    )
    pairs = v.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
    sim = F.round(cosine_similarity(F.col("qe"), F.col("e")), 6)
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("nid"))
    return (
        pairs.select(
            "qid", F.col("vec_id").alias("nid"), sim.alias("cos_sim")
        )
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= TOP_K)
    )


@register(
    QUERIES,
    "ann_ivf_topk",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ), cent AS (
      SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < {NLIST}
    ), assign AS (  -- each vector lives in its nearest centroid's cell
      SELECT vec_id, e, cid AS cell FROM (
        SELECT v.vec_id, v.e, cent.cid,
               row_number() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY round(list_cosine_similarity(v.e, cent.ce), 6) DESC,
                          cent.cid) AS rn
        FROM v, cent
      ) WHERE rn = 1
    ), q AS (
      SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id < {N_QUERIES}
    ), probes AS (  -- each query probes its nprobe closest cells
      SELECT qid, qe, cid AS cell FROM (
        SELECT q.qid, q.qe, cent.cid,
               row_number() OVER (
                 PARTITION BY q.qid
                 ORDER BY round(list_cosine_similarity(q.qe, cent.ce), 6) DESC,
                          cent.cid) AS rn
        FROM q, cent
      ) WHERE rn <= {NPROBE}
    ), s AS (
      SELECT p.qid, a.vec_id AS nid,
             round(list_cosine_similarity(p.qe, a.e), 6) AS cos_sim
      FROM probes p JOIN assign a ON a.cell = p.cell AND a.vec_id != p.qid
    )
    SELECT qid, nid, cos_sim, rnk FROM (
      SELECT qid, nid, cos_sim,
             CAST(row_number() OVER (PARTITION BY qid
                                     ORDER BY cos_sim DESC, nid) AS BIGINT) AS rnk
      FROM s
    ) WHERE rnk <= {TOP_K}
    """,
    doc=f"IVF ANN: {NLIST} coarse cells (deterministic centroids = first "
    f"{NLIST} vectors), vectors bucketed by nearest centroid, queries probe "
    f"{NPROBE} cells. Candidate scan shrinks ~nlist/nprobe at scale; "
    "cells map to disk buckets for partition pruning.",
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = _emb(spark, sf_dir)
    cent = (
        v.filter(F.col("vec_id") < NLIST)
        .withColumnsRenamed({"vec_id": "cid", "e": "ce"})
    )
    sim_vc = F.round(cosine_similarity(F.col("e"), F.col("ce")), 6)
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.desc("sim"), F.asc("cid")
    )
    assign = (
        v.crossJoin(F.broadcast(cent))
        .select("vec_id", "e", "cid", sim_vc.alias("sim"))
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "e", F.col("cid").alias("cell"))
    )
    q = v.filter(F.col("vec_id") < N_QUERIES).withColumnsRenamed(
        {"vec_id": "qid", "e": "qe"}
    )
    sim_qc = F.round(cosine_similarity(F.col("qe"), F.col("ce")), 6)
    w_probe = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("cid"))
    probes = (
        q.crossJoin(F.broadcast(cent))
        .select("qid", "qe", "cid", sim_qc.alias("sim"))
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= NPROBE)
        .select("qid", "qe", F.col("cid").alias("cell"))
    )
    pairs = assign.join(
        F.broadcast(probes),
        (assign.cell == probes.cell) & (assign.vec_id != probes.qid),
    )
    sim = F.round(cosine_similarity(F.col("qe"), F.col("e")), 6)
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("nid"))
    return (
        pairs.select("qid", F.col("vec_id").alias("nid"), sim.alias("cos_sim"))
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= TOP_K)
    )
