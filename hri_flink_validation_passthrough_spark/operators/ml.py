"""Distributed ML training steps as relational dataflow.

Full-batch logistic-regression gradient descent, unrolled: every step is
ONE aggregate over the data (the two gradient components + the log-loss),
and the only driver-side state is the 2-float parameter vector — the same
model-artifact pattern as the IVF centroids and the PQ codebook. This is
the shape a 100 TB trainer actually uses for shallow models (each step =
one map-reduce pass; parameters broadcast back into the next pass's
closure as literals).

Cross-engine determinism: the collected gradient scalars are snapped to
the 1e-9 grid with the repo's floor-nudge rule before they parameterize
the next step, so the two engines iterate over IDENTICAL parameter
vectors and float-noise cannot compound across steps.

Reference parity note: the reference engine (Alvearie
hri-flink-validation-passthrough) has no ML surface; north-star extension
next to ``ols_price_on_quantity`` (closed-form regression) and
``kmeans_one_iteration``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans import QuerySpec, register
from ..session import load_table, prepare

QUERIES: dict[str, QuerySpec] = {}

LR_STEPS = 3
LR_RATE = 1.0
LR_XSCALE = 50.0  # l_quantity in [1, 50] -> x in (0, 1]


def _lr_oracle() -> str:
    # chained CTEs: step k computes (loss at params_{k-1}, gradient) in one
    # aggregate, then params_k = params_{k-1} - lr * grad, snapped at 1e-9 —
    # identical algebra to the Spark driver loop.
    lines = [
        f"""d AS (
      SELECT l_quantity / {LR_XSCALE} AS x,
             CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS y
      FROM lineitem
    )""",
        "p0 AS (SELECT 0.0 AS w0, 0.0 AS w1)",
    ]
    for k in range(1, LR_STEPS + 1):
        p = f"p{k - 1}"
        lines.append(
            f"""s{k} AS (
      SELECT w0, w1,
             avg(1.0 / (1.0 + exp(-(w0 + w1 * x))) - y) AS g0,
             avg((1.0 / (1.0 + exp(-(w0 + w1 * x))) - y) * x) AS g1,
             avg(-(y * ln(1.0 / (1.0 + exp(-(w0 + w1 * x))))
                   + (1.0 - y) * ln(1.0 - 1.0 / (1.0 + exp(-(w0 + w1 * x))))))
               AS loss
      FROM d CROSS JOIN {p} GROUP BY w0, w1
    ), p{k} AS (
      SELECT floor((w0 - {LR_RATE} * g0) * 1000000000 + 0.500001) / 1000000000 AS w0,
             floor((w1 - {LR_RATE} * g1) * 1000000000 + 0.500001) / 1000000000 AS w1
      FROM s{k}
    )"""
        )
    steps_union = "\n      UNION ALL\n      ".join(
        f"SELECT {k} AS step, p{k}.w0, p{k}.w1, s{k}.loss FROM p{k} CROSS JOIN s{k}"
        for k in range(1, LR_STEPS + 1)
    )
    return (
        "\n    WITH "
        + ",\n    ".join(lines)
        + f"""
    SELECT CAST(step AS BIGINT) AS step,
           floor(w0 * 1000000 + 0.500001) / 1000000 AS w0,
           floor(w1 * 1000000 + 0.500001) / 1000000 AS w1,
           floor(loss * 1000000 + 0.500001) / 1000000 AS log_loss
    FROM ({steps_union})
    """
    )


def _snap9(v: float) -> float:
    import math

    return math.floor(v * 1e9 + 0.500001) / 1e9


@register(
    QUERIES,
    "logistic_gd_returnflag",
    oracle=_lr_oracle(),
    doc="Full-batch logistic regression P(l_returnflag='R') ~ sigmoid(w0 + "
    "w1 * quantity/50), 3 gradient-descent steps: each step is ONE "
    "aggregate over lineitem producing (loss at current params, both "
    "gradient components); the 2-float parameter vector is the only "
    "driver state, snapped to the 1e-9 grid between steps so both engines "
    "iterate identical params. Output: the 3-row training trajectory "
    "(step, w0, w1, loss-before-update). One map-reduce pass per step — "
    "the distributed-shallow-trainer shape.",
)
def logistic_gd_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare(spark)
    li = load_table(spark, sf_dir, "lineitem")
    # persisted: every GD step re-reads the (x, y) projection — 16 bytes/row,
    # the standard cache-the-training-set trade (MLlib does the same); the
    # alternative is one full lineitem scan per step
    d = li.select(
        (F.col("l_quantity") / LR_XSCALE).alias("x"),
        F.when(F.col("l_returnflag") == "R", 1.0).otherwise(0.0).alias("y"),
    ).persist()
    w0, w1 = 0.0, 0.0
    rows = []
    for step in range(1, LR_STEPS + 1):
        z = F.lit(w0) + F.lit(w1) * F.col("x")
        s = 1.0 / (1.0 + F.exp(-z))
        g = d.agg(
            F.avg(s - F.col("y")).alias("g0"),
            F.avg((s - F.col("y")) * F.col("x")).alias("g1"),
            F.avg(
                -(
                    F.col("y") * F.log(s)
                    + (1.0 - F.col("y")) * F.log(1.0 - s)
                )
            ).alias("loss"),
        ).collect()[0]
        rows.append((step, w0, w1, float(g["loss"])))
        w0 = _snap9(w0 - LR_RATE * float(g["g0"]))
        w1 = _snap9(w1 - LR_RATE * float(g["g1"]))
    # trajectory rows report the UPDATED params per step (matching the
    # oracle's p_k) alongside the loss measured before that update
    out = [
        (step, nw0, nw1, loss)
        for (step, _ow0, _ow1, loss), (nw0, nw1) in zip(
            rows, [(r[1], r[2]) for r in rows[1:]] + [(w0, w1)]
        )
    ]

    def r6(v: float) -> float:
        import math

        return math.floor(v * 1e6 + 0.500001) / 1e6

    return spark.createDataFrame(
        [(s, r6(a), r6(b), r6(loss)) for s, a, b, loss in out],
        "step long, w0 double, w1 double, log_loss double",
    )
