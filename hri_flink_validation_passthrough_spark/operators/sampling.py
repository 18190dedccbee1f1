"""Deterministic sampling / splitting operators for training-data pipelines.

A 100 TB corpus pipeline cannot use rand(): runs must be reproducible across
retries, engines, and partial re-reads, and a sample decision must be
recomputable per record with no coordination. The standard production answer
is content/key hashing — bucket = int(md5(key)[:8]) % N — which is exactly
expressible in both Spark (conv/substring/md5) and ANSI SQL, so every query
here is oracle-checked. All expressions are JVM-side builtins (whole-stage
codegen); nothing leaves the row.

Scale posture:
- Hash-bucket sampling/splitting is a narrow map-side filter: no shuffle, no
  state, prunes before any downstream join.
- Stratified per-group top-K uses one window shuffle on the group key (same
  shape as events_topk_users); K bounds the output per group.
- Embedding centroids (the k-means M-step) is posexplode + partial-agg
  groupBy: (label, dim) cardinality is tiny, so the combine happens map-side
  and the shuffle carries only per-partition partial sums.

Reference scope note: the reference (Alvearie/hri-flink-validation-passthrough)
has no sampling surface; these extend the engine's north-star LLM-pipeline
coverage (see VERDICT.md round 1, "LLM-data-pipeline operators").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import fingerprint_md5
from ..materialize import materialize
from ..plans import QuerySpec, register
from ..session import load_table, prepare

QUERIES: dict[str, QuerySpec] = {}

# Fixed salt: decouples the sampling hash from content-dedup fingerprints so
# the two decisions are independent. One constant, interpolated into BOTH
# engines — they cannot drift.
SAMPLE_SALT = "|corpus-v1"

# md5-hex → first 8 hex chars → int. Verified identical in Spark
# (conv(substring(md5(x),1,8),16,10)) and DuckDB (('0x'||substr(md5(x),1,8))::BIGINT).
_SQL_HASH = f"('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '{SAMPLE_SALT}'), 1, 8))::BIGINT"


def _hash_bucket(n: int):
    """Spark column: deterministic bucket in [0, n) from the doc_id + salt."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(SAMPLE_SALT))), 1, 8),
        16,
        10,
    ).cast("long")
    return h % n


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    prepare(spark)
    return load_table(spark, sf_dir, name)


@register(
    QUERIES,
    "sample_hash_10pct",
    oracle=f"""
    SELECT doc_id, source, n_chars, {_SQL_HASH} % 100 AS bucket
    FROM documents
    WHERE {_SQL_HASH} % 100 < 10
    """,
    doc="Deterministic 10% corpus sample by md5 hash bucket — reproducible "
    "across runs/engines, map-side only (no shuffle, no rand()).",
)
def sample_hash_10pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    b = _hash_bucket(100)
    return d.select("doc_id", "source", "n_chars", b.alias("bucket")).filter(
        F.col("bucket") < 10
    )


@register(
    QUERIES,
    "train_val_test_split",
    oracle=f"""
    SELECT CASE WHEN {_SQL_HASH} % 100 < 80 THEN 'train'
                WHEN {_SQL_HASH} % 100 < 90 THEN 'val'
                ELSE 'test' END AS split,
           lang,
           count(*)                     AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY split, lang
    """,
    doc="Deterministic 80/10/10 train/val/test assignment by hash bucket, "
    "audited per language — the reproducible-split primitive every corpus "
    "build needs (same doc always lands in the same split).",
)
def train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    b = _hash_bucket(100)
    split = (
        F.when(b < 80, F.lit("train")).when(b < 90, F.lit("val")).otherwise(F.lit("test"))
    )
    return (
        d.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


@register(
    QUERIES,
    "stratified_sample_by_source",
    oracle=f"""
    SELECT doc_id, source, rk FROM (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR) || '{SAMPLE_SALT}'), doc_id
             ) AS rk
      FROM documents
    ) WHERE rk <= 20
    """,
    doc="Stratified deterministic sample: top-K (K=20) docs per source in "
    "md5 order — an order-free, engine-independent 'random' K per stratum. "
    "One window shuffle on the stratum key; K bounds output per group.",
)
def stratified_sample_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    order_key = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(SAMPLE_SALT)))
    w = Window.partitionBy("source").orderBy(order_key, "doc_id")
    return (
        d.select("doc_id", "source", F.row_number().over(w).cast("long").alias("rk"))
        .filter(F.col("rk") <= 20)
    )


@register(
    QUERIES,
    "embedding_centroids",
    oracle="""
    SELECT label, pos, round(avg(val), 6) AS centroid FROM (
      SELECT label,
             CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS pos,
             CAST(unnest(embedding) AS DOUBLE)                     AS val
      FROM embeddings
    ) GROUP BY label, pos
    """,
    doc="Per-label per-dimension embedding mean (the k-means M-step / class "
    "prototype). posexplode + groupBy(label, pos): partial sums combine "
    "map-side, the shuffle carries only (labels x dims) partials.",
)
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    return (
        e.select(
            "label",
            F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "val"),
        )
        .groupBy("label", F.col("pos").cast("long").alias("pos"))
        .agg(F.round(F.avg("val"), 6).alias("centroid"))
    )


@register(
    QUERIES,
    "corpus_quality_pipeline",
    oracle=f"""
    WITH fp AS (
      SELECT doc_id, source, lang, text,
             md5(trim(regexp_replace(
                   regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                   ' +', ' ', 'g'))) AS fingerprint
      FROM documents
    ), kept AS (
      SELECT * FROM (
        SELECT *, min(doc_id) OVER (PARTITION BY fingerprint) AS keeper
        FROM fp
      ) WHERE doc_id = keeper
        AND lang IN ('en', 'de')
        AND {_SQL_HASH} % 100 < 50
    ), m AS (
      SELECT doc_id, source,
             regexp_split_to_array(lower(trim(text)), '\\s+') AS toks,
             length(text) AS n_char,
             length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g'))
               AS n_punct
      FROM kept
    )
    SELECT source,
           count(*) AS n_docs,
           round(avg(0.4 * (CAST(len(list_filter(toks,
                         x -> x IN ('the', 'a', 'of', 'and', 'to', 'in', 'is',
                                    'on', 'for', 'with'))) AS DOUBLE) / len(toks))
                     + 0.4 * least(len(toks) / 100.0, 1.0)
                     - 0.2 * (CAST(n_punct AS DOUBLE) / n_char)), 6) AS avg_quality
    FROM m
    GROUP BY source
    """,
    doc="End-to-end corpus build in one plan: exact dedup (keep lowest "
    "doc_id per content fingerprint) -> language filter -> deterministic "
    "50% hash sample -> per-source quality audit. Each stage is the "
    "scale-shape of its standalone operator: the dedup is one window "
    "shuffle on the fingerprint, the filters are map-side, the audit is a "
    "partial-agg groupBy.",
)
def corpus_quality_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .text import STOPWORDS

    d = _t(spark, sf_dir, "documents")
    keeper = F.min("doc_id").over(Window.partitionBy(fingerprint_md5("text")))
    kept = (
        d.withColumn("keeper", keeper)
        .filter(
            (F.col("doc_id") == F.col("keeper"))
            & F.col("lang").isin("en", "de")
            & (_hash_bucket(100) < 50)
        )
    )
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    stops_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_tokens = F.size(toks)
    stop_ratio = (
        F.size(F.filter(toks, lambda x: F.array_contains(stops_arr, x))).cast("double")
        / n_tokens
    )
    n_char = F.length("text")
    punct_ratio = (
        (n_char - F.length(F.regexp_replace("text", r"[.,;:!?]", ""))).cast("double")
        / n_char
    )
    quality = (
        0.4 * stop_ratio
        + 0.4 * F.least(n_tokens / F.lit(100.0), F.lit(1.0))
        - 0.2 * punct_ratio
    )
    return (
        kept.select("source", quality.alias("q"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("q"), 6).alias("avg_quality"),
        )
    )


# Sequence packing: context-window budget and the block size of the two-level
# parallel prefix sum. One constant pair for both engines.
PACK_CTX = 2048
PACK_BLOCK = 64


@register(
    QUERIES,
    "sequence_packing",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n_tokens
      FROM documents
    ), c AS (
      SELECT doc_id, n_tokens,
             sum(n_tokens) OVER (ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM t
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(cum - n_tokens AS BIGINT) AS start_offset,
           CAST((cum - n_tokens) // {PACK_CTX} AS BIGINT) AS chunk_id
    FROM c
    """,
    doc="Sequence packing for training: documents are laid end-to-end in "
    "doc_id order and chunked into fixed token-budget context windows "
    "(start offset = exclusive running token count, chunk = offset / ctx). "
    "The oracle uses a flat window cumsum; the Spark plan is the MULTI-"
    "LEVEL parallel prefix sum (within-block cumsum partitioned by "
    "doc_id/block in parallel + a RECURSIVE blocks-of-blocks exclusive "
    "prefix over the 64x-smaller summaries, bottoming out in one window "
    "task below 64k rows — exclusive_block_offsets), because a single "
    "ORDER BY window is one task at 100 TB. Same numbers at every depth "
    "(forced-recursion frame-equality pin + naive differential).",
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare(spark)
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    return pack_token_counts(
        d.select("doc_id", F.size(toks).cast("long").alias("n_tokens"))
    )


# When a block-summary level still exceeds this many rows, recurse another
# level instead of running one global window task over it. 64k rows of
# (key, tot) in a single window task is trivially cheap; each recursion
# level shrinks the summary by PACK_BLOCK (64×), so depth is
# log64(N/PACK_BLOCK/64k) — 2 levels past 4M docs, 3 past ~270M, 4 past
# ~17B. Tests shrink the bar to force multi-level on driver-sized data.
PREFIX_SINGLE_TASK_BAR = 1 << 16


def exclusive_block_offsets(summary: DataFrame, key: str) -> DataFrame:
    """Exclusive prefix sum over a ``(key, tot)`` summary frame: for each
    key, the sum of ``tot`` across all strictly-smaller keys, returned as
    ``(key, blk_offset)``.

    This is the upper half of the two-level prefix-sum pattern, made
    RECURSIVE: below ``PREFIX_SINGLE_TASK_BAR`` rows it is the familiar
    one-task global window; above it, blocks-of-blocks — an intra-parent
    exclusive window partitioned by ``key div PACK_BLOCK`` (parallel) plus
    a recursive call on the 64×-smaller parent summary. The parent-offset
    join joins on the same key the window just hash-partitioned by, so the
    exchange is reused; AQE broadcasts the parent side when it is small.
    The one count() that picks the shape runs on a lazily materialized
    summary, so the aggregation feeding it is computed once."""
    summary = materialize(summary, eager=False)
    if summary.count() <= PREFIX_SINGLE_TASK_BAR:
        w = Window.orderBy(key).rowsBetween(Window.unboundedPreceding, -1)
        return summary.select(
            key,
            F.coalesce(F.sum("tot").over(w), F.lit(0)).alias("blk_offset"),
        )
    s = summary.withColumn("pk", (F.col(key) / PACK_BLOCK).cast("long"))
    w_in = (
        Window.partitionBy("pk")
        .orderBy(key)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    s = s.withColumn(
        "local_off", F.coalesce(F.sum("tot").over(w_in), F.lit(0))
    )
    parents = s.groupBy("pk").agg(F.sum("tot").alias("tot"))
    par_off = exclusive_block_offsets(
        parents.select(F.col("pk").alias(key), "tot"), key
    ).select(F.col(key).alias("pk"), F.col("blk_offset").alias("parent_off"))
    return s.join(par_off, "pk").select(
        key, (F.col("local_off") + F.col("parent_off")).alias("blk_offset")
    )


def pack_token_counts(t: DataFrame) -> DataFrame:
    """The packing core over an arbitrary (doc_id, n_tokens) frame —
    frame-parameterized so pipelines can pack a FILTERED corpus (the
    quality->dedup->decontam survivors in the e2e composition test), not
    just the raw table. Plan identical to the registered query's."""
    t = t.withColumn("blk", (F.col("doc_id") / PACK_BLOCK).cast("long"))
    # level 1: cumsum within each block — parallel across blocks
    w_in = (
        Window.partitionBy("blk")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = t.withColumn("cum_in", F.sum("n_tokens").over(w_in))
    # upper levels: recursive exclusive prefix over per-block totals
    # (N/PACK_BLOCK rows — single window task below the bar, blocks-of-
    # blocks above it; r14, the docstring's promised recursion made real).
    # The offsets join keys on blk, the same key the level-1 window just
    # partitioned t by, so the exchange is reused; a FORCED broadcast here
    # would ship N/64 rows through the driver at 100 TB — let AQE pick
    # broadcast only while the offsets side is actually small.
    blk_tot = t.groupBy("blk").agg(F.sum("n_tokens").alias("tot"))
    blk_pre = exclusive_block_offsets(blk_tot, "blk")
    joined = t.join(blk_pre, "blk")
    start = F.col("blk_offset") + F.col("cum_in") - F.col("n_tokens")
    return joined.select(
        "doc_id",
        "n_tokens",
        start.alias("start_offset"),
        F.floor(start / PACK_CTX).cast("long").alias("chunk_id"),
    )


# Deterministic training-order shuffle: shards + within-shard hash order.
SHUFFLE_SHARDS = 16
SHUFFLE_SALT = "|shuffle-v1"


@register(
    QUERIES,
    "corpus_shuffle_assignment",
    oracle=f"""
    WITH h AS (
      SELECT doc_id,
             {_SQL_HASH} % {SHUFFLE_SHARDS} AS shard,
             md5(CAST(doc_id AS VARCHAR) || '{SHUFFLE_SALT}') AS ord
      FROM documents
    )
    SELECT doc_id, shard,
           CAST(row_number() OVER (PARTITION BY shard ORDER BY ord, doc_id)
                AS BIGINT) AS pos
    FROM h
    """,
    doc="Deterministic corpus shuffle for training order: every doc gets a "
    "(shard, position) from two independent content hashes — reproducible "
    "across runs, engines, and retries (no rand()), which data-order-"
    "sensitive training runs require. The shard hash reuses the sampling "
    "hash; the order hash is salted independently so shard and order are "
    "uncorrelated. One window shuffle on the shard key; shards are read "
    "round-robin at train time, so no global sort ever happens.",
)
def corpus_shuffle_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    ordh = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(SHUFFLE_SALT)))
    w = Window.partitionBy("shard").orderBy("ord", "doc_id")
    return (
        d.select(
            "doc_id",
            _hash_bucket(SHUFFLE_SHARDS).alias("shard"),
            ordh.alias("ord"),
        )
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select("doc_id", "shard", "pos")
    )


# Token budget per source for the mixture sampler (tokens, not docs — the
# unit that matters for a training run's data recipe).
MIX_BUDGET = 800


@register(
    QUERIES,
    "mixture_token_budget",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source,
             len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n_tok,
             md5(CAST(doc_id AS VARCHAR)) AS h
      FROM documents
    ), c AS (
      SELECT doc_id, source, n_tok,
             sum(n_tok) OVER (PARTITION BY source ORDER BY h, doc_id
                              ROWS UNBOUNDED PRECEDING) - n_tok AS cum_before
      FROM t
    )
    SELECT source,
           CAST(count(*) AS BIGINT)   AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens
    FROM c WHERE cum_before < {MIX_BUDGET}
    GROUP BY source
    """,
    doc="Data-mixture sampling by TOKEN budget (the training-recipe op): "
    "per source, documents are taken in deterministic md5 order until the "
    "source's token budget fills (greedy fill — the doc that crosses the "
    "budget is kept, so every budget>0 yields at least one doc). The "
    "running token total is a two-level prefix sum over 256 hash-prefix "
    "buckets — a flat per-source window would serialize each source "
    "(sources are FEW and HUGE at 100 TB, the worst window shape); the "
    "hash-prefix bucket key is a prefix of the ordering key, so bucket "
    "boundaries respect (h, doc_id) order exactly. Oracle uses the flat "
    "window (equal by construction).",
)
def mixture_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        "source",
        F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("n_tok"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    ).withColumn("bucket", F.substring("h", 1, 2))
    w_in = (
        Window.partitionBy("source", "bucket")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    t = t.withColumn("cum_in", F.sum("n_tok").over(w_in))
    w_buckets = (
        Window.partitionBy("source")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        t.groupBy("source", "bucket")
        .agg(F.max("cum_in").alias("b_total"))
        .withColumn(
            "b_offset", F.coalesce(F.sum("b_total").over(w_buckets), F.lit(0))
        )
        .select("source", "bucket", "b_offset")
    )
    c = t.join(F.broadcast(offsets), ["source", "bucket"]).withColumn(
        "cum_before", F.col("b_offset") + F.col("cum_in") - F.col("n_tok")
    )
    return (
        c.filter(F.col("cum_before") < MIX_BUDGET)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
        )
    )


WSAMPLE_K = 5  # docs kept per source stratum
# 12 hex chars = 48 bits -> u in [0,1) with 2^-48 resolution; 2^48 is exactly
# representable, so u is the same double in both engines.
_WSAMPLE_U = (
    f"(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '{SAMPLE_SALT}w'), 1, 12))::BIGINT"
    " + 0.5) / 281474976710656.0"
)


@register(
    QUERIES,
    "weighted_sample_per_source",
    oracle=f"""
    WITH keyed AS (
      SELECT source, doc_id, n_chars,
             ln({_WSAMPLE_U}) / n_chars AS k
      FROM documents
    ), ranked AS (
      SELECT source, doc_id, n_chars,
             row_number() OVER (PARTITION BY source ORDER BY k DESC, doc_id) AS rn
      FROM keyed
    )
    SELECT source, doc_id, CAST(n_chars AS BIGINT) AS n_chars
    FROM ranked WHERE rn <= {WSAMPLE_K}
    """,
    doc="Weighted sampling WITHOUT replacement per source stratum "
    "(Efraimidis–Spirakis A-ES): each doc gets key ln(u)/w with u a "
    "deterministic 48-bit hash uniform and w = n_chars; the top-K keys per "
    "stratum ARE a weighted sample without replacement. One map-side key "
    "computation + a per-stratum top-K — mergeable across partitions, no "
    "rand(), reproducible across engines/runs. The +0.5 offset keeps u "
    "strictly inside (0,1) so ln(u) is always finite.",
)
def weighted_sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(SAMPLE_SALT + "w"))),
                1,
                12,
            ),
            16,
            10,
        ).cast("long")
        + F.lit(0.5)
    ) / F.lit(281474976710656.0)
    keyed = d.select(
        "source", "doc_id", "n_chars", (F.log(u) / F.col("n_chars")).alias("k")
    )
    w = Window.partitionBy("source").orderBy(F.col("k").desc(), "doc_id")
    return (
        keyed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= WSAMPLE_K)
        .select("source", "doc_id", F.col("n_chars").cast("long").alias("n_chars"))
    )
