"""Deduplication operators — the first pass of any 100 TB training-data
pipeline (north star surface): exact, fingerprint, n-gram Jaccard,
MinHash+LSH, SimHash, embedding-cosine near-dup.

Scale design notes:
- exact/fingerprint dedup = hash groupBy (one shuffle, map-side partial agg);
- n-gram Jaccard uses an inverted shingle index (explode → equi-join →
  count), which is exact but explodes on stop-shingles — it is the
  *verification* path. The *scale* path is MinHash+LSH: constant-size
  signatures (64 hashes), banding (32×2) so only same-bucket pairs are
  compared, candidate verification against true shingle sets. All hashing is
  ``xxhash64`` — JVM-side, codegen, no Python;
- SimHash gives a single 64-bit hamming sketch per doc (cheapest near-dup
  at scale, bucketable by bit-prefix);
- embedding cosine dedup mirrors the similarity-search operator at
  threshold 0.95.

The LSH parameters (32 bands × 2 rows) make the miss probability at the 0.8
verification threshold ≈ (1 − 0.8²)³² ≈ 6e-15, so the LSH output is
deterministically equal to the brute-force pair set at this scale — which is
why ``dedup_minhash_lsh`` can be oracle-checked against the exact SQL.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import cosine_similarity, fingerprint_md5
from ..plans import QuerySpec, register
from ..session import load_table, prepare
from ..materialize import cut, materialize

QUERIES: dict[str, QuerySpec] = {}

# Shared brute-force 3-gram Jaccard oracle (DuckDB); threshold interpolated.
_JACCARD_ORACLE = """
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
      FROM documents
    ), s AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(toks) - 1),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
      FROM t WHERE len(toks) >= 3
    ), e AS (
      SELECT doc_id, unnest(sh) AS g FROM s
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
      FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(CAST(shared AS DOUBLE) / (sa.n + sb.n - shared), 6) AS jaccard
    FROM pairs
    JOIN (SELECT doc_id, len(sh) AS n FROM s) sa ON sa.doc_id = doc_a
    JOIN (SELECT doc_id, len(sh) AS n FROM s) sb ON sb.doc_id = doc_b
    WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= {thr}
"""


def _shingles(df: DataFrame, n: int = 3) -> DataFrame:
    """doc_id + distinct word n-gram shingle array (JVM-side, codegen)."""
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    df = df.select("doc_id", toks.alias("toks")).filter(F.size("toks") >= n)
    gram = F.transform(
        F.sequence(F.lit(1), F.size("toks") - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(F.col("toks"), (i + k).cast("int")) for k in range(n)]
        ),
    )
    return df.select("doc_id", F.array_distinct(gram).alias("sh"))


def _jaccard_pairs(s: DataFrame, threshold: float) -> DataFrame:
    """Exact pair Jaccard via (uncapped) inverted shingle index over the
    shingle table ``s`` (doc_id, sh)."""
    sizes = s.select("doc_id", F.size("sh").alias("n"))
    e = s.select("doc_id", F.explode("sh").alias("g"))
    a, b = e.alias("a"), e.alias("b")
    pairs = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.withColumnsRenamed({"doc_id": "doc_a", "n": "na"})
    sb = sizes.withColumnsRenamed({"doc_id": "doc_b", "n": "nb"})
    jac = F.col("shared").cast("double") / (F.col("na") + F.col("nb") - F.col("shared"))
    return (
        pairs.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .filter(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


# Posting-list cap for the capped candidate index: shingles appearing in more
# than DF_CAP docs (boilerplate/stop-shingles) are dropped from CANDIDATE
# GENERATION only — verification always uses the full shingle sets, so any
# surviving pair's Jaccard is exact. A pair is missed only when ALL its shared
# shingles are hot, the standard df-cap trade in production dedup. The same
# cap appears verbatim in the DuckDB oracles, so both engines agree bit-for-bit.
DF_CAP = 256


def _pair_structs(ids, a_name: str = "doc_a", b_name: str = "doc_b"):
    """All unordered id pairs of a collected bucket as (least, greatest)
    structs — the in-array combination expansion every bucketed pipeline
    (df-capped index, MinHash bands, SRP keys, SimHash bands, tf-idf
    postings) shares. One definition so the slice bounds and the
    least/greatest canonicalization cannot drift between copies (r11
    self-review)."""
    return F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + 2, F.size(ids)),
                lambda y: F.struct(
                    F.least(x, y).alias(a_name), F.greatest(x, y).alias(b_name)
                ),
            ),
        )
    )


def _capped_shared_rare(s: DataFrame, df_cap: int) -> tuple[DataFrame, DataFrame]:
    """(shared_rare, stats) from the df-capped inverted index:
    ``shared_rare(doc_a, doc_b, shared_rare)`` counts the rare (df ≤ cap)
    shingles each candidate pair shares; ``stats(doc_id, n, hot)`` carries
    each doc's total shingle count and its count of hot (df > cap) shingles.
    Shared by the Jaccard and the containment candidate paths — both prune
    with a bound built from exactly these two tables."""
    e = s.select("doc_id", F.explode("sh").alias("g"))
    # One groupBy builds the posting list AND applies the df cap (size ≤ cap);
    # pairs come from in-array combination expansion, not a self-join — the
    # self-join form shuffles the exploded index twice and re-executes the
    # shingle subtree on both sides. Max L²/2 combos per shingle = cap²/2,
    # bounded by construction.
    lists = (
        e.groupBy("g")
        .agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids") <= df_cap)
    )
    pair_structs = _pair_structs(F.col("ids"))
    # shared_rare = |rare shingles the pair shares| (count per pair, not
    # dropDuplicates — the count powers the pruning bound below for free).
    shared_rare = (
        lists.filter(F.size("ids") > 1)
        .select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("shared_rare"))
    )
    # Upper-bound prune BEFORE the exact array verification: a pair can share
    # at most min(hot_a, hot_b) additional (hot, df>cap) shingles, so
    #   shared_exact ≤ shared_rare + min(hot_a, hot_b) = shared_ub
    # and jaccard ≤ shared_ub / (n_a + n_b − shared_ub). Pairs whose bound
    # misses the threshold are pruned with zero recall loss (bound ≥ true
    # value), which collapses the verify set from O(candidates) to ≈O(output)
    # — at sf0.1 that is 1.13 M candidates → ~300 survivors. Verification on
    # survivors uses the FULL shingle arrays, so results stay exact.
    n_rare = (
        lists.select(F.explode("ids").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_rare"))
    )
    stats = (
        s.select("doc_id", F.size("sh").alias("n"))
        .join(n_rare, "doc_id", "left")
        .select(
            "doc_id", "n",
            (F.col("n") - F.coalesce(F.col("n_rare"), F.lit(0))).alias("hot"),
        )
    )
    return shared_rare, stats


def _jaccard_pairs_capped(s: DataFrame, threshold: float, df_cap: int = DF_CAP) -> DataFrame:
    """Jaccard pairs with a df-capped inverted index: candidate pairs come from
    shingles with document frequency ≤ df_cap (kills the O(postings²) blowup on
    hot shingles — `postings² ≤ df_cap²` per shingle); candidates are then
    verified EXACTLY against the full shingle arrays. This is the production
    path for clusters/removal; `_jaccard_pairs` stays as the uncapped exact
    reference."""
    shared_rare, stats = _capped_shared_rare(s, df_cap)
    st_a = stats.select(
        F.col("doc_id").alias("doc_a"), F.col("n").alias("na"), F.col("hot").alias("hot_a")
    )
    st_b = stats.select(
        F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"), F.col("hot").alias("hot_b")
    )
    shared_ub = F.col("shared_rare") + F.least(F.col("hot_a"), F.col("hot_b"))
    jac_ub = shared_ub.cast("double") / (
        (F.col("na") + F.col("nb")).cast("double") - shared_ub
    )
    cand = (
        shared_rare.join(st_a, "doc_a")
        .join(st_b, "doc_b")
        .filter(jac_ub >= threshold)
        .select("doc_a", "doc_b")
    )
    return _verify_jaccard_pairs(cand, s, threshold)


# ---------------------------------------------------------------------------
# Per-session memo of persisted intermediates. The driver runs all queries of
# this module sequentially in ONE session; shingling and the 0.5-threshold pair
# set are shared by 4+ queries, so each is computed once and persisted (tiny:
# one row per doc / per near-dup pair). At 100 TB the same role is played by a
# checkpointed parquet dataset; in-session persist is the local analogue.
# ---------------------------------------------------------------------------
_MEMO: dict[tuple, DataFrame] = {}


def _memo_key(spark: SparkSession, sf_dir: str, what: str) -> tuple:
    # documents fingerprint in the key: an in-place corpus regeneration
    # invalidates every cached shingle/pair table (r9 ADVICE pattern,
    # generalized from similarity._fp_key). Computing the key also EVICTS
    # stale same-slot entries — their persisted plans are semantically
    # equal to any rebuild, and Spark's CacheManager would otherwise serve
    # the old InMemoryRelation (session.evict_stale_memo). Single choke
    # point: linkage's memo users share this function.
    from ..session import evict_stale_memo, source_fingerprint

    key = (
        spark.sparkContext.applicationId,
        sf_dir.rstrip("/"),
        what,
        source_fingerprint(sf_dir, "documents.parquet"),
    )
    evict_stale_memo(_MEMO, key, 3)
    return key


def _shingles_for(spark: SparkSession, sf_dir: str, n: int = 3) -> DataFrame:
    """Persisted (doc_id, sh) n-gram shingle table, computed once per session.

    Besides sharing work across the dedup/linkage/corpus families, the
    persist is a PLAN BARRIER: a bare ``_shingles(...)`` followed by a
    filter + explode lets Catalyst collapse the projection into the
    generator's implicit ``size(sh) > 0`` filter and push the whole shingle
    expression below the repartition Exchange — re-evaluating it (with the
    tokenizing split inlined once per element_at!) on the single
    pre-repartition input split. Observed 15-20x slowdown at sf0.1.
    """
    key = _memo_key(spark, sf_dir, f"shingles_{n}")
    if key not in _MEMO:
        par = spark.sparkContext.defaultParallelism
        docs = load_table(spark, sf_dir, "documents").repartition(par, "doc_id")
        _MEMO[key] = _shingles(docs, n).persist()
    return _MEMO[key]


def _capped_pairs_for(spark: SparkSession, sf_dir: str, threshold: float) -> DataFrame:
    """Persisted df-capped Jaccard pair set at `threshold` (production path)."""
    key = _memo_key(spark, sf_dir, f"capped_pairs_{threshold}")
    if key not in _MEMO:
        s = _shingles_for(spark, sf_dir)
        _MEMO[key] = _jaccard_pairs_capped(s, threshold).persist()
    return _MEMO[key]


# DuckDB twin of the capped candidate index + exact verification (mirrors
# _jaccard_pairs_capped; {thr}/{cap} interpolated from the same constants).
_CAPPED_PAIRS_SQL = """
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
      FROM documents
    ), s AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(toks) - 1),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
      FROM t WHERE len(toks) >= 3
    ), e AS (
      SELECT doc_id, unnest(sh) AS g FROM s
    ), rare AS (
      SELECT g FROM e GROUP BY g HAVING count(*) <= {cap}
    ), ec AS (
      SELECT e.doc_id, e.g FROM e JOIN rare USING (g)
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM ec a JOIN ec b ON a.g = b.g AND a.doc_id < b.doc_id
    ), verified AS (
      SELECT doc_a, doc_b,
             CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) AS shared,
             CAST(len(sa.sh) + len(sb.sh) AS DOUBLE) AS total
      FROM cand
      JOIN s sa ON sa.doc_id = doc_a
      JOIN s sb ON sb.doc_id = doc_b
    )
    SELECT doc_a, doc_b, round(shared / (total - shared), 6) AS jaccard
    FROM verified
    WHERE shared / (total - shared) >= {thr}
"""


@register(
    QUERIES,
    "dedup_exact",
    oracle="""
    SELECT md5(text)      AS text_hash,
           min(doc_id)    AS keeper_doc_id,
           count(*)       AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
    doc="Exact dedup: hash-groupBy on content, keep lowest doc_id. One "
    "shuffle with map-side partial agg; the canonical first pass at 100 TB.",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare(spark)
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy(F.md5("text").alias("text_hash")).agg(
        F.min("doc_id").alias("keeper_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


@register(
    QUERIES,
    "dedup_fingerprint",
    oracle="""
    WITH f AS (
      SELECT doc_id,
             md5(trim(regexp_replace(
                   regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                   ' +', ' ', 'g'))) AS fp
      FROM documents
    )
    SELECT fp, min(doc_id) AS keeper_doc_id, count(*) AS n_copies
    FROM f GROUP BY fp
    """,
    doc="Normalized-content dedup: collapses case/punct/whitespace variants "
    "that exact hashing misses.",
)
def dedup_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare(spark)
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy(fingerprint_md5("text").alias("fp")).agg(
        F.min("doc_id").alias("keeper_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


@register(
    QUERIES,
    "dedup_ngram_jaccard",
    oracle=_JACCARD_ORACLE.format(thr=0.5),
    doc="Exact 3-gram Jaccard near-dup pairs (threshold 0.5) via inverted "
    "shingle index. Exact but O(postings²) on hot shingles — the "
    "verification path; LSH below is the scale path.",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare(spark)
    return _jaccard_pairs(_shingles_for(spark, sf_dir), 0.5)


@register(
    QUERIES,
    "dedup_minhash_lsh",
    oracle=_JACCARD_ORACLE.format(thr=0.8),
    doc="MinHash (64 perms) + LSH banding (32 bands × 2 rows) candidate "
    "generation, exact-Jaccard verification at 0.8. Constant-size state per "
    "doc; only same-bucket pairs compared → survives 100 TB. Miss prob at "
    "0.8 ≈ 6e-15, so output equals the brute-force oracle.",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare(spark)
    # _shingles_for repartitions the doc table across all cores BEFORE the
    # expensive projection (a single parquet file arrives as one input
    # partition locally; at 100 TB the scan already has thousands) and
    # persists the result shared with the other dedup queries.
    s = _shingles_for(spark, sf_dir)  # doc_id, sh (distinct shingles)
    buckets = _minhash_buckets(s)
    pair_structs = _pair_structs(F.col("ids"))
    cand = (
        buckets.groupBy("bkey")
        .agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids") > 1)
        .select(F.explode(pair_structs).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .dropDuplicates(["doc_a", "doc_b"])  # pairs collide in many bands
    )
    return _verify_jaccard_pairs(cand, s, 0.8)


def _minhash_buckets(s: DataFrame) -> DataFrame:
    """(doc_id, bkey) LSH bucket memberships — shared by the full corpus
    dedup and the incremental delta-vs-corpus variant.

    64-permutation MinHash signature. Shingle STRINGS are hashed exactly
    once JVM-side (xxhash64); the 64 permutations are multiply-add over
    uint64 computed as one numpy matrix op per Arrow batch in a pandas
    UDF — the expression-tree form (64 nested transforms) spends more
    time building arrays than hashing. 32 bands x 2 rows: band key =
    xxhash64 of the band's signature slice WITH the band index as a hash
    argument, so distinct bands land in distinct key spaces and a single
    8-byte bkey is the whole bucket identity — the x32 exploded rows and
    the bucket shuffle carry (doc_id, bkey) only, no separate band column
    (a cross-band 64-bit hash collision merely adds candidate pairs,
    which the exact-Jaccard verification stage discards). Explode ONLY
    (doc_id, bkey): the shingle arrays must not ride through the x32
    explode (that amplification was the first bench cost)."""
    base = s.select(
        "doc_id",
        F.transform(F.col("sh"), lambda g: F.xxhash64(g)).alias("hs"),
    )
    sig_udf = F.pandas_udf(_minhash_signature, "array<long>")
    signed = base.select("doc_id", sig_udf("hs").alias("sig"))
    bands = F.transform(
        F.sequence(F.lit(0), F.lit(31)),
        lambda b: F.xxhash64(
            F.element_at(F.col("sig"), (2 * b + 1).cast("int")),
            F.element_at(F.col("sig"), (2 * b + 2).cast("int")),
            b,
        ),
    )
    # Candidates come from groupBy(bucket) + in-array pair combinations
    # rather than a self-join: one pass over the signature pipeline instead
    # of two (self-joins re-execute the expensive subtree on both sides).
    return signed.select("doc_id", F.explode(bands).alias("bkey"))


def _verify_jaccard_pairs(cand: DataFrame, s: DataFrame, thr: float) -> DataFrame:
    """Exact-Jaccard verification of candidate (doc_a, doc_b) pairs against
    the shingle table — the LSH pipelines' shared last stage.

    The self-pair guard makes the bucket stage airtight (ADVICE r15): with
    the band index folded into the 64-bit bkey, a same-doc cross-band key
    collision (~2^-59 per doc) would put one doc_id twice in a bucket and
    the resulting (x, x) candidate passes exact Jaccard at 1.0; real
    near-dup pairs always have doc_a < doc_b, so the guard drops only
    degenerate self-pairs."""
    cand = cand.filter(F.col("doc_a") != F.col("doc_b"))
    sh_a = s.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sha"))
    sh_b = s.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("shb"))
    verified = cand.join(sh_a, "doc_a").join(sh_b, "doc_b")
    shared = F.size(F.array_intersect("sha", "shb")).cast("double")
    union = (F.size("sha") + F.size("shb")).cast("double") - shared
    jac = shared / union
    return verified.filter(jac >= thr).select(
        "doc_a", "doc_b", F.round(jac, 6).alias("jaccard")
    )


# Incremental split point: docs with id below 3/4 of max are the standing
# corpus, the rest are "today's ingest". Integer arithmetic on both engines
# so the split can't drift.
_DELTA_NUM, _DELTA_DEN = 3, 4


@register(
    QUERIES,
    "dedup_incremental_delta",
    oracle="""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
      FROM documents
    ), s AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(toks) - 1),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
      FROM t WHERE len(toks) >= 3
    ), e AS (
      SELECT doc_id, unnest(sh) AS g FROM s
    ), mx AS (
      SELECT max(doc_id) * 3 // 4 AS split FROM documents
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
      FROM e a JOIN e b ON a.g = b.g CROSS JOIN mx
      WHERE a.doc_id < mx.split AND b.doc_id >= mx.split
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(CAST(shared AS DOUBLE) / (sa.n + sb.n - shared), 6) AS jaccard
    FROM pairs
    JOIN (SELECT doc_id, len(sh) AS n FROM s) sa ON sa.doc_id = doc_a
    JOIN (SELECT doc_id, len(sh) AS n FROM s) sb ON sb.doc_id = doc_b
    WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.8
    """,
    doc="Incremental (delta-vs-corpus) near-dup detection — the nightly "
    "ingest filter at 100 TB: only NEW docs (id >= 3/4 of max, the 'daily "
    "delta') are checked against the STANDING corpus through the same "
    "MinHash-LSH banding as dedup_minhash_lsh, and per LSH bucket the pair "
    "expansion is old x new ONLY (two null-skipping collect_lists) — "
    "never corpus x corpus (already deduped yesterday) and never delta x "
    "delta (tiny, handled by the full pipeline on the delta alone). "
    "Candidate cost scales with |delta|, not |corpus|: the corpus side "
    "contributes only bucket membership, which in production is the STORED "
    "signature index (the text twin of ivf_upsert_index's cell "
    "assignment). Same banding recall guarantee as the full dedup; exact "
    "verification at 0.8. Oracle = brute-force cross-partition pairs.",
)
def dedup_incremental_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare(spark)
    max_id = (
        load_table(spark, sf_dir, "documents").agg(F.max("doc_id")).collect()[0][0]
    )
    # empty corpus: no split point, and the shingle/bucket stages below are
    # empty anyway — 0 keeps the arithmetic total (r14 empty-corpus sweep)
    split = (max_id or 0) * _DELTA_NUM // _DELTA_DEN
    s = _shingles_for(spark, sf_dir)
    buckets = _minhash_buckets(s).withColumn(
        "is_new", F.col("doc_id") >= split
    )
    # old x new cross pairs per bucket: collect_list skips the nulls the
    # two WHENs produce, so each bucket carries its sides as two arrays
    olds, news = F.col("olds"), F.col("news")
    pair_structs = F.flatten(
        F.transform(
            olds,
            lambda a: F.transform(
                news,
                lambda b: F.struct(a.alias("doc_a"), b.alias("doc_b")),
            ),
        )
    )
    cand = (
        buckets.groupBy("bkey")
        .agg(
            F.collect_list(
                F.when(~F.col("is_new"), F.col("doc_id"))
            ).alias("olds"),
            F.collect_list(
                F.when(F.col("is_new"), F.col("doc_id"))
            ).alias("news"),
        )
        .filter((F.size(olds) > 0) & (F.size(news) > 0))
        .select(F.explode(pair_structs).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return _verify_jaccard_pairs(cand, s, 0.8)


# 64 deterministic odd multipliers/offsets for the MinHash permutation family
# h_p(x) = (A[p]*x + B[p]) mod 2^64 over xxhash64-distributed inputs.
_RNG = np.random.RandomState(0x5EED)
_MH_A = (_RNG.randint(0, 2**63, size=64, dtype=np.uint64) * 2 + 1).astype(np.uint64)
_MH_B = _RNG.randint(0, 2**63, size=64, dtype=np.uint64).astype(np.uint64)


def _minhash_signature(hs: pd.Series) -> pd.Series:
    """64-slot MinHash from pre-hashed shingles, one numpy matrix op per
    doc.

    r15 shipped a batch-wide form (docs concatenated per ~128 MB chunk,
    one multiply-add matrix op + segmented ``np.minimum.reduceat``); the
    driver measured the query 22% SLOWER and the r16 interleaved
    decomposition at sf1 confirmed it: the signature stage ran 1.3-15s
    batch-wide vs 0.9-3.3s per-doc, and even an 8 MB cache-sized chunk
    cap lost every aligned rep (2.0-2.6s vs 1.1-1.6s; OPTIMIZATION_r16.md).
    Per-doc (sum_len x 64) work stays in cache and reduceat's strided
    segmented min is slower than contiguous per-doc mins, while the numpy
    call overhead is amortized over >=64 shingle rows per doc — so the
    per-doc loop IS the fast form at real batch shapes. Reverted."""
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


def _simhash_from_hashes(hs: pd.Series) -> pd.Series:
    """Bit-majority over 64-bit token hashes, vectorized with numpy over the
    Arrow batch (the sanctioned slow path: pandas UDF, never per-row)."""
    shifts = np.arange(64, dtype=np.uint64)
    out = np.zeros(len(hs), dtype=np.int64)
    for j, arr in enumerate(hs):
        a = np.asarray(arr, dtype=np.int64).view(np.uint64)
        if a.size == 0:
            continue
        bits = ((a[:, None] >> shifts) & np.uint64(1)).sum(axis=0)
        maj = (bits * 2 >= a.size).astype(np.uint64)
        out[j] = (maj << shifts).sum(dtype=np.uint64).astype(np.int64)
    return pd.Series(out)


# RETIRED from the driver registry in r10 (COVERAGE.md capacity policy):
# this xxhash64 production variant was the registry's one remaining
# rows-only register with zero verification signal beyond its hash-green
# exact twin dedup_simhash_md5 (same banding, same hamming cut, md5 bit
# patterns reproducible in SQL). Final receipt: rows-only, 11 rows, stable
# r1->r7 (CORRECTNESS_r01/r07). The code stays as the production path and
# is pinned by tests/test_llm_operators.py::test_dedup_simhash_properties.
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per doc (bit-majority over token xxhash64), plus
    near-dup pairs at hamming <= 3 via 4 x 16-bit band blocking — the
    cheapest per-doc sketch. xxhash64 variant of dedup_simhash_md5, sharing
    its _banded_hamming_pairs blocking: with 4 bands a pair within hamming
    3 always matches in at least one band (pigeonhole), so recall is exact.
    (r11 self-review: the earlier single 16-bit-prefix blocking silently
    dropped pairs whose differing bits fell in the prefix.)"""
    prepare(spark)
    d = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    hashed = d.select(
        "doc_id", F.transform(toks, lambda t: F.xxhash64(t)).alias("hs")
    )
    simhash_udf = F.pandas_udf(_simhash_from_hashes, "long")  # lazy: needs session
    sig = hashed.select("doc_id", simhash_udf("hs").alias("sig"))
    return _banded_hamming_pairs(sig, n_bands=4, band_bits=16, ham_max=3)


@register(
    QUERIES,
    "dedup_clusters",
    oracle="""
    WITH RECURSIVE pairs AS (
    """
    + _CAPPED_PAIRS_SQL.format(thr=0.5, cap=DF_CAP)
    + """
    ), edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
      UNION SELECT doc_a, doc_a FROM pairs
      UNION SELECT doc_b, doc_b FROM pairs
    ), reach(a, b) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e2.b FROM reach r JOIN edges e2 ON r.b = e2.a
    )
    SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a
    """,
    doc="Near-dup clustering: connected components over the Jaccard≥0.5 "
    "pair graph (df-capped candidate index + exact verification — the "
    "production path) via iterative min-label propagation with per-iteration "
    "localCheckpoint (converges in O(diameter) joins); oracle is a "
    "recursive-CTE transitive closure over the identically-capped pair set.",
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare(spark)
    pairs = _capped_pairs_for(spark, sf_dir, 0.5).select("doc_a", "doc_b")
    labels = min_label_components(pairs, "doc_a", "doc_b")
    return labels.select(F.col("v").alias("doc_id"), F.col("lbl").alias("cluster_id"))


def min_label_components(
    pairs: DataFrame, a: str, b: str, max_rounds: int = 50
) -> DataFrame:
    """Connected components over an undirected pair list → (v, lbl) with
    lbl = min vertex id of v's component.

    Min-label propagation + pointer jumping to fixpoint. Each round:
      (1) neighbor step: label(v) ← min(label(v), min(label(u)) over
          neighbors u) — spreads the component-min one hop;
      (2) shortcut step: label(v) ← label(label(v)) — path compression,
          the star-contraction move: a chain of length L collapses in
          O(log L) rounds instead of O(L) (labels are always vertex ids
          with label(u) ≤ u, so composing is monotone and stays inside
          the component).
    Labels only ever DECREASE, so the sum of labels strictly decreases on
    any change — convergence is an observe() metric collected DURING each
    round's checkpoint materialization (one driver barrier per round, no
    separate aggregate job; see inline note). localCheckpoint per step
    keeps the plan O(1) deep instead of O(iterations) (lineage growth is
    what kills iterative DataFrame jobs) and materializes the frame the
    shortcut self-join reads twice.
    """
    edges = (
        pairs.selectExpr(f"{a} AS a", f"{b} AS b")
        .unionByName(pairs.selectExpr(f"{b} AS a", f"{a} AS b"))
        .distinct()
        .transform(cut(iterative=True))  # eager: truncates the pair-generation lineage
    )
    # Fused initialization (r15 opt): with initial labels equal to vertex
    # ids, the FIRST neighbor step is exactly one aggregation over the
    # doubled edge list — label(v) = min(v, min(b) over v's edges) — so the
    # r14 form's separate label init (a distinct = one shuffle of all
    # vertex ids) plus join-based first neighbor step collapse into a
    # single groupBy. Every vertex appears on the `a` side of the doubled
    # list, so coverage is identical.
    labels = (
        edges.groupBy("a")
        .agg(F.min("b").alias("mb"))
        .select(
            F.col("a").alias("v"), F.least(F.col("a"), F.col("mb")).alias("lbl")
        )
        .transform(cut(iterative=True))
    )
    prev_sum = None
    converged = False
    # Loop-invariant expression objects built ONCE (r16: Column objects are
    # immutable and reusable across DataFrames, so the per-round py4j
    # construction chatter drops to the join/select calls themselves).
    _jump_lbl = F.coalesce(F.col("ulbl"), F.col("lbl")).alias("lbl")
    _nb_lbl = F.least(
        F.col("lbl"), F.coalesce(F.col("nlbl"), F.col("lbl"))
    ).alias("lbl")
    _sum_lbl = F.sum("lbl").alias("s")
    from pyspark.sql import Observation

    for it in range(max_rounds):
        jump = labels.select(F.col("v").alias("u"), F.col("lbl").alias("ulbl"))
        # Convergence is checked EVERY round (r15 opt) and, since r16, the
        # aggregate rides the checkpoint's OWN materialization job as an
        # observe() metric (CollectMetrics) instead of a separate
        # agg.collect() action — one driver barrier per round instead of
        # two, identical value (the sum is computed over exactly the rows
        # the checkpoint materializes). Labels only ever decrease, so an
        # unchanged sum across the [neighbor; jump] cycle is a fixpoint —
        # the bracket argument is unchanged from r15: an n-fixpoint makes
        # labels constant per component, and min-id labels are self-stable.
        obs = Observation(f"mlc_conv_{it}")
        labels = (
            labels.join(jump, labels.lbl == jump.u, "left")
            .select("v", _jump_lbl)
            .observe(obs, _sum_lbl)
            .transform(cut(iterative=True))
        )
        cur_sum = obs.get["s"]
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
        neighbor_min = (
            edges.join(labels, edges.b == labels.v)
            .groupBy(edges.a)
            .agg(F.min("lbl").alias("nlbl"))
            .select(F.col("a").alias("v"), "nlbl")
        )
        labels = (
            labels.join(neighbor_min, "v", "left")
            .select("v", _nb_lbl)
            .transform(cut(iterative=True))
        )
    if not converged:
        raise RuntimeError(
            "min_label_components: did not converge within the iteration "
            "bound — component diameter exceeds 2^rounds"
        )
    return labels


@register(
    QUERIES,
    "dedup_removal_list",
    oracle="""
    WITH pairs AS (
    """
    + _CAPPED_PAIRS_SQL.format(thr=0.5, cap=DF_CAP)
    + """
    )
    SELECT DISTINCT doc_b AS removed_doc_id FROM pairs
    """,
    doc="End-to-end near-dup REMOVAL decision: greedy keep-lowest-id — a "
    "doc is removed iff it near-matches (Jaccard≥0.5) any lower doc_id, "
    "with pairs from the df-capped candidate index (production path). "
    "This is the materialized 'which rows do we delete from the corpus' "
    "answer a 100 TB pipeline writes back.",
)
def dedup_removal_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare(spark)
    pairs = _capped_pairs_for(spark, sf_dir, 0.5)
    return pairs.select(F.col("doc_b").alias("removed_doc_id")).distinct()


# Containment threshold: doc X is removed when >= this fraction of X's
# shingles also appear in some strictly-larger doc (or an equal-sized doc
# with a smaller id — the exact-twin tiebreak).
CONTAIN_TAU = 0.8


@register(
    QUERIES,
    "dedup_containment_removal",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
      FROM documents
    ), s AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(toks) - 1),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
      FROM t WHERE len(toks) >= 3
    ), e AS (
      SELECT doc_id, unnest(sh) AS g FROM s
    ), rare AS (
      SELECT g FROM e GROUP BY g HAVING count(*) <= {DF_CAP}
    ), ec AS (
      SELECT e.doc_id, e.g FROM e JOIN rare USING (g)
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM ec a JOIN ec b ON a.g = b.g AND a.doc_id < b.doc_id
    ), v AS (
      SELECT doc_a, doc_b,
             len(list_intersect(sa.sh, sb.sh)) AS shared,
             len(sa.sh) AS na, len(sb.sh) AS nb
      FROM cand
      JOIN s sa ON sa.doc_id = doc_a
      JOIN s sb ON sb.doc_id = doc_b
    ), directed AS (
      SELECT doc_a AS removed_doc_id, doc_b AS kept_doc_id,
             CAST(shared AS DOUBLE) / na AS containment, nb AS keeper_n
      FROM v
      WHERE CAST(shared AS DOUBLE) / na >= {CONTAIN_TAU}
        AND (nb > na OR (nb = na AND doc_b < doc_a))
      UNION ALL
      SELECT doc_b, doc_a, CAST(shared AS DOUBLE) / nb, na
      FROM v
      WHERE CAST(shared AS DOUBLE) / nb >= {CONTAIN_TAU}
        AND (na > nb OR (na = nb AND doc_a < doc_b))
    ), ranked AS (
      SELECT removed_doc_id, kept_doc_id,
             round(containment, 6) AS containment,
             row_number() OVER (
               PARTITION BY removed_doc_id
               ORDER BY round(containment, 6) DESC, keeper_n DESC, kept_doc_id
             ) AS rn
      FROM directed
    )
    SELECT removed_doc_id, kept_doc_id, containment FROM ranked WHERE rn = 1
    """,
    doc="CONTAINMENT dedup (r5 verdict ask #5 — the removal decision "
    "dedup_passage_shingles' stats never made): doc X is removed when "
    ">= tau of X's 3-gram shingles appear in a strictly-larger doc "
    "(equal size -> smaller id keeps), the asymmetric relation Jaccard "
    "misses when a snippet is embedded in a much longer doc. Candidates "
    "come from the shared df-capped inverted index (bucketed by shingle, "
    "never all-pairs), pruned by the one-sided bound "
    "(shared_rare + min(hot)) / n_x >= tau — zero recall loss — then "
    "verified EXACTLY on full shingle arrays. One keeper per removed doc "
    "(max containment, then larger keeper, then smaller id), rounded "
    "before ranking per the cross-engine float rule.",
)
def dedup_containment_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare(spark)
    s = _shingles_for(spark, sf_dir)
    shared_rare, stats = _capped_shared_rare(s, DF_CAP)
    st_a = stats.select(
        F.col("doc_id").alias("doc_a"), F.col("n").alias("na"),
        F.col("hot").alias("hot_a"),
    )
    st_b = stats.select(
        F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"),
        F.col("hot").alias("hot_b"),
    )
    shared_ub = (
        F.col("shared_rare") + F.least(F.col("hot_a"), F.col("hot_b"))
    ).cast("double")
    # one-sided containment bounds: shared_exact <= shared_ub, so
    # cont(X->Y) = shared/n_x <= shared_ub/n_x; prune only when BOTH
    # directions' bounds miss tau (zero recall loss)
    cand = (
        shared_rare.join(st_a, "doc_a")
        .join(st_b, "doc_b")
        .filter(
            (shared_ub / F.col("na") >= CONTAIN_TAU)
            | (shared_ub / F.col("nb") >= CONTAIN_TAU)
        )
        .select("doc_a", "doc_b")
    )
    sh_a = s.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sha"))
    sh_b = s.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("shb"))
    v = (
        cand.join(sh_a, "doc_a")
        .join(sh_b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("sha", "shb")).alias("shared"),
            F.size("sha").alias("na"),
            F.size("shb").alias("nb"),
        )
    )
    cont_a = F.col("shared").cast("double") / F.col("na")
    cont_b = F.col("shared").cast("double") / F.col("nb")
    removed_a = v.filter(
        (cont_a >= CONTAIN_TAU)
        & (
            (F.col("nb") > F.col("na"))
            | ((F.col("nb") == F.col("na")) & (F.col("doc_b") < F.col("doc_a")))
        )
    ).select(
        F.col("doc_a").alias("removed_doc_id"),
        F.col("doc_b").alias("kept_doc_id"),
        cont_a.alias("containment"),
        F.col("nb").alias("keeper_n"),
    )
    removed_b = v.filter(
        (cont_b >= CONTAIN_TAU)
        & (
            (F.col("na") > F.col("nb"))
            | ((F.col("na") == F.col("nb")) & (F.col("doc_a") < F.col("doc_b")))
        )
    ).select(
        F.col("doc_b").alias("removed_doc_id"),
        F.col("doc_a").alias("kept_doc_id"),
        cont_b.alias("containment"),
        F.col("na").alias("keeper_n"),
    )
    directed = removed_a.unionByName(removed_b).withColumn(
        "containment", F.round("containment", 6)
    )
    wk = Window.partitionBy("removed_doc_id").orderBy(
        F.desc("containment"), F.desc("keeper_n"), "kept_doc_id"
    )
    return (
        directed.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") == 1)
        .select("removed_doc_id", "kept_doc_id", "containment")
    )


@register(
    QUERIES,
    "dedup_embedding_cosine",
    oracle="""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_cosine_similarity(a.e, b.e), 6) AS cos_sim
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.e, b.e) >= 0.95
    """,
    doc="Embedding near-dup pairs at cosine ≥ 0.95 (semantic dedup). "
    "Brute-force all-pairs — kept as the exact baseline/oracle twin; "
    "dedup_embedding_srp_lsh below is the bucketed scale path.",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare(spark)
    emb = load_table(spark, sf_dir, "embeddings").filter(
        # NULL embeddings are unindexable — same rule as similarity._emb
        # (r14 null-corpus sweep)
        F.col("embedding").isNotNull()
    ).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    a = emb.withColumnsRenamed({"vec_id": "vec_a", "e": "ea"})
    b = emb.withColumnsRenamed({"vec_id": "vec_b", "e": "eb"})
    cos = cosine_similarity(F.col("ea"), F.col("eb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .filter(cos >= 0.95)
        .select("vec_a", "vec_b", F.round(cos, 6).alias("cos_sim"))
    )


# SRP-LSH (random-hyperplane sign sketch) parameters. P(bit agrees) for a
# pair at angle θ is 1−θ/π; at cosine 0.95 that is ≈0.899, so a pair at the
# threshold collides in at least one 8-bit band with probability
# 1−(1−0.899⁸)³² ≈ 1−2e-8 — the LSH output is deterministically equal to the
# brute-force pair set, which is why it shares the exact-SQL oracle.
SRP_BITS = 256
SRP_BANDS = 32
SRP_ROWS = 8  # bits per band; SRP_BANDS * SRP_ROWS == SRP_BITS
_SRP_SEED = 0x5EED1  # deterministic hyperplane family


def _srp_band_keys_factory(n_bands: int, n_rows: int):
    """Build the pandas UDF computing, per embedding, the ``n_bands`` SRP
    band keys AND the full sign signature packed into int64 words (for the
    Hamming prefilter). Hyperplanes are a fixed seeded Gaussian matrix
    (dim × bits, bits = bands × rows); the whole Arrow batch is one matrix
    multiply. ``H`` is built LAZILY from the first batch's dimensionality
    (r15 opt): deriving dim on the driver cost a ``limit(1).collect()``
    scan job on EVERY call, while inside the UDF it is one ``len()`` — and
    H stays a deterministic function of (dim, bits), identical on every
    task, so signatures are unchanged. Re-splitting the SAME total bit
    budget (bands × rows constant) reshapes the signature over an
    identical hyperplane family — ``H`` depends only on (dim, bits). A
    DIFFERENT total redraws every hyperplane: RandomState fills
    ``H = (dim, bits)`` row-major, so changing ``bits`` reassigns the
    whole draw sequence (r13 ADVICE — the earlier "same first bits" claim
    held only at constant budget)."""
    bits = n_bands * n_rows
    if bits % 64:
        raise ValueError(f"bands*rows must pack into int64 words, got {bits}")
    powers = 1 << np.arange(n_rows, dtype=np.int64)
    word_powers = (1 << np.arange(64, dtype=np.uint64)).astype(np.uint64)
    H_cache: dict[int, np.ndarray] = {}

    def srp_band_keys(es: pd.Series) -> pd.DataFrame:
        X = np.stack([np.asarray(e, dtype=np.float64) for e in es])
        dim = X.shape[1]
        H = H_cache.get(dim)
        if H is None:
            H = np.random.RandomState(_SRP_SEED).standard_normal((dim, bits))
            H_cache[dim] = H
        bits_m = (X @ H) >= 0.0  # (n, bits)
        bands = bits_m.reshape(len(es), n_bands, n_rows)
        keys = (bands * powers).sum(axis=2).astype(np.int64)  # (n, n_bands)
        # encode the band index into the key so one groupBy covers all bands
        keys += np.arange(n_bands, dtype=np.int64) << np.int64(n_rows)
        words = bits_m.reshape(len(es), bits // 64, 64).astype(np.uint64)
        sig = (words * word_powers).sum(axis=2).astype(np.int64)
        return pd.DataFrame({"keys": list(keys), "sig": list(sig)})

    return srp_band_keys


@register(
    QUERIES,
    "dedup_embedding_srp_lsh",
    oracle="""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_cosine_similarity(a.e, b.e), 6) AS cos_sim
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.e, b.e) >= 0.95
    """,
    doc="Scale-path embedding near-dup at cosine ≥ 0.95: SRP-LSH "
    "(256 random-hyperplane sign bits, 32 bands × 8 rows) buckets vectors, "
    "pairs are generated only within buckets (groupBy + in-array expansion, "
    "no self-join) and verified with the exact JVM-side cosine. Replaces the "
    "all-pairs cartesian of dedup_embedding_cosine with per-bucket work — "
    "the miss probability at the threshold is ≈2e-8, so the output equals "
    "the brute-force oracle.",
)
def dedup_embedding_srp_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare(spark)
    emb = load_table(spark, sf_dir, "embeddings").filter(
        # NULL embeddings are unindexable — same rule as similarity._emb
        # (r14 null-corpus sweep)
        F.col("embedding").isNotNull()
    ).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    return srp_lsh_pairs(emb, threshold=0.95)


def srp_lsh_pairs(
    emb: DataFrame,
    threshold: float,
    bands: int | None = None,
    rows_per_band: int | None = None,
) -> DataFrame:
    """SRP-LSH near-dup pairs over (vec_id, e: array<double>). Reusable core
    so tests can drive synthetic near-dup corpora through the same plan.

    Band-shape lever (r12 verdict ask #4 — parameterized here, defaults
    unchanged): ``bands × rows_per_band`` splits the signature bit budget.
    The shipped 32×8 gives miss ≈ 2e-8 at the 0.95 threshold (the oracle's
    exact-equality contract needs it). As the corpus grows, RANDOM band
    collisions at fixed shape inflate the candidate stage ~linearly
    (SCALING.md r12 10x soak — this is the headline set's one ~linear
    member); re-splitting the SAME 256-bit budget to 16×16 measured 4.5×
    faster at sf1 with 3/90000 pairs missed — the near-threshold tail
    (tools/ab_srp_params.py, BASELINE.md r12). The knob trades a
    quantified miss bound at EXACTLY the threshold for candidate-volume
    collapse; pairs above ~0.97 are retained with recall pinned by
    tests/test_llm_operators.py's band-shape recall floor. Resolution is
    call-time (None → module constants) so harnesses can flip the module
    knobs without re-binding defaults."""
    import math

    n_bands = SRP_BANDS if bands is None else bands
    n_rows = SRP_ROWS if rows_per_band is None else rows_per_band
    n_bits = n_bands * n_rows
    spark = emb.sparkSession
    par = spark.sparkContext.defaultParallelism
    emb = emb.repartition(par, "vec_id")
    # Hyperplanes are built lazily inside the UDF from the first batch's
    # dimensionality (r15 opt): the former driver-side dim probe was a
    # ``limit(1).collect()`` scan job on EVERY call. An empty corpus (the
    # r14 empty-corpus sweep's over-aggressive-upstream-filter case) now
    # simply flows zero rows through the fully-typed plan — the UDF is
    # never invoked, every stage is empty, and the result is the same
    # typed-empty frame the old short-circuit returned.
    keys_udf = F.pandas_udf(
        _srp_band_keys_factory(n_bands, n_rows),
        "keys array<long>, sig array<long>",
    )
    keyed = emb.select("vec_id", keys_udf("e").alias("ks")).select(
        "vec_id", F.col("ks.keys").alias("keys"), F.col("ks.sig").alias("sig")
    )
    # Three consumers read `keyed` (band buckets + both signature sidecars of
    # the Hamming prefilter); without materialization the pandas-UDF matrix
    # multiply runs three times. The signature sidecar is 36 longs per vector
    # — ~0.3% of the vector bytes — so computing it once is right at any
    # scale. Materialization is the REPO-WIDE policy switch (materialize.py
    # — the r13 generalization of the knob that lived here as
    # _SRP_MATERIALIZE): "ckpt" lazy-localCheckpoint default (the r7
    # eager-vs-lazy A/B; the r8 interleaved persist-vs-ckpt A/B in
    # BASELINE.md re-confirmed ckpt — tools/ab_srp_materialize.py is the
    # harness, now flipping materialize.POLICY), "reliable"/"persist"/"none"
    # per the module docstring.
    keyed = materialize(keyed, eager=False)
    buckets = keyed.select("vec_id", F.explode("keys").alias("bkey"))
    pair_structs = _pair_structs(F.col("ids"), "vec_a", "vec_b")
    cand = (
        buckets.groupBy("bkey")
        .agg(F.collect_list("vec_id").alias("ids"))
        .filter(F.size("ids") > 1)
        .select(F.explode(pair_structs).alias("p"))
        .select("p.vec_a", "p.vec_b")
    )
    ea = emb.select(F.col("vec_id").alias("vec_a"), F.col("e").alias("ea"))
    eb = emb.select(F.col("vec_id").alias("vec_b"), F.col("e").alias("eb"))
    cos = cosine_similarity(F.col("ea"), F.col("eb"))
    # Hamming prefilter between candidate generation and the exact cosine:
    # agreement(pair) ~ Binomial(n_bits, 1−θ/π). At the threshold the mean
    # is n_bits·p with σ = sqrt(n_bits·p·(1−p)); agreement ≥ mean − 6σ keeps
    # near-threshold pairs with P ≈ 1−1e-9 while a random band collision
    # (agreement ≈ 128, σ = 8) is > 9σ below the bar. The 4-word XOR +
    # bit_count runs JVM-side, so the expensive d-dim cosine is evaluated
    # only on ≈O(output) survivors instead of every bucket collision.
    p_bit = 1.0 - math.acos(min(max(threshold, -1.0), 1.0)) / math.pi
    agree_min = int(n_bits * p_bit - 6.0 * math.sqrt(n_bits * p_bit * (1 - p_bit)))
    sig_a = keyed.select(F.col("vec_id").alias("vec_a"), F.col("sig").alias("sig_a"))
    sig_b = keyed.select(F.col("vec_id").alias("vec_b"), F.col("sig").alias("sig_b"))
    hamming = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    # The filter runs BEFORE dropDuplicates: the per-vector signature sidecar
    # (4 longs) is far smaller than the vectors, so AQE broadcasts it when it
    # fits (then collisions are pruned map-side and the dedup shuffle carries
    # only ≈O(output) survivors) and falls back to SMJ when it doesn't —
    # either way the cheap 4-word filter precedes the wide-row cosine join.
    survivors = (
        cand.join(sig_a, "vec_a")
        .join(sig_b, "vec_b")
        .filter(hamming <= F.lit(n_bits - agree_min))
        .select("vec_a", "vec_b")
        .dropDuplicates(["vec_a", "vec_b"])
    )
    return (
        survivors.join(ea, "vec_a")
        .join(eb, "vec_b")
        .filter(cos >= threshold)
        .select("vec_a", "vec_b", F.round(cos, 6).alias("cos_sim"))
    )


# ---------------------------------------------------------------------------
# SimHash (md5 twin): fully oracle-checked variant of dedup_simhash.
# 60-bit signature from md5 (the one hash both engines compute identically;
# xxhash64 — the faster production hash above — has no DuckDB twin).
# 4 bands x 15 bits with hamming <= 3: any pair within the threshold has all
# its <= 3 differing bits in <= 3 bands, so AT LEAST one band matches exactly
# (pigeonhole) -> banded blocking has GUARANTEED recall and the bucketed
# Spark plan equals the brute-force SQL oracle, deterministically.
# ---------------------------------------------------------------------------
SIMHASH_MD5_BITS = 60
SIMHASH_MD5_BANDS = 4
SIMHASH_MD5_BAND_BITS = SIMHASH_MD5_BITS // SIMHASH_MD5_BANDS  # 15
SIMHASH_MD5_HAM_MAX = SIMHASH_MD5_BANDS - 1  # pigeonhole guarantee

# Signature in ONE fold over the shingle array, accumulator = the 60
# per-bit running sums (array_repeat init, zip_with per element, finish
# lambda packs sign bits into the LONG). The r11 self-review found the
# original form re-hashed every shingle PER BIT (md5 nested inside the
# per-bit lambda, 60x): Catalyst neither hoists loop-invariant
# expressions out of higher-order-function lambdas nor keeps a separate
# hs projection alive (project-collapse re-inlines it — measured only
# -17%). The element-major fold visits each shingle once, so the hash
# runs once per shingle: measured 2.65 s -> 0.49 s (5.4x) for the
# signature stage at sf0.1, bit-identical signatures (integer sums in
# the same element order, same >0 sign rule — the oracle's h-CTE +
# per-bit form needs no change).
_SIMHASH_MD5_HS = "transform(sh, g -> CAST(conv(substring(md5(g), 1, 15), 16, 10) AS LONG))"
_SIMHASH_MD5_SIG_FOLD = f"""
    aggregate(
      {_SIMHASH_MD5_HS},
      array_repeat(0L, {SIMHASH_MD5_BITS}),
      (acc, x) -> zip_with(acc, sequence(0, {SIMHASH_MD5_BITS - 1}),
                           (v, b) -> v + 2 * ((x >> b) & 1) - 1),
      acc -> aggregate(zip_with(acc, sequence(0, {SIMHASH_MD5_BITS - 1}),
                                (v, b) -> IF(v > 0, shiftleft(1L, b), 0L)),
                       0L, (a, y) -> a + y))
"""


def _banded_hamming_pairs(
    sig: DataFrame, n_bands: int, band_bits: int, ham_max: int
) -> DataFrame:
    """Banded blocking over a (doc_id, sig) signature table: a pair at
    hamming <= n_bands - 1 has all its differing bits in <= n_bands - 1
    bands, so AT LEAST one band matches exactly (pigeonhole) — banded
    recall is GUARANTEED at ham_max = n_bands - 1. Shared by the md5
    oracle twin and the xxhash64 production SimHash so their blocking
    cannot diverge (r11 self-review: the production variant used a single
    16-bit prefix with NO recall guarantee at hamming <= 3)."""
    band_mask = (1 << band_bits) - 1
    # n_bands is a small compile-time constant: unroll the band structs in
    # Python (shiftright's bit count must be a literal int, not a Column)
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("sig"), b * band_bits)
                .bitwiseAND(F.lit(band_mask))
                .alias("bkey"),
            )
            for b in range(n_bands)
        ]
    )
    buckets = sig.select("doc_id", F.explode(bands).alias("bb")).select(
        "doc_id", "bb.band", "bb.bkey"
    )
    cand = (
        buckets.groupBy("band", "bkey")
        .agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids") > 1)
        .select(F.explode(_pair_structs(F.col("ids"))).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    sa = sig.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(ham <= ham_max)
        .select("doc_a", "doc_b", ham.cast("long").alias("hamming"))
    )


def dedup_simhash_md5_pairs(s: DataFrame) -> DataFrame:
    """Banded SimHash near-dup pairs over the shingle table (doc_id, sh)."""
    sig = s.select("doc_id", F.expr(_SIMHASH_MD5_SIG_FOLD).alias("sig"))
    return _banded_hamming_pairs(
        sig, SIMHASH_MD5_BANDS, SIMHASH_MD5_BAND_BITS, SIMHASH_MD5_HAM_MAX
    )


@register(
    QUERIES,
    "dedup_simhash_md5",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
      FROM documents
    ), s AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(toks) - 1),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
      FROM t WHERE len(toks) >= 3
    ), h AS (
      SELECT doc_id,
             list_transform(sh, g -> ('0x' || substr(md5(g), 1, 15))::BIGINT) AS hs
      FROM s
    ), sig AS (
      SELECT doc_id,
             list_aggregate(list_transform(range(0, {SIMHASH_MD5_BITS}), b -> CASE
               WHEN list_aggregate(
                      list_transform(hs, x -> 2 * ((x >> b) & 1) - 1), 'sum') > 0
               THEN (1::BIGINT << b) ELSE 0 END), 'sum') AS sig
      FROM h
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sig, b.sig)) <= {SIMHASH_MD5_HAM_MAX}
    """,
    doc=f"SimHash near-dup pairs, fully oracle-checked: 60-bit md5 sign "
    f"signature (JVM expression, no UDF), {SIMHASH_MD5_BANDS} bands x "
    f"{SIMHASH_MD5_BAND_BITS} bits blocking, hamming <= "
    f"{SIMHASH_MD5_HAM_MAX}. Pigeonhole makes banded recall EXACT at this "
    "threshold, so the bucketed plan equals the brute-force oracle. "
    "dedup_simhash above is the xxhash64 production twin (faster hash, no "
    "SQL equivalent).",
)
def dedup_simhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare(spark)
    return dedup_simhash_md5_pairs(_shingles_for(spark, sf_dir))


@register(
    QUERIES,
    "dedup_graph_triangles",
    oracle="""
    WITH pairs AS (
    """
    + _CAPPED_PAIRS_SQL.format(thr=0.5, cap=DF_CAP)
    + """
    )
    SELECT e1.doc_a AS a, e1.doc_b AS b, e2.doc_b AS c
    FROM pairs e1
    JOIN pairs e2 ON e2.doc_a = e1.doc_b
    JOIN pairs e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b
    """,
    doc="Graph analytics over the near-dup pair graph: triangle enumeration "
    "via the ordered 3-way self-join (a<b<c, each edge stored once, so "
    "every triangle appears exactly once). Triangles measure cluster "
    "density — tight dup clusters are triangle-rich, chains are not. Two "
    "shuffle joins on doc ids; at scale the standard optimization is "
    "degree-ordered orientation, which the a<b ordering already provides.",
)
def dedup_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare(spark)
    pairs = _capped_pairs_for(spark, sf_dir, 0.5).select("doc_a", "doc_b")
    e1 = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    e2 = pairs.select(F.col("doc_a").alias("b"), F.col("doc_b").alias("c"))
    e3 = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("c"))
    return e1.join(e2, "b").join(e3, ["a", "c"]).select("a", "b", "c")


# PageRank over the near-dup graph: fixed iteration count, one constant for
# both engines (the oracle unrolls exactly this many CTE stages).
PAGERANK_ITERS = 5
PAGERANK_DAMP = 0.85


def _pagerank_oracle_sql() -> str:
    """Unrolled fixed-iteration PageRank as chained CTEs (DuckDB twin of the
    Spark loop below — same damping, same iteration count, same init)."""
    stages = [
        "r0 AS (SELECT u AS node, 1.0 AS pr FROM deg)",
    ]
    for i in range(1, PAGERANK_ITERS + 1):
        stages.append(
            f"r{i} AS (SELECT e.v AS node, "
            f"{1 - PAGERANK_DAMP} + {PAGERANK_DAMP} * sum(r{i-1}.pr / deg.d) AS pr "
            f"FROM edges e JOIN r{i-1} ON r{i-1}.node = e.u "
            f"JOIN deg ON deg.u = e.u GROUP BY e.v)"
        )
    return (
        "WITH pairs AS ("
        + _CAPPED_PAIRS_SQL.format(thr=0.5, cap=DF_CAP)
        + "), edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs "
        "UNION ALL SELECT doc_b, doc_a FROM pairs), "
        "deg AS (SELECT u, CAST(count(*) AS DOUBLE) AS d FROM edges GROUP BY u), "
        + ", ".join(stages)
        + f" SELECT node AS doc_id, round(pr, 6) AS pagerank FROM r{PAGERANK_ITERS}"
    )


@register(
    QUERIES,
    "dedup_graph_pagerank",
    oracle=_pagerank_oracle_sql(),
    doc="PageRank over the near-dup pair graph (5 fixed power iterations, "
    "d=0.85, symmetric edges): centrality inside dup clusters — the hub "
    "document of each near-dup family ranks highest, a principled pick for "
    "the canonical copy. The oracle unrolls the identical iterations as "
    "chained CTEs from the same constants, so the loop cannot drift. Each "
    "iteration is one shuffle join on node id + one groupBy; at 100 TB add "
    "localCheckpoint every few iterations (as dedup_clusters does) and "
    "partition edges by u so the join is co-located across iterations.",
)
def dedup_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare(spark)
    pairs = _capped_pairs_for(spark, sf_dir, 0.5).select("doc_a", "doc_b")
    edges = pairs.select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    ).unionAll(pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v")))
    deg = edges.groupBy("u").agg(F.count(F.lit(1)).cast("double").alias("d"))
    pr = deg.select(F.col("u").alias("node"), F.lit(1.0).alias("pr"))
    for _ in range(PAGERANK_ITERS):
        contrib = (
            edges.join(pr, pr.node == edges.u)
            .join(deg, "u")
            .select("v", (F.col("pr") / F.col("d")).alias("c"))
        )
        pr = contrib.groupBy("v").agg(
            (F.lit(1 - PAGERANK_DAMP) + F.lit(PAGERANK_DAMP) * F.sum("c")).alias("pr")
        ).select(F.col("v").alias("node"), "pr")
    return pr.select(
        F.col("node").alias("doc_id"), F.round("pr", 6).alias("pagerank")
    )


@register(
    QUERIES,
    "dedup_passage_shingles",
    oracle="""
    WITH d AS (
      SELECT doc_id, string_split_regex(lower(text), '\\s+') AS ts
      FROM documents
    ), dd AS (
      SELECT doc_id, ts FROM d WHERE len(ts) >= 8
    ), sh AS (
      SELECT doc_id, md5(array_to_string(ts[i:i+7], ' ')) AS h
      FROM dd, UNNEST(range(1, len(ts) - 6)) AS t(i)
    ), dups AS (
      SELECT h FROM sh GROUP BY h HAVING count(DISTINCT doc_id) >= 2
    )
    SELECT s.doc_id,
           CAST(count(*) AS BIGINT)                              AS n_shingles,
           CAST(count(d.h) AS BIGINT)                            AS n_dup
    FROM sh s LEFT JOIN dups d USING (h)
    GROUP BY s.doc_id
    """,
    doc="Passage-level exact-duplication stats — the ExactSubstr-dedup "
    "shape (Lee et al. 2021, 'Deduplicating Training Data Makes Language "
    "Models Better'): every 8-token shingle occurrence is marked "
    "duplicated iff its exact text occurs in >=2 DISTINCT docs, giving a "
    "per-doc duplicated-passage count to drive span removal. Fully "
    "JVM-side: tokens/shingles via split + transform/slice (codegen), "
    "shingles keyed by md5 so the shuffle carries a fixed-width key, "
    "cross-doc counts by partial-agg groupBy, and only the DUPLICATED "
    "shingle keys (a tiny fraction of the corpus at 100 TB) flow into the "
    "left join back onto occurrences. No doc-pair explosion anywhere: "
    "cost is O(total shingles), not O(candidate pairs); production swaps "
    "md5 for xxhash64 (same plan, cheaper hash).",
)
def dedup_passage_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare(spark)
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", F.split(F.lower("text"), r"\s+").alias("ts")
    ).filter(F.size("ts") >= 8)
    sh = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(ts) - 7),"
                " i -> md5(concat_ws(' ', slice(ts, i, 8))))"
            )
        ).alias("h"),
    )
    dups = (
        sh.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h", F.lit(1).alias("is_dup"))
    )
    return (
        sh.join(dups, "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("is_dup").alias("n_dup"),
        )
    )


@register(
    QUERIES,
    "dedup_passage_spans",
    oracle="""
    WITH d AS (
      SELECT doc_id, string_split_regex(lower(text), '\\s+') AS ts
      FROM documents
    ), dd AS (
      SELECT doc_id, ts FROM d WHERE len(ts) >= 8
    ), sh AS (
      SELECT doc_id, i AS pos, md5(array_to_string(ts[i:i+7], ' ')) AS h
      FROM dd, UNNEST(range(1, len(ts) - 6)) AS t(i)
    ), dups AS (
      SELECT h FROM sh GROUP BY h HAVING count(DISTINCT doc_id) >= 2
    ), dp AS (
      SELECT s.doc_id, s.pos FROM sh s JOIN dups USING (h)
    ), runs AS (
      SELECT doc_id, pos,
             pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
      FROM dp
    ), islands AS (
      SELECT doc_id, grp,
             CAST(count(*) AS BIGINT) AS span_len,
             CAST(min(pos) AS BIGINT) AS span_start
      FROM runs GROUP BY doc_id, grp
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT)  AS n_spans,
           max(span_len)             AS max_span_len,
           min(span_start)           AS first_span_pos
    FROM islands GROUP BY doc_id
    """,
    doc="The ExactSubstr REMOVAL decision: duplicated 8-token shingle "
    "positions (see dedup_passage_shingles) merged into maximal contiguous "
    "spans via gaps-and-islands (pos - row_number() per doc), emitting per-"
    "doc span count / longest span / first position — exactly what a span-"
    "cutting rewrite pass consumes. The island window partitions by doc_id "
    "(high cardinality — parallel), and only duplicated positions (a tiny "
    "fraction of the corpus) reach it.",
)
def dedup_passage_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare(spark)
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", F.split(F.lower("text"), r"\s+").alias("ts")
    ).filter(F.size("ts") >= 8)
    sh = d.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "transform(sequence(1, size(ts) - 7),"
                " i -> md5(concat_ws(' ', slice(ts, i, 8))))"
            )
        ).alias("pos0", "h"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "h")
    dups = (
        sh.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    dp = sh.join(dups, "h", "left_semi")
    w = Window.partitionBy("doc_id").orderBy("pos")
    runs = dp.withColumn("grp", F.col("pos") - F.row_number().over(w))
    islands = runs.groupBy("doc_id", "grp").agg(
        F.count(F.lit(1)).alias("span_len"),
        F.min("pos").alias("span_start"),
    )
    return islands.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.max("span_len").alias("max_span_len"),
        F.min("span_start").alias("first_span_pos"),
    )


# ---- IDF-weighted sparse cosine similarity join ----------------------------
TFIDF_TOP = 20


@register(
    QUERIES,
    "tfidf_shingle_cosine_pairs",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
      FROM documents
    ), s AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(toks) - 1),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
      FROM t WHERE len(toks) >= 3
    ), e AS (
      SELECT doc_id, unnest(sh) AS g FROM s
    ), nn AS (
      SELECT count(*) AS n FROM s
    ), w AS (
      SELECT g, ln(CAST(nn.n AS DOUBLE) / count(*)) AS idf
      FROM e CROSS JOIN nn GROUP BY g, nn.n HAVING count(*) <= {DF_CAP}
    ), ew AS (
      SELECT e.doc_id, e.g, w.idf FROM e JOIN w USING (g)
    ), nrm AS (
      SELECT doc_id, sum(idf * idf) AS n2 FROM ew GROUP BY doc_id
    ), dots AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, sum(a.idf * a.idf) AS dot
      FROM ew a JOIN ew b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(dot / sqrt(na.n2 * nb.n2), 6) AS cosine
    FROM dots
    JOIN nrm na ON na.doc_id = doc_a
    JOIN nrm nb ON nb.doc_id = doc_b
    ORDER BY round(dot / sqrt(na.n2 * nb.n2), 6) DESC, doc_a, doc_b
    LIMIT {TFIDF_TOP}
    """,
    doc=f"Sparse-vector similarity join: IDF-weighted set cosine over the "
    f"df-capped 3-gram shingle vocabulary (binary tf; shingles with "
    f"df > {DF_CAP} carry zero weight — the standard hot-term prune, which "
    "ALSO makes the posting-list pair expansion the complete nonzero-dot "
    "pair set, so no separate verify pass is needed). Weighting shared "
    "rare structure by rarity separates boilerplate-heavy near-dups from "
    "genuinely related docs in a way unweighted Jaccard can't. "
    f"Top-{TFIDF_TOP} pairs by 6-dp-rounded cosine with id tiebreaks; "
    "norms and dots are single groupBys over the weighted postings; at "
    "100 TB the per-shingle pair fanout is cap-bounded exactly like the "
    "Jaccard family.",
)
def tfidf_shingle_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare(spark)
    s = _shingles_for(spark, sf_dir)
    e = s.select("doc_id", F.explode("sh").alias("g"))
    n_docs = s.count()  # one scalar (memoized persisted table — cheap)
    w = (
        e.groupBy("g")
        .agg(F.count(F.lit(1)).alias("df"), F.collect_list("doc_id").alias("ids"))
        .filter(F.col("df") <= DF_CAP)
        .select(
            "g",
            "ids",
            F.log(F.lit(float(n_docs)) / F.col("df").cast("double")).alias("idf"),
        )
        # vocab-sized; consumed by BOTH the norm and the dot path. One-shot
        # query → localCheckpoint (reference-released), not a pinned persist
        .transform(cut())
    )
    ew = w.select("g", F.explode("ids").alias("doc_id"), "idf")
    nrm = ew.groupBy("doc_id").agg(F.sum(F.col("idf") * F.col("idf")).alias("n2"))
    # pairs from the posting list itself (in-array combination expansion —
    # same shape as _capped_shared_rare), each carrying the shingle's idf²
    pair_structs = _pair_structs(F.col("ids"))
    dots = (
        w.filter(F.size("ids") > 1)
        .select((F.col("idf") * F.col("idf")).alias("w2"), F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .agg(F.sum("w2").alias("dot"))
    )
    na = nrm.select(F.col("doc_id").alias("doc_a"), F.col("n2").alias("na2"))
    nb = nrm.select(F.col("doc_id").alias("doc_b"), F.col("n2").alias("nb2"))
    cos = F.round(
        F.col("dot") / F.sqrt(F.col("na2") * F.col("nb2")), 6
    ).alias("cosine")
    return (
        dots.join(F.broadcast(na), "doc_a")
        .join(F.broadcast(nb), "doc_b")
        .select("doc_a", "doc_b", cos)
        .orderBy(F.desc("cosine"), "doc_a", "doc_b")
        .limit(TFIDF_TOP)
    )


# ---- MinHash estimator calibration -----------------------------------------
MH_CAL_PERMS = 64


@register(
    QUERIES,
    "minhash_calibration_by_jaccard",
    oracle="""
    WITH pairs AS (
    """
    + _CAPPED_PAIRS_SQL.format(thr=0.5, cap=DF_CAP)
    + f"""
    ), ds AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(toks) - 1),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
      FROM (
        SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
        FROM documents
      ) WHERE len(toks) >= 3
    ), docs AS (
      SELECT doc_a AS doc_id FROM pairs UNION SELECT doc_b FROM pairs
    ), sl AS (
      SELECT ds.doc_id, unnest(ds.sh) AS g FROM ds JOIN docs USING (doc_id)
    ), perm AS (
      SELECT unnest(range(0, {MH_CAL_PERMS})) AS p
    ), m AS (
      SELECT doc_id, p, min(md5(g || ':' || CAST(p AS VARCHAR))) AS mh
      FROM sl CROSS JOIN perm GROUP BY 1, 2
    ), pm AS (
      SELECT pairs.doc_a, pairs.doc_b, pairs.jaccard,
             sum(CASE WHEN ma.mh = mb.mh THEN 1 ELSE 0 END) AS n_match
      FROM pairs
      JOIN m ma ON ma.doc_id = pairs.doc_a
      JOIN m mb ON mb.doc_id = pairs.doc_b AND mb.p = ma.p
      GROUP BY 1, 2, 3
    )
    SELECT CAST(floor(jaccard * 10) AS INT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(avg(n_match / {MH_CAL_PERMS}.0), 6) AS avg_est,
           round(avg(jaccard), 6) AS avg_exact,
           round(avg(abs(n_match / {MH_CAL_PERMS}.0 - jaccard)), 6)
             AS mean_abs_err
    FROM pm GROUP BY 1
    """,
    doc=f"Sketch-quality calibration: for every near-dup pair (capped index, "
    f"Jaccard >= 0.5), compare the {MH_CAL_PERMS}-perm MinHash ESTIMATE "
    "(fraction of matching signature slots) against the exact Jaccard, "
    "bucketed by exact-Jaccard decile — the eval that justifies replacing "
    "exact verification with signatures at scale (E[est] = J, sd = "
    f"sqrt(J(1-J)/{MH_CAL_PERMS}) ~ 0.05). Signatures here use the "
    "PORTABLE md5 slot-min form (min over md5(shingle:perm) strings) so "
    "DuckDB computes bit-identical slots — the production xxhash64+numpy "
    "signature (dedup_minhash_lsh) is the fast path, this is its "
    "cross-engine-checkable twin. Signatures are computed ONLY for docs "
    "appearing in candidate pairs (output-sized, not corpus-sized).",
)
def minhash_calibration_by_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare(spark)
    pairs = _capped_pairs_for(spark, sf_dir, 0.5)
    docs = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    s = _shingles_for(spark, sf_dir).join(docs, "doc_id")
    sl = s.select("doc_id", F.explode("sh").alias("g"))
    slots = sl.select(
        "doc_id",
        "g",
        F.explode(F.sequence(F.lit(0), F.lit(MH_CAL_PERMS - 1))).alias("p"),
    )
    m = slots.groupBy("doc_id", "p").agg(
        F.min(F.md5(F.concat_ws(":", "g", "p"))).alias("mh")
    )
    ma = m.select(F.col("doc_id").alias("doc_a"), "p", F.col("mh").alias("mha"))
    mb = m.select(F.col("doc_id").alias("doc_b"), "p", F.col("mh").alias("mhb"))
    pm = (
        pairs.join(ma, "doc_a")
        .join(mb, ["doc_b", "p"])
        .groupBy("doc_a", "doc_b", "jaccard")
        .agg(
            F.sum(F.when(F.col("mha") == F.col("mhb"), 1).otherwise(0)).alias(
                "n_match"
            )
        )
    )
    est = F.col("n_match") / float(MH_CAL_PERMS)
    return pm.groupBy(
        F.floor(F.col("jaccard") * 10).cast("int").alias("bucket")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.round(F.avg(est), 6).alias("avg_est"),
        F.round(F.avg("jaccard"), 6).alias("avg_exact"),
        F.round(F.avg(F.abs(est - F.col("jaccard"))), 6).alias("mean_abs_err"),
    )
