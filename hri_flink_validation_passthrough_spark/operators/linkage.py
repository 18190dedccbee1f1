"""Record-linkage / set-similarity operators (north-star surface).

Three classic *exact* similarity-join techniques that scale where brute force
cannot — each is the textbook way to avoid an O(n²) comparison at 100 TB
while still returning the exact answer (unlike MinHash/SimHash, which are
probabilistic and live in ``operators/dedup.py``):

- ``set_similarity_prefix_join`` — AllPairs/PPJoin-style **prefix filtering**
  (Bayardo et al. WWW'07; Vernica et al. SIGMOD'10 for the MapReduce/Spark
  shape): order every set by ascending global token frequency and index only
  each set's first ``|s| - ceil(tau*|s|) + 1`` tokens; any pair with Jaccard
  >= tau MUST collide on a prefix token, so the candidate join touches rare
  tokens only. Exact-verify survivors with a JVM ``array_intersect``.
- ``fuzzy_part_match_blocked`` — **q-gram count filtering** for edit
  distance (Gravano et al. VLDB'01): strings with ed <= k share at least
  ``max(|a|,|b|) - 1 - q*k`` positional-free q-grams (each edit disturbs at
  most q grams), so a bigram inverted index + count threshold yields a
  complete candidate set, verified with exact ``levenshtein``. Runs on the
  *distinct-name dictionary* (dedup-before-join — the first move of any real
  entity-resolution pipeline).
- ``decontam_bloom_prefilter`` — **distributed Bloom filter** build
  (aggregate bit_or over hash positions) broadcast as a literal bitmap and
  probed map-side in whole-stage codegen, with an exact-confirm semi-join
  after the prefilter so false positives never reach the output. The shape
  of "scrub a 100 TB corpus against a small reference set" where shipping
  the reference set itself to every task would already fit, but a bitmap is
  ~50x smaller and the probe is branch-free integer math.

Reference parity note: the reference engine (Alvearie
hri-flink-validation-passthrough, a ~154-LoC shell — PassthroughStreamingJob.java:1,
PassthroughValidator.java:1) has no analytics surface; these are SURVEY.md §2
north-star extensions for the LLM-training-data pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans import QuerySpec, register
from ..session import load_table, prepare
from .corpus import _SQL_SHINGLES_5, EVAL_MOD, EVAL_REM
from .dedup import _JACCARD_ORACLE, _shingles_for
from ..materialize import cut

QUERIES: dict[str, QuerySpec] = {}

PREFIX_TAU = 0.7  # Jaccard threshold for the prefix-filter join

FUZZY_Q = 2  # q-gram width for the edit-distance count filter
FUZZY_K = 2  # maximum edit distance
# The count bound needs max(len) - 1 - q*k > 0; names shorter than this are
# out of the query's declared scope (driver data minimum is 7). For a corpus
# with shorter keys the complete fallback is a <=k-deletion-neighborhood
# block over the (tiny) short-name dictionary slice.
FUZZY_MIN_LEN = FUZZY_Q * FUZZY_K + FUZZY_Q  # = 6

BLOOM_BITS = 1 << 16  # m: 65536 bits = 1024 longs = 8 KiB broadcast
BLOOM_WORDS = BLOOM_BITS // 64
BLOOM_K = 5  # hash functions


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    prepare(spark)
    return load_table(spark, sf_dir, name)


@register(
    QUERIES,
    "set_similarity_prefix_join",
    oracle=_JACCARD_ORACLE.format(thr=PREFIX_TAU),
    doc="Exact Jaccard>=0.7 self-join via AllPairs prefix filtering: shingle "
    "sets ordered by ascending global document frequency, only the first "
    "|s|-ceil(tau*|s|)+1 shingles indexed, candidates must share a prefix "
    "shingle and pass the tau*|a|<=|b|<=|a|/tau length filter, then exact "
    "array_intersect verification. Same brute-force oracle as "
    "dedup_ngram_jaccard — a third independent exact path (inverted-index, "
    "LSH, prefix-filter) over the same semantics. At 100 TB the index holds "
    "only rare-token postings, so the candidate join never sees a hot key.",
)
def set_similarity_prefix_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare(spark)
    s = _shingles_for(spark, sf_dir)  # doc_id, sh (distinct 3-gram shingles)

    # (doc_id, set size, token) — size carried through the explode so no
    # per-doc side table needs joining (or broadcasting) later.
    e = s.select(
        "doc_id", F.size("sh").alias("n"), F.explode("sh").alias("g")
    )
    # Global document frequency per shingle: the canonical token order.
    # Rarest-first ordering is what makes prefixes selective — the hot
    # (boilerplate) shingles land at the END of every set and are never
    # indexed. Ties broken by the shingle string → total order, identical
    # on both sides of the self-join.
    df_tok = e.groupBy("g").agg(F.count(F.lit(1)).alias("tok_df"))
    ranked = e.join(df_tok, "g").withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy("tok_df", "g")
        ),
    )
    # Binary 0.7 < 7/10 exactly, so ceil(tau*n) never overshoots an integer
    # boundary — the prefix is never too short (pruning stays lossless).
    # Persisted (session-memoized): BOTH sides of the candidate self-join
    # read this table, and Catalyst does not reuse the exchange across the
    # aliased subtrees — without the persist the df-count + rank pipeline
    # runs twice (measured ~2x the query's cost at sf0.1).
    from .dedup import _MEMO, _memo_key

    key = _memo_key(spark, sf_dir, f"prefix_{PREFIX_TAU}")
    if key not in _MEMO:
        _MEMO[key] = ranked.filter(
            F.col("rn") <= F.col("n") - F.ceil(F.lit(PREFIX_TAU) * F.col("n")) + 1
        ).select("doc_id", "n", "g").persist()
    prefix = _MEMO[key]

    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(b, "g")
        .filter(
            (F.col("a.doc_id") < F.col("b.doc_id"))
            # length filter: |b| must fit [tau*|a|, |a|/tau]
            & (F.col("b.n") >= F.lit(PREFIX_TAU) * F.col("a.n"))
            & (F.col("b.n") <= F.col("a.n") / F.lit(PREFIX_TAU))
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )

    # Exact verification: join the full (distinct) shingle arrays back and
    # intersect JVM-side. Integer intersection/union sizes divide to the
    # same double in both engines, so the >= tau decision is bit-identical
    # to the oracle's.
    sa = s.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = s.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    ver = cand.join(sa, "doc_a").join(sb, "doc_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = inter.cast("double") / (
        F.size("sh_a") + F.size("sh_b") - inter
    )
    return ver.filter(jac >= PREFIX_TAU).select(
        "doc_a", "doc_b", F.round(jac, 6).alias("jaccard")
    )


@register(
    QUERIES,
    "fuzzy_part_match_blocked",
    oracle=f"""
    WITH nm AS (
      SELECT p_name AS name, count(*) AS cnt
      FROM part WHERE length(p_name) >= {FUZZY_MIN_LEN}
      GROUP BY 1
    )
    SELECT a.name AS name_a, b.name AS name_b,
           CAST(levenshtein(a.name, b.name) AS BIGINT) AS edit_distance,
           CAST(a.cnt * b.cnt AS BIGINT) AS n_part_pairs
    FROM nm a JOIN nm b
      ON a.name < b.name
     AND abs(length(a.name) - length(b.name)) <= {FUZZY_K}
    WHERE levenshtein(a.name, b.name) <= {FUZZY_K}
    UNION ALL
    SELECT name, name, CAST(0 AS BIGINT), CAST((cnt * (cnt - 1)) // 2 AS BIGINT)
    FROM nm WHERE cnt >= 2
    """,
    doc="Entity-resolution fuzzy join: part-name pairs within edit distance "
    "2, blocked by q-gram count filtering (ed<=k pairs share >= "
    "max(L)-1-q*k multiset bigrams — complete, no false negatives), "
    "verified by exact levenshtein. Runs over the distinct-name dictionary "
    "with pair multiplicities restored from counts: dedup-before-join "
    "turns an O(parts²) problem into O(names²)-bounded candidates, and "
    "names are a bounded vocabulary at any corpus size.",
)
def fuzzy_part_match_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    nm = (
        p.filter(F.length("p_name") >= FUZZY_MIN_LEN)
        .groupBy(F.col("p_name").alias("name"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )

    # Multiset bigram inverted index over the name dictionary: one row per
    # (name, gram, occurrence#). Joining on (gram, occ) computes
    # sum_g min(cnt_a(g), cnt_b(g)) — the MULTISET intersection the count
    # bound is stated for (a set join would undercount repeats and could
    # drop true pairs).
    grams = nm.select(
        "name",
        F.length("name").alias("len"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.length("name") - (FUZZY_Q - 1)),
                lambda i: F.substring(F.col("name"), i, FUZZY_Q),
            )
        ).alias("pos", "gram"),
    ).withColumn(
        "occ",
        F.row_number().over(
            Window.partitionBy("name", "gram").orderBy("pos")
        ),
    # dictionary-sized index; the self-join consumes it twice —
    # localCheckpoint (reference-released), never a per-call persist
    ).transform(cut())

    a, b = grams.alias("a"), grams.alias("b")
    cand = (
        a.join(b, ["gram", "occ"])
        .filter(
            (F.col("a.name") < F.col("b.name"))
            & (
                F.abs(F.col("a.len") - F.col("b.len")) <= FUZZY_K
            )
        )
        .groupBy(
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
            F.col("a.len").alias("len_a"),
            F.col("b.len").alias("len_b"),
        )
        .agg(F.count(F.lit(1)).alias("common"))
        # count filter: ed<=k requires common >= max(L)-1-q*k
        .filter(
            F.col("common")
            >= F.greatest("len_a", "len_b") - 1 - FUZZY_Q * FUZZY_K
        )
    )

    ed = F.levenshtein("name_a", "name_b")
    # Name dictionary is a bounded vocabulary → broadcast the counts back.
    nm_a = nm.select(F.col("name").alias("name_a"), F.col("cnt").alias("cnt_a"))
    nm_b = nm.select(F.col("name").alias("name_b"), F.col("cnt").alias("cnt_b"))
    cross = (
        cand.filter(ed <= FUZZY_K)
        .join(F.broadcast(nm_a), "name_a")
        .join(F.broadcast(nm_b), "name_b")
        .select(
            "name_a",
            "name_b",
            ed.cast("long").alias("edit_distance"),
            (F.col("cnt_a") * F.col("cnt_b")).cast("long").alias("n_part_pairs"),
        )
    )
    # Same-name pairs (edit distance 0) come straight off the dictionary.
    same = nm.filter(F.col("cnt") >= 2).select(
        F.col("name").alias("name_a"),
        F.col("name").alias("name_b"),
        F.lit(0).cast("long").alias("edit_distance"),
        ((F.col("cnt") * (F.col("cnt") - 1)) / 2)
        .cast("long")
        .alias("n_part_pairs"),
    )
    return cross.unionByName(same)


@register(
    QUERIES,
    "decontam_bloom_prefilter",
    oracle=f"""
    {_SQL_SHINGLES_5},
    ev AS (
      SELECT DISTINCT unnest(sh) AS g FROM s
      WHERE doc_id % {EVAL_MOD} = {EVAL_REM}
    ), tr AS (
      SELECT doc_id, unnest(sh) AS g FROM s
      WHERE doc_id % {EVAL_MOD} <> {EVAL_REM}
    )
    SELECT tr.doc_id, CAST(count(DISTINCT tr.g) AS BIGINT) AS n_eval_grams
    FROM tr JOIN ev USING (g)
    GROUP BY tr.doc_id
    """,
    doc="Eval-set removal list via a distributed Bloom filter: eval 5-gram "
    "bit positions aggregated with bit_or into a 64-Kibit bitmap (1024 "
    "longs), broadcast as a literal array and probed in whole-stage codegen "
    "(5x xxhash64 + shift/mask per gram — no join, no Python). Grams "
    "passing the bloom go through an exact-confirm semi-join, so the "
    "output is exactly the docs sharing >=1 eval 5-gram (false positives "
    "cost only a recheck, never a wrong row). At 100 TB the probe scans "
    "map-side; only the ~0.01% bloom-positive grams reach the shuffle.",
)
def decontam_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare(spark)
    # Persisted+repartitioned 5-gram stage (shared with corpus decontam):
    # also a plan barrier — see _shingles_for's docstring for the
    # filter-pushdown pathology a bare projection hits here.
    sh5 = _shingles_for(spark, sf_dir, 5)  # doc_id, distinct 5-gram shingles
    is_eval = F.col("doc_id") % EVAL_MOD == EVAL_REM
    tr = sh5.filter(~is_eval).select("doc_id", F.explode("sh").alias("g"))

    # The bitmap is a tiny fixed-size MODEL artifact (8 KiB regardless of
    # eval-set size), like the IVF centroids / PQ codebook elsewhere:
    # collect-then-broadcast-as-literal is the intended pattern, and like
    # those artifacts it is session-memoized (r7) — in production the
    # decontam bloom is built once when the eval set is frozen and reused
    # by every corpus query, not rebuilt per scan. The distributed part —
    # hashing and OR-ing eval grams — happens executor-side; only
    # BLOOM_WORDS pre-reduced rows cross to the driver.
    from .dedup import _MEMO, _memo_key

    # ev is consumed by the bitmap build (memo-miss only) AND by the
    # exact-confirm semi-join below on every run — keep it unconditional
    ev = sh5.filter(is_eval).select(F.explode("sh").alias("g")).distinct()
    memo_key = _memo_key(spark, sf_dir, "decontam_bloom_bitmap")
    bitmap = _MEMO.get(memo_key)
    if bitmap is None:
        # build: position = pmod(xxhash64(i, g), m), OR'd into 64-bit words
        pos = ev.select(
            F.explode(
                F.array(
                    *[
                        F.pmod(
                            F.xxhash64(F.lit(i), F.col("g")),
                            F.lit(BLOOM_BITS),
                        )
                        for i in range(BLOOM_K)
                    ]
                )
            ).alias("p")
        )
        words = (
            pos.select(
                F.expr("cast(p div 64 as int)").alias("w"),
                F.expr(
                    "shiftleft(cast(1 as bigint), cast(p % 64 as int))"
                ).alias("m"),
            )
            .groupBy("w")
            .agg(F.expr("bit_or(m)").alias("mask"))
            .collect()
        )
        bitmap = [0] * BLOOM_WORDS
        for r in words:
            bitmap[r["w"]] = r["mask"]
        _MEMO[memo_key] = bitmap
    # The bitmap rides as a BROADCAST 1-row DataFrame, not a literal array
    # in the expression tree: 1024 long literals are a per-call planning
    # tax (~0.55 s here — interleaved A/B in BASELINE.md r9, the same
    # pathology as the trained-index probes / PQ codebook). The explicit
    # array<bigint> schema matters: a sparse bitmap could otherwise infer
    # array<int> and lose bits >= 32 in the shiftright probe.
    bm_df = spark.createDataFrame(
        [([int(x) for x in bitmap],)], "_bm array<bigint>"
    )
    probe = tr.crossJoin(F.broadcast(bm_df))
    for i in range(BLOOM_K):
        probe = probe.withColumn(
            f"_h{i}",
            F.pmod(F.xxhash64(F.lit(i), F.col("g")), F.lit(BLOOM_BITS)),
        )
    all_bits_set = " AND ".join(
        f"(shiftright(element_at(_bm, cast(_h{i} div 64 as int) + 1),"
        f" cast(_h{i} % 64 as int)) & 1) = 1"
        for i in range(BLOOM_K)
    )
    hit = probe.filter(F.expr(all_bits_set)).select("doc_id", "g")

    # exact confirm: semi-join the bloom-positive grams against the real
    # eval gram set — removes any false positive.
    confirmed = hit.join(ev, "g", "left_semi")
    return confirmed.groupBy("doc_id").agg(
        F.count_distinct("g").alias("n_eval_grams")
    )
