"""Behavioral tests for the LLM-pipeline operators beyond the oracle gate."""

from __future__ import annotations

import os

import pytest

from tests.conftest import SF_ORACLE

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


def test_multimodal_real_decoder_rejects_unknown_formats(spark):
    """decode_real handles PNG/JPEG/WAV headers; anything else must raise
    loudly (no silent fake-decode fallback)."""
    blobs = spark.createDataFrame([(1, b"xx")], "doc_id long, content binary")
    with pytest.raises(Exception) as ei:
        extract_features(blobs, decoder=decode_real).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def _make_jpeg(width, height, precision=8, channels=3):
    import struct

    soi = b"\xff\xd8"
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    # a comment segment decode_real must skip over before reaching SOF0
    com = b"\xff\xfe" + struct.pack(">H", 2 + 5) + b"hello"
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 8 + 3 * channels)
        + struct.pack(">BHHB", precision, height, width, channels)
        + b"\x11\x00" * channels
    )
    return soi + app0 + com + sof0


def _make_wav(channels=2, sample_rate=44_100, bits=16, n_frames=1000):
    import struct

    block_align = channels * bits // 8
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, channels, sample_rate,
        sample_rate * block_align, block_align, bits,
    )
    data = b"data" + struct.pack("<I", n_frames * block_align)
    body = b"WAVE" + fmt + data + b"\x00" * (n_frames * block_align)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_multimodal_real_codec_seam_with_jpeg_parser(spark):
    """JPEG SOF0 dimensions through decode_real inside mapInPandas — the
    same proven-seam pattern as the PNG test, now in the product module."""
    blobs = spark.createDataFrame(
        [
            (1, _make_jpeg(1920, 1080)),
            (2, _make_jpeg(8, 8, precision=12, channels=1)),
        ],
        "doc_id long, content binary",
    )
    out = {
        r.doc_id: r.asDict()
        for r in extract_features(blobs, decoder=decode_real).collect()
    }
    assert out[1]["checksum"] == 1920 * 1080 and out[1]["first_byte"] == 8
    assert out[2]["checksum"] == 64 and out[2]["first_byte"] == 12
    assert out[1]["n_frames"] == 1


def test_multimodal_real_codec_seam_with_gif_and_bmp_parsers(spark):
    """r12 verdict stretch: further codecs through the SAME extension
    point (decode_real → probe_media_header) with zero changes to the
    Spark-side plumbing — the seam is an API, not a per-codec special
    case. GIF: little-endian logical-screen dims + palette-depth bits;
    BMP: BITMAPINFOHEADER dims (signed height reported positive) + bit
    count."""

    def make_gif(w, h, gct_bits=8):
        packed = 0x80 | (gct_bits - 1)  # GCT present, size = 2^gct_bits
        return (
            b"GIF89a"
            + w.to_bytes(2, "little")
            + h.to_bytes(2, "little")
            + bytes([packed, 0, 0])
        )

    def make_bmp(w, h, bitcount=24):
        return (
            b"BM"
            + (54).to_bytes(4, "little")  # file size (unused by the parser)
            + b"\x00\x00\x00\x00"
            + (54).to_bytes(4, "little")  # pixel-array offset
            + (40).to_bytes(4, "little")  # BITMAPINFOHEADER
            + w.to_bytes(4, "little", signed=True)
            + h.to_bytes(4, "little", signed=True)
            + (1).to_bytes(2, "little")
            + bitcount.to_bytes(2, "little")
            + b"\x00" * 24
        )

    blobs = spark.createDataFrame(
        [
            (1, make_gif(320, 200, gct_bits=8)),
            (2, make_bmp(640, 480, bitcount=24)),
            (3, make_bmp(16, -16, bitcount=8)),  # top-down BMP
        ],
        "doc_id long, content binary",
    )
    out = {
        r.doc_id: r.asDict()
        for r in extract_features(blobs, decoder=decode_real).collect()
    }
    assert out[1]["checksum"] == 320 * 200 and out[1]["first_byte"] == 8
    assert out[2]["checksum"] == 640 * 480 and out[2]["first_byte"] == 24
    assert out[3]["checksum"] == 256 and out[3]["first_byte"] == 8
    assert all(out[i]["n_frames"] == 1 for i in (1, 2, 3))


def test_multimodal_real_codec_seam_with_wav_parser(spark):
    """WAV fmt/data chunks through decode_real inside mapInPandas: frame
    count from data size / block align, total samples in checksum."""
    blobs = spark.createDataFrame(
        [
            (1, _make_wav(channels=2, sample_rate=44_100, bits=16, n_frames=500)),
            (2, _make_wav(channels=1, sample_rate=8_000, bits=8, n_frames=80)),
        ],
        "doc_id long, content binary",
    )
    out = {
        r.doc_id: r.asDict()
        for r in extract_features(blobs, decoder=decode_real).collect()
    }
    assert out[1]["n_frames"] == 500 and out[1]["checksum"] == 1000
    assert out[1]["first_byte"] == 16
    assert out[2]["n_frames"] == 80 and out[2]["checksum"] == 80
    assert out[2]["first_byte"] == 8


def test_multimodal_empty_blob(spark):
    blobs = spark.createDataFrame(
        [(1, b""), (2, None), (3, b"abc")], "doc_id long, content binary"
    )
    rows = {r.doc_id: r for r in extract_features(blobs).collect()}
    assert rows[1].byte_len == 0 and rows[1].first_byte == -1
    assert rows[2].byte_len == 0
    assert rows[3].byte_len == 3 and rows[3].first_byte == ord("a")


def test_srp_lsh_equals_brute_force_on_synthetic_near_dups(spark):
    """The SF data has no pairs at cosine ≥ 0.95, so the oracle check of
    dedup_embedding_srp_lsh is vacuous there. This drives the SRP plan with a
    corpus that DOES contain near-dups (base vectors + small perturbations)
    and pins it to the exact all-pairs answer."""
    import numpy as np

    from hri_flink_validation_passthrough_spark.functions import cosine_similarity
    from hri_flink_validation_passthrough_spark.operators.dedup import srp_lsh_pairs

    rng = np.random.RandomState(7)
    rows = []
    vid = 0
    for _ in range(20):  # 20 groups of near-dups
        base = rng.standard_normal(64)
        for _ in range(3):  # base + 2 noisy copies → 3 pairs per group
            noisy = base + 0.05 * rng.standard_normal(64)
            rows.append((vid, [float(x) for x in noisy]))
            vid += 1
    for _ in range(40):  # unrelated background vectors
        rows.append((vid, [float(x) for x in rng.standard_normal(64)]))
        vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, e array<double>")

    got = {
        (r.vec_a, r.vec_b, r.cos_sim)
        for r in srp_lsh_pairs(emb, threshold=0.95).collect()
    }
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("e").alias("ea"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("e").alias("eb"))
    cos = cosine_similarity(F.col("ea"), F.col("eb"))
    brute = {
        (r.vec_a, r.vec_b, r.cos_sim)
        for r in a.join(b, F.col("vec_a") < F.col("vec_b"))
        .filter(cos >= 0.95)
        .select("vec_a", "vec_b", F.round(cos, 6).alias("cos_sim"))
        .collect()
    }
    assert len(brute) >= 20  # the synthetic corpus really has near-dups
    assert got == brute


def test_srp_band_shape_recall_floor(spark):
    """r12 verdict ask #4: the production band-shape lever — re-splitting
    the SAME 256-bit budget into fewer, longer bands (16×16, measured 4.5×
    faster at sf1 in tools/ab_srp_params.py) — is now an API parameter.
    Pin its recall floor on a synthetic near-dup corpus so the knob is
    tested, not just documented: every reported pair must be a true pair
    (the exact-cosine verify stage guarantees zero false positives at ANY
    band shape), and recall over the true pair set must hold the
    theory-backed floor (per-pair miss ≈ (1−0.92^16)^16 ≈ 0.7% at cosine
    0.97; the seeded corpus makes the outcome deterministic)."""
    import numpy as np

    from hri_flink_validation_passthrough_spark.functions import cosine_similarity
    from hri_flink_validation_passthrough_spark.operators.dedup import srp_lsh_pairs

    rng = np.random.RandomState(13)
    rows = []
    vid = 0
    for _ in range(25):  # 25 groups of near-dups, 3 pairs each
        base = rng.standard_normal(64)
        for _ in range(3):
            noisy = base + 0.05 * rng.standard_normal(64)
            rows.append((vid, [float(x) for x in noisy]))
            vid += 1
    for _ in range(50):
        rows.append((vid, [float(x) for x in rng.standard_normal(64)]))
        vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, e array<double>")

    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("e").alias("ea"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("e").alias("eb"))
    cos = cosine_similarity(F.col("ea"), F.col("eb"))
    truth = {
        (r.vec_a, r.vec_b)
        for r in a.join(b, F.col("vec_a") < F.col("vec_b"))
        .filter(cos >= 0.95)
        .select("vec_a", "vec_b")
        .collect()
    }
    assert len(truth) >= 25

    alt = {
        (r.vec_a, r.vec_b)
        for r in srp_lsh_pairs(
            emb, threshold=0.95, bands=16, rows_per_band=16
        ).collect()
    }
    assert alt <= truth  # exact verify stage: no false positives, any shape
    recall = len(alt) / len(truth)
    assert recall >= 0.95, f"16x16 recall {recall:.3f} below pinned floor"

    # the shipped default (32×8) stays exact on the same corpus
    shipped = {
        (r.vec_a, r.vec_b)
        for r in srp_lsh_pairs(emb, threshold=0.95).collect()
    }
    assert shipped == truth


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


def test_frame_sampler_handles_non_ascii_and_empty_blobs(spark):
    """The oracle-checked query filters to ASCII blobs (DuckDB can't md5
    bytes); the operator itself must handle arbitrary/empty/null bytes."""
    import hashlib

    from hri_flink_validation_passthrough_spark.operators.multimodal import (
        FRAME_SIZE,
        FRAME_STRIDE,
        sample_frames,
    )

    payload = "héllo ✓ ".encode("utf-8") * 40  # 400 bytes, non-ASCII
    df = spark.createDataFrame(
        [(1, payload), (2, b""), (3, None), (4, b"x" * (FRAME_SIZE * 3))],
        "doc_id long, content binary",
    )
    got = {
        (r["doc_id"], r["frame_idx"]): r["frame_md5"]
        for r in sample_frames(df).collect()
    }
    # doc 1: 400 bytes -> 4 frames -> sampled frames 0 and 2
    n_frames = (len(payload) + FRAME_SIZE - 1) // FRAME_SIZE
    expect_idx = set(range(0, n_frames, FRAME_STRIDE))
    assert {i for (d, i) in got if d == 1} == expect_idx
    assert got[(1, 0)] == hashlib.md5(payload[:FRAME_SIZE]).hexdigest()
    # empty and null blobs emit nothing
    assert not [k for k in got if k[0] in (2, 3)]
    # doc 4: exactly 3 frames -> frames 0, 2
    assert {i for (d, i) in got if d == 4} == {0, 2}


def test_hash_sampling_invariant_under_partitioning(spark):
    """The whole point of hash-based sampling: the same doc lands in the
    same sample/split/stratum rank no matter how the input is partitioned
    (rand()-based sampling fails exactly this)."""
    from hri_flink_validation_passthrough_spark.operators.sampling import (
        sample_hash_10pct,
        stratified_sample_by_source,
        train_val_test_split,
    )

    sf = SF_ORACLE

    def fingerprint(df):
        return sorted(tuple(r) for r in df.collect())

    base = [
        fingerprint(sample_hash_10pct(spark, sf)),
        fingerprint(train_val_test_split(spark, sf)),
        fingerprint(stratified_sample_by_source(spark, sf)),
    ]
    # perturb the session's default parallelism context: recompute under a
    # different shuffle-partition setting (affects physical partitioning of
    # every stage) and require bit-identical outputs
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        again = [
            fingerprint(sample_hash_10pct(spark, sf)),
            fingerprint(train_val_test_split(spark, sf)),
            fingerprint(stratified_sample_by_source(spark, sf)),
        ]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert base == again


def test_min_label_components_chain_converges_in_log_rounds(spark):
    """A 64-node path graph needs ~63 neighbor-only rounds; pointer jumping
    must collapse it within the 14-round budget (≈2·log2(64)+slack)."""
    from hri_flink_validation_passthrough_spark.operators.dedup import (
        min_label_components,
    )

    n = 64
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    labels = min_label_components(pairs, "doc_a", "doc_b", max_rounds=14)
    rows = {r.v: r.lbl for r in labels.collect()}
    assert rows == {i: 0 for i in range(n)}


def test_min_label_components_two_components_and_bound_raises(spark):
    from hri_flink_validation_passthrough_spark.operators.dedup import (
        min_label_components,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    labels = min_label_components(pairs, "doc_a", "doc_b")
    rows = {r.v: r.lbl for r in labels.collect()}
    assert rows == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}

    # an unconvergeable budget must raise, not return a partial clustering
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(200)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        min_label_components(chain, "doc_a", "doc_b", max_rounds=2)


def test_multimodal_real_codec_seam_with_png_parser(spark):
    """Prove decode_real's seam takes a REAL codec end-to-end: a ~20-line
    pure-Python PNG header parser plugged into extract_features runs inside
    mapInPandas over binary columns and emits parsed dimensions. decode_fake
    stays the oracle path; this pins the plumbing contract for real codecs."""
    import struct

    from hri_flink_validation_passthrough_spark.operators.multimodal import (
        extract_features,
    )

    PNG_SIG = b"\x89PNG\r\n\x1a\n"

    def make_png(width, height, bit_depth=8):
        ihdr_data = struct.pack(">IIBBBBB", width, height, bit_depth, 2, 0, 0, 0)
        ihdr = struct.pack(">I", 13) + b"IHDR" + ihdr_data + b"\x00\x00\x00\x00"
        return PNG_SIG + ihdr

    def decode_png_header(blob):
        """Minimal real decoder: PNG signature + IHDR width/height/depth."""
        if not blob or not bytes(blob).startswith(PNG_SIG):
            return {"byte_len": len(blob or b""), "first_byte": -1,
                    "checksum": 0, "n_frames": 0}
        b = bytes(blob)
        assert b[12:16] == b"IHDR"
        width, height = struct.unpack(">II", b[16:24])
        bit_depth = b[24]
        return {
            "byte_len": len(b),
            "first_byte": bit_depth,       # schema reuse: depth in first_byte
            "checksum": width * height,    # schema reuse: pixel count
            "n_frames": 1,
        }

    blobs = spark.createDataFrame(
        [
            (1, make_png(640, 480)),
            (2, make_png(16, 16, bit_depth=16)),
            (3, b"not a png"),
            (4, b""),
        ],
        "doc_id long, content binary",
    )
    out = {
        r.doc_id: r.asDict()
        for r in extract_features(blobs, decoder=decode_png_header).collect()
    }
    assert out[1]["checksum"] == 640 * 480 and out[1]["first_byte"] == 8
    assert out[2]["checksum"] == 256 and out[2]["first_byte"] == 16
    assert out[3]["first_byte"] == -1 and out[3]["n_frames"] == 0
    assert out[4]["byte_len"] == 0 and out[4]["n_frames"] == 0


def test_min_label_components_matches_union_find_on_random_graphs(spark):
    """Property: on random graphs, the distributed component labels equal a
    pure-Python union-find ground truth (min vertex id per component)."""
    import random

    from hri_flink_validation_passthrough_spark.operators.dedup import (
        min_label_components,
    )

    rng = random.Random(7)
    for trial in range(4):
        n = rng.randint(5, 60)
        m = rng.randint(1, n * 2)
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ]
        # union-find ground truth
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        touched = sorted({v for e in edges for v in e})
        expected = {}
        comp_min = {}
        for v in touched:
            r = find(v)
            comp_min.setdefault(r, v)  # touched is sorted → first is min
        for v in touched:
            expected[v] = comp_min[find(v)]

        pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
        got = {
            r.v: r.lbl
            for r in min_label_components(pairs, "doc_a", "doc_b").collect()
        }
        assert got == expected, f"trial {trial}: n={n} m={m}"


def test_dedup_simhash_properties(spark, tmp_path):
    """Pin for the RETIRED-from-registry xxhash64 SimHash variant (r10
    capacity policy, COVERAGE.md): the code stays the production path;
    its exact twin dedup_simhash_md5 carries the oracle receipt. Checks:
    deterministic across runs, structural invariants (doc_a < doc_b,
    hamming <= 3), and the sketch property — identical texts collide at
    hamming 0."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hri_flink_validation_passthrough_spark.operators.dedup import (
        dedup_simhash,
    )
    from tests.conftest import SF_ORACLE

    rows = dedup_simhash(spark, SF_ORACLE).collect()
    assert all(r["doc_a"] < r["doc_b"] and r["hamming"] <= 3 for r in rows)
    again = dedup_simhash(spark, SF_ORACLE).collect()
    assert {tuple(r) for r in rows} == {tuple(r) for r in again}

    # identical docs must collide at hamming 0
    d = tmp_path / "corpus"
    os.makedirs(d)
    text = "the quick brown fox jumps over the lazy dog again and again"
    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], type=pa.int64()),
            "text": pa.array(
                [text, text, "completely unrelated words about spark plans"]
            ),
            "source": pa.array(["a", "a", "a"]),
            "lang": pa.array(["en", "en", "en"]),
        }
    )
    pq.write_table(tbl, str(d / "documents.parquet"))
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in dedup_simhash(spark, str(d)).collect()
    }
    assert (0, 1, 0) in got


def test_banded_hamming_pairs_pigeonhole_recall(spark):
    """r11 self-review fix: SimHash blocking must catch EVERY pair at
    hamming <= n_bands-1 regardless of WHICH bits differ (the old single
    16-bit-prefix blocking missed pairs whose differing bits fell in the
    prefix). Crafted signatures put the differing bits in the worst spots:
    inside the former prefix (bits 48-63), across two bands, and at exactly
    the hamming bound."""
    from hri_flink_validation_passthrough_spark.operators.dedup import (
        _banded_hamming_pairs,
    )

    base = 0x0123_4567_89AB_CDEF
    rows = [
        (0, base),
        (1, base ^ (1 << 50)),            # ham 1, bit in the old prefix
        (2, base ^ (1 << 50) ^ (1 << 10)),  # ham 2, spans two bands
        (3, base ^ (1 << 1) ^ (1 << 17) ^ (1 << 33)),  # ham 3, three bands
        (4, base ^ 0xF),                  # ham 4: beyond the cut, excluded
    ]
    sig = spark.createDataFrame(rows, "doc_id long, sig long")
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in _banded_hamming_pairs(sig, 4, 16, 3).collect()
    }
    # every pair with true hamming <= 3 must be present — pigeonhole says
    # <= 3 differing bits leave at least one of 4 bands identical
    import itertools

    sigs = dict(rows)
    for a, b in itertools.combinations(sigs, 2):
        ham = bin(sigs[a] ^ sigs[b]).count("1")
        if ham <= 3:
            assert got.get((a, b)) == ham, (a, b, ham, got)
        else:
            assert (a, b) not in got


def test_iterative_trainers_release_their_caches(spark):
    """r12 review: the GD/PCA/Lloyd trainers persist a train projection for
    the step loop and return literal trajectory rows — the cache must be
    RELEASED at return, or every invocation pins another executor-cache
    entry for the session lifetime. Pin: repeated invocations do not grow
    the persistent-RDD set (session-memoized artifacts from other
    operators may pre-exist; the trainers must add none)."""
    from hri_flink_validation_passthrough_spark.operators.ml import (
        logistic_gd_returnflag,
        pca_power_iteration,
    )
    from hri_flink_validation_passthrough_spark.operators.similarity import (
        kmeans_lloyd_convergence,
    )

    import time

    def n_cached() -> int:
        """Settled persistent-RDD count: the async ContextCleaner may
        still be unpersisting frames dropped by EARLIER tests (r14: the
        degenerate-corpus sweeps run hundreds of queries first), so read
        until two consecutive samples agree — and the growth assertions
        below are <=, since a concurrent background unpersist shrinking
        the set is not a trainer leak."""
        prev = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
        for _ in range(25):
            time.sleep(0.2)
            cur = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
            if cur == prev:
                return cur
            prev = cur
        return prev

    for fn in (logistic_gd_returnflag, pca_power_iteration,
               kmeans_lloyd_convergence):
        fn(spark, "/root/testdata/sf0.001").collect()  # warm: memos build here
        before = n_cached()
        fn(spark, "/root/testdata/sf0.001").collect()
        assert n_cached() <= before, fn.__name__

    # ADVICE r12: the release must also hold on the EXCEPTION path — a
    # failure mid-iteration (here: a missing table, so the first cached
    # action inside the loop throws) must not leak the train cache the
    # finally block targets.
    import pytest

    before = n_cached()
    for fn in (logistic_gd_returnflag, pca_power_iteration,
               kmeans_lloyd_convergence):
        with pytest.raises(Exception):
            fn(spark, "/root/testdata/no-such-sf").collect()
        assert n_cached() <= before, f"{fn.__name__} leaked on failure"
