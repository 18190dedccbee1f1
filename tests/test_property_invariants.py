"""Hypothesis property tests for pure-Python invariants (no SparkSession).

These pin the algebra that the distributed plans AND their oracles share —
the layer where a bug would be invisible to cross-engine parity checks.
"""

from __future__ import annotations

import math
import os

from hypothesis import given, settings
from hypothesis import strategies as st

# ---- floor-nudge rounding: the repo-wide cross-engine rounding rule ------


def _nudge4(x: float) -> float:
    return math.floor(x * 10000 + 0.500001) / 10000


@settings(max_examples=200, deadline=None)
@given(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False))
def test_floor_nudge_is_monotone_and_close(x):
    r = _nudge4(x)
    assert abs(r - x) <= 0.00005 + 1e-9
    # monotone: a strictly larger input can't round lower
    assert _nudge4(x + 0.001) >= r


@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=-10**7, max_value=10**7))
def test_floor_nudge_exact_half_boundaries_round_up(n):
    # x = n/2 * 1e-4 puts odd n EXACTLY on the .00005 boundary — the case
    # engines disagree on with round(); the nudge must resolve upward.
    x = (n / 2) / 10000
    assert _nudge4(x) == math.floor(n / 2 + 0.500001) / 10000


def test_floor_nudge_matches_duckdb_exactly():
    """The same expression evaluated by DuckDB must agree bit-for-bit —
    this IS the assumption every oracle in the repo makes."""
    import duckdb

    vals = [i / 3.0 for i in range(-500, 500)] + [
        (n / 2) / 10000 for n in range(-99, 100)
    ]
    con = duckdb.connect()
    got = con.execute(
        "SELECT floor(v * 10000 + 0.500001) / 10000 FROM (SELECT unnest(?) AS v)",
        [vals],
    ).fetchall()
    for v, (d,) in zip(vals, got):
        assert _nudge4(v) == d, v


# ---- vacuum ranking: marker-aware keep policy ----------------------------


@settings(max_examples=100, deadline=None)
@given(
    st.dictionaries(
        st.integers(min_value=1, max_value=30),  # version -> marked?
        st.booleans(),
        min_size=1,
        max_size=12,
    ),
    st.integers(min_value=1, max_value=5),
)
def test_vacuum_policy_invariants(tmp_path_factory, versions, keep):
    from hri_flink_validation_passthrough_spark.operators.maintenance import (
        vacuum_table_versions,
    )

    root = str(tmp_path_factory.mktemp("vac"))
    for v, marked in versions.items():
        os.makedirs(os.path.join(root, f"v{v}"))
        if marked:
            with open(os.path.join(root, f"v{v}", "_EPOCH"), "w") as fh:
                fh.write(f"{v}\nrun")
    out = vacuum_table_versions(root, keep=keep)
    kept = set(out["kept"])
    marked_set = {v for v, m in versions.items() if m}
    # 1) the newest marked version (the recovery anchor) always survives
    if marked_set:
        assert max(marked_set) in kept
    # 2) never keep more than keep (+1 for the anchor)
    assert len(kept) <= keep + 1
    # 3) keep-priority: an unmarked version may only be kept if every
    #    marked version is also kept (uncommitted partials vacuum first)
    unmarked_kept = kept - marked_set
    if unmarked_kept:
        assert marked_set <= kept
    # 4) kept + removed partitions the input
    assert kept | set(out["removed"]) == set(versions)
    assert not kept & set(out["removed"])


# ---- Holt-Winters blocked algebra vs exact recurrence --------------------


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.floats(min_value=0.0, max_value=1000.0, allow_nan=False),
        min_size=1,
        max_size=400,
    )
)
def test_hw_blocked_algebra_matches_recurrence(ys):
    """Replicate the Spark plan's blocked algebra in pure Python (same
    literal weight arrays _HW_D/_HW_M) and compare the final block-end
    state against the exact sequential recurrence: the truncation bound
    must hold for ARBITRARY series, not just the test fixture."""
    from hri_flink_validation_passthrough_spark.operators.analytics import (
        HW_ALPHA,
        HW_B,
        HW_BETA,
        HW_CARRY,
        _HW_D,
        _HW_M,
    )

    # exact recurrence
    lvl, trd = ys[0], 0.0
    for y in ys[1:]:
        prev = lvl
        lvl = HW_ALPHA * y + (1 - HW_ALPHA) * (lvl + trd)
        trd = HW_BETA * (lvl - prev) + (1 - HW_BETA) * trd

    # blocked algebra (the plan's computation, scalarized)
    def u(i, y):
        return (y, 0.0) if i == 0 else (HW_ALPHA * y, HW_ALPHA * HW_BETA * y)

    n_blocks = (len(ys) + HW_B - 1) // HW_B
    w = []  # per-block (w0, w1)
    lmaxs = []
    for blk in range(n_blocks):
        rows = list(enumerate(ys))[blk * HW_B : (blk + 1) * HW_B]
        lmax = len(rows) - 1
        lmaxs.append(lmax)
        w0 = w1 = 0.0
        for pos, (i, y) in enumerate(rows):
            d = lmax - pos
            u0, u1 = u(i, y)
            w0 += _HW_D[0][d] * u0 + _HW_D[1][d] * u1
            w1 += _HW_D[2][d] * u0 + _HW_D[3][d] * u1
        w.append((w0, w1))
    k = n_blocks - 1
    lmax = lmaxs[k]
    lvl_b, trd_b = w[k]
    for i in range(1, HW_CARRY + 1):
        if k - i < 0:
            break
        p0, p1 = w[k - i]
        lvl_b += _HW_M[i][0][lmax] * p0 + _HW_M[i][1][lmax] * p1
        trd_b += _HW_M[i][2][lmax] * p0 + _HW_M[i][3][lmax] * p1

    scale = max(1.0, abs(lvl), abs(trd))
    assert abs(lvl_b - lvl) <= 1e-6 * scale
    assert abs(trd_b - trd) <= 1e-6 * scale


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=20), min_size=1, max_size=60),
    st.integers(min_value=1, max_value=10),
)
def test_lindley_closed_form_matches_recurrence(arrivals, cap):
    """stream_rate_limiter_backlog's reflected-prefix-sum closed form
    (backlog_t = P_t - min(0, running-min P), P = cumsum(a - cap)) must equal
    the sequential queue recurrence backlog_t = max(0, backlog_{t-1} + a - cap)
    for every arrival sequence, and the derived served column must conserve
    records (sum served + final backlog == sum arrivals)."""
    # ground truth: the sequential recurrence
    b, truth = 0, []
    for a in arrivals:
        b = max(0, b + a - cap)
        truth.append(b)
    # closed form, exactly as both engines compute it
    pt, mn, prev_b, closed, served = 0, 0, 0, [], []
    for a in arrivals:
        pt += a - cap
        mn = min(mn, pt)
        bb = pt - min(0, mn)
        closed.append(bb)
        served.append(a + prev_b - bb)
        prev_b = bb
    assert closed == truth
    assert all(0 <= s <= cap for s in served)
    assert sum(served) + closed[-1] == sum(arrivals)


# ---- SQ8 per-vector symmetric quantization (ann_sq8_adc_topk) ------------


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.just(0.0),
            st.floats(min_value=1e-6, max_value=100.0),
            st.floats(min_value=-100.0, max_value=-1e-6),
        ),
        min_size=1,
        max_size=64,
    )
)
def test_sq8_quantize_error_bound_and_code_range(vec):
    """The algebra ann_sq8_adc_topk and its oracle share: with scale =
    127/max|x|, codes round(x*scale) always fit int8 ([-127, 127]) and the
    decode error |x - code/scale| is bounded by half a quantization step
    (max|x|/254) — the bound that makes the ADC shortlist near-lossless.

    Domain precondition (hypothesis found the edge): max|x| must be large
    enough that 127/max|x| stays finite — a vector whose largest entry is
    denormal (~5e-324) overflows the scale to inf in BOTH engines. Real
    embedding components are O(1); the strategy pins |x| in {0} ∪
    [1e-6, 100]."""
    absmax = max(abs(x) for x in vec)
    if absmax == 0:
        return  # zero vectors are filtered out by both engines
    scale = 127.0 / absmax
    step_half = absmax / 254.0
    for x in vec:
        code = math.floor(x * scale + 0.5) if x * scale >= 0 else -math.floor(
            -x * scale + 0.5
        )  # round-half-away-from-zero, the double semantics both engines use
        assert -127 <= code <= 127
        assert abs(x - code / scale) <= step_half + 1e-12


# ---- floor-nudge rule: cross-engine identity of the rounding primitive ----


@settings(max_examples=300, deadline=None)
@given(
    st.floats(min_value=-1e9, max_value=1e9, allow_nan=False),
    st.sampled_from([4, 6, 8, 9]),
)
def test_floor_nudge_python_equals_duckdb(v, digits):
    """The repo's half-up rule floor(x*10^d + 0.500001)/10^d is load-bearing
    BECAUSE both engines compute it identically on the same double —
    py_floor_nudge (the driver-side scalar twin used to snap GD/PCA/Lloyd
    parameters) must match DuckDB's evaluation of the same expression
    bit-for-bit for arbitrary doubles, or snapped literals would diverge
    from oracle CTE re-derivations."""
    import duckdb

    from hri_flink_validation_passthrough_spark.functions import (
        py_floor_nudge,
    )

    scale = 10 ** digits
    got = py_floor_nudge(v, digits)
    # bind the double as a PARAMETER: a repr() literal would parse as
    # DECIMAL first and the DECIMAL->DOUBLE cast can land 1 ulp off the
    # Python double (a literal-syntax artifact — oracle inputs are parquet
    # doubles, never high-precision decimal literals)
    want = duckdb.execute(
        f"SELECT floor(?::DOUBLE * {scale} + 0.500001) / {scale}", [v]
    ).fetchone()[0]
    assert got == want or (math.isnan(got) and math.isnan(want)), (v, digits)


def test_corr_matrix_precentered_twin_agrees(spark):
    """ADVICE r12 on numeric_corr_matrix: the registered raw-moment form
    (n*Saa − Sa², one pass) is worse-conditioned than a shifted co-moment;
    the documented large-SF lever is PRE-CENTERING (two passes: means,
    then centered moments). Prove the lever: the centered computation
    agrees with the registered query to well inside the round(.,6)
    contract on the real data, and the zero-variance guard returns NULL
    on a constant column in BOTH forms."""
    from pyspark.sql import functions as F

    from hri_flink_validation_passthrough_spark.operators.analytics import (
        _CORR_COLS,
        numeric_corr_matrix,
    )
    from hri_flink_validation_passthrough_spark.session import load_table

    sf = "/root/testdata/sf0.001"
    got = {
        (r.col_a, r.col_b): r.pearson_r
        for r in numeric_corr_matrix(spark, sf).collect()
    }

    li = load_table(spark, sf, "lineitem")
    means = li.agg(
        *[F.avg(c).alias(c) for c in _CORR_COLS]
    ).collect()[0]
    pairs = [
        (a, b) for i, a in enumerate(_CORR_COLS) for b in _CORR_COLS[i + 1:]
    ]
    cen = li.agg(
        *[
            F.sum((F.col(a) - means[a]) * (F.col(b) - means[b])).alias(f"c_{a}_{b}")
            for a, b in pairs
        ],
        *[
            F.sum((F.col(c) - means[c]) * (F.col(c) - means[c])).alias(f"v_{c}")
            for c in _CORR_COLS
        ],
    ).collect()[0]
    for a, b in pairs:
        want = cen[f"c_{a}_{b}"] / (cen[f"v_{a}"] * cen[f"v_{b}"]) ** 0.5
        assert abs(got[(a, b)] - want) < 1e-6, (a, b, got[(a, b)], want)

    # degenerate corpus: a constant column must yield NULL, not NaN/Inf,
    # under the registered query's guarded algebra (both engines — the
    # oracle side carries the identical CASE)
    const = spark.range(10).select(
        F.lit(1.0).alias("x"), (F.col("id") * 1.0).alias("y")
    )
    agg = const.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"), F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("y").alias("sy"), F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n")
    var_x = n * F.col("sxx") - F.col("sx") * F.col("sx")
    var_y = n * F.col("syy") - F.col("sy") * F.col("sy")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    guarded = agg.select(
        F.when(var_x * var_y > 0, cov / F.sqrt(var_x * var_y)).alias("r")
    ).collect()[0]
    assert guarded.r is None

    import duckdb

    got_oracle = duckdb.sql(
        """WITH s AS (
             SELECT count(*) AS n, sum(x) AS sx, sum(x*x) AS sxx,
                    sum(y) AS sy, sum(y*y) AS syy, sum(x*y) AS sxy
             FROM (SELECT 1.0 AS x, CAST(range AS DOUBLE) AS y FROM range(10)))
           SELECT CASE WHEN (n*sxx - sx*sx) * (n*syy - sy*sy) > 0
                       THEN (n*sxy - sx*sy)
                            / sqrt((n*sxx - sx*sx) * (n*syy - sy*sy)) END
           FROM s"""
    ).fetchone()[0]
    assert got_oracle is None  # the oracle's CASE matches Spark's NULL


@given(st.binary(min_size=0, max_size=64))
@settings(max_examples=300, deadline=None)
def test_media_header_parsers_never_crash(blob):
    """r13 GIF/BMP additions: every header parser must be total over
    arbitrary bytes — return a well-formed dict or None, never raise
    (decode_real runs inside mapInPandas; a parser crash would fail the
    whole Arrow batch, not one blob). Parsed dims/depths must be
    non-negative ints or None."""
    from hri_flink_validation_passthrough_spark.operators.multimodal import (
        probe_media_header,
    )

    got = probe_media_header(blob)
    if got is None:
        return
    assert got["fmt"] in ("png", "jpeg", "wav", "gif", "bmp")
    for k in ("width", "height", "bit_depth", "channels", "sample_rate",
              "n_frames"):
        v = got[k]
        assert v is None or (isinstance(v, int) and v >= 0), (k, v)


@given(st.binary(min_size=0, max_size=64))
@settings(max_examples=300, deadline=None)
def test_media_header_parsers_never_crash_with_magic(blob):
    """Same totality pin with each format's magic prefix grafted on, so
    the fuzz actually reaches the per-format field parsing instead of
    bailing at the signature check."""
    from hri_flink_validation_passthrough_spark.operators.multimodal import (
        probe_media_header,
    )

    for magic in (b"\x89PNG\r\n\x1a\n", b"\xff\xd8", b"RIFF1234WAVE",
                  b"GIF89a", b"BM"):
        got = probe_media_header(magic + blob)
        assert got is None or got["fmt"] in ("png", "jpeg", "wav", "gif",
                                             "bmp")
