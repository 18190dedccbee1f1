"""JVM-side column helpers — vector math and text metrics.

Everything here returns a ``Column`` built from ``pyspark.sql.functions``
primitives — no Python UDFs, no Arrow hops. Vector ops come in two forms:

- the ``zip_with``/``aggregate`` lambda fold for arbitrary-width arrays —
  JVM-side but INTERPRETED per element (higher-order functions are not
  compiled by whole-stage codegen; measured 6x slower than the unrolled
  form on the PCA pass at sf1, BASELINE.md "PCA rework");
- an UNROLLED flat expression tree when the static width ``dim`` is known
  (embeddings are fixed-width) — fully codegen'd. The addition order is the
  same left-to-right sequence as the fold, so the two forms are
  bit-identical. The winner depends on SHAPE, both directions measured
  (BASELINE.md "PCA rework"): unroll wins for a once-per-row aggregate
  pass (PCA, the current sole ``dim`` caller); the compact fold wins when
  the expression sits inside a join pair-loop duplicated across plan
  operators (the ANN cosine sites — unrolling them regressed 2-3x and was
  reverted).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# width of the embeddings table's vectors (TESTDATA.md), for callers that
# opt into the static unroll
EMB_DIM = 64


def dot(a, b, dim: int | None = None) -> Column:
    """Dot product of two array<numeric> columns (no UDF).

    With ``dim`` the sum is unrolled into a flat codegen'd tree; without,
    it falls back to the interpreted lambda fold. NB: unrolling a too-large
    ``dim`` yields NULL (out-of-range getItem), never a wrong number.
    """
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    if dim is not None:
        s = F.lit(0.0).cast("double")
        for i in range(dim):
            s = s + a[i] * b[i]
        return s
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def norm(a, dim: int | None = None) -> Column:
    """L2 norm of an array<numeric> column (see ``dot`` re: ``dim``)."""
    a = F.col(a) if isinstance(a, str) else a
    if dim is not None:
        s = F.lit(0.0).cast("double")
        for i in range(dim):
            s = s + a[i] * a[i]
        return F.sqrt(s)
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def cosine_similarity(a, b, dim: int | None = None) -> Column:
    """Cosine similarity of two array<numeric> columns (see ``dot``)."""
    return dot(a, b, dim) / (norm(a, dim) * norm(b, dim))


# ---------------------------------------------------------------------------
# Text metrics (documents table). Formulas are deliberately simple and
# SQL-expressible so the DuckDB oracle can mirror them exactly.
# ---------------------------------------------------------------------------

def tokens(text) -> Column:
    """Whitespace tokenization; empty string → empty array."""
    c = F.col(text) if isinstance(text, str) else text
    trimmed = F.trim(c)
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count(text) -> Column:
    return F.size(tokens(text)).cast("long")


def punct_count(text) -> Column:
    """Count of ASCII punctuation .,;:!? in the text."""
    c = F.col(text) if isinstance(text, str) else text
    return (F.length(c) - F.length(F.regexp_replace(c, r"[.,;:!?]", ""))).cast("long")


def digit_ratio(text) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    n = F.length(c)
    digits = n - F.length(F.regexp_replace(c, r"[0-9]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(digits.cast("double") / n.cast("double"))


def normalized_text(text) -> Column:
    """Lowercase, strip non-alphanumerics, collapse whitespace — the canonical
    form used by fingerprint dedup. Mirrors the oracle's
    regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g') then squeeze."""
    c = F.col(text) if isinstance(text, str) else text
    cleaned = F.regexp_replace(F.lower(c), r"[^a-z0-9 ]", "")
    return F.trim(F.regexp_replace(cleaned, r" +", " "))


def fingerprint_md5(text) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text."""
    return F.md5(normalized_text(text))


# ---- cross-engine determinism helpers (r11 reviewer consolidation, shipped
# r12): ONE definition of the repo's floor-nudge half-up rounding rule and of
# the 30-min-gap sessionize construction, previously copy-pasted at ~12 and 4
# call sites respectively. The SQL mirrors stay INLINE in each oracle string
# on purpose — the oracle text is the auditable DuckDB-literal contract and a
# Python indirection there would hide what the oracle actually runs.

def floor_nudge(c, digits: int) -> Column:
    """Half-up rounding via floor with a scaled nudge, NOT round():
    round() is round-half-even on exact halves and both engines can land
    on opposite sides of a float half-boundary by ~1e-15; the +0.500001
    nudge (constant across the repo) makes the boundary decision identical
    on both engines for any value whose true distance from the half grid
    exceeds 1e-6/scale — see the EWMA note at operators/analytics.py for
    the original derivation. Mirrors the SQL form
    ``floor(x * 10^digits + 0.500001) / 10^digits``."""
    scale = 10 ** digits
    return F.floor(c * scale + F.lit(0.500001)) / scale


def py_floor_nudge(v: float, digits: int) -> float:
    """The driver-side scalar twin of :func:`floor_nudge` — snaps collected
    model parameters (GD weights, power-iteration vectors) to the same grid
    both engines will see, so float noise cannot compound across iterative
    steps. The ``float(...)`` wrap is load-bearing (r12 hypothesis find):
    Python's ``math.floor`` returns an EXACT int, and dividing that by the
    scale can differ by 1 ulp from the engines' double-typed
    ``floor(x)/scale`` once ``|v|*scale`` exceeds 2^53; converting back to
    double first reproduces the C semantics bit-for-bit over the whole
    double range (the practical snap domains — weights, loadings,
    centroids — sit far below the boundary either way)."""
    import math

    scale = 10 ** digits
    return float(math.floor(v * scale + 0.500001)) / scale


def with_session_ids(events: "DataFrame", gap_s: int) -> "DataFrame":
    """30-minute-gap sessionization shared by ``events_sessionize`` and the
    three analytics session queries (max_concurrent_sessions,
    session_transition_matrix, session_path_topk): a session starts where
    the per-user inactivity gap exceeds *gap_s* seconds (or at the user's
    first event), and ``sess_id`` is the running count of session starts —
    lag + running sum over the same (ts, event_id)-ordered per-user window,
    no UDF. Returns the input columns plus a numeric ``sess_id``; the
    intermediate flag column is dropped. At 100 TB this is one hash
    partition by user_id and two window passes over it — no extra
    shuffle between them (same partitioning)."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    new_sess = F.when(
        F.lag("ts").over(w).isNull()
        | (
            F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
            > gap_s
        ),
        1,
    ).otherwise(0)
    return (
        events.withColumn("new_sess", new_sess)
        .withColumn(
            "sess_id",
            F.sum("new_sess").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .drop("new_sess")
    )
