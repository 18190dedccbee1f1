"""JVM-side column helpers — vector math and text metrics.

Everything here returns a ``Column`` built from ``pyspark.sql.functions``
primitives, so the hot path stays inside whole-stage codegen (no Python UDFs).
Vector ops use ``zip_with``/``aggregate`` over ``array<float/double>`` —
the Tungsten-friendly way to do per-row linear algebra without Arrow hops.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a, b) -> Column:
    """Dot product of two array<numeric> columns (codegen'd, no UDF)."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def norm(a) -> Column:
    """L2 norm of an array<numeric> column."""
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def cosine_similarity(a, b) -> Column:
    """Cosine similarity of two array<numeric> columns (codegen'd)."""
    return dot(a, b) / (norm(a) * norm(b))


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
