"""SparkSession construction and per-session tuning.

Two entry points:

- ``build_session()``   — create a tuned local session (tests, bench, CLI).
- ``prepare(spark)``    — apply the *runtime-settable* subset of the tuning to
  a session we did not create (the driver passes us its own session). Only
  ``spark.sql.*`` runtime confs are touched; never the master or memory.

Scale posture (100 TB, ~1000 executors): everything here is either
runtime-settable or per-job. Shuffle partitioning is sized to cores locally
but would be AQE-coalesced on a real cluster; adaptive skew-join handling is
on so a hot batchId / hot join key re-splits at runtime.
"""

from __future__ import annotations

import os

from itertools import count as _itercount

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

_FP_MISSING = _itercount()

# Runtime-settable confs applied to ANY session that runs our queries.
RUNTIME_CONF: dict[str, str] = {
    # Oracle comparability: DuckDB timestamps are UTC-naive.
    "spark.sql.session.timeZone": "UTC",
    # AQE: runtime re-plan — coalesce post-shuffle partitions, split skewed
    # ones, demote/promote join strategies with real stats.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for every pandas-UDF / applyInPandas boundary.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # testdata events.parquet stores TIMESTAMP(NANOS); Spark reads it as a
    # long we convert in load_table (DuckDB truncates nanos→micros the same).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Driver testdata timestamps are timezone-less parquet micros. Read them
    # as session-TZ (UTC) TIMESTAMP, not TIMESTAMP_NTZ: values then equal the
    # DuckDB oracle's UTC-naive reads and chrono functions (unix_millis,
    # window, watermarks) accept them. load_table also casts defensively in
    # case this conf cannot be applied to an externally built session.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    # ANSI off: Spark 4 defaults ansi.enabled=true (strict cast/overflow/
    # element_at). We want classic null-on-bad-cast semantics so expressions
    # like get_json_object(...).cast('int') behave like DuckDB TRY_CAST-ish
    # oracle comparisons; we never rely on silent overflow.
    "spark.sql.ansi.enabled": "false",
}


def _local_cpus() -> int:
    try:
        return int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    except ValueError:
        return os.cpu_count() or 4


def prepare(spark: SparkSession) -> SparkSession:
    """Apply runtime tuning to an externally provided session (idempotent).

    Conf-set failures never fail a query, but they are not silent either:
    most of RUNTIME_CONF is tuning, yet ``session.timeZone`` is a
    CORRECTNESS dependency — load_table's NTZ→LTZ cast is value-preserving
    only under UTC, and epoch-based functions (unix_millis, watermarks)
    would silently drift from the UTC-naive DuckDB oracle otherwise."""
    import warnings

    for k, v in RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception as e:
            warnings.warn(
                f"prepare(): could not set {k}={v!r} on this session: {e}",
                RuntimeWarning,
                stacklevel=2,
            )
    try:
        tz = spark.conf.get("spark.sql.session.timeZone")
    except Exception:
        tz = None
    if tz != "UTC":
        warnings.warn(
            f"prepare(): spark.sql.session.timeZone is {tz!r}, not 'UTC' — "
            "timestamp reinterpretation and epoch functions may drift from "
            "UTC-naive oracles",
            RuntimeWarning,
            stacklevel=2,
        )
    # Size the shuffle for the session's actual parallelism; AQE coalesces
    # down, so erring high is cheap.
    try:
        cores = spark.sparkContext.defaultParallelism
        spark.conf.set("spark.sql.shuffle.partitions", str(max(cores, 8)))
    except Exception:
        pass
    return spark


def build_session(
    app_name: str = "hri_spark",
    cpus: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Create the tuned local session used by tests, bench.py and the CLI.
    *extra_conf* lets diagnostic harnesses (tools/diag_pyworker.py) pin
    session-start-only confs like spark.python.worker.reuse."""
    n = cpus or _local_cpus()
    b = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(n, 8)))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # context-start-only (ContextCleaner reads it once): reliable
        # checkpoints (materialize.py's SPARK_GRAFT_MATERIALIZE=reliable
        # arm) are otherwise never deleted — out-of-scope checkpoint data
        # must be reference-released like cached blocks, or a long session
        # accrues one checkpoint tree per materialized intermediate
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
    )
    for k, v in RUNTIME_CONF.items():
        b = b.config(k, v)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return prepare(spark)


def source_fingerprint(sf_dir: str, fname: str) -> tuple:
    """Hashable (fname, size, mtime_ns) of one source parquet — the memo-key
    component every session cache of corpus-DERIVED artifacts must carry
    (r9 ADVICE, generalized in r10): keyed on path alone, a dataset
    regenerated in place mid-session would silently serve stale persisted
    intermediates. A missing file yields a truly never-matching (unique)
    sentinel rather than raising. Routed through iofs (r15) so a
    ``scheme://`` data dir fingerprints like a local one."""
    from . import iofs

    src = iofs.join(sf_dir.rstrip("/"), fname)
    st = iofs.stat(src)
    if st is None:
        # UNIQUE per call (itertools counter), so the sentinel can never
        # equal another fingerprint — including another missing-file one:
        # a stat that races a delete-then-regenerate window must not let
        # two sentinel keys collide and serve a stale entry. (Nothing can
        # be BUILT while the file is absent, so unique keys cost nothing.)
        return (fname, None, next(_FP_MISSING))
    return (fname, st["size"], st["mtime_ns"])


def evict_stale_memo(memo: dict, key: tuple, n_prefix: int) -> None:
    """Drop AND unpersist memo entries sharing *key*'s first *n_prefix*
    components but not its fingerprint tail. Fingerprint-aware keys alone
    do NOT close the staleness hole for PERSISTED entries: Spark's
    CacheManager substitutes any semantically-equal plan with the existing
    InMemoryRelation, so a rebuilt DataFrame (same path, same expressions)
    would silently serve the STALE cached data unless the old entry is
    uncached first (observed: in-place corpus regen returned the old
    row count until the stale persist was dropped)."""
    for k in [k for k in memo if k != key and k[:n_prefix] == key[:n_prefix]]:
        v = memo.pop(k)
        for df in v if isinstance(v, tuple) else (v,):
            try:
                df.unpersist()
            except Exception:
                pass


# (applicationId, sf_dir, name, source_fingerprint) -> inferred StructType.
# Schema METADATA only — the catalog every production engine consults
# instead of re-reading parquet footers per query (r15 opt, guide §1/§6):
# a bare ``spark.read.parquet`` runs a footer-inference job on EVERY call
# (measured 0.16-0.37 s warm per table vs 0.027 s with the schema
# supplied), and the repo's queries call load_table 1-3× per invocation.
# Fingerprint-keyed like every corpus-derived memo (r10 rule) so a dataset
# regenerated in place re-infers instead of serving a stale schema; the
# applicationId component keeps sessions with different reader confs
# (e.g. a driver session where ``nanosAsLong`` could not be applied) from
# sharing inference results.
_SCHEMA_MEMO: dict[tuple, object] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str):
    """Read one driver-generated parquet table (TESTDATA.md).

    ``events.ts`` is parquet TIMESTAMP(NANOS); with ``nanosAsLong`` Spark
    surfaces it as nanos-since-epoch LONG. Convert with *integer* division
    (``div``) to microseconds — matching DuckDB's truncating nanos→micros
    read; float division would round and drift by 1µs.
    """
    key = (
        spark.sparkContext.applicationId,
        sf_dir.rstrip("/"),
        name,
        source_fingerprint(sf_dir, f"{name}.parquet"),
    )
    schema = _SCHEMA_MEMO.get(key)
    if schema is None:
        # drop stale entries for the same table (different fingerprint)
        for k in [k for k in _SCHEMA_MEMO if k != key and k[:3] == key[:3]]:
            del _SCHEMA_MEMO[k]
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        _SCHEMA_MEMO[key] = df.schema
    else:
        df = spark.read.schema(schema).parquet(f"{sf_dir}/{name}.parquet")
    for f in df.schema.fields:
        if f.name == "ts" and f.dataType.simpleString() == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif f.dataType.simpleString() == "timestamp_ntz":
            # Session TZ is UTC, so NTZ → LTZ is a value-preserving
            # reinterpretation matching the DuckDB oracle's naive reads.
            df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
    return df


TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def register_views(spark: SparkSession, sf_dir: str) -> SparkSession:
    """Register every driver table as a temp view: the plain-SQL entry point.

    After this, users run ``spark.sql("SELECT ... FROM lineitem ...")``
    directly — the same catalog names the DuckDB oracles use, with the same
    timestamp normalization ``load_table`` applies. Views are lazy: no data
    moves until a query runs, and Catalyst sees straight through them
    (pushdown/pruning reach the parquet scan exactly as with the DataFrame
    API).
    """
    prepare(spark)
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark
