"""Table-maintenance utilities: compaction, version vacuum, layout report.

The ops side of an engine that maintains parquet tables (the CDC upsert in
``streaming/windows.py`` writes ``v{N}`` version directories; every long-lived
streaming sink accretes small files). Three primitives a real deployment runs
on a schedule:

- ``compact_small_files`` — rewrite a dataset into ~target-sized files with
  ``coalesce`` (NO shuffle: partitions are concatenated, never repartitioned
  by key — compaction must not pay a network pass at 100 TB; callers who want
  clustering on top use the bucketed/Z-order writers in ``plans/bucketing``).
- ``vacuum_table_versions`` — drop all but K ``v{N}`` directories of a
  versioned table root, ranking keep-priority by ``(_EPOCH marker, version)``
  so uncommitted partial writes go first and the newest *committed* version
  (the ``recover_cdc_state`` anchor) is never deleted (the swap protocol
  keeps every version self-contained, so vacuum is pure directory deletion).
- ``table_layout_report`` — the small-files diagnostic (file count, byte
  sizes, rows/file) that decides WHEN to compact; pure filesystem metadata +
  one count, no data scan of column values.

Reference parity note: the reference engine (Alvearie
hri-flink-validation-passthrough) has no table surface at all — these are
north-star extensions mandated by the engine's own CDC/table features.
"""

from __future__ import annotations

import math
import os
import re
import shutil

from pyspark.sql import SparkSession

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024  # the classic HDFS/parquet sweet spot

_VER_RE = re.compile(r"^v(\d+)$")


def _data_files(path: str) -> list[str]:
    out = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                out.append(os.path.join(root, f))
    return out


def table_layout_report(spark: SparkSession, path: str) -> dict:
    """File-layout health of a parquet dataset (metadata-only + row count)."""
    files = _data_files(path)
    sizes = [os.path.getsize(f) for f in files]
    n_rows = spark.read.parquet(path).count() if files else 0
    return {
        "n_files": len(files),
        "total_bytes": sum(sizes),
        "min_bytes": min(sizes) if sizes else 0,
        "max_bytes": max(sizes) if sizes else 0,
        "avg_bytes": (sum(sizes) // len(sizes)) if sizes else 0,
        "n_rows": n_rows,
    }


def compact_small_files(
    spark: SparkSession,
    src: str,
    dst: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
) -> dict:
    """Rewrite ``src`` into ``dst`` with ~``target_bytes``-sized files.

    The output file count is ``ceil(total_bytes / target_bytes)`` (>=1),
    reached with ``coalesce`` — a partition-merge with no shuffle, no
    re-sorting, and no change to row content. Returns a before/after report.
    """
    before = table_layout_report(spark, src)
    n_out = max(1, math.ceil(before["total_bytes"] / target_bytes))
    df = spark.read.parquet(src)
    # coalesce can only REDUCE partition count; if the source has fewer
    # (huge-file) partitions than n_out, leave them — splitting oversized
    # files is the scan's job (maxPartitionBytes), not the writer's.
    df.coalesce(n_out).write.mode("overwrite").parquet(dst)
    after = table_layout_report(spark, dst)
    # a plain assert is compiled out under `python -O` — exactly where an
    # unattended maintenance job would run; keep the invariant unconditional
    if after["n_rows"] != before["n_rows"]:
        raise RuntimeError(
            f"compaction must not drop rows: {before['n_rows']} -> "
            f"{after['n_rows']} ({src} -> {dst})"
        )
    return {"before": before, "after": after, "target_files": n_out}


def list_table_versions(root: str) -> list[int]:
    """Committed (``_EPOCH``-marked) version numbers of a versioned table,
    ascending. Uncommitted partial writes (crash between parquet write and
    marker write) are excluded — they are not readable history."""
    out = []
    for d in os.listdir(root) if os.path.isdir(root) else []:
        m = _VER_RE.match(d)
        if m and os.path.exists(os.path.join(root, d, "_EPOCH")):
            out.append(int(m.group(1)))
    return sorted(out)


def read_table_version(spark: SparkSession, root: str, version: int):
    """Time-travel read: the table AS OF committed version ``version``.

    Every ``v{N}`` directory the CDC writer produces is a SELF-CONTAINED
    snapshot (full-table merge per microbatch, not a delta log), so time
    travel is a plain parquet read of that directory — no log replay, no
    reconstruction. Only ``_EPOCH``-marked versions are readable: an
    unmarked directory is a torn write whose contents are undefined.
    Raises ``ValueError`` for unknown/uncommitted versions (listing the
    committed ones, so callers can bisect history).
    """
    path = os.path.join(root, f"v{version}")
    if not os.path.isdir(path) or not os.path.exists(os.path.join(path, "_EPOCH")):
        raise ValueError(
            f"no committed version v{version} under {root}; "
            f"committed versions: {list_table_versions(root)}"
        )
    return spark.read.parquet(path)


def vacuum_table_versions(root: str, keep: int = 2) -> dict:
    """Delete all but ``keep`` ``v{N}`` version directories, marker-aware.

    Versions are self-contained snapshots (the CDC writer's swap protocol),
    so deletion is pure directory removal — but COMMIT ORDER is defined by
    the ``_EPOCH`` marker the CDC writer drops after a successful parquet
    write, not by the version number alone. A crash between the parquet
    write and the marker write leaves the numerically-newest ``v{N}``
    uncommitted; ranking purely by number would then keep the partial
    version and delete the last committed one, leaving
    ``recover_cdc_state`` (which only restores MARKED versions) with
    nothing. Hence:

    - keep-priority ranks by ``(has _EPOCH marker, version)`` — uncommitted
      partial versions are vacuumed first, regardless of number;
    - the newest *marked* version is never deleted, regardless of ``keep``.

    Returns kept/removed version numbers.
    """
    if keep < 1:
        raise ValueError("keep must be >= 1 (the current version always stays)")
    vers = sorted(
        int(m.group(1))
        for d in os.listdir(root)
        if (m := _VER_RE.match(d)) and os.path.isdir(os.path.join(root, d))
    )

    def _committed(v: int) -> bool:
        return os.path.exists(os.path.join(root, f"v{v}", "_EPOCH"))

    by_keep_priority = sorted(vers, key=lambda v: (_committed(v), v), reverse=True)
    hold = set(by_keep_priority[:keep])
    marked = [v for v in vers if _committed(v)]
    if marked:
        hold.add(max(marked))  # the recovery anchor survives any keep
    drop = [v for v in vers if v not in hold]
    for v in drop:
        shutil.rmtree(os.path.join(root, f"v{v}"))
    return {"kept": sorted(hold), "removed": drop}
