"""Filesystem seam for the durable catalog layer (ANN indexes, versioned
tables, stream epoch trees).

Every path the catalog layer touches flows through this module so the
same lifecycle (build -> atomic publish -> pruned read -> upsert ->
fold/compact -> vacuum) works whether the catalog root is a local
directory or an object store / DFS URI:

- **Plain local paths** (no ``scheme://``) use ``os``/``shutil`` directly
  — zero JVM round-trips, and available even without a SparkSession
  (offline tools, unit tests).
- **Any ``scheme://`` URI** (``hdfs://``, ``s3a://``, ``abfss://``,
  ``gs://``, and — crucially for in-sandbox testing — ``file://``)
  routes through Spark's Hadoop ``FileSystem`` via the active session's
  JVM, inheriting the session's Hadoop configuration (credentials,
  endpoints, committers). A remote path with NO active SparkSession, or
  a scheme the classpath has no connector for, raises immediately — the
  r14 verdict's requirement that a non-local catalog either works or
  fails loudly, never silently resolving to "zero index trees".

Semantics the catalog layer relies on, and how each backend meets them:

- ``rename`` returns ``False`` for a lost publish race (destination
  already exists) and raises for every other failure. Locally that is
  the POSIX ENOTEMPTY/EEXIST/ENOTDIR contract of ``os.rename`` onto a
  non-empty dir; on Hadoop, ``FileSystem.rename`` returning false with
  the destination present. Note the atomicity fine print: HDFS directory
  rename is atomic; S3A/GCS rename is a copy-then-delete, so two racing
  builders on a bare object store should serialize publishes externally
  (the single-writer maintenance contract already assumes this) or run
  over a table format with a commit protocol.
- ``replace`` (sidecar update) is ``os.replace`` locally (atomic). On
  Hadoop it is delete-then-rename — a narrowed but non-zero window; the
  sidecar reader (`read_index_meta`) already treats a missing/torn
  sidecar as "rebuild", so the failure mode is a spurious rebuild, never
  a wrong answer.
- ``list_files`` returns paths RELATIVE to the listed root using ``/``
  separators, built from child *names* (never string surgery on
  fully-qualified URIs, whose normalization differs per scheme).

Scope note: session-local SCRATCH artifacts (zonemap clustered copies,
bucketed-table dirs under ``tempfile.mkdtemp``) deliberately stay on
plain ``os`` paths — they are driver-local by construction and some are
read with pyarrow, which is the point of those queries (footer-stats
manifests). Only durable, root-configurable state routes through here.
"""

from __future__ import annotations

import errno
import os
import shutil

__all__ = [
    "is_remote",
    "exists",
    "is_dir",
    "list_names",
    "list_files",
    "list_files_with_size",
    "stat",
    "read_text",
    "write_text",
    "rename",
    "replace",
    "delete",
    "join",
]


def is_remote(path: str) -> bool:
    """True when *path* is a URI with an explicit scheme (``a://b``) —
    routed through Hadoop — rather than a bare local filesystem path."""
    return "://" in str(path)


def join(base: str, *parts: str) -> str:
    """Path join that is safe for both bare paths and URIs. On POSIX
    ``os.path.join`` already uses ``/``; guarding here keeps the seam
    explicit and platform-independent for URI bases."""
    if is_remote(base):
        out = base.rstrip("/")
        for p in parts:
            out = f"{out}/{p.strip('/')}"
        return out
    return os.path.join(base, *parts)


def _jexc_name(exc: Exception) -> str:
    """Java class name of a py4j-raised exception, '' for non-Java ones."""
    je = getattr(exc, "java_exception", None)
    try:
        return je.getClass().getName() if je is not None else ""
    except Exception:
        return ""


def _active_spark():
    from pyspark.sql import SparkSession

    return SparkSession.getActiveSession()


def _try_file_context(jvm, path: str, conf):
    """Hadoop ``FileContext`` for *path*, or ``None`` when the scheme has
    no ``AbstractFileSystem`` binding (e.g. bare ``s3a://`` without
    ``fs.AbstractFileSystem.s3a.impl`` configured). FileContext's rename
    has the semantics the publish protocol needs — it THROWS
    ``FileAlreadyExistsException`` when the destination exists, where
    ``FileSystem.rename`` silently moves the source INTO an existing
    destination directory (mv nesting — which would corrupt a publish)."""
    try:
        # Path.toUri() parses/escapes the string the way Hadoop itself
        # does — java.net.URI(str) would reject legal path characters
        return jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            jvm.org.apache.hadoop.fs.Path(path).toUri(), conf
        )
    except Exception as exc:
        if "UnsupportedFileSystemException" in _jexc_name(exc):
            return None
        raise


def _jfs(path: str):
    """(jvm, Hadoop FileSystem, Path) for *path* via the active session.

    Raises ``RuntimeError`` when no SparkSession is active (a remote
    catalog is unreachable without the JVM + Hadoop conf) and propagates
    the JVM's own error for unknown schemes ("No FileSystem for scheme")
    — both loud, per the fail-loud contract in the module docstring."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError(
            f"cannot access remote path {path!r}: no active SparkSession "
            "to reach the Hadoop FileSystem API (the durable-catalog "
            "layer resolves scheme:// URIs through the session's Hadoop "
            "configuration)"
        )
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    # Path.getFileSystem is the canonical resolution (same instance cache
    # as FileSystem.get) and tolerates characters java.net.URI(str) won't
    fs = p.getFileSystem(conf)
    return jvm, fs, p


def exists(path: str) -> bool:
    if not is_remote(path):
        return os.path.exists(path)
    _, fs, p = _jfs(path)
    return bool(fs.exists(p))


def is_dir(path: str) -> bool:
    if not is_remote(path):
        return os.path.isdir(path)
    _, fs, p = _jfs(path)
    return bool(fs.exists(p)) and bool(fs.getFileStatus(p).isDirectory())


def list_names(path: str) -> list[str]:
    """Child names of directory *path*; ``[]`` when missing or not a
    directory (mirrors the catalog layer's listdir-if-isdir idiom)."""
    if not is_remote(path):
        return os.listdir(path) if os.path.isdir(path) else []
    _, fs, p = _jfs(path)
    if not (fs.exists(p) and fs.getFileStatus(p).isDirectory()):
        return []
    return [st.getPath().getName() for st in fs.listStatus(p)]


def list_files(path: str) -> list[str]:
    """All files under *path* recursively, as ``/``-separated paths
    RELATIVE to *path*; ``[]`` when the root is missing. Relative output
    is what the visibility rule needs (per-segment ``_``/``.`` checks)
    and sidesteps per-scheme URI normalization (``file:/`` vs
    ``file:///``) entirely — callers re-anchor with :func:`join`."""
    return [rel for rel, _sz in list_files_with_size(path)]


def list_files_with_size(path: str) -> list[tuple[str, int]]:
    """Like :func:`list_files` but each entry is ``(rel_path, bytes)`` —
    the sizes ride along in the SAME listing pass, so a layout report
    over a million-file table costs one recursive listing, not a million
    follow-up stat RPCs (the listStatus response already carries
    lengths; locally os.walk + stat touches each dirent once anyway)."""
    out: list[tuple[str, int]] = []
    if not is_remote(path):
        for root, _dirs, files in os.walk(path):
            rel = os.path.relpath(root, path)
            pre = "" if rel == "." else rel.replace(os.sep, "/") + "/"
            for f in files:
                try:
                    sz = os.stat(os.path.join(root, f)).st_size
                except OSError:
                    continue  # raced a concurrent delete
                out.append((f"{pre}{f}", sz))
        return out
    _, fs, p = _jfs(path)
    if not fs.exists(p):
        return []

    def _walk(jdir, prefix: str) -> None:
        for st in fs.listStatus(jdir):
            name = st.getPath().getName()
            if st.isDirectory():
                _walk(st.getPath(), f"{prefix}{name}/")
            else:
                out.append((f"{prefix}{name}", int(st.getLen())))

    if fs.getFileStatus(p).isDirectory():
        _walk(p, "")
    return out


def stat(path: str) -> dict | None:
    """``{"size": bytes, "mtime_ns": int}`` or ``None`` when missing.
    Infrastructure failures (unreachable scheme, no session) still raise
    — only genuine absence degrades to ``None``. Hadoop modification
    time is millisecond-granular; fingerprints compare equal-backend
    values only, so the differing granularity never crosses."""
    if not is_remote(path):
        try:
            st = os.stat(path)
        except OSError:
            return None
        return {"size": st.st_size, "mtime_ns": st.st_mtime_ns}
    _, fs, p = _jfs(path)
    if not fs.exists(p):
        return None
    st = fs.getFileStatus(p)
    return {
        "size": int(st.getLen()),
        "mtime_ns": int(st.getModificationTime()) * 1_000_000,
    }


def read_text(path: str) -> str:
    """Read a small text file (sidecar JSON, epoch markers). Raises
    ``OSError`` on any failure so existing ``except OSError`` sites keep
    their semantics across backends."""
    if not is_remote(path):
        with open(path) as fh:
            return fh.read()
    try:
        jvm, fs, p = _jfs(path)
        stream = fs.open(p)
        try:
            reader = jvm.java.io.BufferedReader(
                jvm.java.io.InputStreamReader(stream, "UTF-8")
            )
            lines = []
            line = reader.readLine()
            while line is not None:
                lines.append(line)
                line = reader.readLine()
            return "\n".join(lines)
        finally:
            stream.close()
    except RuntimeError:
        raise  # no-session / unknown-scheme: infra failure, stay loud
    except Exception as exc:  # py4j java IOException and kin
        raise OSError(f"read failed for {path}: {exc}") from exc


def write_text(path: str, text: str) -> None:
    """Write a small text file, overwriting. Remote writes go through
    ``FileSystem.create(overwrite=True)`` — the same committer-less
    direct write the markers/sidecars use locally; callers needing
    atomicity write to a temp name and :func:`replace`."""
    if not is_remote(path):
        with open(path, "w") as fh:
            fh.write(text)
        return
    _, fs, p = _jfs(path)
    stream = fs.create(p, True)
    try:
        stream.write(bytearray(text.encode("utf-8")))
    finally:
        stream.close()


def rename(src: str, dst: str) -> bool:
    """Atomic-where-the-backend-allows rename. Returns ``False`` iff the
    destination already exists (a lost publish race — the caller treats
    the winner's artifact as authoritative); raises on real failures
    (missing parent, permissions, read-only root)."""
    if not is_remote(src):
        try:
            os.rename(src, dst)
            return True
        except OSError as exc:
            if exc.errno in (errno.ENOTEMPTY, errno.EEXIST, errno.ENOTDIR):
                return False
            raise
    jvm, fs, psrc = _jfs(src)
    pdst = jvm.org.apache.hadoop.fs.Path(dst)
    fc = _try_file_context(jvm, src, fs.getConf())
    if fc is not None:
        # FileContext.rename throws FileAlreadyExistsException on an
        # existing destination — atomic lost-race detection on HDFS/local,
        # with none of FileSystem.rename's mv-style nesting hazard
        gw = _active_spark().sparkContext._gateway
        opts = gw.new_array(jvm.org.apache.hadoop.fs.Options.Rename, 0)
        try:
            fc.rename(psrc, pdst, opts)
            return True
        except Exception as exc:
            if "FileAlreadyExistsException" in _jexc_name(exc):
                return False
            raise
    # No AbstractFileSystem binding (bare object store): pre-check then
    # FileSystem.rename. Check-then-act is not atomic, but neither is the
    # store's rename itself (copy+delete) — the single-writer maintenance
    # contract covers concurrent publishers there (module docstring).
    if fs.exists(pdst):
        return False
    if bool(fs.rename(psrc, pdst)):
        return True
    if fs.exists(pdst):
        return False  # concurrent publisher won between check and rename
    raise RuntimeError(
        f"rename {src} -> {dst} failed with no concurrent publish "
        "(missing source/parent or filesystem error)"
    )


def replace(src: str, dst: str) -> None:
    """Rename *src* over *dst*, clobbering it — the sidecar-update seam.
    ``os.replace`` locally (atomic). Hadoop has no portable overwrite
    rename, so remotely it is delete-then-rename: the reader's
    missing-sidecar handling (treat as rebuild) absorbs the narrowed
    window, per the module docstring."""
    if not is_remote(src):
        os.replace(src, dst)
        return
    jvm, fs, psrc = _jfs(src)
    pdst = jvm.org.apache.hadoop.fs.Path(dst)
    fc = _try_file_context(jvm, src, fs.getConf())
    if fc is not None:
        # atomic overwrite-rename where the filesystem supports it
        gw = _active_spark().sparkContext._gateway
        opts = gw.new_array(jvm.org.apache.hadoop.fs.Options.Rename, 1)
        opts[0] = jvm.org.apache.hadoop.fs.Options.Rename.OVERWRITE
        fc.rename(psrc, pdst, opts)
        return
    if fs.exists(pdst):
        fs.delete(pdst, False)
    if not bool(fs.rename(psrc, pdst)):
        raise RuntimeError(f"replace {src} -> {dst} failed")


def delete(path: str, ignore_errors: bool = True) -> None:
    """Recursive delete. Best-effort by default (trash/tmp cleanup)."""
    if not is_remote(path):
        shutil.rmtree(path, ignore_errors=ignore_errors)
        return
    try:
        _, fs, p = _jfs(path)
        fs.delete(p, True)
    except RuntimeError:
        raise  # no active session: infra failure, never swallowed
    except Exception:
        if not ignore_errors:
            raise
