"""Locate a pure-Python ``google.protobuf`` runtime when the env has none.

``transformWithStateInPandas`` (the Spark 4 stateful API,
``streaming/topology.py`` path B) speaks a protobuf-framed protocol between
Python processes and the JVM state server. PySpark's generated
``StateMessage_pb2`` must be importable in THREE kinds of Python process:

1. the driver (plan construction),
2. the per-task Python workers (``handleInputRows``),
3. the streaming "driver worker" (``transform_with_state_driver_worker.py``)
   that runs PRE_INIT — this one is launched directly by the JVM and builds
   its ``sys.path`` ONLY from the JVM's inherited ``PYTHONPATH``; it does not
   process ``addPyFile`` includes.

Some environments lack the pip package but ship the pure-Python runtime
elsewhere on disk (e.g. the Google Cloud SDK's App Engine platform
directory). The shim wires such a copy up:

- ``pre_jvm_env()``   — call BEFORE the first SparkSession is created: puts
  the runtime dir on ``PYTHONPATH`` and sets protobuf's documented
  ``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK`` escape hatch (the bundled
  runtime may be one minor version older than PySpark's gencode; the
  StateMessage schema uses no newer-runtime features, verified by a
  serialize/parse round-trip). The JVM inherits the env, and every Python
  process the JVM launches inherits it in turn — covering all three cases.
- ``ensure_protobuf(spark)`` — readiness check for an EXISTING session:
  driver import works AND the session's JVM env carries the runtime (or the
  real pip package exists, in which case workers have it natively). Also
  ships a zip of the runtime via ``addPyFile`` for executor-side workers on
  a multi-node cluster whose executors lack the filesystem copy.

``build_routed_stream``'s auto-detection uses ``have_pip_protobuf()`` only —
the shimmed runtime never silently flips the default backend; callers opt in
with ``prefer_transform_with_state=True`` (the test tier does, after
``pre_jvm_env()``). On a managed cluster image, install the matching
``protobuf`` pip package instead; the shim exists so the preferred stateful
backend is exercised even in hermetic sandboxes.
"""

from __future__ import annotations

import os
import sys
import tempfile
import zipfile

_VERSION_FLAG = "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"

# Well-known locations that bundle a pure-Python google.protobuf runtime;
# PROTOBUF_RUNTIME_DIR overrides/extends for other layouts.
_FALLBACK_DIRS = [
    d
    for d in [
        os.environ.get("PROTOBUF_RUNTIME_DIR"),
        "/usr/lib/google-cloud-sdk/platform/google_appengine",
    ]
    if d
]

_zip_cache: str | None = None


def _runtime_dir() -> str | None:
    """Directory whose ``google/protobuf`` subtree is a usable runtime."""
    for d in _FALLBACK_DIRS:
        if os.path.isfile(os.path.join(d, "google", "protobuf", "message.py")):
            return d
    return None


_narrow_cache: str | None = None


def _narrowed_dir(d: str) -> str:
    """A path-entry exposing ONLY ``google/protobuf`` from ``d``.

    The fallback dirs (e.g. the GAE platform dir) vendor MANY packages;
    putting the whole dir on sys.path/PYTHONPATH would let stale vendored
    modules shadow site-packages (round-3 ADVICE). The narrowed dir holds a
    bare ``google/`` with a single ``protobuf`` symlink and NO __init__.py,
    so ``google`` stays a native namespace portion that MERGES with any real
    ``google.*`` packages instead of shadowing them.
    """
    global _narrow_cache
    if _narrow_cache and os.path.isdir(
        os.path.join(_narrow_cache, "google", "protobuf")
    ):
        return _narrow_cache
    base = tempfile.mkdtemp(prefix="protobuf_narrow_")
    os.makedirs(os.path.join(base, "google"), exist_ok=True)
    link = os.path.join(base, "google", "protobuf")
    try:
        os.symlink(os.path.join(d, "google", "protobuf"), link)
    except OSError:
        return d  # no symlink support — fall back to the wide dir
    _narrow_cache = base
    return base


def _loaded_fallback_dir() -> str | None:
    mod = sys.modules.get("google.protobuf")
    f = getattr(mod, "__file__", None) or ""
    # the loaded __file__ may show either the wide fallback dir or the
    # narrowed symlink view of it — resolve both spellings
    candidates = list(_FALLBACK_DIRS)
    if _narrow_cache:
        candidates.append(_narrow_cache)
    for d in candidates:
        if f.startswith(d + os.sep) or os.path.realpath(f).startswith(
            os.path.realpath(d) + os.sep
        ):
            return d
    return None


def have_pip_protobuf() -> bool:
    """True when a REAL installed google.protobuf exists (not the shim)."""
    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        return False
    return _loaded_fallback_dir() is None


def _driver_import_ok() -> bool:
    """google.protobuf importable AND able to round-trip a pyspark message."""
    try:
        from pyspark.sql.streaming.proto import StateMessage_pb2 as m

        req = m.StateRequest(version=2)
        req.statefulProcessorCall.setHandleState.state = m.HandleState.CREATED
        out = m.StateRequest()
        out.ParseFromString(req.SerializeToString())
        return out.version == 2
    except Exception:
        return False


def pre_jvm_env() -> bool:
    """Prepare ``os.environ`` so JVM-launched Python processes can import
    protobuf. MUST run before the first SparkSession/JVM is created to have
    any effect on workers. Returns True when protobuf will be available."""
    if have_pip_protobuf():
        return True
    d = _runtime_dir()
    if d is None:
        return False
    nd = _narrowed_dir(d)
    os.environ[_VERSION_FLAG] = "true"
    pp = os.environ.get("PYTHONPATH", "")
    if nd not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = f"{pp}{os.pathsep}{nd}" if pp else nd
    # APPEND: site-packages must keep winning for everything but the one
    # missing google.protobuf subtree (namespace merge handles google.*)
    if nd not in sys.path:
        sys.path.append(nd)
    return _driver_import_ok()


def _jvm_env_carries_runtime(spark, d: str) -> bool:
    """Did the session's JVM inherit PYTHONPATH/flag before it booted?"""
    try:
        jvm = spark.sparkContext._jvm
        pp = jvm.java.lang.System.getenv("PYTHONPATH") or ""
        flag = (jvm.java.lang.System.getenv(_VERSION_FLAG) or "").lower()
        return d in pp.split(os.pathsep) and flag == "true"
    except Exception:
        return False


def _package_zip(src_dir: str) -> str:
    """Zip ``google/__init__.py`` + ``google/protobuf/**`` for addPyFile."""
    global _zip_cache
    if _zip_cache and os.path.isfile(_zip_cache):
        return _zip_cache
    fd, path = tempfile.mkstemp(prefix="protobuf_runtime_", suffix=".zip")
    os.close(fd)
    root = os.path.join(src_dir, "google")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        init = os.path.join(root, "__init__.py")
        if os.path.isfile(init):
            zf.write(init, "google/__init__.py")
        else:
            zf.writestr("google/__init__.py", "")
        for cur, _dirs, files in os.walk(os.path.join(root, "protobuf")):
            for fn in files:
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(cur, fn)
                zf.write(full, os.path.relpath(full, src_dir))
    _zip_cache = path
    return path


def ensure_protobuf(spark=None) -> bool:
    """True when transformWithStateInPandas can run on this session.

    Driver-side import must work, and the runtime must reach the JVM's
    Python children: natively (pip package) or because ``pre_jvm_env()`` ran
    before the JVM booted. When running on the fallback copy, also ship it
    to executor workers via addPyFile (multi-node case).
    """
    os.environ.setdefault(_VERSION_FLAG, "true")
    if have_pip_protobuf():
        return True
    d = _runtime_dir()
    if d is None:
        return False
    nd = _narrowed_dir(d)
    if nd not in sys.path:
        sys.path.append(nd)
    if not _driver_import_ok():
        return False
    if spark is None:
        return True
    if not _jvm_env_carries_runtime(spark, nd) and not _jvm_env_carries_runtime(
        spark, d
    ):
        # the streaming driver worker would crash at PRE_INIT — not usable
        # (either spelling of the runtime dir in the JVM's env is fine; older
        # sessions may have been booted with the wide dir on PYTHONPATH)
        return False
    try:
        sc = spark.sparkContext
        sc.environment[_VERSION_FLAG] = "true"
        zip_path = _package_zip(d)
        if zip_path not in getattr(sc, "_shim_pyfiles", set()):
            sc.addPyFile(zip_path)
            sc._shim_pyfiles = getattr(sc, "_shim_pyfiles", set()) | {zip_path}
    except Exception:
        pass  # executor delivery is best-effort; local mode needs none
    return True
