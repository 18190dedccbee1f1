"""Streaming job health monitor — the Spark-native twin of the reference's
Flink REST monitor thread (test/spec/flink_job.rb:47-66), which every 5 s
pulls job exceptions (raising on any root-exception) and checkpoint counts
(raising when ``counts.failed > 0``), and exposes ``failed?``.

Spark surfaces the same signals push-style through
``StreamingQueryListener``: a microbatch/checkpoint failure terminates the
query and arrives as ``onQueryTerminated(exception=...)``; liveness arrives
as progress events. ``StreamingHealthMonitor`` collects both so a harness
can do exactly what the reference's monitor thread does — fail fast on
root exceptions, and assert forward progress (the analogue of "no failed
checkpoints": every completed microbatch IS a committed checkpoint, so
progress with no terminal exception means checkpointing is healthy).
"""

from __future__ import annotations

import threading
import time

from pyspark.sql.streaming import StreamingQueryListener


class StreamingHealthMonitor(StreamingQueryListener):
    """Listener tracking per-query progress counts and terminal exceptions.

    Usage::

        mon = StreamingHealthMonitor()
        spark.streams.addListener(mon)
        q = df.writeStream...start()
        ...
        mon.assert_healthy()              # raises on any root exception
        assert mon.progress_count(q.runId) > 0  # checkpoints are committing

    Queries are keyed by runId (a restart from the same checkpoint keeps the
    query id but gets a fresh runId, and each incarnation must be trackable).

    Mirrors flink_job.rb:
    - ``failed`` ≡ the Ruby ``failed?`` (monitor observed a root exception),
    - ``assert_healthy`` ≡ the monitor loop's raise,
    - ``progress_count``/``last_progress_at`` ≡ the checkpoint-counts poll.
    """

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._progress: dict[str, int] = {}
        self._last_progress_at: dict[str, float] = {}
        self._exceptions: list[tuple[str, str]] = []  # (query_id, message)
        self._started: set[str] = set()
        self._terminated: set[str] = set()

    # -- StreamingQueryListener callbacks (called from Spark's event bus) ----

    def onQueryStarted(self, event) -> None:
        with self._lock:
            self._started.add(str(event.runId))

    def onQueryProgress(self, event) -> None:
        qid = str(event.progress.runId)
        with self._lock:
            self._progress[qid] = self._progress.get(qid, 0) + 1
            self._last_progress_at[qid] = time.time()

    def onQueryIdle(self, event) -> None:  # Spark 3.5+: liveness without data
        qid = str(event.runId)
        with self._lock:
            self._last_progress_at[qid] = time.time()

    def onQueryTerminated(self, event) -> None:
        qid = str(event.runId)
        with self._lock:
            self._terminated.add(qid)
            if event.exception is not None:
                self._exceptions.append((qid, str(event.exception)))

    # -- monitor surface (flink_job.rb parity) -------------------------------

    @property
    def failed(self) -> bool:
        """True iff any monitored query died with a root exception."""
        with self._lock:
            return bool(self._exceptions)

    @property
    def exceptions(self) -> list[tuple[str, str]]:
        with self._lock:
            return list(self._exceptions)

    def assert_healthy(self) -> None:
        """Raise (like the reference monitor thread) on any root exception."""
        with self._lock:
            if self._exceptions:
                qid, msg = self._exceptions[0]
                raise RuntimeError(
                    f"streaming query {qid} failed: {msg}"
                    + (f" (+{len(self._exceptions) - 1} more)"
                       if len(self._exceptions) > 1 else "")
                )

    def progress_count(self, query_id) -> int:
        """Committed-microbatch count for a query (0 if none observed)."""
        with self._lock:
            return self._progress.get(str(query_id), 0)

    def last_progress_at(self, query_id) -> float | None:
        with self._lock:
            return self._last_progress_at.get(str(query_id))

    def clean_stop(self, query_id) -> bool:
        """True iff the query terminated without an exception."""
        qid = str(query_id)
        with self._lock:
            return qid in self._terminated and all(
                e[0] != qid for e in self._exceptions
            )
