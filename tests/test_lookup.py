"""BatchLookup client tests against a live in-process HTTP server (port of
MapBatchLookupJavaTest + the mgmt-mode lookup surface)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from hri_flink_validation_passthrough_spark.operators.batch_state import (
    BatchState,
    BatchStateMachine,
    Outputs,
)
from hri_flink_validation_passthrough_spark.sources.lookup import (
    MapBatchLookup,
    MgmtApiBatchLookup,
    OAuthTokenProvider,
)

BATCH = {"id": "batch-42", "status": "started", "name": "n"}


class _Handler(BaseHTTPRequestHandler):
    tokens_issued = 0
    puts: list = []

    def do_POST(self):  # oauth token endpoint
        type(self).tokens_issued += 1
        body = json.dumps({"access_token": "tok-123", "expires_in": 300}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(body)

    def do_PUT(self):  # mgmt batch action endpoint (op 16)
        assert self.headers.get("Authorization") == "Bearer tok-123"
        n = int(self.headers.get("Content-Length", 0))
        type(self).puts.append((self.path, json.loads(self.rfile.read(n))))
        self.send_response(200)
        self.end_headers()

    late_registered = False  # flips on when 'late-batch' becomes known

    def do_GET(self):  # mgmt batches endpoint
        assert self.headers.get("Authorization") == "Bearer tok-123"
        if self.path.endswith("/batches/late-batch") and type(self).late_registered:
            body = json.dumps({**BATCH, "id": "late-batch"}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body)
        elif self.path.endswith("/batches/batch-42"):
            body = json.dumps(BATCH).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body)
        else:
            self.send_error(404)

    def log_message(self, *a):
        pass


@pytest.fixture()
def server():
    httpd = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_port}"
    httpd.shutdown()


def test_mgmt_lookup_hit_miss_and_cache(server):
    tokens = OAuthTokenProvider(server, "cid", "secret", "aud")
    lk = MgmtApiBatchLookup(server, "porcupine", tokens)
    assert lk("batch-42") == BATCH
    assert lk("nope") is None
    # cached: no extra token fetches on repeat calls
    before = _Handler.tokens_issued
    assert lk("batch-42") == BATCH and lk("nope") is None
    assert _Handler.tokens_issued == before


def test_mgmt_lookup_negative_cache_expires(server, monkeypatch):
    """A 404 must not poison the batchId forever: a record can arrive before
    its batch is registered; after the negative TTL the lookup re-queries."""
    tokens = OAuthTokenProvider(server, "cid", "secret", "aud")
    lk = MgmtApiBatchLookup(server, "porcupine", tokens, negative_ttl_s=30.0)
    calls = {"n": 0}
    real_urlopen = __import__("urllib.request", fromlist=["urlopen"]).urlopen

    def counting_urlopen(req, timeout=None):
        calls["n"] += 1
        return real_urlopen(req, timeout=timeout)

    import hri_flink_validation_passthrough_spark.sources.lookup as lookup_mod

    monkeypatch.setattr(lookup_mod.urllib.request, "urlopen", counting_urlopen)
    assert lk("late-batch") is None  # 404 → negative-cached
    n_after_first = calls["n"]
    assert lk("late-batch") is None  # within TTL → no new request
    assert calls["n"] == n_after_first
    # simulate TTL expiry, then the lookup re-queries (batch now registered)
    lk._neg_cache["late-batch"] -= 31.0
    _Handler.late_registered = True
    try:
        assert lk("late-batch") is not None  # re-queried and found
    finally:
        _Handler.late_registered = False
    assert calls["n"] > n_after_first
    # positive result is now permanent
    n = calls["n"]
    assert lk("late-batch") is not None
    assert calls["n"] == n


def test_jaas_password_escaping():
    from hri_flink_validation_passthrough_spark.sources.kafka import (
        kafka_security_options,
    )

    jaas = kafka_security_options('p"w\\d;x')["kafka.sasl.jaas.config"]
    # the quote and backslash are escaped; the literal `";` terminator appears
    # exactly once (config cannot be truncated/injected mid-password)
    assert 'password="p\\"w\\\\d;x";' in jaas


def test_lookup_wired_into_state_machine(server):
    tokens = OAuthTokenProvider(server, "cid", "secret", "aud")
    lk = MgmtApiBatchLookup(server, "porcupine", tokens)
    m = BatchStateMachine(5000, lookup=lk)
    st = BatchState(batch_id="batch-42")
    out = Outputs()
    out.extend(m.on_data(st, b"k", b"v", [], 10))
    # lookup resolved the unknown batch → record routed to .out, counted
    assert [r.dest for r in out.routed] == ["out"] and st.processed == 1

    st2 = BatchState(batch_id="ghost")
    out2 = Outputs()
    out2.extend(m.on_data(st2, b"k", b"v", [], 10))
    assert [r.dest for r in out2.routed] == ["invalid"]  # 404 → unknown


def test_mgmt_notifier_puts_terminal_transitions(server):
    from hri_flink_validation_passthrough_spark.sources.lookup import MgmtApiBatchNotifier

    tokens = OAuthTokenProvider(server, "cid", "secret", "aud")
    notifier = MgmtApiBatchNotifier(server, "porcupine", tokens)
    _Handler.puts.clear()
    notifier.notify({"id": "batch-42", "status": "completed", "recordCount": 15})
    notifier.notify({"id": "batch-43", "status": "failed", "recordCount": 17})
    notifier.notify({"id": "batch-44", "status": "started"})  # non-terminal: no PUT
    paths = [p for p, _ in _Handler.puts]
    assert paths == [
        "/tenants/porcupine/batches/batch-42/action/processingComplete",
        "/tenants/porcupine/batches/batch-43/action/fail",
    ]
    assert _Handler.puts[0][1]["actualRecordCount"] == 15
    assert "failureMessage" in _Handler.puts[1][1]


def test_map_lookup_double():
    lk = MapBatchLookup([BATCH])
    assert lk("batch-42") == BATCH and lk("x") is None and lk.calls == 2


class _MgmtApiWithNotificationTopic(BaseHTTPRequestHandler):
    """Fake Management API that OWNS the notification topic (SURVEY §2C.3):
    batch create/update by the data integrator produce the `started` /
    `sendCompleted` echoes; the job only PUTs terminal actions, which the
    API turns into the terminal notification."""

    notification_log: list = []

    def _ok(self):
        self.send_response(200)
        self.end_headers()

    def do_POST(self):
        log = type(self).notification_log
        if self.path.endswith("/batches"):  # integrator creates the batch
            n = int(self.headers.get("Content-Length", 0))
            batch = json.loads(self.rfile.read(n))
            log.append({"id": batch["id"], "status": "started"})
        self._ok()

    def do_PUT(self):
        log = type(self).notification_log
        batch_id = self.path.split("/batches/")[1].split("/")[0]
        if self.path.endswith("/action/sendComplete"):  # integrator update
            log.append({"id": batch_id, "status": "sendCompleted"})
        elif self.path.endswith("/action/processingComplete"):  # the JOB
            log.append({"id": batch_id, "status": "completed"})
        elif self.path.endswith("/action/fail"):  # the JOB
            log.append({"id": batch_id, "status": "failed"})
        self._ok()

    def log_message(self, *a):
        pass


@pytest.fixture()
def mgmt_api():
    _MgmtApiWithNotificationTopic.notification_log = []
    httpd = HTTPServer(("127.0.0.1", 0), _MgmtApiWithNotificationTopic)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_port}"
    httpd.shutdown()


def test_mgmt_mode_notification_sequence_includes_nonterminal_echoes(mgmt_api):
    """§2C.3 ownership split, driven e2e against the fake Management API:
    in mgmt mode the API emits `started`/`sendCompleted` when the data
    integrator creates/updates the batch (reference:
    flink_validation_passthrough_spec.rb:116-131), and the job adds ONLY the
    terminal transition via MgmtApiBatchNotifier — yet notification-topic
    consumers still observe the full ordered status sequence."""
    import urllib.request

    from hri_flink_validation_passthrough_spark.sources.lookup import (
        MgmtApiBatchNotifier,
    )

    # --- data integrator's side (owned by the Management API) ---
    def integrator_call(method, path, body):
        req = urllib.request.Request(
            f"{mgmt_api}{path}", data=json.dumps(body).encode(), method=method
        )
        urllib.request.urlopen(req, timeout=5).close()

    integrator_call("POST", "/tenants/porcupine/batches", {"id": "batch-7"})
    integrator_call(
        "PUT",
        "/tenants/porcupine/batches/batch-7/action/sendComplete",
        {"expectedRecordCount": 15},
    )

    # --- the job's side: terminal transition only ---
    notifier = MgmtApiBatchNotifier(mgmt_api, "porcupine")
    notifier.notify({"id": "batch-7", "status": "started"})  # echo NOT re-sent
    notifier.notify({"id": "batch-7", "status": "sendCompleted"})  # ditto
    notifier.notify(
        {"id": "batch-7", "status": "completed", "recordCount": 15}
    )

    assert [(n["id"], n["status"]) for n in
            _MgmtApiWithNotificationTopic.notification_log] == [
        ("batch-7", "started"),
        ("batch-7", "sendCompleted"),
        ("batch-7", "completed"),
    ], "consumers must see the full ordered sequence with exactly one writer per status"
