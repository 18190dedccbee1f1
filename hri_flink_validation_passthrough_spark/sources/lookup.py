"""BatchLookup — the external point lookup (SURVEY.md §2A op 7).

Reference surface: ``BatchLookup.getBatchId(tenantId, batchId) →
Try<BatchNotification>`` (MapBatchLookupJava.java:35-44), injected into the
job (PassthroughStreamingJob.java:29, 98). In mgmt mode the lookup hits the
Management API with an OAuth client-credentials token
(PassthroughStreamingJob.java:72-86); on cache miss only — results are
cached per key inside the stateful operator's state, so the external store
sees at most one request per unknown batchId per partition.

stdlib-only (urllib): no extra deps. The lookup callable signature the state
machine consumes is ``lookup(batch_id) → notification dict | None``.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.parse
import urllib.request


class MapBatchLookup:
    """In-memory lookup test double — mirror of MapBatchLookupJava.java."""

    def __init__(self, notifications: list[dict]):
        self._by_id = {n["id"]: n for n in notifications}
        self.calls = 0

    def __call__(self, batch_id: str) -> dict | None:
        self.calls += 1
        return self._by_id.get(batch_id)


class OAuthTokenProvider:
    """Client-credentials token with expiry-aware caching."""

    def __init__(
        self,
        oauth_url: str,
        client_id: str,
        client_secret: str,
        audience: str,
        timeout_s: float = 10.0,
    ):
        self.oauth_url = oauth_url.rstrip("/")
        self.client_id = client_id
        self.client_secret = client_secret
        self.audience = audience
        self.timeout_s = timeout_s
        self._token: str | None = None
        self._expiry: float = 0.0

    def token(self) -> str:
        if self._token is not None and time.time() < self._expiry - 60:
            return self._token
        body = urllib.parse.urlencode(
            {
                "grant_type": "client_credentials",
                "client_id": self.client_id,
                "client_secret": self.client_secret,
                "audience": self.audience,
            }
        ).encode()
        req = urllib.request.Request(
            f"{self.oauth_url}/token",
            data=body,
            headers={"Content-Type": "application/x-www-form-urlencoded"},
        )
        with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
            payload = json.loads(resp.read())
        self._token = payload["access_token"]
        self._expiry = time.time() + float(payload.get("expires_in", 300))
        return self._token


class MgmtApiBatchNotifier:
    """Op 16, mgmt mode: terminal batch transitions go through Management API
    PUTs (which owns the notification topic) instead of the job writing the
    topic directly (PassthroughStreamingJob.java:71-86, SURVEY.md §2A op 16).

    Endpoints follow the HRI Management API action shape:
    ``PUT <mgmt>/tenants/<t>/batches/<id>/action/processingComplete`` with
    ``{actualRecordCount, invalidRecordCount}`` and ``.../action/fail`` with
    a failure message.
    """

    def __init__(
        self,
        mgmt_url: str,
        tenant_id: str,
        token_provider: "OAuthTokenProvider | None" = None,
        timeout_s: float = 10.0,
    ):
        self.mgmt_url = mgmt_url.rstrip("/")
        self.tenant_id = tenant_id
        self.tokens = token_provider
        self.timeout_s = timeout_s

    def _put(self, batch_id: str, action: str, body: dict) -> None:
        url = (
            f"{self.mgmt_url}/tenants/{urllib.parse.quote(self.tenant_id)}"
            f"/batches/{urllib.parse.quote(str(batch_id))}/action/{action}"
        )
        headers = {"Content-Type": "application/json"}
        if self.tokens is not None:
            headers["Authorization"] = f"Bearer {self.tokens.token()}"
        req = urllib.request.Request(
            url, data=json.dumps(body).encode(), headers=headers, method="PUT"
        )
        with urllib.request.urlopen(req, timeout=self.timeout_s):
            pass

    def notify(self, notification: dict) -> None:
        """Dispatch one job-emitted terminal notification to the API."""
        status = notification.get("status")
        if status == "completed":
            self._put(
                notification["id"],
                "processingComplete",
                {
                    "actualRecordCount": notification.get("recordCount"),
                    "invalidRecordCount": notification.get("invalidRecordCount", 0),
                },
            )
        elif status == "failed":
            self._put(
                notification["id"],
                "fail",
                {
                    "actualRecordCount": notification.get("recordCount"),
                    "invalidRecordCount": notification.get("invalidRecordCount", 0),
                    "failureMessage": notification.get("failureMessage", "batch failed"),
                },
            )


class MgmtApiBatchLookup:
    """GET <mgmt-url>/tenants/<tenant>/batches/<batchId> with bearer auth.

    404 → None (the 'unknown batchId' path, op 6); transport errors raise so
    the stateful operator can retry on the next record rather than
    mis-classifying a live batch as unknown.

    Positive results are cached forever (a batch's identity never changes);
    404s are cached only for ``negative_ttl_s`` — a record can arrive BEFORE
    its batch is registered in the Management API, and a permanent negative
    cache would poison that batchId as 'unknown' for the executor's lifetime
    (the reference lookup re-queries).
    """

    def __init__(
        self,
        mgmt_url: str,
        tenant_id: str,
        token_provider: OAuthTokenProvider | None = None,
        timeout_s: float = 10.0,
        negative_ttl_s: float = 30.0,
    ):
        self.mgmt_url = mgmt_url.rstrip("/")
        self.tenant_id = tenant_id
        self.tokens = token_provider
        self.timeout_s = timeout_s
        self.negative_ttl_s = negative_ttl_s
        self._cache: dict[str, dict] = {}
        self._neg_cache: dict[str, float] = {}  # batch_id → miss timestamp

    def __call__(self, batch_id: str) -> dict | None:
        if batch_id in self._cache:
            return self._cache[batch_id]
        miss_at = self._neg_cache.get(batch_id)
        if miss_at is not None:
            if time.time() - miss_at < self.negative_ttl_s:
                return None
            del self._neg_cache[batch_id]  # TTL elapsed → re-query
        url = (
            f"{self.mgmt_url}/tenants/{urllib.parse.quote(self.tenant_id)}"
            f"/batches/{urllib.parse.quote(str(batch_id))}"
        )
        headers = {}
        if self.tokens is not None:
            headers["Authorization"] = f"Bearer {self.tokens.token()}"
        req = urllib.request.Request(url, headers=headers)
        try:
            with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
                result = json.loads(resp.read())
        except urllib.error.HTTPError as e:
            if e.code == 404:
                self._neg_cache[batch_id] = time.time()
                return None
            raise
        self._cache[batch_id] = result
        return result
