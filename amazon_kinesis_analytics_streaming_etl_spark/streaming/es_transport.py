"""Production Elasticsearch/OpenSearch transport: SigV4-signed ``_bulk``.

The reference signs every ES request with AWS Signature Version 4 via an
Apache-HC interceptor and ships documents through the REST bulk processor
(AmazonElasticsearchSink.java:70-104: ``AWSSigner`` +
``HTTPRequestInterceptor`` wired into the low-level rest client). This
module is the Spark-side analog behind the ``es_upsert_batch`` transport
seam (streaming/sinks.py): a callable ``transport(index, doc_id, body)``
that buffers keyed ``index`` actions and flushes them as one signed
``POST /_bulk``.

Pure standard library (hashlib / hmac / urllib) so it runs on any
executor without extra packages; the signing math is pinned in tests
against AWS's published SigV4 example vector. Retries 429/5xx with
exponential backoff (the bulk processor's backoff policy analog,
AmazonElasticsearchSink.java:96-101) and raises on per-item errors so a
failed micro-batch surfaces as a task failure -> Spark retry ->
idempotent re-upsert (doc id = trip_id, K4).
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import hmac
import json
import os
import threading
import time
import urllib.error
import urllib.parse
import urllib.request
from typing import Callable

__all__ = ["sign_request", "SigV4BulkTransport", "make_sigv4_transport"]


def _hmac(key: bytes, msg: str) -> bytes:
    return hmac.new(key, msg.encode("utf-8"), hashlib.sha256).digest()


def _canonical_query(query: str) -> str:
    """RFC-3986 canonical query string: sorted, each key/value URI-encoded."""
    pairs = urllib.parse.parse_qsl(query, keep_blank_values=True)
    enc = lambda s: urllib.parse.quote(s, safe="-_.~")  # noqa: E731
    return "&".join(f"{enc(k)}={enc(v)}" for k, v in sorted(pairs))


def sign_request(
    method: str,
    url: str,
    *,
    region: str,
    service: str,
    access_key: str,
    secret_key: str,
    session_token: str | None = None,
    headers: dict[str, str] | None = None,
    payload: bytes = b"",
    now: _dt.datetime | None = None,
    include_content_sha_header: bool = True,
) -> dict[str, str]:
    """Compute SigV4 headers for one HTTP request (AWS SigV4 spec, public).

    Returns the full header dict to send: caller headers + ``host``,
    ``x-amz-date``, ``x-amz-content-sha256``, optional
    ``x-amz-security-token``, and ``authorization``. Mirrors what the
    reference's ``AWSSigner`` interceptor stamps on each ES request
    (AmazonElasticsearchSink.java:70-84).

    ``now`` is injectable for deterministic tests.
    ``include_content_sha_header=False`` omits the (optional outside S3)
    ``x-amz-content-sha256`` header from the signed set — used by tests
    to reproduce AWS's published example vector byte-for-byte; the
    payload hash still forms the canonical request's last line per spec.
    """
    parts = urllib.parse.urlsplit(url)
    host = parts.netloc
    path = urllib.parse.quote(parts.path or "/", safe="/-_.~")
    t = now or _dt.datetime.now(_dt.timezone.utc)
    amz_date = t.strftime("%Y%m%dT%H%M%SZ")
    datestamp = t.strftime("%Y%m%d")
    payload_hash = hashlib.sha256(payload).hexdigest()

    all_headers = {k.lower(): v.strip() for k, v in (headers or {}).items()}
    all_headers["host"] = host
    all_headers["x-amz-date"] = amz_date
    if include_content_sha_header:
        all_headers["x-amz-content-sha256"] = payload_hash
    if session_token:
        all_headers["x-amz-security-token"] = session_token

    signed_names = sorted(all_headers)
    canonical_headers = "".join(f"{k}:{all_headers[k]}\n" for k in signed_names)
    signed_headers = ";".join(signed_names)
    canonical_request = "\n".join(
        [
            method.upper(),
            path,
            _canonical_query(parts.query),
            canonical_headers,
            signed_headers,
            payload_hash,
        ]
    )

    scope = f"{datestamp}/{region}/{service}/aws4_request"
    string_to_sign = "\n".join(
        [
            "AWS4-HMAC-SHA256",
            amz_date,
            scope,
            hashlib.sha256(canonical_request.encode("utf-8")).hexdigest(),
        ]
    )

    k_date = _hmac(("AWS4" + secret_key).encode("utf-8"), datestamp)
    k_region = _hmac(k_date, region)
    k_service = _hmac(k_region, service)
    k_signing = _hmac(k_service, "aws4_request")
    signature = hmac.new(
        k_signing, string_to_sign.encode("utf-8"), hashlib.sha256
    ).hexdigest()

    all_headers["authorization"] = (
        f"AWS4-HMAC-SHA256 Credential={access_key}/{scope}, "
        f"SignedHeaders={signed_headers}, Signature={signature}"
    )
    return all_headers


class SigV4BulkTransport:
    """Buffering ``transport(index, doc_id, body)`` that flushes signed
    ``_bulk`` requests — the production implementation of the
    ``es_upsert_batch`` seam.

    One instance per executor partition; ``es_upsert_batch`` calls
    ``flush()`` at partition end. ``http_send(url, data, headers) ->
    (status, response_body)`` is injectable for tests; the default uses
    ``urllib.request`` (stdlib — works on bare executors).
    """

    def __init__(
        self,
        endpoint: str,
        *,
        region: str,
        service: str = "es",
        access_key: str | None = None,
        secret_key: str | None = None,
        session_token: str | None = None,
        max_actions: int = 1000,
        max_size_mb: float | None = None,
        flush_interval_s: float | None = None,
        max_retries: int = 3,
        backoff_s: float = 1.0,
        http_send: Callable[[str, bytes, dict], tuple[int, bytes]] | None = None,
        sleep: Callable[[float], None] = time.sleep,
        clock: Callable[[], float] = time.monotonic,
        interval_timer: bool = False,
        timer_poll_s: float = 0.25,
    ) -> None:
        self.endpoint = endpoint.rstrip("/")
        self.region = region
        self.service = service
        self.access_key = access_key or os.environ.get("AWS_ACCESS_KEY_ID", "")
        self.secret_key = secret_key or os.environ.get("AWS_SECRET_ACCESS_KEY", "")
        self.session_token = session_token or os.environ.get("AWS_SESSION_TOKEN")
        if not self.access_key or not self.secret_key:
            raise RuntimeError(
                "SigV4BulkTransport needs AWS credentials (args or "
                "AWS_ACCESS_KEY_ID/AWS_SECRET_ACCESS_KEY env)"
            )
        self.max_actions = max_actions
        # the reference's other two bulk-flush triggers
        # (StreamingEtl.java:270-280): cumulative payload size and a wall
        # interval since the last flush — whichever fires first. The
        # interval fires two ways: on document ARRIVAL (always), and —
        # when ``interval_timer=True`` — from a background daemon thread
        # that flushes an idle buffer with no new input, Flink's
        # setBulkFlushInterval parity (ADVICE r6 / verdict r7 #7). The
        # arrival-only mode's staleness is still bounded because
        # es_upsert_batch calls flush() at the end of every micro-batch
        # partition, so a partial buffer lives at most one trigger.
        self.max_size_bytes = (
            int(max_size_mb * 1024 * 1024) if max_size_mb else None
        )
        self.flush_interval_s = flush_interval_s
        self.max_retries = max_retries
        self.backoff_s = backoff_s
        self._http_send = http_send or self._urllib_send
        self._sleep = sleep
        self._clock = clock
        self._buf: list[str] = []
        self._buf_bytes = 0
        self._last_flush = clock()
        # buffer + flush are guarded so the interval timer thread and the
        # partition's writer thread never interleave a half-appended doc
        self._lock = threading.RLock()
        self._stop = threading.Event()
        self._async_error: Exception | None = None
        self._timer: threading.Thread | None = None
        if interval_timer and flush_interval_s is not None:
            self._timer = threading.Thread(
                target=self._timer_loop,
                args=(timer_poll_s,),
                daemon=True,
                name="es-bulk-flush-timer",
            )
            self._timer.start()

    def _timer_loop(self, poll_s: float) -> None:
        while not self._stop.wait(poll_s):
            try:
                self._maybe_interval_flush()
            except Exception as exc:  # noqa: BLE001
                # flush() drops the buffer before sending, so a failed
                # timer flush has LOST those docs unless the failure is
                # surfaced to the task. The daemon can't raise into the
                # writer thread — poison the transport instead: the next
                # __call__/flush/close re-raises, the task fails, and
                # Spark retries the whole micro-batch (exactly-once via
                # the idempotent keyed upsert).
                self._async_error = exc
                return

    def _maybe_interval_flush(self) -> None:
        """One timer tick: flush iff the buffer is non-empty and the
        interval has elapsed since the last flush (exposed for tests —
        drive with a fake clock instead of racing the daemon)."""
        with self._lock:
            if (
                self._buf
                and self.flush_interval_s is not None
                and self._clock() - self._last_flush >= self.flush_interval_s
            ):
                self.flush()

    def close(self) -> None:
        """Stop the interval timer (if any) and flush the remainder."""
        self._stop.set()
        if self._timer is not None:
            self._timer.join(timeout=5)
            self._timer = None
        self.flush()

    @staticmethod
    def _urllib_send(url: str, data: bytes, headers: dict) -> tuple[int, bytes]:
        req = urllib.request.Request(url, data=data, headers=headers, method="POST")
        try:
            with urllib.request.urlopen(req, timeout=30) as resp:
                return resp.status, resp.read()
        except urllib.error.HTTPError as e:  # non-2xx still has a body
            return e.code, e.read()

    def _raise_async_error(self) -> None:
        if self._async_error is not None:
            exc, self._async_error = self._async_error, None
            raise RuntimeError("interval-timer bulk flush failed") from exc

    def __call__(self, index: str, doc_id: str, body: str) -> None:
        # bulk "index" action: create-or-replace by id == keyed upsert (K4)
        with self._lock:
            self._raise_async_error()
            action = json.dumps({"index": {"_index": index, "_id": doc_id}})
            self._buf.append(action)
            self._buf.append(body)
            self._buf_bytes += len(action) + len(body) + 2
            if (
                len(self._buf) >= 2 * self.max_actions
                or (
                    self.max_size_bytes is not None
                    and self._buf_bytes >= self.max_size_bytes
                )
                or (
                    self.flush_interval_s is not None
                    and self._clock() - self._last_flush >= self.flush_interval_s
                )
            ):
                self.flush()

    def flush(self) -> None:
        with self._lock:
            self._raise_async_error()
            self._flush_locked()

    def _flush_locked(self) -> None:
        self._last_flush = self._clock()
        if not self._buf:
            return
        payload = ("\n".join(self._buf) + "\n").encode("utf-8")
        self._buf = []
        self._buf_bytes = 0
        url = self.endpoint + "/_bulk"
        last = "no attempt"
        for attempt in range(self.max_retries + 1):
            headers = sign_request(
                "POST",
                url,
                region=self.region,
                service=self.service,
                access_key=self.access_key,
                secret_key=self.secret_key,
                session_token=self.session_token,
                headers={"content-type": "application/x-ndjson"},
                payload=payload,
            )
            status, resp_body = self._http_send(url, payload, headers)
            if 200 <= status < 300:
                resp = json.loads(resp_body)
                if resp.get("errors"):
                    failed = [
                        it["index"]
                        for it in resp.get("items", [])
                        if it.get("index", {}).get("status", 200) >= 300
                    ]
                    raise RuntimeError(f"_bulk item failures: {failed[:5]}")
                return
            if status == 429 or status >= 500:  # retryable, like the
                # reference's exponential-backoff bulk policy
                # (AmazonElasticsearchSink.java:96-101)
                last = f"HTTP {status}: {resp_body[:200]!r}"
                if attempt < self.max_retries:
                    self._sleep(self.backoff_s * (2**attempt))
                continue
            raise RuntimeError(f"_bulk failed (HTTP {status}): {resp_body[:500]!r}")
        raise RuntimeError(f"_bulk failed after {self.max_retries + 1} tries: {last}")


def make_sigv4_transport(endpoint: str, region: str, **kwargs) -> SigV4BulkTransport:
    """Factory used as the default production path by ``es_upsert_batch``.

    Constructed lazily *inside* ``foreachPartition`` so credentials are
    resolved on the executor (instance profile env, injected env vars).
    """
    return SigV4BulkTransport(endpoint, region=region, **kwargs)
