"""Report delivery seam (SURVEY §2 S11).

The reference POSTs the rendered weekly HTML to SendGrid
(dags/weekly_report.py:90-109: build Mail(subject, html), client.send).
Network delivery stays out of engine scope, but — like ingestion
(sources/fetchers.py) — the *seam* belongs to the engine:
``run_weekly_report`` accepts any ``ReportSender``, so the reference's
e-mail step maps onto an injection point instead of being dropped.

The default ``FileReportSender`` writes each report to a local audit
directory (what a lakehouse deployment does anyway alongside e-mail); a
production SendGrid/SES sender implements the same one-method protocol.
"""

from __future__ import annotations

import pathlib
import re
from collections.abc import Sequence
from typing import Protocol


class ReportSender(Protocol):
    """One send per report: subject, rendered HTML, recipient list —
    exactly the payload the reference hands to SendGrid (wk:90-109)."""

    def send(self, subject: str, html: str, recipients: Sequence[str]) -> None:
        ...


class FileReportSender:
    """Audit-trail sender: persists the HTML under ``out_dir`` with a
    filename slug derived from the subject. Deterministic, idempotent
    (same subject overwrites), no network."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir

    def send(self, subject: str, html: str, recipients: Sequence[str]) -> None:
        slug = re.sub(r"[^a-zA-Z0-9]+", "-", subject).strip("-").lower()
        path = pathlib.Path(self.out_dir)
        path.mkdir(parents=True, exist_ok=True)
        (path / f"{slug}.html").write_text(html)


class SendGridShapedSender:
    """Production-shaped e-mail sender: builds the exact SendGrid v3
    ``POST /v3/mail/send`` request body the reference constructs
    (dags/weekly_report.py:90-109 builds Mail(from, to, subject,
    html_content) and calls client.send) and hands it to an injectable
    ``transport`` callable ``(url, headers, json_body) -> None``.

    The HTTP call is injected; everything the reference encodes into the
    request (personalizations, sender, subject, text/html content type)
    is built and testable deterministically. Pass
    :class:`UrllibJsonTransport` (below) for a REAL stdlib network
    transport — driven end-to-end against a loopback HTTP server in
    tests/test_http_integrations.py — or any callable
    ``(url, headers, json_body) -> None``.
    """

    URL = "https://api.sendgrid.com/v3/mail/send"

    def __init__(self, api_key: str, from_email: str, transport):
        self.api_key = api_key
        self.from_email = from_email
        self.transport = transport

    def send(self, subject: str, html: str, recipients: Sequence[str]) -> None:
        body = {
            "personalizations": [
                {"to": [{"email": r} for r in recipients]}
            ],
            "from": {"email": self.from_email},
            "subject": subject,
            "content": [{"type": "text/html", "value": html}],
        }
        headers = {
            "Authorization": f"Bearer {self.api_key}",
            "Content-Type": "application/json",
        }
        self.transport(self.URL, headers, body)


class UrllibJsonTransport:
    """REAL network transport for SendGridShapedSender, stdlib-only: POST
    the JSON body with the given headers via urllib and raise unless the
    response status matches ``expect_status`` — the reference's
    'raise unless 202' contract (dags/weekly_report.py:93-109). Closes
    the round-5 'no HTTP transport' gap without adding dependencies;
    tested against an in-process loopback HTTP server
    (tests/test_http_integrations.py), pointed at the real SendGrid URL
    in production.

    Bounded retries with linear backoff mirror the reference's Airflow
    ``retries: 1 / retry_delay: 10`` task policy (ing:30, wk:13) at the
    request level; a non-retryable 4xx fails immediately."""

    def __init__(self, expect_status: int = 202, retries: int = 1,
                 backoff_s: float = 0.1):
        self.expect_status = expect_status
        self.retries = retries
        self.backoff_s = backoff_s

    def __call__(self, url: str, headers: dict, body: dict) -> None:
        import json as _json
        import time
        import urllib.error
        import urllib.request

        data = _json.dumps(body).encode("utf-8")
        last: Exception | None = None
        for attempt in range(self.retries + 1):
            req = urllib.request.Request(
                url, data=data, headers=headers, method="POST"
            )
            try:
                with urllib.request.urlopen(req, timeout=30) as resp:
                    if resp.status != self.expect_status:
                        raise RuntimeError(
                            f"report delivery returned {resp.status}, "
                            f"expected {self.expect_status}"
                        )
                    return
            except urllib.error.HTTPError as e:
                if 400 <= e.code < 500:  # not retryable
                    raise RuntimeError(
                        f"report delivery rejected: HTTP {e.code}"
                    ) from e
                last = e
            except urllib.error.URLError as e:
                last = e
            if attempt < self.retries:
                time.sleep(self.backoff_s * (attempt + 1))
        raise RuntimeError(f"report delivery failed after retries: {last}")
