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

    The HTTP call itself stays injected — this container has no network
    and shipping a live client would be untestable here — but everything
    the reference encodes into the request (personalizations, sender,
    subject, text/html content type) is built and testable
    deterministically. A real deployment passes
    ``transport=lambda url, headers, body: requests.post(url,
    headers=headers, json=body, timeout=30).raise_for_status()``.
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
