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
