"""HTML rendering of the weekly report (SURVEY §2 F12, S11 parity).

Presentation layer, outside the relational core: the reference formats an
HTML table row-per-region (dags/weekly_report.py:57-78) and POSTs it to
SendGrid (wk:90-109). Engine parity is producing the same HTML string from
the report DataFrame; actual e-mail delivery is out of engine scope
(SURVEY §2 S11).
"""

from __future__ import annotations

import html

from pyspark.sql import DataFrame

_HEADER = (
    "<tr>"
    "<th>Region</th><th>Top Category</th><th>Total Views</th>"
    "<th>Total Likes</th><th>Avg Engagement Ratio</th>"
    "</tr>"
)


def render_weekly_html(report: DataFrame, title: str = "Weekly Trending Report") -> str:
    """Collects the (tiny, one-row-per-region) report and renders a table."""
    rows = report.collect()
    body = "".join(
        "<tr>"
        + "".join(f"<td>{html.escape(str(v))}</td>" for v in row)
        + "</tr>"
        for row in rows
    )
    return (
        f"<html><body><h2>{html.escape(title)}</h2>"
        f"<table border='1'>{_HEADER}{body}</table></body></html>"
    )
