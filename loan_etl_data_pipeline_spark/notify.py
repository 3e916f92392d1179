"""Pipeline-completion notification utility (reference operator S10).

The reference sends an HTML summary email after each processed file:
subject with the filename, a table of file size / row count, presigned
download links, and the gzip'd file attached when under a 22 MB cutoff
(reference: airflow/dags/drive_watch_dag.py:214-288, cutoff :25).

SMTP itself is deployment plumbing, not engine semantics, so the sink is
pluggable: :func:`build_notification` produces the complete message
(subject + text + html + attachment decisions) as data, and
:class:`Notifier` hands it to whatever ``send`` callable the deployment
wires in (smtplib, an HTTP webhook, a Slack-style poster, a test stub).
The streaming path's per-batch callback (streaming/ingest.py on_batch)
can call ``notifier.notify`` directly.
"""

from __future__ import annotations

import html
import os
from collections.abc import Callable
from dataclasses import dataclass, field

#: Attachment cutoff, bytes (reference: airflow/dags/drive_watch_dag.py:25).
MAX_ATTACH_BYTES = 22 * 1024 * 1024


def _fmt_bytes(n: int) -> str:
    size = float(n)
    for unit in ("B", "KB", "MB", "GB", "TB"):
        if size < 1024 or unit == "TB":
            return f"{size:.1f} {unit}" if unit != "B" else f"{int(size)} B"
        size /= 1024
    return f"{size:.1f} TB"


@dataclass
class FileReport:
    """One processed input: what the reference's email table shows per file."""

    name: str
    size_bytes: int = 0
    row_count: int | None = None
    link: str | None = None
    path: str | None = None  # local path, for the attachment decision

    @classmethod
    def from_path(cls, path: str, *, row_count: int | None = None,
                  link: str | None = None) -> "FileReport":
        return cls(
            name=os.path.basename(path),
            size_bytes=os.path.getsize(path) if os.path.exists(path) else 0,
            row_count=row_count,
            link=link,
            path=path,
        )


def build_notification(
    files: list[FileReport],
    insights: dict | None = None,
    *,
    subject_prefix: str = "ETL complete",
    max_attach_bytes: int = MAX_ATTACH_BYTES,
) -> dict:
    """Render the summary message as plain data.

    Returns ``{"subject", "text", "html", "attachments", "skipped_attachments"}``
    — attachments are the file paths under the size cutoff (reference
    attaches the gzip'd source when small enough,
    reference: airflow/dags/drive_watch_dag.py:255-264).
    """
    names = ", ".join(f.name for f in files) or "no files"
    subject = f"{subject_prefix}: {names}"

    lines = []
    rows_html = []
    for f in files:
        row_s = "-" if f.row_count is None else f"{f.row_count:,}"
        lines.append(f"- {f.name}: {_fmt_bytes(f.size_bytes)}, rows: {row_s}")
        link_html = (
            f'<a href="{html.escape(f.link, quote=True)}">download</a>' if f.link else ""
        )
        rows_html.append(
            f"<tr><td>{html.escape(f.name)}</td><td>{_fmt_bytes(f.size_bytes)}</td>"
            f"<td>{row_s}</td><td>{link_html}</td></tr>"
        )
    if insights:
        lines.append("")
        lines.append("Insights:")
        for k, v in insights.items():
            lines.append(f"  {k}: {v}")

    insights_html = ""
    if insights:
        items = "".join(
            f"<li><b>{html.escape(str(k))}</b>: {html.escape(str(v))}</li>"
            for k, v in insights.items()
        )
        insights_html = f"<h3>Insights</h3><ul>{items}</ul>"

    html_body = (
        "<html><body><h2>{}</h2>"
        "<table border='1' cellpadding='4'>"
        "<tr><th>file</th><th>size</th><th>rows</th><th>link</th></tr>"
        "{}</table>{}</body></html>"
    ).format(html.escape(subject), "".join(rows_html), insights_html)

    attachments, skipped = [], []
    for f in files:
        if f.path and 0 < f.size_bytes <= max_attach_bytes:
            attachments.append(f.path)
        elif f.path:
            skipped.append(f.path)
    return {
        "subject": subject,
        "text": "\n".join(lines),
        "html": html_body,
        "attachments": attachments,
        "skipped_attachments": skipped,
    }


@dataclass
class Notifier:
    """Notification sink with a pluggable transport.

    ``send`` receives the message dict from :func:`build_notification`;
    the default records messages on ``sent`` (useful for tests and as a
    no-op placeholder — the sandbox has no SMTP). A deployment wires in
    e.g. ``lambda msg: smtp_send(to, msg)``.
    """

    send: Callable[[dict], None] | None = None
    subject_prefix: str = "ETL complete"
    sent: list = field(default_factory=list)

    def notify(self, files: list[FileReport], insights: dict | None = None) -> dict:
        msg = build_notification(
            files, insights, subject_prefix=self.subject_prefix
        )
        (self.send or self.sent.append)(msg)
        return msg
