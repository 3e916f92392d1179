"""Tests for the notification utility (reference operator S10 —
summary formatting, attachment cutoff, pluggable transport)."""

from __future__ import annotations

from loan_etl_data_pipeline_spark.notify import (
    MAX_ATTACH_BYTES,
    FileReport,
    Notifier,
    build_notification,
)


def test_build_notification_summary(tmp_path):
    p = tmp_path / "loans.csv"
    p.write_text("a,b\n1,2\n")
    msg = build_notification(
        [FileReport.from_path(str(p), row_count=1, link="https://x/loans.csv")],
        insights={"total_loans": 1},
    )
    assert msg["subject"] == "ETL complete: loans.csv"
    assert "loans.csv" in msg["text"] and "rows: 1" in msg["text"]
    assert "total_loans" in msg["text"]
    assert "<table" in msg["html"] and "https://x/loans.csv" in msg["html"]
    assert msg["attachments"] == [str(p)]


def test_attachment_cutoff(tmp_path):
    small = tmp_path / "small.gz"
    small.write_bytes(b"x" * 10)
    big = FileReport(name="big.gz", size_bytes=MAX_ATTACH_BYTES + 1, path="/tmp/big.gz")
    msg = build_notification([FileReport.from_path(str(small)), big])
    assert msg["attachments"] == [str(small)]
    assert msg["skipped_attachments"] == ["/tmp/big.gz"]


def test_html_escapes_untrusted_names():
    evil = FileReport(name="<script>alert(1)</script>.csv", size_bytes=5)
    msg = build_notification([evil])
    assert "<script>" not in msg["html"]


def test_notifier_default_records_and_custom_send(tmp_path):
    n = Notifier()
    msg = n.notify([FileReport(name="f.csv", size_bytes=1)])
    assert n.sent == [msg]

    got = []
    n2 = Notifier(send=got.append, subject_prefix="Stream batch done")
    m2 = n2.notify([FileReport(name="g.csv", size_bytes=2)], {"total_loans": 9})
    assert got == [m2] and n2.sent == []
    assert m2["subject"].startswith("Stream batch done")
