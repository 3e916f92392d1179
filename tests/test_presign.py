"""Presigned URLs (sources/presign.py — Part A S9, reference
drive_watch_dag.py:189-197): signing is offline client-side math, so
the full contract is testable in-sandbox — including an end-to-end
dereference against a live S3 API (moto), which the reference itself
never tested."""

from __future__ import annotations

import pytest

from loan_etl_data_pipeline_spark.sources.presign import (
    presigned_get_url,
    presigned_put_url,
)

S3A = {
    "endpoint": "http://127.0.0.1:9",
    "access_key": "ak",
    "secret_key": "sk",
}


def test_signing_is_offline_and_sigv4_shaped():
    """No store anywhere near this endpoint — the URL must still be
    produced (presigning never dials), carrying the SigV4 query
    elements and the path-style object path."""
    url = presigned_get_url(S3A, "reports", "out/insights.json", expires_s=60)
    assert url.startswith("http://127.0.0.1:9/reports/out/insights.json?")
    for param in ("X-Amz-Signature=", "X-Amz-Expires=60", "X-Amz-Credential=ak"):
        assert param in url, url


def test_expiry_validation():
    with pytest.raises(ValueError):
        presigned_get_url(S3A, "b", "k", expires_s=0)


def test_presigned_roundtrip_against_live_store():
    """put via presigned PUT, read back via presigned GET, pure HTTP —
    no credentials at the dereferencing side, exactly the email-link
    contract."""
    pytest.importorskip("moto")
    import urllib.request

    from moto.server import ThreadedMotoServer

    server = ThreadedMotoServer(port=0, verbose=False)
    server.start()
    try:
        host, port = server.get_host_and_port()
        s3a = {
            "endpoint": f"http://{host}:{port}",
            "access_key": "graft-ak",
            "secret_key": "graft-sk",
        }
        from loan_etl_data_pipeline_spark.sources.presign import _boto_client

        _boto_client(s3a).create_bucket(Bucket="reports")

        put_url = presigned_put_url(s3a, "reports", "insights.json")
        body = b'{"total_loans": 6}'
        # http.client, not urllib: urllib.request's PUT body is dropped
        # somewhere between it and werkzeug (moto stores 0 bytes with a
        # 200 — observed), while an explicit Content-Length PUT lands
        import http.client
        import urllib.parse

        u = urllib.parse.urlsplit(put_url)
        conn = http.client.HTTPConnection(u.hostname, u.port)
        conn.request(
            "PUT",
            f"{u.path}?{u.query}",
            body=body,
            headers={"Content-Length": str(len(body))},
        )
        assert conn.getresponse().status == 200
        conn.close()

        get_url = presigned_get_url(s3a, "reports", "insights.json")
        with urllib.request.urlopen(get_url) as resp:
            assert resp.read() == body
        # (no tamper-rejection assertion: moto's default auth is
        # permissive and accepts invalid signatures — signature
        # PRODUCTION is pinned by the offline SigV4-shape test above;
        # enforcement is the store's side of the protocol)
    finally:
        server.stop()
