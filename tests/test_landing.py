"""Landing connector (sources/landing.py): poll/dedup/compress/sidecar
logic, pagination fix, and the Drive adapter against a fake service.

End of the chain is covered by tests/test_etl.py (run_etl over a landed
directory); here we prove the landing step itself.
"""

from __future__ import annotations

import gzip
import json
import os

from loan_etl_data_pipeline_spark.sources.landing import (
    GoogleDriveClient,
    LocalDirClient,
    land_new_files,
    list_all_files,
)


def _write(p, text):
    with open(p, "w") as f:
        f.write(text)


def test_land_new_files_once_only(tmp_path):
    src, dst = tmp_path / "src", tmp_path / "dst"
    src.mkdir()
    _write(src / "loans.csv", "loan_id,amount\n1,100\n2,200\n")
    _write(src / "notes.txt", "hello")

    client = LocalDirClient(str(src))
    metas = land_new_files(client, str(dst))
    assert sorted(m["name"] for m in metas) == ["loans.csv", "notes.txt"]
    by_name = {m["name"]: m for m in metas}
    assert by_name["loans.csv"]["rows"] == 2  # header excluded
    assert by_name["notes.txt"]["rows"] is None
    gz = by_name["loans.csv"]["compressed_path"]
    with gzip.open(gz, "rt") as f:
        assert f.read().startswith("loan_id")
    with open(dst / "latest_meta.json") as f:
        assert len(json.load(f)) == 2

    # second poll: nothing new
    assert land_new_files(client, str(dst)) == []

    # modified file counts as new (fresh identity), lands again
    _write(src / "loans.csv", "loan_id,amount\n1,100\n2,200\n3,300\n")
    metas = land_new_files(client, str(dst))
    assert [m["name"] for m in metas] == ["loans.csv"]
    assert metas[0]["rows"] == 3


def test_failed_fetch_is_retried(tmp_path):
    """Seen-state commits only after a successful landing (fixes the
    reference's sensor-side commit, google_drive_sensor.py:44-46)."""
    src, dst = tmp_path / "src", tmp_path / "dst"
    src.mkdir()
    _write(src / "a.csv", "x\n1\n")

    class Flaky(LocalDirClient):
        calls = 0

        def fetch(self, file_id, dest_path):
            Flaky.calls += 1
            if Flaky.calls == 1:
                raise OSError("transient")
            return super().fetch(file_id, dest_path)

    client = Flaky(str(src))
    try:
        land_new_files(client, str(dst))
    except OSError:
        pass
    metas = land_new_files(client, str(dst))  # retried, not lost
    assert [m["name"] for m in metas] == ["a.csv"]


def test_pagination_crosses_pages(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    for i in range(7):
        _write(src / f"f{i}.csv", "x\n1\n")
    client = LocalDirClient(str(src), page_size=3)
    assert len(list_all_files(client)) == 7  # 3 pages walked


class _FakeDriveService:
    """Shape-compatible stand-in for googleapiclient's Drive v3 service:
    two list pages (exercising the pageToken threading the reference
    lacks, gdrive_utils.py:17-22) and byte-returning get_media."""

    PAGES = {
        None: {
            "files": [{"id": "id1", "name": "a.csv", "mimeType": "text/csv", "size": 8}],
            "nextPageToken": "p2",
        },
        "p2": {"files": [{"id": "id2", "name": "b.csv", "mimeType": "text/csv", "size": 8}]},
    }
    CONTENT = {"id1": b"x\n1\n", "id2": b"x\n2\n"}

    class _Call:
        def __init__(self, result):
            self._result = result

        def execute(self):
            return self._result

    class _Files:
        def list(self, q=None, fields=None, pageToken=None):
            assert "in parents and trashed=false" in q
            return _FakeDriveService._Call(_FakeDriveService.PAGES[pageToken])

        def get_media(self, fileId=None):
            return _FakeDriveService._Call(_FakeDriveService.CONTENT[fileId])

    def files(self):
        return self._Files()


def test_google_drive_client_with_fake_service(tmp_path):
    client = GoogleDriveClient(_FakeDriveService(), folder_id="folder123")
    metas = land_new_files(client, str(tmp_path / "dst"))
    assert sorted(m["file_id"] for m in metas) == ["id1", "id2"]  # both pages
    assert all(m["rows"] == 1 for m in metas)
