"""Multimodal binary-column plumbing tests (E5): payload attach,
metadata extraction, frame sampling, and the honest decode stub."""

from __future__ import annotations

import hashlib

import pytest

from loan_etl_data_pipeline_spark.operators.multimodal import (
    attach_binary_payload,
    decode_stub,
    extract_media_meta,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [(1, "a" * 700), (2, "xyz"), (3, "b" * 260)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return attach_binary_payload(docs)


def test_payload_and_meta(media):
    meta = {r["media_id"]: r for r in extract_media_meta(media).collect()}
    assert meta[1]["byte_size"] == 700
    assert meta[2]["sha256"] == hashlib.sha256(b"xyz").hexdigest()


def test_sample_frames_stride_and_cap(media):
    out = sample_frames(media, frame_size=64, every_k=4, max_frames=2)
    rows = sorted((r["media_id"], r["frame_no"]) for r in out.collect())
    # media 1: 700//64 = 10 frames -> every 4th = frames 0,4,8 -> capped to 2
    # media 2: tiny payload -> 1 frame (frame 0)
    # media 3: 260//64 = 4 frames -> frames 0 (then 4 out of range of stride list)
    assert rows == [(1, 0), (1, 4), (2, 0), (3, 0)]
    frame = next(
        bytes(r["frame"]) for r in out.collect()
        if r["media_id"] == 1 and r["frame_no"] == 4
    )
    assert frame == b"a" * 64


def test_decode_stub_fake_path(media):
    got = {r["media_id"]: r for r in decode_stub(media).collect()}
    assert got[2]["decoded_header"] == b"xyz".hex()
    assert got[1]["n_bytes"] == 700


def test_decode_stub_real_path_raises(media):
    with pytest.raises(Exception, match="NotImplementedError|media decode"):
        decode_stub(media, fake=False).collect()
