"""Presigned object-store URLs (Part A S9 — reference parity).

The reference emails its recipients a time-limited download link to the
uploaded report (reference: airflow/dags/drive_watch_dag.py:189-197,
boto3 ``generate_presigned_url`` against MinIO). That is the one
reference component SURVEY.md §2 had left as out-of-engine; it turns
out to be in-engine after all, because presigning is PURE CLIENT-SIDE
math: SigV4 canonicalizes the request and HMAC-signs it with the
secret key — no network round-trip, no store connection. The store
only checks the signature when someone dereferences the URL.

Reuses the exact configuration contract as the S3A sink
(session.py s3a_conf_map): one ``s3a`` dict configures BOTH the
cluster-side parquet writes and the driver-side link generation, so
the two can never drift apart.
"""

from __future__ import annotations


def _boto_client(s3a: dict):
    import boto3

    return boto3.client(
        "s3",
        endpoint_url=s3a["endpoint"],
        aws_access_key_id=s3a.get("access_key", ""),
        aws_secret_access_key=s3a.get("secret_key", ""),
        config=boto3.session.Config(
            signature_version="s3v4",
            s3={
                "addressing_style": "path"
                if s3a.get("path_style", True)
                else "virtual"
            },
        ),
        region_name=s3a.get("region", "us-east-1"),
    )


def presigned_get_url(
    s3a: dict, bucket: str, key: str, *, expires_s: int = 3600
) -> str:
    """Time-limited GET URL for ``s3a://bucket/key`` — the link the
    notification sink (notify.py) embeds instead of a >22 MB
    attachment (the reference's cutoff). Client-side signing only;
    works offline and against any S3-protocol store (AWS, MinIO,
    moto) the same way.
    """
    if expires_s < 1:
        raise ValueError(f"expires_s must be >= 1, got {expires_s}")
    return _boto_client(s3a).generate_presigned_url(
        "get_object",
        Params={"Bucket": bucket, "Key": key},
        ExpiresIn=expires_s,
    )


def presigned_put_url(
    s3a: dict, bucket: str, key: str, *, expires_s: int = 3600
) -> str:
    """Time-limited PUT URL — the upload-side twin (lets an external
    producer drop a file into the landing prefix the streaming ingest
    polls, without holding store credentials)."""
    if expires_s < 1:
        raise ValueError(f"expires_s must be >= 1, got {expires_s}")
    return _boto_client(s3a).generate_presigned_url(
        "put_object",
        Params={"Bucket": bucket, "Key": key},
        ExpiresIn=expires_s,
    )
