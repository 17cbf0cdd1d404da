"""S3-API object-store control plane (SURVEY §2.1 S5/S6/S9/S10, object
side).

The reference manages its snapshot objects with a MinIO client:
bucket-ensure + CSV put (`core/data_extraction.py:140-172`), list /
sort-by-mtime / keep-newest-K delete (`core/airflow_dag.py:570-631`),
latest-object read (`core/train_katib.py:99-104`). This module is the
same control plane over the standard S3 API via boto3 (MinIO speaks S3,
so the identical calls run against MinIO, AWS, or an in-process moto
stub — which is how the tests exercise it without network).

Division of labor at 100 TB: bulk data moves through Spark's own
readers/writers (s3a:// paths — configuration surface in
`session.py`); THIS module only handles the object-level lifecycle the
reference scripts by hand (small artifacts, listings, retention), where
a driver-side loop over object names is the correct tool, not a
distributed job. Object counts here are O(snapshots kept), never O(data).

boto3 is an optional dependency: import errors surface only when the
client is actually requested, so the engine stays importable without it.
"""

from __future__ import annotations

import io
from typing import Any

import pandas as pd


def s3_client(
    endpoint_url: str | None = None,
    access_key: str | None = None,
    secret_key: str | None = None,
    region: str = "us-east-1",
) -> Any:
    """Build a boto3 S3 client. ``endpoint_url`` points at MinIO
    (reference config `storage.minio_endpoint`) or a test stub; None =
    AWS default resolution."""
    try:
        import boto3
    except ImportError as e:  # pragma: no cover - env without boto3
        raise ImportError("objectstore requires boto3") from e

    kwargs: dict[str, Any] = {"region_name": region}
    if endpoint_url:
        kwargs["endpoint_url"] = endpoint_url
    if access_key:
        kwargs["aws_access_key_id"] = access_key
        kwargs["aws_secret_access_key"] = secret_key
    return boto3.client("s3", **kwargs)


def ensure_bucket(client: Any, bucket: str) -> bool:
    """Create the bucket if missing (`core/data_extraction.py:155-158`);
    returns True if it was created."""
    try:
        client.head_bucket(Bucket=bucket)
        return False
    except Exception:
        client.create_bucket(Bucket=bucket)
        return True


def put_csv(client: Any, bucket: str, key: str, df: pd.DataFrame) -> int:
    """Upload a DataFrame as one CSV object (the reference's snapshot
    format, `core/data_extraction.py:160-171`); returns byte size."""
    body = df.to_csv(index=False).encode("utf-8")
    client.put_object(
        Bucket=bucket, Key=key, Body=io.BytesIO(body),
        ContentLength=len(body), ContentType="text/csv",
    )
    return len(body)


def get_csv(client: Any, bucket: str, key: str) -> pd.DataFrame:
    obj = client.get_object(Bucket=bucket, Key=key)
    return pd.read_csv(io.BytesIO(obj["Body"].read()))


def list_keys(client: Any, bucket: str, prefix: str) -> list[str]:
    """All object keys under a prefix, lexicographically ascending
    (paginated — a 10-year hourly feed exceeds one ListObjects page)."""
    out: list[str] = []
    paginator = client.get_paginator("list_objects_v2")
    for page in paginator.paginate(Bucket=bucket, Prefix=prefix):
        out.extend(o["Key"] for o in page.get("Contents", []))
    return sorted(out)


def latest_key(client: Any, bucket: str, prefix: str) -> str:
    """Newest object under a prefix by timestamped name
    (`core/train_katib.py:99-104` reads the newest snapshot; the
    fixed %Y%m%d_%H%M%S name format makes lexicographic == chronological,
    so this never depends on mtime clock skew)."""
    keys = list_keys(client, bucket, prefix)
    if not keys:
        raise FileNotFoundError(f"no objects under s3://{bucket}/{prefix}")
    return keys[-1]


def apply_object_retention(
    client: Any, bucket: str, prefix: str, keep: int = 10
) -> list[str]:
    """Keep the newest ``keep`` objects under the prefix, delete the rest
    (`core/airflow_dag.py:588-627`, keep_count=10). Sorted by key name
    rather than last_modified: with timestamped names the two agree, and
    name order is immune to re-upload mtime churn. Returns deleted keys."""
    keys = list_keys(client, bucket, prefix)
    doomed = keys[:-keep] if keep > 0 else keys
    for key in doomed:
        client.delete_object(Bucket=bucket, Key=key)
    return doomed


def cleanup_prefixes(
    client: Any, targets: list[tuple[str, str]], keep: int = 10
) -> int:
    """The reference's multi-prefix cleanup task
    (`core/airflow_dag.py:583-631`): run retention over each
    (bucket, prefix); missing buckets are skipped, not errors. Returns
    total objects deleted."""
    total = 0
    for bucket, prefix in targets:
        try:
            client.head_bucket(Bucket=bucket)
        except Exception:
            continue
        total += len(apply_object_retention(client, bucket, prefix, keep))
    return total
