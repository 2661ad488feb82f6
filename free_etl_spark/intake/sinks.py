"""Output sinks: key sanitization, session prefixes, S3 upload,
manifest, ZIP bundle (SURVEY.md §2A ops #18-24; reference:
streamlit_app.py:76, 92-130, 280-349).

The S3 sink keeps the reference's per-file error isolation (one
failed upload never aborts the batch) and best-effort manifest. An
injectable ``put`` callable lets tests use a local filesystem stand-in
with the same key layout.
"""

from __future__ import annotations

import io
import json
import re
import uuid
import zipfile
from collections.abc import Callable
from datetime import datetime, timezone

from free_etl_spark.intake.config import AppConfig
from free_etl_spark.intake.validate import FileCheck

SAFE_CHAR_RE = re.compile(r"[^A-Za-z0-9._-]")  # reference: streamlit_app.py:76


def sanitize_stem(original_name: str) -> str:
    """Drop the extension, replace unsafe chars with "_"
    (streamlit_app.py:114-117, 342)."""
    stem = original_name.rsplit(".", 1)[0]
    return SAFE_CHAR_RE.sub("_", stem)


def s3_key_for(cfg: AppConfig, session_prefix: str, original_name: str) -> str:
    """{prefix}/{session}/{safe_stem}.csv (streamlit_app.py:114-117)."""
    return f"{cfg.s3_prefix}/{session_prefix}/{sanitize_stem(original_name)}.csv"


def new_session_prefix(now: datetime | None = None) -> str:
    """uploads/{UTC %Y%m%d_%H%M%S}_{uuid4 hex[:8]} — one namespace per
    submitted batch (streamlit_app.py:92-94)."""
    now = now or datetime.now(timezone.utc)
    return f"uploads/{now.strftime('%Y%m%d_%H%M%S')}_{uuid.uuid4().hex[:8]}"


def explain_boto_error(e: Exception) -> str:
    """Map S3 client errors to operator-readable messages
    (streamlit_app.py:119-130)."""
    msg = str(e)
    if "AccessDenied" in msg:
        return "Access denied for the provided IAM credentials on this bucket/prefix."
    if "NoSuchBucket" in msg:
        return "Bucket not found. Check `[aws].bucket`."
    if "EndpointConnectionError" in msg:
        return "Network/endpoint error reaching S3. Check region or network."
    if "InvalidAccessKeyId" in msg or "SignatureDoesNotMatch" in msg:
        return "Invalid AWS keys. Verify `access_key_id` / `secret_access_key`."
    return f"S3 error: {msg}"


def probe_s3(cfg: AppConfig, client) -> str | None:
    """S3 connection test (§2A op #20; streamlit_app.py:220-228): the
    minimal list call that needs no permission beyond list —
    ``list_objects_v2(Bucket, Prefix, MaxKeys=1)``. Returns None on
    success, or the operator-readable message from
    ``explain_boto_error`` on failure (the reference renders exactly
    these two outcomes and never raises)."""
    try:
        client.list_objects_v2(
            Bucket=cfg.s3_bucket, Prefix=cfg.s3_prefix, MaxKeys=1
        )
        return None
    except Exception as e:
        return explain_boto_error(e)


def s3_put_fn(cfg: AppConfig, secrets: dict) -> Callable[[str, bytes, str], None]:
    """Build a put(key, body, content_type) backed by boto3. Lazy
    import so a missing boto3 degrades to offline mode instead of
    crashing (streamlit_app.py:21-22, 96-112)."""
    try:
        import boto3  # noqa: PLC0415
    except Exception as e:  # pragma: no cover
        raise RuntimeError("boto3 not installed or failed to import") from e
    aws = secrets["aws"]
    # endpoint_url: LocalStack / minio / on-prem S3-compatible stores
    # (and the in-process wire test, tests/test_s3_wire.py). Absent →
    # real AWS, exactly the reference's behavior. Path-style
    # addressing because custom endpoints rarely resolve
    # bucket-subdomain virtual hosting.
    client_kwargs: dict = {}
    if aws.get("endpoint_url"):
        from botocore.config import Config  # noqa: PLC0415

        client_kwargs = {
            "endpoint_url": aws["endpoint_url"],
            "config": Config(
                s3={"addressing_style": "path"},
                retries={"max_attempts": 1},
                request_checksum_calculation="when_required",
            ),
        }
    client = boto3.Session(
        aws_access_key_id=aws["access_key_id"],
        aws_secret_access_key=aws["secret_access_key"],
        region_name=cfg.aws_region,
    ).client("s3", **client_kwargs)

    def put(key: str, body: bytes, content_type: str = "text/csv") -> None:
        client.put_object(Bucket=cfg.s3_bucket, Key=key, Body=body, ContentType=content_type)

    return put


def upload_batch(
    cfg: AppConfig,
    chosen: list[FileCheck],
    put: Callable[[str, bytes, str], None],
    session_prefix: str | None = None,
    now: datetime | None = None,
) -> dict:
    """Upload selected files + manifest under one session prefix with
    per-file error isolation (streamlit_app.py:280-330). Returns the
    manifest dict (its `uploaded_files` lists only successes; failures
    land in `errors` — an addition over the reference, which only
    rendered them to the UI)."""
    session_prefix = session_prefix or new_session_prefix(now)
    uploaded, errors = [], []
    for chk in chosen:
        key = s3_key_for(cfg, session_prefix, chk.original_name)
        try:
            put(key, chk.csv_bytes, "text/csv")
            uploaded.append(
                {
                    "original_name": chk.original_name,
                    "s3_uri": f"s3://{cfg.s3_bucket}/{key}",
                    "rows": chk.row_count,
                    "cols": chk.col_count,
                    "uploaded_at_utc": (now or datetime.now(timezone.utc)).isoformat(),
                }
            )
        except Exception as e:  # per-file isolation (streamlit_app.py:310-311)
            errors.append({"original_name": chk.original_name, "error": explain_boto_error(e)})
    manifest = {
        "session": session_prefix,
        "bucket": cfg.s3_bucket,
        "prefix": cfg.s3_prefix,
        "uploaded_files": uploaded,
    }
    try:  # best-effort manifest (streamlit_app.py:313-329)
        put(
            f"{cfg.s3_prefix}/{session_prefix}/manifest.json",
            json.dumps(manifest, indent=2).encode("utf-8"),
            "application/json",
        )
    except Exception as e:
        errors.append({"original_name": "manifest.json", "error": explain_boto_error(e)})
    if errors:
        manifest = {**manifest, "errors": errors}
    return manifest


def zip_bundle(chosen: list[FileCheck], now: datetime | None = None) -> bytes:
    """Offline bundle: one sanitized-name CSV per file + manifest.json
    (streamlit_app.py:333-349)."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, mode="w", compression=zipfile.ZIP_DEFLATED) as zf:
        meta = []
        for chk in chosen:
            fname = sanitize_stem(chk.original_name) + ".csv"
            zf.writestr(fname, chk.csv_bytes)
            meta.append(
                {
                    "original_name": chk.original_name,
                    "normalized_name": fname,
                    "rows": chk.row_count,
                    "cols": chk.col_count,
                }
            )
        zf.writestr(
            "manifest.json",
            json.dumps(
                {
                    "generated_at_utc": (now or datetime.now(timezone.utc)).isoformat(),
                    "files": meta,
                },
                indent=2,
            ),
        )
    return buf.getvalue()
