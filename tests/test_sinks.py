"""Sink tests (SURVEY.md §5 item 4): manifest JSON shape, key
sanitization, ZIP bundle — against a local dict-backed put stand-in
with the reference's key layout."""

from __future__ import annotations

import io
import json
import zipfile
from datetime import datetime, timezone

from free_etl_spark.intake.config import load_cfg
from free_etl_spark.intake.sinks import (
    explain_boto_error,
    new_session_prefix,
    s3_key_for,
    sanitize_stem,
    upload_batch,
    zip_bundle,
)
from free_etl_spark.intake.validate import FileCheck

CFG = load_cfg(
    {
        "aws": {
            "access_key_id": "k",
            "secret_access_key": "s",
            "region": "us-east-1",
            "bucket": "test-bucket",
            "prefix": "/ingestion/",
        }
    }
)

NOW = datetime(2026, 8, 13, 12, 0, 0, tzinfo=timezone.utc)


def chk(name: str, body: bytes = b"a,b\n1,2\n") -> FileCheck:
    return FileCheck(
        original_name=name, issues=[], acceptable=True,
        row_count=1, col_count=2, csv_bytes=body,
    )


def test_cfg_prefix_stripped_and_ready():
    assert CFG.s3_prefix == "ingestion"
    assert CFG.aws_ready and not CFG.missing_keys


def test_offline_mode_on_missing_keys():
    cfg = load_cfg({"aws": {"region": "us-east-1"}})
    assert not cfg.aws_ready
    assert set(cfg.missing_keys) == {"access_key_id", "secret_access_key", "bucket", "prefix"}


def test_key_sanitization():
    assert sanitize_stem("weird name !@#.csv") == "weird_name____"
    key = s3_key_for(CFG, "uploads/x", "Q1 report (final).xlsx")
    assert key == "ingestion/uploads/x/Q1_report__final_.csv"


def test_session_prefix_shape():
    p = new_session_prefix(NOW)
    assert p.startswith("uploads/20260813_120000_") and len(p.split("_")[-1]) == 8


def test_upload_batch_manifest_shape_and_isolation():
    store: dict[str, bytes] = {}

    def put(key, body, content_type="text/csv"):
        if "bad" in key:
            raise RuntimeError("AccessDenied: nope")
        store[key] = body

    manifest = upload_batch(
        CFG, [chk("good.csv"), chk("bad file.csv")], put,
        session_prefix="uploads/20260813_120000_deadbeef", now=NOW,
    )
    # reference manifest keys (streamlit_app.py:303-319)
    assert set(manifest) == {"session", "bucket", "prefix", "uploaded_files", "errors"}
    assert manifest["bucket"] == "test-bucket" and manifest["prefix"] == "ingestion"
    (up,) = manifest["uploaded_files"]
    assert set(up) == {"original_name", "s3_uri", "rows", "cols", "uploaded_at_utc"}
    assert up["s3_uri"] == "s3://test-bucket/ingestion/uploads/20260813_120000_deadbeef/good.csv"
    # per-file isolation: bad file failed, batch continued, manifest written
    assert manifest["errors"][0]["error"].startswith("Access denied")
    mkey = "ingestion/uploads/20260813_120000_deadbeef/manifest.json"
    assert mkey in store
    assert json.loads(store[mkey])["uploaded_files"][0]["original_name"] == "good.csv"


def test_zip_bundle_contents_and_manifest():
    data = zip_bundle([chk("a report.csv"), chk("b.csv")], now=NOW)
    zf = zipfile.ZipFile(io.BytesIO(data))
    assert sorted(zf.namelist()) == ["a_report.csv", "b.csv", "manifest.json"]
    manifest = json.loads(zf.read("manifest.json"))
    assert set(manifest) == {"generated_at_utc", "files"}  # streamlit_app.py:344-347
    assert set(manifest["files"][0]) == {"original_name", "normalized_name", "rows", "cols"}


def test_explain_boto_error_classification():
    assert "Access denied" in explain_boto_error(RuntimeError("AccessDenied x"))
    assert "Bucket not found" in explain_boto_error(RuntimeError("NoSuchBucket"))
    assert "Network/endpoint" in explain_boto_error(RuntimeError("EndpointConnectionError"))
    assert "Invalid AWS keys" in explain_boto_error(RuntimeError("InvalidAccessKeyId"))
    assert explain_boto_error(RuntimeError("boom")) == "S3 error: boom"


def test_probe_s3_success_and_failure():
    from free_etl_spark.intake.sinks import probe_s3

    class OkClient:
        def list_objects_v2(self, **kw):
            # reference probe shape: Bucket + Prefix + MaxKeys=1
            # (streamlit_app.py:224-225)
            assert kw == {"Bucket": "test-bucket", "Prefix": "ingestion", "MaxKeys": 1}
            return {"KeyCount": 0}

    class DeniedClient:
        def list_objects_v2(self, **kw):
            raise RuntimeError("An error occurred (AccessDenied) ...")

    assert probe_s3(CFG, OkClient()) is None
    msg = probe_s3(CFG, DeniedClient())
    assert msg is not None and msg.startswith("Access denied")
