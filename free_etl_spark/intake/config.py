"""App configuration (reference parity: streamlit_app.py:27-50).

The reference reads Streamlit secrets; this engine reads a plain
mapping (parsed TOML, env, or literal dict) with identical defaults
and readiness semantics. ``aws_ready`` gates the S3 sink — when
secrets are missing the engine degrades to offline mode
(streamlit_app.py:65-71), exactly like the reference.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Mapping

REQUIRED_AWS_KEYS = ["access_key_id", "secret_access_key", "region", "bucket", "prefix"]


@dataclass
class AppConfig:
    """Mirror of the reference AppConfig (streamlit_app.py:27-35)."""

    aws_region: str = "us-east-1"
    s3_bucket: str = ""
    s3_prefix: str = "ingestion"
    aws_ready: bool = False
    missing_keys: list[str] = field(default_factory=list)
    max_file_mb: int = 50
    allow_xlsx: bool = True


def load_cfg(secrets: Mapping[str, Any] | None = None) -> AppConfig:
    """Build AppConfig from a secrets-like mapping with the reference's
    defaults and key requirements (streamlit_app.py:37-50): region
    defaults to us-east-1, prefix defaults to "ingestion" and is
    stripped of slashes, readiness requires all five [aws] keys."""
    secrets = secrets or {}
    aws = secrets.get("aws") or {}
    app_opts = secrets.get("app") or {}
    missing = [k for k in REQUIRED_AWS_KEYS if not aws.get(k)]
    return AppConfig(
        aws_region=aws.get("region", "us-east-1"),
        s3_bucket=aws.get("bucket", ""),
        s3_prefix=(aws.get("prefix", "ingestion") or "ingestion").strip("/"),
        aws_ready=not missing,
        missing_keys=missing,
        max_file_mb=int(app_opts.get("max_file_mb", 50)),
        allow_xlsx=bool(app_opts.get("allow_xlsx", True)),
    )


def spark_s3_conf(cfg: AppConfig, secrets: Mapping[str, Any]) -> dict[str, str]:
    """Translate the [aws] block into the hadoop-aws (s3a) Spark confs
    the scale path would use on a real cluster."""
    aws = secrets.get("aws") or {}
    conf = {
        "spark.hadoop.fs.s3a.endpoint.region": cfg.aws_region,
    }
    if aws.get("access_key_id"):
        conf["spark.hadoop.fs.s3a.access.key"] = aws["access_key_id"]
    if aws.get("secret_access_key"):
        conf["spark.hadoop.fs.s3a.secret.key"] = aws["secret_access_key"]
    return conf
