"""Object-store configuration mapping (SURVEY.md A24/A25).

The reference builds per-scheme stores from env vars / config files
(src/object_store/{aws,azure,gcs,http}.rs) and caches one client per
(scheme, bucket) with credential-expiry eviction (object_store_cache.rs).
Spark's equivalents are the Hadoop connectors (s3a://, abfss://, gs://)
with their provider chains, and the built-in FileSystem cache.

This module maps the same environment variables the reference honors
(aws.rs:14-25, azure.rs:14-22, gcs.rs:9-12) onto the Hadoop conf keys, so
a user coming from pg_parquet keeps their credential setup unchanged.
Applied at session build or onto a live session; no network access is
attempted here (the container has none) — tests assert the conf mapping.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: env var → hadoop conf (AWS: aws.rs:14-25)
S3_ENV_MAP = {
    "AWS_ACCESS_KEY_ID": "fs.s3a.access.key",
    "AWS_SECRET_ACCESS_KEY": "fs.s3a.secret.key",
    "AWS_SESSION_TOKEN": "fs.s3a.session.token",
    "AWS_ENDPOINT_URL": "fs.s3a.endpoint",
    "AWS_REGION": "fs.s3a.endpoint.region",
}

#: Azure (azure.rs:14-22): account key / SAS via per-account keys
AZURE_ENV = ("AZURE_STORAGE_ACCOUNT", "AZURE_STORAGE_KEY", "AZURE_STORAGE_SAS_TOKEN")

#: GCS (gcs.rs:9-12)
GCS_ENV_MAP = {
    "GOOGLE_APPLICATION_CREDENTIALS": "fs.gs.auth.service.account.json.keyfile",
}


def object_store_confs(env: dict[str, str] | None = None) -> dict[str, str]:
    """Hadoop confs derived from the reference's env-var surface."""
    env = dict(os.environ if env is None else env)
    confs: dict[str, str] = {}
    for var, key in S3_ENV_MAP.items():
        if env.get(var):
            confs[key] = env[var]
    if env.get("AWS_ACCESS_KEY_ID") and env.get("AWS_SESSION_TOKEN"):
        confs["fs.s3a.aws.credentials.provider"] = (
            "org.apache.hadoop.fs.s3a.TemporaryAWSCredentialsProvider"
        )
    if env.get("AWS_ALLOW_HTTP", "").lower() in ("1", "true"):
        confs["fs.s3a.connection.ssl.enabled"] = "false"
    account = env.get("AZURE_STORAGE_ACCOUNT")
    if account:
        suffix = f"{account}.dfs.core.windows.net"
        if env.get("AZURE_STORAGE_KEY"):
            confs[f"fs.azure.account.auth.type.{suffix}"] = "SharedKey"
            confs[f"fs.azure.account.key.{suffix}"] = env["AZURE_STORAGE_KEY"]
        elif env.get("AZURE_STORAGE_SAS_TOKEN"):
            confs[f"fs.azure.account.auth.type.{suffix}"] = "SAS"
            confs[f"fs.azure.sas.fixed.token.{suffix}"] = env["AZURE_STORAGE_SAS_TOKEN"]
    for var, key in GCS_ENV_MAP.items():
        if env.get(var):
            confs[key] = env[var]
            confs["fs.gs.auth.type"] = "SERVICE_ACCOUNT_JSON_KEYFILE"
    return confs


def apply_object_store_confs(spark: SparkSession, env: dict[str, str] | None = None) -> dict[str, str]:
    """Apply the mapping onto a live session's hadoop conf. The Hadoop
    FileSystem cache (A25 equivalent) keys clients per (scheme,
    authority) automatically; credential refresh is the provider chain's
    job — matching the reference's cache-evict-on-expiry behavior."""
    confs = object_store_confs(env)
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for k, v in confs.items():
        hconf.set(k, v)
    return confs
