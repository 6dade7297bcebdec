"""Object-store configuration mapping (SURVEY.md A24/A25).

The reference builds per-scheme stores from env vars with config files
as the fallback (src/object_store/{aws,azure,gcs,http}.rs) and caches
one client per (scheme, bucket) with credential-expiry eviction
(object_store_cache.rs). Spark's equivalents are the Hadoop connectors
(s3a://, abfss://, gs://) with their provider chains, and the built-in
FileSystem cache.

This module re-implements the reference's *resolution* layer:

- **AWS** (aws.rs:12-166): env vars AWS_ACCESS_KEY_ID /
  AWS_SECRET_ACCESS_KEY / AWS_SESSION_TOKEN / AWS_ENDPOINT_URL /
  AWS_REGION first, then the AWS shared config files
  (AWS_SHARED_CREDENTIALS_FILE, default ``~/.aws/credentials``;
  AWS_CONFIG_FILE, default ``~/.aws/config``; profile selected by
  AWS_PROFILE, default ``default``) — the same chain the reference gets
  from ``aws_config::defaults`` (aws.rs:118-165). Credentials resolve
  as a unit (the SDK never mixes an env access key with a file secret);
  region/endpoint resolve per-setting.
- **Azure** (azure.rs:23-218): AZURE_STORAGE_CONNECTION_STRING (env,
  then ``[storage] connection_string`` in the azure config file)
  overrides everything (azure.rs:144-158); otherwise
  AZURE_STORAGE_ACCOUNT/KEY/SAS_TOKEN env-first with the config file's
  ``[storage] account/key/sas_token`` as fallback (azure.rs:160-185).
  AZURE_STORAGE_ENDPOINT / AZURE_ALLOW_HTTP / AZURE_TENANT_ID /
  AZURE_CLIENT_ID / AZURE_CLIENT_SECRET / AZURE_FEDERATED_TOKEN_FILE
  are env-only (azure.rs:187-205). The config file path is
  AZURE_CONFIG_FILE, default ``~/.azure/config`` (azure.rs:131-140).
- **GCS** (gcs.rs:9-69): GOOGLE_APPLICATION_CREDENTIALS service
  account file.
- **Uri forms**: the three S3 shapes the reference accepts
  (aws.rs:75-101) and the two Azure shapes (azure.rs:86-107) normalize
  to the canonical Hadoop uris via :func:`canonicalize_uri`.

The resolved settings are emitted as Hadoop confs so a user coming from
pg_parquet keeps their credential setup unchanged. No network access is
attempted here (the container has none) — tests assert the resolution
and the conf mapping.
"""

from __future__ import annotations

import configparser
import os
import re
from dataclasses import dataclass

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


def _truthy(val: str | None) -> bool:
    # reference parses AWS_ALLOW_HTTP/AZURE_ALLOW_HTTP with Rust
    # `str::parse::<bool>` (aws.rs:120-124): only literal "true" is true
    return (val or "").strip().lower() == "true"


def _read_ini(path: str | None) -> configparser.ConfigParser | None:
    if not path or not os.path.isfile(path):
        return None
    ini = configparser.ConfigParser()
    try:
        ini.read(path)
    except configparser.Error:
        return None
    return ini


def _home(env: dict[str, str]) -> str:
    return env.get("HOME") or os.path.expanduser("~")


# ---------------------------------------------------------------------------
# AWS


@dataclass
class AwsS3Config:
    """Mirror of the reference's AwsS3Config (aws.rs:107-115)."""

    access_key_id: str | None = None
    secret_access_key: str | None = None
    session_token: str | None = None
    endpoint_url: str | None = None
    region: str | None = None
    allow_http: bool = False


def aws_s3_config(env: dict[str, str] | None = None) -> AwsS3Config:
    """Env-first, config-file-fallback resolution (aws.rs:117-165)."""
    env = dict(os.environ if env is None else env)
    profile = env.get("AWS_PROFILE", "default")
    creds_ini = _read_ini(
        env.get("AWS_SHARED_CREDENTIALS_FILE")
        or os.path.join(_home(env), ".aws", "credentials")
    )
    config_ini = _read_ini(
        env.get("AWS_CONFIG_FILE") or os.path.join(_home(env), ".aws", "config")
    )

    cfg = AwsS3Config(allow_http=_truthy(env.get("AWS_ALLOW_HTTP")))

    # credentials resolve as a unit, env chain before file chain — the
    # aws sdk default provider order the reference inherits
    if env.get("AWS_ACCESS_KEY_ID") and env.get("AWS_SECRET_ACCESS_KEY"):
        cfg.access_key_id = env["AWS_ACCESS_KEY_ID"]
        cfg.secret_access_key = env["AWS_SECRET_ACCESS_KEY"]
        cfg.session_token = env.get("AWS_SESSION_TOKEN")
    elif creds_ini is not None and creds_ini.has_section(profile):
        sect = creds_ini[profile]
        cfg.access_key_id = sect.get("aws_access_key_id")
        cfg.secret_access_key = sect.get("aws_secret_access_key")
        cfg.session_token = sect.get("aws_session_token")

    # region / endpoint resolve per-setting: env, then config file
    # (sections are [default] / [profile <name>] in ~/.aws/config)
    sect = None
    if config_ini is not None:
        for name in (profile, f"profile {profile}"):
            if config_ini.has_section(name):
                sect = config_ini[name]
                break
    cfg.region = env.get("AWS_REGION") or (sect.get("region") if sect else None)
    cfg.endpoint_url = env.get("AWS_ENDPOINT_URL") or (
        sect.get("endpoint_url") if sect else None
    )
    return cfg


_S3_VHOST_RE = re.compile(r"^https?://([^/.]+)\.s3\.amazonaws\.com(/.*)?$")
_S3_PATH_RE = re.compile(r"^https?://s3\.amazonaws\.com/([^/]+)(/.*)?$")


def parse_s3_bucket(uri: str) -> str | None:
    """The three S3 uri forms (aws.rs:75-101): ``s3(a)://{bucket}/key``,
    ``https://s3.amazonaws.com/{bucket}/key``,
    ``https://{bucket}.s3.amazonaws.com/key``."""
    m = re.match(r"^s3a?n?://([^/]+)", uri)
    if m:
        return m.group(1)
    m = _S3_PATH_RE.match(uri)
    if m:
        return m.group(1)
    m = _S3_VHOST_RE.match(uri)
    if m:
        return m.group(1)
    return None


# ---------------------------------------------------------------------------
# Azure


@dataclass
class AzureStorageConfig:
    """Mirror of the reference's AzureStorageConfig (azure.rs:113-123)."""

    account_name: str | None = None
    account_key: str | None = None
    sas_token: str | None = None
    tenant_id: str | None = None
    client_id: str | None = None
    client_secret: str | None = None
    federated_token_file: str | None = None
    endpoint: str | None = None
    allow_http: bool = False


def _parse_connection_string(cs: str) -> AzureStorageConfig:
    """Azure connection-string fields (azure.rs:221-254): AccountName,
    AccountKey, SharedAccessSignature, BlobEndpoint,
    DefaultEndpointsProtocol=http → allow_http."""
    fields: dict[str, str] = {}
    for part in cs.split(";"):
        part = part.strip()
        if not part or "=" not in part:
            continue
        k, v = part.split("=", 1)
        fields[k.strip()] = v.strip()
    return AzureStorageConfig(
        account_name=fields.get("AccountName"),
        account_key=fields.get("AccountKey"),
        sas_token=fields.get("SharedAccessSignature"),
        endpoint=fields.get("BlobEndpoint"),
        allow_http=fields.get("DefaultEndpointsProtocol", "").lower() == "http",
    )


def azure_storage_config(env: dict[str, str] | None = None) -> AzureStorageConfig:
    """Env-first, azure-config-file fallback (azure.rs:125-218)."""
    env = dict(os.environ if env is None else env)
    ini = _read_ini(
        env.get("AZURE_CONFIG_FILE")
        or os.path.join(_home(env), ".azure", "config")
    )
    storage = ini["storage"] if ini is not None and ini.has_section("storage") else None

    def from_storage(key: str) -> str | None:
        return storage.get(key) if storage is not None else None

    # connection string overrides everything (azure.rs:153-158)
    cs = env.get("AZURE_STORAGE_CONNECTION_STRING") or from_storage(
        "connection_string"
    )
    if cs:
        return _parse_connection_string(cs)

    return AzureStorageConfig(
        account_name=env.get("AZURE_STORAGE_ACCOUNT") or from_storage("account"),
        account_key=env.get("AZURE_STORAGE_KEY") or from_storage("key"),
        sas_token=env.get("AZURE_STORAGE_SAS_TOKEN") or from_storage("sas_token"),
        endpoint=env.get("AZURE_STORAGE_ENDPOINT"),
        allow_http=_truthy(env.get("AZURE_ALLOW_HTTP")),
        tenant_id=env.get("AZURE_TENANT_ID"),
        client_id=env.get("AZURE_CLIENT_ID"),
        client_secret=env.get("AZURE_CLIENT_SECRET"),
        federated_token_file=env.get("AZURE_FEDERATED_TOKEN_FILE"),
    )


_AZ_BLOB_RE = re.compile(
    r"^https?://([^/.]+)\.blob\.core\.windows\.net/([^/]+)(/.*)?$"
)


def parse_azure_blob_container(uri: str) -> str | None:
    """The Azure uri forms (azure.rs:86-107): ``az(ure)://{container}/key``
    and ``https://{account}.blob.core.windows.net/{container}/key``."""
    m = re.match(r"^(?:az|azure)://([^/]+)", uri)
    if m:
        return m.group(1)
    m = _AZ_BLOB_RE.match(uri)
    if m:
        return m.group(2)
    return None


# ---------------------------------------------------------------------------
# Uri canonicalization (alternate https forms → Hadoop connector uris)


def canonicalize_uri(uri: str) -> str:
    """Rewrite the reference's alternate https object-store uri forms to
    the canonical Hadoop uris Spark's connectors understand:

    - ``https://s3.amazonaws.com/{bucket}/key`` and
      ``https://{bucket}.s3.amazonaws.com/key`` → ``s3a://bucket/key``
      (aws.rs:75-101);
    - ``https://{account}.blob.core.windows.net/{container}/key`` →
      ``abfss://{container}@{account}.dfs.core.windows.net/key``
      (azure.rs:86-107).

    Every other uri (including generic https://) passes through.
    """
    m = _S3_PATH_RE.match(uri)
    if m:
        return f"s3a://{m.group(1)}{m.group(2) or ''}"
    m = _S3_VHOST_RE.match(uri)
    if m:
        return f"s3a://{m.group(1)}{m.group(2) or ''}"
    m = _AZ_BLOB_RE.match(uri)
    if m:
        account, container, key = m.group(1), m.group(2), m.group(3) or ""
        return f"abfss://{container}@{account}.dfs.core.windows.net{key}"
    return uri


# ---------------------------------------------------------------------------
# Hadoop conf emission


def object_store_confs(env: dict[str, str] | None = None) -> dict[str, str]:
    """Hadoop confs from the reference's full credential surface —
    env vars first, config files as fallback (matching the reference's
    resolution order)."""
    env = dict(os.environ if env is None else env)
    confs: dict[str, str] = {}

    aws = aws_s3_config(env)
    if aws.access_key_id:
        confs["fs.s3a.access.key"] = aws.access_key_id
    if aws.secret_access_key:
        confs["fs.s3a.secret.key"] = aws.secret_access_key
    if aws.session_token:
        confs["fs.s3a.session.token"] = aws.session_token
    if aws.endpoint_url:
        confs["fs.s3a.endpoint"] = aws.endpoint_url
    if aws.region:
        confs["fs.s3a.endpoint.region"] = aws.region
    if aws.access_key_id and aws.session_token:
        confs["fs.s3a.aws.credentials.provider"] = (
            "org.apache.hadoop.fs.s3a.TemporaryAWSCredentialsProvider"
        )
    if aws.allow_http:
        confs["fs.s3a.connection.ssl.enabled"] = "false"

    az = azure_storage_config(env)
    if az.account_name:
        suffix = f"{az.account_name}.dfs.core.windows.net"
        if az.account_key:
            confs[f"fs.azure.account.auth.type.{suffix}"] = "SharedKey"
            confs[f"fs.azure.account.key.{suffix}"] = az.account_key
        elif az.sas_token:
            confs[f"fs.azure.account.auth.type.{suffix}"] = "SAS"
            confs[f"fs.azure.sas.fixed.token.{suffix}"] = az.sas_token
        elif az.client_id and az.client_secret and az.tenant_id:
            # client-secret/tenant (service principal) auth — the
            # builder path azure.rs:56-68 → Hadoop ABFS OAuth
            confs[f"fs.azure.account.auth.type.{suffix}"] = "OAuth"
            confs[f"fs.azure.account.oauth.provider.type.{suffix}"] = (
                "org.apache.hadoop.fs.azurebfs.oauth2.ClientCredsTokenProvider"
            )
            confs[f"fs.azure.account.oauth2.client.id.{suffix}"] = az.client_id
            confs[f"fs.azure.account.oauth2.client.secret.{suffix}"] = (
                az.client_secret
            )
            confs[f"fs.azure.account.oauth2.client.endpoint.{suffix}"] = (
                f"https://login.microsoftonline.com/{az.tenant_id}/oauth2/token"
            )
        elif az.client_id and az.federated_token_file and az.tenant_id:
            # federated workload identity (azure.rs:71-73)
            confs[f"fs.azure.account.auth.type.{suffix}"] = "OAuth"
            confs[f"fs.azure.account.oauth.provider.type.{suffix}"] = (
                "org.apache.hadoop.fs.azurebfs.oauth2.WorkloadIdentityTokenProvider"
            )
            confs[f"fs.azure.account.oauth2.client.id.{suffix}"] = az.client_id
            confs[f"fs.azure.account.oauth2.msi.tenant.{suffix}"] = az.tenant_id
            confs[f"fs.azure.account.oauth2.token.file.{suffix}"] = (
                az.federated_token_file
            )

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
