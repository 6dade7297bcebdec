"""A24 credential-resolution + conf-mapping tests (no network — asserts
the env-first/config-file-fallback resolution and env→conf translation
the reference performs in src/object_store/{aws,azure,gcs}.rs)."""

from pg_parquet_spark.sources.object_store import (
    aws_s3_config,
    azure_storage_config,
    canonicalize_uri,
    object_store_confs,
    parse_azure_blob_container,
    parse_s3_bucket,
)


def test_s3_env_mapping(tmp_path):
    env = {
        "HOME": str(tmp_path),
        "AWS_ACCESS_KEY_ID": "AKIA",
        "AWS_SECRET_ACCESS_KEY": "secret",
        "AWS_REGION": "eu-west-1",
        "AWS_ENDPOINT_URL": "http://minio:9000",
        "AWS_ALLOW_HTTP": "true",
    }
    confs = object_store_confs(env)
    assert confs["fs.s3a.access.key"] == "AKIA"
    assert confs["fs.s3a.secret.key"] == "secret"
    assert confs["fs.s3a.endpoint.region"] == "eu-west-1"
    assert confs["fs.s3a.endpoint"] == "http://minio:9000"
    assert confs["fs.s3a.connection.ssl.enabled"] == "false"


def test_s3_session_token_switches_provider(tmp_path):
    env = {
        "HOME": str(tmp_path),
        "AWS_ACCESS_KEY_ID": "AKIA",
        "AWS_SECRET_ACCESS_KEY": "secret",
        "AWS_SESSION_TOKEN": "tok",
    }
    confs = object_store_confs(env)
    assert confs["fs.s3a.session.token"] == "tok"
    assert "TemporaryAWSCredentialsProvider" in confs["fs.s3a.aws.credentials.provider"]


def test_azure_shared_key(tmp_path):
    env = {
        "HOME": str(tmp_path),
        "AZURE_STORAGE_ACCOUNT": "acct",
        "AZURE_STORAGE_KEY": "k==",
    }
    confs = object_store_confs(env)
    assert confs["fs.azure.account.auth.type.acct.dfs.core.windows.net"] == "SharedKey"
    assert confs["fs.azure.account.key.acct.dfs.core.windows.net"] == "k=="


def test_azure_sas(tmp_path):
    env = {
        "HOME": str(tmp_path),
        "AZURE_STORAGE_ACCOUNT": "acct",
        "AZURE_STORAGE_SAS_TOKEN": "sv=...",
    }
    confs = object_store_confs(env)
    assert confs["fs.azure.account.auth.type.acct.dfs.core.windows.net"] == "SAS"


def test_gcs_service_account(tmp_path):
    env = {"HOME": str(tmp_path), "GOOGLE_APPLICATION_CREDENTIALS": "/tmp/sa.json"}
    confs = object_store_confs(env)
    assert confs["fs.gs.auth.service.account.json.keyfile"] == "/tmp/sa.json"


def test_empty_env_no_confs(tmp_path):
    assert object_store_confs({"HOME": str(tmp_path)}) == {}


# ---------------------------------------------------------------------------
# config-file fallback + precedence (reference aws.rs:117-165 loads env
# first, then the AWS shared config files; azure.rs:125-218 the azure
# ini config). The file formats are the public AWS/Azure CLI formats.


def _write_aws_files(tmp_path, profile="default"):
    creds = tmp_path / "credentials"
    creds.write_text(
        f"[{profile}]\n"
        "aws_access_key_id = FILEKEY\n"
        "aws_secret_access_key = FILESECRET\n"
        "aws_session_token = FILETOKEN\n"
    )
    section = profile if profile == "default" else f"profile {profile}"
    config = tmp_path / "config"
    config.write_text(
        f"[{section}]\nregion = ap-south-1\nendpoint_url = http://files:9000\n"
    )
    return str(creds), str(config)


def test_aws_config_file_fallback_env_absent(tmp_path):
    creds, config = _write_aws_files(tmp_path)
    env = {
        "HOME": str(tmp_path),  # no ~/.aws there — explicit paths below
        "AWS_SHARED_CREDENTIALS_FILE": creds,
        "AWS_CONFIG_FILE": config,
    }
    cfg = aws_s3_config(env)
    assert cfg.access_key_id == "FILEKEY"
    assert cfg.secret_access_key == "FILESECRET"
    assert cfg.session_token == "FILETOKEN"
    assert cfg.region == "ap-south-1"
    assert cfg.endpoint_url == "http://files:9000"
    confs = object_store_confs(env)
    assert confs["fs.s3a.access.key"] == "FILEKEY"
    assert confs["fs.s3a.endpoint.region"] == "ap-south-1"


def test_aws_env_takes_precedence_over_files(tmp_path):
    creds, config = _write_aws_files(tmp_path)
    env = {
        "HOME": str(tmp_path),
        "AWS_SHARED_CREDENTIALS_FILE": creds,
        "AWS_CONFIG_FILE": config,
        "AWS_ACCESS_KEY_ID": "ENVKEY",
        "AWS_SECRET_ACCESS_KEY": "ENVSECRET",
        "AWS_REGION": "us-east-2",
    }
    cfg = aws_s3_config(env)
    # credentials resolve as a unit from env (sdk chain order)
    assert cfg.access_key_id == "ENVKEY"
    assert cfg.secret_access_key == "ENVSECRET"
    assert cfg.session_token is None  # env unit has no token; file one ignored
    assert cfg.region == "us-east-2"  # env wins
    assert cfg.endpoint_url == "http://files:9000"  # file fills the gap


def test_aws_profile_selects_section(tmp_path):
    creds, config = _write_aws_files(tmp_path, profile="prod")
    env = {
        "HOME": str(tmp_path),
        "AWS_SHARED_CREDENTIALS_FILE": creds,
        "AWS_CONFIG_FILE": config,
        "AWS_PROFILE": "prod",
    }
    cfg = aws_s3_config(env)
    assert cfg.access_key_id == "FILEKEY"
    assert cfg.region == "ap-south-1"
    # wrong profile → nothing resolves
    env["AWS_PROFILE"] = "absent"
    cfg = aws_s3_config(env)
    assert cfg.access_key_id is None and cfg.region is None


def test_aws_default_paths_under_home(tmp_path):
    (tmp_path / ".aws").mkdir()
    (tmp_path / ".aws" / "credentials").write_text(
        "[default]\naws_access_key_id = HOMEKEY\naws_secret_access_key = HS\n"
    )
    cfg = aws_s3_config({"HOME": str(tmp_path)})
    assert cfg.access_key_id == "HOMEKEY"


def test_azure_config_file_fallback(tmp_path):
    cfgfile = tmp_path / "azconfig"
    cfgfile.write_text("[storage]\naccount = fileacct\nkey = filekey==\n")
    env = {"HOME": str(tmp_path), "AZURE_CONFIG_FILE": str(cfgfile)}
    az = azure_storage_config(env)
    assert az.account_name == "fileacct"
    assert az.account_key == "filekey=="
    confs = object_store_confs(env)
    assert (
        confs["fs.azure.account.auth.type.fileacct.dfs.core.windows.net"]
        == "SharedKey"
    )


def test_azure_env_overrides_config_file(tmp_path):
    cfgfile = tmp_path / "azconfig"
    cfgfile.write_text("[storage]\naccount = fileacct\nkey = filekey==\n")
    env = {
        "HOME": str(tmp_path),
        "AZURE_CONFIG_FILE": str(cfgfile),
        "AZURE_STORAGE_ACCOUNT": "envacct",
    }
    az = azure_storage_config(env)
    assert az.account_name == "envacct"  # env first
    assert az.account_key == "filekey=="  # file fallback per-setting


def test_azure_connection_string_overrides_everything(tmp_path):
    env = {
        "HOME": str(tmp_path),
        "AZURE_STORAGE_CONNECTION_STRING": (
            "DefaultEndpointsProtocol=http;AccountName=csacct;"
            "AccountKey=cskey==;BlobEndpoint=http://azurite:10000/csacct"
        ),
        # these would win without the connection string:
        "AZURE_STORAGE_ACCOUNT": "other",
        "AZURE_STORAGE_KEY": "otherkey",
    }
    az = azure_storage_config(env)
    assert az.account_name == "csacct"
    assert az.account_key == "cskey=="
    assert az.endpoint == "http://azurite:10000/csacct"
    assert az.allow_http is True


def test_azure_connection_string_from_config_file(tmp_path):
    cfgfile = tmp_path / "azconfig"
    cfgfile.write_text(
        "[storage]\nconnection_string = AccountName=fcs;"
        "SharedAccessSignature=sv=2024\n"
    )
    az = azure_storage_config({"HOME": str(tmp_path), "AZURE_CONFIG_FILE": str(cfgfile)})
    assert az.account_name == "fcs"
    assert az.sas_token == "sv=2024"


def test_azure_client_secret_tenant_auth(tmp_path):
    env = {
        "HOME": str(tmp_path),
        "AZURE_STORAGE_ACCOUNT": "acct",
        "AZURE_TENANT_ID": "tid",
        "AZURE_CLIENT_ID": "cid",
        "AZURE_CLIENT_SECRET": "shh",
    }
    confs = object_store_confs(env)
    sfx = "acct.dfs.core.windows.net"
    assert confs[f"fs.azure.account.auth.type.{sfx}"] == "OAuth"
    assert "ClientCredsTokenProvider" in confs[f"fs.azure.account.oauth.provider.type.{sfx}"]
    assert confs[f"fs.azure.account.oauth2.client.id.{sfx}"] == "cid"
    assert confs[f"fs.azure.account.oauth2.client.secret.{sfx}"] == "shh"
    assert "login.microsoftonline.com/tid" in confs[f"fs.azure.account.oauth2.client.endpoint.{sfx}"]


def test_azure_federated_token_auth(tmp_path):
    env = {
        "HOME": str(tmp_path),
        "AZURE_STORAGE_ACCOUNT": "acct",
        "AZURE_TENANT_ID": "tid",
        "AZURE_CLIENT_ID": "cid",
        "AZURE_FEDERATED_TOKEN_FILE": "/var/run/tok",
    }
    confs = object_store_confs(env)
    sfx = "acct.dfs.core.windows.net"
    assert confs[f"fs.azure.account.auth.type.{sfx}"] == "OAuth"
    assert "WorkloadIdentityTokenProvider" in confs[f"fs.azure.account.oauth.provider.type.{sfx}"]
    assert confs[f"fs.azure.account.oauth2.token.file.{sfx}"] == "/var/run/tok"


# --- alternate uri forms (aws.rs:75-101, azure.rs:86-107) ------------------


def test_parse_s3_bucket_three_forms():
    assert parse_s3_bucket("s3://mybucket/a/b.parquet") == "mybucket"
    assert parse_s3_bucket("s3a://mybucket/a/b.parquet") == "mybucket"
    assert parse_s3_bucket("https://s3.amazonaws.com/mybucket/a/b.parquet") == "mybucket"
    assert parse_s3_bucket("https://mybucket.s3.amazonaws.com/a/b.parquet") == "mybucket"
    assert parse_s3_bucket("https://example.com/x.parquet") is None


def test_parse_azure_container_forms():
    assert parse_azure_blob_container("az://cont/a.parquet") == "cont"
    assert parse_azure_blob_container("azure://cont/a.parquet") == "cont"
    assert (
        parse_azure_blob_container("https://acct.blob.core.windows.net/cont/a.parquet")
        == "cont"
    )
    assert parse_azure_blob_container("https://example.com/a.parquet") is None


def test_canonicalize_uri_rewrites_known_forms_only():
    assert (
        canonicalize_uri("https://s3.amazonaws.com/b/k/x.parquet")
        == "s3a://b/k/x.parquet"
    )
    assert (
        canonicalize_uri("https://b.s3.amazonaws.com/k/x.parquet")
        == "s3a://b/k/x.parquet"
    )
    assert (
        canonicalize_uri("https://acct.blob.core.windows.net/cont/k.parquet")
        == "abfss://cont@acct.dfs.core.windows.net/k.parquet"
    )
    # generic https and local paths pass through untouched
    assert canonicalize_uri("https://example.com/f.parquet") == "https://example.com/f.parquet"
    assert canonicalize_uri("/tmp/f.parquet") == "/tmp/f.parquet"
    assert canonicalize_uri("s3a://b/k.parquet") == "s3a://b/k.parquet"


# ---------------------------------------------------------------------------
# store-agnostic glob + metadata surface (r2): a SubTreeFileSystem mounted
# as mem:// stands in for the reference's MinIO/Azurite emulator tests
# (src/pgrx_tests/object_store.rs) — it exercises the exact non-local code
# path (resolve → FileSelector glob → footer fetch through the FS).

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pg_parquet_spark.sources import fs as pgfs


@pytest.fixture()
def mem_store(tmp_path):
    from pyarrow import fs as pafs

    root = tmp_path / "bucket"
    (root / "nested" / "deep").mkdir(parents=True)
    pq.write_table(pa.table({"a": pa.array([1, 2, 3])}), str(root / "one.parquet"))
    pq.write_table(pa.table({"a": pa.array([4])}), str(root / "nested" / "two.parquet"))
    pq.write_table(
        pa.table({"a": pa.array([5])}), str(root / "nested" / "deep" / "three.parquet")
    )
    pgfs.register_filesystem(
        "mem", lambda: pafs.SubTreeFileSystem(str(tmp_path), pafs.LocalFileSystem())
    )
    yield "mem://bucket"
    pgfs.unregister_filesystem("mem")


def test_fs_glob_single_level(mem_store):
    got = pgfs.glob(f"{mem_store}/*.parquet")
    assert got == [f"{mem_store}/one.parquet"]


def test_fs_glob_doublestar_crosses_levels(mem_store):
    got = pgfs.glob(f"{mem_store}/**/*.parquet")
    assert got == [
        f"{mem_store}/nested/deep/three.parquet",
        f"{mem_store}/nested/two.parquet",
        f"{mem_store}/one.parquet",
    ] or set(got) == {
        f"{mem_store}/nested/deep/three.parquet",
        f"{mem_store}/nested/two.parquet",
        f"{mem_store}/one.parquet",
    }


def test_metadata_functions_on_registered_store(spark, mem_store):
    from pg_parquet_spark.functions.metadata import (
        parquet_column_stats,
        parquet_file_metadata,
        parquet_list,
        parquet_schema,
    )

    uri = f"{mem_store}/one.parquet"
    md = parquet_file_metadata(spark, uri).collect()[0]
    assert md.num_rows == 3 and md.uri == uri

    sch = parquet_schema(spark, uri).collect()
    assert any(r.name == "a" and r.type_name == "INT64" for r in sch)

    stats = parquet_column_stats(spark, uri).collect()[0]
    assert stats.stats_min == "1" and stats.stats_max == "3"

    lst = parquet_list(spark, f"{mem_store}/**/*.parquet").collect()
    assert {r.uri for r in lst} == {
        f"{mem_store}/one.parquet",
        f"{mem_store}/nested/two.parquet",
        f"{mem_store}/nested/deep/three.parquet",
    }
    assert all(r.size > 0 for r in lst)


def test_read_glob_check_on_registered_store(spark, mem_store):
    from pg_parquet_spark.sources.reader import _check_glob

    _check_glob(f"{mem_store}/*.parquet")  # non-empty: passes
    with pytest.raises(FileNotFoundError, match="no files found"):
        _check_glob(f"{mem_store}/absent*.parquet")


def test_fs_glob_star_does_not_cross_segments(mem_store):
    # '*' must stay within one path segment (glob-crate parity)
    got = pgfs.glob(f"{mem_store}/*two.parquet")
    assert got == []


def test_read_parquet_over_http(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("ALLOW_HTTP", "1")
    return _run_read_parquet_over_http(spark, tmp_path)


def _run_read_parquet_over_http(spark, tmp_path):
    """http(s) read parity (reference src/object_store/http.rs:11-38):
    read_parquet over a plain HTTP server works via range requests — the
    driver fetches only the footer; each row group is fetched and decoded
    executor-side (mapInPandas over (url, row_group) pieces)."""
    import http.server
    import threading

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pg_parquet_spark.sources import read_parquet

    tbl = pa.table(
        {
            "id": pa.array(range(100), pa.int64()),
            "name": pa.array([f"n{i}" for i in range(100)]),
            "score": pa.array([i / 7.0 for i in range(100)]),
        }
    )
    pq.write_table(tbl, str(tmp_path / "web.parquet"), row_group_size=30)

    handler = lambda *a, **kw: http.server.SimpleHTTPRequestHandler(  # noqa: E731
        *a, directory=str(tmp_path), **kw
    )
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/web.parquet"
        df = read_parquet(spark, url)
        got = {r.id: (r.name, r.score) for r in df.collect()}
        assert got == {i: (f"n{i}", i / 7.0) for i in range(100)}
        # 4 row groups -> 4 distributable pieces
        assert df.rdd.getNumPartitions() == 4

        # WHERE + column projection go through the shared clause path
        sub = read_parquet(spark, url, columns=["id"], where="id < 10")
        assert sorted(r.id for r in sub.collect()) == list(range(10))
    finally:
        srv.shutdown()
        srv.server_close()


def test_parquet_metadata_over_http(tmp_path, monkeypatch):
    """fs.open_parquet serves http(s) footers via ranged GETs."""
    monkeypatch.setenv("ALLOW_HTTP", "1")
    import http.server
    import threading

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pg_parquet_spark.sources import fs as _fs

    pq.write_table(
        pa.table({"x": pa.array([1, 2, 3], pa.int64())}),
        str(tmp_path / "m.parquet"),
    )
    srv = http.server.ThreadingHTTPServer(
        ("127.0.0.1", 0),
        lambda *a, **kw: http.server.SimpleHTTPRequestHandler(
            *a, directory=str(tmp_path), **kw
        ),
    )
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/m.parquet"
        pf = _fs.open_parquet(url)
        assert pf.metadata.num_rows == 3
        assert pf.schema_arrow.names == ["x"]
    finally:
        srv.shutdown()
        srv.server_close()


def test_write_parquet_over_http_put(spark, tmp_path, monkeypatch):
    """https write half (reference http store PUTs whole objects; e2e in
    the reference runs against WebDAV): write_parquet spools a single
    file locally with the full option surface, then PUTs the bytes."""
    monkeypatch.setenv("ALLOW_HTTP", "1")
    import http.server
    import threading

    import pytest

    from pg_parquet_spark.sources import read_parquet, write_parquet

    class PutHandler(http.server.SimpleHTTPRequestHandler):
        def __init__(self, *a, **kw):
            super().__init__(*a, directory=str(tmp_path), **kw)

        def do_PUT(self):
            n = int(self.headers.get("Content-Length", 0))
            dest = tmp_path / self.path.lstrip("/")
            dest.write_bytes(self.rfile.read(n))
            self.send_response(201)
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), PutHandler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        df = spark.createDataFrame(
            [(1, "x"), (2, "y"), (3, None)], "id INT, s STRING"
        )
        out = write_parquet(df, f"{base}/put.parquet", compression="zstd")
        assert out == [f"{base}/put.parquet"]
        assert (tmp_path / "put.parquet").exists()

        back = read_parquet(spark, f"{base}/put.parquet")
        assert sorted(map(tuple, back.collect())) == sorted(
            map(tuple, df.collect())
        )

        with pytest.raises(ValueError, match="single parquet file"):
            write_parquet(df, f"{base}/some_dir")
        with pytest.raises(ValueError, match="file_size_bytes"):
            write_parquet(df, f"{base}/x.parquet", file_size_bytes="2MB")
    finally:
        srv.shutdown()
        srv.server_close()


# ---------------------------------------------------------------------------
# error paths (reference src/pgrx_tests/object_store.rs exercises
# wrong-bucket, empty-glob, special-chars and bad-credential failures per
# store; the reachable subset here runs against the mem:// registry and a
# local HTTP server — the container has no network for live-cloud e2e).


def test_http_denied_without_allow_http(spark, tmp_path, monkeypatch):
    """Non-TLS http is rejected unless ALLOW_HTTP is set (http.rs:16)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from pg_parquet_spark.sources import fs as _fs
    from pg_parquet_spark.sources import read_parquet, write_parquet

    monkeypatch.delenv("ALLOW_HTTP", raising=False)
    pq.write_table(pa.table({"x": [1]}), str(tmp_path / "d.parquet"))
    with pytest.raises(ValueError, match="ALLOW_HTTP"):
        _fs.open_parquet("http://127.0.0.1:1/d.parquet")
    with pytest.raises(ValueError, match="ALLOW_HTTP"):
        read_parquet(spark, "http://127.0.0.1:1/d.parquet")
    df = spark.createDataFrame([(1,)], "x INT")
    with pytest.raises(ValueError, match="ALLOW_HTTP"):
        write_parquet(df, "http://127.0.0.1:1/d.parquet")


def test_http_404_and_range_errors(tmp_path, monkeypatch):
    """404 on a missing object and 416 on an unsatisfiable range surface
    as HTTP errors (object_store.rs wrong-bucket/key analogues)."""
    import http.server
    import threading

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest
    import requests

    from pg_parquet_spark.sources.fs import HttpRandomAccessFile, open_parquet

    monkeypatch.setenv("ALLOW_HTTP", "1")
    pq.write_table(pa.table({"x": [1, 2, 3]}), str(tmp_path / "ok.parquet"))

    class RangeHandler(http.server.SimpleHTTPRequestHandler):
        def __init__(self, *a, **kw):
            super().__init__(*a, directory=str(tmp_path), **kw)

        def send_head(self):
            # a server that 416s every ranged GET on this key (emulates
            # a store rejecting range semantics mid-read)
            if self.headers.get("Range") and "reject" in self.path:
                self.send_error(416, "Range Not Satisfiable")
                return None
            return super().send_head()

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), RangeHandler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        with pytest.raises(requests.HTTPError):
            open_parquet(f"{base}/absent.parquet")
        f = HttpRandomAccessFile(f"{base}/ok.parquet")
        # the client clamps at EOF — an unsatisfiable range is never sent
        f.seek(f.size() + 10)
        assert f.read(4) == b""
        # a server 416-ing a ranged GET surfaces as an HTTP error
        (tmp_path / "reject.parquet").write_bytes(
            (tmp_path / "ok.parquet").read_bytes()
        )
        g = HttpRandomAccessFile(f"{base}/reject.parquet")
        with pytest.raises(requests.HTTPError):
            g.read(4)
    finally:
        srv.shutdown()
        srv.server_close()


def test_http_truncated_body_detected(tmp_path, monkeypatch):
    """A server returning fewer bytes than the footer claims breaks the
    parquet magic check rather than yielding silent wrong data."""
    import http.server
    import threading

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from pg_parquet_spark.sources.fs import open_parquet

    monkeypatch.setenv("ALLOW_HTTP", "1")
    pq.write_table(pa.table({"x": list(range(50))}), str(tmp_path / "t.parquet"))
    full = (tmp_path / "t.parquet").read_bytes()

    class TruncatingHandler(http.server.BaseHTTPRequestHandler):
        def _serve(self, head_only):
            # claims the real length but truncates every body
            self.send_response(200)
            self.send_header("Content-Length", str(len(full)))
            self.end_headers()
            if not head_only:
                self.wfile.write(full[: len(full) // 2])

        def do_HEAD(self):
            self._serve(True)

        def do_GET(self):
            self._serve(False)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), TruncatingHandler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/t.parquet"
        with pytest.raises(Exception):  # noqa: B017 — chunked-read error or magic-bytes error
            open_parquet(url).read_row_group(0)
    finally:
        srv.shutdown()
        srv.server_close()


def test_http_size_probe_falls_back_to_content_length(tmp_path, monkeypatch):
    """A server with no HEAD support that ignores Range (200 + full body,
    no Content-Range) still opens: the probe's Content-Length gives the
    size (ADVICE r5), and read() slices 200-responses locally."""
    import http.server
    import threading

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pg_parquet_spark.sources.fs import open_parquet

    monkeypatch.setenv("ALLOW_HTTP", "1")
    pq.write_table(pa.table({"x": list(range(20))}), str(tmp_path / "f.parquet"))
    full = (tmp_path / "f.parquet").read_bytes()

    class NoRangeHandler(http.server.BaseHTTPRequestHandler):
        def do_HEAD(self):
            self.send_error(405)

        def do_GET(self):
            self.send_response(200)
            self.send_header("Content-Length", str(len(full)))
            self.end_headers()
            self.wfile.write(full)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), NoRangeHandler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/f.parquet"
        pf = open_parquet(url)
        assert pf.metadata.num_rows == 20
        assert pf.read().column("x").to_pylist() == list(range(20))
    finally:
        srv.shutdown()
        srv.server_close()


def test_http_file_session_ownership_and_closed_flag(tmp_path, monkeypatch):
    """close() only closes self-created sessions and flips .closed
    (ADVICE r5: a shared session must survive one reader's close)."""
    import http.server
    import threading

    import pyarrow as pa
    import pyarrow.parquet as pq
    import requests

    from pg_parquet_spark.sources.fs import HttpRandomAccessFile

    monkeypatch.setenv("ALLOW_HTTP", "1")
    pq.write_table(pa.table({"x": [1, 2]}), str(tmp_path / "s.parquet"))
    srv = http.server.ThreadingHTTPServer(
        ("127.0.0.1", 0),
        lambda *a, **kw: http.server.SimpleHTTPRequestHandler(
            *a, directory=str(tmp_path), **kw
        ),
    )
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/s.parquet"
        shared = requests.Session()
        a = HttpRandomAccessFile(url, session=shared)
        assert a.closed is False
        a.close()
        assert a.closed is True
        # shared session still usable by a second reader
        b = HttpRandomAccessFile(url, session=shared)
        b.seek(0)
        assert len(b.read(4)) == 4
        b.close()
        own = HttpRandomAccessFile(url)
        own.close()
        assert own.closed is True
        own.close()  # idempotent
    finally:
        srv.shutdown()
        srv.server_close()


def test_mem_store_wrong_bucket_and_empty_glob(mem_store):
    """Wrong-bucket and empty-glob behavior on a registered store
    (object_store.rs wrong-bucket / pattern-with-no-match tests)."""
    import pytest

    from pg_parquet_spark.sources.reader import _check_glob

    assert pgfs.glob("mem://nosuchbucket/*.parquet") == []
    with pytest.raises(FileNotFoundError, match="no files found"):
        _check_glob("mem://nosuchbucket/*.parquet")
    assert pgfs.glob(f"{mem_store}/absent-dir/**/*.parquet") == []


def test_mem_store_special_chars_in_path(mem_store, tmp_path):
    """Keys containing spaces/plus/percent survive the fs registry round
    trip (object_store.rs special-chars-in-uri tests)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    special = tmp_path / "bucket" / "a b+c%d"
    special.mkdir(parents=True)
    pq.write_table(pa.table({"a": [9]}), str(special / "weird name.parquet"))
    uri = f"{mem_store}/a b+c%d/weird name.parquet"
    got = pgfs.glob(uri)
    assert got == [uri]
    pf = pgfs.open_parquet(uri)
    assert pf.metadata.num_rows == 1
