"""A24 conf-mapping tests (no network — asserts the env→conf translation
the reference performs in src/object_store/*.rs)."""

from pg_parquet_spark.sources.object_store import object_store_confs


def test_s3_env_mapping():
    env = {
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


def test_s3_session_token_switches_provider():
    env = {
        "AWS_ACCESS_KEY_ID": "AKIA",
        "AWS_SECRET_ACCESS_KEY": "secret",
        "AWS_SESSION_TOKEN": "tok",
    }
    confs = object_store_confs(env)
    assert confs["fs.s3a.session.token"] == "tok"
    assert "TemporaryAWSCredentialsProvider" in confs["fs.s3a.aws.credentials.provider"]


def test_azure_shared_key():
    env = {"AZURE_STORAGE_ACCOUNT": "acct", "AZURE_STORAGE_KEY": "k=="}
    confs = object_store_confs(env)
    assert confs["fs.azure.account.auth.type.acct.dfs.core.windows.net"] == "SharedKey"
    assert confs["fs.azure.account.key.acct.dfs.core.windows.net"] == "k=="


def test_azure_sas():
    env = {"AZURE_STORAGE_ACCOUNT": "acct", "AZURE_STORAGE_SAS_TOKEN": "sv=..."}
    confs = object_store_confs(env)
    assert confs["fs.azure.account.auth.type.acct.dfs.core.windows.net"] == "SAS"


def test_gcs_service_account():
    env = {"GOOGLE_APPLICATION_CREDENTIALS": "/tmp/sa.json"}
    confs = object_store_confs(env)
    assert confs["fs.gs.auth.service.account.json.keyfile"] == "/tmp/sa.json"


def test_empty_env_no_confs():
    assert object_store_confs({}) == {}


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


def test_read_parquet_over_http(spark, tmp_path):
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


def test_parquet_metadata_over_http(tmp_path):
    """fs.open_parquet serves http(s) footers via ranged GETs."""
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


def test_write_parquet_over_http_put(spark, tmp_path):
    """https write half (reference http store PUTs whole objects; e2e in
    the reference runs against WebDAV): write_parquet spools a single
    file locally with the full option surface, then PUTs the bytes."""
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
