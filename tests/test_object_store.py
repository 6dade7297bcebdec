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
