"""W5 — AWS web-identity federation (AWSFederatedAuthHelper.java:32-70):
STS AssumeRoleWithWebIdentity exchange against a local STS stand-in, and
installation of the session credentials on the live session's S3A conf
(per-bucket scoped, so PHA and facilitator legs can target different AWS
accounts)."""

from __future__ import annotations

import http.server
import threading
import urllib.parse

import pytest

from exposure_notifications_private_analytics_ingestion_spark.plans.federation import (
    FederationError,
    assume_role_with_web_identity,
    setup_aws_auth,
    setup_from_manifest,
)
from exposure_notifications_private_analytics_ingestion_spark.plans.manifest import (
    DataProcessorManifest,
)

STS_XML = """<AssumeRoleWithWebIdentityResponse
    xmlns="https://sts.amazonaws.com/doc/2011-06-15/">
  <AssumeRoleWithWebIdentityResult>
    <Credentials>
      <AccessKeyId>ASIAFIXTUREKEY</AccessKeyId>
      <SecretAccessKey>fixture-secret</SecretAccessKey>
      <SessionToken>fixture-session-token</SessionToken>
      <Expiration>2026-01-01T00:00:00Z</Expiration>
    </Credentials>
  </AssumeRoleWithWebIdentityResult>
</AssumeRoleWithWebIdentityResponse>"""


@pytest.fixture()
def sts_server():
    seen = {}

    class H(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            seen.update(urllib.parse.parse_qs(self.rfile.read(n).decode()))
            if self.path == "/broken":
                body, code = b"<notxml", 200
            elif self.path == "/empty":
                body, code = b"<Response></Response>", 200
            elif self.path == "/denied":
                body, code = b"AccessDenied", 403
            else:
                body, code = STS_XML.encode(), 200
            self.send_response(code)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_address[1]}", seen
    finally:
        srv.shutdown()


def test_assume_role_exchange(sts_server):
    url, seen = sts_server
    creds = assume_role_with_web_identity(
        "arn:aws:iam::1:role/ingest", "the-web-token", endpoint=f"{url}/"
    )
    assert creds.access_key_id == "ASIAFIXTUREKEY"
    assert creds.secret_access_key == "fixture-secret"
    assert creds.session_token == "fixture-session-token"
    assert creds.expiration == "2026-01-01T00:00:00Z"
    # the request carried the unsigned web-identity exchange, as the
    # reference builds it (AWSFederatedAuthHelper.java:51-62)
    assert seen["Action"] == ["AssumeRoleWithWebIdentity"]
    assert seen["RoleArn"] == ["arn:aws:iam::1:role/ingest"]
    assert seen["WebIdentityToken"] == ["the-web-token"]
    assert seen["RoleSessionName"] == ["enpa-gcp-aws-session"]


def test_federation_error_contract(sts_server):
    url, _ = sts_server
    with pytest.raises(FederationError, match="HTTP 403"):
        assume_role_with_web_identity("r", "t", endpoint=f"{url}/denied")
    with pytest.raises(FederationError, match="non-XML"):
        assume_role_with_web_identity("r", "t", endpoint=f"{url}/broken")
    with pytest.raises(FederationError, match="no Credentials"):
        assume_role_with_web_identity("r", "t", endpoint=f"{url}/empty")
    with pytest.raises(FederationError, match="cannot reach"):
        assume_role_with_web_identity("r", "t", endpoint="http://127.0.0.1:1/")


def test_setup_aws_auth_scopes_s3a_conf(spark, sts_server):
    url, _ = sts_server
    creds = setup_aws_auth(
        spark,
        "arn:aws:iam::1:role/ingest",
        "tok",
        region="us-east-1",
        bucket="pha-ingest",
        endpoint=f"{url}/",
    )
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = "fs.s3a.bucket.pha-ingest."
    assert (
        conf.get(f"{p}aws.credentials.provider")
        == "org.apache.hadoop.fs.s3a.auth.TemporaryAWSCredentialsProvider"
    )
    assert conf.get(f"{p}access.key") == creds.access_key_id
    assert conf.get(f"{p}secret.key") == "fixture-secret"
    assert conf.get(f"{p}session.token") == "fixture-session-token"
    assert conf.get(f"{p}endpoint.region") == "us-east-1"
    # unscoped S3A conf untouched — other buckets keep their own identity
    assert conf.get("fs.s3a.access.key") is None


def test_setup_from_manifest(spark, sts_server):
    url, seen = sts_server
    m = DataProcessorManifest(
        ingestion_bucket="s3a://facilitator-bucket/prefix",
        aws_bucket_role="arn:aws:iam::2:role/facilitator",
        aws_bucket_region="eu-west-1",
    )
    creds = setup_from_manifest(spark, m, "tok2", endpoint=f"{url}/")
    assert creds is not None
    assert seen["RoleArn"] == ["arn:aws:iam::2:role/facilitator"]
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    assert (
        conf.get("fs.s3a.bucket.facilitator-bucket.endpoint.region")
        == "eu-west-1"
    )
    # GCS-only manifest (no AWS identity) is a no-op, as in the reference
    gcs = DataProcessorManifest(ingestion_bucket="gs://bucket")
    assert setup_from_manifest(spark, gcs, "tok2", endpoint=f"{url}/") is None
