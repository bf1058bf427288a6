"""W5 — AWS credential federation for cross-cloud sinks.

Reference: ``pipeline/AWSFederatedAuthHelper.java:32-70`` exchanges the
runner's cloud identity token for AWS session credentials via STS
``AssumeRoleWithWebIdentity`` (an UNSIGNED STS call — that is the point of
web-identity federation: the web token IS the credential), then installs a
static session-credentials provider + region on the pipeline options so the
S3 sink can write to a partner-owned bucket
(``IngestionPipeline.java:164-189`` wires it when the PHA/facilitator
manifest carries an ``ingestion-identity`` role).

Spark-first shape: Spark's S3 access goes through Hadoop's S3A connector,
so "install credentials on the pipeline" means setting the S3A Hadoop conf
on the live session — ``TemporaryAWSCredentialsProvider`` plus the
access/secret/session-token triple, per-bucket-scoped so one job can write
its PHA leg and facilitator leg to buckets in DIFFERENT AWS accounts
(per-bucket config is the S3A idiom for exactly this).

The STS exchange itself is a plain HTTPS Query-API call
(``Action=AssumeRoleWithWebIdentity`` with an XML response, public AWS
API) implemented with urllib — no AWS SDK needed, and the ``endpoint``
parameter lets tests stand up a local HTTP server (same fixture pattern as
the manifest fetch). Failures map to ``FederationError`` naming the
endpoint, mirroring the manifest module's invalid-URL contract.
"""

from __future__ import annotations

import urllib.error
import urllib.parse
import urllib.request
import xml.etree.ElementTree as ET
from dataclasses import dataclass

STS_ENDPOINT = "https://sts.amazonaws.com/"
_STS_NS = "{https://sts.amazonaws.com/doc/2011-06-15/}"
DEFAULT_SESSION_NAME = "enpa-gcp-aws-session"


class FederationError(RuntimeError):
    """STS exchange failed: bad endpoint, non-200, or malformed XML
    (AWSFederatedAuthHelper.java surfaces these as IOException /
    IllegalArgumentException)."""


@dataclass(frozen=True)
class SessionCredentials:
    access_key_id: str
    secret_access_key: str
    session_token: str
    expiration: str | None = None


def assume_role_with_web_identity(
    role_arn: str,
    web_identity_token: str,
    session_name: str = DEFAULT_SESSION_NAME,
    endpoint: str = STS_ENDPOINT,
    timeout_s: float = 10.0,
) -> SessionCredentials:
    """The ``AssumeRoleWithWebIdentityRequest`` leg
    (AWSFederatedAuthHelper.java:51-62): POST the role + token to STS,
    parse the ``Credentials`` element out of the XML response. Unsigned by
    design — the web identity token authenticates the caller."""
    params = urllib.parse.urlencode(
        {
            "Action": "AssumeRoleWithWebIdentity",
            "Version": "2011-06-15",
            "RoleArn": role_arn,
            "RoleSessionName": session_name,
            "WebIdentityToken": web_identity_token,
        }
    ).encode()
    try:
        req = urllib.request.Request(
            endpoint,
            data=params,
            headers={"Content-Type": "application/x-www-form-urlencoded"},
        )
        with urllib.request.urlopen(req, timeout=timeout_s) as resp:
            body = resp.read()
    except urllib.error.HTTPError as e:
        raise FederationError(
            f"STS {endpoint!r} returned HTTP {e.code}"
        ) from e
    except (urllib.error.URLError, ValueError, OSError) as e:
        raise FederationError(f"cannot reach STS {endpoint!r}: {e}") from e

    try:
        root = ET.fromstring(body)
    except ET.ParseError as e:
        raise FederationError(f"STS {endpoint!r} returned non-XML: {e}") from e
    # tolerate both the namespaced (real STS) and bare (test fixture) forms
    creds = root.find(f".//{_STS_NS}Credentials")
    if creds is None:
        creds = root.find(".//Credentials")
    if creds is None:
        raise FederationError(
            f"STS {endpoint!r} response has no Credentials element"
        )

    def _field(name: str) -> str | None:
        el = creds.find(f"{_STS_NS}{name}")
        if el is None:
            el = creds.find(name)
        return el.text if el is not None else None

    key, secret, token = (
        _field("AccessKeyId"),
        _field("SecretAccessKey"),
        _field("SessionToken"),
    )
    if not (key and secret and token):
        raise FederationError(
            f"STS {endpoint!r} Credentials element is incomplete"
        )
    return SessionCredentials(key, secret, token, _field("Expiration"))


def setup_aws_auth(
    spark,
    role_arn: str,
    web_identity_token: str,
    region: str,
    bucket: str | None = None,
    endpoint: str = STS_ENDPOINT,
) -> SessionCredentials:
    """``setupAWSAuth`` analog (AWSFederatedAuthHelper.java:33-70): exchange
    the token, then install the session credentials on the live session's
    Hadoop conf so S3A picks them up. With ``bucket`` set, the conf is
    scoped ``fs.s3a.bucket.<name>.*`` — the per-bucket S3A idiom that lets
    the PHA and facilitator legs target buckets in different AWS accounts
    from ONE job; without it the keys apply S3A-wide."""
    creds = assume_role_with_web_identity(
        role_arn, web_identity_token, endpoint=endpoint
    )
    prefix = f"fs.s3a.bucket.{bucket}." if bucket else "fs.s3a."
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    conf.set(
        f"{prefix}aws.credentials.provider",
        "org.apache.hadoop.fs.s3a.auth.TemporaryAWSCredentialsProvider",
    )
    conf.set(f"{prefix}access.key", creds.access_key_id)
    conf.set(f"{prefix}secret.key", creds.secret_access_key)
    conf.set(f"{prefix}session.token", creds.session_token)
    conf.set(f"{prefix}endpoint.region", region)
    return creds


def setup_from_manifest(
    spark, manifest, web_identity_token: str, endpoint: str = STS_ENDPOINT
) -> SessionCredentials | None:
    """The wiring the reference does in ``IngestionPipeline.java:164-189``:
    when the data processor's manifest names an AWS role
    (``ingestion-identity``) and region, federate and scope the credentials
    to the manifest's ingestion bucket; a GCS-only manifest is a no-op."""
    if not (manifest.aws_bucket_role and manifest.aws_bucket_region):
        return None
    bucket = (
        manifest.ingestion_bucket.removeprefix("s3a://")
        .removeprefix("s3://")
        .split("/", 1)[0]
    )
    return setup_aws_auth(
        spark,
        manifest.aws_bucket_role,
        web_identity_token,
        region=manifest.aws_bucket_region,
        bucket=bucket or None,
        endpoint=endpoint,
    )
