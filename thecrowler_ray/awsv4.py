"""AWS Signature Version 4 signing + a minimal S3 client (stdlib only).

The reference's S3 transports (screenshot upload ``web.go:605-706``,
``s3://`` fetch in the generic API client) delegate to the AWS SDK; this
container has neither boto3 nor egress, so those were loud seams. This
module closes them with a from-scratch implementation of the PUBLIC
SigV4 signing algorithm (AWS "Signature Version 4 signing process"
documentation; the same canonicalization every SDK implements):

1. canonical request: METHOD, URI-encoded path (segments encoded,
   ``/`` kept), sorted+encoded query, sorted lowercase headers, signed
   header list, hex SHA-256 of the payload;
2. string-to-sign: ``AWS4-HMAC-SHA256`` + timestamp + credential scope
   ``date/region/service/aws4_request`` + hex SHA-256 of (1);
3. signing key: chained HMAC-SHA256 over ``AWS4+secret`` → date →
   region → service → ``aws4_request``; signature = HMAC(key, (2)).

Verified in tests against AWS's published known-answer vector
(the ``AKIDEXAMPLE`` GET example) and round-tripped against a fixture
S3 server whose verifier recomputes the signature independently.

``S3Client`` speaks path-style S3 REST (GET/PUT object) against any
endpoint — AWS proper or an S3-compatible store; ``from_env()`` reads
the standard AWS SDK environment variables (``AWS_ACCESS_KEY_ID``,
``AWS_SECRET_ACCESS_KEY``, ``AWS_SESSION_TOKEN``, ``AWS_REGION``,
``AWS_ENDPOINT_URL`` — all public SDK conventions).
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import hmac
import os
import urllib.error
import urllib.parse
import urllib.request

_ALGO = "AWS4-HMAC-SHA256"


def _uri_encode(s: str, *, keep_slash: bool) -> str:
    safe = "-_.~" + ("/" if keep_slash else "")
    return urllib.parse.quote(s, safe=safe)


def _canonical_query(query: str) -> str:
    pairs = urllib.parse.parse_qsl(query, keep_blank_values=True)
    enc = sorted(
        (_uri_encode(k, keep_slash=False), _uri_encode(v, keep_slash=False))
        for k, v in pairs
    )
    return "&".join(f"{k}={v}" for k, v in enc)


def _hmac(key: bytes, msg: str) -> bytes:
    return hmac.new(key, msg.encode(), hashlib.sha256).digest()


def sign_request(
    method: str,
    url: str,
    headers: dict[str, str],
    payload: bytes,
    *,
    access_key: str,
    secret_key: str,
    region: str,
    service: str = "s3",
    session_token: str | None = None,
    now: _dt.datetime | None = None,
) -> dict[str, str]:
    """Return ``headers`` plus ``X-Amz-Date``, ``x-amz-content-sha256``
    (s3 requires it), optional ``X-Amz-Security-Token``, and the
    ``Authorization`` header. ``now`` is injectable for known-answer
    tests."""
    parts = urllib.parse.urlsplit(url)
    t = now or _dt.datetime.now(_dt.timezone.utc)
    amz_date = t.strftime("%Y%m%dT%H%M%SZ")
    datestamp = t.strftime("%Y%m%d")

    out = dict(headers)
    out.setdefault("Host", parts.netloc)
    out["X-Amz-Date"] = amz_date
    payload_hash = hashlib.sha256(payload).hexdigest()
    if service == "s3":
        out["x-amz-content-sha256"] = payload_hash
    if session_token:
        out["X-Amz-Security-Token"] = session_token

    lower = sorted((k.lower(), " ".join(v.split()))
                   for k, v in out.items())
    canonical_headers = "".join(f"{k}:{v}\n" for k, v in lower)
    signed_headers = ";".join(k for k, _ in lower)
    # S3 signs the request path AS SENT (encoded exactly once by the
    # caller); re-encoding here would double-encode 'a b' -> 'a%2520b'
    # and yield SignatureDoesNotMatch for keys with space/%/+/= chars.
    # Every other AWS service double-encodes per the SigV4 spec.
    canonical_uri = (parts.path or "/") if service == "s3" \
        else _uri_encode(parts.path or "/", keep_slash=True)
    canonical_request = "\n".join([
        method.upper(),
        canonical_uri,
        _canonical_query(parts.query),
        canonical_headers,
        signed_headers,
        payload_hash,
    ])

    scope = f"{datestamp}/{region}/{service}/aws4_request"
    string_to_sign = "\n".join([
        _ALGO,
        amz_date,
        scope,
        hashlib.sha256(canonical_request.encode()).hexdigest(),
    ])

    key = _hmac(("AWS4" + secret_key).encode(), datestamp)
    key = _hmac(key, region)
    key = _hmac(key, service)
    key = _hmac(key, "aws4_request")
    signature = hmac.new(key, string_to_sign.encode(),
                         hashlib.sha256).hexdigest()

    out["Authorization"] = (
        f"{_ALGO} Credential={access_key}/{scope}, "
        f"SignedHeaders={signed_headers}, Signature={signature}"
    )
    return out


class S3Error(Exception):
    def __init__(self, status: int, message: str):
        self.status = status
        super().__init__(f"S3 HTTP {status}: {message}")


class S3Client:
    """Minimal path-style S3 REST client over ``urllib`` + SigV4."""

    def __init__(self, *, access_key: str, secret_key: str,
                 region: str = "us-east-1",
                 endpoint_url: str | None = None,
                 session_token: str | None = None,
                 timeout: float = 30.0):
        self.access_key = access_key
        self.secret_key = secret_key
        self.region = region
        self.endpoint = (endpoint_url
                         or f"https://s3.{region}.amazonaws.com").rstrip("/")
        self.session_token = session_token
        self.timeout = timeout

    @classmethod
    def from_env(cls, env=os.environ) -> "S3Client | None":
        """Standard AWS SDK variables; None when no credentials are set
        (callers keep their loud no-credentials error)."""
        ak = env.get("AWS_ACCESS_KEY_ID", "")
        sk = env.get("AWS_SECRET_ACCESS_KEY", "")
        if not ak or not sk:
            return None
        return cls(
            access_key=ak, secret_key=sk,
            region=env.get("AWS_REGION",
                           env.get("AWS_DEFAULT_REGION", "us-east-1")),
            endpoint_url=env.get("AWS_ENDPOINT_URL") or None,
            session_token=env.get("AWS_SESSION_TOKEN") or None,
        )

    def _request(self, method: str, bucket: str, key: str,
                 payload: bytes = b"",
                 extra_headers: dict[str, str] | None = None):
        url = f"{self.endpoint}/{bucket}/{_uri_encode(key, keep_slash=True)}"
        headers = sign_request(
            method, url, extra_headers or {}, payload,
            access_key=self.access_key, secret_key=self.secret_key,
            region=self.region, service="s3",
            session_token=self.session_token)
        req = urllib.request.Request(url, data=payload or None,
                                     method=method)
        for k, v in headers.items():
            req.add_header(k, v)
        try:
            return urllib.request.urlopen(req, timeout=self.timeout)
        except urllib.error.HTTPError as e:
            body = e.read().decode("utf-8", "replace")[:512]
            raise S3Error(e.code, body) from e

    def get_object(self, bucket: str, key: str) -> tuple[bytes, str]:
        """→ (body, content_type)."""
        with self._request("GET", bucket, key) as resp:
            return (resp.read(),
                    resp.headers.get("Content-Type",
                                     "application/octet-stream"))

    def put_object(self, bucket: str, key: str, data: bytes,
                   content_type: str = "application/octet-stream") -> None:
        with self._request("PUT", bucket, key, payload=data,
                           extra_headers={"Content-Type": content_type}):
            pass
