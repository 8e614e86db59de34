"""SigV4 signer + minimal S3 client (awsv4.py).

Three layers of evidence: AWS's published known-answer vector (the
``AKIDEXAMPLE`` IAM GET example), a fixture S3 server whose verifier
RECOMPUTES the signature independently of the client implementation,
and end-to-end drives of the two wired seams (s3:// fetch in
fetch_client.py, screenshot upload in screenshot.py)."""

import datetime as dt
import hashlib
import hmac
import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from thecrowler_ray.awsv4 import S3Client, S3Error, sign_request

AK, SK, REGION = "AKIDFIXTURE", "fixture-secret-key", "eu-west-2"


def test_known_answer_vector():
    """AWS's documented example request must produce the documented
    signature byte-for-byte."""
    hdrs = sign_request(
        "GET",
        "https://iam.amazonaws.com/?Action=ListUsers&Version=2010-05-08",
        {"Content-Type":
         "application/x-www-form-urlencoded; charset=utf-8"},
        b"",
        access_key="AKIDEXAMPLE",
        secret_key="wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY",
        region="us-east-1", service="iam",
        now=dt.datetime(2015, 8, 30, 12, 36, 0, tzinfo=dt.timezone.utc),
    )
    assert hdrs["Authorization"] == (
        "AWS4-HMAC-SHA256 "
        "Credential=AKIDEXAMPLE/20150830/us-east-1/iam/aws4_request, "
        "SignedHeaders=content-type;host;x-amz-date, "
        "Signature=5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e"
        "06b5924a6f2b5d7")


def _verify_sigv4(method, path, query, headers, payload, secret):
    """Independent server-side verifier: rebuilds the canonical request
    from the RAW HTTP request (not from the client's code paths) and
    recomputes the signature per the public spec."""
    auth = headers["Authorization"]
    assert auth.startswith("AWS4-HMAC-SHA256 ")
    fields = dict(p.strip().split("=", 1)
                  for p in auth[len("AWS4-HMAC-SHA256 "):].split(","))
    _, date_scope, region, service, _ = fields["Credential"].split("/")
    signed = fields["SignedHeaders"].split(";")
    canon_headers = "".join(
        f"{h}:{' '.join(headers[h].split())}\n" for h in signed)
    qs = "&".join(sorted(
        f"{urllib.parse.quote(k, safe='-_.~')}="
        f"{urllib.parse.quote(v, safe='-_.~')}"
        for k, v in urllib.parse.parse_qsl(query, keep_blank_values=True)))
    # S3 signs the raw request path verbatim (single-encoded as sent);
    # other services double-encode per the SigV4 spec
    canon_path = path if service == "s3" \
        else urllib.parse.quote(path, safe="/-_.~")
    creq = "\n".join([
        method, canon_path, qs,
        canon_headers, fields["SignedHeaders"],
        hashlib.sha256(payload).hexdigest()])
    sts = "\n".join([
        "AWS4-HMAC-SHA256", headers["X-Amz-Date"],
        f"{date_scope}/{region}/{service}/aws4_request",
        hashlib.sha256(creq.encode()).hexdigest()])
    key = ("AWS4" + secret).encode()
    for part in (date_scope, region, service, "aws4_request"):
        key = hmac.new(key, part.encode(), hashlib.sha256).digest()
    want = hmac.new(key, sts.encode(), hashlib.sha256).hexdigest()
    return hmac.compare_digest(want, fields["Signature"])


class FixtureS3:
    def __init__(self):
        self.objects = {}  # (bucket, key) -> (bytes, content_type)
        self.bad_sig = 0
        srv = self

        class H(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _hdrs(self):
                return {k: v for k, v in self.headers.items()}

            def _check(self, payload):
                u = urllib.parse.urlsplit(self.path)
                hdrs = {k: v for k, v in self.headers.items()}
                # http.server lower-cases nothing; index case-insensitively
                ci = {k.lower(): v for k, v in hdrs.items()}
                canon = {h: ci[h] for h in
                         ("host", "x-amz-date", "x-amz-content-sha256",
                          "content-type", "authorization")
                         if h in ci}
                canon["Authorization"] = ci["authorization"]
                canon["X-Amz-Date"] = ci["x-amz-date"]
                ok = _verify_sigv4(self.command, u.path, u.query,
                                   canon, payload, SK)
                if not ok:
                    srv.bad_sig += 1
                return ok

            def do_GET(self):
                if not self._check(b""):
                    self.send_error(403, "SignatureDoesNotMatch")
                    return
                _, bucket, key = self.path.split("/", 2)
                if (bucket, key) not in srv.objects:
                    self.send_error(404, "NoSuchKey")
                    return
                body, ctype = srv.objects[(bucket, key)]
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_PUT(self):
                n = int(self.headers.get("Content-Length", 0))
                payload = self.rfile.read(n)
                if not self._check(payload):
                    self.send_error(403, "SignatureDoesNotMatch")
                    return
                _, bucket, key = self.path.split("/", 2)
                srv.objects[(bucket, key)] = (
                    payload,
                    self.headers.get("Content-Type",
                                     "application/octet-stream"))
                self.send_response(200)
                self.send_header("Content-Length", "0")
                self.end_headers()

        self.httpd = ThreadingHTTPServer(("127.0.0.1", 0), H)
        self.base = f"http://127.0.0.1:{self.httpd.server_address[1]}"
        threading.Thread(target=self.httpd.serve_forever,
                         daemon=True).start()

    def close(self):
        self.httpd.shutdown()
        self.httpd.server_close()


@pytest.fixture
def s3_server():
    s = FixtureS3()
    yield s
    s.close()


def _client(s):
    return S3Client(access_key=AK, secret_key=SK, region=REGION,
                    endpoint_url=s.base)


def test_put_get_roundtrip_with_server_side_verification(s3_server):
    c = _client(s3_server)
    c.put_object("bkt", "dir/file.json", b'{"a": 1}',
                 content_type="application/json")
    body, ctype = c.get_object("bkt", "dir/file.json")
    assert body == b'{"a": 1}'
    assert ctype == "application/json"
    assert s3_server.bad_sig == 0


def test_wrong_secret_rejected(s3_server):
    bad = S3Client(access_key=AK, secret_key="wrong", region=REGION,
                   endpoint_url=s3_server.base)
    with pytest.raises(S3Error) as e:
        bad.put_object("bkt", "k", b"x")
    assert e.value.status == 403


def test_missing_key_maps_to_s3error(s3_server):
    with pytest.raises(S3Error) as e:
        _client(s3_server).get_object("bkt", "nope")
    assert e.value.status == 404


def test_fetch_remote_bytes_s3_end_to_end(s3_server, monkeypatch):
    from thecrowler_ray.fetch_client import fetch_remote_bytes

    s3_server.objects[("corpus", "doc.txt")] = (b"hello s3", "text/plain")
    monkeypatch.setenv("AWS_ACCESS_KEY_ID", AK)
    monkeypatch.setenv("AWS_SECRET_ACCESS_KEY", SK)
    monkeypatch.setenv("AWS_REGION", REGION)
    monkeypatch.setenv("AWS_ENDPOINT_URL", s3_server.base)
    body, ctype = fetch_remote_bytes("s3://corpus/doc.txt")
    assert body == b"hello s3"
    assert ctype == "text/plain"
    assert s3_server.bad_sig == 0


def test_screenshot_s3_backend_end_to_end(s3_server, monkeypatch):
    from thecrowler_ray.screenshot import FileStorageAPI, write_data_to_s3

    monkeypatch.setenv("AWS_ACCESS_KEY_ID", AK)
    monkeypatch.setenv("AWS_SECRET_ACCESS_KEY", SK)
    monkeypatch.setenv("AWS_REGION", REGION)
    monkeypatch.setenv("AWS_ENDPOINT_URL", s3_server.base)
    url = write_data_to_s3("shot-1.png", b"\x89PNGdata",
                           FileStorageAPI(path="screens"))
    assert url == "s3://screens/shot-1.png"
    stored, ctype = s3_server.objects[("screens", "shot-1.png")]
    assert stored == b"\x89PNGdata"
    assert ctype == "image/png"


def test_from_env_requires_credentials():
    assert S3Client.from_env(env={}) is None
    c = S3Client.from_env(env={
        "AWS_ACCESS_KEY_ID": AK, "AWS_SECRET_ACCESS_KEY": SK,
        "AWS_REGION": "us-west-1"})
    assert c is not None and c.region == "us-west-1"
    assert c.endpoint == "https://s3.us-west-1.amazonaws.com"


def test_special_char_keys_roundtrip(s3_server):
    # keys with space / % / + / = / non-ASCII must sign correctly: S3's
    # canonical URI is the single-encoded wire path, NOT re-encoded
    # (the old double-encoding bug turned 'a b' into 'a%2520b')
    c = _client(s3_server)
    for key in ["a b/c d.txt", "pct%file", "plus+file", "eq=file",
                "uni-é€.bin"]:
        c.put_object("bkt", key, b"payload-" + key.encode())
        body, _ = c.get_object("bkt", key)
        assert body == b"payload-" + key.encode(), key
    assert s3_server.bad_sig == 0
