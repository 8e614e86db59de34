"""Robust HTTP fetch client (pkg/common/fetchClient.go) against a real
in-process fixture HTTP server: redirects with cross-host auth drop, retry
on 429/5xx, size cap, MIME allowlist, SSRF guard, text post-processing
(gzip / BOM / XSSI / error-page guard)."""

import gzip
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from thecrowler_ray.fetch_client import (
    FetchError,
    FetchOpts,
    fetch_remote_bytes,
    fetch_remote_text,
    is_private_or_meta,
    mime_allowed,
)


class _Fixture(BaseHTTPRequestHandler):
    hits: dict = {}

    def log_message(self, *a):
        pass

    def do_GET(self):
        self.hits[self.path] = self.hits.get(self.path, 0) + 1
        recorded = dict(self.headers)
        routes = {
            "/ok": (200, "text/plain", b"hello"),
            "/json": (200, "application/json", b'{"a": 1}'),
            "/big": (200, "text/plain", b"x" * 4096),
            "/pdf": (200, "application/pdf", b"%PDF-"),
            "/gz": (200, "text/plain",
                    gzip.compress(b"unzipped payload")),
            "/bom": (200, "text/plain", b"\xEF\xBB\xBFdata: 1"),
            "/xssi": (200, "application/json", b")]}',\n{\"b\": 2}"),
            "/htmlerr": (200, "text/plain", b"<html><body>oops</body>"),
        }
        if self.path == "/redir":
            self.send_response(302)
            self.send_header("Location", "/ok")
            self.end_headers()
            return
        if self.path == "/redir-loop":
            self.send_response(302)
            self.send_header("Location", "/redir-loop")
            self.end_headers()
            return
        if self.path == "/flaky":
            # 503 on the first hit, 200 afterwards
            if self.hits[self.path] == 1:
                self.send_response(503)
                self.end_headers()
                return
            self._send(200, "text/plain", b"recovered")
            return
        if self.path == "/echo-auth":
            body = json.dumps(
                {"auth": recorded.get("Authorization", ""),
                 "ua": recorded.get("User-Agent", "")}).encode()
            self._send(200, "application/json", body)
            return
        if self.path in routes:
            self._send(*routes[self.path])
            return
        self.send_response(404)
        self.end_headers()

    def _send(self, code, ctype, body):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture(scope="module")
def server():
    _Fixture.hits = {}
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), _Fixture)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_port}"
    httpd.shutdown()


def test_basic_fetch_and_default_ua(server):
    body, ctype = fetch_remote_bytes(f"{server}/ok")
    assert body == b"hello" and ctype.startswith("text/plain")
    body, _ = fetch_remote_bytes(f"{server}/echo-auth")
    assert json.loads(body)["ua"] == "theCROWler/1.0"


def test_scheme_whitelist(monkeypatch):
    with pytest.raises(FetchError, match="unsupported scheme"):
        fetch_remote_bytes("ftp://x.test/a")
    # s3:// is a real SigV4 client now — without credentials it still
    # fails loudly (test_awsv4.py covers the credentialed path)
    monkeypatch.delenv("AWS_ACCESS_KEY_ID", raising=False)
    with pytest.raises(FetchError, match="credentials"):
        fetch_remote_bytes("s3://bucket/key")


def test_redirects_followed_and_bounded(server):
    body, _ = fetch_remote_bytes(f"{server}/redir")
    assert body == b"hello"
    with pytest.raises(FetchError, match="too many redirects"):
        fetch_remote_bytes(f"{server}/redir-loop",
                           FetchOpts(max_redirects=3))
    # follow_redirects=False returns... the reference treats any 3xx as
    # the final response; our client surfaces it as non-2xx
    with pytest.raises(FetchError, match="non-2xx status: 302"):
        fetch_remote_bytes(f"{server}/redir",
                           FetchOpts(follow_redirects=False))


def test_auth_dropped_on_cross_host_redirect(server):
    # same-host redirect keeps Authorization
    _Fixture.cross = False
    opts = FetchOpts(headers={"Authorization": "Bearer s3"})
    body, _ = fetch_remote_bytes(f"{server}/echo-auth", opts)
    assert json.loads(body)["auth"] == "Bearer s3"
    # cross-host (127.0.0.1 vs localhost) redirect drops it
    port = server.rsplit(":", 1)[1]

    class CrossRedir(_Fixture):
        def do_GET(self):  # noqa: N802
            if self.path == "/go":
                self.send_response(302)
                self.send_header(
                    "Location", f"http://localhost:{port}/echo-auth")
                self.end_headers()
                return
            super().do_GET()

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), CrossRedir)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        body, _ = fetch_remote_bytes(
            f"http://127.0.0.1:{httpd.server_port}/go",
            FetchOpts(headers={"Authorization": "Bearer s3"}))
        assert json.loads(body)["auth"] == ""
    finally:
        httpd.shutdown()


def test_retry_on_5xx(server):
    _Fixture.hits.pop("/flaky", None)
    with pytest.raises(FetchError, match="non-2xx status: 503"):
        fetch_remote_bytes(f"{server}/flaky")  # no retries -> first 503
    _Fixture.hits.pop("/flaky", None)
    body, _ = fetch_remote_bytes(
        f"{server}/flaky", FetchOpts(retries=2, retry_base_delay=0.01))
    assert body == b"recovered"


def test_size_cap_and_mime_allowlist(server):
    with pytest.raises(FetchError, match="too large|exceeded limit"):
        fetch_remote_bytes(f"{server}/big", FetchOpts(max_size=1024))
    with pytest.raises(FetchError, match="not allowed"):
        fetch_remote_bytes(f"{server}/pdf",
                           FetchOpts(allowed_mimes=["text/",
                                                    "application/json"]))
    assert mime_allowed("text/plain", ["text/"])
    assert mime_allowed("application/json", ["application/json"])
    assert not mime_allowed("application/jsonx", ["application/json"])


def test_ssrf_guard(server):
    # loopback blocked when guard is on (the fixture IS loopback)
    with pytest.raises(FetchError, match="blocked by ssrf_guard"):
        fetch_remote_bytes(f"{server}/ok", FetchOpts(ssrf_guard="on"))
    # a public resolution passes the guard (resolver seam)
    body, _ = fetch_remote_bytes(
        f"{server.replace('127.0.0.1', 'localhost')}/ok",
        FetchOpts(ssrf_guard="on"), resolver=lambda h: ["93.184.216.34"])
    assert body == b"hello"
    assert is_private_or_meta("10.1.2.3")
    assert is_private_or_meta("192.168.0.9")
    assert is_private_or_meta("fe80::1")
    assert not is_private_or_meta("8.8.8.8")
    assert is_private_or_meta("169.254.169.254", strict=True)


def test_fetch_text_postprocessing(server):
    assert fetch_remote_text(f"{server}/gz") == "unzipped payload"
    assert fetch_remote_text(f"{server}/bom") == "data: 1"
    assert fetch_remote_text(f"{server}/xssi") == '{"b": 2}'
    with pytest.raises(FetchError, match="doesn't look like YAML"):
        fetch_remote_text(f"{server}/htmlerr")
    # ordinary json object passes (has no "error" key)
    assert json.loads(fetch_remote_text(f"{server}/json")) == {"a": 1}


def test_fetch_response_single_hop_for_httpinfo(server):
    """fetch_response surfaces 3xx (extract_http_info drives redirects
    itself) and returns multi-valued headers + text body."""
    from thecrowler_ray.fetch_client import fetch_response

    status, headers, body = fetch_response(f"{server}/ok")
    assert status == 200 and body == "hello"
    assert headers["Content-Type"] == ["text/plain"]
    status, headers, _ = fetch_response(f"{server}/redir")
    assert status == 302 and headers["Location"] == ["/ok"]


def test_httpinfo_over_real_client(server):
    """End-to-end: ExtractHTTPInfo drives the REAL stdlib client against
    the fixture server, following the redirect itself."""
    from functools import partial

    from thecrowler_ray.fetch_client import fetch_response
    from thecrowler_ray.httpinfo import HTTPInfoConfig, extract_http_info

    def fetch(url, headers):
        return fetch_response(url, headers)

    info = extract_http_info(
        HTTPInfoConfig(url=f"{server}/redir",
                       custom_header={"User-Agent": "UA-live"}),
        fetch)
    assert info["url"].endswith("/ok")
    assert info["crowler_meta"]["redirect_status"] == 302
    assert info["response_headers"]["Content-Type"] == ["text/plain"]
