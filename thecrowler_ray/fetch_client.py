"""Robust HTTP fetch client (reference ``pkg/common/fetchClient.go``).

From-scratch reimplementation of the reference semantics over stdlib
``http.client`` (no third-party HTTP stack):

- ``FetchOpts`` defaults        — fetchClient.go:31-68 (30 s timeout, 16 MiB
                                  cap, 200 ms base backoff, 5 redirects,
                                  "theCROWler/1.0" UA)
- redirect policy               — :198-226 (manual loop, max_redirects,
                                  Authorization/Cookie dropped on CROSS-HOST
                                  redirects when drop_auth_on_redirect)
- retry policy                  — :258-320 (429 + 5xx + transient network
                                  errors retried with doubling backoff
                                  capped at 4 s; deterministic — the
                                  reference adds ±20 % wall-clock jitter)
- size cap                      — :288-318 (Content-Length precheck + hard
                                  limit while streaming)
- MIME allowlist                — :326-341 ("text/" prefix vs exact match)
- SSRF guard                    — genericAPIclient.go:205-235 (loopback /
                                  RFC1918 / link-local; metadata IP only in
                                  strict mode)
- ``fetch_remote_text``         — :91-149 (text allowlist, transparent
                                  gzip, BOM strip, XSSI prefix strip,
                                  HTML/JSON-error page guard, charset note)

``s3://`` URLs are an explicit capability seam (the reference gates them
behind a build tag + AWS SDK).
"""

from __future__ import annotations

import gzip as _gzip
import http.client
import ipaddress
import socket
import time
from dataclasses import dataclass, field
from urllib.parse import urlparse, urljoin

__all__ = ["FetchOpts", "FetchError", "fetch_remote_bytes",
           "fetch_remote_text", "is_private_or_meta", "mime_allowed"]

DEFAULT_UA = "theCROWler/1.0"

_TEXT_MIMES = ["text/", "application/json", "application/x-yaml",
               "application/yaml", "application/javascript",
               "application/octet-stream"]


class FetchError(Exception):
    pass


@dataclass
class FetchOpts:
    timeout: float = 30.0
    connect_timeout: float = 10.0
    ssl_mode: str = ""
    max_size: int = 16 << 20
    allowed_mimes: list = field(default_factory=list)
    headers: dict = field(default_factory=dict)
    ssrf_guard: str = ""          # "", "on", "strict"
    user_agent: str = ""
    retries: int = 0
    retry_base_delay: float = 0.2
    follow_redirects: bool = True
    max_redirects: int = 5
    drop_auth_on_redirect: bool = True

    def defaults(self) -> "FetchOpts":
        if self.timeout <= 0:
            self.timeout = 30.0
        if self.connect_timeout <= 0:
            self.connect_timeout = 10.0
        if self.max_size <= 0:
            self.max_size = 16 << 20
        if self.retry_base_delay <= 0:
            self.retry_base_delay = 0.2
        if self.max_redirects <= 0:
            self.max_redirects = 5
        if not self.user_agent:
            self.user_agent = DEFAULT_UA
        return self


def is_private_or_meta(ip_text: str, strict: bool = False) -> bool:
    """genericAPIclient.go:205-235: loopback, link-local, RFC1918 v4,
    fc00::/7 + fe80::/10 v6; the 169.254.169.254 metadata address is named
    explicitly only in strict mode (it is link-local anyway)."""
    try:
        ip = ipaddress.ip_address(ip_text)
    except ValueError:
        return True  # unparseable → treat as blocked
    if ip.is_loopback or ip.is_link_local:
        return True
    if ip.version == 4:
        if ip.is_private:
            return True
        if strict and str(ip) == "169.254.169.254":
            return True
        return False
    return ip in ipaddress.ip_network("fc00::/7") or \
        ip in ipaddress.ip_network("fe80::/10")


def mime_allowed(mt: str, allow: list) -> bool:
    """fetchClient.go:326-341: entries ending in "/" prefix-match."""
    mt = mt.strip().lower()
    for a in allow:
        a = a.strip().lower()
        if a.endswith("/"):
            if mt.startswith(a):
                return True
        elif mt == a:
            return True
    return False


def _should_retry_status(code: int) -> bool:
    return code == 429 or 500 <= code <= 599


def _backoff(d: float) -> float:
    return min(d * 2, 4.0)


def _one_request(url: str, headers: dict, opts: FetchOpts):
    """Single GET, no redirects. → (status, resp_headers, body, ctype).
    Raises FetchError on oversize; socket errors propagate (transient)."""
    p = urlparse(url)
    conn_cls = (http.client.HTTPSConnection if p.scheme == "https"
                else http.client.HTTPConnection)
    kw = {}
    if p.scheme == "https" and opts.ssl_mode in ("", "none", "ignore"):
        import ssl

        ctx = ssl.create_default_context()
        if opts.ssl_mode == "ignore":
            ctx.check_hostname = False
            ctx.verify_mode = ssl.CERT_NONE
        kw["context"] = ctx
    conn = conn_cls(p.netloc, timeout=opts.timeout, **kw)
    try:
        path = p.path or "/"
        if p.query:
            path += "?" + p.query
        conn.request("GET", path, headers=headers)
        resp = conn.getresponse()
        ctype = (resp.getheader("Content-Type") or "").strip()
        clen = resp.getheader("Content-Length")
        if clen and int(clen) > opts.max_size:
            raise FetchError(
                f"response too large: {clen} > {opts.max_size}")
        body = resp.read(opts.max_size + 1)
        if len(body) > opts.max_size:
            raise FetchError(
                f"response exceeded limit ({opts.max_size} bytes)")
        return resp.status, dict(resp.getheaders()), body, ctype
    finally:
        conn.close()


def fetch_remote_bytes(raw_url: str, opts: FetchOpts | None = None,
                       resolver=None) -> tuple[bytes, str]:
    """FetchRemoteBytes: → (body, content_type). ``resolver(host) ->
    [ip, ...]`` is the DNS seam for the SSRF guard (defaults to
    ``socket.getaddrinfo``)."""
    opts = (opts or FetchOpts()).defaults()
    if not raw_url.startswith(("http://", "https://", "s3://")):
        raise FetchError(f"unsupported scheme in URL: {raw_url}")
    if raw_url.startswith("s3://"):
        # real SigV4 client (awsv4.py); creds/endpoint from the standard
        # AWS SDK env vars — reference gates this behind the aws_s3 build
        # tag and the SDK's default credential chain (web.go:560-640)
        from .awsv4 import S3Client, S3Error

        client = S3Client.from_env()
        if client is None:
            raise FetchError(
                "s3:// fetch needs AWS credentials (AWS_ACCESS_KEY_ID / "
                "AWS_SECRET_ACCESS_KEY; AWS_ENDPOINT_URL for S3-compatible "
                "stores)")
        bucket, _, key = raw_url[5:].partition("/")
        if not bucket or not key:
            raise FetchError(f"malformed s3 URL (need s3://bucket/key): "
                             f"{raw_url}")
        try:
            return client.get_object(bucket, key)
        except S3Error as e:
            raise FetchError(str(e)) from e

    guard = opts.ssrf_guard.strip().lower()
    if guard in ("on", "strict"):
        host = urlparse(raw_url).hostname or ""
        if resolver is None:
            def resolver(h):
                return [ai[4][0] for ai in socket.getaddrinfo(h, None)]
        try:
            ips = resolver(host)
        except OSError as e:
            raise FetchError(f"DNS lookup failed for {host}: {e}") from e
        if not ips:
            raise FetchError(f"DNS lookup failed for {host}: no records")
        for ip in ips:
            if is_private_or_meta(ip, guard == "strict"):
                raise FetchError(
                    f"destination IP blocked by ssrf_guard: {ip} ({host})")

    headers = {"User-Agent": opts.user_agent, **opts.headers}
    url = raw_url
    orig_host = (urlparse(raw_url).hostname or "").lower()
    redirects = 0
    last_err: Exception | None = None
    delay = opts.retry_base_delay

    attempt = 0
    while attempt <= max(opts.retries, 0):
        try:
            status, rheaders, body, ctype = _one_request(url, headers, opts)
        except FetchError:
            raise
        except OSError as e:  # transient network error
            if attempt < opts.retries:
                time.sleep(delay)
                delay = _backoff(delay)
                last_err = e
                attempt += 1
                continue
            raise FetchError(f"request failed: {e}") from e

        if 300 <= status < 400 and opts.follow_redirects:
            loc = next((v for k, v in rheaders.items()
                        if k.lower() == "location"), "")
            redirects += 1
            if redirects > opts.max_redirects:
                raise FetchError("stopped after too many redirects")
            url = urljoin(url, loc)
            if opts.drop_auth_on_redirect and \
                    (urlparse(url).hostname or "").lower() != orig_host:
                headers.pop("Authorization", None)
                headers.pop("Cookie", None)
            continue  # redirects do not consume retry attempts

        if not (200 <= status <= 299):
            if attempt < opts.retries and _should_retry_status(status):
                time.sleep(delay)
                delay = _backoff(delay)
                last_err = FetchError(f"HTTP {status}")
                attempt += 1
                continue
            raise FetchError(f"non-2xx status: {status}")

        if opts.allowed_mimes and ctype:
            mt = ctype.split(";")[0]
            if not mime_allowed(mt, opts.allowed_mimes):
                raise FetchError(f"content-type {mt!r} not allowed")
        return body, ctype

    raise FetchError(f"request failed after retries: {last_err}")


def fetch_response(url: str, headers: dict | None = None,
                   opts: FetchOpts | None = None):
    """Single-hop GET (no redirect following, no retries) in the shape
    ``httpinfo.extract_http_info`` expects from its fetch seam:
    → (status, {header: [values]}, body_text). The reference's
    ExtractHTTPInfo drives redirects itself, so its client must surface
    3xx responses rather than follow them."""
    opts = (opts or FetchOpts()).defaults()
    h = {"User-Agent": opts.user_agent, **(headers or {})}
    status, rheaders, body, _ctype = _one_request(url, h, opts)
    multi: dict[str, list[str]] = {}
    for k, v in rheaders.items():
        multi.setdefault(k, []).append(v)
    return status, multi, body.decode("utf-8", errors="replace")


def _looks_like_html(b: bytes) -> bool:
    t = b.strip()
    return t.startswith(b"<!DOCTYPE html") or t.startswith(b"<html")


def _looks_like_json_error(b: bytes) -> bool:
    t = b.strip()
    if t.startswith(b"{") and b'"error"' in t:
        return True
    return t in (b"true", b"false", b"null")


def fetch_remote_text(raw_url: str, opts: FetchOpts | None = None,
                      resolver=None) -> str:
    """FetchRemoteText: text-MIME default allowlist, transparent gzip,
    BOM strip, XSSI-prefix strip, error-page guard."""
    opts = (opts or FetchOpts()).defaults()
    if not opts.allowed_mimes:
        opts.allowed_mimes = list(_TEXT_MIMES)
    body, ctype = fetch_remote_bytes(raw_url, opts, resolver=resolver)
    if len(body) > 2 and body[0] == 0x1F and body[1] == 0x8B:
        try:
            body = _gzip.decompress(body)
        except OSError:
            pass
    body = body.removeprefix(b"\xEF\xBB\xBF")
    i = body.find(b"\n")
    if i > 0:
        line1 = body[:i]
        if line1.startswith((b")]}',", b"while(1);", b"for(;;);")):
            body = body[i + 1:]
    if _looks_like_html(body) or _looks_like_json_error(body):
        preview = body[:200]
        raise FetchError(
            f"remote payload doesn't look like YAML (ctype={ctype!r}). "
            f"First 200 bytes: {preview!r}")
    return body.decode("utf-8", errors="replace")
