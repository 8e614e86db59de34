"""Generic JSON-API HTTP client (reference ``pkg/common/genericAPIclient.go``).

``generic_api_request(params)`` takes a flat ``{str: str}`` request map —
the exact contract ``cmn.GenericAPIRequest`` exposes to the agent actions —
and returns the reference's ``APIResponse`` envelope as a JSON string:
``{"status_code": N, "body": "<raw body text>"}`` (genericAPIclient.go:69-72,
189-201).

Reference semantics mirrored (with their quirks — they are part of the
observable contract the agents were written against):

- header assembly (:96-105): the ``auth`` key becomes the ``Authorization``
  header; the ``headers`` key — a JSON blob the caller pre-serialized — is
  attached as a literal header **named** ``headers`` (the reference never
  unpacks it), so the default User-Agent check below never sees a UA inside
  it and ``theCROWler/1.0`` is always sent (:129-132).
- method defaults to GET (:108-111); body is attached verbatim when the
  ``body`` key is non-empty (:113-117).
- redirect policy (:144-157): at most 5 hops, same-host only — a cross-host
  redirect strips Authorization and then errors out ("redirect to different
  host blocked"), so callers observe an error, never the cross-host fetch.
- optional SSRF guard (:159-174): ``ssrf_guard`` = "on" | "strict" resolves
  the host and blocks private / link-local (strict: + metadata) addresses
  before connecting.
- 30 s total timeout (:135-141).

No third-party HTTP stack — stdlib ``http.client`` only.
"""

from __future__ import annotations

import http.client
import json
import socket
from urllib.parse import urlparse, urljoin

from .fetch_client import FetchError, is_private_or_meta
from .urls import is_url_valid

__all__ = ["generic_api_request"]

_REDIRECT_CODES = (301, 302, 303, 307, 308)


def _single(url: str, method: str, headers: dict, body: str | None,
            timeout: float):
    p = urlparse(url)
    conn_cls = (http.client.HTTPSConnection if p.scheme == "https"
                else http.client.HTTPConnection)
    conn = conn_cls(p.netloc, timeout=timeout)
    try:
        path = p.path or "/"
        if p.query:
            path += "?" + p.query
        conn.request(method, path, body=body or None, headers=headers)
        resp = conn.getresponse()
        return resp.status, dict(resp.getheaders()), resp.read()
    finally:
        conn.close()


def generic_api_request(params: dict) -> str:
    """cmn.GenericAPIRequest (genericAPIclient.go:80-203). ``params`` is a
    flat string map: url / method / body / auth / headers / ssrf_guard.
    Returns the APIResponse JSON string; raises FetchError on transport or
    policy failure (the Go error return)."""
    raw_url = params.get("url")
    if raw_url is None:
        raise FetchError("missing URL parameter")
    if not is_url_valid(raw_url):
        raise FetchError(f"invalid URL: {raw_url}")

    headers: dict[str, str] = {}
    if "auth" in params:
        headers["Authorization"] = params["auth"]
    if "headers" in params:
        # reference quirk: the serialized header map rides as ONE literal
        # header named "headers" (genericAPIclient.go:101-104)
        headers["headers"] = params["headers"]
    if not headers.get("User-Agent"):
        headers["User-Agent"] = "theCROWler/1.0"

    method = params.get("method") or "GET"
    body = params.get("body") or ""

    guard = (params.get("ssrf_guard") or "").strip().lower()
    if guard in ("on", "strict"):
        host = urlparse(raw_url).hostname or ""
        try:
            infos = socket.getaddrinfo(host, None)
        except OSError as e:
            raise FetchError(f"DNS lookup failed for {host}: {e}")
        ips = {i[4][0] for i in infos}
        if not ips:
            raise FetchError(f"DNS lookup failed for {host}: no addresses")
        for ip in sorted(ips):
            if is_private_or_meta(ip, strict=(guard == "strict")):
                raise FetchError(
                    f"destination IP blocked by ssrf_guard: {ip} ({host})")

    url = raw_url
    orig_host = (urlparse(raw_url).hostname or "").lower()
    hops = 0
    while True:
        try:
            status, rheaders, rbody = _single(url, method, headers, body, 30.0)
        except OSError as e:
            raise FetchError(f"failed to send request: {e}")
        if status in _REDIRECT_CODES and rheaders.get("Location"):
            hops += 1
            if hops >= 5:
                raise FetchError(
                    "failed to send request: stopped after 5 redirects")
            nxt = urljoin(url, rheaders["Location"])
            if (urlparse(nxt).hostname or "").lower() != orig_host:
                headers.pop("Authorization", None)
                raise FetchError(
                    "failed to send request: redirect to different host "
                    "blocked")
            url = nxt
            continue
        return json.dumps({"status_code": status,
                           "body": rbody.decode("utf-8", errors="replace")})
