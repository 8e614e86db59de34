"""CDP network-event collection — the live half of M21 (XHR/CDP).

Mirrors the reference's performance-log event fold
(`pkg/crawler/web.go:2303-2447` listenForCDPEvents / StartCDPLogging):

- ``Network.requestWillBeSent`` appends a request record
  (object_type/requestId/type/url/method/headers/request_body/
  request_content_type, with the mimeType → headers → detected
  fallback chain);
- ``Network.responseReceived`` updates the FIRST record with a matching
  requestId (url, status, response_headers, response_content_type,
  response_body with the DB-safe guard → ``[binary data omitted]``);
- ``Network.loadingFinished`` pulls the full body through the
  ``body_fetcher`` seam (vdi.GetResponseBody in the reference), decodes
  it and overwrites response_body/response_type; an empty body skips
  the record untouched (web.go:2424).

Body decode (`decodeBodyContent`, web.go:2886-2964): base64 decode
(failures keep the raw string), anti-XSSI prefix strip
(web.go:2966-2982 verbatim), JSON parse with top-level arrays/scalars
accepted. Documented deviation: the reference additionally converts
XML and HTML bodies to JSON trees (xmlToJSON / scraper.ExtractHTMLData);
here those come back raw with their detected type — the conversion is a
presentation step the indexing plane doesn't depend on.

`CdpWireClient` is the transport the stand-in lacked: a real
WebSocket DevTools client (RFC 6455 client handshake + masked frames
over the repo's own `ws.py` codec) that speaks
``Network.enable`` → event stream → fold. In the sandbox it is
exercised against an in-process fixture DevTools server
(tests/test_cdp.py), the same fixture-transport pattern as the mail and
HTTP clients; on a cluster it points at a real browser's
``webSocketDebuggerUrl``.
"""

from __future__ import annotations

import base64
import json
import socket
import struct
import threading
import urllib.parse

from .ws import encode_frame, read_frame

_FRAME_LIMIT = 16 << 20  # DevTools bodies routinely exceed ws.py's 4 KiB


class _BufferedSock:
    """recv() that drains bytes received alongside the handshake first —
    a server's 101 response and its first frame can share a TCP segment."""

    def __init__(self, sock: socket.socket, leftover: bytes = b""):
        self._sock = sock
        self._buf = leftover

    def recv(self, n: int) -> bytes:
        if self._buf:
            out, self._buf = self._buf[:n], self._buf[n:]
            return out
        return self._sock.recv(n)

    def sendall(self, data: bytes) -> None:
        self._sock.sendall(data)

    def close(self) -> None:
        self._sock.close()

    def settimeout(self, t) -> None:
        self._sock.settimeout(t)


BINARY_DATA_OMITTED = "[binary data omitted]"


def _as_dict(v) -> dict:
    return v if isinstance(v, dict) else {}


def _as_str(v) -> str:
    return v if isinstance(v, str) else ""


# -- decode helpers (web.go decodeBodyContent family) -------------------------


def remove_anti_xssi(body: str) -> str:
    """web.go:2966-2982 verbatim prefix chain."""
    body = body.strip()
    if not body:
        return body
    for prefix in ("for (;;);", "while(1);", '"use strict";'):
        if body.startswith(prefix):
            body = body[len(prefix):]
    if body.startswith("J{"):
        body = body[1:]
    return body


def is_db_safe_text(v) -> bool:
    """crawler.go:1952-2013: NUL-free valid UTF-8 (None is safe)."""
    if v is None:
        return True
    if isinstance(v, bytes):
        if b"\x00" in v:
            return False
        try:
            v.decode("utf-8")
            return True
        except UnicodeDecodeError:
            return False
    if isinstance(v, str):
        return "\x00" not in v
    return True  # parsed JSON structures are DB-safe by construction


def _detect_type(body: str, url: str) -> str:
    s = body.lstrip()
    if s.startswith("<?xml"):
        return "application/xml"
    if s[:1] == "<":
        return "text/html"
    return "text/plain"


def decode_body_content(body: str, is_base64: bool, url: str = ""):
    """→ (decoded_body, detected_content_type)."""
    if is_base64:
        try:
            body = base64.standard_b64decode(body).decode(
                "utf-8", errors="replace"
            )
        except Exception:
            pass  # reference keeps the raw string on decode failure
    body_str = remove_anti_xssi(body)
    try:
        parsed = json.loads(body_str)
    except (ValueError, TypeError):
        return body, _detect_type(body_str, url)
    return parsed, "application/json"


# -- the event fold ------------------------------------------------------------


def fold_cdp_events(
    entries, *, body_fetcher=None, collected: list | None = None
) -> list[dict]:
    """Fold performance-log entries (each ``{"message": <json str|dict>}``)
    into the reference's collectedRequests records. ``body_fetcher`` is
    the vdi.GetResponseBody seam: ``requestId → (body, is_base64)``."""
    out = collected if collected is not None else []
    for entry in entries:
        message = entry.get("message")
        if isinstance(message, str):
            try:
                message = json.loads(message)
            except ValueError:
                continue
        if isinstance(message, dict) and "message" in message:
            message = message["message"]  # selenium log envelope
        if not isinstance(message, dict):
            continue
        method = message.get("method")
        params = _as_dict(message.get("params"))

        if method == "Network.requestWillBeSent":
            request = _as_dict(params.get("request"))
            request_id = params.get("requestId", "")
            url = _as_str(request.get("url"))
            headers = _as_dict(request.get("headers"))
            content_type = _as_str(request.get("mimeType")) or _as_str(
                headers.get("content-type")
            )
            decoded, detected = decode_body_content(
                _as_str(request.get("postData")), False, url
            )
            if not content_type:
                content_type = detected
            out.append(
                {
                    "object_type": "request",
                    "requestId": request_id,
                    "type": "http",
                    "url": url,
                    "method": _as_str(request.get("method")),
                    "headers": headers,
                    "request_body": decoded,
                    "request_content_type": content_type,
                }
            )

        elif method == "Network.responseReceived":
            response = _as_dict(params.get("response"))
            request_id = params.get("requestId", "")
            headers = _as_dict(response.get("headers"))
            content_type = _as_str(response.get("mimeType")) or _as_str(
                headers.get("content-type")
            )
            decoded, detected = decode_body_content(
                _as_str(response.get("body")), False, ""
            )
            if not content_type:
                content_type = detected
            if not is_db_safe_text(decoded):
                decoded = BINARY_DATA_OMITTED
            for rec in out:
                if rec["requestId"] == request_id:
                    rec["url"] = _as_str(response.get("url"))
                    rec["status"] = response.get("status", 0)
                    rec["response_headers"] = headers
                    rec["response_content_type"] = content_type
                    rec["response_body"] = decoded
                    break

        elif method == "Network.loadingFinished":
            request_id = params.get("requestId", "")
            if body_fetcher is None:
                continue
            body, is_b64 = body_fetcher(request_id)
            if not body or not isinstance(body, str):
                continue  # web.go:2424 — keep the record untouched
            decoded, detected = decode_body_content(body, is_b64, "")
            if not is_db_safe_text(decoded):
                decoded = BINARY_DATA_OMITTED
            for rec in out:
                if rec["requestId"] == request_id:
                    rec["response_body"] = decoded
                    rec["response_type"] = detected
                    break
    return out


# -- the wire client -------------------------------------------------------------


class CdpWireClient:
    """Minimal DevTools WebSocket client over the repo's RFC 6455 codec.

    connect → ``Network.enable`` (+ any extra enable commands) → drain
    the event stream → :func:`fold_cdp_events`. Client frames are masked
    per RFC 6455 §5.3; command replies (frames carrying ``id``) are
    matched to their request, everything carrying ``method`` is an
    event."""

    def __init__(self, ws_url: str, timeout: float = 5.0):
        self.ws_url = ws_url
        self.timeout = timeout
        self._sock: socket.socket | None = None
        self._next_id = 0
        self.events: list[dict] = []
        self._lock = threading.Lock()

    # handshake ---------------------------------------------------------------

    def connect(self) -> None:
        u = urllib.parse.urlparse(self.ws_url)
        if u.scheme != "ws":
            raise ValueError("only ws:// endpoints supported in-sandbox")
        host, port = u.hostname, u.port or 80
        self._sock = socket.create_connection((host, port), self.timeout)
        self._sock.settimeout(self.timeout)
        key = base64.b64encode(struct.pack(">IIII", 1, 2, 3, 4)).decode()
        path = u.path or "/"
        req = (
            f"GET {path} HTTP/1.1\r\nHost: {host}:{port}\r\n"
            "Upgrade: websocket\r\nConnection: Upgrade\r\n"
            f"Sec-WebSocket-Key: {key}\r\nSec-WebSocket-Version: 13\r\n\r\n"
        )
        self._sock.sendall(req.encode())
        resp = b""
        while b"\r\n\r\n" not in resp:
            chunk = self._sock.recv(4096)
            if not chunk:
                raise ConnectionError("handshake EOF")
            resp += chunk
        head, _, leftover = resp.partition(b"\r\n\r\n")
        status = head.split(b"\r\n", 1)[0]
        if b"101" not in status:
            raise ConnectionError(f"upgrade refused: {status!r}")
        from .ws import accept_key

        want = accept_key(key).encode()
        if want not in head:
            raise ConnectionError("bad Sec-WebSocket-Accept")
        # frames that rode in with the handshake must not be dropped
        self._sock = _BufferedSock(self._sock, leftover)

    def close(self) -> None:
        if self._sock is not None:
            try:
                self._sock.sendall(encode_frame(0x8, b"", mask=True))
            except OSError:
                pass
            self._sock.close()
            self._sock = None

    # protocol ------------------------------------------------------------------

    def command(self, method: str, params: dict | None = None) -> dict:
        """Send one command; drain events until its reply arrives."""
        self._next_id += 1
        cid = self._next_id
        msg = {"id": cid, "method": method, "params": params or {}}
        self._sock.sendall(
            encode_frame(0x1, json.dumps(msg).encode(), mask=True)
        )
        while True:
            frame = self._read_message()
            if frame is None:
                raise ConnectionError(f"EOF waiting for {method} reply")
            if frame.get("id") == cid:
                return frame
            if "method" in frame:
                self.events.append(frame)

    def drain_events(self, max_events: int = 1000,
                     until_method: str | None = None) -> list[dict]:
        """Read events until the socket idles (read timeout), EOF, the
        cap (the reference's 1000-entry XHR cap), or — only if explicitly
        requested — ``until_method``. A multi-request page produces many
        loadingFinished events; idle/cap is the correct default stop."""
        while len(self.events) < max_events:
            frame = self._read_message()
            if frame is None:  # EOF or idle timeout
                break
            if "method" in frame:
                self.events.append(frame)
                if until_method and frame["method"] == until_method:
                    break
        return self.events

    def _read_message(self) -> dict | None:
        while True:  # iterative: control-frame storms must not recurse
            try:
                opcode, payload = read_frame(self._sock, limit=_FRAME_LIMIT)
            except (OSError, ValueError):
                return None
            if opcode == 0x8:  # close
                return None
            if opcode == 0x9:  # ping → RFC 6455 requires a pong echo
                try:
                    self._sock.sendall(encode_frame(0xA, payload, mask=True))
                except OSError:
                    return None
                continue
            if opcode != 0x1:
                continue  # pong/binary/continuation: skip
            try:
                return json.loads(payload.decode("utf-8"))
            except ValueError:
                continue

    # the M21 surface -----------------------------------------------------------

    def collect_network_log(self, *, body_fetcher=None,
                            max_events: int = 1000) -> list[dict]:
        """Network.enable → drain → fold. The fetch seam defaults to
        Network.getResponseBody over this same connection."""
        self.command("Network.enable")

        def fetch(request_id: str):
            reply = self.command(
                "Network.getResponseBody", {"requestId": request_id}
            )
            result = reply.get("result") or {}
            return result.get("body", ""), bool(result.get("base64Encoded"))

        self.drain_events(max_events=max_events)
        # fold in rounds: getResponseBody replies can deliver MORE events
        # mid-fold (command() enqueues them); fold until the stream is dry
        records: list[dict] = []
        folded = 0
        while folded < len(self.events):
            chunk = self.events[folded:]
            folded = len(self.events)
            fold_cdp_events(
                [{"message": {"message": e}} for e in chunk],
                body_fetcher=body_fetcher or fetch,
                collected=records,
            )
        return records


# -- injected-XHR merge (web.go:2466-2590 collectXHRLogs) ------------------------


def _normalize_url_go(url: str) -> str:
    """cmn.NormalizeURL (pkg/common/url.go:24-32): trim, strip trailing
    slashes, lowercase."""
    return url.strip().rstrip("/").lower()


TEXT_EMPTY_TYPE = "text/empty"


def merge_xhr_logs(
    xhr_entries: list[dict],
    collected_responses: list[dict],
    max_items: int = 0,
) -> list[dict]:
    """Merge the injected-JS XHR capture (``window.__XCAP_LOG__`` entries
    ``{m,u,s,h,b,t}``) with the CDP-collected responses, mirroring
    collectXHRLogs: trim to ``max_items`` first, skip entries missing
    method or url, match on (method, status, NormalizeURL(url)), and on a
    match take the DECODED response body + its DETECTED type (the
    reference overwrites the CDP content-type with the detector's answer
    — a quirk kept verbatim). Unmatched requests carry
    ``response_body=""`` + ``text/empty``."""
    if max_items > 0 and len(xhr_entries) > max_items:
        xhr_entries = xhr_entries[:max_items]
    # decode every collected response ONCE (not per xhr entry — that is
    # O(entries × responses) JSON parses)
    prepared = []
    for resp in collected_responses:
        body = resp.get("response_body")
        if not isinstance(body, str):
            body = "" if body is None else json.dumps(body)
        decoded_resp, detected = decode_body_content(body, False, "")
        if not is_db_safe_text(decoded_resp):
            decoded_resp = BINARY_DATA_OMITTED
        prepared.append((resp.get("method"), resp.get("status"),
                         _normalize_url_go(resp.get("url", "")),
                         decoded_resp, detected))
    out: list[dict] = []
    for raw in xhr_entries:
        if not isinstance(raw, dict):
            continue
        entry = dict(raw)
        method = entry.get("m") or ""
        url = entry.get("u") or ""
        status = entry.get("s", 0)
        if not method or not url:
            continue
        decoded_req, req_type = decode_body_content(
            entry.get("b") or "", False, url
        )
        matched = False
        norm_url = _normalize_url_go(url)
        for r_method, r_status, r_url, decoded_resp, detected in prepared:
            if method == r_method and status == r_status \
                    and norm_url == r_url:
                entry["response_body"] = decoded_resp
                entry["response_content_type"] = detected
                matched = True
                break
        entry["object_type"] = "request"
        entry["type"] = entry.pop("t", None) or ""
        entry["headers"] = entry.pop("h", None) or {}
        entry["method"] = method
        entry.pop("m", None)
        entry["url"] = url
        entry.pop("u", None)
        entry["status"] = status
        entry.pop("s", None)
        entry.pop("b", None)
        entry["request_body"] = decoded_req
        entry["request_content_type"] = req_type
        if not matched:
            entry["response_body"] = ""
            entry["response_content_type"] = TEXT_EMPTY_TYPE
        out.append(entry)
    return out


# -- post-collection filter (web.go:2707-2759) -----------------------------------

ERR_UNKNOWN_CONTENT_TYPE = "unknown"
RBEE_URL = "http://127.0.0.1:3000/v1/rb"


def _type_filtered(detected: str, filter_types: list[str]) -> bool:
    """filterXHRRequests (web.go:2741-2758): membership after
    trim+lowercase of the CONFIG entries (the record's type is compared
    verbatim — the reference lowercases only the config side)."""
    if not filter_types or not detected:
        return False
    return any(
        detected == f.strip().lower() for f in filter_types
    )


def filter_xhr_requests(
    records: list[dict], filter_types: list[str]
) -> list[dict]:
    """The reference's post-collection drop rules (web.go:2707-2735):
    with no filter config, everything passes; rbee bookkeeping requests
    always drop; a record drops when both its request and response
    content types are filtered, or when one side is filtered and the
    other is the 'unknown' or 'text/empty' placeholder."""
    if not filter_types:
        return list(records)
    out = []
    for rec in records:
        if rec is None:
            continue
        if rec.get("url", "") == RBEE_URL:
            continue
        rct = rec.get("request_content_type", "") or ""
        rst = rec.get("response_content_type", "") or ""
        rct_f = _type_filtered(rct, filter_types)
        rst_f = _type_filtered(rst, filter_types)
        if (
            (rct_f and rst_f)
            or (rct == ERR_UNKNOWN_CONTENT_TYPE and rst_f)
            or (rct_f and rst == ERR_UNKNOWN_CONTENT_TYPE)
            or (rct == TEXT_EMPTY_TYPE and rst_f)
            or (rct_f and rst == TEXT_EMPTY_TYPE)
        ):
            continue
        out.append(rec)
    return out
