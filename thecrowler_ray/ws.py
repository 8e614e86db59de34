"""WebSocket live-update hub (reference ``pkg/ws/websocket.go``).

The reference mounts a gorilla/websocket Hub at ``/v1/ws``
(``services/api/main.go:808-810``) and broadcasts console / event
notifications (``source.added``, ``event.created``, ...) to every
connected client.  Semantics mirrored here:

- ``Defaults`` fills heartbeat_interval=30, write_queue_size=64,
  write_timeout=5 (websocket.go:45-56).
- Origin check (websocket.go:63-79): empty Origin → allow; no
  allowed list → reject; ``*`` or case-insensitive match → allow.
- ``Broadcast`` wraps payloads in ``Message{type, service, timestamp,
  payload}`` and *drops the client* when its write queue is full
  (websocket.go:106-128) — a slow console must never backpressure the
  data plane.
- Read limit 4096 bytes and a read deadline of 2× heartbeat refreshed
  by any inbound frame (websocket.go:148-160); the writer sends a ping
  every heartbeat interval (websocket.go:161-182).
- ``Shutdown`` closes every client and rejects later upgrades
  (websocket.go:130-147).

No external websocket library exists in this container, so the RFC 6455
handshake and frame codec are hand-rolled on the stdlib (sha1/base64 +
raw sockets) — ~80 lines, and the frame helpers double as the test
client.  The hub hangs off the stdlib ``ThreadingHTTPServer`` in
``api_server.py`` by duplicating the handler's socket after the 101
response, so the HTTP machinery can tear down its buffered files
without killing the live connection.
"""

from __future__ import annotations

import base64
import hashlib
import json
import queue
import socket
import struct
import threading
import time
from dataclasses import dataclass, field

_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

OP_TEXT = 0x1
OP_CLOSE = 0x8
OP_PING = 0x9
OP_PONG = 0xA

READ_LIMIT = 4096  # websocket.go:150 SetReadLimit


@dataclass
class WSConfig:
    """Mirror of the reference's ws.Config (websocket.go:14-20)."""

    enabled: bool = False
    allowed_origins: list[str] = field(default_factory=list)
    heartbeat_interval: int = 0
    write_queue_size: int = 0
    write_timeout: int = 0

    def defaults(self) -> "WSConfig":
        return WSConfig(
            enabled=self.enabled,
            allowed_origins=list(self.allowed_origins),
            heartbeat_interval=self.heartbeat_interval or 30,
            write_queue_size=self.write_queue_size or 64,
            write_timeout=self.write_timeout or 5,
        )


# -- frame codec (RFC 6455 §5) — shared by server and test client -----------

def accept_key(client_key: str) -> str:
    digest = hashlib.sha1((client_key + _GUID).encode("ascii")).digest()
    return base64.b64encode(digest).decode("ascii")


def encode_frame(opcode: int, payload: bytes, mask: bool = False) -> bytes:
    head = bytes([0x80 | opcode])
    n = len(payload)
    mask_bit = 0x80 if mask else 0
    if n < 126:
        head += bytes([mask_bit | n])
    elif n < 1 << 16:
        head += bytes([mask_bit | 126]) + struct.pack(">H", n)
    else:
        head += bytes([mask_bit | 127]) + struct.pack(">Q", n)
    if mask:
        key = struct.pack(">I", int(time.monotonic_ns()) & 0xFFFFFFFF)
        masked = bytes(b ^ key[i % 4] for i, b in enumerate(payload))
        return head + key + masked
    return head + payload


def _read_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("peer closed")
        buf += chunk
    return buf


def read_frame(sock: socket.socket, limit: int = READ_LIMIT):
    """Return (opcode, payload); unmasks client frames. Raises on EOF or
    oversized payloads (the reference's read limit closes the conn)."""
    b0, b1 = _read_exact(sock, 2)
    opcode = b0 & 0x0F
    masked = bool(b1 & 0x80)
    n = b1 & 0x7F
    if n == 126:
        n = struct.unpack(">H", _read_exact(sock, 2))[0]
    elif n == 127:
        n = struct.unpack(">Q", _read_exact(sock, 8))[0]
    if n > limit:
        raise ConnectionError(f"frame of {n} bytes exceeds read limit")
    key = _read_exact(sock, 4) if masked else b""
    payload = _read_exact(sock, n)
    if masked:
        payload = bytes(b ^ key[i % 4] for i, b in enumerate(payload))
    return opcode, payload


# -- hub ---------------------------------------------------------------------

class Client:
    """One live connection. The writer thread owns all socket writes
    (data frames from the queue, pings on heartbeat timeout, pongs queued
    by the reader) exactly like writePump (websocket.go:161-182)."""

    def __init__(self, hub: "Hub", sock: socket.socket | None):
        self.hub = hub
        self.sock = sock
        self.send: queue.Queue[bytes] = queue.Queue(
            maxsize=hub.cfg.write_queue_size)
        self._close_lock = threading.Lock()
        self._closed = False

    def start(self) -> None:
        # one socket timeout serves as both the read deadline (2×heartbeat,
        # refreshed per frame by recv semantics) and the write deadline
        self.sock.settimeout(max(self.hub.cfg.heartbeat_interval * 2,
                                 self.hub.cfg.write_timeout))
        threading.Thread(target=self._write_pump, daemon=True).start()
        threading.Thread(target=self._read_pump, daemon=True).start()

    def _write_pump(self) -> None:
        try:
            while not self._closed:
                try:
                    frame = self.send.get(
                        timeout=self.hub.cfg.heartbeat_interval)
                except queue.Empty:
                    frame = encode_frame(OP_PING, b"")
                self.sock.sendall(frame)
        except OSError:
            pass
        finally:
            self.close()

    def _read_pump(self) -> None:
        try:
            while not self._closed:
                opcode, payload = read_frame(self.sock)
                if opcode == OP_CLOSE:
                    return
                if opcode == OP_PING:
                    self._enqueue(encode_frame(OP_PONG, payload))
                # text/pong frames are drained and discarded (readPump)
        except (OSError, ConnectionError, struct.error):
            pass
        finally:
            self.close()

    def _enqueue(self, frame: bytes) -> bool:
        try:
            self.send.put_nowait(frame)
            return True
        except queue.Full:
            return False

    def close(self) -> None:
        with self._close_lock:
            if self._closed:
                return
            self._closed = True
        self.hub._unregister(self)
        if self.sock is not None:
            try:
                self.sock.close()
            except OSError:
                pass


class Hub:
    def __init__(self, service: str, cfg: WSConfig | None = None):
        self.service = service
        self.cfg = (cfg or WSConfig()).defaults()
        self._mu = threading.Lock()
        self._clients: set[Client] = set()
        self._shutdown = False

    # websocket.go:63-79
    def check_origin(self, origin: str) -> bool:
        origin = (origin or "").strip()
        if not origin:
            return True
        if not self.cfg.allowed_origins:
            return False
        return any(a.strip() == "*" or a.strip().lower() == origin.lower()
                   for a in self.cfg.allowed_origins)

    def handle_upgrade(self, req) -> None:
        """Upgrade a BaseHTTPRequestHandler request in place. Error paths
        mirror Handler (websocket.go:80-105): non-GET → 405, disabled →
        404, bad origin / bad handshake → 403 (gorilla's reject)."""
        if req.command != "GET":
            req.send_response(405)
            req.send_header("Allow", "GET")
            req.end_headers()
            return
        if not self.cfg.enabled:
            body = b"websocket disabled\n"
            req.send_response(404)
            req.send_header("Content-Length", str(len(body)))
            req.end_headers()
            req.wfile.write(body)
            return
        key = req.headers.get("Sec-WebSocket-Key", "")
        if (not key
                or req.headers.get("Upgrade", "").lower() != "websocket"
                or not self.check_origin(req.headers.get("Origin", ""))):
            req.send_response(403)
            req.send_header("Content-Length", "0")
            req.end_headers()
            return
        req.wfile.write(
            b"HTTP/1.1 101 Switching Protocols\r\n"
            b"Upgrade: websocket\r\n"
            b"Connection: Upgrade\r\n"
            b"Sec-WebSocket-Accept: " + accept_key(key).encode("ascii")
            + b"\r\n\r\n")
        req.wfile.flush()
        # Steal the connection from http.server: detach() leaves the
        # handler's socket object closed-but-harmless, so socketserver's
        # shutdown_request (which would SHUT_WR the shared connection —
        # a dup() wouldn't survive that) becomes a caught no-op.
        sock = socket.socket(fileno=req.connection.detach())
        req.close_connection = True
        client = Client(self, sock)
        with self._mu:
            if self._shutdown:
                sock.close()
                return
            self._clients.add(client)
        client.start()

    # websocket.go:106-128
    def broadcast(self, typ: str, payload) -> None:
        msg = {
            "type": typ,
            "service": self.service,
            "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S",
                                       time.gmtime())
            + f".{time.time_ns() % 1_000_000_000:09d}Z",
            "payload": payload,
        }
        try:
            frame = encode_frame(
                OP_TEXT, json.dumps(msg, default=str).encode("utf-8"))
        except (TypeError, ValueError):
            return
        with self._mu:
            clients = list(self._clients)
        for c in clients:
            if not c._enqueue(frame):
                c.close()

    def active_connections(self) -> int:
        with self._mu:
            return len(self._clients)

    def shutdown(self) -> None:
        with self._mu:
            self._shutdown = True
            clients = list(self._clients)
        for c in clients:
            c.close()

    def _unregister(self, client: Client) -> None:
        with self._mu:
            self._clients.discard(client)
