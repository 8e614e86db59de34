"""WebSocket hub tests mirroring the reference's pkg/ws/websocket_test.go:
connect + broadcast delivery + cleanup, rejected origin, slow-client drop
when the write queue fills, shutdown closes connections — plus the /v1/ws
mount on the API server (services/api/main.go:808-810)."""

import base64
import json
import os
import socket
import time

from thecrowler_ray.api_server import ApiConfig, ApiServer
from thecrowler_ray.ws import (
    OP_CLOSE,
    OP_TEXT,
    Client,
    Hub,
    WSConfig,
    accept_key,
    encode_frame,
    read_frame,
)


def _start_server(ws_cfg):
    srv = ApiServer("/tmp", config=ApiConfig(rate_limit="1000,1000"),
                    ws_config=ws_cfg)
    port = srv.start()
    return srv, port


def _dial(port, origin=None, path="/v1/ws", extra_headers=()):
    """Minimal RFC 6455 client handshake; returns (socket, status, headers)."""
    sock = socket.create_connection(("127.0.0.1", port), timeout=5)
    key = base64.b64encode(os.urandom(16)).decode("ascii")
    lines = [f"GET {path} HTTP/1.1", "Host: 127.0.0.1",
             "Upgrade: websocket", "Connection: Upgrade",
             f"Sec-WebSocket-Key: {key}", "Sec-WebSocket-Version: 13"]
    if origin:
        lines.append(f"Origin: {origin}")
    lines.extend(extra_headers)
    sock.sendall(("\r\n".join(lines) + "\r\n\r\n").encode("ascii"))
    # read the HTTP response head
    head = b""
    while b"\r\n\r\n" not in head:
        chunk = sock.recv(4096)
        if not chunk:
            break
        head += chunk
    status = int(head.split(b" ", 2)[1]) if head else 0
    headers = {}
    for line in head.split(b"\r\n")[1:]:
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.decode().strip().lower()] = v.decode().strip()
    return sock, status, headers, key


def _wait(cond, timeout=5.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if cond():
            return True
        time.sleep(0.01)
    return cond()


def test_connection_message_delivery_and_cleanup():
    srv, port = _start_server(WSConfig(
        enabled=True, allowed_origins=["https://app.example"],
        heartbeat_interval=1, write_queue_size=2))
    try:
        sock, status, headers, key = _dial(port, origin="https://app.example")
        assert status == 101
        assert headers["sec-websocket-accept"] == accept_key(key)
        assert _wait(lambda: srv.ws_hub.active_connections() == 1)
        srv.ws_hub.broadcast("test.update", {"ok": "true"})
        opcode, payload = read_frame(sock)
        while opcode != OP_TEXT:  # skip heartbeat pings
            opcode, payload = read_frame(sock)
        msg = json.loads(payload)
        assert msg["type"] == "test.update"
        assert msg["service"] == "api"
        assert msg["payload"] == {"ok": "true"}
        assert msg["timestamp"].endswith("Z")
        sock.close()
        assert _wait(lambda: srv.ws_hub.active_connections() == 0)
    finally:
        srv.close()


def test_rejected_origin():
    srv, port = _start_server(WSConfig(
        enabled=True, allowed_origins=["https://app.example"]))
    try:
        sock, status, _, _ = _dial(port, origin="https://evil.example")
        assert status == 403
        sock.close()
        assert srv.ws_hub.active_connections() == 0
    finally:
        srv.close()


def test_disabled_hub_404():
    srv, port = _start_server(WSConfig(enabled=False))
    try:
        sock, status, _, _ = _dial(port)
        assert status == 404
        sock.close()
    finally:
        srv.close()


def test_slow_client_dropped_when_queue_full():
    # mirror of the reference's direct-injection test: a client with no
    # writer draining its queue_size=1 queue is dropped on the 2nd send
    hub = Hub("test", WSConfig(enabled=True, allowed_origins=["*"],
                               write_queue_size=1))
    c = Client(hub, sock=None)
    hub._clients.add(c)
    hub.broadcast("one", None)
    assert hub.active_connections() == 1
    hub.broadcast("two", None)
    assert hub.active_connections() == 0


def test_shutdown_closes_connections():
    srv, port = _start_server(WSConfig(
        enabled=True, allowed_origins=["*"], heartbeat_interval=1))
    try:
        sock, status, _, _ = _dial(port)
        assert status == 101
        assert _wait(lambda: srv.ws_hub.active_connections() == 1)
        srv.ws_hub.shutdown()
        assert srv.ws_hub.active_connections() == 0
        # hub rejects upgrades after shutdown
        sock2, status2, _, _ = _dial(port)
        if status2 == 101:  # handshake completed but connection is dropped
            sock2.settimeout(2)
            try:
                opcode, _ = read_frame(sock2)
                assert opcode == OP_CLOSE
            except (ConnectionError, OSError):
                pass
        assert srv.ws_hub.active_connections() == 0
        sock.close()
        sock2.close()
    finally:
        srv.close()


def test_origin_rules():
    # websocket.go:63-79: empty origin allowed; no list → reject;
    # "*" and case-insensitive match allowed
    h = Hub("t", WSConfig(enabled=True))
    assert h.check_origin("")
    assert not h.check_origin("https://a.example")
    h2 = Hub("t", WSConfig(enabled=True, allowed_origins=["*"]))
    assert h2.check_origin("https://anything.example")
    h3 = Hub("t", WSConfig(enabled=True,
                           allowed_origins=["https://App.Example"]))
    assert h3.check_origin("https://app.example")


def test_client_ping_gets_pong():
    srv, port = _start_server(WSConfig(
        enabled=True, allowed_origins=["*"], heartbeat_interval=30))
    try:
        sock, status, _, _ = _dial(port)
        assert status == 101
        assert _wait(lambda: srv.ws_hub.active_connections() == 1)
        sock.sendall(encode_frame(0x9, b"hb", mask=True))
        opcode, payload = read_frame(sock)
        assert opcode == 0xA and payload == b"hb"
        sock.close()
    finally:
        srv.close()


def test_defaults():
    cfg = WSConfig().defaults()
    assert (cfg.heartbeat_interval, cfg.write_queue_size,
            cfg.write_timeout) == (30, 64, 5)


def test_ws_upgrade_requires_auth_when_token_set():
    # reference mounts /v1/ws behind withMiddlewares incl. auth.Middleware
    # (services/api/main.go:809,1100-1110): unauthenticated upgrades 401
    srv = ApiServer("/tmp", config=ApiConfig(rate_limit="1000,1000",
                                             auth_token="sekrit"),
                    ws_config=WSConfig(enabled=True, allowed_origins=["*"]))
    port = srv.start()
    try:
        sock, status, _, _ = _dial(port)
        assert status == 401
        assert srv.ws_hub.active_connections() == 0
        sock.close()
        sock, status, _, _ = _dial(
            port, extra_headers=["Authorization: Bearer sekrit"])
        assert status == 101
        assert _wait(lambda: srv.ws_hub.active_connections() == 1)
        sock.close()
    finally:
        srv.close()
