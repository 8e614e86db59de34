"""CDP network-event fold + real WebSocket DevTools client (cdp.py),
pinned to web.go:2303-2447 semantics; wire test against an in-process
fixture DevTools server (the mail/HTTP fixture-transport pattern)."""

from __future__ import annotations

import base64
import json
import socket
import threading

from thecrowler_ray.cdp import (
    BINARY_DATA_OMITTED,
    CdpWireClient,
    decode_body_content,
    fold_cdp_events,
    remove_anti_xssi,
)
from thecrowler_ray.ws import accept_key, encode_frame, read_frame


def _env(method, params):
    return {"message": json.dumps({"message": {
        "method": method, "params": params}})}


def test_fold_request_response_merge_and_fallbacks():
    entries = [
        _env("Network.requestWillBeSent", {
            "requestId": "r1",
            "request": {"url": "https://a/x", "method": "POST",
                        "headers": {"content-type": "text/plain"},
                        "postData": '{"k": 1}'},
        }),
        _env("Network.responseReceived", {
            "requestId": "r1",
            "response": {"url": "https://a/x", "status": 201,
                         "headers": {}, "mimeType": "",
                         "body": 'for (;;);{"ok": true}'},
        }),
    ]
    out = fold_cdp_events(entries)
    assert len(out) == 1
    rec = out[0]
    # request content-type: mimeType absent → headers win
    assert rec["request_content_type"] == "text/plain"
    assert rec["request_body"] == {"k": 1}  # parsed JSON
    # response: no mimeType/header → detected from XSSI-stripped JSON body
    assert rec["status"] == 201
    assert rec["response_content_type"] == "application/json"
    assert rec["response_body"] == {"ok": True}


def test_fold_binary_body_omitted_and_empty_fetch_skipped():
    entries = [
        _env("Network.requestWillBeSent",
             {"requestId": "r1", "request": {"url": "u", "method": "GET",
                                             "headers": {}}}),
        _env("Network.responseReceived",
             {"requestId": "r1",
              "response": {"url": "u", "status": 200, "headers": {},
                           "body": "bin\x00ary"}}),
        _env("Network.loadingFinished", {"requestId": "r1"}),
        _env("Network.loadingFinished", {"requestId": "r2"}),  # unknown id
    ]
    fetched = {"r1": ("", False)}  # empty → record untouched (web.go:2424)
    out = fold_cdp_events(entries, body_fetcher=lambda r: fetched.get(
        r, ("", False)))
    assert out[0]["response_body"] == BINARY_DATA_OMITTED
    assert "response_type" not in out[0]


def test_fold_loading_finished_base64_body():
    entries = [
        _env("Network.requestWillBeSent",
             {"requestId": "r1", "request": {"url": "u", "method": "GET",
                                             "headers": {}}}),
        _env("Network.loadingFinished", {"requestId": "r1"}),
    ]
    body = base64.b64encode(b'"use strict";[1, 2]').decode()
    out = fold_cdp_events(entries, body_fetcher=lambda r: (body, True))
    assert out[0]["response_body"] == [1, 2]
    assert out[0]["response_type"] == "application/json"


def test_anti_xssi_and_decode_paths():
    assert remove_anti_xssi('  while(1);{"a":1}') == '{"a":1}'
    assert remove_anti_xssi('J{"a":1}') == '{"a":1}'
    body, t = decode_body_content("<p>hi</p>", False, "")
    assert t == "text/html" and body == "<p>hi</p>"
    body, t = decode_body_content("<?xml version='1.0'?><r/>", False, "")
    assert t == "application/xml"
    body, t = decode_body_content(base64.b64encode(b"42").decode(), True, "")
    assert body == 42 and t == "application/json"


# -- fixture DevTools server ----------------------------------------------------


class _FixtureCdp(threading.Thread):
    """One-connection DevTools endpoint: replies to commands, streams the
    scripted Network events after Network.enable."""

    def __init__(self, bodies):
        super().__init__(daemon=True)
        self.bodies = bodies
        self.srv = socket.create_server(("127.0.0.1", 0))
        self.port = self.srv.getsockname()[1]

    def run(self):
        conn, _ = self.srv.accept()
        req = b""
        while b"\r\n\r\n" not in req:
            req += conn.recv(4096)
        key = [line.split(b":", 1)[1].strip() for line in req.split(b"\r\n")
               if line.lower().startswith(b"sec-websocket-key")][0]
        conn.sendall(
            b"HTTP/1.1 101 Switching Protocols\r\n"
            b"Upgrade: websocket\r\nConnection: Upgrade\r\n"
            b"Sec-WebSocket-Accept: "
            + accept_key(key.decode()).encode() + b"\r\n\r\n")

        def send(obj):
            conn.sendall(encode_frame(0x1, json.dumps(obj).encode()))

        while True:
            opcode, payload = read_frame(conn)
            if opcode == 0x8:
                break
            msg = json.loads(payload.decode())
            if msg["method"] == "Network.enable":
                send({"id": msg["id"], "result": {}})
                for rid, path in (("w1", "api"), ("w2", "api2")):
                    send({"method": "Network.requestWillBeSent", "params": {
                        "requestId": rid,
                        "request": {"url": f"https://fx/{path}",
                                    "method": "GET",
                                    "headers": {"accept": "*/*"}}}})
                    send({"method": "Network.responseReceived", "params": {
                        "requestId": rid,
                        "response": {"url": f"https://fx/{path}",
                                     "status": 200,
                                     "headers": {"content-type":
                                                 "application/json"}}}})
                    send({"method": "Network.loadingFinished",
                          "params": {"requestId": rid}})
            elif msg["method"] == "Network.getResponseBody":
                rid = msg["params"]["requestId"]
                body, b64 = self.bodies.get(rid, ("", False))
                send({"id": msg["id"],
                      "result": {"body": body, "base64Encoded": b64}})
        conn.close()


def test_wire_client_end_to_end():
    body = base64.b64encode(b'{"answer": 42}').decode()
    srv = _FixtureCdp({"w1": (body, True), "w2": ('{"n": 7}', False)})
    srv.start()
    # short timeout: drain-to-idle ends when the socket goes quiet —
    # a multi-request page must NOT stop at the first loadingFinished
    client = CdpWireClient(f"ws://127.0.0.1:{srv.port}/devtools",
                           timeout=1.0)
    client.connect()
    try:
        recs = client.collect_network_log()
    finally:
        client.close()
    assert len(recs) == 2
    rec = {r["requestId"]: r for r in recs}
    assert rec["w1"]["url"] == "https://fx/api" \
        and rec["w1"]["status"] == 200
    assert rec["w1"]["response_body"] == {"answer": 42}
    assert rec["w1"]["response_type"] == "application/json"
    assert rec["w2"]["response_body"] == {"n": 7}


def test_merge_xhr_logs_match_and_unmatched():
    from thecrowler_ray.cdp import TEXT_EMPTY_TYPE, merge_xhr_logs

    xhr = [
        {"m": "GET", "u": "https://A/api/", "s": 200,
         "h": {"x": "1"}, "b": '{"q":1}', "t": "xhr"},
        {"m": "POST", "u": "https://a/missing", "s": 404, "t": "fetch"},
        {"m": "", "u": "https://a/skip", "s": 200},   # dropped: no method
    ]
    responses = [
        # matches entry 0: method+status equal, URL equal after
        # trim/trailing-slash/lowercase normalization
        {"method": "GET", "url": "https://a/api", "status": 200,
         "response_body": 'J{"ok":true}'},
    ]
    out = merge_xhr_logs(xhr, responses)
    assert len(out) == 2
    a, b = out
    assert a["response_body"] == {"ok": True}
    assert a["response_content_type"] == "application/json"  # detected type
    assert a["request_body"] == {"q": 1} and a["type"] == "xhr"
    assert a["headers"] == {"x": "1"}
    assert all(k not in a for k in ("m", "u", "s", "h", "b", "t"))
    assert b["response_body"] == "" \
        and b["response_content_type"] == TEXT_EMPTY_TYPE


def test_merge_xhr_logs_max_items_trim():
    from thecrowler_ray.cdp import merge_xhr_logs

    xhr = [{"m": "GET", "u": f"https://a/{i}", "s": 200} for i in range(5)]
    out = merge_xhr_logs(xhr, [], max_items=3)
    assert [e["url"] for e in out] == [f"https://a/{i}" for i in range(3)]


def test_filter_xhr_requests_rules():
    from thecrowler_ray.cdp import RBEE_URL, filter_xhr_requests

    recs = [
        {"url": "https://a/1", "request_content_type": "text/html",
         "response_content_type": "text/html"},          # both filtered
        {"url": "https://a/2", "request_content_type": "unknown",
         "response_content_type": "text/html"},          # unknown + filtered
        {"url": "https://a/3", "request_content_type": "text/empty",
         "response_content_type": "text/html"},          # empty + filtered
        {"url": "https://a/4", "request_content_type": "application/json",
         "response_content_type": "text/html"},          # one real → keep
        {"url": RBEE_URL, "request_content_type": "application/json",
         "response_content_type": "application/json"},   # rbee → drop
        {"url": "https://a/5", "request_content_type": "unknown",
         "response_content_type": "application/json"},   # unknown + unfiltered → keep
    ]
    # config entries are trimmed + lowercased before comparison
    out = filter_xhr_requests(recs, ["  TEXT/HTML "])
    assert [r["url"] for r in out] == ["https://a/4", "https://a/5"]
    # no filter config → everything (incl. rbee) passes through verbatim
    assert filter_xhr_requests(recs, []) == recs


def test_fold_hostile_inputs_never_raise():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    leaf = st.one_of(
        st.none(), st.integers(), st.text(max_size=8), st.booleans(),
        st.sampled_from(["Network.requestWillBeSent",
                         "Network.responseReceived",
                         "Network.loadingFinished"]))
    obj = st.recursive(
        leaf, lambda c: st.one_of(
            st.lists(c, max_size=3),
            st.dictionaries(st.sampled_from(
                ["message", "method", "params", "request", "response",
                 "requestId", "url", "headers", "postData", "body",
                 "status", "mimeType"]), c, max_size=4)),
        max_leaves=12)

    @given(st.lists(st.dictionaries(
        st.sampled_from(["message", "other"]), obj, max_size=2), max_size=6))
    @settings(max_examples=150, deadline=None)
    def run(entries):
        out = fold_cdp_events(entries, body_fetcher=lambda r: ("x", False))
        assert isinstance(out, list)

    run()
