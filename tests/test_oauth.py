"""OAuth flows (oauth.py) against an in-process fixture token server:
grant wire formats, TokenSource caching/refresh/rotation, the RFC 8628
device poll protocol, and an end-to-end Gmail fetch whose Bearer token
is minted by the real refresh-token flow."""

import base64
import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from thecrowler_ray.oauth import (
    OAuthError,
    TokenSource,
    client_credentials_grant,
    device_code_flow,
    gmail_token_provider,
    graph_token_provider,
    refresh_token_grant,
)


class FixtureAuth:
    """Scriptable token/device/gmail fixture. ``token_responses`` is a
    list of (status, dict) consumed per POST /token; device responses
    are fixed; gmail endpoints require the last minted access token."""

    def __init__(self, token_responses):
        self.token_responses = list(token_responses)
        self.token_requests = []  # parsed form dicts, in order
        self.minted = []  # access tokens handed out
        self.gmail_hits = []  # (path, auth header)
        srv = self

        class H(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _json(self, status, doc):
                body = json.dumps(doc).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                form = dict(urllib.parse.parse_qsl(
                    self.rfile.read(n).decode()))
                if self.path == "/device":
                    self._json(200, {
                        "device_code": "dev-123",
                        "user_code": "ABCD-EFGH",
                        "verification_uri": "https://auth.test/activate",
                        "interval": 5,
                        "expires_in": 1800,
                    })
                    return
                if self.path == "/token":
                    srv.token_requests.append(form)
                    status, doc = srv.token_responses.pop(0)
                    if "access_token" in doc:
                        srv.minted.append(doc["access_token"])
                    self._json(status, doc)
                    return
                self._json(404, {"error": "not_found"})

            def do_GET(self):
                p = urllib.parse.urlparse(self.path).path
                auth = self.headers.get("Authorization", "")
                srv.gmail_hits.append((p, auth))
                if not (srv.minted and
                        auth == "Bearer " + srv.minted[-1]):
                    self._json(401, {"error": "invalid_token"})
                    return
                if p.endswith("/gmail/v1/users/me/messages"):
                    self._json(200, {"messages": [{"id": "m1"}]})
                    return
                if "/gmail/v1/users/me/messages/" in p:
                    raw = base64.urlsafe_b64encode(
                        b"Subject: hello oauth\r\n\r\nbody text\r\n"
                    ).decode().rstrip("=")
                    self._json(200, {"id": "m1", "historyId": 7,
                                     "raw": raw})
                    return
                self._json(404, {"error": "not_found"})

        self.httpd = ThreadingHTTPServer(("127.0.0.1", 0), H)
        self.base = f"http://127.0.0.1:{self.httpd.server_address[1]}"
        threading.Thread(target=self.httpd.serve_forever,
                         daemon=True).start()

    def close(self):
        self.httpd.shutdown()
        self.httpd.server_close()


@pytest.fixture
def auth_server(request):
    servers = []

    def make(token_responses):
        s = FixtureAuth(token_responses)
        servers.append(s)
        return s

    yield make
    for s in servers:
        s.close()


def test_client_credentials_wire_format(auth_server):
    s = auth_server([(200, {"access_token": "at-1", "expires_in": 3600})])
    doc = client_credentials_grant(
        s.base + "/token", client_id="cid", client_secret="sec",
        scopes=("https://graph.microsoft.com/.default",))
    assert doc["access_token"] == "at-1"
    req = s.token_requests[0]
    assert req == {
        "grant_type": "client_credentials",
        "client_id": "cid",
        "client_secret": "sec",
        "scope": "https://graph.microsoft.com/.default",
    }


def test_refresh_grant_wire_format(auth_server):
    s = auth_server([(200, {"access_token": "at-2", "expires_in": 10,
                            "refresh_token": "rt-new"})])
    doc = refresh_token_grant(
        s.base + "/token", client_id="cid", client_secret="sec",
        refresh_token="rt-old")
    assert doc["refresh_token"] == "rt-new"
    assert s.token_requests[0]["grant_type"] == "refresh_token"
    assert s.token_requests[0]["refresh_token"] == "rt-old"


def test_error_response_raises_oauth_error(auth_server):
    s = auth_server([(400, {"error": "invalid_grant",
                            "error_description": "revoked"})])
    with pytest.raises(OAuthError) as e:
        refresh_token_grant(s.base + "/token", client_id="c",
                            refresh_token="bad")
    assert e.value.code == "invalid_grant"
    assert "revoked" in e.value.description


def test_token_source_caches_until_skew_refreshes_after():
    calls = []
    now = [0.0]

    def grant():
        calls.append(1)
        return {"access_token": f"at-{len(calls)}", "expires_in": 100}

    ts = TokenSource(grant, skew=10, clock=lambda: now[0])
    assert ts() == "at-1"
    now[0] = 50.0
    assert ts() == "at-1"  # cached: 50 < 100 - 10
    assert len(calls) == 1
    now[0] = 91.0
    assert ts() == "at-2"  # within skew of expiry → re-grant
    assert len(calls) == 2


def test_token_source_rotation_hook(auth_server):
    s = auth_server([
        (200, {"access_token": "a1", "expires_in": 0,
               "refresh_token": "rt-1"}),
        (200, {"access_token": "a2", "expires_in": 3600,
               "refresh_token": "rt-2"}),
    ])
    rotated = []
    ts = gmail_token_provider(
        s.base + "/token", client_id="c", client_secret=None,
        refresh_token="rt-0", on_rotate=rotated.append)
    ts()
    ts()  # expires_in=0 forces a second grant
    assert rotated == ["rt-1", "rt-2"]


def test_device_flow_pending_slow_down_then_success(auth_server):
    s = auth_server([
        (400, {"error": "authorization_pending"}),
        (400, {"error": "slow_down"}),
        (200, {"error": "authorization_pending"}),  # 200-body error form
        (200, {"access_token": "at-dev", "expires_in": 3600,
               "refresh_token": "rt-dev"}),
    ])
    sleeps, prompts = [], []
    doc = device_code_flow(
        s.base + "/device", s.base + "/token", client_id="cid",
        scopes=("mail.read",), on_prompt=prompts.append,
        sleep=sleeps.append, clock=lambda: 0.0)
    assert doc["access_token"] == "at-dev"
    assert prompts[0]["user_code"] == "ABCD-EFGH"
    # interval 5, +5 after slow_down (RFC 8628 §3.5)
    assert sleeps == [5, 5, 10, 10]
    polls = [r for r in s.token_requests
             if r["grant_type"].endswith("device_code")]
    assert all(r["device_code"] == "dev-123" for r in polls)


def test_device_flow_access_denied_aborts(auth_server):
    s = auth_server([(400, {"error": "access_denied"})])
    with pytest.raises(OAuthError) as e:
        device_code_flow(s.base + "/device", s.base + "/token",
                         client_id="cid", sleep=lambda _: None)
    assert e.value.code == "access_denied"


def test_device_flow_local_expiry(auth_server):
    s = auth_server([(400, {"error": "authorization_pending"})] * 3)
    now = [0.0]

    def tick(seconds):
        now[0] += 1000.0

    with pytest.raises(OAuthError) as e:
        device_code_flow(s.base + "/device", s.base + "/token",
                         client_id="cid", sleep=tick,
                         clock=lambda: now[0])
    assert e.value.code == "expired_token"


def test_gmail_end_to_end_with_minted_token(auth_server):
    from thecrowler_ray.sources.mailbox import gmail_fetch_documents

    s = auth_server([(200, {"access_token": "at-gmail",
                            "expires_in": 3600})])
    provider = gmail_token_provider(
        s.base + "/token", client_id="cid", client_secret="sec",
        refresh_token="rt-0")
    table, history = gmail_fetch_documents(
        s.base, token_provider=provider)
    assert table.num_rows == 1
    assert "hello oauth" in table["title"][0].as_py()
    assert history == 7
    # every REST hit carried the token the refresh grant minted
    assert s.gmail_hits and all(
        a == "Bearer at-gmail" for _, a in s.gmail_hits)


def test_graph_provider_is_callable_token_source(auth_server):
    s = auth_server([(200, {"access_token": "at-g", "expires_in": 3600})])
    ts = graph_token_provider(s.base + "/token", client_id="c",
                              client_secret="s")
    assert ts() == "at-g"
    assert s.token_requests[0]["scope"] == (
        "https://graph.microsoft.com/.default")
