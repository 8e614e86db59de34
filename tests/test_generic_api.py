"""Generic JSON-API client (pkg/common/genericAPIclient.go) and the agent
actions that ride it — api_request, ai_interaction (llm_provider.go),
run_command (action_run_command.go + execute_isolated_linux.go) — against a
real in-process fixture HTTP server and real subprocesses."""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from thecrowler_ray.agents import (
    AgentActionError,
    JobEngine,
    go_fmt,
    resolve_response_string,
    resolve_value,
)
from thecrowler_ray.fetch_client import FetchError
from thecrowler_ray.generic_api import generic_api_request


class _Api(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def _reply(self, code, body: bytes, ctype="application/json"):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path == "/echo":
            out = json.dumps({
                "method": "GET",
                "auth": self.headers.get("Authorization", ""),
                "ua": self.headers.get("User-Agent", ""),
                "hdr_blob": self.headers.get("headers", ""),
            }).encode()
            self._reply(200, out)
        elif self.path == "/redir":
            self.send_response(302)
            self.send_header("Location", "/echo")
            self.end_headers()
        elif self.path == "/redir-cross":
            self.send_response(302)
            self.send_header("Location", "http://localhost:1/echo")
            self.end_headers()
        elif self.path == "/redir-loop":
            self.send_response(302)
            self.send_header("Location", "/redir-loop")
            self.end_headers()
        elif self.path == "/notjson":
            self._reply(200, b"plain text", ctype="text/plain")
        else:
            self._reply(404, b"{}")

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        raw = self.rfile.read(n)
        if self.path == "/v1/completions":
            try:
                payload = json.loads(raw or b"{}")
            except ValueError:
                payload = {}
            out = json.dumps({
                "echo_payload": payload,
                "auth": self.headers.get("Authorization", ""),
                "choices": [{"text": "42"}],
            }).encode()
            self._reply(200, out)
        else:
            self._reply(200, json.dumps({"posted": raw.decode()}).encode())


@pytest.fixture(scope="module")
def server():
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), _Api)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_port}"
    httpd.shutdown()


# ---------------------------------------------------------------------------
# generic_api_request — genericAPIclient.go semantics


def test_get_defaults_and_header_blob_quirk(server):
    # default method GET, default UA theCROWler/1.0; the 'headers' param
    # rides as ONE literal header named "headers" (:101-104)
    resp = json.loads(generic_api_request({
        "url": f"{server}/echo",
        "auth": "Bearer tok",
        "headers": json.dumps({"X-Custom": "1"}),
    }))
    assert resp["status_code"] == 200
    body = json.loads(resp["body"])
    assert body["method"] == "GET"
    assert body["auth"] == "Bearer tok"
    assert body["ua"] == "theCROWler/1.0"
    assert json.loads(body["hdr_blob"]) == {"X-Custom": "1"}


def test_missing_and_invalid_url():
    with pytest.raises(FetchError, match="missing URL"):
        generic_api_request({})
    with pytest.raises(FetchError, match="invalid URL"):
        generic_api_request({"url": "notaurl"})


def test_same_host_redirect_followed_cross_host_blocked(server):
    resp = json.loads(generic_api_request({"url": f"{server}/redir"}))
    assert resp["status_code"] == 200
    with pytest.raises(FetchError, match="different host"):
        generic_api_request({"url": f"{server}/redir-cross"})
    with pytest.raises(FetchError, match="5 redirects"):
        generic_api_request({"url": f"{server}/redir-loop"})


def test_ssrf_guard_blocks_private(server):
    with pytest.raises(FetchError, match="blocked by ssrf_guard"):
        generic_api_request({"url": f"{server}/echo", "ssrf_guard": "on"})


def test_post_body_attached(server):
    resp = json.loads(generic_api_request({
        "url": f"{server}/post", "method": "POST", "body": "hello",
    }))
    assert json.loads(resp["body"]) == {"posted": "hello"}


# ---------------------------------------------------------------------------
# api_request action — action_run_api_request.go over the real client


def test_api_request_action_end_to_end(server):
    eng = JobEngine()
    out = eng.execute_job([{
        "action": "api_request",
        "params": {"url": f"{server}/echo", "auth": "Bearer live"},
    }])
    assert out["status"] == "success"
    assert out["message"] == "API request successful"
    # the action's output is the parsed APIResponse envelope
    # (action_run_api_request.go:146-152)
    assert out["output"]["status_code"] == 200
    body = json.loads(out["output"]["body"])
    # reference quirk: the action's whole header map (incl. Authorization,
    # UA "CROWler") rides as ONE literal header named "headers"
    # (genericAPIclient.go:101-104) — the wire Authorization stays empty
    # and the client's own default UA is what the server sees
    assert body["auth"] == ""
    assert body["ua"] == "theCROWler/1.0"
    blob = json.loads(body["hdr_blob"])
    assert blob["User-Agent"] == "CROWler"
    assert blob["Authorization"] == "Bearer live"


def test_api_request_action_errors(server):
    eng = JobEngine()
    with pytest.raises(ValueError, match="missing 'url'"):
        eng.execute_job([{"action": "api_request", "params": {}}])
    # a non-JSON body still succeeds: the parsed map is the APIResponse
    # ENVELOPE (always valid JSON), body stays a raw string
    out = eng.execute_job([{
        "action": "api_request",
        "params": {"url": f"{server}/notjson"},
    }])
    assert out["output"] == {"status_code": 200, "body": "plain text"}
    # transport failure → error envelope on the raised exception
    try:
        eng.execute_job([{
            "action": "api_request",
            "params": {"url": "http://127.0.0.1:1/dead"},
        }])
    except AgentActionError as e:
        assert e.rval["status"] == "error"
    else:
        pytest.fail("expected AgentActionError")


def test_api_request_url_token_resolution(server):
    # $response tokens in the url resolve against the WRAPPED input doc
    # ({"input": ...}, action_run_api_request.go:66-67), so the path
    # starts with .input
    eng = JobEngine()
    out = eng.execute_job([{
        "action": "api_request",
        "params": {"url": "$response.input.endpoint",
                   "input": {"endpoint": f"{server}/echo"}},
    }])
    assert out["status"] == "success"
    # a path that skips the wrapper resolves to <nil> → invalid URL
    with pytest.raises(AgentActionError, match="invalid URL"):
        eng.execute_job([{
            "action": "api_request",
            "params": {"url": "$response.endpoint",
                       "input": {"endpoint": f"{server}/echo"}},
        }])


# ---------------------------------------------------------------------------
# ai_interaction action — action_run_ai_interaction.go + llm_provider.go


def test_ai_interaction_posts_openai_payload(server):
    eng = JobEngine()
    out = eng.execute_job([{
        "action": "ai_interaction",
        "params": {
            "input": "summarize this",
            "url": f"{server}/v1/completions",
            "model": "tiny-mini", "auth": "Bearer sk-test",
            "temperature": "0.25", "max_tokens": 64,
        },
    }])
    assert out["status"] == "success"
    # the provider returns the parsed APIResponse envelope
    # (llm_provider.go:104-109); the model's JSON rides in body
    assert out["output"]["status_code"] == 200
    reply = json.loads(out["output"]["body"])
    assert reply["echo_payload"] == {
        "model": "tiny-mini", "prompt": "summarize this",
        "temperature": 0.25, "max_tokens": 64}
    # Authorization rides the literal "headers" header (the client quirk),
    # so the wire Authorization header is empty
    assert reply["auth"] == ""
    assert reply["choices"][0]["text"] == "42"


def test_ai_interaction_config_fallback_and_messages(server):
    eng = JobEngine()
    out = eng.execute_job([{
        "action": "ai_interaction",
        "params": {
            "input": {"q": "x"},
            "messages": [{"role": "user", "content": "hi"}],
            "config": {"ai": {"url": f"{server}/v1/completions",
                              "model": "cfg-model"}},
        },
    }])
    payload = json.loads(out["output"]["body"])["echo_payload"]
    assert payload["messages"] == [{"role": "user", "content": "hi"}]
    assert payload["model"] == "cfg-model"
    assert "prompt" not in payload


def test_ai_interaction_validation_errors(server):
    eng = JobEngine()
    with pytest.raises(AgentActionError, match="missing 'prompt'"):
        eng.execute_job([{
            "action": "ai_interaction",
            "params": {"input": {"a": 1},
                       "url": f"{server}/v1/completions"},
        }])
    with pytest.raises(AgentActionError, match="missing 'url'"):
        eng.execute_job([{
            "action": "ai_interaction",
            "params": {"input": "p", "prompt": "p"},
        }])
    with pytest.raises(AgentActionError, match="valid float"):
        eng.execute_job([{
            "action": "ai_interaction",
            "params": {"input": "p", "url": f"{server}/v1/completions",
                       "temperature": "warm"},
        }])
    with pytest.raises(AgentActionError, match="unsupported AI provider"):
        eng.execute_job([{
            "action": "ai_interaction",
            "params": {"input": "p", "url": f"{server}/v1/completions",
                       "provider": "nonesuch"},
        }])


def test_ai_usage_policy_denies(server):
    eng = JobEngine()
    base = {"input": "p", "url": f"{server}/v1/completions"}
    # untrusted agent + high-trust model name → denied before any wire call
    with pytest.raises(AgentActionError, match="AI policy denied model"):
        eng.execute_job([{
            "action": "ai_interaction",
            "params": {**base, "model": "gpt-4o",
                       "config": {"agent_runtime": {"identity_snapshot": {
                           "trust_level": "untrusted"}}}},
        }])
    # contract forbids the provider by pattern
    with pytest.raises(AgentActionError, match="denied provider"):
        eng.execute_job([{
            "action": "ai_interaction",
            "params": {**base, "config": {"agent_runtime": {
                "identity_snapshot": {
                    "trust_level": "trusted",
                    "agent_contract": {
                        "forbidden_actions": ["provider:openai-*"]}}}}},
        }])
    # trusted agent, small model → allowed
    out = eng.execute_job([{
        "action": "ai_interaction",
        "params": {**base, "model": "gpt-4o-mini",
                   "config": {"agent_runtime": {"identity_snapshot": {
                       "trust_level": "trusted"}}}},
    }])
    assert out["status"] == "success"


# ---------------------------------------------------------------------------
# run_command action — real subprocess, reference argv quirk


def test_run_command_stdout_and_quirk():
    eng = JobEngine()
    # argv quirk (:159-161): ["echo", "", "a b"] — /bin/echo prints " a b"
    out = eng.execute_job([{
        "action": "run_command", "params": {"input": "echo a b"},
    }])
    assert out["status"] == "success"
    assert out["message"] == "command executed successfully"
    assert out["output"].strip().split() == ["a", "b"]


def test_run_command_params_fallback_and_errors():
    eng = JobEngine()
    out = eng.execute_job([{
        "action": "run_command", "params": {"command": "true"},
    }])
    assert out["status"] == "success"
    with pytest.raises(AgentActionError, match="exited with status"):
        eng.execute_job([{
            "action": "run_command", "params": {"input": "false"},
        }])
    with pytest.raises(AgentActionError, match="start failed"):
        eng.execute_job([{
            "action": "run_command",
            "params": {"input": "no-such-binary-xyz"},
        }])
    with pytest.raises(AgentActionError, match="empty command"):
        eng.execute_job([{
            "action": "run_command", "params": {"input": "   "},
        }])
    with pytest.raises(AgentActionError, match="invalid UID"):
        eng.execute_job([{
            "action": "run_command",
            "params": {"input": "true", "uid": "notanumber"},
        }])


def test_run_command_map_input_quirk():
    # reference quirk (action_run_command.go:131-149): a MAP input leaves
    # cmdStr empty (the map's "command" key is never read) → empty command
    eng = JobEngine()
    with pytest.raises(AgentActionError, match="empty command"):
        eng.execute_job([{
            "action": "run_command",
            "params": {"input": {"command": "echo hi"}},
        }])


# ---------------------------------------------------------------------------
# $response / {{kv}} resolution helpers — agent.go:265-354


def test_resolve_response_string_go_fmt():
    doc = {"a": {"b": 3.0}, "arr": [1, "x"], "flag": True, "m": {"k": 1}}
    assert resolve_response_string(doc, "v=$response.a.b") == "v=3"
    assert resolve_response_string(doc, "$response.arr") == "[1 x]"
    assert resolve_response_string(doc, "$response.flag") == "true"
    assert resolve_response_string(doc, "$response.m") == "map[k:1]"
    assert resolve_response_string(doc, "$response.missing.x") == "<nil>"
    # non-token strings pass through untouched
    assert resolve_response_string(doc, "plain") == "plain"


def test_resolve_kv_templates():
    class KV:
        def get(self, key):
            return {"name": "crawler"}.get(key)

    assert resolve_response_string({}, "hi {{name}}", kv=KV()) == "hi crawler"
    assert resolve_response_string({}, "{{absent}}", kv=KV()) == "{{absent}}"
    nested = resolve_value({"x": 1}, {"u": "$response.x", "l": ["$response.x"]})
    assert nested == {"u": "1", "l": ["1"]}


def test_go_fmt_scalars():
    assert go_fmt(None) == "<nil>"
    assert go_fmt(2.5) == "2.5"
    assert go_fmt(10) == "10"
    assert go_fmt([True, None]) == "[true <nil>]"
