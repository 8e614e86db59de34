"""HTTP API serving layer over a real local socket (reference
services/api/main.go: health/ready, /v1/search/general with q=dork,
rate-limit middleware, optional bearer auth)."""

import json
import urllib.error
import urllib.request

import pytest

from thecrowler_ray.api_server import ApiConfig, ApiServer


def _get(port, path, token=None):
    req = urllib.request.Request(f"http://127.0.0.1:{port}{path}")
    if token:
        req.add_header("Authorization", "Bearer " + token)
    with urllib.request.urlopen(req, timeout=5) as r:
        return r.status, json.loads(r.read())


def _fake_search(index_dir, dork, k):
    assert index_dir == "/tmp/idx"
    return [{"doc_id": 1, "url": "http://a.test/", "title": dork, "score": 2.5}][:k]


def test_health_search_and_errors():
    srv = ApiServer("/tmp/idx", ApiConfig(rate_limit="1000,1000"),
                    search_fn=_fake_search)
    port = srv.start()
    try:
        assert _get(port, "/v1/health")[1] == {"status": "ok"}
        assert _get(port, "/v1/ready/")[1] == {"status": "ok"}
        code, body = _get(port, "/v1/search/general?q=hello+world&limit=5")
        assert code == 200
        assert body["results"][0]["title"] == "hello world"
        with pytest.raises(urllib.error.HTTPError) as ei:
            _get(port, "/v1/search/general")  # missing q
        assert ei.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as ei:
            _get(port, "/v1/nope")
        assert ei.value.code == 404
    finally:
        srv.close()


def test_rate_limit_and_auth():
    srv = ApiServer(
        "/tmp/idx",
        ApiConfig(rate_limit="0.001,3", auth_token="sekret"),
        search_fn=_fake_search,
    )
    port = srv.start()
    try:
        # health bypasses both rate limit and auth
        assert _get(port, "/v1/health")[0] == 200
        # auth: wrong/missing token → 401
        with pytest.raises(urllib.error.HTTPError) as ei:
            _get(port, "/v1/search/general?q=x")
        assert ei.value.code == 401
        assert _get(port, "/v1/search/general?q=x", token="sekret")[0] == 200
        # burst=3 exhausted (401 attempt + two OKs; rate-limit is the
        # outermost middleware, reference main.go:1054), refill ~0 → 429 with the
        # reference's error string
        _get(port, "/v1/search/general?q=x", token="sekret")
        with pytest.raises(urllib.error.HTTPError) as ei:
            _get(port, "/v1/search/general?q=x", token="sekret")
        assert ei.value.code == 429
        assert json.loads(ei.value.read())["error"] == "Rate limit exceeded"
    finally:
        srv.close()


def test_handler_error_is_500_and_server_survives():
    def boom(index_dir, dork, k):
        raise RuntimeError("kaput")

    srv = ApiServer("/tmp/idx", ApiConfig(rate_limit="1000,1000"), search_fn=boom)
    port = srv.start()
    try:
        with pytest.raises(urllib.error.HTTPError) as ei:
            _get(port, "/v1/search/general?q=x")
        assert ei.value.code == 500
        assert _get(port, "/v1/health")[0] == 200  # still alive
    finally:
        srv.close()


def test_rate_burst_parsing():
    assert ApiConfig(rate_limit="10,10").rate_burst() == (10, 10)
    assert ApiConfig(rate_limit="5").rate_burst() == (5, 10)  # main.go:111-113
    assert ApiConfig(rate_limit="").rate_burst() == (10, 10)


@pytest.mark.usefixtures("ray_session")
def test_real_search_backend(tmp_path):
    """End-to-end: build a small index with the real pipeline, serve it,
    query over the socket."""
    import glob
    import shutil

    from thecrowler_ray.pipelines.crawl import CrawlRun, EngineConfig
    from thecrowler_ray.pipelines.index import index_pages
    from thecrowler_ray.sources.synthweb import CorpusConfig, seed_urls

    crawl_out = str(tmp_path / "crawl")
    cfg = CorpusConfig(seed=42, n_hosts=4, base_pages=25)
    CrawlRun(
        cfg, seed_urls(cfg, 3),
        EngineConfig(max_links=60, max_waves=4, out_dir=crawl_out,
                     n_seen_shards=2, n_pol_shards=2, fetch_concurrency=2),
    ).run()
    pages = sorted(glob.glob(f"{crawl_out}/wave=*/pages/*.parquet"))
    index_dir = str(tmp_path / "index")
    index_pages(pages, index_dir)

    srv = ApiServer(index_dir, ApiConfig(rate_limit="1000,1000"))
    port = srv.start()
    try:
        code, body = _get(port, "/v1/search/general?q=page&limit=3")
        assert code == 200
        assert 0 < len(body["results"]) <= 3
        assert {"doc_id", "url", "title", "score"} <= set(body["results"][0])
    finally:
        srv.close()


@pytest.mark.usefixtures("ray_session")
def test_timeseries_endpoint_real_backend():
    """/v1/timeseries runs the real bucket-aggregate pipeline over an
    events parquet table and returns JSON-safe rows."""
    srv = ApiServer("/root/testdata/sf0.001", ApiConfig(rate_limit="1000,1000"))
    port = srv.start()
    try:
        code, body = _get(port, "/v1/timeseries?bucket=h")
        assert code == 200
        rows = body["results"]
        assert len(rows) > 0
        r0 = rows[0]
        assert {"bucket", "metric", "n", "sum_value", "p50"} <= set(r0)
        assert isinstance(r0["bucket"], str)  # timestamps serialized
        # 'table' is a logical name under index_dir, never a raw path:
        # traversal outside the index dir is rejected, not read
        try:
            code, body = _get(port,
                              "/v1/timeseries?table=../../../etc/passwd")
        except urllib.error.HTTPError as e:
            code, body = e.code, json.loads(e.read())
        assert code != 200
        assert "invalid table" in body.get("error", "")
        # explicit logical name (with or without .parquet suffix) works
        code, body = _get(port, "/v1/timeseries?table=events.parquet")
        assert code == 200 and len(body["results"]) > 0
    finally:
        srv.close()


def test_cors_middleware():
    """pkg/common/cors.go semantics on the API server: disabled →
    pass-through without CORS headers; enabled exact-match origin echo +
    Vary; wildcard → '*'; preflight 204 / 403; private-network echo."""
    import urllib.request

    from thecrowler_ray.api_server import ApiConfig, ApiServer, CorsConfig

    def req(port, method="GET", path="/v1/health", headers=None):
        r = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}", method=method,
            headers=headers or {})
        try:
            resp = urllib.request.urlopen(r)
            return resp.status, dict(resp.headers)
        except urllib.error.HTTPError as e:
            return e.code, dict(e.headers)

    srv = ApiServer("/tmp", config=ApiConfig(rate_limit="1000,1000"))
    port = srv.start()
    try:
        _, h = req(port, headers={"Origin": "https://app.example"})
        assert "Access-Control-Allow-Origin" not in h  # disabled
    finally:
        srv.close()

    srv = ApiServer("/tmp", config=ApiConfig(rate_limit="1000,1000"),
                    cors=CorsConfig(enabled=True,
                                    allowed_origins=["https://app.example"]))
    port = srv.start()
    try:
        _, h = req(port, headers={"Origin": "https://app.example"})
        assert h["Access-Control-Allow-Origin"] == "https://app.example"
        assert "Origin" in h.get("Vary", "")
        assert h["Access-Control-Max-Age"] == "86400"
        # non-matching origin on a plain request: request proceeds, no
        # Allow-Origin header (the Go middleware quirk)
        code, h2 = req(port, headers={"Origin": "https://evil.example"})
        assert code == 200 and "Access-Control-Allow-Origin" not in h2
        # preflights
        code, h3 = req(port, method="OPTIONS",
                       headers={"Origin": "https://app.example",
                                "Access-Control-Request-Private-Network":
                                    "True"})
        assert code == 204
        assert h3["Access-Control-Allow-Private-Network"] == "true"
        code, _ = req(port, method="OPTIONS",
                      headers={"Origin": "https://evil.example"})
        assert code == 403
    finally:
        srv.close()

    srv = ApiServer("/tmp", config=ApiConfig(rate_limit="1000,1000"),
                    cors=CorsConfig(enabled=True, allowed_origins=["*"]))
    port = srv.start()
    try:
        _, h = req(port, headers={"Origin": "https://whoever.example"})
        assert h["Access-Control-Allow-Origin"] == "*"
    finally:
        srv.close()


@pytest.mark.usefixtures("ray_session")
def test_events_http_surface():
    """/v1/event/* endpoints over the EventBus actor
    (services/events/main.go:579-1160) incl. the forgiving
    removeEventsBefore timestamp parse and event.created ws broadcast."""
    import json as _json
    import urllib.request

    import ray

    from thecrowler_ray.api_server import ApiConfig, ApiServer
    from thecrowler_ray.state.events import event_bus
    from thecrowler_ray.ws import Client as WsClient
    from thecrowler_ray.ws import WSConfig

    bus = event_bus("t_events_http_bus")
    srv = ApiServer("/tmp", config=ApiConfig(rate_limit="1000,1000"),
                    ws_config=WSConfig(enabled=True,
                                       allowed_origins=["*"]),
                    events_bus=bus)
    port = srv.start()
    spy = WsClient(srv.ws_hub, sock=None)
    srv.ws_hub._clients.add(spy)

    def call(op, method="GET", body=None, query=""):
        data = _json.dumps(body).encode() if body is not None else None
        r = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/event/{op}{query}",
            data=data, method=method,
            headers={"Content-Type": "application/json"})
        try:
            resp = urllib.request.urlopen(r)
            return resp.status, _json.load(resp)
        except urllib.error.HTTPError as e:
            return e.code, _json.load(e)

    try:
        code, out = call("create", "POST",
                         {"action": "recrawl", "type": "content_change",
                          "severity": "medium",
                          "details": {"url": "https://x.test"}})
        assert code == 200 and out["msg"] == "Event created successfully"
        eid = out["id"]
        # ws broadcast fired
        frame = spy.send.get_nowait()
        assert b"event.created" in frame
        code, out = call("check", query=f"?event_id={eid}")
        assert code == 200 and out["event"]["action"] == "recrawl"
        code, out = call("update", "POST",
                         {"event_id": eid, "severity": "high"})
        assert code == 200
        assert ray.get(bus.get.remote(eid))["severity"] == "high"
        code, out = call("list")
        assert any(e["event_id"] == eid for e in out["events"])
        code, out = call("schedule", "POST",
                         {"name": "ts", "action": "timeseries_aggregate",
                          "every_seconds": 60})
        assert code == 200
        # forgiving timestamp parse: missing/garbage → 400; date works
        code, _ = call("removeEventsBefore", query="?timestamp=junk")
        assert code == 400
        code, out = call("removeEventsBefore",
                         query="?timestamp=2999-01-01")
        assert code == 200 and out["removed"] >= 1
        code, _ = call("check", query=f"?event_id={eid}")
        assert code == 404
        code, _ = call("remove", query="?event_id=12345")
        assert code == 200  # idempotent like the SQL DELETE
        code, _ = call("nonsense")
        assert code == 404
    finally:
        srv.close()


def test_source_console_roundtrip(tmp_path):
    """/v1/source/* admin surface (services/api/main.go:706-725) over the
    parquet registry on a real socket: add (GET q + POST body) -> status ->
    statuses/filter -> update -> remove -> vacuum, with console status
    codes (201/200/204) and persistence across server instances."""
    import urllib.request

    def call(port, path, method="GET", body=None):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}", method=method,
            data=json.dumps(body).encode() if body is not None else None)
        if body is not None:
            req.add_header("Content-Type", "application/json")
        try:
            with urllib.request.urlopen(req, timeout=5) as r:
                raw = r.read()
                return r.status, json.loads(raw) if raw else None
        except urllib.error.HTTPError as e:
            raw = e.read()
            return e.code, json.loads(raw) if raw else None

    srv = ApiServer(str(tmp_path), ApiConfig(rate_limit="1000,1000"))
    port = srv.start()
    try:
        # GET add with console defaults (restricted=2, pending)
        code, body = call(port, "/v1/source/add?q=https://A.example.test/")
        assert code == 201 and body["source_id"] == 1
        # POST add with explicit fields
        code, body = call(port, "/v1/source/add", "POST",
                          {"url": "https://b.example.test", "priority":
                           "high", "restricted": 1, "category_id": 3})
        assert code == 201 and body["source_id"] == 2
        # missing q -> 400
        code, body = call(port, "/v1/source/add")
        assert code == 400 and "Missing parameter 'q'" in body["message"]

        code, body = call(port,
                          "/v1/source/status?q=https://a.example.test")
        assert code == 200 and body["message"] == "All Sources status"
        assert len(body["items"]) == 1
        row = body["items"][0]
        assert row["url"] == "https://a.example.test"  # normalized
        assert row["status"] == "pending" and row["restricted"] == 2
        assert len(row["source_uid"]) == 64

        code, body = call(port, "/v1/source/statuses")
        assert code == 200 and len(body["items"]) == 2
        code, body = call(port, "/v1/source/statuses/filter?q=b.example")
        assert len(body["items"]) == 1 and body["items"][0]["restricted"] == 1

        code, _ = call(port, "/v1/source/update", "POST",
                       {"url": "https://a.example.test",
                        "status": "completed"})
        assert code == 204
        code, body = call(port,
                          "/v1/source/status?q=https://a.example.test")
        assert body["items"][0]["status"] == "completed"

        code, _ = call(port, "/v1/source/remove?q=https://b.example.test")
        assert code == 204
        # removing again fails with the console message
        code, body = call(port, "/v1/source/remove?q=https://b.example.test")
        assert code == 500 and body["message"] == \
            "Failed to remove the source"
        code, _ = call(port, "/v1/source/vacuum")
        assert code == 204
    finally:
        srv.close()

    # registry persisted: a fresh server over the same index_dir sees it
    srv2 = ApiServer(str(tmp_path), ApiConfig(rate_limit="1000,1000"))
    port2 = srv2.start()
    try:
        code, body = call(port2, "/v1/source/statuses")
        assert code == 200 and [r["url"] for r in body["items"]] == \
            ["https://a.example.test"]
        # export round-trip through /v1/docs registry (routes registered)
        code, body = call(port2, "/v1/docs")
        paths = {r["path"] for r in body["endpoints"]}
        assert {"/v1/source/add", "/v1/source/remove", "/v1/source/status",
                "/v1/source/statuses"} <= paths
    finally:
        srv2.close()
