"""Route registry + OpenAPI builder tests (pkg/common/api.go:165-968 and
the /v1/docs + /v1/openapi.json endpoints, services/api/main.go:862-930)."""

import json
import urllib.request

from thecrowler_ray.api_docs import (
    APIRoute,
    build_openapi_spec,
    make_operation_id,
    query_params_from_schema,
    short_summary,
    tags_for_route,
)
from thecrowler_ray.api_server import ApiConfig, ApiServer


def test_helpers():
    assert make_operation_id("get", "/v1/search/general") == \
        "get_v1_search_general"
    assert make_operation_id("get", "/") == "get_root"
    assert make_operation_id("post", "/v1/items/{id}") == "post_v1_items__id_"
    assert short_summary("  x  ") == "x"
    assert len(short_summary("a" * 200)) == 80
    assert tags_for_route(APIRoute("/p", ["GET"], plugin=True)) == ["Plugins"]
    assert tags_for_route(APIRoute("/c", ["GET"], console_only=True)) == \
        ["Console"]
    assert tags_for_route(APIRoute("/a", ["GET"])) == ["API"]
    assert tags_for_route(APIRoute("/t", ["GET"], tag=["X"])) == ["X"]


def test_query_params_and_path_params():
    schema = {"type": "object",
              "properties": {"q": {"type": "string"},
                             "id": {"type": "integer"},
                             "bad": {}},
              "required": ["q"]}
    params = {p["name"]: p for p in
              query_params_from_schema(schema, "/v1/things/{id}")}
    assert params["q"]["in"] == "query" and params["q"]["required"]
    assert params["id"]["in"] == "path" and params["id"]["required"]
    assert "bad" not in params  # empty property dicts skipped


def test_build_spec_shape():
    routes = [
        APIRoute("/v1/search", ["GET"], "Search things",
                 query_type={"type": "object",
                             "properties": {"q": {"type": "string"}},
                             "required": ["q"]},
                 response_type={"type": "object"}),
        APIRoute("/v1/items", ["POST"], "Create",
                 body_type={"type": "object"}, success_status=201),
        APIRoute("", ["GET"]),  # skipped: empty path
        APIRoute("/v1/none", []),  # skipped: no methods
    ]
    spec = build_openapi_spec(routes, server_url="http://api.example/")
    assert spec["openapi"] == "3.0.3"
    assert spec["servers"] == [{"url": "http://api.example"}]
    get = spec["paths"]["/v1/search"]["get"]
    assert get["operationId"] == "get_v1_search"
    assert get["parameters"][0]["name"] == "q"
    assert "200" in get["responses"] and "400" in get["responses"]
    err = get["responses"]["500"]["content"]["application/json"]["schema"]
    assert set(err["properties"]) == {"error_code", "error", "message"}
    post = spec["paths"]["/v1/items"]["post"]
    assert post["requestBody"]["required"] is True
    assert "201" in post["responses"]
    assert "/v1/none" not in spec["paths"] and "" not in spec["paths"]


def test_docs_endpoints_live():
    srv = ApiServer("/tmp", config=ApiConfig(rate_limit="1000,1000"))
    port = srv.start()
    try:
        docs = json.load(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/v1/docs"))
        paths = {e["path"] for e in docs["endpoints"]}
        assert {"/v1/health", "/v1/search/general", "/v1/ws",
                "/v1/openapi.json"} <= paths
        ws_route = next(e for e in docs["endpoints"]
                        if e["path"] == "/v1/ws")
        assert ws_route["success_status"] == 101
        spec = json.load(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/v1/openapi.json"))
        assert spec["info"]["title"] == "CROWler Search API"
        assert "get" in spec["paths"]["/v1/search/general"]
        q = spec["paths"]["/v1/search/general"]["get"]["parameters"]
        assert any(p["name"] == "q" and p["required"] for p in q)
        login = spec["paths"]["/v1/auth/login"]["post"]
        assert login["requestBody"]["content"]["application/json"]
    finally:
        srv.close()
