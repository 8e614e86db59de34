"""External detection providers: request shapes, auth precedence, the
deterministic-fake transport seam, and the Ray actor-pool stage
(reference pkg/detection/3rd_party.go + detection.go:758-867)."""

import json

import pyarrow as pa
import pytest
import ray

from thecrowler_ray.extdetect import (
    ALL_PROVIDERS,
    BEARER,
    ExtDetectStage,
    ExternalDetectionConfig,
    FakeTransport,
    ProviderConfig,
    UnavailableCapabilityError,
    build_request,
    fake_resolver,
    live_transport,
)


def _cfg(**providers):
    return ExternalDetectionConfig(
        providers={k: ProviderConfig(provider=k, **v) for k, v in providers.items()}
    )


def test_request_shapes_match_reference():
    cfg = _cfg(
        abuse_ipdb={"api_key": "K1"},
        censys={"api_id": "ID", "api_secret": "SEC"},
        virus_total={"api_key": "VT"},
        shodan={"api_key": "SH"},
        cuckoo={"host": "http://cuckoo.local"},
        phish_tank={"api_key": "PT"},
    )
    r = build_request("abuse_ipdb", "1.2.3.4", cfg)
    assert r["method"] == "GET"
    assert r["url"] == "https://api.abuseipdb.com/api/v2/check?ipAddress=1.2.3.4"
    assert r["headers"]["Key"] == "K1"

    r = build_request("censys", "1.2.3.4", cfg)
    assert r["basic_auth"] == ("ID", "SEC")

    r = build_request("virus_total", "http://x.test/", cfg)
    assert r["method"] == "POST"
    assert r["url"].endswith("/vtapi/v2/url/scan")
    assert r["headers"]["x-apikey"] == "VT" and r["body"] == {"url": "http://x.test/"}

    # shodan puts a Bearer-prefixed key in the Authorization *label*
    r = build_request("shodan", "9.9.9.9", cfg)
    assert r["headers"]["Authorization"] == BEARER + "SH"

    # cuckoo targets the configured host, no auth
    r = build_request("cuckoo_url", "http://x.test/", cfg)
    assert r["url"] == "http://cuckoo.local/tasks/create/url"

    # phish_tank ships the key in the body, not a header
    r = build_request("phish_tank", "http://x.test/", cfg)
    assert r["body"]["app_key"] == "PT" and "Key" not in r["headers"]

    # safe-browsing body carries the nested threatInfo shape
    r = build_request("google_safe_browsing", "http://x.test/", cfg)
    assert r["body"]["threatInfo"]["threatEntries"] == [{"url": "http://x.test/"}]

    # every registered provider builds without error
    for p in ALL_PROVIDERS:
        assert build_request(p, "t", cfg)["method"] in ("GET", "POST")
    with pytest.raises(KeyError):
        build_request("nope", "t", cfg)


def test_live_transport_is_gated():
    with pytest.raises(UnavailableCapabilityError):
        live_transport({"provider": "X", "url": "u", "body": None})


def test_fake_transport_deterministic():
    cfg = _cfg()
    req = build_request("ssllabs", "http://a.test/", cfg)
    a, b = FakeTransport()(req), FakeTransport()(req)
    assert a == b
    assert a["query_status"] == "ok" and 0 <= a["score"] <= 100
    other = FakeTransport()(build_request("ssllabs", "http://b.test/", cfg))
    assert other != a
    assert fake_resolver("a.test") == fake_resolver("a.test")
    assert fake_resolver("a.test") != fake_resolver("b.test")


def test_stage_cache_budget_retry():
    t = FakeTransport()
    stage = ExtDetectStage(
        {"CDN": ["ssllabs"]}, ExternalDetectionConfig(), transport=t
    )
    batch = pa.table({"url": ["http://a.test/", "http://a.test/", "http://b.test/"]})
    out = stage(batch)
    assert out.num_rows == 3
    assert t.calls == 2  # per-actor cache: one call per unique target

    # budget: max_requests caps total transport calls, rows beyond get dropped
    t2 = FakeTransport()
    stage2 = ExtDetectStage(
        {"CDN": ["ssllabs"]},
        ExternalDetectionConfig(max_requests=1),
        transport=t2,
    )
    out2 = stage2(batch)
    assert t2.calls == 1 and out2.num_rows == 2  # cached url still emits

    # retry: every 2nd call fails transiently; max_retries=2 absorbs it
    t3 = FakeTransport(fail_every=2)
    stage3 = ExtDetectStage(
        {"CDN": ["ssllabs", "threat_crowd"]},
        ExternalDetectionConfig(max_retries=2),
        transport=t3,
    )
    out3 = stage3(pa.table({"url": ["http://a.test/"]}))
    assert out3.num_rows == 2


def test_ip_provider_merges_per_ip():
    calls = []

    def transport(req):
        calls.append(req["url"])
        return {"ip_url": req["url"], "score": 1}

    stage = ExtDetectStage(
        {"Botnet": ["abuse_ipdb"]},
        ExternalDetectionConfig(),
        transport=transport,
        resolver=lambda host: ["1.1.1.1", "2.2.2.2"],
    )
    out = stage(pa.table({"url": ["http://evil.test/x"]}))
    assert out.num_rows == 1
    assert len(calls) == 2 and "1.1.1.1" in calls[0] and "2.2.2.2" in calls[1]
    merged = json.loads(out["result_json"][0].as_py())
    assert "2.2.2.2" in merged["ip_url"]  # later ip wins merged keys


def test_external_detections_from_yaml():
    from thecrowler_ray.detection import external_detections_from_yaml

    yaml_text = """
rule_groups:
  - group_name: g1
    detection_rules:
      - object_name: BadCDN
        external_detections:
          - name: e1
            provider: abuse_ipdb
          - name: e2
            provider: ssllabs
      - object_name: Plain
        http_header_fields: []
      - object_name: badcdn
        external_detections:
          - name: e3
            provider: virus_total
"""
    m = external_detections_from_yaml(yaml_text)
    # lowercased object names merge across rules (GetAllExternalDetectionsMap)
    assert m == {"badcdn": ["abuse_ipdb", "ssllabs", "virus_total"]}


@pytest.mark.usefixtures("ray_session")
def test_stage_in_ray_pipeline():
    ds = ray.data.from_arrow(
        pa.table({"url": [f"http://h{i % 3}.test/p/{i}" for i in range(30)]})
    )
    out = ds.map_batches(
        ExtDetectStage,
        fn_constructor_args=({"CDN": ["ssllabs"], "Botnet": ["abuse_ipdb"]},),
        fn_constructor_kwargs={"transport": FakeTransport()},
        batch_format="pyarrow",
        concurrency=2,
    ).to_pandas()
    assert len(out) == 60  # 30 urls x 2 (object_name, provider) pairs
    assert set(out.provider) == {"ssllabs", "abuse_ipdb"}
    assert (out.confidence == 10).all()
    # deterministic across actors: same url+provider -> same result
    dup = out.groupby(["url", "provider"]).result_json.nunique()
    assert (dup == 1).all()
