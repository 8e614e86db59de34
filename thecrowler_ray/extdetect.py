"""External detection providers (reference ``pkg/detection/3rd_party.go``,
``pkg/config/types.go:894-927``, dispatch ``pkg/detection/detection.go:758-867``).

The reference fans a page URL out to third-party reputation/scan services
(AbuseIPDB, Censys, VirusTotal, …), merges each provider's JSON response,
and records it on the detected-tech map under the rule's object name with
confidence 10.

This module models the full plane with the live HTTP hop behind a seam:

- **Request construction is real** and mirrors the reference byte-for-byte:
  per-provider method/URL/body shapes (``3rd_party.go:120-364``) and the
  auth-header precedence of ``trdPRequestInfo`` (basic auth from
  api_id/api_secret, bearer token, labeled api-key header, optional UA,
  JSON content type — ``3rd_party.go:49-107``).
- **Transport is a seam**: ``live_transport`` raises
  ``UnavailableCapabilityError`` in this sandbox (no network);
  ``FakeTransport`` returns deterministic JSON-shaped results keyed by a
  hash of (provider, url, body) so pipelines/tests run hermetically.
- **The Ray stage is real**: ``ExtDetectStage`` is an actor-pool
  ``map_batches`` stage with per-actor response cache, retry budget,
  request budget (``max_requests``) and inter-request delay — the
  ``ExternalDetectionConfig`` knobs.

IP-kind providers resolve host→IPs first (``detection.go:766-802``); DNS is
also behind a seam (``resolver``), defaulting to a deterministic fake.
"""

from __future__ import annotations

import hashlib
import json
import time
from dataclasses import dataclass, field
from typing import Callable

import pyarrow as pa


class UnavailableCapabilityError(RuntimeError):
    """Raised when a live external capability (network/DNS) is required."""


class TransientScanError(RuntimeError):
    """Retryable transport failure (timeout, 5xx)."""


@dataclass(frozen=True)
class ProviderConfig:
    """Mirror of ``ExtDetectProviderConfig`` (types.go:917-927)."""

    provider: str = ""
    host: str = ""
    api_key_label: str = ""
    api_key: str = ""
    api_id: str = ""
    api_secret: str = ""
    api_token: str = ""


@dataclass
class ExternalDetectionConfig:
    """Mirror of ``ExternalDetectionConfig`` (types.go:894-914)."""

    timeout: int = 10
    max_requests: int = 10_000
    max_retries: int = 2
    delay_sec: float = 0.0
    providers: dict[str, ProviderConfig] = field(default_factory=dict)

    def get(self, name: str) -> ProviderConfig:
        return self.providers.get(name, ProviderConfig(provider=name))


BEARER = "Bearer "

# provider key -> (target kind, request builder). Builders return the plain
# request dict; URL/method/body shapes follow 3rd_party.go line-for-line.


def _req(provider, method, url, *, key_label="", key="", api_id="",
         secret="", token="", body=None, user_agent=""):
    headers = {"Content-Type": "application/json"}
    basic_auth = (api_id, secret) if api_id else None
    if token:
        headers["Authorization"] = BEARER + token
    if key:
        headers[key_label or "Key"] = key
    if user_agent:
        headers["User-Agent"] = user_agent
    return {
        "provider": provider,
        "method": method,
        "url": url,
        "headers": headers,
        "basic_auth": basic_auth,
        "body": body,
    }


def build_request(provider: str, target: str, cfg: ExternalDetectionConfig) -> dict:
    """The reference's per-provider request shape (3rd_party.go:120-364).
    ``target`` is an IP for ip-kind providers, a URL otherwise."""
    p = cfg.get
    if provider == "abuse_ipdb":
        c = p("abuse_ipdb")
        return _req("AbuseIPDB", "GET",
                    "https://api.abuseipdb.com/api/v2/check?ipAddress=" + target,
                    key_label="Key", key=c.api_key)
    if provider == "ipvoid":
        c = p("ipvoid")
        return _req("IPVoid", "GET",
                    "https://www.ipvoid.com/api/ip/" + target + "/",
                    key_label="Key", key=c.api_key)
    if provider == "censys":
        c = p("censys")
        return _req("Censys", "GET", "https://censys.io/ipv4/" + target,
                    api_id=c.api_id, secret=c.api_secret)
    if provider == "shodan":
        c = p("shodan")
        return _req("Shodan", "GET", "https://api.shodan.io/shodan/host/" + target,
                    key_label="Authorization", key=BEARER + c.api_key)
    if provider == "ssllabs":
        return _req("SSLLabs", "GET",
                    "https://api.ssllabs.com/api/v3/analyze?host=" + target)
    if provider == "url_haus":
        c = p("url_haus")
        return _req("URLHaus", "POST", "https://urlhaus-api.abuse.ch/v1/url/",
                    key_label="Auth-Key", key=c.api_key, body={"url": target})
    if provider == "threat_crowd":
        return _req("ThreatCrowd", "GET",
                    "https://api.threatcrowd.org/v1/url/report/?url=" + target)
    if provider == "cuckoo_url":
        c = p("cuckoo")
        return _req("Cuckoo", "POST", c.host + "/tasks/create/url",
                    body={"url": target})
    if provider == "cuckoo_file":
        c = p("cuckoo")
        return _req("Cuckoo", "POST", c.host + "/tasks/create/file",
                    body={"file": target})
    if provider == "virus_total":
        c = p("virus_total")
        return _req("VirusTotal", "POST",
                    "https://www.virustotal.com/vtapi/v2/url/scan",
                    key_label="x-apikey", key=c.api_key, body={"url": target})
    if provider == "virus_total_file":
        c = p("virus_total")
        return _req("VirusTotal", "POST",
                    "https://www.virustotal.com/vtapi/v2/file/scan",
                    key_label="x-apikey", key=c.api_key, body={"file": target})
    if provider == "phish_tank":
        c = p("phish_tank")
        return _req("PhishTank", "POST", "https://checkurl.phishtank.com/checkurl/",
                    body={"url": target, "format": "json", "app_key": c.api_key})
    if provider == "google_safe_browsing":
        c = p("google_safe_browsing")
        return _req(
            "GoogleSafeBrowsing", "POST",
            "https://safebrowsing.googleapis.com/v4/threatMatches:find?key="
            + c.api_key,
            body={
                "client": {"clientId": "yourcompany", "clientVersion": "1.5.2"},
                "threatInfo": {
                    "threatTypes": ["MALWARE", "SOCIAL_ENGINEERING"],
                    "platformTypes": ["WINDOWS"],
                    "threatEntryTypes": ["URL"],
                    "threatEntries": [{"url": target}],
                },
            },
        )
    if provider == "open_phish":
        c = p("open_phish")
        return _req("OpenPhish", "POST", "https://openphish.com/check",
                    key_label="Authorization", key=BEARER + c.api_key,
                    body={"url": target})
    if provider == "hybrid_analysis":
        c = p("hybrid_analysis")
        return _req("HybridAnalysis", "POST",
                    "https://www.hybrid-analysis.com/api/v2/quick-scan/url",
                    key_label="api-key", key=c.api_key, body={"url": target},
                    user_agent="Falcon Sandbox")
    if provider == "hybrid_analysis_file":
        c = p("hybrid_analysis")
        return _req("HybridAnalysis", "POST",
                    "https://www.hybrid-analysis.com/api/v2/quick-scan/file",
                    key_label="api-key", key=c.api_key, body={"file": target},
                    user_agent="Falcon Sandbox")
    if provider == "cisco_umbrella":
        c = p("cisco_umbrella")
        return _req("CiscoUmbrella", "POST",
                    "https://investigate.api.umbrella.com/dnsdb/name/a/"
                    + target + ".json",
                    key_label="Authorization", key=BEARER + c.api_key,
                    body={"domain": target})
    if provider == "alien_vault":
        c = p("alien_vault")
        return _req("AlienVault", "POST",
                    "https://otx.alienvault.com/api/v1/indicators/url/"
                    + target + "/",
                    key_label="X-OTX-API-KEY", key=c.api_key,
                    body={"url": target})
    raise KeyError(f"unknown external detection service: {provider}")


IP_PROVIDERS = frozenset({"abuse_ipdb", "ipvoid", "censys", "shodan"})
ALL_PROVIDERS = (
    "abuse_ipdb", "ipvoid", "censys", "ssllabs", "url_haus", "threat_crowd",
    "cuckoo_url", "virus_total", "phish_tank", "google_safe_browsing",
    "open_phish", "hybrid_analysis", "cisco_umbrella", "alien_vault",
    "shodan", "virus_total_file", "hybrid_analysis_file", "cuckoo_file",
)


def live_transport(request: dict) -> dict:
    raise UnavailableCapabilityError(
        "external detection needs network access; wire an HTTP client here "
        "on a live cluster (reference 3rd_party.go:49-107)"
    )


def fake_resolver(host: str) -> list[str]:
    """Deterministic host→IP fake (the reference calls cmn.HostToIP)."""
    d = hashlib.sha256(("dns:" + host).encode()).digest()
    return [f"{10 + d[0] % 240}.{d[1]}.{d[2]}.{d[3]}"]


def live_resolver(host: str) -> list[str]:
    raise UnavailableCapabilityError("DNS resolution needs network access")


class FakeTransport:
    """Deterministic provider-response fake: stable pseudo-JSON keyed by a
    hash of the request, with provider-appropriate top-level fields. Lets
    the whole plane run hermetically; swap for a real HTTP client on a
    cluster. ``fail_every`` injects transient errors for retry tests."""

    def __init__(self, fail_every: int = 0):
        self.calls = 0
        self.fail_every = fail_every

    def __call__(self, request: dict) -> dict:
        self.calls += 1
        if self.fail_every and self.calls % self.fail_every == 0:
            raise TransientScanError("injected 5xx")
        basis = json.dumps(
            {"p": request["provider"], "u": request["url"], "b": request["body"]},
            sort_keys=True,
        )
        d = hashlib.sha256(basis.encode()).digest()
        score = d[0] % 101
        return {
            "provider": request["provider"],
            "query_status": "ok",
            "score": score,
            "verdict": "malicious" if score >= 90 else "clean",
            "scan_id": d[:12].hex(),
        }


class ExtDetectStage:
    """Actor-pool external-detection stage: rows with a ``url`` column →
    one row per (url, object_name, provider) with the merged JSON result
    and the reference's fixed confidence 10 (detection.go:863).

    Per-actor state: response cache (a target is scanned once per actor),
    request budget, retry loop, inter-request delay. ``detections`` is the
    rule-derived map {object_name: [provider, ...]} the reference builds
    with GetAllExternalDetectionsMap (detectionrule.go:268)."""

    CONFIDENCE = 10

    def __init__(
        self,
        detections: dict[str, list[str]],
        config: ExternalDetectionConfig | None = None,
        transport: Callable[[dict], dict] | None = None,
        resolver: Callable[[str], list[str]] | None = None,
    ):
        self.detections = {k.lower(): list(v) for k, v in detections.items()}
        self.cfg = config or ExternalDetectionConfig()
        self.transport = transport or live_transport
        self.resolver = resolver or fake_resolver
        self.cache: dict[tuple[str, str], dict | None] = {}
        self.requests_made = 0

    def _call(self, request: dict) -> dict | None:
        for attempt in range(self.cfg.max_retries + 1):
            if self.requests_made >= self.cfg.max_requests:
                return None
            self.requests_made += 1
            if self.cfg.delay_sec:
                time.sleep(self.cfg.delay_sec)
            try:
                return self.transport(request)
            except TransientScanError:
                if attempt == self.cfg.max_retries:
                    return None
        return None

    def _scan(self, provider: str, url: str) -> dict | None:
        key = (provider, url)
        if key in self.cache:
            return self.cache[key]
        if provider in IP_PROVIDERS:
            from .urls import host_of

            result: dict = {}
            for ip in self.resolver(host_of(url)):
                rval = self._call(build_request(provider, ip, self.cfg))
                if rval:
                    result.update(rval)  # reference merges per-ip results
            out = result or None
        else:
            out = self._call(build_request(provider, url, self.cfg))
        self.cache[key] = out
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls, names, providers, results = [], [], [], []
        for url in batch["url"].to_pylist():
            for obj_name, provs in self.detections.items():
                for provider in provs:
                    result = self._scan(provider, url or "")
                    if result is None:
                        continue
                    urls.append(url)
                    names.append(obj_name)
                    providers.append(provider)
                    results.append(json.dumps(result, sort_keys=True))
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "object_name": pa.array(names, pa.string()),
                "provider": pa.array(providers, pa.string()),
                "result_json": pa.array(results, pa.string()),
                "confidence": pa.array([self.CONFIDENCE] * len(urls), pa.int32()),
            }
        )
