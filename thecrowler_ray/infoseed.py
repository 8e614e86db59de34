"""Information-seed candidate pipeline (reference ``pkg/infoseed/``).

The reference discovers candidate source URLs (search providers, browser
discovery), then runs the deterministic data plane this module models:

  1. **Normalization** (``candidates.go:90-163``): canonical URL (lowercase
     http/https scheme + host, default ports dropped, fragment dropped,
     tracking params removed with the remaining query re-encoded in sorted
     order, empty path → "/"), dedup by normalized URL and optionally by
     host, with stable rejection-reason counts.
  2. **Built-in filters** (``candidates.go:165-222``): required schemes,
     allowed/denied domain sets (host or registrable domain), minimum
     score, per-host / per-domain / total caps — order-dependent, applied
     in candidate order.
  3. **User candidate plugins**: JS processors run per candidate with
     ``params.candidate`` and return {accepted, score, reason, tags[,
     source_overrides]} (the contract the reference validates in
     ``validateCandidatePluginOutput``). Here the processors execute in
     :mod:`thecrowler_ray.minijs` inside an actor-pool ``map_batches``
     stage — script compiled once per actor.

Normalization/filtering are vectorizable per batch (each batch keeps its
own dedup sets; global dedup composes with the exact-dedup operator);
candidate sets are control-plane sized, so the driver-side forms here are
the reference-faithful core.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

import pyarrow as pa

# rejection reasons (candidates.go:46-57)
R_INVALID = "invalid_url"
R_DUP_URL = "duplicate_url"
R_DUP_HOST = "duplicate_host"
R_LIMIT = "candidate_limit"
R_ALLOWED = "allowed_domain"
R_DENIED = "denied_domain"
R_SCHEME = "required_scheme"
R_MIN_SCORE = "minimum_score"
R_MAX_HOST = "max_candidates_per_host"
R_MAX_DOMAIN = "max_candidates_per_domain"

DEFAULT_TRACKING_PARAMS = (
    "fbclid", "gclid", "mc_cid", "mc_eid", "msclkid", "utm_campaign",
    "utm_content", "utm_medium", "utm_source", "utm_term",
)


def normalize_url(raw: str, tracking_params=DEFAULT_TRACKING_PARAMS):
    """→ (normalized_url, host, ok) — candidates.go:90-122 semantics."""
    raw = (raw or "").strip()
    if not raw:
        return "", "", False
    try:
        u = urlsplit(raw)
    except ValueError:
        return "", "", False
    scheme = u.scheme.lower()
    if scheme not in ("http", "https") or not u.netloc:
        return "", "", False
    host = (u.hostname or "").strip().lower()
    if not host:
        return "", "", False
    try:
        port = u.port
    except ValueError:
        return "", "", False
    if (scheme == "http" and port == 80) or (scheme == "https" and port == 443):
        port = None
    netloc = f"{host}:{port}" if port else host
    remove = {p.strip().lower() for p in tracking_params if p.strip()}
    pairs = [(k, v) for k, v in parse_qsl(u.query, keep_blank_values=True)
             if k.lower() not in remove]
    # url.Values.Encode sorts keys for stable candidate identity
    query = urlencode(sorted(pairs))
    path = u.path or "/"
    return urlunsplit((scheme, netloc, path, query, "")), host, True


def registrable_domain(host: str) -> str:
    parts = (host or "").lower().strip(".").split(".")
    return ".".join(parts if len(parts) <= 2 else parts[-2:])


def normalize_candidates(
    candidates: list[dict],
    tracking_params=DEFAULT_TRACKING_PARAMS,
    dedup_host: bool = False,
) -> tuple[list[dict], dict[str, int]]:
    """candidates.go:133-163: normalize, drop invalid, dedup by URL
    (+ optionally host), stable rejection counts."""
    seen_url: set[str] = set()
    seen_host: set[str] = set()
    rejected: dict[str, int] = {}
    out: list[dict] = []
    for cand in candidates:
        url, host, ok = normalize_url(cand.get("url", ""), tracking_params)
        if not ok:
            rejected[R_INVALID] = rejected.get(R_INVALID, 0) + 1
            continue
        if url in seen_url:
            rejected[R_DUP_URL] = rejected.get(R_DUP_URL, 0) + 1
            continue
        if dedup_host:
            if host in seen_host:
                rejected[R_DUP_HOST] = rejected.get(R_DUP_HOST, 0) + 1
                continue
            seen_host.add(host)
        seen_url.add(url)
        out.append({**cand, "url": url, "host": host})
    return out, rejected


@dataclass
class CandidateFilters:
    """candidates.go:72-80."""

    allowed_domains: tuple[str, ...] = ()
    denied_domains: tuple[str, ...] = ()
    required_schemes: tuple[str, ...] = ()
    min_score: float | None = None
    max_candidates_per_host: int = 0
    max_candidates_per_domain: int = 0
    max_candidates: int = 0


def _domain_set(values) -> set[str]:
    return {v.strip().lower().lstrip(".") for v in values if v.strip()}


def apply_builtin_filters(
    candidates: list[dict], filters: CandidateFilters
) -> tuple[list[dict], dict[str, int]]:
    """candidates.go:165-222 — order-dependent caps included."""
    rejected: dict[str, int] = {}

    def rej(reason):
        rejected[reason] = rejected.get(reason, 0) + 1

    allowed = _domain_set(filters.allowed_domains)
    denied = _domain_set(filters.denied_domains)
    schemes = {s.strip().lower() for s in filters.required_schemes if s.strip()}
    per_host: dict[str, int] = {}
    per_domain: dict[str, int] = {}
    out: list[dict] = []
    for cand in candidates:
        try:
            u = urlsplit(cand.get("url", ""))
        except ValueError:
            rej(R_INVALID)
            continue
        if not u.scheme or not u.netloc:
            rej(R_INVALID)
            continue
        scheme = u.scheme.lower()
        host = (cand.get("host") or "").strip().lower() or (
            u.hostname or "").lower()
        domain = registrable_domain(host)
        if schemes and scheme not in schemes:
            rej(R_SCHEME)
            continue
        if allowed and host not in allowed and domain not in allowed:
            rej(R_ALLOWED)
            continue
        if host in denied or domain in denied:
            rej(R_DENIED)
            continue
        if filters.min_score is not None and float(
                cand.get("score", 0.0)) < filters.min_score:
            rej(R_MIN_SCORE)
            continue
        if (filters.max_candidates_per_host
                and per_host.get(host, 0) >= filters.max_candidates_per_host):
            rej(R_MAX_HOST)
            continue
        if (filters.max_candidates_per_domain
                and per_domain.get(domain, 0)
                >= filters.max_candidates_per_domain):
            rej(R_MAX_DOMAIN)
            continue
        if filters.max_candidates and len(out) >= filters.max_candidates:
            rej(R_LIMIT)
            continue
        per_host[host] = per_host.get(host, 0) + 1
        per_domain[domain] = per_domain.get(domain, 0) + 1
        out.append({**cand, "host": host})
    return out, rejected


PLUGIN_OUTPUT_KEYS = {"accepted", "score", "reason", "tags",
                      "source_overrides", "metadata"}


def validate_plugin_output(out) -> dict:
    """The reference's plugin-output contract
    (``validateCandidatePluginOutput``): accepted+score+reason required,
    unknown/legacy fields rejected."""
    if not isinstance(out, dict):
        raise ValueError("plugin output must be an object")
    unknown = set(out) - PLUGIN_OUTPUT_KEYS
    if unknown:
        raise ValueError(f"unknown plugin output fields: {sorted(unknown)}")
    if not isinstance(out.get("accepted"), bool):
        raise ValueError("plugin output requires boolean 'accepted'")
    if not isinstance(out.get("score"), (int, float)):
        raise ValueError("plugin output requires numeric 'score'")
    if not isinstance(out.get("reason"), str) or not out["reason"]:
        raise ValueError("plugin output requires 'reason'")
    return out


@dataclass
class ProcessorResult:
    accepted: list[dict] = field(default_factory=list)
    rejected: dict[str, int] = field(default_factory=dict)


class CandidateProcessorStage:
    """Actor-pool map_batches stage running a JS candidate processor
    (minijs) per row — the script compiles ONCE per actor. Input rows need
    ``url``/``host``/``score``; output rows add accepted/score/reason/tags
    (the plugin contract), with invalid plugin output marked rejected."""

    def __init__(self, script: str, max_ops: int = 500_000):
        from .minijs import Interpreter, _Parser, _tokenize

        _Parser(_tokenize(script)).program()  # fail fast
        self.script = script
        self.max_ops = max_ops
        self._interp = Interpreter(max_ops=max_ops)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .minijs import Interpreter

        rows = batch.to_pylist()
        out = {"url": [], "host": [], "accepted": [], "score": [],
               "reason": [], "tags": []}
        for row in rows:
            res = Interpreter(max_ops=self.max_ops).run(
                self.script, {"candidate": row}
            )
            try:
                res = validate_plugin_output(res)
            except ValueError as e:
                res = {"accepted": False, "score": 0.0,
                       "reason": f"invalid plugin output: {e}", "tags": []}
            out["url"].append(row.get("url", ""))
            out["host"].append(row.get("host", ""))
            out["accepted"].append(bool(res["accepted"]))
            out["score"].append(float(res["score"]))
            out["reason"].append(res["reason"])
            out["tags"].append([str(t) for t in res.get("tags", [])])
        return pa.table(
            {
                "url": pa.array(out["url"], pa.string()),
                "host": pa.array(out["host"], pa.string()),
                "accepted": pa.array(out["accepted"], pa.bool_()),
                "score": pa.array(out["score"], pa.float64()),
                "reason": pa.array(out["reason"], pa.string()),
                "tags": pa.array(out["tags"], pa.list_(pa.string())),
            }
        )
