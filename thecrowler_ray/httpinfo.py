"""HTTP-details document plane (reference ``pkg/httpinfo``).

From-scratch reimplementation of the reference behavior (semantics only):

- ``create_config``        — ``pkg/httpinfo/httpinfo.go:35-45`` (CreateConfig:
                             UA for "<selenium type>-desktop01", 60 s timeout,
                             follow redirects, ssl_mode "none")
- ``validate_url``         — ``httpinfo.go:48-61`` (http/https only)
- ``extract_http_info``    — ``httpinfo.go:65-127`` (ExtractHTTPInfo: SSL
                             details → GET with custom headers → 3xx redirect
                             recursion with the desktop01-UA reset quirk →
                             assembled HTTPDetails with detection over
                             headers + body)
- ``analyze_response``     — ``httpinfo.go:281-331`` (empty body falls back
                             to the caller-provided HTML; detection context
                             carries URL + headers + SSL + body)
- ``ssl_details_from_chain`` — ``types.go:199-286`` (ConvertSSLInfoToDetails:
                             per-cert issuers / owner fields joined ", ",
                             deduped+sorted FQDNs, signature algorithms,
                             chain-order / trust / validity booleans)
- ``parse_set_cookie`` / ``analyze_headers`` — header analysis feeding the
                             detection plane: cookie-flag structs mirroring
                             the reference's Cookie shape
                             (``pkg/crawler/types.go:269-285``) plus
                             HSTS / security-header summary.

The network client itself stays behind the ``fetch`` seam (this container
has no network); the seam signature matches the repo's other fetch seams:
``fetch(url, headers) -> (status:int, headers:dict[str,list[str]], body:str)``.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

from .netinfo import url_to_domain, url_to_host
from .sslinfo import parse_chain_pem, pem_to_der, validate_certificate

__all__ = [
    "HTTPInfoConfig",
    "create_config",
    "validate_url",
    "extract_http_info",
    "ssl_details_from_chain",
    "parse_set_cookie",
    "analyze_headers",
    "url_to_host",
    "url_to_domain",
]

_DEFAULT_UA = (
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/126.0.0.0 Safari/537.36"
)


@dataclass
class HTTPInfoConfig:
    """Mirror of httpinfo.Config (types.go:34-44)."""

    url: str = ""
    custom_header: dict = field(default_factory=dict)
    follow_redirects: bool = True
    timeout: int = 60
    ssl_mode: str = "none"
    proxies: list = field(default_factory=list)


def create_config(url: str, selenium_type: str = "chrome",
                  ua_lookup=None) -> HTTPInfoConfig:
    """CreateConfig (httpinfo.go:35-45): UA keyed by
    ``"<type>-desktop01"`` in the reference's static UA map."""
    ua = None
    if ua_lookup is not None:
        ua = ua_lookup(f"{selenium_type}-desktop01")
    return HTTPInfoConfig(
        url=url,
        custom_header={"User-Agent": ua or _DEFAULT_UA},
        follow_redirects=True,
        timeout=60,
        ssl_mode="none",
    )


def validate_url(input_url: str) -> bool:
    """httpinfo.go:48-61: parseable + http/https scheme."""
    from urllib.parse import urlparse

    try:
        parsed = urlparse(input_url)
    except ValueError:
        return False
    return parsed.scheme in ("http", "https")


# ---------------------------------------------------------------------------
# SSL details (ConvertSSLInfoToDetails analog over the stdlib-parsed chain)
# ---------------------------------------------------------------------------

def _join(v) -> str:
    if isinstance(v, (list, tuple)):
        return ", ".join(str(x) for x in v)
    return str(v) if v is not None else ""


def ssl_details_from_chain(url: str, chain_pem: str,
                           trusted_roots=None) -> dict:
    """types.go:199-286 (ConvertSSLInfoToDetails) over a PEM chain parsed by
    :mod:`thecrowler_ray.sslinfo`: per-cert issuer common names, owner
    CN/organization, deduped+sorted FQDN set, and the chain-analysis flag
    battery from ``validate_certificate``. (The stdlib DER parser exposes
    CN/O only — OU/C/ST/L and signatureAlgorithm are not decoded; the
    reference emits those too.)"""
    chain = parse_chain_pem(chain_pem)
    if not chain:
        return {"url": url, "issuers": [], "fqdns": [], "cert_chain_len": 0}
    issuers = [c.get("issuer_cn", "") for c in chain]
    orgs = [_join(c.get("subject_org", "")) for c in chain]
    cns = [c.get("subject_cn", "") for c in chain]
    fqdns: set[str] = set()
    for cert in chain:
        fqdns.update(cert.get("dns_names", []) or [])
    leaf = chain[0]
    validity = validate_certificate(
        chain, authorities=set(trusted_roots or ()))
    # leaf fingerprints over the first DER block (the reference hashes raw)
    der = pem_to_der(chain_pem)
    fingerprints = {
        "md5": hashlib.md5(der).hexdigest(),
        "sha1": hashlib.sha1(der).hexdigest(),
        "sha256": hashlib.sha256(der).hexdigest(),
    }
    return {
        "url": url,
        "issuers": issuers,
        "owner_organizations": orgs,
        "owner_common_names": cns,
        "fqdns": sorted(fqdns),
        "intermediate_authorities":
            validity.get("intermediate_authorities", []),
        "is_cert_chain_order_valid":
            bool(validity.get("is_cert_chain_order_valid")),
        "is_root_trustworthy": bool(validity.get("is_root_trustworthy")),
        "is_cert_valid": bool(validity.get("is_cert_valid")),
        "is_cert_expired": bool(validity.get("is_cert_expired")),
        "is_cert_self_signed":
            len(chain) == 1 and leaf.get("issuer_cn") == leaf.get("subject_cn"),
        "is_cert_ev": bool(validity.get("is_cert_ev")),
        "is_cert_ev_ssl": bool(validity.get("is_cert_ev_ssl")),
        "cert_expiration": str(leaf.get("not_after", "")),
        "fingerprints": fingerprints,
        "cert_chain_len": len(chain),
    }


# ---------------------------------------------------------------------------
# header analysis: cookies + security headers
# ---------------------------------------------------------------------------

def parse_set_cookie(line: str, request_url: str = "") -> dict:
    """One ``Set-Cookie`` line → the reference's Cookie shape
    (pkg/crawler/types.go:269-285): name/value, domain, path, expires
    (epoch seconds, 0 = session), httpOnly, secure, sameSite, session,
    size (len(name)+len(value)), sourceScheme."""
    from email.utils import parsedate_to_datetime
    from urllib.parse import urlparse

    parts = [p.strip() for p in line.split(";")]
    name, _, value = parts[0].partition("=")
    cookie = {
        "name": name.strip(),
        "value": value.strip(),
        "domain": "",
        "path": "/",
        "expires": 0.0,
        "httpOnly": False,
        "secure": False,
        "sameSite": "",
        "session": True,
        "size": len(name.strip()) + len(value.strip()),
        "sourceScheme": "",
    }
    if request_url:
        try:
            p = urlparse(request_url)
            cookie["sourceScheme"] = (
                "Secure" if p.scheme == "https" else "NonSecure")
            cookie["domain"] = cookie["domain"] or (p.hostname or "")
        except ValueError:
            pass
    for attr in parts[1:]:
        k, _, v = attr.partition("=")
        kl = k.strip().lower()
        v = v.strip()
        if kl == "domain" and v:
            cookie["domain"] = v.lstrip(".").lower()
        elif kl == "path" and v:
            cookie["path"] = v
        elif kl == "expires" and v:
            try:
                cookie["expires"] = parsedate_to_datetime(v).timestamp()
                cookie["session"] = False
            except (TypeError, ValueError):
                pass
        elif kl == "max-age" and v:
            try:
                cookie["expires"] = float(int(v))
                cookie["session"] = False
            except ValueError:
                pass
        elif kl == "httponly":
            cookie["httpOnly"] = True
        elif kl == "secure":
            cookie["secure"] = True
        elif kl == "samesite":
            cookie["sameSite"] = v.capitalize()
    return cookie


def _hget(headers: dict, name: str) -> list[str]:
    """Case-insensitive multi-value header get (Go http.Header semantics)."""
    out = []
    for k, v in headers.items():
        if k.lower() == name.lower():
            out.extend(v if isinstance(v, (list, tuple)) else [v])
    return out


def analyze_headers(headers: dict, request_url: str = "") -> dict:
    """Security-relevant header summary consumed by the detection plane:
    HSTS (max-age / includeSubDomains / preload), parsed cookies with
    flags, frame / content-type / CSP / referrer-policy presence, server
    token. Header names are matched case-insensitively (Go canonicalizes;
    we normalize on read)."""
    hsts = {"present": False, "max_age": 0,
            "include_subdomains": False, "preload": False}
    for v in _hget(headers, "Strict-Transport-Security"):
        hsts["present"] = True
        for d in v.split(";"):
            k, _, val = d.strip().partition("=")
            kl = k.strip().lower()
            if kl == "max-age":
                try:
                    hsts["max_age"] = int(val.strip())
                except ValueError:
                    pass
            elif kl == "includesubdomains":
                hsts["include_subdomains"] = True
            elif kl == "preload":
                hsts["preload"] = True
    cookies = [parse_set_cookie(line, request_url)
               for line in _hget(headers, "Set-Cookie")]
    xfo = _hget(headers, "X-Frame-Options")
    xcto = _hget(headers, "X-Content-Type-Options")
    csp = _hget(headers, "Content-Security-Policy")
    refpol = _hget(headers, "Referrer-Policy")
    server = _hget(headers, "Server")
    return {
        "hsts": hsts,
        "cookies": cookies,
        "insecure_cookies": sum(1 for c in cookies if not c["secure"]),
        "non_httponly_cookies": sum(1 for c in cookies if not c["httpOnly"]),
        "x_frame_options": xfo[0] if xfo else "",
        "x_content_type_options": xcto[0] if xcto else "",
        "has_csp": bool(csp),
        "referrer_policy": refpol[0] if refpol else "",
        "server": server[0] if server else "",
    }


# ---------------------------------------------------------------------------
# ExtractHTTPInfo
# ---------------------------------------------------------------------------

def analyze_response(url: str, headers: dict, body: str, html_content: str,
                     detector=None, ssl_details: dict | None = None) -> dict:
    """httpinfo.go:281-331 (analyzeResponse): empty body falls back to the
    caller-provided HTML (WAF-blocked fetches); detection runs over URL +
    flattened headers + body."""
    if not body.strip():
        body = html_content or ""
    if detector is None:
        return {}
    flat = {k.lower(): "; ".join(v if isinstance(v, (list, tuple)) else [v])
            for k, v in headers.items()}
    return detector.detect(url=url, headers=flat, content=body)


def extract_http_info(
    config: HTTPInfoConfig,
    fetch,
    html_content: str = "",
    detector=None,
    ssl_chain_pem: str = "",
    trusted_roots=None,
    _depth: int = 0,
) -> dict:
    """ExtractHTTPInfo (httpinfo.go:65-127). ``fetch(url, headers) →
    (status, headers, body)`` is the network seam. 3xx responses with
    follow_redirects recurse on Location with the reference's quirk of
    resetting the custom header to the plain desktop01 UA and clearing the
    HTML fallback (httpinfo.go:243-253)."""
    if not validate_url(config.url):
        raise ValueError(f"invalid URL scheme: {config.url}")
    if _depth > 10:
        raise ValueError(f"too many redirects at {config.url}")

    ssl_info = (ssl_details_from_chain(config.url, ssl_chain_pem,
                                       trusted_roots)
                if ssl_chain_pem else {})

    status, headers, body = fetch(config.url, dict(config.custom_header))
    headers = {k: (v if isinstance(v, (list, tuple)) else [v])
               for k, v in headers.items()}

    if config.follow_redirects and 300 <= status < 400:
        from urllib.parse import urljoin

        loc = _hget(headers, "Location")
        new_cfg = HTTPInfoConfig(
            # relative Locations resolve against the current URL (the
            # reference's Go http.Client does this inside CheckRedirect)
            url=urljoin(config.url, loc[0]) if loc else "",
            custom_header={"User-Agent": _DEFAULT_UA},
            follow_redirects=True,
            timeout=config.timeout,
            ssl_mode=config.ssl_mode,
            proxies=config.proxies,
        )
        out = extract_http_info(new_cfg, fetch, "", detector,
                                ssl_chain_pem, trusted_roots, _depth + 1)
        out["crowler_meta"] = {"redirected_from": config.url,
                               "redirect_status": status}
        return out

    detected = analyze_response(config.url, headers, body, html_content,
                                detector, ssl_info)
    return {
        "crowler_meta": {},
        "url": config.url,
        "custom_headers": dict(config.custom_header),
        "follow_redirects": config.follow_redirects,
        "response_headers": headers,
        "ssl_info": ssl_info,
        "detected_entities": detected,
        "header_analysis": analyze_headers(headers, config.url),
    }


# ---------------------------------------------------------------------------
# Ray stage: header analysis + detection as a batch transform
# ---------------------------------------------------------------------------

class HttpHeaderAnalyzeStage:
    """Actor-pool stage: detector/signature state built once per actor
    (``__init__``), per-batch work parses real header strings through
    :func:`analyze_headers` + the detection plane. Input batch needs
    ``doc_id`` + one column per raw header line list (``headers_json``:
    JSON dict name → list[str]); output is the scalar analysis row the
    reference stores alongside HTTPDetails."""

    def __init__(self):
        from .detection import TechDetector

        self.detector = TechDetector()

    def __call__(self, batch):
        import json

        import pandas as pd

        rows = []
        for doc_id, hj in zip(batch["doc_id"], batch["headers_json"]):
            headers = json.loads(hj)
            ha = analyze_headers(headers)
            flat = {k.lower(): "; ".join(v) for k, v in headers.items()}
            det = self.detector.detect(headers=flat)
            top = max(det, key=det.get) if det else ""
            rows.append({
                "doc_id": doc_id,
                "server": ha["server"],
                "has_hsts": ha["hsts"]["present"],
                "hsts_max_age": ha["hsts"]["max_age"],
                "n_cookies": len(ha["cookies"]),
                "insecure_cookies": ha["insecure_cookies"],
                "non_httponly_cookies": ha["non_httponly_cookies"],
                "x_frame_options": ha["x_frame_options"],
                "has_csp": ha["has_csp"],
                "detected_tech": top,
            })
        return pd.DataFrame(rows)
