"""Header normalization tests (pkg/mail/normalize.go): bounded
retention, signature redaction, message-id/reference/list-id/date/
address/security derivation — pinned to the reference's rule set."""

import email

from thecrowler_ray.sources.mail_normalize import (
    bounded_headers,
    canonical_header_key,
    header_set,
    message_ids,
    normalize_list_id,
    normalize_message_id,
    normalize_references,
    normalize_security,
    redact_signature,
    safe_header_value,
    truncate_utf8,
)


def test_canonical_and_safe_values():
    assert canonical_header_key("content-TYPE") == "Content-Type"
    assert canonical_header_key("x-MY-custom") == "X-My-Custom"
    assert canonical_header_key("bad header") == "bad header"  # unchanged
    assert safe_header_value("a\r\nb\tc") == "a  b c"
    assert safe_header_value("x\x00y\x1bz") == "x�y�z"
    value, truncated = truncate_utf8("é" * 3000, 4096)
    assert truncated and value.endswith("…")
    assert len(value.encode()) <= 4096


def test_bounded_headers_limits_and_redaction():
    source = {"DKIM-Signature": ["v=1; a=rsa-sha256; b=SECRETSIG; d=e.com"],
              "Subject": ["hello"],
              "X-Many": [f"v{i}" for i in range(25)]}
    retained, warnings = bounded_headers(source)
    assert "b=[redacted]" in retained["Dkim-Signature"][0]
    assert "SECRETSIG" not in str(retained)
    assert len(retained["X-Many"]) == 20
    codes = {w["code"] for w in warnings}
    assert "header_values_truncated" in codes
    # name-count cap
    many = {f"X-H{i:03d}": ["v"] for i in range(210)}
    retained2, warnings2 = bounded_headers(many)
    assert len(retained2) == 200
    assert any(w["code"] == "headers_truncated" for w in warnings2)


def test_message_id_rules():
    # domain lowercased, local part case preserved, dedup first-wins
    assert message_ids("<AbC@ExAmPle.COM> junk <AbC@example.com>") == \
        ["<AbC@example.com>"]
    assert message_ids("no ids here") == []
    headers = {"Message-Id": ["garbage", "<First@D.com> <second@d.com>"],
               "References": ["<a@d.com> <b@d.com>", "<a@d.com> <c@d.com>"],
               "List-Id": ["My List <LIST.example.COM>"]}
    assert normalize_message_id(headers, "message-id") == "<First@d.com>"
    assert normalize_references(headers) == \
        ["<a@d.com>", "<b@d.com>", "<c@d.com>"]
    assert normalize_list_id(headers) == "list.example.com"


def test_security_signals():
    headers = {"Authentication-Results": [
        "mx.example.com; spf=pass smtp.mailfrom=e.com; dkim=fail "
        "header.d=e.com; dmarc=pass; tls=pass"],
        "Arc-Authentication-Results": ["i=1; mx.example.com; cv=none"]}
    sec = normalize_security(headers)
    assert (sec["spf"], sec["dkim"], sec["dmarc"]) == \
        ("pass", "fail", "pass")
    assert sec["tls"] is True
    assert sec["arc"] == "none"  # cv= fallback
    # first-wins: a later contradictory result is ignored
    sec2 = normalize_security({"Authentication-Results": [
        "a; spf=fail", "b; spf=pass"]})
    assert sec2["spf"] == "fail"
    # Received-Spf fallback only when Authentication-Results had no spf
    sec3 = normalize_security({"Received-Spf": ["Pass; (domain of ...)"]})
    assert sec3["spf"] == "pass"


def test_header_set_end_to_end():
    raw = (
        "Message-ID: <M1@Example.COM>\n"
        "Subject: =?utf-8?B?SMOpbGxv?= world\n"
        "Date: Mon, 17 Aug 2026 10:30:00 +0200\n"
        "From: Alice <alice@example.com>\n"
        "References: <r1@d.com>\n"
        "DKIM-Signature: v=1; b=TOPSECRET; d=example.com\n"
        "Authentication-Results: mx; spf=pass; dkim=pass\n"
        "\n"
        "body\n")
    hs, warnings = header_set(email.message_from_string(raw))
    assert hs["message_id"] == "<M1@example.com>"
    assert hs["subject"] == "Héllo world"
    assert hs["references"] == ["<r1@d.com>"]
    assert hs["date"].hour == 8  # normalized to UTC
    assert hs["security"]["spf"] == "pass"
    assert "TOPSECRET" not in str(hs["raw"]) + str(hs["values"])
    from thecrowler_ray.sources.mail_normalize import normalize_addresses

    addrs, warns = normalize_addresses(hs["values"], "from")
    assert addrs == [{"name": "Alice", "address": "alice@example.com",
                      "normalized": "alice@example.com"}]
    bad, warns2 = normalize_addresses({"To": ["<<<"]}, "To")
    assert bad == [] and warns2[0]["code"] == "malformed_address"
