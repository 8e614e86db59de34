"""Crash-resistance properties for the new parse planes: hostile input
must raise ValueError-family errors (or return partial data), never
crash, hang, or corrupt state. Mirrors the repo's hostile-input test
policy for the HTML extractors."""

from hypothesis import given, settings
from hypothesis import strategies as st

from thecrowler_ray.netinfo import (
    fields_quotes,
    parse_dns_records,
    parse_whois_output,
    url_to_domain,
    url_to_host,
)
from thecrowler_ray.serviceescout import parse_nmap_xml
from thecrowler_ray.sslinfo import parse_certificate

text = st.text(max_size=400)


@settings(max_examples=200, deadline=None)
@given(text, st.one_of(text, st.ip_addresses().map(str)))
def test_whois_parse_total(output, domain):
    d = parse_whois_output(output, domain)
    assert d["entity"] == domain
    assert d["entity_type"] in ("IPv4", "IPv6", "DOMAIN")
    assert isinstance(d["name_servers"], list)


@settings(max_examples=200, deadline=None)
@given(text)
def test_dns_parse_total(output):
    dns = parse_dns_records(output)
    for rec in dns["records"]:
        assert rec["type"]  # only typed records are kept
    assert isinstance(dns["server"], list)


@settings(max_examples=200, deadline=None)
@given(text)
def test_fields_quotes_total(s):
    fields = fields_quotes(s)
    # no field may contain an unquoted space... the invariant that IS
    # guaranteed: concatenation loses only whitespace/quote characters
    joined = "".join(fields)
    stripped = "".join(c for c in s if not c.isspace() and c != '"')
    # escaped quotes are kept, plain quotes dropped — joined is a
    # superset of stripped minus kept-escape differences; cheap sanity:
    assert len(joined) >= len(stripped) - s.count('\\"') * 2 - 2


@settings(max_examples=150, deadline=None)
@given(text)
def test_url_helpers_total(u):
    url_to_host(u)
    url_to_domain(u)


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=300))
def test_der_parser_never_crashes(data):
    try:
        parse_certificate(data)
    except (ValueError, IndexError):
        pass  # hostile DER must raise cleanly


def test_mmdb_reader_hostile(tmp_path):
    import struct

    import pytest

    from thecrowler_ray.geolocation import MMDBReader

    p = tmp_path / "x.mmdb"
    for payload in (b"", b"\xab\xcd\xefMaxMind.com",
                    b"\x00" * 64 + b"\xab\xcd\xefMaxMind.com\xe0",
                    b"\xab\xcd\xefMaxMind.com" + b"\xff" * 10):
        p.write_bytes(payload)
        with pytest.raises((ValueError, KeyError, IndexError,
                            struct.error)):
            r = MMDBReader(str(p))
            r.lookup("1.2.3.4")


@settings(max_examples=150, deadline=None)
@given(text)
def test_nmap_xml_total(s):
    import xml.etree.ElementTree as ET

    try:
        parse_nmap_xml(s)
    except (ET.ParseError, ValueError):
        pass
