"""netinfo parsing tests: the reference's own helper vectors
(pkg/netinfo/helper_test.go), WHOIS parse semantics (whoisinfo.go:130-287)
incl. its quirks, and dig-output parsing with CNAME chasing
(dnsinfo.go:65-268)."""

from thecrowler_ray.netinfo import (
    default_na,
    fields_quotes,
    parse_dns_info,
    parse_dns_records,
    parse_whois_output,
    url_to_domain,
    url_to_host,
)

WHOIS_SAMPLE = """\
% IANA WHOIS server
# comment to skip
; another comment
   Domain Name: EXAMPLE.COM
   Registry Domain ID: 2336799_DOMAIN_COM-VRSN
   Registrar WHOIS Server: whois.iana.org
   Registrar URL: http://res-dom.iana.org
   Updated Date: 2024-08-14T07:01:34Z
   Creation Date: 1995-08-14T04:00:00Z
   Registry Expiry Date: 2025-08-13T04:00:00Z
   Registrar: RESERVED-Internet Assigned Numbers Authority
   Registrar IANA ID: 376
   Registrant Organization: Internet Corporation
   Registrant Country: US
   Name Server: A.IANA-SERVERS.NET
   Name Server: B.IANA-SERVERS.NET
   DNSSEC: signedDelegation
   Comment: first line
   Comment: second line
"""

DIG_SAMPLE = """\
; <<>> DiG 9.18.24 <<>> example.com TXT ANY
;; global options: +cmd
;; Got answer:
;; ->>HEADER<<- opcode: QUERY, status: NOERROR, id: 23519
;; QUESTION SECTION:
;example.com.\t\t\tIN\tANY

;; ANSWER SECTION:
example.com.\t86400\tIN\tA\t93.184.215.14
example.com.\t86400\tIN\tTXT\t"v=spf1 -all"
example.com.\t86400\tIN\tNS\ta.iana-servers.net.
example.com.\t3600\tIN\tSOA\tns.icann.org. noc.dns.icann.org. 2024013101 7200 3600 1209600 3600

;; AUTHORITY SECTION:
example.com.\t172800\tIN\tNS\tb.iana-servers.net.

;; Query time: 12 msec
;; SERVER: 192.168.1.1#53(192.168.1.1) (TCP)
;; WHEN: Mon Aug 17 12:00:00 UTC 2026
;; MSG SIZE  rcvd: 219
"""


def test_reference_helper_vectors():
    # helper_test.go TestURLToHost / TestURLToDomain / TestDefaultNA
    assert url_to_host("http://www.example.com") == "www.example.com"
    assert url_to_host("https://www.example-y.com/path") == "www.example-y.com"
    assert url_to_host("https://www.example-h.com/path/") == "www.example-h.com"
    assert url_to_host("https://www.example-n.com/path/file.html") == \
        "www.example-n.com"
    for u, want in [
        ("http://www.example1.com", "example1.com"),
        ("https://www.example5.com/path/", "example5.com"),
        ("https://www.example7.co.uk", "example7.co.uk"),
        ("https://www.example11.co.uk/path/file.html", "example11.co.uk"),
    ]:
        assert url_to_domain(u) == want, u
    assert default_na("") == "N/A"
    assert default_na("Hello") == "Hello"
    assert default_na(" ") == " "


def test_whois_parse_domain():
    d = parse_whois_output(WHOIS_SAMPLE, "example.com")
    assert d["entity"] == "example.com"
    assert d["entity_type"] == "DOMAIN"
    assert d["entity_status"] == "PUBLIC"
    assert d["registry_domain_id"] == "2336799_DOMAIN_COM-VRSN"
    assert d["registrar_whois_server"] == "whois.iana.org"
    assert d["registrar_url"] == "http://res-dom.iana.org"
    assert d["creation_date"] == "1995-08-14T04:00:00Z"
    assert d["registry_expiry_date"] == "2025-08-13T04:00:00Z"
    assert d["registrar"] == "RESERVED-Internet Assigned Numbers Authority"
    assert d["registrar_iana_id"] == "376"
    assert d["registrant_organization"] == "Internet Corporation"
    assert d["registrant_country"] == "US"
    assert d["dnssec"] == "signedDelegation"
    # quirk: "Updated Date" matches the regex table but has no switch
    # case in the reference → parsed and dropped
    assert d["updated_date"] == ""
    # quirk: comments join with a LITERAL backslash-n (Go "\\n")
    assert d["comment"] == "\\nfirst line\\nsecond line"
    # the final case-sensitive sweep owns name_servers
    assert d["name_servers"] == ["A.IANA-SERVERS.NET", "B.IANA-SERVERS.NET"]


def test_whois_parse_ip_entities():
    pub = parse_whois_output("", "93.184.215.14")
    assert (pub["entity_type"], pub["entity_status"]) == ("IPv4", "PUBLIC")
    prv = parse_whois_output("", "10.1.2.3")
    assert (prv["entity_type"], prv["entity_status"]) == ("IPv4", "PRIVATE")
    # Go IsPrivate is RFC1918-only: loopback is NOT private
    lo = parse_whois_output("", "127.0.0.1")
    assert lo["entity_status"] == "PUBLIC"
    v6 = parse_whois_output("", "fd12::1")
    assert (v6["entity_type"], v6["entity_status"]) == ("IPv6", "PRIVATE")
    dom = parse_whois_output("This query returned 0 objects", "secret.example")
    assert dom["entity_status"] == "PRIVATE"


def test_fields_quotes():
    # helper.go:79-107 — quoted substrings keep embedded spaces
    assert fields_quotes('a.example. 300 IN TXT "v=spf1 -all"') == \
        ["a.example.", "300", "IN", "TXT", "v=spf1 -all"]
    assert fields_quotes("") == []
    assert fields_quotes("  lone  ") == ["lone"]
    # escaped quote stays inside one field
    assert fields_quotes('x "a \\" b" y') == ["x", 'a \\" b', "y"]


def test_dig_parse_sections_and_records():
    dns = parse_dns_records(DIG_SAMPLE, "example.com")
    assert dns["server"] == ["192.168.1.1"]
    by_type = {}
    for r in dns["records"]:
        by_type.setdefault(r["type"], []).append(r)
    a = by_type["A"][0]
    assert (a["name"], a["ttl"], a["class"], a["section"], a["response"]) == \
        ("example.com.", "86400", "IN", "ANSWER", "93.184.215.14")
    txt = by_type["TXT"][0]
    assert txt["special"] == "TXT"
    assert txt["response"] == "v=spf1 -all"  # quotes stripped
    ns_sections = {r["section"] for r in by_type["NS"]}
    assert ns_sections == {"ANSWER", "AUTHORITY"}
    # non-colon ;; comments are collected uppercased
    assert any("GLOBAL OPTIONS" in c for c in dns["comments"])


def test_dns_cname_chase():
    first = ";; ANSWER SECTION:\nwww.alias.test.\t300\tIN\tCNAME\treal.test.\n"
    second = ";; ANSWER SECTION:\nreal.test.\t300\tIN\tA\t192.0.2.7\n"
    calls = []

    def dig_fn(name):
        calls.append(name)
        return second

    out = parse_dns_info("alias.test", "www.alias.test", first,
                         dig_fn=dig_fn)
    assert calls == ["real.test."]
    # stage0 (domain) parse, stage0 re-parse of the chased target, then
    # the stage1 (host) parse of the final output
    assert [d["domain"] for d in out] == \
        ["alias.test", "real.test.", "www.alias.test"]
    assert out[1]["records"][0]["type"] == "A"


def test_dns_cname_loop_bounded():
    looping = ";; ANSWER SECTION:\nx.test.\t300\tIN\tCNAME\tx.test.\n"
    out = parse_dns_info("x.test", "", looping,
                         dig_fn=lambda n: looping, max_chases=3)
    assert len(out) <= 5  # terminates instead of chasing forever
