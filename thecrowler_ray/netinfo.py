"""WHOIS / DNS response parsing (reference ``pkg/netinfo/``).

The reference enriches every crawled host with network intelligence:
``GetWHOISData`` queries whois and parses the free-text response into a
``WHOISData`` record (``whoisinfo.go:80-287``), ``GetDNSInfo`` shells out
to ``dig`` and parses the answer sections into typed ``DNSRecord`` rows
with CNAME chasing (``dnsinfo.go:40-129,154-268``). The *network* calls
are environment seams (the container has no network — ``stages/enrich.py``
already provides deterministic-fake collectors); this module is the
*parsing plane*, mirrored field-for-field so real whois/dig text produces
the reference's records:

- ``parse_whois_output`` — the field-regex table (whoisinfo.go:31-77),
  comment-line skip, IPv4/IPv6/DOMAIN entity typing with the Go
  ``IsPrivate`` ranges, the literal ``\\n`` comment joiner, and the final
  case-sensitive ``Name Server:`` sweep that *replaces* any accumulated
  name servers (whoisinfo.go:273-285).
- ``parse_dns_records`` — dig-output section tracking (ANSWER/AUTHORITY/
  ADDITIONAL), non-colon comment capture, ``SERVER:`` extraction up to
  ``#53``, quote-aware field splitting (helper.go:79-107) and the
  record-type table (types.go recordTypeMap).
- ``parse_dns_info`` — the staged domain→host iteration with CNAME
  chasing through a ``dig_fn`` seam (dnsinfo.go:65-129).
- ``url_to_host`` / ``url_to_domain`` — helper.go:30-61; eTLD+1 uses a
  built-in multi-label-suffix subset instead of the full public-suffix
  list (offline container), covering the reference's own test vectors.

Scale note: these are pure per-row string kernels — the enrichment stage
runs them per *unique host* inside ``map_batches`` after the crawl
dedupes hosts, so 100 TB of pages costs O(distinct hosts) parses.
"""

from __future__ import annotations

import ipaddress
import re

NA = "N/A"

# whoisinfo.go:31-77 — field name → capture regex (case-insensitive)
_WHOIS_FIELD_RE: dict[str, re.Pattern] = {
    name: re.compile(pattern, re.IGNORECASE)
    for name, pattern in {
        "registry domain id": r"(Registry\s*Domain\s*ID):\s*(.+)",
        "registrar whois server": r"(Registrar\s*WHOIS\s*Server):\s*(.+)",
        "registrar url": r"(Registrar\s*URL):\s*(.+)",
        "registry expiry date": r"(Registry\s*Expiry\s*Date):\s*(.+)",
        "registrar": r"(Registrar):\s*(.+)",
        "registrar iana id": r"(Registrar\s*IANA\s*ID):\s*(.+)",
        "registrant": r"(Registrant):\s*(.+)",
        "registrant name": r"(Registrant\s*Name):\s*(.+)",
        "registrant organization": r"(Registrant\s*Organization):\s*(.+)",
        "registrant street": r"(Registrant\s*Street):\s*(.+)",
        "registrant city": r"(Registrant\s*City):\s*(.+)",
        "registrant state/province": r"(Registrant\s*State/Province):\s*(.+)",
        "registrant postal code": r"(Registrant\s*Postal\s*Code):\s*(.+)",
        "registrant country": r"(Registrant\s*Country):\s*(.+)",
        "registrant phone": r"(Registrant\s*Phone):\s*(.+)",
        "registrant phone ext": r"(Registrant\s*Phone\s*Ext):\s*(.+)",
        "registrant fax": r"(Registrant\s*Fax):\s*(.+)",
        "registrant fax ext": r"(Registrant\s*Fax\s*Ext):\s*(.+)",
        "registrant email": r"(Registrant\s*Email):\s*(.+)",
        "admin contact": r"(admin\s*contact):\s*(.+)",
        "admin-c": r"(admin-c):\s*(.+)",
        "admin email": r"(admin\s*email):\s*(.+)",
        "tech contact": r"(tech\s*contact):\s*(.+)",
        "tech-c": r"(tech-c):\s*(.+)",
        "tech email": r"(tech\s*email):\s*(.+)",
        "dnssec": r"(DNSSEC):\s*(.+)",
        "creation date": r"(Creation\s*Date):\s*(.+)",
        "created on": r"(Created\s*On):\s*(.+)",
        "created date": r"(Created\s*Date):\s*(.+)",
        "created-date": r"(created-date):\s*(.+)",
        "created": r"(created):\s*(.+)",
        "expiration date": r"(Expiration\s*Date):\s*(.+)",
        "updated date": r"(Updated\s*Date):\s*(.+)",
        "org name": r"(Org\s*Name):\s*(.+)",
        "org id": r"(org\s*id):\s*(.+)",
        "address": r"(address):\s*(.+)",
        "city": r"(city):\s*(.+)",
        "state prov": r"(state\s*prov):\s*(.+)",
        "state": r"(state):\s*(.+)",
        "postal code": r"(postal\s*code):\s*(.+)",
        "country": r"(country):\s*(.+)",
        "reg date": r"(reg\s*date):\s*(.+)",
        "updated": r"(updated):\s*(.+)",
        "comment": r"(Comment):\s*(.+)",
    }.items()
}

# field name → WHOISData key for the simple one-value cases
# (whoisinfo.go:199-267); "updated date" matches the regex table but has
# no switch case in the reference, so its value is parsed and DROPPED —
# that quirk is preserved by omitting it here.
_WHOIS_ASSIGN = {
    "registry domain id": "registry_domain_id",
    "registrar whois server": "registrar_whois_server",
    "registrar url": "registrar_url",
    "registry expiry date": "registry_expiry_date",
    "registrar iana id": "registrar_iana_id",
    "registrar": "registrar",
    "registrant": "registrant",
    "registrant name": "registrant_name",
    "registrant organization": "registrant_organization",
    "registrant street": "registrant_street",
    "registrant city": "registrant_city",
    "registrant state/province": "registrant_state",
    "registrant postal code": "registrant_postal_code",
    "registrant country": "registrant_country",
    "registrant phone": "registrant_phone",
    "registrant phone ext": "registrant_phone_ext",
    "registrant fax": "registrant_fax",
    "registrant fax ext": "registrant_fax_ext",
    "registrant email": "registrant_email",
    "admin contact": "admin_contact",
    "admin-c": "admin_contact",
    "tech contact": "tech_contact",
    "tech-c": "tech_contact",
    "tech email": "tech_email",
    "dnssec": "dnssec",
    "org name": "org_name",
    "org id": "org_id",
    "address": "address",
    "city": "city",
    "state": "state",
    "postal code": "postal_code",
    "country": "country",
    "reg date": "reg_date",
    "updated": "updated",
}

_CREATION_FIELDS = {"creation date", "created on", "created",
                    "created date", "created-date"}

_FIELD_NAME_RE = re.compile(r"^(.*?):\s*")
_NAME_SERVER_RE = re.compile(r"Name Server:\s*([^\n]+)")  # case-sensitive

WHOIS_FIELDS = [
    "entity", "entity_type", "entity_status", "registry_domain_id",
    "registrar_whois_server", "registrar_url", "registry_expiry_date",
    "registrar_iana_id", "registrar", "registrant", "registrant_name",
    "registrant_organization", "registrant_street", "registrant_city",
    "registrant_state", "registrant_postal_code", "registrant_country",
    "registrant_phone", "registrant_phone_ext", "registrant_fax",
    "registrant_fax_ext", "registrant_email", "admin_contact",
    "tech_contact", "tech_email", "name_servers", "dnssec",
    "creation_date", "expiration_date", "updated_date", "net_range",
    "org_name", "org_id", "address", "city", "state", "postal_code",
    "country", "reg_date", "updated", "comment",
]


def _go_is_private(ip) -> bool:
    """Go net.IP.IsPrivate: RFC 1918 for v4, fc00::/7 for v6 — narrower
    than Python's ``is_private`` (which also counts loopback/link-local)."""
    if ip.version == 4:
        return any(ip in net for net in (
            ipaddress.ip_network("10.0.0.0/8"),
            ipaddress.ip_network("172.16.0.0/12"),
            ipaddress.ip_network("192.168.0.0/16")))
    return ip in ipaddress.ip_network("fc00::/7")


def parse_whois_output(whois_output: str, domain: str) -> dict:
    """Mirror of parseWHOISOutput (whoisinfo.go:130-287): returns the
    WHOISData record as a dict with the Go struct's json field names."""
    data = {f: ([] if f == "name_servers" else "") for f in WHOIS_FIELDS}
    data["entity"] = domain

    try:
        ip = ipaddress.ip_address(domain)
    except ValueError:
        ip = None
    if ip is not None:
        data["entity_type"] = "IPv4" if ip.version == 4 else "IPv6"
        data["entity_status"] = "PRIVATE" if _go_is_private(ip) else "PUBLIC"
    else:
        data["entity_type"] = "DOMAIN"
        data["entity_status"] = (
            "PRIVATE" if "This query returned 0 objects" in whois_output
            else "PUBLIC")

    for line in whois_output.split("\n"):
        if not line:
            continue
        line = line.strip()
        if line.startswith(("%", "#", ";")):
            continue
        m = _FIELD_NAME_RE.match(line)
        if not m:
            continue
        field_name = m.group(1).strip().lower()
        regex = _WHOIS_FIELD_RE.get(field_name)
        if regex is None:
            continue
        fm = regex.search(line)
        if fm is None or len(fm.groups()) < 2:
            continue
        value = fm.group(2).strip()
        if field_name in _CREATION_FIELDS:
            data["creation_date"] = value
        elif field_name == "expiration date":
            data["expiration_date"] = value
        elif field_name == "comment":
            # the reference joins with a literal backslash-n (Go "\\n")
            data["comment"] = data["comment"] + "\\n" + value
        elif field_name in _WHOIS_ASSIGN:
            data[_WHOIS_ASSIGN[field_name]] = value

    # final sweep replaces anything accumulated (whoisinfo.go:273-285)
    data["name_servers"] = [m.group(1).strip()
                            for m in _NAME_SERVER_RE.finditer(whois_output)]
    return data


# -- DNS (dig output) --------------------------------------------------------

RECORD_TYPES = {
    "A", "AAAA", "MX", "NS", "CNAME", "TXT", "SOA", "PTR", "SRV", "CAA",
    "TLSA", "DS", "DNSKEY", "NSEC", "NSEC3", "SPF", "DKIM", "DMARC",
    "OPENPGPKEY", "URI",
}

ANSWER = "ANSWER"


def fields_quotes(s: str) -> list[str]:
    """helper.go:79-107 — whitespace split honouring double-quoted
    substrings, with backslash-escaped quotes kept verbatim."""
    fields: list[str] = []
    buf: list[str] = []
    in_quotes = False
    prev = ""
    for ch in s:
        if ch == '"' and prev != "\\":
            in_quotes = not in_quotes
        elif ch.isspace() and not in_quotes:
            if buf:
                fields.append("".join(buf))
                buf.clear()
        else:
            buf.append(ch)
        prev = ch
    if buf:
        fields.append("".join(buf))
    return fields


def _is_numeric(s: str) -> bool:
    # strconv.Atoi accepts an optional sign, digits only
    return bool(re.fullmatch(r"[+-]?[0-9]+", s))


def _process_section(record: str, dns: dict) -> str:
    """processSection (dnsinfo.go:174-204): classify a ``;``-comment line;
    non-colon-terminated comments are collected, SERVER lines parsed."""
    record = record.upper().lstrip(";").strip()
    if not record.endswith(":"):
        dns["comments"].append(record)
    if "ANSWER SECTION" in record:
        return ANSWER
    if "AUTHORITY SECTION" in record:
        return "AUTHORITY"
    if "ADDITIONAL SECTION" in record:
        return "ADDITIONAL"
    if record.startswith("SERVER:"):
        server = record[len("SERVER:"):].strip()
        server = server.rstrip("(").strip()
        idx = server.find("#53")
        if idx >= 0:  # the reference indexes unconditionally; dig always
            server = server[:idx]  # prints host#53(...) so guard == mirror
        dns["server"].append(server.strip())
    return ""


def _process_fields(record: str, section: str, dns: dict) -> None:
    """processFields (dnsinfo.go:206-259)."""
    fields = fields_quotes(record)
    rec = {"name": "", "ttl": "", "class": "", "type": "", "special": "",
           "response": "", "value": "", "section": ""}
    for i, f in enumerate(fields):
        rec["value"] = f if i == 0 else rec["value"] + " " + f
        if f == "TXT":
            rec["special"] = "TXT"
            rec["type"] = "TXT"
            continue
        if f == "RRSIG":
            rec["special"] = "RRSIG"
            rec["type"] = "RRSIG"
            continue
        if f in RECORD_TYPES:
            rec["type"] = f
            continue
        if i == 0:
            rec["name"] = f
            continue
        if i == 1 and _is_numeric(f):
            rec["ttl"] = f
            continue
        if i == 2 and f == "IN":
            rec["class"] = f
            continue
        if i == len(fields) - 1:
            if f.startswith('"') and f.endswith('"'):
                f = f[1:-1]
            rec["response"] = f
    if rec["type"]:
        rec["section"] = section
        dns["records"].append(rec)


def parse_dns_records(output: str, domain: str = "") -> dict:
    """parseDNSRecords (dnsinfo.go:154-172) over one dig output blob."""
    dns = {"domain": domain, "server": [], "records": [], "comments": []}
    section = ""
    for record in output.strip().split("\n"):
        record = record.strip()
        if not record:
            continue
        if record.startswith(";"):
            section = _process_section(record, dns)
            continue
        _process_fields(record, section, dns)
    return dns


def parse_dns_info(domain: str, host: str, output: str,
                   dig_fn=None, max_chases: int = 8) -> list[dict]:
    """parseDNSInfo (dnsinfo.go:65-129): stage 0 parses under the domain
    label, stage 1 under the host label; a CNAME in the ANSWER section
    re-digs the target through ``dig_fn`` (the network seam). The
    reference relies on whois rate-limit sleeps to bound the chase; here
    an explicit ``max_chases`` guards against CNAME loops."""
    out: list[dict] = []
    stage = 0
    chases = 0
    while host or domain:
        if stage == 0:
            dns = parse_dns_records(output, domain)
            domain = ""
            stage = 1
        else:
            dns = parse_dns_records(output, host)
            host = ""
            stage = 2
        for rec in dns["records"]:
            if rec["section"] == ANSWER and rec["type"] == "CNAME":
                if chases >= max_chases or dig_fn is None:
                    break
                chases += 1
                if stage > 1:
                    host = rec["response"]
                    output = dig_fn(host)
                else:
                    domain = rec["response"]
                    output = dig_fn(domain)
                    stage = 0
                break
        if dns["records"]:
            out.append(dns)
    return out


# -- URL helpers (helper.go:30-61) ------------------------------------------

# multi-label public suffixes the offline subset recognises; the reference
# uses golang.org/x/net/publicsuffix (full PSL). Single-label TLDs need no
# table: eTLD+1 is the last two labels.
_MULTI_SUFFIXES = {
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "sch.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "co.nz", "net.nz", "org.nz", "govt.nz",
    "com.br", "net.br", "org.br", "gov.br",
    "co.in", "net.in", "org.in", "gen.in", "firm.in",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "co.za", "org.za", "net.za", "gov.za",
    "com.mx", "org.mx", "net.mx",
    "com.sg", "org.sg", "net.sg",
    "co.kr", "or.kr", "ne.kr",
    "com.tr", "org.tr", "net.tr",
    "com.ar", "org.ar", "net.ar",
}


def url_to_host(url: str) -> str:
    host = url
    if "://" in host:
        host = host[host.index("://") + 3:]
    if "/" in host:
        host = host[:host.index("/")]
    return host.rstrip("/").strip()


def url_to_domain(input_url: str) -> str:
    """eTLD+1 (helper.go:43-61). Returns "" when the host has no dot or
    *is* a bare public suffix, matching EffectiveTLDPlusOne's error path."""
    host = url_to_host(input_url).lower().strip(".")
    labels = host.split(".")
    if len(labels) < 2:
        return ""
    last2 = ".".join(labels[-2:])
    if last2 in _MULTI_SUFFIXES:
        if len(labels) < 3:
            return ""
        return ".".join(labels[-3:])
    return last2


def default_na(s: str) -> str:
    return s if s != "" else NA
