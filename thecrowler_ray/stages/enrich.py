"""NetInfo / HTTPInfo enrichment stages.

Models the reference's enrichment collectors (``pkg/netinfo/`` — DNS, WHOIS,
geo, service scout; ``pkg/httpinfo/`` — headers, TLS, JARM) as per-host
``map_batches`` stages over the *distinct hosts* of a crawl, with
content-hashed, deduplicated detail documents exactly like the reference's
``insertNetInfo`` / ``insertHTTPInfo`` (``pkg/crawler/crawler.go:1580-1680``:
SHA-256 over the stable-JSON details, upsert by hash).

There is no network in this sandbox, so the collectors are DETERMINISTIC
FAKES derived from the host name (clearly marked; swap ``collect_netinfo`` /
``collect_httpinfo`` for real resolvers on a cluster — the stage signatures,
dedup, and output schema are the real thing). The fake HTTP headers feed the
tech-detection plane so the two stages compose like the reference's
enrichment goroutines (``crawler.go:380-405``).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

from ..textnorm import stable_json


def _h(host: str, salt: str) -> int:
    return int.from_bytes(
        hashlib.md5(f"{salt}|{host}".encode()).digest()[:8], "big"
    )


def collect_netinfo(host: str) -> dict:
    """Deterministic fake DNS/WHOIS/geo document for a host."""
    r = _h(host, "net")
    return {
        "host": host,
        "ips": [f"192.0.2.{r % 250 + 1}", f"198.51.100.{(r >> 8) % 250 + 1}"],
        "cname": f"edge{r % 8}.cdn.{host}",
        "asn": 64496 + r % 1024,
        "whois": {
            "registrar": f"Registrar-{r % 20}",
            "created": f"20{r % 20:02d}-0{r % 9 + 1}-01",
        },
        "geo": {"country": ["US", "DE", "JP", "BR", "IN"][r % 5]},
    }


def collect_httpinfo(host: str) -> dict:
    """Deterministic fake response headers / TLS / JARM for a host."""
    r = _h(host, "http")
    server = ["nginx/1.24", "Apache/2.4.57", "cloudflare", "synthd/0.1"][r % 4]
    headers = {"server": server, "x-frame-options": "DENY"}
    if r % 3 == 0:
        headers["x-powered-by"] = "PHP/8.2"
    return {
        "host": host,
        "headers": headers,
        "tls": {
            "issuer": f"CA-{r % 6}",
            "not_after": f"202{r % 5 + 5}-12-31",
            "protocol": "TLSv1.3",
        },
        "jarm": hashlib.md5(f"jarm|{host}".encode()).hexdigest(),
    }


def _details_hash(details: dict) -> str:
    return hashlib.sha256(stable_json(details).encode()).hexdigest()


class NetInfoStage:
    """map_batches over a ``host`` column → netinfo rows (one per host row;
    dedup across hosts is a downstream groupby on ``details_hash``)."""

    def __init__(self, collector=None):
        self.collector = collector or collect_netinfo
        self._cache: dict[str, tuple[str, str]] = {}  # per-actor host cache

    def __call__(self, batch: pa.Table) -> pa.Table:
        hosts = batch["host"].to_pylist()
        details, hashes = [], []
        for h in hosts:
            hit = self._cache.get(h)
            if hit is None:
                d = stable_json(self.collector(h))
                hit = (d, _details_hash(self.collector(h)))
                self._cache[h] = hit
            details.append(hit[0])
            hashes.append(hit[1])
        return pa.table(
            {
                "host": pa.array(hosts, pa.string()),
                "netinfo": pa.array(details, pa.string()),
                "details_hash": pa.array(hashes, pa.string()),
            }
        )


class HTTPInfoStage:
    def __init__(self, collector=None):
        self.collector = collector or collect_httpinfo
        self._cache: dict[str, tuple[str, str]] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        hosts = batch["host"].to_pylist()
        details, hashes, servers = [], [], []
        for h in hosts:
            hit = self._cache.get(h)
            if hit is None:
                doc = self.collector(h)
                hit = (stable_json(doc), _details_hash(doc))
                self._cache[h] = hit
            details.append(hit[0])
            hashes.append(hit[1])
        return pa.table(
            {
                "host": pa.array(hosts, pa.string()),
                "httpinfo": pa.array(details, pa.string()),
                "details_hash": pa.array(hashes, pa.string()),
            }
        )


def enrich_hosts(pages_ds, concurrency: int | None = None):
    """distinct hosts of a crawl → (netinfo_ds, httpinfo_ds), deduplicated
    by details hash (reference upsert-by-hash).

    Stages run as tasks by default (the sandbox collectors are pure
    functions); pass ``concurrency=N`` to pin an actor pool when real
    resolvers hold sockets/caches — but size pools so they don't starve
    downstream task stages (a pool that reserves every CPU deadlocks a
    union over these datasets)."""
    from ..ops.gutil import group_by_key_shards

    # distinct hosts: per-batch combiner first (hosts repeat heavily
    # within a crawl block), then one dedup per hash shard — never one
    # map_groups call per host
    pre = pages_ds.select_columns(["host"]).map_batches(
        lambda t: pa.table({"host": pc.unique(t["host"].combine_chunks())}),
        batch_format="pyarrow")
    hosts = group_by_key_shards(
        pre, "host", lambda g: g.drop_duplicates(subset=["host"]))
    if concurrency:
        net = hosts.map_batches(
            NetInfoStage, batch_format="pyarrow", concurrency=concurrency,
            num_cpus=0.5,
        )
        http = hosts.map_batches(
            HTTPInfoStage, batch_format="pyarrow", concurrency=concurrency,
            num_cpus=0.5,
        )
    else:
        net = hosts.map_batches(NetInfoStage(), batch_format="pyarrow")
        http = hosts.map_batches(HTTPInfoStage(), batch_format="pyarrow")
    return net, http


# -- parse-plane stages (pkg/netinfo parsing over derived fixture text) ------

_COUNTRIES = ["US", "DE", "JP", "BR", "IN"]


def whois_text_from_documents(batch: pa.Table) -> pa.Table:
    """Derive a deterministic whois response per document (doc_id
    arithmetic only, so a SQL twin can recompute every parsed field
    independently). doc_id % 11 == 0 rows are RFC-1918 IP entities, the
    rest registered domains with 1-2 name servers."""
    doc_ids = batch["doc_id"].to_pylist()
    entities, texts = [], []
    for d in doc_ids:
        if d % 11 == 0:
            entities.append(f"10.0.{d % 200}.1")
            texts.append(
                "% ARIN fixture\n"
                f"Org Name: Org {d % 13}\n"
                f"Country: {_COUNTRIES[d % 5]}\n"
                f"Comment: ip block {d}\n")
        else:
            entities.append(f"h{d % 41}.example.com")
            ns2 = (f"Name Server: ns2.h{d % 41}.example.com\n"
                   if d % 3 == 0 else "")
            texts.append(
                "% registry fixture\n"
                f"Registrar: Registrar {d % 13}\n"
                f"Registrar IANA ID: {100 + d % 10}\n"
                f"Creation Date: 19{90 + d % 10}-01-02T00:00:00Z\n"
                f"Registrant Country: {_COUNTRIES[d % 5]}\n"
                f"Comment: domain {d}\n"
                f"Name Server: ns1.h{d % 41}.example.com\n" + ns2)
    return pa.table({
        "doc_id": batch["doc_id"],
        "entity": pa.array(entities, pa.string()),
        "whois_text": pa.array(texts, pa.string()),
    })


def whois_parse_stage(batch: pa.Table) -> pa.Table:
    """(entity, whois_text) → parsed WHOISData columns
    (pkg/netinfo/whoisinfo.go:130-287 semantics via
    :func:`thecrowler_ray.netinfo.parse_whois_output`). Per-row Python is
    fine here: enrichment runs once per *distinct host*, not per page."""
    from ..netinfo import parse_whois_output

    cols = {"doc_id": batch["doc_id"].to_pylist()} if "doc_id" in \
        batch.column_names else {}
    out = {k: [] for k in
           ("entity", "entity_type", "entity_status", "registrar",
            "registrar_iana_id", "creation_date", "registrant_country",
            "country", "org_name", "comment")}
    n_ns = []
    for entity, text in zip(batch["entity"].to_pylist(),
                            batch["whois_text"].to_pylist()):
        d = parse_whois_output(text, entity)
        for k in out:
            out[k].append(d[k])
        n_ns.append(len(d["name_servers"]))
    table = {**cols, **{k: pa.array(v, pa.string())
                        for k, v in out.items()},
             "n_name_servers": pa.array(n_ns, pa.int64())}
    return pa.table(table)


def dig_text_from_documents(batch: pa.Table) -> pa.Table:
    """Deterministic dig output per document: an A answer, a TXT answer on
    even doc_ids, an NS authority row, and a SERVER footer."""
    doc_ids = batch["doc_id"].to_pylist()
    texts = []
    for d in doc_ids:
        host = f"h{d % 41}.example.com."
        txt = (f'{host}\t300\tIN\tTXT\t"v=spf1 include:spf{d}"\n'
               if d % 2 == 0 else "")
        texts.append(
            "; <<>> DiG 9.18 <<>> fixture\n"
            ";; ANSWER SECTION:\n"
            f"{host}\t{300 + d % 7}\tIN\tA\t93.184.{d % 200}.{d % 250 + 1}\n"
            + txt +
            ";; AUTHORITY SECTION:\n"
            f"example.com.\t172800\tIN\tNS\tns{d % 4}.example.net.\n"
            f";; SERVER: 10.0.0.{d % 9 + 1}#53(10.0.0.{d % 9 + 1})\n")
    return pa.table({
        "doc_id": batch["doc_id"],
        "dig_text": pa.array(texts, pa.string()),
    })


def dns_parse_stage(batch: pa.Table) -> pa.Table:
    """dig_text → per-doc DNS summary columns
    (pkg/netinfo/dnsinfo.go:154-268 semantics via
    :func:`thecrowler_ray.netinfo.parse_dns_records`)."""
    from ..netinfo import parse_dns_records

    doc_ids = batch["doc_id"].to_pylist()
    n_records, n_answer, a_resp, txt_resp, ns_resp, server = \
        [], [], [], [], [], []
    for d, text in zip(doc_ids, batch["dig_text"].to_pylist()):
        dns = parse_dns_records(text, f"h{d % 41}.example.com")
        n_records.append(len(dns["records"]))
        n_answer.append(sum(r["section"] == "ANSWER"
                            for r in dns["records"]))
        a = next((r for r in dns["records"] if r["type"] == "A"), None)
        t = next((r for r in dns["records"] if r["type"] == "TXT"), None)
        ns = next((r for r in dns["records"] if r["type"] == "NS"), None)
        a_resp.append(a["response"] if a else "")
        txt_resp.append(t["response"] if t else "")
        ns_resp.append(ns["response"] if ns else "")
        server.append(dns["server"][0] if dns["server"] else "")
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "n_records": pa.array(n_records, pa.int64()),
        "n_answer": pa.array(n_answer, pa.int64()),
        "a_response": pa.array(a_resp, pa.string()),
        "txt_response": pa.array(txt_resp, pa.string()),
        "ns_response": pa.array(ns_resp, pa.string()),
        "server": pa.array(server, pa.string()),
    })
