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
    hosts = pages_ds.select_columns(["host"]).groupby("host").map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )
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
