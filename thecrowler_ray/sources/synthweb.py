"""Deterministic synthetic web — the sandbox stand-in for live fetching.

Every page is a **pure function of (seed, host_idx, page_idx)**: the fetcher
actors regenerate page HTML on demand (no corpus broadcast, no shared
storage), which scales to an arbitrarily large frontier — exactly like a real
fetcher whose "state" is the network. The reference's fetch stage
(``pkg/crawler/web.go:1097-1453`` getURLContent) is replaced by this
deterministic generator; everything downstream (parse, extract, frontier,
dedup, politeness) is the real engine.

Graph shape (FIXTURES.md F3):
- zipfian host sizes (hot-host skew), ~sqrt(N) distinct hosts
- within-host tree links (drives BFS depth) + extra within-host links that
  rediscover earlier pages (duplicate-link / first-win tests)
- cross-host links controlled by ``cross_host_frac`` (restriction-level tests)
- URL variants that canonicalize identically (trailing ``/``, uppercase)
- some pages under ``/private/`` with per-host robots rules disallowing them
- occasional missing <title> / missing description to exercise the reference
  fallback chains, plus <img> media references and meta keywords
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

_WORDS = (
    "crawler frontier spider index page content search engine data link graph "
    "network robot fetch parse extract keyword meta title summary body text "
    "media image video audio document object hash filter bucket shard wave "
    "depth queue token politeness budget host domain scheme path query anchor "
    "signal quality score token vector cluster batch stream block arrow table"
).split()

_STOPLIKE = "the and for with this that from have been will".split()


def _h(*parts) -> int:
    """Stable 64-bit hash of the joined parts."""
    s = "|".join(str(p) for p in parts)
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")


@dataclass(frozen=True)
class CorpusConfig:
    seed: int = 42
    n_hosts: int = 20
    base_pages: int = 200          # pages of the largest host
    zipf_a: float = 1.1            # host i has ~ base_pages / (i+1)^zipf_a pages
    branch: int = 3                # within-host tree branching factor
    extra_links: int = 2           # extra (possibly backward/dup) links per page
    cross_host_frac: float = 0.15  # fraction of extra links that cross hosts
    variant_frac: float = 0.2      # fraction of links emitted as variants
    media_frac: float = 0.5        # pages with media refs
    private_frac: float = 0.1      # pages under /private/ (robots-disallowed)
    missing_title_frac: float = 0.1
    missing_desc_frac: float = 0.3
    filler_words: int = 0  # extra deterministic body words per page — sizes
    # bench pages like real web pages (30-60 KB) so parse cost is honest
    action_frac: float = 0.0  # fraction of pages with action-gated
    # navigation (a data-href button + a search form) that ONLY action rules
    # can discover — 0.0 keeps every pre-existing corpus byte-identical

    def host_pages(self, h: int) -> int:
        return max(1, int(self.base_pages / (h + 1) ** self.zipf_a))

    def host_name(self, h: int) -> str:
        return f"host{h}.test"

    def total_pages(self) -> int:
        return sum(self.host_pages(h) for h in range(self.n_hosts))


def page_url(cfg: CorpusConfig, h: int, p: int) -> str:
    private = _h(cfg.seed, h, p, "priv") % 1000 < cfg.private_frac * 1000
    prefix = "/private" if private else ""
    return f"http://{cfg.host_name(h)}{prefix}/p/{p}"


def parse_page_url(cfg: CorpusConfig, url: str) -> tuple[int, int] | None:
    """Inverse of ``page_url`` after canonicalization; None if no such page.
    A query string is ignored (the synthetic server, like most real ones,
    serves the same page regardless of unknown params — form submissions
    from action rules land here as ``…/p/N?q=…``)."""
    u = url.strip().split("?", 1)[0].rstrip("/").lower()
    if not u.startswith("http://host"):
        return None
    rest = u[len("http://host"):]
    try:
        hpart, _, path = rest.partition(".test")
        h = int(hpart)
        path = path.lstrip("/")
        if path.startswith("private/"):
            path = path[len("private/"):]
        if not path.startswith("p/"):
            return None
        p = int(path[2:])
    except ValueError:
        return None
    if h < 0 or h >= cfg.n_hosts or p < 0 or p >= cfg.host_pages(h):
        return None
    if page_url(cfg, h, p).lower() != u:
        return None  # wrong /private prefix for this page
    return (h, p)


def out_links(cfg: CorpusConfig, h: int, p: int) -> list[str]:
    """Ground-truth link targets, in on-page order (link_idx order)."""
    links: list[str] = []
    npages = cfg.host_pages(h)
    # tree children: page p links to p*branch+1 … p*branch+branch
    for j in range(1, cfg.branch + 1):
        child = p * cfg.branch + j
        if child < npages:
            links.append(page_url(cfg, h, child))
    # extra links: backward dups or cross-host
    for k in range(cfg.extra_links):
        r = _h(cfg.seed, h, p, "x", k)
        if (r % 1000) < cfg.cross_host_frac * 1000 and cfg.n_hosts > 1:
            h2 = (h + 1 + (r >> 16) % (cfg.n_hosts - 1)) % cfg.n_hosts
            p2 = (r >> 32) % cfg.host_pages(h2)
            links.append(page_url(cfg, h2, p2))
        elif npages > 1:
            p2 = (r >> 24) % npages
            if p2 != p:
                links.append(page_url(cfg, h, p2))
    # variants that canonicalize to an already-linked page
    out = []
    for i, ln in enumerate(links):
        r = _h(cfg.seed, h, p, "v", i)
        if (r % 1000) < cfg.variant_frac * 1000:
            out.append(ln + "/" if r % 2 == 0 else ln.replace("http://", "HTTP://", 1))
        else:
            out.append(ln)
    return out


def has_actions(cfg: CorpusConfig, h: int, p: int) -> bool:
    return (
        cfg.action_frac > 0
        and _h(cfg.seed, h, p, "act") % 1000 < cfg.action_frac * 1000
    )


def action_links(cfg: CorpusConfig, h: int, p: int) -> list[str]:
    """Ground-truth URLs reachable ONLY through the standard action ruleset
    (click ``.loadmore`` → data-href target; type + submit the search form →
    form action + ``?q=crawl``), in rule-execution order. Independent of the
    DOM executor — the engine-vs-oracle equality test pins the whole
    parse → click → submit path against this."""
    if not has_actions(cfg, h, p):
        return []
    r = _h(cfg.seed, h, p, "actt")
    u1 = page_url(cfg, h, r % cfg.host_pages(h))
    h2 = (h + 1 + (r >> 16) % max(1, cfg.n_hosts - 1)) % cfg.n_hosts
    u2 = page_url(cfg, h2, (r >> 32) % cfg.host_pages(h2))
    return [u1, f"{u2}?q=crawl"]


def _words(seed_parts, n: int) -> list[str]:
    ws = []
    for i in range(n):
        r = _h(*seed_parts, i)
        pool = _STOPLIKE if r % 5 == 0 else _WORDS
        ws.append(pool[r % len(pool)])
    return ws


def page_html(cfg: CorpusConfig, h: int, p: int) -> str:
    """Deterministic HTML for page (h, p)."""
    r = _h(cfg.seed, h, p)
    url = page_url(cfg, h, p)
    body_words = _words((cfg.seed, h, p, "body"), 40 + r % 80)
    kw_words = sorted({w for w in _words((cfg.seed, h, p, "kw"), 5)})
    has_title = _h(cfg.seed, h, p, "t") % 1000 >= cfg.missing_title_frac * 1000
    has_desc = _h(cfg.seed, h, p, "d") % 1000 >= cfg.missing_desc_frac * 1000
    has_media = _h(cfg.seed, h, p, "m") % 1000 < cfg.media_frac * 1000

    parts = ["<!DOCTYPE html>", '<html lang="en">', "<head>"]
    if has_title:
        parts.append(f"<title>Page {p} of host{h}</title>")
    if has_desc:
        parts.append(
            f'<meta name="description" content="Synthetic page {p} on '
            f'{cfg.host_name(h)} about {body_words[0]} and {body_words[1]}">'
        )
    elif _h(cfg.seed, h, p, "og") % 2 == 0:
        parts.append(
            f'<meta property="og:description" content="OG summary {p}@host{h}">'
        )
    parts.append(f'<meta name="keywords" content="{", ".join(kw_words)}">')
    parts.append('<meta name="generator" content="synthweb">')
    parts.append("</head><body>")
    if not has_title:
        parts.append(f"<h1>Heading {p} of host{h}</h1>")
    parts.append("<script>var ignored = 'not text';</script>")
    parts.append(f"<p>{' '.join(body_words)}</p>")
    if cfg.filler_words > 0:
        # cheap deterministic filler: rotate the word pool, vary by page hash
        k = r % len(_WORDS)
        pool = _WORDS[k:] + _WORDS[:k]
        filler = " ".join(pool[i % len(pool)] + str(i % 23) for i in range(cfg.filler_words))
        parts.append(f"<p>{filler}</p>")
    for i, ln in enumerate(out_links(cfg, h, p)):
        parts.append(f'<a id="l{i}" href="{ln}">link {i}</a>')
    if has_media:
        parts.append(f'<img src="http://{cfg.host_name(h)}/img/{p}.png">')
        if r % 3 == 0:
            parts.append(f'<video src="http://{cfg.host_name(h)}/v/{p}.mp4"></video>')
    if has_actions(cfg, h, p):
        # action-gated navigation: not <a href>, so the static link
        # extractor rightly never sees these — only action rules do
        ra = _h(cfg.seed, h, p, "actt")
        u1 = page_url(cfg, h, ra % cfg.host_pages(h))
        h2 = (h + 1 + (ra >> 16) % max(1, cfg.n_hosts - 1)) % cfg.n_hosts
        u2 = page_url(cfg, h2, (ra >> 32) % cfg.host_pages(h2))
        parts.append(
            f'<button id="more{p}" class="loadmore" data-href="{u1}">'
            "load more</button>"
        )
        parts.append(
            f'<form id="sf{p}" action="{u2}">'
            '<input type="text" name="q" value="">'
            f'<button id="go{p}" type="submit" class="searchgo">go</button>'
            "</form>"
        )
    parts.append("</body></html>")
    return "\n".join(parts)


def robots_disallow(cfg: CorpusConfig, host: str) -> list[str]:
    """Per-host robots.txt disallow prefixes (deterministic). Half the hosts
    disallow ``/private/``."""
    return ["/private/"] if _h(cfg.seed, host, "robots") % 2 == 0 else []


def seed_urls(cfg: CorpusConfig, n_seeds: int | None = None) -> list[dict]:
    """Seed list (FIXTURES.md F2 shape, minimal columns): page 0 of each of
    the first ``n_seeds`` hosts, claim-ordered by source_id."""
    n = cfg.n_hosts if n_seeds is None else min(n_seeds, cfg.n_hosts)
    seeds = []
    for h in range(n):
        url = page_url(cfg, h, 0)
        seeds.append(
            {
                "source_id": h,
                "url": url,
                "host": cfg.host_name(h),
                "priority": "medium",
                "restricted": 4,
                "flags": 0,
            }
        )
    return seeds
