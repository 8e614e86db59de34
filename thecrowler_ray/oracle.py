"""Single-process reference oracle for the crawl engine.

Implements ENGINE_SPEC.md exactly, with plain Python data structures and no
Ray. The pytest equality gate compares the Ray engine's outputs against this
oracle: per-doc span sequences, final seen set, fetched (depth, ord) total
order, keyword lists. Shares the extraction/normalization library with the
engine on purpose — the oracle checks the *orchestration* (BFS waves, dedup,
politeness, truncation), while the extraction semantics are pinned by their
own unit tests against handcrafted HTML.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .htmlx import extract_page_info, page_spans
from .sources.synthweb import (
    CorpusConfig,
    action_links,
    page_html,
    parse_page_url,
    robots_disallow,
)
from .urls import (
    combine_urls,
    host_of,
    is_url_valid,
    normalize_url,
    skip_url,
    url_key_hex,
)


@dataclass
class CrawlParams:
    max_links: int = 10_000
    max_waves: int = 50
    politeness_rate: int = 10 ** 9  # tokens per host per wave
    politeness_capacity: int = 10 ** 9
    check_robots: bool = False
    link_score_fn: object = None  # deterministic fn(url)->int; priority frontier
    # standard action ruleset on: pages append synthweb.action_links ground
    # truth after static links (the engine must rediscover the same URLs via
    # its DOM click/submit path — the M17 equality gate)
    use_action_rules: bool = False
    restricted: int = 4
    unwanted: list[str] = field(default_factory=list)
    user_patterns: list[str] = field(default_factory=list)


@dataclass
class OracleResult:
    pages: list[dict]          # fetched pages in (depth, ord) order
    seen: set[str]             # url_key hex of everything ever enqueued
    metrics: list[dict]        # per-wave counters
    seen_hosts: dict = None    # url_key hex → host (for shard-routed probes)


def crawl_oracle(
    cfg: CorpusConfig, seeds: list[dict], params: CrawlParams
) -> OracleResult:
    import json as _json
    import re

    base_unwanted = [re.compile(p) for p in params.unwanted]
    # per-source overrides (ENGINE_SPEC / reference CombineConfig)
    def _seed_cfg(s):
        raw = s.get("config")
        if isinstance(raw, str):
            try:
                raw = _json.loads(raw)
            except ValueError:
                raw = None
        if not isinstance(raw, dict):
            return base_unwanted, params.user_patterns
        cc = raw.get("crawling_config", {}) or {}
        unw = base_unwanted + [re.compile(p) for p in cc.get("unwanted_urls", []) or []]
        pats = (
            ((cc.get("execution_plan") or {}).get("conditions") or {})
            .get("url_patterns")
        )
        return unw, (list(pats) if pats else params.user_patterns)
    seen: set[str] = set()
    seen_hosts: dict[str, str] = {}
    tokens: dict[str, int] = {}
    pages: list[dict] = []
    metrics: list[dict] = []

    # ---- init: seeds → valid → dedup → seen.insert ----
    pending: list[dict] = []  # rows: url, key, host, depth, ord, src_url
    for rank, s in enumerate(sorted(seeds, key=lambda s: s["source_id"])):
        url = s["url"]
        if not is_url_valid(url):
            continue
        key = url_key_hex(url)
        if key in seen:
            continue
        seen.add(key)
        seen_hosts[key] = host_of(url)
        unw, pats = _seed_cfg(s)
        pending.append(
            {
                "url": url,
                "key": key,
                "host": host_of(url),
                "depth": 0,
                "ord": rank,
                "src_url": url,
                "restricted": s.get("restricted", params.restricted),
                "unwanted": unw,
                "patterns": pats,
            }
        )

    total_fetched = 0
    wave = 0
    while pending and total_fetched < params.max_links and wave < params.max_waves:
        # 1. politeness tick: known hosts refill by rate (capped); hosts seen
        # for the first time start with `rate` tokens (ENGINE_SPEC.md)
        for h in list(tokens):
            tokens[h] = min(
                tokens[h] + params.politeness_rate, params.politeness_capacity
            )
        for h in {r["host"] for r in pending}:
            if h not in tokens:
                tokens[h] = min(params.politeness_rate, params.politeness_capacity)
        # 2. admission (per host by (depth, ord)), robots drop
        admitted: list[dict] = []
        deferred: list[dict] = []
        robots_dropped = 0
        by_host: dict[str, list[dict]] = {}
        for r in sorted(pending, key=lambda r: (r["depth"], r["ord"])):
            by_host.setdefault(r["host"], []).append(r)
        for h, rows in by_host.items():
            grant = min(tokens.get(h, 0), len(rows))
            kept = []
            for r in rows:
                if params.check_robots:
                    from urllib.parse import urlparse

                    path = urlparse(r["url"]).path
                    if any(path.startswith(p) for p in robots_disallow(cfg, h)):
                        robots_dropped += 1
                        continue
                kept.append(r)
            admitted.extend(kept[:grant])
            deferred.extend(kept[grant:])
            tokens[h] = tokens.get(h, 0) - min(grant, len(kept))
        if not admitted:
            if params.politeness_rate == 0:
                break
            wave += 1
            pending = deferred
            metrics.append(
                {"wave": wave - 1, "fetched": 0, "deferred": len(deferred),
                 "robots_dropped": robots_dropped}
            )
            continue

        # 3. fetch + parse (order by (depth, ord) for output determinism)
        admitted.sort(key=lambda r: (r["depth"], r["ord"]))
        wave_pages = []
        errors = 0
        for r in admitted:
            hp = parse_page_url(cfg, r["url"])
            if hp is None:
                errors += 1
                continue
            html = page_html(cfg, *hp)
            info = extract_page_info(r["url"], html)
            if params.use_action_rules:
                info = dict(info)
                info["links"] = list(info["links"]) + [
                    {"href": u, "element_id": f"action:{k}"}
                    for k, u in enumerate(action_links(cfg, *hp))
                ]
            spans = page_spans(info)
            wave_pages.append((r, info, spans))
        total_fetched += len(wave_pages)

        # 4. truncation budget
        budget = max(0, params.max_links - total_fetched - len(deferred))

        # 5. candidate links, 6. wave-local dedup (first-win)
        skipped = 0
        dup = 0
        best: dict[str, tuple[tuple[int, int], dict]] = {}
        for r, info, spans in wave_pages:
            pages.append(
                {
                    "doc_id": r["key"],
                    "url": r["url"],
                    "host": r["host"],
                    "depth": r["depth"],
                    "ord": r["ord"],
                    "title": info["title"],
                    "summary": info["summary"],
                    "lang": info["lang"],
                    "spans": spans,
                }
            )
            for j, ln in enumerate(info["links"]):
                link = ln["href"]
                if link.startswith("/"):
                    link = combine_urls(r["url"], link)
                if skip_url(
                    link,
                    r["src_url"],
                    r["restricted"],
                    unwanted=r.get("unwanted", base_unwanted),
                    user_patterns=r.get("patterns", params.user_patterns),
                ):
                    skipped += 1
                    continue
                key = url_key_hex(link)
                pre_rank = (r["ord"], j)
                if key in best:
                    dup += 1
                    if pre_rank < best[key][0]:
                        best[key] = (pre_rank, {"url": link, "key": key, "r": r})
                else:
                    best[key] = (pre_rank, {"url": link, "key": key, "r": r})

        # 7. seen anti-join
        survivors = []
        for key, (pre_rank, item) in best.items():
            if key in seen:
                dup += 1
                continue
            survivors.append((pre_rank, item))
        # 8. next frontier: sort (priority score desc when configured, then
        # discovery), truncate, re-rank, insert into seen
        if params.link_score_fn is not None:
            survivors.sort(
                key=lambda t: (-int(params.link_score_fn(t[1]["url"])), t[0])
            )
        else:
            survivors.sort(key=lambda t: t[0])
        survivors = survivors[:budget]
        new_rows = []
        for new_ord, (_, item) in enumerate(survivors):
            seen.add(item["key"])
            seen_hosts[item["key"]] = host_of(item["url"])
            parent = item["r"]
            new_rows.append(
                {
                    "url": item["url"],
                    "key": item["key"],
                    "host": host_of(item["url"]),
                    "depth": wave + 1,
                    "ord": new_ord,
                    "src_url": parent["src_url"],
                    "restricted": parent["restricted"],
                    "unwanted": parent.get("unwanted", base_unwanted),
                    "patterns": parent.get("patterns", params.user_patterns),
                }
            )
        metrics.append(
            {
                "wave": wave,
                "fetched": len(wave_pages),
                "errors": errors,
                "skipped": skipped,
                "duplicates": dup,
                "deferred": len(deferred),
                "robots_dropped": robots_dropped,
                "new_frontier": len(new_rows),
            }
        )
        pending = deferred + new_rows
        wave += 1

    return OracleResult(pages=pages, seen=seen, metrics=metrics, seen_hosts=seen_hosts)
