"""Information-seed search providers (reference
``pkg/infoseed/searchproviders/``): generic JSON, Brave, Bing, and
RSS/Atom adapters producing ranked candidate Results.

Semantics mirrored from the reference:
  - generic JSON (``searchproviders.go:157-214,684-703``): GET with ``q``,
    ``page_size`` + ``page`` pagination, Accept: application/json,
    bearer token / query-string api key; result items found under
    results/items/webPages.value/organic_results or a bare list.
  - Brave (``:246-300,705-738``): /res/v1/web/search, ``count`` + ``page``,
    items at web.results (url/title/description).
  - Bing (``:302-360,740-772``): /v7.0/search, ``count`` + ``offset``,
    items at webPages.value (url/name/snippet).
  - rank = 1-based order, score = reciprocal rank (``:848-853``); empty
    URLs dropped; results trimmed to page_size × max_pages.
  - RSS/Atom (``rss_feed.go``): stdlib XML parse of channel/item and
    feed/entry, same Result shape.

Transport is the same seam pattern as the rest of the repo: ``http_get``
defaults to a urllib GET (tests point base URLs at local fixture
servers; live hosts need a cluster with egress).
"""

from __future__ import annotations

import json
import urllib.request
import xml.etree.ElementTree as ET
from urllib.parse import urlencode


def _urllib_get(url: str, headers: dict[str, str]) -> bytes:
    req = urllib.request.Request(url)
    for k, v in headers.items():
        req.add_header(k, v)
    with urllib.request.urlopen(req, timeout=15) as r:
        return r.read()


def reciprocal_rank(rank: int) -> float:
    return 0.0 if rank < 1 else 1.0 / rank


def _result(url: str, title: str, snippet: str, rank: int) -> dict:
    return {"url": url or "", "title": title or "", "snippet": snippet or "",
            "rank": rank, "score": reciprocal_rank(rank)}


def _find_items(payload):
    """findResultItems (searchproviders.go:775-798)."""
    if isinstance(payload, list):
        return payload
    if isinstance(payload, dict):
        for key in ("results", "items", "webPages", "organic_results"):
            if key in payload:
                value = payload[key]
                if key == "webPages" and isinstance(value, dict):
                    if isinstance(value.get("value"), list):
                        return value["value"]
                if isinstance(value, list):
                    return value
        return [payload]
    return []


def _first_str(entry: dict, *keys) -> str:
    for k in keys:
        v = entry.get(k)
        if isinstance(v, str) and v.strip():
            return v
    return ""


def _paged_get(base: str, endpoint: str, query: str, *, provider: str,
               page_size: int, max_pages: int, api_key_label: str = "",
               api_key: str = "", token: str = "",
               headers: dict | None = None, http_get=_urllib_get):
    """Shared pagination loop → list of parsed JSON payloads."""
    hdrs = {"Accept": "application/json", **(headers or {})}
    if token:
        hdrs["Authorization"] = "Bearer " + token
    pages = []
    for page in range(1, max_pages + 1):
        params: list[tuple[str, str]] = [("q", query)]
        if page_size > 0:
            params.append(("count" if provider in ("brave_search",
                                                   "bing_web_search")
                           else "page_size", str(page_size)))
        if page > 1:
            if provider == "bing_web_search":
                params.append(("offset", str((page - 1) * page_size)))
            else:
                params.append(("page", str(page)))
        if api_key_label and api_key:
            params.append((api_key_label, api_key))
        url = base.rstrip("/") + endpoint + "?" + urlencode(params)
        pages.append(json.loads(http_get(url, hdrs)))
    return pages


def search_json(base: str, query: str, endpoint: str = "/search", *,
                page_size: int = 10, max_pages: int = 1,
                api_key_label: str = "", api_key: str = "", token: str = "",
                headers: dict | None = None, http_get=_urllib_get) -> list[dict]:
    results: list[dict] = []
    for payload in _paged_get(base, endpoint, query, provider="http_json",
                              page_size=page_size, max_pages=max_pages,
                              api_key_label=api_key_label, api_key=api_key,
                              token=token, headers=headers,
                              http_get=http_get):
        items = _find_items(payload)
        for item in items:
            if not isinstance(item, dict):
                continue
            rank = len(results) + 1
            r = _result(_first_str(item, "url", "link"),
                        _first_str(item, "title", "name"),
                        _first_str(item, "snippet", "description"), rank)
            if r["url"].strip():
                results.append(r)
        if not items:
            break
    return results[: page_size * max_pages]


def search_brave(base: str, query: str, *, page_size: int = 10,
                 max_pages: int = 1, token: str = "",
                 headers: dict | None = None,
                 http_get=_urllib_get) -> list[dict]:
    results: list[dict] = []
    for payload in _paged_get(base, "/res/v1/web/search", query,
                              provider="brave_search", page_size=page_size,
                              max_pages=max_pages, token=token,
                              headers=headers, http_get=http_get):
        web = payload.get("web")
        if not isinstance(web, dict) or not isinstance(
                web.get("results"), list):
            raise ValueError("malformed brave_search response")
        page_items = 0
        for entry in web["results"]:
            rank = len(results) + 1
            r = _result(_first_str(entry, "url"), _first_str(entry, "title"),
                        _first_str(entry, "description", "snippet"), rank)
            page_items += 1
            if r["url"].strip():
                results.append(r)
        if page_items == 0:
            break
    return results[: page_size * max_pages]


def search_bing(base: str, query: str, *, page_size: int = 10,
                max_pages: int = 1, api_key: str = "",
                http_get=_urllib_get) -> list[dict]:
    headers = {"Ocp-Apim-Subscription-Key": api_key} if api_key else {}
    results: list[dict] = []
    for payload in _paged_get(base, "/v7.0/search", query,
                              provider="bing_web_search",
                              page_size=page_size, max_pages=max_pages,
                              headers=headers, http_get=http_get):
        web = payload.get("webPages")
        if not isinstance(web, dict) or not isinstance(web.get("value"), list):
            raise ValueError("malformed bing_web_search response")
        page_items = 0
        for entry in web["value"]:
            rank = len(results) + 1
            r = _result(_first_str(entry, "url"),
                        _first_str(entry, "name", "title"),
                        _first_str(entry, "snippet", "description"), rank)
            page_items += 1
            if r["url"].strip():
                results.append(r)
        if page_items == 0:
            break
    return results[: page_size * max_pages]


def parse_feed(xml_text: str) -> list[dict]:
    """RSS 2.0 / Atom feed → ranked Results (rss_feed.go's item shape)."""
    root = ET.fromstring(xml_text)
    tag = root.tag.split("}")[-1]
    results: list[dict] = []
    if tag == "rss":
        for item in root.findall("./channel/item"):
            rank = len(results) + 1
            link = (item.findtext("link") or "").strip()
            r = _result(link, (item.findtext("title") or "").strip(),
                        (item.findtext("description") or "").strip(), rank)
            if r["url"]:
                results.append(r)
    elif tag == "feed":  # Atom
        ns = root.tag.split("}")[0] + "}" if "}" in root.tag else ""
        for entry in root.findall(f"./{ns}entry"):
            rank = len(results) + 1
            link = ""
            for ln in entry.findall(f"{ns}link"):
                if ln.get("rel") in (None, "alternate"):
                    link = (ln.get("href") or "").strip()
                    break
            r = _result(link, (entry.findtext(f"{ns}title") or "").strip(),
                        (entry.findtext(f"{ns}summary") or "").strip(), rank)
            if r["url"]:
                results.append(r)
    else:
        raise ValueError(f"not an RSS/Atom feed (root <{tag}>)")
    return results


def results_to_candidates(results: list[dict]) -> list[dict]:
    """Provider Results → infoseed candidate dicts (url + score carried)."""
    return [{"url": r["url"], "score": r["score"], "title": r["title"]}
            for r in results]


def search_common_crawl(index_endpoint: str, query: str, *,
                        page_size: int = 10, max_pages: int = 1,
                        url_template: str = "", mime: str = "",
                        http_status: str = "", filters: tuple = (),
                        http_get=_urllib_get) -> list[dict]:
    """Common Crawl CDX index adapter (``common_crawl_index.go``): GET
    ``{index_endpoint}?url=<rendered query>&output=json&pageSize=N&page=P``
    with optional ``filter=mime:…`` / ``filter=status:…`` entries; the
    response is either a JSON array or NDJSON lines of capture records,
    ranked in index order with reciprocal-rank scores and the capture
    timestamp as the title."""
    rendered = url_template.replace("{query}", query) if url_template else query
    results: list[dict] = []
    for page in range(0, max_pages):
        params: list[tuple[str, str]] = [("url", rendered), ("output", "json"),
                                         ("pageSize", str(page_size)),
                                         ("page", str(page))]
        for f in filters:
            params.append(("filter", f))
        if mime:
            params.append(("filter", "mime:" + mime))
        if http_status:
            params.append(("filter", "status:" + http_status))
        body = http_get(index_endpoint + "?" + urlencode(params),
                        {"Accept": "application/json"})
        text = body.decode("utf-8", "replace").strip()
        if not text:
            break
        if text.startswith("["):
            items = json.loads(text)
        else:  # NDJSON
            items = [json.loads(ln) for ln in text.splitlines() if ln.strip()]
        if not items:
            break
        for item in items:
            link = _first_str(item, "url")
            if not link.strip():
                continue
            rank = len(results) + 1
            ts = _first_str(item, "timestamp")
            results.append({
                "url": link,
                "title": ("Common Crawl capture " + ts) if ts.strip()
                         else "Common Crawl capture",
                "snippet": "",
                "rank": rank,
                "score": reciprocal_rank(rank),
                "timestamp": ts,
                "mime": _first_str(item, "mime"),
                "status": _first_str(item, "status"),
                "digest": _first_str(item, "digest"),
            })
        if len(results) >= page_size * max_pages:
            break
    return results[: page_size * max_pages]
