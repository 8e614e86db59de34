"""Network-log collection (M21) modeled as data effects.

The reference collects XHR/subresource requests through CDP while the
browser loads a page (``pkg/crawler/web.go:2052-2089`` collectXHR →
collectCDPRequests, capped at 1000 entries; performance-log entry shape
``pkg/crawler/types.go:156-186``) and appends them to the page's scraped
data. Without a browser, the *deterministic part* of that log is the
page's declared subresources — every ``img/script/stylesheet/video/audio/
source/iframe`` URL is a request a real browser issues on load. This stage
collects them in DOM order with the reference's cap; the response status
is a deterministic stand-in (a live CDP hook supplies real statuses).
"""

from __future__ import annotations

import pyarrow as pa

from ..htmldom import parse_dom
from ..urls import combine_urls

# tag → (url attribute, resource type)
_SUBRESOURCE_TAGS = {
    "img": ("src", "image"),
    "script": ("src", "script"),
    "video": ("src", "media"),
    "audio": ("src", "media"),
    "source": ("src", "media"),
    "iframe": ("src", "document"),
    "embed": ("src", "other"),
}

XHR_CAP = 1000  # reference collectCDPRequests cap (web.go:2064)


def collect_page_requests(url: str, html: str, cap: int = XHR_CAP) -> list[dict]:
    """→ request rows (request_url, method, resource_type, status) in DOM
    order, capped like the reference's chatty-site guard."""
    out: list[dict] = []
    for el in parse_dom(html or "").iter():
        if len(out) >= cap:
            break
        if el.tag in _SUBRESOURCE_TAGS:
            attr, rtype = _SUBRESOURCE_TAGS[el.tag]
            src = el.get(attr)
        elif el.tag == "link" and el.get("rel", "stylesheet") == "stylesheet":
            attr, rtype = "href", "stylesheet"
            src = el.get("href")
        else:
            continue
        if not src:
            continue
        req = combine_urls(url, src) if src.startswith("/") else src
        out.append(
            {"request_url": req, "method": "GET", "resource_type": rtype,
             "status": 200}
        )
    return out


class XhrCollectStage:
    """map_batches stage over (url, html) → exploded request-log rows."""

    def __init__(self, url_col: str = "url", html_col: str = "html",
                 id_col: str | None = None, cap: int = XHR_CAP):
        self.url_col = url_col
        self.html_col = html_col
        self.id_col = id_col
        self.cap = cap

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch[self.url_col].to_pylist()
        htmls = batch[self.html_col].to_pylist()
        ids = batch[self.id_col].to_pylist() if self.id_col else urls
        cols = {"page_id": [], "seq": [], "request_url": [], "method": [],
                "resource_type": [], "status": []}
        for pid, u, h in zip(ids, urls, htmls):
            for i, req in enumerate(collect_page_requests(u, h or "", self.cap)):
                cols["page_id"].append(pid)
                cols["seq"].append(i)
                for k in ("request_url", "method", "resource_type", "status"):
                    cols[k].append(req[k])
        id_type = batch[self.id_col].type if self.id_col else pa.string()
        return pa.table(
            {
                "page_id": pa.array(cols["page_id"], id_type),
                "seq": pa.array(cols["seq"], pa.int64()),
                "request_url": pa.array(cols["request_url"], pa.string()),
                "method": pa.array(cols["method"], pa.string()),
                "resource_type": pa.array(cols["resource_type"], pa.string()),
                "status": pa.array(cols["status"], pa.int64()),
            }
        )
