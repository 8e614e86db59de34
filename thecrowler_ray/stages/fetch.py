"""Fetch + parse actor-pool stage.

Replaces the reference's browser fetch (``pkg/crawler/web.go:1097-1453``
getURLContent) + ``collectLoadedWebPage`` → ``extractPageInfo`` /
``extractLinks`` / ``extractKeywords`` chain (``web.go:995-1093``) with one
``map_batches`` actor-pool stage: the actor is the "browser session" (state
set up once in ``__init__`` — reference ST3/ST5), each ``__call__`` fetches
and parses a batch of frontier rows and emits one page row per success.

In the sandbox the fetch is the deterministic synthweb generator (a pure
function of the URL — no corpus broadcast needed; see
``sources/synthweb.py``). Swap ``_fetch`` for a real HTTP client on a live
cluster; everything downstream is unchanged.

Output row: doc_id (url_key hex), url, host, depth, ord, src_url,
restricted, title, summary, lang, detected_type, content_hash (SHA-256 of
body text — reference WebObjects hash ``pkg/crawler/crawler.go:1504-1520``),
spans (list<struct<kind,text,media_ref,offset>>), links
(list<struct<href,element_id,link_idx>>), fetch_ok.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

from ..content_type import infer_document_type
from ..htmlx import extract_page_info, page_spans
from ..sources.synthweb import CorpusConfig, page_html, parse_page_url

SPAN_TYPE = pa.list_(
    pa.struct(
        [
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )
)
LINK_TYPE = pa.list_(
    pa.struct(
        [("href", pa.string()), ("element_id", pa.string()), ("link_idx", pa.int32())]
    )
)

PAGE_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("url", pa.string()),
        ("host", pa.string()),
        ("depth", pa.int32()),
        ("ord", pa.int64()),
        ("src_url", pa.string()),
        ("restricted", pa.int32()),
        ("cfg_idx", pa.int32()),
        ("title", pa.string()),
        ("summary", pa.string()),
        ("lang", pa.string()),
        ("detected_type", pa.string()),
        ("content_hash", pa.string()),
        ("spans", SPAN_TYPE),
        ("links", LINK_TYPE),
    ]
)


class FetchParse:
    """Callable class for ``map_batches(..., concurrency=N)`` actor pools.

    Retry semantics mirror the reference (per-URL navigation retries with a
    budget, ``pkg/crawler/web.go:1131-1399``; ``max_retries: 3`` default):
    transient failures retry up to ``max_retries`` times; permanent failures
    (unknown URL = 404) don't. ``flaky_every`` injects deterministic
    transient failures for tests (n-th fetch attempt of matching URLs fails
    once) — a real HTTP fetcher raises/returns transient errors naturally.
    """

    def __init__(self, corpus_cfg: CorpusConfig, max_retries: int = 3,
                 flaky_every: int = 0, action_rules: list | None = None):
        self.cfg = corpus_cfg
        self.max_retries = max_retries
        self.flaky_every = flaky_every
        self.action_rules = list(action_rules) if action_rules else None
        self._attempted: set[str] = set()
        self.retry_count = 0

    def _fetch_once(self, url: str, attempt: int) -> tuple[str | None, bool]:
        """→ (html, transient): html None + transient=True means retryable."""
        hp = parse_page_url(self.cfg, url)
        if hp is None:
            return None, False  # permanent (404)
        if (
            self.flaky_every
            and attempt == 0
            and int.from_bytes(
                hashlib.md5(f"{self.cfg.seed}|{url}".encode()).digest()[:4], "big"
            ) % self.flaky_every == 0
        ):
            return None, True  # injected transient failure
        return page_html(self.cfg, *hp), False

    def _fetch(self, url: str) -> str | None:
        for attempt in range(self.max_retries + 1):
            html, transient = self._fetch_once(url, attempt)
            if html is not None:
                return html
            if not transient:
                return None
            self.retry_count += 1
        return None

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {name: [] for name in PAGE_SCHEMA.names}
        urls = batch["url"].to_pylist()
        keys = batch["key"].to_pylist()
        hosts = batch["host"].to_pylist()
        depths = batch["depth"].to_pylist()
        ords = batch["ord"].to_pylist()
        srcs = batch["src_url"].to_pylist()
        restr = batch["restricted"].to_pylist()
        cfgi = (
            batch["cfg_idx"].to_pylist()
            if "cfg_idx" in batch.column_names
            else [0] * len(urls)
        )
        for i, url in enumerate(urls):
            html = self._fetch(url)
            if html is None:
                continue  # fetch error: no page row (counted by the driver)
            info = extract_page_info(url, html)
            if self.action_rules:
                # action-rule navigations join the link list after static
                # links, in rule-execution order (reference M17: clicked /
                # submitted targets enter the frontier like any other link);
                # they appear in the span sequence too, as the reference
                # records rule-produced objects on the collected page
                from ..actions import execute_action_rules

                acted = execute_action_rules(url, html, self.action_rules)
                info["links"] = list(info["links"]) + [
                    {"href": u, "element_id": f"action:{rn}"}
                    for rn, u in enumerate(acted["discovered"])
                ]
            spans = page_spans(info)
            page_links = info["links"]
            cols["doc_id"].append(keys[i])
            cols["url"].append(url)
            cols["host"].append(hosts[i])
            cols["depth"].append(depths[i])
            cols["ord"].append(ords[i])
            cols["src_url"].append(srcs[i])
            cols["restricted"].append(restr[i])
            cols["cfg_idx"].append(cfgi[i])
            cols["title"].append(info["title"])
            cols["summary"].append(info["summary"])
            cols["lang"].append(info["lang"])
            cols["detected_type"].append(infer_document_type(url, html))
            cols["content_hash"].append(
                hashlib.sha256(info["body_text"].encode("utf-8")).hexdigest()
            )
            cols["spans"].append(spans)
            cols["links"].append(
                [
                    {"href": ln["href"], "element_id": ln["element_id"], "link_idx": j}
                    for j, ln in enumerate(page_links)
                ]
            )
        return pa.Table.from_pydict(cols, schema=PAGE_SCHEMA)


class HttpFetchParse(FetchParse):
    """The LIVE form of S2/S3: a real HTTP client in the same parse stage.

    Identical parse/spans/links/retry machinery (``__call__`` is fetch-
    agnostic); ``_fetch_once`` performs a urllib GET with a custom
    User-Agent and timeout (the reference's non-browser fetch client,
    ``pkg/common/fetchClient.go``). HTTP 4xx is permanent (no retry), 5xx
    and transport errors are transient (retry within the budget) — the
    reference's navigation-retry classification. ``proxy_base`` prefixes
    every URL (forward-proxy style; also how tests point the fetcher at a
    local fixture server instead of the live web)."""

    def __init__(self, max_retries: int = 3, user_agent: str =
                 "thecrowler-ray/0.1", timeout_sec: float = 10.0,
                 proxy_base: str = "", action_rules: list | None = None):
        super().__init__(CorpusConfig(), max_retries=max_retries,
                         action_rules=action_rules)
        self.user_agent = user_agent
        self.timeout_sec = timeout_sec
        self.proxy_base = proxy_base

    def _fetch_once(self, url: str, attempt: int) -> tuple[str | None, bool]:
        from ..fetch_client import FetchError, FetchOpts, fetch_remote_bytes

        target = self.proxy_base + url if self.proxy_base else url
        try:
            body, _ctype = fetch_remote_bytes(target, FetchOpts(
                user_agent=self.user_agent, timeout=self.timeout_sec,
                retries=0))  # the stage owns retry classification
            return body.decode("utf-8", "replace"), False
        except FetchError as e:
            msg = str(e)
            if msg.startswith("non-2xx status:"):
                return None, int(msg.rsplit(" ", 1)[1]) >= 500
            # transport failures are transient; size/MIME/scheme rejections
            # and redirect loops are permanent
            return None, msg.startswith("request failed")
        except OSError:
            return None, True
