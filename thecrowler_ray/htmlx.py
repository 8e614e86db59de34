"""HTML parsing + page-info extraction (the core parse/extract semantics).

From-scratch reimplementation (stdlib ``html.parser``; the reference uses
goquery) of:

- link extraction — ``pkg/crawler/crawler.go:2051-2080``: every ``<a href>``,
  href normalized with trim-spaces + strip-trailing-slash (no lowercase),
  kept when a valid web URL (scheme defaulted to http:// when missing);
  carries the element ``id``
- page-info extraction — ``pkg/crawler/web.go:3138-3324``:
  * title fallback chain: ``<title>`` → first ``<h1>`` → first ``<h2>`` →
    summary[:255] → current URL
  * summary chain: ``meta[name=description]`` → ``meta[property=og:description]``
    → ``meta[name=twitter:description]`` → body_text[:200]
  * body_text: all text outside ``<script>``, tabs → spaces, whitespace
    collapsed
  * meta tags: every ``<meta name=… content=…>`` — ``web.go:3436-3445``
  * language: ``<html lang>`` attribute else heuristic detection on body —
    ``web.go:3370-3401``
- media references: ``img/video/audio/source/embed`` ``src`` attributes
  (reference stores these as web objects / screenshots; here they become
  ``media`` spans per BASELINE.json's interleaved-document input shape)

``page_spans`` assembles the ordered span sequence
(title, summary, body_text, meta*, keyword*, link*, media*) that the
per-doc invariant checks (kind, text, media_ref, order).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from html import unescape
from html.parser import HTMLParser

from .keywords import extract_keywords
from .langid import detect_lang
from .urls import is_url_valid


@dataclass
class ParsedPage:
    title_tag: str = ""
    h1: str = ""
    h2: str = ""
    html_lang: str = ""
    meta: list[dict] = field(default_factory=list)  # {name, content}
    meta_prop: dict = field(default_factory=dict)  # property → content
    body_parts: list[str] = field(default_factory=list)
    links: list[dict] = field(default_factory=list)
    # links: {href, element_id, anchor} — anchor is the collapsed inner
    # text of the <a>, captured additively (the span contract's link
    # spans keep using element_id/href only)
    media: list[dict] = field(default_factory=list)  # {tag, src}


_MEDIA_TAGS = {"img", "video", "audio", "source", "embed"}
_SKIP_TEXT_TAGS = {"script", "style"}


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.page = ParsedPage()
        self._stack: list[str] = []
        self._capture: str | None = None  # title / h1 / h2 capture target
        self._cap_buf: list[str] = []
        self._skip_depth = 0
        self._anchor_idx: int | None = None  # open <a> being captured
        self._anchor_buf: list[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        a = dict(attrs)
        self._stack.append(tag)
        if tag in _SKIP_TEXT_TAGS:
            self._skip_depth += 1
        elif tag == "html":
            self.page.html_lang = (a.get("lang") or "").strip()
        elif tag == "meta":
            name = a.get("name")
            if name is not None:
                self.page.meta.append({"name": name, "content": a.get("content", "")})
            prop = a.get("property")
            if prop is not None:
                self.page.meta_prop[prop] = a.get("content", "")
        elif tag == "a":
            href = a.get("href")
            if href is not None:
                self.page.links.append(
                    {"href": href, "element_id": a.get("id", ""),
                     "anchor": ""}
                )
                # capture inner text until the matching </a> (nested
                # anchors are invalid HTML; a new <a> restarts capture)
                self._anchor_idx = len(self.page.links) - 1
                self._anchor_buf = []
        elif tag in _MEDIA_TAGS:
            src = a.get("src")
            if src:
                self.page.media.append({"tag": tag, "src": src})
        elif tag == "title" and not self.page.title_tag:
            self._capture, self._cap_buf = "title", []
        elif tag == "h1" and not self.page.h1:
            self._capture, self._cap_buf = "h1", []
        elif tag == "h2" and not self.page.h2:
            self._capture, self._cap_buf = "h2", []
        # <meta> / <img> are void elements; pop them immediately
        if tag in ("meta", "img", "br", "hr", "input", "link", "source", "embed"):
            self._stack.pop()

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TEXT_TAGS and self._skip_depth > 0:
            self._skip_depth -= 1
        if tag == "a" and self._anchor_idx is not None:
            self.page.links[self._anchor_idx]["anchor"] = _collapse(
                "".join(self._anchor_buf)
            )
            self._anchor_idx = None
            self._anchor_buf = []
        if self._capture and tag == self._capture:
            text = "".join(self._cap_buf)
            if self._capture == "title":
                self.page.title_tag = text
            elif self._capture == "h1":
                self.page.h1 = text
            elif self._capture == "h2":
                self.page.h2 = text
            self._capture = None
        while self._stack and self._stack[-1] != tag:
            self._stack.pop()
        if self._stack:
            self._stack.pop()

    def handle_data(self, data: str) -> None:
        if self._skip_depth:
            return
        if self._capture is not None:
            self._cap_buf.append(data)
        if self._anchor_idx is not None:
            self._anchor_buf.append(data)
        self.page.body_parts.append(data)


def parse_html(html: str) -> ParsedPage:
    ex = _Extractor()
    try:
        ex.feed(html)
        ex.close()
    except Exception:
        pass  # be forgiving like the reference (broken DOM snapshots)
    return ex.page


def _collapse(text: str) -> str:
    return " ".join(text.replace("\t", " ").split())


def extract_page_info(url: str, html: str, lang_hint: str = "") -> dict:
    """HTML → PageDoc dict (url, title, summary, body_text, lang,
    meta_tags, links, media). Pure function; engine and oracle share it."""
    page = parse_html(html)

    body_text = _collapse(" ".join(page.body_parts))

    summary = page.meta and next(
        (m["content"] for m in page.meta if m["name"].strip().lower() == "description"
         and m["content"].strip()),
        "",
    ) or ""
    if not summary.strip():
        summary = page.meta_prop.get("og:description", "")
    if not summary.strip():
        summary = next(
            (m["content"] for m in page.meta
             if m["name"].strip().lower() == "twitter:description"
             and m["content"].strip()),
            "",
        )
    if not summary.strip():
        summary = body_text[:200]

    title = page.title_tag.strip()
    if not title:
        title = page.h1.strip() or page.h2.strip()
    if not title:
        title = summary[:255].strip() or url.strip()

    lang = page.html_lang or lang_hint or detect_lang(body_text)

    links = []
    for ln in page.links:
        href = unescape(ln["href"]).strip().rstrip("/")
        if not href:
            continue
        # root-relative links are kept (resolved later against the source,
        # like the reference worker's combineURLs step)
        if href.startswith("/") or is_url_valid(
            href if "://" in href else "http://" + href
        ):
            links.append({"href": href, "element_id": ln["element_id"]})

    media = [{"tag": m["tag"], "src": unescape(m["src"]).strip()} for m in page.media]

    return {
        "url": url,
        "title": title,
        "summary": summary,
        "body_text": body_text,
        "lang": lang,
        "meta_tags": page.meta,
        "links": links,
        "media": media,
    }


SPAN_KINDS = ("title", "summary", "body_text", "meta", "keyword", "link", "media")


def page_spans(info: dict) -> list[dict]:
    """Ordered span sequence for the interleaved-document table:
    title, summary, body_text, meta*, keyword*, link*, media*.

    Each span: ``{kind, text, media_ref, offset}`` — ``media_ref`` empty for
    pure-text kinds; ``offset`` is the span's position in the sequence.
    """
    spans: list[dict] = [
        {"kind": "title", "text": info["title"], "media_ref": ""},
        {"kind": "summary", "text": info["summary"], "media_ref": ""},
        {"kind": "body_text", "text": info["body_text"], "media_ref": ""},
    ]
    for m in info["meta_tags"]:
        spans.append(
            {"kind": "meta", "text": f'{m["name"]}={m["content"]}', "media_ref": ""}
        )
    for kw in extract_keywords(info["body_text"], info["meta_tags"], info["lang"]):
        spans.append({"kind": "keyword", "text": kw, "media_ref": ""})
    for ln in info["links"]:
        spans.append({"kind": "link", "text": ln["element_id"], "media_ref": ln["href"]})
    for m in info["media"]:
        spans.append({"kind": "media", "text": m["tag"], "media_ref": m["src"]})
    for i, s in enumerate(spans):
        s["offset"] = i
    return spans
