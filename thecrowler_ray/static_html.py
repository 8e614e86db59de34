"""Browser-free static HTML extraction (reference
``pkg/browser/static_html.go``).

Parses untrusted HTML without any resource loading and extracts
visible-ish text plus hyperlinks — the boundary the mail pipeline (and
any other untrusted-content consumer) uses so embedded resources,
scripts, and tracking pixels stay inert. Mirrored semantics:

- non-rendered containers pruned entirely: head, script, style,
  template, noscript, iframe, object, embed, audio, video, svg, canvas
  (:109-131);
- static hidden markers honored: ``hidden``, ``aria-hidden="true"``,
  inline ``display:none`` / ``visibility:hidden|collapse`` (with
  ``!important`` stripped) (:112-147);
- ``a``/``area`` elements with a non-blank href yield (href, anchor
  text); anchor text deliberately ALSO appears in the page text, like
  the reference's double walk (:78-92);
- all text whitespace-normalized to single spaces.
"""

from __future__ import annotations

from .htmldom import Element, parse_dom

_PRUNED_TAGS = {"head", "script", "style", "template", "noscript",
                "iframe", "object", "embed", "audio", "video", "svg",
                "canvas"}


def _inline_style_hides(style: str) -> bool:
    for declaration in style.split(";"):
        if ":" not in declaration:
            continue
        prop, value = declaration.split(":", 1)
        prop = prop.strip().lower()
        value = value.strip().lower()
        if value.endswith("!important"):
            value = value[:-len("!important")].strip()
        if prop == "display" and value == "none":
            return True
        if prop == "visibility" and value in ("hidden", "collapse"):
            return True
    return False


def _is_statically_hidden(el: Element) -> bool:
    if el.tag.lower() in _PRUNED_TAGS:
        return True
    for key, value in el.attrs.items():
        key = key.lower()
        if key == "hidden":
            return True
        if key == "aria-hidden" and (value or "").strip().lower() == "true":
            return True
        if key == "style" and _inline_style_hides(value or ""):
            return True
    return False


def _attr(el: Element, name: str) -> str:
    for key, value in el.attrs.items():
        if key.lower() == name:
            return value or ""
    return ""


def _walk(node, text: list[str], links: list[dict] | None) -> None:
    if isinstance(node, str):
        text.extend(node.split())
        return
    if _is_statically_hidden(node):
        return
    if links is not None and node.tag.lower() in ("a", "area"):
        href = _attr(node, "href").strip()
        if href:
            anchor: list[str] = []
            for child in node.children:
                _walk(child, anchor, None)
            links.append({"href": href, "text": " ".join(anchor)})
    for child in node.children:
        _walk(child, text, links)


def extract_static_html(source: str) -> dict:
    """→ ``{"text": str, "links": [{"href", "text"}, ...]}``."""
    root = parse_dom(source)
    text: list[str] = []
    links: list[dict] = []
    for child in (root.children if root.tag == "document" else [root]):
        _walk(child, text, links)
    return {"text": " ".join(text), "links": links}
