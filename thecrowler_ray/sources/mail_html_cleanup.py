"""Email HTML cleanup (reference ``pkg/mail/html_cleanup.go``).

Before extraction, a *temporary* DOM is stripped of narrowly recognized
email artifacts — never the archived HTML body itself (:28-30):

- scripts;
- hidden preheaders: elements marked preheader/preview-text (id or
  class token) AND statically hidden (hidden / aria-hidden / display:
  none / visibility:hidden / zero font-size, line-height, max-height or
  max-width / opacity 0) (:72-88);
- client boilerplate: gmail_quote / yahoo_quoted classes and the
  Outlook reply-forward ids (:90-96);
- tracking pixels: imgs whose width AND height are known and ≤ 1
  (attribute or inline style, px-suffixed, ``!important`` stripped)
  (:124-141), and anchors that wrap ONLY pixels/whitespace/comments
  (:98-122).
"""

from __future__ import annotations

from ..htmldom import Element, parse_dom, serialize

BOILERPLATE_CLASSES = {"gmail_quote", "yahoo_quoted"}
BOILERPLATE_IDS = {"divrplyfwdmsg", "replyforwardmsg"}
PREHEADER_MARKERS = {"mcnpreviewtext", "preheader", "preview-text",
                     "preview_text"}


def _attr(el: Element, name: str) -> str:
    for key, value in el.attrs.items():
        if key.lower() == name:
            return value or ""
    return ""


def _has_bool_attr(el: Element, name: str) -> bool:
    return any(key.lower() == name for key in el.attrs)


def inline_declarations(style: str) -> dict[str, str]:
    out = {}
    for declaration in (style or "").split(";"):
        if ":" not in declaration:
            continue
        prop, value = declaration.split(":", 1)
        prop = prop.strip().lower()
        value = value.strip().lower()
        if value.endswith("!important"):
            value = value[:-len("!important")].strip()
        if prop:
            out[prop] = value
    return out


def parse_css_length(value: str) -> tuple[float, bool]:
    value = (value or "").strip().lower()
    if value.endswith("!important"):
        value = value[:-len("!important")].strip()
    if value.endswith("px"):
        value = value[:-2]
    value = value.strip()
    if not value:
        return 0.0, False
    try:
        return float(value), True
    except ValueError:
        return 0.0, False


def _zero_css_length(value: str) -> bool:
    number, ok = parse_css_length(value)
    return ok and number == 0


def _has_class_token(el: Element, markers: set[str]) -> bool:
    return any(token.lower() in markers
               for token in _attr(el, "class").split())


def _has_marker(el: Element, markers: set[str]) -> bool:
    if _attr(el, "id").strip().lower() in markers:
        return True
    return _has_class_token(el, markers)


def _is_hidden_preheader(el: Element) -> bool:
    if not _has_marker(el, PREHEADER_MARKERS):
        return False
    if _has_bool_attr(el, "hidden") or \
            _attr(el, "aria-hidden").strip().lower() == "true":
        return True
    style = inline_declarations(_attr(el, "style"))
    return (style.get("display") == "none"
            or style.get("visibility") == "hidden"
            or _zero_css_length(style.get("font-size", ""))
            or _zero_css_length(style.get("line-height", ""))
            or _zero_css_length(style.get("max-height", ""))
            or _zero_css_length(style.get("max-width", ""))
            or style.get("opacity") == "0")


def _is_boilerplate(el: Element) -> bool:
    if _has_class_token(el, BOILERPLATE_CLASSES):
        return True
    return _attr(el, "id").strip().lower() in BOILERPLATE_IDS


def _element_dimension(el: Element, name: str) -> tuple[float, bool]:
    value = _attr(el, name).strip()
    if value:
        return parse_css_length(value)
    return parse_css_length(
        inline_declarations(_attr(el, "style")).get(name, ""))


def _is_tracking_pixel(el: Element) -> bool:
    if el.tag.lower() != "img":
        return False
    width, width_known = _element_dimension(el, "width")
    height, height_known = _element_dimension(el, "height")
    return width_known and height_known and width <= 1 and height <= 1


def _is_tracking_pixel_link(el: Element) -> bool:
    if el.tag.lower() != "a":
        return False
    found_pixel = False
    for child in el.children:
        if isinstance(child, str):
            if child.strip():
                return False
            continue
        if not _is_tracking_pixel(child):
            return False
        found_pixel = True
    return found_pixel


def _should_remove(el: Element) -> bool:
    if el.tag.lower() == "script" or _is_hidden_preheader(el) \
            or _is_boilerplate(el):
        return True
    if _is_tracking_pixel(el):
        return True
    return _is_tracking_pixel_link(el)


def _cleanup_node(parent: Element) -> None:
    kept = []
    for child in parent.children:
        if isinstance(child, Element) and _should_remove(child):
            continue
        if isinstance(child, Element):
            _cleanup_node(child)
        kept.append(child)
    parent.children = kept


def cleanup_email_html(source: str) -> str:
    """cleanupEmailHTML (:31-44): returns cleaned HTML; the caller keeps
    the original body (cleanup never mutates the archive)."""
    root = parse_dom(source)
    _cleanup_node(root)
    return "".join(
        serialize(child) if isinstance(child, Element) else child
        for child in root.children)
