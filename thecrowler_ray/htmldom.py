"""Minimal DOM + selector engine (stdlib only — no lxml/bs4 in container).

Backs the scrape-rule executor (reference ``pkg/scraper/extractor.go:64-461``
dispatches on selector type: css / id / name / link_text / partial_link_text /
tag / class_name / xpath / regex). This implements the subset those rules
actually need:

- CSS: ``tag``, ``#id``, ``.class``, ``tag.class``, ``[attr]``,
  ``[attr=val]``, descendant combinator (space), ``>`` child combinator,
  comma groups
- XPath subset: ``//tag``, ``//tag[@attr='v']``, ``/a/b``, ``//tag[n]``
- regex selectors run over the raw HTML

Documents are parsed once per page into an ``Element`` tree; selector lookups
walk the tree (pages are small relative to batch compute).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser

_VOID = {"meta", "img", "br", "hr", "input", "link", "source", "embed",
         "area", "base", "col", "track", "wbr"}


@dataclass
class Element:
    tag: str
    attrs: dict = field(default_factory=dict)
    children: list = field(default_factory=list)  # Element | str
    parent: "Element | None" = None

    def text(self) -> str:
        parts = []
        for c in self.children:
            if isinstance(c, str):
                parts.append(c)
            else:
                parts.append(c.text())
        return "".join(parts)

    def iter(self):
        yield self
        for c in self.children:
            if isinstance(c, Element):
                yield from c.iter()

    def get(self, name: str, default: str = "") -> str:
        return self.attrs.get(name, default)

    def remove(self) -> None:
        """Detach this element from its parent (DOM ``el.remove()``)."""
        if self.parent is not None:
            self.parent.children = [
                c for c in self.parent.children if c is not self
            ]
            self.parent = None


_ESC = {"&": "&amp;", "<": "&lt;", ">": "&gt;"}


def _esc_text(s: str) -> str:
    return "".join(_ESC.get(ch, ch) for ch in s)


def _esc_attr(s: str) -> str:
    return _esc_text(s).replace('"', "&quot;")


def serialize(el: "Element | str", inner: bool = False) -> str:
    """Serialize a (possibly mutated) tree back to HTML. ``inner=True``
    emits only the children (``innerHTML``); the synthetic ``document``
    root always serializes inner-only."""
    if isinstance(el, str):
        return _esc_text(el)
    kids = "".join(serialize(c) for c in el.children)
    if inner or el.tag == "document":
        return kids
    attrs = "".join(
        f' {k}' if v is None else f' {k}="{_esc_attr(v)}"'
        for k, v in el.attrs.items()
    )
    if el.tag in _VOID and not el.children:
        return f"<{el.tag}{attrs}>"
    return f"<{el.tag}{attrs}>{kids}</{el.tag}>"


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Element("document")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        el = Element(tag, dict(attrs), parent=self.stack[-1])
        self.stack[-1].children.append(el)
        if tag not in _VOID:
            self.stack.append(el)

    def handle_startendtag(self, tag, attrs):
        el = Element(tag, dict(attrs), parent=self.stack[-1])
        self.stack[-1].children.append(el)

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def parse_dom(html: str) -> Element:
    tb = _TreeBuilder()
    try:
        tb.feed(html)
        tb.close()
    except Exception:
        pass
    return tb.root


# ---------------------------------------------------------------------------
# CSS selector subset
# ---------------------------------------------------------------------------

_SIMPLE_RE = re.compile(
    r"^(?P<tag>[a-zA-Z][\w-]*|\*)?"
    r"(?P<id>#[\w-]+)?"
    r"(?P<classes>(?:\.[\w-]+)*)"
    r"(?P<attrs>(?:\[[^\]]+\])*)$"
)


def _match_simple(el: Element, sel: str) -> bool:
    m = _SIMPLE_RE.match(sel)
    if not m:
        return False
    tag = m.group("tag")
    if tag and tag != "*" and el.tag != tag.lower():
        return False
    if m.group("id") and el.get("id") != m.group("id")[1:]:
        return False
    classes = [c for c in (m.group("classes") or "").split(".") if c]
    el_classes = set(el.get("class", "").split())
    if any(c not in el_classes for c in classes):
        return False
    for attr_expr in re.findall(r"\[([^\]]+)\]", m.group("attrs") or ""):
        if "=" in attr_expr:
            name, _, val = attr_expr.partition("=")
            val = val.strip("'\"")
            if el.get(name.strip()) != val:
                return False
        elif attr_expr.strip() not in el.attrs:
            return False
    return True


def css_select(root: Element, selector: str) -> list[Element]:
    out: list[Element] = []
    seen = set()
    for group in selector.split(","):
        parts = group.strip().replace(" > ", " >").split()
        if not parts:
            continue
        matches = [root]
        for part in parts:
            child_only = part.startswith(">")
            sel = part.lstrip(">")
            nxt = []
            for m in matches:
                pool = (
                    [c for c in m.children if isinstance(c, Element)]
                    if child_only
                    else [e for e in m.iter() if e is not m]
                )
                nxt.extend(e for e in pool if _match_simple(e, sel))
            matches = nxt
        for e in matches:
            if id(e) not in seen:
                seen.add(id(e))
                out.append(e)
    return out


# ---------------------------------------------------------------------------
# XPath subset
# ---------------------------------------------------------------------------

_XP_STEP = re.compile(
    r"^(?P<tag>[\w*-]+)(?:\[(?P<pred>[^\]]+)\])?$"
)


def xpath_select(root: Element, path: str) -> list[Element]:
    path = path.strip()
    if path.startswith("//"):
        anywhere = True
        steps = path[2:].split("/")
    elif path.startswith("/"):
        anywhere = False
        steps = path[1:].split("/")
    else:
        anywhere = True
        steps = path.split("/")
    matches = [root]
    first = True
    for step in steps:
        m = _XP_STEP.match(step)
        if not m:
            return []
        tag, pred = m.group("tag"), m.group("pred")
        nxt = []
        for node in matches:
            if first and anywhere:
                pool = [e for e in node.iter() if e is not node]
            else:
                pool = [c for c in node.children if isinstance(c, Element)]
            cand = [e for e in pool if tag == "*" or e.tag == tag.lower()]
            if pred:
                if pred.startswith("@"):
                    name, _, val = pred[1:].partition("=")
                    val = val.strip("'\"")
                    if _:
                        cand = [e for e in cand if e.get(name) == val]
                    else:
                        cand = [e for e in cand if name in e.attrs]
                elif pred.isdigit():
                    idx = int(pred) - 1
                    cand = cand[idx : idx + 1]
                else:
                    return []
            nxt.extend(cand)
        matches = nxt
        first = False
    return matches


def select(root: Element, selector_type: str, value: str, html: str = "") -> list:
    """Unified selector dispatch (reference extractor.go selector types).
    Returns Elements (or strings for regex selectors)."""
    st = selector_type.strip().lower()
    if st in ("css", "css_selector"):
        return css_select(root, value)
    if st == "id":
        return css_select(root, f"#{value}")
    if st in ("class", "class_name"):
        return css_select(root, f".{value}")
    if st in ("tag", "tag_name"):
        return css_select(root, value)
    if st == "name":
        return [e for e in root.iter() if e.get("name") == value]
    if st == "link_text":
        return [
            e for e in root.iter() if e.tag == "a" and e.text().strip() == value
        ]
    if st == "partial_link_text":
        return [e for e in root.iter() if e.tag == "a" and value in e.text()]
    if st == "xpath":
        return xpath_select(root, value)
    if st == "regex":
        return [m if isinstance(m, str) else m[0]
                for m in re.findall(value, html)]
    return []
