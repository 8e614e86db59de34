"""DOM binding for vdi_plugin scripts (SURVEY.md §2.10).

The reference's ``vdi_plugin`` type runs its JS inside the live browser
page via WebDriver ``ExecuteScript`` (``pkg/plugin/plugins.go:751-795``
execVDIPlugin → ``wd.ExecuteScript``), so the script's observable
data-plane effect is a DOM mutation (remove boilerplate nodes, rewrite
attributes) plus an optional return value — both of which feed the
scrape/extract stages that run afterwards. This module reproduces that
effect hermetically: the plugin runs under the bounded ``minijs``
interpreter against the page's parsed ``htmldom`` tree through a
``document`` host object, and the mutated tree serializes back to HTML
for downstream extraction.

Supported surface (what the reference's own vdi plugins use — e.g.
``plugins/RemoveArticleContent.js`` is one ``document.querySelector(…)
.remove()`` — plus the common read/rewrite patterns):

- ``document``: querySelector / querySelectorAll / getElementById /
  getElementsByTagName / getElementsByClassName, body, head,
  documentElement, title
- elements: tagName, id, className, textContent, innerText, innerHTML,
  outerHTML, parentElement, children, getAttribute / setAttribute /
  removeAttribute / hasAttribute, classList.add/remove/contains/toggle,
  remove(), scoped querySelector(All); assignment to textContent /
  innerHTML / id / className mutates the tree

Everything else stays outside the sandbox on purpose (no network, no
storage, no timers): unknown property reads yield ``undefined`` like JS,
so plugins relying on unsupported browser APIs fail loudly when they
call one.
"""

from __future__ import annotations

from .htmldom import Element, css_select, parse_dom, serialize
from .minijs import UNDEFINED, Interpreter, MiniJsError


def _wrap(el):
    return DomNode(el) if isinstance(el, Element) else el


class DomNode:
    """minijs host object over an ``htmldom.Element`` (live — mutations
    hit the shared tree)."""

    def __init__(self, el: Element):
        self.el = el

    def __eq__(self, other):  # JS node identity: same underlying element
        return isinstance(other, DomNode) and self.el is other.el

    def __hash__(self):
        return id(self.el)

    # -- minijs host protocol ---------------------------------------------
    def js_member(self, it, name):
        el = self.el
        if name == "tagName":
            return el.tag.upper()
        if name == "id":
            return el.get("id")
        if name == "className":
            return el.get("class")
        if name in ("textContent", "innerText"):
            return el.text()
        if name == "innerHTML":
            return serialize(el, inner=True)
        if name == "outerHTML":
            return serialize(el)
        if name in ("parentElement", "parentNode"):
            p = el.parent
            return DomNode(p) if p is not None and p.tag != "document" \
                else None
        if name == "children":
            return [DomNode(c) for c in el.children if isinstance(c, Element)]
        if name == "classList":
            return self._class_list()
        if name == "querySelector":
            return lambda _it, a: self._qs(a, first=True)
        if name == "querySelectorAll":
            return lambda _it, a: self._qs(a, first=False)
        if name == "getElementsByTagName":
            return lambda _it, a: [
                DomNode(e) for e in el.iter()
                if e is not el and e.tag == _s(a).lower()]
        if name == "getElementsByClassName":
            return lambda _it, a: [
                DomNode(e) for e in el.iter()
                if e is not el and _s(a) in e.get("class", "").split()]
        if name == "getAttribute":
            return lambda _it, a: (
                el.attrs[_s(a)] if _s(a) in el.attrs else None)
        if name == "setAttribute":
            return lambda _it, a: self._set_attr(a)
        if name == "removeAttribute":
            return lambda _it, a: (el.attrs.pop(_s(a), None), UNDEFINED)[1]
        if name == "hasAttribute":
            return lambda _it, a: _s(a) in el.attrs
        if name == "remove":
            return lambda _it, a: (el.remove(), UNDEFINED)[1]
        return UNDEFINED  # unsupported DOM APIs read as undefined (JS)

    def js_set_member(self, it, name, value):
        el = self.el
        if name == "textContent" or name == "innerText":
            el.children = [_str_of(value)]
        elif name == "innerHTML":
            frag = parse_dom(_str_of(value))
            el.children = frag.children
            for c in el.children:
                if isinstance(c, Element):
                    c.parent = el
        elif name == "id":
            el.attrs["id"] = _str_of(value)
        elif name == "className":
            el.attrs["class"] = _str_of(value)
        else:
            raise MiniJsError(f"cannot set DOM property {name!r}")

    def js_json(self):
        return serialize(self.el)

    # -- helpers -----------------------------------------------------------
    def _qs(self, a, first: bool):
        found = css_select(self.el, _s(a))
        if first:
            return DomNode(found[0]) if found else None
        return [DomNode(e) for e in found]

    def _set_attr(self, a):
        self.el.attrs[_s(a)] = _str_of(a[1] if len(a) > 1 else UNDEFINED)
        return UNDEFINED

    def _class_list(self):
        el = self.el

        def classes():
            return [c for c in el.get("class", "").split() if c]

        def put(cs):
            el.attrs["class"] = " ".join(cs)

        def add(_it, a):
            cs = classes()
            for v in a:
                if _str_of(v) not in cs:
                    cs.append(_str_of(v))
            put(cs)
            return UNDEFINED

        def rem(_it, a):
            drop = {_str_of(v) for v in a}
            put([c for c in classes() if c not in drop])
            return UNDEFINED

        def toggle(_it, a):
            v = _s(a)
            cs = classes()
            if v in cs:
                put([c for c in cs if c != v])
                return False
            cs.append(v)
            put(cs)
            return True

        return {
            "add": add,
            "remove": rem,
            "toggle": toggle,
            "contains": lambda _it, a: _s(a) in classes(),
            "length": float(len(classes())),
        }


class DomDocument(DomNode):
    """The ``document`` global (wraps the synthetic parse root)."""

    def js_member(self, it, name):
        root = self.el
        if name == "documentElement":
            for c in root.iter():
                if c.tag == "html":
                    return DomNode(c)
            return DomNode(root)
        if name == "body" or name == "head":
            for c in root.iter():
                if c.tag == name:
                    return DomNode(c)
            return None
        if name == "title":
            for c in root.iter():
                if c.tag == "title":
                    return c.text()
            return ""
        if name == "getElementById":
            return lambda _it, a: next(
                (DomNode(e) for e in root.iter() if e.get("id") == _s(a)),
                None)
        return super().js_member(it, name)

    def js_set_member(self, it, name, value):
        raise MiniJsError(f"cannot set document.{name}")

    def js_json(self):
        return serialize(self.el, inner=True)


def _s(args) -> str:
    return _str_of(args[0] if args else UNDEFINED)


def _str_of(v) -> str:
    if isinstance(v, str):
        return v
    if v is UNDEFINED:
        return "undefined"
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return str(int(v)) if v.is_integer() else repr(v)
    return str(v)


def run_dom_plugin(source: str, html: str, params: dict | None = None,
                   max_ops: int = 500_000, now_ms: float = 0.0):
    """Execute a vdi_plugin script against a page. Returns
    ``(result, mutated_html)`` — result per the engine-plugin export
    convention, mutated_html the serialized post-plugin DOM (what the
    browser page would contain when scraping runs next)."""
    root = parse_dom(html)
    doc = DomDocument(root)
    result = Interpreter(max_ops=max_ops, now_ms=now_ms).run(
        source, params, host_vars={"document": doc})
    return result, serialize(root, inner=True)


def apply_dom_plugins(html: str, sources: list[str],
                      params: dict | None = None,
                      max_ops: int = 500_000) -> str:
    """Apply a sequence of vdi_plugin scripts to a page, returning the
    final HTML (plugin errors propagate — the caller decides whether a
    failed plugin drops the page or keeps the pristine HTML)."""
    for src in sources:
        _, html = run_dom_plugin(src, html, params, max_ops=max_ops)
    return html
