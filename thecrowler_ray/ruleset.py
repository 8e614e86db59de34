"""Ruleset loading + scraping-rule execution.

Reimplements (semantics only) the reference's ruleset surface:

- YAML ruleset documents: ruleset → rule_groups (validity window +
  is_enabled) → scraping_rules (pre_conditions on url/path, elements with
  ordered selector fallback chains, extract_all_occurrences, attribute
  extraction + regex pattern) → post_processing steps
  (``pkg/ruleset/types.go:75-529``, ``pkg/ruleset/rulesengine.go``,
  ``schemas/crowler-ruleset-schema.json``, example
  ``pkg/ruleset/test-ruleset.yaml``)
- rule execution over a page (``pkg/crawler/scraping_rules.go:40-330``,
  ``pkg/scraper/extractor.go:64-461``): for each element key, selectors are
  tried in order, first hit wins (or every hit when
  ``extract_all_occurrences``); value = element text or the named
  attribute, optionally filtered by a regex ``pattern``
- post-processing transforms (``pkg/scraper/transforms.go:21-94``) via
  :mod:`thecrowler_ray.transforms`
- plugin/agent selector types are out of scope (reference runs them in an
  embedded JS VM) — they raise ``NotImplementedError`` if used

``ScrapeStage`` wraps a loaded ruleset as a Ray actor-pool ``map_batches``
stage (rules compiled once per actor, reference ST4 rules-engine cache).
"""

from __future__ import annotations

import datetime as _dt
import json
import re
from dataclasses import dataclass, field
from urllib.parse import urlparse

import yaml

from .htmldom import parse_dom, select
from .transforms import (
    transform_clean,
    transform_remove,
    transform_replace,
    transform_validate,
)


@dataclass
class Selector:
    selector_type: str
    selector: str
    attribute: str = ""
    pattern: str = ""
    extract_all: bool = False


@dataclass
class ScrapingRule:
    rule_name: str
    pre_conditions: list[dict] = field(default_factory=list)
    elements: list[dict] = field(default_factory=list)  # {key, selectors:[Selector]}
    post_processing: list[dict] = field(default_factory=list)


@dataclass
class RuleGroup:
    group_name: str
    is_enabled: bool = True
    valid_from: _dt.datetime | None = None
    valid_to: _dt.datetime | None = None
    scraping_rules: list[ScrapingRule] = field(default_factory=list)

    def is_valid(self, now: _dt.datetime | None = None) -> bool:
        if not self.is_enabled:
            return False
        now = now or _dt.datetime.now(_dt.timezone.utc)
        if self.valid_from and now < self.valid_from:
            return False
        if self.valid_to and now > self.valid_to:
            return False
        return True


@dataclass
class Ruleset:
    name: str
    format_version: str = "1.0"
    rule_groups: list[RuleGroup] = field(default_factory=list)


def _parse_time(v) -> _dt.datetime | None:
    if not v:
        return None
    if isinstance(v, _dt.datetime):
        return v if v.tzinfo else v.replace(tzinfo=_dt.timezone.utc)
    s = str(v).replace("Z", "+00:00")
    try:
        t = _dt.datetime.fromisoformat(s)
        return t if t.tzinfo else t.replace(tzinfo=_dt.timezone.utc)
    except ValueError:
        return None


def parse_ruleset(doc: dict) -> Ruleset:
    groups = []
    for g in doc.get("rule_groups", []):
        rules = []
        for r in g.get("scraping_rules", []):
            elements = []
            for el in r.get("elements", []):
                sels = [
                    Selector(
                        selector_type=s.get("selector_type", "css"),
                        selector=s.get("selector", ""),
                        attribute=_attr_name(s.get("attribute", "")),
                        pattern=s.get("pattern", ""),
                        extract_all=bool(s.get("extract_all_occurrences", False)),
                    )
                    for s in el.get("selectors", [])
                ]
                elements.append({"key": el.get("key", ""), "selectors": sels})
            rules.append(
                ScrapingRule(
                    rule_name=r.get("rule_name", ""),
                    pre_conditions=r.get("pre_conditions", []) or [],
                    elements=elements,
                    post_processing=r.get("post_processing", []) or [],
                )
            )
        groups.append(
            RuleGroup(
                group_name=g.get("group_name", ""),
                is_enabled=bool(g.get("is_enabled", True)),
                valid_from=_parse_time(g.get("valid_from")),
                valid_to=_parse_time(g.get("valid_to")),
                scraping_rules=rules,
            )
        )
    return Ruleset(
        name=doc.get("ruleset_name", ""),
        format_version=str(doc.get("format_version", "1.0")),
        rule_groups=groups,
    )


def _attr_name(attr) -> str:
    # the schema allows either a string or {name, value}
    if isinstance(attr, dict):
        return attr.get("name", "")
    return attr or ""


def load_rulesets(source: str) -> list[Ruleset]:
    """Load one or many rulesets from a YAML/JSON string (the reference also
    loads from files/dirs/URLs with a cache — callers handle IO)."""
    docs = list(yaml.safe_load_all(source))
    out = []
    for doc in docs:
        if doc is None:
            continue
        if isinstance(doc, list):
            out.extend(parse_ruleset(d) for d in doc)
        elif "rulesets" in doc:
            out.extend(parse_ruleset(d) for d in doc["rulesets"])
        else:
            out.append(parse_ruleset(doc))
    return out


# ---------------------------------------------------------------------------
# execution
# ---------------------------------------------------------------------------


def rule_applies(rule: ScrapingRule, url: str) -> bool:
    """pre_conditions: any entry matches ⇒ applies; no entries ⇒ applies.
    Entry fields: ``url`` (exact) and/or ``path`` (prefix)."""
    if not rule.pre_conditions:
        return True
    parsed = urlparse(url)
    for cond in rule.pre_conditions:
        ok = True
        if cond.get("url"):
            ok = ok and url.rstrip("/") == str(cond["url"]).rstrip("/")
        if cond.get("path"):
            ok = ok and parsed.path.startswith(str(cond["path"]))
        if ok:
            return True
    return False


def _extract_value(el, selector: Selector, html: str) -> str:
    if isinstance(el, str):
        value = el
    elif selector.attribute:
        value = el.get(selector.attribute, "")
    else:
        value = el.text().strip()
    if selector.pattern:
        m = re.search(selector.pattern, value)
        value = m.group(0) if m else ""
    return value


def normalize_js_path(selector: str) -> str:
    """The reference's js_path → CSS normalization
    (``extractor.go:285-299``): a Chrome "Copy JS path" selector whose
    first segment is a bare token becomes an id selector (``"main > p"``
    → ``"#main > p"``); selectors already starting with #/./[ or with a
    complex first segment pass through unchanged."""
    selector = selector.strip()
    if not selector or selector[0] in "#.[":
        return selector
    first, sep, rest = selector.partition(">")
    if not sep:
        return selector
    first = first.strip()
    if not first or any(c in first for c in " .#:["):
        return selector
    return "#" + first + " >" + rest


def apply_rule(rule: ScrapingRule, html: str, url: str = "",
               plugins=None) -> dict:
    """Run one scraping rule over a page → {key: value | [values]}.
    Selector fallback: first selector (in order) that yields anything wins.
    ``plugin_call`` / ``agent_call`` selectors resolve through the
    ``plugins`` registry by name (reference extractExternal,
    ``pkg/scraper/rules.go:133-150``); without a registry they raise
    UnavailableCapabilityError like the reference runtime."""
    root = parse_dom(html)
    out: dict = {}
    for element in rule.elements:
        key = element["key"]
        for sel in element["selectors"]:
            if sel.selector_type == "js_path":
                # the reference's browserless fallback treats js_path as a
                # normalized CSS selector (extractor.go:271-273 →
                # normalizeJSPathSelector:285-299); mirror that here
                found = select(
                    root, "css", normalize_js_path(sel.selector), html
                )
                values = [
                    v
                    for v in (_extract_value(e, sel, html) for e in found)
                    if v != ""
                ]
                if values:
                    out[key] = values if sel.extract_all else values[0]
                    break
                continue
            if sel.selector_type in ("plugin_call", "agent_call"):
                from .plugins import UnavailableCapabilityError

                if plugins is None:
                    raise UnavailableCapabilityError(
                        f"selector type {sel.selector_type} requires the "
                        "plugin/agent runtime (register handlers in a "
                        "PluginRegistry)"
                    )
                ctx = {"url": url, "html": html,
                       "rule_name": rule.rule_name,
                       "selector": sel.selector, "data": dict(out)}
                if sel.selector_type == "plugin_call":
                    values = plugins.run_plugin(sel.selector, ctx)
                else:
                    values = plugins.run_agent(sel.selector, ctx)
                values = [v for v in values if v != ""]
                if values:
                    out[key] = values if sel.extract_all else values[0]
                    break
                continue
            found = select(root, sel.selector_type, sel.selector, html)
            values = [
                v
                for v in (_extract_value(e, sel, html) for e in found)
                if v != ""
            ]
            if values:
                out[key] = values if sel.extract_all else values[0]
                break
    for step in rule.post_processing:
        out = apply_post_processing(out, step)
    return out


def apply_post_processing(data: dict, step: dict) -> dict:
    """Post-processing over extracted values (reference transforms.go)."""
    st = str(step.get("step_type", step.get("type", ""))).lower()
    key = step.get("key")
    keys = [key] if key else list(data.keys())
    for k in keys:
        v = data.get(k)
        if not isinstance(v, str):
            continue
        if st == "replace":
            data[k] = transform_replace(
                v, step.get("pattern", ""), step.get("replacement", "")
            )
        elif st == "remove":
            data[k] = transform_remove(v, step.get("pattern", ""))
        elif st == "clean":
            data[k] = transform_clean(v, step.get("details", {}).get("steps", [
                "decode_html_entities", "remove_html", "remove_extra_whitespace",
            ]) if isinstance(step.get("details"), dict) else [
                "decode_html_entities", "remove_html", "remove_extra_whitespace",
            ])
        elif st == "validate":
            if not transform_validate(v, step.get("required_keys")):
                data[k] = ""
    return data


def scrape_page(rulesets: list[Ruleset], html: str, url: str,
                now: _dt.datetime | None = None, plugins=None) -> dict:
    """All applicable rules from valid+enabled groups, merged
    (later rules do not overwrite earlier keys — first-win like the
    reference's mergeMaps usage)."""
    merged: dict = {}
    for rs in rulesets:
        for group in rs.rule_groups:
            if not group.is_valid(now):
                continue
            for rule in group.scraping_rules:
                if not rule_applies(rule, url):
                    continue
                data = apply_rule(rule, html, url, plugins=plugins)
                for k, v in data.items():
                    merged.setdefault(k, v)
    return merged


class ScrapeStage:
    """Actor-pool map_batches stage: rulesets parsed once per actor
    (reference rules-engine cache, ST4)."""

    def __init__(self, ruleset_yaml: str, url_col: str = "url",
                 html_col: str = "html",
                 now: _dt.datetime | None = None,
                 plugin_factory=None,
                 vdi_plugins: list[str] | None = None):
        self.rulesets = load_rulesets(ruleset_yaml)
        self.url_col = url_col
        self.html_col = html_col
        self.now = now
        # plugin registry built once per actor (a factory pickles cleanly
        # where a registry holding closures might not)
        self.plugins = plugin_factory() if plugin_factory else None
        # vdi_plugin sources applied to the page DOM before rule
        # extraction (reference plugins.go:751-795 run in the browser page
        # ahead of scraping); parse errors surface at actor construction
        if vdi_plugins:
            from .minijs import _Parser, _tokenize

            for src in vdi_plugins:
                _Parser(_tokenize(src)).program()
        self.vdi_plugins = list(vdi_plugins or [])

    def __call__(self, batch):
        import pyarrow as pa

        urls = batch[self.url_col].to_pylist()
        htmls = batch[self.html_col].to_pylist()
        if self.vdi_plugins:
            from .domjs import apply_dom_plugins

            htmls = [
                apply_dom_plugins(h or "", self.vdi_plugins,
                                  {"url": u or ""})
                for u, h in zip(urls, htmls)
            ]
        scraped = [
            json.dumps(
                scrape_page(self.rulesets, h or "", u or "", self.now,
                            plugins=self.plugins),
                sort_keys=True,
            )
            for u, h in zip(urls, htmls)
        ]
        return batch.append_column("scraped_data", pa.array(scraped, pa.string()))
