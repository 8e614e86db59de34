"""Browser action rules modeled as data effects (SURVEY.md M17).

The reference executes action rules through a Selenium WebDriver
(``pkg/crawler/action_rules.go:38-118`` processActionRules →
``pkg/browser/actions/executor.go:37-140`` ExecuteRule). A data engine has no
browser, but the reference's own hermetic test pattern
(``doc/test_policy.md:63-79``, fake WebDriver) shows that the *observable
data effect* is what matters: which rules fire on which URL, which elements
they touch, and which navigations result — those navigations join the
frontier exactly like statically extracted links. This module re-implements
that contract over the repo's stdlib DOM (:mod:`thecrowler_ray.htmldom`):

- rule applicability by URL regex (``pkg/ruleset/ruleset.go:218``
  GetActionRuleByURL matches rule.URL against the page URL)
- ``wait_conditions``: ``element`` must resolve or the rule fails;
  ``delay`` is a data-plane no-op (``executor.go:143-169`` WaitForCondition)
- ``conditions``: ``{"element": css}`` and ``{"language": lang}`` gate
  execution — unmet conditions skip the rule without error
  (``executor.go:199-231`` ConditionsMatch)
- selectors resolve first-match-wins across the list
  (``executor.go:236-255`` findElement)
- actions (``executor.go:87-139``): ``click`` navigates via ``href`` /
  ``data-href`` or submits the enclosing form; ``input_text`` / ``clear``
  mutate form state; ``navigate_to_url`` contributes its value; scroll /
  hover / screenshot / key events are log-only in the data plane
- a ``click`` whose element is missing is a logged no-op, NOT an error
  (``executor.go`` click: errNoElementFound → returns nil)

Discovered URLs are returned in rule-execution order; the fetch stage
appends them to the page's link list so BFS ordering, dedup, politeness and
restriction filtering treat them exactly like static links.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from urllib.parse import quote_plus

from .htmldom import Element, parse_dom, select
from .urls import combine_urls

_NAV_ACTIONS = {"click", "lclick", "rclick"}
_LOG_ONLY = {
    "scroll", "scroll_to_element", "scroll_by_amount", "mouse_hover",
    "take_screenshot", "key_down", "key_up", "click_and_hold", "release",
    "forward", "back", "refresh", "switch_to_frame", "switch_to_window",
}


@dataclass
class ActionRule:
    rule_name: str
    action_type: str
    selectors: list[dict] = field(default_factory=list)
    value: str = ""
    url_pattern: str = ""          # regex over the page URL; "" = all pages
    conditions: dict = field(default_factory=dict)
    wait_conditions: list[dict] = field(default_factory=list)


def parse_action_rules(docs: list[dict]) -> list[ActionRule]:
    """Ruleset-YAML-shaped dicts → ActionRule list (reference types.go:231)."""
    out = []
    for d in docs or []:
        out.append(
            ActionRule(
                rule_name=str(d.get("rule_name", "")),
                action_type=str(d.get("action_type", "")).strip().lower(),
                selectors=list(d.get("selectors", []) or []),
                value=str(d.get("value", "") or ""),
                url_pattern=str(d.get("url", "") or ""),
                conditions=dict(d.get("conditions", {}) or {}),
                wait_conditions=list(d.get("wait_conditions", []) or []),
            )
        )
    return out


def _find_element(root: Element, html: str, selectors: list[dict]):
    """First selector that resolves wins (executor.go findElement)."""
    for sel in selectors:
        found = select(
            root,
            str(sel.get("selector_type", "css")),
            str(sel.get("selector", "")),
            html,
        )
        for f in found:
            if isinstance(f, Element):
                return f
    return None


def _enclosing_form(el: Element) -> Element | None:
    node = el
    while node is not None:
        if node.tag == "form":
            return node
        node = node.parent
    return None


def _resolve(page_url: str, link: str) -> str:
    return combine_urls(page_url, link) if link.startswith("/") else link


def _submit_form(page_url: str, form: Element) -> str:
    """GET-model form submission: action URL + urlencoded named inputs in
    DOM order (the navigation a real submit produces)."""
    action = _resolve(page_url, form.get("action") or page_url)
    pairs = []
    for el in form.iter():
        if el.tag == "input" and el.get("name"):
            pairs.append((el.get("name"), el.get("value", "")))
    if not pairs:
        return action
    query = "&".join(f"{quote_plus(k)}={quote_plus(v)}" for k, v in pairs)
    return f"{action}?{query}"


def _conditions_met(root: Element, lang: str, conditions: dict) -> bool:
    """executor.go ConditionsMatch: element presence + document language."""
    if not conditions:
        return True
    css = conditions.get("element")
    if isinstance(css, str) and not select(root, "css", css):
        return False
    want_lang = conditions.get("language")
    if want_lang is not None and lang != str(want_lang):
        return False
    return True


def execute_action_rules(url: str, html: str, rules: list[ActionRule]) -> dict:
    """Run the rule sequence against one page's DOM.

    → ``{"discovered": [url, ...], "log": [{rule, action, status}, ...]}``
    with discovered navigations in rule-execution order.
    """
    root = parse_dom(html)
    lang = ""
    for el in root.iter():
        if el.tag == "html":
            lang = el.get("lang", "")
            break
    discovered: list[str] = []
    log: list[dict] = []

    def note(rule: ActionRule, status: str) -> None:
        log.append(
            {"rule": rule.rule_name, "action": rule.action_type,
             "status": status}
        )

    for rule in rules:
        if rule.url_pattern and not re.search(rule.url_pattern, url):
            continue
        waited = True
        for wc in rule.wait_conditions:
            ctype = str(wc.get("condition_type", "")).strip().lower()
            if ctype == "element":
                sel = wc.get("selector") or {}
                if isinstance(sel, str):
                    sel = {"selector_type": "css", "selector": sel}
                if _find_element(root, html, [sel]) is None:
                    waited = False
                    break
            # "delay" / "plugin_call": timing / VM effects — data-plane no-op
        if not waited:
            note(rule, "wait_failed")
            continue
        if not _conditions_met(root, lang, rule.conditions):
            note(rule, "condition_skip")
            continue

        action = rule.action_type
        if action == "navigate_to_url":
            if rule.value:
                discovered.append(_resolve(url, rule.value))
                note(rule, "navigated")
            else:
                note(rule, "no_value")
        elif action in _NAV_ACTIONS:
            el = _find_element(root, html, rule.selectors)
            if el is None:
                note(rule, "no_element")  # click on nothing is a no-op
                continue
            href = el.get("href") or el.get("data-href")
            if href:
                discovered.append(_resolve(url, href))
                note(rule, "navigated")
                continue
            form = _enclosing_form(el)
            is_submitter = el.tag == "form" or (
                el.tag in ("button", "input")
                and el.get("type", "submit" if el.tag == "button" else "")
                == "submit"
            )
            if form is not None and is_submitter:
                discovered.append(_submit_form(url, form))
                note(rule, "submitted")
            elif el.tag == "form":
                discovered.append(_submit_form(url, el))
                note(rule, "submitted")
            else:
                note(rule, "clicked")
        elif action == "input_text":
            el = _find_element(root, html, rule.selectors)
            if el is None:
                note(rule, "no_element")
                continue
            el.attrs["value"] = rule.value
            note(rule, "typed")
        elif action == "clear":
            el = _find_element(root, html, rule.selectors)
            if el is None:
                note(rule, "no_element")
                continue
            el.attrs["value"] = ""
            note(rule, "cleared")
        elif action in _LOG_ONLY:
            note(rule, "ok")
        else:
            note(rule, "unsupported")  # executor.go default: error, logged

    return {"discovered": discovered, "log": log}


def standard_action_rules() -> list[ActionRule]:
    """The canonical test ruleset over the synthetic web's action-gated
    pages: click the load-more button, type a query, submit the search
    form. Discovers exactly ``synthweb.action_links`` per page."""
    return parse_action_rules(
        [
            {
                "rule_name": "load_more",
                "action_type": "click",
                "selectors": [{"selector_type": "css", "selector": ".loadmore"}],
            },
            {
                "rule_name": "type_query",
                "action_type": "input_text",
                "selectors": [{"selector_type": "name", "selector": "q"}],
                "value": "crawl",
                "conditions": {"language": "en"},
            },
            {
                "rule_name": "submit_search",
                "action_type": "click",
                "selectors": [{"selector_type": "css", "selector": ".searchgo"}],
            },
        ]
    )
