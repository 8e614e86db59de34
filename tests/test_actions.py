"""Action-rule executor semantics (reference executor.go, hermetically).

Mirrors the reference's fake-WebDriver test pattern (doc/test_policy.md):
assert the data effects of rule execution against handcrafted DOMs.
"""

import pytest

from thecrowler_ray.actions import (
    ActionRule,
    execute_action_rules,
    parse_action_rules,
    standard_action_rules,
)

PAGE = """
<html lang="en"><body>
  <a id="a1" href="http://x.test/next">next</a>
  <button id="b1" class="loadmore" data-href="/more">more</button>
  <form id="f1" action="/search">
    <input type="text" name="q" value="seed">
    <input type="hidden" name="s" value="1">
    <button id="go" type="submit" class="searchgo">go</button>
  </form>
</body></html>
"""
URL = "http://x.test/page"


def _run(rules, html=PAGE, url=URL):
    return execute_action_rules(url, html, rules)


def test_click_href_and_data_href():
    out = _run(parse_action_rules([
        {"rule_name": "r1", "action_type": "click",
         "selectors": [{"selector_type": "id", "selector": "a1"}]},
        {"rule_name": "r2", "action_type": "click",
         "selectors": [{"selector_type": "css", "selector": ".loadmore"}]},
    ]))
    assert out["discovered"] == ["http://x.test/next", "http://x.test/more"]
    assert [e["status"] for e in out["log"]] == ["navigated", "navigated"]


def test_click_missing_element_is_noop():
    """executor.go click: errNoElementFound is logged, not raised."""
    out = _run(parse_action_rules([
        {"rule_name": "r", "action_type": "click",
         "selectors": [{"selector_type": "css", "selector": ".nope"}]},
    ]))
    assert out["discovered"] == []
    assert out["log"][0]["status"] == "no_element"


def test_input_text_then_submit_serializes_form():
    out = _run(parse_action_rules([
        {"rule_name": "t", "action_type": "input_text", "value": "crawler",
         "selectors": [{"selector_type": "name", "selector": "q"}]},
        {"rule_name": "s", "action_type": "click",
         "selectors": [{"selector_type": "css", "selector": ".searchgo"}]},
    ]))
    assert out["discovered"] == ["http://x.test/search?q=crawler&s=1"]


def test_clear_resets_value():
    out = _run(parse_action_rules([
        {"rule_name": "c", "action_type": "clear",
         "selectors": [{"selector_type": "name", "selector": "q"}]},
        {"rule_name": "s", "action_type": "click",
         "selectors": [{"selector_type": "id", "selector": "go"}]},
    ]))
    assert out["discovered"] == ["http://x.test/search?q=&s=1"]


def test_conditions_gate_language_and_element():
    """executor.go ConditionsMatch: unmet conditions skip without error."""
    out = _run(parse_action_rules([
        {"rule_name": "de_only", "action_type": "click",
         "conditions": {"language": "de"},
         "selectors": [{"selector_type": "id", "selector": "a1"}]},
        {"rule_name": "needs_el", "action_type": "click",
         "conditions": {"element": ".missing"},
         "selectors": [{"selector_type": "id", "selector": "a1"}]},
        {"rule_name": "en_ok", "action_type": "click",
         "conditions": {"language": "en", "element": ".loadmore"},
         "selectors": [{"selector_type": "id", "selector": "a1"}]},
    ]))
    assert out["discovered"] == ["http://x.test/next"]
    assert [e["status"] for e in out["log"]] == [
        "condition_skip", "condition_skip", "navigated"
    ]


def test_wait_condition_element_fails_rule():
    out = _run(parse_action_rules([
        {"rule_name": "w", "action_type": "click",
         "wait_conditions": [{"condition_type": "element",
                              "selector": ".missing"}],
         "selectors": [{"selector_type": "id", "selector": "a1"}]},
        {"rule_name": "d", "action_type": "click",
         "wait_conditions": [{"condition_type": "delay", "value": "2"}],
         "selectors": [{"selector_type": "id", "selector": "a1"}]},
    ]))
    assert out["discovered"] == ["http://x.test/next"]
    assert out["log"][0]["status"] == "wait_failed"


def test_url_pattern_gates_rule():
    rule = ActionRule(rule_name="u", action_type="navigate_to_url",
                      value="http://y.test/", url_pattern=r"/admin/")
    assert _run([rule])["discovered"] == []
    out = execute_action_rules("http://x.test/admin/panel", PAGE, [rule])
    assert out["discovered"] == ["http://y.test/"]


def test_navigate_and_log_only_actions():
    out = _run(parse_action_rules([
        {"rule_name": "n", "action_type": "navigate_to_url",
         "value": "/rel"},
        {"rule_name": "sc", "action_type": "scroll"},
        {"rule_name": "ss", "action_type": "take_screenshot"},
        {"rule_name": "bad", "action_type": "teleport"},
    ]))
    assert out["discovered"] == ["http://x.test/rel"]
    assert [e["status"] for e in out["log"]] == [
        "navigated", "ok", "ok", "unsupported"
    ]


def test_selector_list_first_match_wins():
    out = _run(parse_action_rules([
        {"rule_name": "f", "action_type": "click",
         "selectors": [
             {"selector_type": "css", "selector": ".missing"},
             {"selector_type": "id", "selector": "b1"},
             {"selector_type": "id", "selector": "a1"},
         ]},
    ]))
    assert out["discovered"] == ["http://x.test/more"]


def test_standard_rules_match_synthweb_ground_truth():
    from thecrowler_ray.sources.synthweb import (
        CorpusConfig,
        action_links,
        page_html,
        page_url,
    )

    cfg = CorpusConfig(seed=11, n_hosts=4, base_pages=20, action_frac=0.5)
    rules = standard_action_rules()
    n_gated = 0
    for h in range(cfg.n_hosts):
        for p in range(cfg.host_pages(h)):
            got = execute_action_rules(
                page_url(cfg, h, p), page_html(cfg, h, p), rules
            )["discovered"]
            want = action_links(cfg, h, p)
            assert got == want, (h, p, got, want)
            n_gated += bool(want)
    assert n_gated > 5


def test_action_frac_zero_keeps_corpus_identical():
    from thecrowler_ray.sources.synthweb import CorpusConfig, page_html

    a = CorpusConfig(seed=42, n_hosts=3, base_pages=10)
    b = CorpusConfig(seed=42, n_hosts=3, base_pages=10, action_frac=0.0)
    for h in range(3):
        for p in range(a.host_pages(h)):
            assert page_html(a, h, p) == page_html(b, h, p)
            assert "loadmore" not in page_html(a, h, p)
