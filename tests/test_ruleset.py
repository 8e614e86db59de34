import datetime as dt

import pytest

from thecrowler_ray.htmldom import css_select, parse_dom, select, xpath_select
from thecrowler_ray.ruleset import (
    apply_rule,
    load_rulesets,
    rule_applies,
    scrape_page,
)

HTML = """<html><body>
<div id="main" class="content box">
  <h1 class="article-title"> The Title </h1>
  <div class="article-content"><p>First para</p><p>Second para</p></div>
  <span class="date">2024-05-01 extra</span>
  <a href="/next" id="n1">Next page</a>
  <a href="/other">Other link</a>
  <input name="q" value="searchbox">
  <div class="ads">BUY NOW</div>
</div>
</body></html>"""

RULESET_YAML = """
ruleset_name: "Test"
format_version: "1.0"
rule_groups:
  - group_name: "G1"
    valid_from: "2020-01-01T00:00:00Z"
    valid_to: "2099-12-31T00:00:00Z"
    is_enabled: true
    scraping_rules:
      - rule_name: "Articles"
        pre_conditions:
          - path: "/articles"
        elements:
          - key: "title"
            selectors:
              - selector_type: "css"
                selector: "h2.missing"
              - selector_type: "xpath"
                selector: "//h1[@class='article-title']"
          - key: "content"
            selectors:
              - selector_type: "css"
                selector: "div.article-content p"
                extract_all_occurrences: true
          - key: "date"
            selectors:
              - selector_type: "css"
                selector: "span.date"
                pattern: "\\\\d{4}-\\\\d{2}-\\\\d{2}"
          - key: "next_href"
            selectors:
              - selector_type: "link_text"
                selector: "Next page"
                attribute: "href"
  - group_name: "Expired"
    valid_from: "2000-01-01T00:00:00Z"
    valid_to: "2001-01-01T00:00:00Z"
    is_enabled: true
    scraping_rules:
      - rule_name: "Old"
        elements:
          - key: "title"
            selectors:
              - selector_type: "css"
                selector: "div.ads"
"""


def test_dom_and_css():
    root = parse_dom(HTML)
    assert [e.tag for e in css_select(root, "h1")] == ["h1"]
    assert css_select(root, "#main")[0].get("class") == "content box"
    assert len(css_select(root, "div.article-content p")) == 2
    assert css_select(root, ".content.box")[0].tag == "div"
    assert css_select(root, "a[href=/next]")[0].get("id") == "n1"
    assert len(css_select(root, "h1, span.date")) == 2
    assert css_select(root, "div.article-content > p")[0].text() == "First para"


def test_xpath_subset():
    root = parse_dom(HTML)
    assert xpath_select(root, "//h1[@class='article-title']")[0].text().strip() == "The Title"
    assert len(xpath_select(root, "//a")) == 2
    assert xpath_select(root, "//a[2]")[0].get("href") == "/other"
    assert xpath_select(root, "//div[@id='main']/h1")[0].tag == "h1"


def test_selector_dispatch():
    root = parse_dom(HTML)
    assert select(root, "id", "main")[0].tag == "div"
    assert select(root, "name", "q")[0].get("value") == "searchbox"
    assert select(root, "link_text", "Next page")[0].get("href") == "/next"
    assert select(root, "partial_link_text", "Other")[0].get("href") == "/other"
    assert select(root, "regex", r"BUY \w+", HTML) == ["BUY NOW"]


def test_ruleset_execution():
    rulesets = load_rulesets(RULESET_YAML)
    assert len(rulesets) == 1
    now = dt.datetime(2024, 6, 1, tzinfo=dt.timezone.utc)
    data = scrape_page(rulesets, HTML, "http://x.test/articles/1", now)
    assert data["title"] == "The Title"          # xpath fallback after css miss
    assert data["content"] == ["First para", "Second para"]
    assert data["date"] == "2024-05-01"          # regex pattern filter
    assert data["next_href"] == "/next"          # attribute extraction
    # expired group contributes nothing
    assert data["title"] != "BUY NOW"
    # pre-condition: wrong path ⇒ no match
    assert scrape_page(rulesets, HTML, "http://x.test/news/1", now) == {}


def test_rule_applies_conditions():
    rs = load_rulesets(RULESET_YAML)[0]
    rule = rs.rule_groups[0].scraping_rules[0]
    assert rule_applies(rule, "http://a.test/articles/x")
    assert not rule_applies(rule, "http://a.test/other")


def test_post_processing():
    y = """
ruleset_name: "PP"
rule_groups:
  - group_name: "G"
    is_enabled: true
    scraping_rules:
      - rule_name: "R"
        elements:
          - key: "raw"
            selectors:
              - selector_type: "css"
                selector: "div.article-content"
        post_processing:
          - step_type: "remove"
            key: "raw"
            pattern: "Second.*"
          - step_type: "clean"
            key: "raw"
"""
    rs = load_rulesets(y)
    data = scrape_page(rs, HTML, "http://x.test/")
    assert data["raw"] == "First para"


def test_plugin_selector_raises():
    y = """
ruleset_name: "P"
rule_groups:
  - group_name: "G"
    is_enabled: true
    scraping_rules:
      - rule_name: "R"
        elements:
          - key: "x"
            selectors:
              - selector_type: "plugin_call"
                selector: "MyPlugin"
"""
    rs = load_rulesets(y)
    with pytest.raises(NotImplementedError):
        apply_rule(rs[0].rule_groups[0].scraping_rules[0], HTML)


def test_plugin_registry_selectors():
    """plugin_call/agent_call selectors resolve through a PluginRegistry by
    name (reference extractExternal contract): values flow into extracted
    data, empty results fall through to the next selector, missing plugins
    raise."""
    from thecrowler_ray.plugins import (
        PluginNotFoundError,
        PluginRegistry,
        UnavailableCapabilityError,
        normalize_external_value,
    )
    from thecrowler_ray.ruleset import load_rulesets, scrape_page

    assert normalize_external_value(None) == []
    assert normalize_external_value("x") == ["x"]
    assert normalize_external_value([1, 2]) == [1, 2]

    yaml_doc = """
ruleset_name: "plugged"
rule_groups:
  - group_name: "g"
    is_enabled: true
    scraping_rules:
      - rule_name: "r"
        elements:
          - key: "price"
            selectors:
              - selector_type: "plugin_call"
                selector: "price_extractor"
              - selector_type: "css"
                selector: ".price"
          - key: "summary"
            selectors:
              - selector_type: "agent_call"
                selector: "summarizer"
"""
    rulesets = load_rulesets(yaml_doc)
    html = '<html><body><span class="price">9.99</span>hello world</body></html>'

    reg = PluginRegistry()
    reg.register_plugin("price_extractor", lambda ctx: "42.00")
    reg.register_agent("summarizer",
                       lambda ctx: ctx["html"][:20] and "a short summary")
    got = scrape_page(rulesets, html, "http://x.test/", plugins=reg)
    assert got == {"price": "42.00", "summary": "a short summary"}

    # plugin returns nothing → CSS fallback wins
    reg2 = PluginRegistry()
    reg2.register_plugin("price_extractor", lambda ctx: None)
    reg2.register_agent("summarizer", lambda ctx: "s")
    got2 = scrape_page(rulesets, html, "http://x.test/", plugins=reg2)
    assert got2["price"] == "9.99"

    # missing plugin raises; no registry raises UnavailableCapabilityError
    reg3 = PluginRegistry()
    reg3.register_agent("summarizer", lambda ctx: "s")
    with pytest.raises(PluginNotFoundError):
        scrape_page(rulesets, html, "http://x.test/", plugins=reg3)
    with pytest.raises(UnavailableCapabilityError):
        scrape_page(rulesets, html, "http://x.test/")


@pytest.mark.usefixtures("ray_session")
def test_scrape_stage_with_plugin_factory():
    import pyarrow as pa
    import ray.data

    from thecrowler_ray.plugins import PluginRegistry
    from thecrowler_ray.ruleset import ScrapeStage

    yaml_doc = """
ruleset_name: "plugged"
rule_groups:
  - group_name: "g"
    is_enabled: true
    scraping_rules:
      - rule_name: "r"
        elements:
          - key: "host"
            selectors:
              - selector_type: "plugin_call"
                selector: "host_of"
"""

    def factory():
        reg = PluginRegistry()
        reg.register_plugin(
            "host_of", lambda ctx: ctx["url"].split("//")[1].split("/")[0]
        )
        return reg

    ds = ray.data.from_arrow(pa.table({
        "url": ["http://a.test/p", "http://b.test/q"],
        "html": ["<p>x</p>", "<p>y</p>"],
    }))
    out = ds.map_batches(
        ScrapeStage,
        fn_constructor_args=(yaml_doc,),
        fn_constructor_kwargs={"plugin_factory": factory},
        batch_format="pyarrow",
        concurrency=1,
    ).to_pandas()
    import json

    hosts = sorted(json.loads(s)["host"] for s in out.scraped_data)
    assert hosts == ["a.test", "b.test"]


def test_js_path_selector_browserless_fallback():
    """js_path resolves via the reference's browserless normalization
    (extractor.go:271-299): bare first segment becomes an id selector."""
    from thecrowler_ray.ruleset import (
        ScrapingRule,
        Selector,
        apply_rule,
        normalize_js_path,
    )

    assert normalize_js_path("main > p") == "#main > p"
    assert normalize_js_path("#main > p") == "#main > p"
    assert normalize_js_path(".cls > p") == ".cls > p"
    assert normalize_js_path("div.x > p") == "div.x > p"  # complex first seg
    assert normalize_js_path("p") == "p"  # no '>'

    html = """<html><body>
      <div id="main"><p>target text</p></div>
      <div id="other"><p>decoy</p></div>
    </body></html>"""
    rule = ScrapingRule(
        rule_name="r",
        elements=[{"key": "val",
                   "selectors": [Selector("js_path", "main > p")]}],
    )
    got = apply_rule(rule, html)
    assert got == {"val": "target text"}


@pytest.mark.usefixtures("ray_session")
def test_scrape_stage_vdi_plugins_preprocess_dom():
    """vdi_plugin scripts run against the page DOM before rule
    extraction (reference plugins.go:751-795 execute in the browser page
    ahead of scraping), so a selector that would match boilerplate only
    matches the cleaned page."""
    import pyarrow as pa
    import ray.data

    from thecrowler_ray.ruleset import ScrapeStage

    yaml_doc = """
ruleset_name: "clean"
rule_groups:
  - group_name: "g"
    is_enabled: true
    scraping_rules:
      - rule_name: "r"
        elements:
          - key: "first_para"
            selectors:
              - selector_type: "css"
                selector: "p"
"""
    html = ('<div class="ad"><p>BUY NOW</p></div>'
            '<article><p>real text</p></article>')
    ds = ray.data.from_arrow(pa.table({
        "url": ["http://a.test/"], "html": [html]}))
    plain = ds.map_batches(
        ScrapeStage, fn_constructor_args=(yaml_doc,),
        batch_format="pyarrow", concurrency=1).to_pandas()
    cleaned = ds.map_batches(
        ScrapeStage, fn_constructor_args=(yaml_doc,),
        fn_constructor_kwargs={
            "vdi_plugins": ["document.querySelector('div.ad').remove();"]},
        batch_format="pyarrow", concurrency=1).to_pandas()
    import json as _json

    assert _json.loads(plain.scraped_data[0])["first_para"] == "BUY NOW"
    assert _json.loads(cleaned.scraped_data[0])["first_para"] == "real text"
    # bad plugin source fails at actor construction, not per batch
    with pytest.raises(Exception):
        ScrapeStage(yaml_doc, vdi_plugins=["function ("])
