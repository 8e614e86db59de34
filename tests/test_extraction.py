from thecrowler_ray.content_type import (
    doc_type_is_html,
    infer_document_type,
    media_kind,
    sniff_html,
)
from thecrowler_ray.htmlx import extract_page_info, page_spans
from thecrowler_ray.jsonpath import extract, parse_path, register_command
from thecrowler_ray.keywords import (
    canonicalize_keyword_db,
    extract_keywords,
    is_keyword,
    normalize_keyword,
    unique,
)
from thecrowler_ray.textnorm import apply_normalizers, fix_utf8, normalize_text
from thecrowler_ray.transforms import (
    transform_clean,
    transform_remove,
    transform_replace,
    transform_validate,
)

HTML = """<!DOCTYPE html>
<html lang="en"><head>
<title> My Title </title>
<meta name="description" content="A test page about crawling">
<meta name="keywords" content="crawler, spider; engine">
<meta property="og:description" content="OG description">
</head><body>
<script>var x = "scriptnoise";</script>
<h1>Big Heading</h1>
<p>The crawler\tvisits   many pages and extracts the keywords</p>
<a id="l0" href="http://other.test/page/">First</a>
<a href="/relative">Rel</a>
<a href="javascript:void(0)">Bad</a>
<img src="http://img.test/a.png">
</body></html>"""


def test_extract_page_info_basics():
    info = extract_page_info("http://me.test/x", HTML)
    assert info["title"] == "My Title"
    assert info["summary"] == "A test page about crawling"
    assert "scriptnoise" not in info["body_text"]
    assert "crawler visits many pages" in info["body_text"]
    assert info["lang"] == "en"
    names = [m["name"] for m in info["meta_tags"]]
    assert names == ["description", "keywords"]
    hrefs = [ln["href"] for ln in info["links"]]
    # trailing slash stripped, relative kept, javascript dropped
    assert hrefs == ["http://other.test/page", "/relative"]
    assert info["links"][0]["element_id"] == "l0"
    assert info["media"] == [{"tag": "img", "src": "http://img.test/a.png"}]


def test_title_fallback_chain():
    no_title = "<html><body><h1> H1 here </h1><h2>H2</h2>x</body></html>"
    assert extract_page_info("http://u.test", no_title)["title"] == "H1 here"
    h2_only = "<html><body><h2>H2 only</h2>x</body></html>"
    assert extract_page_info("http://u.test", h2_only)["title"] == "H2 only"
    nothing = "<html><body></body></html>"
    assert extract_page_info("http://u.test", nothing)["title"] == "http://u.test"
    # summary-based title
    desc = '<html><head><meta name="description" content="D"></head><body></body></html>'
    assert extract_page_info("http://u.test", desc)["title"] == "D"


def test_summary_fallback_chain():
    og = '<html><head><meta property="og:description" content="OG sum"></head><body>b</body></html>'
    assert extract_page_info("http://u.test", og)["summary"] == "OG sum"
    tw = '<html><head><meta name="twitter:description" content="TW"></head><body>b</body></html>'
    info = extract_page_info("http://u.test", tw)
    assert info["summary"] == "TW"
    body = "<html><body>" + "word " * 60 + "</body></html>"
    s = extract_page_info("http://u.test", body)["summary"]
    assert len(s) == 200


def test_page_spans_order_and_offsets():
    info = extract_page_info("http://me.test/x", HTML)
    spans = page_spans(info)
    kinds = [s["kind"] for s in spans]
    # title, summary, body_text first, then meta*, keyword*, link*, media*
    assert kinds[:3] == ["title", "summary", "body_text"]
    assert kinds == sorted(
        kinds,
        key=lambda k: ["title", "summary", "body_text", "meta", "keyword", "link", "media"].index(k),
    )
    assert [s["offset"] for s in spans] == list(range(len(spans)))
    media = [s for s in spans if s["kind"] == "media"]
    assert media[0]["media_ref"] == "http://img.test/a.png"
    link_spans = [s for s in spans if s["kind"] == "link"]
    assert link_spans[0]["media_ref"] == "http://other.test/page"
    kw = [s["text"] for s in spans if s["kind"] == "keyword"]
    assert "crawler" in kw and "the" not in kw


def test_keywords_semantics():
    assert normalize_keyword("  Hello!,  ") == "hello"
    assert not is_keyword("ab", "en")
    assert not is_keyword("the", "en")
    assert is_keyword("crawler", "en")
    assert not is_keyword("...", "en")
    assert is_keyword("randomword", "xx")  # unsupported lang keeps everything
    assert unique(["A", "a", "", "b", "B"]) == ["a", "b"]
    kws = extract_keywords(
        "The Crawler visits MANY pages", [{"name": "keywords", "content": "spider, Crawler"}]
    )
    assert kws[0] == "crawler"  # body first, deduped
    assert "spider" in kws
    assert "the" not in kws
    # #/@ prefixed always kept
    kws2 = extract_keywords("check #RayData and @dev now")
    assert "#raydata" in kws2 and "@dev" in kws2
    assert canonicalize_keyword_db("  ÉCafé  ") == canonicalize_keyword_db("  écafé ")


def test_textnorm():
    assert normalize_text("Hello, <b>World</b>!  BIG-test") == "hello world big test"
    assert fix_utf8("a\x00b\x01c") == "abc"
    assert apply_normalizers("  A  B  ", ["trim", "collapse_spaces", "lowercase"]) == "a b"
    assert apply_normalizers("1700000000", ["unix_to_datetime"]).startswith("2023-11-14")


def test_content_type():
    assert infer_document_type("http://x.test/a.PDF") == "application/pdf"
    assert infer_document_type("http://x.test/a.png") == "image/png"
    assert infer_document_type("http://x.test/page", "<html><body>x</body></html>") == "text/html"
    assert infer_document_type("http://x.test/noext") == "UNKNOWN"
    assert sniff_html("<!DOCTYPE html><html>")
    assert not sniff_html("just plain text")
    assert doc_type_is_html("text/html") and doc_type_is_html("")
    assert media_kind("image/png") == "image"
    assert media_kind("application/pdf") == "binary"


def test_jsonpath():
    obj = {"a": {"b": [{"c": 1}, {"c": 2}]}, "d": 3}
    assert parse_path("a.b[0].c") == ["a", "b", 0, "c"]
    assert extract(obj, "a.b[0].c") == [1]
    assert extract(obj, "a.b[*].c") == [1, 2]
    assert extract(obj, "a.missing.c") == []
    assert extract(obj, "d") == [3]
    register_command("double", lambda v: v * 2)
    assert extract(obj, "@double.d") == [6]


def test_transforms():
    assert transform_replace("abc123", r"\d+", "#") == "abc#"
    assert transform_remove("abc123", r"\d") == "abc"
    assert transform_clean("<b>A&amp;B</b>\n 12 ", ["decode_html_entities", "remove_html", "remove_numbers", "remove_extra_whitespace"]) == "A&B"
    assert transform_validate('{"a": 1}', ["a"])
    assert not transform_validate('{"a": 1}', ["b"])
    assert not transform_validate("not json")


def test_content_type_yaml_rules():
    from thecrowler_ray.content_type import content_type_rules_from_yaml, detect_by_rules

    rules = content_type_rules_from_yaml("""
application/rss+xml:
  content_patterns: ["<rss", "<feed"]
  url_patterns: ["\\\\.rss$", "/feed/?$"]
application/json:
  content_patterns: ["^\\\\s*[\\\\[{]"]
  url_patterns: ["\\\\.json$"]
""")
    assert detect_by_rules("http://x.test/a", "<rss version='2.0'>", rules) == "application/rss+xml"
    assert detect_by_rules("http://x.test/feed", "", rules) == "application/rss+xml"
    assert detect_by_rules("http://x.test/d.json", "", rules) == "application/json"
    assert detect_by_rules("http://x.test/a", '  {"k": 1}', rules) == "application/json"
    # fallback to the extension map
    assert detect_by_rules("http://x.test/p.pdf", "", rules) == "application/pdf"


def test_collect_page_requests_subresources():
    """M21 data-effects model: the deterministic half of the CDP network
    log is the page's declared subresources, in DOM order, capped like the
    reference's chatty-site guard (web.go:2064)."""
    from thecrowler_ray.stages.netlog import collect_page_requests

    html = (
        '<html><body><img src="/a.png"><script src="http://cdn.test/x.js">'
        '</script><link rel="stylesheet" href="/s.css">'
        '<link rel="canonical" href="/self"><video src="/v.mp4"></video>'
        '<iframe src="/f.html"></iframe><img></body></html>'
    )
    reqs = collect_page_requests("http://h.test/p", html)
    assert [r["request_url"] for r in reqs] == [
        "http://h.test/a.png", "http://cdn.test/x.js", "http://h.test/s.css",
        "http://h.test/v.mp4", "http://h.test/f.html",
    ]
    assert {r["method"] for r in reqs} == {"GET"}
    assert [r["resource_type"] for r in reqs] == [
        "image", "script", "stylesheet", "media", "document"
    ]
    # cap
    many = "".join(f'<img src="/i{i}.png">' for i in range(1500))
    assert len(collect_page_requests("http://h.test/", many, cap=1000)) == 1000
