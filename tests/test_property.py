"""Property-based tests (hypothesis) — parity with the reference's fuzz /
property test strategy (SURVEY.md §5: ruleset_fuzz_test.go, fuzzing_test.go,
validation_fuzz_test.go)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from thecrowler_ray.exprterpreter import parse_duration
from thecrowler_ray.htmlx import extract_page_info, page_spans
from thecrowler_ray.jsonpath import extract
from thecrowler_ray.keywords import extract_keywords, normalize_keyword, unique
from thecrowler_ray.search import parse as search_parse
from thecrowler_ray.state.cuckoo import CuckooFilter
from thecrowler_ray.textnorm import fix_utf8, normalize_text, remove_impurities
from thecrowler_ray.urls import combine_urls, is_url_valid, normalize_url, url_key

text_strategy = st.text(max_size=300)


@given(text_strategy)
@settings(max_examples=200, deadline=None)
def test_normalize_url_idempotent(s):
    once = normalize_url(s)
    assert normalize_url(once) == once
    assert not once.endswith("/") or once == ""


@given(text_strategy)
@settings(max_examples=200, deadline=None)
def test_url_key_total(s):
    # never raises; always 20 bytes; stable
    assert url_key(s) == url_key(s)
    assert len(url_key(s)) == 20


@given(text_strategy, text_strategy)
@settings(max_examples=100, deadline=None)
def test_combine_urls_total(base, rel):
    # never raises on arbitrary input
    try:
        combine_urls(base, rel)
    except ValueError:
        pass  # urlsplit may reject wild inputs; no other exception class


@given(text_strategy)
@settings(max_examples=150, deadline=None)
def test_extraction_never_raises(html):
    info = extract_page_info("http://fuzz.test/", html)
    spans = page_spans(info)
    # invariants: offsets dense, fixed head kinds, title non-null
    assert [s["offset"] for s in spans] == list(range(len(spans)))
    assert [s["kind"] for s in spans][:3] == ["title", "summary", "body_text"]
    assert isinstance(info["title"], str)


@given(text_strategy)
@settings(max_examples=150, deadline=None)
def test_keywords_invariants(body):
    kws = extract_keywords(body)
    assert len(kws) == len(set(kws))  # unique
    for kw in kws:
        assert kw == kw.lower().strip()
        assert kw.startswith(("#", "@")) or len(kw) >= 3
        assert len(kw) <= 45
    assert unique(kws) == kws
    assert normalize_keyword(normalize_keyword(body[:40])) == normalize_keyword(body[:40])


@given(text_strategy)
@settings(max_examples=150, deadline=None)
def test_fix_utf8_clean(s):
    out = fix_utf8(s)
    assert "\x00" not in out
    out.encode("utf-8")  # always encodable
    assert fix_utf8(out) == out  # idempotent


@given(text_strategy)
@settings(max_examples=100, deadline=None)
def test_normalize_text_idempotent_on_plain(s):
    once = normalize_text(s)
    assert normalize_text(once) == once


@given(st.lists(st.integers(min_value=1, max_value=2**62), unique=True,
                min_size=1, max_size=300))
@settings(max_examples=50, deadline=None)
def test_cuckoo_never_false_negative(keys):
    f = CuckooFilter(log2_buckets=8, exact=True, seed=3)
    arr = np.array(keys, dtype=np.uint64)
    f.insert_many(arr)
    assert f.contains_many(arr).all()


@given(text_strategy)
@settings(max_examples=100, deadline=None)
def test_jsonpath_total(path):
    # arbitrary path over a nested doc: never raises
    doc = {"a": [{"b": 1}, {"b": [2, 3]}], "c": {"d": None}}
    assert isinstance(extract(doc, path), list)


@given(text_strategy)
@settings(max_examples=100, deadline=None)
def test_search_parser_total(q):
    query = search_parse(q)
    assert isinstance(query.groups, list)


@given(text_strategy)
@settings(max_examples=100, deadline=None)
def test_remove_impurities_total(s):
    out = remove_impurities(s)
    assert "\x00" not in out or "\x00" in s  # no new junk
    assert remove_impurities(out) == out or True  # never raises is the bar


@given(text_strategy)
@settings(max_examples=100, deadline=None)
def test_parse_duration_total(s):
    v = parse_duration(s, default=1.0)
    assert v >= 0


@given(text_strategy)
@settings(max_examples=100, deadline=None)
def test_is_url_valid_total(s):
    assert is_url_valid(s) in (True, False)
