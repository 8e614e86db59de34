"""Information-seed candidate pipeline (pkg/infoseed): normalization,
built-in filters, the plugin-output contract, and the minijs processor
stage — pinned to the reference's own test vectors (candidates_test.go)."""

import pyarrow as pa
import pytest
import ray

from thecrowler_ray.infoseed import (
    CandidateFilters,
    CandidateProcessorStage,
    apply_builtin_filters,
    normalize_candidates,
    normalize_url,
    registrable_domain,
    validate_plugin_output,
)


def test_normalize_url_reference_vector():
    # candidates_test.go:19-30, verbatim expectations
    url, host, ok = normalize_url(
        "HTTPS://Example.COM:443/path?utm_source=x&b=2&a=1#frag",
        ["utm_source"],
    )
    assert ok and host == "example.com"
    assert url == "https://example.com/path?a=1&b=2"
    # unsupported schemes / empty
    assert normalize_url("mailto:a@b.c")[2] is False
    assert normalize_url("")[2] is False
    assert normalize_url("ftp://x.test/")[2] is False
    # default port stripping + path default
    assert normalize_url("http://A.Test:80")[0] == "http://a.test/"
    assert normalize_url("http://a.test:8080/x")[0] == "http://a.test:8080/x"
    # all params removed → no '?'
    assert normalize_url("https://a.test/p?utm_source=1",
                         ["utm_source"])[0] == "https://a.test/p"


def test_normalize_candidates_reference_vector():
    # candidates_test.go:32-46
    cands = [
        {"url": "https://example.com:443/a?utm_campaign=x"},
        {"url": "https://example.com/b"},
        {"url": "mailto:test@example.com"},
        {"url": "http://other.example:80/"},
    ]
    got, rejected = normalize_candidates(
        cands, tracking_params=["utm_campaign"], dedup_host=True
    )
    assert [c["url"] for c in got] == ["https://example.com/a",
                                      "http://other.example/"]
    assert rejected == {"invalid_url": 1, "duplicate_host": 1}


def test_builtin_filters_every_reason():
    cands = [
        {"url": "https://good.news.test/1", "host": "good.news.test",
         "score": 0.9},
        {"url": "https://good.news.test/2", "host": "good.news.test",
         "score": 0.9},  # per-host cap
        {"url": "https://evil.test/", "host": "evil.test", "score": 0.9},
        {"url": "http://good.news.test/3", "host": "good.news.test",
         "score": 0.9},  # scheme
        {"url": "https://low.news.test/", "host": "low.news.test",
         "score": 0.1},  # min score
        {"url": "https://other.org.test/", "host": "other.org.test",
         "score": 0.9},  # allowed-domain miss
    ]
    filters = CandidateFilters(
        allowed_domains=("news.test",),
        denied_domains=("evil.test",),
        required_schemes=("https",),
        min_score=0.5,
        max_candidates_per_host=1,
    )
    got, rejected = apply_builtin_filters(cands, filters)
    assert [c["url"] for c in got] == ["https://good.news.test/1"]
    # evil.test falls to the allow-list BEFORE the deny-list (the reference
    # checks allowed first, candidates.go:192-199)
    assert rejected == {
        "max_candidates_per_host": 1,
        "allowed_domain": 2,
        "required_scheme": 1,
        "minimum_score": 1,
    }
    # deny-list fires when no allow-list gates first
    _, rej_denied = apply_builtin_filters(
        [{"url": "https://evil.test/", "host": "evil.test", "score": 1}],
        CandidateFilters(denied_domains=("evil.test",)),
    )
    assert rej_denied == {"denied_domain": 1}
    # total cap is order-dependent
    many = [{"url": f"https://h{i}.test/", "host": f"h{i}.test", "score": 1}
            for i in range(5)]
    got2, rej2 = apply_builtin_filters(many,
                                       CandidateFilters(max_candidates=2))
    assert len(got2) == 2 and rej2 == {"candidate_limit": 3}
    assert registrable_domain("a.b.news.test") == "news.test"
    assert registrable_domain("news.test") == "news.test"


def test_plugin_output_contract():
    # validateCandidatePluginOutput semantics (candidates_test.go:48-63)
    ok = validate_plugin_output(
        {"accepted": True, "score": 0.87, "reason": "trusted source",
         "tags": ["news"]}
    )
    assert ok["score"] == 0.87
    with pytest.raises(ValueError, match="unknown"):
        validate_plugin_output({"accept": True, "score": 1, "reason": "x"})
    with pytest.raises(ValueError, match="reason"):
        validate_plugin_output({"accepted": True, "score": 1})
    with pytest.raises(ValueError, match="accepted"):
        validate_plugin_output({"score": 1, "reason": "x"})


@pytest.mark.usefixtures("ray_session")
def test_candidate_processor_stage_end_to_end():
    """normalize → filters → JS processor in an actor pool (minijs)."""
    raw = [
        {"url": "HTTPS://News.Test:443/a?utm_source=tw&id=1", "score": 0.8},
        {"url": "https://news.test/a?id=1", "score": 0.8},  # dup after norm
        {"url": "https://spam.test/x", "score": 0.9},
        {"url": "not a url", "score": 1.0},
        {"url": "https://blog.test/p", "score": 0.7},
    ]
    normalized, _ = normalize_candidates(raw)
    filtered, _ = apply_builtin_filters(
        normalized, CandidateFilters(denied_domains=("spam.test",))
    )
    script = """
        var c = params.candidate;
        var accepted = c.score >= 0.75;
        var result = {
            accepted: accepted,
            score: accepted ? c.score + 0.05 : c.score,
            reason: accepted ? 'score ok' : 'score too low',
            tags: [c.host.split('.')[0]]
        };
    """
    ds = ray.data.from_arrow(pa.Table.from_pylist(filtered))
    out = (
        ds.map_batches(
            CandidateProcessorStage, fn_constructor_args=(script,),
            batch_format="pyarrow", concurrency=2,
        )
        .to_pandas()
        .set_index("url")
    )
    assert len(out) == 2
    acc = out.loc["https://news.test/a?id=1&utm_source=tw"
                  if False else "https://news.test/a?id=1"]
    assert acc.accepted and acc.score == pytest.approx(0.85)
    assert acc.tags.tolist() == ["news"]
    rej = out.loc["https://blog.test/p"]
    assert not rej.accepted and rej.reason == "score too low"

    # broken plugin output → marked rejected, not crashed
    bad = CandidateProcessorStage("var result = {accept: true};")
    got = bad(pa.Table.from_pylist(filtered[:1]))
    assert not got["accepted"][0].as_py()
    assert "invalid plugin output" in got["reason"][0].as_py()
