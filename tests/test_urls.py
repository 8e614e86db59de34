from thecrowler_ray.urls import (
    combine_urls,
    compile_patterns,
    host_hash,
    host_of,
    is_external_link,
    is_url_valid,
    normalize_url,
    skip_url,
    url_key,
    url_key_hex,
)


def test_normalize_url():
    assert normalize_url("  HTTP://Example.COM/Path/  ") == "http://example.com/path"
    assert normalize_url("http://a.test///") == "http://a.test"
    assert normalize_url("http://A.test/B", lowercase=False) == "http://A.test/B"


def test_is_url_valid():
    assert is_url_valid("http://example.com")
    assert is_url_valid("HTTPS://Example.com/x")
    assert is_url_valid("ftp://files.example.com")
    assert not is_url_valid("")
    assert not is_url_valid("http://nodots")
    assert not is_url_valid("http://a b.com")
    assert not is_url_valid("javascript:alert(1)")
    assert is_url_valid("imap://mail.example.com")
    assert is_url_valid("maildir:///var/mail/u")
    assert not is_url_valid("maildir:///")


def test_combine_urls():
    assert combine_urls("http://a.test/x/y", "/z") == "http://a.test/z"
    assert combine_urls("http://a.test", "http://b.test/q") == "http://b.test/q"


def test_restriction_levels():
    src = "http://www.example.com/docs/"
    assert not is_external_link(src, "http://www.example.com/docs/", 0)
    assert is_external_link(src, "http://www.example.com/other", 0)
    assert not is_external_link(src, "http://www.example.com/docs/page", 1)
    assert is_external_link(src, "http://www.example.com/else", 1)
    assert not is_external_link(src, "http://api.example.com/x", 2)
    assert is_external_link(src, "http://other.org/x", 2)
    assert not is_external_link(src, "http://foo.bar.com/x", 3)
    assert is_external_link(src, "http://foo.bar.org/x", 3)
    assert not is_external_link(src, "http://anything.anywhere/x", 4)
    assert not is_external_link(src, "/relative/path", 0)


def test_skip_url_chain():
    src = "http://example.com"
    assert skip_url("", src, 4)
    assert skip_url("http://example.com", src, 4)  # self
    assert not skip_url("http://example.com/page", src, 4)
    unwanted = compile_patterns([r"\.pdf$"])
    assert skip_url("http://example.com/file.pdf", src, 4, unwanted=unwanted)
    # user patterns: positive keeps, negative skips, no-match skips
    assert not skip_url("http://example.com/keep/1", src, 4, user_patterns=["/keep/"])
    assert skip_url("http://example.com/drop/1", src, 4, user_patterns=["/keep/"])
    assert skip_url(
        "http://example.com/keep/bad", src, 4, user_patterns=["!/keep/bad", "/keep/"]
    )
    # external policy at level 2
    assert skip_url("http://other.org/x", src, 2)
    assert not skip_url("http://sub.example.com/x", src, 2)
    # relative URLs resolve against the source before checks
    assert not skip_url("/about", src, 4, user_patterns=["/about"])
    # restriction 0 keeps only the exact source URL
    assert skip_url("/about", src, 0)


def test_url_key_variants_collide():
    a = url_key("http://Host1.test/p/3/")
    b = url_key("HTTP://host1.test/p/3")
    assert a == b
    assert len(a) == 20
    assert url_key_hex("http://host1.test/p/3") == a.hex()


def test_host_helpers():
    assert host_of("http://Sub.Example.COM:8080/x") == "sub.example.com"
    assert host_of("not a url") == ""
    h1 = host_hash("host1.test")
    assert 0 <= h1 < 1 << 32
    assert h1 == host_hash("host1.test")  # stable across calls/processes
    assert host_hash("host1.test", 64) < 64


def test_parse_robots_txt():
    from thecrowler_ray.urls import parse_robots_txt

    text = """
# comments ignored
User-agent: crowler
Disallow: /private/
Disallow: /tmp

User-agent: *
Disallow: /admin/
Crawl-delay: 3
"""
    assert parse_robots_txt(text, "crowler") == ["/private/", "/tmp"]
    assert parse_robots_txt(text, "other-bot") == ["/admin/"]
    assert parse_robots_txt("", "x") == []
    # empty Disallow means allow-all for that group
    assert parse_robots_txt("User-agent: *\nDisallow:") == []
    # multiple agents sharing one group
    shared = "User-agent: a\nUser-agent: b\nDisallow: /x/"
    assert parse_robots_txt(shared, "a") == ["/x/"]
    assert parse_robots_txt(shared, "b") == ["/x/"]


def test_root_relative_resolves_against_page_url():
    """Characterization of a DELIBERATE deviation (ENGINE_SPEC.md step 5):
    root-relative hrefs resolve against the PAGE url — the RFC 3986 / browser
    behavior — not against the seed/source url as the reference does
    (crawler.go:2210-2212). If this ever changes, change ENGINE_SPEC.md,
    oracle.py and the crawl engine together."""
    from thecrowler_ray.urls import combine_urls

    page = "http://sub.host0.test/dir/page"
    assert combine_urls(page, "/top") == "http://sub.host0.test/top"
    # crawl engine + oracle both pass the PAGE url as the base:
    import inspect

    from thecrowler_ray import oracle
    from thecrowler_ray.pipelines import crawl

    assert 'combine_urls(r["url"], link)' in inspect.getsource(oracle.crawl_oracle)
    # the vectorized explode resolves against per-PAGE bases
    # (scheme://netloc of page_urls), not srcs
    src = inspect.getsource(crawl.LinkExplodeFilter.__call__)
    assert "for i, pu in enumerate(page_urls):" in src
    assert "bases[par[ri]] + link0[ri]" in src
