from thecrowler_ray.htmlx import extract_page_info
from thecrowler_ray.sources.synthweb import (
    CorpusConfig,
    out_links,
    page_html,
    page_url,
    parse_page_url,
    robots_disallow,
    seed_urls,
)
from thecrowler_ray.urls import normalize_url


def test_deterministic():
    cfg = CorpusConfig(seed=7, n_hosts=5, base_pages=20)
    assert page_html(cfg, 0, 0) == page_html(cfg, 0, 0)
    assert out_links(cfg, 1, 2) == out_links(cfg, 1, 2)
    assert page_html(CorpusConfig(seed=8, n_hosts=5, base_pages=20), 0, 0) != page_html(cfg, 0, 0)


def test_url_roundtrip():
    cfg = CorpusConfig(seed=7, n_hosts=5, base_pages=20)
    for h in range(cfg.n_hosts):
        for p in range(cfg.host_pages(h)):
            u = page_url(cfg, h, p)
            assert parse_page_url(cfg, u) == (h, p)
            assert parse_page_url(cfg, u + "/") == (h, p)
            assert parse_page_url(cfg, u.replace("http://", "HTTP://")) == (h, p)
    assert parse_page_url(cfg, "http://host99.test/p/0") is None
    assert parse_page_url(cfg, "http://elsewhere.org/x") is None


def test_links_in_html_match_ground_truth():
    cfg = CorpusConfig(seed=7, n_hosts=5, base_pages=20)
    truth = out_links(cfg, 0, 0)
    info = extract_page_info(page_url(cfg, 0, 0), page_html(cfg, 0, 0))
    extracted = [ln["href"] for ln in info["links"]]
    # hrefs in page order; trailing-slash variants are stripped by extraction
    assert [normalize_url(e, lowercase=False) for e in extracted] == [
        normalize_url(t, lowercase=False) for t in truth
    ]


def test_zipf_and_seeds():
    cfg = CorpusConfig(seed=7, n_hosts=10, base_pages=100)
    sizes = [cfg.host_pages(h) for h in range(10)]
    assert sizes[0] == 100 and sizes == sorted(sizes, reverse=True)
    seeds = seed_urls(cfg, 3)
    assert len(seeds) == 3
    assert seeds[0]["source_id"] == 0
    assert isinstance(robots_disallow(cfg, "host0.test"), list)
