"""Engine ↔ oracle equality gate (ENGINE_SPEC.md).

Compares the Ray Data crawl engine against the single-process oracle under
identical (seed list, corpus, politeness budget): fetched set, (depth, ord)
total order, per-doc span sequences, final seen set.
"""

import glob
import json
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from thecrowler_ray.oracle import CrawlParams, crawl_oracle
from thecrowler_ray.pipelines.crawl import CrawlRun, EngineConfig
from thecrowler_ray.sources.synthweb import CorpusConfig, seed_urls
from thecrowler_ray.stages.seen import key_u64

CFG = CorpusConfig(seed=42, n_hosts=5, base_pages=25)
SEEDS = seed_urls(CFG, 3)


def _engine_pages(out_dir: str) -> pd.DataFrame:
    files = glob.glob(f"{out_dir}/wave=*/pages/*.parquet")
    if not files:
        return pd.DataFrame(columns=["doc_id", "url", "depth", "ord", "spans"])
    return (
        pd.concat([pq.read_table(f).to_pandas() for f in files])
        .sort_values(["depth", "ord"])
        .reset_index(drop=True)
    )


def _assert_match(run: CrawlRun, out_dir: str, oracle) -> None:
    eng = _engine_pages(out_dir)
    orc = sorted(
        ((p["depth"], p["ord"], p["doc_id"], p["url"], p["spans"]) for p in oracle.pages)
    )
    assert len(eng) == len(orc), f"fetched count {len(eng)} != {len(orc)}"
    for i, (d, od, doc, url, ospans) in enumerate(orc):
        r = eng.iloc[i]
        assert (r.depth, r.ord, r.doc_id) == (d, od, doc), (
            f"row {i}: engine ({r.depth},{r.ord},{r.url}) != oracle ({d},{od},{url})"
        )
        espans = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r.spans]
        xspans = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in ospans]
        assert espans == xspans, f"span mismatch for {url}"
    # seen-set equality: same cardinality and every oracle key present
    # (probe with host routing — shards are host-hash partitioned)
    assert run.seen.total_count() == len(oracle.seen)
    keys_hosts = sorted(oracle.seen_hosts.items())
    okeys = np.array([int(k[:16], 16) for k, _ in keys_hosts], dtype=np.uint64)
    ohosts = [h for _, h in keys_hosts]
    assert run.seen.contains_batch(okeys, ohosts).all()


def _run_both(tmpdir: str, *, engine_kw: dict, oracle_kw: dict):
    shutil.rmtree(tmpdir, ignore_errors=True)
    ecfg = EngineConfig(
        out_dir=tmpdir,
        n_seen_shards=3,
        n_pol_shards=3,
        fetch_concurrency=2,
        seen_log2_buckets=10,
        **engine_kw,
    )
    run = CrawlRun(CFG, SEEDS, ecfg)
    summary = run.run()
    oracle = crawl_oracle(CFG, SEEDS, CrawlParams(**oracle_kw))
    return run, summary, oracle


@pytest.mark.usefixtures("ray_session")
def test_basic_bfs_equality():
    run, summary, oracle = _run_both(
        "/tmp/crowler_t_basic",
        engine_kw=dict(max_links=150, max_waves=8),
        oracle_kw=dict(max_links=150, max_waves=8),
    )
    assert summary["total_fetched"] == len(oracle.pages)
    _assert_match(run, "/tmp/crowler_t_basic", oracle)


@pytest.mark.usefixtures("ray_session")
def test_distributed_path_equality():
    """Force the 10^10-scale path (driver_threshold=0): groupby admission,
    bucketed dedup, distributed sort/limit/rank — must match the oracle
    byte-for-byte like the driver path."""
    run, summary, oracle = _run_both(
        "/tmp/crowler_t_dist",
        engine_kw=dict(max_links=150, max_waves=8, driver_threshold=0),
        oracle_kw=dict(max_links=150, max_waves=8),
    )
    assert summary["total_fetched"] == len(oracle.pages)
    _assert_match(run, "/tmp/crowler_t_dist", oracle)


@pytest.mark.usefixtures("ray_session")
def test_distributed_path_politeness_equality():
    kw = dict(max_links=60, max_waves=12, politeness_rate=2, politeness_capacity=3)
    run, summary, oracle = _run_both(
        "/tmp/crowler_t_dist_pol",
        engine_kw=dict(driver_threshold=0, **kw),
        oracle_kw=kw,
    )
    assert summary["total_fetched"] == len(oracle.pages)
    _assert_match(run, "/tmp/crowler_t_dist_pol", oracle)


@pytest.mark.usefixtures("ray_session")
def test_max_links_truncation():
    run, summary, oracle = _run_both(
        "/tmp/crowler_t_trunc",
        engine_kw=dict(max_links=23, max_waves=8),
        oracle_kw=dict(max_links=23, max_waves=8),
    )
    assert summary["total_fetched"] == len(oracle.pages) <= 23
    _assert_match(run, "/tmp/crowler_t_trunc", oracle)


@pytest.mark.usefixtures("ray_session")
def test_politeness_deferral():
    kw = dict(
        max_links=60,
        max_waves=12,
        politeness_rate=2,
        politeness_capacity=3,
    )
    run, summary, oracle = _run_both(
        "/tmp/crowler_t_pol", engine_kw=kw, oracle_kw=kw
    )
    assert any(m.get("deferred", 0) > 0 for m in oracle.metrics), "fixture too small"
    assert summary["total_fetched"] == len(oracle.pages)
    _assert_match(run, "/tmp/crowler_t_pol", oracle)


@pytest.mark.usefixtures("ray_session")
def test_robots_drop():
    kw = dict(max_links=150, max_waves=8, check_robots=True)
    run, summary, oracle = _run_both(
        "/tmp/crowler_t_rob", engine_kw=kw, oracle_kw=kw
    )
    assert summary["total_fetched"] == len(oracle.pages)
    assert sum(m.get("robots_dropped", 0) for m in summary["metrics"]) == sum(
        m.get("robots_dropped", 0) for m in oracle.metrics
    )
    _assert_match(run, "/tmp/crowler_t_rob", oracle)


@pytest.mark.usefixtures("ray_session")
def test_checkpoint_resume():
    out = "/tmp/crowler_t_resume"
    shutil.rmtree(out, ignore_errors=True)
    base = dict(max_links=150, n_seen_shards=3, n_pol_shards=3,
                fetch_concurrency=2, seen_log2_buckets=10, out_dir=out)
    # phase 1: stop after 3 waves (simulated crash after checkpoint)
    run1 = CrawlRun(CFG, SEEDS, EngineConfig(max_waves=3, **base))
    run1.run()
    # phase 2: resume from checkpoint and finish
    run2 = CrawlRun.resume(CFG, SEEDS, EngineConfig(max_waves=8, **base))
    assert run2 is not None
    assert run2.wave == 3
    run2.run_resumed()
    oracle = crawl_oracle(CFG, SEEDS, CrawlParams(max_links=150, max_waves=8))
    _assert_match(run2, out, oracle)


@pytest.mark.usefixtures("ray_session")
def test_unwanted_patterns_equality():
    kw = dict(max_links=150, max_waves=8,
              unwanted=[r"/p/1\b", r"host2\.test"])
    run, summary, oracle = _run_both(
        "/tmp/crowler_t_unw", engine_kw=kw, oracle_kw=kw
    )
    assert summary["total_fetched"] == len(oracle.pages) > 0
    _assert_match(run, "/tmp/crowler_t_unw", oracle)


@pytest.mark.usefixtures("ray_session")
def test_restriction_level_equality():
    # restricted=2 (SLD): cross-host links must be skipped; synthweb hosts
    # have distinct SLDs so each seed stays on its own host
    seeds = [dict(s, restricted=2) for s in SEEDS]
    out = "/tmp/crowler_t_restr"
    shutil.rmtree(out, ignore_errors=True)
    ecfg = EngineConfig(out_dir=out, n_seen_shards=3, n_pol_shards=3,
                        fetch_concurrency=2, seen_log2_buckets=10,
                        max_links=150, max_waves=8)
    run = CrawlRun(CFG, seeds, ecfg)
    summary = run.run()
    from thecrowler_ray.oracle import CrawlParams, crawl_oracle

    oracle = crawl_oracle(CFG, seeds, CrawlParams(max_links=150, max_waves=8))
    assert summary["total_fetched"] == len(oracle.pages) > 0
    _assert_match(run, out, oracle)
    # every fetched page stays on a seed host
    eng = _engine_pages(out)
    seed_hosts = {s["host"] for s in seeds}
    assert set(eng.url.str.lower().str.extract(r"http://([^/]+)/")[0]) <= seed_hosts


@pytest.mark.usefixtures("ray_session")
def test_checkpoint_lineage_and_metrics():
    """Per-wave manifests form a lineage chain with counters + politeness
    state + config — what 'resumable with per-partition lineage + metrics'
    means concretely."""
    import json
    import os

    out = "/tmp/crowler_t_lineage"
    shutil.rmtree(out, ignore_errors=True)
    run = CrawlRun(CFG, SEEDS, EngineConfig(
        max_links=80, max_waves=4, out_dir=out, n_seen_shards=3,
        n_pol_shards=3, seen_log2_buckets=10))
    summary = run.run()
    waves = sorted(
        int(d.split("=")[1]) for d in os.listdir(out) if d.startswith("wave=")
    )
    assert waves == list(range(summary["waves"]))
    total = 0
    for w in waves:
        with open(f"{out}/wave={w}/manifest.json") as f:
            man = json.load(f)
        assert man["wave"] == w and man["parent_wave"] == w - 1
        assert man["complete"] is True
        assert man["config"]["max_links"] == 80
        assert len(man["politeness"]) == 3
        total += man["metrics"]["fetched"]
        assert {"wave", "fetched", "deferred"} <= set(man["metrics"])
        # seen snapshots exist for every shard
        for i in range(3):
            assert os.path.exists(f"{out}/wave={w}/seen/shard-{i}.npz")
    assert total == summary["total_fetched"]


@pytest.mark.usefixtures("ray_session")
def test_per_source_config_overrides():
    """Per-seed crawling_config (unwanted_urls) applies only to that seed's
    subtree — reference CombineConfig semantics."""
    import json

    seeds = [dict(s) for s in SEEDS]
    # seed 0: block its own /p/1 page via per-source config
    seeds[0]["config"] = json.dumps(
        {"crawling_config": {"unwanted_urls": [r"host0\.test.*?/p/1$"]}}
    )
    out = "/tmp/crowler_t_srccfg"
    shutil.rmtree(out, ignore_errors=True)
    run = CrawlRun(CFG, seeds, EngineConfig(
        out_dir=out, n_seen_shards=3, n_pol_shards=3, fetch_concurrency=2,
        seen_log2_buckets=10, max_links=150, max_waves=8))
    summary = run.run()
    oracle = crawl_oracle(CFG, seeds, CrawlParams(max_links=150, max_waves=8))
    assert summary["total_fetched"] == len(oracle.pages) > 0
    _assert_match(run, out, oracle)
    eng = _engine_pages(out)
    urls = set(eng.url.str.lower())
    assert not any(u.endswith("host0.test/p/1") for u in urls)
    # other hosts' /p/1 pages are unaffected
    assert any("/p/1" in u and "host0" not in u for u in urls)


@pytest.mark.usefixtures("ray_session")
def test_mixed_mode_equality():
    """Frontier below driver_threshold but candidates above it → driver
    admission + distributed links in the SAME wave (the mode switch found by
    the 300k-page stress run). Must still match the oracle."""
    kw = dict(max_links=150, max_waves=8, driver_threshold=200)
    run, summary, oracle = _run_both(
        "/tmp/crowler_t_mixed", engine_kw=kw, oracle_kw=dict(max_links=150, max_waves=8)
    )
    assert summary["total_fetched"] == len(oracle.pages) > 50
    _assert_match(run, "/tmp/crowler_t_mixed", oracle)


@pytest.mark.usefixtures("ray_session")
def test_approximate_seen_mode():
    """seen_exact=False (the 10^10 memory path): filters sized so the
    fp probability at test scale is negligible → still oracle-equal."""
    run, summary, oracle = _run_both(
        "/tmp/crowler_t_approx",
        engine_kw=dict(max_links=150, max_waves=8, seen_exact=False),
        oracle_kw=dict(max_links=150, max_waves=8),
    )
    assert summary["total_fetched"] == len(oracle.pages)
    eng = _engine_pages("/tmp/crowler_t_approx")
    assert set(eng.doc_id) == {p["doc_id"] for p in oracle.pages}


@pytest.mark.usefixtures("ray_session")
def test_distributed_path_robots_equality():
    kw = dict(max_links=150, max_waves=8, check_robots=True)
    run, summary, oracle = _run_both(
        "/tmp/crowler_t_dist_rob",
        engine_kw=dict(driver_threshold=0, **kw),
        oracle_kw=kw,
    )
    assert summary["total_fetched"] == len(oracle.pages)
    assert sum(m.get("robots_dropped", 0) for m in summary["metrics"]) == sum(
        m.get("robots_dropped", 0) for m in oracle.metrics
    )
    _assert_match(run, "/tmp/crowler_t_dist_rob", oracle)


@pytest.mark.usefixtures("ray_session")
def test_randomized_engine_oracle_equality():
    """Property-style end-to-end: random (corpus, politeness, limits)
    configurations — engine must equal the oracle on every one."""
    import random

    rng = random.Random(20260817)
    for trial in range(4):
        corpus = CorpusConfig(
            seed=rng.randint(1, 10_000),
            n_hosts=rng.randint(2, 7),
            base_pages=rng.randint(8, 30),
            branch=rng.randint(2, 4),
            cross_host_frac=rng.choice([0.0, 0.15, 0.4]),
            variant_frac=rng.choice([0.0, 0.3]),
        )
        seeds = seed_urls(corpus, rng.randint(1, corpus.n_hosts))
        params = dict(
            max_links=rng.choice([20, 60, 200]),
            max_waves=rng.randint(3, 8),
            politeness_rate=rng.choice([2, 5, 10**9]),
            politeness_capacity=rng.choice([3, 8, 10**9]),
            check_robots=rng.choice([False, True]),
            link_score_fn=rng.choice([None, _make_scorer()]),
        )
        if params["politeness_capacity"] < params["politeness_rate"]:
            params["politeness_capacity"] = params["politeness_rate"]
        if rng.random() < 0.5:
            import json as _json

            seeds[0] = dict(seeds[0], config=_json.dumps(
                {"crawling_config": {"unwanted_urls": [r"/p/2$"]}}))
        out = f"/tmp/crowler_t_rand{trial}"
        shutil.rmtree(out, ignore_errors=True)
        run = CrawlRun(corpus, seeds, EngineConfig(
            out_dir=out, n_seen_shards=2, n_pol_shards=2, seen_log2_buckets=10,
            driver_threshold=rng.choice([0, 500_000]), **params))
        summary = run.run()
        oracle = crawl_oracle(corpus, seeds, CrawlParams(**params))
        assert summary["total_fetched"] == len(oracle.pages), (
            f"trial {trial}: {params} corpus={corpus}"
        )
        _assert_match(run, out, oracle)


def _make_scorer():
    # defined as a closure so cloudpickle ships it by value to workers
    import re as _re

    pat = _re.compile(r"/p/(\d+)")

    def score(url: str) -> int:
        m = pat.search(url.lower())
        return 1000 - int(m.group(1)) if m else 0

    return score


@pytest.mark.usefixtures("ray_session")
def test_priority_frontier_equality():
    """Link-score ordering (north star: 'depth + link-score'): with a tight
    max_links the scored crawl must pick different (higher-priority) pages
    than discovery order — and still match the oracle exactly."""
    kw = dict(max_links=40, max_waves=6)
    scorer = _make_scorer()
    run, summary, oracle = _run_both(
        "/tmp/crowler_t_prio",
        engine_kw=dict(link_score_fn=scorer, **kw),
        oracle_kw=dict(link_score_fn=scorer, **kw),
    )
    assert summary["total_fetched"] == len(oracle.pages) > 0
    _assert_match(run, "/tmp/crowler_t_prio", oracle)
    # and the scored ordering actually differs from plain discovery order
    plain = crawl_oracle(CFG, SEEDS, CrawlParams(**kw))
    assert {p["doc_id"] for p in oracle.pages} != {p["doc_id"] for p in plain.pages}


@pytest.mark.usefixtures("ray_session")
def test_priority_frontier_distributed_equality():
    kw = dict(max_links=40, max_waves=6)
    scorer = _make_scorer()
    run, summary, oracle = _run_both(
        "/tmp/crowler_t_prio_dist",
        engine_kw=dict(link_score_fn=scorer, driver_threshold=0, **kw),
        oracle_kw=dict(link_score_fn=scorer, **kw),
    )
    assert summary["total_fetched"] == len(oracle.pages)
    _assert_match(run, "/tmp/crowler_t_prio_dist", oracle)


@pytest.mark.usefixtures("ray_session")
def test_fetch_retry_budget():
    """Transient fetch failures retry within the budget (reference per-URL
    navigation retries) — crawl output unchanged vs the oracle."""
    from thecrowler_ray.stages.fetch import FetchParse

    # direct: flaky fetcher succeeds on retry, permanent 404 does not
    fp = FetchParse(CFG, max_retries=3, flaky_every=1)  # every URL fails once
    from thecrowler_ray.sources.synthweb import page_url

    html = fp._fetch(page_url(CFG, 0, 0))
    assert html is not None and fp.retry_count >= 1
    assert fp._fetch("http://host0.test/p/99999") is None  # permanent

    # zero budget → transient failure becomes a miss
    fp0 = FetchParse(CFG, max_retries=0, flaky_every=1)
    assert fp0._fetch(page_url(CFG, 0, 0)) is None


def test_politeness_pool_surface_only_working_methods():
    """Every public method on PolitenessPool must be callable against the
    pool's own attributes (regression: a shard method was once pasted onto
    the pool class and referenced shard-only state)."""
    import inspect

    from thecrowler_ray.stages.politeness import PolitenessPool

    pool_attrs = {"n_shards", "actors"}
    for name, fn in inspect.getmembers(PolitenessPool, inspect.isfunction):
        if name.startswith("_"):
            continue
        for node in inspect.getsource(fn).split("self."):
            attr = node.split("(")[0].split("[")[0].split(".")[0].split(")")[0].split(",")[0].split(" ")[0].strip()
            if attr and attr.isidentifier():
                assert attr in pool_attrs or attr in dir(PolitenessPool), (
                    f"PolitenessPool.{name} references self.{attr} which the "
                    "pool does not define"
                )


@pytest.mark.usefixtures("ray_session")
def test_action_rules_discover_gated_pages():
    """M17: a crawl with action rules must (a) match the oracle that uses
    the synthweb ground-truth action links — pinning the whole DOM parse →
    click → form-submit path — and (b) discover URLs a plain crawl cannot."""
    from thecrowler_ray.actions import standard_action_rules

    acfg = CorpusConfig(seed=7, n_hosts=5, base_pages=25, action_frac=0.4)
    aseeds = seed_urls(acfg, 3)
    kw = dict(
        max_links=200, max_waves=8, n_seen_shards=3, n_pol_shards=3,
        fetch_concurrency=2, seen_log2_buckets=10,
    )
    out_a = "/tmp/crowler_t_actions"
    shutil.rmtree(out_a, ignore_errors=True)
    run_a = CrawlRun(
        acfg, aseeds,
        EngineConfig(out_dir=out_a, action_rules=standard_action_rules(), **kw),
    )
    run_a.run()
    oracle_a = crawl_oracle(
        acfg, aseeds,
        CrawlParams(max_links=200, max_waves=8, use_action_rules=True),
    )
    _assert_match(run_a, out_a, oracle_a)

    out_p = "/tmp/crowler_t_actions_plain"
    shutil.rmtree(out_p, ignore_errors=True)
    run_p = CrawlRun(acfg, aseeds, EngineConfig(out_dir=out_p, **kw))
    run_p.run()
    acted = set(_engine_pages(out_a).url)
    plain = set(_engine_pages(out_p).url)
    gated = {u for u in acted - plain if "?q=crawl" in u}
    assert gated, "action crawl must fetch form-submission URLs a plain crawl never sees"
    assert not {u for u in plain if "?q=" in u}


@pytest.mark.usefixtures("ray_session")
def test_seen_spill_engine_equality():
    """Exact-sidecar spill enabled in the live shard actors: crawl results
    must be identical to the oracle and spill runs must appear on disk."""
    import glob as _glob

    spill_dir = "/tmp/crowler_t_spill_seen"
    shutil.rmtree(spill_dir, ignore_errors=True)
    run, summary, oracle = _run_both(
        "/tmp/crowler_t_spill",
        engine_kw=dict(max_links=150, max_waves=8,
                       seen_spill_dir=spill_dir, seen_spill_threshold=16),
        oracle_kw=dict(max_links=150, max_waves=8),
    )
    assert summary["total_fetched"] == len(oracle.pages)
    _assert_match(run, "/tmp/crowler_t_spill", oracle)
    assert _glob.glob(f"{spill_dir}/shard*/run*.npy"), "no spill runs written"


@pytest.mark.usefixtures("ray_session")
def test_wave_spill_engine_equality():
    """Big-wave object-store relief (wave_spill_threshold): pages stream
    straight to storage and links re-read pruned columns — results must be
    byte-identical to the oracle (threshold=1 forces every wave through
    the spill path)."""
    run, summary, oracle = _run_both(
        "/tmp/crowler_t_wavespill",
        engine_kw=dict(max_links=150, max_waves=8, wave_spill_threshold=1),
        oracle_kw=dict(max_links=150, max_waves=8),
    )
    assert summary["total_fetched"] == len(oracle.pages)
    _assert_match(run, "/tmp/crowler_t_wavespill", oracle)


@pytest.mark.usefixtures("ray_session")
def test_http_fetch_parse_equals_synthetic():
    """S2/S3 live path: HttpFetchParse fetches the SAME synthetic pages
    over a real local HTTP server and produces byte-identical page rows to
    the in-process fetcher, including retry classification (5xx transient,
    404 permanent)."""
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    import pyarrow as pa
    import ray.data

    from thecrowler_ray.sources.synthweb import page_html, page_url, parse_page_url
    from thecrowler_ray.stages.fetch import FetchParse, HttpFetchParse

    cfg = CFG
    flaky_hits = {"n": 0}

    class H(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            # proxy-style path: /<original url>
            url = self.path[1:]
            if url.endswith("/flaky5xx") and flaky_hits["n"] == 0:
                flaky_hits["n"] += 1
                self.send_response(503)
                self.end_headers()
                return
            hp = parse_page_url(cfg, url.replace("/flaky5xx", ""))
            if hp is None:
                self.send_response(404)
                self.end_headers()
                return
            data = page_html(cfg, *hp).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    proxy = f"http://127.0.0.1:{httpd.server_address[1]}/"
    try:
        urls = [page_url(cfg, h, p) for h, p in ((0, 0), (0, 1), (1, 0))]
        batch = pa.table({
            "url": urls + [urls[0] + "/nonexistent-page"],
            "key": [f"k{i}" for i in range(4)],
            "host": ["h"] * 4, "depth": [0] * 4, "ord": list(range(4)),
            "src_url": [""] * 4, "restricted": [4] * 4,
        })
        via_http = HttpFetchParse(proxy_base=proxy)(batch)
        via_synth = FetchParse(cfg)(batch)
        assert via_http.num_rows == 3  # 404 row dropped like unknown URL
        assert via_http.equals(via_synth)

        # a 503 is transient: the retry within the budget succeeds
        f = HttpFetchParse(proxy_base=proxy, max_retries=2)
        html = f._fetch(urls[0] + "/flaky5xx")
        assert html is not None and "<title>" in html
        assert f.retry_count == 1
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_link_explode_filter_vector_scalar_parity():
    """The vectorized skip chain in LinkExplodeFilter must be bit-identical
    to a per-row reference (resolve -> skip_url -> is_url_valid -> key /
    first-win dedup) over adversarial link batches: whitespace padding,
    relative hrefs, external hosts at every restriction level, unwanted +
    user patterns (incl. negatives), self links, mail/invalid schemes,
    case and trailing-slash variants, duplicate keys."""
    import numpy as np
    import pyarrow as pa

    from thecrowler_ray.pipelines.crawl import (
        _PACK_SHIFT,
        EngineConfig,
        LinkExplodeFilter,
    )
    from thecrowler_ray.urls import (
        combine_urls,
        is_url_valid,
        skip_url,
        url_key_hex,
    )

    rng = np.random.default_rng(17)
    hosts = ["a.example.test", "b.example.test", "other.net", "sub.a.example.test"]
    paths = ["/p/1", "/p/2/", "/P/3", "/q?x=1", "/img.png", "/style.css",
             "/dup", "/dup/", ""]
    schemes = ["http://", "https://", "ftp://", "mailto:", "imap://", ""]

    def rand_href():
        r = rng.random()
        if r < 0.2:
            return rng.choice(paths)  # root-relative
        s = rng.choice(schemes)
        h = rng.choice(hosts)
        p = rng.choice(paths)
        pad = rng.choice(["", " ", "\t", "  "])
        core = f"{s}{h}{p}" if s else f"{h}{p}"
        return pad + core + pad if rng.random() < 0.15 else core

    cfg = EngineConfig(
        unwanted=[r"\.css$", r"/img\."],
        user_patterns=[r"!\.png$", r"example\.test", r"/q\?"],
    )
    source_cfgs = [
        {"crawling_config": {"unwanted_urls": [r"/p/2\b"]}},
        {"crawling_config": {
            "execution_plan": {"conditions": {"url_patterns": [r"(?=x)x.*"]}},
        }},  # Python-only lookahead -> scalar config path
    ]
    stage = LinkExplodeFilter(cfg, source_cfgs)

    n_pages = 40
    rows = []
    for i in range(n_pages):
        host = hosts[i % len(hosts)]
        page_url = f"http://{host}/page/{i}"
        links = [{"href": rand_href(), "element_id": "", "link_idx": j}
                 for j in range(int(rng.integers(0, 12)))]
        rows.append({
            "url": page_url,
            "ord": i,
            "src_url": f"http://{hosts[i % 2]}",
            "restricted": int(rng.choice([0, 1, 2, 3, 4])),
            "cfg_idx": int(rng.choice([0, 1, 2])),
            "links": links,
        })
    batch = pa.Table.from_pylist(rows)

    got = stage(batch).to_pylist()

    # scalar reference (the pre-vectorization loop, verbatim semantics)
    best = {}
    for r in rows:
        ci = r["cfg_idx"] if r["cfg_idx"] < len(stage.unwanted_by_idx) else 0
        for ln in r["links"]:
            link = ln["href"]
            if link.startswith("/"):
                link = combine_urls(r["url"], link)
            if skip_url(link, r["src_url"], r["restricted"],
                        unwanted=stage.unwanted_by_idx[ci],
                        user_patterns=stage.patterns_by_idx[ci]):
                continue
            if not is_url_valid(link if "://" in link else "http://" + link):
                continue
            key = url_key_hex(link)
            packed = ((r["ord"] << _PACK_SHIFT)
                      | min(ln["link_idx"], (1 << _PACK_SHIFT) - 1))
            cur = best.get(key)
            if cur is None or packed < cur[0]:
                best[key] = (packed, link)
    got_map = {r["key"]: r["packed"] for r in got}
    assert got_map == {k: p for k, (p, _) in best.items()}
    got_urls = {r["key"]: r["url"] for r in got}
    assert got_urls == {k: u for k, (_, u) in best.items()}
    assert len(got) > 0


@pytest.mark.usefixtures("ray_session")
def test_resume_ignores_partial_wave():
    """Mid-wave crash leaves a wave dir WITHOUT a complete manifest
    (pages are made durable before the manifest commits) — resume must
    restart from the last COMPLETE wave and still converge to the
    oracle's exact page set."""
    out = "/tmp/crowler_t_partial"
    shutil.rmtree(out, ignore_errors=True)
    base = dict(max_links=150, n_seen_shards=3, n_pol_shards=3,
                fetch_concurrency=2, seen_log2_buckets=10, out_dir=out)
    run1 = CrawlRun(CFG, SEEDS, EngineConfig(max_waves=3, **base))
    run1.run()
    # simulate the crash artifacts: a partial next wave with pages but no
    # manifest, plus one with an incomplete manifest
    part = os.path.join(out, "wave=3", "pages")
    os.makedirs(part, exist_ok=True)
    with open(os.path.join(part, "part-0.parquet"), "wb") as f:
        f.write(b"\x00garbage - must never be read")
    half = os.path.join(out, "wave=4")
    os.makedirs(half, exist_ok=True)
    with open(os.path.join(half, "manifest.json"), "w") as f:
        json.dump({"complete": False, "total_fetched": 10**9}, f)
    run2 = CrawlRun.resume(CFG, SEEDS, EngineConfig(max_waves=8, **base))
    assert run2 is not None
    assert run2.wave == 3  # resumed at the partial wave, not after it
    run2.run_resumed()
    oracle = crawl_oracle(CFG, SEEDS, CrawlParams(max_links=150, max_waves=8))
    _assert_match(run2, out, oracle)
