"""Indexing pipeline + salted-groupby tests."""

import glob
import shutil

import duckdb
import pyarrow as pa
import pytest
import ray.data

from thecrowler_ray.ops.salted import salted_count, salted_sum
from thecrowler_ray.pipelines.crawl import CrawlRun, EngineConfig
from thecrowler_ray.pipelines.index import index_pages
from thecrowler_ray.sources.synthweb import CorpusConfig, seed_urls


@pytest.mark.usefixtures("ray_session")
def test_salted_groupby_matches_plain():
    import numpy as np

    rng = np.random.default_rng(5)
    # zipfian keys: one hot key with ~half the rows
    keys = np.where(rng.random(20000) < 0.5, "hot", rng.integers(0, 50, 20000).astype(str))
    vals = rng.random(20000)
    t = pa.table({"k": keys.tolist(), "v": vals})
    ds = ray.data.from_arrow(t)
    got = salted_count(ds, "k").to_pandas().set_index("k")["cnt"]
    import pandas as pd

    expect = pd.Series(keys).value_counts()
    assert got["hot"] == expect["hot"]
    assert got.sum() == 20000
    gs = salted_sum(ds, "k", "v").to_pandas().set_index("k")["sum_v"]
    pdf = pd.DataFrame({"k": keys, "v": vals}).groupby("k")["v"].sum()
    assert abs(gs["hot"] - pdf["hot"]) < 1e-6


@pytest.mark.usefixtures("ray_session")
def test_index_pipeline():
    out = "/tmp/crowler_t_index"
    crawl_out = "/tmp/crowler_t_index_crawl"
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(crawl_out, ignore_errors=True)
    cfg = CorpusConfig(seed=42, n_hosts=5, base_pages=25)
    run = CrawlRun(
        cfg,
        seed_urls(cfg, 3),
        EngineConfig(max_links=80, max_waves=6, out_dir=crawl_out,
                     n_seen_shards=3, n_pol_shards=3, seen_log2_buckets=10),
    )
    summary = run.run()
    pages = sorted(glob.glob(f"{crawl_out}/wave=*/pages/*.parquet"))
    counts = index_pages(pages, out)

    assert counts["search_index"] == summary["total_fetched"]
    assert counts["web_objects_index"] == summary["total_fetched"]
    assert counts["web_objects"] <= summary["total_fetched"]

    con = duckdb.connect()
    # every page appears exactly once in search_index
    n = con.execute(
        f"SELECT count(DISTINCT doc_id) FROM read_parquet('{out}/search_index/*.parquet')"
    ).fetchone()[0]
    assert n == summary["total_fetched"]
    # web_objects first-win: first_doc_id must be the min (depth, ord) page
    bad = con.execute(f"""
        WITH pages AS (SELECT doc_id, depth, "ord", content_hash
                       FROM read_parquet({pages!r})),
        expect AS (
          SELECT content_hash, doc_id AS want FROM (
            SELECT *, row_number() OVER (
              PARTITION BY content_hash ORDER BY depth, "ord") AS rn
            FROM pages) WHERE rn = 1)
        SELECT count(*) FROM read_parquet('{out}/web_objects/*.parquet') o
        JOIN expect e ON o.object_hash = e.content_hash
        WHERE o.first_doc_id <> e.want
    """).fetchone()[0]
    assert bad == 0
    # keyword dictionary counts = distinct docs per keyword in the index
    mism = con.execute(f"""
        WITH idx AS (SELECT keyword, count(DISTINCT doc_id) AS nd
                     FROM read_parquet('{out}/keyword_index/*.parquet') GROUP BY keyword)
        SELECT count(*) FROM read_parquet('{out}/keywords/*.parquet') d
        JOIN idx USING (keyword) WHERE d.n_docs <> idx.nd
    """).fetchone()[0]
    assert mism == 0
    # occurrences are ≥ 1 and keyword ids deterministic
    assert con.execute(
        f"SELECT min(occurrences) FROM read_parquet('{out}/keyword_index/*.parquet')"
    ).fetchone()[0] >= 1
    dup = con.execute(
        f"SELECT count(*) - count(DISTINCT keyword_id) FROM read_parquet('{out}/keywords/*.parquet')"
    ).fetchone()[0]
    assert dup == 0
    # meta tags indexed for every page that had meta spans
    assert counts["meta_tags_index"] > 0 and counts["meta_tags"] > 0


@pytest.mark.usefixtures("ray_session")
def test_search_api_over_index():
    """§3.2 search service analog: dork query over the indexed crawl."""
    from thecrowler_ray.pipelines.search_api import search_pages

    out = "/tmp/crowler_t_index"  # built by test_index_pipeline
    import os

    if not os.path.isdir(f"{out}/search_index"):
        pytest.skip("index not built (run test_index_pipeline first)")
    got = search_pages(out, "crawler frontier", k=5)
    assert list(got.columns) == ["doc_id", "url", "title", "score"]
    assert len(got) > 0
    assert (got.score > 0).all()
    # descending score, deterministic ties
    assert list(got.score) == sorted(got.score, reverse=True)
    # exact-field gating works
    none = search_pages(out, "lang:xx crawler", k=5)
    assert len(none) == 0


@pytest.mark.usefixtures("ray_session")
def test_correlated_sources_and_compaction():
    import os

    import pyarrow as pa

    from thecrowler_ray.pipelines.maintenance import (
        compact_waves,
        correlated_sources,
    )
    from thecrowler_ray.stages.enrich import enrich_hosts

    out = "/tmp/crowler_t_index"
    crawl_out = "/tmp/crowler_t_index_crawl"
    if not os.path.isdir(f"{out}/search_index"):
        pytest.skip("index not built")
    pages = ray.data.from_arrow(pa.table({"host": ["host0.test", "host1.test"]}))
    net, http = enrich_hosts(pages)
    got = correlated_sources(
        "host0", search_index_dir=f"{out}/search_index",
        netinfo_ds=net, httpinfo_ds=http,
    ).to_pandas()
    assert "host0.test" in set(got.host)
    assert "host1.test" not in set(got.host)

    c = compact_waves(crawl_out)
    assert c["files_before"] >= c["files_after"] >= 1
    assert c["rows"] > 0
    comp = ray.data.read_parquet(f"{crawl_out}/pages_compacted").count()
    assert comp == c["rows"]
