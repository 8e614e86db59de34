"""Lance storage gate (BASELINE.json north star: frontier/page tables as
Lance). The container ships no ``lance`` package, so the end-to-end Lance
run is gated: on an image WITH pylance the full engine test below runs the
Lance branch and pins oracle equality against the parquet run; without it,
the gate SKIPS LOUDLY (it never silently passes) and the failure-mode tests
pin that requesting Lance degrades with a clear error, not silently."""

import glob

import pytest

from thecrowler_ray.storage import lance_available, resolve_format

LANCE = lance_available()
SKIP_REASON = (
    "LANCE GATE SKIPPED: the 'lance' package is not installed in this "
    "container — on a cluster image with pylance this test runs the crawl "
    "engine end-to-end with storage_format='lance' and checks oracle "
    "equality + version compaction"
)


@pytest.mark.skipif(not LANCE, reason=SKIP_REASON)
@pytest.mark.usefixtures("ray_session")
def test_engine_end_to_end_with_lance_storage(tmp_path):
    """With pylance present: the SAME crawl (identical seed list +
    politeness budget) through the lance branch and the parquet branch
    produces identical page tables, and the lance dataset exposes
    versions for compaction."""
    import lance
    import pandas as pd

    from thecrowler_ray.pipelines.crawl import CrawlRun, EngineConfig
    from thecrowler_ray.sources.synthweb import CorpusConfig, seed_urls
    from thecrowler_ray.storage import read_table

    cfg = CorpusConfig(seed=42, n_hosts=6, base_pages=30)
    seeds = seed_urls(cfg, 4)
    outs = {}
    for fmt in ("parquet", "lance"):
        out = str(tmp_path / fmt)
        CrawlRun(cfg, seeds, EngineConfig(
            max_links=120, max_waves=4, out_dir=out, n_seen_shards=2,
            n_pol_shards=2, fetch_concurrency=2,
            storage_format=fmt)).run()
        frames = []
        for d in sorted(glob.glob(f"{out}/wave=*/pages")):
            frames.append(read_table(
                d, columns=["doc_id", "url", "depth", "ord"]).to_pandas())
        outs[fmt] = (pd.concat(frames)
                     .sort_values(["depth", "ord"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(outs["parquet"], outs["lance"])
    # Lance-side maintenance: datasets are versioned; compaction keeps the
    # latest version readable
    first = sorted(glob.glob(str(tmp_path / "lance" / "wave=*" / "pages")))[0]
    ds = lance.dataset(first)
    assert ds.version >= 1


def test_lance_request_fails_loudly_when_absent(tmp_path):
    """format='lance' must never silently degrade to parquet."""
    if LANCE:
        pytest.skip("lance present — covered by the end-to-end gate above")
    with pytest.raises(ImportError, match="pylance"):
        resolve_format("lance")

    # the engine surfaces the same error instead of writing parquet
    from thecrowler_ray.pipelines.crawl import CrawlRun, EngineConfig
    from thecrowler_ray.sources.synthweb import CorpusConfig, seed_urls

    cfg = CorpusConfig(seed=42, n_hosts=3, base_pages=10)
    run = CrawlRun(cfg, seed_urls(cfg, 2), EngineConfig(
        max_links=20, max_waves=1, out_dir=str(tmp_path / "x"),
        n_seen_shards=2, n_pol_shards=2, fetch_concurrency=1,
        storage_format="lance"))
    with pytest.raises(ImportError, match="lance"):
        run.run()
    assert not glob.glob(str(tmp_path / "x" / "wave=*/pages/*.parquet"))


def test_auto_resolution_matches_environment():
    assert resolve_format("auto") == ("lance" if LANCE else "parquet")
