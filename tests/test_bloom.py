"""Bloom seen-filter (state/bloom.py): no false negatives, FP near
theory, snapshot round-trip, SeenShard hosting."""

from __future__ import annotations

import numpy as np
import pytest

from thecrowler_ray.state.bloom import BloomFilter


def test_no_false_negatives_and_fp_near_theory():
    rng = np.random.default_rng(3)
    f = BloomFilter(log2_bits=16, k=7, seed=1)
    inserted = rng.integers(0, 2**63, size=4000, dtype=np.uint64)
    f.insert_many(inserted)
    # every inserted key answers present — always
    assert f.contains_many(inserted).all()
    # FP rate on fresh keys tracks (1-e^{-kn/m})^k within a loose band
    probe = rng.integers(0, 2**63, size=20_000, dtype=np.uint64)
    probe = probe[~np.isin(probe, inserted)]
    fp = float(f.contains_many(probe).mean())
    theory = f.fp_rate_estimate()
    assert fp <= max(4 * theory, 0.02)
    assert theory > 0


def test_check_and_insert_first_win_semantics():
    f = BloomFilter(log2_bits=14, seed=2)
    keys = np.array([5, 7, 5, 9, 7], dtype=np.uint64)
    new = f.check_and_insert(keys)  # True = NEW (SeenShard polarity)
    assert new.tolist() == [True, True, False, True, False]
    assert f.check_and_insert(np.array([5, 11], dtype=np.uint64)).tolist() \
        == [False, True]


def test_snapshot_roundtrip():
    f = BloomFilter(log2_bits=12, k=5, seed=9)
    keys = np.arange(100, dtype=np.uint64) * np.uint64(2654435761)
    f.insert_many(keys)
    g = BloomFilter.loads(f.dumps())
    assert g.log2_bits == 12 and g.k == 5 and g.seed == 9
    assert g.n_inserted == 100
    assert g.contains_many(keys).all()
    assert (g.bits == f.bits).all()
    with pytest.raises(ValueError):
        BloomFilter.loads(b"XXXX" + b"\0" * 32)


def test_seen_shard_hosts_bloom(ray_session):
    from thecrowler_ray.stages.seen import SeenShardPool

    pool = SeenShardPool(n_shards=2, log2_buckets=12, filter_kind="bloom")
    keys = np.arange(500, dtype=np.uint64) * np.uint64(0x9E3779B9)
    new1 = pool.check_and_insert_batch(keys)
    assert new1.all()  # empty filter: everything is new
    new2 = pool.check_and_insert_batch(keys)
    assert not new2.any()  # second pass: everything seen
    stats = pool.stats()
    assert sum(s["count"] for s in stats) == 500
    assert all("fp_rate" in s for s in stats)


def test_bad_params_rejected():
    with pytest.raises(ValueError):
        BloomFilter(log2_bits=2)
    with pytest.raises(ValueError):
        BloomFilter(k=0)


def test_engine_runs_with_bloom_filter(ray_session, tmp_path):
    """The crawl engine on the approximate bloom path: at this corpus size
    and filter capacity the FP probability is ~0, so the fetched set must
    equal the exact-cuckoo run's."""
    from thecrowler_ray.pipelines.crawl import CrawlRun, EngineConfig
    from thecrowler_ray.sources.synthweb import CorpusConfig, seed_urls

    corpus = CorpusConfig(seed=7, n_hosts=6, base_pages=40, branch=3)
    seeds = seed_urls(corpus, 6)

    def run(kind, sub):
        cfg = EngineConfig(
            max_links=400, max_waves=6, n_seen_shards=2, n_pol_shards=2,
            seen_log2_buckets=14, seen_filter_kind=kind,
            out_dir=str(tmp_path / sub), run_id=f"bloom-{sub}")
        return CrawlRun(corpus, seeds, cfg).run()

    a = run("cuckoo", "c")
    b = run("bloom", "b")
    assert b["total_fetched"] == a["total_fetched"]
    assert b["seen_total"] == a["seen_total"]
