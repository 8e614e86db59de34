#!/usr/bin/env python
"""Benchmark harness.

Headline: the crawl engine (URLs fetched+deduped/sec) on a deterministic
synthetic frontier scaled to $GRAFT_SF_DIR's scale factor, under a fixed
politeness budget — the BASELINE.json metric. Plus per-query timings for the
operator battery over the sf tables.

    python bench.py                 # battery line + compact headline line
    python bench.py --quick         # battery limited to the driver's
                                    # 50-query window (fast iteration)
    python bench.py --scaling       # same crawl at two CPU counts in fresh
                                    # processes → throughputs + efficiency

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1), RAY_GRAFT_CPUS (default
32), GRAFT_CRAWL_ONLY=1 (skip the query battery — used by --scaling).

Clean-process headline: the crawl bench runs FIRST (before any battery
query) after one small untimed warm-up crawl, so the headline never shares
warm caches with the battery; `GRAFT_CRAWL_ONLY=1 python bench.py` is the
documented fully-isolated mode (what --scaling uses per child process).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def crawl_config(sf: float):
    """Deterministic corpus + engine config scaled to the sf (~250k pages
    per unit sf; ~sqrt-N hosts so politeness doesn't serialize)."""
    from thecrowler_ray.pipelines.crawl import EngineConfig
    from thecrowler_ray.sources.synthweb import CorpusConfig

    target_pages = max(
        2_000, int(float(os.environ.get("GRAFT_PAGES_PER_SF", "1000000")) * sf)
    )
    n_hosts = max(20, int(900 * sf**0.5))
    denom = sum((i + 1) ** -1.1 for i in range(n_hosts))
    base_pages = max(50, int(target_pages / denom))
    # pages sized like real web pages (~35-45 KB → honest parse cost) and a
    # wider tree (branch 5) so BFS depth — and with it the per-wave fixed
    # cost — stays small relative to fetch/parse compute
    corpus = CorpusConfig(
        seed=42,
        n_hosts=n_hosts,
        base_pages=base_pages,
        branch=5,
        filler_words=1600,
    )
    engine = EngineConfig(
        max_links=target_pages,
        max_waves=30,
        # fixed politeness budget (north rule): generous enough that the
        # host-diverse frontier, not the budget, bounds throughput
        politeness_rate=6_000,
        politeness_capacity=12_000,
        n_seen_shards=8,
        n_pol_shards=8,
        fetch_batch_size=48,
        seen_log2_buckets=16,
        out_dir="/tmp/crowler_ray/bench",
        run_id=f"bench-sf{sf}",
    )
    return corpus, engine


def run_crawl_bench(sf: float) -> dict:
    import dataclasses

    from thecrowler_ray.pipelines.crawl import CrawlRun
    from thecrowler_ray.sources.synthweb import CorpusConfig, seed_urls

    # untimed warm-up: spin up Ray workers / object store / import state so
    # the timed run measures the pipeline, not process warm-up
    warm_corpus = CorpusConfig(seed=41, n_hosts=20, base_pages=120, branch=5)
    warm_engine_kw = dict(
        max_links=1500, max_waves=5, out_dir="/tmp/crowler_ray/bench_warm",
        n_seen_shards=8, n_pol_shards=8, seen_log2_buckets=12,
    )
    from thecrowler_ray.pipelines.crawl import EngineConfig

    shutil.rmtree("/tmp/crowler_ray/bench_warm", ignore_errors=True)
    CrawlRun(
        warm_corpus, seed_urls(warm_corpus, 20), EngineConfig(**warm_engine_kw)
    ).run()

    corpus, engine = crawl_config(sf)
    seeds = seed_urls(corpus, corpus.n_hosts)
    # best of 2 identical runs → steady-state number (local-mode Ray has
    # noticeable first-run scheduling jitter)
    best = None
    repeats = int(os.environ.get("GRAFT_BENCH_REPEATS", "2"))
    for attempt in range(repeats):
        shutil.rmtree(engine.out_dir, ignore_errors=True)
        run = CrawlRun(corpus, seeds, engine)
        summary = run.run()
        if best is None or summary["elapsed_sec"] < best["elapsed_sec"]:
            best = summary
    return {
        "elapsed_sec": round(best["elapsed_sec"], 3),
        "total_fetched": best["total_fetched"],
        "seen_total": best["seen_total"],
        "urls_per_sec": round(best["urls_per_sec"], 1),
        "waves": best["waves"],
        "corpus_pages": corpus.total_pages(),
    }


def run_queries(sf_dir: str, limit: int | None = None) -> dict:
    import __ray_entry__ as entrymod

    timings: dict[str, float] = {}
    items = list(entrymod.queries().items())
    if limit is not None:
        items = items[:limit]
    for name, fn in items:
        t0 = time.perf_counter()
        try:
            res = fn(sf_dir)
            # consume lazily-built results so timing covers execution
            if hasattr(res, "count"):
                res.count()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # pragma: no cover
            timings[name] = -1.0
            print(f"# query {name} failed: {e}", file=sys.stderr)
        # drop the reference so the query's materialized blocks free
        # BEFORE the next query runs (refcounting suffices; a per-query
        # gc.collect() measured as churn, not a win)
        res = None
    return timings


def calibrate_cpu(procs: int, iters: int = 600_000) -> float:
    """Per-process md5 throughput (Mops) at `procs` workers — measures what
    the (shared, noisy) host actually delivers right now. Used to normalize
    the two scaling measurements for machine drift between their windows."""
    import multiprocessing as mp

    t0 = time.perf_counter()
    with mp.get_context("spawn").Pool(procs) as pool:
        pool.map(_calib_work, [iters] * procs)
    dt = time.perf_counter() - t0
    return procs * iters / dt / 1e6 / procs


def _calib_work(n):
    import hashlib

    h = b"x"
    for _ in range(n):
        h = hashlib.md5(h).digest()
    return h


def warm_cache(sf_dir: str) -> None:
    import pyarrow.parquet as pq

    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            pq.read_table(path)


def main() -> None:
    if "--scaling" in sys.argv:
        # N and 4N. The default pair is 2→8: measured with a pure
        # multiprocessing benchmark (BASELINE.md), this sandbox's CPUs scale
        # linearly up to ~8-16 workers but only ~2.6x from 8→32 — wall-clock
        # efficiency at 8→32 is hardware-capped at ~0.65 before any pipeline
        # overhead. Override with GRAFT_SCALE_LEVELS="8,32" to see that.
        lo, hi = (
            int(x) for x in os.environ.get("GRAFT_SCALE_LEVELS", "4,16").split(",")
        )
        # interleave the levels (lo,hi,lo,hi,...): adjacent pairs share a
        # drift window on this noisy host, so per-pair efficiency is far
        # more stable than two monolithic blocks; report the median pair
        # raw + calibrated (per-CPU md5 throughput measured around each
        # run). GRAFT_SCALE_ROUNDS=R gives 2R-1 adjacent pairs (default 3
        # rounds → 5 pairs, the median-of-5 evidence protocol).
        rounds = int(os.environ.get("GRAFT_SCALE_ROUNDS", "3"))
        order = [lo, hi] * rounds
        runs = []
        for n in order:
            env = dict(
                os.environ,
                RAY_GRAFT_CPUS=str(n),
                GRAFT_CRAWL_ONLY="1",
                GRAFT_PAGES_PER_SF=os.environ.get(
                    "GRAFT_PAGES_PER_SF", "600000"
                ),
                GRAFT_BENCH_REPEATS=os.environ.get("GRAFT_BENCH_REPEATS", "1"),
            )
            s_before = calibrate_cpu(n)
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                capture_output=True,
                text=True,
                check=True,
            ).stdout
            s_after = calibrate_cpu(n)
            runs.append(
                {
                    "n": n,
                    "speed": (s_before + s_after) / 2,
                    "res": json.loads(out.strip().splitlines()[-1]),
                }
            )
        pairs = []
        for a, b in zip(runs, runs[1:]):
            r_lo, r_hi = (a, b) if a["n"] == lo else (b, a)
            t_lo, t_hi = r_lo["res"]["value"], r_hi["res"]["value"]
            pairs.append(
                {
                    "raw": (t_lo / t_hi) / (hi / lo),
                    "calibrated": ((t_lo * r_lo["speed"]) / (t_hi * r_hi["speed"]))
                    / (hi / lo),
                }
            )
        pairs_raw = sorted(p["raw"] for p in pairs)
        pairs_cal = sorted(p["calibrated"] for p in pairs)
        best_lo = min(r["res"]["value"] for r in runs if r["n"] == lo)
        best_hi = min(r["res"]["value"] for r in runs if r["n"] == hi)
        print(
            json.dumps(
                {
                    "metric": "crawl_scaling",
                    f"sec_{lo}": best_lo,
                    f"sec_{hi}": best_hi,
                    f"urls_per_sec_{lo}": max(
                        r["res"]["crawl"]["urls_per_sec"] for r in runs if r["n"] == lo
                    ),
                    f"urls_per_sec_{hi}": max(
                        r["res"]["crawl"]["urls_per_sec"] for r in runs if r["n"] == hi
                    ),
                    "scaling_efficiency": round(pairs_raw[len(pairs_raw) // 2], 3),
                    "scaling_efficiency_calibrated": round(
                        pairs_cal[len(pairs_cal) // 2], 3
                    ),
                    "pair_efficiencies_raw": [round(p["raw"], 3) for p in pairs],
                    "pair_efficiencies_calibrated": [
                        round(p["calibrated"], 3) for p in pairs
                    ],
                    "n_pairs": len(pairs),
                    "sf": sf_of(SF_DIR),
                }
            )
        )
        return

    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sf = sf_of(SF_DIR)
    warm_cache(SF_DIR)
    crawl = run_crawl_bench(sf)
    limit = 50 if "--quick" in sys.argv else None
    queries = (
        {}
        if os.environ.get("GRAFT_CRAWL_ONLY")
        else run_queries(SF_DIR, limit=limit)
    )
    # Full per-query timings go on a PRECEDING stdout line + a sidecar file;
    # the LAST line is a compact headline that fits a bounded tail-capture
    # window (BENCH_r03 outgrew it and recorded parsed=null).  The headline
    # keeps the driver-contract keys (metric/value/unit/queries/sf/num_cpus)
    # with `queries` trimmed to the slowest 10 — the full battery lives in
    # the "query_battery" line above and in BENCH_QUERIES.json.
    if queries:
        print(json.dumps({"metric": "query_battery", "queries": queries}))
        try:
            sidecar = os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "BENCH_QUERIES.json"
            )
            with open(sidecar, "w") as f:
                json.dump(
                    {"sf": sf, "num_cpus": NUM_CPUS, "queries": queries}, f
                )
        except OSError:
            pass
    slowest = dict(
        sorted(queries.items(), key=lambda kv: -kv[1])[:10]
    )
    print(
        json.dumps(
            {
                "metric": "crawl_urls_fetched_deduped_sec",
                "value": crawl["elapsed_sec"],
                "unit": "sec",
                "queries": slowest,
                "queries_total_sec": round(sum(queries.values()), 1),
                "queries_count": len(queries),
                "queries_full": "preceding query_battery line / BENCH_QUERIES.json",
                "sf": sf,
                "num_cpus": NUM_CPUS,
                "crawl": crawl,
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
