"""BFS crawl driver — Ray Data wave loop implementing ENGINE_SPEC.md.

The reference's depth loop (``pkg/crawler/crawler.go:415-499``: jobs channel,
workers, barrier, newLinks → allLinks with MaxLinks truncation) becomes a
driver loop over Datasets; each wave is:

    frontier ──groupby(pshard)──► politeness admission (actor state)
      admitted ──map_batches(FetchParse actor pool)──► pages parquet (wave dir)
      pages(links cols only) ──explode+skip-filter──► candidates
      candidates ──groupby(kbucket)──► wave-local first-win dedup
      ──map_batches(seen anti-join via cuckoo shards)──► new URLs
      ──sort(packed).limit(budget)──► dense re-rank ──► next frontier
      ∪ deferred rows → pending; checkpoint (frontier, seen shards,
      politeness state, metrics + lineage)

Scale notes (10^10 frontier):
- pages are written to parquet ONCE per wave and links re-read with column
  pruning — the heavy span columns never re-enter the pipeline;
- the only all-to-all exchanges per wave are the key-bucket dedup groupby
  and the ordering sort, both over slim frontier rows (≤ max_links);
- the seen anti-join is shuffle-free (per-batch RPC fan-out to shard
  actors, SURVEY.md J3);
- fetch/parse — the expensive stage — is never host-keyed, so hot-host skew
  cannot serialize it; admission is host-keyed but O(row) cheap, and the
  dedup key-bucket hash is uniform by construction (explicit skew strategy,
  SURVEY.md §7.4/§7.5).
"""

from __future__ import annotations

import json
import os
import re
import time
from dataclasses import asdict, dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..ops.rank import with_dense_rank
from ..sources.synthweb import CorpusConfig, robots_disallow
from ..stages.fetch import FetchParse
from ..stages.politeness import PolitenessPool
from ..stages.seen import SeenShardPool, key_u64
from ..urls import (
    combine_urls,
    host_hash,
    host_of,
    is_url_valid,
    skip_url,
    url_key_hex,
)

_PACK_SHIFT = 20  # packed = parent_rank << 20 | link_idx  (out-degree < 2^20)

FRONTIER_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("key", pa.string()),
        ("host", pa.string()),
        ("depth", pa.int32()),
        ("ord", pa.int64()),
        ("src_url", pa.string()),
        ("restricted", pa.int32()),
        ("pshard", pa.int32()),
    ]
)


@dataclass
class EngineConfig:
    max_links: int = 10_000
    max_waves: int = 50
    politeness_rate: int = 10**9
    politeness_capacity: int = 10**9
    check_robots: bool = False
    unwanted: list[str] = field(default_factory=list)
    user_patterns: list[str] = field(default_factory=list)
    n_seen_shards: int = 8
    seen_log2_buckets: int = 14
    seen_exact: bool = True
    n_pol_shards: int = 8
    n_key_buckets: int = 64
    fetch_concurrency: int = 4
    fetch_batch_size: int = 256
    fetch_num_cpus: float = 1.0
    out_dir: str = "/tmp/crowler_ray/run"
    run_id: str = "run0"


class LinkExplodeFilter:
    """pages(url, ord, src_url, restricted, links) → candidate frontier rows.

    Explode is vectorized (pyarrow list_flatten / list_parent_indices); the
    resolve + skip chain runs per link string with regexes compiled once per
    actor (reference compiles unwanted regexes once per pipeline,
    ``pkg/crawler/crawler.go:228-241``).
    """

    def __init__(self, cfg: EngineConfig):
        self.cfg = cfg
        self.unwanted = [re.compile(p) for p in cfg.unwanted]
        self.n_key_buckets = cfg.n_key_buckets

    def __call__(self, batch: pa.Table) -> pa.Table:
        links = batch["links"]
        if isinstance(links, pa.ChunkedArray):
            links = links.combine_chunks()
        flat = pc.list_flatten(links)
        parents = pc.list_parent_indices(links)
        out = {
            "url": [], "key": [], "host": [], "packed": [],
            "src_url": [], "restricted": [], "kbucket": [],
        }
        if len(flat) == 0:
            return pa.table(
                {
                    "url": pa.array([], pa.string()),
                    "key": pa.array([], pa.string()),
                    "host": pa.array([], pa.string()),
                    "packed": pa.array([], pa.int64()),
                    "src_url": pa.array([], pa.string()),
                    "restricted": pa.array([], pa.int32()),
                    "kbucket": pa.array([], pa.int32()),
                }
            )
        page_urls = batch["url"].to_pylist()
        ords = batch["ord"].to_pylist()
        srcs = batch["src_url"].to_pylist()
        restr = batch["restricted"].to_pylist()
        hrefs = flat.field("href").to_pylist()
        link_idx = flat.field("link_idx").to_pylist()
        par = parents.to_pylist()
        for href, j, pi in zip(hrefs, link_idx, par):
            link = href
            if link.startswith("/"):
                link = combine_urls(page_urls[pi], link)
            if skip_url(
                link,
                srcs[pi],
                restr[pi],
                unwanted=self.unwanted,
                user_patterns=self.cfg.user_patterns,
            ):
                continue
            if not is_url_valid(link if "://" in link else "http://" + link):
                continue
            key = url_key_hex(link)
            out["url"].append(link)
            out["key"].append(key)
            out["host"].append(host_of(link))
            out["packed"].append((ords[pi] << _PACK_SHIFT) | min(j, (1 << _PACK_SHIFT) - 1))
            out["src_url"].append(srcs[pi])
            out["restricted"].append(restr[pi])
            out["kbucket"].append(int(key[:8], 16) % self.n_key_buckets)
        return pa.table(
            {
                "url": pa.array(out["url"], pa.string()),
                "key": pa.array(out["key"], pa.string()),
                "host": pa.array(out["host"], pa.string()),
                "packed": pa.array(out["packed"], pa.int64()),
                "src_url": pa.array(out["src_url"], pa.string()),
                "restricted": pa.array(out["restricted"], pa.int32()),
                "kbucket": pa.array(out["kbucket"], pa.int32()),
            }
        )


def _dedup_bucket(g):
    """First-win within a key bucket: min packed per key (vectorized)."""
    return g.sort_values("packed", kind="mergesort").drop_duplicates(
        "key", keep="first"
    )


class CrawlRun:
    def __init__(
        self,
        corpus_cfg: CorpusConfig,
        seeds: list[dict],
        cfg: EngineConfig,
    ):
        self.corpus_cfg = corpus_cfg
        self.seeds = seeds
        self.cfg = cfg
        self.seen = SeenShardPool(
            cfg.n_seen_shards, cfg.seen_log2_buckets, cfg.seen_exact
        )
        robots_fn = (
            (lambda host, _c=corpus_cfg: robots_disallow(_c, host))
            if cfg.check_robots
            else None
        )
        self.politeness = PolitenessPool(
            cfg.n_pol_shards,
            cfg.politeness_rate,
            cfg.politeness_capacity,
            cfg.check_robots,
            robots_fn,
        )
        self.total_fetched = 0
        self.wave = 0
        self.metrics: list[dict] = []

    # ---- seeds ----------------------------------------------------------
    def _seed_frontier(self) -> pa.Table:
        rows = {n: [] for n in FRONTIER_SCHEMA.names}
        seen_keys: set[str] = set()
        rank = 0
        for s in sorted(self.seeds, key=lambda s: s["source_id"]):
            url = s["url"]
            if not is_url_valid(url):
                continue
            key = url_key_hex(url)
            if key in seen_keys:
                continue
            seen_keys.add(key)
            host = host_of(url)
            rows["url"].append(url)
            rows["key"].append(key)
            rows["host"].append(host)
            rows["depth"].append(0)
            rows["ord"].append(rank)
            rows["src_url"].append(url)
            rows["restricted"].append(int(s.get("restricted", 4)))
            rows["pshard"].append(host_hash(host, self.cfg.n_pol_shards))
            rank += 1
        table = pa.Table.from_pydict(rows, schema=FRONTIER_SCHEMA)
        # register seeds in the seen set
        keys = key_u64(table["key"])
        self.seen.insert_batch(keys, table["host"].to_pylist())
        return table

    # ---- wave loop ------------------------------------------------------
    def run(self, pending=None) -> dict:
        cfg = self.cfg
        os.makedirs(cfg.out_dir, exist_ok=True)
        ctx = ray.data.DataContext.get_current()
        ctx.execution_options.preserve_order = True
        ctx.enable_progress_bars = False

        if pending is None:
            pending = ray.data.from_arrow(self._seed_frontier()).materialize()
        t0 = time.perf_counter()

        while (
            pending.count() > 0
            and self.total_fetched < cfg.max_links
            and self.wave < cfg.max_waves
        ):
            wave = self.wave
            wave_dir = os.path.join(cfg.out_dir, f"wave={wave}")
            m = {"wave": wave}

            # 2. admission (host-sharded actor state)
            admission = (
                pending.groupby("pshard")
                .map_groups(
                    self.politeness.admit_group_fn(wave), batch_format="pandas"
                )
                .materialize()
            )
            admitted = admission.map_batches(
                lambda t: t.filter(pc.equal(t["admit"], 1)),
                batch_format="pyarrow",
            ).materialize()
            deferred = admission.map_batches(
                lambda t: t.filter(pc.equal(t["admit"], 0)).drop_columns(["admit"]),
                batch_format="pyarrow",
            ).materialize()
            n_admit = admitted.count()
            n_defer = deferred.count()
            m["robots_dropped"] = admission.count() - n_admit - n_defer
            m["deferred"] = n_defer

            if n_admit == 0:
                m["fetched"] = 0
                self.metrics.append(m)
                self._checkpoint(wave_dir, deferred, m)
                pending = deferred
                self.wave += 1
                if cfg.politeness_rate == 0:
                    break
                continue

            # 3. fetch + parse → pages parquet (single pass, streamed)
            pages_dir = os.path.join(wave_dir, "pages")
            (
                admitted.drop_columns(["admit", "pshard"])
                .map_batches(
                    FetchParse,
                    fn_constructor_args=(self.corpus_cfg,),
                    batch_format="pyarrow",
                    batch_size=cfg.fetch_batch_size,
                    concurrency=cfg.fetch_concurrency,
                    num_cpus=cfg.fetch_num_cpus,
                )
                .write_parquet(pages_dir)
            )
            pages_meta = ray.data.read_parquet(pages_dir, columns=["doc_id"])
            n_fetched = pages_meta.count()
            self.total_fetched += n_fetched
            m["fetched"] = n_fetched
            m["errors"] = n_admit - n_fetched

            # 4. truncation budget
            budget = max(0, cfg.max_links - self.total_fetched - n_defer)

            # 5-7. links → candidates → dedup → seen anti-join
            next_frontier = None
            if budget > 0:
                links_ds = ray.data.read_parquet(
                    pages_dir,
                    columns=["url", "ord", "src_url", "restricted", "links"],
                )
                candidates = links_ds.map_batches(
                    LinkExplodeFilter(cfg), batch_format="pyarrow"
                )
                deduped = candidates.groupby("kbucket").map_groups(
                    _dedup_bucket, batch_format="pandas"
                )
                fresh = deduped.map_batches(
                    self.seen.filter_new_stage("key", "host"),
                    batch_format="pyarrow",
                )
                ordered = (
                    fresh.sort("packed").limit(budget).materialize()
                )
                ranked = with_dense_rank(ordered, "rank")
                n_pol = cfg.n_pol_shards

                def _to_frontier(batch: pa.Table, _wave=wave, _n_pol=n_pol) -> pa.Table:
                    hosts = batch["host"].to_pylist()
                    return pa.table(
                        {
                            "url": batch["url"],
                            "key": batch["key"],
                            "host": batch["host"],
                            "depth": pa.array(
                                np.full(len(batch), _wave + 1, dtype=np.int32)
                            ),
                            "ord": batch["rank"],
                            "src_url": batch["src_url"],
                            "restricted": batch["restricted"],
                            "pshard": pa.array(
                                [host_hash(h, _n_pol) for h in hosts], pa.int32()
                            ),
                        }
                    )

                next_frontier = (
                    ranked.map_batches(_to_frontier, batch_format="pyarrow")
                    .map_batches(
                        self.seen.insert_stage("key", "host"),
                        batch_format="pyarrow",
                    )
                    .materialize()
                )
                m["new_frontier"] = next_frontier.count()
            else:
                m["new_frontier"] = 0

            # 8. next pending = deferred ∪ new frontier
            if next_frontier is not None and m["new_frontier"] > 0:
                if n_defer > 0:
                    pending = deferred.union(next_frontier).materialize()
                else:
                    pending = next_frontier
            else:
                pending = deferred

            self.metrics.append(m)
            self._checkpoint(wave_dir, pending, m)
            self.wave += 1

        elapsed = time.perf_counter() - t0
        summary = {
            "run_id": cfg.run_id,
            "waves": self.wave,
            "total_fetched": self.total_fetched,
            "seen_total": self.seen.total_count(),
            "elapsed_sec": elapsed,
            "urls_per_sec": self.total_fetched / elapsed if elapsed > 0 else 0.0,
            "metrics": self.metrics,
            "out_dir": cfg.out_dir,
        }
        with open(os.path.join(cfg.out_dir, "summary.json"), "w") as f:
            json.dump(summary, f, indent=1)
        return summary

    # ---- checkpointing --------------------------------------------------
    def _checkpoint(self, wave_dir: str, pending, wave_metrics: dict) -> None:
        os.makedirs(wave_dir, exist_ok=True)
        frontier_dir = os.path.join(wave_dir, "frontier")
        if pending.count() > 0:
            pending.write_parquet(frontier_dir)
        else:
            os.makedirs(frontier_dir, exist_ok=True)
        seen_dir = os.path.join(wave_dir, "seen")
        os.makedirs(seen_dir, exist_ok=True)
        for i, blob in enumerate(self.seen.snapshot_all()):
            with open(os.path.join(seen_dir, f"shard-{i}.npz"), "wb") as f:
                f.write(blob)
        manifest = {
            "run_id": self.cfg.run_id,
            "wave": wave_metrics["wave"],
            "parent_wave": wave_metrics["wave"] - 1,
            "total_fetched": self.total_fetched,
            "metrics": wave_metrics,
            "politeness": self.politeness.states(),
            "config": asdict(self.cfg),
            "complete": True,
        }
        with open(os.path.join(wave_dir, "manifest.json"), "w") as f:
            json.dump(manifest, f, indent=1)

    @classmethod
    def resume(
        cls, corpus_cfg: CorpusConfig, seeds: list[dict], cfg: EngineConfig
    ) -> "CrawlRun | None":
        """Load the last complete wave's checkpoint and return a primed run
        (caller then calls ``run_resumed()``)."""
        waves = []
        if os.path.isdir(cfg.out_dir):
            for name in os.listdir(cfg.out_dir):
                if name.startswith("wave="):
                    mf = os.path.join(cfg.out_dir, name, "manifest.json")
                    if os.path.exists(mf):
                        with open(mf) as f:
                            man = json.load(f)
                        if man.get("complete"):
                            waves.append((int(name.split("=")[1]), man))
        if not waves:
            return None
        last_wave, man = max(waves, key=lambda t: t[0])
        run = cls(corpus_cfg, seeds, cfg)
        run.wave = last_wave + 1
        run.total_fetched = man["total_fetched"]
        seen_dir = os.path.join(cfg.out_dir, f"wave={last_wave}", "seen")
        blobs = []
        for i in range(cfg.n_seen_shards):
            with open(os.path.join(seen_dir, f"shard-{i}.npz"), "rb") as f:
                blobs.append(f.read())
        run.seen.restore_all(blobs)
        run.politeness.restore_all(man["politeness"])
        run._resume_frontier = os.path.join(
            cfg.out_dir, f"wave={last_wave}", "frontier"
        )
        return run

    def run_resumed(self) -> dict:
        """Continue from a checkpoint loaded by ``resume()``."""
        frontier_dir = getattr(self, "_resume_frontier", None)
        if frontier_dir is None:
            return self.run()
        files = (
            [f for f in os.listdir(frontier_dir) if f.endswith(".parquet")]
            if os.path.isdir(frontier_dir)
            else []
        )
        if files:
            pending = ray.data.read_parquet(frontier_dir).materialize()
        else:
            pending = ray.data.from_arrow(
                pa.Table.from_pydict(
                    {n: [] for n in FRONTIER_SCHEMA.names}, schema=FRONTIER_SCHEMA
                )
            )
        return self.run(pending)
