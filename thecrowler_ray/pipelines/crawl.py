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

import hashlib
import json
import os
import re
import time
from dataclasses import asdict, dataclass, field
from urllib.parse import urlparse as _urlparse

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
    get_domain_parts,
    host_hash,
    host_of,
    is_url_valid,
    skip_url,
    url_key_hex,
)

_PACK_SHIFT = 20  # packed = parent_rank << 20 | link_idx  (out-degree < 2^20)

# -- vectorized skip-chain helpers (LinkExplodeFilter) ------------------------
# host / domain-tail extraction equivalent to urlparse().hostname +
# get_domain_parts on scheme-bearing URLs without brackets (bracketed
# authorities and whitespace-padded hrefs take the per-row path)
_HOST_RE = r"^[a-z][a-z0-9+.\-]*://(?:[^/?#]*@)?(?P<g>[^/:?#]*)"
_SLD_RE = r"(?P<g>[^.]*\.[^.]*)$"
_TLD_RE = r"(?P<g>[^.]*)$"
_WEB_SCHEME_PREFIXES = tuple(
    s + "://" for s in ("http", "https", "ws", "wss", "ftp", "ftps"))


def _re2_ok(pattern: str) -> bool:
    """True when Arrow's RE2 accepts the pattern (no lookaround/backrefs)."""
    try:
        pc.match_substring_regex(pa.array(["x"]), pattern)
        return True
    except pa.ArrowInvalid:
        return False


def _extract_regex(arr, pattern):
    """→ (values object-ndarray, matched bool-ndarray); "" where no match."""
    g = pc.extract_regex(arr, pattern).field("g")
    matched = pc.is_valid(g).to_numpy(zero_copy_only=False)
    vals = pc.fill_null(g, "").to_numpy(zero_copy_only=False).astype(object)
    return vals, matched


def _normalize_urls_arrow(arr) -> np.ndarray:
    """Arrow twin of urls.normalize_url (fixed-point strip+rstrip('/'),
    then lower) — the seen-key canonicalization, batched."""
    prev = None
    cur = arr
    while prev is None or not pc.all(pc.equal(cur, prev)).as_py():
        prev = cur
        cur = pc.utf8_rtrim(pc.utf8_trim_whitespace(cur), characters="/")
    return pc.utf8_lower(cur).to_numpy(zero_copy_only=False)

CANDIDATE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("key", pa.string()),
        ("host", pa.string()),
        ("packed", pa.int64()),
        ("src_url", pa.string()),
        ("restricted", pa.int32()),
        ("cfg_idx", pa.int32()),
        ("score", pa.int64()),
        ("kbucket", pa.int32()),
    ]
)

FRONTIER_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("key", pa.string()),
        ("host", pa.string()),
        ("depth", pa.int32()),
        ("ord", pa.int64()),
        ("src_url", pa.string()),
        ("restricted", pa.int32()),
        ("cfg_idx", pa.int32()),
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
    # optional deterministic link-score fn(url)->int: the priority frontier
    # (north star: "depth + link-score ordering"). Within a wave, candidates
    # order by (score DESC, discovery ASC) before truncation + re-rank;
    # depth-major BFS order is unchanged. None = pure discovery order (the
    # reference default, O2).
    link_score_fn: object = None
    # browser action rules (M17) executed against each fetched page's DOM;
    # discovered navigations join the frontier after static links
    action_rules: list = None
    unwanted: list[str] = field(default_factory=list)
    user_patterns: list[str] = field(default_factory=list)
    n_seen_shards: int = 8
    seen_log2_buckets: int = 14
    seen_exact: bool = True
    # "cuckoo" (exact-capable, the oracle-pinned default) or "bloom" (the
    # north rule's approximate alternative: fixed memory, bounded FP rate
    # — a crawl may skip up to FP-rate fraction of genuinely-new URLs)
    seen_filter_kind: str = "cuckoo"
    # exact-sidecar spill: directory for per-shard sorted key runs (None =
    # all-RAM). At 10^10 keys / 256 shards each shard holds spill_threshold
    # keys resident (8 B each) and binary-searches the mmap'd remainder.
    seen_spill_dir: str | None = None
    seen_spill_threshold: int = 4_000_000
    n_pol_shards: int = 8
    n_key_buckets: int = 64
    fetch_concurrency: int = 4
    fetch_batch_size: int = 256
    fetch_num_cpus: float = 1.0
    fetch_actors: bool = False  # True: actor pool (real browser sessions);
    # False: stateless tasks (sandbox fetch state is just the corpus seed)
    # Waves whose frontier/candidate row count is at or below this run the
    # frontier bookkeeping (admission split, dedup, ordering, ranking) on the
    # driver — the rows are a few hundred bytes each, so 500k rows ≈ 100 MB.
    # Fetch/parse (the heavy stage) is ALWAYS distributed. Above the
    # threshold every step runs as Dataset ops (groupby/sort) — the 10^10
    # path. Both paths implement ENGINE_SPEC.md identically and both are
    # pinned to the oracle in tests.
    driver_threshold: int = 500_000
    # Big-wave object-store relief (PERF.md "large-wave regime"): waves with
    # at least this many admitted URLs stream pages straight to storage and
    # re-read only the slim link columns for the explode, instead of pinning
    # the heavy span blocks in plasma while the async write drains. Costs a
    # pruned parquet decode; saves peak object-store residency ∝ wave size.
    # Measured (32 CPUs, interleaved A/B): 200k-page crawl with 48k-row
    # waves 161 s → 95 s (1.7×, identical results); at ≤45k-row waves the
    # two paths are within host noise. 0 disables (always share blocks).
    wave_spill_threshold: int = 30_000
    out_dir: str = "/tmp/crowler_ray/run"
    run_id: str = "run0"
    # 'parquet' | 'lance' | 'auto' — the north star materializes page/frontier
    # tables as Lance; 'auto' uses Lance when the library is present (not in
    # this container) and parquet otherwise (thecrowler_ray.storage)
    storage_format: str = "parquet"


class LinkExplodeFilter:
    """pages(url, ord, src_url, restricted, cfg_idx, links) → candidate
    frontier rows.

    Explode is vectorized (pyarrow list_flatten / list_parent_indices); the
    resolve + skip chain runs per link string with regexes compiled once per
    actor (reference compiles unwanted regexes once per pipeline,
    ``pkg/crawler/crawler.go:228-241``). Per-source configs (reference
    CombineConfig, ``crawler.go:124-132``) contribute per-``cfg_idx``
    unwanted regexes and user url_patterns on top of the global ones.
    """

    def __init__(self, cfg: EngineConfig, source_cfgs: list[dict] | None = None):
        self.cfg = cfg
        self.n_key_buckets = cfg.n_key_buckets
        source_cfgs = source_cfgs or []
        base_unwanted = [re.compile(p) for p in cfg.unwanted]
        base_unwanted_raw = list(cfg.unwanted)
        self.unwanted_by_idx = [base_unwanted]
        self.unwanted_raw_by_idx = [base_unwanted_raw]
        self.patterns_by_idx = [list(cfg.user_patterns)]
        for sc in source_cfgs:
            cc = (sc or {}).get("crawling_config", {}) or {}
            extra_raw = list(cc.get("unwanted_urls", []) or [])
            self.unwanted_by_idx.append(
                base_unwanted + [re.compile(p) for p in extra_raw])
            self.unwanted_raw_by_idx.append(base_unwanted_raw + extra_raw)
            pats = (
                ((cc.get("execution_plan") or {}).get("conditions") or {})
                .get("url_patterns")
            )
            self.patterns_by_idx.append(
                list(pats) if pats else list(cfg.user_patterns)
            )
        # cfg indexes whose regexes Arrow's RE2 can't run (Python-only
        # constructs like lookaround/backrefs) take the per-row path
        self._scalar_cis = np.array(
            [ci for ci in range(len(self.unwanted_by_idx))
             if not all(_re2_ok(p) for p in
                        self.unwanted_raw_by_idx[ci]
                        + [q.lstrip("!") for q in self.patterns_by_idx[ci]])],
            dtype=np.int64,
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        links = batch["links"]
        if isinstance(links, pa.ChunkedArray):
            links = links.combine_chunks()
        flat = pc.list_flatten(links)
        parents = pc.list_parent_indices(links)
        if len(flat) == 0:
            return pa.Table.from_pydict(
                {n: [] for n in CANDIDATE_SCHEMA.names}, schema=CANDIDATE_SCHEMA
            )
        page_urls = batch["url"].to_pylist()
        ords = batch["ord"].to_pylist()
        srcs = batch["src_url"].to_pylist()
        restr = batch["restricted"].to_pylist()
        cfgi = (
            batch["cfg_idx"].to_pylist()
            if "cfg_idx" in batch.column_names
            else [0] * len(page_urls)
        )
        # page-level precompute (loop over pages, never over links)
        n_cfg = len(self.unwanted_by_idx)
        bases = np.empty(len(page_urls), dtype=object)
        for i, pu in enumerate(page_urls):
            p = _urlparse(pu)
            bases[i] = f"{p.scheme}://{p.netloc}"
        par = parents.to_numpy()
        href_arr = flat.field("href")
        if isinstance(href_arr, pa.ChunkedArray):
            href_arr = href_arr.combine_chunks()
        link_idx = flat.field("link_idx").to_numpy(zero_copy_only=False)
        # 1. resolve root-relative hrefs against the page URL (vectorized)
        rel = pc.starts_with(href_arr, "/").to_numpy(zero_copy_only=False)
        link0 = href_arr.to_numpy(zero_copy_only=False).astype(object)
        ri = np.nonzero(rel)[0]
        if ri.size:
            link0[ri] = bases[par[ri]] + link0[ri]
        arr0 = pa.array(link0, pa.string())
        arr_s = pc.utf8_trim_whitespace(arr0)
        low = pc.utf8_lower(arr_s)
        restr_l = np.asarray(restr, dtype=np.int64)[par]
        ci_page = np.asarray(
            [c if c < n_cfg else 0 for c in cfgi], dtype=np.int64)
        ci_all = ci_page[par]
        keep = pc.invert(pc.equal(arr_s, "")).to_numpy(zero_copy_only=False)
        # rows the vector chain can't reproduce bit-exactly take the
        # original per-row path: whitespace-padded hrefs (output uses the
        # unstripped URL), restriction levels other than SLD/TLD/none
        # (geturl()-exact compares), bracketed IPv6-ish authorities, and
        # Python-only regex configs
        fallback = keep & (
            ~np.isin(restr_l, (2, 3, 4))
            | pc.invert(pc.equal(arr0, arr_s)).to_numpy(zero_copy_only=False)
            | pc.match_substring(arr_s, "[").to_numpy(zero_copy_only=False)
            | (np.isin(ci_all, self._scalar_cis)
               if self._scalar_cis.size else False)
        )
        vec = keep & ~fallback
        skip = np.zeros(len(link0), dtype=bool)
        # 2. external-link policy, levels 2 (SLD) / 3 (TLD); level 4 = none
        host = None
        for lvl, tail_re in ((2, _SLD_RE), (3, _TLD_RE)):
            m = vec & (restr_l == lvl)
            if not m.any():
                continue
            if host is None:
                hv, hm = _extract_regex(low, _HOST_RE)
                host = np.where(hm, hv, "")
            tv, tm = _extract_regex(pa.array(host, pa.string()), tail_re)
            tail = np.where(tm, tv, host)  # <2 labels → whole host
            src_tail = np.empty(len(page_urls), dtype=object)
            for i, s in enumerate(srcs):
                try:
                    sh = _urlparse(s).hostname or ""
                except ValueError:
                    sh = ""
                src_tail[i] = get_domain_parts(sh.split("."), lvl)
            skip |= m & (tail != src_tail[par])
        # 3. unwanted regexes per config (RE2, checked at __init__)
        for ci, raws in enumerate(self.unwanted_raw_by_idx):
            m = vec & (ci_all == ci)
            if not m.any():
                continue
            for pat in raws:
                skip |= m & pc.match_substring_regex(
                    arr_s, pat).to_numpy(zero_copy_only=False)
        # 4. self-link
        src_np = np.asarray(srcs, dtype=object)[par]
        skip |= vec & (arr_s.to_numpy(zero_copy_only=False) == src_np)
        # 5. user patterns: first match decides (`!` skips), no match skips
        for ci, pats in enumerate(self.patterns_by_idx):
            m = vec & (ci_all == ci)
            if not m.any() or not pats:
                continue
            undecided = m & ~skip
            for pat in pats:
                hit = pc.match_substring_regex(
                    arr_s, pat.lstrip("!")).to_numpy(zero_copy_only=False)
                hit &= undecided
                if pat.startswith("!"):
                    skip |= hit
                undecided &= ~hit
            skip |= undecided
        # 6. validity (web-scheme prefix or scheme-less + a dot, no inner
        # whitespace; non-web schemes take the per-row path)
        ws_bad = pc.match_substring_regex(
            arr_s, "[ \\n\\t]").to_numpy(zero_copy_only=False)
        has_dot = pc.match_substring(low, ".").to_numpy(zero_copy_only=False)
        has_sep = pc.match_substring(low, "://").to_numpy(zero_copy_only=False)
        scheme_ok = np.zeros(len(link0), dtype=bool)
        for s in _WEB_SCHEME_PREFIXES:
            scheme_ok |= pc.starts_with(low, s).to_numpy(zero_copy_only=False)
        valid = ~ws_bad & has_dot & (scheme_ok | ~has_sep)
        odd = np.nonzero(vec & ~skip & has_sep & ~scheme_ok)[0]
        for i in odd:
            li = link0[i]
            valid[i] = is_url_valid(li if "://" in li else "http://" + li)
        ok = vec & ~skip & valid
        # per-row fallback: the original chain, bit-identical
        for i in np.nonzero(fallback)[0]:
            link, pi = link0[i], par[i]
            ci = int(ci_all[i])
            if skip_url(link, srcs[pi], restr[pi],
                        unwanted=self.unwanted_by_idx[ci],
                        user_patterns=self.patterns_by_idx[ci]):
                continue
            if not is_url_valid(link if "://" in link else "http://" + link):
                continue
            ok[i] = True
        # 7. survivors: batch-local first-win pre-dedup (combiner): keeps
        # only the min packed row per key within this batch, shrinking the
        # global dedup groupby's input; min-of-mins preserves first-win
        norm = _normalize_urls_arrow(arr0)
        cap = (1 << _PACK_SHIFT) - 1
        best: dict[str, tuple[int, tuple]] = {}
        for i in np.nonzero(ok)[0]:
            pi = par[i]
            # fallback rows key via the scalar canonicalizer (exact parity
            # on whitespace oddities the Arrow trim defines differently)
            key = (url_key_hex(link0[i]) if fallback[i]
                   else hashlib.sha1(norm[i].encode("utf-8")).hexdigest())
            packed = (ords[pi] << _PACK_SHIFT) | min(int(link_idx[i]), cap)
            cur = best.get(key)
            if cur is None or packed < cur[0]:
                best[key] = (packed,
                             (link0[i], srcs[pi], restr[pi], int(ci_all[i])))
        out = {
            "url": [], "key": [], "host": [], "packed": [],
            "src_url": [], "restricted": [], "cfg_idx": [], "score": [],
            "kbucket": [],
        }
        score_fn = self.cfg.link_score_fn
        for key, (packed, (link, src, rs, ci)) in best.items():
            out["url"].append(link)
            out["key"].append(key)
            out["host"].append(host_of(link))
            out["packed"].append(packed)
            out["src_url"].append(src)
            out["restricted"].append(rs)
            out["cfg_idx"].append(ci)
            out["score"].append(int(score_fn(link)) if score_fn else 0)
            out["kbucket"].append(int(key[:8], 16) % self.n_key_buckets)
        return pa.table(
            {
                "url": pa.array(out["url"], pa.string()),
                "key": pa.array(out["key"], pa.string()),
                "host": pa.array(out["host"], pa.string()),
                "packed": pa.array(out["packed"], pa.int64()),
                "src_url": pa.array(out["src_url"], pa.string()),
                "restricted": pa.array(out["restricted"], pa.int32()),
                "cfg_idx": pa.array(out["cfg_idx"], pa.int32()),
                "score": pa.array(out["score"], pa.int64()),
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
        events_bus=None,
    ):
        # optional EventBus actor handle (state/events.py): wave / completion
        # events mirror the reference's engine events (crawler.go:646-701)
        self.events_bus = events_bus
        self.corpus_cfg = corpus_cfg
        self.seeds = seeds
        self.cfg = cfg
        # per-source config overrides (reference CombineConfig): seeds may
        # carry a `config` JSON/dict with crawling_config.unwanted_urls and
        # execution_plan.conditions.url_patterns. cfg_idx 0 = global only.
        self.source_cfgs: list[dict] = []
        self._seed_cfg_idx: dict[int, int] = {}
        for seed in seeds:
            raw = seed.get("config")
            if not raw:
                continue
            if isinstance(raw, str):
                try:
                    raw = json.loads(raw)
                except ValueError:
                    continue
            if isinstance(raw, dict) and raw:
                self.source_cfgs.append(raw)
                self._seed_cfg_idx[int(seed["source_id"])] = len(self.source_cfgs)
        self.seen = SeenShardPool(
            cfg.n_seen_shards, cfg.seen_log2_buckets, cfg.seen_exact,
            spill_dir=cfg.seen_spill_dir,
            spill_threshold=cfg.seen_spill_threshold,
            filter_kind=cfg.seen_filter_kind,
        )
        robots_fn = (
            (lambda host, _c=corpus_cfg: robots_disallow(_c, host))
            if cfg.check_robots
            else None
        )
        self._robots_fn = robots_fn
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
        # readiness barrier: actor spawn is cluster spin-up, not crawl time
        ray.get([a.stats.remote() for a in self.seen.actors])
        ray.get([a.state.remote() for a in self.politeness.actors])

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
            rows["cfg_idx"].append(self._seed_cfg_idx.get(int(s["source_id"]), 0))
            rows["pshard"].append(host_hash(host, self.cfg.n_pol_shards))
            rank += 1
        table = pa.Table.from_pydict(rows, schema=FRONTIER_SCHEMA)
        # register seeds in the seen set
        keys = key_u64(table["key"])
        self.seen.insert_batch(keys, table["host"].to_pylist())
        return table

    # ---- wave loop ------------------------------------------------------
    def _pending_to_table(self, pending) -> pa.Table:
        refs = pending.to_arrow_refs()
        tables = [t for t in ray.get(refs) if t.num_rows > 0]
        if not tables:
            return pa.Table.from_pydict(
                {n: [] for n in FRONTIER_SCHEMA.names}, schema=FRONTIER_SCHEMA
            )
        return pa.concat_tables(tables).combine_chunks()

    def _table_to_ds(self, tbl: pa.Table):
        """Arrow table → Dataset split into fetch-batch-sized blocks so the
        fetch stage parallelizes."""
        if tbl.num_rows == 0:
            return ray.data.from_arrow(tbl)
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        n = max(32, min(1024, tbl.num_rows // max(1, ncpu * 6) or 32))
        chunks = [tbl.slice(i, n) for i in range(0, tbl.num_rows, n)]
        return ray.data.from_arrow(chunks)

    def _admit_driver(self, tbl: pa.Table, wave: int):
        """Driver-path admission: split rows by politeness shard, one admit
        RPC per shard (each actor sees its full group), reassemble."""
        pshard = tbl["pshard"].to_numpy()
        hosts = tbl["host"].to_pylist()
        urls = tbl["url"].to_pylist()
        depths = tbl["depth"].to_numpy()
        ords = tbl["ord"].to_numpy()
        verdict = np.zeros(tbl.num_rows, dtype=np.int8)
        futures, idxs = [], []
        for sh in np.unique(pshard):
            idx = np.nonzero(pshard == sh)[0]
            futures.append(
                self.politeness.actors[int(sh)].admit.remote(
                    wave,
                    [hosts[i] for i in idx],
                    [urls[i] for i in idx],
                    depths[idx],
                    ords[idx],
                )
            )
            idxs.append(idx)
        for idx, res in zip(idxs, ray.get(futures)):
            verdict[idx] = res
        admitted = tbl.filter(pa.array(verdict == 1))
        deferred = tbl.filter(pa.array(verdict == 0))
        robots_dropped = int((verdict == -1).sum())
        return admitted, deferred, robots_dropped

    def _admit_distributed(self, pending, wave: int):
        """Shuffle-free, skew-proof admission for large frontiers
        (the groupby-host alternative; north star's hot-host concern):

        A. one pass → per-(host) robots-ok counts (tiny partials, driver
           merge — hosts ≪ rows);
        B. per-shard ``grant_counts`` RPC → per-host grants (token state);
           for *constrained* hosts only, a second pure pass collects
           per-batch top-``grant`` (depth, ord) candidates whose union
           contains the global top-``grant`` → exact per-host admission
           threshold;
        C. one labeling pass compares each row against its host's
           threshold. No all-to-all exchange at any point; a single hot
           host costs O(grant) driver memory, not O(host rows).
        → (materialized admission ds with admit column, n_admit, n_defer,
           robots_dropped)
        """
        cfg = self.cfg
        robots_fn = self._robots_fn if cfg.check_robots else None

        def robots_blocked(host: str, url: str) -> bool:
            if robots_fn is None:
                return False
            from urllib.parse import urlparse

            path = urlparse(url).path
            return any(path.startswith(p) for p in robots_fn(host))

        # --- round A: per-host counts -------------------------------------
        def count_partial(t: pa.Table) -> pa.Table:
            hosts = t["host"].to_pylist()
            urls = t["url"].to_pylist()
            ok: dict[str, int] = {}
            blocked: dict[str, int] = {}
            for h, u in zip(hosts, urls):
                if robots_blocked(h, u):
                    blocked[h] = blocked.get(h, 0) + 1
                else:
                    ok[h] = ok.get(h, 0) + 1
            keys = sorted(set(ok) | set(blocked))
            return pa.table(
                {
                    "host": pa.array(keys, pa.string()),
                    "ok": pa.array([ok.get(k, 0) for k in keys], pa.int64()),
                    "blocked": pa.array([blocked.get(k, 0) for k in keys], pa.int64()),
                }
            )

        partials = pa.concat_tables(
            [t for t in ray.get(
                pending.map_batches(count_partial, batch_format="pyarrow")
                .to_arrow_refs()
            ) if t.num_rows]
        ).to_pandas()
        agg = partials.groupby("host").sum()
        ok_counts = agg["ok"].to_dict()
        robots_dropped = int(agg["blocked"].sum())

        # --- round B: grants + thresholds ---------------------------------
        hosts_sorted = sorted(ok_counts)
        by_shard: dict[int, list[str]] = {}
        for h in hosts_sorted:
            by_shard.setdefault(host_hash(h, cfg.n_pol_shards), []).append(h)
        futures = [
            self.politeness.actors[sh].grant_counts.remote(
                wave, hs, [int(ok_counts[h]) for h in hs]
            )
            for sh, hs in by_shard.items()
        ]
        grants: dict[str, int] = {}
        for hs, res in zip(by_shard.values(), ray.get(futures)):
            grants.update(dict(zip(hs, res)))

        constrained = {
            h: g for h, g in grants.items() if 0 < g < ok_counts[h]
        }
        thresholds: dict[str, tuple[int, int]] = {}
        if constrained:
            cref = ray.put(constrained)

            def top_partial(t: pa.Table, _robots=robots_blocked) -> pa.Table:
                con = ray.get(cref)
                hosts = t["host"].to_pylist()
                urls = t["url"].to_pylist()
                depths = t["depth"].to_pylist()
                ords = t["ord"].to_pylist()
                out_h, out_d, out_o = [], [], []
                per_host: dict[str, list] = {}
                for i, h in enumerate(hosts):
                    if h in con and not _robots(h, urls[i]):
                        per_host.setdefault(h, []).append((depths[i], ords[i]))
                for h, rows in per_host.items():
                    rows.sort()
                    for d, o in rows[: con[h]]:
                        out_h.append(h)
                        out_d.append(d)
                        out_o.append(o)
                return pa.table(
                    {
                        "host": pa.array(out_h, pa.string()),
                        "depth": pa.array(out_d, pa.int32()),
                        "ord": pa.array(out_o, pa.int64()),
                    }
                )

            tops = pa.concat_tables(
                [t for t in ray.get(
                    pending.map_batches(top_partial, batch_format="pyarrow")
                    .to_arrow_refs()
                ) if t.num_rows]
            ).to_pandas()
            # one sorted pass: the g-th best (depth, ord) per host is the row
            # whose within-host rank equals grant-1 (no per-host re-filter)
            tops = tops.sort_values(["host", "depth", "ord"], kind="mergesort")
            rank = tops.groupby("host", sort=False).cumcount().to_numpy()
            want = tops["host"].map(constrained).to_numpy() - 1
            sel = tops[rank == want]
            thresholds = {
                h: (int(d), int(o))
                for h, d, o in zip(sel["host"], sel["depth"], sel["ord"])
            }

        # --- round C: label -----------------------------------------------
        bc = ray.put((grants, {h: ok_counts[h] for h in grants}, thresholds))

        def label(t: pa.Table, _robots=robots_blocked) -> pa.Table:
            g_map, ok_map, thr_map = ray.get(bc)
            hosts = t["host"].to_pylist()
            urls = t["url"].to_pylist()
            depths = t["depth"].to_pylist()
            ords = t["ord"].to_pylist()
            verdict = np.zeros(len(hosts), dtype=np.int8)
            for i, h in enumerate(hosts):
                if _robots(h, urls[i]):
                    verdict[i] = -1
                    continue
                g = g_map.get(h, 0)
                if g <= 0:
                    verdict[i] = 0
                elif g >= ok_map.get(h, 0):
                    verdict[i] = 1
                else:
                    verdict[i] = (
                        1 if (depths[i], ords[i]) <= thr_map[h] else 0
                    )
            return t.append_column("admit", pa.array(verdict, pa.int8()))

        admission = pending.map_batches(label, batch_format="pyarrow").materialize()
        n_admit = int(sum(grants.values()))
        n_defer = int(sum(ok_counts.values()) - n_admit)
        return admission, n_admit, n_defer, robots_dropped

    def _links_driver(self, cand: pa.Table, budget: int, wave: int) -> pa.Table:
        """Driver-path steps 6-8: first-win dedup, seen anti-join, order,
        truncate, dense re-rank, seen insert. Same semantics as the
        distributed path (ENGINE_SPEC.md)."""
        df = cand.to_pandas()
        df = df.sort_values("packed", kind="mergesort").drop_duplicates(
            "key", keep="first"
        )
        keys = key_u64(df["key"].to_numpy())
        hosts = df["host"].tolist()
        seen_mask = self.seen.contains_batch(keys, hosts)
        df = df[~seen_mask]
        if self.cfg.link_score_fn is not None:
            df = df.sort_values(
                ["score", "packed"], ascending=[False, True], kind="mergesort"
            )
        df = df.head(budget)
        if len(df):
            self.seen.insert_batch(key_u64(df["key"].to_numpy()), df["host"].tolist())
        n_pol = self.cfg.n_pol_shards
        return pa.Table.from_pydict(
            {
                "url": df["url"].tolist(),
                "key": df["key"].tolist(),
                "host": df["host"].tolist(),
                "depth": np.full(len(df), wave + 1, dtype=np.int32),
                "ord": np.arange(len(df), dtype=np.int64),
                "src_url": df["src_url"].tolist(),
                "restricted": df["restricted"].to_numpy().astype(np.int32),
                "cfg_idx": df["cfg_idx"].to_numpy().astype(np.int32),
                "pshard": np.array(
                    [host_hash(h, n_pol) for h in df["host"]], dtype=np.int32
                ),
            },
            schema=FRONTIER_SCHEMA,
        )

    def run(self, pending=None) -> dict:
        cfg = self.cfg
        os.makedirs(cfg.out_dir, exist_ok=True)
        ctx = ray.data.DataContext.get_current()
        ctx.execution_options.preserve_order = True
        ctx.enable_progress_bars = False

        if pending is None:
            pending = self._table_to_ds(self._seed_frontier())
        t0 = time.perf_counter()

        n_pending = pending.count()
        while (
            n_pending > 0
            and self.total_fetched < cfg.max_links
            and self.wave < cfg.max_waves
        ):
            wave = self.wave
            wave_dir = os.path.join(cfg.out_dir, f"wave={wave}")
            m = {"wave": wave}
            tw = time.perf_counter()
            small = n_pending <= cfg.driver_threshold

            # 2. admission (host-sharded politeness actor state)
            if small:
                ptbl = self._pending_to_table(pending)
                adm_tbl, def_tbl, m["robots_dropped"] = self._admit_driver(ptbl, wave)
                admitted = self._table_to_ds(adm_tbl)
                deferred = None  # kept as def_tbl
                n_admit, n_defer = adm_tbl.num_rows, def_tbl.num_rows
            else:
                admission, n_admit, n_defer, m["robots_dropped"] = (
                    self._admit_distributed(pending, wave)
                )
                # lazy filter views over the materialized admission blocks —
                # each consumer re-scans cheap local blocks
                admitted = admission.map_batches(
                    lambda t: t.filter(pc.equal(t["admit"], 1)).drop_columns(["admit"]),
                    batch_format="pyarrow",
                )
                deferred = admission.map_batches(
                    lambda t: t.filter(pc.equal(t["admit"], 0)).drop_columns(["admit"]),
                    batch_format="pyarrow",
                )
                def_tbl = None
            m["t_admission"] = round(time.perf_counter() - tw, 3)
            m["deferred"] = n_defer

            if n_admit == 0:
                m["fetched"] = 0
                self.metrics.append(m)
                pending = self._table_to_ds(def_tbl) if small else deferred
                n_pending = n_defer
                self._checkpoint(wave_dir, def_tbl if small else deferred, m)
                self.wave += 1
                if cfg.politeness_rate == 0:
                    break
                continue

            # 3. fetch + parse → pages parquet (always distributed; the
            # fetch state is trivially reconstructible here, so stateless
            # tasks beat re-spawning an actor pool every wave — set
            # fetch_actors=True when the fetcher holds real sessions)
            pages_dir = os.path.join(wave_dir, "pages")
            # adaptive batch size: ~6 batches per CPU per wave bounds both
            # driver task-submission overhead (few, bigger tasks) and the
            # straggler tail (still several rounds per worker)
            ncpu = int(ray.cluster_resources().get("CPU", 8))
            batch = max(32, min(1024, n_admit // max(1, ncpu * 6) or 32))
            fetch_src = admitted if small else admitted.drop_columns(["pshard"])
            if not small:
                # spread the lazy filtered view for fetch parallelism
                fetch_src = fetch_src.repartition(
                    max(1, min(n_admit // max(32, batch) + 1, ncpu * 4))
                )
            if cfg.fetch_actors:
                fetched = fetch_src.map_batches(
                    FetchParse,
                    fn_constructor_args=(self.corpus_cfg,),
                    fn_constructor_kwargs={"action_rules": cfg.action_rules},
                    batch_format="pyarrow",
                    batch_size=batch,
                    concurrency=cfg.fetch_concurrency,
                    num_cpus=cfg.fetch_num_cpus,
                )
            else:
                fetched = fetch_src.map_batches(
                    FetchParse(self.corpus_cfg, action_rules=cfg.action_rules),
                    batch_format="pyarrow",
                    batch_size=batch,
                    num_cpus=cfg.fetch_num_cpus,
                )
            import threading

            from ..storage import write_table

            spill_wave = (
                cfg.wave_spill_threshold > 0
                and n_admit >= cfg.wave_spill_threshold
            )
            if spill_wave:
                # big-wave path: stream pages straight to storage (blocks
                # leave plasma as they're written) and count from file
                # metadata; the link explode re-reads only the slim columns
                fmt_used = write_table(fetched, pages_dir, cfg.storage_format)
                wt = None
                if fmt_used == "parquet":
                    import glob as _glob

                    import pyarrow.parquet as pq

                    n_fetched = sum(
                        pq.ParquetFile(f).metadata.num_rows
                        for f in _glob.glob(os.path.join(pages_dir, "*.parquet"))
                    )
                else:
                    from ..storage import read_table as _rt

                    n_fetched = _rt(pages_dir).count()
            else:
                # normal path — materialize the wave once: write and the
                # link explode both consume the SAME blocks (no recompute,
                # no read-back of the heavy span columns); the write
                # overlaps the links phase and is joined before the wave
                # manifest commits
                fetched = fetched.materialize()
                wt_err: list[BaseException] = []

                def _write_bg(ds=fetched, path=pages_dir,
                              fmt=cfg.storage_format, sink=wt_err):
                    try:
                        write_table(ds, path, fmt)
                    except BaseException as e:  # re-raised at join
                        sink.append(e)

                wt = threading.Thread(target=_write_bg, daemon=True)
                wt.start()
                n_fetched = fetched.count()
            m["t_fetch"] = round(time.perf_counter() - tw - m["t_admission"], 3)
            self.total_fetched += n_fetched
            m["fetched"] = n_fetched
            m["errors"] = n_admit - n_fetched

            # 4. truncation budget
            budget = max(0, cfg.max_links - self.total_fetched - n_defer)

            # 5-8. links → candidates → dedup → seen anti-join → order/rank
            next_tbl = None
            next_frontier = None
            if budget > 0:
                link_cols = ["url", "ord", "src_url", "restricted",
                             "cfg_idx", "links"]
                if spill_wave:
                    from ..storage import read_table as _rt

                    links_ds = _rt(pages_dir, columns=link_cols)
                else:
                    links_ds = fetched.select_columns(link_cols)
                tl0 = time.perf_counter()
                candidates = links_ds.map_batches(
                    LinkExplodeFilter(cfg, self.source_cfgs),
                    batch_format="pyarrow",
                ).materialize()
                n_cand = candidates.count()
                m["t_explode"] = round(time.perf_counter() - tl0, 3)
                m["n_candidates"] = n_cand
                if n_cand <= cfg.driver_threshold:
                    parts = [
                        t for t in ray.get(candidates.to_arrow_refs())
                        if t.num_rows > 0
                    ]
                    cand_tbl = (
                        pa.concat_tables(parts).combine_chunks()
                        if parts
                        else pa.Table.from_pydict(
                            {n: [] for n in CANDIDATE_SCHEMA.names},
                            schema=CANDIDATE_SCHEMA,
                        )
                    )
                    next_tbl = self._links_driver(cand_tbl, budget, wave)
                    m["new_frontier"] = next_tbl.num_rows
                else:
                    deduped = candidates.groupby("kbucket").map_groups(
                        _dedup_bucket, batch_format="pandas"
                    )
                    fresh = deduped.map_batches(
                        self.seen.filter_new_stage("key", "host"),
                        batch_format="pyarrow",
                    )
                    if cfg.link_score_fn is not None:
                        ordered = (
                            fresh.sort(
                                [("score"), ("packed")],
                                descending=[True, False],
                            )
                            .limit(budget)
                            .materialize()
                        )
                    else:
                        ordered = fresh.sort("packed").limit(budget).materialize()
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
                                "cfg_idx": batch["cfg_idx"],
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

            m["t_links"] = round(
                time.perf_counter() - tw - m["t_admission"] - m["t_fetch"], 3
            )

            # 8. next pending = deferred ∪ new frontier. Admission path
            # (small) and links path (n_cand vs threshold) switch modes
            # INDEPENDENTLY, so each side may be an Arrow table or a
            # Dataset — handle all four combinations.
            n_pending = n_defer + m["new_frontier"]
            if small and next_frontier is None:
                # both sides are tables (or empty)
                parts = [t for t in (def_tbl, next_tbl) if t is not None and t.num_rows]
                pending_tbl = (
                    pa.concat_tables(parts).combine_chunks()
                    if parts
                    else pa.Table.from_pydict(
                        {n: [] for n in FRONTIER_SCHEMA.names}, schema=FRONTIER_SCHEMA
                    )
                )
                pending = self._table_to_ds(pending_tbl)
                ckpt_obj = pending_tbl
            else:
                # at least one side is a Dataset → union datasets
                def_side = (
                    self._table_to_ds(def_tbl)
                    if small
                    else deferred
                ) if n_defer > 0 else None
                next_side = (
                    next_frontier
                    if next_frontier is not None
                    else (self._table_to_ds(next_tbl) if next_tbl is not None and next_tbl.num_rows else None)
                ) if m["new_frontier"] > 0 else None
                sides = [d for d in (def_side, next_side) if d is not None]
                if not sides:
                    pending = self._table_to_ds(
                        pa.Table.from_pydict(
                            {n: [] for n in FRONTIER_SCHEMA.names},
                            schema=FRONTIER_SCHEMA,
                        )
                    )
                elif len(sides) == 1:
                    pending = sides[0]
                else:
                    pending = sides[0].union(sides[1]).materialize()
                ckpt_obj = pending

            tc = time.perf_counter()
            if wt is not None:
                wt.join()  # pages durable before the manifest commits
                # (spill waves already wrote synchronously)
                if wt_err:  # a failed wave write must fail the run
                    raise wt_err[0]
            self.metrics.append(m)
            self._checkpoint(wave_dir, ckpt_obj, m)
            m["t_checkpoint"] = round(time.perf_counter() - tc, 3)
            m["t_wave"] = round(time.perf_counter() - tw, 3)
            if self.events_bus is not None:
                self.events_bus.publish.remote(
                    "crawl_wave_complete", "engine", details=dict(m)
                )
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
        if self.events_bus is not None:
            ray.get(
                self.events_bus.publish.remote(
                    "crawl_complete", "engine",
                    details={"run_id": cfg.run_id,
                             "total_fetched": self.total_fetched},
                )
            )
        return summary

    # ---- checkpointing --------------------------------------------------
    def _checkpoint(self, wave_dir: str, pending, wave_metrics: dict) -> None:
        os.makedirs(wave_dir, exist_ok=True)
        frontier_dir = os.path.join(wave_dir, "frontier")
        os.makedirs(frontier_dir, exist_ok=True)
        if isinstance(pending, pa.Table):
            if pending.num_rows > 0:
                import pyarrow.parquet as pq

                pq.write_table(
                    pending, os.path.join(frontier_dir, "frontier-0.parquet")
                )
        elif pending.count() > 0:
            pending.write_parquet(frontier_dir)
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
            # functions (link_score_fn) are not JSON-serializable — record
            # their qualified name for lineage instead
            "config": {
                k: (getattr(v, "__qualname__", str(v)) if callable(v) else v)
                for k, v in asdict(self.cfg).items()
            },
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
        # a mid-wave crash leaves wave dirs without a complete manifest
        # (pages are durable BEFORE the manifest commits) — remove them
        # so no consumer globbing wave=*/pages ever reads partial output
        import shutil

        complete = {w for w, _ in waves}
        for name in os.listdir(cfg.out_dir):
            if name.startswith("wave="):
                w = int(name.split("=")[1])
                if w not in complete:
                    shutil.rmtree(os.path.join(cfg.out_dir, name),
                                  ignore_errors=True)
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
