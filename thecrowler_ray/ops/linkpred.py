"""Adamic-Adar link prediction over a Ray Data edge list (Adamic &
Adar 2003 "Friends and neighbors on the Web" — the public
common-neighbors index; the standard baseline for "which pages should
link but don't").

Crawl-plane use: AA over the discovered link graph ranks page pairs by
shared-neighbor evidence, weighting rare shared neighbors above hubs —
seed-expansion and related-page suggestions the reference's per-page
keyword ranking can't see.

Semantics (pinned by the twin): graph is UNDIRECTED canonical (dedup,
self-loops dropped). For every node pair (u < v) with ≥1 common
neighbor and NO existing edge:

    score_q6(u,v) = Σ_{w ∈ N(u)∩N(v)} floor(10⁶ / ln(deg(w)) + 0.5)

— the per-wedge contribution is integer-rounded FIRST (the
``ngram_lm`` ln contract: identical double tree in numpy and DuckDB),
so the sum is an order-free int64. ``common`` counts the shared
neighbors. Top-k by (score_q6 DESC, u ASC, v ASC).

Shape (the Suri-Vassilvitskii concern applies): wedges are generated
at each common neighbor w from ONE ``groupby(hash-shard of w)`` of the
exploded adjacency — deg(w) is the apex's run length inside the
shard's one vectorized run-length explosion (no degree join, no
per-apex scheduler round-trip); the per-apex pair fan-out is
O(deg(w)²), bounded by ``max_apex_degree``
(pairs through hubs carry the smallest weights; capping them is the
standard scale mitigation — cap events are LOGGED, never silent).
Existing edges are removed by a packed-int64 broadcast set (ids <
2^31) or a left-anti hash join above the threshold / for wide ids.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

SCALE = 1_000_000


def adamic_adar(
    edges,
    *,
    k: int = 100,
    max_apex_degree: int | None = None,
    broadcast_threshold: int = 2_000_000,
) -> "ray.data.Dataset":
    """Edge-list Dataset (x, y int64; dirty input fine) → Dataset
    (u, v, common, score_q6): top-``k`` non-adjacent pairs by
    Adamic-Adar, (score_q6 DESC, u, v) order."""
    from ray.data.aggregate import Count, Sum

    from ..stages.ngram_lm import _join_partitions
    from .triangles import _canonical_edges

    nparts = _join_partitions()
    e = _canonical_edges(edges).materialize()
    n_edges = e.count()
    if n_edges == 0:
        return ray.data.from_arrow(_empty())

    n_shards = max(16, int(ray.cluster_resources().get("CPU", 8)) * 4)
    _GOLD = np.uint64(0x9E3779B97F4A7C15)

    def adj(batch: pa.Table) -> pa.Table:
        x = batch["x"].to_numpy(zero_copy_only=False)
        y = batch["y"].to_numpy(zero_copy_only=False)
        w = np.concatenate([x, y]).astype(np.int64)
        sh = ((w.astype(np.uint64) * _GOLD) >> np.uint64(33)) \
            % np.uint64(n_shards)
        return pa.table({
            "w": pa.array(w),
            "nb": pa.array(np.concatenate([y, x]).astype(np.int64)),
            "wshard": pa.array(sh.astype(np.int64))})

    def _empty_wedges() -> pa.Table:
        return pa.table({"u": pa.array([], pa.int64()),
                         "v": pa.array([], pa.int64()),
                         "c": pa.array([], pa.int64())})

    def wedge_shard(g: pa.Table) -> pa.Table:
        # one vectorized run-length explosion per SHARD of apexes (one
        # map_groups call per apex w is a scheduler round-trip per node
        # — the stages/basket.py measurement); arrow in/out (pandas
        # blocks make the downstream (u, v) groupby ~25x slower)
        w = g["w"].to_numpy(zero_copy_only=False).astype(np.int64)
        nb = g["nb"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((nb, w))
        w, nb = w[order], nb[order]

        def runs(warr):
            starts = np.flatnonzero(np.r_[True, warr[1:] != warr[:-1]])
            ends = np.r_[starts[1:], len(warr)]
            return starts, ends, ends - starts

        starts, ends, sizes = runs(w)
        bad = sizes < 2  # deg(w) == run size: edges canonical-distinct
        if max_apex_degree is not None:
            big = sizes > max_apex_degree
            if big.any():
                print(f"adamic_adar: {int(big.sum())} apexes capped "
                      f"(deg > {max_apex_degree}) — their wedges are "
                      "dropped")
            bad |= big
        if bad.any():
            keep = ~np.repeat(bad, sizes)
            w, nb = w[keep], nb[keep]
            if len(w) == 0:
                return _empty_wedges()
            starts, ends, sizes = runs(w)
        if len(w) == 0:
            return _empty_wedges()
        c_run = np.floor(SCALE / np.log(sizes.astype(np.float64))
                         + 0.5).astype(np.int64)
        run_end = np.repeat(ends, sizes)
        pos = np.arange(len(w))
        reps = run_end - pos - 1
        total = int(reps.sum())
        if total == 0:
            return _empty_wedges()
        u = np.repeat(nb, reps)
        out_start = np.cumsum(reps) - reps
        v_idx = (np.arange(total) - np.repeat(out_start, reps)
                 + np.repeat(pos + 1, reps))
        c = np.repeat(np.repeat(c_run, sizes), reps)
        return pa.table({"u": pa.array(u), "v": pa.array(nb[v_idx]),
                         "c": pa.array(c)})

    scores = (e.map_batches(adj, batch_format="pyarrow")
              .groupby("wshard")
              .map_groups(wedge_shard, batch_format="pyarrow")
              .groupby(["u", "v"])
              .aggregate(Count(alias_name="common"),
                         Sum("c", alias_name="score_q6"))
              .materialize())
    if scores.count() == 0:
        return ray.data.from_arrow(_empty())

    # drop already-connected pairs
    from .gutil import collect_tables

    packed = []
    for t in collect_tables(e):
        x = t["x"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = t["y"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(x) and (x.min() < 0 or x.max() >= (1 << 31)
                       or y.min() < 0 or y.max() >= (1 << 31)):
            packed = None
            break
        packed.append((x << 31) + y)
    if packed is not None and n_edges <= broadcast_threshold:
        eset = np.sort(np.concatenate(packed) if packed
                       else np.array([], dtype=np.int64))
        ref = ray.put(eset)

        def drop_adjacent(batch: pa.Table) -> pa.Table:
            es = ray.get(ref)
            u = batch["u"].to_numpy(zero_copy_only=False)
            v = batch["v"].to_numpy(zero_copy_only=False)
            key = (u << 31) + v
            pos = np.searchsorted(es, key)
            hit = (pos < len(es)) & (es[np.minimum(pos, len(es) - 1)]
                                     == key)
            out = batch.filter(pa.array(~hit))
            if out.num_rows > k:  # partial head bounds the global sort
                order = pa.compute.sort_indices(
                    out, sort_keys=[("score_q6", "descending"),
                                    ("u", "ascending"),
                                    ("v", "ascending")])
                out = out.take(order.slice(0, k))
            return out

        new_pairs = scores.map_batches(drop_adjacent,
                                       batch_format="pyarrow")
    else:
        marked = e.map_batches(
            lambda b: pa.table({"u": b["x"], "v": b["y"],
                                "adjacent": pa.array(
                                    np.ones(b.num_rows, np.int64))}),
            batch_format="pyarrow")
        import pyarrow.compute as pc

        new_pairs = (scores.join(marked, join_type="left_outer",
                                 num_partitions=nparts, on=("u", "v"))
                     .map_batches(
                         lambda b: b.filter(
                             pc.is_null(b["adjacent"])).select(
                             ["u", "v", "common", "score_q6"]),
                         batch_format="pyarrow"))
    return (new_pairs
            .sort(["score_q6", "u", "v"],
                  descending=[True, False, False])
            .limit(k))


def _empty() -> pa.Table:
    return pa.table({
        "u": pa.array([], pa.int64()),
        "v": pa.array([], pa.int64()),
        "common": pa.array([], pa.int64()),
        "score_q6": pa.array([], pa.int64())})
