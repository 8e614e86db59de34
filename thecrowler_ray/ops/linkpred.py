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
at each common neighbor w from ONE ``groupby(w)`` of the exploded
adjacency — deg(w) is the group size, so no degree join at all; the
per-group pair explosion is O(deg(w)²), bounded by ``max_apex_degree``
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

    def adj(batch: pa.Table) -> pa.Table:
        x = batch["x"].to_numpy(zero_copy_only=False)
        y = batch["y"].to_numpy(zero_copy_only=False)
        return pa.table({
            "w": pa.array(np.concatenate([x, y]).astype(np.int64)),
            "nb": pa.array(np.concatenate([y, x]).astype(np.int64))})

    def _empty_wedges() -> pa.Table:
        return pa.table({"u": pa.array([], pa.int64()),
                         "v": pa.array([], pa.int64()),
                         "c": pa.array([], pa.int64())})

    def wedges(g: pa.Table) -> pa.Table:
        # arrow in/out: pandas blocks make the downstream (u, v)
        # groupby ~25x slower (the stages/basket.py measurement)
        nb = np.sort(g["nb"].to_numpy(zero_copy_only=False)
                     .astype(np.int64))
        d = len(nb)  # == deg(w): edges are canonical-distinct
        if d < 2:
            return _empty_wedges()
        if max_apex_degree is not None and d > max_apex_degree:
            print(f"adamic_adar: apex {int(g['w'][0].as_py())} capped "
                  f"(deg {d} > {max_apex_degree}) — its wedges are "
                  "dropped")
            return _empty_wedges()
        c = int(np.floor(SCALE / np.log(float(d)) + 0.5))
        iu, ju = np.triu_indices(d, 1)
        return pa.table({"u": pa.array(nb[iu]),
                         "v": pa.array(nb[ju]),
                         "c": pa.array(np.full(len(iu), c,
                                               dtype=np.int64))})

    scores = (e.map_batches(adj, batch_format="pyarrow")
              .groupby("w").map_groups(wedges, batch_format="pyarrow")
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
