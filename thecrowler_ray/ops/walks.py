"""Deterministic random walks over a Ray Data edge list — the corpus
generator for graph-embedding training (DeepWalk / node2vec, Perozzi
2014 / Grover 2016, public methods) expressed with the repo's
"md5 as a portable randomness source" idiom (``ops/shuffle.py``): the
next hop from node c at step t of walk w is the out-neighbor nb with
the smallest ``md5("{seed}:{w}:{t}:{nb}")`` hex digest. A pure function
of (seed, walk, step, neighbor) — stable across partitionings and
cluster sizes, and replayable in SQL (DuckDB ``md5`` of the identical
string; 32-char hex compares identically as text on both sides).

Semantics (pinned by the twin): edges are DIRECTED (walks follow link
direction — the crawl-surf analog); parallel edges collapse,
self-loops drop. One walk per start node, ``walk_id`` = start. Step 0
is the start; a walk ends early at a node with no out-neighbors.
Output is every visited (walk_id, step, node) row.

Paths (the ``ops/bfs.py`` switch):

- **broadcast** (nodes ≤ threshold): CSR adjacency ships once; each
  step is one map over the slim (walk, node) positions — zero
  shuffles per step.
- **join**: positions ⋈ edges on the current node (hash join), then
  one ``groupby(walk).min`` over ``hex || ':' || nb`` picks the hop —
  md5 uniqueness makes the min tie-free, and the fixed 32-char hex
  prefix makes string order == (hex, nb) order. Only slim rows move.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _hop_digest(seed: str, walk: int, step: int, nb: int) -> str:
    return hashlib.md5(
        f"{seed}:{walk}:{step}:{nb}".encode()).hexdigest()


def deterministic_walks(
    edges,
    starts,
    *,
    length: int = 4,
    seed: str = "w",
    broadcast_threshold: int = 2_000_000,
) -> "ray.data.Dataset":
    """Directed edge-list Dataset (src, dst int64) + start node ids
    (list[int] or Dataset with ``node``) → Dataset
    (walk_id, step, node), sorted by (walk_id, step)."""
    from .gutil import collect_tables

    e = (edges.select_columns(["src", "dst"])
         .map_batches(_canon_directed, batch_format="pyarrow")
         .groupby(["src", "dst"]).count().drop_columns(["count()"])
         .materialize())

    if isinstance(starts, ray.data.Dataset):
        start_ids = np.unique(np.concatenate(
            [t["node"].to_numpy(zero_copy_only=False)
             for t in collect_tables(starts)]
            or [np.array([], dtype=np.int64)]).astype(np.int64))
    else:
        start_ids = np.unique(np.asarray(sorted(starts),
                                         dtype=np.int64))
    if len(start_ids) == 0:
        return ray.data.from_arrow(_empty())

    def node_rows(batch: pa.Table) -> pa.Table:
        s = np.unique(batch["src"].to_numpy(zero_copy_only=False))
        return pa.table({"node": pa.array(s.astype(np.int64))})

    n_src = (e.map_batches(node_rows, batch_format="pyarrow")
             .groupby("node").count().count())
    if n_src <= broadcast_threshold:
        return _walks_broadcast(e, start_ids, length, seed)
    return _walks_join(e, start_ids, length, seed)


def _canon_directed(batch: pa.Table) -> pa.Table:
    s = batch["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    d = batch["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    keep = s != d
    sd = np.unique(np.stack([s[keep], d[keep]], axis=1), axis=0)
    if sd.size == 0:
        sd = sd.reshape(0, 2)
    return pa.table({"src": pa.array(sd[:, 0]),
                     "dst": pa.array(sd[:, 1])})


def _empty() -> pa.Table:
    return pa.table({"walk_id": pa.array([], pa.int64()),
                     "step": pa.array([], pa.int64()),
                     "node": pa.array([], pa.int64())})


def _walks_broadcast(e, start_ids: np.ndarray, length: int, seed: str):
    """CSR adjacency ships once; walks advance map-side, zero shuffles.
    The CSR is sorted by (src, dst), so each node's neighbor slice is
    in ascending dst order."""
    from .gutil import collect_tables

    parts = collect_tables(e)
    if parts:
        allt = pa.concat_tables(parts)
        src = allt["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = allt["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((dst, src))
        src, dst = src[order], dst[order]
        heads, idx = np.unique(src, return_index=True)
        bounds = np.r_[idx, len(src)]
    else:
        heads = np.array([], dtype=np.int64)
        dst = np.array([], dtype=np.int64)
        bounds = np.array([0], dtype=np.int64)
    csr_ref = ray.put((heads, bounds, dst))

    pos = ray.data.from_arrow(pa.table({
        "walk_id": pa.array(start_ids, pa.int64()),
        "node": pa.array(start_ids, pa.int64())}))
    out = [pos.map_batches(
        lambda b: pa.table({"walk_id": b["walk_id"],
                            "step": pa.array(
                                np.zeros(b.num_rows, np.int64)),
                            "node": b["node"]}),
        batch_format="pyarrow")]

    for t in range(1, length + 1):
        step = t

        def advance(batch: pa.Table, _t=step) -> pa.Table:
            hd, bd, ds_ = ray.get(csr_ref)
            walks = batch["walk_id"].to_numpy(zero_copy_only=False)
            cur = batch["node"].to_numpy(zero_copy_only=False)
            w_out, n_out = [], []
            hpos = np.searchsorted(hd, cur)
            for i in range(len(cur)):
                p = hpos[i]
                if p >= len(hd) or hd[p] != cur[i]:
                    continue  # dead end — the walk stops
                nbs = ds_[bd[p]:bd[p + 1]]
                w = int(walks[i])
                best = min(nbs,
                           key=lambda nb: (_hop_digest(seed, w, _t,
                                                       int(nb)),
                                           int(nb)))
                w_out.append(w)
                n_out.append(int(best))
            return pa.table({
                "walk_id": pa.array(w_out, pa.int64()),
                "node": pa.array(n_out, pa.int64())})

        pos = pos.map_batches(advance,
                              batch_format="pyarrow").materialize()
        if pos.count() == 0:
            break
        out.append(pos.map_batches(
            lambda b, _t=step: pa.table({
                "walk_id": b["walk_id"],
                "step": pa.array(np.full(b.num_rows, _t, np.int64)),
                "node": b["node"]}),
            batch_format="pyarrow"))

    res = out[0]
    for ds_part in out[1:]:
        res = res.union(ds_part)
    return res.sort(["walk_id", "step"])


def _walks_join(e, start_ids: np.ndarray, length: int, seed: str):
    """Distributed path: one hash join + one groupby-min per step."""
    from ray.data.aggregate import Min

    from ..stages.ngram_lm import _join_partitions

    nparts = _join_partitions()
    pos = ray.data.from_arrow(pa.table({
        "walk_id": pa.array(start_ids, pa.int64()),
        "node": pa.array(start_ids, pa.int64())})).materialize()
    frames = [pos.map_batches(
        lambda b: pa.table({"walk_id": b["walk_id"],
                            "step": pa.array(
                                np.zeros(b.num_rows, np.int64)),
                            "node": b["node"]}),
        batch_format="pyarrow")]

    for t in range(1, length + 1):
        step = t
        cand = pos.map_batches(
            lambda b: pa.table({"src": b["node"],
                                "walk_id": b["walk_id"]}),
            batch_format="pyarrow").join(
            e, join_type="inner", num_partitions=nparts, on=("src",))

        def keyed(batch: pa.Table, _t=step) -> pa.Table:
            walks = batch["walk_id"].to_numpy(zero_copy_only=False)
            nbs = batch["dst"].to_numpy(zero_copy_only=False)
            keys = [
                _hop_digest(seed, int(w), _t, int(nb)) + ":" + str(int(nb))
                for w, nb in zip(walks, nbs)]
            return pa.table({
                "walk_id": pa.array(walks.astype(np.int64)),
                "hk": pa.array(keys, pa.string())})

        picked = (cand.map_batches(keyed, batch_format="pyarrow")
                  .groupby("walk_id")
                  .aggregate(Min("hk", alias_name="hk"))
                  .materialize())
        if picked.count() == 0:
            break

        def parse(batch: pa.Table) -> pa.Table:
            nodes = [int(s.split(":", 1)[1])
                     for s in batch["hk"].to_pylist()]
            return pa.table({
                "walk_id": batch["walk_id"],
                "node": pa.array(nodes, pa.int64())})

        pos = picked.map_batches(parse,
                                 batch_format="pyarrow").materialize()
        frames.append(pos.map_batches(
            lambda b, _t=step: pa.table({
                "walk_id": b["walk_id"],
                "step": pa.array(np.full(b.num_rows, _t, np.int64)),
                "node": b["node"]}),
            batch_format="pyarrow"))

    res = frames[0]
    for ds_part in frames[1:]:
        res = res.union(ds_part)
    return res.sort(["walk_id", "step"])
