"""Distributed connected components over duplicate-candidate pairs.

The missing half of near-dup deduplication at corpus scale: MinHash /
SimHash / embedding LSH produce candidate PAIRS, but the deliverable is a
CLUSTER id per document (keep one representative per component, drop the
rest). Pairwise output alone under-deduplicates chains (A~B, B~C but A
and C never share a bucket).

Algorithm: alternating large-star / small-star (the classic MapReduce
connected-components construction — Kiveris et al., "Connected Components
in MapReduce and Beyond", SOCC'14; public literature, re-derived here):

  - large-star (grouped by node u over bidirectional adjacency):
    m = min(Γ(u) ∪ {u}); emit edge (v, m) for every STRICTLY LARGER
    neighbor v > u.
  - small-star (grouped by the larger endpoint u of each edge):
    m = min(Γ(u)) over the ≤-neighbors; emit (v, m) for
    v ∈ Γ(u) ∪ {u}, v ≠ m.

Both are plain ``groupby(node).map_groups`` over uniformly-hashed node
keys — no driver-side graph, no whole-component group (a group holds one
node's adjacency, which large-star keeps shrinking), and the edge set
converges to per-component stars in O(log n) rounds. Each round is three
shuffles (two stars + a canonical dedup); the convergence probe ships one
(count, checksum) scalar pair to the driver per round.

The reference engine deduplicates pages only pairwise/exact
(``pkg/crawler/crawler.go`` exact URL/content hashes); this operator is
part of the training-data plane this repo adds on top.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["connected_components"]

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _canon(batch: pa.Table, a: str, b: str) -> pa.Table:
    """(a, b) → canonical (u=min, v=max), self-loops dropped."""
    x = batch[a].to_numpy(zero_copy_only=False).astype(np.int64)
    y = batch[b].to_numpy(zero_copy_only=False).astype(np.int64)
    keep = x != y
    x, y = x[keep], y[keep]
    return pa.table({"u": np.minimum(x, y), "v": np.maximum(x, y)})


def _both_directions(batch: pa.Table) -> pa.Table:
    u = batch["u"].to_numpy(zero_copy_only=False)
    v = batch["v"].to_numpy(zero_copy_only=False)
    return pa.table({"k": np.concatenate([u, v]),
                     "n": np.concatenate([v, u])})


def _large_star_group(g: pd.DataFrame) -> pd.DataFrame:
    k = int(g["k"].iloc[0])
    nbrs = g["n"].to_numpy()
    m = min(k, int(nbrs.min()))
    bigger = np.unique(nbrs[nbrs > k])
    if not len(bigger):
        return pd.DataFrame({"u": [], "v": []}, dtype=np.int64)
    return pd.DataFrame({"u": np.full(len(bigger), m, np.int64),
                         "v": bigger})


def _orient_to_max(batch: pa.Table) -> pa.Table:
    # key every edge by its LARGER endpoint (u < v canonical → key = v)
    return pa.table({"k": batch["v"], "n": batch["u"]})


def _small_star_group(g: pd.DataFrame) -> pd.DataFrame:
    k = int(g["k"].iloc[0])
    nbrs = np.unique(g["n"].to_numpy())  # all < k by construction
    m = int(nbrs.min())
    others = nbrs[nbrs != m]
    out_u = np.full(len(others) + 1, m, np.int64)
    out_v = np.concatenate([others, [k]])
    return pd.DataFrame({"u": out_u, "v": out_v})


def _dedup_edges(edges):
    from ray.data.aggregate import Count

    return (edges.groupby(["u", "v"])
            .aggregate(Count(alias_name="_c"))
            .select_columns(["u", "v"]))


def _signature(edges) -> tuple[int, int]:
    """(edge count, order-independent 64-bit checksum) — one scalar pair
    to the driver per round."""
    def chk(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False).astype(np.uint64)
        v = batch["v"].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = (u * _MIX + v) * _MIX
            h ^= h >> np.uint64(29)
        # wrap-summed into one int64 per batch
        s = np.int64(h.view(np.int64).sum())
        return pa.table({"s": pa.array([int(s)], pa.int64()),
                         "c": pa.array([len(u)], pa.int64())})

    parts = edges.map_batches(chk, batch_format="pyarrow")
    agg = parts.sum(["s", "c"], ignore_nulls=True)
    if not agg or agg.get("sum(c)") is None:  # empty dataset
        return (0, 0)
    return (int(agg["sum(c)"]), int(agg["sum(s)"]))


def _driver_union_find(u: np.ndarray, v: np.ndarray) -> pa.Table:
    """Small-side exact path: union-find with path compression, labels =
    component min. Same output contract as the distributed rounds (the
    randomized parity tests pin both against each other)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(u.tolist(), v.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = np.fromiter(parent.keys(), dtype=np.int64, count=len(parent))
    labels = np.fromiter((find(int(n)) for n in nodes), dtype=np.int64,
                         count=len(nodes))
    return pa.table({"node": nodes, "label": labels})


def connected_components(pairs, id_a: str = "doc_a", id_b: str = "doc_b",
                         max_rounds: int = 32,
                         driver_threshold: int = 2_000_000):
    """Candidate pairs → per-node component labels.

    Returns a Dataset with columns ``node`` (int64) and ``label`` (int64,
    the component's minimum node id). Every node that appears in a pair
    gets a row; callers union singletons back in if they need them.

    Threshold switch (the ``q_nation_revenue`` pattern): below
    ``driver_threshold`` canonical edges the star rounds are pure fixed
    overhead (each round is ~5 Ray ops), so the edge list — already
    reduced to 16-byte rows, NOT the documents — is pulled once and
    union-found on the driver. Above it, the O(log n) large-star /
    small-star rounds run with no driver-side graph at all."""
    import ray.data

    edges = pairs.map_batches(lambda t: _canon(t, id_a, id_b),
                              batch_format="pyarrow").materialize()
    n_edges = edges.count()
    if n_edges <= driver_threshold:
        if n_edges == 0:
            return ray.data.from_arrow(pa.table({
                "node": pa.array([], pa.int64()),
                "label": pa.array([], pa.int64())}))
        df = edges.to_pandas()  # ≤ driver_threshold 16-byte rows by the gate
        return ray.data.from_arrow(_driver_union_find(
            df["u"].to_numpy(dtype=np.int64),
            df["v"].to_numpy(dtype=np.int64)))
    prev = None
    for _ in range(max_rounds):
        # large-star
        edges = (edges.map_batches(_both_directions, batch_format="pyarrow")
                 .groupby("k")
                 .map_groups(_large_star_group, batch_format="pandas"))
        # small-star
        edges = (edges.map_batches(_orient_to_max, batch_format="pyarrow")
                 .groupby("k")
                 .map_groups(_small_star_group, batch_format="pandas"))
        edges = _dedup_edges(edges).materialize()
        sig = _signature(edges)
        if sig == prev:
            break
        prev = sig
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds")

    if prev == (0, 0):  # no edges at all — keep a typed empty schema
        import ray.data

        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "label": pa.array([], pa.int64())}))

    def star_labels(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        return pa.table({"node": np.concatenate([v, u]),
                         "label": np.concatenate([u, u])})

    from ray.data.aggregate import Min

    return (edges.map_batches(star_labels, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Min("label", alias_name="label")))
