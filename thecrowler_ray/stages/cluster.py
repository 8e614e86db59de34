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

Both stars group by a uniform NODE-HASH SHARD (≈2× cluster cores), and
each shard resolves ALL its nodes in one vectorized numpy pass over
sorted runs — never one ``map_groups`` call per node (one scheduler
round-trip per tiny group: 150k groups ≈ 200 s measured), Arrow blocks
in and out of every exchange. No driver-side graph, no whole-component
group (a run holds one node's adjacency, which large-star keeps
shrinking), and the edge set converges to per-component stars in
O(log n) rounds. Each round is three shuffles (two stars + a canonical
dedup); the convergence probe ships one (count, checksum) scalar pair
to the driver per round.

The reference engine deduplicates pages only pairwise/exact
(``pkg/crawler/crawler.go`` exact URL/content hashes); this operator is
part of the training-data plane this repo adds on top.
"""

from __future__ import annotations

import numpy as np
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


def _add_k_shard(t: pa.Table, n_shards: int) -> pa.Table:
    k = t["k"].to_numpy(zero_copy_only=False).astype(np.uint64)
    sh = ((k * _MIX) >> np.uint64(33)) % np.uint64(n_shards)
    return t.append_column("shard", pa.array(sh.astype(np.int32)))


def _sorted_runs(g: pa.Table):
    """(k, n) rows → per-node runs: sorted, (k, n)-deduped arrays plus
    run boundaries. One numpy pass covers EVERY node in the shard —
    never one scheduler call per node (the 150k-groups ≈ 200 s tax)."""
    k = g["k"].to_numpy(zero_copy_only=False).astype(np.int64)
    nb = g["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((nb, k))
    k, nb = k[order], nb[order]
    dup = np.r_[False, (k[1:] == k[:-1]) & (nb[1:] == nb[:-1])]
    k, nb = k[~dup], nb[~dup]
    starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
    ends = np.r_[starts[1:], len(k)]
    return k, nb, starts, ends


_EMPTY_EDGES = pa.table({"u": pa.array([], pa.int64()),
                         "v": pa.array([], pa.int64())})


def _large_star_shard(g: pa.Table) -> pa.Table:
    # per node k: m = min(Γ(k) ∪ {k}); emit (m, v) for neighbors v > k
    k, nb, starts, ends = _sorted_runs(g)
    if not len(k):
        return _EMPTY_EDGES
    m = np.repeat(np.minimum(nb[starts], k[starts]), ends - starts)
    keep = nb > k
    if not keep.any():
        return _EMPTY_EDGES
    return pa.table({"u": pa.array(m[keep]), "v": pa.array(nb[keep])})


def _orient_to_max(batch: pa.Table) -> pa.Table:
    # key every edge by its LARGER endpoint (u < v canonical → key = v)
    return pa.table({"k": batch["v"], "n": batch["u"]})


def _small_star_shard(g: pa.Table) -> pa.Table:
    # per node k (larger endpoint): m = min(Γ(k)), all neighbors < k;
    # emit (m, x) for the other neighbors plus (m, k)
    k, nb, starts, ends = _sorted_runs(g)
    if not len(k):
        return _EMPTY_EDGES
    m_run = nb[starts]
    m = np.repeat(m_run, ends - starts)
    keep = nb != m
    return pa.table({
        "u": pa.array(np.concatenate([m[keep], m_run])),
        "v": pa.array(np.concatenate([nb[keep], k[starts]])),
    })


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
    import ray

    n_shards = max(16, int(ray.cluster_resources().get("CPU", 8)) * 2)
    prev = None
    for _ in range(max_rounds):
        # large-star — grouped by uniform NODE-HASH SHARD, each shard
        # resolving all its nodes in one vectorized pass (Arrow blocks)
        edges = (edges.map_batches(_both_directions, batch_format="pyarrow")
                 .map_batches(lambda t: _add_k_shard(t, n_shards),
                              batch_format="pyarrow")
                 .groupby("shard")
                 .map_groups(_large_star_shard, batch_format="pyarrow"))
        # small-star
        edges = (edges.map_batches(_orient_to_max, batch_format="pyarrow")
                 .map_batches(lambda t: _add_k_shard(t, n_shards),
                              batch_format="pyarrow")
                 .groupby("shard")
                 .map_groups(_small_star_shard, batch_format="pyarrow"))
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
