"""Multi-source BFS shortest distances over a Ray Data edge list.

The crawl-plane "distance from the seed list" signal: how many link
hops separate every discovered URL from the curated seeds (the
frontier-depth analog of the engine's per-wave ``depth``, but computed
globally over an arbitrary link graph rather than along the discovery
tree — a page first discovered at depth 7 may sit 2 hops from a
different seed). Standard synchronous Bellman-Ford rounds with unit
edge weights (public textbook algorithm; the Pregel/Giraph "hello
world").

**Integer-exact by construction**: distances are small ints, the only
operation is ``min(dist, min over in-edges (dist[src] + 1))`` — both
order-free — so every round is replayable bit-for-bit in SQL with
chained CTEs (sentinel ``UNREACHED`` instead of NULL keeps the
recurrence pure int64).

Same threshold-switched shape as ``ops/hits.py``:

- **broadcast path** (node table ≤ threshold): the distance vector is
  ``ray.put`` once per round; one streaming map over the (dense
  re-keyed once) edge blocks emits per-batch ``np.minimum.at``
  scatter partials — zero shuffles per round.
- **join path**: distances stay distributed — reached rows ⋈ edges on
  src, ``groupby(dst).min``, left-join back onto the node table.

At 10^10 nodes the broadcast path is out (the vector alone is 80 GB);
the join path moves only slim (node, dist) int rows per round, and the
round count is bounded by the requested horizon, not the diameter.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

UNREACHED = 2**62


def bfs_distances(
    edges,
    seeds,
    *,
    rounds: int = 4,
    broadcast_threshold: int = 2_000_000,
) -> "ray.data.Dataset":
    """Edge-list Dataset (src, dst int64, directed) + seed node ids →
    Dataset (node, dist) after ``rounds`` synchronous relaxations.
    ``dist`` is the exact hop count for nodes within ``rounds`` hops of
    a seed, -1 otherwise. ``seeds`` is a list[int] or a Dataset with a
    ``node`` column; seed nodes absent from the edge list still appear
    in the output (dist 0)."""
    edges = edges.select_columns(["src", "dst"]).materialize()
    if isinstance(seeds, ray.data.Dataset):
        seed_ids = np.unique(np.concatenate(
            [b["node"].to_numpy(zero_copy_only=False)
             for b in seeds.iter_batches(batch_format="pyarrow")]
            or [np.array([], dtype=np.int64)]).astype(np.int64))
    else:
        seed_ids = np.unique(np.asarray(sorted(seeds), dtype=np.int64))

    def node_rows(batch: pa.Table) -> pa.Table:
        s = np.unique(batch["src"].to_numpy(zero_copy_only=False))
        d = np.unique(batch["dst"].to_numpy(zero_copy_only=False))
        return pa.table({"node": pa.array(np.unique(
            np.concatenate([s, d])).astype(np.int64))})

    nodes = (edges.map_batches(node_rows, batch_format="pyarrow",
                               batch_size=None)
             .union(ray.data.from_arrow(pa.table(
                 {"node": pa.array(seed_ids, pa.int64())})))
             .groupby("node").count().drop_columns(["count()"])
             .materialize())
    n_nodes = nodes.count()
    if n_nodes == 0:
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "dist": pa.array([], pa.int64())}))
    if n_nodes <= broadcast_threshold:
        return _bfs_broadcast(edges, nodes, seed_ids, rounds)
    return _bfs_join(edges, nodes, seed_ids, rounds)


def _bfs_broadcast(edges, nodes, seed_ids: np.ndarray, rounds: int):
    """Dense-index path: one ``np.minimum.at`` scatter map per round,
    zero shuffles (the dense re-key is the only one-time exchange)."""
    node_ids = []
    for b in nodes.iter_batches(batch_format="pyarrow"):
        node_ids.extend(b["node"].to_pylist())
    node_arr = np.asarray(node_ids, dtype=np.int64)
    n = len(node_arr)
    idx_ref = ray.put({v: i for i, v in enumerate(node_ids)})

    def rekey(batch: pa.Table) -> pa.Table:
        import pandas as pd

        m = ray.get(idx_ref)
        return pa.table({
            "s": pa.array(pd.Series(batch["src"].to_pylist()).map(m)
                          .to_numpy(np.int32)),
            "d": pa.array(pd.Series(batch["dst"].to_pylist()).map(m)
                          .to_numpy(np.int32)),
        })

    dense = edges.map_batches(rekey, batch_format="pyarrow",
                              batch_size=None).materialize()

    dist = np.full(n, UNREACHED, dtype=np.int64)
    seed_set = set(seed_ids.tolist())
    dist[[i for i, v in enumerate(node_ids) if v in seed_set]] = 0

    for _ in range(rounds):
        ref = ray.put(dist)

        def partial(batch: pa.Table) -> pa.Table:
            dv = ray.get(ref)
            s = batch["s"].to_numpy(zero_copy_only=False)
            d = batch["d"].to_numpy(zero_copy_only=False)
            reached = dv[s] < UNREACHED
            if not reached.any():
                return pa.table({"i": pa.array([], pa.int64()),
                                 "v": pa.array([], pa.int64())})
            acc = np.full(len(dv), UNREACHED, dtype=np.int64)
            np.minimum.at(acc, d[reached], dv[s[reached]] + 1)
            nz = np.nonzero(acc < UNREACHED)[0]
            return pa.table({"i": pa.array(nz.astype(np.int64)),
                             "v": pa.array(acc[nz])})

        merged = np.full(n, UNREACHED, dtype=np.int64)
        for b in dense.map_batches(
            partial, batch_format="pyarrow", batch_size=None
        ).iter_batches(batch_format="pyarrow"):
            np.minimum.at(merged, b["i"].to_numpy(zero_copy_only=False),
                          b["v"].to_numpy(zero_copy_only=False))
        new = np.minimum(dist, merged)
        if np.array_equal(new, dist):
            break  # fixed point — further rounds are identity
        dist = new

    order = np.argsort(node_arr)
    out = dist[order]
    return ray.data.from_arrow(pa.table({
        "node": pa.array(node_arr[order], pa.int64()),
        "dist": pa.array(np.where(out < UNREACHED, out, -1), pa.int64()),
    }))


def _bfs_join(edges, nodes, seed_ids: np.ndarray, rounds: int):
    """Fully-distributed path: per round one inner join on src (reached
    rows only), one groupby(dst).min, one left join onto nodes —
    nothing node-sized ever visits the driver."""
    from ray.data.aggregate import Min

    from ..stages.ngram_lm import _join_partitions

    nparts = _join_partitions()
    seed_ref = ray.put(frozenset(int(x) for x in seed_ids))

    def init(batch: pa.Table) -> pa.Table:
        sset = ray.get(seed_ref)
        node = batch["node"].to_numpy(zero_copy_only=False)
        d = np.fromiter((0 if int(v) in sset else UNREACHED
                         for v in node), dtype=np.int64, count=len(node))
        return pa.table({"node": batch["node"], "dist": pa.array(d)})

    state = nodes.map_batches(init, batch_format="pyarrow").materialize()

    import pyarrow.compute as pc

    def reached_as_src(batch: pa.Table) -> pa.Table:
        keep = batch.filter(pc.less(batch["dist"], UNREACHED))
        return keep.rename_columns(["src", "dist"])

    for _ in range(rounds):
        keyed = state.map_batches(reached_as_src, batch_format="pyarrow")
        cand = (edges.join(keyed, join_type="inner",
                           num_partitions=nparts, on=("src",))
                .map_batches(
                    lambda b: pa.table(
                        {"node": b["dst"],
                         "cand": pc.add(b["dist"], 1)}),
                    batch_format="pyarrow")
                .groupby("node")
                .aggregate(Min("cand", alias_name="cand")))

        def relax(batch: pa.Table) -> pa.Table:
            d = batch["dist"].to_numpy(zero_copy_only=False)
            c = pc.fill_null(pc.cast(batch["cand"], pa.int64()),
                             UNREACHED).to_numpy(zero_copy_only=False)
            return pa.table({"node": batch["node"],
                             "dist": pa.array(np.minimum(d, c))})

        state = (state.join(cand, join_type="left_outer",
                            num_partitions=nparts, on=("node",))
                 .map_batches(relax, batch_format="pyarrow")
                 .materialize())

    def finalize(batch: pa.Table) -> pa.Table:
        d = batch["dist"].to_numpy(zero_copy_only=False)
        return pa.table({"node": batch["node"],
                         "dist": pa.array(
                             np.where(d < UNREACHED, d, -1))})

    return state.map_batches(finalize, batch_format="pyarrow")
