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
    # bounded block count — each round re-maps the edges (ops/hits.py)
    n_edges = edges.count()
    cpus = int(ray.cluster_resources().get("CPU", 8))
    n_blocks = max(min(cpus, 8),
                   min(64, int(n_edges // 2_000_000) + 1))
    edges = edges.repartition(n_blocks).materialize()
    if isinstance(seeds, ray.data.Dataset):
        from .gutil import collect_tables

        seed_ids = np.unique(np.concatenate(
            [t["node"].to_numpy(zero_copy_only=False)
             for t in collect_tables(seeds)]
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
    from .gutil import dense_rekey, sorted_node_array

    node_arr = sorted_node_array(nodes)
    n = len(node_arr)
    dense = dense_rekey(edges, node_arr)

    dist = np.full(n, UNREACHED, dtype=np.int64)
    dist[np.isin(node_arr, seed_ids)] = 0

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

        from .gutil import collect_tables

        merged = np.full(n, UNREACHED, dtype=np.int64)
        for b in collect_tables(dense.map_batches(
            partial, batch_format="pyarrow", batch_size=None
        )):
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

    from .gutil import collect_tables

    def reached_as_src(batch: pa.Table) -> pa.Table:
        keep = batch.filter(pc.less(batch["dist"], UNREACHED))
        return keep.rename_columns(["src", "dist"])

    for _ in range(rounds):
        keyed = state.map_batches(reached_as_src,
                                  batch_format="pyarrow").materialize()
        n_reached = keyed.count()
        if n_reached <= max(nparts * 8, 10_000):
            # tiny frontier: Ray's hash join crashes on empty right
            # partitions, and a join is overkill anyway — broadcast
            # the reached rows and emit candidates map-side (bounded:
            # ≤ 10k rows)
            rd_parts = collect_tables(keyed)
            rmap = {}
            for t in rd_parts:
                rmap.update(zip(t["src"].to_pylist(),
                                t["dist"].to_pylist()))
            rref = ray.put(rmap)

            def emit_cand(batch: pa.Table) -> pa.Table:
                rm = ray.get(rref)
                src = batch["src"].to_numpy(zero_copy_only=False)
                dst = batch["dst"].to_numpy(zero_copy_only=False)
                dv = np.fromiter((rm.get(int(v), -1) for v in src),
                                 dtype=np.int64, count=len(src))
                ok = dv >= 0
                return pa.table({
                    "node": pa.array(dst[ok].astype(np.int64)),
                    "cand": pa.array(dv[ok] + 1)})

            joined = edges.map_batches(emit_cand,
                                       batch_format="pyarrow")
        else:
            joined = (edges.join(keyed, join_type="inner",
                                 num_partitions=nparts, on=("src",))
                      .map_batches(
                          lambda b: pa.table(
                              {"node": b["dst"],
                               "cand": pc.add(b["dist"], 1)}),
                          batch_format="pyarrow"))
        cand = (joined.groupby("node")
                .aggregate(Min("cand", alias_name="cand")))

        cand = cand.materialize()
        if cand.count() <= max(nparts * 8, 10_000):
            cmap = {}
            for t in collect_tables(cand):
                cmap.update(zip(t["node"].to_pylist(),
                                t["cand"].to_pylist()))
            cref = ray.put(cmap)

            def relax_bc(batch: pa.Table) -> pa.Table:
                cm = ray.get(cref)
                node = batch["node"].to_numpy(zero_copy_only=False)
                d = batch["dist"].to_numpy(zero_copy_only=False)
                c = np.fromiter(
                    (cm.get(int(v), UNREACHED) for v in node),
                    dtype=np.int64, count=len(node))
                return pa.table({"node": batch["node"],
                                 "dist": pa.array(np.minimum(d, c))})

            state = (state.map_batches(relax_bc,
                                       batch_format="pyarrow")
                     .materialize())
            continue

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
