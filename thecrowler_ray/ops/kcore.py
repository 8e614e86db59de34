"""k-core peeling over a Ray Data edge list (public textbook algorithm
— Seidman 1983 "Network structure and minimum degree"; the synchronous
peel is the standard Pregel form).

The crawl-plane "dense nucleus" signal: the k-core of the link graph is
what survives when low-degree pages are peeled repeatedly — link farms
and genuinely central hubs sit in high cores, one-off leaf pages do
not (the reference ranks pages only by in-wave link counts,
``pkg/crawler`` crawl rules; the core is the global version of that
signal).

Semantics (pinned by the chained-CTE twin): the graph is UNDIRECTED —
input (src, dst) rows canonicalize to (min, max), self-loops drop,
parallel edges collapse. One peel round = degree over the current
surviving subgraph, then drop nodes with degree < k. After ``rounds``
peels the output is EVERY surviving node with its degree inside the
surviving subgraph (0 if all its neighbours were peeled in the final
round). Early stop at a fixed point is identity with the fixed-round
twin (nothing was removed, so every later round repeats). Everything is
exact integer counting — no ties, no floats.

Same threshold-switched shape as ``ops/bfs.py``:

- **broadcast path** (nodes ≤ threshold): edges dense re-keyed once
  (``gutil.dense_rekey``); per round ONE streaming map over the edge
  blocks emits per-batch ``np.bincount`` degree partials over
  still-alive endpoints — zero shuffles per round; the driver holds one
  bool + one int64 array.
- **join path**: the alive set stays distributed — per round two hash
  semi-joins (x, y) restrict the edge list, one groupby counts degrees,
  one filter peels. Only slim int rows move. Below
  ``small_set_threshold`` alive nodes the semi-join is done map-side
  with a broadcast frozenset (Ray's hash join misbehaves on empty
  partitions, and a join is overkill for a tiny set).

At 10^10 nodes the broadcast path is out (the masks alone are tens of
GB); the join path's per-round traffic is O(E_alive) slim int rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def k_core(
    edges,
    k: int,
    *,
    rounds: int = 3,
    broadcast_threshold: int = 2_000_000,
    small_set_threshold: int = 10_000,
) -> "ray.data.Dataset":
    """Edge-list Dataset (src, dst int64; treated undirected, dirty
    input tolerated) → Dataset (node, degree): nodes surviving
    ``rounds`` peels at threshold ``k``, with their degree in the
    surviving subgraph, sorted by node."""
    if k < 1:
        raise ValueError("k_core: k must be >= 1")

    def canon(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        uv = np.unique(np.stack(
            [np.minimum(s, d), np.maximum(s, d)], axis=1), axis=0)
        if uv.size == 0:
            uv = uv.reshape(0, 2)
        return pa.table({"x": pa.array(uv[:, 0]),
                         "y": pa.array(uv[:, 1])})

    # canonical distinct undirected edges: per-batch dedup combiner,
    # then one global groupby (the only all-to-all in setup)
    e = (edges.select_columns(["src", "dst"])
         .map_batches(canon, batch_format="pyarrow")
         .groupby(["x", "y"]).count().drop_columns(["count()"])
         .materialize())
    n_edges = e.count()
    if n_edges == 0:
        return _empty()
    cpus = int(ray.cluster_resources().get("CPU", 8))
    n_blocks = max(min(cpus, 8), min(64, int(n_edges // 2_000_000) + 1))
    e = e.repartition(n_blocks).materialize()

    def node_rows(batch: pa.Table) -> pa.Table:
        xs = np.unique(batch["x"].to_numpy(zero_copy_only=False))
        ys = np.unique(batch["y"].to_numpy(zero_copy_only=False))
        return pa.table({"node": pa.array(
            np.unique(np.concatenate([xs, ys])).astype(np.int64))})

    nodes = (e.map_batches(node_rows, batch_format="pyarrow",
                           batch_size=None)
             .groupby("node").count().drop_columns(["count()"])
             .materialize())
    if nodes.count() <= broadcast_threshold:
        return _kcore_broadcast(e, nodes, k, rounds)
    return _kcore_join(e, nodes, k, rounds, small_set_threshold)


def _empty():
    return ray.data.from_arrow(pa.table({
        "node": pa.array([], pa.int64()),
        "degree": pa.array([], pa.int64())}))


def _kcore_broadcast(e, nodes, k: int, rounds: int):
    """Dense-index path: one degree-partial scatter map per round."""
    from .gutil import collect_tables, dense_rekey, sorted_node_array

    node_arr = sorted_node_array(nodes)
    n = len(node_arr)
    dense = dense_rekey(e, node_arr, out_cols=("x", "y"),
                        in_cols=("x", "y"))

    def degree(alive: np.ndarray) -> np.ndarray:
        ref = ray.put(alive)

        def partial(batch: pa.Table) -> pa.Table:
            av = ray.get(ref)
            x = batch["x"].to_numpy(zero_copy_only=False)
            y = batch["y"].to_numpy(zero_copy_only=False)
            ok = av[x] & av[y]
            cnt = np.bincount(x[ok], minlength=len(av)).astype(np.int64)
            cnt += np.bincount(y[ok], minlength=len(av))
            nz = np.nonzero(cnt)[0]
            return pa.table({"i": pa.array(nz.astype(np.int64)),
                             "c": pa.array(cnt[nz])})

        deg = np.zeros(n, dtype=np.int64)
        for t in collect_tables(dense.map_batches(
            partial, batch_format="pyarrow", batch_size=None
        )):
            np.add.at(deg, t["i"].to_numpy(zero_copy_only=False),
                      t["c"].to_numpy(zero_copy_only=False))
        return deg

    alive = np.ones(n, dtype=bool)
    deg = None
    for _ in range(rounds):
        deg = degree(alive)
        new_alive = alive & (deg >= k)
        if np.array_equal(new_alive, alive):
            break  # fixed point — deg is over the final subgraph
        alive = new_alive
        deg = None  # stale: computed over the pre-peel subgraph
    if deg is None:
        deg = degree(alive)  # final report pass over the survivors
    return ray.data.from_arrow(pa.table({
        "node": pa.array(node_arr[alive], pa.int64()),
        "degree": pa.array(deg[alive], pa.int64())}))


def _kcore_join(e, nodes, k: int, rounds: int, small: int):
    """Fully-distributed path: alive set and degrees never visit the
    driver whole (above ``small``)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from ..stages.ngram_lm import _join_partitions
    from .gutil import collect_tables

    nparts = _join_partitions()

    def restrict(e_cur, alive, n_alive: int):
        """Edges with both endpoints alive."""
        if n_alive <= small:
            aset = set()
            for t in collect_tables(alive):
                aset.update(int(v) for v in t["node"].to_pylist())
            aref = ray.put(frozenset(aset))

            def both_alive(batch: pa.Table) -> pa.Table:
                av = ray.get(aref)
                x = batch["x"].to_numpy(zero_copy_only=False)
                y = batch["y"].to_numpy(zero_copy_only=False)
                ok = np.fromiter(
                    ((int(a) in av and int(b) in av)
                     for a, b in zip(x, y)),
                    dtype=bool, count=len(x))
                return batch.filter(pa.array(ok))

            return e_cur.map_batches(
                both_alive, batch_format="pyarrow").materialize()
        ax = alive.map_batches(lambda b: b.rename_columns(["x"]),
                               batch_format="pyarrow")
        ay = alive.map_batches(lambda b: b.rename_columns(["y"]),
                               batch_format="pyarrow")
        return (e_cur
                .join(ax, join_type="inner", num_partitions=nparts,
                      on=("x",))
                .join(ay, join_type="inner", num_partitions=nparts,
                      on=("y",))
                .select_columns(["x", "y"]).materialize())

    def degree(e_cur):
        def halves(batch: pa.Table) -> pa.Table:
            node = np.concatenate([
                batch["x"].to_numpy(zero_copy_only=False),
                batch["y"].to_numpy(zero_copy_only=False)])
            u, c = np.unique(node, return_counts=True)
            return pa.table({"node": pa.array(u.astype(np.int64)),
                             "c": pa.array(c.astype(np.int64))})

        return (e_cur.map_batches(halves, batch_format="pyarrow")
                .groupby("node").aggregate(Sum("c", alias_name="degree"))
                .materialize())

    alive = nodes
    n_alive = alive.count()
    e_alive = e
    final_deg = None
    for _ in range(rounds):
        if n_alive == 0:
            return _empty()
        e_alive = restrict(e_alive, alive, n_alive)
        deg = degree(e_alive)
        survivors = (deg.filter(lambda r: r["degree"] >= k)
                     .select_columns(["node"]).materialize())
        n_surv = survivors.count()
        if n_surv == n_alive:
            # fixed point: every alive node had degree >= k, so deg
            # covers exactly the final subgraph
            final_deg = deg
            alive = survivors
            break
        alive, n_alive = survivors, n_surv
    if n_alive == 0:
        return _empty()
    if final_deg is None:
        e_alive = restrict(e_alive, alive, n_alive)
        deg = degree(e_alive)
        # survivors with zero degree in the final subgraph have no deg
        # row — left-join them back as 0 (the twin's COALESCE)
        joined = alive.join(deg, join_type="left_outer",
                            num_partitions=nparts, on=("node",))
        final_deg = joined.map_batches(
            lambda b: pa.table({
                "node": b["node"],
                "degree": pc.fill_null(
                    pc.cast(b["degree"], pa.int64()), 0)}),
            batch_format="pyarrow")
    return final_deg.sort("node")
