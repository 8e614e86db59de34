"""HITS hubs & authorities (Kleinberg 1999) as deterministic integer
power iteration over a Ray Data edge list.

Complements PageRank (``ops/pagerank.py``) on the crawl/curation plane:
authorities surface frequently-linked content pages, hubs surface link
pages — the classic pair for seed selection and corpus weighting. The
reference engine has no whole-graph centrality (its link scores are
per-page heuristics, ``pkg/crawler/keywords.go``).

**Integer normalization — what makes every iteration hash-exact in
SQL**: the classical L2 normalization is irrational, so instead each
half-step divides by ``d = max(ceil(max_value / unit), 1)`` — pure int64
floor division that caps values at ``unit`` without ever leaving
integers. Scores are relative (HITS only orders nodes), so any
monotone per-iteration rescale yields the same ranking; DuckDB replays
the recurrence with chained CTEs, bit for bit:

    a_raw(v) = Σ_{(u,v)∈E} h(u);   a(v) = a_raw(v) // da
    h_raw(u) = Σ_{(u,v)∈E} a(v);   h(u) = h_raw(u) // dh

(int64 headroom: values ≤ unit after each half-step, so per-node sums
are ≤ max-degree·unit — q12 clears degree ~10^6; pass a smaller
``unit`` for web-scale degree, q6 clears ~10^12.)

Same threshold-switched shape as PageRank: a dense-index scatter
broadcast path with zero shuffles per iteration (the two global maxima
are node-sized driver reductions), and a fully-distributed join path
where only the two scalar maxima visit the driver per iteration.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

UNIT = 10**12


def _rescale_div(m: int, unit: int) -> int:
    """d = max(ceil(m / unit), 1) — the per-half-step divisor."""
    return max((int(m) + unit - 1) // unit, 1)


def hits(
    edges,
    *,
    iterations: int = 5,
    unit: int = UNIT,
    broadcast_threshold: int = 2_000_000,
) -> "ray.data.Dataset":
    """Edge-list Dataset (src, dst int64; parallel edges count as
    multiplicity) → Dataset (node, auth_q, hub_q) after ``iterations``
    full rounds, starting from h = unit on every node."""
    edges = edges.select_columns(["src", "dst"]).materialize()
    n_edges = edges.count()
    cpus = int(ray.cluster_resources().get("CPU", 8))
    n_blocks = max(min(cpus, 8), min(64, int(n_edges // 2_000_000) + 1))
    edges = edges.repartition(n_blocks).materialize()

    def node_rows(batch: pa.Table) -> pa.Table:
        s = np.unique(batch["src"].to_numpy(zero_copy_only=False))
        d = np.unique(batch["dst"].to_numpy(zero_copy_only=False))
        return pa.table({"node": pa.array(np.unique(
            np.concatenate([s, d])).astype(np.int64))})

    nodes = (edges.map_batches(node_rows, batch_format="pyarrow",
                               batch_size=None)
             .groupby("node").count().drop_columns(["count()"])
             .materialize())
    n_nodes = nodes.count()
    if n_nodes == 0:
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "auth_q": pa.array([], pa.int64()),
            "hub_q": pa.array([], pa.int64())}))
    if n_nodes <= broadcast_threshold:
        return _hits_broadcast(edges, nodes, iterations, unit)
    return _hits_join(edges, nodes, iterations, unit)


def _hits_broadcast(edges, nodes, iterations: int, unit: int):
    """Dense-index path (node table ≤ threshold): edges re-keyed once,
    each half-step is one streaming map over the edge blocks emitting
    sparse node-dense scatter partials — zero shuffles per iteration."""
    from .gutil import dense_rekey, sorted_node_array

    node_arr = sorted_node_array(nodes)
    n = len(node_arr)
    dense = dense_rekey(edges, node_arr)

    def half_step(vec: np.ndarray, gather: str, scatter: str) -> np.ndarray:
        ref = ray.put(vec)

        def partial(batch: pa.Table) -> pa.Table:
            v = ray.get(ref)
            g = batch[gather].to_numpy(zero_copy_only=False)
            s = batch[scatter].to_numpy(zero_copy_only=False)
            acc = np.zeros(n, dtype=np.int64)
            np.add.at(acc, s, v[g])
            nz = np.nonzero(acc)[0]
            return pa.table({"i": pa.array(nz.astype(np.int64)),
                             "v": pa.array(acc[nz])})

        from .gutil import collect_tables

        acc = np.zeros(n, dtype=np.int64)
        for b in collect_tables(dense.map_batches(
            partial, batch_format="pyarrow", batch_size=None
        )):
            np.add.at(acc, b["i"].to_numpy(zero_copy_only=False),
                      b["v"].to_numpy(zero_copy_only=False))
        d = _rescale_div(int(acc.max(initial=0)), unit)
        return acc // d

    h = np.full(n, unit, dtype=np.int64)
    a = np.zeros(n, dtype=np.int64)
    for _ in range(iterations):
        a = half_step(h, gather="s", scatter="d")   # authorities ← hubs
        h = half_step(a, gather="d", scatter="s")   # hubs ← authorities

    return ray.data.from_arrow(pa.table({
        "node": pa.array(node_arr, pa.int64()),
        "auth_q": pa.array(a, pa.int64()),
        "hub_q": pa.array(h, pa.int64()),
    }))


def _hits_join(edges, nodes, iterations: int, unit: int):
    """Fully-distributed path: scores never visit the driver — only the
    two per-iteration maxima do (``Dataset.max``, one scalar each)."""
    from ray.data.aggregate import Sum

    from ..stages.ngram_lm import _join_partitions

    nparts = _join_partitions()

    def init(batch: pa.Table) -> pa.Table:
        return pa.table({
            "node": batch["node"],
            "score": pa.array(np.full(batch.num_rows, unit,
                                      dtype=np.int64)),
        })

    h_state = nodes.map_batches(init, batch_format="pyarrow").materialize()

    def sum_over(state, join_key: str, group_key: str):
        """edges ⋈ state on join_key → Σ score per group_key, rescaled;
        missing nodes (no matching edges) re-enter as 0 via left join."""
        keyed = state.map_batches(
            lambda b, k=join_key: b.rename_columns([k, "score"]),
            batch_format="pyarrow")
        sums = (edges.join(keyed, join_type="inner",
                           num_partitions=nparts, on=(join_key,))
                .map_batches(
                    lambda b, g=group_key: pa.table(
                        {"node": b[g], "m": b["score"]}),
                    batch_format="pyarrow")
                .groupby("node")
                .aggregate(Sum("m", alias_name="m"))
                .materialize())
        mx = sums.max("m") if sums.count() else 0
        d = _rescale_div(int(mx or 0), unit)

        def rescale(batch: pa.Table) -> pa.Table:
            m = batch["m"].to_numpy(zero_copy_only=False)
            m = np.nan_to_num(m.astype(np.float64)).astype(np.int64)
            return pa.table({"node": batch["node"],
                             "score": pa.array(m // d)})

        return (nodes.join(sums, join_type="left_outer",
                           num_partitions=nparts, on=("node",))
                .map_batches(rescale, batch_format="pyarrow")
                .materialize())

    a_state = None
    for _ in range(iterations):
        a_state = sum_over(h_state, join_key="src", group_key="dst")
        h_state = sum_over(a_state, join_key="dst", group_key="src")

    def a_cols(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["node", "auth_q"])

    def h_cols(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["node", "hub_q"])

    return (a_state.map_batches(a_cols, batch_format="pyarrow")
            .join(h_state.map_batches(h_cols, batch_format="pyarrow"),
                  join_type="inner", num_partitions=nparts, on=("node",)))
