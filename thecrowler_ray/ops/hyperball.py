"""HyperBall (Boldi & Vigna 2013): per-node HyperLogLog sketches of
the r-hop in-neighborhood, computed as r rounds of element-wise
register MAX over the edge list — the algorithm behind the public
CommonCrawl/WebDataCommons harmonic-centrality rankings, and the only
practical way to ask "how many pages can reach this page in ≤ r hops"
at web scale (exact BFS per node is O(V·E)).

Register contract (the ``q_hll_users`` twin idiom, p = 4 → 16
registers): h(node) = the high 64 bits of md5(str(node)); bucket =
h >> 60; rho = 1-based position of the first set bit of the low 60
bits (61 if none). A node's initial sketch holds only its own hash;
after round k, node v's sketch is the HLL of {u : dist(u→v) ≤ k} —
because max-merge is idempotent/commutative/associative, duplicates
along multiple paths cost nothing and every round is replayable in
SQL as UNION ALL + GROUP BY MAX over SPARSE (node, ri, rv) rows.

Paths (``ops/bfs.py`` shape): dense (n × 16) broadcast matrix with
``np.maximum.at`` scatter partials (zero shuffles per round) below the
node threshold; above it, sparse register rows stay distributed —
edges ⋈ state on src, in-batch packed-key max combine, one
groupby-max per round (≤ 16 slim rows per node move, never the graph
payload).

Output is the sparse register table (node, ri, rv) — it pins the whole
computation integer-exactly; ``estimate_sizes`` turns it into the
float HLL cardinality estimate (outside the oracle gate).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray
import ray.data

P_BITS = 4
N_REG = 1 << P_BITS  # 16
RHO_CAP = 64 - P_BITS + 1  # 61


def _hash64(node_ids: np.ndarray) -> np.ndarray:
    """h = high 64 bits of md5(str(node)) — matches the SQL idiom
    ('0x' || substr(md5(CAST(node AS VARCHAR)), 1, 16))::UBIGINT."""
    out = np.empty(len(node_ids), dtype=np.uint64)
    for i, v in enumerate(node_ids):
        out[i] = int.from_bytes(
            hashlib.md5(str(int(v)).encode()).digest()[:8], "big")
    return out


def _bucket_rho(h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    bucket = (h >> np.uint64(64 - P_BITS)).astype(np.int64)
    low = h << np.uint64(P_BITS)  # the 60 payload bits, MSB-aligned
    rem = low.copy()
    pos = np.ones(len(h), dtype=np.int64)
    live = rem != 0
    # leading-zero count via 6 halving steps (vectorized clz)
    width = 32
    while width >= 1:
        top = rem >> np.uint64(64 - width)
        zero_top = (top == 0) & live
        pos = np.where(zero_top, pos + width, pos)
        rem = np.where(zero_top, rem << np.uint64(width), rem)
        width //= 2
    rho = np.where(live, np.minimum(pos, RHO_CAP), RHO_CAP)
    # positions beyond the 60 payload bits mean "no set bit" -> cap
    rho = np.minimum(rho, RHO_CAP)
    return bucket, rho.astype(np.int64)


def hyperball(
    edges,
    *,
    rounds: int = 2,
    broadcast_threshold: int = 2_000_000,
) -> "ray.data.Dataset":
    """Edge-list Dataset (src, dst int64; a directed edge src→dst
    folds src's sketch into dst's) → sparse register Dataset
    (node, ri, rv) after ``rounds`` max-merge rounds."""
    edges = edges.select_columns(["src", "dst"]).materialize()
    # bounded block count — each round re-maps the edges (ops/hits.py)
    n_edges = edges.count()
    cpus = int(ray.cluster_resources().get("CPU", 8))
    n_blocks = max(min(cpus, 8),
                   min(64, int(n_edges // 2_000_000) + 1))
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
            "ri": pa.array([], pa.int64()),
            "rv": pa.array([], pa.int64())}))
    if n_nodes <= broadcast_threshold:
        return _hb_broadcast(edges, nodes, rounds)
    return _hb_join(edges, nodes, rounds)


def _init_sparse(batch: pa.Table) -> pa.Table:
    node = batch["node"].to_numpy(zero_copy_only=False)
    bucket, rho = _bucket_rho(_hash64(node))
    return pa.table({"node": pa.array(node.astype(np.int64)),
                     "ri": pa.array(bucket),
                     "rv": pa.array(rho)})


def _hb_broadcast(edges, nodes, rounds: int):
    from .gutil import dense_rekey, sorted_node_array

    node_arr = sorted_node_array(nodes)
    n = len(node_arr)
    dense = dense_rekey(edges, node_arr)

    regs = np.zeros((n, N_REG), dtype=np.int64)
    bucket, rho = _bucket_rho(_hash64(node_arr))
    regs[np.arange(n), bucket] = rho

    for _ in range(rounds):
        ref = ray.put(regs)

        def partial(batch: pa.Table) -> pa.Table:
            rv = ray.get(ref)
            s = batch["s"].to_numpy(zero_copy_only=False)
            d = batch["d"].to_numpy(zero_copy_only=False)
            acc = np.zeros((rv.shape[0], N_REG), dtype=np.int64)
            np.maximum.at(acc, d, rv[s])
            nz = np.nonzero(acc.any(axis=1))[0]
            return pa.table({
                "i": pa.array(nz.astype(np.int64)),
                "r": pa.array(list(acc[nz]),
                              type=pa.list_(pa.int64())),
            })

        from .gutil import collect_tables

        merged = np.zeros((n, N_REG), dtype=np.int64)
        for b in collect_tables(dense.map_batches(
            partial, batch_format="pyarrow", batch_size=None
        )):
            ii = b["i"].to_numpy(zero_copy_only=False)
            rr = np.stack(b["r"].to_pandas().to_numpy())
            np.maximum.at(merged, ii, rr)
        new = np.maximum(regs, merged)
        if np.array_equal(new, regs):
            break  # fixed point — max-merge rounds are idempotent
        regs = new

    order = np.argsort(node_arr)
    nn, rr = np.nonzero(regs[order])
    return ray.data.from_arrow(pa.table({
        "node": pa.array(node_arr[order][nn], pa.int64()),
        "ri": pa.array(rr.astype(np.int64)),
        "rv": pa.array(regs[order][nn, rr]),
    }))


def _hb_join(edges, nodes, rounds: int):
    """Sparse registers stay distributed: per round one hash join on
    src, an in-batch packed-key max combine, one groupby(node,ri)
    max."""
    from ray.data.aggregate import Max

    from ..stages.ngram_lm import _join_partitions

    nparts = _join_partitions()
    state = nodes.map_batches(_init_sparse,
                              batch_format="pyarrow").materialize()

    def combine(batch: pa.Table) -> pa.Table:
        node = batch["node"].to_numpy(zero_copy_only=False)
        ri = batch["ri"].to_numpy(zero_copy_only=False)
        rv = batch["rv"].to_numpy(zero_copy_only=False)
        key = node * N_REG + ri
        order = np.lexsort((-rv, key))
        k_s, r_s = key[order], rv[order]
        first = np.ones(len(k_s), dtype=bool)
        first[1:] = k_s[1:] != k_s[:-1]
        return pa.table({
            "node": pa.array((k_s[first] // N_REG).astype(np.int64)),
            "ri": pa.array((k_s[first] % N_REG).astype(np.int64)),
            "rv": pa.array(r_s[first]),
        })

    for _ in range(rounds):
        keyed = state.map_batches(
            lambda b: pa.table({"src": b["node"], "ri": b["ri"],
                                "rv": b["rv"]}),
            batch_format="pyarrow")
        moved = (edges.join(keyed, join_type="inner",
                            num_partitions=nparts, on=("src",))
                 .map_batches(
                     lambda b: combine(pa.table(
                         {"node": b["dst"], "ri": b["ri"],
                          "rv": b["rv"]})),
                     batch_format="pyarrow"))
        state = (state.union(moved)
                 .groupby(["node", "ri"])
                 .aggregate(Max("rv", alias_name="rv"))
                 .materialize())

    return state


def estimate_sizes(regs_ds) -> "ray.data.Dataset":
    """Sparse register rows → (node, est) float HLL estimates with the
    standard small-range (linear counting) correction — the human-
    facing view; the oracle gate pins the registers themselves.

    Grouped by a uniform NODE-HASH SHARD, each shard estimating every
    node in one vectorized reduceat pass (never one map_groups call per
    node), Arrow blocks through the exchange. Input rows are distinct
    (node, ri) by the ball construction's register groupby; absent
    registers count as rv = 0."""
    import ray

    ALPHA_16 = 0.673  # Flajolet et al. 2007, m = 16
    m = N_REG
    n_shards = max(16, int(ray.cluster_resources().get("CPU", 8)) * 2)

    def add_shard(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy(zero_copy_only=False).astype(np.uint64)
        sh = ((node * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)) \
            % np.uint64(n_shards)
        return t.append_column("shard", pa.array(sh.astype(np.int32)))

    def est_shard(g: pa.Table) -> pa.Table:
        node = g["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        rv = g["rv"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(node, kind="mergesort")
        node, rv = node[order], rv[order]
        starts = np.flatnonzero(np.r_[True, node[1:] != node[:-1]])
        ends = np.r_[starts[1:], len(node)]
        n_present = ends - starts
        denom = (np.add.reduceat(np.power(2.0, -rv), starts)
                 + (m - n_present))  # absent registers contribute 2^0
        zeros = (m - n_present) + np.add.reduceat(
            (rv == 0).astype(np.int64), starts)
        e = ALPHA_16 * m * m / denom
        small = (e <= 2.5 * m) & (zeros > 0)
        e = np.where(small, m * np.log(m / np.maximum(zeros, 1)), e)
        return pa.table({"node": pa.array(node[starts]),
                         "est": pa.array(e.astype(np.float64))})

    return (regs_ds.map_batches(add_shard, batch_format="pyarrow")
            .groupby("shard")
            .map_groups(est_shard, batch_format="pyarrow"))
