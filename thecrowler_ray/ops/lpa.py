"""Synchronous label propagation (Raghavan et al. 2007, deterministic
variant) over a Ray Data edge list — community detection for the
crawl/curation plane (site clusters from the link graph, topic
clusters from co-occurrence graphs), the cheap precursor to per-
community sampling quotas in a training-data mixture.

The classical algorithm breaks ties randomly and updates
asynchronously; neither is replayable, so this uses the standard
deterministic synchronous form: every node starts as its own label,
and each round every node with in-neighbors adopts

    argmax over neighbor labels by (count DESC, label ASC)

computed from the PREVIOUS round's labels (isolated nodes keep their
label). Min-label ties + synchronous rounds make each iteration a pure
function of the last — DuckDB replays it with chained CTEs
(COUNT + ROW_NUMBER per round), bit for bit.

The argmax is shuffled as a single int64 ``Max`` by packing
``(count, label)`` into ``count * 2^33 + (2^33 - 1 - label)`` —
monotone in (count ASC, label DESC), so Max(packed) = first of
(count DESC, label ASC). Headroom: labels (= node ids) < 2^33,
in-degree < 2^30; assert-guarded.

Per round: one ``map_batches`` over the edge blocks emitting per-batch
partial (node, label, count) rows (in-batch combine via np.unique on
the packed pair), one ``groupby`` sum + one ``groupby`` max — slim int
rows only, the text/edge payload never moves. Labels live either in a
broadcast array (≤ threshold) or stay distributed behind a hash join
(same threshold switch as ``ops/pagerank.py``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

LAB_BITS = 33
LAB_MASK = (1 << LAB_BITS) - 1


def _pack(count: np.ndarray, label: np.ndarray) -> np.ndarray:
    return (count.astype(np.int64) << LAB_BITS) + (LAB_MASK - label)


def label_propagation(
    edges,
    *,
    iterations: int = 4,
    broadcast_threshold: int = 2_000_000,
) -> "ray.data.Dataset":
    """Edge-list Dataset (src, dst int64; a directed edge src→dst makes
    src's label visible to dst; pass both directions for an undirected
    graph; parallel edges = multiplicity) → Dataset (node, label) after
    ``iterations`` synchronous rounds."""
    edges = edges.select_columns(["src", "dst"]).materialize()
    # coalesce to a bounded block count: every iteration re-maps the
    # edge list, so hundreds of tiny input blocks become hundreds of
    # scheduled tasks PER ROUND (the ops/hits.py lesson)
    n_edges = edges.count()
    cpus = int(ray.cluster_resources().get("CPU", 8))
    n_blocks = max(min(cpus, 8),
                   min(64, int(n_edges // 2_000_000) + 1))
    edges = edges.repartition(n_blocks).materialize()

    def node_rows(batch: pa.Table) -> pa.Table:
        s = np.unique(batch["src"].to_numpy(zero_copy_only=False))
        d = np.unique(batch["dst"].to_numpy(zero_copy_only=False))
        u = np.unique(np.concatenate([s, d])).astype(np.int64)
        if len(u) and (u.min() < 0 or u.max() >= (1 << LAB_BITS)):
            raise ValueError("label_propagation: node ids must be in "
                             f"[0, 2^{LAB_BITS})")
        return pa.table({"node": pa.array(u)})

    nodes = (edges.map_batches(node_rows, batch_format="pyarrow",
                               batch_size=None)
             .groupby("node").count().drop_columns(["count()"])
             .materialize())
    n_nodes = nodes.count()
    if n_nodes == 0:
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "label": pa.array([], pa.int64())}))
    if n_nodes <= broadcast_threshold:
        return _lpa_broadcast(edges, nodes, iterations)
    return _lpa_join(edges, nodes, iterations)


def _pair_count_arrays(
    dst: np.ndarray, lab: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """In-batch combiner: distinct (dst, label) pairs + counts via one
    lexsort (np.unique(axis=1) is an order of magnitude slower — it
    round-trips through a void dtype)."""
    d = dst.astype(np.int64)
    l = lab.astype(np.int64)
    order = np.lexsort((l, d))
    d_s, l_s = d[order], l[order]
    first = np.ones(len(d_s), dtype=bool)
    if len(d_s):
        first[1:] = (d_s[1:] != d_s[:-1]) | (l_s[1:] != l_s[:-1])
    idx = np.nonzero(first)[0]
    counts = np.diff(np.append(idx, len(d_s)))
    return d_s[idx], l_s[idx], counts.astype(np.int64)


def _partial_counts(dst: np.ndarray, lab: np.ndarray) -> pa.Table:
    """Arrow wrapper over ``_pair_count_arrays`` — the shuffle moves
    ≤ distinct-pairs rows per block instead of one row per edge."""
    d, l, c = _pair_count_arrays(dst, lab)
    return pa.table({
        "node": pa.array(d),
        "lab": pa.array(l),
        "c": pa.array(c),
    })


def _argmax_labels(pair_counts):
    """(node, lab, c) partials → (node, new_lab) via Sum then packed
    Max; both shuffles move slim int rows."""
    from ray.data.aggregate import Max, Sum

    summed = (pair_counts.groupby(["node", "lab"])
              .aggregate(Sum("c", alias_name="c")))

    def pack(batch: pa.Table) -> pa.Table:
        c = batch["c"].to_numpy(zero_copy_only=False)
        lab = batch["lab"].to_numpy(zero_copy_only=False)
        if len(c) and c.max() >= (1 << 30):
            raise ValueError("label_propagation: in-degree ≥ 2^30")
        return pa.table({"node": batch["node"],
                         "packed": pa.array(_pack(c, lab))})

    packed = summed.map_batches(pack, batch_format="pyarrow")
    return (packed.groupby("node")
            .aggregate(Max("packed", alias_name="packed")))


def _lpa_broadcast(edges, nodes, iterations: int):
    """Dense-index path: zero shuffles per iteration — the per-batch
    (dense-dst, label) pair-count partials fold on the driver (bounded
    by the distinct-pair count ≤ |E|, the same budget as the edge
    list), and the argmax is one vectorized lexsort."""
    from .gutil import dense_rekey, sorted_node_array

    node_arr = sorted_node_array(nodes)
    n = len(node_arr)
    dense = dense_rekey(edges, node_arr)

    labels = node_arr.copy()  # label0(v) = v
    for _ in range(iterations):
        ref = ray.put(labels)

        def partial(batch: pa.Table) -> pa.Table:
            lv = ray.get(ref)
            s = batch["s"].to_numpy(zero_copy_only=False)
            d = batch["d"].to_numpy(zero_copy_only=False)
            dd, ll, cc = _pair_count_arrays(d, lv[s])
            # pack (dense idx, label) into one int64: idx ≤ threshold
            # < 2^30, label < 2^33 — guarded at build
            return pa.table({
                "k": pa.array((dd << LAB_BITS) + ll),
                "c": pa.array(cc),
            })

        from .gutil import collect_tables

        ks, cs = [], []
        for b in collect_tables(dense.map_batches(
            partial, batch_format="pyarrow", batch_size=None
        )):
            ks.append(b["k"].to_numpy(zero_copy_only=False))
            cs.append(b["c"].to_numpy(zero_copy_only=False))
        if not ks:
            break
        k = np.concatenate(ks)
        c = np.concatenate(cs)
        # fold duplicate pair keys across blocks, then argmax per node
        # by (count DESC, label ASC) in one lexsort
        order = np.argsort(k, kind="mergesort")
        k_s, c_s = k[order], c[order]
        first = np.ones(len(k_s), dtype=bool)
        first[1:] = k_s[1:] != k_s[:-1]
        idx0 = np.nonzero(first)[0]
        c_tot = np.add.reduceat(c_s, idx0)
        k_u = k_s[idx0]
        d_u = (k_u >> LAB_BITS).astype(np.int64)
        l_u = (k_u & LAB_MASK).astype(np.int64)
        pick = np.lexsort((l_u, -c_tot, d_u))
        d_p = d_u[pick]
        lead = np.ones(len(d_p), dtype=bool)
        lead[1:] = d_p[1:] != d_p[:-1]
        new = labels.copy()
        new[d_p[lead]] = l_u[pick][lead]
        if np.array_equal(new, labels):
            break  # fixed point — further rounds are identity
        labels = new

    return ray.data.from_arrow(pa.table({
        "node": pa.array(node_arr, pa.int64()),
        "label": pa.array(labels, pa.int64()),
    }))


def _lpa_join(edges, nodes, iterations: int):
    """Fully-distributed path: labels never visit the driver — per
    round one hash join on src, the two slim groupbys, one left join
    back onto the node table."""
    import pyarrow.compute as pc

    from ..stages.ngram_lm import _join_partitions

    nparts = _join_partitions()

    state = nodes.map_batches(
        lambda b: pa.table({"node": b["node"], "label": b["node"]}),
        batch_format="pyarrow").materialize()

    for _ in range(iterations):
        keyed = state.map_batches(
            lambda b: b.rename_columns(["src", "label"]),
            batch_format="pyarrow")

        def emit(batch: pa.Table) -> pa.Table:
            return _partial_counts(
                batch["dst"].to_numpy(zero_copy_only=False),
                batch["label"].to_numpy(zero_copy_only=False))

        picked = _argmax_labels(
            edges.join(keyed, join_type="inner",
                       num_partitions=nparts, on=("src",))
            .map_batches(emit, batch_format="pyarrow"))

        def adopt(batch: pa.Table) -> pa.Table:
            pk = pc.cast(batch["packed"], pa.int64())
            picked_lab = pc.subtract(
                LAB_MASK, pc.bit_wise_and(pk, LAB_MASK))
            lab = pc.if_else(pc.is_valid(pk), picked_lab,
                             batch["label"])
            return pa.table({"node": batch["node"],
                             "label": pc.cast(lab, pa.int64())})

        state = (state.join(picked, join_type="left_outer",
                            num_partitions=nparts, on=("node",))
                 .map_batches(adopt, batch_format="pyarrow")
                 .materialize())

    return state
