"""Distributed triangle counting with degree orientation.

Graph-shape statistics for the link/co-occurrence plane (clustering
coefficients, community density — the standard corpus-graph health
signals). Degree orientation is the classic trick (Suri & Vassilvitskii
2011, "Counting Triangles and the Curse of the Last Reducer" — public
method): orient every undirected edge from the endpoint with the
smaller ``(degree, id)`` key to the larger, making the graph a DAG
where every out-degree is O(√E) — so the wedge (2-path) explosion that
kills naive triangle counting on hot nodes is bounded by construction,
and each triangle is enumerated exactly once (at its lowest-key apex).

Shape:

1. dedup + self-loop drop → canonical undirected edges (x < y), one
   ``groupby`` on slim id pairs;
2. degrees: one ``groupby`` over exploded endpoints;
3. orientation: degrees attach via broadcast dict (≤ threshold EDGES —
   the broadcast path ships an O(E) packed edge set, so edges key the
   switch) or two native joins above it;
4. wedges: apexes hash-shard and each shard emits orientation-ordered
   out-neighbor pairs for ALL its apexes in one vectorized run-length
   pass (per-apex fan-out ≤ out-degree ≤ O(√E); never one scheduler
   call per node);
5. close: wedge rows inner-join the oriented edges on (v, w) — each
   match is one triangle; per-node counts are a flat-map (3 rows per
   triangle) + one count groupby.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def _canonical_edges(edges):
    """Distinct undirected edges as (x, y) with x < y; self-loops drop."""
    def canon(batch: pa.Table) -> pa.Table:
        x = batch["x"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch["y"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = x != y
        x, y = x[keep], y[keep]
        lo = np.minimum(x, y)
        hi = np.maximum(x, y)
        # per-batch dedup (combiner) before the global one
        u = np.unique(np.stack([lo, hi], axis=1), axis=0)
        return pa.table({"x": pa.array(u[:, 0]), "y": pa.array(u[:, 1])})

    return (edges.map_batches(canon, batch_format="pyarrow")
            .groupby(["x", "y"]).count().drop_columns(["count()"]))


def triangle_counts(edges, *, broadcast_threshold: int = 2_000_000,
                    num_partitions: int | None = None,
                    pre_canonical: bool = False,
                    return_degrees: bool = False):
    """Edge-list Dataset (x, y int64; duplicates/self-loops/either
    orientation fine) → Dataset (node, triangles) for nodes in ≥1
    triangle.

    ``pre_canonical=True`` promises the input is already distinct
    undirected (x < y) edges, skipping a redundant full groupby+dedup.
    ``return_degrees=True`` returns ``(result, degrees)`` where
    ``degrees`` is the (node, deg) Dataset this op computes anyway —
    callers like the clustering coefficient need exactly that table
    and should not recompute it.

    The broadcast↔join switch keys on EDGE count: the broadcast path
    ships the packed O(E) oriented edge set to every worker via one
    ``ray.put``, so edges — not nodes — are what bound its memory."""
    from ray.data.aggregate import Sum

    cpus = int(ray.cluster_resources().get("CPU", 8))
    nparts = num_partitions or max(2, min(64, cpus // 2))
    e = edges if pre_canonical else _canonical_edges(edges)
    e = e.materialize()
    n_edges = e.count()
    deg = None
    if n_edges == 0:
        deg = ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "deg": pa.array([], pa.int64())}))
        empty = ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "triangles": pa.array([], pa.int64())}))
        return (empty, deg) if return_degrees else empty

    if n_edges <= broadcast_threshold:
        from .gutil import collect_tables

        # the packed edge set heads to the driver regardless in this
        # regime — so degrees come from ONE np.unique over the already
        # collected endpoints (np.unique returns sorted ids), not a
        # full distributed groupby pass over E
        x_parts, y_parts = [], []
        for b in collect_tables(e):
            x_parts.append(
                b["x"].to_numpy(zero_copy_only=False).astype(np.int64))
            y_parts.append(
                b["y"].to_numpy(zero_copy_only=False).astype(np.int64))
        x_all = np.concatenate(x_parts)
        y_all = np.concatenate(y_parts)
        nid_srt, cnts = np.unique(np.concatenate([x_all, y_all]),
                                  return_counts=True)
        dgv_srt = cnts.astype(np.int64)
        deg = ray.data.from_arrow(pa.table({
            "node": pa.array(nid_srt),
            "deg": pa.array(dgv_srt)}))

        # Broadcast close path, in RANK space: nodes re-key to their
        # dense rank in the (deg, id) orientation order, so the
        # orientation test, the within-apex out-neighbor ordering, AND
        # the edge-set key all become single-int comparisons — no
        # lexsort anywhere, just two np.sorts of packed int64s. The
        # oriented edge set ships ONCE, twice packed: sorted by
        # (src_rank, dst_rank) key for the close searchsorted, and
        # sorted by (src-hash shard, src_rank, dst_rank) with an
        # offsets table so each shard task SLICES its rows instead of
        # scanning or shuffling. Tasks fan out over a range() dataset,
        # explode wedges in chunked run-length vectorized passes and
        # close them in-worker. No E-row groupby(shard) shuffle, no
        # per-shard rescan, no per-apex Python loop. Output is
        # per-shard (node, count) partials into one small node groupby.
        n_nodes = len(nid_srt)
        kbits = max(1, int(n_nodes).bit_length())
        n_shards = max(16, nparts * 2)
        # ranks are dense so arbitrary int64 node ids pack fine; only
        # a pathologically large broadcast_threshold could overflow
        # the (shard, rs, rd) composite — fall to the join path then
        if 2 * kbits + int(n_shards).bit_length() <= 62:
            ord2 = np.lexsort((nid_srt, dgv_srt))  # V- not E-sized
            rank_of = np.empty(n_nodes, dtype=np.int64)
            rank_of[ord2] = np.arange(n_nodes, dtype=np.int64)
            id_by_rank = nid_srt[ord2]
            # orientation is a min/max in rank space
            rx = rank_of[np.searchsorted(nid_srt, x_all)]
            ry = rank_of[np.searchsorted(nid_srt, y_all)]
            rs_a = np.minimum(rx, ry)
            rd_a = np.maximum(rx, ry)
            edge_set = np.sort((rs_a << kbits) + rd_a)
            sh_a = rs_a * 2654435761 % n_shards
            by_shard = np.sort((sh_a << (2 * kbits)) + (rs_a << kbits)
                               + rd_a)
            offsets = np.searchsorted(by_shard >> (2 * kbits),
                                      np.arange(n_shards + 1))
            by_shard &= (1 << (2 * kbits)) - 1
            set_ref = ray.put((edge_set, by_shard, offsets,
                               id_by_rank))
            maskk = (1 << kbits) - 1

            def close_shards(batch: pa.Table) -> pa.Table:
                # arrow in/out: pandas blocks make the downstream node
                # groupby ~25x slower (stages/basket.py measurement)
                es, bysh, off, ids = ray.get(set_ref)
                nodes_acc, cnt_acc = [], []
                for sh in batch["id"].to_numpy(zero_copy_only=False):
                    rows = bysh[off[sh]:off[sh + 1]]
                    if len(rows) == 0:
                        continue
                    src = rows >> kbits
                    dst = rows & maskk
                    n = len(src)
                    starts = np.flatnonzero(
                        np.r_[True, src[1:] != src[:-1]])
                    ends = np.r_[starts[1:], n]
                    run_end = np.repeat(ends, ends - starts)
                    pos = np.arange(n)
                    reps = run_end - pos - 1
                    csum = np.cumsum(reps)
                    total = int(csum[-1]) if n else 0
                    if total == 0:
                        continue
                    # chunk rows so each vectorized explosion stays
                    # ~≤200k wedges — larger chunks blow the cache and
                    # collapse under full-node concurrency (measured
                    # 13 s/shard at 4M-wedge chunks vs 0.2 s at 200k,
                    # 32 concurrent tasks, sf0.1)
                    lo = 0
                    while lo < n:
                        base = csum[lo - 1] if lo else 0
                        hi = int(np.searchsorted(
                            csum, base + 200_000)) + 1
                        hi = min(hi, n)
                        r = reps[lo:hi]
                        t = int(r.sum())
                        if t == 0:
                            lo = hi
                            continue
                        out_start = np.cumsum(r) - r
                        p = pos[lo:hi]
                        w_idx = (np.arange(t)
                                 - np.repeat(out_start, r)
                                 + np.repeat(p + 1, r))
                        apex = np.repeat(src[lo:hi], r)
                        v = np.repeat(dst[lo:hi], r)
                        w = dst[w_idx]
                        key = (v << kbits) + w
                        hit = np.searchsorted(es, key)
                        ok = (hit < len(es)) & (es[np.minimum(
                            hit, len(es) - 1)] == key)
                        if ok.any():
                            tri_nodes = np.concatenate(
                                [apex[ok], v[ok], w[ok]])
                            u, c = np.unique(tri_nodes,
                                             return_counts=True)
                            nodes_acc.append(u)
                            cnt_acc.append(c)
                        lo = hi
                if not nodes_acc:
                    return pa.table({
                        "node": pa.array([], pa.int64()),
                        "t": pa.array([], pa.int64())})
                allu = np.concatenate(nodes_acc)
                allc = np.concatenate(cnt_acc)
                o2 = np.argsort(allu, kind="mergesort")
                u_s, c_s = allu[o2], allc[o2]
                first = np.r_[True, u_s[1:] != u_s[:-1]]
                idx = np.flatnonzero(first)
                return pa.table({
                    "node": pa.array(ids[u_s[idx]].astype(np.int64)),
                    "t": pa.array(np.add.reduceat(c_s, idx)
                                  .astype(np.int64))})

            res = (ray.data.range(n_shards,
                                  override_num_blocks=n_shards)
                   .map_batches(close_shards, batch_format="pyarrow")
                   .groupby("node")
                   .aggregate(Sum("t", alias_name="triangles")))
            return (res, deg) if return_degrees else res
    if True:
        # join path: degrees via a distributed endpoints groupby (the
        # edge set never visits the driver here), then attach each
        # endpoint's degree via two hash joins
        if deg is None:

            def endpoints(batch: pa.Table) -> pa.Table:
                xs = batch["x"].to_numpy(zero_copy_only=False)
                ys = batch["y"].to_numpy(zero_copy_only=False)
                u, c = np.unique(np.concatenate([xs, ys]),
                                 return_counts=True)
                return pa.table({"node": pa.array(u.astype(np.int64)),
                                 "d": pa.array(c.astype(np.int64))})

            deg = (e.map_batches(endpoints, batch_format="pyarrow")
                   .groupby("node")
                   .aggregate(Sum("d", alias_name="deg"))
                   .materialize())
        dx = deg.map_batches(
            lambda b: b.rename_columns(["x", "dx"]),
            batch_format="pyarrow")
        dy = deg.map_batches(
            lambda b: b.rename_columns(["y", "dy"]),
            batch_format="pyarrow")
        j = (e.join(dx, join_type="inner", num_partitions=nparts,
                    on=("x",))
             .join(dy, join_type="inner", num_partitions=nparts,
                   on=("y",)))

        def orient_j(batch: pa.Table) -> pa.Table:
            x = batch["x"].to_numpy(zero_copy_only=False)
            y = batch["y"].to_numpy(zero_copy_only=False)
            dx_ = batch["dx"].to_numpy(zero_copy_only=False)
            dy_ = batch["dy"].to_numpy(zero_copy_only=False)
            fwd = (dx_ < dy_) | ((dx_ == dy_) & (x < y))
            return pa.table({
                "src": pa.array(np.where(fwd, x, y).astype(np.int64)),
                "dst": pa.array(np.where(fwd, y, x).astype(np.int64)),
                "kd": pa.array(np.where(fwd, dy_, dx_).astype(np.int64)),
            })

        ep = j.map_batches(orient_j, batch_format="pyarrow").materialize()

    # Wedge generation hash-shards the apex and vectorizes the pair
    # explosion ACROSS apexes inside each shard (run-length repeat +
    # cumsum, the stages/basket.py pattern) — a bounded number of
    # map_groups calls instead of one scheduler round-trip per graph
    # node (150k tiny groups ≈ 200 s regardless of work).  Out-neighbor
    # order inside each apex run is the orientation key (kd, dst), so
    # the emitted (v, w) pair is exactly the orientation E+ stores.
    n_wshards = max(16, nparts * 2)

    def add_wshard(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "shard", pa.array((s * 2654435761 % n_wshards)
                              .astype(np.int64)))

    def wedge_shard(g: pa.Table) -> pa.Table:
        gs = g["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        gd = g["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        gk = g["kd"].to_numpy(zero_copy_only=False)
        order = np.lexsort((gd, gk, gs))
        src, dst = gs[order], gd[order]
        n = len(src)
        starts = np.flatnonzero(np.r_[True, src[1:] != src[:-1]])
        ends = np.r_[starts[1:], n]
        run_end = np.repeat(ends, ends - starts)
        pos = np.arange(n)
        reps = run_end - pos - 1
        total = int(reps.sum())
        if total == 0:
            return pa.table({"apex": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64()),
                             "w": pa.array([], pa.int64())})
        out_start = np.cumsum(reps) - reps
        w_idx = (np.arange(total) - np.repeat(out_start, reps)
                 + np.repeat(pos + 1, reps))
        return pa.table({
            "apex": pa.array(np.repeat(src, reps)),
            "v": pa.array(np.repeat(dst, reps)),
            "w": pa.array(dst[w_idx]),
        })

    # the join shuffles the wedge set anyway; materializing first lets us
    # early-exit the (schema-less) zero-wedge case
    wedge_ds = (ep.map_batches(add_wshard, batch_format="pyarrow")
                .groupby("shard")
                .map_groups(wedge_shard, batch_format="pyarrow")
                .materialize())
    if wedge_ds.count() == 0:
        empty = ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "triangles": pa.array([], pa.int64())}))
        return (empty, deg) if return_degrees else empty
    evw = ep.map_batches(
        lambda b: pa.table({"v": b["src"], "w": b["dst"]}),
        batch_format="pyarrow")
    tri = wedge_ds.join(evw, join_type="inner", num_partitions=nparts,
                        on=("v", "w"))

    def per_node(batch: pa.Table) -> pa.Table:
        nodes = np.concatenate([
            batch["apex"].to_numpy(zero_copy_only=False),
            batch["v"].to_numpy(zero_copy_only=False),
            batch["w"].to_numpy(zero_copy_only=False)])
        u, c = np.unique(nodes, return_counts=True)
        return pa.table({"node": pa.array(u.astype(np.int64)),
                         "t": pa.array(c.astype(np.int64))})

    res = (tri.map_batches(per_node, batch_format="pyarrow")
           .groupby("node").aggregate(Sum("t", alias_name="triangles")))
    return (res, deg) if return_degrees else res
