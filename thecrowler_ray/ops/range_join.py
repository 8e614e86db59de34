"""Distributed range (interval) join.

Ray Data has no native range join; the reference's closest analog is the
time-window event correlation in its events plane (``pkg/events`` rule
timers and the correlated "observations within [T0,T1]" lookups of
``pkg/database/entity_correlation_timeseries.go``). A training-data
pipeline needs the general form: join each probe row ``(key, t)`` to every
interval row ``(key, start, end)`` with ``start <= t <= end`` — e.g.
"attribute every click in the 24 h before each purchase".

Shape (the documented partitioning assumption): time is bucketized at a
fixed ``bucket_width``; each interval is REPLICATED to every bucket it
overlaps (``floor(end/W) - floor(start/W) + 1`` copies — choose the width
near the typical interval span so the replication factor stays ~2), each
probe goes to exactly ONE bucket, and a single ``groupby([by, bucket])``
co-partitions both sides. Inside a group the match is a sorted
``searchsorted`` sweep — O((n+m)·log + output), never a cross product.
Because a probe lives in exactly one bucket and every interval containing
that probe's time also overlaps that bucket, each matching pair is emitted
exactly once — no dedup pass. Group size is bounded by per-(key, window)
activity, never by dataset size; a hot key costs one large group, not a
serialized stage.

All stages are Arrow in/out: pandas blocks feeding the co-partitioning
groupby pay the measured ~25x exchange tax (PERF.md session-8). Null fill
columns are typed from the other side's schema so all unioned blocks share
one Arrow schema.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

_SIDE = "__rj_side"
_BUCKET = "__rj_bucket"
_S = "__rj_s"
_E = "__rj_e"


def _to_i64(arr: "pa.ChunkedArray") -> np.ndarray:
    """Numeric view for bucketing: timestamps → epoch integers, ints pass
    through. Floats are rejected (bucket boundaries would be inexact)."""
    v = arr.to_numpy(zero_copy_only=False)
    if np.issubdtype(v.dtype, np.datetime64):
        return v.astype("int64")
    if np.issubdtype(v.dtype, np.integer):
        return v.astype("int64")
    raise TypeError(
        f"range_join on/start/end must be timestamp or integer, got {v.dtype}"
    )


def range_join(
    probe: "ray.data.Dataset",
    intervals: "ray.data.Dataset",
    *,
    by: str,
    on: str,
    start: str,
    end: str,
    bucket_width: int,
    suffix: str = "_iv",
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Inner range join: one output row per (probe, interval) pair with
    equal ``by`` and ``start <= on <= end`` (both ends inclusive).

    ``bucket_width`` is in the ``on`` column's native integer units
    (microseconds for ``timestamp[us]``). Output carries all probe columns
    plus the interval's columns; interval columns that collide with a
    probe column are renamed ``<col><suffix>``.
    """
    p_schema = probe.schema()
    i_schema = intervals.schema()
    p_types = dict(zip(p_schema.names, p_schema.types))
    pnames = list(p_schema.names)
    inames = list(i_schema.names)
    carry = [c for c in inames if c != by]
    out_names = {c: (c + suffix if c in pnames else c) for c in carry}
    W = int(bucket_width)

    def tag_probe(t: pa.Table) -> pa.Table:
        n = t.num_rows
        tv = _to_i64(t[on])
        cols = {c: t[c] for c in pnames}
        cols[_BUCKET] = pa.array(tv // W)
        cols[_S] = pa.array(tv)  # unused probe-side; keeps the column typed
        cols[_E] = pa.array(tv)
        for c in carry:
            cols["__i_" + c] = pa.nulls(n, i_schema.types[inames.index(c)])
        cols[_SIDE] = pa.array(np.zeros(n, dtype=np.int8))
        return pa.table(cols)

    def tag_intervals(t: pa.Table) -> pa.Table:
        n = t.num_rows
        s = _to_i64(t[start])
        e = _to_i64(t[end])
        if n and (e < s).any():
            raise ValueError("range_join: interval end < start")
        sb, eb = s // W, e // W
        reps = (eb - sb + 1) if n else np.zeros(0, "int64")
        idx = np.repeat(np.arange(n), reps)
        # bucket sequence sb..eb per interval via the cumsum-offset trick
        offs = np.arange(int(reps.sum())) - np.repeat(
            np.cumsum(reps) - reps, reps)
        idx_pa = pa.array(idx)
        cols = {}
        for c in pnames:  # same column order/schema as tag_probe
            if c == by:
                cols[c] = t[by].take(idx_pa)
            elif c == on:
                # fill with the interval start (same dtype family); merge
                # never reads `on` from interval rows
                filled = t[start].take(idx_pa)
                if filled.type != p_types[on]:
                    filled = filled.cast(p_types[on])
                cols[c] = filled
            else:
                cols[c] = pa.nulls(len(idx), p_types[c])
        cols[_BUCKET] = pa.array(sb[idx] + offs)
        cols[_S] = pa.array(s[idx])
        cols[_E] = pa.array(e[idx])
        for c in carry:
            cols["__i_" + c] = t[c].take(idx_pa)
        cols[_SIDE] = pa.array(np.ones(len(idx), dtype=np.int8))
        return pa.table(cols)

    pt = probe.map_batches(tag_probe, batch_format="pyarrow")
    it = intervals.map_batches(tag_intervals, batch_format="pyarrow")
    unioned = pt.union(it)
    if num_partitions is not None:
        # the groupby's sort shuffle is O(blocks²) tasks; on small inputs
        # (many near-empty upstream blocks) coalescing first removes that
        # fixed cost — at scale leave None and let block count ride the data
        unioned = unioned.repartition(num_partitions)

    def empty_out(g: pa.Table) -> pa.Table:
        # zero-row slices keep the union block's types, so empty groups
        # emit schema-compatible blocks
        cols = {c: g[c].slice(0, 0) for c in pnames}
        for c in carry:
            cols[out_names[c]] = g["__i_" + c].slice(0, 0)
        return pa.table(cols)

    import ray as _ray

    n_shards = max(16, int(_ray.cluster_resources().get("CPU", 8)) * 2)
    _GOLD = np.uint64(0x9E3779B97F4A7C15)

    def add_shard(t: pa.Table) -> pa.Table:
        kv = t[by].to_numpy(zero_copy_only=False)
        if kv.dtype.kind in "iu":
            h = (kv.astype(np.uint64) * _GOLD) >> np.uint64(33)
        else:
            import pandas as pd

            h = pd.util.hash_array(
                np.asarray(kv, dtype=object)).astype(np.uint64)
        h = (h * _GOLD) ^ (t[_BUCKET].to_numpy(zero_copy_only=False)
                           .astype(np.uint64) * _GOLD >> np.uint64(33))
        return t.append_column(
            "_rshard", pa.array((h % np.uint64(n_shards)).astype(np.int32)))

    def merge_shard(g: pa.Table) -> pa.Table:
        # every (key, bucket) group of the shard in ONE vectorized pass —
        # a map_groups call per group is a scheduler round-trip per
        # active bucket (the stages/basket.py measurement). Group-local
        # searchsorted becomes a global one over (group-id, ts-rank)
        # composite keys: ranks are monotone in ts, so within-group
        # comparisons are preserved, and the group id dominates the key
        # (K > max rank), so probes never match across groups.
        import pandas as pd

        sidev = g[_SIDE].to_numpy(zero_copy_only=False)
        byv = g[by].to_numpy(zero_copy_only=False)
        bcodes = (byv.astype(np.int64) if byv.dtype.kind in "iu"
                  else pd.factorize(byv)[0].astype(np.int64))
        bkt = g[_BUCKET].to_numpy(zero_copy_only=False).astype(np.int64)
        gid = np.unique(np.stack([bcodes, bkt], axis=1), axis=0,
                        return_inverse=True)[1].astype(np.int64)
        pmask = sidev == 0
        if not pmask.any() or pmask.all():
            return empty_out(g)
        p_gid, p_ts = gid[pmask], g[_S].to_numpy(
            zero_copy_only=False)[pmask]
        order = np.lexsort((p_ts, p_gid))
        prows = g.filter(pa.array(pmask)).take(pa.array(order))
        p_gid, p_ts = p_gid[order], p_ts[order]
        sorted_ts = np.sort(p_ts)
        K = np.int64(len(p_ts) + 2)
        comp_p = p_gid * K + np.searchsorted(sorted_ts, p_ts, "left")
        irows = g.filter(pa.array(~pmask))
        i_gid = gid[~pmask]
        s = irows[_S].to_numpy(zero_copy_only=False)
        e = irows[_E].to_numpy(zero_copy_only=False)
        lo = np.searchsorted(
            comp_p, i_gid * K + np.searchsorted(sorted_ts, s, "left"))
        hi = np.searchsorted(
            comp_p, i_gid * K + np.searchsorted(sorted_ts, e, "right"))
        cnt = np.maximum(hi - lo, 0)
        total = int(cnt.sum())
        if not total:
            return empty_out(g)
        iidx = np.repeat(np.arange(irows.num_rows), cnt)
        pidx = (
            np.arange(total)
            - np.repeat(np.cumsum(cnt) - cnt, cnt)
            + np.repeat(lo, cnt)
        )
        pout = prows.take(pa.array(pidx))
        iout = irows.take(pa.array(iidx))
        cols = {c: pout[c] for c in pnames}
        for c in carry:
            cols[out_names[c]] = iout["__i_" + c]
        return pa.table(cols)

    return (unioned.map_batches(add_shard, batch_format="pyarrow")
            .groupby("_rshard")
            .map_groups(merge_shard, batch_format="pyarrow"))
