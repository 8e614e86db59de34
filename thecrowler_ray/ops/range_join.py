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
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

_SIDE = "__rj_side"
_BUCKET = "__rj_bucket"
_S = "__rj_s"
_E = "__rj_e"


def _to_i64(s: pd.Series) -> np.ndarray:
    """Numeric view for bucketing: timestamps → epoch integers, ints pass
    through. Floats are rejected (bucket boundaries would be inexact)."""
    v = s.to_numpy()
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
    pnames = list(probe.schema().names)
    inames = list(intervals.schema().names)
    carry = [c for c in inames if c != by]
    out_names = {c: (c + suffix if c in pnames else c) for c in carry}
    W = int(bucket_width)

    def tag_probe(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        t = _to_i64(df[on])
        df[_BUCKET] = t // W
        df[_S] = t  # unused on the probe side; keeps the column typed
        df[_E] = t
        for c in carry:
            df["__i_" + c] = None
        df[_SIDE] = np.int8(0)
        return df

    def tag_intervals(df: pd.DataFrame) -> pd.DataFrame:
        s = _to_i64(df[start])
        e = _to_i64(df[end])
        if len(df) and (e < s).any():
            raise ValueError("range_join: interval end < start")
        sb, eb = s // W, e // W
        reps = (eb - sb + 1) if len(df) else np.zeros(0, "int64")
        idx = np.repeat(np.arange(len(df)), reps)
        # bucket sequence sb..eb per interval via the cumsum-offset trick
        offs = np.arange(int(reps.sum())) - np.repeat(np.cumsum(reps) - reps, reps)
        out = pd.DataFrame()
        for c in pnames:  # same column order/schema as tag_probe
            if c == by:
                out[c] = df[by].to_numpy()[idx]
            elif c == on:
                # fill with the interval start (same dtype family); merge
                # never reads `on` from interval rows
                out[c] = df[start].to_numpy()[idx]
            else:
                out[c] = pd.Series([None] * len(idx), dtype="object")
        out[_BUCKET] = sb[idx] + offs
        out[_S] = s[idx]
        out[_E] = e[idx]
        for c in carry:
            out["__i_" + c] = df[c].to_numpy()[idx]
        out[_SIDE] = np.int8(1)
        return out

    pt = probe.map_batches(tag_probe, batch_format="pandas")
    it = intervals.map_batches(tag_intervals, batch_format="pandas")
    unioned = pt.union(it)
    if num_partitions is not None:
        # the groupby's sort shuffle is O(blocks²) tasks; on small inputs
        # (many near-empty upstream blocks) coalescing first removes that
        # fixed cost — at scale leave None and let block count ride the data
        unioned = unioned.repartition(num_partitions)

    def empty_out(g: pd.DataFrame) -> pd.DataFrame:
        # zero-row slice keeps the union block's dtypes, so empty groups
        # emit schema-compatible blocks
        out = g.iloc[:0][pnames].copy()
        for c in carry:
            out[out_names[c]] = g.iloc[:0]["__i_" + c]
        return out

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        side = g[_SIDE].to_numpy()
        prows = g[side == 0].sort_values(_S, kind="mergesort")
        irows = g[side == 1]
        if not len(prows) or not len(irows):
            return empty_out(g)
        ts = prows[_S].to_numpy().astype("int64")
        s = irows[_S].to_numpy().astype("int64")
        e = irows[_E].to_numpy().astype("int64")
        lo = np.searchsorted(ts, s, side="left")
        hi = np.searchsorted(ts, e, side="right")
        cnt = np.maximum(hi - lo, 0)
        total = int(cnt.sum())
        if not total:
            return empty_out(g)
        iidx = np.repeat(np.arange(len(irows)), cnt)
        pidx = (
            np.arange(total)
            - np.repeat(np.cumsum(cnt) - cnt, cnt)
            + np.repeat(lo, cnt)
        )
        out = prows.iloc[pidx][pnames].reset_index(drop=True)
        matched = irows.iloc[iidx]
        for c in carry:
            out[out_names[c]] = matched["__i_" + c].to_numpy()
        return out

    return unioned.groupby([by, _BUCKET]).map_groups(merge, batch_format="pandas")
