"""Distributed as-of join.

Ray Data has no native as-of join; the reference's closest analogs are the
correlated "latest snapshot before T" lookups in its time-series plane
(``pkg/database/entity_correlation_timeseries.go`` — most-recent-observation
subqueries) and event attribution in ``pkg/events``. This operator gives the
engine a first-class as-of join the way a training-data pipeline needs it
(feature attribution: "join each sample to the latest label/event at or
before its timestamp, per key").

Shape (the documented partitioning assumption): ONE ``groupby(by)`` over the
union of both sides — a single co-partitioning shuffle instead of two — then
a per-key sorted ``searchsorted`` merge inside ``map_groups``. Each group
holds only one key's rows from both sides, so group size is bounded by
per-key activity, never by dataset size; a skewed key costs one large group,
not a serialized stage. Backward/forward direction and strict inequality are
supported; ties within a side are broken by input order (stable sort).

All stages are Arrow in/out: pandas blocks feeding the co-partitioning
groupby pay the measured ~25x exchange tax (PERF.md session-8). Output
types are pinned by an explicit schema built from both input schemas so
no-match groups (all-null right columns) can never drift a block's type.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

_SIDE_COL = "__asof_side"


def asof_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    *,
    by: str,
    on: str,
    direction: str = "backward",
    allow_equal: bool = True,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """For each left row, attach the right row with the greatest ``on`` <=
    left's ``on`` (direction="backward") or smallest ``on`` >= left's
    (direction="forward"), matching on ``by``. Left rows with no match keep
    nulls in the right columns (left-join semantics).

    ``right_cols`` limits which right columns are carried (default: all but
    ``by``/``on``); carried columns are renamed ``<col><suffix>`` only when
    they collide with a left column. The ``on`` value of the matched right
    row is always emitted as ``<on><suffix>``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, got {direction!r}")

    l_schema = left.schema()
    r_schema = right.schema()
    l_types = dict(zip(l_schema.names, l_schema.types))
    r_types = dict(zip(r_schema.names, r_schema.types))
    left_names = list(l_schema.names)
    carry = right_cols if right_cols is not None else [
        c for c in r_schema.names if c not in (by, on)
    ]
    out_names = {
        c: (c + suffix if c in left_names else c) for c in carry
    }
    on_out = on + suffix

    # union with a side tag; null-fill each side's missing columns (typed
    # from the OTHER side's schema) so the unioned blocks share one Arrow
    # schema and the co-partitioning shuffle stays zero-copy
    def tag_left(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {c: t[c] for c in left_names}
        for c in carry:
            cols["__r_" + c] = pa.nulls(n, r_types[c])
        cols[_SIDE_COL] = pa.array(np.zeros(n, dtype=np.int8))
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {}
        for c in left_names:  # same column order as tag_left
            if c == by:
                cols[c] = t[by]
            elif c == on:
                cols[c] = t[on]
            else:
                cols[c] = pa.nulls(n, l_types[c])
        for c in carry:
            cols["__r_" + c] = t[c]
        cols[_SIDE_COL] = pa.array(np.ones(n, dtype=np.int8))
        return pa.table(cols)

    lt = left.map_batches(tag_left, batch_format="pyarrow")
    rt = right.map_batches(tag_right, batch_format="pyarrow")
    unioned = lt.union(rt)
    if num_partitions is not None:
        # the groupby's sort shuffle is O(blocks²) tasks; on small inputs
        # (many near-empty upstream blocks) coalescing first removes that
        # fixed cost — at scale leave None and let block count ride the data
        unioned = unioned.repartition(num_partitions)

    back = direction == "backward"
    side = "right" if (back == allow_equal) else "left"

    def merge(g: pa.Table) -> pa.Table:
        onv = g[on].to_numpy(zero_copy_only=False)
        g = g.take(pa.array(np.argsort(onv, kind="mergesort")))
        lmask = g[_SIDE_COL].to_numpy(zero_copy_only=False) == 0
        lrows = g.filter(pa.array(lmask))
        rrows = g.filter(pa.array(~lmask))
        # empty lrows flows through both branches: filter keeps types, so
        # a right-only key yields a schema-correct zero-row block
        out = {c: lrows[c] for c in left_names}
        if rrows.num_rows:
            rts = rrows[on].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(
                rts, lrows[on].to_numpy(zero_copy_only=False), side=side)
            if back:
                idx = pos - 1
                ok = idx >= 0
            else:
                idx = pos
                ok = idx < len(rts)
            idx = np.clip(idx, 0, max(len(rts) - 1, 0))
            # null index → null row: take() carries no-match as nulls
            idx_pa = pa.array(idx.astype(np.int64), mask=~ok)
            out[on_out] = rrows[on].combine_chunks().take(idx_pa)
            for c in carry:
                out[out_names[c]] = (
                    rrows["__r_" + c].combine_chunks().take(idx_pa))
        else:
            nl = lrows.num_rows
            out[on_out] = pa.nulls(nl, r_types[on])
            for c in carry:
                out[out_names[c]] = pa.nulls(nl, r_types[c])
        return pa.table(out)

    return unioned.groupby(by).map_groups(merge, batch_format="pyarrow")
