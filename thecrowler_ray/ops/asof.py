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
"""

from __future__ import annotations

import numpy as np
import pandas as pd
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

    left_names = [n for n in left.schema().names]
    rnames = right.schema().names
    carry = right_cols if right_cols is not None else [
        c for c in rnames if c not in (by, on)
    ]
    out_names = {
        c: (c + suffix if c in left_names else c) for c in carry
    }
    on_out = on + suffix

    # union with a side tag; null-fill each side's missing columns so the
    # schemas align (one shuffle co-partitions both sides)
    def tag_left(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        for c in carry:
            df["__r_" + c] = None
        df[_SIDE_COL] = np.int8(0)
        return df

    def tag_right(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame()
        for c in left_names:  # same column order as tag_left
            if c == by:
                out[c] = df[by]
            elif c == on:
                out[c] = df[on]
            else:
                out[c] = None
        for c in carry:
            out["__r_" + c] = df[c]
        out[_SIDE_COL] = np.int8(1)
        return out

    lt = left.map_batches(tag_left, batch_format="pandas")
    rt = right.map_batches(tag_right, batch_format="pandas")
    unioned = lt.union(rt)
    if num_partitions is not None:
        # the groupby's sort shuffle is O(blocks²) tasks; on small inputs
        # (many near-empty upstream blocks) coalescing first removes that
        # fixed cost — at scale leave None and let block count ride the data
        unioned = unioned.repartition(num_partitions)

    back = direction == "backward"
    side = "right" if (back == allow_equal) else "left"

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([on], kind="mergesort")
        lmask = g[_SIDE_COL].to_numpy() == 0
        lrows = g[lmask]
        rrows = g[~lmask]
        # empty lrows flows through both branches: slicing keeps dtypes, so
        # a clicks-only key yields a schema-correct zero-row block
        out = lrows[left_names].copy()
        if len(rrows):
            rts = rrows[on].to_numpy()
            pos = np.searchsorted(rts, lrows[on].to_numpy(), side=side)
            if back:
                idx = pos - 1
                ok = idx >= 0
            else:
                idx = pos
                ok = idx < len(rts)
            idx = np.clip(idx, 0, len(rts) - 1)
            matched = rrows.iloc[idx]
            oks = pd.Series(ok, index=out.index)
            out[on_out] = pd.Series(
                matched[on].to_numpy(), index=out.index
            ).where(oks)
            for c in carry:
                out[out_names[c]] = pd.Series(
                    matched["__r_" + c].to_numpy(), index=out.index
                ).where(oks)
        else:
            # all-null in on's dtype family (int64→NaN, datetime→NaT),
            # matching the dtype the matched-path .where() would produce
            out[on_out] = lrows[on].where(pd.Series(False, index=out.index))
            for c in carry:
                out[out_names[c]] = None
        return out

    return unioned.groupby(by).map_groups(merge, batch_format="pandas")
