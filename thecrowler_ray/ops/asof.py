"""Distributed as-of join.

Ray Data has no native as-of join; the reference's closest analogs are the
correlated "latest snapshot before T" lookups in its time-series plane
(``pkg/database/entity_correlation_timeseries.go`` — most-recent-observation
subqueries) and event attribution in ``pkg/events``. This operator gives the
engine a first-class as-of join the way a training-data pipeline needs it
(feature attribution: "join each sample to the latest label/event at or
before its timestamp, per key").

Shape (the documented partitioning assumption): ONE ``groupby(hash-shard of
by)`` over the union of both sides — a single co-partitioning shuffle
instead of two — then ONE segmented scan per shard resolves every key at
once (a ``map_groups`` call per key is a scheduler round-trip per join key;
the stages/basket.py measurement). Keys are fully co-located per shard, so
a skewed key costs one large shard, not a serialized stage.
Backward/forward direction and strict inequality are supported; ties within
a side are broken by input order (stable sort).

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
    # tie placement between sides at equal `on` reproduces the
    # searchsorted side parameter of a per-key merge: eligible-at-equal
    # rights must precede lefts in the ascending scan (backward) / follow
    # them so the reversed scan meets them first (forward)
    rights_first = back == allow_equal

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
        return t.append_column(
            "_ashard", pa.array((h % np.uint64(n_shards)).astype(np.int32)))

    def merge_shard(g: pa.Table) -> pa.Table:
        # every key of the shard in ONE segmented scan — a map_groups
        # call per join key is a scheduler round-trip per key (the
        # stages/basket.py measurement); the per-key "latest right so
        # far" is a keyed running max over an encoding that can never
        # leak across key runs (run r's base exceeds run r-1's ceiling)
        import pandas as pd

        n = g.num_rows
        kv = g[by].to_numpy(zero_copy_only=False)
        codes = (kv.astype(np.int64) if kv.dtype.kind in "iu"
                 else pd.factorize(kv)[0].astype(np.int64))
        onv = g[on].to_numpy(zero_copy_only=False)
        sidev = g[_SIDE_COL].to_numpy(zero_copy_only=False).astype(np.int64)
        tie = (1 - sidev) if rights_first else sidev
        order = np.lexsort((tie, onv, codes))
        g = g.take(pa.array(order))
        codes, sidev = codes[order], sidev[order]
        is_right = sidev == 1

        def scan(codes_, right_):
            run_id = np.cumsum(np.r_[True, codes_[1:] != codes_[:-1]]) - 1
            enc = run_id * (n + 1) + np.where(right_,
                                              np.arange(n) + 1, 0)
            acc = np.maximum.accumulate(enc)
            return acc % (n + 1) - 1  # -1 = no right seen in this run

        if back:
            idx = scan(codes, is_right)
        else:
            idx_r = scan(codes[::-1], is_right[::-1])
            idx = np.where(idx_r >= 0, n - 1 - idx_r, -1)[::-1]

        lmask = sidev == 0
        lrows = g.filter(pa.array(lmask))
        out = {c: lrows[c] for c in left_names}
        idx_l = idx[lmask]
        ok = idx_l >= 0
        idx_pa = pa.array(np.maximum(idx_l, 0).astype(np.int64), mask=~ok)
        # null index → null row: take() carries no-match as nulls
        out[on_out] = g[on].combine_chunks().take(idx_pa)
        for c in carry:
            out[out_names[c]] = g["__r_" + c].combine_chunks().take(idx_pa)
        return pa.table(out)

    return (unioned.map_batches(add_shard, batch_format="pyarrow")
            .groupby("_ashard")
            .map_groups(merge_shard, batch_format="pyarrow"))
