"""Per-group top-k with a per-batch partial combiner.

Global top-k already exists (``sort + limit`` / ``_PartialBottomK`` in
``stages/sample.py``); this is the grouped form a training-data pipeline
uses for stratified selection ("best k documents per language", "top k
clicks per user"). The shuffle-reduction idea mirrors the engine's other
combiners (``ops/agg.py``): each input batch is first reduced to at most
``k`` rows PER GROUP KEY PRESENT IN THE BATCH, so the one ``groupby``
shuffle moves O(k × groups-per-batch × batches) rows instead of the whole
table; the final per-group head(k) runs in ``map_groups`` over those
survivors. Ties are broken by the trailing ``order_cols`` — pass a unique
column last for fully deterministic output.

Arrow in/out throughout (pandas blocks feeding the groupby pay the
measured ~25x exchange tax); the per-batch partial vectorizes the
"head(k) of every group in the batch" with one sort + run-length rank
pass instead of a pandas groupby.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def topk_per_group(
    ds: "ray.data.Dataset",
    *,
    group_cols: list[str],
    order_cols: list[str],
    k: int,
    ascending: list[bool] | bool = True,
    rank_col: str | None = None,
) -> "ray.data.Dataset":
    """Keep the first ``k`` rows of every group under the total order
    ``order_cols``/``ascending``. With ``rank_col``, emit the 1-based
    in-group rank as an extra int64 column."""
    asc = ([ascending] * len(order_cols) if isinstance(ascending, bool)
           else list(ascending))
    sort_keys = [(c, "ascending" if a else "descending")
                 for c, a in zip(order_cols, asc)]

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        # sort by the order, then stable-sort by group id: within each
        # group run, rows sit in order — keep the first k of every run
        t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
        gid = np.zeros(t.num_rows, dtype=np.int64)
        for c in group_cols:
            codes = (t[c].combine_chunks().dictionary_encode()
                     .indices.to_numpy(zero_copy_only=False)
                     .astype(np.int64))
            gid = gid * (int(codes.max()) + 1 if len(codes) else 1) + codes
        order = np.argsort(gid, kind="mergesort")
        gs = gid[order]
        starts = np.flatnonzero(np.r_[True, gs[1:] != gs[:-1]])
        pos_in_run = np.arange(len(gs)) - np.repeat(
            starts, np.diff(np.r_[starts, len(gs)]))
        return t.take(pa.array(order[pos_in_run < k]))

    from .gutil import append_key_shard, default_n_shards

    n_shards = default_n_shards()

    def final_shard(g: pa.Table) -> pa.Table:
        # every group of the shard in one vectorized pass (a map_groups
        # call per group is a scheduler round-trip per group key); same
        # run-length trick as `partial`, plus the in-group rank
        g = g.drop_columns(["_tshard"])
        g = g.take(pc.sort_indices(g, sort_keys=sort_keys))
        gid = np.zeros(g.num_rows, dtype=np.int64)
        for c in group_cols:
            codes = (g[c].combine_chunks().dictionary_encode()
                     .indices.to_numpy(zero_copy_only=False)
                     .astype(np.int64))
            gid = gid * (int(codes.max()) + 1 if len(codes) else 1) + codes
        order = np.argsort(gid, kind="mergesort")
        gs = gid[order]
        starts = np.flatnonzero(np.r_[True, gs[1:] != gs[:-1]])
        pos_in_run = np.arange(len(gs)) - np.repeat(
            starts, np.diff(np.r_[starts, len(gs)]))
        keep = pos_in_run < k
        out = g.take(pa.array(order[keep]))
        if rank_col is not None:
            out = out.append_column(
                rank_col, pa.array(pos_in_run[keep] + 1))
        return out

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(lambda t: append_key_shard(t, group_cols, n_shards,
                                                "_tshard"),
                     batch_format="pyarrow")
        .groupby("_tshard")
        .map_groups(final_shard, batch_format="pyarrow")
    )
