"""Distributed exclusive prefix sum (two-level scan).

Ray Data has no scan primitive; a training-data pipeline needs one for
sequence packing (assign documents to fixed-token-budget context windows),
global offsets for concatenated token streams, and resumable byte-offset
manifests. The classic two-pass decomposition keeps it scale-safe:

1. the ``order_col`` key space is split into ``n_buckets`` equal ranges
   (one cheap min/max aggregate); a per-batch combiner reduces each batch
   to at most ``n_buckets`` partial (bucket, sum) rows, so the first pass
   moves KB, not the table;
2. the driver scans the ≤``n_buckets``-row bucket totals into exclusive
   bucket offsets (broadcast back inside the group fn closure);
3. one ``groupby(bucket)`` shuffle co-locates each key range, and the
   in-group cumulative sum (sorted by ``order_col``) adds its bucket's
   offset.

Bucket sizes are data-dependent: with a dense-ish integer key the groups
are balanced; size ``n_buckets`` so dataset_rows / n_buckets fits a worker
(the one documented assumption). ``order_col`` must be unique — it is the
total order being scanned.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Max, Min, Sum

_B = "__scan_bucket"


def exclusive_prefix_sum(
    ds: "ray.data.Dataset",
    *,
    order_col: str,
    value_col: str,
    out_col: str = "cum_before",
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    """Append ``out_col`` = sum of ``value_col`` over all rows STRICTLY
    before this row in ``order_col`` order (exclusive scan, int64).

    The input is materialized first: the scan is inherently multi-pass
    (bounds, bucket totals, in-group cumsum), and without pinning, every
    pass re-executes the caller's upstream stages. Callers should project
    down to (order_col, value_col [+ carried columns]) before scanning —
    the pinned footprint is those columns only, not the source table."""
    ds = ds.materialize()
    bounds = ds.aggregate(Min(order_col), Max(order_col))
    lo, hi = bounds[f"min({order_col})"], bounds[f"max({order_col})"]
    span = max(int(hi) - int(lo) + 1, 1)
    width = max(span // n_buckets + 1, 1)
    lo = int(lo)

    def bucket_of(col: "pa.ChunkedArray") -> np.ndarray:
        v = col.to_numpy(zero_copy_only=False).astype(np.int64)
        return (v - lo) // width

    def partial(t: pa.Table) -> pa.Table:
        b = bucket_of(t[order_col])
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        u, inv = np.unique(b, return_inverse=True)
        s = np.bincount(inv, weights=v).astype(np.int64)
        return pa.table({_B: pa.array(u), "s": pa.array(s)})

    totals = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(_B)
        .aggregate(Sum("s"))
        .to_pandas()  # ≤ n_buckets rows — driver-safe by construction
        .sort_values(_B)
    )
    sums = np.zeros(n_buckets + 2, dtype="int64")
    sums[totals[_B].to_numpy().astype("int64")] = totals["sum(s)"].to_numpy()
    offsets = np.concatenate(([0], np.cumsum(sums)[:-1]))

    def attach(t: pa.Table) -> pa.Table:
        return t.append_column(_B, pa.array(bucket_of(t[order_col])))

    def scan_group(g: pa.Table) -> pa.Table:
        order = np.argsort(
            g[order_col].to_numpy(zero_copy_only=False), kind="mergesort")
        g = g.take(pa.array(order))
        v = g[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        base = int(offsets[int(g[_B][0].as_py())])
        return (g.drop_columns([_B])
                .append_column(out_col,
                               pa.array(base + np.cumsum(v) - v)))

    return (
        ds.map_batches(attach, batch_format="pyarrow")
        .groupby(_B)
        .map_groups(scan_group, batch_format="pyarrow")
    )
