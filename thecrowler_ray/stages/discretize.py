"""Quantile bucketing (histogram-equalized discretization) — assign
every row the index of its exact-quantile bucket and report the bucket
histogram. The feature-engineering binning step (equal-POPULATION
bins, unlike ``stages/sketch.py``'s equal-width histogram), built by
composing ``ops/quantiles.py``'s exact distributed selection with one
broadcast ``searchsorted`` pass — no sort of the data, ever.

Semantics (pinned by the twin): boundaries are the exact values at
0-based rank ``floor(q·(n−1))`` (the ops/quantiles rank definition)
for each requested q; ``bucket(v) = #{boundaries b : b ≤ v}``
(numpy ``searchsorted(..., side='right')``). Ties sit with the lower
bucket's boundary value itself included below, so buckets are
only approximately equal-sized under heavy ties — exactly what the
SQL replays.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def quantile_buckets(
    ds,
    col: str,
    qs: list[float],
) -> "ray.data.Dataset":
    """Dataset with int64 ``col`` → Dataset (bucket, n_rows, lo, hi):
    per-bucket row counts and observed [lo, hi] value range, with
    len(qs) exact-quantile boundaries (len(qs)+1 buckets)."""
    from ray.data.aggregate import Count, Max, Min

    from ..ops.quantiles import exact_quantiles

    slim = ds.select_columns([col]).materialize()
    bounds_df = exact_quantiles(slim, col, qs).to_pandas()
    if len(bounds_df) == 0:
        return ray.data.from_arrow(pa.table({
            "bucket": pa.array([], pa.int64()),
            "n_rows": pa.array([], pa.int64()),
            "lo": pa.array([], pa.int64()),
            "hi": pa.array([], pa.int64())}))
    bounds = np.sort(bounds_df["value"].to_numpy(np.int64))
    ref = ray.put(bounds)

    def assign(batch: pa.Table) -> pa.Table:
        b = ray.get(ref)
        v = batch[col].to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": pa.array(
                np.searchsorted(b, v, side="right").astype(np.int64)),
            "v": pa.array(v.astype(np.int64)),
        })

    return (slim.map_batches(assign, batch_format="pyarrow")
            .groupby("bucket")
            .aggregate(Count(alias_name="n_rows"),
                       Min("v", alias_name="lo"),
                       Max("v", alias_name="hi"))
            .sort("bucket"))
