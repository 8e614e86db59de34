"""Aggregation helpers — combiner-style pre-aggregation before the shuffle.

A bare ``groupby(key).aggregate(...)`` shuffles every row. These helpers do
the reference's A1/A2-style grouped counts (keyword occurrences
``pkg/crawler/crawler.go:1819-1824``, dictionary upserts ``1769-1790``) the
scalable way: a vectorized pyarrow ``group_by`` **inside each batch** first
(one partial row per key per batch), then a small global ``groupby`` over the
partials. Hot keys (stop-word-like keywords, giant hosts) are thereby
pre-reduced before they ever hit the exchange — this is the explicit
skew/salting strategy for dictionary aggregations: the per-batch combine is
equivalent to salting by block id.
"""

from __future__ import annotations

import pyarrow as pa
from ray.data.aggregate import Sum


def pre_aggregated_count(ds, key_cols: list[str], out: str = "cnt"):
    """COUNT(*) per key with per-batch partials; → Dataset[key_cols + out]."""

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(key_cols).aggregate([([], "count_all")])
        return g.rename_columns(list(key_cols) + [out])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    key = key_cols[0] if len(key_cols) == 1 else key_cols
    return partials.groupby(key).aggregate(Sum(out, alias_name=out))


def pre_aggregated_sum(ds, key_cols: list[str], val_col: str, out: str | None = None):
    """SUM(val) per key with per-batch partials."""
    out = out or f"sum_{val_col}"

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(key_cols).aggregate([(val_col, "sum")])
        return g.rename_columns(list(key_cols) + [out])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    key = key_cols[0] if len(key_cols) == 1 else key_cols
    return partials.groupby(key).aggregate(Sum(out, alias_name=out))
