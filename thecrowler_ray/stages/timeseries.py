"""Time-series bucket aggregation (A4).

Reimplements (semantics only) the reference's time-series subsystem
(``pkg/database/time_series_aggregation.go:101-330``): observations grouped
by (metric, time bucket) with count / sum / min / max / avg, exact
distinct-entity count, change count (value transitions within the bucket in
time order), first/last edge values, and p50/p75/p90/p95/p99 percentiles
with linear interpolation (``time_series_aggregation.go:334-349`` — numpy's
default 'linear' method and DuckDB's ``quantile_cont`` match it).

Shape: ``groupby(metric, bucket).map_groups`` over pandas — the documented
partition-by-key + in-group ordering pattern for stream-shaped data.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa


def _bucket(ts: pd.Series, bucket: str) -> pd.Series:
    return ts.dt.floor(bucket)


_UNIT = {"d": "day", "h": "hour", "min": "minute", "t": "minute",
         "s": "second", "ms": "millisecond"}


def _parse_freq(bucket: str) -> tuple[int, str]:
    """pandas-style fixed freq ("h", "15min", "D") → (multiple, arrow unit)."""
    m = re.fullmatch(r"(\d*)\s*([a-zA-Z]+)", bucket.strip())
    if not m or m.group(2).lower() not in _UNIT:
        raise ValueError(f"unsupported bucket freq: {bucket!r}")
    return int(m.group(1) or 1), _UNIT[m.group(2).lower()]


def timeseries_aggregate(
    ds,
    metric_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    entity_col: str | None = "user_id",
    bucket: str = "h",
):
    """events-shaped Dataset → per-(metric, bucket) aggregate rows."""

    mult, unit = _parse_freq(bucket)

    def add_bucket(t: "pa.Table") -> "pa.Table":
        # zero-copy Arrow floor (no per-batch pandas round-trip)
        import pyarrow.compute as pc

        return t.append_column(
            "bucket", pc.floor_temporal(t[ts_col], multiple=mult, unit=unit)
        )

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col], kind="mergesort")
        v = g[value_col].to_numpy(dtype=np.float64)
        row = {
            "metric": [g[metric_col].iloc[0]],
            "bucket": [g["bucket"].iloc[0]],
            "n": [len(g)],
            "sum_value": [round(float(v.sum()), 4)],
            "min_value": [round(float(v.min()), 4)],
            "max_value": [round(float(v.max()), 4)],
            "avg_value": [round(float(v.mean()), 4)],
            "first_value": [round(float(v[0]), 4)],
            "last_value": [round(float(v[-1]), 4)],
            "changes": [int((np.diff(v) != 0).sum())],
            "p50": [round(float(np.percentile(v, 50)), 4)],
            "p75": [round(float(np.percentile(v, 75)), 4)],
            "p90": [round(float(np.percentile(v, 90)), 4)],
            "p95": [round(float(np.percentile(v, 95)), 4)],
            "p99": [round(float(np.percentile(v, 99)), 4)],
        }
        if entity_col and entity_col in g.columns:
            row["distinct_entities"] = [int(g[entity_col].nunique())]
        return pd.DataFrame(row)

    # group by a uniform hash SHARD of (metric, bucket) — one map_groups
    # call per shard, not one scheduler round-trip per series-bucket; the
    # per-group numpy stats run in-worker over the shard's sub-groups
    import ray as _ray

    n_shards = max(16, int(_ray.cluster_resources().get("CPU", 8)) * 2)

    def add_shard(t: pa.Table) -> pa.Table:
        key = pd.util.hash_pandas_object(
            t.select([metric_col, "bucket"]).to_pandas(),
            index=False).to_numpy().astype(np.uint64)
        return t.append_column(
            "_shard", pa.array((key % n_shards).astype(np.int32)))

    def agg_shard(gdf: pd.DataFrame) -> pa.Table:
        outs = [agg(g) for _, g in
                gdf.groupby([metric_col, "bucket"], sort=False)]
        return pa.Table.from_pandas(
            pd.concat(outs, ignore_index=True), preserve_index=False)

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .map_batches(add_shard, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(agg_shard, batch_format="pandas")
    )
