"""Keyed window functions — the SQL OVER (PARTITION BY … ORDER BY …)
staple as a first-class Ray Data operator: row_number, lag/lead,
running (cumulative) sum and a rolling N-row sum per key, in one pass.

The reference's closest analogs are its time-series deltas and session
orderings (pkg/database/entity_correlation_timeseries.go most-recent/
previous-observation lookups); a training-data pipeline needs the same
shapes for per-source sequence features and curriculum ordering.

Shape: ONE ``groupby(hash-shard of key)`` co-partitioning shuffle; every
key of a shard is resolved by pandas group transforms that vectorize
ACROSS keys (``groupby().shift/cumsum/cumcount/rolling`` are single C
passes — no per-key scheduler round-trip, the stages/basket.py
measurement). Values are int64 so running sums are exact and
order-free; lag/lead emit float64 with NaN for the window edges (the
DuckDB NULL convention after ``.df()``).

Determinism: ``order`` must be a UNIQUE total order within each key
(pass a tiebreaker column, e.g. an event id) — otherwise row_number and
the frame sums are tie-order-dependent on both engines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


def keyed_window(
    ds,
    *,
    key: str,
    order: list[str],
    value: str,
    rolling: int = 3,
) -> "ray.data.Dataset":
    """→ Dataset with the input columns plus ``row_no`` (1-based per
    key), ``lag1``/``lead1`` (float64, NaN at edges), ``cum_sum`` and
    ``roll{N}_sum`` (int64, exact) — per ``key`` under ``order``."""
    from .gutil import group_by_key_shards

    roll_col = f"roll{rolling}_sum"

    def win_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key] + list(order), kind="mergesort")
        grp = g.groupby(key, sort=False)[value]
        out = g.copy()
        out["row_no"] = (grp.cumcount() + 1).astype("int64")
        # window edges carry the explicit -1 default (LAG(v, 1, -1)) so
        # every column is exact int64 — engines encode NaN/NULL floats
        # with different bit patterns, which a bit-exact gate rejects
        out["lag1"] = grp.shift(1).fillna(-1).astype("int64")
        out["lead1"] = grp.shift(-1).fillna(-1).astype("int64")
        out["cum_sum"] = grp.cumsum().astype("int64")
        out[roll_col] = (
            grp.rolling(rolling, min_periods=1).sum()
            .reset_index(drop=True).to_numpy().astype("int64"))
        return out

    return group_by_key_shards(ds, key, win_shard)
