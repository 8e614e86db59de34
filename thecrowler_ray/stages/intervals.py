"""Interval merging ("gaps and islands") over a Ray Data interval
stream — coalesce overlapping-or-touching [start, end) intervals per
key into maximal islands. The crawl-plane uses: visit-window coverage
per host (when was a source under observation), outage stitching over
health-check events, and byte-range coverage when media arrive as
chunked fetches.

Semantics (pinned by the window-function SQL twin): intervals sort by
(start, end) per key; an interval starts a NEW island iff its start is
strictly greater than the running max end of all previous intervals
(touching intervals — next.start == prev.end — merge, the half-open
convention). Per island: (key, island_start, island_end, n_intervals,
covered) where covered = island_end − island_start.

Distribution: one ``groupby(key)`` shuffle of slim (key, start, end)
int rows; each group merges with vectorized pandas (sort, shifted
cummax, cumsum island ids). Keys are independent; a key's intervals
must co-locate — inherent to the operator.
"""

from __future__ import annotations

import pandas as pd
import ray.data


def merge_intervals(
    ds,
    *,
    key: str,
    start: str = "start",
    end: str = "end",
) -> "ray.data.Dataset":
    """Dataset with int64 ``key``/``start``/``end`` → Dataset
    (key, island_start, island_end, n_intervals, covered), one row per
    maximal merged island."""
    slim = ds.select_columns([key, start, end])

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.sort_values([key, start, end], kind="mergesort")
             .reset_index(drop=True))
        prev_max = (g.groupby(key)[end].cummax()
                    .groupby(g[key]).shift(1))
        new_island = (prev_max.isna()
                      | (g[start] > prev_max)).astype("int64")
        g["island"] = new_island.groupby(g[key]).cumsum()
        out = (g.groupby([key, "island"], as_index=False)
               .agg(island_start=(start, "min"),
                    island_end=(end, "max"),
                    n_intervals=(start, "size")))
        out["covered"] = (out["island_end"]
                          - out["island_start"]).astype("int64")
        out["n_intervals"] = out["n_intervals"].astype("int64")
        return out[[key, "island_start", "island_end", "n_intervals",
                    "covered"]]

    from ..ops.gutil import group_by_key_shards

    # merge() already vectorizes across keys — shard the key so one
    # map_groups call covers a whole shard, not one call per key
    return group_by_key_shards(slim, key, merge)
