"""Change-data-capture historization (SCD Type 2, Kimball) over a Ray
Data change stream — the warehouse-side operator every long-running
crawl needs to answer "what did this source look like at time T":
turn an append-only event stream (key, seq, state) into a versioned
dimension with validity intervals.

Semantics (pinned by the SQL twin, window-function form):

1. ties: multiple rows per (key, seq) collapse to MIN(state) —
   deterministic regardless of arrival order;
2. change detection: a row survives only if its state differs from the
   key's previous surviving state (the first row always survives);
3. intervals: ``valid_from`` = the row's seq, ``valid_to`` = the next
   surviving row's seq (half-open, -1 = still current),
   ``version`` = 1-based rank of surviving rows per key,
   ``is_current`` = 1 on the last.

Distribution: everything happens inside ONE ``groupby(key)`` — the
stream is hash-partitioned by key and each group is historized with
vectorized pandas (sort by seq, shift-compare, cumsum), so the only
exchange is the groupby shuffle of slim (key, seq, state) rows. Keys
are independent; hot keys cost their own group only (a key's full
history must co-locate — inherent to the operator, same assumption as
the reference's per-source snapshot store, pkg/database/source.go).
"""

from __future__ import annotations

import pandas as pd
import ray.data


def scd2_history(
    ds,
    *,
    key: str,
    seq: str,
    state: str,
) -> "ray.data.Dataset":
    """Dataset with int64 ``key``/``seq`` and orderable ``state`` →
    Dataset (key, state, version, valid_from, valid_to, is_current),
    one row per surviving state change."""
    slim = ds.select_columns([key, seq, state])

    def historize(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.groupby([key, seq], as_index=False)[state].min()
             .sort_values([key, seq], kind="mergesort"))
        # change detection per key (the frame may hold several keys —
        # map_groups can batch small groups together)
        prev_state = g.groupby(key)[state].shift(1)
        keep = g[(prev_state.isna()) | (g[state] != prev_state)].copy()
        keep["version"] = keep.groupby(key).cumcount() + 1
        nxt = keep.groupby(key)[seq].shift(-1)
        keep["valid_from"] = keep[seq].astype("int64")
        keep["valid_to"] = nxt.fillna(-1).astype("int64")
        keep["is_current"] = (keep["valid_to"] == -1).astype("int64")
        out = keep[[key, state, "version", "valid_from", "valid_to",
                    "is_current"]].reset_index(drop=True)
        out["version"] = out["version"].astype("int64")
        return out

    from ..ops.gutil import group_by_key_shards

    # historize() already vectorizes across keys — shard the key so one
    # map_groups call covers a whole shard, not one call per key
    return group_by_key_shards(slim, key, historize)
