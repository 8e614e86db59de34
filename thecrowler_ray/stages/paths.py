"""Session path mining — the full ordered state sequence per (key,
window) rendered as a ``a>b>c`` path string, then counted corpus-wide:
the clickstream "top user journeys" operator, and on the crawl plane
the per-source lifecycle trace (discovered>fetched>error>refetched)
that makes retry-storm patterns visible as literal strings.

Semantics (pinned by the string_agg twin): (key, window, seq) ties
collapse to MIN(state) (the ``stages/cdc.py`` pin); the path joins
states with '>' ordered by seq; output the top-k paths by
(n DESC, path ASC).

Distribution: one ``groupby(key)`` shuffle of slim (key, window, seq,
state) rows builds paths per group; a second slim groupby counts
paths. Path strings are bounded by the window's event count — cap
windows upstream for adversarial keys.
"""

from __future__ import annotations

import numpy as np
import ray.data


def session_paths(
    ds,
    *,
    key: str,
    window: str,
    seq: str,
    state: str,
    k: int = 100,
) -> "ray.data.Dataset":
    """Dataset with int64 ``key``/``window``/``seq`` + string
    ``state`` → Dataset (path, n) — the k most common journeys."""
    from ray.data.aggregate import Sum

    slim = ds.select_columns([key, window, seq, state])

    import pandas as pd

    def paths_shard(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized across every key in the shard (the internal pandas
        # groupbys already handle many keys); one map_groups call per
        # key would be a scheduler round-trip per user at scale
        g = (df.groupby([key, window, seq], as_index=False)[state].min()
             .sort_values([key, window, seq], kind="mergesort"))
        p = (g.groupby([key, window])[state]
             .agg(lambda s: ">".join(s)))
        out = p.reset_index(name="path")[["path"]]
        out = (out.groupby("path", as_index=False).size()
               .rename(columns={"size": "n"}))
        out["n"] = out["n"].astype("int64")
        return out

    from ..ops.gutil import group_by_key_shards

    return (group_by_key_shards(slim, key, paths_shard)
            .groupby("path").aggregate(Sum("n", alias_name="n"))
            .sort(["n", "path"], descending=[True, False])
            .limit(k))
