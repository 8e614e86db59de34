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

    import pyarrow as pa

    def paths(t: pa.Table) -> pa.Table:
        # arrow out: pandas blocks tax the downstream path groupby
        g = (t.to_pandas()
             .groupby([key, window, seq], as_index=False)[state].min()
             .sort_values([key, window, seq], kind="mergesort"))
        p = (g.groupby([key, window])[state]
             .agg(lambda s: ">".join(s)))
        out = p.reset_index(name="path")[["path"]]
        out = (out.groupby("path", as_index=False).size()
               .rename(columns={"size": "n"}))
        return pa.table({
            "path": pa.array(out["path"].tolist(), pa.string()),
            "n": pa.array(out["n"].to_numpy(np.int64))})

    return (slim.groupby(key).map_groups(paths, batch_format="pyarrow")
            .groupby("path").aggregate(Sum("n", alias_name="n"))
            .sort(["n", "path"], descending=[True, False])
            .limit(k))
