"""Time-weighted average over irregular samples — the monitoring-plane
aggregate (mean health-check latency weighted by how long each reading
was current, mean queue depth, politeness-bucket utilization): plain
AVG over irregular timestamps over-weights bursts; TWA integrates the
left-constant step function instead.

Semantics (pinned by the LEAD window twin): (key, ts) ties collapse to
MIN(value); per key ordered by ts, the integral is
Σ value_i · (ts_{i+1} − ts_i) over consecutive pairs and the weight is
ts_last − ts_first; twa_ppm = (integral · 10^6) // weight (all values
non-negative ints — floor = trunc = DuckDB //). Single-sample keys
(weight 0) pin twa_ppm = value · 10^6.

Distribution: one ``groupby(key)`` shuffle of slim (key, ts, value)
int rows; each group integrates with vectorized pandas. The 10^6
scaling happens in Python-int space (the twin uses HUGEINT) so int64
never overflows mid-computation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

PPM = 10**6


def time_weighted_avg(
    ds,
    *,
    key: str,
    ts: str,
    value: str,
) -> "ray.data.Dataset":
    """Dataset with int64 ``key``/``ts``/``value`` (value ≥ 0) →
    Dataset (key, n_samples, integral, weight, twa_ppm)."""
    slim = ds.select_columns([key, ts, value])

    def integrate(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.groupby([key, ts], as_index=False)[value].min()
             .sort_values([key, ts], kind="mergesort"))
        nxt = g.groupby(key)[ts].shift(-1)
        dt = (nxt - g[ts]).fillna(0).astype("int64")
        g["_seg"] = g[value].astype("int64") * dt
        out = (g.groupby(key, as_index=False)
               .agg(n_samples=(ts, "size"),
                    integral=("_seg", "sum"),
                    w_min=(ts, "min"), w_max=(ts, "max"),
                    v_first=(value, "first")))
        weight = (out["w_max"] - out["w_min"]).astype("int64")
        twa = [
            int(v) * PPM if w == 0 else (int(i) * PPM) // int(w)
            for i, w, v in zip(out["integral"], weight,
                               out["v_first"])
        ]
        return pd.DataFrame({
            key: out[key],
            "n_samples": out["n_samples"].astype("int64"),
            "integral": out["integral"].astype("int64"),
            "weight": weight,
            "twa_ppm": pd.Series(twa, dtype="int64"),
        })

    from ..ops.gutil import group_by_key_shards

    # integrate() already vectorizes across keys — shard the key so one
    # map_groups call covers a whole shard, not one call per key
    return group_by_key_shards(slim, key, integrate)
