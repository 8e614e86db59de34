"""Per-key time-series resampling with forward-fill (the standard
"regularize irregular samples" operator: pandas ``resample().ffill()``
/ the step-function sampling every monitoring store implements).
Complements ``stages/twa.py`` (which integrates the step function —
this one SAMPLES it on a regular grid) and ``stages/timeseries.py``
(bucket aggregates).

Semantics (pinned by the ASOF-join twin):

- observations tie-collapse per (key, ts) to MIN(value) (the
  ``stages/cdc.py`` pin) — ASOF joins are underdetermined under
  duplicate timestamps otherwise.
- per key the grid is ``floor(min_ts/step)·step .. floor(max_ts/step)
  ·step`` inclusive, stride ``step`` (that key's own observed range —
  corpus-global grids explode on sparse keys).
- grid value = the last observation at-or-before the grid instant
  (DuckDB ``ASOF JOIN`` with ``obs.ts <= grid.t``); a grid point with
  no at-or-before observation (only possible for the first point,
  when floor(min_ts/step)·step < min_ts) is DROPPED — the ASOF inner
  join's behaviour. Timestamps are assumed non-negative (numpy ``//``
  floors, DuckDB ``//`` truncates — they agree on ≥0).

Distribution: ONE ``groupby(key-hash shard)`` of slim (key, ts, value)
int rows (the ``stages/basket.py`` sharding — no per-key scheduler
round-trip); inside a shard each key is one vectorized
``np.searchsorted`` of its grid into its sorted timestamps. Grid rows
out ≈ span/step per key — cap ``step`` upstream for adversarial
spans.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def resample_ffill(
    ds,
    *,
    key: str,
    ts: str,
    value: str,
    step: int,
    n_shards: int | None = None,
) -> "ray.data.Dataset":
    """Dataset with int64 ``key``/``ts``/``value`` → Dataset
    (key, t, value): the forward-filled regular grid per key."""
    if step <= 0:
        raise ValueError("resample_ffill: step must be positive")
    if n_shards is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        n_shards = max(16, cpus * 4)

    slim = ds.select_columns([key, ts, value])

    def add_shard(batch: pa.Table) -> pa.Table:
        k = batch[key].to_numpy(zero_copy_only=False).astype(np.uint64)
        sh = ((k * _GOLDEN) >> np.uint64(33)) % np.uint64(n_shards)
        return batch.append_column("shard",
                                   pa.array(sh.astype(np.int64)))

    def shard_fill(g: pa.Table) -> pa.Table:
        k = g[key].to_numpy(zero_copy_only=False).astype(np.int64)
        t = g[ts].to_numpy(zero_copy_only=False).astype(np.int64)
        v = g[value].to_numpy(zero_copy_only=False).astype(np.int64)
        # sort by (key, ts, value) then tie-collapse to the FIRST row
        # per (key, ts) == MIN(value)
        order = np.lexsort((v, t, k))
        k, t, v = k[order], t[order], v[order]
        first = np.r_[True, (k[1:] != k[:-1]) | (t[1:] != t[:-1])]
        k, t, v = k[first], t[first], v[first]
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        ends = np.r_[starts[1:], len(k)]
        out_k, out_t, out_v = [], [], []
        for s, e in zip(starts, ends):
            tt, vv = t[s:e], v[s:e]
            lo = (tt[0] // step) * step
            hi = (tt[-1] // step) * step
            grid = np.arange(lo, hi + 1, step, dtype=np.int64)
            idx = np.searchsorted(tt, grid, side="right") - 1
            # grid[0] ≥ nothing before tt[0] only when lo < tt[0] —
            # floor puts lo ≤ tt[0], so idx ≥ 0 except lo == tt[0]-?:
            # lo ≤ tt[0] always ⇒ idx[0] ≥ 0 iff grid[0] ≥ tt[0];
            # when lo < tt[0] the first grid point has no obs — drop it
            ok = idx >= 0
            grid, idx = grid[ok], idx[ok]
            out_k.append(np.full(len(grid), k[s], dtype=np.int64))
            out_t.append(grid)
            out_v.append(vv[idx])
        if not out_k:
            return pa.table({key: pa.array([], pa.int64()),
                             "t": pa.array([], pa.int64()),
                             "value": pa.array([], pa.int64())})
        return pa.table({
            key: pa.array(np.concatenate(out_k)),
            "t": pa.array(np.concatenate(out_t)),
            "value": pa.array(np.concatenate(out_v))})

    return (slim.map_batches(add_shard, batch_format="pyarrow")
            .groupby("shard")
            .map_groups(shard_fill, batch_format="pyarrow"))
