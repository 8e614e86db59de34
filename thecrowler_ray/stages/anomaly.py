"""Per-group z-score anomaly flagging with EXACT integer arithmetic —
the monitoring-plane outlier detector (response-size spikes, scrape
value drift) expressed so the flag set is bit-identical in SQL.

The float z-score test ``|x − μ|/σ > k`` is equivalent to

    (n·x − S)² > k² · (n·Q − S²)        [strictly greater]

with ``S = Σx``, ``Q = Σx²`` over the group — every term an integer,
so no float ever decides a flag (``stages/moments.py`` discipline;
the twin computes the same inequality in HUGEINT). Degenerate pins:
a zero-variance group has every ``x = μ`` so ``n·x − S = 0`` and
nothing flags; likewise a single-row group never flags itself.

Distribution: one streaming pass emits per-batch per-group (n, S, Q)
partials as decimal strings (Python-int exact); the driver folds the
ALPHABET-BOUNDED group stats and broadcasts them; a second map flags
rows. Data never shuffles. Group cardinality must be alphabet-like
(event types, status codes, languages) — that bound is the design.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

_SEG = 4096


def _exact_sum(v: np.ndarray) -> int:
    if len(v) == 0:
        return 0
    segs = np.add.reduceat(v, np.arange(0, len(v), _SEG))
    return sum(int(s) for s in segs)


def zscore_anomalies(
    ds,
    *,
    group: str,
    value: str,
    k: int = 3,
    id_col: str,
) -> "ray.data.Dataset":
    """Dataset with ``group`` (string), int64 ``value`` and ``id_col``
    → Dataset (id, group, value) of rows with |x − μ| > k·σ within
    their group (exact integer test), sorted by id."""
    slim = ds.select_columns([id_col, group, value]).materialize()

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([group, value]).to_pandas()
        gs, ns, ss, qs = [], [], [], []
        for gname, gv in df.groupby(group)[value]:
            x = gv.to_numpy(np.int64)
            gs.append(gname)
            ns.append(len(x))
            ss.append(str(_exact_sum(x)))
            qs.append(str(_exact_sum(x * x)))
        return pa.table({
            "g": pa.array(gs, pa.string()),
            "n": pa.array(ns, pa.int64()),
            "s": pa.array(ss, pa.string()),
            "q": pa.array(qs, pa.string())})

    parts = slim.map_batches(partial, batch_format="pyarrow",
                             batch_size=None).to_pandas()
    stats: dict[str, tuple[int, int, int]] = {}
    for g, gdf in parts.groupby("g"):
        stats[g] = (int(gdf["n"].sum()),
                    sum(int(v) for v in gdf["s"]),
                    sum(int(v) for v in gdf["q"]))
    ref = ray.put(stats)

    def flag(batch: pa.Table) -> pa.Table:
        st = ray.get(ref)
        gv = batch[group].to_pylist()
        xv = batch[value].to_numpy(zero_copy_only=False).astype(
            np.int64)
        keep = np.zeros(len(xv), dtype=bool)
        for i, (g, x) in enumerate(zip(gv, xv)):
            n, s, q = st[g]
            lhs = (n * int(x) - s) ** 2          # Python ints: exact
            rhs = k * k * (n * q - s * s)
            keep[i] = lhs > rhs
        return batch.filter(pa.array(keep))

    return slim.map_batches(flag, batch_format="pyarrow").sort(id_col)
