"""Grouped exact OLS trend (simple linear regression per group) — the
time-trend profiling operator: slope/intercept of y over x per group
computed from EXACT integer sufficient statistics (the
``stages/moments.py`` discipline extended per-group), so the result is
order-free, partitioning-free, and bit-replayable in SQL with HUGEINT.

Closed form over integers:

    slope_num = n·Σxy − Σx·Σy        slope_den = n·Σx² − (Σx)²
    icpt_num  = Σy·Σx² − Σx·Σxy      (same den)

Both sides render the numerators/denominator as decimal strings
(arbitrary precision — Python ints here, HUGEINT in the twin) plus a
q6 fixed-point slope via TRUNCATING division (DuckDB ``//``).
Degenerate groups (n < 2 or den = 0, i.e. constant x) report 0/0 and
slope_q6 = 0.

Distribution: one streaming ``map_batches`` pass emits per-batch
per-group int sums (bounded: batch · max|x·y| < 2⁶³ asserted); the
driver folds the KB-scale partials into Python ints. Group cardinality
must be driver-bounded (priorities, nations, labels — not user ids);
for unbounded groups use ``stages/moments.py`` per partition instead.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def _tdiv(a: int, b: int) -> int:
    """Truncate-toward-zero division on Python ints (DuckDB //)."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def grouped_ols(
    ds,
    *,
    group: str,
    x: str,
    y: str,
) -> pd.DataFrame:
    """Dataset with string ``group`` + int64 ``x``/``y`` → pandas
    DataFrame (group, n, slope_num, slope_den, icpt_num, slope_q6) —
    sums exact, strings for the unbounded numerators."""
    slim = ds.select_columns([group, x, y])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        xv = df[x].to_numpy(np.int64)
        yv = df[y].to_numpy(np.int64)
        if len(xv):
            mx = int(np.abs(xv).max()) or 1
            my = int(np.abs(yv).max()) or 1
            if mx * my * len(xv) >= 2**62:
                raise ValueError("grouped_ols: batch product bound "
                                 "exceeded — quantize smaller")
        df = pd.DataFrame({
            "g": df[group].to_numpy(),
            "n": np.ones(len(xv), dtype=np.int64),
            "sx": xv, "sy": yv,
            "sxy": xv * yv, "sxx": xv * xv,
        })
        out = df.groupby("g", as_index=False).sum()
        return pa.table({
            "g": pa.array(out["g"].astype(str)),
            "n": pa.array(out["n"].to_numpy(np.int64)),
            "sx": pa.array(out["sx"].astype(str)),
            "sy": pa.array(out["sy"].astype(str)),
            "sxy": pa.array(out["sxy"].astype(str)),
            "sxx": pa.array(out["sxx"].astype(str)),
        })

    from ..ops.gutil import collect_tables

    acc: dict[str, list[int]] = {}
    for b in collect_tables(
        slim.map_batches(partial, batch_format="pyarrow")
    ):
        for gname, n, sx, sy, sxy, sxx in zip(
            b["g"].to_pylist(), b["n"].to_pylist(),
            b["sx"].to_pylist(), b["sy"].to_pylist(),
            b["sxy"].to_pylist(), b["sxx"].to_pylist(),
        ):
            a = acc.setdefault(gname, [0, 0, 0, 0, 0])
            a[0] += int(n)
            a[1] += int(sx)
            a[2] += int(sy)
            a[3] += int(sxy)
            a[4] += int(sxx)

    rows = []
    for gname in sorted(acc):
        n, sx, sy, sxy, sxx = acc[gname]
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        icpt = sy * sxx - sx * sxy
        if n < 2 or den == 0:
            num = den = icpt = 0
            q6 = 0
        else:
            q6 = _tdiv(num * 10**6, den)
        rows.append({"grp": gname, "n": np.int64(n),
                     "slope_num": str(num), "slope_den": str(den),
                     "icpt_num": str(icpt), "slope_q6": np.int64(q6)})
    return pd.DataFrame(
        rows, columns=["grp", "n", "slope_num", "slope_den",
                       "icpt_num", "slope_q6"])
